"""Grounding DINO (flax) — open-vocabulary detector: Swin backbone + BERT
text encoder + deformable-DETR encoder/decoder with image-text fusion and
language-guided query selection.

Covers the reference's only mmdetection usage — `init_detector` /
`inference_detector(text_prompt=...)` over
mmdet/models/detectors/grounding_dino.py:45 (cf. SURVEY.md §2.2: "we need
ONLY the Grounding-DINO inference path"). Multi-scale deformable attention is
the dedicated op in spider_tpu/ops/msda.py.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from spider_tpu.models.bert import BertConfig, BertModel, bert_base, bert_test
from spider_tpu.models.swin import (SwinConfig, SwinTransformer, swin_test,
                                    swin_tiny)
from spider_tpu.models.unet2d import _attention
from spider_tpu.ops.msda import msda


@dataclasses.dataclass(frozen=True)
class GroundingDINOConfig:
    hidden_dim: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    enc_layers: int = 6
    dec_layers: int = 6
    num_queries: int = 900
    ffn_dim: int = 2048
    max_text_len: int = 256
    backbone: SwinConfig = dataclasses.field(default_factory=swin_tiny)
    bert: BertConfig = dataclasses.field(default_factory=bert_base)
    dtype: Any = jnp.float32


def grounding_dino_tiny() -> GroundingDINOConfig:
    """swin-T + BERT-base (the deployed config,
    grounding_dino_swin-t_pretrain_obj365_goldg_grit9m_v3det)."""
    return GroundingDINOConfig()


def grounding_dino_test() -> GroundingDINOConfig:
    return GroundingDINOConfig(
        hidden_dim=32, num_heads=4, num_levels=4, num_points=2,
        enc_layers=1, dec_layers=2, num_queries=20, ffn_dim=64,
        max_text_len=16, backbone=swin_test(), bert=bert_test())


def _inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


def _sine_embed(coords: jnp.ndarray, num_feats: int,
                temperature: float = 10000.0) -> jnp.ndarray:
    """Sine/cosine positional encoding per coordinate: [..., C] coords ->
    [..., C * num_feats] (deformable-DETR convention)."""
    dim_t = jnp.arange(num_feats // 2, dtype=jnp.float32)
    dim_t = temperature ** (2 * dim_t / num_feats)
    pos = coords[..., None] * 2 * math.pi / dim_t          # [..., C, nf/2]
    out = jnp.concatenate([jnp.sin(pos), jnp.cos(pos)], axis=-1)
    return out.reshape(coords.shape[:-1] + (-1,))


class MSDeformAttnLayer(nn.Module):
    """One multi-scale deformable attention block (self or cross)."""

    config: GroundingDINOConfig

    @nn.compact
    def __call__(self, query, value, reference_points, spatial_shapes):
        """query [B,Q,C]; value [B,S,C]; reference_points [B,Q,2] or
        [B,Q,4] (normalized cxcy(wh))."""
        cfg = self.config
        B, Q, C = query.shape
        H, L, P = cfg.num_heads, cfg.num_levels, cfg.num_points
        D = C // H
        v = nn.Dense(C, dtype=cfg.dtype, name="value_proj")(value)
        v = v.reshape(B, -1, H, D)
        offsets = nn.Dense(H * L * P * 2, dtype=cfg.dtype,
                           kernel_init=nn.initializers.zeros,
                           name="sampling_offsets")(query)
        offsets = offsets.reshape(B, Q, H, L, P, 2)
        weights = nn.Dense(H * L * P, dtype=cfg.dtype,
                           kernel_init=nn.initializers.zeros,
                           name="attention_weights")(query)
        weights = jax.nn.softmax(
            weights.reshape(B, Q, H, L * P).astype(jnp.float32), axis=-1
        ).reshape(B, Q, H, L, P).astype(cfg.dtype)

        shapes_arr = jnp.asarray(spatial_shapes, jnp.float32)  # [L, 2] (h, w)
        wh = shapes_arr[:, ::-1][None, None, None, :, None, :]  # x=w, y=h
        if reference_points.shape[-1] == 2:
            ref = reference_points[:, :, None, None, None, :]
            loc = ref + offsets / wh
        else:
            ref_xy = reference_points[:, :, None, None, None, :2]
            ref_wh = reference_points[:, :, None, None, None, 2:]
            loc = ref_xy + offsets / P * ref_wh * 0.5
        out = msda(v, spatial_shapes, loc, weights)
        return nn.Dense(C, dtype=cfg.dtype, name="output_proj")(out)


class BiAttentionBlock(nn.Module):
    """GLIP-style bidirectional multi-head image<->text fusion: one shared
    attention-logit tensor per head, softmaxed both ways, with values
    projected on both sides (BiMultiHeadAttention semantics)."""

    config: GroundingDINOConfig

    @nn.compact
    def __call__(self, img, txt):
        cfg = self.config
        C = cfg.hidden_dim
        H = cfg.num_heads
        D = C // H
        B, S, _ = img.shape
        T = txt.shape[1]
        i = nn.LayerNorm(dtype=cfg.dtype, name="ln_img")(img)
        t = nn.LayerNorm(dtype=cfg.dtype, name="ln_txt")(txt)
        qi = nn.Dense(C, dtype=cfg.dtype, name="img_q")(i).reshape(B, S, H, D)
        kt = nn.Dense(C, dtype=cfg.dtype, name="txt_k")(t).reshape(B, T, H, D)
        vi = nn.Dense(C, dtype=cfg.dtype, name="img_v")(i).reshape(B, S, H, D)
        vt = nn.Dense(C, dtype=cfg.dtype, name="txt_v")(t).reshape(B, T, H, D)
        logits = jnp.einsum("bshd,bthd->bhst", qi, kt) / math.sqrt(D)
        logits = logits.astype(jnp.float32)
        # stability clamps (GLIP clamps fused logits)
        logits = jnp.clip(logits, -50000.0, 50000.0)
        a_i2t = jax.nn.softmax(logits, axis=-1)
        a_t2i = jax.nn.softmax(logits.transpose(0, 1, 3, 2), axis=-1)
        img_attn = jnp.einsum("bhst,bthd->bshd", a_i2t.astype(vt.dtype), vt)
        txt_attn = jnp.einsum("bhts,bshd->bthd", a_t2i.astype(vi.dtype), vi)
        gamma_i = self.param("gamma_img", nn.initializers.constant(1e-4),
                             (C,), jnp.float32)
        gamma_t = self.param("gamma_txt", nn.initializers.constant(1e-4),
                             (C,), jnp.float32)
        img = img + gamma_i.astype(img.dtype) * nn.Dense(
            C, dtype=cfg.dtype, name="img_out")(img_attn.reshape(B, S, C))
        txt = txt + gamma_t.astype(txt.dtype) * nn.Dense(
            C, dtype=cfg.dtype, name="txt_out")(txt_attn.reshape(B, T, C))
        return img, txt


class EncoderLayer(nn.Module):
    config: GroundingDINOConfig

    @nn.compact
    def __call__(self, img, txt, ref_points, spatial_shapes, txt_len):
        cfg = self.config
        C = cfg.hidden_dim
        # fusion first (grounding dino feature enhancer)
        img, txt = BiAttentionBlock(cfg, name="fusion")(img, txt)
        # text self-attn + FFN
        B, T, _ = txt.shape
        H = cfg.num_heads
        q = nn.Dense(C, dtype=cfg.dtype, name="txt_q")(txt)
        k = nn.Dense(C, dtype=cfg.dtype, name="txt_k")(txt)
        v = nn.Dense(C, dtype=cfg.dtype, name="txt_v")(txt)
        from spider_tpu.ops.attention import mha_reference

        attn = mha_reference(q.reshape(B, T, H, C // H),
                             k.reshape(B, T, H, C // H),
                             v.reshape(B, T, H, C // H), causal=False,
                             kv_len=txt_len)
        txt = nn.LayerNorm(dtype=cfg.dtype, name="txt_ln1")(
            txt + nn.Dense(C, dtype=cfg.dtype, name="txt_attn_out")(
                attn.reshape(B, T, C)))
        h = nn.Dense(cfg.ffn_dim, dtype=cfg.dtype, name="txt_fc1")(txt)
        txt = nn.LayerNorm(dtype=cfg.dtype, name="txt_ln2")(
            txt + nn.Dense(C, dtype=cfg.dtype, name="txt_fc2")(jax.nn.relu(h)))
        # image deformable self-attn + FFN
        attn = MSDeformAttnLayer(cfg, name="msda")(img, img, ref_points,
                                                   spatial_shapes)
        img = nn.LayerNorm(dtype=cfg.dtype, name="img_ln1")(img + attn)
        h = nn.Dense(cfg.ffn_dim, dtype=cfg.dtype, name="img_fc1")(img)
        img = nn.LayerNorm(dtype=cfg.dtype, name="img_ln2")(
            img + nn.Dense(C, dtype=cfg.dtype, name="img_fc2")(jax.nn.relu(h)))
        return img, txt


class DecoderLayer(nn.Module):
    config: GroundingDINOConfig

    @nn.compact
    def __call__(self, queries, query_pos, memory, txt, ref_boxes,
                 spatial_shapes, txt_len):
        cfg = self.config
        C = cfg.hidden_dim
        H = cfg.num_heads
        B, Q, _ = queries.shape
        # self-attn
        qk = queries + query_pos
        a = _attention(nn.Dense(C, dtype=cfg.dtype, name="self_q")(qk),
                       nn.Dense(C, dtype=cfg.dtype, name="self_k")(qk),
                       nn.Dense(C, dtype=cfg.dtype, name="self_v")(queries), H)
        queries = nn.LayerNorm(dtype=cfg.dtype, name="ln1")(
            queries + nn.Dense(C, dtype=cfg.dtype, name="self_out")(a))
        # text cross-attn
        from spider_tpu.ops.attention import mha_reference

        T = txt.shape[1]
        a = mha_reference(
            nn.Dense(C, dtype=cfg.dtype, name="txt_q")(queries + query_pos)
            .reshape(B, Q, H, C // H),
            nn.Dense(C, dtype=cfg.dtype, name="txt_k")(txt)
            .reshape(B, T, H, C // H),
            nn.Dense(C, dtype=cfg.dtype, name="txt_v")(txt)
            .reshape(B, T, H, C // H), causal=False, kv_len=txt_len)
        queries = nn.LayerNorm(dtype=cfg.dtype, name="ln2")(
            queries + nn.Dense(C, dtype=cfg.dtype, name="txt_out")(
                a.reshape(B, Q, C)))
        # deformable cross-attn to image memory
        a = MSDeformAttnLayer(cfg, name="msda")(queries + query_pos, memory,
                                                ref_boxes, spatial_shapes)
        queries = nn.LayerNorm(dtype=cfg.dtype, name="ln3")(queries + a)
        h = nn.Dense(cfg.ffn_dim, dtype=cfg.dtype, name="fc1")(queries)
        return nn.LayerNorm(dtype=cfg.dtype, name="ln4")(
            queries + nn.Dense(C, dtype=cfg.dtype, name="fc2")(jax.nn.relu(h)))


class BoxHead(nn.Module):
    dtype: Any

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        for i in range(2):
            x = jax.nn.relu(nn.Dense(C, dtype=self.dtype, name=f"fc{i}")(x))
        return nn.Dense(4, dtype=self.dtype, name="out")(x)


class GroundingDINO(nn.Module):
    config: GroundingDINOConfig

    def _grid_reference_points(self, spatial_shapes, B):
        refs = []
        for (h, w) in spatial_shapes:
            ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
            xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
            grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
            refs.append(grid.reshape(-1, 2))
        ref = jnp.concatenate(refs, axis=0)
        return jnp.broadcast_to(ref[None], (B,) + ref.shape)

    @nn.compact
    def __call__(self, images: jnp.ndarray, text_ids: jnp.ndarray,
                 text_mask: Optional[jnp.ndarray] = None):
        """images [B,3,H,W]; text_ids [B,T] -> dict(boxes cxcywh normalized
        [B,K,4], scores [B,K], logits [B,K,T])."""
        cfg = self.config
        B = images.shape[0]
        C = cfg.hidden_dim

        # backbone + neck (ChannelMapper: conv + GroupNorm32 per level)
        feats = SwinTransformer(cfg.backbone, name="backbone")(images)
        levels = []
        for i, f in enumerate(feats):
            x = nn.Conv(C, (1, 1), dtype=cfg.dtype, name=f"neck_in{i}")(f)
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=cfg.dtype,
                             name=f"neck_gn{i}")(x)
            levels.append(x)
        extra = nn.Conv(C, (3, 3), strides=2, padding=1, dtype=cfg.dtype,
                        name="neck_extra")(feats[-1])
        extra = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=cfg.dtype,
                             name="neck_extra_gn")(extra)
        levels.append(extra)
        levels = levels[: cfg.num_levels]
        spatial_shapes = tuple((f.shape[1], f.shape[2]) for f in levels)
        level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                 (cfg.num_levels, C), jnp.float32)
        # per-pixel sine positional encoding + per-level embedding
        parts = []
        for i, f in enumerate(levels):
            h, w = f.shape[1], f.shape[2]
            ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
            xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
            grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
            pos = _sine_embed(grid.reshape(-1, 2), C // 2)   # [h*w, C]
            parts.append(f.reshape(B, -1, C)
                         + pos[None].astype(cfg.dtype)
                         + level_embed[i].astype(cfg.dtype))
        img = jnp.concatenate(parts, axis=1)

        # text
        txt_raw, _ = BertModel(cfg.bert, name="bert")(text_ids, text_mask)
        txt = nn.Dense(C, dtype=cfg.dtype, name="text_proj")(txt_raw)
        txt_len = (text_mask.sum(-1).astype(jnp.int32)
                   if text_mask is not None else None)

        # encoder (feature enhancer)
        enc_ref = self._grid_reference_points(spatial_shapes, B)
        for i in range(cfg.enc_layers):
            img, txt = EncoderLayer(cfg, name=f"enc_{i}")(
                img, txt, enc_ref, spatial_shapes, txt_len)

        # language-guided query selection
        enc_out = nn.LayerNorm(dtype=cfg.dtype, name="enc_out_ln")(
            nn.Dense(C, dtype=cfg.dtype, name="enc_out_proj")(img))
        # ContrastiveEmbed (deployed cfg: log_scale='auto', bias=True —
        # grounding_dino_swin-t_pretrain_obj365.py:97,
        # grounding_dino_head.py:24-90): sim/sqrt(C) + learnable scalar bias
        # initialized to -log((1-0.01)/0.01). Each cls branch has its own.
        bias_init = nn.initializers.constant(-math.log((1 - 0.01) / 0.01))
        enc_cls_bias = self.param("enc_cls_bias", bias_init, (1,),
                                  jnp.float32)
        sim = jnp.einsum("bsc,btc->bst", enc_out, txt) / math.sqrt(C) \
            + enc_cls_bias.astype(cfg.dtype)
        if txt_len is not None:
            t_mask = jnp.arange(txt.shape[1])[None, None, :] < txt_len[:, None, None]
            sim = jnp.where(t_mask, sim, -1e9)
        token_scores = jnp.max(sim, axis=-1)               # [B, S]
        K = min(cfg.num_queries, token_scores.shape[1])
        _, topk = jax.lax.top_k(token_scores, K)
        sel = jnp.take_along_axis(enc_out, topk[..., None], axis=1)
        # initial boxes from selected features + their grid anchors
        anchor_xy = jnp.take_along_axis(enc_ref, topk[..., None], axis=1)
        delta = BoxHead(cfg.dtype, name="enc_box_head")(sel)
        init_boxes = jnp.concatenate(
            [_inverse_sigmoid(anchor_xy) + delta[..., :2], delta[..., 2:]],
            axis=-1)
        ref_boxes = jax.nn.sigmoid(init_boxes)             # [B, K, 4] cxcywh
        # learned content queries (DINO two-stage convention: static content
        # embedding + dynamic anchors from query selection)
        query_embedding = self.param(
            "query_embedding", nn.initializers.normal(1.0),
            (cfg.num_queries, C), jnp.float32)
        queries = jnp.broadcast_to(
            query_embedding[None, :K].astype(cfg.dtype), (B, K, C))

        # Shared ref_point_head (deformable-DETR): sine embedding of the 4
        # box coords -> 2-layer MLP; module instances created once, applied
        # per layer (shared weights).
        rp_fc1 = nn.Dense(C, dtype=cfg.dtype, name="ref_point_fc1")
        rp_fc2 = nn.Dense(C, dtype=cfg.dtype, name="ref_point_fc2")

        def ref_point_head(boxes):
            e = _sine_embed(jax.lax.stop_gradient(boxes), C // 2)  # [B,K,2C]
            return rp_fc2(jax.nn.relu(rp_fc1(e.astype(cfg.dtype))))

        for i in range(cfg.dec_layers):
            # query pos re-derived from the CURRENT reference boxes each layer
            query_pos = ref_point_head(ref_boxes)
            queries = DecoderLayer(cfg, name=f"dec_{i}")(
                queries, query_pos, img, txt, ref_boxes, spatial_shapes,
                txt_len)
            # per-layer box refinement branch (mm reg_branches analogue)
            delta = BoxHead(cfg.dtype, name=f"dec_box_head_{i}")(queries)
            ref_boxes = jax.nn.sigmoid(_inverse_sigmoid(ref_boxes) + delta)
            ref_boxes = jax.lax.stop_gradient(ref_boxes)

        queries = nn.LayerNorm(dtype=cfg.dtype, name="decoder_norm")(queries)
        cls_bias = self.param(
            "cls_bias",
            nn.initializers.constant(-math.log((1 - 0.01) / 0.01)), (1,),
            jnp.float32)
        logits = jnp.einsum("bkc,btc->bkt", queries, txt) / math.sqrt(C) \
            + cls_bias.astype(cfg.dtype)
        if txt_len is not None:
            t_mask = jnp.arange(txt.shape[1])[None, None, :] < txt_len[:, None, None]
            logits = jnp.where(t_mask, logits, -1e9)
        scores = jax.nn.sigmoid(jnp.max(logits, axis=-1))
        return dict(boxes=ref_boxes, scores=scores, logits=logits)


class GroundingDINOInference:
    """`inference_detector(model, image, text_prompt)` contract
    (mmdet/apis/inference.py:122-178): numpy image + caption -> top boxes in
    original pixel coords, sorted by score."""

    def __init__(self, model: GroundingDINO, params, tokenizer,
                 image_size: int = 512, max_dets: int = 300):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.image_size = image_size
        self.max_dets = max_dets
        self._jit = jax.jit(
            lambda p, im, ids, mask: self.model.apply(p, im, ids, mask))

    def __call__(self, image: np.ndarray, caption: str) -> Dict[str, list]:
        from spider_tpu.processors.vision import detr_preprocess, resize_pad

        oh, ow = image.shape[:2]
        resized = resize_pad(image, self.image_size)
        chw = detr_preprocess(resized.transpose(2, 0, 1))
        ids = self.tokenizer(caption, add_special_tokens=True).input_ids
        T = self.model.config.max_text_len
        ids = list(ids)[:T]
        mask = [1] * len(ids) + [0] * (T - len(ids))
        ids = ids + [0] * (T - len(ids))
        out = self._jit(self.params, jnp.asarray(chw)[None],
                        jnp.asarray([ids], jnp.int32),
                        jnp.asarray([mask], jnp.int32))
        boxes = np.asarray(out["boxes"][0], np.float32)   # cxcywh normalized
        scores = np.asarray(out["scores"][0], np.float32)
        order = np.argsort(-scores)[: self.max_dets]
        boxes, scores = boxes[order], scores[order]
        # cxcywh (padded frame) -> xyxy original pixels
        scale = max(oh, ow)
        cx, cy, w, h = boxes.T
        xyxy = np.stack([(cx - w / 2) * scale, (cy - h / 2) * scale,
                         (cx + w / 2) * scale, (cy + h / 2) * scale], axis=1)
        xyxy[:, 0::2] = np.clip(xyxy[:, 0::2], 0, ow)
        xyxy[:, 1::2] = np.clip(xyxy[:, 1::2], 0, oh)
        return dict(bboxes=[b.tolist() for b in xyxy],
                    label_names=[caption] * len(xyxy),
                    scores=scores.tolist())
