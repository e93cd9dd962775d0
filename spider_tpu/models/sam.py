"""Segment Anything (flax) — ViT image encoder with windowed attention,
prompt encoder (points/boxes/text-embeds), two-way transformer mask decoder.

Counterpart of /root/reference/spider/models/segment_anything/ (~2.6k LoC):
Spider trains ONLY the mask decoder (base_model.py:221-233) and prompts it
either with boxes (SpiderDecoder path, spider_decoder.py:168-229) or with
text embeddings from the MASK alignment projector (spider.py:606-622).

NHWC layout; encoder is jitted once per image, decoder is the trainable hot
path.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from spider_tpu.models.unet2d import _attention


@dataclasses.dataclass(frozen=True)
class SamConfig:
    img_size: int = 1024
    patch_size: int = 16
    encoder_width: int = 1280          # ViT-H
    encoder_layers: int = 32
    encoder_heads: int = 16
    encoder_global_attn_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    window_size: int = 14
    prompt_embed_dim: int = 256
    mask_in_chans: int = 16
    decoder_depth: int = 2
    decoder_heads: int = 8
    num_multimask_outputs: int = 3
    dtype: Any = jnp.float32

    @property
    def embed_hw(self) -> int:
        return self.img_size // self.patch_size


def sam_vit_h() -> SamConfig:
    return SamConfig()


def sam_tiny() -> SamConfig:
    return SamConfig(img_size=64, patch_size=16, encoder_width=32,
                     encoder_layers=2, encoder_heads=2,
                     encoder_global_attn_indexes=(1,), window_size=2,
                     prompt_embed_dim=16, mask_in_chans=4)


class SamViTBlock(nn.Module):
    heads: int
    window_size: int          # 0 = global attention
    dtype: Any
    use_rel_pos: bool = True  # SAM's decomposed relative positions

    def _rel_pos_bias(self, q, size):
        """Decomposed rel-pos (SAM's add_decomposed_rel_pos): q [B*, T, C],
        T = size*size -> bias [B*, heads, T, T]."""
        C = q.shape[-1]
        D = C // self.heads
        rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                           (2 * size - 1, D), jnp.float32)
        rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                           (2 * size - 1, D), jnp.float32)
        coords = jnp.arange(size)
        rel = coords[:, None] - coords[None, :] + size - 1   # [size, size]
        Rh = rel_h[rel].astype(q.dtype)                       # [s, s, D]
        Rw = rel_w[rel].astype(q.dtype)
        nB = q.shape[0]
        r_q = q.reshape(nB, size, size, self.heads, D).transpose(0, 3, 1, 2, 4)
        bias_h = jnp.einsum("bhxyd,xud->bhxyu", r_q, Rh)      # [B,h,s,s,s]
        bias_w = jnp.einsum("bhxyd,yvd->bhxyv", r_q, Rw)
        bias = bias_h[..., :, None] + bias_w[..., None, :]    # [B,h,s,s,s,s]
        return bias.reshape(nB, self.heads, size * size, size * size)

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, C]."""
        B, H, W, C = x.shape
        shortcut = x
        x = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        ws = self.window_size
        if ws > 0:
            pad_h = (ws - H % ws) % ws
            pad_w = (ws - W % ws) % ws
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            Hp, Wp = H + pad_h, W + pad_w
            x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)
            attn_size = ws
        else:
            assert H == W
            x = x.reshape(B, H * W, C)
            attn_size = H
        q = nn.Dense(C, dtype=self.dtype, name="q")(x)
        k = nn.Dense(C, dtype=self.dtype, name="k")(x)
        v = nn.Dense(C, dtype=self.dtype, name="v")(x)
        if self.use_rel_pos:
            D = C // self.heads
            nB, T, _ = q.shape
            qh = q.reshape(nB, T, self.heads, D).transpose(0, 2, 1, 3)
            kh = k.reshape(nB, T, self.heads, D).transpose(0, 2, 1, 3)
            vh = v.reshape(nB, T, self.heads, D).transpose(0, 2, 1, 3)
            logits = jnp.einsum("bhtd,bhsd->bhts", qh, kh) / (D ** 0.5)
            logits = logits + self._rel_pos_bias(q / (D ** 0.5), attn_size)
            probs = jax.nn.softmax(logits.astype(jnp.float32), -1)
            out = jnp.einsum("bhts,bhsd->bhtd", probs.astype(vh.dtype), vh)
            attn_out = out.transpose(0, 2, 1, 3).reshape(nB, T, C)
        else:
            attn_out = _attention(q, k, v, self.heads)
        x = nn.Dense(C, dtype=self.dtype, name="proj")(attn_out)
        if ws > 0:
            nwh, nww = (H + (ws - H % ws) % ws) // ws, (W + (ws - W % ws) % ws) // ws
            x = x.reshape(B, nwh, nww, ws, ws, C)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, nwh * ws, nww * ws, C)
            x = x[:, :H, :W]
        else:
            x = x.reshape(B, H, W, C)
        x = shortcut + x
        h = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(C * 4, dtype=self.dtype, name="fc1")(h)
        return x + nn.Dense(C, dtype=self.dtype, name="fc2")(jax.nn.gelu(h))


class SamImageEncoder(nn.Module):
    config: SamConfig

    @nn.compact
    def __call__(self, x):
        """x: [B, 3, H, W] (torch layout for sample-dict compat) ->
        [B, h, w, 256] image embeddings."""
        cfg = self.config
        x = x.transpose(0, 2, 3, 1).astype(cfg.dtype)
        x = nn.Conv(cfg.encoder_width, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    dtype=cfg.dtype, name="patch_embed")(x)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, cfg.embed_hw, cfg.embed_hw, cfg.encoder_width),
                         jnp.float32)
        x = x + pos.astype(cfg.dtype)
        for i in range(cfg.encoder_layers):
            ws = 0 if i in cfg.encoder_global_attn_indexes else cfg.window_size
            x = SamViTBlock(cfg.encoder_heads, ws, cfg.dtype,
                            name=f"block_{i}")(x)
        # neck: 1x1 conv -> LN -> 3x3 conv -> LN to prompt_embed_dim
        x = nn.Conv(cfg.prompt_embed_dim, (1, 1), use_bias=False,
                    dtype=cfg.dtype, name="neck_conv1")(x)
        x = nn.LayerNorm(dtype=cfg.dtype, name="neck_ln1")(x)
        x = nn.Conv(cfg.prompt_embed_dim, (3, 3), padding=1, use_bias=False,
                    dtype=cfg.dtype, name="neck_conv2")(x)
        return nn.LayerNorm(dtype=cfg.dtype, name="neck_ln2")(x)


class PromptEncoder(nn.Module):
    """Boxes / points / text embeddings -> sparse prompts; dense positional
    encoding for the image grid."""

    config: SamConfig

    def setup(self):
        cfg = self.config
        # random-Fourier positional encoding matrix
        self.pe_gaussian = self.param(
            "pe_gaussian", nn.initializers.normal(1.0),
            (2, cfg.prompt_embed_dim // 2), jnp.float32)
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0),
            (4, cfg.prompt_embed_dim), jnp.float32)  # pos/neg point, 2 box corners
        self.not_a_point = self.param(
            "not_a_point", nn.initializers.normal(1.0),
            (1, cfg.prompt_embed_dim), jnp.float32)
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0),
            (1, cfg.prompt_embed_dim), jnp.float32)

    def _pe(self, coords):
        """coords in [0,1]^2 -> fourier features [.., D]."""
        proj = (2.0 * coords - 1.0) @ self.pe_gaussian * (2 * np.pi)
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)

    def get_dense_pe(self):
        hw = self.config.embed_hw
        ys = (jnp.arange(hw, dtype=jnp.float32) + 0.5) / hw
        xs = (jnp.arange(hw, dtype=jnp.float32) + 0.5) / hw
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
        return self._pe(grid)  # [hw, hw, D]

    def __call__(self, boxes: Optional[jnp.ndarray] = None,
                 points: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                 text_embeds: Optional[jnp.ndarray] = None):
        """boxes [B, N, 4] xyxy in pixels; points ([B,N,2], labels [B,N]);
        text_embeds [B, N, D]. Returns (sparse [B, T, D], dense [B,h,w,D])."""
        cfg = self.config
        sparse = []
        B = None
        if points is not None:
            pts, labels = points
            B = pts.shape[0]
            coords = (pts + 0.5) / cfg.img_size
            pe = self._pe(coords)
            pe = pe + jnp.where((labels == 1)[..., None],
                                self.point_embeddings[1],
                                self.point_embeddings[0])
            pe = jnp.where((labels == -1)[..., None],
                           self.not_a_point + jnp.zeros_like(pe), pe)
            sparse.append(pe)
        if boxes is not None:
            B = boxes.shape[0]
            corners = boxes.reshape(B, -1, 2, 2)
            coords = (corners + 0.5) / cfg.img_size
            pe = self._pe(coords)
            pe = pe.at[:, :, 0, :].add(self.point_embeddings[2])
            pe = pe.at[:, :, 1, :].add(self.point_embeddings[3])
            sparse.append(pe.reshape(B, -1, cfg.prompt_embed_dim))
        if text_embeds is not None:
            B = text_embeds.shape[0]
            sparse.append(text_embeds)
        assert sparse, "at least one prompt required"
        sparse_out = jnp.concatenate(sparse, axis=1)
        dense = self.no_mask_embed.reshape(1, 1, 1, -1)
        dense = jnp.broadcast_to(
            dense, (B, cfg.embed_hw, cfg.embed_hw, cfg.prompt_embed_dim))
        return sparse_out, dense


class TwoWayBlock(nn.Module):
    heads: int
    dtype: Any
    skip_first_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        def attn(name, q, k, v, downsample=1):
            C = q.shape[-1]
            inner = C // downsample
            qh = nn.Dense(inner, dtype=self.dtype, name=f"{name}_q")(q)
            kh = nn.Dense(inner, dtype=self.dtype, name=f"{name}_k")(k)
            vh = nn.Dense(inner, dtype=self.dtype, name=f"{name}_v")(v)
            return nn.Dense(C, dtype=self.dtype, name=f"{name}_out")(
                _attention(qh, kh, vh, self.heads))

        # self-attention on queries
        q_in = queries if self.skip_first_pe else queries + query_pe
        queries = queries + attn("self", q_in, q_in, queries)
        queries = nn.LayerNorm(dtype=self.dtype, name="ln1")(queries)
        # cross: queries -> keys
        queries = queries + attn("cross_qk", queries + query_pe,
                                 keys + key_pe, keys, downsample=2)
        queries = nn.LayerNorm(dtype=self.dtype, name="ln2")(queries)
        # mlp
        h = nn.Dense(queries.shape[-1] * 8, dtype=self.dtype, name="fc1")(queries)
        queries = queries + nn.Dense(queries.shape[-1], dtype=self.dtype,
                                     name="fc2")(jax.nn.relu(h))
        queries = nn.LayerNorm(dtype=self.dtype, name="ln3")(queries)
        # cross: keys -> queries
        keys = keys + attn("cross_kq", keys + key_pe,
                           queries + query_pe, queries, downsample=2)
        keys = nn.LayerNorm(dtype=self.dtype, name="ln4")(keys)
        return queries, keys


class MaskDecoder(nn.Module):
    config: SamConfig

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompts,
                 dense_prompts, multimask_output: bool = False):
        """image_embeddings [B,h,w,D]; image_pe [h,w,D]; sparse [B,T,D];
        dense [B,h,w,D] -> (masks [B,M,4h,4w], iou_pred [B,M])."""
        cfg = self.config
        D = cfg.prompt_embed_dim
        B, h, w, _ = image_embeddings.shape
        num_tokens = cfg.num_multimask_outputs + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, D), jnp.float32)
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (num_tokens, D), jnp.float32)
        out_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(out_tokens[None], (B,) + out_tokens.shape),
             sparse_prompts], axis=1)

        src = image_embeddings + dense_prompts
        src = src.reshape(B, h * w, D)
        pos = jnp.broadcast_to(image_pe.reshape(1, h * w, D), (B, h * w, D))

        queries, keys = tokens, src
        for i in range(cfg.decoder_depth):
            queries, keys = TwoWayBlock(cfg.decoder_heads, cfg.dtype,
                                        skip_first_pe=(i == 0),
                                        name=f"block_{i}")(
                queries, keys, tokens, pos)
        # final cross-attention queries->keys
        C = D
        qh = nn.Dense(C // 2, dtype=cfg.dtype, name="final_q")(queries + tokens)
        kh = nn.Dense(C // 2, dtype=cfg.dtype, name="final_k")(keys + pos)
        vh = nn.Dense(C // 2, dtype=cfg.dtype, name="final_v")(keys)
        queries = queries + nn.Dense(C, dtype=cfg.dtype, name="final_out")(
            _attention(qh, kh, vh, cfg.decoder_heads))
        queries = nn.LayerNorm(dtype=cfg.dtype, name="final_ln")(queries)

        iou_out = queries[:, 0]
        mask_toks = queries[:, 1: 1 + num_tokens]

        # upscale image features 4x
        x = keys.reshape(B, h, w, D)
        x = nn.ConvTranspose(D // 4, (2, 2), strides=(2, 2), dtype=cfg.dtype,
                             name="upscale_1")(x)
        x = nn.LayerNorm(dtype=cfg.dtype, name="upscale_ln")(x)
        x = jax.nn.gelu(x)
        x = nn.ConvTranspose(D // 8, (2, 2), strides=(2, 2), dtype=cfg.dtype,
                             name="upscale_2")(x)
        x = jax.nn.gelu(x)                       # [B, 4h, 4w, D/8]

        # per-mask hypernetwork MLPs
        hyper = []
        for i in range(num_tokens):
            t = mask_toks[:, i]
            for j in range(2):
                t = jax.nn.relu(nn.Dense(D, dtype=cfg.dtype,
                                         name=f"hyper_{i}_fc{j}")(t))
            hyper.append(nn.Dense(D // 8, dtype=cfg.dtype,
                                  name=f"hyper_{i}_out")(t))
        hyper = jnp.stack(hyper, axis=1)         # [B, M, D/8]
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper, x)

        # iou prediction head
        t = iou_out
        for j in range(2):
            t = jax.nn.relu(nn.Dense(D, dtype=cfg.dtype,
                                     name=f"iou_fc{j}")(t))
        iou_pred = nn.Dense(num_tokens, dtype=cfg.dtype, name="iou_out")(t)

        if multimask_output:
            return masks[:, 1:], iou_pred[:, 1:]
        return masks[:, :1], iou_pred[:, :1]


class Sam(nn.Module):
    """Full SAM. Trainable part = mask decoder (freeze the rest via masks)."""

    config: SamConfig

    def setup(self):
        self.image_encoder = SamImageEncoder(self.config, name="image_encoder")
        self.prompt_encoder = PromptEncoder(self.config, name="prompt_encoder")
        self.mask_decoder = MaskDecoder(self.config, name="mask_decoder")

    def encode_image(self, images):
        return self.image_encoder(images)

    def decode(self, image_embeddings, boxes=None, points=None,
               text_embeds=None, multimask_output: bool = False):
        sparse, dense = self.prompt_encoder(boxes=boxes, points=points,
                                            text_embeds=text_embeds)
        image_pe = self.prompt_encoder.get_dense_pe()
        return self.mask_decoder(image_embeddings, image_pe, sparse, dense,
                                 multimask_output)

    def predict_box(self, images, boxes):
        """images [B,3,H,W]; boxes [B,1,4] -> low-res masks [B,1,h*4,w*4]."""
        emb = jax.lax.stop_gradient(self.image_encoder(images))
        masks, _ = self.decode(emb, boxes=boxes)
        return masks

    def predict_text(self, images, text_embeds):
        emb = jax.lax.stop_gradient(self.image_encoder(images))
        masks, _ = self.decode(emb, text_embeds=text_embeds)
        return masks

    def __call__(self, images, boxes=None, text_embeds=None):
        return self.predict_box(images, boxes) if boxes is not None \
            else self.predict_text(images, text_embeds)


def postprocess_masks(masks: jnp.ndarray, input_size: Tuple[int, int],
                      original_size: Tuple[int, int],
                      img_size: int = 1024) -> jnp.ndarray:
    """Upscale low-res masks to the padded input frame, crop, resize to the
    original image (segment_anything Sam.postprocess_masks contract)."""
    B, M = masks.shape[:2]
    up = jax.image.resize(masks, (B, M, img_size, img_size), "bilinear")
    up = up[:, :, : input_size[0], : input_size[1]]
    return jax.image.resize(up, (B, M) + tuple(original_size), "bilinear")
