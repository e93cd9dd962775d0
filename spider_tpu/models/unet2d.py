"""Conditional 2-D UNet (flax) — the denoiser of SD-1.5, SDXL and (1-channel)
AudioLDM. Config-driven so one implementation serves all three
(cf. the reference's vendored diffusers pipelines,
/root/reference/spider/models/custom_sd.py, custom_ad.py,
/root/reference/StoryDiffusion/utils/pipeline.py).

NHWC layout. Self-attention blocks support an extra-KV side input
(``story_kv``) — the mechanism behind StoryDiffusion's consistent
self-attention (Comic_Generation.py:46-268) expressed as a functional
argument instead of a swapped-in attention-processor class.
"""

from __future__ import annotations

import contextlib
import dataclasses
from contextvars import ContextVar
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from spider_tpu.models.schedulers import timestep_embedding


@dataclasses.dataclass(frozen=True)
class UNet2DConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    cross_attn_blocks: Tuple[bool, ...] = (True, True, True, False)
    layers_per_block: int = 2
    transformer_layers_per_block: Tuple[int, ...] = (1, 1, 1, 1)
    num_attention_heads: Tuple[int, ...] = (8, 8, 8, 8)
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    addition_embed_type: Optional[str] = None           # 'text_time' for SDXL
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 2816   # SDXL
    dtype: Any = jnp.float32


def unet_sd15() -> UNet2DConfig:
    return UNet2DConfig()


def unet_sdxl() -> UNet2DConfig:
    return UNet2DConfig(
        block_out_channels=(320, 640, 1280),
        cross_attn_blocks=(False, True, True),
        transformer_layers_per_block=(0, 2, 10),
        num_attention_heads=(5, 10, 20),
        cross_attention_dim=2048,
        addition_embed_type="text_time",
    )


def unet_audioldm() -> UNet2DConfig:
    # AudioLDM-l: 8 latent channels, CLAP class-embedding conditioning is
    # injected via the time embedding (see pipelines/ad.py).
    return UNet2DConfig(
        in_channels=8, out_channels=8,
        block_out_channels=(128, 256, 384, 640),
        cross_attn_blocks=(True, True, True, True),
        num_attention_heads=(8, 8, 8, 8),
        cross_attention_dim=128,
    )


def unet_tiny(cross_attention_dim: int = 32,
              addition_embed_type: Optional[str] = None,
              projection_dim: int = 40,
              in_channels: int = 4, out_channels: int = 4) -> UNet2DConfig:
    return UNet2DConfig(
        in_channels=in_channels, out_channels=out_channels,
        block_out_channels=(16, 32),
        cross_attn_blocks=(True, True),
        layers_per_block=1,
        transformer_layers_per_block=(1, 1),
        num_attention_heads=(2, 2),
        cross_attention_dim=cross_attention_dim,
        norm_num_groups=4,
        addition_embed_type=addition_embed_type,
        addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=projection_dim,
    )


class ResnetBlock2D(nn.Module):
    out_channels: int
    groups: int
    dtype: Any

    @nn.compact
    def __call__(self, x, temb):
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype,
                     name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


# Spatial-attention routing override for on-chip A/Bs (tools/ab_spatial.py):
# "auto" = the measured heuristic below; "flash"/"einsum" force one path.
_SPATIAL_FLASH = ContextVar("spatial_flash", default="auto")


@contextlib.contextmanager
def spatial_flash_config(mode: str):
    tok = _SPATIAL_FLASH.set(mode)
    try:
        yield
    finally:
        _SPATIAL_FLASH.reset(tok)


def _attention(q, k, v, heads: int):
    """Softmax attention on [B, T, C] projections.

    On TPU with long sequences this routes through the Pallas flash kernel
    with the head dim zero-padded to a multiple of 64 (padding is exact:
    padded dims contribute nothing to q.k dots and the padded outputs are
    dropped) — avoiding the O(T*S) fp32 logits an einsum+softmax
    materializes, which is what bounds full-size SDXL/story batches in HBM.
    """
    B, T, C = q.shape
    S = k.shape[1]
    D = C // heads
    # flash when the einsum path's fp32 logits would be heavy: either long
    # sequences, or large batch*heads (logits bytes > 512 MB cause spills —
    # measured: batch-4 SDXL 768px einsum runs 7x slower than batch-2).
    # Non-multiple-of-256 lengths (ZeroScope's 40x72=2880 spatial tokens,
    # SDXL's 2304) are PADDED up: padded keys are masked via kv_len inside
    # the kernel, padded query rows are sliced off — exact, and far cheaper
    # than the multi-GB fp32 logits the einsum would spill.
    logits_bytes = 4 * B * heads * T * S
    # Routing, all measured on chip:
    #  * D < 64 pads into the kernel's 64-lane-multiple head dim, so at
    #    MODERATE T the einsum wins — XLA flash-fuses it without
    #    materializing logits. ZeroScope's D=40 T=2880 level, measured at
    #    the full UNet3D CFG step (tools/ab_spatial.py): einsum
    #    298.6 ms/step vs 64-pad flash 400.6 (the r4 128-pad A/B lost by
    #    a similar margin at 14.3 vs 17.1 s/request) — the fused einsum
    #    stays the D<64 moderate-T winner.
    #  * But at T >= 4096 XLA's fusion gives up and materializes fp32
    #    logits (AudioLDM's D=16 T=8192 level: 5 x 438 ms fusions writing
    #    f32[2,8,8192,8192] = 2.2 s of a 2.3 s call) — padded flash is far
    #    cheaper there even at 4x head-dim padding (16 -> 64).
    mode = _SPATIAL_FLASH.get()
    use_flash = (jax.default_backend() == "tpu" and D <= 128
                 and (T >= 4096
                      or (D >= 64 and logits_bytes > 512 * 1024 * 1024)))
    if mode != "auto":
        use_flash = mode == "flash" and jax.default_backend() == "tpu"
    if use_flash:
        from spider_tpu.ops.attention import flash_attention

        qh = q.reshape(B, T, heads, D)
        kh = k.reshape(B, S, heads, D)
        vh = v.reshape(B, S, heads, D)
        Dp = -(-D // 64) * 64
        if D != Dp:
            pad = [(0, 0)] * 3 + [(0, Dp - D)]
            qh = jnp.pad(qh, pad)
            kh = jnp.pad(kh, pad)
            vh = jnp.pad(vh, pad)
        Tp = -(-T // 256) * 256
        Sp = -(-S // 256) * 256
        kv_len = None
        if Tp != T:
            qh = jnp.pad(qh, [(0, 0), (0, Tp - T), (0, 0), (0, 0)])
        if Sp != S:
            kh = jnp.pad(kh, [(0, 0), (0, Sp - S), (0, 0), (0, 0)])
            vh = jnp.pad(vh, [(0, 0), (0, Sp - S), (0, 0), (0, 0)])
            kv_len = jnp.full((B,), S, jnp.int32)
        out = flash_attention(qh, kh, vh, causal=False, kv_len=kv_len,
                              sm_scale=1.0 / (D ** 0.5))
        return out[:, :T, :, :D].reshape(B, T, C)
    q = q.reshape(B, T, heads, D).transpose(0, 2, 1, 3)
    k = k.reshape(B, S, heads, D).transpose(0, 2, 1, 3)
    v = v.reshape(B, S, heads, D).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k).astype(jnp.float32) / (D ** 0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", probs, v)
    return out.transpose(0, 2, 1, 3).reshape(B, T, C)


# Flash threshold for the LSE (story-coupling) path. The plain _attention
# einsum/flash crossover was tuned at 512 MB of f32 logits; the LSE path
# additionally has to RETURN its logsumexp for the merge, which blocks
# XLA's softmax-chain fusion and makes the einsum form materialize the
# logits — so flash pays off much earlier here. Module-level for A/B.
LSE_FLASH_BYTES = 512 * 1024 * 1024


def _attention_lse(q, k, v, heads: int, force_flash: bool = False,
                   block_q: int = 512, block_k: int = 512):
    """_attention that also returns the per-row logsumexp (fp32, [B,heads,T])
    so two partial attentions over disjoint key sets can be merged exactly
    (the story-coupling path: self keys + a group-shared reference bank).

    force_flash (TPU only) routes through the Pallas kernel regardless of
    the logits-bytes heuristic, with caller-chosen block sizes — the story
    bank call uses block_k = the whole (padded) bank so the group-shared
    K/V streams into VMEM once per q-block instead of being re-fetched per
    256-wide kv block (the default-block A/B that lost; see STORY_BANK_FLASH)."""
    B, T, C = q.shape
    S = k.shape[1]
    D = C // heads
    logits_bytes = 4 * B * heads * T * S
    use_flash = (jax.default_backend() == "tpu" and D <= 128
                 and (force_flash
                      or T >= 4096
                      or (D >= 64 and logits_bytes > LSE_FLASH_BYTES)))
    if use_flash:
        from spider_tpu.ops.attention import flash_attention_with_lse

        qh = q.reshape(B, T, heads, D)
        kh = k.reshape(B, S, heads, D)
        vh = v.reshape(B, S, heads, D)
        Dp = -(-D // 64) * 64          # kernel needs D % 64 == 0 (64 native)
        if Dp != D:
            pad = [(0, 0)] * 3 + [(0, Dp - D)]
            qh = jnp.pad(qh, pad)
            kh = jnp.pad(kh, pad)
            vh = jnp.pad(vh, pad)
        Tp = -(-T // 256) * 256
        Sp = -(-S // 256) * 256
        kv_len = None
        if Tp != T:
            qh = jnp.pad(qh, [(0, 0), (0, Tp - T), (0, 0), (0, 0)])
        if Sp != S:
            kh = jnp.pad(kh, [(0, 0), (0, Sp - S), (0, 0), (0, 0)])
            vh = jnp.pad(vh, [(0, 0), (0, Sp - S), (0, 0), (0, 0)])
            kv_len = jnp.full((B,), S, jnp.int32)
        out, lse = flash_attention_with_lse(qh, kh, vh, causal=False,
                                            kv_len=kv_len,
                                            sm_scale=1.0 / (D ** 0.5),
                                            block_q=block_q, block_k=block_k)
        return (out[:, :T, :, :D].reshape(B, T, C), lse[:, :, :T])
    qt = q.reshape(B, T, heads, D).transpose(0, 2, 1, 3)
    kt = k.reshape(B, S, heads, D).transpose(0, 2, 1, 3)
    vt = v.reshape(B, S, heads, D).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhtd,bhsd->bhts", qt, kt).astype(jnp.float32) \
        / (D ** 0.5)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    probs = (p / l).astype(vt.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", probs, vt)
    lse = (m + jnp.log(l))[..., 0]                       # [B, heads, T]
    return out.transpose(0, 2, 1, 3).reshape(B, T, C), lse


# Story group-bank coupling implementation: "split" runs self and bank
# attention separately and merges the partial softmaxes by logsumexp;
# "concat" broadcasts the group bank to every row and runs ONE attention
# over the concatenated key set (more HBM for the broadcast K/V, but a
# single fused kernel and no merge pass). Module-level so benches can A/B.
# Measured at the story operating point (SDXL 768px, 4 coupled frames, CFG,
# tools/story_ab.py): split 2.59 steps/s vs concat 1.97 — the broadcast
# K/V copies cost more than the extra merge pass saves, so split stays.
# ContextVars (not mutable globals): a failing A/B can't leak its ablation
# mode into real runs, and concurrent pipelines stay isolated.
_STORY_BANK_IMPL = ContextVar("story_bank_impl", default="split")

# How the bank side of the split runs on TPU. "auto": the LSE_FLASH_BYTES
# heuristic (einsum at the SDXL story shapes — materializes f32 logits,
# 425 MB/layer at up-2, 3.4 GB/layer at up-1). "fullk": force the Pallas
# flash kernel with block_k = the WHOLE padded bank and a q-block sized to
# a VMEM logits budget — the group-shared K/V streams once per q-block and
# no logits touch HBM. (The earlier A/B that rejected flash used the
# default 256-wide kv blocks: grid degenerated to 45 blocks per (b,h) with
# the bank re-fetched per block; full-bank blocks are the shape this
# attention actually has.) Measured at the story operating point
# (tools/story_ab.py, 2 runs): fullk 2.77/2.76 steps/s vs auto-einsum
# 2.59/2.62 — fullk is the default on TPU.
_STORY_BANK_FLASH = ContextVar("story_bank_flash", default="fullk")


@contextlib.contextmanager
def story_bank_config(impl: Optional[str] = None,
                      flash: Optional[str] = None):
    """Scoped override of the story bank-attention implementation
    (impl: split|concat|self_only; flash: fullk|auto) — the A/B hook for
    tools/story_ab.py and tests."""
    tokens = []
    if impl is not None:
        tokens.append((_STORY_BANK_IMPL, _STORY_BANK_IMPL.set(impl)))
    if flash is not None:
        tokens.append((_STORY_BANK_FLASH, _STORY_BANK_FLASH.set(flash)))
    try:
        yield
    finally:
        for var, tok in tokens:
            var.reset(tok)


def _bank_blocks(Tq: int, S: int):
    """(block_q, block_k) for the full-bank flash schedule: block_k covers
    the padded bank; block_q targets ~4 MB of f32 logits in VMEM, clamped
    to the (padded) query run so short runs don't over-allocate."""
    bk = -(-S // 256) * 256
    bq = max(256, (4 * 2 ** 20) // (4 * bk) // 256 * 256)
    return min(bq, max(256, -(-Tq // 256) * 256)), bk


class CrossAttention(nn.Module):
    heads: int
    dtype: Any

    @nn.compact
    def __call__(self, x, context=None, extra_kv=None):
        C = x.shape[-1]
        ctx = x if context is None else context
        to_k = nn.Dense(C, use_bias=False, dtype=self.dtype, name="to_k")
        to_v = nn.Dense(C, use_bias=False, dtype=self.dtype, name="to_v")
        q = nn.Dense(C, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = to_k(ctx)
        v = to_v(ctx)
        if extra_kv is not None:
            # Consistent self-attention: augment self-attn keys with
            # reference tokens (StoryDiffusion's SpatialAttnProcessor2_0
            # semantics, softmax over the union of both key sets). A bank
            # with a smaller leading dim is per-GROUP shared tokens.
            ek, ev = to_k(extra_kv), to_v(extra_kv)
            if ek.shape[0] != k.shape[0]:
                # Group-shared bank: instead of broadcasting the bank K/V to
                # every row and concatenating (two [B, K+T, C] HBM copies per
                # block — measured as the bulk of the story-coupling
                # overhead), run self-attention and bank-attention SEPARATELY
                # and merge the two partial softmaxes exactly via their
                # logsumexps. The bank side folds each group's rows into one
                # call ([g, rows*T] queries vs [g, K] keys), so bank K/V stay
                # at group size end-to-end and no concat is materialized.
                g = ek.shape[0]
                B, T, Cq = q.shape
                rows = B // g
                D = Cq // self.heads
                if _STORY_BANK_IMPL.get() == "self_only":
                    # Ablation only (tools/story_ab.py): drop the bank —
                    # measures the coupling plumbing without its math.
                    out = _attention(q, k, v, self.heads)
                    return nn.Dense(C, dtype=self.dtype, name="to_out")(out)
                if _STORY_BANK_IMPL.get() == "concat":
                    K = ek.shape[1]
                    ekb = jnp.broadcast_to(ek[:, None], (g, rows, K, Cq)) \
                        .reshape(B, K, Cq)
                    evb = jnp.broadcast_to(ev[:, None], (g, rows, K, Cq)) \
                        .reshape(B, K, Cq)
                    out = _attention(q, jnp.concatenate([ekb, k], axis=1),
                                     jnp.concatenate([evb, v], axis=1),
                                     self.heads)
                    return nn.Dense(C, dtype=self.dtype, name="to_out")(out)
                o_self, l_self = _attention_lse(q, k, v, self.heads)
                qg = q.reshape(g, rows * T, Cq)
                if (_STORY_BANK_FLASH.get() == "fullk"
                        and jax.default_backend() == "tpu"):
                    bq, bk = _bank_blocks(rows * T, ek.shape[1])
                    o_bank, l_bank = _attention_lse(
                        qg, ek, ev, self.heads, force_flash=True,
                        block_q=bq, block_k=bk)
                else:
                    o_bank, l_bank = _attention_lse(qg, ek, ev, self.heads)
                o_bank = o_bank.reshape(B, T, Cq)
                l_bank = (l_bank.reshape(g, self.heads, rows, T)
                          .transpose(0, 2, 1, 3).reshape(B, self.heads, T))
                l_tot = jnp.logaddexp(l_self, l_bank)
                w_self = jnp.exp(l_self - l_tot).transpose(0, 2, 1)[..., None]
                w_bank = jnp.exp(l_bank - l_tot).transpose(0, 2, 1)[..., None]
                os_ = o_self.reshape(B, T, self.heads, D).astype(jnp.float32)
                ob_ = o_bank.reshape(B, T, self.heads, D).astype(jnp.float32)
                out = ((os_ * w_self + ob_ * w_bank)
                       .reshape(B, T, Cq).astype(o_self.dtype))
                return nn.Dense(C, dtype=self.dtype, name="to_out")(out)
            k = jnp.concatenate([ek, k], axis=1)
            v = jnp.concatenate([ev, v], axis=1)
        out = _attention(q, k, v, self.heads)
        return nn.Dense(C, dtype=self.dtype, name="to_out")(out)


class FeedForward(nn.Module):
    dtype: Any

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        h = nn.Dense(C * 8, dtype=self.dtype, name="proj_in")(x)
        a, b = jnp.split(h, 2, axis=-1)
        return nn.Dense(C, dtype=self.dtype, name="proj_out")(a * jax.nn.gelu(b))


class BasicTransformerBlock(nn.Module):
    heads: int
    dtype: Any

    @nn.compact
    def __call__(self, x, context, story_kv=None, story=None):
        """story: optional dict(id_length=int, indices=[K] int32) activating
        consistent self-attention — every batch row's self-attn K/V is
        augmented with K sampled tokens drawn from the first `id_length`
        batch rows (StoryDiffusion, Comic_Generation.py:46-268, expressed as
        a batch-coupled functional attention instead of a processor swap)."""
        # Sow self-attention input so story pipelines can harvest reference
        # tokens from the id (write) pass if they run phases separately.
        self.sow("story", "self_attn_in", x)
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        extra = story_kv
        if story is not None:
            idl = story["id_length"]
            idx = story["indices"]
            groups = story.get("num_groups", 1)  # 2 under CFG concat batching
            BT, T, C = h.shape
            B = BT // groups
            hg = h.reshape(groups, B, T, C)
            bank = hg[:, :idl].reshape(groups, idl * T, C)
            # [groups, K, C] — CrossAttention projects once per group and
            # broadcasts the PROJECTIONS to the group's rows
            extra = jnp.take(bank, idx, axis=1)
        x = x + CrossAttention(self.heads, self.dtype, name="attn1")(
            h, context=None, extra_kv=extra)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + CrossAttention(self.heads, self.dtype, name="attn2")(h, context)
        h = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        return x + FeedForward(self.dtype, name="ff")(h)


class Transformer2D(nn.Module):
    heads: int
    depth: int
    groups: int
    dtype: Any

    @nn.compact
    def __call__(self, x, context, story_kv=None, story=None):
        B, H, W, C = x.shape
        residual = x
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         dtype=self.dtype, name="norm")(x)
        h = h.reshape(B, H * W, C)
        h = nn.Dense(C, dtype=self.dtype, name="proj_in")(h)
        for i in range(self.depth):
            h = BasicTransformerBlock(self.heads, self.dtype,
                                      name=f"block_{i}")(h, context, story_kv,
                                                         story)
        h = nn.Dense(C, dtype=self.dtype, name="proj_out")(h)
        return h.reshape(B, H, W, C) + residual


class UNet2DConditionModel(nn.Module):
    config: UNet2DConfig

    @nn.compact
    def __call__(self, sample: jnp.ndarray, timesteps: jnp.ndarray,
                 encoder_hidden_states: jnp.ndarray,
                 added_cond: Optional[Dict[str, jnp.ndarray]] = None,
                 story_kv: Optional[Dict[str, jnp.ndarray]] = None,
                 story: Optional[Dict[str, Dict]] = None):
        """sample [B,H,W,Cin]; timesteps [B]; encoder_hidden_states [B,S,Dctx].

        story_kv: optional {block_path: [B, S_extra, C]} extra self-attn KV.
        story: optional {block_path: dict(id_length, indices)} activating
          batch-coupled consistent self-attention in the named blocks
          (StoryDiffusion; applied to up-blocks in practice).
        """
        cfg = self.config
        tdim = cfg.block_out_channels[0] * 4
        temb = timestep_embedding(timesteps, cfg.block_out_channels[0])
        temb = nn.Dense(tdim, dtype=cfg.dtype, name="time_embed_1")(temb)
        temb = nn.Dense(tdim, dtype=cfg.dtype, name="time_embed_2")(nn.silu(temb))

        if cfg.addition_embed_type == "text_time":
            assert added_cond is not None
            text_embeds = added_cond["text_embeds"]      # [B, 1280] pooled
            time_ids = added_cond["time_ids"]            # [B, 6]
            tid = timestep_embedding(time_ids.reshape(-1),
                                     cfg.addition_time_embed_dim)
            tid = tid.reshape(text_embeds.shape[0], -1)
            add = jnp.concatenate([text_embeds, tid], axis=-1)
            add = nn.Dense(tdim, dtype=cfg.dtype, name="add_embed_1")(add)
            add = nn.Dense(tdim, dtype=cfg.dtype, name="add_embed_2")(nn.silu(add))
            temb = temb + add
        elif cfg.addition_embed_type == "class_embed":
            # AudioLDM: CLAP embedding projected into the time embedding.
            assert added_cond is not None
            cls = added_cond["class_embeds"]
            add = nn.Dense(tdim, dtype=cfg.dtype, name="class_embed_1")(cls)
            add = nn.Dense(tdim, dtype=cfg.dtype, name="class_embed_2")(nn.silu(add))
            temb = temb + add

        story_kv = story_kv or {}
        story = story or {}

        def skv(path):
            return story_kv.get(path)

        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=cfg.dtype, name="conv_in")(sample)
        skips = [x]
        # ---- down ------------------------------------------------------------
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(ch, cfg.norm_num_groups, cfg.dtype,
                                  name=f"down_{i}_res_{j}")(x, temb)
                if cfg.cross_attn_blocks[i] and cfg.transformer_layers_per_block[i] > 0:
                    x = Transformer2D(cfg.num_attention_heads[i],
                                      cfg.transformer_layers_per_block[i],
                                      cfg.norm_num_groups, cfg.dtype,
                                      name=f"down_{i}_attn_{j}")(
                        x, encoder_hidden_states, skv(f"down_{i}_attn_{j}"))
                skips.append(x)
            if i < len(cfg.block_out_channels) - 1:
                x = nn.Conv(ch, (3, 3), strides=2, padding=1,
                            dtype=cfg.dtype, name=f"down_{i}_downsample")(x)
                skips.append(x)
        # ---- mid -------------------------------------------------------------
        ch = cfg.block_out_channels[-1]
        x = ResnetBlock2D(ch, cfg.norm_num_groups, cfg.dtype,
                          name="mid_res_0")(x, temb)
        if cfg.cross_attn_blocks[-1] or cfg.addition_embed_type == "text_time":
            x = Transformer2D(cfg.num_attention_heads[-1],
                              max(cfg.transformer_layers_per_block[-1], 1),
                              cfg.norm_num_groups, cfg.dtype,
                              name="mid_attn")(x, encoder_hidden_states,
                                               skv("mid_attn"))
        x = ResnetBlock2D(ch, cfg.norm_num_groups, cfg.dtype,
                          name="mid_res_1")(x, temb)
        # ---- up --------------------------------------------------------------
        rev_channels = list(reversed(cfg.block_out_channels))
        rev_attn = list(reversed(cfg.cross_attn_blocks))
        rev_depth = list(reversed(cfg.transformer_layers_per_block))
        rev_heads = list(reversed(cfg.num_attention_heads))
        for i, ch in enumerate(rev_channels):
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = ResnetBlock2D(ch, cfg.norm_num_groups, cfg.dtype,
                                  name=f"up_{i}_res_{j}")(x, temb)
                if rev_attn[i] and rev_depth[i] > 0:
                    x = Transformer2D(rev_heads[i], rev_depth[i],
                                      cfg.norm_num_groups, cfg.dtype,
                                      name=f"up_{i}_attn_{j}")(
                        x, encoder_hidden_states, skv(f"up_{i}_attn_{j}"),
                        story.get(f"up_{i}_attn_{j}"))
            if i < len(rev_channels) - 1:
                B, H, W, C = x.shape
                x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
                x = nn.Conv(C, (3, 3), padding=1, dtype=cfg.dtype,
                            name=f"up_{i}_upsample")(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-5,
                         dtype=cfg.dtype, name="norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=cfg.dtype,
                       name="conv_out")(x)
