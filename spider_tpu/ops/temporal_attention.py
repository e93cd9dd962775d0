"""Per-pixel frame attention — the UNet3D temporal-attention core.

ZeroScope's TemporalBasicBlock attends over the frame axis independently
at every pixel: logits are [F, F] per (pixel, head) with F=16. Lowered
through the naive per-head einsum this becomes ~46k batched 16x40x16
matmuls per call — under 2 % MXU tile utilization — and measured ~5.7 ms
per attention core at the 40x72 level (tools/ab_temporal.py,
tools/profile_vd_micro.py), the single largest inefficiency in the video
denoise step.

TPU formulation (round 4, the default on chip): a Pallas kernel that folds
(head, frame) into one [H*F, D] matrix per pixel and computes the FULL
[H*F, H*F] logit matrix on the MXU — one proper 128x128 tile for
ZeroScope's H=8, F=16 instead of 16 x D x 16 fragments — masked to the
F-wide block diagonal (row h*F+f sees col h'*F+g iff h == h', i.e.
x//F == y//F) so the masked softmax equals the per-head softmax exactly.
The grid tiles pixels (16 per step, measured optimum) so logits live
only in VMEM.

War notes from earlier rounds, kept because each shaped the design:
  * a Pallas VPU kernel (F-unrolled broadcast-reduce) LOST 9.9 ms vs
    3.1 ms isolated — elementwise frame-attention starves the VPU and a
    head_dim=40 lane layout pads 40 -> 128 per frame and blows VMEM;
  * the same H-fold expressed in XLA (use_blockdiag below) wins isolated
    (3.1 ms vs 5.7) but REGRESSES the full denoise 13.3 -> 14.3 s: its
    [B,P,HF,HF] logits materialize in HBM and break XLA's fusion of the
    surrounding chain. The Pallas form keeps the fold without the
    materialization and wins both isolated and in-graph.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK = -0.7 * float(jnp.finfo(jnp.float32).max)
_TATTN_PX = 16


def _tattn_kernel(q_ref, k_ref, v_ref, o_ref, *, frames: int, heads: int,
                  pixel_major: bool, scale: float, px: int):
    """One (batch, pixel-tile) step. Refs are [1, px, H*F, D] VMEM blocks —
    the (head, frame) fold happens OUTSIDE in XLA (a reshape/transpose that
    fuses into the surrounding projections; Mosaic cannot split the lane
    dim C -> (H, D) in-kernel).

    Per pixel: one FULL [H*F, H*F] logit matmul on the MXU (one 128x128
    tile for ZeroScope's H=8, F=16) masked to the F-wide block diagonal
    before softmax. Row x = h*F + f and col y = h'*F + g are valid iff
    x//F == y//F, which encodes "same head" in one compare; -inf entries
    contribute exp(-inf) = 0, so the masked softmax equals the per-head
    softmax exactly. Unlike the XLA blockdiag fold (module docstring),
    logits never leave VMEM — no HBM materialization / fusion barrier.
    """
    N = q_ref.shape[2]
    row = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    if pixel_major:
        # F-major fold (rows f*H + h, from a FREE [B,P,F,C] reshape):
        # same head <=> same residue mod H.
        mask = (row % heads) == (col % heads)
    else:
        # H-major fold (rows h*F + f): same head <=> same F-wide block.
        mask = (row // frames) == (col // frames)
    for p in range(px):                      # static unroll over the tile
        qp, kp, vp = q_ref[0, p], k_ref[0, p], v_ref[0, p]     # [N, D]
        logits = jax.lax.dot_general(
            qp, kp, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        logits = jnp.where(mask, logits * scale, _MASK)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        s = jnp.sum(e, axis=-1, keepdims=True)
        probs = (e / s).astype(vp.dtype)
        o_ref[0, p] = jax.lax.dot_general(
            probs, vp, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _tattn_pallas_fwd(q, k, v, heads: int, pixel_major: bool,
                      scale: float) -> jnp.ndarray:
    if pixel_major:
        B, P, F, C = q.shape
    else:
        B, F, P, C = q.shape
    H = heads
    D = C // H
    N = H * F

    if pixel_major:
        def fold(x):                         # [B,P,F,C] -> [B,P,F*H,D]
            return x.reshape(B, P, N, D)     # rows f*H + h — FREE
    else:
        def fold(x):                         # [B,F,P,C] -> [B,P,H*F,D]
            return (x.reshape(B, F, P, H, D).transpose(0, 2, 3, 1, 4)
                    .reshape(B, P, N, D))

    # Pixel tile: P that isn't a multiple of px is handled by the cdiv
    # grid — edge blocks are padded on read and masked on write, and
    # per-pixel attention can't cross-contaminate. The block's last two
    # dims (H*F, D) satisfy Mosaic's (8k, full-dim) tiling rule.
    # px=16 measured best in the full UNet3D step (301.6/299.3/299.5 ms
    # at px=8/16/32); module-level for benches to sweep.
    px = _TATTN_PX
    spec = pl.BlockSpec((1, px, N, D), lambda b, j: (b, j, 0, 0))
    out = pl.pallas_call(
        functools.partial(_tattn_kernel, frames=F, heads=H,
                          pixel_major=pixel_major, scale=scale, px=px),
        grid=(B, pl.cdiv(P, px)),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, P, N, D), q.dtype),
        interpret=jax.default_backend() != "tpu",   # CPU parity tests
    )(fold(q), fold(k), fold(v))
    if pixel_major:
        return out.reshape(B, P, F, C)
    return (out.reshape(B, P, H, F, D).transpose(0, 3, 1, 2, 4)
            .reshape(B, F, P, C))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _tattn_pallas(q, k, v, heads: int, pixel_major: bool, scale: float):
    return _tattn_pallas_fwd(q, k, v, heads, pixel_major, scale)


def _tattn_pallas_vjp_fwd(q, k, v, heads, pixel_major, scale):
    return _tattn_pallas_fwd(q, k, v, heads, pixel_major, scale), (q, k, v)


def _tattn_pallas_vjp_bwd(heads, pixel_major, scale, res, g):
    # Recompute through the differentiable einsum reference: same function,
    # so the cotangents are exact (up to f32 association).
    q, k, v = res
    layout = "bpfc" if pixel_major else "bfpc"
    _, vjp = jax.vjp(lambda q_, k_, v_: temporal_attention(
        q_, k_, v_, heads, scale=scale, use_pallas=False, layout=layout),
        q, k, v)
    return vjp(g)


_tattn_pallas.defvjp(_tattn_pallas_vjp_fwd, _tattn_pallas_vjp_bwd)


def temporal_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                       heads: int, *, scale: Optional[float] = None,
                       use_blockdiag: Optional[bool] = None,
                       use_pallas: Optional[bool] = None,
                       layout: str = "bfpc") -> jnp.ndarray:
    """Frame-axis attention at every pixel.

    q, k, v: [B, F, P, C] (layout="bfpc") or [B, P, F, C] ("bpfc") with
    C = heads * head_dim; attention is over F independently per
    (pixel, head). Returns the same layout it was given. The bpfc layout
    lets the Pallas path fold (frame, head) with a FREE reshape (rows
    f*H + h, mask x%H == y%H) instead of a per-call transpose pass.
    Measured caveat: switching UNet3D's temporal transformer pixel-major
    to exploit this REGRESSED the full step 301.7 -> 307.6 ms — XLA fuses
    the per-call folds into the projection epilogues better than it
    handles the module-level transposes — so bfpc remains the UNet3D
    default and bpfc serves callers already holding pixel-major data.
    """
    if layout == "bpfc":
        B, P, F, C = q.shape
    else:
        B, F, P, C = q.shape
    H = heads
    D = C // H
    if scale is None:
        scale = 1.0 / (D ** 0.5)
    if use_pallas is None:
        # The Pallas path wants a full-ish MXU tile per pixel (H*F >= 64)
        # and pays off when P is large enough to amortize the grid. The fold
        # dims must also satisfy Mosaic tiling ((H*F) and D aligned to the
        # 8-sublane grid) — unusual shapes fall back to XLA instead of
        # failing to compile.
        use_pallas = (jax.default_backend() == "tpu" and H * F >= 64
                      and H * F <= 1024 and P >= 32 and C % H == 0
                      and (H * F) % 8 == 0 and (C // H) % 8 == 0)
    if use_pallas:
        return _tattn_pallas(q, k, v, H, layout == "bpfc", float(scale))
    if layout == "bpfc":
        # Reference/einsum paths are written frame-major; round-trip the
        # layout (CPU tests and rare TPU fallbacks only).
        out = temporal_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), heads, scale=scale,
            use_blockdiag=use_blockdiag, use_pallas=False)
        return out.transpose(0, 2, 1, 3)
    if use_blockdiag is None:
        # Measured VERDICT (tools/ab_temporal.py + full-pipeline A/B on
        # chip): ISOLATED the fold wins 3.1 ms vs 5.7 ms — but inside the
        # full 40-step UNet3D scan it REGRESSES the video stage 13.3 ->
        # 14.3 s: XLA flash-fuses the per-head einsum chain in the large
        # graph, while the fold's [B,P,128,128] materialization (188 MB
        # per core) is a fusion barrier. Default stays einsum; the fold is
        # kept for callers whose surrounding graph cannot fuse (isolated
        # attention services).
        use_blockdiag = False

    if not use_blockdiag:
        # Logits laid out [B,H,F,G,P]: pixels ride the 128-lane axis and the
        # softmax over G reduces across sublanes — the [.., F, G] layout
        # keeps only 16 of 128 lanes live through the whole softmax chain.
        # Measured on chip (round 4, _vd_profile3): 327.6 -> 320.8 ms per
        # full UNet3D CFG step, output bit-identical.
        q4 = q.reshape(B, F, P, H, D)
        k4 = k.reshape(B, F, P, H, D)
        v4 = v.reshape(B, F, P, H, D)
        logits = jnp.einsum("bfphd,bgphd->bhfgp", q4, k4)
        logits = logits.astype(jnp.float32) * scale
        probs = jax.nn.softmax(logits, axis=3).astype(v.dtype)
        out = jnp.einsum("bhfgp,bgphd->bfphd", probs, v4)
        return out.reshape(B, F, P, C)

    def hf(x):                               # [B,F,P,C] -> [B,P,H*F,D]
        return (x.reshape(B, F, P, H, D).transpose(0, 2, 3, 1, 4)
                .reshape(B, P, H * F, D))

    Q2, K2, V2 = hf(q), hf(k), hf(v)
    full = jnp.einsum("bpxd,bpyd->bpxy", Q2, K2).astype(jnp.float32) * scale
    head_of = jnp.arange(H * F) // F
    mask = jnp.where(head_of[:, None] == head_of[None, :], 0.0, -jnp.inf)
    probs = jax.nn.softmax(full + mask, axis=-1).astype(v.dtype)
    out = jnp.einsum("bpxy,bpyd->bpxd", probs, V2)     # [B,P,H*F,D]
    return (out.reshape(B, P, H, F, D).transpose(0, 3, 1, 2, 4)
            .reshape(B, F, P, C))
