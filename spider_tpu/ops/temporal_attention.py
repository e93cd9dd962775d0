"""Per-pixel frame attention — the UNet3D temporal-attention core.

ZeroScope's TemporalBasicBlock attends over the frame axis independently
at every pixel: logits are [F, F] per (pixel, head) with F=16. Lowered
through the naive per-head einsum this becomes ~46k batched 16x40x16
matmuls per call — under 2 % MXU tile utilization — and measured ~5.7 ms
per attention core at the 40x72 level (tools/ab_temporal.py,
tools/profile_vd_micro.py), the single largest inefficiency in the video
denoise step.

TPU formulation (measured 3.1 ms, bit-identical output): fold (head,
frame) into one 128-row axis and compute the FULL [H*F, H*F] logit matrix
per pixel — a proper 128 x D x 128 MXU tile instead of 16 x D x 16
fragments — then mask cross-head blocks with -inf so softmax zeroes them.
The masked softmax over a row equals the per-head softmax exactly (the
off-block terms contribute exp(-inf) = 0), so the H-fold FLOP waste buys
full MXU tiles and needs no diagonal extract/rebuild pass.

A Pallas VPU kernel was tried first and LOST to this XLA form (9.9 ms vs
3.1: the F-unrolled broadcast-reduce starves the VPU, and a head_dim=40
lane layout pads 40 -> 128 and blows VMEM). Kept here as a war note.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def temporal_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                       heads: int, *, scale: Optional[float] = None,
                       use_blockdiag: Optional[bool] = None) -> jnp.ndarray:
    """Frame-axis attention at every pixel.

    q, k, v: [B, F, P, C] with C = heads * head_dim; attention is over F
    independently per (pixel, head). Returns [B, F, P, C].
    """
    B, F, P, C = q.shape
    H = heads
    D = C // H
    if scale is None:
        scale = 1.0 / (D ** 0.5)
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
