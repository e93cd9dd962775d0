"""Multi-scale deformable attention (the Grounding-DINO / deformable-DETR
core op — the reference reaches it through mmcv's CUDA
MultiScaleDeformableAttention; cf. SURVEY.md §2.2).

Semantics: for each query, head, feature level and sampling point, bilinearly
sample the value feature map at a predicted fractional location and blend
with predicted attention weights.

Implementation note (measured on v5e): Mosaic/Pallas exposes dynamic gathers
only WITHIN one vector register along the gather dimension ("Multiple source
vregs along gather dimension" otherwise), so an efficient Pallas kernel for
arbitrary-location bilinear gathers over multi-thousand-row value maps is not
expressible — the XLA `take_along_axis` formulation below IS the TPU-native
form (XLA lowers it to hardware gather loops and fuses the bilinear blend).
The four corner gathers are batched per level to minimize passes.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def msda_reference(value: jnp.ndarray,
                   spatial_shapes: Sequence[Tuple[int, int]],
                   sampling_locations: jnp.ndarray,
                   attention_weights: jnp.ndarray) -> jnp.ndarray:
    """value [B, S, H, D] (S = sum_l h_l*w_l); sampling_locations
    [B, Q, H, L, P, 2] in [0, 1] (x, y per level); attention_weights
    [B, Q, H, L, P] (softmaxed over L*P) -> [B, Q, H*D]."""
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    level_sizes = [h * w for h, w in spatial_shapes]
    assert sum(level_sizes) == S, (spatial_shapes, S)

    # [B, H, S, D] so gathers are per (batch, head)
    v = value.transpose(0, 2, 1, 3)
    out = jnp.zeros((B, H, Q, D), jnp.float32)
    offset = 0
    for l, (h_l, w_l) in enumerate(spatial_shapes):
        v_l = jax.lax.dynamic_slice_in_dim(v, offset, h_l * w_l, axis=2)
        offset += h_l * w_l
        loc = sampling_locations[:, :, :, l]          # [B, Q, H, P, 2]
        x = loc[..., 0] * w_l - 0.5
        y = loc[..., 1] * h_l - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = (x - x0).astype(jnp.float32)
        wy = (y - y0).astype(jnp.float32)

        def corner(xi, yi):
            inside = (xi >= 0) & (xi < w_l) & (yi >= 0) & (yi < h_l)
            xi_c = jnp.clip(xi, 0, w_l - 1).astype(jnp.int32)
            yi_c = jnp.clip(yi, 0, h_l - 1).astype(jnp.int32)
            flat = yi_c * w_l + xi_c                   # [B, Q, H, P]
            idx = flat.transpose(0, 2, 1, 3).reshape(B, H, Q * P)
            g = jnp.take_along_axis(
                v_l.astype(jnp.float32), idx[..., None], axis=2)
            g = g.reshape(B, H, Q, P, D)
            return g * inside.transpose(0, 2, 1, 3)[..., None]

        g00 = corner(x0, y0)
        g01 = corner(x0 + 1, y0)
        g10 = corner(x0, y0 + 1)
        g11 = corner(x0 + 1, y0 + 1)
        wxh = wx.transpose(0, 2, 1, 3)[..., None]
        wyh = wy.transpose(0, 2, 1, 3)[..., None]
        sampled = (g00 * (1 - wxh) * (1 - wyh) + g01 * wxh * (1 - wyh)
                   + g10 * (1 - wxh) * wyh + g11 * wxh * wyh)
        w = attention_weights[:, :, :, l].transpose(0, 2, 1, 3)[..., None]
        out = out + jnp.sum(sampled * w, axis=3)

    return out.transpose(0, 2, 1, 3).reshape(B, Q, H * D).astype(value.dtype)


def msda(value, spatial_shapes, sampling_locations, attention_weights):
    return msda_reference(value, spatial_shapes, sampling_locations,
                          attention_weights)
