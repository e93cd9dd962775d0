"""Quantized weight-only matmul kernels (TPU Pallas).

int4 serving path for the 8B decoder: decode is HBM-bandwidth-bound
(every weight is read once per token), so packing two 4-bit weights per
byte doubles tokens/s over int8 — IF the unpack fuses into the matmul.
XLA does fuse a plain int8->bf16 convert into dot operands, but NOT the
shift/mask nibble extraction (measured 2026-08-16: the XLA two-dot
formulation materializes the unpacked weights and runs *slower* than
int8, 73 vs 88 tok/s). This kernel does the unpack in VMEM where it's
free relative to the HBM read.

Packed layout (split-half, no lane interleave):
    packed[i, n] int8 holds  W[i, n]        in its LOW nibble (signed)
                        and  W[i + K/2, n]  in its HIGH nibble (signed)
so dequantization is two sign-extending shifts and the matmul becomes
two half-K dots. W column n is scaled by scale[n] (per-output-channel,
symmetric) — applied once to the fp32 accumulator.

Covers the role of the reference's GroupQuantizer/DeepSpeed int8
inference path (/root/reference/demo/inference_api.py:6-8,152-176) at
int4 instead.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_int4(w: jnp.ndarray) -> jnp.ndarray:
    """[K, N] int values in [-8, 7] -> [K/2, N] packed int8 (split-half)."""
    K = w.shape[0]
    assert K % 2 == 0, K
    lo = w[: K // 2].astype(jnp.int8)
    hi = w[K // 2:].astype(jnp.int8)
    return jnp.bitwise_or(
        jnp.bitwise_and(lo, jnp.int8(0x0F)),
        jnp.left_shift(hi, jnp.int8(4))).astype(jnp.int8)


def unpack_int4(packed: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Inverse of pack_int4 -> [K, N] in `dtype`."""
    four = jnp.int8(4)
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(packed, four), four)
    hi = jax.lax.shift_right_arithmetic(packed, four)
    return jnp.concatenate([lo, hi], axis=0).astype(dtype)


def quantize_int4(w: jnp.ndarray):
    """fp weights [K, N] -> (packed [K/2, N] int8, scale [N] fp32).

    Symmetric per-output-channel: q = round(w / s), s = max|w_col| / 7.
    """
    scale = jnp.maximum(jnp.abs(w).max(axis=0), 1e-8) / 7.0
    q = jnp.clip(jnp.round(w / scale[None, :]), -8, 7).astype(jnp.int8)
    return pack_int4(q), scale.astype(jnp.float32)


def _int4_matmul_kernel(xlo_ref, xhi_ref, w_ref, s_ref, o_ref, acc_ref,
                        *, n_k_blocks: int):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Mosaic has no i8 shifts (arith.shli on i8 vectors fails to legalize) —
    # promote to i32 lanes; sign-extension comes free with the convert.
    p = w_ref[:].astype(jnp.int32)                 # [bk2, bn]
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(p, 28), 28).astype(jnp.bfloat16)
    hi = jax.lax.shift_right_arithmetic(p, 4).astype(jnp.bfloat16)
    acc_ref[:] += (
        jnp.dot(xlo_ref[:], lo, preferred_element_type=jnp.float32)
        + jnp.dot(xhi_ref[:], hi, preferred_element_type=jnp.float32))

    @pl.when(k_idx == n_k_blocks - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)) \
            .astype(o_ref.dtype)


def int4_matmul(x: jnp.ndarray, packed: jnp.ndarray, scale: jnp.ndarray,
                *, block_m: int = 256, block_n: int = 512,
                block_k2: int = 256, out_dtype=None) -> jnp.ndarray:
    """x [.., K] @ dequant(packed [K/2, N], scale [N]) -> [.., N].

    HBM traffic per call ~= K*N/2 bytes (the packed weights); the nibble
    unpack happens on the VPU against VMEM-resident blocks. M is tiled too
    (block_m) so long-prompt prefill (M = B*T in the thousands) stays
    within the VMEM budget — decode (tiny M) runs a single M block.
    """
    out_dtype = out_dtype or x.dtype
    *lead, K = x.shape
    K2, N = packed.shape
    assert K == 2 * K2, (x.shape, packed.shape)
    x2 = x.reshape(-1, K)
    M = x2.shape[0]

    def fit(n, b):
        while b > 8 and n % b:
            b //= 2
        return b

    block_k2 = fit(K2, min(block_k2, K2))
    bm = min(block_m, M)  # M tail handled by grid padding
    bn = min(block_n, N)  # N tail handled by grid padding
    if K2 % block_k2 or M > 4 * block_m:
        # ragged K -> XLA formulation (correct, slower). Also long-prompt
        # prefill (large M = B*T): there the matmul is MXU-bound, the
        # one-off weight unpack amortizes over thousands of rows, and the
        # XLA dot avoids both the VMEM pressure and the much larger
        # Mosaic compile of a many-M-block kernel.
        w = unpack_int4(packed, x.dtype)
        y = jnp.dot(x2, w) * scale.astype(x.dtype)[None, :]
        return y.reshape(*lead, N).astype(out_dtype)

    n_k = K2 // block_k2
    grid = (pl.cdiv(M, bm), pl.cdiv(N, bn), n_k)

    out = pl.pallas_call(
        functools.partial(_int4_matmul_kernel, n_k_blocks=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, block_k2), lambda m, n, k: (m, k)),
            pl.BlockSpec((bm, block_k2), lambda m, n, k: (m, k)),
            pl.BlockSpec((block_k2, bn), lambda m, n, k: (k, n)),
            pl.BlockSpec((1, bn), lambda m, n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            bytes_accessed=K2 * N + 2 * M * K * x2.dtype.itemsize
            + M * N * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
    )(x2[:, :K2], x2[:, K2:], packed, scale.reshape(1, N))
    return out.reshape(*lead, N)


def int4_matmul_reference(x, packed, scale, out_dtype=None):
    """XLA reference (tests / non-TPU backends)."""
    out_dtype = out_dtype or x.dtype
    w = unpack_int4(packed, jnp.float32)
    y = jnp.dot(x.astype(jnp.float32), w) * scale.astype(jnp.float32)[None, :]
    return y.astype(out_dtype)
