"""Paged-attention decode kernel — block-paged KV read in place.

The XLA paged path (models/llama.py paged branch) materializes
``pool_k[page_table]`` — a gather that COPIES every slot's whole window
out of the pool each decode step (~1 GB/step at 16 slots x 512 window,
8B dims) before an einsum over it. This kernel instead walks the page
table with Pallas scalar prefetch: the grid's page dimension DMAs exactly
one pool block per step straight into VMEM (the index_map reads the
prefetched table), maintains a flash-style online-softmax accumulator
across pages, and never copies the window. Pages past a slot's kv_len
clamp to the slot's last valid block (Pallas dedups repeated fetches) and
their lanes are masked.

Single-token decode (T=1), GQA-aware. Exactness vs the gather+einsum
reference: tests/test_misc_ops.py::test_paged_attention_kernel_matches.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(meta_ref, q_ref, k_ref, v_ref, o_ref,
            m_scratch, l_scratch, acc_scratch,
            *, page: int, sm_scale: float, hkv: int, group: int):
    b = pl.program_id(0)
    pi = pl.program_id(1)
    n_pages = pl.num_programs(1)
    kv_len = meta_ref[0, b]

    @pl.when(pi == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    @pl.when(pi * page < kv_len)
    def _compute():
        q = q_ref[0].astype(jnp.float32)             # [Hq, D]
        k = k_ref[0].astype(jnp.float32)             # [page, Hkv, D]
        v = v_ref[0].astype(jnp.float32)
        Hq, D = q.shape
        q3 = q.reshape(hkv, group, D)
        # Per-kv-head unrolled 2-D matmuls: Mosaic's tpu.matmul requires
        # equal leading batch dims, which the [Hkv,G,D] x [page,Hkv,D]
        # batched form violates (observed "batch dims must be equal"
        # compile failure on chip). hkv is a small compile-time constant
        # (8 for the 8B GQA decoder) and decode is DMA-bound, so the
        # unroll costs nothing.
        for h in range(hkv):
            # logits[g, p] = sum_d q3[h, g, d] * k[p, h, d]
            logits = jax.lax.dot_general(
                q3[h], k[:, h, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # [G, page]
            logits = logits * sm_scale
            pos = pi * page + jax.lax.broadcasted_iota(
                jnp.int32, logits.shape, 1)
            logits = jnp.where(pos < kv_len, logits, DEFAULT_MASK_VALUE)

            m_prev = m_scratch[h]                    # [G, 1]
            l_prev = l_scratch[h]
            m_cur = jnp.max(logits, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(logits - m_new)              # [G, page]
            alpha = jnp.exp(m_prev - m_new)
            l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
            # pv[g, d] = sum_p p[g, p] * v[p, h, d]
            pv = jax.lax.dot_general(
                p, v[:, h, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # [G, D]
            acc_scratch[h] = acc_scratch[h] * alpha + pv
            m_scratch[h] = m_new
            l_scratch[h] = l_new

    @pl.when(pi == n_pages - 1)
    def _finish():
        l = l_scratch[...]
        out = acc_scratch[...] / jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = out.reshape(hkv * group, -1).astype(o_ref.dtype)


def paged_decode_attention(q: jnp.ndarray,
                           pool_k: jnp.ndarray, pool_v: jnp.ndarray,
                           page_table: jnp.ndarray, kv_len: jnp.ndarray,
                           *, sm_scale: float | None = None,
                           interpret: bool = False) -> jnp.ndarray:
    """q [B, Hq, D]; pool_k/v [N_blocks, page, Hkv, D];
    page_table [B, max_pages] int32; kv_len [B] -> out [B, Hq, D]."""
    B, Hq, D = q.shape
    _, page, Hkv, _ = pool_k.shape
    MP = page_table.shape[1]
    group = Hq // Hkv
    if sm_scale is None:
        sm_scale = 1.0 / (D ** 0.5)

    # meta row 0: kv_len; rows 1..: page table (scalar-prefetched so the
    # BlockSpec index map can route each grid step's DMA to its block)
    meta = jnp.concatenate([kv_len.astype(jnp.int32)[None, :],
                            page_table.astype(jnp.int32).T], axis=0)

    def kv_index(b, pi, meta):
        kv_len = meta[0, b]
        last = jnp.maximum((kv_len - 1) // page, 0)
        return (meta[1 + jnp.minimum(pi, last), b], 0, 0, 0)

    grid = (B, MP)
    out = pl.pallas_call(
        functools.partial(_kernel, page=page, sm_scale=sm_scale,
                          hkv=Hkv, group=group),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, Hq, D), lambda b, pi, meta: (b, 0, 0)),
                pl.BlockSpec((1, page, Hkv, D),
                             lambda b, pi, meta: kv_index(b, pi, meta)),
                pl.BlockSpec((1, page, Hkv, D),
                             lambda b, pi, meta: kv_index(b, pi, meta)),
            ],
            out_specs=pl.BlockSpec((1, Hq, D),
                                   lambda b, pi, meta: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((Hkv, group, 1), jnp.float32),
                pltpu.VMEM((Hkv, group, 1), jnp.float32),
                pltpu.VMEM((Hkv, group, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * MP * page * D,
            bytes_accessed=(B * MP * page * Hkv * D * 2
                            * pool_k.dtype.itemsize),
            transcendentals=B * Hq * MP * page,
        ),
    )(meta, q, pool_k, pool_v)
    return out
