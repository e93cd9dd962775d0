"""Fused multi-head attention for TPU.

A Pallas flash-attention kernel (online softmax, blocked over both query and
key/value) replaces the flash-attn/xformers CUDA kernels the reference relies
on (cf. /root/reference/requirements.txt:43,
/root/reference/qwen2.5omni_spider_web.py:100-103). Supports causal masking,
grouped-query attention (Hq a multiple of Hkv) and padded KV lengths — enough
for prefill; single-token decode uses the XLA einsum path which is
HBM-bound on the KV cache anyway.

Layouts: q [B, T, Hq, D]; k, v [B, S, Hkv, D]; output [B, T, Hq, D].
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


# ---------------------------------------------------------------------------
# Reference implementation (XLA): used on CPU, for tests, and for the VJP.
# ---------------------------------------------------------------------------

def mha_reference(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  causal: bool = True, sm_scale: Optional[float] = None,
                  kv_len: Optional[jnp.ndarray] = None,
                  q_offset: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """See flash_attention for the q_offset/kv_len conventions."""
    B, T, Hq, D = q.shape
    _, S, Hkv, _ = k.shape
    assert Hq % Hkv == 0, (Hq, Hkv)
    group = Hq // Hkv
    scale = sm_scale if sm_scale is not None else 1.0 / (D ** 0.5)
    qf = q.astype(jnp.float32).reshape(B, T, Hkv, group, D)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    logits = jnp.einsum("bthgd,bshd->bhgts", qf, kf) * scale
    live = kv_len[:, None, None] if kv_len is not None else jnp.full((B, 1, 1), S)
    if q_offset is None:
        # No kv_len: queries are the suffix of the window. With kv_len:
        # queries start at 0 (right-padded prefill).
        q_off = jnp.full((B, 1, 1), S - T) if kv_len is None else jnp.zeros((B, 1, 1), jnp.int32)
    else:
        q_off = jnp.broadcast_to(jnp.asarray(q_offset).reshape(-1, 1, 1), (B, 1, 1))
    k_pos = jnp.broadcast_to(jnp.arange(S)[None, None, :], (B, T, S))
    mask = k_pos < live
    if causal:
        q_pos = jnp.arange(T)[None, :, None] + q_off
        mask = mask & (q_pos >= k_pos)
    logits = jnp.where(mask[:, None, None], logits, DEFAULT_MASK_VALUE)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgts,bshd->bthgd", probs, vf)
    return out.reshape(B, T, Hq, D).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _flash_kernel(meta_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                  m_scratch, l_scratch, acc_scratch,
                  *, sm_scale: float, causal: bool, block_q: int,
                  block_k: int):
    """Grid: (B, Hq, num_q_blocks, num_kv_blocks); kv innermost so the f32
    accumulator scratch persists across kv iterations of one q block.

    meta_ref (scalar prefetch, SMEM): [2, B] — row 0 live kv lengths, row 1
    the global position of q row 0 (q_offset).
    """
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    num_k = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    kv_len = meta_ref[0, b]
    q_offset = meta_ref[1, b]
    q_pos = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0) + q_offset
    k_pos = ki * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1)

    run = True
    if causal:
        # Skip compute for blocks entirely above the diagonal.
        run = (qi * block_q + q_offset + block_q - 1) >= (ki * block_k)

    @pl.when(run)
    def _body():
        # Keep matmul operands in the input dtype (bf16 on the serving path)
        # so the MXU runs in its fast mode; accumulate in fp32.
        q = q_ref[0, 0]                      # [block_q, D]
        k = k_ref[0, 0]                      # [block_k, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale  # [block_q, block_k]

        mask = k_pos < kv_len
        if causal:
            mask = mask & (q_pos >= k_pos)
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_scratch[:]                           # [block_q, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_scratch[:] + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0, 0]                                 # [block_k, D]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_scratch[:] = acc_scratch[:] * alpha + pv
        m_scratch[:] = m_new
        l_scratch[:] = l_new

    @pl.when(ki == num_k - 1)
    def _finalize():
        l = l_scratch[:]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scratch[:] / safe_l).astype(o_ref.dtype)
        # logsumexp per row (residual for the Pallas backward)
        m = m_scratch[:]
        lse = jnp.where(l == 0.0, -jnp.inf, m + jnp.log(safe_l))
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _flash_forward(q, k, v, causal, sm_scale, kv_len, q_offset,
                   block_q, block_k):
    B, T, Hq, D = q.shape
    _, S, Hkv, _ = k.shape
    group = Hq // Hkv

    block_q = min(block_q, T)
    block_k = min(block_k, S)
    assert T % block_q == 0 and S % block_k == 0, (T, S, block_q, block_k)

    # [B, H, T, D] layout for clean tiling.
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    # Static causal offset when known at trace time: enables skipping the
    # DMA of fully-masked KV blocks below (the index map clamps skipped
    # blocks to the diagonal block, and Pallas dedups repeated fetches).
    static_off: Optional[int] = None
    if q_offset is None:
        if kv_len is None:
            static_off = S - T
            off = jnp.full((B,), S - T, jnp.int32)
        else:
            static_off = 0
            off = jnp.zeros((B,), jnp.int32)
    else:
        off = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32).reshape(-1), (B,))
    if kv_len is None:
        kv_len = jnp.full((B,), S, dtype=jnp.int32)
    meta = jnp.stack([kv_len.astype(jnp.int32), off], axis=0)  # [2, B]

    grid = (B, Hq, T // block_q, S // block_k)

    if causal and static_off is not None:
        _so = static_off

        def k_index(b, h, qi, ki, *_, _g=group):
            last_valid = (qi * block_q + block_q - 1 + _so) // block_k
            return (b, h // _g, jnp.minimum(ki, last_valid), 0)
    else:
        def k_index(b, h, qi, ki, *_, _g=group):
            return (b, h // _g, ki, 0)

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, sm_scale=sm_scale, causal=causal,
            block_q=block_q, block_k=block_k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D),
                             lambda b, h, qi, ki, *_: (b, h, qi, 0)),
                pl.BlockSpec((1, 1, block_k, D), k_index),
                pl.BlockSpec((1, 1, block_k, D), k_index),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, block_q, D),
                             lambda b, h, qi, ki, *_: (b, h, qi, 0)),
                pl.BlockSpec((1, 1, block_q, 8),
                             lambda b, h, qi, ki, *_: (b, h, qi, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, D), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct(qt.shape, q.dtype),
            jax.ShapeDtypeStruct((B, Hq, T, 8), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * T * S * D,
            bytes_accessed=(qt.size + kt.size + vt.size + qt.size) * qt.dtype.itemsize,
            transcendentals=B * Hq * T * S,
        ),
    )
    out_t, lse = out(meta, qt, kt, vt)
    return out_t.transpose(0, 2, 1, 3), lse


# ---------------------------------------------------------------------------
# Pallas backward kernels: recompute P blockwise from (q, k, lse) — memory is
# O(T) residuals instead of the O(T^2) logits an XLA-vjp recompute holds.
# ---------------------------------------------------------------------------

def _bwd_meta(B, S, T, kv_len, q_offset):
    if q_offset is None:
        off = (jnp.full((B,), S - T, jnp.int32) if kv_len is None
               else jnp.zeros((B,), jnp.int32))
    else:
        off = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32).reshape(-1), (B,))
    if kv_len is None:
        kv_len = jnp.full((B,), S, dtype=jnp.int32)
    return jnp.stack([kv_len.astype(jnp.int32), off], axis=0)


def _bwd_block(q, k, v, do, lse, delta, meta_ref, b, qi, ki,
               sm_scale, causal, block_q, block_k):
    """Shared P/dS recomputation for the dq and dkv kernels (f32)."""
    kv_len = meta_ref[0, b]
    q_offset = meta_ref[1, b]
    q_pos = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0) + q_offset
    k_pos = ki * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * sm_scale
    mask = k_pos < kv_len
    if causal:
        mask = mask & (q_pos >= k_pos)
    p = jnp.where(mask, jnp.exp(s - lse), 0.0)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta) * sm_scale
    return p, ds


def _flash_bwd_dq_kernel(meta_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                         delta_ref, dq_ref, dq_scratch,
                         *, sm_scale, causal, block_q, block_k):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    num_k = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)

    run = True
    if causal:
        q_offset = meta_ref[1, b]
        run = (qi * block_q + q_offset + block_q - 1) >= (ki * block_k)

    @pl.when(run)
    def _body():
        q = q_ref[0, 0].astype(jnp.float32)
        k = k_ref[0, 0].astype(jnp.float32)
        v = v_ref[0, 0].astype(jnp.float32)
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0][:, 0:1].astype(jnp.float32)
        delta = delta_ref[0, 0][:, 0:1].astype(jnp.float32)
        p, ds = _bwd_block(q, k, v, do, lse, delta, meta_ref, b, qi, ki,
                           sm_scale, causal, block_q, block_k)
        dq_scratch[:] = dq_scratch[:] + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(ki == num_k - 1)
    def _finalize():
        dq_ref[0, 0] = dq_scratch[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(meta_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                          delta_ref, dk_ref, dv_ref, dk_scratch, dv_scratch,
                          *, sm_scale, causal, block_q, block_k):
    b = pl.program_id(0)
    ki = pl.program_id(2)
    qi = pl.program_id(3)
    num_q = pl.num_programs(3)

    @pl.when(qi == 0)
    def _init():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    run = True
    if causal:
        q_offset = meta_ref[1, b]
        run = (qi * block_q + q_offset + block_q - 1) >= (ki * block_k)

    @pl.when(run)
    def _body():
        q = q_ref[0, 0].astype(jnp.float32)
        k = k_ref[0, 0].astype(jnp.float32)
        v = v_ref[0, 0].astype(jnp.float32)
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0][:, 0:1].astype(jnp.float32)
        delta = delta_ref[0, 0][:, 0:1].astype(jnp.float32)
        p, ds = _bwd_block(q, k, v, do, lse, delta, meta_ref, b, qi, ki,
                           sm_scale, causal, block_q, block_k)
        dv_scratch[:] = dv_scratch[:] + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_scratch[:] = dk_scratch[:] + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(qi == num_q - 1)
    def _finalize():
        dk_ref[0, 0] = dk_scratch[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scratch[:].astype(dv_ref.dtype)


def _flash_backward(q, k, v, out, lse, g, causal, sm_scale, kv_len, q_offset,
                    block_q, block_k, g_lse=None):
    """q [B,T,Hq,D]; k,v [B,S,Hkv,D]; lse [B,Hq,T]; g [B,T,Hq,D].

    g_lse ([B,Hq,T], optional): cotangent of the logsumexp output (the
    with-lse entry point). d lse / d s_ij = p_ij, so it folds into the
    row term: ds_ij = p_ij * (dp_ij - (delta_i - g_lse_i)).
    """
    B, T, Hq, D = q.shape
    _, S, Hkv, _ = k.shape
    group = Hq // Hkv
    block_q = min(block_q, T)
    block_k = min(block_k, S)

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    dot = g.transpose(0, 2, 1, 3)
    # delta = rowsum(dO * O) per (b, h, t)
    delta = jnp.sum(dot.astype(jnp.float32)
                    * out.transpose(0, 2, 1, 3).astype(jnp.float32), axis=-1)
    if g_lse is not None:
        delta = delta - g_lse.astype(jnp.float32)
    delta = jnp.broadcast_to(delta[..., None], delta.shape + (8,))
    meta = _bwd_meta(B, S, T, kv_len, q_offset)

    common = dict(sm_scale=sm_scale, causal=causal,
                  block_q=block_q, block_k=block_k)
    q_spec = pl.BlockSpec((1, 1, block_q, D),
                          lambda b, h, qi, ki, *_: (b, h, qi, 0))
    kv_spec = pl.BlockSpec((1, 1, block_k, D),
                           lambda b, h, qi, ki, *_, _g=group: (b, h // _g, ki, 0))
    row_spec = pl.BlockSpec((1, 1, block_q, 8),
                            lambda b, h, qi, ki, *_: (b, h, qi, 0))

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, Hq, T // block_q, S // block_k),
            in_specs=[q_spec, kv_spec, kv_spec, q_spec, row_spec, row_spec],
            out_specs=q_spec,
            scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
    )(meta, qt, kt, vt, dot, lse, delta)

    # dkv grid iterates q blocks innermost; outputs are PER Q-HEAD and summed
    # over the GQA group afterwards (avoids cross-program write races).
    q_spec2 = pl.BlockSpec((1, 1, block_q, D),
                           lambda b, h, ki, qi, *_: (b, h, qi, 0))
    kv_spec2 = pl.BlockSpec((1, 1, block_k, D),
                            lambda b, h, ki, qi, *_, _g=group: (b, h // _g, ki, 0))
    row_spec2 = pl.BlockSpec((1, 1, block_q, 8),
                             lambda b, h, ki, qi, *_: (b, h, qi, 0))
    dkv_out_spec = pl.BlockSpec((1, 1, block_k, D),
                                lambda b, h, ki, qi, *_: (b, h, ki, 0))
    dk_h, dv_h = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, Hq, S // block_k, T // block_q),
            in_specs=[q_spec2, kv_spec2, kv_spec2, q_spec2, row_spec2,
                      row_spec2],
            out_specs=(dkv_out_spec, dkv_out_spec),
            scratch_shapes=[pltpu.VMEM((block_k, D), jnp.float32),
                            pltpu.VMEM((block_k, D), jnp.float32)],
        ),
        out_shape=(jax.ShapeDtypeStruct((B, Hq, S, D), k.dtype),
                   jax.ShapeDtypeStruct((B, Hq, S, D), v.dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
    )(meta, qt, kt, vt, dot, lse, delta)

    dk = dk_h.reshape(B, Hkv, group, S, D).sum(axis=2).transpose(0, 2, 1, 3)
    dv = dv_h.reshape(B, Hkv, group, S, D).sum(axis=2).transpose(0, 2, 1, 3)
    return dq.transpose(0, 2, 1, 3), dk.astype(k.dtype), dv.astype(v.dtype)


# ---------------------------------------------------------------------------
# Public entry with custom VJP (Pallas forward AND backward on TPU).
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 7, 8))
def _flash_attention(q, k, v, causal, sm_scale, kv_len, q_offset,
                     block_q, block_k):
    out, _ = _flash_forward(q, k, v, causal, sm_scale, kv_len, q_offset,
                            block_q, block_k)
    return out


def _flash_fwd(q, k, v, causal, sm_scale, kv_len, q_offset, block_q, block_k):
    out, lse = _flash_forward(q, k, v, causal, sm_scale, kv_len, q_offset,
                              block_q, block_k)
    return out, (q, k, v, out, lse, kv_len, q_offset)


def _flash_bwd(causal, sm_scale, block_q, block_k,
               residuals, g):
    q, k, v, out, lse, kv_len, q_offset = residuals
    dq, dk, dv = _flash_backward(q, k, v, out, lse, g, causal, sm_scale,
                                 kv_len, q_offset, block_q, block_k)
    return dq, dk, dv, None, None


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 7, 8))
def _flash_attention_lse(q, k, v, causal, sm_scale, kv_len, q_offset,
                         block_q, block_k):
    """Like _flash_attention but also returns lse [B,Hq,T] — the residual
    ring attention needs to merge per-block partials exactly."""
    return _flash_forward(q, k, v, causal, sm_scale, kv_len, q_offset,
                          block_q, block_k)


def _flash_lse_fwd(q, k, v, causal, sm_scale, kv_len, q_offset,
                   block_q, block_k):
    out, lse = _flash_forward(q, k, v, causal, sm_scale, kv_len, q_offset,
                              block_q, block_k)
    return (out, lse), (q, k, v, out, lse, kv_len, q_offset)


def _flash_lse_bwd(causal, sm_scale, block_q, block_k, residuals, gs):
    q, k, v, out, lse, kv_len, q_offset = residuals
    g, g_lse = gs
    # lse residual rides in the padded [B,Hq,T,8] layout; all 8 lanes carry
    # the same row value, so take lane 0's cotangent scaled by the lane
    # count the forward broadcast into (sum of identical-lane cotangents).
    g_lse_rows = g_lse.sum(axis=-1) if g_lse.ndim == 4 else g_lse
    dq, dk, dv = _flash_backward(q, k, v, out, lse, g, causal, sm_scale,
                                 kv_len, q_offset, block_q, block_k,
                                 g_lse=g_lse_rows)
    return dq, dk, dv, None, None


_flash_attention_lse.defvjp(_flash_lse_fwd, _flash_lse_bwd)


def mha_reference_with_lse(q, k, v, causal=True, sm_scale=None,
                           kv_len=None, q_offset=None):
    """XLA (out, lse) reference — differentiable fallback for
    flash_attention_with_lse; lse [B,Hq,T]. Masking/position conventions
    identical to mha_reference."""
    B, T, Hq, D = q.shape
    _, S, Hkv, _ = k.shape
    group = Hq // Hkv
    scale = sm_scale if sm_scale is not None else 1.0 / (D ** 0.5)
    qf = q.astype(jnp.float32).reshape(B, T, Hkv, group, D)
    logits = jnp.einsum("bthgd,bshd->bhgts", qf,
                        k.astype(jnp.float32)) * scale
    live = kv_len[:, None, None] if kv_len is not None \
        else jnp.full((B, 1, 1), S)
    if q_offset is None:
        q_off = jnp.full((B, 1, 1), S - T) if kv_len is None \
            else jnp.zeros((B, 1, 1), jnp.int32)
    else:
        q_off = jnp.broadcast_to(
            jnp.asarray(q_offset).reshape(-1, 1, 1), (B, 1, 1))
    k_pos = jnp.broadcast_to(jnp.arange(S)[None, None, :], (B, T, S))
    mask = k_pos < live
    if causal:
        q_pos = jnp.arange(T)[None, :, None] + q_off
        mask = mask & (q_pos >= k_pos)
    logits = jnp.where(mask[:, None, None], logits, DEFAULT_MASK_VALUE)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhgts,bshd->bthgd", p / jnp.maximum(l, 1e-30),
                     v.astype(jnp.float32))
    row_dead = ~jnp.any(mask, axis=-1)                    # [B, T]
    lse = (m + jnp.log(jnp.maximum(l, 1e-30)))[..., 0]    # [B,Hkv,g,T]
    lse = jnp.where(row_dead[:, None, None], -jnp.inf, lse)
    lse = lse.transpose(0, 1, 2, 3).reshape(B, Hkv * group, T)
    return out.reshape(B, T, Hq, D).astype(q.dtype), lse


def flash_attention_with_lse(q, k, v, *, causal: bool = True,
                             sm_scale: Optional[float] = None,
                             kv_len: Optional[jnp.ndarray] = None,
                             q_offset: Optional[jnp.ndarray] = None,
                             block_q: int = 512, block_k: int = 512,
                             use_pallas: Optional[bool] = None):
    """(out [B,T,Hq,D], lse [B,Hq,T]) — flash_attention that also returns
    the row logsumexp so callers (ring attention) can merge partial blocks
    exactly. Differentiable: the lse cotangent folds into the flash
    backward's delta term."""
    B, T, Hq, D = q.shape
    S = k.shape[1]
    if sm_scale is None:
        sm_scale = 1.0 / (D ** 0.5)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    def _fit(n, requested):
        b = min(requested, n)
        while b >= 8 and n % b:
            b //= 2
        return b if b >= 8 and n % b == 0 else None

    bq, bk = _fit(T, block_q), _fit(S, block_k)
    if not use_pallas or bq is None or bk is None or D % 64 or T < 8:
        return mha_reference_with_lse(q, k, v, causal=causal,
                                      sm_scale=sm_scale, kv_len=kv_len,
                                      q_offset=q_offset)
    out, lse8 = _flash_attention_lse(q, k, v, causal, sm_scale, kv_len,
                                     q_offset, bq, bk)
    return out, lse8[..., 0]


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                    causal: bool = True, sm_scale: Optional[float] = None,
                    kv_len: Optional[jnp.ndarray] = None,
                    q_offset: Optional[jnp.ndarray] = None,
                    block_q: int = 512, block_k: int = 512,
                    use_pallas: Optional[bool] = None) -> jnp.ndarray:
    """Fused attention. q [B,T,Hq,D]; k,v [B,S,Hkv,D] -> [B,T,Hq,D].

    Position conventions for causal masking:
      * kv_len is None: queries are the LAST T positions of the window
        (suffix continuation; offset S - T).
      * kv_len given, q_offset None: queries start at position 0
        (right-padded prefill over a padded cache).
      * q_offset given ([B] or scalar): explicit global position of q row 0
        (chunked prefill continuation: pass the cache write index).
    """
    B, T, Hq, D = q.shape
    _, S, Hkv, _ = k.shape
    if sm_scale is None:
        sm_scale = 1.0 / (D ** 0.5)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    # Fit block sizes to the sequence lengths: the largest power-of-two
    # block <= requested that divides T/S (SDXL's 768px self-attention is
    # T=2304 = 9*256 — the 512 default would otherwise silently fall back
    # to the O(T*S)-logits reference path, the exact spill the caller's
    # flash heuristic tries to avoid).
    def _fit(n, requested):
        b = min(requested, n)
        while b >= 8 and n % b:
            b //= 2
        return b if b >= 8 and n % b == 0 else None

    bq, bk = _fit(T, block_q), _fit(S, block_k)
    # Tiny/ragged shapes: XLA path. D=64 runs the kernel natively (Mosaic
    # tiles a 64-lane last dim; measured on-par with padding D to 128 at the
    # SDXL operating points — the kernel is not MXU-bound there — so callers
    # may pass D=64 directly instead of zero-padding).
    if not use_pallas or bq is None or bk is None or D % 64 or T < 8:
        return mha_reference(q, k, v, causal=causal, sm_scale=sm_scale,
                             kv_len=kv_len, q_offset=q_offset)
    return _flash_attention(q, k, v, causal, sm_scale, kv_len, q_offset,
                            bq, bk)
