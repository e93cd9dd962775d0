"""Ring attention — context-parallel exact attention over a `context` mesh
axis. A capability the reference lacks entirely (it truncates to
max_context_len; SURVEY.md §2.3 row SP/CP) but a first-class long-context
option here: K/V shards rotate around the ring via `lax.ppermute` while each
device keeps an online-softmax accumulator, so memory per device is
O(T/ring) and the math matches full causal attention exactly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from spider_tpu.ops.attention import DEFAULT_MASK_VALUE


def _block_attn(q, k, v, sm_scale, mask):
    """One block: q [B,Tq,H,D] x k/v [B,Tk,Hkv,D] -> (out, m, l) with
    un-normalized accumulators. mask: [Tq, Tk] bool (True = attend) or
    None for unmasked; may be traced (the causal ring step folds the
    is-past-block condition into it so the logits are computed ONCE)."""
    B, Tq, Hq, D = q.shape
    Tk, Hkv = k.shape[1], k.shape[2]
    group = Hq // Hkv
    qf = q.astype(jnp.float32).reshape(B, Tq, Hkv, group, D)
    logits = jnp.einsum("bthgd,bshd->bhgts", qf, k.astype(jnp.float32))
    logits = logits * sm_scale
    if mask is not None:
        logits = jnp.where(mask[None, None, None], logits, DEFAULT_MASK_VALUE)
    m = jnp.max(logits, axis=-1, keepdims=True)            # [B,h,g,T,1]
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhgts,bshd->bthgd", p, v.astype(jnp.float32))
    return out.reshape(B, Tq, Hq, D), m.reshape(B, Hkv, group, Tq) \
        .transpose(0, 3, 1, 2).reshape(B, Tq, Hq), \
        l.reshape(B, Hkv, group, Tq).transpose(0, 3, 1, 2).reshape(B, Tq, Hq)


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mesh: Mesh, axis: str = "context",
                   causal: bool = True,
                   sm_scale: Optional[float] = None) -> jnp.ndarray:
    """q,k,v [B, T, H(q/kv), D] sharded over T on `axis` -> same sharding."""
    B, T, Hq, D = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / (D ** 0.5)
    n = mesh.shape[axis]
    T_local = T // n

    def local_fn(q, k, v):
        my = jax.lax.axis_index(axis)
        q_offset = my * T_local

        def step(carry, i):
            k_blk, v_blk, acc, m_run, l_run = carry
            src = (my - i) % n                    # owner of the current block
            k_offset = src * T_local
            # block role: full if src < my (past), diagonal if ==, skip else.
            # One logits computation per step: the is-past condition folds
            # into the mask (past blocks pass everything) instead of a second
            # unmasked attention + select.
            if causal:
                is_past = src < my
                q_pos = jnp.arange(q.shape[1])[:, None] + q_offset
                k_pos = jnp.arange(k_blk.shape[1])[None, :] + k_offset
                mask = is_past | (q_pos >= k_pos)
                out_b, m_b, l_b = _block_attn(q, k_blk, v_blk, sm_scale, mask)
                skip = src > my
            else:
                out_b, m_b, l_b = _block_attn(q, k_blk, v_blk, sm_scale, None)
                skip = False
            m_b = jnp.where(skip, -jnp.inf, m_b)
            l_b = jnp.where(skip, 0.0, l_b)
            out_b = jnp.where(skip, 0.0, out_b)

            m_new = jnp.maximum(m_run, m_b)
            safe = lambda x: jnp.where(jnp.isfinite(x), x, 0.0)
            alpha = safe(jnp.exp(m_run - m_new))
            beta = safe(jnp.exp(m_b - m_new))
            acc = acc * alpha[..., None] + out_b * beta[..., None]
            l_run = l_run * alpha + l_b * beta
            # rotate k/v to the next device
            perm = [(j, (j + 1) % n) for j in range(n)]
            k_blk = jax.lax.ppermute(k_blk, axis, perm)
            v_blk = jax.lax.ppermute(v_blk, axis, perm)
            return (k_blk, v_blk, acc, m_new, l_run), None

        acc0 = jnp.zeros(q.shape[:3] + (D,), jnp.float32)
        m0 = jnp.full(q.shape[:3], -jnp.inf, jnp.float32)
        l0 = jnp.zeros(q.shape[:3], jnp.float32)
        # mark initial carries as device-varying over the ring axis (they
        # become varying through the ppermute loop)
        acc0, m0, l0 = jax.lax.pcast((acc0, m0, l0), (axis,), to='varying')
        (k_f, v_f, acc, m_run, l_run), _ = jax.lax.scan(
            step, (k, v, acc0, m0, l0), jnp.arange(n))
        out = acc / jnp.maximum(l_run, 1e-20)[..., None]
        return out.astype(q.dtype)

    fn = shard_map(local_fn, mesh=mesh,
                   in_specs=(P(None, axis), P(None, axis), P(None, axis)),
                   out_specs=P(None, axis))
    return fn(q, k, v)
