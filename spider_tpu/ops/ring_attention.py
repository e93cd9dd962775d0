"""Ring attention — context-parallel exact attention over a `context` mesh
axis. A capability the reference lacks entirely (it truncates to
max_context_len; SURVEY.md §2.3 row SP/CP) but a first-class long-context
option here: K/V shards rotate around the ring via `lax.ppermute` while each
device keeps an online-softmax accumulator, so memory per device is
O(T/ring) and the math matches full causal attention exactly.

Per-block compute has two paths:
  * Pallas flash (default on TPU): each ring step runs the fused flash
    kernel on the local KV block via `flash_attention_with_lse` — no
    [T_local, T_block] logits are ever materialized, and the causal
    relation between the q shard and the rotating KV block is expressed
    as a (possibly negative) dynamic q_offset: past blocks pass the whole
    mask, the diagonal block is the usual triangle, and future blocks
    come back fully masked (lse = -inf) so the merge is a no-op.
  * XLA einsum fallback (CPU tests / tiny shapes).
Partials merge by logsumexp: out = sum_b out_b * exp(lse_b - lse_total).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from spider_tpu.ops.attention import (DEFAULT_MASK_VALUE,
                                      flash_attention_with_lse)


def _block_attn(q, k, v, sm_scale, mask):
    """XLA block fallback: q [B,Tq,H,D] x k/v [B,Tk,Hkv,D] ->
    (out_normalized, lse [B,Tq,Hq]). mask: [Tq,Tk] bool (True = attend) or
    None; may be traced."""
    B, Tq, Hq, D = q.shape
    Tk, Hkv = k.shape[1], k.shape[2]
    group = Hq // Hkv
    qf = q.astype(jnp.float32).reshape(B, Tq, Hkv, group, D)
    logits = jnp.einsum("bthgd,bshd->bhgts", qf, k.astype(jnp.float32))
    logits = logits * sm_scale
    if mask is not None:
        logits = jnp.where(mask[None, None, None], logits, DEFAULT_MASK_VALUE)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhgts,bshd->bthgd", p / jnp.maximum(l, 1e-30),
                     v.astype(jnp.float32))
    lse = (m + jnp.log(jnp.maximum(l, 1e-30)))[..., 0]    # [B,Hkv,g,Tq]
    if mask is not None:
        dead = ~jnp.any(mask, axis=-1)                    # [Tq]
        lse = jnp.where(dead[None, None, None], -jnp.inf, lse)
    lse = lse.reshape(B, Hq, Tq).transpose(0, 2, 1)       # [B,Tq,Hq]
    return out.reshape(B, Tq, Hq, D), lse


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mesh: Mesh, axis: str = "context",
                   causal: bool = True,
                   sm_scale: Optional[float] = None,
                   use_flash: Optional[bool] = None) -> jnp.ndarray:
    """q,k,v [B, T, H(q/kv), D] sharded over T on `axis` -> same sharding."""
    B, T, Hq, D = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / (D ** 0.5)
    if use_flash is None:
        use_flash = jax.default_backend() == "tpu"
    n = mesh.shape[axis]
    T_local = T // n

    def local_fn(q, k, v):
        my = jax.lax.axis_index(axis)
        q_offset = my * T_local

        def step(carry, i):
            k_blk, v_blk, o_run, lse_run = carry
            src = (my - i) % n                    # owner of the current block
            # relative offset of q row 0 vs this block's k row 0: >= T_local
            # for past blocks (mask passes everything), 0 on the diagonal,
            # <= -T_local for future blocks (fully masked -> lse = -inf).
            rel = (my - src) * T_local

            # Rotate FIRST, compute on the block we already hold: the
            # ppermute has no data dependence on this step's flash call, so
            # XLA's async collective-permute (start/done pair) overlaps the
            # ICI transfer with the per-block kernel — the classic
            # double-buffered ring. (The final iteration's rotate is a wasted
            # T_local slab per device; keeping the scan body uniform beats
            # special-casing it with a cond that would break the overlap.)
            perm = [(j, (j + 1) % n) for j in range(n)]
            k_next = jax.lax.ppermute(k_blk, axis, perm)
            v_next = jax.lax.ppermute(v_blk, axis, perm)

            if use_flash:
                o_b, lse_b = flash_attention_with_lse(
                    q, k_blk, v_blk, causal=causal, sm_scale=sm_scale,
                    q_offset=rel if causal else None,
                    use_pallas=use_flash)
                lse_b = lse_b.transpose(0, 2, 1)          # [B,Tq,Hq]
            else:
                if causal:
                    q_pos = jnp.arange(q.shape[1])[:, None] + rel
                    k_pos = jnp.arange(k_blk.shape[1])[None, :]
                    mask = q_pos >= k_pos
                else:
                    mask = None
                o_b, lse_b = _block_attn(q, k_blk, v_blk, sm_scale, mask)

            # logsumexp merge of two NORMALIZED partials: the running value
            # is re-weighted by its share of the new total.
            m_new = jnp.maximum(lse_run, lse_b)
            m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
            wa = jnp.where(jnp.isfinite(lse_run),
                           jnp.exp(lse_run - m_safe), 0.0)
            wb = jnp.where(jnp.isfinite(lse_b),
                           jnp.exp(lse_b - m_safe), 0.0)
            wsum = jnp.maximum(wa + wb, 1e-30)
            o_run = (o_run * (wa / wsum)[..., None]
                     + o_b.astype(jnp.float32) * (wb / wsum)[..., None])
            lse_total = jnp.where(jnp.isfinite(m_new),
                                  m_safe + jnp.log(wsum), -jnp.inf)
            return (k_next, v_next, o_run, lse_total), None

        o0 = jnp.zeros(q.shape[:3] + (D,), jnp.float32)
        lse0 = jnp.full(q.shape[:3], -jnp.inf, jnp.float32)
        # mark initial carries as device-varying over the ring axis (they
        # become varying through the ppermute loop). Skipped on the flash
        # path: pallas_call doesn't annotate vma, so that shard_map runs
        # with check_vma=False and pcast would be a no-op anyway.
        if not use_flash:
            o0, lse0 = jax.lax.pcast((o0, lse0), (axis,), to='varying')
        (k_f, v_f, o_run, lse_run), _ = jax.lax.scan(
            step, (k, v, o0, lse0), jnp.arange(n))
        # per-step merges keep o_run normalized; rows no block touched
        # (impossible under causal with a diagonal block) stay 0
        return o_run.astype(q.dtype)

    fn = shard_map(local_fn, mesh=mesh,
                   in_specs=(P(None, axis), P(None, axis), P(None, axis)),
                   out_specs=P(None, axis),
                   check_vma=not use_flash)
    return fn(q, k, v)
