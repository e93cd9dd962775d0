"""Pipeline parallelism (GPipe-style) over a mesh axis.

The reference carries only a vestigial `ckpt_type='pp'` flag
(demo/inference_api.py:159, SURVEY.md §2.3); here PP is a real schedule:
stages are laid out one-per-device along a mesh axis, microbatch activations
flow stage-to-stage via `lax.ppermute`, and the classic (M + S - 1)-tick
GPipe pipeline fills/drains inside one `lax.scan` under `shard_map`.

Constraint: every stage maps activations of one shape to the same shape
(uniform transformer stages) — the layout where PP is actually used.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def gpipe(fn: Callable, stage_params, microbatches: jnp.ndarray,
          mesh: Mesh, axis: str = "model") -> jnp.ndarray:
    """Run `fn(params_i, x)` through S pipeline stages.

    stage_params: pytree with leading stage axis S on every leaf.
    microbatches: [M, ...] activations fed to stage 0.
    Returns [M, ...] outputs of the last stage (replicated).
    """
    S = mesh.shape[axis]
    M = microbatches.shape[0]
    mb_shape = microbatches.shape[1:]

    def local(params_local, xs):
        params_stage = jax.tree_util.tree_map(lambda p: p[0], params_local)
        idx = jax.lax.axis_index(axis)
        right_perm = [(j, (j + 1) % S) for j in range(S)]

        def tick(carry, t):
            prev_out = carry                      # my last output
            recv = jax.lax.ppermute(prev_out, axis, right_perm)
            feed = xs[jnp.minimum(t, M - 1)]
            inp = jnp.where(idx == 0, feed, recv)
            out = fn(params_stage, inp)
            # last stage emits microbatch t-(S-1) at tick t
            emit = (idx == S - 1) & (t >= S - 1) & (t - (S - 1) < M)
            y = jnp.where(emit, out, jnp.zeros_like(out))
            return out, (y, emit)

        init = jnp.zeros(mb_shape, microbatches.dtype)
        init = jax.lax.pcast(init, (axis,), to='varying')
        _, (ys, emits) = jax.lax.scan(tick, init,
                                      jnp.arange(M + S - 1))
        # compact the emitted ticks into [M, ...] (ticks S-1 .. S+M-2)
        ys = ys[S - 1:]
        # only the last stage holds real data; sum-replicate across stages
        ys = jax.lax.psum(ys, axis)
        return ys

    fn_sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
    )
    return fn_sharded(stage_params, microbatches)
