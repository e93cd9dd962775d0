"""Profile the ZeroScope UNet3D denoise step on the real chip.

Times one jitted UNet apply at the reference operating point (CFG batch 2,
16 frames, 40x72 latents), optionally ablating temporal layers / spatial
attention via monkeypatch to attribute step time, and optionally writing a
jax.profiler trace.

Usage: python tools/profile_vd.py [--trace DIR] [--ablate]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n=6):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # fence
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None)
    ap.add_argument("--ablate", action="store_true")
    ap.add_argument("--steps", type=int, default=1)
    args = ap.parse_args()

    import dataclasses as dc

    from spider_tpu.models import unet3d as U3

    cfg = dc.replace(U3.unet3d_zeroscope(), dtype=jnp.bfloat16)
    model = U3.UNet3DConditionModel(cfg)
    # shape-true fast random init on device
    lat = jnp.zeros((2, 16, 40, 72, 4), jnp.bfloat16)
    tt = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 77, 1024), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), lat, tt, ctx)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params)
    n_params = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e9:.2f}B")

    fwd = jax.jit(lambda p, l, t, c: model.apply(p, l, t, c))
    dt = timed(fwd, params, lat, tt, ctx)
    print(f"full UNet3D step: {dt*1e3:.1f} ms  ({40*2*dt:.1f}s per 40-step CFG"
          " request if 2 calls/step; CFG is batched so x1)")

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(args.steps):
                out = fwd(params, lat, tt, ctx)
            np.asarray(out)
        print("trace written to", args.trace)

    if args.ablate:
        import flax.linen as nn

        # ablate: temporal layers as identity
        orig_tc = U3.TemporalConv.__call__
        orig_tt = U3.TransformerTemporal.__call__
        U3.TemporalConv.__call__ = lambda self, x: x
        U3.TransformerTemporal.__call__ = lambda self, x: x
        m2 = U3.UNet3DConditionModel(cfg)
        p2 = jax.jit(m2.init)(jax.random.PRNGKey(0), lat, tt, ctx)
        p2 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, p2)
        f2 = jax.jit(lambda p, l, t, c: m2.apply(p, l, t, c))
        d2 = timed(f2, p2, lat, tt, ctx)
        print(f"no-temporal step: {d2*1e3:.1f} ms (temporal = {(dt-d2)*1e3:.1f} ms)")
        U3.TemporalConv.__call__ = orig_tc
        U3.TransformerTemporal.__call__ = orig_tt

        # ablate: spatial transformers as identity too (pure conv core)
        from spider_tpu.models import unet2d as U2
        orig_t2d = U2.Transformer2D.__call__
        U2.Transformer2D.__call__ = \
            lambda self, x, context, story_kv=None, story=None: x
        U3.TemporalConv.__call__ = lambda self, x: x
        U3.TransformerTemporal.__call__ = lambda self, x: x
        m3 = U3.UNet3DConditionModel(cfg)
        p3 = jax.jit(m3.init)(jax.random.PRNGKey(0), lat, tt, ctx)
        p3 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, p3)
        f3 = jax.jit(lambda p, l, t, c: m3.apply(p, l, t, c))
        d3 = timed(f3, p3, lat, tt, ctx)
        print(f"conv-only step: {d3*1e3:.1f} ms "
              f"(spatial attn = {(d2-d3)*1e3:.1f} ms)")
        U2.Transformer2D.__call__ = orig_t2d
        U3.TemporalConv.__call__ = orig_tc
        U3.TransformerTemporal.__call__ = orig_tt


if __name__ == "__main__":
    main()
