"""Profile the ZeroScope UNet3D denoise step on the real chip.

Times one jitted UNet apply at the reference operating point (CFG batch 2,
16 frames, 40x72 latents), optionally ablating temporal layers / spatial
attention via monkeypatch to attribute step time.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_vd.py \
           [--ablate] [--trace DIR]
"""

import argparse
import time

import jax

from spider_tpu.common.cache import setup_compilation_cache

setup_compilation_cache()
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n=6):
    out = fn(*args)
    np.asarray(out)  # fence through the relay
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / n


def build(cfg, label):
    from spider_tpu.models.factory import random_params_like

    from spider_tpu.models import unet3d as U3

    model = U3.UNet3DConditionModel(cfg)
    lat = jnp.zeros((2, 16, 40, 72, 4), jnp.bfloat16)
    tt = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 77, 1024), jnp.bfloat16)
    t0 = time.perf_counter()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = random_params_like(model, jax.random.PRNGKey(0), lat, tt, ctx)
    params = jax.tree_util.tree_map(
        lambda x: jax.device_put(
            np.asarray(x, np.float32).astype(jnp.bfloat16)
            if np.asarray(x).dtype == np.float32 else np.asarray(x),
            jax.devices()[0]), params)
    print(f"[{label}] init {time.perf_counter()-t0:.1f}s", flush=True)
    fwd = jax.jit(lambda p, l, t, c: model.apply(p, l, t, c))
    t0 = time.perf_counter()
    np.asarray(fwd(params, lat, tt, ctx))
    print(f"[{label}] compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    dt = timed(fwd, params, lat, tt, ctx)
    print(f"[{label}] step {dt*1e3:.1f} ms -> 40-step denoise ~{40*dt:.1f}s",
          flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ablate", action="store_true")
    args = ap.parse_args()

    import dataclasses as dc

    from spider_tpu.models import unet2d as U2
    from spider_tpu.models import unet3d as U3

    cfg = dc.replace(U3.unet3d_zeroscope(), dtype=jnp.bfloat16)
    dt_full = build(cfg, "full")

    if args.ablate:
        orig_tc = U3.TemporalConv.__call__
        orig_tt = U3.TransformerTemporal.__call__
        U3.TemporalConv.__call__ = lambda self, x: x
        U3.TransformerTemporal.__call__ = lambda self, x: x
        dt_nt = build(cfg, "no-temporal")
        print(f"   temporal layers: {(dt_full-dt_nt)*1e3:.1f} ms", flush=True)

        orig_t2d = U2.Transformer2D.__call__
        U2.Transformer2D.__call__ = \
            lambda self, x, context, story_kv=None, story=None: x
        dt_conv = build(cfg, "conv-only")
        print(f"   spatial transformers: {(dt_nt-dt_conv)*1e3:.1f} ms",
              flush=True)
        U2.Transformer2D.__call__ = orig_t2d
        U3.TemporalConv.__call__ = orig_tc
        U3.TransformerTemporal.__call__ = orig_tt


if __name__ == "__main__":
    main()
