"""A/B: ZeroScope UNet3D spatial attention einsum vs 64-pad Pallas flash.

The r4 A/B rejected flash for the D=40 T=2880 spatial levels — but it
padded the head dim to 128 (3.2x the real contraction). The kernel now
runs D=64 natively (ops/attention.py), so the pad is 1.6x; this re-runs
the match at the full UNet3D CFG step (VERDICT r4 next-step #4).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/ab_spatial.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from spider_tpu.common.cache import setup_compilation_cache

setup_compilation_cache()
import jax.numpy as jnp
import numpy as np

from spider_tpu.models import unet2d as u2
from spider_tpu.models import unet3d as u3

cfg = u3.unet3d_zeroscope()
cfg = type(cfg)(**{**cfg.__dict__, "dtype": jnp.bfloat16})
model = u3.UNet3DConditionModel(cfg)

sample = jnp.zeros((2, 16, 40, 72, 4), jnp.bfloat16)
tsteps = jnp.zeros((2,), jnp.int32)
ctx = jnp.zeros((2, 77, 1024), jnp.bfloat16)

shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), sample, tsteps, ctx)
leaves, treedef = jax.tree_util.tree_flatten(shapes)
keys = jax.random.split(jax.random.PRNGKey(0), len(leaves))
params = treedef.unflatten([
    (jax.random.normal(k, l.shape, jnp.bfloat16) * 0.02).astype(l.dtype)
    for k, l in zip(keys, leaves)])


def timeit(f, *a, n=10):
    o = f(*a)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n * 1e3


outs = {}
for mode in ("einsum", "flash", "auto"):
    with u2.spatial_flash_config(mode):
        f = jax.jit(lambda p, s, t, c: model.apply(p, s, t, c))
        ms = timeit(f, params, sample, tsteps, ctx)
        outs[mode] = np.asarray(f(params, sample, tsteps, ctx),
                                jnp.float32)
        print(f"spatial={mode}: {ms:.1f} ms/CFG-step", flush=True)

err = float(np.abs(outs["einsum"] - outs["flash"]).max())
print(f"max |einsum - flash| = {err:.2e} (bf16 step)")
