"""A/B the UpsampleNearestConv phase-conv against nearest-resize + SAME 3x3
conv at the actual decoder shapes (ZeroScope UNet3D up-levels, SDXL/SD-1.5
up-levels, VAE decoder levels) on the real chip.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/ab_upsample.py
"""

import time

import jax

from spider_tpu.common.cache import setup_compilation_cache

setup_compilation_cache()
import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from spider_tpu.ops.convs import UpsampleNearestConv

SHAPES = [
    # (label, B, H, W, C)  — upsample input shapes
    ("unet3d_up0", 32, 5, 9, 1280),
    ("unet3d_up1", 32, 10, 18, 1280),
    ("unet3d_up2", 32, 20, 36, 640),
    ("sdxl_up0", 2, 24, 24, 1280),
    ("sdxl_up1", 2, 48, 48, 640),
    ("sd15_up0", 2, 8, 8, 1280),
    ("sd15_up1", 2, 16, 16, 1280),
    ("sd15_up2", 2, 32, 32, 640),
    ("vae_dec_up0", 1, 64, 64, 512),
    ("vae_dec_up1", 1, 128, 128, 512),
    ("vae_dec_up2", 1, 256, 256, 256),
]


def timed(fn, *args, n=30):
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / n


def main():
    key = jax.random.PRNGKey(0)
    for label, B, H, W, C in SHAPES:
        x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
        m = UpsampleNearestConv(C, dtype=jnp.bfloat16)
        p = m.init(jax.random.PRNGKey(1), x)
        fused = jax.jit(lambda p, x: m.apply(p, x))

        conv = nn.Conv(C, (3, 3), padding=1, dtype=jnp.bfloat16)

        def ref(p, x):
            b, h, w, c = x.shape
            up = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
            return conv.apply({"params": p["params"]}, up)

        refj = jax.jit(ref)
        t_f = timed(fused, p, x)
        t_r = timed(refj, p, x)
        win = "FUSED" if t_f < t_r else "ref"
        print(f"{label:14s} [{B},{H},{W},{C}]: fused {t_f*1e3:7.3f} ms  "
              f"resize+conv {t_r*1e3:7.3f} ms  -> {win}", flush=True)


if __name__ == "__main__":
    main()
