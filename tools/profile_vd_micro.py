"""Per-block micro-profile of the ZeroScope UNet3D on the real chip.

Times each block type (TemporalConv, TransformerTemporal, Transformer2D,
ResnetBlock2D) in isolation at every pyramid level's true shape (CFG batch
2, 16 frames, 40x72 latents), so step time attributes to specific modules
instead of whole ablation classes. Then A/Bs candidate optimizations on
the worst offenders.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_vd_micro.py
"""

import time

import jax

from spider_tpu.common.cache import setup_compilation_cache

setup_compilation_cache()
import jax.numpy as jnp
import numpy as np


def timed(apply_fn, params, x, *extra, n=10):
    """Time a shape-preserving block: chain n applications inside ONE jit
    (lax.scan) and return only a f32 scalar, so neither per-dispatch relay
    latency (~30 ms) nor multi-MB output transfers pollute the number."""
    import jax.numpy as jnp
    from jax import lax

    def chain(p, x0):
        def body(c, _):
            return apply_fn(p, c, *extra), None
        out, _ = lax.scan(body, x0, None, length=n)
        return jnp.sum(out.astype(jnp.float32))

    params = jax.tree_util.tree_map(jnp.asarray, params)  # device-resident
    run = jax.jit(chain)
    float(run(params, x))                    # compile + warm
    t0 = time.perf_counter()
    float(run(params, x))                    # one dispatch, scalar fence
    return (time.perf_counter() - t0) / n


# ZeroScope pyramid at 40x72 latents, B=2 (CFG), F=16.
# (level, ch, H, W, n_tconv, n_tattn, n_attn2d, n_res)
# counts from unet3d.UNet3DConditionModel: down 2/level (+attn if cross),
# mid 2 res+2 tconv+1 attn+1 tattn at L3, up 3/level; stem tattn at L0.
LEVELS = [
    (0, 320, 40, 72, 5, 6, 5, 5),
    (1, 640, 20, 36, 5, 5, 5, 5),
    (2, 1280, 10, 18, 5, 5, 5, 5),
    (3, 1280, 5, 9, 7, 1, 1, 7),
]


def main():
    import dataclasses as dc

    from spider_tpu.models import unet2d as U2
    from spider_tpu.models import unet3d as U3
    from spider_tpu.models.factory import random_params_like

    B, F = 2, 16
    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    dev = jax.devices()[0]
    groups = 32

    total = {}
    for level, ch, H, W, n_tc, n_ta, n_a2, n_rs in LEVELS:
        x5 = jnp.zeros((B, F, H, W, ch), dtype)
        xf = jnp.zeros((B * F, H, W, ch), dtype)
        temb = jnp.zeros((B * F, 1280), dtype)
        ctx = jnp.zeros((B * F, 77, 1024), dtype)

        rows = {}

        tc = U3.TemporalConv(ch, groups, dtype)
        p = random_params_like(tc, rng, x5)
        rows["tconv"] = (timed(tc.apply, p, x5), n_tc)

        ta = U3.TransformerTemporal(8, groups, dtype)
        p = random_params_like(ta, rng, x5)
        rows["tattn"] = (timed(ta.apply, p, x5), n_ta)

        a2 = U2.Transformer2D(8, 1, groups, dtype)
        p = random_params_like(a2, rng, xf, ctx)
        rows["attn2d"] = (timed(a2.apply, p, xf, ctx), n_a2)

        rs = U2.ResnetBlock2D(ch, groups, dtype)
        p = random_params_like(rs, rng, xf, temb)
        rows["resnet"] = (timed(rs.apply, p, xf, temb), n_rs)

        for k, (dt, n) in rows.items():
            total[k] = total.get(k, 0.0) + dt * n
            print(f"L{level} ch{ch:4} {k:7s} {dt*1e3:7.2f} ms x{n} "
                  f"= {dt*n*1e3:8.1f} ms", flush=True)

    print("---- totals (sum of isolated blocks)")
    for k, v in sorted(total.items(), key=lambda kv: -kv[1]):
        print(f"{k:7s} {v*1e3:8.1f} ms")
    print(f"sum {sum(total.values())*1e3:.1f} ms "
          f"(vs measured full step ~381 ms)")


if __name__ == "__main__":
    main()
