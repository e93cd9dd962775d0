"""Speed-of-light FLOP audit: count dot/conv FLOPs of one model call from
the jaxpr (trace only — no compile, runs on CPU in seconds).

The point: decide whether a stage is compute-bound at the hardware ceiling
before burning time on kernel work. E.g. one CFG-pair ZeroScope UNet3D step
(2x16x40x72x4 latents, 77x1024 context) is ~27.9 TFLOP; at the chip's
measured ~141 TFLOP/s bf16 matmul ceiling a 40-step denoise can never beat
~7.9 s on ONE chip — the <=7 s target requires sharding the denoise over
the mesh (see docs/video_speed_of_light.md and pipelines/vd.py
denoise_sharded).

Usage: python tools/flops_audit.py [unet3d|unet2d|sdxl|llama-decode]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np


def count_flops(fn, *args) -> dict:
    """Walk the jaxpr of fn(*args) and return dot/conv FLOP totals.

    args may be jax.ShapeDtypeStruct trees (nothing is materialized)."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    tot = {"dot": 0.0, "conv": 0.0}

    def walk(jp, mult=1.0):
        for eqn in jp.eqns:
            # scan bodies execute `length` times (the scan-stacked decoder
            # runs its body once per layer) — scale nested counts.
            sub_mult = mult * eqn.params.get("length", 1) \
                if eqn.primitive.name == "scan" else mult
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    walk(sub.jaxpr, sub_mult)
                elif isinstance(sub, (list, tuple)):
                    for s in sub:
                        if hasattr(s, "jaxpr"):
                            walk(s.jaxpr, sub_mult)
            if eqn.primitive.name == "dot_general":
                a, b = eqn.invars[0].aval, eqn.invars[1].aval
                (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
                K = np.prod([a.shape[i] for i in lc])
                Bt = np.prod([a.shape[i] for i in lb])
                M = np.prod([a.shape[i] for i in range(len(a.shape))
                             if i not in lc and i not in lb])
                N = np.prod([b.shape[i] for i in range(len(b.shape))
                             if i not in rc and i not in rb])
                tot["dot"] += 2.0 * Bt * M * N * K * mult
            elif eqn.primitive.name == "conv_general_dilated":
                o = eqn.outvars[0].aval
                rhs = eqn.invars[1].aval
                rs = eqn.params["dimension_numbers"].rhs_spec
                cin = rhs.shape[rs[1]]
                spatial = np.prod([rhs.shape[i] for i in rs[2:]])
                tot["conv"] += 2.0 * np.prod(o.shape) * cin * spatial * mult

    walk(jaxpr.jaxpr)
    tot["total"] = tot["dot"] + tot["conv"]
    return tot


def _report(name, tot, note=""):
    print(f"{name}: dot {tot['dot'] / 1e12:.2f} TFLOP + conv "
          f"{tot['conv'] / 1e12:.2f} TFLOP = {tot['total'] / 1e12:.2f} TFLOP"
          f"{'  (' + note + ')' if note else ''}")


def audit_unet3d():
    """One CFG-pair ZeroScope step at the reference operating point
    (576x320x16f -> 40x72 latents; spider.py:462-463)."""
    from spider_tpu.models import unet3d as U3

    cfg = dataclasses.replace(U3.unet3d_zeroscope(), dtype=jnp.bfloat16)
    m = U3.UNet3DConditionModel(cfg)
    x = jax.ShapeDtypeStruct((2, 16, 40, 72, 4), jnp.bfloat16)
    t = jax.ShapeDtypeStruct((2,), jnp.int32)
    ctx = jax.ShapeDtypeStruct((2, 77, 1024), jnp.bfloat16)
    p = jax.eval_shape(m.init, jax.random.PRNGKey(0), x, t, ctx)
    tot = count_flops(m.apply, p, x, t, ctx)
    _report("UNet3D CFG step (2x16x40x72)", tot,
            "x40 steps / 141 TFLOP/s ceiling = "
            f"{tot['total'] * 40 / 141e12:.1f} s floor on one chip")
    return tot


def audit_unet2d(sdxl=False):
    from spider_tpu.models import unet2d as U2

    if sdxl:
        cfg = dataclasses.replace(U2.unet_sdxl(), dtype=jnp.bfloat16)
        lat, ctxd = (2, 96, 96, 4), 2048
        extra = dict(
            text_embeds=jax.ShapeDtypeStruct((2, 1280), jnp.bfloat16),
            time_ids=jax.ShapeDtypeStruct((2, 6), jnp.bfloat16))
    else:
        cfg = dataclasses.replace(U2.unet_sd15(), dtype=jnp.bfloat16)
        lat, ctxd = (2, 64, 64, 4), 768
        extra = {}
    m = U2.UNet2DConditionModel(cfg)
    x = jax.ShapeDtypeStruct(lat, jnp.bfloat16)
    t = jax.ShapeDtypeStruct((2,), jnp.int32)
    ctx = jax.ShapeDtypeStruct((2, 77, ctxd), jnp.bfloat16)

    def init_fn(rng):
        kw = dict(added_cond={k: jnp.zeros(v.shape, v.dtype)
                              for k, v in extra.items()}) if extra else {}
        return m.init(rng, jnp.zeros(lat, jnp.bfloat16),
                      jnp.zeros((2,), jnp.int32),
                      jnp.zeros((2, 77, ctxd), jnp.bfloat16), **kw)

    p = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    if extra:
        tot = count_flops(lambda p_, x_, t_, c_, te, ti: m.apply(
            p_, x_, t_, c_, added_cond=dict(text_embeds=te, time_ids=ti)),
            p, x, t, ctx, extra["text_embeds"], extra["time_ids"])
        _report("SDXL UNet CFG step (2x96x96)", tot)
    else:
        tot = count_flops(m.apply, p, x, t, ctx)
        _report("SD-1.5 UNet CFG step (2x64x64)", tot)
    return tot


def audit_llama_decode():
    """One bs=1 decode step of the 8B decoder (matmul-only lower bound;
    decode is HBM-bandwidth-bound, so the binding number is bytes not
    FLOPs — 8B int8 weights ~8 GB/step / 819 GB/s ~ 9.8 ms -> 102 tok/s
    speed of light; printed for contrast)."""
    from spider_tpu.models import llama as L

    cfg = dataclasses.replace(L.llama3_8b(), param_dtype=jnp.bfloat16)
    m = L.LlamaForCausalLM(cfg)
    ids = jax.ShapeDtypeStruct((1, 1), jnp.int32)
    p = jax.eval_shape(m.init, jax.random.PRNGKey(0),
                       jax.ShapeDtypeStruct((1, 8), jnp.int32))
    tot = count_flops(lambda p_, i_: m.apply(p_, i_), p, ids)
    _report("Llama-8B bs=1 decode step", tot,
            "bandwidth-bound in practice: ~8 GB int8 weights/step")
    return tot


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "unet3d"
    {"unet3d": audit_unet3d,
     "unet2d": audit_unet2d,
     "sdxl": lambda: audit_unet2d(sdxl=True),
     "llama-decode": audit_llama_decode}[which]()
