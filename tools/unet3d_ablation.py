"""Ablation profile of one full-size UNet3D CFG step at the ZeroScope
operating point (2x16x40x72 latents, 77x1024 context) — isolates the share
of spatial attention, temporal attention, and GroupNorm in the step time.
All ablations keep the param tree identical so one random init serves all."""
import time, functools
import numpy as np
import jax, jax.numpy as jnp
import flax.linen as nn

from spider_tpu.models import unet3d as u3
from spider_tpu.models import unet2d as u2
from spider_tpu.ops import temporal_attention as ta_mod

cfg = u3.unet3d_zeroscope()
cfg = type(cfg)(**{**cfg.__dict__, "dtype": jnp.bfloat16})
model = u3.UNet3DConditionModel(cfg)

sample = jnp.zeros((2, 16, 40, 72, 4), jnp.bfloat16)
tsteps = jnp.zeros((2,), jnp.int32)
ctx = jnp.zeros((2, 77, 1024), jnp.bfloat16)

shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), sample, tsteps, ctx)
key = jax.random.PRNGKey(0)
leaves, treedef = jax.tree_util.tree_flatten(shapes)
keys = jax.random.split(key, len(leaves))
params = treedef.unflatten([
    (jax.random.normal(k, l.shape, jnp.bfloat16) * 0.02).astype(l.dtype)
    for k, l in zip(keys, leaves)])
print("params leaves:", len(leaves), flush=True)

orig_attn = u2._attention
orig_tattn = ta_mod.temporal_attention
orig_gn = nn.GroupNorm


class _GNStub(nn.Module):
    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: object = None
    use_bias: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def timeit(f, *a):
    t0 = time.perf_counter()
    o = f(*a); jax.block_until_ready(o)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter(); n = 10
    for _ in range(n):
        o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n * 1e3, compile_s


def run_variant(name, attn=None, tattn=None, gn=None):
    u2._attention = attn or orig_attn
    u3._attention = attn or orig_attn
    ta_mod.temporal_attention = tattn or orig_tattn
    if gn is not None:
        nn.GroupNorm = gn
    try:
        f = jax.jit(lambda p, s, t, c: model.apply(p, s, t, c))
        ms, comp = timeit(f, params, sample, tsteps, ctx)
        print(f"{name}: {ms:.1f} ms/CFG-step  (compile {comp:.0f}s)", flush=True)
        return ms
    finally:
        u2._attention = orig_attn
        u3._attention = orig_attn
        ta_mod.temporal_attention = orig_tattn
        nn.GroupNorm = orig_gn


base = run_variant("base              ")
no_sp = run_variant("no spatial attn   ", attn=lambda q, k, v, heads: q)
no_tp = run_variant("no temporal attn  ", tattn=lambda q, k, v, nh: q)
no_gn = run_variant("scale-only GN     ", gn=_GNStub)
print(f"shares: spatial_attn {base-no_sp:.1f} ms  temporal_attn {base-no_tp:.1f} ms  groupnorm {base-no_gn:.1f} ms  other {no_sp+no_tp+no_gn-2*base:.1f}", flush=True)
