"""A/B candidate optimizations for the ZeroScope UNet3D L0 hot blocks.

profile_vd_micro.py showed the 40x72 level dominates the denoise step
(tattn 18 ms, attn2d 15 ms, tconv 14 ms per block, vs 5-7 ms for the same
FLOPs at 20x36) — this harness times isolated variants of each block
formulation on the real chip to find which rewrites actually pay.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/ab_temporal.py
"""

import time

import jax

from spider_tpu.common.cache import setup_compilation_cache

setup_compilation_cache()
import jax.numpy as jnp
import numpy as np

B, F, H, W, C = 2, 16, 40, 72, 320
P = H * W
NH, D = 8, 40
DT = jnp.bfloat16


def timed(fn, *args, n=10):
    from jax import lax

    def chain(a0, *rest):
        def body(c, _):
            return fn(c, *rest), None
        out, _ = lax.scan(body, a0, None, length=n)
        return jnp.sum(out.astype(jnp.float32))

    run = jax.jit(chain)
    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / n


def dev(x):
    return jax.device_put(jnp.asarray(x, DT))


def main():
    rng = np.random.default_rng(0)
    x = dev(rng.normal(0, 1, (B, F, P, C)))
    wq, wk, wv, wo = (dev(rng.normal(0, 0.02, (C, C))) for _ in range(4))
    w_ff1 = dev(rng.normal(0, 0.02, (C, 8 * C)))
    w_ff2 = dev(rng.normal(0, 0.02, (4 * C, C)))

    # ---- temporal attention core (one attn of TemporalBasicBlock) ----
    def attn_v0(x, wq, wk, wv, wo):
        q = (x @ wq).reshape(B, F, P, NH, D)
        k = (x @ wk).reshape(B, F, P, NH, D)
        v = (x @ wv).reshape(B, F, P, NH, D)
        logits = jnp.einsum("bfphd,bgphd->bphfg", q, k)
        logits = logits.astype(jnp.float32) / (D ** 0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bphfg,bgphd->bfphd", probs, v)
        return out.reshape(B, F, P, C) @ wo

    def attn_v1(x, wq, wk, wv, wo):
        """Pre-transposed layout: put F last-2 so the per-pixel [F,F]
        einsums are contiguous batched matmuls."""
        q = (x @ wq).reshape(B, F, P, NH, D).transpose(0, 2, 3, 1, 4)
        k = (x @ wk).reshape(B, F, P, NH, D).transpose(0, 2, 3, 1, 4)
        v = (x @ wv).reshape(B, F, P, NH, D).transpose(0, 2, 3, 1, 4)
        logits = (q @ k.transpose(0, 1, 2, 4, 3)).astype(jnp.float32)
        probs = jax.nn.softmax(logits / (D ** 0.5), axis=-1).astype(v.dtype)
        out = (probs @ v).transpose(0, 3, 1, 2, 4)       # [B,F,P,NH,D]
        return out.reshape(B, F, P, C) @ wo

    def attn_v2(x, wq, wk, wv, wo):
        """Merged QKV: one [C, 3C] matmul (better MXU tile fill at C=320)."""
        wqkv = jnp.concatenate([wq, wk, wv], axis=1)
        qkv = (x @ wqkv).reshape(B, F, P, 3, NH, D)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        logits = jnp.einsum("bfphd,bgphd->bphfg", q, k)
        logits = logits.astype(jnp.float32) / (D ** 0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bphfg,bgphd->bfphd", probs, v)
        return out.reshape(B, F, P, C) @ wo

    def attn_v3(x, wq, wk, wv, wo):
        """2-D flattened matmuls ([M, C]) + v0 attention einsums."""
        m = x.reshape(-1, C)
        q = (m @ wq).reshape(B, F, P, NH, D)
        k = (m @ wk).reshape(B, F, P, NH, D)
        v = (m @ wv).reshape(B, F, P, NH, D)
        logits = jnp.einsum("bfphd,bgphd->bphfg", q, k)
        logits = logits.astype(jnp.float32) / (D ** 0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bphfg,bgphd->bfphd", probs, v)
        return (out.reshape(-1, C) @ wo).reshape(B, F, P, C)

    for name, fn in (("attn_v0_einsum", attn_v0),
                     ("attn_v1_pretranspose", attn_v1),
                     ("attn_v2_mergedqkv", attn_v2),
                     ("attn_v3_flat2d", attn_v3)):
        dt = timed(lambda c, *w: fn(c, *w), x, wq, wk, wv, wo)
        print(f"{name:24s} {dt*1e3:7.2f} ms", flush=True)

    # ---- GEGLU feed-forward ----
    def ff_v0(x, w1, w2):
        a, b = jnp.split(x @ w1, 2, axis=-1)
        return (a * jax.nn.gelu(b)) @ w2

    def ff_v1(x, w1, w2):
        m = x.reshape(-1, C)
        a, b = jnp.split(m @ w1, 2, axis=-1)
        return ((a * jax.nn.gelu(b)) @ w2).reshape(B, F, P, C)

    for name, fn in (("ff_v0", ff_v0), ("ff_v1_flat2d", ff_v1)):
        dt = timed(lambda c, *w: fn(c, *w), x, w_ff1, w_ff2)
        print(f"{name:24s} {dt*1e3:7.2f} ms", flush=True)

    # ---- temporal conv (one GN-less conv pass over F) ----
    kern = dev(rng.normal(0, 0.02, (3, 1, C, C)))   # flax (3,1) conv kernel

    def tconv_v0(x, kern):
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), ((1, 1), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def tconv_v1(x, kern):
        """Shift-and-matmul: y = x_prev@K0 + x@K1 + x_next@K2."""
        k0, k1, k2 = kern[0, 0], kern[1, 0], kern[2, 0]
        prev = jnp.pad(x[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
        nxt = jnp.pad(x[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
        return prev @ k0 + x @ k1 + nxt @ k2

    for name, fn in (("tconv_v0_conv", tconv_v0),
                     ("tconv_v1_shiftmatmul", tconv_v1)):
        dt = timed(lambda c, k: fn(c, k), x.reshape(B, F, P, C), kern)
        print(f"{name:24s} {dt*1e3:7.2f} ms", flush=True)

    # ---- spatial attention core at L0 (T=P=2880, d=40) ----
    xf = dev(rng.normal(0, 1, (B * F, P, C)))

    def sattn_v0(x, wq, wk, wv, wo):
        BF = x.shape[0]
        q = (x @ wq).reshape(BF, P, NH, D)
        k = (x @ wk).reshape(BF, P, NH, D)
        v = (x @ wv).reshape(BF, P, NH, D)
        logits = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32)
        probs = jax.nn.softmax(logits / (D ** 0.5), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhts,bshd->bthd", probs, v)
        return out.reshape(BF, P, C) @ wo

    def sattn_v1(x, wq, wk, wv, wo):
        """Pad head_dim 40 -> 64 (full MXU sublane tile in the contraction
        of the logits matmul); zeros don't change logits or output."""
        BF = x.shape[0]
        q = (x @ wq).reshape(BF, P, NH, D)
        k = (x @ wk).reshape(BF, P, NH, D)
        v = (x @ wv).reshape(BF, P, NH, D)
        pad = ((0, 0), (0, 0), (0, 0), (0, 64 - D))
        q, k = jnp.pad(q, pad), jnp.pad(k, pad)
        logits = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32)
        probs = jax.nn.softmax(logits / (D ** 0.5), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhts,bshd->bthd", probs, v)
        return out.reshape(BF, P, C) @ wo

    def sattn_v2(x, wq, wk, wv, wo):
        """Pallas flash attention (ops/attention.py padded kernel)."""
        from spider_tpu.ops.attention import flash_attention

        BF = x.shape[0]
        q = (x @ wq).reshape(BF, P, NH, D)
        k = (x @ wk).reshape(BF, P, NH, D)
        v = (x @ wv).reshape(BF, P, NH, D)
        out = flash_attention(q, k, v)
        return out.reshape(BF, P, C) @ wo

    for name, fn in (("sattn_v0_einsum", sattn_v0),
                     ("sattn_v1_pad64", sattn_v1),
                     ("sattn_v2_flash", sattn_v2)):
        try:
            dt = timed(lambda c, *w: fn(c, *w), xf, wq, wk, wv, wo)
            print(f"{name:24s} {dt*1e3:7.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:24s} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
