"""Flash-attention forward kernel bench: causal-effective TFLOP/s on chip.

"Causal-effective" counts only the work causal attention NEEDS
(2*B*H*T*S*D multiply-adds halved by the triangle) and divides by wall
time — so schedule wins (skipping fully-masked blocks) show up as
throughput, and the number is comparable against the chip's ~141 TFLOP/s
measured matmul ceiling (docs/video_speed_of_light.md).

Timing uses the one-dispatch lax.scan chain (cf. tools/profile_vd_micro):
the ~30 ms axon relay per dispatch would otherwise dominate sub-10 ms
kernels.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/flash_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from spider_tpu.common.cache import setup_compilation_cache

setup_compilation_cache()
import jax.numpy as jnp


def timed_attn(fn, q, k, v, n=20):
    from jax import lax

    def chain(q, k, v):
        def body(c, _):
            o = fn(c, k, v)
            # feed output back as next q (same shape/dtype) so the scan
            # can't be collapsed; cast keeps dtype stable
            return o.astype(c.dtype), None

        out, _ = lax.scan(body, q, None, length=n)
        return jnp.sum(out.astype(jnp.float32))

    run = jax.jit(chain)
    float(run(q, k, v))  # compile + warm
    t0 = time.perf_counter()
    float(run(q, k, v))
    return (time.perf_counter() - t0) / n


def bench(T=2048, H=16, D=128, B=1, causal=True, dtype=jnp.bfloat16,
          block_q=512, block_k=512, use_pallas=True, label=""):
    from spider_tpu.ops.attention import flash_attention

    kq = jax.random.PRNGKey(0)
    q = jax.random.normal(kq, (B, T, H, D), dtype)
    k = jax.random.normal(kq, (B, T, H, D), dtype)
    v = jax.random.normal(kq, (B, T, H, D), dtype)

    def fn(q, k, v):
        return flash_attention(q, k, v, causal=causal, block_q=block_q,
                               block_k=block_k, use_pallas=use_pallas)

    s = timed_attn(fn, q, k, v)
    flops = 4.0 * B * H * T * T * D * (0.5 if causal else 1.0)
    tf = flops / s / 1e12
    print(f"{label or 'flash'}: B={B} T={T} H={H} D={D} causal={causal} "
          f"bq={block_q} bk={block_k} pallas={use_pallas} -> "
          f"{s * 1e3:.3f} ms  {tf:.1f} TFLOP/s"
          f"{' (effective)' if causal else ''}")
    return tf


def main():
    assert jax.default_backend() == "tpu", "kernel bench needs the chip"
    print("== causal fwd, 2k ctx (VERDICT r4 #5 operating point) ==")
    bench(T=2048, H=16, D=128, causal=True)
    bench(T=2048, H=16, D=128, causal=True, block_q=1024, block_k=512,
          label="bq1024")
    bench(T=2048, H=16, D=128, causal=True, block_q=512, block_k=1024,
          label="bk1024")
    bench(T=2048, H=16, D=128, causal=True, block_q=256, block_k=256,
          label="b256")
    print("== XLA reference path ==")
    bench(T=2048, H=16, D=128, causal=True, use_pallas=False, label="xla")
    print("== non-causal (full work) ==")
    bench(T=2048, H=16, D=128, causal=False)
    print("== longer ctx ==")
    bench(T=4096, H=16, D=128, causal=True)
    bench(T=8192, H=8, D=128, causal=True)
    print("== D=64 native ==")
    bench(T=2048, H=16, D=64, causal=True)


if __name__ == "__main__":
    main()
