"""int4 weight-only quantization (ops/quant.py) — packing semantics,
quantization error, model integration. The Pallas kernel itself needs a TPU;
these tests exercise the packing math and the XLA reference path the kernel
is verified against on-chip (see ops/quant.py module docstring for the
measured TPU numbers and the VPU-unpack tradeoff)."""

import pytest
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from spider_tpu.ops.quant import (int4_matmul_reference, pack_int4,
                                  quantize_int4, unpack_int4)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.integers(-8, 8, size=(64, 32)).astype(np.int8)
    packed = pack_int4(jnp.asarray(w))
    assert packed.shape == (32, 32) and packed.dtype == jnp.int8
    out = unpack_int4(packed, jnp.int32)
    np.testing.assert_array_equal(np.asarray(out), w)


def test_quantize_int4_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(0), (128, 64)) * 0.02
    packed, scale = quantize_int4(w)
    deq = unpack_int4(packed, jnp.float32) * scale[None, :]
    # symmetric 4-bit: |err| <= scale/2 per element
    err = np.abs(np.asarray(deq - w))
    assert (err <= np.asarray(scale)[None, :] / 2 + 1e-7).all()


def test_int4_matmul_reference_matches_dequant():
    w = jax.random.normal(jax.random.PRNGKey(1), (256, 128)) * 0.05
    packed, scale = quantize_int4(w)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 256))
    y = int4_matmul_reference(x, packed, scale)
    deq = unpack_int4(packed, jnp.float32) * scale[None, :]
    np.testing.assert_allclose(np.asarray(y), np.asarray(x @ deq),
                               rtol=1e-4, atol=1e-4)


def test_llama_int4_forward_runs():
    from spider_tpu.models import llama as L

    cfg = dataclasses.replace(L.llama_tiny(), quantization="int4",
                              dtype=jnp.float32)
    model = L.LlamaForCausalLM(cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    # packed kernels present and half-height
    kq = params["params"]["model"]["layers"]["self_attn"]["q_proj"]["kernel_q"]
    assert kq.shape[-2] == cfg.hidden_size // 2 and kq.dtype == jnp.int8
    logits, _, _ = model.apply(params, ids)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_llama_int4_decode_matches_forward():
    """KV-cache decode over int4 weights is consistent with the full
    forward (same argmax path)."""
    from spider_tpu.models import llama as L

    cfg = dataclasses.replace(L.llama_tiny(vocab_size=128),
                              quantization="int4", dtype=jnp.float32)
    model = L.LlamaForCausalLM(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, 12), 0, 128)
    params = model.init(jax.random.PRNGKey(0), ids)
    logits_full, _, _ = model.apply(params, ids)

    cache = L.init_kv_cache(cfg, 1, 16, jnp.float32)
    logits_pre, _, cache = model.apply(params, ids[:, :8], kv_write_index=0,
                                       kv_cache=cache)
    np.testing.assert_allclose(np.asarray(logits_pre[:, -1]),
                               np.asarray(logits_full[:, 7]),
                               rtol=2e-3, atol=2e-3)
