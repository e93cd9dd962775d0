import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spider_tpu.ops.attention import flash_attention, mha_reference, _flash_forward
from spider_tpu.ops.norms import layer_norm, rms_norm
from spider_tpu.ops.rope import apply_rope, rope_inv_freq


def test_rms_norm_matches_manual():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 16))
    w = jax.random.normal(jax.random.PRNGKey(1), (16,)) + 1.0
    got = rms_norm(x, w)
    want = x / np.sqrt(np.mean(np.square(np.asarray(x)), -1, keepdims=True) + 1e-6) * np.asarray(w)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_layer_norm_matches_manual():
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 8))
    w = jnp.ones((8,)) * 2.0
    b = jnp.ones((8,)) * 0.5
    got = layer_norm(x, w, b)
    xn = np.asarray(x)
    want = (xn - xn.mean(-1, keepdims=True)) / np.sqrt(xn.var(-1, keepdims=True) + 1e-5) * 2.0 + 0.5
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_rope_rotation_properties():
    D = 64
    inv = rope_inv_freq(D)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 2, D))
    pos = jnp.arange(4)[None, :]
    out = apply_rope(x, pos, inv)
    # Norm preserved per pair.
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5)
    # Position 0 is identity.
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(x[:, 0]), rtol=1e-6, atol=1e-6)
    # Relative property: dot(q_m, k_n) depends only on m - n.
    q = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 1, D))
    k = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 1, D))
    def dot_at(m, n):
        qm = apply_rope(q, jnp.array([[m]]), inv)
        kn = apply_rope(k, jnp.array([[n]]), inv)
        return float(jnp.sum(qm * kn))
    assert dot_at(5, 3) == pytest.approx(dot_at(7, 5), rel=1e-4)


def test_llama3_rope_scaling_changes_low_freqs():
    scaling = dict(factor=8.0, low_freq_factor=1.0, high_freq_factor=4.0,
                   original_max_position_embeddings=8192)
    base = rope_inv_freq(128)
    scaled = rope_inv_freq(128, llama3_scaling=scaling)
    np.testing.assert_allclose(np.asarray(scaled[:4]), np.asarray(base[:4]), rtol=1e-6)
    assert np.all(np.asarray(scaled[-4:]) < np.asarray(base[-4:]))


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("group", [1, 4])
@pytest.mark.parametrize("D", [64, 128])
def test_flash_kernel_interpret_matches_reference(causal, group, D):
    # D=64 pins the kernel numerics for the native 64-lane path that
    # ring_attention and SDXL attention take on TPU (ADVICE r4 #1: the
    # D%64 gate silently switched those callers onto the kernel).
    B, T, Hkv = 2, 256, 2
    Hq = Hkv * group
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, T, Hq, D), dtype=jnp.float32)
    k = jax.random.normal(kk, (B, T, Hkv, D), dtype=jnp.float32)
    v = jax.random.normal(kv, (B, T, Hkv, D), dtype=jnp.float32)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got, _ = _flash_forward(q, k, v, causal, D ** -0.5, None, None, 128, 128)
    want = mha_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_flash_kernel_kv_len_masking():
    B, T, H, D = 1, 128, 1, 128
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, D))
    kv_len = jnp.array([70], dtype=jnp.int32)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got, _ = _flash_forward(q, k, v, False, D ** -0.5, kv_len, None, 128, 128)
    want = mha_reference(q, k, v, causal=False, kv_len=kv_len)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_flash_attention_cpu_dispatch_and_grad():
    B, T, H, D = 1, 32, 2, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, D))
    out = flash_attention(q, k, v, causal=True)
    want = mha_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-5)

    def loss(q):
        return jnp.sum(flash_attention(q, k, v, causal=True) ** 2)

    g = jax.grad(loss)(q)
    assert g.shape == q.shape
    assert np.isfinite(np.asarray(g)).all()


def test_cached_decode_offset():
    # Queries are the last T positions of a longer KV (prefill + decode step).
    B, S, H, D = 1, 64, 2, 64
    T = 16
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, D))
    out = flash_attention(q, k, v, causal=True)
    # Manual: full-length q where last T rows match.
    qfull = jnp.concatenate([jax.random.normal(jax.random.PRNGKey(9), (B, S - T, H, D)), q], axis=1)
    full = mha_reference(qfull, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full[:, -T:]), rtol=1e-5, atol=1e-5)


def test_flash_forward_lse_matches_reference():
    from jax.experimental.pallas import tpu as pltpu

    B, T, H, D = 1, 128, 2, 128
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, D))
    with pltpu.force_tpu_interpret_mode():
        out, lse = _flash_forward(q, k, v, True, D ** -0.5, None, None, 128, 128)
    # manual lse
    logits = jnp.einsum("bthd,bshd->bhts", q, k) * (D ** -0.5)
    mask = jnp.tril(jnp.ones((T, T), bool))
    logits = jnp.where(mask[None, None], logits, -jnp.inf)
    want = jax.nn.logsumexp(logits, axis=-1)
    np.testing.assert_allclose(np.asarray(lse[..., 0]), np.asarray(want),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("causal", [True, False])
def test_flash_backward_kernels_match_xla(causal):
    from jax.experimental.pallas import tpu as pltpu
    from spider_tpu.ops.attention import _flash_backward

    B, T, Hkv, D = 1, 128, 2, 128
    group = 2
    Hq = Hkv * group
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, Hq, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, T, Hkv, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, Hkv, D))
    g = jax.random.normal(jax.random.PRNGKey(3), (B, T, Hq, D))

    def ref(q, k, v):
        return mha_reference(q, k, v, causal=causal)

    want_out, vjp = jax.vjp(ref, q, k, v)
    want = vjp(g)
    with pltpu.force_tpu_interpret_mode():
        out, lse = _flash_forward(q, k, v, causal, D ** -0.5, None, None,
                                  128, 128)
        got = _flash_backward(q, k, v, out, lse, g, causal, D ** -0.5,
                              None, None, 128, 128)
    for a, b, name in zip(got, want, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3, err_msg=name)


@pytest.mark.slow  # 13s interpret VJP; ring fast tests cover the forward
def test_flash_with_lse_matches_reference_and_grad():
    """flash_attention_with_lse (Pallas, interpret): forward out+lse parity
    vs the XLA reference and VJP parity with a loss touching BOTH outputs
    (the lse cotangent folds into the backward's delta term)."""
    from jax.experimental.pallas import tpu as pltpu

    from spider_tpu.ops.attention import (flash_attention_with_lse,
                                          mha_reference_with_lse)

    B, T, Hkv, D = 1, 256, 2, 128
    group = 2
    Hq = Hkv * group
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, Hq, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, T, Hkv, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, Hkv, D))

    want_o, want_lse = mha_reference_with_lse(q, k, v, causal=True)
    with pltpu.force_tpu_interpret_mode():
        got_o, got_lse = flash_attention_with_lse(q, k, v, causal=True,
                                                  use_pallas=True,
                                                  block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_lse), np.asarray(want_lse),
                               rtol=2e-3, atol=2e-3)

    def loss_ref(q, k, v):
        o, lse = mha_reference_with_lse(q, k, v, causal=True)
        return jnp.sum(o * o) + 0.3 * jnp.sum(jnp.sin(lse))

    def loss_flash(q, k, v):
        o, lse = flash_attention_with_lse(q, k, v, causal=True,
                                          use_pallas=True,
                                          block_q=128, block_k=128)
        return jnp.sum(o * o) + 0.3 * jnp.sum(jnp.sin(lse))

    gw = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        gg = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gg, gw):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_flash_with_lse_interpret_d64_forward():
    """D=64 lse-path kernel parity (interpret): ring_attention's blocks run
    the Pallas kernel natively at D=64 on TPU (ADVICE r4 #1)."""
    from jax.experimental.pallas import tpu as pltpu

    from spider_tpu.ops.attention import (flash_attention_with_lse,
                                          mha_reference_with_lse)

    B, T, H, D = 1, 128, 2, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, D))
    want_o, want_lse = mha_reference_with_lse(q, k, v, causal=True)
    with pltpu.force_tpu_interpret_mode():
        got_o, got_lse = flash_attention_with_lse(q, k, v, causal=True,
                                                  use_pallas=True,
                                                  block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_lse), np.asarray(want_lse),
                               rtol=2e-3, atol=2e-3)


def test_flash_with_lse_dynamic_q_offset_negative():
    """Negative q_offset (a future ring block) comes back fully masked:
    lse = -inf, out = 0 — the ring merge no-op case."""
    from jax.experimental.pallas import tpu as pltpu

    from spider_tpu.ops.attention import flash_attention_with_lse

    B, T, H, D = 1, 128, 1, 128
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, D))
    with pltpu.force_tpu_interpret_mode():
        o, lse = flash_attention_with_lse(
            q, k, v, causal=True, q_offset=jnp.int32(-T),
            use_pallas=True, block_q=128, block_k=128)
    assert not np.isfinite(np.asarray(lse)).any()
    np.testing.assert_array_equal(np.asarray(o), 0.0)
