import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spider_tpu.common import dist
from spider_tpu.ops.attention import mha_reference
from spider_tpu.ops.ring_attention import ring_attention


@pytest.fixture(scope="module")
def mesh():
    return dist.make_mesh(data=2, context=4)


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_full_attention(mesh, causal):
    B, T, H, D = 1, 64, 2, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, D))
    want = mha_reference(q, k, v, causal=causal)
    got = ring_attention(q, k, v, mesh, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_ring_gqa(mesh):
    B, T, Hq, Hkv, D = 1, 32, 4, 2, 8
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, Hq, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, T, Hkv, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, Hkv, D))
    want = mha_reference(q, k, v, causal=True)
    got = ring_attention(q, k, v, mesh, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_ring_differentiable(mesh):
    B, T, H, D = 1, 32, 2, 8
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, D))

    def loss(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh, causal=True) ** 2)

    def ref_loss(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=True) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("causal", [True, False])
def test_ring_flash_path_matches_einsum(mesh, causal):
    """The Pallas flash-per-block ring (no materialized [Tq,Tk] logits)
    matches the einsum-block path and full attention (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    B, T, H, D = 1, 256, 2, 128
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, D))
    want = mha_reference(q, k, v, causal=causal)
    with pltpu.force_tpu_interpret_mode():
        got = ring_attention(q, k, v, mesh, causal=causal, use_flash=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
