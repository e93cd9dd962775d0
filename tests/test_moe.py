import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spider_tpu.common import dist
from spider_tpu.parallel.moe import (MoEConfig, init_moe_params,
                                     moe_ffn_expert_parallel, moe_ffn_local,
                                     topk_gating)


def test_top1_gating_capacity_and_dispatch():
    # 6 tokens, 2 experts, capacity 2: only 2 tokens per expert kept.
    logits = jnp.array([[5.0, 0.0]] * 4 + [[0.0, 5.0]] * 2)
    combine, dispatch, aux = topk_gating(logits, capacity=2, top_k=1)
    assert combine.shape == (6, 2, 2)
    # tokens 0,1 go to expert 0 slots 0,1; tokens 2,3 dropped
    assert bool(dispatch[0, 0, 0]) and bool(dispatch[1, 0, 1])
    assert not dispatch[2].any() and not dispatch[3].any()
    assert bool(dispatch[4, 1, 0]) and bool(dispatch[5, 1, 1])
    assert float(aux) > 0


def test_top2_gating_combines_two_experts():
    logits = jnp.array([[2.0, 1.0, -5.0]])
    combine, dispatch, aux = topk_gating(logits, capacity=4, top_k=2)
    experts_hit = np.asarray(dispatch.any(axis=-1))[0]
    assert experts_hit[0] and experts_hit[1] and not experts_hit[2]
    # combine weights sum to 1 over the two selected experts
    assert float(combine.sum()) == pytest.approx(1.0, rel=1e-5)


@pytest.mark.slow
def test_moe_local_forward_and_grads():
    cfg = MoEConfig(num_experts=4, d_model=16, d_ff=32, capacity_factor=2.0)
    params = init_moe_params(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (12, 16))
    out, aux = moe_ffn_local(params, x, cfg)
    assert out.shape == x.shape

    def loss(p):
        o, a = moe_ffn_local(p, x, cfg)
        return jnp.sum(o ** 2) + 0.01 * a

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree_util.tree_leaves(g))


@pytest.mark.slow
def test_expert_parallel_matches_local_when_no_drops():
    cfg = MoEConfig(num_experts=4, d_model=16, d_ff=32, capacity_factor=8.0)
    params = init_moe_params(cfg, jax.random.PRNGKey(0))
    T = 16
    x = jax.random.normal(jax.random.PRNGKey(1), (T, 16))
    local_out, _ = moe_ffn_local(params, x, cfg)

    mesh = dist.make_mesh(data=2, fsdp=1, model=1, expert=4)
    ep_out, ep_aux = moe_ffn_expert_parallel(params, x, cfg, mesh,
                                             axis="expert")
    np.testing.assert_allclose(np.asarray(ep_out), np.asarray(local_out),
                               rtol=2e-4, atol=2e-4)
