"""Expert-parallel Mixture-of-Experts — the TPU-native equivalent of
torchscale's xmoe stack (/root/reference/spider/models/torchscale/component/
xmoe/moe_layer.py:46-360, routing.py:36-448): capacity-based top-1/top-2
gating in fp32 with one-hot dispatch einsums (identical math), experts
partitioned over the `expert` mesh axis with `jax.lax.all_to_all` replacing
the NCCL all_to_all_single, all under `shard_map`.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MoEConfig:
    num_experts: int = 8
    d_model: int = 512
    d_ff: int = 2048
    capacity_factor: float = 1.0
    eval_capacity_factor: float = 2.0
    top_k: int = 1                      # 1 or 2 (Top1Gate / Top2Gate)
    dtype: Any = jnp.float32


def init_moe_params(cfg: MoEConfig, rng) -> Dict[str, jnp.ndarray]:
    k1, k2, k3 = jax.random.split(rng, 3)
    scale1 = 1.0 / np.sqrt(cfg.d_model)
    scale2 = 1.0 / np.sqrt(cfg.d_ff)
    return {
        "wg": jax.random.normal(k1, (cfg.d_model, cfg.num_experts),
                                jnp.float32) * scale1,
        "w1": jax.random.normal(k2, (cfg.num_experts, cfg.d_model, cfg.d_ff),
                                cfg.dtype) * scale1,
        "w2": jax.random.normal(k3, (cfg.num_experts, cfg.d_ff, cfg.d_model),
                                cfg.dtype) * scale2,
    }


def _capacity(num_tokens: int, num_experts: int, factor: float,
              top_k: int) -> int:
    return max(4, int(np.ceil(num_tokens * top_k / num_experts * factor)))


def topk_gating(logits: jnp.ndarray, capacity: int, top_k: int
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """logits [T, E] (fp32) -> (combine [T, E, Cap], dispatch bool
    [T, E, Cap], aux_loss). Top-1 matches torchscale top1gating
    (routing.py:36-231); top-2 masks the winner and re-picks
    (routing.py:258-448)."""
    T, E = logits.shape
    probs = jax.nn.softmax(logits, axis=-1)
    combine = jnp.zeros((T, E, capacity), jnp.float32)
    dispatch = jnp.zeros((T, E, capacity), bool)
    masked = probs
    aux_loss = jnp.asarray(0.0, jnp.float32)
    gates_sum = jnp.zeros((T,), jnp.float32)
    # accumulated expert occupancy across the k rounds
    occupancy = jnp.zeros((E,), jnp.int32)
    for k in range(top_k):
        idx = jnp.argmax(masked, axis=-1)                       # [T]
        onehot = jax.nn.one_hot(idx, E, dtype=jnp.int32)        # [T, E]
        if k == 0:
            # load-balancing loss: mean gate prob * mean token fraction
            me = probs.mean(axis=0)
            ce = onehot.astype(jnp.float32).mean(axis=0)
            aux_loss = jnp.sum(me * ce) * E
        # position of each token within its expert queue (+ prior rounds)
        pos_in_expert = jnp.cumsum(onehot, axis=0) - onehot \
            + occupancy[None, :]
        pos = jnp.sum(pos_in_expert * onehot, axis=-1)          # [T]
        keep = pos < capacity
        gate = jnp.take_along_axis(probs, idx[:, None], axis=-1)[:, 0]
        gate = jnp.where(keep, gate, 0.0)
        gates_sum = gates_sum + gate
        pos_oh = jax.nn.one_hot(jnp.where(keep, pos, capacity), capacity + 1,
                                dtype=jnp.float32)[:, :capacity]
        combine = combine + gate[:, None, None] * \
            onehot.astype(jnp.float32)[:, :, None] * pos_oh[:, None, :]
        occupancy = occupancy + jnp.sum(onehot * keep[:, None].astype(jnp.int32),
                                        axis=0)
        masked = jnp.where(onehot.astype(bool), -jnp.inf, masked)
    if top_k > 1:  # normalize combined gates
        combine = combine / jnp.maximum(gates_sum, 1e-9)[:, None, None]
    dispatch = combine > 0
    return combine, dispatch, aux_loss


def moe_ffn_local(params: Dict[str, jnp.ndarray], x: jnp.ndarray,
                  cfg: MoEConfig, train: bool = True
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-device MoE FFN. x [T, M] -> (out [T, M], aux_loss)."""
    T, M = x.shape
    cap = _capacity(T, cfg.num_experts,
                    cfg.capacity_factor if train else cfg.eval_capacity_factor,
                    cfg.top_k)
    logits = (x.astype(jnp.float32) @ params["wg"])
    combine, dispatch, aux = topk_gating(logits, cap, cfg.top_k)
    xe = jnp.einsum("tec,tm->ecm", dispatch.astype(x.dtype), x)
    h = jax.nn.gelu(jnp.einsum("ecm,emf->ecf", xe, params["w1"]))
    ye = jnp.einsum("ecf,efm->ecm", h, params["w2"])
    out = jnp.einsum("tec,ecm->tm", combine.astype(ye.dtype), ye)
    return out, aux


def moe_ffn_expert_parallel(params, x, cfg: MoEConfig, mesh: Mesh,
                            axis: str = "expert", train: bool = True):
    """Expert-parallel MoE under shard_map: tokens sharded over `axis`,
    experts partitioned over `axis`, dispatch via two all_to_alls (the
    _AllToAll fwd/bwd pair of moe_layer.py:46-62 is automatic under jax AD).

    x [T, M] global; params['w1'/'w2'] sharded on the expert dim.
    """
    n_shards = mesh.shape[axis]
    E = cfg.num_experts
    assert E % n_shards == 0
    e_local = E // n_shards

    def local_fn(wg, w1, w2, x_local):
        # x_local [T_local, M]; w1 [e_local, M, F]
        T_local, M = x_local.shape
        cap = _capacity(T_local, E,
                        cfg.capacity_factor if train
                        else cfg.eval_capacity_factor, cfg.top_k)
        logits = x_local.astype(jnp.float32) @ wg
        combine, dispatch, aux = topk_gating(logits, cap, cfg.top_k)
        xe = jnp.einsum("tec,tm->ecm", dispatch.astype(x_local.dtype),
                        x_local)                     # [E, cap, M]
        # exchange: send each shard its experts' chunks.
        # [n, e_local, cap, M] -(a2a split 0, concat 2)-> [e_local, cap, n, M]
        xe = xe.reshape(n_shards, e_local, cap, M)
        xe = jax.lax.all_to_all(xe, axis, split_axis=0, concat_axis=2)
        xe = xe.transpose(0, 2, 1, 3).reshape(e_local, n_shards * cap, M)
        h = jax.nn.gelu(jnp.einsum("ecm,emf->ecf", xe, w1))
        ye = jnp.einsum("ecf,efm->ecm", h, w2)        # [e_local, n*cap, M]
        # return each source shard its tokens' outputs:
        # [e_local, n, cap, M] -> [n, e_local, cap, M] -(a2a 0->0)->
        # [n(owner), e_local, cap, M] == [E, cap, M] in global expert order.
        ye = ye.reshape(e_local, n_shards, cap, M).transpose(1, 0, 2, 3)
        ye = jax.lax.all_to_all(ye, axis, split_axis=0, concat_axis=0)
        ye = ye.reshape(E, cap, M)
        out = jnp.einsum("tec,ecm->tm", combine.astype(ye.dtype), ye)
        return out, jax.lax.pmean(aux, axis)

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P()),
    )
    return fn(params["wg"], params["w1"], params["w2"], x)
