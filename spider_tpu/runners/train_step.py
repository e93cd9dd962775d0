"""Sharded LM training step — the jit-compiled heart of the training engine.

Replaces the reference's DeepSpeed fwd/bwd/step loop
(/root/reference/spider/runners/runner_base.py:221-234): bf16 compute, fp32
optimizer state sharded over the fsdp axis (ZeRO analogue), gradient
accumulation folded into optax, remat via the model config, frozen-row
embedding masking, LoRA-only training masks.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spider_tpu.models.llama import LlamaForCausalLM, cross_entropy_loss
from spider_tpu.parallel import partition


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def build_optimizer(learning_rate, *, weight_decay: float = 0.0,
                    max_grad_norm: float = 1.0,
                    grad_accum_steps: int = 1,
                    num_frozen_embed_rows: int = 0,
                    trainable_patterns: Optional[Tuple[str, ...]] = None,
                    params=None) -> optax.GradientTransformation:
    """AdamW + clipping (+ frozen-row masking, LoRA masking, accumulation).

    Mirrors ds_config.json: Adam lr 1e-4, grad clipping, accumulation; the
    ZeRO sharding comes from the opt-state sharding rules, not the optimizer.
    """
    chain = []
    if max_grad_norm:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(optax.adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                             weight_decay=weight_decay))
    if num_frozen_embed_rows:
        chain.append(partition.freeze_embedding_rows(num_frozen_embed_rows))
    tx = optax.chain(*chain)
    if trainable_patterns is not None:
        assert params is not None
        mask = partition.trainable_mask(params, trainable_patterns)
        tx = optax.masked(tx, mask)
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx


def make_lm_train_step(model: LlamaForCausalLM,
                       tx: optax.GradientTransformation,
                       param_shardings=None):
    """Returns step(state, batch) -> (state, metrics). batch: input_ids,
    labels [B, T] (labels -100 outside answer spans).

    param_shardings (optional pytree of NamedSharding matching params) pins
    gradients to the parameter layout before the optimizer — grads of
    broadcast params (LoRA b) otherwise inherit degenerate batch shardings
    and the SPMD partitioner falls back to full rematerialization inside
    clip_by_global_norm."""

    moe = model.config.num_experts > 0

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        def loss_fn(params):
            if moe:
                (logits, _, _), mut = model.apply(
                    params, batch["input_ids"], mutable=["losses"])
                aux = sum(jnp.mean(x) for x in
                          jax.tree_util.tree_leaves(mut["losses"]))
            else:
                logits, _, _ = model.apply(params, batch["input_ids"])
                aux = 0.0
            loss, acc = cross_entropy_loss(logits, batch["labels"])
            loss = loss + model.config.moe_aux_weight * aux
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        if param_shardings is not None:
            grads = jax.lax.with_sharding_constraint(grads, param_shardings)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        metrics = dict(loss=loss, gen_acc=acc,
                       grad_norm=optax.global_norm(grads))
        return new_state, metrics

    return step


def init_sharded_state(model: LlamaForCausalLM, tx, mesh: Mesh,
                       example_ids: jnp.ndarray, rng=None) -> TrainState:
    """Initialize params + optimizer state directly sharded over the mesh."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    def init_fn(rng):
        params = model.init(rng, example_ids)
        opt_state = tx.init(params)
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=opt_state)

    abstract = jax.eval_shape(init_fn, rng)
    shardings = jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, P()), abstract)
    param_shardings = partition.tree_shardings(abstract.params, mesh)
    shardings = shardings.replace(
        params=param_shardings,
        opt_state=_opt_state_shardings(abstract.opt_state, abstract.params,
                                       param_shardings, mesh))
    with mesh:
        state = jax.jit(init_fn, out_shardings=shardings)(rng)
    return state


def _opt_state_shardings(opt_state, params, param_shardings, mesh):
    """Optimizer-state leaves that mirror a param tree get the param's
    sharding (adam mu/nu); everything else is replicated."""
    flat_params, treedef = jax.tree_util.tree_flatten(params)
    flat_shardings = treedef.flatten_up_to(param_shardings)
    shapes = [jnp.shape(p) for p in flat_params]

    def match(leaf):
        # A leaf matches a param position if the whole subtree is congruent;
        # cheapest robust test: shape-by-identity walk.
        return None

    def assign(subtree):
        try:
            flat_leaf = treedef.flatten_up_to(subtree)
        except ValueError:
            return None
        if all(jnp.shape(a) == s for a, s in zip(flat_leaf, shapes)):
            return jax.tree_util.tree_unflatten(treedef, flat_shardings)
        return None

    def walk(node):
        assigned = assign(node)
        if assigned is not None:
            return assigned
        if isinstance(node, tuple) and hasattr(node, "_fields"):  # NamedTuple
            return type(node)(*[walk(c) for c in node])
        if isinstance(node, (list, tuple)):
            return type(node)(walk(c) for c in node)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return jax.tree_util.tree_map(
            lambda leaf: NamedSharding(mesh, P()), node)

    return walk(opt_state)


def make_jitted_train_step(model, tx, mesh: Mesh, state: TrainState):
    """jit the step with explicit state shardings and data-sharded batches.

    If the mesh has a `context` axis > 1, the model is rebuilt with
    context-parallel ring attention (LlamaConfig.with_context_parallel)
    and the batch's sequence dim shards over that axis — long-context
    training the reference can only truncate away (SURVEY.md §2.3 SP/CP).
    """
    state_shardings = jax.tree_util.tree_map(lambda x: x.sharding, state)
    seq_axis = None
    if mesh.shape.get("context", 1) > 1:
        model = type(model)(model.config.with_context_parallel(mesh))
        seq_axis = "context"
    batch_sharding = NamedSharding(mesh, P(("data", "fsdp"), seq_axis))
    step = make_lm_train_step(model, tx, state_shardings.params)
    return jax.jit(
        step,
        in_shardings=(state_shardings, batch_sharding),
        out_shardings=(state_shardings, NamedSharding(mesh, P())),
        donate_argnums=(0,),
    )
