"""AOT compile check of the FULL-SIZE sharded Spider train step.

The reference's real training run assembles ImageBind-huge + LoRA-Llama-8B
+ projectors + SAM from checkpoints and steps it under DeepSpeed ZeRO-2
(/root/reference/spider/models/base_model.py:40-233,
train_configs/spider_demo_train.py). This module proves the TPU-native
equivalent at full scale WITHOUT materializing ~16 GB of parameters: the
whole model is built as ShapeDtypeStruct trees
(factory.build_full_spider(abstract=True)) and the dp x fsdp x tp sharded
train step — the same function runners/runner.RunnerBase jits — is
AOT-lowered and compiled against the mesh. A compile failure here is
exactly the failure a real 8B launch would hit (sharding mismatches, OOM
layouts, partitioner errors); success yields the per-device HBM budget
from XLA's memory analysis.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spider_tpu.parallel import partition


def _abstract(tree):
    return jax.tree_util.tree_map(
        lambda x: x if isinstance(x, jax.ShapeDtypeStruct)
        else jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), tree)


def compile_full_spider_step(mesh=None, batch_size: int = 4, seq_len: int = 128,
                             task: str = "IMAGE",
                             spider=None) -> Dict[str, float]:
    """Build (abstract) full Spider, shard over `mesh`, AOT-compile one
    train step. Returns {'compile_ok': 1, per-device memory stats in GiB}.

    mesh defaults to all visible devices on data x fsdp x model = n/4 x2x2
    (n % 4 == 0) or data-only."""
    import optax

    from spider_tpu.common import dist
    from spider_tpu.models.factory import FULL_ALIGN_SPECS, build_full_spider
    from spider_tpu.runners.train_step import (_opt_state_shardings,
                                               build_optimizer)

    if mesh is None:
        n = len(jax.devices())
        if n % 4 == 0:
            mesh = dist.make_mesh(data=n // 4, fsdp=2, model=2)
        else:
            mesh = dist.make_mesh(data=n)

    spider = spider or build_full_spider(
        abstract=True, with_encoder=False, with_pipes=False)
    params = _abstract(spider.trainable_params())
    # reference trains LoRA + new vocab rows + proj + aligners + SAM mask
    # decoder; freezing is a mask inside the optimizer (train_step.py)
    tx = build_optimizer(1e-4, num_frozen_embed_rows=128256)
    opt_state = jax.eval_shape(tx.init, params)
    param_sh = partition.tree_shardings(params, mesh, partition.SPIDER_RULES)
    opt_sh = _opt_state_shardings(opt_state, params, param_sh, mesh)

    B, L = batch_size, seq_len
    hidden = spider.llm.config.hidden_size
    i32 = lambda *s: jax.ShapeDtypeStruct(s, jnp.int32)
    f32 = lambda *s: jax.ShapeDtypeStruct(s, jnp.float32)
    batch_dict = dict(
        input_ids=i32(B, L),
        slot_mask={task: i32(B, L)},
        slot_index={task: i32(B, L)},
        targets=i32(B, L),
        modality_inputs={},
        signal_pos=i32(B, spider.modality_tokens[task]),
        text_span=i32(B, 2),
    )
    modality_embeds = {task: f32(B, 1024)}
    spec = FULL_ALIGN_SPECS[task]
    cond = f32(B, spec["alignment_output_tokens"],
               spec["alignment_output_dim"])
    aux = None

    from spider_tpu.models.spider import PreparedBatch

    def step(params, opt_state, batch_dict, modality_embeds, cond, aux):
        b = PreparedBatch(**batch_dict)

        def loss_fn(p):
            out = spider.compute_loss(p, b, modality_embeds, cond, task, aux)
            return out["loss"], out

        grads, out = jax.grad(loss_fn, has_aux=True)(params)
        grads = jax.lax.with_sharding_constraint(grads, param_sh)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt, out

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    dp = mesh.shape["data"] * mesh.shape.get("fsdp", 1)

    def batch_shard(x):
        shape = x.shape
        if shape and shape[0] % dp == 0 and dp > 1:
            return NamedSharding(mesh, P(("data", "fsdp"),
                                         *([None] * (len(shape) - 1))))
        return repl

    args = (batch_dict, modality_embeds, cond, aux)
    data_sh = tuple(jax.tree_util.tree_map(batch_shard, a) for a in args)
    out_abs = jax.eval_shape(step, params, opt_state, *args)
    lowered = jax.jit(
        step,
        in_shardings=(param_sh, opt_sh) + data_sh,
        out_shardings=(param_sh, opt_sh,
                       jax.tree_util.tree_map(lambda _: repl, out_abs[2])),
        donate_argnums=(0, 1),
    ).lower(params, opt_state, *args)
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    gib = 1024 ** 3
    stats = {"compile_ok": 1.0, "mesh": dict(mesh.shape),
             "n_params": float(sum(
                 int(np.prod(x.shape))
                 for x in jax.tree_util.tree_leaves(params)))}
    if mem is not None:
        stats.update(
            argument_gib=getattr(mem, "argument_size_in_bytes", 0) / gib,
            output_gib=getattr(mem, "output_size_in_bytes", 0) / gib,
            temp_gib=getattr(mem, "temp_size_in_bytes", 0) / gib,
        )
    return stats
