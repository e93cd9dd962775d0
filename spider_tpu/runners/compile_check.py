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


def compile_full_omni_forward(mesh=None, seq_len: int = 128
                              ) -> Dict[str, float]:
    """AOT compile check of the FULL-SIZE Qwen2.5-Omni-7B thinker: the
    32-layer LLM prefill forward sharded over the mesh plus the full-size
    audio (whisper-large-style) and vision (32-block ViT) towers — the
    configs the reference loads at qwen2.5omni_spider_web.py:368-383.
    Params stay abstract (ShapeDtypeStruct), so this proves the full-size
    instantiation + sharded lowering without ~15 GiB of weights."""
    import dataclasses as dc

    from spider_tpu.common import dist
    from spider_tpu.models.llama import LlamaForCausalLM
    from spider_tpu.models.qwen_omni import (OmniAudioEncoder,
                                             OmniVisionEncoder,
                                             omni_audio_full,
                                             omni_vision_full,
                                             thinker_llm_full)

    if mesh is None:
        n = len(jax.devices())
        mesh = (dist.make_mesh(data=n // 4, fsdp=2, model=2)
                if n % 4 == 0 else dist.make_mesh(data=n))

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    rng = jax.random.PRNGKey(0)
    stats: Dict[str, float] = {"mesh": dict(mesh.shape)}
    gib = 1024 ** 3

    def _compile(tag, model, params_abs, in_sh, *args):
        lowered = jax.jit(
            model.apply, in_shardings=(in_sh,) + (None,) * len(args),
        ).lower(params_abs, *args)
        compiled = lowered.compile()
        mem = compiled.memory_analysis()
        stats[f"{tag}_params"] = float(sum(
            int(np.prod(x.shape))
            for x in jax.tree_util.tree_leaves(params_abs)))
        if mem is not None:
            stats[f"{tag}_temp_gib"] = getattr(
                mem, "temp_size_in_bytes", 0) / gib

    # --- LLM prefill (3.8B decoder), TP/FSDP-sharded
    lcfg = dc.replace(thinker_llm_full(), dtype=jnp.bfloat16)
    llm = LlamaForCausalLM(lcfg)
    ids = jax.ShapeDtypeStruct((1, seq_len), jnp.int32)
    lp = jax.eval_shape(llm.init, rng, jnp.ones((1, 4), jnp.int32))
    lsh = partition.tree_shardings(lp, mesh, partition.LLAMA_RULES)
    _compile("llm", llm, lp, lsh, ids)

    # --- audio tower (chunked whisper-style), replicated
    acfg = dc.replace(omni_audio_full(), dtype=jnp.bfloat16)
    audio = OmniAudioEncoder(acfg)
    N, Lm = 3, acfg.n_window * 2
    chunks = jax.ShapeDtypeStruct((N, Lm, acfg.num_mel_bins), jnp.float32)
    lens = jax.ShapeDtypeStruct((N,), jnp.int32)
    gather = jax.ShapeDtypeStruct((N * acfg.n_window,), jnp.int32)
    ap = jax.eval_shape(audio.init, rng,
                        jnp.zeros((1, Lm, acfg.num_mel_bins)),
                        jnp.asarray([8], jnp.int32),
                        jnp.arange(4, dtype=jnp.int32))
    ash = jax.tree_util.tree_map(lambda _: repl, ap)
    _compile("audio", audio, ap, ash, chunks, lens, gather)

    # --- vision tower (windowed ViT) at a 448px image (32x32 patch grid)
    vcfg = dc.replace(omni_vision_full(), dtype=jnp.bfloat16)
    vision = OmniVisionEncoder(vcfg)
    S = 1024
    pdim = vcfg.in_channels * vcfg.temporal_patch_size * vcfg.patch_size ** 2
    patches = jax.ShapeDtypeStruct((S, pdim), jnp.float32)
    rot = jax.ShapeDtypeStruct((S, vcfg.head_dim // 2), jnp.float32)
    seg = jax.ShapeDtypeStruct((S,), jnp.int32)
    vp = jax.eval_shape(vision.init, rng,
                        jnp.zeros((16, pdim)),
                        jnp.zeros((16, vcfg.head_dim // 2)),
                        jnp.zeros((16,), jnp.int32),
                        jnp.zeros((16,), jnp.int32))
    vsh = jax.tree_util.tree_map(lambda _: repl, vp)
    _compile("vision", vision, vp, vsh, patches, rot, seg, seg)

    stats["compile_ok"] = 1.0
    stats["n_params"] = (stats["llm_params"] + stats["audio_params"]
                         + stats["vision_params"])
    return stats
