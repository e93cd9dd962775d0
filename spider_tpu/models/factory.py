"""Model assembly: build Spider instances from configs.

`build_tiny_spider` wires every component at test scale (random weights, CPU-
runnable) — the analogue of the reference's `spider_demo_train.py` model blob,
and the fixture backbone for the test pyramid (SURVEY.md §4).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spider_tpu.models import llama as L
from spider_tpu.models.aligners import TextFcLayer, TextFcLayerMoE
from spider_tpu.models.imagebind import ImageBindEncoder, imagebind_tiny
from spider_tpu.models.pipelines.ad import build_tiny_ad
from spider_tpu.models.pipelines.sd import build_tiny_sd
from spider_tpu.models.pipelines.vd import build_tiny_vd
from spider_tpu.models.spider import Spider
from spider_tpu.models.tokenizer import TinyTokenizer, extend_tokenizer


def build_tiny_spider(rng: Optional[jax.Array] = None,
                      use_moe_aligner: bool = False,
                      with_pipes: bool = True,
                      with_sam: bool = False,
                      modality_tokens: Optional[Dict[str, int]] = None,
                      lora_r: int = 4,
                      max_context_len: int = 128) -> Spider:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    tokenizer = TinyTokenizer()
    modality_tokens = modality_tokens or {"IMAGE": 4, "VIDEO": 8, "AUDIO": 4,
                                          "MASK": 1, "BOX": 1}
    extend_tokenizer(tokenizer, modality_tokens, bbox_bins=16)

    cfg = L.llama_tiny(vocab_size=len(tokenizer) + 8, lora_r=lora_r)
    llm = L.LlamaForCausalLM(cfg)
    llm_params = llm.init(rng, jnp.ones((1, 8), jnp.int32))

    ib_cfg = imagebind_tiny()
    encoder = ImageBindEncoder(ib_cfg)
    encoder_params = encoder.init(
        rng, {"vision": jnp.zeros((1, 3, 2, ib_cfg.image_size, ib_cfg.image_size)),
              "audio": jnp.zeros((1, 1, ib_cfg.audio_mel_bins,
                                  ib_cfg.audio_target_len))})

    k1, k2 = jax.random.split(rng)
    llama_proj_params = {
        "kernel": jax.random.normal(k1, (ib_cfg.embed_dim, cfg.hidden_size)) * 0.02,
        "bias": jnp.zeros((cfg.hidden_size,)),
    }

    pipes = {}
    if with_pipes:
        pipes = {
            "IMAGE": build_tiny_sd(tokenizer=tokenizer),
            "VIDEO": build_tiny_vd(tokenizer=tokenizer),
            "AUDIO": build_tiny_ad(tokenizer=tokenizer),
        }

    sam = None
    sam_prompt_dim = 8
    if with_sam:
        from spider_tpu.models.sam import Sam, sam_tiny

        sam_cfg = sam_tiny()
        sam_prompt_dim = sam_cfg.prompt_embed_dim
        sam_model = Sam(sam_cfg)
        sam_params = sam_model.init(
            rng, jnp.zeros((1, 3, sam_cfg.img_size, sam_cfg.img_size)),
            boxes=jnp.zeros((1, 1, 4)))
        sam = (sam_model, sam_params)

    # alignment dims follow the pipes' conditioning spaces
    align_specs = {
        "IMAGE": dict(alignment_input_tokens=modality_tokens["IMAGE"],
                      alignment_output_tokens=77, alignment_output_dim=32),
        "VIDEO": dict(alignment_input_tokens=modality_tokens["VIDEO"],
                      alignment_output_tokens=77, alignment_output_dim=32),
        "AUDIO": dict(alignment_input_tokens=modality_tokens["AUDIO"],
                      alignment_output_tokens=1, alignment_output_dim=16),
        "MASK": dict(alignment_input_tokens=1, alignment_output_tokens=1,
                     alignment_output_dim=sam_prompt_dim),
    }

    moe_aligner = None
    aligners = {}
    if use_moe_aligner:
        model = TextFcLayerMoE(cfg.hidden_size, align_specs,
                               mode="moe_transformer", hidden_dim=32,
                               num_expert_layers=1)
        moe_aligner = (model, _init_moe_all(model, rng, cfg.hidden_size,
                                            align_specs))
    else:
        for m, spec in align_specs.items():
            model = TextFcLayer(cfg.hidden_size, spec["alignment_output_dim"],
                                num_input_tokens=spec["alignment_input_tokens"],
                                num_output_tokens=spec["alignment_output_tokens"],
                                mode="transformer", hidden_dim=32)
            params = model.init(rng, jnp.zeros((1, spec["alignment_input_tokens"],
                                                cfg.hidden_size)))
            aligners[m] = (model, params)

    return Spider(
        llm_model=llm, llm_params=llm_params, tokenizer=tokenizer,
        encoder_model=encoder, encoder_params=encoder_params,
        llama_proj_params=llama_proj_params,
        aligners=aligners, moe_aligner=moe_aligner,
        diffusion_pipes=pipes, sam=sam, modality_tokens=modality_tokens,
        max_context_len=max_context_len)


def build_spider_from_config(model_config: Dict) -> "Spider":
    """Config blob -> Spider. preset='tiny' builds the hermetic test-scale
    model; otherwise checkpoints are loaded through the converters
    (spider_tpu.models.convert) when paths are provided."""
    from spider_tpu.models.spider import Spider  # noqa: F401

    cfg = dict(model_config)
    preset = cfg.pop("preset", "tiny")
    if preset == "tiny":
        keys = {k: cfg[k] for k in
                ("use_moe_aligner", "with_pipes", "modality_tokens", "lora_r",
                 "max_context_len") if k in cfg}
        return build_tiny_spider(**keys)
    raise NotImplementedError(
        f"preset {preset!r}: full-size assembly requires converted "
        "checkpoints (see spider_tpu/models/convert.py)")


def _init_moe_all(model: TextFcLayerMoE, rng, hidden_size, align_specs):
    """Init the MoE aligner with every modality's heads present: flax creates
    params lazily per call path, so run one init per modality and merge."""
    import flax

    merged = None
    for m in align_specs:
        p = model.init(rng, jnp.zeros((1, 4, hidden_size)), modality=m)
        if merged is None:
            merged = flax.core.unfreeze(p)
        else:
            merged["params"].update(flax.core.unfreeze(p)["params"])
    return flax.core.freeze(merged) if merged is not None else None
