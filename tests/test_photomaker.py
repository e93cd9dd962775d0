"""PhotoMaker ID encoder + ref-image story mode
(StoryDiffusion "Using Ref Images"; utils/model.py + utils/pipeline.py:31)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spider_tpu.models.photomaker import (build_tiny_photomaker,
                                          preprocess_id_images,
                                          prompts_with_trigger)
from spider_tpu.models.tokenizer import TinyTokenizer


def test_trigger_surgery_removes_trigger_and_marks_class_tokens():
    tok = TinyTokenizer()
    ids, mask = prompts_with_trigger(tok, ["a man img walking"], "img",
                                     num_id_images=2, max_len=32, eos=2)
    assert ids.shape == (1, 32) and mask.shape == (1, 32)
    # exactly two fused positions, labeled 1 and 2, adjacent, same token
    pos = np.nonzero(mask[0])[0]
    assert list(mask[0][pos]) == [1, 2]
    assert pos[1] == pos[0] + 1
    assert ids[0][pos[0]] == ids[0][pos[1]]
    # the trigger's byte tokens are gone (byte-level: 'img' = 3 tokens;
    # the preceding class byte 'n' is duplicated instead)
    trig = list(tok("img", add_special_tokens=False).input_ids)
    flat = list(ids[0])
    assert not any(flat[i: i + len(trig)] == trig
                   for i in range(len(flat) - len(trig)))


def test_id_encoder_fuses_only_masked_positions():
    enc, params = build_tiny_photomaker(embed_dim=80)
    cfg = enc.config
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.normal(size=(2, cfg.image_size,
                                          cfg.image_size, 3)), jnp.float32)
    prompt = jnp.asarray(rng.normal(size=(1, 77, 80)), jnp.float32)
    mask = np.zeros((1, 77), np.int32)
    mask[0, 5], mask[0, 6] = 1, 2
    out = enc.apply(params, pixels, prompt, jnp.asarray(mask))
    out = np.asarray(out)
    ref = np.asarray(prompt)
    untouched = np.ones(77, bool)
    untouched[[5, 6]] = False
    np.testing.assert_array_equal(out[0, untouched], ref[0, untouched])
    assert np.abs(out[0, 5] - ref[0, 5]).max() > 1e-6
    # the two positions see DIFFERENT id images
    assert np.abs(out[0, 5] - out[0, 6]).max() > 1e-6


@pytest.mark.slow  # 23s e2e; fuse/trigger unit tests stay fast
def test_story_pipeline_ref_image_mode():
    from spider_tpu.models.pipelines.sdxl_story import (build_tiny_sdxl,
                                                        story_generation)

    pipe = build_tiny_sdxl()
    enc, params = build_tiny_photomaker(embed_dim=80)
    ref = (np.random.default_rng(1).random((24, 24, 3)) * 255).astype(
        np.uint8)
    imgs = story_generation(
        pipe, "a man img", ["at the beach", "in the forest"],
        "Japanese Anime", id_length=2, num_inference_steps=2,
        ref_images=[ref], id_encoder=enc, id_params=params)
    assert len(imgs) == 2 and imgs[0].shape[-1] == 3
    # identity conditioning changes the output vs the no-ref run
    base = story_generation(
        pipe, "a man img", ["at the beach", "in the forest"],
        "Japanese Anime", id_length=2, num_inference_steps=2)
    assert np.abs(np.asarray(imgs[0]) - np.asarray(base[0])).max() > 1e-6


def test_preprocess_id_images_shapes():
    ims = [np.zeros((50, 70, 3), np.uint8),
           np.ones((16, 16, 4), np.float32)]
    out = preprocess_id_images(ims, 32)
    assert out.shape == (2, 32, 32, 3)


def test_photomaker_converter_roundtrip():
    from test_convert_diffusion import make_photomaker_sd

    from spider_tpu.models.convert import convert_photomaker_state_dict
    from spider_tpu.models.photomaker import photomaker_tiny

    cfg = photomaker_tiny()
    sd, enc, params = make_photomaker_sd(cfg)
    converted = convert_photomaker_state_dict(sd, cfg)
    assert jax.tree_util.tree_structure(converted) == \
        jax.tree_util.tree_structure(params)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(converted),
            jax.tree_util.tree_leaves_with_path(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   err_msg=str(pa))
