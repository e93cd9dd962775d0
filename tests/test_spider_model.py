import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spider_tpu.models.factory import build_tiny_spider
from spider_tpu.models.spider import IGNORE, get_llm_text_res_train, split_placeholder


@pytest.fixture(scope="module")
def spider():
    return build_tiny_spider()


def _image_samples(spider, ib_size=28):
    return {
        "Question": ["look at <IMAGE><IMAGE-Placeholder></IMAGE> please"],
        "TaskPrompt": ["[IMAGE]"],
        "Answer": ["<IMAGE>a dog<IMAGE-Placeholder></IMAGE>"],
        "Caption": ["a dog"],
        "IMAGE": [np.zeros((3, 2, ib_size, ib_size), np.float32)],
    }


def test_split_placeholder():
    out = split_placeholder("<IMAGE><IMAGE-Placeholder></IMAGE> a dog")
    assert out == ["<IMAGE>", "<IMAGE-Placeholder>", "</IMAGE> a dog"]


def test_get_llm_text_res_train():
    s = "[OUTPUT]<MASK>apple[MASK0]</MASK>[END]"
    assert get_llm_text_res_train(s, "MASK") == ["apple"]


@pytest.mark.slow
def test_prepare_batch_structure(spider):
    samples = _image_samples(spider)
    batch = spider.prepare_batch(samples)
    tok = spider.tokenizer
    B, L = batch.input_ids.shape
    assert B == 1
    # exactly one IMAGE slot in the question
    assert batch.slot_mask["IMAGE"].sum() == 1
    # answer targets: IGNORE outside, real ids inside; [END] last non-ignore
    tgt = batch.targets[0]
    valid = tgt[tgt != IGNORE]
    assert len(valid) > 0
    end_id = spider._one_id("[END]")
    assert valid[-1] == end_id
    # signal positions point at [IMAGE0..3] in the targets
    sig = batch.signal_pos[0]
    sig_ids = [spider._one_id(f"[IMAGE{i}]") for i in range(4)]
    np.testing.assert_array_equal(tgt[sig], sig_ids)
    # caption span covers 'a dog' tokens between <IMAGE> and [IMAGE0]
    s, e = batch.text_span[0]
    assert e > s
    # inputs equal targets on the answer span (teacher forcing)
    np.testing.assert_array_equal(batch.input_ids[0][sig], sig_ids)


@pytest.mark.slow
def test_forward_image_task_losses(spider):
    out = spider.forward(_image_samples(spider))
    assert set(out) >= {"loss", "gen_loss", "gen_acc",
                        "IMAGE_semantic_align_mse_loss"}
    for k, v in out.items():
        assert np.isfinite(float(v)), (k, v)


@pytest.mark.slow
def test_forward_text_task(spider):
    samples = {
        "Question": ["hello"],
        "TaskPrompt": ["[TEXT]"],
        "Answer": ["hi there"],
    }
    out = spider.forward(samples)
    assert set(out) == {"loss", "gen_loss", "gen_acc"}
    assert np.isfinite(float(out["loss"]))


@pytest.mark.slow
def test_forward_audio_task(spider):
    samples = {
        "Question": ["make a sound like <AUDIO><AUDIO-Placeholder></AUDIO>"],
        "TaskPrompt": ["[AUDIO]"],
        "Answer": ["<AUDIO>meow<AUDIO-Placeholder></AUDIO>"],
        "Caption": ["meow"],
        "AUDIO": [np.zeros((1, 16, 20), np.float32)],
    }
    out = spider.forward(samples)
    assert "AUDIO_semantic_align_mse_loss" in out
    assert np.isfinite(float(out["loss"]))


@pytest.mark.slow
def test_forward_gradients_flow(spider):
    samples = _image_samples(spider)
    batch = spider.prepare_batch(samples)
    modality_embeds = spider.encode_modalities(batch)
    cond = spider.diffusion_pipes["IMAGE"](prompt=samples["Caption"],
                                           return_prompts_only=True)

    def loss_fn(params):
        return spider.compute_loss(params, batch, modality_embeds, cond,
                                   "IMAGE")["loss"]

    grads = jax.grad(loss_fn)(spider.trainable_params())
    lora_grads = [g for p, g in jax.tree_util.tree_leaves_with_path(grads["llm"])
                  if "lora" in str(p)]
    assert lora_grads and any(float(jnp.abs(g).max()) > 0 for g in lora_grads)
    align_leaves = jax.tree_util.tree_leaves(grads["aligners"]["IMAGE"])
    assert any(float(jnp.abs(g).max()) > 0 for g in align_leaves)


def test_generate_returns_answer(spider):
    samples = {
        "Question": ["draw a cat"],
        "TaskPrompt": ["[IMAGE]"],
    }
    from spider_tpu.models.spider_decoder import (empty_predictions,
                                                  empty_predictions_text)
    answers, predictions, predictions_text = spider.generate(
        samples, [], empty_predictions(), empty_predictions_text(),
        max_new_tokens=8, num_inference_steps=2)
    assert len(answers) == 1
    assert isinstance(answers[0], str)


@pytest.mark.slow
def test_moe_aligner_variant():
    spider = build_tiny_spider(use_moe_aligner=True, with_pipes=True)
    out = spider.forward(_image_samples(spider))
    assert np.isfinite(float(out["loss"]))


@pytest.mark.slow
def test_mask_task_trains_sam_decoder():
    spider = build_tiny_spider(with_sam=True, with_pipes=False)
    sam_size = spider.sam[0].config.img_size
    samples = {
        "Question": ["segment the dog <IMAGE><IMAGE-Placeholder></IMAGE>"],
        "TaskPrompt": ["[MASK]"],
        "Answer": ["<MASK>dog<MASK-Placeholder></MASK>"],
        "Caption": ["dog"],
        "IMAGE": [np.zeros((3, 2, 28, 28), np.float32)],
        "IMAGE_SAM": [np.zeros((3, sam_size, sam_size), np.float32)],
        "MASK": [np.ones((sam_size, sam_size), np.float32)],
    }
    out = spider.forward(samples)
    assert "bce_loss" in out and "dice_loss" in out
    assert np.isfinite(float(out["loss"]))

    # gradients reach the SAM mask decoder and the MASK aligner but NOT the
    # SAM image/prompt encoders
    batch = spider.prepare_batch(samples)
    aux = {"IMAGE_SAM": np.stack([np.asarray(x) for x in samples["IMAGE_SAM"]]),
           "MASK_GT": np.stack([np.asarray(x) for x in samples["MASK"]])}

    def loss_fn(p):
        return spider.compute_loss(p, batch, spider.encode_modalities(batch),
                                   None, "MASK", aux)["loss"]

    grads = jax.grad(loss_fn)(spider.trainable_params())
    dec = max(float(jnp.abs(g).max()) for g in
              jax.tree_util.tree_leaves(grads["sam"]["params"]["mask_decoder"]))
    enc = max(float(jnp.abs(g).max()) for g in
              jax.tree_util.tree_leaves(grads["sam"]["params"]["image_encoder"]))
    pe = max(float(jnp.abs(g).max()) for g in
             jax.tree_util.tree_leaves(grads["sam"]["params"]["prompt_encoder"]))
    align = max(float(jnp.abs(g).max()) for g in
                jax.tree_util.tree_leaves(grads["aligners"]["MASK"]))
    assert dec > 0 and align > 0
    assert enc == 0.0 and pe == 0.0


@pytest.mark.slow
def test_embed_and_word_align_losses():
    spider = build_tiny_spider()
    spider.use_embed_align_loss = True
    spider.word_align_loss = True
    samples = _image_samples(spider)
    out = spider.forward(samples)
    assert "IMAGE_embed_align_mse_loss" in out
    assert np.isfinite(float(out["loss"]))
    # only_embed_align_loss short-circuits
    spider.only_embed_align_loss = True
    out2 = spider.forward(samples)
    assert set(out2) == {"loss", "gen_loss", "gen_acc"}
    spider.use_embed_align_loss = False
    spider.word_align_loss = False
    spider.only_embed_align_loss = False


def test_standalone_aligner_losses():
    """Kosmos-G-style standalone aligner (models/aligner.py; reference
    spider/models/aligner.py:11 — optional/unwired there too)."""
    import dataclasses
    import jax
    import jax.numpy as jnp

    from spider_tpu.models.aligner import (Aligner, AlignerConfig,
                                           AlignerEncoder)

    cfg = AlignerConfig(llm_dim=32, clip_dim=16, num_queries=7,
                        max_positions=64)
    m = Aligner(cfg)
    cond = jax.random.normal(jax.random.PRNGKey(0), (2, 11, 32))
    clip = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 16))
    params = m.init(jax.random.PRNGKey(2), cond, clip)
    out = m.apply(params, cond, clip)
    assert out["aligned"].shape == (2, 7, 16)
    assert float(out["mse_loss"]) > 0 and float(out["rec_loss"]) > 0

    enc = AlignerEncoder(cfg)
    ep = enc.init(jax.random.PRNGKey(3), cond)
    aligned = enc.apply(ep, cond)
    assert aligned.shape == (2, 7, 16)
