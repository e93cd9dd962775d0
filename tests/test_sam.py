import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spider_tpu.models.sam import (Sam, postprocess_masks, sam_tiny)


@pytest.fixture(scope="module")
def sam():
    cfg = sam_tiny()
    model = Sam(cfg)
    images = jnp.zeros((1, 3, cfg.img_size, cfg.img_size))
    boxes = jnp.array([[[4.0, 4.0, 32.0, 32.0]]])
    params = model.init(jax.random.PRNGKey(0), images, boxes=boxes)
    return cfg, model, params


@pytest.mark.slow
def test_sam_box_prompt(sam):
    cfg, model, params = sam
    images = jax.random.normal(jax.random.PRNGKey(1),
                               (2, 3, cfg.img_size, cfg.img_size))
    boxes = jnp.array([[[4.0, 4.0, 32.0, 32.0]], [[0.0, 0.0, 16.0, 16.0]]])
    masks = model.apply(params, images, boxes, method=model.predict_box)
    hw = cfg.embed_hw * 4
    assert masks.shape == (2, 1, hw, hw)
    assert np.isfinite(np.asarray(masks)).all()


def test_sam_text_prompt(sam):
    cfg, model, params = sam
    images = jnp.zeros((1, 3, cfg.img_size, cfg.img_size))
    text = jax.random.normal(jax.random.PRNGKey(2), (1, 1, cfg.prompt_embed_dim))
    masks = model.apply(params, images, text, method=model.predict_text)
    assert masks.shape[0:2] == (1, 1)


@pytest.mark.slow
def test_mask_decoder_trainable_only(sam):
    cfg, model, params = sam
    images = jnp.zeros((1, 3, cfg.img_size, cfg.img_size))
    boxes = jnp.array([[[4.0, 4.0, 32.0, 32.0]]])

    def loss(p):
        masks = model.apply(p, images, boxes, method=model.predict_box)
        return jnp.sum(masks ** 2)

    grads = jax.grad(loss)(params)
    g = grads["params"]
    # encoder grads are zero (stop_gradient), decoder grads flow
    enc = np.max([float(jnp.abs(x).max())
                  for x in jax.tree_util.tree_leaves(g["image_encoder"])])
    dec = np.max([float(jnp.abs(x).max())
                  for x in jax.tree_util.tree_leaves(g["mask_decoder"])])
    assert enc == 0.0
    assert dec > 0.0


def test_postprocess_masks():
    masks = jnp.ones((1, 1, 16, 16))
    out = postprocess_masks(masks, input_size=(48, 64), original_size=(24, 32),
                            img_size=64)
    assert out.shape == (1, 1, 24, 32)


def test_multimask_output(sam):
    cfg, model, params = sam
    images = jnp.zeros((1, 3, cfg.img_size, cfg.img_size))
    emb = model.apply(params, images, method=model.encode_image)
    masks, iou = model.apply(params, emb,
                             boxes=jnp.array([[[1.0, 1.0, 8.0, 8.0]]]),
                             multimask_output=True, method=model.decode)
    assert masks.shape[1] == cfg.num_multimask_outputs
    assert iou.shape == (1, cfg.num_multimask_outputs)
