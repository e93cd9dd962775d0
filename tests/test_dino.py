import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spider_tpu.models.bert import BertModel, bert_test
from spider_tpu.models.dino import (GroundingDINO, GroundingDINOInference,
                                    grounding_dino_test)
from spider_tpu.models.swin import SwinTransformer, swin_test
from spider_tpu.models.tokenizer import TinyTokenizer
from spider_tpu.ops.msda import msda_reference


def test_msda_reference_uniform_weights_average():
    # With a constant value map, output must equal that constant.
    B, H, D = 1, 2, 4
    shapes = [(4, 4), (2, 2)]
    S = sum(h * w for h, w in shapes)
    value = jnp.ones((B, S, H, D)) * 3.0
    Q, L, P = 5, 2, 3
    # interior locations: all four bilinear corners stay in bounds (the op
    # zero-pads outside, matching grid_sample padding_mode='zeros')
    locs = jax.random.uniform(jax.random.PRNGKey(0), (B, Q, H, L, P, 2),
                              minval=0.3, maxval=0.7)
    w = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1),
                                         (B, Q, H, L * P)), -1)
    w = w.reshape(B, Q, H, L, P)
    out = msda_reference(value, shapes, locs, w)
    np.testing.assert_allclose(np.asarray(out), 3.0, rtol=1e-5)


def test_msda_reference_point_sampling():
    # Sampling exactly at a pixel center returns that pixel's value.
    shapes = [(2, 2)]
    value = jnp.arange(4.0).reshape(1, 4, 1, 1)
    # pixel (x=1, y=0) -> flat idx 1; center = ((1+0.5)/2, (0+0.5)/2)
    locs = jnp.array([[[[[(0.75, 0.25)]]]]], jnp.float32)  # [1,1,1,1,1,2]
    w = jnp.ones((1, 1, 1, 1, 1))
    out = msda_reference(value, shapes, locs, w)
    assert float(out[0, 0, 0]) == pytest.approx(1.0, abs=1e-5)


@pytest.mark.slow  # 21s; the full DINO forward covers the tower
def test_swin_stages():
    cfg = swin_test()
    model = SwinTransformer(cfg)
    x = jnp.zeros((1, 3, 64, 64))
    params = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(params, x)
    assert len(outs) == len(cfg.out_indices)
    # stage i output: H/4/2^i with embed_dim*2^i channels
    assert outs[0].shape == (1, 8, 8, cfg.embed_dim * 2)
    assert outs[1].shape == (1, 4, 4, cfg.embed_dim * 4)
    assert outs[2].shape == (1, 2, 2, cfg.embed_dim * 8)


def test_bert_shapes():
    cfg = bert_test()
    model = BertModel(cfg)
    ids = jnp.array([[1, 5, 9, 0]])
    mask = jnp.array([[1, 1, 1, 0]])
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    seq, pooled = model.apply(params, ids, mask)
    assert seq.shape == (1, 4, cfg.hidden_size)
    assert pooled.shape == (1, cfg.hidden_size)


@pytest.fixture(scope="module")
def dino():
    cfg = grounding_dino_test()
    model = GroundingDINO(cfg)
    images = jnp.zeros((1, 3, 64, 64))
    ids = jnp.ones((1, cfg.max_text_len), jnp.int32)
    mask = jnp.ones((1, cfg.max_text_len), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), images, ids, mask)
    return cfg, model, params


@pytest.mark.slow  # 65s module fixture; msda/bert fast tests + the driver
def test_grounding_dino_forward(dino):  # dryrun keep default-tier coverage
    cfg, model, params = dino
    images = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 64, 64))
    ids = jnp.ones((1, cfg.max_text_len), jnp.int32)
    mask = jnp.concatenate([jnp.ones((1, 4), jnp.int32),
                            jnp.zeros((1, cfg.max_text_len - 4), jnp.int32)], -1)
    out = model.apply(params, images, ids, mask)
    K = cfg.num_queries
    assert out["boxes"].shape == (1, K, 4)
    assert out["scores"].shape == (1, K)
    b = np.asarray(out["boxes"])
    assert (b >= 0).all() and (b <= 1).all()
    s = np.asarray(out["scores"])
    assert (s >= 0).all() and (s <= 1).all()


@pytest.mark.slow
def test_inference_detector_contract(dino):
    cfg, model, params = dino
    tok = TinyTokenizer()
    infer = GroundingDINOInference(model, params, tok, image_size=64,
                                   max_dets=10)
    image = np.random.randint(0, 255, (48, 60, 3), np.uint8)
    res = infer(image, "a dog")
    assert set(res) == {"bboxes", "label_names", "scores"}
    assert len(res["bboxes"]) == 10
    assert res["label_names"][0] == "a dog"
    assert sorted(res["scores"], reverse=True) == res["scores"]
    for box in res["bboxes"]:
        x1, y1, x2, y2 = box
        assert 0 <= x1 <= 60 and 0 <= y1 <= 48
