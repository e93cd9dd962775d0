"""REFER pickle-corpus loader + config-corpus instantiation coverage
(VERDICT r4 #7: every train_configs/*.py instantiates through
setup_task -> build_datasets -> build_model)."""

import glob
import json
import os
import pickle

import numpy as np
import pytest

from spider_tpu.datasets.refer import (ReferCorpus, ann_to_mask,
                                       decode_compressed_rle,
                                       polygons_to_mask)

# ------------------------------------------------------------------ masks


def test_polygon_rasterization():
    # unit square from (2,2) to (6,6) in a 10x10 canvas
    mask = polygons_to_mask([[2, 2, 6, 2, 6, 6, 2, 6]], 10, 10)
    assert mask[4, 4] == 1 and mask[0, 0] == 0 and mask[9, 9] == 0
    assert 9 <= mask.sum() <= 25


def test_compressed_rle_roundtrip():
    # build a mask, encode with the COCO varint scheme, decode back
    rng = np.random.default_rng(0)
    mask = (rng.random((13, 7)) > 0.6).astype(np.uint8)
    flat = mask.T.reshape(-1)  # column-major
    runs, val, count = [], 0, 0
    for v in flat:
        if v == val:
            count += 1
        else:
            runs.append(count)
            val, count = v, 1
    runs.append(count)

    def encode(vals):
        out = []
        for i, x in enumerate(vals):
            if i > 2:
                x -= vals[i - 2]
            more = 1
            while more:
                c = x & 0x1F
                x >>= 5
                more = not (x == 0 and not (c & 0x10)
                            or x == -1 and (c & 0x10))
                if more:
                    c |= 0x20
                out.append(chr(c + 48))
        return "".join(out)

    decoded = decode_compressed_rle(encode(runs), 13, 7)
    assert (decoded == mask).all()


# ------------------------------------------------------------- the corpus


def _write_tiny_refer(root):
    ann_dir = os.path.join(root, "refcoco")
    os.makedirs(ann_dir)
    refs = [
        dict(ref_id=1, ann_id=10, image_id=100, category_id=1,
             split="train",
             sentences=[dict(sent_id=0, sent="the red box", raw="The red box."),
                        dict(sent_id=1, sent="left object", raw="left object")]),
        dict(ref_id=2, ann_id=11, image_id=100, category_id=1, split="val",
             sentences=[dict(sent_id=2, sent="other thing", raw="other")]),
    ]
    with open(os.path.join(ann_dir, "refs(unc).p"), "wb") as f:
        pickle.dump(refs, f)
    instances = dict(
        images=[dict(id=100, file_name="img100.jpg", height=48, width=64)],
        annotations=[
            dict(id=10, image_id=100, bbox=[4, 6, 20, 10], area=200,
                 segmentation=[[4, 6, 24, 6, 24, 16, 4, 16]], category_id=1),
            dict(id=11, image_id=100, bbox=[30, 20, 8, 8], area=64,
                 segmentation=dict(counts=[0, 48 * 64], size=[48, 64]),
                 category_id=1),
        ],
        categories=[dict(id=1, name="box")],
    )
    with open(os.path.join(ann_dir, "instances.json"), "w") as f:
        json.dump(instances, f)
    return root


def test_refer_corpus_records(tmp_path):
    root = _write_tiny_refer(str(tmp_path))
    corpus = ReferCorpus(root, vis_root="", dataset="refcoco", split_by="unc")
    assert corpus.ref_ids("train") == [1]
    recs = list(corpus.records("train"))
    assert len(recs) == 2  # one per sentence
    assert recs[0]["caption"] == "the red box"
    assert recs[0]["box"].tolist() == [4, 6, 20, 10]
    assert recs[0]["mask"].shape == (48, 64) and recs[0]["mask"][10, 10] == 1
    # invrefcoco aliases the same storage (reference refer.py:20)
    ReferCorpus(root, dataset="invrefcoco")


def test_refer_through_grounding_builder(tmp_path):
    from spider_tpu import register_all
    from spider_tpu.common.registry import registry

    register_all()
    root = _write_tiny_refer(str(tmp_path))
    cfg = {"build_info": {"refer_root": root, "split": "train",
                          "sam_size": 64}}
    ds = registry.get_builder_class("it2m_refcoco")(cfg).build_datasets()
    sample = ds[0]
    assert sample["TaskPrompt"] == "[MASK]"
    assert sample["MASK"].shape == (64, 64)
    assert np.isfinite(sample["IMAGE"]).all()
    assert "red box" in sample["Answer"]


# --------------------------------------------------- config corpus dry run


CONFIGS = sorted(glob.glob(os.path.join(
    os.path.dirname(__file__), "..", "train_configs", "*.py")))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p)[:-3]
                                               for p in CONFIGS])
def test_config_instantiates(path):
    """Every config loads; decoder configs construct SpiderDecoder; train
    configs run setup_task -> build_datasets (model construction for the
    trainable configs is covered in the slow tier below)."""
    from spider_tpu import register_all, tasks
    from spider_tpu.common.config import Config
    from spider_tpu.common.registry import registry

    register_all()
    if os.path.basename(path) == "decoder_prompt_variants.py":
        import importlib.util

        spec = importlib.util.spec_from_file_location("variants", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        assert len(mod.VARIANTS) == 12
        return
    cfg = Config.fromfile(path)
    assert "model" in cfg and cfg.model.get("type")
    assert registry.get_model_class(cfg.model.type) is not None
    if cfg.model.type == "spider_decoder":
        model_config = dict(cfg.model)
        cls = registry.get_model_class(model_config.pop("type"))
        dec = cls(**model_config)
        assert dec.system_prompt
        return
    if "run" in cfg:
        task = tasks.setup_task(cfg)
        datasets = task.build_datasets(cfg)
        assert datasets, path


@pytest.mark.slow
@pytest.mark.parametrize("path", [p for p in CONFIGS
                                  if os.path.basename(p).startswith(
                                      ("spider_demo_train", "spider_train",
                                       "spider_longctx", "spider_story.p"))],
                         ids=lambda p: os.path.basename(p)[:-3])
def test_config_builds_model(path):
    """Full dry run incl. build_model (abstract for the 8B 'full' preset)."""
    from spider_tpu import register_all, tasks
    from spider_tpu.common.config import Config

    register_all()
    cfg = Config.fromfile(path)
    if cfg.model.get("preset") == "full":
        cfg.model.abstract = True
        cfg.model.with_sam = False
        cfg.model.with_encoder = False
    task = tasks.setup_task(cfg)
    model = task.build_model(cfg)
    assert model is not None
