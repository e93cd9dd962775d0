import itertools
import os
import tarfile

import numpy as np
import pytest

import spider_tpu.datasets  # registers builders
from spider_tpu.common.config import ConfigDict
from spider_tpu.common.registry import registry
from spider_tpu.datasets.backends import TarShardSource
from spider_tpu.datasets.utils.loaders import (IterLoader, MultiIterLoader,
                                               PrefetchLoader, batched,
                                               collate_samples)

ALL_BUILDERS = [
    "i2t_cc_sbu", "v2t_webvid", "a2t_audiocap",
    "t2i_cc_sbu", "t2v_webvid", "t2a_audiocap",
    "t2i_ts_cc_sbu", "t2v_ts_webvid", "t2a_ts_audiocap",
    "t2v_ts_mul_webvid", "t2v_ts_spec_webvid",
    "i2t_ts_cc_sbu", "v2t_ts_webvid", "a2t_ts_audiocap",
    "it2b_refcoco", "it2m_refcoco", "it2b_ts_refcoco", "it2m_ts_refcoco",
    "travel_guide", "pororo", "flintstones",
]


def test_all_21_builders_registered():
    for name in ALL_BUILDERS:
        assert registry.get_builder_class(name) is not None, name


@pytest.mark.parametrize("name", ALL_BUILDERS)
def test_builder_yields_valid_samples(name):
    cls = registry.get_builder_class(name)
    cfg = ConfigDict({"build_info": {"synthetic_size": 32, "num_samples": 4,
                                     "image_size": 28, "num_clips": 2,
                                     "num_mels": 16, "target_length": 20,
                                     "sam_size": 64}})
    ds = cls(cfg).build_datasets()
    sample = next(iter(ds))
    assert {"Question", "TaskPrompt", "Answer"} <= set(sample)
    assert sample["TaskPrompt"].startswith("[") and sample["TaskPrompt"].endswith("]")
    # answers with placeholders reference a modality present in the question
    if "Placeholder" in sample["Answer"]:
        assert "<" in sample["Answer"]


def test_t2x_sample_tensor_shapes():
    cls = registry.get_builder_class("t2i_cc_sbu")
    cfg = ConfigDict({"build_info": {"image_size": 28}})
    sample = next(iter(cls(cfg).build_datasets()))
    assert sample["IMAGE"].shape == (3, 2, 28, 28)
    assert sample["TaskPrompt"] == "[IMAGE]"
    assert "<IMAGE-Placeholder>" in sample["Answer"]
    assert sample["Caption"] in sample["Answer"]


def test_grounding_sample_contract():
    cls = registry.get_builder_class("it2m_refcoco")
    cfg = ConfigDict({"build_info": {"synthetic_size": 48, "sam_size": 64,
                                     "num_samples": 2}})
    ds = cls(cfg).build_datasets()
    sample = ds[0]
    assert sample["TaskPrompt"] == "[MASK]"
    assert sample["IMAGE_SAM"].shape == (3, 64, 64)
    assert sample["MASK"].shape == (64, 64)
    assert set(sample["Meta_info"]) >= {"original_shape", "sam_shape",
                                        "original_box"}
    # box scaled into the 512 frame, xyxy ordered
    box = sample["BOX"]
    assert box[2] >= box[0] and box[3] >= box[1]


def test_multi_iter_loader_deterministic():
    a = itertools.repeat("a")
    b = itertools.repeat("b")
    l1 = MultiIterLoader([iter(a), iter(b)], ratios=[9, 1], seed=7)
    l2 = MultiIterLoader([itertools.repeat("a"), itertools.repeat("b")],
                         ratios=[9, 1], seed=7)
    seq1 = [next(l1) for _ in range(20)]
    seq2 = [next(l2) for _ in range(20)]
    assert seq1 == seq2
    assert seq1.count("a") > seq1.count("b")


def test_iter_loader_epochs():
    loader = IterLoader([1, 2, 3])
    out = [next(loader) for _ in range(7)]
    assert out == [1, 2, 3, 1, 2, 3, 1]
    assert loader.epoch == 2


def test_prefetch_and_batched():
    data = [{"x": np.ones((2, 2)) * i, "Caption": f"c{i}"} for i in range(6)]
    pf = PrefetchLoader(data, depth=2)
    batches = list(batched(iter(pf), 3))
    assert len(batches) == 2
    assert len(batches[0]["x"]) == 3
    assert batches[0]["Caption"] == ["c0", "c1", "c2"]


def test_tar_shard_source(tmp_path):
    shard = tmp_path / "shard-000.tar"
    with tarfile.open(shard, "w") as tf:
        for i in range(3):
            txt = f"caption {i}".encode()
            info = tarfile.TarInfo(f"{i:05d}.txt")
            info.size = len(txt)
            import io

            tf.addfile(info, io.BytesIO(txt))
    src = TarShardSource(str(shard), shuffle_buffer=2, seed=0, resample=False)
    samples = list(itertools.islice(iter(src), 3))
    assert len(samples) == 3
    assert all("txt" in s for s in samples)


def test_train_augment_shapes():
    from spider_tpu.processors.vision import train_augment

    img = np.random.default_rng(0).integers(0, 255, (32, 40, 3), np.uint8)
    out = train_augment(img, rng=np.random.default_rng(1))
    assert out.shape == (32, 40, 3)
    assert out.min() >= 0 and out.max() <= 255


def test_shard_writer_roundtrip(tmp_path):
    from spider_tpu.datasets.shard_writer import ShardWriter

    pattern = str(tmp_path / "shard-%05d.tar")
    with ShardWriter(pattern, max_samples=2) as w:
        for i in range(5):
            w.write(f"{i:05d}", {"txt": f"caption {i}",
                                 "json": {"idx": i}})
    assert len(w.paths) == 3  # 2+2+1
    src = TarShardSource(str(tmp_path / "shard-*.tar"), shuffle_buffer=1,
                         resample=False)
    samples = list(itertools.islice(iter(src), 5))
    assert len(samples) == 5
    assert {s["json"]["idx"] for s in samples} == set(range(5))


def test_randaugment_ops_shapes_and_ranges():
    """Every RandAugment op preserves shape/dtype; level mappings match
    the reference semantics (randaugment.py level_to_args)."""
    import numpy as np

    from spider_tpu.processors import randaugment as RA

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    for name, (fn, to_args) in RA.OPS.items():
        out = fn(img, *to_args(5, rng))
        assert out.shape == img.shape and out.dtype == np.uint8, name
    # deterministic geometric checks
    assert np.array_equal(RA.translate_x(img, 0.0), img)
    rolled = RA.translate_x(img, 4.0)       # dst[x] = src[x+offset]
    assert np.array_equal(rolled[:, :-4], img[:, 4:])   # shifted content
    assert (rolled[:, -4:] == 0).all()                  # fill (default 0)
    assert np.array_equal(RA.posterize(img, 8), img)
    assert set(np.unique(RA.posterize(img, 1) & 0x7F)) == {0}
    sol = RA.solarize(img, 128)
    assert np.array_equal(sol[img < 128], img[img < 128])
    assert np.array_equal(sol[img >= 128], 255 - img[img >= 128])
    # pipeline runs
    aug = RA.RandomAugment(N=2, M=5, rng=np.random.default_rng(1))
    out = aug(img)
    assert out.shape == img.shape


def test_video_randaugment_runs():
    import numpy as np

    from spider_tpu.processors.randaugment import VideoRandomAugment

    frames = np.random.default_rng(0).integers(
        0, 256, (4, 16, 16, 3), dtype=np.uint8)
    aug = VideoRandomAugment(N=2, M=5, rng=np.random.default_rng(2))
    out = aug(frames)
    assert out.shape == frames.shape and out.dtype == np.float32
