import io
import itertools
import tarfile

import pytest

from spider_tpu.datasets.native_loader import NativeTarSource, load_library


def _make_shard(path, n, prefix=""):
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            for ext, payload in (("txt", f"caption {prefix}{i}".encode()),
                                 ("json", b'{"a": 1}')):
                info = tarfile.TarInfo(f"{prefix}{i:05d}.{ext}")
                info.size = len(payload)
                tf.addfile(info, io.BytesIO(payload))


@pytest.fixture(scope="module")
def lib():
    try:
        return load_library()
    except Exception as e:  # toolchain missing
        pytest.skip(f"native build unavailable: {e}")


def test_native_reader_reads_all_samples(lib, tmp_path):
    _make_shard(tmp_path / "a.tar", 5, "a")
    _make_shard(tmp_path / "b.tar", 3, "b")
    src = NativeTarSource(str(tmp_path / "*.tar"), n_threads=2, loop=False)
    samples = list(src)
    assert len(samples) == 8
    keys = sorted(s["__key__"] for s in samples)
    assert keys[0].startswith("a") and keys[-1].startswith("b")
    s = samples[0]
    assert s["txt"].startswith("caption")
    assert s["json"] == {"a": 1}


def test_native_reader_matches_python_reader(lib, tmp_path):
    from spider_tpu.datasets.backends import TarShardSource

    _make_shard(tmp_path / "x.tar", 10)
    native = {s["__key__"]: s["txt"]
              for s in NativeTarSource(str(tmp_path / "x.tar"), loop=False)}
    python = {}
    py_src = TarShardSource(str(tmp_path / "x.tar"), shuffle_buffer=1,
                            resample=False)
    for s in itertools.islice(iter(py_src), 10):
        python[s["__key__"]] = s["txt"]
    assert native == python


def test_native_reader_loop_mode(lib, tmp_path):
    _make_shard(tmp_path / "l.tar", 2)
    src = NativeTarSource(str(tmp_path / "l.tar"), loop=True)
    out = list(itertools.islice(iter(src), 7))
    assert len(out) == 7  # cycles past the 2 underlying samples
