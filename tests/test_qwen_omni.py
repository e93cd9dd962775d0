"""Native Qwen2.5-Omni thinker (models/qwen_omni.py): any-modality -> text
(BASELINE config #3). Towers + splicing + loud-failure semantics."""

import numpy as np
import pytest

from spider_tpu.models.qwen_omni import (AUDIO_PLACEHOLDER, IMAGE_PLACEHOLDER,
                                         VIDEO_PLACEHOLDER,
                                         build_tiny_omni_thinker)


@pytest.fixture(scope="module")
def thinker():
    return build_tiny_omni_thinker()


def test_text_only_chat(thinker):
    out = thinker.chat("hello world")
    assert isinstance(out, str)


def test_multimodal_chat_all_modalities(thinker):
    mel = np.zeros((32, 16), np.float32)
    img = np.zeros((16, 16, 3), np.float32)
    vid = np.zeros((2, 16, 16, 3), np.float32)
    out = thinker.chat(
        f"describe {AUDIO_PLACEHOLDER} and {IMAGE_PLACEHOLDER} "
        f"and {VIDEO_PLACEHOLDER}",
        audios=[mel], images=[img], videos=[vid])
    assert isinstance(out, str)


def test_tower_token_shapes(thinker):
    a = thinker.encode_audio(np.zeros((32, 16), np.float32))
    # conv stride 2 then pool 2: 32 -> 16 -> 8 audio tokens
    assert a.shape == (8, 64)
    v = thinker.encode_image(np.zeros((16, 16, 3), np.float32))
    # patch 4 -> 4x4 grid, 2x2 merge -> 4 tokens
    assert v.shape == (4, 64)
    f = thinker.encode_video(np.zeros((3, 16, 16, 3), np.float32))
    assert f.shape == (12, 64)


def test_dropped_input_raises(thinker):
    img = np.zeros((16, 16, 3), np.float32)
    with pytest.raises(ValueError, match="no .*marker|refusing"):
        thinker.chat("describe this", images=[img])


def test_missing_input_raises(thinker):
    with pytest.raises(ValueError, match="no matching input"):
        thinker.chat(f"describe {IMAGE_PLACEHOLDER}")
