"""Converter key-manifest contract tests (VERDICT r2 item 8).

Two guarantees per family:
  1. The checked-in fixture (tests/fixtures/convert_keys/<family>.txt) is
     exactly what the depth-true emitter produces today — any converter or
     emitter change that alters the key contract fails here until the
     fixture is regenerated (tools/gen_converter_manifests.py) and the
     diff reviewed.
  2. The converter CONSUMES every key of its manifest (TrackingDict):
     no source tensor is silently ignored, the failure mode a pure
     roundtrip test cannot see.

With real checkpoints mounted, tools/verify_checkpoints.py diffs the real
state dict against the same fixtures in one command.
"""

import os

import numpy as np
import pytest

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "convert_keys")

# Cheap families run in the default tier; the deep towers are slow-marked.
FAST = ("clip_vit_l14", "bert_base", "clap_text", "vae_audioldm",
        "llama3_8b", "photomaker_v1")
SLOW = ("vae_sd", "clip_vit_h14", "clip_bigg", "unet_sd15", "unet_sdxl",
        "unet_audioldm", "unet3d_zeroscope", "sam_vit_h", "imagebind_huge",
        "grounding_dino_swin_t", "swin_t", "hifigan_audioldm",
        "omni_audio_tower", "omni_vision_tower", "omni_talker", "omni_dit",
        "omni_bigvgan")


# Source tensors a converter INTENTIONALLY leaves unconsumed (each must be
# justified): recomputed buffers and train-only embeddings. They stay in the
# fixture (the real checkpoint contains them) but are exempt from the
# consumption check.
KNOWN_UNCONSUMED = {
    # unused at inference (convert.py::convert_omni_audio_tower docstring)
    "omni_audio_tower": {"audio_bos_eos_token.weight"},
    # rotary table is a persistent buffer in HF's DiT; we recompute it
    "omni_dit": {"rotary_embed.inv_freq"},
}


class TrackingDict(dict):
    """Records which keys a converter actually reads."""

    def __init__(self, sd):
        super().__init__(sd)
        self.consumed = set()

    def __getitem__(self, k):
        v = super().__getitem__(k)
        self.consumed.add(k)
        return v

    def get(self, k, default=None):
        if super().__contains__(k):
            return self[k]
        return default


def _families():
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from convert_manifest_defs import families

    return families()


def _check(name):
    fams = _families()
    cfg, make_sd, convert = fams[name]
    sd = make_sd(cfg)
    fixture_path = os.path.join(FIXDIR, f"{name}.txt")
    assert os.path.exists(fixture_path), \
        f"missing fixture — run tools/gen_converter_manifests.py ({name})"
    with open(fixture_path) as f:
        fixture = [l for l in f.read().splitlines() if l]
    assert sorted(sd) == fixture, (
        f"{name}: manifest drifted from fixture "
        f"(+{sorted(set(sd) - set(fixture))[:5]} "
        f"-{sorted(set(fixture) - set(sd))[:5]}) — regenerate via "
        "tools/gen_converter_manifests.py and review the diff")
    tracked = TrackingDict(sd)
    convert(tracked, cfg)
    unconsumed = sorted(set(sd) - tracked.consumed
                        - KNOWN_UNCONSUMED.get(name, set()))
    assert not unconsumed, (
        f"{name}: converter silently ignores {len(unconsumed)} source "
        f"tensors, e.g. {unconsumed[:8]}")


@pytest.mark.parametrize("name", FAST)
def test_manifest_fast(name):
    _check(name)


@pytest.mark.slow
@pytest.mark.parametrize("name", SLOW)
def test_manifest_slow(name):
    _check(name)


def test_every_family_has_a_tier():
    assert set(FAST) | set(SLOW) == set(_families())
