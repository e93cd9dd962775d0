"""One-command real-checkpoint converter verification (VERDICT r2 item 8).

In an environment where the real checkpoints are mounted, verify every
converter against its recorded key manifest and actually run it:

    python tools/verify_checkpoints.py \
        --llama3_8b /ckpts/Llama-3.1-8B/model.safetensors \
        --sam_vit_h /ckpts/sam_vit_h_4b8939.pth \
        --unet_sd15 /ckpts/sd15/unet/diffusion_pytorch_model.bin ...

Per family it reports:
  * missing:   manifest keys absent from the real state dict (a converter
               KeyError waiting to happen — fail)
  * extra:     real keys not in the manifest (buffers like position_ids
               are expected; real tensors here mean silently dropped
               weights — review)
  * convert:   whether the converter ran to completion on the real dict

Exit code is non-zero if any family has missing keys or a convert error.
"""

import argparse
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tests"))
sys.path.insert(0, ROOT)

# Harmless non-weight buffers commonly present in HF/torch checkpoints.
KNOWN_EXTRA_SUFFIXES = (
    "position_ids", "num_batches_tracked", "attn.masked_bias",
    "rotary_emb.inv_freq",
)

# Qwen2.5-Omni families live inside ONE combined checkpoint; point each
# family flag at the same file/dir and the sub-dict is selected by prefix
# (manifest fixtures record the bare-module keys, prefix stripped).
OMNI_PREFIXES = {
    "omni_audio_tower": ("thinker.audio_tower.", "audio_tower."),
    "omni_vision_tower": ("thinker.visual.", "visual."),
    "omni_talker": ("talker.",),
    "omni_dit": ("token2wav.code2wav_dit_model.",),
    "omni_bigvgan": ("token2wav.code2wav_bigvgan_model.",),
}

# Families whose real config differs from the manifest config only in
# widths — the converter must be driven with the REAL config at load time;
# here we only need it for the convert smoke, so map family -> full cfg.
def full_config(name):
    import dataclasses as dc

    from spider_tpu.models import llama as L
    from spider_tpu.models.bert import bert_base
    from spider_tpu.models.clip_text import (ClapTextConfig, clip_vit_h14,
                                             clip_vit_l14, open_clip_bigg)
    from spider_tpu.models.dino import GroundingDINOConfig
    from spider_tpu.models.imagebind import imagebind_huge
    from spider_tpu.models.sam import sam_vit_h
    from spider_tpu.models.swin import swin_tiny
    from spider_tpu.models.unet2d import (unet_audioldm, unet_sd15,
                                          unet_sdxl)
    from spider_tpu.models.unet3d import unet3d_zeroscope
    from spider_tpu.models.vae import vae_audioldm, vae_sd
    from spider_tpu.models.vocoder import hifigan_audioldm

    return {
        "llama3_8b": L.llama3_8b(),
        "clip_vit_l14": clip_vit_l14(),
        "clip_vit_h14": clip_vit_h14(),
        "clip_bigg": open_clip_bigg(),
        "bert_base": bert_base(),
        "vae_sd": vae_sd(),
        "vae_audioldm": vae_audioldm(),
        "unet_sd15": unet_sd15(),
        "unet_sdxl": unet_sdxl(),
        "unet_audioldm": unet_audioldm(),
        "unet3d_zeroscope": unet3d_zeroscope(),
        "sam_vit_h": sam_vit_h(),
        "imagebind_huge": imagebind_huge(),
        "swin_t": swin_tiny(),
        "hifigan_audioldm": hifigan_audioldm(),
        "clap_text": ClapTextConfig(),
        "grounding_dino_swin_t": GroundingDINOConfig(),
        "photomaker_v1": __import__(
            "spider_tpu.models.photomaker",
            fromlist=["photomaker_v1"]).photomaker_v1(),
        "omni_audio_tower": _omni("qwen_omni", "OmniAudioConfig")(),
        "omni_vision_tower": _omni("qwen_omni", "OmniVisionConfig")(),
        "omni_talker": _omni("omni_talker", "OmniTalkerConfig")(),
        "omni_dit": _omni("omni_token2wav", "dit_full")(),
        "omni_bigvgan": _omni("omni_token2wav", "bigvgan_full")(),
    }[name]


def _omni(module, symbol):
    return getattr(__import__(f"spider_tpu.models.{module}",
                              fromlist=[symbol]), symbol)


def verify_family(name, ckpt_path):
    from convert_manifest_defs import families

    from spider_tpu.models.convert import load_torch_state_dict

    fixture = os.path.join(ROOT, "tests", "fixtures", "convert_keys",
                           f"{name}.txt")
    with open(fixture) as f:
        manifest = set(l for l in f.read().splitlines() if l)
    sd = load_torch_state_dict(ckpt_path)
    for pfx in OMNI_PREFIXES.get(name, ()):
        if any(k.startswith(pfx) for k in sd):
            # combined Omni checkpoint: select this family's sub-dict
            sd = {k[len(pfx):]: v for k, v in sd.items()
                  if k.startswith(pfx)}
            break
    if name == "photomaker_v1" and "id_encoder" in sd:
        # photomaker-v1.bin nests {"id_encoder": ..., "lora_weights": ...};
        # the manifest covers the id_encoder sub-dict (the UNet LoRA is
        # applied separately)
        sd = dict(sd["id_encoder"])
    real = set(sd)
    missing = sorted(manifest - real)
    extra = sorted(k for k in real - manifest
                   if not k.endswith(KNOWN_EXTRA_SUFFIXES))
    report = {"family": name, "n_manifest": len(manifest),
              "n_real": len(real), "missing": missing, "extra": extra}
    _, _, convert = families()[name]
    try:
        convert(sd, full_config(name))
        report["convert_ok"] = True
    except Exception as exc:                      # report, don't crash
        report["convert_ok"] = False
        report["convert_error"] = f"{type(exc).__name__}: {exc}"
    return report


def main():
    from convert_manifest_defs import families

    parser = argparse.ArgumentParser()
    for name in families():
        parser.add_argument(f"--{name}", metavar="CKPT", default=None)
    args = vars(parser.parse_args())

    any_requested = False
    failed = False
    for name, path in args.items():
        if path is None:
            continue
        any_requested = True
        rep = verify_family(name, path)
        ok = rep["convert_ok"] and not rep["missing"]
        failed |= not ok
        print(f"[{'OK' if ok else 'FAIL'}] {name}: "
              f"{rep['n_real']} real / {rep['n_manifest']} manifest keys; "
              f"missing={len(rep['missing'])} extra={len(rep['extra'])} "
              f"convert_ok={rep['convert_ok']}")
        for k in rep["missing"][:10]:
            print(f"    missing: {k}")
        for k in rep["extra"][:10]:
            print(f"    extra:   {k}")
        if not rep["convert_ok"]:
            print(f"    error: {rep.get('convert_error')}")
    if not any_requested:
        print(__doc__)
        print("families:", ", ".join(sorted(families())))
        return
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
