"""SpiderDecoder inference entry — same contract as the reference's
/root/reference/spider_decoder_infer.py:133-142 smoke path: feed tagged LLM
text straight into the Decoders-Controller."""

from __future__ import annotations

import os

from spider_tpu.common.config import Config
from spider_tpu.models import spider_decoder  # noqa: F401 (registers model)
from spider_tpu.models.spider_decoder import SpiderDecoderInfer


def build_default_decoders(tiny: bool = True):
    """Resident decoder callables. tiny=True builds random-init pipelines
    (offline smoke); real weights come through spider_tpu.models.convert."""
    from spider_tpu.models.pipelines.ad import build_tiny_ad
    from spider_tpu.models.pipelines.sd import build_tiny_sd
    from spider_tpu.models.pipelines.vd import build_tiny_vd

    sd = build_tiny_sd()
    vd = build_tiny_vd()
    ad = build_tiny_ad()

    # The tiny random-init pipelines are smoke-scale: clamp the controller's
    # production operating points (320x576x16f / 40 steps / 5s) to sizes the
    # tiny VAE (2x downsample) can afford.
    def image_fn(prompts, num_inference_steps=40, **kw):
        return sd(prompt=prompts,
                  num_inference_steps=min(num_inference_steps, 8))

    def video_fn(prompts, num_inference_steps=40, **kw):
        return vd(prompt=prompts,
                  num_inference_steps=min(num_inference_steps, 8),
                  height=32, width=32, num_frames=4)

    def audio_fn(prompts, num_inference_steps=40, audio_length_in_s=5.0, **kw):
        return ad(prompt=prompts,
                  num_inference_steps=min(num_inference_steps, 8),
                  audio_length_in_s=min(audio_length_in_s, 1.0))

    return {"IMAGE": image_fn, "VIDEO": video_fn, "AUDIO": audio_fn}


def main():
    cfg = Config.fromfile(os.path.join(os.path.dirname(__file__),
                                       "train_configs", "spider_decoder_cfg.py"))
    infer = SpiderDecoderInfer(cfg, decoders=build_default_decoders())
    ask_info = {"llm_text_all":
                ["<IMAGE>apple</IMAGE><VIDEO>dog</VIDEO><AUDIO>cat</AUDIO>"]}
    answers, predictions, predictions_text = infer(ask_info)
    print("answers:", answers)
    print("predictions_text:", predictions_text)
    print("IMAGE:", len(predictions["IMAGE"]), "VIDEO:",
          len(predictions["VIDEO"]), "AUDIO:", len(predictions["AUDIO"]))


if __name__ == "__main__":
    main()
