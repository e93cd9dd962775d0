"""SpiderDecoder inference entry — same contract as the reference's
/root/reference/spider_decoder_infer.py:133-142 smoke path: feed tagged LLM
text straight into the Decoders-Controller."""

from __future__ import annotations

import os

from spider_tpu.common.config import Config
from spider_tpu.models import spider_decoder  # noqa: F401 (registers model)
from spider_tpu.models.spider_decoder import SpiderDecoderInfer

# Generation kwargs the diffusion pipelines accept beyond the operating
# point each fn pins explicitly — config decode_options ride through here
# (negative_prompt / eta / seed via rng are per-modality parity knobs,
# cf. custom_sd.py:229-231 negative_prompt and eta in the reference).
_PASSTHROUGH = ("negative_prompt", "eta", "rng")


def _gen_kwargs(kw, drop=()):
    return {k: v for k, v in kw.items()
            if k in _PASSTHROUGH and k not in drop}


def build_default_decoders(tiny: bool = True, with_grounding: bool = True,
                           weight_paths=None):
    """Resident decoder callables for every modality the reference's
    Decoders-Controller routes (spider_decoder.py:100-276): IMAGE/VIDEO/
    AUDIO diffusion, BOX (Grounding DINO), MASK (DINO top-1 box -> SAM).

    tiny=True: random-init smoke-scale pipelines with clamped operating
    points (CPU-runnable). tiny=False: full-size architectures at the
    production operating points; `weight_paths` maps kind -> checkpoint
    path ({'sd15': ..., 'zeroscope': ..., 'audioldm': ..., 'sam': ...,
    'grounding_dino': ...}) and is fed through models/convert.py via
    factory.from_pretrained — omitted kinds stay random-init (shape-true).
    """
    import numpy as np

    weight_paths = dict(weight_paths or {})

    if tiny:
        from spider_tpu.models.pipelines.ad import build_tiny_ad
        from spider_tpu.models.pipelines.sd import build_tiny_sd
        from spider_tpu.models.pipelines.vd import build_tiny_vd

        sd = build_tiny_sd()
        vd = build_tiny_vd()
        ad = build_tiny_ad()

        # The tiny random-init pipelines are smoke-scale: clamp the
        # controller's production operating points (320x576x16f / 40 steps /
        # 5s) to sizes the tiny VAE (2x downsample) can afford.
        def image_fn(prompts, num_inference_steps=40, **kw):
            return sd(prompt=prompts,
                      num_inference_steps=min(num_inference_steps, 8),
                      **_gen_kwargs(kw))

        def video_fn(prompts, num_inference_steps=40, **kw):
            return vd(prompt=prompts,
                      num_inference_steps=min(num_inference_steps, 8),
                      height=32, width=32, num_frames=4, **_gen_kwargs(kw))

        def audio_fn(prompts, num_inference_steps=40, audio_length_in_s=5.0,
                     **kw):
            return ad(prompt=prompts,
                      num_inference_steps=min(num_inference_steps, 8),
                      audio_length_in_s=min(audio_length_in_s, 1.0),
                      **_gen_kwargs(kw))
    else:
        from spider_tpu.models.factory import from_pretrained

        sd = from_pretrained("sd15", weight_paths.get("sd15"))
        vd = from_pretrained("zeroscope", weight_paths.get("zeroscope"))
        ad = from_pretrained("audioldm", weight_paths.get("audioldm"))

        def image_fn(prompts, num_inference_steps=40, **kw):
            return sd(prompt=prompts, num_inference_steps=num_inference_steps,
                      guidance_scale=kw.get("guidance_scale", 7.5),
                      **_gen_kwargs(kw, drop=("guidance_scale",)))

        def video_fn(prompts, num_inference_steps=40, **kw):
            return vd(prompt=prompts, num_inference_steps=num_inference_steps,
                      height=kw.get("height", 320), width=kw.get("width", 576),
                      num_frames=kw.get("num_frames", 16),
                      **_gen_kwargs(kw, drop=("height", "width",
                                              "num_frames")))

        def audio_fn(prompts, num_inference_steps=40, audio_length_in_s=5.0,
                     **kw):
            return ad(prompt=prompts, num_inference_steps=num_inference_steps,
                      audio_length_in_s=audio_length_in_s,
                      **_gen_kwargs(kw))

    decoders = {"IMAGE": image_fn, "VIDEO": video_fn, "AUDIO": audio_fn}

    if with_grounding:
        # BOX: Grounding DINO; MASK: box-prompted SAM (chained by the
        # controller: DINO top-1 box seeds SAM, spider_decoder.py:168-229).
        import dataclasses as dc

        import jax
        import jax.numpy as jnp

        if tiny:
            from spider_tpu.models.dino import (GroundingDINO,
                                                GroundingDINOInference,
                                                grounding_dino_test)
            from spider_tpu.models.sam import Sam, sam_tiny
            from spider_tpu.models.tokenizer import TinyTokenizer

            rng = jax.random.PRNGKey(0)
            dcfg = grounding_dino_test()
            dino_m = GroundingDINO(dcfg)
            dparams = dino_m.init(rng, jnp.zeros((1, 3, 64, 64)),
                                  jnp.zeros((1, dcfg.max_text_len), jnp.int32),
                                  jnp.ones((1, dcfg.max_text_len), jnp.int32))
            dino = GroundingDINOInference(dino_m, dparams, TinyTokenizer(),
                                          image_size=64)
            scfg = sam_tiny()
            sam_m = Sam(scfg)
            sparams = sam_m.init(rng, jnp.zeros((1, 3, scfg.img_size,
                                                 scfg.img_size)),
                                 boxes=jnp.zeros((1, 1, 4)))
            sam = (sam_m, sparams)
        else:
            from spider_tpu.models.factory import from_pretrained

            dino = from_pretrained("grounding_dino",
                                   weight_paths.get("grounding_dino"))
            sam = from_pretrained("sam", weight_paths.get("sam"))

        sam_m, sparams = sam
        sam_size = sam_m.config.img_size

        def box_fn(image, caption):
            return dino(image, caption)

        def mask_fn(image_sam, box, meta_info=None):
            img = np.asarray(image_sam, np.float32)
            if img.ndim == 3:
                img = img[None]
            if img.shape[-1] == 3 and img.shape[1] != 3:  # HWC -> CHW
                img = img.transpose(0, 3, 1, 2)
            masks = sam_m.apply(sparams, jnp.asarray(img),
                                jnp.asarray(box, jnp.float32).reshape(1, 1, 4),
                                method=sam_m.predict_box)
            return np.asarray(masks[0])

        decoders["BOX"] = box_fn
        decoders["MASK"] = mask_fn

    return decoders


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
