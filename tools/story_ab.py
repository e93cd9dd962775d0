"""A/B the story coupled-attention implementation at the full operating
point (SDXL 768px, 4 coupled frames, CFG): split+LSE-merge vs concat-bank,
plus the uncoupled lower bound. Measures steps/s of the denoise."""
import dataclasses, time
import numpy as np
import jax, jax.numpy as jnp

from spider_tpu.models.clip_text import CLIPTextModel, clip_vit_l14, open_clip_bigg
from spider_tpu.models.pipelines.sdxl_story import StoryXLPipeline, story_generation
from spider_tpu.models.tokenizer import TinyTokenizer
from spider_tpu.models.unet2d import UNet2DConditionModel, unet_sdxl
from spider_tpu.models import unet2d as u2
from spider_tpu.models.vae import AutoencoderKL, vae_sdxl
from spider_tpu.models.factory import random_params_like

rng = jax.random.PRNGKey(0)
tok = TinyTokenizer()
t1 = dataclasses.replace(clip_vit_l14(), dtype=jnp.bfloat16)
t2 = dataclasses.replace(open_clip_bigg(), dtype=jnp.bfloat16)
enc1, enc2 = CLIPTextModel(t1), CLIPTextModel(t2)
ucfg = dataclasses.replace(unet_sdxl(), dtype=jnp.bfloat16)
unet = UNet2DConditionModel(ucfg)
vae = AutoencoderKL(dataclasses.replace(vae_sdxl(), dtype=jnp.bfloat16))

cpu = jax.devices("cpu")[0]
tpu = jax.devices()[0]

def to_dev_bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            np.asarray(x, np.float32).astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else np.asarray(x), tpu), tree)

with jax.default_device(cpu):
    p1 = random_params_like(enc1, rng, jnp.zeros((1, 77), jnp.int32))
    p2 = random_params_like(enc2, rng, jnp.zeros((1, 77), jnp.int32))
    up = random_params_like(
        unet, rng, jnp.zeros((1, 8, 8, 4), jnp.bfloat16),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 2048), jnp.bfloat16),
        dict(text_embeds=jnp.zeros((1, 1280), jnp.bfloat16),
             time_ids=jnp.zeros((1, 6), jnp.float32)))
    vp = random_params_like(vae, rng, jnp.zeros((1, 64, 64, 3)))
p1, p2, up, vp = map(to_dev_bf16, (p1, p2, up, vp))
pipe = StoryXLPipeline(tok, tok, enc1, p1, enc2, p2, unet, up, vae, vp,
                       height=768, width=768)
prompts = ["in a forest", "by a river", "at night", "coming home"]

def run(n_steps, seed=1):
    t0 = time.perf_counter()
    imgs = story_generation(pipe, general_prompt="a fox explorer",
                            prompt_array=prompts, style_name="Comic book",
                            id_length=4, num_inference_steps=n_steps,
                            seed=seed)
    return time.perf_counter() - t0, np.stack(imgs)

N = 30
outs = {}
import sys
variants = sys.argv[1:] or ["split", "split_fullk", "concat"]
for name in variants:
    with u2.story_bank_config(
            impl="split" if name.startswith("split") else name,
            flash="fullk" if name.endswith("fullk") else "auto"):
        pipe._denoise_cache.clear()
        t_compile, _ = run(N)               # compile + first run
        dt, outs[name] = run(N)
    print(f"{name}: {N/dt:.2f} steps/s  ({dt:.1f}s for {N} steps; "
          f"first-call {t_compile:.0f}s)", flush=True)
    if "split" in outs and name != "split":
        d = float(np.abs(outs[name].astype(np.float32)
                         - outs["split"].astype(np.float32)).max())
        print(f"  max|{name} - split| = {d:.3e}", flush=True)
