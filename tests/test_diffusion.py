import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spider_tpu.models import schedulers as S
from spider_tpu.models.clip_text import (CLIPTextModel, ClapTextModel,
                                         clap_tiny, clip_tiny)
from spider_tpu.models.pipelines.sd import build_tiny_sd
from spider_tpu.models.unet2d import UNet2DConditionModel, unet_tiny
from spider_tpu.models.vae import AutoencoderKL, vae_tiny


def test_ddim_scheduler_denoises_toward_x0():
    sched = S.DDIMScheduler()
    acp = sched.alphas_cumprod
    assert acp.shape == (1000,)
    assert float(acp[0]) > float(acp[-1])
    ts = sched.timesteps(40)
    assert ts.shape == (40,)
    assert int(ts[0]) > int(ts[-1])
    # For prediction_type epsilon and a known x0/noise pair, stepping from t
    # with the true eps moves the sample toward x0's scaled version.
    x0 = jnp.ones((1, 4, 4, 4))
    noise = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    t = jnp.int32(981)
    xt = sched.add_noise(x0, noise, t[None])[0]
    prev = sched.step(noise, t, xt, 40)
    # closer to x0 in expectation
    assert float(jnp.mean((prev - x0) ** 2)) < float(jnp.mean((xt - x0) ** 2))


def test_ddim_eta_stochastic_step():
    """eta>0 matches the diffusers stochastic-DDIM update; eta=0 unchanged."""
    sched = S.DDIMScheduler()
    acp = sched.alphas_cumprod
    x0 = jnp.ones((1, 4, 4, 4))
    eps = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    t = jnp.int32(981)
    xt = sched.add_noise(x0, eps, t[None])[0]
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)

    det = sched.step(eps, t, xt, 40)
    stoch = sched.step(eps, t, xt, 40, eta=1.0, noise=noise)
    # hand-computed reference for the eta term
    prev_t = t - 1000 // 40
    a_t, a_prev = acp[t], acp[prev_t]
    var = (1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev)
    sigma = jnp.sqrt(var)
    pred_x0 = (xt - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
    expect = (jnp.sqrt(a_prev) * pred_x0
              + jnp.sqrt(1 - a_prev - sigma ** 2) * eps + sigma * noise)
    np.testing.assert_allclose(np.asarray(stoch), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)
    assert float(jnp.max(jnp.abs(stoch - det))) > 1e-4  # actually stochastic
    # eta plumbs through the pipeline without changing shapes
    pipe = build_tiny_sd()
    img = pipe(prompt=["an apple"], num_inference_steps=2, eta=0.5)
    assert img.shape[-1] == 3


def test_euler_scheduler_shapes():
    sched = S.EulerDiscreteScheduler()
    sigmas, ts = sched.sigmas_and_timesteps(50)
    assert sigmas.shape == (51,)
    assert ts.shape == (50,)
    assert float(sigmas[-1]) == 0.0
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4))
    out = sched.step(jnp.zeros_like(x), sigmas[0], sigmas[1], x)
    assert out.shape == x.shape


def test_timestep_embedding():
    emb = S.timestep_embedding(jnp.array([0, 10, 999]), 320)
    assert emb.shape == (3, 320)
    assert np.isfinite(np.asarray(emb)).all()


def test_clip_text_model_shapes_and_pooled():
    cfg = clip_tiny()
    model = CLIPTextModel(cfg)
    ids = jnp.array([[5, 6, 7, 2, 0, 0]])  # eos id 2 at position 3
    params = model.init(jax.random.PRNGKey(0), ids)
    last, hiddens, pooled = model.apply(params, ids)
    assert last.shape == (1, 6, cfg.hidden_size)
    assert hiddens.shape == (cfg.num_hidden_layers + 1, 1, 6, cfg.hidden_size)
    assert pooled.shape == (1, cfg.projection_dim)


def test_clap_text_model():
    cfg = clap_tiny()
    model = ClapTextModel(cfg)
    ids = jnp.array([[1, 5, 6, 2]])
    params = model.init(jax.random.PRNGKey(0), ids)
    seq, pooled = model.apply(params, ids)
    assert seq.shape == (1, 4, cfg.hidden_size)
    assert pooled.shape == (1, cfg.projection_dim)


def test_vae_roundtrip_shapes():
    cfg = vae_tiny()
    vae = AutoencoderKL(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3))
    params = vae.init(jax.random.PRNGKey(1), x)
    z = vae.apply(params, x, method=vae.encode)
    assert z.shape == (1, 8, 8, cfg.latent_channels)
    rec = vae.apply(params, z, method=vae.decode)
    assert rec.shape == x.shape


@pytest.mark.slow  # 30s (3 jit variants); sdxl_added_cond keeps UNet2D
def test_unet_shapes_and_story_kv():  # coverage; bank merge: test_story.py
    cfg = unet_tiny()
    unet = UNet2DConditionModel(cfg)
    x = jnp.zeros((2, 8, 8, 4))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 7, cfg.cross_attention_dim))
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)
    out = unet.apply(params, x, t, ctx)
    assert out.shape == x.shape
    # story collection capture
    out2, inter = unet.apply(params, x, t, ctx, mutable=["story"])
    paths = jax.tree_util.tree_leaves_with_path(inter["story"])
    assert len(paths) > 0
    # extra KV side input changes self-attention result
    kv = {"up_0_attn_0": jnp.ones((2, 3, cfg.block_out_channels[-1]))}
    out3 = unet.apply(params, x, t, ctx, story_kv=kv)
    assert not np.allclose(np.asarray(out), np.asarray(out3))


def test_sdxl_added_cond():
    from spider_tpu.models.unet2d import unet_tiny
    cfg = unet_tiny(addition_embed_type="text_time", projection_dim=8 * 6 + 16)
    unet = UNet2DConditionModel(cfg)
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 7, cfg.cross_attention_dim))
    added = dict(text_embeds=jnp.zeros((1, 16)),
                 time_ids=jnp.zeros((1, 6), jnp.int32))
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx, added)
    out = unet.apply(params, x, t, ctx, added)
    assert out.shape == x.shape


@pytest.mark.slow
def test_tiny_sd_pipeline_end_to_end():
    pipe = build_tiny_sd()
    embeds = pipe(prompt=["an apple"], return_prompts_only=True)
    assert embeds.shape == (1, 77, pipe.text_encoder.config.hidden_size)
    images = pipe(prompt=["an apple"], num_inference_steps=3)
    assert images.shape == (1, 16, 16, 3)
    assert images.min() >= 0.0 and images.max() <= 1.0
    # prompt_embeds path (the Spider decode_image fusion input)
    images2 = pipe(prompt_embeds=embeds, num_inference_steps=3)
    np.testing.assert_allclose(images, images2, atol=1e-5)
