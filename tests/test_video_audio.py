import pytest
import jax
import jax.numpy as jnp
import numpy as np

from spider_tpu.models.pipelines.ad import build_tiny_ad
from spider_tpu.models.pipelines.vd import build_tiny_vd
from spider_tpu.models.unet3d import UNet3DConditionModel, unet3d_tiny
from spider_tpu.models.vocoder import HifiGan, hifigan_tiny


@pytest.mark.slow
def test_unet3d_shapes():
    cfg = unet3d_tiny()
    unet = UNet3DConditionModel(cfg)
    x = jnp.zeros((1, 3, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 7, cfg.cross_attention_dim))
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)
    out = unet.apply(params, x, t, ctx)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_hifigan_upsamples():
    cfg = hifigan_tiny()
    voc = HifiGan(cfg)
    mel = jax.random.normal(jax.random.PRNGKey(0), (1, 10, cfg.model_in_dim))
    params = voc.init(jax.random.PRNGKey(1), mel)
    wave = voc.apply(params, mel)
    assert wave.shape == (1, 40)  # 10 * 2 * 2
    assert np.abs(np.asarray(wave)).max() <= 1.0


@pytest.mark.slow
def test_tiny_vd_pipeline():
    pipe = build_tiny_vd()
    embeds = pipe(prompt=["a dog"], return_prompts_only=True)
    assert embeds.shape == (1, 77, pipe.text_encoder.config.hidden_size)
    frames = pipe(prompt=["a dog"], num_inference_steps=2, height=16, width=16,
                  num_frames=2)
    assert frames.shape == (1, 2, 16, 16, 3)
    # frames are uint8 (device-side quantization keeps the host transfer
    # 4x smaller — part of request latency)
    assert frames.dtype == np.uint8


@pytest.mark.slow
def test_tiny_ad_pipeline():
    pipe = build_tiny_ad()
    embeds = pipe(prompt=["a cat"], return_prompts_only=True)
    assert embeds.shape == (1, pipe.text_encoder.config.projection_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(embeds), axis=-1), 1.0,
                               rtol=1e-5)
    audio = pipe(prompt=["a cat"], num_inference_steps=2, audio_length_in_s=0.1)
    assert audio.ndim == 2 and audio.shape[0] == 1
    assert audio.shape[1] > 0


def test_shift_conv_matches_nn_conv():
    """_ShiftConvF (shift + matmul) is numerically identical to the
    nn.Conv((3,1)) formulation it replaced, on the same param tree."""
    import flax.linen as nn

    from spider_tpu.models.unet3d import _ShiftConvF

    B, F, P, C = 2, 5, 12, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (B, F, P, C))
    mod = _ShiftConvF(C, jnp.float32)
    params = mod.init(jax.random.PRNGKey(1), x)
    got = mod.apply(params, x)
    ref_mod = nn.Conv(C, (3, 1), padding=((1, 1), (0, 0)),
                      dtype=jnp.float32)
    want = ref_mod.apply(params, x)   # same kernel/bias names and shapes
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
