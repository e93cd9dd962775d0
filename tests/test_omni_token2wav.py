"""Qwen2.5-Omni token2wav (models/omni_token2wav.py): codec tokens -> mel
(DiT flow matching) -> waveform (BigVGAN). Numeric parity against the local
transformers Qwen2_5OmniToken2Wav{DiT,BigVGAN}Model + sampling smoke."""

import numpy as np
import pytest

from spider_tpu.models.omni_token2wav import (BigVGAN, DiTModel,
                                              OmniToken2Wav, bigvgan_tiny,
                                              build_tiny_token2wav, dit_tiny)


def _torch():
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    return torch


def _hf_dit_cfg():
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import \
        Qwen2_5OmniDiTConfig

    cfg = Qwen2_5OmniDiTConfig(
        mel_dim=8, num_embeds=16, emb_dim=12, hidden_size=32,
        num_hidden_layers=3, num_attention_heads=2, head_dim=16, ff_mult=2,
        block_size=4, look_ahead_layers=[1], look_backward_layers=[0, 2],
        repeats=2, enc_dim=12, enc_emb_dim=6, enc_channels=[8, 8, 8, 8, 24],
        enc_kernel_sizes=[5, 3, 3, 3, 1], enc_dilations=[1, 2, 3, 4, 1],
        enc_attention_channels=4, enc_res2net_scale=2, enc_se_channels=4,
        dropout=0.0)
    cfg._attn_implementation = "sdpa"
    return cfg


def test_dit_forward_matches_transformers():
    """Converted DiT (ECAPA + AdaLN-zero blocks + block-local attention +
    first-head rope) vs HF Qwen2_5OmniToken2WavDiTModel, CFG batch."""
    torch = _torch()
    import jax.numpy as jnp
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import \
        Qwen2_5OmniToken2WavDiTModel

    from spider_tpu.models.convert import convert_omni_dit

    hcfg = _hf_dit_cfg()
    tm = Qwen2_5OmniToken2WavDiTModel(hcfg).eval()

    rng = np.random.RandomState(0)
    N, T = 5, 10                       # codes, mel frames (= N * repeats)
    x = rng.randn(1, T, 8).astype(np.float32)
    spk = rng.randn(1, T, 6).astype(np.float32)
    ref = rng.randn(1, 7, 8).astype(np.float32)
    code = rng.randint(0, 16, (1, N))
    with torch.no_grad():
        out = tm(hidden_states=torch.tensor(x),
                 condition_vector=torch.tensor(ref),
                 speaker_embedding=torch.tensor(spk),
                 quantized_code=torch.tensor(code),
                 time_step=torch.tensor([0.3]), apply_cfg=True).numpy()

    cfg = dit_tiny()
    params = convert_omni_dit(
        {k: v.numpy() for k, v in tm.state_dict().items()}, cfg, prefix="")
    got = DiTModel(cfg).apply(params, jnp.asarray(x), jnp.asarray(spk),
                              jnp.asarray(ref), jnp.asarray(code),
                              jnp.asarray([0.3]), apply_cfg=True)
    assert got.shape == out.shape == (2, T, 8)
    np.testing.assert_allclose(np.asarray(got), out, atol=5e-5)


def test_dit_forward_uncond_matches_transformers():
    """drop_audio_conditioning single-batch path (no CFG doubling)."""
    torch = _torch()
    import jax.numpy as jnp
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import \
        Qwen2_5OmniToken2WavDiTModel

    from spider_tpu.models.convert import convert_omni_dit

    tm = Qwen2_5OmniToken2WavDiTModel(_hf_dit_cfg()).eval()
    rng = np.random.RandomState(1)
    x = rng.randn(1, 8, 8).astype(np.float32)
    spk = rng.randn(1, 8, 6).astype(np.float32)
    ref = rng.randn(1, 5, 8).astype(np.float32)
    code = rng.randint(0, 16, (1, 4))
    with torch.no_grad():
        out = tm(hidden_states=torch.tensor(x),
                 condition_vector=torch.tensor(ref),
                 speaker_embedding=torch.tensor(spk),
                 quantized_code=torch.tensor(code),
                 time_step=torch.tensor([0.7]), apply_cfg=False,
                 drop_audio_conditioning=True).numpy()
    cfg = dit_tiny()
    params = convert_omni_dit(
        {k: v.numpy() for k, v in tm.state_dict().items()}, cfg, prefix="")
    got = DiTModel(cfg).apply(params, jnp.asarray(x), jnp.asarray(spk),
                              jnp.asarray(ref), jnp.asarray(code),
                              jnp.asarray([0.7]), apply_cfg=False,
                              drop_audio_cond=True)
    np.testing.assert_allclose(np.asarray(got), out, atol=5e-5)


def test_bigvgan_matches_transformers():
    """Converted BigVGAN (anti-aliased SnakeBeta, AMP blocks, transposed
    upsampling, mel dB normalization) vs HF Qwen2_5OmniToken2WavBigVGANModel."""
    torch = _torch()
    import jax.numpy as jnp
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import \
        Qwen2_5OmniBigVGANConfig
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import \
        Qwen2_5OmniToken2WavBigVGANModel

    from spider_tpu.models.convert import convert_omni_bigvgan

    hcfg = Qwen2_5OmniBigVGANConfig(
        mel_dim=8, upsample_initial_channel=16, resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3, 5]], upsample_rates=[2, 2],
        upsample_kernel_sizes=[4, 4])
    hcfg._attn_implementation = "sdpa"
    tm = Qwen2_5OmniToken2WavBigVGANModel(hcfg).eval()

    rng = np.random.RandomState(2)
    mel = rng.randn(1, 12, 8).astype(np.float32)     # [B, T, mel] (ours)
    with torch.no_grad():
        ref = tm(torch.tensor(mel.transpose(0, 2, 1))).numpy()

    cfg = bigvgan_tiny()
    params = convert_omni_bigvgan(
        {k: v.numpy() for k, v in tm.state_dict().items()}, cfg, prefix="")
    got = np.asarray(BigVGAN(cfg).apply(params, jnp.asarray(mel)))[0]
    assert got.shape == ref.shape == (12 * 4,)
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_token2wav_sample_smoke():
    """Tiny random-init bundle: RK4 flow sample + vocode; length contract
    wave = codes * repeats * prod(upsample_rates)."""
    import jax

    t2w = build_tiny_token2wav()
    code = np.array([[1, 2, 3, 4, 5, 6]])
    cond = np.zeros((1, 6), np.float32)
    ref = np.zeros((1, 5, 8), np.float32)
    wav = t2w(code, cond, ref, num_steps=3, rng=jax.random.PRNGKey(3))
    assert wav.shape == (6 * 2 * 4,)
    assert np.all(np.isfinite(wav)) and np.all(np.abs(wav) <= 1.0)
