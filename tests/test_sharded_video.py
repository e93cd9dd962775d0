"""Mesh-sharded video denoise (cfg x sp) vs the single-device scan.

The v5e-8 video configuration (docs/video_speed_of_light.md): the CFG pair
over a 2-way `cfg` axis and the 16 frames over a 4-way `sp` axis. Must be
numerically the same program — GSPMD only inserts collectives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from spider_tpu.models.pipelines.vd import build_tiny_vd


@pytest.fixture(scope="module")
def mesh():
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devs, ("cfg", "sp"))


@pytest.fixture(scope="module")
def pipe():
    return build_tiny_vd()


@pytest.mark.slow  # 29s; end-to-end sharded call stays fast
def test_sharded_denoise_matches_single_device(pipe, mesh):
    lat_shape = (1, 8, 8, 8, 4)   # F=8 divides sp=4
    latents = jax.random.normal(jax.random.PRNGKey(7), lat_shape,
                                jnp.float32)
    cond = pipe.encode_prompt(["a cat runs on the beach"]).astype(jnp.float32)
    uncond = pipe.encode_prompt([""]).astype(jnp.float32)

    ref = pipe._denoise_fn(6, 7.5, lat_shape)(
        pipe.unet_params, latents, cond, uncond, jax.random.PRNGKey(0))
    out = pipe._denoise_fn_sharded(6, 7.5, lat_shape, mesh)(
        pipe.unet_params, latents, cond, uncond)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow  # 25s; __graft_entry__.dryrun_multichip runs this path
def test_sharded_call_end_to_end(pipe, mesh):
    frames = pipe(prompt=["a dog"], num_inference_steps=2, height=16,
                  width=16, num_frames=8, mesh=mesh)
    assert frames.shape[:2] == (1, 8) and frames.dtype == np.uint8
