"""Test configuration: force an 8-device CPU platform so multi-chip sharding
logic is exercised without TPU hardware (the JAX-native analogue of testing
multi-node on one host; see SURVEY.md §4).

Note: the environment pre-imports jax with a TPU platform plugin registered, so
plain JAX_PLATFORMS env vars are too late — we switch platform via jax.config
before any backend is initialized.
"""

import os

import jax

if not os.environ.get("SPIDER_TPU_TEST_ON_DEVICE"):
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:  # older jax: fall back to XLA flag
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()

jax.config.update("jax_threefry_partitionable", True)
