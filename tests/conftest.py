"""Test configuration: force an 8-device CPU platform so multi-chip sharding
logic is exercised without TPU hardware (the JAX-native analogue of testing
multi-node on one host; see SURVEY.md §4)."""

import os

if not os.environ.get("SPIDER_TPU_TEST_ON_DEVICE"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
