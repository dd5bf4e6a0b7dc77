"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(``--xla_force_host_platform_device_count=8``) so they work without TPU
hardware; the same mesh code runs unchanged on a real v5e-8 slice.
Must run before the first ``import jax`` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"  # the axon TPU plugin ignores JAX_PLATFORMS
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
# Keep XLA CPU compilation light for tests.
os.environ.setdefault("JAX_ENABLE_X64", "0")
# CLI tests train from a fixed random init — don't probe weight caches /
# the (absent) network for the --pretrained default path on every run.
os.environ.setdefault("LARYNGEAL_PRETRAINED", "0")
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(42)
