"""Test configuration: run everything on a virtual 8-device CPU mesh.

Note: this environment's sitecustomize imports jax at interpreter startup
with JAX_PLATFORMS=axon (remote TPU), so env-var edits here are too late —
we must switch platforms through jax.config. XLA_FLAGS is still read lazily
at CPU-backend creation, so forcing the host device count here works.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# SONAR_SLAM_TPU_TESTS=1 keeps the ambient (TPU/axon) platform so the
# tpu-marked device tests (tests/test_tpu.py) can run on the real chip;
# everything else runs on the virtual CPU mesh.
if os.environ.get("SONAR_SLAM_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: needs the real TPU (SONAR_SLAM_TPU_TESTS=1, one "
        "TPU process at a time)")
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end test")
