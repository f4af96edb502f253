"""Test harness: force a CPU backend with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (the fake-backend
capability the reference lacks; SURVEY.md §4).

Note: this box's sitecustomize force-registers the axon TPU backend with
`jax.config.update("jax_platforms", ...)`, which overrides the JAX_PLATFORMS
env var — so the override must also go through jax.config, after import but
before any backend is touched.
"""

import os
import sys

# ORTF_TPU_TESTS=1 runs the hardware lane (tests marked @pytest.mark.tpu)
# on the real device instead of the virtual CPU mesh:
#   ORTF_TPU_TESTS=1 python -m pytest tests/ -m tpu
RUN_TPU = os.environ.get("ORTF_TPU_TESTS") == "1"

if not RUN_TPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags += " --xla_force_host_platform_device_count=8"
    if "collective" not in flags:
        # 8 device threads on ~2 cores: raise the CPU collective rendezvous
        # timeouts (default 20s warn / 40s TERMINATE: rendezvous.cc aborts
        # the whole process) so uneven per-device runtimes under core
        # contention don't abort sharded tests spuriously. jaxlib 0.9
        # renamed the knobs to xla_cpu_collective_call_*; keep the old
        # spelling too for older jaxlibs.
        flags += (" --xla_cpu_collective_timeout_seconds=1200"
                  " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
                  " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
    os.environ["XLA_FLAGS"] = flags.strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if not RUN_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: runs on real TPU hardware (ORTF_TPU_TESTS=1)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if "tpu" in item.keywords and not RUN_TPU:
            item.add_marker(pytest.mark.skip(
                reason="TPU lane disabled (set ORTF_TPU_TESTS=1)"))
        elif "tpu" not in item.keywords and RUN_TPU:
            item.add_marker(pytest.mark.skip(
                reason="CPU test skipped in the TPU lane"))


@pytest.fixture(scope="session")
def test_scene():
    from opengl_ray_tracing_framework_tpu.models.scene import build_test_scene
    _, data = build_test_scene()
    return data


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
