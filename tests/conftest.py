"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding/pjit tests run against
XLA's host-platform device virtualization instead.
"""

import os

# The sandbox env pins JAX_PLATFORMS to the TPU tunnel; override it hard —
# a plain setdefault would silently leave tests running over the tunnel.
# PCM_TEST_TPU=1 opts out, enabling the TPU-only kernel suites
# (test_pallas_kernels.py, test_flash_attention.py) on a real chip:
#   PCM_TEST_TPU=1 python -m pytest tests/test_flash_attention.py
if os.environ.get("PCM_TEST_TPU", "0") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if os.environ.get("PCM_TEST_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
# tests import sibling helper modules (_reference_stubs, _torch_port)
if str(REPO_ROOT / "tests") not in sys.path:
    sys.path.insert(0, str(REPO_ROOT / "tests"))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def config_dir() -> str:
    return str(REPO_ROOT / "configs")
