"""Test configuration: force an 8-device CPU mesh.

The distributed-testing strategy (SURVEY.md §4 last bullet): no TPU cluster
is needed — ``xla_force_host_platform_device_count=8`` exercises
mesh/pjit/GSPMD logic on fake CPU devices. The environment's sitecustomize
force-registers a TPU PJRT plugin and sets ``jax_platforms='axon,cpu'``;
overriding the config to ``cpu`` before first backend use pins tests to CPU.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

# CPU-pinned suite: machine-fingerprinted compile-cache dir (see
# tests/cachedirs.py — a home dir persisting across heterogeneous machines
# can otherwise serve XLA:CPU executables compiled for foreign cpu
# features, which SIGILL on load). ircolor_tpu/__init__.py honors this env.
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from cachedirs import cpu_cache_dir  # noqa: E402

os.environ.setdefault("IRCOLOR_COMPILE_CACHE_DIR", cpu_cache_dir("tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_cpu_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 fake CPU devices, got {devs}"
    return devs


@pytest.fixture()
def kaist_tree(tmp_path):
    """Small synthetic KAIST tree: 2 sets, nested sequences, unpaired extras."""
    from ircolor_tpu.data.synthetic import make_kaist_tree

    root = tmp_path / "kaist"
    n = make_kaist_tree(
        str(root),
        sets={
            "set00": {"V000": 6, "V001": 4},
            "set02": {"V000": 4, "V001/nested": 3},
        },
        size_hw=(64, 80),
        unpaired_extra=2,
    )
    return root, n
