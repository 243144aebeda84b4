"""Test configuration: force an 8-device virtual CPU mesh.

This is the TPU-native analogue of testing multi-node code without a
cluster (SURVEY.md §4): all sharding/pjit tests run against 8 virtual CPU
devices.

Note: some environments inject a TPU PJRT plugin via sitecustomize before
pytest starts (so JAX may already be imported); we therefore switch the
platform with ``jax.config.update`` *after* import and add the host-device
XLA flag before the first backend initialization.
"""
import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's cost is dominated by XLA:CPU
# compiles of the fused train-step programs (minutes each); caching them
# makes re-runs of the suite fast. The directory is scoped by a CPU-
# feature fingerprint: XLA:CPU AOT blobs embed the compile machine's
# features, and jax's cache key does NOT — a cache written on a
# different machine loads with "machine feature mismatch" errors and
# can SIGILL (observed across build machines).


def _machine_cache_dir() -> str:
    import hashlib

    fp = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    fp = hashlib.sha1(line.encode()).hexdigest()[:10]
                    break
    except OSError:
        pass
    return os.path.expanduser(f"~/.cache/hpe_jax_test_cache_{fp or 'unknown'}")


_CACHE = os.environ.get("HPE_TEST_COMPILATION_CACHE") or _machine_cache_dir()
if _CACHE:
    # Workers spawned by tests (tests/multihost_worker.py) must share the
    # same machine-scoped directory.
    os.environ["HPE_TEST_COMPILATION_CACHE"] = _CACHE
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8, (
    "tests require the 8-device virtual CPU mesh; got %s" % jax.devices()
)

REFERENCE_PATH = "/root/reference"


@pytest.fixture(scope="session")
def tiny_model():
    """Small synthetic SMPL asset (fast tests)."""
    from human_pose_estimation_tpu.utils.assets import synthetic_model

    return synthetic_model(num_verts=120, seed=0)


@pytest.fixture(scope="session")
def full_model():
    """Full-size (6890-vertex) synthetic SMPL asset."""
    from human_pose_estimation_tpu.utils.assets import synthetic_model

    return synthetic_model(num_verts=6890, seed=0)


def has_reference():
    return os.path.isdir(REFERENCE_PATH)


@pytest.fixture(scope="session")
def reference_src():
    """Importable handle to the TF2 reference (parity oracle only)."""
    if not has_reference():
        pytest.skip("reference repo not available")
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    return REFERENCE_PATH


@pytest.fixture()
def rng():
    return np.random.RandomState(42)
