"""Test configuration: force an 8-device virtual CPU mesh for JAX.

Tests never require real TPU hardware; sharding/pjit paths are validated
on virtual CPU devices per the project policy.  This must run before any
jax import.
"""

import os
import subprocess
import sys

# On axon-attached machines the TPU plugin registers at interpreter
# startup (sitecustomize) and pins the backend before any conftest code
# runs; the only reliable switch is the env of a fresh interpreter.
# Re-exec pytest once with the axon trigger cleared and CPU forced.
if (os.environ.get("PALLAS_AXON_POOL_IPS")
        and os.environ.get("ZT_TEST_REEXEC") != "1"):
    env = dict(os.environ)
    env.update({
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
        "ZT_TEST_REEXEC": "1",
    })
    raise SystemExit(subprocess.call(
        [sys.executable, "-m", "pytest"] + sys.argv[1:], env=env))

os.environ["JAX_PLATFORMS"] = "cpu"
# Small batched-engine geometry: interpret-mode Pallas kernels on CPU
# are compiled per (tile, lanes) shape; keep them tiny.
os.environ.setdefault("ZT_TILE", "1024")
os.environ.setdefault("ZT_LANES", "8")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def corpus(rng):
    """Small mixed corpus for round-trip tests."""
    cases = {
        "empty": b"",
        "one": b"a",
        "two": b"ab",
        "three": b"abc",
        "tiny_repeat": b"abcabcabcabc",
        "foobar": b"foobar" * 100,
        "underscore_foobar": b"_foobar" * 1000,
        "random_3000": rng.integers(0, 256, 3000, dtype=np.uint8).tobytes(),
        "random_binary_small": rng.integers(0, 2, 500, dtype=np.uint8).tobytes(),
        "runs": b"\x00" * 2000 + b"a" * 1500 + bytes(range(256)) * 4,
        "text": (b"The quick brown fox jumps over the lazy dog. " * 200),
        "alternating": bytes([i % 7 for i in range(4096)]),
        "long_run": b"x" * 20000,
    }
    return cases
