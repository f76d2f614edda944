"""Test configuration: run everything on a virtual 8-device CPU mesh.

Sharding/parallelism tests need multiple devices; real TPU hardware in CI is a
single chip, so tests force the CPU backend with 8 virtual devices. Must run
before jax initializes, hence at conftest import time.
"""

import os

# Hard override: the environment pins JAX_PLATFORMS=axon (remote TPU tunnel with
# seconds-per-dispatch latency), and sitecustomize imports jax at interpreter
# startup — so env vars alone are too late. jax.config.update works post-import
# as long as no backend has been created yet.
os.environ["JAX_PLATFORMS"] = "cpu"
# JAX_PLATFORMS=cpu alone does NOT stop the axon TPU plugin from initializing:
# any PALLAS_AXON_*/AXON_*/TPU_*/LIBTPU* var triggers plugin init, which blocks
# ~15 min on relay sockets (observed round 2) or dies on a libtpu AOT mismatch.
# Scrub them before any backend is created so test wall-clock is deterministic.
for _k in [k for k in os.environ
           if k.startswith(("PALLAS_AXON", "AXON", "TPU", "LIBTPU"))]:
    del os.environ[_k]
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # fp64 available for transform-exactness tests
assert jax.devices()[0].platform == "cpu", f"tests must run on CPU, got {jax.devices()}"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for sharding tests"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
