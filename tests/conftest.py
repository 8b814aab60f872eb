"""Test configuration: force CPU JAX with an 8-device virtual mesh.

Tests must not require TPU hardware; sharding tests run on 8 virtual CPU
devices (the driver separately dry-runs the multichip path).
"""

import os

# Force CPU: the environment's sitecustomize registers the axon TPU plugin
# and overrides jax_platforms via jax.config (env vars alone don't win).
# Tests must run on the virtual-device CPU mesh; set QWEN3_ASR_TPU_TESTS=1
# to run on real hardware.
# Do NOT set TF_ENABLE_ONEDNN_OPTS=0 here: it also switches XLA:CPU's GEMMs
# off oneDNN onto an Eigen path whose batched matmuls are NONDETERMINISTIC
# under thread contention (measured: a warm ContinuousBatcher returned three
# different greedy transcripts for identical submits while host threads were
# busy). The torch oracles compare within tolerances and don't need it.
# tests build throwaway checkpoints in tmp dirs — don't leak their sidecar
# RAM mirrors into /dev/shm (params._ram_mirror)
os.environ.setdefault("QWEN3_ASR_RAM_CACHE", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not os.environ.get("QWEN3_ASR_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
