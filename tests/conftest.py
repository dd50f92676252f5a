"""Test configuration: force an 8-device virtual CPU platform BEFORE jax
initializes, mirroring the reference's `ddp_sim` CPU strategy
(reference configs/trainer/ddp_sim.yaml) for multi-chip sharding tests.

NOTE: the session may preset JAX_PLATFORMS=axon (real TPU) and the axon
plugin ignores the env var, so we use jax.config at conftest import time
(before the backend initializes). Set TUNEVLSEG_TEST_TPU=1 to run the suite
on the real chip instead.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if os.environ.get("TUNEVLSEG_TEST_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
else:
    # CI-equivalent chip runs must fail LOUDLY on kernel breakage, not
    # silently demote to the XLA fallback (VERDICT r2 #7)
    os.environ.setdefault("TUNEVLSEG_FLASH", "strict")
    # TPU matmuls default to bf16 passes (~2e-3 error) — parity/equivalence
    # tolerances assume f32 accumulation (the verify-skill gotcha)
    jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
