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

# `pytest -m quick` — the pre-commit smoke tier (VERDICT r4 #8): config
# composition, the collate/dedup contract, the tiny graft dryrun (tp+fsdp+sp
# legs), one tiny f64 parity per model family, and loader basics. Target
# <5 min on the 1-CPU sandbox (measured ~3 min 2026-08-20); the full suite
# is the real gate and takes hours here (fine on a ~100-core TPU host).
QUICK_NODES = (
    "test_cli.py::test_compose_defaults",
    "test_cli.py::test_compose_experiment_and_overrides",
    "test_cli.py::test_compose_strategy_variants",
    "test_cli.py::test_compose_extras_local_and_tree",
    "test_cli.py::test_compose_example_experiment_template",
    "test_cli.py::test_fixed_prompt_detection",
    "test_text_dedup.py::test_collate_dedup_contract",
    "test_graft_entry.py::test_dryrun_impl_in_process",
    "test_clipseg_parity.py::test_e2e_clipseg_parity[False]",
    "test_cris_parity.py::test_e2e_cris_parity[1.0]",
    "test_trans_segmentor_parity.py::test_trans_segmentor_parity[False]",
    "test_denseclip.py::test_full_denseclip_forward",
    "test_zero_shot_ris.py::test_masked_clip_features_parity",
    "test_data.py::test_tokenizer_basics",
    "test_data.py::test_loader_batching_and_padding",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        rel = item.nodeid.split("tests/")[-1]
        if rel in QUICK_NODES:
            item.add_marker(pytest.mark.quick)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
