"""Helpers to instantiate the REFERENCE wrappers (read-only torch code at
/root/reference) as numerical oracles for prompt-splice parity tests.

The reference is imported, never copied: tests compare our functional JAX
forward against the reference's torch forward on identical random weights.
"""
from __future__ import annotations

import functools
import sys
from pathlib import Path

import torch

REFERENCE = Path("/root/reference")

_ref_available = (REFERENCE / "src").is_dir()


def reference_available() -> bool:
    return _ref_available


def _ensure_path():
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))


def make_reference_wrapper(strategy: str, hf_cfg, learner_kwargs: dict,
                           wrapper_kwargs: dict | None = None, seed: int = 0):
    """Build a reference BaseCLIPSeg subclass with a randomly initialized
    tiny HF model (bypasses from_pretrained via monkeypatching)."""
    _ensure_path()
    from transformers import CLIPSegForImageSegmentation

    from src.models.components.hf_clipseg_wrapper import HFCLIPSegWrapper
    from src.models.core_models.coop import (COOPCLIPSeg, MapleCLIPSeg,
                                             SharedAttnCLIPSeg,
                                             SharedSeparateCLIPSeg, VPTCLIPSeg)
    from src.models.core_models.coop.context_learner import (
        CoCoOpContextLearner, CoOpContextLearner, MapleContextLearner,
        SharedAttnLearner, SharedSeparateLearner, VPTContextLearner)

    wrappers = {
        "coop": (COOPCLIPSeg, CoOpContextLearner),
        "cocoop": (COOPCLIPSeg, CoCoOpContextLearner),
        "vpt": (VPTCLIPSeg, VPTContextLearner),
        "maple": (MapleCLIPSeg, MapleContextLearner),
        "shared_separate": (SharedSeparateCLIPSeg, SharedSeparateLearner),
        "shared_attn": (SharedAttnCLIPSeg, SharedAttnLearner),
    }
    wrapper_cls, learner_cls = wrappers[strategy]

    torch.manual_seed(seed)
    tiny_model = CLIPSegForImageSegmentation(hf_cfg).eval()

    orig = HFCLIPSegWrapper.get_pretrained_model
    HFCLIPSegWrapper.get_pretrained_model = staticmethod(
        lambda *a, **k: tiny_model)
    try:
        learner = functools.partial(learner_cls, **learner_kwargs)
        wrapper = wrapper_cls(
            context_learner=learner,
            model_cfg={"pretrained_model_name_or_path": None},
            **(wrapper_kwargs or {}),
        ).eval()
    finally:
        HFCLIPSegWrapper.get_pretrained_model = orig
    # float64: this CPU's torch build computes some batched matmuls through a
    # reduced-precision oneDNN path (~2e-3 error vs exact); an f64 oracle
    # sidesteps it so test tolerances reflect OUR f32 error only.
    return wrapper.double().eval()


def run_reference(wrapper, ids, mask, pixel):
    """Run the f64 oracle forward. Torch's default dtype is switched to f64 so
    HF mask helpers (`torch.full(..., finfo(f64).min)`) don't overflow."""
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        with torch.no_grad():
            out = wrapper({"input_ids": torch.tensor(ids),
                           "attention_mask": torch.tensor(mask)},
                          torch.tensor(pixel, dtype=torch.float64))
    finally:
        torch.set_default_dtype(prev)
    return out.numpy()
