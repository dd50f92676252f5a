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


def setup_solov2_imports() -> bool:
    """Make the reference SOLOv2/ZeroShotRIS importable:
      * alias the broken `src.models.core_models.detectron2` relative import
        to the root-level vendored detectron2 (latent packaging bug,
        SURVEY §2.6);
      * stub fvcore (weight-init fills), skimage.color, and torchvision
        (deform_conv2d is dead code; TF.resize implemented via torch
        interpolate for the crop path).
    Returns False if the reference is unavailable."""
    import importlib
    import sys
    import types

    import torch.nn as tnn
    import torch.nn.functional as tF

    if not _ref_available:
        return False
    _ensure_path()

    fv = types.ModuleType("fvcore")
    fvnn = types.ModuleType("fvcore.nn")
    wi = types.ModuleType("fvcore.nn.weight_init")

    def c2_msra_fill(module):
        tnn.init.kaiming_normal_(module.weight, mode="fan_out",
                                 nonlinearity="relu")
        if module.bias is not None:
            tnn.init.constant_(module.bias, 0)

    def c2_xavier_fill(module):
        tnn.init.xavier_uniform_(module.weight)
        if module.bias is not None:
            tnn.init.constant_(module.bias, 0)

    wi.c2_msra_fill = c2_msra_fill
    wi.c2_xavier_fill = c2_xavier_fill
    dist = types.ModuleType("fvcore.nn.distributed")
    dist.differentiable_all_reduce = lambda x: x

    def sigmoid_focal_loss_jit(inputs, targets, alpha=-1, gamma=2,
                               reduction="none"):
        import torch
        p = torch.sigmoid(inputs)
        ce = tF.binary_cross_entropy_with_logits(inputs, targets,
                                                 reduction="none")
        p_t = p * targets + (1 - p) * (1 - targets)
        loss = ce * ((1 - p_t) ** gamma)
        if alpha >= 0:
            loss = (alpha * targets + (1 - alpha) * (1 - targets)) * loss
        if reduction == "mean":
            return loss.mean()
        if reduction == "sum":
            return loss.sum()
        return loss

    fvnn.weight_init = wi
    fvnn.distributed = dist
    fvnn.sigmoid_focal_loss_jit = sigmoid_focal_loss_jit
    fv.nn = fvnn
    sys.modules.setdefault("fvcore", fv)
    sys.modules.setdefault("fvcore.nn", fvnn)
    sys.modules.setdefault("fvcore.nn.weight_init", wi)
    sys.modules.setdefault("fvcore.nn.distributed", dist)

    sk = types.ModuleType("skimage")
    skc = types.ModuleType("skimage.color")
    skc.rgb2lab = lambda x: x
    sk.color = skc
    sys.modules.setdefault("skimage", sk)
    sys.modules.setdefault("skimage.color", skc)

    tv = types.ModuleType("torchvision")
    tvops = types.ModuleType("torchvision.ops")

    def deform_conv2d(*a, **k):  # dead code path (SURVEY §2.9)
        raise NotImplementedError("deform_conv2d is dead code")

    tvops.deform_conv2d = deform_conv2d
    tvt = types.ModuleType("torchvision.transforms")
    tvtf = types.ModuleType("torchvision.transforms.functional")

    class InterpolationMode:
        BICUBIC = "bicubic"
        BILINEAR = "bilinear"
        NEAREST = "nearest"

    def tv_resize(img, size, interpolation="bilinear", antialias=None):
        if isinstance(size, int):
            size = (size, size)
        mode = getattr(interpolation, "value", interpolation)
        unsq = img.ndim == 3
        if unsq:
            img = img[None]
        out = tF.interpolate(img, size=tuple(size), mode=mode,
                             align_corners=False)
        return out[0] if unsq else out

    tvtf.InterpolationMode = InterpolationMode
    tvtf.resize = tv_resize
    tvt.functional = tvtf
    tv.ops = tvops
    tv.transforms = tvt
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.ops", tvops)
    sys.modules.setdefault("torchvision.transforms", tvt)
    sys.modules.setdefault("torchvision.transforms.functional", tvtf)

    # torch 2.13 removed the FILE_LIKE alias the reference imports
    import torch.serialization as tser
    if not hasattr(tser, "FILE_LIKE"):
        tser.FILE_LIKE = object

    # open_clip/timm: only needed for the BiomedCLIP variant; stub for import
    oc = types.ModuleType("open_clip")
    oc.create_model_from_pretrained = lambda *a, **k: (None, None)
    oc.get_tokenizer = lambda *a, **k: None

    class _OCCLIP:  # placeholder type for isinstance/annotation use
        pass

    oc.CLIP = _OCCLIP
    sys.modules.setdefault("open_clip", oc)
    tm = types.ModuleType("timm")
    tmm = types.ModuleType("timm.models")

    class _TimmViT:
        pass

    tmm.VisionTransformer = _TimmViT
    tmm.checkpoint_seq = lambda *a, **k: None
    tm.models = tmm
    import importlib.machinery as _mach
    for _m in (oc, tm, tmm, fv, fvnn, wi, dist, sk, skc, tv, tvops, tvt,
               tvtf):
        _m.__spec__ = _mach.ModuleSpec(_m.__name__, None)
    sys.modules.setdefault("timm", tm)
    sys.modules.setdefault("timm.models", tmm)

    import detectron2 as d2
    sys.modules["src.models.core_models.detectron2"] = d2
    for sub in ("structures", "structures.boxes", "modelling",
                "modelling.backbone", "layers", "utils"):
        sys.modules[f"src.models.core_models.detectron2.{sub}"] = \
            importlib.import_module(f"detectron2.{sub}")
    return True


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
