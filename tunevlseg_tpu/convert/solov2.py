"""FreeSOLO / SOLOv2 (detectron2-format) checkpoint -> pytree converter.

Maps the reference PseudoSOLOv2 state dict (backbone.bottom_up ResNet +
backbone FPN + ins_head/mask_head; reference configs/model/zsseg.yaml
`solo_state_dict_path: pretrain/FreeSOLO_R101_30k.pt`)."""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from tunevlseg_tpu.convert.clipseg import _Tree
from tunevlseg_tpu.models.solov2.backbone import RESNET_STAGE_BLOCKS
from tunevlseg_tpu.models.solov2.model import SOLOv2Config


def _conv(t: _Tree, dst: str, sd, src: str) -> None:
    t.set(f"{dst}/weight", sd[f"{src}.weight"])
    if f"{src}.bias" in sd:
        t.set(f"{dst}/bias", sd[f"{src}.bias"])


def _frozen_bn(t: _Tree, dst: str, sd, src: str) -> None:
    for name in ("weight", "bias", "running_mean", "running_var"):
        t.set(f"{dst}/{name}", sd[f"{src}.{name}"])


def _gn(t: _Tree, dst: str, sd, src: str) -> None:
    t.set(f"{dst}/scale", sd[f"{src}.weight"])
    t.set(f"{dst}/bias", sd[f"{src}.bias"])


def convert_solov2(sd: Mapping[str, np.ndarray],
                   cfg: SOLOv2Config) -> dict[str, Any]:
    t = _Tree()

    # --- ResNet (backbone.bottom_up.*) ---
    bu = "backbone.bottom_up"
    _conv(t, "backbone/stem_conv1", sd, f"{bu}.stem.conv1")
    _frozen_bn(t, "backbone/stem_conv1_norm", sd, f"{bu}.stem.conv1.norm")
    for stage, blocks in enumerate(RESNET_STAGE_BLOCKS[cfg.depth], start=2):
        for b in range(blocks):
            src = f"{bu}.res{stage}.{b}"
            dst = f"backbone/res{stage}_{b}"
            for ci in (1, 2, 3):
                _conv(t, f"{dst}/conv{ci}", sd, f"{src}.conv{ci}")
                _frozen_bn(t, f"{dst}/conv{ci}_norm", sd,
                           f"{src}.conv{ci}.norm")
            if f"{src}.shortcut.weight" in sd:
                _conv(t, f"{dst}/shortcut", sd, f"{src}.shortcut")
                _frozen_bn(t, f"{dst}/shortcut_norm", sd,
                           f"{src}.shortcut.norm")

    # --- FPN (backbone.fpn_*) ---
    for lvl in (2, 3, 4, 5):
        _conv(t, f"fpn/fpn_lateral{lvl}", sd, f"backbone.fpn_lateral{lvl}")
        _conv(t, f"fpn/fpn_output{lvl}", sd, f"backbone.fpn_output{lvl}")

    # --- ins head: towers are Sequential [conv, GN, relu] triplets ---
    for head in ("cate", "kernel"):
        for i in range(cfg.num_instance_convs):
            src = f"ins_head.{head}_tower.{i * 3}"
            dst = f"ins_head/{head}_tower_{i}"
            _conv(t, f"{dst}/conv", sd, src)
            _gn(t, f"{dst}/gn", sd, f"ins_head.{head}_tower.{i * 3 + 1}")
    for pred in ("cate_pred", "kernel_pred", "emb_pred"):
        _conv(t, f"ins_head/{pred}", sd, f"ins_head.{pred}")

    # --- mask head ---
    n_levels = 4
    for i in range(n_levels):
        n_convs = max(1, i)
        for j in range(n_convs):
            src = f"mask_head.convs_all_levels.{i}.conv{j}"
            dst = f"mask_head/level{i}_conv{j}"
            _conv(t, f"{dst}/conv", sd, f"{src}.0")
            _gn(t, f"{dst}/gn", sd, f"{src}.1")
    _conv(t, "mask_head/conv_pred_conv", sd, "mask_head.conv_pred.0")
    _gn(t, "mask_head/conv_pred_gn", sd, "mask_head.conv_pred.1")
    return t


def load_freesolo_checkpoint(path: str, cfg: SOLOv2Config) -> dict[str, Any]:
    import torch

    from tunevlseg_tpu.convert.clipseg import torch_state_dict_to_numpy

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]
    if isinstance(raw, dict) and "model" in raw and isinstance(raw["model"],
                                                               dict):
        raw = raw["model"]
    sd = torch_state_dict_to_numpy(raw)
    if all(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items()}
    return convert_solov2(sd, cfg)
