"""Torch CRIS / OpenAI-CLIP checkpoint -> tunevlseg_tpu CRIS pytrees.

Handles the reference's three checkpoint flavors (SURVEY §5.4):
  * OpenAI CLIP TorchScript archives (`pretrain/RN50.pt` — torch.jit.load
    state dict with `visual.*` / `transformer.*` keys; reference
    cris_model/__init__.py:76);
  * full CRIS state dicts (`pretrain/cris_best_single.pth`, `backbone.*` +
    `neck/decoder/proj.*` keys), including Lightning-prefixed ones processed
    like scripts/process_cris_checkpoint.py (strip `model.`/`net.`);
  * COOPCRIS wrapper dicts with `context_learner.*` and the additive head.

Returns {"params": ..., "batch_stats": ...} (BatchNorm running statistics
live in their own collection).
"""
from __future__ import annotations

from typing import Any, Mapping, Optional

import numpy as np

from tunevlseg_tpu.convert.clipseg import (_Tree, convert_context_learner,
                                           torch_state_dict_to_numpy)
from tunevlseg_tpu.models.cris.model import CRISConfig


def _dense(p: _Tree, dst: str, sd, src: str) -> None:
    p.set(f"{dst}/kernel", sd[f"{src}.weight"].T)
    if f"{src}.bias" in sd:
        p.set(f"{dst}/bias", sd[f"{src}.bias"])


def _conv(p: _Tree, dst: str, sd, src: str) -> None:
    p.set(f"{dst}/weight", sd[f"{src}.weight"])
    if f"{src}.bias" in sd:
        p.set(f"{dst}/bias", sd[f"{src}.bias"])


def _bn(p: _Tree, s: _Tree, dst: str, sd, src: str) -> None:
    p.set(f"{dst}/weight", sd[f"{src}.weight"])
    p.set(f"{dst}/bias", sd[f"{src}.bias"])
    s.set(f"{dst}/running_mean", sd[f"{src}.running_mean"])
    s.set(f"{dst}/running_var", sd[f"{src}.running_var"])


def _ln(p: _Tree, dst: str, sd, src: str) -> None:
    p.set(f"{dst}/scale", sd[f"{src}.weight"])
    p.set(f"{dst}/bias", sd[f"{src}.bias"])


def _packed_mha(p: _Tree, dst: str, sd, src: str) -> None:
    w = sd[f"{src}.in_proj_weight"]
    b = sd.get(f"{src}.in_proj_bias")
    d = w.shape[1]
    for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
        p.set(f"{dst}/{name}/kernel", w[j * d:(j + 1) * d].T)
        if b is not None:
            p.set(f"{dst}/{name}/bias", b[j * d:(j + 1) * d])
    _dense(p, f"{dst}/out_proj", sd, f"{src}.out_proj")


def _conv_bn(p: _Tree, s: _Tree, dst: str, sd, src: str) -> None:
    """reference `conv_layer` Sequential: .0 conv, .1 bn."""
    _conv(p, f"{dst}/conv", sd, f"{src}.0")
    _bn(p, s, f"{dst}/bn", sd, f"{src}.1")


def convert_clip_backbone(sd: Mapping[str, np.ndarray], cfg: CRISConfig,
                          p: _Tree, s: _Tree) -> None:
    """OpenAI CLIP RN50 keys (visual.* / text transformer at top level)."""
    # --- ModifiedResNet ---
    for i in (1, 2, 3):
        _conv(p, f"visual/conv{i}", sd, f"visual.conv{i}")
        _bn(p, s, f"visual/bn{i}", sd, f"visual.bn{i}")
    for stage, blocks in enumerate(cfg.vision_layers, start=1):
        for b in range(blocks):
            src = f"visual.layer{stage}.{b}"
            dst = f"visual/layer{stage}_{b}"
            for ci in (1, 2, 3):
                _conv(p, f"{dst}/conv{ci}", sd, f"{src}.conv{ci}")
                _bn(p, s, f"{dst}/bn{ci}", sd, f"{src}.bn{ci}")
            if f"{src}.downsample.0.weight" in sd:
                _conv(p, f"{dst}/downsample_conv", sd, f"{src}.downsample.0")
                _bn(p, s, f"{dst}/downsample_bn", sd, f"{src}.downsample.1")
    ap = "visual.attnpool"
    p.set("visual/attnpool/positional_embedding",
          sd[f"{ap}.positional_embedding"])
    for proj in ("q_proj", "k_proj", "v_proj", "c_proj"):
        _dense(p, f"visual/attnpool/{proj}", sd, f"{ap}.{proj}")
    if f"{ap}.connect.0.weight" in sd:  # CRIS-added residual (absent in jit)
        _conv(p, "visual/attnpool/connect_conv", sd, f"{ap}.connect.0")
        _bn(p, s, "visual/attnpool/connect_bn", sd, f"{ap}.connect.1")

    # --- text transformer ---
    p.set("text/token_embedding/embedding", sd["token_embedding.weight"])
    p.set("text/positional_embedding", sd["positional_embedding"])
    for i in range(cfg.transformer_layers):
        src = f"transformer.resblocks.{i}"
        dst = f"text/resblocks_{i}"
        _packed_mha(p, f"{dst}/self_attn", sd, f"{src}.attn")
        _ln(p, f"{dst}/layer_norm1", sd, f"{src}.ln_1")
        _ln(p, f"{dst}/layer_norm2", sd, f"{src}.ln_2")
        _dense(p, f"{dst}/mlp/fc1", sd, f"{src}.mlp.c_fc")
        _dense(p, f"{dst}/mlp/fc2", sd, f"{src}.mlp.c_proj")
    _ln(p, "text/ln_final", sd, "ln_final")
    p.set("text/text_projection", sd["text_projection"])


def config_from_clip_state_dict(sd: Mapping[str, np.ndarray],
                                **head_kwargs) -> CRISConfig:
    """Shape inference mirroring `build_model` (clip.py:578-646), RN path."""
    vision_layers = tuple(
        len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}.")})
        for b in range(1, 5))
    vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
    output_width = round(
        (sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5)
    embed_dim = sd["text_projection"].shape[1]
    heads = vision_width * 32 // 64
    return CRISConfig(
        vision_layers=vision_layers, vision_width=vision_width,
        vision_heads=heads, image_resolution=output_width * 32,
        embed_dim=embed_dim,
        vocab_size=sd["token_embedding.weight"].shape[0],
        context_length=sd["positional_embedding"].shape[0],
        transformer_width=sd["ln_final.weight"].shape[0],
        transformer_heads=sd["ln_final.weight"].shape[0] // 64,
        transformer_layers=len({k.split(".")[2] for k in sd
                                if k.startswith("transformer.resblocks")}),
        **head_kwargs)


def convert_cris(sd: Mapping[str, np.ndarray], cfg: CRISConfig,
                 strategy: Optional[str] = None) -> dict[str, Any]:
    """Full CRIS (+ optional COOPCRIS learner/head) state dict -> pytrees."""
    p, s = _Tree(), _Tree()

    backbone = {k[len("backbone."):]: v for k, v in sd.items()
                if k.startswith("backbone.")}
    if backbone:
        convert_clip_backbone(backbone, cfg, p, s)
    elif "visual.conv1.weight" in sd:
        convert_clip_backbone(sd, cfg, p, s)

    if any(k.startswith("neck.") for k in sd):
        for name in ("f1_v_proj", "f2_v_proj", "f2_cat", "f3_v_proj",
                     "f3_cat", "f4_proj5", "f4_proj4", "f4_proj3", "aggr"):
            _conv_bn(p, s, f"neck/{name}", sd, f"neck.{name}")
        _dense(p, "neck/txt_proj/linear", sd, "neck.txt_proj.0")
        _bn(p, s, "neck/txt_proj/bn", sd, "neck.txt_proj.1")
        _bn(p, s, "neck/norm_layer_bn", sd, "neck.norm_layer.0")
        _conv_bn(p, s, "neck/coordconv_0", sd, "neck.coordconv.0.conv1")
        _conv_bn(p, s, "neck/coordconv_1", sd, "neck.coordconv.1")

    if any(k.startswith("decoder.") for k in sd):
        n_layers = len({k.split(".")[2] for k in sd
                        if k.startswith("decoder.layers.")})
        for i in range(n_layers):
            src = f"decoder.layers.{i}"
            dst = f"decoder/layers_{i}"
            _packed_mha(p, f"{dst}/self_attn", sd, f"{src}.self_attn")
            _packed_mha(p, f"{dst}/multihead_attn", sd, f"{src}.multihead_attn")
            for norm in ("self_attn_norm", "cross_attn_norm",
                         "norm1", "norm2", "norm3"):
                _ln(p, f"{dst}/{norm}", sd, f"{src}.{norm}")
            _dense(p, f"{dst}/ffn_0", sd, f"{src}.ffn.0")
            _ln(p, f"{dst}/ffn_norm", sd, f"{src}.ffn.3")
            _dense(p, f"{dst}/ffn_1", sd, f"{src}.ffn.4")
        _ln(p, "decoder/norm", sd, "decoder.norm")

    if any(k.startswith("proj.") for k in sd):
        _conv_bn(p, s, "proj/vis_1", sd, "proj.vis.1")
        _conv_bn(p, s, "proj/vis_3", sd, "proj.vis.3")
        _conv(p, "proj/vis_4", sd, "proj.vis.4")
        _dense(p, "proj/txt", sd, "proj.txt")

    if "additive_decoder_layer.0.weight" in sd:
        _conv(p, "additive_conv1", sd, "additive_decoder_layer.0")
        _conv(p, "additive_conv2", sd, "additive_decoder_layer.2")
    if "residual_ratio" in sd:
        p.set("residual_ratio", sd["residual_ratio"])
    if strategy is not None and any(k.startswith("context_learner.")
                                    for k in sd):
        p["learner"] = convert_context_learner(sd, strategy)

    return {"params": p, "batch_stats": s}


def load_cris_checkpoint(path: str, cfg: CRISConfig,
                         strategy: Optional[str] = None) -> dict[str, Any]:
    import torch
    try:
        model = torch.jit.load(path, map_location="cpu")
        raw = model.state_dict()
    except RuntimeError:
        raw = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(raw, dict) and "state_dict" in raw:
            raw = raw["state_dict"]
    sd = torch_state_dict_to_numpy(raw)
    for prefix in ("model.", "net."):
        if all(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items()}
    return convert_cris(sd, cfg, strategy)
