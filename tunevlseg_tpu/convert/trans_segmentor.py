"""HF CLIPModel / SiglipModel + reference TransformerSegmentor checkpoints ->
tunevlseg_tpu pytrees."""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from tunevlseg_tpu.convert.clipseg import (_Tree, _dense, _encoder_layer,
                                           _layer_norm,
                                           _torch_transformer_layer)
from tunevlseg_tpu.models.trans_segmentor.model import TransSegmentorConfig


def convert_hf_clip_model(sd: Mapping[str, np.ndarray],
                          cfg: TransSegmentorConfig, t: _Tree) -> None:
    """`transformers.CLIPModel` keys (text_model./vision_model. at root)."""
    tm = "text_model"
    t.set("text_model/token_embedding/embedding",
          sd[f"{tm}.embeddings.token_embedding.weight"])
    t.set("text_model/position_embedding/embedding",
          sd[f"{tm}.embeddings.position_embedding.weight"])
    for i in range(cfg.text.num_layers):
        _encoder_layer(t, f"text_model/layers_{i}", sd,
                       f"{tm}.encoder.layers.{i}")
    _layer_norm(t, "text_model/final_layer_norm", sd, f"{tm}.final_layer_norm")

    vm = "vision_model"
    t.set("vision_model/class_embedding", sd[f"{vm}.embeddings.class_embedding"])
    t.set("vision_model/position_embedding",
          sd[f"{vm}.embeddings.position_embedding.weight"])
    pw = sd[f"{vm}.embeddings.patch_embedding.weight"]
    t.set("vision_model/patch_proj", pw.reshape(pw.shape[0], -1).T)
    # CLIPModel names it pre_layrnorm (same HF typo as CLIPSeg)
    pre = (f"{vm}.pre_layrnorm" if f"{vm}.pre_layrnorm.weight" in sd
           else f"{vm}.pre_layernorm")
    _layer_norm(t, "vision_model/pre_layernorm", sd, pre)
    for i in range(cfg.vision.num_layers):
        _encoder_layer(t, f"vision_model/layers_{i}", sd,
                       f"{vm}.encoder.layers.{i}")
    _layer_norm(t, "vision_model/post_layernorm", sd, f"{vm}.post_layernorm")

    if "text_projection.weight" in sd:
        _dense(t, "text_projection", sd, "text_projection")
    if "visual_projection.weight" in sd:
        _dense(t, "visual_projection", sd, "visual_projection")


def _packed_mha(t: _Tree, dst: str, sd, src: str) -> None:
    """torch nn.MultiheadAttention packed qkv -> separate q/k/v + out."""
    w = sd[f"{src}.in_proj_weight"]
    b = sd.get(f"{src}.in_proj_bias")
    d = w.shape[1]
    for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
        t.set(f"{dst}/{name}/kernel", w[j * d:(j + 1) * d].T)
        if b is not None:
            t.set(f"{dst}/{name}/bias", b[j * d:(j + 1) * d])
    _dense(t, f"{dst}/out_proj", sd, f"{src}.out_proj")


def convert_hf_siglip_model(sd: Mapping[str, np.ndarray],
                            cfg: TransSegmentorConfig, t: _Tree) -> None:
    """`transformers.SiglipModel` keys -> SiglipTextTower/SiglipVisionTower
    (models/trans_segmentor/siglip.py). Differences from CLIP handled here:
    no class embedding, biased patch conv, per-tower `head` poolers (the
    text head Dense always converts; the vision attention-pooling head
    converts only when present in OUR tree — trans_seg runs use_head=False
    and task.init prunes elided tensors)."""
    tm = "text_model"
    t.set("text_model/token_embedding/embedding",
          sd[f"{tm}.embeddings.token_embedding.weight"])
    t.set("text_model/position_embedding/embedding",
          sd[f"{tm}.embeddings.position_embedding.weight"])
    for i in range(cfg.text.num_layers):
        _encoder_layer(t, f"text_model/layers_{i}", sd,
                       f"{tm}.encoder.layers.{i}")
    _layer_norm(t, "text_model/final_layer_norm", sd,
                f"{tm}.final_layer_norm")
    _dense(t, "text_model/head", sd, f"{tm}.head")

    vm = "vision_model"
    pw = sd[f"{vm}.embeddings.patch_embedding.weight"]   # (D, C, p, p)
    t.set("vision_model/patch_proj", pw.reshape(pw.shape[0], -1).T)
    t.set("vision_model/patch_bias",
          sd[f"{vm}.embeddings.patch_embedding.bias"])
    t.set("vision_model/position_embedding",
          sd[f"{vm}.embeddings.position_embedding.weight"])
    for i in range(cfg.vision.num_layers):
        _encoder_layer(t, f"vision_model/layers_{i}", sd,
                       f"{vm}.encoder.layers.{i}")
    _layer_norm(t, "vision_model/post_layernorm", sd, f"{vm}.post_layernorm")
    if f"{vm}.head.probe" in sd:
        t.set("vision_model/probe", sd[f"{vm}.head.probe"])
        _packed_mha(t, "vision_model/head_attn", sd, f"{vm}.head.attention")
        _layer_norm(t, "vision_model/head_layernorm", sd,
                    f"{vm}.head.layernorm")
        _dense(t, "vision_model/head_mlp_fc1", sd, f"{vm}.head.mlp.fc1")
        _dense(t, "vision_model/head_mlp_fc2", sd, f"{vm}.head.mlp.fc2")


def convert_trans_segmentor(sd: Mapping[str, np.ndarray],
                            cfg: TransSegmentorConfig) -> dict[str, Any]:
    """Full reference `TransformerSegmentor` state dict:
    encoder.model.* (CLIPModel or SiglipModel per cfg.encoder_family),
    encoder.text_projection (if fresh), decoder.transformer_decoder.
    layers.*, decoder.upsampler.*."""
    t = _Tree()
    enc = {k[len("encoder.model."):]: v for k, v in sd.items()
           if k.startswith("encoder.model.")}
    if cfg.encoder_family == "siglip":
        convert_hf_siglip_model(enc, cfg, t)
    else:
        convert_hf_clip_model(enc, cfg, t)
    # fresh (non-existing-proj) text projection lives on the encoder wrapper
    if "encoder.text_projection.weight" in sd:
        _dense(t, "text_projection", sd, "encoder.text_projection")

    for i in range(cfg.decoder_num_layers):
        src = f"decoder.transformer_decoder.layers.{i}"
        dst = f"decoder_layers_{i}"
        _torch_transformer_layer(t, dst, sd, src)  # maps self_attn/linears/norms
        # decoder layers additionally have multihead (cross) attention
        w = sd[f"{src}.multihead_attn.in_proj_weight"]
        b = sd.get(f"{src}.multihead_attn.in_proj_bias")
        d = w.shape[1]
        for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
            t.set(f"{dst}/multihead_attn/{name}/kernel", w[j * d:(j + 1) * d].T)
            if b is not None:
                t.set(f"{dst}/multihead_attn/{name}/bias", b[j * d:(j + 1) * d])
        _dense(t, f"{dst}/multihead_attn/out_proj", sd,
               f"{src}.multihead_attn.out_proj")
        _layer_norm(t, f"{dst}/norm3", sd, f"{src}.norm3")
    _layer_norm(t, "decoder_norm", sd, "decoder.transformer_decoder.norm")

    # upsampler: Sequential of blocks; each block = [Upsample, Conv2d, norm?,
    # act?] — conv at index 1, norm (if any) at index 2
    n = cfg.num_upsampler_layers
    for i in range(n - 1):
        t.set(f"upsampler/block{i}_conv/weight",
              sd[f"decoder.upsampler.{i}.1.weight"])
        if f"decoder.upsampler.{i}.1.bias" in sd:
            t.set(f"upsampler/block{i}_conv/bias",
                  sd[f"decoder.upsampler.{i}.1.bias"])
        if f"decoder.upsampler.{i}.2.weight" in sd:
            _layer_norm(t, f"upsampler/block{i}_norm", sd,
                        f"decoder.upsampler.{i}.2")
    t.set("upsampler/out_conv/weight", sd[f"decoder.upsampler.{n-1}.1.weight"])
    if f"decoder.upsampler.{n-1}.1.bias" in sd:
        t.set("upsampler/out_conv/bias", sd[f"decoder.upsampler.{n-1}.1.bias"])
    return t
