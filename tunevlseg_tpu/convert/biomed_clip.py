"""open_clip BiomedCLIP (CustomTextCLIP) checkpoint -> BiomedCLIP params.

Source layout: the state dict of `open_clip.create_model("hf-hub:microsoft/
BiomedCLIP-PubMedBERT_256-vit_base_patch16_224")` (reference loads it in
src/models/core_models/zero_shot_ris/custom_openclip.py:17-22):

  visual.trunk.*            timm vit_base_patch16_224 (fused qkv per block)
  visual.head.proj.*        open_clip TimmModel linear projection (no bias)
  text.transformer.*        HF BERT encoder (PubMedBERT)
  text.proj.{0,2}.*         open_clip HFTextEncoder mlp projection (no bias)

Same layout conventions as convert/clipseg.py (Linear transpose, LN
scale/bias, patch Conv2d flattened to a matmul weight); timm's fused
`attn.qkv` is split into our separate q/k/v projections.
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from tunevlseg_tpu.convert.clipseg import (_Tree, _dense, _layer_norm,
                                           torch_state_dict_to_numpy)
from tunevlseg_tpu.models.zero_shot_ris.biomed_clip import BiomedCLIPConfig


def _timm_block(tree: _Tree, dst: str, sd: Mapping[str, np.ndarray],
                src: str) -> None:
    _layer_norm(tree, f"{dst}/layer_norm1", sd, f"{src}.norm1")
    _layer_norm(tree, f"{dst}/layer_norm2", sd, f"{src}.norm2")
    qkv_w = sd[f"{src}.attn.qkv.weight"]  # (3D, D)
    d = qkv_w.shape[0] // 3
    for j, proj in enumerate(("q_proj", "k_proj", "v_proj")):
        tree.set(f"{dst}/self_attn/{proj}/kernel",
                 qkv_w[j * d:(j + 1) * d].T)
        if f"{src}.attn.qkv.bias" in sd:
            tree.set(f"{dst}/self_attn/{proj}/bias",
                     sd[f"{src}.attn.qkv.bias"][j * d:(j + 1) * d])
    _dense(tree, f"{dst}/self_attn/out_proj", sd, f"{src}.attn.proj")
    _dense(tree, f"{dst}/mlp/fc1", sd, f"{src}.mlp.fc1")
    _dense(tree, f"{dst}/mlp/fc2", sd, f"{src}.mlp.fc2")


def _bert_layer(tree: _Tree, dst: str, sd: Mapping[str, np.ndarray],
                src: str) -> None:
    for proj, name in (("q_proj", "query"), ("k_proj", "key"),
                       ("v_proj", "value")):
        _dense(tree, f"{dst}/self_attn/{proj}", sd,
               f"{src}.attention.self.{name}")
    _dense(tree, f"{dst}/self_attn/out_proj", sd,
           f"{src}.attention.output.dense")
    _layer_norm(tree, f"{dst}/layer_norm1", sd,
                f"{src}.attention.output.LayerNorm")
    _dense(tree, f"{dst}/mlp/fc1", sd, f"{src}.intermediate.dense")
    _dense(tree, f"{dst}/mlp/fc2", sd, f"{src}.output.dense")
    _layer_norm(tree, f"{dst}/layer_norm2", sd, f"{src}.output.LayerNorm")


def convert_biomed_clip(sd: Mapping[str, np.ndarray],
                        config: BiomedCLIPConfig) -> dict[str, Any]:
    """Convert an open_clip CustomTextCLIP state dict (numpy values)."""
    t = _Tree()

    # --- vision trunk (timm ViT) ---
    vt = "visual.trunk"
    t.set("visual/cls_token", sd[f"{vt}.cls_token"].reshape(-1))
    pos = sd[f"{vt}.pos_embed"]
    t.set("visual/position_embedding", pos.reshape(pos.shape[-2], -1))
    pw = sd[f"{vt}.patch_embed.proj.weight"]  # (D, C, p, p)
    t.set("visual/patch_proj", pw.reshape(pw.shape[0], -1).T)
    t.set("visual/patch_bias", sd[f"{vt}.patch_embed.proj.bias"])
    for i in range(config.vision.num_layers):
        _timm_block(t, f"visual/blocks_{i}", sd, f"{vt}.blocks.{i}")
    _layer_norm(t, "visual/norm", sd, f"{vt}.norm")
    t.set("visual_head/kernel", sd["visual.head.proj.weight"].T)

    # --- text tower (BERT) ---
    te = "text.transformer.embeddings"
    t.set("text_model/word_embedding/embedding",
          sd[f"{te}.word_embeddings.weight"])
    t.set("text_model/position_embedding",
          sd[f"{te}.position_embeddings.weight"])
    t.set("text_model/token_type_embedding",
          sd[f"{te}.token_type_embeddings.weight"])
    _layer_norm(t, "text_model/embed_norm", sd, f"{te}.LayerNorm")
    for i in range(config.text.num_layers):
        _bert_layer(t, f"text_model/layers_{i}", sd,
                    f"text.transformer.encoder.layer.{i}")
    t.set("text_proj_fc1/kernel", sd["text.proj.0.weight"].T)
    t.set("text_proj_fc2/kernel", sd["text.proj.2.weight"].T)
    return dict(t)


def load_biomedclip_checkpoint(path, config: BiomedCLIPConfig
                               ) -> dict[str, Any]:
    """Load a torch-saved open_clip state dict (.pt/.bin) and convert."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    return convert_biomed_clip(torch_state_dict_to_numpy(sd), config)
