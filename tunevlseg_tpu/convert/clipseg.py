"""HF CLIPSeg (torch) checkpoint -> tunevlseg_tpu param pytree.

Consumes a flat `state_dict`-style mapping of numpy arrays (from
`torch_state_dict_to_numpy`, a safetensors file, or an HF model) and emits the
nested Flax params for `CLIPSegForSegmentation`.

Layout conventions converted here:
  * torch Linear weight (out, in)      -> flax Dense kernel (in, out): transpose
  * torch Embedding weight             -> flax Embed `embedding` (as-is)
  * torch LayerNorm weight/bias        -> flax `scale`/`bias`
  * Conv2d patch embedding (D,C,p,p)   -> `patch_proj` (C*p*p, D) matmul weight
  * Conv2d / ConvTranspose2d elsewhere -> kept in torch layout (our nn.conv
    wrappers store torch-layout weights)

Also handles the reference wrapper checkpoints (prefix `model.`, plus
`context_learner.*` / `additive_decoder_layer.*` / `residual_ratio` params;
reference: src/models/core_models/coop/base_clipseg.py:56-80).
"""
from __future__ import annotations

from typing import Any, Mapping, Optional

import numpy as np

from tunevlseg_tpu.models.clip.config import (CLIPSegConfig, CLIPTextConfig,
                                              CLIPVisionConfig)


def torch_state_dict_to_numpy(state_dict) -> dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        a = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        if a.dtype == np.float64:  # e.g. an f64 oracle model in tests
            a = a.astype(np.float32)
        out[k] = a
    return out


def config_from_hf(hf_config) -> CLIPSegConfig:
    """Build our static config from a `transformers.CLIPSegConfig`."""
    t, v = hf_config.text_config, hf_config.vision_config
    return CLIPSegConfig(
        text=CLIPTextConfig(
            vocab_size=t.vocab_size, hidden_size=t.hidden_size,
            num_layers=t.num_hidden_layers, num_heads=t.num_attention_heads,
            intermediate_size=t.intermediate_size,
            max_position_embeddings=t.max_position_embeddings,
            eos_token_id=t.eos_token_id, hidden_act=t.hidden_act,
            layer_norm_eps=t.layer_norm_eps),
        vision=CLIPVisionConfig(
            hidden_size=v.hidden_size, num_layers=v.num_hidden_layers,
            num_heads=v.num_attention_heads,
            intermediate_size=v.intermediate_size, patch_size=v.patch_size,
            image_size=v.image_size, num_channels=v.num_channels,
            hidden_act=v.hidden_act, layer_norm_eps=v.layer_norm_eps),
        projection_dim=hf_config.projection_dim,
        extract_layers=tuple(hf_config.extract_layers),
        reduce_dim=hf_config.reduce_dim,
        decoder_num_heads=hf_config.decoder_num_attention_heads,
        decoder_intermediate_size=hf_config.decoder_intermediate_size,
        conditional_layer=hf_config.conditional_layer,
        complex_transposed_convolution=hf_config.use_complex_transposed_convolution,
    )


class _Tree(dict):
    def set(self, path: str, value: np.ndarray) -> None:
        node = self
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value


def _dense(tree: _Tree, dst: str, sd: Mapping[str, np.ndarray], src: str) -> None:
    tree.set(f"{dst}/kernel", sd[f"{src}.weight"].T)
    if f"{src}.bias" in sd:
        tree.set(f"{dst}/bias", sd[f"{src}.bias"])


def _layer_norm(tree: _Tree, dst: str, sd, src: str) -> None:
    tree.set(f"{dst}/scale", sd[f"{src}.weight"])
    if f"{src}.bias" in sd:
        tree.set(f"{dst}/bias", sd[f"{src}.bias"])


def _encoder_layer(tree: _Tree, dst: str, sd, src: str) -> None:
    for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
        _dense(tree, f"{dst}/self_attn/{proj}", sd, f"{src}.self_attn.{proj}")
    _layer_norm(tree, f"{dst}/layer_norm1", sd, f"{src}.layer_norm1")
    _layer_norm(tree, f"{dst}/layer_norm2", sd, f"{src}.layer_norm2")
    _dense(tree, f"{dst}/mlp/fc1", sd, f"{src}.mlp.fc1")
    _dense(tree, f"{dst}/mlp/fc2", sd, f"{src}.mlp.fc2")


def convert_hf_clipseg(sd: Mapping[str, np.ndarray],
                       config: CLIPSegConfig) -> dict[str, Any]:
    """Convert a `CLIPSegForImageSegmentation` state dict (numpy values)."""
    t = _Tree()

    # --- text tower ---
    tm = "clip.text_model"
    t.set("text_model/token_embedding/embedding",
          sd[f"{tm}.embeddings.token_embedding.weight"])
    t.set("text_model/position_embedding/embedding",
          sd[f"{tm}.embeddings.position_embedding.weight"])
    for i in range(config.text.num_layers):
        _encoder_layer(t, f"text_model/layers_{i}", sd,
                       f"{tm}.encoder.layers.{i}")
    _layer_norm(t, "text_model/final_layer_norm", sd, f"{tm}.final_layer_norm")

    # --- vision tower ---
    vm = "clip.vision_model"
    t.set("vision_model/class_embedding", sd[f"{vm}.embeddings.class_embedding"])
    t.set("vision_model/position_embedding",
          sd[f"{vm}.embeddings.position_embedding.weight"])
    pw = sd[f"{vm}.embeddings.patch_embedding.weight"]  # (D, C, p, p)
    t.set("vision_model/patch_proj", pw.reshape(pw.shape[0], -1).T)
    _layer_norm(t, "vision_model/pre_layernorm", sd, f"{vm}.pre_layrnorm")
    for i in range(config.vision.num_layers):
        _encoder_layer(t, f"vision_model/layers_{i}", sd,
                       f"{vm}.encoder.layers.{i}")
    _layer_norm(t, "vision_model/post_layernorm", sd, f"{vm}.post_layernorm")

    # --- projections ---
    _dense(t, "text_projection", sd, "clip.text_projection")
    _dense(t, "visual_projection", sd, "clip.visual_projection")

    # --- decoder ---
    _dense(t, "decoder/film_mul", sd, "decoder.film_mul")
    _dense(t, "decoder/film_add", sd, "decoder.film_add")
    for i in range(len(config.extract_layers)):
        _dense(t, f"decoder/reduces_{i}", sd, f"decoder.reduces.{i}")
        _encoder_layer(t, f"decoder/layers_{i}", sd, f"decoder.layers.{i}")
    if config.complex_transposed_convolution:
        t.set("decoder/head_conv/weight", sd["decoder.transposed_convolution.0.weight"])
        t.set("decoder/head_conv/bias", sd["decoder.transposed_convolution.0.bias"])
        t.set("decoder/head_up1/weight", sd["decoder.transposed_convolution.2.weight"])
        t.set("decoder/head_up1/bias", sd["decoder.transposed_convolution.2.bias"])
        t.set("decoder/head_up2/weight", sd["decoder.transposed_convolution.4.weight"])
        t.set("decoder/head_up2/bias", sd["decoder.transposed_convolution.4.bias"])
    else:
        t.set("decoder/head_up/weight", sd["decoder.transposed_convolution.weight"])
        t.set("decoder/head_up/bias", sd["decoder.transposed_convolution.bias"])

    return t


def _mlp_projector(t: _Tree, dst: str, sd, src: str) -> None:
    """Reference `get_mlp_projection` Sequential -> MLPProjector names.

    Sequential indices: [Linear, ReLU]*k, Linear, (LayerNorm). Bare Linear
    (no Sequential, intermediate_dim=None) has params directly at `src`."""
    if f"{src}.weight" in sd:  # bare Linear
        _dense(t, f"{dst}/out", sd, src)
        return
    idxs = sorted({int(k[len(src) + 1:].split(".")[0])
                   for k in sd if k.startswith(f"{src}.")})
    linear_idxs = [i for i in idxs if f"{src}.{i}.weight" in sd
                   and sd[f"{src}.{i}.weight"].ndim == 2]
    norm_idxs = [i for i in idxs if f"{src}.{i}.weight" in sd
                 and sd[f"{src}.{i}.weight"].ndim == 1]
    for j, i in enumerate(linear_idxs[:-1]):
        _dense(t, f"{dst}/hidden_{j}", sd, f"{src}.{i}")
    _dense(t, f"{dst}/out", sd, f"{src}.{linear_idxs[-1]}")
    for i in norm_idxs:
        _layer_norm(t, f"{dst}/norm", sd, f"{src}.{i}")


def _torch_transformer_layer(t: _Tree, dst: str, sd, src: str) -> None:
    """torch.nn.TransformerEncoderLayer -> TorchTransformerEncoderLayer."""
    w = sd[f"{src}.self_attn.in_proj_weight"]
    b = sd.get(f"{src}.self_attn.in_proj_bias")
    d = w.shape[1]
    for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
        t.set(f"{dst}/self_attn/{name}/kernel", w[j * d:(j + 1) * d].T)
        if b is not None:
            t.set(f"{dst}/self_attn/{name}/bias", b[j * d:(j + 1) * d])
    _dense(t, f"{dst}/self_attn/out_proj", sd, f"{src}.self_attn.out_proj")
    _dense(t, f"{dst}/linear1", sd, f"{src}.linear1")
    _dense(t, f"{dst}/linear2", sd, f"{src}.linear2")
    _layer_norm(t, f"{dst}/norm1", sd, f"{src}.norm1")
    _layer_norm(t, f"{dst}/norm2", sd, f"{src}.norm2")


def convert_context_learner(sd: Mapping[str, np.ndarray], strategy: str,
                            prefix: str = "context_learner") -> dict[str, Any]:
    """Convert reference context-learner params -> our learner subtree."""
    t = _Tree()
    t.set("context_vectors", sd[f"{prefix}.context_vectors"])
    proj_srcs = sorted({int(k[len(prefix) + len(".projection_layers."):].split(".")[0])
                        for k in sd
                        if k.startswith(f"{prefix}.projection_layers.")})
    if strategy in ("cocoop", "maple"):
        for i in proj_srcs:
            _mlp_projector(t, f"proj_{i}", sd, f"{prefix}.projection_layers.{i}")
    elif strategy == "shared_separate":
        tp = sorted({int(k.split(".")[2]) for k in sd
                     if k.startswith(f"{prefix}.textual_projection_layers.")})
        for i in tp:
            _mlp_projector(t, f"text_proj_{i}", sd,
                           f"{prefix}.textual_projection_layers.{i}")
            _mlp_projector(t, f"visual_proj_{i}", sd,
                           f"{prefix}.visual_projection_layers.{i}")
    elif strategy == "shared_attn":
        for i in proj_srcs:
            _torch_transformer_layer(t, f"proj_{i}", sd,
                                     f"{prefix}.projection_layers.{i}")
    return t


def load_checkpoint_params(path: str, config: CLIPSegConfig,
                           strategy: Optional[str] = None) -> dict[str, Any]:
    """Load a torch checkpoint file (.pt/.pth/.bin/.safetensors) and convert.

    Handles both plain HF `CLIPSegForImageSegmentation` state dicts and the
    reference wrapper layout (`model.*` prefix + learner/head params), plus
    Lightning checkpoints (`state_dict` key, `net.` prefix stripped —
    reference scripts/process_cris_checkpoint.py semantics).
    """
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file
        sd = dict(load_file(path))
    else:
        import torch
        raw = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(raw, dict) and "state_dict" in raw:
            raw = raw["state_dict"]
        sd = torch_state_dict_to_numpy(raw)
    # strip common wrapper prefixes
    for prefix in ("net.", "module."):
        if all(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items()}
    if any(k.startswith("model.") for k in sd):
        return convert_reference_wrapper(sd, config, strategy)
    return convert_hf_clipseg(sd, config)


def convert_reference_wrapper(sd: Mapping[str, np.ndarray],
                              config: CLIPSegConfig,
                              strategy: Optional[str] = None) -> dict[str, Any]:
    """Convert a full reference wrapper state dict (BaseCLIPSeg subclass):
    `model.*` (HF CLIPSeg) + `context_learner.*` + additive-head params."""
    inner = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}
    params = convert_hf_clipseg(inner, config)
    if strategy is not None and any(k.startswith("context_learner.") for k in sd):
        params["learner"] = convert_context_learner(sd, strategy)
    if "residual_ratio" in sd:
        params["residual_ratio"] = sd["residual_ratio"]
    if "additive_decoder_layer.1.weight" in sd:
        params.setdefault("additive_head", {})["conv"] = {
            "weight": sd["additive_decoder_layer.1.weight"],
            "bias": sd["additive_decoder_layer.1.bias"],
        }
    return params
