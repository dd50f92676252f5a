"""Logit-parity tests: tunevlseg_tpu CLIPSeg vs HF torch CLIPSeg.

Strategy: instantiate the torch `CLIPSegForImageSegmentation` with a tiny
RANDOM-initialized config, convert its state dict into our pytree, run both on
the same inputs, and require近-identical logits. This exercises every op in
the forward path (embeddings, attention, FiLM decoder, transposed conv,
position-embedding interpolation) without needing network access.
"""
import contextlib

import numpy as np
import pytest
import torch


@contextlib.contextmanager
def f64_default():
    """HF mask helpers call torch.full(finfo(f64).min) which overflows the
    f32 default dtype; switch the default for the oracle forward."""
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        yield
    finally:
        torch.set_default_dtype(prev)

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from transformers import CLIPSegConfig as HFCLIPSegConfig
from transformers import CLIPSegForImageSegmentation

from tunevlseg_tpu.convert.clipseg import (config_from_hf, convert_hf_clipseg,
                                           torch_state_dict_to_numpy)
from tunevlseg_tpu.models.clipseg.model import CLIPSegForSegmentation

TOL = 2e-4


def tiny_hf_config(complex_head=False, image_size=32):
    # NOTE: transformers defaults to the fused sdpa kernel whose CPU precision
    # is ~2e-3; our JAX attention matches f64 ground truth to ~1e-7, so parity
    # tests pin the oracle to eager attention.
    cfg = _tiny_hf_config_inner(complex_head, image_size)
    cfg._attn_implementation = "eager"
    return cfg


def _tiny_hf_config_inner(complex_head=False, image_size=32):
    return HFCLIPSegConfig(
        text_config={
            "vocab_size": 99, "hidden_size": 16, "num_hidden_layers": 4,
            "num_attention_heads": 2, "intermediate_size": 32,
            "max_position_embeddings": 77, "eos_token_id": 2,
        },
        vision_config={
            "hidden_size": 24, "num_hidden_layers": 4,
            "num_attention_heads": 2, "intermediate_size": 48,
            "patch_size": 16, "image_size": image_size,
        },
        projection_dim=20,
        reduce_dim=8,
        extract_layers=[1, 2, 3],
        decoder_num_attention_heads=2,
        decoder_intermediate_size=16,
        use_complex_transposed_convolution=complex_head,
    )


def make_torch_model(hf_cfg, seed=0):
    torch.manual_seed(seed)
    model = CLIPSegForImageSegmentation(hf_cfg).eval()
    return model


def make_inputs(hf_cfg, batch=2, img=32, seq=12, seed=1):
    rng = np.random.default_rng(seed)
    pixel = rng.normal(size=(batch, 3, img, img)).astype(np.float32)
    vocab = hf_cfg.text_config.vocab_size
    ids = rng.integers(3, vocab - 1, size=(batch, seq)).astype(np.int64)
    ids[:, 0] = 1  # BOS-ish
    lengths = [seq, seq - 3]
    mask = np.zeros((batch, seq), dtype=np.int64)
    for b, l in enumerate(lengths):
        mask[b, :l] = 1
        ids[b, l - 1] = vocab - 1  # EOT = highest id (legacy eos pooling)
        ids[b, l:] = 0
    return pixel, ids, mask


@pytest.mark.parametrize("complex_head", [False, True])
def test_e2e_clipseg_parity(complex_head):
    # f64 oracle: torch's oneDNN f32 kernel selection is process-state
    # dependent on this CPU (passes standalone, degrades after other suites)
    hf_cfg = tiny_hf_config(complex_head)
    tm = make_torch_model(hf_cfg).double()
    pixel, ids, mask = make_inputs(hf_cfg)

    with torch.no_grad(), f64_default():
        out = tm(input_ids=torch.tensor(ids),
                 pixel_values=torch.tensor(pixel, dtype=torch.float64),
                 attention_mask=torch.tensor(mask)).logits.numpy()

    cfg = config_from_hf(hf_cfg)
    params = convert_hf_clipseg(torch_state_dict_to_numpy(tm.state_dict()), cfg)
    model = CLIPSegForSegmentation(cfg)
    logits = model.apply({"params": params}, jnp.asarray(ids),
                         jnp.asarray(pixel), jnp.asarray(mask))
    got = np.asarray(logits)[:, 0]
    np.testing.assert_allclose(got, out, atol=TOL, rtol=1e-3)


def test_e2e_clipseg_parity_interpolated_positions():
    """Input resolution ≠ pretraining grid -> bicubic pos-emb interpolation."""
    hf_cfg = tiny_hf_config(image_size=32)
    tm = make_torch_model(hf_cfg).double()
    pixel, ids, mask = make_inputs(hf_cfg, img=64)

    with torch.no_grad(), f64_default():
        out = tm(input_ids=torch.tensor(ids),
                 pixel_values=torch.tensor(pixel, dtype=torch.float64),
                 attention_mask=torch.tensor(mask),
                 interpolate_pos_encoding=True).logits.numpy()

    cfg = config_from_hf(hf_cfg)
    params = convert_hf_clipseg(torch_state_dict_to_numpy(tm.state_dict()), cfg)
    model = CLIPSegForSegmentation(cfg)
    logits = model.apply({"params": params}, jnp.asarray(ids),
                         jnp.asarray(pixel), jnp.asarray(mask))
    got = np.asarray(logits)[:, 0]
    np.testing.assert_allclose(got, out, atol=5e-4, rtol=1e-3)
