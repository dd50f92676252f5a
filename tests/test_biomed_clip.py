"""BiomedCLIP (CustomOpenCLIP) parity tests.

The oracle is the REFERENCE wrapper itself
(src/models/core_models/zero_shot_ris/custom_openclip.py) driven over a
hand-built torch stub that replicates the open_clip/timm module layout
(timm ViT trunk with fused qkv + open_clip heads + a REAL HF BertModel text
encoder) — open_clip/timm are not installed, so `open_clip.create_model` is
stubbed to return it, exactly as reference_oracle stubs monai/lightning.
The reference's own masked-block control flow then runs over the stub, and
our Flax BiomedCLIP must match in f32 against the f64 oracle.
"""
import sys
from collections import OrderedDict

import numpy as np
import pytest
import torch
from torch import nn as tnn

import jax
import jax.numpy as jnp

from tests.reference_oracle import reference_available, setup_solov2_imports
from tunevlseg_tpu.convert.biomed_clip import convert_biomed_clip
from tunevlseg_tpu.convert.clipseg import torch_state_dict_to_numpy
from tunevlseg_tpu.models.zero_shot_ris.biomed_clip import (BiomedCLIP,
                                                            BiomedCLIPConfig)

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")

CFG = BiomedCLIPConfig.tiny()


# --- torch stub of the open_clip CustomTextCLIP module layout --------------

class _TimmAttention(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.num_heads = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):
        b, n, c = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.num_heads,
                                  c // self.num_heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        x = (attn.softmax(dim=-1) @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(x)


class _TimmMlp(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = tnn.Linear(dim, hidden)
        self.act = tnn.GELU()
        self.fc2 = tnn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class _TimmBlock(tnn.Module):
    def __init__(self, dim, heads, mlp_hidden, eps=1e-6):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=eps)
        self.attn = _TimmAttention(dim, heads)
        self.norm2 = tnn.LayerNorm(dim, eps=eps)
        self.mlp = _TimmMlp(dim, mlp_hidden)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class _PatchEmbed(tnn.Module):
    def __init__(self, patch, dim):
        super().__init__()
        self.patch_size = (patch, patch)
        self.proj = tnn.Conv2d(3, dim, patch, stride=patch)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)


class _Trunk(tnn.Module):
    """timm VisionTransformer surface used by the reference wrapper."""

    grad_checkpointing = False

    def __init__(self, c):
        super().__init__()
        self.patch_embed = _PatchEmbed(c.patch_size, c.hidden_size)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, c.hidden_size) * 0.02)
        n = (c.image_size // c.patch_size) ** 2 + 1
        self.pos_embed = tnn.Parameter(torch.randn(1, n, c.hidden_size) * 0.02)
        self.patch_drop = tnn.Identity()
        self.norm_pre = tnn.Identity()
        self.blocks = tnn.Sequential(*[
            _TimmBlock(c.hidden_size, c.num_heads, c.intermediate_size,
                       c.layer_norm_eps) for _ in range(c.num_layers)])
        self.norm = tnn.LayerNorm(c.hidden_size, eps=c.layer_norm_eps)

    def _pos_embed(self, x):
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        return torch.cat((cls, x), dim=1) + self.pos_embed

    def forward_head(self, x):
        return x[:, 0]  # global_pool='token'; fc_norm/head are identity


class _Visual(tnn.Module):
    def __init__(self, c, proj_dim):
        super().__init__()
        self.trunk = _Trunk(c)
        self.image_size = c.image_size
        self.head = tnn.Sequential(OrderedDict(
            drop=tnn.Dropout(0.0),
            proj=tnn.Linear(c.hidden_size, proj_dim, bias=False)))

    def forward(self, x):
        return self.head(self.trunk.forward_head(self.trunk.norm(x)))


class _Text(tnn.Module):
    """open_clip HFTextEncoder: BERT + cls pooler + mlp proj (no bias)."""

    def __init__(self, c, proj_dim, proj_hidden):
        super().__init__()
        from transformers import BertConfig, BertModel

        self.pad_id = c.pad_token_id
        self.transformer = BertModel(BertConfig(
            vocab_size=c.vocab_size, hidden_size=c.hidden_size,
            num_hidden_layers=c.num_layers,
            num_attention_heads=c.num_heads,
            intermediate_size=c.intermediate_size,
            max_position_embeddings=c.max_position_embeddings,
            type_vocab_size=c.type_vocab_size,
            layer_norm_eps=c.layer_norm_eps,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            pad_token_id=c.pad_token_id,
            attn_implementation="eager"), add_pooling_layer=False)
        self.proj = tnn.Sequential(
            tnn.Linear(c.hidden_size, proj_hidden, bias=False),
            tnn.GELU(),
            tnn.Linear(proj_hidden, proj_dim, bias=False))

    def forward(self, x):
        attn_mask = (x != self.pad_id).long()
        out = self.transformer(input_ids=x, attention_mask=attn_mask)
        return self.proj(out.last_hidden_state[:, 0])


class _StubCLIP(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.visual = _Visual(cfg.vision, cfg.projection_dim)
        self.text = _Text(cfg.text, cfg.projection_dim, cfg.text_proj_hidden)


def _make_oracle(seed=0):
    assert setup_solov2_imports()
    torch.manual_seed(seed)
    stub = _StubCLIP(CFG).eval()
    oc = sys.modules["open_clip"]
    oc.create_model = lambda *a, **k: stub
    oc.CustomTextCLIP = _StubCLIP
    from src.models.core_models.zero_shot_ris.custom_openclip import (
        CustomOpenCLIP)
    oracle = CustomOpenCLIP("stub-biomedclip").double().eval()
    return oracle, stub


@pytest.fixture(scope="module")
def oracle_and_params():
    oracle, stub = _make_oracle()
    params = convert_biomed_clip(
        torch_state_dict_to_numpy(stub.state_dict()), CFG)
    return oracle, params


def test_text_features_parity(oracle_and_params, rng):
    oracle, params = oracle_and_params
    ids = rng.integers(4, CFG.text.vocab_size - 1, size=(2, 10))
    ids[:, 0] = 2          # [CLS]-like
    ids[0, 7:] = 0         # padding (pad_token_id 0)
    ids = ids.astype(np.int64)

    with torch.no_grad():
        ref = oracle.get_text_features(torch.tensor(ids)).numpy()

    model = BiomedCLIP(CFG)
    ours = model.apply({"params": params}, jnp.asarray(ids, jnp.int32),
                       method=model.get_text_features)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-5, rtol=1e-4)


def test_image_features_parity_unmasked(oracle_and_params, rng):
    oracle, params = oracle_and_params
    pix = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)

    with torch.no_grad():
        ref = oracle.get_image_features(
            torch.tensor(pix, dtype=torch.float64)).numpy()

    model = BiomedCLIP(CFG)
    ours = model.apply({"params": params}, jnp.asarray(pix),
                       method=model.get_image_features)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("block_idx", [-2, 1])
def test_image_features_parity_masked(oracle_and_params, rng, block_idx):
    """Masked path: proposals become the batch from masking_block_idx on.
    (block_idx=None with masks is untested: torch's `blocks[None:]` slices
    the WHOLE list, so the reference would run every block twice — a
    degenerate path no reference config reaches; default is -3.)"""
    oracle, params = oracle_and_params
    pix = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    grid = 32 // CFG.vision.patch_size
    masks = (rng.random((3, grid, grid)) > 0.4).astype(np.float32)

    with torch.no_grad():
        ref = oracle.get_image_features(
            torch.tensor(pix, dtype=torch.float64),
            torch.tensor(masks, dtype=torch.float64),
            block_idx).numpy()

    model = BiomedCLIP(CFG)
    ours = model.apply({"params": params}, jnp.asarray(pix),
                       jnp.asarray(masks), block_idx,
                       method=model.get_image_features)
    assert np.asarray(ours).shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-5, rtol=1e-4)


def test_wordpiece_tokenizer(tmp_path):
    from tunevlseg_tpu.data.tokenizer import WordPieceTokenizer

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "thing", "poly",
             "##p", "red", "car", "."]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab))
    tok = WordPieceTokenizer(tmp_path / "vocab.txt")
    ids = tok.encode("A polyp.")
    # [CLS] a poly ##p . [SEP]
    assert ids == [2, 4, 6, 7, 10, 3]
    out = tok(["a thing", "zzz"], max_length=8)
    assert out["input_ids"].shape == (2, 8)
    np.testing.assert_array_equal(out["input_ids"][0],
                                  [2, 4, 5, 3, 0, 0, 0, 0])
    assert out["input_ids"][1][1] == tok.unk_token_id
    np.testing.assert_array_equal(out["attention_mask"][0],
                                  [1, 1, 1, 1, 0, 0, 0, 0])


def test_eval_zeroshot_biomedclip_cli(tmp_path):
    """experiment=zsseg_biomedclip end-to-end: BiomedCLIP variant + WordPiece
    tokenizer through the zero-shot driver (tiny models, random weights)."""
    import json
    import cv2
    from tunevlseg_tpu import eval_zeroshot
    from tunevlseg_tpu.config.composer import compose
    from tunevlseg_tpu.train import CONFIG_DIR

    cfg = compose(CONFIG_DIR, "eval_zeroshot",
                  ["experiment=zsseg_biomedclip", "ds_name=x",
                   "vocab_path=/dev/null"])
    assert cfg["model"]["is_hf_model"] is False
    assert cfg["max_length"] == 256

    root = tmp_path / "data" / "zsds"
    (root / "images").mkdir(parents=True)
    (root / "masks").mkdir()
    (root / "anns").mkdir()
    rng = np.random.default_rng(0)
    tasks = []
    for i in range(2):
        cv2.imwrite(str(root / "images" / f"{i}.png"),
                    rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
        cv2.imwrite(str(root / "masks" / f"{i}.png"),
                    np.full((64, 64), 255, np.uint8))
        tasks.append({"img_name": f"{i}.png", "mask_name": f"{i}.png",
                      "prompts": {"p0": "a thing"},
                      "object_class": "thing"})
    (root / "anns" / "test.json").write_text(json.dumps(tasks))
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "thing", "."]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab))

    result = eval_zeroshot.main([
        "experiment=zsseg_biomedclip",
        "ds_name=zsds",
        f"paths.data_root={tmp_path / 'data'}",
        f"paths.log_dir={tmp_path / 'logs'}",
        f"vocab_path={tmp_path / 'vocab.txt'}",
        "+tiny_model=true",
        "img_size=64",
        "max_length=16",
        "model.cache_dir=null",
    ])
    assert "test_dice" in result
