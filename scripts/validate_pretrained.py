#!/usr/bin/env python
"""One-command pretrained-weight validation (VERDICT r4 #5).

The BASELINE north star (Dice parity <=1e-3 vs the reference on its
datasets) is structurally proven by full-key converters + f64 oracles, but
no real checkpoint file exists in this environment. This script is the
real-weight-day procedure: point it at the actual files and it runs every
converter, loads into the real-dimension models, and prints per-leg
key-coverage, structural-match, and logit-level parity results.

    python scripts/validate_pretrained.py \
        --clipseg  <CIDAS/clipseg-rd64-refined dir or 'synth'> \
        --clip-rn50 <RN50.pt or 'synth'> \
        --freesolo <FreeSOLO_R101_30k.pt or 'synth'> \
        --siglip   <google/siglip-base-patch16-224 dir or 'synth'>

Every leg accepts the literal value `synth`, which substitutes a
random-weight stand-in with the REAL checkpoint's exact key set:
  * clipseg / siglip: the pip-installed `transformers` classes whose
    `from_pretrained` produces those checkpoints (seeded random init) —
    these legs then ALSO verify f64 logit parity torch-vs-ours;
  * clip-rn50 / freesolo: random tensors shaped by
    tests/fixtures/keysets/*.json (dumped from the reference modules by
    tests/dump_keysets.py) — structural validation; their logit oracles
    live in tests/test_cris_parity.py / test_zero_shot_ris.py.
`--all synth` runs every leg synthetically (the plumbing proof CI can run
today). Exit code 0 iff every requested leg passes.

Reference checkpoint formats: SURVEY §5.4 (CIDAS safetensors, OpenAI
RN50.pt torchscript archive, detectron2 FreeSOLO payload, HF SigLIP dir).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Converters are host-side and the parity probes are tiny: run on CPU so the
# harness needs no chip (and never touches the fragile axon transport).
# TUNEVLSEG_VALIDATE_TPU=1 opts into the real device. Must precede backend
# init; the axon plugin ignores the JAX_PLATFORMS env var (CLAUDE.md).
if __name__ == "__main__" and (
        __import__("os").environ.get("TUNEVLSEG_VALIDATE_TPU", "0") != "1"):
    import jax
    jax.config.update("jax_platforms", "cpu")

KEYSETS = REPO / "tests" / "fixtures" / "keysets"


class TrackingDict(dict):
    """Records every key a converter reads, for coverage accounting."""

    def __init__(self, base):
        super().__init__(base)
        self.accessed: set[str] = set()

    def __getitem__(self, k):
        self.accessed.add(k)
        return super().__getitem__(k)

    def get(self, k, default=None):
        if k in self:
            self.accessed.add(k)
        return super().get(k, default)


def flat_paths(tree) -> dict[str, tuple]:
    from flax import traverse_util
    return {"/".join(map(str, k)): tuple(np.shape(v))
            for k, v in traverse_util.flatten_dict(tree).items()}


class LegResult:
    def __init__(self, name: str):
        self.name = name
        self.rows: list[str] = []
        self.ok = True

    def check(self, label: str, passed: bool, detail: str = "") -> None:
        self.ok &= bool(passed)
        mark = "PASS" if passed else "FAIL"
        self.rows.append(f"  [{mark}] {label}" + (f" — {detail}" if detail
                                                  else ""))

    def info(self, label: str) -> None:
        self.rows.append(f"  [info] {label}")

    def report(self) -> bool:
        print(f"== {self.name}: {'PASS' if self.ok else 'FAIL'}")
        for r in self.rows:
            print(r)
        return self.ok


def coverage(res: LegResult, sd: TrackingDict, ignorable: set[str]) -> None:
    unused = set(sd) - sd.accessed - ignorable
    res.check("key coverage",
              not unused,
              f"{len(sd.accessed)}/{len(sd)} consumed, "
              f"{len(ignorable & set(sd))} documented ignores"
              + (f", UNCONSUMED {sorted(unused)[:5]}" if unused else ""))


def structural(res: LegResult, label: str, converted, initialized,
               elided=lambda p: False) -> None:
    got, exp = flat_paths(converted), flat_paths(initialized)
    missing = sorted(set(exp) - set(got))
    extra = sorted(k for k in set(got) - set(exp) if not elided(k))
    mismatched = [k for k in exp if k in got and got[k] != exp[k]]
    ok = not (missing or extra or mismatched)
    detail = f"{len(exp)} leaves"
    if not ok:
        detail += (f", missing {missing[:3]}, extra {extra[:3]}, "
                   f"shape-mismatch {mismatched[:3]}")
    res.check(f"structural match ({label})", ok, detail)


# ---------------------------------------------------------------------------
# clipseg (CIDAS/clipseg-rd64-refined)
# ---------------------------------------------------------------------------


def leg_clipseg(path: str) -> LegResult:
    import torch
    import transformers

    import jax
    import jax.numpy as jnp

    from tunevlseg_tpu.convert.clipseg import (config_from_hf,
                                               convert_hf_clipseg,
                                               torch_state_dict_to_numpy)
    from tunevlseg_tpu.models.clipseg.model import CLIPSegForSegmentation

    res = LegResult(f"clipseg rd64 ({path})")
    if path == "synth":
        hf_cfg = transformers.CLIPSegConfig(
            text_config=dict(eos_token_id=2),
            vision_config=dict(patch_size=16, image_size=224),
            extract_layers=[3, 6, 9], reduce_dim=64,
            decoder_num_attention_heads=4, decoder_intermediate_size=2048,
            conditional_layer=0, use_complex_transposed_convolution=False)
        torch.manual_seed(0)
        hf = transformers.CLIPSegForImageSegmentation(hf_cfg)
    else:
        hf = transformers.CLIPSegForImageSegmentation.from_pretrained(path)
        hf_cfg = hf.config
    hf = hf.double().eval()
    cfg = config_from_hf(hf_cfg)
    sd = TrackingDict(torch_state_dict_to_numpy(hf.state_dict()))
    params = convert_hf_clipseg(sd, cfg)

    coverage(res, sd, {k for k in sd if k.endswith("position_ids")
                       or k == "clip.logit_scale"})

    model = CLIPSegForSegmentation(cfg)
    ids0 = jnp.ones((1, 77), jnp.int32)
    init = model.init(jax.random.PRNGKey(0), ids0,
                      jnp.zeros((1, 3, 352, 352), jnp.float32),
                      jnp.ones_like(ids0))

    def elided(p: str) -> bool:
        # vision tensors the seg forward never touches (task.init prunes)
        return (p.startswith("visual_projection/")
                or p.startswith("vision_model/post_layernorm")
                or (p.startswith("vision_model/layers_")
                    and int(p.split("/")[1].split("_")[1])
                    > max(cfg.extract_layers)))
    structural(res, "params", params, init["params"], elided)

    # f64 torch oracle vs our f32 logits on a fixed probe batch
    rng = np.random.default_rng(0)
    pix = rng.normal(size=(1, 3, 352, 352)).astype(np.float32)
    ids = rng.integers(3, 49000, size=(1, 77)).astype(np.int32)
    ids[:, 0] = 49406
    ids[:, 20:] = 49407
    am = (ids != 49407).astype(np.int32)
    am[:, 20] = 1
    # f64 default dtype so HF mask helpers (`torch.full(..., finfo.min)`)
    # don't overflow — same trick as tests/reference_oracle.run_reference
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        with torch.no_grad():
            ref = hf(input_ids=torch.tensor(ids.astype(np.int64)),
                     pixel_values=torch.tensor(pix, dtype=torch.float64),
                     attention_mask=torch.tensor(am.astype(np.int64))
                     ).logits.numpy()
    finally:
        torch.set_default_dtype(prev)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(ids),
                                 jnp.asarray(pix), jnp.asarray(am)),
                     np.float64).reshape(ref.shape)
    diff = float(np.max(np.abs(got - ref)))
    res.check("logit parity (f64 torch vs our f32)", diff < 5e-3,
              f"max|Δ|={diff:.2e} (tol 5e-3)")
    return res


# ---------------------------------------------------------------------------
# siglip (google/siglip-base-patch16-224)
# ---------------------------------------------------------------------------


def leg_siglip(path: str) -> LegResult:
    import torch
    import transformers

    import jax
    import jax.numpy as jnp

    from tunevlseg_tpu.convert.clipseg import (_Tree,
                                               torch_state_dict_to_numpy)
    from tunevlseg_tpu.convert.trans_segmentor import convert_hf_siglip_model
    from tunevlseg_tpu.models.trans_segmentor.model import TransSegmentorConfig
    from tunevlseg_tpu.models.trans_segmentor.siglip import (SiglipTextTower,
                                                             SiglipVisionTower)

    res = LegResult(f"siglip base ({path})")
    if path == "synth":
        torch.manual_seed(0)
        hf = transformers.SiglipModel(transformers.SiglipConfig())
    else:
        hf = transformers.SiglipModel.from_pretrained(path)
    hf = hf.double().eval()
    cfg = TransSegmentorConfig.siglip_base()
    sd = TrackingDict(torch_state_dict_to_numpy(hf.state_dict()))
    t = _Tree()
    convert_hf_siglip_model(sd, cfg, t)

    coverage(res, sd, {k for k in sd if k in ("logit_scale", "logit_bias")
                       or k.endswith("position_ids")})

    text = SiglipTextTower(cfg.text)
    vision = SiglipVisionTower(cfg.vision, use_head=True)
    ids = np.full((1, 16), 1, np.int32)
    ids[0, :6] = [5, 9, 3, 100, 7, 2]
    ids = jnp.asarray(ids)
    pix_np = np.random.default_rng(1).normal(
        size=(1, 3, cfg.vision.image_size, cfg.vision.image_size))
    ti = text.init(jax.random.PRNGKey(0), ids)
    vi = vision.init(jax.random.PRNGKey(0), jnp.asarray(pix_np, jnp.float32))
    structural(res, "text tower", t["text_model"], ti["params"])
    structural(res, "vision tower", t["vision_model"], vi["params"])

    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        with torch.no_grad():
            ref_t = hf.text_model(
                input_ids=torch.tensor(np.asarray(ids).astype(np.int64))
            ).pooler_output.numpy()
            ref_v = hf.vision_model(
                pixel_values=torch.tensor(pix_np, dtype=torch.float64)
            ).pooler_output.numpy()
    finally:
        torch.set_default_dtype(prev)
    _, got_t = text.apply({"params": t["text_model"]}, ids)
    _, _, got_v = vision.apply({"params": t["vision_model"]},
                               jnp.asarray(pix_np, jnp.float32))
    dt = float(np.max(np.abs(np.asarray(got_t, np.float64) - ref_t)))
    dv = float(np.max(np.abs(np.asarray(got_v, np.float64) - ref_v)))
    res.check("text pooled parity", dt < 2e-3, f"max|Δ|={dt:.2e} (tol 2e-3)")
    res.check("vision pooled parity", dv < 2e-3, f"max|Δ|={dv:.2e} (tol 2e-3)")
    return res


# ---------------------------------------------------------------------------
# OpenAI CLIP RN50 (CRIS backbone)
# ---------------------------------------------------------------------------


def _synth_sd_from_keyset(name: str) -> dict[str, np.ndarray]:
    listing = json.loads((KEYSETS / f"{name}.json").read_text())
    rng = np.random.default_rng(0)
    return {k: (rng.normal(scale=0.02, size=shape).astype(np.float32)
                if shape else np.float32(rng.normal()))
            for k, shape in listing.items()}


def leg_clip_rn50(path: str) -> LegResult:
    import jax
    import jax.numpy as jnp

    from tunevlseg_tpu.convert.clipseg import _Tree
    from tunevlseg_tpu.convert.cris import (config_from_clip_state_dict,
                                            convert_clip_backbone,
                                            torch_state_dict_to_numpy)
    from tunevlseg_tpu.models.cris.model import CRISForSegmentation

    res = LegResult(f"clip rn50 ({path})")
    if path == "synth":
        sd = TrackingDict(_synth_sd_from_keyset("clip_rn50"))
        res.info("synthetic tensors on the real RN50.pt key set "
                 "(tests/fixtures/keysets/clip_rn50.json); logit oracle "
                 "lives in tests/test_cris_parity.py")
    else:
        import torch
        try:  # RN50.pt ships as a torchscript archive
            raw = torch.jit.load(path, map_location="cpu").state_dict()
        except RuntimeError:
            raw = torch.load(path, map_location="cpu", weights_only=False)
        sd = TrackingDict(torch_state_dict_to_numpy(raw))

    cfg = config_from_clip_state_dict(sd)
    res.check("build_model shape inference",
              cfg.vision_layers == (3, 4, 6, 3) and cfg.vision_width == 64
              and cfg.embed_dim == 1024 and cfg.transformer_width == 512,
              f"vision_layers={cfg.vision_layers} embed_dim={cfg.embed_dim}")
    import dataclasses
    cfg = dataclasses.replace(cfg, img_size=224)
    params, state = _Tree(), _Tree()
    convert_clip_backbone(sd, cfg, params, state)

    coverage(res, sd, {k for k in sd if k.endswith("num_batches_tracked")
                       or k == "logit_scale"})

    model = CRISForSegmentation(cfg)
    ids = jnp.ones((1, 77), jnp.int32)
    init = model.init(jax.random.PRNGKey(0), ids,
                      jnp.zeros((1, 3, 224, 224), jnp.float32),
                      jnp.ones_like(ids))
    for tower in ("visual", "text"):
        structural(res, f"{tower} params", params[tower],
                   init["params"][tower])
        if tower in state and tower in init.get("batch_stats", {}):
            structural(res, f"{tower} batch_stats", state[tower],
                       init["batch_stats"][tower])
    return res


# ---------------------------------------------------------------------------
# FreeSOLO R101
# ---------------------------------------------------------------------------


def leg_freesolo(path: str) -> LegResult:
    import jax
    import jax.numpy as jnp

    from tunevlseg_tpu.convert.solov2 import convert_solov2
    from tunevlseg_tpu.models.solov2.model import SOLOv2, SOLOv2Config

    res = LegResult(f"freesolo r101 ({path})")
    cfg = SOLOv2Config()
    if path == "synth":
        sd = TrackingDict(_synth_sd_from_keyset("freesolo_r101"))
        res.info("synthetic tensors on the real FreeSOLO_R101_30k.pt key "
                 "set (tests/fixtures/keysets/freesolo_r101.json); "
                 "inference oracle lives in tests/test_zero_shot_ris.py")
    else:
        import torch

        from tunevlseg_tpu.convert.clipseg import torch_state_dict_to_numpy
        raw = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(raw, dict) and "model" in raw:
            raw = raw["model"]
        sd = TrackingDict(torch_state_dict_to_numpy(raw))

    params = convert_solov2(sd, cfg)
    coverage(res, sd, {k for k in sd if k in ("pixel_mean", "pixel_std")
                       or k.endswith("_iter")})

    model = SOLOv2(cfg)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 3, 64, 64), jnp.float32))
    structural(res, "params", params, init["params"])
    return res


# ---------------------------------------------------------------------------


LEGS = {"clipseg": leg_clipseg, "clip_rn50": leg_clip_rn50,
        "freesolo": leg_freesolo, "siglip": leg_siglip}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--clipseg", default=None,
                    help="CIDAS/clipseg-rd64-refined model dir, or 'synth'")
    ap.add_argument("--clip-rn50", dest="clip_rn50", default=None,
                    help="OpenAI RN50.pt path, or 'synth'")
    ap.add_argument("--freesolo", default=None,
                    help="FreeSOLO_R101_30k.pt path, or 'synth'")
    ap.add_argument("--siglip", default=None,
                    help="google/siglip-base-patch16-224 dir, or 'synth'")
    ap.add_argument("--all", dest="all_mode", default=None, metavar="synth",
                    help="run every leg with this source (only 'synth' "
                         "makes sense)")
    args = ap.parse_args(argv)

    requested = {name: getattr(args, name) or args.all_mode
                 for name in LEGS}
    requested = {k: v for k, v in requested.items() if v}
    if not requested:
        ap.error("nothing to validate — pass at least one leg or --all synth")

    ok = True
    for name, src in requested.items():
        t0 = time.time()
        try:
            leg = LEGS[name](src)
        except Exception as e:  # a crashed converter is a failed leg
            leg = LegResult(f"{name} ({src})")
            leg.check("converter ran", False, f"{type(e).__name__}: {e}")
        leg.info(f"{time.time() - t0:.1f}s")
        ok &= leg.report()
    print(f"\noverall: {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
