"""AOT model export for serving: jitted predict -> serialized StableHLO.

`jax.export` lowers the predict step ONCE and serializes the StableHLO +
calling convention to a single artifact; a server (or a later jax process —
potentially a different jax version, StableHLO is versioned) deserializes
and calls it without Python model code, config composition, or retracing.
Weights stay OUTSIDE the artifact (passed as call arguments) so one
executable serves any checkpoint of the family; shapes are static by
design (TPU serving wants fixed batch buckets — export one artifact per
bucket).

The reference has no deployment story (Lightning predict only); this is
the TPU-native equivalent of a TorchScript/ONNX export.

Usage:
  python scripts/export_model.py --family coop_clipseg --batch 8 \
      --img 352 --out exports/clipseg_b8.stablehlo [--tiny]
  # load + run:
  from jax import export
  exp = export.deserialize(Path(out).read_bytes())
  probs = exp.call(params, input_ids, image, attention_mask)
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def build(family: str, tiny: bool, strategy: str = "coop"):
    import jax.numpy as jnp

    from tunevlseg_tpu.models.clip.config import CLIPSegConfig
    from tunevlseg_tpu.models.presets import build_clipseg

    if family == "coop_clipseg":
        cfg = CLIPSegConfig.tiny() if tiny else None
        model, _ = build_clipseg(strategy, prompt_depth=3, num_context=4,
                                 config=cfg, dtype=jnp.bfloat16)
        seq = 77
    elif family == "coop_cris":
        from tunevlseg_tpu.models.cris.model import (CRISConfig,
                                                     CRISForSegmentation)
        cfg = CRISConfig.tiny() if tiny else CRISConfig()
        model = CRISForSegmentation(cfg, dtype=jnp.bfloat16)
        seq = 17 if not tiny else 12
    elif family == "trans_seg":
        from tunevlseg_tpu.models.trans_segmentor.model import (
            TransformerSegmentor, TransSegmentorConfig)
        cfg = (TransSegmentorConfig.tiny() if tiny
               else TransSegmentorConfig())
        model = TransformerSegmentor(cfg, dtype=jnp.bfloat16)
        seq = 77
    else:
        raise ValueError(f"unknown family {family}")
    return model, seq


def export_predict(model, batch: int, img: int, seq: int,
                   params=None, vocab: int = 49408):
    """Returns (exported, params): the serialized-ready Exported object for
    sigmoid(model(params, ids, image, mask)) and the init params used for
    shape inference (replace with converted/trained weights at call time)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    rng = np.random.default_rng(0)
    ids = np.full((batch, seq), 2, np.int32)
    ids[:, 0] = vocab - 2
    ids[:, -1] = vocab - 1
    ex_ids = jnp.asarray(ids)
    ex_img = jnp.asarray(rng.normal(size=(batch, 3, img, img)), jnp.float32)
    ex_mask = jnp.ones((batch, seq), jnp.int32)
    if params is None:
        params = model.init(jax.random.PRNGKey(0), ex_ids, ex_img, ex_mask)

    def predict(params, input_ids, image, attention_mask):
        logits = model.apply(params, input_ids, image, attention_mask)
        return jax.nn.sigmoid(logits.astype(jnp.float32))

    exported = jexport.export(jax.jit(predict))(
        params, ex_ids, ex_img, ex_mask)
    return exported, params


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--family", default="coop_clipseg",
                    choices=("coop_clipseg", "coop_cris", "trans_seg"))
    ap.add_argument("--strategy", default="coop")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--img", type=int, default=352)
    ap.add_argument("--seq", type=int, default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--out", type=Path, required=True)
    args = ap.parse_args(argv)

    model, seq = build(args.family, args.tiny, args.strategy)
    if args.tiny and args.family != "coop_cris":
        args.img = 32
    if args.tiny:
        seq = 12
    exported, _ = export_predict(model, args.batch, args.img,
                                 args.seq or seq)
    blob = exported.serialize()
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_bytes(blob)
    info = {"family": args.family, "batch": args.batch, "img": args.img,
            "seq": args.seq or seq, "bytes": len(blob),
            "platforms": list(exported.platforms),
            "n_inputs": len(exported.in_avals)}
    print(json.dumps(info))
    return info


if __name__ == "__main__":
    main()
