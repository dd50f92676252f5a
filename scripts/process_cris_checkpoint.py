#!/usr/bin/env python
"""Strip a DDP/Lightning prefix from a CRIS checkpoint's state_dict keys.

Same contract as the reference scripts/process_cris_checkpoint.py: load the
checkpoint, verify every key starts with `<prefix>.`, drop the prefix, save
the bare state dict (loadable by `convert/cris.py:load_cris_checkpoint`).
"""
from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint_input_path")
    ap.add_argument("checkpoint_output_path")
    ap.add_argument("--prefix", default="model")
    ap.add_argument("--pickle-protocol", type=int, default=4)
    args = ap.parse_args()

    import torch

    ckpt = torch.load(args.checkpoint_input_path, map_location="cpu",
                      weights_only=False)
    state_dict = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    bad = [k for k in state_dict if not k.startswith(f"{args.prefix}.")]
    if bad:
        raise ValueError(
            f"invalid checkpoint: {len(bad)} keys lack prefix "
            f"'{args.prefix}.', e.g. {bad[:3]}")
    start = len(args.prefix) + 1
    torch.save({k[start:]: v for k, v in state_dict.items()},
               args.checkpoint_output_path,
               pickle_protocol=args.pickle_protocol)
    print(f"wrote {len(state_dict)} tensors to {args.checkpoint_output_path}")


if __name__ == "__main__":
    main()
