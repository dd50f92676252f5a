"""Dev-time dump of REAL checkpoint key sets to committed JSON fixtures.

scripts/validate_pretrained.py's synthetic mode needs the exact key->shape
listing of the OpenAI CLIP RN50.pt and FreeSOLO_R101_30k.pt payloads, but
the reference modules that define those key sets may only be imported from
inside tests/ (project rule). This script regenerates
tests/fixtures/keysets/*.json from the reference modules — run it (rarely)
when the converter contract changes:

    python tests/dump_keysets.py

The CLIPSeg-rd64 and SigLIP-base key sets need no fixture: the pip-installed
`transformers` classes generate them directly in the validation script.
"""
import json
import sys
from pathlib import Path

import torch

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))

from tests.reference_oracle import REFERENCE, setup_solov2_imports  # noqa: E402
from tunevlseg_tpu.convert.clipseg import torch_state_dict_to_numpy  # noqa: E402

OUT = HERE / "fixtures" / "keysets"


def dump(name: str, sd: dict) -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    listing = {k: list(v.shape) for k, v in sd.items()}
    (OUT / f"{name}.json").write_text(json.dumps(listing, indent=0,
                                                 sort_keys=True))
    print(f"{name}: {len(listing)} keys -> {OUT / (name + '.json')}")


def main() -> None:
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))

    # OpenAI CLIP RN50 — hyperparameters build_model infers from RN50.pt
    from src.models.components.cris_model.clip import CLIP
    torch.manual_seed(0)
    clip = CLIP(1024, 224, (3, 4, 6, 3), 64, None, 77, 49408, 512, 8, 12)
    dump("clip_rn50", torch_state_dict_to_numpy(clip.state_dict()))

    # FreeSOLO R101 — the PseudoSOLOv2 whose state dict IS the checkpoint
    assert setup_solov2_imports()
    from src.models.core_models.solov2 import PseudoSOLOv2

    from tests.test_zero_shot_ris import tiny_solo_torch_cfg
    from tunevlseg_tpu.models.solov2.model import SOLOv2Config
    cfg = SOLOv2Config()
    torch.manual_seed(0)
    ref = PseudoSOLOv2(tiny_solo_torch_cfg(cfg, cfg.score_threshold)).eval()
    dump("freesolo_r101", torch_state_dict_to_numpy(ref.state_dict()))


if __name__ == "__main__":
    main()
