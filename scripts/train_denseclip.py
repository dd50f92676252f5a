"""DenseCLIP training driver — the reference's mmseg recipe as a CLI.

The reference trains DenseCLIP through mmseg's runner with
denseclip_configs/denseclip_fpn_res50_512x512_80k.py (AdamW 1e-4, paramwise
backbone lr_mult 0.1 / frozen text encoder, poly 0.9 + 1500-iter warmup,
80k iters, crop 512, decode CE + 0.4 identity aux). mmseg is not vendored
in the reference repo either — this driver is the standalone equivalent
over `training/denseclip_task.py:DenseCLIPTask` (jitted, mesh-sharded).

Dataset layout (mmseg-style):
    root/images/{split}/*.jpg|png        RGB images
    root/annotations/{split}/*.png       uint8 class-index labels, 255=ignore
Class names: a text file, one name per line (tokenized with the DenseCLIP
vocab layout, reference denseclip/untils.py:100-109).

Smoke: `--synthetic --tiny --iters 20` needs no data/vocab.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-root", type=Path, default=None)
    ap.add_argument("--classes", type=Path, default=None,
                    help="text file, one class name per line")
    ap.add_argument("--vocab", type=Path, default=None,
                    help="CLIP BPE vocab (bpe_simple_vocab_16e6.txt.gz)")
    ap.add_argument("--out", type=Path, default=Path("logs/denseclip"))
    ap.add_argument("--iters", type=int, default=80_000)
    ap.add_argument("--warmup-iters", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--backbone", choices=("rn50", "rn101", "vitb16"),
                    default="rn50",
                    help="rn50 = denseclip_fpn_res50_512x512_80k recipe; "
                         "rn101 = denseclip_fpn_res101_512x512_80k "
                         "(layers (3,4,23,3), joint dim 512); "
                         "vitb16 = denseclip_fpn_vit-b_640x640_80k (crop "
                         "defaults to 640, drop_path 0.1)")
    ap.add_argument("--crop", type=int, default=None,
                    help="train crop (default: the recipe's, 512/640)")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--weight-decay", type=float, default=1e-4)
    ap.add_argument("--val-every", type=int, default=4000)
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--fsdp", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--accumulate", type=int, default=1)
    ap.add_argument("--spe", type=int, default=1,
                    help="steps-per-execution: lax.scan this many train "
                         "steps into one launch (amortizes the ~15 ms "
                         "per-launch dispatch on remote transports — "
                         "PERF_r04/profile_denseclip.log)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from <out>/checkpoints/last (mmseg "
                         "--resume-from): restores params + Adam state + "
                         "the iteration counter; the poly/warmup schedule "
                         "continues from the restored step")
    ap.add_argument("--synthetic", action="store_true",
                    help="random data (smoke test, no files needed)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config (smoke test)")
    args = ap.parse_args(argv)
    if args.classes is not None and args.vocab is None:
        ap.error("--classes requires --vocab (CLIP BPE merges file)")
    if not args.synthetic and args.data_root is None:
        ap.error("--data-root is required unless --synthetic")
    return args


def _list_pairs(root: Path, split: str):
    imgs = sorted((root / "images" / split).glob("*"))
    anns = {p.stem: p for p in (root / "annotations" / split).glob("*.png")}
    pairs = [(p, anns[p.stem]) for p in imgs if p.stem in anns]
    if not pairs:
        raise FileNotFoundError(f"no image/annotation pairs under {root} "
                                f"({split})")
    return pairs


def _load_crop(pair, crop: int, rng, train: bool):
    import cv2

    img = cv2.cvtColor(cv2.imread(str(pair[0])), cv2.COLOR_BGR2RGB)
    lab = cv2.imread(str(pair[1]), cv2.IMREAD_GRAYSCALE)
    h, w = lab.shape
    if min(h, w) < crop:  # pad with ignore
        ph, pw = max(0, crop - h), max(0, crop - w)
        img = cv2.copyMakeBorder(img, 0, ph, 0, pw, cv2.BORDER_CONSTANT, 0)
        lab = cv2.copyMakeBorder(lab, 0, ph, 0, pw, cv2.BORDER_CONSTANT,
                                 value=255)
        h, w = lab.shape
    if train:
        y = int(rng.integers(0, h - crop + 1))
        x = int(rng.integers(0, w - crop + 1))
        if rng.random() < 0.5:
            img, lab = img[:, ::-1], lab[:, ::-1]
    else:
        y, x = (h - crop) // 2, (w - crop) // 2
    img = img[y:y + crop, x:x + crop]
    lab = lab[y:y + crop, x:x + crop]
    return img.transpose(2, 0, 1).copy(), lab.astype(np.int32).copy()


def _batch(pairs, idxs, crop, rng, train):
    imgs, labs = zip(*[_load_crop(pairs[i], crop, rng, train) for i in idxs])
    return {"image": np.stack(imgs).astype(np.uint8),
            "label": np.stack(labs)}


def main(argv=None):
    args = parse_args(argv)
    import jax

    from tunevlseg_tpu.models.denseclip.model import (DenseCLIP,
                                                      DenseCLIPConfig)
    from tunevlseg_tpu.parallel import mesh as mesh_lib
    from tunevlseg_tpu.training.checkpoint import CheckpointManager
    from tunevlseg_tpu.training.denseclip_task import DenseCLIPTask
    from tunevlseg_tpu.utils.logging import get_logger

    log = get_logger("train_denseclip")
    rng = np.random.default_rng(args.seed)

    if args.tiny:
        cfg = (DenseCLIPConfig.tiny_vit(head_dropout=0.0)
               if args.backbone == "vitb16"
               else DenseCLIPConfig.tiny(
                   head_dropout=0.0,
                   # tiny rn101 keeps the deep-stage-3 + joint-dim-512
                   # structure at toy widths
                   **({"vision_layers": (1, 1, 2, 1), "embed_dim": 16}
                      if args.backbone == "rn101" else {})))
    elif args.backbone == "vitb16":
        cfg = DenseCLIPConfig.vitb16()  # ViT-B/16 640², the reference recipe
    elif args.backbone == "rn101":
        cfg = DenseCLIPConfig.rn101()  # RN101 512², (3,4,23,3), dim 512
    else:
        cfg = DenseCLIPConfig()  # RN50 512², the reference recipe

    # class token ids: reference tokenizes raw class names to the 13-token
    # budget (denseclip.py:100, untils.py:175)
    if args.classes is not None:
        from tunevlseg_tpu.data.tokenizer import CLIPTokenizer
        names = [ln.strip() for ln in
                 args.classes.read_text().splitlines() if ln.strip()]
        tok = CLIPTokenizer(str(args.vocab), vocab_layout="denseclip")
        class_ids = tok(names, max_length=cfg.text_context_length,
                        style="openai")["input_ids"]
        cfg = type(cfg)(**{**cfg.__dict__, "num_classes": len(names)})
    else:
        class_ids = rng.integers(
            1, cfg.vocab_size - 1,
            (cfg.num_classes, cfg.text_context_length)).astype(np.int32)
        class_ids[:, -1] = cfg.vocab_size - 1

    model = DenseCLIP(cfg, class_token_ids=class_ids, bn_train=True)
    task = DenseCLIPTask(
        model, learning_rate=args.lr, weight_decay=args.weight_decay,
        total_iters=args.iters, warmup_iters=args.warmup_iters,
        accumulate_grad_batches=args.accumulate, remat=args.remat,
        # ImageNet stats on uint8 batches (the reference's img_norm_cfg)
        image_stats=((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)))

    crop = (64 if args.tiny
            else args.crop if args.crop is not None
            else cfg.input_resolution)
    if args.synthetic:
        n = max(args.batch, 8)
        yy = np.mgrid[:crop, :crop][0]
        labs = ((yy // 16) % cfg.num_classes)[None].repeat(n, 0)
        synth = {"image": rng.integers(0, 255, (n, 3, crop, crop),
                                       dtype=np.uint8).astype(np.uint8),
                 "label": labs.astype(np.int32)}
        train_pairs = val_pairs = None
    else:
        train_pairs = _list_pairs(args.data_root, "training")
        val_pairs = _list_pairs(args.data_root, "validation")

    def next_batch(train=True):
        if args.synthetic:
            idx = rng.integers(0, synth["image"].shape[0], args.batch)
            return {k: v[idx] for k, v in synth.items()}
        pairs = train_pairs if train else val_pairs
        idx = rng.integers(0, len(pairs), args.batch)
        return _batch(pairs, idx, crop, rng, train)

    mesh = mesh_lib.make_mesh()
    batch0 = next_batch()
    # component converters (convert/denseclip.py) cover CLIP-pretrained
    # backbone/text/decoder weights; pass them via DenseCLIPTask.init(params=)
    # when wiring real pretrain files
    state, frozen = task.init(jax.random.PRNGKey(args.seed), batch0)
    ssh = task.state_fsdp_shardings(mesh, state) if args.fsdp else None
    if ssh is not None:
        state = jax.tree_util.tree_map(jax.device_put, state, ssh)
    else:
        state = mesh_lib.replicate(mesh, state)
    frozen = mesh_lib.replicate(mesh, frozen)
    train_step, eval_step = task.compile_steps(mesh, state_shardings=ssh)
    if args.spe > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        train_multi = task.compile_train_multistep(mesh, args.spe,
                                                   state_shardings=ssh)
        stacked_sh = NamedSharding(mesh, P(None, mesh_lib.DATA_AXIS))

    args.out.mkdir(parents=True, exist_ok=True)
    ckpt = CheckpointManager(args.out / "checkpoints", monitor="val_acc")
    metrics_path = args.out / "metrics.jsonl"
    it = 0
    if args.resume:
        if not (ckpt.dir / "last").exists():
            raise FileNotFoundError(f"--resume: no {ckpt.dir / 'last'}")
        state = ckpt.restore("last", state)
        meta = ckpt.load_meta("last")
        ckpt.best_value = meta.get("best_value")
        it = int(state.step)  # step increments per train_step (per batch)
        log.info("resumed at iter %d (best %s)", it, ckpt.best_value)
    last_t, last_it, last_val = time.perf_counter(), it, it
    while it < args.iters:
        if args.spe > 1:
            group = [next_batch() for _ in range(args.spe)]
            stacked = {k: jax.device_put(
                np.stack([b[k] for b in group]), stacked_sh)
                for k in group[0]}
            state, m = train_multi(state, frozen, stacked)
            it += args.spe
        else:
            sharded = mesh_lib.shard_batch(mesh, next_batch())
            state, m = train_step(state, frozen, sharded)
            it += 1
        if it <= args.spe:
            # drop the compile from the first throughput window
            float(m["loss"])
            last_t, last_it = time.perf_counter(), it
        if it - last_it >= args.log_every or it >= args.iters:
            m = {k: float(v) for k, v in m.items()}
            m["iter"] = it
            window = it - last_it
            m["imgs_per_sec"] = (round(
                window * args.batch / (time.perf_counter() - last_t), 2)
                if window else None)
            last_t, last_it = time.perf_counter(), it
            log.info("iter %d: %s", it, json.dumps(m))
            with metrics_path.open("a") as f:
                f.write(json.dumps(m) + "\n")
        if it - last_val >= args.val_every or it >= args.iters:
            last_val = it
            ev = eval_step(state, frozen,
                           mesh_lib.shard_batch(mesh, next_batch(False)))
            ev = {f"val_{k}": float(v) for k, v in ev.items()}
            log.info("iter %d: %s", it, json.dumps(ev))
            ckpt.maybe_save_best(state, ev, epoch=it)
    ckpt.save("last", state, {"iter": args.iters})
    ckpt.wait()
    final = {k: float(v) for k, v in m.items() if k != "iter"}
    print(json.dumps({"final": final, "ckpt": str(ckpt.dir)}))
    return final


if __name__ == "__main__":
    main()
