#!/usr/bin/env python
"""MNIST smoke-training CLI — the template recipe the reference ships
configs for but no code (configs/model/mnist.yaml + configs/data/mnist.yaml
name `src.models.mnist_module` / `src.data.mnist_datamodule`, neither of
which exists in its src tree). This is the runnable counterpart with the
same hyperparameters: SimpleDenseNet 64/128/64, Adam lr 1e-3 wd 0,
ReduceLROnPlateau(factor 0.1, patience 10) on val loss, batch 128,
55k/5k/10k split.

    python scripts/train_mnist.py --data-dir <dir with MNIST idx files>
    python scripts/train_mnist.py --synthetic --epochs 3   # no data needed

`--data-dir` expects the standard IDX files (train-images-idx3-ubyte,
train-labels-idx1-ubyte, t10k-*), optionally .gz. One jitted train step
(CE loss + BatchNorm stats + Adam); accuracy reported per epoch.
"""
from __future__ import annotations

import argparse
import gzip
import struct
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def read_idx(path: Path) -> np.ndarray:
    """Parse an IDX-format array (the MNIST distribution format)."""
    opener = gzip.open if path.suffix == ".gz" else open
    with opener(path, "rb") as fp:
        zero, dtype_code, ndim = struct.unpack(">HBB", fp.read(4))
        assert zero == 0, f"bad IDX magic in {path}"
        dims = struct.unpack(">" + "I" * ndim, fp.read(4 * ndim))
        dt = {0x08: np.uint8, 0x09: np.int8, 0x0B: np.int16, 0x0C: np.int32,
              0x0D: np.float32, 0x0E: np.float64}[dtype_code]
        return np.frombuffer(fp.read(), dtype=np.dtype(dt).newbyteorder(">")
                             ).reshape(dims)


def load_mnist(data_dir: Path):
    def find(stem):
        for name in (stem, stem + ".gz"):
            p = data_dir / name
            if p.exists():
                return read_idx(p)
        raise FileNotFoundError(f"{stem}[.gz] not in {data_dir}")

    xtr = find("train-images-idx3-ubyte").astype(np.float32) / 255.0
    ytr = find("train-labels-idx1-ubyte").astype(np.int32)
    xte = find("t10k-images-idx3-ubyte").astype(np.float32) / 255.0
    yte = find("t10k-labels-idx1-ubyte").astype(np.int32)
    # reference normalization (torchvision MNIST transform mean/std)
    xtr = (xtr - 0.1307) / 0.3081
    xte = (xte - 0.1307) / 0.3081
    return (xtr, ytr), (xte, yte)


def synthetic_mnist(n=2048, seed=0):
    """Class-separable fake digits: class k lights a distinct 7x7 block
    pattern + noise, so a working net overfits quickly."""
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 10, n).astype(np.int32)
    x = rng.normal(0, 0.3, (n, 28, 28)).astype(np.float32)
    for k in range(10):
        r, c = divmod(k, 4)
        x[y == k, r * 7:(r + 1) * 7, c * 7:(c + 1) * 7] += 1.5
    return x, y


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", type=Path, default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--sizes", type=int, nargs=3, default=(64, 128, 64))
    ap.add_argument("--val-size", type=int, default=5000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from tunevlseg_tpu.models.simple_dense_net import SimpleDenseNet
    from tunevlseg_tpu.training.optim import ReduceLROnPlateau

    if args.synthetic or args.data_dir is None:
        x, y = synthetic_mnist()
        xte, yte = synthetic_mnist(512, seed=1)
        val = min(args.val_size, 256)
    else:
        (x, y), (xte, yte) = load_mnist(args.data_dir)
        val = args.val_size
    xtr, ytr = x[:-val], y[:-val]
    xva, yva = x[-val:], y[-val:]

    net = SimpleDenseNet(lin1_size=args.sizes[0], lin2_size=args.sizes[1],
                         lin3_size=args.sizes[2])
    variables = net.init(jax.random.PRNGKey(args.seed),
                         jnp.zeros((1, 28, 28)), train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)
    plateau = ReduceLROnPlateau(factor=0.1, patience=10, mode="min")
    lr_scale = 1.0

    @jax.jit
    def train_step(params, batch_stats, opt_state, scale, xb, yb):
        def loss_fn(p):
            logits, upd = net.apply({"params": p, "batch_stats": batch_stats},
                                    xb, train=True, mutable=["batch_stats"])
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()
            return ce, upd["batch_stats"]
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(
            jax.tree_util.tree_map(lambda g: g * scale, grads),
            opt_state, params)
        return optax.apply_updates(params, updates), new_stats, \
            opt_state, loss

    @jax.jit
    def eval_step(params, batch_stats, xb, yb):
        logits = net.apply({"params": params, "batch_stats": batch_stats},
                           xb, train=False)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, yb).mean()
        acc = (logits.argmax(-1) == yb).mean()
        return ce, acc

    rng = np.random.default_rng(args.seed)
    result = {}
    for epoch in range(args.epochs):
        order = rng.permutation(len(xtr))
        for lo in range(0, len(xtr) - args.batch + 1, args.batch):
            idx = order[lo:lo + args.batch]
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, lr_scale,
                jnp.asarray(xtr[idx]), jnp.asarray(ytr[idx]))
        vl, va = eval_step(params, batch_stats, jnp.asarray(xva),
                           jnp.asarray(yva))
        lr_scale = plateau.step(float(vl), lr_scale)
        print(f"epoch {epoch}: train_loss {float(loss):.4f} "
              f"val_loss {float(vl):.4f} val_acc {float(va):.4f} "
              f"lr_scale {lr_scale:g}", flush=True)
        result = {"val_loss": float(vl), "val_acc": float(va)}
    tl, ta = eval_step(params, batch_stats, jnp.asarray(xte),
                       jnp.asarray(yte))
    result.update(test_loss=float(tl), test_acc=float(ta))
    print(f"test_loss {result['test_loss']:.4f} "
          f"test_acc {result['test_acc']:.4f}", flush=True)
    return result


if __name__ == "__main__":
    main()
