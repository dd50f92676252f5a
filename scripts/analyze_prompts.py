"""Learned-prompt embedding analysis — the reference's notebooks/ L9 layer
(TuneVLSeg_t_SNE*.ipynb, TuneVLSeg_UMAP*.ipynb) as a reproducible script.

Given one or more run directories (each holding checkpoints/ from the
Trainer), extracts every learned context tensor from the trainable tree,
projects the pooled vectors to 2D (PCA always; t-SNE when sklearn is
importable — UMAP is not installed in this image, PCA/t-SNE cover the same
visual question), decodes each context vector to its nearest CLIP vocabulary
tokens (the CoOp-paper "prompt interpretation" table the notebooks build),
and writes a scatter PNG + CSV per run.

Usage:
    python scripts/analyze_prompts.py RUN_DIR [RUN_DIR ...] --out analysis/
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def find_context_tensors(tree, prefix="") -> dict[str, np.ndarray]:
    """Flatten the trainable tree, keeping leaves that look like learned
    prompt contexts: path contains 'context' and shape is (depth, n, dim)
    or (n, dim)."""
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(find_context_tensors(v, f"{prefix}{k}/"))
        return out
    arr = np.asarray(tree)
    if "context" in prefix.lower() and arr.ndim in (2, 3):
        out[prefix.rstrip("/")] = arr
    return out


def pca_2d(x: np.ndarray) -> np.ndarray:
    x = x - x.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    return x @ vt[:2].T


def tsne_2d(x: np.ndarray):
    try:
        from sklearn.manifold import TSNE
    except Exception:
        return None
    perplexity = max(2, min(30, (len(x) - 1) // 3))
    if len(x) <= 3:
        return None
    return TSNE(n_components=2, perplexity=perplexity,
                init="pca", random_state=0).fit_transform(x)


def nearest_tokens(vectors: np.ndarray, embedding: np.ndarray,
                   k: int = 3) -> list[list[int]]:
    """Nearest vocabulary ids by euclidean distance (the notebooks' prompt
    interpretation step)."""
    # ||v - e||^2 = ||v||^2 - 2 v.e + ||e||^2
    d = (-2.0 * vectors @ embedding.T
         + (embedding ** 2).sum(axis=1)[None, :])
    return np.argsort(d, axis=1)[:, :k].tolist()


def load_run(run_dir: Path):
    """Restore the raw checkpoint pytrees (no template needed)."""
    import jax
    import orbax.checkpoint as ocp

    ckpt_dir = run_dir / "checkpoints"
    if not ckpt_dir.exists():
        ckpt_dir = run_dir  # allow pointing straight at checkpoints/
    ckptr = ocp.StandardCheckpointer()
    name = "best" if (ckpt_dir / "best").exists() else "last"
    state = ckptr.restore((ckpt_dir / name).resolve())
    frozen = None
    if (ckpt_dir / "frozen").exists():
        frozen = ckptr.restore((ckpt_dir / "frozen").resolve())
    return jax.tree_util.tree_map(np.asarray, state), frozen


def find_token_embedding(frozen) -> np.ndarray | None:
    stack = [frozen or {}]
    while stack:
        node = stack.pop()
        if not isinstance(node, dict):
            continue
        for k, v in node.items():
            if k == "token_embedding" and isinstance(v, dict) \
                    and "embedding" in v:
                return np.asarray(v["embedding"])
            stack.append(v)
    return None


def analyze(run_dirs: list[Path], out_dir: Path, decode_tokens: bool = True):
    out_dir.mkdir(parents=True, exist_ok=True)
    groups: dict[str, np.ndarray] = {}
    reports = []
    for run in run_dirs:
        state, frozen = load_run(run)
        trainable = state.get("trainable", state)
        ctxs = find_context_tensors(trainable)
        emb = find_token_embedding(frozen) if decode_tokens else None
        for path, arr in ctxs.items():
            flat = arr.reshape(-1, arr.shape[-1])
            label = f"{run.name}:{path}"
            groups[label] = flat
            rec = {"run": str(run), "tensor": path,
                   "shape": list(arr.shape),
                   "norm_mean": float(np.linalg.norm(flat, axis=1).mean())}
            if emb is not None and emb.shape[1] == flat.shape[1]:
                rec["nearest_token_ids"] = nearest_tokens(flat, emb)
            reports.append(rec)

    (out_dir / "contexts.json").write_text(json.dumps(reports, indent=2))

    if groups:
        all_vecs = np.concatenate(list(groups.values()), axis=0)
        labels = np.concatenate([
            np.full(len(v), i) for i, v in enumerate(groups.values())])
        proj = {"pca": pca_2d(all_vecs)}
        ts = tsne_2d(all_vecs)
        if ts is not None:
            proj["tsne"] = ts
        for method, xy in proj.items():
            np.savetxt(out_dir / f"{method}.csv",
                       np.column_stack([xy, labels]), delimiter=",",
                       header="x,y,group", comments="")
            try:
                import matplotlib
                matplotlib.use("Agg")
                import matplotlib.pyplot as plt
                fig, ax = plt.subplots(figsize=(6, 5))
                for i, name in enumerate(groups):
                    m = labels == i
                    ax.scatter(xy[m, 0], xy[m, 1], s=12, label=name[:40])
                ax.legend(fontsize=6)
                ax.set_title(f"learned prompt contexts ({method})")
                fig.savefig(out_dir / f"{method}.png", dpi=120,
                            bbox_inches="tight")
                plt.close(fig)
            except Exception:
                pass
    return reports


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+", type=Path)
    ap.add_argument("--out", type=Path, default=Path("analysis"))
    ap.add_argument("--no-decode", action="store_true")
    args = ap.parse_args()
    reports = analyze(args.runs, args.out, decode_tokens=not args.no_decode)
    print(f"analyzed {len(reports)} context tensors -> {args.out}")


if __name__ == "__main__":
    main()
