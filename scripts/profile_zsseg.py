"""Decompose the zsseg fused device program (~230 ms/img at alpha=1 —
zsbench): SOLOv2 backbone+heads fwd / solov2_inference (matrix NMS +
masked top-k) / mask downsample / masked-CLIP over P proposals / text
ensemble, each as a hardened in-jit scan probe (vary() guard, ITERS=25)
at the production shapes (rd64-dim CLIP, R101 FreeSOLO, 800², P=100).
The e2e number rides the noisy axon per-image dispatch; these rows are
device-program truth.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

IMG, ITERS, WINDOWS = 800, 25, 5


def vary(x, c):
    import jax.numpy as jnp

    pred = jnp.asarray(c, jnp.float32) < jnp.inf
    return jnp.where(pred, x, x + jnp.ones((), x.dtype))


def timed_scan(body, init, *consts, iters=ITERS, windows=WINDOWS, tag=""):
    import jax
    import jax.numpy as jnp

    def scanned(c, *consts):
        def step(c, _):
            return body(c, *consts), ()
        out, _ = jax.lax.scan(step, c, None, length=iters)
        return out

    j = jax.jit(scanned)
    out = j(init, *consts)
    float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
    ts = []
    for _ in range(windows):
        t0 = time.perf_counter()
        out = j(init, *consts)
        float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
        ts.append((time.perf_counter() - t0) / iters * 1e3)
    ms = float(np.median(ts))
    print(f"# {tag}: {ms:.2f} ms", flush=True)
    return ms


def tree_sum(tree):
    import jax
    import jax.numpy as jnp

    return sum(jnp.sum(l.astype(jnp.float32))
               for l in jax.tree_util.tree_leaves(tree)
               if hasattr(l, "dtype")
               and jnp.issubdtype(l.dtype, jnp.floating))


def main():
    import jax
    import jax.numpy as jnp

    from tunevlseg_tpu.config.composer import deep_merge
    from tunevlseg_tpu.models.clip.config import CLIPSegConfig
    from tunevlseg_tpu.models.solov2.model import (SOLOv2, SOLOv2Config,
                                                   preprocess_image,
                                                   solov2_inference)
    from tunevlseg_tpu.models.zero_shot_ris.model import (MaskedCLIP,
                                                          ZeroShotRIS)
    from tunevlseg_tpu.ops.image import _resize_matrix, resize_2d

    clip_cfg = CLIPSegConfig(
        text=CLIPSegConfig().text, vision=CLIPSegConfig().vision)
    solo_cfg = SOLOv2Config()
    rng = jax.random.PRNGKey(0)
    clip = MaskedCLIP(clip_cfg)
    clip_params = clip.init(rng, jnp.ones((1, 3, 224, 224)),
                            jnp.ones((1, 14, 14)), -3,
                            method=clip.get_image_features)["params"]
    text_params = clip.init(
        jax.random.PRNGKey(1), jnp.ones((2, 77), jnp.int32),
        jnp.ones((2, 77), jnp.int32),
        method=clip.get_text_features)["params"]
    clip_params = deep_merge(dict(text_params), clip_params)
    solo = SOLOv2(solo_cfg)
    solo_params = solo.init(rng, preprocess_image(
        jnp.ones((3, IMG, IMG)), solo_cfg))["params"]
    ris = ZeroShotRIS(clip_config=clip_cfg, solo_config=solo_cfg,
                      clip_params=clip_params, solo_params=solo_params,
                      alpha=1.0)

    nrng = np.random.default_rng(0)
    image = jnp.asarray(nrng.uniform(0, 255, (3, IMG, IMG)), jnp.float32)
    ids = nrng.integers(3, 1000, size=(2, 77)).astype(np.int32)
    ids[:, 0] = 49406
    ids[:, 12:] = 49407
    amask = (ids != 49407).astype(np.int32)
    idsj, amaskj = jnp.asarray(ids), jnp.asarray(amask)
    ori_hw = (IMG, IMG)
    rows = {}

    batched = preprocess_image(image, solo_cfg)
    print(f"# preprocessed {batched.shape}", flush=True)

    # 1. SOLOv2 backbone+heads fwd
    def solo_fwd(c, p, x):
        cate, kern, emb, mask_feats = solo.apply({"params": p}, vary(x, c))
        return c + tree_sum(cate) + tree_sum(kern) + tree_sum(emb) \
            + jnp.sum(mask_feats.astype(jnp.float32))

    rows["solo_fwd_ms"] = timed_scan(solo_fwd, jnp.zeros(()), solo_params,
                                     batched, tag="solo backbone+heads fwd")

    # 2. solov2_inference at fixed head outputs
    cate, kern, emb, mask_feats = jax.jit(
        lambda p, x: solo.apply({"params": p}, x))(solo_params, batched)
    cur_hw = batched.shape[-2:]

    def infer(c, cate, kern, emb, mf):
        out = solov2_inference(tuple(vary(t, c) for t in cate), kern, emb,
                               mf, solo_cfg, cur_hw, ori_hw)
        return c + sum(jnp.sum(o.astype(jnp.float32)) for o in out)

    rows["solov2_inference_ms"] = timed_scan(
        infer, jnp.zeros(()), cate, kern, emb, mask_feats,
        tag="solov2_inference (NMS+topk+mask assembly)")

    # proposals for the CLIP probes
    masks, boxes, scores, embs, valid = jax.jit(
        lambda p, x: ris._solo_forward(p, x, ori_hw))(solo_params, image)
    print(f"# proposals {masks.shape}", flush=True)

    # 3. mask downsample einsum
    size = ris.clip_image_size
    grid = size // clip_cfg.vision.patch_size
    rows_m = jnp.asarray(_resize_matrix(IMG, grid, "nearest"))
    cols_m = jnp.asarray(_resize_matrix(IMG, grid, "nearest"))

    def downsample(c, m):
        small = jnp.einsum("gh,phw,kw->pgk", rows_m,
                           vary(m, c).astype(jnp.float32), cols_m)
        return c + jnp.sum((small > 0.5).astype(jnp.float32))

    rows["mask_downsample_ms"] = timed_scan(downsample, jnp.zeros(()),
                                            masks, tag="mask downsample")

    small = jnp.einsum("gh,phw,kw->pgk", rows_m,
                       masks.astype(jnp.float32), cols_m)
    small = (small > 0.5).astype(jnp.float32)
    resized = resize_2d(image[None], (size, size), "bicubic")

    # 4. masked CLIP over P proposals
    def mclip(c, p, img224, sm):
        f = clip.apply({"params": p}, img224, vary(sm, c),
                       ris.masking_block_idx,
                       method=clip.get_image_features)
        return c + jnp.sum(f.astype(jnp.float32))

    rows["masked_clip_ms"] = timed_scan(
        mclip, jnp.zeros(()), clip_params, resized, small,
        tag=f"masked CLIP fwd (P={small.shape[0]})")

    # 5. text ensemble
    def text(c, p, i, a):
        f = clip.apply({"params": p}, vary(i, c), a,
                       method=clip.get_text_features)
        return c + tree_sum(f)

    rows["text_ms"] = timed_scan(text, jnp.zeros(()), clip_params, idsj,
                                 amaskj, tag="text ensemble")

    total = sum(v for k, v in rows.items() if k.endswith("_ms"))
    print(f"# bucket sum: {total:.1f} ms (zsbench device program ~230)",
          flush=True)
    print(json.dumps({"metric": f"profile_zsseg_{IMG}", **rows,
                      "sum_ms": total}), flush=True)


if __name__ == "__main__":
    main()
