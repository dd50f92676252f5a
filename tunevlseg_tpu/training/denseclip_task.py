"""DenseCLIP training: jitted, mesh-sharded train/eval steps.

The reference trains DenseCLIP through mmseg's loop with the recipe in
denseclip_configs/denseclip_fpn_res50_512x512_80k.py:

  * AdamW lr 1e-4, weight_decay 1e-4;
  * paramwise groups: backbone lr_mult 0.1, text_encoder lr_mult 0.0
    (i.e. the text tower never updates — held in `frozen` here, so it
    carries no Adam state at all), norm params decay_mult 0.0;
  * poly lr schedule power 0.9 min_lr 1e-6 over 80k iters, linear warmup
    1500 iters ratio 1e-6;
  * loss: decode-head CE + identity-head aux at 0.4
    (models/denseclip/loss.py — see there for the mmseg CE semantics and
    the reference's identity-head input quirk).

Batch contract: {"image": (B, 3, H, W) f32 (pre-normalized) or uint8,
"label": (B, H, W) int32 with 255 = ignore}. Padded samples are expressed
as all-255 labels (zero loss mass) rather than a `valid` vector — the CE
normalizer counts pixels, not samples.

TPU-first deviations (documented, deliberate):
  * FPNHead norm is GroupNorm, not the reference's SyncBN — identical
    model quality class, but sync-free on a device mesh (no cross-chip BN
    collectives in the hot path);
  * backbone BN runs in torch train() mode via the `batch_stats` mutable
    collection when `bn_train` (the flax analogue of SyncBN's stats
    update); the stats update is per-shard, the weight gradients are
    globally psum-reduced by GSPMD as usual.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from tunevlseg_tpu.models.denseclip.loss import denseclip_losses
from tunevlseg_tpu.parallel import mesh as mesh_lib
from tunevlseg_tpu.training import optim as optim_lib
from tunevlseg_tpu.training.task import TrainState


def poly_warmup_schedule(base_lr: float, total_iters: int,
                         power: float = 0.9, min_lr: float = 1e-6,
                         warmup_iters: int = 1500,
                         warmup_ratio: float = 1e-6):
    """mmcv PolyLrUpdater with linear warmup: during warmup the regular
    poly lr is scaled by 1 - (1 - step/warmup_iters) * (1 - ratio)."""

    def fn(step):
        s = jnp.asarray(step, jnp.float32)
        frac = jnp.clip(s / total_iters, 0.0, 1.0)
        regular = (base_lr - min_lr) * (1.0 - frac) ** power + min_lr
        k = (1.0 - s / warmup_iters) * (1.0 - warmup_ratio)
        return jnp.where(s < warmup_iters, regular * (1.0 - k), regular)

    return fn


def _group_label(path: tuple, value) -> str:
    lr_group = "backbone" if path and path[0] == "backbone" else "base"
    return f"{lr_group}_{optim_lib.decay_label(path, value)}"


def make_denseclip_optimizer(schedule, weight_decay: float,
                             backbone_lr_mult: float = 0.1,
                             grad_clip_norm: Optional[float] = None):
    """AdamW with the reference's paramwise groups (lr_mult x decay)."""

    def adamw(mult, wd):
        return optax.adamw(lambda s: schedule(s) * mult, weight_decay=wd)

    tx = optax.multi_transform(
        {"backbone_decay": adamw(backbone_lr_mult, weight_decay),
         "backbone_no_decay": adamw(backbone_lr_mult, 0.0),
         "base_decay": adamw(1.0, weight_decay),
         "base_no_decay": adamw(1.0, 0.0)},
        lambda params: jax.tree_util.tree_map_with_path(
            lambda p, v: _group_label(
                tuple(getattr(k, "key", getattr(k, "idx", k)) for k in p), v),
            params),
    )
    if grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    return tx


@dataclasses.dataclass
class DenseCLIPTask:
    model: Any                          # models.denseclip.model.DenseCLIP
    learning_rate: float = 1e-4
    weight_decay: float = 1e-4
    backbone_lr_mult: float = 0.1
    total_iters: int = 80_000
    warmup_iters: int = 1500
    warmup_ratio: float = 1e-6
    power: float = 0.9
    min_lr: float = 1e-6
    grad_clip_norm: Optional[float] = None
    # Lightning-style accumulate_grad_batches (optax.MultiSteps); the poly
    # schedule advances per OPTIMIZER step, mmseg iteration semantics
    accumulate_grad_batches: int = 1
    # recompute activations during backward (jax.checkpoint)
    remat: bool = False
    # (mean, std) for on-device normalization of uint8 batches; None means
    # images arrive pre-normalized floats
    image_stats: Optional[tuple] = None
    donate_state: bool = True

    def __post_init__(self):
        self.schedule = poly_warmup_schedule(
            self.learning_rate, self.total_iters, self.power, self.min_lr,
            self.warmup_iters, self.warmup_ratio)
        self.tx = make_denseclip_optimizer(
            self.schedule, self.weight_decay, self.backbone_lr_mult,
            self.grad_clip_norm)
        if self.accumulate_grad_batches > 1:
            self.tx = optax.MultiSteps(
                self.tx, every_k_schedule=self.accumulate_grad_batches)
        self.mutable_collections = (
            ("batch_stats",) if getattr(self.model, "bn_train", False)
            else ())

    # -- init ---------------------------------------------------------------

    def init(self, rng: jax.Array, batch: dict,
             params: Optional[Any] = None) -> tuple[TrainState, Any]:
        """Returns (state, frozen). The text encoder (lr_mult 0.0 in the
        reference) lives in `frozen` — no gradients, no Adam state."""
        from tunevlseg_tpu.config.composer import deep_merge

        init_vars = dict(self.model.init(rng, self._prep_image(
            batch["image"])))
        random_params = dict(init_vars.pop("params"))
        if params is not None:
            params = deep_merge(random_params, dict(params))
        else:
            params = random_params
        trainable = {k: v for k, v in params.items() if k != "text_encoder"}
        frozen = {"params": {"text_encoder": params["text_encoder"]}}
        model_state = {k: init_vars.pop(k) for k in self.mutable_collections
                       if k in init_vars}
        frozen.update(init_vars)
        opt_state = self.tx.init(trainable)
        state = TrainState(jnp.zeros((), jnp.int32), trainable, opt_state,
                           jax.random.fold_in(rng, 1), model_state)
        return state, frozen

    # -- steps --------------------------------------------------------------

    def _prep_image(self, image):
        if image.dtype == jnp.uint8 and self.image_stats is not None:
            mean, std = self.image_stats
            mean = jnp.asarray(mean, jnp.float32).reshape(1, -1, 1, 1)
            std = jnp.asarray(std, jnp.float32).reshape(1, -1, 1, 1)
            return (image.astype(jnp.float32) / 255.0 - mean) / std
        return image

    def _merged(self, trainable, frozen):
        params = dict(trainable)
        params.update(frozen["params"])
        extras = {k: v for k, v in frozen.items() if k != "params"}
        return params, extras

    def _loss(self, trainable, model_state, frozen, batch, rng):
        from tunevlseg_tpu.training.task import SegmentationTask
        rng = SegmentationTask._dropout_rng(rng)  # RBG masks (task.py)
        params, extras = self._merged(trainable, frozen)
        variables = {"params": params, **extras, **model_state}
        kwargs = dict(deterministic=False, with_score_map=True,
                      rngs={"dropout": rng})
        if self.mutable_collections:
            (logits, score_map), updates = self.model.apply(
                variables, self._prep_image(batch["image"]),
                mutable=list(self.mutable_collections), **kwargs)
        else:
            logits, score_map = self.model.apply(
                variables, self._prep_image(batch["image"]), **kwargs)
            updates = {}
        c = self.model.config
        losses = denseclip_losses(logits, score_map, batch["label"],
                                  tau=c.tau,
                                  identity_weight=c.identity_weight)
        return losses["loss"], (losses, logits, updates)

    def train_step(self, state: TrainState, frozen, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        loss_fn = jax.checkpoint(self._loss) if self.remat else self._loss
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (losses, logits, new_model_state)), grads = grad_fn(
            state.trainable, state.model_state, frozen, batch, rng)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        model_state = (new_model_state if self.mutable_collections
                       else state.model_state)
        metrics = dict(losses)
        metrics["acc"] = pixel_accuracy(logits, batch["label"])
        return TrainState(state.step + 1, trainable, opt_state, state.rng,
                          model_state), metrics

    def eval_step(self, state: TrainState, frozen, batch):
        from tunevlseg_tpu.models.denseclip.loss import cross_entropy_seg

        params, extras = self._merged(state.trainable, frozen)
        logits = self.model.apply(
            {"params": params, **extras, **state.model_state},
            self._prep_image(batch["image"]))
        return {"loss": cross_entropy_seg(logits, batch["label"]),
                "acc": pixel_accuracy(logits, batch["label"])}

    # -- jit + sharding -----------------------------------------------------

    def state_fsdp_shardings(self, mesh: Mesh, state: TrainState):
        from tunevlseg_tpu.parallel import sharding_rules
        return sharding_rules.fsdp_shardings(state, mesh,
                                             report="denseclip state")

    def compile_steps(self, mesh: Mesh, frozen_shardings=None,
                      state_shardings=None):
        """`state_shardings`/`frozen_shardings` (e.g. from
        state_fsdp_shardings / parallel.sharding_rules.fsdp_shardings)
        shard params + Adam state + the frozen text tower over the data
        axis — FSDP for the full-finetune segmentor, where optimizer state
        dominates per-chip HBM."""
        repl = mesh_lib.replicated(mesh)
        fsh = repl if frozen_shardings is None else frozen_shardings
        ssh = repl if state_shardings is None else state_shardings
        train = jax.jit(self.train_step,
                        in_shardings=(ssh, fsh, None),
                        out_shardings=(ssh, repl),
                        donate_argnums=(0,) if self.donate_state else ())
        evals = jax.jit(self.eval_step,
                        in_shardings=(ssh, fsh, None),
                        out_shardings=repl)
        return train, evals

    def compile_train_multistep(self, mesh: Mesh, num_steps: int,
                                frozen_shardings=None, state_shardings=None):
        """One XLA executable running `num_steps` train steps via lax.scan
        (steps-per-execution), mirroring SegmentationTask. Takes batches
        stacked on a leading (num_steps, B, ...) axis sharded (None, data);
        returns metrics averaged over the scanned steps. On the remote-TPU
        transport the per-launch dispatch/sync alone measured ~15 ms/step —
        150 ms of the 258 ms single-launch DenseCLIP step
        (PERF_r04/profile_denseclip.log: fwd+bwd 107.5 ms vs step 257.7)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = mesh_lib.replicated(mesh)
        stacked = NamedSharding(mesh, P(None, mesh_lib.DATA_AXIS))
        fsh = repl if frozen_shardings is None else frozen_shardings
        ssh = repl if state_shardings is None else state_shardings

        def multi(state: TrainState, frozen, batches):
            def body(st, batch):
                return self.train_step(st, frozen, batch)

            state2, ms = jax.lax.scan(body, state, batches,
                                      length=num_steps)
            return state2, jax.tree_util.tree_map(
                lambda x: jnp.mean(x, axis=0), ms)

        return jax.jit(
            multi,
            in_shardings=(ssh, fsh, stacked),
            out_shardings=(ssh, repl),
            donate_argnums=(0,) if self.donate_state else (),
        )


def pixel_accuracy(logits: jnp.ndarray, labels: jnp.ndarray,
                   ignore_index: int = 255) -> jnp.ndarray:
    """mmseg aAcc over non-ignored pixels."""
    pred = jnp.argmax(logits.astype(jnp.float32), axis=1)
    valid = labels != ignore_index
    correct = jnp.where(valid, pred == labels, False)
    return correct.sum() / jnp.maximum(valid.sum(), 1)
