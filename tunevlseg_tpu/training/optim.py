"""Optimizer construction: trainable/frozen partition, decay/no-decay groups,
and host-side LR schedulers.

Mirrors the reference exactly:
  * learnability flags (freeze_all / freeze_encoder / freeze_decoder /
    no_freeze_last_layer / use_new_last_layer + always-trainable context
    learner) — reference base_clipseg.py:44-80, hf_clipseg_wrapper.py:32-33;
  * GPT-style decay/no-decay split: Linear/Conv weights and `*proj_weight`
    decay; biases, Embedding/Norm weights, bare parameters do not —
    reference image_text_mask_module.py:304-361;
  * torch AdamW semantics (optax.adamw is the same decoupled formulation);
  * `ReduceLROnPlateau` re-implemented host-side, driving the lr through
    `optax.inject_hyperparams` — reference configs/model/coop/clipseg.yaml:45-51.

TPU design: frozen params are split OUT of the differentiated pytree, so XLA
never materializes their gradients and the optimizer holds no state for them
(a prompt-tuning step's optimizer state is a few KB instead of ~600MB).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Mapping, Optional

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util


# ---------------------------------------------------------------------------
# partitioning
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FreezeSpec:
    """Which parameters train (reference base_clipseg.py:44-80)."""

    freeze_all: bool = True
    freeze_encoder: bool = False
    freeze_decoder: bool = False
    no_freeze_last_layer: bool = False
    use_new_last_layer: bool = False
    complex_head: bool = False
    family: str = "clipseg"  # "clipseg" | "cris" | "trans_segmentor"
    always_trainable: tuple = ()  # top-level param keys trained regardless

    def _last_layer_paths(self) -> tuple[tuple[str, ...], ...]:
        if self.family == "cris":
            # unfreeze proj.txt + proj.vis[-1] (coop_cris.py:89-94)
            return (("proj", "txt"), ("proj", "vis_4"))
        return ((("decoder", "head_up2") if self.complex_head
                 else ("decoder", "head_up")),)

    def path_trainable(self, path: tuple[str, ...]) -> bool:
        top = path[0]
        if top == "learner" or top in self.always_trainable:
            return True
        if self.family == "trans_segmentor":
            # encoders (+ pretrained projections) gate on freeze_encoder;
            # decoder/upsampler always train (encoder.py:216-223)
            if top in ("text_model", "vision_model", "text_projection",
                       "visual_projection"):
                return not self.freeze_encoder
            return True
        if top in ("additive_head", "additive_conv1", "additive_conv2",
                   "residual_ratio"):
            # exist only when use_new_last_layer; trainable then
            return True
        if self.freeze_all:
            if self.no_freeze_last_layer and not self.use_new_last_layer:
                return any(path[:len(p)] == p
                           for p in self._last_layer_paths())
            return False
        if self.family == "cris":
            # CRIS e2e: backbone frozen by freeze_encoder; head trains
            if top in ("visual", "text"):
                return not self.freeze_encoder
            return True
        if top == "decoder":
            return not self.freeze_decoder
        return not self.freeze_encoder  # towers + projections ("clip")


def partition_params(params: Mapping[str, Any], spec: FreezeSpec):
    """Split params into (trainable, frozen) trees with identical structure
    (non-selected leaves = None) so they can be merged back cheaply."""
    flat = traverse_util.flatten_dict(params)
    train = {k: (v if spec.path_trainable(k) else None) for k, v in flat.items()}
    frozen = {k: (None if spec.path_trainable(k) else v) for k, v in flat.items()}
    return (traverse_util.unflatten_dict(train),
            traverse_util.unflatten_dict(frozen))


def merge_params(trainable: Mapping[str, Any], frozen: Mapping[str, Any]):
    ft = traverse_util.flatten_dict(trainable)
    ff = traverse_util.flatten_dict(frozen)
    merged = {k: (v if v is not None else ff[k]) for k, v in ft.items()}
    return traverse_util.unflatten_dict(merged)


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree)
               if x is not None)


# ---------------------------------------------------------------------------
# decay / no-decay groups
# ---------------------------------------------------------------------------

def decay_label(path: tuple[str, ...], value) -> str:
    """'decay' for matmul/conv weights, 'no_decay' otherwise
    (image_text_mask_module.py:310-337). Our naming: Dense weights are
    'kernel'; torch-layout conv weights are 'weight' with ndim 4; the vision
    patch projection is a conv in the reference -> decay."""
    name = path[-1]
    if name == "kernel":
        return "decay"
    if name == "weight" and getattr(value, "ndim", 0) >= 2:
        return "decay"
    if name == "patch_proj":
        return "decay"
    return "no_decay"


def make_optimizer(
    learning_rate: float,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    optimizer: str = "adamw",
    grad_clip_norm: Optional[float] = None,
    accumulate_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW over the trainable tree with the reference's two-group decay
    policy. The learning rate is injected as a mutable hyperparameter so
    host-side schedulers (plateau) can update it between steps.

    `accumulate_steps` > 1 wraps the whole transformation in
    optax.MultiSteps — Lightning's `trainer.accumulate_grad_batches`: k
    micro-batch grads are averaged on-device before one optimizer update
    (clipping applies to the AVERAGED grad, matching Lightning). The
    accumulator lives in opt_state so the jitted step stays one program."""

    def build(lr):
        if optimizer == "adamw":
            def group(wd):
                return optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=wd)
            if weight_decay <= 0:
                tx = group(0.0)
            else:
                tx = optax.multi_transform(
                    {"decay": group(weight_decay), "no_decay": group(0.0)},
                    lambda params: jax.tree_util.tree_map_with_path(
                        lambda p, v: decay_label(
                            tuple(getattr(k, "key", getattr(k, "idx", k))
                                  for k in p), v),
                        params),
                )
        elif optimizer == "sgd":
            tx = optax.sgd(lr, momentum=0.9)
        else:
            raise ValueError(f"unknown optimizer {optimizer}")
        if grad_clip_norm is not None:
            tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
        return tx

    tx = optax.inject_hyperparams(
        lambda learning_rate: build(learning_rate))(learning_rate=learning_rate)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning rate in-place (returns new state)."""
    return optax.tree_utils.tree_set(opt_state, learning_rate=jnp.asarray(lr))


def get_learning_rate(opt_state) -> float:
    return float(optax.tree_utils.tree_get(opt_state, "learning_rate"))


# ---------------------------------------------------------------------------
# host-side schedulers
# ---------------------------------------------------------------------------

class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau semantics (the reference's
    default scheduler, monitor val_loss, interval epoch)."""

    def __init__(self, factor: float = 0.2, patience: int = 5,
                 mode: str = "min", threshold: float = 1e-4,
                 threshold_mode: str = "rel", min_lr: float = 0.0,
                 cooldown: int = 0):
        self.factor = factor
        self.patience = patience
        self.mode = mode
        self.threshold = threshold
        self.threshold_mode = threshold_mode
        self.min_lr = min_lr
        self.cooldown = cooldown
        self.best: Optional[float] = None
        self.num_bad_epochs = 0
        self.cooldown_counter = 0

    def _is_better(self, current: float, best: float) -> bool:
        # torch rel mode is multiplicative on the SIGNED best — min compares
        # against best*(1-threshold), max against best*(1+threshold) — which
        # differs from best -/+ threshold*abs(best) when best < 0
        if self.threshold_mode == "rel":
            if self.mode == "min":
                return current < best * (1.0 - self.threshold)
            return current > best * (1.0 + self.threshold)
        if self.mode == "min":
            return current < best - self.threshold
        return current > best + self.threshold

    def step(self, metric: float, current_lr: float) -> float:
        """Feed the monitored metric; returns the (possibly reduced) lr."""
        if self.best is None or self._is_better(metric, self.best):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
            return max(current_lr * self.factor, self.min_lr)
        return current_lr


class CosineAnnealingLR:
    """torch CosineAnnealingLR (per-step when interval='step')."""

    def __init__(self, base_lr: float, t_max: float, eta_min: float = 0.0):
        self.base_lr = base_lr
        self.t_max = t_max
        self.eta_min = eta_min

    def lr_at(self, step: int) -> float:
        import math
        return self.eta_min + 0.5 * (self.base_lr - self.eta_min) * (
            1 + math.cos(math.pi * step / self.t_max))


SCHEDULER_REGISTRY = {
    "plateau": ReduceLROnPlateau,
    "cosine": CosineAnnealingLR,
    "none": None,
}
