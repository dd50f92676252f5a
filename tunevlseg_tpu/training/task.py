"""The segmentation task: jitted, mesh-sharded train/eval/predict steps.

This is the TPU-native replacement for the reference's
`ImageTextMaskModule(LightningModule)` (src/models/image_text_mask_module.py):
one task class for every net, with the universal batch contract

    batch = {"image": (B,C,H,W) f32, "mask": (B,1,H,W) f32,
             "input_ids": (B,L) i32, "attention_mask": (B,L) i32,
             "valid": (B,) f32 (1 for real samples, 0 for pad samples)}

Key differences from the Lightning design, by construction:
  * the whole step (forward, loss, backward, optimizer, metric update) is ONE
    jitted XLA program over the device mesh — no per-batch Python;
  * frozen params are held outside the differentiated tree (training/optim.py)
    so no frozen gradients/optimizer state exist;
  * metrics are a psum-able pytree (ops/metrics.py) reduced across shards by
    GSPMD automatically;
  * `valid` masking replaces DDP's drop_last/divisibility constraint
    (reference datamodule errors when batch % world_size != 0 —
    image_text_mask_datamodule.py:40-47; we pad + mask instead).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from jax.sharding import Mesh

from tunevlseg_tpu.ops import losses as losses_lib
from tunevlseg_tpu.ops import metrics as metrics_lib
from tunevlseg_tpu.parallel import mesh as mesh_lib
from tunevlseg_tpu.training import optim as optim_lib


class TrainState(NamedTuple):
    step: jnp.ndarray
    trainable: Any
    opt_state: Any
    rng: jax.Array
    # mutable non-trainable collections (e.g. BatchNorm running stats when
    # training with bn_train models); {} when nothing mutates
    model_state: Any = {}


@dataclasses.dataclass
class SegmentationTask:
    model: nn.Module
    freeze_spec: optim_lib.FreezeSpec = optim_lib.FreezeSpec()
    loss_fn: Callable = losses_lib.dice_ce_loss
    loss_kwargs: dict = dataclasses.field(default_factory=dict)
    threshold: float = 0.5
    learning_rate: float = 2e-4
    weight_decay: float = 0.0
    grad_clip_norm: Optional[float] = None
    # Lightning trainer.accumulate_grad_batches: average k micro-batch grads
    # on-device (optax.MultiSteps) before one optimizer update
    accumulate_grad_batches: int = 1
    # Activation rematerialization: recompute the forward during the backward
    # pass (jax.checkpoint) instead of keeping every tower activation live in
    # HBM — the standard TPU memory-for-FLOPs trade, enabling batches/images
    # that would otherwise OOM. ~1.3x step cost for ~2-3x activation memory.
    remat: bool = False
    donate_state: bool = True
    # collections updated as side effects of the train step (e.g.
    # ("batch_stats",) for e2e CRIS where neck/decoder BN stats train —
    # torch train-mode semantics). They move from `frozen` into
    # TrainState.model_state so the step can return updates.
    mutable_collections: tuple = ()
    # (mean, std) for device-side normalization of uint8 image batches —
    # the host then ships packed uint8 (4x less PCIe/DMA traffic) and the
    # TPU fuses (x/255 - mean)/std into the first conv/patchify
    image_stats: tuple = ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225))

    def __post_init__(self):
        self.tx = optim_lib.make_optimizer(
            self.learning_rate, self.weight_decay,
            grad_clip_norm=self.grad_clip_norm,
            accumulate_steps=self.accumulate_grad_batches)

    # -- init ---------------------------------------------------------------

    def init(self, rng: jax.Array, batch: dict,
             params: Optional[Any] = None,
             variables: Optional[Any] = None) -> tuple[TrainState, Any]:
        """Returns (state, frozen). `frozen` is a dict of variable
        collections: {"params": <frozen param tree>, **extras} where extras
        are non-trainable collections like CRIS's `batch_stats`.

        `params`/`variables` may come from a converted checkpoint; a partial
        `params` tree is overlaid on the random init (e.g. a converted HF
        backbone + freshly initialized learner)."""
        from tunevlseg_tpu.config.composer import deep_merge

        init_vars = dict(self.model.init(
            rng, batch["input_ids"], batch["image"],
            batch.get("attention_mask"), **self._model_kwargs(batch)))
        random_params = init_vars.pop("params")
        if params is None:
            params = random_params
        else:
            # converted checkpoints may carry tensors the TPU model elides
            # by design (e.g. HF CLIPSeg vision layers past max(extract_
            # layers), visual_projection — never used by the segmentation
            # forward): drop them instead of hauling dead weights to HBM
            from flax import traverse_util
            flat_r = traverse_util.flatten_dict(dict(random_params))
            flat_p = traverse_util.flatten_dict(dict(params))
            dropped = [k for k in flat_p if k not in flat_r]
            if dropped:
                from tunevlseg_tpu.utils.logging import get_logger
                get_logger().info(
                    "dropping %d checkpoint tensors the model elides "
                    "(e.g. %s)", len(dropped), "/".join(dropped[0]))
                flat_p = {k: v for k, v in flat_p.items() if k in flat_r}
                params = traverse_util.unflatten_dict(flat_p)
            params = deep_merge(dict(random_params), params)
        if variables:
            init_vars = deep_merge(dict(init_vars), dict(variables))
        trainable, frozen_params = optim_lib.partition_params(
            params, self.freeze_spec)
        model_state = {k: init_vars.pop(k) for k in self.mutable_collections
                       if k in init_vars}
        frozen = {"params": frozen_params, **init_vars}
        opt_state = self.tx.init(trainable)
        state = TrainState(jnp.zeros((), jnp.int32), trainable, opt_state,
                           jax.random.fold_in(rng, 1), model_state)
        return state, frozen

    # -- steps --------------------------------------------------------------

    def _prep_image(self, image):
        if image.dtype == jnp.uint8:
            mean, std = self.image_stats
            mean = jnp.asarray(mean, jnp.float32).reshape(1, -1, 1, 1)
            std = jnp.asarray(std, jnp.float32).reshape(1, -1, 1, 1)
            return (image.astype(jnp.float32) / 255.0 - mean) / std
        return image

    @staticmethod
    def _model_kwargs(batch) -> dict:
        """Optional batch keys forwarded to the net. `text_index` is the
        prompt-dedup inverse map (collate(text_dedup=U)): input_ids carries
        only the batch's U unique prompt rows and the model gathers its text
        features back to B — only passed when present so nets without the
        feature keep their stock signature."""
        return ({"text_index": batch["text_index"]}
                if "text_index" in batch else {})

    def _forward(self, params, extras, batch, rngs=None, deterministic=True):
        return self.model.apply(
            {"params": params, **extras}, batch["input_ids"],
            self._prep_image(batch["image"]),
            batch.get("attention_mask"), deterministic=deterministic,
            rngs=rngs, **self._model_kwargs(batch))

    @staticmethod
    def _split_frozen(frozen):
        extras = {k: v for k, v in frozen.items() if k != "params"}
        return frozen["params"], extras

    @staticmethod
    def _dropout_rng(rng):
        """Dropout mask generation uses the TPU-native RBG generator
        (TUNEVLSEG_FAST_DROPOUT=0 reverts to threefry): the CRIS decoder's
        per-step masks (~200M bits at b64@416) cost +37 ms under threefry
        (PERF_r05/profile_cris3.log head-with-dropout vs eval probe).
        Dropout needs independent randomness, not a particular stream —
        the key stays a deterministic function of (seed, step), so runs
        remain reproducible; only the mask VALUES differ from the
        threefry sequence (never comparable to torch's anyway). Trace-time
        env read."""
        import os
        if os.environ.get("TUNEVLSEG_FAST_DROPOUT", "1") != "1":
            return rng
        data = jax.random.key_data(rng)
        return jax.random.wrap_key_data(
            jnp.tile(data.astype(jnp.uint32), 2)[:4], impl="rbg")

    def _loss(self, trainable, model_state, frozen, batch, rng):
        rng = self._dropout_rng(rng)
        frozen_params, extras = self._split_frozen(frozen)
        params = optim_lib.merge_params(trainable, frozen_params)
        variables = {"params": params, **extras, **model_state}
        if self.mutable_collections:
            logits, updates = self.model.apply(
                variables, batch["input_ids"],
                self._prep_image(batch["image"]),
                batch.get("attention_mask"), deterministic=False,
                rngs={"dropout": rng},
                mutable=list(self.mutable_collections),
                **self._model_kwargs(batch))
        else:
            logits = self.model.apply(
                variables, batch["input_ids"],
                self._prep_image(batch["image"]),
                batch.get("attention_mask"), deterministic=False,
                rngs={"dropout": rng}, **self._model_kwargs(batch))
            updates = {}
        mask = batch["mask"]
        valid = batch.get("valid")
        if valid is not None:
            # zero-out padded samples on both sides so they contribute a
            # constant (matching) term to the loss
            v = valid.reshape(-1, 1, 1, 1).astype(logits.dtype)
            logits = logits * v + (1 - v) * 0.0
            mask = mask * v
        loss = self.loss_fn(logits, mask, **self.loss_kwargs)
        return loss, (logits, updates)

    def train_step(self, state: TrainState, frozen, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        if self.remat:
            # PER-LAYER rematerialization (nn/remat.py): a monolithic
            # jax.checkpoint around the whole loss was measured to save
            # nothing (trans_seg b32@352 peak 14.88 -> 15.35 GiB,
            # PERF_r04/membench.json) because the backward recomputes the
            # entire forward and then holds the same activation set again;
            # checkpointing each tower block instead keeps one block's
            # internals live at a time. The flag is read at trace time
            # inside the towers, so force it for this trace only.
            from tunevlseg_tpu.nn import remat as remat_lib

            def loss_fn(*a):
                with remat_lib.forced(True):
                    return self._loss(*a)
        else:
            loss_fn = self._loss
        (loss, (logits, new_model_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.trainable, state.model_state,
                                   frozen, batch, rng)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        model_state = (new_model_state if self.mutable_collections
                       else state.model_state)
        probs = jax.nn.sigmoid(logits.astype(jnp.float32))
        # padded samples have zeroed logits -> sigmoid 0.5; exclude them from
        # the step metrics (the loss already treats them as a constant term)
        valid = batch.get("valid")
        step_metrics = {
            "loss": loss,
            "dice": metrics_lib.dice_score(probs, batch["mask"], self.threshold,
                                           valid=valid),
            "iou": metrics_lib.iou_score(probs, batch["mask"], self.threshold,
                                         valid=valid),
        }
        return TrainState(state.step + 1, trainable, opt_state, state.rng,
                          model_state), step_metrics

    def eval_step(self, state: TrainState, frozen,
                  metric_state: metrics_lib.SegMetricState, batch):
        frozen_params, extras = self._split_frozen(frozen)
        params = optim_lib.merge_params(state.trainable, frozen_params)
        logits = self._forward(params, {**extras, **state.model_state}, batch)
        mask = batch["mask"]
        valid = batch.get("valid")
        v = None if valid is None else valid
        probs = jax.nn.sigmoid(logits.astype(jnp.float32))
        if v is not None:
            vv = v.reshape(-1, 1, 1, 1).astype(logits.dtype)
            loss = self.loss_fn(logits * vv, mask * vv, **self.loss_kwargs)
        else:
            loss = self.loss_fn(logits, mask, **self.loss_kwargs)
        new_metric_state = metrics_lib.update_state(
            metric_state, probs, mask, self.threshold, valid=v)
        n = jnp.sum(v) if v is not None else jnp.asarray(
            batch["mask"].shape[0], jnp.float32)
        return new_metric_state, {"loss_sum": loss * n, "n": n}

    def predict_step(self, state: TrainState, frozen, batch):
        frozen_params, extras = self._split_frozen(frozen)
        params = optim_lib.merge_params(state.trainable, frozen_params)
        logits = self._forward(params, {**extras, **state.model_state}, batch)
        return jax.nn.sigmoid(logits.astype(jnp.float32))

    # -- jit + sharding -----------------------------------------------------

    def compile_steps(self, mesh: Mesh, frozen_shardings=None,
                      state_shardings=None):
        """Jit the steps over the mesh: trainable state replicated, batch
        sharded on the data axis. GSPMD inserts the grad psum over ICI.

        `frozen_shardings` (a pytree of NamedShardings matching the frozen
        dict, e.g. from `parallel.sharding_rules.tp_shardings`) tensor-
        parallelizes the frozen tower over the `model` mesh axis; default is
        fully replicated (pure data parallel, the reference's DDP regime).

        `state_shardings` (a NamedSharding pytree matching TrainState, e.g.
        from `state_fsdp_shardings`) shards trainable params + optimizer
        state over the data axis (FSDP/ZeRO-3): GSPMD all-gathers weights
        before use and reduce-scatters grads, cutting per-chip state memory
        ~Nx."""
        repl = mesh_lib.replicated(mesh)
        bsh = mesh_lib.batch_sharding(mesh)
        fsh = repl if frozen_shardings is None else frozen_shardings
        ssh = repl if state_shardings is None else state_shardings

        train = jax.jit(
            self.train_step,
            in_shardings=(ssh, fsh, None),
            out_shardings=(ssh, repl),
            donate_argnums=(0,) if self.donate_state else (),
        )
        evals = jax.jit(
            self.eval_step,
            in_shardings=(ssh, fsh, repl, None),
            out_shardings=(repl, repl),
        )
        predict = jax.jit(self.predict_step,
                          in_shardings=(ssh, fsh, None),
                          out_shardings=bsh)
        return train, evals, predict

    def state_fsdp_shardings(self, mesh: Mesh, state: TrainState):
        """FSDP placement for the whole TrainState: params and every
        params-shaped optimizer-state leaf (Adam mu/nu, MultiSteps
        accumulators) shard over the data axis; scalars/rng replicate."""
        from tunevlseg_tpu.parallel import sharding_rules
        return sharding_rules.fsdp_shardings(state, mesh,
                                             report="train state")

    def compile_train_multistep(self, mesh: Mesh, num_steps: int,
                                frozen_shardings=None, state_shardings=None):
        """One XLA executable running `num_steps` train steps via lax.scan
        (steps-per-execution). Takes batches stacked on a leading axis
        (num_steps, B, ...) sharded (None, data) — callers place them via
        `mesh_lib.batch_shardings(mesh, batch, stacked=True)`, which keeps
        prompt-dedup keys replicated — and returns metrics averaged over the
        scanned steps. Amortizes per-launch host/dispatch latency — on the
        remote-TPU transport here that is ~20ms/step, nearly a third of the
        CLIPSeg step."""
        repl = mesh_lib.replicated(mesh)
        fsh = repl if frozen_shardings is None else frozen_shardings
        ssh = repl if state_shardings is None else state_shardings

        def multi(state: TrainState, frozen, batches):
            def body(st, batch):
                return self.train_step(st, frozen, batch)

            state2, ms = jax.lax.scan(body, state, batches, length=num_steps)
            return state2, jax.tree_util.tree_map(
                lambda x: jnp.mean(x, axis=0), ms)

        return jax.jit(
            multi,
            # batch in_shardings inferred from the caller's device_put (per-
            # key: stacked-data for rows, replicated for dedup prompt keys)
            in_shardings=(ssh, fsh, None),
            out_shardings=(ssh, repl),
            donate_argnums=(0,) if self.donate_state else (),
        )
