"""The fit/evaluate/predict driver — the reference's `src/train.py` +
Lightning Trainer loop collapsed into explicit JAX code.

Responsibilities mirrored from the reference (src/train.py:56-137,
image_text_mask_module.py): epoch loop with val after each train epoch,
stepwise metric logging, ReduceLROnPlateau on val_loss, early stopping
(patience on val_loss), best-val_dice checkpointing, final test + optional
prediction-mask saving at original resolution."""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Callable, Optional

import jax
import numpy as np

from tunevlseg_tpu.data.pipeline import DataLoader, device_batch
from tunevlseg_tpu.ops.metrics import SegMetricState, compute
from tunevlseg_tpu.parallel import mesh as mesh_lib
from tunevlseg_tpu.training.checkpoint import CheckpointManager
from tunevlseg_tpu.training.optim import (ReduceLROnPlateau,
                                          get_learning_rate,
                                          set_learning_rate)
from tunevlseg_tpu.training.task import SegmentationTask
from tunevlseg_tpu.utils.logging import MetricLogger, get_logger

log = get_logger(__name__)


@dataclasses.dataclass
class EarlyStopping:
    """Lightning EarlyStopping semantics (configs/callbacks/default.yaml:16-20:
    monitor val_loss, patience 12, min_delta 1e-4, mode min)."""

    patience: int = 12
    min_delta: float = 1e-4
    mode: str = "min"
    best: Optional[float] = None
    count: int = 0

    def should_stop(self, value: float) -> bool:
        improved = (self.best is None
                    or (value < self.best - self.min_delta
                        if self.mode == "min"
                        else value > self.best + self.min_delta))
        if improved:
            self.best = value
            self.count = 0
        else:
            self.count += 1
        return self.count >= self.patience


class _PreemptionWatch:
    """SIGTERM watch for preemption-safe training: TPU pods deliver SIGTERM
    ahead of maintenance events / autoscaler evictions. While installed, a
    SIGTERM only raises a flag; fit() finishes the in-flight step group,
    writes a resumable 'last' checkpoint, and returns cleanly instead of
    dying mid-epoch with an unsaved optimizer state. (The reference has no
    preemption story — Lightning just dies; SURVEY §5.3.)"""

    def __init__(self):
        self.flag = False
        self._prev = None

    def install(self):
        import signal

        def handler(signum, frame):
            self.flag = True

        try:
            prev = signal.signal(signal.SIGTERM, handler)
            # getsignal() returns None for handlers installed from C —
            # restore SIG_DFL in that case (passing None back raises)
            self._prev = (signal.SIGTERM,
                          signal.SIG_DFL if prev is None else prev)
        except ValueError:  # not the main thread (e.g. a test harness)
            self._prev = None
        return self

    def uninstall(self):
        import signal
        if self._prev is not None:
            signal.signal(*self._prev)
            self._prev = None

    def preempted(self) -> bool:
        """Global preemption decision. On multi-host runs the local flag is
        OR-reduced across processes FIRST: SIGTERM delivery is per-host and
        unsynchronized, and a host that breaks into the checkpoint write
        while another enters the next train step's all-reduce would deadlock
        the pod on mismatched collectives. One tiny allgather per step group
        is noise next to a train step."""
        if jax.process_count() == 1:
            return self.flag
        from jax.experimental import multihost_utils
        flags = multihost_utils.process_allgather(
            np.asarray([self.flag], np.int32))
        return bool(np.asarray(flags).max())


@dataclasses.dataclass
class Trainer:
    task: SegmentationTask
    mesh: Any
    output_dir: Path
    max_epochs: int = 20
    min_epochs: int = 1
    log_every_n_steps: int = 6
    monitor: str = "val_dice"
    scheduler: Optional[ReduceLROnPlateau] = None
    early_stopping: Optional[EarlyStopping] = None
    limit_batches: Optional[int] = None  # debug (fdr/limit configs)
    loggers: tuple = ("jsonl", "csv")    # configs/logger/* equivalents
    exp_name: Optional[str] = None       # run identity for wandb/tb
    project: Optional[str] = None
    tags: tuple = ()
    log_image_num: int = 4               # val panel size (module.py:176)
    # >1 fuses that many train steps into ONE XLA executable (lax.scan),
    # amortizing per-launch dispatch latency; metrics are means over the
    # scanned steps. Leftover batches at epoch end run the 1-step program.
    steps_per_execution: int = 1
    # FSDP/ZeRO-3: shard params + optimizer state + frozen towers over the
    # data axis (parallel/sharding_rules.py:fsdp_shardings). Composes with
    # model_parallel>1 (tp rules keep their axis; fsdp fills the rest).
    fsdp: bool = False
    # Megatron-style sequence parallelism: with model_parallel>1, shard the
    # towers' residual stream over the model axis between blocks
    # (parallel/activation_sharding.py) — GSPMD splits the TP all-reduces
    # into reduce-scatter + all-gather and LN/residual activation memory
    # drops by tp. No-op on a tp=1 mesh.
    seq_shard: bool = False
    # >0 writes an exactly-resumable mid-epoch 'last' snapshot every N
    # global steps (Lightning ModelCheckpoint every_n_train_steps). Covers
    # hard kills that never deliver the SIGTERM the _PreemptionWatch
    # relies on; saves are async (orbax overlaps the epoch compute) and
    # carry the batch_offset so resume replays only the epoch's tail.
    ckpt_every_n_steps: int = 0

    def __post_init__(self):
        from tunevlseg_tpu.utils.logging import MultiLogger
        if jax.process_count() > 1:
            # multi-host: stacked host batches aren't global arrays (no
            # multi-step fusion) and predictions are host-sharded (no panel)
            self.steps_per_execution = 1
            self.log_image_num = 0
        self.output_dir = Path(self.output_dir)
        self.ckpt = CheckpointManager(self.output_dir / "checkpoints",
                                      monitor=self.monitor)
        self.metrics_log = MultiLogger(self.output_dir,
                                       backends=self.loggers,
                                       project=self.project,
                                       exp_name=self.exp_name,
                                       tags=tuple(self.tags or ()))
        self._train_step = None
        self._fsh = None
        self._ssh = None

    def _setup(self, state, frozen):
        """Compile the steps on first use and place state + frozen tree:
        tensor-parallel over the `model` mesh axis when it has size > 1
        (Megatron column/row rules), FSDP over the data axis when
        `fsdp=True` (params/opt-state/frozen sharded, GSPMD gathers on
        use), fully replicated otherwise. Returns (state, frozen) placed."""
        if self._train_step is None:
            from tunevlseg_tpu.parallel import sharding_rules
            tp = dict(self.mesh.shape).get(mesh_lib.MODEL_AXIS, 1) > 1
            if self.seq_shard and tp:
                # read at TRACE time by the tower hooks; jit traces lazily,
                # so this stays enabled for the life of the compiled steps
                from tunevlseg_tpu.parallel import activation_sharding
                activation_sharding.enable(self.mesh)
            if self.fsdp:
                base = (sharding_rules.tp_param_specs(frozen, self.mesh)
                        if tp else None)
                self._fsh = sharding_rules.fsdp_shardings(
                    frozen, self.mesh, base_specs=base, report="frozen")
                self._ssh = self.task.state_fsdp_shardings(self.mesh, state)
            elif tp:
                self._fsh = sharding_rules.tp_shardings(frozen, self.mesh)
            self._train_step, self._eval_step, self._predict_step = \
                self.task.compile_steps(self.mesh, self._fsh, self._ssh)
            self._multi_step = (
                self.task.compile_train_multistep(
                    self.mesh, self.steps_per_execution, self._fsh,
                    self._ssh)
                if self.steps_per_execution > 1 else None)
        if self._fsh is None:
            frozen = mesh_lib.replicate(self.mesh, frozen)
        else:
            frozen = jax.tree_util.tree_map(jax.device_put, frozen,
                                            self._fsh)
        if self._ssh is None:
            state = mesh_lib.replicate(self.mesh, state)
        else:
            state = jax.tree_util.tree_map(jax.device_put, state, self._ssh)
        return state, frozen

    # ---------------------------------------------------------------

    def _run_eval(self, state, frozen, loader: DataLoader, prefix: str):
        mstate = mesh_lib.replicate(self.mesh, SegMetricState.zeros())
        loss_sum, n = 0.0, 0.0
        for i, batch in enumerate(loader):
            if self.limit_batches is not None and i >= self.limit_batches:
                break
            sharded = mesh_lib.shard_batch(self.mesh, device_batch(batch))
            mstate, extra = self._eval_step(state, frozen, mstate, sharded)
            loss_sum += float(extra["loss_sum"])
            n += float(extra["n"])
        result = {f"{prefix}_{k}": float(v)
                  for k, v in compute(mstate).items()}
        result[f"{prefix}_loss"] = loss_sum / max(n, 1.0)
        return result

    def _log_val_panel(self, state, frozen, loader: DataLoader) -> None:
        """First-validation image panel (input / target / prediction [+
        prompt caption]) — the reference's wandb val_caption_label table
        logged once at global step 0 (image_text_mask_module.py:171-199)."""
        try:
            batch = next(iter(loader))
        except StopIteration:
            return
        sharded = mesh_lib.shard_batch(self.mesh, device_batch(batch))
        preds = np.asarray(self._predict_step(state, frozen, sharded))
        n = min(self.log_image_num, preds.shape[0])
        panels, captions = [], []
        for j in range(n):
            img = np.asarray(batch["image"][j])            # (C, H, W)
            if img.dtype == np.uint8:
                rgb = img.transpose(1, 2, 0)
            else:  # undo the dataset normalization for display
                mean, std = self.task.image_stats
                rgb = (img.transpose(1, 2, 0) * np.asarray(std)
                       + np.asarray(mean))
            panels.extend([rgb, np.asarray(batch["mask"][j, 0]), preds[j, 0]])
            prompts = batch.get("prompt")
            captions.append(prompts[j] if prompts is not None else f"#{j}")
        self.metrics_log.log_images("val_caption_label", panels,
                                    step=int(state.step), captions=captions)

    def _train_groups(self, loader):
        """Yield either single batches or `steps_per_execution`-sized lists
        (only full groups are fused; stragglers run one step at a time)."""
        k = self.steps_per_execution
        pending = []
        for i, batch in enumerate(loader):
            if self.limit_batches is not None and i >= self.limit_batches:
                break
            if k <= 1:
                yield batch
                continue
            pending.append(batch)
            if len(pending) == k:
                yield pending
                pending = []
        for batch in pending:
            yield batch

    def _fit_extra(self) -> dict:
        """Host-side loop state persisted in each checkpoint's meta.json so a
        resumed fit continues schedulers/early-stopping instead of resetting
        them (reference: Lightning restores callback state from the ckpt)."""
        extra: dict[str, Any] = {}
        if self.scheduler is not None:
            extra["scheduler"] = {
                "best": self.scheduler.best,
                "num_bad_epochs": self.scheduler.num_bad_epochs,
                "cooldown_counter": self.scheduler.cooldown_counter}
        if self.early_stopping is not None:
            extra["early_stopping"] = {"best": self.early_stopping.best,
                                       "count": self.early_stopping.count}
        return extra

    def _resolve_resume(self, spec) -> tuple[CheckpointManager, str]:
        """`spec` is a tag in this run's own checkpoint dir ("last"/"best"),
        a checkpoints directory (uses "last", falling back to "best"), or a
        path to one tag directory — the reference's `ckpt_path` surface
        (src/train.py:104) adapted to orbax's dir-per-tag layout."""
        if spec in ("last", "best"):
            return self.ckpt, spec
        p = Path(spec)
        if (p / "last").exists() or (p / "best").exists():
            mgr = CheckpointManager(p, monitor=self.monitor)
            return mgr, "last" if (p / "last").exists() else "best"
        if not p.exists():
            raise FileNotFoundError(f"ckpt_path {spec} does not exist")
        return CheckpointManager(p.parent, monitor=self.monitor), p.name

    def fit(self, state, frozen, train_loader: DataLoader,
            val_loader: Optional[DataLoader] = None,
            resume_from: Optional[str] = None):
        state, frozen = self._setup(state, frozen)
        self.ckpt.save_frozen(frozen)

        start_epoch = 0
        resume_offset = 0
        if resume_from:
            mgr, tag = self._resolve_resume(resume_from)
            state = mgr.restore(tag, state)
            meta = mgr.load_meta(tag)
            start_epoch = int(meta.get("epoch", -1)) + 1
            if meta.get("preempted") or meta.get("mid_epoch"):
                # step-level resume: replay only the TAIL of the interrupted
                # epoch — its first batch_offset batches were already trained
                # (the epoch's batch order is deterministic from (seed,epoch))
                resume_offset = int(meta.get("batch_offset", 0))
            self.ckpt.best_value = meta.get("best_value")
            if self.scheduler is not None and meta.get("scheduler"):
                for k, v in meta["scheduler"].items():
                    setattr(self.scheduler, k, v)
            if self.early_stopping is not None and meta.get("early_stopping"):
                self.early_stopping.best = meta["early_stopping"]["best"]
                self.early_stopping.count = int(
                    meta["early_stopping"]["count"])
            log.info(f"resumed from {resume_from} ({tag}) at epoch "
                     f"{start_epoch}, step {int(state.step)}")

        global_step = int(state.step)
        watch = _PreemptionWatch().install()
        try:
            state = self._fit_epochs(watch, state, frozen, train_loader,
                                     val_loader, start_epoch, global_step,
                                     resume_offset)
        finally:
            # not leaked on exceptions: a swallowed-SIGTERM process would
            # need SIGKILL, which can wedge remote-TPU transports
            watch.uninstall()
        # saves are async (overlapping epoch compute); drain before the
        # caller reads checkpoints (test-on-best) or the process exits
        self.ckpt.wait()
        return state

    def _fit_epochs(self, watch, state, frozen, train_loader, val_loader,
                    start_epoch, global_step, resume_offset=0):
        for epoch in range(start_epoch, self.max_epochs):
            train_loader.set_epoch(
                epoch, resume_offset if epoch == start_epoch else 0)
            epoch_batches = resume_offset if epoch == start_epoch else 0
            for group in self._train_groups(train_loader):
                if isinstance(group, list):  # fused multi-step chunk
                    stacked = jax.tree_util.tree_map(
                        lambda *xs: np.stack(xs), *[device_batch(b)
                                                    for b in group])
                    shs = mesh_lib.batch_shardings(self.mesh, stacked,
                                                   stacked=True)
                    stacked = {k: jax.device_put(v, shs[k])
                               for k, v in stacked.items()}
                    state, m = self._multi_step(state, frozen, stacked)
                    inc = len(group)
                else:
                    sharded = mesh_lib.shard_batch(self.mesh,
                                                   device_batch(group))
                    state, m = self._train_step(state, frozen, sharded)
                    inc = 1
                global_step += inc
                epoch_batches += inc
                # promote any finished async save (non-blocking durability)
                self.ckpt.poll()

                def crossed(n):
                    return n and (global_step // n) != (
                        (global_step - inc) // n)

                if crossed(self.log_every_n_steps):
                    self.metrics_log.log(m, global_step, prefix="train_")
                if crossed(self.ckpt_every_n_steps):
                    # interval snapshot, exactly resumable mid-epoch: covers
                    # hard kills that never deliver SIGTERM (async save —
                    # the epoch's compute overlaps the write)
                    self.ckpt.save("last", state,
                                   {"epoch": epoch - 1, "mid_epoch": True,
                                    "batch_offset": epoch_batches,
                                    **self._fit_extra()})
                if watch.preempted():
                    preempted = True
                    break
            else:
                preempted = False
            if preempted:
                # resumable snapshot: epoch-1 = last COMPLETED epoch and
                # batch_offset = batches of THIS epoch already consumed, so a
                # ckpt_path=.../last resume replays only the epoch's tail
                # (deterministic per-epoch order) — no batch trains twice and
                # the result is bit-identical to an uninterrupted run
                self.ckpt.save("last", state,
                               {"epoch": epoch - 1, "preempted": True,
                                "batch_offset": epoch_batches,
                                **self._fit_extra()})
                log.warning(
                    f"SIGTERM: saved resumable 'last' at step "
                    f"{int(state.step)} (epoch {epoch} batch "
                    f"{epoch_batches}); resume with "
                    f"ckpt_path={self.ckpt.dir / 'last'}")
                break

            epoch_metrics: dict[str, float] = {"epoch": epoch}
            if val_loader is not None:
                if self.log_image_num > 0:
                    # first-val-batch prediction panel EVERY epoch
                    # (reference image_text_mask_module.py:202-205)
                    self._log_val_panel(state, frozen, val_loader)
                epoch_metrics.update(
                    self._run_eval(state, frozen, val_loader, "val"))
                self.metrics_log.log(epoch_metrics, global_step)

                # advance schedulers/early-stopping BEFORE checkpointing so
                # the saved meta + lr reflect the completed epoch (resume
                # continues exactly where an uninterrupted run would be)
                val_loss = epoch_metrics["val_loss"]
                if self.scheduler is not None:
                    lr = get_learning_rate(state.opt_state)
                    new_lr = self.scheduler.step(val_loss, lr)
                    if new_lr != lr:
                        log.info(f"plateau: lr {lr:.2e} -> {new_lr:.2e}")
                        state = state._replace(opt_state=set_learning_rate(
                            state.opt_state, new_lr))
                stop = (self.early_stopping is not None
                        and epoch + 1 >= self.min_epochs
                        and self.early_stopping.should_stop(val_loss))
                self.ckpt.maybe_save_best(state, epoch_metrics, epoch,
                                          extra=self._fit_extra())
                if stop:
                    log.info(f"early stopping at epoch {epoch}")
                    break
            else:
                self.ckpt.save("last", state,
                               {"epoch": epoch, **self._fit_extra()})
        return state

    def test(self, state, frozen, test_loader: DataLoader,
             use_best: bool = True):
        state, frozen = self._setup(state, frozen)
        if use_best and (self.ckpt.dir / "best").exists():
            state = self.ckpt.restore("best", state)
        result = self._run_eval(state, frozen, test_loader, "test")
        self.metrics_log.log(result, int(state.step))
        return result

    def predict(self, state, frozen, loader: DataLoader,
                save_dir: Optional[Path] = None,
                use_best: bool = True) -> list[dict]:
        """Runs predict steps; optionally saves masks restored to each
        sample's original resolution (reference src/utils/save_utils.py)."""
        import cv2

        state, frozen = self._setup(state, frozen)
        if use_best and (self.ckpt.dir / "best").exists():
            state = self.ckpt.restore("best", state)
        outputs = []
        for batch in loader:
            sharded = mesh_lib.shard_batch(self.mesh, device_batch(batch))
            preds_g = self._predict_step(state, frozen, sharded)
            if jax.process_count() > 1:
                # every host writes ITS shard of predictions (rows map back
                # to the local loader batch via the shard placement)
                preds, rows = mesh_lib.host_local_rows(
                    self.mesh, preds_g, len(batch["mask_name"]))
            else:
                preds = np.asarray(preds_g)
                rows = np.arange(len(batch["mask_name"]))
            for k, j in enumerate(rows):
                if batch["valid"][j] == 0:
                    continue
                rec = {"pred": preds[k, 0],
                       "mask_name": batch["mask_name"][j],
                       "mask_shape": batch["mask_shape"][j]}
                outputs.append(rec)
                if save_dir is not None:
                    save_dir = Path(save_dir)
                    h, w = (int(x) for x in rec["mask_shape"])
                    resized = cv2.resize(rec["pred"], (w, h),
                                         interpolation=cv2.INTER_CUBIC)
                    out_path = save_dir / rec["mask_name"]
                    out_path.parent.mkdir(parents=True, exist_ok=True)
                    resized = np.nan_to_num(np.clip(resized, 0, 1))
                    cv2.imwrite(str(out_path),
                                (resized * 255).astype(np.uint8))
        return outputs
