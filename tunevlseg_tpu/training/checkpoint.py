"""Orbax checkpointing: best/last management + resume.

Replaces Lightning's ModelCheckpoint (reference configs/callbacks/
default.yaml:8-14 — monitor val_dice max, save_last) with async orbax saves
of {trainable, opt_state, step, epoch, frozen_hash} plus a `meta.json`.
Frozen params are NOT duplicated per checkpoint: they are written once per
run (they never change during prompt tuning)."""
from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str | Path, monitor: str = "val_dice",
                 mode: str = "max", save_last: bool = True):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.save_last = save_last
        self.best_value: Optional[float] = None
        self._ckptr = ocp.StandardCheckpointer()
        # (tag, staging_path, meta) for async saves not yet swapped into
        # their tag directory — see save() for the crash-safety contract
        self._pending: list[tuple[str, Path, dict]] = []

    def _is_better(self, value: float) -> bool:
        if self.best_value is None:
            return True
        return value > self.best_value if self.mode == "max" else \
            value < self.best_value

    def _drain(self) -> None:
        """Wait for the in-flight async save, then atomically promote any
        staged checkpoint into its tag directory and write its meta.json.

        Promotion order (every step an atomic same-dir rename): old tag ->
        .old-{tag}, staging -> tag, write meta, delete .old-{tag}. A crash
        at ANY point leaves a recoverable layout — the only gap (tag absent,
        .old- present) is healed by the recovery sweep at the next drain.

        Multi-host: orbax coordinates the collective save itself; the
        host-side directory surgery must run on exactly ONE process
        (process 0) or the renames race. Other processes still drain their
        async machinery and barrier so nobody restores mid-promotion."""
        self._ckptr.wait_until_finished()
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("ckpt_drain_saved")
        if jax.process_index() == 0:
            for tag, staging, meta in self._pending:
                final = self.dir / tag
                old = self.dir / f".old-{tag}"
                if old.exists():          # recovery from a previous crash
                    shutil.rmtree(old)
                if final.exists():
                    final.rename(old)
                staging.rename(final)
                # atomic meta write: a crash mid-write must not leave a
                # truncated JSON that breaks resume (load_meta would raise)
                meta_tmp = self.dir / f".{tag}.json.tmp"
                meta_tmp.write_text(json.dumps(meta, default=float))
                meta_tmp.rename(self.dir / f"{tag}.json")
                if old.exists():
                    shutil.rmtree(old)
            # heal the crash gap: tag missing but .old- preserved
            for old in self.dir.glob(".old-*"):
                final = self.dir / old.name[len(".old-"):]
                if not final.exists():
                    old.rename(final)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("ckpt_drain_promoted")
        self._pending.clear()

    def wait(self) -> None:
        """Drain any in-flight async save and finalize staged checkpoints
        (call before reading checkpoints or ending the run)."""
        self._drain()

    def _save_in_flight(self) -> bool:
        # orbax private: the async manager's background commit thread. If
        # the API shifts, fall back to "assume in flight" — poll() then
        # does nothing and promotion happens at the next blocking drain.
        am = getattr(self._ckptr, "_async_manager", None)
        t = getattr(am, "_thread", "unknown") if am is not None else "unknown"
        if t == "unknown":
            return True
        return t is not None and t.is_alive()

    def poll(self) -> None:
        """NON-blocking promotion: if the background write already finished,
        promote staged checkpoints now — an interval snapshot becomes
        durable on the first step after its write completes instead of
        waiting for the next save's drain. Returns immediately while a
        write is still in flight. Multi-host: skipped (the drain's barriers
        are collective; hosts could disagree on thread-doneness and
        deadlock) — promotion there stays at the synchronized drains."""
        if jax.process_count() > 1 or not self._pending:
            return
        if not self._save_in_flight():
            self._drain()

    def save_frozen(self, frozen: Any) -> None:
        path = self.dir / "frozen"
        if not path.exists():
            self._ckptr.save(path.resolve(), frozen)
            self._ckptr.wait_until_finished()

    def save(self, tag: str, state: Any, extra: dict) -> None:
        """ASYNC save: orbax serializes device arrays in a background thread
        so the next epoch's compute overlaps the write (the reference's
        Lightning ModelCheckpoint blocks the loop). The write lands in a
        STAGING directory; the swap into the tag (and the meta.json write)
        happens only at the next drain point, after wait_until_finished —
        a crash during the epoch-long async window therefore keeps the old
        checkpoint intact instead of losing both."""
        self._drain()
        staging = (self.dir / f".staging-{tag}").resolve()
        if staging.exists() and jax.process_index() == 0:
            shutil.rmtree(staging)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("ckpt_staging_clear")
        payload = {"trainable": state.trainable, "opt_state": state.opt_state,
                   "step": state.step, "rng": state.rng,
                   "model_state": state.model_state}
        self._ckptr.save(staging, payload)
        # best_value rides every meta so a resumed run never demotes the
        # historical best on its first validation
        meta = {"best_value": self.best_value, **extra}
        self._pending.append((tag, staging, meta))

    def maybe_save_best(self, state: Any, metrics: dict, epoch: int,
                        extra: Optional[dict] = None) -> bool:
        value = float(metrics[self.monitor])
        improved = self._is_better(value)
        meta = {"epoch": epoch, **(extra or {}),
                **{k: float(v) for k, v in metrics.items()}}
        if improved:
            self.best_value = value
            self.save("best", state, meta)
        if self.save_last:
            self.save("last", state, meta)
        return improved

    def load_meta(self, tag: str) -> dict:
        self._drain()
        path = self.dir / f"{tag}.json"
        if not path.exists():
            return {}
        return json.loads(path.read_text())

    def restore(self, tag: str, state_like: Any) -> Any:
        self._drain()
        path = (self.dir / tag).resolve()
        payload = {"trainable": state_like.trainable,
                   "opt_state": state_like.opt_state,
                   "step": state_like.step,
                   "model_state": state_like.model_state}
        # older checkpoints may predate the rng leaf; fall back to the
        # rng-less layout if the structure doesn't match
        try:
            restored = self._ckptr.restore(
                path, dict(payload, rng=state_like.rng))
        except Exception:
            restored = self._ckptr.restore(path, payload)
        return state_like._replace(trainable=restored["trainable"],
                                   opt_state=restored["opt_state"],
                                   step=restored["step"],
                                   rng=restored.get("rng", state_like.rng),
                                   model_state=restored.get(
                                       "model_state", state_like.model_state))

    def restore_frozen(self, frozen_like: Any) -> Any:
        return self._ckptr.restore((self.dir / "frozen").resolve(),
                                   frozen_like)
