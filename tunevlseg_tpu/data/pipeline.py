"""Host-side input pipeline: threaded decode/augment workers + prefetch.

Replaces torch DataLoader workers (reference image_text_mask_datamodule.py):
  * a thread pool decodes/augments samples (cv2 releases the GIL, so threads
    scale like processes without pickling overhead);
  * batches have FIXED shapes: text pad-to-77 at tokenization, final partial
    batch padded with repeated samples + `valid=0` flags (instead of the
    reference's world-size divisibility error / drop_last);
  * a background prefetcher keeps `prefetch` batches ready so the TPU never
    waits on the host (SURVEY §7 hard part #4).

Epoch shuffling is deterministic from (seed, epoch), the JAX-style explicit
counterpart of Lightning's seed_everything.
"""
from __future__ import annotations

import queue
import threading

import cv2

# each worker thread decodes one image; cv2's internal thread pool would
# oversubscribe the host (threads x cores) — keep cv2 single-threaded
cv2.setNumThreads(0)
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Iterator, Optional

import numpy as np

_ARRAY_KEYS = ("image", "mask", "input_ids", "attention_mask")
_warned_dense_fallback = False


def collate(samples: list[dict[str, Any]], batch_size: int,
            text_dedup: int = 0, strict_dedup: bool = True) -> dict[str, Any]:
    """Stack samples; pad to `batch_size` with repeats + valid=0.

    `text_dedup=U` rewrites the text keys to the batch's unique prompt rows
    padded to the STATIC capacity U, plus an inverse map `text_index` (B,):
    the reference's canonical single-class recipes select one fixed prompt
    per dataset (ImageTextMaskDataset prompt_index,
    src/data/core_datasets/image_text_mask_dataset.py:101-128), so every row
    repeats the same tokens and the model's text tower can run once instead
    of batch_size times (models/clipseg/model.py text_index). When a batch
    holds more than U distinct prompts: `strict_dedup=True` raises (the
    multi-host contract — every host must emit the same layout every step);
    `strict_dedup=False` falls back to the dense layout for THIS batch with
    a one-time warning (the single-host de-footgun, VERDICT r4 #7 — the jit
    cache simply holds both batch signatures)."""
    n = len(samples)
    valid = np.zeros((batch_size,), np.float32)
    valid[:n] = 1.0
    while len(samples) < batch_size:
        samples.append(samples[-1])
    batch: dict[str, Any] = {
        k: np.stack([s[k] for s in samples]) for k in _ARRAY_KEYS
        if k in samples[0]
    }
    batch["valid"] = valid
    if text_dedup and "input_ids" in batch:
        try:
            dedup_text(batch, text_dedup)
        except ValueError:
            if strict_dedup:
                raise
            global _warned_dense_fallback
            if not _warned_dense_fallback:
                _warned_dense_fallback = True
                import logging
                logging.getLogger("tunevlseg").warning(
                    "text_dedup=%d exceeded by a batch's distinct prompts — "
                    "falling back to DENSE text collation for such batches "
                    "(slower; raise data.text_dedup or set it to 0 for "
                    "multi-prompt data). Further fallbacks are silent.",
                    text_dedup)
    # passthrough metadata (lists, not arrays — host-side only)
    for k in ("mask_name", "prompt", "mask_shape"):
        if k in samples[0]:
            batch[k] = [s[k] for s in samples]
    return batch


def dedup_text(batch: dict[str, Any], capacity: int) -> dict[str, Any]:
    """In-place prompt dedup: keep the unique (input_ids, attention_mask)
    rows (padded to `capacity` with repeats of row 0 — padding rows are
    computed but never gathered, so they carry no gradient) and add the
    int32 inverse map `text_index`."""
    ids = batch["input_ids"]
    am = batch.get("attention_mask")
    row_key = {}
    index = np.empty((ids.shape[0],), np.int32)
    keep: list[int] = []
    for i in range(ids.shape[0]):
        key = ids[i].tobytes() + (b"" if am is None else am[i].tobytes())
        j = row_key.setdefault(key, len(keep))
        if j == len(keep):
            keep.append(i)
        index[i] = j
    if len(keep) > capacity:
        raise ValueError(
            f"text_dedup={capacity} but the batch holds {len(keep)} distinct "
            f"prompts — raise data.text_dedup or disable it")
    sel = np.asarray(keep + [keep[0]] * (capacity - len(keep)))
    batch["input_ids"] = ids[sel]
    if am is not None:
        batch["attention_mask"] = am[sel]
    batch["text_index"] = index
    return batch


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        num_workers: int = 8,
        drop_last: bool = False,
        prefetch: int = 2,
        num_shards: int = 1,
        shard_index: int = 0,
        text_dedup: int = 0,
        strict_dedup: Optional[bool] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.text_dedup = text_dedup
        # multi-host collation must be layout-identical on every host every
        # step, so capacity overflow stays a hard error there; single-host
        # falls back to dense with a warning (VERDICT r4 #7)
        self.strict_dedup = (num_shards > 1 if strict_dedup is None
                             else strict_dedup)
        self.epoch = 0
        self.start_batch = 0
        # multi-host: this process loads every num_shards-th sample
        # (DistributedSampler semantics — wraparound padding keeps every
        # shard, and therefore every process's batch count, identical)
        self.num_shards = num_shards
        self.shard_index = shard_index

    def _shard_len(self) -> int:
        return -(-len(self.dataset) // self.num_shards)

    def __len__(self) -> int:
        n = self._shard_len()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int, start_batch: int = 0) -> None:
        """Position the loader at (epoch, start_batch). `start_batch` skips
        that many leading batches of the epoch's deterministic order —
        step-level resume after preemption replays the tail of an
        interrupted epoch without re-training its consumed batches."""
        self.epoch = epoch
        self.start_batch = start_batch

    def _order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            rng.shuffle(idx)
        if self.num_shards > 1:
            total = self._shard_len() * self.num_shards
            idx = np.concatenate([idx, idx[: total - len(idx)]])
            idx = idx[self.shard_index::self.num_shards]
        return idx

    def __iter__(self) -> Iterator[dict[str, Any]]:
        order = self._order()
        nb = len(self)
        out: "queue.Queue[Any]" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            # blocking put that still observes an early consumer exit —
            # otherwise a limit_batches/debug consumer leaves the producer
            # wedged on a full queue forever
            while not stop.is_set():
                try:
                    out.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    pass
            return False

        def producer():
            # lazy submission: keep only a bounded window of batches in
            # flight so decoded samples never accumulate past
            # ~(window+prefetch) batches of RAM even when decode outruns
            # the train step on a many-core host
            window = self.prefetch + 2
            from collections import deque

            with ThreadPoolExecutor(self.num_workers) as pool:
                pending: deque = deque()
                b_next = min(self.start_batch, nb)
                try:
                    while pending or b_next < nb:
                        while b_next < nb and len(pending) < window:
                            lo = b_next * self.batch_size
                            chunk = order[lo:lo + self.batch_size]
                            pending.append([
                                pool.submit(self.dataset.__getitem__, i)
                                for i in chunk])
                            b_next += 1
                        futs = pending.popleft()
                        try:
                            item: Any = collate([f.result() for f in futs],
                                                self.batch_size,
                                                text_dedup=self.text_dedup,
                                                strict_dedup=self.strict_dedup)
                        except Exception as e:  # surface worker errors
                            item = e
                        if not put_or_stop(item) or isinstance(item, Exception):
                            return
                finally:
                    for futs in pending:
                        for f in futs:
                            f.cancel()
            put_or_stop(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def device_batch(batch: dict[str, Any]) -> dict[str, Any]:
    """Strip host-only metadata before shipping to device."""
    return {k: v for k, v in batch.items()
            if k in (*_ARRAY_KEYS, "valid", "text_index")}
