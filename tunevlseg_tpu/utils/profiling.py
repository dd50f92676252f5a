"""Profiling helpers — the replacement for Lightning's profiler configs
(reference configs/debug/profiler.yaml; SURVEY §5.1).

`trace(logdir)` wraps a code region in a jax.profiler trace (viewable in
TensorBoard / Perfetto); `timed` measures wall time with a real device sync
(a scalar device->host read — `block_until_ready` is unreliable on the
experimental axon TPU platform)."""
from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_sync() -> None:
    """Force completion of all enqueued work (axon-safe barrier)."""
    float(jnp.zeros(()) + 0.0)


@contextlib.contextmanager
def timed(label: str = "region") -> Iterator[dict]:
    result: dict = {"label": label}
    device_sync()
    t0 = time.perf_counter()
    try:
        yield result
    finally:
        device_sync()
        result["seconds"] = time.perf_counter() - t0
