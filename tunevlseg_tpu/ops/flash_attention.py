"""Fused flash-attention Pallas TPU kernel (vision-tower hot shape).

Placeholder dispatch for now: returns None so callers fall back to the XLA
einsum path (nn/attention.py). The fused kernel lands behind the same
signature; callers never change.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def flash_attention(q, k, v, bias: Optional[jnp.ndarray] = None):
    return None
