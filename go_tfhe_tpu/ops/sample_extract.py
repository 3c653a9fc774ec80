"""Sample extraction: TRLWE -> TLWE at a coefficient index.

Reference: trlwe/trlwe.go:114-128 / trlwe/trlwe_ops.go:10-21.

    out[i] = A[k-i]          for i <= k
    out[i] = ~A[n+k-i]       for i >  k     (NOT-negation, see rotate.py)
    out[n] = B[k]

``k`` is a static Python int (always 0 in the bootstrap pipeline), so this is
a static gather — free under XLA fusion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.torus import torus_not

Array = jax.Array


def sample_extract(trlwe_u32: Array, k: int = 0) -> Array:
    """trlwe_u32: (..., 2, N) uint32 -> (..., N+1) uint32 TLWE (level 1)."""
    n = trlwe_u32.shape[-1]
    a = trlwe_u32[..., 0, :]
    b = trlwe_u32[..., 1, :]
    i = jnp.arange(n)
    src = jnp.mod(k - i, n)
    gathered = a[..., src]
    out_a = jnp.where(i <= k, gathered, torus_not(gathered))
    return jnp.concatenate([out_a, b[..., k:k + 1]], axis=-1)
