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


def sample_extract_to_lv0(trlwe_u32: Array, lwe_n: int, k: int = 0) -> Array:
    """Direct TRLWE -> TLWE *level 0* extraction (SampleExtractIndex2,
    trlwe/trlwe.go:133-154).

    Only valid when the ring degree equals the level-0 LWE dimension
    (``N == lwe_n``) — i.e. when the ring key IS the level-0 key.  The
    reference panics on a dimension mismatch (trlwe/trlwe.go:140-142); here
    it is a ValueError raised at trace time.  For mismatched dimensions use
    ``sample_extract`` + identity key switching instead.
    """
    n = trlwe_u32.shape[-1]
    if n != lwe_n:
        raise ValueError(
            f"sample_extract_to_lv0: TRLWE degree {n} != lwe_n {lwe_n} — "
            "use sample_extract + identity_key_switch instead "
            "(trlwe/trlwe.go:140-142)")
    return sample_extract(trlwe_u32, k)
