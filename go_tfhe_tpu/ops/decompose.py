"""Signed gadget decomposition (batched).

Decomposes torus polynomials into L signed base-2^BGBIT digits in
[-Bg/2, Bg/2), exactly as ``DecomposePolyAssign`` (poly/decomposer.go:55-66)
and ``decompositionInPlace`` (trgsw/trgsw.go:137-169):

    tmp      = x + offset                        (uint32, wraps)
    digit_i  = ((tmp >> (32-(i+1)*BGBIT)) & (Bg-1)) - Bg/2

Digits come out as int32 (true signed values), ready for the integer
convolution in :mod:`.polymul`.  Row order matches the reference's external
product: [A digits level 0..L-1, then B digits level 0..L-1]
(evaluator/evaluator.go:59-61).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params import TFHEParams

Array = jax.Array


def gadget_decompose(x_u32: Array, p: TFHEParams) -> Array:
    """x_u32: (..., C, N) uint32  ->  (..., C*L, N) int32 digits."""
    shifts = jnp.asarray(
        [32 - (i + 1) * p.bgbit for i in range(p.l)], dtype=jnp.uint32)
    tmp = x_u32 + jnp.uint32(p.decomposition_offset)
    # (..., C, 1, N) >> (L, 1) -> (..., C, L, N)
    d = (tmp[..., :, None, :] >> shifts[:, None]) & jnp.uint32(p.bg - 1)
    d = d.astype(jnp.int32) - p.half_bg
    lead = x_u32.shape[:-2]
    c, n = x_u32.shape[-2], x_u32.shape[-1]
    return d.reshape(lead + (c * p.l, n))
