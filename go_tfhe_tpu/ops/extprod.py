"""External product and CMUX on TRLWE ciphertexts (batched, exact).

external_product: decompose -> one integer convolution -> accumulate
(reference: trgsw/trgsw.go:108-134, evaluator/evaluator.go:50-81 — there it is
decompose -> 2L FFTs -> pointwise FMA -> 2 IFFTs; here the whole contraction
is a single MXU convolution, see :mod:`.polymul`).

CMUX(cond, ct0, ct1) = ct0 + cond (*) (ct1 - ct0)
(trgsw/trgsw.go:173-194, evaluator/evaluator.go:85-106).

The TRGSW operand is pre-converted at keygen time to its signed D band
(the analogue of the reference storing the bootstrapping key in FFT form,
trgsw/trgsw.go:71-82): shape (2L, 2, 2N) int32.  This portable path
materializes the Toeplitz form per call and contracts with an int32 einsum
(exact mod 2^32 for every profile); the TPU hot loop uses the fused Pallas
kernel in :mod:`.pallas_extprod` instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params import TFHEParams
from .decompose import gadget_decompose
from .polymul import negacyclic_extprod_toeplitz

Array = jax.Array


def external_product(p: TFHEParams, band: Array, trlwe_u32: Array) -> Array:
    """band (x) trlwe: (..., 2, N) uint32 -> (..., 2, N) uint32."""
    digits = gadget_decompose(trlwe_u32, p)          # (..., 2L, N) int32
    return negacyclic_extprod_toeplitz(digits, band)


def cmux(p: TFHEParams, band: Array, ct0: Array, ct1: Array) -> Array:
    """if cond==0: ct0 else ct1 (homomorphically):
    ct0 + cond (x) (ct1 - ct0)."""
    return ct0 + external_product(p, band, ct1 - ct0)
