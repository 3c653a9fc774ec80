"""Look-up tables and programmable bootstrapping (PBS).

Reference: lut/encoder.go, lut/generator.go, lut/lut.go,
evaluator/programmable_bootstrap.go.

A LookUpTable is a *trivial* TRLWE ciphertext (A = 0) whose B polynomial
encodes the function (lut/lut.go:14-17, lut/generator.go:94-99).  LUT
generation is host-side precompute (numpy, float64-exact like the Go code);
the PBS itself is the same jitted blind-rotate engine with the LUT as the
test vector (evaluator/programmable_bootstrap.go:93-115).

Because the engine is batched, a *batch of different LUTs* can be applied to
a batch of ciphertexts in one call (testvec shape (..., 2, N)) — a capability
the reference's scalar loop cannot express.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from . import engine
from .keys import CloudKey
from .params import TFHEParams
from .utils.torus import f64_to_torus, torus_to_f64

Array = jax.Array


def _div_round(a: int, b: int) -> int:
    """lut/generator.go:171-173."""
    return (a + b // 2) // b


class Encoder:
    """Message-space encoder (lut/encoder.go:9-37): scale = 1/(2m)."""

    def __init__(self, message_modulus: int, scale: float | None = None):
        self.message_modulus = message_modulus
        self.scale = (1.0 / (2 * message_modulus)) if scale is None else scale

    def encode(self, message: int) -> np.uint32:
        """message -> T(message * scale)  (lut/encoder.go:47-75)."""
        message = message % self.message_modulus
        return f64_to_torus(float(message) * self.scale)

    def encode_with_custom_scale(self, message: int, scale: float) -> np.uint32:
        message = message % self.message_modulus
        return f64_to_torus(float(message) * scale)

    def decode(self, value) -> int:
        """lut/encoder.go:88-102: round(f/scale) to nearest message."""
        f = float(torus_to_f64(np.uint32(value)))
        return int(f / self.scale + 0.5) % self.message_modulus

    def decode_bool(self, value) -> bool:
        return self.decode(value) != 0


class Generator:
    """LUT generator (lut/generator.go:10-28).

    Unlike the reference — where LookUpTableSize == PolyDegree always and
    the extended LUTs promised for Uint6-8 are unimplemented
    (lut/generator.go:19-21, params/UINT_STATUS.md:20-31) — this generator
    builds real extended tables when ``poly_extend_factor > 1``: the
    size-kN table is interleaved into k trivial TRLWE blocks consumed by
    :func:`go_tfhe_tpu.ops.blindrotate.blind_rotate_extended`.
    """

    def __init__(self, p: TFHEParams, message_modulus: int | None = None,
                 scale: float | None = None):
        m = p.message_modulus if message_modulus is None else message_modulus
        self.params = p
        self.encoder = Encoder(m, scale)
        self.poly_degree = p.n
        self.extend_factor = p.poly_extend_factor
        self.lut_size = p.lut_size

    # -- core table construction (lut/generator.go:56-100) ------------------

    def _build(self, values_torus: np.ndarray) -> Array:
        """values_torus: per-message torus encodings, shape (m,)."""
        m = len(values_torus)
        size = self.lut_size
        raw = np.zeros((size,), np.uint32)
        for x in range(m):
            start = _div_round(x * size, m)
            end = _div_round((x + 1) * size, m)
            raw[start:end] = values_torus[x]
        offset = _div_round(size, 2 * m)
        rotated = np.roll(raw, -offset)          # rotated[i] = raw[i+offset]
        rotated[size - offset:] = (-rotated[size - offset:].astype(np.int64)
                                   ).astype(np.uint32)
        k = self.extend_factor
        if k == 1:
            lut = np.zeros((2, size), np.uint32)
            lut[1] = rotated
        else:
            # Interleave big[j] -> block[j % k][j // k] (monomial_mul_blocks
            # layout): blocks = (k, N).
            lut = np.zeros((k, 2, self.poly_degree), np.uint32)
            lut[:, 1, :] = rotated.reshape(self.poly_degree, k).T
        return jnp.asarray(lut)

    def gen_lut(self, f: Callable[[int], int]) -> Array:
        """f: message -> message; returns a trivial TRLWE (2, N) uint32."""
        vals = np.asarray([self.encoder.encode(f(x))
                           for x in range(self.encoder.message_modulus)],
                          np.uint32)
        return self._build(vals)

    def gen_lut_full(self, f: Callable[[int], int]) -> Array:
        """f: message -> raw torus value (lut/generator.go:102-141)."""
        vals = np.asarray([np.uint32(f(x))
                           for x in range(self.encoder.message_modulus)],
                          np.uint32)
        return self._build(vals)

    def gen_lut_custom(self, f: Callable[[int], int], message_modulus: int,
                       scale: float) -> Array:
        """lut/generator.go:143-155.

        Uses a throwaway local Encoder — ``self.encoder`` is never touched,
        so a shared Generator stays reentrant."""
        enc = Encoder(message_modulus, scale)
        vals = np.asarray([enc.encode(f(x)) for x in range(message_modulus)],
                          np.uint32)
        return self._build(vals)

    def mod_switch(self, x) -> int:
        """Torus -> [0, lut_size) with rounding (lut/generator.go:157-168).

        Go's math.Round rounds half AWAY from zero (x >= 0 here, so
        floor(x+0.5)) — Python's round() would banker's-round exact halves
        the other way and break bit parity.
        """
        import math
        scaled = float(np.uint32(x)) / float(1 << 32) * self.lut_size
        return int(math.floor(scaled + 0.5)) % self.lut_size


# ---------------------------------------------------------------------------
# Programmable bootstrapping.
# ---------------------------------------------------------------------------

def bootstrap_lut(ck: CloudKey, ct: Array, lut: Array) -> Array:
    """PBS with a precomputed LUT (evaluator/programmable_bootstrap.go:50-115).

    lut: (2, N) shared, or (..., 2, N) per-ciphertext.
    """
    return engine.bootstrap(ck, ct, testvec=lut)


def bootstrap_func(ck: CloudKey, ct: Array, f: Callable[[int], int],
                   message_modulus: int) -> Array:
    """PBS evaluating f on the message space
    (evaluator/programmable_bootstrap.go:16-30)."""
    gen = Generator(ck.params, message_modulus)
    return bootstrap_lut(ck, ct, gen.gen_lut(f))
