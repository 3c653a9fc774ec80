"""Torus <-> float conversions and signed/unsigned helpers.

The torus T = R/Z is discretized to 32 bits: a torus element is a
``uint32`` and all arithmetic wraps mod 2^32 (reference ``params/params.go:27``,
``utils/utils.go:11-19``).

Two conversion flavors exist here:

* Host-side (numpy, float64) — bit-exact with the Go reference, used for all
  *plaintext* encodings (test vectors, LUTs, key-switch tables).  Go's
  ``F64ToTorus`` is ``Torus(int64(math.Mod(d,1) * 2^32))`` — i.e. fmod keeping
  the sign, times 2^32, truncated toward zero, wrapped (utils/utils.go:11-14).
* Traced (jax, float32) — used only for *noise* sampling inside jitted code,
  where float32 precision is ample (noise is random; its quantization to the
  torus grid is unaffected for every alpha in the profile registry).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

TORUS = jnp.uint32
MOD32 = 1 << 32


# ---------------------------------------------------------------------------
# Host-side (exact, float64) — matches Go bit-for-bit.
# ---------------------------------------------------------------------------

def f64_to_torus(d) -> np.uint32:
    """utils/utils.go:11-14: Torus(int64(math.Mod(d, 1.0) * 2^32))."""
    d = np.asarray(d, dtype=np.float64)
    t = np.fmod(d, 1.0) * float(MOD32)
    return (np.trunc(t).astype(np.int64)).astype(np.uint32)


def torus_to_f64(t) -> np.float64:
    """utils/utils.go:17-19: float64(t) / 2^32, in [0, 1)."""
    return np.asarray(t, dtype=np.uint64).astype(np.float64) / float(MOD32)


def f64_to_torus_vec(d) -> np.ndarray:
    """utils/utils.go:22-28."""
    return f64_to_torus(np.asarray(d, dtype=np.float64))


# ---------------------------------------------------------------------------
# Traced (jax) — for noise only.
# ---------------------------------------------------------------------------

def f32_to_torus_traced(d: jax.Array) -> jax.Array:
    """Traced float->torus with truncation toward zero (matches Go int64()).

    Inputs must satisfy |fmod(d,1) * 2^32| < 2^31 so the int32 convert is
    exact; true for all noise samples at every registered alpha.
    """
    t = jnp.fmod(d.astype(jnp.float32), 1.0) * jnp.float32(MOD32)
    return jnp.trunc(t).astype(jnp.int32).astype(TORUS)


# ---------------------------------------------------------------------------
# Signed/unsigned views.
# ---------------------------------------------------------------------------

def to_signed(x: jax.Array) -> jax.Array:
    """Bit-preserving uint32 -> int32 view."""
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def to_unsigned(x: jax.Array) -> jax.Array:
    """Bit-preserving int32 -> uint32 view."""
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def torus_not(x: jax.Array) -> jax.Array:
    """The reference's cheap negation ``^Torus(0) - a`` == bitwise NOT == -a-1
    (mod 2^32).  Used by monomial rotation (trgsw/trgsw.go:270,277) and sample
    extraction (trlwe/trlwe.go:122); NOT the exact negation -a."""
    return ~x
