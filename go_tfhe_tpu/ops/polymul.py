"""Exact negacyclic polynomial arithmetic mod 2^32 on the MXU.

This module replaces the reference's float64 negacyclic FFT kernel
(``poly/fourier_transform.go``, ``poly/fourier_ops.go``, ``poly/poly_mul.go``)
with *exact integer* convolutions.  Rationale (TPU-first design):

* TPUs have no fast float64.  A float32 FFT provides ~22-23 effective mantissa
  bits, while the external product needs ~27-28 bits of relative precision
  (conv results reach ~2^41 against a per-step error budget of ~2^13), so a
  float32 FFT — with or without limb splitting — corrupts ciphertexts.
* XLA integer matmuls/convolutions wrap mod 2^32 in two's complement, which is
  *precisely* torus arithmetic.  A negacyclic convolution expressed as an
  int32 (or limb-decomposed int8) convolution is exact: zero FFT noise, which
  strictly improves on the reference's float64 rounding.

The key identity: with D = concat([-K mod 2^32, K]) of length 2N,

    (a (*) K)[n]  =  sum_j a[j] * D[N + n - j]          (X^N = -1)

so the negacyclic product is an ordinary cross-correlation against D — i.e. a
single ``lax.conv_general_dilated`` with kernel width 2N-1 and padding N-1.
XLA lowers that conv onto the MXU with internal VMEM tiling; no Toeplitz
matrix is ever materialized in HBM.

The external product (trgsw/trgsw.go:108-134, evaluator/evaluator.go:50-81)
sums 2L such convolutions; that contraction maps to the conv's input-channel
axis, making the whole external product one conv call:

    out[b, c, n] = sum_r sum_j digits[b, r, j] * D[r, c, N + n - j]

Two data paths:

* generic int32 path — exact for every profile (gadget digits up to 2^22 for
  the Uint profiles);
* int8 fast path — when digits fit int8 (BGBIT <= 8: 80/110/128-bit, uint1,
  test profiles), the kernel is pre-split into 4 balanced int8 limbs and the
  conv runs as int8 x int8 -> int32 on the MXU at full throughput.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.torus import TORUS, to_signed, to_unsigned

Array = jax.Array


# ---------------------------------------------------------------------------
# Kernel construction (keygen-time).
# ---------------------------------------------------------------------------

def _neg_ext(k_u32: Array) -> Array:
    """D = concat([-K mod 2^32, K]) along the last axis, as uint32."""
    return jnp.concatenate([jnp.zeros_like(k_u32) - k_u32, k_u32], axis=-1)


def conv_kernel_from_poly(k_u32: Array) -> Array:
    """Build the width-(2N-1) correlation kernel for one polynomial.

    k_u32: (..., N) uint32  ->  (..., 2N-1) int32 such that
    negacyclic_conv(a, k)[n] = sum_kw a[n + kw - (N-1)] * kernel[kw].
    kernel[kw] = D[2N-1-kw]  (reverse of D dropping D[0], which is unused).
    """
    d = _neg_ext(k_u32)
    return to_signed(d[..., 1:][..., ::-1])


def extprod_kernel_from_trgsw(trgsw_u32: Array) -> Array:
    """TRGSW ciphertext(s) -> conv kernel for the external product.

    trgsw_u32: (..., 2L, 2, N) uint32 (rows ordered [A-gadget rows, B-gadget
    rows] as in trgsw/trgsw.go:51-54; each row is a TRLWE (A, B) pair).

    Returns (..., 2, 2L, 2N-1) int32 arranged as (C_out=A/B, C_in=row, width)
    for ``lax.conv_general_dilated`` with 'OIH' kernel layout.
    """
    k = conv_kernel_from_poly(trgsw_u32)           # (..., 2L, 2, 2N-1)
    return jnp.swapaxes(k, -3, -2)                 # (..., 2, 2L, 2N-1)


def split_signed_limbs_i8(x_i32: Array, num_limbs: int) -> Array:
    """Split SIGNED int32 values into base-256 int8 limbs that reconstruct
    exactly:  sum_i limb[i] * 2^(8i) == x  (as integers, no wraparound).

    The first num_limbs-1 limbs are balanced in [-128, 127]; the last limb
    carries the signed remainder and must fit int8 — guaranteed when
    |x| <= 2^(8*num_limbs - 2) (true for gadget digits: |d| <= half_bg and
    num_limbs = ceil(bgbit/8)).  Unlike :func:`split_balanced_limbs_i8`,
    which reconstructs only mod 2^(8*num_limbs), exactness here is required
    so that digit-limb x kernel-limb products recombine to d*K mod 2^32.
    """
    x = x_i32.astype(jnp.int32)
    limbs = []
    for _ in range(num_limbs - 1):
        l = ((x + 128) & 255) - 128                 # balanced, [-128, 127]
        limbs.append(l.astype(jnp.int8))
        x = (x - l) >> 8                            # arithmetic shift, exact
    limbs.append(x.astype(jnp.int8))
    return jnp.stack(limbs, axis=0)


def split_balanced_limbs_i8(x_i32: Array, num_limbs: int = 4) -> Array:
    """Split int32 values into ``num_limbs`` base-256 balanced int8 limbs.

    Returns (num_limbs, ...) int8 with  sum_i limb[i] * 2^(8i) == x (mod 2^32)
    — the top limb wraps mod 256, which is harmless because its weight is
    2^(8*(num_limbs-1)) and all downstream arithmetic is mod 2^32.
    """
    x = to_unsigned(x_i32)
    limbs = []
    for _ in range(num_limbs):
        lu = (x + jnp.uint32(128)) & jnp.uint32(255)
        l = lu.astype(jnp.int32) - 128              # [-128, 127]
        limbs.append(l.astype(jnp.int8))
        x = (x - to_unsigned(l)) >> jnp.uint32(8)   # exact: x == l (mod 256)
    return jnp.stack(limbs, axis=0)


# ---------------------------------------------------------------------------
# Convolution cores.
# ---------------------------------------------------------------------------

def _conv_nch(lhs: Array, kernel: Array) -> Array:
    """conv: lhs (B, C_in, N) x kernel (C_out, C_in, 2N-1) -> (B, C_out, N),
    int32 accumulation (wraps mod 2^32 — exactly torus arithmetic)."""
    n = lhs.shape[-1]
    return lax.conv_general_dilated(
        lhs, kernel,
        window_strides=(1,),
        padding=[(n - 1, n - 1)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.int32,
    )


def negacyclic_extprod_i32(digits_i32: Array, kernel_i32: Array) -> Array:
    """Generic exact external-product convolution.

    digits_i32: (..., 2L, N) int32 gadget digits.
    kernel_i32: (2, 2L, 2N-1) int32 from :func:`extprod_kernel_from_trgsw`.
    Returns (..., 2, N) uint32 — the TRLWE result mod 2^32.
    """
    lead = digits_i32.shape[:-2]
    c_in, n = digits_i32.shape[-2:]
    lhs = digits_i32.reshape((-1, c_in, n))
    out = _conv_nch(lhs, kernel_i32)
    return to_unsigned(out.reshape(lead + (2, n)))


def negacyclic_extprod_i8(digits_i8: Array, kernel_i8: Array) -> Array:
    """int8 MXU fast path.

    digits_i8: (..., 2L, N) int8 (requires half_bg <= 128).
    kernel_i8: (4, 2, 2L, 2N-1) int8 balanced limbs of the int32 kernel.
    Returns (..., 2, N) uint32.
    """
    lead = digits_i8.shape[:-2]
    c_in, n = digits_i8.shape[-2:]
    nl = kernel_i8.shape[0]
    lhs = digits_i8.reshape((-1, c_in, n))
    # Fold limbs into C_out: (4*2, 2L, 2N-1) -> out (B, 4*2, N).
    kern = kernel_i8.reshape((nl * 2, c_in, kernel_i8.shape[-1]))
    out = _conv_nch(lhs, kern).reshape((-1, nl, 2, n))
    # Recombine limbs: sum_l out_l << (8 l), wrapping mod 2^32.
    acc = to_unsigned(out[:, 0])
    for l in range(1, nl):
        acc = acc + (to_unsigned(out[:, l]) << jnp.uint32(8 * l))
    return acc.reshape(lead + (2, n))


def ext_band_from_trgsw(trgsw_u32: Array) -> Array:
    """TRGSW ciphertext(s) -> signed D bands for the Toeplitz-einsum path.

    trgsw_u32: (..., 2L, 2, N) uint32  ->  (..., 2L, 2, 2N) int32 with
    D = concat([-K mod 2^32, K]).
    """
    return to_signed(_neg_ext(trgsw_u32))


def toeplitz_from_band(d_band: Array) -> Array:
    """Band (..., 2N) -> negacyclic Toeplitz (..., N, N), T[j, n] = D[N+n-j].

    Built with pad + tile + reshape + slice only (no gathers): with
    y = [D, 0_N] of length 3N, rows of y tiled at stride 3N-1 satisfy
    R[j, t] = y[(t - j) mod 3N], and t = N+n never wraps for valid (j, n).
    XLA compiles this to plain copies, which keeps it usable inside scans
    and loops on every backend (convolutions inside loops trigger a
    pathological XLA:CPU compile blow-up).
    """
    n2 = d_band.shape[-1]
    n = n2 // 2
    lead = d_band.shape[:-1]
    y = jnp.concatenate(
        [d_band, jnp.zeros(lead + (n,), d_band.dtype)], axis=-1)
    tiled = jnp.tile(y, (1,) * len(lead) + (n,))
    r = tiled[..., :n * (3 * n - 1)].reshape(lead + (n, 3 * n - 1))
    return r[..., n:2 * n]


def negacyclic_extprod_toeplitz(digits_i32: Array, band_i32: Array) -> Array:
    """Portable exact external product via materialized Toeplitz + einsum.

    digits_i32: (..., 2L, N) int32 gadget digits (any magnitude).
    band_i32:   (2L, 2, 2N) int32 from :func:`ext_band_from_trgsw`.
    Returns (..., 2, N) uint32 — exact mod 2^32 (int32 wraparound dot).
    """
    t = toeplitz_from_band(band_i32)                  # (2L, 2, N, N)
    out = jnp.einsum("...rj,rcjn->...cn", digits_i32, t,
                     preferred_element_type=jnp.int32)
    return to_unsigned(out)


def negacyclic_mul_binary(a_u32: Array, key_u32: Array) -> Array:
    """Negacyclic product with a BINARY polynomial (a ring secret key),
    exact mod 2^32, on the MXU.

    a_u32: (..., N) uint32;  key_u32: (N,) uint32 in {0, 1}.

    The signed band of a binary key has entries in {-1, 0, 1}, so its
    Toeplitz matrix is bf16-exact; ``a`` splits into 4 balanced int8 limbs
    (bf16-exact), each limb product is <= 128 and each f32 partial sum is
    <= N*128 < 2^24 — everything integer-exact, recombined mod 2^32.

    This is the keygen hot path (TRGSW encryption of every LWE key bit,
    cloudkey/cloudkey.go:123-145): the general int32-convolution form
    (:func:`negacyclic_mul_fixed`) does not map to the MXU and made 128-bit
    keygen ~90 s; this form is one batched bf16 matmul.
    """
    lead = a_u32.shape[:-1]
    n = a_u32.shape[-1]
    t = toeplitz_from_band(ext_band_from_trgsw(key_u32)).astype(jnp.bfloat16)
    limbs = split_balanced_limbs_i8(to_signed(a_u32), 4)       # (4, ..., N)
    lhs = limbs.reshape((4, -1, n)).astype(jnp.bfloat16)
    outs = jnp.einsum("lbj,jn->lbn", lhs, t,
                      preferred_element_type=jnp.float32).astype(jnp.int32)
    acc = to_unsigned(outs[0])
    for l in range(1, 4):
        acc = acc + (to_unsigned(outs[l]) << jnp.uint32(8 * l))
    return acc.reshape(lead + (n,))


def negacyclic_mul_fixed(a_u32: Array, k_u32: Array) -> Array:
    """Negacyclic product of batched polynomials with one fixed polynomial.

    a_u32: (..., N) uint32;  k_u32: (N,) uint32.  Exact mod 2^32.
    Replaces poly.Evaluator.MulPoly (poly/poly_mul.go:12-22) for the
    encrypt/decrypt path (a * secret_key with binary key).
    """
    lead = a_u32.shape[:-1]
    n = a_u32.shape[-1]
    lhs = to_signed(a_u32).reshape((-1, 1, n))
    kernel = conv_kernel_from_poly(k_u32)[None, None, :]   # (1, 1, 2N-1)
    out = _conv_nch(lhs, kernel)
    return to_unsigned(out.reshape(lead + (n,)))
