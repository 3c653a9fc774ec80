"""Negacyclic monomial multiplication  p(X) -> X^k * p(X).

Batched TPU replacement for ``polyMulWithXKInPlace`` (trgsw/trgsw.go:254-282,
poly/buffer_methods.go:133-164).  The rotation amount ``k`` is a traced value
(it comes from mod-switched ciphertext coefficients) and differs per batch
element, so this is a per-row gather plus a sign mask — pure VPU work.

Faithful to the reference, the wrapped coefficients use the cheap negation
``^Torus(0) - a`` (bitwise NOT, i.e. -a-1 mod 2^32) rather than exact -a; the
1-ulp offset is far below the noise floor and keeping it preserves bit-exact
parity with Go on deterministic sub-kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.torus import torus_not

Array = jax.Array


def monomial_mul(poly: Array, k: Array) -> Array:
    """Multiply polynomials by X^k (negacyclic, NOT-negation).

    poly: (..., N) uint32.
    k:    int32, broadcastable to poly.shape[:-1]; interpreted mod 2N.

    For k in [0, N):   out[i] = p[i-k]        for i >= k
                       out[i] = ~p[i-k+N]     for i <  k
    For k in [N, 2N):  signs flipped (trgsw/trgsw.go:262-281).
    """
    n = poly.shape[-1]
    k = jnp.asarray(k, jnp.int32)
    k2 = jnp.mod(k, 2 * n)
    r = jnp.mod(k2, n)[..., None]                       # (..., 1)
    flip = (k2 >= n)[..., None]                         # (..., 1)
    i = jnp.arange(n, dtype=jnp.int32)
    src = jnp.mod(i - r, n)                             # (..., N)
    shape = jnp.broadcast_shapes(poly.shape, src.shape)
    gathered = jnp.take_along_axis(
        jnp.broadcast_to(poly, shape), jnp.broadcast_to(src, shape), axis=-1)
    neg = (i < r) ^ flip
    return jnp.where(neg, torus_not(gathered), gathered)


def monomial_mul_blocks(acc: Array, t: Array, k: int) -> Array:
    """Rotate an *extended* (degree k*N) negacyclic polynomial by X^t.

    The big polynomial P(X) mod X^(kN)+1 is stored interleaved as k blocks
    P_r(Y) with Y = X^k:  P(X) = sum_r X^r P_r(X^k), i.e.
    big[j] == block[j % k][j // k].  Rotation by X^t is then a block
    permutation plus per-block negacyclic Y-rotations:

        out_block[r'] = Y^q * block[r],  r = (r'-t) mod k,  q = (t+r-r')/k

    (q >= 0 because t >= 0 and t+r-r' is a multiple of k greater than -k).
    This is the mechanism behind LookUpTableSize = polyExtendFactor * N —
    the feature the reference's params advertise for Uint6-8 but never
    implement (lut/generator.go:19-21, params/UINT_STATUS.md:20-31).

    acc: (..., k, C, N) uint32 (C = 2 for TRLWE blocks).
    t:   int32, broadcastable to acc.shape[:-3]; interpreted mod 2kN.
    """
    n = acc.shape[-1]
    t = jnp.mod(jnp.asarray(t, jnp.int32), 2 * k * n)
    r_out = jnp.arange(k, dtype=jnp.int32)                      # (k,)
    r_src = jnp.mod(r_out - t[..., None], k)                    # (..., k)
    q = (t[..., None] + r_src - r_out) // k                     # (..., k)
    idx = jnp.broadcast_to(r_src[..., None, None],
                           acc.shape[:-3] + (k,) + acc.shape[-2:])
    gathered = jnp.take_along_axis(acc, idx, axis=-3)
    return monomial_mul(gathered, q[..., None])                 # over (C, N)


def _block_rotate_static(acc: Array, shift: int, k: int) -> Array:
    """Rotate the interleaved big polynomial by X^shift with STATIC shift.

    acc: (..., k, C, N).  shift in [0, 2kN).  With s = shift % k and
    q = shift // k:  out_block[r'] = Y^(q+1) block[r'-s+k] for r' < s,
    Y^q block[r'-s] otherwise — all static slices/concats (TPU friendly).
    """
    n = acc.shape[-1]
    s, q = shift % k, shift // k

    def rot_y(x: Array, amount: int) -> Array:
        amount = amount % (2 * n)
        flip = amount >= n
        a = amount % n
        if a:
            x = jnp.concatenate(
                [torus_not(x[..., n - a:]), x[..., :n - a]], axis=-1)
        return torus_not(x) if flip else x

    lo = acc[..., k - s:, :, :] if s else None    # wraps: Y^(q+1)
    hi = acc[..., :k - s, :, :]                   # plain:  Y^q
    parts = []
    if s:
        parts.append(rot_y(lo, q + 1))
    parts.append(rot_y(hi, q))
    return jnp.concatenate(parts, axis=-3) if s else rot_y(hi, q)


def monomial_mul_blocks_log(acc: Array, t: Array, k: int) -> Array:
    """TPU fast path of :func:`monomial_mul_blocks`: compose static
    X^(2^j) rotations selected by the bits of t (no dynamic gathers).

    Bit-exact with monomial_mul_blocks for every t — each wraparound applies
    x -> ~x, and wrap parity composes identically (see monomial_mul_log).

    acc: (..., k, C, N) uint32;  t: int32 broadcastable to acc.shape[:-3].
    """
    n = acc.shape[-1]
    big = 2 * k * n
    nbits = (big - 1).bit_length()
    t = jnp.mod(jnp.asarray(t, jnp.int32), big)
    out = acc
    for j in range(nbits):
        shift = (1 << j) % big
        rolled = _block_rotate_static(out, shift, k)
        bit = (((t >> j) & 1) > 0)[..., None, None, None]
        out = jnp.where(bit, rolled, out)
    return out


def monomial_mul_log(poly: Array, k: Array) -> Array:
    """Rotation by X^k via bit decomposition of k — TPU fast path.

    Composes static rotations by 2^j selected by the bits of k.  Dynamic
    per-row gathers are catastrophically slow on TPU; static shifts compile
    to slice+concat and the per-bit select is pure VPU work.

    Bit-exact with :func:`monomial_mul` for any k (mod 2N): each wraparound
    applies x -> ~x = -x-1; composing w wraps yields x when w is even and
    ~x when odd — identical to the single-rotation rule, for every
    coefficient and any bit pattern.
    """
    n = poly.shape[-1]
    nbit = n.bit_length() - 1
    k = jnp.asarray(k, jnp.int32)
    out = poly
    for j in range(nbit + 1):                           # shifts 1, 2, ..., N
        s = 1 << j
        if s < n:
            rolled = jnp.concatenate(
                [torus_not(out[..., n - s:]), out[..., :n - s]], axis=-1)
        else:                                           # X^N == -1
            rolled = torus_not(out)
        bit = (((k >> j) & 1) > 0)[..., None]
        out = jnp.where(bit, rolled, out)
    return out
