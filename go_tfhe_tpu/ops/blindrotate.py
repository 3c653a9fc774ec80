"""Blind rotation — the bootstrap hot loop, batched over ciphertexts.

Reference: evaluator/evaluator.go:110-135 (and the legacy allocating engine at
trgsw/trgsw.go:197-224).  Per input LWE coefficient the accumulator is rotated
by the mod-switched coefficient and CMUXed with the corresponding
bootstrapping-key row.  The n_lwe iterations are inherently sequential (each
CMUX feeds the next), so on TPU the loop is a ``lax.fori_loop`` inside one jit
and *throughput* comes from the batch axis: every step is a batched rotation +
one MXU convolution over all B ciphertexts at once (this replaces the
reference's goroutine-per-ciphertext fan-out, trgsw/trgsw.go:227-252).

Mod switch (evaluator/evaluator.go:116,122):
    b~ = 2N - ((b + 2^(31-NBIT-1)) >> (32-NBIT-1))
    a~ =      ((a + 2^(31-NBIT-1)) >> (32-NBIT-1))
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..params import TFHEParams
from ..utils.torus import to_signed
from .decompose import gadget_decompose
from .extprod import cmux, external_product
from .pallas_ext import rotate_decompose_ext_pallas
from .pallas_extprod import extprod_pallas
from .pallas_rotate import rotate_decompose_pallas
from .pallas_t import (extprod_ext_t, extprod_t, rotate_decompose_ext_t,
                       rotate_decompose_t)
from .pallas_step import fused_rotate_step
from .polymul import negacyclic_extprod_toeplitz, split_signed_limbs_i8
from .rotate import (monomial_mul, monomial_mul_blocks,
                     monomial_mul_blocks_log, monomial_mul_log)

Array = jax.Array

# Use the single fused rotate+decompose+extprod kernel (ops/pallas_step.py)
# in blind_rotate_tpu instead of the two-kernel composition.  OFF by
# default — measured on the v5e the fused cell runs the VPU rotation and
# the MXU contraction SERIALLY (1,124 us/step vs 559+161 for the parts;
# Mosaic does not overlap the two units within one cell body), so the
# two-kernel composition is ~40% faster end-to-end.  The kernel remains
# the measured evidence for that scheduling behavior and the natural
# restart point if the compiler learns to co-schedule.
FUSED_STEP = False


def mod_switch_2n(x_u32: Array, p: TFHEParams, theta: int = 0) -> Array:
    """Torus -> [0, 2N] rounding mod-switch; returns int32.

    ``theta > 0`` rounds to MULTIPLES of 2^theta (the PBSmanyLUT coarse
    mod-switch): the blind rotation then lands on a 2^theta-aligned
    position, so accumulator coefficients 0..2^theta-1 read an
    interleaved multi-function test vector (lut.Generator.gen_multi_lut)
    and one rotation yields up to 2^theta function outputs via
    sample extraction at those indices.  Costs 2^theta x the mod-switch
    rounding noise (engine.bootstrap_many docstring)."""
    shift = p.mod_switch_shift + theta
    off = 1 << (shift - 1)
    coarse = (x_u32 + jnp.uint32(off)) >> jnp.uint32(shift)
    return (coarse << jnp.uint32(theta)).astype(jnp.int32)


def mod_switch_general(x_u32: Array, modulus: int) -> Array:
    """Torus -> [0, modulus] rounding mod-switch for ANY modulus <= 2^17.

    ms(x) = floor((x*M + 2^31) / 2^32), computed exactly in uint32 by
    splitting x into 16-bit halves (needed for non-power-of-two extended
    LUT sizes, e.g. Uint8's polyExtendFactor=9 -> 2kN = 36864).
    Coincides bit-exactly with the shift form when M is a power of two.
    """
    assert modulus <= 1 << 17
    m = jnp.uint32(modulus)
    a_hi = x_u32 >> jnp.uint32(16)
    a_lo = x_u32 & jnp.uint32(0xFFFF)
    acc = a_hi * m + ((a_lo * m) >> jnp.uint32(16)) + jnp.uint32(1 << 15)
    return (acc >> jnp.uint32(16)).astype(jnp.int32)


def blind_rotate(p: TFHEParams, bsk_bands: Array, ct: Array,
                 testvec: Array, theta: int = 0) -> Array:
    """Blind-rotate a batch of LWE ciphertexts (portable path).
    ``theta``: coarse mod-switch exponent for multi-LUT extraction
    (mod_switch_2n).

    bsk_bands: (n_lwe, 2L, 2, 2N) int32 signed D bands from keygen.
    ct:        (..., n_lwe+1) uint32 LWE ciphertexts (last word = b).
    testvec:   (2, N) or (..., 2, N) uint32 test vector (shared or per-ct,
               the latter for per-ciphertext PBS LUTs).

    Returns (..., 2, N) uint32 TRLWE accumulators.
    """
    n_lwe = p.lwe_n
    lead = ct.shape[:-1]

    # Dynamic per-row gathers are catastrophically slow on TPU; the log form
    # composes static slice/concat rotations selected by the bits of the
    # amount (bit-exact with monomial_mul, see rotate.py).  This keeps the
    # portable path viable on a TPU host for profiles the Pallas kernel
    # does not cover (e.g. N not a multiple of 256).
    rot = (monomial_mul_log if jax.default_backend() == "tpu"
           else monomial_mul)

    b_tilda = 2 * p.n - mod_switch_2n(ct[..., n_lwe], p, theta)   # (...,)
    acc = rot(
        jnp.broadcast_to(testvec, lead + (2, p.n)), b_tilda[..., None])

    a_tilda = mod_switch_2n(ct[..., :n_lwe], p, theta)         # (..., n_lwe)

    def body(i, acc):
        rotated = rot(acc, a_tilda[..., i][..., None])
        band = lax.dynamic_index_in_dim(bsk_bands, i, axis=0, keepdims=False)
        return cmux(p, band, acc, rotated)

    return lax.fori_loop(0, n_lwe, body, acc)


def blind_rotate_extended(p: TFHEParams, bsk_bands: Array, ct: Array,
                          lut_blocks: Array) -> Array:
    """Blind rotation over an EXTENDED look-up table of size k*N.

    Implements the polyExtendFactor mechanism the reference advertises for
    Uint6-8 but never built (params/UINT_STATUS.md:20-31,
    lut/generator.go:19-21): the accumulator is a vector of k TRLWE blocks
    storing the interleaved big polynomial (see monomial_mul_blocks); each
    CMUX applies the same TRGSW external product block-wise; the mod switch
    targets [0, 2kN).

    bsk_bands:  (n_lwe, 2L, 2, 2N) int32 signed D bands.
    ct:         (..., n_lwe+1) uint32.
    lut_blocks: (k, 2, N) or (..., k, 2, N) uint32 trivial TRLWE blocks.

    Returns (..., k, 2, N) uint32; the bootstrap result is block 0's
    sample extraction at index 0 (big-poly coefficient 0 lives there).
    """
    n_lwe = p.lwe_n
    k = p.poly_extend_factor
    big_mod = 2 * k * p.n
    lead = ct.shape[:-1]

    # Dynamic per-row gathers are slow on TPU; the log form composes static
    # slice/concat rotations selected by the bits of t (bit-exact, rotate.py).
    rot = (monomial_mul_blocks_log if jax.default_backend() == "tpu"
           else monomial_mul_blocks)

    b_tilda = big_mod - mod_switch_general(ct[..., n_lwe], big_mod)
    acc = rot(jnp.broadcast_to(lut_blocks, lead + (k, 2, p.n)), b_tilda, k)

    a_tilda = mod_switch_general(ct[..., :n_lwe], big_mod)   # (..., n_lwe)

    def body(i, acc):
        rotated = rot(acc, a_tilda[..., i], k)
        band = lax.dynamic_index_in_dim(bsk_bands, i, axis=0, keepdims=False)
        # Block-wise CMUX: k is just another batch axis for the contraction.
        return acc + external_product(p, band, rotated - acc)

    return lax.fori_loop(0, n_lwe, body, acc)


def blind_rotate_extended_tpu(p: TFHEParams, bsk_band: Array, ct: Array,
                              lut_blocks: Array, tb: int | None = None,
                              tn: int = 1024) -> Array:
    """TPU fast path of :func:`blind_rotate_extended` (bit-exact with it):
    per step, one fused Pallas rotation+decomposition of the interleaved
    big accumulator (ops/pallas_ext.py) feeds the Pallas external-product
    kernel with the k blocks folded into the batch axis (the block-wise
    CMUX contracts every block against the SAME TRGSW band).

    bsk_band:   (n_lwe, 2, 2L, 2N+tn) int32 limb-packed bands (keys.py).
    ct:         (B, n_lwe+1) uint32, B a multiple of 128.
    lut_blocks: (k, 2, N) or (B, k, 2, N) uint32 trivial TRLWE blocks.

    Returns (B, k, 2, N) uint32 (same contract as blind_rotate_extended).
    """
    n_lwe, k, n = p.lwe_n, p.poly_extend_factor, p.n
    big_mod = 2 * k * n
    b = ct.shape[0]
    nd = p.digit_limbs
    limb_mag = min(p.half_bg, 128)
    drop = p.kernel_limb_drop if nd == 1 else 0
    # int8 x int8 -> int32 dot is exact whenever one contraction fits int32
    # — true for all shipped extended profiles (l=1 at Uint6-8).
    dot = "int8" if 2 * p.l * n * limb_mag * 128 < 1 << 31 else "bf16"
    l2 = 2 * p.l

    tbe = 256                       # extprod batch tile over the B*k axis
    while tbe > 8 and (b * k) % tbe:
        tbe //= 2
    tn = min(tn, n)                    # column tile cannot exceed the row
    while n % tn:
        tn //= 2
    nl_eff = 4 - drop                  # VMEM-budget the Toeplitz scratch
    while tn > 256 and 2 * p.l * n * nl_eff * tn > 14 << 20:
        tn //= 2

    b_tilda = big_mod - mod_switch_general(ct[:, n_lwe], big_mod)    # (B,)
    acc0 = monomial_mul_blocks_log(
        jnp.broadcast_to(lut_blocks, (b, k, 2, n)), b_tilda, k)
    # kernel layout: (2, B, k*N) channel-major, block r in columns [rN, ..)
    acc = jnp.moveaxis(acc0, -2, 0).reshape(2, b, k * n)

    a_tilda = mod_switch_general(ct[:, :n_lwe], big_mod)         # (B, n_lwe)

    def body(i, acc):
        a_i = a_tilda[:, i]
        band_i = lax.dynamic_index_in_dim(bsk_band, i, 0, False)
        digits = rotate_decompose_ext_pallas(p, acc, a_i, tb=tb)
        digits = digits.reshape(b * k, nd, l2, n)        # blocks -> batch
        acc_flat = acc.reshape(2, b * k, n)
        out = extprod_pallas(digits, band_i, limb_mag=limb_mag, tn=tn,
                             tb=tbe, drop_limbs=drop, dot_dtype=dot,
                             acc=acc_flat)
        return out.reshape(2, b, k * n)

    acc = lax.fori_loop(0, n_lwe, body, acc)
    return jnp.moveaxis(acc.reshape(2, b, k, n), 0, -2)      # (B, k, 2, N)


def blind_rotate_extended_t(p: TFHEParams, bsk_band_rev: Array, ct: Array,
                            lut_blocks: Array, tb: int | None = None,
                            tn: int = 1024) -> Array:
    """TRANSPOSED extended-LUT blind rotation (ops/pallas_t.py) — the
    sublane-layout variant of :func:`blind_rotate_extended_tpu`, bit-exact
    with it and with the portable :func:`blind_rotate_extended`.

    bsk_band_rev: (n_lwe, 2, 2L, 2N+pad) int32 reversed bands (keys.py).
    ct:           (B, n_lwe+1) uint32, B a multiple of 128.
    lut_blocks:   (k, 2, N) or (B, k, 2, N) uint32 trivial TRLWE blocks.
    Returns (B, k, 2, N) uint32.
    """
    n_lwe, k, n = p.lwe_n, p.poly_extend_factor, p.n
    big_mod = 2 * k * n
    b = ct.shape[0]
    nd = p.digit_limbs
    limb_mag = min(p.half_bg, 128)
    lo = p.kernel_limb_drop if nd == 1 else 0

    b_tilda = big_mod - mod_switch_general(ct[:, n_lwe], big_mod)    # (B,)
    acc0 = monomial_mul_blocks_log(
        jnp.broadcast_to(lut_blocks, (b, k, 2, n)), b_tilda, k)
    # (B, k, 2, N) -> (2, k*N, B): block r in sublane rows [rN, (r+1)N)
    acc = jnp.transpose(acc0, (2, 1, 3, 0)).reshape(2, k * n, b)

    a_tilda = mod_switch_general(ct[:, :n_lwe], big_mod)         # (B, n_lwe)

    def body(i, acc):
        band_i = lax.dynamic_index_in_dim(bsk_band_rev, i, 0, False)
        digits = rotate_decompose_ext_t(p, acc, a_tilda[:, i], tb=tb)
        return extprod_ext_t(digits, band_i, acc, kblocks=k,
                             limb_mag=limb_mag, tn=tn, lo=lo, nd=nd)

    acc = lax.fori_loop(0, n_lwe, body, acc)
    return jnp.transpose(acc.reshape(2, k, n, b), (3, 1, 0, 2))


def blind_rotate_block(p: TFHEParams, bsk_bands: Array, ct: Array,
                       testvec: Array) -> Array:
    """Block blind rotation (portable path) — requires a block-binary lv0 key.

    The mechanism the reference's parameters advertise but never implement
    (TRGSWLv1Params.BlockSize, params/params.go:77,110; SURVEY.md #13).  With
    at most one key bit set per block, X^(sum_j s_j a_j) = 1 + sum_j
    s_j (X^(a_j) - 1), so one block step is

        acc' = acc + sum_j BSK[j] (x) (X^(a_j) acc - acc)

    — ``block_size`` *independent* external products of rotations of the
    same accumulator, folded into ONE contraction with block_size*2L rows.
    The sequential chain shrinks from n_lwe to ceil(n_lwe/block_size) steps
    of proportionally bigger MXU matmuls (total FLOPs unchanged, latency /
    launch overhead divided by block_size).  A ragged tail of
    n_lwe mod block_size bits falls back to per-bit CMUX steps.

    bsk_bands: (n_lwe, 2L, 2, 2N) int32 signed D bands from keygen.
    ct:        (..., n_lwe+1) uint32;  testvec: (2, N) or (..., 2, N).
    Returns (..., 2, N) uint32.
    """
    bs = p.block_size
    full, rem = divmod(p.lwe_n, bs)
    l2 = 2 * p.l
    lead = ct.shape[:-1]

    rot = (monomial_mul_log if jax.default_backend() == "tpu"
           else monomial_mul)                     # see blind_rotate

    b_tilda = 2 * p.n - mod_switch_2n(ct[..., p.lwe_n], p)
    acc = rot(
        jnp.broadcast_to(testvec, lead + (2, p.n)), b_tilda[..., None])

    a_tilda = mod_switch_2n(ct[..., :p.lwe_n], p)              # (..., n_lwe)
    a_blk = a_tilda[..., :full * bs].reshape(lead + (full, bs))
    band_blk = bsk_bands[:full * bs].reshape(full, bs * l2, 2, 2 * p.n)

    def body(i, acc):
        a_i = lax.dynamic_index_in_dim(a_blk, i, axis=-2, keepdims=False)
        rotated = rot(acc[..., None, :, :], a_i[..., :, None])
        diff = rotated - acc[..., None, :, :]                  # (...,bs,2,N)
        digits = gadget_decompose(diff, p)                     # (...,bs,2L,N)
        digits = digits.reshape(lead + (bs * l2, p.n))
        band = lax.dynamic_index_in_dim(band_blk, i, axis=0, keepdims=False)
        return acc + negacyclic_extprod_toeplitz(digits, band)

    acc = lax.fori_loop(0, full, body, acc)
    for j in range(rem):                      # ragged tail, static indices
        idx = full * bs + j
        rotated = rot(acc, a_tilda[..., idx][..., None])
        acc = cmux(p, bsk_bands[idx], acc, rotated)
    return acc


def _pallas_digits(p: TFHEParams, shifts: Array, diff: Array):
    """Gadget-decompose a channel-major difference for the Pallas kernel.

    diff: (*g, 2, B, N) uint32 (g = () for per-bit steps, (block_size,) for
    block steps).  Returns ((B, [nd,] R, N) int8 digit limbs, limb_mag) with
    R = prod(g)*2L, rows g-major then [A levels, B levels] — matching the
    row order of the packed BSK bands.
    """
    b, n = diff.shape[-2], diff.shape[-1]
    nd = p.digit_limbs
    tmp = diff + jnp.uint32(p.decomposition_offset)
    d = (tmp[..., None, :] >> shifts[:, None]) & jnp.uint32(p.bg - 1)
    d32 = d.astype(jnp.int32) - p.half_bg              # (*g, 2, B, L, N)
    rows = d32.size // (b * n)                         # prod(g) * 2L
    if nd == 1:
        digits = jnp.moveaxis(d32.astype(jnp.int8), -3, 0)   # (B,*g,2,L,N)
        return digits.reshape(b, rows, n), p.half_bg
    # Large digits (BGBIT > 8, the Uint profiles): exact signed base-256
    # limbs; the kernel contracts each limb against the kernel-limb columns
    # with weight < 2^32.
    limbs = split_signed_limbs_i8(d32, nd)             # (nd, *g, 2, B, L, N)
    digits = jnp.moveaxis(limbs, -3, 0)                # (B, nd, *g, 2, L, N)
    return digits.reshape(b, nd, rows, n), 128


def blind_rotate_tpu(p: TFHEParams, bsk_band: Array, ct: Array,
                     testvec: Array, tb: int = 256,
                     tn: int = 1024) -> Array:
    """TPU fast path: per-step Pallas rotate+decompose kernel feeding the
    Pallas external-product kernel (the two-kernel composition — the fused
    single-kernel step, ops/pallas_step.py, is the measured-slower opt-in
    behind ``FUSED_STEP``; Mosaic serializes its VPU and MXU work).

    Same math as :func:`blind_rotate` (bit-exact), but the accumulator lives
    in channel-major (2, B, N) layout to match the Pallas kernel's output
    tiling.  ``tb`` auto-shrinks (128 minimum) until it divides B; B must be
    a multiple of 128 (engine.bootstrap pads to ``_TPU_BATCH_TILE``).

    bsk_band: (n_lwe, 2, 2L, 2N+tn) int32 limb-packed bands (keys.py).
    ct:       (B, n_lwe+1) uint32, B a multiple of 128.
    testvec:  (2, N) or (B, 2, N) uint32.

    Returns (B, 2, N) uint32.
    """
    n_lwe = p.lwe_n
    b = ct.shape[0]
    while tb > 128 and b % tb:
        tb //= 2
    tn = min(tn, p.n)                  # column tile cannot exceed the row
    while p.n % tn:
        tn //= 2
    # Wide column tiles cut the digit-block HBM re-reads (one read per
    # (channel, nt) combo), worth +7% at the fast profile — but the
    # (2L*N, nl*tn) Toeplitz scratch must stay comfortably inside VMEM or
    # Mosaic's schedule collapses (measured: the 4-limb l=3 profile drops
    # 4,311 -> 3,206/s at tn=1024 where the scratch is 25 MB).  Budget it.
    nl_eff = 4 - (p.kernel_limb_drop if p.digit_limbs == 1 else 0)
    while tn > 256 and 2 * p.l * p.n * nl_eff * tn > 14 << 20:
        tn //= 2

    b_tilda = 2 * p.n - mod_switch_2n(ct[:, n_lwe], p)          # (B,)
    if testvec.ndim == 2:
        tv = jnp.broadcast_to(testvec[:, None, :], (2, b, p.n))
    else:
        tv = jnp.moveaxis(testvec, 0, 1)
    acc = monomial_mul_log(tv, b_tilda[None, :])                # (2, B, N)

    a_tilda = mod_switch_2n(ct[:, :n_lwe], p)                   # (B, n_lwe)

    drop = p.kernel_limb_drop if p.digit_limbs == 1 else 0
    limb_mag = min(p.half_bg, 128)
    # int8 x int8 -> int32 MXU dot is exact whenever one contraction fits
    # int32 — true for every boolean profile; the fused kernel requires it.
    int8_ok = 2 * p.l * p.n * limb_mag * 128 < 1 << 31
    fused = FUSED_STEP and p.digits_fit_int8 and int8_ok
    # int8 x int8 -> int32 MXU dot: measured ~1.7x the bf16 rate on v5e for
    # this kernel (and no split-K), exact whenever one contraction fits
    # int32 — true for every boolean profile.
    dot = "int8" if int8_ok else "bf16"

    def body(i, acc):
        a_i = a_tilda[:, i]
        band_i = lax.dynamic_index_in_dim(bsk_band, i, 0, False)
        if fused:
            return fused_rotate_step(p, acc, a_i, band_i, tb=tb)
        # rotate_decompose_pallas emits int8 digits for BGBIT <= 8 and
        # exact base-256 limb planes for the wide Uint gadgets — the
        # rotation never leaves the Pallas path either way.
        digits = rotate_decompose_pallas(p, acc, a_i, tb=tb)
        return extprod_pallas(digits, band_i, limb_mag=min(p.half_bg, 128),
                              tb=tb, tn=tn, drop_limbs=drop, dot_dtype=dot,
                              acc=acc)

    acc = lax.fori_loop(0, n_lwe, body, acc)
    return jnp.moveaxis(acc, 0, 1)                              # (B, 2, N)


def blind_rotate_t(p: TFHEParams, bsk_band_rev: Array, ct: Array,
                   testvec: Array, tb: int = 256, theta: int = 0) -> Array:
    """TRANSPOSED per-bit TPU fast path (ops/pallas_t.py) — bit-exact with
    :func:`blind_rotate` / :func:`blind_rotate_tpu`, measured 698 vs 729
    us/step at bench shapes (coefficients on sublanes make the log-
    rotation rolls vreg-friendly).  Wide digits (BGBIT > 8) split into
    exact base-256 limb row planes in-kernel.

    bsk_band_rev: (n_lwe, 2, 2L, 2N+pad) int32 reversed bands (keys.py).
    ct:           (B, n_lwe+1) uint32, B a multiple of 128.
    testvec:      (2, N) or (B, 2, N) uint32.
    Returns (B, 2, N) uint32.
    """
    nd = p.digit_limbs
    n_lwe = p.lwe_n
    b = ct.shape[0]
    while tb > 128 and b % tb:
        tb //= 2
    lo = p.kernel_limb_drop if nd == 1 else 0
    limb_mag = min(p.half_bg, 128)

    b_tilda = 2 * p.n - mod_switch_2n(ct[:, n_lwe], p, theta)   # (B,)
    if testvec.ndim == 2:
        tv = jnp.broadcast_to(testvec[:, None, :], (2, b, p.n))
    else:
        tv = jnp.moveaxis(testvec, 0, 1)
    acc = monomial_mul_log(tv, b_tilda[None, :])                # (2, B, N)
    acc = jnp.swapaxes(acc, 1, 2)                               # (2, N, B)

    a_tilda = mod_switch_2n(ct[:, :n_lwe], p, theta)            # (B, n_lwe)

    def body(i, acc):
        band_i = lax.dynamic_index_in_dim(bsk_band_rev, i, 0, False)
        digits = rotate_decompose_t(p, acc, a_tilda[:, i], tb=tb)
        return extprod_t(digits, band_i, acc, limb_mag=limb_mag, tb=tb,
                         lo=lo, nd=nd)

    acc = lax.fori_loop(0, n_lwe, body, acc)
    return jnp.moveaxis(jnp.swapaxes(acc, 1, 2), 0, 1)          # (B, 2, N)


def blind_rotate_block_tpu(p: TFHEParams, bsk_band: Array, ct: Array,
                           testvec: Array, tb: int = 256) -> Array:
    """TPU fast path of :func:`blind_rotate_block`: per sequential step, the
    block's ``block_size`` independent external products fold into ONE Pallas
    contraction with block_size*2L rows — ~block_size x fewer kernel
    launches / sequential dependencies than :func:`blind_rotate_tpu`.

    bsk_band: (n_lwe, 2, 2L, 2N+tn) int32 limb-packed bands (keys.py).
    ct:       (B, n_lwe+1) uint32, B a multiple of 128 (``tb`` auto-shrinks
              to divide B; engine.bootstrap pads to ``_TPU_BATCH_TILE``).
    testvec:  (2, N) or (B, 2, N).
    Returns (B, 2, N) uint32.  Requires a block-binary lv0 key.
    """
    n_lwe, bs = p.lwe_n, p.block_size
    full, rem = divmod(n_lwe, bs)
    l2 = 2 * p.l
    b = ct.shape[0]
    while tb > 128 and b % tb:
        tb //= 2
    shifts = jnp.asarray(
        [32 - (i + 1) * p.bgbit for i in range(p.l)], dtype=jnp.uint32)

    fused_rot = p.digits_fit_int8    # rotate+decompose in one Pallas pass

    # The fused block contraction has bs*2L*N Toeplitz rows — too tall for a
    # bf16 scratch in VMEM, so this path uses the int8 dot (1 byte/entry,
    # same MXU rate on this hardware, and exact: rows*half_bg*128 < 2^31).
    # Shrink the column tile until the scratch fits next to the
    # double-buffered digit blocks; Mosaic needs tn >= 128.
    drop = p.kernel_limb_drop if p.digit_limbs == 1 else 0
    nl = 4 - drop
    tn = min(1024, p.n)                # column tile cannot exceed the row
    while tn > 128 and bs * l2 * p.n * nl * tn > 24 << 20:
        tn //= 2
    assert bs * l2 * p.n * nl * tn <= 28 << 20, (
        f"block-fused Toeplitz scratch does not fit VMEM for {p.name}")

    b_tilda = 2 * p.n - mod_switch_2n(ct[:, n_lwe], p)          # (B,)
    if testvec.ndim == 2:
        tv = jnp.broadcast_to(testvec[:, None, :], (2, b, p.n))
    else:
        tv = jnp.moveaxis(testvec, 0, 1)
    acc = monomial_mul_log(tv, b_tilda[None, :])                # (2, B, N)

    a_tilda = mod_switch_2n(ct[:, :n_lwe], p)                   # (B, n_lwe)
    # (full, bs, B): block-major rotation amounts for the loop body.
    a_blk = jnp.moveaxis(
        a_tilda[:, :full * bs].reshape(b, full, bs), 0, -1)
    # (full, 2, bs*2L, W): per-block packed bands, rows block-major.
    w = bsk_band.shape[-1]
    band_blk = jnp.moveaxis(
        bsk_band[:full * bs].reshape(full, bs, 2, l2, w), 2, 1
    ).reshape(full, 2, bs * l2, w)

    def body(i, acc):
        a_i = lax.dynamic_index_in_dim(a_blk, i, 0, False)      # (bs, B)
        band = lax.dynamic_index_in_dim(band_blk, i, 0, False)
        if fused_rot:
            digits = rotate_decompose_pallas(p, acc, a_i, tb=tb)
            return extprod_pallas(digits, band, limb_mag=p.half_bg, tn=tn,
                                  tb=tb, drop_limbs=drop, dot_dtype="int8",
                                  acc=acc)
        rotated = monomial_mul_log(acc[None], a_i[:, None, :])
        digits, limb_mag = _pallas_digits(p, shifts, rotated - acc[None])
        return acc + extprod_pallas(digits, band, limb_mag=limb_mag, tn=tn,
                                    tb=tb, drop_limbs=drop, dot_dtype="int8")

    acc = lax.fori_loop(0, full, body, acc)
    for j in range(rem):                      # ragged tail, static indices
        idx = full * bs + j
        if fused_rot:
            digits = rotate_decompose_pallas(p, acc, a_tilda[:, idx], tb=tb)
            acc = extprod_pallas(digits, bsk_band[idx], limb_mag=p.half_bg,
                                 tb=tb, drop_limbs=drop, acc=acc)
        else:
            rotated = monomial_mul_log(acc, a_tilda[:, idx][None, :])
            digits, limb_mag = _pallas_digits(p, shifts, rotated - acc)
            acc = acc + extprod_pallas(digits, bsk_band[idx],
                                       limb_mag=limb_mag, tb=tb,
                                       drop_limbs=drop)
    return jnp.moveaxis(acc, 0, 1)                              # (B, 2, N)
