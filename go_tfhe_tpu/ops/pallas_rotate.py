"""Pallas TPU kernel: fused monomial rotation + gadget decomposition.

The blind-rotate step needs the gadget digits of (X^a . acc - acc) per
ciphertext (evaluator/evaluator.go:121-130).  Composed from jnp primitives
(ops/rotate.py log-rotation + ops/decompose.py) this costs ~11 full HBM
sweeps of the (2, B, N) accumulator per step — about as much wall-clock as
the external-product matmul itself.  This kernel keeps the accumulator tile
in VMEM and does the whole composition in one pass:

* log-rotation: 11 rounds of static ``pltpu.roll`` along lanes + negacyclic
  sign fix, selected per row by the bits of the (traced) rotation amount —
  pure VPU work on a resident tile, bit-exact with
  ``rotate.monomial_mul_log`` (which is bit-exact with the reference's
  PolyMulWithXKInPlace, poly/buffer_methods.go:133-164);
* difference + signed base-2^BGBIT decomposition (poly/decomposer.go:55-66)
  into int8 digits (requires half_bg <= 128).

HBM traffic per step drops from ~25 sweeps to read-acc + write-digits.

The ``bs`` variant produces the block-fused digit layout: for each of the
``bs`` block bits it rotates the SAME accumulator by that bit's amount and
stacks the bs*2L digit rows (block-bit-major), matching the packed band
row order of blind_rotate_block_tpu.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import TFHEParams
from ..utils.torus import to_signed

Array = jax.Array

# Interpreter escape hatch, same contract as pallas_extprod.INTERPRET.
INTERPRET = False


def _rotdec_kernel(acc_ref, amt_ref, off_ref, out_ref, *, n: int,
                   nbits: int, bs: int, l: int, bgbit: int):
    """acc_ref: (2, TB, N) int32;  amt_ref: (TB, bs) int32;
    off_ref: (1, 1) int32 SMEM decomposition offset (traced: per-step
    dithering, see params.offset_dither);
    out_ref: (TB, bs*2L, N) int8 digits of X^amt . acc - acc."""
    half_bg = 1 << (bgbit - 1)
    mask = (1 << bgbit) - 1
    lane = jax.lax.broadcasted_iota(jnp.int32, (acc_ref.shape[1], n), 1)
    for j in range(bs):
        amt = amt_ref[:, j:j + 1]                          # (TB, 1)
        for c in range(2):
            x0 = acc_ref[c]
            x = x0
            for b in range(nbits):
                s = 1 << b
                if s < n:
                    rolled = pltpu.roll(x, shift=s, axis=1)
                    rolled = jnp.where(lane < s, ~rolled, rolled)
                else:                                      # X^N == -1
                    rolled = ~x
                bit = (amt >> b) & 1
                x = jnp.where(bit > 0, rolled, x)
            tmp = (x - x0) + off_ref[0, 0]                 # wraps mod 2^32
            for lv in range(l):
                sh = 32 - (lv + 1) * bgbit
                d = ((tmp >> sh) & mask) - half_bg
                out_ref[:, (j * 2 + c) * l + lv, :] = d.astype(jnp.int8)


def _rotdec_packed_kernel(acc_ref, amt_ref, off_ref, out_ref, *, n: int,
                          nbits: int, l: int, bgbit: int):
    """Packed-digit rotation (the ``fast_rotation`` path).

    Instead of rotating the (2, TB, N) int32 accumulator and decomposing
    the difference (11 VPU rounds over 2*N int32 lanes per coefficient),
    this kernel decomposes the accumulator ONCE, packs the 2*l <= 4 digit
    bytes of each coefficient into a single int32 lane, and rotates the
    packed (TB, N) array — HALF the VPU rotation work.  It emits

        D' = X^a . D - D,     D = gadget digits of acc,

    which by linearity of negacyclic convolution satisfies
    <D', K> = X^a <D, K> - <D, K>: the external product of D' IS the CMUX
    update, up to the gadget-tail commutation error s_i * (X^a - 1) eps
    (|eps| <= 2^(32 - l*bgbit - 1)) analyzed in params.TFHEParams
    .fast_rotation.  Digit negation under the negacyclic wrap is TRUE
    negation (-d), not the torus NOT-trick: per packed byte (biased by
    half_bg so bytes lie in [0, 2*half_bg]),  -d + half_bg ==
    2*half_bg - byte, i.e. one borrow-free subtraction from the constant
    0x40404040 (for bgbit = 6).  All byte lanes stay in [0, 255] at every
    intermediate, so int32 adds/subs never carry across bytes.

    acc_ref: (2, TB, N) int32;  amt_ref: (TB, 1) int32;
    out_ref: (TB, 2L, N) int8 digits of D', rows [A levels, B levels].
    Requires 2*l <= 4 and 2*half_bg <= 127 (bgbit <= 6).
    """
    half = 1 << (bgbit - 1)
    mask = (1 << bgbit) - 1
    neg_c = jnp.int32(sum((2 * half) << (8 * r) for r in range(2 * l)))
    bias_v = sum(128 << (8 * r) for r in range(2 * l))
    bias_c = jnp.int32(bias_v - (1 << 32) if bias_v >= (1 << 31) else bias_v)
    lane = jax.lax.broadcasted_iota(jnp.int32, (acc_ref.shape[1], n), 1)

    # 1. decompose acc and pack biased digit bytes: byte (c*l + lv) of
    #    P[:, j] is digits_lv(acc[c])[j] + half_bg in [0, 2*half_bg].
    packed = jnp.zeros((acc_ref.shape[1], n), jnp.int32)
    for c in range(2):
        tmp = acc_ref[c] + off_ref[0, 0]           # wraps mod 2^32
        for lv in range(l):
            sh = 32 - (lv + 1) * bgbit
            raw = (tmp >> sh) & mask               # biased digit, [0, 2half)
            packed = packed | (raw << (8 * (c * l + lv)))

    # 2. log-rotation of the packed digits by the per-row amount, with
    #    per-byte true negation on wraparound.
    amt = amt_ref[:, 0:1]
    x = packed
    for b in range(nbits):
        s = 1 << b
        if s < n:
            rolled = pltpu.roll(x, shift=s, axis=1)
            rolled = jnp.where(lane < s, neg_c - rolled, rolled)
        else:                                      # X^N == -1
            rolled = neg_c - x
        bit = (amt >> b) & 1
        x = jnp.where(bit > 0, rolled, x)

    # 3. D' = rot - id, biased to borrow-free bytes, then unpacked to int8.
    dp = (x + bias_c) - packed                     # bytes in [65+..,192]
    for r in range(2 * l):
        d = ((dp >> (8 * r)) & 255) - 128
        out_ref[:, r, :] = d.astype(jnp.int8)


def _offset_operand(p: TFHEParams, offset: Array | None) -> Array:
    """Decomposition offset as a traced (1, 1) int32 SMEM operand; ``None``
    selects the profile's reference offset (cloudkey/cloudkey.go:60-71)."""
    if offset is None:
        off = p.decomposition_offset
        off = off - (1 << 32) if off >= (1 << 31) else off
        return jnp.full((1, 1), off, jnp.int32)
    return jnp.asarray(offset, jnp.int32).reshape(1, 1)


@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("tb",))
def rotate_decompose_packed(p: TFHEParams, acc: Array, amounts: Array,
                            tb: int = 128,
                            offset: Array | None = None) -> Array:
    """acc: (2, B, N) uint32 channel-major accumulators;
    amounts: (B,) int32 rotation amounts in [0, 2N].

    Returns (B, 2*l_used, N) int8 digits of X^amount . D - D where D are
    the gadget digits OF THE ACCUMULATOR (see _rotdec_packed_kernel) —
    |entries| <= 2*half_bg - 1, so pass limb_mag = 2*half_bg to
    extprod_pallas, whose fused-accumulator output then directly equals
    the blind-rotate step  acc + X^a E - E.

    Requires the ``fast_rotation`` profile shape: l_used <= 2 and
    bgbit <= 6 (four biased digit bytes per int32 lane, borrow-free).
    """
    assert p.l_used <= 2 and p.bgbit <= 6, (p.l_used, p.bgbit)
    b = amounts.shape[-1]
    n = acc.shape[-1]
    assert acc.shape == (2, b, n) and b % tb == 0
    nbits = n.bit_length()
    amt = amounts.astype(jnp.int32)[:, None]                  # (B, 1)
    lu = p.l_used

    return pl.pallas_call(
        functools.partial(_rotdec_packed_kernel, n=n, nbits=nbits, l=lu,
                          bgbit=p.bgbit),
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((2, tb, n), lambda bt: (0, bt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda bt: (bt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda bt: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tb, 2 * lu, n), lambda bt: (bt, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2 * lu, n), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=INTERPRET,
    )(to_signed(acc), amt, _offset_operand(p, offset))


@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("tb",))
def rotate_decompose_pallas(p: TFHEParams, acc: Array, amounts: Array,
                            tb: int = 128,
                            offset: Array | None = None) -> Array:
    """acc: (2, B, N) uint32 channel-major accumulators;
    amounts: (B,) or (bs, B) int32 rotation amounts in [0, 2N].

    Returns (B, bs*2*l_used, N) int8 gadget digits of X^amount . acc - acc,
    rows ordered [block bit major][A levels, B levels] — the layouts
    consumed by extprod_pallas in blind_rotate_tpu / blind_rotate_block_tpu.
    Requires half_bg <= 128 (digits fit int8).

    Only the profile's ``l_used`` most-significant decomposition levels are
    emitted (params.TFHEParams.decomp_levels_used — the approximate-gadget
    fast-path knob; l_used == l by default).
    """
    assert p.half_bg <= 128
    if amounts.ndim == 1:
        amounts = amounts[None]
    bs, b = amounts.shape
    n = acc.shape[-1]
    assert acc.shape == (2, b, n) and b % tb == 0
    nbits = n.bit_length()                 # shifts 1..N cover [0, 2N)
    amt = jnp.moveaxis(amounts.astype(jnp.int32), 0, 1)   # (B, bs)
    lu = p.l_used

    out = pl.pallas_call(
        functools.partial(_rotdec_kernel, n=n, nbits=nbits, bs=bs, l=lu,
                          bgbit=p.bgbit),
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((2, tb, n), lambda bt: (0, bt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, bs), lambda bt: (bt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda bt: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tb, bs * 2 * lu, n), lambda bt: (bt, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, bs * 2 * lu, n), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=INTERPRET,
    )(to_signed(acc), amt, _offset_operand(p, offset))
    return out
