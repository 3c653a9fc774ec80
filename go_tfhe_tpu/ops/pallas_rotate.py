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


def _rotdec_kernel(acc_ref, amt_ref, out_ref, *, n: int, nbits: int,
                   bs: int, l: int, bgbit: int, offset: int, nd: int):
    """acc_ref: (2, TB, N) int32;  amt_ref: (TB, bs) int32;
    out_ref: (TB, nd*bs*2L*N) int8 digits of X^amt . acc - acc, row-major
    (limb-major for nd > 1: limb i's rows at columns [i*bs*2L*N, ...)).
    The FLAT layout matters: writing rows of a (TB, R, N) block puts each
    level on a single sublane row (4x store inefficiency, measured ~350
    us/step vs ~160 flat).  Digits wider than int8 (BGBIT > 8, the Uint
    profiles) are split in-kernel into ``nd`` exact signed base-256 limbs
    (same arithmetic as polymul.split_signed_limbs_i8).
    ``offset``: the profile's decomposition offset as a signed int32
    constant (cloudkey/cloudkey.go:60-71)."""
    half_bg = 1 << (bgbit - 1)
    mask = (1 << bgbit) - 1
    rows = bs * 2 * l
    tb = acc_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (2 * tb, n), 1)
    # Both channels rotate by the SAME per-ciphertext amount: merge them
    # into one (2*TB, N) array so every stage is a single roll/select
    # instead of two (fewer, larger Mosaic ops).
    x0 = jnp.concatenate([acc_ref[0], acc_ref[1]], axis=0)   # (2*TB, N)
    for j in range(bs):
        amt = amt_ref[:, j:j + 1]                            # (TB, 1)
        amt2 = jnp.concatenate([amt, amt], axis=0)           # (2*TB, 1)
        x = x0
        for b in range(nbits):
            s = 1 << b
            if s < n:
                rolled = pltpu.roll(x, shift=s, axis=1)
                rolled = jnp.where(lane < s, ~rolled, rolled)
            else:                                          # X^N == -1
                rolled = ~x
            bit = (amt2 >> b) & 1
            x = jnp.where(bit > 0, rolled, x)
        tmp = (x - x0) + jnp.int32(offset)                 # wraps mod 2^32
        for lv in range(l):
            sh = 32 - (lv + 1) * bgbit
            d = ((tmp >> sh) & mask) - half_bg
            for i in range(nd):
                if nd == 1:
                    limb, d = d, None
                else:
                    # exact signed base-256 split (split_signed_limbs_i8)
                    if i < nd - 1:
                        limb = ((d + 128) & 255) - 128
                        d = (d - limb) >> 8            # arithmetic, exact
                    else:
                        limb = d
                for c in range(2):
                    col = (i * rows + (j * 2 + c) * l + lv) * n
                    out_ref[:, pl.ds(col, n)] = (
                        limb[c * tb:(c + 1) * tb].astype(jnp.int8))


@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("tb",))
def rotate_decompose_pallas(p: TFHEParams, acc: Array, amounts: Array,
                            tb: int = 128) -> Array:
    """acc: (2, B, N) uint32 channel-major accumulators;
    amounts: (B,) or (bs, B) int32 rotation amounts in [0, 2N].

    Returns int8 gadget digits of X^amount . acc - acc: (B, bs*2L, N)
    when the digits fit int8 (half_bg <= 128), else (B, nd, bs*2L, N)
    exact signed base-256 limb planes (nd = p.digit_limbs) — the layouts
    consumed by extprod_pallas in blind_rotate_tpu / blind_rotate_block_tpu
    (rows ordered [block bit major][A levels, B levels]).
    """
    nd = p.digit_limbs
    if amounts.ndim == 1:
        amounts = amounts[None]
    bs, b = amounts.shape
    n = acc.shape[-1]
    assert acc.shape == (2, b, n) and b % tb == 0
    nbits = n.bit_length()                 # shifts 1..N cover [0, 2N)
    amt = jnp.moveaxis(amounts.astype(jnp.int32), 0, 1)   # (B, bs)
    off = p.decomposition_offset
    off = off - (1 << 32) if off >= (1 << 31) else off

    out = pl.pallas_call(
        functools.partial(_rotdec_kernel, n=n, nbits=nbits, bs=bs, l=p.l,
                          bgbit=p.bgbit, offset=off, nd=nd),
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((2, tb, n), lambda bt: (0, bt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, bs), lambda bt: (bt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, nd * bs * 2 * p.l * n),
                               lambda bt: (bt, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nd * bs * 2 * p.l * n),
                                       jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # see pallas_extprod: v5e VMEM is 128 MB; the block path's
            # (TB, bs*2L*N) digit block exceeds the 16 MB Mosaic default.
            vmem_limit_bytes=48 << 20,
        ),
        interpret=INTERPRET,
    )(to_signed(acc), amt)
    if nd == 1:
        return out.reshape(b, bs * 2 * p.l, n)
    return out.reshape(b, nd, bs * 2 * p.l, n)
