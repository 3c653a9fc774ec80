"""Pallas TPU kernel: one FUSED blind-rotate step.

The per-step pipeline (evaluator/evaluator.go:121-130) is
rotate -> subtract -> gadget-decompose -> external product -> accumulate.
Round 2 ran it as two kernels (ops/pallas_rotate.py + ops/pallas_extprod.py),
which serializes the VPU rotation against the MXU contraction and round-trips
the 16 MB digit tensor through HBM every step.  This kernel does the whole
step in ONE ``pallas_call``:

* grid (bt2, c, nt, bt_i): batch super-tiles outermost, the ``sub``
  sub-tiles innermost;
* at (c==0, nt==0) cells the accumulator sub-tile is log-rotated and
  decomposed into int8 digits IN VMEM (scratch, never touching HBM);
* at (bt_i==0) cells the negacyclic Toeplitz tile for (c, nt) is built in
  VMEM from the packed band via Mosaic's strided roll (see
  pallas_extprod._extprod_kernel for the window math);
* every cell contracts digits x Toeplitz on the MXU (int8 x int8 -> int32),
  recombines the base-256 kernel limbs, adds the accumulator slice and
  writes the output tile.

Mosaic's scheduler overlaps the VPU work (rotation, Toeplitz build, limb
recombination) with the MXU dots of neighbouring cells; HBM traffic per
step drops from ~240 MB (two-kernel) to ~96 MB (read acc twice + write
acc), all overlapped with compute.

Digits must fit int8 (half_bg <= 128) and the int8 dot must be exact
(2L*N*half_bg*128 < 2^31) — both hold for every boolean profile.
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

NUM_LIMBS = 4

# Interpreter escape hatch, same contract as pallas_extprod.INTERPRET.
INTERPRET = False


def _step_kernel(acc_rot_ref, amt_ref, band_ref, acc_add_ref, out_ref,
                 digits_ref, toep_ref, *, n: int, nbits: int, l: int,
                 bgbit: int, offset: int, tb: int, sub: int, tn: int,
                 tj: int, lo: int):
    """One grid cell of the fused step.

    acc_rot_ref: (2, sub*TB, N) int32   — acc super-tile (rotation input)
    amt_ref:     (sub*TB, 1) int32      — rotation amounts
    band_ref:    (1, 2L, pad+2N) int32  — limb-packed band for channel c
    acc_add_ref: (1, sub*TB, TN) uint32 — acc slice for the fused add
    out_ref:     (1, sub*TB, TN) uint32 — updated acc slice
    digits_ref:  (sub, TB, 2L*N) int8 scratch — digits per sub-tile
    toep_ref:    (2L*N, (NUM_LIMBS-lo)*TN) int8 scratch — Toeplitz tile
    """
    c = pl.program_id(1)
    nt = pl.program_id(2)
    bt_i = pl.program_id(3)
    l2 = 2 * l
    nl = NUM_LIMBS - lo
    half_bg = 1 << (bgbit - 1)
    mask = (1 << bgbit) - 1

    @pl.when(jnp.logical_and(c == 0, nt == 0))
    def _rotate_decompose():
        lane = jax.lax.broadcasted_iota(jnp.int32, (tb, n), 1)
        rows = pl.ds(bt_i * tb, tb)
        amt = amt_ref[rows, :]                          # (TB, 1)
        for ch in range(2):
            x0 = acc_rot_ref[ch, rows, :]
            x = x0
            for b in range(nbits):
                s = 1 << b
                if s < n:
                    rolled = pltpu.roll(x, shift=s, axis=1)
                    rolled = jnp.where(lane < s, ~rolled, rolled)
                else:                                   # X^N == -1
                    rolled = ~x
                bit = (amt >> b) & 1
                x = jnp.where(bit > 0, rolled, x)
            tmp = (x - x0) + jnp.int32(offset)          # wraps mod 2^32
            for lv in range(l):
                sh = 32 - (lv + 1) * bgbit
                d = ((tmp >> sh) & mask) - half_bg
                digits_ref[bt_i, :, pl.ds((ch * l + lv) * n, n)] = (
                    d.astype(jnp.int8))

    @pl.when(bt_i == 0)
    def _build_toeplitz():
        # T[(r, jt*tj + j'), (lm-lo)*tn + n'] = limb_lm(D[c, r, n + nt*tn
        #   + n' - jt*tj - j']); band stores D[m] at column pad + m with
        #   pad = base0 + tn prepended zeros (pack_bsk_band).
        base0 = band_ref.shape[-1] - 2 * n - tn
        for r in range(l2):
            for jt in range(n // tj):
                base = base0 + n + nt * tn - jt * tj
                w = band_ref[0, r, pl.ds(base, 2 * tn)]
                wmat = jnp.broadcast_to(w, (tj, 2 * tn))
                rolled = pltpu.roll(wmat, shift=tn, axis=1, stride=1,
                                    stride_axis=0)[:, :tn]
                rows = pl.ds((r * (n // tj) + jt) * tj, tj)
                for lm in range(lo, NUM_LIMBS):
                    limb = ((rolled >> (8 * lm)) & 255) - 128
                    toep_ref[rows, pl.ds((lm - lo) * tn, tn)] = limb.astype(
                        jnp.int8)

    lhs = digits_ref[bt_i]                              # (TB, 2L*N) int8
    acc = jax.lax.dot_general(
        lhs, toep_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)               # (TB, nl*TN)
    out = None
    for j in range(nl):
        term = acc[:, j * tn:(j + 1) * tn].astype(jnp.uint32)
        if j + lo:
            term = term << jnp.uint32(8 * (j + lo))
        out = term if out is None else out + term
    rows = pl.ds(bt_i * tb, tb)
    out_ref[0, rows, :] = out + acc_add_ref[0, rows, :]


@functools.partial(jax.jit,
                   static_argnums=(0,),
                   static_argnames=("tb", "sub", "tn", "tj"))
def fused_rotate_step(p: TFHEParams, acc: Array, amounts: Array,
                      band: Array, tb: int = 128, sub: int = 2,
                      tn: int = 256, tj: int = 128) -> Array:
    """One full blind-rotate step:  acc + BSK_i (x) (X^amounts . acc - acc).

    acc:     (2, B, N) uint32 channel-major accumulators.
    amounts: (B,) int32 rotation amounts in [0, 2N].
    band:    (2, 2L, pad+2N) int32 limb-packed band (pack_bsk_band).

    Returns (2, B, N) uint32.  Bit-exact with
    ``extprod_pallas(rotate_decompose_pallas(...), ..., acc=acc)``
    (tests/test_pallas_step.py), with the decomposition honoring the
    profile's (possibly centered) offset.
    """
    b = amounts.shape[-1]
    n = acc.shape[-1]
    l2 = 2 * p.l
    lo = p.kernel_limb_drop if p.digit_limbs == 1 else 0
    assert p.half_bg <= 128 and p.digit_limbs == 1
    assert l2 * n * p.half_bg * 128 < 1 << 31     # int8 dot exactness
    assert acc.shape == (2, b, n)
    assert b % (tb * sub) == 0 and n % tn == 0 and n % tj == 0
    pad = band.shape[-1] - 2 * n
    assert pad >= tn, (pad, tn)
    nbits = n.bit_length()
    off = p.decomposition_offset
    off = off - (1 << 32) if off >= (1 << 31) else off
    amt = amounts.astype(jnp.int32)[:, None]            # (B, 1)

    grid = (b // (tb * sub), 2, n // tn, sub)
    return pl.pallas_call(
        functools.partial(_step_kernel, n=n, nbits=nbits, l=p.l,
                          bgbit=p.bgbit, offset=off, tb=tb, sub=sub, tn=tn,
                          tj=tj, lo=lo),
        grid=grid,
        in_specs=[
            # rotation input: whole super-tile, fetched once per bt2
            pl.BlockSpec((2, sub * tb, n),
                         lambda bt2, c, nt, bt_i: (0, bt2, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub * tb, 1),
                         lambda bt2, c, nt, bt_i: (bt2, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l2, band.shape[-1]),
                         lambda bt2, c, nt, bt_i: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            # accumulator slice for the fused add
            pl.BlockSpec((1, sub * tb, tn),
                         lambda bt2, c, nt, bt_i: (c, bt2, nt),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, sub * tb, tn),
                               lambda bt2, c, nt, bt_i: (c, bt2, nt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, b, n), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((sub, tb, l2 * n), jnp.int8),
            pltpu.VMEM((l2 * n, (NUM_LIMBS - lo) * tn), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 4,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * l2 * n * (NUM_LIMBS - lo) * n * 2,
            bytes_accessed=acc.size * 4 * 3,
            transcendentals=0,
        ),
        interpret=INTERPRET,
    )(to_signed(acc), amt, band, acc)
