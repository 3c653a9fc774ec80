"""Pallas TPU kernel: one FUSED, software-pipelined blind-rotate step.

The per-step pipeline (evaluator/evaluator.go:121-130) is
rotate -> subtract -> gadget-decompose -> external product -> accumulate.
The two-kernel composition (ops/pallas_rotate.py + ops/pallas_extprod.py)
serializes the VPU rotation (measured ~350 us/step at B=4096) against the
MXU contraction (~610 us/step, 86% MFU): the rotation is pure dead time
for the MXU.  This kernel runs the WHOLE step as one ``pallas_call`` with
a one-tile software pipeline:

* the full negacyclic Toeplitz operand for BOTH channels — (2L*N, 2ch *
  kept_limbs * N) int8, ~25 MB at 128-bit shapes — lives in a VMEM
  scratch, built once per step at cell 0 from the packed band.  This is
  only possible because v5e VMEM is 128 MB; the default 16 MB Mosaic
  scoped-vmem limit is lifted via ``vmem_limit_bytes``.  Full residency
  is what kills the round-2 fused kernel's flaw (Toeplitz rebuilt per
  batch super-tile, amortized over only 2 sub-tiles: 1,898/s measured).
* grid cell ``bt`` rotates+decomposes batch tile ``bt`` into a VMEM digit
  slot (VPU) while contracting tile ``bt-1``'s digits against the
  resident Toeplitz on the MXU — two INDEPENDENT instruction chains that
  Mosaic's scheduler can overlap, hiding the rotation behind the matmul.
* the accumulator add is fused (aliased in/out), so HBM traffic per step
  is read acc twice + write acc once, all overlapped with compute.

Bit-exact with the two-kernel composition and with the portable
``blind_rotate`` step (tests/test_pallas_step.py).  Requires digits that
fit int8 (half_bg <= 128) and an exact int8 dot (2L*N*half_bg*128 < 2^31)
— both hold for every boolean profile.
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
                 bgbit: int, offset: int, tb: int, tj: int, lo: int):
    """One grid cell of the pipelined step.

    acc_rot_ref: (2, TB, N) int32   — acc tile bt (rotation input)
    amt_ref:     (TB, 1) int32      — rotation amounts for tile bt
    band_ref:    (2, 2L, pad+2N) int32 — limb-packed bands, both channels
    acc_add_ref: (2, TB, N) uint32  — acc tile bt-1 (fused add input)
    out_ref:     (2, TB, N) uint32  — updated acc tile bt-1
    digits_ref:  (2, TB, 2L*N) int8 scratch — digit slots (pipeline depth 2)
    toep_ref:    (2L*N, 2*nl*N) int8 scratch — full Toeplitz, both channels,
                 column order (channel, limb, n)
    """
    bt = pl.program_id(0)
    nbt = pl.num_programs(0) - 1
    l2 = 2 * l
    nl = NUM_LIMBS - lo
    half_bg = 1 << (bgbit - 1)
    mask = (1 << bgbit) - 1

    @pl.when(bt == 0)
    def _build_toeplitz():
        # T[(r, jt*tj + j'), (c*nl + lm-lo)*N + nt*tj? ...] — columns laid
        # out (c, lm, n).  T[(r, j), (c, lm, n')] = limb_lm(D[c, r, N + n'
        # - j]); the band stores D[m] at column pad + m (pack_bsk_band
        # PREPENDS pad zeros).  Window per (jt, nt-chunk of tj cols):
        # following pallas_extprod._build_toeplitz with tn == tj.
        for c in range(2):
            for r in range(l2):
                for jt in range(n // tj):
                    for nt in range(n // tj):
                        base = band_ref.shape[-1] - 2 * n - tj + n + \
                            nt * tj - jt * tj
                        w = band_ref[c, r, pl.ds(base, 2 * tj)]
                        wmat = jnp.broadcast_to(w, (tj, 2 * tj))
                        rolled = pltpu.roll(wmat, shift=tj, axis=1, stride=1,
                                            stride_axis=0)[:, :tj]
                        rows = pl.ds((r * (n // tj) + jt) * tj, tj)
                        for lm in range(lo, NUM_LIMBS):
                            limb = ((rolled >> (8 * lm)) & 255) - 128
                            col = (c * nl + lm - lo) * n + nt * tj
                            toep_ref[rows, pl.ds(col, tj)] = limb.astype(
                                jnp.int8)

    @pl.when(bt < nbt)
    def _rotate_decompose():
        lane = jax.lax.broadcasted_iota(jnp.int32, (tb, n), 1)
        amt = amt_ref[:, :]                             # (TB, 1)
        slot = bt % 2
        for ch in range(2):
            x0 = acc_rot_ref[ch]
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
                digits_ref[slot, :, pl.ds((ch * l + lv) * n, n)] = (
                    d.astype(jnp.int8))

    @pl.when(bt > 0)
    def _contract():
        lhs = digits_ref[(bt + 1) % 2]                  # tile bt-1
        acc = jax.lax.dot_general(
            lhs, toep_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)           # (TB, 2*nl*N)
        for c in range(2):
            out = None
            for j in range(nl):
                term = acc[:, (c * nl + j) * n:(c * nl + j + 1) * n]
                term = term.astype(jnp.uint32)
                if j + lo:
                    term = term << jnp.uint32(8 * (j + lo))
                out = term if out is None else out + term
            out_ref[c] = out + acc_add_ref[c]


@functools.partial(jax.jit,
                   static_argnums=(0,),
                   static_argnames=("tb", "tj"))
def fused_rotate_step(p: TFHEParams, acc: Array, amounts: Array,
                      band: Array, tb: int = 128, tj: int = 128) -> Array:
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
    nl = NUM_LIMBS - lo
    assert p.half_bg <= 128 and p.digit_limbs == 1
    assert l2 * n * p.half_bg * 128 < 1 << 31     # int8 dot exactness
    assert acc.shape == (2, b, n)
    assert b % tb == 0 and n % tj == 0
    pad = band.shape[-1] - 2 * n
    assert pad >= tj, (pad, tj)
    nbits = n.bit_length()
    off = p.decomposition_offset
    off = off - (1 << 32) if off >= (1 << 31) else off
    amt = amounts.astype(jnp.int32)[:, None]            # (B, 1)
    nbt = b // tb

    vmem_bytes = (l2 * n * 2 * nl * n            # Toeplitz scratch
                  + 2 * tb * l2 * n              # digit slots
                  + 6 * 2 * tb * n * 4           # acc in/add/out, x2 buffers
                  + 2 * band.size * 4) + (8 << 20)
    return pl.pallas_call(
        functools.partial(_step_kernel, n=n, nbits=nbits, l=p.l,
                          bgbit=p.bgbit, offset=off, tb=tb, tj=tj, lo=lo),
        grid=(nbt + 1,),
        in_specs=[
            pl.BlockSpec((2, tb, n),
                         lambda bt: (0, jnp.minimum(bt, nbt - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1),
                         lambda bt: (jnp.minimum(bt, nbt - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, l2, band.shape[-1]),
                         lambda bt: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tb, n),
                         lambda bt: (0, jnp.maximum(bt - 1, 0), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, tb, n),
                               lambda bt: (0, jnp.maximum(bt - 1, 0), 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, b, n), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((2, tb, l2 * n), jnp.int8),
            pltpu.VMEM((l2 * n, 2 * nl * n), jnp.int8),
        ],
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_bytes,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * l2 * n * 2 * nl * n,
            bytes_accessed=acc.size * 4 * 3,
            transcendentals=0,
        ),
        interpret=INTERPRET,
    )(to_signed(acc), amt, band, acc)
