"""Pallas TPU kernel: fused EXTENDED-LUT rotation + gadget decomposition.

TPU fast path of the polyExtendFactor mechanism (ops/blindrotate.py
``blind_rotate_extended``) — the LookUpTableSize = k*N capability the
reference advertises for Uint6-8 but never implements
(lut/generator.go:19-21, params/UINT_STATUS.md:20-31).

The degree-kN big polynomial is stored interleaved as k TRLWE blocks
(big[j] == block[j % k][j // k], see rotate.monomial_mul_blocks); the
accumulator lives in channel-major (2, B, k*N) layout with block r in
columns [r*N, (r+1)*N).  Rotation by X^t (t in [0, 2kN), per ciphertext)
is a block permutation plus per-block negacyclic Y = X^k rotations:

    out_block[r'] = Y^(q + [r' < s]) . block[(r' - s) mod k],
    s = shift mod k,  q = shift div k

composed log-style over the bits of t with STATIC per-bit shifts
2^j mod 2kN — each round is k static column-segment rolls + constant sign
masks + a per-row bit select, bit-exact with
``rotate.monomial_mul_blocks_log`` (which is bit-exact with
``monomial_mul_blocks`` for every t).

The difference (X^t.ACC - ACC) is then gadget-decomposed per block into
int8 digit limbs in the exact flat layout ``extprod_pallas`` consumes
with the k blocks folded into the batch axis: output row b holds block r
at columns [r*nd*2L*N, ...), so ``out.reshape(B*k, nd, 2L, N)`` is a free
relayout and the external product treats k as extra batch — the CMUX is
block-wise with the SAME TRGSW band (blindrotate.py:138-143).

Versus the portable extended path (negacyclic_extprod_toeplitz inside the
step loop, which materializes (2L, 2, N, N) Toeplitz tensors per step —
~134 MB of intermediate at Uint8), this keeps the big accumulator tile in
VMEM and emits only digits; the contraction runs on the same int8 MXU
kernel as the boolean profiles.
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


def _rotdec_ext_kernel(acc_ref, amt_ref, out_ref, *, n: int, k: int,
                       l: int, bgbit: int, offset: int, nd: int):
    """acc_ref: (2, TB, k*N) int32;  amt_ref: (TB, 1) int32 in [0, 2kN);
    out_ref: (TB, k*nd*2L*N) int8 digits of X^amt . ACC - ACC, block-major
    outer, limb-major inside each block (extprod_pallas flat layout)."""
    half_bg = 1 << (bgbit - 1)
    mask = (1 << bgbit) - 1
    l2 = 2 * l
    tb = acc_ref.shape[1]
    big = 2 * k * n
    nbits = (big - 1).bit_length()
    lane_n = jax.lax.broadcasted_iota(jnp.int32, (2 * tb, n), 1)
    # Both channels rotate by the same per-ciphertext amount: merge them
    # into one (2*TB, k*N) array (fewer, larger Mosaic ops).
    x0 = jnp.concatenate([acc_ref[0], acc_ref[1]], axis=0)   # (2TB, kN)
    amt2 = jnp.concatenate([amt_ref[:, :1], amt_ref[:, :1]], axis=0)

    def seg(x, r):
        return x[:, r * n:(r + 1) * n]

    def rot_y(x_seg, m):
        """Negacyclic Y^m on one (2TB, N) block segment; m static."""
        m = m % (2 * n)
        flip, a = m >= n, m % n
        if a:
            x_seg = pltpu.roll(x_seg, shift=a, axis=1)
            x_seg = jnp.where(lane_n < a, ~x_seg, x_seg)
        return ~x_seg if flip else x_seg

    x = x0
    for j in range(nbits):
        shift = (1 << j) % big
        s, q = shift % k, shift // k
        parts = []
        for rp in range(k):
            src = (rp - s) % k
            parts.append(rot_y(seg(x, src), q + (1 if rp < s else 0)))
        rolled = jnp.concatenate(parts, axis=1) if k > 1 else parts[0]
        bit = (amt2 >> j) & 1
        x = jnp.where(bit > 0, rolled, x)

    for r in range(k):
        tmp = (seg(x, r) - seg(x0, r)) + jnp.int32(offset)   # wraps mod 2^32
        for lv in range(l):
            sh = 32 - (lv + 1) * bgbit
            d = ((tmp >> sh) & mask) - half_bg
            for i in range(nd):
                if nd == 1:
                    limb, d = d, None
                else:
                    if i < nd - 1:                # exact signed base-256 split
                        limb = ((d + 128) & 255) - 128
                        d = (d - limb) >> 8       # arithmetic shift, exact
                    else:
                        limb = d
                for c in range(2):
                    col = (r * nd * l2 + i * l2 + c * l + lv) * n
                    out_ref[:, pl.ds(col, n)] = (
                        limb[c * tb:(c + 1) * tb].astype(jnp.int8))


def ext_batch_tile(p: TFHEParams, budget_bytes: int = 40 << 20) -> int:
    """Largest batch tile keeping the kernel's VMEM footprint in budget
    (~4 live copies of the (2TB, kN) int32 working set + the digit block)."""
    k, n = p.poly_extend_factor, p.n
    per_row = 4 * (2 * k * n * 4) + k * p.digit_limbs * 2 * p.l * n
    tb = 256
    while tb > 32 and tb * per_row > budget_bytes:
        tb //= 2
    return tb


@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("tb",))
def rotate_decompose_ext_pallas(p: TFHEParams, acc: Array, amounts: Array,
                                tb: int | None = None) -> Array:
    """acc: (2, B, k*N) uint32 channel-major interleaved big accumulators;
    amounts: (B,) int32 rotation amounts in [0, 2kN).

    Returns int8 gadget digit limbs of X^amount . ACC - ACC shaped
    (B, k * nd * 2L * N) — reshape to (B*k, nd, 2L, N) for extprod_pallas
    (free relayout; blocks fold into the batch axis).
    """
    k, n, nd = p.poly_extend_factor, p.n, p.digit_limbs
    b = acc.shape[1]
    assert acc.shape == (2, b, k * n)
    if tb is None:
        tb = ext_batch_tile(p)
    while tb > 8 and b % tb:
        tb //= 2
    assert b % tb == 0, (b, tb)
    off = p.decomposition_offset
    off = off - (1 << 32) if off >= (1 << 31) else off
    cols = k * nd * 2 * p.l * n

    out = pl.pallas_call(
        functools.partial(_rotdec_ext_kernel, n=n, k=k, l=p.l,
                          bgbit=p.bgbit, offset=off, nd=nd),
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((2, tb, k * n), lambda bt: (0, bt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda bt: (bt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, cols), lambda bt: (bt, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, cols), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=96 << 20,     # v5e: 128 MB physical
        ),
        interpret=INTERPRET,
    )(to_signed(acc), amounts.astype(jnp.int32)[:, None])
    return out
