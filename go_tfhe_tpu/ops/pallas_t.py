"""Pallas TPU kernels, TRANSPOSED layout: polynomial coefficients on
SUBLANES, ciphertext batch on LANES.

The row-major blind-rotate composition (pallas_rotate + pallas_extprod)
spends ~117 us/step rolling the accumulator along the LANE axis — lane
rotations decompose into cross-vreg shuffles.  With N on the sublane axis
the same log-rotation rounds are mostly vreg-granular moves: the fused
rotate+decompose kernel measures 158 vs 197 us/step and the full step
loop 698 vs 729 us/step at bench shapes (tools/probe_rot_t.py,
tools/proto_t_step.py; both layouts bit-exact) — the round-4 default for
single-limb-digit profiles (80/110/128-bit and the ``*_fast`` variants).

Layouts:
  acc     (2, N, B) uint32   — channel-major, coeff on sublanes
  digits  (2L*N, B) int8     — contraction index on sublanes
  band    (n0, 2, 2L, 2N+pad) int32 — limb-packed REVERSED D band
          (revD[x] = D[2N-1-x], pad APPENDED; see pack_bsk_band_rev)

The external product stays a STANDARD (M, K) x (K, N) MXU matmul: the
Toeplitz tile is built transposed —

    T2[l_col*tn + n', r*N + j'] = limb_l(D[c, r, N + out_nt*tn + n' - j'])
                                = limb_l(revD[(N-1 - out_nt*tn - n') + j'])

from the reversed band with the SAME strided-roll trick as the row-major
builder, roles of rows and columns swapped.  The grid's nt dimension maps
to output tiles in REVERSE order so the band window start is the positive
affine expression nt*tn + jt*tj (Mosaic's alignment prover rejects
subtracted traced products).  int8 x int8 -> int32 dots are exact
(K*half_bg*128 < 2^31 for every single-limb profile).

Wide-digit profiles (BGBIT > 8: Uint2-5) split digits into exact signed
base-256 limb row planes in-kernel and skip kernel-limb pairs whose
weight exceeds 2^32, exactly like the row-major kernel; the block and
extended-LUT paths stay on the row-major kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import TFHEParams
from ..utils.torus import to_signed
from .polymul import split_balanced_limbs_i8

Array = jax.Array

NUM_LIMBS = 4

# Interpreter escape hatch, same contract as pallas_extprod.INTERPRET.
INTERPRET = False


def pack_bsk_band_rev(bsk_u32: Array, pad: int = 1024) -> Array:
    """Raw BSK (n0, 2L, 2, N) uint32 -> limb-packed REVERSED int32 bands
    (n0, 2, 2L, 2N + pad) for the transposed kernels: revD[x] = D[2N-1-x]
    with D = concat([-K, K]); ``pad`` zeros APPENDED (window ends reach
    2N + tn - tj; pad >= the largest column tile keeps them in bounds)."""
    d = jnp.concatenate([jnp.zeros_like(bsk_u32) - bsk_u32, bsk_u32],
                        axis=-1)                       # (n0, 2L, 2, 2N)
    limbs = split_balanced_limbs_i8(to_signed(d), NUM_LIMBS)
    packed = jnp.zeros(limbs.shape[1:], jnp.uint32)
    for l in range(NUM_LIMBS):
        byte = (limbs[l].astype(jnp.int32) + 128).astype(jnp.uint32)
        packed = packed | (byte << jnp.uint32(8 * l))
    packed = jnp.swapaxes(packed, 1, 2)                # (n0, 2, 2L, 2N)
    packed = packed[..., ::-1]
    zeros = jnp.zeros(packed.shape[:-1] + (pad,), jnp.uint32)
    return to_signed(jnp.concatenate([packed, zeros], axis=-1))


def _rotdec_t_kernel(acc_ref, amt_ref, out_ref, *, n: int, nbits: int,
                     l: int, bgbit: int, offset: int, nd: int):
    """acc_ref (2, N, TB) int32; amt_ref (1, TB) int32;
    out_ref (ND*2L*N, TB) int8 digit limbs of X^amt . acc - acc:
    limb-major row blocks, each ordered [(c, lv)] * N coeffs.  Digits
    wider than int8 (BGBIT > 8, the Uint profiles) split in-kernel into
    ``nd`` exact signed base-256 limbs (polymul.split_signed_limbs_i8
    arithmetic)."""
    half_bg = 1 << (bgbit - 1)
    mask = (1 << bgbit) - 1
    tb = acc_ref.shape[2]
    sub = jax.lax.broadcasted_iota(jnp.int32, (n, 2 * tb), 0)
    # Both channels rotate by the same per-ciphertext amount: concatenate
    # them along lanes so each round is one roll/select.
    x0 = jnp.concatenate([acc_ref[0], acc_ref[1]], axis=1)   # (N, 2TB)
    a2 = jnp.concatenate([amt_ref[0:1, :], amt_ref[0:1, :]], axis=1)
    x = x0
    for b in range(nbits):
        s = 1 << b
        if s < n:
            rolled = pltpu.roll(x, shift=s, axis=0)
            rolled = jnp.where(sub < s, ~rolled, rolled)
        else:                                          # X^N == -1
            rolled = ~x
        x = jnp.where(((a2 >> b) & 1) > 0, rolled, x)
    tmp = (x - x0) + jnp.int32(offset)                 # wraps mod 2^32
    for lv in range(l):
        sh = 32 - (lv + 1) * bgbit
        d = ((tmp >> sh) & mask) - half_bg
        for i in range(nd):
            if nd == 1:
                limb, d = d, None
            else:
                if i < nd - 1:            # exact signed base-256 split
                    limb = ((d + 128) & 255) - 128
                    d = (d - limb) >> 8   # arithmetic shift, exact
                else:
                    limb = d
            for c in range(2):
                row = (i * 2 * l + (c * l) + lv) * n
                out_ref[pl.ds(row, n), :] = limb[
                    :, c * tb:(c + 1) * tb].astype(jnp.int8)


@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("tb",))
def rotate_decompose_t(p: TFHEParams, acc: Array, amounts: Array,
                       tb: int = 256) -> Array:
    """acc (2, N, B) uint32 transposed accumulators; amounts (B,) int32 in
    [0, 2N].  Returns (ND*2L*N, B) int8 digit limbs of
    X^amount . acc - acc (ND = p.digit_limbs; limb-major rows)."""
    nd = p.digit_limbs
    n = p.n
    b = acc.shape[2]
    rows = nd * 2 * p.l * n
    off = p.decomposition_offset
    off = off - (1 << 32) if off >= (1 << 31) else off
    while tb > 8 and b % tb:
        tb //= 2
    return pl.pallas_call(
        functools.partial(_rotdec_t_kernel, n=n, nbits=n.bit_length(),
                          l=p.l, bgbit=p.bgbit, offset=off, nd=nd),
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((2, n, tb), lambda bt: (0, 0, bt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb), lambda bt: (0, bt),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, tb), lambda bt: (0, bt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, b), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=48 << 20),
        interpret=INTERPRET,
    )(to_signed(acc), amounts.astype(jnp.int32)[None, :])


def _extprod_t_kernel(d_ref, band_ref, acc_ref, out_ref, t_scratch, *,
                      n: int, l2: int, tn: int, tj: int, lo: int, nd: int):
    """One grid cell: out tile = acc tile + product tile.

    d_ref (ND*2L*N, TB) int8 limb-major digit limbs; band_ref
    (1, 2L, 2N+pad) int32 reversed-packed; acc_ref/out_ref (1, tn, TB)
    uint32 (aliased); t_scratch ((NUM_LIMBS-lo)*tn, 2L*N) int8, rebuilt
    when nt moves.  Multi-limb digits (ND > 1): digit limb i contracts
    kernel limbs j <= NUM_LIMBS-1-i only (weight 2^(8(i+j)) < 2^32).
    """
    nt = pl.program_id(1)
    bt = pl.program_id(2)
    nl = NUM_LIMBS - lo

    @pl.when(bt == 0)
    def _build():
        for r in range(l2):
            for jt in range(n // tj):
                # rows n' in [0, tn); cols j' in [jt*tj, (jt+1)*tj):
                # value = revD[(N-1 - out_nt*tn - n') + jt*tj + m] with
                # out_nt = n//tn - 1 - nt (BlockSpecs reverse the tile
                # order so the window start stays a positive affine
                # expression): w0 = nt*tn + jt*tj.
                w0 = nt * tn + jt * tj
                w = band_ref[0, r, pl.ds(w0, 2 * tn)]
                wmat = jnp.broadcast_to(w, (tn, 2 * tn))
                # row n' reads w[(tn-1-n') + m], m in [0, tj):
                # roll(..., stride=1, stride_axis=0)[i, m] =
                #   x[i, (m - shift - i) mod 2tn]; shift === tn+1.
                # No wrap: m + tn-1-n' <= tj-1 + tn-1 < 2tn for tj <= tn.
                rolled = pltpu.roll(wmat, shift=tn + 1, axis=1, stride=1,
                                    stride_axis=0)[:, :tj]
                for l in range(lo, NUM_LIMBS):
                    limb = ((rolled >> (8 * l)) & 255) - 128
                    t_scratch[pl.ds((l - lo) * tn, tn),
                              pl.ds(r * n + jt * tj, tj)] = limb.astype(
                                  jnp.int8)

    out = None
    k2 = l2 * n
    for i in range(nd):
        dmat = d_ref[pl.ds(i * k2, k2), :]
        for l in range(nl - i):
            part = jax.lax.dot_general(
                t_scratch[pl.ds(l * tn, tn), :], dmat,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            term = part.astype(jnp.uint32)
            if i + l + lo:
                term = term << jnp.uint32(8 * (i + l + lo))
            out = term if out is None else out + term
    out_ref[0, :, :] = out + acc_ref[0, :, :]


@functools.partial(jax.jit,
                   static_argnames=("tb", "tn", "tj", "limb_mag", "lo",
                                    "nd"))
def extprod_t(digits: Array, band: Array, acc: Array, limb_mag: int = 128,
              tb: int = 256, tn: int = 1024, tj: int | None = None,
              lo: int = 0, nd: int = 1) -> Array:
    """digits (ND*2L*N, B) int8 limb-major; band (2, 2L, 2N+pad) int32
    reversed-packed; acc (2, N, B) uint32.  Returns acc + external
    product mod 2^32 (exact when ``lo`` == 0; ``lo`` drops the lowest
    kernel limbs — exact for on-grid keys with key_grid_bits >= 8*lo,
    see pallas_extprod; only valid for nd == 1)."""
    assert lo == 0 or nd == 1
    k, b = digits.shape
    k //= nd
    n = acc.shape[1]
    l2 = k // n
    assert acc.shape == (2, n, b)
    assert l2 * n * limb_mag * 128 < 1 << 31     # exact int8->int32 dot
    while tb > 8 and b % tb:
        tb //= 2
    while tn > n or n % tn:
        tn //= 2
    nl = NUM_LIMBS - lo
    while tn > 256 and nl * tn * k > 14 << 20:   # VMEM-budget the scratch
        tn //= 2
    if tj is None:
        # Full-width build windows: one strided roll per (r, out-tile)
        # instead of n/128 — measured 669.5 vs 684.7 us/step at the
        # 128bit_fast bench shapes (tools/sweep_t.py, round 5).
        tj = tn
    pad = band.shape[-1] - 2 * n
    assert tj <= tn, (tj, tn)
    assert pad >= tn - tj, (pad, tn, tj)
    grid = (2, n // tn, b // tb)
    return pl.pallas_call(
        functools.partial(_extprod_t_kernel, n=n, l2=l2, tn=tn, tj=tj,
                          lo=lo, nd=nd),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nd * k, tb), lambda c, nt, bt: (0, bt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l2, band.shape[-1]),
                         lambda c, nt, bt: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, tb),
                         lambda c, nt, bt: (c, n // tn - 1 - nt, bt),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn, tb),
                               lambda c, nt, bt: (c, n // tn - 1 - nt, bt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, n, b), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((nl * tn, k), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 3,
            vmem_limit_bytes=48 << 20),
        input_output_aliases={2: 0},
        interpret=INTERPRET,
    )(digits, band, acc)


# ---------------------------------------------------------------------------
# Extended-LUT (polyExtendFactor k > 1) transposed kernels.
# ---------------------------------------------------------------------------

def _ext_t_bytes_per_row(p: TFHEParams) -> int:
    """Rough per-batch-row VMEM footprint of the extended transposed
    rotation cell (~4 live copies of the (2, kN) int32 working set plus
    the digit block row)."""
    k, n = p.poly_extend_factor, p.n
    return 4 * (2 * k * n * 4) + k * p.digit_limbs * 2 * p.l * n


def ext_t_fits(p: TFHEParams) -> bool:
    """True when the extended transposed kernel fits VMEM at the minimum
    legal batch tile (128 lanes).  Uint8's k=9 big accumulator does not —
    it stays on the row-major extended path."""
    return 128 * _ext_t_bytes_per_row(p) <= 80 << 20


def _rotdec_ext_t_kernel(acc_ref, amt_ref, out_ref, *, n: int, k: int,
                         l: int, bgbit: int, offset: int, nd: int):
    """acc_ref (2, k*N, TB) int32 — interleaved big accumulator, block r in
    sublane rows [r*N, (r+1)*N); amt_ref (1, TB) int32 in [0, 2kN);
    out_ref (k*ND*2L*N, TB) int8 digit limbs, block-major row groups each
    in extprod_t's limb-major layout.  Rotation math identical to
    pallas_ext._rotdec_ext_kernel with rolls on the SUBLANE axis."""
    half_bg = 1 << (bgbit - 1)
    mask = (1 << bgbit) - 1
    l2 = 2 * l
    tb = acc_ref.shape[2]
    big = 2 * k * n
    nbits = (big - 1).bit_length()
    sub_n = jax.lax.broadcasted_iota(jnp.int32, (n, 2 * tb), 0)
    x0 = jnp.concatenate([acc_ref[0], acc_ref[1]], axis=1)   # (kN, 2TB)
    a2 = jnp.concatenate([amt_ref[0:1, :], amt_ref[0:1, :]], axis=1)

    def seg(x, r):
        return x[r * n:(r + 1) * n, :]

    def rot_y(x_seg, m):
        m = m % (2 * n)
        flip, a = m >= n, m % n
        if a:
            x_seg = pltpu.roll(x_seg, shift=a, axis=0)
            x_seg = jnp.where(sub_n < a, ~x_seg, x_seg)
        return ~x_seg if flip else x_seg

    x = x0
    for j in range(nbits):
        shift = (1 << j) % big
        s, q = shift % k, shift // k
        parts = []
        for rp in range(k):
            src = (rp - s) % k
            parts.append(rot_y(seg(x, src), q + (1 if rp < s else 0)))
        rolled = jnp.concatenate(parts, axis=0) if k > 1 else parts[0]
        bit = (a2 >> j) & 1
        x = jnp.where(bit > 0, rolled, x)

    for r in range(k):
        tmp = (seg(x, r) - seg(x0, r)) + jnp.int32(offset)
        for lv in range(l):
            sh = 32 - (lv + 1) * bgbit
            d = ((tmp >> sh) & mask) - half_bg
            for i in range(nd):
                if nd == 1:
                    limb, d = d, None
                else:
                    if i < nd - 1:
                        limb = ((d + 128) & 255) - 128
                        d = (d - limb) >> 8
                    else:
                        limb = d
                for c in range(2):
                    row = ((r * nd + i) * l2 + c * l + lv) * n
                    out_ref[pl.ds(row, n), :] = limb[
                        :, c * tb:(c + 1) * tb].astype(jnp.int8)


@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("tb",))
def rotate_decompose_ext_t(p: TFHEParams, acc: Array, amounts: Array,
                           tb: int | None = None) -> Array:
    """acc (2, k*N, B) uint32; amounts (B,) int32 in [0, 2kN).
    Returns (k*ND*2L*N, B) int8 digit limbs (block-major row groups)."""
    k, n, nd = p.poly_extend_factor, p.n, p.digit_limbs
    b = acc.shape[2]
    assert acc.shape == (2, k * n, b)
    rows = k * nd * 2 * p.l * n
    off = p.decomposition_offset
    off = off - (1 << 32) if off >= (1 << 31) else off
    if tb is None:
        tb = 256
        while tb > 128 and tb * _ext_t_bytes_per_row(p) > 40 << 20:
            tb //= 2
    while tb > 8 and b % tb:
        tb //= 2
    # Pallas requires the lane dim of a block either >= 128-divisible or
    # equal to the array dim; tb < 128 is only legal when it IS the batch.
    assert tb >= 128 or tb == b, (tb, b)
    return pl.pallas_call(
        functools.partial(_rotdec_ext_t_kernel, n=n, k=k, l=p.l,
                          bgbit=p.bgbit, offset=off, nd=nd),
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((2, k * n, tb), lambda bt: (0, 0, bt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb), lambda bt: (0, bt),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, tb), lambda bt: (0, bt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, b), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=96 << 20),
        interpret=INTERPRET,
    )(to_signed(acc), amounts.astype(jnp.int32)[None, :])


def _extprod_ext_t_kernel(d_ref, band_ref, acc_ref, out_ref, t_scratch, *,
                          n: int, l2: int, tn: int, tj: int, lo: int,
                          nd: int, k: int):
    """Extended variant of _extprod_t_kernel: grid dim 1 enumerates
    (ntb, r) pairs with r fastest (nt = ntb*k + r), so the transposed
    Toeplitz scratch — which depends on (c, ntb) only — is rebuilt once
    per k block cells.  Block r contracts digit row group r against the
    SAME band; output rows live at block r's [r*N + tile] range (the
    BlockSpec index maps handle both)."""
    nt = pl.program_id(1)
    bt = pl.program_id(2)
    nl = NUM_LIMBS - lo
    ntb = nt // k

    @pl.when((bt == 0) & (nt % k == 0))
    def _build():
        for r in range(l2):
            for jt in range(n // tj):
                w0 = ntb * tn + jt * tj
                w = band_ref[0, r, pl.ds(w0, 2 * tn)]
                wmat = jnp.broadcast_to(w, (tn, 2 * tn))
                rolled = pltpu.roll(wmat, shift=tn + 1, axis=1, stride=1,
                                    stride_axis=0)[:, :tj]
                for l in range(lo, NUM_LIMBS):
                    limb = ((rolled >> (8 * l)) & 255) - 128
                    t_scratch[pl.ds((l - lo) * tn, tn),
                              pl.ds(r * n + jt * tj, tj)] = limb.astype(
                                  jnp.int8)

    out = None
    k2 = l2 * n
    for i in range(nd):
        dmat = d_ref[pl.ds(i * k2, k2), :]
        for l in range(nl - i):
            part = jax.lax.dot_general(
                t_scratch[pl.ds(l * tn, tn), :], dmat,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            term = part.astype(jnp.uint32)
            if i + l + lo:
                term = term << jnp.uint32(8 * (i + l + lo))
            out = term if out is None else out + term
    out_ref[0, :, :] = out + acc_ref[0, :, :]


@functools.partial(jax.jit,
                   static_argnames=("kblocks", "tb", "tn", "tj", "limb_mag",
                                    "lo", "nd"))
def extprod_ext_t(digits: Array, band: Array, acc: Array, kblocks: int,
                  limb_mag: int = 128, tb: int = 256, tn: int = 1024,
                  tj: int | None = None, lo: int = 0, nd: int = 1) -> Array:
    """Extended-LUT transposed external product: digits
    (k*ND*2L*N, B) int8 block-major; band (2, 2L, 2N+pad) int32
    reversed-packed; acc (2, k*N, B) uint32.  Returns acc + the
    block-wise external product (every block contracts the same band)."""
    assert lo == 0 or nd == 1
    kk = kblocks
    rows, b = digits.shape
    n = acc.shape[1] // kk
    k2 = rows // (kk * nd)
    l2 = k2 // n
    assert acc.shape == (2, kk * n, b)
    assert l2 * n * limb_mag * 128 < 1 << 31
    while tb > 8 and b % tb:
        tb //= 2
    while tn > n or n % tn:
        tn //= 2
    nl = NUM_LIMBS - lo
    while tn > 256 and nl * tn * k2 > 14 << 20:
        tn //= 2
    if tj is None:
        tj = tn          # full-width build windows (see extprod_t)
    pad = band.shape[-1] - 2 * n
    assert tj <= tn, (tj, tn)
    assert pad >= tn - tj, (pad, tn, tj)
    m = n // tn
    grid = (2, m * kk, b // tb)
    return pl.pallas_call(
        functools.partial(_extprod_ext_t_kernel, n=n, l2=l2, tn=tn, tj=tj,
                          lo=lo, nd=nd, k=kk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nd * k2, tb), lambda c, nt, bt: (nt % kk, bt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l2, band.shape[-1]),
                         lambda c, nt, bt: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, tb),
                         lambda c, nt, bt: (
                             c, (nt % kk) * m + (m - 1 - nt // kk), bt),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn, tb),
                               lambda c, nt, bt: (
                                   c, (nt % kk) * m + (m - 1 - nt // kk),
                                   bt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, kk * n, b), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((nl * tn, k2), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 3,
            vmem_limit_bytes=96 << 20),
        input_output_aliases={2: 0},
        interpret=INTERPRET,
    )(digits, band, acc)
