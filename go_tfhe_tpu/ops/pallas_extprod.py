"""Pallas TPU kernel: fused Toeplitz-build + bf16 MXU external product.

The external product contracts gadget digits (B, 2L, N) with the negacyclic
structure of a TRGSW row:  out[b, c, n] = sum_{r,j} d[b,r,j] * D[c,r, N+n-j]
where D = concat([-K, K]) (see ops/polymul.py).  XLA's conv/matmul lowerings
leave the MXU mostly idle here (tiny channel counts / layout-hostile Toeplitz
materialization), so this kernel:

* builds Toeplitz tiles *in VMEM* from the 2N-coefficient band D using
  Mosaic's strided roll (``pltpu.roll(..., stride=1, stride_axis=0)`` makes
  row j a copy of the band shifted by j — exactly a Toeplitz tile), never
  touching HBM with the O(N^2) matrix;
* contracts on the MXU in bfloat16 — measured ~4x faster than the int8 path
  on this stack — with **exact** integer arithmetic:
    - K is split into 4 balanced 8-bit limbs (|limb| <= 128, exact in bf16's
      8-bit mantissa); digits satisfy |d| <= half_bg <= 128 (also exact);
    - the MXU accumulates bf16 products in float32; each half-K contraction
      is bounded by (2L*N/2)*half_bg*128 <= 2^23.6 < 2^24, so every partial
      sum is an exactly-represented f32 integer;
    - the two halves are converted to int32 and added with wraparound, and
      limbs are recombined with shifts — all mod 2^32, matching the torus.
* amortizes the Toeplitz build across the batch (grid is (c, nt, bt) with bt
  innermost; the tile is rebuilt only when (c, nt) changes).

Negative result (measured, v5e): ping-pong-scratch pipelining of the next
combo's build under the current combo's dots — a few VPU roll-units per
cell — REGRESSED the full bootstrap 7,368 -> 6,665/s.  Mosaic serializes
VPU work against MXU dots in the same cell body (the same effect killed
the single-kernel fused step, ops/pallas_step.py), so the ~67 us/step
build is cheapest left synchronous at each combo's first cell.

Digits must satisfy half_bg <= 128 (BGBIT <= 8: the 80/110/128-bit and uint1
profiles).  The band is padded to TN+2N columns — TN zeros PREPENDED — so
every 2*TN-wide window slice is in bounds (the pad positions are never
referenced by a valid (j, n) pair).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.torus import to_signed
from .polymul import split_balanced_limbs_i8

Array = jax.Array

NUM_LIMBS = 4
_EXACT_BOUND = 1 << 24  # f32 integer-exact range

# When True, pallas_call runs in the (CPU) interpreter — lets CI execute the
# kernel off-TPU bit-exactly.  Read at TRACE time: tests set it before the
# first call of a given shape (jit caches per shape, so flipping it later
# does not retrace already-compiled shapes).
INTERPRET = False


def pack_bsk_band(bsk_u32: Array, tn: int = 256) -> Array:
    """Raw BSK (n0, 2L, 2, N) uint32 -> limb-packed int32 bands
    (n0, 2, 2L, tn + 2N) for the Pallas kernel.

    Each int32 packs the 4 balanced int8 limbs of one D coefficient as biased
    bytes (limb + 128): Mosaic's strided roll handles 32-bit lanes only, so
    the kernel rolls once per tile and unpacks all 4 limbs afterwards.

    The tn zeros are PREPENDED so that every 2*tn window the kernel slices
    (start ``n + nt*tn - jt*tj``, see _extprod_kernel) is in bounds: starts
    range over [tj, n + (n/tn-1)*tn], ends at most tn + 2N.  (Appending
    instead would make low-(nt) / high-(jt) window starts negative — reading
    out of bounds, which real Mosaic tolerates because the out-of-window
    lanes are never referenced, but which is undefined behavior and breaks
    interpret mode.)
    """
    d = jnp.concatenate([jnp.zeros_like(bsk_u32) - bsk_u32, bsk_u32], axis=-1)
    limbs = split_balanced_limbs_i8(to_signed(d), NUM_LIMBS)  # (4,n0,2L,2,2N)
    packed = jnp.zeros(limbs.shape[1:], jnp.uint32)
    for l in range(NUM_LIMBS):
        byte = (limbs[l].astype(jnp.int32) + 128).astype(jnp.uint32)
        packed = packed | (byte << jnp.uint32(8 * l))
    packed = jnp.swapaxes(packed, 1, 2)                       # (n0,2,2L,2N)
    pad = jnp.zeros(packed.shape[:-1] + (tn,), jnp.uint32)
    return to_signed(jnp.concatenate([pad, packed], axis=-1))


def _extprod_kernel(d_ref, band_ref, *rest, n: int, l2: int,
                    nd: int, tn: int, tj: int, k_split: int, base0: int,
                    lo: int):
    """One grid cell of the external product.

    d_ref:    (TB, ND*2L*N) int8 digit limbs (limb-major; full contraction
              row per limb).
    band_ref: (1, 2L, pad+2N) int32 — limb-packed D band for this c.
    out_ref:  (1, TB, TN) uint32 output tile (output layout is (2, B, N)).
    t_scratch:(2L*N, (NUM_LIMBS-lo)*TN) bf16 Toeplitz tile, rebuilt when nt
              moves.

    Multi-limb digits (ND > 1, profiles with BGBIT > 8): digit limb i only
    contracts kernel-limb columns j <= NUM_LIMBS-1-i — terms with weight
    2^(8(i+j)) >= 2^32 vanish mod 2^32.

    ``lo`` > 0 drops the lowest ``lo`` kernel limbs (noise-budget
    truncation, see extprod_pallas) — only meaningful for nd == 1.

    When an accumulator input is present (``rest`` = (acc_ref, out_ref,
    scratch)), the kernel writes acc + product — fusing the blind-rotate
    accumulator update and saving one full HBM sweep per step.
    """
    if len(rest) == 3:
        acc_ref, out_ref, t_scratch = rest
    else:
        acc_ref = None
        out_ref, t_scratch = rest
    nt = pl.program_id(1)
    bt = pl.program_id(2)
    k = l2 * n
    nl = NUM_LIMBS - lo
    int8_dot = t_scratch.dtype == jnp.int8

    @pl.when(bt == 0)
    def _build_toeplitz():
        # T[(r, jt*tj + j'), (l-lo)*tn + n'] = limb_l(D[c, r, n + nt*tn + n'
        #   - jt*tj - j']) = limb_l(w[tn + n' - j']),
        # w = band[c, r, base : base + 2*tn].  The band stores D[m] at
        # column pad + m (pack_bsk_band PREPENDS pad zeros), so
        # base = base0 + n + nt*tn - jt*tj with base0 = pad - tn >= 0;
        # every window is in bounds: base >= base0 + tj, end <= pad + 2n.
        for r in range(l2):
            for jt in range(n // tj):
                base = base0 + n + nt * tn - jt * tj
                w = band_ref[0, r, pl.ds(base, 2 * tn)]
                wmat = jnp.broadcast_to(w, (tj, 2 * tn))
                # roll: out[j, m] = w[(m - shift - j) mod 2tn]; want
                # w[tn + m - j]  ->  shift = -tn mod 2tn = tn.
                rolled = pltpu.roll(wmat, shift=tn, axis=1, stride=1,
                                    stride_axis=0)[:, :tn]
                rows = pl.ds((r * (n // tj) + jt) * tj, tj)
                for l in range(lo, NUM_LIMBS):
                    limb = ((rolled >> (8 * l)) & 255) - 128
                    t_scratch[rows, pl.ds((l - lo) * tn, tn)] = limb.astype(
                        t_scratch.dtype)

    out = None
    kc = k // k_split
    for i in range(nd):
        cols = (nl - i) * tn
        if int8_dot:
            # int8 x int8 -> int32: exact as long as |partial| < 2^31
            # (checked by the caller), no K split needed.
            d_i = d_ref[:, pl.ds(i * k, k)]
            acc = jax.lax.dot_general(
                d_i, t_scratch[:, :cols], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        else:
            d_bf = d_ref[:, pl.ds(i * k, k)].astype(jnp.bfloat16)
            # Split-K so each f32 partial sum stays integer-exact (< 2^24).
            acc = None
            for s in range(k_split):
                part = jnp.dot(d_bf[:, s * kc:(s + 1) * kc],
                               t_scratch[pl.ds(s * kc, kc), :cols],
                               preferred_element_type=jnp.float32)
                part_i = part.astype(jnp.int32)
                acc = part_i if acc is None else acc + part_i  # wraps mod 2^32
        for j in range(nl - i):
            term = acc[:, j * tn:(j + 1) * tn].astype(jnp.uint32)
            if i + j + lo:
                term = term << jnp.uint32(8 * (i + j + lo))
            out = term if out is None else out + term
    if acc_ref is not None:
        out = out + acc_ref[0, :, :]
    out_ref[0, :, :] = out


@functools.partial(jax.jit,
                   static_argnames=("tb", "tn", "tj", "limb_mag",
                                    "drop_limbs", "dot_dtype"))
def extprod_pallas(digits_i8: Array, band_i32: Array, limb_mag: int = 128,
                   tb: int = 128, tn: int = 256, tj: int = 128,
                   drop_limbs: int = 0, dot_dtype: str = "bf16",
                   acc: Array | None = None) -> Array:
    """digits_i8: (B, 2L, N) or (B, ND, 2L, N) int8 digit limbs;
    band_i32: (2, 2L, pad+2N) int32 (limb-packed, pad >= tn).

    Returns (2, B, N) uint32 — external product mod 2^32 (exact when
    drop_limbs == 0), in the channel-major accumulator layout used by the
    Pallas blind rotate.  ``limb_mag`` bounds |digit limb| (half_bg when
    ND == 1, else 128).

    ``drop_limbs``: noise-budget kernel-limb truncation.  Dropping the
    lowest ``lo`` kernel limbs cuts MXU columns by lo/4 and adds an error of
    at most 2^(8*lo) per kernel coefficient.  Per blind-rotate step the
    error is a zero-mean sum of 2L*N digit-x-limb products
    (std ~= sqrt(2L*N) * half_bg/sqrt(3) * 2^(8*lo)/sqrt(12)); at the
    128-bit profile with lo=1 that is ~2^16.7 per step, ~2^21.5 after all
    700 steps — 2^7 sigma below the 2^29 gate decision margin, i.e.
    negligible against the reference's own float64-FFT rounding tolerance
    (poly/poly_test.go:29 allows 10 ulp ~= 2^13 per coefficient *per
    product*).  Only valid for single-limb digits (nd == 1).

    ``dot_dtype``: "bf16" (f32-accumulating MXU dot, split-K for exactness)
    or "int8" (int8 x int8 -> int32 MXU dot; same measured rate on this
    hardware, half the Toeplitz VMEM, no K split — required for the fused
    block layout whose bf16 scratch would exceed VMEM).

    ``acc``: optional (2, B, N) uint32 accumulator — when given, returns
    acc + product (the blind-rotate update) with the add fused in VMEM.
    """
    if digits_i8.ndim == 3:
        digits_i8 = digits_i8[:, None]
    b, nd, l2, n = digits_i8.shape
    assert b % tb == 0 and n % tn == 0 and n % tj == 0
    assert drop_limbs == 0 or nd == 1, "truncation needs single-limb digits"
    assert 0 <= drop_limbs < NUM_LIMBS
    assert dot_dtype in ("bf16", "int8")
    pad = band_i32.shape[-1] - 2 * n     # prepended zeros (pack_bsk_band)
    assert pad >= tn, (pad, tn)
    if dot_dtype == "int8":
        # single int32-accumulating dot; must not overflow int32
        assert l2 * n * limb_mag * 128 < 1 << 31
        k_split = 1
        scratch_dtype = jnp.int8
    else:
        scratch_dtype = jnp.bfloat16
        # pick the smallest K split keeping each partial sum < 2^24
        k_split = 1
        while (l2 * n // k_split) * limb_mag * 128 >= _EXACT_BOUND:
            k_split *= 2
    d_flat = digits_i8.reshape(b, nd * l2 * n)

    grid = (2, n // tn, b // tb)
    in_specs = [
        pl.BlockSpec((tb, nd * l2 * n), lambda c, nt, bt: (bt, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, l2, band_i32.shape[-1]),
                     lambda c, nt, bt: (c, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [d_flat, band_i32]
    aliases = {}
    if acc is not None:
        assert acc.shape == (2, b, n) and acc.dtype == jnp.uint32
        in_specs.append(pl.BlockSpec((1, tb, tn),
                                     lambda c, nt, bt: (c, bt, nt),
                                     memory_space=pltpu.VMEM))
        inputs.append(acc)
        aliases = {2: 0}       # write the updated accumulator in place
    out = pl.pallas_call(
        functools.partial(_extprod_kernel, n=n, l2=l2, nd=nd, tn=tn, tj=tj,
                          k_split=k_split, base0=pad - tn, lo=drop_limbs),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tb, tn), lambda c, nt, bt: (c, bt, nt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, b, n), jnp.uint32),
        scratch_shapes=[pltpu.VMEM(
            (l2 * n, (NUM_LIMBS - drop_limbs) * tn), scratch_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            # v5e has 128 MB physical VMEM; the Mosaic default scoped limit
            # is 16 MB.  Raising it admits tb=256 blocks next to the block
            # path's large fused Toeplitz scratch (an upper bound, not an
            # allocation).
            vmem_limit_bytes=48 << 20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * l2 * n * 2 * (NUM_LIMBS - drop_limbs) * n * nd,
            bytes_accessed=b * nd * l2 * n * (2 * n // tn) + b * 2 * n * 4,
            transcendentals=0,
        ),
        input_output_aliases=aliases,
        interpret=INTERPRET,
    )(*inputs)
    return out
