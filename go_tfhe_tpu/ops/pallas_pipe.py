"""Pallas TPU kernel: HALF-BATCH pipelined blind-rotate step (transposed
layout) — the round-5 VPU/MXU overlap probe.

Round-4 PERF_ANALYSIS measured four ways that Mosaic serializes the VPU
rotation (~194 us/step at B=4096) against the MXU contraction (~555 us):
fused cell bodies, ping-pong builds, rotation-ahead grid cells, and batch
doubling all left the serial sum intact.  All four, however, pipelined
work with a data dependence *within* one blind-rotate step.  This kernel
exploits the one independence the algorithm does offer: two HALVES of the
ciphertext batch share no data at all.  Each ``pallas_call`` performs

* MXU: the external-product contraction for half X at step i
  (digits already computed) — t_scratch Toeplitz build + nl int8 dots,
* VPU: the rotation + gadget decomposition for half Y (whose step-i
  digits the *next* call will contract) — log-rolls on the sublane axis,

two instruction chains with disjoint inputs and outputs.  The step loop
alternates halves, one half-step out of phase:

    call 2i  : dot(A, step i)   + rot(B, step i)
    call 2i+1: dot(B, step i)   + rot(A, step i+1)

If Mosaic co-issued the independent VPU chain under the MXU dots, a full
step would cost 2 * max(dot(B/2), rot(B/2)) ~ dot(B) and the 128-bit
profile would reach ~10.5k bootstraps/s on the v5e.

MEASURED RESULT (round 5, tools/probe_pipe3.py, jitted-core step
differential — the only harness where both points are device-bound):
it still serializes.  740.6 us/step vs the two-kernel baseline's 690.0;
the statement-interleaved variant (``interleave=True``, rotation-round
chunks emitted between the dot limbs) recovers only ~21 us of the ~194 us
VPU chain (719.2 us/step) and the halved Toeplitz-build amortization
(+~25 us/call) eats the rest.  This is the FIFTH and strongest
serialization result: no data dependence whatsoever forces the ordering,
yet the units do not overlap (full analysis: PERF_ANALYSIS.md).  The
kernel stays available (engine.PREFER_PIPE / bench.py --pipe) as the
restart point if a Mosaic release starts co-scheduling.

Bit-exact with blind_rotate / blind_rotate_t (tests/test_pallas_pipe.py);
single-limb-digit profiles (half_bg <= 128) with N a multiple of 256.
Reference semantics: evaluator/evaluator.go:110-135.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import TFHEParams
from ..utils.torus import to_signed

Array = jax.Array

NUM_LIMBS = 4

# Interpreter escape hatch, same contract as pallas_extprod.INTERPRET.
INTERPRET = False


def _pipe_kernel(dx_ref, band_ref, accx_ref, accy_ref, amty_ref,
                 outx_ref, digy_ref, t_scratch, *, n: int, nbits: int,
                 l: int, bgbit: int, offset: int, tj: int, lo: int,
                 rot_first: bool, interleave: bool):
    """One grid cell (c, bt): contract half-X digits for channel c, batch
    tile bt, AND rotate+decompose channel c of half Y's tile bt.

    dx_ref   (2L*N, TB) int8     — half-X digit limbs (both channels)
    band_ref (1, 2L, 2N+pad) i32 — reversed-packed band, channel c
    accx_ref (1, N, TB) uint32   — half-X accumulator tile (aliased out)
    accy_ref (1, N, TB) int32    — half-Y accumulator tile (rotation input)
    amty_ref (1, TB) int32       — half-Y rotation amounts
    outx_ref (1, N, TB) uint32   — updated half-X accumulator
    digy_ref (L*N, TB) int8      — half-Y digits, channel-c row block
    t_scratch ((NUM_LIMBS-lo)*N, 2L*N) int8 — Toeplitz, built at bt == 0
    """
    bt = pl.program_id(1)
    l2 = 2 * l
    nl = NUM_LIMBS - lo
    half_bg = 1 << (bgbit - 1)
    mask = (1 << bgbit) - 1
    k2 = l2 * n

    @pl.when(bt == 0)
    def _build():
        # Same window construction as pallas_t._extprod_t_kernel with
        # tn == N (single output tile, out_nt == nt == 0):
        # T2[lm*N + n', r*N + jt*tj + m] = limb_lm(revD[(N-1-n') + jt*tj+m])
        for r in range(l2):
            for jt in range(n // tj):
                w = band_ref[0, r, pl.ds(jt * tj, 2 * n)]
                wmat = jnp.broadcast_to(w, (n, 2 * n))
                rolled = pltpu.roll(wmat, shift=n + 1, axis=1, stride=1,
                                    stride_axis=0)[:, :tj]
                for lm in range(lo, NUM_LIMBS):
                    limb = ((rolled >> (8 * lm)) & 255) - 128
                    t_scratch[pl.ds((lm - lo) * n, n),
                              pl.ds(r * n + jt * tj, tj)] = limb.astype(
                                  jnp.int8)

    def _rot_rounds(x, a, sub, rounds):
        for b in rounds:
            s = 1 << b
            if s < n:
                rolled = pltpu.roll(x, shift=s, axis=0)
                rolled = jnp.where(sub < s, ~rolled, rolled)
            else:                                      # X^N == -1
                rolled = ~x
            x = jnp.where(((a >> b) & 1) > 0, rolled, x)
        return x

    def _rot_finish(x, x0):
        tmp = (x - x0) + jnp.int32(offset)             # wraps mod 2^32
        for lv in range(l):
            sh = 32 - (lv + 1) * bgbit
            d = ((tmp >> sh) & mask) - half_bg
            digy_ref[pl.ds(lv * n, n), :] = d.astype(jnp.int8)

    def _rotate():
        sub = jax.lax.broadcasted_iota(jnp.int32, accy_ref.shape[1:], 0)
        x0 = accy_ref[0]                               # (N, TB) int32
        a = amty_ref[0:1, :]                           # (1, TB)
        _rot_finish(_rot_rounds(x0, a, sub, range(nbits)), x0)

    def _dot(lm):
        part = jax.lax.dot_general(
            t_scratch[pl.ds(lm * n, n), :], dx_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        term = part.astype(jnp.uint32)
        if lm + lo:
            term = term << jnp.uint32(8 * (lm + lo))
        return term

    def _contract():
        out = None
        for lm in range(nl):
            term = _dot(lm)
            out = term if out is None else out + term
        outx_ref[0, :, :] = out + accx_ref[0, :, :]

    if interleave:
        # Emit rotation-round chunks BETWEEN the dot limbs in source
        # order, probing whether Mosaic's scheduler merely keeps source
        # order (then this overlaps the VPU chunks with MXU latency) or
        # cannot co-issue the units at all.
        sub = jax.lax.broadcasted_iota(jnp.int32, accy_ref.shape[1:], 0)
        x0 = accy_ref[0]
        a = amty_ref[0:1, :]
        x = x0
        out = None
        bounds = [nbits * (i + 1) // nl for i in range(nl)]
        start = 0
        for lm in range(nl):
            term = _dot(lm)
            out = term if out is None else out + term
            x = _rot_rounds(x, a, sub, range(start, bounds[lm]))
            start = bounds[lm]
        outx_ref[0, :, :] = out + accx_ref[0, :, :]
        _rot_finish(x, x0)
    elif rot_first:
        _rotate()
        _contract()
    else:
        _contract()
        _rotate()


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("tb", "tj", "rot_first", "interleave"))
def pipe_step(p: TFHEParams, digits_x: Array, band: Array, acc_x: Array,
              acc_y: Array, amt_y: Array, tb: int = 256, tj: int = 128,
              rot_first: bool = False, interleave: bool = False):
    """One pipelined half-step.

    digits_x (2L*N, B2) int8; band (2, 2L, 2N+pad) int32 (one LWE bit);
    acc_x/acc_y (2, N, B2) uint32; amt_y (B2,) int32.
    Returns (acc_x + digits_x (*) band, digits of X^amt_y . acc_y - acc_y).
    """
    assert p.digit_limbs == 1, "pipe path is single-limb-digit only"
    n = p.n
    k2 = 2 * p.l * n
    b2 = acc_x.shape[2]
    while tb > 1 and b2 % tb:
        tb //= 2
    assert b2 % tb == 0, (b2, tb)
    lo = p.kernel_limb_drop
    nl = NUM_LIMBS - lo
    off = p.decomposition_offset
    off = off - (1 << 32) if off >= (1 << 31) else off
    pad = band.shape[-1] - 2 * n
    assert pad >= n - tj, (pad, tj)
    assert k2 * min(p.half_bg, 128) * 128 < 1 << 31    # exact int8 dot
    grid = (2, b2 // tb)
    out_x, dig_y = pl.pallas_call(
        functools.partial(_pipe_kernel, n=n, nbits=n.bit_length(), l=p.l,
                          bgbit=p.bgbit, offset=off, tj=tj, lo=lo,
                          rot_first=rot_first, interleave=interleave),
        grid=grid,
        in_specs=[
            pl.BlockSpec((k2, tb), lambda c, bt: (0, bt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * p.l, band.shape[-1]),
                         lambda c, bt: (c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, tb), lambda c, bt: (c, 0, bt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, tb), lambda c, bt: (c, 0, bt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb), lambda c, bt: (0, bt),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n, tb), lambda c, bt: (c, 0, bt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p.l * n, tb), lambda c, bt: (c, bt),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, n, b2), jnp.uint32),
            jax.ShapeDtypeStruct((k2, b2), jnp.int8),
        ],
        scratch_shapes=[pltpu.VMEM((nl * n, k2), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 2,
            vmem_limit_bytes=64 << 20),
        input_output_aliases={2: 0},
        interpret=INTERPRET,
    )(digits_x, band, acc_x, to_signed(acc_y),
      amt_y.astype(jnp.int32)[None, :])
    return out_x, dig_y


def blind_rotate_pipe(p: TFHEParams, bsk_band_rev: Array, ct: Array,
                      testvec: Array, tb: int = 256,
                      rot_first: bool = False,
                      interleave: bool = False) -> Array:
    """Blind rotation with half-batch VPU/MXU pipelining.

    Same contract as blind_rotate_t (bit-exact); B must be even with
    B/2 a multiple of 8.  The two batch halves advance through the step
    loop half a step out of phase (see module docstring).
    """
    from .blindrotate import mod_switch_2n
    from .pallas_t import rotate_decompose_t
    from .rotate import monomial_mul_log

    n_lwe = p.lwe_n
    b = ct.shape[0]
    b2 = b // 2
    assert 2 * b2 == b
    while tb > 128 and b2 % tb:
        tb //= 2

    b_tilda = 2 * p.n - mod_switch_2n(ct[:, n_lwe], p)          # (B,)
    if testvec.ndim == 2:
        tv = jnp.broadcast_to(testvec[:, None, :], (2, b, p.n))
    else:
        tv = jnp.moveaxis(testvec, 0, 1)
    acc = monomial_mul_log(tv, b_tilda[None, :])                # (2, B, N)
    acc = jnp.swapaxes(acc, 1, 2)                               # (2, N, B)
    acc_a, acc_b = acc[:, :, :b2], acc[:, :, b2:]

    a_tilda = mod_switch_2n(ct[:, :n_lwe], p)                   # (B, n_lwe)
    amt_a = jnp.concatenate(
        [a_tilda[:b2], jnp.zeros((b2, 1), jnp.int32)], axis=1)  # +pad col
    amt_b = a_tilda[b2:]

    dig_a = rotate_decompose_t(p, acc_a, amt_a[:, 0], tb=tb)

    def body(i, carry):
        acc_a, acc_b, dig_a = carry
        band_i = lax.dynamic_index_in_dim(bsk_band_rev, i, 0, False)
        amt_b_i = lax.dynamic_index_in_dim(amt_b, i, 1, False)
        acc_a, dig_b = pipe_step(p, dig_a, band_i, acc_a, acc_b, amt_b_i,
                                 tb=tb, rot_first=rot_first, interleave=interleave)
        amt_a_n = lax.dynamic_index_in_dim(amt_a, i + 1, 1, False)
        acc_b, dig_a = pipe_step(p, dig_b, band_i, acc_b, acc_a, amt_a_n,
                                 tb=tb, rot_first=rot_first, interleave=interleave)
        return acc_a, acc_b, dig_a

    acc_a, acc_b, _ = lax.fori_loop(0, n_lwe, body,
                                    (acc_a, acc_b, dig_a))
    acc = jnp.concatenate([acc_a, acc_b], axis=2)               # (2, N, B)
    return jnp.moveaxis(jnp.swapaxes(acc, 1, 2), 0, 1)          # (B, 2, N)
