"""The bootstrap engine: one jitted, batched function per pipeline.

Reference: evaluator/evaluator.go:110-157 (blind rotate -> sample extract ->
key switch) and evaluator/gates_helper.go (affine gate preparations).  The
reference maintains two engines (legacy trgsw/ and zero-alloc evaluator/);
this framework has exactly one (SURVEY.md layering note).

Everything below the public functions is traced once per (profile, batch
shape) and compiled by XLA; throughput comes from the leading batch axes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .keys import CloudKey
from .ops.blindrotate import (blind_rotate, blind_rotate_block,
                              blind_rotate_block_tpu, blind_rotate_extended,
                              blind_rotate_extended_t,
                              blind_rotate_extended_tpu, blind_rotate_t,
                              blind_rotate_tpu)
from .ops import pallas_t
from .ops.pallas_pipe import blind_rotate_pipe
from .ops.keyswitch import identity_key_switch
from .ops.sample_extract import sample_extract
from .params import TFHEParams
from .utils.torus import f64_to_torus

Array = jax.Array

# Pad granularity for the Pallas fast paths (the kernels auto-shrink
# their batch tile tb to divide the padded batch; 128 lanes is the
# hardware minimum).  128 instead of 256 halves the padded work for
# small batches: measured batch-1 gate latency 40.3 -> 25.6 ms at
# 128bit_fast (round 5) — ~5x the reference CPU's single-gate speed —
# while large batches are unaffected (tb stays 256 whenever it divides
# the batch).
_TPU_BATCH_TILE = 128

# Route block-binary keys through the fused BLOCK rotation kernel instead
# of the per-bit transposed path.  OFF by default since round 4: the
# transposed per-bit path measures 8,205/s vs the block kernel's 7,886/s
# at 128bit_fast (BENCH_r04 / BENCH_variants_r04) — the block kernel's
# launch-count advantage no longer beats the cheaper sublane rotation.
# The kernel stays fully tested and available (blind_rotate_block_tpu);
# bench.py --block sets this True to keep measuring it.
PREFER_BLOCK_ROTATION = False

# Use the HALF-BATCH PIPELINED step (ops/pallas_pipe.py) instead of the
# two-kernel transposed composition.  OFF: this was the round-5 VPU/MXU
# overlap probe — dependence-free half-batch pipelining in one cell body —
# and it measured SLOWER than the two-kernel path (740.6 vs 690.0 us/step
# jitted-core differential, tools/probe_pipe3.py; statement-interleaved
# variant 719.2), the FIFTH serialization result: Mosaic/v5e does not
# co-issue VPU rotation under MXU dots even with zero data dependence
# (PERF_ANALYSIS.md round-5 section; only ~21 us of 194 overlaps when
# statements are interleaved in source order).  bench.py --pipe measures
# the kernel; it stays bit-exact and fully tested (test_pallas_pipe.py).
PREFER_PIPE = False

# Affine-preparation bias constants (evaluator/gates_helper.go, gates/gates.go).
_T_EIGHTH = int(f64_to_torus(0.125))
_T_NEG_EIGHTH = int(f64_to_torus(-0.125))
_T_QUARTER = int(f64_to_torus(0.25))


def _use_tpu_path(p: TFHEParams) -> bool:
    """The Pallas fast path covers every profile whose N tiles the kernel:
    multi-limb digits handle BGBIT > 8 (blind_rotate_tpu) and extended
    LUTs run the fused big-accumulator kernel (blind_rotate_extended_tpu)."""
    return jax.default_backend() == "tpu" and p.n % 256 == 0


@functools.partial(jax.jit, static_argnums=(0, 1))
def _bootstrap_core(p: TFHEParams, key_switch: bool, bsk_kernel: Array,
                    ksk: Array, ct: Array, testvec: Array) -> Array:
    rotated = blind_rotate(p, bsk_kernel, ct, testvec)
    lv1 = sample_extract(rotated, 0)
    return identity_key_switch(p, ksk, lv1) if key_switch else lv1


@functools.partial(jax.jit, static_argnums=(0, 1))
def _bootstrap_core_ext(p: TFHEParams, key_switch: bool, bsk_kernel: Array,
                        ksk: Array, ct: Array, lut_blocks: Array) -> Array:
    """Extended-LUT bootstrap (LookUpTableSize = polyExtendFactor * N) —
    the Uint6-8 capability the reference never implemented."""
    rotated = blind_rotate_extended(p, bsk_kernel, ct, lut_blocks)
    lv1 = sample_extract(rotated[..., 0, :, :], 0)   # big-poly coeff 0
    return identity_key_switch(p, ksk, lv1) if key_switch else lv1


@functools.partial(jax.jit, static_argnums=(0, 1))
def _bootstrap_core_ext_tpu(p: TFHEParams, key_switch: bool, bsk_band: Array,
                            ksk: Array, ct: Array, lut_blocks: Array) -> Array:
    """Extended-LUT bootstrap, row-major Pallas path (ops/pallas_ext.py);
    ct (B, n+1) with B a multiple of the batch tile."""
    rotated = blind_rotate_extended_tpu(p, bsk_band, ct, lut_blocks)
    lv1 = sample_extract(rotated[..., 0, :, :], 0)   # big-poly coeff 0
    return identity_key_switch(p, ksk, lv1) if key_switch else lv1


@functools.partial(jax.jit, static_argnums=(0, 1))
def _bootstrap_core_ext_t(p: TFHEParams, key_switch: bool,
                          bsk_band_rev: Array, ksk: Array, ct: Array,
                          lut_blocks: Array) -> Array:
    """Extended-LUT bootstrap, TRANSPOSED Pallas path (ops/pallas_t.py) —
    measured 2.02 vs 2.30 ms/ct at Uint6, the extended default."""
    rotated = blind_rotate_extended_t(p, bsk_band_rev, ct, lut_blocks)
    lv1 = sample_extract(rotated[..., 0, :, :], 0)   # big-poly coeff 0
    return identity_key_switch(p, ksk, lv1) if key_switch else lv1


@functools.partial(jax.jit, static_argnums=(0, 1))
def _bootstrap_core_tpu(p: TFHEParams, key_switch: bool, bsk_band: Array,
                        ksk: Array, ct: Array, testvec: Array) -> Array:
    """Pallas fast path (row-major); ct (B, n+1), B a batch-tile multiple."""
    rotated = blind_rotate_tpu(p, bsk_band, ct, testvec)
    lv1 = sample_extract(rotated, 0)
    return identity_key_switch(p, ksk, lv1) if key_switch else lv1


@functools.partial(jax.jit, static_argnums=(0, 1))
def _bootstrap_core_t(p: TFHEParams, key_switch: bool, bsk_band_rev: Array,
                      ksk: Array, ct: Array, testvec: Array) -> Array:
    """Pallas fast path, TRANSPOSED layout (ops/pallas_t.py); bit-exact
    with _bootstrap_core_tpu."""
    rotated = blind_rotate_t(p, bsk_band_rev, ct, testvec)
    lv1 = sample_extract(rotated, 0)
    return identity_key_switch(p, ksk, lv1) if key_switch else lv1


@functools.partial(jax.jit, static_argnums=(0, 1))
def _bootstrap_core_pipe(p: TFHEParams, key_switch: bool,
                         bsk_band_rev: Array, ksk: Array, ct: Array,
                         testvec: Array) -> Array:
    """HALF-BATCH PIPELINED fast path (ops/pallas_pipe.py) — the round-5
    default for single-limb-digit profiles: the VPU rotation of one batch
    half hides under the MXU contraction of the other.  Bit-exact with
    _bootstrap_core_t (tests/test_pallas_pipe.py)."""
    rotated = blind_rotate_pipe(p, bsk_band_rev, ct, testvec,
                                rot_first=True)
    lv1 = sample_extract(rotated, 0)
    return identity_key_switch(p, ksk, lv1) if key_switch else lv1


@functools.partial(jax.jit, static_argnums=(0, 1))
def _bootstrap_core_block(p: TFHEParams, key_switch: bool, bsk_kernel: Array,
                          ksk: Array, ct: Array, testvec: Array) -> Array:
    """Block blind rotation (portable) — block-binary lv0 keys only."""
    rotated = blind_rotate_block(p, bsk_kernel, ct, testvec)
    lv1 = sample_extract(rotated, 0)
    return identity_key_switch(p, ksk, lv1) if key_switch else lv1


@functools.partial(jax.jit, static_argnums=(0, 1))
def _bootstrap_core_block_tpu(p: TFHEParams, key_switch: bool,
                              bsk_band: Array, ksk: Array, ct: Array,
                              testvec: Array) -> Array:
    """Block blind rotation, Pallas fast path — block-binary lv0 keys only."""
    rotated = blind_rotate_block_tpu(p, bsk_band, ct, testvec)
    lv1 = sample_extract(rotated, 0)
    return identity_key_switch(p, ksk, lv1) if key_switch else lv1


def _tpu_core_choice(ck: CloudKey):
    """Pick the Pallas core + band layout the CloudKey can serve, or None
    for the portable path.  Keys built with bands='auto' (keys.py) carry
    only the layout(s) this dispatch reaches."""
    p = ck.params
    if not _use_tpu_path(p):
        return None
    ext = p.poly_extend_factor > 1
    block = ck.block_binary and p.block_size > 1 and not ext
    if ext and ck.bsk_band_rev is not None and pallas_t.ext_t_fits(p):
        return _bootstrap_core_ext_t, ck.bsk_band_rev
    if ext and ck.bsk_band is not None:
        return _bootstrap_core_ext_tpu, ck.bsk_band
    if ext:
        return None
    # Block blind rotation needs a block-binary lv0 key (keys.py); the
    # Pallas block kernel additionally needs int8 digits to fit its
    # scratch within VMEM — other profiles use the per-bit paths.
    if (block and p.digit_limbs == 1 and ck.bsk_band is not None
            and (PREFER_BLOCK_ROTATION or ck.bsk_band_rev is None)):
        return _bootstrap_core_block_tpu, ck.bsk_band
    if ck.bsk_band_rev is not None:
        if PREFER_PIPE and p.digit_limbs == 1:
            # half-batch pipelined path: the fastest measured composition
            # (576 vs 729 us/step at 128bit_fast, tools/probe_pipe.py)
            return _bootstrap_core_pipe, ck.bsk_band_rev
        # transposed per-bit two-kernel path (ops/pallas_t.py)
        return _bootstrap_core_t, ck.bsk_band_rev
    if ck.bsk_band is not None:
        return _bootstrap_core_tpu, ck.bsk_band
    return None


def _bootstrap(ck: CloudKey, ct: Array, testvec: Array | None,
               key_switch: bool) -> Array:
    p = ck.params
    tv = ck.testvec if testvec is None else testvec
    ext = p.poly_extend_factor > 1
    # tv is (2, N) shared / (..., 2, N) per-ct for plain profiles,
    # (k, 2, N) / (..., k, 2, N) for extended ones.
    tv_shared_ndim = 3 if ext else 2
    choice = _tpu_core_choice(ck)
    block = ck.block_binary and p.block_size > 1 and not ext
    if choice is None:
        if ext:
            return _bootstrap_core_ext(p, key_switch, ck.bsk_kernel, ck.ksk,
                                       ct, tv)
        core = _bootstrap_core_block if block else _bootstrap_core
        return core(p, key_switch, ck.bsk_kernel, ck.ksk, ct, tv)
    tpu_core, bsk_op = choice

    # Pallas path: flatten leading batch dims and pad to the batch tile.
    lead = ct.shape[:-1]
    b = 1
    for d in lead:
        b *= d
    tv_shape = tv.shape[-tv_shared_ndim:]
    ct2 = ct.reshape((b, ct.shape[-1]))
    if tv.ndim > tv_shared_ndim:
        tv = tv.reshape((b,) + tv_shape)
    pad = (-b) % _TPU_BATCH_TILE
    if pad:
        ct2 = jnp.concatenate(
            [ct2, jnp.zeros((pad, ct.shape[-1]), ct.dtype)], axis=0)
        if tv.ndim > tv_shared_ndim:
            tv = jnp.concatenate(
                [tv, jnp.zeros((pad,) + tv_shape, tv.dtype)], axis=0)
    out = tpu_core(p, key_switch, bsk_op, ck.ksk, ct2, tv)
    if pad:
        out = out[:b]
    return out.reshape(lead + out.shape[1:])


def bootstrap(ck: CloudKey, ct: Array, testvec: Array | None = None) -> Array:
    """Full gate bootstrap: (..., lwe_n+1) -> (..., lwe_n+1)
    (evaluator/evaluator.go:139-148)."""
    return _bootstrap(ck, ct, testvec, key_switch=True)


# ---------------------------------------------------------------------------
# Multi-LUT bootstrapping (PBSmanyLUT) — beyond-reference capability.
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _bootstrap_core_many(p: TFHEParams, key_switch: bool, k: int, theta: int,
                         bsk_kernel: Array, ksk: Array, ct: Array,
                         testvec: Array) -> Array:
    rotated = blind_rotate(p, bsk_kernel, ct, testvec, theta=theta)
    lv1 = jnp.stack([sample_extract(rotated, t) for t in range(k)])
    return identity_key_switch(p, ksk, lv1) if key_switch else lv1


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _bootstrap_core_many_t(p: TFHEParams, key_switch: bool, k: int,
                           theta: int, bsk_band_rev: Array, ksk: Array,
                           ct: Array, testvec: Array) -> Array:
    rotated = blind_rotate_t(p, bsk_band_rev, ct, testvec, theta=theta)
    lv1 = jnp.stack([sample_extract(rotated, t) for t in range(k)])
    return identity_key_switch(p, ksk, lv1) if key_switch else lv1


def bootstrap_many(ck: CloudKey, ct: Array, multi_lut: Array, k: int,
                   theta: int = 1, key_switch: bool = True) -> Array:
    """k function outputs from ONE blind rotation (PBSmanyLUT).

    The mod switch rounds to multiples of 2^theta (mod_switch_2n), the
    test vector interleaves the k functions by residue
    (lut.Generator.gen_multi_lut), and sample extraction at indices
    0..k-1 reads them out.  The reference has no equivalent — a circuit
    needing several functions of the same linear combination (e.g. a full
    adder's sum AND carry bits) pays ONE bootstrap instead of k.

    Noise: the coarse mod switch multiplies the mod-switch ROUNDING term
    by 2^theta.  Measured end-to-end at 128bit_fast, messageModulus=8,
    batch 1024 (NOISE_MANY_r05.json, margin = the 2^27 half-segment):
    theta=0 8.6 sigma -> theta=1 8.2 sigma (0 errors; the rounding term
    only reaches the other noise sources at this width) -> theta=2
    2.1 sigma (marginal: 5/1024 wrong).  So k=2 (the full-adder case) is
    production-safe at m=8; theta=2 needs a smaller message space or a
    wider-margin profile.  Re-measure (tools/noise_many.py) before using
    theta > 0 on the floor-gadget reference profiles.

    ct: (..., lwe_n+1); multi_lut: (2, N) shared, or (..., 2, N)
    per-ciphertext multi-LUTs (heterogeneous function sets in one batch).
    Returns (k, ..., lwe_n+1) — output t is f_t of the common phase.
    """
    p = ck.params
    assert p.poly_extend_factor == 1, "many-LUT needs a plain (N) profile"
    assert 1 <= k <= 1 << theta
    choice = _tpu_core_choice(ck)
    use_t = choice is not None and ck.bsk_band_rev is not None
    if not use_t:
        return _bootstrap_core_many(p, key_switch, k, theta, ck.bsk_kernel,
                                    ck.ksk, ct, multi_lut)
    lead = ct.shape[:-1]
    b = 1
    for d in lead:
        b *= d
    ct2 = ct.reshape((b, ct.shape[-1]))
    tv = multi_lut
    if tv.ndim > 2:
        tv = tv.reshape((b, 2, tv.shape[-1]))
    pad = (-b) % _TPU_BATCH_TILE
    if pad:
        ct2 = jnp.concatenate(
            [ct2, jnp.zeros((pad, ct.shape[-1]), ct.dtype)], axis=0)
        if tv.ndim > 2:
            tv = jnp.concatenate(
                [tv, jnp.zeros((pad,) + tv.shape[1:], tv.dtype)], axis=0)
    out = _bootstrap_core_many_t(p, key_switch, k, theta, ck.bsk_band_rev,
                                 ck.ksk, ct2, tv)
    if pad:
        out = out[:, :b]
    return out.reshape((k,) + lead + out.shape[2:])


def bootstrap_without_key_switch(ck: CloudKey, ct: Array,
                                 testvec: Array | None = None) -> Array:
    """Blind rotate + sample extract only; result is under the level-1 key
    (gates/gates.go:145-149).  Like the reference's SampleExtractIndex2
    (trlwe/trlwe.go:133-154), reading it as a level-0 ciphertext is only
    valid when n == lwe_n."""
    return _bootstrap(ck, ct, testvec, key_switch=False)


# ---------------------------------------------------------------------------
# Gate preparations (affine pre-bootstrap combos).
# ---------------------------------------------------------------------------

def _with_bias(x: Array, bias: int) -> Array:
    return x.at[..., -1].add(jnp.uint32(bias))


def prepare_nand(a: Array, b: Array) -> Array:
    """-(a+b) + 1/8  (evaluator/gates_helper.go:10-21)."""
    return _with_bias(jnp.zeros_like(a) - (a + b), _T_EIGHTH)


def prepare_and(a: Array, b: Array) -> Array:
    """(a+b) - 1/8  (evaluator/gates_helper.go:24-35)."""
    return _with_bias(a + b, _T_NEG_EIGHTH)


def prepare_or(a: Array, b: Array) -> Array:
    """(a+b) + 1/8  (evaluator/gates_helper.go:38-49)."""
    return _with_bias(a + b, _T_EIGHTH)


def prepare_xor(a: Array, b: Array) -> Array:
    """(a+2b) + 1/4  (evaluator/gates_helper.go:52-63)."""
    return _with_bias(a + b * jnp.uint32(2), _T_QUARTER)


def prepare_xnor(a: Array, b: Array) -> Array:
    """(a-2b) + 1/4  (gates/gates.go:52-58; the batch variant upstream uses
    -1/4, which fails its own truth table — we keep the correct sign)."""
    return _with_bias(a - b * jnp.uint32(2), _T_QUARTER)


def prepare_nor(a: Array, b: Array) -> Array:
    """-(a+b) - 1/8  (gates/gates.go:72-76)."""
    return _with_bias(jnp.zeros_like(a) - (a + b), _T_NEG_EIGHTH)


def prepare_andny(a: Array, b: Array) -> Array:
    """(-a+b) - 1/8: NOT(a) AND b  (gates/gates.go:79-83)."""
    return _with_bias(b - a, _T_NEG_EIGHTH)


def prepare_andyn(a: Array, b: Array) -> Array:
    """(a-b) - 1/8: a AND NOT(b)  (gates/gates.go:86-90)."""
    return _with_bias(a - b, _T_NEG_EIGHTH)


def prepare_orny(a: Array, b: Array) -> Array:
    """(-a+b) + 1/8: NOT(a) OR b  (gates/gates.go:93-97)."""
    return _with_bias(b - a, _T_EIGHTH)


def prepare_oryn(a: Array, b: Array) -> Array:
    """(a-b) + 1/8: a OR NOT(b)  (gates/gates.go:100-104)."""
    return _with_bias(a - b, _T_EIGHTH)
