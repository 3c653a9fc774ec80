"""Prototype: fully TRANSPOSED blind-rotate step (N on sublanes).

Layouts:
  acc     (2, N, B)   — channel-major, poly coeff on sublanes
  digits  (2L*N, B)   — contraction index on sublanes
  out     (2, N, B)

Rotation rolls along sublanes measure 158 vs 197 us/step for the
rotate+decompose kernel (tools/probe_rot_t.py).  The external product
becomes a STANDARD (M=nl*tn, K=2L*N) x (K, TB) matmul when the Toeplitz
tile is built transposed — T2[l*tn + n', r*N + j'] = limb_l(D[c, r,
N + nt*tn + n' - j']) — from a REVERSED band, using the same
strided-roll trick with the roles of rows/cols swapped.

Checks bit-exactness against the production two-kernel path on a toy
case, then times the full 700-step loop at bench shapes.
Usage: python tools/proto_t_step.py [check|time]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
import go_tfhe_tpu as tfhe  # noqa: E402
from go_tfhe_tpu.utils.backend import enable_compilation_cache  # noqa: E402
from go_tfhe_tpu.utils.torus import to_signed  # noqa: E402
from go_tfhe_tpu.ops.pallas_extprod import extprod_pallas  # noqa: E402
from go_tfhe_tpu.ops.pallas_rotate import rotate_decompose_pallas  # noqa: E402
from go_tfhe_tpu.ops.polymul import split_balanced_limbs_i8  # noqa: E402

INTERPRET = False
NUM_LIMBS = 4


def pack_band_rev(bsk_u32, tn=1024):
    """(n0, 2L, 2, N) uint32 -> limb-packed REVERSED bands
    (n0, 2, 2L, pad + 2N) int32: revD[x] = D[2N-1-x], pad zeros APPENDED
    (so that windows ending at high x are in bounds)."""
    d = jnp.concatenate([jnp.zeros_like(bsk_u32) - bsk_u32, bsk_u32],
                        axis=-1)                       # (n0, 2L, 2, 2N)
    limbs = split_balanced_limbs_i8(to_signed(d), NUM_LIMBS)
    packed = jnp.zeros(limbs.shape[1:], jnp.uint32)
    for l in range(NUM_LIMBS):
        byte = (limbs[l].astype(jnp.int32) + 128).astype(jnp.uint32)
        packed = packed | (byte << jnp.uint32(8 * l))
    packed = jnp.swapaxes(packed, 1, 2)                # (n0, 2, 2L, 2N)
    packed = packed[..., ::-1]                         # reversed
    pad = jnp.zeros(packed.shape[:-1] + (tn,), jnp.uint32)
    return to_signed(jnp.concatenate([packed, pad], axis=-1))


def _rotdec_t_kernel(acc_ref, amt_ref, out_ref, *, n, nbits, l, bgbit,
                     offset):
    half_bg = 1 << (bgbit - 1)
    mask = (1 << bgbit) - 1
    tb = acc_ref.shape[2]
    sub = jax.lax.broadcasted_iota(jnp.int32, (n, 2 * tb), 0)
    x0 = jnp.concatenate([acc_ref[0], acc_ref[1]], axis=1)   # (N, 2TB)
    a2 = jnp.concatenate([amt_ref[0:1, :], amt_ref[0:1, :]], axis=1)
    x = x0
    for b in range(nbits):
        s = 1 << b
        if s < n:
            rolled = pltpu.roll(x, shift=s, axis=0)
            rolled = jnp.where(sub < s, ~rolled, rolled)
        else:
            rolled = ~x
        x = jnp.where(((a2 >> b) & 1) > 0, rolled, x)
    tmp = (x - x0) + jnp.int32(offset)
    for lv in range(l):
        sh = 32 - (lv + 1) * bgbit
        d = ((tmp >> sh) & mask) - half_bg
        for c in range(2):
            row = ((c * l) + lv) * n
            out_ref[pl.ds(row, n), :] = d[:, c * tb:(c + 1) * tb].astype(
                jnp.int8)


@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("tb",))
def rotdec_t(p, acc, amounts, tb=256):
    """acc (2, N, B) uint32; amounts (B,) -> digits (2L*N, B) int8."""
    n = p.n
    b = acc.shape[2]
    rows = 2 * p.l * n
    off = p.decomposition_offset
    off = off - (1 << 32) if off >= (1 << 31) else off
    while tb > 8 and b % tb:
        tb //= 2
    return pl.pallas_call(
        functools.partial(_rotdec_t_kernel, n=n, nbits=n.bit_length(),
                          l=p.l, bgbit=p.bgbit, offset=off),
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
                      n, l2, tn, tj, lo):
    """d_ref (2L*N, TB) int8; band_ref (1, 2L, 2N+pad) int32 REVERSED;
    acc_ref/out_ref (1, TN?, ...) -> out tile (1, tn, TB) uint32;
    t_scratch ((NUM_LIMBS-lo)*tn, 2L*N) int8 transposed Toeplitz.

    T2[l_col*tn + n', r*N + j'] = limb(D[c, r, N + nt*tn + n' - j'])
                                = limb(revD[N - 1 - nt*tn - n' + j'])
    For row n': window over j' = revD[start + j'],
    start = N - 1 - nt*tn - n'  (decreases by 1 per row: stride roll).
    """
    nt = pl.program_id(1)
    bt = pl.program_id(2)
    nl = NUM_LIMBS - lo

    @pl.when(bt == 0)
    def _build():
        for r in range(l2):
            for jt in range(n // tj):
                # rows n' in [0, tn); cols j' in [jt*tj, (jt+1)*tj)
                # value = revD[(N-1 - out_nt*tn - n') + jt*tj + m] with
                # out_nt = M-1-nt (the BlockSpecs reverse the tile order
                # so this window start is a POSITIVE affine expression —
                # Mosaic's alignment prover rejects subtracted traced
                # products): w0 = nt*tn + jt*tj.
                w0 = nt * tn + jt * tj
                w = band_ref[0, r, pl.ds(w0, 2 * tn)]
                wmat = jnp.broadcast_to(w, (tn, 2 * tn))
                # row n' must read w[(tn-1-n') + m] for m in [0, tj):
                # roll(x, shift, axis=1, stride=1, stride_axis=0)[i, m]
                #   = x[i, (m - shift - i) mod W]  with W = 2*tn;
                # -shift - n' === tn-1-n'  ->  shift === tn+1 (mod 2tn).
                # No wrap: m + tn-1-n' <= tj-1 + tn-1 < W for tj <= tn.
                rolled = pltpu.roll(wmat, shift=tn + 1, axis=1, stride=1,
                                    stride_axis=0)[:, :tj]
                for l in range(lo, NUM_LIMBS):
                    limb = ((rolled >> (8 * l)) & 255) - 128
                    t_scratch[pl.ds((l - lo) * tn, tn),
                              pl.ds(r * n + jt * tj, tj)] = limb.astype(
                                  jnp.int8)

    kdim = l2 * n
    out = None
    dmat = d_ref[:, :]
    for l in range(nl):
        part = jax.lax.dot_general(
            t_scratch[pl.ds(l * tn, tn), :], dmat,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        term = part.astype(jnp.uint32)
        if l + lo:
            term = term << jnp.uint32(8 * (l + lo))
        out = term if out is None else out + term
    out_ref[0, :, :] = out + acc_ref[0, :, :]


@functools.partial(jax.jit, static_argnames=("tb", "tn", "tj", "lo"))
def extprod_t(digits, band, acc, tb=256, tn=1024, tj=128, lo=1):
    """digits (2L*N, B) int8; band (2, 2L, 2N+pad) int32 reversed-packed;
    acc (2, N, B) uint32 -> (2, N, B) uint32 = acc + product."""
    k, b = digits.shape
    n = acc.shape[1]
    l2 = k // n
    while tb > 8 and b % tb:
        tb //= 2
    while tn > n or n % tn:
        tn //= 2
    grid = (2, n // tn, b // tb)
    return pl.pallas_call(
        functools.partial(_extprod_t_kernel, n=n, l2=l2, tn=tn, tj=tj,
                          lo=lo),
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, tb), lambda c, nt, bt: (0, bt),
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
        scratch_shapes=[pltpu.VMEM(((NUM_LIMBS - lo) * tn, k), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 3,
            vmem_limit_bytes=48 << 20),
        input_output_aliases={2: 0},
        interpret=INTERPRET,
    )(digits, band, acc)


def check():
    global INTERPRET
    if jax.default_backend() != "tpu":
        INTERPRET = True
        import go_tfhe_tpu.ops.pallas_extprod as pe
        import go_tfhe_tpu.ops.pallas_rotate as pr
        pe.INTERPRET = True
        pr.INTERPRET = True
    import dataclasses
    p = dataclasses.replace(tfhe.TEST_FAST, name="proto_t", n=256, nbit=8,
                            lwe_n=8, kernel_limb_drop=1, key_grid_bits=8,
                            centered_decomposition=True)
    rng = np.random.default_rng(3)
    b = 16
    acc = jnp.asarray((rng.integers(0, 1 << 24, (2, b, p.n),
                                    dtype=np.int64) << 8).astype(np.uint32))
    amt = jnp.asarray(rng.integers(0, 2 * p.n, (b,)), jnp.int32)
    bsk = jnp.asarray((rng.integers(0, 1 << 24, (1, 2 * p.l, 2, p.n),
                                    dtype=np.int64) << 8).astype(np.uint32))
    # reference: production two-kernel path
    from go_tfhe_tpu.ops.pallas_extprod import pack_bsk_band
    band = pack_bsk_band(bsk, tn=256)[0]
    dig = rotate_decompose_pallas(p, acc, amt, tb=b)
    ref = extprod_pallas(dig, band, limb_mag=p.half_bg, tb=b, tn=256,
                         drop_limbs=1, dot_dtype="int8", acc=acc)
    # transposed path
    band_t = pack_band_rev(bsk, tn=256)[0]
    acc_t = jnp.moveaxis(acc, 1, 2)                       # (2, N, B)
    dig_t = rotdec_t(p, acc_t, amt, tb=b)
    got_t = extprod_t(dig_t, band_t, acc_t, tb=b, tn=256, lo=1)
    got = jnp.moveaxis(got_t, 2, 1)
    np.testing.assert_array_equal(np.asarray(dig_t),
                                  np.asarray(jnp.moveaxis(
                                      dig.reshape(b, -1), 0, 1)))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    print("bit-exact OK")


def timeit():
    enable_compilation_cache()
    p = tfhe.get_params("128bit_fast")
    N, STEPS = p.n, p.lwe_n
    B = 4096
    key = jax.random.PRNGKey(0)
    acc0 = jax.random.randint(key, (2, N, B), 0, 1 << 24, jnp.uint32) * 256
    amt = jax.random.randint(key, (B,), 0, 2 * N, jnp.int32)
    bsk = jax.random.randint(key, (STEPS, 2 * p.l, 2, N), 0, 1 << 24,
                             jnp.uint32) * 256
    bands = pack_band_rev(bsk, tn=1024)

    @jax.jit
    def loop(acc):
        def body(i, a):
            band_i = lax.dynamic_index_in_dim(bands, i, 0, False)
            d = rotdec_t(p, a, amt, tb=256)
            return extprod_t(d, band_i, a, tb=256, tn=1024, lo=1)
        return lax.fori_loop(0, STEPS, body, acc)

    out = loop(acc0)
    _ = np.asarray(out[0, :1, :1])
    t0 = time.perf_counter()
    for _ in range(3):
        out = loop(acc0)
    _ = np.asarray(out[0, :1, :1])
    dt = (time.perf_counter() - t0) / 3
    print(f"transposed step loop: {dt*1e3:8.1f} ms ({dt/STEPS*1e6:6.1f} "
          f"us/step, {B/dt:7.0f} bootstraps/s loop-only)", flush=True)


if __name__ == "__main__":
    if "time" in sys.argv:
        timeit()
    else:
        check()
