"""Probe: rotation cost with N on SUBLANES instead of lanes.

Hypothesis: `pltpu.roll` along the sublane axis is mostly vreg
renaming for shifts that are multiples of 8, so the 10 log-rotation
rounds get cheaper than lane rolls.  Layout: acc (2, N, B), kernel block
(N, 2*TB) with both channels concatenated along lanes; rolls on axis 0;
per-ciphertext bit selects are lane-wise broadcasts.

Compares rot_only / full(+decompose+store) in both layouts at B=4096.
The transposed 'full' stores digits as (2L*N, TB) int8 — the layout a
transposed extprod would consume (contraction over sublanes).
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

enable_compilation_cache()

p = tfhe.get_params("128bit_fast")
N, STEPS, L, BG = p.n, p.lwe_n, p.l, p.bgbit
B, TB = 4096, 256
OFF = p.decomposition_offset
OFF = OFF - (1 << 32) if OFF >= (1 << 31) else OFF
key = jax.random.PRNGKey(0)
accT0 = jax.random.randint(key, (2, N, B), 0, 1 << 24, jnp.uint32) * 256
amt = jax.random.randint(key, (B,), 0, 2 * N, jnp.int32)
nbits = N.bit_length()
half_bg, mask = 1 << (BG - 1), (1 << BG) - 1


def kern_t(acc_ref, amt_ref, out_ref, *, mode):
    tb = acc_ref.shape[2]
    sub = jax.lax.broadcasted_iota(jnp.int32, (N, 2 * tb), 0)
    x0 = jnp.concatenate([acc_ref[0], acc_ref[1]], axis=1)   # (N, 2TB)
    a2 = jnp.concatenate([amt_ref[0:1, :], amt_ref[0:1, :]], axis=1)  # (1, 2TB)
    x = x0
    for b in range(nbits):
        s = 1 << b
        if s < N:
            rolled = pltpu.roll(x, shift=s, axis=0)
            rolled = jnp.where(sub < s, ~rolled, rolled)
        else:
            rolled = ~x
        x = jnp.where(((a2 >> b) & 1) > 0, rolled, x)
    if mode == "rot_only":
        out_ref[pl.ds(0, N), :] = (x[:, :tb] & 127).astype(jnp.int8)
        return
    tmp = (x - x0) + jnp.int32(OFF)
    for lv in range(L):
        sh = 32 - (lv + 1) * BG
        d = ((tmp >> sh) & mask) - half_bg
        for c in range(2):
            row = ((c * L) + lv) * N
            out_ref[pl.ds(row, N), :] = d[:, c * tb:(c + 1) * tb].astype(
                jnp.int8)


def make_t(mode):
    rows = 2 * L * N

    @jax.jit
    def loop(acc):
        def body(i, a):
            d = pl.pallas_call(
                functools.partial(kern_t, mode=mode),
                grid=(B // TB,),
                in_specs=[
                    pl.BlockSpec((2, N, TB), lambda bt: (0, 0, bt),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, TB), lambda bt: (0, bt),
                                 memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((rows, TB), lambda bt: (0, bt),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((rows, B), jnp.int8),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                    vmem_limit_bytes=48 << 20),
            )(to_signed(a), amt[None, :])
            return a + d[None, :N, :].astype(jnp.uint32)
        return lax.fori_loop(0, STEPS, body, acc)
    return loop


def timed(name, fn, acc):
    out = fn(acc)
    _ = np.asarray(out[0, :1, :1])
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(acc)
    _ = np.asarray(out[0, :1, :1])
    dt = (time.perf_counter() - t0) / 3
    print(f"{name:14s} {dt*1e3:8.1f} ms  ({dt/STEPS*1e6:6.1f} us/step)",
          flush=True)


for mode in ("rot_only", "full"):
    timed("T_" + mode, make_t(mode), accT0)
