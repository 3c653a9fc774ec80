"""Probe: where does the rotate+decompose kernel's time go?

Times three stripped variants of ops/pallas_rotate._rotdec_kernel as full
lwe_n-step loops at bench shapes (B=4096, fast profile):
  decompose-only   — no rolls: digits of (acc + offset) directly
  rotate-only      — 11 roll/select rounds, single int8 store row
  full             — the production kernel (rotate + decompose + store)
plus XOR-mask and two-bit-per-round variants of the rotation.
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
acc0 = jax.random.randint(key, (2, B, N), 0, 1 << 24, jnp.uint32) * 256
amt = jax.random.randint(key, (B,), 0, 2 * N, jnp.int32)
amt2d = amt.astype(jnp.int32)[:, None]
nbits = N.bit_length()
half_bg, mask = 1 << (BG - 1), (1 << BG) - 1


def rotate_rounds(x, amt2, lane, variant):
    if variant == "xor":
        for b in range(nbits):
            s = 1 << b
            if s < N:
                rolled = pltpu.roll(x, shift=s, axis=1)
                neg = jnp.where(lane < s, jnp.int32(-1), jnp.int32(0))
                rolled = rolled ^ neg
            else:
                rolled = ~x
            x = jnp.where(((amt2 >> b) & 1) > 0, rolled, x)
        return x
    if variant == "２bit":  # pragma: no cover - unused id guard
        return x
    for b in range(nbits):
        s = 1 << b
        if s < N:
            rolled = pltpu.roll(x, shift=s, axis=1)
            rolled = jnp.where(lane < s, ~rolled, rolled)
        else:
            rolled = ~x
        x = jnp.where(((amt2 >> b) & 1) > 0, rolled, x)
    return x


def kern(acc_ref, amt_ref, out_ref, *, mode):
    tb = acc_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (2 * tb, N), 1)
    x0 = jnp.concatenate([acc_ref[0], acc_ref[1]], axis=0)
    amt2 = jnp.concatenate([amt_ref[:, :1], amt_ref[:, :1]], axis=0)
    if mode == "dec_only":
        x = x0 ^ 1
    elif mode in ("full", "full_xor"):
        x = rotate_rounds(x0, amt2, lane,
                          "xor" if mode == "full_xor" else "base")
    else:  # rot_only
        x = rotate_rounds(x0, amt2, lane, "base")
        out_ref[:, pl.ds(0, N)] = (x[:tb] & 127).astype(jnp.int8)
        return
    tmp = (x - x0) + jnp.int32(OFF)
    for lv in range(L):
        sh = 32 - (lv + 1) * BG
        d = ((tmp >> sh) & mask) - half_bg
        for c in range(2):
            col = ((c * L) + lv) * N
            out_ref[:, pl.ds(col, N)] = d[c * tb:(c + 1) * tb].astype(
                jnp.int8)


def make(mode):
    cols = 2 * L * N

    @jax.jit
    def loop(acc):
        def body(i, a):
            d = pl.pallas_call(
                functools.partial(kern, mode=mode),
                grid=(B // TB,),
                in_specs=[
                    pl.BlockSpec((2, TB, N), lambda bt: (0, bt, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((TB, 1), lambda bt: (bt, 0),
                                 memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((TB, cols), lambda bt: (bt, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, cols), jnp.int8),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                    vmem_limit_bytes=48 << 20),
            )(to_signed(a), amt2d)
            return a + d[:, :N].astype(jnp.uint32)[None]
        return lax.fori_loop(0, STEPS, body, acc)
    return loop


def timed(name, fn):
    out = fn(acc0)
    _ = np.asarray(out[0, :1, :1])
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(acc0)
    _ = np.asarray(out[0, :1, :1])
    dt = (time.perf_counter() - t0) / 3
    print(f"{name:12s} {dt*1e3:8.1f} ms  ({dt/STEPS*1e6:6.1f} us/step)",
          flush=True)


for mode in ("dec_only", "rot_only", "full", "full_xor"):
    timed(mode, make(mode))
