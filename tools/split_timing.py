"""True per-kernel split of the blind-rotate step at bench shapes.

Each component is timed as a full 700-iteration jitted fori_loop (dispatch
and tunnel-readback overhead amortized to <1%), with a 4-byte readback.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")  # repo root

import go_tfhe_tpu as tfhe  # noqa: E402
from go_tfhe_tpu.utils.backend import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from go_tfhe_tpu.ops.pallas_extprod import (NUM_LIMBS,  # noqa: E402
                                            extprod_pallas, pack_bsk_band)
from go_tfhe_tpu.ops.pallas_rotate import rotate_decompose_pallas  # noqa: E402

p = tfhe.get_params("128bit_fast")
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
N, STEPS = p.n, p.lwe_n
key = jax.random.PRNGKey(0)
acc0 = jax.random.randint(key, (2, B, N), 0, 1 << 24, jnp.uint32) * 256
amt = jax.random.randint(key, (B,), 0, 2 * N, jnp.int32)
bsk = jax.random.randint(key, (STEPS, 2 * p.l, 2, N), 0, 1 << 24,
                         jnp.uint32) * 256
bands = pack_bsk_band(bsk)                     # (steps, 2, 2L, 2N+256)
digits0 = rotate_decompose_pallas(p, acc0, amt)
drop = p.kernel_limb_drop
MACS = B * (2 * p.l * N) * 2 * (NUM_LIMBS - drop) * N * STEPS
SOL = MACS / 197e12


def timed(name, fn, reps=3):
    out = fn()
    _ = np.asarray(out[0, :1, :1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    _ = np.asarray(out[0, :1, :1])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:8.1f} ms  ({dt/STEPS*1e6:6.1f} us/step, "
          f"mxu-sol {SOL/dt*100:5.1f}%)", flush=True)
    return dt


@jax.jit
def rotdec_only(acc):
    def body(i, a):
        d = rotate_decompose_pallas(p, a, amt)
        return a ^ d[:, 0, :].astype(jnp.uint32)[None]
    return lax.fori_loop(0, STEPS, body, acc)


@jax.jit
def extprod_only(acc):
    def body(i, a):
        band_i = lax.dynamic_index_in_dim(bands, i, 0, False)
        return extprod_pallas(digits0, band_i, limb_mag=p.half_bg,
                              drop_limbs=drop, dot_dtype="int8", acc=a)
    return lax.fori_loop(0, STEPS, body, acc)


@jax.jit
def both(acc):
    def body(i, a):
        band_i = lax.dynamic_index_in_dim(bands, i, 0, False)
        d = rotate_decompose_pallas(p, a, amt)
        return extprod_pallas(d, band_i, limb_mag=p.half_bg,
                              drop_limbs=drop, dot_dtype="int8", acc=a)
    return lax.fori_loop(0, STEPS, body, acc)


print(f"B={B} {STEPS} steps; int8 MXU SoL {SOL*1e3:.0f} ms", flush=True)
t_r = timed("rotate_decompose only", lambda: rotdec_only(acc0))
t_e = timed("extprod only (fixed digits)", lambda: extprod_only(acc0))
t_b = timed("both (real step)", lambda: both(acc0))
print(f"sum of parts {1e3*(t_r+t_e):.1f} ms vs real {1e3*t_b:.1f} ms; "
      f"extprod overhead vs SoL {1e3*(t_e-SOL):.1f} ms")
