"""Sweep blind-rotate step configurations (B, tb, tn) on the TPU.

Times the REAL two-kernel step (rotate_decompose + extprod with fused
accumulator add) as a full lwe_n-iteration fori_loop per config — the
same methodology as tools/split_timing.py.  Reports us/step and the
implied end-to-end bootstraps/s (step loop only; sample-extract/key
switch add ~3%).

Usage: python tools/sweep_step.py "4096:256:256,8192:256:256,4096:256:512"
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")

import go_tfhe_tpu as tfhe  # noqa: E402
from go_tfhe_tpu.utils.backend import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from go_tfhe_tpu.ops.pallas_extprod import (NUM_LIMBS,  # noqa: E402
                                            extprod_pallas, pack_bsk_band)
from go_tfhe_tpu.ops.pallas_rotate import rotate_decompose_pallas  # noqa: E402

p = tfhe.get_params("128bit_fast")
N, STEPS = p.n, p.lwe_n
drop = p.kernel_limb_drop
key = jax.random.PRNGKey(0)
bsk = jax.random.randint(key, (STEPS, 2 * p.l, 2, N), 0, 1 << 24,
                         jnp.uint32) * 256
configs = [tuple(int(x) for x in c.split(":"))
           for c in (sys.argv[1] if len(sys.argv) > 1
                     else "4096:256:256").split(",")]


def run(B, tb, tn):
    acc0 = jax.random.randint(key, (2, B, N), 0, 1 << 24, jnp.uint32) * 256
    amt = jax.random.randint(key, (B,), 0, 2 * N, jnp.int32)
    bands = pack_bsk_band(bsk, tn=max(tn, 256))

    @jax.jit
    def loop(acc):
        def body(i, a):
            band_i = lax.dynamic_index_in_dim(bands, i, 0, False)
            d = rotate_decompose_pallas(p, a, amt, tb=tb)
            return extprod_pallas(d, band_i, limb_mag=p.half_bg, tb=tb,
                                  tn=tn, drop_limbs=drop, dot_dtype="int8",
                                  acc=a)
        return lax.fori_loop(0, STEPS, body, acc)

    out = loop(acc0)
    _ = np.asarray(out[0, :1, :1])
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = loop(acc0)
    _ = np.asarray(out[0, :1, :1])
    dt = (time.perf_counter() - t0) / reps
    macs = B * (2 * p.l * N) * 2 * (NUM_LIMBS - drop) * N * STEPS
    print(f"B={B:6d} tb={tb:4d} tn={tn:5d}: {dt*1e3:8.1f} ms "
          f"({dt/STEPS*1e6:6.1f} us/step, {B/dt:7.0f} bootstraps/s loop-only, "
          f"mxu {macs/197e12/dt*100:5.1f}%)", flush=True)  # 394 TOPS = 197e12 MAC/s


for B, tb, tn in configs:
    run(B, tb, tn)
