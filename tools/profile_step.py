"""Time blind-rotate step variants at bench shapes (128bit_fast, B=4096).

Per-dispatch latency through the axon tunnel is ~50 ms, so isolated kernel
timings are meaningless; every variant is timed as a jitted chain of steps
at two lengths and the per-step cost is the slope (t_long - t_short) /
(n_long - n_short).  Reports the int8-MXU speed-of-light share per variant.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")  # repo root

import go_tfhe_tpu as tfhe  # noqa: E402
from go_tfhe_tpu.utils.backend import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from go_tfhe_tpu.ops.pallas_extprod import extprod_pallas  # noqa: E402
from go_tfhe_tpu.ops.pallas_rotate import rotate_decompose_pallas  # noqa: E402
from go_tfhe_tpu.ops.pallas_step import fused_rotate_step  # noqa: E402

p = tfhe.get_params("128bit_fast")
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
N = p.n
key = jax.random.PRNGKey(0)
acc = jax.random.randint(key, (2, B, N), 0, 1 << 24, jnp.uint32) * 256
amt = jax.random.randint(key, (B,), 0, 2 * N, jnp.int32)
band = jax.random.randint(key, (2, 2 * p.l, 2 * N + 256),
                          -(1 << 22), 1 << 22, jnp.int32) * 256
drop = p.kernel_limb_drop
MACS_STEP = B * (2 * p.l * N) * 2 * (4 - drop) * N   # per step, both channels
SOL_US = MACS_STEP / 394e12 * 1e6                    # v5e int8: 394 TOP/s


def run_chain(step, n, reps=3):
    @jax.jit
    def run(a):
        return jax.lax.fori_loop(0, n, lambda i, x: step(x), a)
    out = run(acc)
    _ = np.asarray(out).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(out)
    _ = np.asarray(out).ravel()[:1]
    return (time.perf_counter() - t0) / reps


def slope(name, step, n_lo=8, n_hi=40):
    t_lo = run_chain(step, n_lo)
    t_hi = run_chain(step, n_hi)
    us = (t_hi - t_lo) / (n_hi - n_lo) * 1e6
    print(f"{name:52s} {us:8.1f} us/step  "
          f"mfu {SOL_US/us*100:5.1f}%  -> {B/(us*1e-6*p.lwe_n):6.0f} bs/s",
          flush=True)
    return us


def two_kernel(tn, tb=128, tj=128):
    def step(a):
        d = rotate_decompose_pallas(p, a, amt, tb=tb)
        return extprod_pallas(d, band, limb_mag=p.half_bg, tb=tb, tn=tn,
                              tj=tj, drop_limbs=drop, dot_dtype="int8",
                              acc=a)
    return step


print(f"B={B} 128bit_fast: int8 SoL {SOL_US:.1f} us/step "
      f"({B/(SOL_US*1e-6*p.lwe_n):.0f} bootstraps/s)", flush=True)
slope("rotate_decompose only (upper bound incl. glue)",
      lambda a: a ^ rotate_decompose_pallas(p, a, amt)[:, 0, :].astype(
          jnp.uint32)[None])
slope("two-kernel tn=256 (r2 default)", two_kernel(256))
slope("two-kernel tn=512", two_kernel(512))
for sub in (1, 2):
    if B % (128 * sub) == 0:
        slope(f"fused sub={sub}",
              lambda a, s=sub: fused_rotate_step(p, a, amt, band, sub=s))
