"""Time the blind-rotate sub-kernels at bench shapes (128bit_fast, B=4096).

Compares the fused single-kernel step (ops/pallas_step.py) against the
two-kernel composition, and reports the int8-MXU speed-of-light share.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import go_tfhe_tpu as tfhe
from go_tfhe_tpu.utils.backend import enable_compilation_cache

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


def timed(name, fn, reps=20):
    out = fn()
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1e6:9.1f} us", flush=True)
    return dt


drop = p.kernel_limb_drop
t_rot = timed("rotate_decompose_pallas",
              lambda: rotate_decompose_pallas(p, acc, amt))
digits = rotate_decompose_pallas(p, acc, amt)
t_ext = timed("extprod_pallas int8 fused-acc",
              lambda: extprod_pallas(digits, band, limb_mag=p.half_bg,
                                     drop_limbs=drop, dot_dtype="int8",
                                     acc=acc))
for sub in (1, 2, 4):
    if B % (128 * sub) == 0:
        t_f = timed(f"fused_rotate_step sub={sub}",
                    lambda s=sub: fused_rotate_step(p, acc, amt, band,
                                                    sub=s))

# chained steps to include XLA loop glue
def chain(step, n=10):
    @jax.jit
    def run(acc):
        return jax.lax.fori_loop(0, n, lambda i, a: step(a), acc)
    return run

t_c2 = timed("chain10 two-kernel",
             lambda: chain(lambda a: extprod_pallas(
                 rotate_decompose_pallas(p, a, amt), band,
                 limb_mag=p.half_bg, drop_limbs=drop, dot_dtype="int8",
                 acc=a))(acc), reps=5)
t_cf = timed("chain10 fused sub=2",
             lambda: chain(lambda a: fused_rotate_step(p, acc, amt, band,
                                                       sub=2))(acc), reps=5)
macs = 2 * B * (2 * p.l * N) * (4 - drop) * N
floor = macs / 197e9 / 1e3  # s at 394 TOP/s = 197 GMAC/ms... (197e9 MAC/ms)
floor = macs / (197e12)     # v5e int8: 197e12 MAC/s
print(f"per-step: two-kernel {t_c2/10*1e6:.1f} us, fused {t_cf/10*1e6:.1f} us, "
      f"int8 SoL {floor*1e6:.1f} us "
      f"-> fused MFU {floor/(t_cf/10)*100:.0f}%", flush=True)
print(f"projected bootstraps/s (700 steps): "
      f"two-kernel {B/(t_c2/10*700):.0f}, fused {B/(t_cf/10*700):.0f}")
