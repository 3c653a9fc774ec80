"""Time the blind-rotate sub-kernels at bench shapes (128bit_fast, B=4096)."""
import time
import jax
import jax.numpy as jnp
import numpy as np

import go_tfhe_tpu as tfhe
from go_tfhe_tpu.ops.pallas_extprod import extprod_pallas, pack_bsk_band
from go_tfhe_tpu.ops.pallas_rotate import rotate_decompose_pallas
from go_tfhe_tpu.ops import blindrotate

p = tfhe.get_params("128bit_fast")
B, N = 4096, p.n
key = jax.random.PRNGKey(0)
acc = jax.random.randint(key, (2, B, N), 0, 1 << 30, jnp.uint32) * 4
amt = jax.random.randint(key, (B,), 0, 2 * N, jnp.int32)
band = jax.random.randint(key, (2, 2 * p.l, 2 * N + 256),
                          -(1 << 30), 1 << 30, jnp.int32)


def timed(name, fn, reps=20):
    out = fn()
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e6:9.1f} us")
    return dt


t_rot = timed("rotate_decompose_pallas", lambda: rotate_decompose_pallas(p, acc, amt))
digits = rotate_decompose_pallas(p, acc, amt)
t_ext = timed("extprod_pallas int8 fused-acc",
              lambda: extprod_pallas(digits, band, limb_mag=p.half_bg,
                                     drop_limbs=1, dot_dtype="int8", acc=acc))
t_ext_b = timed("extprod_pallas bf16",
                lambda: extprod_pallas(digits, band, limb_mag=p.half_bg,
                                       drop_limbs=1, dot_dtype="bf16"))

# one full fori_loop step-equivalent chain: 10 chained steps to include XLA glue
@jax.jit
def chain10(acc):
    def body(i, a):
        d = rotate_decompose_pallas(p, a, amt)
        return extprod_pallas(d, band, limb_mag=p.half_bg, drop_limbs=1,
                              dot_dtype="int8", acc=a)
    return jax.lax.fori_loop(0, 10, body, acc)

t_chain = timed("chain of 10 steps (fori_loop)", lambda: chain10(acc), reps=10)
print(f"per-step chain: {t_chain/10*1e6:.1f} us;  rot+ext sum: {(t_rot+t_ext)*1e6:.1f} us")
mxu_floor = 2 * B * (2 * p.l * N) * 2 * 3 * N / 394e12
print(f"int8 MXU floor this shape: {mxu_floor*1e6:.1f} us -> extprod MFU {mxu_floor/t_ext*100:.0f}%")
