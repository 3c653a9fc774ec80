"""Sweep (tb, tj) for the TRANSPOSED two-kernel blind-rotate step — the
round-5 harvest of the remaining extprod headroom (PERF_ANALYSIS r4:
94 -> 97% claimed reachable).

Methodology: jitted full composition, differential over two step counts
(both device-bound; see probe_pipe3.py for why eager differentials lie).

Usage: python tools/sweep_t.py "256:128,512:128,256:256,512:256"
"""
import dataclasses
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")
import go_tfhe_tpu as tfhe  # noqa: E402
from go_tfhe_tpu.ops.blindrotate import mod_switch_2n  # noqa: E402
from go_tfhe_tpu.ops.pallas_t import extprod_t, rotate_decompose_t  # noqa: E402
from go_tfhe_tpu.ops.rotate import monomial_mul_log  # noqa: E402
from go_tfhe_tpu.utils.backend import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

B = 4096
S_LO, S_HI = 350, 700
p0 = tfhe.get_params("128bit_fast")
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
sk = tfhe.gen_secret_key(k1, p0)
ck = tfhe.gen_cloud_key(k2, sk, p0)
rng = np.random.default_rng(0)
ct_full = rng.integers(0, 1 << 32, size=(B, p0.lwe_n + 1),
                       dtype=np.uint64).astype(np.uint32)


@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("tb", "tj"))
def rot_loop(p, band_rev, ct, testvec, tb, tj):
    n_lwe = p.lwe_n
    b = ct.shape[0]
    lo = p.kernel_limb_drop
    b_tilda = 2 * p.n - mod_switch_2n(ct[:, n_lwe], p)
    tv = jnp.broadcast_to(testvec[:, None, :], (2, b, p.n))
    acc = jnp.swapaxes(monomial_mul_log(tv, b_tilda[None, :]), 1, 2)
    a_tilda = mod_switch_2n(ct[:, :n_lwe], p)

    def body(i, acc):
        band_i = lax.dynamic_index_in_dim(band_rev, i, 0, False)
        digits = rotate_decompose_t(p, acc, a_tilda[:, i], tb=tb)
        return extprod_t(digits, band_i, acc, limb_mag=p.half_bg, tb=tb,
                         tj=tj, lo=lo, nd=1)

    return lax.fori_loop(0, n_lwe, body, acc)


def at_steps(steps, tb, tj, reps=5):
    ps = dataclasses.replace(p0, lwe_n=steps)
    ct = jnp.asarray(np.concatenate(
        [ct_full[:, :steps], ct_full[:, -1:]], axis=1))
    out = rot_loop(ps, ck.bsk_band_rev, ct, ck.testvec, tb=tb, tj=tj)
    _ = np.asarray(out.reshape(-1)[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = rot_loop(ps, ck.bsk_band_rev, ct, ck.testvec, tb=tb, tj=tj)
    _ = np.asarray(out.reshape(-1)[:1])
    return (time.perf_counter() - t0) / reps


configs = [(256, 128)]
if len(sys.argv) > 1:
    configs = [tuple(map(int, c.split(":"))) for c in sys.argv[1].split(",")]

for tb, tj in configs:
    t_lo = at_steps(S_LO, tb, tj)
    t_hi = at_steps(S_HI, tb, tj)
    us = (t_hi - t_lo) / (S_HI - S_LO) * 1e6
    print(f"tb={tb:4d} tj={tj:4d}: {us:7.1f} us/step  "
          f"({B/(us*1e-6*p0.lwe_n):8.0f} ct/s rotate-only)", flush=True)
