"""Probe 3: step-count differential on the JITTED engine cores.

probe_pipe (eager loops, 60->360 differential): pipe_rf 576 vs t 729
us/step.  probe_pipe2 (jitted cores, 700 steps, queued reps): core_pipe
761 vs core_t 707 us/step-equivalent.  One of these extrapolations is
wrong; this probe times the jitted cores at TWO step counts (sliced
profiles, same key arrays) so the per-step cost of the exact bench
composition is measured differentially.
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import go_tfhe_tpu as tfhe  # noqa: E402
from go_tfhe_tpu import engine  # noqa: E402
from go_tfhe_tpu.utils.backend import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

B = 4096
S_LO, S_HI = 350, 700
p = tfhe.get_params("128bit_fast")
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
sk = tfhe.gen_secret_key(k1, p)
ck = tfhe.gen_cloud_key(k2, sk, p, bands="all")
rng = np.random.default_rng(0)
ct_full = rng.integers(0, 1 << 32, size=(B, p.lwe_n + 1),
                       dtype=np.uint64).astype(np.uint32)


def at_steps(core, band, steps, reps=5):
    ps = dataclasses.replace(p, lwe_n=steps)
    ct = jnp.asarray(np.concatenate(
        [ct_full[:, :steps], ct_full[:, -1:]], axis=1))
    ksk = ck.ksk[..., :steps + 1]
    out = core(ps, True, band, ksk, ct, ck.testvec)
    _ = np.asarray(out.reshape(-1)[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = core(ps, True, band, ksk, ct, ck.testvec)
    _ = np.asarray(out.reshape(-1)[:1])
    return (time.perf_counter() - t0) / reps


for name, core in (("core_t", engine._bootstrap_core_t),
                   ("core_pipe", engine._bootstrap_core_pipe)):
    t_lo = at_steps(core, ck.bsk_band_rev, S_LO)
    t_hi = at_steps(core, ck.bsk_band_rev, S_HI)
    us = (t_hi - t_lo) / (S_HI - S_LO) * 1e6
    print(f"{name:10s} lo({S_LO}) {t_lo*1e3:7.1f} ms  hi({S_HI}) "
          f"{t_hi*1e3:7.1f} ms  diff {us:6.1f} us/step  "
          f"fixed {t_hi*1e3 - us*S_HI/1e3:6.1f} ms", flush=True)
