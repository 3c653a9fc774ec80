"""Probe 2: reconcile the pipe-vs-baseline discrepancy.

tools/probe_pipe.py (differential over steps 60->360) measures the pipe
loop at 576 us/step vs baseline 729; bench.py (5 queued reps of the full
700-step engine core) measures pipe SLOWER end-to-end (7,686 vs 8,224/s).
This probe times the BARE rotate loops bench-style (full 700 steps,
5 queued reps, one readback) and also the full engine cores, to localize
whether the regression is step-count nonlinearity or composition.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import go_tfhe_tpu as tfhe  # noqa: E402
from go_tfhe_tpu import engine  # noqa: E402
from go_tfhe_tpu.ops.blindrotate import blind_rotate_t  # noqa: E402
from go_tfhe_tpu.ops.pallas_pipe import blind_rotate_pipe  # noqa: E402
from go_tfhe_tpu.utils.backend import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

B = 4096
p = tfhe.get_params("128bit_fast")
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
sk = tfhe.gen_secret_key(k1, p)
ck = tfhe.gen_cloud_key(k2, sk, p, bands="all")
rng = np.random.default_rng(0)
ct = jnp.asarray(rng.integers(0, 1 << 32, size=(B, p.lwe_n + 1),
                              dtype=np.uint64).astype(np.uint32))


def bench_style(name, fn, reps=5):
    out = fn()
    _ = np.asarray(out[:1, :1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    _ = np.asarray(out.reshape(-1)[:1])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:16s} {dt*1e3:7.1f} ms/batch  "
          f"{dt/p.lwe_n*1e6:6.1f} us/step-equiv  {B/dt:8.0f} ct/s",
          flush=True)
    return dt


bench_style("rot_t_700", lambda: blind_rotate_t(
    p, ck.bsk_band_rev, ct, ck.testvec))
bench_style("rot_pipe_700", lambda: blind_rotate_pipe(
    p, ck.bsk_band_rev, ct, ck.testvec, rot_first=True))
bench_style("rot_pipe_nrf", lambda: blind_rotate_pipe(
    p, ck.bsk_band_rev, ct, ck.testvec, rot_first=False))
bench_style("core_t", lambda: engine._bootstrap_core_t(
    p, True, ck.bsk_band_rev, ck.ksk, ct, ck.testvec))
bench_style("core_pipe", lambda: engine._bootstrap_core_pipe(
    p, True, ck.bsk_band_rev, ck.ksk, ct, ck.testvec))
