"""Probe: half-batch VPU/MXU pipelining (ops/pallas_pipe.py) vs the
transposed two-kernel composition — the round-5 overlap experiment.

Times the full 700-step blind-rotate loop at bench shapes (128bit_fast,
B=4096) in three configurations:

* baseline — blind_rotate_t (rotate_decompose_t + extprod_t per step),
* pipe     — blind_rotate_pipe (2 fused half-batch calls per step),
* pipe_rf  — same with the rotation emitted before the dots in the body.

If Mosaic overlaps the independent chains, pipe ~ 2 * max(dot/2, rot/2)
~ 560 us/step -> ~10.4k bootstraps/s rotate-only.  If it serializes, pipe
~ baseline (the fifth negative result; see PERF_ANALYSIS.md).

Usage: python tools/probe_pipe.py [--batch N] [--steps N]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import go_tfhe_tpu as tfhe  # noqa: E402
from go_tfhe_tpu.ops.blindrotate import blind_rotate_t  # noqa: E402
from go_tfhe_tpu.ops.pallas_pipe import blind_rotate_pipe  # noqa: E402
from go_tfhe_tpu.utils.backend import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

B = 4096
for i, a in enumerate(sys.argv):
    if a == "--batch":
        B = int(sys.argv[i + 1])

p = tfhe.get_params("128bit_fast")
STEPS = p.lwe_n
for i, a in enumerate(sys.argv):
    if a == "--steps":
        import dataclasses
        STEPS = int(sys.argv[i + 1])
        p = dataclasses.replace(p, lwe_n=STEPS)

k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
sk = tfhe.gen_secret_key(k1, p)
ck = tfhe.gen_cloud_key(k2, sk, p, bands="all")
rng = np.random.default_rng(0)
ct = jnp.asarray(rng.integers(0, 1 << 32, size=(B, p.lwe_n + 1),
                              dtype=np.uint64).astype(np.uint32))


def timed(name, fn, *args, reps=3, **kw):
    out = fn(p, *args, **kw)
    ref = np.asarray(out[:1, :1, :1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(p, *args, **kw)
    _ = np.asarray(out[:1, :1, :1])
    dt = (time.perf_counter() - t0) / reps
    us_step = dt / STEPS * 1e6
    print(f"{name:10s} {dt*1e3:8.1f} ms  {us_step:7.1f} us/step  "
          f"{B/dt:8.0f} ct/s (rotate-only)", flush=True)
    return out, dt


base, dt_base = timed("baseline", blind_rotate_t, ck.bsk_band_rev, ct,
                      ck.testvec)
pipe, dt_pipe = timed("pipe", blind_rotate_pipe, ck.bsk_band_rev, ct,
                      ck.testvec)
np.testing.assert_array_equal(np.asarray(pipe), np.asarray(base))
print("pipe == baseline bit-exact")
pipe_rf, dt_rf = timed("pipe_rf", blind_rotate_pipe, ck.bsk_band_rev, ct,
                       ck.testvec, rot_first=True)
np.testing.assert_array_equal(np.asarray(pipe_rf), np.asarray(base))
print(f"speedup: pipe {dt_base/dt_pipe:.3f}x  pipe_rf {dt_base/dt_rf:.3f}x")
