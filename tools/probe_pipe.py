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

Timing is DIFFERENTIAL (the axon tunnel adds ~100+ ms of fixed dispatch
cost per call chain): each config runs at two static step counts and the
per-step cost is (t_hi - t_lo) / (steps_hi - steps_lo).

** METHODOLOGY CAVEAT (round-5 lesson, kept for the record): this EAGER
harness is invalid at small step counts.  The eager call chain costs
~150-180 ms of host work per rep which OVERLAPS the asynchronous device
execution; at 60 steps the device finishes first, so t_lo measures the
HOST time, and the differential (t_hi - t_lo) subtracts host time from
device time — under-reporting the pipe kernel at 576 us/step when its
true cost is 741 (probe_pipe3.py, jitted cores, both points
device-bound).  Use tools/probe_pipe3.py for valid numbers. **

Usage: python tools/probe_pipe.py [--batch N] [--steps LO,HI]
"""
import dataclasses
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
S_LO, S_HI = 60, 360
for i, a in enumerate(sys.argv):
    if a == "--batch":
        B = int(sys.argv[i + 1])
    if a == "--steps":
        S_LO, S_HI = map(int, sys.argv[i + 1].split(","))

P_FULL = tfhe.get_params("128bit_fast")
P_LO = dataclasses.replace(P_FULL, lwe_n=S_LO)
P_HI = dataclasses.replace(P_FULL, lwe_n=S_HI)

k1, k2 = jax.random.split(jax.random.PRNGKey(0))
sk = tfhe.gen_secret_key(k1, P_FULL)
ck = tfhe.gen_cloud_key(k2, sk, P_FULL, bands="all")   # covers both prefixes
rng = np.random.default_rng(0)
ct = jnp.asarray(rng.integers(0, 1 << 32, size=(B, P_FULL.lwe_n + 1),
                              dtype=np.uint64).astype(np.uint32))


def run(fn, p, **kw):
    """One timed call at profile p (3-rep steady state after warm-up)."""
    out = fn(p, ck.bsk_band_rev, ct, ck.testvec, **kw)
    _ = np.asarray(out[:1, :1, :1])
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(p, ck.bsk_band_rev, ct, ck.testvec, **kw)
    _ = np.asarray(out[:1, :1, :1])
    return (time.perf_counter() - t0) / 3, out


def timed(name, fn, **kw):
    t_lo, _ = run(fn, P_LO, **kw)
    t_hi, out = run(fn, P_HI, **kw)
    us_step = (t_hi - t_lo) / (S_HI - S_LO) * 1e6
    full = us_step * P_FULL.lwe_n                       # extrapolated 700
    print(f"{name:10s} lo {t_lo*1e3:7.1f} ms  hi {t_hi*1e3:7.1f} ms  "
          f"{us_step:7.1f} us/step  {B/(full/1e6):8.0f} ct/s "
          f"(rotate-only, 700-step extrapolation)", flush=True)
    return us_step, out


us_base, base = timed("baseline", blind_rotate_t)
us_pipe, pipe = timed("pipe", blind_rotate_pipe)
np.testing.assert_array_equal(np.asarray(pipe), np.asarray(base))
print("pipe == baseline bit-exact (at the hi step count)")
us_rf, pipe_rf = timed("pipe_rf", blind_rotate_pipe, rot_first=True)
np.testing.assert_array_equal(np.asarray(pipe_rf), np.asarray(base))
print(f"per-step: baseline {us_base:.1f}  pipe {us_pipe:.1f} "
      f"({us_base/us_pipe:.3f}x)  pipe_rf {us_rf:.1f} "
      f"({us_base/us_rf:.3f}x)")
