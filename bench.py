"""Headline benchmark: gate bootstraps/sec/chip at 128-bit parameters.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the Go reference does a single 128-bit gate bootstrap in
~100-150 ms on a modern CPU core (README.md:131,398) => ~8 bootstraps/sec.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import go_tfhe_tpu as tfhe
from go_tfhe_tpu import engine

REFERENCE_BOOTSTRAPS_PER_SEC = 8.0   # 1 / 0.125 s (README.md:398 midpoint)


def main() -> None:
    p = tfhe.P128
    on_tpu = jax.default_backend() == "tpu"
    batch = 4096 if on_tpu else 64

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    sk = tfhe.gen_secret_key(k1, p)
    ck = tfhe.gen_cloud_key(k2, sk, p)

    bits = np.resize([False, True, True, False], batch)
    ct = tfhe.lwe_encrypt_bool(k3, bits, p.lwe_alpha, sk.lv0)

    if on_tpu and ck.bsk_band is not None:
        core, bsk = engine._bootstrap_core_tpu, ck.bsk_band
    else:
        core, bsk = engine._bootstrap_core, ck.bsk_kernel

    def nand(a, b):
        return core(p, True, bsk, ck.ksk, engine.prepare_nand(a, b),
                    ck.testvec)

    # Warm-up / compile.  NOTE: device completion is forced by a host
    # readback, not block_until_ready (which does not block through the
    # axon tunnel).
    out = nand(ct, ct)

    # Correctness gate: a benchmark of wrong answers is worthless.
    dec = np.asarray(tfhe.lwe_decrypt_bool(out, sk.lv0))
    assert (dec == ~bits).all(), "NAND(a,a) must equal NOT a"

    # Timed steady-state runs; sequential device stream, one readback at end.
    reps = 5 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(reps):
        out = nand(ct, ct)
    _ = np.asarray(out[0, :1])
    dt = (time.perf_counter() - t0) / reps

    value = batch / dt
    print(json.dumps({
        "metric": "gate_bootstraps_per_sec_per_chip_128bit",
        "value": round(value, 2),
        "unit": "bootstraps/s",
        "vs_baseline": round(value / REFERENCE_BOOTSTRAPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
