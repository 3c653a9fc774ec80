"""Headline benchmark: gate bootstraps/sec/chip at 128-bit parameters.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...config}.
Baseline: the Go reference does a single 128-bit gate bootstrap in
~100-150 ms on a modern CPU core (README.md:131,398) => ~8 bootstraps/sec.

Headline configuration (every field stated in the JSON):
* profile "128bit_fast" — crypto parameters identical to the 128-bit
  profile; the Pallas external product drops the lowest of the 4
  bootstrapping-key limbs (kernel_limb_drop=1) and uses 2 of the 3
  decomposition levels (decomp_levels_used=2) — see ops/pallas_extprod.py
  and params.py for the noise analyses (~2^22.5 phase error against a
  2^29 margin).
* UNIFORM binary secret keys — the reference's own distribution
  (key/key.go:25-39) — and per-bit blind rotation.
* the public ``engine.bootstrap`` entry (not a private core).

Flags: --exact = parity configuration (bit-exact 4-limb kernel, all 3
levels); --block = block-binary keys + fused block rotation (opt-in key
distribution, see keys.py caveat; currently slower than per-bit).

The correctness gate checks a varying NAND truth table over the whole batch
before any timing: a benchmark of wrong answers is worthless.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np

import go_tfhe_tpu as tfhe
from go_tfhe_tpu import engine

REFERENCE_BOOTSTRAPS_PER_SEC = 8.0   # 1 / 0.125 s (README.md:398 midpoint)


def main() -> None:
    exact = "--exact" in sys.argv
    on_tpu = jax.default_backend() == "tpu"
    batch = 4096 if on_tpu else 64

    if exact:
        p, block = tfhe.P128, False
    elif "--block" in sys.argv:
        p, block = tfhe.get_params("128bit_fast"), True
    else:
        p, block = tfhe.get_params("128bit_fast"), False

    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    sk = tfhe.gen_secret_key(k1, p, block_binary=block)
    ck = tfhe.gen_cloud_key(k2, sk, p)

    bits_a = np.resize([False, True], batch)
    bits_b = np.resize([False, False, True, True], batch)
    ct_a = tfhe.lwe_encrypt_bool(k3, bits_a, p.lwe_alpha, sk.lv0)
    ct_b = tfhe.lwe_encrypt_bool(k4, bits_b, p.lwe_alpha, sk.lv0)

    def nand(a, b):
        return engine.bootstrap(ck, engine.prepare_nand(a, b))

    # Warm-up / compile.  NOTE: device completion is forced by a host
    # readback, not block_until_ready (which does not block through the
    # axon tunnel).
    out = nand(ct_a, ct_b)

    # Correctness gate over a varying truth table (both output values).
    dec = np.asarray(tfhe.lwe_decrypt_bool(out, sk.lv0))
    want = ~(bits_a & bits_b)
    assert (dec == want).all(), \
        f"NAND truth table failed: {int((dec != want).sum())}/{batch} wrong"

    # Timed steady-state runs; sequential device stream, one readback at end.
    reps = 5 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(reps):
        out = nand(ct_a, ct_b)
    _ = np.asarray(out[0, :1])
    dt = (time.perf_counter() - t0) / reps

    value = batch / dt
    print(json.dumps({
        "metric": "gate_bootstraps_per_sec_per_chip_128bit",
        "value": round(value, 2),
        "unit": "bootstraps/s",
        "vs_baseline": round(value / REFERENCE_BOOTSTRAPS_PER_SEC, 2),
        "profile": p.name,
        "key_distribution": "block_binary" if block else "uniform_binary",
        "rotation": "block" if block else "per_bit",
        "kernel_limbs": 4 - p.kernel_limb_drop,
        "batch": batch,
        "api": "engine.bootstrap",
    }))


if __name__ == "__main__":
    main()
