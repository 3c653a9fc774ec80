"""80/110-bit profile throughput (the BENCH_profiles artifact).

Same methodology as bench.py (correctness-gated, queued steady-state
reps) at the other two reference security levels; the reference's
single-gate numbers are README.md:398.

Usage: python tools/bench_profiles.py [--profiles 80bit_fast,110bit_fast]
"""
import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")
import go_tfhe_tpu as tfhe  # noqa: E402
from go_tfhe_tpu import cipher, engine  # noqa: E402
from go_tfhe_tpu.utils.backend import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

REF_MS = {"80bit_fast": "60-80", "110bit_fast": "~90"}
profiles = "80bit_fast,110bit_fast"
for i, a in enumerate(sys.argv):
    if a == "--profiles":
        profiles = sys.argv[i + 1]

for name in profiles.split(","):
    p = tfhe.get_params(name)
    batch = 4096
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    sk = tfhe.gen_secret_key(k1, p)
    ck = tfhe.gen_cloud_key(k2, sk, p)
    bits_a = np.resize([False, True], batch)
    bits_b = np.resize([False, False, True, True], batch)
    ct_a = cipher.lwe_encrypt_bool(k3, bits_a, p.lwe_alpha, sk.lv0)
    ct_b = cipher.lwe_encrypt_bool(k4, bits_b, p.lwe_alpha, sk.lv0)

    def nand(a, b):
        return engine.bootstrap(ck, engine.prepare_nand(a, b))

    out = nand(ct_a, ct_b)
    dec = np.asarray(cipher.lwe_decrypt_bool(out, sk.lv0))
    wrong = int((dec != ~(bits_a & bits_b)).sum())
    assert wrong == 0, f"{name}: {wrong}/{batch} wrong"
    t0 = time.perf_counter()
    for _ in range(5):
        out = nand(ct_a, ct_b)
    _ = np.asarray(out[0, :1])
    dt = (time.perf_counter() - t0) / 5
    print(json.dumps({
        "metric": f"gate_bootstraps_per_sec_{name}",
        "value": round(batch / dt, 2), "unit": "bootstraps/s",
        "reference_single_gate_ms": REF_MS.get(name, "?")}), flush=True)
