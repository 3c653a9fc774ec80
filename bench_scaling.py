"""Batched-bootstrap scaling benchmark over a device mesh.

Measures gate bootstraps/sec at 1, 2, ..., D devices (whatever is attached:
real chips on a pod slice, or virtual CPU devices for a plumbing check) and
reports scaling efficiency — the BASELINE.json "batched-bootstrap scaling
efficiency at N hosts" metric.  On a multi-host pod, run one process per
host with jax.distributed.initialize (parallel/mesh.py) and the same code.

Prints one JSON line per device count.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np

import go_tfhe_tpu as tfhe
from go_tfhe_tpu import cipher, engine
from go_tfhe_tpu.parallel import mesh as meshlib


def run(profile: str, batch_per_device: int, reps: int) -> None:
    p = tfhe.get_params(profile)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    sk = tfhe.gen_secret_key(k1, p)
    ck = tfhe.gen_cloud_key(k2, sk, p)

    devices = jax.devices()
    counts = []
    d = 1
    while d <= len(devices):
        counts.append(d)
        d *= 2
    base_rate = None

    for nd in counts:
        mesh = meshlib.make_mesh(devices[:nd])
        b = batch_per_device * nd
        bits = np.resize([False, True], b)
        ct = cipher.lwe_encrypt_bool(k3, bits, p.lwe_alpha, sk.lv0)
        prepared = engine.prepare_nand(ct, ct)
        ck_r = meshlib.replicate_keys(mesh, ck)
        ct_s = meshlib.shard_batch(mesh, prepared)

        out = engine.bootstrap(ck_r, ct_s)            # compile + warm-up
        _ = np.asarray(out[0, :1])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = engine.bootstrap(ck_r, ct_s)
        _ = np.asarray(out[0, :1])
        dt = (time.perf_counter() - t0) / reps
        rate = b / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * nd)
        print(json.dumps({
            "metric": f"bootstraps_per_sec_{profile}",
            "devices": nd,
            "batch": b,
            "value": round(rate, 1),
            "unit": "bootstraps/s",
            "scaling_efficiency": round(eff, 3),
        }), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default=None,
                    help="default: 128bit on TPU, test_fast elsewhere")
    ap.add_argument("--batch-per-device", type=int, default=None)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    on_tpu = jax.default_backend() == "tpu"
    profile = args.profile or ("128bit" if on_tpu else "test_fast")
    bpd = args.batch_per_device or (1024 if on_tpu else 8)
    run(profile, bpd, args.reps)
