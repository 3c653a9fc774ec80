"""Extended-LUT (Uint6-8) PBS benchmark: Pallas TPU path vs portable path.

The polyExtendFactor capability is this framework's flagship
beyond-reference feature (the reference advertises Uint6-8 but never
implemented extended LUTs — params/UINT_STATUS.md:20-31).  This tool
produces the per-ciphertext numbers for MICRO/EXT artifacts:

* correctness: an identity-LUT sweep over messages must decrypt exactly;
* `pbs_<name>_per_ct` — the engine's automatic path (Pallas on TPU);
* `pbs_<name>_portable_per_ct` — the portable Toeplitz-einsum path forced
  at a smaller batch (it materializes (2L,2,N,N) Toeplitz tensors per
  step, so full batch would be pointlessly slow), for the speedup row.

Usage: python tools/bench_ext.py [--profiles uint6,uint7,uint8]
       [--batch 2048] [--portable-batch 64] [--skip-portable]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import go_tfhe_tpu as tfhe  # noqa: E402
from go_tfhe_tpu import cipher, engine, lut  # noqa: E402
from go_tfhe_tpu.utils.backend import enable_compilation_cache  # noqa: E402


def _sync(x):
    _ = np.asarray(x.reshape(-1)[:1])


def bench_profile(name: str, batch: int, portable_batch: int,
                  skip_portable: bool) -> None:
    p = tfhe.get_params(name)
    m = p.message_modulus
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    t0 = time.perf_counter()
    sk = tfhe.gen_secret_key(k1, p)
    ck = tfhe.gen_cloud_key(k2, sk, p)
    _ = np.asarray(ck.bsk)[:1, :1, :1, :1]
    print(json.dumps({"metric": f"keygen_cloud_{name}",
                      "value": round((time.perf_counter() - t0) * 1e3, 1),
                      "unit": "ms"}), flush=True)

    msgs = np.arange(batch) % m
    ct = cipher.lwe_encrypt_message(k3, msgs, m, p.lwe_alpha, sk.lv0)
    table = jnp.asarray(lut.Generator(p, m).gen_lut(lambda x: (x + 1) % m))

    out = lut.bootstrap_lut(ck, ct, table)          # compile + warm
    dec = np.asarray(cipher.lwe_decrypt_message(out, m, sk.lv0))
    acc = float((dec == (msgs + 1) % m).mean())
    print(json.dumps({"metric": f"pbs_{name}_accuracy", "value": acc,
                      "unit": "fraction", "batch": batch}), flush=True)

    reps = 2
    t0 = time.perf_counter()
    for _ in range(reps):
        out = lut.bootstrap_lut(ck, ct, table)
    _sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"metric": f"pbs_{name}_per_ct",
                      "value": round(dt * 1e3 / batch, 3), "unit": "ms",
                      "batch": batch,
                      "path": ("pallas" if engine._tpu_core_choice(ck)
                               is not None else "portable")}),
          flush=True)

    if skip_portable:
        return
    pb = portable_batch
    ctp = ct[:pb]
    outp = engine._bootstrap_core_ext(p, True, ck.bsk_kernel, ck.ksk, ctp,
                                      table)
    _sync(outp)
    t0 = time.perf_counter()
    outp = engine._bootstrap_core_ext(p, True, ck.bsk_kernel, ck.ksk, ctp,
                                      table)
    _sync(outp)
    dtp = time.perf_counter() - t0
    print(json.dumps({"metric": f"pbs_{name}_portable_per_ct",
                      "value": round(dtp * 1e3 / pb, 3), "unit": "ms",
                      "batch": pb,
                      "speedup_pallas": round((dtp / pb) / (dt / batch), 1)}),
          flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--profiles", default="uint6")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--portable-batch", type=int, default=64)
    ap.add_argument("--skip-portable", action="store_true")
    args = ap.parse_args()
    enable_compilation_cache()
    on_tpu = jax.default_backend() == "tpu"
    batch = args.batch or (2048 if on_tpu else 16)
    for name in args.profiles.split(","):
        bench_profile(name.strip(), batch, args.portable_batch,
                      args.skip_portable)


if __name__ == "__main__":
    main()
