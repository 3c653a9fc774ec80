"""Sweep the blind-rotate kernel tiling (tn, tb) at bench shapes.

Times the FULL 700-step blind_rotate_tpu (one jit, dispatch overhead
amortized over the whole loop) per variant and prints bootstraps/s.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")  # repo root

import go_tfhe_tpu as tfhe  # noqa: E402
from go_tfhe_tpu.utils.backend import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from go_tfhe_tpu.ops.blindrotate import blind_rotate_tpu  # noqa: E402
from go_tfhe_tpu.ops.pallas_extprod import NUM_LIMBS, pack_bsk_band  # noqa: E402

p = tfhe.get_params("128bit_fast")
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
N = p.n
key = jax.random.PRNGKey(0)
ct = jax.random.randint(key, (B, p.lwe_n + 1), 0, 1 << 30, jnp.uint32) * 4
tv = jax.random.randint(key, (2, N), 0, 1 << 24, jnp.uint32) * 256
# band with generous pad so any tn <= 1024 works; on-grid values (low
# limb zero) like the real fast-profile keys
bsk = jax.random.randint(key, (p.lwe_n, 2 * p.l, 2, N), 0, 1 << 24,
                         jnp.uint32) * 256
band = pack_bsk_band(bsk, tn=1024)

run = jax.jit(blind_rotate_tpu, static_argnums=(0,),
              static_argnames=("tb", "sub", "tn"))

drop = p.kernel_limb_drop
SOL_S = B * (2 * p.l * N) * 2 * (NUM_LIMBS - drop) * N * p.lwe_n / 197e12  # MACs/s (394 int8 TOP/s, 2 ops/MAC)


def timed(name, tb, tn, reps=5):
    try:
        out = run(p, band, ct, tv, tb=tb, tn=tn)
        _ = np.asarray(out[0, :1, :1])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run(p, band, ct, tv, tb=tb, tn=tn)
        _ = np.asarray(out[0, :1, :1])
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:24s} {dt*1e3:8.1f} ms  mfu {SOL_S/dt*100:5.1f}%  "
              f"{B/dt:7.0f} blindrotates/s", flush=True)
    except Exception as e:  # noqa: BLE001  (VMEM OOM etc.)
        print(f"{name:24s} FAILED: {str(e).splitlines()[0][:120]}",
              flush=True)


print(f"B={B} 128bit_fast blind_rotate_tpu sweep; int8 SoL {SOL_S*1e3:.0f} ms",
      flush=True)
for tb, tn in [(128, 256), (128, 512), (256, 256), (256, 512), (512, 256),
               (128, 1024), (64, 1024)]:
    timed(f"tb={tb} tn={tn}", tb, tn)
