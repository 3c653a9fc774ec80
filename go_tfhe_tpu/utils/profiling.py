"""Profiling, cost modeling and speed-of-light analysis.

The reference has no tracing at all — only ad-hoc wall-clock prints and a
byte-accounting helper (``evaluator/buffers.go:214-240``,
``poly/buffer_manager.go:145-172``); SURVEY.md §5 maps this subsystem to JAX
profiler traces plus analytic per-kernel cost tables.  Everything here is
host-side and dependency-free.
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Dict, Iterator

import jax

from ..params import TFHEParams

# Peak numbers for the common TPU generations (bf16 matmul TFLOP/s, int8
# matmul TOP/s, HBM GB/s).  Used only for speed-of-light ratios; override
# via the `peaks` argument.
TPU_PEAKS: Dict[str, Dict[str, float]] = {
    "v4": {"bf16_tflops": 275.0, "int8_tops": 275.0, "hbm_gbps": 1200.0},
    "v5e": {"bf16_tflops": 197.0, "int8_tops": 394.0, "hbm_gbps": 820.0},
    "v5p": {"bf16_tflops": 459.0, "int8_tops": 918.0, "hbm_gbps": 2765.0},
    "v6e": {"bf16_tflops": 918.0, "int8_tops": 1836.0, "hbm_gbps": 1640.0},
}

NUM_KERNEL_LIMBS = 4  # base-256 limbs of the 32-bit BSK band (pallas_extprod)


@dataclasses.dataclass(frozen=True)
class BootstrapCost:
    """Analytic cost of one batched gate/PBS bootstrap (Pallas fast path)."""
    batch: int
    steps: int                  # n_lwe sequential CMUX iterations
    macs_per_ct: float          # MXU MACs per ciphertext (whole bootstrap)
    flops_per_ct: float
    dot_dtype: str              # "int8" or "bf16" (ops/blindrotate.py)
    bsk_bytes: int              # resident bootstrapping-key band
    ksk_bytes: int

    def seconds_at(self, tflops: float) -> float:
        """Compute-bound lower bound for the whole batch."""
        return self.batch * self.flops_per_ct / (tflops * 1e12)

    def bootstraps_per_sec_at(self, tflops: float) -> float:
        return self.batch / self.seconds_at(tflops)


def bootstrap_cost(p: TFHEParams, batch: int = 1) -> BootstrapCost:
    """Cost model of the Pallas blind rotate (ops/pallas_extprod.py).

    Per step and ciphertext the kernel contracts digit limbs (ND, 2L, N)
    against Toeplitz columns; digit limb i hits (NUM_LIMBS - drop - i)
    kernel-limb column groups of width N, for both output channels:

        MACs/step/ct = (2L*N) * 2 * sum_i (NUM_LIMBS - drop - i) * N
    """
    nd = p.digit_limbs
    drop = p.kernel_limb_drop if nd == 1 else 0
    col_groups = sum(NUM_KERNEL_LIMBS - drop - i for i in range(nd))
    macs_step = (2 * p.l * p.n) * 2 * col_groups * p.n
    macs = float(macs_step) * p.lwe_n
    limb_mag = min(p.half_bg, 128)
    dot = ("int8" if nd == 1 and 2 * p.l * p.n * limb_mag * 128 < 1 << 31
           else "bf16")
    bsk_bytes = p.lwe_n * 2 * 2 * p.l * (2 * p.n + 256) * 4
    ksk_bytes = p.n * p.iks_t * p.base * (p.lwe_n + 1) * 4
    return BootstrapCost(batch=batch, steps=p.lwe_n, macs_per_ct=macs,
                         flops_per_ct=2 * macs, dot_dtype=dot,
                         bsk_bytes=bsk_bytes, ksk_bytes=ksk_bytes)


def speed_of_light_report(p: TFHEParams, measured_bootstraps_per_sec: float,
                          generation: str = "v5e",
                          peaks: Dict[str, float] | None = None) -> str:
    """Human-readable speed-of-light table for the bootstrap hot loop."""
    pk = peaks or TPU_PEAKS[generation]
    c = bootstrap_cost(p)
    peak_key = "int8_tops" if c.dot_dtype == "int8" else "bf16_tflops"
    peak = pk.get(peak_key, pk["bf16_tflops"])
    sol = c.bootstraps_per_sec_at(peak)
    util = measured_bootstraps_per_sec / sol if sol else 0.0
    lines = [
        f"profile {p.name}: {c.steps} blind-rotate steps, "
        f"{p.digit_limbs} digit limb(s), {c.dot_dtype} MXU dot",
        f"  compute/ct:      {c.flops_per_ct / 1e9:.2f} GFLOP",
        f"  BSK band:        {c.bsk_bytes / 1e6:.1f} MB resident",
        f"  KSK:             {c.ksk_bytes / 1e6:.1f} MB resident",
        f"  speed of light:  {sol:.0f} bootstraps/s at "
        f"{peak:.0f} T{'OP' if c.dot_dtype == 'int8' else 'FLOP'}/s "
        f"({generation})",
        f"  measured:        {measured_bootstraps_per_sec:.0f} bootstraps/s "
        f"({100 * util:.1f}% of SoL)",
    ]
    return "\n".join(lines)


def bootstrap_utilization(p: TFHEParams, measured_bootstraps_per_sec: float,
                          generation: str = "v5e") -> Dict[str, object]:
    """Machine-readable MFU summary for bench JSON artifacts."""
    pk = TPU_PEAKS[generation]
    c = bootstrap_cost(p)
    peak_key = "int8_tops" if c.dot_dtype == "int8" else "bf16_tflops"
    sol = c.bootstraps_per_sec_at(pk[peak_key])
    return {
        "gflop_per_ct": round(c.flops_per_ct / 1e9, 2),
        "dot_dtype": c.dot_dtype,
        "sol_bootstraps_per_sec": round(sol, 0),
        "mfu": round(measured_bootstraps_per_sec / sol, 4) if sol else 0.0,
    }


def key_memory_usage(ck) -> Dict[str, int]:
    """Byte accounting of a CloudKey (the reference's
    BufferPool.MemoryUsage analogue)."""
    out = {}
    for name in ("testvec", "ksk", "bsk", "bsk_kernel", "bsk_band",
                 "bsk_band_rev"):
        arr = getattr(ck, name, None)
        out[name] = 0 if arr is None else arr.size * arr.dtype.itemsize
    out["total"] = sum(out.values())
    return out


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """JAX profiler trace scope; view with TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
