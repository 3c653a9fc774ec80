"""Bit-security estimates for the shipped LWE/RLWE instances.

Dependency-free implementation of the standard primal-uSVP estimate — the
same model the lattice-estimator's ``usvp`` routine implements:

* BKZ-beta success condition ("2016 estimate", Alkim-Ducas-Poeppelmann-
  Schwabe, USENIX'16 sec. 6.3; Albrecht-Player-Scott JMC'15 methodology):
      sqrt(beta) * sigma  <=  delta^(2*beta - d - 1) * vol^(1/d)
  for the Bai-Galbraith embedding of m LWE samples with secret-column
  scaling omega = sigma/varsigma (varsigma = secret std), giving
  d = n + m + 1 and vol = q^m * omega^n.
* root-Hermite factor  delta(beta) = ((pi*beta)^(1/beta) * beta /
  (2*pi*e))^(1/(2*(beta-1))).
* core-SVP cost models: classical 2^(0.292*beta) (BDGL16), quantum
  2^(0.265*beta) (Laarhoven) — sieving-call count only, the conservative
  convention NIST submissions use.

On top of the plain primal estimate the script runs the sparse-secret
guess-and-reduce loop (the cheap end of the primal-hybrid family): drop k
coordinates hoping they are zero; one BKZ run on dimension n-k costs
T(n-k), expected repetitions (1/P(coord=0))^k.  For uniform binary
(p0 = 1/2) this never pays; for block-binary keys (p0 = bs/(bs+1)) it
caps the benefit an attacker draws from the sparser distribution.

This is an ESTIMATE with the usual caveats: no dual-hybrid / BKW branch
(never competitive at these shapes), no memory accounting, and the
established models themselves carry ~10-bit error bars.  Run
``python tools/security_estimate.py`` to regenerate SECURITY.md's table.
"""

from __future__ import annotations

import math

E = math.e
PI = math.pi


def delta(beta: float) -> float:
    """Root-Hermite factor of BKZ with blocksize beta (Chen'13 asymptotic)."""
    if beta <= 50:
        beta = 50.0         # model invalid below ~50; clamp conservatively
    return ((PI * beta) ** (1.0 / beta) * beta / (2 * PI * E)) ** (
        1.0 / (2.0 * (beta - 1.0)))


def usvp_beta(n: int, logq: float, sigma: float, varsigma: float,
              max_m: int | None = None) -> tuple[int, int]:
    """Smallest BKZ blocksize whose 2016-estimate condition holds.

    Returns (beta, m).  ``sigma`` is the error std in q units' absolute
    scale (same units as q = 2^logq); ``varsigma`` the secret std.
    Optimizes over the number of samples m <= max_m (default 2n).
    """
    q = 2.0 ** logq
    omega = max(sigma / varsigma, 1e-9) if varsigma > 0 else 1.0
    max_m = max_m or 2 * n
    best = (10 ** 9, 0)
    for m in range(max(40, n // 4), max_m + 1, max(1, n // 64)):
        d = n + m + 1
        logvol = m * math.log2(q) + n * math.log2(omega)
        for beta in range(60, d):
            lhs = math.log2(math.sqrt(beta) * sigma)
            rhs = (2 * beta - d - 1) * math.log2(delta(beta)) + logvol / d
            if lhs <= rhs:
                if beta < best[0]:
                    best = (beta, m)
                break
    return best


def primal_bits(n: int, logq: float, sigma: float, varsigma: float,
                p_zero: float = 0.5, label: str = "") -> dict:
    """Classical/quantum core-SVP bits, with the sparse guess loop."""
    best = {"bits_classical": float("inf")}
    step = max(1, n // 32)
    for k in range(0, n // 2 + 1, step):
        beta, m = usvp_beta(n - k, logq, sigma, varsigma)
        if beta >= 10 ** 9:
            continue
        # expected repetitions of the whole reduction: (1/p_zero)^k
        guess_bits = -k * math.log2(p_zero) if k else 0.0
        c = 0.292 * beta + guess_bits
        if c < best["bits_classical"]:
            best = {
                "label": label, "n": n, "logq": logq,
                "sigma": round(sigma, 4), "secret_std": round(varsigma, 3),
                "beta": beta, "samples": m, "guessed_coords": k,
                "bits_classical": round(c, 1),
                "bits_quantum": round(0.265 * beta + guess_bits, 1),
            }
    return best


def main() -> None:
    rows = []

    def add(label, n, logq, sigma, varsigma, p_zero=0.5):
        r = primal_bits(n, logq, sigma, varsigma, p_zero, label)
        # A discretized Gaussian with absolute std << 1 rounds to zero
        # almost surely: the instance is effectively NOISELESS and falls to
        # linear algebra over Z_q given >= n samples, regardless of what
        # the lattice model says.  (This is the case for the reference's
        # Uint3-8 level-1 alphas on the 32-bit torus — see SECURITY.md.)
        if sigma < 0.05:
            r["bits_classical"] = 0.0
            r["bits_quantum"] = 0.0
            r["noiseless"] = True
        rows.append(r)
        print(f"{label:42s} n={n:5d} log2(q)={logq:4.0f} sigma={sigma:10.3f} "
              f"beta={r['beta']:4d} k={r['guessed_coords']:4d} "
              f"classical={r['bits_classical']:6.1f} "
              f"quantum={r['bits_quantum']:6.1f}"
              + ("  [NOISELESS -> 0 bits]" if r.get("noiseless") else ""))

    # ---- level-0 LWE, uniform binary secret (the default) -----------------
    # 128-bit / uint1: n=700 alpha=2e-5; 110-bit: n=630 alpha=3.05e-5;
    # 80-bit: n=550 alpha=5e-5.  sigma = alpha * 2^32; binary std = 1/2.
    add("lv0 128bit uniform binary", 700, 32, 2e-5 * 2 ** 32, 0.5)
    add("lv0 110bit uniform binary", 630, 32, 3.0517578125e-5 * 2 ** 32, 0.5)
    add("lv0 80bit uniform binary", 550, 32, 5e-5 * 2 ** 32, 0.5)

    # ---- level-0 LWE, block-binary secrets (opt-in, keys.py caveat) -------
    # Hamming weight <= 1 per block of bs, uniform over bs+1 patterns:
    # p1 = 1/(bs+1), var = p1*(1-p1), p_zero = bs/(bs+1).
    for bs in (3, 4, 5, 6, 7, 8):
        p1 = 1.0 / (bs + 1)
        add(f"lv0 128bit block-binary bs={bs}", 700, 32, 2e-5 * 2 ** 32,
            math.sqrt(p1 * (1 - p1)), p_zero=1 - p1)

    # ---- level-1 RLWE (BSK rows; ring dim as LWE dim) ---------------------
    add("lv1 128bit N=1024 (BSK)", 1024, 32, 2e-8 * 2 ** 32, 0.5)
    # 128bit_fast on-grid q=2^24 keygen: A uniform on the 2^8-grid, noise
    # = Gaussian(alpha*2^32) rounded to the grid.  In q=2^24 units:
    # sigma = sqrt((alpha*2^32)^2 + 2^16/12) / 2^8.
    sig24 = math.sqrt((2e-8 * 2 ** 32) ** 2 + (2 ** 16) / 12.0) / 2 ** 8
    add("lv1 128bit_fast N=1024 q=2^24 (BSK)", 1024, 24, sig24, 0.5)
    # Uint2-8 level-1 alphas are SUB-GRID on the 32-bit torus (inherited
    # bit-identically from the reference's tables, which stem from a 2^64-
    # torus lineage): the discretized noise rounds to zero -> 0 bits.
    add("lv1 uint2 N=512 (BSK)", 512, 32, 0.009957504900931745, 0.5)
    add("lv1 uint3 N=1024 (BSK)", 1024, 32, 9.5367431640625e-07, 0.5)
    add("lv1 uint5 N=2048 (BSK)", 2048, 32, 2.220446049250313e-17 * 2 ** 32,
        0.5)
    # uint5 level-0
    add("lv0 uint5 n=1071 uniform binary", 1071, 32,
        7.088226765410429e-8 * 2 ** 32, 0.5)
    add("lv0 uint5 block-binary bs=7", 1071, 32,
        7.088226765410429e-8 * 2 ** 32, math.sqrt((1 / 8) * (7 / 8)),
        p_zero=7 / 8)

    import json
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
