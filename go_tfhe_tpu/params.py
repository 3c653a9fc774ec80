"""TFHE security parameters — TPU-native frozen parameter objects.

The Go reference (``/root/reference/params/params.go``) exposes a single mutable
global ``CurrentSecurityLevel`` consulted via switch statements on every call
(``params/params.go:517-626``).  That pattern is hostile to JAX: jitted code
must know every shape statically.  Here each profile is an immutable, hashable
:class:`TFHEParams` dataclass that is threaded explicitly through every
function and used as a ``static_argnum`` under ``jax.jit``.

Numeric values replicate the reference bit-for-bit:

* 80-bit      — ``params/params.go:83-112``
* 110-bit     — ``params/params.go:117-146``
* 128-bit     — ``params/params.go:151-180``
* Uint1–Uint8 — ``params/params.go:194-514``

Derived quantities (decomposition offset, gadget powers) mirror
``cloudkey/cloudkey.go:60-71`` and ``trgsw/trgsw.go:38-42``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

MOD32 = 1 << 32


@dataclasses.dataclass(frozen=True)
class TFHEParams:
    """One complete TFHE parameter profile (immutable, hashable).

    Field map to the reference structs (``params/params.go:50-78``):

    ==============  ==========================================
    here            reference
    ==============  ==========================================
    lwe_n           TLWELv0Params.N
    lwe_alpha       TLWELv0Params.ALPHA
    n               TLWELv1Params.N == TRLWELv1Params.N == TRGSWLv1Params.N
    lv1_alpha       TLWELv1Params.ALPHA (== TRGSW ALPHA)
    nbit            TRGSWLv1Params.NBIT
    bgbit           TRGSWLv1Params.BGBIT
    l               TRGSWLv1Params.L
    basebit         TRGSWLv1Params.BASEBIT
    iks_t           TRGSWLv1Params.IKS_T
    block_size      TRGSWLv1Params.BlockSize
    ==============  ==========================================
    """

    name: str
    # TLWE level 0
    lwe_n: int
    lwe_alpha: float
    # TLWE level 1 / TRLWE / TRGSW polynomial degree
    n: int
    lv1_alpha: float
    nbit: int
    # gadget decomposition
    bgbit: int
    l: int
    # identity key switching
    basebit: int
    iks_t: int
    # block blind rotation (config only in the reference; see SURVEY.md #13)
    block_size: int
    # message space for Uint profiles (2 for plain boolean levels)
    message_modulus: int = 2
    # LUT size = poly_extend_factor * n (reference: params/UINT_STATUS.md;
    # extended LUTs are advertised for Uint6-8 but unimplemented upstream)
    poly_extend_factor: int = 1
    # Noise-budget kernel-limb truncation for the Pallas external product
    # (ops/pallas_extprod.py): drop this many of the 4 bootstrapping-key
    # limbs, cutting MXU columns proportionally.  0 = bit-exact integer
    # arithmetic.  1 adds ~2^21.5 phase error over a full 128-bit blind
    # rotation — 2^7 sigma inside the gate margin (see extprod_pallas
    # docstring for the analysis); comparable in spirit to the float64 FFT
    # rounding the reference tolerates.  Crypto parameters are unchanged.
    kernel_limb_drop: int = 0
    # Approximate gadget decomposition on the TPU fast path: use only this
    # many of the L decomposition levels (0 = all).  Standard TFHE
    # technique (decompositions are already approximate below L*BGBIT
    # bits); using 2 of the 128-bit profile's 3 levels cuts the contraction
    # rows by a third and leaves the per-coefficient rounding error at
    # 2^(32-2*6)/2 = 2^19, which accumulates over ~lwe_n/2 key-bit hits to
    # std ~2^22.4 — far inside the 2^29 gate margin.  The portable/exact
    # paths always use all L levels.
    decomp_levels_used: int = 0
    # Packed-digit rotation on the TPU fast path (ops/pallas_rotate.py
    # rotate_decompose_packed): decompose the ACCUMULATOR once, rotate the
    # four packed digit bytes in one int32 lane (half the VPU rotation
    # work), and external-multiply D' = X^a.D - D, which by linearity of
    # the convolution equals the CMUX update  X^a E - E.  Two extra noise
    # terms vs. decompose-after-subtract, both s_i-scalar-multiplied (the
    # TRGSW plaintext is the 0/1 LWE key bit, never the ring key):
    #   * commutation tail  s_i (X^a - 1) eps, |eps| <= 2^(32-l_used*bgbit-1):
    #     per-step std sqrt(2)*2^17.9, over ~350 active steps ~2^22.9;
    #   * digit variance doubles (Var(X^a.D - D) = 2 Var(D)), growing the
    #     BSK-noise and limb-drop terms by sqrt(2) (to ~2^22.1 / ~2^22).
    # Total bootstrap noise stays ~2^24.6 against the 2^29 gate margin
    # (mod-switch 2^24.2 still dominates) — > 20 sigma of headroom.
    # Requires l_used <= 2 and bgbit <= 6 (digit bytes must pack 4-to-an-
    # int32 with borrow-free biased arithmetic).
    fast_rotation: bool = False
    # Per-step offset dithering of the gadget decomposition on the TPU fast
    # path.  The approximate-gadget tail (decomp_levels_used < L) lives in
    # the accumulator's LOW bits, which rotate along with the accumulator:
    # every blind-rotate step re-adds an ALIGNED copy of the same tail
    # vector, so the tail error grows LINEARLY in the ~n/2 active steps
    # (measured: the l_used=2 tail costs 2^26.6 of final phase std at the
    # 128-bit profile — ~18x the sqrt-accumulation prediction).  Adding a
    # per-step pseudo-random constant u_i (golden-ratio sequence, spanning
    # the 2^(32-l_used*bgbit) tail grid) to the decomposition offset
    # re-rounds every step differently, decorrelating the tails and
    # restoring sqrt(n) accumulation.  Exactness of the represented value
    # is untouched (the offset only moves WHICH multiple of the gadget
    # base each digit rounds to); dither=False reproduces the reference
    # decomposition bit-for-bit.
    offset_dither: bool = False

    # ---- derived quantities -------------------------------------------------

    @property
    def bg(self) -> int:
        """Gadget base  Bg = 2^BGBIT  (params/params.go:72)."""
        return 1 << self.bgbit

    @property
    def half_bg(self) -> int:
        return 1 << (self.bgbit - 1)

    @property
    def base(self) -> int:
        """Key-switching base  2^BASEBIT  (trgsw/trgsw.go:288)."""
        return 1 << self.basebit

    @property
    def ksk_alpha(self) -> float:
        """params/params.go:629-631."""
        return self.lwe_alpha

    @property
    def bsk_alpha(self) -> float:
        """params/params.go:634-636."""
        return self.lv1_alpha

    @property
    def decomposition_offset(self) -> int:
        """Offset added before digit extraction.

        offset = sum_i (Bg/2) * 2^(32-(i+1)*BGBIT)  mod 2^32
        (cloudkey/cloudkey.go:60-71).
        """
        off = 0
        for i in range(self.l):
            off += (self.bg // 2) * (1 << (32 - (i + 1) * self.bgbit))
        return off % MOD32

    @property
    def gadget_powers(self) -> Tuple[int, ...]:
        """Torus encodings of 1/Bg^(i+1), i.e. 2^(32-(i+1)*BGBIT).

        Matches utils.F64ToTorus(1/Bg^(i+1)) exactly (trgsw/trgsw.go:38-42)
        because the values are dyadic.
        """
        return tuple((1 << (32 - (i + 1) * self.bgbit)) % MOD32
                     for i in range(self.l))

    @property
    def ks_prec_offset(self) -> int:
        """Rounding offset for key switching: 2^(32-(1+basebit*iks_t))
        (trgsw/keyswitch.go:23)."""
        return 1 << (32 - (1 + self.basebit * self.iks_t))

    @property
    def mod_switch_offset(self) -> int:
        """Rounding offset for the 2N mod switch: 2^(31-NBIT-1)
        (evaluator/evaluator.go:116)."""
        return 1 << (31 - self.nbit - 1)

    @property
    def mod_switch_shift(self) -> int:
        """Right shift for the 2N mod switch: 32-NBIT-1
        (evaluator/evaluator.go:116)."""
        return 32 - self.nbit - 1

    @property
    def lut_size(self) -> int:
        """LookUpTableSize (lut/generator.go:19-21): poly_extend_factor * N."""
        return self.poly_extend_factor * self.n

    @property
    def block_count(self) -> int:
        """params/params.go:669-676."""
        if self.block_size <= 1:
            return self.lwe_n
        return (self.lwe_n + self.block_size - 1) // self.block_size

    @property
    def use_block_blind_rotation(self) -> bool:
        """params/params.go:679-681 (advertised; the reference never uses it)."""
        return self.block_size > 1

    @property
    def l_used(self) -> int:
        """Decomposition levels used on the TPU fast path."""
        return self.decomp_levels_used or self.l

    @property
    def digits_fit_int8(self) -> bool:
        """True when gadget digits lie in [-128, 128) and the int8 MXU
        external-product fast path is exact."""
        return self.half_bg <= 128

    @property
    def digit_limbs(self) -> int:
        """Number of base-256 signed limbs needed to represent a gadget
        digit exactly (see ops.polymul.split_signed_limbs_i8): 1 for
        BGBIT <= 8, 3 for the Uint profiles (BGBIT 18-23).

        For nd > 1 the final limb is the signed remainder after nd-1
        balanced extractions; |final| <= half_bg/256^(nd-1) + 129/255, so
        half_bg <= 64*256^(nd-1) keeps it safely inside int8."""
        if self.half_bg <= 128:
            return 1
        nd = 2
        while self.half_bg > 64 * (256 ** (nd - 1)):
            nd += 1
        return nd

    def __post_init__(self):
        assert self.n == 1 << self.nbit, (self.name, self.n, self.nbit)
        assert self.l * self.bgbit <= 32
        assert self.basebit * self.iks_t < 32


# ---------------------------------------------------------------------------
# Profile registry — numeric values copied from params/params.go:83-514.
# ---------------------------------------------------------------------------

P80 = TFHEParams(
    name="80bit",
    lwe_n=550, lwe_alpha=5.0e-5,
    n=1024, lv1_alpha=3.73e-8, nbit=10,
    bgbit=6, l=3, basebit=2, iks_t=7, block_size=3,
)

P110 = TFHEParams(
    name="110bit",
    lwe_n=630, lwe_alpha=3.0517578125e-05,
    n=1024, lv1_alpha=2.980232238769531e-8, nbit=10,
    bgbit=6, l=3, basebit=2, iks_t=8, block_size=3,
)

P128 = TFHEParams(
    name="128bit",
    lwe_n=700, lwe_alpha=2.0e-5,
    n=1024, lv1_alpha=2.0e-8, nbit=10,
    bgbit=6, l=3, basebit=2, iks_t=9, block_size=3,
)

UINT1 = TFHEParams(
    name="uint1",
    lwe_n=700, lwe_alpha=2.0e-05,
    n=1024, lv1_alpha=2.0e-08, nbit=10,
    bgbit=10, l=2, basebit=2, iks_t=8, block_size=3,
    message_modulus=2,
)

UINT2 = TFHEParams(
    name="uint2",
    lwe_n=687, lwe_alpha=0.00002120846893069971872305794214,
    n=512, lv1_alpha=0.00000000000231841227527049948463, nbit=9,
    bgbit=18, l=1, basebit=4, iks_t=3, block_size=3,
    message_modulus=4,
)

UINT3 = TFHEParams(
    name="uint3",
    lwe_n=820, lwe_alpha=0.00000251676160959795544987084234,
    n=1024, lv1_alpha=0.00000000000000022204460492503131, nbit=10,
    bgbit=23, l=1, basebit=6, iks_t=2, block_size=4,
    message_modulus=8,
)

UINT4 = TFHEParams(
    name="uint4",
    lwe_n=820, lwe_alpha=0.00000251676160959795544987084234,
    n=2048, lv1_alpha=0.00000000000000022204460492503131, nbit=11,
    bgbit=22, l=1, basebit=5, iks_t=3, block_size=4,
    message_modulus=16,
)

UINT5 = TFHEParams(
    name="uint5",
    lwe_n=1071, lwe_alpha=7.088226765410429399593757e-08,
    n=2048, lv1_alpha=2.2204460492503131e-17, nbit=11,
    bgbit=22, l=1, basebit=6, iks_t=3, block_size=7,
    message_modulus=32,
)

UINT6 = TFHEParams(
    name="uint6",
    lwe_n=1071, lwe_alpha=7.088226765410429399593757e-08,
    n=2048, lv1_alpha=2.2204460492503131e-17, nbit=11,
    bgbit=22, l=1, basebit=6, iks_t=3, block_size=7,
    message_modulus=64, poly_extend_factor=2,
)

UINT7 = TFHEParams(
    name="uint7",
    lwe_n=1160, lwe_alpha=1.966220007498402695211596e-08,
    n=2048, lv1_alpha=2.2204460492503131e-17, nbit=11,
    bgbit=22, l=1, basebit=7, iks_t=3, block_size=8,
    message_modulus=128, poly_extend_factor=4,
)

UINT8 = TFHEParams(
    name="uint8",
    lwe_n=1160, lwe_alpha=1.966220007498402695211596e-08,
    n=2048, lv1_alpha=2.2204460492503131e-17, nbit=11,
    bgbit=22, l=1, basebit=7, iks_t=3, block_size=8,
    message_modulus=256, poly_extend_factor=9,
)

# Small profile for fast CPU tests of the full bootstrap pipeline.  Not secure;
# noise/rounding margins chosen so boolean gates decrypt correctly:
# mod-switch error <= (lwe_n+1)/(4N) = 17/512 << 1/8.
TEST_FAST = TFHEParams(
    name="test_fast",
    lwe_n=16, lwe_alpha=1.0 / (1 << 20),
    n=128, lv1_alpha=1.0 / (1 << 28), nbit=7,
    bgbit=8, l=2, basebit=4, iks_t=6, block_size=1,
    message_modulus=2,
)

# Block-blind-rotation test profile: block_size=2 with a ragged tail
# (lwe_n=17 = 8 blocks + 1), exercising both the fused block step and the
# per-bit tail in blind_rotate_block(+_tpu).  Margins as TEST_FAST.
TEST_BLOCK = TFHEParams(
    name="test_block",
    lwe_n=17, lwe_alpha=1.0 / (1 << 20),
    n=128, lv1_alpha=1.0 / (1 << 28), nbit=7,
    bgbit=8, l=2, basebit=4, iks_t=6, block_size=2,
    message_modulus=2,
)

# Slightly larger test profile with a multi-bit message space for PBS tests.
TEST_PBS = TFHEParams(
    name="test_pbs",
    lwe_n=32, lwe_alpha=1.0 / (1 << 26),
    n=512, lv1_alpha=1.0 / (1 << 30), nbit=9,
    bgbit=8, l=3, basebit=4, iks_t=7, block_size=1,
    message_modulus=8,
)

# messageModulus=32 test profile (the Uint5 shape at toy sizes) for the PBS
# nibble adder.  Error budget: half-segment 1/128; mod-switch error
# (lwe_n+1)/(4N) ~= 0.0042 + decomposition tail lwe_n*N*2^-(l*bgbit+1)
# ~= 0.0005 stays well inside.
TEST_NIBBLE = TFHEParams(
    name="test_nibble",
    lwe_n=16, lwe_alpha=1.0 / (1 << 28),
    n=1024, lv1_alpha=1.0 / (1 << 32), nbit=10,
    bgbit=8, l=3, basebit=4, iks_t=7, block_size=1,
    message_modulus=32,
)

# Extended-LUT toy profiles (poly_extend_factor > 1): k=2 exercises the
# power-of-two mod switch, k=3 the general multiply-based one (the Uint8
# production profile has k=9, also non-power-of-two).
TEST_EXT2 = TFHEParams(
    name="test_ext2",
    lwe_n=16, lwe_alpha=1.0 / (1 << 28),
    n=256, lv1_alpha=1.0 / (1 << 31), nbit=8,
    bgbit=8, l=3, basebit=4, iks_t=6, block_size=1,
    message_modulus=16, poly_extend_factor=2,
)

TEST_EXT3 = TFHEParams(
    name="test_ext3",
    lwe_n=16, lwe_alpha=1.0 / (1 << 28),
    n=256, lv1_alpha=1.0 / (1 << 31), nbit=8,
    bgbit=8, l=3, basebit=4, iks_t=6, block_size=1,
    message_modulus=12, poly_extend_factor=3,
)

# Throughput-tuned variants: identical crypto parameters, with the lowest
# bootstrapping-key limb dropped and 2-of-3 decomposition levels used in
# the Pallas external product (see TFHEParams.kernel_limb_drop /
# decomp_levels_used for the noise analyses).  Keys are interchangeable
# with the base profiles (same shapes/distributions); only the TPU kernel
# differs.
P80_FAST = dataclasses.replace(P80, name="80bit_fast", kernel_limb_drop=1,
                               decomp_levels_used=2)
P110_FAST = dataclasses.replace(P110, name="110bit_fast", kernel_limb_drop=1,
                                decomp_levels_used=2)
P128_FAST = dataclasses.replace(P128, name="128bit_fast", kernel_limb_drop=1,
                                decomp_levels_used=2)

PROFILES: Dict[str, TFHEParams] = {
    p.name: p
    for p in (P80, P110, P128, P80_FAST, P110_FAST, P128_FAST,
              UINT1, UINT2, UINT3, UINT4, UINT5, UINT6,
              UINT7, UINT8, TEST_FAST, TEST_BLOCK, TEST_PBS, TEST_NIBBLE,
              TEST_EXT2, TEST_EXT3)
}

# Aliases mirroring the reference enum names (params/params.go:32-44).
PROFILES["Security80Bit"] = P80
PROFILES["Security110Bit"] = P110
PROFILES["Security128Bit"] = P128
for _i in range(1, 9):
    PROFILES[f"SecurityUint{_i}"] = PROFILES[f"uint{_i}"]

DEFAULT = P128


def get_params(name: str) -> TFHEParams:
    """Look a profile up by name ('128bit', 'uint5', 'Security80Bit', ...)."""
    try:
        return PROFILES[name]
    except KeyError:
        raise KeyError(
            f"unknown parameter profile {name!r}; available: "
            f"{sorted(set(p.name for p in PROFILES.values()))}") from None


def security_info(p: TFHEParams) -> str:
    """Human-readable description (params/params.go:639-666)."""
    descs = {
        "80bit": "80-bit security (performance-optimized)",
        "110bit": "110-bit security (balanced, original TFHE)",
        "128bit": "128-bit security (high security, quantum-resistant)",
    }
    if p.name.startswith("uint"):
        bits = p.name[4:]
        return (f"Uint{bits} parameters ({bits}-bit messages, "
                f"messageModulus={p.message_modulus}, N={p.n})")
    return descs.get(p.name, f"{p.name} (custom profile)")
