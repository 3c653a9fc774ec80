"""Fused blind-rotate step kernel (ops/pallas_step.py), CI-covered in
interpret mode: must equal the two-kernel composition
(rotate_decompose_pallas -> extprod_pallas with fused accumulator)
bit-exactly, across offsets (floor/centered), limb drops, and profiles."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go_tfhe_tpu.ops import pallas_extprod, pallas_rotate, pallas_step

pallas_extprod.INTERPRET = True
pallas_rotate.INTERPRET = True
pallas_step.INTERPRET = True

import go_tfhe_tpu as tfhe  # noqa: E402
from go_tfhe_tpu.ops.blindrotate import blind_rotate, blind_rotate_tpu  # noqa: E402
from go_tfhe_tpu.ops.pallas_extprod import extprod_pallas, pack_bsk_band  # noqa: E402
from go_tfhe_tpu.ops.pallas_rotate import rotate_decompose_pallas  # noqa: E402
from go_tfhe_tpu.ops.pallas_step import fused_rotate_step  # noqa: E402
from go_tfhe_tpu.params import TFHEParams  # noqa: E402

RNG = np.random.default_rng(11)

BASE = TFHEParams(
    name="test_step",
    lwe_n=8, lwe_alpha=1.0 / (1 << 24),
    n=256, lv1_alpha=1.0 / (1 << 30), nbit=8,
    bgbit=8, l=2, basebit=4, iks_t=6, block_size=1,
)

CASES = [
    BASE,
    dataclasses.replace(BASE, name="test_step_centered",
                        centered_decomposition=True),
    dataclasses.replace(BASE, name="test_step_drop", key_grid_bits=8,
                        centered_decomposition=True, kernel_limb_drop=1),
    dataclasses.replace(BASE, name="test_step_l3", bgbit=6, l=3),
]


def _rand(shape, lo, hi, dtype):
    return jnp.asarray(RNG.integers(lo, hi, size=shape,
                                    dtype=np.int64).astype(dtype))


# The fused step kernel is the measured-off opt-in (blindrotate.FUSED_STEP);
# the base config guards it in the default tier, the variant gadgets run in
# the slow tier (they are the heaviest interpret-mode cases in the suite).
@pytest.mark.parametrize(
    "p", [c if c.name == "test_step" else
          pytest.param(c, marks=pytest.mark.slow) for c in CASES],
    ids=lambda p: p.name)
def test_fused_step_matches_two_kernel(p):
    b = 8
    acc = jnp.asarray(RNG.integers(
        0, 2 ** 32, size=(2, b, p.n), dtype=np.uint64).astype(np.uint32))
    if p.key_grid_bits:
        acc = acc & jnp.uint32(0xFFFFFFFF ^ ((1 << p.key_grid_bits) - 1))
    amounts = _rand((b,), 0, 2 * p.n + 1, np.int32)
    k_u32 = jnp.asarray(RNG.integers(
        0, 2 ** 32, size=(1, 2 * p.l, 2, p.n),
        dtype=np.uint64).astype(np.uint32))
    if p.key_grid_bits:
        k_u32 = k_u32 & jnp.uint32(0xFFFFFFFF ^ ((1 << p.key_grid_bits) - 1))
    band = pack_bsk_band(k_u32)[0]

    drop = p.kernel_limb_drop
    digits = rotate_decompose_pallas(p, acc, amounts, tb=b)
    want = extprod_pallas(digits, band, limb_mag=p.half_bg, tb=b,
                          drop_limbs=drop, dot_dtype="int8", acc=acc)
    got = fused_rotate_step(p, acc, amounts, band, tb=2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.slow
def test_fused_blind_rotate_matches_portable():
    """End-to-end: blind_rotate_tpu (now fused) == portable blind_rotate
    bit-exactly over all lwe_n steps with real keys."""
    p = dataclasses.replace(BASE, name="test_step_e2e", lwe_n=8)
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    sk = tfhe.gen_secret_key(k1, p)
    ck = tfhe.gen_cloud_key(k2, sk, p, bands="all")
    ct = jnp.asarray(RNG.integers(
        0, 2 ** 32, size=(8, p.lwe_n + 1), dtype=np.uint64).astype(np.uint32))
    ref = np.asarray(blind_rotate(p, ck.bsk_kernel, ct, ck.testvec))
    got = np.asarray(blind_rotate_tpu(p, ck.bsk_band, ct, ck.testvec,
                                      tb=2))
    np.testing.assert_array_equal(got, ref)
