"""Extended-LUT Pallas path (ops/pallas_ext.py), off-TPU via interpret mode.

Bit-exactness of the fused big-accumulator rotation+decomposition against
the portable composition (rotate.monomial_mul_blocks + decompose), and of
the full blind_rotate_extended_tpu against blind_rotate_extended — the
polyExtendFactor capability the reference never implemented
(params/UINT_STATUS.md:20-31).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go_tfhe_tpu.ops import pallas_ext, pallas_extprod

pallas_ext.INTERPRET = True
pallas_extprod.INTERPRET = True

import go_tfhe_tpu as tfhe  # noqa: E402
from go_tfhe_tpu import cipher, engine, lut  # noqa: E402
from go_tfhe_tpu.ops.blindrotate import (blind_rotate_extended,  # noqa: E402
                                         blind_rotate_extended_tpu)
from go_tfhe_tpu.ops.decompose import gadget_decompose  # noqa: E402
from go_tfhe_tpu.ops.pallas_ext import rotate_decompose_ext_pallas  # noqa: E402
from go_tfhe_tpu.ops.rotate import monomial_mul_blocks  # noqa: E402
from go_tfhe_tpu.params import TFHEParams  # noqa: E402

RNG = np.random.default_rng(11)

# Multi-limb extended toy profile (the Uint6-8 digit shape: bgbit > 8 ->
# nd = 3 limb planes) with a non-power-of-two k.
TEST_EXT_WIDE = TFHEParams(
    name="test_ext_wide",
    lwe_n=6, lwe_alpha=1.0 / (1 << 28),
    n=256, lv1_alpha=1.0 / (1 << 31), nbit=8,
    bgbit=18, l=1, basebit=4, iks_t=6, block_size=1,
    message_modulus=8, poly_extend_factor=3,
)


def _rand_acc(b, k, n):
    return jnp.asarray(RNG.integers(
        0, 2 ** 32, size=(b, k, 2, n), dtype=np.uint64).astype(np.uint32))


@pytest.mark.parametrize("p", [tfhe.TEST_EXT2, tfhe.TEST_EXT3,
                               TEST_EXT_WIDE], ids=lambda p: p.name)
def test_rotate_decompose_ext_matches_portable(p):
    """Kernel digits == decompose(monomial_mul_blocks(acc, t) - acc),
    bit-exactly, for per-ciphertext amounts across the whole [0, 2kN)
    range including block-permutation wraps."""
    k, n, nd, l2 = p.poly_extend_factor, p.n, p.digit_limbs, 2 * p.l
    b = 8
    acc = _rand_acc(b, k, n)                                   # (B, k, 2, N)
    big = 2 * k * n
    t = jnp.asarray(RNG.integers(0, big, size=(b,)), jnp.int32)
    t = t.at[0].set(0).at[1].set(big - 1).at[2].set(k * n)

    rotated = monomial_mul_blocks(acc, t, k)                   # (B, k, 2, N)
    ref = gadget_decompose(rotated - acc, p)                   # (B, k, 2L, N)
    if nd > 1:
        from go_tfhe_tpu.ops.polymul import split_signed_limbs_i8
        ref_d = np.moveaxis(np.asarray(
            split_signed_limbs_i8(ref.astype(jnp.int32), nd)), 0, 2)
    else:
        ref_d = np.asarray(ref)[:, :, None].astype(np.int8)    # (B,k,1,2L,N)

    acc_k = jnp.moveaxis(acc, -2, 0).reshape(2, b, k * n)
    got = rotate_decompose_ext_pallas(p, acc_k, t, tb=b)
    got = np.asarray(got).reshape(b, k, nd, l2, n)
    np.testing.assert_array_equal(got, ref_d)


@pytest.mark.parametrize(
    "p", [tfhe.TEST_EXT2,
          pytest.param(TEST_EXT_WIDE, marks=pytest.mark.slow)],
    ids=lambda p: p.name)
def test_blind_rotate_extended_tpu_matches_portable(p):
    """End-to-end: Pallas extended blind rotate == portable extended blind
    rotate bit-exactly (both are exact integer paths)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    sk = tfhe.gen_secret_key(k1, p)
    ck = tfhe.gen_cloud_key(k2, sk, p, bands="all")
    assert ck.bsk_band is not None
    b = 8
    ct = jnp.asarray(RNG.integers(
        0, 2 ** 32, size=(b, p.lwe_n + 1), dtype=np.uint64).astype(np.uint32))
    lut_blocks = ck.testvec                                   # (k, 2, N)
    ref = np.asarray(blind_rotate_extended(p, ck.bsk_kernel, ct, lut_blocks))
    got = np.asarray(blind_rotate_extended_tpu(p, ck.bsk_band, ct,
                                               lut_blocks))
    np.testing.assert_array_equal(got, ref)


def test_extended_pbs_end_to_end_interpret():
    """Full PBS through engine._bootstrap_core_ext_tpu semantics: run the
    TPU core directly (interpret mode) and check decryption against the
    identity LUT on TEST_EXT2."""
    p = tfhe.TEST_EXT2
    m = p.message_modulus
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(9), 3)
    sk = tfhe.gen_secret_key(k1, p)
    ck = tfhe.gen_cloud_key(k2, sk, p, bands="all")
    msgs = np.arange(8) % m
    ct = cipher.lwe_encrypt_message(k3, msgs, m, p.lwe_alpha, sk.lv0)
    lut_blocks = lut.Generator(p, m).gen_lut(lambda x: (x + 1) % m)
    out = engine._bootstrap_core_ext_tpu(p, True, ck.bsk_band, ck.ksk,
                                         ct, jnp.asarray(lut_blocks))
    dec = np.asarray(cipher.lwe_decrypt_message(out, m, sk.lv0))
    np.testing.assert_array_equal(dec, (msgs + 1) % m)


@pytest.mark.parametrize("p", [tfhe.TEST_EXT2, TEST_EXT_WIDE],
                         ids=lambda p: p.name)
def test_blind_rotate_extended_t_matches_portable(p):
    """TRANSPOSED extended blind rotate (ops/pallas_t.py) == portable
    extended blind rotate bit-exactly (k=2 single-limb and k=3 wide-digit
    shapes)."""
    from go_tfhe_tpu.ops import pallas_t
    pallas_t.INTERPRET = True
    from go_tfhe_tpu.ops.blindrotate import blind_rotate_extended_t
    k1, k2 = jax.random.split(jax.random.PRNGKey(23))
    sk = tfhe.gen_secret_key(k1, p)
    ck = tfhe.gen_cloud_key(k2, sk, p, bands="all")
    assert ck.bsk_band_rev is not None
    b = 8
    ct = jnp.asarray(RNG.integers(
        0, 2 ** 32, size=(b, p.lwe_n + 1), dtype=np.uint64).astype(np.uint32))
    lut_blocks = ck.testvec
    ref = np.asarray(blind_rotate_extended(p, ck.bsk_kernel, ct, lut_blocks))
    got = np.asarray(blind_rotate_extended_t(p, ck.bsk_band_rev, ct,
                                             lut_blocks, tb=b))
    np.testing.assert_array_equal(got, ref)
