"""Pallas TPU external-product kernel, executed off-TPU via interpret mode.

Covers every branch of ops/pallas_extprod.py bit-exactly against the
portable Toeplitz-einsum oracle (ops/polymul.py):

* nd=1 single-limb digits (the 80/110/128-bit shape),
* k_split > 1 (the f32 exactness split),
* block-fused row layouts (rows = block_size * 2L),
* nd=3 multi-limb digits with weight-skipping (the Uint2-5 shape),
* end-to-end blind_rotate_tpu == blind_rotate and the block variant.

``pallas_extprod.INTERPRET`` is set at import time (before any call traces)
so every pallas_call in this module runs in the CPU interpreter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go_tfhe_tpu.ops import pallas_extprod, pallas_rotate, pallas_t

pallas_extprod.INTERPRET = True
pallas_rotate.INTERPRET = True
pallas_t.INTERPRET = True

import go_tfhe_tpu as tfhe  # noqa: E402
from go_tfhe_tpu.ops.blindrotate import (blind_rotate, blind_rotate_block,  # noqa: E402
                                         blind_rotate_block_tpu,
                                         blind_rotate_t, blind_rotate_tpu)
from go_tfhe_tpu.ops.pallas_extprod import extprod_pallas, pack_bsk_band  # noqa: E402
from go_tfhe_tpu.ops.polymul import (ext_band_from_trgsw,  # noqa: E402
                                     negacyclic_extprod_toeplitz,
                                     split_signed_limbs_i8)
from go_tfhe_tpu.params import TFHEParams  # noqa: E402

# Pallas-eligible toy profile: N=256 (min for the tn=256 column tile),
# bgbit=8/l=3 makes half_bg=128 so k_split=2 is exercised
# (2L*N * 128 * 128 = 2^24.58 >= 2^24).  lwe_n=8 keeps the interpreted
# sequential loop short.
TEST_PALLAS = TFHEParams(
    name="test_pallas",
    lwe_n=8, lwe_alpha=1.0 / (1 << 24),
    n=256, lv1_alpha=1.0 / (1 << 30), nbit=8,
    bgbit=8, l=3, basebit=4, iks_t=6, block_size=1,
)

TEST_PALLAS_BLOCK = TFHEParams(
    name="test_pallas_block",
    lwe_n=9, lwe_alpha=1.0 / (1 << 24),
    n=256, lv1_alpha=1.0 / (1 << 30), nbit=8,
    bgbit=8, l=3, basebit=4, iks_t=6, block_size=2,
)

RNG = np.random.default_rng(7)


def _rand_trgsw(l2, n):
    return jnp.asarray(RNG.integers(
        0, 2 ** 32, size=(1, l2, 2, n), dtype=np.uint64).astype(np.uint32))


def _check_extprod(n, l2, b, limb_mag, k_split_expect=None,
                   dot_dtype="bf16"):
    k_u32 = _rand_trgsw(l2, n)
    digits = jnp.asarray(RNG.integers(
        -limb_mag, limb_mag, size=(b, l2, n), dtype=np.int8))
    band = pack_bsk_band(k_u32)[0]
    if k_split_expect is not None:
        ks = 1
        while (l2 * n // ks) * limb_mag * 128 >= pallas_extprod._EXACT_BOUND:
            ks *= 2
        assert ks == k_split_expect
    out = np.moveaxis(np.asarray(
        extprod_pallas(digits, band, limb_mag=limb_mag, tb=b,
                       dot_dtype=dot_dtype)), 0, 1)
    ref = np.asarray(negacyclic_extprod_toeplitz(
        digits.astype(jnp.int32), ext_band_from_trgsw(k_u32)[0]))
    np.testing.assert_array_equal(out, ref)


def test_extprod_nd1_single_limb():
    """128-bit-like shape (half_bg=32), k_split=1."""
    _check_extprod(n=256, l2=6, b=8, limb_mag=32, k_split_expect=1)


def test_extprod_nd1_k_split():
    """half_bg=128 digits force the f32 split-K branch (k_split=2)."""
    _check_extprod(n=256, l2=6, b=8, limb_mag=128, k_split_expect=2)


def test_extprod_block_rows():
    """Block-fused layout: rows = block_size*2L = 12 (bs=2, L=3)."""
    _check_extprod(n=256, l2=12, b=8, limb_mag=32)


def test_extprod_int8_dot():
    """The int8 MXU dot variant (used by the fused block path) is exact."""
    _check_extprod(n=256, l2=6, b=8, limb_mag=32, dot_dtype="int8")
    _check_extprod(n=256, l2=12, b=8, limb_mag=128, dot_dtype="int8")


def test_extprod_multi_limb_nd3():
    """Uint-profile digits (|d| <= 2^21) split into 3 signed limbs with
    weight-skipping (terms with limb weight >= 2^32 dropped)."""
    n, l2, b, nd = 256, 2, 8, 3
    half_bg = 1 << 21
    k_u32 = _rand_trgsw(l2, n)
    d32 = jnp.asarray(RNG.integers(
        -half_bg, half_bg, size=(b, l2, n), dtype=np.int64).astype(np.int32))
    digits = jnp.moveaxis(split_signed_limbs_i8(d32, nd), 0, 1)
    band = pack_bsk_band(k_u32)[0]
    out = np.moveaxis(np.asarray(
        extprod_pallas(digits, band, limb_mag=128, tb=b)), 0, 1)
    ref = np.asarray(negacyclic_extprod_toeplitz(
        d32, ext_band_from_trgsw(k_u32)[0]))
    np.testing.assert_array_equal(out, ref)


def test_extprod_limb_truncation_spec():
    """drop_limbs=1 must differ from the exact product by EXACTLY the
    dropped limb-0 contribution: out_exact = out_drop + digits (*) limb0(D)
    (mod 2^32) — a precise spec, not a tolerance."""
    n, l2, b = 256, 6, 8
    k_u32 = _rand_trgsw(l2, n)
    digits = jnp.asarray(RNG.integers(-32, 32, size=(b, l2, n),
                                      dtype=np.int8))
    band = pack_bsk_band(k_u32)[0]
    out_exact = np.moveaxis(np.asarray(
        extprod_pallas(digits, band, limb_mag=32, tb=b)), 0, 1)
    out_drop = np.moveaxis(np.asarray(
        extprod_pallas(digits, band, limb_mag=32, tb=b, drop_limbs=1)), 0, 1)
    # limb0 of D as an int32 band, contracted the portable way.
    from go_tfhe_tpu.ops.polymul import _neg_ext, split_balanced_limbs_i8
    from go_tfhe_tpu.utils.torus import to_signed
    d_band = _neg_ext(k_u32)[0]                          # (l2, 2, 2n) uint32
    limb0 = split_balanced_limbs_i8(to_signed(d_band), 4)[0].astype(jnp.int32)
    contrib = np.asarray(negacyclic_extprod_toeplitz(
        digits.astype(jnp.int32), limb0))
    np.testing.assert_array_equal(
        out_exact, (out_drop.astype(np.int64) + contrib) % (1 << 32))


def test_extprod_narrow_column_tile():
    """tn < the band's packed pad (the block path shrinks tn to fit VMEM)."""
    n, l2, b = 256, 6, 8
    k_u32 = _rand_trgsw(l2, n)
    digits = jnp.asarray(RNG.integers(-32, 32, size=(b, l2, n),
                                      dtype=np.int8))
    band = pack_bsk_band(k_u32)[0]
    out = np.moveaxis(np.asarray(
        extprod_pallas(digits, band, limb_mag=32, tb=b, tn=128)), 0, 1)
    ref = np.asarray(negacyclic_extprod_toeplitz(
        digits.astype(jnp.int32), ext_band_from_trgsw(k_u32)[0]))
    np.testing.assert_array_equal(out, ref)


def test_rotate_decompose_fused():
    """The fused rotate+decompose kernel == monomial_mul_log followed by
    gadget_decompose, bit-exactly, incl. multi-bit (block) layouts."""
    from go_tfhe_tpu.ops.decompose import gadget_decompose
    from go_tfhe_tpu.ops.pallas_rotate import rotate_decompose_pallas
    from go_tfhe_tpu.ops.rotate import monomial_mul_log
    p = TEST_PALLAS
    b = 8
    acc = jnp.asarray(RNG.integers(
        0, 2 ** 32, size=(2, b, p.n), dtype=np.uint64).astype(np.uint32))
    for bs in (1, 3):
        amounts = jnp.asarray(RNG.integers(
            0, 2 * p.n + 1, size=(bs, b), dtype=np.int64).astype(np.int32))
        got = np.asarray(rotate_decompose_pallas(p, acc, amounts, tb=b))
        # reference composition: per block bit, rotate (2,B,N) then digits
        refs = []
        for j in range(bs):
            rot = monomial_mul_log(acc, amounts[j][None, :])
            diff = jnp.moveaxis(rot - acc, 1, 0)          # (B, 2, N)
            refs.append(np.asarray(gadget_decompose(diff, p)))  # (B, 2L, N)
        ref = np.concatenate(refs, axis=1)                # (B, bs*2L, N)
        np.testing.assert_array_equal(got, ref, err_msg=f"bs={bs}")


def test_blind_rotate_tpu_matches_portable():
    """End-to-end: the Pallas blind rotate must equal the portable one
    bit-exactly (both are exact integer paths) on a Pallas-eligible
    profile, including the testvec rotation and all lwe_n steps."""
    p = TEST_PALLAS
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    sk = tfhe.gen_secret_key(k1, p)
    ck = tfhe.gen_cloud_key(k2, sk, p, bands="all")
    assert ck.bsk_band is not None
    b = 8
    ct = jnp.asarray(RNG.integers(
        0, 2 ** 32, size=(b, p.lwe_n + 1), dtype=np.uint64).astype(np.uint32))
    ref = np.asarray(blind_rotate(p, ck.bsk_kernel, ct, ck.testvec))
    got = np.asarray(blind_rotate_tpu(p, ck.bsk_band, ct, ck.testvec, tb=b))
    np.testing.assert_array_equal(got, ref)


def test_blind_rotate_fast_path_exact_drop():
    """The full fast-profile knob set at toy scale: on-grid keys
    (key_grid_bits=8) make kernel_limb_drop=1 BIT-EXACT — dropping the
    zero limb changes nothing — and the truth table decrypts."""
    import dataclasses
    from go_tfhe_tpu import cipher, engine
    p_grid = dataclasses.replace(TEST_PALLAS, name="test_pallas_grid",
                                 key_grid_bits=8,
                                 centered_decomposition=True)
    p_fast = dataclasses.replace(p_grid, name="test_pallas_gridfast",
                                 kernel_limb_drop=1)
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(9), 4)
    sk = tfhe.gen_secret_key(k1, p_grid)
    ck_ex = tfhe.gen_cloud_key(k2, sk, p_grid, bands="all")
    # on-grid BSK: every coefficient is a multiple of 2^8
    assert (np.asarray(ck_ex.bsk) % 256 == 0).all()
    ck_fast = dataclasses.replace(ck_ex, params=p_fast)
    bits_a = np.array([False, True] * 4)
    bits_b = np.array([False, False, True, True] * 2)
    ct_a = cipher.lwe_encrypt_bool(k3, bits_a, p_fast.lwe_alpha, sk.lv0)
    ct_b = cipher.lwe_encrypt_bool(k4, bits_b, p_fast.lwe_alpha, sk.lv0)
    prepared = engine.prepare_nand(ct_a, ct_b)
    from go_tfhe_tpu.ops.keyswitch import identity_key_switch
    from go_tfhe_tpu.ops.sample_extract import sample_extract

    def boot(p, ck):
        rot = blind_rotate_tpu(p, ck.bsk_band, prepared, ck.testvec, tb=8)
        return identity_key_switch(p, ck.ksk, sample_extract(rot, 0))

    out_ex = boot(p_grid, ck_ex)
    out_fast = boot(p_fast, ck_fast)
    want = ~(bits_a & bits_b)
    np.testing.assert_array_equal(
        np.asarray(cipher.lwe_decrypt_bool(out_fast, sk.lv0)), want)
    # the dropped limb is identically zero => bit-exact
    np.testing.assert_array_equal(np.asarray(out_fast), np.asarray(out_ex))
    # and the portable path agrees bit-exactly too (same centered offset)
    ref = np.asarray(blind_rotate(p_grid, ck_ex.bsk_kernel, prepared,
                                  ck_ex.testvec))
    got = np.asarray(blind_rotate_tpu(p_grid, ck_ex.bsk_band, prepared,
                                      ck_ex.testvec, tb=8))
    np.testing.assert_array_equal(got, ref)


def test_blind_rotate_block_tpu_matches_portable():
    """Block-fused Pallas blind rotate (incl. ragged tail) == portable
    block path, bit-exactly."""
    p = TEST_PALLAS_BLOCK
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    sk = tfhe.gen_secret_key(k1, p, block_binary=True)
    ck = tfhe.gen_cloud_key(k2, sk, p, bands="all")
    assert ck.bsk_band is not None
    b = 8
    ct = jnp.asarray(RNG.integers(
        0, 2 ** 32, size=(b, p.lwe_n + 1), dtype=np.uint64).astype(np.uint32))
    ref = np.asarray(blind_rotate_block(p, ck.bsk_kernel, ct, ck.testvec))
    got = np.asarray(blind_rotate_block_tpu(p, ck.bsk_band, ct, ck.testvec,
                                            tb=b))
    np.testing.assert_array_equal(got, ref)


# The TPU-tuned gadget of the production *_fast profiles (bgbit=8, l=2 —
# see params.P128_FAST) at toy sizes: the complete 2-level decomposition
# with half_bg=128 digits must ride the same kernel branches bit-exactly.
TEST_PALLAS_BG8 = TFHEParams(
    name="test_pallas_bg8",
    lwe_n=8, lwe_alpha=1.0 / (1 << 24),
    n=256, lv1_alpha=1.0 / (1 << 30), nbit=8,
    bgbit=8, l=2, basebit=4, iks_t=6, block_size=1,
)


def test_blind_rotate_tpu_bg8_gadget_matches_portable():
    """The fast-profile gadget shape (bgbit=8, l=2): Pallas == portable
    bit-exactly, and a NAND truth table decrypts end-to-end."""
    from go_tfhe_tpu import cipher, engine
    from go_tfhe_tpu.ops.keyswitch import identity_key_switch
    from go_tfhe_tpu.ops.sample_extract import sample_extract
    p = TEST_PALLAS_BG8
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(21), 4)
    sk = tfhe.gen_secret_key(k1, p)
    ck = tfhe.gen_cloud_key(k2, sk, p, bands="all")
    ct = jnp.asarray(RNG.integers(
        0, 2 ** 32, size=(8, p.lwe_n + 1), dtype=np.uint64).astype(np.uint32))
    ref = np.asarray(blind_rotate(p, ck.bsk_kernel, ct, ck.testvec))
    got = np.asarray(blind_rotate_tpu(p, ck.bsk_band, ct, ck.testvec, tb=8))
    np.testing.assert_array_equal(got, ref)

    bits_a = np.array([False, True] * 4)
    bits_b = np.array([False, False, True, True] * 2)
    ct_a = cipher.lwe_encrypt_bool(k3, bits_a, p.lwe_alpha, sk.lv0)
    ct_b = cipher.lwe_encrypt_bool(k4, bits_b, p.lwe_alpha, sk.lv0)
    prepared = engine.prepare_nand(ct_a, ct_b)
    rot = blind_rotate_tpu(p, ck.bsk_band, prepared, ck.testvec, tb=8)
    out = identity_key_switch(p, ck.ksk, sample_extract(rot, 0))
    np.testing.assert_array_equal(
        np.asarray(cipher.lwe_decrypt_bool(out, sk.lv0)),
        ~(bits_a & bits_b))


def test_rotate_decompose_multi_limb_matches_oracle():
    """nd>1 (wide Uint gadgets): the in-kernel base-256 limb split must
    equal rotate -> gadget_decompose -> split_signed_limbs_i8 bit-exactly,
    and blind_rotate_tpu must stay bit-exact with the portable path."""
    import dataclasses

    from go_tfhe_tpu.ops.blindrotate import _pallas_digits
    from go_tfhe_tpu.ops.pallas_rotate import rotate_decompose_pallas
    from go_tfhe_tpu.ops.rotate import monomial_mul
    p = TFHEParams(
        name="test_pallas_uint",
        lwe_n=4, lwe_alpha=1.0 / (1 << 24),
        n=256, lv1_alpha=1.0 / (1 << 30), nbit=8,
        bgbit=18, l=1, basebit=4, iks_t=3, block_size=1,
        message_modulus=4)
    assert p.digit_limbs == 3
    b = 8
    acc = jnp.asarray(RNG.integers(
        0, 2 ** 32, size=(2, b, p.n), dtype=np.uint64).astype(np.uint32))
    amounts = jnp.asarray(RNG.integers(0, 2 * p.n + 1, size=(b,),
                                       dtype=np.int64).astype(np.int32))
    got = rotate_decompose_pallas(p, acc, amounts, tb=b)
    assert got.shape == (b, 3, 2 * p.l, p.n)
    shifts = jnp.asarray([32 - (i + 1) * p.bgbit for i in range(p.l)],
                         dtype=jnp.uint32)
    rotated = monomial_mul(
        jnp.moveaxis(acc, 1, 0), amounts[:, None])      # (B, 2, N)
    diff = jnp.moveaxis(rotated, 0, 1) - acc            # (2, B, N)
    want, limb_mag = _pallas_digits(p, shifts, diff)
    assert limb_mag == 128
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_blind_rotate_t_matches_portable():
    """The TRANSPOSED per-bit path (ops/pallas_t.py) == the portable blind
    rotate bit-exactly, end-to-end including the testvec rotation."""
    p = TEST_PALLAS
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    sk = tfhe.gen_secret_key(k1, p)
    ck = tfhe.gen_cloud_key(k2, sk, p, bands="all")
    assert ck.bsk_band_rev is not None
    b = 8
    ct = jnp.asarray(RNG.integers(
        0, 2 ** 32, size=(b, p.lwe_n + 1), dtype=np.uint64).astype(np.uint32))
    ref = np.asarray(blind_rotate(p, ck.bsk_kernel, ct, ck.testvec))
    got = np.asarray(blind_rotate_t(p, ck.bsk_band_rev, ct, ck.testvec,
                                    tb=b))
    np.testing.assert_array_equal(got, ref)


def test_blind_rotate_t_bg8_drop_matches_row_major():
    """Transposed path at the fast-profile gadget shape (bgbit=8/l=2,
    on-grid keys, kernel_limb_drop=1) == the row-major Pallas path."""
    import dataclasses
    p = dataclasses.replace(TEST_PALLAS_BG8, name="test_pallas_t_bg8",
                            kernel_limb_drop=1, key_grid_bits=8,
                            centered_decomposition=True)
    k1, k2 = jax.random.split(jax.random.PRNGKey(13))
    sk = tfhe.gen_secret_key(k1, p)
    ck = tfhe.gen_cloud_key(k2, sk, p, bands="all")
    b = 8
    ct = jnp.asarray(RNG.integers(
        0, 2 ** 32, size=(b, p.lwe_n + 1), dtype=np.uint64).astype(np.uint32))
    ref = np.asarray(blind_rotate_tpu(p, ck.bsk_band, ct, ck.testvec, tb=b))
    got = np.asarray(blind_rotate_t(p, ck.bsk_band_rev, ct, ck.testvec,
                                    tb=b))
    np.testing.assert_array_equal(got, ref)


def test_blind_rotate_t_multilimb_matches_portable():
    """Transposed path with WIDE digits (bgbit=18 -> nd=3 limb planes,
    the Uint2-5 shape) == portable blind rotate bit-exactly."""
    p = TFHEParams(
        name="test_pallas_t_wide",
        lwe_n=6, lwe_alpha=1.0 / (1 << 26),
        n=256, lv1_alpha=1.0 / (1 << 30), nbit=8,
        bgbit=18, l=1, basebit=4, iks_t=6, block_size=1,
        message_modulus=8)
    k1, k2 = jax.random.split(jax.random.PRNGKey(17))
    sk = tfhe.gen_secret_key(k1, p)
    ck = tfhe.gen_cloud_key(k2, sk, p, bands="all")
    assert ck.bsk_band_rev is not None
    b = 8
    ct = jnp.asarray(RNG.integers(
        0, 2 ** 32, size=(b, p.lwe_n + 1), dtype=np.uint64).astype(np.uint32))
    ref = np.asarray(blind_rotate(p, ck.bsk_kernel, ct, ck.testvec))
    got = np.asarray(blind_rotate_t(p, ck.bsk_band_rev, ct, ck.testvec,
                                    tb=b))
    np.testing.assert_array_equal(got, ref)
