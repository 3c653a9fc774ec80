"""Half-batch pipelined blind rotate (ops/pallas_pipe.py) — bit-exactness
against the portable path, via the Pallas interpreter on CPU.

The kernel fuses half-X's MXU contraction with half-Y's VPU rotation in
one cell body (the round-5 VPU/MXU overlap probe); interleaving must not
change a single bit of either half's pipeline.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go_tfhe_tpu.ops import pallas_pipe, pallas_t

pallas_pipe.INTERPRET = True
pallas_t.INTERPRET = True

import go_tfhe_tpu as tfhe  # noqa: E402
from go_tfhe_tpu import cipher, engine  # noqa: E402
from go_tfhe_tpu.ops.blindrotate import blind_rotate  # noqa: E402
from go_tfhe_tpu.ops.pallas_pipe import blind_rotate_pipe  # noqa: E402
from go_tfhe_tpu.params import TFHEParams  # noqa: E402

TEST_PALLAS = TFHEParams(
    name="test_pallas",
    lwe_n=8, lwe_alpha=1.0 / (1 << 24),
    n=256, lv1_alpha=1.0 / (1 << 30), nbit=8,
    bgbit=8, l=3, basebit=4, iks_t=6, block_size=1,
)

RNG = np.random.default_rng(31)


@pytest.mark.parametrize("rot_first,interleave",
                         [(False, False), (True, False), (False, True)],
                         ids=["dot_first", "rot_first", "interleave"])
def test_blind_rotate_pipe_matches_portable(rot_first, interleave):
    p = TEST_PALLAS
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    sk = tfhe.gen_secret_key(k1, p)
    ck = tfhe.gen_cloud_key(k2, sk, p, bands="all")
    b = 16
    ct = jnp.asarray(RNG.integers(
        0, 2 ** 32, size=(b, p.lwe_n + 1), dtype=np.uint64).astype(np.uint32))
    ref = np.asarray(blind_rotate(p, ck.bsk_kernel, ct, ck.testvec))
    got = np.asarray(blind_rotate_pipe(p, ck.bsk_band_rev, ct, ck.testvec,
                                       rot_first=rot_first,
                                       interleave=interleave))
    np.testing.assert_array_equal(got, ref)


def test_blind_rotate_pipe_limb_drop_grid_key():
    """On-grid key (key_grid_bits=8) + kernel_limb_drop=1 (lo=1): the pipe
    kernel's dropped-limb path stays bit-exact with the portable path."""
    import dataclasses
    p = dataclasses.replace(TEST_PALLAS, name="test_pallas_pipe_grid",
                            key_grid_bits=8, kernel_limb_drop=1,
                            centered_decomposition=True)
    k1, k2 = jax.random.split(jax.random.PRNGKey(9))
    sk = tfhe.gen_secret_key(k1, p)
    ck = tfhe.gen_cloud_key(k2, sk, p, bands="all")
    b = 16
    ct = jnp.asarray(RNG.integers(
        0, 2 ** 32, size=(b, p.lwe_n + 1), dtype=np.uint64).astype(np.uint32))
    ref = np.asarray(blind_rotate(p, ck.bsk_kernel, ct, ck.testvec))
    got = np.asarray(blind_rotate_pipe(p, ck.bsk_band_rev, ct, ck.testvec))
    np.testing.assert_array_equal(got, ref)


def test_pipe_bootstrap_decrypts():
    """Pipelined blind rotate -> extract -> key switch decrypts the NAND
    truth table (per-ciphertext testvecs exercise the per-half split)."""
    from go_tfhe_tpu.ops.keyswitch import identity_key_switch
    from go_tfhe_tpu.ops.sample_extract import sample_extract

    p = TEST_PALLAS
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(5), 4)
    sk = tfhe.gen_secret_key(k1, p)
    ck = tfhe.gen_cloud_key(k2, sk, p, bands="all")
    bits_a = np.resize([False, True], 16)
    bits_b = np.resize([False, False, True, True], 16)
    ct_a = cipher.lwe_encrypt_bool(k3, bits_a, p.lwe_alpha, sk.lv0)
    ct_b = cipher.lwe_encrypt_bool(k4, bits_b, p.lwe_alpha, sk.lv0)
    prepared = engine.prepare_nand(ct_a, ct_b)
    rot = blind_rotate_pipe(p, ck.bsk_band_rev, prepared, ck.testvec)
    out = identity_key_switch(p, ck.ksk, sample_extract(rot, 0))
    dec = np.asarray(cipher.lwe_decrypt_bool(out, sk.lv0))
    np.testing.assert_array_equal(dec, ~(bits_a & bits_b))
