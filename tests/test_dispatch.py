"""Engine dispatch and key band-selection matrix.

The engine routes each (profile, key) pair to one of six Pallas cores or
the portable path (engine._tpu_core_choice), and keygen materializes only
the band layouts that routing can reach (keys._band_selection).  These
tests pin the matrix so a refactor cannot silently change which kernel a
profile runs on or reintroduce the double-band memory cost (ADVICE r4)."""

import jax
import numpy as np
import pytest

import go_tfhe_tpu as tfhe
from go_tfhe_tpu import engine
from go_tfhe_tpu.keys import _band_selection
from go_tfhe_tpu.ops.pallas_t import ext_t_fits


def test_band_selection_matrix():
    sel = _band_selection
    # plain boolean / uint profiles: transposed band only
    assert sel(tfhe.P128, False, "auto") == (False, True)
    assert sel(tfhe.get_params("128bit_fast"), False, "auto") == (False, True)
    assert sel(tfhe.get_params("uint5"), False, "auto") == (False, True)
    # block-binary key: row-major band additionally (block kernel opt-in)
    assert sel(tfhe.P128, True, "auto") == (True, True)
    # wide-digit profiles don't fit the int8 block kernel: rev only
    assert sel(tfhe.get_params("uint5"), True, "auto") == (False, True)
    # extended profiles: exactly ONE band, chosen by VMEM fit
    for name in ("uint6", "uint7", "uint8"):
        p = tfhe.get_params(name)
        fits = ext_t_fits(p)
        assert sel(p, False, "auto") == (not fits, fits), name
    assert ext_t_fits(tfhe.get_params("uint6"))          # transposed
    assert not ext_t_fits(tfhe.get_params("uint8"))      # k=9: row-major
    # non-Pallas-eligible degree: nothing
    assert sel(tfhe.TEST_FAST, False, "auto") == (False, False)
    # bands='all' keeps both for kernel cross-checks
    assert sel(tfhe.P128, False, "all") == (True, True)


def test_core_choice_matrix(monkeypatch):
    """Which jitted core each key routes to (TPU path forced on)."""
    monkeypatch.setattr(engine, "_use_tpu_path",
                        lambda p: p.n % 256 == 0)
    p = tfhe.get_params("test_pbs")        # N=512, single-limb digits
    k1, k2 = jax.random.split(jax.random.PRNGKey(51))
    sk = tfhe.gen_secret_key(k1, p)
    ck = tfhe.gen_cloud_key(k2, sk, p)
    core, band = engine._tpu_core_choice(ck)
    assert core is engine._bootstrap_core_t          # transposed default
    assert band is ck.bsk_band_rev

    monkeypatch.setattr(engine, "PREFER_PIPE", True)
    core, _ = engine._tpu_core_choice(ck)
    assert core is engine._bootstrap_core_pipe       # opt-in pipe probe
    monkeypatch.setattr(engine, "PREFER_PIPE", False)

    # extended profile -> the one extended core matching its band
    pe = tfhe.TEST_EXT2
    ske = tfhe.gen_secret_key(k1, pe)
    cke = tfhe.gen_cloud_key(k2, ske, pe)
    core, band = engine._tpu_core_choice(cke)
    if cke.bsk_band_rev is not None:
        assert core is engine._bootstrap_core_ext_t
    else:
        assert core is engine._bootstrap_core_ext_tpu

    # block-binary key: per-bit transposed by default, block kernel opt-in
    # (TEST_BLOCK's N=128 is not Pallas-eligible; use an N=256 variant)
    import dataclasses
    pb = dataclasses.replace(tfhe.TEST_BLOCK, name="test_block_pallas",
                             n=256, nbit=8)
    skb = tfhe.gen_secret_key(k1, pb, block_binary=True)
    ckb = tfhe.gen_cloud_key(k2, skb, pb)
    core, _ = engine._tpu_core_choice(ckb)
    assert core in (engine._bootstrap_core_t, engine._bootstrap_core_pipe)
    monkeypatch.setattr(engine, "PREFER_BLOCK_ROTATION", True)
    core, band = engine._tpu_core_choice(ckb)
    assert core is engine._bootstrap_core_block_tpu
    assert band is ckb.bsk_band

    # non-eligible profile -> portable
    pf = tfhe.TEST_FAST
    skf = tfhe.gen_secret_key(k1, pf)
    ckf = tfhe.gen_cloud_key(k2, skf, pf)
    assert engine._tpu_core_choice(ckf) is None
