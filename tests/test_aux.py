"""Aux subsystems: recryption OTP, safe serialization, noise
measurement (SURVEY §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spf_tpu.params import GlweDef, LweDef, Params, RadixDecomposition
from spf_tpu.runtime import Encryption, Evaluation, generate_keys
from spf_tpu.runtime.recryption import (
    decrypt_one_time_pad,
    generate_one_time_pad,
    recrypt_one_time_pad,
)
from spf_tpu.utils import noise, serialization

TEST_PARAMS = Params(
    l0_params=LweDef(dim=128, std=1e-16),
    l1_params=GlweDef(size=1, degree=256, std=1e-16),
    cbs_radix=RadixDecomposition(count=2, radix_log=9),
    pbs_radix=RadixDecomposition(count=2, radix_log=16),
    ks_radix=RadixDecomposition(count=9, radix_log=4),
    pfks_radix=RadixDecomposition(count=4, radix_log=11),
    ss_radix=RadixDecomposition(count=6, radix_log=8),
    tr_radix=RadixDecomposition(count=6, radix_log=7),
)

KEY = jax.random.key(909)


@pytest.fixture(scope="module")
def material():
    sk, pk, ck = generate_keys(KEY, TEST_PARAMS)
    ev = Evaluation(ck, TEST_PARAMS, precompute_constants=False)
    return sk, pk, ev


class TestRecryption:
    def test_otp_roundtrip(self, material):
        sk, pk, ev = material
        n = TEST_PARAMS.l1_params.degree
        msg = jnp.asarray(np.random.default_rng(3).integers(0, 2, n, dtype=np.uint64))
        ct = ev.enc.encrypt_glwe_l1(jax.random.fold_in(KEY, 1), msg, sk)
        public, secret = generate_one_time_pad(jax.random.fold_in(KEY, 2), ev.enc, pk)
        recrypted = recrypt_one_time_pad(ct, public)
        # the decrypting party sees only msg ^ pad...
        padded = ev.enc.decrypt_glwe_l1(recrypted, sk)
        assert not np.array_equal(np.asarray(padded), np.asarray(msg))
        # ...and the pad holder recovers the message
        recovered = decrypt_one_time_pad(padded, secret)
        np.testing.assert_array_equal(np.asarray(recovered), np.asarray(msg))


class TestSerialization:
    def test_roundtrip_all_kinds(self, material):
        sk, _, ev = material
        p = TEST_PARAMS
        cts = {
            "lwe0": ev.enc.encrypt_lwe_l0(jax.random.fold_in(KEY, 3), 1, sk),
            "glwe1": ev.enc.trivial_glwe_l1_one(),
            "lwe0_sk": sk.lwe_0,
            "glwe1_sk": sk.glwe_1,
        }
        for kind, ct in cts.items():
            data = serialization.serialize(kind, ct, p)
            back = serialization.deserialize(data, kind, p)
            np.testing.assert_array_equal(back, np.asarray(ct))

    def test_rejects_wrong_shape(self, material):
        p = TEST_PARAMS
        bad = np.zeros((3, 3), dtype=np.uint64)
        with pytest.raises(serialization.DeserializationError):
            serialization.serialize("glwe1", bad, p)

    def test_rejects_oversized_payload(self, material):
        p = TEST_PARAMS
        blob = serialization.serialize(
            "glwe1", np.zeros((2, 256), dtype=np.uint64), p
        )
        huge = blob + b"\x00" * (10 * 1024 * 1024)
        with pytest.raises(serialization.DeserializationError):
            serialization.deserialize(huge, "glwe1", p)

    def test_rejects_kind_mismatch(self, material):
        sk, _, ev = material
        p = TEST_PARAMS
        blob = serialization.serialize("lwe0_sk", sk.lwe_0, p)
        with pytest.raises(serialization.DeserializationError):
            serialization.deserialize(blob, "lwe0", p)


class TestNoise:
    def test_encryption_noise_matches_sigma(self, material):
        sk, _, _ = material
        stats = noise.measure_encryption_noise(jax.random.fold_in(KEY, 7), sk, TEST_PARAMS)
        # sigma = 1e-16 * 2^64 ~ 2^10.85; measured log2 std should be close
        assert 9.5 < stats.log2_std < 12.5, stats

    def test_cmux_noise_grows_with_depth(self, material):
        sk, _, ev = material
        stats = noise.measure_cmux_noise(
            jax.random.fold_in(KEY, 8), sk, ev, TEST_PARAMS, depth=4, trials=2
        )
        assert len(stats) == 4
        # noise is far below the message bit (2^63)
        assert all(s.log2_max < 55 for s in stats), stats
        # and nondecreasing-ish with depth
        assert stats[-1].log2_std >= stats[0].log2_std - 1.0
