"""Encrypt → decrypt → compare ground truth for every ciphertext type
(mirrors the reference's inline tests, e.g. `glwe_encryption.rs` tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spf_tpu.ops import encryption as enc
from spf_tpu.ops import torus
from spf_tpu.params import (
    TEST_GLWE_DEF_1,
    TEST_LWE_DEF_1,
    TEST_RADIX,
)

KEY = jax.random.key(7)


class TestLwe:
    def test_encrypt_decrypt(self):
        lwe = TEST_LWE_DEF_1
        bits = 4
        sk = enc.generate_lwe_sk(jax.random.fold_in(KEY, 0), lwe)
        for trial in range(8):
            msg = trial * 2 + 1
            k = jax.random.fold_in(KEY, 100 + trial)
            ct = enc.encrypt_lwe(k, torus.encode(msg % 16, bits), sk, lwe)
            dec = torus.decode(enc.decrypt_lwe(ct, sk, lwe), bits)
            assert int(dec) == msg % 16

    def test_trivial(self):
        lwe = TEST_LWE_DEF_1
        ct = enc.trivial_lwe(torus.encode(3, 2), lwe)
        sk = enc.generate_lwe_sk(KEY, lwe)
        assert int(torus.decode(enc.decrypt_lwe(ct, sk, lwe), 2)) == 3

    def test_batched_encrypt(self):
        lwe = TEST_LWE_DEF_1
        bits = 4
        sk = enc.generate_lwe_sk(jax.random.fold_in(KEY, 0), lwe)
        msgs = jnp.arange(16, dtype=jnp.uint64)
        keys = jax.random.split(jax.random.fold_in(KEY, 1), 16)
        cts = jax.vmap(lambda k, m: enc.encrypt_lwe(k, torus.encode(m, bits), sk, lwe))(
            keys, msgs
        )
        dec = torus.decode(enc.decrypt_lwe(cts, sk, lwe), bits)
        np.testing.assert_array_equal(np.asarray(dec), np.asarray(msgs))


class TestGlwe:
    def test_encrypt_decrypt(self):
        glwe = TEST_GLWE_DEF_1
        bits = 4
        sk = enc.generate_glwe_sk(jax.random.fold_in(KEY, 2), glwe)
        msg = jnp.arange(glwe.degree, dtype=jnp.uint64) % 16
        ct = enc.encrypt_glwe(
            jax.random.fold_in(KEY, 3), torus.encode(msg, bits), sk, glwe
        )
        dec = torus.decode(enc.decrypt_glwe(ct, sk, glwe), bits)
        np.testing.assert_array_equal(np.asarray(dec), np.asarray(msg))

    def test_trivial(self):
        glwe = TEST_GLWE_DEF_1
        sk = enc.generate_glwe_sk(KEY, glwe)
        msg = jnp.arange(glwe.degree, dtype=jnp.uint64) % 4
        ct = enc.trivial_glwe(torus.encode(msg, 2), glwe)
        dec = torus.decode(enc.decrypt_glwe(ct, sk, glwe), 2)
        np.testing.assert_array_equal(np.asarray(dec), np.asarray(msg))

    def test_homomorphic_add_xor(self):
        # NOT and XOR on binary messages are plain GLWE addition
        # (reference `parasol_runtime/src/crypto/evaluation.rs:48-56`)
        glwe = TEST_GLWE_DEF_1
        sk = enc.generate_glwe_sk(jax.random.fold_in(KEY, 4), glwe)
        m1 = jnp.arange(glwe.degree, dtype=jnp.uint64) % 2
        m2 = (jnp.arange(glwe.degree, dtype=jnp.uint64) // 2) % 2
        c1 = enc.encrypt_glwe(jax.random.fold_in(KEY, 5), torus.encode(m1, 1), sk, glwe)
        c2 = enc.encrypt_glwe(jax.random.fold_in(KEY, 6), torus.encode(m2, 1), sk, glwe)
        dec = torus.decode(enc.decrypt_glwe(c1 + c2, sk, glwe), 1)
        np.testing.assert_array_equal(np.asarray(dec), np.asarray(m1 ^ m2))


class TestGlevGgsw:
    def test_glev_rows(self):
        glwe = TEST_GLWE_DEF_1
        sk = enc.generate_glwe_sk(jax.random.fold_in(KEY, 7), glwe)
        msg = jnp.arange(glwe.degree, dtype=jnp.uint64) % 8
        ct = enc.encrypt_glev(jax.random.fold_in(KEY, 8), msg, sk, glwe, TEST_RADIX)
        assert ct.shape == (TEST_RADIX.count, glwe.size + 1, glwe.degree)
        for j in range(TEST_RADIX.count):
            dec = enc.decrypt_glev_at(ct, sk, glwe, TEST_RADIX, j)
            np.testing.assert_array_equal(np.asarray(dec), np.asarray(msg))

    def test_ggsw_scalar(self):
        glwe = TEST_GLWE_DEF_1
        sk = enc.generate_glwe_sk(jax.random.fold_in(KEY, 9), glwe)
        for bit in [0, 1]:
            ct = enc.encrypt_ggsw_scalar(
                jax.random.fold_in(KEY, 10 + bit), bit, sk, glwe, TEST_RADIX
            )
            assert ct.shape == (
                glwe.size + 1,
                TEST_RADIX.count,
                glwe.size + 1,
                glwe.degree,
            )
            dec = enc.decrypt_ggsw(ct, sk, glwe, TEST_RADIX)
            assert int(dec[0]) == bit
            np.testing.assert_array_equal(np.asarray(dec[1:]), 0)

    def test_trivial_ggsw(self):
        glwe = TEST_GLWE_DEF_1
        sk = enc.generate_glwe_sk(jax.random.fold_in(KEY, 12), glwe)
        msg = jnp.zeros(glwe.degree, dtype=jnp.uint64).at[0].set(1)
        ct = enc.trivial_ggsw(msg, glwe, TEST_RADIX)
        dec = enc.decrypt_ggsw(ct, sk, glwe, TEST_RADIX)
        assert int(dec[0]) == 1
