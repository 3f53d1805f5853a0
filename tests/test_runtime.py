"""Runtime layer: keygen, Encryption, Evaluation, and the full
ciphertext conversion ring L1 GLWE -> L1 LWE -> L0 LWE -> (CBS) ->
L1 GGSW -> (CMux) -> L1 GLWE (SURVEY §"What SPF is"; reference
`parasol_runtime/src/params.rs:18-51`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spf_tpu.params import GlweDef, LweDef, Params, RadixDecomposition
from spf_tpu.runtime import Encryption, Evaluation, generate_keys

# test-size parameter set with the DEFAULT_128 structure (k=1 so the
# RLWE public key exists, like production)
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

KEY = jax.random.key(31337)


@pytest.fixture(scope="module")
def material():
    sk, pk, ck = generate_keys(KEY, TEST_PARAMS)
    ev = Evaluation(ck, TEST_PARAMS)
    return sk, pk, ck, ev


class TestRuntime:
    def test_bit_roundtrip_l0(self, material):
        sk, _, _, ev = material
        for bit in [0, 1]:
            ct = ev.enc.encrypt_lwe_l0(jax.random.fold_in(KEY, bit), bit, sk)
            assert int(ev.enc.decrypt_lwe_l0(ct, sk)) == bit

    def test_not_xor(self, material):
        sk, _, _, ev = material
        n = TEST_PARAMS.l1_params.degree
        m1 = jnp.arange(n, dtype=jnp.uint64) % 2
        m2 = (jnp.arange(n, dtype=jnp.uint64) // 3) % 2
        c1 = ev.enc.encrypt_glwe_l1(jax.random.fold_in(KEY, 10), m1, sk)
        c2 = ev.enc.encrypt_glwe_l1(jax.random.fold_in(KEY, 11), m2, sk)
        np.testing.assert_array_equal(
            np.asarray(ev.enc.decrypt_glwe_l1(ev.xor(c1, c2), sk)), np.asarray(m1 ^ m2)
        )
        # NOT flips the constant coefficient only (bit ciphertexts encode in
        # coefficient 0)
        dec_not = np.asarray(ev.enc.decrypt_glwe_l1(ev.not_(c1), sk))
        assert dec_not[0] == 1 - int(m1[0])
        np.testing.assert_array_equal(dec_not[1:], np.asarray(m1[1:]))

    def test_precomputed_ggsw_constants(self, material):
        sk, _, _, ev = material
        n = TEST_PARAMS.l1_params.degree
        m0 = jnp.zeros(n, dtype=jnp.uint64)
        m1 = jnp.ones(n, dtype=jnp.uint64)
        c0 = ev.enc.encrypt_glwe_l1(jax.random.fold_in(KEY, 20), m0, sk)
        c1 = ev.enc.encrypt_glwe_l1(jax.random.fold_in(KEY, 21), m1, sk)
        out0 = ev.cmux(ev.ggsw_zero, c0, c1)
        out1 = ev.cmux(ev.ggsw_one, c0, c1)
        np.testing.assert_array_equal(np.asarray(ev.enc.decrypt_glwe_l1(out0, sk)), 0)
        np.testing.assert_array_equal(np.asarray(ev.enc.decrypt_glwe_l1(out1, sk)), 1)

    def test_packed_public_encryption(self, material):
        sk, pk, _, ev = material
        n = TEST_PARAMS.l1_params.degree
        bits = jnp.asarray(np.random.default_rng(5).integers(0, 2, n, dtype=np.uint64))
        ct = ev.enc.encrypt_packed_public(jax.random.fold_in(KEY, 30), bits, pk)
        dec = ev.enc.decrypt_glwe_l1(ct, sk)
        np.testing.assert_array_equal(np.asarray(dec), np.asarray(bits))

    def test_full_conversion_ring(self, material):
        """L1 GLWE bit -> sample extract -> keyswitch -> CBS -> CMux."""
        sk, _, _, ev = material
        n = TEST_PARAMS.l1_params.degree
        m0 = jnp.zeros(n, dtype=jnp.uint64)
        m1 = jnp.ones(n, dtype=jnp.uint64)
        c0 = ev.enc.encrypt_glwe_l1(jax.random.fold_in(KEY, 40), m0, sk)
        c1 = ev.enc.encrypt_glwe_l1(jax.random.fold_in(KEY, 41), m1, sk)
        for bit in [0, 1]:
            poly = jnp.zeros(n, dtype=jnp.uint64).at[0].set(bit)
            glwe = ev.enc.encrypt_glwe_l1(jax.random.fold_in(KEY, 42 + bit), poly, sk)
            lwe1 = ev.sample_extract(glwe, 0)
            assert int(ev.enc.decrypt_lwe_l1(lwe1, sk)) == bit
            lwe0 = ev.keyswitch_lwe_l1_to_l0(lwe1)
            assert int(ev.enc.decrypt_lwe_l0(lwe0, sk)) == bit
            ggsw = ev.circuit_bootstrap(lwe0)
            out = ev.cmux(ggsw, c0, c1)
            dec = ev.enc.decrypt_glwe_l1(out, sk)
            np.testing.assert_array_equal(np.asarray(dec), bit, err_msg=f"bit={bit}")
