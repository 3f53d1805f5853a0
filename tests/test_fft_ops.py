"""External product, CMux, keyswitching, trace, scheme switch — each
verified against decryption ground truth (mirrors reference tests in
`fft_ops.rs:536-703`, `automorphisms/mod.rs:100-136`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spf_tpu.ops import (
    automorphism,
    ciphertext as ct_ops,
    encryption as enc,
    fft_ops,
    keyswitch,
    scheme_switch,
    torus,
)
from spf_tpu.params import (
    TEST_GLWE_DEF_1,
    TEST_LWE_DEF_1,
    TEST_RADIX,
    GlweDef,
    LweDef,
    RadixDecomposition,
)

KEY = jax.random.key(99)
GLWE = TEST_GLWE_DEF_1
BITS = 1


def k(i):
    return jax.random.fold_in(KEY, i)


@pytest.fixture(scope="module")
def sk():
    return enc.generate_glwe_sk(k(0), GLWE)


class TestExternalProduct:
    def test_external_product_selects(self, sk):
        msg = jnp.arange(GLWE.degree, dtype=jnp.uint64) % 2
        glwe_ct = enc.encrypt_glwe(k(1), torus.encode(msg, BITS), sk, GLWE)
        for bit in [0, 1]:
            ggsw = enc.encrypt_ggsw_scalar(k(2 + bit), bit, sk, GLWE, TEST_RADIX)
            ggsw_fft = fft_ops.ggsw_to_fft(ggsw)
            prod = fft_ops.external_product(glwe_ct, ggsw_fft, GLWE, TEST_RADIX)
            dec = torus.decode(enc.decrypt_glwe(prod, sk, GLWE), BITS)
            expected = msg * bit
            np.testing.assert_array_equal(np.asarray(dec), np.asarray(expected))

    def test_cmux(self, sk):
        m0 = jnp.arange(GLWE.degree, dtype=jnp.uint64) % 2
        m1 = (jnp.arange(GLWE.degree, dtype=jnp.uint64) // 2) % 2
        c0 = enc.encrypt_glwe(k(4), torus.encode(m0, BITS), sk, GLWE)
        c1 = enc.encrypt_glwe(k(5), torus.encode(m1, BITS), sk, GLWE)
        for bit, expected in [(0, m0), (1, m1)]:
            sel = fft_ops.ggsw_to_fft(
                enc.encrypt_ggsw_scalar(k(6 + bit), bit, sk, GLWE, TEST_RADIX)
            )
            out = fft_ops.cmux(c0, c1, sel, GLWE, TEST_RADIX)
            dec = torus.decode(enc.decrypt_glwe(out, sk, GLWE), BITS)
            np.testing.assert_array_equal(np.asarray(dec), np.asarray(expected))

    def test_cmux_batched(self, sk):
        batch = 4
        m0 = jnp.zeros((batch, GLWE.degree), dtype=jnp.uint64)
        m1 = jnp.ones((batch, GLWE.degree), dtype=jnp.uint64)
        c0 = jax.vmap(lambda kk, m: enc.encrypt_glwe(kk, torus.encode(m, BITS), sk, GLWE))(
            jax.random.split(k(8), batch), m0
        )
        c1 = jax.vmap(lambda kk, m: enc.encrypt_glwe(kk, torus.encode(m, BITS), sk, GLWE))(
            jax.random.split(k(9), batch), m1
        )
        bits = [0, 1, 1, 0]
        sels = jnp.stack(
            [
                enc.encrypt_ggsw_scalar(k(10 + i), bits[i], sk, GLWE, TEST_RADIX)
                for i in range(batch)
            ]
        )
        out = fft_ops.cmux(c0, c1, fft_ops.ggsw_to_fft(sels), GLWE, TEST_RADIX)
        for i in range(batch):
            dec = torus.decode(enc.decrypt_glwe(out[i], sk, GLWE), BITS)
            np.testing.assert_array_equal(np.asarray(dec), bits[i])

    def test_glev_cmux(self, sk):
        # the selector's decomposition must be fine enough to preserve the
        # GLEV's deepest row (scale q/B^count); DEFAULT_128 balances
        # cbs_radix for exactly this
        radix = RadixDecomposition(count=2, radix_log=9)
        sel_radix = RadixDecomposition(count=3, radix_log=9)
        m0 = jnp.zeros(GLWE.degree, dtype=jnp.uint64)
        m1 = jnp.zeros(GLWE.degree, dtype=jnp.uint64).at[0].set(1)
        g0 = enc.encrypt_glev(k(20), m0, sk, GLWE, radix)
        g1 = enc.encrypt_glev(k(21), m1, sk, GLWE, radix)
        sel = fft_ops.ggsw_to_fft(
            enc.encrypt_ggsw_scalar(k(22), 1, sk, GLWE, sel_radix)
        )
        out = fft_ops.glev_cmux(g0, g1, sel, GLWE, sel_radix)
        for j in range(radix.count):
            dec = enc.decrypt_glev_at(out, sk, GLWE, radix, j)
            assert int(dec[0]) == 1, j
            np.testing.assert_array_equal(np.asarray(dec[1:]), 0)


class TestSampleExtract:
    def test_extract_each_index(self, sk):
        lwe_sk = enc.glwe_sk_to_lwe_sk(sk)
        lwe_def = GLWE.as_lwe_def()
        msg = jnp.arange(GLWE.degree, dtype=jnp.uint64) % 2
        glwe_ct = enc.encrypt_glwe(k(30), torus.encode(msg, BITS), sk, GLWE)
        for h in [0, 1, GLWE.degree // 2, GLWE.degree - 1]:
            lwe_ct = ct_ops.sample_extract(glwe_ct, h, GLWE)
            dec = torus.decode(enc.decrypt_lwe(lwe_ct, lwe_sk, lwe_def), BITS)
            assert int(dec) == int(msg[h]), h


class TestLweKeyswitch:
    def test_keyswitch(self):
        old = LweDef(dim=256, std=1e-16)
        new = TEST_LWE_DEF_1
        radix = RadixDecomposition(count=9, radix_log=4)
        sk_old = enc.generate_lwe_sk(k(40), old)
        sk_new = enc.generate_lwe_sk(k(41), new)
        ksk = keyswitch.generate_lwe_keyswitch_key(k(42), sk_old, sk_new, old, new, radix)
        for msg in [0, 1, 2, 3]:
            ct = enc.encrypt_lwe(k(43 + msg), torus.encode(msg, 2), sk_old, old)
            switched = keyswitch.keyswitch_lwe_to_lwe(ct, ksk, old, new, radix)
            dec = torus.decode(enc.decrypt_lwe(switched, sk_new, new), 2)
            assert int(dec) == msg

    def test_keyswitch_batched(self):
        old = LweDef(dim=256, std=1e-16)
        new = TEST_LWE_DEF_1
        radix = RadixDecomposition(count=9, radix_log=4)
        sk_old = enc.generate_lwe_sk(k(50), old)
        sk_new = enc.generate_lwe_sk(k(51), new)
        ksk = keyswitch.generate_lwe_keyswitch_key(k(52), sk_old, sk_new, old, new, radix)
        msgs = jnp.arange(8, dtype=jnp.uint64) % 4
        cts = jax.vmap(
            lambda kk, m: enc.encrypt_lwe(kk, torus.encode(m, 2), sk_old, old)
        )(jax.random.split(k(53), 8), msgs)
        switched = keyswitch.keyswitch_lwe_to_lwe(cts, ksk, old, new, radix)
        dec = torus.decode(enc.decrypt_lwe(switched, sk_new, new), 2)
        np.testing.assert_array_equal(np.asarray(dec), np.asarray(msgs))


class TestGlweKeyswitchAndTrace:
    def test_glwe_keyswitch(self, sk):
        radix = RadixDecomposition(count=6, radix_log=7)
        sk2 = enc.generate_glwe_sk(k(60), GLWE)
        ksk = keyswitch.generate_glwe_keyswitch_key(k(61), sk, sk2, GLWE, radix)
        import spf_tpu.ops.fft as fft

        ksk_fft = fft.C128.fwd_torus(ksk)
        msg = jnp.arange(GLWE.degree, dtype=jnp.uint64) % 4
        ct = enc.encrypt_glwe(k(62), torus.encode(msg, 2), sk, GLWE)
        out = fft_ops.keyswitch_glwe_to_glwe(ct, ksk_fft, GLWE, radix)
        dec = torus.decode(enc.decrypt_glwe(out, sk2, GLWE), 2)
        np.testing.assert_array_equal(np.asarray(dec), np.asarray(msg))

    def test_trace(self, sk):
        # reference test `can_trace`: all-ones poly at 12 plaintext bits ->
        # constant coeff N, rest zero. We use plaintext_bits > log2(N).
        radix = RadixDecomposition(count=6, radix_log=7)
        bits = 12
        ak = keyswitch.generate_automorphism_keys(k(70), sk, GLWE, radix)
        msg = jnp.ones(GLWE.degree, dtype=jnp.uint64)
        ct = enc.encrypt_glwe(k(71), torus.encode(msg, bits), sk, GLWE)
        out = automorphism.trace(ct, ak, GLWE, radix)
        dec = torus.decode(enc.decrypt_glwe(out, sk, GLWE), bits)
        assert int(dec[0]) == GLWE.degree
        np.testing.assert_array_equal(np.asarray(dec[1:]), 0)


class TestSchemeSwitch:
    def test_glev_to_ggsw_cmux_works(self, sk):
        ggsw_radix = RadixDecomposition(count=2, radix_log=9)
        ss_radix = RadixDecomposition(count=6, radix_log=8)
        ssk = scheme_switch.generate_scheme_switch_key(k(80), sk, GLWE, ss_radix)
        for bit in [0, 1]:
            msg = jnp.zeros(GLWE.degree, dtype=jnp.uint64).at[0].set(bit)
            glev = enc.encrypt_glev(k(81 + bit), msg, sk, GLWE, ggsw_radix)
            ggsw_fft = fft_ops.scheme_switch_fft(glev, ssk, GLWE, ggsw_radix, ss_radix)
            # use the resulting GGSW as a cmux selector
            m0 = jnp.zeros(GLWE.degree, dtype=jnp.uint64)
            m1 = jnp.ones(GLWE.degree, dtype=jnp.uint64)
            c0 = enc.encrypt_glwe(k(83), torus.encode(m0, BITS), sk, GLWE)
            c1 = enc.encrypt_glwe(k(84), torus.encode(m1, BITS), sk, GLWE)
            out = fft_ops.cmux(c0, c1, ggsw_fft, GLWE, ggsw_radix)
            dec = torus.decode(enc.decrypt_glwe(out, sk, GLWE), BITS)
            np.testing.assert_array_equal(
                np.asarray(dec), np.asarray(m1 if bit else m0)
            )
