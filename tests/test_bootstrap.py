"""Programmable bootstrapping and circuit bootstrapping tests (mirror
reference tests `programmable_bootstrapping.rs:700-790` and
`circuit_bootstrapping.rs` tests, at reduced parameter sizes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spf_tpu.ops import bootstrap, cbs, encryption as enc, fft_ops, keyswitch, scheme_switch, torus
from spf_tpu.params import (
    GlweDef,
    LweDef,
    Params,
    RadixDecomposition,
)

KEY = jax.random.key(1234)


def k(i):
    return jax.random.fold_in(KEY, i)


# small but noise-safe parameter set for bootstrap tests
LWE = LweDef(dim=128, std=1e-16)
GLWE = GlweDef(size=2, degree=128, std=1e-16)
PBS_RADIX = RadixDecomposition(count=2, radix_log=16)

TEST_PARAMS_FULL = Params(
    l0_params=LWE,
    l1_params=GLWE,
    cbs_radix=RadixDecomposition(count=2, radix_log=9),
    pbs_radix=PBS_RADIX,
    ks_radix=RadixDecomposition(count=9, radix_log=4),
    pfks_radix=RadixDecomposition(count=4, radix_log=11),
    ss_radix=RadixDecomposition(count=6, radix_log=8),
    tr_radix=RadixDecomposition(count=6, radix_log=7),
)


@pytest.fixture(scope="module")
def keys():
    lwe_sk = enc.generate_lwe_sk(k(0), LWE)
    glwe_sk = enc.generate_glwe_sk(k(1), GLWE)
    bsk = bootstrap.generate_bootstrap_key(k(2), lwe_sk, glwe_sk, LWE, GLWE, PBS_RADIX)
    return lwe_sk, glwe_sk, bsk


class TestPBS:
    @pytest.mark.parametrize("mapname", ["identity", "plus3"])
    def test_univariate_pbs(self, keys, mapname):
        lwe_sk, glwe_sk, bsk = keys
        bits = 3
        fn = (lambda x: x) if mapname == "identity" else (lambda x: (x + 3) % 8)
        lut = bootstrap.generate_lut([fn], GLWE, bits)
        extracted_sk = enc.glwe_sk_to_lwe_sk(glwe_sk)
        out_lwe_def = GLWE.as_lwe_def()
        failed = []
        for msg in range(1 << bits):
            # encrypt with one padding bit (reference test:745)
            ct = enc.encrypt_lwe(k(10 + msg), torus.encode(msg, bits + 1), lwe_sk, LWE)
            out = bootstrap.programmable_bootstrap_univariate(
                ct, lut, bsk, LWE, GLWE, PBS_RADIX
            )
            dec = int(torus.decode(enc.decrypt_lwe(out, extracted_sk, out_lwe_def), bits))
            if dec != fn(msg):
                failed.append((msg, fn(msg), dec))
        assert not failed, failed

    def test_batched_pbs(self, keys):
        lwe_sk, glwe_sk, bsk = keys
        bits = 3
        lut = bootstrap.generate_lut([lambda x: (7 * x) % 8], GLWE, bits)
        msgs = jnp.arange(8, dtype=jnp.uint64)
        cts = jax.vmap(
            lambda kk, m: enc.encrypt_lwe(kk, torus.encode(m, bits + 1), lwe_sk, LWE)
        )(jax.random.split(k(20), 8), msgs)
        pbs = jax.jit(
            lambda c: bootstrap.programmable_bootstrap_univariate(
                c, lut, bsk, LWE, GLWE, PBS_RADIX
            )
        )
        outs = pbs(cts)
        dec = torus.decode(
            enc.decrypt_lwe(outs, enc.glwe_sk_to_lwe_sk(glwe_sk), GLWE.as_lwe_def()), bits
        )
        np.testing.assert_array_equal(np.asarray(dec), (7 * np.arange(8)) % 8)

    def test_bivariate_pbs(self, keys):
        lwe_sk, glwe_sk, bsk = keys
        # inputs are encrypted at 2*bits + 1 (padded packing; see
        # generate_bivariate_lut). bits=1 keeps the total plaintext width
        # within this tiny parameter set's modulus-switch drift margin
        # (N=128; production N=2048 supports wider inputs).
        bits = 1
        enc_bits = 2 * bits + 1
        lut = bootstrap.generate_bivariate_lut(lambda a, b: (a + b) % 2, GLWE, bits)
        for lhs in range(2):
            for rhs in range(2):
                cl = enc.encrypt_lwe(k(30 + lhs), torus.encode(lhs, enc_bits), lwe_sk, LWE)
                cr = enc.encrypt_lwe(k(40 + rhs), torus.encode(rhs, enc_bits), lwe_sk, LWE)
                out = bootstrap.programmable_bootstrap_bivariate(
                    cl, cr, lut, bsk, LWE, GLWE, PBS_RADIX, bits
                )
                dec = int(
                    torus.decode(
                        enc.decrypt_lwe(
                            out, enc.glwe_sk_to_lwe_sk(glwe_sk), GLWE.as_lwe_def()
                        ),
                        2 * bits,
                    )
                )
                assert dec == (lhs + rhs) % 2, (lhs, rhs, dec)


class TestCBS:
    @pytest.fixture(scope="class")
    def cbs_keys(self, keys):
        lwe_sk, glwe_sk, bsk = keys
        p = TEST_PARAMS_FULL
        ak = keyswitch.generate_automorphism_keys(k(50), glwe_sk, GLWE, p.tr_radix)
        ssk = scheme_switch.generate_scheme_switch_key(k(51), glwe_sk, GLWE, p.ss_radix)
        return bsk, ak, ssk

    def test_circuit_bootstrap_bit(self, keys, cbs_keys):
        lwe_sk, glwe_sk, _ = keys
        bsk, ak, ssk = cbs_keys
        p = TEST_PARAMS_FULL
        # CBS then use the GGSW as a CMux selector
        m0 = jnp.zeros(GLWE.degree, dtype=jnp.uint64)
        m1 = jnp.ones(GLWE.degree, dtype=jnp.uint64)
        c0 = enc.encrypt_glwe(k(60), torus.encode(m0, 1), glwe_sk, GLWE)
        c1 = enc.encrypt_glwe(k(61), torus.encode(m1, 1), glwe_sk, GLWE)
        for bit in [0, 1]:
            ct = enc.encrypt_lwe(k(62 + bit), torus.encode(bit, 1), lwe_sk, LWE)
            ggsw_fft = cbs.circuit_bootstrap(ct, bsk, ak, ssk, p)
            out = fft_ops.cmux(c0, c1, ggsw_fft, GLWE, p.cbs_radix)
            dec = torus.decode(enc.decrypt_glwe(out, glwe_sk, GLWE), 1)
            np.testing.assert_array_equal(
                np.asarray(dec), np.asarray(m1 if bit else m0), err_msg=f"bit={bit}"
            )

    def test_circuit_bootstrap_batched(self, keys, cbs_keys):
        lwe_sk, glwe_sk, _ = keys
        bsk, ak, ssk = cbs_keys
        p = TEST_PARAMS_FULL
        bits = [0, 1, 1, 0]
        cts = jnp.stack(
            [
                enc.encrypt_lwe(k(70 + i), torus.encode(b, 1), lwe_sk, LWE)
                for i, b in enumerate(bits)
            ]
        )
        cbs_fn = jax.jit(lambda c: cbs.circuit_bootstrap(c, bsk, ak, ssk, p))
        ggsw_fft = cbs_fn(cts)
        m0 = jnp.zeros(GLWE.degree, dtype=jnp.uint64)
        m1 = jnp.ones(GLWE.degree, dtype=jnp.uint64)
        c0 = enc.encrypt_glwe(k(80), torus.encode(m0, 1), glwe_sk, GLWE)
        c1 = enc.encrypt_glwe(k(81), torus.encode(m1, 1), glwe_sk, GLWE)
        out = fft_ops.cmux(c0, c1, ggsw_fft, GLWE, p.cbs_radix)
        for i, b in enumerate(bits):
            dec = torus.decode(enc.decrypt_glwe(out[i], glwe_sk, GLWE), 1)
            np.testing.assert_array_equal(np.asarray(dec), b)


class TestStandaloneBlindRotation:
    def test_rotate_by_encrypted_amount(self, keys):
        """(mirrors the reference blind_rotation doctest: rotating
        [1..N] by an encrypted 1 shifts the message down by one)"""
        lwe_sk, glwe_sk, _ = keys
        radix = RadixDecomposition(count=2, radix_log=16)
        bits = 4
        msg = (jnp.arange(GLWE.degree, dtype=jnp.uint64) + 1) % 16
        ct = enc.encrypt_glwe(k(200), torus.encode(msg, bits), glwe_sk, GLWE)
        for rot in [1, 5]:
            shift = bootstrap.generate_blind_rotation_shift(
                k(201 + rot), rot, glwe_sk, GLWE, radix
            )
            out = bootstrap.blind_rotation(ct, shift, GLWE, radix)
            dec = np.asarray(
                torus.decode(enc.decrypt_glwe(out, glwe_sk, GLWE), bits)
            )
            n = GLWE.degree
            expected = np.array(
                [
                    ((j + rot) % n + 1) % 16 if j + rot < n else (16 - ((j + rot) % n + 1)) % 16
                    for j in range(n)
                ],
                dtype=np.uint64,
            )
            np.testing.assert_array_equal(dec, expected, err_msg=f"rot={rot}")
