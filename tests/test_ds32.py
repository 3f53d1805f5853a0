"""Double-single f32 FFT backend: precision and cross-backend
equivalence with the c128 oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spf_tpu.ops import ds, encryption as enc, fft, fft_ops, torus
from spf_tpu.params import TEST_GLWE_DEF_1, RadixDecomposition

RNG = np.random.default_rng(7)
DS32 = fft.get_backend("ds32")
C128 = fft.get_backend("c128")


class TestDsArithmetic:
    def test_two_sum_exact(self):
        a = jnp.float32(1.0)
        b = jnp.float32(2.0**-30)
        s, e = ds.two_sum(a, b)
        assert float(s) == 1.0
        assert float(e) == 2.0**-30

    def test_two_prod_exact(self):
        a = jnp.float32(1 + 2.0**-12)
        p, e = ds.two_prod(a, a)
        # (1+2^-12)^2 = 1 + 2^-11 + 2^-24
        assert float(p) + float(e) == 1 + 2.0**-11 + 2.0**-24

    def test_from_i64_roundtrip(self):
        vals = jnp.asarray(
            RNG.integers(-(1 << 62), 1 << 62, size=64, dtype=np.int64)
        )
        hi, lo = ds.from_i64(vals)
        back = hi.astype(jnp.float64) + lo.astype(jnp.float64)
        err = np.abs(np.asarray(back) - np.asarray(vals).astype(np.float64))
        # ds32 captures ~48 bits; 2^62 magnitude -> error < 2^16
        assert err.max() < 2.0**16

    def test_to_u64_mod_q(self):
        # exact small integers roundtrip through ds mod-q conversion
        vals = np.array([0.0, 1.0, -1.0, 12345.0, -99999.0])
        out = ds.to_u64_mod_q(jnp.asarray(vals, jnp.float32), jnp.zeros(5, jnp.float32))
        expected = np.array([0, 1, (1 << 64) - 1, 12345, (1 << 64) - 99999], np.uint64)
        np.testing.assert_array_equal(np.asarray(out), expected)


class TestDs32FFT:
    @pytest.mark.parametrize("n", [16, 256])
    def test_roundtrip_small_values(self, n):
        x = jnp.asarray(RNG.integers(0, 1 << 30, size=n, dtype=np.uint64))
        back = DS32.inv(DS32.fwd_torus(x))
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    @pytest.mark.parametrize("n", [256, 2048])
    def test_roundtrip_torus_magnitude(self, n):
        x = jnp.asarray(RNG.integers(0, 1 << 64, size=n, dtype=np.uint64))
        back = DS32.inv(DS32.fwd_torus(x))
        err = np.asarray(back - x).astype(np.int64)
        # ds32 roundtrip error ~2^16-2^20 at torus magnitude (vs 2^13 for f64)
        assert np.abs(err).max() < (1 << 24), np.abs(err).max()

    def test_convolution_matches_c128(self):
        # the external-product shape: torus-magnitude poly times digits
        n = 256
        a = jnp.asarray(RNG.integers(0, 1 << 64, size=n, dtype=np.uint64))
        d = jnp.asarray(RNG.integers(-(1 << 15), 1 << 15, size=n, dtype=np.int64))
        got_ds = np.asarray(DS32.inv(DS32.mul(DS32.fwd_torus(a), DS32.fwd_signed(d))))
        got_c = np.asarray(C128.inv(C128.mul(C128.fwd_torus(a), C128.fwd_signed(d))))
        err = (got_ds - got_c).astype(np.int64)
        # both carry small numeric error; they must agree to ~2^40
        assert np.abs(err).max() < (1 << 40), np.log2(float(np.abs(err).max()))

    def test_batched_shapes(self):
        x = jnp.asarray(RNG.integers(0, 1 << 40, size=(3, 2, 64), dtype=np.uint64))
        f = DS32.fwd_torus(x)
        assert f.shape == (3, 2, 32)
        assert DS32.inv(f).shape == (3, 2, 64)


class TestDs32CryptoOps:
    def test_cmux_with_ds32(self):
        glwe = TEST_GLWE_DEF_1
        radix = RadixDecomposition(count=3, radix_log=4)
        key = jax.random.key(3)
        sk = enc.generate_glwe_sk(key, glwe)
        m0 = jnp.zeros(glwe.degree, dtype=jnp.uint64)
        m1 = jnp.ones(glwe.degree, dtype=jnp.uint64)
        c0 = enc.encrypt_glwe(jax.random.fold_in(key, 1), torus.encode(m0, 1), sk, glwe)
        c1 = enc.encrypt_glwe(jax.random.fold_in(key, 2), torus.encode(m1, 1), sk, glwe)
        for bit in [0, 1]:
            ggsw = enc.encrypt_ggsw_scalar(
                jax.random.fold_in(key, 3 + bit), bit, sk, glwe, radix
            )
            sel = fft_ops.ggsw_to_fft(ggsw, be=DS32)
            out = fft_ops.cmux(c0, c1, sel, glwe, radix, be=DS32)
            dec = torus.decode(enc.decrypt_glwe(out, sk, glwe), 1)
            np.testing.assert_array_equal(np.asarray(dec), bit)

    def test_cmux_jit_ds32(self):
        glwe = TEST_GLWE_DEF_1
        radix = RadixDecomposition(count=3, radix_log=4)
        key = jax.random.key(4)
        sk = enc.generate_glwe_sk(key, glwe)
        c0 = enc.encrypt_glwe(
            jax.random.fold_in(key, 1),
            torus.encode(jnp.zeros(glwe.degree, dtype=jnp.uint64), 1), sk, glwe)
        c1 = enc.encrypt_glwe(
            jax.random.fold_in(key, 2),
            torus.encode(jnp.ones(glwe.degree, dtype=jnp.uint64), 1), sk, glwe)
        sel = fft_ops.ggsw_to_fft(
            enc.encrypt_ggsw_scalar(jax.random.fold_in(key, 5), 1, sk, glwe, radix),
            be=DS32,
        )
        f = jax.jit(lambda a, b, s: fft_ops.cmux(a, b, s, glwe, radix, be=DS32))
        out = f(c0, c1, sel)
        dec = torus.decode(enc.decrypt_glwe(out, sk, glwe), 1)
        np.testing.assert_array_equal(np.asarray(dec), 1)
