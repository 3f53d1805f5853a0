"""Tests for torus encode/decode, gadget decomposition, exact polynomial
arithmetic, and the negacyclic FFT (vs. the exact integer oracle).

Mirrors the reference's inline-unit-test strategy: every op is checked
against plaintext ground truth over random trials (SURVEY §4.1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spf_tpu.ops import decomp, fft, poly, torus
from spf_tpu.params import RadixDecomposition

RNG = np.random.default_rng(42)


def rand_u64(shape):
    return jnp.asarray(RNG.integers(0, 1 << 64, size=shape, dtype=np.uint64))


def naive_negacyclic_mul(a, b):
    """O(N^2) negacyclic product via numpy (mod 2**64)."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    n = a.shape[0]
    out = np.zeros(n, dtype=np.uint64)
    for i in range(n):
        for j in range(n):
            k = i + j
            prod = a[i] * b[j]  # numpy wraps
            if k < n:
                out[k] += prod
            else:
                out[k - n] -= prod
    return out


class TestTorus:
    def test_encode_decode_roundtrip(self):
        for bits in [1, 4, 9]:
            vals = jnp.arange(1 << bits, dtype=jnp.uint64)
            enc = torus.encode(vals, bits)
            dec = torus.decode(enc, bits)
            np.testing.assert_array_equal(dec, vals)

    def test_decode_rounds_noise(self):
        bits = 4
        msg = jnp.uint64(11)
        enc = torus.encode(msg, bits)
        noisy = enc + jnp.uint64(12345)  # small positive noise
        assert torus.decode(noisy, bits) == 11
        noisy = enc - jnp.uint64(54321)  # small negative noise
        assert torus.decode(noisy, bits) == 11

    def test_shr_round(self):
        # reference test vector: polynomial_shr_round([0..8], 2) == [0,0,1,1,1,1,2,2]
        x = jnp.arange(8, dtype=jnp.uint64)
        np.testing.assert_array_equal(
            torus.shr_round(x, 2), np.array([0, 0, 1, 1, 1, 1, 2, 2], dtype=np.uint64)
        )

    def test_f64_to_torus(self):
        vals = np.array([0.0, 1.0, -1.0, 2.0**63 - 2048, -(2.0**63), 2.0**63])
        out = torus.f64_to_torus(jnp.asarray(vals))
        expected = np.array(
            [0, 1, (1 << 64) - 1, (1 << 63) - 2048, 1 << 63, 1 << 63], dtype=np.uint64
        )
        np.testing.assert_array_equal(out, expected)

    def test_f64_to_torus_large_multiple_of_q(self):
        # values beyond q must reduce mod q
        x = jnp.asarray([2.0**64 + 8192.0, -(2.0**64) - 8192.0, 3 * 2.0**64])
        out = torus.f64_to_torus(x)
        expected = np.array([8192, (1 << 64) - 8192, 0], dtype=np.uint64)
        np.testing.assert_array_equal(out, expected)


class TestDecomp:
    @pytest.mark.parametrize(
        "radix",
        [
            RadixDecomposition(count=3, radix_log=4),
            RadixDecomposition(count=2, radix_log=16),
            RadixDecomposition(count=6, radix_log=2),
            RadixDecomposition(count=15, radix_log=3),
        ],
    )
    def test_decompose_recompose(self, radix):
        x = rand_u64((64,))
        digits = decomp.decompose(x, radix)
        assert digits.shape == (radix.count, 64)
        # digits in [-B/2, B/2)
        half_b = 1 << (radix.radix_log - 1)
        assert int(digits.max()) < half_b
        assert int(digits.min()) >= -half_b
        rec = decomp.recompose(digits, radix)
        # |x - recompose| <= q / (2 * B^count) (rounding error only)
        err_bound = 1 << (64 - radix.count * radix.radix_log - 1)
        diff = np.asarray(rec - x).astype(np.int64)
        assert np.all(np.abs(diff) <= err_bound), (diff.max(), err_bound)

    def test_digit_semantics_match_reference_algorithm(self):
        # hand-check: value rounds then extracts signed digits LSB-first
        radix = RadixDecomposition(count=2, radix_log=4)
        # v (after rounding to 8 bits) = 0b1011_1010 -> d0=10(>=8 -> -6,carry),
        # v=11+1=12 -> d1=12 (>=8 -> -4, carry) -> done (count=2)
        x = jnp.uint64(0b10111010 << 56)
        digits = decomp.decompose(x, radix)  # row-aligned: [d1, d0]
        assert int(digits[1][()]) == -6
        assert int(digits[0][()]) == -4


class TestPoly:
    @pytest.mark.parametrize("n", [8, 32])
    def test_negacyclic_mul_exact_matches_naive(self, n):
        a = rand_u64((n,))
        b = rand_u64((n,))
        got = poly.negacyclic_mul_exact(a, b)
        np.testing.assert_array_equal(np.asarray(got), naive_negacyclic_mul(a, b))

    def test_monomial_mul(self):
        n = 8
        a = jnp.arange(1, n + 1, dtype=jnp.uint64)
        # X^1: out[0] = -a[n-1], out[j] = a[j-1]
        out = poly.monomial_mul(a, 1)
        expected = np.array([np.uint64(0) - np.uint64(8), 1, 2, 3, 4, 5, 6, 7], dtype=np.uint64)
        np.testing.assert_array_equal(np.asarray(out), expected)
        # X^(2n) = identity; X^n = -1
        np.testing.assert_array_equal(np.asarray(poly.monomial_mul(a, 2 * n)), np.asarray(a))
        np.testing.assert_array_equal(
            np.asarray(poly.monomial_mul(a, n)), np.asarray(jnp.zeros_like(a) - a)
        )

    def test_monomial_mul_matches_exact_mul(self):
        n = 16
        a = rand_u64((n,))
        for t in [0, 1, 5, n - 1, n, n + 3, 2 * n - 1]:
            mono = np.zeros(n, dtype=np.uint64)
            mono[t % n] = np.uint64(1) if (t // n) % 2 == 0 else np.uint64(0) - np.uint64(1)
            expected = naive_negacyclic_mul(a, mono)
            np.testing.assert_array_equal(np.asarray(poly.monomial_mul(a, t)), expected)

    def test_monomial_mul_batch(self):
        n = 16
        a = rand_u64((4, n))
        t = jnp.asarray([0, 3, n, 2 * n - 1])
        out = poly.monomial_mul_batch(a, t)
        for i in range(4):
            np.testing.assert_array_equal(
                np.asarray(out[i]), np.asarray(poly.monomial_mul(a[i], int(t[i])))
            )

    def test_pow_k_reference_vector(self):
        # reference test (`ops/polynomial/mod.rs` can_polynomial_pow_k):
        # N=128, k=33: 0->0, 6->70 (neg), 26->90, 93->125 (neg)
        a = jnp.zeros(128, dtype=jnp.uint64)
        a = a.at[0].set(17).at[6].set(19).at[26].set(52).at[93].set(45)
        out = np.asarray(poly.pow_k(a, 33))
        expected = np.zeros(128, dtype=np.uint64)
        expected[0] = 17
        expected[70] = np.uint64(0) - np.uint64(19)
        expected[90] = 52
        expected[125] = np.uint64(0) - np.uint64(45)
        np.testing.assert_array_equal(out, expected)


class TestNegacyclicFFT:
    @pytest.mark.parametrize("n", [16, 64, 256])
    def test_roundtrip_exact_small(self, n):
        # values well inside the f64 mantissa roundtrip exactly
        x = jnp.asarray(RNG.integers(0, 1 << 40, size=n, dtype=np.uint64))
        be = fft.get_backend("c128")
        back = be.inv(be.fwd_torus(x))
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    @pytest.mark.parametrize("n", [256, 2048])
    def test_roundtrip_torus_magnitude(self, n):
        # full-magnitude torus values roundtrip with only f64 roundoff
        # (the reference's FFT has the same property; roundoff is absorbed
        # as ciphertext noise)
        x = rand_u64((n,))
        be = fft.get_backend("c128")
        back = be.inv(be.fwd_torus(x))
        err = np.asarray(back - x).astype(np.int64)
        assert np.abs(err).max() < (1 << 16), np.abs(err).max()

    @pytest.mark.parametrize("n", [16, 64])
    def test_convolution_small_values(self, n):
        # small coefficients -> FFT product must be bit-exact
        a = jnp.asarray(RNG.integers(0, 1 << 10, size=n, dtype=np.uint64))
        b = jnp.asarray(RNG.integers(0, 1 << 10, size=n, dtype=np.uint64))
        be = fft.get_backend("c128")
        got = be.inv(be.mul(be.fwd_torus(a), be.fwd_torus(b)))
        np.testing.assert_array_equal(np.asarray(got), naive_negacyclic_mul(a, b))

    def test_convolution_torus_by_digits(self):
        # torus-magnitude polynomial times small signed digits: error must be
        # far below the noise floor (this is the external-product shape)
        n = 256
        a = rand_u64((n,))  # full torus magnitude
        d = jnp.asarray(RNG.integers(-(1 << 15), 1 << 15, size=n, dtype=np.int64))
        be = fft.get_backend("c128")
        got = np.asarray(be.inv(be.mul(be.fwd_torus(a), be.fwd_signed(d))))
        expected = naive_negacyclic_mul(a, np.asarray(d.astype(jnp.uint64)))
        err = (got - expected).astype(np.int64)
        # f64 FFT error for these magnitudes is ~2**31 (relative ~2**-33);
        # absorbed as ciphertext noise exactly as in the reference
        assert np.abs(err).max() < (1 << 34), np.abs(err).max()

    def test_batched(self):
        n = 64
        x = jnp.asarray(RNG.integers(0, 1 << 40, size=(3, 5, n), dtype=np.uint64))
        be = fft.get_backend("c128")
        f = be.fwd_torus(x)
        assert f.shape == (3, 5, n // 2)
        np.testing.assert_array_equal(np.asarray(be.inv(f)), np.asarray(x))


class TestGoldilocksNtt:
    def test_roundtrip_and_convolution(self):
        from spf_tpu.ops import ntt

        rng = np.random.default_rng(3)
        a = [int(x) for x in rng.integers(0, 1 << 62, 16)]
        assert ntt.ntt(ntt.ntt(a), inverse=True) == [x % ntt.GOLDILOCKS_P for x in a]
        b = [int(x) for x in rng.integers(0, 1000, 16)]
        sm = [int(x) for x in rng.integers(0, 1000, 16)]
        got = ntt.cyclic_mul(b, sm)
        n = 16
        exp = [0] * n
        for i in range(n):
            for j in range(n):
                exp[(i + j) % n] = (exp[(i + j) % n] + b[i] * sm[j]) % ntt.GOLDILOCKS_P
        assert got == exp


class TestModulusSwitchReferenceVectors:
    def test_reference_vectors(self):
        """The reference's own test vectors for `modulus_switch`
        (`sunscreen_tfhe/src/ops/ciphertext/lwe_ciphertext_ops.rs:146-163`)."""
        from spf_tpu.ops.ciphertext import modulus_switch
        from spf_tpu.ops.torus import u64

        x = u64(0xDEADBEEF_BEEFDEAD)
        assert int(modulus_switch(x, 0, 0, 10)) == 0b11_0111_1011
        assert int(modulus_switch(x, 2, 0, 10)) == 0b01_1110_1011
        assert int(modulus_switch(x, 0, 3, 10)) == 0b11_0111_1000
        assert int(modulus_switch(x, 2, 3, 10)) == 0b01_1110_1000
