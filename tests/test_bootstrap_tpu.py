"""The TPU-optimized t-layout (coefficient-major) bootstrap pipeline
must agree with the reference-layout path at decrypt level."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spf_tpu.ops import bootstrap, bootstrap_tpu as bt, encryption as enc, fft, torus
from spf_tpu.params import GlweDef, LweDef, RadixDecomposition

KEY = jax.random.key(31)
LWE = LweDef(dim=64, std=1e-16)
GLWE = GlweDef(size=1, degree=128, std=1e-16)
RADIX = RadixDecomposition(count=2, radix_log=16)


def k(i):
    return jax.random.fold_in(KEY, i)


@pytest.fixture(scope="module")
def material():
    lwe_sk = enc.generate_lwe_sk(k(0), LWE)
    glwe_sk = enc.generate_glwe_sk(k(1), GLWE)
    keys = jax.random.split(k(2), LWE.dim)
    rows = [
        enc.encrypt_ggsw_scalar(keys[i], lwe_sk[i], glwe_sk, GLWE, RADIX)
        for i in range(LWE.dim)
    ]
    bsk_coeff = jnp.stack(rows, 0)
    return lwe_sk, glwe_sk, bsk_coeff


class TestTLayoutFFT:
    def test_fwd_matches_c128(self):
        rng = np.random.default_rng(5)
        C128 = fft.get_backend("c128")
        x = jnp.asarray(rng.integers(0, 1 << 64, size=(3, 256), dtype=np.uint64))
        ref = np.asarray(C128.fwd_torus(x))
        got_t = bt.ft.fwd_torus_t(x.T)
        got = (
            np.asarray(got_t[0], np.float64) + np.asarray(got_t[1], np.float64)
        ) + 1j * (np.asarray(got_t[2], np.float64) + np.asarray(got_t[3], np.float64))
        assert np.abs(got.T - ref).max() / np.abs(ref).max() < 1e-12

    def test_leading_dims(self):
        rng = np.random.default_rng(6)
        # values within ds32's exact range (~2^40 given the fold)
        x = jnp.asarray(rng.integers(0, 1 << 40, size=(2, 3, 64, 4), dtype=np.uint64))
        f = bt.ft.fwd_torus_t(x)
        assert f[0].shape == (2, 3, 32, 4)
        back = bt.ft.inv_t(f)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


class TestTLayoutPBS:
    def test_matches_reference_layout(self, material):
        lwe_sk, glwe_sk, bsk_coeff = material
        bsk_ref = fft.C128.fwd_torus(bsk_coeff)
        bsk_t = bt.bsk_to_t(bsk_coeff)
        lut = bootstrap.generate_lut([lambda x: (x * 3 + 1) % 8], GLWE, 3)
        msgs = jnp.arange(8, dtype=jnp.uint64)
        cts = jax.vmap(
            lambda kk, m: enc.encrypt_lwe(kk, torus.encode(m, 4), lwe_sk, LWE)
        )(jax.random.split(k(3), 8), msgs)

        ref_out = bootstrap.programmable_bootstrap_univariate(
            cts, lut, bsk_ref, LWE, GLWE, RADIX
        )
        t_out = bt.from_t_layout(
            jax.jit(
                lambda c: bt.programmable_bootstrap_t(c, lut, bsk_t, LWE, GLWE, RADIX)
            )(bt.to_t_layout(cts))
        )
        sk_flat = enc.glwe_sk_to_lwe_sk(glwe_sk)
        dec_ref = torus.decode(
            enc.decrypt_lwe(ref_out, sk_flat, GLWE.as_lwe_def()), 3
        )
        dec_t = torus.decode(enc.decrypt_lwe(t_out, sk_flat, GLWE.as_lwe_def()), 3)
        np.testing.assert_array_equal(np.asarray(dec_t), np.asarray(dec_ref))
        np.testing.assert_array_equal(np.asarray(dec_t), (np.arange(8) * 3 + 1) % 8)
