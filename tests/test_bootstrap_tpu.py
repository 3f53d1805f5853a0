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


class TestTLayoutCBS:
    def test_full_conversion_matches(self):
        """circuit_bootstrap_t must produce GGSWs that select correctly,
        decrypt-identical to the reference-layout CBS path."""
        import jax

        from spf_tpu.ops import keyswitch, scheme_switch, torus
        from spf_tpu.params import Params, RadixDecomposition

        P = Params(
            l0_params=LWE,
            l1_params=GlweDef(size=1, degree=128, std=1e-16),
            cbs_radix=RadixDecomposition(count=2, radix_log=9),
            pbs_radix=RadixDecomposition(count=2, radix_log=16),
            ks_radix=RadixDecomposition(count=9, radix_log=4),
            pfks_radix=RadixDecomposition(count=4, radix_log=11),
            ss_radix=RadixDecomposition(count=6, radix_log=8),
            tr_radix=RadixDecomposition(count=6, radix_log=7),
        )
        glwe = P.l1_params
        lwe_sk = enc.generate_lwe_sk(k(50), LWE)
        glwe_sk = enc.generate_glwe_sk(k(51), glwe)
        keys_split = jax.random.split(k(52), LWE.dim)
        bsk_coeff = jnp.stack(
            [
                enc.encrypt_ggsw_scalar(keys_split[i], lwe_sk[i], glwe_sk, glwe, P.pbs_radix)
                for i in range(LWE.dim)
            ]
        )
        # coefficient-domain automorphism + scheme-switch keys
        ak_rows = []
        n = glwe.degree
        from spf_tpu.ops.poly import pow_k, negacyclic_mul_exact

        akeys = jax.random.split(k(53), glwe.log_degree)
        for i in range(1, glwe.log_degree + 1):
            k_exp = n // (1 << (i - 1)) + 1
            sk_k = jnp.stack([pow_k(glwe_sk[r], k_exp) for r in range(glwe.size)])
            ak_rows.append(
                keyswitch.generate_glwe_keyswitch_key(
                    akeys[i - 1], sk_k, glwe_sk, glwe, P.tr_radix
                )
            )
        ak_coeff = jnp.stack(ak_rows)
        ssk_rows = []
        for i in range(glwe.size):
            cols = []
            for j in range(glwe.size):
                ii, jj = min(i, j), max(i, j)
                s_ij = negacyclic_mul_exact(glwe_sk[ii], glwe_sk[jj])
                cols.append(
                    enc.encrypt_glev(
                        jax.random.fold_in(k(54), ii * glwe.size + jj),
                        s_ij, glwe_sk, glwe, P.ss_radix,
                    )
                )
            ssk_rows.append(jnp.stack(cols))
        ssk_coeff = jnp.stack(ssk_rows)

        bsk_t = bt.bsk_to_t(bsk_coeff)
        ak_t, ssk_t = bt.keys_to_t(ak_coeff, ssk_coeff)

        B = 4
        bits = [0, 1, 1, 0]
        cts = jnp.stack(
            [
                enc.encrypt_lwe(k(60 + i), torus.encode(b, 1), lwe_sk, LWE)
                for i, b in enumerate(bits)
            ]
        )
        # eager: the XLA *CPU* compile of the full fused CBS graph is
        # pathologically slow/memory-hungry; the jitted path is exercised
        # on TPU (where it compiles fine) by the bench/profiling runs
        ggsw_t = bt.circuit_bootstrap_t(bt.to_t_layout(cts), bsk_t, ak_t, ssk_t, P)

        # use the batched GGSW as a cmux selector in t-layout
        m0 = jnp.zeros((glwe.size + 1, glwe.degree, B), dtype=jnp.uint64)
        one_poly = torus.encode(jnp.ones(glwe.degree, dtype=jnp.uint64), 1)
        m1 = jnp.zeros_like(m0).at[-1].set(one_poly[:, None])
        out = bt.cmux_t(m0, m1, ggsw_t, glwe, P.cbs_radix)
        for i, b in enumerate(bits):
            glwe_ct = bt.from_t_layout(out)[i]
            dec = torus.decode(enc.decrypt_glwe(glwe_ct, glwe_sk, glwe), 1)
            np.testing.assert_array_equal(np.asarray(dec), b, err_msg=f"bit {i}")
