"""Private/public functional keyswitch and CBS v1 tests (mirror
reference tests in `private_functional_keyswitch.rs` and
`circuit_bootstrapping.rs`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spf_tpu.ops import encryption as enc, fft_ops, pfks, torus
from spf_tpu.ops.bootstrap import generate_bootstrap_key
from spf_tpu.params import GlweDef, LweDef, RadixDecomposition

KEY = jax.random.key(555)
LWE = LweDef(dim=128, std=1e-16)
GLWE = GlweDef(size=2, degree=128, std=1e-16)
RADIX = RadixDecomposition(count=3, radix_log=11)


def k(i):
    return jax.random.fold_in(KEY, i)


@pytest.fixture(scope="module")
def skeys():
    lwe_sk = enc.generate_lwe_sk(k(0), LWE)
    glwe_sk = enc.generate_glwe_sk(k(1), GLWE)
    return lwe_sk, glwe_sk


class TestPrivateFks:
    def test_identity_map(self, skeys):
        lwe_sk, glwe_sk = skeys

        def id_map(slots):
            return jnp.zeros((GLWE.degree,), dtype=jnp.uint64).at[0].set(slots[0])

        pfksk = pfks.generate_private_functional_keyswitch_key(
            k(2), lwe_sk, glwe_sk, id_map, LWE, GLWE, RADIX, 1
        )
        for msg in [0, 1, 2, 3]:
            ct = enc.encrypt_lwe(k(3 + msg), torus.encode(msg, 2), lwe_sk, LWE)
            out = pfks.private_functional_keyswitch(ct[None, :], pfksk, LWE, GLWE, RADIX)
            dec = torus.decode(enc.decrypt_glwe(out, glwe_sk, GLWE), 2)
            assert int(dec[0]) == msg
            np.testing.assert_array_equal(np.asarray(dec[1:]), 0)

    def test_two_slot_map(self, skeys):
        """f(x0, x1) = x0 + x1 X (a 2-Lipschitz morphism)."""
        lwe_sk, glwe_sk = skeys

        def two_map(slots):
            p = jnp.zeros((GLWE.degree,), dtype=jnp.uint64)
            return p.at[0].set(slots[0]).at[1].set(slots[1])

        pfksk = pfks.generate_private_functional_keyswitch_key(
            k(20), lwe_sk, glwe_sk, two_map, LWE, GLWE, RADIX, 2
        )
        c0 = enc.encrypt_lwe(k(21), torus.encode(2, 2), lwe_sk, LWE)
        c1 = enc.encrypt_lwe(k(22), torus.encode(3, 2), lwe_sk, LWE)
        out = pfks.private_functional_keyswitch(
            jnp.stack([c0, c1]), pfksk, LWE, GLWE, RADIX
        )
        dec = torus.decode(enc.decrypt_glwe(out, glwe_sk, GLWE), 2)
        assert int(dec[0]) == 2 and int(dec[1]) == 3


class TestPublicFks:
    def test_identity(self, skeys):
        lwe_sk, glwe_sk = skeys
        pufksk = pfks.generate_public_functional_keyswitch_key(
            k(30), lwe_sk, glwe_sk, LWE, GLWE, RADIX
        )

        def id_map(slots):
            return jnp.zeros((GLWE.degree,), dtype=jnp.uint64).at[0].set(slots[0])

        for msg in [1, 3]:
            ct = enc.encrypt_lwe(k(31 + msg), torus.encode(msg, 2), lwe_sk, LWE)
            out = pfks.public_functional_keyswitch(
                ct[None, :], pufksk, id_map, LWE, GLWE, RADIX
            )
            dec = torus.decode(enc.decrypt_glwe(out, glwe_sk, GLWE), 2)
            assert int(dec[0]) == msg


class TestCbsV1:
    def test_cbs_pfks_selector(self, skeys):
        lwe_sk, glwe_sk = skeys
        pbs_radix = RadixDecomposition(count=2, radix_log=16)
        cbs_radix = RadixDecomposition(count=2, radix_log=9)
        pfks_radix = RadixDecomposition(count=3, radix_log=11)
        bsk = generate_bootstrap_key(k(40), lwe_sk, glwe_sk, LWE, GLWE, pbs_radix)
        cbsksk = pfks.generate_cbs_pfks_keys(
            k(41), enc.glwe_sk_to_lwe_sk(glwe_sk), glwe_sk, GLWE.as_lwe_def(), GLWE, pfks_radix
        )
        m0 = jnp.zeros(GLWE.degree, dtype=jnp.uint64)
        m1 = jnp.ones(GLWE.degree, dtype=jnp.uint64)
        c0 = enc.encrypt_glwe(k(42), torus.encode(m0, 1), glwe_sk, GLWE)
        c1 = enc.encrypt_glwe(k(43), torus.encode(m1, 1), glwe_sk, GLWE)
        for bit in [0, 1]:
            ct = enc.encrypt_lwe(k(44 + bit), torus.encode(bit, 1), lwe_sk, LWE)
            ggsw = pfks.circuit_bootstrap_via_pfks(
                ct, bsk, cbsksk, LWE, GLWE, GLWE, pbs_radix, cbs_radix, pfks_radix
            )
            ggsw_fft = fft_ops.ggsw_to_fft(ggsw)
            out = fft_ops.cmux(c0, c1, ggsw_fft, GLWE, cbs_radix)
            dec = torus.decode(enc.decrypt_glwe(out, glwe_sk, GLWE), 1)
            np.testing.assert_array_equal(np.asarray(dec), bit, err_msg=f"bit={bit}")
