"""Multi-bit (grouped) blind rotation: g key bits per step must decode
identically to the single-bit path over all messages — including a
group size that does NOT divide the LWE dimension (zero-padding), and
inside the full circuit bootstrap. ≙ reference semantics of
`programmable_bootstrapping.rs:385-409` (one bit per cmux), regrouped
for TPU throughput (see `spf_tpu/ops/multibit.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spf_tpu.ops import bootstrap, bootstrap_u32 as bu, encryption as enc
from spf_tpu.ops import limb32 as lb, multibit as mb
from spf_tpu.params import GlweDef, LweDef, RadixDecomposition

KEY = jax.random.key(777)
LWE = LweDef(dim=16, std=1e-16)
GLWE = GlweDef(size=1, degree=64, std=1e-16)
RADIX = RadixDecomposition(count=2, radix_log=16)
BITS = 3


def k(i):
    return jax.random.fold_in(KEY, i)


@pytest.fixture(scope="module")
def material():
    lwe_sk = enc.generate_lwe_sk(k(0), LWE)
    glwe_sk = enc.generate_glwe_sk(k(1), GLWE)
    return lwe_sk, glwe_sk


def _encrypt_batch(lwe_sk, msgs, seed=5):
    keys = jax.random.split(k(seed), len(msgs))
    cts = jnp.stack(
        [
            enc.encrypt_lwe(
                keys[i], jnp.uint64(int(m) << (64 - BITS - 1)), lwe_sk, LWE
            )
            for i, m in enumerate(msgs)
        ],
        axis=1,
    )
    ct_limb = lb.from_u64_np(np.asarray(cts))
    pad = 128 - len(msgs)
    return tuple(jnp.pad(c, ((0, 0), (0, pad))) for c in ct_limb)


def _decode(out, glwe_sk, nb):
    sk_flat = np.asarray(glwe_sk).reshape(-1)
    out_np = lb.to_u64_np(out).T[:nb]
    phase = out_np[:, -1] - (out_np[:, :-1] * sk_flat[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    rb = (phase >> np.uint64(64 - BITS - 1)) & np.uint64(1)
    return ((phase >> np.uint64(64 - BITS)) + rb) & np.uint64(7)


class TestKeyProducts:
    def test_subset_products(self):
        sk = np.array([1, 0, 1, 1, 1, 0, 1], dtype=np.uint64)  # n0=7, g=3 -> pad 2
        prods = mb.multibit_key_products_np(sk, 3)
        assert prods.shape == (3, 7)
        padded = np.concatenate([sk, np.zeros(2, np.uint64)])
        for t in range(3):
            for m in range(1, 8):
                want = 1
                for j in range(3):
                    if m & (1 << j):
                        want *= int(padded[3 * t + j])
                assert prods[t, m - 1] == want, (t, m)


class TestNestedSubsetSum:
    @pytest.mark.parametrize("group", [2, 3, 4])
    def test_matches_explicit_sum(self, group):
        """The Horner-factored evaluation (TPU branch) must equal the
        explicit Σ_S (Π u_j) ⊙ M_S it replaces, on random complex data."""
        rng = np.random.default_rng(3)
        ns = (1 << group) - 1
        shape = (2, 8, 4)  # [k+1, K, B]

        def rand_c(shp):
            c = rng.standard_normal(shp) + 1j * rng.standard_normal(shp)
            return c.astype(np.complex64).astype(np.complex128)

        def ds_tuple(c):
            return (
                jnp.asarray(c.real.astype(np.float32)),
                jnp.zeros(c.shape, jnp.float32),
                jnp.asarray(c.imag.astype(np.float32)),
                jnp.zeros(c.shape, jnp.float32),
            )

        mads_c = [rand_c(shape) for _ in range(ns)]
        u_c = [rand_c(shape[1:]) for _ in range(group)]
        got = mb._nested_subset_sum(
            [ds_tuple(m) for m in mads_c], [ds_tuple(x) for x in u_c], group
        )
        want = np.zeros(shape, dtype=np.complex128)
        for m in range(1, 1 << group):
            c = np.ones(shape[1:], dtype=np.complex128)
            for j in range(group):
                if m & (1 << j):
                    c = c * u_c[j]
            want = want + c[None] * mads_c[m - 1]
        got_c = (np.asarray(got[0]) + np.asarray(got[1])) + 1j * (
            np.asarray(got[2]) + np.asarray(got[3])
        )
        np.testing.assert_allclose(got_c, want, rtol=1e-5, atol=1e-5)


class TestMultibitPBS:
    @pytest.mark.parametrize("group", [2, 3])
    def test_pbs_multibit_decrypt_matches(self, material, group):
        """Multi-bit PBS (g = 2 divides n0 = 16; g = 3 pads to 18)
        decodes to LUT[m] for all 8 messages."""
        lwe_sk, glwe_sk = material
        msgs = np.arange(8, dtype=np.uint64)
        fn = lambda x: (3 * x + 1) % 8
        lut_limb = lb.from_u64_np(bootstrap.generate_lut_np([fn], GLWE, BITS))
        ct_limb = _encrypt_batch(lwe_sk, msgs)

        bsk_mb = mb.generate_multibit_bsk(k(2), lwe_sk, glwe_sk, GLWE, RADIX, group)
        bsk_mb_freq = bu.bsk_to_freq_u32(np.asarray(bsk_mb), use_pallas=False)

        out = mb.programmable_bootstrap_multibit_u32(
            ct_limb, lut_limb, bsk_mb_freq, LWE, GLWE, RADIX, group,
            use_pallas=False,
        )
        np.testing.assert_array_equal(_decode(out, glwe_sk, 8), fn(msgs))

    def test_matches_single_bit_path(self, material):
        """g=2 multi-bit and single-bit phase_rot blind rotations decode
        identically (they differ only in bounded noise)."""
        lwe_sk, glwe_sk = material
        msgs = np.array([0, 1, 5, 7], dtype=np.uint64)
        fn = lambda x: (x * x) % 8
        lut_limb = lb.from_u64_np(bootstrap.generate_lut_np([fn], GLWE, BITS))
        ct_limb = _encrypt_batch(lwe_sk, msgs, seed=9)

        keys = jax.random.split(k(3), LWE.dim)
        rows = jnp.stack(
            [
                enc.encrypt_ggsw_scalar(keys[i], lwe_sk[i], glwe_sk, GLWE, RADIX)
                for i in range(LWE.dim)
            ],
            0,
        )
        bsk_freq = bu.bsk_to_freq_u32(np.asarray(rows), use_pallas=False)
        bsk_mb = mb.generate_multibit_bsk(k(4), lwe_sk, glwe_sk, GLWE, RADIX, 2)
        bsk_mb_freq = bu.bsk_to_freq_u32(np.asarray(bsk_mb), use_pallas=False)

        out_1 = bu.programmable_bootstrap_u32(
            ct_limb, lut_limb, bsk_freq, LWE, GLWE, RADIX,
            use_pallas=False, phase_rot=True,
        )
        out_mb = mb.programmable_bootstrap_multibit_u32(
            ct_limb, lut_limb, bsk_mb_freq, LWE, GLWE, RADIX, 2,
            use_pallas=False,
        )
        np.testing.assert_array_equal(
            _decode(out_1, glwe_sk, 4), _decode(out_mb, glwe_sk, 4)
        )
        np.testing.assert_array_equal(_decode(out_mb, glwe_sk, 4), fn(msgs))
