"""The x64-free u32-limb bootstrap pipeline must agree with the u64
t-layout path (bit-exact where no float rounding is involved, decrypt-
level through the FFT)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spf_tpu.ops import bootstrap, bootstrap_tpu as bt, bootstrap_u32 as bu
from spf_tpu.ops import encryption as enc, fft, limb32 as lb, torus
from spf_tpu.params import GlweDef, LweDef, RadixDecomposition

KEY = jax.random.key(77)
# deliberately tiny: XLA:CPU compile time on the limb pipeline is
# super-linear in the unrolled FFT size (the TPU path is the production
# target; CPU only checks semantics)
LWE = LweDef(dim=32, std=1e-16)
GLWE = GlweDef(size=1, degree=64, std=1e-16)
RADIX = RadixDecomposition(count=2, radix_log=16)


def k(i):
    return jax.random.fold_in(KEY, i)


def to_limbs(x_u64):
    return lb.from_u64_np(np.asarray(x_u64))


def from_limbs(a):
    return lb.to_u64_np(a)


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


class TestLimbFFT:
    def test_roundtrip_exact_small(self):
        rng = np.random.default_rng(1)
        x = rng.integers(0, 1 << 40, size=(3, 64, 4), dtype=np.uint64)
        a = to_limbs(x)
        back = bu.inv_limb(bu.fwd_limb(a, use_pallas=False), use_pallas=False)
        np.testing.assert_array_equal(from_limbs(back), x)

    def test_fwd_matches_c128_scrambled(self):
        """Scrambled-frequency output must be a permutation of the c128
        oracle's spectrum (same multiset of values)."""
        rng = np.random.default_rng(2)
        C128 = fft.get_backend("c128")
        x = rng.integers(0, 1 << 64, size=(256,), dtype=np.uint64)
        ref = np.sort_complex(np.asarray(C128.fwd_torus(jnp.asarray(x))))
        f = bu.fwd_limb(tuple(c[:, None] for c in to_limbs(x)), use_pallas=False)
        got = (
            np.asarray(f[0], np.float64)
            + np.asarray(f[1], np.float64)
            + 1j * (np.asarray(f[2], np.float64) + np.asarray(f[3], np.float64))
        )[:, 0]
        got = np.sort_complex(got)
        assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-9


class TestLimbOps:
    def test_monomial_mul_matches_u64(self):
        rng = np.random.default_rng(3)
        n, b = 128, 8
        x = rng.integers(0, 1 << 64, size=(2, n, b), dtype=np.uint64)
        t = rng.integers(0, 2 * n, size=(b,))
        ref = np.asarray(bt.monomial_mul_t(jnp.asarray(x), jnp.asarray(t, np.uint64)))
        got = from_limbs(bu.monomial_mul_u32(to_limbs(x), jnp.asarray(t, np.uint32)))
        np.testing.assert_array_equal(got, ref)

    def test_sample_extract_matches_u64(self):
        rng = np.random.default_rng(4)
        n, b = 128, 4
        x = rng.integers(0, 1 << 64, size=(2, n, b), dtype=np.uint64)
        for h in (0, 1, n - 1, n // 2):
            ref = np.asarray(bt.sample_extract_t(jnp.asarray(x), h, GLWE))
            got = from_limbs(bu.sample_extract_u32(to_limbs(x), h, GLWE))
            np.testing.assert_array_equal(got, ref, err_msg=f"h={h}")

    def test_modulus_switch_matches_u64(self):
        rng = np.random.default_rng(5)
        x = rng.integers(0, 1 << 64, size=(65, 8), dtype=np.uint64)
        from spf_tpu.ops.ciphertext import lwe_modulus_switch

        ref = np.asarray(lwe_modulus_switch(jnp.asarray(x), 0, 0, 8))
        got = np.asarray(bu.lwe_modulus_switch_u32(to_limbs(x), 0, 0, 8))
        np.testing.assert_array_equal(got.astype(np.uint64), ref)


class TestLimbPBS:
    def test_matches_u64_path_decrypt_level(self, material):
        lwe_sk, glwe_sk, bsk_coeff = material
        bsk_t = bt.bsk_to_t(bsk_coeff)
        bsk_u32 = bu.bsk_to_freq_u32(np.asarray(bsk_coeff))
        lut = bootstrap.generate_lut([lambda x: (x * 3 + 1) % 8], GLWE, 3)
        msgs = jnp.arange(8, dtype=jnp.uint64)
        cts = jax.vmap(
            lambda kk, m: enc.encrypt_lwe(kk, torus.encode(m, 4), lwe_sk, LWE)
        )(jax.random.split(k(3), 8), msgs)

        t_out = bt.from_t_layout(
            jax.jit(
                lambda c: bt.programmable_bootstrap_t(c, lut, bsk_t, LWE, GLWE, RADIX)
            )(bt.to_t_layout(cts))
        )
        cts_t = np.asarray(bt.to_t_layout(cts))
        lut_limb = to_limbs(np.asarray(lut))
        u32_out = jax.jit(
            lambda c: bu.programmable_bootstrap_u32(
                c, lut_limb, bsk_u32, LWE, GLWE, RADIX, use_pallas=False
            )
        )(to_limbs(cts_t))
        u32_out_u64 = jnp.asarray(from_limbs(u32_out)).T  # -> [B, kN+1]

        sk_flat = enc.glwe_sk_to_lwe_sk(glwe_sk)
        dec_t = torus.decode(enc.decrypt_lwe(t_out, sk_flat, GLWE.as_lwe_def()), 3)
        dec_u = torus.decode(enc.decrypt_lwe(u32_out_u64, sk_flat, GLWE.as_lwe_def()), 3)
        np.testing.assert_array_equal(np.asarray(dec_u), np.asarray(dec_t))
        np.testing.assert_array_equal(np.asarray(dec_u), (np.arange(8) * 3 + 1) % 8)

    def test_jitted_x32_graph(self, material):
        """The whole PBS must trace/jit with only u32/i32/f32 dtypes (the
        x64-free production property, checked by dtype inspection)."""
        lwe_sk, glwe_sk, bsk_coeff = material
        bsk_u32 = bu.bsk_to_freq_u32(np.asarray(bsk_coeff))
        lut = bootstrap.generate_lut([lambda x: x], GLWE, 3)
        lut_limb = to_limbs(np.asarray(lut))
        cts = jnp.zeros((LWE.dim + 1, 4), dtype=jnp.uint64)
        cts_limb = to_limbs(np.asarray(cts))

        def step(c, lut_limb, bsk_u32):
            return bu.programmable_bootstrap_u32(
                c, lut_limb, bsk_u32, LWE, GLWE, RADIX, use_pallas=False
            )

        import re

        import jax as _jax

        # lower under x32 promotion rules (the production process runs
        # with SPF_TPU_X32=1, i.e. x64 disabled — index promotions there
        # are i32); keys passed as args (closure constants would be
        # printed into the HLO text below, megabytes of literals)
        with _jax.enable_x64(False):
            lowered = _jax.jit(step).lower(cts_limb, lut_limb, bsk_u32)
        text = lowered.as_text()
        for bad in ("i64", "ui64", "f64"):
            hits = re.findall(rf"tensor<[0-9x]*{bad}", text)
            assert not hits, f"64-bit dtype {bad} leaked into the x32 graph: {hits[:5]}"
        out = _jax.jit(step)(cts_limb, lut_limb, bsk_u32)
        assert out[0].dtype == jnp.uint32


class TestFusedRotDecomp:
    """The fused Pallas rotate+decompose kernels (interpret mode on CPU)
    must match the separate XLA ops bit-for-bit."""

    def _acc(self, b=128):
        rng = np.random.default_rng(5)
        acc64 = rng.integers(0, 1 << 64, size=(GLWE.size + 1, GLWE.degree, b),
                             dtype=np.uint64)
        t = jnp.asarray(rng.integers(0, 2 * GLWE.degree, size=(b,)), jnp.uint32)
        return to_limbs(acc64), t

    def test_rotate_sub_decompose_matches_xla(self):
        from spf_tpu.ops.rot_decomp_pallas import rotate_sub_decompose

        acc, t = self._acc()
        got = rotate_sub_decompose(acc, t, RADIX, interpret=True)
        rot = bu.monomial_mul_u32(acc, t)
        want = lb.decompose(lb.sub(rot, acc), RADIX).astype(jnp.float32)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_rotate_sub_decompose_acc_matches_xla(self):
        from spf_tpu.ops.rot_decomp_pallas import rotate_sub_decompose_acc

        acc, t = self._acc()
        rng = np.random.default_rng(6)
        shape = acc[0].shape
        prod = (
            jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 2**34),
            jnp.asarray(rng.standard_normal(shape).astype(np.float32)),
        )
        digs, acc_new = rotate_sub_decompose_acc(acc, prod, t, RADIX, interpret=True)
        want_acc = lb.add(acc, lb.from_ds(*prod))
        rot = bu.monomial_mul_u32(want_acc, t)
        want_digs = lb.decompose(lb.sub(rot, want_acc), RADIX).astype(jnp.float32)
        np.testing.assert_array_equal(np.asarray(acc_new[0]), np.asarray(want_acc[0]))
        np.testing.assert_array_equal(np.asarray(acc_new[1]), np.asarray(want_acc[1]))
        np.testing.assert_array_equal(np.asarray(digs), np.asarray(want_digs))
