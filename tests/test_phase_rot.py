"""Frequency-domain rotation (phase_rot) must agree with the
coefficient-domain rotation path: the phase formula diagonalizes
monomial multiplication under the twisted negacyclic FFT, and the
whole phase-rotation blind rotate / PBS decrypt-matches the standard
path (they differ only in the bounded decomposition-reconstruction
error; ≙ `programmable_bootstrapping.rs:385-409` semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spf_tpu.ops import bootstrap, bootstrap_u32 as bu, encryption as enc
from spf_tpu.ops import fft_ds32_t as ft, limb32 as lb, phase_rot as pr, poly
from spf_tpu.params import GlweDef, LweDef, RadixDecomposition

KEY = jax.random.key(1234)
LWE = LweDef(dim=32, std=1e-16)
GLWE = GlweDef(size=1, degree=64, std=1e-16)
RADIX = RadixDecomposition(count=2, radix_log=16)


def k(i):
    return jax.random.fold_in(KEY, i)


def _to_c128(f):
    return (
        np.asarray(f[0], np.float64) + np.asarray(f[1], np.float64)
    ) + 1j * (np.asarray(f[2], np.float64) + np.asarray(f[3], np.float64))


class TestPhaseFormula:
    def test_phase_diagonalizes_rotation(self):
        """fwd(x * X^t) == fwd(x) * phase(t) bin-by-bin (natural order)."""
        n = 64
        rng = np.random.default_rng(0)
        x = rng.integers(0, 1 << 62, size=(n,), dtype=np.uint64)
        for t in (0, 1, 7, n - 1, n, 2 * n - 1):
            base = _to_c128(ft.fwd_torus_t(jnp.asarray(x)[:, None]))[:, 0]
            rot = poly.monomial_mul(jnp.asarray(x), t)
            want = _to_c128(ft.fwd_torus_t(rot[:, None]))[:, 0]
            pm1 = pr.phase_minus_one(jnp.asarray([t], jnp.uint32), n)
            phase = _to_c128(pm1)[:, 0] + 1.0
            got = base * phase
            scale = np.abs(want).max() + 1.0
            assert np.abs(got - want).max() / scale < 1e-9, t

    def test_phase_minus_one_batch(self):
        """Batched phases match per-element computation."""
        n = 64
        ts = jnp.asarray([0, 3, 127, 64], jnp.uint32)
        batched = _to_c128(pr.phase_minus_one(ts, n))
        for b, t in enumerate(np.asarray(ts)):
            single = _to_c128(pr.phase_minus_one(jnp.asarray([t], jnp.uint32), n))
            np.testing.assert_allclose(batched[:, b], single[:, 0], rtol=1e-6)

    def test_scrambled_perm_is_bitrev(self):
        """The DIF roll kernels emit plain bit-reversed order."""
        for kk in (8, 32, 512):
            perm = pr.scrambled_perm(kk)
            bits = int(np.log2(kk))
            br = np.array(
                [int(f"{i:0{bits}b}"[::-1], 2) for i in range(kk)], dtype=np.int32
            )
            np.testing.assert_array_equal(perm, br)


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
    bsk_freq = bu.bsk_to_freq_u32(np.asarray(bsk_coeff), use_pallas=False)
    return lwe_sk, glwe_sk, bsk_freq


class TestPhaseRotPBS:
    def test_pbs_phase_rot_decrypt_matches(self, material):
        """PBS with phase_rot decodes identically to the standard u32
        path over all messages (batch of 8)."""
        lwe_sk, glwe_sk, bsk_freq = material
        bits = 3
        msgs = np.arange(8, dtype=np.uint64)
        fn = lambda x: (3 * x + 1) % 8
        lut_np = bootstrap.generate_lut_np([fn], GLWE, bits)
        lut_limb = lb.from_u64_np(lut_np)

        keys = jax.random.split(k(5), 8)
        cts = jnp.stack(
            [
                enc.encrypt_lwe(
                    keys[i], jnp.uint64(int(msgs[i]) << (64 - bits - 1)), lwe_sk, LWE
                )
                for i in range(8)
            ],
            axis=1,
        )  # [n0+1, B] u64
        ct_limb = lb.from_u64_np(np.asarray(cts))

        pad = 128 - 8  # lanes must be a multiple of 128 for the limb path
        ct_limb = tuple(jnp.pad(c, ((0, 0), (0, pad))) for c in ct_limb)

        out_std = bu.programmable_bootstrap_u32(
            ct_limb, lut_limb, bsk_freq, LWE, GLWE, RADIX, use_pallas=False
        )
        out_ph = bu.programmable_bootstrap_u32(
            ct_limb, lut_limb, bsk_freq, LWE, GLWE, RADIX,
            use_pallas=False, phase_rot=True,
        )

        sk_flat = np.asarray(glwe_sk).reshape(-1)
        for out in (out_std, out_ph):
            out_np = lb.to_u64_np(out).T[:8]  # [B, kN+1]
            phase = out_np[:, -1] - (out_np[:, :-1] * sk_flat[None, :]).sum(
                axis=1, dtype=np.uint64
            )
            rb = (phase >> np.uint64(64 - bits - 1)) & np.uint64(1)
            dec = ((phase >> np.uint64(64 - bits)) + rb) & np.uint64(7)
            np.testing.assert_array_equal(dec, fn(msgs))

    def test_accumulate_decompose_kernel_matches_xla(self, material):
        """The rolls-free Pallas kernel (interpret mode) == the XLA
        accumulate+decompose composition."""
        from spf_tpu.ops.rot_decomp_pallas import accumulate_decompose

        rng = np.random.default_rng(3)
        acc = lb.from_u64_np(
            rng.integers(0, 1 << 64, size=(2, 64, 128), dtype=np.uint64)
        )
        prod = (
            jnp.asarray(rng.standard_normal((2, 64, 128)).astype(np.float32))
            * 2.0**40,
            jnp.asarray(rng.standard_normal((2, 64, 128)).astype(np.float32)),
        )
        digs, acc2 = accumulate_decompose(acc, prod, RADIX, interpret=True)
        acc_ref = lb.add(acc, lb.from_ds(*prod))
        digs_ref = lb.decompose(acc_ref, RADIX).astype(jnp.float32)
        np.testing.assert_array_equal(np.asarray(acc2[0]), np.asarray(acc_ref[0]))
        np.testing.assert_array_equal(np.asarray(acc2[1]), np.asarray(acc_ref[1]))
        np.testing.assert_array_equal(np.asarray(digs), np.asarray(digs_ref))


class TestPhasePallas:
    def test_pallas_phase_matches_xla(self):
        """The VMEM-resident doubling kernel (interpret mode) must match
        the XLA phase generator to ds accuracy."""
        from spf_tpu.ops.phase_rot import phase_minus_one, phase_minus_one_pallas

        n = 64
        ts = jnp.arange(128, dtype=jnp.uint32) % (2 * n)
        ref = phase_minus_one(ts, n)
        got = phase_minus_one_pallas(ts, n, interpret=True)
        for c in range(4):
            np.testing.assert_allclose(
                np.asarray(got[c]), np.asarray(ref[c]), rtol=0, atol=1e-5
            )
        # combined complex values must agree to ~2^-40 relative
        ref_c = _to_c128(ref)
        got_c = _to_c128(got)
        assert np.abs(ref_c - got_c).max() < 1e-11
