"""The Pallas-kernel FFT math (roll+select DIF/DIT, scrambled-frequency
convention) verified via its pure-jnp twins against the c128 oracle.
(The Mosaic compile path is exercised on TPU only; see module docstring.)"""

import jax.numpy as jnp
import numpy as np
import pytest

from spf_tpu.ops import ds, fft, fft_pallas as fp

RNG = np.random.default_rng(77)
C128 = fft.get_backend("c128")


class TestScrambledFrequencyFFT:
    @pytest.mark.parametrize("n", [64, 512, 2048])
    def test_roundtrip(self, n):
        x = jnp.asarray(RNG.integers(0, 1 << 64, size=(n, 8), dtype=np.uint64))
        hi, lo = ds.from_i64(x.astype(jnp.int64))
        back = ds.to_u64_mod_q(*fp.inv_ds_ref(fp.fwd_ds_ref(hi, lo)))
        err = np.abs((np.asarray(back) - np.asarray(x)).astype(np.int64)).max()
        assert err < (1 << 24), np.log2(err + 1)

    def test_convolution_matches_oracle(self):
        n = 2048
        x = jnp.asarray(RNG.integers(0, 1 << 64, size=(n, 8), dtype=np.uint64))
        d = jnp.asarray(RNG.integers(-(1 << 15), 1 << 15, size=(n, 8), dtype=np.int64))
        hi, lo = ds.from_i64(x.astype(jnp.int64))
        dhi, dlo = ds.from_i64(d)
        fa = fp.fwd_ds_ref(hi, lo)
        fd = fp.fwd_ds_ref(dhi, dlo)
        got = np.asarray(ds.to_u64_mod_q(*fp.inv_ds_ref(fp._cmul_parts(*fa, *fd))))
        ref = np.asarray(
            C128.inv(C128.mul(C128.fwd_torus(x.T), C128.fwd_signed(d.T)))
        ).T
        err = (got - ref).astype(np.int64)
        # both paths carry ~2^31-2^37 numeric noise; they must agree within it
        assert np.abs(err).max() < (1 << 40), np.log2(np.abs(err).max())


class TestMadPallas:
    def test_fused_mad_horner_matches_xla(self):
        """`mad_pallas.mad_horner_fused` (interpret mode) must match
        freq_mad + _nested_subset_sum on the same operands. CPU-only
        tolerance: XLA:CPU contracts a*b+c into fma inside the
        reference path's fusions (perturbing the ds transforms), so
        the two differ by ~1e-5 relative here; on TPU (no contraction)
        the paths are exact and the kernel is decrypt-verified by the
        PBS bench (256/256, margins unchanged)."""
        from spf_tpu.ops.bootstrap_u32 import freq_mad
        from spf_tpu.ops.mad_pallas import mad_horner_fused
        from spf_tpu.ops.multibit import _nested_subset_sum
        from spf_tpu.params import GlweDef, RadixDecomposition

        glwe = GlweDef(size=1, degree=256, std=1e-16)
        radix = RadixDecomposition(count=2, radix_log=16)
        group, ns = 3, 7
        l, kp1, k_, b = 2, 2, 128, 128
        rng = np.random.default_rng(42)
        f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
        dfft = tuple(f(l, kp1, k_, b) for _ in range(4))
        row = tuple(f(ns, kp1, l, kp1, k_) for _ in range(4))
        u_list = [tuple(f(k_, b) for _ in range(4)) for _ in range(group)]
        u_st = tuple(
            jnp.stack([u_list[j][c] for j in range(group)])
            for c in range(4)
        )
        mads = [
            freq_mad(dfft, tuple(c[m] for c in row), glwe, radix)
            for m in range(ns)
        ]
        ref = _nested_subset_sum(mads, u_list, group)
        got = mad_horner_fused(dfft, row, u_st, group, interpret=True)
        for i, (a, bb) in enumerate(zip(got, ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(bb), rtol=1e-2, atol=1e-3,
                err_msg=f"component {i}",
            )
