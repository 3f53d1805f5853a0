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
