"""u32-limb torus arithmetic vs the u64 reference ops (bit-exactness).

These run on CPU under x64 (conftest) so the u64 ground truth exists;
the limb ops themselves only use u32/i32/f32 and are what the x64-free
TPU pipeline runs.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from spf_tpu.ops import limb32 as lb
from spf_tpu.ops import decomp, torus
from spf_tpu.ops.ciphertext import modulus_switch as ms_u64
from spf_tpu.params import RadixDecomposition

RNG = np.random.default_rng(42)


def rand_u64(shape, edge=True):
    x = RNG.integers(0, 1 << 64, size=shape, dtype=np.uint64)
    if edge and x.size >= 8:
        flat = x.reshape(-1)
        flat[0] = 0
        flat[1] = (1 << 64) - 1
        flat[2] = 1 << 63
        flat[3] = (1 << 63) - 1
        flat[4] = (1 << 32) - 1
        flat[5] = 1 << 32
        flat[6] = 0xFFFFFFFF_80000000
        flat[7] = 0x00000000_FFFFFFFF
    return x


def to_np(a):
    return lb.to_u64_np(a)


class TestLimbArith:
    def test_round_trip(self):
        x = rand_u64((64,))
        np.testing.assert_array_equal(to_np(lb.from_u64_np(x)), x)

    def test_add_sub_neg(self):
        x, y = rand_u64((256,)), rand_u64((256,), edge=False)
        a, b = lb.from_u64_np(x), lb.from_u64_np(y)
        np.testing.assert_array_equal(to_np(lb.add(a, b)), x + y)
        np.testing.assert_array_equal(to_np(lb.sub(a, b)), x - y)
        np.testing.assert_array_equal(to_np(lb.neg(a)), np.uint64(0) - x)

    def test_add_small(self):
        x = rand_u64((64,))
        a = lb.from_u64_np(x)
        for c in (1, 0xFFFFFFFF, 1 << 32, 0xDEADBEEF_12345678):
            hi, lo = (c >> 32) & 0xFFFFFFFF, c & 0xFFFFFFFF
            np.testing.assert_array_equal(
                to_np(lb.add_small(a, hi, lo)), x + np.uint64(c)
            )

    def test_shr_round(self):
        x = rand_u64((64,))
        a = lb.from_u64_np(x)
        for n in (0, 1, 11, 31, 32, 33, 52, 63):
            expected = np.asarray(torus.shr_round(jnp.asarray(x), n))
            np.testing.assert_array_equal(to_np(lb.shr_round(a, n)), expected, err_msg=f"n={n}")

    def test_modulus_switch(self):
        x = rand_u64((64,))
        a = lb.from_u64_np(x)
        for (chi, v, m) in [(0, 0, 10), (2, 0, 10), (0, 3, 10), (2, 3, 10), (0, 0, 12), (0, 2, 12)]:
            expected = np.asarray(ms_u64(jnp.asarray(x), chi, v, m)).astype(np.uint32)
            got = np.asarray(lb.modulus_switch(a, chi, v, m))
            np.testing.assert_array_equal(got, expected, err_msg=f"{(chi, v, m)}")

    @pytest.mark.parametrize(
        "radix",
        [
            RadixDecomposition(count=2, radix_log=16),  # pbs (fits hi limb)
            RadixDecomposition(count=4, radix_log=4),  # cbs
            RadixDecomposition(count=6, radix_log=7),  # tr (crosses limb)
            RadixDecomposition(count=15, radix_log=3),  # ss (crosses limb)
            RadixDecomposition(count=6, radix_log=2),  # ks
            RadixDecomposition(count=4, radix_log=16),  # full 64-bit
            RadixDecomposition(count=2, radix_log=17),  # pfks
        ],
    )
    def test_decompose_matches_u64(self, radix):
        x = rand_u64((128,))
        a = lb.from_u64_np(x)
        expected = np.asarray(decomp.decompose(jnp.asarray(x), radix))
        got = np.asarray(lb.decompose(a, radix)).astype(np.int64)
        np.testing.assert_array_equal(got, expected)


class TestDsBoundary:
    def test_to_ds_value(self):
        x = rand_u64((256,))
        signed = x.astype(np.int64).astype(np.float64)
        hi, lo = lb.to_ds(lb.from_u64_np(x))
        got = np.asarray(hi).astype(np.float64) + np.asarray(lo).astype(np.float64)
        # top ~48 bits captured: error below 2^16
        assert np.abs(got - signed).max() <= (1 << 16)

    def test_to_ds_matches_from_i64(self):
        x = rand_u64((256,))
        a_hi, a_lo = lb.to_ds(lb.from_u64_np(x))
        from spf_tpu.ops import ds

        b_hi, b_lo = ds.from_i64(jnp.asarray(x).astype(jnp.int64))
        got = np.asarray(a_hi).astype(np.float64) + np.asarray(a_lo).astype(np.float64)
        ref = np.asarray(b_hi).astype(np.float64) + np.asarray(b_lo).astype(np.float64)
        # each representation carries ~48 bits; they may differ by their
        # documented error bounds at the int64-boundary edge cases
        np.testing.assert_allclose(got, ref, rtol=0.0, atol=float(1 << 17))

    def test_from_ds_small_integers(self):
        # exact for integers below 2^31: round-trips bit-for-bit
        v = RNG.integers(-(1 << 30), 1 << 30, size=(256,))
        hi = jnp.asarray(v.astype(np.float32))
        lo = jnp.asarray((v - np.asarray(hi).astype(np.int64)).astype(np.float32))
        got = to_np(lb.from_ds(hi, lo))
        np.testing.assert_array_equal(got, v.astype(np.uint64))

    def test_from_ds_large_matches_mod_q(self):
        # large magnitudes (IFFT-scale): within the documented 2^9 slop
        # of the exact mod-2^64 reduction
        from spf_tpu.ops import ds

        for scale in (2.0**40, 2.0**55, 2.0**70, 2.0**84):
            v = RNG.uniform(-1.0, 1.0, size=(256,)) * scale
            vh = v.astype(np.float32)
            vl = (v - vh.astype(np.float64)).astype(np.float32)
            got = to_np(lb.from_ds(jnp.asarray(vh), jnp.asarray(vl))).astype(np.int64)
            ref = np.asarray(
                ds.to_u64_mod_q(jnp.asarray(vh), jnp.asarray(vl))
            ).astype(np.int64)
            diff = np.abs((got - ref)).max()
            assert diff <= (1 << 9), (scale, diff)
