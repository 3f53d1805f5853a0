"""On-device u32-limb keygen/encryption must agree with the u64 path:
exact products bit-for-bit, encryption at decrypt level, and a full PBS
with a u32-generated bootstrap key (≙ `rand.rs`,
`glwe/glev/ggsw_encryption.rs`, `programmable_bootstrapping.rs:34-58`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spf_tpu.ops import bootstrap, bootstrap_u32 as bu, encryption as enc
from spf_tpu.ops import encryption_u32 as eu, limb32 as lb, poly, torus
from spf_tpu.params import GlweDef, LweDef, RadixDecomposition

KEY = jax.random.key(4321)
LWE = LweDef(dim=24, std=1e-16)
GLWE = GlweDef(size=2, degree=64, std=1e-16)
GLWE1 = GlweDef(size=1, degree=64, std=1e-16)
RADIX = RadixDecomposition(count=2, radix_log=16)


def k(i):
    return jax.random.fold_in(KEY, i)


class TestExactProduct:
    def test_negacyclic_mul_binary_exact(self):
        rng = np.random.default_rng(0)
        for n in (16, 64, 2048):
            a = rng.integers(0, 1 << 64, size=(n,), dtype=np.uint64)
            s = rng.integers(0, 2, size=(n,), dtype=np.uint64)
            want = np.asarray(poly.negacyclic_mul_exact(jnp.asarray(a), jnp.asarray(s)))
            got = lb.to_u64_np(
                eu.negacyclic_mul_binary(lb.from_u64_np(a), jnp.asarray(s.astype(np.uint32)))
            )
            np.testing.assert_array_equal(got, want)

    def test_batched_leading_dims(self):
        rng = np.random.default_rng(1)
        a = rng.integers(0, 1 << 64, size=(3, 2, 64), dtype=np.uint64)
        s = rng.integers(0, 2, size=(64,), dtype=np.uint64)
        want = np.stack([
            np.stack([
                np.asarray(poly.negacyclic_mul_exact(jnp.asarray(a[i, j]), jnp.asarray(s)))
                for j in range(2)
            ]) for i in range(3)
        ])
        got = lb.to_u64_np(
            eu.negacyclic_mul_binary(lb.from_u64_np(a), jnp.asarray(s.astype(np.uint32)))
        )
        np.testing.assert_array_equal(got, want)


class TestSampling:
    def test_uniform_matches_u64_path_bitexact(self):
        from spf_tpu.ops import rng as rng_mod

        u = np.asarray(rng_mod.uniform_torus(k(0), (5, 7)))
        hi, lo = eu.uniform_limb(k(0), (5, 7))
        np.testing.assert_array_equal(lb.to_u64_np((hi, lo)), u)

    def test_normal_scale(self):
        std = 7.25e-5
        hi, lo = eu.normal_limb(k(1), std, (4096,))
        e = lb.to_u64_np((hi, lo)).astype(np.int64).astype(np.float64)
        measured = e.std() / 2.0**64
        assert 0.8 * std < measured < 1.2 * std

    def test_binary_matches(self):
        from spf_tpu.ops import rng as rng_mod

        b64 = np.asarray(rng_mod.binary(k(2), (100,)))
        b32 = np.asarray(eu.binary_u32(k(2), (100,)))
        np.testing.assert_array_equal(b32.astype(np.uint64), b64)


class TestEncryptDecrypt:
    def test_glwe_roundtrip_under_u64_decrypt(self):
        sk = enc.generate_glwe_sk(k(3), GLWE)
        sk32 = jnp.asarray(np.asarray(sk).astype(np.uint32))
        msg = jnp.arange(GLWE.degree, dtype=jnp.uint64) << jnp.uint64(60)
        ct = eu.encrypt_glwe_u32(k(4), lb.from_u64_np(np.asarray(msg)), sk32, GLWE)
        ct_u64 = jnp.asarray(lb.to_u64_np(ct))
        dec = torus.decode(enc.decrypt_glwe(ct_u64, sk, GLWE), 4)
        np.testing.assert_array_equal(np.asarray(dec), np.arange(GLWE.degree) % 16)

    def test_ggsw_scalar_decrypts(self):
        sk = enc.generate_glwe_sk(k(5), GLWE)
        sk32 = jnp.asarray(np.asarray(sk).astype(np.uint32))
        for bit in (0, 1):
            ct = eu.encrypt_ggsw_scalar_u32(k(6 + bit), jnp.uint32(bit), sk32, GLWE, RADIX)
            ct_u64 = jnp.asarray(lb.to_u64_np(ct))
            m = enc.decrypt_ggsw(ct_u64, sk, GLWE, RADIX)
            assert int(np.asarray(m)[0]) == bit


class TestPBSWithU32Key:
    def test_pbs_decrypts_with_u32_generated_bsk(self):
        lwe_sk = enc.generate_lwe_sk(k(10), LWE)
        glwe_sk = enc.generate_glwe_sk(k(11), GLWE1)
        bsk_limb = eu.generate_bootstrap_key_u32(
            k(12),
            jnp.asarray(np.asarray(lwe_sk).astype(np.uint32)),
            jnp.asarray(np.asarray(glwe_sk).astype(np.uint32)),
            LWE, GLWE1, RADIX,
        )
        bsk_freq = bu.bsk_to_freq_u32(lb.to_u64_np(bsk_limb), use_pallas=False)

        bits = 3
        fn = lambda x: (x + 3) % 8
        lut_limb = lb.from_u64_np(bootstrap.generate_lut_np([fn], GLWE1, bits))
        msgs = jnp.arange(8, dtype=jnp.uint64)
        cts = jax.vmap(
            lambda kk, m: enc.encrypt_lwe(kk, torus.encode(m, 4), lwe_sk, LWE)
        )(jax.random.split(k(13), 8), msgs)
        ct_limb = lb.from_u64_np(np.asarray(cts).T)
        out = bu.programmable_bootstrap_u32(
            ct_limb, lut_limb, bsk_freq, LWE, GLWE1, RADIX,
            use_pallas=False, phase_rot=True,
        )
        sk_flat = enc.glwe_sk_to_lwe_sk(glwe_sk)
        dec = torus.decode(
            enc.decrypt_lwe(jnp.asarray(lb.to_u64_np(out)).T, sk_flat, GLWE1.as_lwe_def()),
            bits,
        )
        np.testing.assert_array_equal(np.asarray(dec), fn(np.arange(8)))


class TestOnDeviceKeygenFull:
    """The round-4 on-device generators (multi-bit BSK, automorphism,
    scheme-switch, LWE-keyswitch keys) must work end-to-end: a full
    conversion cycle (CBS -> CMux -> extract -> keyswitch) with ALL keys
    generated by `encryption_u32` decrypts correctly
    (≙ reference in-process keygen, `high_level.rs` keygen +
    `circuit_bootstrapping.rs:342-385`)."""

    def test_multibit_products_match_np(self):
        from spf_tpu.ops import multibit as mb

        sk = np.asarray([1, 0, 1, 1, 0, 1, 1], dtype=np.uint64)
        for g in (2, 3):
            want = mb.multibit_key_products_np(sk, g)
            got = np.asarray(
                eu.multibit_key_products_u32(
                    jnp.asarray(sk.astype(np.uint32)), g
                )
            )
            np.testing.assert_array_equal(got.astype(np.uint64), want)

    def test_ksk_masks_match_u64_generator(self):
        from spf_tpu.ops import keyswitch as ks_mod
        from spf_tpu.params import RadixDecomposition as RD

        ks_radix = RD(count=3, radix_log=6)
        old = LweDef(dim=16, std=1e-16)
        new = LweDef(dim=12, std=1e-16)
        old_sk = enc.generate_lwe_sk(k(20), old)
        new_sk = enc.generate_lwe_sk(k(21), new)
        want = np.asarray(
            ks_mod.generate_lwe_keyswitch_key(k(22), old_sk, new_sk, old, new, ks_radix)
        )
        got = lb.to_u64_np(
            eu.generate_lwe_keyswitch_key_u32(
                k(22),
                jnp.asarray(np.asarray(old_sk).astype(np.uint32)),
                jnp.asarray(np.asarray(new_sk).astype(np.uint32)),
                old, new, ks_radix,
            )
        )
        # masks (a-part) are bit-identical (same PRNG split structure +
        # uniform bits); b differs by two independent noise draws
        # (f32 vs f64 sampling paths), each N(0, 1e-16 * 2^64 ~ 1845):
        # |diff| <= 8 sigma of the difference distribution
        np.testing.assert_array_equal(got[..., :-1], want[..., :-1])
        db = (got[..., -1] - want[..., -1]).astype(np.int64)
        assert np.abs(db).max() <= 8 * 2609

    def test_full_cycle_with_u32_keys(self):
        from spf_tpu.ops import cbs_u32 as cu
        from spf_tpu.ops.keyswitch_u32 import keyswitch_lwe_u32, ksk_to_byte_planes
        from spf_tpu.params import Params, RadixDecomposition as RD

        P = Params(
            l0_params=LweDef(dim=32, std=1e-16),
            l1_params=GlweDef(size=1, degree=64, std=1e-16),
            cbs_radix=RD(count=2, radix_log=9),
            pbs_radix=RD(count=2, radix_log=16),
            ks_radix=RD(count=9, radix_log=4),
            pfks_radix=RD(count=4, radix_log=11),
            ss_radix=RD(count=6, radix_log=8),
            tr_radix=RD(count=6, radix_log=7),
        )
        glwe, lwe = P.l1_params, P.l0_params
        g = 2
        lwe_sk32 = eu.binary_u32(k(30), (lwe.dim,))
        glwe_sk32 = eu.binary_u32(k(31), (glwe.size, glwe.degree))
        bskmb = eu.generate_multibit_bsk_u32(
            k(32), lwe_sk32, glwe_sk32, glwe, P.pbs_radix, g
        )
        ak = eu.generate_automorphism_keys_u32(k(33), glwe_sk32, glwe, P.tr_radix)
        ssk = eu.generate_scheme_switch_key_u32(k(34), glwe_sk32, glwe, P.ss_radix)
        ksk = eu.generate_lwe_keyswitch_key_u32(
            k(35), glwe_sk32.reshape(-1), lwe_sk32, glwe.as_lwe_def(), lwe,
            P.ks_radix,
        )
        bsk_freq = bu.bsk_to_freq_u32(lb.to_u64_np(bskmb), use_pallas=False)
        ak_freq = bu.bsk_to_freq_u32(lb.to_u64_np(ak), use_pallas=False)
        ssk_freq = bu.bsk_to_freq_u32(lb.to_u64_np(ssk), use_pallas=False)
        ksk_planes = ksk_to_byte_planes(lb.to_u64_np(ksk))

        bits_in = np.array([0, 1, 1, 0, 1, 0, 0, 1], dtype=np.uint64)
        B = bits_in.size
        lwe_sk_np = np.asarray(lwe_sk32).astype(np.uint64)
        rng = np.random.default_rng(7)
        a = rng.integers(0, 1 << 64, size=(B, lwe.dim), dtype=np.uint64)
        b = (a * lwe_sk_np[None, :]).sum(axis=1, dtype=np.uint64) + (
            bits_in << np.uint64(63)
        )
        cts = lb.from_u64_np(np.concatenate([a, b[:, None]], axis=1).T)

        n1 = glwe.degree
        m1_np = np.zeros((glwe.size + 1, n1, B), dtype=np.uint64)
        m1_np[-1, :, :] = np.uint64(1) << np.uint64(63)
        m1 = lb.from_u64_np(m1_np)

        ggsw = cu.circuit_bootstrap_u32(
            cts, bsk_freq, ak_freq, ssk_freq, P, use_pallas=False
        )
        m0 = lb.zeros((glwe.size + 1, n1, B))
        sel = bu.cmux_u32(m0, m1, ggsw, glwe, P.cbs_radix, False)
        l1 = bu.sample_extract_u32(sel, 0, glwe)
        l0 = keyswitch_lwe_u32(l1, ksk_planes, glwe.as_lwe_def(), lwe, P.ks_radix)

        l0_np = lb.to_u64_np(jax.device_get(l0)).T
        ph = l0_np[:, -1] - (l0_np[:, :-1] * lwe_sk_np[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        rb = (ph >> np.uint64(62)) & np.uint64(1)
        dec = ((ph >> np.uint64(63)) + rb) & np.uint64(1)
        np.testing.assert_array_equal(dec, bits_in)
