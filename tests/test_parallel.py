"""Multi-device sharding tests on the 8-device virtual CPU mesh
(conftest sets xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spf_tpu.ops import bootstrap, encryption as enc, torus
from spf_tpu.parallel import make_mesh, replicate, shard_batch, sharded_pbs
from spf_tpu.params import GlweDef, LweDef, Params, RadixDecomposition

LWE = LweDef(dim=64, std=1e-16)
GLWE = GlweDef(size=1, degree=128, std=1e-16)
PBS_RADIX = RadixDecomposition(count=2, radix_log=16)
PARAMS = Params(
    l0_params=LWE,
    l1_params=GLWE,
    cbs_radix=RadixDecomposition(count=2, radix_log=9),
    pbs_radix=PBS_RADIX,
    ks_radix=RadixDecomposition(count=9, radix_log=4),
    pfks_radix=RadixDecomposition(count=4, radix_log=11),
    ss_radix=RadixDecomposition(count=6, radix_log=8),
    tr_radix=RadixDecomposition(count=6, radix_log=7),
)

KEY = jax.random.key(4242)


class TestShardedPBS:
    def test_batch_sharded_pbs_8_devices(self):
        assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
        mesh = make_mesh(8)
        lwe_sk = enc.generate_lwe_sk(jax.random.fold_in(KEY, 0), LWE)
        glwe_sk = enc.generate_glwe_sk(jax.random.fold_in(KEY, 1), GLWE)
        bsk = bootstrap.generate_bootstrap_key(
            jax.random.fold_in(KEY, 2), lwe_sk, glwe_sk, LWE, GLWE, PBS_RADIX
        )
        bsk = replicate(bsk, mesh)
        lut = bootstrap.generate_lut([lambda x: (x + 1) % 4], GLWE, 2)

        batch = 16
        msgs = jnp.arange(batch, dtype=jnp.uint64) % 4
        cts = jax.vmap(
            lambda k, m: enc.encrypt_lwe(k, torus.encode(m, 3), lwe_sk, LWE)
        )(jax.random.split(jax.random.fold_in(KEY, 3), batch), msgs)
        cts = shard_batch(cts, mesh)

        step = sharded_pbs(PARAMS, bsk, mesh, lut)
        outs = step(cts)
        # output is sharded over the mesh
        assert len(outs.sharding.device_set) == 8
        dec = torus.decode(
            enc.decrypt_lwe(outs, enc.glwe_sk_to_lwe_sk(glwe_sk), GLWE.as_lwe_def()), 2
        )
        np.testing.assert_array_equal(np.asarray(dec), (np.arange(batch) + 1) % 4)

    def test_sharded_pbs_bitwise_equals_unsharded(self):
        """Sharded output must be BITWISE equal to the single-device run
        (batch sharding changes the partitioning, not the math)."""
        mesh = make_mesh(8)
        lwe_sk = enc.generate_lwe_sk(jax.random.fold_in(KEY, 10), LWE)
        glwe_sk = enc.generate_glwe_sk(jax.random.fold_in(KEY, 11), GLWE)
        bsk = bootstrap.generate_bootstrap_key(
            jax.random.fold_in(KEY, 12), lwe_sk, glwe_sk, LWE, GLWE, PBS_RADIX
        )
        lut = bootstrap.generate_lut([lambda x: (x + 3) % 4], GLWE, 2)
        batch = 16
        msgs = jnp.arange(batch, dtype=jnp.uint64) % 4
        cts = jax.vmap(
            lambda k, m: enc.encrypt_lwe(k, torus.encode(m, 3), lwe_sk, LWE)
        )(jax.random.split(jax.random.fold_in(KEY, 13), batch), msgs)

        unsharded = jax.jit(
            lambda c: bootstrap.programmable_bootstrap_univariate(
                c, lut, bsk, LWE, GLWE, PBS_RADIX
            )
        )(cts)

        step = sharded_pbs(PARAMS, replicate(bsk, mesh), mesh, lut)
        sharded = step(shard_batch(cts, mesh))
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(sharded)), np.asarray(jax.device_get(unsharded))
        )

    def test_sharded_hot_path_has_no_collectives(self):
        """Batch sharding is embarrassingly parallel: the compiled HLO of
        the sharded PBS step must contain NO cross-device collectives —
        the scaling-efficiency guarantee (BASELINE >=80%; here exactly
        linear modulo load imbalance, since zero bytes cross ICI).

        Uses the ds32 backend — the TPU production path, whose FFT is
        hand-rolled butterflies (pure elementwise ops). The c128 CPU
        oracle lowers to the monolithic `fft` HLO, which XLA's SPMD
        partitioner cannot partition along the batch (it inserts
        all-gathers) — a CPU-oracle artifact, not a property of the
        production pipeline."""
        from spf_tpu.ops.fft import get_backend

        be = get_backend("ds32")
        mesh = make_mesh(8)
        lwe_sk = enc.generate_lwe_sk(jax.random.fold_in(KEY, 20), LWE)
        glwe_sk = enc.generate_glwe_sk(jax.random.fold_in(KEY, 21), GLWE)
        bsk = bootstrap.generate_bootstrap_key(
            jax.random.fold_in(KEY, 22), lwe_sk, glwe_sk, LWE, GLWE, PBS_RADIX, be
        )
        lut = bootstrap.generate_lut([lambda x: x], GLWE, 2)
        batch = 16
        cts = jax.vmap(
            lambda k, m: enc.encrypt_lwe(k, torus.encode(m, 3), lwe_sk, LWE)
        )(
            jax.random.split(jax.random.fold_in(KEY, 23), batch),
            jnp.zeros((batch,), jnp.uint64),
        )
        step = sharded_pbs(PARAMS, replicate(bsk, mesh), mesh, lut, be=be)
        hlo = step.lower(shard_batch(cts, mesh)).compile().as_text()
        for coll in (
            "all-reduce", "all-gather", "all-to-all", "collective-permute",
            "reduce-scatter",
        ):
            assert coll not in hlo, f"unexpected collective {coll} on hot path"


class TestShardedCBS:
    def test_sharded_cbs_bitwise_equals_unsharded(self):
        """Full circuit bootstrap under batch sharding, bitwise vs the
        unsharded run (the dryrun's assertion, as a repeatable test)."""
        from spf_tpu.ops import cbs as cbs_ops
        from spf_tpu.parallel import sharded_cbs
        from spf_tpu.runtime import generate_keys

        key, k_enc = jax.random.split(jax.random.fold_in(KEY, 30))
        sk, _, ck = generate_keys(key, PARAMS)
        mesh = make_mesh(8)
        batch = 8
        bits = jnp.arange(batch, dtype=jnp.uint64) % 2
        cts = jax.vmap(
            lambda k, b: enc.encrypt_lwe(k, torus.encode(b, 1), sk.lwe_0, LWE)
        )(jax.random.split(k_enc, batch), bits)

        unsharded = jax.jit(
            lambda c: cbs_ops.circuit_bootstrap(
                c, ck.bsk, ck.auto_keys, ck.ssk, PARAMS
            )
        )(cts)

        step = sharded_cbs(PARAMS, replicate(ck, mesh), mesh)
        sharded = step(shard_batch(cts, mesh))
        for a, b in zip(
            jax.tree_util.tree_leaves(sharded), jax.tree_util.tree_leaves(unsharded)
        ):
            np.testing.assert_array_equal(
                np.asarray(jax.device_get(a)), np.asarray(jax.device_get(b))
            )


class TestShardedMultibit:
    def test_sharded_multibit_pbs_parity_and_no_collectives(self):
        """The PRODUCTION u32 multi-bit PBS, lane-sharded over 8
        devices: decodes identically to the unsharded run, zero
        collectives in the compiled hot path (the phase-factor
        generator keeps [steps, B] unflattened so lane sharding
        survives).

        Parity is at DECODE level, not bitwise: the sharded and
        unsharded jits are different XLA programs, and on XLA:CPU
        fma-contraction/fusion differences perturb the float FFT by
        ~1 ulp; `limb32.from_ds` rounds that into +-1 integer
        accumulator differences whose blind-rotation trajectory then
        diverges into a DIFFERENT equally-valid ciphertext of the same
        message (verified: outputs differ uniformly across the torus
        while every lane decodes identically). The u64 ds32 path's
        bitwise sharding tests above remain bitwise because that
        graph's fusion happens to be partition-stable."""
        from spf_tpu.ops import bootstrap as bs
        from spf_tpu.ops import bootstrap_u32 as bu, limb32 as lb, multibit as mb
        from spf_tpu.parallel import shard_lanes, sharded_pbs_multibit

        assert len(jax.devices()) >= 8
        mesh = make_mesh(8)
        group = 2
        lwe_sk = enc.generate_lwe_sk(jax.random.fold_in(KEY, 10), LWE)
        glwe_sk = enc.generate_glwe_sk(jax.random.fold_in(KEY, 11), GLWE)
        bsk_mb = mb.generate_multibit_bsk(
            jax.random.fold_in(KEY, 12), lwe_sk, glwe_sk, GLWE, PBS_RADIX, group
        )
        bsk_f = bu.bsk_to_freq_u32(np.asarray(bsk_mb), use_pallas=False)
        fn = lambda x: (3 * x + 1) % 4
        lut_limb = lb.from_u64_np(bs.generate_lut_np([fn], GLWE, 2))

        batch = 16
        msgs = np.arange(batch, dtype=np.uint64) % 4
        cts = jnp.stack(
            [
                enc.encrypt_lwe(
                    jax.random.fold_in(KEY, 20 + i),
                    torus.encode(jnp.uint64(m), 3), lwe_sk, LWE,
                )
                for i, m in enumerate(msgs)
            ],
            axis=1,
        )  # t-layout [n0+1, B]
        ct_limb = lb.from_u64_np(np.asarray(cts))

        # unsharded reference
        ref = mb.programmable_bootstrap_multibit_u32(
            ct_limb, lut_limb, bsk_f, LWE, GLWE, PBS_RADIX, group,
            use_pallas=False,
        )

        ct_sharded = shard_lanes(ct_limb, mesh)
        bsk_r = replicate(bsk_f, mesh)
        lut_r = replicate(lut_limb, mesh)
        step = sharded_pbs_multibit(LWE, GLWE, PBS_RADIX, group, bsk_r, lut_r, mesh)
        hlo = step.lower(ct_sharded).compile().as_text()
        for coll in (
            "all-reduce", "all-gather", "all-to-all", "collective-permute",
            "reduce-scatter",
        ):
            assert coll not in hlo, f"collective {coll} on the sharded hot path"
        out = step(ct_sharded)
        assert len(out[0].sharding.device_set) == 8

        from spf_tpu.ops import limb32 as _lb

        sk_flat = np.asarray(glwe_sk).reshape(-1)

        def decode_all(pair):
            arr = _lb.to_u64_np(tuple(np.asarray(jax.device_get(c)) for c in pair)).T
            phase = arr[:, -1] - (arr[:, :-1] * sk_flat[None, :]).sum(
                axis=1, dtype=np.uint64
            )
            rb = (phase >> np.uint64(61)) & np.uint64(1)
            return ((phase >> np.uint64(62)) + rb) & np.uint64(3)

        np.testing.assert_array_equal(decode_all(out), decode_all(ref))
        np.testing.assert_array_equal(decode_all(out), fn(msgs))


class TestShardedCbsU32:
    def test_sharded_production_cbs_decode_parity(self):
        """The PRODUCTION conversion path (`cbs_u32` with a multi-bit
        key), lane-sharded over 8 devices: GGSW outputs select correctly
        under cmux at decrypt level and match the unsharded run's
        decode, with zero collectives in the compiled HLO (VERDICT
        round-3 #8: multi-chip evidence on the u32mb path, as a
        repeatable test alongside the dryrun)."""
        from spf_tpu.ops import bootstrap_u32 as bu, cbs_u32 as cu
        from spf_tpu.ops import keyswitch as ks_mod, limb32 as lb
        from spf_tpu.ops import multibit as mb
        from spf_tpu.ops.scheme_switch import generate_scheme_switch_key
        from spf_tpu.parallel import shard_lanes, sharded_cbs_u32

        # 2-device mesh: past ~4 partitions the virtual CPU mesh
        # executes the per-device CBS bodies pathologically slowly
        # (>25 min at 8 devices vs seconds at 2 — same sharding
        # semantics either way)
        assert len(jax.devices()) >= 2
        mesh = make_mesh(2)
        group = 2
        lwe_sk = enc.generate_lwe_sk(jax.random.fold_in(KEY, 40), LWE)
        glwe_sk = enc.generate_glwe_sk(jax.random.fold_in(KEY, 41), GLWE)
        bsk_mb = mb.generate_multibit_bsk(
            jax.random.fold_in(KEY, 42), lwe_sk, glwe_sk, GLWE, PBS_RADIX,
            group,
        )
        ak = ks_mod.generate_automorphism_keys(
            jax.random.fold_in(KEY, 43), glwe_sk, GLWE, PARAMS.tr_radix,
            be=None,
        )
        ssk = generate_scheme_switch_key(
            jax.random.fold_in(KEY, 44), glwe_sk, GLWE, PARAMS.ss_radix,
            be=None,
        )
        bsk_f = bu.bsk_to_freq_u32(np.asarray(bsk_mb), use_pallas=False)
        ak_f = bu.bsk_to_freq_u32(np.asarray(ak), use_pallas=False)
        ssk_f = bu.bsk_to_freq_u32(np.asarray(ssk), use_pallas=False)

        batch = 4
        bits_in = (np.arange(batch) % 2).astype(np.uint64)
        sk_np = np.asarray(lwe_sk)
        rng = np.random.default_rng(9)
        a = rng.integers(0, 1 << 64, size=(batch, LWE.dim), dtype=np.uint64)
        b = (a * sk_np[None, :]).sum(axis=1, dtype=np.uint64) + (
            bits_in << np.uint64(63)
        )
        cts = lb.from_u64_np(np.concatenate([a, b[:, None]], axis=1).T)

        step = sharded_cbs_u32(
            PARAMS,
            tuple(replicate(c, mesh) for c in bsk_f),
            tuple(replicate(c, mesh) for c in ak_f),
            tuple(replicate(c, mesh) for c in ssk_f),
            mesh,
        )
        cts_sh = shard_lanes(cts, mesh)
        hlo = step.lower(cts_sh).compile().as_text()
        for coll in (
            "all-reduce", "all-gather", "all-to-all", "collective-permute",
            "reduce-scatter",
        ):
            assert coll not in hlo, f"collective {coll} on the sharded path"
        ggsw_sh = step(cts_sh)
        assert len(ggsw_sh[0].sharding.device_set) == 2
        ggsw_ref = jax.jit(
            lambda c: cu.circuit_bootstrap_u32(
                c, bsk_f, ak_f, ssk_f, PARAMS, use_pallas=False
            )
        )(cts)

        n1 = GLWE.degree
        m1_np = np.zeros((GLWE.size + 1, n1, batch), dtype=np.uint64)
        m1_np[-1, :, :] = np.uint64(1) << np.uint64(63)
        m1 = lb.from_u64_np(m1_np)
        m0 = lb.zeros((GLWE.size + 1, n1, batch))
        sk_flat = np.asarray(glwe_sk).reshape(-1)

        def decode(ggsw):
            ggsw = tuple(jax.device_get(c) for c in ggsw)
            sel = bu.cmux_u32(m0, m1, tuple(jnp.asarray(c) for c in ggsw),
                              GLWE, PARAMS.cbs_radix, False)
            l1 = bu.sample_extract_u32(sel, 0, GLWE)
            arr = lb.to_u64_np(tuple(np.asarray(jax.device_get(c)) for c in l1)).T
            ph = arr[:, -1] - (arr[:, :-1] * sk_flat[None, :]).sum(
                axis=1, dtype=np.uint64
            )
            rb = (ph >> np.uint64(62)) & np.uint64(1)
            return ((ph >> np.uint64(63)) + rb) & np.uint64(1)

        np.testing.assert_array_equal(decode(ggsw_sh), bits_in)
        np.testing.assert_array_equal(decode(ggsw_ref), bits_in)
