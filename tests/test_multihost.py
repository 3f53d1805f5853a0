"""Multi-host (dcn x ici) sharding tests on the 8-device virtual CPU
mesh — a simulated 2-host x 2-chip (and 2x4) topology. The axis
semantics and shardings are identical to a real pod; only the physical
links differ (SURVEY §7 step 9; VERDICT r4 missing #3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spf_tpu.ops import bootstrap, encryption as enc, torus
from spf_tpu.parallel import (
    make_multihost_mesh,
    replicate_multihost,
    scaling_model,
    shard_lanes_multihost,
    sharded_pbs_multibit_multihost,
)
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
KEY = jax.random.key(1717)

COLLECTIVES = (
    "all-reduce", "all-gather", "all-to-all", "collective-permute",
    "reduce-scatter",
)


class TestMultihostMesh:
    def test_mesh_shape_and_axes(self):
        assert len(jax.devices()) >= 8
        mesh = make_multihost_mesh(hosts=2, chips_per_host=4)
        assert mesh.axis_names == ("dcn", "ici")
        assert mesh.devices.shape == (2, 4)

    def test_uneven_hosts_raise(self):
        with pytest.raises(ValueError):
            make_multihost_mesh(hosts=3)

    def test_multihost_pbs_parity_and_no_collectives(self):
        """The production multi-bit PBS, lanes sharded dcn-major over a
        simulated 2-host x 2-chip mesh: bitwise parity with the
        unsharded run and zero collectives in the compiled HLO."""
        from spf_tpu.ops import limb32 as lb
        from spf_tpu.ops import multibit as mb

        mesh = make_multihost_mesh(hosts=2, chips_per_host=2)
        group = 2
        lwe_sk = enc.generate_lwe_sk(jax.random.fold_in(KEY, 0), LWE)
        glwe_sk = enc.generate_glwe_sk(jax.random.fold_in(KEY, 1), GLWE)
        bsk_mb = mb.generate_multibit_bsk(
            jax.random.fold_in(KEY, 2), lwe_sk, glwe_sk, GLWE, PBS_RADIX,
            group,
        )
        from spf_tpu.ops import bootstrap_u32 as bu

        bsk_f = bu.bsk_to_freq_u32(np.asarray(bsk_mb), use_pallas=False)
        bits = 2
        lut_np = bootstrap.generate_lut_np(
            [lambda x: (x + 1) % 4], GLWE, bits)
        lut_limb = lb.from_u64_np(lut_np)

        batch = 8
        msgs = np.arange(batch, dtype=np.uint64) % 4
        sk_np = np.asarray(lwe_sk)
        rng = np.random.default_rng(3)
        a = rng.integers(0, 1 << 64, size=(batch, LWE.dim), dtype=np.uint64)
        b = (a * sk_np[None, :]).sum(axis=1, dtype=np.uint64) + (
            msgs << np.uint64(64 - bits - 1))
        cts = lb.from_u64_np(np.concatenate([a, b[:, None]], axis=1).T)

        step = sharded_pbs_multibit_multihost(
            LWE, GLWE, PBS_RADIX, group,
            tuple(replicate_multihost(c, mesh) for c in bsk_f),
            tuple(replicate_multihost(c, mesh) for c in lut_limb),
            mesh,
        )
        cts_sh = shard_lanes_multihost(cts, mesh)
        hlo = step.lower(cts_sh).compile().as_text()
        for coll in COLLECTIVES:
            assert coll not in hlo, f"collective {coll} on multihost hot path"

        out_sh = tuple(np.asarray(jax.device_get(c)) for c in step(cts_sh))

        # unsharded reference run (single device)
        ref = jax.jit(lambda c: mb.programmable_bootstrap_multibit_u32(
            c, lut_limb, bsk_f, LWE, GLWE, PBS_RADIX, group,
            use_pallas=False))(cts)
        ref = tuple(np.asarray(jax.device_get(c)) for c in ref)
        for a_, b_ in zip(out_sh, ref):
            np.testing.assert_array_equal(a_, b_)

        # decrypt-verify
        out64 = lb.to_u64_np(out_sh).T
        sk_flat = np.asarray(glwe_sk).reshape(-1)
        phase = out64[:, -1] - (out64[:, :-1] * sk_flat[None, :]).sum(
            axis=1, dtype=np.uint64)
        rb = (phase >> np.uint64(64 - bits - 1)) & np.uint64(1)
        dec = ((phase >> np.uint64(64 - bits)) + rb) & np.uint64(3)
        np.testing.assert_array_equal(dec, (msgs + 1) % 4)


class TestScalingModel:
    def test_perfect_division(self):
        m = scaling_model(1024, hosts=4, chips_per_host=4)
        assert m["load_imbalance_efficiency"] == 1.0
        assert m["speedup_vs_1"] == 16.0

    def test_remainder_imbalance(self):
        m = scaling_model(100, hosts=2, chips_per_host=4)
        # ceil(100/8)=13 -> eff = 12.5/13 (rounded to 4 places)
        assert abs(m["load_imbalance_efficiency"] - 12.5 / 13) < 1e-4

    def test_broadcast_amortization(self):
        m = scaling_model(
            4096, hosts=8, chips_per_host=4, per_lane_cost=1e-3,
            key_broadcast_bytes=400 << 20, steps=1000,
        )
        assert m["key_broadcast_s"] > 0
        assert m["broadcast_amortized_overhead"] < 0.05
