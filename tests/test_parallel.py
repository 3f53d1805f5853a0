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
