"""Two-PROCESS multi-host dryrun (VERDICT r4 #8): runs the production
multi-bit PBS lane-sharded over a real `jax.distributed` runtime with 2
processes x 2 CPU devices each — the same code path a pod uses
(process-spanning mesh via `make_multihost_mesh`, dcn-major lane
sharding, replicated keys, zero collectives), exercised with actual
cross-process coordination rather than a single-process simulation.

Parent mode spawns the two ranks and aggregates their verdicts:

    python scripts/multihost_dryrun.py            # parent
    python scripts/multihost_dryrun.py --rank N   # child (internal)
"""

import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

PORT = int(os.environ.get("SPF_MULTIHOST_PORT", "8476"))


def child(rank: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import numpy as np

    from spf_tpu.parallel.multihost import (
        init_distributed, lane_spec, make_multihost_mesh,
    )

    pid, pcount = init_distributed(
        coordinator_address=f"127.0.0.1:{PORT}", num_processes=2,
        process_id=rank,
    )
    assert pcount == 2, pcount
    devs = jax.devices()
    print(f"[rank {rank}] global devices: {len(devs)}", flush=True)
    assert len(devs) == 4

    from jax.sharding import NamedSharding, PartitionSpec as P

    from spf_tpu.ops import bootstrap, encryption as enc
    from spf_tpu.ops import bootstrap_u32 as bu, limb32 as lb
    from spf_tpu.ops import multibit as mb
    from spf_tpu.params import GlweDef, LweDef, RadixDecomposition
    from spf_tpu.parallel.multihost import sharded_pbs_multibit_multihost

    LWE = LweDef(dim=64, std=1e-16)
    GLWE = GlweDef(size=1, degree=128, std=1e-16)
    RADIX = RadixDecomposition(count=2, radix_log=16)
    KEY = jax.random.key(1717)
    group = 2

    # deterministic key material (identical in both processes)
    lwe_sk = enc.generate_lwe_sk(jax.random.fold_in(KEY, 0), LWE)
    glwe_sk = enc.generate_glwe_sk(jax.random.fold_in(KEY, 1), GLWE)
    bsk_mb = mb.generate_multibit_bsk(
        jax.random.fold_in(KEY, 2), lwe_sk, glwe_sk, GLWE, RADIX, group
    )
    bsk_f = bu.bsk_to_freq_u32(np.asarray(bsk_mb), use_pallas=False)
    bits = 2
    lut_np = bootstrap.generate_lut_np([lambda x: (x + 1) % 4], GLWE, bits)
    lut_limb_np = tuple(np.asarray(c) for c in lb.from_u64_np(lut_np))

    batch = 8
    msgs = np.arange(batch, dtype=np.uint64) % 4
    sk_np = np.asarray(lwe_sk)
    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 64, size=(batch, LWE.dim), dtype=np.uint64)
    b = (a * sk_np[None, :]).sum(axis=1, dtype=np.uint64) + (
        msgs << np.uint64(64 - bits - 1))
    cts_np = tuple(
        np.asarray(c)
        for c in lb.from_u64_np(np.concatenate([a, b[:, None]], axis=1).T)
    )

    mesh = make_multihost_mesh()  # processes x local devices = 2 x 2
    assert mesh.devices.shape == (2, 2), mesh.devices.shape

    def make_global(np_leaf, spec):
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            np_leaf.shape, sharding, lambda idx: np_leaf[idx]
        )

    cts_g = tuple(make_global(c, lane_spec(c.ndim)) for c in cts_np)
    bsk_g = tuple(make_global(np.asarray(c), P()) for c in bsk_f)
    lut_g = tuple(make_global(c, P()) for c in lut_limb_np)

    step = sharded_pbs_multibit_multihost(
        LWE, GLWE, RADIX, group, bsk_g, lut_g, mesh
    )
    hlo = step.lower(cts_g).compile().as_text()
    for coll in ("all-reduce", "all-gather", "all-to-all",
                 "collective-permute", "reduce-scatter"):
        assert coll not in hlo, f"collective {coll} on multihost hot path"
    out = step(cts_g)
    jax.block_until_ready(out)

    # each rank decrypt-verifies its ADDRESSABLE lane shards
    sk_flat = np.asarray(glwe_sk).reshape(-1)
    n_ok = n_tot = 0
    for shard in out[0].addressable_shards:
        lanes = shard.index[-1]
        hi = np.asarray(shard.data)
        lo_shard = [s for s in out[1].addressable_shards
                    if s.index == shard.index][0]
        lo = np.asarray(lo_shard.data)
        u64 = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
        got = u64.T  # [lanes, kN+1]
        sel = msgs[lanes]
        phase = got[:, -1] - (got[:, :-1] * sk_flat[None, :]).sum(
            axis=1, dtype=np.uint64)
        rb = (phase >> np.uint64(64 - bits - 1)) & np.uint64(1)
        dec = ((phase >> np.uint64(64 - bits)) + rb) & np.uint64(3)
        n_ok += int((dec == (sel + 1) % 4).sum())
        n_tot += dec.size
    print(f"[rank {rank}] decrypt-verified {n_ok}/{n_tot} local lanes; "
          f"zero collectives asserted", flush=True)
    assert n_ok == n_tot and n_tot > 0
    print(f"[rank {rank}] OK", flush=True)


def parent():
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # drop the axon sitecustomize
    procs = []
    for rank in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--rank", str(rank)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=ROOT,
        ))
    t0 = time.time()
    outs = [p.communicate(timeout=900)[0] for p in procs]
    ok = all(p.returncode == 0 for p in procs) and all(
        "OK" in o for o in outs)
    for i, o in enumerate(outs):
        print(f"----- rank {i} -----\n{o}")
    print(f"MULTIHOST 2-PROCESS DRYRUN: {'ok' if ok else 'FAILED'} "
          f"in {time.time()-t0:.1f}s")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=None)
    args = ap.parse_args()
    if args.rank is None:
        parent()
    else:
        child(args.rank)
