"""Ciphertext-batch parallelism over a `jax.sharding.Mesh`.

The reference has no distributed layer (rayon threads only; SURVEY
§2.7) — this is the TPU-native multi-chip story:

- the `batch` axis of ciphertext batches is sharded across chips,
- evaluation keys (BSK/KSK/ASK/SSK) are broadcast-replicated — they are
  read-only constants that fit in HBM (~100s of MB; `keys.rs:144-146`),
- bootstraps/CBS are embarrassingly parallel along the batch, so no
  collectives cross chips on the hot path; ICI is only touched by the
  initial key broadcast and any final gathers.

This layout is the throughput-optimal one for TFHE gate evaluation:
each chip keeps its FFTs local (N <= 2048 never merits sharding a
single transform) and scales linearly in batch.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import bootstrap as bs
from ..ops import cbs as cbs_ops
from ..ops.fft import C128
from ..params import Params


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A 1-D mesh over the `batch` axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("batch",))


def shard_batch(x, mesh: Mesh):
    """Shard the leading axis of every array in pytree `x` across the
    mesh."""

    def put(leaf):
        spec = P("batch", *([None] * (leaf.ndim - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, x)


def replicate(x, mesh: Mesh):
    """Replicate a pytree (evaluation keys) on every device."""

    def put(leaf):
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, x)


def sharded_pbs(params: Params, bsk_fft, mesh: Mesh, lut_glwe, be=C128):
    """Return a jitted batched-PBS step whose batch axis is sharded over
    `mesh` and whose keys are replicated. Input: LWE batch
    [B, n0+1]; output: LWE batch under the extracted key."""
    glwe = params.l1_params

    def step(cts):
        return bs.programmable_bootstrap_univariate(
            cts, lut_glwe, bsk_fft, params.l0_params, glwe, params.pbs_radix, be
        )

    batch_spec = NamedSharding(mesh, P("batch", None))
    return jax.jit(step, in_shardings=batch_spec, out_shardings=batch_spec)


def sharded_cbs(params: Params, compute_key, mesh: Mesh, be=C128):
    """Jitted batched circuit-bootstrap step, batch-sharded."""

    def step(cts):
        return cbs_ops.circuit_bootstrap(
            cts, compute_key.bsk, compute_key.auto_keys, compute_key.ssk, params, be
        )

    batch_spec = NamedSharding(mesh, P("batch", None))
    return jax.jit(step, in_shardings=batch_spec)


def shard_lanes(x, mesh: Mesh):
    """Shard the LAST (lane) axis of every array in pytree `x` — the
    u32 limb pipeline's batch axis (t-layouts put ciphertext lanes
    last; `limb32` arrays are (hi, lo) tuples of [..., B])."""

    def put(leaf):
        spec = P(*([None] * (leaf.ndim - 1)), "batch")
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, x)


def sharded_pbs_multibit(lwe, glwe, radix, group: int, bsk_mb_freq,
                         lut_limb, mesh: Mesh):
    """Jitted multi-bit (grouped) PBS on the u32 limb pipeline with the
    lane axis sharded over `mesh` and the multi-bit bootstrap key
    replicated — the PRODUCTION multi-chip configuration (the
    single-chip headline path of `bench.py`, backend `u32mb`, scaled
    along lanes with zero hot-path collectives; `phase_rot` keeps the
    [steps, B] phase factors unflattened so lane sharding survives its
    reshapes)."""
    from ..ops import multibit as mb

    def step(ct_limb):
        return mb.programmable_bootstrap_multibit_u32(
            ct_limb, lut_limb, bsk_mb_freq, lwe, glwe, radix, group,
            use_pallas=False,
        )

    # shard_map, not jit+in_shardings: the SPMD partitioner's sharding
    # propagation through the blind-rotation loop takes minutes-to-hours
    # at production-ish shapes, while shard_map compiles the per-device
    # body once (see `sharded_cbs_u32`)
    from jax.experimental.shard_map import shard_map

    lane2 = P(None, "batch")
    sm = shard_map(
        step, mesh=mesh,
        in_specs=((lane2, lane2),),
        out_specs=(lane2, lane2),
        check_rep=False,
    )
    return jax.jit(sm)


def sharded_cbs_u32(params: Params, bsk_freq, ak_freq, ssk_freq, mesh: Mesh):
    """Jitted PRODUCTION circuit bootstrap (`cbs_u32`, multi-bit or
    single-bit key auto-detected) with the lane axis sharded over `mesh`
    and every evaluation key replicated — the whole-cycle analog of
    `sharded_pbs_multibit`: L0 LWE limb pair [n0+1, B] -> GGSW freq
    tuple [k+1, l, k+1, K, B], zero collectives on the hot path.

    Expressed with `shard_map`, NOT jit+in_shardings: the SPMD
    partitioner takes tens of minutes propagating shardings through the
    scan-structured CBS graph, while shard_map compiles the per-device
    body once with no propagation pass — the natural expression of an
    embarrassingly lane-parallel computation (each device runs the full
    CBS on its lane shard against replicated keys)."""
    from jax.experimental.shard_map import shard_map

    from ..ops import cbs_u32 as cu

    lane2 = P(None, "batch")
    lane5 = P(None, None, None, None, "batch")

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
