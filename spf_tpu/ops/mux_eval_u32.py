"""Levelized MuxCircuit evaluation on the u32-limb TPU pipeline.

Runs a boolean mux DAG (`circuits/mux.py`) over encrypted wires at
production parameters on TPU: selects are GGSW spectra straight out of
`cbs_u32.circuit_bootstrap_u32`, wires are GLWE limb pairs, and every
level's gates execute as ONE batched `cmux_u32` call with the gate and
instance axes packed onto vector lanes (≙ the reference evaluates the
same DAG gate-at-a-time on rayon threads,
`parasol_runtime/src/circuit_processor/mod.rs`; the TPU inversion is
level-synchronous batching, SURVEY §7).

Multiple independent *instances* of the same circuit evaluate in one
pass: wires carry an instance axis I on lanes, so a level with G gates
runs a [.., G*I]-lane cmux — e.g. 8 simultaneous u8 adds keep all 128
lanes busy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..circuits.mux import MuxCircuit
from ..params import GlweDef, RadixDecomposition
from . import limb32 as lb
from .bootstrap_u32 import cmux_u32

U32 = jnp.uint32


def levelize(circuit: MuxCircuit) -> list:
    """Group mux node ids by longest-path depth (constants at level -1)."""
    depth: dict[int, int] = {}
    levels: list[list[int]] = []
    for i, node in enumerate(circuit.nodes):
        if node[0] != "mux":
            depth[i] = -1
            continue
        _, _, lo, hi = node
        d = max(depth[lo], depth[hi]) + 1
        depth[i] = d
        while len(levels) <= d:
            levels.append([])
        levels[d].append(i)
    return levels


def trivial_bit_glwe_limb(bit: int, glwe: GlweDef, instances: int):
    """Trivial GLWE of a binary message (1-bit encoding) as a limb pair
    [k+1, N, I]."""
    kp1, n = glwe.size + 1, glwe.degree
    hi = jnp.zeros((kp1, n, instances), dtype=U32)
    lo = jnp.zeros((kp1, n, instances), dtype=U32)
    if bit:
        hi = hi.at[-1, 0, :].set(U32(0x80000000))  # (1 << 63) >> 32
    return (hi, lo)


_LEVEL_JIT_CACHE: dict = {}


def _level_cmux_jit(width: int, glwe, cbs_radix, use_pallas):
    """One cached cmux executable per power-of-two lane width: deep
    circuits evaluated per-level reuse a handful of executables instead
    of compiling one monolithic graph (the whole-circuit jit of the
    mul8+/add32 benches crashed the remote-compile service)."""
    key = (width, glwe, cbs_radix, bool(use_pallas))
    f = _LEVEL_JIT_CACHE.get(key)
    if f is None:
        f = _LEVEL_JIT_CACHE[key] = jax.jit(
            lambda a, b, s: cmux_u32(a, b, s, glwe, cbs_radix, use_pallas)
        )
    return f


def evaluate_mux_circuit_u32(
    circuit: MuxCircuit,
    sel_ggsw_freq,
    glwe: GlweDef,
    cbs_radix: RadixDecomposition,
    instances: int,
    use_pallas=None,
    per_level_jit: bool = False,
):
    """Evaluate `circuit` over encrypted selects.

    sel_ggsw_freq: GGSW freq tuple [k+1, l, k+1, K, num_inputs * I] from
    `circuit_bootstrap_u32`, ordered input-major (input i's I instances
    contiguous at i*I..(i+1)*I). Returns the list of output wires, each
    a GLWE limb pair [k+1, N, I].

    `per_level_jit=True` dispatches each level as its own jitted cmux
    (lane width padded to the next power of two so executables are
    shared across levels) instead of tracing everything into the
    caller's graph — bounded compile for deep circuits at the cost of
    one dispatch per level.
    """
    ii = instances
    vals: dict[int, tuple] = {}
    zero = trivial_bit_glwe_limb(0, glwe, ii)
    one = trivial_bit_glwe_limb(1, glwe, ii)
    for i, node in enumerate(circuit.nodes):
        if node[0] == "zero":
            vals[i] = zero
        elif node[0] == "one":
            vals[i] = one

    for level in levelize(circuit):
        g = len(level)
        lo = (
            jnp.concatenate([vals[circuit.nodes[n][2]][0] for n in level], axis=-1),
            jnp.concatenate([vals[circuit.nodes[n][2]][1] for n in level], axis=-1),
        )
        hi = (
            jnp.concatenate([vals[circuit.nodes[n][3]][0] for n in level], axis=-1),
            jnp.concatenate([vals[circuit.nodes[n][3]][1] for n in level], axis=-1),
        )
        sel_idx = np.concatenate(
            [circuit.nodes[n][1] * ii + np.arange(ii) for n in level]
        )
        sel = tuple(jnp.take(c, jnp.asarray(sel_idx), axis=-1) for c in sel_ggsw_freq)
        if per_level_jit:
            w = lo[0].shape[-1]
            wp = 1 << (w - 1).bit_length()
            if wp != w:
                def pad(t):
                    return tuple(
                        jnp.pad(c, [(0, 0)] * (c.ndim - 1) + [(0, wp - w)])
                        for c in t
                    )
                lo, hi, sel = pad(lo), pad(hi), pad(sel)
            out = _level_cmux_jit(wp, glwe, cbs_radix, use_pallas)(lo, hi, sel)
            out = tuple(c[..., :w] for c in out)
        else:
            out = cmux_u32(lo, hi, sel, glwe, cbs_radix, use_pallas)
        for j, n in enumerate(level):
            vals[n] = tuple(c[..., j * ii : (j + 1) * ii] for c in out)
    return [vals[o] for o in circuit.outputs]
