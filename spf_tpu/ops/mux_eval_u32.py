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

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..circuits.mux import MuxCircuit
from ..params import GlweDef, Params, RadixDecomposition
from . import limb32 as lb
from .bootstrap_u32 import cmux_u32

U32 = jnp.uint32

# Fresh-path bound before a wire is recrypted (see RefreshKeys);
# hardware-calibrated against DEFAULT_128's 4x8 `cbs_pbs_radix`
# (see `fhe_circuit.DEFAULT_MUX_REFRESH_DEPTH`).
DEFAULT_REFRESH_DEPTH = 64


@dataclasses.dataclass
class RefreshKeys:
    """Key material for mid-tree wire recryption: a wire whose CMux
    fresh-path reaches `refresh_every` is re-encrypted via
    extract -> keyswitch -> CBS -> external-product-with-one, resetting
    its noise to fresh-CBS class. Without this, depth-510 trees (the
    16x16 multiplier) exceed the noise budget (BENCH_SUITE r4 mul16).
    """

    bsk_freq: tuple
    ak_freq: tuple
    ssk_freq: tuple
    ksk_planes: object
    params: Params
    refresh_every: int = DEFAULT_REFRESH_DEPTH


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
    mul8+/add32 benches crashed the remote-compile service).

    `use_pallas=None` (auto) is resolved to the CONCRETE backend before
    keying: the two FFT backends use different frequency orders, so a
    None/False conflation would reuse an executable against
    mismatched-order GGSW operands (advisor r4 finding)."""
    from .bootstrap_u32 import _on_tpu

    up = use_pallas if use_pallas is not None else _on_tpu()
    key = (width, glwe, cbs_radix, up)
    f = _LEVEL_JIT_CACHE.get(key)
    if f is None:
        f = _LEVEL_JIT_CACHE[key] = jax.jit(
            lambda a, b, s: cmux_u32(a, b, s, glwe, cbs_radix, up)
        )
    return f


_REFRESH_JIT_CACHE: dict = {}


def _refresh_jit(width: int, rk: RefreshKeys, use_pallas):
    """Jitted wire recryption for one padded lane width (shared across
    levels like `_level_cmux_jit`)."""
    from .bootstrap_u32 import _on_tpu, sample_extract_u32
    from .cbs_u32 import circuit_bootstrap_u32
    from .keyswitch_u32 import keyswitch_lwe_u32

    up = use_pallas if use_pallas is not None else _on_tpu()
    p = rk.params
    glwe = p.l1_params
    key = (width, id(rk), up)
    f = _REFRESH_JIT_CACHE.get(key)
    if f is None:
        zero = trivial_bit_glwe_limb(0, glwe, width)
        one = trivial_bit_glwe_limb(1, glwe, width)

        def refresh(w):
            l1 = sample_extract_u32(w, 0, glwe)
            l0 = keyswitch_lwe_u32(
                l1, rk.ksk_planes, glwe.as_lwe_def(), p.l0_params, p.ks_radix
            )
            g = circuit_bootstrap_u32(
                l0, rk.bsk_freq, rk.ak_freq, rk.ssk_freq, p, use_pallas=up
            )
            return cmux_u32(zero, one, g, glwe, p.cbs_radix, up)

        f = _REFRESH_JIT_CACHE[key] = jax.jit(refresh)
    return f


def refresh_levels(circuit: MuxCircuit, refresh_every: int) -> dict:
    """Static refresh plan: node id -> True for mux nodes whose CMux
    fresh-path reaches `refresh_every` (those wires are recrypted right
    after their level executes; their fresh-path resets to 1)."""
    fp: dict[int, int] = {}
    plan: dict[int, bool] = {}
    for i, node in enumerate(circuit.nodes):
        if node[0] != "mux":
            fp[i] = 0
            continue
        _, _, lo, hi = node
        f = max(fp[lo], fp[hi]) + 1
        if refresh_every and f >= refresh_every:
            plan[i] = True
            f = 1
        fp[i] = f
    return plan


def evaluate_mux_circuit_u32(
    circuit: MuxCircuit,
    sel_ggsw_freq,
    glwe: GlweDef,
    cbs_radix: RadixDecomposition,
    instances: int,
    use_pallas=None,
    per_level_jit: bool = False,
    refresh: RefreshKeys | None = None,
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

    `refresh` bounds tree noise for deep circuits (mul16's depth-510
    chains exceed the budget without it — BENCH_SUITE r4): wires whose
    fresh-path hits `refresh.refresh_every` are recrypted through the
    conversion cycle, batched per level.
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
    plan = (
        refresh_levels(circuit, refresh.refresh_every) if refresh else {}
    )

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
        to_refresh = [n for n in level if plan.get(n)]
        if to_refresh:
            rw = (
                jnp.concatenate([vals[n][0] for n in to_refresh], axis=-1),
                jnp.concatenate([vals[n][1] for n in to_refresh], axis=-1),
            )
            w = rw[0].shape[-1]
            wp = 1 << (w - 1).bit_length()
            if wp != w:
                rw = tuple(
                    jnp.pad(c, [(0, 0)] * (c.ndim - 1) + [(0, wp - w)],
                            mode="edge")
                    for c in rw
                )
            fresh = _refresh_jit(wp, refresh, use_pallas)(rw)
            for j, n in enumerate(to_refresh):
                vals[n] = tuple(
                    c[..., j * ii : (j + 1) * ii] for c in fresh
                )
    return [vals[o] for o in circuit.outputs]
