"""Fused Pallas kernel: multi-bit frequency-domain MAD + Horner subset
phases, VMEM-resident.

The multi-bit blind-rotation step's frequency half evaluates, per
group t,

    prod_f = sum_S (prod_{j in S} u_j) (x) MAD(dfft, BSK[t, S])

over the 2^g - 1 nonempty subsets S (`multibit._nested_subset_sum`).
As separate XLA ops the 2^g - 1 MAD outputs ([k+1, K, B] ds tuples,
~58 MB at g=3, DEFAULT_128, B=256) materialize to HBM between the MAD
and Horner stages — measured 294 + 143 us of the ~900 us step (r4
step anatomy, ARCHITECTURE.md) against a ~150 us compute+traffic
floor. Everything is ELEMENTWISE in (K, B), so one Pallas kernel
tiles the whole block and keeps every subset accumulator in VMEM:
read dfft + u once, write prod_f once.

Semantics are bit-identical to `freq_mad` + `_nested_subset_sum` on
the same operands (same ds32 arithmetic, same evaluation order);
`tests/test_fft_pallas.py::TestMadPallas` asserts exact equality in
interpret mode. A/B on hardware via SPF_MAD_PALLAS=1 (see
`multibit.blind_rotate_multibit_u32`).

≙ reference in-cache AVX-512 MAD loop
(`sunscreen_tfhe/src/math/simd/x86_64/mod.rs:59-91`) — redesigned as
one fused VPU tile kernel over the subset-phase sum the reference
does not have (it rotates one bit per step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fft_ds32_t import _cadd, _cmul

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

# K tile (sublane axis) x B tile (lane axis). BK = 128 so the bsk-row
# block's trailing dims are (kp1, 128) — kp1 equals its full dimension
# and 128 is lane-aligned, which Mosaic's (8, 128) tiling rule
# accepts (a BK = 8 row slice was rejected).
BK = 128
BB = 128


def _mad_horner_body(group, l, kp1, ns, *refs):
    dfft_refs = refs[:4]
    row_refs = refs[4:8]
    u_refs = refs[8:12]
    out_refs = refs[12:]
    dfft = tuple(r[...] for r in dfft_refs)  # [l, kp1, BK, BB]
    row = tuple(r[...] for r in row_refs)  # [ns, kp1, l, kp1, BK]
    u4 = tuple(r[...] for r in u_refs)  # [g, BK, BB]

    mads = []
    for m in range(ns):
        acc = tuple(
            jnp.zeros((kp1, BK, BB), jnp.float32) for _ in range(4)
        )
        for i in range(kp1):
            for j in range(l):
                d = tuple(c[j, i][None] for c in dfft)  # [1, BK, BB]
                g = tuple(c[m, i, j][:, :, None] for c in row)  # [kp1, BK, 1]
                acc = _cadd(acc, _cmul(d, g))
        mads.append(acc)

    u = [tuple(c[j] for c in u4) for j in range(group)]

    def rec(j, base):
        if j == group:
            return None
        with_j = base | (1 << j)
        inner = rec(j + 1, with_j)
        t = (
            mads[with_j - 1]
            if inner is None
            else _cadd(mads[with_j - 1], inner)
        )
        term = _cmul(t, u[j])
        rest = rec(j + 1, base)
        return term if rest is None else _cadd(term, rest)

    out = rec(0, 0)
    for r, o in zip(out_refs, out):
        r[...] = o


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def mad_horner_fused(dfft, row, u, group: int, interpret: bool = False):
    """dfft: 4-tuple [l, kp1, K, B]; row: 4-tuple [ns, kp1, l, kp1, K];
    u: 4-tuple [g, K, B] (per-bit phase-minus-one factors). Returns the
    Horner-factored subset sum as a 4-tuple [kp1, K, B]."""
    l, kp1, k_, b = dfft[0].shape
    ns = row[0].shape[0]
    assert ns == (1 << group) - 1, (ns, group)
    assert k_ % BK == 0 and b % BB == 0, (k_, b)
    grid = (k_ // BK, b // BB)

    out_shape = tuple(
        jax.ShapeDtypeStruct((kp1, k_, b), jnp.float32) for _ in range(4)
    )
    dfft_spec = pl.BlockSpec(
        (l, kp1, BK, BB), lambda i, j: (0, 0, i, j)
    )
    row_spec = pl.BlockSpec(
        (ns, kp1, l, kp1, BK), lambda i, j: (0, 0, 0, 0, i)
    )
    u_spec = pl.BlockSpec((group, BK, BB), lambda i, j: (0, i, j))
    out_spec = pl.BlockSpec((kp1, BK, BB), lambda i, j: (0, i, j))

    return pl.pallas_call(
        functools.partial(_mad_horner_body, group, l, kp1, ns),
        grid=grid,
        in_specs=[dfft_spec] * 4 + [row_spec] * 4 + [u_spec] * 4,
        out_specs=[out_spec] * 4,
        out_shape=out_shape,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(*dfft, *row, *u)
