"""Fused Pallas kernel: per-batch monomial rotation + subtract + signed
gadget decomposition, VMEM-resident.

This is the coefficient-domain half of every blind-rotation step. As
separate XLA ops it is HBM-bound: the 12 bit-select roll rounds plus
the decompose each stream the [k+1, N, B] accumulator to HBM per round
(measured 548 + 526 us at DEFAULT_128, B=256 — ~85% of the whole step).
Fused in VMEM the same work is one read of the accumulator and one
write of the digit planes.

Semantics: digits = decompose(acc * X^t - acc) with t per batch lane,
bit-identical to `bootstrap_u32.monomial_mul_u32` + `limb32.sub` +
`limb32.decompose` (tested against them). Requires an x32 process
(SPF_TPU_X32=1) on TPU; CPU tests run in interpret mode.

≙ reference `rotate_glwe_positive_monomial_negacyclic` + cmux's
decomposition (`programmable_bootstrapping.rs:385-409`,
`math/radix.rs:35-46`) — redesigned as one fused vector kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import RadixDecomposition
from . import limb32 as lb

LANES = 128
U32 = jnp.uint32

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _pad_lanes_128(arrs):
    """Pad the trailing (lane) axis of each array to a multiple of 128.
    The executor pads gate waves to powers of two, so CBS waves with
    <=64 gates reach these kernels at sub-tile lane counts; Mosaic
    blocks are 128-lane, so pad here and let callers slice back.
    Returns (padded_arrays, original_lane_count)."""
    b = arrs[0].shape[-1]
    pad = (-b) % LANES
    if pad == 0:
        return arrs, b
    widths = [(0, 0)] * (arrs[0].ndim - 1) + [(0, pad)]
    return tuple(jnp.pad(a, widths) for a in arrs), b


def _rotate_limb_rolls(acc, t, n: int):
    """acc = (hi, lo) [N, B_tile]; t u32 [1, B_tile] < 2N. Bit-selected
    static rolls (unrolled python loop: Mosaic reuses nothing across a
    fori_loop body's pltpu.roll of dynamic shift, and 12 static rounds
    compile fine)."""
    out = acc
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    for i in range(n.bit_length() - 1):
        s = 1 << i
        rolled = (
            pltpu.roll(out[0], np.int32(s), axis=0),
            pltpu.roll(out[1], np.int32(s), axis=0),
        )
        sign = rows < s  # [N, 1]
        rolled = lb.where(sign, lb.neg(rolled), rolled)
        bit = ((t >> U32(i)) & U32(1)) > 0  # [1, B]
        out = lb.where(bit, rolled, out)
    bit_n = ((t >> U32(n.bit_length() - 1)) & U32(1)) > 0
    return lb.where(bit_n, lb.neg(out), out)


def _kernel(t_ref, hi_ref, lo_ref, dig_ref, *, n, radix):
    acc = (hi_ref[0], lo_ref[0])
    t = t_ref[...]  # [1, B_tile]
    rot = _rotate_limb_rolls(acc, t, n)
    diff = lb.sub(rot, acc)
    digs = lb.decompose(diff, radix)  # i32 [count, N, B_tile]
    dig_ref[...] = digs[:, None].astype(jnp.float32)


def _kernel_acc(t_ref, hi_ref, lo_ref, ph_ref, pl_ref, dig_ref, oh_ref, ol_ref, *, n, radix):
    acc = (hi_ref[0], lo_ref[0])
    # fold the previous step's external product in here: one read of the
    # accumulator instead of a separate XLA from_ds + add pass
    acc = lb.add(acc, lb.from_ds(ph_ref[0], pl_ref[0]))
    oh_ref[0] = acc[0]
    ol_ref[0] = acc[1]
    t = t_ref[...]  # [1, B_tile]
    rot = _rotate_limb_rolls(acc, t, n)
    diff = lb.sub(rot, acc)
    dig_ref[...] = lb.decompose(diff, radix)[:, None].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("radix", "interpret"))
def rotate_sub_decompose_acc(acc, prod_ds, t, radix: RadixDecomposition, interpret=False):
    """Deferred-accumulate variant: first acc += round(prod_ds) (the
    PREVIOUS blind-rotation step's inverse-FFT output, still as a ds
    f32 pair), then rotate/sub/decompose as `rotate_sub_decompose`.
    Returns (digit planes f32 [count, k+1, N, B], updated acc limb
    pair). Folding the accumulate into this kernel removes the
    standalone from_ds + limb-add XLA pass from every step."""
    (ah, al, ph, pl_), b0 = _pad_lanes_128(
        (acc[0], acc[1], prod_ds[0], prod_ds[1])
    )
    acc, prod_ds = (ah, al), (ph, pl_)
    if t.shape[-1] != acc[0].shape[-1]:
        t = jnp.pad(t, (0, acc[0].shape[-1] - t.shape[-1]))
    kp1, n, b = acc[0].shape
    t2 = jnp.broadcast_to(t.astype(U32)[None, :], (1, b))
    grid = (kp1, b // LANES)
    kern = functools.partial(_kernel_acc, n=n, radix=radix)
    t_spec = pl.BlockSpec((1, LANES), lambda i, j: (0, j))
    a_spec = pl.BlockSpec((1, n, LANES), lambda i, j: (i, 0, j))
    d_spec = pl.BlockSpec((radix.count, 1, n, LANES), lambda i, j: (0, i, 0, j))
    out_shape = [
        jax.ShapeDtypeStruct((radix.count, kp1, n, b), jnp.float32),
        jax.ShapeDtypeStruct((kp1, n, b), U32),
        jax.ShapeDtypeStruct((kp1, n, b), U32),
    ]
    digs, hi, lo = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[t_spec, a_spec, a_spec, a_spec, a_spec],
        out_specs=[d_spec, a_spec, a_spec],
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(t2, acc[0], acc[1], prod_ds[0], prod_ds[1])
    if b0 != b:
        digs = digs[..., :b0]
        hi, lo = hi[..., :b0], lo[..., :b0]
    return digs, (hi, lo)


def _kernel_accdec(hi_ref, lo_ref, ph_ref, pl_ref, dig_ref, oh_ref, ol_ref, *, radix):
    acc = (hi_ref[0], lo_ref[0])
    acc = lb.add(acc, lb.from_ds(ph_ref[0], pl_ref[0]))
    oh_ref[0] = acc[0]
    ol_ref[0] = acc[1]
    dig_ref[...] = lb.decompose(acc, radix)[:, None].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("radix", "interpret"))
def accumulate_decompose(acc, prod_ds, radix: RadixDecomposition, interpret=False):
    """Phase-rotation variant of `rotate_sub_decompose_acc`: fold the
    previous step's inverse-FFT output (ds f32 pair) into the
    accumulator, then gadget-decompose the accumulator ITSELF — no
    coefficient-domain rotation (it happens in the frequency domain, see
    `phase_rot.py`). Returns (digit planes f32 [count, k+1, N, B],
    updated acc limb pair)."""
    (ah, al, ph, pl_), b0 = _pad_lanes_128((acc[0], acc[1], prod_ds[0], prod_ds[1]))
    acc, prod_ds = (ah, al), (ph, pl_)
    kp1, n, b = acc[0].shape
    grid = (kp1, b // LANES)
    kern = functools.partial(_kernel_accdec, radix=radix)
    a_spec = pl.BlockSpec((1, n, LANES), lambda i, j: (i, 0, j))
    d_spec = pl.BlockSpec((radix.count, 1, n, LANES), lambda i, j: (0, i, 0, j))
    out_shape = [
        jax.ShapeDtypeStruct((radix.count, kp1, n, b), jnp.float32),
        jax.ShapeDtypeStruct((kp1, n, b), U32),
        jax.ShapeDtypeStruct((kp1, n, b), U32),
    ]
    digs, hi, lo = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[a_spec] * 4,
        out_specs=[d_spec, a_spec, a_spec],
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(acc[0], acc[1], prod_ds[0], prod_ds[1])
    if b0 != b:
        digs = digs[..., :b0]
        hi, lo = hi[..., :b0], lo[..., :b0]
    return digs, (hi, lo)


@functools.partial(jax.jit, static_argnames=("radix", "interpret"))
def rotate_sub_decompose(acc, t, radix: RadixDecomposition, interpret=False):
    """acc limb pair [k+1, N, B], t u32 [B] -> digit planes f32
    [count, k+1, N, B] of (acc*X^t - acc), ready for the signed FFT
    (lanes padded to a multiple of 128 internally)."""
    (ah, al), b0 = _pad_lanes_128((acc[0], acc[1]))
    acc = (ah, al)
    t = jnp.pad(t, (0, acc[0].shape[-1] - t.shape[-1])) if t.shape[-1] != acc[0].shape[-1] else t
    kp1, n, b = acc[0].shape
    t2 = jnp.broadcast_to(t.astype(U32)[None, :], (1, b))
    grid = (kp1, b // LANES)
    kern = functools.partial(_kernel, n=n, radix=radix)
    t_spec = pl.BlockSpec((1, LANES), lambda i, j: (0, j))
    a_spec = pl.BlockSpec((1, n, LANES), lambda i, j: (i, 0, j))
    d_spec = pl.BlockSpec((radix.count, 1, n, LANES), lambda i, j: (0, i, 0, j))
    out_shape = jax.ShapeDtypeStruct((radix.count, kp1, n, b), jnp.float32)
    digs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[t_spec, a_spec, a_spec],
        out_specs=d_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(t2, acc[0], acc[1])
    return digs[..., :b0] if b0 != b else digs
