"""Pallas TPU kernels for the ds32 negacyclic FFT (EXPERIMENTAL).

STATUS (round 3): kernel math is verified correct against the c128
oracle via the pure-jnp twins (`fwd_ds_ref`/`inv_ds_ref`), and the
x64-free u32-limb pipeline (round 2) removed the original Mosaic-
under-x64 blockers — but compiling these kernels through the axon
REMOTE-COMPILE service remains impractical: a `--backend u32p` bench
run sat >15 min in the BSK frequency conversion's Mosaic compile
before timing out (and the VMEM phase-doubling kernel has hung the
service indefinitely before, see `phase_rot.phase_minus_one_pallas`).
The XLA scrambled-frequency path (`fft_ds32_t.py` DIF/DIT pair) is the
production FFT; the fused rotate+decompose kernel
(`rot_decomp_pallas.py`) is the one Pallas kernel that compiles
reliably and ships on the hot path. Revisit when the toolchain moves.

The XLA t-layout path (`fft_ds32_t.py`) is correct but HBM-bound: every
FFT stage round-trips ~8 MB to HBM. These kernels keep all 10 stages
VMEM-resident.

Design notes (the Mosaic-friendly formulation):

- Stages use NO reshapes or concatenations. A DIF stage with block size
  m computes, for every row r of a [K, B] tile,
      a-position (r mod m < m/2):  y[r] = x[r] + x[r + m/2]
      b-position:                  y[r] = (x[r - m/2] - x[r]) * w[r]
  via two static `pltpu.roll`s along the sublane axis, a full-length
  per-stage twiddle vector, and a select — all vector ops.
- The forward transform is DIF (natural order in, bit-reversed out) and
  the inverse is DIT (bit-reversed in, natural out), so NO permutation
  is ever materialized: pointwise frequency-domain arithmetic and the
  stored keys simply live in bit-reversed order ("scrambled-frequency
  convention"). The twist/untwist are elementwise in natural
  coefficient order.
- 64-bit integers don't exist in Mosaic: u64<->ds conversion stays in
  XLA at the kernel boundary.

Exports `fwd_ds(hi, lo)` / `inv_ds(f4)` mirroring `fft_ds32_t` but in
scrambled-frequency order; `fft_ds32_t`-compatible wrappers live in
`bootstrap_tpu` via the `use_pallas` flag.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ds

LANES = 128

# Mosaic does not reuse stack slots across the unrolled stages, so the
# kernel needs ~45 MB of scoped VMEM at N=2048; v5e has 128 MB physical
# VMEM and tolerates a raised per-kernel limit.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _i32(x):
    # index maps must stay i32 for Mosaic even in x64 mode
    import jax.numpy as _jnp
    return _jnp.asarray(x, dtype=_jnp.int32)


@functools.lru_cache(maxsize=16)
def _stage_tables(k: int, inverse: bool):
    """Pack per-stage constants into one f32 array [C, K, 1] passed as a
    kernel input: per stage 5 channels (is_a mask, w ds components),
    then 4 twist/untwist ds channels. Returns (consts, halves)."""
    sign = 1.0 if inverse else -1.0
    ms = [1 << s for s in range(int(np.log2(k)), 0, -1)]
    if inverse:
        ms = ms[::-1]
    r = np.arange(k)
    chans = []
    halves = []
    for m in ms:
        half = m // 2
        halves.append(half)
        pos = r % m
        is_a = pos < half
        n_idx = np.where(is_a, pos, pos - half)
        w = np.exp(sign * 2j * np.pi * n_idx / m)
        chans.append(is_a.astype(np.float32))
        chans.extend(ds.from_f64_array(w.real))
        chans.extend(ds.from_f64_array(w.imag))
    kk = np.arange(k)
    tw = np.exp(2j * np.pi * kk / (4 * k))  # twist for N = 2k
    if inverse:
        tw = (1.0 / tw) / k
    chans.extend(ds.from_f64_array(tw.real))
    chans.extend(ds.from_f64_array(tw.imag))
    consts = np.stack(chans, axis=0)[:, :, None].astype(np.float32)
    return consts, halves


def _cmul_parts(ar, al, ai, ail, br, bl, bi, bil):
    pr = ds.mul(ar, al, br, bl)
    qr = ds.mul(ai, ail, bi, bil)
    rh, rl = ds.sub(pr[0], pr[1], qr[0], qr[1])
    pi = ds.mul(ar, al, bi, bil)
    qi = ds.mul(ai, ail, br, bl)
    ih, il = ds.add(pi[0], pi[1], qi[0], qi[1])
    return rh, rl, ih, il


def _roll(x, shift):
    # pltpu.roll requires a non-negative i32 shift (x64 mode would make a
    # python int an i64 operand)
    return pltpu.roll(x, np.int32(shift % x.shape[0]), axis=0)


def _jroll(x, shift):
    return jnp.roll(x, shift, axis=-2)


def _fft_stages(vals, consts_ref, halves, inverse, roll=_roll):
    """vals: 4 arrays [K, B_tile]. Applies all stages with rolls+selects,
    reading per-stage constants from `consts_ref` [C, K, 1]."""
    for s, half in enumerate(halves):
        base = 5 * s
        is_a = consts_ref[base]
        w = (
            consts_ref[base + 1],
            consts_ref[base + 2],
            consts_ref[base + 3],
            consts_ref[base + 4],
        )
        up = [roll(c, -half) for c in vals]  # x[r + half]
        down = [roll(c, half) for c in vals]  # x[r - half]
        if not inverse:
            # DIF: a: x + up ; b: (down - x) * w
            sum_a = ds.add(vals[0], vals[1], up[0], up[1]) + ds.add(
                vals[2], vals[3], up[2], up[3]
            )
            diff = ds.sub(down[0], down[1], vals[0], vals[1]) + ds.sub(
                down[2], down[3], vals[2], vals[3]
            )
            prod = _cmul_parts(*diff, *w)
            vals = [jnp.where(is_a > 0, s, p) for s, p in zip(sum_a, prod)]
        else:
            # DIT: t = w * x_b ; a: x_a + t ; b: x_a' - t'
            prod = _cmul_parts(vals[0], vals[1], vals[2], vals[3], *w)
            t_up = [roll(c, -half) for c in prod]  # t at partner b row
            t_self = prod
            a_vals = ds.add(vals[0], vals[1], t_up[0], t_up[1]) + ds.add(
                vals[2], vals[3], t_up[2], t_up[3]
            )
            b_vals = ds.sub(down[0], down[1], t_self[0], t_self[1]) + ds.sub(
                down[2], down[3], t_self[2], t_self[3]
            )
            vals = [jnp.where(is_a > 0, a, b) for a, b in zip(a_vals, b_vals)]
    return vals


def _droll(x, shift):
    """Roll by a dynamic (traced, non-negative) i32 amount."""
    return pltpu.roll(x, shift, axis=0)


def _stage_step(vals, consts_ref, s, half, inverse):
    """One butterfly stage on 4 value arrays (static stage index: all
    constant slicing is static — Mosaic's dynamic indexing and
    lax.switch lowering both loop infinitely under x64)."""
    base = 5 * s
    is_a = consts_ref[base]
    w = (
        consts_ref[base + 1],
        consts_ref[base + 2],
        consts_ref[base + 3],
        consts_ref[base + 4],
    )
    up = [_roll(c, -half) for c in vals]  # x[r + half]
    down = [_roll(c, half) for c in vals]  # x[r - half]
    if not inverse:
        sum_a = ds.add(vals[0], vals[1], up[0], up[1]) + ds.add(
            vals[2], vals[3], up[2], up[3]
        )
        diff = ds.sub(down[0], down[1], vals[0], vals[1]) + ds.sub(
            down[2], down[3], vals[2], vals[3]
        )
        prod = _cmul_parts(*diff, *w)
        return [jnp.where(is_a > 0, sv, p) for sv, p in zip(sum_a, prod)]
    prod = _cmul_parts(vals[0], vals[1], vals[2], vals[3], *w)
    t_up = [_roll(c, -half) for c in prod]
    a_vals = ds.add(vals[0], vals[1], t_up[0], t_up[1]) + ds.add(
        vals[2], vals[3], t_up[2], t_up[3]
    )
    b_vals = ds.sub(down[0], down[1], prod[0], prod[1]) + ds.sub(
        down[2], down[3], prod[2], prod[3]
    )
    return [jnp.where(is_a > 0, a, b) for a, b in zip(a_vals, b_vals)]


def _stages_scratch(vals, consts_ref, halves, inverse, ping, pong):
    """All stages, unrolled, ping-ponging through two VMEM scratch sets
    so peak live memory stays bounded (a fully value-based unroll blew
    the 16 MB scoped-vmem limit)."""
    bufs = (ping, pong)
    for c in range(4):
        ping[c][...] = vals[c]
    for s, half in enumerate(halves):
        src, dst = bufs[s % 2], bufs[(s + 1) % 2]
        cur = [src[c][...] for c in range(4)]
        out = _stage_step(cur, consts_ref, s, half, inverse)
        for c in range(4):
            dst[c][...] = out[c]
    final = bufs[len(halves) % 2]
    return [final[c][...] for c in range(4)]


def _fwd_kernel(consts_ref, hi_ref, lo_ref, orh, orl, oih, oil, ping, pong, *, k, halves):
    hi = hi_ref[...]
    lo = lo_ref[...]
    tbase = 5 * len(halves)
    # fold: z = x[:k] + i x[k:], then twist
    vals = _cmul_parts(
        hi[:k, :],
        lo[:k, :],
        hi[k:, :],
        lo[k:, :],
        consts_ref[tbase],
        consts_ref[tbase + 1],
        consts_ref[tbase + 2],
        consts_ref[tbase + 3],
    )
    vals = _stages_scratch(list(vals), consts_ref, halves, False, ping, pong)
    orh[...] = vals[0]
    orl[...] = vals[1]
    oih[...] = vals[2]
    oil[...] = vals[3]


def _inv_kernel(consts_ref, rh, rl, ih, il, ohi, olo, ping, pong, *, k, halves):
    tbase = 5 * len(halves)
    vals = _stages_scratch(
        [rh[...], rl[...], ih[...], il[...]], consts_ref, halves, True, ping, pong
    )
    vals = _cmul_parts(
        *vals,
        consts_ref[tbase],
        consts_ref[tbase + 1],
        consts_ref[tbase + 2],
        consts_ref[tbase + 3],
    )
    ohi[...] = jnp.concatenate([vals[0], vals[2]], axis=0)
    olo[...] = jnp.concatenate([vals[1], vals[3]], axis=0)


def _scratches(k):
    return [pltpu.VMEM((k, LANES), jnp.float32) for _ in range(8)]


def fwd_ds(hi: jnp.ndarray, lo: jnp.ndarray, interpret: bool = False):
    """ds pair [..., N, B] -> scrambled-frequency tuple of 4 f32
    [..., N/2, B]. B must be a multiple of 128 (pad outside)."""
    n, b = hi.shape[-2], hi.shape[-1]
    k = n // 2
    lead = hi.shape[:-2]
    ll = int(np.prod(lead)) if lead else 1
    hi2 = hi.reshape(ll, n, b)
    lo2 = lo.reshape(ll, n, b)
    consts, halves = _stage_tables(k, False)
    grid = (ll, b // LANES)
    out_shape = [jax.ShapeDtypeStruct((ll, k, b), jnp.float32)] * 4
    c_spec = pl.BlockSpec(consts.shape, lambda i, j: (_i32(0), _i32(0), _i32(0)))
    in_spec = pl.BlockSpec((1, n, LANES), lambda i, j: (_i32(i), _i32(0), _i32(j)))
    out_spec = pl.BlockSpec((1, k, LANES), lambda i, j: (_i32(i), _i32(0), _i32(j)))

    def kern(consts_ref, hi_ref, lo_ref, orh, orl, oih, oil, *scratch):
        _fwd_kernel(
            consts_ref, hi_ref.at[0], lo_ref.at[0],
            orh.at[0], orl.at[0], oih.at[0], oil.at[0],
            scratch[:4], scratch[4:], k=k, halves=halves,
        )

    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[c_spec, in_spec, in_spec],
        out_specs=[out_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=_scratches(k),
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(jnp.asarray(consts), hi2, lo2)
    return tuple(o.reshape(*lead, k, b) for o in outs)


def inv_ds(f, interpret: bool = False):
    """Scrambled-frequency tuple [..., K, B] -> ds pair (hi, lo)
    [..., N, B] (caller rounds/mods to u64)."""
    k, b = f[0].shape[-2], f[0].shape[-1]
    n = 2 * k
    lead = f[0].shape[:-2]
    ll = int(np.prod(lead)) if lead else 1
    f2 = [c.reshape(ll, k, b) for c in f]
    consts, halves = _stage_tables(k, True)
    grid = (ll, b // LANES)
    out_shape = [jax.ShapeDtypeStruct((ll, n, b), jnp.float32)] * 2
    c_spec = pl.BlockSpec(consts.shape, lambda i, j: (_i32(0), _i32(0), _i32(0)))
    in_spec = pl.BlockSpec((1, k, LANES), lambda i, j: (_i32(i), _i32(0), _i32(j)))
    out_spec = pl.BlockSpec((1, n, LANES), lambda i, j: (_i32(i), _i32(0), _i32(j)))

    def kern(consts_ref, rh, rl, ih, il, ohi, olo, *scratch):
        _inv_kernel(
            consts_ref, rh.at[0], rl.at[0], ih.at[0], il.at[0],
            ohi.at[0], olo.at[0], scratch[:4], scratch[4:], k=k, halves=halves,
        )

    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[c_spec] + [in_spec] * 4,
        out_specs=[out_spec] * 2,
        out_shape=out_shape,
        scratch_shapes=_scratches(k),
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(jnp.asarray(consts), *f2)
    return tuple(o.reshape(*lead, n, b) for o in outs)


def fwd_ds_ref(hi: jnp.ndarray, lo: jnp.ndarray):
    n = hi.shape[-2]
    k = n // 2
    consts, halves = _stage_tables(k, False)
    consts = jnp.asarray(consts)
    tbase = 5 * len(halves)
    vals = _cmul_parts(
        hi[..., :k, :], lo[..., :k, :], hi[..., k:, :], lo[..., k:, :],
        consts[tbase], consts[tbase + 1], consts[tbase + 2], consts[tbase + 3],
    )
    vals = _fft_stages(list(vals), consts, halves, False, roll=_jroll)
    return tuple(vals)


def inv_ds_ref(f):
    k = f[0].shape[-2]
    consts, halves = _stage_tables(k, True)
    consts = jnp.asarray(consts)
    tbase = 5 * len(halves)
    vals = _fft_stages(list(f), consts, halves, True, roll=_jroll)
    vals = _cmul_parts(
        *vals,
        consts[tbase], consts[tbase + 1], consts[tbase + 2], consts[tbase + 3],
    )
    hi = jnp.concatenate([vals[0], vals[2]], axis=-2)
    lo = jnp.concatenate([vals[1], vals[3]], axis=-2)
    return hi, lo
