"""TPU-optimized ds32 negacyclic FFT in coefficient-major ("t") layout.

Arrays are [N, B] / [K, B] — the polynomial/frequency index on the
*leading* axis and the ciphertext batch on the trailing (lane) axis.
This keeps every FFT stage's memory access contiguous on TPU tiles:

- DIF radix-2 with contiguous half-block slicing while blocks are
  >= _LIST_CUTOFF rows (slices land on sublane-tile boundaries);
- the final stages unstack the 16 positions-within-chunk into separate
  arrays and butterfly them elementwise with *scalar* twiddles — no
  small-stride slicing anywhere.

(The naive [..., K]-trailing layout in `fft_ds32.py` is correct
everywhere but compiles to pathological relayouts on TPU; measured
~100x off speed-of-light. This module is the production path used by
the batched bootstrap pipeline in `bootstrap_tpu.py`.)

Same transform conventions as `fft.py` (twist e^{2 pi i j/2N}, forward
DFT with negative exponent, inverse normalized with untwist/K).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from . import ds
from .torus import U64

_LIST_CUTOFF = 16


def _cadd(a, b):
    rh, rl = ds.add(a[0], a[1], b[0], b[1])
    ih, il = ds.add(a[2], a[3], b[2], b[3])
    return (rh, rl, ih, il)


def _csub(a, b):
    rh, rl = ds.sub(a[0], a[1], b[0], b[1])
    ih, il = ds.sub(a[2], a[3], b[2], b[3])
    return (rh, rl, ih, il)


def _cmul(a, b):
    pr = ds.mul(a[0], a[1], b[0], b[1])
    qr = ds.mul(a[2], a[3], b[2], b[3])
    rh, rl = ds.sub(pr[0], pr[1], qr[0], qr[1])
    pi = ds.mul(a[0], a[1], b[2], b[3])
    qi = ds.mul(a[2], a[3], b[0], b[1])
    ih, il = ds.add(pi[0], pi[1], qi[0], qi[1])
    return (rh, rl, ih, il)


def _cmul_wsplit(a, b6):
    """Complex ds multiply where b ships with Veltkamp-presplit hi
    components: b6 = (brh, brl, bih, bil, brhh, brhl, bihh, bihl) with
    brh == brhh + brhl exactly (12-bit mantissas), likewise bih. Saves
    the runtime split of the b operand in all four real multiplies
    (`ds.mul_wsplit`) — for CONSTANT operands (evaluation keys) whose
    halves are precomputed host-side (`ds.presplit_f32`)."""
    brh, brl, bih, bil, brhh, brhl, bihh, bihl = b6
    pr = ds.mul_wsplit(a[0], a[1], brh, brl, brhh, brhl)
    qr = ds.mul_wsplit(a[2], a[3], bih, bil, bihh, bihl)
    rh, rl = ds.sub(pr[0], pr[1], qr[0], qr[1])
    pi = ds.mul_wsplit(a[0], a[1], bih, bil, bihh, bihl)
    qi = ds.mul_wsplit(a[2], a[3], brh, brl, brhh, brhl)
    ih, il = ds.add(pi[0], pi[1], qi[0], qi[1])
    return (rh, rl, ih, il)


@functools.lru_cache(maxsize=16)
def _tables(k: int, inverse: bool):
    """Per-stage twiddles and the output digit-reversal permutation.

    Big stages run radix-4 where possible (half the HBM round trips of
    radix-2 — the stages are bandwidth-bound), radix-2 otherwise; the
    tail below _LIST_CUTOFF uses unstacked radix-2 stages with scalar
    twiddles. The final permutation is the mixed-radix digit reversal.
    """
    sign = 1.0 if inverse else -1.0
    big, small = [], []
    radices = []
    m = k
    while m > _LIST_CUTOFF:
        if m // 8 >= _LIST_CUTOFF:
            n = np.arange(m // 8)
            ws = []
            w1 = np.exp(sign * 2j * np.pi * n / m)
            w = w1.copy()
            for _ in range(7):
                ws.append(
                    (*ds.from_f64_array(w.real), *ds.from_f64_array(w.imag))
                )
                w = w * w1
            big.append((8, tuple(ws)))
            radices.append(8)
            m //= 8
        elif m // 4 >= _LIST_CUTOFF:
            n = np.arange(m // 4)
            w1 = np.exp(sign * 2j * np.pi * n / m)
            w2 = w1 * w1
            w3 = w2 * w1
            big.append(
                (
                    4,
                    tuple(
                        (*ds.from_f64_array(w.real), *ds.from_f64_array(w.imag))
                        for w in (w1, w2, w3)
                    ),
                )
            )
            radices.append(4)
            m //= 4
        else:
            n = np.arange(m // 2)
            w = np.exp(sign * 2j * np.pi * n / m)
            big.append((2, ((*ds.from_f64_array(w.real), *ds.from_f64_array(w.imag)),)))
            radices.append(2)
            m //= 2
    while m >= 2:
        n = np.arange(m // 2)
        w = np.exp(sign * 2j * np.pi * n / m)
        small.append(
            [
                (
                    np.float32(w.real[i]),
                    np.float32(w.real[i] - np.float64(np.float32(w.real[i]))),
                    np.float32(w.imag[i]),
                    np.float32(w.imag[i] - np.float64(np.float32(w.imag[i]))),
                )
                for i in range(m // 2)
            ]
        )
        radices.append(2)
        m //= 2

    # mixed-radix digit-reversal: position table pos[k_freq] built by the
    # recursive residue-class split the DIF stages perform
    def perm(length, rads):
        if not rads:
            return list(range(length))
        r = rads[0]
        sub = perm(length // r, rads[1:])
        out = []
        for j in range(r):
            out.extend(j + r * s for s in sub)
        return out

    freq_at_pos = perm(k, radices)
    # i32 indices: these appear inside the x32-only (Mosaic-compatible)
    # limb pipeline graphs, which must stay free of 64-bit dtypes
    br = np.zeros(k, dtype=np.int32)
    br[np.asarray(freq_at_pos)] = np.arange(k)
    return big, small, br


def _fft_core_t(comps, inverse: bool, take_out: bool = True):
    """comps: tuple of 4 f32 arrays [..., K, B] (K on axis -2).

    `take_out=False` skips the final digit-reversal gather and returns
    the DIF-output (scrambled) order — for benchmarking/backends that
    keep a consistent scrambled-frequency convention."""
    k = comps[0].shape[-2]
    bb = comps[0].shape[-1]
    lead = comps[0].shape[:-2]
    big, small, br = _tables(k, inverse)

    # big stages: contiguous quarter/half-block butterflies via
    # [..., K/m, m, B] views
    m = k
    for radix, tws in big:
        x = [c.reshape(*lead, k // m, m, bb) for c in comps]
        if radix == 8:
            q = m // 8
            xs = [tuple(c[..., t * q:(t + 1) * q, :] for c in x) for t in range(8)]
            tws8 = tuple(tuple(t[:, None] for t in w) for w in tws)
            ys = _radix8_dif(xs, tws8, inverse)
            comps = tuple(
                jnp.concatenate([ys[r][c] for r in range(8)], axis=-2).reshape(
                    *lead, k, bb
                )
                for c in range(4)
            )
            m //= 8
        elif radix == 4:
            q = m // 4
            xa = tuple(c[..., 0 * q : 1 * q, :] for c in x)
            xb = tuple(c[..., 1 * q : 2 * q, :] for c in x)
            xc = tuple(c[..., 2 * q : 3 * q, :] for c in x)
            xd = tuple(c[..., 3 * q : 4 * q, :] for c in x)
            t0 = _cadd(xa, xc)
            t1 = _csub(xa, xc)
            t2 = _cadd(xb, xd)
            bd = _csub(xb, xd)
            # t3 = -i*(b-d) forward, +i*(b-d) inverse
            if inverse:
                t3 = (-bd[2], -bd[3], bd[0], bd[1])
            else:
                t3 = (bd[2], bd[3], -bd[0], -bd[1])
            w1, w2, w3 = (tuple(t[:, None] for t in w) for w in tws)
            y0 = _cadd(t0, t2)
            y1 = _cmul(_cadd(t1, t3), w1)
            y2 = _cmul(_csub(t0, t2), w2)
            y3 = _cmul(_csub(t1, t3), w3)
            comps = tuple(
                jnp.concatenate([a4, b4, c4, d4], axis=-2).reshape(*lead, k, bb)
                for a4, b4, c4, d4 in zip(y0, y1, y2, y3)
            )
            m //= 4
        else:
            half = m // 2
            a = tuple(c[..., :half, :] for c in x)
            b = tuple(c[..., half:, :] for c in x)
            tww = tuple(t[:, None] for t in tws[0])
            top = _cadd(a, b)
            bot = _cmul(_csub(a, b), tww)
            comps = tuple(
                jnp.concatenate([t, bo], axis=-2).reshape(*lead, k, bb)
                for t, bo in zip(top, bot)
            )
            m //= 2

    # list stages: unstack chunk positions into separate arrays
    cut = min(_LIST_CUTOFF, k)
    x3 = [c.reshape(*lead, k // cut, cut, bb) for c in comps]
    ys = [tuple(c[..., p, :] for c in x3) for p in range(cut)]
    m = cut
    for tws in small:
        half = m // 2
        nxt = list(ys)
        for base in range(0, cut, m):
            for p in range(half):
                a = ys[base + p]
                b = ys[base + half + p]
                w = tws[p]
                nxt[base + p] = _cadd(a, b)
                d = _csub(a, b)
                if p == 0:
                    nxt[base + half + p] = d  # w = 1
                else:
                    nxt[base + half + p] = (
                        *ds.sub(*ds.mul(d[0], d[1], w[0], w[1]),
                                *ds.mul(d[2], d[3], w[2], w[3])),
                        *ds.add(*ds.mul(d[0], d[1], w[2], w[3]),
                                *ds.mul(d[2], d[3], w[0], w[1])),
                    )
        ys = nxt
        m //= 2

    stacked = tuple(
        jnp.stack([ys[p][c] for p in range(cut)], axis=-2).reshape(*lead, k, bb)
        for c in range(4)
    )
    if not take_out:
        return stacked
    return tuple(jnp.take(c, br, axis=-2) for c in stacked)


_ISQ2 = ds.from_f64_array(np.float64(2.0 ** -0.5))


def _scale_isq2(z):
    """Multiply a comps tuple by the real ds constant 1/sqrt(2).

    The constants MUST stay np.float32 scalars: a python float would
    make `ds._split` run in f64 and return a full-mantissa "split",
    silently degrading two_prod to ~f32 accuracy."""
    c_hi, c_lo = np.float32(_ISQ2[0]), np.float32(_ISQ2[1])
    rh, rl = ds.mul(z[0], z[1], c_hi, c_lo)
    ih, il = ds.mul(z[2], z[3], c_hi, c_lo)
    return (rh, rl, ih, il)


def _mul_i(z, s):
    """s*i*z for s = +-1 on a comps tuple."""
    if s > 0:
        return (-z[2], -z[3], z[0], z[1])
    return (z[2], z[3], -z[0], -z[1])


def _mul_w8(z, s):
    """omega^1 * z, omega = e^(s*2*pi*i/8) = (1 + s*i)/sqrt(2)."""
    if s > 0:
        re = _2sub(z[0], z[1], z[2], z[3])
        im = _2add(z[2], z[3], z[0], z[1])
    else:
        re = _2add(z[0], z[1], z[2], z[3])
        im = _2sub(z[2], z[3], z[0], z[1])
    return _scale_isq2((*re, *im))


def _mul_w8_3(z, s):
    """omega^3 * z = (s*i - 1)/sqrt(2) * z."""
    if s > 0:
        # (i - 1)/sqrt(2): re = -(zr + zi), im = zr - zi
        re = _2add(z[0], z[1], z[2], z[3])
        im = _2sub(z[0], z[1], z[2], z[3])
        re = (-re[0], -re[1])
    else:
        re = _2sub(z[0], z[1], z[2], z[3])
        im = _2add(z[2], z[3], z[0], z[1])
        re = (-re[0], -re[1])
        im = (-im[0], -im[1])
    return _scale_isq2((*re, *im))


def _2add(ah, al, bh, bl):
    return ds.add(ah, al, bh, bl)


def _2sub(ah, al, bh, bl):
    return ds.sub(ah, al, bh, bl)


def _dft4(z0, z1, z2, z3, s):
    """4-point DFT, omega4 = s*i: returns (u0, u1, u2, u3)."""
    t0 = _cadd(z0, z2)
    t1 = _csub(z0, z2)
    t2 = _cadd(z1, z3)
    t3 = _mul_i(_csub(z1, z3), s)
    return _cadd(t0, t2), _cadd(t1, t3), _csub(t0, t2), _csub(t1, t3)


def _dft8(xs, s):
    """8-point DFT with omega = e^(s*2*pi*i/8): y[r] = sum_t x[t] w^(rt).
    Even outputs via DFT4 of (x_t + x_{t+4}); odd via DFT4 of
    omega^t * (x_t - x_{t+4})."""
    a = [_cadd(xs[t], xs[t + 4]) for t in range(4)]
    b = [_csub(xs[t], xs[t + 4]) for t in range(4)]
    b[1] = _mul_w8(b[1], s)
    b[2] = _mul_i(b[2], s)
    b[3] = _mul_w8_3(b[3], s)
    e0, e1, e2, e3 = _dft4(a[0], a[1], a[2], a[3], s)
    o0, o1, o2, o3 = _dft4(b[0], b[1], b[2], b[3], s)
    return [e0, o0, e1, o1, e2, o2, e3, o3]


def _radix8_dif(xs, tws, inverse):
    """One radix-8 DIF butterfly group: 8 input comps-tuples (eighths of
    a block) -> 8 output groups y_r = w_r * DFT8(x)[r]."""
    s = 1 if inverse else -1
    ys = _dft8(xs, s)
    return [ys[0]] + [_cmul(ys[r], tws[r - 1]) for r in range(1, 8)]


def _radix8_dit(ys, tws):
    """Inverse of `_radix8_dif(..., inverse=False)` up to the x8 factor
    (absorbed in the untwist /K): u_r = conj(w_r) * y_r, then DFT8 with
    s = +1. `tws` are the inverse-sign twiddle tables."""
    us = [ys[0]] + [_cmul(ys[r], tws[r - 1]) for r in range(1, 8)]
    return _dft8(us, 1)


def _radix4_dif(xa, xb, xc, xd, tws, inverse):
    """One radix-4 DIF butterfly group on 4 comps-tuples (quarters of a
    block); returns the 4 output quarters (y0..y3)."""
    t0 = _cadd(xa, xc)
    t1 = _csub(xa, xc)
    t2 = _cadd(xb, xd)
    bd = _csub(xb, xd)
    if inverse:
        t3 = (-bd[2], -bd[3], bd[0], bd[1])
    else:
        t3 = (bd[2], bd[3], -bd[0], -bd[1])
    w1, w2, w3 = tws
    y0 = _cadd(t0, t2)
    y1 = _cmul(_cadd(t1, t3), w1)
    y2 = _cmul(_csub(t0, t2), w2)
    y3 = _cmul(_csub(t1, t3), w3)
    return y0, y1, y2, y3


def _radix4_dit(y0, y1, y2, y3, tws):
    """Inverse of `_radix4_dif(..., inverse=False)` up to the x4 factor
    (absorbed in the untwist /K)."""
    w1, w2, w3 = tws
    u1 = _cmul(y1, w1)
    u2 = _cmul(y2, w2)
    u3 = _cmul(y3, w3)
    t0 = _cadd(y0, u2)
    t2 = _csub(y0, u2)
    t1 = _cadd(u1, u3)
    t3 = _csub(u1, u3)
    it3 = (-t3[2], -t3[3], t3[0], t3[1])  # i * t3 == (b - d)
    return _cadd(t0, t1), _cadd(t2, it3), _csub(t0, t1), _csub(t2, it3)


def _fft_core_t_list(comps):
    """Concat-free forward DIF core (scrambled output order, identical to
    `_fft_core_t(..., take_out=False)` bit for bit): big radix-4 stages
    keep blocks as separate arrays instead of concatenating — the
    concatenates each materialized the whole working set to HBM, which
    dominated the transform cost. One stack materializes the result."""
    k = comps[0].shape[-2]
    bb = comps[0].shape[-1]
    lead = comps[0].shape[:-2]
    big, small, _ = _tables(k, False)

    blocks = [comps]  # list of comps-tuples, block size m each
    m = k
    for radix, tws in big:
        if radix == 8:
            q = m // 8
            tws8 = tuple(tuple(t[:, None] for t in w) for w in tws)
            nxt = []
            for blk in blocks:
                xs = [
                    tuple(c[..., t * q:(t + 1) * q, :] for c in blk)
                    for t in range(8)
                ]
                nxt.extend(_radix8_dif(xs, tws8, False))
            blocks = nxt
            m //= 8
        elif radix == 4:
            q = m // 4
            tws4 = tuple(tuple(t[:, None] for t in w) for w in tws)
            nxt = []
            for blk in blocks:
                xa = tuple(c[..., 0 * q : 1 * q, :] for c in blk)
                xb = tuple(c[..., 1 * q : 2 * q, :] for c in blk)
                xc = tuple(c[..., 2 * q : 3 * q, :] for c in blk)
                xd = tuple(c[..., 3 * q : 4 * q, :] for c in blk)
                nxt.extend(_radix4_dif(xa, xb, xc, xd, tws4, False))
            blocks = nxt
            m //= 4
        else:
            half = m // 2
            tww = tuple(t[:, None] for t in tws[0])
            nxt = []
            for blk in blocks:
                a = tuple(c[..., :half, :] for c in blk)
                b = tuple(c[..., half:, :] for c in blk)
                nxt.append(_cadd(a, b))
                nxt.append(_cmul(_csub(a, b), tww))
            blocks = nxt
            m //= 2

    cut = min(_LIST_CUTOFF, k)
    assert m == cut and len(blocks) == k // cut
    # positions within each block, as lists across blocks: ys[p][c] has
    # shape [..., k//cut, B] after stacking the block axis
    ys = [
        tuple(
            jnp.stack([blk[c][..., p, :] for blk in blocks], axis=-2)
            for c in range(4)
        )
        for p in range(cut)
    ]
    for tws in small:
        half = m // 2
        nxt = list(ys)
        for base in range(0, cut, m):
            for p in range(half):
                a = ys[base + p]
                b = ys[base + half + p]
                w = tws[p]
                nxt[base + p] = _cadd(a, b)
                d = _csub(a, b)
                if p == 0:
                    nxt[base + half + p] = d
                else:
                    nxt[base + half + p] = (
                        *ds.sub(*ds.mul(d[0], d[1], w[0], w[1]),
                                *ds.mul(d[2], d[3], w[2], w[3])),
                        *ds.add(*ds.mul(d[0], d[1], w[2], w[3]),
                                *ds.mul(d[2], d[3], w[0], w[1])),
                    )
        ys = nxt
        m //= 2

    return tuple(
        jnp.stack([ys[p][c] for p in range(cut)], axis=-2).reshape(*lead, k, bb)
        for c in range(4)
    )


def _ifft_core_t_list(comps):
    """Concat-free mirror of `_ifft_core_t_dit` (same values bit for
    bit): small DIT stages on position lists, then big radix-4/2 DIT
    stages on a flat list of cut-row sub-arrays with statically sliced
    twiddles, one final stack. Avoids the per-stage concatenate
    materializations of the reshaping formulation."""
    k = comps[0].shape[-2]
    bb = comps[0].shape[-1]
    lead = comps[0].shape[:-2]
    big, small, _ = _tables(k, True)

    cut = min(_LIST_CUTOFF, k)
    x3 = [c.reshape(*lead, k // cut, cut, bb) for c in comps]
    ys = [tuple(c[..., p, :] for c in x3) for p in range(cut)]
    m = 2
    for tws in reversed(small):
        half = m // 2
        nxt = list(ys)
        for base in range(0, cut, m):
            for p in range(half):
                u = ys[base + p]
                v = ys[base + half + p]
                w = tws[p]
                if p == 0:
                    vp = v
                else:
                    vp = (
                        *ds.sub(*ds.mul(v[0], v[1], w[0], w[1]),
                                *ds.mul(v[2], v[3], w[2], w[3])),
                        *ds.add(*ds.mul(v[0], v[1], w[2], w[3]),
                                *ds.mul(v[2], v[3], w[0], w[1])),
                    )
                nxt[base + p] = _cadd(u, vp)
                nxt[base + half + p] = _csub(u, vp)
        ys = nxt
        m *= 2

    # sub-array t = rows [cut*t, cut*(t+1)): stack positions per block
    n_sub = k // cut
    subs = [
        tuple(
            jnp.stack([ys[p][c][..., t, :] for p in range(cut)], axis=-2)
            for c in range(4)
        )
        for t in range(n_sub)
    ]

    ms = []
    mm = k
    for radix, _tws in big:
        ms.append(mm)
        mm //= radix
    for (radix, tws), m in zip(reversed(big), reversed(ms)):
        per_block = m // cut  # sub-arrays per block at this stage
        if radix == 8:
            q = per_block // 8
            nxt = list(subs)
            for base in range(0, n_sub, per_block):
                for s in range(q):
                    wsl = tuple(
                        tuple(t[s * cut:(s + 1) * cut, None] for t in w)
                        for w in tws
                    )
                    outs = _radix8_dit(
                        [subs[base + t * q + s] for t in range(8)], wsl
                    )
                    for t in range(8):
                        nxt[base + t * q + s] = outs[t]
            subs = nxt
        elif radix == 4:
            q = per_block // 4  # sub-arrays per quarter
            nxt = list(subs)
            for base in range(0, n_sub, per_block):
                for s in range(q):
                    wsl = tuple(
                        tuple(t[s * cut:(s + 1) * cut, None] for t in w)
                        for w in tws
                    )
                    a4, b4, c4, d4 = _radix4_dit(
                        subs[base + 0 * q + s],
                        subs[base + 1 * q + s],
                        subs[base + 2 * q + s],
                        subs[base + 3 * q + s],
                        wsl,
                    )
                    nxt[base + 0 * q + s] = a4
                    nxt[base + 1 * q + s] = b4
                    nxt[base + 2 * q + s] = c4
                    nxt[base + 3 * q + s] = d4
            subs = nxt
        else:
            half = per_block // 2
            nxt = list(subs)
            for base in range(0, n_sub, per_block):
                for s in range(half):
                    wsl = tuple(
                        t[s * cut:(s + 1) * cut, None] for t in tws[0]
                    )
                    u = subs[base + s]
                    vp = _cmul(subs[base + half + s], wsl)
                    nxt[base + s] = _cadd(u, vp)
                    nxt[base + half + s] = _csub(u, vp)
            subs = nxt

    stacked = tuple(
        jnp.stack([subs[t][c] for t in range(n_sub)], axis=-3)
        for c in range(4)
    )
    return tuple(c.reshape(*lead, k, bb) for c in stacked)


def _ifft_core_t_dit(comps):
    """Algebraic inverse of `_fft_core_t(..., inverse=False,
    take_out=False)`: consumes the DIF-output (digit-scrambled) order and
    returns natural coefficient order with NO permutation gather.

    Each forward stage  [a; b] -> [a+b, (a-b)*w]  inverts (up to a factor
    of 2 per radix-2 stage, absorbed by the caller's untwist /K) to
    v' = v*conj(w); a = u+v'; b = u-v' — i.e. a classic DIT pipeline with
    the inverse-sign twiddle tables, stages mirrored small-to-big. The
    digit-reversal `jnp.take` of the DIF path (a ~170 us HBM gather per
    forward call at production shapes) disappears entirely; pointwise
    frequency-domain consumers only need keys/phases in the same
    scrambled order (see `dif_bit_images`)."""
    k = comps[0].shape[-2]
    bb = comps[0].shape[-1]
    lead = comps[0].shape[:-2]
    big, small, _ = _tables(k, True)  # inverse-sign twiddles, same radices

    # mirrored small list stages first: m = 2 .. cut
    cut = min(_LIST_CUTOFF, k)
    x3 = [c.reshape(*lead, k // cut, cut, bb) for c in comps]
    ys = [tuple(c[..., p, :] for c in x3) for p in range(cut)]
    m = 2
    for tws in reversed(small):
        half = m // 2
        nxt = list(ys)
        for base in range(0, cut, m):
            for p in range(half):
                u = ys[base + p]
                v = ys[base + half + p]
                w = tws[p]
                if p == 0:
                    vp = v  # w = 1
                else:
                    vp = (
                        *ds.sub(*ds.mul(v[0], v[1], w[0], w[1]),
                                *ds.mul(v[2], v[3], w[2], w[3])),
                        *ds.add(*ds.mul(v[0], v[1], w[2], w[3]),
                                *ds.mul(v[2], v[3], w[0], w[1])),
                    )
                nxt[base + p] = _cadd(u, vp)
                nxt[base + half + p] = _csub(u, vp)
        ys = nxt
        m *= 2
    comps = tuple(
        jnp.stack([ys[p][c] for p in range(cut)], axis=-2).reshape(*lead, k, bb)
        for c in range(4)
    )

    # mirrored big stages: m ascending (reverse of the DIF order)
    ms = []
    mm = k
    for radix, _tws in big:
        ms.append(mm)
        mm //= radix
    for (radix, tws), m in zip(reversed(big), reversed(ms)):
        x = [c.reshape(*lead, k // m, m, bb) for c in comps]
        if radix == 8:
            q = m // 8
            ys = [tuple(c[..., t * q:(t + 1) * q, :] for c in x) for t in range(8)]
            tws8 = tuple(tuple(t[:, None] for t in w) for w in tws)
            outs = _radix8_dit(ys, tws8)
            comps = tuple(
                jnp.concatenate([outs[t][c] for t in range(8)], axis=-2).reshape(
                    *lead, k, bb
                )
                for c in range(4)
            )
            continue
        if radix == 4:
            q = m // 4
            y0 = tuple(c[..., 0 * q : 1 * q, :] for c in x)
            y1 = tuple(c[..., 1 * q : 2 * q, :] for c in x)
            y2 = tuple(c[..., 2 * q : 3 * q, :] for c in x)
            y3 = tuple(c[..., 3 * q : 4 * q, :] for c in x)
            w1, w2, w3 = (tuple(t[:, None] for t in w) for w in tws)
            u1 = _cmul(y1, w1)
            u2 = _cmul(y2, w2)
            u3 = _cmul(y3, w3)
            t0 = _cadd(y0, u2)
            t2 = _csub(y0, u2)
            t1 = _cadd(u1, u3)
            t3 = _csub(u1, u3)
            it3 = (-t3[2], -t3[3], t3[0], t3[1])  # i * t3 == (b - d)
            a4 = _cadd(t0, t1)
            c4 = _csub(t0, t1)
            b4 = _cadd(t2, it3)
            d4 = _csub(t2, it3)
            comps = tuple(
                jnp.concatenate([aa, bb4, cc, dd], axis=-2).reshape(*lead, k, bb)
                for aa, bb4, cc, dd in zip(a4, b4, c4, d4)
            )
        else:
            half = m // 2
            u = tuple(c[..., :half, :] for c in x)
            v = tuple(c[..., half:, :] for c in x)
            tww = tuple(t[:, None] for t in tws[0])
            vp = _cmul(v, tww)
            top = _cadd(u, vp)
            bot = _csub(u, vp)
            comps = tuple(
                jnp.concatenate([t, bo], axis=-2).reshape(*lead, k, bb)
                for t, bo in zip(top, bot)
            )
    return comps


@functools.lru_cache(maxsize=16)
def dif_freq_order(k: int):
    """freq_at_pos: position r of the take-free DIF output holds natural
    frequency bin `dif_freq_order(k)[r]` (numpy i64)."""
    _, _, br = _tables(k, False)
    freq_at_pos = np.zeros(k, dtype=np.int64)
    freq_at_pos[br] = np.arange(k)  # br[freq] = pos  ->  invert
    return freq_at_pos


@functools.lru_cache(maxsize=16)
def dif_bit_images(k: int):
    """The DIF digit reversal is a permutation of index BITS, so
    f(r) = sum over set bits j of f(2^j). Returns the tuple of images
    (f(2^0), f(2^1), ...) for building frequency-ordered geometric
    sequences (phase tables) directly in scrambled order; asserts
    bit-linearity as a self-check."""
    f = dif_freq_order(k)
    imgs = tuple(int(f[1 << j]) for j in range(k.bit_length() - 1))
    r = np.arange(k)
    recon = np.zeros(k, dtype=np.int64)
    for j, img in enumerate(imgs):
        recon += ((r >> j) & 1) * img
    assert np.array_equal(recon, f), "DIF digit reversal is not bit-linear"
    return imgs


@functools.lru_cache(maxsize=16)
def _twist_tables_t(n: int):
    kk = n // 2
    j = np.arange(kk)
    tw = np.exp(2j * np.pi * j / (2 * n))
    untw = (1.0 / tw) / kk
    tw_c = (*ds.from_f64_array(tw.real), *ds.from_f64_array(tw.imag))
    untw_c = (*ds.from_f64_array(untw.real), *ds.from_f64_array(untw.imag))
    return (
        tuple(t[:, None] for t in tw_c),
        tuple(t[:, None] for t in untw_c),
    )


def fwd_torus_t(x: jnp.ndarray):
    """u64 [..., N, B] -> freq tuple of 4 f32 [..., N/2, B]."""
    n = x.shape[-2]
    kk = n // 2
    xi = x.astype(jnp.int64)
    hi, lo = ds.from_i64(xi)
    twist, _ = _twist_tables_t(n)
    z = (hi[..., :kk, :], lo[..., :kk, :], hi[..., kk:, :], lo[..., kk:, :])
    z = _cmul(z, twist)
    return _fft_core_t(z, inverse=False)


def fwd_signed_t(x: jnp.ndarray):
    return fwd_torus_t(x.astype(jnp.int64).astype(U64))


def inv_t(f) -> jnp.ndarray:
    """freq tuple [..., K, B] -> u64 [..., N, B] with round + mod q."""
    _, untwist = _twist_tables_t(f[0].shape[-2] * 2)
    z = _fft_core_t(f, inverse=True)
    z = _cmul(z, untwist)
    re = ds.to_u64_mod_q(z[0], z[1])
    im = ds.to_u64_mod_q(z[2], z[3])
    return jnp.concatenate([re, im], axis=-2)


def cmadd_t(acc, a, b):
    """acc += a*b on freq tuples (broadcastable components)."""
    return _cadd(acc, _cmul(a, b))


def zeros_t(shape):
    z = jnp.zeros(shape, dtype=jnp.float32)
    return (z, z, z, z)
