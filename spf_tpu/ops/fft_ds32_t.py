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
        if m // 4 >= _LIST_CUTOFF:
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


def _fft_core_t(comps, inverse: bool):
    """comps: tuple of 4 f32 arrays [..., K, B] (K on axis -2)."""
    k = comps[0].shape[-2]
    bb = comps[0].shape[-1]
    lead = comps[0].shape[:-2]
    big, small, br = _tables(k, inverse)

    # big stages: contiguous quarter/half-block butterflies via
    # [..., K/m, m, B] views
    m = k
    for radix, tws in big:
        x = [c.reshape(*lead, k // m, m, bb) for c in comps]
        if radix == 4:
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
    return tuple(jnp.take(c, br, axis=-2) for c in stacked)


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
