"""Negacyclic FFT backend in double-single f32 arithmetic — the TPU
production path.

Same transform conventions as the C128 backend (`fft.py`), but every
complex value is a pair of ds numbers (4 f32 arrays: re_hi, re_lo,
im_hi, im_lo), carrying ~48 mantissa bits — enough for the external
product error budget at q = 2**64 (f32 alone would give ~2**59 error;
ds32 gives ~2**38, below/near the crypto noise, like the reference's
f64 at ~2**31).

The FFT is an iterative radix-2 DIT over the last axis with a
precomputed bit-reversal permutation and per-stage ds twiddles —
pure jnp elementwise ops, so XLA vectorizes it across batch dims on
the VPU; a fused Pallas kernel can swap in underneath later without
changing this interface.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import ds
from .torus import U64


@jax.tree_util.register_pytree_node_class
class DsFreq:
    """A frequency-domain value: 4 f32 component arrays of identical
    (logical) shape. Indexing applies to all components, so generic
    ciphertext indexing code works unchanged."""

    __slots__ = ("rh", "rl", "ih", "il")

    def __init__(self, rh, rl, ih, il):
        self.rh, self.rl, self.ih, self.il = rh, rl, ih, il

    @property
    def shape(self):
        return self.rh.shape

    def __getitem__(self, idx):
        return DsFreq(self.rh[idx], self.rl[idx], self.ih[idx], self.il[idx])

    def tree_flatten(self):
        return (self.rh, self.rl, self.ih, self.il), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def astuple(self):
        return self.rh, self.rl, self.ih, self.il


def _cadd(a: DsFreq, b: DsFreq) -> DsFreq:
    rh, rl = ds.add(a.rh, a.rl, b.rh, b.rl)
    ih, il = ds.add(a.ih, a.il, b.ih, b.il)
    return DsFreq(rh, rl, ih, il)


def _csub(a: DsFreq, b: DsFreq) -> DsFreq:
    rh, rl = ds.sub(a.rh, a.rl, b.rh, b.rl)
    ih, il = ds.sub(a.ih, a.il, b.ih, b.il)
    return DsFreq(rh, rl, ih, il)


def _cmul(a: DsFreq, b: DsFreq) -> DsFreq:
    # (ar + i ai)(br + i bi) = (ar*br - ai*bi) + i(ar*bi + ai*br)
    pr_h, pr_l = ds.mul(a.rh, a.rl, b.rh, b.rl)
    qr_h, qr_l = ds.mul(a.ih, a.il, b.ih, b.il)
    rh, rl = ds.sub(pr_h, pr_l, qr_h, qr_l)
    pi_h, pi_l = ds.mul(a.rh, a.rl, b.ih, b.il)
    qi_h, qi_l = ds.mul(a.ih, a.il, b.rh, b.rl)
    ih, il = ds.add(pi_h, pi_l, qi_h, qi_l)
    return DsFreq(rh, rl, ih, il)


@functools.lru_cache(maxsize=16)
def _fft_tables(k: int, inverse: bool):
    """Bit-reversal permutation and per-stage ds twiddles for a size-k
    radix-2 DIT FFT (forward: e^{-2pi i j/m}; inverse: conjugate)."""
    stages = int(np.log2(k))
    assert 1 << stages == k
    br = np.zeros(k, dtype=np.int64)
    for i in range(k):
        br[i] = int(format(i, f"0{stages}b")[::-1], 2) if stages else 0
    twiddles = []
    for s in range(1, stages + 1):
        m = 1 << s
        j = np.arange(m // 2)
        sign = 1.0 if inverse else -1.0
        w = np.exp(sign * 2j * np.pi * j / m)
        twiddles.append(
            (*ds.from_f64_array(w.real), *ds.from_f64_array(w.imag))
        )
    # numpy constants only: cached across jit traces
    return br, twiddles


def _fft_core(z: DsFreq, inverse: bool) -> DsFreq:
    """In-place-style radix-2 DIT over the last axis (size k)."""
    k = z.shape[-1]
    br, twiddles = _fft_tables(k, inverse)
    comps = [c[..., br] for c in z.astuple()]
    stages = int(np.log2(k))
    for s in range(1, stages + 1):
        m = 1 << s
        half = m // 2
        twh_r, twl_r, twh_i, twl_i = twiddles[s - 1]
        tw = DsFreq(twh_r, twl_r, twh_i, twl_i)
        reshaped = [c.reshape(*c.shape[:-1], k // m, m) for c in comps]
        a = DsFreq(*[c[..., :half] for c in reshaped])
        b = DsFreq(*[c[..., half:] for c in reshaped])
        t = _cmul(tw, b)
        top = _cadd(a, t)
        bot = _csub(a, t)
        comps = [
            jnp.concatenate([x, y], axis=-1).reshape(*x.shape[:-2], k)
            for x, y in zip(top.astuple(), bot.astuple())
        ]
    return DsFreq(*comps)


@functools.lru_cache(maxsize=16)
def _twist_tables(n: int):
    """Twist e^{2 pi i j/(2n)} and untwist (1/tw)/(n/2) as ds constants."""
    kk = n // 2
    j = np.arange(kk)
    tw = np.exp(2j * np.pi * j / (2 * n))
    untw = (1.0 / tw) / kk
    return (
        DsFreq(*ds.from_f64_array(tw.real), *ds.from_f64_array(tw.imag)),
        DsFreq(*ds.from_f64_array(untw.real), *ds.from_f64_array(untw.imag)),
    )


class DS32Backend:
    """Double-single f32 negacyclic FFT backend (TPU-safe)."""

    name = "ds32"

    def _fwd(self, hi, lo, n: int):
        kk = n // 2
        twist, _ = _twist_tables(n)
        z = DsFreq(hi[..., :kk], lo[..., :kk], hi[..., kk:], lo[..., kk:])
        z = _cmul(z, twist)
        return _fft_core(z, inverse=False)

    def fwd_torus(self, x: jnp.ndarray) -> DsFreq:
        xi = x.astype(jnp.int64)
        hi, lo = ds.from_i64(xi)
        return self._fwd(hi, lo, x.shape[-1])

    def fwd_signed(self, x: jnp.ndarray) -> DsFreq:
        hi, lo = ds.from_i64(x.astype(jnp.int64))
        return self._fwd(hi, lo, x.shape[-1])

    def inv(self, f: DsFreq) -> jnp.ndarray:
        kk = f.shape[-1]
        _, untwist = _twist_tables(kk * 2)
        z = _fft_core(f, inverse=True)
        z = _cmul(z, untwist)
        re = ds.to_u64_mod_q(z.rh, z.rl)
        im = ds.to_u64_mod_q(z.ih, z.il)
        return jnp.concatenate([re, im], axis=-1).astype(U64)

    # --- frequency-domain arithmetic ---

    def zeros(self, shape) -> DsFreq:
        z = jnp.zeros(shape, dtype=jnp.float32)
        return DsFreq(z, z, z, z)

    def add(self, a, b):
        return _cadd(a, b)

    def sub(self, a, b):
        return _csub(a, b)

    def mul(self, a, b):
        return _cmul(a, b)

    def cmadd(self, acc, a, b):
        return _cadd(acc, _cmul(a, b))

    def stack(self, fs, axis=0):
        return DsFreq(
            *[
                jnp.stack([f.astuple()[c] for f in fs], axis=axis)
                for c in range(4)
            ]
        )

    def set_component(self, acc: DsFreq, idx: int, value: DsFreq) -> DsFreq:
        return DsFreq(
            acc.rh.at[..., idx, :].set(value.rh),
            acc.rl.at[..., idx, :].set(value.rl),
            acc.ih.at[..., idx, :].set(value.ih),
            acc.il.at[..., idx, :].set(value.il),
        )


DS32 = DS32Backend()
