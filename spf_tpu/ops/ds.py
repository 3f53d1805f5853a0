"""Double-single (f32 pair) arithmetic — error-free transformations.

TPUs have no native f64 (XLA's emulated f64 multiply measures only ~40
effective mantissa bits on v5e, insufficient for TFHE's negacyclic FFT),
and Pallas/Mosaic kernels are f32-only. A double-single number `hi + lo`
(|lo| <= ulp(hi)/2) carries ~48 mantissa bits, enough for the external
product's error budget (see `fft.py` docs).

Algorithms: Dekker/Knuth TwoSum and Veltkamp-split TwoProd (no FMA
required; FP contraction of `a*b - p` into fma only *improves* the
error term). The reference gets this precision for free from hardware
f64 (`Complex<f64>` in `sunscreen_tfhe/src/ops/fft_ops.rs`).
"""

from __future__ import annotations

import jax.numpy as jnp

F32 = jnp.float32
# 2**12 + 1, Veltkamp split constant for f32 (python float so it embeds
# as a literal inside Pallas kernels instead of a captured array)
_SPLIT = 4097.0


def two_sum(a, b):
    """Exact sum: s + err == a + b."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def quick_two_sum(a, b):
    """Exact sum assuming |a| >= |b|."""
    s = a + b
    err = b - (s - a)
    return s, err


def _split(a):
    t = _SPLIT * a
    hi = t - (t - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    """Exact product: p + err == a * b."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def add(ahi, alo, bhi, blo):
    s, e = two_sum(ahi, bhi)
    e = e + (alo + blo)
    return quick_two_sum(s, e)


def sub(ahi, alo, bhi, blo):
    return add(ahi, alo, -bhi, -blo)


def neg(ahi, alo):
    return -ahi, -alo


def mul(ahi, alo, bhi, blo):
    p, e = two_prod(ahi, bhi)
    e = e + (ahi * blo + alo * bhi)
    return quick_two_sum(p, e)


def mul_wsplit(ahi, alo, bhi, blo, bhh, bhl):
    """ds multiply where the b operand's hi component ships with its
    Veltkamp halves precomputed (bhh + bhl == bhi exactly, 12-bit
    mantissas) — saves the runtime split of b. Used for constant
    twiddle/phase tables; ~14% fewer flops than `mul`."""
    p = ahi * bhi
    ah, al = _split(ahi)
    err = ((ah * bhh - p) + ah * bhl + al * bhh) + al * bhl
    e = err + (ahi * blo + alo * bhi)
    return quick_two_sum(p, e)


def presplit_f32(x):
    """Veltkamp halves of an f32 numpy array (host-side, exact)."""
    import numpy as np

    x = np.asarray(x, dtype=np.float32)
    t = np.float32(_SPLIT) * x
    hi = t - (t - x)
    lo = x - hi
    return hi.astype(np.float32), lo.astype(np.float32)


def mul_f32(ahi, alo, b):
    """Multiply a ds number by a plain f32."""
    p, e = two_prod(ahi, b)
    e = e + alo * b
    return quick_two_sum(p, e)


def from_f64_array(x):
    """Split f64 (numpy) values into ds (hi, lo) f32 pairs — used for
    constants like twiddle factors. Returns numpy arrays so results can
    be cached safely across jit traces."""
    import numpy as np

    hi = np.asarray(x, dtype=np.float32)
    lo = np.asarray(x - hi.astype(np.float64), dtype=np.float32)
    return hi, lo


def from_i64(x):
    """Convert i64 values (|x| < 2^63) to ds pairs capturing the top ~48
    bits."""
    # clamp the hi component itself below +2^63: f32(2^63-1) rounds UP to
    # 2^63, whose i64 cast clamps — computing the residual against a
    # different value than the stored hi would leave a ~2^40 error at the
    # boundary (2^63 - 2^40 is exactly representable in f32)
    hi = jnp.minimum(x.astype(F32), F32(2.0**63 - 2.0**40))
    r = x - hi.astype(jnp.int64)
    lo = r.astype(F32)
    return hi, lo


def to_u64_mod_q(hi, lo):
    """Round a ds value to the nearest integer mod q = 2**64 and cast to
    u64 (the ds analog of `vector_mod_pow2_q_f64`).

    hi and k*2^64 share a common ulp grid, so the reduction subtraction
    is exact; the reduced hi and lo are then cast through i64 (wrapping
    add mod 2^64 gives the torus point).
    """
    q = F32(2.0**64)
    k = jnp.round(hi / q)
    r_hi = hi - k * q  # exact: both operands are multiples of ulp(hi)
    # r_hi is in [-q/2, q/2]; only the +q/2 endpoint would clamp in i64
    r_hi = jnp.where(r_hi >= F32(2.0**63), r_hi - q, r_hi)
    i = r_hi.astype(jnp.int64) + jnp.round(lo).astype(jnp.int64)
    return i.astype(jnp.uint64)
