"""u32-limb torus arithmetic — the x64-free TPU representation.

A torus element x in Z_{2^64} is carried as a pair of u32 arrays
``(hi, lo)`` with ``x = hi * 2^32 + lo``. Mosaic (Pallas TPU) has no
64-bit integers and its lowering breaks under jax x64 mode, so the
TPU production pipeline (`bootstrap_u32.py`) runs in a 32-bit-only
process (`SPF_TPU_X32=1`) on these limbs; semantics are bit-identical
to the u64 reference ops in `torus.py`/`decomp.py` (tested against
them under x64 on CPU).

All functions are elementwise over arbitrary shapes; a "limb pair" is
always the tuple (hi, lo), both jnp.uint32.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..params import TORUS_BITS, RadixDecomposition

U32 = jnp.uint32
I32 = jnp.int32
F32 = jnp.float32


def limb(hi, lo):
    return (jnp.asarray(hi, U32), jnp.asarray(lo, U32))


def from_py_int(x: int, shape=()):
    """Constant limb pair from a python int (mod 2^64)."""
    x %= 1 << 64
    hi = jnp.full(shape, (x >> 32) & 0xFFFFFFFF, dtype=U32)
    lo = jnp.full(shape, x & 0xFFFFFFFF, dtype=U32)
    return (hi, lo)


def from_u64_np(x):
    """numpy u64 array -> limb pair (host-side; works without x64)."""
    import numpy as np

    x = np.asarray(x, dtype=np.uint64)
    return (
        jnp.asarray((x >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray(x.astype(np.uint32)),
    )


def to_u64_np(a):
    """limb pair -> numpy u64 array (host-side)."""
    import numpy as np

    hi = np.asarray(a[0]).astype(np.uint64)
    lo = np.asarray(a[1]).astype(np.uint64)
    return (hi << np.uint64(32)) | lo


def add(a, b):
    """Wrapping 64-bit add on limb pairs."""
    lo = a[1] + b[1]
    carry = (lo < a[1]).astype(U32)
    hi = a[0] + b[0] + carry
    return (hi, lo)


def sub(a, b):
    """Wrapping 64-bit subtract."""
    lo = a[1] - b[1]
    borrow = (a[1] < b[1]).astype(U32)
    hi = a[0] - b[0] - borrow
    return (hi, lo)


def neg(a):
    """Wrapping negation: 2^64 - x."""
    lo = U32(0) - a[1]
    hi = (U32(0) - a[0]) - (a[1] != 0).astype(U32)
    return (hi, lo)


def add_small(a, c_hi: int, c_lo: int):
    """Add a per-element python constant given as (hi, lo) ints."""
    lo = a[1] + U32(c_lo)
    carry = (lo < a[1]).astype(U32) if c_lo else U32(0)
    hi = a[0] + U32(c_hi) + carry
    return (hi, lo)


def where(pred, a, b):
    """Elementwise select on limb pairs (pred broadcastable)."""
    return (jnp.where(pred, a[0], b[0]), jnp.where(pred, a[1], b[1]))


def zeros(shape):
    z = jnp.zeros(shape, dtype=U32)
    return (z, z)


def shr_round(a, n: int):
    """(x >> n) + bit_{n-1}(x), n in [0, 64) (≙ `torus.shr_round`)."""
    if n == 0:
        return a
    hi, lo = a
    if n < 32:
        rlo = (lo >> U32(n)) | (hi << U32(32 - n))
        rhi = hi >> U32(n)
        rbit = (lo >> U32(n - 1)) & U32(1)
    elif n == 32:
        rlo, rhi = hi, jnp.zeros_like(hi)
        rbit = (lo >> U32(31)) & U32(1)
    else:
        rlo = hi >> U32(n - 32)
        rhi = jnp.zeros_like(hi)
        rbit = (hi >> U32(n - 33)) & U32(1)
    lo2 = rlo + rbit
    hi2 = rhi + (lo2 < rlo).astype(U32)
    return (hi2, lo2)


def encode_const(val: int, plain_bits: int):
    """encode(val, bits) = val << (64 - bits) as python (hi, lo) ints."""
    x = (val << (TORUS_BITS - plain_bits)) % (1 << 64)
    return ((x >> 32) & 0xFFFFFFFF, x & 0xFFFFFFFF)


def modulus_switch(a, log_chi: int, log_v: int, log_modulus: int):
    """≙ `ciphertext.modulus_switch` but returning a plain u32 (the
    switched value always fits: log_modulus <= 32). Matches
    `lwe_ciphertext_ops.rs:130-142` bit-for-bit."""
    assert log_modulus <= 32
    hi, lo = a
    # x <<= log_chi (64-bit)
    if log_chi:
        hi = (hi << U32(log_chi)) | (lo >> U32(32 - log_chi))
        lo = lo << U32(log_chi)
    shift = TORUS_BITS - (log_modulus - log_v)  # >= 32 for all real uses
    assert shift >= 33, "log_modulus - log_v must be < 32"
    s = shift - 32
    round_bit = ((hi >> U32(s - 1)) & U32(1)) if s >= 1 else (lo >> U32(31)) & U32(1)
    x = hi >> U32(s)
    mask = U32((1 << log_modulus) - 1)
    return ((x + round_bit) & mask) << U32(log_v)


def decompose(a, radix: RadixDecomposition):
    """Signed gadget decomposition on limb pairs -> i32 digit stack
    [count, ...] row-aligned like `decomp.decompose` (out[j] pairs with
    GLEV row j; digit values in [-B/2, B/2))."""
    log_b = radix.radix_log
    cb = log_b * radix.count
    shift = TORUS_BITS - cb
    hi, lo = a
    # rounded top-cb-bit value as a (w1, w0) u32 pair, LSB-aligned
    if shift >= 32:
        s = shift - 32
        if s == 0:
            w0, rbit = hi, (lo >> U32(31)) & U32(1)
        else:
            w0 = hi >> U32(s)
            rbit = (hi >> U32(s - 1)) & U32(1)
        w1 = jnp.zeros_like(hi)
    else:
        w0 = (lo >> U32(shift)) | (hi << U32(32 - shift))
        w1 = hi >> U32(shift)
        rbit = (
            (lo >> U32(shift - 1)) & U32(1) if shift >= 1 else jnp.zeros_like(lo)
        )
    w0r = w0 + rbit
    w1 = w1 + (w0r < w0).astype(U32)
    w0 = w0r

    mask = U32((1 << log_b) - 1)
    digits = []
    for _ in range(radix.count):
        d = w0 & mask
        # v >>= log_b across the pair
        w0 = (w0 >> U32(log_b)) | (w1 << U32(32 - log_b))
        w1 = w1 >> U32(log_b)
        carry = d >> U32(log_b - 1)
        w0c = w0 + carry
        w1 = w1 + (w0c < w0).astype(U32)
        w0 = w0c
        digits.append(d.astype(I32) - (carry.astype(I32) << I32(log_b)))
    return jnp.stack(digits[::-1], axis=0)


# --------------------------------------------------------------------------
# float (ds32) boundary conversions
# --------------------------------------------------------------------------


def to_ds(a):
    """Limb pair -> ds (hi_f32, lo_f32) pair carrying the top ~48 bits of
    the SIGNED (centered) value, like `ds.from_i64` does for i64 input."""
    from . import ds

    hi_i = a[0].astype(I32)  # signed reinterpret centers the value
    # clamp below +2^31: f32(2^31-1) rounds UP to 2^31 whose i32 cast
    # clamps, which would silently drop the residual (cf. ds.from_i64)
    ah = jnp.minimum(hi_i.astype(F32), F32(2147483392.0))
    al = (hi_i - ah.astype(I32)).astype(F32)  # exact residual (<= 2^8)
    bh = (a[1] >> U32(16)).astype(F32)  # exact: < 2^16
    bl = (a[1] & U32(0xFFFF)).astype(F32)  # exact: < 2^16
    two32 = F32(4294967296.0)
    two16 = F32(65536.0)
    s, e = ds.two_sum(ah * two32, bh * two16)
    e = e + (al * two32 + bl)
    return ds.quick_two_sum(s, e)


def from_ds(vh, vl):
    """Round a ds value to the nearest integer mod 2^64 as a limb pair
    (the ds analog of `torus.f64_to_torus`, for IFFT outputs).

    IFFT outputs are exact convolution values BEFORE modular reduction
    and can reach ~2^85 at production params, so reduce in stages. Every
    power-of-two multiply/subtract below is exact (common ulp grids,
    Sterbenz-style cancellation); the single true f32 rounding is the
    final `r1 + r2` sum, bounded by 2^8 — far below the ~2^37 ds32
    convolution noise floor this pipeline already carries (`ds.py`).
    The i32 casts can clamp only at the exact ±2^31 endpoints, each
    worth <= 2^32 of value error, also below the noise floor.
    """
    two32 = F32(4294967296.0)
    inv32 = F32(2.0**-32)
    two64 = F32(2.0**64)
    inv64 = F32(2.0**-64)
    # mod-2^64 pre-reduction of each component (exact)
    vh = vh - jnp.round(vh * inv64) * two64  # |vh| <= 2^63
    vl = vl - jnp.round(vl * inv64) * two64  # |vl| <= 2^63
    # split each component into (carry into hi limb, 32-bit residue)
    t1 = jnp.round(vh * inv32)
    r1 = vh - t1 * two32  # exact; |r1| <= 2^31
    t2 = jnp.round(vl * inv32)
    r2 = vl - t2 * two32  # exact; |r2| <= 2^31

    def to_i32_mod(t):
        # |t| can be exactly 2^31 (outside i32): convert via two exact
        # 16-bit chunks; the wrapping shift/add give t mod 2^32
        tq = jnp.round(t * F32(2.0**-16))
        tr = t - tq * F32(65536.0)  # exact; |tr| <= 2^15
        return (tq.astype(I32) << I32(16)) + tr.astype(I32)
    # sum the residues in INTEGER arithmetic (an f32 sum would round at
    # ulp(2^31) = 2^8 and drop the low component entirely for small
    # values); per-part rounding differs from round(r1+r2) by at most 1
    a1 = jnp.round(r1).astype(I32)
    a2 = jnp.round(r2).astype(I32)
    lo_i = a1 + a2  # wrapping — exactly the lo limb mod 2^32
    carry = ((a1 >= 0) & (a2 >= 0) & (lo_i < 0)).astype(I32) - (
        (a1 < 0) & (a2 < 0) & (lo_i >= 0)
    ).astype(I32)
    # hi limb is mod 2^32: wrapping i32 arithmetic is exactly right
    hi_i = to_i32_mod(t1) + to_i32_mod(t2) + carry - (lo_i < 0).astype(I32)
    # two's-complement reinterpret of lo absorbs +2^32 for negative
    # residues; the high limb drops 1 to compensate
    return (hi_i.astype(U32), lo_i.astype(U32))
