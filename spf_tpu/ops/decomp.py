"""Signed gadget (radix) decomposition.

Exact semantics of the reference (`sunscreen_tfhe/src/math/radix.rs:35-46,
155-161` and `simd/scalar.rs` `vector_next_decomp`):

1. Round the input to the top `count * radix_log` bits
   (round bit = bit `shift - 1`, `radix.rs:155-161`).
2. Extract digits LSB-first: `d = v & (B-1); v >>= logB;
   carry = d >> (logB-1); v += carry; d -= carry << logB`
   — digits lie in [-B/2, B/2).

Consumers pair digits with GLEV rows *in reverse* (row j holds factor
q/B^(j+1); `fft_ops.rs:88-97`), so `decompose` returns digits already
row-aligned: `out[j]` pairs with GLEV row j.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..params import TORUS_BITS, RadixDecomposition
from .torus import I64, U64, u64


def radix_round(x: jnp.ndarray, radix: RadixDecomposition) -> jnp.ndarray:
    """Round torus values to `count * radix_log` bits, returned as a
    (small) unsigned integer value (`radix.rs:155-161`)."""
    shift = TORUS_BITS - radix.radix_log * radix.count
    x = u64(x)
    if shift == 0:
        return x
    round_bit = (x >> U64(shift - 1)) & U64(1)
    return (x >> U64(shift)) + round_bit


def decompose_lsb_first(x: jnp.ndarray, radix: RadixDecomposition):
    """Signed digits LSB-first, as i64 arrays in [-B/2, B/2)."""
    log_b = radix.radix_log
    mask = U64((1 << log_b) - 1)
    v = radix_round(x, radix)
    digits = []
    for _ in range(radix.count):
        d = v & mask
        v = v >> U64(log_b)
        carry = d >> U64(log_b - 1)
        v = v + carry
        d_signed = d.astype(I64) - (carry.astype(I64) << I64(log_b))
        digits.append(d_signed)
    return digits


def decompose(x: jnp.ndarray, radix: RadixDecomposition) -> jnp.ndarray:
    """Row-aligned signed digits, stacked on a new leading axis:
    out[j, ...] is the digit with gadget factor q/B^(j+1) (i.e. the
    (count-1-j)-th LSB-first digit)."""
    digits = decompose_lsb_first(x, radix)
    return jnp.stack(digits[::-1], axis=0)


def decomposition_factor(j: int, radix: RadixDecomposition) -> int:
    """q / B^(j+1) = 2**(64 - radix_log*(j+1)) as a python int
    (`radix.rs:144-152` `scale_by_decomposition_factor`,
    `glev_encryption.rs:64-76`)."""
    return 1 << (TORUS_BITS - radix.radix_log * (j + 1))


def recompose(digits_row_aligned: jnp.ndarray, radix: RadixDecomposition) -> jnp.ndarray:
    """Inverse of `decompose` up to rounding: Σ_j d_j * q/B^(j+1) mod q
    (`radix.rs:118-140` `recompose_and_add`)."""
    acc = jnp.zeros(digits_row_aligned.shape[1:], dtype=U64)
    for j in range(radix.count):
        factor = U64(decomposition_factor(j, radix) % (1 << 64))
        acc = acc + digits_row_aligned[j].astype(U64) * factor
    return acc
