"""Torus Z_q (q = 2**64) element operations on u64 jnp arrays.

Semantics follow the reference's `Torus<u64>`
(`sunscreen_tfhe/src/math/torus.rs:284-300`): values wrap mod 2**64,
`encode(val, bits) = val << (64 - bits)`, `decode` rounds via bit
`64 - bits - 1` and masks.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..params import TORUS_BITS

U64 = jnp.uint64
I64 = jnp.int64


def u64(x) -> jnp.ndarray:
    """Create/convert to a u64 array (accepts python ints >= 2**63)."""
    if isinstance(x, int):
        return jnp.asarray(np.uint64(x % (1 << 64)))
    return jnp.asarray(x).astype(U64)


def encode(val, plain_bits: int) -> jnp.ndarray:
    """Encode an integer message into the torus MSBs
    (`torus.rs:284-290`)."""
    assert 0 < plain_bits < TORUS_BITS
    return u64(val) << U64(TORUS_BITS - plain_bits)


def decode(x, plain_bits: int) -> jnp.ndarray:
    """Round-and-mask decode (`torus.rs:293-300`)."""
    assert 0 < plain_bits < TORUS_BITS
    x = u64(x)
    round_bit = (x >> U64(TORUS_BITS - plain_bits - 1)) & U64(1)
    mask = U64((1 << plain_bits) - 1)
    return ((x >> U64(TORUS_BITS - plain_bits)) + round_bit) & mask


def shr_round(x, n: int) -> jnp.ndarray:
    """Shift right by `n` with round-to-nearest (round bit = bit n-1)
    (`sunscreen_tfhe/src/math/simd/scalar.rs` vector_shr_round)."""
    x = u64(x)
    if n == 0:
        return x
    round_bit = (x >> U64(n - 1)) & U64(1)
    return (x >> U64(n)) + round_bit


def switch_modulus_smaller(x, target_bits: int) -> jnp.ndarray:
    """Scale a torus element down to a smaller power-of-two modulus by
    truncation (`torus.rs:304-313`)."""
    return u64(x) >> U64(TORUS_BITS - target_bits)


def neg(x) -> jnp.ndarray:
    """Wrapping negation mod 2**64."""
    return U64(0) - u64(x)


def to_signed_f64(x) -> jnp.ndarray:
    """Reinterpret u64 torus values as signed (centered to [-q/2, q/2))
    and convert to f64, matching the reference's
    `reinterpret_as_signed().to_f64()`
    (`sunscreen_tfhe/src/entities/polynomial.rs:264-268`)."""
    return u64(x).astype(I64).astype(jnp.float64)


def f64_to_torus(x: jnp.ndarray) -> jnp.ndarray:
    """Reduce (already rounded-to-integer) f64 values mod q = 2**64 and
    cast to u64, recentering into [-q/2, q/2) first
    (`sunscreen_tfhe/src/math/simd/scalar.rs:75-119`
    `vector_mod_pow2_q_f64`)."""
    q = jnp.float64(2.0**64)
    q_div_2 = jnp.float64(2.0**63)
    r = x - jnp.trunc(x / q) * q
    r = jnp.where(r >= q_div_2, r - q, r)
    r = jnp.where(r < -q_div_2, r + q, r)
    # r is now in [-q/2, q/2): exactly the int64 range, so the cast is safe
    return r.astype(I64).astype(U64)
