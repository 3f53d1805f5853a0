"""Randomness for key generation and encryption, built on the JAX PRNG.

Mirrors the sampling semantics of the reference (`sunscreen_tfhe/src/rand.rs`):
- `uniform_torus`: uniform u64.
- `normal_torus`: `round(N(0, std) * 2**64)` cast (wrapping) to u64
  (`rand.rs:20-30`). `std == 0` produces exactly zero noise.
- `binary`: uniform bits in {0, 1} (for secret keys).

Unlike the reference's `thread_rng`, all sampling is keyed and
deterministic given a `jax.random` key — keygen is reproducible and
parallelizable by key-splitting (the TPU-native analog of the
reference's rayon-parallel keygen).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .torus import U64


def uniform_torus(key, shape=()) -> jnp.ndarray:
    """Uniform u64 torus elements (`rand.rs:33-35`)."""
    hi = jax.random.bits(key, shape, dtype=jnp.uint32)
    lo = jax.random.bits(jax.random.fold_in(key, 1), shape, dtype=jnp.uint32)
    return (hi.astype(U64) << U64(32)) | lo.astype(U64)


def normal_torus(key, std: float, shape=()) -> jnp.ndarray:
    """Gaussian torus noise: `round(N(0, std) * 2**64)` wrapped to u64
    (`rand.rs:20-30`). Exactly zero when std == 0 (`glwe_encryption.rs:51-53`)."""
    if std == 0.0:
        return jnp.zeros(shape, dtype=U64)
    e = jax.random.normal(key, shape, dtype=jnp.float64) * std
    scaled = jnp.round(e * 2.0**64)
    return scaled.astype(jnp.int64).astype(U64)


def binary(key, shape=()) -> jnp.ndarray:
    """Uniform binary u64 values (secret key coefficients, `rand.rs:38-40`)."""
    return jax.random.bits(key, shape, dtype=jnp.uint32).astype(U64) & U64(1)
