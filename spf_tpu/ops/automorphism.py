"""Homomorphic automorphisms and the trace operation.

(≙ reference `sunscreen_tfhe/src/ops/automorphisms/mod.rs:18-85`.)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..params import GlweDef, RadixDecomposition
from .fft import C128
from .fft_ops import keyswitch_glwe_to_glwe
from .poly import pow_k
from .torus import u64


def glwe_pow_k(ct: jnp.ndarray, k_exp: int) -> jnp.ndarray:
    """Apply X -> X^k to every polynomial of a GLWE ciphertext (a
    signed coefficient permutation). `k_exp` must be static."""
    return pow_k(u64(ct), k_exp)


def trace(
    ct: jnp.ndarray,
    auto_keys_fft,
    glwe: GlweDef,
    radix: RadixDecomposition,
    be=C128,
) -> jnp.ndarray:
    """Homomorphic trace: zeroes all coefficients except the constant
    term, which is multiplied by N (`automorphisms/mod.rs:53-85`):

    for i in 1..=log2(N):
        k = N/2^(i-1) + 1
        out += glwe_keyswitch(pow_k(out, k), auto_key_i)

    `auto_keys_fft`: freq [log2(N), k, count, k+1, N/2] from
    `keyswitch.generate_automorphism_keys`. Supports leading batch dims.
    """
    n = glwe.degree
    out = u64(ct)
    for i in range(1, glwe.log_degree + 1):
        k_exp = n // (1 << (i - 1)) + 1
        mapped = glwe_pow_k(out, k_exp)
        switched = keyswitch_glwe_to_glwe(mapped, auto_keys_fft[i - 1], glwe, radix, be)
        out = out + switched
    return out
