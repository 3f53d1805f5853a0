"""Ciphertext-level operations: GLWE/LWE add/sub/negate, sample
extraction, modulus switching, rotations.

(≙ reference `sunscreen_tfhe/src/ops/ciphertext/{glwe,lwe}_ciphertext_ops.rs`.)

GLWE/LWE ciphertexts are plain u64 arrays, so homomorphic add/sub are
just wrapping array arithmetic; the named functions exist for parity
and documentation. All support leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..params import TORUS_BITS, GlweDef
from .torus import U64, shr_round, u64

# --- linear ops (wrapping u64 arithmetic) ---


def glwe_add(a, b):
    """(`glwe_ciphertext_ops.rs:79`)"""
    return u64(a) + u64(b)


def glwe_sub(a, b):
    """(`glwe_ciphertext_ops.rs:121`)"""
    return u64(a) - u64(b)


def glwe_negate(a):
    return U64(0) - u64(a)


lwe_add = glwe_add
lwe_sub = glwe_sub
lwe_negate = glwe_negate


def lwe_rotate(ct, plaintext_torus):
    """Homomorphically add a plaintext constant: b += encode(m)
    (`ops/homomorphisms/lwe.rs:9`)."""
    return ct.at[..., -1].add(u64(plaintext_torus))


def glwe_rotate(ct, plaintext_torus):
    """Add a plaintext constant to every message coefficient: B += m
    (`glwe_ciphertext_ops.rs:285` glwe_rotate)."""
    return ct.at[..., -1, :].add(u64(plaintext_torus))


# --- sample extraction ---


def sample_extract(glwe_ct: jnp.ndarray, h: int, glwe: GlweDef) -> jnp.ndarray:
    """Extract coefficient `h` of a GLWE ciphertext as an LWE ciphertext
    under the flattened key (`glwe_ciphertext_ops.rs:31-77`):

    a_lwe[N*i + j] = a_glwe[i][h-j]       for j <= h
    a_lwe[N*i + j] = -a_glwe[i][h-j+N]    for j > h
    b_lwe = b_glwe[h]
    """
    n = glwe.degree
    a, b = glwe_ct[..., :-1, :], glwe_ct[..., -1, :]
    j = jnp.arange(n)
    idx = (h - j) % n
    neg = j > h
    gathered = jnp.take(a, idx, axis=-1)
    a_lwe = jnp.where(neg, U64(0) - gathered, gathered)
    a_flat = a_lwe.reshape(*a_lwe.shape[:-2], glwe.size * n)
    return jnp.concatenate([a_flat, b[..., h : h + 1]], axis=-1)


# --- modulus switching ---


def modulus_switch(x, log_chi: int, log_v: int, log_modulus: int) -> jnp.ndarray:
    """Generalized modulus switch (`lwe_ciphertext_ops.rs:130-142`):
    drop `log_chi` MSBs, round to `log_modulus - log_v` bits, append
    `log_v` zero LSBs. Test vector: 0xDEADBEEF_BEEFDEAD -> 0b11_0111_1011
    for (0, 0, 10)."""
    x = u64(x)
    mask = U64((1 << log_modulus) - 1)
    if log_chi:
        x = x << U64(log_chi)
    shift_amount = TORUS_BITS - (log_modulus - log_v)
    rnd = (x >> U64(shift_amount - 1)) & U64(1)
    x = x >> U64(shift_amount)
    return ((x + rnd) & mask) << U64(log_v)


def lwe_modulus_switch(ct, log_chi: int, log_v: int, log_modulus: int) -> jnp.ndarray:
    """Apply `modulus_switch` to every component of an LWE ciphertext
    (`lwe_ciphertext_ops.rs:97-128`)."""
    return modulus_switch(ct, log_chi, log_v, log_modulus)


def glwe_mod_switch_and_expand_pow_2(ct, log_q_prime: int) -> jnp.ndarray:
    """Switch to q' = q/2^log_q_prime and back: per-coefficient
    shift-right-with-round. The WHS+24 "multiply by N^{-1}" preprocessing
    for fast circuit bootstrapping (`glwe_ciphertext_ops.rs:268-281`)."""
    return shr_round(ct, log_q_prime)
