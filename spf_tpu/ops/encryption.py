"""LWE / GLWE / GLEV / GGSW encryption and decryption.

Layouts (single ciphertext; batch via leading dims / vmap):

- LWE:  u64[n + 1]                 — `[a_0..a_{n-1}, b]`
- GLWE: u64[k + 1, N]              — `[A_0..A_{k-1}, B]`
- GLEV: u64[count, k + 1, N]       — row j encrypts msg * q/B^(j+1)
- GGSW: u64[k + 1, count, k + 1, N] — row i < k: GLEV(-s_i * m); row k: GLEV(m)

Encryption equation (sign convention, reference
`sunscreen_tfhe/src/ops/encryption/glwe_encryption.rs:30-62`):
`b = Σ a_i ⊛ s_i + m + e`; decryption: `m + e = b − Σ a_i ⊛ s_i`.
Secret keys are binary. The key product is the *exact* wrapping integer
negacyclic multiply (the reference uses naive O(N^2) `polynomial_external_mad`
here, not the FFT).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params import GlweDef, LweDef, RadixDecomposition
from . import rng
from .decomp import decomposition_factor
from .poly import negacyclic_mul_exact
from .torus import U64, u64

# --------------------------------------------------------------------------
# Secret key generation
# --------------------------------------------------------------------------


def generate_lwe_sk(key, lwe: LweDef) -> jnp.ndarray:
    """Binary LWE secret key u64[n] (`high_level.rs:95`)."""
    return rng.binary(key, (lwe.dim,))


def generate_glwe_sk(key, glwe: GlweDef) -> jnp.ndarray:
    """Binary GLWE secret key u64[k, N] (`high_level.rs:154`)."""
    return rng.binary(key, (glwe.size, glwe.degree))


def glwe_sk_to_lwe_sk(glwe_sk: jnp.ndarray) -> jnp.ndarray:
    """Reinterpret a GLWE secret key as an LWE key of dimension k*N
    (`entities/glwe_secret_key.rs` `to_lwe_secret_key`): plain
    concatenation of the polynomial coefficients."""
    return glwe_sk.reshape(-1)


# --------------------------------------------------------------------------
# LWE
# --------------------------------------------------------------------------


def encrypt_lwe(key, msg_torus, sk: jnp.ndarray, lwe: LweDef) -> jnp.ndarray:
    """Encrypt a torus message: ct = [a, b], b = <a, s> + m + e
    (`lwe_encryption.rs:36-59`)."""
    k_a, k_e = jax.random.split(key)
    a = rng.uniform_torus(k_a, (lwe.dim,))
    e = rng.normal_torus(k_e, lwe.std, ())
    b = jnp.sum(a * sk, dtype=U64) + u64(msg_torus) + e
    return jnp.concatenate([a, b[None]])


def trivial_lwe(msg_torus, lwe: LweDef) -> jnp.ndarray:
    """Trivial (zero-mask) encryption: a = 0, b = m
    (`lwe_encryption.rs:20-32`)."""
    a = jnp.zeros((lwe.dim,), dtype=U64)
    return jnp.concatenate([a, u64(msg_torus).reshape(1)])


def decrypt_lwe(ct: jnp.ndarray, sk: jnp.ndarray, lwe: LweDef) -> jnp.ndarray:
    """Return m + e = b - <a, s> (no decode)."""
    a, b = ct[..., :-1], ct[..., -1]
    return b - jnp.sum(a * sk, axis=-1, dtype=U64)


# --------------------------------------------------------------------------
# GLWE
# --------------------------------------------------------------------------


def encrypt_glwe(key, msg_torus_poly, sk: jnp.ndarray, glwe: GlweDef) -> jnp.ndarray:
    """Encrypt a torus polynomial u64[N] -> u64[k+1, N]
    (`glwe_encryption.rs:22-63`)."""
    k_a, k_e = jax.random.split(key)
    a = rng.uniform_torus(k_a, (glwe.size, glwe.degree))
    e = rng.normal_torus(k_e, glwe.std, (glwe.degree,))
    a_s = jnp.zeros((glwe.degree,), dtype=U64)
    for i in range(glwe.size):
        a_s = a_s + negacyclic_mul_exact(a[i], sk[i])
    b = a_s + u64(msg_torus_poly) + e
    return jnp.concatenate([a, b[None]], axis=0)


def trivial_glwe(msg_torus_poly, glwe: GlweDef) -> jnp.ndarray:
    """a = 0, b = m (`glwe_encryption.rs:79-98`)."""
    a = jnp.zeros((glwe.size, glwe.degree), dtype=U64)
    b = jnp.broadcast_to(u64(msg_torus_poly), (glwe.degree,))
    return jnp.concatenate([a, b[None]], axis=0)


def decrypt_glwe(ct: jnp.ndarray, sk: jnp.ndarray, glwe: GlweDef) -> jnp.ndarray:
    """Return m + e = b - Σ a_i ⊛ s_i (`glwe_encryption.rs:104-126`)."""
    a, b = ct[:-1], ct[-1]
    a_s = jnp.zeros((glwe.degree,), dtype=U64)
    for i in range(glwe.size):
        a_s = a_s + negacyclic_mul_exact(a[i], sk[i])
    return b - a_s


# --------------------------------------------------------------------------
# GLEV
# --------------------------------------------------------------------------


def encrypt_glev(
    key, msg_poly, sk: jnp.ndarray, glwe: GlweDef, radix: RadixDecomposition
) -> jnp.ndarray:
    """GLEV: `count` GLWEs of msg * q/B^(j+1) (`glev_encryption.rs:64-100`).
    `msg_poly` holds small integers (not torus-encoded)."""
    keys = jax.random.split(key, radix.count)
    rows = []
    for j in range(radix.count):
        factor = U64(decomposition_factor(j, radix) % (1 << 64))
        rows.append(encrypt_glwe(keys[j], u64(msg_poly) * factor, sk, glwe))
    return jnp.stack(rows, axis=0)


def trivial_glev(msg_poly, glwe: GlweDef, radix: RadixDecomposition) -> jnp.ndarray:
    rows = []
    for j in range(radix.count):
        factor = U64(decomposition_factor(j, radix) % (1 << 64))
        rows.append(trivial_glwe(u64(msg_poly) * factor, glwe))
    return jnp.stack(rows, axis=0)


def decrypt_glev_at(
    ct: jnp.ndarray, sk: jnp.ndarray, glwe: GlweDef, radix: RadixDecomposition, index: int
) -> jnp.ndarray:
    """Decrypt GLEV row `index` and divide out its gadget factor with
    rounding (`glev_encryption.rs:163-200` `decrypt_glwe_in_glev`)."""
    noisy = decrypt_glwe(ct[index], sk, glwe)
    shift = 64 - radix.radix_log * (index + 1)
    mask = U64((1 << radix.radix_log) - 1)
    if shift == 0:
        # last row at full torus width: no rounding bit below the value
        return noisy & mask
    val = noisy >> U64(shift)
    r = (noisy >> U64(shift - 1)) & U64(1)
    return (val + r) & mask


# --------------------------------------------------------------------------
# GGSW
# --------------------------------------------------------------------------


def encrypt_ggsw(
    key, msg_poly, sk: jnp.ndarray, glwe: GlweDef, radix: RadixDecomposition
) -> jnp.ndarray:
    """GGSW = (k+1) GLEVs: row i < k encrypts GLEV(-s_i ⊛ m), row k
    encrypts GLEV(m) (`ggsw_encryption.rs:30-71`). `msg_poly` holds small
    integers."""
    keys = jax.random.split(key, glwe.size + 1)
    msg = u64(msg_poly)
    rows = []
    for i in range(glwe.size):
        m_s = U64(0) - negacyclic_mul_exact(msg, sk[i])
        rows.append(encrypt_glev(keys[i], m_s, sk, glwe, radix))
    rows.append(encrypt_glev(keys[glwe.size], msg, sk, glwe, radix))
    return jnp.stack(rows, axis=0)


def trivial_ggsw(msg_poly, glwe: GlweDef, radix: RadixDecomposition) -> jnp.ndarray:
    """Trivial GGSW: rows i < k are GLEV(0) (trivial key), row k GLEV(m)."""
    msg = u64(msg_poly)
    zero = trivial_glev(jnp.zeros_like(msg), glwe, radix)
    rows = [zero for _ in range(glwe.size)]
    rows.append(trivial_glev(msg, glwe, radix))
    return jnp.stack(rows, axis=0)


def encrypt_ggsw_scalar(
    key, msg_scalar, sk: jnp.ndarray, glwe: GlweDef, radix: RadixDecomposition
) -> jnp.ndarray:
    """GGSW of a degree-0 message (`ggsw_encryption.rs:122-146`)."""
    msg = jnp.zeros((glwe.degree,), dtype=U64).at[0].set(u64(msg_scalar))
    return encrypt_ggsw(key, msg, sk, glwe, radix)


def decrypt_ggsw(
    ct: jnp.ndarray, sk: jnp.ndarray, glwe: GlweDef, radix: RadixDecomposition
) -> jnp.ndarray:
    """Decrypt the message polynomial from the last GGSW row, column 0."""
    return decrypt_glev_at(ct[glwe.size], sk, glwe, radix, 0)


# --------------------------------------------------------------------------
# RLWE public-key encryption (SEAL-style "double-LWE" trick)
# --------------------------------------------------------------------------


def rlwe_generate_public_key(key, sk: jnp.ndarray, glwe: GlweDef) -> jnp.ndarray:
    """RLWE public key = secret-key encryption of the zero polynomial;
    requires k == 1 (`rlwe_encryption.rs:47-60`). Returns u64 [2, N]."""
    assert glwe.size == 1
    zero = jnp.zeros((glwe.degree,), dtype=U64)
    return encrypt_glwe(key, zero, sk, glwe)


def rlwe_encrypt_public(
    key, msg_torus_poly, public_key: jnp.ndarray, glwe: GlweDef
) -> jnp.ndarray:
    """Public-key encryption (`rlwe_encryption.rs:88-130`): with
    `(p0, p1) = public_key`, sample binary `u` and Gaussian `e0, e1`;
    ct = (p0 ⊛ u + e0, m + p1 ⊛ u + e1)."""
    assert glwe.size == 1
    k_u, k_e0, k_e1 = jax.random.split(key, 3)
    u = rng.binary(k_u, (glwe.degree,))
    e0 = rng.normal_torus(k_e0, glwe.std, (glwe.degree,))
    e1 = rng.normal_torus(k_e1, glwe.std, (glwe.degree,))
    p0, p1 = public_key[0], public_key[1]
    a = negacyclic_mul_exact(p0, u) + e0
    b = u64(msg_torus_poly) + negacyclic_mul_exact(p1, u) + e1
    return jnp.stack([a, b], axis=0)
