"""Exact integer negacyclic polynomial arithmetic over Z_q[X]/(X^N+1), q=2**64.

These are the *exact* (wrapping u64) polynomial ops used on the
encryption/keygen path, mirroring the reference's naive wrapping
multiply (`sunscreen_tfhe/src/math/polynomial.rs:114-154`
`polynomial_external_mad`) and the monomial/automorphism permutations
(`sunscreen_tfhe/src/ops/polynomial/mod.rs:19-91`).

The hot compute path (external products, CMux) instead uses the
negacyclic FFT in `fft.py` — exactly as the reference splits
`polynomial_external_mad` (exact, cold) from `fft_ops.rs` (approximate,
hot).

All functions support arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .torus import U64


import functools


@functools.lru_cache(maxsize=8)
def _negacyclic_index_sign(n: int):
    # numpy constants (not jnp): safe to cache across jit traces
    i = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    idx = np.mod(j - i, n).astype(np.int32)
    sign_neg = j < i  # wrapped terms pick up a minus sign
    return idx, sign_neg


def negacyclic_matrix(p: jnp.ndarray) -> jnp.ndarray:
    """Build M[i, j] such that (a ⊛ p)[j] = Σ_i a[i] * M[i, j] (mod 2**64),
    where ⊛ is multiplication mod X^N + 1.

    M[i, j] = p[j - i] if j >= i else -p[N + j - i].
    """
    n = p.shape[-1]
    idx, sign_neg = _negacyclic_index_sign(n)
    m = p[..., idx]
    return jnp.where(sign_neg, U64(0) - m, m)


def negacyclic_mul_exact(a: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Exact wrapping negacyclic product a ⊛ p (both [..., N] u64).

    O(N^2); used on encrypt/decrypt/keygen paths only, like the
    reference's `polynomial_external_mad`.
    """
    return negacyclic_mul_by_matrix(a, negacyclic_matrix(p))


def negacyclic_mul_by_matrix(a: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """a[..., N] times a precomputed negacyclic matrix [..., N, N] (u64)."""
    return jnp.einsum(
        "...n,...nj->...j", a.astype(U64), m.astype(U64), preferred_element_type=U64
    )


def monomial_mul(a: jnp.ndarray, t) -> jnp.ndarray:
    """Multiply polynomial a by X^t mod (X^N + 1); t may be a traced
    integer (0 <= t < 2N effective; arbitrary t is reduced mod 2N).

    out[j] = a[u] if u < N else -a[u - N], with u = (j - t) mod 2N.
    Matches `rotate_glwe_positive_monomial_negacyclic`
    (`sunscreen_tfhe/src/ops/ciphertext/glwe_ciphertext_ops.rs:285`).
    """
    n = a.shape[-1]
    t = jnp.asarray(t).astype(jnp.int64)
    j = jnp.arange(n, dtype=jnp.int64)
    u = (j - t) % (2 * n)
    wrapped = u >= n
    idx = jnp.where(wrapped, u - n, u)
    gathered = jnp.take(a, idx, axis=-1)
    return jnp.where(wrapped, U64(0) - gathered, gathered)


def monomial_mul_batch(a: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Batched monomial multiply: a [..., N], t [...] (one rotation per
    leading-batch element, broadcast against a's leading dims)."""
    n = a.shape[-1]
    t = jnp.asarray(t).astype(jnp.int64)[..., None]
    j = jnp.arange(n, dtype=jnp.int64)
    u = (j - t) % (2 * n)
    wrapped = u >= n
    idx = jnp.where(wrapped, u - n, u)
    gathered = jnp.take_along_axis(
        jnp.broadcast_to(a, jnp.broadcast_shapes(a.shape, idx.shape)),
        jnp.broadcast_to(idx, jnp.broadcast_shapes(a.shape, idx.shape)),
        axis=-1,
    )
    return jnp.where(wrapped, U64(0) - gathered, gathered)


def pow_k(a: jnp.ndarray, k: int) -> jnp.ndarray:
    """Apply the automorphism X -> X^k (k odd): coefficient i of `a` moves
    to position i*k mod N with sign (-1)^floor(i*k / N)
    (`sunscreen_tfhe/src/ops/polynomial/mod.rs` `polynomial_pow_k`).

    `k` must be a static (non-traced) odd integer.
    """
    n = a.shape[-1]
    assert k % 2 == 1, "automorphism requires odd k"
    i = np.arange(n)
    dest = (i * k) % n
    sign_neg = ((i * k) // n) % 2 == 1
    # Invert the permutation: out[dest[i]] = ±a[i]  =>  out[j] = ±a[src[j]]
    src = np.zeros(n, dtype=np.int64)
    src[dest] = i
    neg = np.zeros(n, dtype=bool)
    neg[dest] = sign_neg
    out = jnp.take(a, jnp.asarray(src), axis=-1)
    return jnp.where(jnp.asarray(neg), U64(0) - out, out)


def shr_round_poly(a: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Per-coefficient shift-right-with-rounding
    (`polynomial_shr_round`, used by `glwe_mod_switch_and_expand_pow_2`)."""
    from .torus import shr_round

    return shr_round(a, bits)
