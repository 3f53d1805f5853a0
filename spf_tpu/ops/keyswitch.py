"""LWE keyswitching and keyswitch-key generation.

(≙ reference `sunscreen_tfhe/src/ops/keyswitch/lwe_keyswitch.rs` and
`lwe_keyswitch_key.rs`, `sunscreen_tfhe/src/ops/keyswitch/glwe_keyswitch_key.rs`.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params import GlweDef, LweDef, RadixDecomposition
from . import encryption as enc
from .decomp import decompose, decomposition_factor
from .fft import C128
from .poly import pow_k
from .torus import U64, u64


def generate_lwe_keyswitch_key(
    key,
    original_sk: jnp.ndarray,
    new_sk: jnp.ndarray,
    old_lwe: LweDef,
    new_lwe: LweDef,
    radix: RadixDecomposition,
) -> jnp.ndarray:
    """LWE keyswitch key: row i, col j = LWE_new(s_old_i * q/B^(j+1))
    (`lwe_keyswitch_key.rs:16-50`). Shape [n_old, count, n_new+1]."""
    n_old = old_lwe.dim

    def encrypt_row(k_i, s_i):
        ks = jax.random.split(k_i, radix.count)
        cols = []
        for j in range(radix.count):
            factor = U64(decomposition_factor(j, radix) % (1 << 64))
            cols.append(enc.encrypt_lwe(ks[j], s_i * factor, new_sk, new_lwe))
        return jnp.stack(cols, axis=0)

    keys = jax.random.split(key, n_old)
    return jax.vmap(encrypt_row)(keys, original_sk)


def keyswitch_lwe_to_lwe(
    ct: jnp.ndarray,
    ksk: jnp.ndarray,
    old_lwe: LweDef,
    new_lwe: LweDef,
    radix: RadixDecomposition,
) -> jnp.ndarray:
    """`out = trivial(b) - Σ_i <decomp(a_i), LEV_i>`
    (`lwe_keyswitch.rs:23-60`). Supports leading batch dims on `ct`."""
    ct = u64(ct)
    a, b = ct[..., :-1], ct[..., -1]
    # digits: [count, ..., n_old] (row-aligned, level j ↔ factor q/B^(j+1))
    digits = decompose(a, radix)
    # sum over i (old dim) and j (level): digit[j, ..., i] * ksk[i, j, :]
    acc = jnp.einsum(
        "j...i,ijm->...m",
        digits.astype(U64),
        ksk.astype(U64),
        preferred_element_type=U64,
    )
    trivial_b = jnp.zeros(ct.shape[:-1] + (new_lwe.dim + 1,), dtype=U64)
    trivial_b = trivial_b.at[..., -1].set(b)
    return trivial_b - acc


def generate_glwe_keyswitch_key(
    key,
    original_sk: jnp.ndarray,
    new_sk: jnp.ndarray,
    glwe: GlweDef,
    radix: RadixDecomposition,
) -> jnp.ndarray:
    """GLWE keyswitch key: row i = GLEV(orig_s_i) under the new key
    (`glwe_keyswitch_key.rs:32-91`). Shape [k, count, k+1, N]."""
    keys = jax.random.split(key, glwe.size)
    rows = []
    for i in range(glwe.size):
        rows.append(enc.encrypt_glev(keys[i], original_sk[i], new_sk, glwe, radix))
    return jnp.stack(rows, axis=0)


def generate_automorphism_keys(
    key, glwe_sk: jnp.ndarray, glwe: GlweDef, radix: RadixDecomposition, be=C128
):
    """log2(N) GLWE keyswitch keys, one per automorphism X -> X^{N/2^{i-1}+1},
    from the mapped key s(X^k) back to s (`ops/automorphisms/mod.rs:18-44`).

    Returns the keys already in the frequency domain, stacked:
    freq [log2(N), k, count, k+1, N/2]. With `be=None` returns the
    coefficient-domain u64 stack [log2(N), k, count, k+1, N] instead
    (for the x32 pipeline, which FFTs with its own ds32 backend).
    """
    n = glwe.degree
    log_n = glwe.log_degree
    keys = jax.random.split(key, log_n)
    ksks = []
    for i in range(1, log_n + 1):
        k_exp = n // (1 << (i - 1)) + 1
        sk_k = jnp.stack([pow_k(glwe_sk[r], k_exp) for r in range(glwe.size)], axis=0)
        ksk = generate_glwe_keyswitch_key(keys[i - 1], sk_k, glwe_sk, glwe, radix)
        ksks.append(ksk if be is None else be.fwd_torus(ksk))
    if be is None:
        return jnp.stack(ksks, axis=0)
    return be.stack(ksks, axis=0)
