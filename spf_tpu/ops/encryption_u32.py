"""Exact encryption/keygen on u32-limb torus arrays — runs ANYWHERE,
including TPU (no u64 dtypes in the graph, no x64 mode needed).

Key generation previously had to run in a CPU subprocess because the
exact negacyclic products `a ⊛ s` (u64 einsum in `poly.py`) cannot
lower on TPU. Secret keys are BINARY (`high_level.rs:95,154`), so the
exact product reduces to a signed {-1,0,1} circulant matmul against
16-bit planes of the u32 limbs with i32 accumulation (|partial sum| <=
N * 2^16 = 2^27 at N=2048 — exact), recombined with limb carries.

Sampling mirrors `ops/rng.py` (and the reference `rand.rs`):
- uniform masks draw the SAME u32 PRNG bits as `rng.uniform_torus`, so
  ciphertext masks are bit-identical to the u64 path under one key;
- Gaussian noise is sampled in f32 (the reference uses f64); at
  production sigma the f32 quantum is ~2^26 against a noise scale of
  ~2^50 — distributionally irrelevant, and verified at decrypt level.

≙ reference `ops/encryption/{glwe,glev,ggsw}_encryption.rs` +
`programmable_bootstrapping.rs:34-58` (BSK keygen), re-expressed for
the x32 TPU pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params import GlweDef, LweDef, RadixDecomposition
from . import limb32 as lb

U32 = jnp.uint32
I32 = jnp.int32
F32 = jnp.float32


@functools.lru_cache(maxsize=8)
def _nega_index_sign(n: int):
    i = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    idx = np.mod(j - i, n).astype(np.int32)
    sign = np.where(j < i, -1, 1).astype(np.int32)
    return idx, sign


def _signed_circulant(s: jnp.ndarray) -> jnp.ndarray:
    """Binary poly u32/i32 [N] -> signed negacyclic circulant i32 [N, N]
    with (a ⊛ s)[j] = sum_i a[i] * S[i, j]."""
    n = s.shape[-1]
    idx, sign = _nega_index_sign(n)
    return jnp.take(s.astype(I32), jnp.asarray(idx), axis=0) * jnp.asarray(sign)


def negacyclic_mul_binary(a, s: jnp.ndarray):
    """Exact (a ⊛ s) mod 2^64 for a limb pair a [..., N] and BINARY s
    [N]. i32 plane matmuls (exact for N <= 2^11) + limb recombination."""
    hi, lo = a
    n = s.shape[-1]
    assert n <= (1 << 11), "i32 plane accumulation bound"
    S = _signed_circulant(s)
    planes = jnp.stack(
        [
            (lo & U32(0xFFFF)).astype(I32),
            (lo >> U32(16)).astype(I32),
            (hi & U32(0xFFFF)).astype(I32),
            (hi >> U32(16)).astype(I32),
        ],
        axis=0,
    )  # [4, ..., N], each < 2^16
    q = jnp.einsum(
        "p...i,ij->p...j", planes, S, preferred_element_type=I32
    )  # signed, |q| <= N * 2^16

    def limb_of(qk, shift16: int):
        # value = qk * 2^(16*shift16) as a wrapping 64-bit limb pair
        if shift16 == 0:
            return (jnp.right_shift(qk, 31).astype(U32), qk.astype(U32))
        if shift16 == 1:
            loq = (qk.astype(U32) << U32(16))
            hiq = jnp.right_shift(qk, 16).astype(U32)  # arithmetic = floor
            return (hiq, loq)
        if shift16 == 2:
            return (qk.astype(U32), jnp.zeros_like(qk, dtype=U32))
        return ((qk.astype(U32) << U32(16)), jnp.zeros_like(qk, dtype=U32))

    out = limb_of(q[0], 0)
    for k in range(1, 4):
        out = lb.add(out, limb_of(q[k], k))
    return out


# --------------------------------------------------------------------------
# sampling (limb pairs)
# --------------------------------------------------------------------------


def uniform_limb(key, shape=()):
    """Uniform u64 as limbs — the SAME bits as `rng.uniform_torus`."""
    hi = jax.random.bits(key, shape, dtype=U32)
    lo = jax.random.bits(jax.random.fold_in(key, 1), shape, dtype=U32)
    return (hi, lo)


def binary_u32(key, shape=()):
    """Uniform binary u32 (secret keys) — same bits as `rng.binary`."""
    return jax.random.bits(key, shape, dtype=U32) & U32(1)


def normal_limb(key, std: float, shape=()):
    """round(N(0, std) * 2^64) wrapped to a limb pair. f32 sampling:
    quantum ~2^26 at sigma*2^64 ~ 2^50 (distributionally negligible;
    the reference samples f64, `rand.rs:20-30`)."""
    if std == 0.0:
        z = jnp.zeros(shape, dtype=U32)
        return (z, z)
    v = jax.random.normal(key, shape, dtype=F32) * F32(std * 2.0**64)
    q32 = jnp.round(v * F32(2.0**-32))
    r = v - q32 * F32(2.0**32)  # exact (common ulp grid), |r| <= 2^31
    lo_i = jnp.round(r).astype(I32)
    hi_i = q32.astype(I32) - (lo_i < 0).astype(I32)
    return (hi_i.astype(U32), lo_i.astype(U32))


# --------------------------------------------------------------------------
# encryption
# --------------------------------------------------------------------------


def encrypt_glwe_u32(key, msg_limb, sk_u32: jnp.ndarray, glwe: GlweDef):
    """msg limb pair [N] -> GLWE limb pair [k+1, N]
    (≙ `encryption.encrypt_glwe`; masks bit-identical under one key)."""
    k_a, k_e = jax.random.split(key)
    a = uniform_limb(k_a, (glwe.size, glwe.degree))
    e = normal_limb(k_e, glwe.std, (glwe.degree,))
    a_s = lb.zeros((glwe.degree,))
    for i in range(glwe.size):
        a_s = lb.add(a_s, negacyclic_mul_binary((a[0][i], a[1][i]), sk_u32[i]))
    b = lb.add(lb.add(a_s, (msg_limb[0], msg_limb[1])), e)
    return (
        jnp.concatenate([a[0], b[0][None]], axis=0),
        jnp.concatenate([a[1], b[1][None]], axis=0),
    )


def _shift_left_limb(a, sh: int):
    """Limb pair << sh (mod 2^64), static sh in [0, 64)."""
    hi, lo = a
    if sh == 0:
        return a
    if sh < 32:
        return ((hi << U32(sh)) | (lo >> U32(32 - sh)), lo << U32(sh))
    if sh == 32:
        return (lo, jnp.zeros_like(lo))
    return (lo << U32(sh - 32), jnp.zeros_like(lo))


def encrypt_glev_u32(key, msg_small, sk_u32, glwe: GlweDef, radix: RadixDecomposition):
    """GLEV of a small-integer poly (given as a limb pair [N]):
    rows encrypt msg << (64 - logB*(j+1)) (`glev_encryption.rs:64-100`)."""
    keys = jax.random.split(key, radix.count)
    rows_hi, rows_lo = [], []
    for j in range(radix.count):
        sh = 64 - radix.radix_log * (j + 1)
        row = encrypt_glwe_u32(keys[j], _shift_left_limb(msg_small, sh), sk_u32, glwe)
        rows_hi.append(row[0])
        rows_lo.append(row[1])
    return (jnp.stack(rows_hi, axis=0), jnp.stack(rows_lo, axis=0))


def encrypt_ggsw_scalar_u32(
    key, bit_u32, sk_u32: jnp.ndarray, glwe: GlweDef, radix: RadixDecomposition
):
    """GGSW of a scalar bit: rows i < k encrypt GLEV(-s_i * bit), row k
    GLEV(bit * X^0) (`ggsw_encryption.rs:39-71`). Returns limb pair
    [k+1, count, k+1, N]."""
    n = glwe.degree
    keys = jax.random.split(key, glwe.size + 1)
    rows_hi, rows_lo = [], []
    for i in range(glwe.size):
        # -s_i * bit as a torus-integer poly: coeffs in {0, -1 mod 2^64}
        on = (sk_u32[i] & bit_u32.astype(U32)) > 0
        m = (
            jnp.where(on, U32(0xFFFFFFFF), U32(0)),
            jnp.where(on, U32(0xFFFFFFFF), U32(0)),
        )
        rh, rl = encrypt_glev_u32(keys[i], m, sk_u32, glwe, radix)
        rows_hi.append(rh)
        rows_lo.append(rl)
    m0 = jnp.zeros((n,), dtype=U32).at[0].set(bit_u32.astype(U32))
    rh, rl = encrypt_glev_u32(keys[glwe.size], (jnp.zeros_like(m0), m0), sk_u32, glwe, radix)
    rows_hi.append(rh)
    rows_lo.append(rl)
    return (jnp.stack(rows_hi, axis=0), jnp.stack(rows_lo, axis=0))


def generate_bootstrap_key_u32(
    key, lwe_sk_u32: jnp.ndarray, glwe_sk_u32: jnp.ndarray,
    lwe: LweDef, glwe: GlweDef, radix: RadixDecomposition,
):
    """BSK rows GGSW(s_i) in coefficient-domain limb pairs
    [n_lwe, k+1, count, k+1, N], generated entirely on-device (vmap over
    rows; ≙ `programmable_bootstrapping.rs:34-58`). Feed to
    `bootstrap_u32.bsk_to_freq_u32` via `limb32.to_u64_np` (host) or
    convert on-device with `fwd_limb`."""
    keys = jax.random.split(key, lwe.dim)
    return jax.vmap(
        lambda kk, s: encrypt_ggsw_scalar_u32(kk, s, glwe_sk_u32, glwe, radix)
    )(keys, lwe_sk_u32)
