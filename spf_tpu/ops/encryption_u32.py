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


# --------------------------------------------------------------------------
# full on-device keygen (multi-bit BSK, automorphism, scheme-switch, LWE
# keyswitch keys) — everything the production CBS pipeline needs, with
# no u64 dtypes, so keygen runs in-process on TPU (x32). The CPU
# subprocess keygen is a fallback, not a requirement.
# ≙ reference in-process keygen `programmable_bootstrapping.rs:34-58`,
# `lwe_keyswitch_key.rs:16-50`, `ops/automorphisms/mod.rs:18-44`,
# `scheme_switch.rs:22-64`.
# --------------------------------------------------------------------------


def sum_limbs(a, axis=-1):
    """Exact Σ mod 2^64 of a limb-pair array along `axis`: each u32 limb
    is summed as two 16-bit planes with i32 accumulation (exact for up
    to 2^15 terms), then recombined with carries."""
    hi, lo = a
    assert hi.shape[axis] <= (1 << 15)

    def planes(x):
        lo16 = (x & U32(0xFFFF)).astype(I32).sum(axis=axis)
        hi16 = (x >> U32(16)).astype(I32).sum(axis=axis)
        return lo16, hi16

    lo_l, lo_h = planes(lo)
    hi_l, hi_h = planes(hi)
    # value = lo_l + lo_h*2^16 + hi_l*2^32 + hi_h*2^48 (all < 2^31)
    out = (jnp.zeros_like(lo_l, dtype=U32), lo_l.astype(U32))
    out = lb.add(out, ((lo_h.astype(U32) >> U32(16)), lo_h.astype(U32) << U32(16)))
    out = lb.add(out, (hi_l.astype(U32), jnp.zeros_like(hi_l, dtype=U32)))
    out = lb.add(out, (hi_h.astype(U32) << U32(16), jnp.zeros_like(hi_h, dtype=U32)))
    return out


def encrypt_lwe_u32(key, msg_limb, sk_u32: jnp.ndarray, lwe: LweDef):
    """msg limb pair () -> LWE limb pair [n+1] (≙ `encryption.encrypt_lwe`;
    masks bit-identical under one key)."""
    k_a, k_e = jax.random.split(key)
    a = uniform_limb(k_a, (lwe.dim,))
    e = normal_limb(k_e, lwe.std, ())
    sel = sk_u32 > 0
    masked = (jnp.where(sel, a[0], U32(0)), jnp.where(sel, a[1], U32(0)))
    b = lb.add(lb.add(sum_limbs(masked, axis=0), msg_limb), e)
    return (
        jnp.concatenate([a[0], b[0][None]], axis=0),
        jnp.concatenate([a[1], b[1][None]], axis=0),
    )


def multibit_key_products_u32(lwe_sk_u32: jnp.ndarray, group: int):
    """Subset products of binary key bits per group: u32 [ng, 2^g - 1]
    (≙ `multibit.multibit_key_products_np`, on-device)."""
    n = lwe_sk_u32.shape[0]
    ng = -(-n // group)
    pad = ng * group - n
    sk = jnp.concatenate([lwe_sk_u32, jnp.zeros((pad,), U32)]) if pad else lwe_sk_u32
    bits = sk.reshape(ng, group)
    cols = []
    for m in range(1, 1 << group):
        prod = jnp.ones((ng,), U32)
        for j in range(group):
            if m & (1 << j):
                prod = prod & bits[:, j]
        cols.append(prod)
    return jnp.stack(cols, axis=1)


def generate_multibit_bsk_u32(
    key, lwe_sk_u32, glwe_sk_u32, glwe: GlweDef, radix: RadixDecomposition,
    group: int,
):
    """Multi-bit bootstrap key on-device: limb pair
    [ng, 2^g - 1, k+1, l, k+1, N] (≙ `multibit.generate_multibit_bsk`,
    same key-split structure)."""
    prods = multibit_key_products_u32(lwe_sk_u32, group)
    ng, ns = prods.shape
    keys = jax.random.split(key, ng * ns)
    rows = jax.vmap(
        lambda kk, b: encrypt_ggsw_scalar_u32(kk, b, glwe_sk_u32, glwe, radix)
    )(keys, prods.reshape(-1))
    return tuple(c.reshape(ng, ns, *c.shape[1:]) for c in rows)


@functools.lru_cache(maxsize=32)
def _pow_k_tables(n: int, k_exp: int):
    """dest[j] = (j * k) % n, neg[j] = parity of (j * k) // n for the
    X -> X^k substitution of a degree-n negacyclic poly."""
    j = np.arange(n)
    dest = ((j * k_exp) % n).astype(np.int32)
    neg = (((j * k_exp) // n) % 2).astype(np.int32)
    return dest, neg


def _pow_k_limb_binary(s_u32: jnp.ndarray, k_exp: int):
    """s(X^k) for BINARY s [N] as a torus limb pair [N] with
    coefficients in {0, 1, -1 mod 2^64} (≙ `poly.pow_k`)."""
    n = s_u32.shape[-1]
    dest, neg = _pow_k_tables(n, k_exp)
    out_val = jnp.zeros((n,), I32).at[jnp.asarray(dest)].set(
        s_u32.astype(I32) * (1 - 2 * jnp.asarray(neg))
    )
    lo = out_val.astype(U32)
    hi = jnp.where(out_val < 0, U32(0xFFFFFFFF), U32(0))
    return (hi, lo)


def generate_automorphism_keys_u32(
    key, glwe_sk_u32, glwe: GlweDef, radix: RadixDecomposition
):
    """log2(N) GLWE keyswitch keys as a coefficient-domain limb pair
    [log2 N, k, l, k+1, N] (≙ `keyswitch.generate_automorphism_keys`
    with be=None; same key-split structure)."""
    n = glwe.degree
    log_n = glwe.log_degree
    keys = jax.random.split(key, log_n)
    out_hi, out_lo = [], []
    for i in range(1, log_n + 1):
        k_exp = n // (1 << (i - 1)) + 1
        row_keys = jax.random.split(keys[i - 1], glwe.size)
        rows_hi, rows_lo = [], []
        for r in range(glwe.size):
            sk_k = _pow_k_limb_binary(glwe_sk_u32[r], k_exp)
            gh, gl = encrypt_glev_u32(row_keys[r], sk_k, glwe_sk_u32, glwe, radix)
            rows_hi.append(gh)
            rows_lo.append(gl)
        out_hi.append(jnp.stack(rows_hi, axis=0))
        out_lo.append(jnp.stack(rows_lo, axis=0))
    return (jnp.stack(out_hi, axis=0), jnp.stack(out_lo, axis=0))


def generate_scheme_switch_key_u32(
    key, glwe_sk_u32, glwe: GlweDef, radix: RadixDecomposition
):
    """GLEV(s_i ⊛ s_j) table as a coefficient-domain limb pair
    [k, k, l, k+1, N] (≙ `scheme_switch.generate_scheme_switch_key`
    with be=None; same fold_in structure)."""
    k = glwe.size
    rows_hi, rows_lo = [], []
    for i in range(k):
        cols_hi, cols_lo = [], []
        for j in range(k):
            ii, jj = min(i, j), max(i, j)
            s_ij = negacyclic_mul_binary(
                (jnp.zeros_like(glwe_sk_u32[ii]), glwe_sk_u32[ii]),
                glwe_sk_u32[jj],
            )
            subkey = jax.random.fold_in(key, ii * k + jj)
            gh, gl = encrypt_glev_u32(subkey, s_ij, glwe_sk_u32, glwe, radix)
            cols_hi.append(gh)
            cols_lo.append(gl)
        rows_hi.append(jnp.stack(cols_hi, axis=0))
        rows_lo.append(jnp.stack(cols_lo, axis=0))
    return (jnp.stack(rows_hi, axis=0), jnp.stack(rows_lo, axis=0))


def generate_lwe_keyswitch_key_u32(
    key, original_sk_u32, new_sk_u32, old_lwe: LweDef, new_lwe: LweDef,
    radix: RadixDecomposition,
):
    """LWE keyswitch key: limb pair [n_old, count, n_new+1], row i col j
    = LWE_new(s_old_i * q/B^(j+1)) (≙ `keyswitch.generate_lwe_keyswitch_key`,
    same split structure)."""
    from .decomp import decomposition_factor

    factors = [
        decomposition_factor(j, radix) % (1 << 64) for j in range(radix.count)
    ]

    def encrypt_row(k_i, s_i):
        ks = jax.random.split(k_i, radix.count)
        cols_hi, cols_lo = [], []
        for j in range(radix.count):
            f_hi = U32((factors[j] >> 32) & 0xFFFFFFFF)
            f_lo = U32(factors[j] & 0xFFFFFFFF)
            msg = (s_i * f_hi, s_i * f_lo)  # s_i binary: select factor
            ch, cl = encrypt_lwe_u32(ks[j], msg, new_sk_u32, new_lwe)
            cols_hi.append(ch)
            cols_lo.append(cl)
        return (jnp.stack(cols_hi, axis=0), jnp.stack(cols_lo, axis=0))

    keys = jax.random.split(key, old_lwe.dim)
    return jax.vmap(encrypt_row)(keys, original_sk_u32)
