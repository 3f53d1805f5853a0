"""Private and public functional keyswitching, and circuit
bootstrapping v1 (via PFKS).

(≙ reference `sunscreen_tfhe/src/ops/keyswitch/private_functional_keyswitch.rs`,
`public_functional_keyswitch.rs`, and
`ops/bootstrapping/circuit_bootstrapping.rs:100-219` — the classic
CGGI-style circuit bootstrap, kept alongside the default WHS+24 variant
in `cbs.py`.)

A functional keyswitch maps `lwe_count` LWE ciphertexts to one GLWE
ciphertext while applying an R-Lipschitzian morphism `f: T_q^p -> T_q[X]`.
In the private variant the morphism is baked (secretly) into the key.

`map_fn(slots)` takes a u64 array [lwe_count] of torus values and
returns a u64 torus polynomial [N].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params import GlweDef, LweDef, RadixDecomposition
from . import encryption as enc
from .bootstrap import generate_bootstrap_key  # noqa: F401  (re-export convenience)
from .cbs import hi_noise_lwe_to_lo_noise_glwe
from .ciphertext import lwe_rotate, sample_extract
from .decomp import decompose, decomposition_factor
from .fft import C128
from .torus import I64, U64, encode, u64


def _scalar_digits(x, radix: RadixDecomposition):
    """Row-aligned signed digits of scalar torus values."""
    return decompose(u64(x), radix)


def _glwe_scalar_mad(acc, glwe, scalar_i64):
    """acc += glwe * scalar (wrapping; `glev_ciphertext_ops.rs:48-59`)."""
    return acc + u64(glwe) * scalar_i64.astype(U64)


# --------------------------------------------------------------------------
# private functional keyswitch
# --------------------------------------------------------------------------


def generate_private_functional_keyswitch_key(
    key,
    from_sk: jnp.ndarray,
    to_sk: jnp.ndarray,
    map_fn,
    from_lwe: LweDef,
    to_glwe: GlweDef,
    radix: RadixDecomposition,
    lwe_count: int,
) -> jnp.ndarray:
    """PFKS key: for slot z and from-key component i (with the virtual
    s_n = -1 handling b), GLEV row j encrypts f(e_z * s_i * q/B^(j+1))
    (`private_functional_keyswitch.rs:44-102`).

    Shape: u64 [lwe_count, n_from+1, count, k+1, N].
    """
    n = from_lwe.dim
    s_ext = jnp.concatenate([u64(from_sk), (U64(0) - U64(1))[None]])
    out_rows = []
    for z in range(lwe_count):
        comp_rows = []
        for i in range(n + 1):
            glwes = []
            for j in range(radix.count):
                factor = U64(decomposition_factor(j, radix) % (1 << 64))
                slots = jnp.zeros((lwe_count,), dtype=U64)
                slots = slots.at[z].set(s_ext[i] * factor)
                pt_poly = u64(map_fn(slots))
                subkey = jax.random.fold_in(key, (z * (n + 1) + i) * radix.count + j)
                glwes.append(enc.encrypt_glwe(subkey, pt_poly, to_sk, to_glwe))
            comp_rows.append(jnp.stack(glwes, axis=0))
        out_rows.append(jnp.stack(comp_rows, axis=0))
    return jnp.stack(out_rows, axis=0)


def private_functional_keyswitch(
    inputs: jnp.ndarray,
    pfksk: jnp.ndarray,
    from_lwe: LweDef,
    to_glwe: GlweDef,
    radix: RadixDecomposition,
) -> jnp.ndarray:
    """`out = -Σ_z Σ_i <decomp(ab_i^z), GLEV_{z,i}>`
    (`private_functional_keyswitch.rs:107-142`).

    inputs: u64 [lwe_count, n_from+1].
    """
    lwe_count = pfksk.shape[0]
    assert inputs.shape[0] == lwe_count
    acc = jnp.zeros((to_glwe.size + 1, to_glwe.degree), dtype=U64)
    digits = _scalar_digits(inputs, radix)  # [count, lwe_count, n+1]
    for z in range(lwe_count):
        for i in range(from_lwe.dim + 1):
            for j in range(radix.count):
                acc = _glwe_scalar_mad(acc, pfksk[z, i, j], digits[j, z, i])
    return U64(0) - acc


# --------------------------------------------------------------------------
# public functional keyswitch
# --------------------------------------------------------------------------


def generate_public_functional_keyswitch_key(
    key,
    from_sk: jnp.ndarray,
    to_sk: jnp.ndarray,
    from_lwe: LweDef,
    to_glwe: GlweDef,
    radix: RadixDecomposition,
) -> jnp.ndarray:
    """GLEV_i row j encrypts s_i * q/B^(j+1) in the constant coefficient
    (`public_functional_keyswitch.rs:29-54`). Shape
    u64 [n_from, count, k+1, N]."""
    n = from_lwe.dim
    rows = []
    for i in range(n):
        glwes = []
        for j in range(radix.count):
            factor = U64(decomposition_factor(j, radix) % (1 << 64))
            pt = jnp.zeros((to_glwe.degree,), dtype=U64).at[0].set(
                u64(from_sk[i]) * factor
            )
            subkey = jax.random.fold_in(key, i * radix.count + j)
            glwes.append(enc.encrypt_glwe(subkey, pt, to_sk, to_glwe))
        rows.append(jnp.stack(glwes, axis=0))
    return jnp.stack(rows, axis=0)


def public_functional_keyswitch(
    inputs: jnp.ndarray,
    pufksk: jnp.ndarray,
    map_fn,
    from_lwe: LweDef,
    to_glwe: GlweDef,
    radix: RadixDecomposition,
    be=C128,
) -> jnp.ndarray:
    """`out = (0, f(b_0..b_p)) - Σ_i <decomp(f(a_i^0..a_i^p)), GLEV_i>`
    with the sum accumulated in the frequency domain
    (`public_functional_keyswitch.rs:75-147`).

    inputs: u64 [lwe_count, n_from+1].
    """
    kp1 = to_glwe.size + 1
    n2 = to_glwe.degree // 2
    acc = be.zeros((kp1, n2))
    for i in range(from_lwe.dim):
        poly = u64(map_fn(inputs[:, i]))
        digits = decompose(poly, radix)  # [count, N]
        digit_fft = be.fwd_signed(digits)
        glev_fft = be.fwd_torus(pufksk[i])  # [count, k+1, N/2]
        for j in range(radix.count):
            acc = be.cmadd(acc, digit_fft[j, None, :], glev_fft[j])
    a_sum = be.inv(acc)
    b_poly = u64(map_fn(inputs[:, from_lwe.dim]))
    out = U64(0) - a_sum
    return out.at[-1, :].add(b_poly)


# --------------------------------------------------------------------------
# circuit bootstrapping v1 (via PFKS)
# --------------------------------------------------------------------------


def generate_cbs_pfks_keys(
    key,
    from_sk: jnp.ndarray,
    to_sk: jnp.ndarray,
    from_lwe: LweDef,
    to_glwe: GlweDef,
    radix: RadixDecomposition,
) -> jnp.ndarray:
    """k+1 PFKS keys with maps x -> -x*s_j (rows j < k) and x -> x
    (row k), each with lwe_count=1
    (`private_functional_keyswitch.rs:145-207`).

    Shape: u64 [k+1, 1, n_from+1, count, k+1, N].
    """
    keysplit = jax.random.split(key, to_glwe.size + 1)
    keys = []
    for j in range(to_glwe.size):
        s_j = to_sk[j]

        def map_fn(slots, s_j=s_j):
            from .poly import negacyclic_mul_exact

            mono = jnp.zeros((to_glwe.degree,), dtype=U64).at[0].set(slots[0])
            return U64(0) - negacyclic_mul_exact(mono, s_j)

        keys.append(
            generate_private_functional_keyswitch_key(
                keysplit[j], from_sk, to_sk, map_fn, from_lwe, to_glwe, radix, 1
            )
        )

    def id_map(slots):
        return jnp.zeros((to_glwe.degree,), dtype=U64).at[0].set(slots[0])

    keys.append(
        generate_private_functional_keyswitch_key(
            keysplit[to_glwe.size], from_sk, to_sk, id_map, from_lwe, to_glwe, radix, 1
        )
    )
    return jnp.stack(keys, axis=0)


def extract_and_rotate(
    lo_noise_glwe: jnp.ndarray, glwe: GlweDef, cbs_radix: RadixDecomposition
):
    """Sample extract the first l coefficients and undo the functional-
    bootstrap rotation (+1 at each level's precision)
    (`circuit_bootstrapping.rs:224-251`). Returns u64 [l, k*N+1]."""
    outs = []
    for i in range(cbs_radix.count):
        pb = cbs_radix.radix_log * (i + 1) + 1
        lwe = sample_extract(lo_noise_glwe, i, glwe)
        outs.append(lwe_rotate(lwe, encode(1, pb)))
    return jnp.stack(outs, axis=0)


def circuit_bootstrap_via_pfks(
    ct: jnp.ndarray,
    bsk_fft,
    cbs_pfks_keys: jnp.ndarray,
    lwe_0: LweDef,
    glwe_1: GlweDef,
    glwe_2: GlweDef,
    pbs_radix: RadixDecomposition,
    cbs_radix: RadixDecomposition,
    pfks_radix: RadixDecomposition,
    be=C128,
) -> jnp.ndarray:
    """CBS v1: multi-function PBS -> sample extract per level -> PFKS per
    GGSW row (`circuit_bootstrapping.rs:162-219`). Returns a
    coefficient-domain GGSW u64 [k+1, l, k+1, N] (the reference's v1
    also emits non-FFT GGSWs)."""
    lo_noise_glwe = hi_noise_lwe_to_lo_noise_glwe(
        ct, bsk_fft, lwe_0, glwe_2, pbs_radix, cbs_radix, be
    )
    lwes = extract_and_rotate(lo_noise_glwe, glwe_2, cbs_radix)
    from_lwe = glwe_2.as_lwe_def()
    rows = []
    for j in range(glwe_1.size + 1):
        glwes = []
        for i in range(cbs_radix.count):
            glwes.append(
                private_functional_keyswitch(
                    lwes[i][None, :], cbs_pfks_keys[j], from_lwe, glwe_1, pfks_radix
                )
            )
        rows.append(jnp.stack(glwes, axis=0))
    return jnp.stack(rows, axis=0)
