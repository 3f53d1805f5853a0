"""Programmable bootstrapping: LUT construction, blind rotation, PBS.

(≙ reference `sunscreen_tfhe/src/ops/bootstrapping/programmable_bootstrapping.rs`.)

The blind rotation is expressed as a `lax.fori_loop` of batched CMuxes:
each step rotates the whole accumulator *batch* by its per-element
`a_i` (a gather) and CMuxes with bootstrap-key row i. Batching over many
input ciphertexts is the TPU-native throughput axis (the reference runs
one PBS per rayon task instead).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..params import GlweDef, LweDef, RadixDecomposition
from . import encryption as enc
from .ciphertext import lwe_modulus_switch, sample_extract
from .fft import C128
from .fft_ops import cmux, ggsw_to_fft
from .poly import monomial_mul_batch
from .torus import U64, u64


def generate_bootstrap_key(
    key,
    lwe_sk: jnp.ndarray,
    glwe_sk: jnp.ndarray,
    lwe: LweDef,
    glwe: GlweDef,
    radix: RadixDecomposition,
    be=C128,
):
    """BSK: one GGSW(s_i) per LWE secret bit, under the GLWE key
    (`programmable_bootstrapping.rs:34-58`). Returned in the frequency
    domain: freq [n_lwe, k+1, count, k+1, N/2]."""
    keys = jax.random.split(key, lwe.dim)
    rows = jax.vmap(
        lambda kk, s: enc.encrypt_ggsw_scalar(kk, s, glwe_sk, glwe, radix)
    )(keys, lwe_sk)
    return be.fwd_torus(rows)


def generate_blind_rotation_shift(
    key,
    rotation: int,
    glwe_sk: jnp.ndarray,
    glwe: GlweDef,
    radix: RadixDecomposition,
    be=C128,
):
    """Encrypt a rotation amount as log2(N) GGSW bit encryptions (the
    `BlindRotationShift` entity, `entities/blind_rotation_shift.rs`;
    keygen `ops/bootstrapping/blind_rotation.rs:226-258`). Returns the
    frequency-domain stack [log2 N, k+1, l, k+1, N/2]."""
    assert 0 <= rotation < glwe.degree
    keys = jax.random.split(key, glwe.log_degree)
    rows = []
    for i in range(glwe.log_degree):
        bit = (rotation >> i) & 1
        rows.append(enc.encrypt_ggsw_scalar(keys[i], bit, glwe_sk, glwe, radix))
    return be.fwd_torus(jnp.stack(rows, axis=0))


def blind_rotation(
    ct: jnp.ndarray,
    shift_fft,
    glwe: GlweDef,
    radix: RadixDecomposition,
    be=C128,
) -> jnp.ndarray:
    """Negatively rotate a GLWE's message by an *encrypted* amount: a
    CMux ladder over the shift's bit encryptions, rotating by X^{-2^i}
    at level i (`ops/bootstrapping/blind_rotation.rs:202-224`).
    Supports leading batch dims on `ct`."""
    from .poly import monomial_mul

    out = u64(ct)
    for i in range(glwe.log_degree):
        rotated = monomial_mul(out, 2 * glwe.degree - (1 << i))
        out = cmux(out, rotated, shift_fft[i], glwe, radix, be)
    return out


def generate_lut(maps, glwe: GlweDef, plaintext_bits: int) -> jnp.ndarray:
    """Build a univariate (possibly multi-function) LUT as a trivial GLWE
    whose B polynomial encodes the table (`programmable_bootstrapping.rs:
    129-185`):

    - p = 2^plaintext_bits entries, each spanning a stride of N/p
      coefficients; within a stride, position k holds function
      `k mod ceil_pow2(len(maps))` (zero-padded).
    - Then negate the first stride/2 coefficients and rotate left by
      stride/2 (so rounding at stride boundaries works).

    `maps` are python callables evaluated at trace time (static).
    Returns the trivial GLWE u64 [k+1, N].
    """
    return jnp.asarray(generate_lut_np(maps, glwe, plaintext_bits))


def generate_lut_np(maps, glwe: GlweDef, plaintext_bits: int):
    """Numpy (host-side) variant of `generate_lut` for x32 processes,
    where a jnp u64 array would silently downcast."""
    p = 1 << plaintext_bits
    n = glwe.degree
    v = len(maps)
    ceil_v = 1 << (v - 1).bit_length()
    assert n >= p
    stride = n // p
    delta = 64 - plaintext_bits
    c = np.zeros(n, dtype=np.uint64)
    for j in range(p):
        for kk in range(stride):
            fn_id = kk % ceil_v
            if fn_id < v:
                p_i = int(maps[fn_id](j))
                assert 0 <= p_i < p, f"map produced {j} -> {p_i} out of range"
                c[j * stride + kk] = np.uint64(p_i) << np.uint64(delta)
    c[: stride // 2] = np.uint64(0) - c[: stride // 2]
    c = np.roll(c, -(stride // 2))
    lut = np.zeros((glwe.size + 1, n), dtype=np.uint64)
    lut[-1] = c
    return lut


def blind_rotate(
    lut_glwe: jnp.ndarray,
    ct_switched: jnp.ndarray,
    bsk_fft,
    lwe: LweDef,
    glwe: GlweDef,
    radix: RadixDecomposition,
    be=C128,
) -> jnp.ndarray:
    """Rotate `lut_glwe` by the (modulus-switched, < 2N) phase of
    `ct_switched` via n CMux steps (`programmable_bootstrapping.rs:385-409`):

    acc = lut * X^{-b};  acc = cmux(acc, acc * X^{a_i}, BSK_i)  for each i

    Supports leading batch dims on `lut_glwe`/`ct_switched`.
    """
    a = ct_switched[..., :-1]
    b = ct_switched[..., -1]
    # X^{-b}: add [..., 1] axis so the rotation broadcasts over the k+1 axis
    acc = monomial_mul_batch(u64(lut_glwe), (U64(2 * glwe.degree) - b)[..., None])

    def body(i, acc):
        a_i = a[..., i]
        rotated = monomial_mul_batch(acc, a_i[..., None])
        return cmux(acc, rotated, bsk_fft[i], glwe, radix, be)

    return jax.lax.fori_loop(0, lwe.dim, body, acc)


def generalized_programmable_bootstrap(
    ct: jnp.ndarray,
    lut_glwe: jnp.ndarray,
    bsk_fft,
    lwe: LweDef,
    glwe: GlweDef,
    radix: RadixDecomposition,
    log_chi: int = 0,
    log_v: int = 0,
    be=C128,
) -> jnp.ndarray:
    """Generalized PBS -> GLWE (`programmable_bootstrapping.rs:342-410`):
    modulus switch the input to 2N (with log_chi/log_v bit selection),
    then blind rotate the LUT. No sample extract or keyswitch."""
    two_n = glwe.log_degree + 1
    ct_switched = lwe_modulus_switch(u64(ct), log_chi, log_v, two_n)
    return blind_rotate(lut_glwe, ct_switched, bsk_fft, lwe, glwe, radix, be)


def programmable_bootstrap_univariate(
    ct: jnp.ndarray,
    lut_glwe: jnp.ndarray,
    bsk_fft,
    lwe: LweDef,
    glwe: GlweDef,
    radix: RadixDecomposition,
    be=C128,
) -> jnp.ndarray:
    """Univariate PBS -> LWE under the flattened GLWE key (sample 0
    extracted; `programmable_bootstrapping.rs:291-340`). The caller
    keyswitches back to the original key if needed."""
    glwe_out = generalized_programmable_bootstrap(
        ct, lut_glwe, bsk_fft, lwe, glwe, radix, 0, 0, be
    )
    return sample_extract(glwe_out, 0, glwe)


def programmable_bootstrap_bivariate(
    ct_left: jnp.ndarray,
    ct_right: jnp.ndarray,
    lut_glwe: jnp.ndarray,
    bsk_fft,
    lwe: LweDef,
    glwe: GlweDef,
    radix: RadixDecomposition,
    plaintext_bits: int,
    be=C128,
) -> jnp.ndarray:
    """Bivariate PBS: homomorphically pack `left * 2^bits + right`, then
    univariate PBS over 2*bits (`programmable_bootstrapping.rs:575-621`)."""
    packed = u64(ct_left) * U64(1 << plaintext_bits) + u64(ct_right)
    return programmable_bootstrap_univariate(
        packed, lut_glwe, bsk_fft, lwe, glwe, radix, be
    )


def generate_bivariate_lut(map2, glwe: GlweDef, plaintext_bits: int) -> jnp.ndarray:
    """LUT for a bivariate function over packed inputs
    (`programmable_bootstrapping.rs:553-573` bivariate_function).

    Inputs must be encrypted at `2*plaintext_bits + 1` bits — the
    standard one-padding-bit convention relative to this
    `2*plaintext_bits` table (encryption at `bits+1` for a `bits` LUT
    keeps the packed phase in the first negacyclic half). Decode the
    output at `2*plaintext_bits`."""
    modulus = 1 << plaintext_bits

    def unpacked(x):
        lhs = (x // modulus) % modulus
        rhs = x % modulus
        return map2(lhs, rhs) % modulus

    return generate_lut([unpacked], glwe, 2 * plaintext_bits)
