"""Batched programmable bootstrap in the TPU-optimized coefficient-major
layout.

All ciphertext tensors here put the polynomial/coefficient axis
second-to-last and the ciphertext batch LAST (on vector lanes):

- LWE batch:  u64 [n0+1, B]
- GLWE batch: u64 [k+1, N, B]
- BSK:        freq tuple of 4 f32 [n0, k+1, l, k+1, N/2] (broadcast
              over the batch lanes)

The per-step monomial rotations are bit-selected static rolls and
every FFT stage is tile-contiguous (`fft_ds32_t.py`), which is what
makes XLA:TPU generate clean vector code — per-element gathers and the
batch-minor layout used elsewhere measure ~40-100x off speed-of-light.

Semantics are identical to `bootstrap.py` (tested against it); use this
path for throughput work (bench, production serving).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params import GlweDef, LweDef, RadixDecomposition
from . import fft_ds32_t as ft
from .ciphertext import lwe_modulus_switch
from .decomp import decompose
from .torus import U64, u64


def to_t_layout(x: jnp.ndarray) -> jnp.ndarray:
    """[B, ...] -> [..., B]: move the batch axis last."""
    return jnp.moveaxis(x, 0, -1)


def from_t_layout(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.moveaxis(x, -1, 0)


def bsk_to_t(bsk_coeff: jnp.ndarray):
    """Coefficient-domain BSK u64 [n0, k+1, l, k+1, N] -> freq tuple
    [n0, k+1, l, k+1, N/2] (no batch axis; broadcast over lanes)."""
    f = ft.fwd_torus_t(u64(bsk_coeff)[..., None])
    return tuple(c[..., 0] for c in f)


def monomial_mul_t(a: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """a [..., N, B] times X^t with per-batch t [B] (negacyclic).

    Implemented as log2(2N) statically-shifted negacyclic rolls selected
    by the bits of t — a general per-element gather lowers to a
    catastrophically slow TPU gather (measured 15 ms per call at
    N=2048, B=128, ~97% of the whole blind-rotation step), while static
    rolls + selects are plain vector ops.
    """
    n = a.shape[-2]
    t = t.astype(U64)
    out = a
    # X^(2^i) for i < log2(N): roll down by 2^i with sign wrap
    for i in range(n.bit_length() - 1):
        s = 1 << i
        rolled = jnp.roll(out, s, axis=-2)
        sign_mask = (jnp.arange(n) < s)[:, None]
        rolled = jnp.where(sign_mask, U64(0) - rolled, rolled)
        bit = ((t >> U64(i)) & U64(1)) > 0  # [B]
        out = jnp.where(bit, rolled, out)
    # X^N = -1
    bit_n = ((t >> U64(n.bit_length() - 1)) & U64(1)) > 0
    out = jnp.where(bit_n, U64(0) - out, out)
    return out


def external_product_t(
    glwe: jnp.ndarray, ggsw_fft_row, glwe_def: GlweDef, radix: RadixDecomposition
):
    """glwe u64 [k+1, N, B] ⊡ GGSW freq row (components [k+1, l, k+1, K])
    -> freq tuple [k+1, K, B]."""
    kp1 = glwe_def.size + 1
    k2 = glwe_def.degree // 2
    bb = glwe.shape[-1]
    digits = decompose(glwe, radix)  # [l, k+1, N, B]
    dfft = ft.fwd_signed_t(digits)  # tuple [l, k+1, K, B]
    acc = ft.zeros_t((kp1, k2, bb))
    batched_sel = ggsw_fft_row[0].ndim == 5  # [k+1, l, k+1, K, B]
    for i in range(kp1):
        for j in range(radix.count):
            d = tuple(c[j, i, None, :, :] for c in dfft)  # [1, K, B]
            if batched_sel:
                g = tuple(c[i, j] for c in ggsw_fft_row)  # [k+1, K, B]
            else:
                g = tuple(c[i, j, :, :, None] for c in ggsw_fft_row)  # [k+1, K, 1]
            acc = ft.cmadd_t(acc, d, g)
    return acc


def cmux_t(d0, d1, ggsw_fft_row, glwe_def, radix):
    diff = u64(d1) - u64(d0)
    prod = ft.inv_t(external_product_t(diff, ggsw_fft_row, glwe_def, radix))
    return u64(d0) + prod


def blind_rotate_t(
    lut_glwe_t: jnp.ndarray,
    ct_switched_t: jnp.ndarray,
    bsk_fft_t,
    lwe: LweDef,
    glwe: GlweDef,
    radix: RadixDecomposition,
) -> jnp.ndarray:
    """lut [k+1, N, B] (or broadcastable), ct [n0+1, B] with phases < 2N."""
    a = ct_switched_t[:-1]  # [n0, B]
    b = ct_switched_t[-1]  # [B]
    acc = monomial_mul_t(
        jnp.broadcast_to(
            lut_glwe_t,
            (glwe.size + 1, glwe.degree, ct_switched_t.shape[-1]),
        ),
        U64(2 * glwe.degree) - b,
    )

    def body(i, acc):
        rotated = monomial_mul_t(acc, a[i])
        row = tuple(c[i] for c in bsk_fft_t)
        return cmux_t(acc, rotated, row, glwe, radix)

    return jax.lax.fori_loop(0, lwe.dim, body, acc)


def sample_extract_t(glwe_t: jnp.ndarray, h: int, glwe: GlweDef) -> jnp.ndarray:
    """[k+1, N, B] -> LWE [k*N+1, B] extracting coefficient h."""
    import numpy as np

    n = glwe.degree
    a, b = glwe_t[:-1], glwe_t[-1]  # [k, N, B], [N, B]
    j = np.arange(n)
    idx = (h - j) % n
    neg = j > h
    gathered = jnp.take(a, jnp.asarray(idx), axis=-2)
    a_lwe = jnp.where(jnp.asarray(neg)[:, None], U64(0) - gathered, gathered)
    a_flat = a_lwe.reshape(glwe.size * n, -1)
    return jnp.concatenate([a_flat, b[h][None, :]], axis=0)


def programmable_bootstrap_t(
    ct_t: jnp.ndarray,
    lut_glwe: jnp.ndarray,
    bsk_fft_t,
    lwe: LweDef,
    glwe: GlweDef,
    radix: RadixDecomposition,
) -> jnp.ndarray:
    """Univariate PBS in t-layout: ct [n0+1, B] -> LWE [k*N+1, B] under
    the flattened GLWE key. `lut_glwe` is the standard [k+1, N] LUT."""
    two_n = glwe.log_degree + 1
    ct_sw = lwe_modulus_switch(u64(ct_t), 0, 0, two_n)
    lut_t = u64(lut_glwe)[..., None]
    rotated = blind_rotate_t(lut_t, ct_sw, bsk_fft_t, lwe, glwe, radix)
    return sample_extract_t(rotated, 0, glwe)


# --------------------------------------------------------------------------
# circuit bootstrapping in t-layout (the full L0 LWE -> L1 GGSW conversion)
# --------------------------------------------------------------------------


def keys_to_t(auto_keys_coeff: jnp.ndarray, ssk_coeff: jnp.ndarray):
    """Coefficient-domain automorphism keys [log2 N, k, l, k+1, N] and
    scheme-switch key [k, k, l, k+1, N] -> t-layout freq tuples."""
    ak = ft.fwd_torus_t(u64(auto_keys_coeff)[..., None])
    ssk = ft.fwd_torus_t(u64(ssk_coeff)[..., None])
    return tuple(c[..., 0] for c in ak), tuple(c[..., 0] for c in ssk)


def monomial_mul_static_t(a: jnp.ndarray, t: int) -> jnp.ndarray:
    """a [..., N, B] times X^t for a STATIC t (roll + sign mask)."""
    n = a.shape[-2]
    t = t % (2 * n)
    neg = t >= n
    s = t % n
    out = jnp.roll(a, s, axis=-2) if s else a
    if s:
        mask = (jnp.arange(n) < s)[:, None]
        out = jnp.where(mask, U64(0) - out, out)
    return (U64(0) - out) if neg else out


def pow_k_t(a: jnp.ndarray, k_exp: int) -> jnp.ndarray:
    """Automorphism X -> X^k on [..., N, B] (static permutation along
    axis -2 with signs; ≙ `poly.pow_k`)."""
    import numpy as np

    n = a.shape[-2]
    i = np.arange(n)
    dest = (i * k_exp) % n
    sign_neg = ((i * k_exp) // n) % 2 == 1
    src = np.zeros(n, dtype=np.int64)
    src[dest] = i
    neg = np.zeros(n, dtype=bool)
    neg[dest] = sign_neg
    out = jnp.take(a, jnp.asarray(src), axis=-2)
    return jnp.where(jnp.asarray(neg)[:, None], U64(0) - out, out)


def keyswitch_glwe_t(
    ct: jnp.ndarray, ksk_fft_row, glwe_def: GlweDef, radix: RadixDecomposition
) -> jnp.ndarray:
    """GLWE keyswitch in t-layout: ct [k+1, N, B], ksk freq components
    [k, l, k+1, K] -> [k+1, N, B] (≙ `fft_ops.keyswitch_glwe_to_glwe`)."""
    k = glwe_def.size
    kp1 = k + 1
    k2 = glwe_def.degree // 2
    bb = ct.shape[-1]
    a, b = ct[:-1], ct[-1]
    digits = decompose(a, radix)  # [l, k, N, B]
    dfft = ft.fwd_signed_t(digits)
    acc = ft.zeros_t((kp1, k2, bb))
    for i in range(k):
        for j in range(radix.count):
            d = tuple(c[j, i, None, :, :] for c in dfft)
            g = tuple(c[i, j, :, :, None] for c in ksk_fft_row)
            acc = ft.cmadd_t(acc, d, g)
    a_sum = ft.inv_t(acc)
    trivial_b = jnp.zeros_like(ct).at[-1].set(b)
    return trivial_b - a_sum


def trace_t(
    ct: jnp.ndarray, auto_keys_fft_t, glwe_def: GlweDef, radix: RadixDecomposition
) -> jnp.ndarray:
    """Homomorphic trace in t-layout (≙ `automorphism.trace`)."""
    n = glwe_def.degree
    out = u64(ct)
    for i in range(1, glwe_def.log_degree + 1):
        k_exp = n // (1 << (i - 1)) + 1
        mapped = pow_k_t(out, k_exp)
        row = tuple(c[i - 1] for c in auto_keys_fft_t)
        out = out + keyswitch_glwe_t(mapped, row, glwe_def, radix)
    return out


def scheme_switch_t(
    glev: jnp.ndarray,
    ssk_fft_t,
    glwe_def: GlweDef,
    radix_ggsw: RadixDecomposition,
    radix_ss: RadixDecomposition,
):
    """GLEV [l_ggsw, k+1, N, B] -> GGSW freq tuple [k+1, l_ggsw, k+1, K, B]
    (≙ `fft_ops.scheme_switch_fft`)."""
    k = glwe_def.size
    kp1 = k + 1
    k2 = glwe_def.degree // 2
    bb = glev.shape[-1]
    l_ggsw = radix_ggsw.count
    a = glev[:, :-1]  # [l, k, N, B]
    b = glev[:, -1]  # [l, N, B]
    b_fft = ft.fwd_torus_t(b)  # [l, K, B]
    digits = decompose(a, radix_ss)  # [l_ss, l, k, N, B]
    dfft = ft.fwd_signed_t(digits)
    rows = []
    for j in range(k):
        acc = list(ft.zeros_t((l_ggsw, kp1, k2, bb)))
        for c in range(4):
            acc[c] = acc[c].at[:, j].set(b_fft[c])
        acc = tuple(acc)
        for r in range(k):
            for jj in range(radix_ss.count):
                d = tuple(c[jj, :, r, None, :, :] for c in dfft)  # [l,1,K,B]
                g = tuple(c[j, r, jj, :, :, None] for c in ssk_fft_t)  # [k+1,K,1]
                acc = ft.cmadd_t(acc, d, g)
        rows.append(acc)
    rows.append(ft.fwd_torus_t(glev))  # row k
    return tuple(
        jnp.stack([rows[r][c] for r in range(kp1)], axis=0) for c in range(4)
    )


def circuit_bootstrap_t(
    ct_t: jnp.ndarray,
    bsk_fft_t,
    auto_keys_fft_t,
    ssk_fft_t,
    params,
):
    """Full WHS+24 circuit bootstrap in t-layout: L0 LWE batch
    [n0+1, B] -> L1 GGSW freq tuple [k+1, l_cbs, k+1, K, B]
    (≙ `cbs.circuit_bootstrap`).

    NOTE: correct and fast per-component, but jitting the WHOLE graph at
    DEFAULT_128 currently takes >30 min through the axon remote-compile
    path (the l x log2(N) unrolled trace keyswitches make a huge HLO).
    Next round: wrap trace rounds in `lax.scan` over stacked permutation
    tables / keys to collapse the program size. CPU/eager is fine.
    """
    from .cbs import multifunctional_cbs_lut, _log_v
    from .torus import encode, shr_round

    p = params
    glwe = p.l1_params
    cbs_radix = p.cbs_radix
    # 1. rotate by q/4 and multi-function PBS
    ct_rot = u64(ct_t).at[-1].add(encode(1, 2))
    lut = multifunctional_cbs_lut(glwe, cbs_radix)
    two_n = glwe.log_degree + 1
    ct_sw = lwe_modulus_switch(ct_rot, 0, _log_v(cbs_radix.count), two_n)
    lo_noise = blind_rotate_t(
        u64(lut)[..., None], ct_sw, bsk_fft_t, p.l0_params, glwe, p.pbs_radix
    )
    # 2. per level: un-rotate offset, X^{-i}, mod-switch (>> log2 N), trace
    rows = []
    rotated = lo_noise
    for i in range(cbs_radix.count):
        pb = cbs_radix.radix_log * (i + 1) + 1
        rotated = rotated.at[-1, i].add(encode(1, pb))
        permuted = monomial_mul_static_t(rotated, 2 * glwe.degree - i)
        shifted = shr_round(permuted, glwe.log_degree)
        rows.append(trace_t(shifted, auto_keys_fft_t, glwe, p.tr_radix))
    glev = jnp.stack(rows, axis=0)  # [l, k+1, N, B]
    # 3. scheme switch
    return scheme_switch_t(glev, ssk_fft_t, glwe, cbs_radix, p.ss_radix)
