"""Frequency-domain hot ops: external product, CMux, GLEV CMux, GLWE
keyswitch, scheme switch.

(≙ reference `sunscreen_tfhe/src/ops/fft_ops.rs`.)

All functions are batched: ciphertext arguments may carry arbitrary
leading batch dims (broadcast against each other). This is the central
TPU-native inversion of the reference design — the Rust code runs one
gate per rayon task; here a whole wave of gates is one fused XLA
computation over the batch axes.

Frequency-domain values are produced/consumed through a pluggable FFT
backend (`fft.get_backend`): complex128 on CPU, double-single f32 on
TPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..params import GlweDef, RadixDecomposition
from .decomp import decompose
from .fft import C128
from .torus import u64


def ggsw_to_fft(ggsw: jnp.ndarray, be=C128):
    """Transform a coefficient-domain GGSW [..., k+1, l, k+1, N] into the
    frequency domain (how bootstrap keys and L1 GGSWs are stored;
    `entities/ggsw_ciphertext_fft.rs`)."""
    return be.fwd_torus(u64(ggsw))


def glev_to_fft(glev: jnp.ndarray, be=C128):
    return be.fwd_torus(u64(glev))


def glwe_from_fft(glwe_fft, be=C128) -> jnp.ndarray:
    return be.inv(glwe_fft)


def external_product_fft(
    glwe: jnp.ndarray,
    ggsw_fft,
    glwe_def: GlweDef,
    radix: RadixDecomposition,
    be=C128,
):
    """GGSW ⊡ GLWE -> GLWE (frequency domain output).

    `out = Σ_i <Decomp^{B,l}(AB_i), GGSW_row_i>` with the per-level MAD
    accumulated across all k+1 polys and l levels before any inverse FFT
    (`fft_ops.rs:23-124` glwe_ggsw_mad / decomposed_polynomial_glev_mad /
    glwe_polynomial_mad).

    glwe:     u64 [..., k+1, N]
    ggsw_fft: freq [..., k+1, l, k+1, N/2] (batch dims broadcastable)
    returns:  freq [..., k+1, N/2]
    """
    kp1 = glwe_def.size + 1
    n2 = glwe_def.degree // 2
    # digits: [l, ..., k+1, N] (row-aligned: level j pairs with GLEV row j)
    digits = decompose(u64(glwe), radix)
    digit_fft = be.fwd_signed(digits)

    batch = jnp.broadcast_shapes(
        digit_fft.shape[1:-2] if hasattr(digit_fft, "shape") else (),
        ggsw_fft.shape[:-4] if hasattr(ggsw_fft, "shape") else (),
    )
    acc = be.zeros((*batch, kp1, n2))
    for i in range(kp1):  # GLWE poly index == GGSW row index
        for j in range(radix.count):  # decomposition level == GLEV row
            d = digit_fft[j, ..., i, None, :]  # [..., 1, N/2]
            g = ggsw_fft[..., i, j, :, :]  # [..., k+1, N/2]
            acc = be.cmadd(acc, d, g)
    return acc


def external_product(glwe, ggsw_fft, glwe_def, radix, be=C128) -> jnp.ndarray:
    """Coefficient-domain external product (one inverse FFT at the end)."""
    return be.inv(external_product_fft(glwe, ggsw_fft, glwe_def, radix, be))


def cmux(
    d0: jnp.ndarray,
    d1: jnp.ndarray,
    sel_ggsw_fft,
    glwe_def: GlweDef,
    radix: RadixDecomposition,
    be=C128,
) -> jnp.ndarray:
    """CMux: select d1 where the encrypted bit is 1, else d0:
    `out = d0 + sel ⊡ (d1 - d0)` (`fft_ops.rs:149-181`)."""
    diff = u64(d1) - u64(d0)
    prod = external_product(diff, sel_ggsw_fft, glwe_def, radix, be)
    return u64(d0) + prod


def glev_cmux(
    d0: jnp.ndarray,
    d1: jnp.ndarray,
    sel_ggsw_fft,
    glwe_def: GlweDef,
    ggsw_radix: RadixDecomposition,
    be=C128,
) -> jnp.ndarray:
    """CMux over each GLWE row of a GLEV (`fft_ops.rs:203-221`).

    d0/d1: u64 [..., l_glev, k+1, N]; sel may carry the same leading
    batch dims as d0/d1 (without the GLEV row axis), so each row is
    cmuxed explicitly rather than broadcast."""
    d0 = u64(d0)
    rows = [
        cmux(d0[..., r, :, :], u64(d1)[..., r, :, :], sel_ggsw_fft,
             glwe_def, ggsw_radix, be)
        for r in range(d0.shape[-3])
    ]
    return jnp.stack(rows, axis=-3)


def keyswitch_glwe_to_glwe(
    ct: jnp.ndarray,
    ksk_fft,
    glwe_def: GlweDef,
    radix: RadixDecomposition,
    be=C128,
) -> jnp.ndarray:
    """GLWE keyswitch: `out = trivial(b) - Σ_i <decomp(a_i), GLEV_i>`
    (`fft_ops.rs:457-495`).

    ct:      u64 [..., k+1, N] under the original key
    ksk_fft: freq [k, l, k+1, N/2] — row i = GLEV(orig_s_i) under new key
    """
    k = glwe_def.size
    kp1 = k + 1
    n2 = glwe_def.degree // 2
    ct = u64(ct)
    a, b = ct[..., :-1, :], ct[..., -1, :]
    digits = decompose(a, radix)  # [l, ..., k, N]
    digit_fft = be.fwd_signed(digits)
    acc = be.zeros((*ct.shape[:-2], kp1, n2))
    for i in range(k):
        for j in range(radix.count):
            d = digit_fft[j, ..., i, None, :]
            g = ksk_fft[i, j]  # [k+1, N/2]
            acc = be.cmadd(acc, d, g)
    a_sum = be.inv(acc)
    trivial_b = jnp.zeros_like(ct).at[..., -1, :].set(b)
    return trivial_b - a_sum


def scheme_switch_fft(
    glev: jnp.ndarray,
    ssk_fft,
    glwe_def: GlweDef,
    radix_ggsw: RadixDecomposition,
    radix_ss: RadixDecomposition,
    be=C128,
):
    """Convert GLEV(m) -> GGSW(m) in the frequency domain using a scheme
    switch key (WHS+24; `fft_ops.rs:403-442,245-279`).

    For output row j < k, level i:
      y_{i,j} = [mask position j := fft(b^{(i)})]       (encrypts -b·s_j)
                + Σ_r <decomp(a_r^{(i)}), SSK_glev[j,r]> (adds a_r·s_j·s_r)
    For row k, level i: y = fft(x_i).

    glev:    u64 [..., l_ggsw, k+1, N]
    ssk_fft: freq [k, k, l_ss, k+1, N/2], symmetric in first two axes
             (the reference stores only i<=j triangular pairs;
             `entities/scheme_switch_key.rs`, `iteration/triangular_pairs.rs`)
    returns: freq GGSW [..., k+1, l_ggsw, k+1, N/2]
    """
    k = glwe_def.size
    kp1 = k + 1
    n2 = glwe_def.degree // 2
    glev = u64(glev)
    l_ggsw = radix_ggsw.count

    a = glev[..., :-1, :]  # [..., l_ggsw, k, N]
    b = glev[..., -1, :]  # [..., l_ggsw, N]
    b_fft = be.fwd_torus(b)  # [..., l_ggsw, N/2]

    # decompose all mask polys once: [l_ss, ..., l_ggsw, k, N]
    digits = decompose(a, radix_ss)
    digit_fft = be.fwd_signed(digits)

    rows = []
    for j in range(k):
        acc = be.zeros((*glev.shape[:-2], kp1, n2))
        # mask position j := fft(b) (encrypts -b*s_j;
        # `update_encrypted_secret_key_component_fft`, fft_ops.rs:225-242)
        acc = _set_component(acc, j, b_fft, be)
        for r in range(k):
            for jj in range(radix_ss.count):
                d = digit_fft[jj, ..., :, r, None, :]  # [..., l_ggsw, 1, N/2]
                g = ssk_fft[j, r, jj]  # [k+1, N/2]
                acc = be.cmadd(acc, d, g)
        rows.append(acc)
    rows.append(be.fwd_torus(glev))  # row k: plain FFT of each x_i
    return be.stack(rows, axis=-4)


def _set_component(acc, idx: int, value, be):
    """Set component `idx` along the (k+1) axis of a zeroed freq GLWE."""
    if be.name == "c128":
        return acc.at[..., idx, :].set(value)
    return be.set_component(acc, idx, value)
