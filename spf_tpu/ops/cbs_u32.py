"""Circuit bootstrapping on u32-limb torus arrays, scan-structured for
TPU compile time (the x64-free production CBS).

Semantics ≙ `cbs.py` (WHS+24, reference `sunscreen_tfhe/src/ops/
bootstrapping/circuit_bootstrapping.rs:342-484`), but:

- every u64 torus tensor is a (hi, lo) u32 limb pair (`limb32.py`) so
  the graph compiles without jax x64 mode (the Mosaic precondition);
- the 11 homomorphic-trace rounds and the ℓ_cbs levels run under
  `jax.lax.scan` over *stacked* permutation tables / key rows instead
  of being unrolled — the unrolled form's ℓ·log2(N) = 44 GLWE
  keyswitches exploded the HLO and took >30 min to compile at
  DEFAULT_128 (see `bootstrap_tpu.circuit_bootstrap_t`); the scanned
  form traces ONE keyswitch body per call site.

Layouts are coefficient-major ("t"): coefficient axis second-to-last,
ciphertext batch last (lanes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params import GlweDef, Params, RadixDecomposition
from . import limb32 as lb
from .bootstrap_u32 import (
    blind_rotate_u32,
    fwd_limb,
    fwd_signed,
    inv_limb,
)
from .fft_ds32_t import _cadd, _cmul, zeros_t

U32 = lb.U32
I32 = lb.I32


def _log_v(count: int) -> int:
    return (count - 1).bit_length()


def multifunctional_cbs_lut_np(glwe: GlweDef, cbs_radix: RadixDecomposition):
    """Numpy (host-side) multi-function decomposition LUT
    (≙ `cbs.multifunctional_cbs_lut`, reference
    `circuit_bootstrapping.rs:431-484`): usable from x32 processes."""
    n = glwe.degree
    count = cbs_radix.count
    assert count < 16
    v = 1 << _log_v(count)

    levels = np.zeros(16, dtype=np.uint64)
    for i in range(1, 17):
        pb = cbs_radix.radix_log * i + 1
        if pb < 64:
            minus_one = (1 << pb) - 1
            levels[i - 1] = np.uint64(minus_one) << np.uint64(64 - pb)

    b = np.zeros(n, dtype=np.uint64)
    for i in range(n):
        fn_id = i % v
        if fn_id < count:
            b[i] = levels[fn_id]

    lut = np.zeros((glwe.size + 1, n), dtype=np.uint64)
    lut[-1] = b
    return lut


# --------------------------------------------------------------------------
# GLWE keyswitch + trace (scan over automorphism rounds)
# --------------------------------------------------------------------------


def keyswitch_glwe_u32(ct, ksk_freq_row, glwe: GlweDef, radix: RadixDecomposition,
                       use_pallas=None):
    """GLWE keyswitch: ct limb pair [k+1, N, B], ksk freq components
    [k, l, k+1, K] -> limb pair [k+1, N, B]
    (≙ `bootstrap_tpu.keyswitch_glwe_t` / `fft_ops.keyswitch_glwe_to_glwe`)."""
    k = glwe.size
    a = (ct[0][:-1], ct[1][:-1])
    b = (ct[0][-1], ct[1][-1])
    digits = lb.decompose(a, radix)  # i32 [l, k, N, B]
    dfft = fwd_signed(digits, use_pallas)
    acc = zeros_t((k + 1, glwe.degree // 2, ct[0].shape[-1]))
    for i in range(k):
        for j in range(radix.count):
            d = tuple(c[j, i, None, :, :] for c in dfft)  # [1, K, B]
            g = tuple(c[i, j][..., None] for c in ksk_freq_row)  # [k+1, K, 1]
            acc = _cadd(acc, _cmul(d, g))
    a_sum = inv_limb(acc, use_pallas)  # [k+1, N, B]
    out = lb.neg(a_sum)
    row = lb.add((out[0][-1], out[1][-1]), b)
    return (out[0].at[-1].set(row[0]), out[1].at[-1].set(row[1]))


@functools.lru_cache(maxsize=8)
def _trace_tables(n: int):
    """Stacked per-round pow_k permutation tables for the trace: for
    round r (1-based), k_exp = N/2^(r-1) + 1; src[r, d] is the source
    coefficient landing at position d and neg[r, d] its negacyclic sign
    (≙ `bootstrap_tpu.pow_k_t`, `ops/automorphisms/mod.rs:53-85`)."""
    rounds = int(np.log2(n))
    src = np.zeros((rounds, n), dtype=np.int32)
    neg = np.zeros((rounds, n), dtype=bool)
    i = np.arange(n)
    for r in range(1, rounds + 1):
        k_exp = n // (1 << (r - 1)) + 1
        dest = (i * k_exp) % n
        sign_neg = ((i * k_exp) // n) % 2 == 1
        src[r - 1, dest] = i
        neg[r - 1, dest] = sign_neg
    # numpy (not jnp): jnp constants created inside a jit trace become
    # tracers, and caching tracers across traces leaks them
    return src, neg


def trace_u32(ct, auto_keys_freq, glwe: GlweDef, radix: RadixDecomposition,
              use_pallas=None):
    """Homomorphic trace: log2(N) rounds of (X -> X^k permutation, GLWE
    keyswitch, add), scanned over stacked tables + key rows
    (≙ `automorphism.trace`; auto_keys_freq components
    [log2 N, k, l, k+1, K])."""
    src, neg = (jnp.asarray(t) for t in _trace_tables(glwe.degree))

    def body(carry, xs):
        src_r, neg_r, key_row = xs
        mapped = (
            jnp.take(carry[0], src_r, axis=-2),
            jnp.take(carry[1], src_r, axis=-2),
        )
        mapped = lb.where(neg_r[:, None], lb.neg(mapped), mapped)
        ks = keyswitch_glwe_u32(mapped, key_row, glwe, radix, use_pallas)
        return lb.add(carry, ks), None

    out, _ = jax.lax.scan(body, ct, (src, neg, auto_keys_freq))
    return out


# --------------------------------------------------------------------------
# scheme switch (GLEV -> GGSW, frequency domain)
# --------------------------------------------------------------------------


def scheme_switch_u32(glev, ssk_freq, glwe: GlweDef,
                      radix_ggsw: RadixDecomposition,
                      radix_ss: RadixDecomposition, use_pallas=None):
    """GLEV limb pair [l_ggsw, k+1, N, B] -> GGSW freq tuple
    [k+1, l_ggsw, k+1, K, B] (≙ `bootstrap_tpu.scheme_switch_t` /
    `fft_ops.scheme_switch_fft`)."""
    k = glwe.size
    kp1 = k + 1
    k2 = glwe.degree // 2
    bb = glev[0].shape[-1]
    l_ggsw = radix_ggsw.count
    a = (glev[0][:, :-1], glev[1][:, :-1])  # [l, k, N, B]
    b = (glev[0][:, -1], glev[1][:, -1])  # [l, N, B]
    b_fft = fwd_limb(b, use_pallas)  # [l, K, B]
    digits = lb.decompose(a, radix_ss)  # [l_ss, l, k, N, B]
    dfft = fwd_signed(digits, use_pallas)
    rows = []
    for j in range(k):
        acc = list(zeros_t((l_ggsw, kp1, k2, bb)))
        for c in range(4):
            acc[c] = acc[c].at[:, j].set(b_fft[c])
        acc = tuple(acc)
        for r in range(k):
            for jj in range(radix_ss.count):
                d = tuple(c[jj, :, r, None, :, :] for c in dfft)  # [l,1,K,B]
                g = tuple(c[j, r, jj][..., None] for c in ssk_freq)  # [k+1,K,1]
                acc = _cadd(acc, _cmul(d, g))
        rows.append(acc)
    rows.append(fwd_limb(glev, use_pallas))  # row k: GLEV(m) itself
    return tuple(
        jnp.stack([rows[r][c] for r in range(kp1)], axis=0) for c in range(4)
    )


# --------------------------------------------------------------------------
# full circuit bootstrap (scan over decomposition levels)
# --------------------------------------------------------------------------


def circuit_bootstrap_u32(ct, bsk_freq, auto_keys_freq, ssk_freq,
                          params: Params, use_pallas=None, phase_rot=False):
    """Full WHS+24 circuit bootstrap: L0 LWE limb pair [n0+1, B] ->
    L1 GGSW freq tuple [k+1, l_cbs, k+1, K, B]
    (≙ `cbs.circuit_bootstrap`, `circuit_bootstrapping.rs:342-385`).

    Key-shape precedence: a 6-dim `bsk_freq` is a multi-bit bootstrap
    key and selects the grouped blind rotation, in which case
    `phase_rot` is IGNORED (the multi-bit path always rotates in the
    frequency domain). `phase_rot` only applies to a 5-dim single-bit
    key."""
    if bsk_freq[0].ndim == 6 and phase_rot:
        import warnings

        warnings.warn(
            "circuit_bootstrap_u32: phase_rot ignored — multi-bit bsk"
            " detected (6-dim key), which always uses the frequency-"
            "domain rotation path",
            stacklevel=2,
        )
    p = params
    glwe = p.l1_params
    cbs_radix = p.cbs_radix
    n = glwe.degree
    two_n = glwe.log_degree + 1

    # 1. rotate input by q/4 (0 -> q/4, 1 -> 3q/4) then multi-function PBS
    e_hi, e_lo = lb.encode_const(1, 2)
    b_row = lb.add_small((ct[0][-1], ct[1][-1]), e_hi, e_lo)
    ct_rot = (ct[0].at[-1].set(b_row[0]), ct[1].at[-1].set(b_row[1]))
    lut = lb.from_u64_np(multifunctional_cbs_lut_np(glwe, cbs_radix))
    ct_sw = lb.modulus_switch(ct_rot, 0, _log_v(cbs_radix.count), two_n)
    lut_t = tuple(c[..., None] for c in lut)
    if bsk_freq[0].ndim == 6:
        # multi-bit bootstrap key [n_groups, 2^g - 1, k+1, l, k+1, K]:
        # group size inferred from the subset axis (`multibit.py`) — the
        # blind rotation inside CBS is the same hot loop as bare PBS and
        # amortizes its FFTs over g key bits per step
        from .multibit import blind_rotate_multibit_u32

        ns = bsk_freq[0].shape[1]
        group = (ns + 1).bit_length() - 1
        assert (1 << group) - 1 == ns, bsk_freq[0].shape
        lo_noise = blind_rotate_multibit_u32(
            lut_t, ct_sw, bsk_freq, p.l0_params, glwe,
            p.cbs_pbs_radix_eff, group,
            use_pallas,
        )
    else:
        lo_noise = blind_rotate_u32(
            lut_t, ct_sw, bsk_freq, p.l0_params, glwe,
            p.cbs_pbs_radix_eff, use_pallas,
            phase_rot=phase_rot,
        )

    # 2. per level i: un-rotate the functional-bootstrap offset at
    # coefficient i, multiply by X^{-i}, shr-round by log2 N (· N^{-1}),
    # trace — scanned with stacked per-level offsets
    offs = np.zeros((cbs_radix.count, 2), dtype=np.uint32)
    for i in range(cbs_radix.count):
        pb = cbs_radix.radix_log * (i + 1) + 1
        oh, ol = lb.encode_const(1, pb)
        offs[i] = (oh, ol)
    offs = jnp.asarray(offs)
    coeff = jnp.arange(n, dtype=jnp.int32)

    def body(carry, xs):
        off, i = xs
        onehot = (coeff == i).astype(U32)[:, None]  # [N, 1]
        add = (onehot * off[0], onehot * off[1])
        b_r = lb.add((carry[0][-1], carry[1][-1]), add)
        rotated = (carry[0].at[-1].set(b_r[0]), carry[1].at[-1].set(b_r[1]))
        from .bootstrap_u32 import monomial_mul_u32

        t = (U32(2 * n) - i.astype(U32))[None]  # [1], broadcasts over B
        permuted = monomial_mul_u32(rotated, t)
        shifted = lb.shr_round(permuted, glwe.log_degree)
        row = trace_u32(shifted, auto_keys_freq, glwe, p.tr_radix, use_pallas)
        return rotated, row

    _, rows = jax.lax.scan(
        body, lo_noise, (offs, jnp.arange(cbs_radix.count, dtype=jnp.int32))
    )
    glev = rows  # limb pair [l, k+1, N, B]

    # 3. scheme switch GLEV -> GGSW (frequency domain)
    return scheme_switch_u32(glev, ssk_freq, glwe, cbs_radix, p.ss_radix,
                             use_pallas)
