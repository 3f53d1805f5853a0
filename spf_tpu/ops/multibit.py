"""Multi-bit (grouped) blind rotation — g LWE key bits per step.

The standard blind rotation walks ONE key bit per step: n0 = 637
sequential external products at DEFAULT_128, each paying l*(k+1)
forward + (k+1) inverse FFTs — and the FFTs are ~75% of the step on
TPU (`ARCHITECTURE.md` roofline). Grouping g key bits per step divides
the transform count per key bit by g at the cost of combining
2^g - 1 pre-encrypted GGSW rows pointwise in the frequency domain.

For binary secrets the monomial factors over a group G = {j_0..j_{g-1}}
expands exactly (s^2 = s is never needed across distinct bits):

    X^{sum_{j in G} a_j s_j} = prod_j (1 + s_j (X^{a_j} - 1))
                             = 1 + sum_{S != {}} c_S * prod_{j in S} s_j
    c_S = prod_{j in S} (X^{a_j} - 1)

so with a multi-bit bootstrap key BSK[t, S] = GGSW(prod_{j in S} s_j)
(2^g - 1 rows per group, fresh encryptions) one step of the
phase-rotation loop (`phase_rot.py`) becomes

    acc += IFFT( sum_S c_S * MAD(FFT(decomp(acc)), BSK[t, S]) )

where every c_S is a pointwise product of the per-bit (phase - 1)
tables the single-bit loop already uses: (X^{a_j} - 1) is diagonal in
the twisted negacyclic frequency domain with diagonal exactly
`phase_minus_one(a_j)`. Subset phases build incrementally (c_{S+j} =
c_S * u_j), and the per-step work is

    l*(k+1) fwd + (k+1) inv FFTs   (unchanged — amortized over g bits)
    + (2^g - 1) MADs + (2^g - 1)*(k+1) pointwise phase applications

which at DEFAULT_128 (k=1, l=2) is minimized near g = 3.

Noise: variance per group grows by sum_S ||c_S||_2^2 = 3^g - 1 versus
2g for g single-bit steps (||X^a - 1||_2^2 = 2) — a factor ~4.3 at
g = 3, i.e. ~1.05 bits of extra std on the BSK term, well inside the
DEFAULT_128 budget (decrypt-verified on hardware at batch 256, and by
`tests/test_multibit.py` across all messages). The same technique (a
dedicated multi-bit BSK) ships in other TFHE implementations; the
reference evaluates strictly one bit per cmux
(`sunscreen_tfhe/src/ops/bootstrapping/programmable_bootstrapping.rs:385-409`)
because one 40 us cmux is already latency-optimal on a CPU core — on a
TPU the FFTs dominate throughput, inverting the trade.

The LWE dimension is padded to a multiple of g with zero key bits and
zero mask coefficients: a padded bit contributes c_S = 0 for every
subset containing it (phase(0) - 1 = 0), so the padding is exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..params import GlweDef, LweDef, RadixDecomposition
from . import fft_pallas as fp
from . import limb32 as lb
from .bootstrap_u32 import (
    U32,
    _fwd_ds_xla,
    _inv_ds_xla,
    _on_tpu,
    freq_mad,
    monomial_mul_u32,
    sample_extract_u32,
)
from .fft_ds32_t import _cadd, _cmul

# Fused Pallas MAD+Horner kernel (`mad_pallas.py`): measured FASTER on
# hardware at DEFAULT_128 (batch 128: 790 -> 850 PBS/s; batch 256:
# 1059 -> 1082 PBS/s, 256/256 correct, margins unchanged), so it is
# the DEFAULT on TPU wherever the tile shapes allow (K and B multiples
# of 128); SPF_MAD_PALLAS=0 disables, =1 forces the attempt. Read once
# at import so jit caches stay coherent per process.
import os as _os

_MAD_PALLAS_ENV = _os.environ.get("SPF_MAD_PALLAS", "")
_MAD_PALLAS = _MAD_PALLAS_ENV != "0"


def _mad_pallas_ok(dfft0) -> bool:
    k_, b = dfft0.shape[-2], dfft0.shape[-1]
    return _MAD_PALLAS and k_ % 128 == 0 and b % 128 == 0


def n_groups(n0: int, group: int) -> int:
    return -(-n0 // group)


def multibit_key_products_np(lwe_sk_np, group: int):
    """Subset products of key bits per group: u64 [n_groups, 2^g - 1],
    column m-1 = prod_{j: bit j of m} s[t*g + j]; key padded with zeros
    to a multiple of g."""
    sk = np.asarray(lwe_sk_np, dtype=np.uint64)
    ng = n_groups(len(sk), group)
    pad = ng * group - len(sk)
    if pad:
        sk = np.concatenate([sk, np.zeros(pad, np.uint64)])
    bits = sk.reshape(ng, group)
    out = np.ones((ng, (1 << group) - 1), dtype=np.uint64)
    for m in range(1, 1 << group):
        for j in range(group):
            if m & (1 << j):
                out[:, m - 1] *= bits[:, j]
    return out


def generate_multibit_bsk(key, lwe_sk, glwe_sk, glwe: GlweDef,
                          radix: RadixDecomposition, group: int) -> jnp.ndarray:
    """Multi-bit bootstrap key: u64
    [n_groups, 2^g - 1, (k+1), l, k+1, N] — GGSW(prod_{j in S} s_j) per
    group/subset (fresh encryptions, like the reference's per-bit BSK
    at `programmable_bootstrapping.rs:34-58`). u64 path (CPU keygen)."""
    from . import encryption as enc

    prods = multibit_key_products_np(np.asarray(lwe_sk), group)
    ng, ns = prods.shape
    keys = jax.random.split(key, ng * ns)
    rows = jax.jit(
        jax.vmap(
            lambda k, b: enc.encrypt_ggsw_scalar(k, b, glwe_sk, glwe, radix)
        )
    )(keys, jnp.asarray(prods.reshape(-1)))
    return rows.reshape(ng, ns, *rows.shape[1:])


def _subset_phases(u, group: int):
    """All 2^g - 1 subset phase products c_S from the per-bit tables
    u[j] (ds freq tuples [K, B]); index m-1 <-> bitmask m."""
    c = [None] * (1 << group)
    for m in range(1, 1 << group):
        low = m & (-m)
        j = low.bit_length() - 1
        rest = m ^ low
        c[m] = u[j] if rest == 0 else _cmul(c[rest], u[j])
    return c[1:]


def _nested_subset_sum(mads, u, group: int):
    """Horner-factored Σ_S (Π_{j in S} u_j) ⊙ mads[S - 1] over nonempty
    subsets S of {0..g-1}: the recursion

        R(j, base) = u_j ⊙ (M[base|2^j] + R(j+1, base|2^j)) + R(j+1, base)

    evaluates the sum with 2^g - 1 output-plane complex multiplies and
    ZERO explicit subset-phase products (`_subset_phases` spends
    2^g - 1 - g extra [K, B] multiplies building Π_{j in S} u_j up
    front — pure savings at g >= 2, growing with g)."""

    def rec(j, base):
        if j == group:
            return None
        with_j = base | (1 << j)
        inner = rec(j + 1, with_j)
        t = mads[with_j - 1] if inner is None else _cadd(mads[with_j - 1], inner)
        term = _cmul(t, u[j])
        rest = rec(j + 1, base)
        return term if rest is None else _cadd(term, rest)

    return rec(0, 0)


def blind_rotate_multibit_u32(
    lut_limb,
    ct_switched: jnp.ndarray,
    bsk_mb_freq,
    lwe: LweDef,
    glwe: GlweDef,
    radix: RadixDecomposition,
    group: int,
    use_pallas=None,
    unroll: int = 1,
):
    """Multi-bit phase-rotation blind rotation: lut limb pair
    [k+1, N, B] (broadcastable), ct u32 [n0+1, B] with phases < 2N,
    bsk_mb_freq components [n_groups, 2^g - 1, k+1, l, k+1, K]
    (frequency order of the chosen backend). `unroll` forwards to the
    group `fori_loop` (trades compile time for per-iteration loop
    overhead).
    """
    from . import phase_rot as pr
    from .rot_decomp_pallas import accumulate_decompose

    if use_pallas is None:
        use_pallas = _on_tpu()
    on_tpu = _on_tpu()
    n = glwe.degree
    a = ct_switched[:-1]  # [n0, B]
    b = ct_switched[-1]  # [B]
    bb = ct_switched.shape[-1]
    ng = bsk_mb_freq[0].shape[0]
    ns = (1 << group) - 1
    assert bsk_mb_freq[0].shape[1] == ns, (bsk_mb_freq[0].shape, group)
    pad = ng * group - a.shape[0]
    assert 0 <= pad < group, (ng, group, a.shape)
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad, bb), a.dtype)], axis=0)

    shape = (glwe.size + 1, n, bb)
    lut_b = (jnp.broadcast_to(lut_limb[0], shape), jnp.broadcast_to(lut_limb[1], shape))
    acc = monomial_mul_u32(lut_b, U32(2 * n) - b)

    # per-bit (phase - 1) outer-product factors for ALL bits, hoisted:
    # [ng, g, ~sqrt(K), B] (see `phase_rot.phase_factors_all`), pinned
    # behind an optimization fence — XLA's while-loop rematerialization
    # otherwise recomputes the doubling chain inside every loop
    # iteration (+250 us/group measured; `phase_rot.fence`)
    ph_lo, ph_hi = pr.phase_factors_all(a, n, use_pallas)
    ph_lo = tuple(pr.fence(c.reshape(ng, group, *c.shape[1:])) for c in ph_lo)
    ph_hi = tuple(pr.fence(c.reshape(ng, group, *c.shape[1:])) for c in ph_hi)

    def body(t, carry):
        acc, prod = carry
        if on_tpu:
            digits_f, acc = accumulate_decompose(acc, prod, radix)
        else:
            acc = lb.add(acc, lb.from_ds(*prod))
            digits_f = lb.decompose(acc, radix).astype(jnp.float32)
        dfft = (
            fp.fwd_ds(digits_f, jnp.zeros_like(digits_f))
            if use_pallas
            else _fwd_ds_xla(digits_f, jnp.zeros_like(digits_f))
        )
        lo_t = tuple(c[t] for c in ph_lo)  # [g, Klo, B]
        hi_t = tuple(c[t] for c in ph_hi)  # [g, Khi, B]
        u = [
            pr.combine_phase_minus_one(
                tuple(c[j] for c in lo_t), tuple(c[j] for c in hi_t)
            )
            for j in range(group)
        ]
        row = tuple(c[t] for c in bsk_mb_freq)  # [ns, k+1, l, k+1, K]
        if on_tpu:
            if _mad_pallas_ok(dfft[0]):
                # fused VMEM-resident MAD + Horner subset phases
                # (`mad_pallas.py`): avoids materializing the 2^g - 1
                # MAD outputs to HBM between the two stages
                from .mad_pallas import mad_horner_fused

                u_stacked = tuple(
                    jnp.stack([u[j][c] for j in range(group)])
                    for c in range(4)
                )
                prod_f = mad_horner_fused(dfft, row, u_stacked, group)
            else:
                # MAD per subset, phases Horner-factored over the
                # (k+1)-plane MAD outputs (`_nested_subset_sum`) —
                # measured FASTER than combining the GGSWs first
                # (G_eff = sum_S c_S*BSK_S then one MAD is flop-minimal
                # on paper but materializes a [k+1,l,k+1,K,B] operand:
                # 878 -> 779 PBS/s at g=3, B=256). Output-side phase is
                # safe on TPU, which performs no FP contraction (see
                # the note in `bootstrap_u32.blind_rotate_u32`).
                mads = [
                    freq_mad(dfft, tuple(c[m] for c in row), glwe, radix)
                    for m in range(ns)
                ]
                prod_f = _nested_subset_sum(mads, u, group)
        else:
            # XLA:CPU contracts a*b-p into fma inside the MAD-output
            # fusion context, collapsing the ds error-free
            # transforms — apply the phase to the digit spectra
            cs = _subset_phases(u, group)
            prod_f = None
            for m in range(ns):
                bsk_s = tuple(c[m] for c in row)
                term = freq_mad(_cmul(dfft, cs[m]), bsk_s, glwe, radix)
                prod_f = term if prod_f is None else _cadd(prod_f, term)
        prod = fp.inv_ds(prod_f) if use_pallas else _inv_ds_xla(prod_f)
        return acc, prod

    zero_prod = (
        jnp.zeros_like(acc[0], dtype=jnp.float32),
        jnp.zeros_like(acc[0], dtype=jnp.float32),
    )
    acc, prod = jax.lax.fori_loop(
        0, ng, body, (acc, zero_prod), unroll=unroll
    )
    return lb.add(acc, lb.from_ds(*prod))


def programmable_bootstrap_multibit_u32(
    ct,
    lut_limb,
    bsk_mb_freq,
    lwe: LweDef,
    glwe: GlweDef,
    radix: RadixDecomposition,
    group: int,
    use_pallas=None,
    unroll: int = 1,
):
    """Univariate multi-bit PBS: LWE limb pair [n0+1, B] -> LWE limb
    pair [k*N+1, B] (≙ `bootstrap_u32.programmable_bootstrap_u32`)."""
    two_n = glwe.log_degree + 1
    ct_sw = lb.modulus_switch(ct, 0, 0, two_n)
    lut_t = tuple(c[..., None] for c in lut_limb)
    rotated = blind_rotate_multibit_u32(
        lut_t, ct_sw, bsk_mb_freq, lwe, glwe, radix, group, use_pallas,
        unroll=unroll,
    )
    return sample_extract_u32(rotated, 0, glwe)
