"""Batched programmable bootstrap on u32-limb torus arrays (x64-free).

This is the TPU production pipeline: the same coefficient-major
("t") layout as `bootstrap_tpu.py` (coefficient axis second-to-last,
ciphertext batch last, on vector lanes) but with every u64 torus tensor
carried as a (hi, lo) u32 limb pair (`limb32.py`) so the whole graph
compiles WITHOUT jax x64 mode — the precondition for Mosaic, which has
no 64-bit ints.  FFTs use the scrambled-frequency ds32 kernels
(`fft_pallas.py`): DIF forward / DIT inverse with no bit-reversal, all
stages VMEM-resident on TPU (pure-jnp twins elsewhere).  Frequency-
domain data (BSK rows, accumulators) is order-scrambled consistently,
which is invisible to the pointwise MAD arithmetic.

Semantics match `bootstrap.py`/`bootstrap_tpu.py` at decrypt level
(tested on CPU against the u64 path); ≙ reference
`sunscreen_tfhe/src/ops/bootstrapping/programmable_bootstrapping.rs`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params import GlweDef, LweDef, RadixDecomposition
from . import fft_ds32_t as ft
from . import fft_pallas as fp
from . import limb32 as lb
from .fft_ds32_t import _cadd, _cmul, zeros_t

U32 = lb.U32


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


# Concat-free list-form FFT cores: bitwise-identical values, but measured
# SLOWER on TPU than the reshaping cores (XLA:TPU schedules the 64-array
# stacking poorly) — kept for A/B testing via env toggle.
import os as _os

_USE_LIST_CORES = _os.environ.get("SPF_TPU_LIST_FFT", "0") == "1"


# Frequency-domain ORDER depends on the backend: the Pallas kernels use
# the scrambled (DIF-output) order, the XLA path natural order via the
# `fft_ds32_t` core. Either is fine — pointwise arithmetic only needs
# producers and consumers (keys AND data) converted by the same backend.
# (The jnp "ref twins" in fft_pallas are NOT used on any compute path:
# they exist to validate the kernels — XLA:CPU executes their
# scrambled-order graphs pathologically slowly, ~20k unfused ops.)


def _fwd_ds_xla(hi, lo):
    """Scrambled-frequency (take-free DIF) forward: the output bin order
    is `ft.dif_freq_order(K)`. The digit-reversal gather it avoids cost
    ~170 us per forward call at DEFAULT_128 B=256 — more than half the
    transform. On TPU the concat-free list core removes the big-stage
    materializations too; XLA:CPU executes list-form graphs
    pathologically slowly, so CPU keeps the reshaping core (bitwise
    identical values — tested)."""
    n = hi.shape[-2]
    k = n // 2
    twist, _ = ft._twist_tables_t(n)
    z = (hi[..., :k, :], lo[..., :k, :], hi[..., k:, :], lo[..., k:, :])
    z = _cmul(z, twist)
    if _on_tpu() and _USE_LIST_CORES:
        return ft._fft_core_t_list(z)
    return ft._fft_core_t(z, inverse=False, take_out=False)


def _inv_ds_xla(f):
    """Inverse of `_fwd_ds_xla`: DIT core consuming the scrambled order,
    emitting natural coefficient order (no gather either way)."""
    _, untwist = ft._twist_tables_t(f[0].shape[-2] * 2)
    core = (
        ft._ifft_core_t_list
        if (_on_tpu() and _USE_LIST_CORES)
        else ft._ifft_core_t_dit
    )
    z = _cmul(core(f), untwist)
    hi = jnp.concatenate([z[0], z[2]], axis=-2)
    lo = jnp.concatenate([z[1], z[3]], axis=-2)
    return hi, lo


def fwd_limb(a, use_pallas=None):
    """Limb pair [..., N, B] -> freq tuple of 4 f32 [..., N/2, B]
    (backend-dependent frequency order; see note above)."""
    hi, lo = lb.to_ds(a)
    if use_pallas is None:
        use_pallas = _on_tpu()
    return fp.fwd_ds(hi, lo) if use_pallas else _fwd_ds_xla(hi, lo)


def fwd_signed(digits, use_pallas=None):
    """i32 digit tensor [..., N, B] -> freq tuple (digits are < 2^16 in
    magnitude: a single exact f32)."""
    hi = digits.astype(jnp.float32)
    lo = jnp.zeros_like(hi)
    if use_pallas is None:
        use_pallas = _on_tpu()
    return fp.fwd_ds(hi, lo) if use_pallas else _fwd_ds_xla(hi, lo)


def inv_limb(f, use_pallas=None):
    """Freq tuple [..., K, B] -> limb pair [..., N, B] with round +
    mod q."""
    if use_pallas is None:
        use_pallas = _on_tpu()
    hi, lo = fp.inv_ds(f) if use_pallas else _inv_ds_xla(f)
    return lb.from_ds(hi, lo)


def bsk_to_freq_u32(coeff_np, use_pallas=False):
    """Host-side: any coefficient-domain u64 key array [..., N] ->
    freq tuple [..., N/2] in the order of the chosen backend (broadcast
    over batch lanes at use sites). Used for BSK, automorphism and
    scheme-switch keys alike.

    The polynomials are repacked onto the LANE axis ([N, P] with all
    leading dims flattened to P, padded to a multiple of 128) — the
    naive [..., N, 1] singleton-lane conversion OOMed HBM at
    DEFAULT_128 key sizes."""
    import numpy as np

    coeff_np = np.asarray(coeff_np)
    shp = coeff_np.shape
    n = shp[-1]
    p = int(np.prod(shp[:-1]))
    x = np.ascontiguousarray(coeff_np.reshape(p, n).T)  # [N, P]
    pad = (-p) % 128
    if pad:
        x = np.concatenate([x, np.zeros((n, pad), x.dtype)], axis=1)
    limbs = lb.from_u64_np(x)
    f = jax.jit(lambda a: fwd_limb(a, use_pallas=use_pallas))(limbs)
    f = tuple(np.asarray(jax.device_get(c))[:, :p] for c in f)  # [K, P]
    return tuple(
        jnp.asarray(np.ascontiguousarray(c.T).reshape(*shp[:-1], n // 2))
        for c in f
    )


def monomial_mul_u32(a, t: jnp.ndarray):
    """a limb pair [..., N, B] times X^t, per-batch u32 t [B] < 2N
    (negacyclic; bit-selected static rolls like
    `bootstrap_tpu.monomial_mul_t`)."""
    n = a[0].shape[-2]
    out = a
    for i in range(n.bit_length() - 1):
        s = 1 << i
        rolled = (jnp.roll(out[0], s, axis=-2), jnp.roll(out[1], s, axis=-2))
        sign_mask = (jnp.arange(n) < s)[:, None]
        rolled = lb.where(sign_mask, lb.neg(rolled), rolled)
        bit = ((t >> U32(i)) & U32(1)) > 0  # [B]
        out = lb.where(bit, rolled, out)
    bit_n = ((t >> U32(n.bit_length() - 1)) & U32(1)) > 0
    return lb.where(bit_n, lb.neg(out), out)


def freq_mad(dfft, ggsw_freq_row, glwe_def: GlweDef, radix: RadixDecomposition):
    """Frequency-domain MAD: digit spectra [l, k+1, K, B] x GGSW row
    (components [k+1, l, k+1, K] or batched [k+1, l, k+1, K, B]) ->
    freq tuple [k+1, K, B]."""
    kp1 = glwe_def.size + 1
    k2 = glwe_def.degree // 2
    bb = dfft[0].shape[-1]
    acc = zeros_t((kp1, k2, bb))
    batched_sel = ggsw_freq_row[0].ndim == 5
    for i in range(kp1):
        for j in range(radix.count):
            d = tuple(c[j, i, None, :, :] for c in dfft)  # [1, K, B]
            if batched_sel:
                g = tuple(c[i, j] for c in ggsw_freq_row)  # [k+1, K, B]
            else:
                g = tuple(c[i, j, :, :, None] for c in ggsw_freq_row)  # [k+1, K, 1]
            acc = _cadd(acc, _cmul(d, g))
    return acc


def external_product_u32(
    glwe, ggsw_freq_row, glwe_def: GlweDef, radix: RadixDecomposition, use_pallas=None
):
    """glwe limb pair [k+1, N, B] ⊡ GGSW freq row -> freq tuple
    [k+1, K, B]."""
    digits = lb.decompose(glwe, radix)  # i32 [l, k+1, N, B]
    dfft = fwd_signed(digits, use_pallas)  # tuple [l, k+1, K, B]
    return freq_mad(dfft, ggsw_freq_row, glwe_def, radix)


def cmux_u32(d0, d1, ggsw_freq_row, glwe_def, radix, use_pallas=None):
    diff = lb.sub(d1, d0)
    prod = inv_limb(
        external_product_u32(diff, ggsw_freq_row, glwe_def, radix, use_pallas),
        use_pallas,
    )
    return lb.add(d0, prod)


def blind_rotate_u32(
    lut_limb,
    ct_switched: jnp.ndarray,
    bsk_freq,
    lwe: LweDef,
    glwe: GlweDef,
    radix: RadixDecomposition,
    use_pallas=None,
    fuse_rot=False,
    phase_rot=False,
):
    """lut limb pair [k+1, N, B] (broadcastable), ct u32 [n0+1, B] with
    phases < 2N.

    `fuse_rot=True` computes each step's rotation+subtract+decomposition
    in one VMEM-resident Pallas kernel (`rot_decomp_pallas`) — the
    separate XLA ops are HBM-bound and dominate the step.

    `phase_rot=True` eliminates the per-step coefficient-domain rotation
    entirely: the accumulator itself is decomposed (decomposition
    commutes with monomial multiplication) and the rotation becomes one
    pointwise (phase - 1) multiply of the MAD output in the frequency
    domain — see `phase_rot.py`. This is the fastest TPU path."""
    a = ct_switched[:-1]  # [n0, B]
    b = ct_switched[-1]  # [B]
    bb = ct_switched.shape[-1]
    n = glwe.degree
    shape = (glwe.size + 1, n, bb)
    lut_b = (jnp.broadcast_to(lut_limb[0], shape), jnp.broadcast_to(lut_limb[1], shape))
    acc = monomial_mul_u32(lut_b, U32(2 * glwe.degree) - b)

    if phase_rot:
        from . import phase_rot as pr
        from .rot_decomp_pallas import accumulate_decompose

        if use_pallas is None:
            use_pallas = _on_tpu()
        on_tpu = _on_tpu()
        # The outer-product FACTORS of all (phase(a_i) - 1) tables are
        # generated up front in one vectorized pass over the step axis
        # (two [n0, ~sqrt(K), B] half-tables, ~16x smaller than the full
        # [n0, K, B] table — which was measured SLOWER than in-loop
        # generation at 2.7 GB of HBM + transpose). In-loop, each step
        # combines its factors with ONE broadcast complex multiply
        # (~one poly-mul) instead of the serial doubling (~90 us).
        # The fence pins them materialized: XLA's while-loop remat
        # otherwise recomputes the doubling per step (`phase_rot.fence`).
        ph_lo, ph_hi = pr.phase_factors_all(a, n, use_pallas)
        ph_lo = tuple(pr.fence(c) for c in ph_lo)
        ph_hi = tuple(pr.fence(c) for c in ph_hi)

        def body(i, carry):
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
            # The (phase - 1) rotation factor is constant across GGSW
            # rows, so on TPU it multiplies the MAD *output* (k+1 = 2
            # cmul planes instead of l*(k+1) = 4 on the digit spectra).
            # On XLA:CPU that fusion context collapses the ds error-free
            # transforms (measured 2^-23 rel error, even behind an
            # optimization_barrier — CPU contracts a*b-p into fma), so
            # CPU applies it to the digit spectra before the MAD; the
            # TPU backend performs no FP contraction (probed: a*b-p is
            # exactly 0 on-device), making the output-side application
            # numerically identical.
            pm1 = pr.combine_phase_minus_one(
                tuple(c[i] for c in ph_lo), tuple(c[i] for c in ph_hi)
            )
            if not on_tpu:
                dfft = _cmul(dfft, pm1)
            prod_f = freq_mad(dfft, tuple(c[i] for c in bsk_freq), glwe, radix)
            if on_tpu:
                prod_f = _cmul(prod_f, pm1)
            prod = fp.inv_ds(prod_f) if use_pallas else _inv_ds_xla(prod_f)
            return acc, prod

        zero_prod = (
            jnp.zeros_like(acc[0], dtype=jnp.float32),
            jnp.zeros_like(acc[0], dtype=jnp.float32),
        )
        acc, prod = jax.lax.fori_loop(0, lwe.dim, body, (acc, zero_prod))
        return lb.add(acc, lb.from_ds(*prod))

    if fuse_rot:
        # Deferred-accumulate loop: the fused Pallas kernel folds the
        # PREVIOUS step's inverse-FFT output (still a ds f32 pair) into
        # the accumulator before rotating/decomposing, so the standalone
        # from_ds + limb-add XLA pass disappears from the step.
        from .rot_decomp_pallas import rotate_sub_decompose_acc

        def body(i, carry):
            acc, prod = carry
            digits_f, acc = rotate_sub_decompose_acc(acc, prod, a[i], radix)
            dfft = (
                fp.fwd_ds(digits_f, jnp.zeros_like(digits_f))
                if use_pallas
                else _fwd_ds_xla(digits_f, jnp.zeros_like(digits_f))
            )
            prod_f = freq_mad(dfft, tuple(c[i] for c in bsk_freq), glwe, radix)
            prod = fp.inv_ds(prod_f) if use_pallas else _inv_ds_xla(prod_f)
            return acc, prod

        zero_prod = (
            jnp.zeros_like(acc[0], dtype=jnp.float32),
            jnp.zeros_like(acc[0], dtype=jnp.float32),
        )
        acc, prod = jax.lax.fori_loop(0, lwe.dim, body, (acc, zero_prod))
        return lb.add(acc, lb.from_ds(*prod))

    def body(i, acc):
        rotated = monomial_mul_u32(acc, a[i])
        row = tuple(c[i] for c in bsk_freq)
        return cmux_u32(acc, rotated, row, glwe, radix, use_pallas)

    return jax.lax.fori_loop(0, lwe.dim, body, acc)


def sample_extract_u32(glwe_t, h: int, glwe: GlweDef):
    """limb pair [k+1, N, B] -> LWE limb pair [k*N+1, B] extracting
    coefficient h (≙ `bootstrap_tpu.sample_extract_t`)."""
    import numpy as np

    n = glwe.degree
    a = (glwe_t[0][:-1], glwe_t[1][:-1])  # [k, N, B]
    b = (glwe_t[0][-1], glwe_t[1][-1])  # [N, B]
    j = np.arange(n)
    idx = jnp.asarray(((h - j) % n).astype(np.int32))
    neg_mask = jnp.asarray(j > h)[:, None]
    gathered = (jnp.take(a[0], idx, axis=-2), jnp.take(a[1], idx, axis=-2))
    a_lwe = lb.where(neg_mask, lb.neg(gathered), gathered)
    a_flat = tuple(c.reshape(glwe.size * n, -1) for c in a_lwe)
    return (
        jnp.concatenate([a_flat[0], b[0][h][None, :]], axis=0),
        jnp.concatenate([a_flat[1], b[1][h][None, :]], axis=0),
    )


def lwe_modulus_switch_u32(ct, log_chi: int, log_v: int, log_modulus: int):
    return lb.modulus_switch(ct, log_chi, log_v, log_modulus)


def programmable_bootstrap_u32(
    ct,
    lut_limb,
    bsk_freq,
    lwe: LweDef,
    glwe: GlweDef,
    radix: RadixDecomposition,
    use_pallas=None,
    fuse_rot=False,
    phase_rot=False,
):
    """Univariate PBS: LWE limb pair [n0+1, B] -> LWE limb pair
    [k*N+1, B] under the flattened GLWE key. `lut_limb` is the standard
    [k+1, N] LUT as a limb pair."""
    two_n = glwe.log_degree + 1
    ct_sw = lb.modulus_switch(ct, 0, 0, two_n)
    lut_t = tuple(c[..., None] for c in lut_limb)
    rotated = blind_rotate_u32(
        lut_t, ct_sw, bsk_freq, lwe, glwe, radix, use_pallas, fuse_rot, phase_rot
    )
    return sample_extract_u32(rotated, 0, glwe)
