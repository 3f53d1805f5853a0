"""Circuit bootstrapping: LWE(bit) -> GGSW(bit) in the frequency domain.

Default variant is WHS+24 ("Circuit Bootstrapping: Faster and Smaller"):
one multi-functional PBS emits all `l` gadget decompositions into the
first `l` coefficients of a GLWE, then per level: rotate, mod-switch
(multiply by N^-1), homomorphic trace, and finally a scheme switch
(≙ reference `sunscreen_tfhe/src/ops/bootstrapping/circuit_bootstrapping.rs:
342-484`, helpers `:224-298`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..params import GlweDef, LweDef, Params, RadixDecomposition
from .automorphism import trace
from .bootstrap import generalized_programmable_bootstrap
from .ciphertext import glwe_mod_switch_and_expand_pow_2, lwe_rotate
from .fft import C128
from .fft_ops import scheme_switch_fft
from .poly import monomial_mul
from .torus import encode, u64


def _log_v(count: int) -> int:
    return (count - 1).bit_length()


def multifunctional_cbs_lut(glwe: GlweDef, cbs_radix: RadixDecomposition) -> jnp.ndarray:
    """The multi-function decomposition LUT (`circuit_bootstrapping.rs:
    431-484` fill_multifunctional_cbs_decomposition_lut): a trivial GLWE
    whose B coefficients alternate the per-level encodings of -1 in
    T_{B^(i+1)+1} (padded with zeros to a power of two); the negacyclic
    property maps lookups < q/2 to -1 and >= q/2 to +1."""
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
    return jnp.asarray(lut)


def hi_noise_lwe_to_lo_noise_glwe(
    ct: jnp.ndarray,
    bsk_fft,
    lwe: LweDef,
    glwe: GlweDef,
    pbs_radix: RadixDecomposition,
    cbs_radix: RadixDecomposition,
    be=C128,
) -> jnp.ndarray:
    """Rotate the input by q/4 (0 -> q/4, 1 -> 3q/4) and run the
    multi-function PBS; output GLWE coefficient i < l holds
    encode(±1, radix_log*(i+1)+1) (`circuit_bootstrapping.rs:387-429`)."""
    rotated = lwe_rotate(u64(ct), encode(1, 2))
    lut = multifunctional_cbs_lut(glwe, cbs_radix)
    return generalized_programmable_bootstrap(
        rotated, lut, bsk_fft, lwe, glwe, pbs_radix,
        log_chi=0, log_v=_log_v(cbs_radix.count), be=be,
    )


def mod_switch_trace_and_rotate(
    lo_noise_glwe: jnp.ndarray,
    auto_keys_fft,
    glwe: GlweDef,
    trace_radix: RadixDecomposition,
    cbs_radix: RadixDecomposition,
    be=C128,
) -> jnp.ndarray:
    """Per level i: un-rotate the functional-bootstrap offset (add
    encode(1, bits_i) to coefficient i), multiply by X^{-i}, shift-round
    by log2(N) (≡ multiply by N^{-1}), then trace — producing GLEV row i
    (`circuit_bootstrapping.rs:253-298`). Returns u64 [l, k+1, N]."""
    shift_amount = glwe.log_degree
    rotated = u64(lo_noise_glwe)
    rows = []
    for i in range(cbs_radix.count):
        pb = cbs_radix.radix_log * (i + 1) + 1
        # cumulative: the reference mutates glwe_rotated in place across levels
        rotated = rotated.at[..., -1, i].add(encode(1, pb))
        permuted = monomial_mul(rotated, 2 * glwe.degree - i)
        shifted = glwe_mod_switch_and_expand_pow_2(permuted, shift_amount)
        rows.append(trace(shifted, auto_keys_fft, glwe, trace_radix, be))
    return jnp.stack(rows, axis=-3)


def circuit_bootstrap(
    ct: jnp.ndarray,
    bsk_fft,
    auto_keys_fft,
    ssk_fft,
    params: Params,
    be=C128,
):
    """Full circuit bootstrap via trace + scheme switch
    (`circuit_bootstrapping.rs:342-385`): L0 LWE(bit) -> L1 GGSW(bit)
    in the frequency domain."""
    glwe = params.l1_params
    lo_noise_glwe = hi_noise_lwe_to_lo_noise_glwe(
        ct, bsk_fft, params.l0_params, glwe, params.cbs_pbs_radix_eff,
        params.cbs_radix, be
    )
    glev = mod_switch_trace_and_rotate(
        lo_noise_glwe, auto_keys_fft, glwe, params.tr_radix, params.cbs_radix, be
    )
    return scheme_switch_fft(
        glev, ssk_fft, glwe, params.cbs_radix, params.ss_radix, be
    )
