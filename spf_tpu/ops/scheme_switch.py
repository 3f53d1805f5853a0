"""Scheme switch key generation (GLEV(s_i * s_j) encryptions).

(≙ reference `sunscreen_tfhe/src/ops/bootstrapping/scheme_switch.rs:22-64`;
the switching operation itself lives in `fft_ops.scheme_switch_fft`.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params import GlweDef, RadixDecomposition
from . import encryption as enc
from .fft import C128
from .poly import negacyclic_mul_exact


def generate_scheme_switch_key(
    key, glwe_sk: jnp.ndarray, glwe: GlweDef, radix: RadixDecomposition, be=C128
):
    """GLEV encryptions of s_i ⊛ s_j for all pairs, under the same key.

    The reference stores only the triangular i <= j pairs
    (`scheme_switch.rs:41-45`, `iteration/triangular_pairs.rs`); we
    materialize the symmetric [k, k] table directly (k is 1–3) and
    return it in the frequency domain: freq [k, k, count, k+1, N/2].

    The reference computes s_i*s_j with its f64 FFT (exact for binary
    inputs); we use the exact integer product. With `be=None` the
    coefficient-domain u64 array [k, k, count, k+1, N] is returned.
    """
    k = glwe.size
    rows = []
    for i in range(k):
        cols = []
        for j in range(k):
            ii, jj = min(i, j), max(i, j)
            s_ij = negacyclic_mul_exact(glwe_sk[ii], glwe_sk[jj])
            subkey = jax.random.fold_in(key, ii * k + jj)
            cols.append(enc.encrypt_glev(subkey, s_ij, glwe_sk, glwe, radix))
        rows.append(jnp.stack(cols, axis=0))
    ssk = jnp.stack(rows, axis=0)
    return ssk if be is None else be.fwd_torus(ssk)
