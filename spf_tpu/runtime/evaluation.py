"""Evaluation: the homomorphic op surface used by circuits.

(≙ reference `parasol_runtime/src/crypto/evaluation.rs`.)

Keyless ops exploit mod-2 arithmetic in the torus top bit: NOT is
`x + trivial(1)` and XOR is plain GLWE addition (`evaluation.rs:48-56`).
Keyed ops wrap circuit bootstrapping, scheme switching, and L1->L0
keyswitching. GGSW(0)/GGSW(1) constants are precomputed by
circuit-bootstrapping trivial LWEs (`evaluation.rs:161-196`) — valid
GGSWs producible with only the compute key.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import cbs as cbs_ops
from ..ops import ciphertext as ct_ops
from ..ops import fft_ops
from ..ops import keyswitch as ks_ops
from ..ops import torus
from ..ops.fft import C128
from ..ops.poly import monomial_mul
from ..params import DEFAULT_128, Params
from .encryption import Encryption
from .keys import ComputeKey


class Evaluation:
    """Bound to a `ComputeKey`; all methods are pure functions of their
    ciphertext inputs (jit/vmap-safe)."""

    def __init__(
        self,
        compute_key: ComputeKey,
        params: Params = DEFAULT_128,
        be=C128,
        precompute_constants: bool = True,
    ):
        self.params = params
        self.ck = compute_key
        self.be = be
        self.enc = Encryption(params)
        self.ggsw_zero = None
        self.ggsw_one = None
        if precompute_constants:
            self.ggsw_zero = self.circuit_bootstrap(self.enc.trivial_lwe_l0(0))
            self.ggsw_one = self.circuit_bootstrap(self.enc.trivial_lwe_l0(1))

    # --- keyless ops (`evaluation.rs:26-136`) ---

    def not_(self, glwe: jnp.ndarray) -> jnp.ndarray:
        """NOT = x + trivial(1) (mod-2 top-bit arithmetic)."""
        one = jnp.zeros_like(glwe).at[..., -1, 0].set(torus.encode(1, 1))
        return glwe + one

    def xor(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """XOR = GLWE addition."""
        return a + b

    def glwe_add(self, a, b):
        return ct_ops.glwe_add(a, b)

    def cmux(self, sel_ggsw_fft, d0, d1):
        return fft_ops.cmux(
            d0, d1, sel_ggsw_fft, self.params.l1_params, self.params.cbs_radix, self.be
        )

    def glev_cmux(self, sel_ggsw_fft, d0, d1):
        return fft_ops.glev_cmux(
            d0, d1, sel_ggsw_fft, self.params.l1_params, self.params.cbs_radix, self.be
        )

    def multiply_glwe_ggsw(self, glwe, ggsw_fft):
        return fft_ops.external_product(
            glwe, ggsw_fft, self.params.l1_params, self.params.cbs_radix, self.be
        )

    def sample_extract(self, glwe, i: int):
        return ct_ops.sample_extract(glwe, i, self.params.l1_params)

    def mul_xn(self, glwe, n: int):
        """Multiply by the monomial X^n (packing shifts)."""
        return monomial_mul(glwe, n)

    # --- keyed ops ---

    def circuit_bootstrap(self, lwe_l0: jnp.ndarray):
        """L0 LWE(bit) -> L1 GGSW(bit) in the frequency domain
        (`evaluation.rs:211-225`, trace + scheme switch variant)."""
        return cbs_ops.circuit_bootstrap(
            lwe_l0, self.ck.bsk, self.ck.auto_keys, self.ck.ssk, self.params, self.be
        )

    def scheme_switch(self, glev_l1: jnp.ndarray):
        """L1 GLEV -> L1 GGSW (fft) (`evaluation.rs:231`)."""
        return fft_ops.scheme_switch_fft(
            glev_l1,
            self.ck.ssk,
            self.params.l1_params,
            self.params.cbs_radix,
            self.params.ss_radix,
            self.be,
        )

    def keyswitch_lwe_l1_to_l0(self, lwe_l1: jnp.ndarray) -> jnp.ndarray:
        """(`evaluation.rs:246`)"""
        return ks_ops.keyswitch_lwe_to_lwe(
            lwe_l1,
            self.ck.ksk,
            self.params.l1_params.as_lwe_def(),
            self.params.l0_params,
            self.params.ks_radix,
        )
