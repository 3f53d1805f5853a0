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
        jit_ops: bool = True,
    ):
        self.params = params
        self.ck = compute_key
        self.be = be
        self.enc = Encryption(params)
        # `jit_ops`: compile each op once per input shape (executables
        # cached here for the life of the Evaluation). The eager path
        # dispatches thousands of tiny XLA ops per circuit bootstrap —
        # dominant cost of program-level runs on CPU. Combined with the
        # executor's power-of-two wave padding the shape set is small.
        self._jit_ops = jit_ops
        self._jit_cache: dict = {}
        self.ggsw_zero = None
        self.ggsw_one = None
        if precompute_constants:
            self.ggsw_zero = self.circuit_bootstrap(self.enc.trivial_lwe_l0(0))
            self.ggsw_one = self.circuit_bootstrap(self.enc.trivial_lwe_l0(1))

    def _jitted(self, name, fn):
        if not self._jit_ops:
            return fn
        j = self._jit_cache.get(name)
        if j is None:
            import jax

            j = self._jit_cache[name] = jax.jit(fn)
        return j

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
        return self._jitted(
            "cmux",
            lambda s, a, b: fft_ops.cmux(
                a, b, s, self.params.l1_params, self.params.cbs_radix, self.be
            ),
        )(sel_ggsw_fft, d0, d1)

    def glev_cmux(self, sel_ggsw_fft, d0, d1):
        return self._jitted(
            "glev_cmux",
            lambda s, a, b: fft_ops.glev_cmux(
                a, b, s, self.params.l1_params, self.params.cbs_radix, self.be
            ),
        )(sel_ggsw_fft, d0, d1)

    def multiply_glwe_ggsw(self, glwe, ggsw_fft):
        return self._jitted(
            "multiply_glwe_ggsw",
            lambda g, s: fft_ops.external_product(
                g, s, self.params.l1_params, self.params.cbs_radix, self.be
            ),
        )(glwe, ggsw_fft)

    def sample_extract(self, glwe, i: int):
        return self._jitted(
            ("sample_extract", i),
            lambda g: ct_ops.sample_extract(g, i, self.params.l1_params),
        )(glwe)

    def mul_xn(self, glwe, n: int):
        """Multiply by the monomial X^n (packing shifts)."""
        return monomial_mul(glwe, n)

    # --- keyed ops ---

    def circuit_bootstrap(self, lwe_l0: jnp.ndarray):
        """L0 LWE(bit) -> L1 GGSW(bit) in the frequency domain
        (`evaluation.rs:211-225`, trace + scheme switch variant)."""
        return self._jitted(
            "circuit_bootstrap",
            lambda c: cbs_ops.circuit_bootstrap(
                c, self.ck.bsk, self.ck.auto_keys, self.ck.ssk, self.params,
                self.be,
            ),
        )(lwe_l0)

    def scheme_switch(self, glev_l1: jnp.ndarray):
        """L1 GLEV -> L1 GGSW (fft) (`evaluation.rs:231`)."""
        return self._jitted(
            "scheme_switch",
            lambda g: fft_ops.scheme_switch_fft(
                g,
                self.ck.ssk,
                self.params.l1_params,
                self.params.cbs_radix,
                self.params.ss_radix,
                self.be,
            ),
        )(glev_l1)

    def keyswitch_lwe_l1_to_l0(self, lwe_l1: jnp.ndarray) -> jnp.ndarray:
        """(`evaluation.rs:246`)"""
        return self._jitted(
            "keyswitch_lwe_l1_to_l0",
            lambda c: ks_ops.keyswitch_lwe_to_lwe(
                c,
                self.ck.ksk,
                self.params.l1_params.as_lwe_def(),
                self.params.l0_params,
                self.params.ks_radix,
            ),
        )(lwe_l1)
