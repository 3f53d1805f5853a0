"""Negacyclic ("twisted") FFT over Z_q[X]/(X^N + 1), q = 2**64.

Algorithm (identical conventions to the reference `TwistedFft`,
`sunscreen_tfhe/src/math/fft/negacyclic/mod.rs:29-123`):

- forward: fold the N real coefficients into N/2 complex values
  `z[j] = x[j] + i * x[j + N/2]`, multiply by the twist
  `e^{+2*pi*i*j / 2N}`, then a size-N/2 complex DFT (negative-exponent
  convention).
- inverse: inverse DFT (normalized by 2/N), multiply by the inverse
  twist, round each component to nearest, then reduce mod q recentered
  to [-q/2, q/2) and cast to u64
  (`sunscreen_tfhe/src/math/simd/scalar.rs:25-35,75-119`).

Pointwise products in this domain are negacyclic convolutions.

Two interchangeable backends:
- `C128`: complex128 via `jnp.fft` — exact-enough oracle; CPU only
  (TPUs have no c128). Used for tests and CPU execution.
- `DS32` (`fft_ds32.py`): double-single f32 arithmetic — the TPU
  production path (TPUs have no native f64; XLA-emulated f64 multiply
  has only ~40-bit effective mantissa, measured, which is insufficient).

Both expose the same functional interface; frequency-domain values are
opaque pytrees owned by the backend.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .torus import f64_to_torus, to_signed_f64


@functools.lru_cache(maxsize=16)
def _twist(n: int):
    """Twist factors e^{2*pi*i*j/(2n)} for j in [0, n/2) and their inverses
    (`negacyclic/mod.rs:58-72`). Cached as numpy constants (safe across
    jit traces)."""
    k = n // 2
    j = np.arange(k)
    tw = np.exp(2j * np.pi * j / (2 * n))
    return tw, 1.0 / tw


class C128Backend:
    """complex128 negacyclic FFT backend (CPU oracle / CPU execution)."""

    name = "c128"

    def fwd_signed(self, x: jnp.ndarray) -> jnp.ndarray:
        """Forward transform of signed (or f64) coefficients [..., N] ->
        complex [..., N/2]."""
        n = x.shape[-1]
        k = n // 2
        tw, _ = _twist(n)
        xf = x.astype(jnp.float64)
        z = (xf[..., :k] + 1j * xf[..., k:]) * tw
        return jnp.fft.fft(z)

    def fwd_torus(self, x: jnp.ndarray) -> jnp.ndarray:
        """Forward transform of u64 torus coefficients (centered to signed
        first, `entities/polynomial.rs:264-268`)."""
        return self.fwd_signed(to_signed_f64(x))

    def inv(self, f: jnp.ndarray) -> jnp.ndarray:
        """Inverse transform complex [..., N/2] -> u64 [..., N] with
        round-to-nearest and mod-q reduction."""
        _, tw_inv = _twist(f.shape[-1] * 2)
        z = jnp.fft.ifft(f) * tw_inv
        re = jnp.round(z.real)
        im = jnp.round(z.imag)
        return f64_to_torus(jnp.concatenate([re, im], axis=-1))

    # --- frequency-domain arithmetic ---

    def zeros(self, shape) -> jnp.ndarray:
        return jnp.zeros(shape, dtype=jnp.complex128)

    def add(self, a, b):
        return a + b

    def sub(self, a, b):
        return a - b

    def mul(self, a, b):
        return a * b

    def cmadd(self, acc, a, b):
        """acc += a * b (the reference's `complex_mad`,
        `math/simd/scalar.rs:12-16`)."""
        return acc + a * b

    def stack(self, fs, axis=0):
        return jnp.stack(fs, axis=axis)


C128 = C128Backend()


def get_backend(name: str = "c128"):
    if name == "c128":
        return C128
    if name == "ds32":
        from .fft_ds32 import DS32

        return DS32
    raise ValueError(f"unknown fft backend {name!r}")
