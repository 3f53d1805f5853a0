"""High-level encryption API over the L-typed ciphertexts of the
conversion cycle (≙ reference `parasol_runtime/src/crypto/encryption.rs`).

Ciphertext types (layouts; all support leading batch dims):
- L0 LWE:  u64 [n0 + 1]        — high-noise, bit messages
- L1 LWE:  u64 [k*N + 1]
- L1 GLWE: u64 [k+1, N]        — bit messages in coefficients
- L1 GLEV: u64 [l_cbs, k+1, N]
- L1 GGSW: frequency domain (how the reference stores them,
  `crypto/ciphertext.rs:35-99`)

Messages are bits (plaintext_bits = 1) unless noted, matching the
reference's bool API (`encryption.rs:127-446`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import encryption as enc
from ..ops import torus
from ..ops.fft import C128
from ..params import DEFAULT_128, Params
from .keys import PublicKey, SecretKey


class Encryption:
    """Encrypt/decrypt/trivial constructors for every L-type."""

    def __init__(self, params: Params = DEFAULT_128):
        self.params = params

    # --- L0 LWE bits ---

    def encrypt_lwe_l0(self, key, bit, sk: SecretKey) -> jnp.ndarray:
        return enc.encrypt_lwe(key, torus.encode(bit, 1), sk.lwe_0, self.params.l0_params)

    def decrypt_lwe_l0(self, ct, sk: SecretKey) -> jnp.ndarray:
        return torus.decode(
            enc.decrypt_lwe(ct, sk.lwe_0, self.params.l0_params), 1
        )

    def trivial_lwe_l0(self, bit) -> jnp.ndarray:
        return enc.trivial_lwe(torus.encode(bit, 1), self.params.l0_params)

    # --- L1 LWE bits (under the flattened GLWE key) ---

    def decrypt_lwe_l1(self, ct, sk: SecretKey) -> jnp.ndarray:
        return torus.decode(
            enc.decrypt_lwe(ct, sk.lwe_1, self.params.l1_params.as_lwe_def()), 1
        )

    # --- L1 GLWE (bit-per-coefficient) ---

    def encrypt_glwe_l1(self, key, bits_poly, sk: SecretKey) -> jnp.ndarray:
        return enc.encrypt_glwe(
            key, torus.encode(bits_poly, 1), sk.glwe_1, self.params.l1_params
        )

    def decrypt_glwe_l1(self, ct, sk: SecretKey) -> jnp.ndarray:
        return torus.decode(enc.decrypt_glwe(ct, sk.glwe_1, self.params.l1_params), 1)

    def trivial_glwe_l1(self, bits_poly) -> jnp.ndarray:
        return enc.trivial_glwe(torus.encode(bits_poly, 1), self.params.l1_params)

    def trivial_glwe_l1_zero(self) -> jnp.ndarray:
        n = self.params.l1_params.degree
        return self.trivial_glwe_l1(jnp.zeros((n,), dtype=jnp.uint64))

    def trivial_glwe_l1_one(self) -> jnp.ndarray:
        """Encodes 1 in the constant coefficient (used by NOT)."""
        n = self.params.l1_params.degree
        return self.trivial_glwe_l1(jnp.zeros((n,), dtype=jnp.uint64).at[0].set(1))

    # --- L1 GLEV / GGSW ---

    def encrypt_glev_l1(self, key, bits_poly, sk: SecretKey) -> jnp.ndarray:
        return enc.encrypt_glev(
            key, bits_poly, sk.glwe_1, self.params.l1_params, self.params.cbs_radix
        )

    def decrypt_glev_l1(self, ct, sk: SecretKey) -> jnp.ndarray:
        return enc.decrypt_glev_at(
            ct, sk.glwe_1, self.params.l1_params, self.params.cbs_radix, 0
        )

    def trivial_glev_l1(self, bits_poly) -> jnp.ndarray:
        return enc.trivial_glev(bits_poly, self.params.l1_params, self.params.cbs_radix)

    def encrypt_ggsw_l1(self, key, bit, sk: SecretKey, be=C128):
        from ..ops.fft_ops import ggsw_to_fft

        ggsw = enc.encrypt_ggsw_scalar(
            key, bit, sk.glwe_1, self.params.l1_params, self.params.cbs_radix
        )
        return ggsw_to_fft(ggsw, be)

    # --- integers as per-bit GLWE ciphertexts ---

    def encrypt_uint_bits(self, key, value: int, n: int, sk: SecretKey) -> list:
        """Encrypt an n-bit integer as n GLWE bit ciphertexts, LSB-first
        (how `GenericInt` stores its bits)."""
        import jax

        keys = jax.random.split(key, n)
        n_deg = self.params.l1_params.degree
        cts = []
        for i in range(n):
            bit = (value >> i) & 1
            poly = jnp.zeros((n_deg,), dtype=jnp.uint64).at[0].set(bit)
            cts.append(self.encrypt_glwe_l1(keys[i], poly, sk))
        return cts

    def decrypt_uint_bits(self, cts: list, sk: SecretKey) -> int:
        value = 0
        for i, ct in enumerate(cts):
            value |= int(self.decrypt_glwe_l1(ct, sk)[0]) << i
        return value

    def encrypt_packed_uint(self, key, value: int, n: int, pk: PublicKey) -> jnp.ndarray:
        """Encrypt an n-bit integer into one GLWE (bit i in coefficient
        i) under the RLWE public key (≙ `PackedGenericInt::encrypt`)."""
        n_deg = self.params.l1_params.degree
        bits = jnp.asarray(
            [(value >> i) & 1 for i in range(n)] + [0] * (n_deg - n), dtype=jnp.uint64
        )
        return self.encrypt_packed_public(key, bits, pk)

    def decrypt_packed_uint(self, ct, n: int, sk: SecretKey) -> int:
        bits = self.decrypt_glwe_l1(ct, sk)
        return sum(int(bits[i]) << i for i in range(n))

    # --- RLWE public-key packed encryption ---

    def encrypt_packed_public(self, key, bits_poly, pk: PublicKey) -> jnp.ndarray:
        """Encrypt up to N bits into one GLWE via the RLWE public key
        (how `PackedGenericInt::encrypt` produces its GLWE;
        `encryption.rs` + `rlwe_encryption.rs:47-130`)."""
        return enc.rlwe_encrypt_public(
            key, torus.encode(bits_poly, 1), pk.rlwe_1, self.params.l1_params
        )
