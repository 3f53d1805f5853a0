"""One-time-pad recryption: the output-privacy primitive.

(≙ reference `parasol_runtime/src/crypto/recryption.rs:23-110`.)

The pad holder RLWE-encrypts a random binary polynomial under the
shared public key; the compute party XORs it onto a result GLWE; once
that GLWE is decrypted (e.g. by a threshold committee), only the pad
holder can remove the pad. A pad must never be reused.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops import rng
from .encryption import Encryption
from .keys import PublicKey


@dataclasses.dataclass
class SecretOneTimePad:
    key: jnp.ndarray  # binary u64 [N]


@dataclasses.dataclass
class PublicOneTimePad:
    ct: jnp.ndarray  # L1 GLWE


def generate_one_time_pad(key, enc: Encryption, pk: PublicKey):
    """Returns (public, secret) pads (`recryption.rs:62-84`)."""
    k_pad, k_enc = jax.random.split(key)
    pad = rng.binary(k_pad, (enc.params.l1_params.degree,))
    ct = enc.encrypt_packed_public(k_enc, pad, pk)
    return PublicOneTimePad(ct=ct), SecretOneTimePad(key=pad)


def recrypt_one_time_pad(x: jnp.ndarray, otp: PublicOneTimePad) -> jnp.ndarray:
    """XOR the pad onto a result GLWE (plain ciphertext addition;
    `recryption.rs:86-100`)."""
    return x + otp.ct


def decrypt_one_time_pad(decrypted_bits: jnp.ndarray, sk: SecretOneTimePad) -> jnp.ndarray:
    """Remove the pad from a decrypted bit polynomial
    (`recryption.rs:102-110`)."""
    return (decrypted_bits + sk.key) % jnp.uint64(2)
