"""Key material: secret, public, and compute keys.

(≙ reference `parasol_runtime/src/crypto/keys.rs`.)

- `SecretKey`: L0 LWE key + L1 GLWE key (`keys.rs:100-126`).
- `PublicKey`: RLWE public key for packed-integer encryption (`keys.rs:26`).
- `ComputeKey`: the material a third party needs to run computations —
  bootstrap key, L1->L0 LWE keyswitch key, automorphism keys, scheme
  switch key (`keys.rs:147-159`) — stored directly in the frequency
  domain (`keys.rs:258-306`).

Keys are pytrees (dicts of arrays), so they can be donated/replicated
across a TPU mesh or serialized with numpy.
"""

from __future__ import annotations

import dataclasses
import typing

import jax
import jax.numpy as jnp

from ..ops import encryption as enc
from ..ops import keyswitch as ks
from ..ops import scheme_switch as ss
from ..ops.bootstrap import generate_bootstrap_key
from ..ops.fft import C128, get_backend
from ..params import DEFAULT_128, Params


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SecretKey:
    """lwe_0: u64[n], glwe_1: u64[k, N] (binary)."""

    lwe_0: jnp.ndarray
    glwe_1: jnp.ndarray

    @property
    def lwe_1(self) -> jnp.ndarray:
        """The L1 LWE key: the GLWE key reinterpreted (`keys.rs:126`)."""
        return enc.glwe_sk_to_lwe_sk(self.glwe_1)

    @classmethod
    def generate(cls, key, params: Params = DEFAULT_128) -> "SecretKey":
        k0, k1 = jax.random.split(key)
        return cls(
            lwe_0=enc.generate_lwe_sk(k0, params.l0_params),
            glwe_1=enc.generate_glwe_sk(k1, params.l1_params),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PublicKey:
    """RLWE public key (`keys.rs:26-64`)."""

    rlwe_1: jnp.ndarray

    @classmethod
    def generate(cls, key, sk: SecretKey, params: Params = DEFAULT_128) -> "PublicKey":
        return cls(rlwe_1=enc.rlwe_generate_public_key(key, sk.glwe_1, params.l1_params))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ComputeKey:
    """All evaluation keys, in the frequency domain (`keys.rs:147-306`).

    Sizes at DEFAULT_128: bsk ~80 MB, modest others — replicated across
    TPU chips (read-only constants pinned in HBM).
    """

    bsk: typing.Any  # freq [n0, k+1, l_pbs, k+1, N/2]
    ksk: jnp.ndarray  # u64 [k*N, l_ks, n0+1]
    auto_keys: typing.Any  # freq [log2 N, k, l_tr, k+1, N/2]
    ssk: typing.Any  # freq [k, k, l_ss, k+1, N/2]

    @classmethod
    def generate(
        cls, key, sk: SecretKey, params: Params = DEFAULT_128, be=C128
    ) -> "ComputeKey":
        k_bsk, k_ksk, k_ak, k_ssk = jax.random.split(key, 4)
        glwe = params.l1_params
        bsk = generate_bootstrap_key(
            k_bsk, sk.lwe_0, sk.glwe_1, params.l0_params, glwe,
            params.cbs_pbs_radix_eff, be
        )
        ksk = ks.generate_lwe_keyswitch_key(
            k_ksk,
            sk.lwe_1,
            sk.lwe_0,
            glwe.as_lwe_def(),
            params.l0_params,
            params.ks_radix,
        )
        auto_keys = ks.generate_automorphism_keys(k_ak, sk.glwe_1, glwe, params.tr_radix, be)
        ssk = ss.generate_scheme_switch_key(k_ssk, sk.glwe_1, glwe, params.ss_radix, be)
        return cls(bsk=bsk, ksk=ksk, auto_keys=auto_keys, ssk=ssk)


def generate_keys(
    key, params: Params = DEFAULT_128, backend: str = "c128"
) -> tuple[SecretKey, PublicKey, ComputeKey]:
    """One-call keygen for (secret, public, compute) keys."""
    be = get_backend(backend)
    k_sk, k_pk, k_ck = jax.random.split(key, 3)
    sk = SecretKey.generate(k_sk, params)
    # RLWE public keys require k == 1 (`rlwe_encryption.rs:55`); parameter
    # sets with k > 1 simply don't support public-key encryption
    pk = PublicKey.generate(k_pk, sk, params) if params.l1_params.size == 1 else None
    ck = ComputeKey.generate(k_ck, sk, params, be)
    return sk, pk, ck
