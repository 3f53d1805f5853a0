"""Empirical noise measurement for FHE ops.

(≙ reference `parasol_runtime/examples/op_noise`: measures the noise
distribution of encryption, keyswitching, CMux (vs. tree depth),
circuit bootstrapping, and scheme switching; used to validate parameter
sets and the noise-vs-depth model `params.rs:103-106`.)

Noise is measured at decrypt level: encrypt a known message, apply the
op, decrypt *without decoding*, subtract the expected torus point, and
report the signed error statistics (log2 of the std dev, in torus
units of q = 2**64).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import encryption as enc
from ..ops import fft_ops, torus
from ..params import Params
from ..runtime.evaluation import Evaluation
from ..runtime.keys import SecretKey


@dataclasses.dataclass
class NoiseStats:
    op: str
    samples: int
    log2_std: float
    log2_max: float

    def as_dict(self):
        return dataclasses.asdict(self)


def _stats(op: str, errors: np.ndarray) -> NoiseStats:
    e = errors.astype(np.float64)
    std = float(e.std()) or 1.0
    mx = float(np.abs(e).max()) or 1.0
    return NoiseStats(op, e.size, math.log2(std), math.log2(mx))


def _signed_err(noisy: np.ndarray, expected_torus) -> np.ndarray:
    a = np.asarray(noisy, dtype=np.uint64)
    b = np.asarray(expected_torus).astype(np.uint64)
    return (a - b).astype(np.int64)  # wrapping diff, centered


def measure_encryption_noise(key, sk: SecretKey, params: Params, trials=32) -> NoiseStats:
    glwe = params.l1_params
    msg = jnp.zeros((glwe.degree,), dtype=jnp.uint64)
    errs = []
    for t in range(trials):
        ct = enc.encrypt_glwe(jax.random.fold_in(key, t), msg, sk.glwe_1, glwe)
        errs.append(_signed_err(enc.decrypt_glwe(ct, sk.glwe_1, glwe), 0))
    return _stats("glwe_encryption", np.concatenate(errs))


def measure_cmux_noise(
    key, sk: SecretKey, ev: Evaluation, params: Params, depth=8, trials=4
) -> list:
    """Chain CMuxes (select=1 each level) and report noise per depth
    (the op_noise `cmux_tree` experiment)."""
    glwe = params.l1_params
    zero = jnp.zeros((glwe.degree,), dtype=jnp.uint64)
    one = torus.encode(jnp.ones((glwe.degree,), dtype=jnp.uint64), 1)
    out = []
    for t in range(trials):
        sel = ev.enc.encrypt_ggsw_l1(jax.random.fold_in(key, 1000 + t), 1, sk, ev.be)
        acc = enc.encrypt_glwe(jax.random.fold_in(key, t), one, sk.glwe_1, glwe)
        errs_at_depth = []
        for d in range(depth):
            acc = fft_ops.cmux(
                enc.trivial_glwe(zero, glwe), acc, sel, glwe, params.cbs_radix, ev.be
            )
            errs_at_depth.append(
                _signed_err(enc.decrypt_glwe(acc, sk.glwe_1, glwe), np.asarray(one))
            )
        out.append(errs_at_depth)
    stats = []
    for d in range(depth):
        errs = np.concatenate([out[t][d] for t in range(trials)])
        stats.append(_stats(f"cmux_depth_{d + 1}", errs))
    return stats


def measure_cbs_noise(key, sk: SecretKey, ev: Evaluation, params: Params, trials=4) -> NoiseStats:
    """Noise of a CMux whose selector came from circuit bootstrapping."""
    glwe = params.l1_params
    one = torus.encode(jnp.ones((glwe.degree,), dtype=jnp.uint64), 1)
    zero = jnp.zeros((glwe.degree,), dtype=jnp.uint64)
    errs = []
    for t in range(trials):
        lwe_ct = enc.encrypt_lwe(
            jax.random.fold_in(key, t), torus.encode(1, 1), sk.lwe_0, params.l0_params
        )
        ggsw = ev.circuit_bootstrap(lwe_ct)
        out = fft_ops.cmux(
            enc.trivial_glwe(zero, glwe),
            enc.trivial_glwe(one, glwe),
            ggsw,
            glwe,
            params.cbs_radix,
            ev.be,
        )
        errs.append(_signed_err(enc.decrypt_glwe(out, sk.glwe_1, glwe), np.asarray(one)))
    return _stats("cbs_then_cmux", np.concatenate(errs))


def measure_keyswitch_noise(key, sk: SecretKey, ev: Evaluation, params: Params, trials=16) -> NoiseStats:
    errs = []
    for t in range(trials):
        ct1 = enc.encrypt_lwe(
            jax.random.fold_in(key, t),
            torus.encode(0, 1),
            sk.lwe_1,
            params.l1_params.as_lwe_def(),
        )
        ct0 = ev.keyswitch_lwe_l1_to_l0(ct1)
        errs.append(_signed_err(enc.decrypt_lwe(ct0, sk.lwe_0, params.l0_params), 0))
    return _stats("keyswitch_l1_l0", np.concatenate([np.atleast_1d(e) for e in errs]))
