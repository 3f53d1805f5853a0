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


class RunningStats:
    """Streaming mean/variance accumulator, Welford's algorithm
    (≙ `sunscreen_math/src/stats.rs` Stats: add_sample/mean/variance/
    std — numerically stable for the tiny relative variances noise
    measurement produces)."""

    def __init__(self):
        self.count = 0
        self._mean = 0.0
        self._m2 = 0.0

    def add_sample(self, x: float):
        self.count += 1
        delta = x - self._mean
        self._mean += delta / self.count
        self._m2 += delta * (x - self._mean)

    def mean(self) -> float:
        return self._mean

    def variance(self) -> float:
        return self._m2 / self.count if self.count else 0.0

    def std(self) -> float:
        return math.sqrt(self.variance())


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


# --------------------------------------------------------------------------
# Failure-probability model (≙ op_noise/math.rs + params.rs:103-106)
# --------------------------------------------------------------------------


def log2_failure_probability_binary(normalized_std: float) -> float:
    """Base-2 log of the probability that a binary-encoded message
    decodes wrongly given a normalized-torus-distance noise std
    (decode boundary at 1/4 turn; ≙ op_noise/math.rs:34
    `probability_away_from_mean_gaussian_log_binary`)."""
    from .security import probability_away_from_mean_gaussian

    return probability_away_from_mean_gaussian(0.25, normalized_std) / math.log10(2)


def fit_noise_vs_depth(depths, log2_probs):
    """Least-squares fit of the reference's depth model
    f(x) = -1/(a(x+b)) + c (≙ op_noise/cmux_tree.rs:73
    function_to_fit) to (depth, log2 failure probability) points.
    Returns (a, b, c). Linear in (a, ab) once c is fixed, so c is found
    by 1-D scan + refinement — no scipy dependency."""
    x = np.asarray(depths, dtype=np.float64)
    y = np.asarray(log2_probs, dtype=np.float64)

    def solve_given_c(c):
        # 1/(c - f) = a*x + a*b
        denom = c - y
        if np.any(denom <= 0):
            return None, np.inf
        z = 1.0 / denom
        A = np.stack([x, np.ones_like(x)], axis=1)
        coef, *_ = np.linalg.lstsq(A, z, rcond=None)
        a, ab = coef
        if a <= 0:
            return None, np.inf
        resid = -1.0 / (a * x + ab) + c - y
        return (a, ab / a, c), float((resid**2).sum())

    best, best_err = None, np.inf
    hi = float(y.max())
    for c in np.linspace(hi + 1e-3, hi + 50.0, 400):
        fit, err = solve_given_c(c)
        if err < best_err:
            best, best_err = fit, err
    return best


# --------------------------------------------------------------------------
# CMux-tree depth experiment (≙ op_noise/cmux_tree.rs: "random select
# lines, cascaded data lines")
# --------------------------------------------------------------------------


@dataclasses.dataclass
class CMuxTreeLevel:
    depth: int
    log2_std: float  # of the normalized torus distance
    log2_failure_probability: float
    samples: int

    def as_dict(self):
        return dataclasses.asdict(self)


def measure_cmux_tree_noise(
    key, glwe_sk, glwe, cbs_radix, be, depth=16, trials=2
) -> list:
    """Cascade CMuxes with fresh random select lines and measure the
    per-level noise (≙ cmux_tree.rs `RandomSelectLinesCascadedDataLines`:
    at every level two fresh GGSWs — a random bit and its complement —
    select between the two data lines carried from the previous level).

    Noise is taken as the normalized torus distance of every decrypted
    coefficient from its expected binary encoding (the reference routes
    through a keyswitch to L0 first; measuring the GLWE directly isolates
    the CMux accumulation itself). Only GLWE material is needed — no
    bootstrap keys — so this runs at DEFAULT_128 in seconds. Returns one
    `CMuxTreeLevel` per depth; feed `log2_failure_probability` to
    `fit_noise_vs_depth` to reproduce the `params.noise_exponent_at_depth`
    model."""
    import numpy as _np

    rng = _np.random.default_rng(1234)
    out = []
    per_level_err: list[list] = [[] for _ in range(depth)]
    cmux_j = jax.jit(
        lambda lo, hi, s: fft_ops.cmux(lo, hi, s, glwe, cbs_radix, be)
    )
    for t in range(trials):
        kt = jax.random.fold_in(key, t)
        vals = [0, 1]  # plaintext bits carried by the two data lines
        lines = [
            enc.encrypt_glwe(
                jax.random.fold_in(kt, 10_000 + i),
                torus.encode(jnp.full((glwe.degree,), v, dtype=jnp.uint64), 1),
                glwe_sk,
                glwe,
            )
            for i, v in enumerate(vals)
        ]
        for d in range(depth):
            b = int(rng.integers(0, 2))
            sels = [
                be.fwd_torus(
                    enc.encrypt_ggsw_scalar(
                        jax.random.fold_in(kt, 2 * d + 100 + i),
                        jnp.uint64(bit),
                        glwe_sk,
                        glwe,
                        cbs_radix,
                    )
                )
                for i, bit in enumerate((b, 1 - b))
            ]
            new_lines, new_vals = [], []
            for s, bit in zip(sels, (b, 1 - b)):
                new_lines.append(cmux_j(lines[0], lines[1], s))
                new_vals.append(vals[bit])
            lines, vals = new_lines, new_vals
            for line, v in zip(lines, vals):
                expected = np.asarray(
                    torus.encode(jnp.full((glwe.degree,), v, dtype=jnp.uint64), 1)
                )
                per_level_err[d].append(
                    _signed_err(enc.decrypt_glwe(line, glwe_sk, glwe), expected)
                )
    for d in range(depth):
        e = np.concatenate(per_level_err[d]).astype(np.float64) / 2.0**64
        std = float(e.std()) or 2.0**-64
        out.append(
            CMuxTreeLevel(
                depth=d + 1,
                log2_std=math.log2(std),
                log2_failure_probability=log2_failure_probability_binary(std),
                samples=e.size,
            )
        )
    return out


# --------------------------------------------------------------------------
# Scheme-switch parameter search (≙ op_noise/scheme_switch.rs)
# --------------------------------------------------------------------------


def measure_noise_ggsw(ggsw, glwe_sk, glwe, cbs_radix) -> np.ndarray:
    """Normalized torus distance of the most noise-sensitive GGSW row:
    the last (finest-gadget) GLWE of the GLEV encrypting -s_0 ⊛ m, whose
    plaintext needs the full radix_log*count bits (≙ op_noise/noise.rs:69
    measure_noise_ggsw). The GGSW is assumed to encrypt m = 1·X^0."""
    from ..ops.poly import negacyclic_mul_exact

    shift = 64 - cbs_radix.radix_log * cbs_radix.count
    msg = jnp.zeros((glwe.degree,), dtype=jnp.uint64).at[0].set(1)
    expected = (U64_ZERO - negacyclic_mul_exact(msg, glwe_sk[0])) * jnp.uint64(
        (1 << shift) % (1 << 64)
    )
    noisy = enc.decrypt_glwe(ggsw[0, cbs_radix.count - 1], glwe_sk, glwe)
    return _signed_err(noisy, np.asarray(expected)).astype(np.float64) / 2.0**64


U64_ZERO = jnp.uint64(0)


def search_scheme_switch(
    key,
    glwe_sk,
    glwe,
    cbs_radix,
    radix_logs,
    counts,
    trials=2,
    max_decomp=64,
    be=None,
) -> list:
    """Grid-search scheme-switch radix parameters, measuring output GGSW
    noise per candidate (≙ op_noise/scheme_switch.rs:48-105
    search_scheme_switch). Returns one dict per (radix_log, count) with
    the input GLEV and output GGSW noise stds (log2, normalized torus)
    and wall time; candidates whose total decomposition exceeds
    `max_decomp` bits are skipped like the reference's min/max_decomp
    window."""
    import time as _time

    from ..ops import scheme_switch as ss
    from ..ops.fft import C128
    from ..params import RadixDecomposition

    be = be or C128
    results = []
    msg = jnp.zeros((glwe.degree,), dtype=jnp.uint64).at[0].set(1)
    for count in counts:
        for radix_log in radix_logs:
            if radix_log * count > max_decomp:
                continue
            ss_radix = RadixDecomposition(count=count, radix_log=radix_log)
            kc = jax.random.fold_in(key, 1000 * count + radix_log)
            ssk_fft = ss.generate_scheme_switch_key(kc, glwe_sk, glwe, ss_radix, be)
            in_errs, out_errs = [], []
            t0 = _time.time()
            for t in range(trials):
                glev = enc.encrypt_glev(
                    jax.random.fold_in(kc, 7 + t), msg, glwe_sk, glwe, cbs_radix
                )
                shift = 64 - cbs_radix.radix_log * cbs_radix.count
                expected_in = u64_mul_shift(msg, shift)
                in_errs.append(
                    _signed_err(
                        enc.decrypt_glwe(glev[cbs_radix.count - 1], glwe_sk, glwe),
                        np.asarray(expected_in),
                    ).astype(np.float64)
                    / 2.0**64
                )
                ggsw_fft = fft_ops.scheme_switch_fft(
                    glev, ssk_fft, glwe, cbs_radix, ss_radix, be
                )
                ggsw = be.inv(ggsw_fft)
                out_errs.append(measure_noise_ggsw(ggsw, glwe_sk, glwe, cbs_radix))
            elapsed = _time.time() - t0
            in_std = float(np.concatenate(in_errs).std()) or 2.0**-64
            out_std = float(np.concatenate(out_errs).std()) or 2.0**-64
            results.append(
                {
                    "ss_radix_log": radix_log,
                    "ss_radix_count": count,
                    "log2_in_std": math.log2(in_std),
                    "log2_out_std": math.log2(out_std),
                    "time_s": elapsed,
                }
            )
    return results


def u64_mul_shift(msg, shift: int):
    return jnp.asarray(msg, dtype=jnp.uint64) * jnp.uint64((1 << shift) % (1 << 64))
