"""Frequency-domain monomial rotation for the blind-rotation hot loop.

The standard blind-rotation step rotates the accumulator by a
per-ciphertext monomial X^t in the coefficient domain (12 bit-selected
roll/select rounds at N=2048 — the most expensive part of the fused
step kernel) and then gadget-decomposes the difference. This module
eliminates the coefficient-domain rotation entirely:

1. **Decomposition commutes with negacyclic monomial multiplication.**
   Gadget decomposition is per-coefficient, and X^t permutes
   coefficients with sign flips, so rot(decompose(acc)) is a valid
   decomposition of rot(acc): it reconstructs rot(acc - e_dec) =
   rot(acc) - rot(e_dec), whose reconstruction error rot(e_dec) has
   exactly the bound of e_dec. (Sign flips negate digits; balanced
   signed digits in [-B/2, B/2) are closed under negation up to the
   -B/2 tie, which only re-rounds within the same error bound.)
2. **The rotation is diagonal in the frequency domain.** The twisted
   negacyclic FFT (`fft_ds32_t`) evaluates a polynomial at
   psi^(1-4m), psi = e^(i*pi/N), for natural-order bin m (verified in
   tests), so multiplying by X^t multiplies bin m by
   phase[m] = psi^(t*(1-4m) mod 2N).
3. **The phase factors out of the external-product MAD** (it is
   constant across decomposition rows), so the whole per-step rotation
   collapses to ONE pointwise multiply of the k+1 MAD outputs by
   (phase - 1):

       step: acc += IFFT( (phase(a_i) - 1) * MAD(FFT(decomp(acc)), BSK_i) )

The phase vector is built without transcendentals or gathers-per-bin:
phase[m] = C * Q^m is a geometric sequence, and C = psi^t together
with every doubling factor Q^(2^j) = psi^(-4t*2^j mod 2N) are exact
lookups into one precomputed 2N-entry double-single table, so each bin
accumulates at most log2(N/2) ds complex-multiply roundings (~2^-43
relative — the same class as the FFT twiddle error).

≙ reference `rotate_glwe_positive_monomial_negacyclic` + the cmux
decomposition of `programmable_bootstrapping.rs:385-409` — re-derived
for TPU, where data-dependent coefficient rotations are selects/rolls
(expensive) but pointwise complex arithmetic is native.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import ds
from .fft_ds32_t import _cmul

U32 = jnp.uint32


@functools.lru_cache(maxsize=8)
def _psi_table_np(two_n: int):
    """ds components of psi^s = e^(2*pi*i*s/two_n), s in [0, two_n)."""
    s = np.arange(two_n)
    w = np.exp(2j * np.pi * s / two_n)
    return (*ds.from_f64_array(w.real), *ds.from_f64_array(w.imag))


@functools.lru_cache(maxsize=8)
def scrambled_perm(k: int):
    """Permutation sigma with pallas_fwd(x)[r] == natural_fwd(x)[sigma[r]]
    for the scrambled-frequency (DIF roll) kernels in `fft_pallas`.

    Derived numerically: simulate the kernel's roll/select DIF stages in
    complex128 and match bins against the natural-order DFT. (It is the
    plain bit-reversal permutation; the simulation keeps this correct by
    construction if the kernel formulation ever changes.)
    """
    rng = np.random.default_rng(12345)
    x = rng.standard_normal(k) + 1j * rng.standard_normal(k)
    vals = x.copy()
    r = np.arange(k)
    for m in [1 << s for s in range(int(np.log2(k)), 0, -1)]:
        half = m // 2
        pos = r % m
        is_a = pos < half
        n_idx = np.where(is_a, pos, pos - half)
        w = np.exp(-2j * np.pi * n_idx / m)
        up = np.roll(vals, -half)
        down = np.roll(vals, half)
        vals = np.where(is_a, vals + up, (down - vals) * w)
    nat = np.fft.fft(x)  # same negative-exponent convention
    perm = np.empty(k, dtype=np.int32)
    for i in range(k):
        perm[i] = int(np.argmin(np.abs(nat - vals[i])))
    assert len(set(perm.tolist())) == k, "scrambled bin matching failed"
    assert np.allclose(nat[perm], vals, rtol=1e-9, atol=1e-6)
    return perm


def _seed_factors(t: jnp.ndarray, n: int):
    """C = psi^t [B] and the doubling factors q_j = psi^(-4t*2^j) [J, B]
    (exact table lookups), J = log2(n/2)."""
    two_n = 2 * n
    k = n // 2
    tabs = tuple(jnp.asarray(c) for c in _psi_table_np(two_n))
    t = t.astype(U32)
    mask = U32(two_n - 1)

    def look(idx):
        return tuple(jnp.take(c, idx.astype(jnp.int32), axis=0) for c in tabs)

    c0 = look(t & mask)
    j_count = int(np.log2(k))
    qidx = jnp.stack(
        [(U32(0) - (t << U32(2 + j))) & mask for j in range(j_count)], axis=0
    )
    qs = look(qidx)  # [J, B] per component
    return c0, qs


def _phase_kernel(c_ref, q_ref, orh, orl, oih, oil, *scratch, k):
    """VMEM-resident geometric doubling: out[m] = C * prod q_j^bit_j(m),
    then -1 on the real part. c_ref [4, 1, B], q_ref [4, J, B]. The
    doubling writes static row-slices of 4 VMEM scratch buffers [K, B]
    (value-level concat doubling blew Mosaic's compile; slice stores are
    the `_stages_scratch` pattern that compiles fine)."""
    j_count = int(np.log2(k))
    for c in range(4):
        scratch[c][0:1, :] = c_ref[c]
    for j in range(j_count):
        m = 1 << j
        qj = tuple(q_ref[c, j][None, :] for c in range(4))  # [1, B]
        low = tuple(scratch[c][0:m, :] for c in range(4))
        shifted = _cmul(low, qj)
        for c in range(4):
            scratch[c][m:2 * m, :] = shifted[c]
    cur = [scratch[c][...] for c in range(4)]
    rh, rl = _ds_add_neg1(cur[0], cur[1])
    orh[...] = rh
    orl[...] = rl
    oih[...] = cur[2]
    oil[...] = cur[3]


def _ds_add_neg1(rh, rl):
    from . import ds as _ds

    return _ds.add(rh, rl, jnp.float32(-1.0), jnp.float32(0.0))


def phase_minus_one_pallas(t: jnp.ndarray, n: int, perm: np.ndarray | None = None,
                           interpret: bool = False):
    """Pallas variant of `phase_minus_one`: the geometric doubling runs
    VMEM-resident (the XLA concat-doubling is serial and HBM-bound,
    measured ~90 us marginal per blind-rotation step at B=256).

    STATUS: EXPERIMENTAL — kernel math verified in interpret mode, but
    Mosaic compilation of the doubling (both a value-level concat and a
    scratch slice-store formulation) hung the jax-0.9.0 axon
    remote-compile service indefinitely. Not used on the production
    path (`bootstrap_u32` uses the XLA generator) until the toolchain
    moves; revisit alongside `fft_pallas`'s compile notes."""
    from jax.experimental import pallas as pl

    k = n // 2
    b = t.shape[0]
    c0, qs = _seed_factors(t, n)
    c_in = jnp.stack([c[None, :] for c in c0], axis=0)  # [4, 1, B]
    q_in = jnp.stack(qs, axis=0)  # [4, J, B]
    lanes = 128
    assert b % lanes == 0, b
    grid = (b // lanes,)
    j_count = int(np.log2(k))
    import functools as _ft

    from jax.experimental.pallas import tpu as pltpu

    kern = _ft.partial(_phase_kernel, k=k)
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, 1, lanes), lambda i: (0, 0, i)),
            pl.BlockSpec((4, j_count, lanes), lambda i: (0, 0, i)),
        ],
        out_specs=[pl.BlockSpec((k, lanes), lambda i: (0, i))] * 4,
        out_shape=[jax.ShapeDtypeStruct((k, b), jnp.float32)] * 4,
        scratch_shapes=[pltpu.VMEM((k, lanes), jnp.float32) for _ in range(4)],
        interpret=interpret,
    )(c_in, q_in)
    if perm is not None:
        idx = jnp.asarray(perm)
        outs = tuple(jnp.take(c, idx, axis=0) for c in outs)
    return tuple(outs)


def phase_minus_one_outer(t: jnp.ndarray, n: int,
                          bit_images: tuple[int, ...] | None = None):
    """(phase(t) - 1) as a ds freq tuple [K, B], built as an OUTER
    PRODUCT instead of the serial concat-doubling: split the K index
    bits into low/high halves, build each half's geometric table by
    doubling at [2^(J/2), B] (tiny), and combine with one broadcast
    complex multiply [K_hi, K_lo, B] -> reshape [K, B]. The serial
    doubling materializes log2(K) growing arrays to HBM (~90 us marginal
    per blind-rotation step at B=256); this is one pass.

    `bit_images` permutes bin order for a bit-permuted scrambled
    backend exactly as in `phase_minus_one` (level j of the combined
    doubling uses Q^f(2^j))."""
    two_n = 2 * n
    k = n // 2
    j_count = int(np.log2(k))
    tabs = tuple(jnp.asarray(c) for c in _psi_table_np(two_n))
    t = t.astype(U32)
    mask = U32(two_n - 1)

    def look(idx):
        return tuple(jnp.take(c, idx.astype(jnp.int32), axis=0) for c in tabs)

    def img(j):
        return (1 << j) if bit_images is None else bit_images[j]

    def doubling(j_lo, j_hi, seed):
        seq = tuple(c[None, :] for c in seed)  # [1, B]
        for j in range(j_lo, j_hi):
            qj = look((U32(0) - t * U32((4 * img(j)) % (2 * two_n))) & mask)
            shifted = _cmul(seq, tuple(c[None, :] for c in qj))
            seq = tuple(
                jnp.concatenate([a, b], axis=0) for a, b in zip(seq, shifted)
            )
        return seq

    j_half = j_count // 2
    one = (jnp.ones_like(t, jnp.float32), jnp.zeros_like(t, jnp.float32),
           jnp.zeros_like(t, jnp.float32), jnp.zeros_like(t, jnp.float32))
    lo = doubling(0, j_half, look(t & mask))  # C * Q^(low bits)  [Klo, B]
    hi = doubling(j_half, j_count, one)  # Q^(high bits)          [Khi, B]
    full = _cmul(
        tuple(c[:, None, :] for c in hi), tuple(c[None, :, :] for c in lo)
    )  # [Khi, Klo, B]; r = rh * Klo + rl
    seq = tuple(c.reshape(k, -1) for c in full)
    rh, rl = ds.add(seq[0], seq[1], jnp.float32(-1.0), jnp.float32(0.0))
    return (rh, rl, seq[2], seq[3])


def fence(x: jnp.ndarray) -> jnp.ndarray:
    """Identity through a trivial Pallas copy kernel — an optimization
    FENCE: XLA cannot rematerialize a producer through a custom call,
    so the fenced value is materialized exactly once. Used to pin the
    hoisted per-step phase factors outside the blind-rotation
    `fori_loop`: XLA's while-loop rematerialization otherwise recomputes
    parts of the doubling chain every iteration (measured +250 us/group
    at DEFAULT_128, B=256, g=3 — `scripts/gap_probe2.py`; an
    `optimization_barrier` does NOT stop it). TPU only; identity
    elsewhere."""
    from jax.experimental import pallas as pl

    m = x.shape[0]
    rest = x.shape[1:]

    def _copy(s_ref, d_ref):
        d_ref[...] = s_ref[...]

    def _tpu(v):
        return pl.pallas_call(
            _copy,
            grid=(m,),
            in_specs=[
                pl.BlockSpec((1,) + rest, lambda i: (i,) + (0,) * len(rest))
            ],
            out_specs=pl.BlockSpec(
                (1,) + rest, lambda i: (i,) + (0,) * len(rest)
            ),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(v)

    # Branch by the LOWERING platform (advisor r4): a TPU process that
    # places this computation on CPU must take the identity path, and
    # vice versa — `jax.devices()[0]` only reflects the process default.
    return jax.lax.platform_dependent(x, tpu=_tpu, default=lambda v: v)


def backend_bit_images(n: int, use_pallas: bool):
    """Frequency-order bit images for a backend's scramble: position r
    holds natural bin f(r) = sum_j bit_j(r) * images[j]. The Pallas DIF
    roll kernels emit plain bit reversal (tested by
    `scrambled_perm`/`test_scrambled_perm_is_bitrev`); the XLA DIF/DIT
    pair a mixed-radix digit reversal (`fft_ds32_t.dif_bit_images`)."""
    k = n // 2
    j_count = int(np.log2(k))
    if use_pallas:
        return tuple(1 << (j_count - 1 - j) for j in range(j_count))
    from .fft_ds32_t import dif_bit_images

    return dif_bit_images(k)


@functools.lru_cache(maxsize=64)
def _psi_pow_consts(two_n: int, mult: int):
    """ds components of psi^(mult * 2^b mod two_n) for b in
    [0, log2(two_n)): the constant ladder for gather-free binary
    exponentiation of psi^(mult * t)."""
    bits = int(np.log2(two_n))
    e = (np.int64(mult) * (np.int64(1) << np.arange(bits))) % two_n
    w = np.exp(2j * np.pi * e.astype(np.float64) / two_n)
    return (*ds.from_f64_array(w.real), *ds.from_f64_array(w.imag))


def _psi_pow_of_t_multi(t: jnp.ndarray, mults: tuple, two_n: int):
    """psi^(mults[r] * t) for ALL r in one batched binary-exponentiation
    pass: returns a ds tuple of 4 f32 [R, *t.shape]. One 12-level chain
    of [R, steps, B] cmuls instead of R separate [steps, B] chains —
    the separate chains are LATENCY-bound on TPU ([639, 256] ops are
    too small to fill the VPU; measured ~25 ms for 11 chains vs ~1 ms
    batched)."""
    consts = [_psi_pow_consts(two_n, m % two_n) for m in mults]
    bits = int(np.log2(two_n))
    r = len(mults)
    one = jnp.ones((r,) + t.shape, jnp.float32)
    zero = jnp.zeros((r,) + t.shape, jnp.float32)
    acc = None
    for b in range(bits):
        on = (((t >> U32(b)) & U32(1)) > 0)[None]  # [1, steps, B]
        shape_c = (r,) + (1,) * t.ndim
        cb = [
            jnp.asarray(
                np.array([c[comp][b] for c in consts], np.float32)
            ).reshape(shape_c)
            for comp in range(4)
        ]
        fac = (
            jnp.where(on, cb[0], one),
            jnp.where(on, cb[1], zero),
            jnp.where(on, cb[2], zero),
            jnp.where(on, cb[3], zero),
        )
        acc = fac if acc is None else _cmul(acc, fac)
    return acc


def _psi_pow_of_t(t: jnp.ndarray, mult: int, two_n: int):
    """psi^(mult * t) for u32 t [..] as a ds complex tuple, via binary
    exponentiation over t's log2(two_n) bits with CONSTANT per-bit
    factors — zero gathers. TPU gathers are ~100x slower than the
    equivalent select+cmul chain: the gather-based `look` formulation
    measured 107 ms for the full DEFAULT_128 phase-factor block
    (`scripts/phase_cost_probe.py`); this form is pure VPU work.
    Accumulates <= log2(two_n) cmul roundings (~2^-45), the same class
    as the doubling chain it feeds."""
    consts = _psi_pow_consts(two_n, mult % two_n)
    bits = int(np.log2(two_n))
    one = jnp.ones_like(t, jnp.float32)
    zero = jnp.zeros_like(t, jnp.float32)
    acc = None
    for b in range(bits):
        on = ((t >> U32(b)) & U32(1)) > 0
        cb = tuple(np.float32(c[b]) for c in consts)
        fac = (
            jnp.where(on, cb[0], one),
            jnp.where(on, cb[1], zero),
            jnp.where(on, cb[2], zero),
            jnp.where(on, cb[3], zero),
        )
        acc = fac if acc is None else _cmul(acc, fac)
    return acc


def phase_factors_all(a: jnp.ndarray, n: int, use_pallas: bool):
    """Hoisted per-step OUTER-PRODUCT FACTORS of the rotation phases:
    a u32 [steps, B] -> (lo, hi), ds tuples of 4 f32 [steps, Klo, B] /
    [steps, Khi, B], such that for every step

        phase[r] = hi[r // Klo] * lo[r % Klo]        (before the -1)

    in the chosen backend's frequency order. The full [steps, K, B]
    table costs ~2.7 GB of HBM traffic + a large transpose at
    DEFAULT_128 B=256 (measured SLOWER than in-loop generation);
    the factors are K/ (Klo+Khi) ~ 16x smaller, and the in-loop
    `combine_phase_minus_one` is one broadcast complex multiply
    (~one poly-mul, vs ~90 us for the serial in-loop doubling)."""
    steps, bb = a.shape
    two_n = 2 * n
    k = n // 2
    j_count = int(np.log2(k))
    j_half = j_count // 2
    images = backend_bit_images(n, use_pallas)
    # keep [steps, B] unflattened: merging the lane axis into a bigger
    # one would defeat lane sharding (the multi-chip u32 pipeline shards
    # the LAST axis; a [steps*B] reshape makes XLA gather across chips)
    t = a.astype(U32)

    # On TPU every factor psi^(c * t) is built GATHER-FREE by ONE
    # batched binary-exponentiation chain over all multipliers
    # (`_psi_pow_of_t_multi`): the psi-table gathers of the round-3
    # formulation cost ~20 ms on TPU (scripts/phase_cost_probe.py), and
    # the TPU backend performs no FP contraction, so the ds chain stays
    # error-free. XLA:CPU fusion PERTURBS the ds compensation terms of
    # the chain (~1e-7 jit-vs-eager diffs measured -> ~2^60 cycle
    # errors), so CPU keeps the exact-table-lookup seeds (gathers are
    # fast on CPU and each factor carries ONE rounding). The branch is
    # selected by the LOWERING platform (`lax.platform_dependent`), not
    # the process default device (advisor r4): computation explicitly
    # placed on CPU inside a TPU process takes the CPU-safe path.
    def _factors_tpu(t):
        mults = (1,) + tuple(-4 * int(images[j]) for j in range(j_count))
        fac = _psi_pow_of_t_multi(t, mults, two_n)  # [1+j_count, steps, B]
        seed = tuple(c[0] for c in fac)
        qjs = [tuple(c[1 + j] for c in fac) for j in range(j_count)]
        return seed, qjs

    def _factors_cpu(t):
        two_n_mask = U32(two_n - 1)
        tabs = tuple(jnp.asarray(c) for c in _psi_table_np(two_n))

        def look(idx):
            return tuple(
                jnp.take(c, idx.astype(jnp.int32), axis=0) for c in tabs
            )

        seed = look(t & two_n_mask)
        qjs = [
            look(
                (U32(0) - t * U32((4 * int(images[j])) % (2 * two_n)))
                & two_n_mask
            )
            for j in range(j_count)
        ]
        return seed, qjs

    seed, qjs = jax.lax.platform_dependent(
        t, tpu=_factors_tpu, default=_factors_cpu
    )

    def doubling(j_lo, j_hi, seed):
        seq = tuple(c[None] for c in seed)  # [1, steps, B]
        for j in range(j_lo, j_hi):
            qj = qjs[j]
            shifted = _cmul(seq, tuple(c[None] for c in qj))
            seq = tuple(
                jnp.concatenate([x, y], axis=0) for x, y in zip(seq, shifted)
            )
        return tuple(jnp.moveaxis(c, 0, 1) for c in seq)  # [steps, m, B]

    one = (jnp.ones_like(t, jnp.float32), jnp.zeros_like(t, jnp.float32),
           jnp.zeros_like(t, jnp.float32), jnp.zeros_like(t, jnp.float32))
    lo = doubling(0, j_half, seed)  # C * Q^(low bits)
    hi = doubling(j_half, j_count, one)  # Q^(high bits)
    return lo, hi


def combine_phase_minus_one(lo_t, hi_t):
    """One step's (phase - 1) from its factors: lo_t [Klo, B] ds tuple,
    hi_t [Khi, B] -> ds tuple [K, B] (r = rh * Klo + rl)."""
    klo = lo_t[0].shape[0]
    khi = hi_t[0].shape[0]
    full = _cmul(
        tuple(c[:, None, :] for c in hi_t), tuple(c[None, :, :] for c in lo_t)
    )  # [Khi, Klo, B]
    seq = tuple(c.reshape(khi * klo, -1) for c in full)
    rh, rl = ds.add(seq[0], seq[1], jnp.float32(-1.0), jnp.float32(0.0))
    return (rh, rl, seq[2], seq[3])


def phase_minus_one(t: jnp.ndarray, n: int, perm: np.ndarray | None = None,
                    bit_images: tuple[int, ...] | None = None):
    """(phase(t) - 1) as a ds freq tuple of 4 f32 arrays [K, B].

    t: u32 [B] rotation exponents in [0, 2N). `perm` reorders the
    natural-order bins for a scrambled-frequency backend (`fft_pallas`)
    via a gather. `bit_images` builds the sequence DIRECTLY in a
    bit-permuted frequency order with zero gathers: for a scramble
    f(r) = sum_j bit_j(r) * f(2^j) (any bit permutation — see
    `fft_ds32_t.dif_bit_images`), doubling level j multiplies by
    Q^f(2^j) instead of Q^(2^j), so position r accumulates exactly
    C * Q^f(r).
    """
    two_n = 2 * n
    k = n // 2
    tabs = tuple(jnp.asarray(c) for c in _psi_table_np(two_n))
    t = t.astype(U32)
    mask = U32(two_n - 1)

    def look(idx):
        return tuple(jnp.take(c, idx.astype(jnp.int32), axis=0) for c in tabs)

    # seq[m] = C * Q^m, C = psi^t, Q = psi^(-4t); every doubling factor
    # Q^(2^j) = psi^(-4t*2^j mod 2N) is an exact table lookup
    seq = tuple(c[None, :] for c in look(t & mask))  # [1, B]
    m_len = 1
    j = 0
    while m_len < k:
        img = (1 << j) if bit_images is None else bit_images[j]
        qj = look((U32(0) - t * U32((4 * img) % (2 * two_n))) & mask)
        shifted = _cmul(seq, tuple(c[None, :] for c in qj))
        seq = tuple(jnp.concatenate([a, b], axis=0) for a, b in zip(seq, shifted))
        m_len *= 2
        j += 1
    if perm is not None:
        idx = jnp.asarray(perm)
        seq = tuple(jnp.take(c, idx, axis=0) for c in seq)
    # subtract 1 from the real component (exact two_sum)
    rh, rl = ds.add(seq[0], seq[1], jnp.float32(-1.0), jnp.float32(0.0))
    return (rh, rl, seq[2], seq[3])
