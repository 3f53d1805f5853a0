#!/usr/bin/env python
"""Find the ~450 us/group gap between the standalone multi-bit step body
(789 us) and the in-loop measurement (1242 us) at DEFAULT_128, B=256,
g=3. Variants toggle dynamic slicing of the BSK row / phase factors and
the FFT backend, all timed as 32-iteration fori_loop chains.

Run: SPF_TPU_X32=1 timeout 1800 python scripts/multibit_gap_ablation.py [B] [g]
"""
import os
import sys
import time

os.environ.setdefault("SPF_TPU_X32", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import spf_tpu  # noqa: F401
from spf_tpu.ops import bootstrap_u32 as bu
from spf_tpu.ops import fft_pallas as fp
from spf_tpu.ops import limb32 as lb
from spf_tpu.ops import multibit as mb
from spf_tpu.ops import phase_rot as pr
from spf_tpu.ops.rot_decomp_pallas import accumulate_decompose
from spf_tpu.params import DEFAULT_128

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
G = int(sys.argv[2]) if len(sys.argv) > 2 else 3
ITERS = 32
p = DEFAULT_128
glwe, lwe, radix = p.l1_params, p.l0_params, p.pbs_radix
N, K = glwe.degree, glwe.degree // 2
kp1 = glwe.size + 1
l = radix.count
ns = (1 << G) - 1
ng = mb.n_groups(lwe.dim, G)
print(f"# B={B} g={G} ns={ns} ng={ng}", flush=True)

rng = np.random.default_rng(0)
acc = lb.from_u64_np(rng.integers(0, 1 << 64, size=(kp1, N, B), dtype=np.uint64))
prod0 = (
    jnp.asarray(rng.standard_normal((kp1, N, B)).astype(np.float32) * 2**30),
    jnp.asarray(rng.standard_normal((kp1, N, B)).astype(np.float32) * 2**6),
)
# FULL stacked key + phases, like the real loop
bsk_mb = tuple(
    jnp.asarray(
        rng.standard_normal((ng, ns, kp1, l, kp1, K)).astype(np.float32) * 2**40
    )
    for _ in range(4)
)
a_steps = jnp.asarray(rng.integers(0, 2 * N, size=(ng * G, B)), jnp.uint32)
ph_lo, ph_hi = pr.phase_factors_all(a_steps, N, False)
ph_lo = tuple(c.reshape(ng, G, *c.shape[1:]) for c in ph_lo)
ph_hi = tuple(c.reshape(ng, G, *c.shape[1:]) for c in ph_hi)

TINY = np.float32(1e-38)


def body_at(acc_prod, t, use_pallas, bsk=None, plo=None, phi=None):
    """One group step exactly as `blind_rotate_multibit_u32.body` (t may
    be traced or a python int). Big operands come in as jit ARGUMENTS
    (closure constants blow the remote-compile request size limit)."""
    bsk = bsk_mb if bsk is None else bsk
    plo = ph_lo if plo is None else plo
    phi = ph_hi if phi is None else phi
    acc_c, prod = acc_prod
    digits_f, acc2 = accumulate_decompose(acc_c, prod, radix)
    dfft = (
        fp.fwd_ds(digits_f, jnp.zeros_like(digits_f))
        if use_pallas
        else bu._fwd_ds_xla(digits_f, jnp.zeros_like(digits_f))
    )
    lo_t = tuple(c[t] for c in plo)
    hi_t = tuple(c[t] for c in phi)
    u = [
        pr.combine_phase_minus_one(
            tuple(c[j] for c in lo_t), tuple(c[j] for c in hi_t)
        )
        for j in range(G)
    ]
    row = tuple(c[t] for c in bsk)
    mads = [
        bu.freq_mad(dfft, tuple(c[m] for c in row), glwe, radix)
        for m in range(ns)
    ]
    prod_f = mb._nested_subset_sum(mads, u, G)
    prod2 = fp.inv_ds(prod_f) if use_pallas else bu._inv_ds_xla(prod_f)
    return acc2, prod2


def timed_loop(name, body):
    # big arrays ride as jit ARGUMENTS: closure constants are shipped in
    # the remote-compile request and exceed its size limit (HTTP 413)
    jf = jax.jit(
        lambda c0, bsk, plo, phi: jax.lax.fori_loop(
            0, ITERS, lambda i, c: body(c, i, bsk, plo, phi), c0
        )
    )
    init = (acc, prod0)
    t0 = time.time()
    out = jf(init, bsk_mb, ph_lo, ph_hi)
    jax.block_until_ready(out)
    ct = time.time() - t0
    times = []
    for i in range(4):
        # perturb EVERY argument: the relay memoizes value-identical
        # (executable, args) resubmissions
        c0 = jax.tree_util.tree_map(lambda x: x + x.dtype.type(i + 1), init)
        b0 = jax.tree_util.tree_map(lambda x: x + np.float32(i + 1), bsk_mb)
        p0 = jax.tree_util.tree_map(
            lambda x: x + np.float32((i + 1) * 1e-30), ph_lo
        )
        t0 = time.time()
        out = jf(c0, b0, p0, ph_hi)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    per = (min(times) - 0.026) / ITERS
    print(f"{name:42s} {per*1e6:9.0f} us/iter  (compile {ct:.1f}s)"
          f"  raw={[round(t*1e3) for t in times]}ms",
          flush=True)
    return per


# pre-sliced (eager) single-step row + phases for the "static" variants:
# slicing the 785 MB closure constants with a STATIC index inside jit
# sends XLA constant folding into a >29 min compile — slice eagerly
row_s = tuple(c[0] for c in bsk_mb)
ph_lo_s = tuple(c[0] for c in ph_lo)
ph_hi_s = tuple(c[0] for c in ph_hi)


def body_static(acc_prod, use_pallas, row_s, ph_lo_s, ph_hi_s):
    acc_c, prod = acc_prod
    digits_f, acc2 = accumulate_decompose(acc_c, prod, radix)
    dfft = (
        fp.fwd_ds(digits_f, jnp.zeros_like(digits_f))
        if use_pallas
        else bu._fwd_ds_xla(digits_f, jnp.zeros_like(digits_f))
    )
    u = [
        pr.combine_phase_minus_one(
            tuple(c[j] for c in ph_lo_s), tuple(c[j] for c in ph_hi_s)
        )
        for j in range(G)
    ]
    mads = [
        bu.freq_mad(dfft, tuple(c[m] for c in row_s), glwe, radix)
        for m in range(ns)
    ]
    prod_f = mb._nested_subset_sum(mads, u, G)
    prod2 = fp.inv_ds(prod_f) if use_pallas else bu._inv_ds_xla(prod_f)
    return acc2, prod2


# 1. dynamic index = loop counter mod ng (real-loop slicing)
timed_loop(
    "body, dynamic row+phases",
    lambda c, i, bsk, plo, phi: body_at(c, jnp.mod(i, ng), False, bsk, plo, phi),
)
# 2. dynamic + pallas FFT
timed_loop(
    "body, dynamic, pallas fft",
    lambda c, i, bsk, plo, phi: body_at(c, jnp.mod(i, ng), True, bsk, plo, phi),
)
# 3. static (pre-sliced) row + phases: slice eagerly OUTSIDE jit, pass
# the small slices as arguments too
timed_loop(
    "body, static row+phases",
    lambda c, i, bsk, plo, phi: body_static(
        c, False, row_s, ph_lo_s, ph_hi_s
    ),
)
# 4. static + pallas FFT
timed_loop(
    "body, static, pallas fft",
    lambda c, i, bsk, plo, phi: body_static(
        c, True, row_s, ph_lo_s, ph_hi_s
    ),
)
