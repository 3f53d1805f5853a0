#!/usr/bin/env python
"""Ablation of the multi-bit blind-rotation group step at DEFAULT_128
shapes. The axon relay has a ~26 ms per-dispatch latency floor, so each
component is timed as a 32-iteration `lax.fori_loop` chain inside ONE
jit (output mixed back into the carry with an absorbed tiny add, which
defeats DCE/CSE without changing values).

Run: SPF_TPU_X32=1 timeout 1800 python scripts/multibit_step_ablation.py [B] [g] [xla|pallas]
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
USE_PALLAS = (sys.argv[3] if len(sys.argv) > 3 else "xla") == "pallas"
ITERS = 32
p = DEFAULT_128
glwe, lwe, radix = p.l1_params, p.l0_params, p.pbs_radix
N, K = glwe.degree, glwe.degree // 2
kp1 = glwe.size + 1
l = radix.count
ns = (1 << G) - 1
print(f"# B={B} g={G} ns={ns} pallas={USE_PALLAS} N={N} l={l} iters={ITERS}",
      flush=True)

rng = np.random.default_rng(0)
acc = lb.from_u64_np(rng.integers(0, 1 << 64, size=(kp1, N, B), dtype=np.uint64))
prod_ds = (
    jnp.asarray(rng.standard_normal((kp1, N, B)).astype(np.float32) * 2**30),
    jnp.asarray(rng.standard_normal((kp1, N, B)).astype(np.float32) * 2**6),
)
digits_f = jnp.asarray(
    rng.integers(-(1 << 15), 1 << 15, size=(l, kp1, N, B)).astype(np.float32)
)
dfft_in = tuple(
    jnp.asarray(rng.standard_normal((l, kp1, K, B)).astype(np.float32) * 2**20)
    for _ in range(4)
)
row = tuple(
    jnp.asarray(
        rng.standard_normal((ns, kp1, l, kp1, K)).astype(np.float32) * 2**40
    )
    for _ in range(4)
)
f_out = tuple(
    jnp.asarray(rng.standard_normal((kp1, K, B)).astype(np.float32) * 2**40)
    for _ in range(4)
)
a_steps = jnp.asarray(rng.integers(0, 2 * N, size=(G, B)), jnp.uint32)
ph_lo_1, ph_hi_1 = pr.phase_factors_all(a_steps, N, USE_PALLAS)

TINY = np.float32(1e-38)


def fwd(h):
    z = jnp.zeros_like(h)
    return fp.fwd_ds(h, z) if USE_PALLAS else bu._fwd_ds_xla(h, z)


def inv(f):
    return fp.inv_ds(f) if USE_PALLAS else bu._inv_ds_xla(f)


def timed_loop(name, body, init):
    """body: carry -> carry (one unit of work, mixing output into carry)."""
    jf = jax.jit(
        lambda c0: jax.lax.fori_loop(0, ITERS, lambda i, c: body(c), c0)
    )
    t0 = time.time()
    out = jf(init)
    jax.block_until_ready(out)
    ct = time.time() - t0
    times = []
    for i in range(4):
        c0 = jax.tree_util.tree_map(lambda x: x + x.dtype.type(i + 1), init)
        t0 = time.time()
        out = jf(c0)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    floor = 0.026  # relay dispatch latency (measured)
    per = (min(times) - floor) / ITERS
    print(f"{name:28s} {per*1e6:9.0f} us/iter   (compile {ct:.1f}s,"
          f" total {min(times)*1e3:.0f} ms)", flush=True)
    return per


# -- components --
def accdec_body(a):
    digits, a2 = accumulate_decompose(a, prod_ds, radix)
    mix = (digits[0, 0] * TINY).astype(jnp.uint32)
    return (a2[0] + mix, a2[1])


timed_loop("accumulate_decompose", accdec_body, acc)


def fwd_body(d):
    f = fwd(d)
    mix = jnp.concatenate([f[0], f[2]], axis=-2) * TINY
    return d + mix


timed_loop("fwd_digit_fft[l,kp1]", fwd_body, digits_f)


def inv_body(f):
    hi, lo = inv(f)
    mix = hi[..., :K, :] * TINY
    return tuple(c + mix for c in f)


timed_loop("inv_fft[kp1]", inv_body, f_out)


def mads_body(dfft):
    outs = [
        bu.freq_mad(dfft, tuple(c[m] for c in row), glwe, radix)
        for m in range(ns)
    ]
    s = outs[0]
    for o in outs[1:]:
        s = tuple(a + b for a, b in zip(s, o))
    return tuple(d + c[None] * TINY for d, c in zip(dfft, s))


timed_loop(f"{ns}x freq_mad", mads_body, dfft_in)


def build_u(lo_t, hi_t):
    return [
        pr.combine_phase_minus_one(
            tuple(c[j] for c in lo_t), tuple(c[j] for c in hi_t)
        )
        for j in range(G)
    ]


def u_body(ph):
    lo_t, hi_t = ph
    us = build_u(lo_t, hi_t)
    mix = sum(u[0] for u in us) * TINY  # [K, B]
    lo2 = (lo_t[0] + mix[None, : lo_t[0].shape[1], :],) + tuple(lo_t[1:])
    return (lo2, hi_t)


timed_loop("build_u (g combines)", u_body, (ph_lo_1, ph_hi_1))


def horner_body(dfft):
    mads = [
        bu.freq_mad(dfft, tuple(c[m] for c in row), glwe, radix)
        for m in range(ns)
    ]
    u = build_u(ph_lo_1, ph_hi_1)
    s = mb._nested_subset_sum(mads, u, G)
    return tuple(d + c[None] * TINY for d, c in zip(dfft, s))


timed_loop("mads+u+horner", horner_body, dfft_in)


def full_body(a):
    digits_f2, acc2 = accumulate_decompose(a, prod_ds, radix)
    dfft = fwd(digits_f2)
    mads = [
        bu.freq_mad(dfft, tuple(c[m] for c in row), glwe, radix)
        for m in range(ns)
    ]
    u = build_u(ph_lo_1, ph_hi_1)
    s = mb._nested_subset_sum(mads, u, G)
    hi, lo = inv(s)
    mix = (hi * TINY).astype(jnp.uint32)
    return (acc2[0] + mix, acc2[1])


timed_loop("full body (1 step)", full_body, acc)

# full blind rotation for ground truth
ct_sw = jnp.asarray(
    np.concatenate(
        [
            rng.integers(0, 2 * N, size=(lwe.dim, B)),
            rng.integers(0, 2 * N, size=(1, B)),
        ]
    ).astype(np.uint32)
)
lut_limb = lb.from_u64_np(rng.integers(0, 1 << 64, size=(kp1, N), dtype=np.uint64))
ng = mb.n_groups(lwe.dim, G)
bsk_mb = tuple(
    jnp.asarray(
        rng.standard_normal((ng, ns, kp1, l, kp1, K)).astype(np.float32) * 2**40
    )
    for _ in range(4)
)


def full_rot(c):
    lut_t = tuple(x[..., None] for x in lut_limb)
    return mb.blind_rotate_multibit_u32(
        lut_t, c, bsk_mb, lwe, glwe, radix, G, use_pallas=USE_PALLAS
    )


jf = jax.jit(full_rot)
t0 = time.time()
out = jf(ct_sw)
jax.block_until_ready(out)
print(f"# full rotation compile+1st: {time.time()-t0:.1f}s", flush=True)
times = []
for i in range(4):
    c0 = ct_sw + np.uint32(i + 1)
    t0 = time.time()
    out = jf(c0)
    jax.block_until_ready(out)
    times.append(time.time() - t0)
best = min(times)
print(f"FULL blind rotation          {best*1e6:9.0f} us", flush=True)
print(f"# per-group step: {best/ng*1e6:.0f} us  ({ng} groups)", flush=True)
print(f"# implied PBS/s at B={B}: {B/best:.0f}", flush=True)
