#!/usr/bin/env python
"""Microbenchmark the blind-rotation step components on the TPU at
DEFAULT_128 shapes (x32 limb pipeline), to find where the step time
goes. Run: SPF_TPU_X32=1 python scripts/tpu_step_microbench.py [B] [xla|pallas]
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
from spf_tpu.ops import bootstrap_u32 as bu, limb32 as lb
from spf_tpu.params import DEFAULT_128

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
USE_PALLAS = (sys.argv[2] if len(sys.argv) > 2 else "xla") == "pallas"
p = DEFAULT_128
glwe, lwe, radix = p.l1_params, p.l0_params, p.pbs_radix
N, K = glwe.degree, glwe.degree // 2
kp1 = glwe.size + 1
print(f"# B={B} pallas={USE_PALLAS} N={N}", flush=True)

rng = np.random.default_rng(0)
acc = lb.from_u64_np(rng.integers(0, 1 << 64, size=(kp1, N, B), dtype=np.uint64))
t_arr = jnp.asarray(rng.integers(0, 2 * N, size=(B,)), jnp.uint32)
row = tuple(
    jnp.asarray(rng.standard_normal((kp1, radix.count, kp1, K)).astype(np.float32) * 2**40)
    for _ in range(4)
)
ITERS = 50


def timed(name, fn, *args):
    f = jax.jit(lambda *a: jax.lax.fori_loop(
        0, ITERS, lambda i, c: fn(*((c,) + a[1:])), a[0]))
    t0 = time.time()
    out = f(*args)
    jax.block_until_ready(out)
    compile_t = time.time() - t0
    t0 = time.time()
    out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / ITERS
    print(f"{name:24s} {dt*1e6:9.0f} us/call   (compile+1st {compile_t:.1f}s)",
          flush=True)
    return dt


# full cmux step (monomial + cmux)
def full_step(acc):
    rotated = bu.monomial_mul_u32(acc, t_arr)
    return bu.cmux_u32(acc, rotated, row, glwe, radix, use_pallas=USE_PALLAS)


# components (each folds its result back into the carry so XLA cannot
# dead-code-eliminate the work)
def _mix(acc, arr):
    return (acc[0] + arr.sum().astype(jnp.uint32), acc[1])


def mono_only(acc):
    return bu.monomial_mul_u32(acc, t_arr)


def decomp_only(acc):
    return _mix(acc, lb.decompose(acc, radix))


def fwd_only(acc):
    d = lb.decompose(acc, radix)
    f = bu.fwd_signed(d, use_pallas=USE_PALLAS)
    return _mix(acc, f[0])


def extprod_only(acc):
    f = bu.external_product_u32(acc, row, glwe, radix, use_pallas=USE_PALLAS)
    return _mix(acc, f[0])


def cmux_only(acc):
    return bu.cmux_u32(acc, acc, row, glwe, radix, use_pallas=USE_PALLAS)


from spf_tpu.ops.rot_decomp_pallas import rotate_sub_decompose


def fused_rot_decomp(acc):
    return _mix(acc, rotate_sub_decompose(acc, t_arr, radix))


def fused_step(acc):
    digits_f = rotate_sub_decompose(acc, t_arr, radix)
    dfft = (
        bu.fwd_signed(digits_f, use_pallas=True)
        if USE_PALLAS
        else bu._fwd_ds_xla(digits_f, jnp.zeros_like(digits_f))
    )
    prod_f = bu.freq_mad(dfft, row, glwe, radix)
    prod = bu.inv_limb(prod_f, use_pallas=USE_PALLAS)
    return lb.add(acc, prod)


def fwd_digits_only(acc):
    digits_f = rotate_sub_decompose(acc, t_arr, radix)
    f = (
        bu.fwd_signed(digits_f, use_pallas=True)
        if USE_PALLAS
        else bu._fwd_ds_xla(digits_f, jnp.zeros_like(digits_f))
    )
    return _mix(acc, f[0])


accf = tuple(
    jnp.asarray(rng.standard_normal((kp1, K, B)).astype(np.float32) * s)
    for s in (2**40, 1.0, 2**40, 1.0)
)


def inv_tail(acc):
    prod = bu.inv_limb(accf, use_pallas=USE_PALLAS)
    return lb.add(acc, prod)


timed("monomial_mul", mono_only, acc)
timed("decompose", decomp_only, acc)
timed("decompose+fwd", fwd_only, acc)
timed("external_product(+fwd)", extprod_only, acc)
timed("cmux (full)", cmux_only, acc)
timed("step (mono+cmux)", full_step, acc)
timed("rot_decomp (pallas fused)", fused_rot_decomp, acc)
timed("rot_decomp+fwd", fwd_digits_only, acc)
timed("inv+from_ds+add tail", inv_tail, acc)
timed("step (fused u32f)", fused_step, acc)
print("MICRO_OK", flush=True)


# ---- phase-rotation step components ----
from spf_tpu.ops import phase_rot as prm
from spf_tpu.ops.rot_decomp_pallas import accumulate_decompose

accf_pair = (accf[0], accf[1])
PERM = prm.scrambled_perm(K) if USE_PALLAS else None


def accdec_only(acc):
    d, acc2 = accumulate_decompose(acc, accf_pair, radix)
    return _mix(acc2, d)


def pm1_only(acc):
    pm1 = prm.phase_minus_one(t_arr, N, PERM)
    return _mix(acc, pm1[0])


def phase_step(acc):
    digits_f, acc = accumulate_decompose(acc, accf_pair, radix)
    dfft = (
        bu.fwd_signed(digits_f, use_pallas=True)
        if USE_PALLAS
        else bu._fwd_ds_xla(digits_f, jnp.zeros_like(digits_f))
    )
    pm1 = prm.phase_minus_one(t_arr, N, PERM)
    from spf_tpu.ops.fft_ds32_t import _cmul
    dfft = _cmul(dfft, pm1)
    prod_f = bu.freq_mad(dfft, row, glwe, radix)
    prod = bu._inv_ds_xla(prod_f) if not USE_PALLAS else __import__("spf_tpu.ops.fft_pallas", fromlist=["x"]).inv_ds(prod_f)
    return lb.add(acc, lb.from_ds(*prod))


# gather-based phase: index matrix + 4 takes from the 2N table
import numpy as _np
_tabs = tuple(jnp.asarray(c) for c in prm._psi_table_np(2 * N))
_m1m4 = jnp.asarray((1 - 4 * _np.arange(K)) % (4 * N), jnp.uint32)  # (1-4m) mod 4N


def pm1_gather(acc):
    idx = (t_arr[None, :] * _m1m4[:, None]) & jnp.uint32(2 * N - 1)
    ph = tuple(jnp.take(c, idx.astype(jnp.int32), axis=0) for c in _tabs)
    return _mix(acc, ph[0])


timed("accdec kernel (phase)", accdec_only, acc)
timed("pm1 doubling", pm1_only, acc)
timed("pm1 gather", pm1_gather, acc)
timed("phase step (full)", phase_step, acc)
print("PHASE_MICRO_OK", flush=True)
