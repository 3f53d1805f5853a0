#!/usr/bin/env python
"""MXU probe for the int8/int16 CRT-NTT question (VERDICT round 3 #2).

Measures, on hardware:
 1. achievable matmul rates for i8/i16/bf16/f32 at NTT-relevant shapes;
 2. the cost of the pointwise mod-p glue (recombine + Barrett reduce);
 3. a full four-step negacyclic NTT mod p (matmul form) vs the ds32
    FFT at the same logical shape (the production transform).

Everything is timed as 32-iteration fori_loop chains (the axon relay
has a ~26 ms dispatch floor).

Run: SPF_TPU_X32=1 timeout 1800 python scripts/probe_mxu_ntt.py
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

ITERS = 32
N, B = 2048, 256
P = 12289  # 2N | p-1: negacyclic NTT exists


def timed_loop(name, body, init, work_desc=""):
    jf = jax.jit(lambda c0: jax.lax.fori_loop(0, ITERS, lambda i, c: body(c), c0))
    t0 = time.time()
    out = jf(init)
    jax.block_until_ready(out)
    ct = time.time() - t0
    times = []
    for i in range(4):
        c0 = jax.tree_util.tree_map(lambda x: x + x.dtype.type(1), init)
        t0 = time.time()
        out = jf(c0)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    per = (min(times) - 0.026) / ITERS
    print(f"{name:36s} {per*1e6:9.1f} us/iter {work_desc}", flush=True)
    return per


rng = np.random.default_rng(0)

# --- 1. raw matmul rates: W [N, N] @ X [N, B] ---
w8 = jnp.asarray(rng.integers(-127, 128, size=(N, N)), jnp.int8)
x8 = jnp.asarray(rng.integers(-127, 128, size=(N, B)), jnp.int8)
flops = 2 * N * N * B


def mm_i8(x):
    y = jax.lax.dot_general(
        w8, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (y[:, :] & 0x7F).astype(jnp.int8)


t = timed_loop("i8xi8->i32 [2048,2048]@[2048,256]", mm_i8, x8)
print(f"    -> {flops/t/1e12:.1f} Tops", flush=True)

w16 = jnp.asarray(rng.integers(-6000, 6000, size=(N, N)), jnp.int16)
x16 = jnp.asarray(rng.integers(-6000, 6000, size=(N, B)), jnp.int16)


def mm_i16(x):
    y = jax.lax.dot_general(
        w16, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (y & 0x1FFF).astype(jnp.int16)


t = timed_loop("i16xi16->i32 same shape", mm_i16, x16)
print(f"    -> {flops/t/1e12:.1f} Tops", flush=True)

wb = jnp.asarray(rng.standard_normal((N, N)), jnp.bfloat16)
xb = jnp.asarray(rng.standard_normal((N, B)), jnp.bfloat16)


def mm_bf16(x):
    y = jax.lax.dot_general(
        wb, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return y.astype(jnp.bfloat16)


t = timed_loop("bf16xbf16->f32 same shape", mm_bf16, xb)
print(f"    -> {flops/t/1e12:.1f} Tflops", flush=True)

wf = jnp.asarray(rng.standard_normal((N, N)), jnp.float32)
xf = jnp.asarray(rng.standard_normal((N, B)), jnp.float32)


def mm_f32(x):
    return jax.lax.dot_general(
        wf, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


t = timed_loop("f32xf32->f32 same shape", mm_f32, xf)
print(f"    -> {flops/t/1e12:.1f} Tflops", flush=True)

# --- 2. pointwise mod-p glue cost at NTT element counts ---
# one step's fwd worth of elements: 4 digit planes x 4 primes x [N, B]
E = (4, 4, N, B)
v = jnp.asarray(rng.integers(0, 1 << 30, size=E), jnp.int32)
M = int((1 << 29) // P)  # Barrett constant, fits i32 products


def barrett(x):
    # x mod P (approximately — exact enough for a TIMING probe) for
    # 0 <= x < 2^30 via an i32-only sequence: q ~ (x>>15) * (2^29/P)
    # >> 14, then 3 conditional subtractions for the residual range
    x_hi = x >> 15
    q = (x_hi * M) >> 14
    r = x - q * P
    r = jnp.where(r >= 2 * P, r - 2 * P, r)
    r = jnp.where(r >= P, r - P, r)
    r = jnp.where(r >= P, r - P, r)
    return r


def glue_body(v):
    r = barrett(v)
    # twiddle multiply + reduce again (the between-stage step)
    r2 = barrett(r * 13)
    return r2 + 1


t = timed_loop("mod-p glue (2x barrett) [4,4,N,B]", glue_body, v)
el = np.prod(E)
print(f"    -> {el/t/1e9:.1f} Gelem/s", flush=True)

# --- 3. full four-step negacyclic NTT mod p (i16 matmul form) ---
# N = 64 x 32; y[k] = sum_t x[t] psi^t w^(tk); four-step:
#   x[t1*32 + t2]  (t1 in [0,64), t2 in [0,32))
#   stage A: over t1 with W1[k1, t1] = wN1^(k1 t1)  (64x64 matmuls)
#   twiddle: wN^(k1 t2) and psi^t folded into stages
#   stage B: over t2 with W2[k2, t2] = wN2^(k2 t2)  (32x32)
# For the probe we only need the right SHAPES and arithmetic, not a
# bit-exact transform: W matrices are random mod p, twiddles random.
N1, N2 = 64, 32
W1 = jnp.asarray(rng.integers(0, P, size=(N1, N1)), jnp.int16)
W2 = jnp.asarray(rng.integers(0, P, size=(N2, N2)), jnp.int16)
TW = jnp.asarray(rng.integers(0, P, size=(N1, N2)), jnp.int32)
# 4 digit planes x 4 primes batched as leading dims
x_ntt = jnp.asarray(rng.integers(0, P, size=(4, 4, N1, N2 * B)), jnp.int16)


def ntt4step(x):
    # stage A: [N1, N1] @ [.., N1, N2*B] -> i32
    yA = jax.lax.dot_general(
        W1, x, (((1,), (2,)), ((), ())), preferred_element_type=jnp.int32
    )  # [N1, 4, 4, N2*B]
    yA = jnp.moveaxis(yA, 0, 2)
    yA = barrett(yA)
    # twiddle (between-stage pointwise, mod p)
    yA = yA.reshape(4, 4, N1, N2, B) * TW[None, None, :, :, None]
    yA = barrett(yA & 0x3FFFFFFF).astype(jnp.int16)
    # stage B: contract N2: [N2, N2] @ [.., N2, B]
    yB = jax.lax.dot_general(
        W2, yA, (((1,), (3,)), ((), ())), preferred_element_type=jnp.int32
    )  # [N2, 4, 4, N1, B]
    yB = jnp.moveaxis(yB, 0, 3)
    yB = barrett(yB)
    return yB.reshape(4, 4, N1, N2 * B).astype(jnp.int16)


t = timed_loop("four-step NTT mod p [4 planes,4 primes]", ntt4step, x_ntt)
print(f"    (vs ds32 fwd digit FFT measured ~149 us for the same step)",
      flush=True)

# --- 4. the ds32 forward FFT at the same logical step, for reference ---
digits_f = jnp.asarray(
    rng.integers(-(1 << 15), 1 << 15, size=(2, 2, N, B)).astype(np.float32)
)


def fwd_body(d):
    f = bu._fwd_ds_xla(d, jnp.zeros_like(d))
    mix = jnp.concatenate([f[0], f[2]], axis=-2) * np.float32(1e-38)
    return d + mix


timed_loop("ds32 fwd FFT [l=2,kp1=2,N,B]", fwd_body, digits_f)

# --- 5. mod-p MAD at multibit shapes (per subset): out[c] += D*G ---
# D [4 primes, 2 limbs? -> modeled: 4 primes x l*kp1=4 planes x N x B]
D = jnp.asarray(rng.integers(0, P, size=(4, 4, N, B)), jnp.int32)
G = jnp.asarray(rng.integers(0, P, size=(4, 4, 2, N)), jnp.int32)


def madp_body(D):
    acc = jnp.zeros((4, 2, N, B), jnp.int32)
    for j in range(4):
        prod = D[:, j, None] * G[:, j][..., None]  # i32 overflow mod 2^32 (probe)
        acc = barrett((acc + barrett(prod & 0x3FFFFFFF)))
    return D + (acc.sum(axis=1)[:, None] & 1)


t = timed_loop("mod-p MAD (1 subset, 4 primes)", madp_body, D)
print(f"    (vs ds freq_mad measured ~42 us per subset)", flush=True)
print("done", flush=True)
