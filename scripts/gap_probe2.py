#!/usr/bin/env python
"""Compare the REAL blind_rotate_multibit_u32 against variants with the
phase factors hoisted out of the jit, with checksum-forced sync.
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
p = DEFAULT_128
glwe, lwe, radix = p.l1_params, p.l0_params, p.pbs_radix
N, K = glwe.degree, glwe.degree // 2
kp1, l = glwe.size + 1, radix.count
ns = (1 << G) - 1
ng = mb.n_groups(lwe.dim, G)
print(f"# B={B} g={G} ng={ng}", flush=True)

rng = np.random.default_rng(0)
ct_sw = jnp.asarray(
    np.concatenate([
        rng.integers(0, 2 * N, size=(lwe.dim, B)),
        rng.integers(0, 2 * N, size=(1, B)),
    ]).astype(np.uint32)
)
lut_limb = lb.from_u64_np(rng.integers(0, 1 << 64, size=(kp1, N), dtype=np.uint64))
bsk_mb = tuple(
    jnp.asarray(rng.standard_normal((ng, ns, kp1, l, kp1, K)).astype(np.float32) * 2**40)
    for _ in range(4)
)


def timed(name, jf, *args, iters=3):
    t0 = time.time()
    out = jf(*args)
    s = int(np.asarray(jax.device_get(out[0][0, :8, 0])).sum())  # force sync
    print(f"  compile+1st {time.time()-t0:.1f}s (sum {s})", flush=True)
    times = []
    for i in range(iters):
        a0 = ct_sw + np.uint32(i + 1)
        t0 = time.time()
        out = jf(a0, *args[1:])
        jax.block_until_ready(out)
        tb = time.time() - t0
        _ = np.asarray(jax.device_get(out[0][0, :8, 0]))
        tg = time.time() - t0
        times.append((tb, tg))
    best_b = min(t[0] for t in times)
    best_g = min(t[1] for t in times)
    print(f"{name:40s} block {best_b*1e3:7.1f}ms  sync {best_g*1e3:7.1f}ms"
          f"  per-group {best_g/ng*1e6:5.0f} us", flush=True)


# 1. real production path
def real_rot(c):
    lut_t = tuple(x[..., None] for x in lut_limb)
    return mb.blind_rotate_multibit_u32(
        lut_t, c, bsk_mb, lwe, glwe, radix, G, use_pallas=False
    )


timed("real blind_rotate_multibit_u32", jax.jit(real_rot), ct_sw)


# 2. phases hoisted OUT of the jit (precomputed eagerly), loop scans keys
def rot_hoisted(c, plo, phi, bsk):
    a = c[:-1]
    b = c[-1]
    bb = c.shape[-1]
    pad = ng * G - a.shape[0]
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad, bb), a.dtype)], axis=0)
    shape = (kp1, N, bb)
    lut_b = (
        jnp.broadcast_to(lut_limb[0][..., None], shape),
        jnp.broadcast_to(lut_limb[1][..., None], shape),
    )
    acc = bu.monomial_mul_u32(lut_b, lb.U32(2 * N) - b)

    def body(t, carry):
        acc_c, prod = carry
        digits_f, acc2 = accumulate_decompose(acc_c, prod, radix)
        dfft = bu._fwd_ds_xla(digits_f, jnp.zeros_like(digits_f))
        lo_t = tuple(x[t] for x in plo)
        hi_t = tuple(x[t] for x in phi)
        u = [
            pr.combine_phase_minus_one(
                tuple(x[j] for x in lo_t), tuple(x[j] for x in hi_t)
            )
            for j in range(G)
        ]
        row = tuple(x[t] for x in bsk)
        mads = [
            bu.freq_mad(dfft, tuple(x[m] for x in row), glwe, radix)
            for m in range(ns)
        ]
        prod_f = mb._nested_subset_sum(mads, u, G)
        prod2 = bu._inv_ds_xla(prod_f)
        return acc2, prod2

    zero = (jnp.zeros_like(acc[0], jnp.float32), jnp.zeros_like(acc[0], jnp.float32))
    acc, prod = jax.lax.fori_loop(0, ng, body, (acc, zero))
    return lb.add(acc, lb.from_ds(*prod))


a_np = ct_sw[:-1]
pad = ng * G - a_np.shape[0]
a_pad = jnp.concatenate([a_np, jnp.zeros((pad, B), a_np.dtype)], axis=0) if pad else a_np
plo_e, phi_e = jax.jit(lambda a: pr.phase_factors_all(a, N, False))(a_pad)
plo_e = tuple(c.reshape(ng, G, *c.shape[1:]) for c in plo_e)
phi_e = tuple(c.reshape(ng, G, *c.shape[1:]) for c in phi_e)
jax.block_until_ready(plo_e)

timed("hoisted phases (precomputed input)", jax.jit(rot_hoisted), ct_sw,
      plo_e, phi_e, bsk_mb)


# 3. phases computed inside jit but BEFORE the loop with an
# optimization barrier to pin them
def rot_barrier(c, bsk):
    a = c[:-1]
    b = c[-1]
    bb = c.shape[-1]
    pad2 = ng * G - a.shape[0]
    if pad2:
        a = jnp.concatenate([a, jnp.zeros((pad2, bb), a.dtype)], axis=0)
    plo, phi = pr.phase_factors_all(a, N, False)
    plo = tuple(x.reshape(ng, G, *x.shape[1:]) for x in plo)
    phi = tuple(x.reshape(ng, G, *x.shape[1:]) for x in phi)
    plo, phi = jax.lax.optimization_barrier((plo, phi))
    return rot_hoisted_inner(c, plo, phi, bsk)


def rot_hoisted_inner(c, plo, phi, bsk):
    return rot_hoisted(c, plo, phi, bsk)


timed("in-jit phases + opt barrier", jax.jit(rot_barrier), ct_sw, bsk_mb)


# 4. in-jit phases passed through an OPAQUE Pallas copy (XLA cannot
# rematerialize through a custom call, so the loop must read the
# materialized buffers) — one dispatch, hoisting enforced
from functools import partial

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _copy_kernel(s_ref, d_ref):
    d_ref[...] = s_ref[...]


def opaque_materialize(x):
    """Identity through a Pallas kernel: an optimization fence that
    forces XLA to materialize x exactly once."""
    m = x.shape[0]
    rest = x.shape[1:]
    return pl.pallas_call(
        _copy_kernel,
        grid=(m,),
        in_specs=[pl.BlockSpec((1,) + rest, lambda i: (i,) + (0,) * len(rest))],
        out_specs=pl.BlockSpec((1,) + rest, lambda i: (i,) + (0,) * len(rest)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


def rot_fence(c, bsk):
    a = c[:-1]
    bb = c.shape[-1]
    pad2 = ng * G - a.shape[0]
    if pad2:
        a = jnp.concatenate([a, jnp.zeros((pad2, bb), a.dtype)], axis=0)
    plo, phi = pr.phase_factors_all(a, N, False)
    plo = tuple(
        opaque_materialize(x.reshape(ng, G, *x.shape[1:])) for x in plo
    )
    phi = tuple(
        opaque_materialize(x.reshape(ng, G, *x.shape[1:])) for x in phi
    )
    return rot_hoisted(c, plo, phi, bsk)


timed("in-jit phases + pallas fence", jax.jit(rot_fence), ct_sw, bsk_mb)
