#!/usr/bin/env python
"""Interleaved A/B comparison of multi-bit rotation variants (relay
timing is noisy across processes; interleave repetitions and take
medians in ONE process).

A: production (in-graph phases + fence), one dispatch
B: hoisted phases (separate dispatch) + rotation dispatch — timed
   together including both dispatch latencies
C: in-graph phases, NO fence

Run: SPF_TPU_X32=1 python scripts/ab_rotation.py [B] [g]
"""
import os
import statistics
import sys
import time

os.environ.setdefault("SPF_TPU_X32", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import spf_tpu  # noqa: F401
from spf_tpu.ops import limb32 as lb
from spf_tpu.ops import multibit as mb
from spf_tpu.ops import phase_rot as pr
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
lut_t = tuple(x[..., None] for x in lut_limb)

# A: production
A = jax.jit(
    lambda c, bsk: mb.blind_rotate_multibit_u32(
        lut_t, c, bsk, lwe, glwe, radix, G, use_pallas=False
    )
)

# B: two dispatches (phases, then rotation taking them as args)
PH = jax.jit(
    lambda a: tuple(
        tuple(c.reshape(ng, G, *c.shape[1:]) for c in h)
        for h in pr.phase_factors_all(a, N, False)
    )
)


def rot_with_phases(c, plo, phi, bsk):
    from spf_tpu.ops import bootstrap_u32 as bu
    from spf_tpu.ops.rot_decomp_pallas import accumulate_decompose

    a = c[:-1]
    b = c[-1]
    bb = c.shape[-1]
    pad = ng * G - a.shape[0]
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad, bb), a.dtype)], axis=0)
    shape = (kp1, N, bb)
    lut_b = (
        jnp.broadcast_to(lut_t[0], shape),
        jnp.broadcast_to(lut_t[1], shape),
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


ROT = jax.jit(rot_with_phases)


def run_B(c, bsk):
    a = c[:-1]
    pad = ng * G - a.shape[0]
    a2 = jnp.concatenate([a, jnp.zeros((pad, B), a.dtype)], axis=0) if pad else a
    plo, phi = PH(a2)
    return ROT(c, plo, phi, bsk)


# C: no fence (monkeypatch fence to identity)
_orig_fence = pr.fence
pr.fence = lambda x: x
C = jax.jit(
    lambda c, bsk: mb.blind_rotate_multibit_u32(
        lut_t, c, bsk, lwe, glwe, radix, G, use_pallas=False
    )
)
# compile C now while fence is patched
out = C(ct_sw, bsk_mb)
_ = np.asarray(jax.device_get(out[0][0, :8, 0]))
pr.fence = _orig_fence

# warm up A, B
for f, args in (
    (A, (ct_sw, bsk_mb)),
    (run_B, (ct_sw, bsk_mb)),
):
    out = f(*args)
    _ = np.asarray(jax.device_get(out[0][0, :8, 0]))
print("# compiled", flush=True)

res = {"A_production": [], "B_two_dispatch": [], "C_no_fence": []}
for i in range(5):
    for name, f in (
        ("A_production", A),
        ("B_two_dispatch", run_B),
        ("C_no_fence", C),
    ):
        c0 = ct_sw + np.uint32(7 * i + hash(name) % 5 + 1)
        t0 = time.time()
        out = f(c0, bsk_mb)
        jax.block_until_ready(out)
        _ = np.asarray(jax.device_get(out[0][0, :8, 0]))
        res[name].append(time.time() - t0)

for name, ts in res.items():
    med = statistics.median(ts)
    print(
        f"{name:18s} median {med*1e3:7.1f}ms  min {min(ts)*1e3:7.1f}ms"
        f"  -> PBS/s {B/med:6.0f}",
        flush=True,
    )


# D/E: loop unrolling (per-iteration while-loop overhead test)
for un in (2, 4):
    D = jax.jit(
        lambda c, bsk, _un=un: mb.blind_rotate_multibit_u32(
            lut_t, c, bsk, lwe, glwe, radix, G, use_pallas=False, unroll=_un
        )
    )
    t0 = time.time()
    out = D(ct_sw, bsk_mb)
    _ = np.asarray(jax.device_get(out[0][0, :8, 0]))
    ct = time.time() - t0
    ts = []
    for i in range(4):
        c0 = ct_sw + np.uint32(50 + i)
        t0 = time.time()
        out = D(c0, bsk_mb)
        jax.block_until_ready(out)
        _ = np.asarray(jax.device_get(out[0][0, :8, 0]))
        ts.append(time.time() - t0)
    med = statistics.median(ts)
    print(
        f"D_unroll{un}          median {med*1e3:7.1f}ms  min {min(ts)*1e3:7.1f}ms"
        f"  -> PBS/s {B/med:6.0f}  (compile {ct:.1f}s)",
        flush=True,
    )
