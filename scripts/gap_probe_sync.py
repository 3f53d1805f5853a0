#!/usr/bin/env python
"""Variant-1 of the gap ablation with a device_get checksum sync, to
check whether block_until_ready returns early for the dynamic-slice
loop on the axon relay."""
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
from spf_tpu.ops import limb32 as lb
from spf_tpu.ops import multibit as mb
from spf_tpu.ops import phase_rot as pr
from spf_tpu.ops.rot_decomp_pallas import accumulate_decompose
from spf_tpu.params import DEFAULT_128

B, G, ITERS = 256, 3, 32
p = DEFAULT_128
glwe, lwe, radix = p.l1_params, p.l0_params, p.pbs_radix
N, K = glwe.degree, glwe.degree // 2
kp1, l = glwe.size + 1, radix.count
ns = (1 << G) - 1
ng = mb.n_groups(lwe.dim, G)

rng = np.random.default_rng(0)
acc = lb.from_u64_np(rng.integers(0, 1 << 64, size=(kp1, N, B), dtype=np.uint64))
prod0 = (
    jnp.asarray(rng.standard_normal((kp1, N, B)).astype(np.float32) * 2**30),
    jnp.asarray(rng.standard_normal((kp1, N, B)).astype(np.float32) * 2**6),
)
bsk_mb = tuple(
    jnp.asarray(rng.standard_normal((ng, ns, kp1, l, kp1, K)).astype(np.float32) * 2**40)
    for _ in range(4)
)
a_steps = jnp.asarray(rng.integers(0, 2 * N, size=(ng * G, B)), jnp.uint32)
ph_lo, ph_hi = pr.phase_factors_all(a_steps, N, False)
ph_lo = tuple(c.reshape(ng, G, *c.shape[1:]) for c in ph_lo)
ph_hi = tuple(c.reshape(ng, G, *c.shape[1:]) for c in ph_hi)


def body(c, i, bsk, plo, phi):
    t = jnp.mod(i, ng)
    acc_c, prod = c
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


jf = jax.jit(
    lambda c0, bsk, plo, phi: jax.lax.fori_loop(
        0, ITERS, lambda i, c: body(c, i, bsk, plo, phi), c0
    )
)
t0 = time.time()
out = jf((acc, prod0), bsk_mb, ph_lo, ph_hi)
s = int(np.asarray(jax.device_get(out[0][0])).sum())
print(f"first: {time.time()-t0:.1f}s sum={s}", flush=True)
for i in range(3):
    c0 = jax.tree_util.tree_map(lambda x: x + x.dtype.type(i + 1), (acc, prod0))
    t0 = time.time()
    out = jf(c0, bsk_mb, ph_lo, ph_hi)
    jax.block_until_ready(out)
    t_block = time.time() - t0
    s = int(np.asarray(jax.device_get(out[0][0])).sum())
    t_get = time.time() - t0
    print(
        f"call {i}: block={t_block*1e3:.1f}ms device_get={t_get*1e3:.1f}ms"
        f" sum={s}",
        flush=True,
    )
print(f"per-iter (device_get): {(t_get-0.03)/ITERS*1e6:.0f} us", flush=True)
