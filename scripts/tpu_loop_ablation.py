#!/usr/bin/env python
"""Ablate the phase-rotation blind-rotation loop on TPU: time the full
637-step fori_loop with one stage removed at a time (keeping the
loop-carried dependency chain so XLA cannot hoist or DCE) to get TRUE
marginal costs per stage. Run: SPF_TPU_X32=1 python scripts/tpu_loop_ablation.py [B]
Requires cached DEFAULT_128 keys (python bench.py --keygen-only).
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
from spf_tpu.ops import bootstrap_u32 as bu, limb32 as lb, phase_rot as pr
from spf_tpu.ops.fft_ds32_t import _cmul
from spf_tpu.ops.rot_decomp_pallas import accumulate_decompose
from spf_tpu.params import DEFAULT_128

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
p = DEFAULT_128
glwe, lwe, radix = p.l1_params, p.l0_params, p.pbs_radix
N, K = glwe.degree, glwe.degree // 2
kp1 = glwe.size + 1
KEY_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".keys_cache")

rng = np.random.default_rng(0)
acc0 = lb.from_u64_np(rng.integers(0, 1 << 64, size=(kp1, N, B), dtype=np.uint64))
a_mat = jnp.asarray(rng.integers(0, 2 * N, size=(lwe.dim, B)), jnp.uint32)
bsk = np.load(os.path.join(KEY_CACHE, "default128_bsk_coeff.npy")) if os.path.exists(
    os.path.join(KEY_CACHE, "default128_bsk_coeff.npy")) else None
if bsk is None:
    # random spectra with realistic magnitude; MAD cost identical
    bsk_freq = tuple(
        jnp.asarray(rng.standard_normal((lwe.dim, kp1, radix.count, kp1, K)).astype(np.float32) * 2**40)
        for _ in range(4)
    )
else:
    from spf_tpu.ops.bootstrap_u32 import bsk_to_freq_u32
    bsk_freq = bsk_to_freq_u32(bsk, use_pallas=False)

pm1_const = tuple(
    jnp.asarray(rng.standard_normal((K, B)).astype(np.float32)) for _ in range(4)
)
zeros_prod = (jnp.zeros((kp1, N, B), jnp.float32), jnp.zeros((kp1, N, B), jnp.float32))


def make_loop(variant):
    def body(i, carry):
        acc, prod = carry
        if variant == "no_accdec":
            digits_f = jnp.broadcast_to(
                (acc[0].astype(jnp.int32) >> 16).astype(jnp.float32)
                + prod[0][0, 0, 0],
                (radix.count, kp1, N, B),
            )
        else:
            digits_f, acc = accumulate_decompose(acc, prod, radix)
        if variant == "no_fwd":
            dfft = tuple(
                jnp.broadcast_to(digits_f[..., :K, :] + jnp.float32(c), (radix.count, kp1, K, B))
                for c in range(4)
            )
        else:
            dfft = bu._fwd_ds_xla(digits_f, jnp.zeros_like(digits_f))
        if variant == "const_pm1":
            dfft = _cmul(dfft, pm1_const)
        elif variant in ("no_pm1",):
            pass
        else:
            pm1 = pr.phase_minus_one(a_mat[i], N, None)
            dfft = _cmul(dfft, pm1)
        if variant == "no_mad":
            prod_f = tuple(c[0] for c in dfft)  # [kp1, K, B]
        else:
            prod_f = bu.freq_mad(dfft, tuple(c[i] for c in bsk_freq), glwe, radix)
        if variant == "no_inv":
            prod = (
                jnp.concatenate([prod_f[0], prod_f[0]], axis=-2),
                jnp.concatenate([prod_f[1], prod_f[1]], axis=-2),
            )
        else:
            prod = bu._inv_ds_xla(prod_f)
        return acc, prod

    @jax.jit
    def run(acc, prod):
        acc, prod = jax.lax.fori_loop(0, lwe.dim, body, (acc, prod))
        return lb.add(acc, lb.from_ds(*prod))

    return run


variants = ["base", "const_pm1", "no_pm1", "no_accdec", "no_fwd", "no_mad", "no_inv"]
results = {}
for v in variants:
    run = make_loop(v)
    t0 = time.time()
    out = run(acc0, zeros_prod)
    jax.block_until_ready(out)
    compile_t = time.time() - t0
    times = []
    acc_alt = tuple(jnp.array(c, copy=True) for c in acc0)
    for it in range(3):
        t0 = time.time()
        out = run(acc0 if it % 2 == 0 else acc_alt, zeros_prod)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    best = min(times)
    results[v] = best
    base = results.get("base", best)
    print(
        f"{v:12s} total {best*1e3:7.1f} ms  per-step {best/lwe.dim*1e6:6.1f} us"
        f"  delta-vs-base {(base-best)/lwe.dim*1e6:+7.1f} us (compile {compile_t:.0f}s)",
        flush=True,
    )
