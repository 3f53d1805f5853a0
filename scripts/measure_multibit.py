#!/usr/bin/env python
"""Measure the production multi-bit blind rotation end-to-end (fence +
gather-free phase factors) at a given batch/group, checksum-synced.

Run: SPF_TPU_X32=1 python scripts/measure_multibit.py [B] [g...]
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
from spf_tpu.ops import limb32 as lb
from spf_tpu.ops import multibit as mb
from spf_tpu.ops import phase_rot as pr
from spf_tpu.params import DEFAULT_128

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
GS = [int(x) for x in sys.argv[2:]] or [3, 2]
p = DEFAULT_128
glwe, lwe, radix = p.l1_params, p.l0_params, p.pbs_radix
N, K = glwe.degree, glwe.degree // 2
kp1, l = glwe.size + 1, radix.count

rng = np.random.default_rng(0)
ct_sw = jnp.asarray(
    np.concatenate([
        rng.integers(0, 2 * N, size=(lwe.dim, B)),
        rng.integers(0, 2 * N, size=(1, B)),
    ]).astype(np.uint32)
)
lut_limb = lb.from_u64_np(rng.integers(0, 1 << 64, size=(kp1, N), dtype=np.uint64))

# standalone phase-factor cost (new gather-free form)
steps = 639
a = jnp.asarray(rng.integers(0, 2 * N, size=(steps, B)), jnp.uint32)
jf = jax.jit(lambda aa: pr.phase_factors_all(aa, N, False))
t0 = time.time()
out = jf(a)
_ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0][..., 0]))
print(f"phase_factors_all compile+1st {time.time()-t0:.1f}s", flush=True)
ts = []
for i in range(3):
    t0 = time.time()
    out = jf(a + np.uint32(i + 1))
    jax.block_until_ready(out)
    _ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0][..., 0]))
    ts.append(time.time() - t0)
print(f"phase_factors_all (gather-free): {min(ts)*1e3:.1f} ms", flush=True)

for G in GS:
    ns = (1 << G) - 1
    ng = mb.n_groups(lwe.dim, G)
    bsk_mb = tuple(
        jnp.asarray(
            rng.standard_normal((ng, ns, kp1, l, kp1, K)).astype(np.float32)
            * 2**40
        )
        for _ in range(4)
    )

    def rot(c, bsk):
        lut_t = tuple(x[..., None] for x in lut_limb)
        return mb.blind_rotate_multibit_u32(
            lut_t, c, bsk, lwe, glwe, radix, G, use_pallas=False
        )

    jf = jax.jit(rot)
    t0 = time.time()
    out = jf(ct_sw, bsk_mb)
    _ = np.asarray(jax.device_get(out[0][0, :8, 0]))
    compile_t = time.time() - t0
    times = []
    for i in range(3):
        t0 = time.time()
        out = jf(ct_sw + np.uint32(i + 1), bsk_mb)
        jax.block_until_ready(out)
        _ = np.asarray(jax.device_get(out[0][0, :8, 0]))
        times.append(time.time() - t0)
    best = min(times)
    print(
        f"g={G}: rotation {best*1e3:7.1f} ms  per-group {best/ng*1e6:5.0f} us"
        f"  implied PBS/s {B/best:6.0f}  (compile {compile_t:.1f}s)",
        flush=True,
    )
    del bsk_mb
