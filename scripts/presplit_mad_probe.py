#!/usr/bin/env python
"""A/B: freq_mad with plain vs Veltkamp-presplit BSK rows (VERDICT
round-3 #9). Prediction from flop analysis: ~no win, because the
Veltkamp splits of the key operand are [K]-wide (no batch axis) under
XLA broadcast semantics — only B-wide flops matter. Measured to settle
it. Loop-amortized, checksum-synced.
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
from spf_tpu.ops import ds
from spf_tpu.ops.fft_ds32_t import _cadd, _cmul_wsplit, zeros_t
from spf_tpu.params import DEFAULT_128

ITERS = 32
B, G = 256, 3
p = DEFAULT_128
glwe, radix = p.l1_params, p.pbs_radix
N, K = glwe.degree, glwe.degree // 2
kp1, l = glwe.size + 1, radix.count
ns = (1 << G) - 1

rng = np.random.default_rng(0)
dfft = tuple(
    jnp.asarray(rng.standard_normal((l, kp1, K, B)).astype(np.float32) * 2**20)
    for _ in range(4)
)
row_np = [
    rng.standard_normal((ns, kp1, l, kp1, K)).astype(np.float32) * 2**40
    for _ in range(4)
]
row4 = tuple(jnp.asarray(c) for c in row_np)
rhh, rhl = ds.presplit_f32(row_np[0])
ihh, ihl = ds.presplit_f32(row_np[2])
row8 = row4 + tuple(jnp.asarray(c) for c in (rhh, rhl, ihh, ihl))


def freq_mad_ws(dfft, row8_m, glwe_def, radix):
    """freq_mad with presplit rows (8-comp)."""
    kp1_ = glwe_def.size + 1
    k2 = glwe_def.degree // 2
    bb = dfft[0].shape[-1]
    acc = zeros_t((kp1_, k2, bb))
    for i in range(kp1_):
        for j in range(radix.count):
            d = tuple(c[j, i, None, :, :] for c in dfft)
            g8 = tuple(c[i, j, :, :, None] for c in row8_m)
            acc = _cadd(acc, _cmul_wsplit(d, g8))
    return acc


def timed_loop(name, body, init):
    jf = jax.jit(lambda c0: jax.lax.fori_loop(0, ITERS, lambda i, c: body(c), c0))
    t0 = time.time()
    out = jf(init)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(jax.device_get(leaf.ravel()[:8]))
    ct = time.time() - t0
    ts = []
    for i in range(4):
        c0 = jax.tree_util.tree_map(lambda x: x + np.float32(i + 1), init)
        t0 = time.time()
        out = jf(c0)
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(jax.device_get(leaf.ravel()[:8]))
        ts.append(time.time() - t0)
    per = (min(ts) - 0.052) / ITERS
    print(f"{name:34s} {per*1e6:9.0f} us/iter (compile {ct:.1f}s)", flush=True)


TINY = np.float32(1e-38)


def body_plain(df):
    outs = [
        bu.freq_mad(df, tuple(c[m] for c in row4), glwe, radix)
        for m in range(ns)
    ]
    s = outs[0]
    for o in outs[1:]:
        s = tuple(a + b for a, b in zip(s, o))
    return tuple(d + c[None] * TINY for d, c in zip(df, s))


def body_ws(df):
    outs = [
        freq_mad_ws(df, tuple(c[m] for c in row8), glwe, radix)
        for m in range(ns)
    ]
    s = outs[0]
    for o in outs[1:]:
        s = tuple(a + b for a, b in zip(s, o))
    return tuple(d + c[None] * TINY for d, c in zip(df, s))


timed_loop(f"{ns}x freq_mad plain", body_plain, dfft)
timed_loop(f"{ns}x freq_mad presplit", body_ws, dfft)
timed_loop(f"{ns}x freq_mad plain (again)", body_plain, dfft)
