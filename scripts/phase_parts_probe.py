#!/usr/bin/env python
"""Decompose the phase-factor block cost on TPU: seed binexp, qj
ladders, doubling concats, moveaxis."""
import os
import sys
import time

os.environ.setdefault("SPF_TPU_X32", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import spf_tpu  # noqa: F401
from spf_tpu.ops import phase_rot as pr
from spf_tpu.ops.fft_ds32_t import _cmul
from spf_tpu.params import DEFAULT_128

N = 2048
two_n = 2 * N
steps, B = 639, 256
rng = np.random.default_rng(0)
a = jnp.asarray(rng.integers(0, two_n, size=(steps, B)), jnp.uint32)


def timed(name, fn, *args, iters=3):
    jf = jax.jit(fn)
    t0 = time.time()
    out = jf(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(jax.device_get(leaf.ravel()[:8]))
    ct = time.time() - t0
    ts = []
    for i in range(iters):
        a0 = args[0] + args[0].dtype.type(i + 1)
        t0 = time.time()
        out = jf(a0, *args[1:])
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(jax.device_get(leaf.ravel()[:8]))
        ts.append(time.time() - t0)
    print(f"{name:40s} {min(ts)*1e3:8.1f} ms  (compile {ct:.1f}s)", flush=True)


# 1. seed binexp alone
timed("psi^t binexp [639,256]", lambda t: pr._psi_pow_of_t(t, 1, two_n), a)

# 2. all 10 qj ladders (no doubling)
def all_qj(t):
    images = pr.backend_bit_images(N, False)
    return [pr._psi_pow_of_t(t, -4 * int(images[j]), two_n) for j in range(10)]


timed("10x qj binexp ladders", all_qj, a)


# 3. doubling WITHOUT moveaxis
def doubling_nomove(t):
    images = pr.backend_bit_images(N, False)
    seed = pr._psi_pow_of_t(t, 1, two_n)
    seq = tuple(c[None] for c in seed)
    for j in range(5):
        qj = pr._psi_pow_of_t(t, -4 * int(images[j]), two_n)
        shifted = _cmul(seq, tuple(c[None] for c in qj))
        seq = tuple(jnp.concatenate([x, y], axis=0) for x, y in zip(seq, shifted))
    return seq


timed("lo doubling, no moveaxis", doubling_nomove, a)


# 4. doubling WITH moveaxis
def doubling_move(t):
    seq = doubling_nomove(t)
    return tuple(jnp.moveaxis(c, 0, 1) for c in seq)


timed("lo doubling + moveaxis", doubling_move, a)

# 5. full production phase_factors_all
timed("phase_factors_all (full)",
      lambda t: pr.phase_factors_all(t, N, False), a)

# 6. alternative: doubling on the LAST-BUT-ONE axis (keep m minor-2)
def doubling_axis_last(t):
    images = pr.backend_bit_images(N, False)
    seed = pr._psi_pow_of_t(t, 1, two_n)  # [steps, B]
    seq = tuple(c[:, None, :] for c in seed)  # [steps, 1, B]
    for j in range(5):
        qj = pr._psi_pow_of_t(t, -4 * int(images[j]), two_n)
        q1 = tuple(c[:, None, :] for c in qj)
        shifted = _cmul(seq, q1)
        seq = tuple(jnp.concatenate([x, y], axis=1) for x, y in zip(seq, shifted))
    return seq  # [steps, 32, B] directly — no transpose


timed("lo doubling on middle axis (no move)", doubling_axis_last, a)
