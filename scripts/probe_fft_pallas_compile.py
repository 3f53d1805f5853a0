#!/usr/bin/env python
"""Probe: does Mosaic compile the VMEM FFT kernels (fft_pallas.fwd_ds /
inv_ds) through the axon remote-compile service today, and how fast are
they vs the XLA DIF/DIT cores at production shapes?

Run: SPF_TPU_X32=1 timeout 1800 python scripts/probe_fft_pallas_compile.py
Each pallas_call compiles in its own step so a hang is attributable.
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
from spf_tpu.params import DEFAULT_128

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
p = DEFAULT_128
glwe, radix = p.l1_params, p.pbs_radix
N, K = glwe.degree, glwe.degree // 2
kp1 = glwe.size + 1
l = radix.count
print(f"# devices={jax.devices()} B={B} N={N} l={l}", flush=True)

rng = np.random.default_rng(0)
# forward input: digit planes [l, k+1, N, B] (exact small ints as f32)
hi = jnp.asarray(
    rng.integers(-(1 << 15), 1 << 15, size=(l, kp1, N, B)).astype(np.float32)
)
lo = jnp.zeros_like(hi)
# inverse input: freq tuple [k+1, K, B]
f_in = tuple(
    jnp.asarray(rng.standard_normal((kp1, K, B)).astype(np.float32) * 2**40)
    for _ in range(4)
)

ITERS = 30


def timed(name, fn, *args):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:20s} compile+1st {time.time()-t0:8.1f}s", flush=True)
    f_loop = jax.jit(
        lambda *a: jax.lax.fori_loop(
            0, ITERS, lambda i, c: fn(c, *a[1:]) if not isinstance(c, tuple)
            else fn(c, *a[1:]), a[0]
        )
    )
    # simpler: just time repeated calls with distinct inputs
    times = []
    for i in range(5):
        a0 = jax.tree_util.tree_map(lambda x: x + np.float32(i + 1), args[0])
        rest = args[1:]
        t0 = time.time()
        out = fn(a0, *rest)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    print(f"{name:20s} best {min(times)*1e6:9.0f} us", flush=True)
    return out


print("== XLA fwd (scrambled DIF) ==", flush=True)
fwd_xla = jax.jit(lambda h: bu._fwd_ds_xla(h, jnp.zeros_like(h)))
timed("fwd_xla", fwd_xla, hi)

print("== XLA inv (DIT) ==", flush=True)
inv_xla = jax.jit(bu._inv_ds_xla)
timed("inv_xla", inv_xla, f_in)

print("== Pallas fwd ==", flush=True)
fwd_pal = jax.jit(lambda h: fp.fwd_ds(h, jnp.zeros_like(h)))
timed("fwd_pallas", fwd_pal, hi)

print("== Pallas inv ==", flush=True)
inv_pal = jax.jit(fp.inv_ds)
timed("inv_pallas", inv_pal, f_in)

print("done", flush=True)
