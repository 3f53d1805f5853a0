#!/usr/bin/env python
"""TPU smoke test: compile + run the Pallas ds32 FFT kernels in x32 mode.

Run with:  SPF_TPU_X32=1 python scripts/tpu_pallas_smoke.py [N] [B]

Checks fwd_ds/inv_ds against the pure-jnp twins on the real device and
times steady-state calls.
"""

import os
import sys
import time

os.environ.setdefault("SPF_TPU_X32", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import spf_tpu  # noqa: F401  (configures x64 off under SPF_TPU_X32)
from spf_tpu.ops import fft_pallas as fp
from spf_tpu.ops import limb32 as lb

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
B = int(sys.argv[2]) if len(sys.argv) > 2 else 256

print(f"# devices={jax.devices()} x64={jax.config.jax_enable_x64}", flush=True)
assert not jax.config.jax_enable_x64

rng = np.random.default_rng(0)
x = rng.integers(0, 1 << 64, size=(2, N, B), dtype=np.uint64)
limbs = lb.from_u64_np(x)

t0 = time.time()
hi, lo = jax.jit(lb.to_ds)(limbs)
jax.block_until_ready(hi)
print(f"# to_ds compile+run {time.time()-t0:.1f}s", flush=True)

# --- forward ---
fwd = jax.jit(fp.fwd_ds)
t0 = time.time()
f = fwd(hi, lo)
jax.block_until_ready(f)
print(f"# fwd_ds (pallas) compile+first {time.time()-t0:.1f}s", flush=True)

# host numpy reference: twist + cFFT, then the DIF bit-reversed order
k = N // 2
xs = x.astype(np.int64).astype(np.float64)  # signed torus values
z = (xs[:, :k, :] + 1j * xs[:, k:, :]) * np.exp(
    2j * np.pi * np.arange(k) / (2 * N)
)[None, :, None]
F = np.fft.fft(z, axis=1)
bits_n = int(np.log2(k))
br = np.array(
    [int(format(i, f"0{bits_n}b")[::-1], 2) for i in range(k)]
)
ref = F[:, br, :]
got = (np.asarray(f[0], np.float64) + np.asarray(f[1], np.float64)) + 1j * (
    np.asarray(f[2], np.float64) + np.asarray(f[3], np.float64)
)
err = np.abs(got - ref).max() / np.abs(ref).max()
print(f"# fwd rel err vs host c128: {err:.2e}", flush=True)
assert err < 1e-5, err

# --- inverse ---
inv = jax.jit(fp.inv_ds)
t0 = time.time()
b = inv(f)
jax.block_until_ready(b)
print(f"# inv_ds (pallas) compile+first {time.time()-t0:.1f}s", flush=True)
back = jax.jit(lb.from_ds)(*b)
back_np = lb.to_u64_np(jax.device_get(back))
# roundtrip: x scaled by nothing -> should equal x up to ds32 noise (~2^37)
d = back_np - x  # u64 wrap
diff = np.minimum(d, np.uint64(0) - d).astype(np.float64)
print(f"# roundtrip max |err|: 2^{np.log2(diff.max()+1):.1f}", flush=True)
assert diff.max() < 2.0**40

# --- timing (in-graph loop to avoid per-call fetch overhead) ---
def many(hi, lo, iters=20):
    def body(i, c):
        f = fp.fwd_ds(c[0], c[1])
        h2, l2 = fp.inv_ds(f)
        return (h2 * 0.5, l2 * 0.5)

    return jax.lax.fori_loop(0, iters, body, (hi, lo))

t0 = time.time()
out = jax.jit(many)(hi, lo)
jax.block_until_ready(out)
print(f"# loop compile+first {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
out = jax.jit(many)(hi, lo)
jax.block_until_ready(out)
dt = time.time() - t0
per = dt / 20 / 2  # per transform (fwd or inv counted equally)
n_ffts = 2 * B  # leading dims collapse: 2*B transforms per call
print(
    f"# steady: {dt*1000:.1f} ms/20 iters -> {per*1e6:.0f} us per "
    f"(fwd+inv)/2 batch of {n_ffts} size-{N} transforms "
    f"= {per*1e9/n_ffts:.0f} ns/transform",
    flush=True,
)
print("PALLAS_SMOKE_OK")
