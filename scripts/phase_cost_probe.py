#!/usr/bin/env python
"""How much does phase_factors_all itself cost on TPU at DEFAULT_128?
And a gather-based alternative (direct exponent table lookup)."""
import os
import sys
import time

os.environ.setdefault("SPF_TPU_X32", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import spf_tpu  # noqa: F401
from spf_tpu.ops import multibit as mb
from spf_tpu.ops import phase_rot as pr
from spf_tpu.params import DEFAULT_128

B = 256
G = 3
p = DEFAULT_128
glwe, lwe = p.l1_params, p.l0_params
N = glwe.degree
ng = mb.n_groups(lwe.dim, G)
steps = ng * G
rng = np.random.default_rng(0)
a = jnp.asarray(rng.integers(0, 2 * N, size=(steps, B)), jnp.uint32)


def timed(name, jf, *args, iters=3):
    t0 = time.time()
    out = jf(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(jax.device_get(leaf[..., 0]))
    print(f"  compile+1st {time.time()-t0:.1f}s", flush=True)
    times = []
    for i in range(iters):
        a0 = args[0] + np.uint32(i + 1)
        t0 = time.time()
        out = jf(a0, *args[1:])
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(jax.device_get(leaf[..., 0]))
        times.append(time.time() - t0)
    print(f"{name:44s} sync {min(times)*1e3:7.1f}ms", flush=True)


timed(
    "phase_factors_all (doubling, production)",
    jax.jit(lambda aa: pr.phase_factors_all(aa, N, False)),
    a,
)


def phase_factors_gather(aa, n):
    """Direct formulation: factor[t, m, b] = psi_table[(exp) mod 2N]
    with exp = s(t,b) * f(m) computed in u32 and one gather per half."""
    two_n = 2 * n
    k = n // 2
    j_count = int(np.log2(k))
    j_half = j_count // 2
    images = pr.backend_bit_images(n, False)
    tabs = tuple(jnp.asarray(c) for c in pr._psi_table_np(two_n))
    t = aa.astype(jnp.uint32)
    mask = jnp.uint32(two_n - 1)

    def img_sum(ms):
        # f(m) for a list of m values (python ints)
        return np.array(
            [sum(images[j] for j in range(j_count) if m & (1 << j)) for m in ms],
            dtype=np.int64,
        )

    lo_m = img_sum(range(1 << j_half))  # [Klo]
    hi_m = img_sum([m << j_half for m in range(1 << (j_count - j_half))])
    # exponents: lo includes the seed psi^t: e_lo = t + (-4 t f(m))
    elo = (
        t[:, None, :]
        + (jnp.uint32(0) - t[:, None, :])
        * jnp.asarray(((4 * lo_m) % (2 * two_n)).astype(np.uint32))[None, :, None]
    ) & mask
    ehi = (
        (jnp.uint32(0) - t[:, None, :])
        * jnp.asarray(((4 * hi_m) % (2 * two_n)).astype(np.uint32))[None, :, None]
    ) & mask

    def look(idx):
        return tuple(jnp.take(c, idx.astype(jnp.int32), axis=0) for c in tabs)

    return look(elo), look(ehi)


timed(
    "phase_factors_gather (one table lookup)",
    jax.jit(lambda aa: phase_factors_gather(aa, N)),
    a,
)

# equivalence check (values must match the doubling formulation closely;
# the doubling accumulates ~log2(K)/2 cmul roundings, the gather is
# table-exact, so compare within 2^-40 relative)
lo_d, hi_d = jax.jit(lambda aa: pr.phase_factors_all(aa, N, False))(a)
lo_g, hi_g = jax.jit(lambda aa: phase_factors_gather(aa, N))(a)
for d, g in zip(lo_d + hi_d, lo_g + hi_g):
    dd = np.asarray(d[..., :4]).astype(np.float64)
    gg = np.asarray(g[..., :4]).astype(np.float64)
    err = np.abs(dd - gg).max()
    print(f"component max abs diff: {err:.3e}")
print("done", flush=True)
