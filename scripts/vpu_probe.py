#!/usr/bin/env python
"""Probe the TPU's raw compute rates to size round-3 optimizations.

Measures, on the real chip:
  1. VPU f32 elementwise peak (mul-only, add-only, mul+add chains)
     in a VMEM-resident Pallas kernel (no HBM traffic in the loop).
  2. Whether XLA / Mosaic contract `a*b - p` into an FMA (exact
     two-prod error for free -> ds.mul drops from ~22 to ~9 flops).
  3. VPU int32 multiply/add rate (Fermat-prime NTT feasibility).
  4. MXU int8 -> int32 and bf16 -> f32 matmul rates at NTT-ish shapes.
  5. pltpu.roll throughput (butterfly shuffles).

Run: SPF_TPU_X32=1 python scripts/vpu_probe.py
"""
import os
import sys
import time

os.environ.setdefault("SPF_TPU_X32", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 1024, 512  # VMEM tile: 1024x512 f32 = 2 MB
ITERS = 400


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def chain_kernel(body, n_ops_per_iter, name, dtype=jnp.float32):
    def kern(x_ref, o_ref):
        def step(i, v):
            return body(v, i)

        o_ref[...] = jax.lax.fori_loop(0, ITERS, step, x_ref[...])

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, C), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    if dtype == jnp.float32:
        x = jnp.asarray(np.random.rand(R, C).astype(np.float32) + 1.0)
    else:
        x = jnp.asarray(np.random.randint(1, 100, (R, C)).astype(np.int32))
    dt, _ = timed(run, x)
    ops = R * C * ITERS * n_ops_per_iter
    print(f"{name:28s} {ops/dt/1e12:8.3f} Tops/s   ({dt*1e3:.2f} ms)")
    return ops / dt


print(f"# devices: {jax.devices()}", flush=True)

# --- 1. f32 VPU peak ---------------------------------------------------
c1 = 1.000001
c2 = 0.0000001
chain_kernel(lambda v, i: v * c1, 1, "f32 mul chain")
chain_kernel(lambda v, i: v + c2, 1, "f32 add chain")
chain_kernel(lambda v, i: v * c1 + c2, 2, "f32 mul+add chain")
# independent pair per iter (ILP)
chain_kernel(lambda v, i: (v * c1) + (v * 0.0000002), 3,
             "f32 2mul+1add (ILP)")
chain_kernel(lambda v, i: jnp.where(v > 0, v * c1, v + c2), 2.0,
             "f32 mul/select chain")

# --- 2. FMA contraction probe ------------------------------------------
def fma_probe_kernel(a_ref, b_ref, o_ref):
    a = a_ref[...]
    b = b_ref[...]
    p = a * b
    e = a * b - p  # contracted to fma(a,b,-p) iff Mosaic fuses
    o_ref[...] = e


@jax.jit
def fma_probe(a, b):
    return pl.pallas_call(
        fma_probe_kernel,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)


rng = np.random.default_rng(0)
a_np = (rng.random((R, C)) * 2 - 1).astype(np.float32)
b_np = (rng.random((R, C)) * 2 - 1).astype(np.float32)
err = np.asarray(fma_probe(jnp.asarray(a_np), jnp.asarray(b_np)))
true_err = a_np.astype(np.float64) * b_np.astype(np.float64) - (
    a_np * b_np
).astype(np.float64)
nz = np.count_nonzero(err)
match = np.count_nonzero(np.isclose(err.astype(np.float64), true_err))
print(f"fma contraction (pallas): nonzero={nz}/{err.size} exact-match={match}/{err.size}")


@jax.jit
def fma_probe_xla(a, b):
    p = a * b
    return a * b - p


err2 = np.asarray(fma_probe_xla(jnp.asarray(a_np), jnp.asarray(b_np)))
nz2 = np.count_nonzero(err2)
match2 = np.count_nonzero(np.isclose(err2.astype(np.float64), true_err))
print(f"fma contraction (xla):    nonzero={nz2}/{err2.size} exact-match={match2}/{err2.size}")

# --- 3. int32 VPU rates --------------------------------------------------
chain_kernel(lambda v, i: v * 3, 1, "i32 mul chain", dtype=jnp.int32)
chain_kernel(lambda v, i: v + 3, 1, "i32 add chain", dtype=jnp.int32)
chain_kernel(lambda v, i: (v * 3) + 3, 2, "i32 mul+add chain", dtype=jnp.int32)
chain_kernel(lambda v, i: v >> 16, 1, "i32 shift chain", dtype=jnp.int32)
chain_kernel(lambda v, i: v & 0xFFFF, 1, "i32 and chain", dtype=jnp.int32)
# fermat reduction: lo - hi
chain_kernel(
    lambda v, i: (v & 0xFFFF) - (v >> 16) + (v * 3), 4,
    "i32 fermat modmul-ish", dtype=jnp.int32)

# --- 4. MXU rates --------------------------------------------------------
def mm_rate(m, k, n, dtype, acc_dtype, name, batch=1):
    if dtype == jnp.int8:
        a = jnp.asarray(rng.integers(-100, 100, (batch, m, k)).astype(np.int8))
        b = jnp.asarray(rng.integers(-100, 100, (batch, k, n)).astype(np.int8))
    else:
        a = jnp.asarray(rng.random((batch, m, k)).astype(np.float32)).astype(dtype)
        b = jnp.asarray(rng.random((batch, k, n)).astype(np.float32)).astype(dtype)

    @jax.jit
    def run(a, b):
        def step(i, acc):
            p = jax.lax.dot_general(
                a, b, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=acc_dtype)
            return acc + p.astype(acc_dtype)

        z = jnp.zeros((batch, m, n), acc_dtype)
        return jax.lax.fori_loop(0, 50, step, z)

    dt, _ = timed(run, a, b)
    macs = batch * m * k * n * 50
    print(f"{name:28s} {2*macs/dt/1e12:8.1f} Tops/s  ({dt*1e3:.2f} ms)")


mm_rate(4096, 128, 128, jnp.int8, jnp.int32, "int8 mm 4096x128x128")
mm_rate(4096, 128, 128, jnp.bfloat16, jnp.float32, "bf16 mm 4096x128x128")
mm_rate(8192, 256, 256, jnp.int8, jnp.int32, "int8 mm 8192x256x256")
mm_rate(2048, 64, 64, jnp.int8, jnp.int32, "int8 bmm 32x2048x64x64", batch=32)
mm_rate(256, 32, 32, jnp.int8, jnp.int32, "int8 bmm 64x256x32x32", batch=64)
mm_rate(4096, 128, 128, jnp.float32, jnp.float32, "f32 mm 4096x128x128")

# --- 5. roll throughput --------------------------------------------------
def roll_kernel(x_ref, o_ref):
    def step(i, v):
        return pltpu.roll(v, 8, axis=0) + jnp.float32(1.0)

    o_ref[...] = jax.lax.fori_loop(0, ITERS, step, x_ref[...])


@jax.jit
def roll_run(x):
    return pl.pallas_call(
        roll_kernel,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


x = jnp.asarray(np.random.rand(R, C).astype(np.float32))
dt, _ = timed(roll_run, x)
print(f"{'roll(8,axis=0)+add chain':28s} {R*C*ITERS/dt/1e12:8.3f} Trolls/s ({dt*1e3:.2f} ms)")
