#!/usr/bin/env python
"""One-off TPU probes: per-op timing of the blind-rotation step pieces,
MXU f32 matmul throughput/precision, and VPU elementwise throughput.
Informs the PBS kernel roadmap (not part of the test suite)."""

import os
import sys
import time

os.environ["SPF_TPU_X32"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=5):
    f = jax.jit(fn)
    t0 = time.time()
    out = f(*args)
    jax.block_until_ready(out)
    compile_t = time.time() - t0
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = f(*args)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    best = min(times)
    print(f"{name}: best {best*1e6:.0f} us (compile {compile_t:.1f}s)", flush=True)
    return best, out


def main():
    print(f"devices: {jax.devices()}", flush=True)
    B, N, K = 128, 2048, 1024
    L, KP1 = 2, 2
    key = jax.random.key(0)

    # --- MXU f32 matmul: DFT-128-shaped [rows,128]x[128,128] ---
    rows = L * KP1 * B * (N // 128)  # per-step hybrid DFT row count
    a = jax.random.normal(key, (rows, 128), dtype=jnp.float32)
    m = jax.random.normal(key, (128, 128), dtype=jnp.float32)
    for prec in ("default", "float32", "highest"):
        t, _ = timeit(
            f"matmul[{rows}x128x128] prec={prec}",
            lambda x, w, p=prec: jnp.dot(x, w, precision=p),
            a, m,
        )
        flops = 2 * rows * 128 * 128
        print(f"  -> {flops/t/1e12:.1f} TFLOP/s", flush=True)

    # larger matmul to see peak
    a2 = jax.random.normal(key, (8192, 1024), dtype=jnp.float32)
    m2 = jax.random.normal(key, (1024, 1024), dtype=jnp.float32)
    for prec in ("default", "float32", "highest"):
        t, _ = timeit(
            f"matmul[8192x1024x1024] prec={prec}",
            lambda x, w, p=prec: jnp.dot(x, w, precision=p),
            a2, m2,
        )
        print(f"  -> {2*8192*1024*1024/t/1e12:.1f} TFLOP/s", flush=True)

    # --- int8 MXU matmul (byte-plane DFT feasibility): s8 x s8 -> s32 ---
    rows8 = 8192
    for nmat in (1, 21):  # 1 matmul; 21 = plane-class count for 47-bit DFT
        a8 = jax.random.randint(key, (nmat, rows8, 128), -127, 127, dtype=jnp.int8)
        w8 = jax.random.randint(key, (nmat, 128, 128), -127, 127, dtype=jnp.int8)
        t, out8 = timeit(
            f"int8 matmul x{nmat} [{rows8}x128x128] -> i32",
            lambda x, w: jax.lax.dot_general(
                x, w, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            ),
            a8, w8,
        )
        print(f"  -> {2*nmat*rows8*128*128/t/1e12:.1f} TOP/s, dtype {out8.dtype}", flush=True)
    # exactness check: int8 matmul must accumulate exactly in int32
    an8 = np.random.default_rng(2).integers(-127, 127, (256, 128)).astype(np.int8)
    wn8 = np.random.default_rng(3).integers(-127, 127, (128, 128)).astype(np.int8)
    got8 = np.asarray(
        jax.jit(
            lambda x, w: jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        )(jnp.asarray(an8), jnp.asarray(wn8))
    )
    exact8 = an8.astype(np.int64) @ wn8.astype(np.int64)
    print(f"int8 matmul exact: {np.array_equal(got8, exact8.astype(np.int32))}", flush=True)

    # --- plane recombination cost (the VPU side of a byte-plane DFT):
    # 6 scale buckets of i32 -> one ds pair, on DFT-128-output shapes ---
    cls = jax.random.randint(key, (6, rows8, 128), -(1 << 20), 1 << 20, dtype=jnp.int32)

    def recombine(c):
        from spf_tpu.ops import ds

        hi = c[0].astype(jnp.float32)
        lo = jnp.zeros_like(hi)
        for i in range(1, 6):
            hi, lo = ds.add(hi, lo, c[i].astype(jnp.float32) * jnp.float32(2.0 ** (-8 * i)), jnp.zeros_like(hi))
        return hi, lo

    t, _ = timeit("plane recombination 6->ds [8192,128]", recombine, cls)
    print(f"  -> {rows8*128/t/1e9:.2f} Gelem/s", flush=True)

    # --- matmul precision vs f64 host ---
    an = np.random.default_rng(0).normal(size=(256, 128)) * 2**20
    mn = np.random.default_rng(1).normal(size=(128, 128))
    exact = an @ mn
    for prec in ("default", "float32", "highest"):
        got = np.asarray(
            jax.jit(lambda x, w, p=prec: jnp.dot(x, w, precision=p))(
                jnp.asarray(an, jnp.float32), jnp.asarray(mn, jnp.float32)
            )
        )
        err = np.abs(got - exact).max()
        rel = err / np.abs(exact).max()
        print(
            f"matmul prec={prec}: max abs err 2^{np.log2(err+1e-30):.1f} "
            f"(rel 2^{np.log2(rel+1e-30):.1f})", flush=True,
        )

    # --- VPU: ds32 mul chain throughput ---
    from spf_tpu.ops import ds

    x = jax.random.normal(key, (4, K, B), dtype=jnp.float32)
    y = jax.random.normal(key, (4, K, B), dtype=jnp.float32) * 1e-8

    def ds_chain(xh, xl, yh, yl):
        for _ in range(50):
            xh, xl = ds.mul(xh, xl, yh, yl)
            xh, xl = ds.add(xh, xl, yh, yl)
        return xh, xl

    t, _ = timeit("vpu ds chain (50 mul+add on [4,1024,128])", ds_chain, x[0], x[1], y[0], y[1])
    flops = 50 * (14 + 4) * 4 * K * B  # ~14 flops/ds.mul, 4/ds.add (x4 planes? no: per point)
    print(f"  -> ~{50*18*K*B*1.0/t/1e12:.2f} TFLOP/s VPU estimate", flush=True)

    # --- step pieces at DEFAULT_128 shapes ---
    from spf_tpu.ops import bootstrap_u32 as bu, limb32 as lbb
    from spf_tpu.params import DEFAULT_128
    from spf_tpu.ops.rot_decomp_pallas import rotate_sub_decompose

    p = DEFAULT_128
    glwe, radix = p.l1_params, p.pbs_radix
    acc = (
        jax.random.randint(key, (KP1, N, B), 0, 1 << 31, dtype=jnp.int32).astype(jnp.uint32),
        jax.random.randint(key, (KP1, N, B), 0, 1 << 31, dtype=jnp.int32).astype(jnp.uint32),
    )
    t_amt = jax.random.randint(key, (B,), 0, 2 * N, dtype=jnp.int32).astype(jnp.uint32)
    bsk_row = tuple(
        jax.random.normal(key, (KP1, L, KP1, K), dtype=jnp.float32) for _ in range(4)
    )

    timeit("rot_decomp_pallas", lambda a_, t_: rotate_sub_decompose(a_, t_, radix), acc, t_amt)

    digits = jax.random.randint(key, (L, KP1, N, B), -(1 << 15), 1 << 15, dtype=jnp.int32)
    t_fwd, dfft = timeit("fwd FFT digits (XLA ds)", lambda d: bu.fwd_signed(d, use_pallas=False), digits)
    t_fwdp, _ = timeit("fwd FFT digits (pallas)", lambda d: bu.fwd_signed(d, use_pallas=True), digits)

    timeit("freq_mad", lambda d: bu.freq_mad(d, bsk_row, glwe, radix), dfft)

    accf = tuple(jax.random.normal(key, (KP1, K, B), dtype=jnp.float32) * s for s in (1e9, 1.0, 1e9, 1.0))
    timeit("inv FFT (XLA ds)", lambda f: bu.inv_limb(f, use_pallas=False), accf)
    timeit("inv FFT (pallas)", lambda f: bu.inv_limb(f, use_pallas=True), accf)

    timeit("monomial_mul (unfused rolls)", lambda a_, t_: bu.monomial_mul_u32(a_, t_), acc, t_amt)
    from spf_tpu.ops import limb32 as lb
    timeit("decompose (XLA)", lambda a_: lb.decompose(a_, radix), acc)
    timeit("limb add", lambda a_: lb.add(a_, a_), acc)


if __name__ == "__main__":
    main()
