#!/usr/bin/env python
"""Benchmark: batched programmable bootstraps per second per chip at the
DEFAULT_128 production parameter set (the BASELINE.json headline metric).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

`vs_baseline` is measured against the BASELINE.json north-star target of
10,000 PBS/sec/chip (the reference publishes no numbers of its own; its
design notes imply ~40 us/CMux single-core => ~39 PBS/s/core,
`sunscreen_tfhe/notes/leveled_computation.md:17`).

Flow: generate (or load cached) real DEFAULT_128 keys on the CPU host,
move the bootstrap key to the accelerator, run a jitted batched PBS,
time steady-state iterations, and verify decryption correctness of the
results on the host.

Usage: python bench.py [--quick] [--batch N] [--iters K] [--backend ds32|c128]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NORTH_STAR_PBS_PER_SEC = 10_000.0
KEY_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".keys_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small batch, few iters")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--backend", default=None, choices=["ds32", "c128"])
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument(
        "--keygen-only", action="store_true",
        help="generate and cache DEFAULT_128 keys, then exit (CPU backend)",
    )
    args = ap.parse_args()

    if args.cpu or args.keygen_only:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.cpu or args.keygen_only:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    import spf_tpu  # noqa: F401
    from spf_tpu.ops import bootstrap, encryption as enc, torus
    from spf_tpu.ops.fft import get_backend
    from spf_tpu.params import DEFAULT_128

    # system info (≙ reference `benchmark_system_info::print_system_info`)
    import platform as _plat

    print(
        f"# system: {_plat.platform()} python={_plat.python_version()} "
        f"jax={jax.__version__} devices={jax.devices()}",
        file=sys.stderr,
    )

    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    backend = args.backend or ("ds32" if on_tpu else "c128")
    be = get_backend(backend)
    if args.batch:
        batch = args.batch
    elif on_tpu:
        # throughput saturates ~batch 128-256; larger batches only
        # inflate compile time through the remote-compile tunnel
        batch = 128 if args.quick else 256
    else:
        batch = 16 if args.quick else 64
    iters = args.iters or (2 if args.quick else 5)

    p = DEFAULT_128
    lwe, glwe, radix = p.l0_params, p.l1_params, p.pbs_radix
    bits = 3

    # --- keys (host-side; cached) ---
    os.makedirs(KEY_CACHE, exist_ok=True)
    sk_path = os.path.join(KEY_CACHE, "default128_sk.npz")
    bsk_path = os.path.join(KEY_CACHE, "default128_bsk_coeff.npy")
    # disjoint subkeys for keygen vs input encryption (never reuse a
    # consumed PRNG key: the keygen subkeys must not appear in ciphertext
    # masks)
    key, key_enc = jax.random.split(jax.random.key(2024))
    t0 = time.time()
    if args.keygen_only:
        k1, k2, k3 = jax.random.split(key, 3)
        lwe_sk = enc.generate_lwe_sk(k1, lwe)
        glwe_sk = enc.generate_glwe_sk(k2, glwe)
        keys = jax.random.split(k3, lwe.dim)
        enc_row = jax.jit(
            lambda k, b: enc.encrypt_ggsw_scalar(k, b, glwe_sk, glwe, radix)
        )
        rows = [enc_row(keys[i], lwe_sk[i]) for i in range(lwe.dim)]
        np.savez(sk_path, lwe_sk=np.asarray(lwe_sk), glwe_sk=np.asarray(glwe_sk))
        np.save(bsk_path, np.asarray(jnp.stack(rows, axis=0)))
        print(f"# keygen done in {time.time()-t0:.1f}s", file=sys.stderr)
        return
    if not (os.path.exists(sk_path) and os.path.exists(bsk_path)):
        # keygen uses exact u64 polynomial products, which only lower on
        # the CPU backend — run it in a CPU subprocess
        import subprocess

        print("# generating keys in a CPU subprocess...", file=sys.stderr)
        env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="")
        subprocess.run(
            [sys.executable, __file__, "--keygen-only"], env=env, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    data = np.load(sk_path)
    lwe_sk = jnp.asarray(data["lwe_sk"])
    glwe_sk = jnp.asarray(data["glwe_sk"])
    bsk_coeff = jnp.asarray(np.load(bsk_path))
    print(f"# keys ready in {time.time()-t0:.1f}s", file=sys.stderr)

    lut = bootstrap.generate_lut([lambda x: (x + 1) % 8], glwe, bits)

    # --- encrypt inputs (host) ---
    msgs = jnp.arange(batch, dtype=jnp.uint64) % 8
    cts = jax.vmap(
        lambda k, m: enc.encrypt_lwe(k, torus.encode(m, bits + 1), lwe_sk, lwe)
    )(jax.random.split(key_enc, batch), msgs)

    # --- jitted batched PBS ---
    if backend == "ds32":
        # TPU production path: coefficient-major layout (bootstrap_tpu)
        from spf_tpu.ops import bootstrap_tpu as bt

        bsk_t = jax.jit(bt.bsk_to_t)(bsk_coeff)
        jax.block_until_ready(bsk_t)
        cts = bt.to_t_layout(cts)

        @jax.jit
        def step(c):
            return bt.from_t_layout(
                bt.programmable_bootstrap_t(c, lut, bsk_t, lwe, glwe, radix)
            )
    else:
        bsk = be.fwd_torus(bsk_coeff)

        @jax.jit
        def step(c):
            return bootstrap.programmable_bootstrap_univariate(
                c, lut, bsk, lwe, glwe, radix, be
            )

    t0 = time.time()
    out = step(cts)
    jax.block_until_ready(out)
    compile_and_first = time.time() - t0
    print(f"# first call (compile+run): {compile_and_first:.1f}s", file=sys.stderr)

    times = []
    for _ in range(iters):
        t0 = time.time()
        out = step(cts)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    best = min(times)
    pbs_per_sec = batch / best

    # --- correctness check (host decrypt) ---
    dec = torus.decode(
        enc.decrypt_lwe(
            np.asarray(out), enc.glwe_sk_to_lwe_sk(glwe_sk), glwe.as_lwe_def()
        ),
        bits,
    )
    expected = (np.arange(batch) + 1) % 8
    n_correct = int((np.asarray(dec) == expected).sum())
    if n_correct != batch:
        print(
            f"# WARNING: only {n_correct}/{batch} bootstraps decrypted correctly",
            file=sys.stderr,
        )

    result = {
        "metric": "programmable_bootstraps_per_sec_per_chip",
        "value": round(pbs_per_sec, 2),
        "unit": "PBS/s",
        "vs_baseline": round(pbs_per_sec / NORTH_STAR_PBS_PER_SEC, 4),
        "batch": batch,
        "best_step_s": round(best, 4),
        "backend": backend,
        "platform": platform,
        "correct": f"{n_correct}/{batch}",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
