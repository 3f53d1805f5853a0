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
    ap.add_argument(
        "--backend", default=None, choices=["ds32", "c128", "u32", "u32f", "pallas"]
    )
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument(
        "--cbs", action="store_true",
        help="benchmark the full conversion cycle (CBS -> CMux -> sample"
        " extract -> keyswitch) instead of bare PBS; x32 backends only",
    )
    ap.add_argument(
        "--keygen-only", action="store_true",
        help="generate and cache DEFAULT_128 keys, then exit (CPU backend)",
    )
    args = ap.parse_args()

    if args.cpu or args.keygen_only:
        os.environ["JAX_PLATFORMS"] = "cpu"
    x32 = args.backend in ("u32", "u32f", "pallas")
    if x32:
        # the limb pipeline graphs must build without x64 (Mosaic has no
        # 64-bit ints); spf_tpu skips enabling x64 under this env var
        os.environ["SPF_TPU_X32"] = "1"

    import jax

    if args.cpu or args.keygen_only:
        jax.config.update("jax_platforms", "cpu")
    if not x32:
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    import spf_tpu  # noqa: F401
    from spf_tpu.ops import bootstrap, encryption as enc
    from spf_tpu.params import DEFAULT_128

    if not x32:
        from spf_tpu.ops import torus
        from spf_tpu.ops.fft import get_backend

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
    be = get_backend(backend) if backend in ("ds32", "c128") else None
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
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
        lwe_sk = enc.generate_lwe_sk(k1, lwe)
        glwe_sk = enc.generate_glwe_sk(k2, glwe)
        keys = jax.random.split(k3, lwe.dim)
        enc_row = jax.jit(
            lambda k, b: enc.encrypt_ggsw_scalar(k, b, glwe_sk, glwe, radix)
        )
        rows = [enc_row(keys[i], lwe_sk[i]) for i in range(lwe.dim)]
        np.savez(sk_path, lwe_sk=np.asarray(lwe_sk), glwe_sk=np.asarray(glwe_sk))
        np.save(bsk_path, np.asarray(jnp.stack(rows, axis=0)))
        print(f"# bsk done in {time.time()-t0:.1f}s", file=sys.stderr)
        # conversion-cycle keys (coefficient domain): automorphism,
        # scheme switch, L1->L0 LWE keyswitch
        from spf_tpu.ops import keyswitch as ks_mod
        from spf_tpu.ops.scheme_switch import generate_scheme_switch_key

        t0 = time.time()
        ak = ks_mod.generate_automorphism_keys(k4, glwe_sk, glwe, p.tr_radix, be=None)
        np.save(os.path.join(KEY_CACHE, "default128_ak_coeff.npy"), np.asarray(ak))
        ssk = generate_scheme_switch_key(k5, glwe_sk, glwe, p.ss_radix, be=None)
        np.save(os.path.join(KEY_CACHE, "default128_ssk_coeff.npy"), np.asarray(ssk))
        ksk = ks_mod.generate_lwe_keyswitch_key(
            k6, enc.glwe_sk_to_lwe_sk(glwe_sk), lwe_sk,
            glwe.as_lwe_def(), lwe, p.ks_radix,
        )
        np.save(os.path.join(KEY_CACHE, "default128_ksk.npy"), np.asarray(ksk))
        print(f"# ak/ssk/ksk done in {time.time()-t0:.1f}s", file=sys.stderr)
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
    lwe_sk_np = data["lwe_sk"]
    glwe_sk_np = data["glwe_sk"]
    bsk_coeff_np = np.load(bsk_path)
    print(f"# keys ready in {time.time()-t0:.1f}s", file=sys.stderr)

    msgs_np = np.arange(batch, dtype=np.uint64) % 8
    expected = (np.arange(batch) + 1) % 8

    if x32:
        # ---- x32 limb pipeline (u32 = XLA core FFT, pallas = Mosaic) ----
        from spf_tpu.ops import bootstrap_u32 as bu, limb32 as lbb

        use_pallas = backend == "pallas"
        fuse_rot = backend == "u32f"
        rng = np.random.default_rng(20240817)
        lut_np = bootstrap.generate_lut_np([lambda x: (x + 1) % 8], glwe, bits)

        # numpy host encryption (the x32 process has no u64 jax ops)
        a = rng.integers(0, 1 << 64, size=(batch, lwe.dim), dtype=np.uint64)
        e = np.round(rng.normal(0.0, lwe.std * 2.0**64, size=batch)).astype(
            np.int64
        ).astype(np.uint64)
        m = msgs_np << np.uint64(64 - (bits + 1))
        b = (a * lwe_sk_np[None, :]).sum(axis=1, dtype=np.uint64) + m + e
        cts_np = np.concatenate([a, b[:, None]], axis=1)  # [B, n0+1]

        t0 = time.time()
        bsk_freq = bu.bsk_to_freq_u32(bsk_coeff_np, use_pallas=use_pallas)
        jax.block_until_ready(bsk_freq)
        print(f"# bsk fft in {time.time()-t0:.1f}s", file=sys.stderr)

        if args.cbs:
            # ---- full conversion cycle: L0 LWE -> (CBS) -> GGSW ->
            # (CMux) -> GLWE -> (extract) -> L1 LWE -> (KS) -> L0 LWE ----
            from spf_tpu.ops import cbs_u32 as cu
            from spf_tpu.ops.keyswitch_u32 import (
                keyswitch_lwe_u32, ksk_to_byte_planes,
            )

            ak_np = np.load(os.path.join(KEY_CACHE, "default128_ak_coeff.npy"))
            ssk_np = np.load(os.path.join(KEY_CACHE, "default128_ssk_coeff.npy"))
            ksk_np = np.load(os.path.join(KEY_CACHE, "default128_ksk.npy"))
            t0 = time.time()
            ak_freq = bu.bsk_to_freq_u32(ak_np, use_pallas=use_pallas)
            ssk_freq = bu.bsk_to_freq_u32(ssk_np, use_pallas=use_pallas)
            ksk_planes = ksk_to_byte_planes(ksk_np)
            jax.block_until_ready(ak_freq)
            print(f"# ak/ssk fft in {time.time()-t0:.1f}s", file=sys.stderr)

            bits_in = (np.arange(batch) % 2).astype(np.uint64)
            a = rng.integers(0, 1 << 64, size=(batch, lwe.dim), dtype=np.uint64)
            e = np.round(
                rng.normal(0.0, lwe.std * 2.0**64, size=batch)
            ).astype(np.int64).astype(np.uint64)
            bcol = (a * lwe_sk_np[None, :]).sum(axis=1, dtype=np.uint64) + (
                bits_in << np.uint64(63)
            ) + e
            cts_np = np.concatenate([a, bcol[:, None]], axis=1)
            cts_limb = lbb.from_u64_np(cts_np.T)

            n1 = glwe.degree
            m1_np = np.zeros((glwe.size + 1, n1, batch), dtype=np.uint64)
            m1_np[-1, :, :] = np.uint64(1) << np.uint64(63)
            m1 = lbb.from_u64_np(m1_np)

            @jax.jit
            def cycle(c):
                ggsw = cu.circuit_bootstrap_u32(
                    c, bsk_freq, ak_freq, ssk_freq, p, use_pallas=use_pallas
                )
                m0 = lbb.zeros((glwe.size + 1, n1, c[0].shape[-1]))
                sel = bu.cmux_u32(m0, m1, ggsw, glwe, p.cbs_radix, use_pallas)
                l1 = bu.sample_extract_u32(sel, 0, glwe)
                return keyswitch_lwe_u32(
                    l1, ksk_planes, glwe.as_lwe_def(), lwe, p.ks_radix
                )

            t0 = time.time()
            out = cycle(cts_limb)
            jax.block_until_ready(out)
            print(
                f"# first call (compile+run): {time.time()-t0:.1f}s",
                file=sys.stderr,
            )
            times = []
            for _ in range(iters):
                t0 = time.time()
                out = cycle(cts_limb)
                jax.block_until_ready(out)
                times.append(time.time() - t0)
            best = min(times)

            out_np = lbb.to_u64_np(jax.device_get(out)).T  # [B, n0+1]
            phase = out_np[:, -1] - (out_np[:, :-1] * lwe_sk_np[None, :]).sum(
                axis=1, dtype=np.uint64
            )
            rb = (phase >> np.uint64(62)) & np.uint64(1)
            dec = ((phase >> np.uint64(63)) + rb) & np.uint64(1)
            n_correct = int((dec == bits_in).sum())
            if n_correct != batch:
                print(
                    f"# WARNING: only {n_correct}/{batch} conversion cycles"
                    " decrypted correctly",
                    file=sys.stderr,
                )
            result = {
                "metric": "conversion_cycles_per_sec_per_chip",
                "value": round(batch / best, 2),
                "unit": "CBS/s",
                "vs_baseline": round((batch / best) / 1000.0, 4),
                "batch": batch,
                "best_step_s": round(best, 4),
                "backend": backend,
                "platform": platform,
                "correct": f"{n_correct}/{batch}",
            }
            print(json.dumps(result))
            return

        lut_limb = lbb.from_u64_np(lut_np)
        cts_limb = lbb.from_u64_np(cts_np.T)  # t-layout [n0+1, B]

        @jax.jit
        def step(c):
            return bu.programmable_bootstrap_u32(
                c, lut_limb, bsk_freq, lwe, glwe, radix,
                use_pallas=use_pallas, fuse_rot=fuse_rot,
            )

        t0 = time.time()
        out = step(cts_limb)
        jax.block_until_ready(out)
        compile_and_first = time.time() - t0
        print(
            f"# first call (compile+run): {compile_and_first:.1f}s", file=sys.stderr
        )
        times = []
        for _ in range(iters):
            t0 = time.time()
            out = step(cts_limb)
            jax.block_until_ready(out)
            times.append(time.time() - t0)
        best = min(times)
        pbs_per_sec = batch / best

        # numpy decrypt + decode under the flattened GLWE key
        out_np = lbb.to_u64_np(jax.device_get(out)).T  # [B, kN+1]
        sk_flat = glwe_sk_np.reshape(-1)
        phase = out_np[:, -1] - (out_np[:, :-1] * sk_flat[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        rb = (phase >> np.uint64(64 - bits - 1)) & np.uint64(1)
        dec = ((phase >> np.uint64(64 - bits)) + rb) & np.uint64((1 << bits) - 1)
        n_correct = int((dec == expected).sum())
        if n_correct != batch:
            print(
                f"# WARNING: only {n_correct}/{batch} bootstraps decrypted"
                " correctly",
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
        return

    lwe_sk = jnp.asarray(lwe_sk_np)
    glwe_sk = jnp.asarray(glwe_sk_np)
    bsk_coeff = jnp.asarray(bsk_coeff_np)
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
