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
KEY_CACHE = os.environ.get(
    "SPF_KEY_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".keys_cache"),
)


def robust_best(times):
    """Best steady-state time, discarding axon relay memo hits.

    The relay can return a cached result for a re-submitted
    value-identical (executable, args) pair in ~0.5 ms (observed: a
    0.46 s PBS step 'measured' at 0.1 ms, inflating throughput 4000x).
    A memo hit is orders of magnitude faster than a real step, so drop
    any sample under 25% of the median before taking the min. This is a
    safety net for MIXED samples; the primary defense is that every
    timed submission uses a value-DISTINCT input (`make_variants`), so
    the memo can never hit in the first place."""
    import statistics

    med = statistics.median(times)
    return min(t for t in times if t >= 0.25 * med)


def make_variants(tree, n):
    """n value-DISTINCT copies of an input pytree: the axon relay
    memoizes re-submission of value-identical args, so every timed
    iteration must submit a different value. Variant i adds a
    PER-PROCESS random salt + i (wrapping) to the first element of the
    first array leaf — the salt keeps values distinct even across
    bench processes (the relay memo has been observed to hit ACROSS
    runs: a g=3 multibit bench once 'measured' 0.1 ms steps because
    every deterministic variant had been submitted hours earlier).
    Harmless for timing; correctness is always checked on a separate
    call with the pristine inputs."""
    import os

    import jax
    import jax.numpy as jnp

    # mask to 31 bits so salt + i fits every integer leaf dtype (an
    # unmasked 32-bit salt can overflow jnp.asarray for int32/uint32
    # leaves when salt + i >= 2^31 / 2^32)
    salt = int.from_bytes(os.urandom(4), "little") & 0x3FFFFFFF
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = []
    for i in range(n):
        # perturb EVERY leaf (a single-leaf single-element perturbation
        # was still observed to memo-hit on the in-process suite ops)
        newleaves = []
        for leaf in leaves:
            idx = (0,) * leaf.ndim
            newleaves.append(
                leaf.at[idx].add(jnp.asarray(salt + i, dtype=leaf.dtype))
            )
        out.append(jax.tree_util.tree_unflatten(treedef, newleaves))
    return out
DEFAULT_TPU_BACKEND = "u32mb"  # fastest measured production pipeline
# multi-bit blind-rotation group sizes (measured at DEFAULT_128, batch
# 256, Horner-factored subset phases): bare PBS is fastest at g=3
# (963 PBS/s vs 940 at g=2). CBS-dependent modes default to g=2: the
# g=3 CBS whole-cycle graph reproducibly crashes the axon
# remote-compile service (broken pipe after ~25 min, twice), while the
# g=2 cycle compiles in ~4 min.
DEFAULT_MB_GROUP_PBS = 3
DEFAULT_MB_GROUP_CBS = 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small batch, few iters")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument(
        "--backend", default=None,
        choices=["ds32", "c128", "u32", "u32f", "pallas", "u32p", "u32ph",
                 "u32php", "u32mb"],
    )
    ap.add_argument(
        "--group", type=int, default=None,
        help="multi-bit blind-rotation group size (u32mb backend);"
        " default 3 for bare PBS, 2 for CBS-dependent modes",
    )
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument(
        "--cbs", action="store_true",
        help="benchmark the full conversion cycle (CBS -> CMux -> sample"
        " extract -> keyswitch) instead of bare PBS; x32 backends only",
    )
    ap.add_argument("--intop", default=None, choices=["add", "mul"],
                    help="encrypted integer op latency (CBS + cmux circuit)")
    ap.add_argument("--width", type=int, default=None, choices=[8, 16, 32])
    ap.add_argument(
        "--e2e-add", action="store_true",
        help="run 8 encrypted u8 adds end-to-end (CBS all 128 input bits"
        " -> levelized batched cmux adder -> decrypt); x32 backends only",
    )
    ap.add_argument(
        "--program", default=None,
        choices=["hamming_distance", "cardio", "mul32"],
        help="run a reference-compiled ELF program end-to-end on the u32"
        " TPU pipeline at DEFAULT_128 (encrypted args -> deferred"
        " dataflow graph -> batched CBS/cmux waves -> decrypt); the"
        " metric set of parasol_cpu/benches; x32 backends only",
    )
    ap.add_argument(
        "--keygen-only", action="store_true",
        help="generate and cache DEFAULT_128 keys, then exit (CPU backend)",
    )
    ap.add_argument(
        "--keygen-mb", action="store_true",
        help="generate and cache the multi-bit bootstrap key for --group,"
        " then exit (CPU backend; requires the base keys)",
    )
    ap.add_argument(
        "--suitevec-only", action="store_true",
        help="generate and cache suite test-vector ciphertexts (CPU backend)",
    )
    ap.add_argument(
        "--suite-ops-only", action="store_true",
        help="suite: only the in-process crypto-op metrics (cmux, glev"
        " cmux, keyswitch, scheme switch); merge into BENCH_SUITE.json",
    )
    ap.add_argument(
        "--suite-jobs", default=None,
        help="comma-separated subset of suite x32 jobs to (re)run and"
        " merge into BENCH_SUITE.json (e.g. mul8,program_hamming);"
        " skips the in-process ops",
    )
    ap.add_argument(
        "--suite", action="store_true",
        help="run the full benchmark suite (cmux, glev cmux, keyswitch,"
        " scheme switch, pbs, cbs) and write BENCH_SUITE.json"
        " (≙ reference criterion harnesses fhe_ops.rs:40-85)",
    )
    args = ap.parse_args()
    if args.group is None:
        cbs_mode = bool(args.cbs or args.intop or args.e2e_add or args.program)
        args.group = DEFAULT_MB_GROUP_CBS if cbs_mode else DEFAULT_MB_GROUP_PBS

    if args.suite or args.suite_ops_only or args.suite_jobs:
        return run_suite(args)
    if args.cpu or args.keygen_only or args.keygen_mb or args.suitevec_only:
        os.environ["JAX_PLATFORMS"] = "cpu"
    if (
        args.backend is None
        and not (args.cpu or args.keygen_only or args.suitevec_only)
        and "axon" in os.environ.get("JAX_PLATFORMS", "")
    ):
        # driver default on the TPU: the fastest production pipeline
        # (x32 must be decided BEFORE jax imports, hence the env sniff)
        args.backend = DEFAULT_TPU_BACKEND
    x32 = args.backend in (
        "u32", "u32f", "pallas", "u32p", "u32ph", "u32php", "u32mb"
    )
    if x32:
        # the limb pipeline graphs must build without x64 (Mosaic has no
        # 64-bit ints); spf_tpu skips enabling x64 under this env var
        os.environ["SPF_TPU_X32"] = "1"

    import jax

    if args.cpu or args.keygen_only or args.keygen_mb or args.suitevec_only:
        jax.config.update("jax_platforms", "cpu")
    if not x32:
        jax.config.update("jax_enable_x64", True)
    # persistent executable cache (default ON; SPF_TPU_JAX_CACHE=0
    # disables). Measured r5 on the axon relay: the cache works —
    # bsk-fft jit first-call 64.3 s cold -> 2.5 s warm — provided key
    # material is passed as jit ARGUMENTS (captured keys get embedded
    # into the serialized executable: the PBS step entry was 733 MB
    # and its warm load 60-90 s; as arguments it is 8.7 MB). Residual
    # warm first-call is ~35-40 s: the axon backend re-does its
    # server-side executable load on every process regardless of the
    # local cache, which is the floor the relay imposes (<10 s is not
    # reachable through the tunnel; cold 87-100 s -> warm ~40 s).
    if os.environ.get("SPF_TPU_JAX_CACHE", "1") != "0":
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

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
    if cbs_mode and os.environ.get("SPF_CBS_PBS_RADIX"):
        # opt-in override of the CBS-internal blind-rotation radix
        # (e.g. SPF_CBS_PBS_RADIX=4,8): the ds32 FFT-MAD error scales
        # with digit magnitude, so a narrower-digit radix cuts CBS
        # output noise at ~2x blind-rotation cost (see Params
        # .cbs_pbs_radix); the multi-bit key cache is suffixed per radix
        import dataclasses as _dc

        from spf_tpu.params import RadixDecomposition as _RD

        _l, _b = (
            int(x) for x in os.environ["SPF_CBS_PBS_RADIX"].split(",")
        )
        p = _dc.replace(p, cbs_pbs_radix=_RD(count=_l, radix_log=_b))
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
        rows = jax.jit(
            jax.vmap(
                lambda k, b: enc.encrypt_ggsw_scalar(k, b, glwe_sk, glwe, radix)
            )
        )(keys, lwe_sk)
        np.savez(sk_path, lwe_sk=np.asarray(lwe_sk), glwe_sk=np.asarray(glwe_sk))
        np.save(bsk_path, np.asarray(rows))
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

    if args.keygen_mb:
        # multi-bit bootstrap key (u64 encryption -> CPU backend)
        from spf_tpu.ops import multibit as mb

        g = args.group
        data = np.load(sk_path)
        lwe_sk = jnp.asarray(data["lwe_sk"])
        glwe_sk = jnp.asarray(data["glwe_sk"])
        kmb = jax.random.fold_in(key, 4242 + g)
        rows = mb.generate_multibit_bsk(kmb, lwe_sk, glwe_sk, glwe, radix, g)
        np.save(
            os.path.join(KEY_CACHE, f"default128_bskmb{g}_coeff.npy"),
            np.asarray(rows),
        )
        print(f"# multibit bsk (g={g}) done in {time.time()-t0:.1f}s",
              file=sys.stderr)
        return

    if args.suitevec_only:
        # encrypted test vectors for the benchmark suite (encryption
        # uses exact u64 polynomial products -> CPU backend):
        # GGSW(bit) at cbs radix, fresh GLEV(bit), L1 LWE(bit)
        data = np.load(sk_path)
        lwe_sk = jnp.asarray(data["lwe_sk"])
        glwe_sk = jnp.asarray(data["glwe_sk"])
        kv = jax.random.fold_in(key, 7)
        n1 = glwe.degree
        bits_pat = [i % 2 for i in range(8)]
        ggsws, glevs = [], []
        for i, b in enumerate(bits_pat):
            kg, kl = jax.random.split(jax.random.fold_in(kv, i))
            ggsws.append(
                enc.encrypt_ggsw_scalar(kg, jnp.uint64(b), glwe_sk, glwe, p.cbs_radix)
            )
            poly = jnp.zeros((n1,), dtype=jnp.uint64).at[0].set(b)
            glevs.append(enc.encrypt_glev(kl, poly, glwe_sk, glwe, p.cbs_radix))
        n_lwe1 = 1024
        l1_def = glwe.as_lwe_def()
        l1_sk = enc.glwe_sk_to_lwe_sk(glwe_sk)
        lwe1_bits = np.array([i % 2 for i in range(n_lwe1)], dtype=np.uint64)
        ks_in = jax.vmap(
            lambda k, m: enc.encrypt_lwe(k, torus.encode(m, 1), l1_sk, l1_def)
        )(jax.random.split(jax.random.fold_in(kv, 999), n_lwe1), jnp.asarray(lwe1_bits))
        np.savez(
            os.path.join(KEY_CACHE, "default128_suitevecs.npz"),
            ggsws=np.asarray(jnp.stack(ggsws)),
            glevs=np.asarray(jnp.stack(glevs)),
            ggsw_bits=np.array(bits_pat, dtype=np.uint64),
            glev_bits=np.array(bits_pat, dtype=np.uint64),
            ks_in=np.asarray(ks_in),
            ks_bits=lwe1_bits,
        )
        print(f"# suite vectors done in {time.time()-t0:.1f}s", file=sys.stderr)
        return
    if not (os.path.exists(sk_path) and os.path.exists(bsk_path)):
        if x32:
            # on-device keygen (u32 limbs): no subprocess, runs on TPU
            print("# generating keys on-device (u32)...", file=sys.stderr)
            _keygen_on_device(p, jax, np)
        else:
            # u64 keygen only lowers on the CPU backend — subprocess
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

        # pallas: VMEM-resident Pallas FFTs; u32f: fused rotate+decompose
        # kernel (XLA FFTs); u32p: both
        use_pallas = backend in ("pallas", "u32p", "u32php")
        fuse_rot = backend in ("u32f", "u32p")
        phase_rot = backend in ("u32ph", "u32php")
        multibit = backend == "u32mb"
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
        if multibit:
            g = args.group
            # CBS-dependent modes blind-rotate at cbs_pbs_radix_eff
            # (may differ from pbs_radix; the key cache is per radix)
            br = p.cbs_pbs_radix_eff if cbs_mode else p.pbs_radix
            sfx = (
                "" if br == p.pbs_radix
                else f"_r{br.count}x{br.radix_log}"
            )
            mb_path = os.path.join(
                KEY_CACHE, f"default128_bskmb{g}{sfx}_coeff.npy"
            )
            if not os.path.exists(mb_path):
                # on-device multi-bit keygen (u32): no subprocess
                print(f"# generating multibit bsk (g={g}{sfx}) on-device...",
                      file=sys.stderr)
                _keygen_on_device(p, jax, np, group=g, mb_radix=br)
            bsk_freq = _freq_cached(
                f"bskmb{g}{sfx}", np.load(mb_path), use_pallas, bu, jax,
                np, jnp,
            )
        else:
            bsk_freq = _freq_cached(
                "bsk", bsk_coeff_np, use_pallas, bu, jax, np, jnp
            )
        print(f"# bsk fft in {time.time()-t0:.1f}s", file=sys.stderr)

        if args.program:
            return run_program_bench(
                args, p, bsk_freq, lwe_sk_np, glwe_sk_np, use_pallas,
                jax, np, jnp, bu,
            )

        if args.cbs:
            # ---- full conversion cycle: L0 LWE -> (CBS) -> GGSW ->
            # (CMux) -> GLWE -> (extract) -> L1 LWE -> (KS) -> L0 LWE ----
            from spf_tpu.ops import cbs_u32 as cu
            from spf_tpu.ops.keyswitch_u32 import (
                keyswitch_lwe_u32, ksk_to_byte_planes,
            )

            _ensure_conversion_keys(p, x32, jax, np)
            ak_np = np.load(os.path.join(KEY_CACHE, "default128_ak_coeff.npy"))
            ssk_np = np.load(os.path.join(KEY_CACHE, "default128_ssk_coeff.npy"))
            ksk_np = np.load(os.path.join(KEY_CACHE, "default128_ksk.npy"))
            t0 = time.time()
            ak_freq = _freq_cached("ak", ak_np, use_pallas, bu, jax, np, jnp)
            ssk_freq = _freq_cached("ssk", ssk_np, use_pallas, bu, jax, np, jnp)
            ksk_planes = ksk_to_byte_planes(ksk_np)
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

            # keys as jit ARGUMENTS (not captured constants): captured
            # keys get embedded into the serialized executable, blowing
            # the persistent-cache entry to 100s of MB and its warm
            # load to a minute (see the PBS step note)
            @jax.jit
            def _cycle(c, bsk, ak, ssk, ksk_p):
                ggsw = cu.circuit_bootstrap_u32(
                    c, bsk, ak, ssk, p, use_pallas=use_pallas,
                    phase_rot=phase_rot,
                )
                m0 = lbb.zeros((glwe.size + 1, n1, c[0].shape[-1]))
                sel = bu.cmux_u32(m0, m1, ggsw, glwe, p.cbs_radix, use_pallas)
                l1 = bu.sample_extract_u32(sel, 0, glwe)
                return keyswitch_lwe_u32(
                    l1, ksk_p, glwe.as_lwe_def(), lwe, p.ks_radix
                )

            def cycle(c):
                return _cycle(c, bsk_freq, ak_freq, ssk_freq, ksk_planes)

            t0 = time.time()
            out = cycle(cts_limb)
            jax.block_until_ready(out)
            print(
                f"# first call (compile+run): {time.time()-t0:.1f}s",
                file=sys.stderr,
            )
            # value-distinct submissions + forced end-of-queue sync
            # (see timed_throughput)
            variants = make_variants(cts_limb, max(iters, 2))
            best = timed_throughput(cycle, variants, jax, np)
            out = cycle(cts_limb)

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
            # noise margin: bits between the worst observed phase error
            # and the decryption decision boundary (2^62 for 1-bit msgs)
            err = (phase - (bits_in << np.uint64(63))).astype(np.int64)
            margin = round(62 - np.log2(max(float(np.abs(err).max()), 1.0)), 1)
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
                "noise_margin_bits": margin,
            }
            print(json.dumps(result))
            return

        if args.e2e_add or args.intop:
            # ---- encrypted integer add/mul end-to-end on hardware: CBS
            # all 2*width*n_inst input bits in one batch -> levelized
            # batched cmux circuit -> decrypt. Widths 8/16/32 (the
            # reference's criterion metric set: add & mul latency). ----
            from spf_tpu.circuits import integer as ic
            from spf_tpu.ops import cbs_u32 as cu
            from spf_tpu.ops.keyswitch_u32 import ksk_to_byte_planes
            from spf_tpu.ops.mux_eval_u32 import (
                RefreshKeys, evaluate_mux_circuit_u32,
            )

            op = args.intop or "add"
            width = args.width or 8
            _ensure_conversion_keys(p, x32, jax, np)
            ak_np = np.load(os.path.join(KEY_CACHE, "default128_ak_coeff.npy"))
            ssk_np = np.load(os.path.join(KEY_CACHE, "default128_ssk_coeff.npy"))
            ak_freq = _freq_cached("ak", ak_np, use_pallas, bu, jax, np, jnp)
            ssk_freq = _freq_cached("ssk", ssk_np, use_pallas, bu, jax, np, jnp)
            # mid-tree wire recryption for deep circuits (mul16's
            # depth-510 chains exceed the unrefreshed noise budget —
            # the r4 mul16 0/4 failure)
            refresh = RefreshKeys(
                bsk_freq=bsk_freq, ak_freq=ak_freq, ssk_freq=ssk_freq,
                ksk_planes=ksk_to_byte_planes(
                    np.load(os.path.join(KEY_CACHE, "default128_ksk.npy"))
                ),
                params=p,
            )

            n_inst = max(1, 64 // width)  # 2*width*n_inst = 128 lanes
            rng2 = np.random.default_rng(11)
            a_vals = rng2.integers(0, 1 << width, n_inst, dtype=np.uint64)
            b_vals = rng2.integers(0, 1 << width, n_inst, dtype=np.uint64)
            bit_list = []
            for idx in range(2 * width):
                for j in range(n_inst):
                    v = int(a_vals[j] if idx < width else b_vals[j])
                    bit_list.append((v >> (idx % width)) & 1)
            bits_in = np.array(bit_list, dtype=np.uint64)
            bb = bits_in.size  # 128: fills the lane tile exactly
            a = rng.integers(0, 1 << 64, size=(bb, lwe.dim), dtype=np.uint64)
            e = np.round(
                rng.normal(0.0, lwe.std * 2.0**64, size=bb)
            ).astype(np.int64).astype(np.uint64)
            bcol = (a * lwe_sk_np[None, :]).sum(axis=1, dtype=np.uint64) + (
                bits_in << np.uint64(63)
            ) + e
            cts_rows = np.concatenate([a, bcol[:, None]], axis=1)  # [bb, n0+1]
            cts_limb = lbb.from_u64_np(cts_rows.T)
            if op == "add":
                circuit = ic.ripple_carry_adder(width, emit_carry=True)
                expected = [int(a_vals[i]) + int(b_vals[i]) for i in range(n_inst)]
            else:
                # widths above CIRCUIT_CUTOFF are not single circuits in
                # the reference either (gradeschool partitioning,
                # `mul.rs:254`); measure via the program path instead
                assert width <= 16, "use --program mul32 for wide muls"
                circuit = ic.unsigned_multiplier(width, width)
                expected = [int(a_vals[i]) * int(b_vals[i]) for i in range(n_inst)]

            exec_mode = os.environ.get("SPF_U32_EXEC", "wave")
            if exec_mode == "wave":
                # Wave machine (default): ONE FheCircuit holding all
                # n_inst instances — input CBS batches into maximal
                # waves, mux levels merge across instances, runs of
                # equal-width cmux waves scan-fuse into single
                # dispatches (VERDICT r4 #6). SPF_U32_EXEC=perlevel
                # selects the legacy per-level-jit path below.
                from spf_tpu.runtime.executor_u32 import U32ComputeKey
                from spf_tpu.runtime.fhe_circuit import (
                    CtType, FheCircuit, FheEdge, FheOp,
                )
                from spf_tpu.runtime.wave_machine import WaveMachine

                key_obj = U32ComputeKey(
                    bsk_freq=bsk_freq, ak_freq=ak_freq, ssk_freq=ssk_freq,
                    ksk_planes=refresh.ksk_planes,
                    ggsw_zero_freq=None, ggsw_one_freq=None,
                )
                wm = WaveMachine(key_obj, p, use_pallas=use_pallas)
                g = FheCircuit()
                sel_all = []
                for r in range(bb):
                    nd = g.add_node(FheOp.INPUT_LWE0, f"b{r}")
                    sel_all.append(
                        g.insert_ciphertext_conversion(
                            nd, CtType.LWE0, CtType.GGSW1
                        )
                    )
                out_keys = []
                refresh_every = (
                    int(os.environ["SPF_MUX_REFRESH"])
                    if "SPF_MUX_REFRESH" in os.environ else None
                )
                for j in range(n_inst):
                    sels = [
                        sel_all[idx * n_inst + j] for idx in range(2 * width)
                    ]
                    outs_j = g.insert_mux_circuit(
                        circuit, sels, refresh_every=refresh_every
                    )
                    for wi, o in enumerate(outs_j):
                        okey = f"o{j}_{wi}"
                        on = g.add_node(FheOp.OUTPUT_GLWE1, okey)
                        g.add_edge(o, on, FheEdge.UNARY)
                        out_keys.append((j, wi, okey))

                def run_op(rows):
                    return wm.run(
                        g, {f"b{r}": rows[r] for r in range(bb)}
                    )

                t0 = time.time()
                res = run_op(cts_rows)
                print(
                    f"# first call (compile+run): {time.time()-t0:.1f}s",
                    file=sys.stderr,
                )
                # value-distinct inputs per timed call (relay memo; see
                # make_variants) — wm.run device_gets its outputs, so
                # each call is end-to-end synced
                salt = int.from_bytes(os.urandom(4), "little") & 0x3FFFFFFF
                times = []
                for i in range(max(iters, 2)):
                    vr = cts_rows.copy()
                    vr[:, 0] += np.uint64(salt + i)
                    t0 = time.time()
                    run_op(vr)
                    times.append(time.time() - t0)
                best = robust_best(times)
                res = run_op(cts_rows)

                s_poly = glwe_sk_np[0]
                n1 = glwe.degree
                sums = [0] * n_inst
                n_ok = 0
                margins = []  # per-output-bit noise margin (bits to the
                # 2^62 decision boundary) vs the EXPECTED bit
                for (j, wi, okey) in out_keys:
                    wirex = res[okey]  # u64 [k+1, N]
                    a_p, b_p = wirex[0], wirex[1]
                    conv0 = a_p[0] * s_poly[0] - np.sum(
                        a_p[n1 - np.nonzero(s_poly[1:])[0] - 1]
                    ).astype(np.uint64)
                    phase = b_p[0] - conv0
                    bit = (
                        (phase >> np.uint64(63))
                        + ((phase >> np.uint64(62)) & 1)
                    ) & 1
                    sums[j] |= int(bit) << wi
                    eb = (int(expected[j]) >> wi) & 1
                    err = (int(phase) - (eb << 63)) % (1 << 64)
                    if err >= 1 << 63:
                        err = (1 << 64) - err
                    margins.append(62 - np.log2(max(err, 1)))
                    if os.environ.get("SPF_DUMP_MARGINS"):
                        print(
                            f"# margin inst={j} bit={wi} "
                            f"{margins[-1]:.1f}", file=sys.stderr,
                        )
                for inst in range(n_inst):
                    if int(sums[inst]) == expected[inst]:
                        n_ok += 1
                ws = wm.wave_stats()
                result = {
                    "metric": f"encrypted_u{width}_{op}s_per_sec_per_chip",
                    "value": round(n_inst / best, 3),
                    "unit": f"u{width} {op}s/s",
                    "vs_baseline": round((n_inst / best) / 100.0, 4),
                    "batch": n_inst,
                    "latency_s": round(best, 4),
                    "backend": backend,
                    "platform": platform,
                    "correct": f"{n_ok}/{n_inst}",
                    "executor": "wave_machine",
                    "mean_cmux_batch": ws.get("cmux", {}).get("mean_batch"),
                    "mean_cbs_batch": ws.get("cbs", {}).get("mean_batch"),
                    "noise_margin_bits_worst": round(float(min(margins)), 1),
                    "noise_margin_bits_median": round(
                        float(np.median(margins)), 1
                    ),
                }
                print(json.dumps(result))
                return

            # TWO jits (CBS, then the mux circuit): the single fused
            # graph exceeds what the remote-compile service handles for
            # the wide/deep circuits (mul8+ / add32 crashed the compile);
            # the extra dispatch costs ~26 ms against a ~0.2-2 s latency
            cbs_fn = jax.jit(
                lambda c: cu.circuit_bootstrap_u32(
                    c, bsk_freq, ak_freq, ssk_freq, p, use_pallas=use_pallas,
                    phase_rot=phase_rot,
                )
            )
            def eval_fn(g):
                # per-level jitted cmuxes (shared executables): the
                # monolithic circuit jit crashed the remote-compile
                # service for mul8+/add32-sized circuits
                return tuple(
                    tuple(o)
                    for o in evaluate_mux_circuit_u32(
                        circuit, g, glwe, p.cbs_radix, n_inst,
                        use_pallas=use_pallas, per_level_jit=True,
                        refresh=refresh,
                    )
                )

            def run_op(c):
                return eval_fn(cbs_fn(c))

            t0 = time.time()
            outs = run_op(cts_limb)
            jax.block_until_ready(outs)
            print(
                f"# first call (compile+run): {time.time()-t0:.1f}s",
                file=sys.stderr,
            )
            # IMPORTANT: alternate a second, distinct input buffer — the
            # axon relay memoizes re-submission of an identical
            # (executable, arg buffers) pair and returns the cached
            # result in ~0.5 ms, which silently inflates throughput
            variants = make_variants(cts_limb, max(iters, 2))
            best = timed_throughput(run_op, variants, jax, np)
            outs = run_op(cts_limb)  # decrypt the canonical batch below

            # host decrypt of each output wire (k = 1)
            s_poly = glwe_sk_np[0]
            n1 = glwe.degree
            sums = np.zeros(n_inst, dtype=np.object_)
            sums[:] = 0
            n_ok = 0
            for j, w in enumerate(outs):
                wire = lbb.to_u64_np(jax.device_get(w))  # [k+1, N, n_inst]
                for inst in range(n_inst):
                    a_p, b_p = wire[0, :, inst], wire[1, :, inst]
                    # negacyclic (a (*) s)[0] = a[0]s[0] - sum_{t>0} a[N-t]s[t]
                    conv0 = a_p[0] * s_poly[0] - np.sum(
                        a_p[n1 - np.nonzero(s_poly[1:])[0] - 1]
                    ).astype(np.uint64)
                    phase = b_p[0] - conv0
                    bit = ((phase >> np.uint64(63)) + ((phase >> np.uint64(62)) & 1)) & 1
                    sums[inst] |= int(bit) << j
            for inst in range(n_inst):
                if int(sums[inst]) == expected[inst]:
                    n_ok += 1
            result = {
                "metric": f"encrypted_u{width}_{op}s_per_sec_per_chip",
                "value": round(n_inst / best, 3),
                "unit": f"u{width} {op}s/s",
                "vs_baseline": round((n_inst / best) / 100.0, 4),
                "batch": n_inst,
                "latency_s": round(best, 4),
                "backend": backend,
                "platform": platform,
                "correct": f"{n_ok}/{n_inst}",
            }
            print(json.dumps(result))
            return

        lut_limb = lbb.from_u64_np(lut_np)
        cts_limb = lbb.from_u64_np(cts_np.T)  # t-layout [n0+1, B]

        # key material is passed as a jit ARGUMENT, not a captured
        # constant: capturing embeds the (multi-GB at g=3) BSK into the
        # serialized executable, making the persistent compilation
        # cache entry 733 MB and its warm-process load ~60-90 s through
        # the axon relay — argument-passing keeps the entry small so a
        # warm cache turns first-call into seconds (VERDICT r4 #5)
        if multibit:
            from spf_tpu.ops import multibit as mb

            @jax.jit
            def _step(c, bsk):
                return mb.programmable_bootstrap_multibit_u32(
                    c, lut_limb, bsk, lwe, glwe, radix, args.group,
                    use_pallas=use_pallas,
                )
        else:

            @jax.jit
            def _step(c, bsk):
                return bu.programmable_bootstrap_u32(
                    c, lut_limb, bsk, lwe, glwe, radix,
                    use_pallas=use_pallas, fuse_rot=fuse_rot,
                    phase_rot=phase_rot,
                )

        def step(c):
            return _step(c, bsk_freq)

        t0 = time.time()
        out = step(cts_limb)
        jax.block_until_ready(out)
        compile_and_first = time.time() - t0
        print(
            f"# first call (compile+run): {compile_and_first:.1f}s", file=sys.stderr
        )
        # every timed submission must be value-distinct (axon memoizes
        # identical re-submissions; see make_variants), and the batch is
        # timed with a forced end-of-queue sync (see timed_throughput)
        variants = make_variants(cts_limb, max(iters, 2))
        best = timed_throughput(step, variants, jax, np)
        out = step(cts_limb)
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
        # noise margin: bits between the worst observed phase error and
        # the decision boundary 2^(64-bits-1)
        err = (phase - (expected.astype(np.uint64) << np.uint64(64 - bits))).astype(
            np.int64
        )
        margin = round(
            64 - bits - 1 - np.log2(max(float(np.abs(err).max()), 1.0)), 1
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
            "noise_margin_bits": margin,
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

    # value-distinct submissions + forced end-of-queue sync
    variants = make_variants(cts, max(iters, 2))
    best = timed_throughput(step, variants, jax, np)
    out = step(cts)
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



def timed_throughput(step_fn, variants, jax, np):
    """Throughput timing that the axon relay cannot fake: each
    value-distinct call is individually synced with a device_get
    checksum before its timer stops (`block_until_ready` alone has been
    observed returning ~0.1 ms for real ~0.2 s steps, inflating a
    1,163 PBS/s measurement to a phantom 3M/s; queueing all calls and
    syncing once measured ~2x the true per-step time — the relay does
    not pipeline queued steps). The reported best-of therefore
    CONTAINS one ~50 ms dispatch+readback round trip per step — a
    conservative bound, not an optimistic one."""
    times = []
    for v in variants:
        t0 = time.time()
        out = step_fn(v)
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[:8]))
        times.append(time.time() - t0)
    return min(times)


def _keygen_on_device(p, jax, np, group=None, mb_radix=None):
    """Generate DEFAULT_128 keys IN-PROCESS on the current device via the
    u32-limb generators (`ops/encryption_u32.py`) — works on TPU in x32
    mode, so a cold bench run performs no CPU-subprocess keygen
    (≙ reference in-process keygen,
    `programmable_bootstrapping.rs:34-58`). Writes the same cache files
    as `--keygen-only` / `--keygen-mb`; the PRNG split structure matches
    the u64 generators, so secret keys and ciphertext masks are
    bit-identical to a CPU-generated cache (only the Gaussian noise
    draws differ, f32 vs f64 sampling).

    With `group` set, generates ONLY the multi-bit BSK for that group
    size (requires the base secret keys, generated first if missing).
    """
    import time as _t

    import jax.numpy as jnp

    from spf_tpu.ops import encryption_u32 as eu, limb32 as lbb

    lwe, glwe = p.l0_params, p.l1_params
    key, _ = jax.random.split(jax.random.key(2024))
    sk_path = os.path.join(KEY_CACHE, "default128_sk.npz")
    os.makedirs(KEY_CACHE, exist_ok=True)

    def save64(path, limb):
        np.save(path, lbb.to_u64_np(jax.device_get(limb)))

    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    if os.path.exists(sk_path):
        d = np.load(sk_path)
        lwe_sk = jnp.asarray(d["lwe_sk"].astype(np.uint32))
        glwe_sk = jnp.asarray(d["glwe_sk"].astype(np.uint32))
    else:
        lwe_sk = eu.binary_u32(k1, (lwe.dim,))
        glwe_sk = eu.binary_u32(k2, (glwe.size, glwe.degree))
        np.savez(
            sk_path,
            lwe_sk=np.asarray(jax.device_get(lwe_sk)).astype(np.uint64),
            glwe_sk=np.asarray(jax.device_get(glwe_sk)).astype(np.uint64),
        )

    if group is not None:
        br = mb_radix or p.pbs_radix
        sfx = "" if br == p.pbs_radix else f"_r{br.count}x{br.radix_log}"
        t0 = _t.time()
        kmb = jax.random.fold_in(key, 4242 + group)
        rows = jax.jit(
            lambda k_, ls, gs: eu.generate_multibit_bsk_u32(
                k_, ls, gs, glwe, br, group
            )
        )(kmb, lwe_sk, glwe_sk)
        save64(
            os.path.join(
                KEY_CACHE, f"default128_bskmb{group}{sfx}_coeff.npy"
            ),
            rows,
        )
        print(
            f"# on-device multibit bsk (g={group}{sfx}) in "
            f"{_t.time()-t0:.1f}s",
            file=sys.stderr,
        )
        return

    t0 = _t.time()
    bsk = jax.jit(
        lambda k_, ls, gs: eu.generate_bootstrap_key_u32(
            k_, ls, gs, lwe, glwe, p.pbs_radix
        )
    )(k3, lwe_sk, glwe_sk)
    save64(os.path.join(KEY_CACHE, "default128_bsk_coeff.npy"), bsk)
    print(f"# on-device bsk in {_t.time()-t0:.1f}s", file=sys.stderr)

    t0 = _t.time()
    ak = jax.jit(
        lambda k_, gs: eu.generate_automorphism_keys_u32(k_, gs, glwe, p.tr_radix)
    )(k4, glwe_sk)
    save64(os.path.join(KEY_CACHE, "default128_ak_coeff.npy"), ak)
    ssk = jax.jit(
        lambda k_, gs: eu.generate_scheme_switch_key_u32(k_, gs, glwe, p.ss_radix)
    )(k5, glwe_sk)
    save64(os.path.join(KEY_CACHE, "default128_ssk_coeff.npy"), ssk)
    ksk = jax.jit(
        lambda k_, gs, ls: eu.generate_lwe_keyswitch_key_u32(
            k_, gs.reshape(-1), ls, glwe.as_lwe_def(), lwe, p.ks_radix
        )
    )(k6, glwe_sk, lwe_sk)
    save64(os.path.join(KEY_CACHE, "default128_ksk.npy"), ksk)
    print(f"# on-device ak/ssk/ksk in {_t.time()-t0:.1f}s", file=sys.stderr)


def _suitevec_on_device(p, jax, np):
    """On-device (u32) twin of `--suitevec-only`: encrypted test vectors
    for the suite/program benches, same PRNG derivation as the CPU path
    (masks bit-identical; noise draw f32 vs f64)."""
    import jax.numpy as jnp

    from spf_tpu.ops import encryption_u32 as eu, limb32 as lbb

    glwe = p.l1_params
    key, _ = jax.random.split(jax.random.key(2024))
    sk_path = os.path.join(KEY_CACHE, "default128_sk.npz")
    if not os.path.exists(sk_path):
        _keygen_on_device(p, jax, np)
    d = np.load(sk_path)
    glwe_sk = jnp.asarray(d["glwe_sk"].astype(np.uint32))
    kv = jax.random.fold_in(key, 7)
    n1 = glwe.degree
    bits_pat = [i % 2 for i in range(8)]
    ggsws, glevs = [], []
    for i, b in enumerate(bits_pat):
        kg, kl = jax.random.split(jax.random.fold_in(kv, i))
        ggsws.append(
            lbb.to_u64_np(jax.device_get(jax.jit(
                lambda k_, gs: eu.encrypt_ggsw_scalar_u32(
                    k_, jnp.uint32(b), gs, glwe, p.cbs_radix
                )
            )(kg, glwe_sk)))
        )
        m0 = jnp.zeros((n1,), dtype=jnp.uint32).at[0].set(jnp.uint32(b))
        glevs.append(
            lbb.to_u64_np(jax.device_get(jax.jit(
                lambda k_, gs, m: eu.encrypt_glev_u32(
                    k_, (jnp.zeros_like(m), m), gs, glwe, p.cbs_radix
                )
            )(kl, glwe_sk, m0)))
        )
    n_lwe1 = 1024
    l1_def = glwe.as_lwe_def()
    lwe1_bits = np.array([i % 2 for i in range(n_lwe1)], dtype=np.uint64)
    keys1 = jax.random.split(jax.random.fold_in(kv, 999), n_lwe1)
    msgs_hi = jnp.asarray((lwe1_bits << np.uint64(63)) >> np.uint64(32),
                          jnp.uint32)
    ks_in = jax.jit(jax.vmap(
        lambda k_, mh: eu.encrypt_lwe_u32(
            k_, (mh, jnp.uint32(0)), glwe_sk.reshape(-1), l1_def
        )
    ))(keys1, msgs_hi)
    np.savez(
        os.path.join(KEY_CACHE, "default128_suitevecs.npz"),
        ggsws=np.stack(ggsws),
        glevs=np.stack(glevs),
        ggsw_bits=np.array(bits_pat, dtype=np.uint64),
        glev_bits=np.array(bits_pat, dtype=np.uint64),
        ks_in=lbb.to_u64_np(jax.device_get(ks_in)),
        ks_bits=lwe1_bits,
    )


def _ensure_conversion_keys(p, x32, jax, np):
    """ak/ssk/ksk present in the cache, generating on-device (x32) or in
    a CPU subprocess otherwise."""
    need = ["default128_ak_coeff.npy", "default128_ssk_coeff.npy",
            "default128_ksk.npy"]
    if all(os.path.exists(os.path.join(KEY_CACHE, f)) for f in need):
        return
    if x32:
        print("# generating conversion keys on-device (u32)...",
              file=sys.stderr)
        _keygen_on_device(p, jax, np)
    else:
        import subprocess

        env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="")
        subprocess.run(
            [sys.executable, __file__, "--keygen-only"], env=env, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )


def _freq_cached(name, coeff_np, use_pallas, bu, jax, np, jnp):
    """Disk-cache the frequency-domain form of an evaluation key: the
    fwd transform of the full BSK compiles/runs in minutes through the
    remote-compile tunnel and is pure function of the cached coeff key.
    The frequency ORDER differs between the XLA and Pallas FFT kernels,
    so the cache is keyed by flavor."""
    # "xscr" = the take-free scrambled-frequency XLA convention (round 3);
    # old "xla" (natural-order) caches are stale and must not be reused
    flavor = "pallas" if use_pallas else "xscr8"
    path = os.path.join(KEY_CACHE, f"default128_{name}_freq_{flavor}.npz")
    if os.path.exists(path):
        d = np.load(path)
        return tuple(jnp.asarray(d[f"c{i}"]) for i in range(4))
    freq = bu.bsk_to_freq_u32(coeff_np, use_pallas=use_pallas)
    jax.block_until_ready(freq)
    np.savez(path, **{f"c{i}": np.asarray(c) for i, c in enumerate(freq)})
    return freq


def run_program_bench(args, p, bsk_freq, lwe_sk_np, glwe_sk_np, use_pallas,
                      jax, np, jnp, bu):
    """Run a reference-compiled ELF program on the u32 TPU pipeline at
    DEFAULT_128 (≙ `parasol_cpu/benches/{hamming_distance,cardio}.rs`):
    FheComputer defers every encrypted op into one dataflow graph whose
    flush executes as batched CBS/cmux waves on the accelerator."""
    from spf_tpu.cpu import ArgsBuilder, FheComputer, Memory
    from spf_tpu.cpu.memory import EncByte
    from spf_tpu.ops.keyswitch_u32 import ksk_to_byte_planes
    from spf_tpu.runtime.executor_u32 import (
        U32CircuitExecutor, U32ComputeKey, U32HostEvaluation,
    )
    from spf_tpu.utils import host_crypto as hc

    glwe = p.l1_params
    name = args.program
    test_data = "/root/reference/parasol_cpu/tests/test_data"
    _ensure_conversion_keys(p, True, jax, np)
    if not os.path.exists(os.path.join(KEY_CACHE, "default128_suitevecs.npz")):
        print("# generating suite vectors on-device (u32)...", file=sys.stderr)
        _suitevec_on_device(p, jax, np)
    ak_np = np.load(os.path.join(KEY_CACHE, "default128_ak_coeff.npy"))
    ssk_np = np.load(os.path.join(KEY_CACHE, "default128_ssk_coeff.npy"))
    ksk_np = np.load(os.path.join(KEY_CACHE, "default128_ksk.npy"))
    vec = np.load(os.path.join(KEY_CACHE, "default128_suitevecs.npz"))
    assert vec["ggsw_bits"][0] == 0 and vec["ggsw_bits"][1] == 1
    t0 = time.time()
    key = U32ComputeKey(
        bsk_freq=bsk_freq,
        ak_freq=_freq_cached("ak", ak_np, use_pallas, bu, jax, np, jnp),
        ssk_freq=_freq_cached("ssk", ssk_np, use_pallas, bu, jax, np, jnp),
        ksk_planes=ksk_to_byte_planes(ksk_np),
        ggsw_zero_freq=bu.bsk_to_freq_u32(
            np.asarray(vec["ggsws"][0]), use_pallas=use_pallas
        ),
        ggsw_one_freq=bu.bsk_to_freq_u32(
            np.asarray(vec["ggsws"][1]), use_pallas=use_pallas
        ),
    )
    print(f"# key material ready in {time.time()-t0:.1f}s", file=sys.stderr)
    # The program bench defaults to the WAVE MACHINE (index-driven
    # slot-buffer executor, `runtime/wave_machine.py`): one dispatch per
    # wave (scan-fused runs for cmux), greedy op-batched scheduling that
    # consolidates the CBS conversions (r4: 144 waves of mean batch 2.7
    # at mul32), and a tiny shared executable set. SPF_U32_EXEC=perwave
    # selects the legacy per-wave executor, =whole the whole-circuit jit
    # (times out the remote-compile relay for mul32/hamming-sized
    # graphs).
    exec_mode = os.environ.get("SPF_U32_EXEC", "wave")
    if exec_mode == "wave":
        from spf_tpu.runtime.wave_machine import WaveMachine

        ex = WaveMachine(key, p, use_pallas=use_pallas)
    else:
        ex = U32CircuitExecutor(
            key, p, use_pallas=use_pallas,
            whole_circuit=(exec_mode == "whole"),
        )
    ev = U32HostEvaluation(p)
    rngh = np.random.default_rng(20260818)

    def enc_uint(v, w):
        return hc.encrypt_uint_bits_np(rngh, v, w, glwe_sk_np, glwe)

    def enc_bytes(bit_cts):
        return [EncByte(bit_cts[8 * i : 8 * i + 8])
                for i in range(len(bit_cts) // 8)]

    def alloc_store(memory, byts, align=16):
        addr = memory.try_allocate(len(byts), align)
        for i, bb in enumerate(byts):
            memory.store_byte(addr + i, bb)
        return addr

    def run_once():
        proc = None
        if name == "mul32":
            # synthetic 32x32 multiply through the full production path:
            # encrypted args -> Mul instruction -> fluent gradeschool
            # composition (widths above CIRCUIT_CUTOFF, `mul.rs:254`)
            # -> batched CBS/cmux waves
            from spf_tpu.cpu.isa import RP, SP, Asm

            asm = (
                Asm()
                .load(1, SP, 32, offset=0)
                .load(2, SP, 32, offset=4)
                .mul(3, 1, 2)
                .store(RP, 3, 32)
                .ret()
            )
            memory = Memory()
            entry = memory.allocate_program(asm.instrs)
            proc = FheComputer(ev, executor=ex)
            a_v, b_v = 51977, 40961
            call = (
                ArgsBuilder()
                .arg_encrypted(enc_uint(a_v, 32))
                .arg_encrypted(enc_uint(b_v, 32))
                .return_value(32)
                .build()
            )
            expected = (a_v * b_v) & 0xFFFFFFFF
            rp = proc.run_program(entry, memory, call)
            got = 0
            for i in range(4):
                bt = memory.load_byte(rp + i)
                assert isinstance(bt, EncByte)
                got |= hc.decrypt_uint_bits_np(
                    [np.asarray(b) for b in bt.bits], glwe_sk_np, glwe
                ) << (8 * i)
            return got, expected, proc
        with open(os.path.join(test_data, name), "rb") as f:
            elf = f.read()
        memory = Memory.new_from_elf(elf)
        proc = FheComputer(ev, executor=ex)
        if name == "hamming_distance":
            a_bytes = (0xFEEDF00D_CAFEBABE).to_bytes(8, "little")
            b_bytes = (0x12345678_9ABCDEF0).to_bytes(8, "little")
            da, db = [], []
            for x, y in zip(a_bytes, b_bytes):
                da.extend(enc_bytes(enc_uint(x, 8)))
                db.extend(enc_bytes(enc_uint(y, 8)))
            a_ptr = alloc_store(memory, da)
            b_ptr = alloc_store(memory, db)
            call = (
                ArgsBuilder().arg(a_ptr, 32).arg(b_ptr, 32).arg(8, 32)
                .return_value(8).build()
            )
            expected = 30
            entry = memory.get_function_entry("hamming_distance")
        else:  # cardio (reference bench scenario: score = 3)
            flags = sum(int(x) << i for i, x in enumerate(
                [False, False, True, True]
            ))
            call = ArgsBuilder()
            for v in (flags, 40, 50, 70, 170, 1, 1):
                call = call.arg_encrypted(enc_uint(v, 8))
            call = call.return_value(8).build()
            expected = 3
            entry = memory.get_function_entry("cardio")
        rp = proc.run_program(entry, memory, call)
        out_bits = []
        bt = memory.load_byte(rp)
        assert isinstance(bt, EncByte)
        got = hc.decrypt_uint_bits_np(
            [np.asarray(b) for b in bt.bits], glwe_sk_np, glwe
        )
        return got, expected, proc

    t0 = time.time()
    got, expected, _ = run_once()
    first = time.time() - t0
    print(f"# first run (compile+run): {first:.1f}s -> {got}", file=sys.stderr)
    times = []
    for _ in range(max(args.iters or 2, 2)):
        t0 = time.time()
        got, expected, proc = run_once()
        times.append(time.time() - t0)
    best = robust_best(times)
    stats = ex.wave_stats()
    cmux = stats.get("cmux", {})
    result = {
        "metric": f"program_{name}_latency_s",
        "value": round(best, 3),
        "unit": "s",
        "vs_baseline": 0,
        "first_run_s": round(first, 1),
        "correct": bool(got == expected),
        "got": int(got),
        "mean_cmux_batch": cmux.get("mean_batch"),
        "mean_cbs_batch": stats.get("cbs", {}).get("mean_batch"),
        "wave_stats": stats,
        "backend": args.backend,
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(result))


def run_suite(args):
    """Benchmark-suite parity with the reference's criterion harnesses
    (`parasol_runtime/benches/fhe_ops.rs:40-85`: CMux, GLEV CMux,
    scheme switch, CBS, keyswitch; PBS from `sunscreen_tfhe/benches`).

    Crypto-op metrics run in-process on the accelerator with the ds32
    backend (u64 torus); PBS and the full conversion cycle (CBS) run as
    x32 subprocesses (the Pallas/limb pipeline). All results land in
    BENCH_SUITE.json; stdout gets ONE summary JSON line.
    """
    import subprocess

    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    import spf_tpu  # noqa: F401
    from spf_tpu.ops import encryption as enc, fft_ops, keyswitch as ks_mod, torus
    from spf_tpu.ops.fft import get_backend
    from spf_tpu.params import DEFAULT_128

    repo = os.path.dirname(os.path.abspath(__file__))
    p = DEFAULT_128
    lwe, glwe = p.l0_params, p.l1_params
    platform = jax.devices()[0].platform
    iters = args.iters or 3
    results = {}
    only_jobs = (
        [j.strip() for j in args.suite_jobs.split(",")]
        if getattr(args, "suite_jobs", None) else None
    )

    # --- keys + vectors (cached; CPU subprocesses generate on miss) ---
    def ensure(path, flag):
        if not os.path.exists(os.path.join(KEY_CACHE, path)):
            env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="")
            subprocess.run(
                [sys.executable, __file__, flag], env=env, check=True, cwd=repo
            )

    ensure("default128_sk.npz", "--keygen-only")
    ensure("default128_suitevecs.npz", "--suitevec-only")
    sk = np.load(os.path.join(KEY_CACHE, "default128_sk.npz"))
    lwe_sk_np, glwe_sk_np = sk["lwe_sk"], sk["glwe_sk"]
    vec = np.load(os.path.join(KEY_CACHE, "default128_suitevecs.npz"))
    be = get_backend("ds32")

    def time_steps(fn, *arrs, n_iters=None):
        """Steady-state seconds per call of jitted fn(*arrs).

        Methodology (round 4): every timed iteration submits a
        value-DISTINCT input set (the axon relay memoizes value-identical
        resubmissions), the first call is synced with a device_get
        checksum (`block_until_ready` under-reports on cold
        executables — returns before execution completes), and the
        timed calls are submitted back-to-back with one final forced
        sync, so per-step = total/n amortizes the ~26 ms relay dispatch
        latency instead of hiding async under-reporting."""

        def sync(o):
            leaf = jax.tree_util.tree_leaves(o)[0]
            np.asarray(jax.device_get(leaf.ravel()[:8]))

        fn_j = jax.jit(fn)
        n = max(n_iters or iters, 2)
        variants = make_variants(arrs, n + 1)
        t0 = time.time()
        out = fn_j(*variants[n])  # compile on a throwaway variant
        jax.block_until_ready(out)
        sync(out)
        first = time.time() - t0
        t0 = time.time()
        outs = [fn_j(*variants[i]) for i in range(n)]
        jax.block_until_ready(outs)
        for o in outs:
            sync(o)
        total = time.time() - t0
        return total / n, first, fn_j(*arrs)

    def _np_glwe_phase0(ct, glwe_sk, gdef):
        """Phase at coefficient 0 of one GLWE [k+1, N] (numpy u64)."""
        acc = np.uint64(0)
        for i in range(gdef.size):
            a = np.asarray(ct[i])
            s = np.asarray(glwe_sk[i])
            nz = np.nonzero(s[1:])[0]
            acc += a[0] * s[0] - np.sum(
                a[gdef.degree - nz - 1]
            ).astype(np.uint64)
        return np.asarray(ct[-1])[0] - acc

    def np_decrypt_glwe0(ct, expect_bits):
        """Decode bit at coefficient 0 of batched GLWEs [B, k+1, N]."""
        ct = np.asarray(ct)
        s = glwe_sk_np
        phases = []
        for b in range(ct.shape[0]):
            acc = np.zeros(glwe.degree, dtype=np.uint64)
            for i in range(glwe.size):
                a = ct[b, i]
                # negacyclic a * s_i
                con = np.zeros(2 * glwe.degree, dtype=np.uint64)
                for t in range(glwe.degree):
                    if s[i, t]:
                        con[t : t + glwe.degree] += a
                acc += con[: glwe.degree] - con[glwe.degree :]
            phases.append(ct[b, -1, 0] - acc[0])
        ph = np.array(phases, dtype=np.uint64)
        rb = (ph >> np.uint64(62)) & np.uint64(1)
        dec = ((ph >> np.uint64(63)) + rb) & np.uint64(1)
        return int((dec == expect_bits[: ct.shape[0]]).sum())

    if only_jobs is None:
        # in-process crypto-op metrics (skipped for --suite-jobs: those runs only (re)execute the named x32 subprocess jobs and merge into the existing BENCH_SUITE.json)
        # --- CMux (the reference's headline ~40us/core op) ---
        B = args.batch or 256
        reps = (B + 7) // 8
        sel_bits = np.tile(np.asarray(vec["ggsw_bits"]), reps)[:B]
        ggsw_fft = be.fwd_torus(jnp.asarray(np.tile(np.asarray(vec["ggsws"]), (reps, 1, 1, 1, 1))[:B]))
        d0 = jnp.tile(
            jnp.asarray(enc.trivial_glwe(jnp.zeros((glwe.degree,), jnp.uint64), glwe)),
            (B, 1, 1),
        )
        one_poly = jnp.zeros((glwe.degree,), jnp.uint64).at[0].set(jnp.uint64(1) << jnp.uint64(63))
        d1 = jnp.tile(jnp.asarray(enc.trivial_glwe(one_poly, glwe)), (B, 1, 1))

        best, first, out = time_steps(
            lambda a, b_, s: fft_ops.cmux(a, b_, s, glwe, p.cbs_radix, be), d0, d1, ggsw_fft
        )
        n_ok = np_decrypt_glwe0(jax.device_get(out)[: min(B, 32)], sel_bits[: min(B, 32)])
        results["cmux_per_sec"] = {
            "value": round(B / best, 1), "batch": B, "best_step_s": round(best, 5),
            "first_call_s": round(first, 1), "correct": f"{n_ok}/{min(B, 32)}",
            "ref_single_core_per_sec": 25000,
        }
        print(f"# cmux: {results['cmux_per_sec']}", file=sys.stderr)

        # --- GLEV CMux ---
        Bg = max(16, B // 4)
        repsg = (Bg + 7) // 8
        glev_zero = jnp.tile(
            jnp.asarray(enc.trivial_glev(jnp.zeros((glwe.degree,), jnp.uint64), glwe, p.cbs_radix)),
            (Bg, 1, 1, 1),
        )
        glev_one = jnp.tile(
            jnp.asarray(
                enc.trivial_glev(
                    jnp.zeros((glwe.degree,), jnp.uint64).at[0].set(1), glwe, p.cbs_radix
                )
            ),
            (Bg, 1, 1, 1),
        )
        sel_g = be.fwd_torus(jnp.asarray(np.tile(np.asarray(vec["ggsws"]), (repsg, 1, 1, 1, 1))[:Bg]))
        sel_g_bits = np.tile(np.asarray(vec["ggsw_bits"]), repsg)[:Bg]
        best, first, out = time_steps(
            lambda a, b_, s: fft_ops.glev_cmux(a, b_, s, glwe, p.cbs_radix, be),
            glev_zero, glev_one, sel_g,
        )
        # decrypt-verify (VERDICT r4 #7): every level j of the selected
        # GLEV must decode the select bit at scale q/B^(j+1)
        # (≙ glev encryption round-trip tests, `glev_encryption.rs`)
        out_np = np.asarray(jax.device_get(out))
        nchk = min(Bg, 16)
        n_ok = 0
        for b in range(nchk):
            ok = True
            for j in range(p.cbs_radix.count):
                ph = _np_glwe_phase0(out_np[b, j], glwe_sk_np, glwe)
                sh = np.uint64(64 - p.cbs_radix.radix_log * (j + 1))
                dec = (
                    (ph >> sh) + ((ph >> (sh - np.uint64(1))) & np.uint64(1))
                ) & np.uint64((1 << p.cbs_radix.radix_log) - 1)
                ok &= int(dec) == int(sel_g_bits[b])
            n_ok += int(ok)
        results["glev_cmux_per_sec"] = {
            "value": round(Bg / best, 1), "batch": Bg, "best_step_s": round(best, 5),
            "first_call_s": round(first, 1), "correct": f"{n_ok}/{nchk}",
        }
        print(f"# glev_cmux: {results['glev_cmux_per_sec']}", file=sys.stderr)

        # --- LWE keyswitch L1 -> L0 (byte-plane MXU path: the u64 einsum
        # `ks_mod.keyswitch_lwe_to_lwe` cannot lower on TPU) ---
        from spf_tpu.ops import limb32 as lbb
        from spf_tpu.ops.keyswitch_u32 import keyswitch_lwe_u32, ksk_to_byte_planes

        ksk_planes = ksk_to_byte_planes(np.load(os.path.join(KEY_CACHE, "default128_ksk.npy")))
        ks_in = lbb.from_u64_np(np.asarray(vec["ks_in"]).T)  # t-layout [n+1, B]
        ks_bits = np.asarray(vec["ks_bits"])
        best, first, out = time_steps(
            lambda c: keyswitch_lwe_u32(c, ksk_planes, glwe.as_lwe_def(), lwe, p.ks_radix),
            ks_in,
        )
        out_np = lbb.to_u64_np(jax.device_get(out)).T  # [B, n0+1]
        ph = out_np[:, -1] - (out_np[:, :-1] * lwe_sk_np[None, :]).sum(axis=1, dtype=np.uint64)
        dec = ((ph >> np.uint64(63)) + ((ph >> np.uint64(62)) & np.uint64(1))) & np.uint64(1)
        n_ok = int((dec == ks_bits).sum())
        ks_batch = int(ks_bits.shape[0])
        results["keyswitch_per_sec"] = {
            "value": round(ks_batch / best, 1), "batch": ks_batch,
            "best_step_s": round(best, 5), "first_call_s": round(first, 1),
            "correct": f"{n_ok}/{ks_batch}",
        }
        print(f"# keyswitch: {results['keyswitch_per_sec']}", file=sys.stderr)

        # --- scheme switch (GLEV -> GGSW fft) ---
        ssk_fft = be.fwd_torus(
            jnp.asarray(np.load(os.path.join(KEY_CACHE, "default128_ssk_coeff.npy")))
        )
        Bs = 32
        repss = (Bs + 7) // 8
        glev_in = jnp.asarray(np.tile(np.asarray(vec["glevs"]), (repss, 1, 1, 1))[:Bs])
        glev_bits = np.tile(np.asarray(vec["glev_bits"]), repss)[:Bs]
        best, first, out = time_steps(
            lambda g: fft_ops.scheme_switch_fft(g, ssk_fft, glwe, p.cbs_radix, p.ss_radix, be),
            glev_in,
        )
        # decrypt-verify (VERDICT r4 #7): the emitted GGSW must SELECT
        # correctly — run each through cmux(trivial 0, trivial 1) and
        # decode, which exercises every row including the -s_i*m ones
        # (≙ `fft_ops.rs:650-703` scheme_switch_fft_matches_non_fft)
        nchk = min(Bs, 16)
        chk = jax.jit(
            lambda s: fft_ops.cmux(
                d0[:nchk], d1[:nchk], s, glwe, p.cbs_radix, be
            )
        )(tuple(c[:nchk] for c in out) if isinstance(out, tuple) else out[:nchk])
        n_ok = np_decrypt_glwe0(jax.device_get(chk), glev_bits[:nchk])
        results["scheme_switch_per_sec"] = {
            "value": round(Bs / best, 1), "batch": Bs, "best_step_s": round(best, 5),
            "first_call_s": round(first, 1), "correct": f"{n_ok}/{nchk}",
        }
        print(f"# scheme_switch: {results['scheme_switch_per_sec']}", file=sys.stderr)

        # --- bivariate PBS (t-layout ds32 pipeline, packed left*2^b + right;
        # ≙ `programmable_bootstrapping.rs:575-621`) ---
        from spf_tpu.ops import bootstrap as bs_mod, bootstrap_tpu as bt

        ensure("default128_bsk_coeff.npy", "--keygen-only")
        bsk_coeff = jnp.asarray(
            np.load(os.path.join(KEY_CACHE, "default128_bsk_coeff.npy"))
        )
        bsk_t = jax.jit(bt.bsk_to_t)(bsk_coeff)
        jax.block_until_ready(bsk_t)
        bits2 = 2
        lut2 = bs_mod.generate_bivariate_lut(
            lambda l, r: (l + r) % 4, glwe, bits2
        )
        Bb = args.batch or 128
        lhs_m = jnp.asarray(np.arange(Bb) % 4, jnp.uint64)
        rhs_m = jnp.asarray((np.arange(Bb) // 4) % 4, jnp.uint64)
        kbv = jax.random.fold_in(jax.random.key(2024), 555)
        enc_batch = jax.vmap(
            lambda k_, m: enc.encrypt_lwe(
                k_, torus.encode(m, 2 * bits2 + 1), jnp.asarray(lwe_sk_np), lwe
            )
        )
        ct_l = enc_batch(jax.random.split(jax.random.fold_in(kbv, 0), Bb), lhs_m)
        ct_r = enc_batch(jax.random.split(jax.random.fold_in(kbv, 1), Bb), rhs_m)

        def biv(cl, cr):
            packed = cl * jnp.uint64(1 << bits2) + cr
            return bt.from_t_layout(
                bt.programmable_bootstrap_t(
                    bt.to_t_layout(packed), lut2, bsk_t, lwe, glwe, p.pbs_radix
                )
            )

        best, first, out = time_steps(biv, ct_l, ct_r)
        dec = torus.decode(
            enc.decrypt_lwe(
                np.asarray(out), enc.glwe_sk_to_lwe_sk(jnp.asarray(glwe_sk_np)),
                glwe.as_lwe_def(),
            ),
            2 * bits2,
        )
        expect = (np.asarray(lhs_m) + np.asarray(rhs_m)) % 4
        n_ok = int((np.asarray(dec) == expect).sum())
        results["bivariate_pbs_per_sec"] = {
            "value": round(Bb / best, 1), "batch": Bb,
            "best_step_s": round(best, 5), "first_call_s": round(first, 1),
            "correct": f"{n_ok}/{Bb}",
        }
        print(f"# bivariate_pbs: {results['bivariate_pbs_per_sec']}", file=sys.stderr)

        if getattr(args, "suite_ops_only", False):
            # merge the freshly measured in-process ops into the existing
            # suite results (the x32 subprocess metrics are kept as-is)
            path = os.path.join(repo, "BENCH_SUITE.json")
            merged = {}
            if os.path.exists(path):
                with open(path) as f:
                    merged = json.load(f)
            merged.update(results)
            prior = merged.get("platform")
            if prior is not None and prior != platform:
                # retained x32 subprocess metrics were measured on `prior`;
                # labeling them with this process's platform would be a lie
                print(
                    f"# WARNING: ops rerun on platform={platform} but kept"
                    f" metrics were measured on {prior}; keeping per-metric"
                    " platform labels",
                    file=sys.stderr,
                )
                for v in results.values():
                    if isinstance(v, dict):
                        v["platform"] = platform
            else:
                merged["platform"] = platform
            with open(path, "w") as f:
                json.dump(merged, f, indent=1)
            print(json.dumps({
                "metric": "bench_suite_ops",
                "value": results.get("cmux_per_sec", {}).get("value", 0),
                "unit": "cmux/s (merged into BENCH_SUITE.json)",
                "vs_baseline": 0,
            }))
            return

    # --- PBS, conversion cycle, integer ops, programs (x32 subprocesses) ---
    jobs = [("pbs", []), ("cbs_cycle", ["--cbs"])]
    for w in (8, 16, 32):
        jobs.append((f"add{w}", ["--intop", "add", "--width", str(w)]))
    for w in (8, 16):
        jobs.append((f"mul{w}", ["--intop", "mul", "--width", str(w)]))
    jobs.append(("mul32", ["--program", "mul32"]))
    jobs.append(("program_hamming", ["--program", "hamming_distance"]))
    jobs.append(("program_cardio", ["--program", "cardio"]))
    x32_backend = os.environ.get("SPF_SUITE_X32_BACKEND", DEFAULT_TPU_BACKEND)
    if only_jobs is not None:
        jobs = [(n, e) for n, e in jobs if n in only_jobs]
    for name, extra in jobs:
        cmd = [sys.executable, __file__, "--backend", x32_backend] + extra
        if args.batch:
            cmd += ["--batch", str(args.batch)]
        try:
            r = subprocess.run(
                cmd, cwd=repo, capture_output=True, text=True, timeout=2400
            )
            line = [l for l in r.stdout.splitlines() if l.startswith("{")]
            results[name] = json.loads(line[-1]) if line else {
                "error": (r.stderr or "")[-2500:]
            }
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": str(e)[:500]}
        print(f"# {name}: {results[name]}", file=sys.stderr)

    path = os.path.join(repo, "BENCH_SUITE.json")
    if only_jobs is not None and os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
        merged.update(results)
        results = merged
    results["platform"] = platform
    with open(path, "w") as f:
        json.dump(results, f, indent=1)

    pbs_val = results.get("pbs", {}).get("value", 0) or 0
    print(json.dumps({
        "metric": "bench_suite",
        "value": round(pbs_val, 2),
        "unit": "PBS/s (suite in BENCH_SUITE.json)",
        "vs_baseline": round(pbs_val / NORTH_STAR_PBS_PER_SEC, 4),
        "suite": {
            k: (v.get("value") if isinstance(v, dict) else v)
            for k, v in results.items()
        },
    }))


if __name__ == "__main__":
    main()
