#!/usr/bin/env python
"""Single-cmux noise probe at DEFAULT_128 on the u32 pipeline (TPU).

Measures the phase-error distribution of ONE cmux(zero, one, sel) per
lane for three select sources:
  fresh  — host-encrypted GGSW(bit) (encryption noise only):
           isolates the cmux op itself (gadget rounding + ds32 FFT);
  cbs    — selects from circuit_bootstrap_u32 with the multi-bit key
           (the shipped path; --group picks g);
  cbs1   — same with the single-bit key (g=1 style via group=1).

This is the calibration the mul8/mul16 margins trace back to: the
per-output-bit margin decays from a per-cmux noise base; if `fresh`
is ~2^53 (theory) but `cbs` is ~2^57, the CBS-output GGSW term
dominates and the fix is CBS quality, not refresh cadence.

Run: timeout 1800 python scripts/probe_cmux_noise.py [--group 2]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("SPF_TPU_X32", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ap = argparse.ArgumentParser()
ap.add_argument("--group", type=int, default=2)
ap.add_argument("--lanes", type=int, default=128)
ap.add_argument("--sels", default="fresh,cbs")
ap.add_argument(
    "--pbs-radix", default=None, metavar="L,LOGB",
    help="override the CBS-internal blind-rotation radix (e.g. 4,8):"
    " generates a fresh multi-bit BSK at that radix ON DEVICE and runs"
    " CBS with it — tests the hypothesis that ds32 FFT-MAD error"
    " scales with digit magnitude (2^15 at the default 2x16)",
)
args = ap.parse_args()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from spf_tpu.ops import bootstrap_u32 as bu, cbs_u32 as cu  # noqa: E402
from spf_tpu.ops import limb32 as lb  # noqa: E402
from spf_tpu.params import DEFAULT_128  # noqa: E402
from spf_tpu.utils import host_crypto as hc  # noqa: E402

KC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                  ".keys_cache")
p = DEFAULT_128
lwe, glwe = p.l0_params, p.l1_params
n1 = glwe.degree
L = args.lanes

data = np.load(os.path.join(KC, "default128_sk.npz"))
lwe_sk_np, glwe_sk_np = data["lwe_sk"], data["glwe_sk"]
rng = np.random.default_rng(1234)

bits = (np.arange(L) % 2).astype(np.uint64)


def trivial_limb(bit, lanes):
    kp1 = glwe.size + 1
    hi = jnp.zeros((kp1, n1, lanes), jnp.uint32)
    lo = jnp.zeros((kp1, n1, lanes), jnp.uint32)
    if bit:
        hi = hi.at[-1, 0, :].set(jnp.uint32(0x80000000))
    return (hi, lo)


def report(tag, sel_freq):
    m0 = trivial_limb(0, L)
    m1 = trivial_limb(1, L)
    out = jax.jit(
        lambda s: bu.cmux_u32(m0, m1, s, glwe, p.cbs_radix, False)
    )(sel_freq)
    w = lb.to_u64_np(jax.device_get(out))  # [k+1, N, L]
    s_poly = glwe_sk_np[0]
    nz = np.nonzero(s_poly[1:])[0]
    errs = []
    nbad = 0
    for j in range(L):
        a_p, b_p = w[0, :, j], w[1, :, j]
        conv0 = a_p[0] * s_poly[0] - np.sum(a_p[n1 - nz - 1]).astype(np.uint64)
        ph = int(b_p[0] - conv0) % (1 << 64)
        err = (ph - (int(bits[j]) << 63)) % (1 << 64)
        if err >= 1 << 63:
            err = (1 << 64) - err
        errs.append(np.log2(max(err, 1)))
        if err > 1 << 62:
            nbad += 1
    e = np.array(errs)
    print(
        f"{tag:8s} log2|err| med {np.median(e):5.1f} p90 "
        f"{np.percentile(e, 90):5.1f} max {e.max():5.1f} bad {nbad}/{L}",
        flush=True,
    )


for sel in args.sels.split(","):
    if sel == "fresh":
        # host-encrypted GGSW(bit) at cbs radix, stacked on lanes
        t0 = time.time()
        rows = np.stack([
            hc.encrypt_ggsw_scalar_np(
                rng, int(b), glwe_sk_np, glwe, p.cbs_radix
            )
            for b in bits
        ])  # [L, k+1, l, k+1, N]
        f = bu.bsk_to_freq_u32(rows, use_pallas=False)
        sel_freq = tuple(jnp.moveaxis(c, 0, -1) for c in f)
        print(f"# fresh GGSWs in {time.time()-t0:.1f}s", flush=True)
        report("fresh", sel_freq)
    else:
        g = 1 if sel == "cbs1" else args.group
        pp = p
        if args.pbs_radix:
            import dataclasses

            from spf_tpu.ops import encryption_u32 as eu
            from spf_tpu.params import RadixDecomposition

            lq, logb = (int(x) for x in args.pbs_radix.split(","))
            pp = dataclasses.replace(
                p, pbs_radix=RadixDecomposition(count=lq, radix_log=logb)
            )
            t0 = time.time()
            rows = jax.jit(
                lambda k_, ls, gs: eu.generate_multibit_bsk_u32(
                    k_, ls, gs, glwe, pp.pbs_radix, g
                )
            )(
                jax.random.key(808),
                jnp.asarray(lwe_sk_np.astype(np.uint32)),
                jnp.asarray(glwe_sk_np.astype(np.uint32)),
            )
            print(
                f"# on-device mb bsk (g={g}, radix {lq}x{logb}) in "
                f"{time.time()-t0:.1f}s", flush=True,
            )
            bsk_freq = bu.bsk_to_freq_u32(
                lb.to_u64_np(jax.device_get(rows)), use_pallas=False
            )
        else:
            mb_path = os.path.join(KC, f"default128_bskmb{g}_coeff.npy")
            if not os.path.exists(mb_path):
                print(
                    f"# missing {mb_path}; run bench.py --keygen-mb"
                    f" --group {g}", flush=True,
                )
                continue
            t0 = time.time()
            bsk_freq = bu.bsk_to_freq_u32(np.load(mb_path), use_pallas=False)
        ak_freq = bu.bsk_to_freq_u32(
            np.load(os.path.join(KC, "default128_ak_coeff.npy")),
            use_pallas=False,
        )
        ssk_freq = bu.bsk_to_freq_u32(
            np.load(os.path.join(KC, "default128_ssk_coeff.npy")),
            use_pallas=False,
        )
        print(f"# key fft in {time.time()-t0:.1f}s", flush=True)
        a = rng.integers(0, 1 << 64, size=(L, lwe.dim), dtype=np.uint64)
        e = np.round(
            rng.normal(0.0, lwe.std * 2.0**64, size=L)
        ).astype(np.int64).astype(np.uint64)
        bcol = (a * lwe_sk_np[None, :]).sum(axis=1, dtype=np.uint64) + (
            bits << np.uint64(63)
        ) + e
        cts = lb.from_u64_np(np.concatenate([a, bcol[:, None]], axis=1).T)
        t0 = time.time()
        sel_freq = jax.jit(
            lambda c: cu.circuit_bootstrap_u32(
                c, bsk_freq, ak_freq, ssk_freq, pp, use_pallas=False
            )
        )(cts)
        jax.block_until_ready(sel_freq)
        print(f"# CBS(g={g}) of {L} in {time.time()-t0:.1f}s", flush=True)
        report(sel, sel_freq)
print("# done", flush=True)
