"""Focused CMux-chain depth sweep at DEFAULT_128 on the u32 pipeline.

Separates the candidate noise mechanisms behind the mul16-at-depth
failure (VERDICT r4 #1):

  --sel cbs    selects from the production circuit_bootstrap_u32
               (multi-bit g=2 by default) — the shipped configuration;
  --sel cbs1   selects from CBS with the single-bit bootstrap key;
  --sel fresh  fresh-encrypted GGSW selects (host numpy encryption,
               encryption noise only) — isolates the cmux op itself
               (gadget rounding + ds32 FFT) from CBS output noise.

Chain: acc <- cmux(trivial0, acc, sel_one) alternated with
       acc <- cmux(acc, trivial1, sel_zero') per parity, so the
       expected bit never changes while every level adds one cmux's
       noise; S distinct selects are REUSED round-robin (the reuse
       pattern of real circuits, unlike the op_noise cmux_tree's fresh
       selects). L independent lanes give the error distribution.

Prints log2 |err| stats at coefficient 0 every K levels.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ap = argparse.ArgumentParser()
ap.add_argument("--sel", default="cbs", choices=["cbs", "cbs1", "fresh"])
ap.add_argument("--depth", type=int, default=512)
ap.add_argument("--lanes", type=int, default=64)
ap.add_argument("--nsel", type=int, default=8)
ap.add_argument("--probe-every", type=int, default=32)
ap.add_argument("--group", type=int, default=2)
args = ap.parse_args()

os.environ.setdefault("SPF_TPU_X32", "1")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from spf_tpu.params import DEFAULT_128  # noqa: E402
from spf_tpu.ops import bootstrap_u32 as bu, limb32 as lb  # noqa: E402
from spf_tpu.ops.mux_eval_u32 import trivial_bit_glwe_limb  # noqa: E402

# all spectra in this script are built with bsk_to_freq_u32's default
# XLA (use_pallas=False) frequency order; the compute calls MUST use the
# same backend explicitly — use_pallas=None auto-resolves to the Pallas
# order on TPU and silently mismatches (advisor r4 finding)
UP = False

KC = os.environ.get("SPF_TPU_KEY_CACHE",
                    os.path.join(os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))), ".keys_cache"))
p = DEFAULT_128
lwe, glwe = p.l0_params, p.l1_params
n1 = glwe.degree
L, S = args.lanes, args.nsel

data = np.load(os.path.join(KC, "default128_sk.npz"))
lwe_sk_np, glwe_sk_np = data["lwe_sk"], data["glwe_sk"]
rng = np.random.default_rng(97)


def load_freq(name):
    d = np.load(os.path.join(KC, f"default128_{name}_freq_xscr8.npz"))
    return tuple(jnp.asarray(d[f"c{i}"]) for i in range(4))


sel_bits = np.array([i % 2 for i in range(S)], dtype=np.uint64)

if args.sel in ("cbs", "cbs1"):
    from spf_tpu.ops import cbs_u32 as cu

    bsk_freq = load_freq(
        f"bskmb{args.group}" if args.sel == "cbs" else "bsk")
    ak_freq, ssk_freq = load_freq("ak"), load_freq("ssk")
    a = rng.integers(0, 1 << 64, size=(S, lwe.dim), dtype=np.uint64)
    e = np.round(rng.normal(0.0, lwe.std * 2.0**64, size=S)).astype(
        np.int64).astype(np.uint64)
    bcol = (a * lwe_sk_np[None, :]).sum(axis=1, dtype=np.uint64) + (
        sel_bits << np.uint64(63)) + e
    cts = lb.from_u64_np(np.concatenate([a, bcol[:, None]], axis=1).T)
    t0 = time.time()
    sel_freq = jax.jit(lambda c: cu.circuit_bootstrap_u32(
        c, bsk_freq, ak_freq, ssk_freq, p, use_pallas=UP))(cts)
    jax.block_until_ready(sel_freq)
    print(f"# CBS({args.sel}) of {S} selects in {time.time()-t0:.1f}s",
          file=sys.stderr)
else:
    # fresh GGSW encryption in numpy (exact u64), then fwd transform
    from spf_tpu.utils import host_crypto as hc

    radix = p.cbs_radix
    rows = []
    for i in range(S):
        m = int(sel_bits[i])
        ggsw = np.zeros((glwe.size + 1, radix.count, glwe.size + 1, n1),
                        dtype=np.uint64)
        for r in range(glwe.size + 1):
            for j in range(radix.count):
                scale = np.uint64((1 << (64 - radix.radix_log * (j + 1)))
                                  % (1 << 64))
                if r < glwe.size:
                    msg = (np.uint64(0) - hc.negacyclic_mul_binary_np(
                        np.full(n1, np.uint64(m)) * 0 + np.where(
                            np.arange(n1) == 0, np.uint64(m), np.uint64(0)),
                        glwe_sk_np[r])) * scale
                else:
                    msg = np.where(np.arange(n1) == 0,
                                   np.uint64(m) * scale, np.uint64(0))
                ggsw[r, j] = hc.encrypt_glwe_np(rng, msg, glwe_sk_np, glwe)
        rows.append(ggsw)
    sel_freq = tuple(
        jnp.moveaxis(c, 0, -1)
        for c in bu.bsk_to_freq_u32(np.stack(rows, axis=0))
    )  # [k+1, l, k+1, K, S]

# tile selects to L lanes: lane j uses select j % S
idx = jnp.asarray(np.arange(L) % S)
sel_l = tuple(jnp.take(c, idx, axis=-1) for c in sel_freq)
lane_bits = sel_bits[np.arange(L) % S]

zero = trivial_bit_glwe_limb(0, glwe, L)
one = trivial_bit_glwe_limb(1, glwe, L)

# two jitted step kinds:
#   bit=1 lanes: acc <- cmux(zero, acc, sel)   (select high = acc)
#   bit=0 lanes: acc <- cmux(acc, one, sel)    (select low  = acc)
onej = jnp.asarray(lane_bits == 1)
step = jax.jit(lambda acc: tuple(
    jnp.where(onej[None, None, :], x, y) for x, y in zip(
        bu.cmux_u32(zero, acc, sel_l, glwe, p.cbs_radix, UP),
        bu.cmux_u32(acc, one, sel_l, glwe, p.cbs_radix, UP),
    )))

# initial: encrypted 1-bit per lane equal to the carried bit (use
# trivial to start; the carried value is lane_bits for bit-1 lanes
# selecting acc... keep it simple: acc starts as trivial(1) for bit-1
# lanes (cmux keeps acc), trivial(0) for bit-0 lanes (cmux keeps acc).
acc = tuple(jnp.where(onej[None, None, :], a, b) for a, b in zip(one, zero))
expected_bits = lane_bits  # invariant of both step kinds

s_pol = glwe_sk_np[0]
nz = np.nonzero(s_pol[1:])[0]


def margins(acc):
    w = lb.to_u64_np(jax.device_get(acc))
    errs = []
    for j in range(L):
        a_p, b_p = w[0, :, j], w[1, :, j]
        conv0 = a_p[0] * s_pol[0] - np.sum(a_p[n1 - nz - 1]).astype(np.uint64)
        ph = b_p[0] - conv0
        err = (ph - (np.uint64(expected_bits[j]) << np.uint64(63))).astype(
            np.int64)
        errs.append(abs(int(err)))
    e = np.array(errs, dtype=np.float64)
    lg = np.log2(np.maximum(e, 1.0))
    return lg


t0 = time.time()
for d in range(1, args.depth + 1):
    acc = step(acc)
    if d % args.probe_every == 0 or d == 1:
        lg = margins(acc)
        print(f"depth {d:4d} log2err med {np.median(lg):5.1f} "
              f"p90 {np.percentile(lg, 90):5.1f} max {lg.max():5.1f} "
              f"margin_worst {62 - lg.max():5.1f} bad "
              f"{int((lg >= 62).sum())}/{L} ({time.time()-t0:.0f}s)",
              flush=True)
print("# done", file=sys.stderr)
