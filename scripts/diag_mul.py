"""Diagnose the BENCH_SUITE mul16 0/4 failure (VERDICT r4 #1).

Runs the SAME mul circuit instances through the two production paths:

  A. the bench --intop path: one batched CBS over all input bits ->
     `evaluate_mux_circuit_u32` levelized cmux tree, instrumented with
     per-level host decryption so the noise margin at coefficient 0 is
     recorded as a function of tree depth;
  B. the program/executor path: the same MuxCircuit grafted into an
     `FheCircuit` (input GLWE bits -> extract -> keyswitch -> CBS ->
     cmux tree) run by `U32CircuitExecutor` per-wave — the path that
     produced a CORRECT mul32 in BENCH_SUITE r4.

If A fails while B passes on identical plaintext instances and key
material, the defect is in the intop harness; if both decay with depth
at the same rate, the noise budget is exhausted (reference model:
depth 1024 at 2^-125, `parasol_runtime/src/params.rs:103-106`).

Usage: JAX_PLATFORMS=cpu python scripts/diag_mul.py --width 8 --path mux
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ap = argparse.ArgumentParser()
ap.add_argument("--width", type=int, default=8)
ap.add_argument("--inst", type=int, default=1)
ap.add_argument("--path", default="mux", choices=["mux", "exec", "selects"])
ap.add_argument("--probe-every", type=int, default=16)
ap.add_argument("--group", type=int, default=2)
ap.add_argument("--sigma0", action="store_true",
                help="encrypt inputs with zero noise (isolates numeric error)")
ap.add_argument("--op", default="mul", choices=["mul", "add"])
ap.add_argument("--refresh", type=int, default=0,
                help="mid-tree recryption bound (0 = off)")
args = ap.parse_args()

os.environ.setdefault("SPF_TPU_X32", "1")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from spf_tpu.params import DEFAULT_128  # noqa: E402
from spf_tpu.circuits import integer as ic  # noqa: E402
from spf_tpu.ops import bootstrap_u32 as bu, limb32 as lb  # noqa: E402
from spf_tpu.ops import cbs_u32 as cu  # noqa: E402
from spf_tpu.ops.mux_eval_u32 import levelize, trivial_bit_glwe_limb  # noqa: E402

KC = os.environ.get("SPF_TPU_KEY_CACHE",
                    os.path.join(os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))), ".keys_cache"))

p = DEFAULT_128
lwe, glwe = p.l0_params, p.l1_params
n1 = glwe.degree
width, ninst = args.width, args.inst

print(f"# devices={jax.devices()}", file=sys.stderr)

data = np.load(os.path.join(KC, "default128_sk.npz"))
lwe_sk_np, glwe_sk_np = data["lwe_sk"], data["glwe_sk"]


def load_freq(name):
    d = np.load(os.path.join(KC, f"default128_{name}_freq_xscr8.npz"))
    return tuple(jnp.asarray(d[f"c{i}"]) for i in range(4))


bsk_freq = load_freq(f"bskmb{args.group}")
ak_freq = load_freq("ak")
ssk_freq = load_freq("ssk")
ksk_np = np.load(os.path.join(KC, "default128_ksk.npy"))

rng = np.random.default_rng(20240817)
rng2 = np.random.default_rng(11)
a_vals = rng2.integers(0, 1 << width, ninst, dtype=np.uint64)
b_vals = rng2.integers(0, 1 << width, ninst, dtype=np.uint64)
if args.op == "mul":
    circuit = ic.unsigned_multiplier(width, width)
    expected = [int(a_vals[i]) * int(b_vals[i]) for i in range(ninst)]
else:
    circuit = ic.ripple_carry_adder(width, emit_carry=True)
    expected = [int(a_vals[i]) + int(b_vals[i]) for i in range(ninst)]

# input bit list, input-major (same as bench --intop)
bit_list = []
for idx in range(2 * width):
    for j in range(ninst):
        v = int(a_vals[j] if idx < width else b_vals[j])
        bit_list.append((v >> (idx % width)) & 1)
bits_in = np.array(bit_list, dtype=np.uint64)
bb = bits_in.size

# plaintext node values (ground truth for every wire)
node_val = {}
for i, node in enumerate(circuit.nodes):
    if node[0] == "zero":
        node_val[i] = np.zeros(ninst, dtype=np.int64)
    elif node[0] == "one":
        node_val[i] = np.ones(ninst, dtype=np.int64)
    else:
        _, s, lo, hi = node
        sbit = np.array([bit_list[s * ninst + j] for j in range(ninst)])
        node_val[i] = np.where(sbit == 1, node_val[hi], node_val[lo])
out_bits = np.stack([node_val[o] for o in circuit.outputs])  # [W, I]
got_plain = [int(sum(int(out_bits[j, i]) << j for j in range(len(circuit.outputs))))
             for i in range(ninst)]
assert got_plain == expected, (got_plain, expected)
print(f"# plaintext eval OK; circuit {args.op}{width}: "
      f"{sum(1 for n in circuit.nodes if n[0]=='mux')} gates, "
      f"{len(levelize(circuit))} levels", file=sys.stderr)


def decrypt_wire_c0(wire_np_u64, inst):
    """Phase at coefficient 0 of a GLWE limb wire [k+1, N, I] (u64)."""
    a_p = wire_np_u64[0, :, inst]
    b_p = wire_np_u64[1, :, inst]
    s = glwe_sk_np[0]
    nz = np.nonzero(s[1:])[0]
    conv0 = a_p[0] * s[0] - np.sum(a_p[n1 - nz - 1]).astype(np.uint64)
    return b_p[0] - conv0


def margin_of(phase, bit):
    err = np.int64(phase - (np.uint64(bit) << np.uint64(63)))
    ae = abs(int(err))
    return 62 - (np.log2(ae) if ae else 0.0)


# ------------------------- encrypt input bits as L0 LWE -----------------
a_mask = rng.integers(0, 1 << 64, size=(bb, lwe.dim), dtype=np.uint64)
if args.sigma0:
    e = np.zeros(bb, dtype=np.uint64)
else:
    e = np.round(rng.normal(0.0, lwe.std * 2.0**64, size=bb)).astype(
        np.int64).astype(np.uint64)
bcol = (a_mask * lwe_sk_np[None, :]).sum(axis=1, dtype=np.uint64) + (
    bits_in << np.uint64(63)) + e
cts_limb = lb.from_u64_np(np.concatenate([a_mask, bcol[:, None]], axis=1).T)

if args.path in ("mux", "selects"):
    t0 = time.time()
    cbs_fn = jax.jit(lambda c: cu.circuit_bootstrap_u32(
        c, bsk_freq, ak_freq, ssk_freq, p))
    sel = cbs_fn(cts_limb)
    jax.block_until_ready(sel)
    print(f"# CBS of {bb} bits in {time.time()-t0:.1f}s", file=sys.stderr)

    # --- verify each select with a single cmux(0,1,sel) ---
    zero = trivial_bit_glwe_limb(0, glwe, bb)
    one = trivial_bit_glwe_limb(1, glwe, bb)
    chk = jax.jit(lambda s: bu.cmux_u32(zero, one, s, glwe, p.cbs_radix, None))(sel)
    chk_np = lb.to_u64_np(jax.device_get(chk))
    margins = []
    ok = 0
    for i in range(bb):
        ph = decrypt_wire_c0(chk_np, i)
        m = margin_of(ph, int(bits_in[i]))
        margins.append(m)
        dec = ((ph >> np.uint64(63)) + ((ph >> np.uint64(62)) & np.uint64(1))) & np.uint64(1)
        ok += int(dec == bits_in[i])
    print(f"# selects: {ok}/{bb} correct; margin min/med "
          f"{min(margins):.1f}/{sorted(margins)[len(margins)//2]:.1f} bits",
          file=sys.stderr)
    if args.path == "selects":
        sys.exit(0)

    if args.refresh:
        # PRODUCTION path with mid-tree recryption (the r5 fix)
        from spf_tpu.ops.keyswitch_u32 import ksk_to_byte_planes
        from spf_tpu.ops.mux_eval_u32 import RefreshKeys

        rk = RefreshKeys(
            bsk_freq=bsk_freq, ak_freq=ak_freq, ssk_freq=ssk_freq,
            ksk_planes=ksk_to_byte_planes(ksk_np), params=p,
            refresh_every=args.refresh,
        )
        from spf_tpu.ops.mux_eval_u32 import evaluate_mux_circuit_u32

        t0 = time.time()
        outs = evaluate_mux_circuit_u32(
            circuit, sel, glwe, p.cbs_radix, ninst, use_pallas=None,
            per_level_jit=True, refresh=rk,
        )
        n_ok = 0
        worst = 99.0
        for inst in range(ninst):
            v = 0
            for j, w in enumerate(outs):
                wnp = lb.to_u64_np(jax.device_get(w))
                ph = decrypt_wire_c0(wnp, inst)
                m = margin_of(ph, int(out_bits[j, inst]))
                worst = min(worst, m)
                bit = int(((ph >> np.uint64(63)) +
                           ((ph >> np.uint64(62)) & np.uint64(1))) & np.uint64(1))
                v |= bit << j
            n_ok += int(v == expected[inst])
            print(f"inst {inst}: got {v} expected {expected[inst]}")
        print(f"RESULT mux path + refresh({args.refresh}): {n_ok}/{ninst} "
              f"correct, worst output margin {worst:.1f} bits, "
              f"{time.time()-t0:.0f}s")
        sys.exit(0)

    # --- instrumented levelized evaluation (mirrors mux_eval_u32) ---
    from spf_tpu.ops.bootstrap_u32 import cmux_u32
    cmj_cache = {}

    def cmj(w):
        f = cmj_cache.get(w)
        if f is None:
            f = cmj_cache[w] = jax.jit(
                lambda a, b, s: cmux_u32(a, b, s, glwe, p.cbs_radix, None))
        return f

    ii = ninst
    vals = {}
    zero1 = trivial_bit_glwe_limb(0, glwe, ii)
    one1 = trivial_bit_glwe_limb(1, glwe, ii)
    for i, node in enumerate(circuit.nodes):
        if node[0] == "zero":
            vals[i] = zero1
        elif node[0] == "one":
            vals[i] = one1
    levels = levelize(circuit)
    t0 = time.time()
    for d, level in enumerate(levels):
        lo = (jnp.concatenate([vals[circuit.nodes[n][2]][0] for n in level], axis=-1),
              jnp.concatenate([vals[circuit.nodes[n][2]][1] for n in level], axis=-1))
        hi = (jnp.concatenate([vals[circuit.nodes[n][3]][0] for n in level], axis=-1),
              jnp.concatenate([vals[circuit.nodes[n][3]][1] for n in level], axis=-1))
        sel_idx = np.concatenate(
            [circuit.nodes[n][1] * ii + np.arange(ii) for n in level])
        s = tuple(jnp.take(c, jnp.asarray(sel_idx), axis=-1) for c in sel)
        w = lo[0].shape[-1]
        wp = 1 << (w - 1).bit_length()
        if wp != w:
            pad = lambda t: tuple(
                jnp.pad(c, [(0, 0)] * (c.ndim - 1) + [(0, wp - w)]) for c in t)
            lo, hi, s = pad(lo), pad(hi), pad(s)
        out = cmj(wp)(lo, hi, s)
        out = tuple(c[..., :w] for c in out)
        for j, n in enumerate(level):
            vals[n] = tuple(c[..., j * ii: (j + 1) * ii] for c in out)
        if d % args.probe_every == 0 or d == len(levels) - 1:
            wire_np = lb.to_u64_np(jax.device_get(out))
            worst, nbad = 99.0, 0
            for j, n in enumerate(level):
                for inst in range(ii):
                    ph = decrypt_wire_c0(wire_np[:, :, j * ii:(j + 1) * ii], inst)
                    m = margin_of(ph, int(node_val[n][inst]))
                    worst = min(worst, m)
                    if m <= 0:
                        nbad += 1
            print(f"level {d:4d}/{len(levels)} width {w:4d} "
                  f"worst-margin {worst:6.1f} bits bad {nbad} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    # decode outputs
    n_ok = 0
    for inst in range(ninst):
        v = 0
        for j, o in enumerate(circuit.outputs):
            wnp = lb.to_u64_np(jax.device_get(vals[o]))
            ph = decrypt_wire_c0(wnp, inst)
            bit = int(((ph >> np.uint64(63)) + ((ph >> np.uint64(62)) & np.uint64(1))) & np.uint64(1))
            v |= bit << j
        n_ok += int(v == expected[inst])
        print(f"inst {inst}: got {v} expected {expected[inst]}")
    print(f"RESULT mux path: {n_ok}/{ninst} correct")

elif args.path == "exec":
    from spf_tpu.ops.keyswitch_u32 import ksk_to_byte_planes
    from spf_tpu.runtime.executor_u32 import U32CircuitExecutor, U32ComputeKey
    from spf_tpu.runtime.fhe_circuit import CtType, FheCircuit, FheEdge, FheOp
    from spf_tpu.utils import host_crypto as hc

    vec = np.load(os.path.join(KC, "default128_suitevecs.npz"))
    key = U32ComputeKey(
        bsk_freq=bsk_freq, ak_freq=ak_freq, ssk_freq=ssk_freq,
        ksk_planes=ksk_to_byte_planes(ksk_np),
        ggsw_zero_freq=bu.bsk_to_freq_u32(np.asarray(vec["ggsws"][0])),
        ggsw_one_freq=bu.bsk_to_freq_u32(np.asarray(vec["ggsws"][1])),
    )
    ex = U32CircuitExecutor(key, p, whole_circuit=False)
    rngh = np.random.default_rng(20260818)
    t_all = time.time()
    n_ok = 0
    for inst in range(ninst):
        fc = FheCircuit()
        inputs = {}
        sel_nodes = []
        for idx in range(2 * width):
            nm = f"in{idx}"
            nid = fc.add_node(FheOp.INPUT_GLWE1, nm)
            conv = fc.insert_ciphertext_conversion(nid, CtType.GLWE1, CtType.GGSW1)
            sel_nodes.append(conv)
            bit = int(bits_in[idx * ninst + inst])
            if args.sigma0:
                msg = np.zeros(n1, dtype=np.uint64)
                msg[0] = np.uint64(bit) << np.uint64(63)
                a0 = rngh.integers(0, 1 << 64, size=(glwe.size, n1), dtype=np.uint64)
                a_s = np.zeros(n1, dtype=np.uint64)
                for kk in range(glwe.size):
                    a_s += hc.negacyclic_mul_binary_np(a0[kk], glwe_sk_np[kk])
                inputs[nm] = np.concatenate([a0, (a_s + msg)[None]], axis=0)
            else:
                inputs[nm] = hc.encrypt_glwe_bit_np(rngh, bit, glwe_sk_np, glwe)
        outs = fc.insert_mux_circuit(circuit, sel_nodes)
        for j, o in enumerate(outs):
            oid = fc.add_node(FheOp.OUTPUT_GLWE1, f"out{j}")
            fc.add_edge(o, oid, FheEdge.UNARY)
        res = ex.run(fc, inputs)
        v = 0
        for j in range(len(outs)):
            ct = res[f"out{j}"]
            ph = hc.decrypt_glwe_np(ct, glwe_sk_np, glwe)[0]
            bit = int(((ph >> np.uint64(63)) + ((ph >> np.uint64(62)) & np.uint64(1))) & np.uint64(1))
            v |= bit << j
        n_ok += int(v == expected[inst])
        print(f"inst {inst}: got {v} expected {expected[inst]} "
              f"({time.time()-t_all:.0f}s)", flush=True)
    print(f"RESULT exec path: {n_ok}/{ninst} correct")
