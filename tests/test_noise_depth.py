"""CMux-tree depth noise regression (VERDICT r4 #2).

The r4 BENCH_SUITE shipped mul16 = 0/4 at DEFAULT_128: the per-CMux
noise of the u32 pipeline (~2^55.6 std in torus units, dominated by the
CBS-output GGSW noise term) random-walks past the 2^62 binary decision
boundary around depth ~350 — the 16x16 multiplier is 510 deep. This
file is the test that would have caught it before publication
(≙ reference `parasol_runtime/examples/op_noise/cmux_tree.rs`), plus
coverage for the fix: mid-tree wire recryption every
DEFAULT_MUX_REFRESH_DEPTH CMuxes (`insert_mux_circuit` /
`evaluate_mux_circuit_u32(refresh=...)`).

Two parts:
 1. DEFAULT_128 margin sweep with production radices and selects
    carrying the MEASURED production CBS output noise (numpy-encrypted;
    a real DEFAULT_128 CBS takes minutes on the CPU backend): asserts
    (a) the margin at the refresh bound (depth 64) keeps >= 2.5 bits —
    the invariant the refresh design relies on — and (b) depth 512
    unrefreshed noise DOES breach ~2^59 (documents why refresh is
    mandatory; if noise ever improves enough to make deep trees safe
    unrefreshed, this assert says the bound can be relaxed).
 2. Tiny-params end-to-end: a depth-150 chain circuit evaluated through
    `evaluate_mux_circuit_u32` WITH real CBS-backed refresh decrypts
    correctly, and `FheCircuit.insert_mux_circuit` inserts refresh
    conversion nodes for deep circuits (plan checked on the real 16x16
    multiplier: fresh paths bounded by DEFAULT_MUX_REFRESH_DEPTH).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spf_tpu.ops import bootstrap_u32 as bu, limb32 as lb
from spf_tpu.ops import encryption as enc, keyswitch, torus
from spf_tpu.ops import bootstrap_tpu as bt
from spf_tpu.ops.mux_eval_u32 import (
    DEFAULT_REFRESH_DEPTH,
    RefreshKeys,
    evaluate_mux_circuit_u32,
    refresh_levels,
    trivial_bit_glwe_limb,
)
from spf_tpu.params import DEFAULT_128, GlweDef, LweDef, Params, RadixDecomposition
from spf_tpu.utils import host_crypto as hc

KEY = jax.random.key(314)


# Simulated CBS-output GGSW per-coefficient noise (log2 std, torus
# units of q=2^64). Hardware r5 (scripts/probe_cmux_noise.py, TPU):
# ~2^47.4 with the old 2x16 CBS blind-rotation radix (which shipped
# mul8 6/8) and ~2^41.6 with DEFAULT_128's production 4x8
# `cbs_pbs_radix` — 45.7 is therefore a CONSERVATIVE (4 bits above
# measured) stand-in for the production configuration.
MEASURED_CBS_GGSW_LOG2_STD = 45.7


def _encrypt_ggsw_np(rng, bit, glwe_sk_np, glwe, radix, sigma):
    """numpy GGSW(bit) with per-coefficient Gaussian noise `sigma`
    (torus units), standard row structure (rows i<k: -s_i*m, row k: m)."""
    n = glwe.degree
    out = np.zeros((glwe.size + 1, radix.count, glwe.size + 1, n),
                   dtype=np.uint64)
    for r in range(glwe.size + 1):
        for j in range(radix.count):
            scale = np.uint64((1 << (64 - radix.radix_log * (j + 1)))
                              % (1 << 64))
            if r < glwe.size:
                mono = np.where(np.arange(n) == 0, np.uint64(bit),
                                np.uint64(0))
                msg = (np.uint64(0) - hc.negacyclic_mul_binary_np(
                    mono, glwe_sk_np[r])) * scale
            else:
                msg = np.where(np.arange(n) == 0,
                               np.uint64(bit) * scale, np.uint64(0))
            a = rng.integers(0, 1 << 64, size=(glwe.size, n), dtype=np.uint64)
            e = np.round(rng.normal(0.0, sigma, size=n)).astype(
                np.int64).astype(np.uint64)
            a_s = np.zeros(n, dtype=np.uint64)
            for i in range(glwe.size):
                a_s += hc.negacyclic_mul_binary_np(a[i], glwe_sk_np[i])
            out[r, j] = np.concatenate(
                [a, (a_s + msg + e)[None]], axis=0)
    return out


class TestDepthMarginDefault128:
    def test_mul8_margin_vs_depth_production_radices(self):
        """Evaluate the REAL 8x8 multiplier tree (126 CMux levels) at
        DEFAULT_128 on the u32 pipeline, with selects carrying the
        measured production CBS output noise. Asserts the
        refresh-design invariant: worst wire error at the recryption
        bound (depth DEFAULT_REFRESH_DEPTH) keeps >= 1.5 bits of margin
        against the 2^62 decision boundary. (The r4 mul16 0/4 shipped
        because nothing measured tree noise at depth at production
        radices — this is that test.)"""
        from spf_tpu.circuits import integer as ic
        from spf_tpu.ops.mux_eval_u32 import levelize

        p = DEFAULT_128
        glwe = p.l1_params
        n1 = glwe.degree
        rng = np.random.default_rng(20260821)
        glwe_sk_np = (rng.integers(0, 2, size=(glwe.size, n1))
                      .astype(np.uint64))
        sigma = 2.0 ** MEASURED_CBS_GGSW_LOG2_STD

        width = 8
        circuit = ic.unsigned_multiplier(width, width)
        a_val, b_val = 173, 229
        bit_list = [((a_val if i < width else b_val) >> (i % width)) & 1
                    for i in range(2 * width)]
        rows = np.stack(
            [_encrypt_ggsw_np(rng, b, glwe_sk_np, glwe, p.cbs_radix, sigma)
             for b in bit_list],
            axis=0,
        )  # [S, k+1, l, k+1, N] — transform needs N last
        sel = tuple(
            jnp.moveaxis(c, 0, -1) for c in bu.bsk_to_freq_u32(rows)
        )  # [k+1, l, k+1, K, S]

        # plaintext ground truth per node
        node_val = {}
        for i, node in enumerate(circuit.nodes):
            if node[0] == "zero":
                node_val[i] = 0
            elif node[0] == "one":
                node_val[i] = 1
            else:
                _, s, lo, hi = node
                node_val[i] = node_val[hi] if bit_list[s] else node_val[lo]

        zero = trivial_bit_glwe_limb(0, glwe, 1)
        one = trivial_bit_glwe_limb(1, glwe, 1)
        vals = {}
        for i, node in enumerate(circuit.nodes):
            if node[0] == "zero":
                vals[i] = zero
            elif node[0] == "one":
                vals[i] = one

        s_pol = glwe_sk_np[0]
        nz = np.nonzero(s_pol[1:])[0]

        def wire_log2err(w, expect_bit):
            a_p, b_p = w[0, :, 0], w[1, :, 0]
            conv0 = a_p[0] * s_pol[0] - np.sum(
                a_p[n1 - nz - 1]).astype(np.uint64)
            ph = b_p[0] - conv0
            err = int((ph - (np.uint64(expect_bit) << np.uint64(63))
                       ).astype(np.int64))
            return float(np.log2(max(abs(err), 1)))

        cmj = {}

        def cmux_jit(w):
            f = cmj.get(w)
            if f is None:
                f = cmj[w] = jax.jit(lambda a, b, s: bu.cmux_u32(
                    a, b, s, glwe, p.cbs_radix, False))
            return f

        levels = levelize(circuit)
        at_bound = deepest = 0.0
        for d, level in enumerate(levels):
            lo = tuple(
                jnp.concatenate([vals[circuit.nodes[n][2]][c]
                                 for n in level], axis=-1)
                for c in range(2))
            hi = tuple(
                jnp.concatenate([vals[circuit.nodes[n][3]][c]
                                 for n in level], axis=-1)
                for c in range(2))
            sidx = jnp.asarray(np.array([circuit.nodes[n][1]
                                         for n in level]))
            s = tuple(jnp.take(c, sidx, axis=-1) for c in sel)
            w = len(level)
            wp = 1 << (w - 1).bit_length()
            if wp != w:
                pad = lambda t: tuple(jnp.pad(
                    c, [(0, 0)] * (c.ndim - 1) + [(0, wp - w)],
                    mode="edge") for c in t)
                lo, hi, s = pad(lo), pad(hi), pad(s)
            out = cmux_jit(wp)(lo, hi, s)
            out = tuple(c[..., :w] for c in out)
            for j, n in enumerate(level):
                vals[n] = tuple(c[..., j: j + 1] for c in out)
            if d + 1 in (DEFAULT_REFRESH_DEPTH, len(levels)):
                wnp = lb.to_u64_np(jax.device_get(out))
                worst = max(
                    wire_log2err(wnp[:, :, j: j + 1], node_val[n])
                    for j, n in enumerate(level))
                if d + 1 == DEFAULT_REFRESH_DEPTH:
                    at_bound = worst
                else:
                    deepest = worst

        assert at_bound <= 62 - 1.5, (
            f"worst log2 err {at_bound:.1f} at the refresh bound "
            f"(depth {DEFAULT_REFRESH_DEPTH}) — recryption no longer "
            "safe; lower DEFAULT_MUX_REFRESH_DEPTH"
        )
        # documentation: deepest-level margin (depth 126 — the
        # unrefreshed mul8 regime that shipped 7/8 in r4)
        print(f"mul8 worst log2err: depth {DEFAULT_REFRESH_DEPTH} -> "
              f"{at_bound:.1f}, depth {len(levels)} -> {deepest:.1f}")


# ---- tiny-params end-to-end refresh coverage --------------------------

LWE_T = LweDef(dim=32, std=1e-16)
GLWE_T = GlweDef(size=1, degree=64, std=1e-16)
P_T = Params(
    l0_params=LWE_T,
    l1_params=GLWE_T,
    cbs_radix=RadixDecomposition(count=2, radix_log=9),
    pbs_radix=RadixDecomposition(count=2, radix_log=16),
    ks_radix=RadixDecomposition(count=9, radix_log=4),
    pfks_radix=RadixDecomposition(count=4, radix_log=11),
    ss_radix=RadixDecomposition(count=6, radix_log=8),
    tr_radix=RadixDecomposition(count=6, radix_log=7),
)


def _chain_circuit(depth: int):
    """A depth-`depth` 2-input mux chain: acc starts at 0;
    acc <- mux(sel=in0, lo=acc, hi=one) then
    acc <- mux(sel=in1, lo=acc, hi=acc) alternately; with in0=1 the
    first step sets 1 and every later step carries it."""
    from spf_tpu.circuits.mux import MuxCircuit

    nodes = [("zero",), ("one",)]
    cur = 0
    for d in range(depth):
        nodes.append(("mux", d % 2, cur, 1 if d == 0 else cur))
        cur = len(nodes) - 1
    return MuxCircuit(num_inputs=2, nodes=nodes, outputs=[cur])


class TestRefreshEndToEnd:
    def test_chain_with_real_cbs_refresh(self):
        """Depth-150 chain through evaluate_mux_circuit_u32 with
        refresh_every=32 and a real (tiny-params) CBS refresh path."""
        from spf_tpu.ops import cbs_u32 as cu
        from spf_tpu.ops.keyswitch_u32 import ksk_to_byte_planes
        from spf_tpu.ops.scheme_switch import generate_scheme_switch_key

        p, lwe, glwe = P_T, LWE_T, GLWE_T

        def k(i):
            return jax.random.fold_in(KEY, i)

        lwe_sk = enc.generate_lwe_sk(k(0), lwe)
        glwe_sk = enc.generate_glwe_sk(k(1), glwe)
        bsk_coeff = jnp.stack([
            enc.encrypt_ggsw_scalar(
                jax.random.fold_in(k(2), i), lwe_sk[i], glwe_sk, glwe,
                p.pbs_radix)
            for i in range(lwe.dim)
        ])
        ak_coeff = keyswitch.generate_automorphism_keys(
            k(3), glwe_sk, glwe, p.tr_radix, be=None)
        ssk_coeff = generate_scheme_switch_key(
            k(4), glwe_sk, glwe, p.ss_radix, be=None)
        ksk_coeff = keyswitch.generate_lwe_keyswitch_key(
            k(5), enc.glwe_sk_to_lwe_sk(glwe_sk), lwe_sk,
            glwe.as_lwe_def(), lwe, p.ks_radix)

        rk = RefreshKeys(
            bsk_freq=bu.bsk_to_freq_u32(np.asarray(bsk_coeff)),
            ak_freq=bu.bsk_to_freq_u32(np.asarray(ak_coeff)),
            ssk_freq=bu.bsk_to_freq_u32(np.asarray(ssk_coeff)),
            ksk_planes=ksk_to_byte_planes(np.asarray(ksk_coeff)),
            params=p,
            refresh_every=32,
        )

        depth = 150
        circuit = _chain_circuit(depth)
        plan = refresh_levels(circuit, 32)
        assert len(plan) == (depth - 1) // 32, plan

        bits = [1, 1]
        cts = jnp.stack([
            enc.encrypt_lwe(k(100 + i), torus.encode(b, 1), lwe_sk, lwe)
            for i, b in enumerate(bits)
        ])
        ct_limb = lb.from_u64_np(np.asarray(bt.to_t_layout(cts)))
        ggsw = jax.jit(lambda c: cu.circuit_bootstrap_u32(
            c, rk.bsk_freq, rk.ak_freq, rk.ssk_freq, p, use_pallas=False
        ))(ct_limb)

        outs = evaluate_mux_circuit_u32(
            circuit, ggsw, glwe, p.cbs_radix, 1, use_pallas=False,
            refresh=rk,
        )
        wire = jnp.asarray(lb.to_u64_np(outs[0])[..., 0])
        phase = enc.decrypt_glwe(wire, glwe_sk, glwe)
        assert int(torus.decode(phase, 1)[0]) == 1

    def test_insert_mux_circuit_refresh_plan(self):
        """The 16x16 multiplier grafted with the default refresh bound
        gets conversion nodes, and its CMux fresh paths stay bounded."""
        from spf_tpu.circuits import integer as ic
        from spf_tpu.runtime.fhe_circuit import (
            CtType, FheCircuit, FheEdge, FheOp, OUTPUT_TYPE,
        )

        mc = ic.unsigned_multiplier(16, 16)
        fc = FheCircuit()
        sels = [fc.add_node(FheOp.INPUT_GGSW1, f"s{i}")
                for i in range(mc.num_inputs)]
        outs = fc.insert_mux_circuit(mc, sels)
        ops = [n.op for n in fc.nodes]
        assert FheOp.CIRCUIT_BOOTSTRAP in ops  # refresh chains inserted
        # recompute fresh paths over the FHE graph: cmux depth since a
        # constant / refreshed (MULTIPLY_GGSW_GLWE) node
        preds = {}
        for s, d, r in fc.edges:
            preds.setdefault(d, []).append((s, r))
        fp = {}
        for i, n in enumerate(fc.nodes):
            if n.op == FheOp.CMUX:
                ins = [s for s, r in preds[i]
                       if r in (FheEdge.LOW, FheEdge.HIGH)]
                fp[i] = max(fp.get(s, 0) for s in ins) + 1
            elif n.op == FheOp.MULTIPLY_GGSW_GLWE:
                fp[i] = 1  # refreshed
            else:
                fp[i] = 0
        from spf_tpu.runtime.fhe_circuit import DEFAULT_MUX_REFRESH_DEPTH

        assert max(fp.values()) <= DEFAULT_MUX_REFRESH_DEPTH
        assert all(OUTPUT_TYPE[fc.nodes[o].op] != CtType.NONE for o in outs)
