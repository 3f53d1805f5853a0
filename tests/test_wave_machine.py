"""Wave-machine executor (runtime/wave_machine.py): index-driven
scan-fused FheCircuit execution must decrypt identically to the
per-wave U32CircuitExecutor on the same circuits — fluent arithmetic,
refresh conversions, packed I/O, NOT/MUL_XN, and an ELF program."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spf_tpu.ops import encryption as enc, keyswitch, torus
from spf_tpu.ops.scheme_switch import generate_scheme_switch_key
from spf_tpu.params import GlweDef, LweDef, Params, RadixDecomposition
from spf_tpu.runtime.executor_u32 import U32CircuitExecutor, U32ComputeKey
from spf_tpu.runtime.fhe_circuit import FheCircuit, FheEdge, FheOp
from spf_tpu.runtime.fluent import FheCircuitCtx, UInt
from spf_tpu.runtime.wave_machine import WaveMachine, build_schedule

KEY = jax.random.key(977)
LWE = LweDef(dim=32, std=1e-16)
GLWE = GlweDef(size=1, degree=64, std=1e-16)
P = Params(
    l0_params=LWE,
    l1_params=GLWE,
    cbs_radix=RadixDecomposition(count=2, radix_log=9),
    pbs_radix=RadixDecomposition(count=2, radix_log=16),
    ks_radix=RadixDecomposition(count=9, radix_log=4),
    pfks_radix=RadixDecomposition(count=4, radix_log=11),
    ss_radix=RadixDecomposition(count=6, radix_log=8),
    tr_radix=RadixDecomposition(count=6, radix_log=7),
)


def k(i):
    return jax.random.fold_in(KEY, i)


@pytest.fixture(scope="module")
def material():
    glwe = P.l1_params
    lwe_sk = enc.generate_lwe_sk(k(0), LWE)
    glwe_sk = enc.generate_glwe_sk(k(1), glwe)
    keys_split = jax.random.split(k(2), LWE.dim)
    bsk = jnp.stack(
        [
            enc.encrypt_ggsw_scalar(
                keys_split[i], lwe_sk[i], glwe_sk, glwe, P.pbs_radix
            )
            for i in range(LWE.dim)
        ]
    )
    ak = keyswitch.generate_automorphism_keys(k(3), glwe_sk, glwe, P.tr_radix, be=None)
    ssk = generate_scheme_switch_key(k(4), glwe_sk, glwe, P.ss_radix, be=None)
    ksk = keyswitch.generate_lwe_keyswitch_key(
        k(5), enc.glwe_sk_to_lwe_sk(glwe_sk), lwe_sk, glwe.as_lwe_def(), LWE,
        P.ks_radix,
    )
    ggsw0 = enc.encrypt_ggsw_scalar(k(6), jnp.uint64(0), glwe_sk, glwe, P.cbs_radix)
    ggsw1 = enc.encrypt_ggsw_scalar(k(7), jnp.uint64(1), glwe_sk, glwe, P.cbs_radix)
    ck = U32ComputeKey.from_coeff(bsk, ak, ssk, ksk, ggsw0, ggsw1)
    wm = WaveMachine(ck, P)
    return lwe_sk, glwe_sk, ck, wm


def encrypt_bits(glwe_sk, value, n, seed):
    out = []
    for i in range(n):
        poly = jnp.zeros((GLWE.degree,), dtype=jnp.uint64).at[0].set(
            (value >> i) & 1
        )
        ct = enc.encrypt_glwe(k(seed + i), torus.encode(poly, 1), glwe_sk, GLWE)
        out.append(np.asarray(ct))
    return out


def decrypt_bits(glwe_sk, cts):
    v = 0
    for i, ct in enumerate(cts):
        phase = enc.decrypt_glwe(jnp.asarray(ct), glwe_sk, GLWE)
        v |= int(torus.decode(phase, 1)[0]) << i
    return v


def run_binary(ex, glwe_sk, build, a_val, b_val, n, seed):
    ctx = FheCircuitCtx()
    a = UInt.input(ctx, n)
    b = UInt.input(ctx, n)
    out_keys = build(a, b).output()
    inputs = {}
    for kk, ct in zip(
        a.input_keys() + b.input_keys(),
        encrypt_bits(glwe_sk, a_val, n, seed)
        + encrypt_bits(glwe_sk, b_val, n, seed + n),
    ):
        inputs[kk] = ct
    res = ex.run(ctx.circuit, inputs)
    return decrypt_bits(glwe_sk, [res[kk] for kk in out_keys])


class TestWaveMachine:
    def test_u2_add(self, material):
        _, glwe_sk, _, wm = material
        assert run_binary(wm, glwe_sk, lambda a, b: a + b, 1, 2, 2, 100) == 3
        stats = wm.wave_stats()
        # the 4 input conversions (extract->ks->cbs chains) contract
        # into ONE fused convert wave
        assert "convert" in stats and stats["convert"]["gates"] == 4, stats
        assert stats["convert"]["waves"] == 1, stats

    def test_u4_mul_matches_per_wave(self, material):
        _, glwe_sk, ck, wm = material
        got = run_binary(wm, glwe_sk, lambda a, b: a * b, 5, 6, 4, 200)
        assert got == 30  # full 2n-bit product
        ex = U32CircuitExecutor(ck, P, whole_circuit=False)
        ref = run_binary(ex, glwe_sk, lambda a, b: a * b, 5, 6, 4, 200)
        assert got == ref

    def test_xor_and_eq(self, material):
        _, glwe_sk, _, wm = material
        assert run_binary(wm, glwe_sk, lambda a, b: a ^ b, 3, 1, 2, 300) == 2
        assert run_binary(wm, glwe_sk, lambda a, b: a.eq(b), 2, 2, 2, 320) == 1

    def test_deep_refresh_circuit(self, material):
        """A mux chain deep enough to trigger mid-tree recryption runs
        through the wave machine's extract->ks->cbs->extprod waves."""
        _, glwe_sk, _, wm = material
        from spf_tpu.circuits.integer import ripple_carry_adder
        from spf_tpu.runtime.fhe_circuit import CtType

        ctx = FheCircuitCtx()
        a = UInt.input(ctx, 4)
        b = UInt.input(ctx, 4)
        # refresh_every=2 forces mid-tree recryption waves on a short
        # circuit (production default 64 needs depth-64 trees)
        mux = ripple_carry_adder(4, emit_carry=False)
        sel_nodes = []
        for nd in a.bits + b.bits:
            sel_nodes.append(
                ctx.circuit.insert_ciphertext_conversion(
                    nd, CtType.GLWE1, CtType.GGSW1
                )
            )
        outs = ctx.circuit.insert_mux_circuit(
            mux, sel_nodes, refresh_every=2
        )
        out_keys = []
        for j, o in enumerate(outs):
            okey = f"out{j}"
            onode = ctx.circuit.add_node(FheOp.OUTPUT_GLWE1, okey)
            ctx.circuit.add_edge(o, onode, FheEdge.UNARY)
            out_keys.append(okey)
        inputs = {}
        for kk, ct in zip(
            a.input_keys() + b.input_keys(),
            encrypt_bits(glwe_sk, 9, 4, 400) + encrypt_bits(glwe_sk, 5, 4, 404),
        ):
            inputs[kk] = ct
        res = wm.run(ctx.circuit, inputs)
        got = decrypt_bits(glwe_sk, [res[kk] for kk in out_keys])
        assert got & 0xF == (9 + 5) % 16
        stats = wm.wave_stats()
        # the recryption chains contract into fused refresh waves
        assert stats.get("refresh", {}).get("gates", 0) > 0, (
            "refresh waves should have executed", stats)

    def test_packed_add(self, material):
        _, glwe_sk, _, wm = material
        n = 4
        a_val, b_val = 11, 7
        ctx = FheCircuitCtx()
        a = UInt.packed_input(ctx, n)
        b = UInt.packed_input(ctx, n)
        s = a + b
        out_key = s.pack_output()

        def pack_ct(value, seed):
            poly = jnp.zeros((GLWE.degree,), dtype=jnp.uint64)
            for i in range(n):
                poly = poly.at[i].set((value >> i) & 1)
            return np.asarray(
                enc.encrypt_glwe(k(seed), torus.encode(poly, 1), glwe_sk, GLWE)
            )

        outputs = wm.run(
            ctx.circuit,
            {"in0": pack_ct(a_val, 70), "in1": pack_ct(b_val, 71)},
        )
        phase = enc.decrypt_glwe(jnp.asarray(outputs[out_key]), glwe_sk, GLWE)
        bits = np.asarray(torus.decode(phase, 1))
        got = sum(int(bits[i]) << i for i in range(n))
        assert got == (a_val + b_val) % (1 << n)

    def test_not_gate(self, material):
        _, glwe_sk, _, wm = material
        g = FheCircuit()
        i = g.add_node(FheOp.INPUT_GLWE1, "x")
        nt = g.add_node(FheOp.NOT)
        g.add_edge(i, nt, FheEdge.UNARY)
        o = g.add_node(FheOp.OUTPUT_GLWE1, "y")
        g.add_edge(nt, o, FheEdge.UNARY)
        for bit in (0, 1):
            ct = encrypt_bits(glwe_sk, bit, 1, 500 + bit)[0]
            res = wm.run(g, {"x": ct})
            assert decrypt_bits(glwe_sk, [res["y"]]) == 1 - bit

    def test_elf_program(self, material):
        import os

        test_data = "/root/reference/parasol_cpu/tests/test_data"
        if not os.path.isdir(test_data):
            pytest.skip("reference ELF corpus unavailable")
        from spf_tpu.cpu import ArgsBuilder, FheComputer, Memory
        from spf_tpu.cpu.memory import EncByte
        from spf_tpu.runtime.executor_u32 import U32HostEvaluation

        _, glwe_sk, _, wm = material
        with open(os.path.join(test_data, "add"), "rb") as f:
            elf = f.read()
        memory = Memory.new_from_elf(elf)
        proc = FheComputer(U32HostEvaluation(P), executor=wm)
        call = (
            ArgsBuilder()
            .arg_encrypted(encrypt_bits(glwe_sk, 42, 8, 600))
            .arg_encrypted(encrypt_bits(glwe_sk, 54, 8, 610))
            .return_value(8)
            .build()
        )
        rp = proc.run_program(memory.get_function_entry("add"), memory, call)
        bt = memory.load_byte(rp)
        assert isinstance(bt, EncByte)
        got = decrypt_bits(glwe_sk, [np.asarray(b) for b in bt.bits])
        assert got == 96


class TestScheduleProperties:
    def test_schedule_shapes_and_reuse(self, material):
        """Scan fusion produces stacked index arrays; slot counts are
        pow2; schedule is cached by structure."""
        _, glwe_sk, _, wm = material
        ctx = FheCircuitCtx()
        # width 3: structurally distinct from every other test circuit
        # in this module (the schedule cache is keyed by structure)
        a = UInt.input(ctx, 3)
        b = UInt.input(ctx, 3)
        (a + b).output()
        sched = build_schedule(ctx.circuit)
        for kind, s in sched.slot_counts.items():
            assert s == 0 or (s & (s - 1)) == 0, (kind, s)
        n_before = len(wm._schedules)
        inputs = {}
        for kk, ct in zip(
            a.input_keys() + b.input_keys(),
            encrypt_bits(glwe_sk, 3, 3, 700) + encrypt_bits(glwe_sk, 6, 3, 703),
        ):
            inputs[kk] = ct
        wm.run(ctx.circuit, inputs)
        wm.run(ctx.circuit, inputs)
        assert len(wm._schedules) == n_before + 1

    def test_glev_rejected(self, material):
        _, _, _, wm = material
        g = FheCircuit()
        z = g.add_node(FheOp.ZERO_GLEV1)
        o = g.add_node(FheOp.OUTPUT_GLEV1, "y")
        g.add_edge(z, o, FheEdge.UNARY)
        from spf_tpu.runtime.fhe_circuit import CircuitError

        with pytest.raises(CircuitError):
            build_schedule(g)
