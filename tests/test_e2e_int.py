"""End-to-end encrypted integer arithmetic through the fluent builder
and the batched executor — the minimum end-to-end slice (SURVEY §7
Milestone C, basic_add parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spf_tpu.params import GlweDef, LweDef, Params, RadixDecomposition
from spf_tpu.runtime import Evaluation, generate_keys
from spf_tpu.runtime.executor import CircuitExecutor
from spf_tpu.runtime.fhe_circuit import FheCircuit
from spf_tpu.runtime.fluent import FheCircuitCtx, UInt

TEST_PARAMS = Params(
    l0_params=LweDef(dim=128, std=1e-16),
    l1_params=GlweDef(size=1, degree=256, std=1e-16),
    cbs_radix=RadixDecomposition(count=2, radix_log=9),
    pbs_radix=RadixDecomposition(count=2, radix_log=16),
    ks_radix=RadixDecomposition(count=9, radix_log=4),
    pfks_radix=RadixDecomposition(count=4, radix_log=11),
    ss_radix=RadixDecomposition(count=6, radix_log=8),
    tr_radix=RadixDecomposition(count=6, radix_log=7),
)

KEY = jax.random.key(777)

@pytest.fixture(scope="module")
def material():
    sk, pk, ck = generate_keys(KEY, TEST_PARAMS)
    ev = Evaluation(ck, TEST_PARAMS)
    ex = CircuitExecutor(ev)
    return sk, pk, ev, ex


def run_binary(ex, ev, sk, build, a_val, b_val, n, signed=False, mode="glwe"):
    ctx = FheCircuitCtx()
    a = UInt.input(ctx, n, signed, mode=mode)
    b = UInt.input(ctx, n, signed, mode=mode)
    result = build(a, b)
    out_keys = result.output()
    inputs = {}
    cts = ev.enc.encrypt_uint_bits(jax.random.fold_in(KEY, 1), a_val, n, sk)
    cts += ev.enc.encrypt_uint_bits(jax.random.fold_in(KEY, 2), b_val, n, sk)
    for key, ct in zip(a.input_keys() + b.input_keys(), cts):
        inputs[key] = ct
    outputs = ex.run(ctx.circuit, inputs)
    return ev.enc.decrypt_uint_bits([outputs[k] for k in out_keys], sk)


class TestEncryptedInts:
    def test_u8_add(self, material):
        sk, _, ev, ex = material
        assert run_binary(ex, ev, sk, lambda a, b: a + b, 170, 85, 8) == 255
        assert run_binary(ex, ev, sk, lambda a, b: a + b, 200, 100, 8) == (300 % 256)

    def test_u8_sub(self, material):
        sk, _, ev, ex = material
        assert run_binary(ex, ev, sk, lambda a, b: a - b, 200, 55, 8) == 145
        assert run_binary(ex, ev, sk, lambda a, b: a - b, 5, 10, 8) == 251

    def test_u4_mul(self, material):
        sk, _, ev, ex = material
        assert run_binary(ex, ev, sk, lambda a, b: a * b, 13, 11, 4) == 143

    def test_u8_compare(self, material):
        sk, _, ev, ex = material
        assert run_binary(ex, ev, sk, lambda a, b: a.gt(b), 200, 100, 8) == 1
        assert run_binary(ex, ev, sk, lambda a, b: a.gt(b), 100, 200, 8) == 0
        assert run_binary(ex, ev, sk, lambda a, b: a.eq(b), 42, 42, 8) == 1

    def test_u8_bitwise_xor(self, material):
        sk, _, ev, ex = material
        assert run_binary(ex, ev, sk, lambda a, b: a ^ b, 0b1100_1010, 0b1010_1100, 8) == 0b0110_0110

    def test_select(self, material):
        sk, _, ev, ex = material

        def build(a, b):
            cond = a.gt(b)  # 1-bit
            return a.select(cond, b)  # max(a, b)

        assert run_binary(ex, ev, sk, build, 7, 200, 8) == 200
        assert run_binary(ex, ev, sk, build, 201, 13, 8) == 201

    def test_u8_add_glev_mode(self, material):
        """GLEV `Muxable` mode: GlevCMux trees + scheme-switch output
        conversion, single circuit layer + decrypt — the reference's
        GLEV coverage shape (≙ `fluent/mod.rs:362-374,589-631`)."""
        sk, _, ev, ex = material
        assert run_binary(
            ex, ev, sk, lambda a, b: a + b, 170, 85, 8, mode="glev"
        ) == 255

    def test_u8_eq_glev_mode(self, material):
        sk, _, ev, ex = material
        assert run_binary(
            ex, ev, sk, lambda a, b: a.eq(b), 42, 42, 8, mode="glev"
        ) == 1
        assert run_binary(
            ex, ev, sk, lambda a, b: a.eq(b), 42, 43, 8, mode="glev"
        ) == 0

    def test_glev_ggsw_conversion_roundtrip(self, material):
        """L0 -> (CBS) -> GGSW -> GLEV -> (scheme switch) -> GGSW ->
        select of a CMux (≙ reference `convert_test`
        `fluent/mod.rs:526-531`)."""
        sk, _, ev, ex = material
        from spf_tpu.runtime.fhe_circuit import CtType, FheEdge, FheOp

        for bit in (0, 1):
            g = FheCircuit()
            inp = g.add_node(FheOp.INPUT_GLWE1, "b")
            glev = g.insert_ciphertext_conversion(inp, CtType.GLWE1, CtType.GLEV1)
            ggsw = g.insert_ciphertext_conversion(glev, CtType.GLEV1, CtType.GGSW1)
            zero = g.add_node(FheOp.ZERO_GLWE1)
            one = g.add_node(FheOp.ONE_GLWE1)
            m = g.add_node(FheOp.CMUX)
            g.add_edge(ggsw, m, FheEdge.SEL)
            g.add_edge(zero, m, FheEdge.LOW)
            g.add_edge(one, m, FheEdge.HIGH)
            o = g.add_node(FheOp.OUTPUT_GLWE1, "out")
            g.add_edge(m, o, FheEdge.UNARY)
            ct = ev.enc.encrypt_uint_bits(jax.random.fold_in(KEY, 5 + bit), bit, 1, sk)
            out = ex.run(g, {"b": ct[0]})
            assert ev.enc.decrypt_uint_bits([out["out"]], sk) == bit

    def test_packed_input_roundtrip(self, material):
        sk, pk, ev, ex = material
        n = 8
        ctx = FheCircuitCtx()
        a = UInt.packed_input(ctx, n)
        b = UInt.packed_input(ctx, n)
        s = a + b
        out_key = s.pack_output()
        ct_a = ev.enc.encrypt_packed_uint(jax.random.fold_in(KEY, 30), 120, n, pk)
        ct_b = ev.enc.encrypt_packed_uint(jax.random.fold_in(KEY, 31), 103, n, pk)
        outputs = ex.run(ctx.circuit, {"in0": ct_a, "in1": ct_b})
        assert ev.enc.decrypt_packed_uint(outputs[out_key], n, sk) == 223


class TestGradeschoolMul:
    def test_wide_mul_decomposes(self, material):
        """Widths above CIRCUIT_CUTOFF decompose gradeschool-style
        (≙ `mul.rs:259-312`); exercised at u8 by lowering the cutoff."""
        sk, _, ev, ex = material
        from spf_tpu.circuits import integer as int_circuits

        old = int_circuits.CIRCUIT_CUTOFF
        int_circuits.CIRCUIT_CUTOFF = 4
        try:
            got = run_binary(ex, ev, sk, lambda a, b: a * b, 13, 11, 8)
        finally:
            int_circuits.CIRCUIT_CUTOFF = old
        assert got == 143
