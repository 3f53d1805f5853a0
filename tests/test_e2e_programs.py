"""Encrypted program analogs of the reference's e2e/benchmark programs
(hamming_distance, auction, cardio; `parasol_cpu/tests/e2e_tests/`,
`parasol_cpu/benches/`) expressed through the fluent API and executed on
the batched executor."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spf_tpu.params import GlweDef, LweDef, Params, RadixDecomposition
from spf_tpu.runtime import Evaluation, generate_keys
from spf_tpu.runtime.executor import CircuitExecutor
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

KEY = jax.random.key(60606)


@pytest.fixture(scope="module")
def material():
    sk, _, ck = generate_keys(KEY, TEST_PARAMS)
    ev = Evaluation(ck, TEST_PARAMS)
    return sk, ev, CircuitExecutor(ev)


def run(ex, ev, sk, ctx, operands, out_keys):
    inputs = {}
    for uint, (val, n) in operands:
        cts = ev.enc.encrypt_uint_bits(
            jax.random.fold_in(KEY, hash(tuple(uint.input_keys())) % 2**31), val, n, sk
        )
        for key, ct in zip(uint.input_keys(), cts):
            inputs[key] = ct
    outs = ex.run(ctx.circuit, inputs)
    return ev.enc.decrypt_uint_bits([outs[k] for k in out_keys], sk)


class TestHammingDistance:
    def test_hamming(self, material):
        """popcount(a ^ b) (≙ `e2e_tests/hamming_distance`)."""
        sk, ev, ex = material
        ctx = FheCircuitCtx()
        a = UInt.input(ctx, 8)
        b = UInt.input(ctx, 8)
        out_keys = (a ^ b).popcount().output()
        got = run(ex, ev, sk, ctx, [(a, (0b1011_0010, 8)), (b, (0b0010_1011, 8))], out_keys)
        assert got == bin(0b1011_0010 ^ 0b0010_1011).count("1")


class TestAuction:
    def test_sealed_bid_max(self, material):
        """max of encrypted bids via compare+select chain
        (≙ `e2e_tests/auction`)."""
        sk, ev, ex = material
        ctx = FheCircuitCtx()
        bids = [UInt.input(ctx, 8) for _ in range(3)]
        best = bids[0]
        for b in bids[1:]:
            best = best.select(best.gt(b), b)
        out_keys = best.output()
        got = run(
            ex, ev, sk, ctx,
            [(bids[0], (87, 8)), (bids[1], (201, 8)), (bids[2], (53, 8))],
            out_keys,
        )
        assert got == 201


class TestCardio:
    def test_risk_factors(self, material):
        """Cardio-style risk scoring: count satisfied risk conditions
        (≙ `e2e_tests/cardio`): age > 50, weight > 80, smoker flag."""
        sk, ev, ex = material
        ctx = FheCircuitCtx()
        age = UInt.input(ctx, 8)
        weight = UInt.input(ctx, 8)
        smoker = UInt.input(ctx, 1)
        fifty = UInt.input(ctx, 8)  # thresholds as encrypted inputs
        eighty = UInt.input(ctx, 8)
        c1 = age.gt(fifty)
        c2 = weight.gt(eighty)
        # risk = c1 + c2 + smoker (2-bit result)
        r1 = UInt(list(c1.bits), ctx).resize(2)
        r2 = UInt(list(c2.bits), ctx).resize(2)
        r3 = UInt(list(smoker.bits), ctx).resize(2)
        risk = r1 + r2 + r3
        out_keys = risk.output()
        got = run(
            ex, ev, sk, ctx,
            [
                (age, (63, 8)),
                (weight, (85, 8)),
                (smoker, (1, 1)),
                (fifty, (50, 8)),
                (eighty, (80, 8)),
            ],
            out_keys,
        )
        assert got == 3
