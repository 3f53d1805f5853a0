"""Scan-structured u32-limb circuit bootstrap vs the u64 reference path.

The headline property: the WHOLE CBS graph jits (the scan keeps the HLO
small — the unrolled u64 t-layout CBS could not be jitted even on CPU),
and its GGSW outputs select correctly under cmux at decrypt level.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spf_tpu.ops import bootstrap_tpu as bt, bootstrap_u32 as bu, cbs_u32 as cu
from spf_tpu.ops import encryption as enc, keyswitch, limb32 as lb, torus
from spf_tpu.ops.poly import negacyclic_mul_exact, pow_k
from spf_tpu.params import GlweDef, LweDef, Params, RadixDecomposition

KEY = jax.random.key(99)
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
    n = glwe.degree
    lwe_sk = enc.generate_lwe_sk(k(0), LWE)
    glwe_sk = enc.generate_glwe_sk(k(1), glwe)
    keys_split = jax.random.split(k(2), LWE.dim)
    bsk_coeff = jnp.stack(
        [
            enc.encrypt_ggsw_scalar(keys_split[i], lwe_sk[i], glwe_sk, glwe, P.pbs_radix)
            for i in range(LWE.dim)
        ]
    )
    ak_coeff = keyswitch.generate_automorphism_keys(
        k(3), glwe_sk, glwe, P.tr_radix, be=None
    )
    from spf_tpu.ops.scheme_switch import generate_scheme_switch_key

    ssk_coeff = generate_scheme_switch_key(k(4), glwe_sk, glwe, P.ss_radix, be=None)
    return lwe_sk, glwe_sk, bsk_coeff, ak_coeff, ssk_coeff


class TestTraceU32:
    def test_trace_matches_u64(self, material):
        """trace_u32 (scanned) must equal trace_t (unrolled) exactly at
        decrypt level on the same input."""
        _, glwe_sk, _, ak_coeff, _ = material
        glwe = P.l1_params
        rng = np.random.default_rng(7)
        B = 4
        # a small-noise GLWE encrypting a constant poly (trace isolates c0)
        msg = torus.encode(jnp.zeros(glwe.degree, dtype=jnp.uint64).at[0].set(1), 3)
        cts = jnp.stack(
            [enc.encrypt_glwe(k(10 + i), msg, glwe_sk, glwe) for i in range(B)]
        )
        ct_t = bt.to_t_layout(cts)
        ak_t = tuple(
            c[..., 0] for c in bt.ft.fwd_torus_t(torus.u64(ak_coeff)[..., None])
        )
        ref = bt.trace_t(ct_t, ak_t, glwe, P.tr_radix)

        ak_u32 = bu.bsk_to_freq_u32(np.asarray(ak_coeff))
        got = jax.jit(
            lambda c: cu.trace_u32(c, ak_u32, glwe, P.tr_radix, use_pallas=False)
        )(lb.from_u64_np(np.asarray(ct_t)))
        got_u64 = lb.to_u64_np(got)

        # same decrypt (both carry ~2^37 ds32 conv noise; compare decoded)
        for i in range(B):
            d_ref = torus.decode(
                enc.decrypt_glwe(bt.from_t_layout(ref)[i], glwe_sk, glwe), 3
            )
            d_got = torus.decode(
                enc.decrypt_glwe(
                    bt.from_t_layout(jnp.asarray(got_u64))[i], glwe_sk, glwe
                ),
                3,
            )
            np.testing.assert_array_equal(np.asarray(d_got), np.asarray(d_ref))


class TestCbsU32:
    def test_full_conversion_selects(self, material):
        """Jitted scan-structured CBS -> GGSW -> cmux select parity
        (mirrors TestTLayoutCBS.test_full_conversion_matches, but the
        graph is jitted whole — the scan keeps compile tractable)."""
        lwe_sk, glwe_sk, bsk_coeff, ak_coeff, ssk_coeff = material
        glwe = P.l1_params
        B = 4
        bits = [0, 1, 1, 0]
        cts = jnp.stack(
            [
                enc.encrypt_lwe(k(60 + i), torus.encode(b, 1), lwe_sk, LWE)
                for i, b in enumerate(bits)
            ]
        )
        bsk_u32 = bu.bsk_to_freq_u32(np.asarray(bsk_coeff))
        ak_u32 = bu.bsk_to_freq_u32(np.asarray(ak_coeff))
        ssk_u32 = bu.bsk_to_freq_u32(np.asarray(ssk_coeff))

        ct_limb = lb.from_u64_np(np.asarray(bt.to_t_layout(cts)))
        ggsw = jax.jit(
            lambda c: cu.circuit_bootstrap_u32(
                c, bsk_u32, ak_u32, ssk_u32, P, use_pallas=False
            )
        )(ct_limb)

        # cmux in the u32 pipeline: m0 = 0, m1 = encode(1) constant poly
        m0 = lb.zeros((glwe.size + 1, glwe.degree, B))
        one = np.zeros((glwe.size + 1, glwe.degree, 1), dtype=np.uint64)
        one[-1, :, 0] = np.uint64(1) << np.uint64(63)
        m1l = lb.from_u64_np(np.broadcast_to(one, (glwe.size + 1, glwe.degree, B)))
        out = jax.jit(
            lambda a, b: bu.cmux_u32(a, b, ggsw, glwe, P.cbs_radix, use_pallas=False)
        )(m0, m1l)
        out_u64 = jnp.asarray(lb.to_u64_np(out))
        for i, b in enumerate(bits):
            glwe_ct = bt.from_t_layout(out_u64)[i]
            dec = torus.decode(enc.decrypt_glwe(glwe_ct, glwe_sk, glwe), 1)
            np.testing.assert_array_equal(np.asarray(dec), b, err_msg=f"bit {i}")


class TestCBSPhaseRot:
    def test_full_conversion_selects_phase_rot(self, material):
        """Same conversion-cycle parity with the frequency-domain
        rotation inside the multi-functional PBS (phase_rot=True)."""
        lwe_sk, glwe_sk, bsk_coeff, ak_coeff, ssk_coeff = material
        glwe = P.l1_params
        B = 4
        bits = [1, 0, 1, 1]
        cts = jnp.stack(
            [
                enc.encrypt_lwe(k(80 + i), torus.encode(b, 1), lwe_sk, LWE)
                for i, b in enumerate(bits)
            ]
        )
        bsk_u32 = bu.bsk_to_freq_u32(np.asarray(bsk_coeff))
        ak_u32 = bu.bsk_to_freq_u32(np.asarray(ak_coeff))
        ssk_u32 = bu.bsk_to_freq_u32(np.asarray(ssk_coeff))

        ct_limb = lb.from_u64_np(np.asarray(bt.to_t_layout(cts)))
        ggsw = jax.jit(
            lambda c: cu.circuit_bootstrap_u32(
                c, bsk_u32, ak_u32, ssk_u32, P, use_pallas=False,
                phase_rot=True,
            )
        )(ct_limb)

        m0 = lb.zeros((glwe.size + 1, glwe.degree, B))
        one = np.zeros((glwe.size + 1, glwe.degree, 1), dtype=np.uint64)
        one[-1, :, 0] = np.uint64(1) << np.uint64(63)
        m1l = lb.from_u64_np(np.broadcast_to(one, (glwe.size + 1, glwe.degree, B)))
        out = jax.jit(
            lambda a, b: bu.cmux_u32(a, b, ggsw, glwe, P.cbs_radix, use_pallas=False)
        )(m0, m1l)
        out_u64 = jnp.asarray(lb.to_u64_np(out))
        for i, b in enumerate(bits):
            glwe_ct = bt.from_t_layout(out_u64)[i]
            dec = torus.decode(enc.decrypt_glwe(glwe_ct, glwe_sk, glwe), 1)
            np.testing.assert_array_equal(np.asarray(dec), b, err_msg=f"bit {i}")


class TestCBSMultibit:
    def test_full_conversion_selects_multibit(self, material):
        """Conversion-cycle parity with a MULTI-BIT bootstrap key inside
        the CBS (auto-detected from the key's subset axis): the grouped
        blind rotation amortizes its FFTs over g key bits per step
        (`multibit.py`), and the GGSW outputs must still select
        correctly under cmux."""
        from spf_tpu.ops import multibit as mb

        lwe_sk, glwe_sk, _, ak_coeff, ssk_coeff = material
        glwe = P.l1_params
        B = 4
        bits = [0, 1, 0, 1]
        cts = jnp.stack(
            [
                enc.encrypt_lwe(k(90 + i), torus.encode(b, 1), lwe_sk, LWE)
                for i, b in enumerate(bits)
            ]
        )
        bsk_mb = mb.generate_multibit_bsk(
            k(5), lwe_sk, glwe_sk, glwe, P.pbs_radix, 2
        )
        bsk_mb_u32 = bu.bsk_to_freq_u32(np.asarray(bsk_mb))
        ak_u32 = bu.bsk_to_freq_u32(np.asarray(ak_coeff))
        ssk_u32 = bu.bsk_to_freq_u32(np.asarray(ssk_coeff))

        ct_limb = lb.from_u64_np(np.asarray(bt.to_t_layout(cts)))
        ggsw = jax.jit(
            lambda c: cu.circuit_bootstrap_u32(
                c, bsk_mb_u32, ak_u32, ssk_u32, P, use_pallas=False
            )
        )(ct_limb)

        m0 = lb.zeros((glwe.size + 1, glwe.degree, B))
        one = np.zeros((glwe.size + 1, glwe.degree, 1), dtype=np.uint64)
        one[-1, :, 0] = np.uint64(1) << np.uint64(63)
        m1l = lb.from_u64_np(np.broadcast_to(one, (glwe.size + 1, glwe.degree, B)))
        out = jax.jit(
            lambda a, b: bu.cmux_u32(a, b, ggsw, glwe, P.cbs_radix, use_pallas=False)
        )(m0, m1l)
        out_u64 = jnp.asarray(lb.to_u64_np(out))
        for i, b in enumerate(bits):
            glwe_ct = bt.from_t_layout(out_u64)[i]
            dec = torus.decode(enc.decrypt_glwe(glwe_ct, glwe_sk, glwe), 1)
            np.testing.assert_array_equal(np.asarray(dec), b, err_msg=f"bit {i}")


    def test_cbs_pbs_radix_split(self, material):
        """A Params with a DISTINCT `cbs_pbs_radix` blind-rotates at
        that radix inside CBS (key generated at the same radix) and the
        GGSW outputs still select correctly — the production DEFAULT_128
        uses a narrower-digit CBS radix because the ds32 FFT-MAD error
        scales with digit magnitude (hardware-measured r5)."""
        import dataclasses

        from spf_tpu.ops import multibit as mb

        lwe_sk, glwe_sk, _, ak_coeff, ssk_coeff = material
        pp = dataclasses.replace(
            P, cbs_pbs_radix=RadixDecomposition(count=4, radix_log=8)
        )
        glwe = pp.l1_params
        B = 4
        bits = [1, 0, 1, 0]
        cts = jnp.stack(
            [
                enc.encrypt_lwe(k(300 + i), torus.encode(b, 1), lwe_sk, LWE)
                for i, b in enumerate(bits)
            ]
        )
        bsk_mb = mb.generate_multibit_bsk(
            k(6), lwe_sk, glwe_sk, glwe, pp.cbs_pbs_radix_eff, 2
        )
        bsk_mb_u32 = bu.bsk_to_freq_u32(np.asarray(bsk_mb))
        ak_u32 = bu.bsk_to_freq_u32(np.asarray(ak_coeff))
        ssk_u32 = bu.bsk_to_freq_u32(np.asarray(ssk_coeff))

        ct_limb = lb.from_u64_np(np.asarray(bt.to_t_layout(cts)))
        ggsw = jax.jit(
            lambda c: cu.circuit_bootstrap_u32(
                c, bsk_mb_u32, ak_u32, ssk_u32, pp, use_pallas=False
            )
        )(ct_limb)

        m0 = lb.zeros((glwe.size + 1, glwe.degree, B))
        one = np.zeros((glwe.size + 1, glwe.degree, 1), dtype=np.uint64)
        one[-1, :, 0] = np.uint64(1) << np.uint64(63)
        m1l = lb.from_u64_np(
            np.broadcast_to(one, (glwe.size + 1, glwe.degree, B))
        )
        out = jax.jit(
            lambda a, b: bu.cmux_u32(
                a, b, ggsw, glwe, pp.cbs_radix, use_pallas=False
            )
        )(m0, m1l)
        out_u64 = jnp.asarray(lb.to_u64_np(out))
        for i, b in enumerate(bits):
            glwe_ct = bt.from_t_layout(out_u64)[i]
            dec = torus.decode(enc.decrypt_glwe(glwe_ct, glwe_sk, glwe), 1)
            np.testing.assert_array_equal(np.asarray(dec), b, err_msg=f"bit {i}")


class TestMuxEvalU32:
    def test_u4_add_via_cbs_and_mux_eval(self, material):
        """Encrypted 4-bit add end-to-end on the u32 pipeline: L0 input
        bits -> scan-CBS -> GGSW spectra -> levelized batched cmux
        evaluation of the ripple adder -> decrypt (two instances packed
        on lanes). The TPU production path for encrypted programs."""
        from spf_tpu.circuits import integer as ic
        from spf_tpu.ops.mux_eval_u32 import evaluate_mux_circuit_u32

        lwe_sk, glwe_sk, bsk_coeff, ak_coeff, ssk_coeff = material
        glwe = P.l1_params
        n_bits = 4
        cases = [(5, 9), (12, 7)]
        ii = len(cases)

        # input-major bit order: sel index = input_idx * I + instance
        bit_list = []
        for idx in range(2 * n_bits):
            for a, b in cases:
                v = a if idx < n_bits else b
                bit_list.append((v >> (idx % n_bits)) & 1)
        cts = jnp.stack(
            [
                enc.encrypt_lwe(k(200 + i), torus.encode(b, 1), lwe_sk, LWE)
                for i, b in enumerate(bit_list)
            ]
        )
        bsk_u32 = bu.bsk_to_freq_u32(np.asarray(bsk_coeff))
        ak_u32 = bu.bsk_to_freq_u32(np.asarray(ak_coeff))
        ssk_u32 = bu.bsk_to_freq_u32(np.asarray(ssk_coeff))
        ct_limb = lb.from_u64_np(np.asarray(bt.to_t_layout(cts)))
        ggsw = jax.jit(
            lambda c: cu.circuit_bootstrap_u32(
                c, bsk_u32, ak_u32, ssk_u32, P, use_pallas=False
            )
        )(ct_limb)

        circuit = ic.ripple_carry_adder(n_bits, emit_carry=True)
        outs = evaluate_mux_circuit_u32(
            circuit, ggsw, glwe, P.cbs_radix, ii, use_pallas=False
        )
        for inst, (a, b) in enumerate(cases):
            got = 0
            for j, w in enumerate(outs):
                wire = jnp.asarray(lb.to_u64_np(w)[..., inst])
                phase = enc.decrypt_glwe(wire, glwe_sk, glwe)
                bit = int(torus.decode(phase, 1)[0])
                got |= bit << j
            assert got == a + b, (inst, a, b, got)
