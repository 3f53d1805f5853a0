"""DEFAULT_128 noise-margin regression (real noise, production radices).

Every other CPU test runs sigma = 1e-16 (noise-free); real-noise margins
were previously only checked by the hardware bench. This test runs the
PRODUCTION u32-limb pipeline (ds32 FFT arithmetic included) at the real
DEFAULT_128 radix configuration and asserts positive noise margin at
each point of the conversion cycle (≙ the reference's op_noise example,
`parasol_runtime/examples/op_noise/main.rs:37-66`, and its params noise
model `parasol_runtime/src/params.rs:103-106`):

  - after the (multi-bit) PBS                 (prod margin ~10.8 bits)
  - after CBS -> CMux -> sample extract (L1)
  - after the L1 -> L0 LWE keyswitch          (prod margin ~2.8 bits,
                                               the tightest point)

Cost control: full-n0 keygen takes ~2 min on this host and the blind
rotation scales with n0, so the test uses n0 = 160 with the GLWE noise
scaled UP by sqrt(637/160): the accumulated bootstrap noise variance is
proportional to n0 * sigma_glwe^2, so the PBS/CBS outputs carry the
same noise magnitude as production DEFAULT_128. All radices, N = 2048,
k = 1, and sigma_l0 are exactly DEFAULT_128's; only the blind-rotation
step count is reduced (and with it the mod-switch rounding variance,
~ n0 * (2N/q)^2 / 12 — worth ~0.7 bits of extra margin here, covered by
the assertion slack). A radix/params misconfiguration of the kind this
test guards against shifts margins by far more than the slack.

Keys cache to .keys_cache/test_noise_*.npz so reruns skip the ~90 s
keygen.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spf_tpu.ops import bootstrap, bootstrap_u32 as bu, cbs_u32 as cu
from spf_tpu.ops import encryption as enc, keyswitch as ks_mod, limb32 as lb
from spf_tpu.ops import multibit as mb
from spf_tpu.ops.keyswitch_u32 import keyswitch_lwe_u32, ksk_to_byte_planes
from spf_tpu.ops.scheme_switch import generate_scheme_switch_key
from spf_tpu.params import DEFAULT_128, GlweDef, LweDef, Params

N0 = 160  # reduced blind-rotation length (see module docstring)
SIGMA_SCALE = float(np.sqrt(DEFAULT_128.l0_params.dim / N0))
GLWE = GlweDef(size=1, degree=2048, std=7e-16 * SIGMA_SCALE)
P = Params(
    l0_params=LweDef(dim=N0, std=DEFAULT_128.l0_params.std),
    l1_params=GLWE,
    cbs_radix=DEFAULT_128.cbs_radix,
    pbs_radix=DEFAULT_128.pbs_radix,
    ks_radix=DEFAULT_128.ks_radix,
    pfks_radix=DEFAULT_128.pfks_radix,
    ss_radix=DEFAULT_128.ss_radix,
    tr_radix=DEFAULT_128.tr_radix,
)
GROUP = 2  # production CBS multi-bit group default
B = 8
CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".keys_cache"
)


def _gen_material():
    path = os.path.join(CACHE, f"test_noise_n{N0}_g{GROUP}.npz")
    if os.path.exists(path):
        d = np.load(path)
        return {k: d[k] for k in d.files}
    key = jax.random.key(20260820)
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    lwe_sk = enc.generate_lwe_sk(k1, P.l0_params)
    glwe_sk = enc.generate_glwe_sk(k2, GLWE)
    bskmb = mb.generate_multibit_bsk(k3, lwe_sk, glwe_sk, GLWE, P.pbs_radix, GROUP)
    ak = ks_mod.generate_automorphism_keys(k4, glwe_sk, GLWE, P.tr_radix, be=None)
    ssk = generate_scheme_switch_key(k5, glwe_sk, GLWE, P.ss_radix, be=None)
    ksk = ks_mod.generate_lwe_keyswitch_key(
        k6, enc.glwe_sk_to_lwe_sk(glwe_sk), lwe_sk,
        GLWE.as_lwe_def(), P.l0_params, P.ks_radix,
    )
    out = {
        "lwe_sk": np.asarray(lwe_sk), "glwe_sk": np.asarray(glwe_sk),
        "bskmb": np.asarray(bskmb), "ak": np.asarray(ak),
        "ssk": np.asarray(ssk), "ksk": np.asarray(ksk),
    }
    os.makedirs(CACHE, exist_ok=True)
    np.savez(path, **out)
    return out


@pytest.fixture(scope="module")
def material():
    t0 = time.time()
    m = _gen_material()
    m["bskmb_freq"] = bu.bsk_to_freq_u32(m["bskmb"], use_pallas=False)
    m["ak_freq"] = bu.bsk_to_freq_u32(m["ak"], use_pallas=False)
    m["ssk_freq"] = bu.bsk_to_freq_u32(m["ssk"], use_pallas=False)
    m["ksk_planes"] = ksk_to_byte_planes(m["ksk"])
    print(f"material ready in {time.time() - t0:.0f}s")
    return m


def _encrypt_l0(rng, msgs, plain_bits, lwe_sk_np):
    """Real-noise L0 LWE encryption (host numpy), t-layout limb pair."""
    lwe = P.l0_params
    a = rng.integers(0, 1 << 64, size=(len(msgs), lwe.dim), dtype=np.uint64)
    e = np.round(rng.normal(0.0, lwe.std * 2.0**64, size=len(msgs))).astype(
        np.int64
    ).astype(np.uint64)
    m = np.asarray(msgs, np.uint64) << np.uint64(64 - plain_bits)
    b = (a * lwe_sk_np[None, :]).sum(axis=1, dtype=np.uint64) + m + e
    return lb.from_u64_np(np.concatenate([a, b[:, None]], axis=1).T)


def _margin_bits(phase, expected_enc, boundary_log2):
    err = (phase - expected_enc).astype(np.int64)
    worst = max(float(np.abs(err).max()), 1.0)
    return boundary_log2 - np.log2(worst)


class TestNoiseMarginsDefault128:
    def test_pbs_margin(self, material):
        m = material
        rng = np.random.default_rng(1)
        bits = 3
        msgs = np.arange(B, dtype=np.uint64) % 8
        cts = _encrypt_l0(rng, msgs, bits + 1, m["lwe_sk"])
        lut = lb.from_u64_np(
            bootstrap.generate_lut_np([lambda x: (x + 1) % 8], GLWE, bits)
        )
        out = jax.jit(
            lambda c: mb.programmable_bootstrap_multibit_u32(
                c, lut, m["bskmb_freq"], P.l0_params, GLWE, P.pbs_radix,
                GROUP, use_pallas=False,
            )
        )(cts)
        out_np = lb.to_u64_np(jax.device_get(out)).T  # [B, kN+1]
        sk_flat = m["glwe_sk"].reshape(-1)
        phase = out_np[:, -1] - (out_np[:, :-1] * sk_flat[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        expected = ((msgs + 1) % 8).astype(np.uint64) << np.uint64(64 - bits)
        margin = _margin_bits(phase, expected, 64 - bits - 1)
        print(f"PBS margin: {margin:.1f} bits")
        # production hardware margin is ~10.8 bits at n0=637; the n0
        # reduction adds <1 bit back — anything under 6 signals a real
        # noise/radix regression
        assert margin >= 6.0, f"PBS noise margin too small: {margin:.1f}"
        # decrypt correctness
        rb = (phase >> np.uint64(64 - bits - 1)) & np.uint64(1)
        dec = ((phase >> np.uint64(64 - bits)) + rb) & np.uint64(7)
        assert (dec == (msgs + 1) % 8).all()

    @pytest.mark.skipif(
        not os.environ.get("SPF_SLOW_TESTS"),
        reason="~13 min on CPU (full DEFAULT_128 CBS cycle); set"
        " SPF_SLOW_TESTS=1 to run. The PBS-margin test above covers the"
        " dominant noise source in the default suite; cycle margins are"
        " also decrypt-verified on hardware by `bench.py --cbs`.",
    )
    def test_conversion_cycle_margins(self, material):
        m = material
        rng = np.random.default_rng(2)
        bits_in = (np.arange(B) % 2).astype(np.uint64)
        cts = _encrypt_l0(rng, bits_in, 1, m["lwe_sk"])

        n1 = GLWE.degree
        m1_np = np.zeros((GLWE.size + 1, n1, B), dtype=np.uint64)
        m1_np[-1, :, :] = np.uint64(1) << np.uint64(63)
        m1 = lb.from_u64_np(m1_np)

        @jax.jit
        def cycle(c):
            ggsw = cu.circuit_bootstrap_u32(
                c, m["bskmb_freq"], m["ak_freq"], m["ssk_freq"], P,
                use_pallas=False,
            )
            m0 = lb.zeros((GLWE.size + 1, n1, c[0].shape[-1]))
            sel = bu.cmux_u32(m0, m1, ggsw, GLWE, P.cbs_radix, False)
            l1 = bu.sample_extract_u32(sel, 0, GLWE)
            l0 = keyswitch_lwe_u32(
                l1, m["ksk_planes"], GLWE.as_lwe_def(), P.l0_params, P.ks_radix
            )
            return l1, l0

        l1, l0 = cycle(cts)

        # L1 margin (after CBS -> CMux -> extract)
        l1_np = lb.to_u64_np(jax.device_get(l1)).T
        sk_flat = m["glwe_sk"].reshape(-1)
        ph1 = l1_np[:, -1] - (l1_np[:, :-1] * sk_flat[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        exp = bits_in << np.uint64(63)
        margin_l1 = _margin_bits(ph1, exp, 62)
        print(f"L1 margin (post CBS+CMux+extract): {margin_l1:.1f} bits")

        # L0 margin (after keyswitch — the production tightest point,
        # ~2.8 bits at full params)
        l0_np = lb.to_u64_np(jax.device_get(l0)).T
        ph0 = l0_np[:, -1] - (l0_np[:, :-1] * m["lwe_sk"][None, :]).sum(
            axis=1, dtype=np.uint64
        )
        margin_l0 = _margin_bits(ph0, exp, 62)
        print(f"L0 margin (post keyswitch): {margin_l0:.1f} bits")

        assert margin_l1 >= 3.0, f"L1 margin too small: {margin_l1:.1f}"
        assert margin_l0 >= 1.0, f"L0 margin too small: {margin_l0:.1f}"

        # decrypt correctness at both levels
        for ph in (ph1, ph0):
            rb = (ph >> np.uint64(62)) & np.uint64(1)
            dec = ((ph >> np.uint64(63)) + rb) & np.uint64(1)
            assert (dec == bits_in).all()
