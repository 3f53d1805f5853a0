#!/usr/bin/env python
"""basic_add — the canonical end-to-end example (≙ reference
`examples/basic_add`): Alice encrypts two u8 values; an untrusted
compute party (holding only the compute key) runs the encrypted adder;
Alice decrypts the result.

Usage: python examples/basic_add.py [a] [b]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

if os.environ["JAX_PLATFORMS"] == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from spf_tpu.params import GlweDef, LweDef, Params, RadixDecomposition
from spf_tpu.runtime import Evaluation, generate_keys
from spf_tpu.runtime.executor import CircuitExecutor
from spf_tpu.runtime.fluent import FheCircuitCtx, UInt

# A reduced parameter set so the example runs in seconds on CPU; swap in
# spf_tpu.params.DEFAULT_128 for the production 128-bit set.
PARAMS = Params(
    l0_params=LweDef(dim=128, std=1e-16),
    l1_params=GlweDef(size=1, degree=256, std=1e-16),
    cbs_radix=RadixDecomposition(count=2, radix_log=9),
    pbs_radix=RadixDecomposition(count=2, radix_log=16),
    ks_radix=RadixDecomposition(count=9, radix_log=4),
    pfks_radix=RadixDecomposition(count=4, radix_log=11),
    ss_radix=RadixDecomposition(count=6, radix_log=8),
    tr_radix=RadixDecomposition(count=6, radix_log=7),
)


def main():
    a_val = int(sys.argv[1]) if len(sys.argv) > 1 else 42
    b_val = int(sys.argv[2]) if len(sys.argv) > 2 else 54

    print("generating keys...")
    t0 = time.time()
    sk, pk, ck = generate_keys(jax.random.key(0), PARAMS)
    print(f"  keygen: {time.time() - t0:.1f}s")

    # --- Alice: encrypt ---
    ev = Evaluation(ck, PARAMS)
    cts = ev.enc.encrypt_uint_bits(jax.random.key(1), a_val, 8, sk)
    cts += ev.enc.encrypt_uint_bits(jax.random.key(2), b_val, 8, sk)

    # --- compute party: build + run the encrypted adder ---
    ctx = FheCircuitCtx()
    a = UInt.input(ctx, 8)
    b = UInt.input(ctx, 8)
    out_keys = (a + b).output()
    ex = CircuitExecutor(ev)
    inputs = dict(zip(a.input_keys() + b.input_keys(), cts))
    t0 = time.time()
    outputs = ex.run(ctx.circuit, inputs)
    print(f"  encrypted add: {time.time() - t0:.1f}s")

    # --- Alice: decrypt ---
    result = ev.enc.decrypt_uint_bits([outputs[k] for k in out_keys], sk)
    print(f"{a_val} + {b_val} = {result} (mod 256)")
    assert result == (a_val + b_val) % 256


if __name__ == "__main__":
    main()
