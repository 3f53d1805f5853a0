#!/usr/bin/env python
"""op_noise — measure empirical noise distributions of FHE ops and write
JSON (≙ reference `parasol_runtime/examples/op_noise`).

Usage: python examples/op_noise.py [--out noise_analysis.json] [--depth 8]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

if os.environ["JAX_PLATFORMS"] == "cpu":
    jax.config.update("jax_platforms", "cpu")

from spf_tpu.params import GlweDef, LweDef, Params, RadixDecomposition
from spf_tpu.runtime import Evaluation, generate_keys
from spf_tpu.utils import noise

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
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="noise_analysis.json")
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--trials", type=int, default=4)
    args = ap.parse_args()

    key = jax.random.key(0)
    sk, _, ck = generate_keys(key, PARAMS)
    ev = Evaluation(ck, PARAMS, precompute_constants=False)

    results = []
    results.append(noise.measure_encryption_noise(key, sk, PARAMS).as_dict())
    results.append(noise.measure_keyswitch_noise(key, sk, ev, PARAMS).as_dict())
    results.extend(
        s.as_dict()
        for s in noise.measure_cmux_noise(
            key, sk, ev, PARAMS, depth=args.depth, trials=args.trials
        )
    )
    results.append(
        noise.measure_cbs_noise(key, sk, ev, PARAMS, trials=args.trials).as_dict()
    )

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    for r in results:
        print(f"{r['op']:>20}: log2(std)={r['log2_std']:7.2f} log2(max)={r['log2_max']:7.2f}")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
