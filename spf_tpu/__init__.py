"""spf_tpu — a TPU-native torus-FHE (TFHE) secure processing framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
Sunscreen's SPF stack (reference: Sunscreen-tech/spf):

- TFHE cryptographic kernel: LWE/GLWE/GLEV/GGSW ciphertexts, negacyclic
  FFT polynomial arithmetic, encryption, keyswitching, programmable and
  circuit bootstrapping, scheme switching, automorphisms/trace.
- Boolean circuit layer: CMux-gate circuits for integer arithmetic.
- Batched, level-synchronous circuit executor (XLA is the scheduler).
- An encrypted "Parasol" CPU that runs programs over encrypted data.

Design stance (vs. the Rust reference): never execute one gate; execute a
*batch* of identical FHE gates as one fused kernel under `jit`, and scale
by sharding ciphertext batches over a TPU mesh.

x64 mode is required for the u64 torus path; importing this package
enables it. The x64-free TPU production path (u32-limb torus arrays +
Pallas kernels, `ops/limb32.py` / `ops/bootstrap_u32.py`) opts out by
setting SPF_TPU_X32=1 in the environment before import — Mosaic kernels
cannot compile in x64 mode.
"""

import os as _os

import jax as _jax

if _os.environ.get("SPF_TPU_X32", "") != "1":
    _jax.config.update("jax_enable_x64", True)

from . import params  # noqa: E402,F401
from .params import (  # noqa: E402,F401
    DEFAULT_128,
    GLWE_1_1024_128,
    GLWE_1_2048_128,
    GLWE_1_512_128,
    GLWE_5_256_128,
    LWE_512_128,
    LWE_637_128,
    GlweDef,
    LweDef,
    Params,
    RadixDecomposition,
)

__version__ = "0.1.0"
