"""L1 -> L0 LWE keyswitch for the x32 limb pipeline, as MXU matmuls.

The reference computes `out = trivial(b) - Σ_i <decomp(a_i), LEV_i>`
with exact u64 arithmetic (`lwe_keyswitch.rs:23-60`); the u64 einsum
cannot lower on TPU. TPU-native design:

- gadget digits for `ks_radix` (log B = 2) lie in [-2, 2) — exact in
  bf16;
- the key is byte-sliced: each u64 entry becomes 8 unsigned byte
  planes, exact in bf16 (integers <= 255);
- the contraction Σ_{i,j} digit[j,i] · ksk[i,j,m] becomes ONE
  [B, n·l] x [n·l, m·8] matmul per limb on the MXU with f32
  accumulation — exact, since |digit·byte·n·l| <= 2·255·12288 < 2^24;
- byte-plane sums (signed, < 2^24) are recombined mod 2^64 through a
  ds32 float pair and `limb32.from_ds` (exact staged power-of-two
  reduction; residual error <= 2^16, far below the keyswitch noise).

Digit magnitudes up to 2^7 (radix_log <= 8) keep the accumulation
exact for n·l <= 2^13; assert guards the bound.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..params import LweDef, RadixDecomposition
from . import limb32 as lb

F32 = jnp.float32


def ksk_to_byte_planes(ksk_np):
    """Host-side: u64 keyswitch key [n_old, l, n_new+1] -> bf16 byte
    planes [n_old*l, (n_new+1)*8] (plane-major per output column)."""
    n_old, count, m = ksk_np.shape
    planes = np.empty((n_old * count, m, 8), dtype=np.float32)
    flat = np.ascontiguousarray(ksk_np.reshape(n_old * count, m))
    for k in range(8):
        planes[:, :, k] = ((flat >> np.uint64(8 * k)) & np.uint64(0xFF)).astype(
            np.float32
        )
    return jnp.asarray(
        planes.reshape(n_old * count, m * 8).astype(np.float32), dtype=jnp.bfloat16
    )


def keyswitch_lwe_u32(
    ct,
    ksk_planes,
    old_lwe: LweDef,
    new_lwe: LweDef,
    radix: RadixDecomposition,
):
    """ct limb pair [n_old+1, B] -> limb pair [n_new+1, B]
    (≙ `keyswitch.keyswitch_lwe_to_lwe`). `ksk_planes` from
    `ksk_to_byte_planes`."""
    n_old, count = old_lwe.dim, radix.count
    m = new_lwe.dim + 1
    assert (1 << (radix.radix_log - 1)) * 255 * n_old * count < (1 << 24), (
        "byte-plane accumulation would lose bits in f32"
    )
    a = (ct[0][:-1], ct[1][:-1])  # [n_old, B]
    b = (ct[0][-1], ct[1][-1])  # [B]
    digits = lb.decompose(a, radix)  # i32 [l, n_old, B]
    d2 = digits.transpose(2, 1, 0).reshape(-1, n_old * count)  # [B, n_old*l]
    # exact bf16 inputs, f32 accumulation on the MXU
    sums = jnp.dot(
        d2.astype(jnp.bfloat16), ksk_planes, preferred_element_type=F32
    )  # [B, m*8]
    s = sums.reshape(-1, m, 8)  # signed plane sums, |.| < 2^24
    # recombine Σ_k s_k·2^(8k) mod 2^64 via a ds32 pair (exact shifts;
    # the two_sum chain keeps ~48 bits - residual ≪ keyswitch noise)
    hi = jnp.zeros(s.shape[:2], F32)
    lo = jnp.zeros(s.shape[:2], F32)
    from . import ds

    for k in range(8):
        term = s[:, :, k] * F32(2.0 ** (8 * k))
        hi, e = ds.two_sum(hi, term)
        lo = lo + e
    hi, lo = ds.quick_two_sum(hi, lo)
    acc = lb.from_ds(hi, lo)  # [B, m] limb pair of the a-side sum
    acc = (acc[0].T, acc[1].T)  # [m, B]
    out = lb.neg(acc)
    row = lb.add((out[0][-1], out[1][-1]), b)
    return (out[0].at[-1].set(row[0]), out[1].at[-1].set(row[1]))
