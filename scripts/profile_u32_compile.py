#!/usr/bin/env python
"""Time each stage of the u32 PBS test to find the slow component."""
import os, sys, time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

t0 = time.time()


def t(msg):
    global t0
    print(f"{time.time()-t0:7.1f}s  {msg}", flush=True)
    t0 = time.time()


from spf_tpu.ops import bootstrap, bootstrap_tpu as bt, bootstrap_u32 as bu
from spf_tpu.ops import encryption as enc, limb32 as lb, torus
from spf_tpu.params import GlweDef, LweDef, RadixDecomposition

t("imports")
KEY = jax.random.key(77)
LWE = LweDef(dim=64, std=1e-16)
GLWE = GlweDef(size=1, degree=128, std=1e-16)
RADIX = RadixDecomposition(count=2, radix_log=16)
k = lambda i: jax.random.fold_in(KEY, i)

lwe_sk = enc.generate_lwe_sk(k(0), LWE)
glwe_sk = enc.generate_glwe_sk(k(1), GLWE)
keys = jax.random.split(k(2), LWE.dim)
rows = [
    enc.encrypt_ggsw_scalar(keys[i], lwe_sk[i], glwe_sk, GLWE, RADIX)
    for i in range(LWE.dim)
]
bsk_coeff = jnp.stack(rows, 0)
jax.block_until_ready(bsk_coeff)
t("fixture (64 ggsw)")

bsk_t = bt.bsk_to_t(bsk_coeff)
jax.block_until_ready(bsk_t)
t("bsk_to_t")

bsk_u32 = bu.bsk_to_freq_u32(np.asarray(bsk_coeff))
jax.block_until_ready(bsk_u32)
t("bsk_to_freq_u32")

lut = bootstrap.generate_lut([lambda x: (x * 3 + 1) % 8], GLWE, 3)
msgs = jnp.arange(8, dtype=jnp.uint64)
cts = jax.vmap(
    lambda kk, m: enc.encrypt_lwe(kk, torus.encode(m, 4), lwe_sk, LWE)
)(jax.random.split(k(3), 8), msgs)
jax.block_until_ready(cts)
t("encrypt inputs")

f_t = jax.jit(lambda c: bt.programmable_bootstrap_t(c, lut, bsk_t, LWE, GLWE, RADIX))
o1 = f_t(bt.to_t_layout(cts))
jax.block_until_ready(o1)
t("u64 t-layout PBS jit+run")

lut_limb = lb.from_u64_np(np.asarray(lut))
cts_t = np.asarray(bt.to_t_layout(cts))
f_u = jax.jit(
    lambda c: bu.programmable_bootstrap_u32(
        c, lut_limb, bsk_u32, LWE, GLWE, RADIX, use_pallas=False
    )
)
o2 = f_u(lb.from_u64_np(cts_t))
jax.block_until_ready(o2)
t("u32 PBS jit+run")
print("OK")
