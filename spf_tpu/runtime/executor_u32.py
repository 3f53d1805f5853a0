"""FheCircuit executor on the x64-free u32-limb TPU pipeline.

`CircuitExecutor` (executor.py) runs circuits on the u64/c128-or-ds32
path — correct everywhere, but u64 torus arrays cannot lower on TPU
without x64 mode. This executor runs the SAME `FheCircuit` graphs on
the u32-limb production pipeline (`ops/bootstrap_u32.py`,
`ops/cbs_u32.py`, `ops/keyswitch_u32.py`): every torus tensor is a
(hi, lo) u32 pair in coefficient-major t-layout with the gate batch on
vector lanes, so whole encrypted *programs* execute on TPU at
DEFAULT_128 — the reference's end-to-end workload
(≙ `parasol_runtime/src/circuit_processor/mod.rs` run_graph_blocking;
the TPU inversion is one batched kernel call per levelized wave,
SURVEY §7).

Boundary convention: inputs and outputs are HOST numpy u64 GLWE arrays
[k+1, N] (or LWE [n+1]) — u64 never enters the XLA graph, so the jitted
graph compiles with or without x64 and on TPU. Plug an instance of this
class into `FheComputer(ev, executor=...)` to run Parasol ELF programs
on the TPU pipeline.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import limb32 as lb
from ..ops.bootstrap_u32 import (
    bsk_to_freq_u32,
    external_product_u32,
    inv_limb,
    monomial_mul_u32,
    sample_extract_u32,
)
from ..ops.bootstrap_u32 import cmux_u32
from ..ops.cbs_u32 import circuit_bootstrap_u32
from ..ops.keyswitch_u32 import keyswitch_lwe_u32, ksk_to_byte_planes
from ..params import Params
from ..utils.profiling import metrics
from .fhe_circuit import CircuitError, FheCircuit, FheEdge, FheOp

U32 = jnp.uint32


@dataclasses.dataclass
class U32ComputeKey:
    """Frequency-domain key material for the u32 pipeline.

    bsk/auto/ssk freq: tuples of 4 f32 arrays (ds32 real/imag pairs) as
    produced by `bsk_to_freq_u32`; ksk as MXU byte planes; GGSW(0)/
    GGSW(1) constants (≙ the reference's precomputed trivial-bit GGSWs,
    `evaluation.rs:161-196`) in frequency form [k+1, l, k+1, K].
    """

    bsk_freq: tuple
    ak_freq: tuple
    ssk_freq: tuple
    ksk_planes: jnp.ndarray
    ggsw_zero_freq: tuple
    ggsw_one_freq: tuple
    # FFT backend whose frequency ORDER the spectra above use
    # (False = XLA ds32, True = Pallas; the two orders differ, so
    # executors must compute with the SAME backend — advisor r4)
    use_pallas: bool = False

    @classmethod
    def from_coeff(
        cls, bsk, ak, ssk, ksk, ggsw_zero, ggsw_one, use_pallas=False
    ) -> "U32ComputeKey":
        """Build from coefficient-domain u64 numpy key arrays."""
        f = lambda x: bsk_to_freq_u32(np.asarray(x), use_pallas=use_pallas)
        return cls(
            bsk_freq=f(bsk),
            ak_freq=f(ak),
            ssk_freq=f(ssk),
            ksk_planes=ksk_to_byte_planes(np.asarray(ksk)),
            ggsw_zero_freq=f(ggsw_zero),
            ggsw_one_freq=f(ggsw_one),
            use_pallas=use_pallas,
        )


def _role(ins, role):
    for src, r in ins:
        if r == role:
            return src
    raise CircuitError(f"missing {role} input")


class U32HostEvaluation:
    """Minimal `Evaluation` stand-in binding `FheComputer` to the u32
    pipeline: the processor only needs `.params` and the two shared
    trivial GLWE bit handles (host numpy u64 — u64 never enters the XLA
    graph, so this works in x32 processes); all circuit execution goes
    through the `U32CircuitExecutor` passed as `FheComputer(...,
    executor=...)`."""

    class _Enc:
        def __init__(self, params: Params):
            glwe = params.l1_params
            z = np.zeros((glwe.size + 1, glwe.degree), dtype=np.uint64)
            o = z.copy()
            o[-1, 0] = np.uint64(1) << np.uint64(63)
            self._zero, self._one = z, o

        def trivial_glwe_l1_zero(self):
            return self._zero

        def trivial_glwe_l1_one(self):
            return self._one

    def __init__(self, params: Params):
        self.params = params
        self.enc = self._Enc(params)


# wire kinds carried between waves
_GLWE, _LWE1, _LWE0, _GGSW = "glwe", "lwe1", "lwe0", "ggsw"


class U32CircuitExecutor:
    """Level-synchronous batched executor over limb-pair wires.

    Compatible with `CircuitExecutor.run`'s (circuit, inputs) -> outputs
    contract so it drops into `FheComputer`; inputs/outputs are numpy
    u64 arrays (GLWE [k+1, N], LWE0 [n0+1]).
    """

    def __init__(self, key: U32ComputeKey, params: Params, use_pallas=None,
                 whole_circuit: bool = True):
        self.key = key
        self.params = params
        # default to the key's spectra backend (frequency orders differ
        # between the XLA and Pallas FFTs — advisor r4 finding)
        if use_pallas is None:
            use_pallas = getattr(key, "use_pallas", None)
        self.use_pallas = use_pallas
        self.debug = False
        self.debug_log: list = []
        # wave-size observability (VERDICT: average gate batch per
        # kernel call); list of (op, n_gates)
        self.wave_log: list = []
        self._jit_cache: dict = {}
        # whole-circuit mode: compile each distinct circuit STRUCTURE
        # into ONE donated jit program (≙ the reference scheduler's
        # spawn-everything overlap, `circuit_processor/mod.rs:573-623`,
        # re-expressed as one XLA program). The per-wave mode remains as
        # `whole_circuit=False` for bounded compile time on one-shot
        # circuits.
        self.whole_circuit = whole_circuit
        self._circuit_jit_cache: dict = {}

    # -- public API ----------------------------------------------------

    def run(self, circuit: FheCircuit, inputs: dict) -> dict:
        """inputs: {param: numpy u64 array} (GLWE [k+1, N] or LWE0
        [n0+1]). Returns {output param: numpy u64 array}.

        Execution model: the graph walk is host-driven. In
        whole-circuit mode (default) the walk happens at TRACE time and
        the entire levelized circuit compiles into one donated jit
        executable, cached by circuit structure — one device dispatch
        per flush instead of one per wave (the relay dispatch floor is
        ~26 ms, so per-wave dispatch dominated whole-program latency).
        With `whole_circuit=False` each wave dispatches one jitted
        kernel whose lane width is padded to the next power of two, so
        the set of compiled executables is tiny and SHARED across
        circuits — bounded compile time for one-shot circuits."""
        circuit.validate()
        in_params = {
            n.param for n in circuit.nodes if n.op.value.startswith("input_")
        }
        limb_inputs = {
            p: lb.from_u64_np(np.asarray(inputs[p])) for p in in_params
        }
        if self.whole_circuit:
            out = self._run_compiled(circuit, limb_inputs)
        else:
            out = self._run_limb(circuit, limb_inputs)
        return {
            p: lb.to_u64_np(jax.device_get(v)) for p, v in out.items()
        }

    @staticmethod
    def _circuit_key(circuit: FheCircuit, shapes) -> tuple:
        nodes = tuple(
            (n.op.value, n.param if isinstance(n.param, (int, str, type(None)))
             else repr(n.param))
            for n in circuit.nodes
        )
        return (nodes, tuple(circuit.edges), shapes)

    def _run_compiled(self, circuit: FheCircuit, limb_inputs: dict) -> dict:
        """One donated jit per distinct circuit structure (trace runs
        `_run_limb`, so wave stats log once per compile, not per run)."""
        names = sorted(limb_inputs)
        shapes = tuple(
            (n,) + tuple(limb_inputs[n][0].shape) for n in names
        )
        ck = self._circuit_key(circuit, shapes)
        fn = self._circuit_jit_cache.get(ck)
        if fn is None:
            def traced(vals):
                return self._run_limb(
                    circuit, {n: v for n, v in zip(names, vals)}
                )

            fn = jax.jit(traced, donate_argnums=0)
            self._circuit_jit_cache[ck] = fn
            metrics.inc("u32exec.circuit_compiles")
        # inputs are freshly device_put per run, so donation is safe
        return fn([limb_inputs[n] for n in names])

    def _kernel(self, name, fn):
        """One jitted callable per op kind; jax specializes/caches per
        input shape, and power-of-two lane padding bounds the shape set."""
        k = self._jit_cache.get(name)
        if k is None:
            k = self._jit_cache[name] = jax.jit(fn)
        return k

    @staticmethod
    def _pad_lanes(t, width):
        """Pad component tuple's trailing lane axis to `width` by edge
        repetition."""
        cur = t[0].shape[-1]
        if cur == width:
            return t
        pad = [(0, 0)] * (t[0].ndim - 1) + [(0, width - cur)]
        return tuple(jnp.pad(c, pad, mode="edge") for c in t)

    # -- graph execution (limb domain, host-driven waves) ---------------

    def _run_limb(self, circuit: FheCircuit, limb_inputs: dict) -> dict:
        p = self.params
        glwe = p.l1_params
        levels = circuit.levelize()
        preds: dict[int, list] = {}
        refcount: dict[int, int] = {}
        for s, d, r in circuit.edges:
            preds.setdefault(d, []).append((s, r))
            refcount[s] = refcount.get(s, 0) + 1

        values: dict[int, tuple] = {}  # node -> (kind, limb-or-freq)
        outputs: dict = {}

        def take(src):
            v = values[src]
            refcount[src] -= 1
            if refcount[src] == 0:
                del values[src]
            return v

        def stack(tuples):
            """Stack component tuples (limb pairs OR 4-component freq
            tuples) [..., 1] along the trailing lane axis."""
            n_comp = len(tuples[0])
            return tuple(
                jnp.concatenate([x[c] for x in tuples], axis=-1)
                for c in range(n_comp)
            )

        def unstack(node_ids, kind, out):
            for j, nid in enumerate(node_ids):
                values[nid] = (kind, tuple(c[..., j : j + 1] for c in out))

        def const_glwe(bit):
            kp1, n = glwe.size + 1, glwe.degree
            hi = jnp.zeros((kp1, n, 1), dtype=U32)
            lo = jnp.zeros((kp1, n, 1), dtype=U32)
            if bit:
                hi = hi.at[-1, 0, :].set(U32(0x80000000))
            return (hi, lo)

        def const_ggsw(bit):
            src = self.key.ggsw_one_freq if bit else self.key.ggsw_zero_freq
            return tuple(c[..., None] for c in src)

        for level in levels:
            groups: dict[tuple, list[int]] = {}
            for nid in level:
                node = circuit.nodes[nid]
                gkey = (node.op, node.param if node.op in (
                    FheOp.SAMPLE_EXTRACT, FheOp.MUL_XN
                ) else None)
                groups.setdefault(gkey, []).append(nid)
            for (op, gparam), nids in groups.items():
                self._exec_group(
                    circuit, op, gparam, nids, preds, take, stack, unstack,
                    const_glwe, const_ggsw, values, limb_inputs, outputs,
                )
        return outputs

    def _exec_group(
        self, circuit, op, gparam, nids, preds, take, stack, unstack,
        const_glwe, const_ggsw, values, limb_inputs, outputs,
    ):
        p = self.params
        glwe = p.l1_params
        g = len(nids)
        if op not in (FheOp.RETIRE, FheOp.NOP):
            self.wave_log.append((op.value, g))
            metrics.inc(f"u32exec.gates.{op.value}", g)

        pad_w = 1 << (g - 1).bit_length()  # pow-2 lane padding

        def gather(role, want_kind=None):
            vals = [take(_role(preds.get(i, []), role)) for i in nids]
            kinds = {k for k, _ in vals}
            assert len(kinds) == 1, f"mixed wire kinds {kinds} into {op}"
            if want_kind is not None:
                assert kinds == {want_kind}, (op, kinds)
            return self._pad_lanes(stack([v for _, v in vals]), pad_w)

        if op.value.startswith("input_"):
            kind = {
                FheOp.INPUT_GLWE1: _GLWE,
                FheOp.INPUT_LWE0: _LWE0,
                FheOp.INPUT_LWE1: _LWE1,
            }.get(op)
            if kind is None:
                raise CircuitError(f"{op} unsupported on the u32 pipeline")
            for nid in nids:
                v = limb_inputs[circuit.nodes[nid].param]
                if v[0].ndim == len(self._wire_shape(kind)) - 1:
                    v = tuple(c[..., None] for c in v)
                values[nid] = (kind, v)
        elif op.value.startswith("output_"):
            for nid in nids:
                src = _role(preds.get(nid, []), FheEdge.UNARY)
                kind, v = take(src)
                outputs[circuit.nodes[nid].param] = tuple(
                    c[..., 0] for c in v
                )
        elif op in (FheOp.RETIRE, FheOp.NOP):
            for nid in nids:
                ins = preds.get(nid, [])
                values[nid] = take(ins[0][0]) if ins else None
        elif op == FheOp.ZERO_GLWE1 or op == FheOp.ONE_GLWE1:
            v = const_glwe(op == FheOp.ONE_GLWE1)
            for nid in nids:
                values[nid] = (_GLWE, v)
        elif op == FheOp.ZERO_GGSW1 or op == FheOp.ONE_GGSW1:
            v = const_ggsw(op == FheOp.ONE_GGSW1)
            for nid in nids:
                values[nid] = (_GGSW, v)
        elif op == FheOp.NOT:
            x = gather(FheEdge.UNARY, _GLWE)

            def not_k(x):
                # keyless NOT: trivial(1) - x (`evaluation.rs:48`)
                neg = lb.neg(x)
                e_hi, e_lo = lb.encode_const(1, 1)
                b0 = lb.add_small((neg[0][-1, 0], neg[1][-1, 0]), e_hi, e_lo)
                return (
                    neg[0].at[-1, 0].set(b0[0]),
                    neg[1].at[-1, 0].set(b0[1]),
                )

            unstack(nids, _GLWE, self._kernel("not", not_k)(x))
        elif op == FheOp.GLWE_ADD:
            a = gather(FheEdge.LEFT, _GLWE)
            b = gather(FheEdge.RIGHT, _GLWE)
            unstack(nids, _GLWE, self._kernel("add", lb.add)(a, b))
        elif op == FheOp.CMUX:
            d0 = gather(FheEdge.LOW, _GLWE)
            d1 = gather(FheEdge.HIGH, _GLWE)
            sel = gather(FheEdge.SEL, _GGSW)
            out = self._kernel(
                "cmux",
                lambda a, b, s: cmux_u32(
                    a, b, s, glwe, p.cbs_radix, self.use_pallas
                ),
            )(d0, d1, sel)
            unstack(nids, _GLWE, out)
        elif op == FheOp.MULTIPLY_GGSW_GLWE:
            x = gather(FheEdge.GLWE, _GLWE)
            sel = gather(FheEdge.GGSW, _GGSW)
            prod = self._kernel(
                "extprod",
                lambda a, s: inv_limb(
                    external_product_u32(
                        a, s, glwe, p.cbs_radix, self.use_pallas
                    ),
                    self.use_pallas,
                ),
            )(x, sel)
            unstack(nids, _GLWE, prod)
        elif op == FheOp.SAMPLE_EXTRACT:
            x = gather(FheEdge.UNARY, _GLWE)
            h = gparam or 0
            out = self._kernel(
                ("se", h), lambda a: sample_extract_u32(a, h, glwe)
            )(x)
            unstack(nids, _LWE1, out)
        elif op == FheOp.KEYSWITCH_L1_L0:
            x = gather(FheEdge.UNARY, _LWE1)
            out = self._kernel(
                "ks",
                lambda a: keyswitch_lwe_u32(
                    a, self.key.ksk_planes, glwe.as_lwe_def(), p.l0_params,
                    p.ks_radix,
                ),
            )(x)
            unstack(nids, _LWE0, out)
        elif op == FheOp.CIRCUIT_BOOTSTRAP:
            x = gather(FheEdge.UNARY, _LWE0)
            out = self._kernel(
                "cbs",
                lambda a: circuit_bootstrap_u32(
                    a, self.key.bsk_freq, self.key.ak_freq,
                    self.key.ssk_freq, p, use_pallas=self.use_pallas,
                ),
            )(x)
            unstack(nids, _GGSW, out)
        elif op == FheOp.MUL_XN:
            x = gather(FheEdge.UNARY, _GLWE)
            n_pow = gparam or 0
            out = self._kernel(
                ("mulxn", n_pow),
                lambda a: monomial_mul_u32(
                    a, jnp.full((a[0].shape[-1],), n_pow, dtype=U32)
                ),
            )(x)
            unstack(nids, _GLWE, out)
        else:
            raise CircuitError(
                f"{op} not supported on the u32 pipeline (GLEV-mode ops"
                " run on the u64 CircuitExecutor)"
            )

    def _wire_shape(self, kind):
        p = self.params
        glwe = p.l1_params
        if kind == _GLWE:
            return (glwe.size + 1, glwe.degree, 1)
        if kind == _LWE1:
            return (glwe.size * glwe.degree + 1, 1)
        if kind == _LWE0:
            return (p.l0_params.dim + 1, 1)
        raise CircuitError(kind)

    # -- observability ---------------------------------------------------

    def wave_stats(self) -> dict:
        """Gate-batch statistics per op (the cross-instruction
        parallelism evidence: average CMUX wave width per kernel call)."""
        from collections import defaultdict

        agg = defaultdict(list)
        for op, g in self.wave_log:
            agg[op].append(g)
        return {
            op: {
                "waves": len(gs),
                "gates": int(np.sum(gs)),
                "mean_batch": round(float(np.mean(gs)), 1),
                "max_batch": int(np.max(gs)),
            }
            for op, gs in agg.items()
        }
