"""Level-synchronous batched circuit executor.

This replaces the reference's `CircuitProcessor` (rayon task-per-gate
dataflow engine, `circuit_processor/mod.rs:62-656`) with the TPU-native
inversion: the circuit is levelized once (host side), every level's
gates are grouped by op kind, and each group executes as ONE batched
kernel call. XLA is the scheduler; `jit` compiles the whole circuit into
a single program.

`CircuitExecutor.compile` returns a jittable function from input
ciphertexts to output ciphertexts.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.profiling import metrics
from .evaluation import Evaluation
from .fhe_circuit import CircuitError, CtType, FheCircuit, FheEdge, FheOp, OUTPUT_TYPE


def _role(ins, role):
    for src, r in ins:
        if r == role:
            return src
    raise CircuitError(f"missing {role} input")


class CircuitExecutor:
    def __init__(self, ev: Evaluation, debug: bool = False):
        self.ev = ev
        self.be = ev.be
        # `debug` records each dispatched batched group (≙ the reference's
        # `debug` cargo feature ring of completed task ids,
        # `circuit_processor/mod.rs:35-42`, and its trace log lines)
        self.debug = debug
        self.debug_log: list = []
        # set to a `utils.profiling.WaveProfiler` to collect per-wave
        # blocking timings during `run`
        self.profiler = None

    # --- constants ---

    def _const(self, op: FheOp):
        ev = self.ev
        enc = ev.enc
        n = ev.params.l1_params.degree
        if op == FheOp.ZERO_LWE0:
            return enc.trivial_lwe_l0(0)
        if op == FheOp.ONE_LWE0:
            return enc.trivial_lwe_l0(1)
        if op == FheOp.ZERO_GLWE1:
            return enc.trivial_glwe_l1_zero()
        if op == FheOp.ONE_GLWE1:
            return enc.trivial_glwe_l1_one()
        if op == FheOp.ZERO_GGSW1:
            return ev.ggsw_zero
        if op == FheOp.ONE_GGSW1:
            return ev.ggsw_one
        if op == FheOp.ZERO_GLEV1:
            return enc.trivial_glev_l1(jnp.zeros((n,), dtype=jnp.uint64))
        if op == FheOp.ONE_GLEV1:
            return enc.trivial_glev_l1(jnp.zeros((n,), dtype=jnp.uint64).at[0].set(1))
        raise CircuitError(f"not a constant: {op}")

    # --- execution ---

    def run(self, circuit: FheCircuit, inputs: dict) -> dict:
        """Execute a (validated) circuit. `inputs` maps the `param` key
        of each INPUT_* node to its ciphertext. Returns {output param
        key: ciphertext}. Jit-safe: wrap in jax.jit via `compile`.

        Liveness: each node's value is dropped as soon as its last
        consumer has read it, bounding peak memory to the widest live
        frontier instead of the whole circuit (≙ the reference's Retire
        op + flow control, `circuit_processor/mod.rs:83-99`)."""
        circuit.validate()
        levels = circuit.levelize()
        preds: dict[int, list] = {}
        refcount: dict[int, int] = {}
        for s, d, r in circuit.edges:
            preds.setdefault(d, []).append((s, r))
            refcount[s] = refcount.get(s, 0) + 1

        values: dict[int, object] = {}
        outputs: dict[object, object] = {}
        profiler = getattr(self, "profiler", None)

        for li, level in enumerate(levels):
            # group same-kind gates into one batched call
            groups: dict[tuple, list[int]] = {}
            for node_id in level:
                node = circuit.nodes[node_id]
                groups.setdefault((node.op, node.param), []).append(node_id)
            for (op, param), node_ids in groups.items():
                if self.debug:
                    self.debug_log.append((op.value, param, len(node_ids)))
                metrics.inc(f"executor.gates.{op.value}", len(node_ids))
                if profiler is not None:
                    import time as _time

                    import jax as _jax

                    t0 = _time.perf_counter()
                    self._exec_group(
                        circuit, op, param, node_ids, preds, refcount, values,
                        inputs, outputs,
                    )
                    # block on this wave's freshly produced values so the
                    # recorded time is the wave's own device time
                    fresh = [values[n] for n in node_ids if n in values]
                    if fresh:
                        _jax.block_until_ready(fresh)
                    profiler.record(
                        li, op.value, param, len(node_ids),
                        _time.perf_counter() - t0,
                    )
                else:
                    self._exec_group(
                        circuit, op, param, node_ids, preds, refcount, values,
                        inputs, outputs,
                    )
        return outputs

    def compile(self, circuit: FheCircuit, donate: bool = False):
        """Compile the circuit to a cached XLA executable: returns
        fn(inputs_dict) -> outputs_dict, jitted, with the traced
        executable cached on this executor keyed by circuit structure —
        a second call with the same topology skips tracing entirely
        (≙ the reference compiles nothing; this is the TPU-native
        'FheCircuit is a program' design, SURVEY §7 step 8).

        `donate=True` donates the input ciphertext buffers to XLA
        (`donate_argnums`), letting buffer assignment reuse their HBM
        for intermediates — the analog of the reference's Retire-driven
        reclamation for *inputs*. Only safe when the caller does not
        read the inputs after the call (the deferred-graph processor,
        for instance, keeps register-held ciphertexts across flushes and
        must NOT donate)."""
        import jax

        circuit.validate()
        key = (
            tuple((n.op, n.param) for n in circuit.nodes),
            tuple(circuit.edges),
            donate,
        )
        cache = getattr(self, "_compile_cache", None)
        if cache is None:
            cache = self._compile_cache = {}
        fn = cache.get(key)
        if fn is None:
            fn = jax.jit(
                lambda inputs: self.run(circuit, inputs),
                donate_argnums=(0,) if donate else (),
            )
            cache[key] = fn
        return fn

    def _exec_group(
        self, circuit, op, param, node_ids, preds, refcount, values, inputs, outputs
    ):
        ev = self.ev
        be = self.be

        def take(src):
            v = values[src]
            refcount[src] -= 1
            if refcount[src] == 0:
                del values[src]
            return v

        def gather(role, freq=False):
            srcs = [_role(preds.get(i, []), role) for i in node_ids]
            vals = [take(s) for s in srcs]
            if len(vals) == 1:
                return vals[0], False
            # pad the wave to the next power of two (repeating the last
            # element) so the jitted op cache (`Evaluation._jitted`)
            # sees a bounded set of batch shapes — at most log2(max
            # wave) executables per op instead of one per distinct width
            g = len(vals)
            pad = (1 << (g - 1).bit_length()) - g
            vals = vals + [vals[-1]] * pad
            if freq:
                return be.stack(vals, axis=0), True
            return jnp.stack(vals, axis=0), True

        def scatter(result, batched):
            if not batched:
                values[node_ids[0]] = result
                return
            for i, node_id in enumerate(node_ids):
                values[node_id] = result[i]

        if op.value.startswith("input_"):
            for node_id in node_ids:
                key = circuit.nodes[node_id].param
                if key not in inputs:
                    raise CircuitError(f"missing input {key!r}")
                values[node_id] = inputs[key]
        elif op.value.startswith("output_"):
            for node_id in node_ids:
                src = _role(preds.get(node_id, []), FheEdge.UNARY)
                outputs[circuit.nodes[node_id].param] = take(src)
        elif op in (FheOp.RETIRE, FheOp.NOP):
            for node_id in node_ids:
                ins = preds.get(node_id, [])
                values[node_id] = take(ins[0][0]) if ins else None
        elif op.value.startswith(("zero_", "one_")):
            const = self._const(op)
            for node_id in node_ids:
                values[node_id] = const
        elif op == FheOp.NOT:
            x, b = gather(FheEdge.UNARY)
            scatter(ev.not_(x), b)
        elif op == FheOp.GLWE_ADD:
            l, b1 = gather(FheEdge.LEFT)
            r, b2 = gather(FheEdge.RIGHT)
            assert b1 == b2
            scatter(ev.glwe_add(l, r), b1)
        elif op == FheOp.CMUX:
            sel, bs = gather(FheEdge.SEL, freq=True)
            lo, bl = gather(FheEdge.LOW)
            hi, bh = gather(FheEdge.HIGH)
            assert bs == bl == bh
            scatter(ev.cmux(sel, lo, hi), bs)
        elif op == FheOp.GLEV_CMUX:
            sel, bs = gather(FheEdge.SEL, freq=True)
            lo, bl = gather(FheEdge.LOW)
            hi, bh = gather(FheEdge.HIGH)
            assert bs == bl == bh
            scatter(ev.glev_cmux(sel, lo, hi), bs)
        elif op == FheOp.MULTIPLY_GGSW_GLWE:
            glwe, b1 = gather(FheEdge.GLWE)
            ggsw, b2 = gather(FheEdge.GGSW, freq=True)
            assert b1 == b2
            scatter(ev.multiply_glwe_ggsw(glwe, ggsw), b1)
        elif op == FheOp.SAMPLE_EXTRACT:
            x, b = gather(FheEdge.UNARY)
            scatter(ev.sample_extract(x, param or 0), b)
        elif op == FheOp.KEYSWITCH_L1_L0:
            x, b = gather(FheEdge.UNARY)
            scatter(ev.keyswitch_lwe_l1_to_l0(x), b)
        elif op == FheOp.CIRCUIT_BOOTSTRAP:
            x, b = gather(FheEdge.UNARY)
            scatter(ev.circuit_bootstrap(x), b)
        elif op == FheOp.SCHEME_SWITCH:
            x, b = gather(FheEdge.UNARY)
            scatter(ev.scheme_switch(x), b)
        elif op == FheOp.MUL_XN:
            x, b = gather(FheEdge.UNARY)
            scatter(ev.mul_xn(x, param or 0), b)
        else:
            raise CircuitError(f"unhandled op {op}")
