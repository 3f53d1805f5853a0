"""Wave-machine executor: index-driven, scan-fused FheCircuit execution
on the u32-limb TPU pipeline.

The per-wave executor (`executor_u32._run_limb`) dispatches one jitted
kernel per levelized wave but assembles each wave's operands with
per-gate `concatenate`/slice host calls — through the axon relay every
one of those is a device dispatch, so deep programs (mul32: 1,632 cmux
waves) pay a ~26 ms dispatch floor thousands of times (VERDICT r4 weak
#4). This module removes the host from the hot loop entirely:

1. **Slot buffers.** All live wires of a kind (glwe / lwe1 / lwe0 /
   ggsw) live in ONE device-resident slot-major array per kind
   (`[S, ...entity dims]`, S = pow2 peak liveness from linear-scan slot
   allocation). Gates address operands by slot index; gather + compute
   + scatter happen inside a single jitted kernel per wave, so a wave
   is ONE dispatch regardless of width.
2. **Greedy op-batched scheduling.** Instead of ASAP levelization
   (which scattered CBS conversions into 144 waves of mean batch 2.7
   at mul32), the scheduler runs every non-CBS op as soon as it is
   ready and defers CIRCUIT_BOOTSTRAP gates until nothing else can
   proceed — CBS waves then batch every conversion that accumulated
   (the reference gets the same effect from work-stealing overlap,
   `parasol_runtime/src/circuit_processor/mod.rs:192-253`; the TPU
   inversion is maximal-width batched waves).
3. **Scan fusion.** Runs of equal-width cmux waves execute as ONE
   `lax.scan` over stacked index arrays (the wiring is data, not
   structure), cutting dispatch count ~8x further and keeping the
   executable cache tiny: widths are canonicalized to a fixed set, so
   a handful of executables cover arbitrarily deep circuits.

Correctness is identical to the per-wave path: the same
`ops/bootstrap_u32` / `cbs_u32` / `keyswitch_u32` kernels run on the
same operands; only operand routing changed. (≙ reference scheduler
`circuit_processor/mod.rs:62-656`; see SURVEY §7 step 8.)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops import limb32 as lb
from ..ops.bootstrap_u32 import (
    cmux_u32,
    external_product_u32,
    inv_limb,
    monomial_mul_u32,
)
from ..ops.cbs_u32 import circuit_bootstrap_u32
from ..ops.keyswitch_u32 import keyswitch_lwe_u32
from ..params import Params
from ..utils.profiling import metrics
from .fhe_circuit import CircuitError, FheCircuit, FheEdge, FheOp

U32 = jnp.uint32
I32 = jnp.int32

# wire kinds (buffer families)
_GLWE, _LWE1, _LWE0, _GGSW = "glwe", "lwe1", "lwe0", "ggsw"

_KIND_OF_OP = {
    FheOp.INPUT_GLWE1: _GLWE,
    FheOp.INPUT_LWE1: _LWE1,
    FheOp.INPUT_LWE0: _LWE0,
    FheOp.ZERO_GLWE1: _GLWE,
    FheOp.ONE_GLWE1: _GLWE,
    FheOp.ZERO_GGSW1: _GGSW,
    FheOp.ONE_GGSW1: _GGSW,
    FheOp.NOT: _GLWE,
    FheOp.GLWE_ADD: _GLWE,
    FheOp.CMUX: _GLWE,
    FheOp.MULTIPLY_GGSW_GLWE: _GLWE,
    FheOp.MUL_XN: _GLWE,
    FheOp.SAMPLE_EXTRACT: _LWE1,
    FheOp.KEYSWITCH_L1_L0: _LWE0,
    FheOp.CIRCUIT_BOOTSTRAP: _GGSW,
}

# compute-op wave groups; canonical lane widths per group (ascending;
# waves chunk at the last entry). A tiny width set keeps the compiled
# executable set tiny — remote compiles through the axon relay cost
# ~a minute each, so every extra (width, kind) pair is expensive.
# "convert" (extract->ks->cbs) and "refresh" (convert->extprod(ONE))
# are synthetic fused chains produced by the scheduler's contraction
# pass: one kernel call replaces 3-4 dispatches per conversion wave
# and keeps conversion traffic from splitting scan-fusable cmux runs.
_WIDTHS = {
    "cmux": (64, 256),
    "extprod": (64, 256),
    "cbs": (32, 256),
    "convert": (32, 256),
    "refresh": (32, 256),
    "extract": (256,),
    "ks": (256,),
    "add": (256,),
    "not": (256,),
    "mulxn": (256,),
}

_GROUP_OF_OP = {
    FheOp.CMUX: "cmux",
    FheOp.MULTIPLY_GGSW_GLWE: "extprod",
    FheOp.CIRCUIT_BOOTSTRAP: "cbs",
    FheOp.SAMPLE_EXTRACT: "extract",
    FheOp.KEYSWITCH_L1_L0: "ks",
    FheOp.GLWE_ADD: "add",
    FheOp.NOT: "not",
    FheOp.MUL_XN: "mulxn",
}

# groups deferred until nothing else is ready (maximizes their batch);
# all three contain a full circuit bootstrap
_DEFERRED = ("cbs", "convert", "refresh")

# output buffer kind per wave group
_OUT_KIND = {
    "cmux": _GLWE, "extprod": _GLWE, "add": _GLWE, "not": _GLWE,
    "mulxn": _GLWE, "extract": _LWE1, "ks": _LWE0, "cbs": _GGSW,
    "convert": _GGSW, "refresh": _GLWE,
}

# scan-fusion chunk length for runs of equal-width cmux waves
_SCAN_R = 8


def _canon_w(group: str, g: int) -> int:
    for w in _WIDTHS[group]:
        if g <= w:
            return w
    return _WIDTHS[group][-1]


@dataclasses.dataclass
class Wave:
    group: str
    width: int  # padded lane width
    gates: int  # real gate count
    # per-role int32 operand index arrays [width] (padded entries:
    # gather index 0 / scatter index S=out-of-bounds -> dropped)
    idx: dict


@dataclasses.dataclass
class Schedule:
    waves: list  # list[Wave] after scan-chunking; scan entries are
    # ("scan", group, width, stacked idx dict of [R, width])
    slot_counts: dict  # kind -> S (pow2)
    inputs: dict  # kind -> (names list, np slot idx [padded pow2])
    outputs: list  # (param, kind, slot)
    wave_log: list  # (group, gates) for observability
    uses_ggsw_consts: bool = False  # ZERO_GGSW1/ONE_GGSW1 present


def build_schedule(circuit: FheCircuit, collect_outputs: bool = True) -> Schedule:
    """Compile an FheCircuit into a wave schedule (host-only; cached by
    circuit structure in `WaveMachine`)."""
    circuit.validate()
    n = len(circuit.nodes)
    ops: list = [nd.op for nd in circuit.nodes]
    params_l: list = [nd.param for nd in circuit.nodes]
    edges: list = list(circuit.edges)

    # --- conversion-chain contraction (peephole) ---
    # extract(h=0) -> keyswitch -> cbs, each intermediate single-use,
    # collapses to one synthetic "convert" node (glwe -> ggsw); if the
    # cbs feeds exactly one extprod whose GLWE operand is the ONE
    # constant (the mid-tree recryption pattern emitted by
    # `fhe_circuit.insert_mux_circuit`), the whole chain collapses to
    # "refresh" (glwe -> glwe).
    epreds: dict[int, list] = {}
    esuccs: dict[int, list] = {}
    ncons = [0] * n
    for ei, (s, d, r) in enumerate(edges):
        epreds.setdefault(d, []).append((ei, s, r))
        esuccs.setdefault(s, []).append((ei, d, r))
        ncons[s] += 1
    dead_edges: set[int] = set()
    new_edges: list = []
    for c in range(n):
        if ops[c] is not FheOp.CIRCUIT_BOOTSTRAP:
            continue
        pc = epreds.get(c, [])
        if len(pc) != 1:
            continue
        ei_ks, ksn, _ = pc[0]
        if ops[ksn] is not FheOp.KEYSWITCH_L1_L0 or ncons[ksn] != 1:
            continue
        pk = epreds.get(ksn, [])
        if len(pk) != 1:
            continue
        ei_ex, exn, _ = pk[0]
        if (
            ops[exn] is not FheOp.SAMPLE_EXTRACT
            or ncons[exn] != 1
            or (params_l[exn] or 0) != 0
        ):
            continue
        pe = epreds.get(exn, [])
        if len(pe) != 1:
            continue
        ei_src, srcn, _ = pe[0]
        ops[ksn] = ops[exn] = None
        dead_edges.update((ei_ks, ei_ex, ei_src))
        target, top = c, "convert"
        cons_c = esuccs.get(c, [])
        if len(cons_c) == 1:
            ei_ce, e, r_ce = cons_c[0]
            if ops[e] is FheOp.MULTIPLY_GGSW_GLWE and r_ce == FheEdge.GGSW:
                pe2 = epreds.get(e, [])
                glwe_in = [x for x in pe2 if x[2] == FheEdge.GLWE]
                if (
                    len(pe2) == 2
                    and glwe_in
                    and ops[glwe_in[0][1]] is FheOp.ONE_GLWE1
                ):
                    ops[c] = None
                    dead_edges.update((ei_ce, glwe_in[0][0]))
                    target, top = e, "refresh"
        ops[target] = top
        new_edges.append((srcn, target, FheEdge.UNARY))
    if dead_edges or new_edges:
        edges = [
            e for ei, e in enumerate(edges) if ei not in dead_edges
        ] + new_edges

    preds: dict[int, list] = {}
    rc = [0] * n
    succs: dict[int, list[int]] = {}
    indeg = [0] * n
    for s, d, r in edges:
        preds.setdefault(d, []).append((s, r))
        succs.setdefault(s, []).append(d)
        rc[s] += 1
        indeg[d] += 1

    # alias resolution (RETIRE/NOP forward their single input)
    alias: dict[int, int] = {}

    def resolve(i: int) -> int:
        while i in alias:
            i = alias[i]
        return i

    # slot allocation state
    slot: dict[int, int] = {}
    peak = {k: 0 for k in (_GLWE, _LWE1, _LWE0, _GGSW)}
    nslots = {k: 0 for k in (_GLWE, _LWE1, _LWE0, _GGSW)}
    free: dict[str, list[int]] = {k: [] for k in (_GLWE, _LWE1, _LWE0, _GGSW)}
    # reserve const slots 0/1 for glwe + ggsw (zero/one), never freed
    for k in (_GLWE, _GGSW):
        nslots[k] = peak[k] = 2

    def alloc(kind: str) -> int:
        if free[kind]:
            return free[kind].pop()
        s = nslots[kind]
        nslots[kind] += 1
        peak[kind] = max(peak[kind], nslots[kind])
        return s

    def release(node: int):
        """Drop one reference to `node`'s value; free its slot at 0."""
        node = resolve(node)
        rc[node] -= 1
        if rc[node] == 0 and node in slot and not protected[node]:
            free[_kind_of[node]].append(slot[node])

    # node kind + const/INPUT classification
    _kind_of: dict[int, str] = {}
    protected = [False] * n  # const slots / outputs never freed
    in_names: dict[str, list] = {k: [] for k in (_GLWE, _LWE1, _LWE0)}
    in_slots: dict[str, list] = {k: [] for k in (_GLWE, _LWE1, _LWE0)}
    outputs: list = []
    ready_init: list[int] = []

    n_dead = 0
    for i in range(n):
        op = ops[i]
        if op is None:  # contracted away
            n_dead += 1
            continue
        if isinstance(op, str):  # synthetic convert/refresh
            continue
        if op in (
            FheOp.INPUT_GGSW1, FheOp.INPUT_GLEV1, FheOp.GLEV_CMUX,
            FheOp.SCHEME_SWITCH, FheOp.ZERO_GLEV1, FheOp.ONE_GLEV1,
            FheOp.ZERO_LWE0, FheOp.ONE_LWE0, FheOp.OUTPUT_GGSW1,
            FheOp.OUTPUT_GLEV1,
        ):
            raise CircuitError(
                f"{op} not supported on the u32 wave machine (GLEV-mode"
                " ops run on the u64 CircuitExecutor)"
            )
        kind = _KIND_OF_OP.get(op)
        if kind is not None:
            _kind_of[i] = kind
        if op in (FheOp.ZERO_GLWE1, FheOp.ZERO_GGSW1):
            slot[i] = 0
            protected[i] = True
            ready_init.append(i)
        elif op in (FheOp.ONE_GLWE1, FheOp.ONE_GGSW1):
            slot[i] = 1
            protected[i] = True
            ready_init.append(i)
        elif op.value.startswith("input_"):
            s = alloc(kind)
            slot[i] = s
            protected[i] = True  # inputs are cheap to keep; never reuse
            in_names[kind].append(params_l[i])
            in_slots[kind].append(s)
            ready_init.append(i)
        elif op in (FheOp.RETIRE, FheOp.NOP) and i not in preds:
            ready_init.append(i)  # input-less retire/nop: no-op

    # scheduling: completed set -> ready groups -> emit waves
    done = [False] * n
    ready: dict[str, list[int]] = {g: [] for g in _WIDTHS}
    waves: list[Wave] = []
    wave_log: list = []
    n_done = 0

    def complete(i: int):
        nonlocal n_done
        stack = [i]
        while stack:
            cur = stack.pop()
            if done[cur]:
                continue
            done[cur] = True
            n_done += 1
            for nxt in succs.get(cur, []):
                indeg[nxt] -= 1
                if indeg[nxt] == 0:
                    opn = ops[nxt]
                    if opn in (FheOp.RETIRE, FheOp.NOP):
                        ins = preds.get(nxt, [])
                        if ins:
                            src = resolve(ins[0][0])
                            alias[nxt] = src
                            # transfer the alias's consumers onto the
                            # source (and consume the alias's own input
                            # edge): release() resolves through the
                            # alias, so rc must live on the source
                            rc[src] += rc[nxt] - 1
                        stack.append(nxt)
                    elif isinstance(opn, str):  # convert / refresh
                        ready[opn].append(nxt)
                    elif opn.value.startswith("output_"):
                        src = resolve(preds[nxt][0][0])
                        protected[src] = True
                        outputs.append(
                            (params_l[nxt], _kind_of[src], slot[src])
                        )
                        stack.append(nxt)
                    else:
                        ready[_GROUP_OF_OP[opn]].append(nxt)

    def emit(group: str, nids: list[int]):
        """One wave of `group` over `nids` (width already <= cap)."""
        g = len(nids)
        wp = _canon_w(group, g)
        idx: dict[str, np.ndarray] = {}
        roles = {
            "cmux": ((FheEdge.LOW, "lo"), (FheEdge.HIGH, "hi"),
                     (FheEdge.SEL, "sel")),
            "extprod": ((FheEdge.GLWE, "lo"), (FheEdge.GGSW, "sel")),
            "add": ((FheEdge.LEFT, "lo"), (FheEdge.RIGHT, "hi")),
            "cbs": ((FheEdge.UNARY, "in"),),
            "ks": ((FheEdge.UNARY, "in"),),
            "extract": ((FheEdge.UNARY, "in"),),
            "not": ((FheEdge.UNARY, "in"),),
            "mulxn": ((FheEdge.UNARY, "in"),),
            "convert": ((FheEdge.UNARY, "in"),),
            "refresh": ((FheEdge.UNARY, "in"),),
        }[group]
        for role, key in roles:
            arr = np.zeros((wp,), dtype=np.int32)
            for j, nid in enumerate(nids):
                src = resolve(_role(preds[nid], role))
                arr[j] = slot[src]
            idx[key] = arr
        if group == "extract":
            idx["h"] = np.asarray(
                [params_l[nid] or 0 for nid in nids]
                + [0] * (wp - g), dtype=np.int32,
            )
        if group == "mulxn":
            idx["t"] = np.asarray(
                [params_l[nid] or 0 for nid in nids]
                + [0] * (wp - g), dtype=np.uint32,
            )
        # consume input refs (may free slots), then allocate outputs
        for nid in nids:
            for src, _ in preds[nid]:
                release(src)
        okind = _OUT_KIND[group]
        out = np.full((wp,), -1, dtype=np.int32)
        for j, nid in enumerate(nids):
            s = alloc(okind)
            slot[nid] = s
            _kind_of[nid] = okind
            out[j] = s
        idx["out"] = out
        waves.append(Wave(group, wp, g, idx))
        wave_log.append((group, g))
        for nid in nids:
            complete(nid)

    for i in ready_init:
        complete(i)
    # priority order: cmux first and RESTART after each emission, so
    # consecutive cmux waves form long runs (scan fusion needs
    # consecutive equal-width waves); CBS-class groups are deferred
    # until nothing else is ready, maximizing their batch. EXCEPT:
    # when the cmux frontier is NARROW and plenty of conversions are
    # pending, run the conversions first — their completion unlocks
    # whole subtrees at once, merging the narrow post-refresh frontiers
    # into wider waves (mul-class circuits fragment into per-tree
    # frontiers across refresh boundaries otherwise).
    _PRIORITY = [g for g in _WIDTHS if g not in _DEFERRED]

    def emit_deferred() -> bool:
        pending = [g for g in _DEFERRED if ready[g]]
        if not pending:
            return False
        group = max(pending, key=lambda g: len(ready[g]))
        nids, ready[group] = ready[group], []
        cap = _WIDTHS[group][-1]
        for c in range(0, len(nids), cap):
            emit(group, nids[c : c + cap])
        return True

    while True:
        if (
            0 < len(ready["cmux"]) < 64
            and sum(len(ready[g]) for g in _DEFERRED) >= 32
        ):
            emit_deferred()
            continue
        for group in _PRIORITY:
            if ready[group]:
                nids, ready[group] = ready[group], []
                cap = _WIDTHS[group][-1]
                for c in range(0, len(nids), cap):
                    emit(group, nids[c : c + cap])
                break
        else:
            if not emit_deferred():
                break

    if n_done != n - n_dead:
        raise CircuitError(
            f"circuit contains a cycle or unreachable nodes "
            f"({n - n_dead - n_done} unscheduled)"
        )

    slot_counts = {
        k: 1 << max(0, (peak[k] - 1)).bit_length() if peak[k] else 0
        for k in peak
    }
    # padded scatter indices = S (out of bounds, mode="drop")
    for w in waves:
        w.idx["out"][w.idx["out"] < 0] = slot_counts[_OUT_KIND[w.group]]

    # scan-chunk runs of equal-width cmux waves
    fused: list = []
    i = 0
    while i < len(waves):
        w = waves[i]
        if w.group == "cmux":
            run = [w]
            while (
                len(run) < _SCAN_R
                and i + len(run) < len(waves)
                and waves[i + len(run)].group == "cmux"
                and waves[i + len(run)].width == w.width
            ):
                run.append(waves[i + len(run)])
            if len(run) == _SCAN_R:
                stacked = {
                    k: np.stack([r.idx[k] for r in run])
                    for k in ("lo", "hi", "sel", "out")
                }
                fused.append(
                    Wave("cmux_scan", w.width,
                         sum(r.gates for r in run), stacked)
                )
                i += len(run)
                continue
        fused.append(w)
        i += 1

    ins = {}
    for kind in in_names:
        names = in_names[kind]
        if not names:
            continue
        npad = 1 << max(0, (len(names) - 1).bit_length())
        sl = np.full((npad,), slot_counts[kind], dtype=np.int32)
        sl[: len(names)] = in_slots[kind]
        ins[kind] = (names, sl)

    uses_ggsw_consts = any(
        n.op in (FheOp.ZERO_GGSW1, FheOp.ONE_GGSW1) for n in circuit.nodes
    )
    return Schedule(
        fused, slot_counts, ins, outputs, wave_log, uses_ggsw_consts
    )


def _role(ins, role):
    for src, r in ins:
        if r == role:
            return src
    raise CircuitError(f"missing {role} input")


def sample_extract_dyn_u32(x, h, glwe):
    """Batched sample extract with PER-LANE coefficient index: limb pair
    [k+1, N, W], h int32 [W] -> LWE limb pair [k*N+1, W]
    (≙ `glwe_ciphertext_ops.rs:31-77`; dynamic-h generalization of
    `bootstrap_u32.sample_extract_u32` so one executable serves every
    extraction index — packed-int unpacks extract h=0..N-1)."""
    n = glwe.degree
    j = jnp.arange(n, dtype=I32)[:, None]  # [N, 1]
    idx = (h[None, :] - j) % n  # [N, W]
    neg = j > h[None, :]  # [N, W]

    def gather(c):
        a = c[:-1]  # [k, N, W]
        return jnp.take_along_axis(
            a, jnp.broadcast_to(idx[None], a.shape), axis=1
        )

    ga = (gather(x[0]), gather(x[1]))
    ga = lb.where(neg, lb.neg(ga), ga)
    k, w = glwe.size, x[0].shape[-1]
    a_flat = tuple(c.reshape(k * n, w) for c in ga)
    b = tuple(
        jnp.take_along_axis(c[-1], h[None, :], axis=0) for c in x
    )  # [1, W]
    return (
        jnp.concatenate([a_flat[0], b[0]], axis=0),
        jnp.concatenate([a_flat[1], b[1]], axis=0),
    )


class WaveMachine:
    """Executes wave schedules against device-resident slot buffers.

    Drop-in `run(circuit, inputs) -> outputs` backend for
    `U32CircuitExecutor` / `FheComputer` (inputs/outputs: host numpy
    u64 arrays, GLWE [k+1, N] / LWE [n+1])."""

    def __init__(self, key, params: Params, use_pallas=None):
        self.key = key
        self.params = params
        # default to the backend that built the KEY's spectra — the two
        # FFT backends use different frequency orders, so computing
        # with the other one silently corrupts every external product
        # (advisor r4 finding)
        if use_pallas is None:
            use_pallas = getattr(key, "use_pallas", False)
        self.up = use_pallas
        self._schedules: dict = {}
        self._kc: dict = {}  # kernel cache
        self.wave_log: list = []

    # -- public API ----------------------------------------------------

    def run(self, circuit: FheCircuit, inputs: dict) -> dict:
        sched = self._schedule_for(circuit)
        self.wave_log.extend(sched.wave_log)
        bufs = self._init_buffers(sched, inputs)
        for w in sched.waves:
            bufs = self._dispatch(w, bufs)
        return self._gather_outputs(sched, bufs)

    def wave_stats(self) -> dict:
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

    # -- schedule cache -------------------------------------------------

    @staticmethod
    def _circuit_key(circuit: FheCircuit) -> tuple:
        nodes = tuple(
            (n.op.value,
             n.param if isinstance(n.param, (int, str, type(None)))
             else repr(n.param))
            for n in circuit.nodes
        )
        return (nodes, tuple(circuit.edges))

    def _schedule_for(self, circuit: FheCircuit) -> Schedule:
        ck = self._circuit_key(circuit)
        s = self._schedules.get(ck)
        if s is None:
            s = build_schedule(circuit)
            # upload index arrays once (device-resident across runs)
            for w in s.waves:
                w.idx = {
                    k: jax.device_put(v) for k, v in w.idx.items()
                }
            s.inputs = {
                kind: (names, jax.device_put(sl))
                for kind, (names, sl) in s.inputs.items()
            }
            self._schedules[ck] = s
            metrics.inc("wavemachine.schedules")
        return s

    # -- buffers ---------------------------------------------------------

    def _shapes(self):
        p = self.params
        glwe = p.l1_params
        kp1, n = glwe.size + 1, glwe.degree
        lcbs = p.cbs_radix.count
        return {
            _GLWE: (kp1, n),
            _LWE1: (glwe.size * n + 1,),
            _LWE0: (p.l0_params.dim + 1,),
            _GGSW: (kp1, lcbs, kp1, n // 2),
        }

    def _init_buffers(self, sched: Schedule, inputs: dict) -> dict:
        shapes = self._shapes()
        bufs = {}
        for kind, s in sched.slot_counts.items():
            if s == 0:
                bufs[kind] = None
                continue
            shp = (s,) + shapes[kind]
            if kind == _GGSW and sched.uses_ggsw_consts:
                if self.key.ggsw_zero_freq is None:
                    raise CircuitError(
                        "circuit uses GGSW constants but the compute key"
                        " has no ggsw_zero/one_freq"
                    )
                z = self._kernel(("init_ggsw", s, shp))(
                    *self.key.ggsw_zero_freq, *self.key.ggsw_one_freq
                )
            else:
                z = self._kernel(("init", kind, s, shp))()
            bufs[kind] = z
        # scatter inputs: stack on the HOST in numpy and ship ONE
        # hi/lo pair per kind — a per-input `from_u64_np` was 2 device
        # transfers per input (~25 ms each through the relay), a fixed
        # ~6 s per run at 128 inputs (measured r5)
        for kind, (names, sl) in sched.inputs.items():
            npad = sl.shape[0]
            x = np.zeros((npad,) + shapes[kind], dtype=np.uint64)
            for j, nm in enumerate(names):
                x[j] = np.asarray(inputs[nm], dtype=np.uint64)
            hi = (x >> np.uint64(32)).astype(np.uint32)
            lo = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            s = sched.slot_counts[kind]
            bufs[kind] = self._kernel(("load", kind, npad, s))(
                bufs[kind], jnp.asarray(hi), jnp.asarray(lo), sl
            )
        return bufs

    # -- kernels ---------------------------------------------------------

    def _kernel(self, key):
        f = self._kc.get(key)
        if f is not None:
            return f
        p = self.params
        glwe = p.l1_params
        shapes = self._shapes()
        kindname = key[0]

        if kindname == "init":
            _, kind, s, shp = key

            def mk():
                if kind == _GGSW:
                    return tuple(
                        jnp.zeros(shp, dtype=jnp.float32) for _ in range(4)
                    )
                hi = jnp.zeros(shp, dtype=U32)
                lo = jnp.zeros(shp, dtype=U32)
                if kind == _GLWE:
                    # slot 1 = trivial ONE (1-bit encoding)
                    hi = hi.at[1, -1, 0].set(U32(0x80000000))
                return (hi, lo)

            f = jax.jit(mk)
        elif kindname == "init_ggsw":
            _, s, shp = key

            def mk_ggsw(*consts):
                z, o = consts[:4], consts[4:]
                return tuple(
                    jnp.zeros(shp, dtype=jnp.float32)
                    .at[0].set(zc).at[1].set(oc)
                    for zc, oc in zip(z, o)
                )

            f = jax.jit(mk_ggsw)
        elif kindname == "load":
            _, kind, npad, s = key

            def load(buf, hi, lo, sl):
                return (
                    buf[0].at[sl].set(hi, mode="drop"),
                    buf[1].at[sl].set(lo, mode="drop"),
                )

            f = jax.jit(load, donate_argnums=(0,))
        elif kindname == "cmux_scan":

            def cscan(gbuf, ggsw_buf, lo_i, hi_i, sel_i, out_i):
                def step(buf, ix):
                    li, hi_, si, oi = ix
                    d0 = tuple(jnp.moveaxis(c[li], 0, -1) for c in buf)
                    d1 = tuple(jnp.moveaxis(c[hi_], 0, -1) for c in buf)
                    sel = tuple(
                        jnp.moveaxis(c[si], 0, -1) for c in ggsw_buf
                    )
                    out = cmux_u32(d0, d1, sel, glwe, p.cbs_radix, self.up)
                    buf = tuple(
                        b.at[oi].set(jnp.moveaxis(o, -1, 0), mode="drop")
                        for b, o in zip(buf, out)
                    )
                    return buf, None

                buf, _ = lax.scan(step, gbuf, (lo_i, hi_i, sel_i, out_i))
                return buf

            f = jax.jit(cscan, donate_argnums=(0,))
        elif kindname == "cmux":

            def cm(gbuf, ggsw_buf, lo_i, hi_i, sel_i, out_i):
                d0 = tuple(jnp.moveaxis(c[lo_i], 0, -1) for c in gbuf)
                d1 = tuple(jnp.moveaxis(c[hi_i], 0, -1) for c in gbuf)
                sel = tuple(jnp.moveaxis(c[sel_i], 0, -1) for c in ggsw_buf)
                out = cmux_u32(d0, d1, sel, glwe, p.cbs_radix, self.up)
                return tuple(
                    b.at[out_i].set(jnp.moveaxis(o, -1, 0), mode="drop")
                    for b, o in zip(gbuf, out)
                )

            f = jax.jit(cm, donate_argnums=(0,))
        elif kindname == "extprod":

            def ep(gbuf, ggsw_buf, lo_i, sel_i, out_i):
                x = tuple(jnp.moveaxis(c[lo_i], 0, -1) for c in gbuf)
                sel = tuple(jnp.moveaxis(c[sel_i], 0, -1) for c in ggsw_buf)
                prod = inv_limb(
                    external_product_u32(x, sel, glwe, p.cbs_radix, self.up),
                    self.up,
                )
                return tuple(
                    b.at[out_i].set(jnp.moveaxis(o, -1, 0), mode="drop")
                    for b, o in zip(gbuf, prod)
                )

            f = jax.jit(ep, donate_argnums=(0,))
        elif kindname == "add":

            def ad(gbuf, lo_i, hi_i, out_i):
                a = tuple(jnp.moveaxis(c[lo_i], 0, -1) for c in gbuf)
                b = tuple(jnp.moveaxis(c[hi_i], 0, -1) for c in gbuf)
                out = lb.add(a, b)
                return tuple(
                    bb.at[out_i].set(jnp.moveaxis(o, -1, 0), mode="drop")
                    for bb, o in zip(gbuf, out)
                )

            f = jax.jit(ad, donate_argnums=(0,))
        elif kindname == "not":

            def nt(gbuf, in_i, out_i):
                x = tuple(jnp.moveaxis(c[in_i], 0, -1) for c in gbuf)
                neg = lb.neg(x)
                e_hi, e_lo = lb.encode_const(1, 1)
                b0 = lb.add_small((neg[0][-1, 0], neg[1][-1, 0]), e_hi, e_lo)
                out = (
                    neg[0].at[-1, 0].set(b0[0]),
                    neg[1].at[-1, 0].set(b0[1]),
                )
                return tuple(
                    b.at[out_i].set(jnp.moveaxis(o, -1, 0), mode="drop")
                    for b, o in zip(gbuf, out)
                )

            f = jax.jit(nt, donate_argnums=(0,))
        elif kindname == "mulxn":

            def mx(gbuf, in_i, t, out_i):
                x = tuple(jnp.moveaxis(c[in_i], 0, -1) for c in gbuf)
                out = monomial_mul_u32(x, t)
                return tuple(
                    b.at[out_i].set(jnp.moveaxis(o, -1, 0), mode="drop")
                    for b, o in zip(gbuf, out)
                )

            f = jax.jit(mx, donate_argnums=(0,))
        elif kindname == "extract":

            def ex(l1buf, gbuf, in_i, h, out_i):
                x = tuple(jnp.moveaxis(c[in_i], 0, -1) for c in gbuf)
                out = sample_extract_dyn_u32(x, h, glwe)
                return tuple(
                    b.at[out_i].set(jnp.moveaxis(o, -1, 0), mode="drop")
                    for b, o in zip(l1buf, out)
                )

            f = jax.jit(ex, donate_argnums=(0,))
        elif kindname == "ks":
            # key material passed as jit ARGUMENTS: capturing embeds it
            # into the serialized executable (persistent-cache entries
            # of 100s of MB whose warm load costs ~a minute through the
            # axon relay)

            def ksf(l0buf, l1buf, ksk_p, in_i, out_i):
                x = tuple(jnp.moveaxis(c[in_i], 0, -1) for c in l1buf)
                out = keyswitch_lwe_u32(
                    x, ksk_p, glwe.as_lwe_def(), p.l0_params, p.ks_radix
                )
                return tuple(
                    b.at[out_i].set(jnp.moveaxis(o, -1, 0), mode="drop")
                    for b, o in zip(l0buf, out)
                )

            f = jax.jit(ksf, donate_argnums=(0,))
        elif kindname == "cbs":

            def cb(ggsw_buf, l0buf, bsk, ak, ssk, in_i, out_i):
                x = tuple(jnp.moveaxis(c[in_i], 0, -1) for c in l0buf)
                out = circuit_bootstrap_u32(
                    x, bsk, ak, ssk, p, use_pallas=self.up
                )
                return tuple(
                    b.at[out_i].set(jnp.moveaxis(o, -1, 0), mode="drop")
                    for b, o in zip(ggsw_buf, out)
                )

            f = jax.jit(cb, donate_argnums=(0,))
        elif kindname == "convert":
            # fused extract(0) -> keyswitch -> cbs (one dispatch per
            # conversion wave instead of three)
            from ..ops.bootstrap_u32 import sample_extract_u32

            def cv(ggsw_buf, gbuf, bsk, ak, ssk, ksk_p, in_i, out_i):
                x = tuple(jnp.moveaxis(c[in_i], 0, -1) for c in gbuf)
                l1 = sample_extract_u32(x, 0, glwe)
                l0 = keyswitch_lwe_u32(
                    l1, ksk_p, glwe.as_lwe_def(), p.l0_params, p.ks_radix
                )
                out = circuit_bootstrap_u32(
                    l0, bsk, ak, ssk, p, use_pallas=self.up
                )
                return tuple(
                    b.at[out_i].set(jnp.moveaxis(o, -1, 0), mode="drop")
                    for b, o in zip(ggsw_buf, out)
                )

            f = jax.jit(cv, donate_argnums=(0,))
        elif kindname == "refresh":
            # fused wire recryption: extract -> ks -> cbs -> external
            # product with trivial ONE (the mid-tree refresh pattern)
            from ..ops.bootstrap_u32 import sample_extract_u32

            def rf(gbuf, bsk, ak, ssk, ksk_p, in_i, out_i):
                x = tuple(jnp.moveaxis(c[in_i], 0, -1) for c in gbuf)
                w = x[0].shape[-1]
                l1 = sample_extract_u32(x, 0, glwe)
                l0 = keyswitch_lwe_u32(
                    l1, ksk_p, glwe.as_lwe_def(), p.l0_params, p.ks_radix
                )
                g_f = circuit_bootstrap_u32(
                    l0, bsk, ak, ssk, p, use_pallas=self.up
                )
                one_hi = jnp.zeros(
                    (glwe.size + 1, glwe.degree, w), dtype=U32
                ).at[-1, 0, :].set(U32(0x80000000))
                one = (one_hi, jnp.zeros_like(one_hi))
                out = inv_limb(
                    external_product_u32(
                        one, g_f, glwe, p.cbs_radix, self.up
                    ),
                    self.up,
                )
                return tuple(
                    b.at[out_i].set(jnp.moveaxis(o, -1, 0), mode="drop")
                    for b, o in zip(gbuf, out)
                )

            f = jax.jit(rf, donate_argnums=(0,))
        elif kindname == "out_gather":
            _, kind, m = key

            def og(buf, sl):
                return tuple(c[sl] for c in buf)

            f = jax.jit(og)
        else:  # pragma: no cover
            raise CircuitError(f"unknown kernel {kindname}")
        self._kc[key] = f
        metrics.inc("wavemachine.kernel_compiles")
        return f

    # -- dispatch --------------------------------------------------------

    def _dispatch(self, w: Wave, bufs: dict) -> dict:
        sc = {k: (bufs[k][0].shape[0] if bufs[k] else 0) for k in bufs}
        if w.group == "cmux_scan":
            f = self._kernel(("cmux_scan", w.width, sc[_GLWE], sc[_GGSW]))
            bufs[_GLWE] = f(
                bufs[_GLWE], bufs[_GGSW],
                w.idx["lo"], w.idx["hi"], w.idx["sel"], w.idx["out"],
            )
        elif w.group == "cmux":
            f = self._kernel(("cmux", w.width, sc[_GLWE], sc[_GGSW]))
            bufs[_GLWE] = f(
                bufs[_GLWE], bufs[_GGSW],
                w.idx["lo"], w.idx["hi"], w.idx["sel"], w.idx["out"],
            )
        elif w.group == "extprod":
            f = self._kernel(("extprod", w.width, sc[_GLWE], sc[_GGSW]))
            bufs[_GLWE] = f(
                bufs[_GLWE], bufs[_GGSW],
                w.idx["lo"], w.idx["sel"], w.idx["out"],
            )
        elif w.group == "add":
            f = self._kernel(("add", w.width, sc[_GLWE]))
            bufs[_GLWE] = f(
                bufs[_GLWE], w.idx["lo"], w.idx["hi"], w.idx["out"]
            )
        elif w.group == "not":
            f = self._kernel(("not", w.width, sc[_GLWE]))
            bufs[_GLWE] = f(bufs[_GLWE], w.idx["in"], w.idx["out"])
        elif w.group == "mulxn":
            f = self._kernel(("mulxn", w.width, sc[_GLWE]))
            bufs[_GLWE] = f(
                bufs[_GLWE], w.idx["in"], w.idx["t"], w.idx["out"]
            )
        elif w.group == "extract":
            f = self._kernel(("extract", w.width, sc[_GLWE], sc[_LWE1]))
            bufs[_LWE1] = f(
                bufs[_LWE1], bufs[_GLWE], w.idx["in"], w.idx["h"],
                w.idx["out"],
            )
        elif w.group == "ks":
            f = self._kernel(("ks", w.width, sc[_LWE1], sc[_LWE0]))
            bufs[_LWE0] = f(
                bufs[_LWE0], bufs[_LWE1], self.key.ksk_planes,
                w.idx["in"], w.idx["out"],
            )
        elif w.group == "cbs":
            f = self._kernel(("cbs", w.width, sc[_LWE0], sc[_GGSW]))
            bufs[_GGSW] = f(
                bufs[_GGSW], bufs[_LWE0], self.key.bsk_freq,
                self.key.ak_freq, self.key.ssk_freq,
                w.idx["in"], w.idx["out"],
            )
        elif w.group == "convert":
            f = self._kernel(("convert", w.width, sc[_GLWE], sc[_GGSW]))
            bufs[_GGSW] = f(
                bufs[_GGSW], bufs[_GLWE], self.key.bsk_freq,
                self.key.ak_freq, self.key.ssk_freq, self.key.ksk_planes,
                w.idx["in"], w.idx["out"],
            )
        elif w.group == "refresh":
            f = self._kernel(("refresh", w.width, sc[_GLWE]))
            bufs[_GLWE] = f(
                bufs[_GLWE], self.key.bsk_freq, self.key.ak_freq,
                self.key.ssk_freq, self.key.ksk_planes,
                w.idx["in"], w.idx["out"],
            )
        else:  # pragma: no cover
            raise CircuitError(f"unknown wave group {w.group}")
        return bufs

    def _gather_outputs(self, sched: Schedule, bufs: dict) -> dict:
        by_kind: dict[str, list] = {}
        for param, kind, sl in sched.outputs:
            by_kind.setdefault(kind, []).append((param, sl))
        out = {}
        for kind, items in by_kind.items():
            sl = jnp.asarray([s for _, s in items], dtype=I32)
            got = self._kernel(("out_gather", kind, len(items)))(
                bufs[kind], sl
            )
            got = jax.device_get(got)
            for j, (param, _) in enumerate(items):
                out[param] = lb.to_u64_np(tuple(c[j] for c in got))
        return out
