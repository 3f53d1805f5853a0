"""MuxCircuit: a DAG of 2:1 multiplexer gates over boolean inputs.

(≙ reference `mux_circuits/src/lib.rs:56-170`; built from BDDs like
`lib.rs:358-445` `From<&[Bdd]>`.)

Layout: a flat node list. Node kinds:
- ("zero",) / ("one",)                  — constants
- ("mux", sel_input, lo_node, hi_node)  — select is a circuit *input
  index* (BDD decision variable; in FHE it becomes a GGSW), lo/hi are
  node ids (in FHE: GLWE operands)
Outputs are node ids. Hash-consing during construction = the
reference's CSE `optimize()` pass.
"""

from __future__ import annotations

import dataclasses
import os
import pickle

from .bdd import BddManager


@dataclasses.dataclass
class MuxCircuit:
    num_inputs: int
    nodes: list
    outputs: list

    @property
    def num_muxes(self) -> int:
        return sum(1 for n in self.nodes if n[0] == "mux")

    def evaluate(self, inputs) -> list:
        """Plaintext forward evaluation (≙ `test_mux_circuit`,
        `lib.rs:448+`)."""
        assert len(inputs) == self.num_inputs
        vals = {}
        for i, node in enumerate(self.nodes):
            kind = node[0]
            if kind == "zero":
                vals[i] = 0
            elif kind == "one":
                vals[i] = 1
            else:
                _, sel, lo, hi = node
                vals[i] = vals[hi] if inputs[sel] else vals[lo]
        return [vals[o] for o in self.outputs]

    @classmethod
    def from_bdds(cls, mgr: BddManager, roots: list, input_map=None) -> "MuxCircuit":
        """Convert shared BDD roots into a mux circuit. `input_map`
        optionally remaps BDD variables to circuit inputs (the
        reference's `remap_inputs`, used by the multiplier's duplicated
        variables, `mul.rs:40-55`)."""
        num_inputs = (
            mgr.num_vars if input_map is None else max(input_map) + 1 if input_map else 0
        )
        nodes = [("zero",), ("one",)]
        rename = {mgr.FALSE: 0, mgr.TRUE: 1}

        def convert(f: int) -> int:
            if f in rename:
                return rename[f]
            var, lo, hi = mgr.nodes[f]
            lo_id = convert(lo)
            hi_id = convert(hi)
            sel = var if input_map is None else input_map[var]
            nodes.append(("mux", sel, lo_id, hi_id))
            rename[f] = len(nodes) - 1
            return rename[f]

        # iterative conversion to avoid deep recursion on big circuits
        import sys

        old = sys.getrecursionlimit()
        sys.setrecursionlimit(max(old, 100000))
        try:
            outputs = [convert(r) for r in roots]
        finally:
            sys.setrecursionlimit(old)
        return cls(num_inputs=num_inputs, nodes=nodes, outputs=outputs)


_CACHE_DIR = os.path.join(os.path.dirname(__file__), "data")


def cached_circuit(name: str, builder) -> MuxCircuit:
    """Disk cache for expensive circuit builds (≙ `mux_circuits`'s
    `FileCache` / pre-serialized `src/data` blobs, `cache.rs:1-60`)."""
    path = os.path.join(_CACHE_DIR, name + ".pkl")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    circuit = builder()
    os.makedirs(_CACHE_DIR, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(circuit, f)
    return circuit
