"""FheComputer: the encrypted CPU front-end.

(≙ reference `parasol_cpu/src/proc/fhe_processor.rs` + `proc/ops/*`.)

Architecture note: the reference couples a Tomasulo out-of-order
dispatcher to a rayon thread pool to expose gate parallelism. Here the
parallelism lives *inside* each instruction: an encrypted op lowers to
a mux circuit whose gates execute as batched XLA kernels (and the whole
wave can be batched across SIMD program executions). The front-end is
therefore a simple in-order fetch/decode/execute loop with the same
observable semantics: plaintext-only branches, gas accounting,
first-error faulting, plaintext fast paths.

Register file: 64 registers (`fhe_processor.rs:136`), each Plaintext
{val, width} or Ciphertext (list of L1 GLWE bit handles, LSB-first).
"""

from __future__ import annotations

import dataclasses

from ..circuits import integer as int_circuits
from ..runtime.evaluation import Evaluation
from ..runtime.executor import CircuitExecutor
from ..runtime.fhe_circuit import CtType, FheCircuit, FheEdge, FheOp
from .isa import INSTRUCTION_SIZE, RP, SP, decode
from .memory import EncByte, Memory, MemoryError_


class CpuError(Exception):
    pass


class BranchConditionNotPlaintext(CpuError):
    pass


class OutOfGas(CpuError):
    pass


class WidthMismatch(CpuError):
    pass


# gas costs (≙ `fhe_processor.rs:221-307`): plaintext ops cost 1,
# ciphertext ops 100k, ciphertext multiplies 500k
GAS_PLAIN = 1
GAS_CIPHERTEXT = 100_000
GAS_CIPHERTEXT_MUL = 500_000


@dataclasses.dataclass
class PtVal:
    val: int
    width: int


@dataclasses.dataclass
class CtVal:
    bits: list  # GLWE bit ciphertexts, LSB-first
    width: int


class FheComputer:
    def __init__(self, ev: Evaluation):
        self.ev = ev
        self.ex = CircuitExecutor(ev)
        self.registers = [PtVal(0, 32) for _ in range(64)]
        self.gas_used = 0
        self.gas_limit = None
        self.debug_handlers: dict[int, object] = {}

    # ------------------------------------------------------------------
    # program execution
    # ------------------------------------------------------------------

    def run_program(
        self,
        entry: int,
        memory: Memory,
        call_data=None,
        gas_limit=None,
        log_instruction_execution: bool = False,
        log_register_info: bool = False,
    ):
        """Fetch/decode/execute until Ret (≙ `run_program_with_options`,
        `fhe_processor.rs:635-700`; logging flags ≙ `RunProgramOptions`,
        `fhe_processor.rs:26-103`). Returns the return-value pointer."""
        import logging

        log = logging.getLogger("spf_tpu.cpu")
        self.reset()
        self.gas_limit = gas_limit
        return_ptr = 0
        if call_data is not None:
            return_ptr = self._set_up_function_call(memory, call_data)
        pc = entry
        while True:
            word = memory.try_load_plaintext_dword(pc)
            instr = decode(word)
            if log_instruction_execution:
                log.info("pc=0x%08x %s %s", pc, instr.name, instr.operands)
            if instr.name == "Ret":
                break
            pc = self._execute(instr, pc, memory)
            if log_register_info and "dst" in instr.operands:
                r = instr.operands["dst"]
                log.info("  x%d = %s", r, self.registers[r])
        return return_ptr

    def reset(self):
        self.registers = [PtVal(0, 32) for _ in range(64)]
        self.gas_used = 0

    def _set_up_function_call(self, memory: Memory, call_data) -> int:
        """Stack-based ABI v3 (`fhe_processor.rs:543-591`): one 16-aligned
        stack allocation holding args in order then the return slot;
        RP(X10) = return ptr, SP(X2) = allocation base."""
        size = call_data.alloc_size()
        memory.try_push_arg_onto_stack([0] * size, 16)
        sp = memory.stack_ptr
        cursor = sp
        for arg in call_data.args:
            align = arg.alignment
            cursor += (align - cursor % align) % align
            for b in arg.bytes:
                memory.store_byte(cursor, b)
                cursor += 1
        return_ptr = 0
        if call_data.return_size > 0:
            align = call_data.return_alignment
            cursor += (align - cursor % align) % align
            return_ptr = cursor
        self.registers[RP] = PtVal(return_ptr, 32)
        self.registers[SP] = PtVal(sp, 32)
        return return_ptr

    # ------------------------------------------------------------------
    # gas
    # ------------------------------------------------------------------

    def _gas(self, amount: int):
        self.gas_used += amount
        if self.gas_limit is not None and self.gas_used > self.gas_limit:
            raise OutOfGas(f"gas used {self.gas_used} > limit {self.gas_limit}")

    # ------------------------------------------------------------------
    # encrypted-op plumbing
    # ------------------------------------------------------------------

    def _lift(self, v, width=None) -> CtVal:
        """Trivially lift a plaintext register to GLWE bits
        (≙ `register_to_l1glwe_by_trivial_lift`, `proc/mod.rs:205-217`)."""
        if isinstance(v, CtVal):
            return v
        import jax.numpy as jnp

        w = width or v.width
        n = self.ev.params.l1_params.degree
        bits = []
        for i in range(w):
            poly = jnp.zeros((n,), dtype=jnp.uint64).at[0].set((v.val >> i) & 1)
            bits.append(self.ev.enc.trivial_glwe_l1(poly))
        return CtVal(bits, w)

    def _run_mux(self, circuit, operand_bits: list) -> list:
        """Graft a mux circuit over the given GLWE bit ciphertexts and
        execute it; returns output GLWE bits."""
        g = FheCircuit()
        inputs = {}
        input_nodes = []
        for i, bit_ct in enumerate(operand_bits):
            key = f"b{i}"
            node = g.add_node(FheOp.INPUT_GLWE1, key)
            ggsw = g.insert_ciphertext_conversion(node, CtType.GLWE1, CtType.GGSW1)
            input_nodes.append(ggsw)
            inputs[key] = bit_ct
        outs = g.insert_mux_circuit(circuit, input_nodes)
        out_keys = []
        for j, o in enumerate(outs):
            key = f"o{j}"
            node = g.add_node(FheOp.OUTPUT_GLWE1, key)
            g.add_edge(o, node, FheEdge.UNARY)
            out_keys.append(key)
        result = self.ex.run(g, inputs)
        return [result[k] for k in out_keys]

    # ------------------------------------------------------------------
    # instruction execution
    # ------------------------------------------------------------------

    def _execute(self, instr, pc: int, memory: Memory) -> int:
        name = instr.name
        regs = self.registers

        if name == "LoadI":
            self._gas(GAS_PLAIN)
            regs[instr.dst] = PtVal(instr.imm & self._mask(instr.width), instr.width)
        elif name == "Move":
            self._gas(GAS_PLAIN)
            regs[instr.dst] = regs[instr.src]
        elif name in ("Trunc", "Zext", "Sext"):
            self._gas(GAS_PLAIN)
            regs[instr.dst] = self._cast(regs[instr.src], instr.width, name)
        elif name == "Load":
            self._exec_load(instr, memory)
        elif name == "Store":
            self._exec_store(instr, memory)
        elif name in ("Add", "Sub", "Mul", "And", "Or", "Xor"):
            self._exec_binary(instr, name)
        elif name in ("AddC", "SubB"):
            self._exec_carry(instr, name)
        elif name == "Neg":
            self._exec_neg(instr)
        elif name == "Not":
            self._exec_not(instr)
        elif name.startswith("Cmp"):
            self._exec_cmp(instr, name)
        elif name in ("Shl", "Shr", "Shra", "Rotl", "Rotr"):
            self._exec_shift(instr, name)
        elif name == "Cmux":
            self._exec_cmux(instr)
        elif name == "BranchNonZero":
            cond = regs[instr.cond]
            if not isinstance(cond, PtVal):
                raise BranchConditionNotPlaintext()
            self._gas(GAS_PLAIN)
            return (pc + instr.pc_offset) & 0xFFFFFFFF if cond.val != 0 else pc + INSTRUCTION_SIZE
        elif name == "BranchZero":
            cond = regs[instr.cond]
            if not isinstance(cond, PtVal):
                raise BranchConditionNotPlaintext()
            self._gas(GAS_PLAIN)
            return (pc + instr.pc_offset) & 0xFFFFFFFF if cond.val == 0 else pc + INSTRUCTION_SIZE
        elif name == "Branch":
            self._gas(GAS_PLAIN)
            return (pc + instr.pc_offset) & 0xFFFFFFFF
        elif name == "Dbg":
            handler = self.debug_handlers.get(instr.handler_id)
            if handler is not None:
                handler(regs[instr.src])
        else:
            raise CpuError(f"unhandled instruction {name}")
        return pc + INSTRUCTION_SIZE

    # --- helpers ---

    @staticmethod
    def _mask(width: int) -> int:
        return (1 << width) - 1

    @staticmethod
    def _signed(val: int, width: int) -> int:
        return val - (1 << width) if val >> (width - 1) else val

    def _cast(self, v, width: int, kind: str):
        """zext appends trivial zeros, sext replicates the MSB handle,
        trunc drops handles (`proc/ops/casting.rs:15-147`)."""
        if isinstance(v, PtVal):
            if kind == "Trunc":
                return PtVal(v.val & self._mask(width), width)
            if kind == "Zext":
                return PtVal(v.val, width)
            sval = self._signed(v.val, v.width)
            return PtVal(sval & self._mask(width), width)
        if kind == "Trunc":
            return CtVal(v.bits[:width], width)
        if width <= v.width:
            return CtVal(v.bits[:width], width)
        if kind == "Zext":
            zero = self._lift(PtVal(0, 1)).bits[0]
            return CtVal(list(v.bits) + [zero] * (width - v.width), width)
        return CtVal(list(v.bits) + [v.bits[-1]] * (width - v.width), width)

    def _exec_binary(self, instr, name):
        a, b = self.registers[instr.a], self.registers[instr.b]
        if a.width != b.width:
            raise WidthMismatch(f"{name}: {a.width} != {b.width}")
        w = a.width
        if isinstance(a, PtVal) and isinstance(b, PtVal):
            self._gas(GAS_PLAIN)
            fn = {
                "Add": lambda x, y: x + y,
                "Sub": lambda x, y: x - y,
                "Mul": lambda x, y: x * y,
                "And": lambda x, y: x & y,
                "Or": lambda x, y: x | y,
                "Xor": lambda x, y: x ^ y,
            }[name]
            self.registers[instr.dst] = PtVal(fn(a.val, b.val) & self._mask(w), w)
            return
        self._gas(GAS_CIPHERTEXT_MUL if name == "Mul" else GAS_CIPHERTEXT)
        ca, cb = self._lift(a), self._lift(b)
        circuit = {
            "Add": lambda: int_circuits.ripple_carry_adder(w, emit_carry=False),
            "Sub": lambda: int_circuits.full_subtractor(w, emit_borrow=False),
            "Mul": lambda: None,
            "And": lambda: int_circuits.bitwise_and(w),
            "Or": lambda: int_circuits.bitwise_or(w),
            "Xor": lambda: int_circuits.bitwise_xor(w),
        }[name]()
        if name == "Mul":
            outs = self._mul_bits(ca.bits, cb.bits, w)
        else:
            outs = self._run_mux(circuit, ca.bits + cb.bits)
        self.registers[instr.dst] = CtVal(outs[:w], w)

    def _mul_bits(self, a_bits, b_bits, w):
        """Low word of the product (`proc/ops/mul.rs`); gradeschool
        decomposition above the circuit cutoff."""
        if w <= int_circuits.CIRCUIT_CUTOFF:
            outs = self._run_mux(
                int_circuits.unsigned_multiplier(w, w), a_bits + b_bits
            )
            return outs[:w]
        # low word only: (a_lo*b_lo) + ((a_lo*b_hi + a_hi*b_lo) << lo_n), truncated
        lo_n, _hi_n = int_circuits.partition_integer(w)
        ll_full = self._run_mux(
            int_circuits.unsigned_multiplier(lo_n, lo_n), a_bits[:lo_n] + b_bits[:lo_n]
        )
        lh = self._mul_bits(a_bits[:lo_n], b_bits[lo_n:w], w - lo_n)
        hl = self._mul_bits(a_bits[lo_n:w], b_bits[:lo_n], w - lo_n)
        hi_sum = self._run_mux(
            int_circuits.ripple_carry_adder(w - lo_n, emit_carry=False), lh + hl
        )
        top = self._run_mux(
            int_circuits.ripple_carry_adder(w - lo_n, emit_carry=False),
            ll_full[lo_n:w] + hi_sum,
        )
        return ll_full[:lo_n] + top

    def _exec_carry(self, instr, name):
        a, b = self.registers[instr.a], self.registers[instr.b]
        cin = self.registers[instr.carry_in if name == "AddC" else instr.borrow_in]
        if a.width != b.width:
            raise WidthMismatch(f"{name}: {a.width} != {b.width}")
        w = a.width
        if all(isinstance(x, PtVal) for x in (a, b, cin)):
            self._gas(GAS_PLAIN)
            c = cin.val & 1
            if name == "AddC":
                total = a.val + b.val + c
                self.registers[instr.dst] = PtVal(total & self._mask(w), w)
                self.registers[instr.carry_out] = PtVal(total >> w, 1)
            else:
                total = a.val - b.val - c
                self.registers[instr.dst] = PtVal(total & self._mask(w), w)
                self.registers[instr.borrow_out] = PtVal(1 if total < 0 else 0, 1)
            return
        self._gas(GAS_CIPHERTEXT)
        ca, cb, cc = self._lift(a), self._lift(b), self._lift(cin, 1)
        if name == "AddC":
            circuit = int_circuits.ripple_carry_adder(w, carry_in=True, emit_carry=True)
        else:
            circuit = int_circuits.full_subtractor(w, borrow_in=True, emit_borrow=True)
        outs = self._run_mux(circuit, ca.bits + cb.bits + [cc.bits[0]])
        self.registers[instr.dst] = CtVal(outs[:w], w)
        out_reg = instr.carry_out if name == "AddC" else instr.borrow_out
        self.registers[out_reg] = CtVal([outs[w]], 1)

    def _exec_neg(self, instr):
        v = self.registers[instr.src]
        w = v.width
        if isinstance(v, PtVal):
            self._gas(GAS_PLAIN)
            self.registers[instr.dst] = PtVal((-v.val) & self._mask(w), w)
            return
        self._gas(GAS_CIPHERTEXT)
        outs = self._run_mux(int_circuits.negate(w), v.bits)
        self.registers[instr.dst] = CtVal(outs, w)

    def _exec_not(self, instr):
        v = self.registers[instr.src]
        w = v.width
        if isinstance(v, PtVal):
            self._gas(GAS_PLAIN)
            self.registers[instr.dst] = PtVal((~v.val) & self._mask(w), w)
            return
        # NOT on GLWE bits is keyless (x + trivial(1); `evaluation.rs:48`)
        self._gas(GAS_PLAIN)
        self.registers[instr.dst] = CtVal(
            [self.ev.not_(b) for b in v.bits], w
        )

    def _exec_cmp(self, instr, name):
        a, b = self.registers[instr.a], self.registers[instr.b]
        if a.width != b.width:
            raise WidthMismatch(f"{name}: {a.width} != {b.width}")
        w = a.width
        if isinstance(a, PtVal) and isinstance(b, PtVal):
            self._gas(GAS_PLAIN)
            av, bv = a.val, b.val
            if name.endswith("S"):
                av, bv = self._signed(av, w), self._signed(bv, w)
            result = {
                "CmpEq": av == bv,
                "CmpGt": av > bv, "CmpGtS": av > bv,
                "CmpGe": av >= bv, "CmpGeS": av >= bv,
                "CmpLt": av < bv, "CmpLtS": av < bv,
                "CmpLe": av <= bv, "CmpLeS": av <= bv,
            }[name]
            self.registers[instr.dst] = PtVal(int(result), 1)
            return
        self._gas(GAS_CIPHERTEXT)
        ca, cb = self._lift(a), self._lift(b)
        signed = name.endswith("S")
        if name == "CmpEq":
            circ = int_circuits.compare_equal(w)
            bits = ca.bits + cb.bits
        elif name in ("CmpGt", "CmpGtS"):
            circ = int_circuits.compare_or_maybe_equal(w, False, signed)
            bits = ca.bits + cb.bits
        elif name in ("CmpGe", "CmpGeS"):
            circ = int_circuits.compare_or_maybe_equal(w, True, signed)
            bits = ca.bits + cb.bits
        elif name in ("CmpLt", "CmpLtS"):
            circ = int_circuits.compare_or_maybe_equal(w, False, signed)
            bits = cb.bits + ca.bits  # a < b  <=>  b > a
        else:  # CmpLe / CmpLeS
            circ = int_circuits.compare_or_maybe_equal(w, True, signed)
            bits = cb.bits + ca.bits
        outs = self._run_mux(circ, bits)
        self.registers[instr.dst] = CtVal(outs, 1)

    def _exec_shift(self, instr, name):
        v = self.registers[instr.src]
        amt = self.registers[instr.shift]
        w = v.width
        if isinstance(v, PtVal) and isinstance(amt, PtVal):
            self._gas(GAS_PLAIN)
            s = amt.val % w if name in ("Rotl", "Rotr") else min(amt.val, w)
            val = v.val
            if name == "Shl":
                out = (val << s) & self._mask(w) if s < w else 0
            elif name == "Shr":
                out = val >> s if s < w else 0
            elif name == "Shra":
                out = (self._signed(val, w) >> s) & self._mask(w) if s < w else (
                    self._mask(w) if val >> (w - 1) else 0
                )
            elif name == "Rotl":
                out = ((val << s) | (val >> (w - s))) & self._mask(w) if s else val
            else:
                out = ((val >> s) | (val << (w - s))) & self._mask(w) if s else val
            self.registers[instr.dst] = PtVal(out, w)
            return
        if isinstance(amt, PtVal):
            # plaintext amount: pure handle permutation + fill
            # (`proc/ops/bitshift.rs:50-90`)
            self._gas(GAS_PLAIN)
            cv = self._lift(v)
            s = amt.val % w if name in ("Rotl", "Rotr") else min(amt.val, w)
            zero = self._lift(PtVal(0, 1)).bits[0]
            bits = cv.bits
            if name == "Shl":
                out = [zero] * s + bits[: w - s]
            elif name == "Shr":
                out = bits[s:] + [zero] * s
            elif name == "Shra":
                out = bits[s:] + [bits[-1]] * s
            elif name == "Rotl":
                out = bits[w - s :] + bits[: w - s] if s else list(bits)
            else:
                out = bits[s:] + bits[:s] if s else list(bits)
            self.registers[instr.dst] = CtVal(out[:w], w)
            return
        # encrypted amount: barrel shifter over log2(w) amount bits
        self._gas(GAS_CIPHERTEXT)
        cv = self._lift(v)
        ca = self._lift(amt)
        shift_bits = max(1, (w - 1).bit_length())
        direction = int_circuits.LEFT if name in ("Shl", "Rotl") else int_circuits.RIGHT
        mode = (
            int_circuits.ROTATE
            if name in ("Rotl", "Rotr")
            else int_circuits.ARITHMETIC
            if name == "Shra"
            else int_circuits.LOGICAL
        )
        circ = int_circuits.bitshift(w, shift_bits, direction, mode)
        outs = self._run_mux(circ, cv.bits + ca.bits[:shift_bits])
        self.registers[instr.dst] = CtVal(outs, w)

    def _exec_cmux(self, instr):
        cond = self.registers[instr.cond]
        a, b = self.registers[instr.a], self.registers[instr.b]
        if a.width != b.width:
            raise WidthMismatch("Cmux operand widths differ")
        w = a.width
        if isinstance(cond, PtVal):
            self._gas(GAS_PLAIN)
            self.registers[instr.dst] = a if cond.val != 0 else b
            return
        self._gas(GAS_CIPHERTEXT)
        ca, cb = self._lift(a), self._lift(b)
        g = FheCircuit()
        inputs = {"cond": cond.bits[0]}
        cnode = g.add_node(FheOp.INPUT_GLWE1, "cond")
        sel = g.insert_ciphertext_conversion(cnode, CtType.GLWE1, CtType.GGSW1)
        out_keys = []
        for i in range(w):
            ka, kb = f"a{i}", f"b{i}"
            na = g.add_node(FheOp.INPUT_GLWE1, ka)
            nb = g.add_node(FheOp.INPUT_GLWE1, kb)
            inputs[ka], inputs[kb] = ca.bits[i], cb.bits[i]
            m = g.add_node(FheOp.CMUX)
            g.add_edge(sel, m, FheEdge.SEL)
            g.add_edge(nb, m, FheEdge.LOW)
            g.add_edge(na, m, FheEdge.HIGH)
            ko = f"o{i}"
            o = g.add_node(FheOp.OUTPUT_GLWE1, ko)
            g.add_edge(m, o, FheEdge.UNARY)
            out_keys.append(ko)
        result = self.ex.run(g, inputs)
        self.registers[instr.dst] = CtVal([result[k] for k in out_keys], w)

    # --- memory ops ---

    def _exec_load(self, instr, memory: Memory):
        base = self.registers[instr.src]
        if not isinstance(base, PtVal):
            raise CpuError("encrypted load address")
        w = instr.width
        nbytes = (w + 7) // 8
        addr = (base.val + instr.offset) & 0xFFFFFFFF
        bs = memory.load_bytes(addr, nbytes)
        enc_flags = [isinstance(b, EncByte) for b in bs]
        if any(enc_flags) and not all(enc_flags):
            raise CpuError("mixed plaintext/ciphertext load")
        if not any(enc_flags):
            self._gas(GAS_PLAIN)
            val = sum(b << (8 * i) for i, b in enumerate(bs))
            self.registers[instr.dst] = PtVal(val & self._mask(w), w)
        else:
            self._gas(GAS_PLAIN)  # handle moves only
            bits = []
            for b in bs:
                bits.extend(b.bits)
            self.registers[instr.dst] = CtVal(bits[:w], w)

    def _exec_store(self, instr, memory: Memory):
        base = self.registers[instr.dst]
        if not isinstance(base, PtVal):
            raise CpuError("encrypted store address")
        v = self.registers[instr.src]
        w = instr.width
        nbytes = (w + 7) // 8
        addr = (base.val + instr.offset) & 0xFFFFFFFF
        self._gas(GAS_PLAIN)
        if isinstance(v, PtVal):
            bs = [(v.val >> (8 * i)) & 0xFF for i in range(nbytes)]
        else:
            cv = self._cast(v, nbytes * 8, "Zext")
            bs = [EncByte(cv.bits[8 * i : 8 * i + 8]) for i in range(nbytes)]
        memory.store_bytes(addr, bs)
