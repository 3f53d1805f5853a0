"""Parasol CPU tests: ISA encode/decode, hand-assembled programs
(plaintext and encrypted), faults, and ELF loading — mirroring the
reference's `proc/tests` + `tests/e2e_tests` strategy (SURVEY §4.3-4.4)."""

import os

import jax
import pytest

from spf_tpu.cpu import ArgsBuilder, FheComputer, Memory, run_program
from spf_tpu.cpu.args import decode_plaintext_return, decrypt_return
from spf_tpu.cpu.isa import RP, SP, Asm, decode, encode
from spf_tpu.cpu.memory import EncByte, UnalignedAccess
from spf_tpu.cpu.processor import (
    BranchConditionNotPlaintext,
    OutOfGas,
    PtVal,
)
from spf_tpu.params import GlweDef, LweDef, Params, RadixDecomposition
from spf_tpu.runtime import Evaluation, generate_keys

TEST_PARAMS = Params(
    l0_params=LweDef(dim=128, std=1e-16),
    l1_params=GlweDef(size=1, degree=256, std=1e-16),
    cbs_radix=RadixDecomposition(count=2, radix_log=9),
    pbs_radix=RadixDecomposition(count=2, radix_log=16),
    ks_radix=RadixDecomposition(count=9, radix_log=4),
    pfks_radix=RadixDecomposition(count=4, radix_log=11),
    ss_radix=RadixDecomposition(count=6, radix_log=8),
    tr_radix=RadixDecomposition(count=6, radix_log=7),
)

KEY = jax.random.key(2718)
REF_ELF = "/root/reference/parasol_cpu/tests/test_data/add"


@pytest.fixture(scope="module")
def material():
    sk, _, ck = generate_keys(KEY, TEST_PARAMS)
    ev = Evaluation(ck, TEST_PARAMS)
    return sk, ev


class TestIsa:
    def test_encode_decode_roundtrip(self):
        progs = (
            Asm()
            .loadi(3, 0xDEAD, 32)
            .load(4, 3, 16, offset=-8)
            .store(3, 4, 128, offset=12)
            .add(5, 3, 4)
            .addc(5, 6, 3, 4, 7)
            .subb(5, 6, 3, 4, 7)
            .cmp_gt_s(8, 3, 4)
            .branch_nonzero(8, -16)
            .branch(24)
            .cmux(9, 8, 3, 4)
            .shra(10, 3, 4)
            .sext(11, 3, 64)
            .dbg(3, 7)
            .ret()
        )
        for instr in progs.instrs:
            word = encode(instr)
            assert 0 <= word < (1 << 64)
            back = decode(word)
            assert back.name == instr.name
            assert back.operands == instr.operands, instr.name

    def test_width_128_encoding(self):
        instr = Asm().load(1, 2, 128).instrs[0]
        w = encode(instr)
        assert decode(w).operands["width"] == 128


class TestPlaintextPrograms:
    def test_loop_sum(self, material):
        """sum 1..10 with branches (plaintext control flow)."""
        _, ev = material
        # r1 = counter, r2 = acc, r3 = limit, r4 = one, r5 = cond
        asm = (
            Asm()
            .loadi(1, 1, 32)
            .loadi(2, 0, 32)
            .loadi(3, 11, 32)
            .loadi(4, 1, 32)
            .add(2, 2, 1)       # acc += i      (pc 24)
            .add(1, 1, 4)       # i += 1
            .cmp_lt(5, 1, 3)    # i < 11
            .branch_nonzero(5, -24)
            .store(10, 2, 32)   # store acc to return ptr
            .ret()
        )
        mem = Memory()
        entry = mem.allocate_program(asm.instrs)
        proc = FheComputer(ev)
        call = ArgsBuilder().return_value(32, encrypted=False).build()
        rp = proc.run_program(entry, mem, call)
        assert decode_plaintext_return(mem, rp, 4) == 55

    def test_arithmetic_ops(self, material):
        _, ev = material
        asm = (
            Asm()
            .loadi(1, 200, 8)
            .loadi(2, 100, 8)
            .add(3, 1, 2)      # 44 (wraps)
            .mul(4, 1, 2)      # 200*100 % 256 = 32
            .sub(5, 1, 2)      # 100
            .xor(6, 1, 2)      # 172
            .shra(7, 1, 2)     # shift amount 100 -> clamp
            .store(10, 3, 8, offset=0)
            .store(10, 4, 8, offset=1)
            .store(10, 5, 8, offset=2)
            .store(10, 6, 8, offset=3)
            .ret()
        )
        mem = Memory()
        entry = mem.allocate_program(asm.instrs)
        proc = FheComputer(ev)
        call = ArgsBuilder().return_value(32, encrypted=False).build()
        rp = proc.run_program(entry, mem, call)
        vals = [mem.load_byte(rp + i) for i in range(4)]
        assert vals == [44, 32, 100, 172]


class TestEncryptedPrograms:
    def test_encrypted_add(self, material):
        """The `basic_add` parity config: encrypted u8 a+b via the
        stack-based ABI (args loaded from memory, result stored to RP)."""
        sk, ev = material
        asm = (
            Asm()
            .load(1, SP, 8, offset=0)   # a (encrypted byte)
            .load(2, SP, 8, offset=1)   # b
            .add(3, 1, 2)
            .store(RP, 3, 8)
            .ret()
        )
        mem = Memory()
        entry = mem.allocate_program(asm.instrs)
        proc = FheComputer(ev)
        a = ev.enc.encrypt_uint_bits(jax.random.fold_in(KEY, 1), 42, 8, sk)
        b = ev.enc.encrypt_uint_bits(jax.random.fold_in(KEY, 2), 54, 8, sk)
        call = (
            ArgsBuilder()
            .arg_encrypted(a)
            .arg_encrypted(b)
            .return_value(8, encrypted=True)
            .build()
        )
        rp = proc.run_program(entry, mem, call)
        assert decrypt_return(mem, rp, 1, ev.enc, sk) == 96
        assert proc.gas_used >= 100_000

    def test_encrypted_mul32_gradeschool(self, material):
        """32x32 encrypted multiply through the Mul instruction: widths
        above CIRCUIT_CUTOFF compose gradeschool 16x16 blocks
        (≙ `mul.rs:254-272`); this is the `bench.py --program mul32`
        program at toy params."""
        sk, ev = material
        asm = (
            Asm()
            .load(1, SP, 32, offset=0)
            .load(2, SP, 32, offset=4)
            .mul(3, 1, 2)
            .store(RP, 3, 32)
            .ret()
        )
        mem = Memory()
        entry = mem.allocate_program(asm.instrs)
        proc = FheComputer(ev)
        a_v, b_v = 51977, 40961
        a = ev.enc.encrypt_uint_bits(jax.random.fold_in(KEY, 31), a_v, 32, sk)
        b = ev.enc.encrypt_uint_bits(jax.random.fold_in(KEY, 32), b_v, 32, sk)
        call = (
            ArgsBuilder().arg_encrypted(a).arg_encrypted(b)
            .return_value(32).build()
        )
        rp = proc.run_program(entry, mem, call)
        assert decrypt_return(mem, rp, 4, ev.enc, sk) == (a_v * b_v) & 0xFFFFFFFF

    def test_encrypted_cmux_and_compare(self, material):
        """max(a, b) via CmpGt + Cmux over encrypted bytes."""
        sk, ev = material
        asm = (
            Asm()
            .load(1, SP, 8, offset=0)
            .load(2, SP, 8, offset=1)
            .cmp_gt(3, 1, 2)
            .cmux(4, 3, 1, 2)
            .store(RP, 4, 8)
            .ret()
        )
        mem = Memory()
        entry = mem.allocate_program(asm.instrs)
        proc = FheComputer(ev)
        a = ev.enc.encrypt_uint_bits(jax.random.fold_in(KEY, 3), 57, 8, sk)
        b = ev.enc.encrypt_uint_bits(jax.random.fold_in(KEY, 4), 201, 8, sk)
        call = (
            ArgsBuilder()
            .arg_encrypted(a)
            .arg_encrypted(b)
            .return_value(8, encrypted=True)
            .build()
        )
        rp = proc.run_program(entry, mem, call)
        assert decrypt_return(mem, rp, 1, ev.enc, sk) == 201

    def test_mixed_plain_encrypted(self, material):
        """encrypted * plaintext constant (trivial lift)."""
        sk, ev = material
        asm = (
            Asm()
            .load(1, SP, 8, offset=0)
            .loadi(2, 3, 8)
            .mul(3, 1, 2)
            .store(RP, 3, 8)
            .ret()
        )
        mem = Memory()
        entry = mem.allocate_program(asm.instrs)
        proc = FheComputer(ev)
        a = ev.enc.encrypt_uint_bits(jax.random.fold_in(KEY, 5), 21, 8, sk)
        call = ArgsBuilder().arg_encrypted(a).return_value(8, encrypted=True).build()
        rp = proc.run_program(entry, mem, call)
        assert decrypt_return(mem, rp, 1, ev.enc, sk) == 63


class TestFaults:
    def test_encrypted_branch_condition_faults(self, material):
        sk, ev = material
        asm = Asm().load(1, SP, 8, offset=0).branch_nonzero(1, 8).ret()
        mem = Memory()
        entry = mem.allocate_program(asm.instrs)
        proc = FheComputer(ev)
        a = ev.enc.encrypt_uint_bits(jax.random.fold_in(KEY, 6), 1, 8, sk)
        call = ArgsBuilder().arg_encrypted(a).no_return_value().build()
        with pytest.raises(BranchConditionNotPlaintext):
            proc.run_program(entry, mem, call)

    def test_out_of_gas(self, material):
        _, ev = material
        asm = Asm().loadi(1, 0, 32).branch(-0).ret()  # infinite loop at branch 0
        # branch(0) jumps to itself forever
        asm.instrs[1].operands["pc_offset"] = 0
        mem = Memory()
        entry = mem.allocate_program(asm.instrs)
        proc = FheComputer(ev)
        with pytest.raises(OutOfGas):
            proc.run_program(entry, mem, None, gas_limit=1000)

    def test_unaligned_access(self, material):
        _, ev = material
        asm = Asm().loadi(1, 3, 32).load(2, 1, 32).ret()
        mem = Memory()
        entry = mem.allocate_program(asm.instrs)
        proc = FheComputer(ev)
        with pytest.raises(UnalignedAccess):
            proc.run_program(entry, mem, None)


@pytest.mark.skipif(not os.path.exists(REF_ELF), reason="reference ELF unavailable")
class TestElf:
    def test_load_reference_elf(self):
        with open(REF_ELF, "rb") as f:
            data = f.read()
        mem = Memory.new_from_elf(data)
        assert "add" in mem.function_entries

    def test_disassemble_reference_elf(self):
        """Every instruction of the reference-compiled `add` program must
        decode (ISA encoding parity with Parasol-clang)."""
        with open(REF_ELF, "rb") as f:
            data = f.read()
        mem = Memory.new_from_elf(data)
        entry = mem.get_function_entry("add")
        names = []
        pc = entry
        for _ in range(64):
            word = mem.try_load_plaintext_dword(pc)
            instr = decode(word)
            names.append(instr.name)
            if instr.name == "Ret":
                break
            pc += 8
        assert names[-1] == "Ret"
        assert "Add" in names, names

    def test_run_reference_elf_encrypted(self, material):
        """Decrypt-level parity with the reference's `can_run_from_elf`
        (`tests/e2e_tests/add.rs:9-30`): add(42, 54) == 96."""
        sk, ev = material
        with open(REF_ELF, "rb") as f:
            data = f.read()
        a = ev.enc.encrypt_uint_bits(jax.random.fold_in(KEY, 7), 42, 8, sk)
        b = ev.enc.encrypt_uint_bits(jax.random.fold_in(KEY, 8), 54, 8, sk)
        call = (
            ArgsBuilder()
            .arg_encrypted(a)
            .arg_encrypted(b)
            .return_value(8, encrypted=True)
            .build()
        )
        mem, rp, _ = run_program(ev, data, "add", call)
        assert decrypt_return(mem, rp, 1, ev.enc, sk) == 96


class TestStructArgs:
    def test_struct_argument(self, material):
        """Plaintext struct passed by bytes (IntoBytes parity): the
        program loads two u8 fields from the struct and adds them."""
        _, ev = material
        asm = (
            Asm()
            .load(1, SP, 8, offset=0)
            .load(2, SP, 8, offset=1)
            .add(3, 1, 2)
            .store(RP, 3, 8)
            .ret()
        )
        mem = Memory()
        entry = mem.allocate_program(asm.instrs)
        proc = FheComputer(ev)
        call = (
            ArgsBuilder()
            .arg_struct([(19, 8), (23, 8)])
            .return_value(8, encrypted=False)
            .build()
        )
        rp = proc.run_program(entry, mem, call)
        assert decode_plaintext_return(mem, rp, 1) == 42
