"""Run the reference's entire compiled-ELF e2e corpus on the encrypted
CPU and assert decrypt-level parity with the reference's expectations
(≙ `/root/reference/parasol_cpu/tests/e2e_tests/*.rs`; binaries are the
checked-in Parasol-clang outputs in `tests/test_data/`).

These flush bugs in encrypted load/store, casting chains, loops, and
the ABI that hand-assembled programs cannot (VERDICT r1 item #3).
"""

import os

import jax
import pytest

from spf_tpu.cpu import ArgsBuilder, Memory, run_program
from spf_tpu.cpu.args import decrypt_return, read_return_bytes
from spf_tpu.cpu.memory import EncByte
from spf_tpu.params import GlweDef, LweDef, Params, RadixDecomposition
from spf_tpu.runtime import Evaluation, generate_keys

TEST_DATA = "/root/reference/parasol_cpu/tests/test_data"

# smallest toy set the conversion cycle is stable at under sigma=1e-16:
# the corpus exercises program/ABI semantics, not crypto margins, and
# the suite must stay runnable (dim 128 / N 256 took 82 min)
TEST_PARAMS = Params(
    l0_params=LweDef(dim=64, std=1e-16),
    l1_params=GlweDef(size=1, degree=128, std=1e-16),
    cbs_radix=RadixDecomposition(count=2, radix_log=9),
    pbs_radix=RadixDecomposition(count=2, radix_log=16),
    ks_radix=RadixDecomposition(count=9, radix_log=4),
    pfks_radix=RadixDecomposition(count=4, radix_log=11),
    ss_radix=RadixDecomposition(count=6, radix_log=8),
    tr_radix=RadixDecomposition(count=6, radix_log=7),
)

KEY = jax.random.key(4242)
pytestmark = pytest.mark.skipif(
    not os.path.isdir(TEST_DATA), reason="reference ELF corpus unavailable"
)


def k(i):
    return jax.random.fold_in(KEY, i)


@pytest.fixture(scope="module")
def material():
    sk, _, ck = generate_keys(KEY, TEST_PARAMS)
    ev = Evaluation(ck, TEST_PARAMS)
    return sk, ev


def elf(name: str) -> bytes:
    with open(os.path.join(TEST_DATA, name), "rb") as f:
        return f.read()


def enc_uint(ev, sk, value: int, width: int, seed: int):
    """Encrypt an integer as GLWE bit handles (LSB-first)."""
    return ev.enc.encrypt_uint_bits(k(seed), value, width, sk)


def enc_bytes(bit_cts):
    assert len(bit_cts) % 8 == 0
    return [EncByte(bit_cts[8 * i : 8 * i + 8]) for i in range(len(bit_cts) // 8)]


def alloc_store(memory, byts, align=16) -> int:
    """try_allocate_type analog: allocate and store a byte list."""
    addr = memory.try_allocate(len(byts), align)
    for i, b in enumerate(byts):
        memory.store_byte(addr + i, b)
    return addr


def read_enc_uint(memory, addr, n_bytes, ev, sk) -> int:
    return decrypt_return(memory, addr, n_bytes, ev.enc, sk)


class TestAdd:
    def test_add(self, material):
        sk, ev = material
        call = (
            ArgsBuilder()
            .arg_encrypted(enc_uint(ev, sk, 42, 8, 1))
            .arg_encrypted(enc_uint(ev, sk, 54, 8, 2))
            .return_value(8)
            .build()
        )
        mem, rp, _ = run_program(ev, elf("add"), "add", call)
        assert decrypt_return(mem, rp, 1, ev.enc, sk) == 96


class TestCmux:
    @pytest.mark.parametrize("cond,expected", [(42, 54), (10, 11)])
    def test_cmux(self, material, cond, expected):
        sk, ev = material
        call = (
            ArgsBuilder()
            .arg_encrypted(enc_uint(ev, sk, cond, 8, 3))
            .arg_encrypted(enc_uint(ev, sk, 54, 8, 4))
            .arg_encrypted(enc_uint(ev, sk, 11, 8, 5))
            .return_value(8)
            .build()
        )
        mem, rp, _ = run_program(ev, elf("cmux"), "cmux", call)
        assert decrypt_return(mem, rp, 1, ev.enc, sk) == expected


class TestVectorAdd:
    def test_vector_add(self, material):
        sk, ev = material
        memory = Memory.new_from_elf(elf("vector_add"))
        data = []
        for i in range(8):
            data.extend(enc_bytes(enc_uint(ev, sk, i, 8, 10 + i)))
        a = alloc_store(memory, data)
        bptr = alloc_store(memory, list(data))
        c = alloc_store(memory, [0] * 8)
        call = (
            ArgsBuilder().arg(a, 32).arg(bptr, 32).arg(c, 32).no_return_value().build()
        )
        run_program(ev, memory, "vector_add", call)
        for i in range(8):
            assert read_enc_uint(memory, c + i, 1, ev, sk) == 2 * i


class TestForLoop:
    def test_for_loop(self, material):
        sk, ev = material
        memory = Memory.new_from_elf(elf("for_loop"))
        data = []
        for i in range(8):
            data.extend(enc_bytes(enc_uint(ev, sk, i, 32, 20 + i)))
        a = alloc_store(memory, data)
        call = ArgsBuilder().arg(a, 32).arg(8, 32).return_value(32).build()
        _, rp, _ = run_program(ev, memory, "for_loop", call)
        assert decrypt_return(memory, rp, 4, ev.enc, sk) == 28


class TestPayment:
    def test_payment(self, material):
        sk, ev = material
        memory = Memory.new_from_elf(elf("payment"))
        balance = alloc_store(memory, enc_bytes(enc_uint(ev, sk, 42, 32, 30)))
        call = (
            ArgsBuilder()
            .arg_encrypted(enc_uint(ev, sk, 26, 32, 31))
            .arg(balance, 32)
            .no_return_value()
            .build()
        )
        run_program(ev, memory, "payment", call)
        assert read_enc_uint(memory, balance, 4, ev, sk) == 16


class TestTransfer:
    def test_transfer(self, material):
        sk, ev = material
        memory = Memory.new_from_elf(elf("transfer"))
        sender = alloc_store(memory, enc_bytes(enc_uint(ev, sk, 42, 32, 40)))
        receiver = alloc_store(memory, enc_bytes(enc_uint(ev, sk, 29, 32, 41)))
        call = (
            ArgsBuilder()
            .arg(sender, 32)
            .arg(receiver, 32)
            .arg_encrypted(enc_uint(ev, sk, 26, 32, 42))
            .no_return_value()
            .build()
        )
        run_program(ev, memory, "transfer", call)
        assert read_enc_uint(memory, sender, 4, ev, sk) == 16
        assert read_enc_uint(memory, receiver, 4, ev, sk) == 55


class TestPrng:
    def test_xor_shift(self, material):
        sk, ev = material
        memory = Memory.new_from_elf(elf("prng"))
        rng = alloc_store(memory, enc_bytes(enc_uint(ev, sk, 1234, 16, 50)))
        call = ArgsBuilder().arg(rng, 32).no_return_value().build()
        run_program(ev, memory, "xor_shift", call)
        assert read_enc_uint(memory, rng, 2, ev, sk) == 35300


class TestZextAndTrunc:
    def test_zext_and_trunc(self, material):
        sk, ev = material
        memory = Memory.new_from_elf(elf("zext_and_trunc"))
        u32_ptr = alloc_store(memory, enc_bytes(enc_uint(ev, sk, 0, 32, 60)))
        u8_ptr = alloc_store(memory, enc_bytes(enc_uint(ev, sk, 0, 8, 61)))
        bool_ptr = alloc_store(memory, enc_bytes(enc_uint(ev, sk, 0, 8, 62)))
        cmp_ptr = alloc_store(memory, enc_bytes(enc_uint(ev, sk, 0, 32, 63)))
        call = (
            ArgsBuilder()
            .arg_encrypted(enc_uint(ev, sk, 42, 8, 64))
            .arg_encrypted(enc_uint(ev, sk, 123456789, 32, 65))
            .arg(u32_ptr, 32)
            .arg(u8_ptr, 32)
            .arg(bool_ptr, 32)
            .arg(cmp_ptr, 32)
            .no_return_value()
            .build()
        )
        run_program(ev, memory, "zext_and_trunc", call)
        assert read_enc_uint(memory, u32_ptr, 4, ev, sk) == 123456831
        assert read_enc_uint(memory, u8_ptr, 1, ev, sk) == 63
        assert read_enc_uint(memory, bool_ptr, 1, ev, sk) == 1
        assert read_enc_uint(memory, cmp_ptr, 4, ev, sk) == 9


class TestHammingDistance:
    def test_hamming(self, material):
        sk, ev = material
        memory = Memory.new_from_elf(elf("hamming_distance"))
        a_bytes = (0xFEEDF00D_CAFEBABE).to_bytes(8, "little")
        b_bytes = (0x12345678_9ABCDEF0).to_bytes(8, "little")
        da, db = [], []
        for i, (x, y) in enumerate(zip(a_bytes, b_bytes)):
            da.extend(enc_bytes(enc_uint(ev, sk, x, 8, 70 + i)))
            db.extend(enc_bytes(enc_uint(ev, sk, y, 8, 80 + i)))
        a = alloc_store(memory, da)
        b = alloc_store(memory, db)
        call = (
            ArgsBuilder().arg(a, 32).arg(b, 32).arg(8, 32).return_value(8).build()
        )
        _, rp, _ = run_program(ev, memory, "hamming_distance", call)
        assert decrypt_return(memory, rp, 1, ev.enc, sk) == 30


class TestChiSq:
    def test_chi_sq(self, material):
        sk, ev = material
        call = (
            ArgsBuilder()
            .arg_encrypted(enc_uint(ev, sk, 2, 16, 90))
            .arg_encrypted(enc_uint(ev, sk, 7, 16, 91))
            .arg_encrypted(enc_uint(ev, sk, 9, 16, 92))
            .return_value(64)
            .build()
        )
        mem, rp, _ = run_program(ev, elf("chi_sq"), "chi_sq", call)
        expected = [529, 242, 275, 1250]
        for i, e in enumerate(expected):
            assert decrypt_return(mem, rp + 2 * i, 2, ev.enc, sk) == e, i


class TestAuction:
    def test_auction(self, material):
        sk, ev = material
        memory = Memory.new_from_elf(elf("auction"))
        data = []
        for i in range(8):
            data.extend(enc_bytes(enc_uint(ev, sk, i, 16, 100 + i)))
        a = alloc_store(memory, data)
        winner = alloc_store(memory, [0] * 4)
        call = (
            ArgsBuilder()
            .arg(a, 32)
            .arg(8, 16)
            .arg(winner, 32)
            .no_return_value()
            .build()
        )
        run_program(ev, memory, "auction", call)
        assert read_enc_uint(memory, winner, 2, ev, sk) == 7
        assert read_enc_uint(memory, winner + 2, 2, ev, sk) == 7


class TestCardio:
    def test_cardio(self, material):
        sk, ev = material
        man, smoking, diabetic, high_bp = False, False, True, True
        flags = sum(int(x) << i for i, x in enumerate([man, smoking, diabetic, high_bp]))
        call = (
            ArgsBuilder()
            .arg_encrypted(enc_uint(ev, sk, flags, 8, 110))
            .arg_encrypted(enc_uint(ev, sk, 40, 8, 111))
            .arg_encrypted(enc_uint(ev, sk, 50, 8, 112))
            .arg_encrypted(enc_uint(ev, sk, 70, 8, 113))
            .arg_encrypted(enc_uint(ev, sk, 170, 8, 114))
            .arg_encrypted(enc_uint(ev, sk, 1, 8, 115))
            .arg_encrypted(enc_uint(ev, sk, 1, 8, 116))
            .return_value(8)
            .build()
        )
        mem, rp, _ = run_program(ev, elf("cardio"), "cardio", call)
        assert decrypt_return(mem, rp, 1, ev.enc, sk) == 3


class TestArgs:
    def _args(self, ev, sk, reverse: bool):
        vals = [(42, 8), (54, 16), (96, 32), (17, 64), (99, 128)]
        if reverse:
            vals = [(99, 128), (42, 64), (54, 32), (96, 16), (17, 8)]
        b = ArgsBuilder()
        for i, (v, w) in enumerate(vals):
            b.arg_encrypted(enc_uint(ev, sk, v, w, 120 + i + (10 if reverse else 0)))
        return b

    def test_fn1_out_pointer(self, material):
        sk, ev = material
        memory = Memory.new_from_elf(elf("args"))
        result = alloc_store(memory, enc_bytes(enc_uint(ev, sk, 0, 64, 130)))
        call = self._args(ev, sk, False).arg(result, 32).no_return_value().build()
        run_program(ev, memory, "fn1", call)
        assert read_enc_uint(memory, result, 8, ev, sk) == 308

    def test_fn2_return(self, material):
        sk, ev = material
        call = self._args(ev, sk, False).return_value(32).build()
        mem, rp, _ = run_program(ev, elf("args"), "fn2", call)
        assert decrypt_return(mem, rp, 4, ev.enc, sk) == 308

    def test_fn3_reversed(self, material):
        sk, ev = material
        call = self._args(ev, sk, True).return_value(32).build()
        mem, rp, _ = run_program(ev, elf("args"), "fn3", call)
        assert decrypt_return(mem, rp, 4, ev.enc, sk) == 308

    def test_fn4_struct_return(self, material):
        sk, ev = material
        call = self._args(ev, sk, True).return_value(256).build()
        mem, rp, _ = run_program(ev, elf("args"), "fn4", call)
        # struct { i8 a; i16 b @2; i32 c @4; i64 d @8; i128 e @16 }
        assert decrypt_return(mem, rp + 0, 1, ev.enc, sk) == 17
        assert decrypt_return(mem, rp + 2, 2, ev.enc, sk) == 96
        assert decrypt_return(mem, rp + 4, 4, ev.enc, sk) == 54
        assert decrypt_return(mem, rp + 8, 8, ev.enc, sk) == 42
        assert decrypt_return(mem, rp + 16, 16, ev.enc, sk) == 99


class TestGateBatching:
    """Cross-instruction parallelism (VERDICT r1 #4): the deferred
    dataflow graph accumulates gates across MANY instructions and flushes
    them as wide level-synchronous waves — the average CMUX batch per
    kernel call on a real compiled program must be large (the reference's
    Tomasulo engine exists to get this overlap; `fhe_processor.rs:309-401`)."""

    def test_chi_sq_cmux_wave_batching(self, material):
        from spf_tpu.cpu.processor import FheComputer

        sk, ev = material
        memory = Memory.new_from_elf(elf("chi_sq"))
        entry = memory.get_function_entry("chi_sq")
        proc = FheComputer(ev)
        proc.ex.debug = True
        call = (
            ArgsBuilder()
            .arg_encrypted(enc_uint(ev, sk, 2, 16, 300))
            .arg_encrypted(enc_uint(ev, sk, 7, 16, 301))
            .arg_encrypted(enc_uint(ev, sk, 9, 16, 302))
            .return_value(64)
            .build()
        )
        rp = proc.run_program(entry, memory, call)
        expected = [529, 242, 275, 1250]
        for i, e in enumerate(expected):
            assert decrypt_return(memory, rp + 2 * i, 2, ev.enc, sk) == e, i
        waves = [n for (op, _, n) in proc.ex.debug_log if op == "cmux"]
        assert waves, "no cmux waves recorded"
        avg = sum(waves) / len(waves)
        assert avg >= 64, (avg, len(waves), max(waves))
        # one flush for the whole straight-line program
        assert proc.flush_count <= 3, proc.flush_count
