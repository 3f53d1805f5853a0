"""Mux circuit generators vs. plaintext integer functions, exhaustive
for small widths and random for larger (mirrors `mux_circuits` tests,
SURVEY §4.2)."""

import numpy as np
import pytest

from spf_tpu.circuits import integer
from spf_tpu.circuits.mux import MuxCircuit

RNG = np.random.default_rng(11)


def bits(v, n):
    return [(v >> i) & 1 for i in range(n)]


def val(bs):
    return sum(b << i for i, b in enumerate(bs))


class TestAdder:
    @pytest.mark.parametrize("n", [2, 4])
    def test_exhaustive(self, n):
        c = integer.ripple_carry_adder(n)
        for a in range(1 << n):
            for b in range(1 << n):
                out = c.evaluate(bits(a, n) + bits(b, n))
                assert val(out) == a + b, (a, b)

    def test_carry_in(self):
        n = 4
        c = integer.ripple_carry_adder(n, carry_in=True)
        for a, b, cin in [(3, 5, 1), (15, 15, 1), (0, 0, 1), (7, 8, 0)]:
            out = c.evaluate(bits(a, n) + bits(b, n) + [cin])
            assert val(out) == a + b + cin

    def test_random_32(self):
        n = 32
        c = integer.ripple_carry_adder(n)
        for _ in range(20):
            a, b = RNG.integers(0, 1 << n, 2)
            out = c.evaluate(bits(int(a), n) + bits(int(b), n))
            assert val(out) == int(a) + int(b)


class TestSubtractor:
    @pytest.mark.parametrize("n", [2, 4])
    def test_exhaustive(self, n):
        c = integer.full_subtractor(n)
        for a in range(1 << n):
            for b in range(1 << n):
                out = c.evaluate(bits(a, n) + bits(b, n))
                diff = val(out[:n])
                borrow = out[n]
                assert diff == (a - b) % (1 << n)
                assert borrow == (1 if a < b else 0)


class TestMultiplier:
    @pytest.mark.parametrize("n", [2, 4])
    def test_exhaustive(self, n):
        c = integer.unsigned_multiplier(n, n)
        for a in range(1 << n):
            for b in range(1 << n):
                out = c.evaluate(bits(a, n) + bits(b, n))
                assert val(out) == a * b, (a, b)

    def test_random_8(self):
        c = integer.unsigned_multiplier(8, 8)
        for _ in range(50):
            a, b = RNG.integers(0, 256, 2)
            out = c.evaluate(bits(int(a), 8) + bits(int(b), 8))
            assert val(out) == int(a) * int(b)


class TestComparisons:
    @pytest.mark.parametrize("n", [3])
    def test_exhaustive(self, n):
        eq = integer.compare_equal(n)
        neq = integer.compare_not_equal(n)
        gt = integer.compare_or_maybe_equal(n, or_equal=False, signed=False)
        ge = integer.compare_or_maybe_equal(n, or_equal=True, signed=False)
        gts = integer.compare_or_maybe_equal(n, or_equal=False, signed=True)
        les = integer.compare_or_maybe_equal(n, or_equal=True, signed=True)
        half = 1 << (n - 1)
        for a in range(1 << n):
            for b in range(1 << n):
                iv = bits(a, n) + bits(b, n)
                sa = a - (1 << n) if a >= half else a
                sb = b - (1 << n) if b >= half else b
                assert eq.evaluate(iv)[0] == int(a == b)
                assert neq.evaluate(iv)[0] == int(a != b)
                assert gt.evaluate(iv)[0] == int(a > b), (a, b)
                assert ge.evaluate(iv)[0] == int(a >= b)
                assert gts.evaluate(iv)[0] == int(sa > sb), (sa, sb)
                assert les.evaluate(iv)[0] == int(sa >= sb)


class TestBitshift:
    def test_shifts_exhaustive(self):
        n, sb = 8, 3
        for direction in [integer.LEFT, integer.RIGHT]:
            modes = [integer.LOGICAL, integer.ROTATE]
            if direction == integer.RIGHT:
                modes.append(integer.ARITHMETIC)
            for mode in modes:
                c = integer.bitshift(n, sb, direction, mode)
                for v in [0b10110101, 0b00000001, 0b10000000]:
                    for s in range(1 << sb):
                        out = val(c.evaluate(bits(v, n) + bits(s, sb)))
                        if mode == integer.ROTATE:
                            if direction == integer.LEFT:
                                exp = ((v << s) | (v >> (n - s))) & 0xFF if s else v
                            else:
                                exp = ((v >> s) | (v << (n - s))) & 0xFF if s else v
                        elif direction == integer.LEFT:
                            exp = (v << s) & 0xFF
                        elif mode == integer.ARITHMETIC:
                            sv = v - 256 if v >= 128 else v
                            exp = (sv >> s) & 0xFF
                        else:
                            exp = v >> s
                        assert out == exp, (direction, mode, v, s, out, exp)


class TestMisc:
    def test_negate(self):
        n = 8
        c = integer.negate(n)
        for v in [0, 1, 127, 128, 255]:
            out = val(c.evaluate(bits(v, n)))
            assert out == (-v) % 256

    def test_bitwise_and_trees(self):
        assert integer.and_tree(3).evaluate([1, 1, 1])[0] == 1
        assert integer.and_tree(3).evaluate([1, 0, 1])[0] == 0
        assert integer.or_tree(3).evaluate([0, 0, 0])[0] == 0
        assert integer.or_tree(3).evaluate([0, 1, 0])[0] == 1
        c = integer.bitwise_xor(4)
        assert val(c.evaluate(bits(0b1100, 4) + bits(0b1010, 4))) == 0b0110

    def test_multiplier_circuit_size_reasonable(self):
        c = integer.unsigned_multiplier(8, 8)
        # the high-to-low diagonal ordering gives ~3.2k muxes for 8x8
        # (the reference's cached circuit is the same order of magnitude)
        assert c.num_muxes < 6000, c.num_muxes


class TestNativeBdd:
    def test_native_matches_python(self):
        """The C++ ROBDD engine and the Python fallback must produce
        identical node ids for the same operation sequence."""
        from spf_tpu.circuits.bdd import NativeBddManager, PyBddManager
        from spf_tpu.native import get_native_bdd

        native = get_native_bdd()
        if native is None:
            import pytest

            pytest.skip("native BDD engine unavailable")
        pm = PyBddManager(8)
        nm = NativeBddManager(native, 8)
        for mgr in (pm, nm):
            a, b, c = mgr.var(0), mgr.var(1), mgr.var(2)
            r1 = mgr.xor(mgr.and_(a, b), c)
            r2 = mgr.or_(mgr.xnor(a, c), mgr.not_(b))
            mgr._results = (r1, r2)
        assert pm._results == nm._results
        # full node tables agree
        for i in range(len(pm.nodes)):
            assert tuple(pm.nodes[i]) == tuple(nm.nodes[i])
