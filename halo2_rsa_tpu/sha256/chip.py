"""SHA-256 circuit gadget.

Capability equivalent of the external ``halo2-dynamic-sha256`` crate the
reference depends on (Cargo.toml:15; used via ``Sha256Chip::{init, finalize,
decompose_digest_to_bytes}`` at /root/reference/src/lib.rs:203-212).

Realization is bit-sliced over the trace builder's main gate: 32-bit words
are carried both as a composed field cell and as 32 boolean cells; XOR/CH/MAJ
are one-or-two-row bit gates; rotations are free re-indexing; mod-2^32
additions use a witnessed carry with a range-checked quotient. The circuit
shape is fixed by the message byte length at synthesis time (the trace is
per-shape, like every circuit here); padding bytes are circuit constants.

The full compression function is checked in-circuit — message bytes are
8-bit-lookup-checked witnesses, so a verifier of the trace verifies the hash.
"""

from __future__ import annotations

from typing import NamedTuple

from ..circuit.builder import Builder, Cell
from ..circuit.main_gate import MainGate
from ..circuit.range_chip import RangeChip

_K = [
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
    0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
    0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
    0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
    0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
    0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
    0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
    0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
    0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
    0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
    0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
]

_H0 = [
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
]


class Word(NamedTuple):
    """A 32-bit word: composed field cell + 32 bit cells (LSB-first)."""

    cell: Cell
    bits: tuple


class Sha256Chip:
    def __init__(self, builder: Builder):
        self.b = builder
        self.mg = MainGate(builder)
        self.rc = RangeChip(builder)

    # --- word helpers ----------------------------------------------------

    def _const_word(self, v: int) -> Word:
        cell = self.mg.assign_constant(v)
        bits = tuple(self.mg.assign_constant((v >> i) & 1) for i in range(32))
        return Word(cell, bits)

    def _compose_bits(self, bits) -> Cell:
        """Running-sum composition of bit cells into one field cell."""
        b = self.b
        acc = b.zero
        for i, bit in enumerate(bits):
            nxt = b.new_cell(
                b.val(acc) + (b.val(bit) << i),
                ("lin", acc.idx, bit.idx, 0, 1, 1 << i),
            )
            b.gate([acc, bit, nxt], (1, 1 << i, -1, 0, 0, 0, 0, 0))
            acc = nxt
        return acc

    def _decompose_word(self, cell: Cell) -> Word:
        """Witness 32 boolean bits and constrain their composition == cell."""
        v = self.b.val(cell)
        assert v < (1 << 32)
        bits = tuple(
            self.mg.assign_bit((v >> i) & 1, prov=("shrmask", cell.idx, i, 1))
            for i in range(32)
        )
        composed = self._compose_bits(bits)
        self.mg.assert_equal(composed, cell)
        return Word(cell, bits)

    def _xor(self, x: Cell, y: Cell) -> Cell:
        """Bit XOR in one row: x + y - 2xy - out == 0."""
        b = self.b
        out = b.new_cell(b.val(x) ^ b.val(y), ("full", x.idx, y.idx, 0, 1, 1, -2))
        b.gate([x, y, out], (1, 1, -1, 0, 0, -2, 0, 0))
        return out

    def _xor3_bits(self, xs, ys, zs):
        return tuple(self._xor(self._xor(x, y), z) for x, y, z in zip(xs, ys, zs))

    @staticmethod
    def _rotr(bits, r):
        return tuple(bits[(i + r) % 32] for i in range(32))

    def _shr(self, bits, n):
        zero = self.b.zero
        return tuple(bits[i + n] if i + n < 32 else zero for i in range(32))

    def _ch_bits(self, e, f, g):
        """ch = g + e*(f - g) per bit (2 rows/bit)."""
        out = []
        for eb, fb, gb in zip(e, f, g):
            t = self.mg.sub(fb, gb)
            out.append(self.mg.mul_add(eb, t, gb))
        return tuple(out)

    def _maj_bits(self, a, b_, c):
        """maj = ab + c*(a + b - 2ab) = ab ^ bc ^ ca per bit (3 rows/bit)."""
        out = []
        for ab_, bb, cb in zip(a, b_, c):
            prod = self.mg.mul(ab_, bb)
            x = self._xor(ab_, bb)
            out.append(self.mg.mul_add(x, cb, prod))
        return tuple(out)

    def _mod32(self, cell: Cell, max_carry_bits: int = 4) -> Cell:
        """Split cell = q*2^32 + r; range-check q (small) and return r.

        r's bit decomposition is done by the caller when needed."""
        b = self.b
        v = b.val(cell)
        q_v, r_v = v >> 32, v & 0xFFFFFFFF
        q = self.rc.assign(q_v, max_carry_bits, max_carry_bits, source=cell, source_shift=32)
        r = self.rc.assign(r_v, 8, 32, source=cell)
        # q * 2^32 + r - cell == 0
        two32 = self.mg.assign_constant(1 << 32)
        recomposed = self.mg.mul_add(q, two32, r)
        self.mg.assert_equal(recomposed, cell)
        return r

    def _add_words_mod32(self, cells) -> Word:
        """Sum of composed word cells, reduced mod 2^32, re-bit-decomposed."""
        acc = cells[0]
        for c in cells[1:]:
            acc = self.mg.add(acc, c)
        r = self._mod32(acc)
        return self._decompose_word(r)

    # --- message handling ------------------------------------------------

    def assign_message(self, msg: bytes) -> list[Cell]:
        """Witness the message bytes, each 8-bit lookup-checked."""
        return [self.rc.assign(byte, 8, 8) for byte in msg]

    def digest(self, msg: bytes, msg_cells: list[Cell] | None = None):
        """Hash ``msg`` in-circuit.

        Returns (digest_words, digest_bytes, msg_cells): 8 word cells, 32
        byte cells in big-endian order (the pre-reverse order of
        ``decompose_digest_to_bytes``, lib.rs:210-212), and the assigned
        message byte cells.
        """
        if msg_cells is None:
            msg_cells = self.assign_message(msg)
        assert len(msg_cells) == len(msg)

        # --- padding (static per message length; constants in-circuit) ---
        ml = len(msg) * 8
        pad = b"\x80" + b"\x00" * ((55 - len(msg)) % 64) + ml.to_bytes(8, "big")
        pad_cells = [self.mg.assign_constant(x) for x in pad]
        all_cells = msg_cells + pad_cells
        all_bytes = msg + pad
        assert len(all_bytes) % 64 == 0

        h = [self._const_word(x) for x in _H0]
        k_words = [self.mg.assign_constant(x) for x in _K]

        for blk in range(0, len(all_bytes), 64):
            # message schedule w[0..16): compose 4 big-endian bytes per word
            w: list[Word] = []
            for i in range(16):
                cells4 = all_cells[blk + 4 * i : blk + 4 * i + 4]
                acc = self.b.zero
                for j, bc in enumerate(cells4):
                    shift = 8 * (3 - j)
                    nxt = self.b.new_cell(
                        self.b.val(acc) + (self.b.val(bc) << shift),
                        ("lin", acc.idx, bc.idx, 0, 1, 1 << shift),
                    )
                    self.b.gate([acc, bc, nxt], (1, 1 << shift, -1, 0, 0, 0, 0, 0))
                    acc = nxt
                w.append(self._decompose_word(acc))
            # w[16..64)
            for i in range(16, 64):
                s0b = self._xor3_bits(
                    self._rotr(w[i - 15].bits, 7),
                    self._rotr(w[i - 15].bits, 18),
                    self._shr(w[i - 15].bits, 3),
                )
                s1b = self._xor3_bits(
                    self._rotr(w[i - 2].bits, 17),
                    self._rotr(w[i - 2].bits, 19),
                    self._shr(w[i - 2].bits, 10),
                )
                s0 = self._compose_bits(s0b)
                s1 = self._compose_bits(s1b)
                w.append(
                    self._add_words_mod32([w[i - 16].cell, s0, w[i - 7].cell, s1])
                )

            a, bb, c, d, e, f, g, hh = h
            for i in range(64):
                S1 = self._compose_bits(
                    self._xor3_bits(
                        self._rotr(e.bits, 6), self._rotr(e.bits, 11), self._rotr(e.bits, 25)
                    )
                )
                ch = self._compose_bits(self._ch_bits(e.bits, f.bits, g.bits))
                # t1 = h + S1 + ch + k + w
                t1 = self.mg.add(hh.cell, S1)
                t1 = self.mg.add(t1, ch)
                t1 = self.mg.add(t1, k_words[i])
                t1 = self.mg.add(t1, w[i].cell)
                S0 = self._compose_bits(
                    self._xor3_bits(
                        self._rotr(a.bits, 2), self._rotr(a.bits, 13), self._rotr(a.bits, 22)
                    )
                )
                maj = self._compose_bits(self._maj_bits(a.bits, bb.bits, c.bits))
                t2 = self.mg.add(S0, maj)
                new_e = self._add_words_mod32([d.cell, t1])
                new_a = self._add_words_mod32([t1, t2])
                a, bb, c, d, e, f, g, hh = new_a, a, bb, c, new_e, e, f, g

            h = [
                self._add_words_mod32([x.cell, y.cell])
                for x, y in zip(h, [a, bb, c, d, e, f, g, hh])
            ]

        digest_words = [word.cell for word in h]
        # big-endian digest bytes: word j, byte 0 = bits 24..32
        digest_bytes = []
        for word in h:
            for j in range(4):
                bits = word.bits[8 * (3 - j) : 8 * (3 - j) + 8]
                digest_bytes.append(self._compose_bits(bits))
        return digest_words, digest_bytes, msg_cells
