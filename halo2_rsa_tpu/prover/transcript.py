"""Blake2b Fiat–Shamir transcript.

Structural equivalent of halo2's ``Blake2bWrite``/``Blake2bRead`` +
``Challenge255`` (used at /root/reference/benches/bench.rs:320-343). The
absorb/squeeze convention is this framework's own (the reference's exact byte
layout is an implementation detail of the Rust stack); prover and verifier
here share it exactly, which is what soundness requires.

Encoding: G1 points as 64 bytes (x || y little-endian, infinity = zeros);
Fr scalars as 32 bytes little-endian. Challenges: blake2b-512 of the running
state with a domain byte, reduced mod r.
"""

from __future__ import annotations

import hashlib

from ..fields.field import BN254_FR, BN254_FQ

R = BN254_FR.p
Q = BN254_FQ.p

_PERSONAL = b"halo2rsa-tpu-fs1"


class Transcript:
    def __init__(self):
        self._h = hashlib.blake2b(person=_PERSONAL, digest_size=64)
        self.log: list[bytes] = []  # proof byte stream (write side)

    # --- absorb ---------------------------------------------------------

    def common_scalar(self, s: int) -> None:
        b = (s % R).to_bytes(32, "little")
        self._h.update(b"\x01" + b)

    def common_point(self, p) -> None:
        if p is None:
            b = bytes(64)
        else:
            b = p[0].to_bytes(32, "little") + p[1].to_bytes(32, "little")
        self._h.update(b"\x02" + b)

    def write_scalar(self, s: int) -> None:
        self.common_scalar(s)
        self.log.append((s % R).to_bytes(32, "little"))

    def write_point(self, p) -> None:
        self.common_point(p)
        if p is None:
            self.log.append(bytes(64))
        else:
            self.log.append(p[0].to_bytes(32, "little") + p[1].to_bytes(32, "little"))

    # --- squeeze --------------------------------------------------------

    def challenge(self) -> int:
        state = self._h.copy()
        state.update(b"\x03challenge")
        out = int.from_bytes(state.digest(), "little") % R
        # absorb the squeeze so successive challenges differ
        self._h.update(b"\x04" + out.to_bytes(32, "little"))
        return out

    def proof_bytes(self) -> bytes:
        return b"".join(self.log)


class TranscriptReader:
    """Verifier side: replays the byte stream with identical absorbs."""

    def __init__(self, proof: bytes):
        self._t = Transcript()
        self._buf = proof
        self._pos = 0

    def read_scalar(self) -> int:
        b = self._buf[self._pos : self._pos + 32]
        self._pos += 32
        s = int.from_bytes(b, "little")
        assert s < R, "transcript scalar out of range"
        self._t.common_scalar(s)
        return s

    def read_point(self):
        """Deserialize a G1 point, REJECTING off-curve coordinates.

        The capability of halo2 ``Blake2bRead``'s compressed-point
        decompression (/root/reference/benches/bench.rs:334-343): an
        adversarial proof must not be able to inject arbitrary (x, y) into
        the pairing check. BN254 G1 has cofactor 1, so curve membership is
        the full subgroup check."""
        from .curve import g1_is_on_curve

        b = self._buf[self._pos : self._pos + 64]
        self._pos += 64
        if b == bytes(64):
            p = None
        else:
            x = int.from_bytes(b[:32], "little")
            y = int.from_bytes(b[32:], "little")
            assert x < Q and y < Q, "transcript point coordinate out of range"
            p = (x, y)
            assert g1_is_on_curve(p), "transcript point not on curve"
        self._t.common_point(p)
        return p

    def common_scalar(self, s: int) -> None:
        self._t.common_scalar(s)

    def common_point(self, p) -> None:
        self._t.common_point(p)

    def challenge(self) -> int:
        return self._t.challenge()

    def finished(self) -> bool:
        return self._pos == len(self._buf)
