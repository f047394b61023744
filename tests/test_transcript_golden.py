"""Golden known-answer vectors for the Fiat-Shamir transcript.

Three layers of defence against self-referential transcript bugs
(VERDICT r1, "What's weak" #4):
  1. keccak256 itself against the canonical public KATs;
  2. an INDEPENDENT straight-line re-derivation of the Solidity memory
     layout (reference `prove/src/lib.rs:3212-3395`) — separate code path
     from models/transcript.py;
  3. pinned hex vectors so any future regression is caught byte-for-byte.
"""

from tokamak_zk_evm_tpu.host.keccak import keccak256
from tokamak_zk_evm_tpu.models.transcript import RollingKeccakTranscript


def test_keccak256_known_answers():
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    assert keccak256(b"The quick brown fox jumps over the lazy dog").hex() == (
        "4d741b6f1eb29cb2a9b9911c82f56fa8d73b04959d3d9d222895df6c0b28aa15"
    )


def _independent_transcript(commits):
    """Straight-line reimplementation of the Solidity layout: 100-byte absorb
    buffers [0,0,0,DST | state0 | state1 | pad | value32], 72-byte challenge
    buffer [0,0,0,2 | state0 | state1 | counter_be4], FR_MASK 0x1f on the top
    byte, zero->one fallback."""
    s0, s1 = bytes(32), bytes(32)
    counter = 0
    out = []
    for kind, data in commits:
        if kind == "absorb32":
            buf = bytearray(100)
            buf[3] = 0
            buf[4:36] = s0
            buf[36:68] = s1
            buf[68:100] = data
            n0 = keccak256(bytes(buf))
            buf[3] = 1
            n1 = keccak256(bytes(buf))
            s0, s1 = n0, n1
        else:  # challenge
            buf = bytearray(72)
            buf[3] = 2
            buf[4:36] = s0
            buf[36:68] = s1
            buf[68:72] = counter.to_bytes(4, "big")
            counter += 1
            raw = bytearray(keccak256(bytes(buf)))
            raw[0] &= 0x1F
            v = int.from_bytes(bytes(raw), "big")
            out.append(v if v else 1)
    return s0, s1, out


def test_transcript_matches_independent_derivation():
    t = RollingKeccakTranscript()
    t.commit_fr(0xDEADBEEF)
    t.commit_g1((3, 5))
    c_a = t.get_challenge()
    t.commit_g1(None)
    c_b = t.get_challenge()

    fr = (0xDEADBEEF).to_bytes(32, "big")
    commits = [("absorb32", fr)]
    for x in (3, 5, 0, 0):  # g1 = fq(x) then fq(y); fq = hi16-pad + lo32
        be = x.to_bytes(48, "big")
        commits.append(("absorb32", bytes(16) + be[:16]))
        commits.append(("absorb32", be[16:]))
        if x == 5:
            commits.append(("challenge", None))
    commits.append(("challenge", None))
    s0, s1, chals = _independent_transcript(commits)
    assert (t.state0, t.state1) == (s0, s1)
    assert [c_a, c_b] == chals


def test_transcript_pinned_vectors():
    """Byte-level regression anchors (generated once, must never change —
    the Solidity verifier hard-codes this evolution)."""
    t = RollingKeccakTranscript()
    t.commit_fr(1)
    assert t.state0.hex() == (
        "4829274a597f91f2845069499e0d1be178bbef8e21060db22eba069dc29af1a1"
    )
    assert t.state1.hex() == (
        "3d8da1d00da73ad97b2230662361efa736ed6a69dbeed80a437fdd01c1b766d4"
    )
    assert t.get_challenge() == int(
        "125c0b7c46b093401fcfecab253775c1cf14cbf04d4de56c3024dffb79b71a0a", 16
    )
    t.commit_g1((3, 5))
    assert t.get_challenge() == int(
        "075e6eeb721f099e68abec7f4496973598cce196b11f99ab60592c910524dff1", 16
    )
    t.commit_g1(None)  # infinity serializes as (0, 0)
    assert t.get_challenge() == int(
        "1fdbc9595535192531d32731a07654b9c25c26ec752288d297029344473ccef2", 16
    )
