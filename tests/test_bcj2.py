"""BCJ2 codec (demy_spark/bcj2.py): encode/decode identity on
adversarial inputs, wire-level pins for the range coder, and the loud
error contract for damaged streams.

Conformance note: this container has no 7z binary or BCJ2 archive to
cross-validate against, so these tests pin enc/dec *consistency* plus
hand-derived wire facts (stream split sizes, big-endian absolute
addressing, the always-zero pad byte). On a real archive any decoder
divergence is caught by the 7z container's CRC checks
(tests/test_sevenzip.py), i.e. the reader is correct-or-loud.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from demy_spark.bcj2 import bcj2_decode, bcj2_encode

X86ISH = bytes.fromhex(
    "5589e583ec10e8000000005b81c3xxxxxx".replace("x", "0")
) + bytes([0xE8, 0x10, 0x00, 0x00, 0x00, 0xC3, 0x0F, 0x85, 0xF0, 0xFF, 0xFF, 0xFF, 0x90])


def roundtrip(data: bytes) -> tuple[bytes, bytes, bytes, bytes]:
    streams = bcj2_encode(data)
    assert bcj2_decode(*streams, len(data)) == data
    return streams


def test_empty_and_markerless():
    assert roundtrip(b"") == (b"", b"", b"", bytes(5))
    main, call, jump, rc = roundtrip(b"plain text, no branch opcodes")
    assert call == jump == b"" and rc == bytes(5)  # pad + flush only


def test_call_and_jump_streams_split_correctly():
    # E8 -> call stream, E9 and 0F 8x -> jump stream, 4 BE bytes each
    data = (
        bytes([0xE8, 0x01, 0x00, 0x00, 0x00])
        + bytes([0xE9, 0x02, 0x00, 0x00, 0x00])
        + bytes([0x0F, 0x84, 0x03, 0x00, 0x00, 0x00])
        + b"\x90\x90"
    )
    main, call, jump, rc = roundtrip(data)
    assert len(call) == 4 and len(jump) == 8
    # absolute = rel + (marker_pos + 5), stored big-endian
    assert call == (0x01 + 0 + 5).to_bytes(4, "big")
    assert jump[:4] == (0x02 + 5 + 5).to_bytes(4, "big")
    # the Jcc field position is after the 0F 8x pair at offset 10/11
    assert jump[4:] == (0x03 + 11 + 5).to_bytes(4, "big")
    # converted fields leave the main stream entirely
    assert len(main) == len(data) - 12


def test_unconverted_branches_stay_in_main():
    data = bytes([0xE8, 1, 2, 3, 4]) * 6
    main, call, jump, rc = bcj2_encode(data, convert=lambda pos: False)
    assert main == data and call == b"" and jump == b""
    assert bcj2_decode(main, call, jump, rc, len(data)) == data


def test_partial_conversion_policy():
    data = bytes([0xE8, 1, 2, 3, 4, 0x90]) * 40
    main, call, jump, rc = bcj2_encode(data, convert=lambda pos: pos % 12 == 0)
    assert len(call) == 4 * 20
    assert bcj2_decode(main, call, jump, rc, len(data)) == data


def test_tail_marker_costs_a_bit_but_never_converts():
    # marker in the final 4 bytes: field can't fit; both sides must
    # still spend one control bit on it (SDK loop structure)
    for tail in (b"\xe8", b"\xe8\x01", b"\x0f\x80\x01\x02\x03"):
        data = b"\x90" * 8 + tail
        main, call, jump, rc = roundtrip(data)
        assert main == data and call == b"" and jump == b""


def test_prev_byte_crosses_converted_field():
    # a converted field whose LAST byte is 0x0F must arm Jcc detection
    # for the next byte — prev tracking uses OUTPUT bytes
    rel = int.from_bytes(bytes([1, 2, 3, 0x0F]), "little")
    data = (
        bytes([0xE8]) + rel.to_bytes(4, "little")
        + bytes([0x85, 9, 9, 9, 9])  # 0x0F, 0x85 => Jcc marker
        + b"\x90"
    )
    main, call, jump, rc = roundtrip(data)
    assert len(call) == 4 and len(jump) == 4


def test_pad_byte_is_zero_and_min_stream_is_five_bytes():
    _, _, _, rc = bcj2_encode(b"\x90")
    assert rc[0] == 0 and len(rc) == 5


def test_x86ish_blob_roundtrip():
    roundtrip(X86ISH * 37)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=600), st.randoms(use_true_random=False))
def test_fuzz_roundtrip_with_injected_markers(data, rnd):
    buf = bytearray(data)
    for _ in range(len(buf) // 6):
        buf[rnd.randrange(len(buf))] = rnd.choice(
            [0xE8, 0xE9, 0x0F, 0x80, 0x85, 0x8F]
        )
    roundtrip(bytes(buf))


def test_wire_pin_known_vector():
    """Golden pin of the encoder's wire output for a fixed input, so
    an accidental change to the probability model or carry logic shows
    up as a diff here before it shows up as CRC failures on archives."""
    data = bytes([0xE8, 0x01, 0x02, 0x03, 0x04]) * 3 + bytes(
        [0xE9, 0xFF, 0xFF, 0xFF, 0xFF, 0x0F, 0x88, 0x00, 0x01, 0x02, 0x03]
    )
    main, call, jump, rc = bcj2_encode(data)
    assert main.hex() == "e8e8e8e90f88"
    # hand-derived: abs = rel32 + (marker_pos + 5); E8 rels are all
    # 0x04030201 at positions 0/5/10; E9 rel -1 at 15 wraps to 19;
    # the Jcc rel 0x03020100 sits after the 0F 88 pair at 20/21
    assert call.hex() == "040302060403020b04030210"
    assert jump.hex() == "000000130302011a"
    assert rc.hex() == "00f7bffc00"  # golden: 5 converted-branch bits
    assert bcj2_decode(main, call, jump, rc, len(data)) == data


def test_decode_errors_are_loud():
    data = bytes([0xE8, 1, 2, 3, 4]) * 8
    main, call, jump, rc = bcj2_encode(data)
    with pytest.raises(ValueError, match="main stream"):
        bcj2_decode(main[:-1], call, jump, rc, len(data))
    with pytest.raises(ValueError, match="call/jump"):
        bcj2_decode(main, call[:-2], jump, rc, len(data))
    with pytest.raises(ValueError, match="5-byte init"):
        bcj2_decode(main, call, jump, rc[:4], len(data))
    # a too-short control stream exhausts during normalisation
    big = bytes([0xE8, 1, 2, 3, 4, 0x90]) * 600
    m2, c2, j2, r2 = bcj2_encode(big)
    assert len(r2) > 6
    with pytest.raises(ValueError, match="control stream exhausted"):
        bcj2_decode(m2, c2, j2, r2[:6], len(big))


def test_random_dense_marker_soak():
    rnd = random.Random(20260816)
    for _ in range(60):
        n = rnd.randrange(1, 900)
        buf = bytearray(rnd.randrange(256) for _ in range(n))
        for _ in range(n // 3):
            buf[rnd.randrange(n)] = rnd.choice([0xE8, 0xE9, 0x0F, 0x80, 0x8F])
        roundtrip(bytes(buf))
