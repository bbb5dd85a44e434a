"""Adversarial robustness fuzz for the r10 binary parsers: arbitrary
and mutated-valid bytes fed to the JPEG/BCJ2/WAV/BMFF decoders must
produce their documented outcomes (decoded value, None, ValueError /
NotImplementedError) — never a foreign exception type, never a hang,
never an unbounded allocation. Complements the targeted hostile-table
tests: these walk the input space blindly.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from demy_spark.bcj2 import bcj2_decode, bcj2_encode
from demy_spark.jpeg import decode_jpeg, encode_jpeg, sniff_baseline
from demy_spark.operators.multimodal import (
    _mp4_metadata,
    _mp4_video_samples,
    _wav_features,
)
from demy_spark.queries import _q150_mp4
from demy_spark.sevenzip import read_7z

JPEG_OK = (ValueError, NotImplementedError)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=400))
def test_random_bytes_never_crash_parsers(data):
    from demy_spark.operators.multimodal import _avi_metadata, _ebml_metadata

    assert _mp4_metadata(data) is None or isinstance(_mp4_metadata(data), tuple)
    assert _mp4_video_samples(data) is None or isinstance(
        _mp4_video_samples(data), tuple
    )
    assert _avi_metadata(data) is None or isinstance(_avi_metadata(data), tuple)
    assert _ebml_metadata(data) is None or isinstance(_ebml_metadata(data), tuple)
    out = _wav_features(data)
    assert out is None or isinstance(out, tuple)
    assert sniff_baseline(data) in (True, False)
    with pytest.raises(JPEG_OK):
        decode_jpeg(data)
    with pytest.raises((ValueError, NotImplementedError)):
        read_7z(data)


def _mutate(body: bytes, rnd: random.Random, n_flips: int) -> bytes:
    buf = bytearray(body)
    for _ in range(n_flips):
        i = rnd.randrange(len(buf))
        buf[i] ^= 1 << rnd.randrange(8)
    return bytes(buf)


def test_mutated_valid_jpeg_is_decoded_or_loud():
    import numpy as np

    img = np.clip(np.mgrid[0:16, 0:24][0] * 9, 0, 255).astype(np.uint8)
    base = encode_jpeg(np.stack([img] * 3, axis=2), quality=90)
    rnd = random.Random(101)
    outcomes = {"ok": 0, "loud": 0}
    for _ in range(120):
        mutated = _mutate(base, rnd, rnd.randrange(1, 4))
        try:
            out = decode_jpeg(mutated)
            assert out.shape[2] in (1, 3)
            outcomes["ok"] += 1
        except JPEG_OK:
            outcomes["loud"] += 1
    # both outcomes occur; what never occurs is a crash or hang
    assert outcomes["loud"] > 0 and sum(outcomes.values()) == 120


def test_mutated_valid_avi_and_ebml_never_escape():
    """r11: the AVI/EBML metadata parsers under the mutation battery —
    None or a tuple, never an exception or unbounded walk (sizes are
    parent-bounded, nesting capped)."""
    from demy_spark.operators.multimodal import (
        _avi_metadata,
        _ebml_metadata,
        encode_avi_stub,
        encode_mkv_stub,
    )

    rnd = random.Random(55)
    avi = encode_avi_stub(640, 360, 250, 40000, 2)
    mkv = encode_mkv_stub("matroska", 12345.0, 1280, 720, 2)
    for base, parse in ((avi, _avi_metadata), (mkv, _ebml_metadata)):
        real = 0
        for _ in range(200):
            out = parse(_mutate(base, rnd, rnd.randrange(1, 6)))
            assert out is None or isinstance(out, tuple)
            real += out is not None
        assert real > 0  # some mutations leave the header parseable


def test_mutated_valid_progressive_jpeg_is_decoded_or_loud():
    """r11: the progressive scan decoder under the same mutation
    battery as baseline — refinement bookkeeping (EOB runs, correction
    bits) must degrade to ValueError/NotImplementedError or a wrong
    image, never a crash, hang or unbounded allocation."""
    import numpy as np

    from demy_spark.jpeg import encode_progressive_jpeg

    img = np.clip(np.mgrid[0:16, 0:24][0] * 9, 0, 255).astype(np.uint8)
    base = encode_progressive_jpeg(np.stack([img] * 3, axis=2), quality=90)
    rnd = random.Random(202)
    outcomes = {"ok": 0, "loud": 0}
    for _ in range(120):
        mutated = _mutate(base, rnd, rnd.randrange(1, 4))
        try:
            out = decode_jpeg(mutated)
            assert out.shape[2] in (1, 3)
            outcomes["ok"] += 1
        except JPEG_OK:
            outcomes["loud"] += 1
    assert outcomes["loud"] > 0 and sum(outcomes.values()) == 120


def test_mutated_valid_bmff_never_escapes_none_or_tuple():
    base = _q150_mp4()
    rnd = random.Random(77)
    real = 0
    for _ in range(200):
        mutated = _mutate(base, rnd, rnd.randrange(1, 6))
        meta = _mp4_metadata(mutated)
        assert meta is None or isinstance(meta, tuple)
        samp = _mp4_video_samples(mutated)
        assert samp is None or isinstance(samp, tuple)
        if samp is not None:
            # any returned sample map must stay inside the payload
            _, samples, _ = samp
            assert all(
                off + size <= len(mutated) for _, off, size in samples
            )
            real += 1
    assert real > 0  # some mutations leave the tables intact


def test_mutated_valid_fmp4_never_escapes():
    """r11: the fragment walk (moof/traf/trun) under the same battery
    — None or an in-bounds sample map, never a crash or an offset
    escaping the payload."""
    from demy_spark.queries import _q150_fmp4

    base = _q150_fmp4()
    rnd = random.Random(88)
    real = 0
    for _ in range(200):
        mutated = _mutate(base, rnd, rnd.randrange(1, 6))
        samp = _mp4_video_samples(mutated)
        assert samp is None or isinstance(samp, tuple)
        if samp is not None:
            _, samples, sync = samp
            assert all(
                off + size <= len(mutated) for _, off, size in samples
            )
            assert sync is None or all(1 <= k <= len(samples) + 6 for k in sync)
            real += 1
    assert real > 0


def test_mutated_bcj2_streams_decode_or_raise_valueerror():
    data = bytes([0xE8, 1, 2, 3, 4, 0x90, 0x0F, 0x85, 9, 9, 9, 9]) * 30
    main, call, jump, rc = bcj2_encode(data)
    rnd = random.Random(5)
    for _ in range(150):
        which = rnd.randrange(4)
        streams = [bytearray(main), bytearray(call), bytearray(jump), bytearray(rc)]
        s = streams[which]
        if not s:
            continue
        s[rnd.randrange(len(s))] ^= 1 << rnd.randrange(8)
        try:
            out = bcj2_decode(*(bytes(x) for x in streams), len(data))
            assert len(out) == len(data)
        except ValueError:
            pass  # the 7z container's CRC layer would catch the rest


def test_truncated_wav_prefixes_never_crash():
    from demy_spark.operators.multimodal import encode_wav

    wav = encode_wav([4096, -4096] * 64, 8000, 2, 2)
    for cut in range(0, len(wav), 7):
        out = _wav_features(wav[:cut])
        assert out is None or isinstance(out, tuple)
