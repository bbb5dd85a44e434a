"""Baseline JPEG codec (demy_spark/jpeg.py): encode/decode identity
within quantisation-derived error bounds, an independent O(N^4) IDCT
cross-check, hand-derived single-block wire vectors, the loud
unsupported-feature boundary, and (auto-activating when Pillow is
importable — same dependency-gate pattern as the real-7z test) a
libjpeg cross-validation.

JPEG carries no payload CRC, so unlike the 7z reader a decoder bug
cannot surface as a container error — conformance rests on these
vectors plus the Pillow gate.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from demy_spark.jpeg import (
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    quality_tables,
    sniff_baseline,
)


def mkimg(h, w, kind="gradient", seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    if kind == "gradient":
        return np.stack(
            [
                np.clip(yy * 255 // max(1, h - 1), 0, 255),
                np.clip(xx * 255 // max(1, w - 1), 0, 255),
                np.clip(128 + yy - xx, 0, 255),
            ],
            axis=2,
        ).astype(np.uint8)
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


# ------------------------------------------------------------ roundtrip


def test_solid_colors_near_exact():
    for color in [(128, 128, 128), (255, 0, 0), (0, 255, 0), (0, 0, 255),
                  (12, 200, 99)]:
        img = np.tile(np.array(color, np.uint8), (16, 24, 1))
        dec = decode_jpeg(encode_jpeg(img, quality=95))
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1, color


def test_gradient_roundtrip_within_quant_error():
    img = mkimg(32, 48)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 6 and err.mean() < 1.5


def test_noise_q100_roundtrip_tight():
    # q100 quant tables are mostly 1s: the DCT roundtrip itself
    img = mkimg(24, 24, "noise", seed=7)
    dec = decode_jpeg(encode_jpeg(img, quality=100))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3


def test_grayscale_exact_at_q100_on_smooth():
    g = (np.mgrid[0:32, 0:48][0] * 5).clip(0, 255).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=95))
    assert dec.shape == (32, 48, 1)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 1


@pytest.mark.parametrize("h,w", [(8, 8), (7, 5), (31, 47), (17, 64), (1, 1)])
def test_odd_dimensions(h, w):
    img = mkimg(h, w)
    dec = decode_jpeg(encode_jpeg(img, quality=92))
    assert dec.shape == (h, w, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 8


@pytest.mark.parametrize("h,w", [(16, 16), (31, 47), (9, 10)])
def test_subsampled_420(h, w):
    img = mkimg(h, w)
    dec = decode_jpeg(encode_jpeg(img, quality=92, subsample=True))
    assert dec.shape == (h, w, 3)
    # chroma is box-filtered: compare channel means, not pixels
    assert abs(dec.mean() - img.mean()) < 4


def test_restart_intervals_do_not_change_pixels():
    img = mkimg(33, 49)
    base = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
    for ri in (1, 2, 5):
        withri = decode_jpeg(
            encode_jpeg(img, quality=90, subsample=True, restart_interval=ri)
        )
        assert np.array_equal(base, withri), ri


def test_fuzz_roundtrip_bounded_by_quality():
    rng = np.random.default_rng(2026)
    for _ in range(15):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        # genuinely bandlimited random image: a few low-frequency
        # cosines, where q95 quantisation error stays within units
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        img = np.zeros((h, w, 3))
        for c in range(3):
            plane = np.full((h, w), 128.0)
            for _k in range(3):
                amp = rng.uniform(5, 35)
                fy, fx = rng.uniform(0, 0.2, 2)
                ph = rng.uniform(0, 6.28)
                plane += amp * np.cos(fy * yy + fx * xx + ph)
            img[:, :, c] = plane
        img = np.clip(img, 0, 255).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(img, quality=95))
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.max() <= 10 and err.mean() < 2


# -------------------------------------------------- independent checks


def test_idct_matches_direct_sum():
    """The einsum IDCT against a literal O(N^4) DCT-III double sum
    written from the T.81 formula — an independent implementation."""
    from demy_spark.jpeg import _A

    rng = np.random.default_rng(5)
    F_ = rng.integers(-200, 200, (8, 8)).astype(np.float64)
    fast = _A.T @ F_ @ _A
    slow = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = (1 / np.sqrt(2)) if u == 0 else 1.0
                    cv = (1 / np.sqrt(2)) if v == 0 else 1.0
                    s += (
                        0.25 * cu * cv * F_[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            slow[x, y] = s
    assert np.abs(fast - slow).max() < 1e-9


def test_zigzag_is_the_published_order():
    # first and last entries of T.81 Figure 5 (natural indexes)
    assert ZIGZAG[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    # tail of T.81 Figure 5: ... 61 54 47 55 62 63
    assert ZIGZAG[-6:] == [61, 54, 47, 55, 62, 63]
    assert sorted(ZIGZAG) == list(range(64))


def test_quality_tables_follow_ijg_formula():
    ql50, _ = quality_tables(50)
    assert ql50[0] == 16  # scale 100 => base table unchanged
    ql100, qc100 = quality_tables(100)
    assert ql100.max() == 1 and qc100.max() == 1  # near-lossless
    ql10, _ = quality_tables(10)
    assert ql10[0] == 80  # 16*500/100 = 80


def test_hand_built_single_block_gray():
    """Hand-assembled minimal JPEG (one 8x8 grayscale block, all
    quantisers 1, DC diff +16, EOB): must decode to the constant 130
    block — pins marker parsing, Huffman decode, EXTEND, dequant and
    the IDCT DC path with no encoder involved.

    Stream derivation: DC table maps category c to code c (4 bits);
    AC table maps EOB (0x00) to code 0 (8 bits). DC diff +16 =>
    category 5 (code '0101'), appended bits '10000'. With the
    orthonormal IDCT a lone F(0,0)=16 adds 16/8 = +2 to every pixel
    after the +128 level shift => 130."""
    dqt = bytes([0]) + bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    dc_bits = [0] * 16
    dc_bits[3] = 12  # twelve 4-bit codes: categories 0..11
    dht_dc = bytes([0x00]) + bytes(dc_bits) + bytes(range(12))
    ac_bits = [0] * 16
    ac_bits[7] = 1  # one 8-bit code: EOB
    dht_ac = bytes([0x10]) + bytes(ac_bits) + bytes([0x00])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    # entropy: DC code for cat 5 = '0101', extend bits '10000' (+16),
    # EOB '00000000', pad to a byte with 1-bits
    bitstr = "0101" + "10000" + "00000000" + "1111111"
    entropy = int(bitstr, 2).to_bytes(len(bitstr) // 8, "big")

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    jpg = (
        b"\xff\xd8"
        + seg(0xDB, dqt)
        + seg(0xC0, sof)
        + seg(0xC4, dht_dc)
        + seg(0xC4, dht_ac)
        + seg(0xDA, sos)
        + entropy
        + b"\xff\xd9"
    )
    out = decode_jpeg(jpg)
    assert out.shape == (8, 8, 1)
    assert np.unique(out).tolist() == [130]


def test_hand_built_block_with_one_ac_coefficient():
    """Same frame, entropy now carries AC(run=0,size=1) value -1 at
    zigzag position 1 (natural F(0,1)): decode must produce the
    horizontal half-cosine ramp cos((2y+1)pi/16) scaled by -1/4* sqrt(2)/2...
    checked against the direct IDCT formula rather than hand arithmetic."""
    dqt = bytes([0]) + bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    dc_bits = [0] * 16
    dc_bits[3] = 12
    dht_dc = bytes([0x00]) + bytes(dc_bits) + bytes(range(12))
    ac_bits = [0] * 16
    ac_bits[7] = 2  # two 8-bit codes: 0 -> EOB, 1 -> (run 0, size 1)
    dht_ac = bytes([0x10]) + bytes(ac_bits) + bytes([0x00, 0x01])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    # bits: DC cat0 '0000'; AC sym1 '00000001'; value bit '0' (=> -1);
    # EOB '00000000'; pad '111' -> 0000 00000001 0 00000000 111
    bitstr = "0000" + "00000001" + "0" + "00000000" + "111"
    entropy = int(bitstr, 2).to_bytes(len(bitstr) // 8, "big")

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    jpg = (
        b"\xff\xd8"
        + seg(0xDB, dqt)
        + seg(0xC0, sof)
        + seg(0xC4, dht_dc)
        + seg(0xC4, dht_ac)
        + seg(0xDA, sos)
        + entropy
        + b"\xff\xd9"
    )
    out = decode_jpeg(jpg)[:, :, 0].astype(np.float64) - 128.0
    expect = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            expect[x, y] = (
                0.25 * (1 / np.sqrt(2)) * (-1.0)
                * np.cos((2 * y + 1) * 1 * np.pi / 16)
            )
    assert np.abs(out - np.round(expect)).max() <= 1


# ------------------------------------------------------- loud boundary


def _marker_swap(jpg: bytes, frm: int, to: int) -> bytes:
    i = jpg.index(bytes([0xFF, frm]))
    return jpg[:i] + bytes([0xFF, to]) + jpg[i + 2 :]


def test_progressive_and_friends_raise_loudly():
    jpg = encode_jpeg(mkimg(16, 16), quality=90)
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(_marker_swap(jpg, 0xC0, 0xC2))
    with pytest.raises(NotImplementedError, match="lossless|hierarchical|arith"):
        decode_jpeg(_marker_swap(jpg, 0xC0, 0xC3))
    assert not sniff_baseline(_marker_swap(jpg, 0xC0, 0xC2))
    assert sniff_baseline(jpg)


def test_corrupt_streams_raise_valueerror():
    jpg = encode_jpeg(mkimg(16, 16), quality=90)
    with pytest.raises(ValueError):
        decode_jpeg(jpg[: len(jpg) // 2])  # truncated entropy data
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(b"")
    # SOS before SOF
    i = jpg.index(b"\xff\xc0")
    j = jpg.index(b"\xff\xda")
    with pytest.raises(ValueError):
        decode_jpeg(jpg[:i] + jpg[j:])


def test_sniff_baseline_rejects_non_jpeg():
    assert not sniff_baseline(b"")
    assert not sniff_baseline(b"\x89PNG\r\n\x1a\n")
    assert not sniff_baseline(b"\xff\xd8\xff\xe0 truncated")


# ----------------------------------------- dependency-gated conformance


def test_pillow_cross_validation_when_available():
    """Auto-activates when Pillow is importable (COVERAGE.md
    dependency-gate policy): libjpeg must agree with this decoder
    within rounding on our own encodes, and our decoder must read
    Pillow's encodes."""
    try:
        from PIL import Image
    except ImportError:
        pytest.skip(
            "Pillow not importable — cross-validation auto-activates "
            "when it is (COVERAGE.md dependency-gated test policy)"
        )
    from io import BytesIO

    img = mkimg(33, 47)
    ours = encode_jpeg(img, quality=92)
    theirs_pixels = np.asarray(Image.open(BytesIO(ours)).convert("RGB"))
    assert np.abs(
        theirs_pixels.astype(int) - decode_jpeg(ours).astype(int)
    ).max() <= 1
    buf = BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=92)
    assert np.abs(
        decode_jpeg(buf.getvalue()).astype(int)
        - np.asarray(Image.open(buf).convert("RGB")).astype(int)
    ).max() <= 1


# --------------------------------------------------- operator wiring


def test_multimodal_auto_decode_uses_real_jpeg_path():
    from demy_spark.operators.multimodal import _auto_decode, _decode_realness, _auto_decode as dec

    img = mkimg(8, 8)
    payload = encode_jpeg(img, quality=95)
    px = _auto_decode(payload, 8, 8, 3)
    arr = (np.array(px).reshape(8, 8, 3) * 255.0).round()
    assert np.abs(arr - img.astype(np.float64)).max() <= 6  # real pixels
    realness = _decode_realness(dec)
    assert realness(payload) is True
    assert realness(b"\xff\xd8\xff\xe0 junk") is False
    # progressive payloads stay on the marked fake path
    prog = _marker_swap(payload, 0xC0, 0xC2)
    assert realness(prog) is False
    fake = _auto_decode(prog, 8, 8, 3)
    assert len(fake) == 8 * 8 * 3


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
    marker — both the top-level parser and the entropy splitter must
    skip them."""
    img = mkimg(16, 16)
    enc = encode_jpeg(img, quality=95)
    i = enc.index(b"\xff\xdb")
    j = enc.index(b"\xff\xd9")
    padded = enc[:i] + b"\xff\xff" + enc[i:j] + b"\xff" + enc[j:]
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(enc))


def test_dnl_deferred_height_sniffs_as_unsupported():
    """r10 review: sniff_baseline must agree with decode_jpeg about
    the DNL-deferred (height 0) feature class, so _auto_decode routes
    such files to the marked fake instead of crashing the batch."""
    jpg = bytearray(encode_jpeg(mkimg(16, 16), quality=90))
    i = bytes(jpg).index(b"\xff\xc0")
    jpg[i + 5 : i + 7] = b"\x00\x00"  # height := 0 in the SOF
    assert not sniff_baseline(bytes(jpg))
    from demy_spark.operators.multimodal import _auto_decode_ex

    px, real = _auto_decode_ex(bytes(jpg), 4, 4, 3)
    assert real is False and len(px) == 48
    with pytest.raises(NotImplementedError, match="DNL"):
        decode_jpeg(bytes(jpg))


def test_corrupt_baseline_jpeg_raises_through_auto_decode():
    """Corruption within a SUPPORTED class stays loud (same contract
    as _pillow_decode) — only unsupported format classes take the
    marked fake."""
    from demy_spark.operators.multimodal import _auto_decode

    jpg = encode_jpeg(mkimg(16, 16), quality=90)
    with pytest.raises(ValueError):
        _auto_decode(jpg[: len(jpg) - 40] , 4, 4, 3)
