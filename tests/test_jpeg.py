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


def test_unsupported_frame_types_raise_loudly():
    """r11: progressive (SOF2) is REAL now; the loud boundary moved to
    lossless/hierarchical/arithmetic. A baseline entropy stream whose
    marker is merely PATCHED to SOF2 is malformed under progressive
    scan rules and must raise (ValueError), never decode quietly."""
    jpg = encode_jpeg(mkimg(16, 16), quality=90)
    with pytest.raises(ValueError, match="DC scan with Se"):
        decode_jpeg(_marker_swap(jpg, 0xC0, 0xC2))
    with pytest.raises(NotImplementedError, match="lossless|hierarchical|arith"):
        decode_jpeg(_marker_swap(jpg, 0xC0, 0xC3))
    with pytest.raises(NotImplementedError, match="lossless|hierarchical|arith"):
        decode_jpeg(_marker_swap(jpg, 0xC0, 0xC9))  # arithmetic sequential
    assert not sniff_baseline(_marker_swap(jpg, 0xC0, 0xC9))
    assert sniff_baseline(_marker_swap(jpg, 0xC0, 0xC2))  # marker-level
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
    # progressive both ways (r11): libjpeg reads our SOF2 scan script,
    # and our decoder reads libjpeg's own progressive output
    from demy_spark.jpeg import encode_progressive_jpeg

    ours_prog = encode_progressive_jpeg(img, quality=92)
    theirs = np.asarray(Image.open(BytesIO(ours_prog)).convert("RGB"))
    assert np.abs(
        theirs.astype(int) - decode_jpeg(ours_prog).astype(int)
    ).max() <= 1
    buf = BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=92, progressive=True)
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
    # a REAL progressive encode takes the real path (r11) ...
    from demy_spark.jpeg import encode_progressive_jpeg

    prog = encode_progressive_jpeg(img, quality=95)
    assert realness(prog) is True
    arr = (np.array(_auto_decode(prog, 8, 8, 3)).reshape(8, 8, 3) * 255.0).round()
    assert np.abs(arr - img.astype(np.float64)).max() <= 6
    # ... while arithmetic-coded payloads stay on the marked fake path
    arith = _marker_swap(payload, 0xC0, 0xC9)
    assert realness(arith) is False
    fake = _auto_decode(arith, 8, 8, 3)
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


# ----------------------------------------------------- progressive (r11)


def test_progressive_matches_baseline_bit_exactly():
    """encode_progressive_jpeg carries the SAME quantised coefficients
    as encode_jpeg, so both decodes must agree bit-for-bit — across
    sampling, restarts, band splits and approximation depths. This is
    the strongest conformance property available without golden files:
    a defect in ANY progressive scan kind (DC/AC, first/refinement,
    EOB runs, ZRL-over-history) shifts at least one coefficient."""
    from demy_spark.jpeg import encode_progressive_jpeg

    rng = np.random.default_rng(11)
    cases = [
        (8, 8, 1, {}),
        (16, 24, 3, {}),
        (7, 5, 3, {}),
        (31, 47, 3, {"subsample": True}),
        (33, 49, 3, {"subsample": True, "restart_interval": 2}),
        (9, 10, 1, {"restart_interval": 3}),
        (40, 40, 3, {"spectral_bands": ((1, 1), (2, 9), (10, 63))}),
        (24, 24, 3, {"dc_al": 2, "ac_al": 3}),
        (24, 24, 3, {"dc_al": 0, "ac_al": 0}),  # pure spectral selection
    ]
    for h, w, c, kw in cases:
        shape = (h, w, c) if c == 3 else (h, w)
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for q in (50, 90, 100):
            bkw = {k: v for k, v in kw.items()
                   if k in ("subsample", "restart_interval")}
            db = decode_jpeg(encode_jpeg(img, quality=q, **bkw))
            dp = decode_jpeg(encode_progressive_jpeg(img, quality=q, **kw))
            assert np.array_equal(db, dp), (h, w, c, q, kw)


def test_progressive_long_eob_runs_and_sparse_ac():
    """A mostly-flat image with a few spikes produces long cross-block
    EOB runs (EOBn with extension bits) and ZRL-over-history spans in
    the refinement scans — the bookkeeping-heaviest paths."""
    from demy_spark.jpeg import encode_progressive_jpeg

    img = np.full((64, 72, 3), 128, dtype=np.uint8)
    rng = np.random.default_rng(3)
    for _ in range(9):
        y, x = int(rng.integers(0, 64)), int(rng.integers(0, 72))
        img[y, x] = rng.integers(0, 256, 3)
    for q in (85, 100):
        db = decode_jpeg(encode_jpeg(img, quality=q))
        dp = decode_jpeg(
            encode_progressive_jpeg(img, quality=q)
        )
        assert np.array_equal(db, dp), q


def test_progressive_solid_colors_bit_exact_at_q100():
    """The q146 oracle theorem extends to progressive: a solid image
    at quality 100 (unit quantisers, DC-only blocks) decodes to the
    exact gray level after the full scan script refines every bit."""
    from demy_spark.jpeg import encode_progressive_jpeg

    for h, w, v, kw in [(8, 8, 0, {}), (21, 17, 90, {}), (9, 10, 255, {}),
                        (33, 49, 64, {"subsample": True,
                                      "restart_interval": 2}),
                        (7, 5, 128, {"dc_al": 2, "ac_al": 2})]:
        img = np.full((h, w, 3), v, dtype=np.uint8)
        out = decode_jpeg(encode_progressive_jpeg(img, quality=100, **kw))
        assert out.shape == (h, w, 3)
        assert out.min() == out.max() == v, (h, w, v, kw)
    g = np.full((9, 10), 180, dtype=np.uint8)
    out = decode_jpeg(encode_progressive_jpeg(g, quality=100))
    assert out.shape == (9, 10, 1) and out.min() == out.max() == 180


def test_progressive_hand_built_wire_vector():
    """Hand-assembled single-block grayscale progressive stream (all
    quantisers 1): DC first at Al=1 (point-transformed DC 8 = cat 4
    '0100' + bits '1000'), AC first at Al=1 carrying trunc(-3/2) = -1
    at zigzag 1 (sym 0x01 '00000001' + sign bit '0', then EOB), DC
    refinement bit 0, AC refinement EOB(1) + correction bit 1 turning
    the stored -2 into -3. Final coefficients DC=16, F(0,1)=-3 — no
    encoder in the loop, so enc/dec-symmetric bugs cannot cancel."""
    dqt = bytes([0]) + bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    dc_bits = [0] * 16
    dc_bits[3] = 12  # twelve 4-bit codes: categories 0..11
    dht_dc = bytes([0x00]) + bytes(dc_bits) + bytes(range(12))
    ac_bits = [0] * 16
    ac_bits[7] = 2  # two 8-bit codes: 0x00 -> EOB, 0x01 -> (0,1)
    dht_ac = bytes([0x10]) + bytes(ac_bits) + bytes([0x00, 0x01])

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def ent(bitstr):
        bitstr += "1" * (-len(bitstr) % 8)
        raw = int(bitstr, 2).to_bytes(len(bitstr) // 8, "big")
        return raw.replace(b"\xff", b"\xff\x00")  # byte stuffing

    jpg = (
        b"\xff\xd8"
        + seg(0xDB, dqt)
        + seg(0xC2, sof)
        + seg(0xC4, dht_dc)
        + seg(0xC4, dht_ac)
        + seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))   # DC first, Al=1
        + ent("0100" + "1000")
        + seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01]))  # AC first, Al=1
        + ent("00000001" + "0" + "00000000")
        + seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))   # DC refine
        + ent("0")
        + seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10]))  # AC refine
        + ent("00000000" + "1")
        + b"\xff\xd9"
    )
    out = decode_jpeg(jpg)[:, :, 0].astype(np.float64) - 128.0
    expect = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            expect[x, y] = (
                0.25 * (1 / np.sqrt(2)) * 16.0 / np.sqrt(2)  # DC term
                + 0.25 * (1 / np.sqrt(2)) * (-3.0)
                * np.cos((2 * y + 1) * 1 * np.pi / 16)
            )
    assert np.abs(out - np.round(expect)).max() <= 1


def test_progressive_truncation_and_corruption_raise():
    from demy_spark.jpeg import encode_progressive_jpeg

    img = mkimg(24, 24, "noise", seed=4)
    p = encode_progressive_jpeg(img, quality=90)
    for cut in range(len(p) // 3, len(p) - 2, 41):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_jpeg(p[:cut])
    rng = np.random.default_rng(6)
    escaped = []
    for seed in range(120):
        q = bytearray(p)
        for _ in range(int(rng.integers(1, 4))):
            q[int(rng.integers(2, len(q)))] ^= int(rng.integers(1, 256))
        try:
            out = decode_jpeg(bytes(q))
            assert out.dtype == np.uint8  # wrong pixels allowed, crash not
        except (ValueError, NotImplementedError):
            pass
        except Exception as e:  # pragma: no cover
            escaped.append((seed, type(e).__name__))
    assert not escaped


def test_progressive_scan_header_validation():
    """Malformed scan scripts are loud: Se!=0 on a DC scan, multi-
    component AC scans, Ah != Al+1 refinements, bands past 63."""
    from demy_spark.jpeg import encode_progressive_jpeg

    img = mkimg(16, 16)
    p = bytearray(encode_progressive_jpeg(img, quality=90))
    # locate the first SOS and corrupt its (Ss, Se, AhAl) tail
    i = bytes(p).index(b"\xff\xda")
    ln = struct.unpack(">H", p[i + 2 : i + 4])[0]
    tail = i + 2 + ln - 3  # Ss offset
    for ss, se, ahal, msg in [
        (0, 5, 0x01, "DC scan with Se"),
        (1, 0, 0x01, "band"),
        (5, 70, 0x01, "band"),
        (0, 0, 0x31, "Ah = Al"),
    ]:
        q = bytearray(p)
        q[tail], q[tail + 1], q[tail + 2] = ss, se, ahal
        with pytest.raises(ValueError, match=msg):
            decode_jpeg(bytes(q))
    # a multi-component AC scan: rebuild the first SOS as 3-component
    # with Ss=1 (the encoder writes it single-component)
    body = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 1, 63, 0x01])
    q = p[:i] + bytes([0xFF, 0xDA]) + struct.pack(">H", len(body) + 2) + body
    with pytest.raises(ValueError, match="multiple components"):
        decode_jpeg(bytes(q))


def test_jpeg_max_pixels_bomb_guard():
    """A crafted SOF declaring a huge frame must fail fast before any
    coefficient grid is allocated (the r10 MP4 sample-table lesson);
    sniff_baseline agrees so the operator path takes the marked fake
    instead of raising mid-batch."""
    jpg = bytearray(encode_jpeg(mkimg(16, 16), quality=90))
    i = bytes(jpg).index(b"\xff\xc0")
    struct.pack_into(">HH", jpg, i + 5, 65535, 65535)
    with pytest.raises(ValueError, match="decompression-bomb"):
        decode_jpeg(bytes(jpg))
    assert not sniff_baseline(bytes(jpg))
    # explicit opt-in still available for trusted large media
    with pytest.raises(ValueError):  # entropy data is of course short
        decode_jpeg(bytes(jpg), max_pixels=1 << 33)


def test_progressive_hand_built_cross_block_eob_run():
    """Hand-assembled TWO-block grayscale progressive stream pinning
    the cross-block EOB-run refinement convention (the analog of the
    BCJ2 wire-convention concern): AC refinement scan consists of ONE
    EOBn(2) symbol — r=1 code + one extension bit 0 — followed by two
    correction bits, the first for the CURRENT block's remaining
    history coefficient, the second for the SKIPPED block's. Block 1
    carries AC zz1 = -5 (stored -4 after the Al=1 first scan, refined
    to -5), block 2 carries +3 (stored 2, refined to 3); DC = 8 in
    both (diff 0 for block 2). No encoder in the loop."""
    dqt = bytes([0]) + bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0])
    dc_bits = [0] * 16
    dc_bits[3] = 12
    dht_dc = bytes([0x00]) + bytes(dc_bits) + bytes(range(12))
    ac_bits = [0] * 16
    ac_bits[7] = 4  # 8-bit codes 0..3 -> EOB, (0,1), (0,2), EOBn r=1
    dht_ac = bytes([0x10]) + bytes(ac_bits) + bytes([0x00, 0x01, 0x02, 0x10])

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def ent(bitstr):
        bitstr += "1" * (-len(bitstr) % 8)
        raw = int(bitstr, 2).to_bytes(len(bitstr) // 8, "big")
        return raw.replace(b"\xff", b"\xff\x00")

    jpg = (
        b"\xff\xd8"
        + seg(0xDB, dqt)
        + seg(0xC2, sof)
        + seg(0xC4, dht_dc)
        + seg(0xC4, dht_ac)
        # DC first at Al=0: blk1 cat4 '0100'+'1000' (+8), blk2 cat0
        + seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
        + ent("0100" + "1000" + "0000")
        # AC first at Al=1: blk1 (0,2) '00000010' + '01' (= -2), EOB;
        # blk2 (0,1) '00000001' + '1' (= +1), EOB
        + seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01]))
        + ent("00000010" + "01" + "00000000"
              + "00000001" + "1" + "00000000")
        # AC refine Ah=1 Al=0: EOBn(2) = code '00000011' + ext '0',
        # then correction bits: blk1's history ('1': -4 -> -5), then
        # blk2's ('1': 2 -> 3)
        + seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10]))
        + ent("00000011" + "0" + "1" + "1")
        + b"\xff\xd9"
    )
    out = decode_jpeg(jpg)[:, :, 0].astype(np.float64) - 128.0
    from demy_spark.jpeg import _A

    def idct(coef_nat):
        F_ = np.zeros((8, 8))
        for (u, v), val in coef_nat.items():
            F_[u, v] = val
        return _A.T @ F_ @ _A

    b1 = idct({(0, 0): 8, (0, 1): -5})
    b2 = idct({(0, 0): 8, (0, 1): 3})
    expect = np.hstack([b1, b2])
    assert np.abs(out - np.round(expect)).max() <= 1
