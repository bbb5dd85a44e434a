"""Pure-Python baseline JPEG codec (numpy for the DCT only).

Gives the multimodal operators REAL pixels for baseline JPEG payloads
in codec-library-less containers, the way the vendored PNG codec
already does for PNG (multimodal.py r7): the reference pipelines
treat images as opaque binaries plus decode UDFs, and this container
ships neither Pillow nor libjpeg. Implemented from the public ITU-T
T.81 / ISO 10918-1 specification (baseline sequential DCT, Annex F)
and the JFIF colour conventions — original code, no decoder source
consulted.

Scope — decode (:func:`decode_jpeg`):

- SOF0/SOF1 (baseline / extended sequential Huffman, 8-bit), 1- or
  3-component (grayscale / JFIF YCbCr), any sampling factors whose
  planes nearest-upsample (1x1, 2x1, 1x2, 2x2, 4x1, ...), interleaved
  or per-component scans, restart intervals, 8- and 16-bit DQT.
- SOF2 (progressive Huffman, 8-bit — r11, T.81 Annex G): spectral
  selection and successive approximation, DC first/refinement scans
  (interleaved or single-component), AC first/refinement scans with
  EOB runs and ZRL-over-history, restart intervals inside progressive
  scans. Coefficients accumulate across scans into per-component
  grids; a stream truncated mid-script decodes the scans it carries
  (the format's own partial-display semantics).
- Loud ``NotImplementedError`` for lossless / hierarchical /
  arithmetic variants (SOF3+, DAC), 12-bit precision, and 4-component
  (Adobe CMYK) files; malformed streams raise ``ValueError``. NEVER a
  silent wrong image for an unsupported feature class.

Scope — encode (:func:`encode_jpeg`): baseline, 4:4:4 or 4:2:0, file-
carried canonical Huffman tables (flat code lengths — valid, not
Annex K; decoders read tables from DHT so interop is unaffected),
quality-scaled Annex-K-style quantisation. Exists for tests and for
writing thumbnails from the multimodal pipeline.
:func:`encode_progressive_jpeg` (r11) writes the same quantised
coefficients as a progressive scan script (interleaved DC first +
refinements, per-component per-band AC first + refinements, optional
restart markers) — which yields the strongest conformance check this
container can run: progressive and baseline encodings of one image
carry IDENTICAL coefficients, so their decodes must agree bit-exactly.

Conformance posture (mirrors COVERAGE.md "Dependency-gated test
policy"): enc/dec identity is fuzz-tested with error bounds derived
from the quantisation step; the IDCT is cross-checked against a
direct O(N^4) DCT-III sum; single-block wire vectors are hand-derived
from the spec; and when Pillow IS importable a cross-validation test
auto-activates comparing this decoder against libjpeg on every
fixture (tests/test_jpeg.py). JPEG carries no payload CRC, so unlike
the 7z path a decoder bug cannot be caught by the container — hence
the hand-derived vectors and the strict loud-unsupported boundary.

Performance: entropy decode is per-symbol Python (the DCT and colour
transform are vectorised numpy). Fine for the thumbnail-scale media
the operators test with; production pipelines with Pillow installed
automatically take the libjpeg path instead (multimodal.py
``default_image_decoder``).
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------- tables


def _zigzag_order() -> list[int]:
    """Natural index for each zigzag position (T.81 Figure 5)."""
    out = []
    r = c = 0
    for _ in range(64):
        out.append(r * 8 + c)
        if (r + c) % 2 == 0:
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    return out


ZIGZAG = _zigzag_order()

# orthonormal 8x8 DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1)u*pi/16);
# forward F = A f A^T, inverse f = A^T F A
_A = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _cu = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
        _A[_u, _x] = 0.5 * _cu * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

# Annex K luminance/chrominance quantisation tables (natural order),
# the public base tables every quality-scaled encoder derives from
_QL_BASE = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
_QC_BASE = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG-convention quality scaling of the Annex K tables (public
    formula: scale = 5000/q below 50, 200-2q above)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    ql = np.clip((_QL_BASE * scale + 50) // 100, 1, 255)
    qc = np.clip((_QC_BASE * scale + 50) // 100, 1, 255)
    return ql.astype(np.int32), qc.astype(np.int32)


# ------------------------------------------------------- huffman sides


class _HuffDecoder:
    """Canonical Huffman decoder from a DHT (bits[16] + values),
    compiled to a flat 16-bit-prefix LUT: entry = (symbol << 5) |
    code_length, 0 = invalid prefix — one list index per symbol
    instead of one dict probe per bit."""

    def __init__(self, bits: list[int], values: bytes):
        lut = np.zeros(1 << 16, dtype=np.int32)
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                if k >= len(values):
                    raise ValueError("JPEG DHT: fewer values than bits declare")
                start = code << (16 - length)
                lut[start : start + (1 << (16 - length))] = (
                    int(values[k]) << 5
                ) | length
                code += 1
                k += 1
            if code > (1 << length):
                raise ValueError("JPEG DHT: oversubscribed code lengths")
            code <<= 1
        if k != len(values):
            raise ValueError("JPEG DHT: more values than bits declare")
        self.lut16 = lut.tolist()  # plain-list indexing is fastest here


def _build_encoder_table(symbols: list[int], length: int) -> tuple[
    list[int], list[int], dict[int, tuple[int, int]]
]:
    """Flat canonical table: every symbol gets ``length`` bits. Valid
    whenever len(symbols) < 2**length (keeps the all-ones code free,
    which some strict decoders reserve). Returns (bits, values,
    symbol -> (code, length))."""
    if len(symbols) >= (1 << length):
        raise ValueError("too many symbols for flat code length")
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    enc = {s: (i, length) for i, s in enumerate(symbols)}
    return bits, list(symbols), enc


def _split_entropy(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Pre-scan one entropy-coded segment: unstuff 0xFF00 in bulk,
    split at restart markers (RST0-7), skip 0xFF fill bytes, and stop
    at the first real marker. Returns (clean byte segments — one per
    restart interval — and the offset of the terminating 0xFF)."""
    segs: list[bytes] = []
    cur = bytearray()
    i = pos
    n = len(data)
    while True:
        j = data.find(b"\xff", i)
        if j < 0 or j + 1 >= n:
            raise ValueError("JPEG entropy data ended without a marker")
        cur += data[i:j]
        m = data[j + 1]
        if m == 0x00:  # stuffed data byte
            cur += b"\xff"
            i = j + 2
        elif m == 0xFF:  # fill byte before a marker
            i = j + 1
        elif 0xD0 <= m <= 0xD7:  # restart: segment boundary
            segs.append(bytes(cur))
            cur = bytearray()
            i = j + 2
        else:
            segs.append(bytes(cur))
            return segs, j


class _FastBits:
    """Bulk bit reader over a CLEAN (unstuffed) entropy segment.
    Reads past the real end are fed 1-bits (the encoder's pad value);
    more than four synthetic bytes means genuine truncation."""

    __slots__ = ("data", "n", "pos", "acc", "nbits", "synth")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.pos = 0
        self.acc = 0
        self.nbits = 0
        self.synth = 0

    def _need(self, want: int) -> None:
        # trim consumed high bits so acc stays a small int
        self.acc &= (1 << self.nbits) - 1
        while self.nbits < want:
            if self.pos < self.n:
                self.acc = (self.acc << 8) | self.data[self.pos]
                self.pos += 1
            else:
                self.synth += 1
                if self.synth > 4:
                    raise ValueError("JPEG entropy data truncated")
                self.acc = (self.acc << 8) | 0xFF
            self.nbits += 8

    def symbol(self, lut16: list[int]) -> int:
        if self.nbits < 16:
            self._need(16)
        entry = lut16[(self.acc >> (self.nbits - 16)) & 0xFFFF]
        if entry == 0:
            raise ValueError("JPEG invalid Huffman code")
        self.nbits -= entry & 31
        return entry >> 5

    def receive_extend(self, s: int) -> int:
        if self.nbits < s:
            self._need(s)
        self.nbits -= s
        v = (self.acc >> self.nbits) & ((1 << s) - 1)
        if v < (1 << (s - 1)):  # negative branch (T.81 F.2.2.1 EXTEND)
            v -= (1 << s) - 1
        return v

    def bits(self, n: int) -> int:
        """n raw bits, MSB first, no sign extension (progressive EOB-run
        extensions, refinement correction/sign bits — T.81 G.1.2)."""
        if n == 0:
            return 0
        if self.nbits < n:
            self._need(n)
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)


class _BitWriter:
    """Entropy-segment bit writer with 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:  # pad with 1-bits (T.81 F.1.2.3)
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


# --------------------------------------------------------------- decode


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "dc_id", "ac_id", "blocks",
                 "bw", "bh", "pred")

    def __init__(self, cid: int, h: int, v: int, tq: int):
        self.cid, self.h, self.v, self.tq = cid, h, v, tq
        self.dc_id = self.ac_id = 0
        self.blocks: dict[tuple[int, int], np.ndarray] = {}
        self.bw = self.bh = 0
        self.pred = 0


# default decompression-bomb guard: the largest frame decode_jpeg will
# open without an explicit opt-in (sniff_baseline agrees, so payloads
# beyond it take the marked-fake path instead of raising mid-operator)
MAX_PIXELS_DEFAULT = 32_000_000


def sniff_baseline(payload: bytes) -> bool:
    """True when the payload is a JPEG this module can decode for real
    (SOF0/SOF1 sequential or — r11 — SOF2 progressive, 8-bit, <=3
    components) — the multimodal ``decode_real`` predicate. Marker
    scan only; no entropy decode. The name predates progressive
    support; it answers "really decodable here", not "baseline"."""
    if not payload or payload[:3] != b"\xff\xd8\xff":
        return False
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            return False
        marker = payload[pos + 1]
        if marker in (0xC0, 0xC1, 0xC2):
            if pos + 10 > n:
                return False
            precision = payload[pos + 4]
            height = int.from_bytes(payload[pos + 5 : pos + 7], "big")
            ncomp = payload[pos + 9]
            # height 0 = DNL-deferred, a feature class decode_jpeg
            # rejects — sniff must agree (r10 review); same for the
            # max-pixels bomb guard (r11)
            width = int.from_bytes(payload[pos + 7 : pos + 9], "big")
            return (
                precision == 8
                and height > 0
                and ncomp in (1, 3)
                and height * width <= MAX_PIXELS_DEFAULT
            )
        if marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                      0xCD, 0xCE, 0xCF):
            return False
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        pos += 2 + struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
    return False


def decode_jpeg(
    payload: bytes, *, max_pixels: int = MAX_PIXELS_DEFAULT
) -> np.ndarray:
    """Decode baseline or progressive JPEG bytes to an (h, w, c) uint8
    array (c = 1 grayscale or 3 RGB via the JFIF BT.601 transform).

    ``max_pixels`` bounds the SOF-declared frame area BEFORE any block
    grid is allocated — a crafted 65535x65535 header must fail fast,
    not materialize a multi-GB coefficient grid from a tiny payload
    (the same hostile-count lesson as the r10 MP4 sample tables)."""
    if not payload or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    n = len(payload)
    qt: dict[int, np.ndarray] = {}
    dc_tables: dict[int, _HuffDecoder] = {}
    ac_tables: dict[int, _HuffDecoder] = {}
    comps: list[_Component] = []
    height = width = 0
    restart_interval = 0
    saw_frame = saw_scan = False
    progressive = False

    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at {pos}")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
            pos += 1
            continue
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # TEM / stray RST: parameterless
        if pos + 2 > n:
            raise ValueError("JPEG segment length truncated")
        seglen = struct.unpack(">H", payload[pos : pos + 2])[0]
        if seglen < 2 or pos + seglen > n:
            raise ValueError("JPEG segment runs past end of data")
        seg = payload[pos + 2 : pos + seglen]
        pos += seglen

        if marker == 0xDB:  # DQT
            s = 0
            while s < len(seg):
                pq, tq = seg[s] >> 4, seg[s] & 0x0F
                s += 1
                if pq == 0:
                    vals = np.frombuffer(seg[s : s + 64], dtype=np.uint8)
                    s += 64
                elif pq == 1:
                    vals = np.frombuffer(seg[s : s + 128], dtype=">u2")
                    s += 128
                else:
                    raise ValueError(f"JPEG DQT precision {pq}")
                if len(vals) != 64:
                    raise ValueError("JPEG DQT table truncated")
                nat = np.zeros(64, dtype=np.int32)
                nat[ZIGZAG] = vals  # DQT values arrive in zigzag order
                qt[tq] = nat.reshape(8, 8)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog
            saw_frame = True
            progressive = marker == 0xC2
            precision, height, width, ncomp = struct.unpack(
                ">BHHB", seg[:6]
            )
            if precision != 8:
                raise NotImplementedError(
                    f"JPEG {precision}-bit precision (this decoder is 8-bit)"
                )
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"JPEG {ncomp}-component frame (grayscale/YCbCr only; "
                    "CMYK needs a codec library)"
                )
            if height == 0:
                raise NotImplementedError("JPEG DNL-deferred height")
            if height * width > max_pixels:
                raise ValueError(
                    f"JPEG frame {width}x{height} exceeds max_pixels="
                    f"{max_pixels} (decompression-bomb guard)"
                )
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(_Component(cid, hv >> 4, hv & 0x0F, tq))
            if any(c.h < 1 or c.v < 1 for c in comps):
                raise ValueError("JPEG zero sampling factor")
            if progressive:
                # coefficients accumulate across scans: fix each
                # component's block-grid extent now (MCU-padded, so an
                # interleaved DC scan's padding blocks have a home)
                hmax = max(c.h for c in comps)
                vmax = max(c.v for c in comps)
                for c in comps:
                    c.bw = -(-width // (8 * hmax)) * c.h
                    c.bh = -(-height // (8 * vmax)) * c.v
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG frame type 0xFF{marker:02X} (lossless/hierarchical/"
                "arithmetic) — install Pillow for this file"
            )
        elif marker == 0xCC:
            raise NotImplementedError("JPEG arithmetic coding (DAC)")
        elif marker == 0xC4:  # DHT
            s = 0
            while s < len(seg):
                tc, th = seg[s] >> 4, seg[s] & 0x0F
                bits = list(seg[s + 1 : s + 17])
                cnt = sum(bits)
                values = bytes(seg[s + 17 : s + 17 + cnt])
                table = _HuffDecoder(bits, values)
                (dc_tables if tc == 0 else ac_tables)[th] = table
                s += 17 + cnt
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if not saw_frame:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
                comp = next((c for c in comps if c.cid == cs), None)
                if comp is None:
                    raise ValueError(f"JPEG scan references component {cs}")
                comp.dc_id, comp.ac_id = tdta >> 4, tdta & 0x0F
                scan_comps.append(comp)
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            if progressive:
                pos = _decode_scan_prog(
                    payload, pos, scan_comps, comps, dc_tables,
                    ac_tables, width, height, restart_interval,
                    ss, se, ahal >> 4, ahal & 0x0F,
                )
            else:
                if (ss, se, ahal) != (0, 63, 0):
                    raise NotImplementedError(
                        "JPEG spectral selection / successive approximation "
                        "(progressive scan parameters) in a sequential frame"
                    )
                pos = _decode_scan(
                    payload, pos, scan_comps, comps, dc_tables, ac_tables,
                    qt, width, height, restart_interval,
                )
            saw_scan = True
        elif 0xE0 <= marker <= 0xEF or marker == 0xFE:
            continue  # APPn / COM
        elif marker == 0xDC:
            continue  # DNL: height already known from SOF (0 rejected)
        else:
            raise ValueError(f"unexpected JPEG marker 0xFF{marker:02X}")

    if not saw_scan:
        raise ValueError("JPEG ended without a scan")
    return _assemble(comps, qt, width, height)


def _decode_scan(
    data: bytes,
    pos: int,
    scan_comps: list[_Component],
    all_comps: list[_Component],
    dc_tables: dict[int, _HuffDecoder],
    ac_tables: dict[int, _HuffDecoder],
    qt: dict[int, np.ndarray],
    width: int,
    height: int,
    restart_interval: int,
) -> int:
    hmax = max(c.h for c in all_comps)
    vmax = max(c.v for c in all_comps)
    for c in all_comps:
        if c.tq not in qt:
            raise ValueError(f"JPEG component uses undefined DQT {c.tq}")
    interleaved = len(scan_comps) > 1
    if interleaved:
        mcus_x = -(-width // (8 * hmax))
        mcus_y = -(-height // (8 * vmax))
        units = [(c, bx, by) for c in scan_comps
                 for by in range(c.v) for bx in range(c.h)]
    else:
        c = scan_comps[0]
        cw = -(-width * c.h // hmax)
        ch = -(-height * c.v // vmax)
        mcus_x = -(-cw // 8)
        mcus_y = -(-ch // 8)
        units = [(c, 0, 0)]
    for c in scan_comps:
        c.pred = 0
        if c.dc_id not in dc_tables or c.ac_id not in ac_tables:
            raise ValueError("JPEG scan uses undefined Huffman table")

    segs, end = _split_entropy(data, pos)
    if restart_interval == 0 and len(segs) > 1:
        raise ValueError("JPEG restart marker without a DRI interval")
    seg_it = iter(segs)
    br = _FastBits(next(seg_it))
    # bind the hot lookups once per scan
    units_fast = [
        (c, bx, by, dc_tables[c.dc_id].lut16, ac_tables[c.ac_id].lut16)
        for c, bx, by in units
    ]
    to_go = restart_interval
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and to_go == 0:
                nxt = next(seg_it, None)
                if nxt is None:
                    raise ValueError("JPEG restart marker missing")
                br = _FastBits(nxt)
                for c in scan_comps:
                    c.pred = 0
                to_go = restart_interval
            for c, bx, by, dc_lut, ac_lut in units_fast:
                block = _decode_block(br, dc_lut, ac_lut, c)
                if interleaved:
                    key = (my * c.v + by, mx * c.h + bx)
                else:
                    key = (my, mx)
                c.blocks[key] = block
            if restart_interval:
                to_go -= 1
    if next(seg_it, None) is not None:
        raise ValueError("JPEG restart marker after the final MCU")
    # register plane block-grid extents
    for c in scan_comps:
        if interleaved:
            c.bh = max(c.bh, mcus_y * c.v)
            c.bw = max(c.bw, mcus_x * c.h)
        else:
            c.bh = max(c.bh, mcus_y)
            c.bw = max(c.bw, mcus_x)
    return end


def _decode_block(
    br: _FastBits, dc_lut: list[int], ac_lut: list[int], comp: _Component
) -> list[int]:
    coef = [0] * 64
    t = br.symbol(dc_lut)
    if t:
        if t > 11:
            raise ValueError(f"JPEG DC category {t} out of range")
        comp.pred += br.receive_extend(t)
    coef[0] = comp.pred
    k = 1
    zz = ZIGZAG
    while k <= 63:
        rs = br.symbol(ac_lut)
        s = rs & 0x0F
        if s == 0:
            if rs == 0xF0:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += rs >> 4
        if k > 63:
            raise ValueError("JPEG AC run past end of block")
        coef[zz[k]] = br.receive_extend(s)
        k += 1
    return coef


def _decode_scan_prog(
    data: bytes,
    pos: int,
    scan_comps: list[_Component],
    all_comps: list[_Component],
    dc_tables: dict[int, _HuffDecoder],
    ac_tables: dict[int, _HuffDecoder],
    width: int,
    height: int,
    restart_interval: int,
    ss: int,
    se: int,
    ah: int,
    al: int,
) -> int:
    """One progressive scan (T.81 Annex G): DC (Ss=0) first/refinement
    over MCUs, or AC (Ss>0) first/refinement over one component's true
    block grid with EOB runs. Coefficients accumulate into the
    components' block dicts; restart markers reset predictors and the
    EOB run."""
    if se > 63 or ss > se:
        raise ValueError(f"JPEG progressive scan band {ss}..{se}")
    if al > 13 or (ah and ah != al + 1):
        raise ValueError(
            f"JPEG successive approximation Ah={ah} Al={al} "
            "(refinement must step one bit: Ah = Al + 1)"
        )
    if ss == 0 and se != 0:
        raise ValueError("JPEG progressive DC scan with Se != 0")
    if ss > 0 and len(scan_comps) != 1:
        raise ValueError("JPEG progressive AC scan with multiple components")

    segs, end = _split_entropy(data, pos)
    if restart_interval == 0 and len(segs) > 1:
        raise ValueError("JPEG restart marker without a DRI interval")
    seg_it = iter(segs)
    br = _FastBits(next(seg_it))
    hmax = max(c.h for c in all_comps)
    vmax = max(c.v for c in all_comps)

    def blk_of(c: _Component, key: tuple[int, int]) -> list[int]:
        b = c.blocks.get(key)
        if b is None:
            b = c.blocks[key] = [0] * 64
        return b

    if ss == 0:  # ---- DC scan
        if ah == 0:
            for c in scan_comps:
                if c.dc_id not in dc_tables:
                    raise ValueError("JPEG scan uses undefined Huffman table")
                c.pred = 0
        interleaved = len(scan_comps) > 1
        if interleaved:
            mcus_x = -(-width // (8 * hmax))
            mcus_y = -(-height // (8 * vmax))
            units = [(c, bx, by) for c in scan_comps
                     for by in range(c.v) for bx in range(c.h)]
        else:
            c0 = scan_comps[0]
            mcus_x = -(- -(-width * c0.h // hmax) // 8)
            mcus_y = -(- -(-height * c0.v // vmax) // 8)
            units = [(c0, 0, 0)]
        units_fast = [
            (c, bx, by,
             dc_tables[c.dc_id].lut16 if ah == 0 else None)
            for c, bx, by in units
        ]
        to_go = restart_interval
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and to_go == 0:
                    nxt = next(seg_it, None)
                    if nxt is None:
                        raise ValueError("JPEG restart marker missing")
                    br = _FastBits(nxt)
                    for c in scan_comps:
                        c.pred = 0
                    to_go = restart_interval
                for c, bx, by, dc_lut in units_fast:
                    key = (
                        (my * c.v + by, mx * c.h + bx)
                        if interleaved
                        else (my, mx)
                    )
                    blk = blk_of(c, key)
                    if ah == 0:
                        t = br.symbol(dc_lut)
                        if t > 11:
                            raise ValueError(
                                f"JPEG DC category {t} out of range"
                            )
                        if t:
                            c.pred += br.receive_extend(t)
                        blk[0] = c.pred << al
                    elif br.bits(1):
                        blk[0] |= 1 << al
                if restart_interval:
                    to_go -= 1
    else:  # ---- AC scan (single component)
        c = scan_comps[0]
        if c.ac_id not in ac_tables:
            raise ValueError("JPEG scan uses undefined Huffman table")
        ac_lut = ac_tables[c.ac_id].lut16
        bw = -(- -(-width * c.h // hmax) // 8)
        bh = -(- -(-height * c.v // vmax) // 8)
        zz = ZIGZAG
        p1, m1 = 1 << al, -1 << al
        eobrun = 0
        to_go = restart_interval
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and to_go == 0:
                    nxt = next(seg_it, None)
                    if nxt is None:
                        raise ValueError("JPEG restart marker missing")
                    br = _FastBits(nxt)
                    eobrun = 0
                    to_go = restart_interval
                if restart_interval:
                    to_go -= 1
                if ah == 0:  # -------- first pass (G.1.2.2)
                    if eobrun:
                        eobrun -= 1
                        continue
                    blk = blk_of(c, (by, bx))
                    k = ss
                    while k <= se:
                        rs = br.symbol(ac_lut)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            eobrun = (1 << r) - 1 + br.bits(r)
                            break
                        k += r
                        if k > se:
                            raise ValueError("JPEG AC run past end of band")
                        blk[zz[k]] = br.receive_extend(s) << al
                        k += 1
                    continue
                # ------------------ refinement pass (G.1.2.3)
                blk = blk_of(c, (by, bx))
                if eobrun:
                    eobrun -= 1
                    for k in range(ss, se + 1):
                        v = blk[zz[k]]
                        if v and br.bits(1) and not (v & p1):
                            blk[zz[k]] = v + (p1 if v > 0 else m1)
                    continue
                k = ss
                while k <= se:
                    rs = br.symbol(ac_lut)
                    r, s = rs >> 4, rs & 0x0F
                    newval = 0
                    if s == 0:
                        if r < 15:  # EOBn: covers this block too
                            eobrun = (1 << r) + br.bits(r)
                            break
                        # r == 15: pass 16 zero-history coefficients
                    elif s == 1:
                        newval = p1 if br.bits(1) else m1
                    else:
                        raise ValueError(
                            "JPEG AC refinement magnitude must be 1"
                        )
                    while k <= se:
                        v = blk[zz[k]]
                        if v:
                            if br.bits(1) and not (v & p1):
                                blk[zz[k]] = v + (p1 if v > 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if newval:
                        if k > se:
                            raise ValueError(
                                "JPEG AC refinement run past end of band"
                            )
                        blk[zz[k]] = newval
                    k += 1
                if eobrun:
                    # the EOBn covered the rest of THIS block: refine
                    # its remaining nonzero-history coefficients
                    for kk in range(k, se + 1):
                        v = blk[zz[kk]]
                        if v and br.bits(1) and not (v & p1):
                            blk[zz[kk]] = v + (p1 if v > 0 else m1)
                    eobrun -= 1
    if next(seg_it, None) is not None:
        raise ValueError("JPEG restart marker after the final MCU")
    return end


def _assemble(
    comps: list[_Component],
    qt: dict[int, np.ndarray],
    width: int,
    height: int,
) -> np.ndarray:
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    for c in comps:
        if c.tq not in qt:
            raise ValueError(f"JPEG component uses undefined DQT {c.tq}")
    planes = []
    for c in comps:
        if not c.blocks:
            raise ValueError(f"JPEG component {c.cid} never scanned")
        grid = np.zeros((c.bh, c.bw, 64), dtype=np.int32)
        for (by, bx), coef in c.blocks.items():
            grid[by, bx] = coef
        deq = grid.reshape(-1, 8, 8) * qt[c.tq][None, :, :]
        # inverse DCT over the whole block stack: f = A^T F A
        pix = np.einsum("ux,nuv,vy->nxy", _A, deq.astype(np.float64), _A)
        pix = np.clip(np.round(pix) + 128, 0, 255)
        plane = (
            pix.reshape(c.bh, c.bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c.bh * 8, c.bw * 8)
        )
        cw = -(-width * c.h // hmax)
        ch = -(-height * c.v // vmax)
        plane = plane[:ch, :cw]
        # nearest upsample to the frame grid
        ys = np.minimum(np.arange(height) * c.v // vmax, ch - 1)
        xs = np.minimum(np.arange(width) * c.h // hmax, cw - 1)
        planes.append(plane[ys][:, xs])
    if len(planes) == 1:
        return planes[0].astype(np.uint8)[:, :, None]
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------- encode


def _quantised_planes(
    arr: np.ndarray, quality: int, subsample: bool
) -> tuple[list[np.ndarray], list[tuple[int, int]], list[int],
           dict[int, np.ndarray], int, int, int, int]:
    """Shared encoder front half: colour transform, optional 4:2:0,
    per-component MCU-padded block grids of quantised ZIGZAG-order
    coefficients. Returns (comp_blocks, samp, qids, qtabs, mcus_x,
    mcus_y, h, w)."""
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3):
        raise ValueError("encode_jpeg wants (h, w[, 1|3]) uint8")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("encode_jpeg: empty image")
    a = a.astype(np.float64)
    ql, qc = quality_tables(quality)
    if a.shape[2] == 1:
        planes = [a[:, :, 0]]
        samp = [(1, 1)]
        qids = [0]
        qtabs = {0: ql.reshape(8, 8)}
    else:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            cb = _box2(cb)
            cr = _box2(cr)
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qids = [0, 1, 1]
        qtabs = {0: ql.reshape(8, 8), 1: qc.reshape(8, 8)}

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    comp_blocks = []
    for plane, (sh, sv), qid in zip(planes, samp, qids):
        cw = -(-w * sh // hmax)
        ch = -(-h * sv // vmax)
        p = plane[
            np.minimum(np.arange(ch), plane.shape[0] - 1)[:, None],
            np.minimum(np.arange(cw), plane.shape[1] - 1)[None, :],
        ]
        bw, bh = mcus_x * sh, mcus_y * sv
        padded = np.empty((bh * 8, bw * 8))
        padded[:ch, :cw] = p
        padded[ch:, :cw] = p[-1:, :]  # edge-replicate pad
        padded[:, cw:] = padded[:, cw - 1 : cw]
        blocks = (
            padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0
        )
        f = np.einsum("ux,nmxy,vy->nmuv", _A, blocks, _A)
        q = np.round(f / qtabs[qid][None, None, :, :]).astype(np.int32)
        comp_blocks.append(q.reshape(bh, bw, 64)[:, :, ZIGZAG])
    # NB: reshape(bh,bw,64) flattens each 8x8 natural-order; [:, :, ZIGZAG]
    # reorders into zigzag scan order.
    return comp_blocks, samp, qids, qtabs, mcus_x, mcus_y, h, w


def encode_jpeg(
    arr: np.ndarray,
    *,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w), (h, w, 1) or (h, w, 3) uint8 array as a
    baseline JFIF JPEG (4:4:4, or 4:2:0 when ``subsample``)."""
    (comp_blocks, samp, qids, qtabs,
     mcus_x, mcus_y, h, w) = _quantised_planes(arr, quality, subsample)
    planes = comp_blocks

    # Huffman tables: flat canonical codes carried in the file
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    dc_bits, dc_vals, dc_enc = _build_encoder_table(dc_syms, 4)
    ac_bits, ac_vals, ac_enc = _build_encoder_table(ac_syms, 8)

    bw_ = _BitWriter()
    preds = [0] * len(planes)
    to_go = restart_interval
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and to_go == 0:
                bw_.flush()
                bw_.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                preds = [0] * len(planes)
                to_go = restart_interval
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        zz = comp_blocks[ci][my * sv + by, mx * sh + bx]
                        preds[ci] = _encode_block(
                            bw_, zz, preds[ci], dc_enc, ac_enc
                        )
            if restart_interval:
                to_go -= 1
    bw_.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _app0_jfif()
    for tq, tab in qtabs.items():
        zz = tab.reshape(-1)[ZIGZAG].astype(np.uint8)
        out += _segment(0xDB, bytes([tq]) + zz.tobytes())
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i, ((sh, sv), qid) in enumerate(zip(samp, qids)):
        sof += bytes([i + 1, (sh << 4) | sv, qid])
    out += _segment(0xC0, sof)
    out += _segment(
        0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals)
    )
    out += _segment(
        0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals)
    )
    if restart_interval:
        out += _segment(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])  # DC table 0, AC table 0 for all
    sos += bytes([0, 63, 0])
    out += _segment(0xDA, sos)
    out += bw_.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_progressive_jpeg(
    arr: np.ndarray,
    *,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
    spectral_bands: tuple[tuple[int, int], ...] = ((1, 5), (6, 63)),
    dc_al: int = 1,
    ac_al: int = 1,
) -> bytes:
    """Encode as a progressive (SOF2) JFIF JPEG — T.81 Annex G.

    Scan script: interleaved DC first scan at ``Al=dc_al``, then for
    each component and each ``spectral_bands`` entry an AC first scan
    at ``Al=ac_al``, then DC refinement scans down to 0, then AC
    refinement scans down to 0. ``dc_al=ac_al=0`` degenerates to pure
    spectral selection. The quantised coefficients are IDENTICAL to
    :func:`encode_jpeg`'s for the same image/quality/subsampling, so
    the two decodes must agree bit-exactly — the conformance property
    tests/test_jpeg.py leans on. ``restart_interval`` applies to every
    scan (MCUs for the DC scans, blocks for the AC scans)."""
    (comp_blocks, samp, qids, qtabs,
     mcus_x, mcus_y, h, w) = _quantised_planes(arr, quality, subsample)
    if not 0 <= dc_al <= 13 or not 0 <= ac_al <= 13:
        raise ValueError("successive-approximation Al out of range")
    lo = 0
    for b0, b1 in spectral_bands:
        if b0 != lo + 1 or b1 < b0 or b1 > 63:
            raise ValueError("spectral_bands must tile 1..63 in order")
        lo = b1
    if lo != 63:
        raise ValueError("spectral_bands must end at 63")

    # one flat DC table and one flat AC table covering every symbol any
    # scan kind needs (EOBn r=0..14, ZRL, (r<<4)|s for s=1..10)
    dc_syms = list(range(12))
    ac_syms = (
        [r << 4 for r in range(15)]
        + [0xF0]
        + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    )
    dc_bits, dc_vals, dc_enc = _build_encoder_table(dc_syms, 4)
    ac_bits, ac_vals, ac_enc = _build_encoder_table(ac_syms, 8)

    ncomp = len(comp_blocks)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    out = bytearray(b"\xff\xd8")
    out += _app0_jfif()
    for tq, tab in qtabs.items():
        zz = tab.reshape(-1)[ZIGZAG].astype(np.uint8)
        out += _segment(0xDB, bytes([tq]) + zz.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i, ((sh, sv), qid) in enumerate(zip(samp, qids)):
        sof += bytes([i + 1, (sh << 4) | sv, qid])
    out += _segment(0xC2, sof)
    out += _segment(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += _segment(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    if restart_interval:
        out += _segment(0xDD, struct.pack(">H", restart_interval))

    def sos_header(comp_ids: list[int], ss: int, se: int,
                   ah: int, al: int) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])  # DC table 0 / AC table 0
        body += bytes([ss, se, (ah << 4) | al])
        return _segment(0xDA, body)

    def emit_dc_first(al: int) -> bytes:
        bw_ = _BitWriter()
        preds = [0] * ncomp
        to_go = restart_interval
        rst = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and to_go == 0:
                    bw_.flush()
                    bw_.out += bytes([0xFF, 0xD0 + (rst & 7)])
                    rst += 1
                    preds = [0] * ncomp
                    to_go = restart_interval
                for ci, (sh, sv) in enumerate(samp):
                    for by in range(sv):
                        for bx in range(sh):
                            dc = int(
                                comp_blocks[ci][my * sv + by, mx * sh + bx, 0]
                            ) >> al  # arithmetic shift (G.1.2.1)
                            diff = dc - preds[ci]
                            preds[ci] = dc
                            s = _bit_category(diff)
                            code, ln = dc_enc[s]
                            bw_.write(code, ln)
                            if s:
                                bw_.write(
                                    diff if diff >= 0
                                    else diff + (1 << s) - 1, s,
                                )
                if restart_interval:
                    to_go -= 1
        bw_.flush()
        return bytes(bw_.out)

    def emit_dc_refine(al: int) -> bytes:
        bw_ = _BitWriter()
        to_go = restart_interval
        rst = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and to_go == 0:
                    bw_.flush()
                    bw_.out += bytes([0xFF, 0xD0 + (rst & 7)])
                    rst += 1
                    to_go = restart_interval
                for ci, (sh, sv) in enumerate(samp):
                    for by in range(sv):
                        for bx in range(sh):
                            dc = int(
                                comp_blocks[ci][my * sv + by, mx * sh + bx, 0]
                            )
                            bw_.write((dc >> al) & 1, 1)
                if restart_interval:
                    to_go -= 1
        bw_.flush()
        return bytes(bw_.out)

    def comp_true_grid(ci: int) -> tuple[int, int]:
        sh, sv = samp[ci]
        return (-(- -(-w * sh // hmax) // 8), -(- -(-h * sv // vmax) // 8))

    def emit_ac_first(ci: int, ss: int, se: int, al: int) -> bytes:
        bw_ = _BitWriter()
        grid = comp_blocks[ci]
        bwv, bhv = comp_true_grid(ci)
        eobrun = 0
        rst = 0
        to_go = restart_interval

        def flush_eob() -> None:
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                code, ln = ac_enc[r << 4]
                bw_.write(code, ln)
                if r:
                    bw_.write(eobrun - (1 << r), r)
                eobrun = 0

        for by in range(bhv):
            for bx in range(bwv):
                if restart_interval and to_go == 0:
                    flush_eob()
                    bw_.flush()
                    bw_.out += bytes([0xFF, 0xD0 + (rst & 7)])
                    rst += 1
                    to_go = restart_interval
                if restart_interval:
                    to_go -= 1
                zzb = grid[by, bx]
                # point transform: truncation toward zero (G.1.2.2)
                ts = [
                    (int(v) >> al) if v >= 0 else -((-int(v)) >> al)
                    for v in zzb[ss : se + 1]
                ]
                last = -1
                for i, t in enumerate(ts):
                    if t:
                        last = i
                if last < 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                for t in ts[: last + 1]:
                    if t == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_enc[0xF0]
                        bw_.write(code, ln)
                        run -= 16
                    s = _bit_category(t)
                    if s > 10:
                        raise ValueError(
                            "JPEG AC coefficient out of baseline range"
                        )
                    code, ln = ac_enc[(run << 4) | s]
                    bw_.write(code, ln)
                    bw_.write(t if t >= 0 else t + (1 << s) - 1, s)
                    run = 0
                if last < len(ts) - 1:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
        flush_eob()
        bw_.flush()
        return bytes(bw_.out)

    def emit_ac_refine(ci: int, ss: int, se: int, al: int) -> bytes:
        bw_ = _BitWriter()
        grid = comp_blocks[ci]
        bwv, bhv = comp_true_grid(ci)
        eobrun = 0
        pend: list[int] = []  # correction bits owed to the next symbol
        rst = 0
        to_go = restart_interval

        def flush_eob() -> None:
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                code, ln = ac_enc[r << 4]
                bw_.write(code, ln)
                if r:
                    bw_.write(eobrun - (1 << r), r)
                eobrun = 0
            for b in pend:
                bw_.write(b, 1)
            pend.clear()

        for by in range(bhv):
            for bx in range(bwv):
                if restart_interval and to_go == 0:
                    flush_eob()
                    bw_.flush()
                    bw_.out += bytes([0xFF, 0xD0 + (rst & 7)])
                    rst += 1
                    to_go = restart_interval
                if restart_interval:
                    to_go -= 1
                zzb = grid[by, bx]
                # a = |trunc(v / 2^al)|: 0 zero-history, 1 newly
                # significant this scan, >=2 refined-history
                a = [abs(int(v)) >> al for v in zzb[ss : se + 1]]
                signs = [1 if v > 0 else 0 for v in zzb[ss : se + 1]]
                corr = [(abs(int(v)) >> al) & 1 for v in zzb[ss : se + 1]]
                last = -1
                for i, ai in enumerate(a):
                    if ai == 1:
                        last = i
                if last < 0:
                    # no newly-significant coefficient: the whole block
                    # joins the EOB run; its history bits ride with it
                    eobrun += 1
                    pend.extend(
                        corr[i] for i, ai in enumerate(a) if ai >= 2
                    )
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                buf: list[int] = []
                for i in range(last + 1):
                    if a[i] >= 2:
                        buf.append(corr[i])
                    elif a[i] == 0:
                        run += 1
                        if run == 16:
                            code, ln = ac_enc[0xF0]
                            bw_.write(code, ln)
                            for b in buf:
                                bw_.write(b, 1)
                            buf = []
                            run = 0
                    else:  # newly significant
                        code, ln = ac_enc[(run << 4) | 1]
                        bw_.write(code, ln)
                        bw_.write(signs[i], 1)
                        for b in buf:
                            bw_.write(b, 1)
                        buf = []
                        run = 0
                if buf:
                    raise AssertionError("refinement bit misattribution")
                if last < len(a) - 1:
                    eobrun += 1
                    pend.extend(
                        corr[i]
                        for i in range(last + 1, len(a))
                        if a[i] >= 2
                    )
                    if eobrun == 0x7FFF:
                        flush_eob()
        flush_eob()
        bw_.flush()
        return bytes(bw_.out)

    all_ids = [i + 1 for i in range(ncomp)]
    out += sos_header(all_ids, 0, 0, 0, dc_al)
    out += emit_dc_first(dc_al)
    for ci in range(ncomp):
        for b0, b1 in spectral_bands:
            out += sos_header([ci + 1], b0, b1, 0, ac_al)
            out += emit_ac_first(ci, b0, b1, ac_al)
    for lvl in range(dc_al, 0, -1):
        out += sos_header(all_ids, 0, 0, lvl, lvl - 1)
        out += emit_dc_refine(lvl - 1)
    for lvl in range(ac_al, 0, -1):
        for ci in range(ncomp):
            for b0, b1 in spectral_bands:
                out += sos_header([ci + 1], b0, b1, lvl, lvl - 1)
                out += emit_ac_refine(ci, b0, b1, lvl - 1)
    out += b"\xff\xd9"
    return bytes(out)


def _box2(plane: np.ndarray) -> np.ndarray:
    """2x2 box-filter downsample with edge replication for odd dims."""
    h, w = plane.shape
    p = plane
    if h % 2:
        p = np.vstack([p, p[-1:, :]])
    if w % 2:
        p = np.hstack([p, p[:, -1:]])
    return (p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2]) / 4.0


def _bit_category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(
    bw: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_enc: dict[int, tuple[int, int]],
    ac_enc: dict[int, tuple[int, int]],
) -> int:
    dc = int(zz[0])
    diff = dc - pred
    s = _bit_category(diff)
    code, ln = dc_enc[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _bit_category(v)
        if s > 10:
            raise ValueError("JPEG AC coefficient out of baseline range")
        code, ln = ac_enc[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, ln = ac_enc[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _segment(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _app0_jfif() -> bytes:
    return _segment(
        0xE0, b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
