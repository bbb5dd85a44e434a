"""Bounded 7z reader (demy_spark/sevenzip.py) against archives built
by an in-test writer that follows the public 7zFormat.txt layout —
the container metadata is hand-assembled per spec and the compressed
payloads are genuine raw LZMA1/LZMA2/BZip2/Deflate streams from the
stdlib, so the reader is exercised on real codec bytes, not mocks.
Covers: single-file and solid multi-file folders, every supported
codec, empty files and directory entries, the compressed
(EncodedHeader) metadata path, CRC verification, and the loud
NotImplementedError boundary for encryption / filter chains.
"""

from __future__ import annotations

import bz2
import lzma
import os
import zlib

import pytest

from demy_spark.sevenzip import (
    CODEC_BZIP2,
    CODEC_COPY,
    CODEC_DEFLATE,
    CODEC_LZMA1,
    CODEC_LZMA2,
    SIGNATURE,
    read_7z,
)

# ---------------------------------------------------------------- writer

LZMA1_PROPS = bytes([(2 * 5 + 0) * 9 + 3]) + (1 << 23).to_bytes(4, "little")
LZMA2_PROPS = bytes([22])  # (2|(22&1)) << (22//2+11) == 1<<23


def enc_num(n: int) -> bytes:
    """7z variable-length number encoding (inverse of _Reader.number)."""
    if n < 0x80:
        return bytes([n])
    for i in range(1, 8):
        high = n >> (8 * i)
        if high < (1 << (7 - i)):
            first = (0xFF << (8 - i)) & 0xFF | high
            return bytes([first]) + (n & ((1 << (8 * i)) - 1)).to_bytes(
                i, "little"
            )
    return b"\xff" + n.to_bytes(8, "little")


def bit_vector(bits: list[bool]) -> bytes:
    out = bytearray((len(bits) + 7) // 8)
    for i, b in enumerate(bits):
        if b:
            out[i >> 3] |= 0x80 >> (i & 7)
    return bytes(out)


def compress(codec: bytes, data: bytes) -> tuple[bytes, bytes]:
    """-> (packed, coder props)"""
    if codec == CODEC_COPY:
        return data, b""
    if codec == CODEC_LZMA1:
        filt = {
            "id": lzma.FILTER_LZMA1,
            "lc": 3,
            "lp": 0,
            "pb": 2,
            "dict_size": 1 << 23,
        }
        return (
            lzma.compress(data, format=lzma.FORMAT_RAW, filters=[filt]),
            LZMA1_PROPS,
        )
    if codec == CODEC_LZMA2:
        filt = {"id": lzma.FILTER_LZMA2, "dict_size": 1 << 23}
        return (
            lzma.compress(data, format=lzma.FORMAT_RAW, filters=[filt]),
            LZMA2_PROPS,
        )
    if codec == CODEC_BZIP2:
        return bz2.compress(data), b""
    if codec == CODEC_DEFLATE:
        c = zlib.compressobj(6, zlib.DEFLATED, -15)
        return c.compress(data) + c.flush(), b""
    raise AssertionError(codec)


def folder_bytes(codec: bytes, props: bytes) -> bytes:
    flags = len(codec) | (0x20 if props else 0)
    out = enc_num(1) + bytes([flags]) + codec
    if props:
        out += enc_num(len(props)) + props
    return out


def streams_info(
    pack_pos: int,
    pack_sizes: list[int],
    folders: list[bytes],
    unpack_sizes: list[int],
    substreams: list[list[bytes]] | None = None,
    folder_blobs: list[bytes] | None = None,
    sub_crc: bool = True,
) -> bytes:
    out = bytes([0x06]) + enc_num(pack_pos) + enc_num(len(pack_sizes))
    out += bytes([0x09]) + b"".join(enc_num(s) for s in pack_sizes)
    out += bytes([0x00])  # end PackInfo
    out += bytes([0x07, 0x0B]) + enc_num(len(folders)) + bytes([0x00])
    out += b"".join(folders)
    out += bytes([0x0C]) + b"".join(enc_num(s) for s in unpack_sizes)
    if folder_blobs is not None:
        # UnpackInfo-level kCRC: digest of each WHOLE folder
        out += bytes([0x0A, 0x01]) + b"".join(
            zlib.crc32(blob).to_bytes(4, "little") for blob in folder_blobs
        )
    out += bytes([0x00])  # end UnpackInfo
    if substreams is not None:
        out += bytes([0x08, 0x0D])
        out += b"".join(enc_num(len(subs)) for subs in substreams)
        out += bytes([0x09])
        for subs in substreams:
            for piece in subs[:-1]:
                out += enc_num(len(piece))
        if sub_crc:
            out += bytes([0x0A, 0x01])  # kCRC, all defined
            for subs in substreams:
                for piece in subs:
                    out += zlib.crc32(piece).to_bytes(4, "little")
        out += bytes([0x00])  # end SubStreamsInfo
    return out + bytes([0x00])  # end StreamsInfo


def files_info(files: list[tuple[str, bytes | None]]) -> bytes:
    """files: (name, content); content None = directory, b'' = empty."""
    out = enc_num(len(files))
    empty_stream = [c is None or c == b"" for _, c in files]
    if any(empty_stream):
        bv = bit_vector(empty_stream)
        out += bytes([0x0E]) + enc_num(len(bv)) + bv
        empty_file = [c == b"" for _, c in files if c is None or c == b""]
        if any(empty_file):
            bv = bit_vector(empty_file)
            out += bytes([0x0F]) + enc_num(len(bv)) + bv
    names = b"\x00" + b"".join(
        (n + "\x00").encode("utf-16-le") for n, _ in files
    )
    out += bytes([0x11]) + enc_num(len(names)) + names
    return out + bytes([0x00])


def seal(packed: bytes, header: bytes) -> bytes:
    start = len(packed).to_bytes(8, "little") + len(header).to_bytes(
        8, "little"
    ) + zlib.crc32(header).to_bytes(4, "little")
    return (
        SIGNATURE
        + b"\x00\x04"
        + zlib.crc32(start).to_bytes(4, "little")
        + start
        + packed
        + header
    )


def make_7z(
    files: list[tuple[str, bytes | None]],
    codec: bytes = CODEC_LZMA1,
    solid: bool = True,
    encoded_header: bool = False,
    folder_crc: bool = False,
    sub_crc: bool = True,
) -> bytes:
    data_files = [(n, c) for n, c in files if c]
    if solid and len(data_files) > 1:
        blobs = [b"".join(c for _, c in data_files)]
        substreams = [[c for _, c in data_files]]
    else:
        blobs = [c for _, c in data_files]
        substreams = None
    packed_parts, fold_parts, unpack = [], [], []
    for blob in blobs:
        p, props = compress(codec, blob)
        packed_parts.append(p)
        fold_parts.append(folder_bytes(codec, props))
        unpack.append(len(blob))
    packed = b"".join(packed_parts)
    header = (
        bytes([0x01, 0x04])
        + streams_info(
            0,
            [len(p) for p in packed_parts],
            fold_parts,
            unpack,
            substreams,
            folder_blobs=blobs if folder_crc else None,
            sub_crc=sub_crc,
        )
        + bytes([0x05])
        + files_info(files)
        + bytes([0x00])
    )
    if not encoded_header:
        return seal(packed, header)
    hp, hprops = compress(CODEC_LZMA1, header)
    enc = bytes([0x17]) + streams_info(
        len(packed),
        [len(hp)],
        [folder_bytes(CODEC_LZMA1, hprops)],
        [len(header)],
    )
    return seal(packed + hp, enc)


# ----------------------------------------------------------------- tests

PAYLOAD_A = b"id;name\n1;alpha\n2;beta\n" * 40
PAYLOAD_B = b"lorem ipsum dolor sit amet " * 64


def test_single_file_lzma1():
    body = make_7z([("data.csv", PAYLOAD_A)])
    assert read_7z(body) == [("data.csv", PAYLOAD_A)]


@pytest.mark.parametrize(
    "codec",
    [CODEC_COPY, CODEC_LZMA1, CODEC_LZMA2, CODEC_BZIP2, CODEC_DEFLATE],
    ids=["copy", "lzma1", "lzma2", "bzip2", "deflate"],
)
def test_solid_multifile_all_codecs(codec):
    files = [
        ("dir/", None),
        ("dir/a.csv", PAYLOAD_A),
        ("empty.txt", b""),
        ("b.txt", PAYLOAD_B),
    ]
    got = read_7z(make_7z(files, codec=codec, solid=True))
    # directories dropped, empty file kept, archive order preserved
    assert got == [
        ("dir/a.csv", PAYLOAD_A),
        ("empty.txt", b""),
        ("b.txt", PAYLOAD_B),
    ]


def test_non_solid_one_folder_per_file():
    files = [("a.bin", PAYLOAD_A), ("b.bin", PAYLOAD_B)]
    got = read_7z(make_7z(files, codec=CODEC_LZMA2, solid=False))
    assert got == files


def test_encoded_header_roundtrip():
    files = [("x.csv", PAYLOAD_A), ("y.csv", PAYLOAD_B)]
    body = make_7z(files, encoded_header=True)
    # the plain header must actually be compressed inside the archive
    assert b"x.csv".decode().encode("utf-16-le") not in body
    assert read_7z(body) == files


def test_substream_crc_detects_payload_corruption():
    body = bytearray(make_7z([("a.bin", PAYLOAD_A), ("b.bin", PAYLOAD_B)]))
    body[40] ^= 0xFF  # inside the packed stream
    with pytest.raises(ValueError):
        read_7z(bytes(body))


def test_header_crc_detects_metadata_corruption():
    body = bytearray(make_7z([("a.bin", PAYLOAD_A)]))
    body[-3] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        read_7z(bytes(body))


def test_bad_signature_and_truncation():
    with pytest.raises(ValueError, match="bad signature"):
        read_7z(b"PK\x03\x04 definitely not 7z")
    body = make_7z([("a.bin", PAYLOAD_A)])
    with pytest.raises(ValueError):
        read_7z(body[: len(body) - 5])


def test_encrypted_archive_raises_loudly():
    aes = b"\x06\xf1\x07\x01"
    folder = enc_num(1) + bytes([len(aes)]) + aes
    header = (
        bytes([0x01, 0x04])
        + streams_info(0, [4], [folder], [4])
        + bytes([0x05])
        + files_info([("secret.txt", b"xxxx")])
        + bytes([0x00])
    )
    with pytest.raises(NotImplementedError, match="encrypted"):
        read_7z(seal(b"\x00\x00\x00\x00", header))


def test_multicoder_chain_raises_loudly():
    # BCJ x86 + LZMA chain: 2 coders in one folder
    bcj = b"\x03\x03\x01\x03"
    folder = (
        enc_num(2)
        + bytes([len(CODEC_LZMA1) | 0x20])
        + CODEC_LZMA1
        + enc_num(len(LZMA1_PROPS))
        + LZMA1_PROPS
        + bytes([len(bcj)])
        + bcj
    )
    header = (
        bytes([0x01, 0x04])
        + streams_info(0, [4], [folder], [4, 4])
        + bytes([0x05])
        + files_info([("prog.exe", b"xxxx")])
        + bytes([0x00])
    )
    with pytest.raises(NotImplementedError, match="BCJ"):
        read_7z(seal(b"\x00\x00\x00\x00", header))


def test_empty_archive():
    assert read_7z(seal(b"", b"")) == []


def test_number_encoding_roundtrip():
    from demy_spark.sevenzip import _Reader

    for n in [0, 1, 0x7F, 0x80, 0x3FFF, 0x4000, 1 << 20, 1 << 35, (1 << 64) - 1]:
        assert _Reader(enc_num(n)).number() == n, n


def test_crawler_download_extracts_7z(tmp_path):
    from demy_spark.crawler import download

    files = [
        ("sub/dir/a.csv", PAYLOAD_A),
        ("b.csv", b"col\n3\n"),
        ("sub/", None),
    ]
    body = make_7z(files, codec=CODEC_LZMA2, encoded_header=True)

    def fetch(url):
        return "application/x-7z-compressed", body

    dest = str(tmp_path / "spool")
    got = sorted(download("http://s/x.7z", dest, fetch=fetch))
    assert [os.path.basename(p) for p in got] == ["b.csv", "sub-dir-a.csv"]
    assert open(os.path.join(dest, "sub-dir-a.csv"), "rb").read() == PAYLOAD_A


def test_crawler_download_7z_flatten_collision_raises(tmp_path):
    from demy_spark.crawler import download

    body = make_7z([("a/b.csv", PAYLOAD_A), ("a-b.csv", PAYLOAD_B)])

    def fetch(url):
        return "application/x-7z-compressed", body

    with pytest.raises(ValueError, match="flatten"):
        download("http://s/x.7z", str(tmp_path / "s"), fetch=fetch)


def test_stream_file_count_mismatch_raises():
    # header claims two stream-backed files but carries one substream
    p, props = compress(CODEC_LZMA1, PAYLOAD_A)
    header = (
        bytes([0x01, 0x04])
        + streams_info(0, [len(p)], [folder_bytes(CODEC_LZMA1, props)], [len(PAYLOAD_A)])
        + bytes([0x05])
        + files_info([("a.bin", PAYLOAD_A), ("b.bin", PAYLOAD_B)])
        + bytes([0x00])
    )
    with pytest.raises(ValueError, match="mismatch"):
        read_7z(seal(p, header))


def test_solid_folder_crc_without_substream_crcs():
    """The r8 review case: a solid multi-substream folder whose header
    carries a FOLDER-level digest (UnpackInfo kCRC) but no per-substream
    kCRC — all members must extract (the folder digest must not be
    mistaken for a substream digest list)."""
    files = [("a.bin", PAYLOAD_A), ("b.bin", PAYLOAD_B), ("c.bin", b"xyz" * 50)]
    body = make_7z(files, solid=True, folder_crc=True, sub_crc=False)
    assert read_7z(body) == files


def test_single_file_folder_crc_inherited_and_verified():
    body = make_7z(
        [("a.bin", PAYLOAD_A)], folder_crc=True, sub_crc=False
    )
    assert read_7z(body) == [("a.bin", PAYLOAD_A)]
    # corrupting the payload must trip the folder-level digest
    bad = bytearray(body)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError):
        read_7z(bytes(bad))


def test_solid_folder_and_substream_crcs_together():
    files = [("a.bin", PAYLOAD_A), ("b.bin", PAYLOAD_B)]
    body = make_7z(files, solid=True, folder_crc=True, sub_crc=True)
    assert read_7z(body) == files


def test_unpack_cap_rejects_declared_bomb():
    """Decompression-bomb guard (ADVICE r8): declared unpack sizes
    above the cap raise BEFORE any decompression. The default cap is
    max(64 MiB, 1000x body): a small archive legitimately expanding
    past 64 MiB must be rejected by default and readable with an
    explicit max_unpack_bytes."""
    body = make_7z([("zeros.bin", b"\x00" * (70 << 20))])
    assert len(body) < 64 << 10  # tiny on the wire, 70 MiB declared
    with pytest.raises(ValueError, match="decompression-bomb"):
        read_7z(body)
    (name, content) = read_7z(body, max_unpack_bytes=80 << 20)[0]
    assert name == "zeros.bin" and len(content) == 70 << 20
    # explicit caps bind tighter than the default too
    small = make_7z([("a.csv", PAYLOAD_A)])
    with pytest.raises(ValueError, match="decompression-bomb"):
        read_7z(small, max_unpack_bytes=10)


def test_unpack_cap_guards_the_encoded_header_as_well():
    body = make_7z([("a.csv", PAYLOAD_A)], encoded_header=True)
    with pytest.raises(ValueError, match="decompression-bomb"):
        read_7z(body, max_unpack_bytes=10)


REAL_FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "real_7z")

# x86-looking payload: NOP sleds with E8 (call rel32) sites — the bytes
# the BCJ/BCJ2 filters actually rewrite (defined before _real_archives,
# which the skipif gate evaluates at module-load time)
X86_BLOB = b"".join(
    b"\x90" * 5 + b"\xe8" + (i * 16).to_bytes(4, "little") + b"\xc3"
    for i in range(400)
)


def _real_archives():
    import glob as _glob
    import shutil as _shutil
    import subprocess
    import tempfile

    found = sorted(_glob.glob(os.path.join(REAL_FIXTURE_DIR, "*.7z")))
    if found:
        return found
    exe = _shutil.which("7z") or _shutil.which("7za") or _shutil.which("7zr")
    if exe is None:
        return []
    d = tempfile.mkdtemp(prefix="real7z_")
    for name, payload in (("a.csv", PAYLOAD_A), ("b.txt", PAYLOAD_B),
                          ("prog.exe", X86_BLOB)):
        with open(os.path.join(d, name), "wb") as f:
            f.write(payload)
    arc = os.path.join(d, "real.7z")
    subprocess.run(
        [exe, "a", arc, os.path.join(d, "a.csv"), os.path.join(d, "b.txt")],
        check=True,
        capture_output=True,
    )
    out = [arc]
    # ADVICE r10: BCJ2 wire conventions are otherwise only ever tested
    # against this repo's own encoder — when a real binary is present,
    # also produce a genuine `-m0=BCJ2` archive (full method spec from
    # the public 7-Zip -m switch docs) so subtle mismatches (tail
    # control-bit rule, range-coder normalization order) surface here.
    bcj2_arc = os.path.join(d, "real_bcj2.7z")
    r = subprocess.run(
        [exe, "a", bcj2_arc, os.path.join(d, "prog.exe"),
         "-m0=BCJ2", "-m1=LZMA:d=1m", "-m2=LZMA:d=1m", "-m3=LZMA:d=1m",
         "-mb0:1", "-mb0s1:2", "-mb0s2:3"],
        capture_output=True,
    )
    if r.returncode == 0:
        out.append(bcj2_arc)
    return out


@pytest.mark.skipif(
    not _real_archives(),
    reason="no real 7z binary or committed real-7z fixture in this "
    "container (COVERAGE.md 'Dependency-gated test policy'): the "
    "reader is otherwise validated only against the in-test writer, "
    "which shares its 7zFormat.txt reading (ADVICE r8)",
)
def test_real_7z_archive_extracts_byte_exactly():
    """Cross-validation against output of the REAL 7z/p7zip binary (or
    a committed fixture produced by one): a shared misinterpretation
    of the container layout between reader and in-test writer cannot
    pass this."""
    from demy_spark.sevenzip import _Reader, _read_streams_info

    for arc in _real_archives():
        with open(arc, "rb") as f:
            body = f.read()
        members = dict(read_7z(body))
        is_bcj2 = "bcj2" in os.path.basename(arc).lower()
        if is_bcj2:
            # the fixture must genuinely exercise the mixer path — a
            # plain-LZMA2 archive renamed *bcj2* would pass the byte
            # compare without testing anything (ADVICE r10)
            off = int.from_bytes(body[12:20], "little")
            size = int.from_bytes(body[20:28], "little")
            r = _Reader(body[32 + off: 32 + off + size])
            t = r.number()
            if t == 0x01:  # plain header (EncodedHeader parses too,
                assert r.number() == 0x04  # but 7z a writes plain here)
                si = _read_streams_info(r)
                assert any(
                    f.coders is not None
                    and any(c == BCJ2_ID for c, _, _, _ in f.coders)
                    for f in si.folders
                ), f"{arc} does not contain a BCJ2 folder"
        manifest = arc[:-3] + ".manifest.json"
        if os.path.exists(manifest):
            import hashlib
            import json as _json

            want = _json.load(open(manifest))
            got = {n: hashlib.md5(c).hexdigest() for n, c in members.items()}
            assert got == want
        elif is_bcj2:  # generated on the fly by the local binary
            assert members == {"prog.exe": X86_BLOB}
        else:
            assert members == {"a.csv": PAYLOAD_A, "b.txt": PAYLOAD_B}


# ----------------------------------------------------- BCJ/Delta chains (r9)

BCJ_X86_OLD = b"\x03\x03\x01\x03"
BCJ_X86_NEW = b"\x04"
DELTA = b"\x03"


def coder_bytes(codec: bytes, props: bytes) -> bytes:
    flags = len(codec) | (0x20 if props else 0)
    out = bytes([flags]) + codec
    if props:
        out += enc_num(len(props)) + props
    return out


def chain_folder_bytes(
    filter_codec: bytes,
    filter_props: bytes,
    comp_codec: bytes,
    comp_props: bytes,
    filter_first: bool = False,
    bind: tuple[int, int] | None = None,
) -> bytes:
    """Two-coder folder: packed -> compressor -> filter -> out. The
    bind pair feeds the filter's in-stream from the compressor's
    out-stream (stream index == coder index for 1-in/1-out coders)."""
    if filter_first:
        coders = coder_bytes(filter_codec, filter_props) + coder_bytes(
            comp_codec, comp_props
        )
        bind = bind or (0, 1)
    else:
        coders = coder_bytes(comp_codec, comp_props) + coder_bytes(
            filter_codec, filter_props
        )
        bind = bind or (1, 0)
    return enc_num(2) + coders + enc_num(bind[0]) + enc_num(bind[1])


def make_chain_7z(
    files: list[tuple[str, bytes]],
    lzma_filter: dict,
    filter_codec: bytes,
    filter_props: bytes = b"",
    filter_first: bool = False,
    bind: tuple[int, int] | None = None,
) -> bytes:
    blob = b"".join(c for _, c in files)
    packed = lzma.compress(
        blob,
        format=lzma.FORMAT_RAW,
        filters=[lzma_filter, {"id": lzma.FILTER_LZMA2, "dict_size": 1 << 23}],
    )
    folder = chain_folder_bytes(
        filter_codec, filter_props, CODEC_LZMA2, LZMA2_PROPS, filter_first, bind
    )
    header = (
        bytes([0x01, 0x04])
        + streams_info(
            0,
            [len(packed)],
            [folder],
            [len(blob), len(blob)],  # one size per out-stream
            [[c for _, c in files]] if len(files) > 1 else None,
        )
        + bytes([0x05])
        + files_info(files)
        + bytes([0x00])
    )
    return seal(packed, header)


@pytest.mark.parametrize("fid", [BCJ_X86_OLD, BCJ_X86_NEW])
@pytest.mark.parametrize("filter_first", [False, True])
def test_bcj_x86_chain_roundtrip(fid, filter_first):
    """BCJ(x86)+LZMA2 chain (VERDICT r8 task 6): the in-test writer
    BCJ-encodes a genuine x86-looking stream through liblzma's raw
    chain; the reader must invert it byte-exactly, whichever coder
    order the archive lists and under both BCJ codec ids."""
    body = make_chain_7z(
        [("prog.bin", X86_BLOB), ("readme.txt", PAYLOAD_B)],
        {"id": lzma.FILTER_X86},
        fid,
        filter_first=filter_first,
    )
    members = dict(read_7z(body))
    assert members == {"prog.bin": X86_BLOB, "readme.txt": PAYLOAD_B}


def test_bcj_filter_genuinely_transforms():
    """Guard against a vacuous roundtrip: decoding the same packed
    stream WITHOUT the x86 branch filter must NOT yield the original
    bytes — i.e. the filter really is in the data path."""
    packed = lzma.compress(
        X86_BLOB,
        format=lzma.FORMAT_RAW,
        filters=[
            {"id": lzma.FILTER_X86},
            {"id": lzma.FILTER_LZMA2, "dict_size": 1 << 23},
        ],
    )
    no_filter = lzma.LZMADecompressor(
        format=lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_LZMA2, "dict_size": 1 << 23}],
    ).decompress(packed)
    assert no_filter != X86_BLOB and len(no_filter) == len(X86_BLOB)


def test_bcj_x86_start_offset_props():
    body = make_chain_7z(
        [("prog.bin", X86_BLOB)],
        {"id": lzma.FILTER_X86, "start_offset": 0x1000},
        BCJ_X86_OLD,
        filter_props=(0x1000).to_bytes(4, "little"),
    )
    assert dict(read_7z(body)) == {"prog.bin": X86_BLOB}


def test_delta_chain_roundtrip():
    wave = bytes(((i * 7) ^ (i >> 3)) & 0xFF for i in range(4096))
    body = make_chain_7z(
        [("audio.raw", wave)],
        {"id": lzma.FILTER_DELTA, "dist": 4},
        DELTA,
        filter_props=bytes([3]),  # props byte = dist - 1
    )
    assert dict(read_7z(body)) == {"audio.raw": wave}


def test_chain_over_non_lzma_coder_stays_loud():
    packed, props = compress(CODEC_BZIP2, X86_BLOB)
    folder = chain_folder_bytes(BCJ_X86_OLD, b"", CODEC_BZIP2, props)
    header = (
        bytes([0x01, 0x04])
        + streams_info(0, [len(packed)], [folder], [len(X86_BLOB)] * 2)
        + bytes([0x05])
        + files_info([("prog.bin", X86_BLOB)])
        + bytes([0x00])
    )
    with pytest.raises(NotImplementedError, match="2-coder folder"):
        read_7z(seal(packed, header))


def test_chain_with_reversed_bind_pair_stays_loud():
    """A bind pair wiring packed -> FILTER -> LZMA (filter before the
    decompressor) is not a layout `7z a` writes and not one liblzma's
    raw chain can express — must raise, not silently mis-decode."""
    body = make_chain_7z(
        [("prog.bin", X86_BLOB)],
        {"id": lzma.FILTER_X86},
        BCJ_X86_OLD,
        bind=(0, 1),  # comp in-stream <- filter out-stream: backwards
    )
    with pytest.raises(NotImplementedError, match="2-coder folder"):
        read_7z(body)


def test_crawler_download_extracts_bcj_7z(tmp_path):
    from demy_spark.crawler import download

    body = make_chain_7z(
        [("tool.exe", X86_BLOB), ("notes.txt", PAYLOAD_B)],
        {"id": lzma.FILTER_X86},
        BCJ_X86_OLD,
    )
    dest = str(tmp_path / "drop")
    paths = download(
        "http://m.test/tool.7z", dest, fetch=lambda u: ("application/x-7z", body)
    )
    assert sorted(os.path.basename(p) for p in paths) == ["notes.txt", "tool.exe"]
    with open(os.path.join(dest, "tool.exe"), "rb") as f:
        assert f.read() == X86_BLOB


def test_bzip2_bomb_is_bounded_during_decompression():
    """code-review r9: the bomb cap must hold DURING decompression —
    a BZip2 folder declaring a small size but actually expanding huge
    must raise the size-mismatch error after at most size+1 bytes are
    produced, never materialize the real payload, and an oversize
    stream must not be silently truncated."""
    big = b"\x00" * (8 << 20)  # 8 MiB of zeros -> tiny bz2 stream
    packed = bz2.compress(big)
    header = (
        bytes([0x01, 0x04])
        + streams_info(
            0, [len(packed)], [folder_bytes(CODEC_BZIP2, b"")], [1024]
        )
        + bytes([0x05])
        + files_info([("z.bin", b"\x00" * 1024)])
        + bytes([0x00])
    )
    with pytest.raises(ValueError, match="header says 1024"):
        read_7z(seal(packed, header))


def test_oversize_stream_not_silently_truncated_any_codec():
    for codec in (CODEC_LZMA1, CODEC_LZMA2, CODEC_BZIP2, CODEC_DEFLATE):
        packed, props = compress(codec, PAYLOAD_A)
        declared = len(PAYLOAD_A) - 7  # lie: smaller than reality
        header = (
            bytes([0x01, 0x04])
            + streams_info(
                0, [len(packed)], [folder_bytes(codec, props)], [declared]
            )
            + bytes([0x05])
            + files_info([("a.csv", PAYLOAD_A[:declared])])
            + bytes([0x00])
        )
        with pytest.raises(ValueError, match="header says"):
            read_7z(seal(packed, header))


def test_memory_server_chunk_index_zero_and_unknown_id():
    from demy_spark.remotestore import HttpFileStore, MemoryEpiServer

    server = MemoryEpiServer()
    store = HttpFileStore("http://r", chunk_size=8, transport=server.transport)
    fid = store.upload("f.bin", b"0123456789abcdef")
    status, _ = server.transport(
        "GET", f"http://r/epifiles/ws/manifestfile/id/{fid}/chunk_index/0", None
    )
    assert status == 404  # 1-based indexes: 0 must not serve chunks[-1]
    status, body = server.transport(
        "POST",
        "http://r/epifiles/ws/manifestfile/id/nope",
        {"content": "", "hash": "d41d8cd98f00b204e9800998ecf8427e",
         "chunk_index": "2"},
    )
    assert status == 404 and b"unknown" in body


# ------------------------------------------------- BCJ2 folders (r10)

BCJ2_ID = b"\x03\x03\x01\x1b"


def bcj2_streams(blob: bytes):
    from demy_spark.bcj2 import bcj2_encode

    return bcj2_encode(blob)  # (main, call, jump, rc)


def make_bcj2_7z(
    files: list[tuple[str, bytes]],
    sub_codec: bytes = CODEC_LZMA2,
    bcj2_first: bool = False,
    substream_crcs: bool = True,
) -> bytes:
    """Archive one folder shaped like `7z a -m0=BCJ2` output: three
    sub-coders compressing the main/call/jump streams, the range-coded
    control stream packed directly, a 4-in/1-out BCJ2 mixer on top.
    ``bcj2_first`` flips the coder declaration order (the graph is the
    same; readers must not assume an order)."""
    blob = b"".join(c for _, c in files)
    main, call, jump, rc = bcj2_streams(blob)
    packs, subs = [], []
    for stream in (main, call, jump):
        p, props = compress(sub_codec, stream)
        packs.append(p)
        subs.append((p, props, len(stream)))
    bcj2_coder = bytes([len(BCJ2_ID) | 0x10]) + BCJ2_ID + enc_num(4) + enc_num(1)
    sub_coders = b"".join(coder_bytes(sub_codec, props) for _, props, _ in subs)
    if not bcj2_first:
        # coders: sub0 sub1 sub2 bcj2 — global ins 0,1,2 then 3..6;
        # outs 0,1,2,3; bind bcj2.in(3+k) <- sub_k.out(k); rc packed at 6
        folder = enc_num(4) + sub_coders + bcj2_coder
        binds = [(3, 0), (4, 1), (5, 2)]
        packed_idx = [0, 1, 2, 6]
        unpack = [len(main), len(call), len(jump), len(blob)]
    else:
        # coders: bcj2 sub0 sub1 sub2 — bcj2 ins 0..3, sub ins 4,5,6;
        # outs: bcj2=0, subs=1,2,3; rc is bcj2.in3, packed directly
        folder = enc_num(4) + bcj2_coder + sub_coders
        binds = [(0, 1), (1, 2), (2, 3)]
        packed_idx = [4, 5, 6, 3]
        unpack = [len(blob), len(main), len(call), len(jump)]
    folder += b"".join(enc_num(i) + enc_num(o) for i, o in binds)
    folder += b"".join(enc_num(i) for i in packed_idx)
    pack_streams = packs + [rc]
    header = (
        bytes([0x01, 0x04])
        + streams_info(
            0,
            [len(p) for p in pack_streams],
            [folder],
            unpack,
            [[c for _, c in files]] if len(files) > 1 else None,
            folder_blobs=[blob],
            sub_crc=substream_crcs,
        )
        + bytes([0x05])
        + files_info(files)
        + bytes([0x00])
    )
    return seal(b"".join(pack_streams), header)


@pytest.mark.parametrize("sub_codec", [CODEC_LZMA1, CODEC_LZMA2, CODEC_COPY])
@pytest.mark.parametrize("bcj2_first", [False, True])
def test_bcj2_folder_roundtrip(sub_codec, bcj2_first):
    body = make_bcj2_7z(
        [("prog.exe", X86_BLOB), ("readme.txt", PAYLOAD_B)],
        sub_codec=sub_codec,
        bcj2_first=bcj2_first,
    )
    assert dict(read_7z(body)) == {
        "prog.exe": X86_BLOB,
        "readme.txt": PAYLOAD_B,
    }


def test_bcj2_folder_is_not_a_passthrough():
    """The main stream alone must NOT equal the original bytes — the
    mixer really reconstructs converted fields from call/jump."""
    main, call, jump, rc = bcj2_streams(X86_BLOB)
    assert main != X86_BLOB and len(main) < len(X86_BLOB)
    assert len(call) == 4 * 400  # every E8 site converted


def test_bcj2_crc_catches_control_stream_damage():
    body = bytearray(make_bcj2_7z([("prog.exe", X86_BLOB)]))
    main, call, jump, rc = bcj2_streams(X86_BLOB)
    # flip a bit inside the rc stream (stored verbatim as the final
    # pack stream, right before the end header)
    idx = bytes(body).rindex(rc)
    body[idx + 2] ^= 0x40
    with pytest.raises(ValueError):
        read_7z(bytes(body))


def test_bcj2_substream_crc_verified_per_member():
    body = make_bcj2_7z(
        [("a.exe", X86_BLOB[:2000]), ("b.exe", X86_BLOB[2000:])],
        substream_crcs=True,
    )
    members = dict(read_7z(body))
    assert members["a.exe"] + members["b.exe"] == X86_BLOB


def test_bcj2_bomb_cap_counts_intermediate_streams():
    from demy_spark.sevenzip import _Folder

    f = _Folder()
    f.coders = [(BCJ2_ID, b"", 4, 1)]
    f.unpack_sizes = [100, 8, 8, 116]
    f.final_out = 3
    assert f.materialized_size == 232  # BCJ2 materializes every stream
    single = _Folder()
    single.unpack_sizes = [116]
    assert single.materialized_size == 116


def test_bcj2_declared_bomb_rejected_before_decode():
    body = bytearray(make_bcj2_7z([("prog.exe", X86_BLOB)]))
    with pytest.raises(ValueError, match="decompression-bomb"):
        read_7z(bytes(body), max_unpack_bytes=10)


def test_crawler_download_extracts_bcj2_7z(tmp_path):
    from demy_spark.crawler import download

    body = make_bcj2_7z([("tool.exe", X86_BLOB), ("notes.txt", PAYLOAD_B)])
    dest = str(tmp_path / "drop")
    paths = download(
        "http://m.test/tool.7z", dest, fetch=lambda u: ("application/x-7z", body)
    )
    assert sorted(os.path.basename(p) for p in paths) == ["notes.txt", "tool.exe"]
    with open(os.path.join(dest, "tool.exe"), "rb") as f:
        assert f.read() == X86_BLOB


def test_bcj2_deep_coder_chain_stays_loud():
    """BCJ2 whose call stream is fed by a 2-coder chain (depth 2) is
    outside the bounded reader — must raise, not mis-decode."""
    blob = X86_BLOB[:512]
    main, call, jump, rc = bcj2_streams(blob)
    packs = []
    coders = b""
    # sub0 compresses main; sub1+sub2 form a delta->lzma chain for call
    p, props = compress(CODEC_LZMA2, main)
    packs.append(p)
    coders += coder_bytes(CODEC_LZMA2, props)
    p, props = compress(CODEC_LZMA2, call)
    packs.append(p)
    coders += coder_bytes(CODEC_LZMA2, props)
    coders += coder_bytes(DELTA, bytes([3]))
    p, props = compress(CODEC_LZMA2, jump)
    packs.append(p)
    coders += coder_bytes(CODEC_LZMA2, props)
    bcj2_coder = bytes([len(BCJ2_ID) | 0x10]) + BCJ2_ID + enc_num(4) + enc_num(1)
    folder = enc_num(5) + coders + bcj2_coder
    # coders: lzma(main)=0, lzma(call-packed)=1, delta=2, lzma(jump)=3,
    # bcj2=4. ins: 0,1,2,3,4..7; outs: 0,1,2,3,4.
    # delta.in(2) <- lzma1.out(1); bcj2 ins 4,5,6 <- outs 0,2,3
    binds = [(2, 1), (4, 0), (5, 2), (6, 3)]
    packed_idx = [0, 1, 3, 7]
    folder += b"".join(enc_num(i) + enc_num(o) for i, o in binds)
    folder += b"".join(enc_num(i) for i in packed_idx)
    pack_streams = packs + [rc]
    header = (
        bytes([0x01, 0x04])
        + streams_info(
            0,
            [len(p) for p in pack_streams],
            [folder],
            [len(main), len(call), len(call), len(jump), len(blob)],
        )
        + bytes([0x05])
        + files_info([("prog.exe", blob)])
        + bytes([0x00])
    )
    with pytest.raises(NotImplementedError, match="deeper than one"):
        read_7z(seal(b"".join(pack_streams), header))


def test_ppmd_still_raises_loudly():
    ppmd = b"\x03\x04\x01"
    folder = enc_num(1) + bytes([len(ppmd)]) + ppmd
    header = (
        bytes([0x01, 0x04])
        + streams_info(0, [4], [folder], [4])
        + bytes([0x05])
        + files_info([("doc.txt", b"xxxx")])
        + bytes([0x00])
    )
    with pytest.raises(NotImplementedError, match="PPMd"):
        read_7z(seal(b"\x00\x00\x00\x00", header))


def test_crawl_site_prog7z_fixture_is_genuinely_bcj2():
    """q145's .7z fixture must keep exercising the BCJ2 path: parse
    its folder graph and assert the mixer is present, and that the
    members match the plain expected copies the oracle reads."""
    import demy_spark
    from demy_spark.sevenzip import _Reader, _read_streams_info, read_7z

    site = os.path.join(
        os.path.dirname(os.path.abspath(demy_spark.__file__)),
        "fixtures",
        "crawl_site",
    )
    with open(os.path.join(site, "packs", "prog.7z"), "rb") as f:
        body = f.read()
    # locate the end header (same arithmetic as read_7z)
    off = int.from_bytes(body[12:20], "little")
    size = int.from_bytes(body[20:28], "little")
    r = _Reader(body[32 + off : 32 + off + size])
    assert r.number() == 0x01  # kHeader (plain, not encoded)
    assert r.number() == 0x04  # kMainStreams
    si = _read_streams_info(r)
    assert len(si.folders) == 1 and si.folders[0].coders is not None
    assert any(cid == BCJ2_ID for cid, _, _, _ in si.folders[0].coders)
    assert si.folders[0].num_pack_streams == 4
    members = dict(read_7z(body))
    for member, flat in [("tool.exe", "tool.exe"),
                         ("docs/readme.txt", "docs-readme.txt")]:
        with open(os.path.join(site, "private", "expected_7z", flat), "rb") as f:
            assert members[member] == f.read()


def test_bcj2_two_coder_folder_roundtrip():
    """r10 review: a BCJ2 folder with a single LZMA2 sub-coder (main
    compressed, call/jump/rc packed raw) is a valid 2-coder graph and
    must decode, not fall into the filter-chain NotImplementedError."""
    blob = X86_BLOB[:1024] + PAYLOAD_B
    main, call, jump, rc = bcj2_streams(blob)
    pmain, props = compress(CODEC_LZMA2, main)
    bcj2_coder = bytes([len(BCJ2_ID) | 0x10]) + BCJ2_ID + enc_num(4) + enc_num(1)
    # coders: lzma2(main)=0 (in 0, out 0), bcj2=1 (ins 1-4, out 1)
    folder = (
        enc_num(2) + coder_bytes(CODEC_LZMA2, props) + bcj2_coder
        + enc_num(1) + enc_num(0)  # bind: bcj2.in(1) <- lzma.out(0)
        + b"".join(enc_num(i) for i in (0, 2, 3, 4))  # packed indices
    )
    pack_streams = [pmain, call, jump, rc]
    header = (
        bytes([0x01, 0x04])
        + streams_info(0, [len(p) for p in pack_streams], [folder],
                       [len(main), len(blob)], folder_blobs=[blob])
        + bytes([0x05])
        + files_info([("prog.exe", blob)])
        + bytes([0x00])
    )
    body = seal(b"".join(pack_streams), header)
    assert read_7z(body) == [("prog.exe", blob)]


def test_bcj2_single_coder_folder_all_raw():
    """r10 review: a 1-coder folder that IS the BCJ2 mixer (all four
    streams packed raw) must route to the graph decoder, not the
    single-codec path."""
    blob = X86_BLOB[:512]
    main, call, jump, rc = bcj2_streams(blob)
    bcj2_coder = bytes([len(BCJ2_ID) | 0x10]) + BCJ2_ID + enc_num(4) + enc_num(1)
    folder = enc_num(1) + bcj2_coder + b"".join(
        enc_num(i) for i in (0, 1, 2, 3)
    )
    pack_streams = [main, call, jump, rc]
    header = (
        bytes([0x01, 0x04])
        + streams_info(0, [len(p) for p in pack_streams], [folder],
                       [len(blob)], folder_blobs=[blob])
        + bytes([0x05])
        + files_info([("raw.bin", blob)])
        + bytes([0x00])
    )
    assert read_7z(seal(b"".join(pack_streams), header)) == [("raw.bin", blob)]


def test_bcj2_output_into_downstream_coder_stays_loud():
    """ADVICE r10 (medium): a folder that binds the BCJ2 mixer's output
    INTO a downstream coder (here: Copy) used to return the mixer's
    intermediate bytes and slice members against the larger declared
    final size — a silent short extraction when no CRCs are present.
    The reader must refuse the graph, not mis-extract."""
    blob = X86_BLOB[:512]
    main, call, jump, rc = bcj2_streams(blob)
    bcj2_coder = bytes([len(BCJ2_ID) | 0x10]) + BCJ2_ID + enc_num(4) + enc_num(1)
    # coders: bcj2=0 (ins 0-3, out 0), copy=1 (in 4, out 1);
    # bind copy.in(4) <- bcj2.out(0); finals = [1] != bcj2's out
    folder = (
        enc_num(2) + bcj2_coder + coder_bytes(CODEC_COPY, b"")
        + enc_num(4) + enc_num(0)
        + b"".join(enc_num(i) for i in (0, 1, 2, 3))
    )
    pack_streams = [main, call, jump, rc]
    declared = len(blob) + 40  # lies: larger than the mixer's output
    header = (
        bytes([0x01, 0x04])
        + streams_info(0, [len(p) for p in pack_streams], [folder],
                       [len(blob), declared])
        + bytes([0x05])
        + files_info([("prog.exe", blob + b"\x00" * 40)])
        + bytes([0x00])
    )
    with pytest.raises(NotImplementedError, match="not the BCJ2 mixer"):
        read_7z(seal(b"".join(pack_streams), header))
