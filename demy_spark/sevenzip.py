"""Bounded pure-stdlib 7z reader for the crawler's in-flight deflate.

The reference ingests ``.7z`` crawl payloads through commons-compress
(`net2demy/src/main/scala/Execute.scala:25-26,319`); this module covers
the overwhelmingly common archives ``7z a`` produces — single-coder
folders compressed with LZMA1/LZMA2/BZip2/Deflate/Copy, solid or not,
optionally with a compressed (EncodedHeader) metadata block, and (r9)
the two-coder BCJ-x86 / Delta filter chains over LZMA1/LZMA2 that
executables and some mirrors carry (liblzma decodes the whole chain
raw, so this stays pure stdlib) — using only ``lzma``/``bz2``/
``zlib`` — and (r10) the four-stream BCJ2 folders ``7z a -m0=BCJ2``
writes, recombined by the pure-Python ``demy_spark.bcj2`` decoder
under the container's CRC checks. Anything beyond that boundary
(PPMd, AES encryption, Deflate64, filter chains over non-LZMA coders,
coder graphs deeper than a depth-1 BCJ2 mixer, external streams-info)
raises a loud ``NotImplementedError`` naming the codec, never a
silent wrong
extraction; structural damage (bad signature, CRC mismatch, truncated
header) raises ``ValueError``; declared unpack sizes above the
decompression-bomb cap raise before any decompression.

Container layout follows the public 7-Zip format documentation
(``7zFormat.txt`` in the 7-Zip source distribution): a 32-byte
signature header locating a property-tree "end header", which either
IS the metadata (kHeader) or points at a compressed copy of it
(kEncodedHeader). All multi-byte integers in the tree use the 7z
variable-length number encoding.
"""

from __future__ import annotations

import bz2
import io
import lzma
import zlib
from dataclasses import dataclass, field

SIGNATURE = b"7z\xbc\xaf\x27\x1c"

# property-tree ids (7zFormat.txt)
K_END = 0x00
K_HEADER = 0x01
K_ARCHIVE_PROPERTIES = 0x02
K_ADDITIONAL_STREAMS = 0x03
K_MAIN_STREAMS = 0x04
K_FILES_INFO = 0x05
K_PACK_INFO = 0x06
K_UNPACK_INFO = 0x07
K_SUBSTREAMS_INFO = 0x08
K_SIZE = 0x09
K_CRC = 0x0A
K_FOLDER = 0x0B
K_CODERS_UNPACK_SIZE = 0x0C
K_NUM_UNPACK_STREAM = 0x0D
K_EMPTY_STREAM = 0x0E
K_EMPTY_FILE = 0x0F
K_NAME = 0x11
K_ENCODED_HEADER = 0x17
K_DUMMY = 0x19

# single-coder codecs the bounded reader decompresses (public codec
# ids from the 7-Zip methods registry)
CODEC_COPY = b"\x00"
CODEC_LZMA1 = b"\x03\x01\x01"
CODEC_LZMA2 = b"\x21"
CODEC_BZIP2 = b"\x04\x02\x02"
CODEC_DEFLATE = b"\x04\x01\x08"
# branch/delta FILTERS, supported when chained with LZMA1/LZMA2 (the
# pairing `7z a` actually writes) — liblzma decodes the whole chain in
# one raw decompressor. BCJ x86 has an old long id and a new short one.
CODEC_BCJ_X86 = (b"\x03\x03\x01\x03", b"\x04")
CODEC_DELTA = b"\x03"
# BCJ2: the 4-stream x86 branch converter (main/call/jump + range-coded
# control stream), decoded by demy_spark.bcj2 (r10)
CODEC_BCJ2 = b"\x03\x03\x01\x1b"

_CODEC_NAMES = {
    b"\x06\xf1\x07\x01": "AES-256+SHA-256 (encrypted archive)",
    b"\x04\x01\x01": "Deflate64",
    b"\x03\x04\x01": "PPMd",
}


class _Reader:
    """Byte cursor with the 7z variable-length number decoder."""

    def __init__(self, data: bytes):
        self._b = data
        self._pos = 0

    def bytes(self, n: int) -> bytes:
        if self._pos + n > len(self._b):
            raise ValueError("truncated 7z header")
        out = self._b[self._pos : self._pos + n]
        self._pos += n
        return out

    def byte(self) -> int:
        return self.bytes(1)[0]

    def number(self) -> int:
        first = self.byte()
        mask = 0x80
        value = 0
        for i in range(8):
            if (first & mask) == 0:
                value |= (first & (mask - 1)) << (8 * i)
                return value
            value |= self.byte() << (8 * i)
            mask >>= 1
        return value

    def bit_vector(self, n: int) -> list[bool]:
        data = self.bytes((n + 7) // 8)
        return [bool(data[i >> 3] & (0x80 >> (i & 7))) for i in range(n)]

    def all_or_bits(self, n: int) -> list[bool]:
        """The AllAreDefined-prefixed bit vector used by kCRC."""
        return [True] * n if self.byte() else self.bit_vector(n)


@dataclass
class _Folder:
    codec_id: bytes = b""
    props: bytes = b""
    # decode-side branch/delta filters applied AFTER the main
    # decompressor (at most one today: BCJ x86 or Delta)
    filters: list[tuple[bytes, bytes]] = field(default_factory=list)
    unpack_sizes: list[int] = field(default_factory=list)
    final_out: int = 0  # index of the folder's final out-stream
    num_out_streams: int = 1
    num_pack_streams: int = 1
    num_substreams: int = 1
    # BCJ2 folder graph (None for the single-coder / chain shapes):
    # coders as (codec_id, props, nin, nout), bind pairs as
    # (in_stream, out_stream) global indices, packed_indices mapping
    # this folder's pack streams (in PackInfo order) to in-streams
    coders: list[tuple[bytes, bytes, int, int]] | None = None
    bind_pairs: list[tuple[int, int]] | None = None
    packed_indices: list[int] | None = None
    # None = the respective header block was absent (defaults apply);
    # [] is meaningful for a zero-substream folder
    substream_sizes: list[int] | None = None
    substream_crcs: list[int | None] | None = None
    folder_crc: int | None = None  # UnpackInfo-level digest (whole folder)

    @property
    def unpack_size(self) -> int:
        if not self.unpack_sizes:
            return 0
        return self.unpack_sizes[min(self.final_out, len(self.unpack_sizes) - 1)]

    @property
    def materialized_size(self) -> int:
        """Bytes this folder materializes in memory while decoding —
        the bomb-cap basis. Single-coder and liblzma-chain folders
        stream (only the final output lands); a BCJ2 folder first
        materializes each intermediate stream, so ALL out sizes count."""
        if self.coders is not None:
            return sum(self.unpack_sizes)
        return self.unpack_size


_FILTER_IDS = set(CODEC_BCJ_X86) | {CODEC_DELTA}
_LZMA_IDS = {CODEC_LZMA1, CODEC_LZMA2}


def _read_folder(r: _Reader) -> _Folder:
    f = _Folder()
    num_coders = r.number()
    coders: list[tuple[bytes, bytes, int, int]] = []
    total_in = total_out = 0
    for _ in range(num_coders):
        flags = r.byte()
        codec_id = r.bytes(flags & 0x0F)
        nin = nout = 1
        if flags & 0x10:
            nin, nout = r.number(), r.number()
        props = b""
        if flags & 0x20:
            props = r.bytes(r.number())
        if codec_id in _CODEC_NAMES:
            raise NotImplementedError(
                f"7z codec not supported by the bounded stdlib reader: "
                f"{_CODEC_NAMES[codec_id]}; decompress out-of-band"
            )
        if codec_id == CODEC_BCJ2:
            if (nin, nout) != (4, 1):
                raise ValueError(
                    f"7z BCJ2 coder declares {nin}-in/{nout}-out "
                    "(must be 4-in/1-out)"
                )
        elif nin != 1 or nout != 1:
            raise NotImplementedError("7z coder with multiple streams")
        coders.append((codec_id, props, nin, nout))
        total_in += nin
        total_out += nout
    f.num_out_streams = total_out
    # bind pairs tie one coder's out-stream to another's in-stream;
    # the remaining unbound in-streams are fed by pack streams
    bind_pairs = [(r.number(), r.number()) for _ in range(total_out - 1)]
    num_pack = total_in - len(bind_pairs)
    f.num_pack_streams = num_pack
    bound_ins = {i for i, _ in bind_pairs}
    bound_outs = {o for _, o in bind_pairs}
    if num_pack > 1:
        packed_indices = [r.number() for _ in range(num_pack)]
    else:  # the single pack stream feeds the one unbound in-stream
        packed_indices = [i for i in range(total_in) if i not in bound_ins]
    finals = [o for o in range(total_out) if o not in bound_outs]

    # a BCJ2 mixer routes to the graph decoder whatever the coder
    # count (r10 review: `7z a` writes it with three sub-coders, but
    # 1- and 2-coder BCJ2 folders — raw or partially-compressed
    # streams — are equally valid archives)
    if sum(cid == CODEC_BCJ2 for cid, _, _, _ in coders) == 1:
        if len(finals) != 1:
            raise ValueError("7z BCJ2 folder without a single final out-stream")
        # the folder's final out-stream must be the BCJ2 mixer's own
        # output (every supported coder is 1-out, so coder i's global
        # out-stream index is i). A graph that binds the BCJ2 output
        # INTO a downstream coder would otherwise decode to the
        # mixer's intermediate bytes and slice substreams against the
        # larger declared final size — a silent wrong extraction when
        # no CRCs are present (ADVICE r10, medium).
        bcj2_out = next(
            i for i, (cid, _, _, _) in enumerate(coders) if cid == CODEC_BCJ2
        )
        if finals[0] != bcj2_out:
            raise NotImplementedError(
                "7z BCJ2 folder whose final out-stream is not the BCJ2 "
                "mixer's output (downstream coder after BCJ2); "
                "decompress out-of-band"
            )
        if len(set(packed_indices)) != num_pack or not (
            set(packed_indices) | bound_ins == set(range(total_in))
            and not (set(packed_indices) & bound_ins)
        ):
            raise ValueError("7z BCJ2 folder with inconsistent stream wiring")
        f.final_out = finals[0]
        f.coders = coders
        f.bind_pairs = bind_pairs
        f.packed_indices = packed_indices
        return f
    if num_coders == 1:
        f.codec_id, f.props = coders[0][0], coders[0][1]
        return f
    if num_coders == 2:
        # the one 2-coder chain `7z a` writes beyond plain compression:
        # a branch/delta filter over an LZMA-family coder (BCJ x86 is
        # what executables get). liblzma decodes the whole chain, so
        # this stays pure-stdlib; anything else is still loud below.
        fidx = [i for i, (cid, _, _, _) in enumerate(coders) if cid in _FILTER_IDS]
        cidx = [i for i, (cid, _, _, _) in enumerate(coders) if cid in _LZMA_IDS]
        if len(fidx) == 1 and len(cidx) == 1:
            fi, ci = fidx[0], cidx[0]
            # decode path must be packed -> LZMA coder -> filter: the
            # bind pair feeds the filter's in-stream from the LZMA
            # coder's out-stream (streams are indexed in coder order;
            # every 1-in/1-out coder's stream i == coder i)
            if bind_pairs == [(fi, ci)]:
                f.codec_id, f.props = coders[ci][0], coders[ci][1]
                f.filters = [(coders[fi][0], coders[fi][1])]
                f.final_out = fi
                return f
        raise NotImplementedError(
            "7z 2-coder folder is outside the bounded stdlib reader "
            f"(coders {[c.hex() for c, _, _, _ in coders]}, bind "
            f"{bind_pairs[0]}; supported: BCJ x86 / Delta over "
            "LZMA1/LZMA2); decompress out-of-band"
        )
    raise NotImplementedError(
        f"7z multi-coder folder ({num_coders} coders, "
        f"{[c.hex() for c, _, _, _ in coders]}) is outside the bounded "
        "stdlib reader (supported: a single BCJ2 mixer); decompress "
        "out-of-band"
    )


def _decompress(folder: _Folder, packs: list[bytes]) -> bytes:
    try:
        if folder.coders is not None:
            out = _decompress_bcj2(folder, packs)
            # same size contract _decode_stream enforces for simple
            # folders: short/long output must be loud, never sliced
            if len(out) != folder.unpack_size:
                raise ValueError(
                    f"7z BCJ2 folder decoded {len(out)} bytes where "
                    f"{folder.unpack_size} were declared"
                )
            return out
        return _decompress_inner(folder, packs[0])
    except (lzma.LZMAError, zlib.error, OSError, EOFError) as e:
        # codec-level damage surfaces as the same ValueError contract
        # as a CRC mismatch — callers see one "corrupt archive" class
        raise ValueError(f"corrupt 7z packed stream: {e}") from e


def _branch_filter_spec(codec_id: bytes, props: bytes) -> dict:
    """liblzma raw-chain spec for a supported 7z branch/delta filter.
    BCJ x86 props are empty or a 4-byte little-endian start offset;
    Delta props are one byte holding distance-1 (7zFormat.txt)."""
    if codec_id in CODEC_BCJ_X86:
        spec = {"id": lzma.FILTER_X86}
        if len(props) >= 4:
            spec["start_offset"] = int.from_bytes(props[:4], "little")
        return spec
    if codec_id == CODEC_DELTA:
        if len(props) != 1:
            raise ValueError("7z delta filter without 1-byte distance")
        return {"id": lzma.FILTER_DELTA, "dist": props[0] + 1}
    raise NotImplementedError(f"7z filter id {codec_id.hex()}")


def _decompress_inner(folder: _Folder, packed: bytes) -> bytes:
    chain = [_branch_filter_spec(c, p) for c, p in folder.filters]
    if chain and folder.codec_id not in _LZMA_IDS:  # _read_folder enforces
        raise NotImplementedError("7z filter chain over a non-LZMA coder")
    return _decode_stream(
        folder.codec_id, folder.props, chain, packed, folder.unpack_size
    )


def _decode_stream(
    cid: bytes, props: bytes, chain: list[dict], packed: bytes, size: int
) -> bytes:
    # every codec decompresses through a bounded incremental API with
    # max_length = size + 1: the declared size caps the allocation
    # (the bomb guard holds DURING decompression, not just before it),
    # while the +1 keeps the len(out) != size check able to catch a
    # stream whose real output EXCEEDS the declared size instead of
    # silently truncating it (code-review r9: bz2.decompress()
    # materialized the whole actual payload; the [:size] slices hid
    # oversize streams)
    if cid == CODEC_COPY:
        out = packed[: size + 1]
    elif cid == CODEC_LZMA1:
        if len(props) < 5:
            raise ValueError("LZMA1 coder without 5-byte properties")
        b = props[0]
        filt = {
            "id": lzma.FILTER_LZMA1,
            "lc": b % 9,
            "lp": (b // 9) % 5,
            "pb": b // 45,
            "dict_size": int.from_bytes(props[1:5], "little"),
        }
        dec = lzma.LZMADecompressor(
            format=lzma.FORMAT_RAW, filters=chain + [filt]
        )
        out = dec.decompress(packed, max_length=size + 1)
    elif cid == CODEC_LZMA2:
        if len(props) < 1:
            raise ValueError("LZMA2 coder without properties")
        b = props[0]
        dict_size = 0xFFFFFFFF if b >= 40 else (2 | (b & 1)) << (b // 2 + 11)
        dec = lzma.LZMADecompressor(
            format=lzma.FORMAT_RAW,
            filters=chain + [{"id": lzma.FILTER_LZMA2, "dict_size": dict_size}],
        )
        out = dec.decompress(packed, max_length=size + 1)
    elif cid == CODEC_BZIP2:
        out = bz2.BZ2Decompressor().decompress(packed, max_length=size + 1)
    elif cid == CODEC_DEFLATE:
        out = zlib.decompressobj(-15).decompress(packed, size + 1)
    else:
        raise NotImplementedError(
            f"7z codec id {cid.hex()} is outside the bounded stdlib "
            "reader (supported: Copy/LZMA/LZMA2/BZip2/Deflate); "
            "decompress out-of-band"
        )
    if len(out) != size:
        raise ValueError(
            f"7z stream decompressed to {len(out)} bytes, header says {size}"
        )
    return out


def _decompress_bcj2(folder: _Folder, packs: list[bytes]) -> bytes:
    """Decode a BCJ2 folder: resolve each of the mixer's four inputs
    (main/call/jump/control) to either a directly-packed stream or the
    output of a depth-1 simple coder, then recombine via
    :func:`demy_spark.bcj2.bcj2_decode`. Deeper coder graphs stay loud."""
    from demy_spark.bcj2 import bcj2_decode

    coders = folder.coders
    # global stream numbering: in/out streams are indexed across coders
    # in declaration order (7zFormat.txt)
    in_base, out_base = [], []
    ti = to = 0
    for _, _, nin, nout in coders:
        in_base.append(ti)
        out_base.append(to)
        ti += nin
        to += nout
    pack_by_in = {g: packs[k] for k, g in enumerate(folder.packed_indices)}
    bind_by_in = dict(folder.bind_pairs)
    bcj2_ci = next(
        i for i, (cid, _, _, _) in enumerate(coders) if cid == CODEC_BCJ2
    )

    def resolve(gin: int) -> bytes:
        if gin in pack_by_in:
            return pack_by_in[gin]
        out_idx = bind_by_in[gin]
        ci = out_base.index(out_idx)  # every supported coder is 1-out
        cid, props, nin, _ = coders[ci]
        if ci == bcj2_ci or nin != 1:
            raise NotImplementedError(
                "7z BCJ2 folder with a nested multi-stream coder"
            )
        gin2 = in_base[ci]
        if gin2 not in pack_by_in:
            raise NotImplementedError(
                "7z BCJ2 folder with a coder chain deeper than one"
            )
        return _decode_stream(
            cid, props, [], pack_by_in[gin2], folder.unpack_sizes[out_idx]
        )

    base = in_base[bcj2_ci]
    main, call, jump, rc = (resolve(base + k) for k in range(4))
    out = bcj2_decode(
        main, call, jump, rc, folder.unpack_sizes[out_base[bcj2_ci]]
    )
    if len(call) % 4 or len(jump) % 4:
        raise ValueError("7z BCJ2 call/jump stream length not a multiple of 4")
    return out


@dataclass
class _StreamsInfo:
    pack_pos: int = 0
    pack_sizes: list[int] = field(default_factory=list)
    folders: list[_Folder] = field(default_factory=list)


def _read_streams_info(r: _Reader) -> _StreamsInfo:
    si = _StreamsInfo()
    while True:
        t = r.number()
        if t == K_END:
            return si
        if t == K_PACK_INFO:
            si.pack_pos = r.number()
            num_pack = r.number()
            while True:
                t2 = r.number()
                if t2 == K_END:
                    break
                if t2 == K_SIZE:
                    si.pack_sizes = [r.number() for _ in range(num_pack)]
                elif t2 == K_CRC:
                    defined = r.all_or_bits(num_pack)
                    r.bytes(4 * sum(defined))
                else:
                    raise ValueError(f"unexpected id {t2:#x} in PackInfo")
        elif t == K_UNPACK_INFO:
            if r.number() != K_FOLDER:
                raise ValueError("UnpackInfo without Folder block")
            num_folders = r.number()
            if r.byte() != 0:
                raise NotImplementedError("external (out-of-band) folder info")
            si.folders = [_read_folder(r) for _ in range(num_folders)]
            if r.number() != K_CODERS_UNPACK_SIZE:
                raise ValueError("UnpackInfo without CodersUnpackSize")
            for f in si.folders:
                # one size per OUT-stream; the folder's size is the
                # final (unbound) stream's — equal for the supported
                # length-preserving filters, but indexed correctly
                f.unpack_sizes = [r.number() for _ in range(f.num_out_streams)]
            while True:
                t2 = r.number()
                if t2 == K_END:
                    break
                if t2 == K_CRC:
                    # FOLDER-level digests (whole decompressed folder)
                    # — distinct from SubStreamsInfo's per-substream
                    # digests; conflating them truncates solid-archive
                    # extraction (r8 review)
                    defined = r.all_or_bits(num_folders)
                    for f, d in zip(si.folders, defined):
                        f.folder_crc = (
                            int.from_bytes(r.bytes(4), "little") if d else None
                        )
                else:
                    raise ValueError(f"unexpected id {t2:#x} in UnpackInfo")
        elif t == K_SUBSTREAMS_INFO:
            _read_substreams_info(r, si)
        else:
            raise NotImplementedError(
                f"7z StreamsInfo block {t:#x} (additional/external streams) "
                "is outside the bounded stdlib reader"
            )


def _read_substreams_info(r: _Reader, si: _StreamsInfo) -> None:
    folders = si.folders
    have_counts = False
    while True:
        t = r.number()
        if t == K_END:
            break
        if t == K_NUM_UNPACK_STREAM:
            have_counts = True
            for f in folders:
                f.num_substreams = r.number()
        elif t == K_SIZE:
            for f in folders:
                if f.num_substreams == 0:
                    f.substream_sizes = []
                    continue
                sizes = [r.number() for _ in range(f.num_substreams - 1)]
                sizes.append(f.unpack_size - sum(sizes))
                if sizes[-1] < 0:
                    raise ValueError("substream sizes exceed folder size")
                f.substream_sizes = sizes
        elif t == K_CRC:
            # digests only for streams whose CRC is not already known
            # at folder level (a 1-substream folder with a folder CRC
            # inherits it, per 7zFormat.txt)
            need = [
                0
                if f.num_substreams == 1 and f.folder_crc is not None
                else f.num_substreams
                for f in folders
            ]
            defined = r.all_or_bits(sum(need))
            vals = iter(
                int.from_bytes(r.bytes(4), "little") if d else None
                for d in defined
            )
            for f, n in zip(folders, need):
                if n:
                    f.substream_crcs = [next(vals) for _ in range(n)]
                elif f.num_substreams == 1:
                    f.substream_crcs = [f.folder_crc]
        else:
            raise ValueError(f"unexpected id {t:#x} in SubStreamsInfo")
    if have_counts:
        for f in folders:
            if f.substream_sizes is None:
                if f.num_substreams == 1:
                    f.substream_sizes = [f.unpack_size]
                elif f.num_substreams == 0:
                    f.substream_sizes = []
                else:
                    raise ValueError("multi-substream folder without sizes")


@dataclass
class _FilesInfo:
    names: list[str] = field(default_factory=list)
    empty_stream: list[bool] = field(default_factory=list)
    empty_file: list[bool] = field(default_factory=list)


def _read_files_info(r: _Reader) -> _FilesInfo:
    fi = _FilesInfo()
    num_files = r.number()
    fi.empty_stream = [False] * num_files
    while True:
        t = r.number()
        if t == K_END:
            break
        size = r.number()
        block = _Reader(r.bytes(size))
        if t == K_EMPTY_STREAM:
            fi.empty_stream = block.bit_vector(num_files)
        elif t == K_EMPTY_FILE:
            fi.empty_file = block.bit_vector(sum(fi.empty_stream))
        elif t == K_NAME:
            if block.byte() != 0:
                raise NotImplementedError("external 7z name table")
            raw = block.bytes(size - 1).decode("utf-16-le")
            fi.names = raw.split("\x00")[:-1]
        # kMTime/kCTime/kATime/kWinAttributes/kDummy: skipped via size
    if len(fi.names) != num_files:
        raise ValueError(
            f"7z FilesInfo: {num_files} files but {len(fi.names)} names"
        )
    if not fi.empty_file:
        fi.empty_file = [False] * sum(fi.empty_stream)
    return fi


def _default_unpack_cap(body_len: int) -> int:
    """Decompression-bomb ceiling (ADVICE r8): unpack sizes come from
    the UNTRUSTED header, and LZMA reaches 1000:1+ ratios — a tiny
    hostile .7z fetched by the crawler could otherwise declare a
    multi-GB unpack_size and have it materialized in memory. The
    default allows 1000x the fetched body with a 64 MiB floor (so a
    small archive of a legitimately sparse file still opens); callers
    with bigger expectations pass ``max_unpack_bytes`` explicitly."""
    return max(64 << 20, 1000 * body_len)


def read_7z(
    body: bytes, *, max_unpack_bytes: int | None = None
) -> list[tuple[str, bytes]]:
    """Parse a 7z archive and return ``(member_name, content)`` for
    every FILE member (directories are dropped, empty files yield
    ``b""``), in archive order. Substream CRCs are verified when the
    header carries them. Declared unpack sizes above
    ``max_unpack_bytes`` (default: :func:`_default_unpack_cap`) raise
    ``ValueError`` BEFORE any decompression happens."""
    cap = (
        _default_unpack_cap(len(body))
        if max_unpack_bytes is None
        else max_unpack_bytes
    )

    def check_cap(total: int, what: str) -> None:
        if total > cap:
            raise ValueError(
                f"7z {what} declares {total} unpacked bytes, over the "
                f"{cap}-byte cap for a {len(body)}-byte archive "
                "(decompression-bomb guard; raise max_unpack_bytes to "
                "override)"
            )

    if len(body) < 32 or body[:6] != SIGNATURE:
        raise ValueError("not a 7z archive (bad signature)")
    if zlib.crc32(body[12:32]) != int.from_bytes(body[8:12], "little"):
        raise ValueError("7z signature header CRC mismatch")
    next_off = int.from_bytes(body[12:20], "little")
    next_size = int.from_bytes(body[20:28], "little")
    next_crc = int.from_bytes(body[28:32], "little")
    header = body[32 + next_off : 32 + next_off + next_size]
    if len(header) != next_size:
        raise ValueError("truncated 7z end header")
    if zlib.crc32(header) != next_crc:
        raise ValueError("7z end header CRC mismatch")
    if not header:
        return []

    r = _Reader(header)
    t = r.number()
    if t == K_ENCODED_HEADER:
        si = _read_streams_info(r)
        packed = _pack_slices(body, si)
        if len(si.folders) != 1:
            raise NotImplementedError("multi-folder 7z encoded header")
        check_cap(si.folders[0].materialized_size, "encoded header")
        r = _Reader(_decompress(si.folders[0], packed[0]))
        t = r.number()
    if t != K_HEADER:
        raise ValueError(f"unexpected 7z top-level id {t:#x}")

    si = _StreamsInfo()
    fi = _FilesInfo()
    while True:
        t = r.number()
        if t == K_END:
            break
        if t == K_MAIN_STREAMS:
            si = _read_streams_info(r)
        elif t == K_FILES_INFO:
            fi = _read_files_info(r)
        elif t == K_ARCHIVE_PROPERTIES:
            while (t2 := r.number()) != K_END:
                r.bytes(r.number())
        else:
            raise NotImplementedError(
                f"7z header block {t:#x} (additional streams) is outside "
                "the bounded stdlib reader"
            )

    # decompress folders and slice substreams, archive order
    check_cap(sum(f.materialized_size for f in si.folders), "streams info")
    contents: list[bytes] = []
    for folder, packed in zip(si.folders, _pack_slices(body, si)):
        out = _decompress(folder, packed)
        if folder.folder_crc is not None and zlib.crc32(out) != folder.folder_crc:
            raise ValueError("7z folder CRC mismatch")
        sizes = (
            folder.substream_sizes
            if folder.substream_sizes is not None
            else [folder.unpack_size]
        )
        crcs = folder.substream_crcs
        if crcs is None:
            # a 1-substream folder's digest may live at folder level
            crcs = [folder.folder_crc] if len(sizes) == 1 else [None] * len(sizes)
        if len(crcs) != len(sizes):
            raise ValueError(
                f"7z substream digest count {len(crcs)} != {len(sizes)} sizes"
            )
        pos = 0
        for sub_size, crc in zip(sizes, crcs):
            piece = out[pos : pos + sub_size]
            pos += sub_size
            if crc is not None and zlib.crc32(piece) != crc:
                raise ValueError("7z substream CRC mismatch")
            contents.append(piece)

    if sum(not e for e in fi.empty_stream) != len(contents):
        raise ValueError(
            f"7z header mismatch: {sum(not e for e in fi.empty_stream)} "
            f"file entries with streams but {len(contents)} substreams"
        )
    out_members: list[tuple[str, bytes]] = []
    stream_it = iter(contents)
    empty_it = iter(fi.empty_file)
    for name, is_empty in zip(fi.names, fi.empty_stream):
        if not is_empty:
            out_members.append((name, next(stream_it)))
        elif next(empty_it):
            out_members.append((name, b""))
        # else: directory entry — dropped like the tar/zip branches
    return out_members


def _pack_slices(body: bytes, si: _StreamsInfo) -> list[list[bytes]]:
    """Cut each folder's packed streams out of the archive body.
    Folders consume pack streams in order; single-coder and chain
    folders take one each, a BCJ2 folder takes four."""
    if len(si.pack_sizes) != sum(f.num_pack_streams for f in si.folders):
        raise ValueError(
            f"7z pack-stream count {len(si.pack_sizes)} does not match "
            "the folders' declared input streams"
        )
    slices: list[list[bytes]] = []
    pos = 32 + si.pack_pos
    it = iter(si.pack_sizes)
    for f in si.folders:
        per_folder = []
        for _ in range(f.num_pack_streams):
            size = next(it)
            if pos + size > len(body):
                raise ValueError("7z packed stream runs past end of archive")
            per_folder.append(body[pos : pos + size])
            pos += size
        slices.append(per_folder)
    return slices
