"""Regenerate the crawl-site BCJ2 + xz fixtures: packs/prog.7z plus the
plain expected-member copies under private/expected_7z/ that q145's
oracle reads (private/ is robots-disallowed, so the crawler never
sees them). Deterministic — rerunning produces identical bytes.

The archive is a genuine 4-stream BCJ2 folder (LZMA2 sub-coders for
main/call/jump, range-coded control stream packed directly) built by
demy_spark.bcj2 + the same spec-following header writer the 7z tests
use, so the crawler exercises the full BCJ2 decode path under CRC.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from test_sevenzip import make_bcj2_7z  # noqa: E402  (in-test 7z writer)

SITE = os.path.join(REPO, "demy_spark", "fixtures", "crawl_site")


def x86ish(n_sites: int) -> bytes:
    """Deterministic x86-looking bytes: prologue + E8/E9/Jcc sites with
    varied rel32 fields, so all three BCJ2 branch classes convert."""
    out = bytearray(b"\x55\x89\xe5")
    for i in range(n_sites):
        out += b"\x90" * (i % 5)
        kind = i % 3
        rel = ((i * 2654435761) ^ (i << 7)) & 0xFFFFFFFF
        if kind == 0:
            out += b"\xe8" + rel.to_bytes(4, "little")
        elif kind == 1:
            out += b"\xe9" + rel.to_bytes(4, "little")
        else:
            out += bytes([0x0F, 0x80 + (i % 16)]) + rel.to_bytes(4, "little")
        out += b"\xc3"
    return bytes(out)


def gen_xz_fixtures() -> None:
    """The r10 xz-branch fixtures: a single-file .xz and a two-member
    .tar.xz (tar mtimes zeroed; lzma.compress is deterministic at a
    fixed preset, so regeneration is byte-identical)."""
    import io
    import lzma
    import tarfile

    packs = os.path.join(SITE, "packs")
    notes = b"xz-compressed field notes for the crawler oracle (q145).\n" * 12
    with open(os.path.join(packs, "notes.txt.xz"), "wb") as f:
        f.write(lzma.compress(notes, preset=6))
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in [
            ("duo/first.csv", b"k;v\n1;aa\n2;bb\n" * 25),
            ("second.txt", b"second member of the tar.xz fixture\n" * 9),
        ]:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(data))
    with open(os.path.join(packs, "duo.tar.xz"), "wb") as f:
        f.write(lzma.compress(buf.getvalue(), preset=6))


def gen_zst_fixtures() -> None:
    """The r11 zstd-branch fixtures (pyarrow's bundled codec at a
    pinned level, so regeneration stays deterministic within this
    container): a single-file .zst and a two-member .tar.zst."""
    import io
    import tarfile

    import pyarrow as pa

    def zc(b: bytes) -> bytes:
        out = pa.Codec("zstd", compression_level=3).compress(b)
        return out.to_pybytes() if hasattr(out, "to_pybytes") else bytes(out)

    packs = os.path.join(SITE, "packs")
    report = b"zstd-compressed crawl report for the oracle (q145).\n" * 14
    with open(os.path.join(packs, "report.txt.zst"), "wb") as f:
        f.write(zc(report))
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in [
            ("trio/alpha.csv", b"k;v\n7;gg\n8;hh\n" * 21),
            ("trio/beta.txt", b"second member of the tar.zst fixture\n" * 11),
        ]:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(data))
    with open(os.path.join(packs, "trio.tar.zst"), "wb") as f:
        f.write(zc(buf.getvalue()))


def main() -> None:
    members = [
        ("tool.exe", x86ish(300)),
        (
            "docs/readme.txt",
            b"BCJ2 fixture archive for the crawler oracle (q145).\n"
            b"Members are value-verified against private/expected_7z/.\n",
        ),
    ]
    body = make_bcj2_7z(members, bcj2_first=False)
    with open(os.path.join(SITE, "packs", "prog.7z"), "wb") as f:
        f.write(body)
    exp = os.path.join(SITE, "private", "expected_7z")
    os.makedirs(exp, exist_ok=True)
    for name, content in members:
        with open(os.path.join(exp, name.replace("/", "-")), "wb") as f:
            f.write(content)
    gen_xz_fixtures()
    gen_zst_fixtures()
    print(f"wrote packs/prog.7z ({len(body)} bytes) + {len(members)} expected "
          "+ notes.txt.xz + duo.tar.xz + report.txt.zst + trio.tar.zst")


if __name__ == "__main__":
    main()
