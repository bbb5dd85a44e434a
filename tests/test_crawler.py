"""Web ingestion utility (crawler.py — the reference's net2demy
module re-expressed driver-side with an injectable fetcher): BFS
semantics, cache policies, in-flight decompression, post steps and
the Structured-Streaming spool handoff, all against an in-memory
fake site — zero network."""

from __future__ import annotations

import bz2
import gzip
import io
import json
import os
import zipfile

import pytest

from demy_spark.crawler import (
    CrawlConfig,
    crawl_links,
    download,
    extract_links,
    remote_footprint,
    spool_write,
    sync_source,
)


def _site(pages: dict[str, tuple[str, bytes]]):
    def fetch(url: str):
        if url not in pages:
            raise OSError(f"404 {url}")
        return pages[url]

    return fetch


HTML = "text/html; charset=utf-8"


def test_extract_links_absolutizes():
    html = '<p><a href="/a/b.zip">x</a><a href="c.html">y</a><a name="no"></a></p>'
    got = extract_links("http://s.example/dir/page.html", html)
    assert got == ["http://s.example/a/b.zip", "http://s.example/dir/c.html"]


def test_crawl_links_bfs_filters_and_dead_links():
    pages = {
        "http://s/start": (HTML, b'<a href="/page2"></a><a href="/data/a.csv"></a>'
                                 b'<a href="http://other/x"></a>'),
        "http://s/page2": (HTML, b'<a href="/data/b.csv"></a><a href="/dead"></a>'
                                 b'<a href="/binary"></a>'),
        "http://s/binary": ("application/octet-stream", b"\x00"),  # not parsed
        # /dead 404s; /data/*.csv 404 too (never fetched: matching only)
    }
    got = crawl_links(
        "http://s/start",
        follow=r"^http://s/",
        matching=r"\.csv$",
        fetch=_site(pages),
    )
    assert got == {"http://s/data/a.csv", "http://s/data/b.csv"}


def test_crawl_links_max_pages_bound():
    # every page links to a fresh one — unbounded without the guard
    def fetch(url):
        n = int(url.rsplit("/", 1)[-1])
        return HTML, f'<a href="/{n + 1}"></a>'.encode()

    got = crawl_links(
        "http://s/0", follow=".*", matching=r"never", fetch=fetch, max_pages=7
    )
    assert got == set()  # terminates


def test_download_zip_gz_bz2_and_7z_guard(tmp_path):
    payload = b"col\n1\n2\n"
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as zf:
        zf.writestr("sub/dir/a.csv", payload)
        zf.writestr("b.csv", b"col\n3\n")
    pages = {
        "http://s/x.zip": ("application/zip", zbuf.getvalue()),
        "http://s/y.csv.gz": ("application/gzip", gzip.compress(payload)),
        "http://s/z.csv.bz2": ("application/x-bzip2", bz2.compress(payload)),
        "http://s/plain.csv": ("text/csv", payload),
    }
    f = _site(pages)
    zdir = str(tmp_path / "zdir")
    got = sorted(download("http://s/x.zip", zdir, fetch=f))
    # entry names flatten / -> - like the reference
    assert [os.path.basename(p) for p in got] == ["b.csv", "sub-dir-a.csv"]
    assert open(os.path.join(zdir, "sub-dir-a.csv"), "rb").read() == payload
    for url, name in (("http://s/y.csv.gz", "y"), ("http://s/z.csv.bz2", "z")):
        dest = str(tmp_path / name)
        assert download(url, dest, fetch=f) == [dest]
        assert open(dest, "rb").read() == payload
    dest = str(tmp_path / "p.csv")
    download("http://s/plain.csv", dest, fetch=f)
    assert open(dest, "rb").read() == payload
    # a .7z URL now routes through the bounded reader, which rejects
    # a non-7z body loudly (full extraction surface: test_sevenzip.py)
    with pytest.raises(ValueError, match="bad signature"):
        download("http://s/a.7z", str(tmp_path / "a"), fetch=_site({"http://s/a.7z": ("x", b"")}))


def test_head_check_policy_downloads_only_on_change(tmp_path, spark):
    body = [b"v1"]
    headers = [{"ETag": '"abc"', "Content-Length": "2"}]
    calls = {"get": 0}

    def fetch(url):
        calls["get"] += 1
        return "text/plain", body[0]

    def head(url):
        return headers[0]

    cfg = CrawlConfig(
        name="t", href="http://s/f.txt", dest=str(tmp_path / "f.txt"),
        type="direct-download", policy="head-check",
    )
    assert sync_source(spark, cfg, fetch=fetch, head=head) == [cfg.dest]
    assert open(cfg.dest, "rb").read() == b"v1"
    # unchanged footprint -> skip
    assert sync_source(spark, cfg, fetch=fetch, head=head) == []
    assert calls["get"] == 1
    # changed footprint -> re-download
    body[0], headers[0] = b"v2", {"ETag": '"def"', "Content-Length": "2"}
    assert sync_source(spark, cfg, fetch=fetch, head=head) == [cfg.dest]
    assert open(cfg.dest, "rb").read() == b"v2"


def test_immutable_policy_skips_existing(tmp_path, spark):
    calls = {"get": 0}

    def fetch(url):
        calls["get"] += 1
        return "text/plain", b"x"

    cfg = CrawlConfig(
        name="t", href="http://s/f", dest=str(tmp_path / "f"),
        type="direct-download", policy="immutable",
    )
    assert sync_source(spark, cfg, fetch=fetch) == [cfg.dest]
    assert sync_source(spark, cfg, fetch=fetch) == []
    assert calls["get"] == 1


def test_remote_footprint_shapes():
    assert remote_footprint("u", head=lambda u: {"ETag": "x", "Other": "y"}) == (
        json.dumps({"ETag": "x"}, sort_keys=True)
    )
    assert remote_footprint("u", head=lambda u: {}) == "Not Found"
    def boom(u):
        raise OSError("down")
    assert remote_footprint("u", head=boom) == "Not Found"


def test_crawl_sync_post_csv2parquet_and_stream_handoff(tmp_path, spark):
    """End-to-end: crawl -> spool downloads -> csv2parquet post; the
    spool is then read back BOTH as a batch frame and as the
    Structured-Streaming file source the handoff exists for."""
    csv_a = b"k;v\n1;one\n2;two\n"
    csv_b = b"k;v\n3;three\n"
    pages = {
        "http://s/idx": (HTML, b'<a href="/d/a.csv"></a><a href="/d/b.csv"></a>'
                               b'<a href="/other.bin"></a>'),
        "http://s/d/a.csv": ("text/csv", csv_a),
        "http://s/d/b.csv": ("text/csv", csv_b),
    }
    dest = str(tmp_path / "crawl")
    cfg = CrawlConfig(
        name="t", href="http://s/idx", dest=dest,
        crawling_filter=r"^http://s/", crawling_matching=r"\.csv$",
        post="csv2parquet",
    )
    written = sync_source(spark, cfg, fetch=_site(pages))
    # prefix-relative mapping: /d/a.csv lands as d-a.csv-<urlhash>
    # (structure kept, flattened like archive members, hash-suffixed
    # because flattening rewrote the path — a pure per-URL name)
    names = sorted(os.path.basename(p) for p in written)
    assert [n.rsplit("-", 1)[0] for n in names] == ["d-a.csv", "d-b.csv"]
    assert all(len(n.rsplit("-", 1)[1]) == 8 for n in names)
    batch = spark.read.parquet(f"{dest}.parquet")
    assert batch.count() == 3

    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{dest}.parquet")
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("crawl_handoff")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert spark.sql("SELECT count(*) c FROM crawl_handoff").first()["c"] == 3


def test_post_exclude_lines_and_json2parquet(tmp_path, spark):
    cfg_json = CrawlConfig(
        name="j", href="http://s/j.json", dest=str(tmp_path / "j.json"),
        type="direct-download", post="json2parquet",
    )
    rows = b'{"a": 1}\n{"a": 2}\n'
    sync_source(spark, cfg_json, fetch=_site({"http://s/j.json": ("application/json", rows)}))
    assert spark.read.parquet(f"{cfg_json.dest}.parquet").count() == 2

    cfg_x = CrawlConfig(
        name="x", href="http://s/t.txt", dest=str(tmp_path / "t.txt"),
        type="direct-download", post="excludeLines:#.*",
    )
    sync_source(
        spark, cfg_x,
        fetch=_site({"http://s/t.txt": ("text/plain", b"# header\ndata1\n# note\ndata2\n")}),
    )
    assert open(cfg_x.dest).read() == "data1\ndata2\n"

    with pytest.raises(ValueError):
        sync_source(
            spark,
            CrawlConfig(name="b", href="http://s/t.txt", dest=str(tmp_path / "u"),
                        type="direct-download", post="nope"),
            fetch=_site({"http://s/t.txt": ("text/plain", b"x")}),
        )


def test_config_from_json_reference_keys():
    cfg = CrawlConfig.from_json(
        {
            "name": "n", "href": "http://s/", "dest": "/tmp/d", "type": "crawl",
            "active": 1, "policy": "head-check", "post": "json2parquet",
            "crawling-filter": "f", "crawling-matching": "m",
            "crawling-contentType": "text/html", "crawling-deflate": "false",
            "check": "weekly",
        }
    )
    assert cfg.crawling_filter == "f" and cfg.crawling_matching == "m"
    assert cfg.crawling_deflate is False and cfg.active
    assert cfg.extra == {"check": "weekly"}


def test_inactive_config_is_noop(tmp_path, spark):
    cfg = CrawlConfig(
        name="t", href="http://s/f", dest=str(tmp_path / "f"),
        type="direct-download", active=False,
    )
    def fetch(url):
        raise AssertionError("must not fetch")
    assert sync_source(spark, cfg, fetch=fetch) == []


def test_spool_write_is_atomic(tmp_path):
    p = str(tmp_path / "spool" / "f.bin")
    spool_write(p, b"abc")
    assert open(p, "rb").read() == b"abc"
    assert not os.path.exists(p + ".__tmp__")


def test_crawl_respects_robots_txt():
    """robots.txt politeness (on by default): disallowed paths are
    neither fetched, followed, nor returned in the download set; an
    origin without robots.txt is allow-all; respect_robots=False
    restores the reference's behavior."""
    fetched: list[str] = []
    pages = {
        "http://s/robots.txt": ("text/plain", b"User-agent: *\nDisallow: /private\n"),
        "http://s/start": (HTML, b'<a href="/private/idx"></a><a href="/pub/a.csv"></a>'
                                 b'<a href="/private/b.csv"></a>'),
        "http://s/private/idx": (HTML, b'<a href="/pub/hidden.csv"></a>'),
    }

    def fetch(url):
        fetched.append(url)
        if url not in pages:
            raise OSError("404")
        return pages[url]

    got = crawl_links(
        "http://s/start", follow=r"^http://s/", matching=r"\.csv$", fetch=fetch
    )
    assert got == {"http://s/pub/a.csv"}
    assert "http://s/private/idx" not in fetched  # never fetched
    assert "http://s/robots.txt" in fetched  # consulted once

    got_rude = crawl_links(
        "http://s/start", follow=r"^http://s/", matching=r"\.csv$",
        fetch=fetch, respect_robots=False,
    )
    assert got_rude == {
        "http://s/pub/a.csv", "http://s/private/b.csv", "http://s/pub/hidden.csv",
    }


def _tarball(members: dict[str, bytes], compress: str | None = None) -> bytes:
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        d = tarfile.TarInfo("only-dirs/")
        d.type = tarfile.DIRTYPE
        tf.addfile(d, None)
        for name, data in members.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    raw = buf.getvalue()
    if compress == "gz":
        return gzip.compress(raw)
    if compress == "bz2":
        return bz2.compress(raw)
    return raw


def test_download_tar_members_extracted(tmp_path):
    """Tar archives extract per-member (reference Execute.scala:111
    matches .tar/.tar.gz/.bz2 via commons-compress) — not as a single
    .tar blob — for plain, gz, tgz and bz2 framings, with nested and
    ../-prefixed names flattened into the spool."""
    members = {
        "sub/dir/a.csv": b"col\n1\n",
        "./b.csv": b"col\n2\n",
        "../evil.txt": b"nope",
    }
    cases = {
        "http://s/t.tar": _tarball(members),
        "http://s/t.tar.gz": _tarball(members, "gz"),
        "http://s/t.tgz": _tarball(members, "gz"),
        "http://s/t.tar.bz2": _tarball(members, "bz2"),
    }
    f = _site({u: ("application/x-tar", b) for u, b in cases.items()})
    for i, url in enumerate(cases):
        dest = str(tmp_path / f"t{i}")
        got = sorted(download(url, dest, fetch=f))
        assert [os.path.basename(p) for p in got] == [
            "..-evil.txt", "b.csv", "sub-dir-a.csv"
        ]
        assert open(os.path.join(dest, "sub-dir-a.csv"), "rb").read() == b"col\n1\n"
        # every member escaped-proof inside dest, atomically spooled
        for p in got:
            assert os.path.dirname(p) == dest
        assert not [n for n in os.listdir(dest) if n.endswith(".__tmp__")]


def test_sync_source_crawled_tarball_spools_members(tmp_path, spark):
    """End-to-end crawl of a site serving a tarball: per-member spool
    files land atomically under dest (VERDICT r6 task 2)."""
    tar = _tarball({"year/data.csv": b"k;v\n1;x\n", "readme.txt": b"hi"}, "gz")
    pages = {
        "http://s/idx": (HTML, b'<a href="/files/drop.tar.gz"></a>'),
        "http://s/files/drop.tar.gz": ("application/gzip", tar),
    }
    dest = str(tmp_path / "spool")
    cfg = CrawlConfig(
        name="t", href="http://s/idx", dest=dest,
        crawling_filter=r"^http://s/", crawling_matching=r"\.tar\.gz$",
    )
    written = sync_source(spark, cfg, fetch=_site(pages))
    # the tarball URL maps to dest/files-drop.tar.gz-<urlhash>, which
    # download() treats as the member directory
    assert sorted(os.path.basename(p) for p in written) == [
        "readme.txt", "year-data.csv"
    ]
    from demy_spark.crawler import _crawl_dest

    mdir = _crawl_dest("http://s/files/drop.tar.gz", cfg.href, dest)
    assert open(os.path.join(mdir, "year-data.csv"), "rb").read() == b"k;v\n1;x\n"
    assert not [n for n in os.listdir(mdir) if n.endswith(".__tmp__")]
    # immutable policy: second run re-downloads nothing
    assert sync_source(spark, cfg, fetch=_site(pages)) == []


def test_sync_source_basename_collisions_disambiguated(tmp_path, spark):
    """Two crawled URLs ending in the same filename must map to two
    dest files (ADVICE r6: basename mapping silently collided), and a
    URL's dest must be STABLE whatever else the crawl finds (code-
    review r7: a set-dependent rename orphaned the previous run's
    file and double-ingested its content)."""
    pages = {
        "http://s/idx": (HTML, b'<a href="/2024/data.csv"></a>'
                               b'<a href="/2025/data.csv"></a>'),
        "http://s/2024/data.csv": ("text/csv", b"y2024"),
        "http://s/2025/data.csv": ("text/csv", b"y2025"),
    }
    dest = str(tmp_path / "spool")
    cfg = CrawlConfig(
        name="t", href="http://s/idx", dest=dest,
        crawling_filter=r"^http://s/", crawling_matching=r"\.csv$",
    )
    written = sorted(sync_source(spark, cfg, fetch=_site(pages)))
    names = [os.path.basename(p) for p in written]
    assert len(set(names)) == 2
    assert [n.rsplit("-", 1)[0] for n in names] == [
        "2024-data.csv", "2025-data.csv"
    ]
    assert open(written[0], "rb").read() == b"y2024"
    assert open(written[1], "rb").read() == b"y2025"
    # stability: crawling 2024 ALONE maps to the same dest as above
    solo = {
        "http://s/idx": (HTML, b'<a href="/2024/data.csv"></a>'),
        "http://s/2024/data.csv": ("text/csv", b"y2024"),
    }
    dest2 = str(tmp_path / "spool2")
    cfg2 = CrawlConfig(
        name="t", href="http://s/idx", dest=dest2,
        crawling_filter=r"^http://s/", crawling_matching=r"\.csv$",
    )
    solo_written = sync_source(spark, cfg2, fetch=_site(solo))
    assert [os.path.basename(p) for p in solo_written] == [names[0]]
    # flatten-alias: a literal 'a-b.csv' and a nested 'a/b.csv' get
    # DIFFERENT names by construction (nested carries the url hash)
    from demy_spark.crawler import _crawl_dest

    flat = _crawl_dest("http://s/a-b.csv", "http://s/idx", dest)
    nested = _crawl_dest("http://s/a/b.csv", "http://s/idx", dest)
    assert flat != nested and os.path.basename(flat) == "a-b.csv"


def test_sync_source_out_of_prefix_url_hash_suffixed(tmp_path, spark):
    """A followed link OUTSIDE the href's directory keeps its basename
    plus a short url hash — stable per URL, collision-free."""
    from demy_spark.crawler import _crawl_dest

    d = _crawl_dest("http://other.example/pub/data.csv", "http://s/idx", "/tmp/x")
    assert os.path.dirname(d) == "/tmp/x"
    assert os.path.basename(d).startswith("data.csv-")
    # deterministic
    assert d == _crawl_dest("http://other.example/pub/data.csv", "http://s/idx", "/tmp/x")
    # two same-basename foreign URLs diverge
    d2 = _crawl_dest("http://elsewhere/pub/data.csv", "http://s/idx", "/tmp/x")
    assert d2 != d


def test_crawl_dest_trailing_slash_twin_disambiguated():
    """'http://s/a' and 'http://s/a/' must NOT map to the same dest
    (ADVICE r7: the bare name carried no hash after rstrip, so
    sync_source's collision check aborted the whole sync). The name
    stays a pure function of the RAW url."""
    from demy_spark.crawler import _crawl_dest

    plain = _crawl_dest("http://s/idx/a", "http://s/idx/", "/tmp/x")
    slashed = _crawl_dest("http://s/idx/a/", "http://s/idx/", "/tmp/x")
    assert plain != slashed
    assert plain.endswith("/a")  # un-stripped bare name keeps its plain form
    # stable across calls (pure function of the url)
    assert slashed == _crawl_dest("http://s/idx/a/", "http://s/idx/", "/tmp/x")


def test_archive_flatten_collision_raises(tmp_path):
    """Two members of ONE archive whose names flatten to the same
    spool name ('a/b.csv' vs 'a-b.csv') must raise loudly instead of
    silently overwriting (ADVICE r7) — zip and tar branches both."""
    import io
    import tarfile
    import zipfile

    import pytest as _pytest

    from demy_spark.crawler import download

    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as zf:
        zf.writestr("a/b.csv", "x;1\n")
        zf.writestr("a-b.csv", "y;2\n")
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w") as tf:
        for name in ("a/b.csv", "a-b.csv"):
            data = b"z;3\n"
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))

    def fetch(url):
        return 200, (zbuf if url.endswith(".zip") else tbuf).getvalue()

    with _pytest.raises(ValueError, match="flatten"):
        download("http://s/x.zip", str(tmp_path / "z"), fetch=fetch)
    with _pytest.raises(ValueError, match="flatten"):
        download("http://s/x.tar", str(tmp_path / "t"), fetch=fetch)


# ---------------------------------------------------------------------------
# file-backed fetcher (make_file_fetch / make_file_head) — the oracle
# twin of default_fetch: serves file:// URLs and host-mapped URLs from
# a local directory, confined to the site root
# ---------------------------------------------------------------------------


FIXTURE_SITE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "demy_spark", "fixtures", "crawl_site",
)


def test_file_fetch_serves_file_urls(tmp_path):
    from demy_spark.crawler import make_file_fetch

    (tmp_path / "page.html").write_bytes(b"<html>hi</html>")
    fetch = make_file_fetch(str(tmp_path))
    ctype, body = fetch(f"file://{tmp_path}/page.html")
    assert ctype == "text/html" and body == b"<html>hi</html>"


def test_file_fetch_host_mapping_and_content_types(tmp_path):
    from demy_spark.crawler import make_file_fetch

    (tmp_path / "t.csv").write_bytes(b"a;b\n1;2\n")
    (tmp_path / "blob.bin").write_bytes(b"\x00\x01")
    fetch = make_file_fetch(str(tmp_path), "http://m.test")
    assert fetch("http://m.test/t.csv") == ("text/csv", b"a;b\n1;2\n")
    assert fetch("http://m.test/blob.bin")[0] == "application/octet-stream"
    with pytest.raises(FileNotFoundError):
        fetch("http://other.test/t.csv")  # not the configured host


def test_file_fetch_confines_to_root(tmp_path):
    """A hostile ../ link must not read outside the site root."""
    from demy_spark.crawler import make_file_fetch

    site = tmp_path / "site"
    site.mkdir()
    (site / "ok.html").write_bytes(b"ok")
    (tmp_path / "outside.txt").write_bytes(b"leak")
    fetch = make_file_fetch(str(site), "http://m.test")
    assert fetch("http://m.test/ok.html")[1] == b"ok"
    with pytest.raises(FileNotFoundError):
        fetch("http://m.test/../outside.txt")
    with pytest.raises(FileNotFoundError):
        fetch(f"file://{tmp_path}/outside.txt")  # file:// confined too


def test_file_head_footprint_is_deterministic(tmp_path):
    import hashlib

    from demy_spark.crawler import make_file_head

    (tmp_path / "d.csv").write_bytes(b"x;y\n")
    head = make_file_head(str(tmp_path), "http://m.test")
    fp = remote_footprint("http://m.test/d.csv", head=head)
    want_etag = hashlib.md5(b"x;y\n").hexdigest()
    assert json.loads(fp) == {"Content-Length": "4", "ETag": want_etag}
    assert fp == remote_footprint("http://m.test/d.csv", head=head)


def test_fixture_site_crawl_respects_robots_and_filters():
    """The q141 crawl set over the in-tree fixture site: robots.txt
    excludes /private/, the follow regex excludes offsite links, the
    start page never re-enters the frontier."""
    from demy_spark.crawler import make_file_fetch

    fetch = make_file_fetch(FIXTURE_SITE, "http://site.test")
    found = crawl_links(
        "http://site.test/index.html",
        follow=r"^http://site\.test/",
        matching=r"\.(html|csv)$",
        fetch=fetch,
    )
    assert found == {
        "http://site.test/a.html",
        "http://site.test/b.html",
        "http://site.test/sub/c.html",
        "http://site.test/data/tarifs.csv",
    }


def test_download_bomb_caps_every_archive_branch(tmp_path):
    """r9 hardening beyond the 7z ADVICE item: gzip/bz2 streams and
    zip/tar members share the decompression-bomb cap — a tiny hostile
    response cannot make the driver materialize a multi-GB payload."""
    import bz2 as _bz2
    import gzip as _gzip
    import tarfile as _tarfile
    import zipfile as _zipfile

    from demy_spark.crawler import download

    big = b"\x00" * (70 << 20)  # 70 MiB of zeros: tiny on the wire

    gz = _gzip.compress(big)
    assert len(gz) < 1 << 20
    with pytest.raises(ValueError, match="decompression-bomb"):
        download("http://m.test/x.gz", str(tmp_path / "a"),
                 fetch=lambda u: ("application/gzip", gz))

    bz = _bz2.compress(big)
    with pytest.raises(ValueError, match="decompression-bomb"):
        download("http://m.test/x.bz2", str(tmp_path / "b"),
                 fetch=lambda u: ("application/x-bzip2", bz))

    buf = io.BytesIO()
    with _zipfile.ZipFile(buf, "w", _zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("big.bin", big)
    with pytest.raises(ValueError, match="decompression-bomb"):
        download("http://m.test/x.zip", str(tmp_path / "c"),
                 fetch=lambda u: ("application/zip", buf.getvalue()))

    tbuf = io.BytesIO()
    with _tarfile.open(fileobj=tbuf, mode="w") as tf:
        info = _tarfile.TarInfo("big.bin")
        info.size = len(big)
        tf.addfile(info, io.BytesIO(big))
    # plain tar of 70 MiB zeros is 70 MiB on the wire -> gzip it so the
    # FETCHED body is small and the cap is the binding constraint
    tgz = _gzip.compress(tbuf.getvalue())
    with pytest.raises(ValueError, match="decompression-bomb"):
        download("http://m.test/x.tar.gz", str(tmp_path / "d"),
                 fetch=lambda u: ("application/gzip", tgz))

    # a LEGITIMATE small archive still extracts on every branch
    ok = io.BytesIO()
    with _zipfile.ZipFile(ok, "w") as zf:
        zf.writestr("a.txt", b"fine")
    paths = download("http://m.test/ok.zip", str(tmp_path / "e"),
                     fetch=lambda u: ("application/zip", ok.getvalue()))
    assert len(paths) == 1


def test_file_fetch_symlink_escape_is_blocked(tmp_path):
    """A symlink INSIDE the site root pointing outside it must not
    bypass the '../ cannot read outside the site' guard — the
    containment check realpaths both sides (ADVICE r9)."""
    import os

    from demy_spark.crawler import make_file_fetch

    outside = tmp_path / "outside.txt"
    outside.write_bytes(b"secret")
    root = tmp_path / "site"
    root.mkdir()
    (root / "ok.txt").write_bytes(b"fine")
    os.symlink(str(outside), str(root / "leak.txt"))
    fetch = make_file_fetch(root=str(root), host="http://site.test")
    _ctype, body = fetch("http://site.test/ok.txt")
    assert body == b"fine"
    with pytest.raises(FileNotFoundError, match="escapes the site root"):
        fetch("http://site.test/leak.txt")


def test_download_xz_variants(tmp_path):
    """r10: .xz / .lzma single files and .tar.xz/.txz member
    extraction through the in-flight deflate, incl. the bomb cap."""
    import io
    import lzma
    import tarfile

    import pytest

    from demy_spark.crawler import download

    payload = b"alpha beta gamma\n" * 200
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in [("x/one.txt", payload), ("two.txt", b"zzz")]:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))

    def fetch_for(body):
        return lambda u: ("application/octet-stream", body)

    p = download("http://m.test/doc.txt.xz", str(tmp_path / "a"),
                 fetch=fetch_for(lzma.compress(payload)))
    with open(p[0], "rb") as f:
        assert f.read() == payload
    p = download("http://m.test/doc.lzma", str(tmp_path / "b"),
                 fetch=fetch_for(lzma.compress(payload, format=lzma.FORMAT_ALONE)))
    with open(p[0], "rb") as f:
        assert f.read() == payload
    for ext in ("pair.tar.xz", "pair.txz"):
        p = download(f"http://m.test/{ext}", str(tmp_path / ext),
                     fetch=fetch_for(lzma.compress(buf.getvalue())))
        assert sorted(os.path.basename(x) for x in p) == ["two.txt", "x-one.txt"]
    bomb = lzma.compress(b"\x00" * (200 << 20))
    with pytest.raises(ValueError, match="decompression-bomb"):
        download("http://m.test/bomb.xz", str(tmp_path / "e"),
                 fetch=fetch_for(bomb))


def test_download_truncated_compressed_streams_are_loud(tmp_path):
    """ADVICE r10: a truncated or garbage-tailed compressed download
    must raise, never spool a silently partial file (the reference's
    commons-compress stream throws here)."""
    import bz2
    import gzip
    import lzma

    import pytest

    from demy_spark.crawler import download

    payload = b"the quick brown fox jumps over the lazy dog\n" * 64

    def fetch_for(body):
        return lambda u: ("application/octet-stream", body)

    cases = [
        ("doc.txt.xz", lzma.compress(payload), "truncated xz/lzma"),
        ("doc.lzma", lzma.compress(payload, format=lzma.FORMAT_ALONE),
         "truncated xz/lzma"),
        ("doc.txt.gz", gzip.compress(payload), "truncated gzip"),
        ("doc.txt.bz2", bz2.compress(payload), "truncated bzip2"),
    ]
    for name, body, msg in cases:
        with pytest.raises(ValueError, match=msg):
            download(f"http://m.test/{name}", str(tmp_path / ("t-" + name)),
                     fetch=fetch_for(body[:-6]))
    # a valid xz stream followed by trailing garbage is equally loud
    with pytest.raises(ValueError, match="trailing garbage"):
        download("http://m.test/doc.txt.xz", str(tmp_path / "tail"),
                 fetch=fetch_for(lzma.compress(payload) + b"JUNKJUNK"))
    # and nothing was spooled for any of the failures
    spooled = [p for p in tmp_path.rglob("*") if p.is_file()]
    assert spooled == []


def test_download_zstd_via_pyarrow_codec(tmp_path):
    """r11: .zst/.tar.zst downloads decompress through pyarrow's
    bundled zstd codec. Bomb gate runs on the RFC 8878 declared
    content size BEFORE decompression; the codec enforces the size
    exactly so lying headers and truncation raise; size-less
    (streaming-written) frames stay loud NotImplementedError."""
    import io
    import tarfile

    import pyarrow as pa
    import pytest

    from demy_spark.crawler import download, zstd_frame_content_size

    def zc(b):
        out = pa.Codec("zstd").compress(b)
        return out.to_pybytes() if hasattr(out, "to_pybytes") else bytes(out)

    payload = b"dolma-style document line\n" * 400
    z = zc(payload)
    assert zstd_frame_content_size(z) == len(payload)

    p = download("http://m.test/doc.txt.zst", str(tmp_path / "a"),
                 fetch=lambda u: ("application/zstd", z))
    with open(p[0], "rb") as f:
        assert f.read() == payload

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo("x/one.txt")
        info.size = len(payload)
        tf.addfile(info, io.BytesIO(payload))
    for name in ("pack.tar.zst", "pack.tzst"):
        p = download(f"http://m.test/{name}", str(tmp_path / name),
                     fetch=lambda u: ("application/zstd", zc(buf.getvalue())))
        assert [os.path.basename(x) for x in p] == ["x-one.txt"]

    with pytest.raises(ValueError, match="corrupt zstd"):
        download("http://m.test/doc.txt.zst", str(tmp_path / "t"),
                 fetch=lambda u: ("application/zstd", z[:-4]))
    # declared-size bomb: rejected from the header, nothing decompressed
    bomb = zc(b"\x00" * (200 << 20))
    with pytest.raises(ValueError, match="decompression-bomb"):
        download("http://m.test/bomb.zst", str(tmp_path / "bb"),
                 fetch=lambda u: ("application/zstd", bomb))
    # size-less frame (streaming writer): loud, never a guess
    sizeless = b"\x28\xb5\x2f\xfd\x00\x00" + b"\x01\x00\x00"
    assert zstd_frame_content_size(sizeless) is None
    with pytest.raises(NotImplementedError, match="content size"):
        download("http://m.test/doc.txt.zst", str(tmp_path / "s"),
                 fetch=lambda u: ("application/zstd", sizeless))
    # ADVICE r11: a header TRUNCATED inside the FCS field must return
    # None (size-unknown path), never a short-slice understated size
    for fcs_code, fhd, width in ((3, 0xE0, 8), (1, 0x40, 2)):
        hdr = bytes([0x28, 0xB5, 0x2F, 0xFD, fhd])
        pos = 5 if fhd & 0x20 else 6
        cut = hdr + b"\x00" * (pos - 5) + b"\xff" * (width - 1)
        assert zstd_frame_content_size(cut) is None, fcs_code
        exact = hdr + b"\x00" * (pos - 5) + b"\x40" + b"\x00" * (width - 1)
        assert zstd_frame_content_size(exact) is not None, fcs_code
