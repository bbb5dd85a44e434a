"""Web ingestion utility: config-driven BFS crawl + cached download +
post-processing to parquet, with a Structured-Streaming spool handoff.

Parity: the reference's net2demy module
(`net2demy/src/main/scala/Execute.scala:46-218`) — a DRIVER-SIDE
program by design (SURVEY §2.1 scopes it out of the engine): it walks
pages breadth-first with three regexes (follow / download / page
content-type, `Execute.scala:82-108`), downloads matches under two
cache policies (`head-check`: an ETag/Last-Modified/Content-Length
footprint compared against a ``.cache`` sidecar,
`Execute.scala:126-135,247-290`; `immutable`: skip when the
destination exists, `Execute.scala:136-144`), decompresses archives
in flight (`Execute.scala:319-459`), and post-processes downloads to
parquet (json2parquet / csv-with-`;` / excludeLines,
`Execute.scala:146-211`).

Spark-first re-expression: crawling and downloading stay on the
driver (a frontier with a visited set is inherently sequential,
network-bound, and tiny — the reference agrees), but everything
data-sized lands in a SPOOL DIRECTORY with atomic renames, which is
exactly the contract of Spark's file streaming source: downstream
pipelines attach with ``readStream`` (or batch ``read``) and the
cluster does all actual processing. The fetcher is injectable
(``fetch(url) -> (content_type, bytes)``), so tests exercise the full
BFS/policy/decompress/post surface against an in-memory site with
zero network; the default fetcher is stdlib urllib with a timeout and
a polite User-Agent. No non-stdlib dependency: link extraction is an
``html.parser`` subclass (the reference uses Jsoup), decompression is
``zipfile``/``tarfile``/``gzip``/``bz2`` — tar archives extract
per-member like the reference's commons-compress path
(`Execute.scala:111`) — plus the bounded pure-stdlib 7z reader in
:mod:`demy_spark.sevenzip` for single-coder archives and BCJ-x86 /
Delta chains over LZMA (BCJ2/PPMd/encryption still raise a loud
NotImplementedError instead of faking decompression).
"""

from __future__ import annotations

import bz2
import gzip
import io
import json
import os
import hashlib
import re
import tarfile
import zipfile
import zlib
from collections.abc import Callable, Iterable
from dataclasses import dataclass, field
from html.parser import HTMLParser
from urllib.parse import urljoin

__all__ = [
    "CrawlConfig",
    "crawl_links",
    "default_fetch",
    "default_head",
    "download",
    "extract_links",
    "make_file_fetch",
    "make_file_head",
    "remote_footprint",
    "spool_write",
    "sync_source",
]

Fetch = Callable[[str], tuple[str, bytes]]
Head = Callable[[str], dict]

_USER_AGENT = "Mozilla/5.0 (compatible; demy-spark-crawler)"


def default_fetch(url: str, *, timeout: int = 10) -> tuple[str, bytes]:
    """GET one URL via stdlib urllib: (content_type, body bytes).
    Matches the reference's Jsoup connect settings (10 s timeout,
    browser-ish agent, any content type accepted,
    `Execute.scala:94`)."""
    from urllib.request import Request, urlopen

    req = Request(url, headers={"User-Agent": _USER_AGENT})
    with urlopen(req, timeout=timeout) as resp:  # noqa: S310 (caller's URL)
        ctype = resp.headers.get("Content-Type", "") or ""
        return ctype, resp.read()


def default_head(url: str, *, timeout: int = 10) -> dict:
    """HEAD one URL: the response headers as a plain dict."""
    from urllib.request import Request, urlopen

    req = Request(url, method="HEAD", headers={"User-Agent": _USER_AGENT})
    with urlopen(req, timeout=timeout) as resp:  # noqa: S310
        return dict(resp.headers.items())


_CTYPES = {
    ".html": "text/html",
    ".htm": "text/html",
    ".txt": "text/plain",
    ".csv": "text/csv",
    ".json": "application/json",
}


def _file_fetch_path(url: str, root: str | None, host: str | None) -> str:
    """Resolve a ``file://`` URL (or an ``http://host/...`` URL served
    from a local mirror directory) to a filesystem path. The resolved
    path is CONFINED to ``root`` when one is given — a fixture link
    with ``../`` must not read outside the site."""
    from urllib.parse import urlsplit
    from urllib.request import url2pathname

    if url.startswith("file://"):
        path = url2pathname(urlsplit(url).path)
        base = root
    elif host and url.startswith(host.rstrip("/") + "/"):
        if root is None:
            raise ValueError("host-mapped file fetch needs a root directory")
        rel = urlsplit(url[len(host.rstrip("/")) + 1 :]).path
        path = os.path.join(root, rel)
        base = root
    else:
        raise FileNotFoundError(f"not a file-served URL: {url}")
    path = os.path.normpath(path)
    if base is not None:
        # realpath on BOTH sides so a symlink inside the site root
        # pointing outside it cannot bypass the containment check
        # (code-review r9)
        base = os.path.realpath(os.path.abspath(base))
        if os.path.commonpath([base, os.path.realpath(os.path.abspath(path))]) != base:
            raise FileNotFoundError(f"URL escapes the site root: {url}")
    return path


def make_file_fetch(root: str | None = None, host: str | None = None) -> Fetch:
    """A filesystem-backed fetcher: serves ``file://`` URLs, and — when
    ``host`` is given (e.g. ``"http://site.test"``) — URLs under that
    host from ``root``, like crawling a local mirror. Content type is
    inferred from the extension. This is the oracle-friendly twin of
    ``default_fetch``: the whole crawl surface (BFS, robots.txt,
    policies, archives, post steps) runs unchanged over an in-tree
    fixture site with zero network."""

    def fetch(url: str) -> tuple[str, bytes]:
        path = _file_fetch_path(url, root, host)
        with open(path, "rb") as f:
            body = f.read()
        ext = os.path.splitext(path)[1].lower()
        return _CTYPES.get(ext, "application/octet-stream"), body

    return fetch


def make_file_head(root: str | None = None, host: str | None = None) -> Head:
    """HEAD twin of :func:`make_file_fetch`: Content-Length from the
    file size and a strong ETag (md5 of the bytes) — deterministic
    headers, so head-check footprints are replayable by an oracle."""

    def head(url: str) -> dict:
        path = _file_fetch_path(url, root, host)
        with open(path, "rb") as f:
            body = f.read()
        return {
            "Content-Length": str(len(body)),
            "ETag": hashlib.md5(body).hexdigest(),
        }

    return head


class _LinkParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__()
        self.hrefs: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v)


def extract_links(base_url: str, html: str) -> list[str]:
    """All ``<a href>`` targets, absolutized against ``base_url`` —
    the Jsoup ``select("a")`` + ``absUrl("href")`` pair
    (`Execute.scala:97-98`), stdlib-only."""
    p = _LinkParser()
    p.feed(html)
    return [urljoin(base_url, h) for h in p.hrefs]


def _robots_rules(url: str, fetch: Fetch, cache: dict):
    """Per-origin robots.txt, fetched once through the SAME injectable
    fetcher as pages (so tests stay offline); unreachable or missing
    robots.txt means allow-all, per the de-facto convention."""
    from urllib.parse import urlsplit
    from urllib.robotparser import RobotFileParser

    parts = urlsplit(url)
    origin = f"{parts.scheme}://{parts.netloc}"
    if origin not in cache:
        rp = RobotFileParser()
        try:
            _, body = fetch(f"{origin}/robots.txt")
            rp.parse(body.decode("utf-8", "replace").splitlines())
        except Exception:
            rp.allow_all = True
        cache[origin] = rp
    return cache[origin]


def crawl_links(
    start_url: str,
    *,
    follow: str,
    matching: str,
    content_type: str = "text/html",
    fetch: Fetch = default_fetch,
    max_pages: int = 10_000,
    on_error: str = "skip",
    respect_robots: bool = True,
) -> set[str]:
    """Breadth-first crawl from ``start_url``: pages whose
    content-type matches ``content_type`` are parsed for links; links
    matching ``follow`` join the frontier; links matching ``matching``
    are returned as the download set. The loop is the reference's
    toVisit/visited/toDownload walk (`Execute.scala:87-108`) with a
    ``max_pages`` safety bound the reference lacks (its crawls rely on
    the follow regex terminating; a bound makes runaway configs fail
    loudly instead of forever). ``on_error='skip'`` logs-and-continues
    on fetch failures (crawls meet dead links); ``'raise'``
    propagates. ``respect_robots`` (default ON — a politeness the
    reference lacks) consults each origin's robots.txt once and
    neither fetches nor follows disallowed paths; download-set
    candidates are filtered the same way."""
    follow_re = re.compile(follow)
    matching_re = re.compile(matching)
    ctype_re = re.compile(content_type)
    robots: dict = {}

    def allowed(u: str) -> bool:
        if not respect_robots:
            return True
        return _robots_rules(u, fetch, robots).can_fetch(_USER_AGENT, u)

    to_visit, visited, to_download = {start_url}, set(), set()
    while to_visit and len(visited) < max_pages:
        url = to_visit.pop()
        if url in visited:
            continue
        visited.add(url)
        if not allowed(url):
            continue
        try:
            ctype, body = fetch(url)
        except Exception:
            if on_error == "raise":
                raise
            continue
        if not ctype_re.search(ctype or ""):
            continue
        found = {
            a
            for a in extract_links(url, body.decode("utf-8", "replace"))
            if a not in visited and follow_re.search(a) and allowed(a)
        }
        to_download |= {a for a in found if matching_re.search(a)}
        to_visit |= found
    return to_download


def remote_footprint(url: str, *, head: Head = default_head) -> str:
    """The change-detection footprint the head-check policy compares:
    a JSON string of Last-Modified / ETag / Content-Length
    (`Execute.scala:269-281`); "Not Found" when none is present."""
    try:
        headers = head(url)
    except Exception:
        return "Not Found"
    keys = ("Last-Modified", "ETag", "Content-Length")
    found = {k: headers[k] for k in keys if k in headers}
    if not found:
        return "Not Found"
    return json.dumps(found, sort_keys=True)


def _cache_path(dest: str) -> str:
    return f"{dest}.cache"


def _read_cache(dest: str) -> str:
    try:
        with open(_cache_path(dest), encoding="utf-8") as f:
            return f.read()
    except FileNotFoundError:
        return ""


def _write_cache(dest: str, footprint: str) -> None:
    with open(_cache_path(dest), "w", encoding="utf-8") as f:
        f.write(footprint)


def spool_write(path: str, data: bytes) -> None:
    """Atomic spool-directory write: tmp file + rename, the visibility
    contract Spark's file streaming source requires (a half-written
    file must never be listed)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.__tmp__"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def zstd_frame_content_size(body: bytes) -> int | None:
    """Declared decompressed size from an RFC 8878 zstd frame header,
    or None when the frame omits it (streaming writers) / the magic is
    wrong. Pure header math — no decompression."""
    if len(body) < 6 or body[:4] != b"\x28\xb5\x2f\xfd":
        return None
    fhd = body[4]
    fcs_code = fhd >> 6
    single_segment = (fhd >> 5) & 1
    did_size = (0, 1, 2, 4)[fhd & 3]
    pos = 5 + (0 if single_segment else 1) + did_size
    if fcs_code == 0 and not single_segment:
        # one FCS byte only in single-segment frames; unknown else
        return None
    fcs_width = (1, 2, 4, 8)[fcs_code]
    if pos + fcs_width > len(body):
        # truncated header: a short slice would silently understate
        # the size — take the explicit size-unknown path instead
        return None
    if fcs_code == 0:
        return body[pos]
    if fcs_code == 1:
        return int.from_bytes(body[pos : pos + 2], "little") + 256
    return int.from_bytes(body[pos : pos + fcs_width], "little")


def _zstd_decompress(body: bytes, cap: int, url: str) -> bytes:
    """Bounded one-shot zstd via pyarrow's bundled codec: the frame
    header's declared content size gates the bomb cap BEFORE any
    decompression, and the codec enforces that size exactly, so a
    lying header or truncated stream raises instead of spooling wrong
    bytes. Size-less (streaming-written) and multi-frame files stay
    loud — decompress out-of-band."""
    try:
        import pyarrow as pa
    except ImportError as e:  # pragma: no cover - pyarrow is baked in
        raise NotImplementedError(
            "zstd download needs pyarrow's codec; decompress out-of-band"
        ) from e
    size = zstd_frame_content_size(body)
    if size is None:
        raise NotImplementedError(
            f"zstd frame without a declared content size (streaming "
            f"writer): {url}; decompress out-of-band"
        )
    if size > cap:
        raise ValueError(
            f"zstd stream from {url} declares {size} unpacked bytes, "
            f"over the {cap}-byte cap for a {len(body)}-byte fetch "
            "(decompression-bomb guard)"
        )
    try:
        out = pa.Codec("zstd").decompress(body, size)
    except (OSError, pa.lib.ArrowException) as e:
        raise ValueError(f"corrupt zstd stream from {url}: {e}") from e
    return out if isinstance(out, bytes) else out.to_pybytes()


def _check_flatten_collision(
    seen: dict[str, str], flat: str, member: str, url: str
) -> None:
    """Flattening ``/``→``-`` can alias two distinct members of ONE
    archive (``a/b.csv`` vs ``a-b.csv``) — the second spool_write
    would silently overwrite the first (ADVICE r7). Mirror
    sync_source's loud dest-collision check: raise instead of losing
    data, naming both members so the archive can be fixed or fetched
    with ``deflate=False``."""
    prev = seen.setdefault(flat, member)
    if prev != member:
        raise ValueError(
            f"archive {url!r}: members {prev!r} and {member!r} both "
            f"flatten to {flat!r}; extract with deflate=False and "
            "unpack out-of-band"
        )


def download(
    url: str,
    dest: str,
    *,
    deflate: bool = True,
    fetch: Fetch = default_fetch,
) -> list[str]:
    """Fetch ``url`` to ``dest``, decompressing archives when
    ``deflate`` (the reference's in-flight deflate,
    `Execute.scala:319-459`; tar matching at `Execute.scala:111` via
    commons-compress): ``.zip`` explodes into ``dest`` as a directory
    (entry names flattened ``/``→``-``, as the reference does),
    ``.tar`` / ``.tar.gz`` / ``.tgz`` / ``.tar.bz2`` / ``.tar.xz`` /
    ``.txz`` extract their
    MEMBERS into ``dest`` the same way (stdlib ``tarfile``; member
    names are flattened, so a hostile ``../`` can never escape the
    spool), ``.gz``/``.bz2``/``.xz``/``.lzma`` decompress to a single
    file (r10: the xz/lzma-alone containers the reference reads via
    org.tukaani:xz + CompressorStreamFactory), anything
    else lands verbatim. ``.7z`` extracts through the bounded
    pure-stdlib reader (:mod:`demy_spark.sevenzip`): single-coder
    LZMA/LZMA2/BZip2/Deflate/Copy folders — the ``7z a`` default —
    plus BCJ-x86/Delta chains over LZMA (executables, some mirrors)
    and (r10) 4-stream BCJ2 folders via :mod:`demy_spark.bcj2`;
    PPMd/encryption raise a loud NotImplementedError rather than
    faking decompression, and declared unpack sizes are bomb-capped.
    Every file lands via the atomic spool write. Returns the written
    paths.

    All archive branches share the 7z reader's decompression-bomb cap
    (``sevenzip._default_unpack_cap``: max(64 MiB, 1000x the fetched
    body), r9): gzip/bz2 decompress through bounded incremental APIs,
    zip/tar reject members whose declared size exceeds the cap — a
    hostile crawl target cannot make the driver materialize a multi-GB
    payload from a tiny response."""
    from demy_spark.sevenzip import _default_unpack_cap

    _, body = fetch(url)
    cap = _default_unpack_cap(len(body))

    def _bomb(kind: str, declared: int) -> ValueError:
        return ValueError(
            f"{kind} from {url} declares/produces {declared}+ unpacked "
            f"bytes, over the {cap}-byte cap for a {len(body)}-byte "
            "fetch (decompression-bomb guard)"
        )

    lower = url.lower()
    if deflate and ".7z" in lower:
        from demy_spark.sevenzip import read_7z

        out = []
        seen: dict[str, str] = {}
        for name, content in read_7z(body):
            name = name.replace("\\", "/")
            flat = name.replace("/", "-")
            if flat in ("", ".", ".."):
                continue  # hostile/degenerate member name
            _check_flatten_collision(seen, flat, name, url)
            path = os.path.join(dest, flat)
            spool_write(path, content)
            out.append(path)
        return out
    if deflate and ".zip" in lower:
        out = []
        seen: dict[str, str] = {}
        with zipfile.ZipFile(io.BytesIO(body)) as zf:
            for info in zf.infolist():
                if info.is_dir():
                    continue
                if info.file_size > cap:
                    raise _bomb("zip member", info.file_size)
                flat = info.filename.replace("/", "-")
                if flat in ("", ".", ".."):
                    continue  # hostile/degenerate entry name
                _check_flatten_collision(seen, flat, info.filename, url)
                path = os.path.join(dest, flat)
                spool_write(path, zf.read(info))
                out.append(path)
        return out
    if deflate and lower.endswith((".gz", ".tgz")):
        # wbits=31: zlib's gzip-wrapper mode, with a bounded read
        d = zlib.decompressobj(31)
        body = d.decompress(body, cap + 1)
        if len(body) > cap:
            raise _bomb("gzip stream", cap)
        if not d.eof:
            # a truncated download must be loud, never a silently
            # partial spool file (ADVICE r10; the reference's
            # commons-compress stream throws here)
            raise ValueError(f"truncated gzip stream: {url}")
        lower = lower[:-4] + ".tar" if lower.endswith(".tgz") else lower[:-3]
    elif deflate and lower.endswith(".bz2"):
        d = bz2.BZ2Decompressor()
        body = d.decompress(body, max_length=cap + 1)
        if len(body) > cap:
            raise _bomb("bzip2 stream", cap)
        if not d.eof:
            raise ValueError(f"truncated bzip2 stream: {url}")
        lower = lower[:-4]
    elif deflate and lower.endswith((".xz", ".txz", ".lzma")):
        # r10: the reference's CompressorStreamFactory auto-detects
        # xz/lzma-alone (org.tukaani:xz is an explicit net2demy
        # dependency); stdlib lzma reads both containers with the
        # same bounded incremental contract as gz/bz2
        import lzma as _lzma

        fmt = _lzma.FORMAT_ALONE if lower.endswith(".lzma") else _lzma.FORMAT_XZ
        d = _lzma.LZMADecompressor(format=fmt)
        body = d.decompress(body, max_length=cap + 1)
        if len(body) > cap:
            raise _bomb("xz/lzma stream", cap)
        if not d.eof:
            raise ValueError(f"truncated xz/lzma stream: {url}")
        if d.unused_data:
            raise ValueError(f"trailing garbage after xz/lzma stream: {url}")
        if lower.endswith(".txz"):
            lower = lower[:-4] + ".tar"
        else:
            lower = lower[: -3 if lower.endswith(".xz") else -5]
    elif deflate and lower.endswith((".zst", ".tzst")):
        # r11: zstd via pyarrow's bundled codec (modern LLM corpora —
        # Dolma, RedPajama — ship .zst). The RFC 8878 frame header's
        # declared content size gates the bomb cap BEFORE any
        # decompression, and pyarrow enforces the size EXACTLY, so a
        # lying header fails loudly rather than truncating silently.
        body = _zstd_decompress(body, cap, url)
        lower = lower[:-5] + ".tar" if lower.endswith(".tzst") else lower[:-4]
    if deflate and lower.endswith(".tar"):
        out = []
        seen = {}
        with tarfile.open(fileobj=io.BytesIO(body), mode="r:") as tf:
            for m in tf:
                if not m.isfile():
                    continue
                if m.size > cap:
                    raise _bomb("tar member", m.size)
                name = m.name[2:] if m.name.startswith("./") else m.name
                flat = name.replace("/", "-")
                if flat in ("", ".", ".."):
                    # a member literally named '..' would os.replace
                    # onto the spool's parent — skip hostile names that
                    # flattening cannot neutralize (code-review r7)
                    continue
                _check_flatten_collision(seen, flat, m.name, url)
                path = os.path.join(dest, flat)
                member = tf.extractfile(m)
                assert member is not None  # isfile() guarantees content
                spool_write(path, member.read())
                out.append(path)
        return out
    spool_write(dest, body)
    return [dest]


@dataclass
class CrawlConfig:
    """One entry of the links-to-import config
    (`Execute.scala:64-76`), pythonic field names; ``from_json``
    accepts the reference's hyphenated keys."""

    name: str
    href: str
    dest: str
    type: str = "crawl"  # "crawl" | "direct-download"
    active: bool = True
    policy: str = "immutable"  # "immutable" | "head-check"
    post: str | None = None
    crawling_filter: str = ".*"
    crawling_matching: str = ".*"
    crawling_content_type: str = "text/html"
    crawling_deflate: bool = True
    extra: dict = field(default_factory=dict)

    @classmethod
    def from_json(cls, row: dict) -> "CrawlConfig":
        known = {
            "name": row.get("name"),
            "href": row.get("href"),
            "dest": row.get("dest"),
            "type": row.get("type", "crawl"),
            "active": bool(row.get("active", 1)),
            "policy": row.get("policy", "immutable"),
            "post": row.get("post"),
            "crawling_filter": row.get("crawling-filter", ".*"),
            "crawling_matching": row.get("crawling-matching", ".*"),
            "crawling_content_type": row.get("crawling-contentType", "text/html"),
            "crawling_deflate": str(row.get("crawling-deflate", "true")).lower()
            == "true",
        }
        used = {
            "name", "href", "dest", "type", "active", "policy", "post",
            "crawling-filter", "crawling-matching", "crawling-contentType",
            "crawling-deflate",
        }
        known["extra"] = {k: v for k, v in row.items() if k not in used}
        return cls(**known)


def _post_process(spark, cfg: CrawlConfig, paths: list[str]) -> None:
    """The reference's post steps (`Execute.scala:146-211`), the
    Spark-shaped subset: ``json2parquet`` / ``csv2parquet`` (the BAN
    import generalized: ``;``-separated, header row) re-encode the
    download to parquet next to it; ``excludeLines:<regex>`` rewrites
    the text files without matching lines (the reference streams
    line-by-line on the driver; a download is one file — same here).
    Unknown post values raise so configs fail loudly."""
    post = cfg.post
    if not post:
        return
    if post == "json2parquet":
        spark.read.json(cfg.dest).write.mode("overwrite").parquet(
            f"{cfg.dest}.parquet"
        )
    elif post == "csv2parquet":
        (
            spark.read.option("header", "true")
            .option("sep", ";")
            .csv(cfg.dest)
            .write.mode("overwrite")
            .parquet(f"{cfg.dest}.parquet")
        )
    elif post.startswith("excludeLines:"):
        pattern = re.compile(post.removeprefix("excludeLines:"))
        for p in paths:
            with open(p, encoding="utf-8") as f:
                kept = [ln for ln in f.read().splitlines() if not pattern.fullmatch(ln)]
            spool_write(p, ("\n".join(kept) + "\n").encode("utf-8"))
    else:
        raise ValueError(f"unknown post step: {post!r}")


def _crawl_dest(url: str, href: str, dest_root: str) -> str:
    """Map a crawled URL under ``dest_root`` by its path RELATIVE to
    the config href's directory — the reference's prefix rewrite
    (`Execute.scala:99-104` replaces conf href with conf dest), with
    the relative path flattened ``/``→``-`` like archive members so
    the spool stays one flat directory for the readStream handoff.
    Mapping by basename alone (the old rule) silently collided two
    URLs ending in the same filename (ADVICE r6): under ``immutable``
    the second was never downloaded, under ``head-check`` they
    overwrote each other every run.

    The name is a PURE FUNCTION of (url, href) — never of what else
    the crawl found (a set-dependent rename would orphan the previous
    run's file and double-ingest its content through the readStream
    handoff; code-review r7). Hence: a nested relative path (one that
    flattening rewrites) always carries a short url-hash suffix, so it
    can never alias a literal file whose name contains '-'; bare
    filenames directly under the prefix keep their plain name; URLs
    outside the prefix keep their basename plus the hash. A URL whose
    trailing slash was stripped also carries the hash (of the RAW
    url, slash included) — otherwise 'http://s/a' and 'http://s/a/'
    would map to the same bare name and sync_source's collision check
    would abort the whole sync on a site linking both forms (ADVICE
    r7)."""
    prefix = href if href.endswith("/") else href.rsplit("/", 1)[0] + "/"
    u = url.rstrip("/")
    h = hashlib.md5(url.encode("utf-8")).hexdigest()[:8]
    if u.startswith(prefix) and len(u) > len(prefix):
        rel = u[len(prefix):]
        if "/" not in rel and u == url:
            return os.path.join(dest_root, rel)
        return os.path.join(dest_root, f"{rel.replace('/', '-')}-{h}")
    tail = u.rsplit("/", 1)[-1] or "index"
    return os.path.join(dest_root, f"{tail}-{h}")


def sync_source(
    spark,
    cfg: CrawlConfig,
    *,
    fetch: Fetch = default_fetch,
    head: Head = default_head,
    max_pages: int = 10_000,
) -> list[str]:
    """Run one config entry end-to-end (the reference's per-row loop,
    `Execute.scala:63-217`): resolve the download set (the URL itself
    for ``direct-download``, else a BFS crawl), apply the cache
    policy per URL, download what changed, run the post step, update
    the ``.cache`` sidecars. Returns the paths written this run.

    Multi-URL crawls map each URL under ``dest`` by its path relative
    to the href's directory, flattened (``_crawl_dest`` — the
    reference's prefix rewrite; the dest directory is the handoff
    point where ``spark.readStream`` takes over). Names are a pure
    function of the URL — stable across runs whatever else the crawl
    finds — so a residual collision (an 8-hex md5 clash) raises
    instead of renaming."""
    if not cfg.active:
        return []
    if cfg.type == "direct-download":
        targets = {cfg.href: cfg.dest}
    else:
        found = crawl_links(
            cfg.href,
            follow=cfg.crawling_filter,
            matching=cfg.crawling_matching,
            content_type=cfg.crawling_content_type,
            fetch=fetch,
            max_pages=max_pages,
        )
        targets = {u: _crawl_dest(u, cfg.href, cfg.dest) for u in sorted(found)}
        # _crawl_dest is a pure per-URL function, so two DISTINCT urls
        # can only share a dest through an 8-hex md5 collision — fail
        # loudly rather than renaming (a set-dependent rename breaks
        # the stable-name contract; code-review r7)
        by_dest: dict[str, list[str]] = {}
        for u, d in targets.items():
            by_dest.setdefault(d, []).append(u)
        clashes = {d: us for d, us in by_dest.items() if len(us) > 1}
        if clashes:
            raise ValueError(f"crawl dest collision (md5-8): {clashes}")
    written: list[str] = []
    for url, dest in targets.items():
        if cfg.policy == "head-check":
            fp = remote_footprint(url, head=head)
            if fp == _read_cache(dest):
                continue
            paths = download(url, dest, deflate=cfg.crawling_deflate, fetch=fetch)
            _write_cache(dest, fp)
        else:  # immutable
            if os.path.exists(dest):
                continue
            paths = download(url, dest, deflate=cfg.crawling_deflate, fetch=fetch)
        written.extend(paths)
    if written:
        _post_process(spark, cfg, written)
    return written
