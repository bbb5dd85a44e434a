"""EpiFiles-style remote file-exchange client — the reference's
second ingestion path.

Parity: `core/src/main/scala/Storage/EpiFiles.scala:20-185` and the
`EpiFileStorage` adapter (`Storage/Storage.scala:341-398`). The wire
protocol, re-expressed stdlib-only (urllib + base64 + hashlib +
xml.etree; the reference uses Apache HttpClient + scala-xml):

- upload: the file is cut into fixed chunks; chunk 1 POSTs multipart
  fields (content=base64, hash=chunk md5, total_chunks, filename,
  comment) to ``{base}/epifiles/ws/manifestfile`` and the XML reply
  carries ``process_id``; later chunks POST to
  ``manifestfile/id/{process_id}`` with ``chunk_index`` (1-based) and
  ``file_hash`` (whole-file md5)  (`EpiFiles.scala:21-81`);
- download: GET ``manifestfile/id/{id}/chunk_index/{i}`` yields XML
  with base64 ``content`` and ``total_chunks``; chunks concatenate in
  index order (`EpiFiles.scala:122-149`);
- exists: chunk-1 GET status in [200, 300) (`EpiFiles.scala:150-158`);
- find: GET ``manifest/?version=2`` lists files; entries sort by
  creation_date DESC and filter by name/comment regex, first match
  wins (`EpiFiles.scala:82-115`);
- store semantics on top (`Storage.scala:358-381`): no overwrite —
  ``ignore_if_exists`` skips, ``fail_if_exists`` raises when a
  matching file exists.

Like the crawler, this is a DRIVER-SIDE utility by design (SURVEY
§2.1): a chunked HTTP exchange has no distributed structure. The
bridge into the engine is the spool handoff — ``fetch_to_spool``
lands the download atomically in a directory a Spark batch read or
file-source stream consumes. The transport is injectable
(``transport(method, url, fields) -> (status, body)``), so the full
chunk/manifest/XML surface is tested against an in-memory server
with zero network; the default transport is stdlib urllib with HTTP
basic auth.
"""

from __future__ import annotations

import base64
import hashlib
import re
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape as _xesc
from collections.abc import Callable
from dataclasses import dataclass

__all__ = [
    "HttpFileStore",
    "MemoryEpiServer",
    "RemoteFile",
    "fetch_to_spool",
]

Transport = Callable[[str, str, dict | None], tuple[int, bytes]]


@dataclass(frozen=True)
class RemoteFile:
    """One manifest entry: (name, comment, id, date) — the tuple
    ``findFile`` returns (`EpiFiles.scala:110`)."""

    name: str
    comment: str
    id: str
    date: str


def _urllib_transport(user: str, pwd: str) -> Transport:
    def transport(method: str, url: str, fields: dict | None) -> tuple[int, bytes]:
        from urllib.error import HTTPError
        from urllib.request import Request, urlopen

        auth = base64.b64encode(f"{user}:{pwd}".encode()).decode()
        headers = {"Authorization": f"Basic {auth}"}
        data = None
        if fields is not None:
            # the server reads simple text fields; url-encoded POST
            # carries them with stdlib only (the reference's multipart
            # builder adds nothing the fields themselves don't)
            from urllib.parse import urlencode

            data = urlencode(fields).encode()
            headers["Content-Type"] = "application/x-www-form-urlencoded"
        req = Request(url, data=data, method=method, headers=headers)
        try:
            with urlopen(req, timeout=30) as resp:  # noqa: S310
                return resp.status, resp.read()
        except HTTPError as e:  # status still meaningful (exists())
            return e.code, e.read()

    return transport


class HttpFileStore:
    """Chunked remote file exchange with the EpiFiles manifest
    semantics. ``chunk_size`` defaults to the reference's 1 MiB
    (`EpiFiles.scala:25`)."""

    def __init__(
        self,
        base_url: str,
        user: str = "",
        pwd: str = "",
        *,
        chunk_size: int = 1024 * 1024,
        transport: Transport | None = None,
    ):
        self.endpoint = f"{base_url.rstrip('/')}/epifiles/ws"
        self.chunk_size = chunk_size
        self.transport = transport or _urllib_transport(user, pwd)

    # -- primitives ----------------------------------------------------
    def exists(self, file_id: str) -> bool:
        status, _ = self.transport(
            "GET", f"{self.endpoint}/manifestfile/id/{file_id}/chunk_index/1", None
        )
        return 200 <= status < 300

    def download(self, file_id: str) -> bytes:
        """Concatenate chunks in index order; ``total_chunks`` comes
        from each chunk's XML envelope."""
        out, index, total = [], 1, 1
        while index <= total:
            status, body = self.transport(
                "GET",
                f"{self.endpoint}/manifestfile/id/{file_id}/chunk_index/{index}",
                None,
            )
            if not 200 <= status < 300:
                raise OSError(f"chunk {index} of {file_id}: HTTP {status}")
            xml = ET.fromstring(body.decode("utf-8"))
            total = int(xml.findtext(".//total_chunks"))
            out.append(base64.b64decode(xml.findtext(".//content") or ""))
            index += 1
        return b"".join(out)

    def upload(self, name: str, data: bytes, comment: str = "") -> str:
        """Chunked upload; returns the server-assigned file id
        (process_id). Chunk indexes are 1-based and later chunks carry
        the whole-file md5, exactly the reference's field layout."""
        chunks = [
            data[i : i + self.chunk_size]
            for i in range(0, max(len(data), 1), self.chunk_size)
        ]
        file_md5 = hashlib.md5(data).hexdigest()
        proc_id = None
        for i, chunk in enumerate(chunks):
            fields = {
                "content": base64.b64encode(chunk).decode(),
                "hash": hashlib.md5(chunk).hexdigest(),
                "total_chunks": str(len(chunks)),
            }
            if i == 0:
                fields["filename"] = name
                fields["comment"] = comment
                url = f"{self.endpoint}/manifestfile"
            else:
                fields["chunk_index"] = str(i + 1)
                fields["file_hash"] = file_md5
                url = f"{self.endpoint}/manifestfile/id/{proc_id}"
            status, body = self.transport("POST", url, fields)
            if not 200 <= status < 300:
                raise OSError(f"upload chunk {i + 1}: HTTP {status}")
            if i == 0:
                proc_id = ET.fromstring(body.decode("utf-8")).findtext(
                    ".//process_id"
                )
                if not proc_id:
                    raise OSError("server returned no process_id")
        return proc_id

    # -- manifest ------------------------------------------------------
    def list_files(self) -> list[RemoteFile]:
        status, body = self.transport(
            "GET", f"{self.endpoint}/manifest/?version=2", None
        )
        if not 200 <= status < 300:
            raise OSError(f"manifest: HTTP {status}")
        root = ET.fromstring(body.decode("utf-8"))
        out = []
        for man in root.iter("manifest"):
            comment = man.findtext("comment") or ""
            date = man.findtext("creation_date") or ""
            for f in man.iter("file"):
                out.append(
                    RemoteFile(
                        name=f.findtext("name") or "",
                        comment=comment,
                        id=f.findtext("id") or "",
                        date=date,
                    )
                )
        return out

    def find(
        self,
        name_pattern: str | None = None,
        comment_pattern: str | None = None,
    ) -> RemoteFile | None:
        """Newest manifest entry whose name/comment match the given
        regexes (search, not fullmatch — the reference uses
        findFirstIn); None when nothing matches."""
        name_re = re.compile(name_pattern) if name_pattern else None
        comment_re = re.compile(comment_pattern) if comment_pattern else None
        best = None
        for f in sorted(self.list_files(), key=lambda f: f.date, reverse=True):
            if name_re and not name_re.search(f.name):
                continue
            if comment_re and not comment_re.search(f.comment):
                continue
            best = f
            break
        return best

    def modification_time(self, **patterns) -> int | None:
        f = self.find(**patterns)
        return int(f.date) if f else None

    # -- store semantics (Storage.scala:358-381) -----------------------
    def put(
        self,
        name: str,
        data: bytes,
        comment: str = "",
        *,
        write_mode: str = "ignore_if_exists",
    ) -> str | None:
        """Upload under the reference's write-mode contract: the store
        supports NO overwrite (`Storage.scala:361`); a file with the
        same exact name either short-circuits (``ignore_if_exists``,
        returning the existing id) or raises (``fail_if_exists``)."""
        if write_mode not in ("ignore_if_exists", "fail_if_exists"):
            raise ValueError(
                "EpiFiles-style stores cannot overwrite; write_mode must be "
                f"ignore_if_exists or fail_if_exists, got {write_mode!r}"
            )
        existing = self.find(name_pattern=f"^{re.escape(name)}$")
        if existing is not None:
            if write_mode == "fail_if_exists":
                raise FileExistsError(name)
            return existing.id
        return self.upload(name, data, comment)

    def get_lines(
        self,
        *,
        line_pattern: str | None = None,
        encoding: str = "UTF-8",
        name_pattern: str | None = None,
        comment_pattern: str | None = None,
    ) -> list[str] | None:
        """Download the newest matching file and return its lines,
        optionally only those matching ``line_pattern``
        (`EpiFiles.scala:159-184`); None when no file matches."""
        f = self.find(name_pattern=name_pattern, comment_pattern=comment_pattern)
        if f is None:
            return None
        text = self.download(f.id).decode(encoding)
        lines = text.splitlines()
        if line_pattern:
            rx = re.compile(line_pattern)
            lines = [ln for ln in lines if rx.search(ln)]
        return lines


class MemoryEpiServer:
    """Deterministic in-memory EpiFiles server speaking exactly the
    endpoints the client does (`EpiFiles.scala:20-185`): chunked
    uploads keyed by process_id, manifest listing, chunked download
    envelopes. The offline twin of a real deployment — plug its
    ``transport`` into :class:`HttpFileStore` for tests, demos and
    the q143 oracle query; ``files``/``calls`` expose the server
    state for assertions."""

    def __init__(self) -> None:
        self.files: dict[str, dict] = {}  # id -> {name, comment, date, chunks}
        self.next_id = 100
        self.calls: list[str] = []

    def transport(self, method: str, url: str, fields) -> tuple[int, bytes]:
        self.calls.append(f"{method} {url}")
        m = re.search(r"/manifestfile/id/([^/]+)/chunk_index/(\d+)$", url)
        if method == "GET" and m:
            fid, idx = m.group(1), int(m.group(2))
            f = self.files.get(fid)
            # chunk indexes are 1-based: index 0 must 404, not serve
            # chunks[-1] (code-review r9)
            if f is None or idx < 1 or idx > len(f["chunks"]):
                return 404, b"not found"
            chunk = f["chunks"][idx - 1]
            xml = (
                f"<file><filename>{_xesc(f['name'])}</filename>"
                f"<total_chunks>{len(f['chunks'])}</total_chunks>"
                f"<content>{base64.b64encode(chunk).decode()}</content></file>"
            )
            return 200, xml.encode()
        if method == "GET" and url.endswith("/manifest/?version=2"):
            parts = ["<manifests>"]
            for fid, f in self.files.items():
                parts.append(
                    f"<manifest><comment>{_xesc(f['comment'])}</comment>"
                    f"<creation_date>{f['date']}</creation_date>"
                    f"<manifest_files><file><id>{fid}</id>"
                    f"<name>{_xesc(f['name'])}</name></file></manifest_files>"
                    "</manifest>"
                )
            parts.append("</manifests>")
            return 200, "".join(parts).encode()
        if method == "POST" and url.endswith("/manifestfile"):
            chunk = base64.b64decode(fields["content"])
            if fields["hash"] != hashlib.md5(chunk).hexdigest():
                return 400, b"chunk hash mismatch"
            fid = str(self.next_id)
            self.next_id += 1
            self.files[fid] = {
                "name": fields["filename"],
                "comment": fields.get("comment", ""),
                "date": str(1000 + self.next_id),
                "chunks": [chunk],
            }
            return 200, f"<resp><process_id>{fid}</process_id></resp>".encode()
        m = re.search(r"/manifestfile/id/([^/]+)$", url)
        if method == "POST" and m:
            f = self.files.get(m.group(1))
            if f is None:  # stale/unknown process_id -> 404, not KeyError
                return 404, b"unknown process id"
            chunk = base64.b64decode(fields["content"])
            if fields["hash"] != hashlib.md5(chunk).hexdigest():
                return 400, b"chunk hash mismatch"
            if int(fields["chunk_index"]) != len(f["chunks"]) + 1:
                return 400, b"out-of-order chunk"
            f["chunks"].append(chunk)
            return 200, b"<resp>ok</resp>"
        return 500, b"bad request"


def fetch_to_spool(store: HttpFileStore, file_id: str, spool_path: str) -> str:
    """Land a remote file in the engine's spool with the atomic-write
    contract (`crawler.spool_write`) — the handoff point where a Spark
    batch read or file-source stream takes over."""
    from demy_spark.crawler import spool_write

    spool_write(spool_path, store.download(file_id))
    return spool_path
