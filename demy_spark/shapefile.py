"""Shapefile (.shp/.dbf) ingestion to a Spark DataFrame.

Re-expresses the reference's GeoTools-backed shapefile → parquet
conversion (geo/src/main/scala/GeoManager.scala:40-245): read the
geometry file and its dBase attribute table, emit one row per feature
with typed attribute columns, the geometry serialized as WKB binary
(the reference serializes JTS geometry to binary the same way,
``GeoManager.scala:55``), the per-feature bounding box as four double
columns (``:183-203``), and — beyond the reference — the outer-ring
vertex arrays (xs/ys) so geo.point_in_polygon_raycast can run exact
point-in-polygon with no native geometry library.

Pure-Python parsers from the public file-format specifications (ESRI
shapefile whitepaper; dBase III header layout) — no GeoTools, no
pyshp, no shapely. Parsing is driver-side (shapefiles are dimension
tables: the reference's IRIS polygons are ~50k features), then
``spark.createDataFrame`` hands Spark a plain relational table; at
100 TB the POINT side is the big table and this polygon side is the
broadcast dim, so driver-side parse is the right placement.

Coordinate reprojection to WGS84 (the reference's GeoTools transform,
``GeoManager.scala:128-180``) is applied when a ``.prj`` sidecar is
present and :mod:`demy_spark.crs` can parse it: every vertex, bbox
and the WKB are rebuilt in lon/lat, and the output carries
``base_crs`` / ``transformed_to_wgs84`` columns (the reference's
``BaseCoordinateSystem`` / ``TransformedToWGS84`` fields,
``GeoManager.scala:60``). Unknown CRS warn loudly and pass through
in the source coordinates, like the reference's print-and-continue.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class ShapeRecord:
    number: int
    shape_type: int
    xs: list[float]  # outer ring / all points, x
    ys: list[float]
    rings: list[list[tuple[float, float]]]  # polygon rings (or 1 part)
    bbox: tuple[float, float, float, float]  # x_min, y_min, x_max, y_max


def _parse_shp(data: bytes) -> list[ShapeRecord]:
    """Parse a .shp byte string (spec: 100-byte header, then records of
    8-byte big-endian headers + little-endian shape payloads)."""
    if len(data) < 100:
        raise ValueError("not a shapefile: shorter than the 100-byte header")
    (file_code,) = struct.unpack(">i", data[0:4])
    if file_code != 9994:
        raise ValueError(f"not a shapefile: file code {file_code} != 9994")
    out: list[ShapeRecord] = []
    off = 100
    while off + 8 <= len(data):
        rec_no, content_words = struct.unpack(">ii", data[off : off + 8])
        off += 8
        end = off + content_words * 2
        (stype,) = struct.unpack("<i", data[off : off + 4])
        if stype == 0:  # null shape
            out.append(ShapeRecord(rec_no, 0, [], [], [], (0.0, 0.0, 0.0, 0.0)))
        elif stype == 1:  # point
            x, y = struct.unpack("<dd", data[off + 4 : off + 20])
            out.append(ShapeRecord(rec_no, 1, [x], [y], [[(x, y)]], (x, y, x, y)))
        elif stype in (3, 5):  # polyline / polygon share the layout
            bx0, by0, bx1, by1 = struct.unpack("<dddd", data[off + 4 : off + 36])
            n_parts, n_points = struct.unpack("<ii", data[off + 36 : off + 44])
            parts = list(
                struct.unpack(
                    f"<{n_parts}i", data[off + 44 : off + 44 + 4 * n_parts]
                )
            )
            pts_off = off + 44 + 4 * n_parts
            flat = struct.unpack(
                f"<{2 * n_points}d", data[pts_off : pts_off + 16 * n_points]
            )
            pts = [(flat[2 * i], flat[2 * i + 1]) for i in range(n_points)]
            bounds = parts + [n_points]
            rings = [pts[bounds[i] : bounds[i + 1]] for i in range(n_parts)]
            outer = rings[0] if rings else []
            out.append(
                ShapeRecord(
                    rec_no,
                    stype,
                    [p[0] for p in outer],
                    [p[1] for p in outer],
                    rings,
                    (bx0, by0, bx1, by1),
                )
            )
        else:
            raise NotImplementedError(f"shape type {stype} not supported")
        off = end
    return out


def _parse_dbf(data: bytes) -> tuple[list[str], list[list[object]]]:
    """Parse a dBase III .dbf byte string → (field names, rows). Field
    types: C → str, N/F → int/float, L → bool, D → 'YYYYMMDD' str."""
    n_records, header_size, record_size = struct.unpack("<IHH", data[4:12])
    fields: list[tuple[str, str, int]] = []
    off = 32
    while off < header_size - 1 and data[off] != 0x0D:
        raw = data[off : off + 32]
        name = raw[0:11].split(b"\x00", 1)[0].decode("ascii", "replace")
        ftype = chr(raw[11])
        length = raw[16]
        fields.append((name, ftype, length))
        off += 32
    rows: list[list[object]] = []
    off = header_size
    for _ in range(n_records):
        rec = data[off : off + record_size]
        off += record_size
        if not rec or rec[0:1] == b"*":  # deleted record
            continue
        vals: list[object] = []
        pos = 1
        for name, ftype, length in fields:
            cell = rec[pos : pos + length].decode("ascii", "replace").strip()
            pos += length
            if ftype in ("N", "F"):
                if cell == "":
                    vals.append(None)
                elif "." in cell or ftype == "F":
                    vals.append(float(cell))
                else:
                    vals.append(int(cell))
            elif ftype == "L":
                # tuple membership, not substring: an empty (unset)
                # cell must parse as None, and '' is "in" any string
                vals.append(
                    True
                    if cell in ("Y", "y", "T", "t")
                    else False
                    if cell in ("N", "n", "F", "f")
                    else None
                )
            else:
                vals.append(cell or None)
        rows.append(vals)
    return [f[0] for f in fields], rows


def _wkb(rec: ShapeRecord) -> bytes:
    """Minimal little-endian WKB: Point for type 1, Polygon for type 5
    (rings closed on write if the source left them open), LineString
    for type 3 single-part."""
    if rec.shape_type == 1:
        return struct.pack("<bIdd", 1, 1, rec.xs[0], rec.ys[0])
    if rec.shape_type == 3 and len(rec.rings) == 1:
        pts = rec.rings[0]
        return struct.pack("<bII", 1, 2, len(pts)) + b"".join(
            struct.pack("<dd", x, y) for x, y in pts
        )
    rings = []
    for ring in rec.rings:
        if ring and ring[0] != ring[-1]:
            ring = ring + [ring[0]]
        rings.append(ring)
    body = struct.pack("<bII", 1, 3, len(rings))
    for ring in rings:
        body += struct.pack("<I", len(ring)) + b"".join(
            struct.pack("<dd", x, y) for x, y in ring
        )
    return body


def build_shp_bytes(polygons: list[list[list[tuple[float, float]]]]) -> bytes:
    """Serialize polygons (list of features; each feature = list of
    rings; each ring = [(x, y), ...]) to .shp bytes per the public ESRI
    spec — the writer twin of ``_parse_shp``, used to synthesize
    deterministic fixtures (tests, q75) without any geo library."""
    records = []
    for i, rings in enumerate(polygons):
        pts = [p for ring in rings for p in ring]
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        payload = struct.pack("<i", 5)
        payload += struct.pack("<dddd", min(xs), min(ys), max(xs), max(ys))
        payload += struct.pack("<ii", len(rings), len(pts))
        start = 0
        for ring in rings:
            payload += struct.pack("<i", start)
            start += len(ring)
        for x, y in pts:
            payload += struct.pack("<dd", x, y)
        records.append(struct.pack(">ii", i + 1, len(payload) // 2) + payload)
    content = b"".join(records)
    header = struct.pack(">i", 9994) + b"\x00" * 20
    header += struct.pack(">i", (100 + len(content)) // 2)
    header += struct.pack("<ii", 1000, 5)
    header += struct.pack("<dddd", 0.0, 0.0, 0.0, 0.0) + b"\x00" * 32
    return header + content


def build_dbf_bytes(
    fields: list[tuple[str, str, int]], rows: list[list[str]]
) -> bytes:
    """Serialize attribute rows (all cells pre-formatted as strings;
    empty string = unset) to dBase III .dbf bytes — the writer twin of
    ``_parse_dbf``."""
    record_size = 1 + sum(f[2] for f in fields)
    header_size = 32 + 32 * len(fields) + 1
    out = b"\x03" + b"\x00" * 3
    out += struct.pack("<IHH", len(rows), header_size, record_size)
    out += b"\x00" * 20
    for name, ftype, length in fields:
        out += name.encode().ljust(11, b"\x00") + ftype.encode()
        out += b"\x00" * 4 + bytes([length, 0]) + b"\x00" * 14
    out += b"\x0d"
    for row in rows:
        out += b" " + b"".join(
            cell.encode().ljust(length)[:length]
            for cell, (_, _, length) in zip(row, fields)
        )
    return out


def _reproject(rec: ShapeRecord, to_wgs84) -> ShapeRecord:
    """Rebuild one record with every vertex through ``to_wgs84`` and
    the bbox recomputed from the TRANSFORMED points (the reference
    computes Max/MinLat/Long from the transformed geometry's
    coordinates, ``GeoManager.scala:185-200`` — transforming the four
    bbox corners instead would be wrong under a curved projection)."""
    rings = [[to_wgs84(x, y) for x, y in ring] for ring in rec.rings]
    xs = [p[0] for ring in rings for p in ring]
    ys = [p[1] for ring in rings for p in ring]
    outer = rings[0] if rings else []
    if not xs:
        return ShapeRecord(rec.number, rec.shape_type, [], [], rings, rec.bbox)
    return ShapeRecord(
        rec.number,
        rec.shape_type,
        [p[0] for p in outer],
        [p[1] for p in outer],
        rings,
        (min(xs), min(ys), max(xs), max(ys)),
    )


def read_shapefile(
    spark: SparkSession,
    shp_path: str,
    dbf_path: str | None = None,
    prj_path: str | None = None,
    reproject: bool = True,
) -> DataFrame:
    """Read ``.shp`` (+ optional sidecar ``.dbf``/``.prj``) into a
    DataFrame: one row per feature with dbf attribute columns,
    ``geometry`` (WKB binary), ``x_min/y_min/x_max/y_max`` bbox
    doubles (the prefilter columns point_in_bbox_join consumes),
    ``xs``/``ys`` outer-ring vertex arrays (the exact-PIP input for
    point_in_polygon_raycast), plus ``base_crs`` and
    ``transformed_to_wgs84`` (GeoManager.scala:60's
    ``BaseCoordinateSystem`` / ``TransformedToWGS84``). With
    ``reproject`` (default) and a parseable projected ``.prj``, every
    coordinate — vertices, bbox, WKB — is rebuilt in WGS84 lon/lat
    via the closed-form inverse in :mod:`demy_spark.crs`."""
    import os

    from pyspark.sql import types as T

    with open(shp_path, "rb") as f:
        shapes = _parse_shp(f.read())
    base = shp_path[:-4] if shp_path.endswith(".shp") else None
    if dbf_path is None:
        cand = base + ".dbf" if base else None
        dbf_path = cand if cand and os.path.exists(cand) else None
    if prj_path is None:
        cand = base + ".prj" if base else None
        prj_path = cand if cand and os.path.exists(cand) else None
    base_crs, transformed = "Unknown", False
    if prj_path:
        import warnings

        from demy_spark.crs import parse_wkt

        try:
            info = parse_wkt(
                open(prj_path, encoding="utf-8", errors="replace").read()
            )
        except ValueError as exc:
            # a corrupt/empty .prj must not abort ingestion — same
            # warn-and-pass-through contract as an unknown CRS
            # (code-review r9; the reference prints and continues)
            warnings.warn(
                f"unparseable .prj sidecar {prj_path!r} ({exc}): "
                "coordinates pass through untransformed",
                stacklevel=2,
            )
            info = None
        if info is not None:
            base_crs = info.code
            if reproject and info.has_transform:
                transformed = True
                # identity for lon/lat-ordered geographic CRS; lat/lon-
                # ordered ones still need the axis swap
                if info.projection is not None or info.lat_lon_order:
                    shapes = [_reproject(s, info.to_wgs84) for s in shapes]
    if dbf_path:
        names, attrs = _parse_dbf(open(dbf_path, "rb").read())
        if len(attrs) != len(shapes):
            raise ValueError(
                f".dbf has {len(attrs)} records but .shp has {len(shapes)}"
            )
    else:
        names, attrs = [], [[] for _ in shapes]

    def _field(name: str, values: list) -> T.StructField:
        # infer from the first NON-NULL cell — the first record may
        # legitimately hold an unset (None) numeric or logical cell
        example = next((v for v in values if v is not None), None)
        if isinstance(example, bool):
            return T.StructField(name, T.BooleanType())
        if isinstance(example, int):
            return T.StructField(name, T.LongType())
        if isinstance(example, float):
            return T.StructField(name, T.DoubleType())
        return T.StructField(name, T.StringType())

    schema = T.StructType(
        [
            _field(n, [row[i] for row in attrs])
            for i, n in enumerate(names)
        ]
        + [
            T.StructField("geometry", T.BinaryType()),
            T.StructField("x_min", T.DoubleType()),
            T.StructField("y_min", T.DoubleType()),
            T.StructField("x_max", T.DoubleType()),
            T.StructField("y_max", T.DoubleType()),
            T.StructField("xs", T.ArrayType(T.DoubleType())),
            T.StructField("ys", T.ArrayType(T.DoubleType())),
            T.StructField("base_crs", T.StringType()),
            T.StructField("transformed_to_wgs84", T.BooleanType()),
        ]
    )
    rows = [
        tuple(a)
        + (
            bytearray(_wkb(s)),
            s.bbox[0],
            s.bbox[1],
            s.bbox[2],
            s.bbox[3],
            s.xs,
            s.ys,
            base_crs,
            transformed,
        )
        for a, s in zip(attrs, shapes)
    ]
    return spark.createDataFrame(rows, schema)
