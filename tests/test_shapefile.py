"""Shapefile ingestion (demy_spark.shapefile): golden tests on
synthetic .shp/.dbf bytes built from the public spec — polygon ring
split, bbox columns, WKB round-trip layout, dbf typing."""

from __future__ import annotations

import struct

import pytest

from demy_spark.shapefile import _parse_dbf, _parse_shp, _wkb, read_shapefile


def _shp_bytes(records: list[bytes]) -> bytes:
    content = b"".join(records)
    total_words = (100 + len(content)) // 2
    header = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", total_words)
    header += struct.pack("<ii", 1000, 5)
    header += struct.pack("<dddd", 0.0, 0.0, 10.0, 10.0) + b"\x00" * 32
    return header + content


def _record(rec_no: int, payload: bytes) -> bytes:
    return struct.pack(">ii", rec_no, len(payload) // 2) + payload


def _polygon_payload(rings: list[list[tuple[float, float]]]) -> bytes:
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
    return payload


def _dbf_bytes(fields: list[tuple[str, str, int]], rows: list[list[str]]) -> bytes:
    record_size = 1 + sum(f[2] for f in fields)
    header_size = 32 + 32 * len(fields) + 1
    out = b"\x03" + b"\x00" * 3 + struct.pack("<IHH", len(rows), header_size, record_size)
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


SQUARE = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
HOLE = [(1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (2.0, 1.0), (1.0, 1.0)]


def test_parse_polygon_with_hole():
    data = _shp_bytes([_record(1, _polygon_payload([SQUARE, HOLE]))])
    recs = _parse_shp(data)
    assert len(recs) == 1
    r = recs[0]
    assert r.shape_type == 5
    assert r.rings == [SQUARE, HOLE]
    assert r.xs == [p[0] for p in SQUARE]
    assert r.bbox == (0.0, 0.0, 4.0, 4.0)


def test_wkb_polygon_layout():
    data = _shp_bytes([_record(1, _polygon_payload([SQUARE]))])
    wkb = _wkb(_parse_shp(data)[0])
    order, gtype, n_rings = struct.unpack("<bII", wkb[:9])
    assert (order, gtype, n_rings) == (1, 3, 1)
    (n_pts,) = struct.unpack("<I", wkb[9:13])
    assert n_pts == 5  # closed ring preserved


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="9994"):
        _parse_shp(b"\x00" * 100)


def test_parse_dbf_types():
    fields = [("INSEE", "C", 5), ("POP", "N", 8), ("AREA", "F", 10)]
    rows = [["75056", "2148000", "105.4"], ["13055", "870000", "240.6"]]
    names, parsed = _parse_dbf(_dbf_bytes(fields, rows))
    assert names == ["INSEE", "POP", "AREA"]
    assert parsed[0] == ["75056", 2148000, 105.4]
    assert parsed[1][1] == 870000


def test_read_shapefile_dataframe(spark, tmp_path):
    shp = tmp_path / "iris.shp"
    dbf = tmp_path / "iris.dbf"
    shp.write_bytes(
        _shp_bytes(
            [
                _record(1, _polygon_payload([SQUARE])),
                _record(2, _polygon_payload([[(5.0, 5.0), (9.0, 5.0), (7.0, 9.0), (5.0, 5.0)]])),
            ]
        )
    )
    dbf.write_bytes(
        _dbf_bytes([("INSEE", "C", 5), ("POP", "N", 8)], [["75056", "100"], ["13055", "200"]])
    )
    df = read_shapefile(spark, str(shp))
    rows = {r["INSEE"]: r for r in df.collect()}
    assert set(rows) == {"75056", "13055"}
    assert rows["75056"]["POP"] == 100
    assert rows["75056"]["x_max"] == 4.0
    assert rows["13055"]["xs"] == [5.0, 9.0, 7.0, 5.0]
    assert bytes(rows["75056"]["geometry"])[:9] == struct.pack("<bII", 1, 3, 1)


def test_raycast_over_shapefile(spark, tmp_path):
    """End-to-end: shapefile polygons → bbox join + exact ray-cast
    (the reference's IRIS assignment path, AddressLocalizator.scala:
    32-36, with zero native geometry dependencies)."""
    from demy_spark.geo import point_in_bbox_join, point_in_polygon_raycast

    shp = tmp_path / "zones.shp"
    shp.write_bytes(
        _shp_bytes(
            [
                _record(1, _polygon_payload([SQUARE])),
                _record(2, _polygon_payload([[(5.0, 5.0), (9.0, 5.0), (7.0, 9.0), (5.0, 5.0)]])),
            ]
        )
    )
    polys = read_shapefile(spark, str(shp)).selectExpr(
        "monotonically_increasing_id() AS poly_id", "x_min", "x_max", "y_min", "y_max", "xs", "ys"
    )
    pts = spark.createDataFrame(
        [(0, 2.0, 2.0), (1, 7.0, 6.0), (2, 8.5, 8.5)], "pt_id int, x double, y double"
    )
    cand = point_in_bbox_join(pts, polys)
    hit = point_in_polygon_raycast(cand).where("contains").select("pt_id").collect()
    assert sorted(r["pt_id"] for r in hit) == [0, 1]  # pt 2 in bbox but outside triangle


def test_first_record_unset_cells_infer_from_later_rows(spark, tmp_path):
    """Schema inference must skip leading NULL cells: a .dbf whose
    FIRST record leaves its logical/numeric cells blank previously
    inferred StringType and crashed on the first non-null bool/int."""
    from demy_spark.shapefile import build_dbf_bytes, build_shp_bytes, read_shapefile

    shp = tmp_path / "z.shp"
    shp.write_bytes(build_shp_bytes([[SQUARE], [SQUARE]]))
    (tmp_path / "z.dbf").write_bytes(
        build_dbf_bytes(
            [("NAME", "C", 5), ("BIG", "L", 1), ("POP", "N", 6)],
            [["a", "", ""], ["b", "T", "42"]],
        )
    )
    rows = {r["NAME"]: r for r in read_shapefile(spark, str(shp)).collect()}
    assert rows["a"]["BIG"] is None and rows["a"]["POP"] is None
    assert rows["b"]["BIG"] is True and rows["b"]["POP"] == 42
