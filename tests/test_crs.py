"""CRS reprojection (demy_spark/crs.py) — the GeoTools transform twin
(GeoManager.scala:128-180): .prj WKT parsing, the Lambert Conformal
Conic 2SP closed form pinned against IGN's PUBLISHED Lambert-93
derived constants and a real-world Paris anchor, roundtrip fuzz, and
the read_shapefile integration (base_crs / transformed_to_wgs84 —
the reference's BaseCoordinateSystem / TransformedToWGS84 fields,
GeoManager.scala:60).
"""

from __future__ import annotations

import math
import warnings

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from demy_spark.crs import (
    LAMBERT93_WKT,
    WGS84_WKT,
    LambertConformalConic2SP,
    parse_wkt,
)

L93 = parse_wkt(LAMBERT93_WKT).projection

# ESRI writes the same projection with different parameter spellings
# and the standard parallels in the opposite order — both must parse
# to the identical transform (the cone constant is symmetric in the
# parallels).
ESRI_L93_WKT = (
    'PROJCS["RGF93_Lambert_93",GEOGCS["GCS_RGF_1993",'
    'DATUM["D_RGF_1993",SPHEROID["GRS_1980",6378137.0,298.257222101]],'
    'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
    'PROJECTION["Lambert_Conformal_Conic"],'
    'PARAMETER["False_Easting",700000.0],'
    'PARAMETER["False_Northing",6600000.0],'
    'PARAMETER["Central_Meridian",3.0],'
    'PARAMETER["Standard_Parallel_1",44.0],'
    'PARAMETER["Standard_Parallel_2",49.0],'
    'PARAMETER["Latitude_Of_Origin",46.5],UNIT["Meter",1.0]]'
)


def test_lambert93_derived_constants_match_ign_publication():
    """IGN publishes the Lambert-93 derived projection constants
    (NTG/ALG0054 note: n, C = a*F, Ys = FN + r0). The closed form must
    reproduce them — an independent anchor no roundtrip can fake."""
    n, F, r0 = L93._constants()
    assert n == pytest.approx(0.725607765053267, abs=1e-12)
    assert L93.a * F == pytest.approx(11754255.426096, abs=1e-3)
    assert L93.fn + r0 == pytest.approx(12655612.049876, abs=1e-3)


def test_origin_maps_to_false_origin_exactly():
    e, n = L93.forward(3.0, 46.5)
    assert e == pytest.approx(700000.0, abs=1e-6)
    assert n == pytest.approx(6600000.0, abs=1e-6)
    lon, lat = L93.inverse(700000.0, 6600000.0)
    assert lon == pytest.approx(3.0, abs=1e-9)
    assert lat == pytest.approx(46.5, abs=1e-9)


def test_paris_anchor():
    """Independent real-world anchor: central Paris is publicly known
    at ~(2.3522 E, 48.8566 N) WGS84 and ~(652469, 6862035) in
    Lambert-93 — catches swapped parameters, degree/radian mixups and
    axis-order errors that a self-consistent roundtrip would hide."""
    lon, lat = L93.inverse(652469.02, 6862035.26)
    assert lon == pytest.approx(2.3522, abs=1e-4)
    assert lat == pytest.approx(48.8566, abs=1e-4)


@settings(max_examples=200, deadline=None)
@given(
    lon=st.floats(min_value=-9.0, max_value=12.0),
    lat=st.floats(min_value=38.0, max_value=55.0),
)
def test_forward_inverse_roundtrip_fuzz(lon, lat):
    e, n = L93.forward(lon, lat)
    lon2, lat2 = L93.inverse(e, n)
    assert math.isclose(lon, lon2, abs_tol=1e-9)
    assert math.isclose(lat, lat2, abs_tol=1e-9)


def test_esri_spelling_parses_to_the_same_transform():
    esri = parse_wkt(ESRI_L93_WKT)
    assert esri.projection is not None
    for pt in [(652469.02, 6862035.26), (700000.0, 6600000.0)]:
        a = L93.inverse(*pt)
        b = esri.projection.inverse(*pt)
        assert a == pytest.approx(b, abs=1e-12)
    # no AUTHORITY node -> code falls back to the WKT name
    assert esri.code == "RGF93_Lambert_93"


def test_epsg_authority_code_extracted():
    info = parse_wkt(LAMBERT93_WKT)
    assert info.code == "EPSG:2154"
    assert not info.is_geographic and info.has_transform


def test_geographic_crs_is_identity_with_transform_flag():
    info = parse_wkt(WGS84_WKT)
    assert info.code == "EPSG:4326"
    assert info.is_geographic and info.has_transform
    assert info.to_wgs84(2.5, 48.5) == (2.5, 48.5)


def test_unknown_projection_warns_and_passes_through():
    wkt = (
        'PROJCS["Weird",GEOGCS["GCS",DATUM["D",'
        'SPHEROID["S",6378137.0,298.257]],PRIMEM["Greenwich",0.0],'
        'UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Sinusoidal"],'
        'PARAMETER["Central_Meridian",9.0],UNIT["Meter",1.0]]'
    )
    with pytest.warns(UserWarning, match="pass through"):
        info = parse_wkt(wkt)
    assert not info.has_transform
    assert info.code == "Weird"
    assert info.to_wgs84(10.0, 20.0) == (10.0, 20.0)


def test_lcc_missing_parameters_warns():
    wkt = (
        'PROJCS["Partial",GEOGCS["GCS",DATUM["D",'
        'SPHEROID["S",6378137.0,298.257]],PRIMEM["Greenwich",0.0],'
        'UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Lambert_Conformal_Conic_2SP"],'
        'PARAMETER["standard_parallel_1",44.0],UNIT["Meter",1.0]]'
    )
    with pytest.warns(UserWarning, match="missing parameters"):
        info = parse_wkt(wkt)
    assert not info.has_transform


def test_one_sp_degenerate_form():
    """Equal standard parallels collapse to the 1SP cone constant
    n = sin(lat1) (GN7-2's continuity property)."""
    one = LambertConformalConic2SP(
        a=6378137.0, inv_f=298.257222101,
        lat0=46.5, lon0=3.0, lat1=46.5, lat2=46.5,
        fe=0.0, fn=0.0,
    )
    n, _, _ = one._constants()
    assert n == pytest.approx(math.sin(math.radians(46.5)), abs=1e-12)
    lon, lat = one.inverse(*one.forward(4.0, 47.0))
    assert (lon, lat) == pytest.approx((4.0, 47.0), abs=1e-9)


# ---------------------------------------------------------------------------
# read_shapefile integration
# ---------------------------------------------------------------------------


def _write_fixture(tmp_path, rings_lambert, prj_text=None):
    from demy_spark.shapefile import build_dbf_bytes, build_shp_bytes

    shp = tmp_path / "zones.shp"
    shp.write_bytes(build_shp_bytes(rings_lambert))
    (tmp_path / "zones.dbf").write_bytes(
        build_dbf_bytes(
            [("NAME", "C", 8)], [[f"z{i}"] for i in range(len(rings_lambert))]
        )
    )
    if prj_text is not None:
        (tmp_path / "zones.prj").write_text(prj_text)
    return str(shp)


def _lambert_square(lon, lat, d=0.05):
    ring = [
        (lon - d, lat - d), (lon + d, lat - d),
        (lon + d, lat + d), (lon - d, lat + d), (lon - d, lat - d),
    ]
    return [[L93.forward(x, y) for x, y in ring]]


def test_read_shapefile_reprojects_lambert93(spark, tmp_path):
    import struct

    shp = _write_fixture(
        tmp_path,
        [_lambert_square(2.3522, 48.8566), _lambert_square(5.37, 43.30)],
        LAMBERT93_WKT,
    )
    from demy_spark.shapefile import read_shapefile

    rows = {r["NAME"]: r for r in read_shapefile(spark, shp).collect()}
    assert all(r["base_crs"] == "EPSG:2154" for r in rows.values())
    assert all(r["transformed_to_wgs84"] for r in rows.values())
    paris = rows["z0"]
    assert paris["x_min"] == pytest.approx(2.3522 - 0.05, abs=1e-9)
    assert paris["y_max"] == pytest.approx(48.8566 + 0.05, abs=1e-9)
    assert paris["xs"][0] == pytest.approx(2.3522 - 0.05, abs=1e-9)
    # the WKB is rebuilt from the TRANSFORMED ring, not the source one
    wkb = bytes(paris["geometry"])
    n_rings, n_pts = struct.unpack("<II", wkb[5:13])
    x0, y0 = struct.unpack("<dd", wkb[13:29])
    assert (n_rings, n_pts) == (1, 5)
    assert x0 == pytest.approx(2.3022, abs=1e-9)
    assert y0 == pytest.approx(48.8066, abs=1e-9)


def test_read_shapefile_without_prj_passes_through(spark, tmp_path):
    shp = _write_fixture(tmp_path, [_lambert_square(3.0, 46.5)], None)
    from demy_spark.shapefile import read_shapefile

    (row,) = read_shapefile(spark, shp).collect()
    assert row["base_crs"] == "Unknown"
    assert row["transformed_to_wgs84"] is False
    assert row["x_min"] > 10_000  # still metres


def test_read_shapefile_wgs84_prj_identity_but_flagged(spark, tmp_path):
    from demy_spark.shapefile import build_dbf_bytes, build_shp_bytes, read_shapefile

    ring = [(2.0, 48.0), (2.1, 48.0), (2.1, 48.1), (2.0, 48.1), (2.0, 48.0)]
    shp = tmp_path / "z.shp"
    shp.write_bytes(build_shp_bytes([[ring]]))
    (tmp_path / "z.dbf").write_bytes(build_dbf_bytes([("NAME", "C", 4)], [["a"]]))
    (tmp_path / "z.prj").write_text(WGS84_WKT)
    (row,) = read_shapefile(spark, str(shp)).collect()
    assert row["base_crs"] == "EPSG:4326"
    assert row["transformed_to_wgs84"] is True  # identity transform found
    assert row["x_min"] == 2.0 and row["y_max"] == 48.1


def test_read_shapefile_unknown_prj_warns_and_passes_through(spark, tmp_path):
    wkt = (
        'PROJCS["Mystery",GEOGCS["GCS",DATUM["D",'
        'SPHEROID["S",6378137.0,298.257]],PRIMEM["Greenwich",0.0],'
        'UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Robinson"],UNIT["Meter",1.0]]'
    )
    shp = _write_fixture(tmp_path, [_lambert_square(3.0, 46.5)], wkt)
    from demy_spark.shapefile import read_shapefile

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        (row,) = read_shapefile(spark, shp).collect()
    assert any("pass through" in str(w.message) for w in caught)
    assert row["base_crs"] == "Mystery"
    assert row["transformed_to_wgs84"] is False
    assert row["x_min"] > 10_000


def test_reproject_false_keeps_source_coordinates(spark, tmp_path):
    shp = _write_fixture(tmp_path, [_lambert_square(3.0, 46.5)], LAMBERT93_WKT)
    from demy_spark.shapefile import read_shapefile

    (row,) = read_shapefile(spark, shp, reproject=False).collect()
    assert row["base_crs"] == "EPSG:2154"
    assert row["transformed_to_wgs84"] is False
    assert row["x_min"] > 10_000


# ---------------------------------------------------------------------------
# Web Mercator (EPSG:3857) + prime-meridian guard (r9 second pass)
# ---------------------------------------------------------------------------


def test_web_mercator_published_constants():
    """The 3857 world square is a PUBLISHED constant: lon 180 maps to
    x = 20037508.342789244 m, and the square's top latitude
    85.05112878 maps back to the same value on y."""
    from demy_spark.crs import WEBMERCATOR_WKT

    info = parse_wkt(WEBMERCATOR_WKT)
    assert info.code == "EPSG:3857" and info.projection is not None
    m = info.projection
    x, y0 = m.forward(180.0, 0.0)
    assert x == pytest.approx(20037508.342789244, abs=1e-6)
    assert y0 == pytest.approx(0.0, abs=1e-6)
    _, y = m.forward(0.0, 85.05112878)
    assert y == pytest.approx(20037508.342789244, abs=1e-3)
    lon, lat = m.inverse(2775690.0, 8437650.0)  # ~ Helsinki-ish
    assert lon == pytest.approx(24.93, abs=0.01)
    assert lat == pytest.approx(60.17, abs=0.01)


@settings(max_examples=150, deadline=None)
@given(
    lon=st.floats(min_value=-179.9, max_value=179.9),
    lat=st.floats(min_value=-85.0, max_value=85.0),
)
def test_web_mercator_roundtrip_fuzz(lon, lat):
    from demy_spark.crs import WebMercator

    m = WebMercator()
    lon2, lat2 = m.inverse(*m.forward(lon, lat))
    assert math.isclose(lon, lon2, abs_tol=1e-9)
    assert math.isclose(lat, lat2, abs_tol=1e-9)


def test_esri_web_mercator_spelling():
    wkt = (
        'PROJCS["WGS_1984_Web_Mercator_Auxiliary_Sphere",'
        'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
        'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
        'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Mercator_Auxiliary_Sphere"],'
        'PARAMETER["False_Easting",0.0],'
        'PARAMETER["False_Northing",0.0],'
        'PARAMETER["Central_Meridian",0.0],'
        'PARAMETER["Auxiliary_Sphere_Type",0.0],UNIT["Meter",1.0]]'
    )
    info = parse_wkt(wkt)
    assert info.projection is not None
    x, _ = info.projection.forward(180.0, 0.0)
    assert x == pytest.approx(20037508.342789244, abs=1e-6)


def test_paris_prime_meridian_passes_through_loudly():
    """Legacy NTF WKTs sit on the Paris meridian: reprojecting without
    the meridian shift would be silently wrong by 2.33 deg — these
    must take the loud pass-through path instead (GEOGCS and PROJCS
    forms both)."""
    geo = (
        'GEOGCS["NTF (Paris)",DATUM["Nouvelle_Triangulation_Francaise_Paris",'
        'SPHEROID["Clarke 1880 (IGN)",6378249.2,293.4660212936269]],'
        'PRIMEM["Paris",2.33722917],'
        'UNIT["grad",0.01570796326794897],AUTHORITY["EPSG","4807"]]'
    )
    with pytest.warns(UserWarning, match="non-Greenwich"):
        info = parse_wkt(geo)
    assert not info.has_transform and info.code == "EPSG:4807"
    proj = (
        'PROJCS["NTF (Paris) / Lambert zone II",' + geo.rstrip("]")
        + ']],PROJECTION["Lambert_Conformal_Conic_2SP"],'
        'PARAMETER["standard_parallel_1",45.898918964419],'
        'PARAMETER["standard_parallel_2",47.696014502038],'
        'PARAMETER["latitude_of_origin",46.8],'
        'PARAMETER["central_meridian",0],'
        'PARAMETER["false_easting",600000],'
        'PARAMETER["false_northing",2200000],'
        'UNIT["metre",1],AUTHORITY["EPSG","27572"]]'
    )
    with pytest.warns(UserWarning, match="non-Greenwich"):
        info2 = parse_wkt(proj)
    assert not info2.has_transform and info2.code == "EPSG:27572"


def test_read_shapefile_web_mercator_roundtrip(spark, tmp_path):
    from demy_spark.crs import WEBMERCATOR_WKT, WebMercator
    from demy_spark.shapefile import read_shapefile

    m = WebMercator()
    ring = [(2.0, 48.0), (2.1, 48.0), (2.1, 48.1), (2.0, 48.1), (2.0, 48.0)]
    shp = _write_fixture(tmp_path, [[[m.forward(x, y) for x, y in ring]]],
                         WEBMERCATOR_WKT)
    (row,) = read_shapefile(spark, shp).collect()
    assert row["base_crs"] == "EPSG:3857"
    assert row["transformed_to_wgs84"] is True
    assert row["x_min"] == pytest.approx(2.0, abs=1e-9)
    assert row["y_max"] == pytest.approx(48.1, abs=1e-9)


# ---------------------------------------------------------------------------
# code-review r9 fixes
# ---------------------------------------------------------------------------


EPSG3395_WKT = (
    'PROJCS["WGS 84 / World Mercator",GEOGCS["WGS 84",'
    'DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],'
    'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
    'PROJECTION["Mercator_1SP"],PARAMETER["central_meridian",0],'
    'PARAMETER["scale_factor",1],PARAMETER["false_easting",0],'
    'PARAMETER["false_northing",0],UNIT["metre",1],'
    'AUTHORITY["EPSG","3395"]]'
)


def test_ellipsoidal_mercator_decodes_3395():
    """EPSG:3395 (World Mercator) is the ELLIPSOIDAL Mercator_1SP —
    it must decode through the ellipsoidal form, which differs from
    the spherical one by ~21 km (0.19 deg) at mid latitudes."""
    from demy_spark.crs import EllipsoidalMercator, WebMercator

    info = parse_wkt(EPSG3395_WKT)
    assert info.code == "EPSG:3395"
    assert isinstance(info.projection, EllipsoidalMercator)
    lon, lat = info.projection.inverse(0.0, 5_000_000.0)
    assert lon == 0.0
    assert lat == pytest.approx(41.1067, abs=2e-3)  # ellipsoidal value
    sph_lat = WebMercator().inverse(0.0, 5_000_000.0)[1]
    assert abs(lat - sph_lat) > 0.15  # genuinely not the spherical form
    # roundtrip through the same instance
    e, n = info.projection.forward(12.5, -33.9)
    assert info.projection.inverse(e, n) == pytest.approx(
        (12.5, -33.9), abs=1e-9
    )


def test_ellipsoidal_mercator_spherical_limit_matches_webmercator():
    """With eccentricity -> 0 the ellipsoidal form must converge to
    the INDEPENDENTLY implemented spherical WebMercator — a
    cross-implementation anchor no shared bug can fake."""
    from demy_spark.crs import EllipsoidalMercator, WebMercator

    em = EllipsoidalMercator(a=6378137.0, inv_f=1e12, lon0=0.0, k0=1.0)
    wm = WebMercator()
    for lon, lat in [(0.0, 0.0), (12.3, 41.0), (-70.0, -33.5), (150.0, 60.0)]:
        assert em.forward(lon, lat) == pytest.approx(
            wm.forward(lon, lat), abs=1e-3
        )
        e, n = wm.forward(lon, lat)
        assert em.inverse(e, n) == pytest.approx(wm.inverse(e, n), abs=1e-9)


def test_mercator_2sp_standard_parallel_scale():
    """2SP form: k0 = m(lat1). At the standard parallel the scale is
    true, so easting per degree of longitude equals the parallel's
    radius — and lat1=0 degenerates to the 1SP k0=1 form."""
    wkt = (
        'PROJCS["M2SP",GEOGCS["G",DATUM["D",'
        'SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],'
        'UNIT["degree",0.0174532925199433]],PROJECTION["Mercator_2SP"],'
        'PARAMETER["standard_parallel_1",42],'
        'PARAMETER["central_meridian",51],UNIT["metre",1]]'
    )
    info = parse_wkt(wkt)
    assert info.projection is not None and info.projection.k0 < 0.75
    e, n = info.projection.forward(53.0, 53.0)
    assert info.projection.inverse(e, n) == pytest.approx(
        (53.0, 53.0), abs=1e-9
    )


def test_mercator_1sp_with_3857_authority_decodes_spherically():
    wkt = (
        'PROJCS["Pseudo-Mercator",GEOGCS["WGS 84",'
        'DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],'
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Mercator_1SP"],PARAMETER["central_meridian",0],'
        'PARAMETER["scale_factor",1],UNIT["metre",1],'
        'AUTHORITY["EPSG","3857"]]'
    )
    info = parse_wkt(wkt)
    assert info.projection is not None
    assert info.projection.forward(180.0, 0.0)[0] == pytest.approx(
        20037508.342789244, abs=1e-6
    )


def test_mercator_non_unit_scale_factor_passes_through():
    """A zoned/ellipsoidal Mercator variant (Makassar / NEIEZ has
    scale_factor 0.997) must never be decoded spherically."""
    wkt = (
        'PROJCS["NEIEZ-like",GEOGCS["G",DATUM["D",'
        'SPHEROID["S",6378137,298.257223563]],PRIMEM["Greenwich",0],'
        'UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Popular Visualisation Pseudo Mercator"],'
        'PARAMETER["central_meridian",110],'
        'PARAMETER["scale_factor",0.997],UNIT["metre",1]]'
    )
    with pytest.warns(UserWarning, match="scale factor"):
        info = parse_wkt(wkt)
    assert not info.has_transform


def test_web_mercator_central_meridian_honored():
    from demy_spark.crs import WebMercator

    m = WebMercator(lon0=110.0)
    assert m.forward(110.0, 0.0) == pytest.approx((0.0, 0.0), abs=1e-9)
    assert m.inverse(0.0, 0.0) == pytest.approx((110.0, 0.0), abs=1e-12)


def test_quoted_names_with_brackets_and_commas_parse():
    wkt = (
        'GEOGCS["ED50 (with, commas) [brackets]",'
        'DATUM["European_Datum_1950",'
        'SPHEROID["International 1924",6378388,297]],'
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]'
    )
    info = parse_wkt(wkt)
    assert info.code == "ED50 (with, commas) [brackets]"
    assert info.is_geographic


def test_corrupt_prj_warns_and_passes_through(spark, tmp_path):
    """A malformed .prj must not abort ingestion (the reference prints
    and continues) — warn, base_crs='Unknown', source coordinates."""
    shp = _write_fixture(tmp_path, [_lambert_square(3.0, 46.5)], "not wkt at all")
    from demy_spark.shapefile import read_shapefile

    with pytest.warns(UserWarning, match="unparseable .prj"):
        (row,) = read_shapefile(spark, shp).collect()
    assert row["base_crs"] == "Unknown"
    assert row["transformed_to_wgs84"] is False
    assert row["x_min"] > 10_000


def test_lcc_constants_cached_per_instance():
    one = parse_wkt(LAMBERT93_WKT).projection
    assert one._konst is one._konst  # cached tuple, not re-derived


# ---------------------------------------------------------------------------
# Transverse Mercator / UTM
# ---------------------------------------------------------------------------

UTM31N_WKT = (
    'PROJCS["WGS 84 / UTM zone 31N",GEOGCS["WGS 84",'
    'DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],'
    'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
    'PROJECTION["Transverse_Mercator"],'
    'PARAMETER["latitude_of_origin",0],'
    'PARAMETER["central_meridian",3],'
    'PARAMETER["scale_factor",0.9996],'
    'PARAMETER["false_easting",500000],'
    'PARAMETER["false_northing",0],UNIT["metre",1],'
    'AUTHORITY["EPSG","32631"]]'
)


def test_meridian_quadrant_pins_the_arc_series():
    """The WGS84 meridian quadrant (equator to pole) is a PUBLISHED
    constant: 10 001 965.729 m — an independent anchor for the
    Snyder 3-21 arc series no roundtrip can fake."""
    from demy_spark.crs import TransverseMercator

    tm = parse_wkt(UTM31N_WKT).projection
    assert isinstance(tm, TransverseMercator)
    assert tm._m_arc(math.pi / 2) == pytest.approx(10_001_965.729, abs=0.01)


def test_utm_central_meridian_exactness():
    tm = parse_wkt(UTM31N_WKT).projection
    e, n = tm.forward(3.0, 46.5)
    assert e == pytest.approx(500_000.0, abs=1e-6)  # on the meridian
    # northing on the meridian is the scaled arc length exactly
    assert n == pytest.approx(0.9996 * tm._m_arc(math.radians(46.5)), abs=1e-6)
    assert tm.inverse(500_000.0, 5_000_000.0)[0] == pytest.approx(3.0, abs=1e-12)


def _spherical_tm(lon, lat, lon0, R=6378137.0, k0=1.0):
    """Closed-form SPHERICAL transverse Mercator (Snyder 8-5/8-6) —
    the independent cross-implementation for the e->0 limit."""
    lam = math.radians(lon - lon0)
    phi = math.radians(lat)
    B = math.cos(phi) * math.sin(lam)
    x = k0 * R * math.atanh(B)
    y = k0 * R * (math.atan2(math.tan(phi), math.cos(lam)))
    return x, y


def test_tm_spherical_limit_matches_closed_form():
    from demy_spark.crs import TransverseMercator

    tm = TransverseMercator(
        a=6378137.0, inv_f=1e12, lat0=0.0, lon0=9.0, k0=1.0
    )
    for lon, lat in [(9.0, 0.0), (10.5, 47.0), (7.2, -33.0), (11.9, 62.5)]:
        got = tm.forward(lon, lat)
        want = _spherical_tm(lon, lat, 9.0)
        # series truncation vs closed form: sub-mm at <=3 deg offsets
        assert got == pytest.approx(want, abs=2e-3)


@settings(max_examples=150, deadline=None)
@given(
    dlon=st.floats(min_value=-3.0, max_value=3.0),
    lat=st.floats(min_value=-80.0, max_value=80.0),
)
def test_tm_roundtrip_fuzz_inside_the_zone(dlon, lat):
    tm = parse_wkt(UTM31N_WKT).projection
    e, n = tm.forward(3.0 + dlon, lat)
    lon2, lat2 = tm.inverse(e, n)
    # the 6th-order series truncates at ~1.6e-8 deg (~1 mm) at the
    # zone edge + high latitude; 1e-6 deg (~10 cm) is the spec envelope
    assert math.isclose(3.0 + dlon, lon2, abs_tol=1e-6)
    assert math.isclose(lat, lat2, abs_tol=1e-6)


def test_read_shapefile_utm_roundtrip(spark, tmp_path):
    from demy_spark.shapefile import read_shapefile

    tm = parse_wkt(UTM31N_WKT).projection
    ring = [(2.0, 48.0), (2.1, 48.0), (2.1, 48.1), (2.0, 48.1), (2.0, 48.0)]
    shp = _write_fixture(
        tmp_path, [[[tm.forward(x, y) for x, y in ring]]], UTM31N_WKT
    )
    (row,) = read_shapefile(spark, shp).collect()
    assert row["base_crs"] == "EPSG:32631"
    assert row["transformed_to_wgs84"] is True
    assert row["x_min"] == pytest.approx(2.0, abs=1e-8)
    assert row["y_max"] == pytest.approx(48.1, abs=1e-8)


def test_tm_missing_central_meridian_passes_through():
    wkt = (
        'PROJCS["TMnoCM",GEOGCS["G",DATUM["D",'
        'SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],'
        'UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Transverse_Mercator"],UNIT["metre",1]]'
    )
    with pytest.warns(UserWarning, match="central_meridian"):
        info = parse_wkt(wkt)
    assert not info.has_transform


def test_lat_lon_axis_order_swaps_inputs():
    """EPSG-official WKTs can declare AXIS["Latitude"...] FIRST: the
    transform must swap inputs instead of silently transposing the
    world (the reference's CRS.getAxisOrder handling,
    GeoManager.scala:185-200)."""
    wkt = (
        'GEOGCS["WGS 84",DATUM["WGS_1984",'
        'SPHEROID["WGS 84",6378137,298.257223563]],'
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433],'
        'AXIS["Latitude",NORTH],AXIS["Longitude",EAST],'
        'AUTHORITY["EPSG","4326"]]'
    )
    info = parse_wkt(wkt)
    assert info.lat_lon_order and info.has_transform
    assert info.to_wgs84(48.8566, 2.3522) == (2.3522, 48.8566)
    # the GIS-order WKT (no AXIS nodes) must NOT swap
    assert not parse_wkt(WGS84_WKT).lat_lon_order


def test_read_shapefile_lat_lon_ordered_prj(spark, tmp_path):
    from demy_spark.shapefile import build_dbf_bytes, build_shp_bytes, read_shapefile

    wkt = (
        'GEOGCS["WGS 84",DATUM["WGS_1984",'
        'SPHEROID["WGS 84",6378137,298.257223563]],'
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433],'
        'AXIS["Latitude",NORTH],AXIS["Longitude",EAST],'
        'AUTHORITY["EPSG","4326"]]'
    )
    # vertices stored LAT-FIRST, as the axis order declares
    ring = [(48.0, 2.0), (48.0, 2.1), (48.1, 2.1), (48.1, 2.0), (48.0, 2.0)]
    shp = tmp_path / "z.shp"
    shp.write_bytes(build_shp_bytes([[ring]]))
    (tmp_path / "z.dbf").write_bytes(build_dbf_bytes([("NAME", "C", 4)], [["a"]]))
    (tmp_path / "z.prj").write_text(wkt)
    (row,) = read_shapefile(spark, str(shp)).collect()
    assert row["transformed_to_wgs84"] is True
    assert row["x_min"] == 2.0 and row["x_max"] == 2.1  # lon back in x
    assert row["y_min"] == 48.0 and row["y_max"] == 48.1


def test_sphere_based_spheroid_does_not_crash():
    """Legacy ESRI auxiliary-sphere WKTs write inverse flattening 0:
    e = 0 must degenerate the formulas (matching the independent
    spherical WebMercator), not ZeroDivisionError out of parse_wkt
    (code-review r9 second pass)."""
    from demy_spark.crs import WebMercator

    wkt = (
        'PROJCS["WGS_1984_Web_Mercator",'
        'GEOGCS["GCS_WGS_1984_Major_Auxiliary_Sphere",'
        'DATUM["D_WGS_1984_Major_Auxiliary_Sphere",'
        'SPHEROID["WGS_1984_Major_Auxiliary_Sphere",6378137.0,0.0]],'
        'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Mercator"],PARAMETER["Central_Meridian",0.0],'
        'PARAMETER["Standard_Parallel_1",0.0],UNIT["Meter",1.0]]'
    )
    info = parse_wkt(wkt)
    got = info.projection.inverse(0.0, 5_000_000.0)
    want = WebMercator().inverse(0.0, 5_000_000.0)
    assert got == pytest.approx(want, abs=1e-9)
    # sphere-based TM parses and roundtrips too
    tm = parse_wkt(wkt.replace('PROJECTION["Mercator"]',
                               'PROJECTION["Transverse_Mercator"]')).projection
    assert tm.inverse(*tm.forward(1.5, 45.0)) == pytest.approx(
        (1.5, 45.0), abs=1e-6
    )


def test_projected_axis_order_northing_first():
    """EPSG-official projected WKTs can declare AXIS[Northing] first
    (EPSG:2193 NZTM does): inputs must swap, or Wellington decodes to
    lon 677 (code-review r9 second pass; expected values confirmed
    against the published NZTM coordinates of Wellington)."""
    nztm = (
        'PROJCS["NZGD2000 / New Zealand Transverse Mercator 2000",'
        'GEOGCS["NZGD2000",DATUM["New_Zealand_Geodetic_Datum_2000",'
        'SPHEROID["GRS 1980",6378137,298.257222101]],'
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Transverse_Mercator"],'
        'PARAMETER["latitude_of_origin",0],'
        'PARAMETER["central_meridian",173],'
        'PARAMETER["scale_factor",0.9996],'
        'PARAMETER["false_easting",1600000],'
        'PARAMETER["false_northing",10000000],UNIT["metre",1],'
        'AXIS["Northing",NORTH],AXIS["Easting",EAST],'
        'AUTHORITY["EPSG","2193"]]'
    )
    info = parse_wkt(nztm)
    assert info.lat_lon_order
    lon, lat = info.to_wgs84(5_427_057.0, 1_749_263.0)  # N, E order
    assert lon == pytest.approx(174.7827, abs=1e-3)
    assert lat == pytest.approx(-41.2941, abs=1e-3)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet='ABCGEOPRS["],()0123456789._- \n', max_size=200))
def test_parse_wkt_never_escapes_valueerror(junk):
    """parse_wkt over arbitrary junk must return a CRSInfo or raise
    ValueError — the ONLY class read_shapefile's pass-through guard
    catches; any other escape (RecursionError on hostile deep nesting
    was real) would crash shapefile ingestion."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        try:
            parse_wkt(junk)
        except ValueError:
            pass


def test_parse_wkt_hostile_deep_nesting_raises_valueerror():
    deep = "A[" * 3000 + "0" + "]" * 3000
    with pytest.raises(ValueError, match="nesting"):
        parse_wkt(deep)


def test_lcc_axis_order_northing_first():
    """The LCC branch must honor AXIS[Northing]-first WKTs like every
    other projected branch (ADVICE r9: it was the one branch dropping
    lat_lon_order, so a northing-first Lambert WKT transposed
    coordinates). Feed the Paris anchor in (N, E) order and expect the
    same WGS84 answer the (E, N) test pins."""
    northing_first = LAMBERT93_WKT.replace(
        'UNIT["metre",1',
        'AXIS["Northing",NORTH],AXIS["Easting",EAST],UNIT["metre",1',
    )
    if "AXIS" not in northing_first:  # WKT layout drift guard
        northing_first = LAMBERT93_WKT[:-1] + ',AXIS["Northing",NORTH],AXIS["Easting",EAST]]'
    info = parse_wkt(northing_first)
    assert info.lat_lon_order, "LCC branch must parse axis order"
    lon, lat = info.to_wgs84(6862035.26, 652469.02)  # N, E order
    assert lon == pytest.approx(2.3522, abs=1e-4)
    assert lat == pytest.approx(48.8566, abs=1e-4)


def test_auxiliary_sphere_type_nonzero_passes_through():
    """ESRI Mercator_Auxiliary_Sphere with Auxiliary_Sphere_Type 1/2
    (authalic / rectifying sphere) decodes measurably differently from
    the type-0 semi-major-axis sphere — those variants must take the
    loud pass-through path, not silently decode as 3857 (ADVICE r9)."""
    base = (
        'PROJCS["WGS_1984_Web_Mercator_Auxiliary_Sphere",'
        'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
        'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
        'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Mercator_Auxiliary_Sphere"],'
        'PARAMETER["False_Easting",0.0],'
        'PARAMETER["False_Northing",0.0],'
        'PARAMETER["Central_Meridian",0.0],'
        'PARAMETER["Standard_Parallel_1",0.0],'
        'PARAMETER["Auxiliary_Sphere_Type",{t}],UNIT["Meter",1.0]]'
    )
    # type 0: decodes with the spherical WebMercator form as before
    info0 = parse_wkt(base.format(t="0.0"))
    assert info0.projection is not None
    for t in ("1.0", "2.0"):
        with pytest.warns(UserWarning, match="Auxiliary_Sphere_Type"):
            info = parse_wkt(base.format(t=t))
        assert info.projection is None and not info.is_geographic


# ETRS89-extended / LAEA Europe (EPSG:3035) — the Eurostat/Copernicus
# grid CRS (VERDICT r9 task 6); EPSG WKT1 spelling
LAEA_3035_WKT = (
    'PROJCS["ETRS89-extended / LAEA Europe",GEOGCS["ETRS89",'
    'DATUM["European_Terrestrial_Reference_System_1989",'
    'SPHEROID["GRS 1980",6378137,298.257222101]],'
    'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
    'PROJECTION["Lambert_Azimuthal_Equal_Area"],'
    'PARAMETER["latitude_of_origin",52],'
    'PARAMETER["central_meridian",10],'
    'PARAMETER["false_easting",4321000],'
    'PARAMETER["false_northing",3210000],UNIT["metre",1],'
    'AUTHORITY["EPSG","3035"]]'
)


def test_laea_epsg_guidance_note_sample_point():
    """EPSG Guidance Note 7-2's published worked example for the LAEA
    (method 9820) ETRS89/LAEA case: 50°N 5°E must map to
    E 3962799.45, N 2999718.85 — an anchor independent of this
    implementation."""
    info = parse_wkt(LAEA_3035_WKT)
    assert info.code == "EPSG:3035" and info.projection is not None
    e, n = info.projection.forward(5.0, 50.0)
    assert e == pytest.approx(3962799.45, abs=0.01)
    assert n == pytest.approx(2999718.85, abs=0.01)
    lon, lat = info.to_wgs84(e, n)
    assert lon == pytest.approx(5.0, abs=1e-8)
    assert lat == pytest.approx(50.0, abs=1e-7)


def test_laea_equal_area_property():
    """The projection's DEFINING property, checked numerically with no
    remembered constants: the Jacobian determinant of (E, N) w.r.t.
    (λ, φ) must equal the ellipsoidal area element
    a²(1−e²)cosφ/(1−e²sin²φ)² everywhere — any formula error (wrong q,
    swapped β₀ terms, bad D) breaks it immediately."""
    p = parse_wkt(LAEA_3035_WKT).projection
    h = 1e-6
    for lon, lat in ((5, 50), (25, 60), (-8, 38), (10, 52), (30, 70), (10.1, 52.05)):
        e1, n1 = p.forward(lon + h, lat)
        e0, n0 = p.forward(lon - h, lat)
        d_e_lam = (e1 - e0) / (2 * h * math.pi / 180)
        d_n_lam = (n1 - n0) / (2 * h * math.pi / 180)
        e1, n1 = p.forward(lon, lat + h)
        e0, n0 = p.forward(lon, lat - h)
        d_e_phi = (e1 - e0) / (2 * h * math.pi / 180)
        d_n_phi = (n1 - n0) / (2 * h * math.pi / 180)
        jac = abs(d_e_lam * d_n_phi - d_e_phi * d_n_lam)
        phi = math.radians(lat)
        e2 = p._e2
        want = p.a * p.a * (1 - e2) * math.cos(phi) / (1 - e2 * math.sin(phi) ** 2) ** 2
        assert jac == pytest.approx(want, rel=1e-6), (lon, lat)


@settings(max_examples=200, deadline=None)
@given(
    lon=st.floats(min_value=-25.0, max_value=45.0),
    lat=st.floats(min_value=30.0, max_value=72.0),
)
def test_laea_roundtrip_fuzz(lon, lat):
    """forward→inverse identity across the 3035 validity extent."""
    p = parse_wkt(LAEA_3035_WKT).projection
    got = p.inverse(*p.forward(lon, lat))
    assert got[0] == pytest.approx(lon, abs=1e-7)
    assert got[1] == pytest.approx(lat, abs=1e-7)


def test_laea_gdal_center_spelling_and_origin():
    """GDAL writes LAEA parameters latitude_of_center /
    longitude_of_center — must parse to the same transform; the exact
    projection origin (ρ→0, where the general inverse divides by ρ)
    must invert to (lon0, lat0)."""
    gdal = LAEA_3035_WKT.replace(
        '"latitude_of_origin"', '"latitude_of_center"'
    ).replace('"central_meridian"', '"longitude_of_center"')
    a = parse_wkt(LAEA_3035_WKT).projection
    b = parse_wkt(gdal).projection
    assert b.forward(5.0, 50.0) == pytest.approx(a.forward(5.0, 50.0), abs=1e-9)
    lon, lat = a.inverse(4321000.0, 3210000.0)
    assert (lon, lat) == pytest.approx((10.0, 52.0), abs=1e-9)


def test_laea_missing_parameters_warns():
    broken = LAEA_3035_WKT.replace('PARAMETER["latitude_of_origin",52],', "")
    with pytest.warns(UserWarning, match="LAEA projection .* missing"):
        info = parse_wkt(broken)
    assert info.projection is None


# NAD83 / Conus Albers (EPSG:5070) — USGS/Census CONUS products
ALBERS_5070_WKT = (
    'PROJCS["NAD83 / Conus Albers",GEOGCS["NAD83",'
    'DATUM["North_American_Datum_1983",'
    'SPHEROID["GRS 1980",6378137,298.257222101]],'
    'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
    'PROJECTION["Albers_Conic_Equal_Area"],'
    'PARAMETER["latitude_of_center",23],'
    'PARAMETER["longitude_of_center",-96],'
    'PARAMETER["standard_parallel_1",29.5],'
    'PARAMETER["standard_parallel_2",45.5],'
    'PARAMETER["false_easting",0],'
    'PARAMETER["false_northing",0],UNIT["metre",1],'
    'AUTHORITY["EPSG","5070"]]'
)


def test_albers_snyder_published_example():
    """Snyder (USGS PP 1395, the public-domain projection reference)
    publishes the ellipsoidal Albers worked example on Clarke 1866
    (parallels 29.5/45.5, origin 23N 96W): 35N 75W must map to
    x=1885472.7, y=1535925.0 — an anchor independent of this
    implementation."""
    from demy_spark.crs import AlbersEqualAreaConic

    p = AlbersEqualAreaConic(
        a=6378206.4, inv_f=294.9786982,
        lat0=23.0, lon0=-96.0, lat1=29.5, lat2=45.5,
    )
    x, y = p.forward(-75.0, 35.0)
    assert x == pytest.approx(1885472.7, abs=0.5)
    assert y == pytest.approx(1535925.0, abs=0.5)
    lon, lat = p.inverse(x, y)
    assert lon == pytest.approx(-75.0, abs=1e-7)
    assert lat == pytest.approx(35.0, abs=1e-7)


def test_albers_equal_area_property():
    """Constant-free anchor: the Jacobian of (E, N) must equal the
    ellipsoidal area element everywhere in the CONUS extent."""
    p = parse_wkt(ALBERS_5070_WKT).projection
    assert p is not None
    h = 1e-6
    for lon, lat in ((-75, 35), (-120, 40), (-96, 23), (-85, 50)):
        e1, n1 = p.forward(lon + h, lat)
        e0, n0 = p.forward(lon - h, lat)
        a1 = (e1 - e0) / (2 * h * math.pi / 180)
        a2 = (n1 - n0) / (2 * h * math.pi / 180)
        e1, n1 = p.forward(lon, lat + h)
        e0, n0 = p.forward(lon, lat - h)
        b1 = (e1 - e0) / (2 * h * math.pi / 180)
        b2 = (n1 - n0) / (2 * h * math.pi / 180)
        jac = abs(a1 * b2 - b1 * a2)
        phi = math.radians(lat)
        e2 = p._laea._e2
        want = (
            p.a * p.a * (1 - e2) * math.cos(phi)
            / (1 - e2 * math.sin(phi) ** 2) ** 2
        )
        assert jac == pytest.approx(want, rel=1e-6), (lon, lat)


@settings(max_examples=200, deadline=None)
@given(
    lon=st.floats(min_value=-125.0, max_value=-66.0),
    lat=st.floats(min_value=24.0, max_value=50.0),
)
def test_albers_roundtrip_fuzz(lon, lat):
    p = parse_wkt(ALBERS_5070_WKT).projection
    got = p.inverse(*p.forward(lon, lat))
    assert got[0] == pytest.approx(lon, abs=1e-7)
    assert got[1] == pytest.approx(lat, abs=1e-7)


def test_albers_southern_cone_and_one_parallel():
    """n < 0 (both parallels in the southern hemisphere) flips the
    inverse's ρ/atan2 signs — roundtrip must still hold; a single
    standard parallel degenerates to the 1SP cone (n = sin φ1)."""
    from demy_spark.crs import AlbersEqualAreaConic

    south = AlbersEqualAreaConic(
        a=6378137.0, inv_f=298.257222101,
        lat0=-32.0, lon0=-60.0, lat1=-5.0, lat2=-42.0,
    )
    for lon, lat in ((-58.4, -34.6), (-70.7, -33.5), (-47.9, -15.8)):
        got = south.inverse(*south.forward(lon, lat))
        assert got == pytest.approx((lon, lat), abs=1e-7)
    one = AlbersEqualAreaConic(
        a=6378137.0, inv_f=298.257222101,
        lat0=40.0, lon0=0.0, lat1=40.0, lat2=40.0,
    )
    assert one._n == pytest.approx(math.sin(math.radians(40.0)), abs=1e-9)
    got = one.inverse(*one.forward(5.0, 45.0))
    assert got == pytest.approx((5.0, 45.0), abs=1e-7)


def test_albers_missing_parameters_warns():
    broken = ALBERS_5070_WKT.replace(
        'PARAMETER["standard_parallel_1",29.5],', ""
    )
    with pytest.warns(UserWarning, match="Albers projection .* missing"):
        info = parse_wkt(broken)
    assert info.projection is None


def test_laea_polar_aspect_exact():
    """EASE-Grid-style polar WKTs (lat0 = ±90) must take Snyder's
    exact polar equations — the oblique form's D degenerates at the
    poles into a ratio of floating-point residues (~7 km of silent
    error at 70N, found by the r10 review). Pinned against the
    closed-form polar ρ = a·sqrt(qP − q), the equal-area Jacobian,
    and south-polar roundtrips."""
    from demy_spark.crs import LambertAzimuthalEqualArea

    p = LambertAzimuthalEqualArea(
        a=6378137.0, inv_f=298.257223563, lat0=90.0, lon0=0.0
    )
    q70 = p._q(math.radians(70.0))
    rho = p.a * math.sqrt(p._qp - q70)
    e, n = p.forward(45.0, 70.0)
    assert e == pytest.approx(rho * math.sin(math.radians(45.0)), abs=1e-6)
    assert n == pytest.approx(-rho * math.cos(math.radians(45.0)), abs=1e-6)
    assert p.inverse(e, n) == pytest.approx((45.0, 70.0), abs=1e-7)
    assert p.forward(123.0, 90.0) == pytest.approx((0.0, 0.0), abs=1e-6)
    assert p.inverse(0.0, 0.0) == pytest.approx((0.0, 90.0), abs=1e-9)
    # equal-area property holds on the polar branch too
    h = 1e-6
    for lon, lat in ((45, 70), (0, 85), (-100, 60)):
        e1, n1 = p.forward(lon + h, lat)
        e0, n0 = p.forward(lon - h, lat)
        a1 = (e1 - e0) / (2 * h * math.pi / 180)
        a2 = (n1 - n0) / (2 * h * math.pi / 180)
        e1, n1 = p.forward(lon, lat + h)
        e0, n0 = p.forward(lon, lat - h)
        b1 = (e1 - e0) / (2 * h * math.pi / 180)
        b2 = (n1 - n0) / (2 * h * math.pi / 180)
        jac = abs(a1 * b2 - b1 * a2)
        phi = math.radians(lat)
        e2 = p._e2
        want = (
            p.a * p.a * (1 - e2) * math.cos(phi)
            / (1 - e2 * math.sin(phi) ** 2) ** 2
        )
        assert jac == pytest.approx(want, rel=1e-6), (lon, lat)
    south = LambertAzimuthalEqualArea(
        a=6378137.0, inv_f=298.257223563, lat0=-90.0, lon0=0.0
    )
    for lon, lat in ((45, -70), (-120, -80), (10, -55)):
        got = south.inverse(*south.forward(lon, lat))
        assert got == pytest.approx((lon, lat), abs=1e-7)


def test_laea_antipode_returns_inf_not_crash():
    """The antipode of the projection origin sits on the unbounded
    bounding circle: out-of-extent vertices must map to infinities,
    never raise mid-ingest (review r10)."""
    p = parse_wkt(LAEA_3035_WKT).projection
    e, n = p.forward(-170.0, -52.0)
    assert math.isinf(e) and math.isinf(n)


def test_albers_degenerate_parallels_pass_through():
    """Symmetric standard parallels (lat2 = -lat1) give cone constant
    n = 0 — the WKT must warn and pass through instead of returning a
    projection that divides by zero on first use (review r10)."""
    degenerate = ALBERS_5070_WKT.replace(
        '"standard_parallel_1",29.5', '"standard_parallel_1",-45.5'
    )
    with pytest.warns(UserWarning, match="degenerate"):
        info = parse_wkt(degenerate)
    assert info.projection is None and not info.has_transform


def test_laea_polar_wkt_parses_to_polar_branch():
    """An EASE-Grid 2.0 North WKT (EPSG:6933-family, lat0=90) must
    wire parse_wkt into the polar branch — the parse-level twin of the
    direct-construction polar test."""
    ease = (
        'PROJCS["WGS 84 / NSIDC EASE-Grid 2.0 North",GEOGCS["WGS 84",'
        'DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],'
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Lambert_Azimuthal_Equal_Area"],'
        'PARAMETER["latitude_of_origin",90],'
        'PARAMETER["central_meridian",0],'
        'PARAMETER["false_easting",0],'
        'PARAMETER["false_northing",0],UNIT["metre",1],'
        'AUTHORITY["EPSG","6931"]]'
    )
    info = parse_wkt(ease)
    assert info.code == "EPSG:6931" and info.projection is not None
    assert info.projection._polar == 1
    q70 = info.projection._q(math.radians(70.0))
    rho = info.projection.a * math.sqrt(info.projection._qp - q70)
    e, n = info.projection.forward(45.0, 70.0)
    assert (e, n) == pytest.approx(
        (rho * math.sin(math.radians(45.0)), -rho * math.cos(math.radians(45.0))),
        abs=1e-6,
    )


def test_read_shapefile_laea_roundtrip(spark, tmp_path):
    """End-to-end: a shapefile carrying a 3035 .prj must land in
    WGS84 with base_crs preserved — the integration twin the other
    five families already have."""
    from demy_spark.shapefile import read_shapefile

    laea = parse_wkt(LAEA_3035_WKT).projection
    ring = [(5.0, 50.0), (5.1, 50.0), (5.1, 50.1), (5.0, 50.1), (5.0, 50.0)]
    shp = _write_fixture(
        tmp_path, [[[laea.forward(x, y) for x, y in ring]]], LAEA_3035_WKT
    )
    (row,) = read_shapefile(spark, shp).collect()
    assert row["base_crs"] == "EPSG:3035"
    assert row["transformed_to_wgs84"] is True
    assert row["x_min"] == pytest.approx(5.0, abs=1e-8)
    assert row["y_max"] == pytest.approx(50.1, abs=1e-8)
