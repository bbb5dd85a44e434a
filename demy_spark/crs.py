"""Coordinate reference systems: ``.prj`` WKT parsing and closed-form
reprojection to WGS84 for shapefile ingestion.

Re-expresses the reference's GeoTools CRS lookup + transform
(``geo/src/main/scala/GeoManager.scala:128-180``: decode the
shapefile's CRS, ``CRS.findMathTransform(fileCRS, WGS84)``, transform
every geometry, and emit ``BaseCoordinateSystem`` /
``TransformedToWGS84`` columns, ``GeoManager.scala:60``) without any
native geo library: a minimal WKT-1 parser over the ``.prj`` sidecar
plus the closed-form Lambert Conformal Conic (2SP) inverse from the
public EPSG Guidance Note 7-2 — which covers EPSG:2154 (RGF93 /
Lambert-93), the CRS the reference's actual IRIS shapefiles ship in —
the spherical Web/Pseudo-Mercator inverse (EPSG:3857, the projection
scraped web geodata usually arrives in), the ellipsoidal Mercator
(EPSG:3395 World Mercator, 1SP/2SP variants) and Transverse Mercator
(EPSG method 9807 — every UTM zone; Snyder PP-1395 series, pinned on
the published WGS84 meridian quadrant). Legacy WKTs on a
non-Greenwich prime meridian (NTF/Paris) warn and pass through
rather than reproject silently wrong by degrees.

Datum note: RGF93 is ITRS-based and agrees with WGS84 at the
sub-meter level, so — like the reference's ``lenient`` GeoTools
transform — no datum shift is applied; the transform is the map
projection inverse on the source ellipsoid. Unknown projections are
flagged loudly (``warnings.warn``) and pass through untransformed,
matching the reference's "Cannot write transformation for CRS"
print-and-continue path.

Everything here is driver-side by design: shapefiles are broadcast
dimension tables (IRIS ~50k polygons); the 100 TB side is points.
"""

from __future__ import annotations

import functools
import math
import re
import warnings
from dataclasses import dataclass

__all__ = [
    "CRSInfo",
    "EllipsoidalMercator",
    "LambertConformalConic2SP",
    "TransverseMercator",
    "WebMercator",
    "parse_wkt",
    "LAMBERT93_WKT",
    "WEBMERCATOR_WKT",
    "WGS84_WKT",
]

# Public EPSG-registry WKT-1 for RGF93 / Lambert-93 (EPSG:2154) and
# WGS84 (EPSG:4326) — used by tests and fixture writers as the .prj
# sidecar text a real IGN download carries.
LAMBERT93_WKT = (
    'PROJCS["RGF93 / Lambert-93",'
    'GEOGCS["RGF93",'
    'DATUM["Reseau_Geodesique_Francais_1993",'
    'SPHEROID["GRS 1980",6378137,298.257222101,'
    'AUTHORITY["EPSG","7019"]],'
    'AUTHORITY["EPSG","6171"]],'
    'PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],'
    'UNIT["degree",0.0174532925199433,AUTHORITY["EPSG","9122"]],'
    'AUTHORITY["EPSG","4171"]],'
    'PROJECTION["Lambert_Conformal_Conic_2SP"],'
    'PARAMETER["standard_parallel_1",49],'
    'PARAMETER["standard_parallel_2",44],'
    'PARAMETER["latitude_of_origin",46.5],'
    'PARAMETER["central_meridian",3],'
    'PARAMETER["false_easting",700000],'
    'PARAMETER["false_northing",6600000],'
    'UNIT["metre",1,AUTHORITY["EPSG","9001"]],'
    'AUTHORITY["EPSG","2154"]]'
)

# Public EPSG-registry WKT-1 for WGS 84 / Pseudo-Mercator (EPSG:3857)
WEBMERCATOR_WKT = (
    'PROJCS["WGS 84 / Pseudo-Mercator",'
    'GEOGCS["WGS 84",DATUM["WGS_1984",'
    'SPHEROID["WGS 84",6378137,298.257223563,'
    'AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],'
    'PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],'
    'UNIT["degree",0.0174532925199433,AUTHORITY["EPSG","9122"]],'
    'AUTHORITY["EPSG","4326"]],'
    'PROJECTION["Popular Visualisation Pseudo Mercator"],'
    'PARAMETER["central_meridian",0],'
    'PARAMETER["scale_factor",1],'
    'PARAMETER["false_easting",0],'
    'PARAMETER["false_northing",0],'
    'UNIT["metre",1,AUTHORITY["EPSG","9001"]],'
    'AUTHORITY["EPSG","3857"]]'
)

WGS84_WKT = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",'
    'SPHEROID["WGS 84",6378137,298.257223563,'
    'AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],'
    'PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],'
    'UNIT["degree",0.0174532925199433,AUTHORITY["EPSG","9122"]],'
    'AUTHORITY["EPSG","4326"]]'
)


@dataclass(frozen=True)
class LambertConformalConic2SP:
    """Lambert Conformal Conic (2SP) on an ellipsoid — forward and
    inverse from the public EPSG Guidance Note 7-2 formulas.

    Angles in degrees, lengths in the projection unit (metres for
    EPSG:2154). The derived constants (``n``, ``a*F``, ``fn + r0``)
    are pinned in tests against IGN's published Lambert-93 values."""

    a: float  # semi-major axis
    inv_f: float  # inverse flattening
    lat0: float  # latitude of origin (deg)
    lon0: float  # central meridian (deg)
    lat1: float  # standard parallel 1 (deg)
    lat2: float  # standard parallel 2 (deg)
    fe: float  # false easting
    fn: float  # false northing

    # cached_property writes straight into __dict__, which frozen
    # dataclasses allow: the derived constants depend only on frozen
    # fields and forward/inverse run ONCE PER VERTEX during
    # reprojection (millions of calls at IRIS scale — re-deriving the
    # log/pow/sqrt constants per vertex multiplied driver time;
    # code-review r9)
    @functools.cached_property
    def _e(self) -> float:
        if self.inv_f <= 0:  # sphere (legacy auxiliary-sphere WKTs
            return 0.0  # write inverse flattening 0): e = 0 degenerates
        f = 1.0 / self.inv_f  # every formula correctly
        return math.sqrt(2 * f - f * f)

    def _m(self, phi: float) -> float:
        e = self._e
        return math.cos(phi) / math.sqrt(1 - (e * math.sin(phi)) ** 2)

    def _t(self, phi: float) -> float:
        e = self._e
        es = e * math.sin(phi)
        return math.tan(math.pi / 4 - phi / 2) / ((1 - es) / (1 + es)) ** (e / 2)

    @functools.cached_property
    def _konst(self) -> tuple[float, float, float]:
        return self._constants()

    def _constants(self) -> tuple[float, float, float]:
        """(n, F, r0) per GN7-2: n from the two standard parallels, F
        the cone constant, r0 the radius at the latitude of origin."""
        p1, p2, p0 = (
            math.radians(self.lat1),
            math.radians(self.lat2),
            math.radians(self.lat0),
        )
        m1, m2 = self._m(p1), self._m(p2)
        t1, t2, t0 = self._t(p1), self._t(p2), self._t(p0)
        if abs(self.lat1 - self.lat2) < 1e-12:
            n = math.sin(p1)  # 1SP degenerate form
        else:
            n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
        F = m1 / (n * t1**n)
        r0 = self.a * F * t0**n
        return n, F, r0

    def forward(self, lon: float, lat: float) -> tuple[float, float]:
        """(lon, lat) degrees → (easting, northing)."""
        n, F, r0 = self._konst
        t = self._t(math.radians(lat))
        r = self.a * F * t**n
        theta = n * math.radians(lon - self.lon0)
        return self.fe + r * math.sin(theta), self.fn + r0 - r * math.cos(theta)

    def inverse(self, e_coord: float, n_coord: float) -> tuple[float, float]:
        """(easting, northing) → (lon, lat) degrees; iterative latitude
        recovery converging to <1e-12 rad (~4 iterations)."""
        n, F, r0 = self._konst
        x = e_coord - self.fe
        y = r0 - (n_coord - self.fn)
        r = math.copysign(math.hypot(x, y), n)
        t = (r / (self.a * F)) ** (1.0 / n)
        theta = math.atan2(x, y)
        lon = math.degrees(theta / n + math.radians(self.lon0))
        return lon, math.degrees(self._phi_from_t(t))

    def _phi_from_t(self, t: float) -> float:
        """Latitude (radians) from the isometric-latitude parameter t
        — the GN7-2 fixed-point iteration shared by every conformal
        inverse here (Lambert and ellipsoidal Mercator)."""
        e = self._e
        phi = math.pi / 2 - 2 * math.atan(t)
        for _ in range(15):
            es = e * math.sin(phi)
            phi_next = math.pi / 2 - 2 * math.atan(
                t * ((1 - es) / (1 + es)) ** (e / 2)
            )
            if abs(phi_next - phi) < 1e-12:
                phi = phi_next
                break
            phi = phi_next
        return phi


@dataclass(frozen=True)
class WebMercator:
    """Spherical Web/Pseudo Mercator (EPSG:3857) — the projection
    web tiles and most scraped geodata ship in. Closed form on the
    WGS84 sphere radius (the EPSG 1024 method): x = R*(lon - lon0),
    y = R*ln(tan(pi/4 + lat/2)). SPHERICAL only — parse_wkt routes
    ellipsoidal Mercator CRSs (EPSG:3395 etc.) to the loud
    pass-through path instead (code-review r9: decoding those with
    the spherical form is ~21 km wrong at mid latitudes)."""

    a: float = 6378137.0
    lon0: float = 0.0
    fe: float = 0.0
    fn: float = 0.0

    def forward(self, lon: float, lat: float) -> tuple[float, float]:
        x = self.fe + self.a * math.radians(lon - self.lon0)
        y = self.fn + self.a * math.log(math.tan(math.pi / 4 + math.radians(lat) / 2))
        return x, y

    def inverse(self, e_coord: float, n_coord: float) -> tuple[float, float]:
        lon = self.lon0 + math.degrees((e_coord - self.fe) / self.a)
        lat = math.degrees(
            2 * math.atan(math.exp((n_coord - self.fn) / self.a)) - math.pi / 2
        )
        return lon, lat


@dataclass(frozen=True)
class EllipsoidalMercator:
    """Ellipsoidal Mercator (EPSG methods 9804 '1SP' / 9805 '2SP' —
    EPSG:3395 World Mercator and the zoned NEIEZ-style variants).
    Shares the isometric-latitude ``t`` function with the Lambert
    implementation (the function the IGN Lambert-93 constants pin):
    E = FE + a*k0*(lon-lon0), N = FN - a*k0*ln(t(lat)); the inverse
    latitude iteration is the Lambert one with r/t swapped for
    exp(-N'/(a*k0)). For 2SP, k0 = m(lat1) derived from the standard
    parallel."""

    a: float
    inv_f: float
    lon0: float
    k0: float
    fe: float = 0.0
    fn: float = 0.0

    @functools.cached_property
    def _lcc(self) -> LambertConformalConic2SP:
        # host for the shared _e/_t/_m helpers (angles-only use)
        return LambertConformalConic2SP(
            a=self.a, inv_f=self.inv_f, lat0=0.0, lon0=self.lon0,
            lat1=30.0, lat2=60.0, fe=0.0, fn=0.0,
        )

    def forward(self, lon: float, lat: float) -> tuple[float, float]:
        t = self._lcc._t(math.radians(lat))
        x = self.fe + self.a * self.k0 * math.radians(lon - self.lon0)
        return x, self.fn - self.a * self.k0 * math.log(t)

    def inverse(self, e_coord: float, n_coord: float) -> tuple[float, float]:
        lon = self.lon0 + math.degrees(
            (e_coord - self.fe) / (self.a * self.k0)
        )
        t = math.exp(-(n_coord - self.fn) / (self.a * self.k0))
        return lon, math.degrees(self._lcc._phi_from_t(t))


@dataclass(frozen=True)
class TransverseMercator:
    """Transverse Mercator (EPSG method 9807 — every UTM zone and
    most national grids). Series forms from the public-domain USGS
    Professional Paper 1395 (Snyder) eqs 3-21/8-9..8-25 — accurate to
    well under a millimetre inside a UTM zone's +-3 deg validity.
    Independent anchors in tests: the published WGS84 meridian
    quadrant (10 001 965.729 m) pins the arc series, and the e->0
    limit must match a separately implemented closed-form SPHERICAL
    transverse Mercator."""

    a: float
    inv_f: float
    lat0: float
    lon0: float
    k0: float
    fe: float = 0.0
    fn: float = 0.0

    @functools.cached_property
    def _e2(self) -> float:
        if self.inv_f <= 0:  # sphere: the series degenerate correctly
            return 0.0
        f = 1.0 / self.inv_f
        return 2 * f - f * f

    # frozen-field-only constants, cached off the per-vertex hot path
    # (the LCC cached_property rationale, code-review r9 second pass)
    @functools.cached_property
    def _ep2(self) -> float:
        return self._e2 / (1 - self._e2)

    @functools.cached_property
    def _m0(self) -> float:
        return self._m_arc(math.radians(self.lat0))

    @functools.cached_property
    def _mu_den(self) -> float:
        e2 = self._e2
        return self.a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2**3 / 256)

    @functools.cached_property
    def _e1(self) -> float:
        se = math.sqrt(1 - self._e2)
        return (1 - se) / (1 + se)

    def _m_arc(self, phi: float) -> float:
        """Meridian arc length from the equator (Snyder 3-21)."""
        e2 = self._e2
        e4, e6 = e2 * e2, e2 * e2 * e2
        return self.a * (
            (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
            - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * phi)
            + (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * phi)
            - (35 * e6 / 3072) * math.sin(6 * phi)
        )

    def forward(self, lon: float, lat: float) -> tuple[float, float]:
        e2 = self._e2
        ep2 = self._ep2
        phi = math.radians(lat)
        lam = math.radians(lon - self.lon0)
        sin_p, cos_p = math.sin(phi), math.cos(phi)
        nu = self.a / math.sqrt(1 - e2 * sin_p * sin_p)
        T = math.tan(phi) ** 2
        C = ep2 * cos_p * cos_p
        A = lam * cos_p
        M = self._m_arc(phi)
        M0 = self._m0
        x = self.k0 * nu * (
            A
            + (1 - T + C) * A**3 / 6
            + (5 - 18 * T + T * T + 72 * C - 58 * ep2) * A**5 / 120
        )
        y = self.k0 * (
            M
            - M0
            + nu
            * math.tan(phi)
            * (
                A * A / 2
                + (5 - T + 9 * C + 4 * C * C) * A**4 / 24
                + (61 - 58 * T + T * T + 600 * C - 330 * ep2) * A**6 / 720
            )
        )
        return self.fe + x, self.fn + y

    def inverse(self, e_coord: float, n_coord: float) -> tuple[float, float]:
        e2 = self._e2
        ep2 = self._ep2
        x = e_coord - self.fe
        y = n_coord - self.fn
        M = self._m0 + y / self.k0
        mu = M / self._mu_den
        e1 = self._e1
        phi1 = (
            mu
            + (3 * e1 / 2 - 27 * e1**3 / 32) * math.sin(2 * mu)
            + (21 * e1 * e1 / 16 - 55 * e1**4 / 32) * math.sin(4 * mu)
            + (151 * e1**3 / 96) * math.sin(6 * mu)
            + (1097 * e1**4 / 512) * math.sin(8 * mu)
        )
        sin1, cos1 = math.sin(phi1), math.cos(phi1)
        C1 = ep2 * cos1 * cos1
        T1 = math.tan(phi1) ** 2
        nu1 = self.a / math.sqrt(1 - e2 * sin1 * sin1)
        rho1 = self.a * (1 - e2) / (1 - e2 * sin1 * sin1) ** 1.5
        D = x / (nu1 * self.k0)
        phi = phi1 - (nu1 * math.tan(phi1) / rho1) * (
            D * D / 2
            - (5 + 3 * T1 + 10 * C1 - 4 * C1 * C1 - 9 * ep2) * D**4 / 24
            + (
                61
                + 90 * T1
                + 298 * C1
                + 45 * T1 * T1
                - 252 * ep2
                - 3 * C1 * C1
            )
            * D**6
            / 720
        )
        lam = (
            D
            - (1 + 2 * T1 + C1) * D**3 / 6
            + (5 - 2 * C1 + 28 * T1 - 3 * C1 * C1 + 8 * ep2 + 24 * T1 * T1)
            * D**5
            / 120
        ) / cos1
        return self.lon0 + math.degrees(lam), math.degrees(phi)


@dataclass(frozen=True)
class LambertAzimuthalEqualArea:
    """Lambert Azimuthal Equal Area on an ellipsoid (EPSG method 9820
    — EPSG:3035 ETRS89-extended / LAEA Europe, the projection Eurostat
    grids and Copernicus products ship in). Forward and inverse from
    the public EPSG Guidance Note 7-2 formulas (authalic latitude q/β,
    Rq, D, B) with the standard series for the inverse authalic
    latitude. Independent anchors in tests: the EPSG guidance-note
    sample point for ETRS89/LAEA, and the EQUAL-AREA property itself —
    the numeric Jacobian of (E, N) must equal the ellipsoidal area
    element a²(1−e²)cosφ/(1−e²sin²φ)² at every probe point, a check
    that holds only if the math is right and depends on no remembered
    constants.

    Angles in degrees, lengths in the projection unit (metres for
    3035). ``lat0``/``lon0`` are the latitude/longitude of origin
    (52°N, 10°E for Europe)."""

    a: float
    inv_f: float
    lat0: float
    lon0: float
    fe: float = 0.0
    fn: float = 0.0

    @functools.cached_property
    def _e2(self) -> float:
        if self.inv_f <= 0:  # sphere: q degenerates to 2 sinφ
            return 0.0
        f = 1.0 / self.inv_f
        return 2 * f - f * f

    @functools.cached_property
    def _e(self) -> float:
        return math.sqrt(self._e2)

    def _q(self, phi: float) -> float:
        """Authalic-latitude kernel q(φ) (GN7-2)."""
        e, e2 = self._e, self._e2
        s = math.sin(phi)
        if e == 0.0:
            return 2.0 * s
        return (1 - e2) * (
            s / (1 - e2 * s * s)
            - (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s))
        )

    @functools.cached_property
    def _qp(self) -> float:
        return self._q(math.pi / 2)

    @functools.cached_property
    def _rq(self) -> float:
        return self.a * math.sqrt(self._qp / 2)

    @functools.cached_property
    def _polar(self) -> int:
        """+1 north-polar aspect, -1 south-polar, 0 oblique. The
        oblique form's D degenerates at the poles (cos φ0 / cos β0 is
        a ratio of floating-point residues there — measured ~7 km of
        silent error for EASE-Grid-style lat0=90 WKTs, code-review
        r10), so polar aspects take Snyder's exact polar equations."""
        if abs(self.lat0 - 90.0) < 1e-9:
            return 1
        if abs(self.lat0 + 90.0) < 1e-9:
            return -1
        return 0

    @functools.cached_property
    def _beta0(self) -> float:
        return math.asin(
            max(-1.0, min(1.0, self._q(math.radians(self.lat0)) / self._qp))
        )

    @functools.cached_property
    def _d(self) -> float:
        phi0 = math.radians(self.lat0)
        return (
            self.a
            * (math.cos(phi0) / math.sqrt(1 - self._e2 * math.sin(phi0) ** 2))
            / (self._rq * math.cos(self._beta0))
        )

    def _phi_from_beta(self, beta_p: float) -> float:
        e2 = self._e2
        e4, e6 = e2 * e2, e2 * e2 * e2
        return (
            beta_p
            + (e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) * math.sin(2 * beta_p)
            + (23 * e4 / 360 + 251 * e6 / 3780) * math.sin(4 * beta_p)
            + (761 * e6 / 45360) * math.sin(6 * beta_p)
        )

    def forward(self, lon: float, lat: float) -> tuple[float, float]:
        q = self._q(math.radians(lat))
        lam = math.radians(lon - self.lon0)
        if self._polar:
            # Snyder 24-23/24-25: ρ = a sqrt(qP ∓ q), pole at ρ = 0
            rho = self.a * math.sqrt(max(0.0, self._qp - self._polar * q))
            return (
                self.fe + rho * math.sin(lam),
                self.fn - self._polar * rho * math.cos(lam),
            )
        beta = math.asin(max(-1.0, min(1.0, q / self._qp)))
        b0, rq, d = self._beta0, self._rq, self._d
        denom = 1 + math.sin(b0) * math.sin(beta) + math.cos(b0) * math.cos(
            beta
        ) * math.cos(lam)
        if denom < 1e-14:
            # the antipode of the projection origin: the point maps to
            # the (unbounded) bounding circle — return infinities
            # rather than crash mid-ingest on out-of-extent vertices
            # (code-review r10)
            return math.inf, math.inf
        b = rq * math.sqrt(2 / denom)
        e_coord = self.fe + (b * d) * math.cos(beta) * math.sin(lam)
        n_coord = self.fn + (b / d) * (
            math.cos(b0) * math.sin(beta)
            - math.sin(b0) * math.cos(beta) * math.cos(lam)
        )
        return e_coord, n_coord

    def inverse(self, e_coord: float, n_coord: float) -> tuple[float, float]:
        x = e_coord - self.fe
        y = n_coord - self.fn
        if self._polar:
            rho = math.hypot(x, y)
            if rho < 1e-12:
                return self.lon0, self.lat0
            q = self._polar * (self._qp - (rho / self.a) ** 2)
            beta_p = math.asin(max(-1.0, min(1.0, q / self._qp)))
            lam = math.atan2(x, -self._polar * y)
            return self.lon0 + math.degrees(lam), math.degrees(
                self._phi_from_beta(beta_p)
            )
        b0, rq, d = self._beta0, self._rq, self._d
        rho = math.hypot(x / d, d * y)
        if rho < 1e-12:  # the projection origin itself
            return self.lon0, self.lat0
        c = 2 * math.asin(max(-1.0, min(1.0, rho / (2 * rq))))
        beta_p = math.asin(
            max(
                -1.0,
                min(
                    1.0,
                    math.cos(c) * math.sin(b0)
                    + (d * y * math.sin(c) * math.cos(b0)) / rho,
                ),
            )
        )
        lam = math.atan2(
            x * math.sin(c),
            d * rho * math.cos(b0) * math.cos(c)
            - d * d * y * math.sin(b0) * math.sin(c),
        )
        return self.lon0 + math.degrees(lam), math.degrees(
            self._phi_from_beta(beta_p)
        )


@dataclass(frozen=True)
class AlbersEqualAreaConic:
    """Albers Equal Area Conic on an ellipsoid (EPSG method 9822 —
    EPSG:5070 NAD83 / Conus Albers, the projection USGS and Census
    CONUS products ship in). Forward and inverse from the public EPSG
    Guidance Note 7-2 / Snyder (USGS PP 1395 eqs 14-3..14-12) closed
    forms, sharing the authalic-latitude kernel and inverse series
    with :class:`LambertAzimuthalEqualArea`. Anchored in tests by
    Snyder's published worked example and the equal-area Jacobian
    property (constant-free).

    Angles in degrees, lengths in the projection unit. ``lat1``/
    ``lat2`` are the standard parallels, ``lat0``/``lon0`` the false
    origin."""

    a: float
    inv_f: float
    lat0: float
    lon0: float
    lat1: float
    lat2: float
    fe: float = 0.0
    fn: float = 0.0

    @functools.cached_property
    def _laea(self) -> LambertAzimuthalEqualArea:
        # shares q(φ), qP and the inverse authalic series
        return LambertAzimuthalEqualArea(
            a=self.a, inv_f=self.inv_f, lat0=self.lat0, lon0=self.lon0
        )

    def _m(self, phi: float) -> float:
        s = math.sin(phi)
        return math.cos(phi) / math.sqrt(1 - self._laea._e2 * s * s)

    @functools.cached_property
    def _n(self) -> float:
        p1, p2 = math.radians(self.lat1), math.radians(self.lat2)
        m1, m2 = self._m(p1), self._m(p2)
        q1, q2 = self._laea._q(p1), self._laea._q(p2)
        if abs(q2 - q1) < 1e-12:  # 1SP degenerate: n = sinφ1
            return math.sin(p1)
        return (m1 * m1 - m2 * m2) / (q2 - q1)

    @functools.cached_property
    def _c(self) -> float:
        p1 = math.radians(self.lat1)
        return self._m(p1) ** 2 + self._n * self._laea._q(p1)

    def _rho(self, q: float) -> float:
        return self.a * math.sqrt(max(0.0, self._c - self._n * q)) / self._n

    @functools.cached_property
    def _rho0(self) -> float:
        return self._rho(self._laea._q(math.radians(self.lat0)))

    def forward(self, lon: float, lat: float) -> tuple[float, float]:
        rho = self._rho(self._laea._q(math.radians(lat)))
        theta = self._n * math.radians(lon - self.lon0)
        return (
            self.fe + rho * math.sin(theta),
            self.fn + self._rho0 - rho * math.cos(theta),
        )

    def inverse(self, e_coord: float, n_coord: float) -> tuple[float, float]:
        x = e_coord - self.fe
        y = self._rho0 - (n_coord - self.fn)
        n = self._n
        rho = math.hypot(x, y)
        if n < 0:  # southern cone: ρ and the atan2 operands flip sign
            rho, x, y = -rho, -x, -y
        q = (self._c - (rho * n / self.a) ** 2) / n
        theta = math.atan2(x, y)
        lam = theta / n
        qp = self._laea._qp
        beta_p = math.asin(max(-1.0, min(1.0, q / qp)))
        e2 = self._laea._e2
        e4, e6 = e2 * e2, e2 * e2 * e2
        phi = (
            beta_p
            + (e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) * math.sin(2 * beta_p)
            + (23 * e4 / 360 + 251 * e6 / 3780) * math.sin(4 * beta_p)
            + (761 * e6 / 45360) * math.sin(6 * beta_p)
        )
        return self.lon0 + math.degrees(lam), math.degrees(phi)


@dataclass(frozen=True)
class CRSInfo:
    """Parsed .prj verdict: ``code`` is the EPSG identifier when the
    WKT carries one (the reference's ``CRS.lookupIdentifier`` result,
    else the WKT name; "Unknown" with no .prj at all), ``transform``
    is the inverse-to-WGS84 callable when one exists (identity for
    geographic CRS — GeoTools also finds an identity MathTransform
    for WGS84→WGS84, so ``TransformedToWGS84`` is true there too)."""

    code: str
    is_geographic: bool
    projection: (
        LambertConformalConic2SP
        | WebMercator
        | EllipsoidalMercator
        | TransverseMercator
        | LambertAzimuthalEqualArea
        | AlbersEqualAreaConic
        | None
    )
    # geographic CRS declared LAT,LON-ordered via AXIS nodes (the
    # official EPSG:4326 ordering): inputs swap before the transform —
    # the reference's CRS.getAxisOrder handling (GeoManager.scala:
    # 185-200). Shapefile .prj files are almost always lon/lat, but an
    # EPSG-style WKT with explicit AXIS["Latitude"...] first must not
    # silently transpose the world.
    lat_lon_order: bool = False

    @property
    def has_transform(self) -> bool:
        return self.is_geographic or self.projection is not None

    def to_wgs84(self, x: float, y: float) -> tuple[float, float]:
        if self.lat_lon_order:
            x, y = y, x
        if self.projection is not None:
            return self.projection.inverse(x, y)
        return x, y


def _split_args(body: str) -> list[str]:
    """Split a WKT node body on top-level commas — quote-aware, so a
    comma or bracket INSIDE a quoted name never counts (code-review
    r9: names like ``DATUM["D (custom, 1950)"]`` are legal WKT)."""
    out, depth, cur, in_q = [], 0, [], False
    for ch in body:
        if ch == '"':
            in_q = not in_q
        elif not in_q:
            if ch in "[(":
                depth += 1
            elif ch in "])":
                depth -= 1
            elif ch == "," and depth == 0:
                out.append("".join(cur))
                cur = []
                continue
        cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def _parse_node(text: str, depth: int = 0) -> tuple[str, list]:
    """Parse one WKT-1 node ``KEYWORD[arg, arg, ...]`` recursively;
    args are nested nodes, quoted strings, or numbers. Nesting is
    bounded (real WKT is <10 deep; a hostile .prj must raise
    ValueError — the class read_shapefile's pass-through guard
    catches — not RecursionError)."""
    if depth > 32:
        raise ValueError("WKT nesting deeper than 32 levels")
    text = text.strip()
    m = re.match(r"^([A-Za-z_0-9]+)\s*[\[(]", text)
    if not m:
        raise ValueError(f"not a WKT node: {text[:40]!r}")
    keyword = m.group(1).upper()
    # find the matching close bracket for the opener (quote-aware:
    # brackets inside quoted names must not shift the count). NB the
    # counter must not be named `depth` — it would shadow the
    # recursion-depth parameter and neuter the nesting bound (found by
    # the parser fuzz)
    level, start, end, in_q = 1, m.end(), None, False
    for i in range(m.end(), len(text)):
        ch = text[i]
        if ch == '"':
            in_q = not in_q
        elif not in_q:
            if ch in "[(":
                level += 1
            elif ch in "])":
                level -= 1
                if level == 0:
                    end = i
                    break
    if end is None:
        raise ValueError("unbalanced WKT brackets")
    args: list = []
    for raw in _split_args(text[start:end]):
        raw = raw.strip()
        if not raw:
            continue
        if raw.startswith('"'):
            args.append(raw.strip('"'))
        elif re.match(r"^[A-Za-z_0-9]+\s*[\[(]", raw):
            args.append(_parse_node(raw, depth + 1))
        else:
            try:
                args.append(float(raw))
            except ValueError:
                args.append(raw)
    return keyword, args


def _find(node: tuple[str, list], keyword: str) -> tuple[str, list] | None:
    for arg in node[1]:
        if isinstance(arg, tuple) and arg[0] == keyword:
            return arg
    return None


def _authority_code(node: tuple[str, list]) -> str | None:
    auth = _find(node, "AUTHORITY")
    if auth and len(auth[1]) >= 2:
        return f"{auth[1][0]}:{auth[1][1]}"
    return None


# Parameter-name normalization: the EPSG registry and ESRI spell the
# LCC parameters differently ("standard_parallel_1" vs
# "Standard_Parallel_1", "latitude_of_origin" vs
# "Latitude_Of_Origin"); compare lower-cased.
_LCC_NAMES = {
    "lambert_conformal_conic_2sp",
    "lambert_conformal_conic",  # ESRI spelling (2SP when both parallels given)
}
# Method names that are spherical BY DEFINITION (EPSG method 1024 /
# ESRI's auxiliary-sphere spelling). A plain "Mercator_1SP" is the
# ELLIPSOIDAL method (EPSG:3395 et al.) and only decodes spherically
# when the AUTHORITY pins it to 3857 — anything else passes through
# loudly (code-review r9).
_WEBMERC_NAMES = {
    "popular visualisation pseudo mercator",  # EPSG 1024 method name
    "popular_visualisation_pseudo_mercator",
    "mercator_auxiliary_sphere",  # ESRI spelling for 3857
}


def _lat_first(node: tuple[str, list]) -> bool:
    """True when the node's FIRST AXIS declares latitude/northing —
    the EPSG-official ordering some registry WKTs carry. Absent AXIS
    nodes mean the de-facto lon/lat (GIS) order."""
    for arg in node[1]:
        if isinstance(arg, tuple) and arg[0] == "AXIS" and arg[1]:
            first = str(arg[1][0]).lower()
            return first.startswith("lat") or "north" in [
                str(a).lower() for a in arg[1][1:]
            ]
    return False


def _greenwich(geogcs: tuple[str, list] | None) -> bool:
    """True unless the geographic CRS declares a NON-zero prime
    meridian (e.g. PRIMEM["Paris", 2.3372...] in legacy NTF WKTs) —
    reprojecting those without the meridian shift would be silently
    wrong by degrees, so they must take the loud pass-through path."""
    if geogcs is None:
        return True
    pm = _find(geogcs, "PRIMEM")
    if pm is None or len(pm[1]) < 2:
        return True
    try:
        return abs(float(pm[1][1])) < 1e-9
    except (TypeError, ValueError):
        return False


def parse_wkt(wkt: str) -> CRSInfo:
    """Parse ``.prj`` WKT-1 into a :class:`CRSInfo`.

    Supported: geographic CRS (GEOGCS — treated as WGS84-compatible,
    identity transform) and projected Lambert Conformal Conic 2SP
    (both the EPSG and ESRI parameter spellings). Anything else warns
    loudly and returns a no-transform info carrying the WKT name —
    the reference's print-and-continue path
    (``GeoManager.scala:155-157``)."""
    root = _parse_node(wkt)
    name = root[1][0] if root[1] and isinstance(root[1][0], str) else "Unknown"
    code = _authority_code(root) or name
    if root[0] == "GEOGCS":
        if not _greenwich(root):
            warnings.warn(
                f"geographic CRS {name!r} uses a non-Greenwich prime "
                "meridian: coordinates pass through untransformed",
                stacklevel=2,
            )
            return CRSInfo(code=code, is_geographic=False, projection=None)
        return CRSInfo(
            code=code,
            is_geographic=True,
            projection=None,
            lat_lon_order=_lat_first(root),
        )
    if root[0] != "PROJCS":
        warnings.warn(
            f"unsupported CRS root {root[0]!r} ({name!r}): coordinates "
            "pass through untransformed",
            stacklevel=2,
        )
        return CRSInfo(code=code, is_geographic=False, projection=None)
    proj = _find(root, "PROJECTION")
    proj_name = str(proj[1][0]).lower() if proj and proj[1] else ""
    params: dict[str, float] = {}
    for arg in root[1]:
        if isinstance(arg, tuple) and arg[0] == "PARAMETER" and len(arg[1]) >= 2:
            params[str(arg[1][0]).lower()] = float(arg[1][1])
    geogcs = _find(root, "GEOGCS")
    spheroid = None
    if geogcs:
        datum = _find(geogcs, "DATUM")
        if datum:
            spheroid = _find(datum, "SPHEROID")
    if not _greenwich(geogcs):
        warnings.warn(
            f"projected CRS {name!r} sits on a non-Greenwich prime "
            "meridian: coordinates pass through untransformed",
            stacklevel=2,
        )
        return CRSInfo(code=code, is_geographic=False, projection=None)
    if proj_name in _WEBMERC_NAMES or (
        proj_name == "mercator_1sp" and code == "EPSG:3857"
    ):
        # ESRI's Auxiliary_Sphere_Type parameter: 0 = use the
        # ellipsoid's semi-major axis as the sphere radius (the 3857
        # convention the WebMercator form implements); 1/2 (authalic /
        # rectifying sphere) decode measurably differently, so they
        # take the loud pass-through path (code-review r9).
        if abs(params.get("auxiliary_sphere_type", 0.0)) > 1e-12:
            warnings.warn(
                f"Mercator CRS {name!r} uses Auxiliary_Sphere_Type "
                f"{params['auxiliary_sphere_type']:g} (authalic/"
                "rectifying sphere): coordinates pass through "
                "untransformed",
                stacklevel=2,
            )
            return CRSInfo(code=code, is_geographic=False, projection=None)
        if abs(params.get("scale_factor", 1.0) - 1.0) > 1e-12:
            warnings.warn(
                f"Mercator CRS {name!r} mixes a spherical method name "
                "with a non-unit scale factor: coordinates pass through "
                "untransformed",
                stacklevel=2,
            )
            return CRSInfo(code=code, is_geographic=False, projection=None)
        merc = WebMercator(
            a=float(spheroid[1][1]) if spheroid and len(spheroid[1]) >= 2
            else 6378137.0,
            lon0=params.get("central_meridian", 0.0),
            fe=params.get("false_easting", 0.0),
            fn=params.get("false_northing", 0.0),
        )
        return CRSInfo(
            code=code, is_geographic=False, projection=merc,
            lat_lon_order=_lat_first(root),
        )
    if (
        proj_name in ("mercator_1sp", "mercator_2sp", "mercator")
        and spheroid is not None
        and len(spheroid[1]) >= 3
    ):
        # ellipsoidal Mercator (EPSG:3395 et al.): 1SP carries k0
        # directly; 2SP (and ESRI's plain "Mercator") derives it from
        # the standard parallel, k0 = m(lat1)
        lat1 = params.get("standard_parallel_1")
        k0 = params.get("scale_factor")
        if k0 is None and lat1 is not None:
            # 2SP / ESRI "Mercator": k0 = m(lat1) on this ellipsoid
            helper = LambertConformalConic2SP(
                a=float(spheroid[1][1]), inv_f=float(spheroid[1][2]),
                lat0=0.0, lon0=0.0, lat1=30.0, lat2=60.0, fe=0.0, fn=0.0,
            )
            k0 = helper._m(math.radians(lat1))
        em = EllipsoidalMercator(
            a=float(spheroid[1][1]),
            inv_f=float(spheroid[1][2]),
            lon0=params.get("central_meridian", 0.0),
            k0=k0 if k0 is not None else 1.0,
            fe=params.get("false_easting", 0.0),
            fn=params.get("false_northing", 0.0),
        )
        return CRSInfo(
            code=code, is_geographic=False, projection=em,
            lat_lon_order=_lat_first(root),
        )
    if (
        proj_name == "transverse_mercator"
        and spheroid is not None
        and len(spheroid[1]) >= 3
    ):
        lat0 = params.get(
            "latitude_of_origin", params.get("latitude_of_center", 0.0)
        )
        lon0 = params.get("central_meridian")
        if lon0 is None:
            warnings.warn(
                f"Transverse Mercator {name!r} missing central_meridian: "
                "coordinates pass through untransformed",
                stacklevel=2,
            )
            return CRSInfo(code=code, is_geographic=False, projection=None)
        tm = TransverseMercator(
            a=float(spheroid[1][1]),
            inv_f=float(spheroid[1][2]),
            lat0=lat0,
            lon0=lon0,
            k0=params.get("scale_factor", 1.0),
            fe=params.get("false_easting", 0.0),
            fn=params.get("false_northing", 0.0),
        )
        return CRSInfo(
            code=code, is_geographic=False, projection=tm,
            lat_lon_order=_lat_first(root),
        )
    if (
        proj_name == "lambert_azimuthal_equal_area"
        and spheroid is not None
        and len(spheroid[1]) >= 3
    ):
        # EPSG spells the origin latitude_of_origin/central_meridian,
        # GDAL writes latitude_of_center/longitude_of_center for LAEA
        lat0 = params.get(
            "latitude_of_origin", params.get("latitude_of_center")
        )
        lon0 = params.get("central_meridian", params.get("longitude_of_center"))
        if lat0 is None or lon0 is None:
            warnings.warn(
                f"LAEA projection {name!r} missing parameters: coordinates "
                "pass through untransformed",
                stacklevel=2,
            )
            return CRSInfo(code=code, is_geographic=False, projection=None)
        laea = LambertAzimuthalEqualArea(
            a=float(spheroid[1][1]),
            inv_f=float(spheroid[1][2]),
            lat0=lat0,
            lon0=lon0,
            fe=params.get("false_easting", 0.0),
            fn=params.get("false_northing", 0.0),
        )
        return CRSInfo(
            code=code, is_geographic=False, projection=laea,
            lat_lon_order=_lat_first(root),
        )
    if (
        proj_name in ("albers_conic_equal_area", "albers")
        and spheroid is not None
        and len(spheroid[1]) >= 3
    ):
        lat1 = params.get("standard_parallel_1")
        lat2 = params.get("standard_parallel_2", lat1)
        lat0 = params.get(
            "latitude_of_origin", params.get("latitude_of_center")
        )
        lon0 = params.get("central_meridian", params.get("longitude_of_center"))
        if lat1 is None or lat0 is None or lon0 is None:
            warnings.warn(
                f"Albers projection {name!r} missing parameters: "
                "coordinates pass through untransformed",
                stacklevel=2,
            )
            return CRSInfo(code=code, is_geographic=False, projection=None)
        aea = AlbersEqualAreaConic(
            a=float(spheroid[1][1]),
            inv_f=float(spheroid[1][2]),
            lat0=lat0,
            lon0=lon0,
            lat1=lat1,
            lat2=lat2,
            fe=params.get("false_easting", 0.0),
            fn=params.get("false_northing", 0.0),
        )
        if abs(aea._n) < 1e-12:
            # symmetric parallels (lat2 = -lat1) or an equatorial 1SP
            # cone give n = 0: the cone degenerates to a cylinder and
            # every ρ divides by zero — take the loud pass-through
            # path instead of returning a projection that crashes on
            # first use (code-review r10)
            warnings.warn(
                f"Albers projection {name!r} has degenerate (symmetric "
                "or equatorial) standard parallels: coordinates pass "
                "through untransformed",
                stacklevel=2,
            )
            return CRSInfo(code=code, is_geographic=False, projection=None)
        return CRSInfo(
            code=code, is_geographic=False, projection=aea,
            lat_lon_order=_lat_first(root),
        )
    if proj_name not in _LCC_NAMES or spheroid is None or len(spheroid[1]) < 3:
        warnings.warn(
            f"no transform for projection {proj_name or 'unknown'!r} "
            f"({name!r}): coordinates pass through untransformed",
            stacklevel=2,
        )
        return CRSInfo(code=code, is_geographic=False, projection=None)
    lat1 = params.get("standard_parallel_1")
    lat2 = params.get("standard_parallel_2", lat1)
    lat0 = params.get("latitude_of_origin", params.get("latitude_of_center"))
    lon0 = params.get("central_meridian", params.get("longitude_of_center"))
    fe = params.get("false_easting", 0.0)
    fn = params.get("false_northing", 0.0)
    if lat1 is None or lat0 is None or lon0 is None:
        warnings.warn(
            f"LCC projection {name!r} missing parameters: coordinates "
            "pass through untransformed",
            stacklevel=2,
        )
        return CRSInfo(code=code, is_geographic=False, projection=None)
    lcc = LambertConformalConic2SP(
        a=float(spheroid[1][1]),
        inv_f=float(spheroid[1][2]),
        lat0=lat0,
        lon0=lon0,
        lat1=lat1,
        lat2=lat2,
        fe=fe,
        fn=fn,
    )
    return CRSInfo(
        code=code, is_geographic=False, projection=lcc,
        lat_lon_order=_lat_first(root),
    )
