"""EPSG:25832 (ETRS89 / UTM zone 32N, GRS80) forward projection as pure
column arithmetic — the reference measures its 150 m match radius in THIS
planar CRS (scripts/04_compare_optimized.py:389-391,420-421 via to_crs),
while the engine's default is WGS84 haversine. Near the threshold boundary
the two metrics genuinely disagree (UTM scale 0.9996 at the central
meridian plus sphere-vs-ellipsoid curvature: an east-west pair at 50°N
differs by ~0.3 % ≈ 40 cm at 150 m), so exact reference semantics need the
real projection.

No pyproj in this environment — none needed: the transverse-Mercator
forward mapping is the published Krüger series (public formulas, accurate
to < 1 mm inside the zone), which is just sin/cos/exp/ln/atan2/sqrt — all
whole-stage-codegen built-ins on the Spark side and the same functions in
DuckDB. Both dialects are emitted from ONE expression builder, so the
oracle evaluates bit-identical operation order (hyperbolics are expanded
through exp/ln on both sides rather than mixing JVM intrinsics with C
library calls).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# GRS80 ellipsoid + UTM zone 32N constants (public EPSG definitions)
_A = 6378137.0
_F = 1.0 / 298.257222101
_N = _F / (2.0 - _F)
_A_CAP = _A / (1.0 + _N) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0)
_AL1 = _N / 2.0 - 2.0 * _N**2 / 3.0 + 5.0 * _N**3 / 16.0
_AL2 = 13.0 * _N**2 / 48.0 - 3.0 * _N**3 / 5.0
_AL3 = 61.0 * _N**3 / 240.0
# inverse-series coefficients (published Krüger β / rectifying-latitude δ)
_BE1 = _N / 2.0 - 2.0 * _N**2 / 3.0 + 37.0 * _N**3 / 96.0
_BE2 = _N**2 / 48.0 + _N**3 / 15.0
_BE3 = 17.0 * _N**3 / 480.0
_DE1 = 2.0 * _N - 2.0 * _N**2 / 3.0 - 2.0 * _N**3
_DE2 = 7.0 * _N**2 / 3.0 - 8.0 * _N**3 / 5.0
_DE3 = 56.0 * _N**3 / 15.0
_TSN = 2.0 * math.sqrt(_N) / (1.0 + _N)
K0 = 0.9996
E0 = 500000.0
LON0_DEG = 9.0


class _Sql:
    """SQL-text expression node with float semantics: lets the one builder
    below emit either Columns or dialect-shared SQL. Literals print as
    scientific notation so Spark SQL parses DOUBLE, not DECIMAL."""

    __slots__ = ("s",)

    def __init__(self, s: str):
        self.s = s

    def _b(self, op: str, o, rev: bool = False):
        a, b = (self, _sql_lit(o)) if not rev else (_sql_lit(o), self)
        return _Sql(f"({a.s} {op} {b.s})")

    def __add__(self, o):
        return self._b("+", o)

    def __radd__(self, o):
        return self._b("+", o, rev=True)

    def __sub__(self, o):
        return self._b("-", o)

    def __rsub__(self, o):
        return self._b("-", o, rev=True)

    def __mul__(self, o):
        return self._b("*", o)

    def __rmul__(self, o):
        return self._b("*", o, rev=True)

    def __truediv__(self, o):
        return self._b("/", o)

    def __rtruediv__(self, o):
        return self._b("/", o, rev=True)

    def __neg__(self):
        return _Sql(f"(- {self.s})")


def _sql_lit(v) -> _Sql:
    if isinstance(v, _Sql):
        return v
    return _Sql(f"{float(v):.17e}")


class _SqlOps:
    dialect = "sql"

    @staticmethod
    def fn(name):
        return lambda *args: _Sql(
            f"{name}({', '.join(_sql_lit(a).s for a in args)})"
        )

    def __init__(self):
        for name in ("sin", "cos", "exp", "ln", "sqrt", "atan2", "radians"):
            setattr(self, name, self.fn(name))

    @staticmethod
    def lit(v):
        return _sql_lit(v)


class _ColOps:
    dialect = "spark"
    sin = staticmethod(F.sin)
    cos = staticmethod(F.cos)
    exp = staticmethod(F.exp)
    ln = staticmethod(F.log)
    sqrt = staticmethod(F.sqrt)
    atan2 = staticmethod(F.atan2)
    radians = staticmethod(F.radians)

    @staticmethod
    def lit(v):
        return F.lit(float(v))


def _utm32(lat, lon, ops):
    """(easting, northing) via the Krüger series; hyperbolics expanded
    through exp/ln so both dialects evaluate the identical tree."""

    def sinh(x):
        return (ops.exp(x) - ops.exp(-x)) * ops.lit(0.5)

    def cosh(x):
        return (ops.exp(x) + ops.exp(-x)) * ops.lit(0.5)

    def atanh(x):
        return ops.ln((ops.lit(1.0) + x) / (ops.lit(1.0) - x)) * ops.lit(0.5)

    phi = ops.radians(lat)
    dl = ops.radians(lon - ops.lit(LON0_DEG))
    sphi = ops.sin(phi)
    t = sinh(atanh(sphi) - ops.lit(_TSN) * atanh(ops.lit(_TSN) * sphi))
    xi = ops.atan2(t, ops.cos(dl))
    eta = atanh(ops.sin(dl) / ops.sqrt(ops.lit(1.0) + t * t))
    e = eta
    n_ = xi
    for j, al in ((1, _AL1), (2, _AL2), (3, _AL3)):
        tj = ops.lit(2.0 * j)
        e = e + ops.lit(al) * ops.cos(tj * xi) * sinh(tj * eta)
        n_ = n_ + ops.lit(al) * ops.sin(tj * xi) * cosh(tj * eta)
    scale = ops.lit(K0 * _A_CAP)
    return ops.lit(E0) + scale * e, scale * n_


def _utm32_inverse(e, n_, ops):
    """(lat, lon) degrees from EPSG:25832 (easting, northing) — the inverse
    Krüger series, same dual-dialect builder and exp/ln hyperbolics."""
    import math as _m

    def sinh(x):
        return (ops.exp(x) - ops.exp(-x)) * ops.lit(0.5)

    def cosh(x):
        return (ops.exp(x) + ops.exp(-x)) * ops.lit(0.5)

    def asin_(x):
        # asin(x) = atan2(x, sqrt(1-x²)) — atan2 exists in every dialect
        return ops.atan2(x, ops.sqrt(ops.lit(1.0) - x * x))

    scale = 1.0 / (K0 * _A_CAP)
    xi = (n_ - ops.lit(0.0)) * ops.lit(scale)
    eta = (e - ops.lit(E0)) * ops.lit(scale)
    xi_p, eta_p = xi, eta
    for j, be in ((1, _BE1), (2, _BE2), (3, _BE3)):
        tj = ops.lit(2.0 * j)
        xi_p = xi_p - ops.lit(be) * ops.sin(tj * xi) * cosh(tj * eta)
        eta_p = eta_p - ops.lit(be) * ops.cos(tj * xi) * sinh(tj * eta)
    chi = asin_(ops.sin(xi_p) / cosh(eta_p))
    phi = chi
    for j, de in ((1, _DE1), (2, _DE2), (3, _DE3)):
        phi = phi + ops.lit(de) * ops.sin(ops.lit(2.0 * j) * chi)
    lam = ops.atan2(sinh(eta_p), ops.cos(xi_p))
    deg = 180.0 / _m.pi
    return phi * ops.lit(deg), lam * ops.lit(deg) + ops.lit(LON0_DEG)


def utm32_cols(lat: Column, lon: Column) -> tuple[Column, Column]:
    return _utm32(lat, lon, _ColOps())


def utm32_inverse_cols(e: Column, n: Column) -> tuple[Column, Column]:
    """(lat, lon) Columns from EPSG:25832 easting/northing Columns."""
    return _utm32_inverse(e, n, _ColOps())


def utm32_inverse_py(e: float, n: float) -> tuple[float, float]:
    class _PyOps:
        dialect = "py"
        sin = staticmethod(math.sin)
        cos = staticmethod(math.cos)
        exp = staticmethod(math.exp)
        ln = staticmethod(math.log)
        sqrt = staticmethod(math.sqrt)
        atan2 = staticmethod(math.atan2)
        radians = staticmethod(math.radians)
        lit = staticmethod(float)

    return _utm32_inverse(float(e), float(n), _PyOps())


def utm32_sql(lat: str, lon: str) -> tuple[str, str]:
    e, n = _utm32(_Sql(f"({lat})"), _Sql(f"({lon})"), _SqlOps())
    return e.s, n.s


def utm32_inverse_sql(e: str, n: str) -> tuple[str, str]:
    """(lat_sql, lon_sql) — the inverse series as dialect-shared SQL text
    (same expression tree as utm32_inverse_cols, for oracle parity)."""
    lat, lon = _utm32_inverse(_Sql(f"({e})"), _Sql(f"({n})"), _SqlOps())
    return lat.s, lon.s


def planar_dist_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Euclidean meters in EPSG:25832 — the reference's exact metric."""
    e1, n1 = utm32_cols(lat1, lon1)
    e2, n2 = utm32_cols(lat2, lon2)
    return F.sqrt((e1 - e2) * (e1 - e2) + (n1 - n2) * (n1 - n2))


def planar_dist_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    e1, n1 = utm32_sql(lat1, lon1)
    e2, n2 = utm32_sql(lat2, lon2)
    return (
        f"sqrt((({e1}) - ({e2})) * (({e1}) - ({e2}))"
        f" + (({n1}) - ({n2})) * (({n1}) - ({n2})))"
    )


def utm32_py(lat: float, lon: float) -> tuple[float, float]:
    """Pure-python mirror (same series) for tests/goldens."""

    class _PyOps:
        dialect = "py"
        sin = staticmethod(math.sin)
        cos = staticmethod(math.cos)
        exp = staticmethod(math.exp)
        ln = staticmethod(math.log)
        sqrt = staticmethod(math.sqrt)
        atan2 = staticmethod(math.atan2)
        radians = staticmethod(math.radians)
        lit = staticmethod(float)

    return _utm32(lat, lon, _PyOps())
