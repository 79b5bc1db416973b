"""EPSG:25832 projection: series correctness vs an independent numerical
meridian-arc integration, tri-dialect equality (Column / SQL / python), and
the 150 m boundary semantics of the two distance backends."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from osm_coverage_spark.geo import crs
from osm_coverage_spark.geo.distance import haversine_m
from osm_coverage_spark.operators import coverage

# GRS80
_A, _F = 6378137.0, 1.0 / 298.257222101
_E2 = _F * (2.0 - _F)


def _meridian_arc(lat_deg: float, steps: int = 200000) -> float:
    """Independent check: numerically integrate the meridian arc
    M(φ) = a(1-e²) ∫ (1-e² sin²t)^(-3/2) dt — no shared code with the
    Krüger series."""
    phi = math.radians(lat_deg)
    h = phi / steps
    total = 0.0
    for i in range(steps + 1):
        t = i * h
        w = 1 if i in (0, steps) else (4 if i % 2 else 2)
        total += w / (1.0 - _E2 * math.sin(t) ** 2) ** 1.5
    return _A * (1.0 - _E2) * total * h / 3.0


def test_central_meridian_identities():
    e, n = crs.utm32_py(50.0, 9.0)
    assert e == pytest.approx(500000.0, abs=1e-6)
    e0, n0 = crs.utm32_py(0.0, 9.0)
    assert n0 == pytest.approx(0.0, abs=1e-6)


@pytest.mark.parametrize("lat", [48.0, 50.5, 53.0])
def test_northing_matches_integrated_meridian_arc(lat):
    _, n = crs.utm32_py(lat, 9.0)
    assert n == pytest.approx(crs.K0 * _meridian_arc(lat), abs=1e-3)


def test_tri_dialect_equality(spark):
    pts = [(50.7754, 6.0839), (53.5511, 9.9937), (48.1372, 11.5755)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    ec, nc = crs.utm32_cols(F.col("lat"), F.col("lon"))
    got = df.select(ec.alias("e"), nc.alias("n")).collect()
    es, ns = crs.utm32_sql("lat", "lon")
    duck = duckdb.connect().execute(
        f"SELECT {es} AS e, {ns} AS n FROM (VALUES "
        + ", ".join(f"({la}, {lo})" for la, lo in pts)
        + ") AS t(lat, lon)"
    ).fetchall()
    for (la, lo), row, drow in zip(pts, got, duck):
        pe, pn = crs.utm32_py(la, lo)
        assert row["e"] == pytest.approx(pe, abs=1e-6)
        assert row["n"] == pytest.approx(pn, abs=1e-6)
        assert drow[0] == pytest.approx(pe, abs=1e-6)
        assert drow[1] == pytest.approx(pn, abs=1e-6)


def _ew_pair_at_haversine(lat: float, lon: float, meters: float):
    """East-west pair ~`meters` apart by haversine."""
    dlon = meters / (6371000.0 * math.radians(1.0) * math.cos(math.radians(lat)))
    return (lat, lon), (lat, lon + dlon)


def test_backends_disagree_only_at_the_boundary(spark):
    """An east-west pair at 50°N: UTM planar reads ~0.27 % longer than
    haversine (ellipsoid curvature beats the 0.9996 scale), so a pair at
    haversine ≈ 149.8 m sits on OPPOSITE sides of the 150 m threshold in
    the two metrics — exactly the reference-parity gap the utm25832
    backend closes."""
    (la1, lo1), (la2, lo2) = _ew_pair_at_haversine(50.0, 8.0, 149.8)
    df = spark.createDataFrame(
        [(la1, lo1, la2, lo2)], "lat1 double, lon1 double, lat2 double, lon2 double"
    )
    row = df.select(
        haversine_m(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias(
            "hav"
        ),
        crs.planar_dist_m(
            F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
        ).alias("utm"),
    ).collect()[0]
    assert row["hav"] == pytest.approx(149.8, abs=0.01)
    assert row["utm"] > 150.0  # ~150.2 m in the reference's metric
    assert abs(row["utm"] - row["hav"]) < 1.0  # sub-meter at 150 m overall


def test_flag_found_green_under_both_backends(spark):
    """coverage flag under both distance backends vs a DuckDB oracle using
    the SAME metric SQL — including a planted boundary pair on which the
    backends disagree with each other but each agrees with its oracle."""
    (la1, lo1), (la2, lo2) = _ew_pair_at_haversine(50.0, 8.0, 149.8)
    alkis_rows = [
        ("A near", "1", 50.0, 6.10000),    # ~70 m from its OSM twin
        ("B far", "2", 50.0, 6.20000),     # ~700 m away -> missing
        ("C boundary", "3", la1, lo1),     # the disagreement pair
    ]
    osm_rows = [
        ("A near", "1", 50.0, 6.10100),
        ("B far", "2", 50.0, 6.21000),
        ("C boundary", "3", la2, lo2),
    ]
    alkis = spark.createDataFrame(
        alkis_rows, "street string, housenumber string, lat double, lon double"
    )
    osm = spark.createDataFrame(
        osm_rows, "street string, housenumber string, lat double, lon double"
    )
    a = coverage.with_key(alkis)
    o = coverage.with_key(osm)

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE a AS SELECT * FROM (VALUES "
        + ", ".join(f"('{s}', {la}, {lo})" for s, _, la, lo in alkis_rows)
        + ") t(street, lat, lon)"
    )
    con.execute(
        "CREATE TABLE o AS SELECT * FROM (VALUES "
        + ", ".join(f"('{s}', {la}, {lo})" for s, _, la, lo in osm_rows)
        + ") t(street, lat, lon)"
    )
    from osm_coverage_spark.geo.distance import haversine_m_sql

    metric_sql = {
        "haversine": haversine_m_sql("a.lat", "a.lon", "o.lat", "o.lon"),
        "utm25832": crs.planar_dist_sql("a.lat", "a.lon", "o.lat", "o.lon"),
    }
    flags = {}
    for backend, dsql in metric_sql.items():
        got = {
            r["street"]: r["found_in_osm"]
            for r in coverage.flag_found(a, o, dist_backend=backend).collect()
        }
        oracle = dict(
            con.execute(
                f"SELECT a.street, EXISTS (SELECT 1 FROM o WHERE o.street = a.street "
                f"AND {dsql} < 150.0) FROM a"
            ).fetchall()
        )
        assert got == oracle, backend
        flags[backend] = got
    assert flags["haversine"]["A near"] and flags["utm25832"]["A near"]
    assert not flags["haversine"]["B far"] and not flags["utm25832"]["B far"]
    # the planted boundary pair flips between metrics — and each side
    # matched its own oracle above, so both classifications are CORRECT
    # in their respective CRS
    assert flags["haversine"]["C boundary"] is True
    assert flags["utm25832"]["C boundary"] is False
