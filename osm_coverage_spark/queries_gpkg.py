"""Oracle-paired GeoPackage scan query.

The GPKG reader (sources/gpkg.py — reference 02_extract_alkis.py:367-431)
was previously pytest-only; this puts it under the driver's DuckDB gate.
A deterministic fixture GPKG (polygon squares + plain points in
EPSG:25832) is synthesized once on the driver; the Spark side scans it
distributed (rowid-range ``mapInPandas``), takes centroids, and reprojects
to WGS84 with the column-math inverse Krüger series. The DuckDB oracle
re-derives every value from ``range()`` arithmetic plus the SAME
dialect-shared inverse-projection SQL (geo/crs.utm32_inverse_sql) — no
file access, bit-identical operation order.

FP parity notes:
- polygon centroids: the reader's local-origin shoelace on an axis-aligned
  square reduces EXACTLY to fl(first_corner + half) (moments are small
  exact integers; the ×512 scaling is a power of two), so the oracle
  mirrors the chain ``((center - 8) + 8)`` rather than ``center``;
- lat/lon come from transcendentals (JVM vs libm can differ in the last
  ulp), so both sides round to 6 dp — a flip would need the true value
  within ~1e-13 of a rounding boundary, which the fixed fixture avoids.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .geo import crs
from .sources import gpkg

N_POLY = 420
N_PT = 100
ANCHOR_LAT, ANCHOR_LON = 50.7754, 6.0839
AX, AY = crs.utm32_py(ANCHOR_LAT, ANCHOR_LON)
HALF = 8.0
LAYER = "synth_gebaeude"
_FIXTURE = os.path.join(tempfile.gettempdir(), "osm_coverage_gpkg_fixture_v1.gpkg")


def _poly_center(i: int) -> tuple[float, float]:
    return AX + (i % 20) * 50.0, AY + (i // 20) * 50.0


def _point_xy(i: int) -> tuple[float, float]:
    return AX + 7000.0 + i * 3.0, AY - 2500.0 + i * 2.0


def _square(cx: float, cy: float, r: float):
    return [(cx - r, cy - r), (cx + r, cy - r), (cx + r, cy + r),
            (cx - r, cy + r), (cx - r, cy - r)]


def fixture_path() -> str:
    """Write the deterministic fixture GPKG once (atomic rename)."""
    if os.path.exists(_FIXTURE):
        return _FIXTURE
    rows = []
    for i in range(N_POLY):
        cx, cy = _poly_center(i)
        rows.append((i, f"Weg {i % 7}", str(i % 30 + 1), f"D{i % 3}",
                     gpkg.wkb_polygon([_square(cx, cy, HALF)])))
    for i in range(N_POLY, N_POLY + N_PT):
        x, y = _point_xy(i)
        rows.append((i, f"Punkt {i % 5}", str(i % 9 + 1), "P",
                     gpkg.wkb_point(x, y)))
    tmp = f"{_FIXTURE}.{os.getpid()}"
    gpkg.write_gpkg(
        tmp, LAYER, 25832,
        [("fid", "INTEGER"), ("street", "TEXT"), ("housenumber", "TEXT"),
         ("district", "TEXT")],
        rows,
    )
    os.replace(tmp, _FIXTURE)
    return _FIXTURE


def q_gpkg_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed GPKG layer scan → representative points → WGS84."""
    df = gpkg.with_wgs84(
        gpkg.read_gpkg_layer(spark, fixture_path(), layer=LAYER, batch_rows=64)
    )
    return df.select(
        F.col("fid").cast("long").alias("fid"),
        "street",
        "housenumber",
        "district",
        F.round("x", 3).alias("x3"),
        F.round("y", 3).alias("y3"),
        F.round("lat", 6).alias("lat6"),
        F.round("lon", 6).alias("lon6"),
    )


def _lit(v: float) -> str:
    return f"{v:.17e}"


def _oracle() -> str:
    lat_sql, lon_sql = crs.utm32_inverse_sql("x", "y")
    return f"""
WITH g AS (SELECT CAST(range AS BIGINT) AS fid FROM range({N_POLY + N_PT})),
feat AS (
  SELECT fid,
    CASE WHEN fid < {N_POLY} THEN 'Weg ' || CAST(fid % 7 AS STRING)
         ELSE 'Punkt ' || CAST(fid % 5 AS STRING) END AS street,
    CASE WHEN fid < {N_POLY} THEN CAST(fid % 30 + 1 AS STRING)
         ELSE CAST(fid % 9 + 1 AS STRING) END AS housenumber,
    CASE WHEN fid < {N_POLY} THEN 'D' || CAST(fid % 3 AS STRING)
         ELSE 'P' END AS district,
    CASE WHEN fid < {N_POLY}
         THEN (({_lit(AX)} + (fid % 20) * 5.0e1) - {_lit(HALF)}) + {_lit(HALF)}
         ELSE {_lit(AX)} + 7.0e3 + fid * 3.0e0 END AS x,
    CASE WHEN fid < {N_POLY}
         THEN (({_lit(AY)} + (fid // 20) * 5.0e1) - {_lit(HALF)}) + {_lit(HALF)}
         ELSE {_lit(AY)} - 2.5e3 + fid * 2.0e0 END AS y
  FROM g
)
SELECT fid, street, housenumber, district,
       round(x, 3) AS x3, round(y, 3) AS y3,
       round({lat_sql}, 6) AS lat6, round({lon_sql}, 6) AS lon6
FROM feat
"""


QUERIES = {"gpkg_points": q_gpkg_points}
ORACLE = {"gpkg_points": _oracle()}
