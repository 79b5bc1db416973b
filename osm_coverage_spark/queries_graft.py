"""Graft-payload query family: H3-style tiling, cell-ring kNN, phash
near-dup over the image+caption table (BASELINE.json input_hint schema,
derived deterministically from `documents` — sources/derived.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .geo import cells
from .geo.distance import haversine_m_sql
from .operators.knn import knn_join
from .operators.skew import banded_self_pairs
from .sources import derived

TILE_RES = 15   # ~1.2 km cells — per-tile work units
COARSE_RES = 12  # ~9.6 km cells — hotspot-visible stats
KNN_RES = 14
KNN_RING = 1
PHASH_BAND = 1048576  # 2^20: three 20-bit bands over the 60-bit phash


def _images(spark: SparkSession, sf_dir: str) -> DataFrame:
    derived.register_derived_views(spark, sf_dir)
    return spark.table("images")


def q_image_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    img = _images(spark, sf_dir)
    return img.select(
        "image_id",
        cells.cell_expr(F.col("lat"), F.col("lon"), TILE_RES).alias("cell"),
    )


def q_image_tile_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    img = _images(spark, sf_dir)
    return (
        img.withColumn(
            "cell", cells.cell_expr(F.col("lat"), F.col("lon"), COARSE_RES)
        )
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_images"))
    )


def q_knn_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    img = _images(spark, sf_dir)
    queries = img.filter(
        (F.substring(F.col("image_id"), -1, 1) == "0")
        & (F.substring(F.col("image_id"), -2, 2) != "_b")
    )
    return knn_join(img_queries_safe(queries), img, id_col="image_id",
                    k_neighbors=3, res=KNN_RES, ring_k=KNN_RING)


def img_queries_safe(queries: DataFrame) -> DataFrame:
    return queries.select("image_id", "lat", "lon")


def q_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-≤2 phash pairs via 3×20-bit band LSH self-join.

    Pigeonhole: any two 60-bit hashes within hamming distance 2 agree on at
    least one of the three 20-bit bands, so the banded join finds exactly
    the brute-force result (the DuckDB oracle IS the brute-force cross
    join — algorithm-diverse verification). Bands are unpivoted to
    (band_no, band_val) rows and paired through the hot-bucket-guarded
    self-join (operators/skew.banded_self_pairs): a degenerate band (e.g. a
    black-frame phash shared by millions of images) is block-split across
    tasks instead of emitting S² pairs in one."""
    img = _images(spark, sf_dir).select("image_id", "phash")
    bands = img.select(
        "image_id",
        "phash",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("band_no"),
                    (F.col("phash") % F.lit(PHASH_BAND)).alias("band_val"),
                ),
                F.struct(
                    F.lit(1).alias("band_no"),
                    (F.shiftright(F.col("phash"), 20) % F.lit(PHASH_BAND)).alias(
                        "band_val"
                    ),
                ),
                F.struct(
                    F.lit(2).alias("band_no"),
                    F.shiftright(F.col("phash"), 40).alias("band_val"),
                ),
            )
        ).alias("_b"),
    ).select("image_id", "phash", "_b.band_no", "_b.band_val")
    pairs = banded_self_pairs(
        bands, ["band_no", "band_val"], "image_id", payload_cols=("phash",)
    )
    return (
        pairs.filter(F.bit_count(F.expr("phash_a ^ phash_b")) <= 2)
        .select("id_a", "id_b")
        .distinct()
    )


PYRAMID_LEVELS = (15, 12, 9, 6)  # zoom pyramid: 64 children per step


def q_tile_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical zoom-level rollup — the map-tile pyramid build every
    tile server runs (count + pixel volume per cell at every zoom).

    Scale shape: the base table is scanned and shuffled ONCE (finest
    level); the coarser levels are derived from that AGGREGATE — each
    base cell explodes into its 4 (res, ancestor-cell) pairs via pure
    cell-id arithmetic (geo/cells.parent_expr) and one second, tiny
    shuffle groups them. Total cost at 100 TB: one full shuffle of the
    narrow (cell) projection + one shuffle of ~4× the base CELL count
    (map-side combine collapses it further) — never a re-scan, never a
    per-level pass. A naive per-level union re-plans the base aggregate
    once per branch (Catalyst duplicates the subtree; measured 10 scans
    for 4 levels), which is why the explode-from-aggregate shape is the
    right one. The equal-angle grid guarantees parent_expr(cell(p, r))
    == cell(p, r-3) bit-for-bit (power-of-two cell edges: FP division
    by 2^k rescales the exponent only), which the oracle exploits by
    computing EVERY level straight from lat/lon — an independent
    derivation of the same pyramid.
    """
    return pyramid_counts(_images(spark, sf_dir))


def pyramid_counts(img: DataFrame, sign_col: str | None = None) -> DataFrame:
    """The pyramid aggregation over any (lat, lon, w, h) point set.

    ``sign_col`` (+1/-1 per row) turns the same plan into a DELTA
    pyramid over a changelog batch (insert=+1, delete=-1) — the
    incremental-view-maintenance path (streaming/incremental.
    maintain_pyramid); None is the plain full build."""
    sign = F.col(sign_col) if sign_col else F.lit(1)
    base_res = PYRAMID_LEVELS[0]
    base = (
        img.withColumn(
            "cell", cells.cell_expr(F.col("lat"), F.col("lon"), base_res)
        )
        .groupBy("cell")
        .agg(
            F.sum(sign).cast("long").alias("n_images"),
            F.sum(sign * F.col("w").cast("long") * F.col("h")).alias("px_sum"),
        )
    )
    ancestors = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("res"),
                        cells.parent_expr(F.col("cell"), base_res, r).alias(
                            "cell"
                        ),
                    )
                    for r in PYRAMID_LEVELS
                ]
            )
        ).alias("_lv"),
        "n_images",
        "px_sum",
    ).select("_lv.res", "_lv.cell", "n_images", "px_sum")
    return ancestors.groupBy("res", "cell").agg(
        F.sum("n_images").cast("long").alias("n_images"),
        F.sum("px_sum").cast("long").alias("px_sum"),
    )


HEAT_W_CENTER, HEAT_W_EDGE, HEAT_W_CORNER = 4, 2, 1


def q_tile_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster convolution on the cell grid: 3x3 neighbor-weighted
    smoothing (integer kernel 4/2/1 — center/edge/corner) of the coarse
    tile counts, i.e. the heatmap/KDE pass every density map runs.

    Scale shape: convolution as SCATTER-ADD ON THE AGGREGATE — the base
    table is shuffled once into per-cell counts, then each cell explodes
    to its 9 (neighbor, weight) contributions via pure cell-id
    arithmetic (neighbor = cell + dx*IX_BASE + dy) and one second, tiny
    shuffle (9x the CELL count, map-side combined) sums the heat. Never
    a convolution over raw points, never a self-join of the raster. The
    integer kernel keeps the oracle exact (no FP in compared columns)."""
    img = _images(spark, sf_dir)
    counts = (
        img.withColumn(
            "cell", cells.cell_expr(F.col("lat"), F.col("lon"), COARSE_RES)
        )
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    contribs = counts.select(
        "cell",
        "n",
        F.explode(F.sequence(F.lit(0), F.lit(8))).alias("k"),
    ).select(
        (
            F.col("cell")
            + F.expr("k DIV 3") * cells.IX_BASE
            - cells.IX_BASE
            + (F.col("k") % 3) - 1
        ).alias("cell"),
        F.when(F.col("k") == 4, F.lit(HEAT_W_CENTER))
        .when((F.col("k") % 2) == 1, F.lit(HEAT_W_EDGE))
        .otherwise(F.lit(HEAT_W_CORNER))
        .alias("w"),
        "n",
    )
    return contribs.groupBy("cell").agg(
        F.sum(F.col("n") * F.col("w")).cast("long").alias("heat")
    )


def q_image_meta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    img = _images(spark, sf_dir)
    return img.groupBy("fmt").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("w").cast("double") / F.count(F.lit(1)), 4).alias("avg_w"),
        F.round(F.sum("h").cast("double") / F.count(F.lit(1)), 4).alias("avg_h"),
        F.count_distinct(
            cells.cell_expr(F.col("lat"), F.col("lon"), COARSE_RES)
        ).alias("n_cells"),
    )


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

def _prelude() -> str:
    return derived.oracle_prelude_images()


_CELL_TILE = cells.cell_sql("lat", "lon", TILE_RES)
_CELL_COARSE = cells.cell_sql("lat", "lon", COARSE_RES)
_CELL_KNN = cells.cell_sql("lat", "lon", KNN_RES)

ORACLE: dict[str, str] = {}

ORACLE["image_tile_assign"] = f"""{_prelude()}
SELECT image_id, {_CELL_TILE} AS cell FROM images
"""

ORACLE["image_tile_counts"] = f"""{_prelude()}
SELECT {_CELL_COARSE} AS cell, CAST(count(*) AS BIGINT) AS n_images
FROM images GROUP BY 1
"""

# convolution oracle: identical scatter-add spelled over unnest(range(0,9))
ORACLE["tile_heatmap"] = f"""{_prelude()},
counts AS (
  SELECT {_CELL_COARSE} AS cell, CAST(count(*) AS BIGINT) AS n
  FROM images GROUP BY 1
),
contrib AS (
  SELECT cell + (k // 3 - 1) * {cells.IX_BASE} + (k % 3 - 1) AS cell,
         CASE WHEN k = 4 THEN 4 WHEN k % 2 = 1 THEN 2 ELSE 1 END AS w, n
  FROM (SELECT cell, n, unnest(range(0, 9)) AS k FROM counts)
)
SELECT cell, CAST(sum(n * w) AS BIGINT) AS heat FROM contrib GROUP BY cell
"""


_KNN_DIST = haversine_m_sql("q.lat", "q.lon", "t.lat", "t.lon")

ORACLE["knn_images"] = f"""{_prelude()},
queries AS (
  SELECT image_id, lat, lon, {_CELL_KNN} AS qcell FROM images
  WHERE substr(image_id, length(image_id), 1) = '0'
    AND substr(image_id, length(image_id) - 1, 2) <> '_b'
),
targets AS (
  SELECT image_id, lat, lon, {_CELL_KNN} AS tcell FROM images
),
cand AS (
  SELECT q.image_id AS query_id, t.image_id AS neighbor_id,
         round({_KNN_DIST}, 3) AS dist_mm
  FROM queries q
  CROSS JOIN (SELECT unnest(generate_series(-{KNN_RING}, {KNN_RING})) AS _dx) _dxs
  CROSS JOIN (SELECT unnest(generate_series(-{KNN_RING}, {KNN_RING})) AS _dy) _dys
  JOIN targets t ON t.tcell = q.qcell + _dx * {cells.IX_BASE} + _dy
  WHERE t.image_id <> q.image_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dist_mm ASC, neighbor_id ASC) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 3
"""

ORACLE["phash_neardup"] = f"""{_prelude()}
SELECT a.image_id AS id_a, b.image_id AS id_b
FROM images a JOIN images b ON a.image_id < b.image_id
WHERE bit_count(xor(a.phash, b.phash)) <= 2
"""

# Each level derived independently from lat/lon (no parent arithmetic).
_PYR_LEVEL_SQL = "\nUNION ALL\n".join(
    f"""SELECT CAST({r} AS INT) AS res, {cells.cell_sql('lat', 'lon', r)} AS cell,
       CAST(count(*) AS BIGINT) AS n_images,
       CAST(sum(CAST(w AS BIGINT) * h) AS BIGINT) AS px_sum
FROM images GROUP BY 2"""
    for r in PYRAMID_LEVELS
)
ORACLE["tile_pyramid"] = f"""{_prelude()}
{_PYR_LEVEL_SQL}
"""

ORACLE["image_meta_stats"] = f"""{_prelude()}
SELECT fmt, CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(w) AS DOUBLE) / count(*), 4) AS avg_w,
       round(CAST(sum(h) AS DOUBLE) / count(*), 4) AS avg_h,
       CAST(count(DISTINCT {_CELL_COARSE}) AS BIGINT) AS n_cells
FROM images GROUP BY fmt
"""

QUERIES = {
    "image_tile_assign": q_image_tile_assign,
    "image_tile_counts": q_image_tile_counts,
    "knn_images": q_knn_images,
    "phash_neardup": q_phash_neardup,
    "tile_pyramid": q_tile_pyramid,
    "tile_heatmap": q_tile_heatmap,
    "image_meta_stats": q_image_meta_stats,
}
