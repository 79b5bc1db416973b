"""PIP / raster↔vector joins + image-codec pipeline queries.

``pip_zones`` runs the real applyInPandas ray-cast machinery; with the
derived rectangle polygons it is provably equal to the strict-bbox DuckDB
oracle (edges offset off the coordinate lattice), so the Arrow-UDF path is
oracle-verified. The codec queries (`image_decode_verify`,
`image_features`, `image_frame_sample`) are genuinely non-SQL-expressible
(binary round-trip through numpy) → no oracle entry, rows-only driver check;
their invariants are asserted in tests/test_images.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .geo.pip import pip_join
from .images import ops
from .sources import derived


def _images(spark: SparkSession, sf_dir: str) -> DataFrame:
    derived.register_derived_views(spark, sf_dir)
    return spark.table("images")


def _polys_with_ring(spark: SparkSession) -> DataFrame:
    p = spark.table("polys")
    mk = lambda lon, lat: F.struct(  # noqa: E731
        F.col(lon).alias("lon"), F.col(lat).alias("lat")
    )
    return p.select(
        "zone",
        F.array(
            mk("lon_min", "lat_min"),
            mk("lon_max", "lat_min"),
            mk("lon_max", "lat_max"),
            mk("lon_min", "lat_max"),
        ).alias("ring"),
    )


def q_pip_zones(spark: SparkSession, sf_dir: str) -> DataFrame:
    img = _images(spark, sf_dir)
    return pip_join(
        img, _polys_with_ring(spark), point_id="image_id", poly_name="zone",
        fallback="none",
    )


def q_raster_vector_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster-tile ↔ vector join: per (zone × coarse tile) image counts —
    the PIP hits re-aggregated along both the vector (zone) and raster
    (geocell) axes."""
    from .geo import cells

    img = _images(spark, sf_dir)
    hits = pip_join(
        img, _polys_with_ring(spark), point_id="image_id", poly_name="zone",
        fallback=None,
    )
    tiled = img.select(
        "image_id", cells.cell_expr(F.col("lat"), F.col("lon"), 12).alias("tile")
    )
    return (
        hits.join(tiled, "image_id")
        .groupBy("zone", "tile")
        .agg(F.count(F.lit(1)).alias("n_images"))
    )


def q_image_decode_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """encode → decode → verify loop (rows-only check; pytest asserts the
    PSNR/caption invariants)."""
    img = _images(spark, sf_dir)
    return ops.decode_verify(ops.with_encoded_bytes(img))


def q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    img = _images(spark, sf_dir)
    feats = ops.extract_features(ops.with_encoded_bytes(img))
    return feats.select(
        "image_id",
        F.col("phash").alias("dct_phash"),
        F.round(F.aggregate(F.col("feature"), F.lit(0.0),
                            lambda a, x: a + x.cast("double")), 2).alias("feat_sum"),
    )


def q_image_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    img = _images(spark, sf_dir)
    return ops.frame_sample(ops.with_encoded_bytes(img))


# --------------------------------------------------------------------------
# Oracles (PIP family only; codec queries are rows-only by design)
# --------------------------------------------------------------------------

from .geo import cells as _cells  # noqa: E402

ORACLE: dict[str, str] = {}

ORACLE["pip_zones"] = f"""{derived.oracle_prelude_polys()}
SELECT i.image_id, coalesce(p.zone, 'none') AS zone
FROM images i LEFT JOIN polys p
  ON i.lon > p.lon_min AND i.lon < p.lon_max
 AND i.lat > p.lat_min AND i.lat < p.lat_max
"""

ORACLE["raster_vector_join"] = f"""{derived.oracle_prelude_polys()}
SELECT p.zone, {_cells.cell_sql('i.lat', 'i.lon', 12)} AS tile,
       CAST(count(*) AS BIGINT) AS n_images
FROM images i JOIN polys p
  ON i.lon > p.lon_min AND i.lon < p.lon_max
 AND i.lat > p.lat_min AND i.lat < p.lat_max
GROUP BY 1, 2
"""

QUERIES = {
    "pip_zones": q_pip_zones,
    "raster_vector_join": q_raster_vector_join,
    "image_decode_verify": q_image_decode_verify,
    "image_features": q_image_features,
    "image_frame_sample": q_image_frame_sample,
}
