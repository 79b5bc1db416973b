"""Corrections-fold and carry-forward-split query family.

The corrections fold is the reference's predicate-driven UPDATE interpreter
(scripts/04_compare_optimized.py:46-211) — here a static, order-significant
correction list applied by operators/corrections.apply_corrections; the
oracle replays the same sequence as layered CASE CTEs, including the radius
selector resolved via scalar subqueries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.corrections import apply_corrections
from .operators.expand import carry_forward_split
from .sources import derived

CARRY_RE_SQL = r"^\s*([^\d].*?)\s+([0-9].*)$"

# Order-significant test corrections: every selector class × action class,
# with sequential overlap (corr4 selects rows renamed by corr1).
CORRECTIONS = [
    {"from_street": "Lindenallee", "city": "D3", "to_street": "Linden-Allee",
     "tag": "renamed", "comment": "c1"},
    {"replace_in_street": "Feldweg", "replace_with": "Feldstraße"},
    {"from_street": "Am Markt", "ignore": True, "comment": "bulk ignore"},
    {"from_street": "Linden-Allee", "from_housenumber": "2, 4",
     "to_housenumber": "3"},
]


def q_corrections_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    derived.register_derived_views(spark, sf_dir)
    alkis = spark.table("alkis")
    # Radius-selector correction: reference row = min alkis_id among
    # 'Hauptstraße' rows (deterministic at every SF). The Spark fold
    # resolves its coordinates driver-side; the oracle uses scalar
    # subqueries — same semantics, independent mechanism.
    ref_id = (
        alkis.filter(F.col("street") == "Hauptstraße")
        .agg(F.min("alkis_id"))
        .collect()[0][0]
    )
    corrections = CORRECTIONS + [
        {"from_street": "Hauptstraße", "reference_alkis_id": ref_id,
         "to_street": "Hauptstraße Nord", "tag": "radius"}
    ]
    out = apply_corrections(alkis, corrections)
    return out.select(
        "okey", "street", "housenumber", "correction_type",
        "correction_comment", "original_street", "original_housenumber",
    )


def q_carry_forward_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    derived.register_derived_views(spark, sf_dir)
    raw = spark.table("carry_raw")
    return carry_forward_split(raw).select("pkey", "street", "housenumber")


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

# Reference row = min alkis_id among 'Hauptstraße' rows; its coordinates are
# the lexicographic (lon, lat) minimum across duplicate-id rows — the same
# deterministic tie-break operators/corrections._collect_ref_points uses.
_REF_ID = "(SELECT min(alkis_id) FROM alkis WHERE street = 'Hauptstraße')"
_REF_LON = f"(SELECT min(lon) FROM alkis WHERE alkis_id = {_REF_ID})"
_REF_LAT = (
    f"(SELECT min(lat) FROM alkis WHERE alkis_id = {_REF_ID} "
    f"AND lon = {_REF_LON})"
)

ORACLE: dict[str, str] = {}

ORACLE["corrections_fold"] = f"""{derived.oracle_prelude_alkis_osm()},
c0 AS (
  SELECT okey, street, housenumber, district, lon, lat,
         CAST(NULL AS VARCHAR) AS correction_type,
         CAST(NULL AS VARCHAR) AS correction_comment,
         CAST(NULL AS VARCHAR) AS original_street,
         CAST(NULL AS VARCHAR) AS original_housenumber
  FROM alkis
),
c1 AS (
  SELECT okey, district, lon, lat, housenumber,
    CASE WHEN m THEN 'Linden-Allee' ELSE street END AS street,
    CASE WHEN m THEN 'renamed' ELSE correction_type END AS correction_type,
    CASE WHEN m THEN 'c1' ELSE correction_comment END AS correction_comment,
    CASE WHEN m AND original_street IS NULL THEN street ELSE original_street END
      AS original_street,
    CASE WHEN m AND original_housenumber IS NULL THEN housenumber
         ELSE original_housenumber END AS original_housenumber
  FROM (SELECT *, street = 'Lindenallee' AND district = 'D3' AS m FROM c0)
),
c2 AS (
  SELECT okey, district, lon, lat, housenumber,
    CASE WHEN m THEN replace(street, 'Feldweg', 'Feldstraße') ELSE street END
      AS street,
    CASE WHEN m THEN 'corrected' ELSE correction_type END AS correction_type,
    correction_comment,
    CASE WHEN m AND original_street IS NULL THEN street ELSE original_street END
      AS original_street,
    original_housenumber
  FROM (SELECT *, contains(street, 'Feldweg') AS m FROM c1)
),
c3 AS (
  SELECT okey, district, lon, lat, housenumber, street,
    CASE WHEN m THEN 'ignored' ELSE correction_type END AS correction_type,
    CASE WHEN m THEN 'bulk ignore' ELSE correction_comment END
      AS correction_comment,
    CASE WHEN m AND original_street IS NULL THEN street ELSE original_street END
      AS original_street,
    CASE WHEN m AND original_housenumber IS NULL THEN housenumber
         ELSE original_housenumber END AS original_housenumber
  FROM (SELECT *, street = 'Am Markt' AS m FROM c2)
),
c4 AS (
  SELECT okey, district, lon, lat, street,
    CASE WHEN m THEN '3' ELSE housenumber END AS housenumber,
    CASE WHEN m THEN 'corrected' ELSE correction_type END AS correction_type,
    correction_comment,
    CASE WHEN m AND original_street IS NULL THEN street ELSE original_street END
      AS original_street,
    CASE WHEN m AND original_housenumber IS NULL THEN housenumber
         ELSE original_housenumber END AS original_housenumber
  FROM (SELECT *, street = 'Linden-Allee' AND housenumber = '2, 4' AS m FROM c3)
),
c5 AS (
  SELECT okey,
    CASE WHEN m THEN 'Hauptstraße Nord' ELSE street END AS street,
    housenumber,
    CASE WHEN m THEN 'radius' ELSE correction_type END AS correction_type,
    correction_comment,
    CASE WHEN m AND original_street IS NULL THEN street ELSE original_street END
      AS original_street,
    CASE WHEN m AND original_housenumber IS NULL THEN housenumber
         ELSE original_housenumber END AS original_housenumber
  FROM (SELECT *,
          street = 'Hauptstraße'
          AND sqrt(pow(lon - {_REF_LON}, 2) + pow(lat - {_REF_LAT}, 2)) < 0.02e0
          AS m
        FROM c4)
)
SELECT okey, street, housenumber, correction_type, correction_comment,
       original_street, original_housenumber
FROM c5
"""

ORACLE["carry_forward_split"] = (
    derived.oracle_prelude_carry()
    + """,
complexr AS (
  SELECT pkey, street,
    list_filter(
      list_transform(string_split(replace(housenumber, ';', ','), ','),
                     x -> trim(x)),
      x -> x <> '') AS plist
  FROM carry_raw WHERE regexp_matches(housenumber, '[,;]')
),
plain AS (
  SELECT pkey, street, housenumber FROM carry_raw
  WHERE NOT regexp_matches(housenumber, '[,;]')
),
flat AS (
  SELECT pkey, street, u['part'] AS part, u['pos'] AS pos
  FROM (
    SELECT pkey, street,
           unnest(list_transform(plist, (x, i) -> {'part': x, 'pos': i})) AS u
    FROM complexr
  )
),
marked AS (
  SELECT pkey, street, part, pos,
    CASE WHEN pos > 1 AND regexp_extract(part, '"""
    + CARRY_RE_SQL
    + """', 1) <> ''
         THEN regexp_extract(part, '"""
    + CARRY_RE_SQL
    + """', 1) END AS cand
  FROM flat
),
resolved AS (
  SELECT pkey,
    coalesce(
      last_value(cand IGNORE NULLS) OVER (
        PARTITION BY pkey ORDER BY pos
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      street) AS street,
    CASE WHEN cand IS NOT NULL THEN regexp_extract(part, '"""
    + CARRY_RE_SQL
    + """', 2) ELSE part END AS housenumber
  FROM marked
)
SELECT pkey, street, housenumber FROM resolved
UNION ALL
SELECT pkey, street, housenumber FROM plain
"""
)

QUERIES = {
    "corrections_fold": q_corrections_fold,
    "carry_forward_split": q_carry_forward_split,
}
