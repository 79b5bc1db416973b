"""Sinks: partitioned parquet, per-district GeoJSON-shaped exports, stats
and history JSON artifacts (reference T3/T4 shapes, SURVEY §1.1).

Scale posture: the per-district feature files are written distributed
(``partitionBy(state, district)`` JSONL of GeoJSON Feature objects — one
directory per district, any number of part files); the site-compatible
FeatureCollection / stats documents are small driver-side assemblies over
already-aggregated rows, exactly like the reference's JSON writes
(scripts/04_compare_optimized.py:610-615, 707-712).
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned_parquet(df: DataFrame, path: str,
                              partition_cols: tuple[str, ...] = ("state", "district"),
                              mode: str = "overwrite") -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def feature_json_expr() -> F.Column:
    """GeoJSON Feature document per row — built JVM-side with to_json, no
    driver involvement (columns per 04_compare_optimized.py:596-608)."""
    props = F.struct(
        F.col("street"),
        F.col("housenumber"),
        F.col("matched"),
        F.col("correction_type"),
        F.col("correction_comment"),
        F.col("original_street"),
        F.col("original_housenumber"),
        F.col("alkis_id"),
    )
    geometry = F.struct(
        F.lit("Point").alias("type"),
        F.array(F.col("lon"), F.col("lat")).alias("coordinates"),
    )
    return F.to_json(
        F.struct(
            F.lit("Feature").alias("type"),
            geometry.alias("geometry"),
            props.alias("properties"),
        )
    )


def write_district_features(export_df: DataFrame, out_dir: str) -> None:
    """Distributed per-district feature files: JSONL of Features under
    ``state=<s>/district=<d>/``. The 100 TB path — no collect."""
    (
        export_df.withColumn("feature", feature_json_expr())
        .select("state", "district", "feature")
        .write.mode("overwrite")
        .partitionBy("state", "district")
        .text(out_dir)
    )


def sanitize_filename_expr(col: F.Column) -> F.Column:
    """non-alnum → '_' (04_compare_optimized.py:488)."""
    return F.regexp_replace(col, "[^a-zA-Z0-9]", "_")


def district_stats_records(stats_df: DataFrame) -> list[dict[str, Any]]:
    """T4 `{state}_districts.json` records, sorted by name (04:497-507,710)."""
    rows = (
        stats_df.withColumn("filename",
                            F.concat(sanitize_filename_expr(F.col("district")),
                                     F.lit(".geojson")))
        .collect()
    )
    out = []
    for r in rows:
        out.append(
            {
                "name": r["district"],
                "state": r["state"],
                "district": r["district"],
                "total": r["total"],
                "missing": r["missing"],
                "coverage": r["coverage"],
                "corrections": r["corrections"],
                "path": f"states/{r['state']}/districts/{r['filename']}",
                "filename": r["filename"],
            }
        )
    return sorted(out, key=lambda x: x["name"])


def assemble_feature_collection(features_dir: str, state: str, district: str) -> dict:
    """Site-compat FeatureCollection for ONE district from the distributed
    feature files (driver-side, small — one district's rows)."""
    base = os.path.join(features_dir, f"state={state}", f"district={district}")
    features: list[dict] = []
    if os.path.isdir(base):
        for name in sorted(os.listdir(base)):
            if not name.endswith(".txt") and not name.startswith("part-"):
                continue
            with open(os.path.join(base, name), encoding="utf-8") as f:
                for line in f:
                    line = line.strip()
                    if line:
                        features.append(json.loads(line))
    return {"type": "FeatureCollection", "features": features}


def write_history_json(history_df: DataFrame, path: str) -> None:
    """`{state}_history.json` shape: {"global": [...], "districts": {name:
    [...]}} (04:447,707-708). History tables are tiny (days × scopes)."""
    rows = [r.asDict() for r in history_df.orderBy("name", "date").collect()]
    store: dict[str, Any] = {"global": [], "districts": {}}
    for r in rows:
        entry = {k: r[k] for k in ("date", "total", "missing", "coverage", "corrections") if k in r}
        if r.get("scope") == "global" or r["name"] == "global":
            store["global"].append(entry)
        else:
            store["districts"].setdefault(r["name"], []).append(entry)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(store, f, indent=2, ensure_ascii=False)
