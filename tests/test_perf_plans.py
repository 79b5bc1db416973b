"""Physical-plan assertions: the plans we designed for are the plans Spark
runs (pushdown, broadcast, hash join on (key, cell), codegen, no cartesian),
plus skew-salting result equality."""

from pyspark.sql import functions as F

from osm_coverage_spark import queries_coverage, queries_tpch
from osm_coverage_spark.geo import cells
from osm_coverage_spark.operators import skew
from osm_coverage_spark.sources import derived


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_parquet_filter_and_column_pushdown(spark, sf_dir):
    derived.load_testdata(spark, sf_dir)
    df = spark.table("lineitem").filter(F.col("l_quantity") < 5).select(
        "l_orderkey", "l_quantity"
    )
    plan = _plan(df)
    assert "PushedFilters" in plan and "LessThan(l_quantity" in plan
    assert "l_extendedprice" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_flagship_join_is_single_hash_on_key_and_cell(spark, sf_dir):
    df = queries_coverage.q_coverage_missing(spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan
    # the matched/missing flag is ONE aggregated-exists pass: exactly one
    # ALKIS-vs-OSM join (left outer, hash/SMJ on the (key, cell) equi-keys),
    # not the old semi+anti pair that shuffled both sides twice
    n_joins = (
        plan.count("SortMergeJoin")
        + plan.count("ShuffledHashJoin")
        + plan.count("BroadcastHashJoin")
    )
    assert n_joins == 1, plan
    assert "LeftOuter" in plan
    assert "_onbr" in plan  # ring-expanded cell key participates in the join


def test_tpch_fact_tables_not_hint_broadcast(spark, sf_dir):
    """Broadcast of fact-scale tables must come only from AQE's runtime size
    decision, never a hard-coded hint (a hint OOMs at 100× SF). With the
    auto-broadcast thresholds disabled, any BroadcastExchange left in the
    plan is hint-forced — q3/top_customers must have none, q5 exactly its
    two constant-size dims (region→nation, nation→customer)."""
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        for k in keys:
            spark.conf.set(k, "-1")
        assert "BroadcastExchange" not in _plan(queries_tpch.q_tpch_q3(spark, sf_dir))
        assert "BroadcastExchange" not in _plan(
            queries_tpch.q_top_customers(spark, sf_dir)
        )
        q5 = _plan(queries_tpch.q_tpch_q5(spark, sf_dir))
        assert q5.count("BroadcastExchange") == 2, q5
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_wholestage_codegen_covers_normalize_chain(spark, sf_dir):
    df = queries_coverage.q_normalize_key(spark, sf_dir)
    df.collect()  # AQE reveals codegen stages only in THIS plan's final form
    # Spark 4 marks whole-stage-codegen spans as '*(n)' in the simple plan
    assert "*(1)" in _plan(df)


def test_salted_counts_equal_direct_groupby(spark, sf_dir):
    derived.register_derived_views(spark, sf_dir)
    img = spark.table("images").withColumn(
        "cell", cells.cell_expr(F.col("lat"), F.col("lon"), 12)
    )
    direct = {
        r["cell"]: r["n"]
        for r in img.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {
        r["cell"]: r["n_rows"]
        for r in skew.salted_cell_counts(img, "cell", "image_id").collect()
    }
    assert direct == salted


def test_hot_cell_detection_finds_planted_hotspot(spark, sf_dir):
    derived.register_derived_views(spark, sf_dir)
    img = spark.table("images").withColumn(
        "cell", cells.cell_expr(F.col("lat"), F.col("lon"), 12)
    )
    hot = skew.find_hot_cells(img, "cell", hot_fraction=0.05).collect()
    assert len(hot) >= 1  # the planted ~20% urban blob
    total = img.count()
    assert max(r["cell_rows"] for r in hot) > total * 0.15
