"""Driver-gate replica for the events operator family (sessionize,
interval/range join, exact grouped quantiles, pivot)."""

import pytest

from osm_coverage_spark import queries_events as qe
from tests.oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(qe.QUERIES))
def test_events_query_matches_oracle(spark, sf_dir, name):
    problems = check_query(spark, sf_dir, qe.QUERIES[name], qe.ORACLE[name])
    assert not problems, f"{name}: " + "; ".join(problems)


def test_approx_percentile_validated_by_exact_baseline(spark, sf_dir):
    """The 100 TB quantile path is approx_percentile (fixed-size sketch, no
    per-group sort); the oracle-exact rank-selection query is its ground
    truth. Rank error is bounded by n/accuracy, so with accuracy=100 the
    approx values must sit within a few ranks of the exact ones."""
    from pyspark.sql import functions as F

    from osm_coverage_spark import queries_events as qe

    exact = {
        r["event_type"]: r.asDict()
        for r in qe.q_events_quantiles(spark, sf_dir).collect()
    }
    ev = qe._events_us(spark, sf_dir)
    approx = ev.groupBy("event_type").agg(
        F.percentile_approx("val_e2", [q for _, q in qe.QUANTILES], 100).alias("ap")
    )
    for r in approx.collect():
        ex = exact[r["event_type"]]
        n = ex["n"]
        vals = sorted(
            v[0]
            for v in ev.filter(F.col("event_type") == r["event_type"])
            .select("val_e2")
            .collect()
        )
        for (label, q), av in zip(qe.QUANTILES, r["ap"]):
            # approx value must lie within +-ceil(n/100)+1 ranks of exact
            exact_idx = int((n - 1) * q)
            tol = n // 100 + 2
            lo = vals[max(0, exact_idx - tol)]
            hi = vals[min(n - 1, exact_idx + tol)]
            assert lo <= av <= hi, (r["event_type"], label, av, ex[f"{label}_e2"])
