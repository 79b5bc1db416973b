"""Driver-gate replica for the events operator family (sessionize,
interval/range join, exact grouped quantiles, pivot)."""

import pytest

from osm_coverage_spark import queries_events as qe
from tests.oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(qe.QUERIES))
def test_events_query_matches_oracle(spark, sf_dir, name):
    problems = check_query(spark, sf_dir, qe.QUERIES[name], qe.ORACLE[name])
    assert not problems, f"{name}: " + "; ".join(problems)
