"""Driver-gate replica for the history/time-series query family."""

import pytest

from osm_coverage_spark import queries_history as qh
from tests.oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(qh.QUERIES))
def test_history_query_matches_oracle(spark, sf_dir, name):
    problems = check_query(spark, sf_dir, qh.QUERIES[name], qh.ORACLE[name])
    assert not problems, f"{name}: " + "; ".join(problems)
