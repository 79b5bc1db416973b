"""Replicates the driver's correctness gate locally at sf0.001:
every coverage-family query's Spark plan vs its DuckDB oracle SQL."""

import pytest

from osm_coverage_spark import queries_coverage as qc
from tests.oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(qc.QUERIES))
def test_coverage_query_matches_oracle(spark, sf_dir, name):
    problems = check_query(spark, sf_dir, qc.QUERIES[name], qc.ORACLE[name])
    assert not problems, f"{name}: " + "; ".join(problems)
