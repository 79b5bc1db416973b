"""Driver-gate replica for the TPC-H classic query family."""

import pytest

from osm_coverage_spark import queries_tpch as qp
from tests.oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(qp.QUERIES))
def test_tpch_query_matches_oracle(spark, sf_dir, name):
    problems = check_query(spark, sf_dir, qp.QUERIES[name], qp.ORACLE[name])
    assert not problems, f"{name}: " + "; ".join(problems)
