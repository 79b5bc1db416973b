"""Driver-gate replica for the PBF scan family: blob split + wire decode +
tag filter + way shoelace centroids + multipolygon relation assembly vs a
pure-arithmetic DuckDB oracle."""

import pytest

from osm_coverage_spark import queries_pbf as qp
from tests.oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(qp.QUERIES))
def test_pbf_query_matches_oracle(spark, sf_dir, name):
    problems = check_query(spark, sf_dir, qp.QUERIES[name], qp.ORACLE[name])
    assert not problems, f"{name}: " + "; ".join(problems)
