"""Driver-gate replica for the GPKG scan family: distributed sqlite scan +
centroid + column-math WGS84 reprojection vs a pure-arithmetic DuckDB
oracle (same inverse-Krüger SQL emitter)."""

import pytest

from osm_coverage_spark import queries_gpkg as qg
from tests.oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(qg.QUERIES))
def test_gpkg_query_matches_oracle(spark, sf_dir, name):
    problems = check_query(spark, sf_dir, qg.QUERIES[name], qg.ORACLE[name])
    assert not problems, f"{name}: " + "; ".join(problems)
