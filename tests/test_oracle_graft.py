"""Driver-gate replica for the graft/image query family at sf0.001."""

import pytest

from osm_coverage_spark import queries_graft as qg
from tests.oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(qg.QUERIES))
def test_graft_query_matches_oracle(spark, sf_dir, name):
    problems = check_query(spark, sf_dir, qg.QUERIES[name], qg.ORACLE[name])
    assert not problems, f"{name}: " + "; ".join(problems)
