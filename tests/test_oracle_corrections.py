"""Driver-gate replica for corrections-fold / carry-forward-split."""

import pytest

from osm_coverage_spark import queries_corrections as qx
from tests.oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(qx.QUERIES))
def test_corrections_query_matches_oracle(spark, sf_dir, name):
    problems = check_query(spark, sf_dir, qx.QUERIES[name], qx.ORACLE[name])
    assert not problems, f"{name}: " + "; ".join(problems)
