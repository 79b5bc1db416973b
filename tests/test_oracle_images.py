"""Driver-gate replica for PIP family; codec invariants tested separately."""

import pytest

from osm_coverage_spark import queries_images as qi
from tests.oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(qi.ORACLE))
def test_pip_query_matches_oracle(spark, sf_dir, name):
    problems = check_query(spark, sf_dir, qi.QUERIES[name], qi.ORACLE[name])
    assert not problems, f"{name}: " + "; ".join(problems)
