"""Driver-gate replica for the text/dedup/ANN query family."""

import pytest

from osm_coverage_spark import queries_text as qt
from tests.oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(qt.QUERIES))
def test_text_query_matches_oracle(spark, sf_dir, name):
    problems = check_query(spark, sf_dir, qt.QUERIES[name], qt.ORACLE[name])
    assert not problems, f"{name}: " + "; ".join(problems)
