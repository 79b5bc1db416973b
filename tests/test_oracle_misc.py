"""Driver-gate replica for the misc operator family (cleaners, schema
normalize, row dedup, bucketed ANN)."""

import pytest

from osm_coverage_spark import queries_misc as qm
from tests.oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(qm.QUERIES))
def test_misc_query_matches_oracle(spark, sf_dir, name):
    problems = check_query(spark, sf_dir, qm.QUERIES[name], qm.ORACLE[name])
    assert not problems, f"{name}: " + "; ".join(problems)
