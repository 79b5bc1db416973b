"""Registry invariants: the driver's correctness gate records the first 50
entries of `__spark_entry__.queries()`, so the registry must stay at <= 50
with an oracle for every entry, and every RETIRED entry must remain
oracle-tested through its home module (tests/test_oracle_*.py parametrize
over the module QUERIES dicts, which keep the retired names)."""

import __spark_entry__ as entry
from osm_coverage_spark import registry


def test_registry_fits_driver_gate_window():
    q = entry.queries()
    assert len(q) <= registry.DRIVER_GATE_CAP
    assert set(entry.oracle_sql()) == set(q)  # every entry oracle-paired


def test_retired_entries_stay_module_tested():
    assert not set(registry.RETIRED) & set(registry.QUERIES)
    assert set(registry.RETIRED_QUERIES) == registry.RETIRED
    assert set(registry.RETIRED_ORACLE) == registry.RETIRED
    # each retired name still sits in its home module's QUERIES dict,
    # which the per-family oracle tests parametrize over
    from osm_coverage_spark import (queries_coverage, queries_events,
                                    queries_graft, queries_history,
                                    queries_images, queries_misc,
                                    queries_text, queries_tpch)

    module_names = (
        set(queries_tpch.QUERIES)
        | set(queries_misc.QUERIES)
        | set(queries_graft.QUERIES)
        | set(queries_images.QUERIES)
        | set(queries_text.QUERIES)
        | set(queries_coverage.QUERIES)
        | set(queries_history.QUERIES)
        | set(queries_events.QUERIES)
    )
    assert registry.RETIRED <= module_names
