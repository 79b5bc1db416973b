"""Central query registry: name → (Spark callable, DuckDB oracle SQL).

Aggregates the per-family modules. Every entry in QUERIES has either a
matching ORACLE entry (driver runs both and compares) or is a documented
rows-only check (non-SQL-expressible op).
"""

from __future__ import annotations

from . import queries_coverage, queries_corrections, queries_gpkg, queries_graft, queries_history, queries_images, queries_misc, queries_pbf, queries_text, queries_tpch

QUERIES = {}
ORACLE = {}

for mod in (queries_coverage, queries_corrections, queries_gpkg, queries_graft, queries_history, queries_images, queries_misc, queries_pbf, queries_text, queries_tpch):
    QUERIES.update(mod.QUERIES)
    ORACLE.update(mod.ORACLE)
