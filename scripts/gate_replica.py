"""Full replica of the driver's correctness gate: every in-window registry
query run on Spark AND its DuckDB oracle at sf0.01, value-compared.

Usage: python scripts/gate_replica.py [sf_dir]  → one JSON line per query
+ a PASS/FAIL summary line. Run SOLO (no concurrent pytest/bench — see
memory notes on leftover-JVM competition)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from oracle_utils import check_query  # noqa: E402

from osm_coverage_spark import registry  # noqa: E402
from osm_coverage_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="gate_replica", master="local[8]",
                      shuffle_partitions=8)
    failures = []
    for name, fn in registry.QUERIES.items():
        t0 = time.perf_counter()
        try:
            problems = check_query(spark, sf_dir, fn, registry.ORACLE[name])
        except Exception as exc:  # noqa: BLE001
            problems = [f"exception: {exc!r}"]
        dt = round(time.perf_counter() - t0, 2)
        status = "ok" if not problems else "FAIL"
        print(json.dumps({"q": name, "status": status, "sec": dt,
                          "problems": problems[:2]}), flush=True)
        if problems:
            failures.append(name)
    spark.stop()
    print(f"SUMMARY: {len(registry.QUERIES) - len(failures)}/"
          f"{len(registry.QUERIES)} green; failures: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
