"""One scaling-bench measurement at a fixed cluster size.

Invoked via ``spark-submit --master local-cluster[E,4,6144] --py-files
dist/osm_coverage_spark.zip`` by scripts/scaling_bench.py: E separate
executor JVMs × 4 cores × 6g — the sandbox analog of an E-executor cluster.
Runs the compute-dense scaling kernels (efficiency claim) plus the
end-to-end pipeline queries (throughput context). Fastest-of-$REPEATS after
one untimed warmup; ONE JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_coverage_spark.queries_scaling import (  # noqa: E402
    SCALING_KERNELS,
    materialize,
    pipeline_workload,
)
from osm_coverage_spark.session import get_spark  # noqa: E402


def timed(df, repeats: int) -> float:
    materialize(df)  # warm every executor JVM (JIT/codegen), untimed
    materialize(df)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        materialize(df)
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    cpus = int(os.environ["SPARK_GRAFT_CPUS"])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))
    os.environ.setdefault("SPARK_GRAFT_INPUT_PARTITIONS", "64")
    # Fixed 128-task shuffle width at both levels: identical logical plans
    # and task counts — only the executor count differs between N and 4N.
    spark = get_spark(app_name=f"scaling_{cpus}", shuffle_partitions=128)

    kernels = {}
    for name, fn in SCALING_KERNELS.items():
        kernels[name] = timed(fn(spark, sf_dir), repeats)
        print(f"  [{cpus}] kernel {name}: {kernels[name]:.2f}s", file=sys.stderr)
    pipeline = {}
    for name, fn in pipeline_workload().items():
        pipeline[name] = timed(fn(spark, sf_dir), repeats)
        print(f"  [{cpus}] pipeline {name}: {pipeline[name]:.2f}s", file=sys.stderr)
    spark.stop()
    print(json.dumps({
        "cpus": cpus,
        "sf_dir": sf_dir,
        "kernels": kernels,
        "pipeline": pipeline,
        "kernel_total_sec": round(sum(kernels.values()), 3),
        "pipeline_total_sec": round(sum(pipeline.values()), 3),
    }))


if __name__ == "__main__":
    main()
