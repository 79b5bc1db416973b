"""Local replica of the driver's Spark-vs-DuckDB correctness comparison."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None else v)
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(
        drop=True
    )


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame,
                   float_tol: float = 1e-9) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return [f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"]
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a = _normalize(spark_pdf)
    b = _normalize(duck_pdf)
    n = min(len(a), len(b))
    for c in a.columns:
        av, bv = a[c].iloc[:n], b[c].iloc[:n]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            bad = 0
            for x, y in zip(av, bv):
                xa = None if x is None or (isinstance(x, float) and math.isnan(x)) else x
                ya = None if y is None or (isinstance(y, float) and math.isnan(y)) else y
                if xa is None and ya is None:
                    continue
                if xa is None or ya is None or not math.isclose(
                    xa, ya, rel_tol=float_tol, abs_tol=float_tol
                ):
                    bad += 1
            if bad:
                problems.append(f"float column {c}: {bad}/{n} values differ")
        else:
            neq = (av.astype(str).fillna("\0") != bv.astype(str).fillna("\0"))
            if neq.any():
                i = int(neq.idxmax())
                problems.append(
                    f"column {c}: {int(neq.sum())}/{n} differ; first at {i}: "
                    f"spark={av.iloc[i]!r} duck={bv.iloc[i]!r}"
                )
    return problems


def check_query(spark, sf_dir: str, spark_fn, oracle_sql: str) -> list[str]:
    sdf = spark_fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    con = duckdb_conn(sf_dir)
    duck_pdf = con.execute(oracle_sql).df()
    con.close()
    return compare_frames(spark_pdf, duck_pdf)
