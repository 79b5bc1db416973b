#!/usr/bin/env python
"""Generate a LARGER-scale replica of the driver's deterministic testdata.

The driver's own generator (seed=42, TESTDATA.md) is not in the repo, and
`/root/testdata` is read-only, so scale experiments beyond sf0.1 need a
stand-in. This script synthesizes the same 10-table star schema with the
schemas and column distributions measured from sf0.1 (key ranges, category
frequencies, text vocabulary, per-order line counts), scaled by --mult.
It is NOT bit-identical to driver data — use it only for RELATIVE
before/after timing at scale (bench_extra-style), never for correctness
oracles (those run on the real small SFs).

Usage: python scripts/gen_sf_replica.py --out /root/sfrep/sf1.0 --mult 10
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

VOCAB = np.array([
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
])

DAY_US = 86_400_000_000


def _ts_us(iso: str) -> int:
    return int(np.datetime64(iso, "us").astype(np.int64))


def write(out: str, name: str, table: pa.Table, row_group_rows: int) -> None:
    pq.write_table(
        table, os.path.join(out, f"{name}.parquet"),
        row_group_size=row_group_rows, compression="snappy",
    )
    print(f"  {name}: {table.num_rows} rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--mult", type=float, default=10.0,
                    help="row multiplier vs sf0.1 for the fact tables")
    ap.add_argument("--doc-mult", type=float, default=4.0,
                    help="documents multiplier (driver scales docs sublinearly)")
    ap.add_argument("--emb-mult", type=float, default=2.5,
                    help="embeddings multiplier (sublinear; all-pairs consumers)")
    ap.add_argument("--seed", type=int, default=4242)
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)

    m = args.mult
    n_cust = int(15000 * m)
    n_supp = int(1000 * m)
    n_part = int(20000 * m)
    n_ord = int(150000 * m)
    n_evt = int(100000 * m)
    n_user = int(1500 * m)
    n_doc = int(5000 * args.doc_mult)
    n_emb = int(2000 * args.emb_mult)

    # dimension tables: copy verbatim (fixed 5/25 rows at every SF)
    for t in ("region", "nation"):
        shutil.copy(os.path.join(SRC, f"{t}.parquet"),
                    os.path.join(args.out, f"{t}.parquet"))
        print(f"  {t}: copied")

    # customer
    segs = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
                     "MACHINERY"])
    write(args.out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
        "c_mktsegment": segs[rng.integers(0, len(segs), n_cust)],
    }), 500_000)

    # supplier
    write(args.out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
    }), 500_000)

    # part
    adjs = np.array(["large", "small", "hot", "cold", "blue", "red", "green",
                     "shiny", "dull", "heavy"])
    nouns = np.array(["ring", "bolt", "nut", "gear", "cog", "pin", "rod",
                      "cap", "disk", "plate"])
    types = np.array(["LARGE", "SMALL", "MEDIUM", "ECONOMY", "STANDARD",
                      "PROMO"])
    write(args.out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": np.char.add(np.char.add(
            adjs[rng.integers(0, len(adjs), n_part)], " "),
            nouns[rng.integers(0, len(nouns), n_part)]),
        "p_brand": np.array([f"Brand#{b}" for b in
                             rng.integers(1, 21, n_part)]),
        "p_type": types[rng.integers(0, len(types), n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 2100, n_part), 2),
    }), 500_000)

    # orders: keys contiguous, day-granular dates over [1995-01-01, 2001-08-01]
    d0, d1 = _ts_us("1995-01-01"), _ts_us("2001-08-01")
    n_days = (d1 - d0) // DAY_US
    statuses = np.array(["F", "O", "P"])
    prios = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                      "5-LOW"])
    odate = d0 + rng.integers(0, n_days + 1, n_ord) * DAY_US
    write(args.out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": statuses[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(900, 450000, n_ord), 2),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": prios[rng.integers(0, 5, n_ord)],
    }), 500_000)

    # lineitem: 1..7 lines per order (mean ~4, matching sf0.1's 4.075)
    lines_per = rng.integers(1, 8, n_ord)
    l_okey = np.repeat(np.arange(n_ord), lines_per)
    n_li = len(l_okey)
    l_lineno = (np.arange(n_li)
                - np.repeat(np.cumsum(lines_per) - lines_per, lines_per) + 1)
    sdate = (np.repeat(odate, lines_per)
             + rng.integers(1, 122, n_li) * DAY_US)
    rflags = np.array(["A", "N", "R"])
    write(args.out, "lineitem", pa.table({
        "l_orderkey": pa.array(l_okey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(l_lineno, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": rflags[rng.integers(0, 3, n_li)],
        "l_linestatus": np.where(rng.random(n_li) < 0.5, "O", "F"),
        "l_shipdate": pa.array(sdate, pa.timestamp("us")),
    }), 1_000_000)

    # events: uniform microsecond timestamps over Jan 2024
    t0, t1 = _ts_us("2024-01-01"), _ts_us("2024-01-31")
    etypes = np.array(["click", "view", "purchase", "signup", "error"])
    write(args.out, "events", pa.table({
        "event_id": pa.array(np.arange(n_evt), pa.int64()),
        "ts": pa.array(rng.integers(t0, t1, n_evt), pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_user, n_evt), pa.int64()),
        "event_type": etypes[rng.integers(0, 5, n_evt)],
        "value": np.round(np.minimum(rng.exponential(50.0, n_evt), 560.0), 2),
        "props": np.array([f'{{"k": {k}}}' for k in
                           rng.integers(0, 100, n_evt)]),
    }), 500_000)

    # documents: 10..100 vocab words; ~0.2% near-dup pairs like sf0.1
    nw = rng.integers(10, 101, n_doc)
    words = VOCAB[rng.integers(0, len(VOCAB), int(nw.sum()))]
    offs = np.concatenate(([0], np.cumsum(nw)))
    texts = [" ".join(words[offs[i]:offs[i + 1]]) for i in range(n_doc)]
    for i in range(0, n_doc, 500):  # planted near-identical texts
        j = i + 250
        if j < n_doc:
            texts[j] = texts[i]
    langs = np.array(["en", "de", "es", "fr", "zh"])
    lang_p = np.array([0.41, 0.1475, 0.1475, 0.1475, 0.1475])
    write(args.out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": langs[rng.choice(5, n_doc, p=lang_p)],
        "source": np.array([f"src{s}" for s in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
    }), 500_000)

    # embeddings: 64-dim float32, planted cosine-duplicates via doubling
    emb = rng.normal(0.0, 0.15, (n_emb, 64)).astype(np.float32)
    write(args.out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(emb.reshape(-1), pa.float32()), 64).cast(
                pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }), 500_000)


if __name__ == "__main__":
    main()
