"""Measurement-only scale-factor data generator (round 7).

The driver's round-6 MEASUREMENT ran at sf=1.0, but /root/testdata only
ships sf<=0.1. This script synthesizes a larger scale factor with the
SAME schema and the same (inferred) distributions as the driver tables
so optimization A/B runs can be timed at the driver's scale:

  python tools/gen_sf.py 1.0 /root/testdata_sf1.0

It is a *measurement aid only*: nothing in the query paths, the oracle,
or the committed benches reads its output unless $SPARK_GRAFT_SF_DIR is
pointed at it explicitly. Distributions were inferred from
/root/testdata/sf0.1 (uniform keys 0..N-1, ~4 lineitem lines/order,
31-word document vocab with 10-100 words/doc, unit-norm 64-dim
embeddings, 30-day event window); row counts scale linearly in sf.
Seeded (numpy default_rng(42)) so runs are reproducible, but the rows
are NOT the driver's rows — correctness stays pinned to the driver SFs.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "dedup",
]
SEGMENTS = ["FURNITURE", "MACHINERY", "AUTOMOBILE", "BUILDING", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["click", "view", "signup", "purchase", "error"]
PNAMES = ["large ring", "small box", "steel rod", "blue cap", "round plate"]
PTYPES = ["LARGE", "SMALL", "MEDIUM", "STANDARD", "ECONOMY", "PROMO"]
LANGS = ["en", "zh", "es", "de", "fr"]
DAY_US = 86_400_000_000


def _write(path, name, table):
    pq.write_table(table, os.path.join(path, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def main(sf: float, out: str) -> None:
    rng = np.random.default_rng(42)
    os.makedirs(out, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_events = int(1_000_000 * sf)
    n_docs = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": [f"REGION_{i}" for i in range(5)],
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust, dtype=np.int32)),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp, dtype=np.int32)),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    }))
    _write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_name": pa.array(np.array(PNAMES)[rng.integers(0, len(PNAMES), n_part)]),
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(0, 25, n_part)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, len(PTYPES), n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part, dtype=np.int32)),
        "p_retailprice": np.round(rng.uniform(900, 2000, n_part), 2),
    }))
    base95 = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_orders, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_orders, dtype=np.int64)),
        "o_orderstatus": pa.array(np.array(["O", "F", "P"])[
            rng.choice(3, n_orders, p=[0.49, 0.49, 0.02])]),
        "o_totalprice": np.round(rng.uniform(900, 450_000, n_orders), 2),
        "o_orderdate": pa.array(
            base95 + rng.integers(0, 2400, n_orders) * DAY_US,
            pa.timestamp("us")),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[
            rng.integers(0, 5, n_orders)]),
    }))
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(np.sort(rng.integers(0, n_orders, n_li, dtype=np.int64))),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li, dtype=np.int64)),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li, dtype=np.int64)),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li, dtype=np.int32)),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": pa.array(np.array(["N", "A", "R"])[
            rng.choice(3, n_li, p=[0.5, 0.25, 0.25])]),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(
            base95 + rng.integers(1, 2500, n_li) * DAY_US, pa.timestamp("us")),
    }))
    base24 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    _write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_events, dtype=np.int64)),
        "ts": pa.array(
            np.sort(base24 + rng.integers(0, 30 * DAY_US, n_events)),
            pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, max(n_events // 67, 1), n_events,
                                         dtype=np.int64)),
        "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, n_events)]),
        "value": np.round(np.minimum(rng.exponential(50.0, n_events), 600.0), 2),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n_events)]),
    }))
    # documents: 10-100 words from the vocab, space-joined
    lens = rng.integers(10, 101, n_docs)
    words = np.array(VOCAB)[rng.integers(0, len(VOCAB), int(lens.sum()))]
    offs = np.concatenate([[0], np.cumsum(lens)])
    texts = [" ".join(words[offs[i]:offs[i + 1]]) for i in range(n_docs)]
    _write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.integers(0, 5, n_docs)]),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 8, n_docs)]),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    }))
    vecs = rng.normal(0, 1, (n_emb, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb, dtype=np.int32)),
    }))
    open(os.path.join(out, "_DONE"), "w").close()
    print(f"wrote sf={sf} to {out}")


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 1.0,
         sys.argv[2] if len(sys.argv) > 2 else "/root/testdata_sf1.0")
