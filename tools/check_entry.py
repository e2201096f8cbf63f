"""Local replica of the driver's DuckDB correctness gate.

Runs each __spark_entry__.queries()[name] on Spark and the matching
oracle_sql()[name] on DuckDB over the same parquet tables, compares
row count, sorted column names, and an order-insensitive value hash
(values normalized: floats rounded to 6, NaN/None unified).

Usage: python tools/check_entry.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def norm_cell(v):
    import decimal

    if v is None:
        return "\\N"
    if isinstance(v, decimal.Decimal):
        # DuckDB HUGEINT/DECIMAL surfaces as Decimal; the driver's
        # normalization renders it differently from int/float, which is
        # exactly how r01's f15/d4/t1 failed hash_match while this
        # replica passed.  Render distinctly so the local gate fails too.
        return f"DECIMAL:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "\\N"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        return f"{v:.6f}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm_cell(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main():
    import duckdb

    import __spark_entry__ as se
    from blockchainspider_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("check-entry", master="local[8]",
                      extra_conf={"spark.sql.shuffle.partitions": "8"})
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = se.queries(), se.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            s_rows = [tuple(r) for r in sdf.collect()]
            s_cols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:200]}")
            n_fail += 1
            continue
        sql = os_.get(name)
        if sql is None:
            print(f"  ok {name}: rows-only ({len(s_rows)} rows) [{time.monotonic()-t0:.1f}s]")
            n_pass += 1
            continue
        try:
            rel = con.sql(sql)
            d_rows = rel.fetchall()
            d_cols = [c for c in rel.columns]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:200]}")
            n_fail += 1
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rows {len(s_rows)} vs {len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols {sorted(s_cols)} vs {sorted(d_cols)}")
        elif value_hash(s_rows, s_cols) != value_hash(d_rows, d_cols):
            problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            if "value-hash mismatch" in problems and s_rows and d_rows:
                so = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                do = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                sset = {tuple(norm_cell(r[i]) for i in so) for r in s_rows}
                dset = {tuple(norm_cell(r[i]) for i in do) for r in d_rows}
                print(f"   spark-only: {list(sset - dset)[:3]}")
                print(f"   duck-only : {list(dset - sset)[:3]}")
            n_fail += 1
        else:
            print(f"  ok {name}: {len(s_rows)} rows match [{time.monotonic()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
