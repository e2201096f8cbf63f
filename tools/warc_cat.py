"""Inspect WARC shards / CDX indexes from the command line.

Usage:
  python tools/warc_cat.py <file.warc[.gz]> [--payload N]
  python tools/warc_cat.py --cdx <cdx parquet dir> [--limit N]

No Spark session — the codec is pure bytes (functions/warc.py), so a
shard inspects instantly; the CDX branch reads parquet via duckdb.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path", nargs="?")
    ap.add_argument("--payload", type=int, default=None, metavar="N",
                    help="print record N's payload to stdout (bytes)")
    ap.add_argument("--cdx", default=None, metavar="DIR",
                    help="print a CDX parquet index instead")
    ap.add_argument("--limit", type=int, default=20)
    args = ap.parse_args()

    if args.cdx:
        import duckdb

        rows = duckdb.sql(
            f"SELECT surt, ts, status, filename, \"offset\", length "
            f"FROM '{args.cdx}/*.parquet' ORDER BY surt, ts "
            f"LIMIT {args.limit}").fetchall()
        for r in rows:
            print("\t".join(str(x) for x in r))
        return

    if not args.path:
        ap.error("a WARC file path (or --cdx DIR) is required")
    from blockchainspider_spark.functions.warc import parse_warc

    with open(args.path, "rb") as f:
        records = parse_warc(f.read())
    if args.payload is not None:
        sys.stdout.buffer.write(records[args.payload]["payload"] or b"")
        return
    for i, r in enumerate(records):
        print(f"[{i}] {r['warc_type']:9s} {r['target_uri'] or '-':60s} "
              f"status={r['http_status']} offset={r['offset']} "
              f"len={r['length']} block={len(r['block'])}")


if __name__ == "__main__":
    main()
