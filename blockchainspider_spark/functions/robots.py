"""robots.txt gating (T10) — parse + distributed prefix filter.

The reference runs with ``ROBOTSTXT_OBEY = False`` (settings.py:20), so
the engine's gate defaults OFF to match crawl ordering; the north rule
requires the gate to be *implementable*, and this is the real thing:

* ``parse_robots`` — an Arrow-batched kernel turning (host, robots_txt)
  documents into (host, path_prefix) disallow rows for ``*`` agents —
  the grammar subset ``urllib.robotparser`` honors for Disallow lines
  (comments, case-insensitive keys, blank-path Disallow = allow all).
* ``apply_robots_gate`` — drop candidate URLs whose host has a disallow
  prefix matching the URL path: one broadcast join on host + a
  vectorized prefix predicate, no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROBOTS_RULES_SCHEMA = "host string, path_prefix string"


def parse_robots_text(txt: str) -> list[str]:
    """Disallow path-prefixes for User-agent * (pure core, oracle-shared).

    Entry grammar follows ``urllib.robotparser``: consecutive User-agent
    lines form ONE entry whose rules apply to every listed agent (a UA
    line only starts a new entry after rule lines or a blank line), and
    rule paths are normalized to robotparser's canonical encoded form
    ``quote(unquote(path))`` — '/enc%20oded' and '/enc oded' both become
    '/enc%20oded', the form a canonicalized URL path carries, so the
    JVM-side prefix match compares like with like."""
    from urllib.parse import quote, unquote

    prefixes: list[str] = []
    applies = False    # current entry lists '*' among its user-agents
    in_rules = False   # current entry has seen rule lines
    for raw in (txt or "").splitlines():
        if not raw:
            # ONLY a truly empty line terminates the entry (partial
            # UA-only entries are discarded, robotparser state 1 → 0).
            # robotparser checks emptiness BEFORE comment stripping, so
            # comment-only and whitespace-only lines are skipped without
            # ending the entry — a divergence the hypothesis grammar
            # test caught live (tests/test_property_codecs.py).
            applies = in_rules = False
            continue
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if ":" not in line:
            continue
        key, _, value = line.partition(":")
        key, value = key.strip().lower(), value.strip()
        if key == "user-agent":
            if in_rules:  # rules already seen → this UA starts a NEW entry
                applies = in_rules = False
            applies = applies or value == "*"
        elif key in ("disallow", "allow"):
            in_rules = True
            if key == "disallow" and applies and value:
                prefixes.append(quote(unquote(value)))
    return prefixes


def parse_crawl_delay(txt: str) -> float | None:
    """Crawl-delay for User-agent * (pure core, robotparser-oracled):
    same entry scoping as ``parse_robots_text`` — and, matching
    ``urllib.robotparser``, the value must be all digits (an integer
    second count; '1.5' or 'fast' is ignored) and a Crawl-delay line
    counts as a rule line for entry-boundary purposes."""
    delay: float | None = None
    applies = False
    in_rules = False
    for raw in (txt or "").splitlines():
        if not raw:  # see parse_robots_text: empty ≠ comment-only
            applies = in_rules = False
            continue
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if ":" not in line:
            continue
        key, _, value = line.partition(":")
        key, value = key.strip().lower(), value.strip()
        if key == "user-agent":
            if in_rules:
                applies = in_rules = False
            applies = applies or value == "*"
        elif key in ("disallow", "allow", "crawl-delay"):
            in_rules = True
            if key == "crawl-delay" and applies and value.isdigit():
                delay = float(int(value))
    return delay


def parse_crawl_delays(docs: DataFrame) -> DataFrame:
    """(host, robots_txt) documents → (host, crawl_delay) rows for hosts
    that declare one; feed ``collect()`` of this small dim into
    ``payload.make_fetch_kernel(host_delays=...)`` so the politeness
    bucket honors per-host Crawl-delay."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"host": [], "crawl_delay": []}
            for host, txt in zip(pdf["host"], pdf["robots_txt"]):
                d = parse_crawl_delay(txt)
                if d is not None:
                    out["host"].append(host)
                    out["crawl_delay"].append(d)
            yield pd.DataFrame(out)

    return docs.select("host", "robots_txt").mapInPandas(
        kernel, "host string, crawl_delay double"
    )


def _parse_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {"host": [], "path_prefix": []}
        for host, txt in zip(pdf["host"], pdf["robots_txt"]):
            for prefix in parse_robots_text(txt):
                out["host"].append(host)
                out["path_prefix"].append(prefix)
        yield pd.DataFrame(out)


def parse_robots(docs: DataFrame) -> DataFrame:
    """(host, robots_txt) documents → (host, path_prefix) disallow rows."""
    return docs.select("host", "robots_txt").mapInPandas(_parse_kernel, ROBOTS_RULES_SCHEMA)


def apply_robots_gate(urls: DataFrame, rules: DataFrame, url_col: str = "url") -> DataFrame:
    """Drop rows whose URL is disallowed: broadcast the (small) rules dim,
    collect each host's prefixes, and test with one vectorized
    higher-order ``exists`` over the URL path — JVM-side end to end."""
    per_host = rules.groupBy(F.lower("host").alias("host")).agg(
        F.collect_set("path_prefix").alias("_disallow")
    )
    # hostnames are case-insensitive (and the wild appearance of a host
    # in an href may differ in case from its robots identity)
    host = F.lower(F.parse_url(F.col(url_col), F.lit("HOST")))
    path = F.coalesce(F.parse_url(F.col(url_col), F.lit("PATH")), F.lit("/"))
    gated = urls.withColumn("_host", host).join(
        F.broadcast(per_host.withColumnRenamed("host", "_host")), on="_host", how="left"
    )
    blocked = F.exists(
        F.coalesce(F.col("_disallow"), F.array()),
        lambda p: F.startswith(path, p),
    )
    return gated.where(~blocked).drop("_host", "_disallow")
