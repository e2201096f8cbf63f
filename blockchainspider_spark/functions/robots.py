"""robots.txt gating (T10) — parse + distributed prefix filter.

The reference runs with ``ROBOTSTXT_OBEY = False`` (settings.py:20), so
the engine's gate defaults OFF to match crawl ordering; the north rule
requires the gate to be *implementable*, and this is the real thing:

* ``parse_robots`` — an Arrow-batched kernel turning (host, robots_txt)
  documents into ORDERED (host, rule_idx, path_prefix, allow) rows for
  the default (``*``) entry — the grammar ``urllib.robotparser``
  honors: comments, case-insensitive keys, Allow lines, blank-path
  Disallow = allow-all, and FIRST-MATCH-WINS rule order. The hypothesis
  grammar test caught the unordered-set model live ("Disallow:" before
  "Disallow: /" must allow everything, because the empty rule is an
  allow-all that shadows every later line).
* ``apply_robots_gate`` — drop candidate URLs whose first matching rule
  for their host is a disallow: one broadcast join on host + a
  vectorized first-match lookup over the ordered rule array, no
  per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROBOTS_RULES_SCHEMA = "host string, rule_idx int, path_prefix string, allow boolean"


def _default_entry(txt: str) -> tuple[list[tuple[str, bool]], float | None]:
    """The default (``*``) entry's ordered (path_prefix, allow) rules and
    Crawl-delay, replicating ``urllib.robotparser``'s state machine:

    * state 0 → 1 on a User-agent line, 1 → 2 on a rule line; rule
      lines in state 0 (before any UA) are ignored.
    * ONLY a truly empty raw line terminates an entry (robotparser
      checks emptiness BEFORE comment stripping, so comment-only and
      whitespace-only lines don't end it); a UA line after rules also
      starts a new entry.
    * the FIRST entry listing ``*`` becomes the default entry — later
      ``*`` entries are discarded entirely (robotparser ``_add_entry``).
    * ``Disallow:`` with a blank path is an ALLOW-ALL rule line
      (RuleLine's empty-path flip), kept in order.
    * paths are normalized to robotparser's canonical encoded form
      ``quote(unquote(path))`` — '/enc%20oded' and '/enc oded' both
      become '/enc%20oded', the form a canonicalized URL path carries.
    * Crawl-delay must be all digits (an integer second count; '1.5'
      or 'fast' is ignored) but still counts as a rule line."""
    from urllib.parse import quote, unquote

    default: tuple[list[tuple[str, bool]], float | None] | None = None
    agents: list[str] = []
    rules: list[tuple[str, bool]] = []
    delay: float | None = None
    state = 0

    def flush() -> None:
        nonlocal default
        if default is None and "*" in agents:
            default = (list(rules), delay)

    for raw in (txt or "").splitlines():
        if not raw:
            if state == 2:
                flush()
            if state:
                agents, rules, delay = [], [], None
                state = 0
            continue
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key, value = key.strip().lower(), unquote(value.strip())
        if key == "user-agent":
            if state == 2:
                flush()
                agents, rules, delay = [], [], None
            agents.append(value)
            state = 1
        elif key == "disallow":
            if state != 0:
                rules.append((quote(value), value == ""))
                state = 2
        elif key == "allow":
            if state != 0:
                rules.append((quote(value), True))
                state = 2
        elif key == "crawl-delay":
            if state != 0:
                if value.isdigit():
                    delay = float(int(value))
                state = 2
    if state == 2:
        flush()
    return default if default is not None else ([], None)


def parse_robots_rules(txt: str) -> list[tuple[str, bool]]:
    """Ordered (path_prefix, allow) rules for User-agent * — evaluate
    with first-match-wins, default allow (pure core, oracle-shared)."""
    return _default_entry(txt)[0]


def parse_robots_text(txt: str) -> list[str]:
    """Legacy flat view: the default entry's Disallow prefixes, in
    order. NOTE this drops Allow lines and first-match shadowing — the
    gate uses ``parse_robots_rules``; keep this only for prefix-set
    consumers that accept over-blocking."""
    return [p for p, allow in parse_robots_rules(txt) if not allow]


def parse_crawl_delay(txt: str) -> float | None:
    """Crawl-delay of the default (``*``) entry, robotparser-oracled —
    later ``*`` entries are discarded with the rest of their entry."""
    return _default_entry(txt)[1]


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
        out = {"host": [], "rule_idx": [], "path_prefix": [], "allow": []}
        for host, txt in zip(pdf["host"], pdf["robots_txt"]):
            for i, (prefix, allow) in enumerate(parse_robots_rules(txt)):
                out["host"].append(host)
                out["rule_idx"].append(i)
                out["path_prefix"].append(prefix)
                out["allow"].append(allow)
        yield pd.DataFrame(out)


def parse_robots(docs: DataFrame) -> DataFrame:
    """(host, robots_txt) documents → ordered (host, rule_idx,
    path_prefix, allow) rule rows; ``rule_idx`` carries the file order
    the first-match gate depends on across any shuffle."""
    return docs.select("host", "robots_txt").mapInPandas(_parse_kernel, ROBOTS_RULES_SCHEMA)


def apply_robots_gate(urls: DataFrame, rules: DataFrame, url_col: str = "url") -> DataFrame:
    """Drop rows whose URL's FIRST matching rule for its host is a
    disallow (robotparser semantics; no matching rule = allowed):
    broadcast the (small) rules dim as a per-host array of rule
    structs sorted by ``rule_idx`` (collect_list order is not shuffle
    stable), then one vectorized ``filter`` + ``element_at`` over the
    URL path — JVM-side end to end."""
    per_host = rules.groupBy(F.lower("host").alias("host")).agg(
        F.array_sort(
            F.collect_list(F.struct("rule_idx", "path_prefix", "allow"))
        ).alias("_rules")
    )
    # hostnames are case-insensitive (and the wild appearance of a host
    # in an href may differ in case from its robots identity)
    host = F.lower(F.parse_url(F.col(url_col), F.lit("HOST")))
    path = F.coalesce(F.parse_url(F.col(url_col), F.lit("PATH")), F.lit("/"))
    gated = urls.withColumn("_host", host).join(
        F.broadcast(per_host.withColumnRenamed("host", "_host")), on="_host", how="left"
    )
    matches = F.filter(
        F.coalesce(F.col("_rules"), F.array()),
        lambda r: F.startswith(path, r["path_prefix"]),
    )
    blocked = F.when(F.size(matches) > 0,
                     ~F.element_at(matches, 1)["allow"]).otherwise(F.lit(False))
    return gated.where(~blocked).drop("_host", "_rules")
