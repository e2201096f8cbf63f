"""Crawler-trap detection for the frontier (crawl-tier hygiene).

At 10^10-URL scale the frontier's worst enemy is not volume but traps:
CGI calendars that mint a fresh URL per day forever, symlink loops that
repeat a path segment (``/a/a/a/…``), and session-id URLs that make one
page look like a million. The reference crawler inherits Scrapy's
dupefilter but has no trap rules; the classic public treatments are
Heritrix's decide rules (PathologicalPathDecideRule — same segment
≥3× consecutively; TooManyPathSegmentsDecideRule — >20 segments) and
its canonicalization's session-id stripping, which this module
re-expresses Spark-first.

Everything here is JVM-side column algebra — ``split`` + higher-order
``filter``/``aggregate`` lambdas and one ``regexp_replace`` — so trap
scoring rides inside whole-stage codegen on the frontier hot path; no
Python worker is ever consulted. The max-consecutive-run scan is a
single ``F.aggregate`` fold over the segment array (state =
(prev, run, best)), i.e. O(segments) per URL with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Heritrix defaults: PathologicalPathDecideRule maxRepetitions=2 (3+ is
# pathological), TooManyPathSegmentsDecideRule maxSegments=20.
PATHOLOGICAL_RUN = 3
MAX_SEGMENTS = 20
CALENDARISH_NUMERIC_SEGS = 4

# the usual session-token query keys (Heritrix's strip-session-ids +
# PHP/Java/classic-ASP spellings)
_SESSION_RE = r"(?i)(phpsessid|jsessionid|sessionid|sid|aspsessionid[a-z]*)=[^&#]*"


def path_segments(url_col: Column) -> Column:
    """Non-empty path segments of a URL column (scheme/host/query
    stripped), as an array<string>."""
    path = F.regexp_replace(
        F.regexp_replace(url_col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", ""),
        r"[?#].*$", "")
    return F.array_remove(F.split(path, "/"), "")


def max_consecutive_run(segs: Column) -> Column:
    """Longest run of identical consecutive segments — one JVM-side
    aggregate fold, state (prev, run, best)."""
    zero = F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                    F.lit(0).alias("best"))

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(x.alias("prev"), run.alias("run"),
                        F.greatest(acc["best"], run).alias("best"))

    return F.aggregate(segs, zero, step, lambda acc: acc["best"])


def strip_session_ids(url_col: Column) -> Column:
    """Remove session-token query params and tidy the separators left
    behind (``?sid=…&a=1`` → ``?a=1``; a now-empty query is dropped)."""
    stripped = F.regexp_replace(url_col, _SESSION_RE, "")
    tidy = F.regexp_replace(
        F.regexp_replace(stripped, r"\?&+", "?"), r"&&+", "&")
    return F.regexp_replace(tidy, r"[?&]+(#|$)", "$1")


def url_trap_features(df: DataFrame, url_col: str = "url",
                      max_segments: int = MAX_SEGMENTS,
                      pathological_run: int = PATHOLOGICAL_RUN) -> DataFrame:
    """Append trap-scoring columns to a frontier DataFrame:

    ``n_segments``, ``max_seg_run`` (longest identical-consecutive-
    segment run), ``n_numeric_segs`` (all-digit segments — the calendar
    signal), ``has_session_id``, ``clean_url`` (session tokens
    stripped — the form the seen-set should fingerprint), and the
    verdicts ``pathological``, ``too_many_segments``, ``calendarish``
    and ``is_trap`` (any of the three)."""
    url = F.col(url_col)
    segs = path_segments(url)
    out = (
        df.withColumn("n_segments", F.size(segs))
          .withColumn("max_seg_run", max_consecutive_run(segs))
          .withColumn("n_numeric_segs",
                      F.size(F.filter(segs, lambda s: s.rlike("^[0-9]+$"))))
          .withColumn("has_session_id",
                      F.regexp_extract(url, _SESSION_RE, 0) != F.lit(""))
          .withColumn("clean_url", strip_session_ids(url))
    )
    return (
        out.withColumn("pathological",
                       F.col("max_seg_run") >= F.lit(pathological_run))
           .withColumn("too_many_segments",
                       F.col("n_segments") > F.lit(max_segments))
           .withColumn("calendarish",
                       F.col("n_numeric_segs") >= F.lit(CALENDARISH_NUMERIC_SEGS))
           .withColumn("is_trap",
                       F.col("pathological") | F.col("too_many_segments")
                       | F.col("calendarish"))
    )
