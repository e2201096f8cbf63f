"""Physical-plan audit: verify the plans are the ones we want.

Checks (and records to BENCH/EXPLAIN.md):
* parquet scans carry PushedFilters + pruned ReadSchema (s1 scan)
* dimension joins pick BroadcastHashJoin (j2)
* aggregations are partial+final HashAggregate (a1)
* the crawl expand join broadcasts the frontier; the seen anti-join is
  a broadcast/shuffled hash anti join, and whole-stage codegen spans the
  JVM-side pipeline.

Exits non-zero if an assertion fails, so it doubles as a regression test
(invoked from tests/test_plans.py with a tiny input).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_of(df) -> str:
    return df._jdf.queryExecution().explainString(  # noqa: SLF001
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def audit(spark, sf_dir: str) -> list[tuple[str, str, list[str], bool]]:
    from blockchainspider_spark import entry_queries as Q

    results = []

    def check(name, df, must_contain):
        plan = plan_of(df)
        ok = all(any(tok in line for line in plan.splitlines()) for tok in must_contain)
        results.append((name, plan, must_contain, ok))

    check("s1_keyset_scan (pushdown + pruning)", Q.q_s1_keyset_scan(spark, sf_dir),
          ["PushedFilters", "codegen id", "Scan parquet"])
    check("j2_broadcast_enrich (broadcast dim joins)", Q.q_j2_broadcast_enrich(spark, sf_dir),
          ["BroadcastHashJoin", "HashAggregate"])
    check("a1_haircut_outsum (partial+final agg)", Q.q_a1_haircut_outsum(spark, sf_dir),
          ["HashAggregate", "Exchange"])

    # crawl engine plans
    from pyspark.sql import functions as F

    from blockchainspider_spark.engine.batch_bfs import BfsWaveEngine
    from blockchainspider_spark.entry_crawl import _edges_as_transfers

    edges = _edges_as_transfers(spark, sf_dir)
    engine = BfsWaveEngine(spark, edges, max_depth=2)
    state = engine.start("c1")
    expand = engine._expand(state.frontier)  # noqa: SLF001
    check("crawl expand join (broadcast frontier)", expand,
          ["BroadcastHashJoin", "Scan"])
    candidates = expand.select(
        F.col("address_from").alias("child")
    ).withColumn("fingerprint", F.sha1("child"))
    anti = candidates.join(state.seen.select("fingerprint"), "fingerprint", "left_anti")
    check("seen anti-join (hash anti join)", anti, ["LeftAnti"])

    # distributed seq assignment: a range exchange + per-partition window
    # (never a global single-partition sort/window)
    from blockchainspider_spark.engine.distseq import assign_global_seq

    small = spark.range(0, 1000).select(F.col("id").alias("k1"), F.col("id").alias("node"))
    # force the big-wave path (small_threshold=0): the audit checks the
    # cluster-scale plan — range exchange + per-partition window over the
    # localCheckpoint'ed ranged intermediate, never a global sort
    asg = assign_global_seq(small, ["k1"], base_seq=0, n_partitions=8, small_threshold=0)
    check("distributed seq, big-wave path (per-pid window on checkpointed ranged)",
          asg.df, ["Window", "_pid"])
    asg.cleanup()

    # the adaptive small-wave path: single-task window (constant partition
    # key), no range exchange, no per-partition counts job
    asg_small = assign_global_seq(small, ["k1"], base_seq=0, n_partitions=8)
    check("distributed seq, small-wave path (constant-key single-task window)",
          asg_small.df, ["Window"])
    asg_small.cleanup()

    # wave-batched weighted pop: orderBy().limit(k) must compile to
    # TakeOrderedAndProject (distributed per-partition top-k + k-row
    # merge), never a global Sort
    state = spark.createDataFrame(
        [(f"n{i}", float(i % 97), (0, i, 0)) for i in range(1000)],
        "node string, weight double, fk struct<wave:long,pseq:long,erank:long>",
    )
    popk = state.orderBy(F.desc("weight"), F.asc("fk")).limit(32)
    plan = popk._jdf.queryExecution().executedPlan().toString()
    ok = "TakeOrderedAndProject" in plan
    results.append(("wave-engine top-k pop (TakeOrderedAndProject, no global sort)",
                    plan, ["TakeOrderedAndProject"], ok))

    # wave-TTRRedirect chip merge: one partial+final HashAggregate over
    # the rest∪pushed union — no extra exchange beyond the merge itself —
    # and the ANN signature path: plan contains the pandas-UDF eval, no
    # hyperplane literals (plan size independent of embedding width)
    from blockchainspider_spark.operators.dedup import ann_lsh_bucketed

    chips = spark.createDataFrame(
        [(f"n{i}", "TOK", i, 0.1) for i in range(100)],
        "node string, symbol string, ts long, val double",
    )
    merged = chips.groupBy("node", "symbol", "ts").agg(F.sum("val").alias("val"))
    check("redirect chip merge (partial+final HashAggregate)", merged,
          ["HashAggregate", "Exchange"])

    import re

    def norm_plan(df):
        # strip expression ids, lambda counters, plan ids, and RDD ids
        # (all session-global counters) so otherwise-identical plans
        # compare equal
        p = re.sub(r"#\d+", "#", plan_of(df))
        p = re.sub(r"lambda [a-z]+_\d+", "lambda v", p)
        p = re.sub(r"plan_id=\d+", "plan_id=", p)
        return re.sub(r"RDD\[\d+\]", "RDD[]", p)

    def emb_of(dims):
        return spark.createDataFrame(
            [(i, [float(i)] + [0.5] * (dims - 1)) for i in range(40)],
            "vec_id long, embedding array<double>",
        )

    # real invariant (ADVICE r4): plan TEXT must be identical between a
    # 4-dim and a 64-dim embedding (the plane matrix lives in the UDF
    # closure, so nothing about embedding width may appear in the plan —
    # the old `'0.1234' not in plan` check was vacuously true even for
    # literal-tree plans), and growth with plane count is bounded by the
    # O(p) probe expressions alone — a literal plane matrix would add
    # O(p·dims) literal nodes, thousands of chars even at 4 dims
    lsh = ann_lsh_bucketed(emb_of(4), n_queries=3, k=2, n_planes=4)
    plan = plan_of(lsh)
    wide_same = norm_plan(
        ann_lsh_bucketed(emb_of(64), n_queries=3, k=2, n_planes=4)
    ) == norm_plan(lsh)
    planes_growth = len(norm_plan(
        ann_lsh_bucketed(emb_of(4), n_queries=3, k=2, n_planes=16)
    )) - len(norm_plan(lsh))
    ok = ("ArrowEvalPython" in plan or "BatchEvalPython" in plan) and \
        wide_same and 0 <= planes_growth < 2000
    results.append(("ann sign-LSH signature (Arrow pandas UDF, plan invariant "
                    "in dims and plane count)", plan, ["ArrowEvalPython"], ok))

    # round-6 hub push, stage A: the (≤k)-row hub pop set is BROADCAST
    # against the persisted touch view (no shuffle of the big side for
    # the probe), and the per-hash-bucket netting runs as one grouped
    # Arrow kernel — raw edges cross the wire exactly once, on the
    # (node, bucket) grouping exchange
    from blockchainspider_spark.engine.wave_redirect import TtrRedirectWaveEngine

    hub_eng = TtrRedirectWaveEngine(spark, edges)
    hub_key = spark.createDataFrame([("c1", 0)], "node string, _pseq long")
    netted = hub_eng._hub_netted(hub_key)  # noqa: SLF001
    check("redirect hub netting stage A (broadcast pop probe + grouped "
          "Arrow kernel, one exchange)", netted,
          ["BroadcastHashJoin", "FlatMapGroupsInPandas"])

    # round-6 substring dedup: tokenize/slide/hash must stay JVM-side
    # (zero Python eval nodes) and aggregate partial+final over the one
    # (hash, doc_id) exchange — the text itself never shuffles
    from blockchainspider_spark.operators.dedup import duplicate_spans

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j % 13}" for j in range(i, i + 20))) for i in range(50)],
        "doc_id long, text string",
    )
    spans = duplicate_spans(docs, k=8)
    plan = plan_of(spans)
    ok = ("HashAggregate" in plan and "Exchange" in plan
          and "EvalPython" not in plan)
    results.append(("d7 duplicate spans (codegen shingles, partial+final agg, "
                    "no Python eval)", plan, ["HashAggregate", "Exchange"], ok))

    # round-6 cuckoo seen filter: probe cogroups candidates with their
    # shard's single bits row — the blob reaches each task once via the
    # cogroup, never replicated per candidate row by a join
    from blockchainspider_spark.functions.cuckoo import ShardedCuckooTable

    ck = ShardedCuckooTable(spark, capacity_per_shard=4096, n_shards=8)
    ck.add(spark.createDataFrame([(f"{i:06x}ab",) for i in range(200)], "fp string"), "fp")
    probe = ck.might_contain(
        spark.createDataFrame([(f"{i:06x}ab",) for i in range(500)], "fp string"), "fp")
    plan = plan_of(probe)
    ok = "FlatMapCoGroupsInPandas" in plan and "BroadcastNestedLoopJoin" not in plan
    results.append(("cuckoo seen-filter probe (cogrouped shard blobs, no "
                    "blob-per-candidate join)", plan, ["FlatMapCoGroupsInPandas"], ok))

    # round-6 pHash banded near-dup: band extraction + bit_count verify
    # must stay JVM-side, and the hamming filter must run BEFORE the
    # pair-dedup exchange (the distinct's HashAggregate is keys-only —
    # no first()/carried payload through the shuffle)
    from blockchainspider_spark.entry_dedup import _phash_fixture
    from blockchainspider_spark.operators.dedup import dedup_groups, phash_near_duplicates

    ph = _phash_fixture(spark, sf_dir)
    pairs = phash_near_duplicates(ph, id_col="img", phash_col="phash", max_hamming=7)
    plan = plan_of(pairs)
    ok = ("bit_count" in plan and "EvalPython" not in plan
          and "first(" not in plan)
    results.append(("d9 pHash banded near-dup (codegen bands, pre-exchange "
                    "hamming filter, keys-only distinct)", plan, ["bit_count"], ok))

    # round-6 dedup groups: one label-propagation round = edge-key
    # shuffle + label self-join + keys-only min agg, all JVM-side; the
    # per-round localCheckpoint truncates lineage so the audited plan
    # is ONE round's, not the whole loop's
    groups = dedup_groups(pairs, ph.select("img"), node_col="img", max_iters=8)
    plan = plan_of(groups)
    ok = ("HashAggregate" in plan and "EvalPython" not in plan
          and "Scan ExistingRDD" in plan)
    results.append(("d10 dedup groups (checkpoint-truncated final round, "
                    "no Python eval)", plan, ["HashAggregate", "Scan ExistingRDD"], ok))

    # round-6 PII redaction + mojibake + hash split: all three must be
    # ZERO-exchange codegen projections — free columns on the scan
    from blockchainspider_spark.operators.dedup import (
        decontaminate, hash_split, lm_quality_score, mojibake_score,
        pack_sequences, redact_pii,
    )

    for nm, out in [("t7 redact_pii", redact_pii(docs)),
                    ("t11 mojibake_score", mojibake_score(docs)),
                    ("t6 hash_split", hash_split(docs.select("doc_id")))]:
        plan = plan_of(out)
        ok = "Exchange" not in plan and "EvalPython" not in plan
        results.append((f"{nm} (zero-shuffle codegen projection)", plan,
                        ["Project"], ok))

    # round-6 decontamination: the benchmark gram set is the BROADCAST
    # side; the corpus token stream must reach the join without any
    # hash-partition exchange of its own (scan → explode → join)
    bench = docs.limit(5)
    dec = decontaminate(docs, bench, n=8)
    plan = plan_of(dec)
    ok = "BroadcastHashJoin" in plan and "EvalPython" not in plan
    results.append(("t8 decontaminate (broadcast bench grams, corpus side "
                    "unshuffled into the join)", plan, ["BroadcastHashJoin"], ok))

    # round-6 LM scoring: the persisted vocab must be REUSED (InMemory
    # scans), not recomputed per consumer — and scoring joins broadcast
    lm = lm_quality_score(docs)
    plan = plan_of(lm)
    ok = ("InMemoryTableScan" in plan and "BroadcastHashJoin" in plan
          and "EvalPython" not in plan)
    results.append(("t12 lm_quality_score (persisted vocab reused via "
                    "InMemoryTableScan, broadcast scoring join)", plan,
                    ["InMemoryTableScan", "BroadcastHashJoin"], ok))

    # round-6 sequence packing: exactly one exchange (the shard
    # partition for the window); the text column must be pruned before
    # it — the shuffle carries (id, shard, n_tokens) only
    pk = pack_sequences(docs, seq_len=64, n_shards=4)
    plan = plan_of(pk)
    n_ex = sum("Exchange" in ln and "Reused" not in ln
               for ln in plan.splitlines() if ln.strip().startswith("("))
    shuffled_text = "text" in plan.split("Window")[0].split("Exchange")[-1][:400]
    ok = ("Window" in plan and n_ex <= 1 and not shuffled_text
          and "EvalPython" not in plan)
    results.append(("t13 pack_sequences (one shard exchange, text pruned "
                    "pre-shuffle, windowed cumsum)", plan, ["Window"], ok))

    # round-6 streaming dedup (t14): the stateful operator keys its
    # state store by the dedup key — exactly ONE exchange, demanded by
    # the operator itself (REQUIRED_BY_STATEFUL_OPERATOR, hash on
    # content_sha), with the watermark assigned upstream so state is
    # horizon-bounded; no Python eval anywhere
    import tempfile

    from blockchainspider_spark.streaming.windowed import dedup_stream

    sd_dir = tempfile.mkdtemp(prefix="audit-streamdedup-")
    (spark.range(8).selectExpr("cast(id % 3 as string) AS content_sha",
                               "timestamp'2024-01-01' + make_interval(0,0,0,0,0,0,id) AS ts")
     .write.mode("overwrite").parquet(sd_dir))
    sd = dedup_stream(
        spark.readStream.schema("content_sha string, ts timestamp").parquet(sd_dir),
        ["content_sha"],
    )
    plan = plan_of(sd)
    n_ex = sum("Exchange" in ln and "Reused" not in ln
               for ln in plan.splitlines() if ln.strip().startswith("("))
    ok = (n_ex == 1 and "REQUIRED_BY_STATEFUL_OPERATOR" in plan
          and "hashpartitioning(content_sha" in plan
          and "EvalPython" not in plan)
    results.append(("t14 streaming dedup (single stateful-operator exchange "
                    "keyed by the dedup hash, watermark-bounded state)", plan,
                    ["StreamingDeduplicateWithinWatermark", "EventTimeWatermark"],
                    ok))

    # round-6 continuation — robots first-match gate: the (tiny) ordered
    # rule dim broadcasts into the URL stream; the first-match lookup is
    # a JVM-side filter+element_at over the sorted struct array, so the
    # URL side crosses NO exchange (robotparser-ordered semantics at
    # zero shuffle cost on the big side)
    from blockchainspider_spark.functions.robots import apply_robots_gate, parse_robots

    rb_docs = spark.createDataFrame(
        [(f"h{i}", "User-agent: *\nAllow: /a\nDisallow: /\n") for i in range(3)],
        "host string, robots_txt string",
    )
    urls = spark.range(2000).selectExpr(
        "concat('http://h', id % 3, '/a/', id) AS url")
    gated = apply_robots_gate(urls, parse_robots(rb_docs))
    plan = plan_of(gated)
    url_side = plan.split("BroadcastHashJoin")[0]
    ok = ("BroadcastHashJoin" in plan and "element_at" in plan
          and "Exchange" not in url_side)
    results.append(("robots first-match gate (broadcast ordered-rule dim, "
                    "JVM element_at lookup, URL side unshuffled)", plan,
                    ["BroadcastHashJoin", "element_at"], ok))

    # round-6 continuation — revalidation cache upsert: recrawls MUTATE
    # entries, so the cache update is left-anti (drop touched keys) +
    # union of the wave's entries, both keyed on cache_key; no Python
    # eval in the upsert itself (the fetch kernel is the only Arrow hop)
    import pandas as pd  # noqa: F401

    from blockchainspider_spark.engine.fetch_cache import (
        REVAL_FETCH_SCHEMA,
        RevalidatingFetcher,
    )

    def _audit_fetch(reqs):
        def kernel(batches):
            for pdf in batches:
                out = pdf[["cache_key"]].copy()
                out["status"] = 200
                out["etag"] = "e"
                out["last_modified"] = 1
                out["response"] = "b"
                yield out
        return reqs.mapInPandas(kernel, REVAL_FETCH_SCHEMA)

    rf = RevalidatingFetcher(spark, _audit_fetch)
    rf.fetch(spark.range(100).selectExpr("concat('k', id) AS cache_key")).count()
    plan = plan_of(rf.cache)
    ok = "LeftAnti" in plan and "Union" in plan
    results.append(("revalidation cache upsert (anti-join touched keys + "
                    "union wave entries on cache_key)", plan,
                    ["LeftAnti", "Union"], ok))

    # round-6 continuation — crawler-trap scoring: the whole feature set
    # (segment split, higher-order aggregate run scan, regex session
    # strip) must stay JVM column algebra — a Python eval stage here
    # would put a per-URL interpreter hop on the frontier hot path
    from blockchainspider_spark.functions.urltraps import url_trap_features

    trap_urls = spark.range(5000).selectExpr(
        "concat('http://h', id % 7, '.ex.test/p', id, '/s/s/s?sid=', id) AS url")
    plan = plan_of(url_trap_features(trap_urls))
    ok = ("ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
          and "aggregate(" in plan.lower())
    results.append(("crawler-trap scoring (higher-order aggregate fold + "
                    "regex strip, zero Python stages)", plan,
                    ["no ArrowEvalPython/BatchEvalPython", "aggregate("], ok))
    return results


def main():
    from blockchainspider_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("explain-audit", master="local[4]",
                      extra_conf={"spark.sql.shuffle.partitions": "8"})
    spark.sparkContext.setLogLevel("ERROR")
    results = audit(spark, sf_dir)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    ok_all = True
    with open(os.path.join(repo, "BENCH", "EXPLAIN.md"), "w") as fh:
        fh.write("# Physical-plan audit (`.explain('formatted')`)\n\n")
        for name, plan, must, ok in results:
            ok_all &= ok
            fh.write(f"## {name} — {'OK' if ok else 'MISSING ' + str(must)}\n\n")
            fh.write("```\n" + plan.strip()[:4000] + "\n```\n\n")
            print(("OK  " if ok else "FAIL") + " " + name)
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
