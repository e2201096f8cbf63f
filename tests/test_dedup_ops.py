"""Dedup/similarity operator unit tests beyond the DuckDB gate:
LSH skew salting, cosine scale guard."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from blockchainspider_spark.operators import dedup as D


@pytest.fixture(scope="module")
def mega_bucket_docs(spark):
    """60 identical docs (one LSH mega-bucket) + 20 distinct docs."""
    rows = [{"doc_id": i, "text": "the same hot spam page text repeated"} for i in range(60)]
    rows += [{"doc_id": 100 + i, "text": f"unique document number {i} " * 3} for i in range(20)]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_lsh_salting_identical_pairs(spark, mega_bucket_docs):
    """Salted and unsalted band joins must produce the IDENTICAL
    candidate set — salting is a physical rewrite only."""
    sigs = D.minhash_signatures(mega_bucket_docs, "doc_id", "text", n_hashes=8, k=4)
    plain = {(r.a, r.b) for r in D.lsh_candidate_pairs(sigs, 4, skew_salt=0).collect()}
    salted = {(r.a, r.b) for r in D.lsh_candidate_pairs(sigs, 4, skew_salt=4).collect()}
    assert salted == plain
    # the planted mega-bucket yields all C(60,2) pairs
    assert len({p for p in plain if p[0] < 100 and p[1] < 100}) == 60 * 59 // 2


def test_lsh_salting_bounds_per_key_candidates(spark, mega_bucket_docs):
    """With salt s, no (band, band_key, ga, gb) join key may carry more
    than ~(B/s)² candidate pairs — the straggler-task bound."""
    s = 4
    sigs = D.minhash_signatures(mega_bucket_docs, "doc_id", "text", n_hashes=8, k=4)
    banded = (
        sigs.withColumn("band", (F.col("seed") / 4).cast("int"))
        .groupBy("doc", "band")
        .agg(F.md5(F.concat_ws("_", F.sort_array(F.collect_list(
            F.concat_ws(":", F.col("seed").cast("string"), F.col("minhash").cast("string"))
        )))).alias("band_key"))
    )
    own = F.pmod(F.xxhash64(F.col("doc").cast("string")), F.lit(s)).cast("int")
    per_salt = banded.groupBy("band", "band_key", own.alias("g")).count()
    max_side = max(r["count"] for r in per_salt.collect())
    # B=60 mega-bucket → per-salt side ≤ ~B/s + slack; join work per key
    # is max_side², vs B² unsalted
    assert max_side <= 60 // s + 10
    assert max_side ** 2 < 60 * 60 / 4  # at least a 4× straggler cut


def test_cosine_pairs_guard_refuses_large_collect(spark):
    """The O(n²) brute-force baseline must refuse to silently collect a
    table beyond its documented bound."""
    big = spark.range(0, 60_000).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="cosine_pairs"):
        D.cosine_pairs(big, max_rows=50_000)


def test_kmeans_train_matches_numpy_lloyds(spark):
    """Distributed Lloyd's k-means equals an independent numpy
    implementation: same deterministic init (first k by id), same
    iteration count, lowest-cid tie-break, empty clusters frozen."""
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = np.round(rng.standard_normal((60, 4)), 3)
    pdf = pd.DataFrame({"vec_id": range(60), "embedding": [list(map(float, v)) for v in vecs]})
    emb = spark.createDataFrame(pdf)

    got = np.array(D.kmeans_train(emb, k=4, iters=3))

    cent = vecs[:4].astype(float).copy()
    for _ in range(3):
        d2 = ((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # argmin takes lowest index on ties
        for c in range(4):
            members = vecs[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    assert np.allclose(got, cent, rtol=1e-9, atol=1e-12)


def test_ann_ivf_trained_centroids_path(spark):
    """ann_ivf with kmeans_train centroids keeps the same plan shape and
    returns valid per-cell top-k (neighbors share the query's cell)."""
    import numpy as np

    rng = np.random.default_rng(11)
    vecs = np.round(rng.standard_normal((80, 4)), 3)
    pdf = pd.DataFrame({"vec_id": range(80), "embedding": [list(map(float, v)) for v in vecs]})
    emb = spark.createDataFrame(pdf)
    cent = D.kmeans_train(emb, k=4, iters=2)
    out = D.ann_ivf(emb, n_queries=3, k=2, centroids=cent).collect()
    assert len(out) > 0
    for r in out:
        assert r.query_id != r.neighbor_id and 1 <= r.rk <= 2


def test_cosine_pairs_small_ok(spark):
    emb = spark.createDataFrame(pd.DataFrame({
        "vec_id": [0, 1, 2],
        "embedding": [[1.0, 0.0], [1.0, 0.01], [0.0, 1.0]],
    }))
    got = {(r.a, r.b) for r in D.cosine_pairs(emb, threshold=0.9).collect()}
    assert got == {(0, 1)}


def _optimized_plan(df) -> str:
    import re

    # strip expression ids (#123) and lambda-variable counters (x_3) —
    # session-global counters that differ between otherwise identical plans
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    plan = re.sub(r"#\d+", "#", plan)
    return re.sub(r"lambda [a-z]+_\d+", "lambda v", plan)


def test_ann_plans_independent_of_embedding_width(spark):
    """768-dim embeddings must analyze+run as fast as 8-dim ones: the
    hyperplane/centroid matrices travel in pandas-UDF closures, never as
    nested F.lit trees, so the Catalyst plan size cannot grow with dims
    (the literal-tree version stalled analysis before reading a row)."""
    import numpy as np

    def emb_of(dims, n=40):
        rng = np.random.default_rng(99)
        vecs = rng.standard_normal((n, dims))
        pdf = pd.DataFrame({
            "vec_id": range(n),
            "embedding": [list(map(float, v)) for v in vecs],
        })
        return spark.createDataFrame(pdf)

    small, wide = emb_of(8), emb_of(768)
    # 2 planes = 4 buckets: collisions guaranteed even for 768-dim
    # uniform vectors, so the wide run returns rows to assert on
    lsh_small = D.ann_lsh_bucketed(small, n_queries=3, k=2, n_planes=2)
    lsh_wide = D.ann_lsh_bucketed(wide, n_queries=3, k=2, n_planes=2)
    assert len(_optimized_plan(lsh_wide)) == len(_optimized_plan(lsh_small))
    rows = lsh_wide.collect()
    assert len(rows) > 0
    assert all(r.query_id != r.neighbor_id for r in rows)

    cents = D.kmeans_train(wide, k=4, iters=2)
    assert len(cents) == 4 and len(cents[0]) == 768
    ivf = D.ann_ivf(wide, n_queries=3, k=2, centroids=cents)
    assert ivf.count() > 0


def _lsh_replay_candidates(vecs, n_queries, p, L, probe_bits=1, seed=12345):
    """Driver-side numpy replay of the multi-table construction with the
    operator's documented seed/packing: planes shape (L, p, dims), sig
    bits MSB-first, query probes = own bucket ∪ single-bit flips."""
    import numpy as np

    planes = np.random.default_rng(seed).standard_normal((L, p, vecs.shape[1]))
    w = 1 << np.arange(p - 1, -1, -1)
    sigs = np.stack([((vecs @ planes[t].T) > 0) @ w for t in range(L)], axis=1)
    cands = {}
    for qi in range(n_queries):
        got = set()
        for t in range(L):
            buckets = {sigs[qi, t]}
            if probe_bits:
                buckets |= {sigs[qi, t] ^ (1 << b) for b in range(p)}
            got |= set(np.where(np.isin(sigs[:, t], list(buckets)))[0])
        got.discard(qi)
        cands[qi] = got
    return cands


def test_ann_lsh_candidates_match_seeded_replay(spark):
    """The multi-table kernel's candidate set equals a driver-side numpy
    replay with the same seed — the determinism contract the recall
    gate row depends on. k is set ≥ n so the top-k keeps EVERY scored
    candidate, making the returned pair set exactly the candidate set."""
    import numpy as np

    dims, p, L = 16, 5, 10
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((30, dims))
    pdf = pd.DataFrame({
        "vec_id": range(30),
        "embedding": [list(map(float, v)) for v in vecs],
    })
    emb = spark.createDataFrame(pdf)
    want = _lsh_replay_candidates(vecs, n_queries=5, p=p, L=L)

    out = D.ann_lsh_bucketed(emb, n_queries=5, k=50, n_planes=p, n_tables=L)
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert got == {q: c for q, c in want.items() if c}


def test_ann_lsh_concentrated_data_prunes_and_recalls(spark):
    """The 100-TB story: on data with REAL near-duplicates (cosine
    ≈ 0.98, the web-scale near-dup regime) the multi-table construction
    both finds every planted neighbor (recall 1.0) and prunes the
    candidate set hard — unlike the near-orthogonal gate fixture where
    the cut is modest by necessity (operator docstring)."""
    import numpy as np

    dims, n_bg, n_q, planted = 64, 400, 5, 3
    rng = np.random.default_rng(7)
    qs = rng.standard_normal((n_q, dims))
    rows, vid = [], 0
    planted_ids = {}
    for qi in range(n_q):
        rows.append((vid, [float(x) for x in qs[qi]]))
        vid += 1
    for qi in range(n_q):
        planted_ids[qi] = []
        for _ in range(planted):
            near = qs[qi] + 0.08 * rng.standard_normal(dims)
            rows.append((vid, [float(x) for x in near]))
            planted_ids[qi].append(vid)
            vid += 1
    bg = rng.standard_normal((n_bg, dims))
    for i in range(n_bg):
        rows.append((vid + i, [float(x) for x in bg[i]]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # the scale configuration: near-dup data supports many more planes
    # per table (cos 0.98 ⇒ per-plane agreement ≈ 0.94), which is where
    # the candidate cut comes from — p=12 gives a background collision
    # rate of (1+12)/2^12 ≈ 0.3% per table while planted pairs still
    # collide in almost every table
    p, L = 12, 10
    out = D.ann_lsh_bucketed(emb, n_queries=n_q, k=planted, n_planes=p, n_tables=L)
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, []).append(r.neighbor_id)
    for qi in range(n_q):
        assert sorted(got[qi]) == sorted(planted_ids[qi]), qi

    # candidate cut: numpy replay of the same seeded construction shows
    # the planted neighbors collide while most background does not
    vecs = np.array([v for _, v in sorted(rows)], dtype=np.float64)
    cands = _lsh_replay_candidates(vecs, n_queries=n_q, p=p, L=L)
    frac = sum(len(c) for c in cands.values()) / (n_q * len(vecs))
    assert frac < 0.25, frac
    for qi in range(n_q):
        assert set(planted_ids[qi]) <= cands[qi]


def test_ann_ivf_nprobe_monotone_recall(spark):
    """nprobe is the IVF recall lever: the candidate set (and hence
    recall vs brute force) is monotone in nprobe, and at nprobe =
    n_centroids the search is exhaustive — IVF top-k equals brute-force
    top-k exactly. Data vectors stay in one cell each, so (query,
    neighbor) pairs never duplicate across probes."""
    import numpy as np

    rng = np.random.default_rng(23)
    vecs = np.round(rng.standard_normal((60, 4)), 3)
    pdf = pd.DataFrame({"vec_id": range(60), "embedding": [list(map(float, v)) for v in vecs]})
    emb = spark.createDataFrame(pdf)
    brute = {(r.query_id, r.neighbor_id)
             for r in D.ann_topk(emb, n_queries=3, k=2).collect()}
    prev_hits = -1
    for nprobe in (1, 2, 8):
        rows = D.ann_ivf(emb, n_centroids=8, n_queries=3, k=2,
                         nprobe=nprobe).collect()
        pairs = [(r.query_id, r.neighbor_id) for r in rows]
        assert len(pairs) == len(set(pairs)), "duplicate pair across probes"
        hits = len(set(pairs) & brute)
        assert hits >= prev_hits, (nprobe, hits, prev_hits)
        prev_hits = hits
    assert set(pairs) == brute  # nprobe == n_centroids ⇒ exhaustive


def test_duplicate_spans_planted_and_short_doc_guard(spark):
    """A shared 8-token span across two docs is found exactly once with
    the right counts; docs shorter than k emit nothing (the sequence()
    descending-range trap); a doc repeating the span twice counts both
    occurrences but one distinct doc."""
    span = "a b c d e f g h"
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            f"x y {span} q r",          # span at pos 2
            f"{span} tail words here",  # span at pos 0
            "too short",                # < 8 tokens: no windows
            f"{span} mid {span}",       # same span twice, one doc
        ],
    })
    rows = D.duplicate_spans(spark.createDataFrame(pdf), k=8).collect()
    # every window of doc 4 that overlaps both copies is unique to doc 4,
    # so cross-doc rows come only from the exact planted span
    target = [r for r in rows if r.n_docs == 3]
    assert len(target) == 1
    r = target[0]
    assert (r.n_docs, r.first_doc, r.last_doc) == (3, 1, 4)
    assert r.n_occurrences == 4  # docs 1, 2 + twice in doc 4
    assert all(row.n_docs > 1 for row in rows)


def test_duplicate_spans_matches_python_oracle(spark):
    """Random tiny-vocab corpora vs an independent pure-Python oracle:
    exact row set (hash, n_docs, n_occurrences, first, last). One Spark
    job over all generated corpora (hypothesis + a session-scoped Spark
    fixture don't mix well per-example; a seeded sweep covers the same
    space)."""
    import hashlib
    import random

    for seed in range(12):
        rng = random.Random(seed)
        k = rng.choice([2, 3, 5])
        docs = []
        for did in range(rng.randint(1, 8)):
            n = rng.randint(0, 12)
            docs.append((did, " ".join(rng.choice("ab") for _ in range(n))))

        expect = {}
        for did, text in docs:
            toks = [t for t in text.split(" ") if t]
            for i in range(len(toks) - k + 1):
                h = hashlib.md5(" ".join(toks[i:i + k]).encode()).hexdigest()
                expect.setdefault(h, []).append(did)
        expect = {
            h: (len(set(ds)), len(ds), min(ds), max(ds))
            for h, ds in expect.items() if len(set(ds)) > 1
        }

        got = {
            r.h: (r.n_docs, r.n_occurrences, r.first_doc, r.last_doc)
            for r in D.duplicate_spans(
                spark.createDataFrame(docs, "doc_id int, text string"), k=k
            ).collect()
        }
        assert got == expect, f"seed={seed} k={k}"


def test_semantic_dedup_trained_centroids_and_drop_rule(spark):
    """Trained-quantizer path: kmeans centroids in, exact copies dropped
    (lower-id survivor kept), near-orthogonal vectors kept; copies land
    in the same cell as their originals by assignment determinism."""
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = np.round(rng.standard_normal((40, 6)), 3)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    rows += [(100 + i, [float(x) for x in vecs[i]]) for i in range(5)]  # copies
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cents = D.kmeans_train(emb, k=4, iters=3)
    out = {r.vec_id: (r.cell, r.dropped)
           for r in D.semantic_dedup(emb, threshold=0.999, centroids=cents).collect()}
    assert len(out) == 45
    for i in range(5):
        assert out[100 + i][1] is True, f"copy of {i} not dropped"
        assert out[100 + i][0] == out[i][0], "copy in a different cell"
        assert out[i][1] is False, f"original {i} wrongly dropped"
    # gaussian vectors at d=6 don't hit cosine 0.999 by chance
    assert sum(d for _, d in out.values()) == 5


def test_repetition_metrics_edges(spark):
    """Hand corpus pinning the Gopher-filter edge cases: empty and
    1-token docs are excluded (no bigram exists), a 2-token doc has
    top_bigram_frac 1.0, an all-repeats doc fails the dup-token
    threshold, and a long all-distinct doc is kept."""
    docs = [
        (0, ""),                       # excluded: 0 tokens
        (1, "solo"),                   # excluded: 1 token
        (2, "x  y"),                   # 2 tokens (double space collapses), bigram frac 1.0
        (3, "a b a b a b"),            # dup 4/6, top bigram 'a b' 3/5
        (4, "one two three four five six seven eight nine ten"),
    ]
    out = {r.doc_id: r for r in D.repetition_metrics(
        spark.createDataFrame(docs, "doc_id int, text string")).collect()}
    assert set(out) == {2, 3, 4}
    assert out[2].top_bigram_frac == 1.0 and out[2].keep is False
    assert out[3].dup_token_frac == pytest.approx(4 / 6, abs=1e-6)
    assert out[3].top_bigram_frac == pytest.approx(3 / 5, abs=1e-6)
    assert out[3].keep is False
    assert out[4].dup_token_frac == 0.0
    assert out[4].top_bigram_frac == pytest.approx(1 / 9, abs=1e-6)
    assert out[4].keep is True


def test_hash_split_stable_and_proportional(spark):
    """The split is a pure function of the id: identical across runs,
    unchanged when the table grows, and ~80/10/10 over 2000 ids."""
    import hashlib

    ids = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: (r.bucket, r.split) for r in D.hash_split(ids).collect()}
    b = {r.doc_id: (r.bucket, r.split)
         for r in D.hash_split(ids.union(spark.range(2000, 4000)
                                         .withColumnRenamed("id", "doc_id"))).collect()
         if r.doc_id < 2000}
    assert a == b  # growth never reassigns an old row

    # portable-hash parity: bucket == int(md5(id)[:15], 16) % 100
    for did in (0, 7, 1999):
        assert a[did][0] == int(hashlib.md5(str(did).encode()).hexdigest()[:15], 16) % 100

    from collections import Counter
    frac = Counter(s for _, s in a.values())
    assert 0.75 < frac["train"] / 2000 < 0.85
    assert 0.06 < frac["valid"] / 2000 < 0.14
    assert 0.06 < frac["test"] / 2000 < 0.14

    custom = D.hash_split(ids, train_pct=50, valid_pct=25)
    got = Counter(r.split for r in custom.collect())
    assert abs(got["train"] / 2000 - 0.50) < 0.05
    assert abs(got["valid"] / 2000 - 0.25) < 0.05


def test_redact_pii_ordering_and_counts(spark):
    """The email pass must run before the IP pass (an address like
    user@10.0.0.5.example.com would otherwise be double-redacted), and
    counts are audited on the original text."""
    docs = [
        (0, "reach me at a.b-c%d@host-name.example.org today"),
        (1, "server 10.0.255.5 and 192.168.1.1 rebooted"),
        (2, "call +44-555-0123 or +1-555-9999"),
        (3, "combo x@y.io 1.2.3.4 +1-555-0000"),
        (4, "clean text with no pii at all"),
        (5, "v4-ish 999.999.999.999 still matches the defanger"),
        (6, "not-an-email @ host.com and bare 1.2.3 triple"),
    ]
    out = {r.doc_id: r for r in D.redact_pii(
        spark.createDataFrame(docs, "doc_id int, text string")).collect()}
    assert out[0].redacted == "reach me at <EMAIL> today"
    assert (out[0].n_emails, out[0].n_ips, out[0].n_phones) == (1, 0, 0)
    assert out[1].redacted == "server <IP> and <IP> rebooted"
    assert out[1].n_ips == 2
    assert out[2].redacted == "call <PHONE> or <PHONE>"
    assert out[2].n_phones == 2
    assert out[3].redacted == "combo <EMAIL> <IP> <PHONE>"
    assert out[4].redacted == docs[4][1] and out[4].n_emails == 0
    # defanging is deliberately conservative: impossible octets still redact
    assert "<IP>" in out[5].redacted
    # '@ host.com' has no local part; '1.2.3' is not 4 octets
    assert out[6].redacted == docs[6][1]


def test_decontaminate_flags_only_overlapping_docs(spark):
    """Docs sharing an 8-gram with the benchmark are flagged with exact
    distinct/total counts; short benchmark rows (<8 tokens) contribute
    no grams; clean docs are absent from the result."""
    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    docs = [
        (0, base),                                   # contains bench grams
        (1, "x1 x2 x3 x4 x5 x6 x7 x8 x9"),           # clean
        (2, base + " " + base),                      # repeated: extra positional hits
        (3, "tiny doc"),                             # < 8 tokens: no grams
    ]
    bench = [(100, base), (101, "short bench row")]
    out = {r.doc_id: r for r in D.decontaminate(
        spark.createDataFrame(docs, "doc_id int, text string"),
        spark.createDataFrame(bench, "bench_id int, text string"),
        n=8,
    ).collect()}
    assert set(out) == {0, 2}
    # bench grams of 'w1..w10' = 3 distinct 8-grams; doc0 hits each once
    assert (out[0].n_contaminated_ngrams, out[0].n_hits) == (3, 3)
    # doc2 = base twice: every bench gram occurs >= twice (wraparound
    # grams across the seam add more positions but no new distinct hash
    # beyond the 3 bench grams)
    assert out[2].n_contaminated_ngrams == 3 and out[2].n_hits >= 6


def test_mix_rates_alpha_extremes_and_cap(spark):
    """alpha=1 gives proportional weights, alpha=0 uniform; keep_rate
    caps at 1.0 for sources the target over-asks."""
    rows = [(i, "big") for i in range(90)] + [(100 + i, "small") for i in range(10)]
    d = spark.createDataFrame(rows, "doc_id int, source string")

    prop = {r.source: r for r in D.mix_rates(d, alpha=1.0, target_rows=50).collect()}
    assert prop["big"].weight == pytest.approx(0.9, abs=1e-6)
    assert prop["small"].weight == pytest.approx(0.1, abs=1e-6)
    assert prop["big"].keep_rate == pytest.approx(0.5, abs=1e-6)

    unif = {r.source: r.weight for r in D.mix_rates(d, alpha=0.0).collect()}
    assert unif["big"] == unif["small"] == pytest.approx(0.5, abs=1e-6)

    capped = {r.source: r.keep_rate for r in D.mix_rates(d, alpha=0.0, target_rows=150).collect()}
    assert capped["small"] == 1.0  # 150*0.5/10 = 7.5 → capped


def test_stratified_sample_exact_set(spark):
    """The kept set equals the Python md5 recomputation; unknown
    sources fall to default_ppm (0 drops them, 10^6 keeps them)."""
    import hashlib

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(300)]
    d = spark.createDataFrame(rows, "doc_id int, source string")
    rates = {"a": 250000, "b": 900000}

    def frac(did):
        return int(hashlib.md5(f"{did}#mix".encode()).hexdigest()[:15], 16) % 1_000_000

    expect = {i for i, s in rows if frac(i) < rates.get(s, 0)}
    got = {r.doc_id for r in D.stratified_sample(d, rates, default_ppm=0).collect()}
    assert got == expect and 0 < len(got) < 300

    all_c = {r.doc_id for r in D.stratified_sample(d, rates, default_ppm=1_000_000).collect()}
    assert all_c == expect | {i for i, s in rows if s == "c"}


def test_mojibake_score_boundary(spark):
    """Artifact counting and the 1-per-200-chars verdict, including the
    exact boundary (n*200 == length is still clean)."""
    pad = "x" * 196  # 'Ã©' is 2 chars + 196 + 2 spaces = 200 chars, 1 artifact
    docs = [
        (0, "perfectly clean ascii text"),
        (1, f" Ã© {pad}"),            # exactly at the boundary: clean
        (2, "Ã© short"),              # way over density: dirty
        (3, "café real utf-8 is fine"),  # lone é is NOT an artifact
    ]
    out = {r.doc_id: r for r in D.mojibake_score(
        spark.createDataFrame(docs, "doc_id int, text string")).collect()}
    assert out[0].n_mojibake == 0 and out[0].clean is True
    assert out[1].n_mojibake == 1 and len(docs[1][1]) == 200 and out[1].clean is True
    assert out[2].n_mojibake == 1 and out[2].clean is False
    assert out[3].n_mojibake == 0


def test_lm_quality_score_self_and_external_vocab(spark):
    """Self-trained: common-token docs score fewer bits than rare-token
    docs, values match a closed-form recomputation; external vocab:
    unseen tokens hit the min(p)/2 backoff."""
    import math

    docs = [(0, "a a a a"), (1, "a a b b"), (2, "c a a a")]
    # corpus: a×9, b×2, c×1, total 12
    d = spark.createDataFrame(docs, "doc_id int, text string")
    out = {r.doc_id: r for r in D.lm_quality_score(d).collect()}
    bits = lambda p: -math.log2(p)
    assert out[0].bits_per_token == pytest.approx(bits(9 / 12), abs=1e-5)
    assert out[1].bits_per_token == pytest.approx((2 * bits(9/12) + 2 * bits(2/12)) / 4, abs=1e-5)
    assert out[2].bits_per_token == pytest.approx((bits(1/12) + 3 * bits(9/12)) / 4, abs=1e-5)
    # the all-common doc scores strictly fewer bits than any mixed doc
    assert out[0].bits_per_token < min(out[1].bits_per_token, out[2].bits_per_token)
    assert out[0].n_tokens == 4

    vocab = spark.createDataFrame([("a", 0.5), ("b", 0.25)], "tok string, p double")
    ext = {r.doc_id: r.bits_per_token for r in D.lm_quality_score(d, vocab_df=vocab).collect()}
    # 'c' is unseen → backoff p = min(p)/2 = 0.125
    assert ext[2] == pytest.approx((bits(0.125) + 3 * bits(0.5)) / 4, abs=1e-5)


def test_pack_sequences_contiguity_and_spans(spark):
    """Per shard the stream is gap-free in doc_id order, bins derive
    from start offsets exactly, span counts match the boundary math,
    and empty docs are excluded."""
    rows = [(i, "w " * ((i % 7) + 1)) for i in range(60)] + [(100, ""), (101, "  ")]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    out = D.pack_sequences(d, seq_len=10, n_shards=4).collect()
    assert {r.doc_id for r in out} == set(range(60))  # empties dropped

    by_shard = {}
    for r in sorted(out, key=lambda r: (r.shard, r.doc_id)):
        cur = by_shard.setdefault(r.shard, 0)
        assert r.start_off == cur, f"gap in shard {r.shard} at doc {r.doc_id}"
        assert r.bin == cur // 10 and r.pos_in_bin == cur % 10
        end = cur + r.n_tokens - 1
        assert r.n_bins_spanned == end // 10 - cur // 10 + 1
        by_shard[r.shard] = cur + r.n_tokens
    assert len(by_shard) > 1  # hash sharding actually spread the docs
