"""Operator-gate query suite: Spark implementation + DuckDB oracle pairs.

One named query per implemented operator family from SURVEY.md §2 (IDs
in the names), each over the driver-generated TPC-H-ish tables. Every
computed column is aliased identically in the Spark plan and the oracle
SQL; double-valued outputs are rounded to 6 decimals on both sides so
value hashes are stable across engines' float summation orders.

Scale notes are in each docstring: these are the same physical shapes
(broadcast joins, partial aggs, window cumsums, anti-joins) the crawl
engine uses, demonstrated on relational data where a SQL oracle exists.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from blockchainspider_spark.session import load_tables

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    import os

    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --------------------------------------------------------------------------
# scans / filters / projections (S1, P1-P8, W2/W3, O5)
# --------------------------------------------------------------------------

def q_s1_keyset_scan(spark, sf_dir):
    """S1: keyset-paginated scan — predicate pushdown on the range key,
    total-ordered page fetch (Etherscan txlist analog). Filters and the
    2-column projection reach the parquet scan (PushedFilters)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where((F.col("l_orderkey") >= 100) & (F.col("l_orderkey") < 2000))
        .where(F.col("l_suppkey").isin(1, 2, 3))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    )


def q_s1_keyset_scan_sql():
    return """
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey
    FROM lineitem
    WHERE l_orderkey >= 100 AND l_orderkey < 2000 AND l_suppkey IN (1,2,3)
    ORDER BY l_orderkey, l_linenumber LIMIT 100
    """


def q_p2_projection_cast(spark, sf_dir):
    """P2: projection + rename + cast + defaults (raw→transfer shape)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("tx_id"),
        F.lower(F.col("o_orderstatus")).alias("status"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string").alias("value"),
        F.coalesce(F.col("o_orderpriority"), F.lit("none")).alias("priority"),
        F.when(F.col("o_custkey") % 100 == 0, F.lit("0x" + "0" * 40))
        .otherwise(F.concat(F.lit("0x"), F.lpad(F.col("o_custkey").cast("string"), 40, "0")))
        .alias("contract_address"),
    )


def q_p2_projection_cast_sql():
    return """
    SELECT o_orderkey AS tx_id,
           lower(o_orderstatus) AS status,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS value,
           coalesce(o_orderpriority, 'none') AS priority,
           CASE WHEN o_custkey % 100 = 0 THEN '0x' || repeat('0', 40)
                ELSE '0x' || lpad(CAST(o_custkey AS VARCHAR), 40, '0') END AS contract_address
    FROM orders
    """


def q_p6_topic_dispatch(spark, sf_dir):
    """P6: multi-way when() routing by discriminator column (topic[0])."""
    ev = _t(spark, sf_dir, "events")
    routed = ev.withColumn(
        "route",
        F.when(F.col("event_type") == "click", "erc20")
        .when(F.col("event_type") == "view", "erc721")
        .when(F.col("event_type") == "purchase", "erc1155")
        .otherwise("other"),
    )
    return routed.groupBy("route").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


def q_p6_topic_dispatch_sql():
    return """
    SELECT CASE event_type WHEN 'click' THEN 'erc20' WHEN 'view' THEN 'erc721'
                WHEN 'purchase' THEN 'erc1155' ELSE 'other' END AS route,
           count(*) AS n, round(sum(value), 6) AS sum_value
    FROM events GROUP BY 1
    """


def q_p8_gas_filter(spark, sf_dir):
    """P8: simple pushed-down predicate (trace gas>21000 analog)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.where(F.col("l_quantity") > 21).groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows")
    )


def q_p8_gas_filter_sql():
    return "SELECT l_returnflag, count(*) AS n_rows FROM lineitem WHERE l_quantity > 21 GROUP BY 1"


# --------------------------------------------------------------------------
# joins (J1, J2, J4, J7, J9)
# --------------------------------------------------------------------------

def q_j1_frontier_expand(spark, sf_dir):
    """J1: frontier-expand join — small popped set broadcast against the
    big fact table, both endpoint directions unioned. Seeds = customers
    1..5 expanding over orders (out) and their lineitems (in)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    seeds = spark.range(1, 6).select(F.col("id").alias("seed"))
    out_side = orders.join(
        F.broadcast(seeds), orders.o_custkey == seeds.seed
    ).select("seed", F.col("o_orderkey").alias("edge_id"), F.lit("out").alias("direction"))
    in_side = li.join(F.broadcast(seeds), li.l_suppkey == seeds.seed).select(
        "seed",
        F.col("l_orderkey").alias("edge_id"),
        F.lit("in").alias("direction"),
    )
    return (
        out_side.unionByName(in_side)
        .groupBy("seed", "direction")
        .agg(F.count("*").alias("n_edges"), F.count_distinct("edge_id").alias("n_distinct"))
    )


def q_j1_frontier_expand_sql():
    return """
    WITH seeds AS (SELECT unnest(range(1,6)) AS seed),
    expanded AS (
      SELECT s.seed, o.o_orderkey AS edge_id, 'out' AS direction
      FROM orders o JOIN seeds s ON o.o_custkey = s.seed
      UNION ALL
      SELECT s.seed, l.l_orderkey AS edge_id, 'in' AS direction
      FROM lineitem l JOIN seeds s ON l.l_suppkey = s.seed
    )
    SELECT seed, direction, count(*) AS n_edges, count(DISTINCT edge_id) AS n_distinct
    FROM expanded GROUP BY 1, 2
    """


def q_j2_broadcast_enrich(spark, sf_dir):
    """J2: broadcast hash join — fact enriched from a small dimension
    (receipt⋈transaction analog); aggregate per dimension attribute."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        )
    )


def q_j2_broadcast_enrich_sql():
    return """
    SELECT n_name, count(*) AS n_orders, round(sum(o_totalprice), 4) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1
    """


def q_j4_pre_post_balance(spark, sf_dir):
    """J4+P11: full-outer pre/post balance join with coalesce(0) and
    changed-balance filter (Solana token-balance analog)."""
    ev = _t(spark, sf_dir, "events")
    pre = ev.where(F.col("event_type") == "click").groupBy("user_id").agg(
        F.round(F.sum("value"), 6).alias("pre_amount")
    )
    post = ev.where(F.col("event_type") == "purchase").groupBy("user_id").agg(
        F.round(F.sum("value"), 6).alias("post_amount")
    )
    return (
        pre.join(post, on="user_id", how="full_outer")
        .select(
            "user_id",
            F.coalesce("pre_amount", F.lit(0.0)).alias("pre_amount"),
            F.coalesce("post_amount", F.lit(0.0)).alias("post_amount"),
        )
        .where(F.col("pre_amount") != F.col("post_amount"))
    )


def q_j4_pre_post_balance_sql():
    return """
    WITH pre AS (SELECT user_id, round(sum(value),6) AS pre_amount FROM events
                 WHERE event_type='click' GROUP BY 1),
         post AS (SELECT user_id, round(sum(value),6) AS post_amount FROM events
                  WHERE event_type='purchase' GROUP BY 1)
    SELECT coalesce(pre.user_id, post.user_id) AS user_id,
           coalesce(pre_amount, 0.0) AS pre_amount,
           coalesce(post_amount, 0.0) AS post_amount
    FROM pre FULL OUTER JOIN post ON pre.user_id = post.user_id
    WHERE coalesce(pre_amount,0.0) <> coalesce(post_amount,0.0)
    """


def q_j7_seen_anti_join(spark, sf_dir):
    """J7/U3: the seen-set anti-join — candidates minus visited
    (customers that never ordered)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(
        orders.select(F.col("o_custkey").alias("c_custkey")), on="c_custkey", how="left_anti"
    ).select("c_custkey", "c_mktsegment")


def q_j7_seen_anti_join_sql():
    return """
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """


def q_j9_allow_list_semi(spark, sf_dir):
    """J9/P4: allow-list left-semi join against a broadcast token list."""
    part = _t(spark, sf_dir, "part")
    allow = part.select("p_brand").distinct().orderBy("p_brand").limit(3)
    return (
        part.join(F.broadcast(allow), on="p_brand", how="left_semi")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"), F.round(F.avg("p_retailprice"), 6).alias("avg_price"))
    )


def q_j9_allow_list_semi_sql():
    return """
    WITH allow AS (SELECT DISTINCT p_brand FROM part ORDER BY p_brand LIMIT 3)
    SELECT p_brand, count(*) AS n_parts, round(avg(p_retailprice), 6) AS avg_price
    FROM part WHERE p_brand IN (SELECT p_brand FROM allow)
    GROUP BY 1
    """


# --------------------------------------------------------------------------
# aggregations (A1-A3, A8/J8, A12, TPC-H-style rollup)
# --------------------------------------------------------------------------

def q_a1_haircut_outsum(spark, sf_dir):
    """A1: per-node out-value sum (haircut denominator) — partial+final
    agg, map-side combine."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_suppkey").alias("node")).agg(
        F.round(F.sum("l_extendedprice"), 4).alias("out_sum")
    )


def q_a1_haircut_outsum_sql():
    return "SELECT l_suppkey AS node, round(sum(l_extendedprice), 4) AS out_sum FROM lineitem GROUP BY 1"


def q_a2_weight_scatter(spark, sf_dir):
    """A2: haircut scatter — per-edge share value/out_sum, re-aggregated
    on the destination (groupBy-sum posing as weight propagation)."""
    li = _t(spark, sf_dir, "lineitem")
    out_sum = li.groupBy("l_suppkey").agg(F.sum("l_extendedprice").alias("out_sum"))
    return (
        li.join(out_sum, on="l_suppkey")
        .withColumn("share", F.col("l_extendedprice") / F.col("out_sum"))
        .groupBy(F.col("l_partkey").alias("dst"))
        .agg(F.round(F.sum("share"), 6).alias("weight"))
    )


def q_a2_weight_scatter_sql():
    return """
    WITH out_sum AS (SELECT l_suppkey, sum(l_extendedprice) AS out_sum FROM lineitem GROUP BY 1)
    SELECT l_partkey AS dst, round(sum(l_extendedprice / out_sum), 6) AS weight
    FROM lineitem JOIN out_sum USING (l_suppkey) GROUP BY 1
    """


def q_a3_degree(spark, sf_dir):
    """A3: APPR degree — distinct undirected neighbors per node."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_suppkey").alias("node")).agg(
        F.count_distinct("l_partkey").alias("degree")
    )


def q_a3_degree_sql():
    return "SELECT l_suppkey AS node, count(DISTINCT l_partkey) AS degree FROM lineitem GROUP BY 1"


def q_a8_swap_cancel(spark, sf_dir):
    """A8/J8: TTRRedirect profit netting — signed values summed per
    (tx, leg); zero-net legs cancelled (aggregation posing as self-join)."""
    li = _t(spark, sf_dir, "lineitem")
    signed = li.withColumn(
        "signed_qty",
        F.when(F.col("l_returnflag") == "R", -F.col("l_quantity")).otherwise(F.col("l_quantity")),
    )
    # (tx, leg) pairs are nearly all unique, so map-side partial
    # aggregation builds a ~|lineitem|-entry hash map for almost no
    # reduction; repartition on the keys first and aggregate once
    # co-partitioned (r7: 1.2s -> 0.85s at sf1.0; sums of +-integer
    # quantities are float-exact, so results are identical)
    return (
        signed.select(F.col("l_orderkey").alias("tx"),
                      F.col("l_partkey").alias("leg"), "signed_qty")
        .repartition(F.col("tx"), F.col("leg"))
        .groupBy("tx", "leg")
        .agg(F.round(F.sum("signed_qty"), 6).alias("net"))
        .where(F.col("net") != 0)
    )


def q_a8_swap_cancel_sql():
    return """
    SELECT l_orderkey AS tx, l_partkey AS leg,
           round(sum(CASE WHEN l_returnflag='R' THEN -l_quantity ELSE l_quantity END), 6) AS net
    FROM lineitem GROUP BY 1, 2 HAVING net <> 0
    """


def q_a12_pop_argmax(spark, sf_dir):
    """A12/O3: deterministic top-1 pop — argmax with total tiebreak
    (weight desc, first-insertion asc ≅ key asc)."""
    cust = _t(spark, sf_dir, "customer")
    return cust.orderBy(F.desc("c_acctbal"), F.asc("c_custkey")).limit(1).select(
        "c_custkey", F.round("c_acctbal", 6).alias("weight")
    )


def q_a12_pop_argmax_sql():
    return """
    SELECT c_custkey, round(c_acctbal, 6) AS weight FROM customer
    ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 1
    """


def q_flagship_pricing_rollup(spark, sf_dir):
    """Flagship relational agg (TPC-H Q1 shape): wide scan → partial agg →
    final agg; whole-stage codegen end to end."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def q_flagship_pricing_rollup_sql():
    return """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(sum(l_extendedprice), 4) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(avg(l_quantity), 6) AS avg_qty,
           count(*) AS count_order
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY 1, 2
    """


def q_k8_motif_kernel(spark, sf_dir):
    """K8/A15: per-tx-subgraph motif kernel (MoTS analog) in the
    MANY-SMALL-GROUPS shape that scales: repartition by the group key,
    then ONE vectorized pandas groupby per partition inside mapInPandas —
    not applyInPandas, whose per-group Python call + frame construction
    costs ~0.5 ms × millions of tiny groups (147k groups took 67 s that
    way at sf0.1; this shape takes ~4 s). applyInPandas remains the right
    tool when individual groups are heavy (e.g. the TTRRedirect walk)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_partkey")

    def kernel(batches):
        import pandas as pd

        parts = list(batches)  # all Arrow batches of this partition — a
        if not parts:          # group never straddles partitions after
            return             # the repartition on the group key
        pdf = pd.concat(parts, ignore_index=True)
        g = pdf.groupby("l_orderkey", sort=False)
        out = pd.DataFrame({
            "tx": g.size().index.to_numpy("int64"),
            "n_edges": g.size().to_numpy("int64"),
            "n_supp": g["l_suppkey"].nunique().to_numpy("int64"),
            "n_part": g["l_partkey"].nunique().to_numpy("int64"),
        })
        out["density"] = (out["n_edges"] / (out["n_supp"] * out["n_part"])).round(6)
        yield out

    return li.repartition("l_orderkey").mapInPandas(
        kernel, "tx long, n_edges long, n_supp long, n_part long, density double"
    )


def q_k8_motif_kernel_sql():
    return """
    SELECT l_orderkey AS tx, count(*) AS n_edges,
           count(DISTINCT l_suppkey) AS n_supp, count(DISTINCT l_partkey) AS n_part,
           round(count(*) / (count(DISTINCT l_suppkey) * count(DISTINCT l_partkey)), 6) AS density
    FROM lineitem GROUP BY 1
    """


# --------------------------------------------------------------------------
# windows / sorts (W1-W3, O1)
# --------------------------------------------------------------------------

def q_w1_cumulative_flow(spark, sf_dir):
    """W1/A7: time-ordered cumulative sums (TTRTime suffix/prefix weights)
    — running and remaining value per user over the event stream."""
    ev = _t(spark, sf_dir, "events")
    w_run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_after = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w_run), 6).alias("running_value"),
        F.round(F.sum("value").over(w_after), 6).alias("remaining_value"),
    )


def q_w1_cumulative_flow_sql():
    return """
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_value,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 6) AS remaining_value
    FROM events
    """


def q_w3_pagination(spark, sf_dir):
    """W3/O5: page slicing via row_number (offset-paginated scan analog):
    page 2 of size 10 per nation by balance."""
    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") > 10) & (F.col("rn") <= 20))
        .select("c_nationkey", "c_custkey", "rn")
    )


def q_w3_pagination_sql():
    return """
    SELECT c_nationkey, c_custkey, rn FROM (
      SELECT c_nationkey, c_custkey,
             row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
      FROM customer) t
    WHERE rn > 10 AND rn <= 20
    """


def q_w2_cursor_resume(spark, sf_dir):
    """W2/T3: pagination cursor — max progress key per scan unit."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_custkey").alias("scan_unit")).agg(
        F.max("o_orderkey").alias("cursor"), F.count("*").alias("n_pages")
    )


def q_w2_cursor_resume_sql():
    return """
    SELECT o_custkey AS scan_unit, max(o_orderkey) AS cursor, count(*) AS n_pages
    FROM orders GROUP BY 1
    """


def q_o1_rank_topk(spark, sf_dir):
    """O1/O3: rank sink ordering — global top-k with total tiebreak."""
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .limit(10)
        .select("c_custkey", F.round("c_acctbal", 6).alias("rank_weight"))
    )


def q_o1_rank_topk_sql():
    return """
    SELECT c_custkey, round(c_acctbal, 6) AS rank_weight FROM customer
    ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 10
    """


# --------------------------------------------------------------------------
# set ops (U1, U4)
# --------------------------------------------------------------------------

def q_u1_union_distinct(spark, sf_dir):
    """U1: endpoint union minus self (neighbor-set construction)."""
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    return (
        cust.select(F.col("c_nationkey").alias("nationkey"))
        .union(supp.select(F.col("s_nationkey")))
        .distinct()
    )


def q_u1_union_distinct_sql():
    return """
    SELECT c_nationkey AS nationkey FROM customer
    UNION SELECT s_nationkey FROM supplier
    """


def q_u4_exact_dedup(spark, sf_dir):
    """U4: exact dedup on a compound key (sink-side id dedup analog)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").dropDuplicates().groupBy("user_id").agg(
        F.count("*").alias("n_types")
    )


def q_u4_exact_dedup_sql():
    return """
    SELECT user_id, count(*) AS n_types
    FROM (SELECT DISTINCT user_id, event_type FROM events) GROUP BY 1
    """


# --------------------------------------------------------------------------
# scalar functions (F1, F4-F6, F13-F16)
# --------------------------------------------------------------------------

def q_f1_transfer_id(spark, sf_dir):
    """F1: sha-256 dedup id over '_'-joined identity fields (sha1 in the
    reference; 256 here because the DuckDB oracle lacks sha1)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.sha2(
            F.concat_ws(
                "_",
                F.col("o_orderkey").cast("string"),
                F.col("o_custkey").cast("string"),
                F.col("o_orderstatus"),
            ),
            256,
        ).alias("transfer_id"),
    )


def q_f1_transfer_id_sql():
    return """
    SELECT o_orderkey,
           sha256(concat_ws('_', CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR), o_orderstatus)) AS transfer_id
    FROM orders
    """


def q_f4_hex_roundtrip(spark, sf_dir):
    """F4: hex↔dec conversion (wei parsing analog): to-hex then parse back."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.lower(F.hex(F.col("o_orderkey"))).alias("hex_repr"),
        F.conv(F.hex(F.col("o_orderkey")), 16, 10).cast("long").alias("dec_back"),
    )


def q_f4_hex_roundtrip_sql():
    return """
    SELECT o_orderkey, lower(to_hex(o_orderkey)) AS hex_repr,
           ('0x' || to_hex(o_orderkey))::BIGINT AS dec_back
    FROM orders
    """


def q_f5_word_to_address(spark, sf_dir):
    """F5/F17: last-40-hex-chars → lowercase 0x address."""
    o = _t(spark, sf_dir, "orders")
    word = F.sha2(F.col("o_orderkey").cast("string"), 256)
    return o.select(
        "o_orderkey",
        F.lower(F.concat(F.lit("0x"), F.substring(word, -40, 40))).alias("address"),
    )


def q_f5_word_to_address_sql():
    return """
    SELECT o_orderkey,
           lower('0x' || substr(sha256(CAST(o_orderkey AS VARCHAR)), 25, 40)) AS address
    FROM orders
    """


def q_f6_split_words(spark, sf_dir):
    """F6: fixed-width word chunking of a hex blob via a higher-order
    transform(sequence(...)) — no UDF."""
    o = _t(spark, sf_dir, "orders")
    blob = F.sha2(F.col("o_orderkey").cast("string"), 256)  # 64 hex chars
    words = F.array(F.substring(blob, 1, 32), F.substring(blob, 33, 32))
    return o.select("o_orderkey", F.posexplode(words).alias("word_idx", "word"))


def q_f6_split_words_sql():
    return """
    SELECT o_orderkey, i - 1 AS word_idx,
           substr(sha256(CAST(o_orderkey AS VARCHAR)), (i - 1) * 32 + 1, 32) AS word
    FROM orders, (SELECT unnest(range(1, 3)) AS i)
    """


def q_f13_url_rewrite(spark, sf_dir):
    """F13/F14: regex URL rewrite + zero-padding (ipfs:// → gateway)."""
    d = _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("ipfs://"), F.col("source"), F.lit("/"), F.col("doc_id").cast("string"))
    return d.select(
        "doc_id",
        F.regexp_replace(url, "^ipfs://", "https://ipfs.io/ipfs/").alias("gateway_url"),
        F.lpad(F.lower(F.hex(F.col("doc_id"))), 64, "0").alias("token_id_word"),
    )


def q_f13_url_rewrite_sql():
    return """
    SELECT doc_id,
           regexp_replace('ipfs://' || source || '/' || CAST(doc_id AS VARCHAR), '^ipfs://', 'https://ipfs.io/ipfs/') AS gateway_url,
           lpad(lower(to_hex(doc_id)), 64, '0') AS token_id_word
    FROM documents
    """


def q_f16_unixtime(spark, sf_dir):
    """F16: timestamp ↔ epoch-seconds conversions."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.unix_timestamp("ts").alias("epoch_s"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )


def q_f16_unixtime_sql():
    return """
    SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s, strftime(ts, '%Y-%m-%d') AS day
    FROM events
    """


def q_f15_json_parse(spark, sf_dir):
    """F15/S8: schema'd JSON parsing of a payload column (from_json —
    Arrow-free, JVM-side) + aggregation over the extracted field."""
    ev = _t(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json(F.col("props"), "k int").getField("k").alias("k"),
    )
    # DuckDB's sum(INTEGER) yields HUGEINT (int128, surfaced as Decimal);
    # the driver's hash normalization renders that differently from Spark's
    # bigint.  Cast to 64-bit on BOTH engines so the value hashes agree.
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("k").cast("long").alias("sum_k"),
        F.max("k").alias("max_k"),
    )


def q_f15_json_parse_sql():
    return """
    SELECT event_type, count(*) AS n,
           CAST(sum(json_extract(props, '$.k')::INT) AS BIGINT) AS sum_k,
           max(json_extract(props, '$.k')::INT) AS max_k
    FROM events GROUP BY 1
    """


def q_f9_entity_extract(spark, sf_dir):
    """F9: regex entity extraction + explode (address/hash mining from
    page text) — long tokens as stand-in entities."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.expr(r"regexp_extract_all(text, '[a-z]{6,}', 0)")).alias("entity"))
        .groupBy("entity")
        .agg(F.count("*").alias("n_mentions"))
    )


def q_f9b_checksum_extract(spark, sf_dir):
    """F9 (validated form): plant one deterministic BTC address per doc —
    even doc_ids carry a correct base58check checksum, odd doc_ids a
    corrupted one — then run the real extract+validate kernel
    (base58check ≅ bitcoin.is_address, reference web.py:94-97). Only the
    valid half must survive; the oracle knows the ground truth by
    construction, so a validator bug on either side breaks the match."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 50).select("doc_id")

    def kernel(batches):
        import pandas as pd

        from blockchainspider_spark.fixtures.generators import btc_address
        from blockchainspider_spark.functions.textual import extract_entities

        for pdf in batches:
            out = {"net": [], "value": []}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                text = f"pay {btc_address(i, valid=(i % 2 == 0))} today"
                for net, val in extract_entities(text):
                    out["net"].append(net)
                    out["value"].append(val)
            yield pd.DataFrame(out)

    return (
        d.mapInPandas(kernel, "net string, value string")
        .groupBy("net", "value")
        .agg(F.count("*").cast("long").alias("n"))
    )


def q_f9b_checksum_extract_sql():
    from blockchainspider_spark.fixtures.generators import btc_address

    rows = ", ".join(
        f"({i}, '{btc_address(i, valid=(i % 2 == 0))}', {'TRUE' if i % 2 == 0 else 'FALSE'})"
        for i in range(50)
    )
    return f"""
    WITH planted(doc_id, addr, ok) AS (VALUES {rows})
    SELECT 'BTC-Like-address' AS net, addr AS value, count(*) AS n
    FROM planted
    WHERE ok AND doc_id IN (SELECT doc_id FROM documents WHERE doc_id < 50)
    GROUP BY 1, 2
    """


_SDN_NS = "https://sanctionslistservice.ofac.treas.gov/api/PublicationPreview/exports/XML"


def _sdn_entry_xml(i: int) -> str:
    """Deterministic SDN-shaped XML doc for spine row i: even i carries a
    digital-currency address (XBT for i%4==0 else ETH), odd i has only a
    passport id (must be filtered — reference _has_address, ofac.py:74-79)."""
    if i % 2 == 0:
        net = "XBT" if i % 4 == 0 else "ETH"
        dca = (f"<id><idType>Digital Currency Address - {net}</idType>"
               f"<idNumber>addr-{i}</idNumber></id>")
    else:
        dca = ""
    return (
        f'<sdnList xmlns="{_SDN_NS}"><sdnEntry><uid>{i}</uid>'
        f"<firstName>F{i}</firstName><lastName>L{i}</lastName>"
        f"<sdnType>Individual</sdnType><idList>"
        f"<id><idType>Passport</idType><idNumber>P{i}</idNumber></id>{dca}"
        f"</idList></sdnEntry></sdnList>"
    )


def q_s18_ofac_xml(spark, sf_dir):
    """S18: stdlib-XML SDN parse (mapInPandas ElementTree kernel) over
    deterministic SDN documents — entries without a digital-currency
    address are dropped, XBT maps to BTC (reference ofac.py:22-79)."""
    from blockchainspider_spark.sources.feeds import parse_ofac_xml

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 40).select("doc_id")

    def make_xml(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame({"doc": [_sdn_entry_xml(int(i)) for i in pdf["doc_id"]]})

    docs = d.mapInPandas(make_xml, "doc string")
    return parse_ofac_xml(docs).select("uid", "net", "address")


def q_s18_ofac_xml_sql():
    return """
    SELECT doc_id::VARCHAR AS uid,
           CASE WHEN doc_id % 4 = 0 THEN 'BTC' ELSE 'ETH' END AS net,
           'addr-' || doc_id::VARCHAR AS address
    FROM documents WHERE doc_id < 40 AND doc_id % 2 = 0
    """


def q_f9_entity_extract_sql():
    return """
    SELECT entity, count(*) AS n_mentions
    FROM (SELECT doc_id, unnest(regexp_extract_all(text, '[a-z]{6,}')) AS entity FROM documents)
    GROUP BY 1
    """


# --------------------------------------------------------------------------
# crawl semantics on relational data (J1+J7 composed, BFS ball via SQL)
# --------------------------------------------------------------------------

def _bipartite_edges(spark, sf_dir):
    """customer↔part bipartite edge list via orders⋈lineitem (graph used
    by the crawl-seen queries and entry())."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
    )


def q_crawl_bfs_seen(spark, sf_dir):
    """BFS depth-2 visited set (undirected ball) from seed c1 — the exact
    seen-set semantics of the BFS strategy, as level-wise anti-joins.

    r7c (guide §8 "use what you know that the optimizer does not"): the
    edge constructor itself guarantees bipartiteness — every ``src`` is
    ``'c'||custkey`` and every ``dst`` is ``'p'||partkey`` — so the seed
    ``'c1'`` can only ever match the ``src`` endpoint (``src='c1'`` ⇔
    ``o_custkey=1``, a pushed parquet filter) and the depth-1 frontier
    (all ``p…`` nodes) can only ever match ``dst``. The former
    materialize-the-6M-row-join + stack + probe-twice shape collapses to
    two column-pruned lineitem scans with broadcast joins and a distinct
    over only the true candidate stream. Row set identical: the dropped
    probe branches (seed vs dst, d1 vs src) match no rows by
    construction, and the d1 anti-join vs d0 drops nothing because no
    ``p…`` node equals ``'c1'``."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    seed = spark.createDataFrame([("c1",)], "node string")
    d0 = seed
    # depth-1: parts on customer 1's orders. o_custkey=1 pushes into the
    # orders scan; the surviving handful of orderkeys broadcast into one
    # lineitem scan.
    seed_orders = orders.where(F.col("o_custkey") == 1).select("o_orderkey")
    d1 = (
        li.join(F.broadcast(seed_orders),
                li.l_orderkey == F.col("o_orderkey"))
        .select(F.concat(F.lit("p"), F.col("l_partkey")).alias("node"))
        .distinct()
        .persist()
    )
    d1.count()
    # depth-2 candidates: customers of every order that touches a d1
    # part. The d1 part set broadcasts into the second lineitem scan;
    # the matched (small) orderkey set broadcasts into the orders scan.
    d1_parts = d1.select(
        F.substring("node", 2, 2147483647).cast("long").alias("l_partkey"))
    hit_orders = (
        li.join(F.broadcast(d1_parts), on="l_partkey")
        .select("l_orderkey").distinct()
    )
    d2_cands = (
        orders.join(F.broadcast(hit_orders),
                    orders.o_orderkey == F.col("l_orderkey"))
        .select(F.concat(F.lit("c"), F.col("o_custkey")).alias("node"))
    )
    # the visited set is d0 ∪ d1 ∪ N(d1) as a SET — the final distinct
    # subsumes the per-level dedup + anti-joins (union-distinct absorbs
    # re-touched nodes)
    return d0.union(d1).union(d2_cands).distinct()


def q_crawl_bfs_seen_sql():
    return """
    WITH e AS (
      SELECT 'c' || o_custkey AS src, 'p' || l_partkey AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    d0 AS (SELECT 'c1' AS node),
    d1 AS (
      SELECT DISTINCT u.node FROM e,
        LATERAL (SELECT src AS node UNION ALL SELECT dst) u
      WHERE (e.src IN (SELECT node FROM d0) OR e.dst IN (SELECT node FROM d0))
        AND u.node NOT IN (SELECT node FROM d0)
    ),
    d2 AS (
      SELECT DISTINCT u.node FROM e,
        LATERAL (SELECT src AS node UNION ALL SELECT dst) u
      WHERE (e.src IN (SELECT node FROM d1) OR e.dst IN (SELECT node FROM d1))
        AND u.node NOT IN (SELECT node FROM d0 UNION SELECT node FROM d1)
    )
    SELECT node FROM d0 UNION SELECT node FROM d1 UNION SELECT node FROM d2
    """


def q_crawl_poison_seen(spark, sf_dir):
    """Poison (forward-only) depth-2 visited set from seed c1."""
    edges = _bipartite_edges(spark, sf_dir)
    seed = spark.createDataFrame([("c1",)], "node string")
    d1 = (
        edges.join(F.broadcast(seed), edges.src == seed.node)
        .select(F.col("dst").alias("node"))
        .distinct()
        .join(seed, on="node", how="left_anti")
    )
    seen01 = seed.union(d1)
    d2 = (
        edges.join(F.broadcast(d1.withColumnRenamed("node", "hop")), edges.src == F.col("hop"))
        .select(F.col("dst").alias("node"))
        .distinct()
        .join(seen01, on="node", how="left_anti")
    )
    return seen01.union(d2).distinct()


def q_crawl_poison_seen_sql():
    return """
    WITH e AS (
      SELECT 'c' || o_custkey AS src, 'p' || l_partkey AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    d0 AS (SELECT 'c1' AS node),
    d1 AS (SELECT DISTINCT dst AS node FROM e WHERE src IN (SELECT node FROM d0)
           AND dst NOT IN (SELECT node FROM d0)),
    d2 AS (SELECT DISTINCT dst AS node FROM e WHERE src IN (SELECT node FROM d1)
           AND dst NOT IN (SELECT node FROM d0 UNION SELECT node FROM d1))
    SELECT node FROM d0 UNION SELECT node FROM d1 UNION SELECT node FROM d2
    """


def build_suite() -> tuple[dict[str, Callable], dict[str, str]]:
    """(queries, oracle_sql) for __spark_entry__; names match 1:1 except
    deliberately oracle-less entries (none in this block)."""
    queries = {}
    oracles = {}
    for name, fn in list(globals().items()):
        if name.startswith("q_") and callable(fn) and not name.endswith("_sql"):
            key = name[2:]
            queries[key] = fn
            sql_fn = globals().get(f"{name}_sql")
            if sql_fn:
                oracles[key] = sql_fn()
    return queries, oracles
