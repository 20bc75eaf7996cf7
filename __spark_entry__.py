"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator surface (SURVEY.md §2 +
the training-data-pipeline operators) over the driver testdata tables;
``oracle_sql()`` gives a DuckDB oracle for EVERY query. Column
names/types are aligned pairwise (the driver hashes values under
sorted column names).

For the four queries whose semantics DuckDB cannot compute (blake2b
simhash LSH, NB language prediction, IVF ANN probe, tokenizer UDTF)
the oracle reads a
FROZEN expected table computed driver-side from the pure-Python specs
— independently of the Spark implementations — and cross-checked at
generation time (tools/gen_expected.py, data/expected_sf0.01/).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hyperpolyglot_spark.functions.langid import HASH_BUCKETS
from hyperpolyglot_spark.session import local_rows_df
from hyperpolyglot_spark.functions.textstats import (
    bpe_ish_token_count_col,
    distinct_token_ratio_col,
    fingerprint_col,
    quality_score_col,
    token_count_col,
)
from hyperpolyglot_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_neardup_pairs,
    ngram_jaccard_pairs,
    simhash_neardup_pairs,
)
from hyperpolyglot_spark.operators.similarity import (
    brute_force_topk,
    cosine_neardup_pairs,
    ivf_centroids,
    ivf_topk,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _spread_if_large(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Size-gated _spread for DEEP multi-stage DAGs (the LM pipeline,
    decontaminate): at sf0.1 (~0.6 MB of docs) spreading these
    measured SLOWER (stage-latency bound — see _spread), but at 10x
    the single-task explode dominates end-to-end (doc_perplexity
    24-30 s unspread vs 7-14 s spread, r07 A/B on a replicated
    single-row-group table). Gate: under-split for the cores AND at
    least SPARK_GRAFT_SPREAD_KB_PER_CORE (default 64 KB) of source
    bytes per core — below that a task holds under ~a few hundred
    docs and the added exchange outweighs the parallelism; above it,
    per-doc compute dominates. Per-core (not absolute), so the same
    rule holds at any executor count; at corpus scale the
    partitions-gate never fires at all."""
    cores = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= cores:
        return df
    min_bytes = cores * 1024 * int(
        __import__("os").environ.get("SPARK_GRAFT_SPREAD_KB_PER_CORE", "64")
    )
    size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    if size >= min_bytes:
        return df.repartition(cores)
    return df


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Right-size scan parallelism for COMPUTE-HEAVY per-row stages.

    The sf testdata tables are single parquet files with ONE row group
    (r07 audit), so every scan is one task no matter the split config —
    a per-doc-heavy stage (gram explode, minhash UDF, quality ladder)
    then runs on 1 of 32 cores. Same fix and same gate as the frozen
    bench.py pages path: shuffle the (small, under-split) input across
    the cores ONCE, only when the scan under-splits them. At corpus
    scale a real table has thousands of row groups, the gate never
    fires, and no corpus-sized shuffle is added — this is the
    guide §2.5 'unsplittable input' repartition, not a tuning constant.

    Applied ONLY where an A/B noop-sink measurement showed a win
    (OPTIMIZATION_r07.md): shallow plans whose per-row compute
    dominates (quality ladder, gram explode+agg, tokenizer scoring).
    Deep multi-stage DAGs (minhash chains, decontaminate, the LM
    pipeline) are stage-latency-bound at this scale — spreading them
    multiplied per-stage task overhead and measured SLOWER, so they
    keep their natural scan partitioning."""
    cores = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < cores:
        return df.repartition(cores)
    return df


# ======================================================================
# flagship
# ======================================================================

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: text-quality profile of the documents corpus at
    sf0.001 — token stats + quality score per doc, aggregated per
    language with percent-of-total (A1/A2 analogs)."""
    sf_dir = "/root/testdata/sf0.001"
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    profiled = docs.select(
        "lang",
        token_count_col(t).alias("n_tokens"),
        quality_score_col(t).alias("quality_score"),
    )
    agg = profiled.groupBy("lang").agg(
        F.count("*").alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.round(F.avg("quality_score"), 6).alias("avg_quality"),
    )
    # percent-of-total via a broadcast scalar agg, not a global window:
    # WindowExec with no partition moves everything to ONE partition
    # (and warns); a cross-joined one-row total is warning-free and
    # shape-safe at any scale
    total = agg.agg(F.sum("docs").alias("_total"))
    return (
        agg.crossJoin(F.broadcast(total))
        .withColumn("pct", F.round(F.col("docs") * 100.0 / F.col("_total"), 6))
        .drop("_total")
        .orderBy(F.desc("docs"), "lang")
    )


# ======================================================================
# TPC-H-ish relational operators (S/P/J/A/O/E families)
# ======================================================================

def q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


def q3_shipping_priority(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1995-03-15"
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1995-03-15"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def q5_region_revenue(spark, sf_dir):
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, (F.col("o_custkey") == F.col("c_custkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


def top_suppliers(spark, sf_dir):
    return (
        _t(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy(F.desc("s_acctbal"), "s_suppkey")
        .limit(5)
    )


def customers_without_orders(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return (
        cust.join(orders, "c_custkey", "left_anti")
        .select("c_custkey", "c_name")
    )


def orders_with_heavy_items(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    heavy = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") > 49
    ).select(F.col("l_orderkey").alias("o_orderkey"))
    return (
        orders.join(heavy, "o_orderkey", "left_semi")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def top2_orders_per_customer(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def revenue_pct_by_returnflag(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    per = li.groupBy("l_returnflag").agg(
        F.sum("l_extendedprice").alias("rev")
    )
    total = per.agg(F.sum("rev").alias("_total"))
    return per.crossJoin(F.broadcast(total)).select(
        "l_returnflag",
        F.round("rev", 4).alias("revenue"),
        F.round(F.col("rev") * 100.0 / F.col("_total"), 6).alias("pct"),
    )


def rollup_order_priority(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_price"),
        )
    )


def distinct_types_per_brand(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.countDistinct("p_type").alias("n_types"),
        F.countDistinct("p_size").alias("n_sizes"),
        F.round(F.avg("p_retailprice"), 6).alias("avg_price"),
    )


def segment_set_ops(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    rich = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    machinery = cust.filter(F.col("c_mktsegment") == "MACHINERY").select(
        "c_custkey"
    )
    return building.union(machinery).intersect(rich).subtract(
        cust.filter(F.col("c_nationkey") == 3).select("c_custkey")
    )


def min_cost_supplier_per_nation(spark, sf_dir):
    """Greatest-per-group (TPC-H q2 analog): cheapest-acctbal supplier
    per nation via window rank — the decorrelated form of a correlated
    subquery."""
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    best = sup.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") == 1
    )
    return best.join(
        F.broadcast(nation), best.s_nationkey == nation.n_nationkey
    ).select("n_name", "s_suppkey", "s_name", "s_acctbal")


def nation_customer_supplier_counts(spark, sf_dir):
    """FULL OUTER join: per nation, #customers and #suppliers, keeping
    nations that have only one side."""
    cust = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers"))
    )
    sup = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return cust.join(sup, "nationkey", "full_outer").select(
        "nationkey",
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


def sql_api_revenue_by_priority(spark, sf_dir):
    """Same engine through the SQL API surface (temp view + spark.sql):
    Catalyst produces the identical plan either way."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 4) AS total_price,
               round(avg(o_totalprice), 6) AS avg_price
        FROM v_orders
        GROUP BY o_orderpriority
        """
    )


# ======================================================================
# events: time windows, sessionization, pivot
# ======================================================================

def events_hourly(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


def events_sessionization(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


def events_type_pivot(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    aggs = [
        F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
        for t in ("click", "view", "purchase", "signup", "error")
    ]
    return ev.groupBy("user_id").agg(*aggs)


def events_value_stats(spark, sf_dir):
    """Exact percentiles + dispersion per event_type (statistics agg
    family)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.stddev("value"), 6).alias("sd"),
        F.round(F.min("value"), 4).alias("vmin"),
        F.round(F.max("value"), 4).alias("vmax"),
    )


def events_salted_counts(spark, sf_dir):
    """Two-phase salted aggregation (north-rule skew pattern): the 5
    event types are hot keys, so phase 1 aggregates (key, salt) to
    spread the combine across 16x more reducers, phase 2 merges the
    partials. Result is identical to a direct groupBy — which is the
    oracle."""
    ev = _t(spark, sf_dir, "events")
    salted = ev.withColumn("_salt", F.pmod(F.col("event_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "_salt").agg(
        F.count("*").alias("pn"), F.sum("value").alias("pv")
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.round(F.sum("pv"), 4).alias("total_value"),
    )


def events_json_props(spark, sf_dir):
    """JSON scalar-function surface: parse the props JSON column
    (get_json_object / from_json), bucket by the extracted key, and
    aggregate — the date/math/JSON built-ins row of SURVEY §2.7."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .withColumn("k_bucket", (F.col("k") / 10).cast("int"))
        .groupBy("event_type", "k_bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("k"), 6).alias("avg_k"),
        )
    )


def source_langs_csv(spark, sf_dir):
    """Sorted collect_set rendered as a stable string (the per-strategy
    sorted-tally analog, src/bin/main.rs:163-175)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.array_join(F.sort_array(F.collect_set("lang")), ",").alias(
            "langs_csv"
        ),
        F.count("*").alias("docs"),
    )


def purchases_asof_click(spark, sf_dir):
    """As-of join: each purchase matched to the user's most recent
    prior (or simultaneous) click. Spark has no built-in as-of join —
    operators/temporal.py composes it from union + window; the oracle
    is DuckDB's native ASOF JOIN."""
    from hyperpolyglot_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    # unique per (user_id, ts): keep the max event_id (as-of matching
    # is otherwise ambiguous — same rule in the oracle)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(F.max("event_id").alias("click_event_id"))
    )
    return asof_join(
        purchases,
        clicks,
        by="user_id",
        left_ts="ts",
        right_ts="click_ts",
        payload_cols=["click_ts", "click_event_id"],
        suffix="",
    ).select("event_id", "user_id", "ts", "click_ts", "click_event_id")


def clicks_in_purchase_windows(spark, sf_dir):
    """RANGE join (no equi key): count clicks — from ANY user — inside
    each purchase's 30-minute window. operators/temporal.range_join
    buckets time so the plan is a hash equi-join on bucket + exact
    range filter, never a nested-loop; the oracle is DuckDB's native
    inequality join."""
    from hyperpolyglot_spark.operators.temporal import range_join

    ev = _t(spark, sf_dir, "events")
    intervals = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("interval_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "ts", "value"
    )
    j = range_join(clicks, intervals, "ts", "start_ts", "end_ts", 1800)
    return j.groupBy("interval_id").agg(
        F.count("*").alias("n_clicks"),
        F.round(F.sum("value"), 4).alias("click_value"),
    )


def orders_cube(spark, sf_dir):
    """CUBE over (priority, status): all grouping-set combinations."""
    orders = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
    )


def events_top_users(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.round(F.sum("value"), 4).alias("total_value"))
        .orderBy(F.desc("total_value"), "user_id")
        .limit(10)
    )


# ======================================================================
# documents: hyperpolyglot-analog text operators
# ======================================================================

def lang_breakdown(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    agg = docs.groupBy("lang").agg(
        F.count("*").alias("docs"), F.sum("n_chars").alias("chars")
    )
    total = agg.agg(F.sum("docs").alias("_total"))
    return (
        agg.crossJoin(F.broadcast(total))
        .withColumn(
            "pct", F.round(F.col("docs") * 100.0 / F.col("_total"), 6)
        )
        .drop("_total")
    )


def source_lang_matrix(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("source", "lang").agg(
        F.count("*").alias("docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
    )


def doc_token_stats(spark, sf_dir):
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    t = F.col("text")
    return docs.select(
        "doc_id",
        token_count_col(t).alias("n_tokens"),
        bpe_ish_token_count_col(t).alias("n_subtokens"),
        F.round(distinct_token_ratio_col(t), 6).alias("ttr"),
        fingerprint_col(t).alias("fingerprint"),
    )


def doc_quality_scores(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", quality_score_col(F.col("text")).alias("quality_score")
    )


def regex_marker_counts(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(r"\bthe\b")).cast("long").alias("n_the"),
        F.regexp_count(t, F.lit(r"\bvalue\b")).cast("long").alias("n_value"),
        F.regexp_count(t, F.lit(r"[0-9]+")).cast("long").alias("n_numbers"),
    )


def family_breakdown(spark, sf_dir):
    """Broadcast join to the language-info dim + type filter (P5 analog:
    reference keeps only Markup/Programming for reports,
    src/bin/main.rs:46-52). Dim is a literal table; oracle inlines the
    same VALUES."""
    from hyperpolyglot_spark.functions.langdata import LANG_INFO

    docs = _t(spark, sf_dir, "documents")
    dim = local_rows_df(
        spark,
        [(l, i["family"], i["script"]) for l, i in sorted(LANG_INFO.items())],
        "lang string, family string, script string",
    )
    return (
        docs.join(F.broadcast(dim), "lang", "left")
        .filter(F.col("script") == "latin")
        .groupBy("family")
        .agg(
            F.count("*").alias("docs"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


def docs_matching_regex(spark, sf_dir):
    """rlike section filter (P6 analog, src/bin/main.rs:22-28): keep
    docs whose text matches a user regex."""
    docs = _t(spark, sf_dir, "documents")
    return docs.filter(
        F.col("text").rlike(r"(^| )table (scan|merge)( |$)")
    ).select("doc_id", "lang")


def lang_chars_zscore(spark, sf_dir):
    """Grouped-map pandas UDF (applyInPandas): per-language z-score of
    doc length — the custom-stateful-per-group surface. Oracle is the
    equivalent window SQL. (Scale note: grouping by a low-cardinality
    key funnels each language through one task — at corpus scale
    compute mu/sd with a two-pass agg + broadcast instead; this entry
    exists to exercise the grouped-map surface.)"""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["n_chars"].mean()
        sd = pdf["n_chars"].std(ddof=1)
        pdf["z"] = ((pdf["n_chars"] - mu) / sd).round(6)
        return pdf[["doc_id", "lang", "z"]]

    return docs.groupBy("lang").applyInPandas(
        zscore, "doc_id long, lang string, z double"
    )


def lang_median_chars(spark, sf_dir):
    """Grouped-aggregate pandas UDF: exact median per language."""

    @F.pandas_udf("double")
    def median_udf(v: pd.Series) -> float:  # noqa: F821 - resolved by pyspark
        return float(v.median())

    # grouped-agg pandas UDFs cannot mix with JVM aggs in one agg list
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.round(median_udf("n_chars"), 6).alias("median_chars")
    )


def exact_dedup_documents(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return exact_dedup_groups(docs, "doc_id", "text")


def neardup_jaccard_pairs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, block_col="lang", n=3, threshold=0.5
    )


def neardup_minhash_pairs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return minhash_neardup_pairs(docs, threshold=0.5)


def neardup_incremental(spark, sf_dir):
    """Incremental dedup: the 'new crawl drop' (doc_id >= 250) deduped
    against the 'existing corpus' (doc_id < 250) — cross-side LSH join,
    never re-pairing the old corpus with itself. Oracle = exact
    all-pairs jaccard across the split."""
    from hyperpolyglot_spark.operators.dedup import minhash_neardup_join

    docs = _t(spark, sf_dir, "documents")
    return minhash_neardup_join(
        docs.filter(F.col("doc_id") >= 250),
        docs.filter(F.col("doc_id") < 250),
        threshold=0.5,
    )


def doc_token_nb(spark, sf_dir):
    """The reference's ACTUAL classifier feature path (F2 tokenizer ->
    F3 key tokens <=32B -> F4 token NB, classifier.rs:24-48), wired as
    a selectable alternative to the char-gram production scorer:
    train_token_spark on the corpus itself, then the same broadcast-
    model classify UDF scoring over all languages. Oracle = frozen
    numpy/py-spec table (tools/gen_expected.py) — the tokenizer state
    machine is not SQL-expressible."""
    from hyperpolyglot_spark.functions.langid import (
        make_classify_udf,
        train_token_spark,
    )

    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    model = train_token_spark(docs)
    clf = make_classify_udf(spark, model)
    return docs.select(
        "doc_id",
        "lang",
        clf(F.col("text"), F.array().cast("array<string>")).alias("lang_pred"),
    )


def neardup_incremental_indexed(spark, sf_dir):
    """The PERSISTED-INDEX form of incremental dedup (the continuous-
    crawl scale path, VERDICT r2 #2): the 'existing corpus' is signed
    ONCE into an on-disk banded signature index; the 'new drop' signs
    only itself and bucket-joins against the index — the old corpus is
    never re-shingled (verification reads candidate texts only).
    Output is identical to neardup_incremental, and the oracle is the
    same exact all-pairs jaccard."""
    import hashlib
    import os
    import tempfile

    from hyperpolyglot_spark.operators.dedup import (
        minhash_neardup_join_indexed,
        save_dedup_index,
    )

    docs = _t(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") < 250)
    new = docs.filter(F.col("doc_id") >= 250)
    # deterministic per-sf path, overwritten on every call: the
    # returned DataFrame reads the index lazily, so it cannot be
    # cleaned up here — a keyed path bounds the footprint to one
    # index per sf instead of one per invocation
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    idx = os.path.join(
        tempfile.gettempdir(), f"hp_dedup_idx_{key}", "index"
    )
    save_dedup_index(spark, old, idx)
    return minhash_neardup_join_indexed(spark, new, idx, old, threshold=0.5)


def neardup_simhash_pairs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return simhash_neardup_pairs(docs, max_hamming=3)


def classifier_training_agg(spark, sf_dir):
    """A4 analog: per-(lang, gram) counts + log-probabilities for the
    200 most frequent char-3-grams per language."""
    from hyperpolyglot_spark.functions.langid import exploded_grams

    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    counted = (
        exploded_grams(docs)  # int-seq explode + codegen substr (3.8x)
        .groupBy("lang", "gram")
        .agg(F.count("*").alias("cnt"))
    )
    # two consumers (per-lang totals + rank) -> materialize the
    # aggregated table once; it is distinct (lang, gram) rows,
    # corpus-independent in size. localCheckpoint, NOT persist: a
    # persisted plan is cache-keyed by its analyzed plan and silently
    # substitutes into OTHER queries sharing the same subtree
    # (hashed_gram_buckets' raw-gram count scan — caught by
    # test_plan_quality). Totals are one row per language -> broadcast
    # join instead of an unbounded sum-window, which would materialize
    # and sort every lang partition a second time (round-3 regression
    # suspect; parallelism bounded by #langs).
    counted = counted.localCheckpoint(eager=True)
    totals = counted.groupBy("lang").agg(F.sum("cnt").alias("_total"))
    wr = Window.partitionBy("lang").orderBy(F.desc("cnt"), "gram")
    return (
        counted.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 200)
        .join(F.broadcast(totals), "lang")
        .withColumn("logp", F.round(F.log(F.col("cnt") / F.col("_total")), 6))
        .select("lang", "gram", "cnt", "logp", "rk")
    )


def doc_script_mix(spark, sf_dir):
    """Per-document script-mix ratios (latin/cjk/cyrillic/...): the
    standard multilingual-corpus signal for mixed-script boilerplate or
    mislabeled docs. One scan, pure regexp_replace length arithmetic —
    the same literal ranges compile under Java regex and DuckDB RE2."""
    from hyperpolyglot_spark.functions.textstats import (
        SCRIPT_CLASSES,
        script_ratio_col,
    )

    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        "lang",
        *[
            F.round(script_ratio_col(t, s), 6).alias(f"{s}_ratio")
            for s in sorted(SCRIPT_CLASSES)
        ],
    )


def docs_keep_drop(spark, sf_dir):
    """The quality-filter rule ladder as an oracle query: signals
    (length, symbol ratio, 3-gram repetition, stopword density) +
    first-match-wins keep/drop over the documents table — the same
    column expressions the pipeline parity-tests, DuckDB-checked
    end-to-end. (No url column here, so the vendor rule can't fire;
    perplexity is oracled separately by doc_perplexity.)"""
    from hyperpolyglot_spark.functions.quality import (
        with_keep_drop,
        with_quality_signals,
    )

    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    df = with_keep_drop(with_quality_signals(docs, "text"))
    return df.select(
        "doc_id",
        "n_chars",
        "n_words",
        F.round("symbol_ratio", 6).alias("symbol_ratio"),
        F.round("rep3_ratio", 6).alias("rep3_ratio"),
        F.round("stop_density", 6).alias("stop_density"),
        F.round("spaceless_ratio", 6).alias("spaceless_ratio"),
        "keep",
        "drop_rule",
    )


def docs_scrubbed(spark, sf_dir):
    """PII/toxicity scrub as an oracle query: ordered sequential
    rewrites with per-pattern counts over documents. The DuckDB oracle
    is GENERATED from the same SCRUB_PATTERNS table as nested
    regexp_replace/regexp_extract_all (the patterns are deliberately
    RE2/Java/Python-compatible)."""
    from hyperpolyglot_spark.functions.scrub import SCRUB_NAMES, with_scrub

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return with_scrub(docs, "text").select(
        "doc_id", "scrubbed_text", *[f"scrub_{n}" for n in SCRUB_NAMES]
    )


def doc_tokens(spark, sf_dir):
    """Python UDTF surface (SURVEY §2.8): LATERAL-join the polyglot
    tokenizer over documents — one row per (doc, pos, kind, token).
    Capped to doc_id < 50 (the frozen-expected oracle's slice)."""
    from hyperpolyglot_spark.functions.tokenize_udtf import register

    register(spark)
    _t(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 50
    ).createOrReplaceTempView("v_docs_tok")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.kind, t.token
        FROM v_docs_tok d, LATERAL tokenize_udtf(d.text) t
        """
    )


def per_strategy_report(spark, sf_dir):
    """Per-strategy CLI report analog (src/bin/main.rs:159-199): a
    regex section filter picks the docs, each doc is attributed to the
    detection strategy that decides it (marker-rule hit vs classifier
    fallback — the SQL-expressible slice of the cascade), and each
    (strategy, language) section reports its count plus a stable sorted
    sample of ids (the file-list analog). Both the Spark ladder and the
    DuckDB CASE are generated from the same MARKER_RULES dim."""
    from hyperpolyglot_spark.functions.langdata import MARKER_RULES

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("text").rlike(r"(^| )(market|value)( |$)")
    )
    marker = F.lit(False)
    for lang, pat in MARKER_RULES.items():
        marker = F.when(
            F.col("lang") == lang, F.col("text").rlike(pat)
        ).otherwise(marker)
    strategy = F.when(marker, F.lit("heuristics")).otherwise(
        F.lit("classifier")
    )
    return (
        docs.withColumn("strategy", strategy)
        .groupBy("strategy", "lang")
        .agg(
            F.count("*").alias("docs"),
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(F.sort_array(F.collect_list("doc_id")), 1, 5),
                    lambda x: x.cast("string"),
                ),
            ).alias("sample_ids"),
        )
    )


def _hashed_gram_counts(spark, sf_dir):
    """Pre-checkpoint subtree of hashed_gram_buckets, exposed so
    test_plan_quality can assert the two-phase aggregation shape (the
    checkpoint boundary hides it from the final query's plan).

    Two-phase: count per RAW gram first (partial agg absorbs the
    volume), md5 only the distinct (lang, gram) groups — ~30x fewer
    hashes at sf0.1, and at corpus scale distinct grams plateau while
    doc count grows, so hashing cost per doc goes to zero."""
    from hyperpolyglot_spark.functions.langid import bucket_col, exploded_grams

    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    return (
        exploded_grams(docs)
        .groupBy("lang", "gram")
        .agg(F.count("*").alias("c1"))
        .select("lang", bucket_col(F.col("gram")).alias("bucket"), "c1")
        .groupBy("lang", "bucket")
        .agg(F.sum("c1").alias("cnt"))
    )


def hashed_gram_buckets(spark, sf_dir):
    """Hashed character-n-gram features (north-star): gram -> md5-prefix
    bucket (JVM built-ins only), per-(lang, bucket) counts + log-probs —
    the fixed-width fastText-style feature table whose size is bounded
    by bucket count, not vocabulary. The production classifier scores
    against exactly this table (functions/langid.py HashedModel)."""
    counted = _hashed_gram_counts(spark, sf_dir)
    # two consumers (per-lang totals + final projection): materialize
    # the bounded (langs x 16384) table once, then broadcast-join the
    # one-row-per-lang totals — the same shape fix as
    # classifier_training_agg (an unbounded sum-window re-materializes
    # and sorts every lang partition with parallelism bounded by
    # #langs; localCheckpoint, NOT persist — a persisted plan cache-
    # substitutes into other queries sharing the subtree).
    counted = counted.localCheckpoint(eager=True)
    totals = counted.groupBy("lang").agg(F.sum("cnt").alias("_total"))
    return counted.join(F.broadcast(totals), "lang").select(
        "lang",
        F.col("bucket").cast("long").alias("bucket"),
        "cnt",
        F.round(F.log(F.col("cnt") / F.col("_total")), 6).alias("logp"),
    )


def doc_perplexity(spark, sf_dir):
    """KenLM-style perplexity, fully in-query (north-star stage): train
    a per-language char-3-gram LM with add-alpha smoothing ON the
    corpus itself (one explode + hash agg), then score every doc under
    its language's LM via broadcast joins — no cartesian, no UDF, and
    therefore DuckDB-oracle-able end to end. The production pipeline
    scores with the same spec under a broadcast pre-trained model
    (functions/perplexity.py)."""
    from hyperpolyglot_spark.functions.langid import exploded_grams
    from hyperpolyglot_spark.functions.perplexity import PPL_ALPHA

    docs = _spread_if_large(spark, _t(spark, sf_dir, "documents"))
    tri = exploded_grams(docs, keep=("doc_id", "lang"), out="g")
    # the event stream feeds BOTH the model aggregation and the scoring
    # join; localCheckpoint materializes it once instead of re-running
    # the explode per branch (measured 2.5x at sf0.1)
    tri = tri.localCheckpoint(eager=False)
    model = tri.groupBy("lang", "g").agg(F.count("*").alias("c3"))
    ctx = model.groupBy(
        "lang", F.substring("g", 1, 2).alias("cx")
    ).agg(F.sum("c3").alias("c2"))
    vocab = model.groupBy("lang").agg(
        F.countDistinct(F.substring("g", 3, 1)).alias("v")
    )
    # r07: fold ctx/vocab into the MODEL side and precompute lp once
    # per distinct (lang, gram) — the event stream then pays ONE
    # broadcast join and zero per-event log10s instead of three joins
    # + a log10 per occurrence (guide §2.3: shuffle/score metadata,
    # not the volume). Same arithmetic on the same doubles, so the
    # scored values are bit-identical to the per-event form.
    lp_tab = (
        model.withColumn("cx", F.substring("g", 1, 2))
        .join(F.broadcast(ctx), ["lang", "cx"])
        .join(F.broadcast(vocab), ["lang"])
        .select(
            "lang",
            "g",
            F.log10(
                (F.col("c3") + F.lit(PPL_ALPHA))
                / (F.col("c2") + F.lit(PPL_ALPHA) * F.col("v"))
            ).alias("lp"),
        )
    )
    scored = tri.join(F.broadcast(lp_tab), ["lang", "g"])
    return scored.groupBy("doc_id").agg(
        F.round(F.pow(F.lit(10.0), -F.avg("lp")), 6).alias("ppl")
    )


def langid_predict_documents(spark, sf_dir):
    """Naive-Bayes language prediction over documents, model trained on
    the same corpus (train==eval, like the reference; oracle = frozen
    expected from the pure-python spec). Note the collected dict model
    here is corpus-vocabulary-sized — convenient at test scale; the
    production path trains offline on a bounded corpus and broadcasts
    the FIXED-WIDTH hashed model (functions/langid.py HashedModel)."""
    from hyperpolyglot_spark.functions.langid import make_classify_udf, train_spark

    docs = _t(spark, sf_dir, "documents")
    model = train_spark(docs, "lang", "text")
    clf = make_classify_udf(spark, model)
    return docs.select(
        "doc_id",
        "lang",
        clf(F.col("text"), F.array().cast("array<string>")).alias("lang_pred"),
    )


def langid_unresolved(spark, sf_dir):
    """Open-world language ID (the reference's `detect -> None` analog,
    src/lib.rs:187-189): documents (in-universe) unioned with the
    out-of-universe fixture (datagen/unknown.py — unknown scripts +
    alien-trigram Latin), classified with the unresolved gate on. A
    noise-like or script-incoherent decision yields NULL lang_pred and
    strategy 'unresolved' instead of a forced argmax over the 102
    languages. Oracle = frozen expected from the pure-python spec
    (langid.classify_or_none_py), cross-checked at freeze time.

    Three strata by construction: natural prose drawn from the
    language pools (doc_id 20000+) must all resolve; the documents
    table's body text (doc_id < 100) is domain jargon — word salad the
    gate treats as noise for about half the rows, the intended CCNet-
    style outcome for text that is no language's prose; the
    out-of-universe fixture (doc_id 10000+) must be fully NULL."""
    from hyperpolyglot_spark.datagen.unknown import fixture_rows
    from hyperpolyglot_spark.functions.langid import (
        make_classify_udf,
        training_corpus,
    )

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "text")
    )
    pool = [
        (20_000 + i, t) for i, (_, t) in enumerate(training_corpus()[:30])
    ]
    fx = local_rows_df(
        spark,
        [(i, t) for i, _, t in fixture_rows()] + pool,
        "doc_id long, text string",
    )
    clf = make_classify_udf(spark, None, unresolved=True)
    both = docs.unionByName(fx).withColumn(
        "lang_pred", clf(F.col("text"), F.array().cast("array<string>"))
    )
    return both.select(
        "doc_id",
        "lang_pred",
        F.when(F.col("lang_pred").isNull(), F.lit("unresolved"))
        .otherwise(F.lit("classifier"))
        .alias("strategy"),
    )


def audio_media_features(spark, sf_dir):
    """Audio-column operator as a driver row: WAV payloads synthesized
    deterministically from doc_id (datagen/audio — integer-math
    samples wrapped in RIFF/PCM16), decoded DISTRIBUTED by the real
    chunked WAV parser inside audio_features (mapInPandas), features
    rounded for the hash gate. The frozen oracle recomputes the
    features from the raw integer samples WITHOUT the WAV container —
    so the row checks the RIFF encode/decode round-trip AND the
    feature math, not one implementation against itself."""
    import pandas as pd

    from hyperpolyglot_spark.datagen.audio import synth_wav
    from hyperpolyglot_spark.operators.multimodal import audio_features

    @F.pandas_udf("binary")
    def wav_udf(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synth_wav(int(i)))

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id")
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"), wav_udf("doc_id").alias("payload")
    )
    out = audio_features(media)
    return out.select(
        F.col("media_id").alias("doc_id"),
        "sample_rate",
        "n_samples",
        "duration_ms",
        F.round("rms", 6).alias("rms"),
        F.round("zero_cross_rate", 6).alias("zero_cross_rate"),
        F.round("peak", 6).alias("peak"),
    )


def langid_short_texts(spark, sf_dir):
    """Short-form (title/query-length) language ID: the 306-fragment
    stratum (datagen/realtext.short_texts — 5-15 words, all 102
    languages) classified with the production hashed-NB + unresolved
    gate. This is the length envelope a real crawl's short-doc mass
    lives in; round-5 script narrowing lifted it 0.869 -> 0.889
    (hashed). Oracle = frozen expected from the pure-python spec
    (classify_or_none_py), cross-checked at freeze time. The sf_dir
    tables are not used: the stratum IS the fixture, like the
    out-of-universe half of langid_unresolved."""
    from hyperpolyglot_spark.datagen.realtext import short_texts
    from hyperpolyglot_spark.functions.langid import make_classify_udf

    rows = [
        (30_000 + 3 * i + j, lang, frag)
        for i, (lang, frags) in enumerate(sorted(short_texts().items()))
        for j, frag in enumerate(frags)
    ]
    df = local_rows_df(spark, rows, "doc_id long, lang string, text string")
    clf = make_classify_udf(spark, None, unresolved=True)
    df = df.withColumn(
        "lang_pred", clf(F.col("text"), F.array().cast("array<string>"))
    )
    return df.select(
        "doc_id",
        "lang",
        "lang_pred",
        (F.col("lang_pred") == F.col("lang")).alias("correct"),
    )


def unresolved_disposition(spark, sf_dir):
    """Explicit unresolved-language keep policy (VERDICT r4 #1): docs
    the classifier declines (NULL lang_pred) bypass the perplexity rule
    — logprob10_py returns (0,0) for an absent lang — so their
    disposition must be policy, not fall-through. This query pins the
    policy function end-to-end: classify with the unresolved gate,
    run the keep/drop ladder, score perplexity (NULL-lang docs come
    back unscored — `ppl_scored` records the bypass), apply the
    per-language threshold rule, then emit the routing under the
    default 'quarantine' policy (plans/pipeline.disposition_col) plus
    what the 'drop' policy would do. Oracle = frozen expected from the
    pure-python spec (py_disposition + py_keep_drop +
    classify_or_none_py), cross-checked at freeze time."""
    from hyperpolyglot_spark.datagen.unknown import fixture_rows
    from hyperpolyglot_spark.functions.langid import (
        make_classify_udf,
        training_corpus,
    )
    from hyperpolyglot_spark.functions.perplexity import (
        default_ppl_model,
        ppl_thresholds_for,
        with_perplexity,
    )
    from hyperpolyglot_spark.functions.quality import (
        MAX_PPL,
        with_keep_drop,
        with_quality_signals,
    )
    from hyperpolyglot_spark.plans.pipeline import disposition_col

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "text")
    )
    pool = [
        (20_000 + i, t) for i, (_, t) in enumerate(training_corpus()[:30])
    ]
    fx = local_rows_df(
        spark,
        [(i, t) for i, _, t in fixture_rows()] + pool,
        "doc_id long, text string",
    )
    clf = make_classify_udf(spark, None, unresolved=True)
    # right-size parallelism to the input: this is a ~450-row fixture
    # union, but the parquet scan contributes 32 near-empty partitions
    # — and the plan chains TWO dependent ArrowEvalPython stages
    # (classify -> perplexity), so every task holds 2 python workers.
    # 33 tasks x 2 workers meant ~60 worker spawns for 450 rows (the
    # 11s bench entry, VERDICT r5 #3); 4 partitions keeps it to the
    # warm pool. At corpus scale the operator is run_pipeline, which
    # keeps the scan's natural partitioning.
    df = docs.unionByName(fx).repartition(4).withColumn(
        "lang_pred", clf(F.col("text"), F.array().cast("array<string>"))
    )
    df = with_keep_drop(with_quality_signals(df, "text"))
    # LM scores only rows every cheap rule passed (X5 economics, same
    # as py_label_page): dropped rows ship NULL text to the scorer
    df = df.withColumn("_ppl_text", F.when(F.col("keep"), F.col("text")))
    df = with_perplexity(df, spark, text_col="_ppl_text")
    # per-language thresholds as a broadcast dim join (102 rows), not a
    # literal map probe (GetMapValue is a linear scan per row)
    thr = local_rows_df(
        spark,
        [
            (lang, float(v))
            for lang, v in sorted(ppl_thresholds_for(default_ppl_model()).items())
        ],
        "lang_pred string, _thr double",
    )
    df = df.join(F.broadcast(thr), "lang_pred", "left")
    ppl_fires = (
        F.col("keep")
        & F.col("perplexity").isNotNull()
        & (F.col("perplexity") > F.coalesce(F.col("_thr"), F.lit(MAX_PPL)))
    )
    df = df.withColumn(
        "keep2", F.when(ppl_fires, F.lit(False)).otherwise(F.col("keep"))
    ).withColumn(
        "rule2",
        F.when(ppl_fires, F.lit("perplexity")).otherwise(F.col("drop_rule")),
    )
    return df.select(
        "doc_id",
        "lang_pred",
        F.col("keep2").alias("keep"),
        F.col("rule2").alias("drop_rule"),
        F.col("perplexity").isNotNull().alias("ppl_scored"),
        disposition_col(
            "quarantine", keep_col="keep2", lang_col="lang_pred"
        ).alias("disposition"),
        F.when(
            ~F.col("keep2") | F.col("lang_pred").isNull(), F.lit("dropped")
        )
        .otherwise(F.lit("kept"))
        .alias("disposition_if_drop"),
    )


# messy-URL variants for canonical_url_dedup: five renderings across
# TWO logical pages — variants 0/1/2 are the bare page (host-casing,
# default port, tracking-only params, fragment, trailing/duplicate
# slashes) and variants 3/4 are the ?page=2 form rendered with a
# tracking param BEFORE vs AFTER the real param (the delimiter-repair
# bug class: '?utm_…&page=2' must canonicalize to '?page=2', never
# '&page=2'). Shared between the Spark builder and the DuckDB oracle
# so the two sides construct identical input. (prefix, midfix,
# suffix); url = prefix || h || midfix || g || suffix with
# h = (doc_id/5)%7, g = doc_id/5 (integer division).
_URL_VARIANTS = (
    ("HTTPS://WWW.EXAMPLE", ".COM:443/articles//", "/?utm_source=feed&ref=rss#top"),
    ("https://www.example", ".com:443/articles/", "/"),
    ("https://www.example", ".com/articles/", "#section-2"),
    ("https://www.example", ".com/articles/", "?utm_medium=email&page=2"),
    ("https://www.example", ".com/articles/", "?page=2&fbclid=abc123"),
)


def canonical_url_dedup(spark, sf_dir):
    """URL canonicalization + canonical-URL dedup — the crawl-dedup
    stage upstream of content dedup (a CC-style pipeline collapses
    recrawls of the same page by canonical URL before hashing any
    content). Five messy renderings of each logical page are
    synthesized deterministically from doc_id (the driver tables carry
    no URL column), canonicalized with pure JVM regexp built-ins
    (functions/urltools.py — no UDF, codegen'd, scan-projection cheap
    at 10^12 urls), and grouped. The DuckDB oracle canonicalizes with
    the SAME generated expression (one shared step table, dialect
    differences handled by the generator)."""
    from hyperpolyglot_spark.functions.urltools import canonical_url_col

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    h = (F.col("doc_id") / 5).cast("long") % 7
    g = (F.col("doc_id") / 5).cast("long")
    url = F.lit(None).cast("string")
    for i, (p, m, s) in enumerate(_URL_VARIANTS):
        url = F.when(
            F.col("doc_id") % 5 == i,
            F.concat(F.lit(p), h.cast("string"), F.lit(m),
                     g.cast("string"), F.lit(s)),
        ).otherwise(url)
    messy = docs.withColumn("url", url)
    return (
        messy.withColumn("canon_url", canonical_url_col("url"))
        .groupBy("canon_url")
        .agg(
            F.count("*").alias("dups"),
            F.min("doc_id").alias("rep_doc_id"),
        )
    )


def _canon_dedup_sql() -> str:
    from hyperpolyglot_spark.functions.urltools import canonical_url_sql

    whens = " ".join(
        "WHEN {i} THEN '{p}' || CAST((doc_id // 5) % 7 AS VARCHAR) || "
        "'{m}' || CAST(doc_id // 5 AS VARCHAR) || '{s}'".format(
            i=i, p=p, m=m, s=s
        )
        for i, (p, m, s) in enumerate(_URL_VARIANTS)
    )
    canon = canonical_url_sql("url")
    return f"""
        SELECT {canon} AS canon_url, count(*) AS dups,
               min(doc_id) AS rep_doc_id
        FROM (
          SELECT doc_id, CASE CAST(doc_id % 5 AS INT) {whens} END AS url
          FROM documents)
        GROUP BY canon_url
    """


def decontaminate_documents(spark, sf_dir):
    """Benchmark decontamination (the GPT-3/PaLM-style n-gram-overlap
    hygiene stage): an eval set is simulated by lifting a 20-word
    window (words 11-30) out of every 50th document, then every
    document sharing a verbatim 8-word n-gram with that set is flagged
    with its distinct-overlap count. Corpus side: codegen'd int-seq
    explode + slice/array_join; benchmark grams broadcast — no
    corpus-sized shuffle (operators/decontaminate.py)."""
    from hyperpolyglot_spark.operators.decontaminate import decontaminate

    docs = _spread_if_large(
        spark, _t(spark, sf_dir, "documents").select("doc_id", "text")
    )
    bench = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.array_join(
            F.expr(r"slice(split(trim(text), '\\s+'), 11, 20)"), " "
        ).alias("text")
    )
    return decontaminate(docs, bench, n=8)


def decontaminate_spans(spark, sf_dir):
    """Span-level decontamination (GPT-3 appendix-C semantics): the
    contaminated region — first occurrence of each matched benchmark
    8-gram ± pad chars, overlapping regions merged — is reported as
    (span_start, span_len) in whitespace-normalized coordinates, so a
    rewrite can REMOVE the leak instead of dropping the document.
    Same simulated eval set as decontaminate_documents. Spark side is
    pure JVM (locate + gaps-and-islands windows over output-sized
    partitions); the DuckDB oracle runs the identical algorithm.
    pad=30 here so sf0.01's ~100-word docs keep text either side;
    the operator default is the GPT-3 window (PAD_CHARS=200)."""
    from hyperpolyglot_spark.operators.decontaminate import (
        contamination_spans,
    )

    docs = _spread_if_large(
        spark, _t(spark, sf_dir, "documents").select("doc_id", "text")
    )
    bench = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.array_join(
            F.expr(r"slice(split(trim(text), '\\s+'), 11, 20)"), " "
        ).alias("text")
    )
    out = contamination_spans(docs, bench, n=8, pad=30)
    return out.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_len").cast("long").alias("span_len"),
    )


def decontaminate_rewrite_docs(spark, sf_dir):
    """The scrub-style companion of decontaminate_spans: contaminated
    docs rewritten with the merged regions REMOVED (surviving pieces
    joined by one space) instead of dropping the whole document —
    GPT-3 appendix-C. Spark side: spans pipeline + piece stitching
    over output-sized per-doc arrays; DuckDB oracle: the identical
    islands merge + LAG piece extraction + ordered string_agg."""
    from hyperpolyglot_spark.operators.decontaminate import (
        decontaminate_rewrite,
    )

    docs = _spread_if_large(
        spark, _t(spark, sf_dir, "documents").select("doc_id", "text")
    )
    bench = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.array_join(
            F.expr(r"slice(split(trim(text), '\\s+'), 11, 20)"), " "
        ).alias("text")
    )
    return decontaminate_rewrite(docs, bench, n=8, pad=30)


_DECON_GRAMS = (
    "(CASE WHEN len({w}) >= 8 THEN list_distinct("
    "[array_to_string(({w})[i:i+7], ' ') for i in range(1, len({w}) - 6)]) "
    "ELSE []::VARCHAR[] END)"
)


def _decontaminate_spans_sql(pad: int = 30) -> str:
    """Identical algorithm in DuckDB: normalize, gram, locate the
    first occurrence, pad, merge via gaps-and-islands windows."""
    words = "string_split(t, ' ')"
    return f"""
        WITH nt AS (
          SELECT doc_id,
                 trim(regexp_replace(text, '[ \\t\\n\\r]+', ' ', 'g')) AS t
          FROM documents),
        w AS (SELECT doc_id, {words} AS w, t FROM nt),
        bg AS (
          SELECT DISTINCT g FROM (
            SELECT unnest({_DECON_GRAMS.format(w='(w[11:30])')}) AS g
            FROM w WHERE doc_id % 50 = 0)),
        hits AS (
          SELECT DISTINCT doc_id, g FROM (
            SELECT doc_id, unnest({_DECON_GRAMS.format(w='w')}) AS g
            FROM w) dg JOIN bg USING (g)),
        raw AS (
          SELECT h.doc_id,
                 greatest(1, strpos(nt.t, h.g) - {pad}) AS s,
                 least(length(nt.t) + 1,
                       strpos(nt.t, h.g) + length(h.g) + {pad}) AS e
          FROM hits h JOIN nt ON h.doc_id = nt.doc_id),
        ord AS (
          SELECT doc_id, s, e,
                 CASE WHEN s <= max(e) OVER (
                        PARTITION BY doc_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      THEN 0 ELSE 1 END AS ni
          FROM raw),
        isl AS (
          SELECT doc_id, s, e,
                 sum(ni) OVER (PARTITION BY doc_id ORDER BY s, e
                               ROWS UNBOUNDED PRECEDING) AS island
          FROM ord)
        SELECT doc_id, min(s)::BIGINT AS span_start,
               (max(e) - min(s))::BIGINT AS span_len
        FROM isl GROUP BY doc_id, island
    """


def _decontaminate_rewrite_sql(pad: int = 30) -> str:
    """Cleaned text via the same islands merge + LAG piece extraction:
    piece_i = substr(t, prev_end, start_i - prev_end), plus the tail
    after the last span; non-empty pieces joined by one space."""
    spans = _decontaminate_spans_sql(pad)
    return f"""
        WITH spans AS ({spans}),
        nt AS (
          SELECT doc_id,
                 trim(regexp_replace(text, '[ \\t\\n\\r]+', ' ', 'g')) AS t
          FROM documents),
        merged AS (
          SELECT doc_id, span_start AS s, span_start + span_len AS e
          FROM spans),
        withprev AS (
          SELECT doc_id, s, e,
                 lag(e, 1, 1) OVER (PARTITION BY doc_id ORDER BY s) AS pe
          FROM merged),
        pieces AS (
          SELECT w.doc_id, w.s AS ord,
                 substr(nt.t, w.pe::INT, (w.s - w.pe)::INT) AS piece
          FROM withprev w JOIN nt ON w.doc_id = nt.doc_id
          UNION ALL
          SELECT m.doc_id, 2147483647 AS ord,
                 substr(nt.t, max(m.e)::INT) AS piece
          FROM merged m JOIN nt ON m.doc_id = nt.doc_id
          GROUP BY m.doc_id, nt.t)
        SELECT doc_id,
               coalesce(string_agg(CASE WHEN piece <> '' THEN piece END,
                                   ' ' ORDER BY ord), '') AS cleaned_text
        FROM pieces GROUP BY doc_id
    """


def _decontaminate_sql() -> str:
    words = (
        "list_filter(string_split_regex(trim(text), '[ \\t\\n\\r]+'),"
        " x -> x <> '')"
    )
    return f"""
        WITH w AS (
          SELECT doc_id, {words} AS w FROM documents),
        bg AS (
          SELECT DISTINCT g FROM (
            SELECT unnest({_DECON_GRAMS.format(w='(w[11:30])')}) AS g
            FROM w WHERE doc_id % 50 = 0)),
        dg AS (
          SELECT DISTINCT doc_id, g FROM (
            SELECT doc_id, unnest({_DECON_GRAMS.format(w='w')}) AS g
            FROM w))
        SELECT doc_id, count(*)::BIGINT AS n_hits
        FROM dg JOIN bg USING (g)
        GROUP BY doc_id
    """


# ======================================================================
# embeddings: similarity search
# ======================================================================

def _query_vec(spark, sf_dir, vid=0):
    row = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == vid)
        .select("embedding")
        .collect()[0]
    )
    return [float(x) for x in row["embedding"]]


def embedding_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, _query_vec(spark, sf_dir, 0), k=10)


def embedding_neardup(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return cosine_neardup_pairs(emb, 0.45, block_col="label")


def embedding_label_centroids(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    aggs = [
        F.round(F.avg(F.element_at(v, i + 1)), 6).alias(f"c{i}")
        for i in range(8)
    ]
    return emb.groupBy("label").agg(F.count("*").alias("n"), *aggs)


def embedding_knn(spark, sf_dir):
    """Exact top-3 neighbors per vector (KNN self-join). Unblocked here
    (the oracle-able baseline at test scale); the operator takes an IVF
    cell / SRP bucket as block_col for the candidates-only scale path
    (recall asserted in tests)."""
    from hyperpolyglot_spark.operators.similarity import knn_join

    emb = _t(spark, sf_dir, "embeddings")
    return knn_join(emb, k=3)


def embedding_ann_ivf(spark, sf_dir):
    """IVF-bucketed approximate top-k (rows-only check: ANN is not
    SQL-expressible; accuracy vs brute force asserted in tests)."""
    emb = _t(spark, sf_dir, "embeddings")
    C = ivf_centroids(emb, n_cells=8)
    return ivf_topk(emb, C, _query_vec(spark, sf_dir, 7), k=10, n_probe=4)


def langid_code_switch_spans(spark, sf_dir):
    """Per-span language segmentation for code-switched documents
    (VERDICT r5 #2): the reference's single-``Detection`` outcome
    (src/lib.rs:89-95) generalized to segment level. Script-run
    boundaries (the r5 int8 codepoint->script table, one gather) split
    the doc; each run with >= MIN_SPAN_LETTERS letters is classified
    by the hashed NB restricted to script-compatible languages (CJK
    runs decide zh/ja by kana presence); the doc gets a
    letters-weighted dominant language + mixed flag for the keep
    policy. Input = documents rows (mono-script negative controls:
    mixed must stay false) + the cross-script bilingual stratum
    (datagen/realtext.code_switched_docs — en-quote-inside-ru, fr/ar
    bilingual, + pure controls). Oracle = frozen expected from the
    pure-python spec (segments.classify_spans_py), cross-checked at
    freeze time; floors pinned in tests/test_segments.py."""
    from hyperpolyglot_spark.datagen.realtext import code_switched_docs
    from hyperpolyglot_spark.functions.segments import (
        span_rows,
        with_segments,
    )

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", "text")
    )
    fx = local_rows_df(
        spark,
        [(d, t) for d, _a, _b, _l, t in code_switched_docs()],
        "doc_id long, text string",
    )
    df = docs.unionByName(fx).repartition(8)
    out = span_rows(with_segments(df, spark))
    return out.select(
        "doc_id",
        "span_idx",
        "span_start",
        "span_len",
        "span_letters",
        "script",
        "lang",
        "dominant_lang",
        F.round("dominant_share", 6).alias("dominant_share"),
        "mixed",
    )


def langid_noisy_texts(spark, sf_dir):
    """Noisy-encoding robustness as a driver row (VERDICT r5 #4): the
    102-language stratum of mojibake / HTML-entity / percent-encoded /
    zero-width-littered variants (datagen/realtext.noisy_texts, all
    deterministic transforms of the repo's own prose) pushed through
    the production classifier (unresolved gate on) AND the quality
    ladder, distributed. kept_mislabel pins the pipeline safety
    invariant (always false: a wrong-language doc never enters the
    kept pool). Oracle = frozen expected from the pure-python specs
    (classify_or_none_py + py_keep_drop), cross-checked at freeze
    time; behavioral floors pinned in test_realtext."""
    from hyperpolyglot_spark.datagen.realtext import noisy_texts
    from hyperpolyglot_spark.functions.langid import make_classify_udf
    from hyperpolyglot_spark.functions.quality import (
        with_keep_drop,
        with_quality_signals,
    )

    df = local_rows_df(
        spark,
        noisy_texts(),
        "doc_id long, lang string, variant string, text string",
    ).repartition(8)
    clf = make_classify_udf(spark, None, unresolved=True)
    df = df.withColumn(
        "lang_pred", clf(F.col("text"), F.array().cast("array<string>"))
    )
    df = with_keep_drop(with_quality_signals(df, "text"))
    return df.select(
        "doc_id",
        "lang",
        "variant",
        "lang_pred",
        "keep",
        "drop_rule",
        (
            F.col("keep")
            & F.col("lang_pred").isNotNull()
            & (F.col("lang_pred") != F.col("lang"))
        ).alias("kept_mislabel"),
    )


# target mix for the sampling query: down-sample the over-represented
# strata (the crawl-reality case), keep the tail at full rate. Shared
# by the Spark query and the generated SQL oracle.
_MIX_RATES = {"en": 0.25, "de": 0.5, "fr": 0.5, "es": 0.4}

# boilerplate lines for the line-dedup query — injected identically by
# the Spark builder and the DuckDB oracle (the _URL_VARIANTS pattern):
# every doc gets B1/B2 repeated around its body, doc_id%3==0 gets B1 a
# third time, doc_id%5==0 gets its own body repeated (dedupe must drop
# the long content line too, not just short boilerplate).
_BOILER = ("NAVIGATION MENU", "Subscribe to our newsletter",
           "(c) example site 2026")


def _boiler_messy_docs(spark, sf_dir):
    """documents with boilerplate lines injected around each body —
    the shared fixture both line-cleaning queries (and their SQL
    oracles, via _boiler_messy_sql) operate on."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    b1, b2, b3 = [F.lit(x) for x in _BOILER]
    nl = F.lit("\n")
    base = F.concat_ws("\n", b1, b2, F.col("text"), b1, b2, b3)
    messy = F.when(
        F.col("doc_id") % 3 == 0, F.concat(base, nl, b1)
    ).otherwise(base)
    messy = F.when(
        F.col("doc_id") % 5 == 0, F.concat(messy, nl, F.col("text"))
    ).otherwise(messy)
    return docs.select("doc_id", messy.alias("text"))


def docs_common_line_filtered(spark, sf_dir):
    """CROSS-doc boilerplate removal (the actual C4 rule: a line that
    appears in >= 3 distinct documents is boilerplate): remove every
    corpus-common line from every doc, order preserved; within-doc
    duplicates of non-common lines survive (composes with
    docs_line_deduped). Two shuffles, both inherent to a cross-doc
    operator (line-count agg with map-side combine + per-doc rebuild);
    the common set joins back as a BROADCAST anti-join, so the
    corpus-sized side never shuffles for the join. Oracle = the same
    two-phase computation in DuckDB over the identical injected
    corpus."""
    from hyperpolyglot_spark.functions.textclean import common_line_filter

    out = common_line_filter(_boiler_messy_docs(spark, sf_dir), min_docs=3)
    return out.select(
        "doc_id",
        F.md5("cleaned_text").alias("cleaned_md5"),
        F.length("cleaned_text").alias("cleaned_len"),
        "n_lines_removed",
    )


def docs_line_deduped(spark, sf_dir):
    """C4-style within-doc duplicate-line removal
    (functions/textclean.py): exact duplicate lines dropped, FIRST
    occurrence kept in order — the boilerplate-stripping pass web
    cleaning runs before dedup/langid. Pure per-row array expressions
    (no shuffle, no Python); the oracle runs the SAME formulation in
    DuckDB (list comprehension + list_position), so this is a
    structural two-engine check, not a frozen table."""
    from hyperpolyglot_spark.functions.textclean import with_deduped_lines

    out = with_deduped_lines(_boiler_messy_docs(spark, sf_dir))
    return out.select(
        "doc_id",
        F.md5("cleaned_text").alias("cleaned_md5"),
        F.length("cleaned_text").alias("cleaned_len"),
        "n_lines_removed",
    )


def training_mix_sample(spark, sf_dir):
    """Dataset-mixing stage: deterministic stratified down-sampling by
    language (operators/mixing.py). Keep-decision = fixed-width
    hex-string comparison on md5(id:salt) against a per-stratum
    threshold — no rand() (resumable: every retry of every partition
    makes the same decision), no shuffle (broadcast dim + map-side
    filter), and the oracle evaluates the IDENTICAL predicate in
    DuckDB (lowercase fixed-width hex compares lexicographically ==
    numerically in both engines)."""
    from hyperpolyglot_spark.operators.mixing import stratified_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return stratified_sample(docs, spark, _MIX_RATES)


def source_rule_rollup(spark, sf_dir):
    """Domain-level quality rollup (the blocklist-candidate report a
    crawl pipeline runs per host): docs per (source, outcome) where
    outcome is the first-match drop rule or 'kept'. One hash
    aggregation over the quality ladder's output — the per-host
    keep-rate table that feeds url_blocklist updates at corpus
    scale."""
    from hyperpolyglot_spark.functions.quality import (
        with_keep_drop,
        with_quality_signals,
    )

    docs = _spread(
        spark, _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    )
    kd = with_keep_drop(with_quality_signals(docs, "text"))
    return (
        kd.groupBy(
            "source",
            F.coalesce(F.col("drop_rule"), F.lit("kept")).alias("outcome"),
        )
        .agg(F.count("*").alias("n"))
    )


def video_media_features(spark, sf_dir):
    """Video-column operator as a driver row (VERDICT r5 #5, closing
    the media triad): MJPEG-in-AVI clips synthesized deterministically
    from doc_id (datagen/video — 8x8 block-constant frames with a unit
    quant table, so baseline JPEG is EXACT), decoded DISTRIBUTED by
    the real RIFF walk + per-frame T.81 JPEG decode inside
    video_features (mapInPandas). The frozen oracle recomputes the
    features from the RAW frames WITHOUT the AVI/JPEG container — so
    the row checks container parse + entropy decode + feature math,
    never one implementation against itself."""
    import pandas as pd

    from hyperpolyglot_spark.datagen.video import synth_avi
    from hyperpolyglot_spark.operators.multimodal import video_features

    @F.pandas_udf("binary")
    def avi_udf(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synth_avi(int(i)))

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id")
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"), avi_udf("doc_id").alias("payload")
    )
    out = video_features(media)
    return out.select(
        F.col("media_id").alias("doc_id"),
        "n_frames",
        "width",
        "height",
        "fps",
        "duration_ms",
        "mean_luma",
        "motion",
    )


def semantic_dedup_embeddings(spark, sf_dir):
    """SemDedup-style embedding-cluster dedup decision (VERDICT r5 #6):
    IVF cells (deterministic centroids: 8 lowest-id seeds + one k-means
    pass) + within-cell cosine near-dup -> keep/drop per vector with
    dup_of/dup_cosine audit columns (operators/dedup.semantic_dedup).
    The semantic-dedup pass real LLM pipelines run after minhash.
    Oracle = frozen numpy replication of the same clustering + drop
    rule (tools/gen_expected.py), so the driver gate covers the
    blocked decision itself — no all-pairs outside the oracle."""
    from hyperpolyglot_spark.operators.dedup import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    C = ivf_centroids(emb, n_cells=8)
    return semantic_dedup(emb, C, threshold=0.45)


def embedding_knn_blocked(spark, sf_dir):
    """The PRODUCTION form of the KNN self-join: multi-probe IVF cell
    blocking (assign_cells_multi) makes the join candidates-only —
    never all-pairs. Oracled against a frozen numpy replication of the
    same blocking (tools/gen_expected.py), so the driver gate covers
    the blocked plan itself, not just the quadratic baseline."""
    from hyperpolyglot_spark.operators.similarity import (
        assign_cells_multi,
        knn_join,
    )

    emb = _t(spark, sf_dir, "embeddings")
    C = ivf_centroids(emb, n_cells=8)
    blocked = assign_cells_multi(emb, C, n_probe=3)
    return knn_join(blocked, k=3, block_col="cell")


# ======================================================================
# registry
# ======================================================================

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the driver's correctness gate checks the FIRST 50
    # entries; the registry holds more, so the tail rotates each round
    # (VERDICT r4 #2: no entry goes more than two rounds without a
    # driver signal). Round-6 rotation: the 14 entries demoted in r05
    # (docs_matching_regex .. events_top_users, last driver-green r04
    # — r06 is their deadline) are promoted back into the window, and
    # 18 entries that were driver-green in r05 AND whose specs did not
    # change this round take the tail (they must return by r07).
    # Every entry keeps its in-repo oracle coverage every pytest run
    # (tests/test_entry_oracle.py runs ALL entries).
    return {
        # --- promoted back this round (absent from the driver window
        # in r05 only; deadline rotation) ---
        "docs_matching_regex": docs_matching_regex,
        "lang_chars_zscore": lang_chars_zscore,
        "regex_marker_counts": regex_marker_counts,
        "source_lang_matrix": source_lang_matrix,
        "orders_with_heavy_items": orders_with_heavy_items,
        "top2_orders_per_customer": top2_orders_per_customer,
        "revenue_pct_by_returnflag": revenue_pct_by_returnflag,
        "min_cost_supplier_per_nation": min_cost_supplier_per_nation,
        "nation_customer_supplier_counts": nation_customer_supplier_counts,
        "events_value_stats": events_value_stats,
        "events_salted_counts": events_salted_counts,
        "events_json_props": events_json_props,
        "events_hourly": events_hourly,
        "events_top_users": events_top_users,
        # --- standing window ---
        "lang_breakdown": lang_breakdown,
        "doc_token_stats": doc_token_stats,
        "exact_dedup_documents": exact_dedup_documents,
        "neardup_minhash_pairs": neardup_minhash_pairs,
        "neardup_incremental": neardup_incremental,
        "neardup_incremental_indexed": neardup_incremental_indexed,
        "doc_token_nb": doc_token_nb,
        "classifier_training_agg": classifier_training_agg,
        "doc_perplexity": doc_perplexity,
        "hashed_gram_buckets": hashed_gram_buckets,
        "per_strategy_report": per_strategy_report,
        "docs_keep_drop": docs_keep_drop,
        "docs_scrubbed": docs_scrubbed,
        "doc_tokens": doc_tokens,
        "langid_predict_documents": langid_predict_documents,
        "langid_unresolved": langid_unresolved,
        "langid_short_texts": langid_short_texts,
        "unresolved_disposition": unresolved_disposition,
        "canonical_url_dedup": canonical_url_dedup,
        "decontaminate_documents": decontaminate_documents,
        "decontaminate_spans": decontaminate_spans,
        "decontaminate_rewrite_docs": decontaminate_rewrite_docs,
        "audio_media_features": audio_media_features,
        "embedding_topk": embedding_topk,
        "embedding_neardup": embedding_neardup,
        "embedding_knn": embedding_knn,
        "embedding_ann_ivf": embedding_ann_ivf,
        "embedding_knn_blocked": embedding_knn_blocked,
        # --- round-6 new operators ---
        "langid_code_switch_spans": langid_code_switch_spans,
        "semantic_dedup_embeddings": semantic_dedup_embeddings,
        "video_media_features": video_media_features,
        "langid_noisy_texts": langid_noisy_texts,
        "training_mix_sample": training_mix_sample,
        "source_rule_rollup": source_rule_rollup,
        "docs_line_deduped": docs_line_deduped,
        "docs_common_line_filtered": docs_common_line_filtered,
        # --- rotation tail (22 entries past the driver's 50-entry
        # window this round; ALL driver-green in r05, specs untouched
        # in r06, still oracled in-repo every pytest run; promote back
        # in r07 — none may sit out two consecutive rounds) ---
        "q1_pricing_summary": q1_pricing_summary,
        "q3_shipping_priority": q3_shipping_priority,
        "q5_region_revenue": q5_region_revenue,
        "top_suppliers": top_suppliers,
        "customers_without_orders": customers_without_orders,
        "rollup_order_priority": rollup_order_priority,
        "distinct_types_per_brand": distinct_types_per_brand,
        "segment_set_ops": segment_set_ops,
        "sql_api_revenue_by_priority": sql_api_revenue_by_priority,
        "source_langs_csv": source_langs_csv,
        "events_type_pivot": events_type_pivot,
        "orders_cube": orders_cube,
        "events_sessionization": events_sessionization,
        "purchases_asof_click": purchases_asof_click,
        "clicks_in_purchase_windows": clicks_in_purchase_windows,
        "lang_median_chars": lang_median_chars,
        "family_breakdown": family_breakdown,
        "doc_quality_scores": doc_quality_scores,
        "doc_script_mix": doc_script_mix,
        "embedding_label_centroids": embedding_label_centroids,
        "neardup_jaccard_pairs": neardup_jaccard_pairs,
        "neardup_simhash_pairs": neardup_simhash_pairs,
    }


_WORDS = "list_filter(string_split_regex(text, '[ \\t\\n\\r]+'), x -> x <> '')"


def _lang_info_values() -> str:
    from hyperpolyglot_spark.functions.langdata import LANG_INFO

    return ", ".join(
        f"('{l}','{i['family']}','{i['script']}')"
        for l, i in sorted(LANG_INFO.items())
    )


_LANG_INFO_VALUES = _lang_info_values()


def _script_mix_sql() -> str:
    from hyperpolyglot_spark.functions.textstats import SCRIPT_CLASSES

    cols = ", ".join(
        f"round((length(text) - length(regexp_replace(text, '[{cls}]', '', 'g')))::DOUBLE"
        f" / greatest(length(text), 1), 6) AS {s}_ratio"
        for s, cls in sorted(SCRIPT_CLASSES.items())
    )
    return f"SELECT doc_id, lang, {cols} FROM documents"


def _keep_drop_sql() -> str:
    """DuckDB form of the quality signals + rule ladder, generated from
    the SAME dims (symbol class, spaceless class, stopword set, RULES
    table) the Spark side uses — one source of truth, two engines. A
    NULL gated signal never fires its rule (CASE WHEN NULL falls
    through), matching the py spec and column ladder."""
    from hyperpolyglot_spark.functions.langdata import ALL_STOPWORDS
    from hyperpolyglot_spark.functions.langid import NORM_FROM, NORM_TO
    from hyperpolyglot_spark.functions.quality import (
        _HANGUL_PARTICLE_RE_S,
        _REP_CHAR_CAP,
        _REP_CHAR_N,
        _SPACELESS_CLASS,
        _SYMBOL_CLASS,
        RULES,
        SPACELESS_THRESHOLD,
    )

    # r6: same invisible-char normalization as with_quality_signals /
    # py_signals — DuckDB translate() deletes chars beyond len(to),
    # identical to Spark's (SQL-standard rule)
    _nf, _nt = NORM_FROM, NORM_TO
    # SQL-escape: the Afrikaans stopword 'n carries an apostrophe
    stops = ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(ALL_STOPWORDS))
    ladder = "CASE"
    for rule_id, signal, op, _thr in RULES:
        if signal == "is_vendor_url":
            continue  # documents carry no url; the rule can't fire
        thr = repr(_thr)
        ladder += f" WHEN {signal} {op} {thr} THEN '{rule_id}'"
    ladder += " ELSE NULL END"
    return f"""
        WITH sig0 AS (
          SELECT doc_id,
                 length(text) AS n_chars,
                 len(w) AS n_words,
                 (length(text) - length(regexp_replace(text, '{_SYMBOL_CLASS}', '', 'g')))::DOUBLE
                   / greatest(length(text), 1) AS symbol_ratio,
                 CASE WHEN len(w) >= 3
                      THEN 1.0 - len(list_distinct([array_to_string(w[i:i+2], ' ')
                                                    for i in range(1, len(w) - 1)]))::DOUBLE
                                 / (len(w) - 2)
                      ELSE 0.0 END AS rep3_ratio,
                 len(list_filter(w, x -> list_contains([{stops}], lower(x))
                                          OR regexp_matches(x, '{_HANGUL_PARTICLE_RE_S}')))::DOUBLE
                   / greatest(len(w), 1) AS stop_density,
                 (length(text) - length(regexp_replace(text, '{_SPACELESS_CLASS}', '', 'g')))::DOUBLE
                   / greatest(length(text), 1) AS spaceless_ratio,
                 substring(text, 1, {_REP_CHAR_CAP}) AS tc
          FROM (SELECT doc_id, text, {_WORDS} AS w
                FROM (SELECT doc_id,
                             translate(text, '{_nf}', '{_nt}') AS text
                      FROM documents))
        ), sig AS (
          SELECT *,
                 spaceless_ratio > {SPACELESS_THRESHOLD} AS is_spaceless,
                 CASE WHEN spaceless_ratio > {SPACELESS_THRESHOLD} THEN NULL
                      ELSE n_chars::DOUBLE END AS n_chars_gated,
                 CASE WHEN spaceless_ratio > {SPACELESS_THRESHOLD}
                      THEN n_chars::DOUBLE ELSE NULL END AS n_chars_spaceless_gated,
                 CASE WHEN spaceless_ratio > {SPACELESS_THRESHOLD} THEN NULL
                      ELSE rep3_ratio END AS rep3_gated,
                 CASE WHEN spaceless_ratio <= {SPACELESS_THRESHOLD} THEN NULL
                      WHEN length(tc) >= {_REP_CHAR_N}
                      THEN 1.0 - len(list_distinct([substring(tc, i, {_REP_CHAR_N})
                                    for i in range(1, length(tc) - {_REP_CHAR_N - 1})]))::DOUBLE
                                 / (length(tc) - {_REP_CHAR_N - 1})
                      ELSE 0.0 END AS rep_char_gated,
                 CASE WHEN spaceless_ratio > {SPACELESS_THRESHOLD} THEN NULL
                      ELSE stop_density END AS stop_density_gated
          FROM sig0
        )
        SELECT doc_id,
               n_chars::BIGINT AS n_chars,
               n_words::BIGINT AS n_words,
               round(symbol_ratio, 6) AS symbol_ratio,
               round(rep3_ratio, 6) AS rep3_ratio,
               round(stop_density, 6) AS stop_density,
               round(spaceless_ratio, 6) AS spaceless_ratio,
               ({ladder}) IS NULL AS keep,
               {ladder} AS drop_rule
        FROM sig
    """


def _common_line_sql() -> str:
    """Two-phase cross-doc boilerplate filter in DuckDB over the same
    injected corpus: count distinct docs per line, materialize the
    common set as ONE list, per-doc list-comprehension filter."""
    messy = _boiler_messy_expr_sql()
    return f"""
        WITH src AS (SELECT doc_id, {messy} AS _m FROM documents),
        l AS (SELECT doc_id, string_split(_m, chr(10)) AS ls FROM src),
        lines AS (SELECT doc_id, unnest(ls) AS line FROM l),
        common AS (
          SELECT line FROM lines GROUP BY line
          HAVING count(DISTINCT doc_id) >= 3),
        cset AS (SELECT coalesce(list(line), []) AS cl FROM common)
        SELECT doc_id,
               md5(array_to_string(kept, chr(10))) AS cleaned_md5,
               length(array_to_string(kept, chr(10))) AS cleaned_len,
               len(ls) - len(kept) AS n_lines_removed
        FROM (
          SELECT doc_id, ls,
                 [x for x in ls if NOT list_contains(cset.cl, x)] AS kept
          FROM l, cset)
    """


def _boiler_messy_expr_sql() -> str:
    """SQL form of _boiler_messy_docs' injected text expression."""
    b1, b2, b3 = _BOILER
    nl = "chr(10)"
    base = (
        f"'{b1}' || {nl} || '{b2}' || {nl} || text || {nl} || "
        f"'{b1}' || {nl} || '{b2}' || {nl} || '{b3}'"
    )
    messy = (
        f"CASE WHEN doc_id % 3 = 0 THEN {base} || {nl} || '{b1}' "
        f"ELSE {base} END"
    )
    return (
        f"CASE WHEN doc_id % 5 = 0 THEN ({messy}) || {nl} || text "
        f"ELSE ({messy}) END"
    )


def _line_dedup_sql() -> str:
    """Shared boilerplate injection + the shared DuckDB line-dedup
    formulation (functions/textclean.dedupe_lines_sql)."""
    from hyperpolyglot_spark.functions.textclean import dedupe_lines_sql

    messy = _boiler_messy_expr_sql()
    cleaned, removed = dedupe_lines_sql("_m")
    return f"""
        SELECT doc_id, md5(cleaned_text) AS cleaned_md5,
               length(cleaned_text) AS cleaned_len,
               {removed} AS n_lines_removed
        FROM (
          SELECT doc_id, _m,
                 {cleaned} AS cleaned_text
          FROM (SELECT doc_id, {messy} AS _m FROM documents))
    """


def _training_mix_sql() -> str:
    """Generated from the SAME rates table + threshold function the
    Spark query uses (operators/mixing.py) — the decision predicate is
    string-identical across engines."""
    from hyperpolyglot_spark.operators.mixing import stratified_sample_sql

    return stratified_sample_sql(_MIX_RATES, columns="doc_id, lang, source")


def _source_rollup_sql() -> str:
    """Per-source outcome rollup over the keep/drop ladder: reuse the
    generated keep_drop SQL as a CTE (one source of truth for the
    ladder), join source back on, group."""
    return f"""
        WITH kd AS ({_keep_drop_sql()})
        SELECT d.source,
               coalesce(kd.drop_rule, 'kept') AS outcome,
               count(*) AS n
        FROM kd JOIN documents d USING (doc_id)
        GROUP BY d.source, coalesce(kd.drop_rule, 'kept')
    """


def _scrub_sql() -> str:
    """Sequential scrub rewrites + counts, generated from
    SCRUB_PATTERNS: count on the pre-rule text (like re.subn), then
    nest the replacement for the next rule."""
    from hyperpolyglot_spark.functions.scrub import SCRUB_PATTERNS

    expr = "text"
    counts = []
    for name, pat, rep in SCRUB_PATTERNS:
        ci = name.startswith("toxicity")
        opts = "'gi'" if ci else "'g'"
        copts = ", 0, 'i'" if ci else ""
        counts.append(
            f"len(regexp_extract_all({expr}, '{pat}'{copts}))::INT"
            f" AS scrub_{name}"
        )
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', {opts})"
    return (
        f"SELECT doc_id, {expr} AS scrubbed_text, {', '.join(counts)} "
        "FROM documents"
    )


def _marker_case_sql() -> str:
    from hyperpolyglot_spark.functions.langdata import MARKER_RULES

    whens = " ".join(
        "WHEN '{}' THEN regexp_matches(text, '{}')".format(
            lang, pat.replace("'", "''")  # af marker contains '
        )
        for lang, pat in MARKER_RULES.items()
    )
    return f"(CASE lang {whens} ELSE false END)"
# word-3-gram shingles, aligned with dedup.word_shingles /
# _distinct_shingles_col: a doc with 1-2 words emits its whole text as a
# single shingle (NOT the empty set), an empty doc emits none.
_GRAMS3 = (
    "(CASE WHEN len(w) >= 3 THEN list_distinct([array_to_string(w[i:i+2], ' ') "
    "for i in range(1, len(w) - 1)]) "
    "WHEN len(w) > 0 THEN [array_to_string(w, ' ')] "
    "ELSE []::VARCHAR[] END)"
)

_INCREMENTAL_SQL = f"""
    WITH g AS (
      SELECT doc_id, {_GRAMS3} AS grams
      FROM (SELECT doc_id, {_WORDS} AS w FROM documents)
    )
    SELECT a.doc_id AS id_new, b.doc_id AS id_old,
           round(len(list_intersect(a.grams, b.grams))::DOUBLE
                 / greatest(len(a.grams) + len(b.grams)
                            - len(list_intersect(a.grams, b.grams)), 1),
                 6) AS jaccard
    FROM g a JOIN g b ON a.doc_id >= 250 AND b.doc_id < 250
    WHERE round(len(list_intersect(a.grams, b.grams))::DOUBLE
                / greatest(len(a.grams) + len(b.grams)
                           - len(list_intersect(a.grams, b.grams)), 1),
                6) >= 0.5
"""


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice), 4) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   round(avg(l_extendedprice), 6) AS avg_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q3_shipping_priority": """
            SELECT l_orderkey, o_orderdate,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
              AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, l_orderkey
            LIMIT 10
        """,
        "q5_region_revenue": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
            GROUP BY n_name
        """,
        "top_suppliers": """
            SELECT s_suppkey, s_name, s_acctbal
            FROM supplier ORDER BY s_acctbal DESC, s_suppkey LIMIT 5
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """,
        "orders_with_heavy_items": """
            SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49)
        """,
        "top2_orders_per_customer": """
            SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders) WHERE rn <= 2
        """,
        "revenue_pct_by_returnflag": """
            SELECT l_returnflag,
                   round(rev, 4) AS revenue,
                   round(rev * 100.0 / sum(rev) OVER (), 6) AS pct
            FROM (SELECT l_returnflag, sum(l_extendedprice) AS rev
                  FROM lineitem GROUP BY l_returnflag)
        """,
        "rollup_order_priority": """
            SELECT o_orderpriority, o_orderstatus,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 4) AS total_price
            FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        """,
        "distinct_types_per_brand": """
            SELECT p_brand,
                   count(DISTINCT p_type) AS n_types,
                   count(DISTINCT p_size) AS n_sizes,
                   round(avg(p_retailprice), 6) AS avg_price
            FROM part GROUP BY p_brand
        """,
        "segment_set_ops": """
            SELECT c_custkey FROM (
              (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
               UNION
               SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
              INTERSECT
              SELECT c_custkey FROM customer WHERE c_acctbal > 5000
              EXCEPT
              SELECT c_custkey FROM customer WHERE c_nationkey = 3)
        """,
        "min_cost_supplier_per_nation": """
            SELECT n_name, s_suppkey, s_name, s_acctbal FROM (
              SELECT s.*, row_number() OVER (PARTITION BY s_nationkey
                                             ORDER BY s_acctbal, s_suppkey) AS rk
              FROM supplier s) b
            JOIN nation ON b.s_nationkey = n_nationkey
            WHERE rk = 1
        """,
        "nation_customer_supplier_counts": """
            SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
                   coalesce(n_customers, 0) AS n_customers,
                   coalesce(n_suppliers, 0) AS n_suppliers
            FROM (SELECT c_nationkey AS nationkey, count(*) AS n_customers
                  FROM customer GROUP BY 1) c
            FULL OUTER JOIN
                 (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
                  FROM supplier GROUP BY 1) s
              USING (nationkey)
        """,
        "sql_api_revenue_by_priority": """
            SELECT o_orderpriority, count(*) AS n_orders,
                   round(sum(o_totalprice), 4) AS total_price,
                   round(avg(o_totalprice), 6) AS avg_price
            FROM orders GROUP BY o_orderpriority
        """,
        "events_value_stats": """
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 6) AS p50,
                   round(quantile_cont(value, 0.95), 6) AS p95,
                   round(stddev_samp(value), 6) AS sd,
                   round(min(value), 4) AS vmin,
                   round(max(value), 4) AS vmax
            FROM events GROUP BY event_type
        """,
        "events_salted_counts": """
            SELECT event_type, count(*) AS n,
                   round(sum(value), 4) AS total_value
            FROM events GROUP BY event_type
        """,
        "events_json_props": """
            SELECT event_type,
                   -- // = integer division (a plain / then ::INT would
                   -- ROUND in DuckDB while Spark's cast truncates)
                   (json_extract(props, '$.k')::INT // 10) AS k_bucket,
                   count(*) AS n,
                   round(avg(json_extract(props, '$.k')::INT), 6) AS avg_k
            FROM events GROUP BY 1, 2
        """,
        "source_langs_csv": """
            SELECT source,
                   array_to_string(list_sort(list(DISTINCT lang)), ',') AS langs_csv,
                   count(*) AS docs
            FROM documents GROUP BY source
        """,
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*) AS n, round(sum(value), 4) AS total_value
            FROM events GROUP BY 1, 2
        """,
        "events_sessionization": """
            SELECT user_id,
                   sum(new_session)::BIGINT AS n_sessions,
                   count(*) AS n_events
            FROM (
              SELECT user_id,
                     CASE WHEN prev_ts IS NULL
                          OR epoch(ts) - epoch(prev_ts) > 1800
                          THEN 1 ELSE 0 END AS new_session
              FROM (SELECT user_id, ts,
                           lag(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_ts
                    FROM events))
            GROUP BY user_id
        """,
        "events_type_pivot": """
            SELECT user_id,
                   count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
                   count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
                   count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
                   count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
                   count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error
            FROM events GROUP BY user_id
        """,
        "purchases_asof_click": """
            WITH purchases AS (
              SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase'
            ), clicks AS (
              SELECT user_id, ts AS click_ts, max(event_id) AS click_event_id
              FROM events WHERE event_type = 'click'
              GROUP BY user_id, ts
            )
            SELECT p.event_id, p.user_id, p.ts, c.click_ts, c.click_event_id
            FROM purchases p
            ASOF LEFT JOIN clicks c
              ON p.user_id = c.user_id AND p.ts >= c.click_ts
        """,
        "clicks_in_purchase_windows": """
            WITH p AS (
              SELECT event_id AS interval_id, ts AS start_ts,
                     ts + INTERVAL 30 MINUTE AS end_ts
              FROM events WHERE event_type = 'purchase'
            ), c AS (
              SELECT ts, value FROM events WHERE event_type = 'click'
            )
            SELECT interval_id, count(*) AS n_clicks,
                   round(sum(c.value), 4) AS click_value
            FROM p JOIN c ON c.ts >= p.start_ts AND c.ts <= p.end_ts
            GROUP BY interval_id
        """,
        "orders_cube": """
            SELECT o_orderpriority, o_orderstatus,
                   count(*) AS n_orders,
                   round(avg(o_totalprice), 6) AS avg_price
            FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
        """,
        "events_top_users": """
            SELECT user_id, round(sum(value), 4) AS total_value
            FROM events GROUP BY user_id
            ORDER BY total_value DESC, user_id LIMIT 10
        """,
        "lang_breakdown": """
            SELECT lang, count(*) AS docs, sum(n_chars)::BIGINT AS chars,
                   round(count(*) * 100.0 / sum(count(*)) OVER (), 6) AS pct
            FROM documents GROUP BY lang
        """,
        "source_lang_matrix": """
            SELECT source, lang, count(*) AS docs,
                   round(avg(n_chars), 6) AS avg_chars
            FROM documents GROUP BY source, lang
        """,
        "doc_token_stats": f"""
            SELECT doc_id,
                   len(w)::BIGINT AS n_tokens,
                   len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS n_subtokens,
                   round(len(list_distinct(w))::DOUBLE / greatest(len(w), 1), 6) AS ttr,
                   list_reduce(
                     list_prepend(0::BIGINT,
                       [unicode(c)::BIGINT for c in string_split(text, '') if c <> '']),
                     (acc, c) -> (acc * 31 + c) % 1000000007) AS fingerprint
            FROM (SELECT doc_id, text, {_WORDS} AS w FROM documents)
        """,
        "doc_quality_scores": f"""
            SELECT doc_id,
                   round((least(length(text) / 500.0, 1.0)
                          + len(list_distinct(w))::DOUBLE / greatest(len(w), 1)
                          + CASE WHEN length(text)::DOUBLE / greatest(len(w), 1)
                                      BETWEEN 3.0 AND 12.0
                                 THEN 1.0 ELSE 0.5 END) / 3.0, 6) AS quality_score
            FROM (SELECT doc_id, text, {_WORDS} AS w FROM documents)
        """,
        "regex_marker_counts": """
            SELECT doc_id,
                   len(regexp_extract_all(text, '\\bthe\\b'))::BIGINT AS n_the,
                   len(regexp_extract_all(text, '\\bvalue\\b'))::BIGINT AS n_value,
                   len(regexp_extract_all(text, '[0-9]+'))::BIGINT AS n_numbers
            FROM documents
        """,
        "family_breakdown": f"""
            SELECT family, count(*) AS docs,
                   count(DISTINCT d.lang) AS n_langs
            FROM documents d
            LEFT JOIN (VALUES {_LANG_INFO_VALUES})
                   AS li(lang, family, script) ON d.lang = li.lang
            WHERE script = 'latin'
            GROUP BY family
        """,
        "docs_matching_regex": """
            SELECT doc_id, lang FROM documents
            WHERE regexp_matches(text, '(^| )table (scan|merge)( |$)')
        """,
        "lang_chars_zscore": """
            SELECT doc_id, lang,
                   round((n_chars - avg(n_chars) OVER (PARTITION BY lang))
                         / stddev_samp(n_chars) OVER (PARTITION BY lang), 6) AS z
            FROM documents
        """,
        "lang_median_chars": """
            SELECT lang, round(quantile_cont(n_chars, 0.5), 6) AS median_chars
            FROM documents GROUP BY lang
        """,
        "exact_dedup_documents": """
            SELECT md5(text) AS text_hash,
                   min(doc_id) AS canonical_id,
                   count(*) AS dup_count
            FROM documents GROUP BY md5(text)
        """,
        "neardup_jaccard_pairs": f"""
            WITH g AS (
              SELECT doc_id, lang, {_GRAMS3} AS grams
              FROM (SELECT doc_id, lang, {_WORDS} AS w FROM documents)
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.grams, b.grams))::DOUBLE
                         / greatest(len(a.grams) + len(b.grams)
                                    - len(list_intersect(a.grams, b.grams)), 1),
                         6) AS jaccard
            FROM g a JOIN g b
              ON a.lang = b.lang AND a.doc_id < b.doc_id
            WHERE round(len(list_intersect(a.grams, b.grams))::DOUBLE
                        / greatest(len(a.grams) + len(b.grams)
                                   - len(list_intersect(a.grams, b.grams)), 1),
                        6) >= 0.5
        """,
        "neardup_minhash_pairs": f"""
            -- oracle = exact all-pairs jaccard (unblocked): the LSH
            -- candidates are exactly verified, and at this corpus's
            -- similarity distribution (true pairs ~0.99, next <=0.03)
            -- the 16x4-band S-curve recall is ~1, so LSH+verify ==
            -- exact (equality also asserted in tests/test_operators.py)
            WITH g AS (
              SELECT doc_id, {_GRAMS3} AS grams
              FROM (SELECT doc_id, {_WORDS} AS w FROM documents)
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.grams, b.grams))::DOUBLE
                         / greatest(len(a.grams) + len(b.grams)
                                    - len(list_intersect(a.grams, b.grams)), 1),
                         6) AS jaccard
            FROM g a JOIN g b ON a.doc_id < b.doc_id
            WHERE round(len(list_intersect(a.grams, b.grams))::DOUBLE
                        / greatest(len(a.grams) + len(b.grams)
                                   - len(list_intersect(a.grams, b.grams)), 1),
                        6) >= 0.5
        """,
        # exact all-pairs jaccard across the new/old split; the LSH
        # join's recall at this corpus's similarity profile is 1 (true
        # pairs ~0.99 — pinned by tests/test_dedup_index.py's fixture-
        # property test), so LSH+verify == exact. The indexed variant
        # is output-identical by construction, hence the same oracle.
        "neardup_incremental": _INCREMENTAL_SQL,
        "neardup_incremental_indexed": _INCREMENTAL_SQL,
        "classifier_training_agg": """
            WITH grams AS (
              SELECT lang, substring(t, i, 3) AS gram
              FROM (SELECT lang, lower(substring(text, 1, 2000)) AS t
                    FROM documents) d,
                   LATERAL (SELECT unnest(generate_series(1, greatest(length(d.t) - 2, 0))) AS i)
            ), counted AS (
              SELECT lang, gram, count(*) AS cnt FROM grams GROUP BY lang, gram
            ), scored AS (
              -- logp over the FULL gram distribution, before the top-k cut
              SELECT lang, gram, cnt,
                     round(ln(cnt::DOUBLE / sum(cnt) OVER (PARTITION BY lang)), 6) AS logp
              FROM counted
            )
            SELECT lang, gram, cnt, logp, rk
            FROM (SELECT *, row_number() OVER (PARTITION BY lang
                                               ORDER BY cnt DESC, gram) AS rk
                  FROM scored)
            WHERE rk <= 200
        """,
        "doc_script_mix": _script_mix_sql(),
        "docs_keep_drop": _keep_drop_sql(),
        "docs_scrubbed": _scrub_sql(),
        "per_strategy_report": f"""
            SELECT strategy, lang, count(*) AS docs,
                   array_to_string(list_sort(list(doc_id))[1:5], ',')
                     AS sample_ids
            FROM (
              SELECT doc_id, lang,
                     CASE WHEN {_marker_case_sql()}
                          THEN 'heuristics' ELSE 'classifier' END AS strategy
              FROM documents
              WHERE regexp_matches(text, '(^| )(market|value)( |$)'))
            GROUP BY strategy, lang
        """,
        "hashed_gram_buckets": f"""
            WITH grams AS (
              SELECT lang, substring(t, i, 3) AS gram
              FROM (SELECT lang, lower(substring(text, 1, 2000)) AS t
                    FROM documents) d,
                   LATERAL (SELECT unnest(generate_series(1,
                            greatest(length(d.t) - 2, 0))) AS i)
            ), counted AS (
              SELECT lang,
                     (('0x' || substr(md5(gram), 1, 15))::UBIGINT
                      % {HASH_BUCKETS})::BIGINT AS bucket,
                     count(*) AS cnt
              FROM grams GROUP BY 1, 2
            )
            SELECT lang, bucket, cnt,
                   round(ln(cnt::DOUBLE
                            / sum(cnt) OVER (PARTITION BY lang)), 6) AS logp
            FROM counted
        """,
        "doc_perplexity": """
            WITH t AS (
              SELECT doc_id, lang, lower(substring(text, 1, 2000)) AS t
              FROM documents
            ), tri AS (
              SELECT doc_id, lang, substring(t, i, 3) AS g
              FROM t, LATERAL (SELECT unnest(generate_series(1,
                       greatest(length(t.t) - 2, 0))) AS i)
            ), model AS (
              SELECT lang, g, count(*) AS c3 FROM tri GROUP BY lang, g
            ), ctx AS (
              SELECT lang, substring(g, 1, 2) AS cx, sum(c3) AS c2
              FROM model GROUP BY lang, cx
            ), vocab AS (
              SELECT lang, count(DISTINCT substring(g, 3, 1)) AS v
              FROM model GROUP BY lang
            )
            SELECT tri.doc_id,
                   round(pow(10, -avg(log10((m.c3 + 0.1)
                                            / (c.c2 + 0.1 * v.v)))), 6) AS ppl
            FROM tri
            JOIN model m ON tri.lang = m.lang AND tri.g = m.g
            JOIN ctx c ON tri.lang = c.lang AND substring(tri.g, 1, 2) = c.cx
            JOIN vocab v ON tri.lang = v.lang
            GROUP BY tri.doc_id
        """,
        "embedding_topk": """
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[],
                         (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)),
                         6) AS cosine
            FROM embeddings
            ORDER BY cosine DESC, vec_id LIMIT 10
        """,
        "embedding_neardup": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]), 6) AS cosine
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                               b.embedding::DOUBLE[]), 6) > 0.45
        """,
        # --- frozen-expected oracles (tools/gen_expected.py): the three
        # non-SQL-expressible queries (blake2b simhash, NB classify, IVF
        # probe). Expected tables are computed from the pure-Python
        # specs INDEPENDENTLY of Spark, cross-checked at generation
        # time, and frozen at sf0.01 (the driver's correctness scale).
        "neardup_simhash_pairs": """
            SELECT id_a, id_b, hamming
            FROM read_parquet('/root/repo/data/expected_sf0.01/neardup_simhash_pairs.parquet')
        """,
        "langid_predict_documents": """
            SELECT doc_id, lang, lang_pred
            FROM read_parquet('/root/repo/data/expected_sf0.01/langid_predict_documents.parquet')
        """,
        "langid_unresolved": """
            SELECT doc_id, lang_pred, strategy
            FROM read_parquet('/root/repo/data/expected_sf0.01/langid_unresolved.parquet')
        """,
        "audio_media_features": """
            SELECT doc_id, sample_rate, n_samples, duration_ms,
                   rms, zero_cross_rate, peak
            FROM read_parquet('/root/repo/data/expected_sf0.01/audio_media_features.parquet')
        """,
        "langid_short_texts": """
            SELECT doc_id, lang, lang_pred, correct
            FROM read_parquet('/root/repo/data/expected_sf0.01/langid_short_texts.parquet')
        """,
        "langid_code_switch_spans": """
            SELECT doc_id, span_idx, span_start, span_len, span_letters,
                   script, lang, dominant_lang, dominant_share, mixed
            FROM read_parquet('/root/repo/data/expected_sf0.01/langid_code_switch_spans.parquet')
        """,
        "semantic_dedup_embeddings": """
            SELECT vec_id, cell, keep, dup_of, dup_cosine
            FROM read_parquet('/root/repo/data/expected_sf0.01/semantic_dedup_embeddings.parquet')
        """,
        "video_media_features": """
            SELECT doc_id, n_frames, width, height, fps, duration_ms,
                   mean_luma, motion
            FROM read_parquet('/root/repo/data/expected_sf0.01/video_media_features.parquet')
        """,
        "langid_noisy_texts": """
            SELECT doc_id, lang, variant, lang_pred, keep, drop_rule,
                   kept_mislabel
            FROM read_parquet('/root/repo/data/expected_sf0.01/langid_noisy_texts.parquet')
        """,
        "training_mix_sample": _training_mix_sql(),
        "source_rule_rollup": _source_rollup_sql(),
        "docs_line_deduped": _line_dedup_sql(),
        "docs_common_line_filtered": _common_line_sql(),
        "unresolved_disposition": """
            SELECT doc_id, lang_pred, keep, drop_rule, ppl_scored,
                   disposition, disposition_if_drop
            FROM read_parquet('/root/repo/data/expected_sf0.01/unresolved_disposition.parquet')
        """,
        "canonical_url_dedup": _canon_dedup_sql(),
        "decontaminate_documents": _decontaminate_sql(),
        "decontaminate_spans": _decontaminate_spans_sql(),
        "decontaminate_rewrite_docs": _decontaminate_rewrite_sql(),
        "embedding_ann_ivf": """
            SELECT vec_id, round(cosine_raw, 6) AS cosine
            FROM read_parquet('/root/repo/data/expected_sf0.01/embedding_ann_ivf.parquet')
        """,
        "doc_tokens": """
            SELECT doc_id, pos, kind, token
            FROM read_parquet('/root/repo/data/expected_sf0.01/doc_tokens.parquet')
        """,
        "embedding_knn_blocked": """
            SELECT vec_id, neighbor_id, cosine, rk
            FROM read_parquet('/root/repo/data/expected_sf0.01/embedding_knn_blocked.parquet')
        """,
        "doc_token_nb": """
            SELECT doc_id, lang, lang_pred
            FROM read_parquet('/root/repo/data/expected_sf0.01/doc_token_nb.parquet')
        """,
        "embedding_knn": """
            SELECT vec_id, neighbor_id, cosine, rk FROM (
              SELECT a.vec_id, b.vec_id AS neighbor_id,
                     round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                  b.embedding::DOUBLE[]), 6) AS cosine,
                     row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                             b.embedding::DOUBLE[]), 6) DESC,
                                b.vec_id) AS rk
              FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id)
            WHERE rk <= 3
        """,
        "embedding_label_centroids": """
            SELECT label, count(*) AS n,
                   round(avg(embedding[1]::DOUBLE), 6) AS c0,
                   round(avg(embedding[2]::DOUBLE), 6) AS c1,
                   round(avg(embedding[3]::DOUBLE), 6) AS c2,
                   round(avg(embedding[4]::DOUBLE), 6) AS c3,
                   round(avg(embedding[5]::DOUBLE), 6) AS c4,
                   round(avg(embedding[6]::DOUBLE), 6) AS c5,
                   round(avg(embedding[7]::DOUBLE), 6) AS c6,
                   round(avg(embedding[8]::DOUBLE), 6) AS c7
            FROM embeddings GROUP BY label
        """,
    }
