"""Physical-plan quality gates — the .explain() audit as assertions.

These guard the properties that matter at 100 TB: filters reach the
parquet scan, column pruning holds, small dims broadcast, the pages
pipeline stays narrow with exactly one Python stage, and aggregations
are partial+final (no raw-row shuffles).
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from hyperpolyglot_spark.datagen.pages import gen_pages_pdf
from hyperpolyglot_spark.plans.pipeline import metrics, run_pipeline

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown_and_pruning(spark):
    plan = plan_of(entry_mod.q1_pricing_summary(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: projection must not read unused lineitem columns
    assert "l_partkey" not in plan and "l_suppkey" not in plan


def test_q3_broadcasts_customer_dim(spark):
    plan = plan_of(entry_mod.q3_shipping_priority(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters" in plan and "EqualTo(c_mktsegment,BUILDING)" in plan


def test_q5_broadcasts_small_dims(spark):
    plan = plan_of(entry_mod.q5_region_revenue(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3  # supplier, nation, region


def test_semi_anti_join_strategies(spark):
    semi = plan_of(entry_mod.orders_with_heavy_items(spark, SF))
    anti = plan_of(entry_mod.customers_without_orders(spark, SF))
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti
    # quantity filter pushed into the lineitem scan of the semi side
    assert "GreaterThan(l_quantity,49" in semi


def test_topk_uses_heap_not_global_sort(spark):
    plan = plan_of(entry_mod.top_suppliers(spark, SF))
    assert "TakeOrderedAndProject" in plan  # per-partition heap + merge


def test_pipeline_is_narrow_single_python_stage(spark):
    pages = spark.createDataFrame(gen_pages_pdf(50))
    labels = run_pipeline(spark, pages)
    plan = plan_of(labels)
    assert plan.count("ArrowEvalPython") == 1  # one fused python hop
    assert "Exchange" not in plan  # zero shuffles scan -> labels
    m = plan_of(metrics(labels))
    # the metrics agg shuffles only the aggregate, partial+final
    assert m.count("Exchange") == 1
    assert m.count("HashAggregate") >= 2


def test_pipeline_scan_column_pruned(spark, tmp_path):
    # from parquet (pruning is a scan feature): only url/warc_ts/html read
    path = str(tmp_path / "pp")
    spark.createDataFrame(gen_pages_pdf(50)).write.parquet(path)
    labels = run_pipeline(spark, spark.read.parquet(path))
    plan = plan_of(labels)
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "html" in read_schema and "url" in read_schema
    assert "text" not in read_schema and "lang" not in read_schema


def test_agg_is_partial_final(spark):
    plan = plan_of(entry_mod.lang_breakdown(spark, SF))
    # partial_count then final count around one exchange (map-side combine)
    assert plan.count("HashAggregate") >= 2
    assert "partial_count" in plan


def test_minhash_bucket_join_prunes_pairs(spark):
    """The LSH path must join on (band, bucket) — never a cross join."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from hyperpolyglot_spark.operators.dedup import lsh_candidate_pairs

    plan = plan_of(lsh_candidate_pairs(docs))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_doc_perplexity_broadcasts_model(spark):
    """In-query LM scoring joins model/ctx/vocab via broadcast — no
    sort-merge shuffle of the event stream, no cartesian."""
    plan = plan_of(entry_mod.doc_perplexity(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_neardup_expansion_is_equijoin_only(spark):
    """Pre-collapse + expansion adds joins; all must stay hash
    equi-joins (no cartesian / nested-loop anywhere)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from hyperpolyglot_spark.operators.dedup import (
        minhash_neardup_pairs,
        simhash_neardup_pairs,
    )

    for df in (minhash_neardup_pairs(docs), simhash_neardup_pairs(docs)):
        plan = plan_of(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_percent_of_total_has_no_global_window(spark):
    """pct queries use a broadcast scalar agg, not a partitionless
    window (which funnels rows through ONE partition)."""
    for q in ("lang_breakdown", "revenue_pct_by_returnflag"):
        plan = plan_of(entry_mod.queries()[q](spark, SF))
        assert "Window" not in plan, q
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_range_join_is_bucketed_equijoin(spark):
    """The range join must compile to a hash/sort-merge EQUI-join on
    the time bucket — never BroadcastNestedLoopJoin (the O(L*R) trap a
    raw range predicate produces)."""
    plan = plan_of(entry_mod.clicks_in_purchase_windows(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_indexed_incremental_join_plan(spark):
    """The persisted-index incremental dedup: no cartesian/BNLJ
    anywhere, and the old side's banded signatures come from a PARQUET
    SCAN of the index (never a re-signing ArrowEvalPython over df_old).
    (Short tempfile path: FileScan Location strings truncate at 100
    chars, so a long pytest tmp_path would hide 'idx/banded'.)"""
    import shutil
    import tempfile

    from hyperpolyglot_spark.operators.dedup import (
        minhash_neardup_join_indexed,
        save_dedup_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    old = docs.filter(F.col("doc_id") < 250)
    new = docs.filter(F.col("doc_id") >= 250)
    root = tempfile.mkdtemp(prefix="hpidx-")
    try:
        idx = f"{root}/idx"
        save_dedup_index(spark, old, idx)
        out = minhash_neardup_join_indexed(spark, new, idx, old, threshold=0.5)
        plan = plan_of(out)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "idx/banded" in plan  # the index scan feeds the bucket join
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_hashed_gram_buckets_hashes_distinct_grams_only(spark):
    """Two-phase gram aggregation: the md5 bucketing must sit ABOVE the
    first (lang, gram) aggregate — i.e. run once per distinct group —
    never in the projection under it (once per occurrence). At corpus
    scale distinct grams plateau while occurrences grow linearly, so
    the hash cost per document must amortize to zero."""
    # the checkpoint boundary hides the aggregation subtree from the
    # final query's plan, so assert it on the exposed pre-checkpoint
    # builder: two partial/final aggregation PAIRS — (lang, gram) then
    # (lang, bucket). Expression strings truncate in toString, so the
    # aggregate structure is the reliable discriminator.
    pre = plan_of(entry_mod._hashed_gram_counts(spark, SF))
    assert pre.count("HashAggregate") >= 4
    # two AGGREGATION shuffles at most ((lang, gram) then (lang,
    # bucket)); the r07 _spread round-robin exchange (scan-parallelism
    # fix for the single-row-group testdata files) is not an
    # aggregation shuffle, so count hashpartitioning exchanges only
    assert pre.count("Exchange hashpartitioning") <= 2
    # per-lang totals come from a BROADCAST hash join on the bounded
    # checkpointed table — never an unbounded-frame sum window (the
    # classifier_training_agg round-3 regression shape): parallelism
    # bounded by #langs and a second sort of every lang partition
    plan = plan_of(entry_mod.hashed_gram_buckets(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "Window [" not in plan


def test_classifier_training_agg_plan_shape(spark):
    """Round-4 rewrite assertion: per-lang totals come from a BROADCAST
    hash join (not an unbounded-frame sum window, which blocked the
    rank-limit pushdown and re-sorted every lang partition), and the
    top-200 filter is pushed below the exchange as partial+final
    WindowGroupLimit — at scale only ~200 rows per language cross the
    wire instead of every distinct (lang, gram)."""
    import __spark_entry__ as entry

    df = entry.queries()["classifier_training_agg"](
        spark, "/root/testdata/sf0.01"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan
    assert plan.count("Window [") == 1  # only the rank window remains


def test_training_mix_sample_is_shuffle_free(spark):
    """The mixing sampler must be a map-side filter: broadcast of the
    rates dim only — no Exchange hashpartitioning of the corpus, no
    rand()/nondeterministic expressions (determinism is what makes the
    sample retry-safe at scale)."""
    import __spark_entry__ as entry

    plan = plan_of(entry.queries()["training_mix_sample"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "rand(" not in plan


def test_source_rule_rollup_is_partial_final(spark):
    """One hash aggregation with map-side combine: exactly one shuffle,
    partial+final HashAggregate pair, no Python in the agg itself (the
    ladder columns are JVM expressions)."""
    import __spark_entry__ as entry

    plan = plan_of(entry.queries()["source_rule_rollup"](spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("HashAggregate") >= 2
