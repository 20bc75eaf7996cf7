"""Checkpoint-resumable pipeline runs with per-partition lineage.

North rule: runs must be resumable from checkpoint with per-partition
lineage + metrics. Mechanism (SURVEY.md §7.1.8 — no Structured
Streaming needed for a batch corpus):

  - the corpus is bucketed by pmod(xxhash64(url), n_buckets) — a pure
    function of the data, so bucket membership is stable across runs,
    executors, and cluster sizes (the Iceberg-partition analog);
  - buckets are processed in groups; each group is ONE Spark write job
    into output partition dirs (partitionBy("bucket"), dynamic
    partition overwrite -> idempotent: re-writing a bucket replaces it
    byte-for-byte, never duplicates);
  - after each group commits, a lineage row per bucket (bucket, docs,
    kept, group metrics) is appended to the _manifest table;
  - on startup the manifest is read and completed buckets are skipped —
    the scan never reads them again (pushed-down bucket filter).

A killed run resumes by re-running the same command: output equals a
single uninterrupted run exactly (tests/test_resume.py asserts this).
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.quality import RULES_WITH_PPL
from .pipeline import DEFAULT_UNRESOLVED_POLICY, run_pipeline

MANIFEST_DIR = "_manifest"
LABELS_DIR = "labels"

# dropped-by-rule manifest columns, one per ladder rule (north rule:
# metrics rows carry docs seen, kept, DROPPED-BY-RULE, scrub counts)
_DROP_COLS = tuple(f"drop_{rule_id}" for rule_id, _, _, _ in RULES_WITH_PPL)
# unresolved-language stratum audit columns (explicit policy, r5)
_UNRESOLVED_COLS = (
    "unresolved_kept",
    "unresolved_quarantined",
    "unresolved_dropped",
)


def bucket_col(url_col: str = "url", n_buckets: int = 32):
    return F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_buckets)).cast("int")


def completed_buckets(spark: SparkSession, out_dir: str) -> set[int]:
    """Probe the manifest through Spark's reader (works on any Hadoop
    filesystem — HDFS/S3/local — unlike a driver-local os.path check)."""
    path = os.path.join(out_dir, MANIFEST_DIR)
    try:
        # mergeSchema: manifest rows appended by different engine
        # versions may carry different metric columns (e.g. the
        # drop_* widening); schema is the union, never one sampled
        # footer, so resumes across upgrades stay correct
        rows = (
            spark.read.option("mergeSchema", "true")
            .parquet(path)
            .select("bucket")
            .distinct()
            .collect()
        )
    except AnalysisException:  # path does not exist yet -> fresh run
        return set()
    # any OTHER error (permissions, corrupt footer, transient FS) must
    # propagate: swallowing it would silently restart the whole run and
    # append duplicate manifest rows (ADVICE r2)
    return {r["bucket"] for r in rows}


def run_with_resume(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_buckets: int = 32,
    group_size: int = 8,
    max_groups: int | None = None,
    model=None,
    unresolved_policy: str = DEFAULT_UNRESOLVED_POLICY,
) -> int:
    """Run the pipeline bucket-group by bucket-group, committing a
    manifest row per completed bucket. Returns #groups processed this
    invocation. ``max_groups`` exists so tests can simulate a kill.

    ``unresolved_policy`` routes the NULL-lang stratum (see the policy
    note in plans/pipeline.py); the lineage manifest carries the
    stratum's disposition per bucket (unresolved_kept /
    unresolved_quarantined / unresolved_dropped) so a 10^12-doc run
    can audit what the policy did without re-scanning the labels."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    done = completed_buckets(spark, out_dir)
    todo = [b for b in range(n_buckets) if b not in done]
    groups = [
        todo[i : i + group_size] for i in range(0, len(todo), group_size)
    ]
    if max_groups is not None:
        groups = groups[:max_groups]

    labels_path = os.path.join(out_dir, LABELS_DIR)
    manifest_path = os.path.join(out_dir, MANIFEST_DIR)

    for group in groups:
        src = pages.withColumn("bucket", bucket_col(n_buckets=n_buckets))
        src = src.filter(F.col("bucket").isin(group))
        labels = run_pipeline(
            spark,
            src.drop("bucket"),
            model=model,
            unresolved_policy=unresolved_policy,
        )
        labels = labels.withColumn("bucket", bucket_col(n_buckets=n_buckets))
        # idempotent per-partition write: dynamic overwrite replaces
        # exactly the bucket= dirs this group touches
        labels.write.mode("overwrite").partitionBy("bucket").parquet(
            labels_path
        )
        # lineage + metrics rows, appended only after the data commit.
        # Every bucket in the group gets a row — including empty buckets
        # (which wrote no partition dir): an absent row would keep the
        # bucket in `todo` forever and the run would never converge.
        # slim local frame (r07): the default createDataFrame path
        # costs one Python-runner round trip per default-parallelism
        # slice on every evaluation
        from ..session import local_rows_df

        group_df = local_rows_df(
            spark, [(int(b),) for b in group], "bucket int", slices=1
        )
        try:
            agg = (
                spark.read.option("mergeSchema", "true").parquet(labels_path)
                .filter(F.col("bucket").isin(group))
                .groupBy("bucket")
                .agg(
                    F.count("*").alias("docs"),
                    F.sum(F.col("keep").cast("long")).alias("kept"),
                    F.sum(F.coalesce("scrub_email", F.lit(0))).alias(
                        "scrub_email"
                    ),
                    F.sum(F.coalesce("scrub_toxicity", F.lit(0))).alias(
                        "scrub_toxicity"
                    ),
                    *(
                        F.sum(
                            (F.col("drop_rule") == rule_id).cast("long")
                        ).alias(f"drop_{rule_id}")
                        for rule_id, _, _, _ in RULES_WITH_PPL
                    ),
                    # unresolved-stratum disposition (audit columns for
                    # the explicit policy; older outputs without the
                    # disposition column fall back to keep/lang_pred)
                    *(
                        F.sum(
                            (
                                F.col("lang_pred").isNull()
                                & (F.col("disposition") == d)
                            ).cast("long")
                        ).alias(f"unresolved_{d}")
                        for d in ("kept", "quarantined", "dropped")
                    ),
                )
            )
            lineage = group_df.join(agg, "bucket", "left")
        except AnalysisException:  # no labels written yet (all-empty group)
            lineage = group_df.select(
                "bucket",
                *(
                    F.lit(None).cast("long").alias(c)
                    for c in ("docs", "kept", "scrub_email", "scrub_toxicity")
                    + _DROP_COLS
                    + _UNRESOLVED_COLS
                ),
            )
        lineage = lineage.na.fill(
            0,
            [
                "docs",
                "kept",
                "scrub_email",
                "scrub_toxicity",
                *_DROP_COLS,
                *_UNRESOLVED_COLS,
            ],
        )
        lineage.write.mode("append").parquet(manifest_path)
    return len(groups)


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    """Canonical audit read of the lineage manifest. The manifest is
    append-only across engine versions, so a resumed output dir can
    legitimately hold files with different schemas (e.g. pre-r5 rows
    lack the unresolved_* columns). A plain ``spark.read.parquet``
    samples ONE file's footer for the schema — which columns you see
    would then depend on which file Spark picked (r6 ADVICE). This
    helper always merges schemas (union of all footers) and fills the
    numeric audit columns with 0 for rows written before the column
    existed, so audits over mixed-version dirs are deterministic."""
    df = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(out_dir, MANIFEST_DIR)
    )
    fillable = [
        c
        for c in ("docs", "kept", "scrub_email", "scrub_toxicity")
        + _DROP_COLS
        + _UNRESOLVED_COLS
        if c in df.columns
    ]
    return df.na.fill(0, fillable)
