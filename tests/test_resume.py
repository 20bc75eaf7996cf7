"""Checkpoint/resume: kill-and-rerun must neither drop nor duplicate
documents, and must skip completed buckets (BASELINE.md resumability)."""

from hyperpolyglot_spark.datagen.pages import gen_pages_pdf
from hyperpolyglot_spark.plans.resume import (
    completed_buckets,
    run_with_resume,
)

N = 300
N_BUCKETS = 8


def _pages(spark):
    return spark.createDataFrame(gen_pages_pdf(N))


def test_resume_after_kill(spark, tmp_path):
    out_interrupted = str(tmp_path / "interrupted")
    out_oneshot = str(tmp_path / "oneshot")
    pages = _pages(spark)

    # simulated kill: only 1 of 4 groups completes
    n = run_with_resume(
        spark, pages, out_interrupted, n_buckets=N_BUCKETS, group_size=2,
        max_groups=1,
    )
    assert n == 1
    done = completed_buckets(spark, out_interrupted)
    assert len(done) == 2

    # resume: remaining groups only
    n2 = run_with_resume(
        spark, pages, out_interrupted, n_buckets=N_BUCKETS, group_size=2
    )
    assert n2 == 3
    assert len(completed_buckets(spark, out_interrupted)) == N_BUCKETS

    # third run: nothing left to do
    assert (
        run_with_resume(spark, pages, out_interrupted, n_buckets=N_BUCKETS)
        == 0
    )

    # uninterrupted baseline
    run_with_resume(spark, pages, out_oneshot, n_buckets=N_BUCKETS)

    a = (
        spark.read.parquet(f"{out_interrupted}/labels")
        .orderBy("url")
        .drop("bucket")
    )
    b = (
        spark.read.parquet(f"{out_oneshot}/labels")
        .orderBy("url")
        .drop("bucket")
    )
    rows_a = [r.asDict() for r in a.collect()]
    rows_b = [r.asDict() for r in b.collect()]
    assert len(rows_a) == N
    assert rows_a == rows_b  # identical output, no dups, no gaps

    # lineage metrics present for every bucket exactly once
    manifest = spark.read.parquet(f"{out_interrupted}/_manifest")
    rows = manifest.groupBy("bucket").count().collect()
    assert len(rows) == N_BUCKETS
    assert all(r["count"] == 1 for r in rows)
    assert manifest.groupBy().sum("docs").collect()[0][0] == N

    # dropped-by-rule columns reconcile per bucket: docs - kept equals
    # the sum of the per-rule drop counts (north rule: metrics rows
    # carry docs seen, kept, dropped-by-rule, scrub counts)
    from hyperpolyglot_spark.plans.resume import _DROP_COLS

    for r in manifest.collect():
        assert r["docs"] - r["kept"] == sum(r[c] for c in _DROP_COLS), (
            r["bucket"]
        )


def test_resume_converges_with_empty_buckets(spark, tmp_path):
    """More buckets than documents: empty buckets must still get a
    manifest row, or todo never drains (ADVICE round 1)."""
    out = str(tmp_path / "sparse")
    pages = _pages(spark).limit(5)
    n = run_with_resume(spark, pages, out, n_buckets=64, group_size=32)
    assert n == 2
    assert len(completed_buckets(spark, out)) == 64
    # converged: nothing left on rerun
    assert run_with_resume(spark, pages, out, n_buckets=64) == 0


def test_read_manifest_mixed_schema_dir(spark, tmp_path):
    """A resumed output dir can hold manifest files written by engine
    versions with different column sets (pre-r5 rows lack the
    unresolved_* audit columns). read_manifest must surface the UNION
    of columns with deterministic 0s for the missing values — never a
    schema that depends on which file's footer Spark sampled
    (r6 ADVICE)."""
    from hyperpolyglot_spark.plans.resume import (
        _UNRESOLVED_COLS,
        read_manifest,
    )

    out = str(tmp_path / "mixed")
    path = f"{out}/_manifest"
    # "old engine" rows: no unresolved_* columns
    spark.createDataFrame(
        [(0, 10, 8, 0, 0)],
        "bucket int, docs long, kept long, scrub_email long,"
        " scrub_toxicity long",
    ).write.mode("append").parquet(path)
    # "new engine" rows: with the audit columns
    spark.createDataFrame(
        [(1, 12, 9, 1, 0, 0, 2, 1)],
        "bucket int, docs long, kept long, scrub_email long,"
        " scrub_toxicity long, unresolved_kept long,"
        " unresolved_quarantined long, unresolved_dropped long",
    ).write.mode("append").parquet(path)

    m = read_manifest(spark, out)
    for c in _UNRESOLVED_COLS:
        assert c in m.columns
    rows = {r["bucket"]: r for r in m.collect()}
    assert len(rows) == 2
    # old row's missing audit columns read as 0, not null
    assert all(rows[0][c] == 0 for c in _UNRESOLVED_COLS)
    assert rows[1]["unresolved_quarantined"] == 2
    assert rows[1]["unresolved_dropped"] == 1
