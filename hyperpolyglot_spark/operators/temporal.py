"""Temporal joins Spark lacks as built-ins — as-of join, range join.

as-of join (each left row matched to the most recent right row with
right_ts <= left_ts, per key) is a named gap in Spark's operator set
(task brief; absent in the reference too, SURVEY §2.3). Implemented as
a composition of built-ins — union + window last(ignorenulls) — which
is the scale-correct shape: ONE shuffle of both sides by key, one
window pass, no range-explosion or per-key loops.

    left:  (key, ts, ...)        right: (key, ts, payload...)
    union (right sorts before left at equal ts, so ties match)
    -> window last(payload, ignorenulls) over
       (partition by key order by ts, side rows unbounded-preceding..0)
    -> keep left rows

Right side must be unique per (key, ts) — pre-dedupe if not (the
matching row would otherwise be sort-order-dependent; DuckDB's native
ASOF JOIN has the same ambiguity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    suffix: str = "_matched",
) -> DataFrame:
    """LEFT as-of join: every left row, plus the payload of the latest
    right row with right.ts <= left.ts for the same ``by`` key (NULLs
    when no prior right row exists)."""
    r = right.select(
        F.col(by),
        F.col(right_ts).alias("_ts"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_rp"),
        F.lit(0).alias("_side"),
    )
    l = left.withColumn("_ts", F.col(left_ts)).withColumn(
        "_side", F.lit(1)
    ).withColumn("_rp", F.lit(None).cast(r.schema["_rp"].dataType))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(by)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn("_m", F.last("_rp", ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == 1).drop("_ts", "_side", "_rp")
    for c in payload_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(f"_m.{c}"))
    return out.drop("_m")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    start_col: str,
    end_col: str,
    bucket_secs: int = 1800,
) -> DataFrame:
    """Point-in-interval RANGE join (left.ts BETWEEN right.start and
    right.end) without an equi key — the second temporal join Spark
    lacks (task brief).

    Naive Spark turns a pure range predicate into
    BroadcastNestedLoopJoin (O(|L|*|R|), only viable when one side is
    tiny). This uses interval bucketing instead: points get one time
    bucket, intervals EXPLODE into every bucket they touch, the join is
    a hash EQUI-join on bucket, and the exact range predicate filters
    the candidates. Each (point, interval) match is found exactly once
    (in the point's bucket), so no dedup pass is needed. Cost is
    O(|L| + |R| * avg_buckets_per_interval + matches); pick bucket_secs
    near the typical interval length so intervals touch ~2 buckets."""
    lb = left.withColumn(
        "_b", F.floor(F.unix_timestamp(F.col(left_ts)) / bucket_secs)
    )
    rb = (
        right.withColumn(
            "_bs", F.floor(F.unix_timestamp(F.col(start_col)) / bucket_secs)
        )
        .withColumn(
            "_be", F.floor(F.unix_timestamp(F.col(end_col)) / bucket_secs)
        )
        .withColumn("_b", F.explode(F.sequence("_bs", "_be")))
        .drop("_bs", "_be")
    )
    return (
        lb.join(rb, "_b")
        .filter(
            (F.col(left_ts) >= F.col(start_col))
            & (F.col(left_ts) <= F.col(end_col))
        )
        .drop("_b")
    )
