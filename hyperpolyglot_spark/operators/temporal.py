"""Temporal joins Spark lacks as built-ins — as-of join.

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
