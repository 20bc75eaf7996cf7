"""Dataset-mixing operators: deterministic stratified sampling.

After language ID + quality filtering + dedup, a training-data
pipeline down-samples over-represented strata (the 10^12-document
crawl is mostly English) to hit a target language mix. At 100 TB the
sampler must be:

* **deterministic & resumable** — the same row gets the same decision
  on every run and every retry (no `rand()`: a recomputed partition
  would sample differently and break exactly-once outputs);
* **shuffle-free** — a map-side filter, never a per-stratum
  repartition or window;
* **oracle-able** — the decision must be expressible identically in
  another engine.

The decision: keep row iff the first 8 hex chars of
``md5(id || ':' || salt)`` are <= a per-stratum threshold string
``hex(rate * 0xffffffff)``. Fixed-length lowercase hex compares
lexicographically == numerically, so BOTH Spark and DuckDB evaluate
the identical predicate on strings — no engine-specific hash, no
hex->int conversion. The salt decouples this sampling decision from
every other hash in the pipeline (url-bucketing, dedup signatures):
re-salting draws an independent sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HASH_SPAN = 0xFFFFFFFF  # first 8 hex chars of the md5


def rate_threshold_hex(rate: float) -> str:
    """Per-stratum keep threshold as a fixed-width lowercase hex
    string; rate>=1 keeps everything. rate<=0 returns the EMPTY string
    (sorts before every hex hash in both engines), so a zero-rate
    stratum keeps nothing — with the old '00000000' threshold a row
    whose 8-hex prefix was exactly zero (p=2^-32) leaked through the
    <= comparison (ADVICE r6): ~hundreds of rows at 10^12-doc scale.
    Rates strictly between 0 and 1 are unchanged."""
    if rate <= 0.0:
        return ""
    r = min(rate, 1.0)
    return f"{int(r * HASH_SPAN):08x}"


def sample_hash_col(id_col: str, salt: str):
    """The 8-hex-char decision hash — shared spec with the SQL oracle:
    substr(md5(CAST(id AS STRING) || ':' || salt), 1, 8)."""
    return F.substring(
        F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))),
        1,
        8,
    )


def stratified_sample(
    df: DataFrame,
    spark: SparkSession,
    rates: dict[str, float],
    key_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix-v1",
    default_rate: float = 1.0,
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    ``rates`` maps stratum value -> keep rate; strata not listed use
    ``default_rate``. Plan shape: broadcast the (stratum, threshold)
    dim, one map-side equi-join, one string comparison — no shuffle of
    the corpus, no rand(), works identically on a re-run of any
    partition.
    """
    from ..session import local_rows_df

    dim = local_rows_df(
        spark,
        [(k, rate_threshold_hex(v)) for k, v in sorted(rates.items())],
        f"{key_col} string, _thr string",
    )
    out = df.join(F.broadcast(dim), key_col, "left")
    thr = F.coalesce(F.col("_thr"), F.lit(rate_threshold_hex(default_rate)))
    return (
        out.where(sample_hash_col(id_col, salt) <= thr)
        .drop("_thr")
    )


def stratified_sample_sql(
    rates: dict[str, float],
    table: str = "documents",
    key_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix-v1",
    default_rate: float = 1.0,
    columns: str = "doc_id, lang",
) -> str:
    """The identical decision as ANSI SQL (DuckDB oracle) — generated
    from the same rates table so the two engines can never drift."""
    values = ", ".join(
        f"('{k}', '{rate_threshold_hex(v)}')" for k, v in sorted(rates.items())
    )
    return f"""
        SELECT {columns}
        FROM {table} t
        LEFT JOIN (VALUES {values}) AS r({key_col}2, thr)
          ON t.{key_col} = r.{key_col}2
        WHERE substr(md5(CAST(t.{id_col} AS VARCHAR) || ':' || '{salt}'), 1, 8)
              <= coalesce(r.thr, '{rate_threshold_hex(default_rate)}')
    """
