"""Similarity search over embedding columns (array<float>).

  - brute-force cosine top-k: pure built-ins (zip_with + aggregate dot
    product) — the exactness baseline; one narrow pass + a tiny top-k.
  - IVF (inverted-file) ANN: deterministic coarse centroids, vectors
    assigned to nearest centroid (one vectorized numpy pandas UDF);
    queries probe the n_probe nearest cells only. At 10^12 vectors the
    probe prunes the scan to cells' partitions (cluster-prunable scan);
    here the cell assignment is a column, so the filter is pushed down
    when the table is written partitioned by cell.
  - embedding cosine near-dup pairs: blocked self-join + cosine > t.

All float math is forced to double before any arithmetic so results are
reproducible and DuckDB-oracle-comparable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_to_query_col(vec: Column, query: list[float]) -> Column:
    """cosine(vec, constant query) — JVM-side, no UDF."""
    q = [float(x) for x in query]
    qn = float(np.sqrt(sum(x * x for x in q)))
    qcol = F.array(*[F.lit(x) for x in q])
    v = _as_double(vec)
    denom = norm_col(v) * F.lit(qn)
    return F.when(denom > 0, dot_col(v, qcol) / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine. orderBy+limit compiles to TakeOrderedAndProject
    — per-partition heap + tiny driver merge, no full sort shuffle."""
    sim = cosine_to_query_col(F.col(vec_col), query)
    return (
        df.select(F.col(id_col), F.round(sim, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
) -> DataFrame:
    """Pairs with cosine > threshold within a blocking key (exact
    within-block; at scale the block is an IVF cell or LSH bucket).

    Blocked path (r6): one numpy matmul per block via applyInPandas —
    the pair self-join form evaluated an interpreted array-aggregate
    lambda PER PAIR (measured 7.9s vs ~1s at sf0.1, same lesson as
    knn_join_blocked/semantic_dedup); the grouped kernel shuffles each
    row once and emits only qualifying pairs. Output is identical:
    id_a < id_b, round-6 cosine, strict >. The unblocked form keeps
    the column-expression pair join — it is the DuckDB-oracle-able
    exact baseline (quadratic, test scale only)."""
    if block_col:
        out_schema = "id_a long, id_b long, cosine double"

        def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
            ids = pdf[id_col].to_numpy()
            order = np.argsort(ids)
            ids = ids[order]
            V = np.array(
                pdf[vec_col].to_numpy()[order].tolist(), dtype=np.float64
            )
            Vn = V / np.maximum(
                np.linalg.norm(V, axis=1, keepdims=True), 1e-12
            )
            S = np.round(Vn @ Vn.T, 6)
            iu, ju = np.triu_indices(len(ids), k=1)  # ids sorted: i<j
            hit = S[iu, ju] > threshold
            return pd.DataFrame(
                {
                    "id_a": ids[iu[hit]],
                    "id_b": ids[ju[hit]],
                    "cosine": S[iu[hit], ju[hit]],
                }
            )

        return (
            df.select(F.col(id_col), _as_double(F.col(vec_col)).alias(vec_col), block_col)
            .groupBy(block_col)
            .applyInPandas(pairs, out_schema)
        )
    side = df.select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("v"),
    ).withColumn("n", norm_col(F.col("v")))
    a, b = side.alias("a"), side.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    sim = dot_col(F.col("a.v"), F.col("b.v")) / (F.col("a.n") * F.col("b.n"))
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(sim, 6).alias("cosine"),
        )
        .filter(F.col("cosine") > threshold)
    )


def knn_join(
    df: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """Top-k nearest neighbors (cosine) for EVERY vector — the KNN
    self-join behind near-dup thresholding and clustering prep.

    Unblocked = the exact all-pairs baseline (oracle-able; quadratic —
    test scale only), built from column expressions so DuckDB can
    reproduce it. At corpus scale pass a blocking column (an IVF cell
    from assign_cells_multi, or an SRP bucket): each block computes a
    vectorized per-cell top-k with ONE numpy matmul per group
    (applyInPandas) and emits only k rows per (vector, cell) — the
    shuffle after blocking is output-sized, never candidate-sized.
    A vector's global top-k over the union of its cells is contained
    in the union of its per-cell top-k under the same total order
    (round-6 cosine desc, neighbor id asc), so the grouped kernel is
    EXACTLY equal to the pair-join form (tests assert)."""
    if block_col:
        return _knn_join_blocked(df, k, id_col, vec_col, block_col)
    side = df.select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("v"),
    ).withColumn("n", norm_col(F.col("v")))
    a, b = side.alias("a"), side.alias("b")
    cond = F.col(f"a.{id_col}") != F.col(f"b.{id_col}")
    sim = dot_col(F.col("a.v"), F.col("b.v")) / (F.col("a.n") * F.col("b.n"))
    pairs = a.join(b, cond).select(
        F.col(f"a.{id_col}").alias(id_col),
        F.col(f"b.{id_col}").alias("neighbor_id"),
        F.round(sim, 6).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.desc("cosine"), "neighbor_id"
    )
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "neighbor_id", "cosine", "rk")
    )


def _knn_join_blocked(
    df: DataFrame, k: int, id_col: str, vec_col: str, block_col: str
) -> DataFrame:
    """Blocked KNN: per-cell exact top-k via one numpy matmul per
    group, then a tiny global top-k over the per-cell winners. The
    interpreted per-pair dot product of the naive join form was the
    entire cost at bench scale (33.7s -> ~2s at sf0.1)."""
    from pyspark.sql import Window

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def cell_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)  # columns ascend by id ->
        # a STABLE sort on -cosine breaks round-6 ties by id exactly
        # like the pair-join's ORDER BY cosine DESC, neighbor_id
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        m = len(ids)
        top = min(k, m - 1)
        if top <= 0:
            return pd.DataFrame(
                {id_col: [], "neighbor_id": [], "cosine": []}
            ).astype({id_col: "int64", "neighbor_id": "int64", "cosine": "float64"})
        V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        S = np.round(Vn @ Vn.T, 6)
        np.fill_diagonal(S, -np.inf)  # exclude self
        order = np.argsort(-S, axis=1, kind="stable")[:, :top]
        return pd.DataFrame(
            {
                id_col: np.repeat(ids, top),
                "neighbor_id": ids[order].ravel(),
                "cosine": np.take_along_axis(S, order, axis=1).ravel(),
            }
        )

    per_cell = (
        df.select(F.col(id_col), F.col(vec_col), F.col(block_col))
        .groupBy(block_col)
        .applyInPandas(cell_topk, schema=out_schema)
        # multi-probe assignment emits a pair once per shared cell
        .dropDuplicates([id_col, "neighbor_id"])
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("cosine"), "neighbor_id")
    return (
        per_cell.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "neighbor_id", "cosine", "rk")
    )


def assign_cells_multi(
    df: DataFrame,
    centroids: np.ndarray,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe cell assignment: one row per (vector, cell) for the
    vector's n_probe nearest centroids. The standard recall fix for
    blocked KNN — boundary vectors appear in the neighboring cell too,
    at n_probe x storage/candidate cost."""
    Cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def cells_udf(vecs: pd.Series) -> pd.Series:
        V = np.array(vecs.tolist(), dtype=np.float64)
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        sims = Vn @ Cn.T
        top = np.argsort(-sims, axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(top))

    return df.withColumn("cell", F.explode(cells_udf(F.col(vec_col))))


# ----------------------------------------------------------------------
# IVF ANN
# ----------------------------------------------------------------------

def srp_signature_udf(dim: int, n_bits: int = 64, seed: int = 97):
    """Sign-random-projection (SRP) LSH signature: sign bits of V @ R
    packed into one int64. P[bit differs] = angle/pi, so near-identical
    vectors (cosine ~1) land at hamming ~0 — the scale path for
    embedding near-dup at high thresholds, where exact blocking is too
    coarse. Hyperplanes are seeded PCG64 — identical on every executor."""
    rng = np.random.Generator(np.random.PCG64(seed))
    R = rng.standard_normal((dim, n_bits))
    powers = (np.uint64(1) << np.arange(n_bits, dtype=np.uint64))

    @F.pandas_udf(T.LongType())
    def srp(vecs: pd.Series) -> pd.Series:
        V = np.array(vecs.tolist(), dtype=np.float64)
        bits = (V @ R) > 0
        vals = (bits.astype(np.uint64) * powers).sum(axis=1, dtype=np.uint64)
        return pd.Series(vals.astype(np.int64))

    return srp


def srp_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    max_hamming: int = 8,
) -> DataFrame:
    """Embedding near-dup at high cosine thresholds: SRP signature ->
    16-bit-band blocking -> hamming prefilter -> EXACT cosine verify.
    Precision 1.0 by construction; recall follows the SRP hamming
    distribution (cosine 0.95 -> expected hamming ~6/64, well inside
    the band+hamming gate)."""
    sig = df.select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("v"),
        srp_signature_udf(dim)(F.col(vec_col)).alias("sim"),
    ).withColumn("n", norm_col(F.col("v")))
    banded = sig.select(
        id_col,
        "sim",
        "v",
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("sim"), i * 16)
                        .bitwiseAND(F.lit(65535))
                        .alias("chunk"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "sim", "v", "n", "bb.band", "bb.chunk")
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(
            F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim")))
            <= max_hamming
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.v").alias("va"),
            F.col("a.n").alias("na"),
            F.col("b.v").alias("vb"),
            F.col("b.n").alias("nb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sim = dot_col(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return cands.select(
        "id_a", "id_b", F.round(sim, 6).alias("cosine")
    ).filter(F.col("cosine") > threshold)


def ivf_centroids(
    df: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iters: int = 1,
) -> np.ndarray:
    """Deterministic coarse centroids: ``n_iters`` k-means refinement
    passes (each ONE Spark aggregation over the corpus) over seeds taken
    as the n_cells lowest ids (tiny collect: centroids are dim * n_cells
    floats — dimension-table sized). One pass is enough for the fixture
    corpus; raise n_iters at real scale for tighter cells."""
    seeds = (
        df.orderBy(id_col)
        .limit(n_cells)
        .select(_as_double(F.col(vec_col)).alias("v"))
        .collect()
    )
    C = np.array([r["v"] for r in seeds], dtype=np.float64)
    for _ in range(n_iters):
        assigned = assign_cells(df, C, id_col, vec_col)
        sums = (
            assigned.groupBy("cell")
            .agg(
                F.array(
                    *[
                        F.sum(F.element_at(_as_double(F.col(vec_col)), i + 1))
                        for i in range(C.shape[1])
                    ]
                ).alias("s"),
                F.count("*").alias("c"),
            )
            .collect()
        )
        C2 = C.copy()
        for r in sums:
            C2[r["cell"]] = np.array(r["s"], dtype=np.float64) / r["c"]
        C = C2
    return C


def assign_cells(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid (cosine) cell per vector — one vectorized numpy
    pandas UDF, matrix-multiply per Arrow batch."""
    Cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )

    @F.pandas_udf(T.IntegerType())
    def cell_udf(vecs: pd.Series) -> pd.Series:
        V = np.array(vecs.tolist(), dtype=np.float64)
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(Vn @ Cn.T, axis=1).astype(np.int32))

    return df.withColumn("cell", cell_udf(F.col(vec_col)))


def _probe_cells(centroids: np.ndarray, query: list[float], n_probe: int) -> list[int]:
    q = np.array(query, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    Cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )
    return np.argsort(-(Cn @ qn))[:n_probe].tolist()


def ivf_topk(
    df: DataFrame,
    centroids: np.ndarray,
    query: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: probe the n_probe cells nearest to the query, exact top-k
    within them. The cell filter prunes the scan (partition pruning when
    the index table is stored partitioned by cell — see
    build_ivf_index/ivf_topk_indexed)."""
    probe = _probe_cells(centroids, query, n_probe)
    assigned = assign_cells(df, centroids, id_col, vec_col)
    pruned = assigned.filter(F.col("cell").isin(probe))
    return brute_force_topk(pruned, query, k, id_col, vec_col)


def build_ivf_index(
    df: DataFrame,
    path: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Materialize the IVF index: vectors written PARTITIONED BY cell,
    centroids alongside. At 10^12 vectors this is the layout that turns
    a probe into a partition-pruned scan (only n_probe/n_cells of the
    data is ever read)."""
    C = ivf_centroids(df, n_cells, id_col, vec_col)
    assigned = assign_cells(df, C, id_col, vec_col)
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        f"{path}/index"
    )
    spark = df.sparkSession
    from ..session import local_rows_df

    local_rows_df(
        spark,
        [(i, [float(x) for x in C[i]]) for i in range(len(C))],
        "cell int, centroid array<double>",
        slices=1,
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    return C


def ivf_topk_indexed(
    spark,
    path: str,
    query: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search the materialized index: the cell IN-filter lands in the
    scan's PartitionFilters, so non-probed cells are never read."""
    cents = spark.read.parquet(f"{path}/centroids").collect()
    C = np.zeros((len(cents), len(cents[0]["centroid"])))
    for r in cents:
        C[r["cell"]] = r["centroid"]
    probe = _probe_cells(C, query, n_probe)
    idx = spark.read.parquet(f"{path}/index").filter(
        F.col("cell").isin(probe)
    )
    return brute_force_topk(idx, query, k, id_col, vec_col)
