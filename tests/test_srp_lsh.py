"""SRP-LSH embedding near-dup: injected near-duplicates (tiny noise,
cosine ~0.999) must all be recovered; output is exactly the verified
cosine > threshold set (precision 1.0)."""

import numpy as np
from pyspark.sql import functions as F

from hyperpolyglot_spark.operators.similarity import srp_neardup_pairs

SF = "/root/testdata/sf0.01"


def test_srp_finds_injected_neardups(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    base = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.limit(40).collect()
    ]
    rng = np.random.Generator(np.random.PCG64(7))
    rows = []
    for vid, v in base:
        rows.append((vid, v))
        noisy = (np.array(v) + rng.normal(0, 0.002, len(v))).tolist()
        rows.append((vid + 100_000, noisy))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    pairs = srp_neardup_pairs(df, threshold=0.95, dim=64)
    got = {(r["id_a"], r["id_b"]): r["cosine"] for r in pairs.collect()}
    expected = {(vid, vid + 100_000) for vid, _ in base}
    assert expected <= set(got)
    for k in expected:
        assert got[k] > 0.99
    # precision: every reported pair really is above threshold (exact
    # numpy recomputation)
    vecs = {vid: np.array(v) for vid, v in rows}
    for (ia, ib), cos in got.items():
        va, vb = vecs[ia], vecs[ib]
        true = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        assert abs(true - cos) < 1e-5
        assert true > 0.95


def test_srp_no_false_pairs_on_spread_vectors(spark):
    # the real embeddings table has max pairwise cosine ~0.51: nothing
    # qualifies at 0.95
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assert srp_neardup_pairs(emb, threshold=0.95).count() == 0
