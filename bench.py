#!/usr/bin/env python
"""Benchmark harness.

Default: run the headline query suite + the pages quality-filter
pipeline at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], print ONE JSON line:
  {"metric": "pipeline_docs_per_sec", "value": N, "unit": "docs/sec",
   "queries": {...per-query sec...}, "sf": 0.1, ...}

--pipeline-only   time just the pages pipeline (used by --scaling)
--scaling         run the pipeline at local[8] and local[32] in fresh
                  JVMs on the SAME input and report throughput at both
                  plus scaling efficiency (the sandbox evidence for the
                  north rule's N -> 4N executor criterion); writes
                  BENCH.md
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "top2_orders_per_customer",
    "events_sessionization",
    "events_hourly",
    "lang_breakdown",
    "doc_token_stats",
    "classifier_training_agg",
    "exact_dedup_documents",
    "neardup_minhash_pairs",
    "embedding_topk",
    "embedding_neardup",
]


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.0


def _pages_rows(sf: float) -> int:
    return max(500, int(500_000 * sf))


def _pages_path(sf: float) -> str:
    return os.path.join(REPO, "data", f"pages_bench_{_pages_rows(sf)}")


def _force(df) -> int:
    """Force full execution without driver collect."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def ensure_pages(spark, sf: float) -> str:
    from hyperpolyglot_spark.datagen.pages import write_pages

    path = _pages_path(sf)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_pages(spark, path, _pages_rows(sf), partitions=max(CPUS * 2, 8))
    return path


def bench_pipeline(spark, sf: float) -> dict:
    from hyperpolyglot_spark.plans.pipeline import metrics, run_pipeline

    path = ensure_pages(spark, sf)
    pages = spark.read.parquet(path)
    n = pages.count()
    t0 = time.perf_counter()
    labels = run_pipeline(spark, pages)
    _force(labels)
    elapsed = time.perf_counter() - t0
    t1 = time.perf_counter()
    _force(metrics(run_pipeline(spark, pages)))
    metrics_elapsed = time.perf_counter() - t1
    return {
        "pages": n,
        "pipeline_sec": round(elapsed, 3),
        "docs_per_sec": round(n / elapsed, 1),
        "metrics_sec": round(metrics_elapsed, 3),
    }


def bench_queries(spark) -> dict[str, float]:
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    out = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        _force(qs[name](spark, SF_DIR))
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def make_spark(cpus: int):
    from hyperpolyglot_spark.session import get_spark

    return get_spark("bench", cores=cpus)


def main() -> None:
    sf = _sf_of(SF_DIR)
    if "--scaling" in sys.argv:
        return scaling_main(sf)
    spark = make_spark(CPUS)
    pipe = bench_pipeline(spark, sf)
    if "--pipeline-only" in sys.argv:
        print(json.dumps({"cpus": CPUS, "sf": sf, **pipe}))
        return
    queries = bench_queries(spark)
    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "pipeline_docs_per_sec",
                "value": pipe["docs_per_sec"],
                "unit": "docs/sec",
                "queries": queries,
                "sf": sf,
                "queries_total_sec": total,
                "pipeline": pipe,
                "cpus": CPUS,
            }
        )
    )


def scaling_main(sf: float) -> None:
    """Same pipeline job, same input, two parallelism levels in fresh
    JVMs — local[8] vs local[32] stands in for N vs 4N executors."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = str(cpus)
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--pipeline-only"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    tp8 = results[8]["docs_per_sec"]
    tp32 = results[32]["docs_per_sec"]
    eff = round((tp32 / tp8) / 4.0, 3)
    report = {
        "metric": "scaling_efficiency_8_to_32",
        "value": eff,
        "unit": "ratio",
        "docs_per_sec_8": tp8,
        "docs_per_sec_32": tp32,
        "sf": sf,
        "pages": results[32]["pages"],
    }
    print(json.dumps(report))
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(
            "# BENCH — measured throughput & scaling\n\n"
            f"Pages pipeline (extract + cascade langid + quality rules + "
            f"scrub) over {results[32]['pages']} synthetic pages "
            f"(sf={sf}), identical input, fresh JVM per run:\n\n"
            "| parallelism | wall sec | docs/sec |\n|---|---|---|\n"
            f"| local[8]  | {results[8]['pipeline_sec']} | {tp8} |\n"
            f"| local[32] | {results[32]['pipeline_sec']} | {tp32} |\n\n"
            f"**Scaling efficiency (8 -> 32 cores, the sandbox evidence "
            f"for N -> 4N executors): {eff}** (target >= 0.8, "
            "BASELINE.json).\n"
        )


if __name__ == "__main__":
    main()
