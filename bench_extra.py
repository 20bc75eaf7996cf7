#!/usr/bin/env python
"""Round-7 optimization harness (guide §1): per-query isolation.

NOT the driver bench — bench.py stays frozen. This file exists to
measure each declared query in isolation with the noop sink
(guide §1.4), labelled jobs (§1.5), cold-vs-warm split, and to dump
`.explain("formatted")` plans into plans/r07/.

Usage:
  python bench_extra.py                 # time all HEADLINE queries
  python bench_extra.py q5 doc_perplexity  # just these (prefix match)
  python bench_extra.py --plans before  # dump plans/r07/<q>_before.txt
  python bench_extra.py --reps 3        # warm reps (default 2)
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

sys.path.insert(0, REPO)

from bench import HEADLINE  # noqa: E402  (frozen list, read-only import)


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    plans_tag = None
    if "--plans" in sys.argv:
        plans_tag = sys.argv[sys.argv.index("--plans") + 1]
        args = [a for a in args if a != plans_tag]
    reps = 2
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
        args = [a for a in args if a != str(reps)]

    names = [
        n for n in HEADLINE
        if not args or any(n.startswith(a) for a in args)
    ]

    from hyperpolyglot_spark.session import get_spark

    spark = get_spark("bench_extra", cores=CPUS)

    import __spark_entry__ as entry_mod

    from hyperpolyglot_spark.functions.langid import (
        default_hashed_model,
        default_model,
    )
    from hyperpolyglot_spark.functions.perplexity import (
        default_ppl_model,
        ppl_thresholds_for,
    )
    from hyperpolyglot_spark.operators.dedup import pinned_scope

    # same pre-warm as bench.py so the timings are comparable
    default_model()
    default_hashed_model()
    ppl_thresholds_for(default_ppl_model())

    qs = entry_mod.queries()
    out = {}
    for name in names:
        sc = spark.sparkContext
        times = []
        for r in range(reps + 1):
            sc.setJobDescription(f"{name} rep{r}")
            t0 = time.perf_counter()
            with pinned_scope():
                _force(qs[name](spark, SF_DIR))
            times.append(round(time.perf_counter() - t0, 3))
        sc.setJobDescription(None)
        out[name] = {"cold": times[0], "warm": round(min(times[1:]), 3)}
        print(f"{name}: cold={times[0]} warm={out[name]['warm']} all={times}",
              flush=True)
        if plans_tag:
            os.makedirs(os.path.join(REPO, "plans", "r07"), exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                qs[name](spark, SF_DIR).explain("formatted")
            with open(
                os.path.join(REPO, "plans", "r07", f"{name}_{plans_tag}.txt"),
                "w",
            ) as f:
                f.write(buf.getvalue())
    total_warm = round(sum(v["warm"] for v in out.values()), 3)
    total_cold = round(sum(v["cold"] for v in out.values()), 3)
    print(json.dumps(
        {"total_cold": total_cold, "total_warm": total_warm, "n": len(out)}
    ))


if __name__ == "__main__":
    main()
