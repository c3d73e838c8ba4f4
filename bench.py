"""Benchmark runner — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": <sf>}

Queries chosen to cover the engine's hot shapes: scan+agg, broadcast
join, shuffle join+agg, window top-k, dedup (hash + MinHash LSH),
similarity top-k, text analysis, mock-LLM extraction, event windows.
Each is timed around a full materialization (count) so exchange +
codegen + shuffle all execute; results stay on executors (no driver
collect cost in the measurement).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from unstract_spark import queries as Q  # noqa: E402
from unstract_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_volume",
    "j6_broadcast_lookup",
    "j5_left_join_usage",
    "j1_history_antijoin",
    "w1_topk_per_group",
    "w3_sessionize",
    "events_tumbling_window",
    "dd_exact_groups",
    "dd_minhash_neardup",
    "dd_simhash",
    "ta_quality_score",
    "ta_lang_id",
    "t9_extract_structured",
    "t16_classification",
    "t3_chunking",
    "sim_topk_bruteforce",
    "sim_rrf_fusion",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    # JVM warm-up, then per-query codegen warm-up at the smallest sf:
    # whole-stage codegen compiles per generated-code shape, which is
    # identical across scale factors, so a tiny warm run hits the same
    # code cache and the measured run reflects steady-state execution,
    # not JIT compilation.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm_dir = "/root/testdata/sf0.001"

    qs = Q.queries()
    timings: dict[str, float] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        if warm_dir != sf_dir:
            qs[name](spark, warm_dir).count()
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt

    print(
        json.dumps(
            {
                "metric": "operator_suite_wall_clock",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
