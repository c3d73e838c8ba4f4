"""Paired 80x/160x measurement for dd_span_removal (+ ex_curation_v2
cross-check) — the r12 verdict's 160x ask, missing row.

Protocol (SCALE.md): ONE session, alternating rungs, warm repeats
(min of N after a discarded first execution per rung), forcing
aggregate over the expensive output column (a .count() measures a
collapsed plan — left-join elimination prunes the span branch).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from unstract_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry  # noqa: E402


def force(df):
    cols = df.columns
    tgt = "cleaned_text" if "cleaned_text" in cols else cols[-1]
    if dict(df.dtypes).get(tgt) == "string":
        return df.agg(
            F.sum(F.length(tgt)).alias("s"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
    return df.agg(F.count(F.lit(1)).alias("n")).collect()[0]


def main() -> None:
    qname = sys.argv[1] if len(sys.argv) > 1 else "dd_span_removal"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    dirs = {"80x": "/tmp/sf_rung80", "160x": "/tmp/sf_rung160"}
    spark = get_spark("rung_pair")
    qs = entry.queries()
    fn = qs[qname]
    results = {k: [] for k in dirs}
    rows = {}
    # alternate rungs; first pass per rung is warmup (recorded but
    # excluded from the min)
    for i in range(reps + 1):
        for label, d in dirs.items():
            t0 = time.time()
            r = force(fn(spark, d))
            dt = time.time() - t0
            results[label].append(dt)
            rows[label] = tuple(r)
            spark.catalog.clearCache()
            print(f"pass {i} {label}: {dt:.1f}s {tuple(r)}", flush=True)
    for label in dirs:
        warm = results[label][1:]
        print(
            f"{qname} {label}: warm_min={min(warm):.1f}s "
            f"all={[round(x, 1) for x in results[label]]} out={rows[label]}"
        )


if __name__ == "__main__":
    main()
