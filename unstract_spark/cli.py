"""Command-line entry point — the spark-submit surface.

The reference drives extraction through its platform APIs; the engine
equivalent is one submittable module (works identically via
`python -m unstract_spark.cli ...` locally and
`spark-submit --py-files ... unstract_spark/cli.py ...` on a cluster,
where the active SparkSession is reused):

  list                               print every registry query name
  query   --name N --sf-dir D --out O [--limit K]
                                     run one registry query, write
                                     parquet, print a JSON summary
  extract --job J.json --out O       run an end-to-end extraction job
                                     (ExtractionJob fields as JSON),
                                     write results/ + usage/ parquet

Every command prints ONE JSON line on stdout so schedulers/cron can
parse outcomes (same contract as bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _spark():
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    from unstract_spark.session import get_spark

    return get_spark("unstract-cli")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="unstract_spark.cli")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list")

    q = sub.add_parser("query")
    q.add_argument("--name", required=True)
    q.add_argument("--sf-dir", required=True)
    q.add_argument("--out", required=True)
    q.add_argument("--limit", type=int, default=0)

    e = sub.add_parser("extract")
    e.add_argument("--job", required=True)
    e.add_argument("--out", required=True)

    args = p.parse_args(argv)

    if args.cmd == "list":
        from unstract_spark import queries as Q

        for name in Q.queries():
            print(name)
        return 0

    spark = _spark()
    if args.cmd == "query":
        from unstract_spark import queries as Q

        reg = Q.queries()
        if args.name not in reg:
            print(json.dumps({"error": f"unknown query {args.name!r}"}))
            return 2
        df = reg[args.name](spark, args.sf_dir)
        if args.limit:
            df = df.limit(args.limit)
        df.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(
            json.dumps(
                {"query": args.name, "rows": n, "out": args.out,
                 "columns": df.columns}
            )
        )
        return 0

    # extract
    with open(args.job) as f:
        spec = json.load(f)
    from unstract_spark.plans.pipeline import ExtractionJob, run_extraction

    job = ExtractionJob(**spec)
    out = run_extraction(spark, job)
    res_path = os.path.join(args.out, "results")
    use_path = os.path.join(args.out, "usage")
    out["results"].write.mode("overwrite").parquet(res_path)
    out["usage"].write.mode("overwrite").parquet(use_path)
    n_res = spark.read.parquet(res_path).count()
    n_use = spark.read.parquet(use_path).count()
    print(
        json.dumps(
            {"results": n_res, "usage": n_use, "out": args.out}
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
