"""Capture .explain('formatted') for bench queries into plans/r14/<q>_<tag>.txt."""
import os, sys, io, contextlib
sys.path.insert(0, "/root/repo")
tag = sys.argv[1] if len(sys.argv) > 1 else "before"
only = sys.argv[2:]
import bench
from unstract_spark.session import get_spark
from unstract_spark import queries as Q

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("plan_capture")
qs = Q.queries()
names = only or bench.BENCH_QUERIES
for name in names:
    try:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(f"/root/repo/plans/r14/{name}_{tag}.txt", "w") as f:
            f.write(buf.getvalue())
        print("ok", name)
    except Exception as e:
        print("ERR", name, str(e)[:200])
