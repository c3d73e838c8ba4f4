"""Paired A/B: candidate-set cosine with dim unroll vs fold, on the
candidate-scale rows (ivf/lsh topk, embedding neardup). Alternating
order per round to cancel load ramp."""
import os, statistics, sys, time

sys.path.insert(0, "/root/repo")
from unstract_spark.session import get_spark
from unstract_spark import queries as Q
from unstract_spark.operators import retrieval
import unstract_spark.operators.similarity as sim
import unstract_spark.operators.dedup as dd

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab13c")
spark.range(1_000_000).selectExpr("sum(id)").collect()
qs = Q.queries()

orig_cosine = retrieval.cosine
def fold_cosine(a, b, dim=None):
    return orig_cosine(a, b, dim=None)

def run(name, patched):
    sim.cosine = fold_cosine if patched else orig_cosine
    t0 = time.time(); qs[name](spark, sf_dir).count(); dt = time.time() - t0
    sim.cosine = orig_cosine
    return dt

for name in ["sim_ivf_topk", "sim_lsh_topk", "dd_embedding_neardup_lsh"]:
    run(name, False); run(name, True)  # warm both
    cur, fold = [], []
    for i in range(4):
        if i % 2 == 0:
            cur.append(run(name, False)); fold.append(run(name, True))
        else:
            fold.append(run(name, True)); cur.append(run(name, False))
    print(f"{name}: dim-unroll median {statistics.median(cur):.2f} {sorted(cur)} "
          f"fold median {statistics.median(fold):.2f} {sorted(fold)}", flush=True)
