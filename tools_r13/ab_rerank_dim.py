"""Paired A/B: shortlist re-rank cosine with dim unroll (current) vs
higher-order fold (dim=None), on sq8/pq/brute rows. BABA order to
cancel load ramp."""
import os, statistics, sys, time

sys.path.insert(0, "/root/repo")
from unstract_spark.session import get_spark
from unstract_spark import queries as Q
from unstract_spark.operators import retrieval

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab13b")
spark.range(1_000_000).selectExpr("sum(id)").collect()
qs = Q.queries()

orig_cosine = retrieval.cosine
def fold_cosine(a, b, dim=None):
    return orig_cosine(a, b, dim=None)

import unstract_spark.operators.similarity as sim

def run(name, patched):
    sim.cosine = fold_cosine if patched else orig_cosine
    t0 = time.time(); qs[name](spark, sf_dir).count(); return time.time() - t0

for name in ["sim_sq8_topk", "sim_pq_topk", "sim_mips_topk"]:
    run(name, False); run(name, True)  # warm both
    cur, fold = [], []
    for i in range(4):
        if i % 2 == 0:
            cur.append(run(name, False)); fold.append(run(name, True))
        else:
            fold.append(run(name, True)); cur.append(run(name, False))
    print(f"{name}: dim-unroll median {statistics.median(cur):.2f} {sorted(cur)} "
          f"fold median {statistics.median(fold):.2f} {sorted(fold)}", flush=True)
sim.cosine = orig_cosine
