"""Paired A/B: generated-SQL PQ/IVFPQ scoring vs an ORACLE-EXACT pandas scan.

The existing pq_topk_pandas is recall-gated only (numpy blocked sums drift
in the last ulp). This variant reproduces the SQL path's float-op order
exactly:
- LUT entries: in-order accumulation over j (0 + q0*c0 + q1*c1 + ...) —
  each numpy elementwise op is one IEEE float64 op, same sequence as the
  JVM aggregate fold, so entries are bit-identical.
- adc: starts from the m=0 term and adds terms in ascending subspace
  order — the same sequence as _adc_expr.
- index codes / cells: argmax only (assignment-margin protected, the
  r13-measured ~4e-5 corpus gap), per-batch shortlist cut by
  (adc desc, id asc) — a superset of the global cut, exact.
Everything downstream (global window cut, exact-cosine re-rank on the
re-attached vectors) is unchanged JVM code.

Asserts full identity (exceptAll both ways) at the bench shape, then
ABAB x3 with the noop sink.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
from pyspark.sql import Window, functions as F

from unstract_spark.session import get_spark
from unstract_spark.queries import _t
from unstract_spark.operators import similarity as S


def _exact_luts(qv: np.ndarray, CB: list, d: int) -> list:
    """Per-subspace LUTs with the JVM fold's exact op order."""
    luts = []
    for m in range(len(CB)):
        sub = qv[m * d:(m + 1) * d]
        acc = np.zeros(CB[m].shape[0])
        for j in range(d):
            acc = acc + sub[j] * CB[m][:, j]
        luts.append(acc)
    return luts


def _batch_topk(adc: np.ndarray, ids: np.ndarray, per_shard: int):
    top = np.lexsort((ids, -adc))[:per_shard]
    return top


def pq_exact(queries, index, dim, k=10, n_sub=8, n_codes=16, refine=3,
             query_id="query_id", query_vec="query_vec",
             index_id="vec_id", index_vec="embedding"):
    spark = index.sparkSession
    cbs = S.pq_codebooks(dim, n_sub, n_codes)
    d = dim // n_sub
    q_rows = queries.select(query_id, query_vec).collect()
    qs = [(r[query_id], np.asarray(r[query_vec], dtype=np.float64))
          for r in q_rows]
    bc = spark.sparkContext.broadcast(
        (qs, [np.ascontiguousarray(cb) for cb in cbs]))
    per_shard = refine * k

    def score(batches):
        import pandas as pd
        Q, CB = bc.value
        if not Q:
            return
        luts = [_exact_luts(v, CB, d) for _, v in Q]   # n_q x n_sub arrays
        half = [0.5 * (CB[m] ** 2).sum(1) for m in range(n_sub)]
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(pdf[index_vec].tolist(), dtype=np.float64)
            ids = pdf[index_id].to_numpy()
            codes = [
                (X[:, m * d:(m + 1) * d] @ CB[m].T - half[m]).argmax(1)
                for m in range(n_sub)
            ]
            out_q, out_i, out_s = [], [], []
            for qi, (qid, _) in enumerate(Q):
                adc = luts[qi][0][codes[0]].copy()
                for m in range(1, n_sub):
                    adc += luts[qi][m][codes[m]]
                top = _batch_topk(adc, ids, per_shard)
                out_q.extend([qid] * len(top))
                out_i.extend(ids[top])
                out_s.extend(adc[top])
            yield pd.DataFrame({query_id: out_q, index_id: out_i,
                                "adc": out_s})

    id_t = index.schema[index_id].dataType.simpleString()
    qid_t = queries.schema[query_id].dataType.simpleString()
    cands = index.select(index_id, index_vec).mapInPandas(
        score, schema=f"`{query_id}` {qid_t}, `{index_id}` {id_t}, adc double")
    wa = Window.partitionBy(query_id).orderBy(
        F.col("adc").desc(), F.col(index_id).asc())
    shortlist = (cands.withColumn("arank", F.row_number().over(wa))
                 .filter(F.col("arank") <= per_shard)
                 .select(query_id, index_id))
    qb = F.broadcast(queries.select(F.col(query_id),
                                    F.col(query_vec).alias("_qv")))
    scored = (shortlist.join(
        index.select(F.col(index_id), F.col(index_vec).alias("_iv")),
        index_id).join(qb, query_id).select(
        query_id, index_id,
        F.round(S.cosine(F.col("_iv"), F.col("_qv")), 6).alias("score")))
    w = Window.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col(index_id).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k)


def ivfpq_exact(queries, index, dim, k=10, n_centroids=16, n_probe=3,
                n_sub=8, n_codes=16, refine=3,
                query_id="query_id", query_vec="query_vec",
                index_id="vec_id", index_vec="embedding"):
    spark = index.sparkSession
    cents = S._seeded_hyperplanes(dim, n_centroids, table=991)
    cbs = S.pq_codebooks(dim, n_sub, n_codes)
    d = dim // n_sub
    q_rows = queries.select(query_id, query_vec).collect()
    qs = [(r[query_id], np.asarray(r[query_vec], dtype=np.float64))
          for r in q_rows]
    bc = spark.sparkContext.broadcast(
        (qs, [np.ascontiguousarray(cb) for cb in cbs],
         np.ascontiguousarray(cents)))
    per_shard = refine * k

    def score(batches):
        import pandas as pd
        Q, CB, C = bc.value
        if not Q:
            return
        luts = [_exact_luts(v, CB, d) for _, v in Q]
        half = [0.5 * (CB[m] ** 2).sum(1) for m in range(n_sub)]
        # probed cells per query: top n_probe by (dot desc, cell asc)
        probes = []
        for _, v in Q:
            cs = C @ v
            probes.append(np.lexsort((np.arange(len(cs)), -cs))[:n_probe])
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(pdf[index_vec].tolist(), dtype=np.float64)
            ids = pdf[index_id].to_numpy()
            cells = (X @ C.T).argmax(1)
            codes = [
                (X[:, m * d:(m + 1) * d] @ CB[m].T - half[m]).argmax(1)
                for m in range(n_sub)
            ]
            out_q, out_i, out_s = [], [], []
            for qi, (qid, _) in enumerate(Q):
                mask = np.isin(cells, probes[qi])
                if not mask.any():
                    continue
                idx = np.nonzero(mask)[0]
                adc = luts[qi][0][codes[0][idx]].copy()
                for m in range(1, n_sub):
                    adc += luts[qi][m][codes[m][idx]]
                top = _batch_topk(adc, ids[idx], per_shard)
                sel = idx[top]
                out_q.extend([qid] * len(sel))
                out_i.extend(ids[sel])
                out_s.extend(adc[top])
            yield pd.DataFrame({query_id: out_q, index_id: out_i,
                                "adc": out_s})

    id_t = index.schema[index_id].dataType.simpleString()
    qid_t = queries.schema[query_id].dataType.simpleString()
    cands = index.select(index_id, index_vec).mapInPandas(
        score, schema=f"`{query_id}` {qid_t}, `{index_id}` {id_t}, adc double")
    wa = Window.partitionBy(query_id).orderBy(
        F.col("adc").desc(), F.col(index_id).asc())
    shortlist = (cands.withColumn("arank", F.row_number().over(wa))
                 .filter(F.col("arank") <= per_shard)
                 .select(query_id, index_id))
    qb = F.broadcast(queries.select(F.col(query_id),
                                    F.col(query_vec).alias("_qv")))
    scored = (shortlist.join(
        index.select(F.col(index_id), F.col(index_vec).alias("_iv")),
        index_id).join(qb, query_id).select(
        query_id, index_id,
        F.round(S.cosine(F.col("_iv"), F.col("_qv")), 6).alias("score")))
    w = Window.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col(index_id).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_pq_exact")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))

    sel = ["query_id", "vec_id", "score", "rank"]
    pairs = [
        ("pq",
         lambda: S.pq_topk_join(q, e, dim=64, k=10).select(sel),
         lambda: pq_exact(q, e, dim=64, k=10).select(sel)),
        ("ivfpq",
         lambda: S.ivfpq_topk_join(q, e, dim=64, k=10).select(sel),
         lambda: ivfpq_exact(q, e, dim=64, k=10).select(sel)),
    ]
    for name, cur, new in pairs:
        a, b = cur(), new()
        d1, d2 = a.exceptAll(b).count(), b.exceptAll(a).count()
        print(f"{name}: identity {d1}/{d2}", flush=True)
        assert d1 == 0 and d2 == 0

    for name, cur, new in pairs:
        spark.sparkContext.setJobDescription(f"ab:{name}")
        noop(cur()); noop(new())
        ta, tb = [], []
        for _ in range(3):
            t0 = time.time(); noop(cur()); ta.append(time.time() - t0)
            t0 = time.time(); noop(new()); tb.append(time.time() - t0)
        print(f"{name}: cur {[round(x,2) for x in ta]} med"
              f" {statistics.median(ta):.2f} | exact-pandas"
              f" {[round(x,2) for x in tb]} med {statistics.median(tb):.2f}",
              flush=True)


if __name__ == "__main__":
    main()
