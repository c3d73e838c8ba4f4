"""J4/R1-R8 — retrieval: top-k similarity + strategy reshapes.

Reference: `query_index` does top-k cosine with a doc_id equality filter
and score>0 cutoff (sdk1/index.py:65-131, TOP_K=5); strategies live in
workers/executor/executors/retrievers/ (simple/subquestion/fusion/
recursive/router/keyword_table/automerging).

Spark-first: retrieval is a *join*, not a service call —
  score  = cosine(chunk.embedding, query.embedding)   (zip_with/aggregate)
  top-k  = row_number() over (partition by query order by score desc) <= k
For corpus-scale cross-retrieval the bucketed-LSH path in similarity.py
replaces the broadcast-cosine; both produce the same output shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

RRF_K = 60  # reciprocal-rank-fusion constant (reference fusion.py uses llama-index default)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns, JVM-side.

    Inputs are cast to array<double> BEFORE multiplication so every
    engine (and the SQL oracle) accumulates identical doubles —
    float32 intermediate products would diverge in the last bits.
    """
    ad = a.cast("array<double>")
    bd = b.cast("array<double>")
    dot = F.aggregate(F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(ad, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(bd, F.lit(0.0), lambda s, x: s + x * x))
    return dot / (na * nb)


def query_vector_lit(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def topk_by_query_vector(
    index: DataFrame,
    query_vec: list[float],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_score: float | None = 0.0,
) -> DataFrame:
    """R1 'simple': top-k rows by cosine to one query vector.

    Single-vector case: the query is a literal broadcast to every task;
    ranking is a global TakeOrdered (no full sort). score>0 cutoff
    mirrors sdk1/index.py:118-124.
    """
    scored = index.select(
        F.col(id_col), F.round(cosine(F.col(vec_col), query_vector_lit(query_vec)), 6).alias("score")
    )
    if min_score is not None:
        scored = scored.filter(F.col("score") > min_score)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def topk_join(
    queries: DataFrame,
    index: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    index_id: str = "vec_id",
    index_vec: str = "embedding",
    min_score: float | None = None,
) -> DataFrame:
    """Batch top-k similarity join: every query row gets its k nearest.

    Shape: broadcast(queries) x index -> score -> window per query.
    The window partitions by query_id so ranking shuffles on the query
    key only. Use when |queries| is small (per-prompt retrieval); for
    query sets at corpus scale use similarity.lsh_topk_join.
    """
    q = F.broadcast(queries.select(F.col(query_id), F.col(query_vec).alias("_qv")))
    scored = q.crossJoin(index.select(F.col(index_id), F.col(index_vec).alias("_iv"))).select(
        query_id,
        index_id,
        F.round(cosine(F.col("_iv"), F.col("_qv")), 6).alias("score"),
    )
    if min_score is not None:
        scored = scored.filter(F.col("score") > min_score)
    w = Window.partitionBy(query_id).orderBy(F.col("score").desc(), F.col(index_id).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 5,
    id_col: str = "vec_id",
    rank_col: str = "rank",
) -> DataFrame:
    """R3 'fusion': reciprocal-rank fusion of N ranked retrievals.

    score = sum over rankings of 1/(60 + rank); final top-k re-rank.
    (reference: retrievers/fusion.py:12-104 — 3 retrievers x 4 query
    variations, fused the same way.)
    """
    unioned = rankings[0].select(id_col, rank_col)
    for r in rankings[1:]:
        unioned = unioned.unionByName(r.select(id_col, rank_col))
    fused = unioned.groupBy(id_col).agg(
        F.round(F.sum(1.0 / (F.lit(RRF_K) + F.col(rank_col))), 6).alias("rrf_score")
    )
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    return fused.withColumn("fused_rank", F.row_number().over(w)).filter(
        F.col("fused_rank") <= k
    )


def keyword_table_retrieve(
    docs: DataFrame,
    keywords: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """R6 'keyword_table': inverted-index retrieval.

    explode(words) -> semi-join against the keyword set -> docs ranked by
    distinct keyword hits. The inverted index is the explode+groupBy —
    at scale it is materialized once and reused across queries.
    """
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), "\\s+")).alias("word"),
    )
    kw = F.array(*[F.lit(w.lower()) for w in keywords])
    hits = (
        words.filter(F.array_contains(kw, F.col("word")))
        .groupBy(id_col)
        .agg(F.count_distinct("word").alias("kw_hits"))
    )
    w = Window.orderBy(F.col("kw_hits").desc(), F.col(id_col).asc())
    return hits.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def subquestion_retrieve(
    subqueries: DataFrame,
    index: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    index_id: str = "vec_id",
    index_vec: str = "embedding",
) -> DataFrame:
    """R2 'subquestion': union of per-subquestion retrievals, deduped.

    The LLM decomposition happens upstream (llm.py); here the relational
    part: explode sub-questions -> topk_join -> collect distinct chunks.
    """
    per_sub = topk_join(
        subqueries, index, k=k, query_id=query_id, query_vec=query_vec,
        index_id=index_id, index_vec=index_vec,
    )
    return per_sub.select(index_id).distinct()
