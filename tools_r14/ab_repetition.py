"""Paired A/B: grouped (r13) vs per-row run-length (r14) repetition_features.

Inlines the r13 grouped spelling, asserts identical results against the
shipped per-row spelling at sf0.1, then times both with (a) the bench's
.count() action and (b) the noop sink (guide §1.4 — count() prunes the
b/l run computation in the per-row spelling, noop forces every column).
ABAB interleaved, median of 3 per arm.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from unstract_spark.session import get_spark
from unstract_spark.operators.text_analysis import repetition_features
from unstract_spark.queries import _t


def old_repetition(docs, text_col="text", id_col="doc_id"):
    t = F.col(text_col)
    base = docs.select(
        F.col(id_col),
        F.split(F.trim(t), "\\s+").alias("ws"),
        F.split(t, "\n").alias("ls"),
        F.length(F.regexp_replace(t, "\\s", "")).cast("long").alias("n_word_chars"),
    )
    words_arr = F.filter(F.col("ws"), lambda w: w != "")
    bigram_arr = F.when(
        F.size("ws") >= 2,
        F.transform(
            F.slice("ws", 1, F.greatest(F.size("ws") - 1, F.lit(1))),
            lambda x, i: F.concat_ws(" ", x, F.element_at("ws", i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    lines_arr = F.filter(F.col("ls"), lambda l: l != "")
    tag = lambda arr, kind: F.transform(  # noqa: E731
        arr, lambda g: F.struct(F.lit(kind).alias("kind"), g.alias("gram"))
    )
    items = base.select(
        F.col(id_col),
        F.col("n_word_chars"),
        F.length(F.concat_ws(" ", "ws")).cast("long").alias("n_chars"),
        F.explode(
            F.concat(tag(words_arr, "w"), tag(bigram_arr, "b"), tag(lines_arr, "l"))
        ).alias("it"),
    ).select(
        id_col, "n_word_chars", "n_chars", F.col("it.kind").alias("kind"),
        F.col("it.gram").alias("g"),
    )
    counts = items.groupBy(id_col, "n_word_chars", "n_chars", "kind", "g").agg(
        F.count("*").alias("c")
    )
    _PACK = 2147483648
    w = F.col("kind") == "w"
    b = F.col("kind") == "b"
    ln = F.col("kind") == "l"
    stats = counts.groupBy(id_col, "n_word_chars", "n_chars").agg(
        F.sum(F.when(w, F.col("c"))).alias("n_words"),
        F.count(F.when(w, F.lit(1))).alias("n_distinct"),
        (F.max(F.when(w, F.col("c") * _PACK + F.length("g") * F.col("c"))) % _PACK).alias("w_cov"),
        (F.max(F.when(b, F.col("c") * _PACK + F.length("g") * F.col("c"))) % _PACK).alias("b_cov"),
        F.sum(F.when(ln, F.col("c"))).alias("n_lines"),
        F.sum(F.when(ln, F.lit(1))).alias("n_distinct_lines"),
    )
    return stats.filter(F.col("n_words").isNotNull()).select(
        F.col(id_col),
        F.col("n_words"),
        F.round(F.col("w_cov") / F.greatest(F.col("n_word_chars"), F.lit(1)), 6).alias("top_word_char_frac"),
        F.round(
            F.coalesce(F.col("b_cov"), F.lit(0)) / F.greatest(F.col("n_chars"), F.lit(1)), 6
        ).alias("top_bigram_char_frac"),
        F.round(
            (F.col("n_words") - F.col("n_distinct")) / F.greatest(F.col("n_words"), F.lit(1)), 6
        ).alias("dup_word_frac"),
        F.round(
            F.coalesce(
                (F.col("n_lines") - F.col("n_distinct_lines")) / F.greatest(F.col("n_lines"), F.lit(1)),
                F.lit(0.0),
            ),
            6,
        ).alias("dup_line_frac"),
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_repetition")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = _t(spark, sf_dir, "documents")

    # identity gate: same rows, same values
    new_df = repetition_features(docs)
    old_df = old_repetition(docs)
    n_new = new_df.count()
    n_old = old_df.count()
    diff = new_df.exceptAll(old_df).count() + old_df.exceptAll(new_df).count()
    print(f"rows new={n_new} old={n_old} symdiff={diff}", flush=True)
    assert n_new == n_old and diff == 0, "RESULTS DIFFER"

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    arms = {"old_count": lambda: old_repetition(docs).count(),
            "new_count": lambda: repetition_features(docs).count(),
            "old_noop": lambda: noop(old_repetition(docs)),
            "new_noop": lambda: noop(repetition_features(docs))}
    times = {k: [] for k in arms}
    for k, f in arms.items():  # warm each arm once
        f()
    for _ in range(3):
        for k, f in arms.items():
            spark.sparkContext.setJobDescription(f"ab:{k}")
            t0 = time.time()
            f()
            times[k].append(round(time.time() - t0, 3))
    for k, v in times.items():
        print(f"{k:10s} median={statistics.median(v):.3f} runs={v}", flush=True)


if __name__ == "__main__":
    main()
