"""Text-analysis operators for training-data pipelines.

Language-ID (stopword heuristic), quality scoring, token counting,
document fingerprinting. All pure Column expressions — whole-stage
codegen, zero Python, embarrassingly parallel (no shuffle): the shape
that processes 100 TB at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny deterministic stopword sets per language. Word-boundary regexes are
# kept RE2/Java-compatible so the SQL oracle computes the identical score.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "to"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "que", "los", "una", "las"],
}


def _marker_count(text: Column, words: list[str]) -> Column:
    # \b boundaries are zero-width, so consecutive stopwords all count
    # (a consuming "(^| )...( |$)" group would eat the separating space)
    rx = "\\b(" + "|".join(words) + ")\\b"
    return F.regexp_count(F.lower(text), F.lit(rx))


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language-ID: arg-max of per-language marker-word hits.

    'und' (undetermined) when nothing matches. greatest()-based argmax
    keeps it a single projection.
    """
    scores = {lang: _marker_count(F.col(text_col), ws) for lang, ws in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    # argmax with deterministic tie-break: alphabetical, first max wins
    pred = F.lit(None).cast("string")
    for lang in sorted(scores):
        pred = F.when(pred.isNotNull(), pred).when(
            (scores[lang] == best) & (best > 0), F.lit(lang)
        )
    pred = F.coalesce(pred, F.lit("und"))
    return docs.select(
        F.col(id_col),
        *[scores[lang].alias(f"hits_{lang}") for lang in sorted(scores)],
        pred.alias("pred_lang"),
    )


def token_count_ws(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    return F.when(F.length(F.trim(text)) == 0, 0).otherwise(
        F.size(F.split(F.trim(text), "\\s+"))
    )


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish token estimate: runs of letters, digits, or single symbols.

    The regex `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]` approximates a byte-pair
    tokenizer's word/number/punct splits well enough for budget
    accounting (the reference estimates tokens as bytes/1.3 —
    tools/classifier/src/main.py token-budget truncation).
    """
    return F.regexp_count(text, F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))


def quality_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document quality features + composite score in [0, 1].

    Features follow the standard web-corpus filters: length, mean word
    length, punctuation density, digit density, stopword density.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count_ws(t)
    n_punct = F.regexp_count(t, F.lit("[.,;:!?]"))
    n_digit = F.regexp_count(t, F.lit("[0-9]"))
    n_stop = _marker_count(t, LANG_MARKERS["en"])
    mean_word_len = (n_chars / F.greatest(n_tokens, F.lit(1))).cast("double")
    punct_ratio = (n_punct / F.greatest(n_chars, F.lit(1))).cast("double")
    digit_ratio = (n_digit / F.greatest(n_chars, F.lit(1))).cast("double")
    stop_ratio = (n_stop / F.greatest(n_tokens, F.lit(1))).cast("double")
    length_ok = F.when((n_chars >= 50) & (n_chars <= 100000), 1.0).otherwise(0.0)
    word_len_ok = F.when((mean_word_len >= 2.0) & (mean_word_len <= 12.0), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio <= 0.2, 1.0).otherwise(0.0)
    digit_ok = F.when(digit_ratio <= 0.3, 1.0).otherwise(0.0)
    score = (length_ok + word_len_ok + punct_ok + digit_ok) / F.lit(4.0)
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(digit_ratio, 4).alias("digit_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        score.alias("quality_score"),
    )


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """The published Gopher document-quality rules (Rae et al. 2021,
    arXiv:2112.11446 Table A1 — public) as one codegen projection:

    - word count within [min_words, max_words]
    - mean word length in [3, 10]
    - symbol-to-word ratio (# or ...) <= 0.1
    - <= 90% of lines start with a bullet, <= 30% end with ellipsis
    - >= 80% of words contain an alphabetic character
    - >= 2 distinct Gopher stopwords present

    Emits each raw feature plus the pass/fail verdict so downstream
    filters can re-threshold without recomputing. Zero shuffles, zero
    Python — this runs at scan speed over 100 TB.
    """
    t = F.col(text_col)
    n_words = token_count_ws(t)
    # word chars = non-whitespace chars; mean word length over that
    n_word_chars = F.length(F.regexp_replace(t, "\\s", ""))
    mean_wlen = (n_word_chars / F.greatest(n_words, F.lit(1))).cast("double")
    n_symbols = F.regexp_count(t, F.lit("#|\\.\\.\\.")).cast("long")
    sym_ratio = (n_symbols / F.greatest(n_words, F.lit(1))).cast("double")
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(lines, lambda x: x.rlike("^\\s*([-*•])")))
    n_ellip = F.size(F.filter(lines, lambda x: x.rlike("\\.\\.\\.\\s*$")))
    bullet_ratio = (n_bullet / F.greatest(n_lines, F.lit(1))).cast("double")
    ellipsis_ratio = (n_ellip / F.greatest(n_lines, F.lit(1))).cast("double")
    words = F.split(F.trim(t), "\\s+")
    n_alpha_words = F.size(F.filter(words, lambda x: x.rlike("[A-Za-z]")))
    alpha_ratio = (n_alpha_words / F.greatest(n_words, F.lit(1))).cast("double")
    n_stop = F.lit(0)
    for w in GOPHER_STOPWORDS:
        n_stop = n_stop + F.when(t.rlike("\\b" + w + "\\b"), 1).otherwise(0)
    passes = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_wlen >= 3.0)
        & (mean_wlen <= 10.0)
        & (sym_ratio <= 0.1)
        & (bullet_ratio <= 0.9)
        & (ellipsis_ratio <= 0.3)
        & (alpha_ratio >= 0.8)
        & (n_stop >= 2)
    )
    return docs.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        F.round(sym_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_ratio, 6).alias("bullet_ratio"),
        F.round(ellipsis_ratio, 6).alias("ellipsis_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_word_ratio"),
        n_stop.cast("long").alias("n_stopwords"),
        passes.cast("int").alias("gopher_pass"),
    )


def repetition_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher repetition filters (Rae et al. 2021 Table A1): fraction
    of content covered by the most frequent word / word-bigram, plus
    duplicate word- and line-occurrence fractions.

    Shape: ZERO exchanges (r14 optimization round). Every statistic is
    a function of one document's own gram multiset, and each document
    is one input row — so the former explode -> groupBy(doc, kind,
    gram) -> per-doc rollup (two shuffles whose first exchange carried
    every distinct gram STRING as a grouping key) is computed per row
    instead: sort each gram array and reduce its runs with array
    higher-order functions (guide §1.2 first-principles / §2.4 remove
    shuffles outright). Identical arithmetic: a run of the sorted
    array IS a (gram, count) group, and the per-kind aggregates below
    reproduce the old sum/count/packed-max exactly.
    """
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

    # arg-max packs (count, coverage) into ONE long, exactly as the
    # grouped spelling did: pack = c * 2^31 + length(g) * c
    # = c * (2^31 + length(g)); cov < 2^31 (chars per document), so
    # max(pack) % 2^31 is the coverage of the lexicographic (c, cov)
    # max and the gram string cannot change the emitted value on ties.
    _PACK = 2147483648  # 2^31

    def _bind(col, f):
        # let-binding: evaluate `col` once, reference it many times
        # (the similarity-family idiom — nested lambdas defeat CSE)
        return F.element_at(F.transform(F.array(col), f), 1)

    def _run_stats(arr):
        # (n_total, n_distinct, max_pack) over the string array's runs
        def over_sorted(s):
            starts = F.when(
                F.size(s) == 0, F.array().cast("array<int>")
            ).otherwise(
                F.filter(
                    F.sequence(F.lit(1), F.size(s)),
                    lambda i: (i == 1)
                    | (
                        F.element_at(s, i)
                        != F.element_at(s, F.greatest(i - 1, F.lit(1)))
                    ),
                )
            )

            def over_starts(st):
                packs = F.transform(
                    st,
                    lambda p, j: (
                        F.coalesce(F.try_element_at(st, j + 2), F.size(s) + 1) - p
                    ).cast("long")
                    * (
                        F.lit(_PACK)
                        + F.length(F.element_at(s, p)).cast("long")
                    ),
                )
                return F.struct(
                    F.size(s).cast("long").alias("n"),
                    F.size(st).cast("long").alias("nd"),
                    F.array_max(packs).alias("mx"),
                )

            return _bind(starts, over_starts)

        return _bind(F.sort_array(arr), over_sorted)

    stats = base.select(
        F.col(id_col),
        F.col("n_word_chars"),
        F.length(F.concat_ws(" ", "ws")).cast("long").alias("n_chars"),
        _run_stats(words_arr).alias("w"),
        _run_stats(bigram_arr).alias("b"),
        _run_stats(lines_arr).alias("l"),
    )
    # Row-presence parity with the grouped spelling: a document emits
    # a row iff it had >= 1 word; an empty bigram array yields null
    # b.mx (array_max of empty) exactly where the grouped max was
    # null, and zero lines yields (0-0)/1 = 0.0, the value the old
    # null-coalesce produced.
    return stats.filter(F.col("w.n") > 0).select(
        F.col(id_col),
        F.col("w.n").alias("n_words"),
        F.round(
            (F.col("w.mx") % _PACK) / F.greatest(F.col("n_word_chars"), F.lit(1)),
            6,
        ).alias("top_word_char_frac"),
        F.round(
            F.coalesce(F.col("b.mx") % _PACK, F.lit(0))
            / F.greatest(F.col("n_chars"), F.lit(1)),
            6,
        ).alias("top_bigram_char_frac"),
        F.round(
            (F.col("w.n") - F.col("w.nd")) / F.greatest(F.col("w.n"), F.lit(1)),
            6,
        ).alias("dup_word_frac"),
        F.round(
            F.coalesce(
                (F.col("l.n") - F.col("l.nd"))
                / F.greatest(F.col("l.n"), F.lit(1)),
                F.lit(0.0),
            ),
            6,
        ).alias("dup_line_frac"),
    )


PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_IPV4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
PII_PHONE = "\\+[0-9][0-9 -]{7,}[0-9]"


def pii_redact(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII scrubbing for corpus prep: emails, IPv4 literals and
    international-format phone numbers replaced with typed tags, with
    per-document match counts for audit.

    Patterns are deliberately RE2-and-Java-compatible (no lookaround,
    no \\d shorthand divergence) and applied in a fixed order
    (email -> ip -> phone) so the result is engine-independent — the
    SQL oracle replays the identical sequence. Pure projection: scan
    speed, no shuffle.
    """
    t = F.col(text_col)
    r1 = F.regexp_replace(t, PII_EMAIL, "[EMAIL]")
    r2 = F.regexp_replace(r1, PII_IPV4, "[IP]")
    r3 = F.regexp_replace(r2, PII_PHONE, "[PHONE]")
    return docs.select(
        F.col(id_col),
        F.regexp_count(t, F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(r1, F.lit(PII_IPV4)).cast("long").alias("n_ips"),
        F.regexp_count(r2, F.lit(PII_PHONE)).cast("long").alias("n_phones"),
        r3.alias("redacted"),
        F.md5(r3).alias("redacted_md5"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: exact sha, normalized md5, prefix hash.

    The prefix hash (first 64 normalized chars) is a cheap rolling-hash
    stand-in that catches boilerplate-prefix duplicates.
    """
    t = F.col(text_col)
    norm = F.trim(F.regexp_replace(F.regexp_replace(F.lower(t), "[^a-z0-9 ]", ""), " +", " "))
    return docs.select(
        F.col(id_col),
        F.sha2(t, 256).alias("sha_exact"),
        F.md5(norm).alias("md5_norm"),
        F.md5(F.substring(norm, 1, 64)).alias("prefix_hash"),
    )


def unigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    model: DataFrame | None = None,
    oov_logprob: float | None = None,
    include_empty: bool = True,
) -> DataFrame:
    """Per-document mean unigram log-probability — the fluency/
    perplexity proxy corpus filters threshold on (CCNet, Wenzek et al.
    2020, scores documents with an LM and keeps the fluent tail; the
    unigram LM is the in-container stand-in with the same pipeline
    shape: model table join + per-doc weighted mean).

    `model` is a (word, p) frame; None trains on the corpus itself
    (p = count/total over whitespace words — every in-corpus word has
    mass, no smoothing needed). Shape: one explode + (doc, word, tf)
    groupBy, the model join is a word-keyed equi-join (the model is
    vocabulary-sized, not corpus-sized), weighted mean in the decimal
    domain so partial-aggregation order can't wiggle the last bits.

    OOV contract for external models: `oov_logprob` is the per-word
    log-prob penalty assigned to words the model doesn't know (the
    CCNet-style behavior — gibberish should score WORSE, not be
    silently dropped); with the default None, unknown words are
    excluded from both the mean and n_words (score-what-you-know),
    which is safe for the self-trained case where OOV cannot occur.

    Output: (id, n_words, avg_logprob) — avg_logprob NULL for empty
    docs (no words to score), rounded to 6.

    `include_empty=False` skips the left-join back to `docs` that
    restores zero-word rows: every emitted row then has n_words >= 1.
    Callers that filter `n_words > 0` anyway (the CCNet bucketing
    path) save a corpus-keyed join whose probe side re-executes the
    scan (r13, guide §2.4).
    """
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    tf = words.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("tf"))
    if model is None:
        wc = tf.groupBy("word").agg(F.sum("tf").alias("wc"))
        totals = tf.agg(F.sum("tf").alias("total"))
        model = wc.crossJoin(F.broadcast(totals)).select(
            "word", (F.col("wc") / F.col("total")).alias("p")
        )
    if oov_logprob is None:
        joined = tf.join(model, "word")
        lp = F.log("p")
    else:
        joined = tf.join(model, "word", "left")
        lp = F.coalesce(F.log("p"), F.lit(float(oov_logprob)))
    scored = joined.groupBy(id_col).agg(
        F.sum("tf").alias("n_words"),
        F.round(
            F.sum((F.col("tf") * lp).cast("decimal(28,10)"))
            .cast("double")
            / F.sum("tf"),
            6,
        ).alias("avg_logprob"),
    )
    if not include_empty:
        return scored.select(id_col, "n_words", "avg_logprob")
    return docs.select(id_col).join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_words", F.lit(0)).alias("n_words"),
        F.col("avg_logprob"),
    )


def normalize_text(text: Column) -> Column:
    """Corpus text normalization, all JVM-side codegen: lowercase,
    strip C0 and C1 control chars (incl. DEL and U+0080-009F) and zero-width code points, squash
    whitespace runs to single spaces, trim. The standard pre-dedup /
    pre-tokenize cleanup; patterns are RE2-and-Java compatible (the
    PII-redaction discipline) so the SQL twin matches byte-for-byte.
    Unicode NFC is deliberately NOT here: it needs ICU (a Python
    stage), and the corpus ops that depend on byte equality (exact
    dedup, fingerprints) must see exactly what this produced."""
    t = F.lower(text)
    t = F.regexp_replace(t, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f]", "")
    t = F.regexp_replace(t, "[\\u200b\\u200c\\u200d\\ufeff]", "")
    t = F.regexp_replace(t, "\\s+", " ")
    return F.trim(t)


def compression_ratio(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """(id, raw_len, compressed_len, ratio): zlib compressibility as a
    gibberish/boilerplate signal — random noise compresses near 1.0,
    templated spam far below typical prose (corpus filters cut both
    tails). Arrow-batched Python because the scorer IS zlib; rows-only
    evidence (no SQL twin for DEFLATE) — pytest pins the semantics."""
    from collections.abc import Iterator

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            ids, rl, cl, ratio = [], [], [], []
            for rid, t in zip(pdf[id_col], pdf[text_col]):
                b = (t or "").encode("utf-8")
                c = len(zlib.compress(b, level)) if b else 0
                ids.append(rid)
                rl.append(len(b))
                cl.append(c)
                ratio.append(round(c / len(b), 6) if b else None)
            yield pd.DataFrame(
                {id_col: ids, "raw_len": rl, "compressed_len": cl,
                 "ratio": ratio}
            )

    id_t = docs.schema[id_col].dataType.simpleString()
    return docs.select(id_col, text_col).mapInPandas(
        run,
        schema=f"`{id_col}` {id_t}, raw_len long, compressed_len long,"
        " ratio double",
    )


def simpson_diversity(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document vocabulary diversity: Simpson's index (the
    Hunter–Gaston unbiased form) D = sum(c_i*(c_i-1)) / (n*(n-1)) over
    whitespace-token counts — 0 = every token distinct, 1 = one token
    repeated. A cheap repetitiveness signal complementary to the Gopher
    repetition features: entirely INTEGER-domain until one final
    division, so the value is bit-portable to any SQL engine.

    Shape: explode -> per-(doc, token) count -> per-doc sum — two
    hash aggregations on uniform keys, no window, no Python.
    """
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    counts = words.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("c"))
    per = counts.groupBy(id_col).agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab"),
        F.sum(F.col("c") * (F.col("c") - 1)).alias("rep_pairs"),
    )
    d = (
        F.when(
            F.col("n_tokens") >= 2,
            F.round(
                F.col("rep_pairs")
                / (F.col("n_tokens") * (F.col("n_tokens") - F.lit(1))),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .cast("double")
    )
    return docs.select(F.col(id_col)).join(per, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("vocab", F.lit(0)).alias("vocab"),
        F.coalesce(d, F.lit(0.0)).alias("simpson_index"),
    )


def zipf_fit(
    docs: DataFrame,
    text_col: str = "text",
    top_n: int = 200,
    min_len: int = 1,
) -> DataFrame:
    """Corpus Zipf fit: least-squares slope of ln(freq) on ln(rank)
    over the top `top_n` terms — the standard corpus-health diagnostic
    (natural text ~ -1; templated/boilerplate corpora flatten, spam
    steepens). One output row: n_terms, zipf_slope, zipf_intercept.

    Cross-engine float discipline: ln() values are rounded to 9
    decimals and cast to DECIMAL(12,9) BEFORE the regression sums, so
    every sum (x, y, x^2, x*y — products are exact DECIMAL(25,18)) is
    exact integer-scaled arithmetic in both engines; the closed-form
    slope then combines the exact sums through one fixed double
    expression. Plain double sums would be partial-aggregation-order
    dependent.

    Scale shape: token explode -> term count (one shuffle on term) ->
    global top-N (TakeOrdered, no global sort) -> the regression is
    over top_n rows, a single partial+final aggregate.
    """
    words = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w")
    ).filter((F.col("w") != "") & (F.length("w") >= min_len))
    counts = words.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    ranked = (
        counts.orderBy(F.col("n").desc(), F.col("w").asc())
        .limit(top_n)
        .select(
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), F.col("w").asc()))
            .alias("rank"),
            "n",
        )
    )
    x = F.round(F.log(F.col("rank").cast("double")), 9).cast("decimal(12,9)")
    y = F.round(F.log(F.col("n").cast("double")), 9).cast("decimal(12,9)")
    sums = ranked.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    md = F.col("m").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxxd, sxyd = F.col("sxx").cast("double"), F.col("sxy").cast("double")
    slope = (md * sxyd - sxd * syd) / (md * sxxd - sxd * sxd)
    return sums.select(
        F.col("m").alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((syd - slope * sxd) / md, 6).alias("zipf_intercept"),
    )


def stopword_profile(
    docs: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    threshold: float = 0.05,
) -> DataFrame:
    """Per-language corpus profile of English-stopword density: doc
    count, mean stop ratio, and the fraction of docs above `threshold`
    — the aggregate view a corpus-curation dashboard keys filter
    sweeps on (C4/CCNet tune stopword filters per language).

    Each doc's ratio is rounded to 9 decimals and summed in the exact
    decimal domain (the repo's grouped-double-sum discipline), so the
    per-language means are engine-portable.
    """
    t = F.col(text_col)
    n_tokens = token_count_ws(t)
    n_stop = _marker_count(t, LANG_MARKERS["en"])
    ratio = F.round(
        (n_stop / F.greatest(n_tokens, F.lit(1))).cast("double"), 9
    ).cast("decimal(12,9)")
    return (
        docs.select(F.col(lang_col), ratio.alias("r"))
        .groupBy(lang_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            # numerators cast to double BEFORE the division: Spark's
            # decimal/long division picks a result scale by its own
            # rules and other engines pick differently — double/long is
            # one IEEE op both agree on
            F.round(
                F.sum("r").cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_stop_ratio"),
            F.round(
                F.sum(
                    F.when(F.col("r") > F.lit(threshold), 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("frac_above_threshold"),
        )
    )


def count_min_sketch(
    docs: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Deterministic count-min sketch over whitespace tokens (Cormode &
    Muthukrishnan 2005) — the bounded-state frequency summary: depth x
    width counters regardless of vocabulary size, mergeable by cell-wise
    addition (partial aggregation IS the merge), point estimate =
    min over rows of the hashed cell (always an over-estimate).

    Row hashes are md5-derived (first 8 hex digits of md5(j:word), mod
    width) so the sketch is reproducible cross-engine — no seeded
    xxhash, which DuckDB lacks.  At 100 TB the counter table is
    depth*width rows however large the corpus: the groupBy combines
    map-side, and the shuffle carries at most depth*width*partitions
    rows.

    Returns (j, bucket, cnt) — the counter matrix.
    """
    words = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    rows = F.array(*[F.lit(i) for i in range(depth)])
    wj = words.select("w", F.explode(rows).alias("j"))
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("j").cast("string"), F.lit(":"), F.col("w"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % width
    )
    return (
        wj.select("j", bucket.alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_lookup(
    counters: DataFrame, terms: DataFrame, term_col: str = "w", width: int = 1024
) -> DataFrame:
    """Point-estimate lookup against a count-min counter matrix: hash
    the term per sketch row, join the counters (broadcast — the counter
    matrix is fixed-size), min across rows.  Returns terms + cms_est."""
    depth_rows = counters.select("j").distinct()
    tj = terms.crossJoin(F.broadcast(depth_rows))
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.col("j").cast("string"), F.lit(":"), F.col(term_col))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % width
    )
    others = [c for c in terms.columns]
    return (
        tj.withColumn("bucket", bucket)
        .join(F.broadcast(counters), ["j", "bucket"])
        .groupBy(*others)
        .agg(F.min("cnt").alias("cms_est"))
    )


def bigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.75,
) -> DataFrame:
    """Per-document mean INTERPOLATED-BIGRAM log-probability — the next
    rung above unigram_logprob on the CCNet-style fluency ladder:
    p(w2|w1) = lam * c(w1 w2)/c(w1 ·) + (1-lam) * c(w2)/total, scored
    over every adjacent pair.  Interpolation (Jelinek-Mercer) keeps
    unseen-in-context pairs finite without leaving the exact-count
    domain, so the whole model stays cross-engine gateable.

    Shape: bigrams come from arrays_zip of two slices (no self-join,
    no window) — one explode per doc; the three count tables (bigram,
    bigram-start, unigram) are vocabulary-sized groupBys; scoring is a
    pair-keyed equi-join; the per-doc mean runs in the decimal domain.
    `lam` must be an exact binary fraction (0.75 default) — a 0.7
    would parse as DECIMAL in one engine and double in the other.

    Output: (id, n_bigrams, avg_logprob) — NULL for docs with < 2
    words, rounded to 6.
    """
    ws = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    base = docs.select(F.col(id_col), ws.alias("ws"))
    pairs = base.select(
        id_col,
        F.explode(
            F.expr(
                "arrays_zip(slice(ws, 1, greatest(size(ws) - 1, 0)),"
                " slice(ws, 2, greatest(size(ws) - 1, 0)))"
            )
        ).alias("bg"),
    ).select(id_col, F.col("bg.0").alias("w1"), F.col("bg.1").alias("w2"))
    c12 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    words = base.select(id_col, F.explode("ws").alias("w2"))
    wc = words.groupBy("w2").agg(F.count(F.lit(1)).alias("wc"))
    tot = words.agg(F.count(F.lit(1)).alias("total"))
    p = (
        F.lit(lam) * F.col("c12") / F.col("c1")
        + F.lit(1.0 - lam) * F.col("wc") / F.col("total")
    )
    scored = (
        pairs.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .join(wc, "w2")
        .crossJoin(F.broadcast(tot))
        .select(id_col, F.log(p).alias("lp"))
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            F.sum(F.col("lp").cast("decimal(28,10)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_logprob"),
    )
    return (
        docs.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            "avg_logprob",
        )
    )


def collocations_pmi(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top collocations by POINTWISE MUTUAL INFORMATION (Church &
    Hanks 1990) — the classic 'which word pairs belong together'
    measure phrase-mining and tokenizer-vocab pipelines start from:

        pmi(w1, w2) = ln( p(w1 w2) / (p(w1) * p(w2)) )

    spelled as ONE ln over one IEEE division of two pure-double
    products — (c12·Nw·Nw) / (Nbg·c1·c2) with every factor cast to
    double first — so the score is cross-engine bit-stable. The
    `min_count` floor drops the hapax pairs PMI notoriously
    over-ranks. Ranking by ROUNDED pmi with (w1, w2) tie-breaks.

    Shape: bigrams from arrays_zip slices (no self-join), two
    vocabulary-sized groupBys, pair-keyed joins, TakeOrdered top-k.
    Output: (w1, w2, c12, c1, c2, pmi, rank).
    """
    from unstract_spark.operators.retrieval import bounded_rank

    ws = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    base = docs.select(ws.alias("ws"))
    pairs = base.select(
        F.explode(
            F.expr(
                "arrays_zip(slice(ws, 1, greatest(size(ws) - 1, 0)),"
                " slice(ws, 2, greatest(size(ws) - 1, 0)))"
            )
        ).alias("bg")
    ).select(F.col("bg.0").alias("w1"), F.col("bg.1").alias("w2"))
    # scalars fold out of the two aggregates (sum of counts), so the
    # corpus explodes exactly twice — once into pair counts, once into
    # word counts — and AQE's stage reuse serves the repeated
    # aggregate subtrees from one shuffle each
    c12_all = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12")
    )
    c12 = c12_all.filter(F.col("c12") >= min_count)
    words = base.select(F.explode("ws").alias("w"))
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("wc"))
    tot = wc.agg(F.sum("wc").cast("long").alias("nw")).crossJoin(
        c12_all.agg(F.sum("c12").cast("long").alias("nbg"))
    )
    j = (
        c12.join(
            wc.select(F.col("w").alias("w1"), F.col("wc").alias("c1")),
            "w1",
        )
        .join(
            wc.select(F.col("w").alias("w2"), F.col("wc").alias("c2")),
            "w2",
        )
        .crossJoin(F.broadcast(tot))
    )
    pmi = F.log(
        (
            F.col("c12").cast("double")
            * F.col("nw").cast("double")
            * F.col("nw").cast("double")
        )
        / (
            F.col("nbg").cast("double")
            * F.col("c1").cast("double")
            * F.col("c2").cast("double")
        )
    )
    scored = j.select(
        "w1", "w2", "c12", "c1", "c2", F.round(pmi, 6).alias("pmi")
    )
    return bounded_rank(
        scored,
        [F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()],
        k,
    )


def feature_hash_signed(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
) -> DataFrame:
    """Signed feature hashing (Weinberger et al. 2009): every token
    hashes to one of `n_buckets` with a +/-1 sign from an independent
    hash bit — fixed-width ML feature vectors with NO vocabulary state.
    Output: sparse (doc_id, bucket, feat) rows.

    Scale shape (the r12 80x-rung finding): each document lives whole
    in exactly ONE scan task (parquet assigns whole row groups to
    splits) and doc ids are unique per input row, so the per-(doc,
    bucket) aggregation is logically PARTITION-LOCAL — but a groupBy
    can't know that, and its shuffle moves nearly every token (the
    (doc, bucket) key cardinality is ~0.4x the token count, so
    map-side combine compresses almost nothing; measured 26.1s vs
    4.2s for the tokenize+hash alone at the 80x rung). Tokenization
    and md5 stay JVM-side (bit-identical to the SQL oracle); only the
    aggregation drops to ONE mapInPandas pass — numpy composite-key
    np.unique + np.add.at per partition, zero exchanges anywhere.
    Emitted group keys are globally unique because doc ids are, so the
    result multiset is identical to the groupBy spelling (re-gated).

    Parallelism guard: with NO shuffle anywhere, parallelism equals
    the SCAN's split count — and parquet assigns whole row groups to
    splits, so a compact corpus (one fat row-group file: the 80x rung
    replica) collapses to ONE live task however many byte-range
    splits exist (13 of its 14 splits carried zero rows; measured
    single-threaded end to end). When the scan is under-split
    relative to the cluster, ONE cheap exchange of the raw (id, text)
    rows restores P-way parallelism — input-sized, never
    token-sized. A 100 TB corpus has millions of row groups, so the
    guard never fires there and the zero-shuffle path stands."""
    sc = docs.sparkSession.sparkContext
    if docs.rdd.getNumPartitions() < sc.defaultParallelism:
        docs = docs.repartition(sc.defaultParallelism)
    words = docs.select(
        doc_col,
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("w"),
    ).filter(F.col("w") != "")
    hv = F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10).cast(
        "long"
    )
    h = words.select(F.col(doc_col).alias("doc_id"), hv.alias("hv"))
    nb = int(n_buckets)

    def agg(batches):
        import numpy as np
        import pandas as pd

        id_parts, hv_parts = [], []
        for pdf in batches:
            if len(pdf):
                id_parts.append(pdf["doc_id"].to_numpy())
                hv_parts.append(pdf["hv"].to_numpy())
        if not id_parts:
            return
        ids = np.concatenate(id_parts)
        hvs = np.concatenate(hv_parts).astype(np.int64)
        bucket = hvs % nb
        sign = np.where((hvs // nb) % 2 == 0, 1, -1).astype(np.int64)
        if (
            np.issubdtype(ids.dtype, np.integer)
            and ids.min() >= 0
            and int(ids.max()) < (1 << 53) // nb
        ):
            key = ids.astype(np.int64) * nb + bucket
            uniq, inv = np.unique(key, return_inverse=True)
            feat = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(feat, inv, sign)
            out = pd.DataFrame(
                {
                    "doc_id": uniq // nb,
                    "bucket": (uniq % nb).astype("int32"),
                    "feat": feat,
                }
            )
        else:  # non-integer or huge ids: same math, pandas keys
            out = (
                pd.DataFrame(
                    {"doc_id": ids, "bucket": bucket.astype("int32"), "feat": sign}
                )
                .groupby(["doc_id", "bucket"], as_index=False, sort=False)["feat"]
                .sum()
            )
        yield out

    out_schema = (
        f"doc_id {dict(docs.dtypes)[doc_col]}, bucket int, feat long"
    )
    return h.mapInPandas(agg, out_schema)
