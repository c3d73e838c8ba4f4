"""Web-corpus ingestion operators: adversarial cases the oracle-gated
queries can't express (malformed inputs, entity double-decode guard,
framing attacks, detector precision)."""

import pyspark.sql.functions as F
import pytest

from unstract_spark.operators.webcorpus import (
    _parse_warc_blob,
    encode_warc,
    html_main_content,
    normalize_urls,
    repair_mojibake,
    warc_records,
)

# ---------------------------------------------------------------- WARC


def test_warc_round_trip_multi_record():
    blob = encode_warc(
        [
            {"type": "request", "uri": "http://e.com/doc/1", "path": "/doc/1"},
            {"type": "response", "uri": "http://e.com/doc/1", "body": "hello"},
            {"type": "response", "uri": "http://e.com/doc/2", "body": "", "http_status": 404},
        ]
    )
    recs = _parse_warc_blob(blob)
    assert [r["rec_type"] for r in recs] == ["request", "response", "response"]
    assert recs[1]["body"] == "hello" and recs[1]["http_status"] == 200
    assert recs[2]["http_status"] == 404 and recs[2]["body"] == ""


def test_warc_content_length_framing_is_binary_safe():
    # a payload that CONTAINS record-boundary markers must not split
    evil = "x\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\ny"
    blob = encode_warc(
        [
            {"type": "response", "uri": "http://e.com/a", "body": evil},
            {"type": "response", "uri": "http://e.com/b", "body": "tail"},
        ]
    )
    recs = _parse_warc_blob(blob)
    assert len(recs) == 2
    assert recs[0]["body"] == evil
    assert recs[1]["body"] == "tail"


def test_warc_truncated_blob_yields_parseable_prefix():
    blob = encode_warc(
        [
            {"type": "response", "uri": "http://e.com/a", "body": "keep me"},
            {"type": "response", "uri": "http://e.com/b", "body": "cut off here"},
        ]
    )
    recs = _parse_warc_blob(blob[:-30])  # truncates the 2nd body
    assert len(recs) >= 1
    assert recs[0]["body"] == "keep me"


def test_warc_non_warc_and_empty():
    assert _parse_warc_blob(b"") == []
    assert _parse_warc_blob(b"HTTP/1.1 200 OK\r\n\r\n") == []


def test_warc_metadata_record_passthrough():
    blob = encode_warc(
        [{"type": "warcinfo", "uri": "http://e.com/", "body": "robots: obey"}]
    )
    recs = _parse_warc_blob(blob)
    assert recs[0]["rec_type"] == "warcinfo"
    assert recs[0]["http_status"] is None
    assert recs[0]["body"] == "robots: obey"


def test_warc_records_carries_columns_and_isolates_bad_blob(spark):
    good = encode_warc([{"type": "response", "uri": "u", "body": "ok"}])
    df = spark.createDataFrame(
        [(1, "s1", good), (2, "s2", b"garbage not warc")],
        "doc_id long, source string, content binary",
    )
    rows = warc_records(df).collect()
    assert [(r.doc_id, r.source, r.body) for r in rows] == [(1, "s1", "ok")]


# ---------------------------------------------------------------- HTML


def _extract_one(spark, html: str):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return html_main_content(df).collect()[0]


def test_html_entities_decode_without_double_decode(spark):
    row = _extract_one(
        spark,
        "<p>a &amp;lt; b &lt; c &gt; d &quot;q&quot; &#39;s&#39; &nbsp;e &amp; f</p>",
    )
    # &amp;lt; must become the TEXT '&lt;', never '<'
    assert row.main_text == 'a &lt; b < c > d "q" \'s\' e & f'


def test_html_script_decoy_and_case_insensitive_tags(spark):
    row = _extract_one(
        spark,
        '<SCRIPT>var a = "<p>decoy</p>";</SCRIPT><STYLE>p{}</STYLE>'
        "<P>real <B>content</B> here</P>",
    )
    assert row.main_text == "real content here"
    assert row.n_kept == 1 and row.n_dropped == 0


def test_html_link_density_boundary(spark):
    # anchor chars == 50% of text -> kept (threshold is strict >)
    kept = _extract_one(spark, "<p><a href='/'>abcde</a>fghij</p>")
    assert kept.n_kept == 1 and kept.main_text == "abcdefghij"
    # anchor-dominated -> dropped
    dropped = _extract_one(spark, "<li><a href='/'>abcdefgh</a>ij</li>")
    assert dropped.n_kept == 0 and dropped.n_dropped == 1


def test_html_whitespace_collapse_and_empty_blocks(spark):
    row = _extract_one(
        spark, "<p>  lots \n\t of   space  </p><p>   </p><h2>head</h2>"
    )
    assert row.main_text == "lots of space head"
    assert row.n_kept == 2  # the blank <p> is neither kept nor counted dropped


def test_html_no_blocks_at_all(spark):
    row = _extract_one(spark, "<html><body>bare text no blocks</body></html>")
    assert row.main_text == "" and row.n_kept == 0 and row.n_dropped == 0


def test_html_document_order_preserved(spark):
    row = _extract_one(
        spark,
        "<p>one</p><nav><a href='/'>x y z</a></nav><h1>two</h1><p>three</p>",
    )
    assert row.main_text == "one two three"
    assert row.n_dropped == 1


# ------------------------------------------------------------ mojibake


def test_mojibake_repair_and_detector_precision(spark):
    orig = "café — naïve København"
    moji = orig.encode("utf-8").decode("latin-1")
    df = spark.createDataFrame(
        [(1, moji), (2, orig), (3, "pure ascii"), (4, None)],
        "id long, text string",
    )
    rows = {r.id: r for r in repair_mojibake(df).collect()}
    assert rows[1].was_mojibake is True and rows[1].repaired == orig
    # REAL accented text must not be flagged (would corrupt it if repaired)
    assert rows[2].was_mojibake is False and rows[2].repaired == orig
    assert rows[3].was_mojibake is False and rows[3].repaired == "pure ascii"
    assert rows[4].repaired is None


def test_mojibake_repair_is_single_shot(spark):
    # double-encoded damage: one repair pass removes one layer only —
    # the operator contract is one inversion, applied when flagged
    orig = "déjà"
    double = orig.encode("utf-8").decode("latin-1").encode("utf-8").decode("latin-1")
    df = spark.createDataFrame([(1, double)], "id long, text string")
    row = repair_mojibake(df).collect()[0]
    assert row.was_mojibake is True
    assert row.repaired == orig.encode("utf-8").decode("latin-1")


# ---------------------------------------------------------------- URLs


def _norm_one(spark, url: str):
    df = spark.createDataFrame([(1, url)], "id long, url string")
    return normalize_urls(df).collect()[0]


def test_url_tracking_only_query_drops_question_mark(spark):
    r = _norm_one(spark, "http://a.example.com/p?utm_source=x&utm_medium=y")
    assert r.url_norm == "http://a.example.com/p"


def test_url_param_order_preserved(spark):
    r = _norm_one(spark, "http://e.com/p?b=2&utm_x=t&a=1&ref=z&c=3")
    assert r.url_norm == "http://e.com/p?b=2&a=1&c=3"


def test_url_nondefault_port_and_fragment(spark):
    r = _norm_one(spark, "HTTPS://E.COM:8443/a/b#frag")
    assert r.url_norm == "https://e.com:8443/a/b"
    assert r.path_depth == 2


def test_url_default_port_stripped_per_scheme(spark):
    assert _norm_one(spark, "http://e.com:80/").url_norm == "http://e.com/"
    assert _norm_one(spark, "https://e.com:443/").url_norm == "https://e.com/"
    # https on :80 is NOT the default — preserved
    assert _norm_one(spark, "https://e.com:80/").url_norm == "https://e.com:80/"


def test_url_domain_and_depth(spark):
    r = _norm_one(spark, "http://deep.sub.example.co/x/y/z/")
    assert r.domain == "example.co"
    assert r.path_depth == 3


def test_url_ref_is_param_key_not_substring(spark):
    # 'ref' must match as a whole key: a param NAMED reftarget survives
    r = _norm_one(spark, "http://e.com/p?reftarget=1&ref=2")
    assert r.url_norm == "http://e.com/p?reftarget=1"


# -------------------------------------------------------------- robots


def test_parse_robots_groups_and_idioms():
    from unstract_spark.operators.webcorpus import parse_robots

    txt = (
        "# comment only line\n"
        "User-agent: GoodBot\n"
        "User-agent: OtherBot\n"   # two UA lines share the block
        "Disallow: /private/\n"
        "Allow: /private/ok\n"
        "\n"
        "User-Agent: *\n"          # case-insensitive field name
        "Disallow:\n"              # empty Disallow = allow all (no rule)
        "Crawl-delay: 10\n"        # unknown fields ignored
    )
    rules = parse_robots(txt)
    assert {(r["agent"], r["rule_path"], r["is_allow"]) for r in rules} == {
        ("goodbot", "/private/", False),
        ("goodbot", "/private/ok", True),
        ("otherbot", "/private/", False),
        ("otherbot", "/private/ok", True),
        # empty Disallow = allow-all SENTINEL (keeps the '*' group
        # visible for group selection, ranks below every real rule)
        ("*", "", True),
    }
    assert parse_robots("") == []
    assert parse_robots(None) == []


def test_robots_rule_regex_wildcards():
    """RFC 9309 §2.2.3: '*' matches any char sequence, trailing '$'
    anchors the path end; regex metachars in literal segments are
    escaped."""
    import re

    from unstract_spark.operators.webcorpus import _robots_rule_regex

    rx = _robots_rule_regex("/fish*.php$")
    assert re.search(rx, "/fish/cod.php")
    assert re.search(rx, "/fish.php")
    assert not re.search(rx, "/fish/cod.php?x=1")  # $ anchors the end
    rx2 = _robots_rule_regex("/a+b")  # '+' is literal, not regex
    assert re.search(rx2, "/a+b/c")
    assert not re.search(rx2, "/aab")
    assert _robots_rule_regex("") == "^"  # sentinel matches all


def test_apply_robots_empty_group_exempts_agent(spark):
    """ADVICE r8: 'User-agent: bot / Disallow:' is the explicit
    allow-all exemption idiom (RFC 9309 §2.2.1). The empty group must
    still be SELECTED for that agent — the '*' group's Disallows must
    not leak onto it."""
    from unstract_spark.operators.webcorpus import apply_robots, robots_rules

    robots = spark.createDataFrame(
        [("d.com", "User-agent: nicebot\nDisallow:\n\n"
                   "User-agent: *\nDisallow: /\n")],
        "domain string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [(1, "d.com", "/anything")], "doc_id long, domain string, path string"
    )
    rules = robots_rules(robots)
    nice = apply_robots(urls, rules, agent="NiceBot").collect()[0]
    assert nice.allowed is True and nice.rule_len == 0
    other = apply_robots(urls, rules, agent="OtherBot").collect()[0]
    assert other.allowed is False and other.rule_len == 1


def test_apply_robots_wildcard_and_anchor(spark):
    """'*' and '$' rule paths match per RFC 9309 §2.2.3; precedence is
    still pattern LENGTH with Allow winning ties."""
    from unstract_spark.operators.webcorpus import apply_robots, robots_rules

    robots = spark.createDataFrame(
        [("d.com",
          "User-agent: *\nDisallow: /*.php\nAllow: /static*.php$\n")],
        "domain string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [
            (1, "d.com", "/page.php"),          # Disallow /*.php
            (2, "d.com", "/static/x.php"),      # Allow (longer, anchored)
            (3, "d.com", "/static/x.php?q=1"),  # '$' fails -> Disallow
            (4, "d.com", "/page.html"),         # no match -> allowed
        ],
        "doc_id long, domain string, path string",
    )
    rows = {
        r.doc_id: r
        for r in apply_robots(urls, robots_rules(robots), agent="b").collect()
    }
    assert rows[1].allowed is False and rows[1].rule_len == 6
    assert rows[2].allowed is True and rows[2].rule_len == 13
    assert rows[3].allowed is False and rows[3].rule_len == 6
    assert rows[4].allowed is True and rows[4].rule_len == 0


def test_apply_robots_agent_group_shadows_star(spark):
    from unstract_spark.operators.webcorpus import apply_robots, robots_rules

    # '*' allows everything, the bot-specific group forbids /x/ —
    # RFC 9309: ONLY the most specific matching group applies
    robots = spark.createDataFrame(
        [("d.com", "User-agent: mybot\nDisallow: /x/\n\nUser-agent: *\nAllow: /\n")],
        "domain string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [(1, "d.com", "/x/1"), (2, "d.com", "/y/2")],
        "doc_id long, domain string, path string",
    )
    rows = {
        r.doc_id: r
        for r in apply_robots(urls, robots_rules(robots), agent="MyBot").collect()
    }
    assert rows[1].allowed is False and rows[1].rule_len == 3
    # the '*' group's Allow:/ must NOT leak into the bot's group
    assert rows[2].allowed is True and rows[2].rule_len == 0


def test_apply_robots_allow_wins_equal_length(spark):
    from unstract_spark.operators.webcorpus import apply_robots, robots_rules

    robots = spark.createDataFrame(
        [("d.com", "User-agent: *\nDisallow: /dir/\nAllow: /dir2\n")],
        "domain string, robots_txt string",
    )
    # craft equal-length competing matches: path under both prefixes
    # is impossible, so use identical-length rules on one path instead
    robots2 = spark.createDataFrame(
        [("e.com", "User-agent: *\nDisallow: /p/\nAllow: /p/\n")],
        "domain string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [(1, "e.com", "/p/page")], "doc_id long, domain string, path string"
    )
    row = apply_robots(urls, robots_rules(robots2), agent="any").collect()[0]
    assert row.allowed is True and row.rule_len == 3


# ---------------------------------------------------- paragraph dedup


def test_dedup_paragraphs_min_count_and_metachar_delim(spark):
    from unstract_spark.operators.dedup import dedup_paragraphs

    df = spark.createDataFrame(
        [(1, "twice||solo1"), (2, "twice||solo2"), (3, "thrice")],
        "doc_id long, text string",
    )
    # min_count=3: 'twice' (2 occurrences) survives
    rows = {
        r.doc_id: r
        for r in dedup_paragraphs(df, delim="||", min_count=3).collect()
    }
    assert rows[1].cleaned_text == "twice||solo1" and rows[1].n_removed == 0
    assert rows[3].cleaned_text == "thrice"
    # min_count=2 removes both 'twice' copies, keeps order of the rest
    rows2 = {
        r.doc_id: r
        for r in dedup_paragraphs(df, delim="||", min_count=2).collect()
    }
    assert rows2[1].cleaned_text == "solo1" and rows2[1].n_removed == 1
    assert rows2[2].cleaned_text == "solo2"


# ------------------------------------------------------ streaming twin


def test_streaming_crawl_pipeline(spark, tmp_path):
    from unstract_spark.streaming.incremental import streaming_crawl_pipeline

    src = tmp_path / "warc"
    src.mkdir()

    def page(body_word: str) -> str:
        return (
            "<nav><a href='/'>home</a></nav>"
            f"<p>{body_word} content here</p>"
            "<footer><a href='/t'>terms</a></footer>"
        )

    def warc(recs):
        from unstract_spark.operators.webcorpus import encode_warc

        return encode_warc(
            [
                {"type": "response", "uri": uri, "body": page(word)}
                for uri, word in recs
            ]
        )

    # drop 1: A and B (B with tracking params that must normalize away)
    (src / "drop1.warc").write_bytes(
        warc(
            [
                ("http://site.com/a", "alpha"),
                ("http://site.com/b?utm_source=x", "beta"),
            ]
        )
    )
    run = lambda: streaming_crawl_pipeline(
        spark,
        str(src),
        str(tmp_path / "ckpt"),
        str(tmp_path / "frontier"),
        str(tmp_path / "out"),
        robots=spark.createDataFrame(
            [("site.com", "User-agent: *\nDisallow: /private/\n")],
            "domain string, robots_txt string",
        ),
    )
    run()
    out1 = spark.read.parquet(str(tmp_path / "out"))
    got = {r.url_norm: r.main_text for r in out1.collect()}
    assert got == {
        "http://site.com/a": "alpha content here",
        "http://site.com/b": "beta content here",
    }

    # drop 2: B again (already-normalized URL -> frontier drop), a
    # robots-disallowed URL, and a genuinely new C
    (src / "drop2.warc").write_bytes(
        warc(
            [
                ("http://site.com/b", "beta-DUP"),
                ("http://site.com/private/x", "secret"),
                ("http://site.com/c", "gamma"),
            ]
        )
    )
    run()
    out2 = spark.read.parquet(str(tmp_path / "out"))
    got2 = {r.url_norm: r.main_text for r in out2.collect()}
    assert got2 == {
        "http://site.com/a": "alpha content here",
        "http://site.com/b": "beta content here",   # first version kept
        "http://site.com/c": "gamma content here",  # private/x filtered
    }

    # idempotent re-fire: nothing new arrived, store unchanged
    run()
    assert spark.read.parquet(str(tmp_path / "out")).count() == 3


def test_streaming_crawl_fetch_seam_drains_frontier(spark, tmp_path):
    """The injected-fetcher seam (r8 verdict #7): sitemap seeds become
    pending URLs; each run claims a bounded batch, respects the robots
    gate, commits fetched docs + frontier keys; later runs drain the
    remainder; a re-fire with nothing pending fetches nothing."""
    from unstract_spark.operators.webcorpus import parse_sitemap
    from unstract_spark.streaming.incremental import streaming_crawl_pipeline

    src = tmp_path / "warc"
    src.mkdir()  # no WARC drops — fetch-only crawl

    xml = (
        "<urlset>"
        "<url><loc>http://s.com/a</loc></url>"
        "<url><loc>http://s.com/b</loc></url>"
        "<url><loc>http://s.com/private/x</loc></url>"
        "<url><loc>http://s.com/c</loc></url>"
        "</urlset>"
    )
    seeds = parse_sitemap(
        spark.createDataFrame([(1, xml)], "id long, xml string")
    ).select(F.col("loc").alias("url"))
    robots = spark.createDataFrame(
        [("s.com", "User-agent: *\nDisallow: /private/\n")],
        "domain string, robots_txt string",
    )
    calls = []

    def fake_fetch(urls):
        calls.append(list(urls))
        return [
            (u, 404 if u.endswith("/c") else 200,
             f"<p>{u.rsplit('/', 1)[-1]} fetched content</p>")
            for u in urls
        ]

    run = lambda ck: streaming_crawl_pipeline(
        spark, str(src), str(tmp_path / ck),
        str(tmp_path / "frontier"), str(tmp_path / "out"),
        robots=robots, fetcher=fake_fetch, seed_urls=seeds,
        max_fetch_per_run=2,
    )
    # run 1: claims 2 of the 3 allowed seeds (private/x robots-gated)
    assert run("ck1") == 1
    assert len(calls) == 1 and len(calls[0]) == 2
    assert not any("/private/" in u for u in calls[0])
    # run 2: drains the remaining allowed seed
    assert run("ck2") == 1
    assert len(calls) == 2 and len(calls[1]) == 1
    # run 3: frontier full — nothing pending, fetcher not called
    assert run("ck3") == 0
    assert len(calls) == 2

    got = {
        r.url_norm: r.main_text
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    # 404'd /c entered the frontier (no eternal re-pend) but no doc
    assert got == {
        "http://s.com/a": "a fetched content",
        "http://s.com/b": "b fetched content",
    }


def test_streaming_crawl_link_expansion_hops(spark, tmp_path):
    """discovered_dir arms the full crawl loop: anchors extracted from
    fetched pages become pending URLs for LATER runs — the crawl
    expands hop by hop, robots-gated and frontier-deduped, with
    per-run work bounded by max_fetch_per_run."""
    from unstract_spark.streaming.incremental import streaming_crawl_pipeline

    src = tmp_path / "warc"
    src.mkdir()
    pages = {
        "http://s.com/root": (
            "<p>root content here</p><a href='/p1'>1</a>"
            "<a href='/p2'>2</a><a href='/secret/x'>s</a>"
        ),
        "http://s.com/p1": "<p>p1 content here</p><a href='/p3'>3</a>",
        "http://s.com/p2": "<p>p2 content here</p>",
        "http://s.com/p3": "<p>p3 content here</p>",
    }
    fetched_log = []

    def fake_fetch(urls):
        fetched_log.append(list(urls))
        return [(u, 200, pages.get(u, "<p>404ish</p>")) for u in urls]

    seeds = spark.createDataFrame(
        [("http://s.com/root",)], "url string"
    )
    robots = spark.createDataFrame(
        [("s.com", "User-agent: *\nDisallow: /secret/\n")],
        "domain string, robots_txt string",
    )
    total = 0
    for i in range(6):
        total += streaming_crawl_pipeline(
            spark, str(src), str(tmp_path / f"ck{i}"),
            str(tmp_path / "frontier"), str(tmp_path / "out"),
            robots=robots, fetcher=fake_fetch, seed_urls=seeds,
            max_fetch_per_run=1,
            discovered_dir=str(tmp_path / "discovered"),
        )
    # 4 pages reachable (root, p1, p2, p3); /secret/x never claimed
    assert total == 4
    claimed = [u for batch in fetched_log for u in batch]
    assert sorted(claimed) == [
        "http://s.com/p1", "http://s.com/p2",
        "http://s.com/p3", "http://s.com/root",
    ]
    got = {
        r.url_norm: r.main_text
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got["http://s.com/p3"] == "p3 content here"  # 2 hops deep
    assert not any("/secret/" in u for u in got)


def test_streaming_crawl_fresh_checkpoint_preserves_committed(spark, tmp_path):
    """ADVICE r8: a FRESH checkpoint_dir pointed at a populated
    out/frontier root restarts epochs at 0; without the run-base
    offset the new run's batch_id=0 silently overwrote the first
    run's committed batch. The new run must append disjoint
    partitions AND still frontier-dedup against the old run."""
    from unstract_spark.operators.webcorpus import encode_warc
    from unstract_spark.streaming.incremental import streaming_crawl_pipeline

    src = tmp_path / "warc"
    src.mkdir()

    def warc(recs):
        return encode_warc(
            [
                {"type": "response", "uri": uri,
                 "body": f"<p>{w} content here</p>"}
                for uri, w in recs
            ]
        )

    (src / "d1.warc").write_bytes(warc([("http://s.com/a", "alpha")]))
    streaming_crawl_pipeline(
        spark, str(src), str(tmp_path / "ckpt1"),
        str(tmp_path / "frontier"), str(tmp_path / "out"),
    )
    assert spark.read.parquet(str(tmp_path / "out")).count() == 1

    # second RUN: fresh checkpoint, same roots; repeats A, adds B
    (src / "d2.warc").write_bytes(
        warc([("http://s.com/a", "alpha-DUP"), ("http://s.com/b", "beta")])
    )
    streaming_crawl_pipeline(
        spark, str(src), str(tmp_path / "ckpt2"),
        str(tmp_path / "frontier"), str(tmp_path / "out"),
    )
    got = {
        r.url_norm: r.main_text
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == {
        "http://s.com/a": "alpha content here",  # run-1 commit intact
        "http://s.com/b": "beta content here",
    }


# ------------------------------------------------------ sitemap / links


def test_parse_sitemap_alignment_with_optional_fields(spark):
    from unstract_spark.operators.webcorpus import parse_sitemap

    xml = (
        "<urlset>"
        "<url><loc>http://e.com/a</loc><lastmod>2026-02-01</lastmod></url>"
        "<url><loc>http://e.com/b</loc></url>"
        "<url><loc>http://e.com/c</loc><priority>0.5</priority></url>"
        "</urlset>"
    )
    rows = parse_sitemap(
        spark.createDataFrame([(1, xml)], "id long, xml string")
    ).orderBy("pos").collect()
    assert [(r.loc, r.lastmod, r.priority) for r in rows] == [
        ("http://e.com/a", "2026-02-01", None),
        ("http://e.com/b", None, None),
        ("http://e.com/c", None, 0.5),
    ]


def test_parse_sitemap_empty_and_malformed(spark):
    from unstract_spark.operators.webcorpus import parse_sitemap

    rows = parse_sitemap(
        spark.createDataFrame(
            [(1, "<urlset></urlset>"), (2, "not xml at all")],
            "id long, xml string",
        )
    ).collect()
    assert rows == []  # no <url> entries -> no rows, no task failure


def test_extract_links_resolution_rules(spark):
    from unstract_spark.operators.webcorpus import extract_links

    html = (
        '<a href="/rel">r</a>'
        "<a href='HTTP://Abs.com/x'>abs</a>"
        '<a href="#frag">f</a>'        # fragment-only: dropped
        '<a href="//proto.rel/x">p</a>'  # protocol-relative: dropped
        '<a href="../dot">d</a>'         # dot-relative: dropped
    )
    rows = extract_links(
        spark.createDataFrame(
            [(1, html, "https://Base.COM:8443/deep/page")],
            "id long, html string, base_url string",
        )
    ).orderBy("link_pos").collect()
    # non-default port survives resolution (normalize_urls strips later)
    assert [r.dst_url for r in rows] == [
        "https://base.com:8443/rel",
        "HTTP://Abs.com/x",
    ]


# ------------------------------------------------------- property tests


def test_warc_framing_round_trips_arbitrary_bodies():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.binary(min_size=0, max_size=300), min_size=1, max_size=5
        )
    )
    def prop(bodies):
        blob = encode_warc(
            [
                {"type": "response", "uri": f"http://e.com/{i}", "body": b}
                for i, b in enumerate(bodies)
            ]
        )
        recs = _parse_warc_blob(blob)
        assert len(recs) == len(bodies)
        for i, (rec, b) in enumerate(zip(recs, bodies)):
            assert rec["url"] == f"http://e.com/{i}"
            # Content-Length framing must recover each body exactly,
            # whatever bytes it contains (markers, CRLFs, partial
            # headers) — compare through the same utf-8/replace lens
            assert rec["body"] == b.decode("utf-8", "replace")
            assert rec["http_status"] == 200

    prop()


def test_mojibake_mixed_damage_passes_through_not_crash(spark):
    # a flagged row whose latin-1 re-encoding is NOT valid UTF-8
    # (stray 0xA3 from a real pound sign) must pass through unrepaired
    # — not corrupt, not raise MALFORMED_CHARACTER_CODING
    df = spark.createDataFrame(
        [(1, "cafÃ© price £ 5"), (2, "over Ā range Ã©")],
        "id long, text string",
    )
    rows = {r.id: r for r in repair_mojibake(df).collect()}
    assert rows[1].was_mojibake is False
    assert rows[1].repaired == "cafÃ© price £ 5"
    # chars above U+00FF are not latin-1-representable: skip repair
    assert rows[2].was_mojibake is False
    assert rows[2].repaired == "over Ā range Ã©"


def test_parse_sitemap_index_two_level(spark):
    from unstract_spark.operators.webcorpus import parse_sitemap_index

    xml = (
        "<sitemapindex>"
        "<sitemap><loc>http://e.com/m1.xml</loc>"
        "<lastmod>2026-03-01</lastmod></sitemap>"
        "<sitemap><loc>http://e.com/m2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    rows = parse_sitemap_index(
        spark.createDataFrame([(1, xml)], "id long, xml string")
    ).orderBy("pos").collect()
    assert [(r.child_loc, r.lastmod) for r in rows] == [
        ("http://e.com/m1.xml", "2026-03-01"),
        ("http://e.com/m2.xml", None),
    ]


def test_parse_sitemap_malformed_block_is_row_safe(spark):
    from unstract_spark.operators.webcorpus import parse_sitemap

    # first <url> block is broken XML (unclosed <loc>) — must yield a
    # NULL loc, never a task-fatal SAXParseException; second parses,
    # and entities in the loc decode
    bad = (
        "<urlset><url><loc>http://e.com/a</url>"
        "<url><loc>http://e.com/b?x=1&amp;y=2</loc></url></urlset>"
    )
    rows = parse_sitemap(
        spark.createDataFrame([(1, bad)], "id long, xml string")
    ).orderBy("pos").collect()
    assert rows[0].loc is None
    assert rows[1].loc == "http://e.com/b?x=1&y=2"


def test_mojibake_emoji_row_does_not_crash(spark):
    # supplementary-plane chars fall OUTSIDE a BMP-bounded regex class
    # (Java regex matches code points): the guard must still exclude
    # them or encode('ISO-8859-1') kills the task
    s = "cafÃ© \U0001F600"
    df = spark.createDataFrame([(1, s)], "id long, text string")
    row = repair_mojibake(df).collect()[0]
    assert row.was_mojibake is False and row.repaired == s


def test_warc_corrupt_content_length_keeps_prefix():
    good = encode_warc([{"type": "response", "uri": "u1", "body": "keep"}])
    corrupt = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u2\r\n"
        b"Content-Length: 1e3\r\n\r\nhello"
    )
    recs = _parse_warc_blob(good + corrupt)
    assert [r["body"] for r in recs] == ["keep"]


def test_url_single_label_host_domain(spark):
    r = _norm_one(spark, "http://localhost:8080/x/y")
    assert r.domain == "localhost"
    assert r.url_norm == "http://localhost:8080/x/y"


# --------------------------------------------- randomized model checks


def test_robots_matches_reference_model(spark):
    """apply_robots vs a brute-force longest-match reference over 120
    randomized (rules, path) cases batched into ONE Spark call —
    including RFC 9309 §2.2.3 wildcard rules ('*' segments, trailing
    '$') and the empty allow-all idiom."""
    import random
    import re

    from unstract_spark.operators.webcorpus import apply_robots, robots_rules

    rng = random.Random(20260815)
    segs = ["a", "b", "c", "d"]
    domains, urls, expected = [], [], {}
    for i in range(120):
        dom = f"d{i}.com"
        rules = []
        for _ in range(rng.randint(0, 5)):
            depth = rng.randint(1, 3)
            parts = [rng.choice(segs + ["*"]) for _ in range(depth)]
            path = "/" + "/".join(parts) + (
                "/" if rng.random() < 0.5 else ""
            )
            if rng.random() < 0.2:
                path += "$"
            if rng.random() < 0.1:
                path = ""  # empty-value allow-all idiom
            rules.append((path, rng.random() < 0.5))
        txt = "User-agent: *\n" + "".join(
            f"{'Allow' if allow else 'Disallow'}: {p}\n" for p, allow in rules
        )
        domains.append((dom, txt))
        path = "/" + "/".join(rng.choice(segs) for _ in range(rng.randint(1, 4)))
        urls.append((i, dom, path))
        # reference: longest PATTERN match (RFC wildcards), Allow wins
        # equal lengths; empty-value rules are zero-length allows
        best = None  # (len, is_allow)
        for rp, allow in rules:
            anchored = rp.endswith("$")
            body = rp[:-1] if anchored else rp
            rx = ("^"
                  + ".*".join(re.escape(s) for s in body.split("*"))
                  + ("$" if anchored else ""))
            if re.search(rx, path):
                cand = (len(rp), True if rp == "" else allow)
                if best is None or cand > best:
                    best = cand
        expected[i] = (best is None or best[1], best[0] if best else 0)

    robots = spark.createDataFrame(domains, "domain string, robots_txt string")
    u = spark.createDataFrame(urls, "doc_id long, domain string, path string")
    rows = apply_robots(u, robots_rules(robots), agent="any").collect()
    assert len(rows) == 120
    for r in rows:
        assert (r.allowed, r.rule_len) == expected[r.doc_id], (
            r.doc_id, r.path, expected[r.doc_id], (r.allowed, r.rule_len)
        )


def test_dedup_paragraphs_hot_min_fuse_matches_window_path(spark):
    """The skew fuse (hot_min) must be semantics-preserving: same
    output as the window spelling on a corpus mixing a mega-frequency
    paragraph (hot path), a count-2 duplicate (cold path), and uniques
    — including an all-boilerplate doc that must still emit."""
    from unstract_spark.operators.dedup import dedup_paragraphs

    docs = [(i, "HOT\n\nonly%d" % i) for i in range(30)]
    docs += [(100, "pair\n\nx"), (101, "pair\n\ny"), (102, "HOT")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    base = {
        r.doc_id: (r.cleaned_text, r.n_kept, r.n_removed)
        for r in dedup_paragraphs(df, min_count=2).collect()
    }
    fused = {
        r.doc_id: (r.cleaned_text, r.n_kept, r.n_removed)
        for r in dedup_paragraphs(df, min_count=2, hot_min=10).collect()
    }
    assert fused == base
    assert fused[102] == ("", 0, 1)  # all-boilerplate doc still emits
    assert fused[100] == ("x", 1, 1)  # count-2 dup rode the cold join

    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup_paragraphs(df, min_count=5, hot_min=2)


def test_dedup_paragraphs_identity_when_all_unique(spark):
    from unstract_spark.operators.dedup import dedup_paragraphs

    docs = [(i, f"unique{i}a\n\nunique{i}b\n\nunique{i}c") for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r.doc_id: r for r in dedup_paragraphs(df).collect()}
    for i, t in docs:
        assert rows[i].cleaned_text == t
        assert rows[i].n_kept == 3 and rows[i].n_removed == 0


def test_html_extraction_round_trip_randomized(spark):
    """100 random word-salad documents through the full fixture page
    (script decoy, nav, paragraphs, footer): extraction must return
    the exact original text for every one."""
    import random

    rng = random.Random(99)
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    docs = []
    for i in range(100):
        n = rng.randint(1, 37)
        docs.append((i, " ".join(rng.choice(words) for _ in range(n))))
    rows = []
    for i, text in docs:
        ws = text.split(" ")
        paras = "".join(
            "<p>" + " ".join(ws[j : j + 10]) + "</p>" for j in range(0, len(ws), 10)
        )
        html = (
            "<html><head><script>var x='<p>no</p>';</script></head><body>"
            "<nav><a href='/'>home</a> <a href='/a'>about</a></nav>"
            f"<div>{paras}</div>"
            "<footer><a href='/t'>terms</a> <a href='/p'>privacy</a></footer>"
            "</body></html>"
        )
        rows.append((i, html))
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r.doc_id: r for r in html_main_content(df).collect()}
    for i, text in docs:
        assert got[i].main_text == text, (i, text, got[i].main_text)
        assert got[i].n_dropped == 2


def test_streaming_crawl_pipeline_wet_records(spark, tmp_path):
    from unstract_spark.operators.webcorpus import encode_warc
    from unstract_spark.streaming.incremental import streaming_crawl_pipeline

    src = tmp_path / "warc"
    src.mkdir()
    # one drop mixing an HTML response and a WET conversion record
    (src / "drop.warc").write_bytes(
        encode_warc(
            [
                {
                    "type": "response",
                    "uri": "http://s.com/html",
                    "body": "<p>from html</p><nav><a href='/'>x y</a></nav>",
                },
                {
                    "type": "conversion",
                    "uri": "http://s.com/wet",
                    "body": "already extracted text",
                },
            ]
        )
    )
    streaming_crawl_pipeline(
        spark,
        str(src),
        str(tmp_path / "ckpt"),
        str(tmp_path / "frontier"),
        str(tmp_path / "out"),
    )
    got = {
        r.url_norm: (r.main_text, r.n_dropped)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == {
        "http://s.com/html": ("from html", 1),
        "http://s.com/wet": ("already extracted text", 0),
    }


def test_streaming_paragraph_dedup(spark, tmp_path):
    from unstract_spark.streaming.incremental import streaming_paragraph_dedup

    src = tmp_path / "docs"
    src.mkdir()
    run = lambda: streaming_paragraph_dedup(
        spark,
        str(src),
        str(tmp_path / "ckpt"),
        str(tmp_path / "store"),
        str(tmp_path / "out"),
    )
    # fire 1: BOILER repeats in-fire (doc 2 keeps the first arrival,
    # doc 3's copy drops); unique paragraphs survive
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"doc_id": [2, 3], "text": ["BOILER\n\nalpha", "beta\n\nBOILER"]}),
        str(src / "f1.parquet"),
    )
    run()
    out = {
        r.doc_id: (r.cleaned_text, r.n_removed)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert out[2] == ("BOILER\n\nalpha", 0)  # first arrival kept
    assert out[3] == ("beta", 1)
    # fire 2: BOILER now in the store -> drops; new paragraph survives
    pq.write_table(
        pa.table({"doc_id": [4], "text": ["BOILER\n\ngamma"]}),
        str(src / "f2.parquet"),
    )
    run()
    out2 = {
        r.doc_id: (r.cleaned_text, r.n_removed)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert out2[4] == ("gamma", 1)
    assert out2[2] == ("BOILER\n\nalpha", 0)  # fire-1 output untouched
    # idempotent re-fire: nothing new
    run()
    assert spark.read.parquet(str(tmp_path / "out")).count() == 3


def test_run_base_pinned_to_checkpoint_lifetime(spark, tmp_path):
    """Code-review r9: the run base must be STABLE across restarts of
    the SAME checkpoint — epochs continue within a checkpoint lineage,
    and a replayed in-flight epoch must map to ITS ORIGINAL partition
    id (recomputing the base on restart would strand the crashed
    attempt's partition and let the replay's exclude-current filter
    see its own half-written keys as history). Proxy: a second drain
    of the SAME checkpoint lands epoch 1 at batch_id=1 (base still 0),
    not at a re-derived base."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from unstract_spark.streaming.incremental import (
        _run_base,
        streaming_paragraph_dedup,
    )

    src = tmp_path / "docs"
    src.mkdir()
    run = lambda: streaming_paragraph_dedup(
        spark, str(src), str(tmp_path / "ckpt"),
        str(tmp_path / "store"), str(tmp_path / "out"),
    )
    pq.write_table(
        pa.table({"doc_id": [1], "text": ["a1\n\nb1"]}), str(src / "f1.parquet")
    )
    run()
    pq.write_table(
        pa.table({"doc_id": [2], "text": ["a2\n\nb2"]}), str(src / "f2.parquet")
    )
    run()  # same checkpoint: epoch 1 must use the PINNED base 0
    bids = {
        r.batch_id
        for r in spark.read.parquet(str(tmp_path / "out"))
        .select("batch_id").distinct().collect()
    }
    assert bids == {0, 1}

    # the helper itself: marker wins over a recomputed value
    assert _run_base(
        str(tmp_path / "out"), checkpoint_dir=str(tmp_path / "ckpt")
    ) == 0
    # a fresh checkpoint computes (and pins) a disjoint base
    assert _run_base(
        str(tmp_path / "out"), checkpoint_dir=str(tmp_path / "ckpt_new")
    ) == 2


def test_streaming_paragraph_dedup_fresh_checkpoint(spark, tmp_path):
    """ADVICE r8: fresh checkpoint + populated store/out roots must
    continue (disjoint run-base partitions), not overwrite committed
    batches — and the store still dedups across runs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from unstract_spark.streaming.incremental import streaming_paragraph_dedup

    src = tmp_path / "docs"
    src.mkdir()
    pq.write_table(
        pa.table({"doc_id": [1], "text": ["BOILER\n\nalpha"]}),
        str(src / "f1.parquet"),
    )
    streaming_paragraph_dedup(
        spark, str(src), str(tmp_path / "ckpt1"),
        str(tmp_path / "store"), str(tmp_path / "out"),
    )
    # second run, FRESH checkpoint: re-reads f1 (store-hash dropped,
    # not re-kept) plus a new doc repeating BOILER
    pq.write_table(
        pa.table({"doc_id": [2], "text": ["BOILER\n\nbeta"]}),
        str(src / "f2.parquet"),
    )
    streaming_paragraph_dedup(
        spark, str(src), str(tmp_path / "ckpt2"),
        str(tmp_path / "store"), str(tmp_path / "out"),
    )
    rows = {
        (r.doc_id, r.batch_id): (r.cleaned_text, r.n_removed)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    # run-1 commit (batch_id=0) intact — NOT overwritten by run 2
    assert rows[(1, 0)] == ("BOILER\n\nalpha", 0)
    # run 2 landed in a disjoint partition (run base 1): its re-read
    # of doc 1 is fully store-deduped, doc 2 keeps only 'beta'
    assert rows[(1, 1)] == ("", 2)
    assert rows[(2, 1)] == ("beta", 1)


def test_streaming_paragraph_dedup_hot_min_fuse_matches_window_twin(
    spark, tmp_path
):
    """Verdict r9 #2: the streaming twin of the batch paragraph-skew
    fuse. A boilerplate-heavy drop (one paragraph on most docs of a
    fire) must produce IDENTICAL per-doc output and store state under
    the fused (hot_min) and window spellings — across two fires, so
    the fuse's store interplay (hot hash already stored, hot
    first-arrival kept then stored) is exercised, plus a replay-style
    idempotent re-fire."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from unstract_spark.streaming.incremental import streaming_paragraph_dedup

    # fire 1: HOTBANNER on 6 of 8 docs (hot under hot_min=3), COLDDUP
    # on exactly 2 (cold path repeat), unique tails everywhere — plus
    # doc 9 ingested TWICE in the same fire (the duplicate-row tie the
    # review flagged: the window twin keeps exactly one of an
    # identical (doc_id,pos) pair, and the fuse must match)
    fire1 = pa.table(
        {
            "doc_id": list(range(1, 9)) + [9, 9],
            "text": [
                f"HOTBANNER\n\nunique-{i}" if i <= 6 else f"COLDDUP\n\ntail-{i}"
                for i in range(1, 9)
            ] + ["HOTBANNER\n\ndup-9"] * 2,
        }
    )
    # fire 2: HOTBANNER returns (now store-hot), one brand-new hot
    # paragraph NEWHOT repeats 4x in-fire, plus a fresh unique
    fire2 = pa.table(
        {
            "doc_id": list(range(11, 16)),
            "text": [
                "HOTBANNER\n\nNEWHOT",
                "NEWHOT\n\nfresh-12",
                "NEWHOT",
                "NEWHOT\n\nCOLDDUP",
                "solo-15",
            ],
        }
    )

    def drive(tag, hot_min):
        src = tmp_path / f"docs_{tag}"
        src.mkdir()
        store = str(tmp_path / f"store_{tag}")
        out = str(tmp_path / f"out_{tag}")
        ckpt = str(tmp_path / f"ckpt_{tag}")
        run = lambda: streaming_paragraph_dedup(
            spark, str(src), ckpt, store, out, hot_min=hot_min
        )
        pq.write_table(fire1, str(src / "f1.parquet"))
        run()
        pq.write_table(fire2, str(src / "f2.parquet"))
        run()
        run()  # drained: idempotent no-op
        rows = {
            r.doc_id: (r.cleaned_text, r.n_kept, r.n_removed)
            for r in spark.read.parquet(out).collect()
        }
        hashes = {
            r.phash
            for r in spark.read.parquet(store).select("phash").collect()
        }
        return rows, hashes

    fused_rows, fused_store = drive("fused", hot_min=3)
    plain_rows, plain_store = drive("plain", hot_min=None)
    assert fused_rows == plain_rows
    assert fused_store == plain_store
    # spot semantics: doc 1 kept the fire-1 first arrival of HOTBANNER,
    # docs 2-6 dropped theirs; fire-2's doc 11 finds both its
    # paragraphs in the store (HOTBANNER) or hot-and-first (NEWHOT)
    assert fused_rows[1] == ("HOTBANNER\n\nunique-1", 2, 0)
    assert fused_rows[2] == ("unique-2", 1, 1)
    assert fused_rows[11] == ("NEWHOT", 1, 1)  # HOTBANNER stored; NEWHOT first
    assert fused_rows[13] == ("", 0, 1)  # lone NEWHOT copy, dropped
    assert fused_rows[15] == ("solo-15", 1, 0)
    # the twice-ingested doc: 4 paragraph rows (2x HOTBANNER dropped —
    # doc 1 holds the first arrival — plus dup-9 kept ONCE, its twin
    # copy dropped), identical in both spellings via fused_rows ==
    # plain_rows above
    assert fused_rows[9] == ("dup-9", 1, 3)


def test_streaming_crawl_politeness_domain_cap_and_delay(spark, tmp_path):
    """Verdict r9 #3: per-domain politeness for the fetch claim. A
    frontier with many URLs on ONE domain must drain at most
    max_per_domain per fetch step — interleaved round-robin so other
    domains proceed in the same step — and a domain fetched less than
    crawl_delay_sec ago must sit the next step out entirely (the delay
    ledger), with its URLs re-pending, not dropping."""
    from unstract_spark.streaming.incremental import streaming_crawl_pipeline

    src = tmp_path / "warc"
    src.mkdir()  # fetch-only crawl

    # 20 URLs on big.com, 2 on tiny.org
    urls = [f"http://big.com/p{i:02d}" for i in range(20)] + [
        "http://tiny.org/a",
        "http://tiny.org/b",
    ]
    seeds = spark.createDataFrame([(u,) for u in urls], "url string")
    calls = []

    def fake_fetch(batch):
        calls.append(sorted(batch))
        return [(u, 200, f"<p>ok {u}</p>") for u in batch]

    fake_now = [1000.0]
    run = lambda ck: streaming_crawl_pipeline(
        spark, str(src), str(tmp_path / ck),
        str(tmp_path / "frontier"), str(tmp_path / "out"),
        fetcher=fake_fetch, seed_urls=seeds,
        max_fetch_per_run=6, max_per_domain=2,
        crawl_delay_sec=30.0, clock=lambda: fake_now[0],
    )

    def by_domain(batch):
        out = {}
        for u in batch:
            out.setdefault(u.split("/")[2], []).append(u)
        return out

    # step 1: 2 from big.com AND both tiny.org urls — the cap leaves
    # headroom in max_fetch_per_run for the small domain (round-robin,
    # not big.com-first)
    assert run("ck1") == 1
    d1 = by_domain(calls[0])
    assert len(d1["big.com"]) == 2 and len(d1["tiny.org"]) == 2

    # step 2, 10s later: BOTH domains are cooling (fetched 10 < 30s
    # ago) — nothing claimable, fetcher not called, nothing lost
    fake_now[0] += 10.0
    assert run("ck2") == 0
    assert len(calls) == 1

    # step 3, past the delay: big.com drains 2 more (tiny.org is
    # frontier-complete); its earlier URLs were not dropped
    fake_now[0] += 30.0
    assert run("ck3") == 1
    d3 = by_domain(calls[1])
    assert list(d3) == ["big.com"] and len(d3["big.com"]) == 2
    assert d3["big.com"] == ["http://big.com/p02", "http://big.com/p03"]

    # steady state: 2 per step until big.com's 20 drain — 16 URLs
    # remain after steps 1 and 3, so 8 more steps
    for step in range(8):
        fake_now[0] += 31.0
        assert run(f"ck4_{step}") == 1
    fake_now[0] += 31.0
    assert run("ck_done") == 0  # frontier complete
    fetched = {u for batch in calls for u in batch}
    assert fetched == set(urls)  # the cap delayed, never starved
    assert max(len(b) for b in calls) <= 4  # never more than 2+2


def test_parse_crawl_delays_group_selection():
    from unstract_spark.operators.webcorpus import parse_crawl_delays

    txt = (
        "User-agent: *\n"
        "Crawl-delay: 10\n"
        "Disallow: /tmp/\n"
        "\n"
        "User-agent: trainingbot\n"
        "User-agent: otherbot\n"
        "Disallow: /x/\n"
        "Crawl-delay: 2.5\n"
        "\n"
        "User-agent: badbot\n"
        "Crawl-delay: nonsense\n"   # unparseable -> ignored
        "Crawl-delay: -5\n"         # negative -> ignored
        "Crawl-delay: inf\n"        # non-finite -> ignored (float()
        "Crawl-delay: nan\n"        # accepts these; a crawler cannot)
    )
    rows = parse_crawl_delays(txt)
    assert {(r["agent"], r["delay_sec"]) for r in rows} == {
        ("*", 10.0),
        ("trainingbot", 2.5),
        ("otherbot", 2.5),
    }


def test_robots_crawl_delays_per_domain(spark):
    from unstract_spark.operators.webcorpus import robots_crawl_delays

    robots = spark.createDataFrame(
        [
            # agent-specific group shadows '*'
            ("a.com", "User-agent: *\nCrawl-delay: 60\n"
                      "User-agent: trainingbot\nCrawl-delay: 5\n"),
            # only '*' -> applies
            ("b.com", "User-agent: *\nCrawl-delay: 45\n"),
            # no directive -> no row (global knob applies downstream)
            ("c.com", "User-agent: *\nDisallow: /private/\n"),
            # duplicate directives -> politest (largest) wins
            ("d.com", "User-agent: *\nCrawl-delay: 3\nCrawl-delay: 9\n"),
        ],
        "domain string, robots_txt string",
    )
    got = {
        r.domain: r.delay_sec
        for r in robots_crawl_delays(robots, agent="TrainingBot").collect()
    }
    assert got == {"a.com": 5.0, "b.com": 45.0, "d.com": 9.0}


def test_streaming_crawl_per_domain_crawl_delay(spark, tmp_path):
    """Verdict r10 #3: domains cool for their OWN robots Crawl-delay.
    fast.com (delay 5) must be claimable again while slow.com
    (delay 60) is still cooling, and a domain with no directive
    follows the global crawl_delay_sec knob."""
    from unstract_spark.streaming.incremental import streaming_crawl_pipeline

    src = tmp_path / "warc"
    src.mkdir()  # fetch-only crawl

    urls = (
        [f"http://fast.com/p{i}" for i in range(5)]
        + [f"http://slow.com/p{i}" for i in range(3)]
        + [f"http://plain.com/p{i}" for i in range(3)]
    )
    seeds = spark.createDataFrame([(u,) for u in urls], "url string")
    robots = spark.createDataFrame(
        [
            ("fast.com", "User-agent: *\nCrawl-delay: 5\n"),
            ("slow.com", "User-agent: *\nCrawl-delay: 60\n"),
            ("plain.com", "User-agent: *\nDisallow: /private/\n"),
        ],
        "domain string, robots_txt string",
    )
    calls = []

    def fake_fetch(batch):
        calls.append(sorted(batch))
        return [(u, 200, f"<p>ok {u}</p>") for u in batch]

    fake_now = [0.0]
    step = [0]

    def run():
        step[0] += 1
        return streaming_crawl_pipeline(
            spark, str(src), str(tmp_path / f"ck{step[0]}"),
            str(tmp_path / "frontier"), str(tmp_path / "out"),
            robots=robots, fetcher=fake_fetch, seed_urls=seeds,
            max_per_domain=1, crawl_delay_sec=20.0,
            clock=lambda: fake_now[0],
        )

    def domains(batch):
        return {u.split("/")[2] for u in batch}

    # step 1 at t=0: one URL from each of the three domains
    assert run() == 1
    assert domains(calls[0]) == {"fast.com", "slow.com", "plain.com"}

    # t=10: fast.com's 5s delay elapsed — claimable; slow.com (60s)
    # and plain.com (global 20s) still cooling
    fake_now[0] = 10.0
    assert run() == 1
    assert domains(calls[1]) == {"fast.com"}

    # t=25: plain.com's global 20s elapsed (measured from t=0 — it was
    # not re-fetched at t=10); fast.com elapsed again; slow.com cooling
    fake_now[0] = 25.0
    assert run() == 1
    assert domains(calls[2]) == {"fast.com", "plain.com"}

    # t=70: everyone's delay elapsed — slow.com finally proceeds
    fake_now[0] = 70.0
    assert run() == 1
    assert domains(calls[3]) == {"fast.com", "slow.com", "plain.com"}

    # drain: nothing was ever lost, only deferred
    for _ in range(6):
        fake_now[0] += 100.0
        if run() == 0:
            break
    fetched = {u for b in calls for u in b}
    assert fetched == set(urls)


def test_streaming_crawl_domain_cap_rotation_shares_budget(spark, tmp_path):
    """Verdict r10 #4: when max_fetch_per_run binds before the domain
    list is exhausted, a FIXED cross-domain claim order (url_norm)
    starves the trailing domains deterministically — step after step
    the same leading domains win the budget. The claim order must
    rotate across fetch steps (hash(domain, fid)) so every domain gets
    fetched within a bounded number of steps."""
    from unstract_spark.streaming.incremental import streaming_crawl_pipeline

    src = tmp_path / "warc"
    src.mkdir()  # fetch-only crawl

    # 6 domains x 10 URLs, 1 per domain per step, 2 claims per step:
    # a url_norm-fixed order would fetch ONLY d0/d1 for the first five
    # steps (10 backlogged URLs each); rotation must touch all six.
    domains = [f"d{i}.com" for i in range(6)]
    urls = [f"http://{d}/p{j}" for d in domains for j in range(10)]
    seeds = spark.createDataFrame([(u,) for u in urls], "url string")
    calls = []

    def fake_fetch(batch):
        calls.append(sorted(batch))
        return [(u, 200, f"<p>ok {u}</p>") for u in batch]

    for step in range(8):
        streaming_crawl_pipeline(
            spark, str(src), str(tmp_path / f"ck{step}"),
            str(tmp_path / "frontier"), str(tmp_path / "out"),
            fetcher=fake_fetch, seed_urls=seeds,
            max_fetch_per_run=2, max_per_domain=1,
        )
    assert len(calls) == 8 and all(len(b) == 2 for b in calls)
    fetched_domains = {u.split("/")[2] for b in calls for u in b}
    # 16 claims across 8 steps: the rotation must have shared them
    # over ALL 6 domains (fixed order: exactly 2 domains ever fetched)
    assert fetched_domains == set(domains)
    # within a domain the claim order stays rank-major (p0 first)
    first_per_domain = {}
    for b in calls:
        for u in b:
            first_per_domain.setdefault(u.split("/")[2], u)
    assert all(u.endswith("/p0") for u in first_per_domain.values())


def test_streaming_crawl_politeness_crash_window_keeps_cooling(spark, tmp_path):
    """Review r10: the delay ledger commits BEFORE the fetcher call,
    so a crash anywhere in the fetch/commit window (fetches done,
    nothing committed) leaves the contacted domains cooling — an
    immediate retry re-pends the URLs but must NOT re-hammer the
    host until the delay elapses."""
    import pytest

    from unstract_spark.streaming.incremental import streaming_crawl_pipeline

    src = tmp_path / "warc"
    src.mkdir()
    seeds = spark.createDataFrame(
        [("http://one.com/a",), ("http://one.com/b",)], "url string"
    )
    fake_now = [500.0]
    calls = []

    def run(ck, fetch):
        return streaming_crawl_pipeline(
            spark, str(src), str(tmp_path / ck),
            str(tmp_path / "frontier"), str(tmp_path / "out"),
            fetcher=fetch, seed_urls=seeds,
            crawl_delay_sec=30.0, clock=lambda: fake_now[0],
        )

    def boom(urls):
        calls.append(sorted(urls))
        raise RuntimeError("network died mid-claim")

    def ok(urls):
        calls.append(sorted(urls))
        return [(u, 200, f"<p>ok {u}</p>") for u in urls]

    with pytest.raises(RuntimeError):
        run("ck1", boom)
    assert len(calls) == 1  # the crashed attempt DID contact the host

    # immediate retry: domain is cooling from the crashed attempt's
    # ledger commit — nothing claimable, host not re-hammered
    fake_now[0] += 5.0
    assert run("ck2", ok) == 0
    assert len(calls) == 1

    # past the delay: the claim re-pends in full (nothing was lost)
    fake_now[0] += 31.0
    assert run("ck3", ok) == 1
    assert calls[-1] == ["http://one.com/a", "http://one.com/b"]
    got = {
        r.url_norm
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == {"http://one.com/a", "http://one.com/b"}


class _CrawlSite:
    """A 'domain' served over a real localhost socket: robots.txt,
    sitemap, and pages, with every GET path recorded — so the crawl
    pipeline's politeness and expansion claims are asserted against
    actual network traffic, not fetcher-callable bookkeeping."""

    def __init__(self, host_alias: str, pages: dict):
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        self.hits: list[str] = []
        self.lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):
                pass

            def do_GET(self):
                with outer.lock:
                    outer.hits.append(self.path)
                body = pages.get(self.path)
                if body is None:
                    self.send_response(404)
                    body = b"not here"
                else:
                    self.send_response(200)
                    body = body.encode()
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.base = f"http://{host_alias}:{self.server.server_port}"
        import threading as _t

        _t.Thread(target=self.server.serve_forever, daemon=True).start()

    def close(self):
        self.server.shutdown()
        self.server.server_close()


def _http_get(url: str) -> tuple[str, int, str]:
    import urllib.error
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=10) as resp:
            return (url, resp.status, resp.read().decode())
    except urllib.error.HTTPError as e:
        return (url, e.code, "")


def test_streaming_crawl_end_to_end_over_localhost_http(spark, tmp_path):
    """Verdict r11 #4: the full crawl loop over a REAL network hop —
    robots.txt and the sitemap are fetched from live localhost HTTP
    servers, the injected fetcher is a real urllib client, two
    'domains' (localhost vs 127.0.0.1, distinct hosts on loopback)
    cool for their own Crawl-delay, link expansion discovers pages
    not in the sitemap, robots Disallow blocks a sitemap URL, and a
    crash mid-fetch replays without duplicate documents."""
    from unstract_spark.operators.webcorpus import (
        normalize_urls,
        parse_sitemap,
    )
    from unstract_spark.streaming.incremental import streaming_crawl_pipeline

    # domain B (127.0.0.1): no Crawl-delay directive -> global knob
    b = _CrawlSite("127.0.0.1", {
        "/robots.txt": "User-agent: *\nDisallow:\n",
        "/b1": '<html><p>beta one body</p><a href="/b2">n</a></html>',
        "/b2": "<html><p>beta two body</p></html>",
    })
    # domain A (localhost): Crawl-delay 30, /private/ disallowed,
    # page1 links to page3 (NOT in the sitemap — expansion must find
    # it); the sitemap itself is served and fetched over the socket
    # (URL templates resolved client-side once the ports are known)
    a = _CrawlSite("localhost", {
        "/robots.txt": (
            "User-agent: *\nCrawl-delay: 30\nDisallow: /private/\n"
        ),
        "/sitemap.xml": (
            "<urlset>"
            "<url><loc>__A__/page1</loc></url>"
            "<url><loc>__A__/page2</loc></url>"
            "<url><loc>__A__/private/secret</loc></url>"
            "<url><loc>__B__/b1</loc></url>"
            "</urlset>"
        ),
        "/page1": '<html><p>alpha one body</p><a href="/page3">n</a></html>',
        "/page2": "<html><p>alpha two body</p></html>",
        "/page3": "<html><p>alpha three body</p></html>",
        "/private/secret": "<html><p>must never be fetched</p></html>",
    })
    try:
        # 1. robots over the wire, keyed by the pipeline's own domain
        #    derivation (normalize_urls on the same URLs)
        seed_probe = spark.createDataFrame(
            [(f"{a.base}/page1",), (f"{b.base}/b1",)], "url string"
        )
        dom = {
            r.url: r.domain
            for r in normalize_urls(seed_probe, url_col="url").collect()
        }
        dom_a, dom_b = dom[f"{a.base}/page1"], dom[f"{b.base}/b1"]
        assert dom_a != dom_b  # two hosts, two politeness identities
        robots = spark.createDataFrame(
            [(dom_a, _http_get(f"{a.base}/robots.txt")[2]),
             (dom_b, _http_get(f"{b.base}/robots.txt")[2])],
            "domain string, robots_txt string",
        )
        # 2. the sitemap over the wire -> seeds (URL templates filled
        #    server-side text, resolved here)
        sm = _http_get(f"{a.base}/sitemap.xml")[2].replace(
            "__A__", a.base
        ).replace("__B__", b.base)
        seeds = parse_sitemap(
            spark.createDataFrame([(sm,)], "xml string")
        ).select(F.col("loc").alias("url"))

        def real_fetch(urls):
            return [_http_get(u) for u in urls]

        fake_now = [1000.0]
        src = tmp_path / "warc"
        src.mkdir()
        run = lambda ck, fetch=real_fetch: streaming_crawl_pipeline(  # noqa: E731
            spark, str(src), str(tmp_path / ck),
            str(tmp_path / "frontier"), str(tmp_path / "out"),
            robots=robots, fetcher=fetch, seed_urls=seeds,
            max_fetch_per_run=10,
            discovered_dir=str(tmp_path / "disc"),
            crawl_delay_sec=5.0, clock=lambda: fake_now[0],
        )

        def pages(site):
            # page traffic only — the test's own robots/sitemap GETs
            # are bootstrap, not crawl claims
            return [h for h in site.hits
                    if h not in ("/robots.txt", "/sitemap.xml")]

        # step 1: all allowed seeds fetched over the socket; the
        # disallowed URL never leaves a mark in the access log
        assert run("ck1") == 1
        assert set(pages(a)) == {"/page1", "/page2"}
        assert "/private/secret" not in a.hits
        assert pages(b) == ["/b1"]

        # step 2 (+1s): both domains cooling -> nothing claimed, zero
        # network traffic
        a_before, b_before = len(a.hits), len(b.hits)
        fake_now[0] += 1.0
        assert run("ck2") == 0
        assert (len(a.hits), len(b.hits)) == (a_before, b_before)

        # step 3 (+6s): B's global 5s delay elapsed -> /b2 (discovered
        # from b1's anchor) is fetched; A's robots 30s delay still
        # cooling -> page3 waits
        fake_now[0] += 6.0
        assert run("ck3") == 1
        assert pages(b) == ["/b1", "/b2"]
        assert "/page3" not in a.hits

        # step 4 (+31s): A cooled -> page3 arrives via link expansion;
        # crash MID-FETCH (after the real GET, before any commit)
        fake_now[0] += 31.0
        crashed = []

        def crash_fetch(urls):
            got = [_http_get(u) for u in urls]
            crashed.extend(urls)
            raise RuntimeError("simulated crash after network I/O")

        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="simulated"):
            run("ck4", fetch=crash_fetch)
        assert crashed == [f"{a.base.lower()}/page3"]
        # ledger committed BEFORE the fetch: the crashed domain cools
        fake_now[0] += 1.0
        assert run("ck5") == 0
        # replay after the delay: page3 re-fetched (at-least-once) and
        # committed exactly once
        fake_now[0] += 31.0
        assert run("ck6") == 1
        assert pages(a).count("/page3") == 2  # crashed GET + replay

        out = spark.read.parquet(str(tmp_path / "out"))
        texts = {
            r.url_norm.rsplit("/", 1)[1]: r.main_text
            for r in out.collect()
        }
        assert set(texts) == {"page1", "page2", "page3", "b1", "b2"}
        assert out.count() == out.select("url_norm").distinct().count()
        assert texts["page3"] == "alpha three body"
        assert texts["b2"] == "beta two body"
        # frontier complete: one more polite step fetches nothing
        fake_now[0] += 31.0
        assert run("ck7") == 0
    finally:
        a.close()
        b.close()


def test_feed_published_epoch_dialects_and_malformed(spark):
    """The four wild-feed date dialects normalize to the same epoch
    arithmetic, and malformed dates surface as NULL (never task
    failures) — the parser-discipline contract."""
    from unstract_spark.operators.webcorpus import feed_published_epoch

    rows = [
        (1, "Mon, 05 Jan 2026 10:30:00 +0000"),
        (2, "Mon, 05 Jan 2026 10:30:00 GMT"),
        (3, "2026-01-05T10:30:00Z"),
        (4, "2026-01-05T16:00:00+05:30"),
        (5, "yesterday-ish"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "id long, published string")
    got = {
        r.id: r.published_epoch
        for r in feed_published_epoch(df).collect()
    }
    base = 1767609000  # 2026-01-05 10:30:00 UTC
    assert got[1] == got[2] == got[3] == base
    assert got[4] == base  # 16:00+05:30 is the same instant
    assert got[5] is None and got[6] is None


def _rss_feed(entries):
    items = "".join(
        f"<item><title>t</title><link>{u}</link>"
        f"<pubDate>{d}</pubDate></item>"
        for u, d in entries
    )
    return f"<rss><channel>{items}</channel></rss>"


def test_streaming_feed_pipeline_overlapping_polls(spark, tmp_path):
    """Feed polling across fires: real feeds re-serve their latest N
    entries every poll, so the per-feed high-water mark must turn
    overlapping snapshots into exactly-once entry discovery — each
    entry emitted in the fire where it first exceeded the hwm, a
    back-dated entry skipped, an undated entry skipped, and a crash
    replay (poisoned in-flight state) rebuilt from the previous
    snapshot."""
    import os

    from unstract_spark.streaming.incremental import (
        _pin_bid,
        streaming_feed_pipeline,
    )

    d = lambda day, h=10: (  # noqa: E731
        f"Mon, {day:02d} Jan 2026 {h:02d}:00:00 +0000"
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    os.makedirs(src)

    sch = "feed_id string, xml string"
    # fire 1: feed A serves e1, e2; feed B serves b1
    fire1 = [
        ("A", _rss_feed([("http://a/e1", d(1)), ("http://a/e2", d(2))])),
        ("B", _rss_feed([("http://b/b1", d(5))])),
    ]
    spark.createDataFrame(fire1, sch).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    assert streaming_feed_pipeline(spark, src, ckpt, state, out) == 1
    got1 = {
        (r.feed_id, r.link)
        for r in spark.read.parquet(out).collect()
    }
    assert got1 == {("A", "http://a/e1"), ("A", "http://a/e2"),
                    ("B", "http://b/b1")}

    # crash replay: poison epoch-1's state with a bogus huge hwm —
    # the replayed fire must rebuild from the committed epoch-0 state
    _pin_bid(ckpt, 1)
    spark.createDataFrame(
        [("A", 9_999_999_999)], "feed_id string, hwm_epoch long"
    ).write.parquet(f"{state}/batch_id=1")

    # fire 2: feed A re-serves e2 and adds e3 (newer), a BACK-DATED
    # e0 (older than the hwm, never seen -> skipped by contract) and
    # an UNDATED entry (skipped); feed B unchanged snapshot
    fire2 = [
        ("A", _rss_feed([
            ("http://a/e0", d(1, h=5)),   # back-dated
            ("http://a/e2", d(2)),         # overlap
            ("http://a/e3", d(3)),         # new
        ]) .replace("</channel>",
                    "<item><title>u</title><link>http://a/nd</link>"
                    "</item></channel>")),  # undated
        ("B", _rss_feed([("http://b/b1", d(5))])),
    ]
    spark.createDataFrame(fire2, sch).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    assert streaming_feed_pipeline(spark, src, ckpt, state, out) == 1
    emitted = [
        (r.feed_id, r.link)
        for r in spark.read.parquet(out).collect()
    ]
    # exactly-once: e2/b1 not re-emitted, e3 emitted once, e0/nd skipped
    assert sorted(emitted) == sorted(
        [("A", "http://a/e1"), ("A", "http://a/e2"),
         ("A", "http://a/e3"), ("B", "http://b/b1")]
    )
    # state: one row per feed, max epoch
    latest = max(
        int(p.rsplit("=", 1)[1])
        for p in os.listdir(state) if p.startswith("batch_id=")
    )
    hwm = {
        r.feed_id: r.hwm_epoch
        for r in spark.read.parquet(f"{state}/batch_id={latest}").collect()
    }
    assert hwm["A"] == 1767434400  # 2026-01-03 10:00 UTC (e3)
    assert hwm["B"] == 1767607200  # 2026-01-05 10:00 UTC (b1)

    # idempotent re-fire: nothing new
    assert streaming_feed_pipeline(spark, src, ckpt, state, out) == 0
