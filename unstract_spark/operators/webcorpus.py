"""Web-corpus ingestion operators: WARC record parsing, HTML
main-content extraction, mojibake repair, URL normalization.

The front end of a crawl-to-training-data pipeline (the CCNet /
RefinedWeb / Gopher preprocessing shape): records arrive packed in
multi-record WARC files, documents as HTML wrapped in boilerplate,
text with encoding damage, URLs carrying tracking parameters. The
reference platform ingests documents through connector sources and
normalizes values before extraction (SURVEY §2 S-family, F5 —
reference `unstract/core` workflow source/transform stages); these are
the beyond-reference equivalents for web-scale corpora, feeding the
existing dedup / quality / export families.

Scale design:
- WARC parsing is mapInPandas over blob rows — one blob decodes inside
  one task, records explode locally, NO shuffle. At 100 TB the blobs
  arrive as binary rows from the object-store scan and parallelism is
  the file-split count.
- HTML extraction, mojibake repair, and URL normalization are pure
  native column expressions (regexp/array/higher-order functions) —
  whole-stage codegen end to end, no Python in the hot path, trivially
  partition-parallel with zero shuffle (the block reassembly in
  html_main_content groups only within a document id).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "encode_warc",
    "warc_records",
    "html_main_content",
    "repair_mojibake",
    "normalize_urls",
    "parse_robots",
    "robots_rules",
    "apply_robots",
    "registrable_domain",
    "parse_sitemap",
    "parse_sitemap_index",
    "extract_links",
]


# ---------------------------------------------------------------------
# WARC (ISO 28500): plain-text record headers + Content-Length-framed
# bodies. The format is simpler than its reputation: records are
#   "WARC/1.0\r\n" <headers> "\r\n\r\n" <body of Content-Length bytes>
#   "\r\n\r\n"
# concatenated. Response bodies are HTTP messages (status line +
# headers + blank line + payload).
# ---------------------------------------------------------------------


def encode_warc(records: list[dict]) -> bytes:
    """Fixture mux: list of {type, uri, body: bytes, http_status} ->
    one WARC 1.0 byte blob. Response records wrap the body in an HTTP
    response message; request records carry an HTTP request message."""
    out = bytearray()
    for rec in records:
        body = rec.get("body", b"")
        if isinstance(body, str):
            body = body.encode("utf-8")
        if rec["type"] == "response":
            status = int(rec.get("http_status", 200))
            http = (
                f"HTTP/1.1 {status} OK\r\n"
                "Content-Type: text/plain; charset=utf-8\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode("ascii") + body
        elif rec["type"] == "request":
            http = (
                f"GET {rec.get('path', '/')} HTTP/1.1\r\n"
                "Host: example.com\r\nUser-Agent: unstract-spark\r\n\r\n"
            ).encode("ascii")
        else:  # warcinfo / metadata: raw body
            http = body
        headers = (
            "WARC/1.0\r\n"
            f"WARC-Type: {rec['type']}\r\n"
            f"WARC-Target-URI: {rec['uri']}\r\n"
            "WARC-Date: 2026-01-01T00:00:00Z\r\n"
            "Content-Type: application/http\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode("ascii")
        out += headers + http + b"\r\n\r\n"
    return bytes(out)


def _parse_warc_blob(blob: bytes) -> list[dict]:
    """One WARC blob -> record dicts. Bodies are framed by
    Content-Length (binary-safe — never split payload bytes on
    markers), per ISO 28500 §4."""
    recs = []
    pos = 0
    n = len(blob)
    while pos < n:
        if blob[pos : pos + 5] != b"WARC/":
            break  # trailing padding / truncated tail: stop cleanly
        hdr_end = blob.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in blob[pos:hdr_end].decode("utf-8", "replace").split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        clen_s = headers.get("content-length", "0")
        if not clen_s.isdigit():
            break  # corrupted length header: keep the parseable prefix
        clen = int(clen_s)
        body = blob[hdr_end + 4 : hdr_end + 4 + clen]
        rtype = headers.get("warc-type", "")
        status = None
        payload = body
        if rtype in ("response", "request") and body[:5] in (b"HTTP/", b"GET /", b"POST ", b"HEAD "):
            head, sep, rest = body.partition(b"\r\n\r\n")
            payload = rest if sep else b""
            first = head.split(b"\r\n", 1)[0]
            if rtype == "response" and first[:5] == b"HTTP/":
                parts = first.split()
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
        recs.append(
            {
                "url": headers.get("warc-target-uri", ""),
                "rec_type": rtype,
                "http_status": status,
                "body": payload.decode("utf-8", "replace"),
            }
        )
        pos = hdr_end + 4 + clen
        while blob[pos : pos + 2] == b"\r\n":
            pos += 2
    return recs


def warc_records(df: DataFrame, payload_col: str = "content") -> DataFrame:
    """Explode WARC blobs into records: (url, rec_type, http_status,
    body, body_len), all other input columns carried through.

    mapInPandas, one blob per row: parsing is per-task local, no
    shuffle; a malformed blob yields its parseable prefix rather than
    failing the task (crawl files are routinely truncated)."""
    import pandas as pd

    carry = [c for c in df.columns if c != payload_col]
    schema = ", ".join(
        f"{name} {dtype}" for name, dtype in df.dtypes if name != payload_col
    )
    if schema:
        schema += ", "
    schema += "url string, rec_type string, http_status long, body string, body_len long"

    def parse(batches):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                blob = row[payload_col]
                for rec in _parse_warc_blob(bytes(blob) if blob is not None else b""):
                    out = {c: row[c] for c in carry}
                    out.update(rec)
                    out["body_len"] = len(rec["body"])
                    rows.append(out)
            yield pd.DataFrame(
                rows,
                columns=carry + ["url", "rec_type", "http_status", "body", "body_len"],
            )

    return df.mapInPandas(parse, schema)


# ---------------------------------------------------------------------
# HTML main-content extraction: the jusText/trafilatura core signal —
# split into block elements, score each block's LINK DENSITY (anchor
# text chars / block text chars), drop link-dominated boilerplate
# (nav bars, footers, related-links rails), strip tags from survivors.
# ---------------------------------------------------------------------

_BLOCK_RE = r"(?is)<(p|h1|h2|h3|li|td|nav|footer|aside)\b[^>]*>.*?</\1>"
_SCRIPT_RE = r"(?is)<(script|style|noscript|template)\b[^>]*>.*?</\1>"
_TAG_RE = r"(?s)<[^>]*>"
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),  # LAST: never double-decode &amp;lt; into <
]


def _block_text(block: Column) -> Column:
    """Strip tags, decode the standard named entities, normalize
    whitespace. &amp; decodes last so '&amp;lt;' yields '&lt;' (text),
    not '<' (double decode) — the classic sanitizer bug."""
    txt = F.regexp_replace(block, _TAG_RE, "")
    for ent, ch in _ENTITIES:
        txt = F.replace(txt, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(txt, r"\s+", " "))


def html_main_content(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    link_density_max: float = 0.5,
) -> DataFrame:
    """(id, html) -> (id, main_text, n_kept, n_dropped).

    Pipeline (all native expressions, one groupBy on the id):
      1. remove script/style/noscript/template subtrees,
      2. split into leaf block elements (p/h*/li/td/nav/footer/aside —
         container divs are transparent),
      3. per block: text = strip tags + decode entities + collapse
         whitespace; link_chars = total anchor-text length,
      4. drop empty blocks and blocks with link density >
         link_density_max (boilerplate: nav/footer rails are
         link-dominated, content paragraphs are not),
      5. reassemble survivors in document order with single spaces.

    Document order is carried explicitly (posexplode + array_sort on
    the position) — correctness never depends on task ordering."""
    # regex literals go through the function API, never F.expr — SQL
    # string literals eat backslashes (\b becomes backspace)
    blocks = F.regexp_extract_all(
        F.regexp_replace(F.col(html_col), _SCRIPT_RE, " "),
        F.lit(_BLOCK_RE),
        F.lit(0),
    )
    d = df.select(
        F.col(id_col),
        F.posexplode_outer(blocks).alias("pos", "block"),
    )
    anchor_texts = F.regexp_extract_all(
        F.col("block"), F.lit(r"(?is)<a\b[^>]*>(.*?)</a>"), F.lit(1)
    )
    scored = d.select(
        id_col,
        "pos",
        _block_text(F.col("block")).alias("txt"),
        F.aggregate(
            F.transform(anchor_texts, lambda a: F.length(_block_text(a))),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("link_chars"),
    ).withColumn(
        "keep",
        (F.length("txt") > 0)
        & (
            F.col("link_chars").cast("double")
            <= F.lit(float(link_density_max)) * F.length("txt").cast("double")
        ),
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("keep"), F.struct("pos", "txt")).otherwise(
                                F.lit(None)
                            )
                        )
                    ),
                    lambda s: s["txt"],
                ),
            ).alias("main_text"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
            F.sum(
                F.when(~F.col("keep") & F.col("pos").isNotNull(), 1).otherwise(0)
            ).alias("n_dropped"),
        )
    )


# ---------------------------------------------------------------------
# Mojibake repair: UTF-8 bytes mis-decoded as Latin-1 is THE dominant
# encoding damage in web corpora ('café' -> 'cafÃ©'). The inverse is
# exact: re-encode as Latin-1, re-decode as UTF-8.
# ---------------------------------------------------------------------

# Every UTF-8 lead byte 0xC2-0xF4 decoded as Latin-1 lands in U+00C2..
# U+00F4 with a continuation char in [U+0080, U+00BF] right after;
# correctly-decoded text essentially never puts a C1-control or
# Latin-1-punctuation char directly after one of those lead chars.
_MOJIBAKE_RE = "[\u00c2-\u00f4][\u0080-\u00bf]"


def repair_mojibake(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds `repaired` and `was_mojibake` columns.

    Detection is the conservative lead-byte/continuation pattern above:
    pure ASCII and correctly-decoded text never match (no Latin-1 lead
    chars). Repair additionally requires the row to be FULLY
    invertible — every char Latin-1-representable (chars above U+00FF
    would come back as '?') and the re-encoded bytes valid UTF-8
    (decode raises MALFORMED_CHARACTER_CODING under ANSI otherwise:
    the mixed-damage row 'cafÃ© price £ 5' carries a stray 0xA3 that
    is no one's continuation byte). Partially-damaged rows pass
    through unrepaired with was_mojibake=false — conservative, never
    corrupting, never failing the task. All native expressions.
    """
    s = F.col(text_col)
    latin1 = F.encode(s, "ISO-8859-1")
    repairable = (
        s.rlike(_MOJIBAKE_RE)
        # negated class, not [\u0100-\uffff]: Java regex matches CODE
        # POINTS, so supplementary-plane chars (emoji) fall outside a
        # BMP-bounded class and would slip through to a task-fatal
        # encode — "contains any char outside Latin-1" catches them
        & ~s.rlike("[^\u0000-\u00ff]")
        & F.is_valid_utf8(latin1)
    )
    repaired = F.when(repairable, F.decode(latin1, "UTF-8")).otherwise(s)
    return df.withColumn("repaired", repaired).withColumn(
        "was_mojibake", repairable
    )


# ---------------------------------------------------------------------
# URL normalization: the dedup key for crawl frontiers and the join
# key for page-level metadata. Lowercase scheme/host, strip default
# ports and fragments, drop tracking parameters, preserve the order of
# surviving parameters (reordering changes semantics for some sites).
# ---------------------------------------------------------------------

_TRACKING_PREFIXES = ("utm_",)
_TRACKING_KEYS = ("ref", "fbclid", "gclid", "mc_eid", "igshid")


def registrable_domain(host) -> Column:
    """Last two labels of a hostname ('blog.example.org' ->
    'example.org'); single-label hosts (localhost, intranet names)
    return themselves — F.slice(labels, -2, 2) alone yields an EMPTY
    array there, which silently merged every bare host into one ''
    group and made per-host robots rules unmatchable."""
    host = F.lower(F.col(host) if isinstance(host, str) else host)
    labels = F.split(host, r"\.")
    return F.when(F.size(labels) >= 2, F.concat_ws(".", F.slice(labels, -2, 2))).otherwise(
        host
    )


def normalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds url_norm, domain (registrable 2-label suffix), path_depth.

    parse_url is a native expression (java.net.URI under codegen);
    the tracking-parameter filter is a higher-order array filter — no
    UDFs, no shuffle."""
    u = F.col(url_col)
    scheme = F.lower(F.parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.parse_url(u, F.lit("HOST")))
    authority = F.lower(F.parse_url(u, F.lit("AUTHORITY")))
    # strip only the scheme's DEFAULT port; non-default ports are part
    # of the identity of the resource
    authority = F.when(
        (scheme == "http") & authority.endswith(":80"),
        F.substring(authority, 1, F.length(authority) - 3),
    ).when(
        (scheme == "https") & authority.endswith(":443"),
        F.substring(authority, 1, F.length(authority) - 4),
    ).otherwise(authority)
    path = F.parse_url(u, F.lit("PATH"))
    query = F.parse_url(u, F.lit("QUERY"))
    def _not_tracking(p):
        key = F.substring_index(p, "=", 1)
        is_tracking = key.isin(*_TRACKING_KEYS)
        for pref in _TRACKING_PREFIXES:
            is_tracking = is_tracking | key.startswith(pref)
        return (F.length(p) > 0) & ~is_tracking

    kept = F.filter(F.split(F.coalesce(query, F.lit("")), "&"), _not_tracking)
    url_norm = F.concat(
        scheme,
        F.lit("://"),
        authority,
        path,
        F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(
            F.lit("")
        ),
    )
    domain = registrable_domain(host)
    depth = F.size(F.filter(F.split(path, "/"), lambda s: F.length(s) > 0))
    return (
        df.withColumn("url_norm", url_norm)
        .withColumn("domain", domain)
        .withColumn("path_depth", depth)
    )


# ---------------------------------------------------------------------
# robots.txt (RFC 9309): the crawl-policy gate. Group selection by
# user-agent (most-specific product token, '*' fallback), then
# longest-path-match among the group's Allow/Disallow rules; Allow
# wins ties; no matching rule (or no robots.txt) means allowed.
# ---------------------------------------------------------------------


def _robots_rule_regex(rule_path: str) -> str:
    """RFC 9309 §2.2.3 rule-path pattern -> anchored Java-compatible
    regex: '*' matches any character sequence, a TRAILING '$' anchors
    the end of the path, everything else is literal (regex-escaped).
    The empty pattern compiles to '^' (matches every path at length
    0 — the allow-all sentinel)."""
    import re as _re

    anchored = rule_path.endswith("$")
    body = rule_path[:-1] if anchored else rule_path
    return (
        "^"
        + ".*".join(_re.escape(seg) for seg in body.split("*"))
        + ("$" if anchored else "")
    )


def parse_robots(robots_txt: str) -> list[dict]:
    """One robots.txt body -> rule rows
    {agent, rule_path, is_allow, rule_regex}. Consecutive User-agent
    lines share the following rule block (RFC 9309 §2.2.1); an empty
    Disallow/Allow value is the 'allow all' idiom and yields a
    SENTINEL row (rule_path '', is_allow True, length 0): it never
    out-ranks a real rule, but it keeps the group VISIBLE so that an
    agent-specific exemption group ('User-agent: bot / Disallow:')
    correctly shadows the '*' group's Disallows during group
    selection in apply_robots. rule_regex carries the §2.2.3
    wildcard semantics ('*' any-sequence, trailing '$' end-anchor)
    as a pre-compiled anchored regex so matching stays a native
    expression on the URL side."""
    rules: list[dict] = []
    agents: list[str] = []
    block_open = False  # True once rules started for current agents
    for raw in (robots_txt or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if block_open:  # a new group starts
                agents, block_open = [], False
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            block_open = True
            # empty value = allow-all idiom -> zero-length allow
            # sentinel (keeps the agent group selectable)
            is_allow = True if not val else key == "allow"
            # rule_regex ONLY for rules that need §2.2.3 semantics —
            # plain prefixes (the overwhelming majority of real robots
            # rules) keep the native startswith fast path; a non-null
            # regex per rule would recompile java Pattern per array
            # element per URL on the never-shuffled corpus side
            needs_regex = "*" in val or val.endswith("$")
            for a in agents or ["*"]:
                rules.append(
                    {
                        "agent": a,
                        "rule_path": val,
                        "is_allow": is_allow,
                        "rule_regex": (
                            _robots_rule_regex(val) if needs_regex else None
                        ),
                    }
                )
    return rules


def parse_crawl_delays(robots_txt: str) -> list[dict]:
    """One robots.txt body -> {agent, delay_sec} rows for every
    Crawl-delay directive. Crawl-delay is the de-facto politeness
    extension alongside RFC 9309 (Bing/Yandex honor it; the RFC itself
    leaves it out) and belongs to the preceding User-agent group
    exactly like Allow/Disallow — the same consecutive-User-agent
    grouping as parse_robots (a Crawl-delay line also OPENS the rule
    block, so a following User-agent starts a new group). Unparseable
    or negative values are ignored (a broken directive must not stall
    the crawl forever)."""
    delays: list[dict] = []
    agents: list[str] = []
    block_open = False
    for raw in (robots_txt or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if block_open:
                agents, block_open = [], False
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            block_open = True
        elif key == "crawl-delay":
            block_open = True
            try:
                d = float(val)
            except ValueError:
                continue
            # finite only: float() accepts 'inf'/'nan', and an inf
            # delay would cool the domain FOREVER — a parsing
            # artifact, not a directive any crawler honors
            if d >= 0 and math.isfinite(d):
                for a in agents or ["*"]:
                    delays.append({"agent": a, "delay_sec": d})
    return delays


def robots_crawl_delays(
    df: DataFrame,
    agent: str,
    domain_col: str = "domain",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """(domain, robots_txt) -> (domain, delay_sec): the Crawl-delay
    the given agent must honor per domain — the agent-specific group's
    value when one exists, else the '*' group's; domains with neither
    emit NO row (the crawl's global default applies). Duplicate
    directives in the chosen group resolve to the LARGEST delay (the
    politest reading). One row per domain on the always-tiny robots
    side, same split as robots_rules."""
    import pandas as pd

    a = agent.lower()

    def pick(batches):
        for pdf in batches:
            rows = []
            for dom, txt in zip(pdf[domain_col], pdf[robots_col]):
                ds = parse_crawl_delays(txt)
                spec = [r["delay_sec"] for r in ds if r["agent"] == a]
                star = [r["delay_sec"] for r in ds if r["agent"] == "*"]
                chosen = spec or star
                if chosen:
                    rows.append({"domain": dom, "delay_sec": max(chosen)})
            yield pd.DataFrame(rows, columns=["domain", "delay_sec"])

    return df.mapInPandas(pick, "domain string, delay_sec double")


def robots_rules(df: DataFrame, domain_col: str = "domain",
                 robots_col: str = "robots_txt") -> DataFrame:
    """(domain, robots_txt) -> (domain, agent, rule_path, is_allow,
    rule_regex). The robots side is one row per DOMAIN — always tiny
    relative to the URL corpus — so parsing in Python and
    broadcasting the result is the scale-correct split."""
    import pandas as pd

    def parse(batches):
        for pdf in batches:
            rows = []
            for dom, txt in zip(pdf[domain_col], pdf[robots_col]):
                for r in parse_robots(txt):
                    rows.append({"domain": dom, **r})
            yield pd.DataFrame(
                rows,
                columns=[
                    "domain", "agent", "rule_path", "is_allow", "rule_regex"
                ],
            )

    return df.mapInPandas(
        parse,
        "domain string, agent string, rule_path string, is_allow boolean,"
        " rule_regex string",
    )


def apply_robots(
    urls: DataFrame,
    rules: DataFrame,
    agent: str,
    domain_col: str = "domain",
    path_col: str = "path",
) -> DataFrame:
    """Adds (allowed, rule_len) to the urls frame.

    Scale shape: the rule table collapses to ONE row per domain (its
    rules as an array) and broadcasts; the URL corpus is never
    shuffled and never grows — the per-URL longest-match is an
    array_max over the matching rules (struct ordering: length first,
    then is_allow, so Allow wins length ties per RFC 9309 §2.2.2;
    rule length is the PATTERN length, wildcards counted). Group
    selection (agent-specific block if one exists — including an
    empty allow-all group, which parse_robots keeps as a zero-length
    sentinel — else '*') happens once per domain on the tiny side.
    Matching follows RFC 9309 §2.2.3 when the rules frame carries the
    rule_regex column robots_rules emits ('*' any-sequence, trailing
    '$' end-anchor, via a per-rule regexp_like); a rules frame
    without that column falls back to the literal-prefix subset. No
    matching rule, or no robots.txt for the domain, means allowed."""
    a = agent.lower()
    has_regex = "rule_regex" in rules.columns
    doms = rules.groupBy("domain").agg(
        F.max(F.when(F.col("agent") == a, 1).otherwise(0)).alias("has_agent")
    )
    rule_struct = (
        F.struct("rule_path", "is_allow", "rule_regex")
        if has_regex
        else F.struct("rule_path", "is_allow")
    )
    per_domain = (
        rules.join(doms, "domain")
        .filter(
            (F.col("agent") == a)
            | ((F.col("has_agent") == 0) & (F.col("agent") == "*"))
        )
        .groupBy("domain")
        .agg(F.collect_list(rule_struct).alias("_rules"))
        .withColumnRenamed("domain", "_rules_domain")
    )
    j = urls.join(
        F.broadcast(per_domain),
        urls[domain_col] == per_domain["_rules_domain"],
        "left",
    )
    if has_regex:
        # null rule_regex = plain-prefix rule -> native startswith;
        # only '*'/'$' rules pay the per-row regex evaluation
        matched = F.filter(
            F.coalesce(F.col("_rules"), F.array()),
            lambda r: F.when(
                r["rule_regex"].isNull(),
                F.col(path_col).startswith(r["rule_path"]),
            ).otherwise(F.regexp_like(F.col(path_col), r["rule_regex"])),
        )
    else:
        matched = F.filter(
            F.coalesce(F.col("_rules"), F.array()),
            lambda r: F.col(path_col).startswith(r["rule_path"]),
        )
    best = F.array_max(
        F.transform(
            matched,
            lambda r: F.struct(
                F.length(r["rule_path"]).alias("l"), r["is_allow"].alias("a")
            ),
        )
    )
    return j.select(
        *[urls[c] for c in urls.columns],
        F.coalesce(best["a"], F.lit(True)).alias("allowed"),
        F.coalesce(best["l"].cast("long"), F.lit(0)).alias("rule_len"),
    )


# ---------------------------------------------------------------------
# Sitemaps + link extraction: the discovery side of the crawl —
# sitemap.xml enumerates a site's canonical URLs, anchor hrefs build
# the link graph that seeds frontier expansion and PageRank-style
# quality priors.
# ---------------------------------------------------------------------



def _xml_field(entry, tag: str):
    """First <tag>...</tag> text inside an already-isolated element
    block: regexp_extract + the standard entity decode, NULL when
    absent.  Deliberately NOT xpath_string: Spark's xpath_* raise a
    task-fatal SAXParseException on malformed XML (there is no
    try_xpath), and a crawl pipeline must survive broken sitemaps —
    regexp extraction never throws and returns '' -> NULL instead."""
    txt = F.regexp_extract(entry, r"(?is)<" + tag + r"\b[^>]*>(.*?)</" + tag + ">", 1)
    for ent, ch in _ENTITIES:
        txt = F.replace(txt, F.lit(ent), F.lit(ch))
    return F.nullif(F.trim(txt), F.lit(""))


def parse_sitemap(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """Explode sitemap XML (sitemaps.org urlset) into one row per
    <url> entry: (pos, loc, lastmod, priority). All other columns
    carry through.

    All native: <url> blocks split by regexp_extract_all (keeps
    per-entry field ALIGNMENT — a flat whole-document extraction
    returns parallel arrays that silently misalign when optional
    fields are absent), then per-block field extraction with entity
    decode (_xml_field — see its docstring for why NOT xpath_string).
    Missing optional fields and malformed blocks surface as NULLs,
    never task failures."""
    blocks = F.regexp_extract_all(
        F.col(xml_col), F.lit(r"(?is)<url\b[^>]*>.*?</url>"), F.lit(0)
    )
    carry = [c for c in df.columns if c != xml_col]
    d = df.select(*carry, F.posexplode(blocks).alias("pos", "_entry"))
    return d.select(
        *carry,
        "pos",
        _xml_field(F.col("_entry"), "loc").alias("loc"),
        _xml_field(F.col("_entry"), "lastmod").alias("lastmod"),
        _xml_field(F.col("_entry"), "priority").cast("double").alias("priority"),
    )


def extract_links(
    df: DataFrame,
    html_col: str = "html",
    base_url_col: str = "base_url",
) -> DataFrame:
    """Explode every anchor href into a resolved absolute URL:
    (link_pos, dst_url), other columns carried through.

    Resolution covers the two dominant shapes: absolute links pass
    through, root-relative ('/path') links join the base URL's
    scheme://host. Protocol-relative, fragment-only, and
    dot-segment-relative hrefs are dropped (NULL) rather than
    mis-resolved — the conservative choice for a crawl frontier.
    Native regexp + parse_url throughout."""
    hrefs = F.regexp_extract_all(
        F.col(html_col),
        F.lit(r"""(?is)<a\b[^>]*\bhref\s*=\s*["']([^"'#][^"']*)["']"""),
        F.lit(1),
    )
    # AUTHORITY, not HOST: a non-default port is part of the resolved
    # origin; default-port stripping is normalize_urls' job downstream
    base = F.concat(
        F.lower(F.parse_url(F.col(base_url_col), F.lit("PROTOCOL"))),
        F.lit("://"),
        F.lower(F.parse_url(F.col(base_url_col), F.lit("AUTHORITY"))),
    )
    carry = [c for c in df.columns if c != html_col]
    d = df.select(
        *carry, base.alias("_base"), F.posexplode(hrefs).alias("link_pos", "_href")
    )
    dst = (
        F.when(F.col("_href").rlike("(?i)^https?://"), F.col("_href"))
        .when(
            F.col("_href").startswith("/") & ~F.col("_href").startswith("//"),
            F.concat(F.col("_base"), F.col("_href")),
        )
        .otherwise(F.lit(None))
    )
    return d.select(*carry, "link_pos", dst.alias("dst_url")).filter(
        F.col("dst_url").isNotNull()
    )


def parse_sitemap_index(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """Explode a sitemaps.org <sitemapindex> into one row per child
    sitemap: (pos, child_loc, lastmod). Same block-split +
    per-block-field shape as parse_sitemap (alignment under optional
    fields, malformed blocks -> NULLs not task failures); the caller joins child_loc against its sitemap store and
    runs parse_sitemap on the children — two bounded levels, exactly
    the protocol's nesting limit (index files may not reference other
    index files)."""
    blocks = F.regexp_extract_all(
        F.col(xml_col), F.lit(r"(?is)<sitemap\b[^>]*>.*?</sitemap>"), F.lit(0)
    )
    carry = [c for c in df.columns if c != xml_col]
    d = df.select(*carry, F.posexplode(blocks).alias("pos", "_entry"))
    return d.select(
        *carry,
        "pos",
        _xml_field(F.col("_entry"), "loc").alias("child_loc"),
        _xml_field(F.col("_entry"), "lastmod").alias("lastmod"),
    )


def parse_feed(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """Explode RSS 2.0 / Atom feeds into one row per item — the feed
    half of discovery alongside sitemaps (changed-content polling):
    (format, pos, title, link, published, entry_id), other columns
    carried through, both formats normalized to one schema.

    Same native-regex discipline as parse_sitemap (block split keeps
    per-entry field alignment; no xpath_* — malformed feeds must
    surface NULLs, not task-fatal SAX errors). Format sniffed per
    row from the root element; RSS carries link/pubDate/guid as
    element text, Atom carries link as an href ATTRIBUTE and
    updated/id as text — the parser normalizes both spellings.
    """
    xml = F.col(xml_col)
    fmt = (
        F.when(xml.rlike(r"(?is)<rss\b"), F.lit("rss"))
        .when(xml.rlike(r"(?is)<feed\b"), F.lit("atom"))
        .otherwise(F.lit(None))
    )
    rss_blocks = F.regexp_extract_all(
        xml, F.lit(r"(?is)<item\b[^>]*>.*?</item>"), F.lit(0)
    )
    atom_blocks = F.regexp_extract_all(
        xml, F.lit(r"(?is)<entry\b[^>]*>.*?</entry>"), F.lit(0)
    )
    carry = [c for c in df.columns if c != xml_col]
    d = df.select(
        *carry,
        fmt.alias("format"),
        F.posexplode(
            F.when(fmt == "rss", rss_blocks).otherwise(atom_blocks)
        ).alias("pos", "_entry"),
    )
    e = F.col("_entry")
    atom_href = F.nullif(
        F.regexp_extract(
            e, r"""(?is)<link\b[^>]*\bhref\s*=\s*["']([^"']+)["']""", 1
        ),
        F.lit(""),
    )
    return d.select(
        *carry,
        "format",
        "pos",
        _xml_field(e, "title").alias("title"),
        F.when(F.col("format") == "rss", _xml_field(e, "link"))
        .otherwise(atom_href)
        .alias("link"),
        F.when(F.col("format") == "rss", _xml_field(e, "pubDate"))
        .otherwise(_xml_field(e, "updated"))
        .alias("published"),
        F.when(F.col("format") == "rss", _xml_field(e, "guid"))
        .otherwise(_xml_field(e, "id"))
        .alias("entry_id"),
    )


def feed_published_epoch(
    df: DataFrame, col: str = "published", out: str = "published_epoch"
) -> DataFrame:
    """Normalize the two wild-feed date dialects to ONE epoch-seconds
    column — the crawl scheduler's freshness key (poll ordering,
    re-crawl intervals, lastmod comparisons all need numbers, not the
    strings parse_feed passes through):

    - RSS 2.0 pubDate is RFC 822: 'Mon, 05 Jan 2026 10:30:00 +0000'
      (numeric offset) or '... GMT' (zone name). Spark's formatter
      cannot PARSE the day-of-week letter ('E' is format-only), so
      the leading day name is stripped before the pattern ladder.
      RFC 822's date syntax is 1*2DIGIT, so 'Mon, 5 Jan 2026 ...'
      (single-digit day, no zero pad) is valid on the wire — the
      single-'d' patterns in the ladder catch it (strict 'dd' alone
      would NULL it, and the feed pipeline would silently skip the
      entry as undated; r12 ADVICE).
    - Atom updated/published is ISO 8601 / RFC 3339:
      '2026-02-05T08:15:30Z' or with a numeric offset '+05:30'.

    Each candidate pattern goes through try_to_timestamp (malformed
    dates surface as NULL, never task failures — the sitemap/feed
    parser discipline); first hit wins. Epoch seconds are
    timezone-closed integers, so the column hash-gates across
    engines."""
    c = F.col(col)
    stripped = F.regexp_replace(c, r"^[A-Za-z]{3},\s*", "")
    ts = F.coalesce(
        F.try_to_timestamp(stripped, F.lit("dd MMM yyyy HH:mm:ss Z")),
        F.try_to_timestamp(stripped, F.lit("dd MMM yyyy HH:mm:ss zzz")),
        F.try_to_timestamp(stripped, F.lit("d MMM yyyy HH:mm:ss Z")),
        F.try_to_timestamp(stripped, F.lit("d MMM yyyy HH:mm:ss zzz")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ss")),
    )
    return df.withColumn(out, F.unix_timestamp(ts).cast("long"))


def meta_robots_directives(
    df: DataFrame, html_col: str = "html"
) -> DataFrame:
    """Per-page robots META directives + canonical URL — the
    page-level half of crawl politeness (robots.txt grants the FETCH;
    `<meta name="robots">` governs what the corpus may KEEP: noindex
    pages must not enter the training set, nofollow pages must not
    feed link expansion; rel=canonical is the dedup key search
    engines honor before any content hash). Adds:

    - `noindex`, `nofollow`: token-level membership in the robots
      meta content (comma/space separated, case-insensitive; both
      attribute orders matched — real HTML puts name= and content= in
      either order, the parse_meta_tags discipline);
    - `canonical`: the <link rel="canonical"> href (either attribute
      order), NULL when absent.

    Native regexp only; malformed markup yields NULLs/false, never
    task failures."""
    h = F.col(html_col)
    content = F.coalesce(
        F.nullif(
            F.regexp_extract(
                h,
                r"""(?is)<meta\b[^>]*\bname\s*=\s*["']robots["'][^>]*\bcontent\s*=\s*["']([^"']*)["']""",
                1,
            ),
            F.lit(""),
        ),
        F.nullif(
            F.regexp_extract(
                h,
                r"""(?is)<meta\b[^>]*\bcontent\s*=\s*["']([^"']*)["'][^>]*\bname\s*=\s*["']robots["']""",
                1,
            ),
            F.lit(""),
        ),
    )
    tokens = F.transform(
        F.split(F.lower(F.coalesce(content, F.lit(""))), r"[,\s]+"),
        lambda t: F.trim(t),
    )
    canonical = F.coalesce(
        F.nullif(
            F.regexp_extract(
                h,
                r"""(?is)<link\b[^>]*\brel\s*=\s*["']canonical["'][^>]*\bhref\s*=\s*["']([^"']+)["']""",
                1,
            ),
            F.lit(""),
        ),
        F.nullif(
            F.regexp_extract(
                h,
                r"""(?is)<link\b[^>]*\bhref\s*=\s*["']([^"']+)["'][^>]*\brel\s*=\s*["']canonical["']""",
                1,
            ),
            F.lit(""),
        ),
    )
    return (
        df.withColumn("robots_meta", content)
        .withColumn("noindex", F.array_contains(tokens, "noindex"))
        .withColumn("nofollow", F.array_contains(tokens, "nofollow"))
        .withColumn("canonical", canonical)
    )


def parse_meta_tags(
    df: DataFrame, props: list[str], html_col: str = "html"
) -> DataFrame:
    """Extract <meta property=... content=...> values (OpenGraph /
    twitter cards — the social-preview metadata a crawler indexes
    alongside main content): one output column per requested
    property, entity-decoded, NULL when absent.

    Real-world HTML puts the attributes in EITHER order
    (property-first or content-first); both spellings are matched and
    coalesced. Same native-regex discipline as the sitemap/feed
    parsers — malformed markup yields NULLs, never parser errors.
    Column names replace ':' with '_'."""
    out_cols = []
    for p in props:
        fwd = F.regexp_extract(
            F.col(html_col),
            r"""(?is)<meta\b[^>]*\bproperty\s*=\s*["']"""
            + p
            + r"""["'][^>]*\bcontent\s*=\s*["']([^"']*)["']""",
            1,
        )
        rev = F.regexp_extract(
            F.col(html_col),
            r"""(?is)<meta\b[^>]*\bcontent\s*=\s*["']([^"']*)["']"""
            + r"""[^>]*\bproperty\s*=\s*["']""" + p + r"""["']""",
            1,
        )
        v = F.nullif(fwd, F.lit(""))
        v = F.coalesce(v, F.nullif(rev, F.lit("")))
        for ent, ch in _ENTITIES:
            v = F.replace(v, F.lit(ent), F.lit(ch))
        out_cols.append(v.alias(p.replace(":", "_")))
    carry = [c for c in df.columns if c != html_col]
    return df.select(*carry, *out_cols)
