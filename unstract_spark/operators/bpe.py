"""Byte-pair encoding over the corpus: distributed counting, exact
classic merges, distributed encode.

A training-data pipeline needs real subword tokenization, not just the
whitespace/regex token counts in text_analysis.py. BPE (Sennrich et
al. 2016, ACL — public algorithm) splits cleanly along Spark's
execution model:

- **Word counting is the corpus-scale part** — one explode + groupBy
  shuffle produces the distinct-word frequency table. At 100 TB of
  text that table is |vocabulary|-sized (tens of millions of rows, not
  trillions), which is why every published BPE trainer learns merges
  from the frequency dict rather than the raw corpus; `min_freq` /
  `max_words` bound it further (rare words contribute ~nothing to pair
  statistics).
- **Merge learning is sequential by nature** (each merge changes the
  pair statistics the next one is chosen from), so it runs driver-side
  over the collected frequency table — the same "small model state on
  the driver, big data stays distributed" split as the IVF centroids
  in similarity.py.
- **Encoding is the distributed hot path** — merge ranks broadcast to
  executors, applied per word inside an Arrow-batched mapInPandas with
  a size-capped per-partition word→tokens memo (natural-language
  batches repeat most words, so the memo collapses the per-row cost to
  a dict lookup; the cap bounds task memory on adversarial vocabularies).

Both a char-level and a byte-level (GPT-2 relabeled UTF-8 alphabet)
variant: byte-level is what a production training pipeline deploys —
every unicode string round-trips with zero <|unk|>.

Determinism: pair selection breaks frequency ties lexicographically,
so the learned merge list — and therefore every encoded token — is a
pure function of the corpus. The first-iteration pair statistics are
SQL-expressible and oracle-gated (queries.bpe_pair_counts); the
iterative trainer+encoder are gated by pytest against an independent
naive implementation plus a lossless-roundtrip property.

Reference: the reference SDK counts tokens by calling provider
tokenizers (sdk1 usage hooks); it ships no trainer. This is the
beyond-reference training-data-pipeline scope.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

END = "</w>"

# Per-task encode-memo bound: distinct words cached per mapInPandas
# task before the memo resets. Caps task memory on adversarially
# diverse partitions (random-string corpora); on natural text the
# Zipf head repopulates within one batch of a reset.
_MEMO_CAP = 200_000


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace-split tokens — the one corpus-scale
    shuffle. Map-side partial aggregation makes the shuffle carry
    per-partition distinct words, not the corpus."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def pair_frequencies(words: DataFrame) -> DataFrame:
    """First-iteration adjacent-symbol pair counts (symbols = chars +
    trailing {END}), weighted by word frequency — all JVM-side
    (posexplode over a sequence; no Python in the loop). This is the
    statistic each training iteration maximizes over."""
    return (
        words.select(
            "freq",
            F.posexplode(F.sequence(F.lit(1), F.length("word"))).alias("_p", "i"),
            F.col("word"),
        )
        .select(
            F.expr("substr(word, i, 1)").alias("a"),
            F.expr(
                f"CASE WHEN i < length(word) THEN substr(word, i + 1, 1) ELSE '{END}' END"
            ).alias("b"),
            "freq",
        )
        .groupBy("a", "b")
        .agg(F.sum("freq").alias("freq"))
    )


def pair_frequencies_bytes(words: DataFrame) -> DataFrame:
    """Byte-level twin of pair_frequencies: adjacent BYTE-pair counts
    (+ trailing END), weighted by word frequency — the statistic the
    byte-level trainer maximizes. Symbols are the word's UTF-8 bytes
    relabeled as 2-hex-char strings (a pure alphabet relabeling of the
    GPT-2 byte alphabet — counts are label-invariant), which keeps the
    whole computation JVM-side (encode + hex + substr; no Python) and
    makes the SQL twin a straight transliteration."""
    h = F.hex(F.encode(F.col("word"), "UTF-8"))
    n = (F.length(h) / 2).cast("int")
    return (
        words.select("freq", h.alias("_h"), n.alias("_n"))
        .select(
            "freq",
            "_h",
            "_n",
            F.posexplode(F.sequence(F.lit(1), F.col("_n"))).alias("_p", "i"),
        )
        .select(
            F.expr("substr(_h, i * 2 - 1, 2)").alias("a"),
            F.expr(
                f"CASE WHEN i < _n THEN substr(_h, i * 2 + 1, 2) "
                f"ELSE '{END}' END"
            ).alias("b"),
            "freq",
        )
        .groupBy("a", "b")
        .agg(F.sum("freq").alias("freq"))
    )


def _symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (END,)


# --- byte-level alphabet (GPT-2 style) -------------------------------
#
# Production tokenizers operate on UTF-8 BYTES, not unicode chars, so
# any byte sequence round-trips with zero <|unk|>. The standard trick
# (Radford et al. 2019, the public GPT-2 byte-level BPE) relabels each
# of the 256 bytes as one printable unicode char: printable latin bytes
# keep themselves, everything else shifts to 256+n — so the merge
# machinery (which works on strings) applies unchanged, and decode is
# an exact inverse table.


def _build_byte_tables() -> tuple[dict[int, str], dict[str, int]]:
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    enc: dict[int, str] = {b: chr(b) for b in keep}
    n = 0
    for b in range(256):
        if b not in enc:
            enc[b] = chr(256 + n)
            n += 1
    dec = {c: b for b, c in enc.items()}
    return enc, dec


_BYTE_ENC, _BYTE_DEC = _build_byte_tables()


def byte_symbols(word: str) -> tuple[str, ...]:
    """Word -> per-byte symbol tuple (+ END), in the relabeled alphabet."""
    return tuple(_BYTE_ENC[b] for b in word.encode("utf-8")) + (END,)


def byte_merges_to_symbols(
    byte_merges: list[tuple[bytes | str, bytes | str]],
) -> list[tuple[str, str]]:
    """Translate merges given as raw byte strings (or the END marker)
    into the relabeled alphabet the encoder works in."""

    def _m(side: bytes | str) -> str:
        if side == END:
            return END
        if isinstance(side, str):
            side = side.encode("utf-8")
        return "".join(_BYTE_ENC[b] for b in side)

    return [(_m(a), _m(b)) for a, b in byte_merges]


def decode_tokens(tokens: list[str], byte_level: bool = False) -> str:
    """Inverse of the encoder for round-trip checks: tokens -> text
    (words re-joined with single spaces; the END marker delimits words).
    Caveat: raw text containing the literal END marker string would
    alias the delimiter — natural-language corpora don't."""
    joined = "".join(tokens)
    words = [w for w in joined.split(END) if w != ""]
    if byte_level:
        words = [
            bytes(_BYTE_DEC[c] for c in w).decode("utf-8", errors="strict")
            for w in words
        ]
    return " ".join(words)


def learn_merges(
    word_freqs: list[tuple[str, int]],
    n_merges: int,
    byte_level: bool = False,
) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word-frequency table.

    Exact algorithm (no sampling): each round counts adjacent symbol
    pairs weighted by word frequency, merges the most frequent pair
    (ties: lexicographically smallest, so the result is deterministic),
    and rewrites only the words that contain it (indexed by pair, the
    standard speedup). `byte_level` learns over the relabeled UTF-8
    byte alphabet instead of unicode chars."""
    to_syms = byte_symbols if byte_level else _symbols
    vocab: dict[tuple[str, ...], int] = {}
    for w, f in word_freqs:
        if w:
            s = to_syms(w)
            vocab[s] = vocab.get(s, 0) + int(f)

    pair_counts: Counter = Counter()
    where: dict[tuple[str, str], set[tuple[str, ...]]] = {}
    for syms, f in vocab.items():
        for p in zip(syms, syms[1:]):
            pair_counts[p] += f
            where.setdefault(p, set()).add(syms)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best_count = 0
        for c in pair_counts.values():
            if c > best_count:
                best_count = c
        if best_count <= 0:
            break
        pair = min(p for p, c in pair_counts.items() if c == best_count)
        merges.append(pair)
        joined = pair[0] + pair[1]
        for syms in list(where.get(pair, ())):
            f = vocab.pop(syms, None)
            if f is None:
                continue
            # un-count old pairs
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= f
                s = where.get(p)
                if s is not None:
                    s.discard(syms)
            # rewrite the word with every occurrence of the pair merged
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new = tuple(out)
            vocab[new] = vocab.get(new, 0) + f
            for p in zip(new, new[1:]):
                pair_counts[p] += f
                where.setdefault(p, set()).add(new)
        pair_counts.pop(pair, None)
        where.pop(pair, None)
    return merges


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    min_freq: int = 1,
    max_words: int | None = None,
    byte_level: bool = False,
) -> list[tuple[str, str]]:
    """Distributed word counting + driver-side merge learning.

    Only the distinct-word frequency table crosses to the driver —
    bounded by `min_freq` (drop hapax noise) and `max_words` (keep the
    top of the Zipf curve; ordering ties break on the word so the cut
    is deterministic). `byte_level=True` trains over UTF-8 bytes (the
    GPT-2 relabeled alphabet): every string round-trips losslessly, no
    <|unk|> for unseen unicode."""
    wf = word_frequencies(docs, text_col)
    if min_freq > 1:
        wf = wf.filter(F.col("freq") >= min_freq)
    if max_words is not None:
        wf = wf.orderBy(F.desc("freq"), F.asc("word")).limit(max_words)
    rows = wf.collect()
    return learn_merges(
        [(r["word"], r["freq"]) for r in rows], n_merges, byte_level=byte_level
    )


def encode_symbols(
    syms_in: tuple[str, ...], ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Apply merges to one symbol sequence, lowest-rank
    (earliest-learned) first — the classic greedy BPE encoder."""
    syms = list(syms_in)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def encode_word(
    word: str, ranks: dict[tuple[str, str], int], byte_level: bool = False
) -> list[str]:
    """Greedy-encode one word (char symbols, or relabeled UTF-8 bytes)."""
    return encode_symbols(
        byte_symbols(word) if byte_level else _symbols(word), ranks
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    byte_level: bool = False,
) -> DataFrame:
    """Distributed encode: (id, tokens, n_tokens, n_words) per row.

    The merge-rank dict rides the closure (broadcast once per
    executor); a per-partition word→tokens memo collapses repeated
    words to a lookup (natural-language batches repeat most words).
    The memo is capped at _MEMO_CAP distinct words and reset when full,
    so a task over a huge partition holds bounded memory — on a Zipf
    vocabulary the hot words repopulate instantly after a reset."""
    ranks = {p: i for i, p in enumerate(merges)}
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"`{id_col}` {id_type}, tokens array<string>, n_tokens long, n_words long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            ids, toks, n_toks, n_words = [], [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in (text or "").split() if w]
                out: list[str] = []
                for w in words:
                    t = memo.get(w)
                    if t is None:
                        if len(memo) >= _MEMO_CAP:
                            memo.clear()
                        t = encode_word(w, ranks, byte_level)
                        memo[w] = t
                    out.extend(t)
                ids.append(rid)
                toks.append(out)
                n_toks.append(len(out))
                n_words.append(len(words))
            yield pd.DataFrame(
                {id_col: ids, "tokens": toks, "n_tokens": n_toks, "n_words": n_words}
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)


# Fixed merge lists for the oracle-gated encode queries. Encoding with
# a FIXED merge list is deterministic string rewriting, so DuckDB can
# reproduce it exactly (nested delimiter-wrapped replace() in rank
# order — see queries.py _bpe_rewrite_sql); that upgrades the encode
# gate from rows-only to a full value-hash match. The lists are
# well-formed (every composite operand is produced by an earlier
# merge), which is the property that makes in-rank-order full rewriting
# equal to the greedy lowest-rank encoder. Chains (t+h -> th+e ->
# the+</w>) deliberately exercise rank ordering.
FIXED_MERGES: list[tuple[str, str]] = [
    ("t", "h"),
    ("th", "e"),
    ("the", END),
    ("i", "n"),
    ("in", "g"),
    ("ing", END),
    ("e", "r"),
    ("a", "n"),
    ("an", "d"),
    ("and", END),
    ("o", "n"),
    ("r", "e"),
    ("a", "t"),
    ("e", "n"),
    ("o", "r"),
    ("e", END),
    ("s", END),
    ("d", END),
    ("t", END),
    ("y", END),
    ("o", "f"),
    ("of", END),
    ("t", "o"),
    ("to", END),
]

# Byte-level twin: same chains expressed as raw UTF-8 bytes, plus the
# two-byte sequence of 'é' (a merge only a byte-level tokenizer can
# express — a char-level one never sees half a codepoint).
FIXED_BYTE_MERGES: list[tuple[bytes | str, bytes | str]] = [
    (b"t", b"h"),
    (b"th", b"e"),
    (b"the", END),
    (b"i", b"n"),
    (b"in", b"g"),
    (b"ing", END),
    (b"e", b"r"),
    (b"a", b"n"),
    (b"an", b"d"),
    (b"and", END),
    (b"o", b"n"),
    (b"r", b"e"),
    (b"a", b"t"),
    (b"e", b"n"),
    (b"o", b"r"),
    (b"e", END),
    (b"s", END),
    (b"d", END),
    (b"t", END),
    (b"y", END),
    (b"\xc3", b"\xa9"),
]

SPECIAL_TOKENS = ("<|pad|>", "<|bos|>", "<|eos|>", "<|unk|>")


def build_vocab(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    specials: tuple = SPECIAL_TOKENS,
    byte_level: bool = False,
) -> dict[str, int]:
    """token -> id. Specials first (fixed ids regardless of corpus),
    then the base alphabet (sorted — deterministic), then merged tokens
    in merge order (rank order is the conventional id layout: lower id
    == earlier merge == more frequent).

    Char-level: the character inventory is one distinct-aggregation
    over the corpus (explode chars of distinct words — vocabulary-
    sized, not corpus-sized). Byte-level: the alphabet is the fixed 256
    relabeled bytes + END — no corpus scan, and <|unk|> can never fire
    (every byte sequence is encodable)."""
    if byte_level:
        base = sorted({_BYTE_ENC[b] for b in range(256)} | {END})
    else:
        chars = (
            docs.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("w"))
            .filter(F.col("w") != "")
            .select(F.explode(F.split(F.col("w"), "")).alias("c"))
            .filter(F.col("c") != "")
            .distinct()
            .collect()
        )
        base = sorted({r["c"] for r in chars} | {END})
    vocab: dict[str, int] = {}
    for s in specials:
        vocab[s] = len(vocab)
    for c in base:
        vocab[c] = len(vocab)
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    return vocab


def bpe_encode_ids(
    df: DataFrame,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
    add_bos_eos: bool = False,
    byte_level: bool = False,
) -> DataFrame:
    """Distributed encode to id sequences: (id, token_ids, n_tokens).

    Same broadcast ranks + capped per-partition memo as bpe_encode;
    tokens outside the vocab (characters unseen at vocab-build time)
    map to <|unk|> — loud in the id stream, never a crash (with
    `byte_level` vocabs <|unk|> is unreachable: all 256 bytes are base
    tokens). `add_bos_eos` frames each document for next-token training
    (the sequence-packing input shape)."""
    ranks = {p: i for i, p in enumerate(merges)}
    unk = vocab["<|unk|>"]
    bos, eos = vocab["<|bos|>"], vocab["<|eos|>"]
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"`{id_col}` {id_type}, token_ids array<long>, n_tokens long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[int]] = {}
        for pdf in batches:
            ids, seqs, ns = [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                out: list[int] = [bos] if add_bos_eos else []
                for w in (text or "").split():
                    got = memo.get(w)
                    if got is None:
                        if len(memo) >= _MEMO_CAP:
                            memo.clear()
                        got = [
                            vocab.get(t, unk)
                            for t in encode_word(w, ranks, byte_level)
                        ]
                        memo[w] = got
                    out.extend(got)
                if add_bos_eos:
                    out.append(eos)
                ids.append(rid)
                seqs.append(out)
                ns.append(len(out))
            yield pd.DataFrame({id_col: ids, "token_ids": seqs, "n_tokens": ns})

    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)


def save_tokenizer(
    path: str,
    merges: list[tuple[str, str]],
    vocab: dict[str, int] | None = None,
    byte_level: bool = False,
) -> None:
    """Persist a trained tokenizer as one JSON artifact (the
    HuggingFace-style layout: ordered merge list + token->id vocab +
    flags). Training is expensive and corpus-wide; encoding runs in
    every downstream job — the artifact is what crosses that boundary."""
    import json
    import os

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {
        "version": 1,
        "byte_level": byte_level,
        "merges": [[a, b] for a, b in merges],
        "vocab": vocab,
    }
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)  # atomic publish


def load_tokenizer(path: str) -> tuple[list[tuple[str, str]], dict[str, int] | None, bool]:
    """(merges, vocab, byte_level) — inverse of save_tokenizer."""
    import json

    with open(path) as f:
        payload = json.load(f)
    merges = [tuple(p) for p in payload["merges"]]
    return merges, payload.get("vocab"), bool(payload.get("byte_level"))
