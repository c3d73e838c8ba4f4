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
  a per-batch word→tokens memo (natural-language batches repeat most
  words, so the memo collapses the per-row cost to a dict lookup).

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


def _symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (END,)


def learn_merges(
    word_freqs: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word-frequency table.

    Exact algorithm (no sampling): each round counts adjacent symbol
    pairs weighted by word frequency, merges the most frequent pair
    (ties: lexicographically smallest, so the result is deterministic),
    and rewrites only the words that contain it (indexed by pair, the
    standard speedup)."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, f in word_freqs:
        if w:
            vocab[_symbols(w)] = vocab.get(_symbols(w), 0) + int(f)

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
) -> list[tuple[str, str]]:
    """Distributed word counting + driver-side merge learning.

    Only the distinct-word frequency table crosses to the driver —
    bounded by `min_freq` (drop hapax noise) and `max_words` (keep the
    top of the Zipf curve; ordering ties break on the word so the cut
    is deterministic)."""
    wf = word_frequencies(docs, text_col)
    if min_freq > 1:
        wf = wf.filter(F.col("freq") >= min_freq)
    if max_words is not None:
        wf = wf.orderBy(F.desc("freq"), F.asc("word")).limit(max_words)
    rows = wf.collect()
    return learn_merges([(r["word"], r["freq"]) for r in rows], n_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word, lowest-rank (earliest-learned) first —
    the classic greedy BPE encoder."""
    syms = list(_symbols(word))
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


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distributed encode: (id, tokens, n_tokens, n_words) per row.

    The merge-rank dict rides the closure (broadcast once per
    executor); a per-batch word→tokens memo collapses repeated words to
    a lookup, which on natural text is the overwhelming majority."""
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
                        t = encode_word(w, ranks)
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


SPECIAL_TOKENS = ("<|pad|>", "<|bos|>", "<|eos|>", "<|unk|>")


def build_vocab(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    specials: tuple = SPECIAL_TOKENS,
) -> dict[str, int]:
    """token -> id. Specials first (fixed ids regardless of corpus),
    then the observed base characters + {END} (sorted — deterministic),
    then merged tokens in merge order (rank order is the conventional
    id layout: lower id == earlier merge == more frequent).

    The character inventory is one distinct-aggregation over the corpus
    (explode chars of distinct words — vocabulary-sized, not
    corpus-sized)."""
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
) -> DataFrame:
    """Distributed encode to id sequences: (id, token_ids, n_tokens).

    Same broadcast ranks + per-batch memo as bpe_encode; tokens outside
    the vocab (characters unseen at vocab-build time) map to <|unk|> —
    loud in the id stream, never a crash. `add_bos_eos` frames each
    document for next-token training (the sequence-packing input
    shape)."""
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
                        got = [vocab.get(t, unk) for t in encode_word(w, ranks)]
                        memo[w] = got
                    out.extend(got)
                if add_bos_eos:
                    out.append(eos)
                ids.append(rid)
                seqs.append(out)
                ns.append(len(out))
            yield pd.DataFrame({id_col: ids, "token_ids": seqs, "n_tokens": ns})

    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)
