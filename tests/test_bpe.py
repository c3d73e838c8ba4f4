"""BPE trainer/encoder vs an independent naive implementation.

The distributed statistic (pair counts) is SQL-oracle-gated by
queries.bpe_pair_counts; here the sequential pieces are gated: the
incremental indexed trainer must match a from-scratch recount trainer
merge-for-merge, the greedy encoder must be lossless, and the Spark
encode stage must agree with the driver-side encoder row-for-row.
"""

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from unstract_spark.operators.bpe import (
    END,
    bpe_encode,
    encode_word,
    learn_merges,
    train_bpe,
)


def naive_learn(word_freqs, n_merges):
    """From-scratch reference: recount every pair each round (the
    textbook algorithm with no indexing), same tie-break."""
    vocab = {}
    for w, f in word_freqs:
        if w:
            key = tuple(w) + (END,)
            vocab[key] = vocab.get(key, 0) + int(f)
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for syms, f in vocab.items():
            for p in zip(syms, syms[1:]):
                counts[p] += f
        if not counts:
            break
        best = max(counts.values())
        pair = min(p for p, c in counts.items() if c == best)
        merges.append(pair)
        joined = pair[0] + pair[1]
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return merges


CORPUS = [
    ("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
    ("new", 2), ("wider", 1), ("lowest", 2),
]


def test_incremental_trainer_matches_naive():
    assert learn_merges(CORPUS, 20) == naive_learn(CORPUS, 20)


def test_trainer_deterministic_and_tiebreaks_lexicographic():
    assert learn_merges(CORPUS, 10) == learn_merges(list(reversed(CORPUS)), 10)
    # two pairs with equal count -> the lexicographically smaller merges
    m = learn_merges([("ab", 1), ("cd", 1)], 1)
    assert m[0] == ("a", "b")


def test_trainer_stops_when_saturated():
    m = learn_merges([("aa", 3)], 50)
    # "aa</w>" fully merges in 2 steps; no infinite loop after
    assert len(m) == 2


def test_encode_word_greedy_rank_order():
    merges = learn_merges(CORPUS, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    toks = encode_word("newest", ranks)
    assert "".join(toks) == "newest" + END
    # a word with no learned pairs stays fully split
    assert encode_word("xyz", ranks) == ["x", "y", "z", END]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.text(alphabet="abcde", min_size=1, max_size=6),
                  st.integers(min_value=1, max_value=9)),
        min_size=1, max_size=12,
    ),
    st.integers(min_value=0, max_value=15),
)
def test_trainer_property_incremental_equals_naive(word_freqs, n):
    assert learn_merges(word_freqs, n) == naive_learn(word_freqs, n)


@settings(max_examples=25, deadline=None)
@given(st.text(alphabet="ab cd", min_size=0, max_size=40))
def test_encode_lossless_roundtrip(text):
    merges = learn_merges([(w, 1) for w in text.split()], 8)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in text.split():
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + END


def test_spark_encode_matches_driver(spark):
    docs = spark.createDataFrame(
        [(1, "the newest widest low"), (2, "lower the the newest"), (3, None), (4, "")],
        "doc_id long, text string",
    )
    merges = train_bpe(docs, n_merges=12)
    assert merges == naive_learn(
        Counter(w for t in ["the newest widest low", "lower the the newest"]
                for w in t.split()).items(),
        12,
    )
    ranks = {p: i for i, p in enumerate(merges)}
    rows = {r.doc_id: r for r in bpe_encode(docs, merges).collect()}
    for did, text in [(1, "the newest widest low"), (2, "lower the the newest")]:
        expect = [t for w in text.split() for t in encode_word(w, ranks)]
        assert list(rows[did].tokens) == expect
        assert rows[did].n_tokens == len(expect)
        assert rows[did].n_words == len(text.split())
    assert rows[3].n_tokens == 0 and rows[4].n_words == 0


def test_train_bpe_min_freq_and_max_words(spark):
    docs = spark.createDataFrame(
        [(1, "aa aa aa bb bb zz")], "doc_id long, text string"
    )
    # min_freq=2 drops the hapax "zz"; its chars never merge
    merges = train_bpe(docs, n_merges=10, min_freq=2)
    flat = "".join(a + b for a, b in merges)
    assert "z" not in flat and ("a", END) in merges  # '</w>' sorts before 'a'
    # max_words=1 keeps only "aa" (freq 3): every merge is a/END-only
    merges1 = train_bpe(docs, n_merges=10, max_words=1)
    assert merges1 == [("a", END), ("a", "a" + END)]


@pytest.mark.parametrize("word", ["a", "ab", "hello"])
def test_encode_no_merges(word):
    assert encode_word(word, {}) == list(word) + [END]


def test_build_vocab_layout_and_ids(spark):
    from unstract_spark.operators.bpe import SPECIAL_TOKENS, build_vocab

    docs = spark.createDataFrame(
        [(1, "abab abab baba")], "doc_id long, text string"
    )
    merges = train_bpe(docs, n_merges=4)
    vocab = build_vocab(docs, merges)
    # specials pinned at 0..3 regardless of corpus
    for i, s in enumerate(SPECIAL_TOKENS):
        assert vocab[s] == i
    # base chars + END next, sorted
    assert vocab[END] == 4 and vocab["a"] == 5 and vocab["b"] == 6
    # merged tokens follow in merge (rank) order
    ranks = [vocab[a + b] for a, b in merges]
    assert ranks == sorted(ranks) and min(ranks) == 7


def test_bpe_encode_ids_roundtrip_and_unk(spark):
    from unstract_spark.operators.bpe import bpe_encode_ids, build_vocab

    train = spark.createDataFrame(
        [(1, "hello world hello world")], "doc_id long, text string"
    )
    merges = train_bpe(train, n_merges=8)
    vocab = build_vocab(train, merges)
    inv = {v: k for k, v in vocab.items()}
    # encode a doc with one unseen character -> <|unk|> id, no crash
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "hello Zorld")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in bpe_encode_ids(docs, merges, vocab).collect()}
    toks1 = [inv[i] for i in rows[1].token_ids]
    assert "".join(toks1) == "hello" + END + "world" + END
    assert vocab["<|unk|>"] in rows[2].token_ids
    assert rows[1].n_tokens == len(rows[1].token_ids)
    # bos/eos framing
    framed = {
        r.doc_id: list(r.token_ids)
        for r in bpe_encode_ids(docs, merges, vocab, add_bos_eos=True).collect()
    }
    assert framed[1][0] == vocab["<|bos|>"] and framed[1][-1] == vocab["<|eos|>"]


# --- byte-level variant ------------------------------------------------


def test_byte_tables_are_a_bijection():
    from unstract_spark.operators.bpe import _BYTE_DEC, _BYTE_ENC

    assert len(_BYTE_ENC) == 256
    assert len(_BYTE_DEC) == 256
    assert all(_BYTE_DEC[_BYTE_ENC[b]] == b for b in range(256))
    # printable ASCII keeps itself (GPT-2 convention)
    assert _BYTE_ENC[ord("A")] == "A" and _BYTE_ENC[ord("~")] == "~"
    # control bytes and high bytes are relabeled out of the way
    assert ord(_BYTE_ENC[0]) >= 256 and ord(_BYTE_ENC[ord(" ")]) >= 256


def test_byte_symbols_split_multibyte_codepoints():
    from unstract_spark.operators.bpe import byte_symbols

    syms = byte_symbols("é")  # 2 UTF-8 bytes -> 2 symbols + END
    assert len(syms) == 3 and syms[-1] == END
    assert byte_symbols("a")[:-1] == ("a",)
    emoji = byte_symbols("🎉")
    assert len(emoji) == 5  # 4 bytes + END


@given(
    st.lists(
        st.text(
            st.characters(blacklist_categories=("Zs", "Cs", "Cc")),
            min_size=1,
            max_size=8,
        ).filter(lambda w: "</w>" not in w),
        min_size=0,
        max_size=6,
    )
)
@settings(max_examples=60, deadline=None)
def test_byte_encode_roundtrips_any_unicode(words):
    """Lossless round-trip with ZERO unk for arbitrary unicode — the
    property char-level BPE cannot give (unseen chars fall to unk)."""
    from unstract_spark.operators.bpe import (
        FIXED_BYTE_MERGES,
        byte_merges_to_symbols,
        byte_symbols,
        decode_tokens,
        encode_symbols,
    )

    merges = byte_merges_to_symbols(FIXED_BYTE_MERGES)
    ranks = {p: i for i, p in enumerate(merges)}
    toks = [t for w in words for t in encode_symbols(byte_symbols(w), ranks)]
    assert decode_tokens(toks, byte_level=True) == " ".join(words)


def test_byte_level_trainer_learns_multibyte_merges():
    """A corpus dominated by a non-ASCII word: the byte trainer's first
    merges stitch the codepoint's bytes back together."""
    from unstract_spark.operators.bpe import byte_symbols, learn_merges

    merges = learn_merges([("ééé", 50), ("ab", 1)], 2, byte_level=True)
    c3, a9 = byte_symbols("é")[:-1]
    assert merges[0] == (c3, a9)  # the two bytes of é
    assert merges[1] == (c3 + a9, c3 + a9)  # then é+é


def test_byte_vocab_layout_and_no_unk(spark):
    """Byte vocab = specials + 256 base bytes + END + merges; encoding
    arbitrary unseen unicode produces zero <|unk|> ids."""
    from unstract_spark.operators.bpe import (
        FIXED_BYTE_MERGES,
        SPECIAL_TOKENS,
        bpe_encode_ids,
        build_vocab,
        byte_merges_to_symbols,
    )

    merges = byte_merges_to_symbols(FIXED_BYTE_MERGES)
    vocab = build_vocab(None, merges, byte_level=True)
    n_specials = len(SPECIAL_TOKENS)
    assert len(vocab) == n_specials + 256 + 1 + len(merges)
    ids = sorted(vocab.values())
    assert ids == list(range(len(vocab)))  # dense, deterministic

    df = spark.createDataFrame(
        [(1, "naïve café 🎉 привет the"), (2, None)], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r
        for r in bpe_encode_ids(df, merges, vocab, byte_level=True).collect()
    }
    unk = vocab["<|unk|>"]
    assert unk not in set(rows[1].token_ids)
    assert rows[2].token_ids == [] and rows[2].n_tokens == 0


def test_byte_and_char_agree_on_ascii(spark):
    """On pure-ASCII text the two alphabets coincide symbol-for-symbol,
    so the same merge chains yield identical token counts."""
    from unstract_spark.operators.bpe import (
        FIXED_MERGES,
        bpe_encode,
        byte_merges_to_symbols,
    )

    ascii_byte_merges = byte_merges_to_symbols(
        [(a.encode(), b.encode() if b != END else END) for a, b in
         [(x, y) for x, y in FIXED_MERGES]]
    )
    df = spark.createDataFrame(
        [(1, "the then and sing to of"), (2, "tot tote that")],
        "doc_id long, text string",
    )
    char = {r.doc_id: r.n_tokens for r in bpe_encode(df, FIXED_MERGES).collect()}
    byte = {
        r.doc_id: r.n_tokens
        for r in bpe_encode(df, ascii_byte_merges, byte_level=True).collect()
    }
    assert char == byte


def test_fixed_merges_equal_inorder_rewrite():
    """The oracle's semantics: applying the fixed merges in rank order
    as full left-to-right rewrites equals the greedy encoder — the
    well-formedness property the SQL twin depends on."""
    from unstract_spark.operators.bpe import FIXED_MERGES, encode_word

    ranks = {p: i for i, p in enumerate(FIXED_MERGES)}

    def inorder(word):
        syms = list(word) + [END]
        for a, b in FIXED_MERGES:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    for w in ("the", "then", "tot", "tothe", "ingthe", "ooff", "andand",
              "thethe", "eee", "sss", "ttt", "banana", "xyzzy"):
        assert inorder(w) == encode_word(w, ranks), w


def test_byte_pair_frequencies_split_multibyte(spark):
    """The byte statistic sees HALF codepoints: 'éé' contributes the
    (a9, c3) cross-codepoint byte pair no char-level statistic has."""
    from unstract_spark.operators.bpe import pair_frequencies_bytes, word_frequencies

    docs = spark.createDataFrame([(1, "éé ab")], "doc_id long, text string")
    wf = word_frequencies(docs)
    pairs = {(r.a, r.b): r.freq for r in pair_frequencies_bytes(wf).collect()}
    assert pairs[("C3", "A9")] == 2   # within each é
    assert pairs[("A9", "C3")] == 1   # across the two é's
    assert pairs[("A9", "</w>")] == 1
    assert pairs[("61", "62")] == 1   # 'ab'
    assert pairs[("62", "</w>")] == 1


def test_tokenizer_save_load_roundtrip(spark, tmp_path):
    from unstract_spark.operators.bpe import (
        bpe_encode_ids,
        build_vocab,
        byte_merges_to_symbols,
        FIXED_BYTE_MERGES,
        load_tokenizer,
        save_tokenizer,
    )

    merges = byte_merges_to_symbols(FIXED_BYTE_MERGES)
    vocab = build_vocab(None, merges, byte_level=True)
    p = str(tmp_path / "tok.json")
    save_tokenizer(p, merges, vocab, byte_level=True)
    m2, v2, bl = load_tokenizer(p)
    assert m2 == merges and v2 == vocab and bl is True

    df = spark.createDataFrame([(1, "the thé 🎉")], "doc_id long, text string")
    a = bpe_encode_ids(df, merges, vocab, byte_level=True).collect()[0]
    b = bpe_encode_ids(df, m2, v2, byte_level=bl).collect()[0]
    assert a.token_ids == b.token_ids and a.n_tokens > 0
