"""BPE trainer exactness: the distributed learn_bpe loop must
reproduce a pure-Python Sennrich reference bit-for-bit (merge table
AND final segmentation), and the encoder must price every word at its
trained segment count. This is the exact-value check standing in for
an SQL oracle (q99 is iterative and not SQL-expressible)."""

from __future__ import annotations

from collections import Counter

import pytest

from toyocr_spark.operators.bpe import (
    END_OF_WORD,
    encode_tokens,
    train_bpe,
    word_vocab,
)


# --- pure-Python reference (Sennrich learn_bpe, greedy L->R merge) ---


def _ref_vocab(texts: list[str]) -> Counter:
    c: Counter = Counter()
    for t in texts:
        for w in t.lower().split():
            if len(w) >= 2 and w.isalpha() and w.isascii():
                c[w] += 1
    return c


def _ref_merge(sym: tuple[str, ...], left: str, right: str) -> tuple[str, ...]:
    out: list[str] = []
    carry: str | None = None
    for s in sym:
        if carry == left and s == right:
            out.append(left + right)
            carry = None
        else:
            if carry is not None:
                out.append(carry)
            carry = s
    if carry is not None:
        out.append(carry)
    return tuple(out)


def _ref_train(vocab: Counter, n_merges: int, min_pair_freq: int = 2):
    seg = {w: tuple(w) + (END_OF_WORD,) for w in vocab}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, sym in seg.items():
            f = vocab[w]
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # argmax with the total order (freq DESC, left, right)
        (left, right), freq = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if freq < min_pair_freq:
            break
        merges.append((left, right, freq))
        seg = {w: _ref_merge(sym, left, right) for w, sym in seg.items()}
    return merges, seg


TEXTS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "lower lowest low lowly",
    "newer newest new newly renew",
    "the low cat saw the new mat",
    "widest wider wide widely",
    "aaa aaab aaaa baaa",  # overlapping-pair edge: greedy L->R
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_train_matches_reference(spark, corpus):
    vocab = word_vocab(corpus)
    got_merges, got_seg = train_bpe(vocab, n_merges=12)

    ref_vocab = _ref_vocab(TEXTS)
    assert {
        (r["word"], r["freq"]) for r in vocab.collect()
    } == set(ref_vocab.items())

    ref_merges, ref_seg = _ref_train(ref_vocab, n_merges=12)
    assert got_merges == ref_merges

    got = {r["word"]: tuple(r["symbols"]) for r in got_seg.collect()}
    assert got == ref_seg


def test_overlapping_pair_is_greedy_left_to_right(spark):
    # 'aaaa' under merge ('a','a') must segment to ('aa','aa','</w>'),
    # never ('a','aa','a',...) — the canonical greedy semantics.
    df = spark.createDataFrame([(0, "aaaa aaaa aaa")], "doc_id long, text string")
    merges, seg = train_bpe(word_vocab(df), n_merges=1)
    assert merges[0][:2] == ("a", "a")
    got = {r["word"]: tuple(r["symbols"]) for r in seg.collect()}
    assert got["aaaa"] == ("aa", "aa", END_OF_WORD)
    assert got["aaa"] == ("aa", "a", END_OF_WORD)


def test_early_stop_below_min_pair_freq(spark):
    # every word is a hapax with disjoint characters -> no pair reaches
    # freq 2 -> zero merges regardless of the requested count
    df = spark.createDataFrame([(0, "ab cd ef gh")], "doc_id long, text string")
    merges, seg = train_bpe(word_vocab(df), n_merges=5)
    assert merges == []
    got = {r["word"]: tuple(r["symbols"]) for r in seg.collect()}
    assert got["ab"] == ("a", "b", END_OF_WORD)


def test_encode_prices_words_at_trained_segments(spark, corpus):
    vocab = word_vocab(corpus)
    merges, seg = train_bpe(vocab, n_merges=12)
    ref_merges, ref_seg = _ref_train(_ref_vocab(TEXTS), n_merges=12)

    enc = {r["doc_id"]: (r["n_words"], r["n_tokens"]) for r in encode_tokens(corpus, seg).collect()}
    for i, t in enumerate(TEXTS):
        words = [
            w
            for w in t.lower().split()
            if len(w) >= 2 and w.isalpha() and w.isascii()
        ]
        want_tokens = sum(len(ref_seg[w]) for w in words)
        assert enc[i] == (len(words), want_tokens)


def test_encode_oov_falls_back_to_chars(spark, corpus):
    vocab = word_vocab(corpus)
    _, seg = train_bpe(vocab, n_merges=4)
    oov = spark.createDataFrame([(99, "zyxwv")], "doc_id long, text string")
    rows = encode_tokens(oov, seg).collect()
    assert [(r["doc_id"], r["n_words"], r["n_tokens"]) for r in rows] == [(99, 1, 6)]
