"""Byte-pair-encoding tokenizer training over a distributed corpus.

Completes the tokenizer-training story started by q97 (single-round
merge-candidate counting): a full iterative Sennrich-style `learn_bpe`
loop plus the matching encoder, both expressed so the CORPUS is
touched exactly once.

Scale shape (the whole point at 100 TB):
  * one corpus pass collapses the token stream to the distinct-word
    vocabulary with frequencies (partial-agg shuffle #1) — past
    vocabulary saturation, corpus growth adds nothing downstream;
  * every merge round then runs over VOCAB rows only: adjacent-pair
    explode + partial-agg count + a 1-row driver read of the argmax
    (a sanctioned driver scalar, same as evaluation report reads);
  * the merge application is a pure JVM fold (`F.aggregate` over the
    symbol array — no Python in the loop), and the vocab is
    localCheckpoint-ed each round so lineage stays flat across
    iterations (the connected-components discipline, dedup.py:567);
  * encoding a corpus with the learned merges is ONE broadcast-join
    of words against the segmented vocab — the merges never touch
    the corpus row-by-row.

Reference analogue: ToyOCR trains its recognizer vocabulary offline
and ships it as a side artifact (configs reference dictionaries the
same way a tokenizer ships merges.txt); here the engine trains the
artifact on the corpus it curates.

Determinism: pair argmax is ordered by (freq DESC, left, right) — a
total order — so the merge sequence is reproducible bit-for-bit on
any cluster size; the fold is position-deterministic per word.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

END_OF_WORD = "</w>"


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word vocabulary with frequencies: the ONE corpus pass.

    Output: (word string, freq long). Lowercased alphabetic words of
    length >= 2 (the q97 convention, kept in lockstep so q97 is
    literally round 1 of this trainer's pair counts).
    """
    words = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
    ).filter(F.col("word").rlike("^[a-z]+$") & (F.length("word") >= 2))
    return words.groupBy("word").agg(F.count("*").alias("freq"))


def _initial_symbols(vocab: DataFrame) -> DataFrame:
    """word -> its initial symbol sequence: characters + END_OF_WORD."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.substring(F.col("word"), i, F.lit(1)),
    )
    return vocab.select(
        "word",
        "freq",
        F.concat(chars, F.array(F.lit(END_OF_WORD))).alias("symbols"),
    )


def _pair_counts(seg: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts over the segmented vocab, weighted
    by word frequency. Rows ~ sum of per-word symbol counts — bounded
    by the vocabulary, never the corpus.

    Fully-merged words (a single symbol) are filtered out first —
    besides having no pairs, `sequence(0, size-2)` with size==1 would
    produce Spark's DESCENDING [0, -1] sequence, not an empty one."""
    pairs = seg.filter(F.size("symbols") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("symbols") - 2),
                lambda i: F.struct(
                    F.element_at("symbols", i + 1).alias("left"),
                    F.element_at("symbols", i + 2).alias("right"),
                ),
            )
        ).alias("p"),
        "freq",
    )
    return pairs.groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right")).agg(
        F.sum("freq").alias("pair_freq")
    )


def _apply_merge(symbols: F.Column | str, left: str, right: str) -> F.Column:
    """Greedy left-to-right non-overlapping merge of (left, right) into
    one symbol — the Sennrich merge semantics — as a pure JVM fold.

    Accumulator = (out array, carry symbol). Each step either completes
    a merge (carry==left and s==right -> emit left||right, clear carry)
    or flushes the carry and holds s. 'aaa' under ('a','a') folds to
    ['aa','a'], matching the canonical implementation.
    """
    merged = left + right
    nul = F.lit(None).cast("string")
    return F.aggregate(
        symbols,
        F.struct(
            F.array().cast("array<string>").alias("out"), nul.alias("carry")
        ),
        lambda acc, s: F.when(
            acc["carry"].isNotNull()
            & (acc["carry"] == F.lit(left))
            & (s == F.lit(right)),
            F.struct(
                F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                nul.alias("carry"),
            ),
        ).otherwise(
            F.struct(
                F.when(
                    acc["carry"].isNotNull(), F.concat(acc["out"], F.array(acc["carry"]))
                )
                .otherwise(acc["out"])
                .alias("out"),
                s.alias("carry"),
            )
        ),
        lambda acc: F.when(
            acc["carry"].isNotNull(), F.concat(acc["out"], F.array(acc["carry"]))
        ).otherwise(acc["out"]),
    )


def train_bpe(
    vocab: DataFrame, n_merges: int, min_pair_freq: int = 2
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn `n_merges` BPE merges over a (word, freq) vocabulary.

    Returns (merges, segmented_vocab): merges as [(left, right,
    pair_freq)] in learned order; segmented_vocab as (word, freq,
    symbols array<string>) — the final segmentation, i.e. the encoder
    table.

    Each round: one partial-agg pair count over vocab rows, a 1-row
    argmax collect, one JVM fold to re-segment, one localCheckpoint to
    keep the iterative lineage flat. Stops early when no pair reaches
    `min_pair_freq` (merging hapax pairs is noise).
    """
    seg = _initial_symbols(vocab).localCheckpoint(eager=False)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            _pair_counts(seg)
            .orderBy(F.desc("pair_freq"), "left", "right")
            .limit(1)
            .collect()
        )
        if not best or best[0]["pair_freq"] < min_pair_freq:
            break
        left, right, freq = best[0]["left"], best[0]["right"], int(best[0]["pair_freq"])
        merges.append((left, right, freq))
        # lazy checkpoint: still truncates lineage after first use, but
        # materializes DURING the next round's argmax job instead of as
        # its own eager job — one Spark job per merge round, not two
        seg = seg.withColumn(
            "symbols", _apply_merge(F.col("symbols"), left, right)
        ).localCheckpoint(eager=False)
    return merges, seg


def encode_tokens(df: DataFrame, seg: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document BPE token count using the trained segmentation.

    One corpus pass (word explode, same normalization as word_vocab) +
    one equi-join against the segmented vocab (AQE broadcasts it when
    small; forced broadcast would OOM on a Heaps-law crawl vocab) —
    the merge loop never touches the corpus. Words outside the trained
    vocabulary
    fall back to character count + 1 (each char + END_OF_WORD), the
    untrained-segmentation cost.

    Output: (doc id column passthrough, n_words, n_tokens).
    """
    id_cols = [c for c in df.columns if c != text_col]
    words = df.select(
        *id_cols,
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word"),
    ).filter(F.col("word").rlike("^[a-z]+$") & (F.length("word") >= 2))
    # no broadcast hint: the segmented vocab is CORPUS-VOCABULARY
    # cardinality (Heaps-law growth — 10^8+ words at crawl scale), the
    # same class of table q85/q79 must not force onto executors. AQE
    # still picks a broadcast join whenever the trained vocab is
    # genuinely small (every fixture run); at scale the (word) shuffle
    # is the standard token-stream exchange TF-IDF/BM25 already pay.
    table = seg.select("word", F.size("symbols").alias("n_sym"))
    joined = words.join(table, "word", "left").select(
        *id_cols,
        F.coalesce(F.col("n_sym"), F.length("word") + 1).alias("n_tok"),
    )
    return joined.groupBy(*id_cols).agg(
        F.count("*").alias("n_words"), F.sum("n_tok").alias("n_tokens")
    )
