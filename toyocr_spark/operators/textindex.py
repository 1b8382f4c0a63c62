"""Inverted-index analytics over the corpus: term statistics, TF-IDF,
BM25 retrieval, PMI bigram collocations, unigram-LM quality scoring.

The retrieval-side complement of the dedup family: a training-data
engine needs "what is this corpus made of" (term/collocation stats)
and "find documents about X" (ranked retrieval) next to "remove the
repeats". All JVM-side: split/explode/groupBy/window — no Python in
the hot path.

Scale notes:
  * tokenization is a linear explode; term stats are partially
    aggregated groupBys keyed on (id, word) then word — both skew-safe
    (hot words carry O(1) aggregate state, never a row funnel);
  * corpus scalars (N docs, avg doc length) ride a broadcast one-row
    join, never a driver collect in the dataflow;
  * per-doc top-k windows partition on id (bounded by per-doc vocab);
    the only corpus-wide window would be a global rank over retrieval
    scores, which callers cap with LIMIT-style top-k first.

Determinism: scores are rounded at a fixed scale and every window
carries a total order (score desc, then word/id asc) — the oracle
parity discipline of queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def doc_terms(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, word) rows, one per token occurrence, split on single
    spaces (the synthetic corpus' only separator; a real crawl swaps
    in a richer splitter here — the downstream stats are unchanged)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    ).filter(F.length("word") > 0)


def doc_term_positions(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, word) rows — the POSITIONAL posting lists. Positions
    are 0-based indices in the split array (empties keep their slot so
    adjacency is preserved; they are filtered, not re-numbered)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "word"),
    ).filter(F.length("word") > 0)


def phrase_retrieve(
    df: DataFrame, id_col: str, text_col: str, phrase: list[str], k: int = 20
) -> DataFrame:
    """Exact-phrase retrieval by positional posting-list intersection:
    docs where ``phrase`` occurs as consecutive tokens, ranked by
    occurrence count. Output: (rk, id, n_hits), top-k with total order
    (n_hits desc, id asc).

    The positional-index shape, not a substring scan: each term's
    posting list is filtered FIRST (Catalyst pushes the term predicate
    to the scan side of each join leg), then intersected by equi-join on
    (id, start_pos) with the i-th term's positions shifted back by i.
    Join fanout per doc is bounded by per-doc term frequency; the
    shuffle keys on (id, pos) — never a cross join, and rare terms
    shrink every later leg (the standard conjunctive-query plan).
    """
    pos = doc_term_positions(df, id_col, text_col)
    base = pos.filter(F.col("word") == phrase[0]).select(
        "id", F.col("pos").alias("p0")
    )
    for i, t in enumerate(phrase[1:], start=1):
        leg = pos.filter(F.col("word") == t).select(
            "id", (F.col("pos") - i).alias("p0")
        )
        base = base.join(leg, ["id", "p0"])
    hits = base.groupBy("id").agg(F.count("*").alias("n_hits"))
    topk = hits.orderBy(F.col("n_hits").desc(), F.col("id").asc()).limit(k)
    w = Window.orderBy(F.col("n_hits").desc(), F.col("id").asc())
    return topk.withColumn("rk", F.row_number().over(w)).select("rk", "id", "n_hits")


def term_stats(terms: DataFrame) -> DataFrame:
    """Per-(id, word) term frequency + per-word document frequency:
    (id, word, tf, df). Two partially-aggregated shuffles (id,word)
    then (word); df joins back on word (1 row per word: 1:1 fanout)."""
    tf = terms.groupBy("id", "word").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("word").agg(F.count("*").alias("df"))
    return tf.join(dfreq, "word")


def _with_n_docs(stats: DataFrame, docs: DataFrame) -> DataFrame:
    n = docs.agg(F.count("*").alias("n_docs"))
    return stats.crossJoin(F.broadcast(n))


def tfidf_topk(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF:
    tfidf = tf * ln((N + 1) / (df + 1)), ties broken on word asc.
    Output: (id, rk, word, tf, df, tfidf)."""
    stats = _with_n_docs(term_stats(doc_terms(df, id_col, text_col)), df)
    scored = stats.withColumn(
        "tfidf",
        F.round(
            F.col("tf")
            * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
            6,
        ),
    )
    w = Window.partitionBy("id").orderBy(F.col("tfidf").desc(), F.col("word").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("id", "rk", "word", "tf", "df", "tfidf")
    )


def bm25_retrieve(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 ranked retrieval for a bag of query terms.

    score(d) = sum over query terms t of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    with the standard smoothed idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)).

    The query-term filter lands BEFORE the stats join (predicate
    pushdown: only posting lists of the query terms shuffle), dl/avgdl
    ride a broadcast one-row join. Output: (rk, id, score) top-k with a
    total order (score desc, id asc)."""
    terms = doc_terms(df, id_col, text_col)
    dl = terms.groupBy("id").agg(F.count("*").alias("dl"))
    qset = [t for t in query_terms]
    stats = term_stats(terms).filter(F.col("word").isin(qset))
    avg = dl.agg(F.avg("dl").alias("avgdl"))
    n = df.agg(F.count("*").alias("n_docs"))
    scored = (
        stats.join(dl, "id")
        .crossJoin(F.broadcast(avg))
        .crossJoin(F.broadcast(n))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    ranked = scored.groupBy("id").agg(F.round(F.sum("term_score"), 6).alias("score"))
    # distributed top-k: orderBy+limit plans as TakeOrderedAndProject
    # (per-partition heads merged on the driver side), NOT a global
    # row_number window funneling every scored doc through one reducer;
    # the rank is attached afterwards over just the k survivors
    topk = ranked.orderBy(F.col("score").desc(), F.col("id").asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    return topk.withColumn("rk", F.row_number().over(w)).select("rk", "id", "score")


def pmi_bigrams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 5,
    top: int = 50,
) -> DataFrame:
    """Pointwise mutual information over adjacent word pairs:
    pmi(a, b) = ln(p(a,b) / (p(a) p(b))), unigram/bigram probabilities
    over corpus-wide occurrence counts. The collocation detector of a
    corpus-analysis pass (phrase mining / tokenizer-vocab prep).

    Bigrams come from zipping the word array with itself shifted by one
    (slice + arrays_zip) — linear, no self-join; counts are partial
    aggregates on (a, b) and word. Output: top-N by (pmi desc, a, b)
    among bigrams with count >= min_count."""
    words = F.split(F.col(text_col), " ")
    pairs = df.select(
        F.explode(
            F.arrays_zip(
                F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))).alias("a"),
                F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))).alias("b"),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    big = pairs.groupBy("a", "b").agg(F.count("*").alias("n_ab"))
    uni = (
        df.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n_w"))
    )
    tot_uni = uni.agg(F.sum("n_w").alias("n_tokens"))
    tot_big = big.agg(F.sum("n_ab").alias("n_bigrams"))
    scored = (
        big.filter(F.col("n_ab") >= min_count)
        .join(uni.select(F.col("word").alias("a"), F.col("n_w").alias("n_a")), "a")
        .join(uni.select(F.col("word").alias("b"), F.col("n_w").alias("n_b")), "b")
        .crossJoin(F.broadcast(tot_uni))
        .crossJoin(F.broadcast(tot_big))
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    (F.col("n_ab") / F.col("n_bigrams"))
                    / ((F.col("n_a") / F.col("n_tokens")) * (F.col("n_b") / F.col("n_tokens")))
                ),
                6,
            ),
        )
    )
    # same distributed top-k shape as bm25_retrieve: limit first, rank after
    topn = scored.orderBy(F.col("pmi").desc(), F.col("a").asc(), F.col("b").asc()).limit(top)
    w = Window.orderBy(F.col("pmi").desc(), F.col("a").asc(), F.col("b").asc())
    return (
        topn.withColumn("rk", F.row_number().over(w))
        .select("rk", "a", "b", "n_ab", "n_a", "n_b", "pmi")
    )


def unigram_nll(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document cross-entropy against the corpus unigram LM:
    nll = mean over tokens of -ln(count(w) / total_tokens) — the
    CCNet-style "LM perplexity" quality axis in its simplest honest
    form (a doc of rare words scores high, boilerplate scores low;
    filters usually drop BOTH tails). (id, doc_tokens, nll).

    Shapes: unigram counts are one partial-agg shuffle on word; the
    model join is 1:1 per token occurrence (one row per word in the
    model); the corpus total rides a broadcast one-row join."""
    terms = doc_terms(df, id_col, text_col)
    uni = terms.groupBy("word").agg(F.count("*").alias("n_w"))
    tot = terms.agg(F.count("*").alias("n_tokens"))
    return (
        terms.join(uni, "word")
        .crossJoin(F.broadcast(tot))
        .groupBy("id")
        .agg(
            F.count("*").alias("doc_tokens"),
            F.round(F.avg(-F.log(F.col("n_w") / F.col("n_tokens"))), 6).alias("nll"),
        )
    )
