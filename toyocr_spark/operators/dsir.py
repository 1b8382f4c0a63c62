"""DSIR-style importance-weighted data selection (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"),
composed from the repo's two proven primitives: the corpus unigram LM
of ``textindex.unigram_nll`` (q55) and the integer Duffield-Lund-Thorup
priority sampler of q57.

Per document, the importance weight is the average per-token
log-likelihood ratio between a TARGET-domain unigram LM and the RAW
corpus unigram LM (both add-one smoothed over the raw vocabulary):

    logratio_avg = mean_t  ln( p_target(w_t) / p_raw(w_t) )

Documents that "read like" the target domain score high. Selection is
then weight-proportional priority sampling: the rounded score becomes
an integer weight, each doc draws a deterministic md5-derived 40-bit
uniform, and priority = w << 34 DIV (u + 1) — all-integer, so the
SELECTED SET is bit-identical across engines (the q44/q57 discipline;
the only float is the ln score itself, which follows q55's proven
round-at-6dp contract).

Scale shape (locked by tests/test_plans.py):
  * tokenization is a linear explode;
  * raw and target models are each ONE partial-agg shuffle on word
    (the target model is a filtered subset — strictly smaller);
  * the target model joins into the raw model at MODEL size (vocab
    rows, not token rows), so the token stream is joined exactly once
    — one model shuffle, as a DSIR pass over 100 TB must be;
  * corpus totals ride broadcast one-row joins;
  * top-k is orderBy+limit (TakeOrderedAndProject), never a global
    window.

Reference analogue: the survey's quality-scoring axis (SURVEY.md §2.10
text analysis); this is the standard modern composition a
training-data user runs right after quality filtering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from toyocr_spark.operators.textindex import doc_terms

#: fixed-point scale for the rounded log-ratio -> integer weight
SCORE_SCALE = 1_000_000
#: shifts every realistic logratio_avg (|avg| << 30) strictly positive
SCORE_OFFSET = 30_000_000
#: priority = w * 2^34 div (u+1): w < 2^26, so the product stays < 2^60
PRIORITY_SHIFT = 2**34


def dsir_scores(
    df: DataFrame, id_col: str, text_col: str, target: Column | DataFrame
) -> DataFrame:
    """(id, doc_tokens, logratio_avg): per-doc mean token log-likelihood
    ratio ln(p_target/p_raw), add-one smoothed over the raw vocabulary.
    ``target`` defines the target domain: either a boolean Column over
    ``df`` (select target docs from the corpus itself) or a separate
    seed-corpus DataFrame with the same (id_col, text_col) schema — the
    production shape, where the target LM comes from a small curated
    corpus. Target-only words are smoothed like any unseen word (the
    raw vocabulary is the model's support), which is the standard DSIR
    hashed-ngram simplification."""
    terms = doc_terms(df, id_col, text_col)
    if isinstance(target, DataFrame):
        tgt_terms = doc_terms(target, id_col, text_col)
    else:
        tgt_ids = df.filter(target).select(F.col(id_col).alias("id")).distinct()
        tgt_terms = terms.join(tgt_ids, "id", "left_semi")
    raw = terms.groupBy("word").agg(F.count("*").alias("rc"))
    tgt = tgt_terms.groupBy("word").agg(F.count("*").alias("tc"))
    # model-sized join: vocab rows, never token rows. Materialized ONCE
    # (localCheckpoint — vocab-sized, tiny next to the corpus): both the
    # totals aggregate and the per-token join read the same
    # materialization, so the two model-building shuffles never re-run
    # (without this, Spark recomputes the whole model subtree for the
    # totals row — the model would be built twice per pass)
    model = (
        raw.join(tgt, "word", "left")
        .select("word", "rc", F.coalesce("tc", F.lit(0).cast("long")).alias("tc"))
        .localCheckpoint(eager=False)
    )
    totals = model.agg(
        F.sum("rc").alias("raw_tot"),
        F.sum("tc").alias("tgt_tot"),
        F.count("*").alias("vs"),
    )
    ratio = F.log(
        ((F.col("tc") + F.lit(1.0)) / (F.col("tgt_tot") + F.col("vs")))
        / ((F.col("rc") + F.lit(1.0)) / (F.col("raw_tot") + F.col("vs")))
    )
    return (
        terms.join(model, "word")
        .crossJoin(F.broadcast(totals))
        .groupBy("id")
        .agg(
            F.count("*").alias("doc_tokens"),
            F.round(F.avg(ratio), 6).alias("logratio_avg"),
        )
    )


def dsir_sample(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: Column | DataFrame,
    k: int = 50,
    salt: str = "dsir",
) -> DataFrame:
    """Top-``k`` importance-resampled documents:
    (rk, id, doc_tokens, logratio_avg, priority). Deterministic — the
    md5 'randomness' is a pure function of (salt, id), so any engine
    anywhere selects exactly the same documents."""
    scores = dsir_scores(df, id_col, text_col, target)
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + "|"), F.col("id").cast("string"))), 1, 10
        ),
        16,
        10,
    ).cast("long")
    w = (
        F.round(F.col("logratio_avg") * SCORE_SCALE, 0).cast("long")
        + F.lit(SCORE_OFFSET)
    )
    pr = scores.select(
        "id",
        "doc_tokens",
        "logratio_avg",
        (w * F.lit(PRIORITY_SHIFT)).alias("_num"),
        (u + 1).alias("_den"),
    ).select(
        "id", "doc_tokens", "logratio_avg", F.expr("_num div _den").alias("priority")
    )
    top = pr.orderBy(F.col("priority").desc(), F.col("id").asc()).limit(k)
    win = Window.orderBy(F.col("priority").desc(), F.col("id").asc())
    return top.select(
        F.row_number().over(win).alias("rk"),
        "id",
        "doc_tokens",
        "logratio_avg",
        "priority",
    )
