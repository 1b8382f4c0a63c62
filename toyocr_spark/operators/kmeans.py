"""Integer-exact Lloyd k-means over embedding columns — the coarse
quantizer an IVF ANN index trains (the learned counterpart of
similarity.bucketed_cosine_topk's sign buckets).

Cross-engine determinism is the hard part of making an iterative
float algorithm oracle-checkable, and it is solved the same way as
the PageRank query (q44): fixed-point integers end to end.
Components scale to BIGINT via floor(x * 1e6) (exact: inputs are
float32 widened to double identically in any IEEE engine), distances
are exact integer sums of squared diffs (<= 2^48 at 64 dims, no
overflow), and centroid updates floor the per-dim mean back to
BIGINT. Every engine that runs the same rounds produces bit-identical
centroids and assignments.

Scale shape per round (r6 optimization — the assignment is a PURE MAP):
  * assignment: the k centroids collapse to ONE broadcast row holding
    array<struct(cid, cv)>; each vector computes its per-centroid
    distances with a transform() over that array and folds the argmin
    with array_min(struct(dist, cid)) — identical lexicographic
    tie-break to the old min(struct) aggregate, but with NO groupBy
    and NO shuffle of the vectors at all (the old shape shuffled n
    rows per round). The vector rides along in the same row, so
    nothing ever needs to join back to the corpus by id.
  * update: posexplode the carried vectors to (cid, dim, val) +
    partial-agg mean per (cid, dim) — k*d result rows — then array
    re-assembly. Linear in n*d, never in n^2 or n*k*d; the only
    shuffle of a round, and it carries (cid, dim, partial-sum) state,
    not vectors.
Rounds are a driver loop (k*d ints per round); centroids are tiny so
no checkpointing is needed at any n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def _scaled(vec_col: str):
    # cast to double BEFORE the multiply: float32 * int would stay
    # float32 in Spark (precedence FloatType) and round differently
    # than an engine computing in double
    return F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * float(SCALE)).cast("long")
    )


def _cents_row(centroids: DataFrame):
    """Collapse the centroid table to ONE broadcast row holding
    array<struct(cid, cv)> — the shape that lets assignment be a pure
    map (no per-vector shuffle). collect_list order is arbitrary, but
    every consumer folds with an order-free array_min/array_sort."""
    return F.broadcast(
        centroids.agg(F.collect_list(F.struct("cid", "cv")).alias("_cents"))
    )


def _best_center(vec_col: str):
    """array_min over struct(dist, cid): exact integer squared-L2
    argmin with ties to the smaller cid — bit-identical semantics to
    the old min(struct(dist, cid)) aggregate (same lexicographic
    struct ordering), with no aggregation in the plan."""
    per = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            F.aggregate(
                F.zip_with(F.col(vec_col), c["cv"], lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dist"),
            c["cid"].alias("cid"),
        ),
    )
    return F.array_min(per)


def _assign_full(vecs: DataFrame, centroids: DataFrame, vec_col: str = "v") -> DataFrame:
    """All of ``vecs``'s columns + (cid, dist) — map-only: the vector
    (and anything else riding the row) flows through, so downstream
    consumers (update, IVF lists, SemDeDup cells) never join back to
    the corpus by id."""
    scored = vecs.crossJoin(_cents_row(centroids)).withColumn(
        "_b", _best_center(vec_col)
    )
    return scored.select(
        *vecs.columns, F.col("_b.cid").alias("cid"), F.col("_b.dist").alias("dist")
    )


def kmeans_assign(
    vecs: DataFrame, centroids: DataFrame, id_col: str = "id", vec_col: str = "v"
) -> DataFrame:
    """(id, cid, dist): each vector's nearest centroid by exact integer
    squared-L2, ties to the smaller cid. vecs: (id, v: array<long>);
    centroids: (cid, cv: array<long>)."""
    return _assign_full(vecs, centroids, vec_col).select(id_col, "cid", "dist")


def kmeans_update(
    assigned: DataFrame,
    vecs: DataFrame | None = None,
    id_col: str = "id",
    vec_col: str = "v",
) -> DataFrame:
    """New centroids: floor per-dim mean of each cluster's members.
    (cid, cv: array<long>); a centroid that lost every member drops out
    (its bucket is empty — the IVF list is simply absent).

    ``vecs=None`` means the assignment already carries the vector
    column (_assign_full) — the no-join fast path."""
    src = (
        assigned
        if vecs is None
        else assigned.select(id_col, "cid").join(vecs, id_col)
    )
    member_dims = src.select("cid", F.posexplode(vec_col).alias("dim", "val"))
    per_dim = member_dims.groupBy("cid", "dim").agg(
        F.floor(F.sum("val") / F.count("*")).cast("long").alias("cval")
    )
    return per_dim.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cval"))), lambda s: s["cval"]
        ).alias("cv")
    )


def kmeans_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Fixed-round Lloyd iterations seeded from the k lowest-id vectors
    (deterministic init — the cross-engine analogue of seeded random
    init). Returns (centroids, assignment, scaled_vecs): the centroids
    the final assignment was computed against, the assignment (id, cid,
    dist) — together, the IVF index: centroids are the probe targets,
    the assignment is the inverted lists — and the fixed-point vectors
    for further probing.

    The returned assignment additionally carries ``iv`` (the vector as
    array<double>): assignment is map-only, so the carry is free, and
    it lets IVF list assembly / SemDeDup cells skip the join back to
    the corpus by id entirely."""
    from toyocr_spark.operators.similarity import _as_double

    vecs = df.select(
        F.col(id_col).alias("id"),
        _scaled(vec_col).alias("v"),
        _as_double(F.col(vec_col)).alias("iv"),
    )
    centroids = (
        vecs.orderBy("id").limit(k).select(F.col("id").alias("cid"), F.col("v").alias("cv"))
    )
    assigned = None
    for it in range(iters):
        assigned = _assign_full(vecs, centroids)
        if it < iters - 1:  # the last round's update would be unused
            # k tiny rows, checkpointed: without this, round r's plan
            # nests every earlier round's assignment subtree and the
            # broadcast-build jobs recompute them O(iters^2) times
            # (the pq_train codebook discipline)
            centroids = kmeans_update(assigned).localCheckpoint()
    return centroids, assigned, vecs


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
) -> DataFrame:
    """Final Lloyd assignment (id, cid, dist) — see kmeans_index."""
    return kmeans_index(df, id_col, vec_col, k, iters)[1].select("id", "cid", "dist")


def ivf_probes(
    queries: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, cid): each query's ``nprobe`` nearest centroids by the
    same exact integer metric the quantizer trained with.

    Map-only (r6): the centroid table collapses to one broadcast array
    row; each query sorts its per-centroid struct(dist, cid) array and
    explodes the first ``nprobe`` — identical (dist asc, cid asc)
    ordering to the old window rank, with no per-query shuffle at all
    (the old shape shuffled queries x k rows through a window)."""
    qs = queries.select(F.col(id_col).alias("query_id"), _scaled(vec_col).alias("qs"))
    per = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            F.aggregate(
                F.zip_with(F.col("qs"), c["cv"], lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("qd"),
            c["cid"].alias("cid"),
        ),
    )
    nearest = F.slice(F.array_sort(per), 1, nprobe)
    return (
        qs.crossJoin(_cents_row(centroids))
        .select("query_id", F.explode(nearest).alias("_p"))
        .select("query_id", F.col("_p.cid").alias("cid"))
    )


def ivf_rerank(
    probes: DataFrame,
    lists: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact-cosine re-rank of ONLY the probed inverted lists.
    ``lists`` is the IVF index payload (item_id, cid, iv: array<double>)
    — the item vector rides IN the list row, so candidate scoring joins
    nothing corpus-wide: probes (tiny) broadcast against the lists, the
    query vectors broadcast against the candidates. (query_id, item_id,
    cos, rk)."""
    from toyocr_spark.operators.selection import topk_per_group
    from toyocr_spark.operators.similarity import _as_double, cosine_pre, l2norm

    qv = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("nq", l2norm(F.col("qv")))
    cand = F.broadcast(probes).join(
        lists.withColumn("ni", l2norm(F.col("iv"))), "cid"
    ).filter(F.col("item_id") != F.col("query_id"))
    scored = cand.join(F.broadcast(qv), "query_id").select(
        "query_id",
        "item_id",
        cosine_pre(F.col("qv"), F.col("iv"), F.col("nq"), F.col("ni")).alias("cos"),
    )
    out = topk_per_group(
        scored, ["query_id"], [F.col("cos").desc(), F.col("item_id").asc()], k, rank_name="rk"
    )
    return out.select("query_id", "item_id", F.round("cos", 6).alias("cos"), "rk")


def ivf_lists(
    corpus: DataFrame,
    assigned: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The IVF inverted lists (item_id, cid, iv): each corpus vector
    tagged with its coarse-quantizer cell, double components inline so
    search never joins back to the corpus.

    When the assignment carries ``iv`` (kmeans_index does), the lists
    are a pure projection of it — no corpus join at all; the legacy
    join path remains for externally supplied (id, cid) assignments."""
    if "iv" in assigned.columns:
        return assigned.select(F.col("id").alias("item_id"), "cid", "iv")
    from toyocr_spark.operators.similarity import _as_double

    c = corpus.select(
        F.col(id_col).alias("item_id"), _as_double(F.col(vec_col)).alias("iv")
    )
    return assigned.select(F.col("id").alias("item_id"), "cid").join(c, "item_id")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    n_centroids: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate nearest neighbours, train-and-search in one call:
    train the coarse quantizer (kmeans_index), probe each query's
    nprobe nearest centroids, exact-cosine re-rank only the probed
    inverted lists. (query_id, item_id, cos, rk).

    This is the learned-partition scale path next to the sign-bucket
    hash path (similarity.bucketed_cosine_topk): candidates per query
    drop from |corpus| to ~nprobe/n_centroids of it, and the only
    corpus-wide shuffle keys on item_id to assemble the lists — probes,
    queries and centroids stay broadcast. At 100 TB the index is
    trained ONCE and persisted (ivf_write_index / ivf_persisted_search
    below); this inline form is the demo/training path."""
    centroids, assigned, _ = kmeans_index(corpus, id_col, vec_col, n_centroids, iters)
    lists = ivf_lists(corpus, assigned, id_col, vec_col)
    probes = ivf_probes(queries, centroids, nprobe, id_col, vec_col)
    return ivf_rerank(probes, lists, queries, k, id_col, vec_col)


def ivf_write_index(
    spark,
    corpus: DataFrame,
    table_prefix: str,
    n_centroids: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_buckets: int = 8,
) -> None:
    """Train the coarse quantizer ONCE and persist the index — the
    100 TB usage pattern (a petabyte corpus trains its IVF index in one
    job and every later search reads it; retraining per query, as the
    demo path does, would re-shuffle the corpus 2*iters times).

    Layout: ``{table_prefix}_centroids`` (k rows, plain) and
    ``{table_prefix}_lists`` — the inverted lists BUCKETED on cid
    (plans/bucketing.write_bucketed), so any later join or aggregate
    keyed on the list id reads pre-partitioned files and plans no
    Exchange on cid at all."""
    from toyocr_spark.plans.bucketing import write_bucketed

    centroids, assigned, _ = kmeans_index(corpus, id_col, vec_col, n_centroids, iters)
    lists = ivf_lists(corpus, assigned, id_col, vec_col)
    centroids.write.mode("overwrite").format("parquet").saveAsTable(
        f"{table_prefix}_centroids"
    )
    write_bucketed(lists, f"{table_prefix}_lists", "cid", n_buckets=n_buckets)


def ivf_persisted_search(
    spark,
    table_prefix: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search a persisted IVF index: NO k-means stages in the plan —
    centroids come from the tiny catalog table (broadcast), candidates
    from the cid-bucketed lists table (no Exchange on cid; probes
    broadcast). The search-side plan shuffles only to rank the
    candidate set per query."""
    centroids = spark.table(f"{table_prefix}_centroids")
    lists = spark.table(f"{table_prefix}_lists")
    probes = ivf_probes(queries, centroids, nprobe, id_col, vec_col)
    return ivf_rerank(probes, lists, queries, k, id_col, vec_col)
