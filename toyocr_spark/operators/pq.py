"""Product quantization (PQ) over embedding columns — the
memory-bounded ANN representation at corpus scale.

At 10^12 vectors the raw embeddings (64 float32 dims = 256 B/vector)
do not fit executor memory or even a fast scan tier; PQ stores each
vector as m_sub sub-centroid ids (8 codes = a few bytes, 16-64x
compression) and answers queries by Asymmetric Distance Computation
(ADC): the query is split into the same subspaces, a tiny
(m_sub x ksub) distance table is computed per query against the
codebook, and each candidate's approximate distance is m_sub table
lookups summed — never a touch of the raw vector. This is the
standard quantized-scan design (Jegou, Douze, Schmid, "Product
Quantization for Nearest Neighbor Search", TPAMI 2011 — public
algorithm); composes with the IVF machinery in kmeans.py (probe
lists, then ADC-score only the probed lists' codes).

Cross-engine determinism follows the kmeans.py discipline: fixed-point
BIGINT components (floor(x*1e6)), exact integer squared-L2 per
subspace, floor-mean centroid updates, ties to the smaller centroid
id — bit-identical codebooks/codes/ADC scores on any engine, which is
what makes the q126 driver oracle possible.

Scale shape:
  * train: the corpus is touched once per Lloyd round, as
    (id, sub, subvector) rows — m_sub * n rows, one broadcast join
    against the (m_sub * ksub)-row codebook (statistic-sized by
    construction), argmin folded with min(struct). Updates
    partial-aggregate on (sub, scid, dim): ksub * d result rows.
  * encode: the final assignment IS the code table (id, sub, scid) —
    no extra pass.
  * search: per-query distance table = queries x m_sub x ksub rows
    (broadcast); ADC = one equi-join of the code table against it on
    (sub, scid) + a (query, item) partial agg; top-k via
    TakeOrderedAndProject. No shuffle of anything vector-sized.

Reference analogue: ToyOCR quantizes its detection feature maps to
int8 for deployment (the survey's K-family encoders); here the engine
quantizes the corpus-side representation itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from toyocr_spark.operators.kmeans import _scaled


def _subvectors(
    df: DataFrame, id_col: str, vec_col: str, m_sub: int, sub_dim: int
) -> DataFrame:
    """(id, sub, sv): fixed-point subspace slices of each vector."""
    vecs = df.select(F.col(id_col).alias("id"), _scaled(vec_col).alias("v"))
    subs = F.array(*[F.lit(s) for s in range(m_sub)])
    return vecs.select(
        "id",
        F.explode(
            F.transform(
                subs,
                lambda s: F.struct(
                    s.cast("int").alias("sub"),
                    F.slice("v", s * sub_dim + 1, sub_dim).alias("sv"),
                ),
            )
        ).alias("e"),
    ).select("id", F.col("e.sub").alias("sub"), F.col("e.sv").alias("sv"))


def _sub_assign(svecs: DataFrame, codebook: DataFrame) -> DataFrame:
    """(id, sub, sv, scid, dist): nearest sub-centroid per (vector,
    subspace) by exact integer squared-L2, ties to the smaller scid.
    codebook: (sub, scid, scv).

    Map-only (r6, the kmeans_assign discipline): the per-subspace
    codebook collapses to ksub-element array rows joined broadcast on
    ``sub`` (m_sub rows), and the argmin folds with
    array_min(struct(dist, scid)) — identical tie-break to the old
    min(struct) aggregate, with no groupBy shuffle of the n*m_sub
    rows. ``sv`` rides along so the update needs no join either."""
    cb = codebook.groupBy("sub").agg(
        F.collect_list(F.struct("scid", "scv")).alias("_cbs")
    )
    per = F.transform(
        F.col("_cbs"),
        lambda c: F.struct(
            F.aggregate(
                F.zip_with(F.col("sv"), c["scv"], lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dist"),
            c["scid"].alias("scid"),
        ),
    )
    scored = svecs.join(F.broadcast(cb), "sub").withColumn("_b", F.array_min(per))
    return scored.select(
        "id", "sub", "sv", F.col("_b.scid").alias("scid"), F.col("_b.dist").alias("dist")
    )


def _sub_update(assigned: DataFrame) -> DataFrame:
    """New sub-centroids: floor per-dim mean per (sub, scid) — over the
    assignment's carried ``sv``, no join back to the subvector table."""
    member_dims = assigned.select(
        "sub", "scid", F.posexplode("sv").alias("dim", "val")
    )
    per_dim = member_dims.groupBy("sub", "scid", "dim").agg(
        F.floor(F.sum("val") / F.count("*")).cast("long").alias("cval")
    )
    return per_dim.groupBy("sub", "scid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cval"))), lambda s: s["cval"]
        ).alias("scv")
    )


def pq_train(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_sub: int = 8,
    ksub: int = 16,
    iters: int = 2,
    dim: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """Train per-subspace Lloyd quantizers and encode the corpus.

    Returns (codebook, codes): codebook (sub, scid, scv array<long>)
    after iters-1 updates, codes (id, sub, scid) = the FINAL assignment
    against that codebook (the kmeans_index discipline: the returned
    index is exactly what the returned codes were computed against).
    Seeds: each subspace's slices of the ksub lowest-id vectors
    (deterministic init, scid = seed vector's id)."""
    sub_dim = dim // m_sub
    svecs = _subvectors(df, id_col, vec_col, m_sub, sub_dim).localCheckpoint(eager=False)
    seeds = (
        df.select(F.col(id_col).alias("id")).orderBy("id").limit(ksub)
    )
    codebook = (
        svecs.join(F.broadcast(seeds), "id")
        .select("sub", F.col("id").alias("scid"), F.col("sv").alias("scv"))
    )
    codes = None
    for it in range(iters):
        codes = _sub_assign(svecs, codebook)
        if it < iters - 1:
            codebook = _sub_update(codes).localCheckpoint()
    return codebook, codes.select("id", "sub", "scid")


def pq_adc_topk(
    queries: DataFrame,
    codebook: DataFrame,
    codes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_sub: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Asymmetric-distance top-k: (query_id, rank, item_id, adc_dist).

    The per-query distance table (queries x m_sub x ksub rows) is the
    ONLY thing computed from raw vectors; candidates are scored by one
    (sub, scid) equi-join against the code table + a (query, item)
    partial agg. Self-matches excluded; rank by (adc_dist, item_id)."""
    sub_dim = dim // m_sub
    qsub = _subvectors(queries, id_col, vec_col, m_sub, sub_dim).select(
        F.col("id").alias("query_id"), "sub", F.col("sv").alias("qv")
    )
    sdist = F.aggregate(
        F.zip_with(F.col("qv"), F.col("scv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    table = qsub.join(F.broadcast(codebook), "sub").select(
        "query_id", "sub", "scid", sdist.alias("sdist")
    )
    scored = (
        codes.withColumnRenamed("id", "item_id")
        .join(F.broadcast(table), ["sub", "scid"])
        .filter(F.col("item_id") != F.col("query_id"))
        .groupBy("query_id", "item_id")
        .agg(F.sum("sdist").alias("adc_dist"))
    )
    from toyocr_spark.operators.selection import topk_per_group

    return topk_per_group(
        scored,
        ["query_id"],
        [F.col("adc_dist").asc(), F.col("item_id").asc()],
        k,
        rank_name="rank",
    ).select("query_id", F.col("rank").cast("long"), "item_id", "adc_dist")


def ivf_pq_topk(
    queries: DataFrame,
    centroids: DataFrame,
    assigned: DataFrame,
    codebook: DataFrame,
    codes: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_sub: int = 8,
    dim: int = 64,
) -> DataFrame:
    """IVF-PQ search — the composed index architecture at 10^12
    vectors: probe the ``nprobe`` nearest coarse cells (kmeans.py
    machinery), then ADC-score ONLY the probed cells' members against
    the per-query distance table. Neither raw corpus vectors nor
    unprobed cells are touched: candidates = queries x nprobe x
    (n / k_coarse) expected rows, each scored by m_sub integer adds.

    (query_id, rank, item_id, adc_dist); rank by (adc_dist, item_id),
    self-matches excluded."""
    from toyocr_spark.operators.kmeans import ivf_probes
    from toyocr_spark.operators.selection import topk_per_group

    probes = ivf_probes(queries, centroids, nprobe, id_col, vec_col)
    members = assigned.select(F.col("id").alias("item_id"), "cid")
    cand = (
        F.broadcast(probes)
        .join(members, "cid")
        .filter(F.col("item_id") != F.col("query_id"))
        .select("query_id", "item_id")
    )
    sub_dim = dim // m_sub
    qsub = _subvectors(queries, id_col, vec_col, m_sub, sub_dim).select(
        F.col("id").alias("query_id"), "sub", F.col("sv").alias("qv")
    )
    sdist = F.aggregate(
        F.zip_with(F.col("qv"), F.col("scv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    table = qsub.join(F.broadcast(codebook), "sub").select(
        "query_id", "sub", "scid", sdist.alias("sdist")
    )
    scored = (
        cand.join(codes.withColumnRenamed("id", "item_id"), "item_id")
        .join(F.broadcast(table), ["query_id", "sub", "scid"])
        .groupBy("query_id", "item_id")
        .agg(F.sum("sdist").alias("adc_dist"))
    )
    return topk_per_group(
        scored,
        ["query_id"],
        [F.col("adc_dist").asc(), F.col("item_id").asc()],
        k,
        rank_name="rank",
    ).select("query_id", F.col("rank").cast("long"), "item_id", "adc_dist")


def pq_write_index(
    spark,
    corpus: DataFrame,
    table_prefix: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_sub: int = 8,
    ksub: int = 16,
    iters: int = 2,
    dim: int = 64,
) -> None:
    """Train the sub-quantizers ONCE and persist the PQ index — the
    same train-once/search-many pattern as kmeans.ivf_write_index. A
    petabyte corpus trains its codebook in one job; every later search
    reads ``{prefix}_codebook`` (m_sub x ksub rows) and
    ``{prefix}_codes`` (the 16-64x-compressed corpus representation)
    and pays ZERO training stages. Codes need no bucketing: search
    joins them against a BROADCAST per-query distance table, so the
    scan is map-side however the files are laid out."""
    codebook, codes = pq_train(corpus, id_col, vec_col, m_sub, ksub, iters, dim)
    codebook.write.mode("overwrite").format("parquet").saveAsTable(
        f"{table_prefix}_codebook"
    )
    codes.write.mode("overwrite").format("parquet").saveAsTable(
        f"{table_prefix}_codes"
    )


def pq_persisted_search(
    spark,
    queries: DataFrame,
    table_prefix: str,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_sub: int = 8,
    dim: int = 64,
) -> DataFrame:
    """ADC top-k against a persisted PQ index: pure search — the plan
    scans the query vectors, the codebook, and the code table; no
    k-means stage exists anywhere (plan-locked by test_plans)."""
    return pq_adc_topk(
        queries,
        spark.table(f"{table_prefix}_codebook"),
        spark.table(f"{table_prefix}_codes"),
        k,
        id_col,
        vec_col,
        m_sub,
        dim,
    )
