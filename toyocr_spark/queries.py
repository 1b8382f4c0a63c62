"""Named query contract: every operator from SURVEY.md §2 exposed as a
(spark_callable, oracle_sql) pair over the driver-provided tables.

This module is the `__spark_entry__.py` backing store AND the local
cross-check harness input (tests/test_oracle_parity.py runs both sides
through DuckDB exactly like the driver does).

Determinism rules for oracle parity (SURVEY.md §7):
  * every computed column aliased identically on both sides;
  * doubles rounded at a fixed scale on both sides;
  * all rank/row_number windows carry a total order (explicit
    tie-break columns);
  * only engine-portable hashes (md5) and string ops
    (length/replace/substr) — no murmur3, no regex.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from toyocr_spark.functions.textfns import LANG_MARKERS, lang_id_scores, quality_features, token_count
from toyocr_spark.operators.dedup import (
    HOT_SHINGLE_DF_CAP,
    char_shingles,
    exact_dedup,
    jaccard_pairs,
    minhash_band_signatures,
    minhash_lsh_candidates,
    paragraph_dedup,
    simhash16,
)
from toyocr_spark.operators.evalagg import average_precision, pr_hmean
from toyocr_spark.operators.islands import gap_islands
from toyocr_spark.operators.occupancy import occupancy_projection
from toyocr_spark.operators.rangejoin import interval_overlap_join, mutual_first_match, overlap_anti_join
from toyocr_spark.operators.selection import local_max_filter, topk_mean, topk_per_group
from toyocr_spark.operators.bloom import bloom_build, with_bloom_verdict
from toyocr_spark.operators.textindex import bm25_retrieve, pmi_bigrams, tfidf_topk
from toyocr_spark.operators.similarity import (
    brute_force_cosine_topk,
    bucketed_cosine_topk,
    embedding_near_dup,
)


@dataclass(frozen=True)
class QuerySpec:
    spark: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # None => not SQL-expressible (driver does rows-only check)
    note: str = ""


QUERIES: dict[str, QuerySpec] = {}


def _q(name: str, sql: str | None, note: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn, sql, note)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Per-session plan reuse: spark.read.parquet re-lists the directory
    # and re-reads the footer schema on EVERY call (~120 ms of
    # synchronous driver-side work), which a catalog table registration
    # would pay once. The DataFrame is an immutable logical plan — reuse
    # it across queries in the same session; every action still scans
    # the parquet files themselves (no data or results are cached).
    cache = getattr(spark, "_toyocr_table_plans", None)
    if cache is None:
        cache = {}
        spark._toyocr_table_plans = cache  # type: ignore[attr-defined]
    key = (sf_dir, name)
    df = cache.get(key)
    if df is None:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        cache[key] = df
    return df



# ---------------------------------------------------------------------------
# scan + filter + aggregate (S1, F5, A1/A2 — pushdown-able TPC-H Q1 shape)


@_q(
    "q01_scan_agg",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)      AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*), 4)                                        AS avg_qty,
           count(*)                                                    AS n
    FROM lineitem
    WHERE l_shipdate <= timestamp '1997-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    "pushdown filter + grouped aggregates (graft of A1/A2 masked sums); "
    "sums go through exact DECIMAL so the result is independent of "
    "floating-point summation ORDER — a double sum over 10^5 rows "
    "carries ~1e-4 order noise, enough to straddle a cents rounding "
    "boundary between engines",
)
def q01_scan_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    base = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,6)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(base).cast("double").alias("sum_base"),
            F.round(F.sum(base * disc), 2).cast("double").alias("sum_disc"),
            F.round(F.sum(qty).cast("double") / F.count("*"), 4).alias("avg_qty"),
            F.count("*").alias("n"),
        )
    )


@_q(
    "q02_topk_per_group",
    """
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    ) WHERE rk <= 3
    """,
    "D2 per-key top-K via rank window (centernet_decode.py:106-128)",
)
def q02_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    top = topk_per_group(
        o, ["o_custkey"], [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()], 3
    )
    return top.select(
        "o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "rk"
    )


@_q(
    "q03_local_max",
    """
    SELECT user_id, event_id, round(value, 4) AS value
    FROM (
      SELECT user_id, event_id, value,
             max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS wmax
      FROM events
    ) WHERE value = wmax
    """,
    "D1 pseudo-NMS: keep local maxima over a +-1 row window",
)
def q03_local_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    out = local_max_filter(e, ["user_id"], [F.col("ts").asc(), F.col("event_id").asc()], "value")
    return out.select("user_id", "event_id", F.round("value", 4).alias("value"))


@_q(
    "q04_sessions",
    """
    WITH t AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ets, value,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                       - lag(CAST(floor(epoch(ts)) AS BIGINT))
                         OVER (PARTITION BY user_id ORDER BY ts) > 1800
                  THEN 1 ELSE 0 END AS new_island
      FROM events
    ), g AS (
      SELECT user_id, ets, value,
             CAST(sum(new_island) OVER (PARTITION BY user_id ORDER BY ets
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island_id
      FROM t
    )
    SELECT user_id, island_id,
           count(*)                AS n_events,
           min(ets)                AS first_ts,
           max(ets)                AS last_ts,
           round(sum(value), 4)    AS sum_value
    FROM g GROUP BY user_id, island_id
    """,
    "D7 gap-and-island sessionization (toydet_decode.py:113-179 in 1-D)",
)
def q04_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").withColumn("ets", F.unix_timestamp("ts"))
    return gap_islands(
        e,
        ["user_id"],
        "ets",
        gap=1800,
        agg={
            "n_events": F.count("*"),
            "first_ts": F.min("ets"),
            "last_ts": F.max("ets"),
            "sum_value": F.round(F.sum("value"), 4),
        },
    )


# interval fixture shared by q05-q07: [epoch(ts), +60*(event_id%7+1))
_IVAL_SQL = """
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS start,
             CAST(floor(epoch(ts)) AS BIGINT) + 60 * (event_id % 7 + 1) AS "end"
      FROM events
"""


def _intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").withColumn("start", F.unix_timestamp("ts"))
    return e.select(
        "user_id",
        "event_id",
        "start",
        (F.col("start") + 60 * (F.col("event_id") % 7 + 1)).alias("end"),
    )


@_q(
    "q05_overlap_join",
    f"""
    WITH iv AS ({_IVAL_SQL})
    SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
           least(a."end", b."end") - greatest(a.start, b.start) AS overlap
    FROM iv a JOIN iv b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND a.start < b."end" AND b.start < a."end"
    """,
    "D14 interval theta-join keyed per user (iou_loss.py:27-81 in 1-D)",
)
def q05_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    iv = _intervals(spark, sf_dir)
    a = iv.select("user_id", F.col("event_id").alias("id_a"), "start", "end")
    b = iv.select("user_id", F.col("event_id").alias("id_b"), "start", "end")
    j = interval_overlap_join(a, b, ["user_id"])
    return j.filter(F.col("id_a") < F.col("id_b")).select("user_id", "id_a", "id_b", "overlap")


@_q(
    "q06_dontcare_anti",
    f"""
    WITH iv AS ({_IVAL_SQL}),
    det AS (SELECT * FROM iv WHERE event_id % 2 = 0 AND event_id % 5 <> 0),
    dc  AS (SELECT * FROM iv WHERE event_id % 5 = 0)
    SELECT d.user_id, d.event_id FROM det d
    WHERE NOT EXISTS (
      SELECT 1 FROM dc
      WHERE dc.user_id = d.user_id
        AND d.start < dc."end" AND dc.start < d."end"
        AND (least(d."end", dc."end") - greatest(d.start, dc.start))
            * 1.0 / (d."end" - d.start) > 0.5
    )
    """,
    "J4 don't-care suppression as left_anti overlap join (scripts.py:232-241)",
)
def q06_dontcare_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    iv = _intervals(spark, sf_dir)
    det = iv.filter((F.col("event_id") % 2 == 0) & (F.col("event_id") % 5 != 0))
    dc = iv.filter(F.col("event_id") % 5 == 0).select("user_id", "start", "end")
    out = overlap_anti_join(det, dc, ["user_id"], min_fraction=0.5)
    return out.select("user_id", "event_id")


@_q(
    "q07_greedy_match",
    f"""
    WITH iv AS ({_IVAL_SQL}),
    gt  AS (SELECT user_id, event_id AS gt_idx,  start, "end" FROM iv WHERE event_id % 2 = 0),
    det AS (SELECT user_id, event_id AS det_idx, start, "end" FROM iv WHERE event_id % 2 = 1),
    pairs AS (
      SELECT g.user_id, g.gt_idx, d.det_idx,
             (least(g."end", d."end") - greatest(g.start, d.start)) * 1.0
             / (greatest(g."end", d."end") - least(g.start, d.start)) AS iou
      FROM gt g JOIN det d
        ON g.user_id = d.user_id AND g.start < d."end" AND d.start < g."end"
    ), f AS (SELECT * FROM pairs WHERE iou > 0.3),
    p1 AS (
      SELECT *, row_number() OVER (PARTITION BY user_id, det_idx ORDER BY gt_idx) AS r1 FROM f
    ), p2 AS (
      SELECT *, row_number() OVER (PARTITION BY user_id, gt_idx ORDER BY det_idx) AS r2
      FROM p1 WHERE r1 = 1
    )
    SELECT user_id, gt_idx, det_idx, round(iou, 6) AS iou FROM p2 WHERE r2 = 1
    """,
    "J3-style 1:1 matching, declarative mutual-first variant "
    "(exact greedy with used-flags = greedy_iou_match, unit-tested)",
)
def q07_greedy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    iv = _intervals(spark, sf_dir)
    gt = iv.filter(F.col("event_id") % 2 == 0).select(
        "user_id", F.col("event_id").alias("gt_idx"), "start", "end"
    )
    det = iv.filter(F.col("event_id") % 2 == 1).select(
        "user_id", F.col("event_id").alias("det_idx"), "start", "end"
    )
    m = mutual_first_match(gt, det, ["user_id"], iou_threshold=0.3)
    return m.select("user_id", "gt_idx", "det_idx", F.round("iou", 6).alias("iou"))


@_q(
    "q08_pr_hmean",
    """
    WITH flags AS (
      SELECT source,
             CASE WHEN n_chars % 2 = 0 THEN 1 ELSE 0 END AS det,
             CASE WHEN n_chars % 3 = 0 THEN 1 ELSE 0 END AS gt
      FROM documents
    ), g AS (
      SELECT source,
             CAST(sum(det * gt) AS BIGINT) AS matched_sum,
             CAST(sum(gt)  AS BIGINT)      AS num_gt_care,
             CAST(sum(det) AS BIGINT)      AS num_det_care
      FROM flags GROUP BY source
    )
    SELECT source, matched_sum, num_gt_care, num_det_care,
           round(CASE WHEN num_det_care = 0 THEN 0.0
                      ELSE matched_sum * 1.0 / num_det_care END, 6) AS precision,
           round(CASE WHEN num_gt_care = 0 THEN 1.0
                      ELSE matched_sum * 1.0 / num_gt_care END, 6)  AS recall,
           round(CASE WHEN (CASE WHEN num_det_care = 0 THEN 0.0 ELSE matched_sum * 1.0 / num_det_care END)
                         + (CASE WHEN num_gt_care = 0 THEN 1.0 ELSE matched_sum * 1.0 / num_gt_care END) = 0
                 THEN 0.0
                 ELSE 2 * (CASE WHEN num_det_care = 0 THEN 0.0 ELSE matched_sum * 1.0 / num_det_care END)
                        * (CASE WHEN num_gt_care = 0 THEN 1.0 ELSE matched_sum * 1.0 / num_gt_care END)
                      / ((CASE WHEN num_det_care = 0 THEN 0.0 ELSE matched_sum * 1.0 / num_det_care END)
                         + (CASE WHEN num_gt_care = 0 THEN 1.0 ELSE matched_sum * 1.0 / num_gt_care END)) END, 6) AS hmean
    FROM g
    """,
    "A4 two-level P/R/hmean (scripts.py:284-335)",
)
def q08_pr_hmean(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    det = (F.col("n_chars") % 2 == 0).cast("int")
    gt = (F.col("n_chars") % 3 == 0).cast("int")
    out = pr_hmean(d, ["source"], matched=(det * gt), gt_care=gt, det_care=det)
    return out.select(
        "source",
        "matched_sum",
        "num_gt_care",
        "num_det_care",
        F.round("precision", 6).alias("precision"),
        F.round("recall", 6).alias("recall"),
        F.round("hmean", 6).alias("hmean"),
    )


@_q(
    "q09_ap",
    """
    WITH r AS (
      SELECT CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS correct,
             sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)
               OVER (ORDER BY n_chars DESC, doc_id ROWS UNBOUNDED PRECEDING) AS cum,
             count(*) OVER (ORDER BY n_chars DESC, doc_id ROWS UNBOUNDED PRECEDING) AS rnk
      FROM documents
    )
    SELECT round(sum(CASE WHEN correct = 1 THEN cum * 1.0 / rnk ELSE 0.0 END)
                 / (SELECT count(*) FROM documents WHERE doc_id % 3 = 0), 6) AS ap
    FROM r
    """,
    "A5 rank-based average precision (scripts.py:129-147)",
)
def q09_ap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    n_gt = d.filter(F.col("doc_id") % 3 == 0).count()
    ap = average_precision(
        d, "n_chars", correct=(F.col("doc_id") % 3 == 0), num_gt=n_gt, tiebreak_col="doc_id"
    )
    return ap.select(F.round("ap", 6).alias("ap"))


@_q(
    "q10_occupancy",
    """
    WITH iv AS (
      SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS s,
             CAST(l_quantity AS BIGINT) + l_linenumber AS e
      FROM lineitem
    )
    SELECT l_returnflag, bucket, 1 AS occupied, count(*) AS weight
    FROM (
      SELECT l_returnflag, unnest(generate_series(s // 5, (e - 1) // 5)) AS bucket
      FROM iv WHERE e > s
    ) GROUP BY l_returnflag, bucket
    """,
    "A8 occupancy projection via explode(sequence) (transform_cropresize.py:143-160)",
)
def q10_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("s"),
        (F.col("l_quantity").cast("long") + F.col("l_linenumber")).alias("e"),
    )
    return occupancy_projection(li, "s", "e", 5, ["l_returnflag"])


@_q(
    "q11_region_revenue",
    """
    SELECT r.r_name,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    "J1 broadcast enrichment chain + grouped revenue (build.py:99-146)",
)
def q11_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,6)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@_q(
    "q12_topk_mean",
    """
    SELECT round(avg(l_extendedprice), 4) AS topk_mean, count(*) AS topk_n
    FROM (
      SELECT l_extendedprice FROM lineitem WHERE l_returnflag = 'R'
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100
    )
    """,
    "A3 hardest-K mean (mse_loss.py:44-66)",
)
def q12_topk_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    out = topk_mean(
        li,
        [F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()],
        100,
        value_col="l_extendedprice",
    )
    return out.select(F.round("topk_mean", 4).alias("topk_mean"), "topk_n")


# ---------------------------------------------------------------------------
# dedup family (training-data pipeline operators)


@_q(
    "q13_dedup_exact",
    """
    SELECT md5(text) AS digest, min(doc_id) AS keep_id, count(*) AS n_dups
    FROM documents GROUP BY md5(text)
    """,
    "exact dedup: hash-groupBy survivor selection",
)
def q13_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(_t(spark, sf_dir, "documents"), "doc_id", "text")


_SHINGLE_SQL = """
      SELECT DISTINCT doc_id AS id, substr(t, p, 8) AS shingle
      FROM (SELECT doc_id, substr(text, 1, 128) AS t FROM documents WHERE lang = 'de'),
           unnest(generate_series(1, greatest(length(t) - 7, 1))) AS u(p)
      WHERE length(t) >= 8
"""


def _de_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "documents")
        .filter(F.col("lang") == "de")
        .select("doc_id", F.substring("text", 1, 128).alias("t"))
    )


# shingles with the hot-shingle (boilerplate) doc-frequency cap applied
# — the oracle twin of jaccard_pairs(max_doc_freq=HOT_SHINGLE_DF_CAP).
# sh0 stays available for the node universe (a doc whose every shingle
# is boilerplate still exists; it just proposes no pairs).
_CAPPED_SHINGLE_SQL = f"""
    sh0 AS ({_SHINGLE_SQL}),
    ok AS (SELECT shingle FROM sh0 GROUP BY shingle
           HAVING count(*) <= {HOT_SHINGLE_DF_CAP}),
    sh AS (SELECT sh0.id, sh0.shingle FROM sh0 JOIN ok USING (shingle))
"""


@_q(
    "q14_jaccard",
    f"""
    WITH {_CAPPED_SHINGLE_SQL},
    sz AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT id_a, id_b, inter, x.n AS size_a, y.n AS size_b,
           round(inter * 1.0 / (x.n + y.n - inter), 6) AS jaccard
    FROM inter JOIN sz x ON id_a = x.id JOIN sz y ON id_b = y.id
    WHERE inter * 1.0 / (x.n + y.n - inter) >= 0.1
    """,
    "char-shingle n-gram Jaccard near-dup pairs (hot-shingle df cap on: "
    "boilerplate shingles never reach the pair join)",
)
def q14_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = char_shingles(_de_docs(spark, sf_dir), "doc_id", "t", 8)
    out = jaccard_pairs(sh, min_jaccard=0.1, max_doc_freq=HOT_SHINGLE_DF_CAP)
    return out.select(
        "id_a", "id_b", "inter", "size_a", "size_b", F.round("jaccard", 6).alias("jaccard")
    )


@_q(
    "q15_minhash_lsh",
    f"""
    WITH sh AS ({_SHINGLE_SQL}),
    sig AS (
      SELECT id, b AS band, min(md5(CAST(b AS VARCHAR) || '|' || shingle)) AS sig
      FROM sh, unnest(generate_series(0, 7)) AS t(b)
      GROUP BY id, b
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig AND a.id < b.id
    ),
    sz AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id
    ),
    ver AS (
      SELECT id_a, id_b, round(inter * 1.0 / (x.n + y.n - inter), 6) AS jaccard
      FROM inter JOIN sz x ON id_a = x.id JOIN sz y ON id_b = y.id
      WHERE inter * 1.0 / (x.n + y.n - inter) >= 0.1
    )
    SELECT v.id_a, v.id_b, v.jaccard
    FROM ver v JOIN cand c ON v.id_a = c.id_a AND v.id_b = c.id_b
    """,
    "MinHash band signatures + LSH bucket join + exact verify",
)
def q15_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.operators.dedup import jaccard_for_pairs

    # by_id: the signature aggregation chain then plans ONE exchange
    # (see char_shingles); the pair-verify re-keys by shingle anyway.
    # Checkpoint: the shingle table feeds both the signature path and
    # the verify path — materialize the explode+dedup once (r6).
    sh = char_shingles(_de_docs(spark, sf_dir), "doc_id", "t", 8, by_id=True).localCheckpoint(eager=False)
    cands = minhash_lsh_candidates(minhash_band_signatures(sh, 8))
    # verify ONLY candidates (sub-quadratic; the full self-join verify
    # would defeat LSH at corpus scale)
    ver = jaccard_for_pairs(sh, cands, min_jaccard=0.1)
    return ver.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


_NIBBLE = "(strpos('0123456789abcdef', substr(h, {i}, 1)) - 1)"
_HEX4 = " + ".join(f"{_NIBBLE.format(i=i + 1)} * {16 ** (3 - i)}" for i in range(4))

_SIMHASH_BITS_SQL = ",\n".join(
    f"CAST(sum(CASE WHEN (v // {1 << i}) % 2 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS b{i}"
    for i in range(16)
)
_SIMHASH_SUM_SQL = " + ".join(f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(16))


@_q(
    "q16_simhash",
    f"""
    WITH sh AS (
      SELECT DISTINCT doc_id AS id, substr(t, p, 8) AS shingle
      FROM (SELECT doc_id, substr(text, 1, 128) AS t FROM documents),
           unnest(generate_series(1, greatest(length(t) - 7, 1))) AS u(p)
      WHERE length(t) >= 8
    ),
    hx AS (SELECT id, ({_HEX4}) AS v
           FROM (SELECT id, substr(md5(shingle), 1, 4) AS h FROM sh)),
    bits AS (SELECT id, {_SIMHASH_BITS_SQL} FROM hx GROUP BY id)
    SELECT id, CAST({_SIMHASH_SUM_SQL} AS BIGINT) AS simhash FROM bits
    """,
    "portable 16-bit SimHash over md5 nibbles",
)
def q16_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 128).alias("t")
    )
    return simhash16(d, "doc_id", "t", 8)


# ---------------------------------------------------------------------------
# similarity search


_COS_SQL = """
    WITH e AS (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS item_id, sum(q.v * c.v) AS dp
      FROM e q JOIN e c ON q.i = c.i
      WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id
      GROUP BY q.vec_id, c.vec_id
    ),
    scored AS (
      SELECT query_id, item_id, dp / (a.nrm * b.nrm) AS cos
      FROM dots JOIN nrm a ON query_id = a.vec_id JOIN nrm b ON item_id = b.vec_id
    )
"""


@_q(
    "q17_ann_brute",
    f"""
    {_COS_SQL}
    SELECT query_id, item_id, round(cos, 6) AS cos, rk FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, item_id) AS rk
      FROM scored
    ) WHERE rk <= 5
    """,
    "brute-force cosine top-k (exact ANN baseline)",
)
def q17_ann_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    out = brute_force_cosine_topk(emb, q, 5)
    return out.select("query_id", "item_id", F.round("cos", 6).alias("cos"), "rk")


_BKT_SQL = (
    "(CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END"
    " + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END"
    " + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END"
    " + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END)"
)


@_q(
    "q18_ann_bucketed",
    f"""
    WITH b AS (SELECT vec_id, {_BKT_SQL} AS bkt FROM embeddings),
    e AS (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS item_id, sum(q.v * c.v) AS dp
      FROM e q JOIN e c ON q.i = c.i
      JOIN b qb ON q.vec_id = qb.vec_id JOIN b cb ON c.vec_id = cb.vec_id
      WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id AND qb.bkt = cb.bkt
      GROUP BY q.vec_id, c.vec_id
    ),
    scored AS (
      SELECT query_id, item_id, dp / (a.nrm * b2.nrm) AS cos
      FROM dots JOIN nrm a ON query_id = a.vec_id JOIN nrm b2 ON item_id = b2.vec_id
    )
    SELECT query_id, item_id, round(cos, 6) AS cos, rk FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, item_id) AS rk
      FROM scored
    ) WHERE rk <= 5
    """,
    "sign-bucketed (IVF/LSH-style) approximate cosine top-k",
)
def q18_ann_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    out = bucketed_cosine_topk(emb, q, 5, bits=4)
    return out.select("query_id", "item_id", F.round("cos", 6).alias("cos"), "rk")


@_q(
    "q19_embedding_near_dup",
    f"""
    WITH b AS (SELECT vec_id, {_BKT_SQL} AS bkt FROM embeddings),
    e AS (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
    dots AS (
      SELECT a.vec_id AS id_a, c.vec_id AS id_b, sum(a.v * c.v) AS dp
      FROM e a JOIN e c ON a.i = c.i
      JOIN b ab ON a.vec_id = ab.vec_id JOIN b cb ON c.vec_id = cb.vec_id
      WHERE a.vec_id < c.vec_id AND ab.bkt = cb.bkt
      GROUP BY a.vec_id, c.vec_id
    )
    SELECT id_a, id_b, round(dp / (x.nrm * y.nrm), 6) AS cos
    FROM dots JOIN nrm x ON id_a = x.vec_id JOIN nrm y ON id_b = y.vec_id
    WHERE dp / (x.nrm * y.nrm) >= 0.25
    """,
    "embedding-cosine near-dup pairs via sign-bucket join",
)
def q19_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = embedding_near_dup(_t(spark, sf_dir, "embeddings"), min_cos=0.25, bits=4)
    return out.select("id_a", "id_b", F.round("cos", 6).alias("cos"))


# ---------------------------------------------------------------------------
# text analysis


def _occ_sql(expr: str, sub: str) -> str:
    esc = sub.replace("'", "''")
    return f"(length({expr}) - length(replace({expr}, '{esc}', ''))) / {len(sub)}"


def _lang_score_sql(lang: str) -> str:
    return "CAST(" + " + ".join(_occ_sql("p", m) for m in LANG_MARKERS[lang]) + " AS BIGINT)"


_LANG_CASE_SQL = (
    "CASE WHEN "
    + " + ".join(f"score_{lg}" for lg in sorted(LANG_MARKERS))
    + " = 0 THEN 'und' "
    + " ".join(
        f"WHEN score_{lg} = greatest({', '.join('score_' + x for x in sorted(LANG_MARKERS))}) THEN '{lg}'"
        for lg in sorted(LANG_MARKERS)
    )
    + " END"
)


@_q(
    "q20_lang_id",
    f"""
    WITH p AS (SELECT doc_id, lang, ' ' || lower(text) || ' ' AS p FROM documents),
    s AS (SELECT doc_id, lang,
                 {", ".join(f"{_lang_score_sql(lg)} AS score_{lg}" for lg in sorted(LANG_MARKERS))}
          FROM p)
    SELECT doc_id, lang, {_LANG_CASE_SQL} AS lang_pred,
           {", ".join(f"score_{lg}" for lg in sorted(LANG_MARKERS))}
    FROM s
    """,
    "marker-word language ID (portable n-gram heuristic)",
)
def q20_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    out = lang_id_scores(d, "text")
    return out.select(
        "doc_id", "lang", "lang_pred", *[f"score_{lg}" for lg in sorted(LANG_MARKERS)]
    )


_Q21_STOP = " + ".join(_occ_sql("' ' || lower(text) || ' '", m) for m in LANG_MARKERS["en"])
_Q21_PUNCT = " + ".join(_occ_sql("text", c) for c in (".", ",", "!", "?"))


@_q(
    "q21_quality",
    f"""
    WITH f AS (
      SELECT doc_id,
             length(text) AS q_chars,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE CAST({_occ_sql("trim(text)", " ")} + 1 AS BIGINT) END AS q_tokens,
             CAST({_Q21_PUNCT} AS BIGINT) AS q_punct,
             CAST({_Q21_STOP} AS BIGINT) AS q_stopwords
      FROM documents
    )
    SELECT doc_id, CAST(q_chars AS BIGINT) AS q_chars, q_tokens,
           round(CASE WHEN q_tokens > 0
                      THEN (q_chars - (q_tokens - 1)) * 1.0 / q_tokens
                      ELSE 0.0 END, 4) AS q_mean_tok_len,
           q_punct, q_stopwords,
           CAST(CASE WHEN q_chars >= 80 AND q_tokens >= 16
                      AND (q_chars - (q_tokens - 1)) * 1.0 / q_tokens >= 2.0
                      AND (q_chars - (q_tokens - 1)) * 1.0 / q_tokens <= 12.0
                      AND q_punct >= 1
                THEN 1 ELSE 0 END AS INTEGER) AS q_keep
    FROM f
    """,
    "quality features + keep flag (C4-style corpus filter)",
)
def q21_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = quality_features(d, "text")
    return out.select(
        "doc_id", "q_chars", "q_tokens", "q_mean_tok_len", "q_punct", "q_stopwords", "q_keep"
    )


@_q(
    "q22_token_fingerprint",
    """
    WITH sh AS (
      SELECT DISTINCT doc_id AS id, md5(substr(t, p, 8)) AS h
      FROM (SELECT doc_id, substr(text, 1, 128) AS t FROM documents),
           unnest(generate_series(1, greatest(length(t) - 7, 1))) AS u(p)
      WHERE length(t) >= 8
    ),
    bk AS (
      SELECT id, h, row_number() OVER (PARTITION BY id ORDER BY h) AS rk FROM sh
    ),
    fp AS (SELECT id, string_agg(h, '' ORDER BY h) AS fingerprint FROM bk WHERE rk <= 4 GROUP BY id)
    SELECT d.doc_id AS id,
           CASE WHEN length(trim(d.text)) = 0 THEN 0
                ELSE CAST((length(trim(d.text)) - length(replace(trim(d.text), ' ', ''))) / 1 + 1 AS BIGINT)
           END AS n_tokens,
           fp.fingerprint
    FROM documents d JOIN fp ON d.doc_id = fp.id
    """,
    "token counting + bottom-k md5 fingerprint (winnowing-style sketch)",
)
def q22_token_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.functions.textfns import bottomk_fingerprint

    d = _t(spark, sf_dir, "documents")
    fp = bottomk_fingerprint(
        d.select("doc_id", F.substring("text", 1, 128).alias("t")), "doc_id", "t", 8, 4
    )
    toks = d.select(F.col("doc_id").alias("id"), token_count(F.col("text")).alias("n_tokens"))
    return toks.join(fp, "id").select("id", "n_tokens", "fingerprint")


@_q(
    "q23_json_props",
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
    "JSON scalar extraction + aggregate (from_json family)",
)
def q23_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
        F.count("*").alias("n"),
    )


@_q(
    "q24_levenshtein",
    """
    SELECT doc_id,
           CAST(levenshtein(substr(text, 1, 24),
                            replace(substr(text, 1, 24), 'a', 'e')) AS BIGINT) AS lev
    FROM documents
    """,
    "J5 edit-distance transcript matching (text_eval_script.py:405-418)",
)
def q24_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    a = F.substring("text", 1, 24)
    return d.select(
        "doc_id",
        F.levenshtein(a, F.replace(a, F.lit("a"), F.lit("e"))).cast("long").alias("lev"),
    )


# ---------------------------------------------------------------------------
# multimodal: binary payload columns, decode + frame-sample plumbing
# (synthetic FMED container; real codecs are a documented stub seam —
# toyocr_spark/multimodal.py)


@_q(
    "q26_media_decode",
    """
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS kind,
           CAST(64 + doc_id % 512 AS INT) AS width,
           CAST(32 + doc_id % 256 AS INT) AS height,
           CAST(1 + doc_id % 4 AS INT) AS channels,
           CAST(octet_length(encode(text)) AS BIGINT) AS body_len
    FROM documents
    """,
    "binary media decode via mapInArrow (header parse; the byte->array "
    "decode seam of dataset_mapper.py:151-155); oracle = closed form of "
    "the deterministic synth",
)
def q26_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.multimodal import decode_media, synth_media

    return decode_media(synth_media(_t(spark, sf_dir, "documents")))


@_q(
    "q27_media_frames",
    """
    SELECT doc_id AS media_id,
           CAST(4 AS INT) AS n_frames,
           CAST(octet_length(encode(text)) // 4 AS BIGINT) AS frame_len,
           CAST(octet_length(encode(text))
                - 3 * (octet_length(encode(text)) // 4) AS BIGINT) AS last_frame_len
    FROM documents
    """,
    "video frame-sampling plumbing (equal byte-slices; keyframe extract "
    "seam), oracle = closed-form slice arithmetic",
)
def q27_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.multimodal import sample_frames, synth_media

    return sample_frames(synth_media(_t(spark, sf_dir, "documents")), n_frames=4)


# ---------------------------------------------------------------------------
# sampler layer (SURVEY.md §2.9 W6, §2.7 A6)


@_q(
    "q28_class_histogram",
    """
    SELECT lang, source, count(*) AS n,
           CAST(sum(n_chars) AS BIGINT) AS chars
    FROM documents GROUP BY lang, source
    """,
    "A6 class histogram (print_instances_class_histogram, build.py:189)",
)
def q28_class_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n"), F.sum("n_chars").cast("long").alias("chars")
    )


@_q(
    "q29_repeat_factor",
    """
    WITH f AS (
      SELECT lang, count(*) AS cnt,
             (SELECT count(*) FROM documents) AS total
      FROM documents GROUP BY lang
    ),
    r AS (
      SELECT lang,
             least(4, greatest(1, CAST((total // 5 + cnt - 1) // cnt AS INT))) AS rep
      FROM f
    )
    SELECT d.doc_id, CAST(u.i AS INT) AS rep_idx
    FROM documents d JOIN r ON d.lang = r.lang,
         unnest(generate_series(1, r.rep)) AS u(i)
    """,
    "W6 RepeatFactor weighted sampling (build.py:283-287): rare classes "
    "duplicated by an integer repeat factor (pure integer ceil-division — "
    "no float threshold can straddle)",
)
def q29_repeat_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    total = d.count()  # driver-side scalar, like iters_per_epoch (A7)
    freq = d.groupBy("lang").agg(F.count("*").alias("cnt"))
    # pure integer ceil-division `(total//5 + cnt - 1) div cnt`, matching
    # the oracle's `//` exactly — no float can straddle a boundary
    rep = freq.select(
        "lang",
        F.expr(f"least(4, greatest(1, ({total // 5} + cnt - 1) div cnt))")
        .cast("int")
        .alias("rep"),
    )
    return d.join(F.broadcast(rep), "lang").select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.col("rep"))).alias("rep_idx"),
    )


@_q(
    "q30_gather_sorted",
    """
    SELECT vec_id,
           round(CAST(embedding[CAST(vec_id % 8 AS INT) + 1] AS DOUBLE), 4) AS gathered,
           CAST(u.p AS INT) AS pos,
           round(CAST(list_reverse_sort(embedding[1:4])[u.p] AS DOUBLE), 4) AS top_desc
    FROM embeddings, unnest(generate_series(1, 4)) AS u(p)
    WHERE vec_id < 100
    """,
    "D3 gather-by-ordinal via element_at (centernet_decode.py:9-23) + W3 "
    "desc confidence sort (sort_array, build.py:141-142). The sorted "
    "array is EXPLODED to (pos, value) rows: the driver canonicalizes "
    "results via pandas sort_values, which cannot sort list-typed "
    "columns — scalar columns only in the query contract.",
)
def q30_gather_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    idx = (F.pmod(F.col("vec_id"), F.lit(8)).cast("int") + 1).cast("int")
    exploded = e.select(
        "vec_id",
        F.round(F.element_at("embedding", idx).cast("double"), 4).alias("gathered"),
        F.posexplode(F.sort_array(F.slice("embedding", 1, 4), asc=False)).alias(
            "pos0", "v"
        ),
    )
    return exploded.select(
        "vec_id",
        "gathered",
        (F.col("pos0") + 1).cast("int").alias("pos"),
        F.round(F.col("v").cast("double"), 4).alias("top_desc"),
    )


@_q(
    "q31_array_hof_filters",
    """
    SELECT vec_id,
           len(list_filter(embedding, y -> y > 0)) AS n_pos,
           CAST(len(list_filter(embedding, y -> y > 0.5)) > 0 AS BOOLEAN) AS any_big
    FROM embeddings
    WHERE len(list_filter(embedding, y -> y > 0)) >= 2
    """,
    "F1/F3 array filter()/exists() HOFs: keep records with >=2 positive "
    "elements (filter_images_with_only_crowd_annotations shape, "
    "build.py:38-64, in-array form)",
)
def q31_array_hof_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    n_pos = F.size(F.filter("embedding", lambda y: y > 0))
    return (
        e.select(
            "vec_id",
            n_pos.alias("n_pos"),
            F.exists("embedding", lambda y: y > 0.5).alias("any_big"),
        )
        .filter(F.col("n_pos") >= 2)
    )


@_q(
    "q32_dedup_clusters",
    f"""
    WITH RECURSIVE {_CAPPED_SHINGLE_SQL},
    sz AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id
    ),
    pairs AS (
      SELECT i.id_a, i.id_b
      FROM inter i JOIN sz x ON i.id_a = x.id JOIN sz y ON i.id_b = y.id
      WHERE i.inter * 1.0 / (x.n + y.n - i.inter) >= 0.1
    ),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(src, dst) AS (
      SELECT DISTINCT id, id FROM sh0
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    )
    SELECT src AS doc_id, min(dst) AS cluster_id,
           CAST(src = min(dst) AS BOOLEAN) AS canonical
    FROM reach GROUP BY src
    """,
    "near-dup pairs -> dedup clusters via min-label propagation "
    "(connected components, the keep-one-per-cluster step of corpus "
    "dedup); oracle = recursive-CTE transitive closure. Pair generation "
    "runs with the hot-shingle df cap; the node universe stays uncapped "
    "(all-boilerplate docs keep a singleton cluster)",
)
def q32_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.operators.dedup import (
        char_shingles,
        connected_components,
        jaccard_pairs,
    )

    d = _de_docs(spark, sf_dir)
    sh = char_shingles(d, "doc_id", "t", 8)
    pairs = jaccard_pairs(
        sh, min_jaccard=0.1, max_doc_freq=HOT_SHINGLE_DF_CAP
    ).select("id_a", "id_b")
    # node universe = docs that produce >= 1 shingle, i.e. exactly the
    # char_shingles length gate — computed from the doc table directly
    # so the CC tail join never re-runs the shingle explode (r6)
    nodes = d.filter(F.length("t") >= 8).select(F.col("doc_id").alias("id"))
    cc = connected_components(pairs, nodes)
    return cc.select(
        F.col("id").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
        (F.col("id") == F.col("cluster_id")).alias("canonical"),
    )


@_q(
    "q33_skew_safe_topk",
    """
    SELECT source, doc_id, n_chars, rk FROM (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM documents
    ) WHERE rk <= 5
    """,
    "two-phase skew-safe per-key top-K (salted partial rank, then final "
    "rank over <= K*B survivors); row-identical to the naive window — "
    "the hot-host-window fix (SURVEY.md §4 skew handling)",
)
def q33_skew_safe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.operators.selection import skew_safe_topk

    d = _t(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    out = skew_safe_topk(d, ["source"], "n_chars", 5, tiebreak_col="doc_id")
    return out.select("source", "doc_id", "n_chars", "rk")


@_q(
    "q34_string_funcs",
    """
    SELECT doc_id,
           upper(lang) AS lang_uc,
           translate(substr(text, 1, 24), 'aeiou', 'AEIOU') AS vowels_uc,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           split_part(source, '-', 1) AS source_head,
           length(trim(substr(text, 1, 40))) AS trimmed_len
    FROM documents
    """,
    "§2.10 string family: upper/translate/regexp_extract/split/trim — "
    "the line-format parsing kit (rrc_evaluation_funcs.py:80-93) over "
    "portable dialect-identical forms",
)
def q34_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_uc"),
        F.translate(F.substring("text", 1, 24), "aeiou", "AEIOU").alias("vowels_uc"),
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.split(F.col("source"), "-").getItem(0).alias("source_head"),
        F.length(F.trim(F.substring("text", 1, 40))).alias("trimmed_len"),
    )


@_q(
    "q35_approx_sketches",
    """
    WITH agg AS (
      SELECT l_returnflag,
             CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_returnflag
    ),
    ranked AS (
      SELECT l_returnflag, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice) AS rn
      FROM lineitem
    ),
    ps AS (SELECT CAST(unnest([0.5, 0.95, 0.99]) AS DOUBLE) AS p)
    SELECT a.l_returnflag, a.exact_orders, a.n, ps.p,
           r.l_extendedprice AS exact_q,
           TRUE AS sketch_ok
    FROM agg a CROSS JOIN ps
    JOIN ranked r
      ON r.l_returnflag = a.l_returnflag
     AND r.rn = CAST(floor((a.n - 1) * ps.p) AS BIGINT) + 1
    """,
    "approximate aggregates for corpus stats at scale: HLL distinct "
    "counts + quantile sketches (single pass, mergeable partial state "
    "— the only viable shapes at 10^12 rows). Sketch values differ per "
    "engine, so the DRIVER check is the tolerance test itself: Spark "
    "emits exact values (rank-selected quantiles — the value at "
    "floor((n-1)*p)+1, bit-identical across engines on the raw parquet "
    "doubles) plus sketch_ok = |approx - exact| within the sketch's "
    "error envelope computed against its OWN exact aggregates; the "
    "oracle emits exact + TRUE. The hash matches iff every sketch is "
    "in tolerance. Quantiles are EXPLODED to (p, exact_q) rows: the "
    "driver canonicalizer cannot sort list-typed columns.",
)
def q35_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    ps = [0.5, 0.95, 0.99]
    # percentile_approx must NOT share an aggregate with count_distinct:
    # the distinct-expand rewrite would key the partial percentile
    # sketch by (flag, orderkey) — one QuantileSummaries buffer PER
    # ORDER (measured 16.5s vs 0.5s at sf0.1, and unbounded state at
    # scale). Two single-pass aggregates + a flag-cardinality join.
    agg_d = li.groupBy("l_returnflag").agg(
        F.count_distinct(F.col("l_orderkey")).alias("exact_orders"),
    )
    agg_q = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("_approx_orders"),
        F.percentile_approx("l_extendedprice", ps, 10_000).alias("_pq"),
        F.count("*").alias("n"),
        F.min("l_extendedprice").alias("_lo"),
        F.max("l_extendedprice").alias("_hi"),
    )
    agg = agg_d.join(
        agg_q, "l_returnflag"
    ).localCheckpoint()  # flag-cardinality rows feed 3 consumers below
    # (EAGER: one consumer is a broadcast build — the small side must be
    # computed before the broadcast job, not inside it, guide §7.4)
    p_labels = F.array(*[F.lit(p) for p in ps])
    targets = (
        agg.select(
            "l_returnflag",
            "exact_orders",
            "n",
            "_approx_orders",
            F.posexplode("_pq").alias("_qi", "_approx_q"),
        )
        .withColumn("p", F.element_at(p_labels, F.col("_qi") + 1))
        # the same double expression as the oracle: (n-1)*p in IEEE
        # double, floored — both engines compute identical bits
        .withColumn(
            "_trk", (F.floor((F.col("n") - F.lit(1)) * F.col("p")) + 1).cast("long")
        )
    )
    # Exact rank-k selection via a value-bucket histogram instead of a
    # corpus-wide row_number window: a window partitioned by a 3-value
    # key is 3 tasks over the whole table (and the old plan then
    # BROADCAST the ranked row-cardinality table — both 100x-killers).
    # Here: (1) one partial-agg shuffle builds a flag x 256-bucket
    # histogram; (2) a window over that tiny histogram (<= |flags|*256
    # rows at ANY corpus size) finds the bucket holding each target
    # rank; (3) only rows inside target-bearing buckets (expected n/256
    # per flag; pathological value-skew degrades gracefully to a
    # flag-sized sort, documented) are ranked. Every join builds the
    # statistic-sized side.
    _nb = 256
    spans = agg.select("l_returnflag", "_lo", "_hi")  # flag-cardinality dim
    bucketed = (
        li.select("l_returnflag", F.col("l_extendedprice").alias("_price"))
        .join(F.broadcast(spans), "l_returnflag")
        .withColumn(
            "_b",
            F.least(
                F.lit(_nb - 1),
                F.floor(
                    (F.col("_price") - F.col("_lo"))
                    * _nb
                    / (F.col("_hi") - F.col("_lo") + F.lit(1e-9))
                ).cast("long"),
            ),
        )
        .select("l_returnflag", "_price", "_b")
    )
    hist = bucketed.groupBy("l_returnflag", "_b").agg(F.count("*").alias("_bc"))
    wb = Window.partitionBy("l_returnflag").orderBy("_b")
    cum = (
        hist.withColumn("_cum", F.sum("_bc").over(wb))
        .withColumn("_prev", F.col("_cum") - F.col("_bc"))
        .select(
            F.col("l_returnflag").alias("_rf"), "_b", "_cum", "_prev"
        )
    )
    # locate the bucket containing rank _trk: _prev < _trk <= _cum
    cells = targets.join(
        cum,
        (F.col("l_returnflag") == F.col("_rf"))
        & (F.col("_trk") > F.col("_prev"))
        & (F.col("_trk") <= F.col("_cum")),
    ).select(
        F.col("l_returnflag").alias("_crf"),
        F.col("_b").alias("_cb"),
        "exact_orders",
        "n",
        "p",
        "_approx_orders",
        "_approx_q",
        (F.col("_trk") - F.col("_prev")).alias("_rk_in_b"),
    )
    w2 = Window.partitionBy("_crf", "_cb", "p").orderBy("_price")
    joined = (
        bucketed.join(
            F.broadcast(cells),
            (F.col("l_returnflag") == F.col("_crf")) & (F.col("_b") == F.col("_cb")),
        )
        .withColumn("_rnb", F.row_number().over(w2))
        .where(F.col("_rnb") == F.col("_rk_in_b"))
        .select(
            "l_returnflag",
            "exact_orders",
            "n",
            "p",
            F.col("_price").alias("exact_q"),
            "_approx_orders",
            "_approx_q",
        )
    )
    hll_ok = (
        F.abs(F.col("_approx_orders") - F.col("exact_orders"))
        <= 0.1 * F.col("exact_orders")  # 5x the rsd=0.02 envelope
    )
    q_ok = F.abs(F.col("_approx_q").cast("double") - F.col("exact_q")) <= 0.05 * F.abs(
        F.col("exact_q")
    )  # rank error n/accuracy => tiny value drift; 5% is generous
    return joined.select(
        "l_returnflag",
        "exact_orders",
        "n",
        "p",
        "exact_q",
        (hll_ok & q_ok).alias("sketch_ok"),
    )


_SIMHASH_CTE = f"""
    WITH sh AS (
      SELECT DISTINCT doc_id AS id, substr(t, p, 8) AS shingle
      FROM (SELECT doc_id, substr(text, 1, 128) AS t FROM documents),
           unnest(generate_series(1, greatest(length(t) - 7, 1))) AS u(p)
      WHERE length(t) >= 8
    ),
    hx AS (SELECT id, ({_HEX4}) AS v
           FROM (SELECT id, substr(md5(shingle), 1, 4) AS h FROM sh)),
    bits AS (SELECT id, {_SIMHASH_BITS_SQL} FROM hx GROUP BY id),
    sim AS (SELECT id, CAST({_SIMHASH_SUM_SQL} AS BIGINT) AS simhash FROM bits)
"""


@_q(
    "q36_simhash_pairs",
    f"""
    {_SIMHASH_CTE},
    banded AS (
      SELECT id, simhash, b AS band,
             (simhash // CAST(pow(2, b * 4) AS BIGINT)) % 16 AS bucket
      FROM sim, unnest(generate_series(0, 3)) AS t(b)
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b,
             a.simhash AS sh_a, b.simhash AS sh_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3
    """,
    "SimHash near-dup pairing: 4-bit band join proposes candidates "
    "(any pair within hamming<=3 of 16 bits shares >=1 exact band — "
    "pigeonhole), verified by bit_count(xor)",
)
def q36_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 128).alias("t")
    )
    # the signature table feeds both join sides: checkpoint it so the
    # shingle+signature aggregation runs once, not per side (r6)
    sim = simhash16(d, "doc_id", "t", 8).localCheckpoint(eager=False)
    band = F.explode(F.sequence(F.lit(0), F.lit(3)))
    banded = sim.select("id", "simhash", band.alias("band")).withColumn(
        "bucket",
        F.expr("pmod(simhash div cast(pow(2, band * 4) as bigint), 16)"),
    )
    a = banded.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "band", "bucket"
    )
    b = banded.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "band", "bucket"
    )
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int")
    return cand.select("id_a", "id_b", ham.alias("hamming")).filter(
        F.col("hamming") <= 3
    )


# ---------------------------------------------------------------------------
# 64-bit SimHash (production width) + exact greedy matching


def _hex4_at(o: int) -> str:
    """DuckDB value of the 4 hex chars of column h at 1-based offset o."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substr(h, {o + i}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    )


_SIM64_BITS_SQL = ",\n".join(
    f"CAST(sum(CASE WHEN (v{j} // {1 << i}) % 2 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS b{j}_{i}"
    for j in range(4)
    for i in range(16)
)
_SIM64_CHUNKS_SQL = ",\n".join(
    "CAST("
    + " + ".join(f"(CASE WHEN b{j}_{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(16))
    + f" AS BIGINT) AS c{j}"
    for j in range(4)
)

_SIM64_CTE = f"""
    WITH sh AS (
      SELECT DISTINCT doc_id AS id, substr(t, p, 8) AS shingle
      FROM (SELECT doc_id, substr(text, 1, 128) AS t FROM documents),
           unnest(generate_series(1, greatest(length(t) - 7, 1))) AS u(p)
      WHERE length(t) >= 8
    ),
    hx AS (SELECT id, ({_hex4_at(1)}) AS v0, ({_hex4_at(5)}) AS v1,
                  ({_hex4_at(9)}) AS v2, ({_hex4_at(13)}) AS v3
           FROM (SELECT id, substr(md5(shingle), 1, 16) AS h FROM sh)),
    bits AS (SELECT id, {_SIM64_BITS_SQL} FROM hx GROUP BY id),
    sim AS (SELECT id, {_SIM64_CHUNKS_SQL} FROM bits)
"""


@_q(
    "q38_simhash64",
    f"""
    {_SIM64_CTE}
    SELECT id, c0, c1, c2, c3,
           lower(lpad(to_hex(c0), 4, '0') || lpad(to_hex(c1), 4, '0')
                 || lpad(to_hex(c2), 4, '0') || lpad(to_hex(c3), 4, '0')) AS simhash
    FROM sim
    """,
    "production-width 64-bit SimHash over md5 nibbles, materialized as "
    "four portable 16-bit chunks + hex string (the 16-bit q16 is the "
    "readable demo; this is the corpus-scale width — 2^16-sized band "
    "buckets keep candidate sets sparse)",
)
def q38_simhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.operators.dedup import simhash64

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 128).alias("t")
    )
    return simhash64(d, "doc_id", "t", 8)


@_q(
    "q39_simhash64_pairs",
    f"""
    {_SIM64_CTE},
    banded AS (
      SELECT id, c0, c1, c2, c3, b AS band,
             CASE b WHEN 0 THEN c0 WHEN 1 THEN c1 WHEN 2 THEN c2 ELSE c3 END AS bucket
      FROM sim, unnest(generate_series(0, 3)) AS t(b)
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b,
             a.c0 AS a0, a.c1 AS a1, a.c2 AS a2, a.c3 AS a3,
             b.c0 AS b0, b.c1 AS b1, b.c2 AS b2, b.c3 AS b3
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(a0, b0)) + bit_count(xor(a1, b1))
              + bit_count(xor(a2, b2)) + bit_count(xor(a3, b3)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(a0, b0)) + bit_count(xor(a1, b1))
        + bit_count(xor(a2, b2)) + bit_count(xor(a3, b3)) <= 3
    """,
    "64-bit SimHash banded near-dup pairing: 4x16-bit band equi-join "
    "proposes (pigeonhole-complete for hamming<=3), chunkwise "
    "bit_count(xor) verifies — the corpus-scale twin of q36",
)
def q39_simhash64_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.operators.dedup import simhash64, simhash64_pairs

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 128).alias("t")
    )
    return simhash64_pairs(simhash64(d, "doc_id", "t", 8), max_hamming=3)


@_q(
    "q37_greedy_exact",
    f"""
    WITH RECURSIVE iv AS ({_IVAL_SQL}),
    gt  AS (SELECT user_id, event_id AS gt_idx,  start, "end" FROM iv WHERE event_id % 2 = 0),
    det AS (SELECT user_id, event_id AS det_idx, start, "end" FROM iv WHERE event_id % 2 = 1),
    f AS (
      SELECT * FROM (
        SELECT g.user_id, g.gt_idx, d.det_idx,
               (least(g."end", d."end") - greatest(g.start, d.start)) * 1.0
               / (greatest(g."end", d."end") - least(g.start, d.start)) AS iou
        FROM gt g JOIN det d
          ON g.user_id = d.user_id AND g.start < d."end" AND d.start < g."end"
      ) WHERE iou > 0.3
    ),
    gts AS (
      SELECT user_id, gt_idx,
             row_number() OVER (PARTITION BY user_id ORDER BY gt_idx) AS rnk
      FROM (SELECT DISTINCT user_id, gt_idx FROM f)
    ),
    step(user_id, rnk, used, gt_idx, det_pick) AS (
      SELECT user_id, 0, CAST([] AS BIGINT[]), NULL, NULL
      FROM (SELECT DISTINCT user_id FROM f)
      UNION ALL
      SELECT g.user_id, g.rnk,
             CASE WHEN p.d IS NULL THEN s.used ELSE list_append(s.used, p.d) END,
             g.gt_idx, p.d
      FROM step s
      JOIN gts g ON g.user_id = s.user_id AND g.rnk = s.rnk + 1
      LEFT JOIN LATERAL (
        SELECT min(f.det_idx) AS d FROM f
        WHERE f.user_id = g.user_id AND f.gt_idx = g.gt_idx
          AND NOT list_contains(s.used, f.det_idx)
      ) p ON TRUE
    )
    SELECT s.user_id, s.gt_idx, s.det_pick AS det_idx, round(f.iou, 6) AS iou
    FROM step s JOIN f ON f.user_id = s.user_id AND f.gt_idx = s.gt_idx
                      AND f.det_idx = s.det_pick
    WHERE s.det_pick IS NOT NULL
    """,
    "J3 exact greedy 1:1 matching with used-flags "
    "(evaluation/scripts.py:246-270) via applyInPandas per equi-key — "
    "the driver-visible twin of q07's declarative variant. Oracle = "
    "recursive CTE that replays the greedy loop: gts in index order, "
    "each taking the min unused det with IoU over threshold, the used "
    "set carried as a list through the recursion",
)
def q37_greedy_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.operators.rangejoin import greedy_iou_match

    iv = _intervals(spark, sf_dir)
    gt = iv.filter(F.col("event_id") % 2 == 0).select(
        "user_id", F.col("event_id").alias("gt_idx"), "start", "end"
    )
    det = iv.filter(F.col("event_id") % 2 == 1).select(
        "user_id", F.col("event_id").alias("det_idx"), "start", "end"
    )
    m = greedy_iou_match(gt, det, ["user_id"], iou_threshold=0.3)
    return m.select("user_id", "gt_idx", "det_idx", F.round("iou", 6).alias("iou"))


# ---------------------------------------------------------------------------
# PDF leg of the extraction kernel: pages synthesized JVM-side as real
# (uncompressed) PDF byte streams, extracted through the same pipeline


@_q(
    "q40_pdf_extract",
    """
    SELECT 'https://pdf-' || CAST(doc_id AS VARCHAR) || '.example/doc.pdf' AS url,
           text AS extracted_text,
           1 AS n_kept
    FROM documents
    """,
    "PDF extraction over minimal single-stream PDFs built with pure "
    "built-in functions (the corpus is ASCII with no ()\\\\, checked, so "
    "no escaping stage is needed); oracle = identity on the known "
    "template, the q25 pattern for the %PDF- dispatch path",
)
def q40_pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.pipeline import extract_pages

    d = _t(spark, sf_dir, "documents")
    content = F.concat(F.lit("BT /F1 12 Tf 50 700 Td ("), F.col("text"), F.lit(") Tj ET"))
    pdf = F.concat(
        F.lit(
            "%PDF-1.4\n"
            "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            "3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            "/Contents 4 0 R >>\nendobj\n"
            "4 0 obj\n<< /Length "
        ),
        F.length(content).cast("string"),  # ASCII: chars == bytes
        F.lit(" >>\nstream\n"),
        content,
        F.lit("\nendstream\nendobj\ntrailer\n<< /Root 1 0 R >>\n%%EOF\n"),
    )
    pages = d.select(
        F.concat(F.lit("https://pdf-"), F.col("doc_id").cast("string"), F.lit(".example/doc.pdf")).alias(
            "url"
        ),
        F.encode(pdf, "UTF-8").alias("html"),
    )
    out = extract_pages(pages)
    return out.select("url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept"))


# ---------------------------------------------------------------------------
# crawl-side URL operators: canonicalization dedup + outlink extraction

_URL_SYNTH_SQL = """
      CASE CAST(doc_id % 4 AS INTEGER)
        WHEN 0 THEN 'HTTPS://WWW.Host-' || CAST(doc_id % 7 AS VARCHAR) || '.Example:443/Article/'
                    || CAST(doc_id % 50 AS VARCHAR) || '?utm_source=feed&ref='
                    || CAST(doc_id % 3 AS VARCHAR) || '&a=1#section-2'
        WHEN 1 THEN 'https://host-' || CAST(doc_id % 7 AS VARCHAR) || '.example/Article/'
                    || CAST(doc_id % 50 AS VARCHAR) || '?a=1&ref=' || CAST(doc_id % 3 AS VARCHAR)
        WHEN 2 THEN 'http://Host-' || CAST(doc_id % 7 AS VARCHAR) || '.example:80/News/'
                    || CAST(doc_id % 50 AS VARCHAR) || '/?gclid=xyz&b=2'
        ELSE 'https://www.host-' || CAST(doc_id % 7 AS VARCHAR) || '.EXAMPLE:8080/Article/'
             || CAST(doc_id % 50 AS VARCHAR) || '#frag'
      END
"""


def _url_synth_col() -> "F.Column":
    d7 = (F.col("doc_id") % 7).cast("string")
    d50 = (F.col("doc_id") % 50).cast("string")
    d3 = (F.col("doc_id") % 3).cast("string")
    v = (F.col("doc_id") % 4).cast("int")
    return (
        F.when(
            v == 0,
            F.concat(
                F.lit("HTTPS://WWW.Host-"), d7, F.lit(".Example:443/Article/"), d50,
                F.lit("?utm_source=feed&ref="), d3, F.lit("&a=1#section-2"),
            ),
        )
        .when(
            v == 1,
            F.concat(F.lit("https://host-"), d7, F.lit(".example/Article/"), d50, F.lit("?a=1&ref="), d3),
        )
        .when(
            v == 2,
            F.concat(F.lit("http://Host-"), d7, F.lit(".example:80/News/"), d50, F.lit("/?gclid=xyz&b=2")),
        )
        .otherwise(
            F.concat(F.lit("https://www.host-"), d7, F.lit(".EXAMPLE:8080/Article/"), d50, F.lit("#frag"))
        )
    )


@_q(
    "q41_url_canonical",
    f"""
    WITH raw AS (
      SELECT doc_id, {_URL_SYNTH_SQL} AS url FROM documents
    ),
    s1 AS (SELECT doc_id, split_part(url, '#', 1) AS u FROM raw),
    s2 AS (SELECT doc_id, u, lower(split_part(u, '://', 1)) AS scheme,
                  substr(u, length(split_part(u, '://', 1)) + 4) AS rest FROM s1),
    s3 AS (SELECT *, split_part(rest, '/', 1) AS hostport,
                  substr(rest, length(split_part(rest, '/', 1)) + 1) AS path_q FROM s2),
    s4 AS (SELECT *,
                  CASE WHEN starts_with(lower(split_part(hostport, ':', 1)), 'www.')
                       THEN substr(lower(split_part(hostport, ':', 1)), 5)
                       ELSE lower(split_part(hostport, ':', 1)) END AS host,
                  CASE WHEN contains(hostport, ':') THEN split_part(hostport, ':', 2)
                       ELSE '' END AS port
           FROM s3),
    s5 AS (SELECT *,
                  CASE WHEN port = '' OR (scheme = 'https' AND port = '443')
                            OR (scheme = 'http' AND port = '80')
                       THEN '' ELSE ':' || port END AS port_part,
                  CASE WHEN split_part(path_q, '?', 1) = '' THEN '/'
                       ELSE split_part(path_q, '?', 1) END AS path,
                  CASE WHEN contains(path_q, '?')
                       THEN substr(path_q, position('?' IN path_q) + 1)
                       ELSE '' END AS qs
           FROM s4),
    s6 AS (SELECT *,
                  list_sort(list_filter(string_split(qs, '&'),
                      p -> p != '' AND NOT starts_with(split_part(p, '=', 1), 'utm_')
                           AND split_part(p, '=', 1) NOT IN ('fbclid','gclid','msclkid','ref_src')
                  )) AS kept
           FROM s5),
    canon AS (SELECT doc_id,
                     scheme || '://' || host || port_part || path ||
                     CASE WHEN len(kept) > 0 THEN '?' || array_to_string(kept, '&')
                          ELSE '' END AS canonical_url
              FROM s6)
    SELECT canonical_url, min(doc_id) AS survivor_id, count(*) AS n_dups
    FROM canon GROUP BY canonical_url
    """,
    "canonical-URL dedup: lowercase scheme/host, strip www./default "
    "port/fragment/tracking params, sort the query string — the "
    "zero-shuffle-projection dedup lever that runs before any content "
    "hashing; one groupBy on the canonical key",
)
def q41_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.functions.urlfns import canonicalize_url

    d = _t(spark, sf_dir, "documents").select("doc_id", _url_synth_col().alias("url"))
    return (
        d.select("doc_id", canonicalize_url(F.col("url")).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(F.min("doc_id").alias("survivor_id"), F.count("*").alias("n_dups"))
    )


@_q(
    "q42_outlinks",
    """
    WITH pages AS (
      SELECT doc_id,
             'https://host-' || CAST(doc_id % 7 AS VARCHAR) || '.example' AS base_root,
             '<html><body><a href="https://ext-' || CAST(doc_id % 5 AS VARCHAR)
             || '.example/x">ext</a><a href="/local/' || CAST(doc_id % 11 AS VARCHAR)
             || '">loc</a><a href="#top">skip</a><a href="page-'
             || CAST(doc_id % 3 AS VARCHAR) || '.html">rel</a></body></html>' AS html
      FROM documents
    ),
    links AS (
      SELECT doc_id, base_root,
             unnest(regexp_extract_all(html, 'href="([^"]+)"', 1)) AS link
      FROM pages
    )
    SELECT doc_id,
           CASE WHEN contains(link, '://') THEN link
                WHEN starts_with(link, '/') THEN base_root || link
                ELSE base_root || '/dir/' || link END AS target,
           CASE WHEN contains(link, '://') THEN 'absolute'
                WHEN starts_with(link, '/') THEN 'root'
                ELSE 'relative' END AS link_type
    FROM links
    WHERE NOT starts_with(link, '#')
    """,
    "outlink extraction + resolution: regexp_extract_all over the html "
    "column, explode to the web-graph edge list (src doc -> resolved "
    "target), fragment links dropped — map-only, no shuffle at all",
)
def q42_outlinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.functions.urlfns import resolve_link

    d = _t(spark, sf_dir, "documents")
    d5 = (F.col("doc_id") % 5).cast("string")
    d7 = (F.col("doc_id") % 7).cast("string")
    d11 = (F.col("doc_id") % 11).cast("string")
    d3 = (F.col("doc_id") % 3).cast("string")
    pages = d.select(
        "doc_id",
        F.concat(F.lit("https://host-"), d7, F.lit(".example")).alias("base_root"),
        F.concat(
            F.lit('<html><body><a href="https://ext-'), d5,
            F.lit('.example/x">ext</a><a href="/local/'), d11,
            F.lit('">loc</a><a href="#top">skip</a><a href="page-'), d3,
            F.lit('.html">rel</a></body></html>'),
        ).alias("html"),
    )
    links = pages.select(
        "doc_id",
        "base_root",
        F.explode(F.regexp_extract_all("html", F.lit(r'href="([^"]+)"'), 1)).alias("link"),
    ).filter(F.substring("link", 1, 1) != "#")
    target = resolve_link(F.col("base_root"), F.concat(F.col("base_root"), F.lit("/dir/")), F.col("link"))
    link_type = (
        F.when(F.instr("link", "://") > 0, F.lit("absolute"))
        .when(F.substring("link", 1, 1) == "/", F.lit("root"))
        .otherwise(F.lit("relative"))
    )
    return links.select("doc_id", target.alias("target"), link_type.alias("link_type"))


@_q(
    "q43_page_metadata",
    """
    WITH pages AS (
      SELECT doc_id,
             '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
             || ' Title</title><link rel="canonical" href="https://canon-'
             || CAST(doc_id % 9 AS VARCHAR) || '.example/c/' || CAST(doc_id % 40 AS VARCHAR)
             || '">'
             || CASE WHEN doc_id % 5 = 0
                     THEN '<meta name="robots" content="noindex, nofollow">'
                     WHEN doc_id % 5 = 1
                     THEN '<meta name="robots" content="index, follow">'
                     ELSE '' END
             || '</head><body><p>body</p></body></html>' AS html
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(html, '<title[^>]*>([^<]*)</title>', 1) AS title,
           regexp_extract(html, '<link[^>]*rel="canonical"[^>]*href="([^"]+)"', 1)
             AS canonical,
           CASE WHEN contains(
                  regexp_extract(html, '<meta[^>]*name="robots"[^>]*content="([^"]*)"', 1),
                  'noindex') THEN 1 ELSE 0 END AS noindex
    FROM pages
    """,
    "page-metadata projection: title / rel=canonical / robots-noindex "
    "pulled JVM-side with anchored single-group regexes — the cheap "
    "crawl-side pre-filter that runs before the extraction kernel ever "
    "sees the page (noindex pages are dropped at scan cost)",
)
def q43_page_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    robots = (
        F.when(F.col("doc_id") % 5 == 0, F.lit('<meta name="robots" content="noindex, nofollow">'))
        .when(F.col("doc_id") % 5 == 1, F.lit('<meta name="robots" content="index, follow">'))
        .otherwise(F.lit(""))
    )
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit(' Title</title><link rel="canonical" href="https://canon-'),
        (F.col("doc_id") % 9).cast("string"),
        F.lit(".example/c/"),
        (F.col("doc_id") % 40).cast("string"),
        F.lit('">'),
        robots,
        F.lit("</head><body><p>body</p></body></html>"),
    )
    pages = d.select("doc_id", html.alias("html"))
    return pages.select(
        "doc_id",
        F.regexp_extract("html", r"<title[^>]*>([^<]*)</title>", 1).alias("title"),
        F.regexp_extract("html", r'<link[^>]*rel="canonical"[^>]*href="([^"]+)"', 1).alias("canonical"),
        F.when(
            F.regexp_extract("html", r'<meta[^>]*name="robots"[^>]*content="([^"]*)"', 1).contains(
                "noindex"
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("noindex"),
    )


# deterministic integer PageRank: ranks carried as BIGINTs scaled by
# 10^12 with floor division everywhere, so double summation order can
# never straddle a rounding boundary between engines (the cross-engine
# determinism discipline of q01, applied to an iterative op)
_PR_SCALE = 10**12
_PR_ITERS = 3


def _pr_round_sql(prev: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT n.id,
             ({_PR_SCALE} * 15) // (100 * (SELECT count(*) FROM nodes))
             + (85 * coalesce(sum({prev}.rank // deg.outdeg), 0)) // 100 AS rank
      FROM nodes n
      LEFT JOIN edges e ON e.dst = n.id
      LEFT JOIN {prev} ON {prev}.id = e.src
      LEFT JOIN deg ON deg.src = e.src
      GROUP BY n.id
    )"""


@_q(
    "q44_pagerank",
    f"""
    WITH edges AS (
      SELECT DISTINCT doc_id % 100 AS src, (doc_id * 7 + 3) % 100 AS dst
      FROM documents WHERE doc_id % 100 <> (doc_id * 7 + 3) % 100
    ),
    nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
    deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
    r0 AS (SELECT id, {_PR_SCALE} // (SELECT count(*) FROM nodes) AS rank FROM nodes),
    {_pr_round_sql("r0", "r1")},
    {_pr_round_sql("r1", "r2")},
    {_pr_round_sql("r2", "r3")}
    SELECT id, CAST(rank AS BIGINT) AS rank_scaled FROM r3
    """,
    "host-graph PageRank, 3 fixed rounds, damping 0.85 — every round is "
    "one join + one groupBy (the iterative min-label CC shape); integer-"
    "scaled arithmetic makes it bit-exact across engines",
)
def q44_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    src = F.col("doc_id") % 100
    dst = (F.col("doc_id") * 7 + 3) % 100
    edges = d.select(src.alias("src"), dst.alias("dst")).filter(F.col("src") != F.col("dst")).distinct()
    edges = edges.localCheckpoint(eager=False)  # reused every round: cut lineage once
    nodes = edges.select(F.col("src").alias("id")).union(edges.select("dst")).distinct()
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    n_nodes = nodes.count()  # COUNT-driven planning (the A7 pattern)
    ranks = nodes.withColumn("rank", F.lit(_PR_SCALE // n_nodes))
    teleport = (_PR_SCALE * 15) // (100 * n_nodes)
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(ranks.withColumnRenamed("id", "src"), "src")
            .join(deg, "src")
            .select(F.col("dst").alias("id"), F.expr("rank div outdeg").alias("c"))
        )
        ranks = (
            nodes.join(contrib, "id", "left")
            .groupBy("id")
            .agg(
                (F.lit(teleport) + F.expr("85 * coalesce(sum(c), 0) div 100")).alias("rank")
            )
        )
    return ranks.select("id", F.col("rank").alias("rank_scaled"))


_HEX4_DOC = " + ".join(
    f"(strpos('0123456789abcdef', substr(hh, {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
    for i in range(4)
)


@_q(
    "q45_hash_sample",
    f"""
    WITH keyed AS (
      SELECT lang,
             ({_HEX4_DOC}) % 100 AS bucket
      FROM (SELECT lang, substr(md5('s1|' || CAST(doc_id AS VARCHAR)), 1, 4) AS hh
            FROM documents)
    ),
    rates AS (SELECT lang, CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 30 ELSE 10 END AS rate
              FROM (SELECT DISTINCT lang FROM documents))
    SELECT k.lang,
           count(*) AS n_total,
           CAST(sum(CASE WHEN bucket < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM keyed k JOIN rates USING (lang)
    GROUP BY k.lang
    """,
    "deterministic stratified sampling: md5(salt|id) buckets 0..99, "
    "per-language keep rate — reproducible corpus downsampling with no "
    "RNG state, any worker anywhere keeps exactly the same rows",
)
def q45_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit("s1|"), F.col("doc_id").cast("string"))), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    rate = (
        F.when(F.col("lang") == "en", F.lit(50)).when(F.col("lang") == "de", F.lit(30)).otherwise(F.lit(10))
    )
    return (
        d.select("lang", bucket.alias("bucket"), rate.alias("rate"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.when(F.col("bucket") < F.col("rate"), 1).otherwise(0)).alias("n_kept"),
        )
    )


@_q(
    "q46_repetition",
    """
    WITH w AS (
      SELECT doc_id AS id, string_split(trim(text), ' ') AS ws FROM documents
    ),
    w2 AS (SELECT id, ws FROM w WHERE len(ws) >= 2),
    uni AS (SELECT id, u.wd AS wd, count(*) AS c
            FROM w2, unnest(ws) AS u(wd) GROUP BY id, u.wd),
    uni_agg AS (SELECT id, CAST(sum(c) AS BIGINT) AS n_words,
                       max(c) AS top_w, count(*) AS n_uniq
                FROM uni GROUP BY id),
    bi AS (SELECT id, ws[i] || ' ' || ws[i + 1] AS b, count(*) AS c
           FROM w2, unnest(generate_series(1, len(ws) - 1)) AS g(i)
           GROUP BY id, b),
    bi_agg AS (SELECT id, CAST(sum(c) AS BIGINT) AS n_bi, max(c) AS top_b
               FROM bi GROUP BY id)
    SELECT id, n_words,
           round(n_uniq * 1.0 / n_words, 6) AS uniq_word_frac,
           round(top_w * 1.0 / n_words, 6) AS top_word_frac,
           round(top_b * 1.0 / n_bi, 6) AS top_bigram_frac
    FROM uni_agg JOIN bi_agg USING (id)
    """,
    "gopher-style repetition signals (unique-word / top-word / "
    "top-bigram fractions): the repetition class of quality filters "
    "that length/punct heuristics can't see; two-level aggregation with "
    "map-side partials",
)
def q46_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.functions.textfns import repetition_features

    return repetition_features(_t(spark, sf_dir, "documents"), "doc_id", "text")


@_q(
    "q47_asof_join",
    """
    WITH c AS (SELECT user_id, ts, max(value) AS cv
               FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
    e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error')
    SELECT e.event_id, e.user_id, c.cv AS last_click_value
    FROM e ASOF LEFT JOIN c ON e.user_id = c.user_id AND e.ts >= c.ts
    """,
    "as-of (temporal) join: each error event picks up the latest click "
    "value at-or-before its timestamp per user — implemented as a tagged "
    "union + last(ignorenulls) running window (ONE shuffle on user_id, "
    "no range join, no per-pair blowup); oracle = DuckDB's native ASOF "
    "JOIN. The operator Spark lacks built-in, composed from windows",
)
def q47_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("cv"))
        .select("user_id", "ts", "cv", F.lit(0).alias("is_err"), F.lit(None).cast("long").alias("event_id"))
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.lit(None).cast("double").alias("cv"), F.lit(1).alias("is_err"), "event_id"
    )
    tagged = clicks.unionByName(errors)
    # clicks sort before errors at equal ts (at-or-before semantics);
    # (ts, is_err) is a total order after the click pre-aggregation
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_err")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("last_click_value", F.last("cv", ignorenulls=True).over(w))
        .filter(F.col("is_err") == 1)
        .select("event_id", "user_id", "last_click_value")
    )


@_q(
    "q48_paragraph_dedup",
    """
    WITH p0 AS (
      SELECT doc_id AS id, string_split(text, ' ') AS w
      FROM documents WHERE length(text) > 0
    ),
    paras AS (
      SELECT id, u.i - 1 AS pos,
             array_to_string(list_slice(w, (u.i - 1) * 12 + 1, (u.i - 1) * 12 + 12), ' ') AS para
      FROM p0, unnest(generate_series(1, CAST(ceil(len(w) / 12.0) AS BIGINT))) AS u(i)
    ),
    keyed AS (
      SELECT id, pos, para, md5(para) AS digest,
             struct_pack(id := id, pos := pos) AS inst_key FROM paras
    ),
    keep AS (SELECT digest, min(inst_key) AS keep_key FROM keyed GROUP BY digest),
    kept AS (SELECT k.id, k.pos, k.para FROM keyed k JOIN keep USING (digest)
             WHERE inst_key = keep_key),
    totals AS (SELECT id, count(*) AS n_paras FROM keyed GROUP BY id),
    ka AS (SELECT id, count(*) AS n_kept,
                  string_agg(para, chr(10) || chr(10) ORDER BY pos) AS text_kept
           FROM kept GROUP BY id)
    SELECT t.id, t.n_paras, coalesce(ka.n_kept, CAST(0 AS BIGINT)) AS n_kept,
           coalesce(ka.text_kept, '') AS text_kept
    FROM totals t LEFT JOIN ka USING (id)
    """,
    "CCNet-style paragraph-level dedup: fixed word-window paragraphs, "
    "repeated paragraphs keep only their global first occurrence by "
    "(doc_id, pos), survivors re-joined per doc. First-occurrence via "
    "groupBy(digest).min — partial-aggregated, skew-proof on boilerplate "
    "paragraphs (no per-digest window funnel)",
)
def q48_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return paragraph_dedup(_t(spark, sf_dir, "documents"), "doc_id", "text")


_TOKENS_SQL = """
      SELECT id, word FROM (
        SELECT doc_id AS id, unnest(string_split(text, ' ')) AS word FROM documents
      ) WHERE length(word) > 0
"""


@_q(
    "q49_tfidf_topk",
    f"""
    WITH t AS ({_TOKENS_SQL}),
    tf AS (SELECT id, word, count(*) AS tf FROM t GROUP BY id, word),
    dfq AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
    n AS (SELECT count(*) AS n_docs FROM documents),
    s AS (SELECT id, word, tf, df,
                 round(tf * ln((n_docs + 1.0) / (df + 1.0)), 6) AS tfidf
          FROM tf JOIN dfq USING (word) CROSS JOIN n),
    r AS (SELECT *, row_number() OVER (PARTITION BY id ORDER BY tfidf DESC, word ASC) AS rk
          FROM s)
    SELECT id, rk, word, tf, df, tfidf FROM r WHERE rk <= 3
    """,
    "inverted-index TF-IDF: top-3 characteristic terms per doc; partial-agg "
    "tf/df shuffles, corpus size on a broadcast one-row join, per-doc window",
)
def q49_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_topk(_t(spark, sf_dir, "documents"), "doc_id", "text", k=3)


@_q(
    "q50_bm25",
    f"""
    WITH t AS ({_TOKENS_SQL}),
    dl AS (SELECT id, count(*) AS dl FROM t GROUP BY id),
    tf AS (SELECT id, word, count(*) AS tf FROM t
           WHERE word IN ('spark', 'shuffle') GROUP BY id, word),
    dfq AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
    n AS (SELECT count(*) AS n_docs FROM documents),
    ad AS (SELECT avg(dl) AS avgdl FROM dl),
    s AS (SELECT tf.id,
                 ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                 * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS term_score
          FROM tf JOIN dfq USING (word) JOIN dl ON tf.id = dl.id
          CROSS JOIN n CROSS JOIN ad),
    ranked AS (SELECT id, round(sum(term_score), 6) AS score FROM s GROUP BY id),
    r AS (SELECT id, score, row_number() OVER (ORDER BY score DESC, id ASC) AS rk
          FROM ranked)
    SELECT rk, id, score FROM r WHERE rk <= 20
    """,
    "Okapi BM25 ranked retrieval for a 2-term query: Catalyst pushes the "
    "query-term filter below the tf/df aggregates (only matching posting "
    "lists shuffle); dl/avgdl/N ride broadcast one-row joins; final top-k "
    "is orderBy+limit (TakeOrderedAndProject), never a global window",
)
def q50_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_retrieve(
        _t(spark, sf_dir, "documents"), "doc_id", "text", ["spark", "shuffle"], k=20
    )


@_q(
    "q51_pmi_bigrams",
    """
    WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
    pairs AS (SELECT ws[i] AS a, ws[i + 1] AS b
              FROM w, unnest(generate_series(1, len(ws) - 1)) AS u(i)
              WHERE len(ws) >= 2),
    big AS (SELECT a, b, count(*) AS n_ab FROM pairs GROUP BY a, b),
    uni AS (SELECT word, count(*) AS n_w
            FROM (SELECT unnest(ws) AS word FROM w) GROUP BY word),
    tot AS (SELECT (SELECT sum(n_w) FROM uni) AS n_tokens,
                   (SELECT sum(n_ab) FROM big) AS n_bigrams),
    s AS (SELECT big.a, big.b, n_ab, ua.n_w AS n_a, ub.n_w AS n_b,
                 round(ln((n_ab * 1.0 / n_bigrams)
                          / ((ua.n_w * 1.0 / n_tokens) * (ub.n_w * 1.0 / n_tokens))), 6) AS pmi
          FROM big
          JOIN uni ua ON big.a = ua.word
          JOIN uni ub ON big.b = ub.word
          CROSS JOIN tot
          WHERE n_ab >= 5),
    r AS (SELECT *, row_number() OVER (ORDER BY pmi DESC, a ASC, b ASC) AS rk FROM s)
    SELECT rk, a, b, n_ab, n_a, n_b, pmi FROM r WHERE rk <= 50
    """,
    "PMI bigram collocations (phrase-mining / tokenizer-vocab prep): "
    "bigrams by zip-with-shift (linear, no self-join), partial-agg counts, "
    "corpus totals broadcast, distributed top-N via orderBy+limit",
)
def q51_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pmi_bigrams(_t(spark, sf_dir, "documents"), "doc_id", "text", min_count=5, top=50)


# 10-nibble md5 halves as integers (h1 = nibbles 1-10, h2 = 11-20): the
# portable double-hash base of the bloom filter (Kirsch-Mitzenmacher)
def _md5_half_sql(start: int) -> str:
    return " + ".join(
        f"(strpos('0123456789abcdef', substr(h, {start + i}, 1)) - 1) * {16 ** (9 - i)}"
        for i in range(10)
    )


_BLOOM_M = 2048  # deliberately tight so the FP branch is exercised too


@_q(
    "q52_bloom_membership",
    f"""
    WITH kx AS (SELECT doc_id AS id, md5(text) AS h FROM documents),
    hv AS (SELECT id, ({_md5_half_sql(1)}) AS h1, ({_md5_half_sql(11)}) AS h2 FROM kx),
    probes AS (
      SELECT id, ((h1 + i * h2) % {_BLOOM_M}) AS pos
      FROM hv, unnest(generate_series(0, 4)) AS u(i)
    ),
    words AS (
      SELECT pos // 32 AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
      FROM probes WHERE (id % 10) <> 0
      GROUP BY pos // 32
    ),
    verdict AS (
      SELECT p.id,
             bool_and((coalesce(w.bits, 0) & (CAST(1 AS BIGINT) << CAST(p.pos % 32 AS INT))) <> 0)
               AS maybe_seen
      FROM probes p LEFT JOIN words w ON p.pos // 32 = w.word
      GROUP BY p.id
    )
    SELECT (id % 10 <> 0) AS actual_seen, maybe_seen, count(*) AS n
    FROM verdict GROUP BY 1, 2
    """,
    "distributed Bloom filter, bit-for-bit oracle-checked: build = md5 "
    "double-hash -> 32-bit words bit_or-folded (partial agg), probe = "
    "map-side AND-chain against the broadcast words map. Confusion counts "
    "by (actually-in-set, bloom-verdict); no-false-negative contract "
    "means (true, false) never appears",
)
def q52_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    members = d.filter(F.col("doc_id") % 10 != 0)
    bloom = bloom_build(members, F.col("text"), m_bits=_BLOOM_M, k=5)
    probed = with_bloom_verdict(d, F.col("text"), bloom, m_bits=_BLOOM_M, k=5)
    return (
        probed.select((F.col("doc_id") % 10 != 0).alias("actual_seen"), "maybe_seen")
        .groupBy("actual_seen", "maybe_seen")
        .agg(F.count("*").alias("n"))
    )


def _kmeans_round_sql(r: int) -> str:
    return f"""
    d{r} AS (
      SELECT vd.vec_id, c.cid,
             sum((vd.val - c.cval) * (vd.val - c.cval)) AS dist
      FROM vd JOIN c{r - 1} c ON vd.dim = c.dim
      GROUP BY vd.vec_id, c.cid
    ),
    a{r} AS (
      SELECT vec_id, cid, dist FROM (
        SELECT vec_id, cid, dist,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rk
        FROM d{r})
      WHERE rk = 1
    ),
    c{r} AS (
      SELECT a.cid, vd.dim,
             CAST(floor(sum(vd.val) * 1.0 / count(*)) AS BIGINT) AS cval
      FROM a{r} a JOIN vd ON a.vec_id = vd.vec_id
      GROUP BY a.cid, vd.dim
    )"""


@_q(
    "q53_kmeans_ivf",
    f"""
    WITH vd AS (
      SELECT vec_id, i AS dim,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS val
      FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)
    ),
    c0 AS (
      SELECT vec_id AS cid, dim, val AS cval FROM vd
      WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)
    ),
    {_kmeans_round_sql(1)},
    {_kmeans_round_sql(2)},
    d3 AS (
      SELECT vd.vec_id, c.cid,
             sum((vd.val - c.cval) * (vd.val - c.cval)) AS dist
      FROM vd JOIN c2 c ON vd.dim = c.dim
      GROUP BY vd.vec_id, c.cid
    )
    SELECT vec_id AS id, cid, CAST(dist AS BIGINT) AS dist FROM (
      SELECT vec_id, cid, dist,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rk
      FROM d3)
    WHERE rk = 1
    """,
    "integer-exact Lloyd k-means (IVF coarse-quantizer training): "
    "fixed-point BIGINT components (floor(x*1e6), the q44 PageRank "
    "discipline), exact integer squared-L2, floor-mean centroid updates; "
    "3 fixed rounds seeded from the k lowest ids. Assignment is a "
    "broadcast-centroids crossJoin + aggregate/zip_with HOF (no explode "
    "of the vectors); updates partial-aggregate on (cid, dim). "
    "Bit-identical assignments across engines",
)
def q53_kmeans_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.operators.kmeans import kmeans_fit

    return kmeans_fit(_t(spark, sf_dir, "embeddings"), "vec_id", "embedding", k=8, iters=3)



@_q(
    "q54_ann_ivf",
    f"""
    WITH vd AS (
      SELECT vec_id, i AS dim,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS val
      FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)
    ),
    c0 AS (
      SELECT vec_id AS cid, dim, val AS cval FROM vd
      WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)
    ),
    {_kmeans_round_sql(1)},
    {_kmeans_round_sql(2)},
    d3 AS (
      SELECT vd.vec_id, c.cid,
             sum((vd.val - c.cval) * (vd.val - c.cval)) AS dist
      FROM vd JOIN c2 c ON vd.dim = c.dim
      GROUP BY vd.vec_id, c.cid
    ),
    a3 AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rk
        FROM d3)
      WHERE rk = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS prb
        FROM d3 WHERE vec_id < 8)
      WHERE prb <= 2
    ),
    cand AS (
      SELECT p.query_id, a.vec_id AS item_id
      FROM probes p JOIN a3 a ON p.cid = a.cid
      WHERE a.vec_id <> p.query_id
    ),
    e AS (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
    dots AS (
      SELECT cand.query_id, cand.item_id, sum(q.v * c.v) AS dp
      FROM cand
      JOIN e q ON cand.query_id = q.vec_id
      JOIN e c ON cand.item_id = c.vec_id AND q.i = c.i
      GROUP BY cand.query_id, cand.item_id
    ),
    scored AS (
      SELECT query_id, item_id, dp / (a.nrm * b2.nrm) AS cos
      FROM dots JOIN nrm a ON query_id = a.vec_id JOIN nrm b2 ON item_id = b2.vec_id
    )
    SELECT query_id, item_id, round(cos, 6) AS cos, rk FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, item_id) AS rk
      FROM scored
    ) WHERE rk <= 5
    """,
    "IVF approximate nearest neighbours over the trained coarse "
    "quantizer (q53's k-means): queries probe their nprobe=2 nearest "
    "centroids by the same exact integer metric, exact-cosine re-rank "
    "touches only the probed inverted lists. The learned-partition scale "
    "path next to q18's sign-bucket hash path; candidate re-rank is the "
    "only corpus shuffle (queries + centroids broadcast)",
)
def q54_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.operators.kmeans import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.filter(F.col("vec_id") < 8), k=5, nprobe=2)



@_q(
    "q55_unigram_nll",
    f"""
    WITH t AS ({_TOKENS_SQL}),
    uni AS (SELECT word, count(*) AS n_w FROM t GROUP BY word),
    tot AS (SELECT count(*) AS n_tokens FROM t)
    SELECT id, count(*) AS doc_tokens,
           round(avg(-ln(n_w * 1.0 / n_tokens)), 6) AS nll
    FROM t JOIN uni USING (word) CROSS JOIN tot
    GROUP BY id
    """,
    "corpus-unigram LM cross-entropy per doc (the CCNet perplexity-style "
    "quality axis): one partial-agg shuffle for the model, 1:1 model "
    "join per token, broadcast corpus total",
)
def q55_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.operators.textindex import unigram_nll

    return unigram_nll(_t(spark, sf_dir, "documents"), "doc_id", "text")



@_q(
    "q56_dup_spans",
    """
    WITH base AS (
      SELECT doc_id AS id, string_split(text, ' ') AS w,
             len(string_split(text, ' ')) AS nw
      FROM documents WHERE length(text) > 0
    ),
    wins AS (
      SELECT id, u.p AS pos,
             md5(array_to_string(list_slice(w, u.p + 1, u.p + 8), ' ')) AS digest,
             struct_pack(id := id, pos := u.p) AS inst_key
      FROM base, unnest(generate_series(0, nw - 8)) AS u(p)
      WHERE nw >= 8
    ),
    keep AS (SELECT digest, min(inst_key) AS keep_key FROM wins GROUP BY digest),
    dup AS (SELECT w.id, w.pos FROM wins w JOIN keep USING (digest)
            WHERE inst_key <> keep_key),
    dc AS (SELECT id, count(*) AS n_dup_wins FROM dup GROUP BY id),
    removed AS (
      SELECT DISTINCT id, u.wp AS wpos
      FROM dup, unnest(generate_series(pos, pos + 7)) AS u(wp)
    ),
    rc AS (SELECT id, count(*) AS n_removed FROM removed GROUP BY id),
    tokens AS (
      SELECT id, u.i - 1 AS wpos, w[u.i] AS word
      FROM base, unnest(generate_series(1, len(w))) AS u(i)
    ),
    kept AS (
      SELECT t.id, t.wpos, t.word FROM tokens t
      WHERE NOT EXISTS (SELECT 1 FROM removed r
                        WHERE r.id = t.id AND r.wpos = t.wpos)
    ),
    ka AS (SELECT id, string_agg(word, ' ' ORDER BY wpos) AS text_kept
           FROM kept GROUP BY id)
    SELECT b.id, CAST(b.nw AS BIGINT) AS n_words,
           coalesce(dc.n_dup_wins, CAST(0 AS BIGINT)) AS n_dup_wins,
           coalesce(rc.n_removed, CAST(0 AS BIGINT)) AS n_removed,
           coalesce(ka.text_kept, '') AS text_kept
    FROM base b
    LEFT JOIN dc USING (id) LEFT JOIN rc USING (id) LEFT JOIN ka USING (id)
    """,
    "substring-level exact dedup (Lee et al. ExactSubstr policy, rolling "
    "8-word window-hash approximation): duplicated windows keep their "
    "global first occurrence by (doc_id, pos); later occurrences mark "
    "merged word-coverage for removal; survivors re-joined per doc. "
    "First-occurrence via groupBy(digest).min (partial-agg, skew-proof); "
    "coverage is a bounded k-fold fanout of duplicate windows only",
)
def q56_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.operators.dedup import duplicate_span_removal

    return duplicate_span_removal(_t(spark, sf_dir, "documents"), "doc_id", "text", k_words=8)


_HEX10_DOC = " + ".join(
    f"(strpos('0123456789abcdef', substr(hh, {i + 1}, 1)) - 1) * {16 ** (9 - i)}"
    for i in range(10)
)


@_q(
    "q57_weighted_sample",
    f"""
    WITH hx AS (
      SELECT doc_id, n_chars,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 10) AS hh
      FROM documents
    ),
    pr AS (
      SELECT doc_id, n_chars,
             (n_chars * 1099511627776) // (({_HEX10_DOC}) + 1) AS priority
      FROM hx
    ),
    r AS (SELECT doc_id, n_chars, priority,
                 row_number() OVER (ORDER BY priority DESC, doc_id ASC) AS rk
          FROM pr)
    SELECT rk, doc_id, n_chars, priority FROM r WHERE rk <= 50
    """,
    "deterministic weight-proportional priority sample (Duffield-Lund-"
    "Thorup priority sampling): priority = w * 2^40 DIV (u + 1) with u a "
    "40-bit md5-derived uniform — all-integer arithmetic, bit-identical "
    "across engines (the q44 discipline; no libm ln/pow in the sample "
    "decision). Top-k is orderBy+limit (TakeOrderedAndProject), never a "
    "global window — the scale shape for corpus subsampling by length/"
    "quality weight",
)
def q57_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 10), 16, 10).cast(
        "long"
    )
    pr = d.select(
        "doc_id",
        "n_chars",
        F.expr("n_chars * 1099511627776").alias("_num"),
        (u + 1).alias("_den"),
    ).select(
        "doc_id", "n_chars", F.expr("_num div _den").alias("priority")
    )
    top = pr.orderBy(F.col("priority").desc(), F.col("doc_id").asc()).limit(50)
    w = Window.orderBy(F.col("priority").desc(), F.col("doc_id").asc())
    return top.select(
        F.row_number().over(w).alias("rk"), "doc_id", "n_chars", "priority"
    )


@_q(
    "q58_phrase_retrieval",
    """
    WITH t AS (
      SELECT doc_id AS id, u.i - 1 AS pos, w[u.i] AS word
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           unnest(generate_series(1, len(w))) AS u(i)
      WHERE length(w[u.i]) > 0
    ),
    t0 AS (SELECT id, pos AS p0 FROM t WHERE word = 'table'),
    t1 AS (SELECT id, pos - 1 AS p0 FROM t WHERE word = 'hash'),
    hits AS (SELECT id, count(*) AS n_hits
             FROM t0 JOIN t1 USING (id, p0) GROUP BY id),
    r AS (SELECT id, n_hits,
                 row_number() OVER (ORDER BY n_hits DESC, id ASC) AS rk
          FROM hits)
    SELECT rk, id, n_hits FROM r WHERE rk <= 20
    """,
    "exact-phrase retrieval ('table hash') by positional posting-list "
    "intersection: per-term predicate pushed to each join leg's scan, "
    "equi-join on (id, start_pos) with the i-th term shifted back by i — "
    "the conjunctive positional-index plan, never a substring scan; "
    "top-k is TakeOrderedAndProject",
)
def q58_phrase_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.operators.textindex import phrase_retrieve

    return phrase_retrieve(
        _t(spark, sf_dir, "documents"), "doc_id", "text", ["table", "hash"], k=20
    )


@_q(
    "q59_rollup_report",
    """
    SELECT lang, source, grouping(lang, source) AS gid,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(avg(n_chars * 1.0), 4) AS avg_chars
    FROM documents
    GROUP BY ROLLUP (lang, source)
    """,
    "corpus curation report as a ROLLUP lattice (lang, source) -> "
    "(lang) -> (): one pass, partial-aggregated at every level (Spark "
    "plans Expand + single hash aggregate — no N-pass union); gid "
    "disambiguates subtotal rows from genuine NULL group keys",
)
def q59_rollup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.rollup("lang", "source")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.round(F.avg(F.col("n_chars") * F.lit(1.0)), 4).alias("avg_chars"),
        )
        .select("lang", "source", "gid", "n_docs", "total_chars", "avg_chars")
    )


# the CCNet normalization alphabet: characters DELETED before hashing
# (translate with an empty replacement). Kept identical in both engines.
_NORM_STRIP = ".,!?;:'\"()[]"


@_q(
    "q60_normalized_dedup",
    f"""
    WITH norm AS (
      SELECT doc_id AS id,
             md5(lower(translate(text, '{_NORM_STRIP.replace("'", "''")}', ''))) AS digest
      FROM documents
    )
    SELECT digest, min(id) AS keep_id, count(*) AS n_dups
    FROM norm GROUP BY digest
    """,
    "normalization-keyed exact dedup (CCNet discipline: lowercase + "
    "punctuation strip BEFORE hashing, so case/punct mirror pages "
    "collapse into one group); same skew-proof min-survivor shape as "
    "q13, the normalizer is pure Column translate/lower — no Python, "
    "no regex (regex semantics differ across engines)",
)
def q60_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    digest = F.md5(F.lower(F.translate(F.col("text"), _NORM_STRIP, "")))
    return (
        d.select(digest.alias("digest"), F.col("doc_id").alias("id"))
        .groupBy("digest")
        .agg(F.min("id").alias("keep_id"), F.count("*").alias("n_dups"))
    )


@_q(
    "q61_funnel_report",
    """
    WITH u AS (
      SELECT doc_id, count(DISTINCT t.wd) * 1.0 / count(*) AS uf
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
           unnest(ws) AS t(wd)
      GROUP BY doc_id
    ),
    flags AS (
      SELECT CASE WHEN n_chars >= 150 THEN 1 ELSE 0 END AS f1,
             CASE WHEN lang IN ('en', 'de') THEN 1 ELSE 0 END AS f2,
             CASE WHEN uf >= 0.35 THEN 1 ELSE 0 END AS f3
      FROM documents JOIN u USING (doc_id)
    ),
    agg AS (
      SELECT count(*) AS total,
             sum(f1) AS s1,
             sum(f1 * f2) AS s2,
             sum(f1 * f2 * f3) AS s3
      FROM flags
    )
    SELECT 0 AS stage, 'input' AS stage_name, CAST(total AS BIGINT) AS n_docs FROM agg
    UNION ALL SELECT 1, 'min_length', CAST(s1 AS BIGINT) FROM agg
    UNION ALL SELECT 2, 'lang', CAST(s2 AS BIGINT) FROM agg
    UNION ALL SELECT 3, 'repetition', CAST(s3 AS BIGINT) FROM agg
    """,
    "corpus curation funnel: per-stage cumulative retention (input -> "
    "min-length -> lang -> unique-word repetition filter) computed as ONE "
    "pass of per-doc flags + conditional sums, then unpivoted — never N "
    "separate scans of the corpus; the observability query every "
    "training-data pipeline runs after each policy change",
)
def q61_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    terms = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("wd")
    )
    u = terms.groupBy("doc_id").agg(
        (F.count_distinct("wd") * F.lit(1.0) / F.count("*")).alias("uf")
    )
    flags = d.join(u, "doc_id").select(
        F.when(F.col("n_chars") >= 150, 1).otherwise(0).alias("f1"),
        F.when(F.col("lang").isin("en", "de"), 1).otherwise(0).alias("f2"),
        F.when(F.col("uf") >= 0.35, 1).otherwise(0).alias("f3"),
    )
    agg = flags.agg(
        F.count("*").alias("total"),
        F.sum("f1").alias("s1"),
        F.sum(F.col("f1") * F.col("f2")).alias("s2"),
        F.sum(F.col("f1") * F.col("f2") * F.col("f3")).alias("s3"),
    )
    return agg.select(
        F.expr(
            "stack(4, 0, 'input', total, 1, 'min_length', s1, "
            "2, 'lang', s2, 3, 'repetition', s3) AS (stage, stage_name, n_docs)"
        )
    )


@_q(
    "q62_tumbling_windows",
    """
    SELECT date_trunc('hour', ts) AS win_start, event_type,
           count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
    "1-hour tumbling event-time windows (the batch twin of the streaming "
    "watermark aggregation in streaming/ingest.py — same F.window "
    "semantics, same epoch-aligned boundaries as date_trunc): partial-agg "
    "shuffle on (window, type); DECIMAL-exact sums so the result is "
    "independent of per-partition summation order",
)
def q62_tumbling_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(F.col("win.start").alias("win_start"), "event_type", "n", "total_value")
    )


@_q(
    "q63_token_packing",
    """
    WITH tk AS (
      SELECT lang, doc_id, len(string_split(text, ' ')) AS toks
      FROM documents
    ),
    cum AS (
      SELECT lang, doc_id, toks,
             sum(toks) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
      FROM tk
    )
    SELECT lang, CAST((cm - toks) // 2000 AS BIGINT) AS bin,
           count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS total_tokens
    FROM cum GROUP BY lang, bin
    """,
    "deterministic sample packing for training: docs streamed per lang in "
    "doc_id order into ~2000-token bins (bin = start-offset div capacity "
    "from a running-sum window) — the distributed proxy for sequence "
    "packing; at corpus scale the partition key becomes (lang, shard) so "
    "each window is bounded, the bin arithmetic is unchanged. All-integer "
    "(floor division), bit-identical across engines",
)
def q63_token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    tk = d.select(
        "lang", "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("toks")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = tk.withColumn("cm", F.sum("toks").over(w))
    return (
        cum.select("lang", "toks", F.expr("(cm - toks) div 2000").alias("bin"))
        .groupBy("lang", "bin")
        .agg(F.count("*").alias("n_docs"), F.sum("toks").cast("bigint").alias("total_tokens"))
    )


@_q(
    "q64_pivot_report",
    """
    SELECT user_id % 5 AS bucket,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)    AS click,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)    AS error,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT)   AS signup,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)     AS "view"
    FROM events GROUP BY user_id % 5
    """,
    "pivot (long -> wide) report: event counts by type per user bucket. "
    "Spark's groupBy().pivot() with an EXPLICIT value list plans as one "
    "partial-aggregated pass — the explicit list matters at scale "
    "(without it Spark first runs a distinct scan over the pivot column)",
)
def q64_pivot_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    out = (
        ev.select((F.col("user_id") % 5).alias("bucket"), "event_type")
        .groupBy("bucket")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves null for empty cells; report zeros like the oracle
    return out.select(
        "bucket",
        *[
            F.coalesce(F.col(c), F.lit(0).cast("long")).alias(c)
            for c in ("click", "error", "purchase", "signup", "view")
        ],
    )


@_q(
    "q65_group_percentiles",
    """
    SELECT lang,
           count(*) AS n_docs,
           round(median(CAST(n_chars AS DOUBLE)), 4) AS p50,
           round(quantile_cont(CAST(n_chars AS DOUBLE), 0.9), 4) AS p90
    FROM documents GROUP BY lang
    """,
    "EXACT per-group percentiles (interpolated median / p90 of doc "
    "length per language): Spark's sort-based percentile() aggregate vs "
    "DuckDB quantile_cont — both the standard linear-interpolation "
    "definition. Exact quantiles are per-GROUP sorts (bounded by group "
    "size); the corpus-wide analogue stays with q35's mergeable sketches",
)
def q65_group_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.expr("percentile(n_chars * 1.0, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(n_chars * 1.0, 0.9)"), 4).alias("p90"),
    )


_BLOCK_HOST_SQL = """
      SELECT doc_id,
             CASE CAST(doc_id % 4 AS INT)
               WHEN 0 THEN 'ads.host-' || CAST(doc_id % 7 AS VARCHAR) || '.example'
               WHEN 1 THEN 'cdn.tracker-' || CAST(doc_id % 3 AS VARCHAR) || '.example'
               WHEN 2 THEN 'www.host-' || CAST(doc_id % 7 AS VARCHAR) || '.example'
               ELSE 'host-' || CAST(doc_id % 7 AS VARCHAR) || '.example'
             END AS host
      FROM documents
"""

_BLOCK_SUFFIXES = ("tracker-1.example", "ads.host-2.example", "host-3.example")


@_q(
    "q66_blocklist_filter",
    f"""
    WITH d AS ({_BLOCK_HOST_SQL}),
    parts AS (SELECT doc_id, host, string_split(host, '.') AS p FROM d),
    sfx AS (
      SELECT doc_id, array_to_string(list_slice(p, u.i, len(p)), '.') AS s
      FROM parts, unnest(generate_series(1, len(p))) AS u(i)
    ),
    bl(suffix) AS (VALUES {", ".join(f"('{s}')" for s in _BLOCK_SUFFIXES)}),
    blocked AS (SELECT DISTINCT doc_id FROM sfx JOIN bl ON s = suffix)
    SELECT d.doc_id, d.host,
           CASE WHEN b.doc_id IS NULL THEN 0 ELSE 1 END AS blocked
    FROM d LEFT JOIN blocked b USING (doc_id)
    """,
    "registrable-domain blocklist filtering with SUFFIX semantics "
    "(blocking 'host-3.example' blocks every subdomain): each host "
    "explodes its bounded dot-suffix chain (depth <= label count) and "
    "equi-joins the broadcast blocklist — the scale shape for domain "
    "blocking, never a LIKE/endswith scan per blocklist row (which is "
    "O(hosts x rules) with no pushdown)",
)
def q66_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    v = (F.col("doc_id") % 4).cast("int")
    d7 = (F.col("doc_id") % 7).cast("string")
    d3 = (F.col("doc_id") % 3).cast("string")
    host = (
        F.when(v == 0, F.concat(F.lit("ads.host-"), d7, F.lit(".example")))
        .when(v == 1, F.concat(F.lit("cdn.tracker-"), d3, F.lit(".example")))
        .when(v == 2, F.concat(F.lit("www.host-"), d7, F.lit(".example")))
        .otherwise(F.concat(F.lit("host-"), d7, F.lit(".example")))
    )
    from toyocr_spark.functions.urlfns import host_suffixes

    hosts = d.select("doc_id", host.alias("host"))
    sfx = hosts.select(
        "doc_id", F.explode(host_suffixes(F.col("host"))).alias("s")
    )
    bl = spark.createDataFrame([(s,) for s in _BLOCK_SUFFIXES], "suffix string")
    blocked = (
        sfx.join(F.broadcast(bl), sfx.s == bl.suffix, "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("_b", F.lit(1))
    )
    return hosts.join(blocked, "doc_id", "left").select(
        "doc_id", "host", F.coalesce("_b", F.lit(0)).alias("blocked")
    )


@_q(
    "q67_decontamination",
    """
    WITH base AS (
      SELECT doc_id AS id, string_split(text, ' ') AS w,
             len(string_split(text, ' ')) AS nw
      FROM documents WHERE length(text) > 0
    ),
    wins AS (
      SELECT id, md5(array_to_string(list_slice(w, u.p + 1, u.p + 8), ' ')) AS digest
      FROM base, unnest(generate_series(0, nw - 8)) AS u(p)
      WHERE nw >= 8
    ),
    bench AS (SELECT DISTINCT digest FROM wins WHERE id % 97 = 0),
    totals AS (SELECT id, count(*) AS n_wins FROM wins GROUP BY id),
    hits AS (SELECT w.id, count(*) AS n_hit
             FROM wins w JOIN bench USING (digest) GROUP BY w.id)
    SELECT t.id, t.n_wins,
           coalesce(h.n_hit, CAST(0 AS BIGINT)) AS n_hit,
           round(coalesce(h.n_hit, 0) * 1.0 / t.n_wins, 6) AS contamination
    FROM totals t LEFT JOIN hits h USING (id)
    """,
    "benchmark decontamination (the n-gram overlap check run before "
    "training): 8-word window hashes per doc, overlap fraction against "
    "the benchmark set's distinct n-grams (proxy benchmark: doc_id % 97 "
    "= 0). The benchmark gram set is small and broadcast-able; the "
    "corpus side is one linear window explode + equi-join on digest — "
    "never a doc x benchmark cross join",
)
def q67_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.operators.dedup import contamination_scores

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    return contamination_scores(d, bench, "doc_id", "text", k_words=8)


@_q(
    "q68_session_window",
    """
    WITH l AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts
      FROM events
    ),
    f AS (
      SELECT user_id, ts,
             CASE WHEN pts IS NULL OR ts - pts >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM l
    ),
    s AS (
      SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM f
    )
    SELECT min(ts) AS win_start, user_id, count(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
    "Spark's NATIVE session_window aggregate (merge-on-gap<30min), "
    "cross-checked against the classic lag + gap-cumsum formulation — "
    "the built-in plans one aggregate with session merging instead of "
    "two windows + a groupBy, and it is the exact operator the "
    "streaming twin uses for stateful sessionization (q04 keeps the "
    "hand-rolled islands variant for the general gap-and-island shape)",
)
def q68_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("sw.start").alias("win_start"), "user_id", "n_events")
    )


@_q(
    "q69_change_rate",
    """
    WITH l AS (
      SELECT user_id, value,
             lag(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS pval
      FROM events
    )
    SELECT user_id,
           count(*) AS n_fetches,
           CAST(sum(CASE WHEN pval IS NOT NULL AND value <> pval
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
           round(sum(CASE WHEN pval IS NOT NULL AND value <> pval
                          THEN 1 ELSE 0 END) * 1.0
                 / greatest(count(*) - 1, 1), 6) AS change_rate
    FROM l GROUP BY user_id
    """,
    "recrawl change-rate analytics (the signal a crawl scheduler feeds "
    "back into per-host refresh cadence): lag over a TOTAL order (ts, "
    "event_id) compares each fetch to its predecessor; per-key windows "
    "are bounded by per-host fetch history, aggregation is partial — "
    "the lag/lead window family's coverage entry",
)
def q69_change_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    l = ev.withColumn("pval", F.lag("value").over(w))
    changed = F.when(
        F.col("pval").isNotNull() & (F.col("value") != F.col("pval")), 1
    ).otherwise(0)
    return l.groupBy("user_id").agg(
        F.count("*").alias("n_fetches"),
        F.sum(changed).cast("bigint").alias("n_changed"),
        F.round(
            F.sum(changed) * F.lit(1.0) / F.greatest(F.count("*") - 1, F.lit(1)), 6
        ).alias("change_rate"),
    )


_FH_DIM = 16


def _hex4_col(col: str) -> str:
    return " + ".join(
        f"(strpos('0123456789abcdef', substr({col}, {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    )


@_q(
    "q70_feature_hashing",
    f"""
    WITH t AS ({_TOKENS_SQL}),
    hashed AS (
      SELECT id,
             ({_hex4_col("hh")}) % {_FH_DIM} AS dim,
             CASE WHEN ({_hex4_col("hs")}) % 2 = 0 THEN 1 ELSE -1 END AS sgn
      FROM (SELECT id, substr(md5(word), 1, 4) AS hh,
                   substr(md5('s|' || word), 1, 4) AS hs
            FROM t)
    )
    SELECT id, dim, CAST(sum(sgn) AS BIGINT) AS weight
    FROM hashed GROUP BY id, dim
    """,
    "feature-hashing text vectorizer (the hashing trick: term -> "
    f"md5-bucketed dimension with a +-1 sign hash): sparse {_FH_DIM}-dim "
    "doc vectors as (id, dim, weight) rows from ONE partial-agg shuffle "
    "— the from-text on-ramp to the embedding/ANN family, no vocabulary "
    "build, no Python, identical on any engine and any worker",
)
def q70_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.operators.textindex import doc_terms

    t = doc_terms(_t(spark, sf_dir, "documents"), "doc_id", "text")
    dim = (
        F.conv(F.substring(F.md5(F.col("word")), 1, 4), 16, 10).cast("long") % _FH_DIM
    )
    sgn = F.when(
        F.conv(F.substring(F.md5(F.concat(F.lit("s|"), F.col("word"))), 1, 4), 16, 10)
        .cast("long")
        % 2
        == 0,
        1,
    ).otherwise(-1)
    return (
        t.select("id", dim.alias("dim"), sgn.alias("sgn"))
        .groupBy("id", "dim")
        .agg(F.sum("sgn").cast("bigint").alias("weight"))
    )


@_q(
    "q71_host_profile",
    """
    WITH d AS (
      SELECT 'host-' || CAST(doc_id % 7 AS VARCHAR) || '.example' AS host,
             lang, CASE WHEN n_chars >= 150 THEN 1 ELSE 0 END AS keep
      FROM documents
    ),
    per_host AS (
      SELECT host, count(*) AS n_docs,
             CAST(sum(keep) AS BIGINT) AS n_keep,
             round(sum(keep) * 1.0 / count(*), 6) AS keep_rate
      FROM d GROUP BY host
    ),
    lang_counts AS (
      SELECT host, lang, count(*) AS n
      FROM d GROUP BY host, lang
    ),
    top_lang AS (
      SELECT host, lang AS top_lang FROM (
        SELECT host, lang,
               row_number() OVER (PARTITION BY host
                                  ORDER BY n DESC, lang ASC) AS rk
        FROM lang_counts
      ) WHERE rk = 1
    )
    SELECT p.host, p.n_docs, p.n_keep, p.keep_rate, t.top_lang
    FROM per_host p JOIN top_lang t USING (host)
    """,
    "per-host curation profile (the table a crawl curator turns into "
    "host allow/deny lists — RefinedWeb-style domain filtering): doc "
    "count, quality keep-rate, dominant language per host. Two partial-"
    "agg shuffles keyed on host/(host, lang) — host cardinality is "
    "~10^8 at crawl scale, each with O(1) aggregate state; the argmax "
    "window partitions on host and is bounded by languages-per-host",
)
def q71_host_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("host-"), (F.col("doc_id") % 7).cast("string"), F.lit(".example")
        ).alias("host"),
        "lang",
        F.when(F.col("n_chars") >= 150, 1).otherwise(0).alias("keep"),
    )
    per_host = d.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.sum("keep").cast("bigint").alias("n_keep"),
        F.round(F.sum("keep") * F.lit(1.0) / F.count("*"), 6).alias("keep_rate"),
    )
    lang_counts = d.groupBy("host", "lang").agg(F.count("*").alias("n"))
    w = Window.partitionBy("host").orderBy(F.col("n").desc(), F.col("lang").asc())
    top_lang = (
        lang_counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("host", F.col("lang").alias("top_lang"))
    )
    return per_host.join(top_lang, "host")


@_q(
    "q72_set_ops",
    """
    WITH a AS (SELECT doc_id FROM documents WHERE n_chars >= 150),
    b AS (SELECT doc_id FROM documents WHERE lang = 'en')
    SELECT 'intersect' AS op, count(*) AS n
    FROM (SELECT doc_id FROM a INTERSECT SELECT doc_id FROM b)
    UNION ALL
    SELECT 'except_all', count(*)
    FROM (SELECT doc_id FROM a EXCEPT ALL SELECT doc_id FROM b)
    UNION ALL
    SELECT 'union_distinct', count(*)
    FROM (SELECT doc_id FROM a UNION SELECT doc_id FROM b)
    """,
    "set-operator family (INTERSECT / EXCEPT ALL / UNION DISTINCT) over "
    "two corpus slices — snapshot-membership algebra (what changed "
    "between two curation policies). Spark plans these as hash "
    "aggregates / left-anti joins on the id key — partial-aggregated, "
    "skew-safe, one shuffle each",
)
def q72_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    a = d.filter(F.col("n_chars") >= 150).select("doc_id")
    b = d.filter(F.col("lang") == "en").select("doc_id")
    rows = [
        a.intersect(b).agg(F.lit("intersect").alias("op"), F.count("*").alias("n")),
        a.exceptAll(b).agg(F.lit("except_all").alias("op"), F.count("*").alias("n")),
        a.union(b).distinct().agg(
            F.lit("union_distinct").alias("op"), F.count("*").alias("n")
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# ---------------------------------------------------------------------------
# the flagship: extraction itself, oracle-checked


@_q(
    "q25_extract",
    """
    SELECT 'https://doc-' || CAST(doc_id AS VARCHAR) || '.example/p' AS url,
           text AS extracted_text,
           1 AS n_kept
    FROM documents
    """,
    "flagship extraction over synthesized pages; oracle = identity on the "
    "known template (nav stripped, article kept verbatim)",
)
def q25_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.pipeline import extract_pages

    d = _t(spark, sf_dir, "documents")
    nav = (
        '<nav><ul><li><a href="/a">one link</a></li>'
        '<li><a href="/b">two link</a></li></ul></nav>'
    )
    pages = d.select(
        F.concat(F.lit("https://doc-"), F.col("doc_id").cast("string"), F.lit(".example/p")).alias("url"),
        F.encode(
            F.concat(
                F.lit(f"<html><body>{nav}<article><p>"),
                F.col("text"),
                F.lit("</p></article></body></html>"),
            ),
            "UTF-8",
        ).alias("html"),
    )
    out = extract_pages(pages)
    return out.select("url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept"))


# ---------------------------------------------------------------------------
# DSIR-style importance-weighted data selection (round-3: composes q55's
# unigram LM with q57's integer priority sampler into the standard
# modern curation operator)


_HEX10_H = " + ".join(
    f"(strpos('0123456789abcdef', substr(hh, {i + 1}, 1)) - 1) * {16 ** (9 - i)}"
    for i in range(10)
)


@_q(
    "q73_dsir_sample",
    f"""
    WITH t AS ({_TOKENS_SQL}),
    raw AS (SELECT word, count(*) AS rc FROM t GROUP BY word),
    tgt AS (SELECT word, count(*) AS tc FROM t WHERE id % 13 = 0 GROUP BY word),
    model AS (
      SELECT raw.word, rc, coalesce(tc, CAST(0 AS BIGINT)) AS tc
      FROM raw LEFT JOIN tgt USING (word)
    ),
    totals AS (SELECT CAST(sum(rc) AS BIGINT) AS raw_tot,
                      CAST(sum(tc) AS BIGINT) AS tgt_tot,
                      count(*) AS vs
               FROM model),
    scores AS (
      SELECT id, count(*) AS doc_tokens,
             round(avg(ln(((tc + 1.0) / (tgt_tot + vs))
                          / ((rc + 1.0) / (raw_tot + vs)))), 6) AS logratio_avg
      FROM t JOIN model USING (word) CROSS JOIN totals
      GROUP BY id
    ),
    hx AS (
      SELECT id, doc_tokens, logratio_avg,
             substr(md5('dsir|' || CAST(id AS VARCHAR)), 1, 10) AS hh
      FROM scores
    ),
    pr AS (
      SELECT id, doc_tokens, logratio_avg,
             ((CAST(round(logratio_avg * 1000000, 0) AS BIGINT) + 30000000)
              * 17179869184) // (({_HEX10_H}) + 1) AS priority
      FROM hx
    ),
    r AS (SELECT id, doc_tokens, logratio_avg, priority,
                 row_number() OVER (ORDER BY priority DESC, id ASC) AS rk
          FROM pr)
    SELECT rk, id, doc_tokens, logratio_avg, priority FROM r WHERE rk <= 50
    """,
    "DSIR importance resampling (Xie et al. 2023): per-doc mean token "
    "log-likelihood ratio between a target-domain unigram LM (proxy "
    "target: doc_id % 13 = 0) and the raw-corpus LM, add-one smoothed "
    "over the raw vocabulary, then integer weight-proportional priority "
    "sampling (q57's DLT sampler) of the top 50. One model shuffle "
    "(target counts join the raw model at vocab size, the token stream "
    "is joined once); top-k is TakeOrderedAndProject; the selected SET "
    "is bit-identical across engines",
)
def q73_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.operators.dsir import dsir_sample

    d = _t(spark, sf_dir, "documents")
    return dsir_sample(d, "doc_id", "text", F.col("doc_id") % 13 == 0, k=50)


# ---------------------------------------------------------------------------
# IVF ANN: recall/cost trade curve + the persisted-index search path
# (round-3: VERDICT items 6 and 7)


@_q(
    "q74_ivf_recall_curve",
    f"""
    WITH vd AS (
      SELECT vec_id, i AS dim,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS val
      FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)
    ),
    c0 AS (
      SELECT vec_id AS cid, dim, val AS cval FROM vd
      WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)
    ),
    {_kmeans_round_sql(1)},
    {_kmeans_round_sql(2)},
    d3 AS (
      SELECT vd.vec_id, c.cid,
             sum((vd.val - c.cval) * (vd.val - c.cval)) AS dist
      FROM vd JOIN c2 c ON vd.dim = c.dim
      GROUP BY vd.vec_id, c.cid
    ),
    a3 AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rk
        FROM d3)
      WHERE rk = 1
    ),
    e AS (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
    bdots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS item_id, sum(q.v * c.v) AS dp
      FROM e q JOIN e c ON q.i = c.i
      WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id
      GROUP BY q.vec_id, c.vec_id
    ),
    bscored AS (
      SELECT query_id, item_id, dp / (a.nrm * b2.nrm) AS cos
      FROM bdots JOIN nrm a ON query_id = a.vec_id JOIN nrm b2 ON item_id = b2.vec_id
    ),
    exact AS (
      SELECT query_id, item_id FROM (
        SELECT query_id, item_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, item_id) AS rk
        FROM bscored)
      WHERE rk <= 5
    ),
    probes AS (
      SELECT vec_id AS query_id, cid, prb FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS prb
        FROM d3 WHERE vec_id < 8)
      WHERE prb <= 8
    ),
    cscored AS (
      SELECT p.query_id, a.vec_id AS item_id, p.prb, s.cos
      FROM probes p
      JOIN a3 a ON p.cid = a.cid AND a.vec_id <> p.query_id
      JOIN bscored s ON p.query_id = s.query_id AND a.vec_id = s.item_id
    ),
    nps AS (SELECT CAST(unnest([1, 2, 4, 8]) AS INTEGER) AS np),
    touched AS (
      SELECT n.np, count(cs.query_id) AS candidates_touched
      FROM nps n LEFT JOIN cscored cs ON cs.prb <= n.np
      GROUP BY n.np
    ),
    top5 AS (
      SELECT np, query_id, item_id FROM (
        SELECT n.np, cs.query_id, cs.item_id,
               row_number() OVER (PARTITION BY n.np, cs.query_id
                                  ORDER BY cs.cos DESC, cs.item_id) AS rk
        FROM nps n JOIN cscored cs ON cs.prb <= n.np)
      WHERE rk <= 5
    ),
    hit AS (
      SELECT t.np, count(*) AS hits
      FROM top5 t JOIN exact x
        ON t.query_id = x.query_id AND t.item_id = x.item_id
      GROUP BY t.np
    ),
    nx AS (SELECT count(*) AS n_exact FROM exact)
    SELECT t.np AS nprobe,
           CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
           CAST(nx.n_exact AS BIGINT) AS n_exact,
           CAST(t.candidates_touched AS BIGINT) AS candidates_touched
    FROM touched t LEFT JOIN hit h ON t.np = h.np CROSS JOIN nx
    """,
    "multi-probe IVF recall/cost curve: for nprobe in {1,2,4,8}, "
    "top-5 hits vs the exact brute-force baseline (q17's operator) "
    "plus candidates_touched — the tuning table an operator reads to "
    "pick nprobe. Reads the PERSISTED index (q75's ensure_ivf_index — "
    "train once, probe four times; re-running the curve never "
    "retrains); recall is provably monotone in nprobe (asserted in "
    "tests). Every column is an exact integer (the trainer is "
    "bit-deterministic), so the DuckDB oracle retrains from scratch "
    "— q53's k-means CTEs + q17's exact-cosine baseline — and must "
    "match hash-for-hash: recall itself is the driver check, not a "
    "rows-only count",
)
def q74_ivf_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.operators.selection import topk_per_group
    from toyocr_spark.operators.similarity import _as_double, cosine

    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 8)
    k = 5
    max_probe = 8
    exact = brute_force_cosine_topk(emb, qs, k=k).select("query_id", "item_id")
    n_exact = exact.count()  # COUNT-driven: the recall denominator
    centroids, lists = _ivf_tables(spark, sf_dir)
    # score the max_probe candidate superset ONCE, carrying each
    # candidate's probe rank; every curve point is then a filter +
    # window over this small materialized table — the smaller-nprobe
    # candidate sets are strict prefixes of the larger, so nothing is
    # re-scored per point
    from toyocr_spark.operators.kmeans import _scaled

    qv = qs.select(
        F.col("vec_id").alias("query_id"),
        _scaled("embedding").alias("qsv"),
        _as_double(F.col("embedding")).alias("qv"),
    )
    qdist = F.aggregate(
        F.zip_with(F.col("qsv"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    probes = topk_per_group(
        qv.crossJoin(F.broadcast(centroids)).select("query_id", "cid", qdist.alias("qd")),
        ["query_id"],
        [F.col("qd").asc(), F.col("cid").asc()],
        max_probe,
        rank_name="prb",
    ).select("query_id", "cid", "prb")
    from toyocr_spark.operators.similarity import cosine_pre, l2norm

    scored = (
        F.broadcast(probes)
        .join(lists.withColumn("ni", l2norm(F.col("iv"))), "cid")
        .filter(F.col("item_id") != F.col("query_id"))
        .join(
            F.broadcast(
                qv.select("query_id", "qv").withColumn("nq", l2norm(F.col("qv")))
            ),
            "query_id",
        )
        .select(
            "query_id",
            "item_id",
            "prb",
            cosine_pre(F.col("qv"), F.col("iv"), F.col("nq"), F.col("ni")).alias("cos"),
        )
        .localCheckpoint(eager=False)
    )
    out = None
    for nprobe in (1, 2, 4, max_probe):
        sub = scored.filter(F.col("prb") <= nprobe)
        topk = topk_per_group(
            sub, ["query_id"], [F.col("cos").desc(), F.col("item_id").asc()], k, rank_name="rk"
        )
        hits = topk.join(exact, ["query_id", "item_id"], "left_semi")
        row = sub.agg(F.count("*").alias("candidates_touched")).crossJoin(
            hits.agg(F.count("*").alias("_h"))
        ).select(
            F.lit(nprobe).cast("int").alias("nprobe"),
            F.col("_h").cast("long").alias("hits"),
            F.lit(n_exact).cast("long").alias("n_exact"),
            F.col("candidates_touched").cast("long"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def _ivf_table_prefix(sf_dir: str) -> str:
    tag = sf_dir.rstrip("/").split("/")[-1].replace(".", "_").replace("-", "_")
    return f"toyocr_ivf_v1_{tag}"


def ensure_ivf_index(spark: SparkSession, sf_dir: str) -> str | None:
    """Train-once gate for the persisted IVF index: if the catalog
    tables for this sf are absent, train and write them (deterministic
    k-means -> identical bytes whenever rebuilt). Returns the prefix,
    or None when the warehouse is not writable in this harness (the
    caller falls back to an in-session index with identical bytes).

    The default in-memory catalog forgets tables across sessions while
    their warehouse directories survive, and ``saveAsTable`` refuses a
    managed-table location that already exists — so a location the
    CURRENT catalog does not know is stale state from a previous
    session and is removed before the (bit-identical) retrain. A
    Hive/Iceberg catalog would make the registration itself durable
    and this gate a pure tableExists check."""
    import shutil
    from urllib.parse import urlparse

    from toyocr_spark.operators.kmeans import ivf_write_index

    prefix = _ivf_table_prefix(sf_dir)
    if not spark.catalog.tableExists(f"{prefix}_lists"):
        try:
            wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
            for t in (f"{prefix}_lists", f"{prefix}_centroids"):
                if not spark.catalog.tableExists(t):
                    shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
            ivf_write_index(
                spark, _t(spark, sf_dir, "embeddings"), prefix, n_centroids=8, iters=3
            )
        except Exception:
            # warehouse not writable in this harness (unknown driver
            # cwd): fall back to an in-session index — the trainer is
            # bit-deterministic, so results are identical either way
            return None
    return prefix


def _ivf_tables(spark: SparkSession, sf_dir: str):
    """(centroids, lists) from the persisted index when available,
    else trained in-session and localCheckpoint-materialized (same
    bytes — deterministic trainer; only the storage differs)."""
    from toyocr_spark.operators.kmeans import ivf_lists, kmeans_index

    prefix = ensure_ivf_index(spark, sf_dir)
    if prefix is not None:
        return spark.table(f"{prefix}_centroids"), spark.table(f"{prefix}_lists")
    emb = _t(spark, sf_dir, "embeddings")
    centroids, assigned, _ = kmeans_index(emb, "vec_id", "embedding", 8, 3)
    return centroids.localCheckpoint(), ivf_lists(emb, assigned).localCheckpoint(eager=False)


@_q(
    "q75_ivf_persisted_search",
    f"""
    WITH vd AS (
      SELECT vec_id, i AS dim,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS val
      FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)
    ),
    c0 AS (
      SELECT vec_id AS cid, dim, val AS cval FROM vd
      WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)
    ),
    {_kmeans_round_sql(1)},
    {_kmeans_round_sql(2)},
    d3 AS (
      SELECT vd.vec_id, c.cid,
             sum((vd.val - c.cval) * (vd.val - c.cval)) AS dist
      FROM vd JOIN c2 c ON vd.dim = c.dim
      GROUP BY vd.vec_id, c.cid
    ),
    a3 AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rk
        FROM d3)
      WHERE rk = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS prb
        FROM d3 WHERE vec_id >= 8 AND vec_id < 16)
      WHERE prb <= 2
    ),
    cand AS (
      SELECT p.query_id, a.vec_id AS item_id
      FROM probes p JOIN a3 a ON p.cid = a.cid
      WHERE a.vec_id <> p.query_id
    ),
    e AS (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
    dots AS (
      SELECT cand.query_id, cand.item_id, sum(q.v * c.v) AS dp
      FROM cand
      JOIN e q ON cand.query_id = q.vec_id
      JOIN e c ON cand.item_id = c.vec_id AND q.i = c.i
      GROUP BY cand.query_id, cand.item_id
    ),
    scored AS (
      SELECT query_id, item_id, dp / (a.nrm * b2.nrm) AS cos
      FROM dots JOIN nrm a ON query_id = a.vec_id JOIN nrm b2 ON item_id = b2.vec_id
    )
    SELECT query_id, item_id, round(cos, 6) AS cos, rk FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, item_id) AS rk
      FROM scored
    ) WHERE rk <= 5
    """,
    "IVF search against the PERSISTED index — the 100 TB usage pattern "
    "(train once, every search reads the index): centroids from the "
    "tiny catalog table, candidates from the cid-BUCKETED lists table "
    "(no k-means stages in the search plan, zero Exchange on cid — "
    "plan-contract-locked). Because the trainer is bit-deterministic, "
    "the persisted index equals the inline-trained one, so the DuckDB "
    "oracle retrains from scratch and must match exactly; query set "
    "vec_id in [8, 16) to complement q54's [0, 8)",
)
def q75_ivf_persisted_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.operators.kmeans import ivf_probes, ivf_rerank

    centroids, lists = _ivf_tables(spark, sf_dir)
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 16))
    probes = ivf_probes(qs, centroids, nprobe=2)
    return ivf_rerank(probes, lists, qs, k=5)


@_q(
    "q76_jpeg_pixels",
    """
    SELECT doc_id AS media_id,
           CAST(8 + doc_id % 17 AS INTEGER) AS width,
           CAST(8 + doc_id % 13 AS INTEGER) AS height,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS INTEGER) AS channels,
           CAST((8 + doc_id % 17) * (8 + doc_id % 13)
                * (CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END) AS BIGINT) AS body_len
    FROM documents WHERE doc_id % 10 = 0
    """,
    "JPEG pixel-decode round trip, driver-checked: deterministic rasters "
    "rendered per doc_id, encoded by doc_id/10 mod 3 as PROGRESSIVE "
    "(SOF2, spectral-split AC scans), baseline-sequential (SOF0), or "
    "LOSSLESS (SOF3, Annex H predictive — selector rotates 1-7) — all "
    "three pushed through decode_media's REAL decoder; the oracle "
    "predicts the decoded dimensions and raster size in closed form, "
    "so a green row proves every coding mode decodes to true pixels "
    "(w*h*c), not the entropy-coded scan. Pixel-value fidelity, "
    "seq==prog raster identity, and lossless BYTE-IDENTITY are "
    "unit-tested (test_multimodal)",
)
def q76_jpeg_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from toyocr_spark.multimodal import decode_media

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0).select("doc_id")

    def encode_batches(it):
        import pyarrow as pa

        from toyocr_spark.jpegcodec import (
            encode_baseline,
            encode_lossless,
            encode_progressive,
        )

        for b in it:
            ids = b.column(0).to_pylist()
            payloads = []
            for i in ids:
                w = 8 + i % 17
                h = 8 + i % 13
                c = 3 if i % 2 == 0 else 1
                raster = bytes(
                    (10 + x * 2 + y * 3 + ch * 5 + i) % 236
                    for y in range(h)
                    for x in range(w)
                    for ch in range(c)
                )
                mode = (i // 10) % 3
                if mode == 0:
                    payloads.append(
                        encode_progressive(
                            raster, w, h, c, quality=90, spectral_split=int(i % 30)
                        )
                    )
                elif mode == 1:
                    payloads.append(encode_baseline(raster, w, h, c, quality=90))
                else:
                    payloads.append(
                        encode_lossless(raster, w, h, c, predictor=1 + (i // 10) % 7)
                    )
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(payloads, pa.binary())],
                names=["media_id", "payload"],
            )

    media_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )
    media = d.mapInArrow(encode_batches, media_schema)
    out = decode_media(media)
    return out.select("media_id", "width", "height", "channels", "body_len")


@_q(
    "q77_semdedup",
    f"""
    WITH vd AS (
      SELECT vec_id, i AS dim,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS val
      FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)
    ),
    c0 AS (
      SELECT vec_id AS cid, dim, val AS cval FROM vd
      WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)
    ),
    {_kmeans_round_sql(1)},
    {_kmeans_round_sql(2)},
    d3 AS (
      SELECT vd.vec_id, c.cid,
             sum((vd.val - c.cval) * (vd.val - c.cval)) AS dist
      FROM vd JOIN c2 c ON vd.dim = c.dim
      GROUP BY vd.vec_id, c.cid
    ),
    a3 AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rk
        FROM d3)
      WHERE rk = 1
    ),
    e AS (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
    dots AS (
      SELECT x.vec_id AS id_a, y.vec_id AS id_b, sum(x.v * y.v) AS dp
      FROM e x JOIN e y ON x.i = y.i
      JOIN a3 xa ON x.vec_id = xa.vec_id JOIN a3 ya ON y.vec_id = ya.vec_id
      WHERE x.vec_id < y.vec_id AND xa.cid = ya.cid
      GROUP BY x.vec_id, y.vec_id
    ),
    dropped AS (
      SELECT DISTINCT d.id_b AS vec_id
      FROM dots d JOIN nrm a ON d.id_a = a.vec_id JOIN nrm b2 ON d.id_b = b2.vec_id
      WHERE d.dp / (a.nrm * b2.nrm) >= 0.40
    )
    SELECT a3.vec_id, a3.cid,
           CAST(CASE WHEN dr.vec_id IS NULL THEN 1 ELSE 0 END AS INTEGER) AS kept
    FROM a3 LEFT JOIN dropped dr ON a3.vec_id = dr.vec_id
    """,
    "SemDeDup (Abbas et al. 2023): semantic dedup with the quadratic "
    "bounded by clustering — k-means cells (q53's bit-exact trainer) "
    "partition the corpus, cosine pairs are computed only WITHIN a cell, "
    "and a vector is dropped when a lower-id cell-mate sits above the "
    "similarity threshold. The 100 TB shape: cluster count scales with "
    "corpus size so cells stay bounded, making within-cell pairing "
    "linear-ish in practice — never an all-pairs join",
)
def q77_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.operators.dedup import semantic_dedup

    return semantic_dedup(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding", threshold=0.40
    )


@_q(
    "q78_cluster_balanced_sample",
    f"""
    WITH vd AS (
      SELECT vec_id, i AS dim,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS val
      FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)
    ),
    c0 AS (
      SELECT vec_id AS cid, dim, val AS cval FROM vd
      WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)
    ),
    {_kmeans_round_sql(1)},
    {_kmeans_round_sql(2)},
    d3 AS (
      SELECT vd.vec_id, c.cid,
             sum((vd.val - c.cval) * (vd.val - c.cval)) AS dist
      FROM vd JOIN c2 c ON vd.dim = c.dim
      GROUP BY vd.vec_id, c.cid
    ),
    a3 AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rk
        FROM d3)
      WHERE rk = 1
    ),
    sizes AS (SELECT cid, count(*) AS n_cell FROM a3 GROUP BY cid),
    ranked AS (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY cid
                                ORDER BY md5('bal|' || CAST(vec_id AS VARCHAR)) ASC,
                                         vec_id ASC) AS rk
      FROM a3
    )
    SELECT r.cid, r.rk, r.vec_id, CAST(s.n_cell AS BIGINT) AS n_cell
    FROM ranked r JOIN sizes s USING (cid)
    WHERE r.rk <= 20
    """,
    "cluster-balanced subsampling (the topic-diversification step of "
    "modern curation, SemDeDup/DoReMi-adjacent): k-means cells over the "
    "embedding space, then exactly min(B=20, |cell|) survivors per cell "
    "chosen by deterministic md5 order — over-represented topics are "
    "capped, rare topics survive whole. Per-cell top-B is a window "
    "bounded by cell size; at 100 TB cluster count scales with the "
    "corpus so cells stay bounded (the q77 argument); md5 ordering "
    "makes any engine anywhere pick the identical sample",
)
def q78_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.operators.kmeans import kmeans_fit
    from toyocr_spark.operators.selection import topk_per_group

    emb = _t(spark, sf_dir, "embeddings")
    assigned = kmeans_fit(emb, "vec_id", "embedding", k=8, iters=3).select(
        F.col("id").alias("vec_id"), "cid"
    ).localCheckpoint(eager=False)  # sizes + ranked both read it; train once
    sizes = assigned.groupBy("cid").agg(F.count("*").cast("long").alias("n_cell"))
    keyed = assigned.withColumn(
        "_h", F.md5(F.concat(F.lit("bal|"), F.col("vec_id").cast("string")))
    )
    top = topk_per_group(
        keyed, ["cid"], [F.col("_h").asc(), F.col("vec_id").asc()], 20, rank_name="rk"
    )
    return top.join(sizes, "cid").select("cid", "rk", "vec_id", "n_cell")


@_q(
    "q79_host_boilerplate",
    """
    WITH hosts AS (
      SELECT doc_id, doc_id % 40 AS host,
             'banner host ' || CAST(doc_id % 40 AS VARCHAR)
               || ' please accept cookies and terms ' || text AS text
      FROM documents WHERE length(text) > 0
    ),
    wins AS (
      SELECT DISTINCT doc_id, host,
             md5(array_to_string(list_slice(w, u.p + 1, u.p + 6), ' ')) AS digest
      FROM (SELECT doc_id, host, string_split(text, ' ') AS w,
                   len(string_split(text, ' ')) AS nw
            FROM hosts),
           unnest(generate_series(0, nw - 6)) AS u(p)
      WHERE nw >= 6
    ),
    hd AS (SELECT host, count(DISTINCT doc_id) AS host_docs FROM hosts GROUP BY host),
    df AS (SELECT host, digest, count(*) AS n_docs FROM wins GROUP BY host, digest)
    SELECT df.host, df.digest,
           CAST(df.n_docs AS BIGINT) AS n_docs,
           CAST(hd.host_docs AS BIGINT) AS host_docs,
           round(df.n_docs * 1.0 / hd.host_docs, 6) AS frac
    FROM df JOIN hd USING (host)
    WHERE hd.host_docs >= 5 AND df.n_docs * 2 >= hd.host_docs
    """,
    "per-host boilerplate n-gram detection (the CCNet/RefinedWeb "
    "template-removal signal): a 6-word window whose digest appears in "
    ">= half of a host's documents is site furniture (nav text, cookie "
    "banners, footers), not content. Shapes: linear window explode + "
    "DISTINCT per (doc, digest), one partial-agg shuffle on (host, "
    "digest), host sizes joined at host granularity (broadcast-able) — "
    "the output feeds an anti-join that strips those windows corpus-"
    "wide, and integer cross-multiplication (n*2 >= docs) keeps the "
    "threshold float-free",
)
def q79_host_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.operators.dedup import ngram_digests

    d = _t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    # synthetic corpus has no organic site furniture: prepend a
    # deterministic per-host banner so the detector has real positives
    # (the operator itself is agnostic to where repeats come from)
    host = (F.col("doc_id") % 40).alias("host")
    aug = F.concat(
        F.lit("banner host "),
        (F.col("doc_id") % 40).cast("string"),
        F.lit(" please accept cookies and terms "),
        F.col("text"),
    )
    hosts = d.select("doc_id", host, aug.alias("text"))
    wins = (
        ngram_digests(hosts, "doc_id", "text", k_words=6)
        .join(hosts.select(F.col("doc_id").alias("id"), "host"), "id")
        .select("id", "host", "digest")
        .distinct()
    )
    hd = hosts.groupBy("host").agg(F.countDistinct("doc_id").alias("host_docs"))
    df_ = wins.groupBy("host", "digest").agg(F.count("*").alias("n_docs"))
    return (
        # no broadcast hint: hd scales with host cardinality (AQE
        # still broadcasts it when the crawl's host table is small)
        df_.join(hd, "host")
        .filter((F.col("host_docs") >= 5) & (F.col("n_docs") * 2 >= F.col("host_docs")))
        .select(
            "host",
            "digest",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("host_docs").cast("long").alias("host_docs"),
            F.round(F.col("n_docs") / F.col("host_docs"), 6).alias("frac"),
        )
    )


@_q(
    "q80_quality_survival",
    """
    WITH scored AS (
      SELECT doc_id, CAST(floor(n_chars / 50) * 50 AS BIGINT) AS bin,
             len(string_split(text, ' ')) AS toks
      FROM documents
    ),
    bins AS (
      SELECT bin, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS n_tokens
      FROM scored GROUP BY bin
    )
    SELECT bin, n_docs, n_tokens,
           CAST(sum(n_docs) OVER (ORDER BY bin DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS docs_surviving,
           CAST(sum(n_tokens) OVER (ORDER BY bin DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS tokens_surviving
    FROM bins
    """,
    "quality-threshold survival table (the curation tool that picks a "
    "filter cutoff to hit a token budget): docs bucketed by score bin "
    "(length proxy at 50-char resolution), then docs/tokens surviving "
    "each 'keep >= bin' threshold via a cumulative window from the top. "
    "One partial-agg shuffle to bins (bounded cardinality), then a "
    "window over the TINY bin table — never over the corpus; windowed "
    "sums CAST to BIGINT (the HUGEINT discipline)",
)
def q80_quality_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        (F.floor(F.col("n_chars") / 50) * 50).cast("long").alias("bin"),
        F.size(F.split("text", " ")).alias("toks"),
    )
    bins = scored.groupBy("bin").agg(
        F.count("*").alias("n_docs"), F.sum("toks").cast("long").alias("n_tokens")
    )
    w = Window.orderBy(F.col("bin").desc()).rowsBetween(Window.unboundedPreceding, 0)
    return bins.select(
        "bin",
        "n_docs",
        "n_tokens",
        F.sum("n_docs").over(w).cast("long").alias("docs_surviving"),
        F.sum("n_tokens").over(w).cast("long").alias("tokens_surviving"),
    )


@_q(
    "q81_mp4_demux",
    """
    SELECT d.doc_id AS media_id,
           'rawv' AS codec,
           CAST(t.i AS INTEGER) AS sample_idx,
           CAST(length(repeat(concat(CAST(d.doc_id AS VARCHAR), ':',
                                     CAST(t.i AS VARCHAR), ';'),
                              3 + (d.doc_id + t.i) % 5)) AS BIGINT) AS sample_len,
           md5(repeat(concat(CAST(d.doc_id AS VARCHAR), ':',
                             CAST(t.i AS VARCHAR), ';'),
                      3 + (d.doc_id + t.i) % 5)) AS sample_md5
    FROM documents d
    CROSS JOIN (VALUES (0), (1), (2), (3), (4)) t(i)
    WHERE d.doc_id < 200 AND t.i < 1 + d.doc_id % 5
    """,
    "MP4 demux, driver-checked end-to-end: synth_mp4 muxes real "
    "single-track MP4s (full stsd/stts/stsc/stsz/stco sample tables, "
    "samples packed two per chunk), demux_samples re-derives every "
    "sample's absolute byte range from the table and hashes the bytes "
    "it slices; the oracle predicts each sample's length and md5 in "
    "closed form from doc_id, so a green row proves the offset "
    "arithmetic (ISO/IEC 14496-12 §8.5-8.7) against ground truth. "
    "Only CODEC decode of sample payloads remains library-bound. "
    "Reference analogue: byte->array decode at the head of the "
    "per-record map (data/dataset_mapper.py:151-155)",
)
def q81_mp4_demux(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.multimodal import demux_samples, synth_mp4

    media = synth_mp4(_t(spark, sf_dir, "documents"), n_docs=200)
    return demux_samples(media)


@_q(
    "q82_gopher_rules",
    """
    WITH w AS (
      SELECT doc_id AS id, string_split(trim(text), ' ') AS ws FROM documents
    ),
    uni AS (SELECT id, u.wd AS wd, count(*) AS c
            FROM w, unnest(ws) AS u(wd) GROUP BY id, u.wd),
    agg AS (SELECT id,
                   CAST(sum(c) AS BIGINT) AS n_words,
                   max(c) AS top_w,
                   CAST(sum(CASE WHEN wd IN ('the','a','and','of','to','in')
                            THEN c ELSE 0 END) AS BIGINT) AS stop_count,
                   sum(c * length(wd)) AS chars
            FROM uni GROUP BY id)
    SELECT id, n_words,
           round(chars * 1.0 / n_words, 4) AS mean_word_len,
           round(top_w * 1.0 / n_words, 6) AS top_word_frac,
           stop_count,
           CAST(CASE WHEN n_words >= 20 AND n_words <= 10000
                THEN 1 ELSE 0 END AS INTEGER) AS r_wordcount,
           CAST(CASE WHEN chars * 1.0 / n_words >= 3.0
                      AND chars * 1.0 / n_words <= 5.0
                THEN 1 ELSE 0 END AS INTEGER) AS r_meanlen,
           CAST(CASE WHEN top_w * 1.0 / n_words <= 0.12
                THEN 1 ELSE 0 END AS INTEGER) AS r_repetition,
           CAST(CASE WHEN stop_count >= 2 THEN 1 ELSE 0 END AS INTEGER)
                AS r_stopwords,
           CAST(CASE WHEN n_words >= 20 AND n_words <= 10000
                      AND chars * 1.0 / n_words >= 3.0
                      AND chars * 1.0 / n_words <= 5.0
                      AND top_w * 1.0 / n_words <= 0.12
                      AND stop_count >= 2
                THEN 1 ELSE 0 END AS INTEGER) AS keep
    FROM agg
    """,
    "Gopher document filter as a per-rule decision table (word-count "
    "bounds, mean-word-length bounds, most-common-word repetition cap, "
    "stopword floor; Rae et al. 2021 A1.1): per-rule booleans allow "
    "per-rule attrition accounting, not just the final keep bit. "
    "Complements q21 (C4-style surface stats) and q46 (repetition "
    "signals); thresholds scaled to the synthetic 10-100-word docs. "
    "Same two-level partial-agg shape as repetition_features — no "
    "per-doc vocabulary ever collects to one row wider than the doc",
)
def q82_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.functions.textfns import gopher_rules

    return gopher_rules(_t(spark, sf_dir, "documents"), "doc_id", "text")


_NBC_DIM = 64


@_q(
    "q83_quality_classifier",
    f"""
    WITH toks AS (
      SELECT id, good, word FROM (
        SELECT doc_id AS id,
               CASE WHEN source IN ('src0', 'src8', 'src14')
                    THEN 1 ELSE 0 END AS good,
               unnest(string_split(trim(text), ' ')) AS word
        FROM documents WHERE length(text) > 0
      ) WHERE length(word) > 0
    ),
    hashed AS (
      SELECT id, good, ({_hex4_col("hh")}) % {_NBC_DIM} AS dim
      FROM (SELECT id, good, substr(md5(word), 1, 4) AS hh FROM toks)
    ),
    dimc AS (SELECT dim,
                    CAST(sum(good) AS BIGINT) AS good_c,
                    CAST(sum(1 - good) AS BIGINT) AS bad_c
             FROM hashed GROUP BY dim),
    tot AS (SELECT CAST(sum(good) AS BIGINT) AS good_total,
                   CAST(sum(1 - good) AS BIGINT) AS bad_total
            FROM hashed),
    w AS (SELECT dim,
                 (good_c + 1) * (bad_total + {_NBC_DIM})
                 - (bad_c + 1) * (good_total + {_NBC_DIM}) AS weight_num
          FROM dimc CROSS JOIN tot)
    SELECT id,
           CAST(count(*) AS BIGINT) AS n_toks,
           CAST(sum(weight_num) AS BIGINT) AS score_num,
           round(sum(weight_num) * 1.0 / count(*), 4) AS score,
           CAST(CASE WHEN sum(weight_num) > 0 THEN 1 ELSE 0 END AS INTEGER) AS label
    FROM hashed JOIN w USING (dim)
    GROUP BY id
    """,
    "fastText/CCNet-style linear quality classifier over hashed word "
    "features, trained AND applied in one integer-exact plan: fit = "
    "per-bucket class counts (one partial-agg shuffle to 64 rows) + "
    "1-row class totals; weight = the cross-multiplied NUMERATOR of "
    "the add-one-smoothed rate difference (no ln — engine libm "
    "last-bit drift can never flip a sign); apply = broadcast weight "
    "join + per-doc sum. The production data-curation scorer shape "
    "(CCNet trains fastText on Wikipedia-vs-crawl; here the positive "
    "class is three 'curated' sources vs the rest — the synthetic "
    "corpus's per-source signal is deliberately weak, so separation "
    "quality is asserted in the unit test on a two-vocabulary corpus, "
    "not here): no vocabulary build, no Python, floats only in the "
    "final reported average",
)
def q83_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.functions.textfns import hashed_nb_classifier

    d = _t(spark, sf_dir, "documents")
    return hashed_nb_classifier(
        d, "doc_id", "text", F.col("source").isin("src0", "src8", "src14"), dim=_NBC_DIM
    )


@_q(
    "q84_lang_mix_sample",
    f"""
    WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
               FROM documents GROUP BY lang),
    m AS (SELECT min(n_docs) AS min_docs FROM c),
    keyed AS (
      SELECT lang, ({_HEX4_DOC}) % 10000 AS bucket
      FROM (SELECT lang, substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 4) AS hh
            FROM documents)
    )
    SELECT k.lang, c.n_docs,
           CAST(m.min_docs AS BIGINT) AS target,
           CAST(sum(CASE WHEN k.bucket * c.n_docs < m.min_docs * 10000
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM keyed k JOIN c USING (lang) CROSS JOIN m
    GROUP BY k.lang, c.n_docs, m.min_docs
    """,
    "language-mix rebalancing sampler (the data-mixing step of corpus "
    "assembly): per-language keep rates DERIVED FROM THE DATA to hit a "
    "balanced target (downsample every language to the smallest one), "
    "then deterministic md5-bucket admission — integer "
    "cross-multiplication (bucket*n_docs < min_docs*10000) so no float "
    "rate ever rounds differently across engines. Scale shape: the "
    "rate table is one tiny partial-agg (|langs| rows, broadcast "
    "back); the corpus itself never shuffles — admission is a "
    "projection, the counts one partial agg. Complements q45 (given "
    "rates) and q78 (cluster-balanced)",
)
def q84_lang_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    c = d.groupBy("lang").agg(F.count("*").cast("long").alias("n_docs"))
    m = c.groupBy().agg(F.min("n_docs").alias("min_docs"))
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mix|"), F.col("doc_id").cast("string"))), 1, 4
            ),
            16,
            10,
        ).cast("long")
        % 10000
    )
    keyed = d.select("lang", bucket.alias("bucket"))
    kept = F.when(
        F.col("bucket") * F.col("n_docs") < F.col("min_docs") * 10000, 1
    ).otherwise(0)
    return (
        keyed.join(F.broadcast(c), "lang")
        .crossJoin(F.broadcast(m))
        .groupBy("lang", "n_docs", "min_docs")
        .agg(F.sum(kept).cast("long").alias("n_kept"))
        .select(
            "lang",
            "n_docs",
            F.col("min_docs").cast("long").alias("target"),
            "n_kept",
        )
    )


@_q(
    "q85_template_strip",
    """
    WITH hosts AS (
      SELECT doc_id AS id, doc_id % 40 AS host,
             'banner host ' || CAST(doc_id % 40 AS VARCHAR)
               || ' accept cookies and terms ' || text AS text
      FROM documents WHERE length(text) > 0
    ),
    p0 AS (SELECT id, host, string_split(text, ' ') AS w FROM hosts),
    paras AS (
      SELECT id, host, u.i - 1 AS pos,
             array_to_string(list_slice(w, (u.i - 1) * 8 + 1, (u.i - 1) * 8 + 8), ' ') AS para
      FROM p0, unnest(generate_series(1, CAST(ceil(len(w) / 8.0) AS BIGINT))) AS u(i)
    ),
    keyed AS (SELECT id, host, pos, para, md5(para) AS digest FROM paras),
    hd AS (SELECT host, CAST(count(*) AS BIGINT) AS host_docs FROM hosts GROUP BY host),
    tpl AS (
      SELECT g.host, g.digest
      FROM (SELECT host, digest, count(DISTINCT id) AS n_docs
            FROM keyed GROUP BY host, digest) g
      JOIN hd USING (host)
      WHERE hd.host_docs >= 5 AND g.n_docs * 2 >= hd.host_docs
    ),
    kept AS (SELECT k.id, k.pos, k.para FROM keyed k
             LEFT JOIN tpl t ON k.host = t.host AND k.digest = t.digest
             WHERE t.digest IS NULL),
    totals AS (SELECT id, host, CAST(count(*) AS BIGINT) AS n_paras
               FROM keyed GROUP BY id, host),
    ka AS (SELECT id, CAST(count(*) AS BIGINT) AS n_kept,
                  CAST(sum(length(para)) AS BIGINT) AS chars_kept,
                  md5(string_agg(para, chr(10) || chr(10) ORDER BY pos)) AS text_md5
           FROM kept GROUP BY id)
    SELECT t.id, t.host, t.n_paras,
           coalesce(ka.n_kept, CAST(0 AS BIGINT)) AS n_kept,
           coalesce(ka.chars_kept, CAST(0 AS BIGINT)) AS chars_kept,
           coalesce(ka.text_md5, md5('')) AS text_md5
    FROM totals t LEFT JOIN ka USING (id)
    """,
    "site-template removal (RefinedWeb/CCNet line-dedup policy at host "
    "scope): a paragraph present in >= half of a host's documents is "
    "furniture (cookie banner, nav, footer) and is stripped from EVERY "
    "document — including the first occurrence, unlike q48's "
    "keep-first. The synthesized per-host banner (one exact 8-word "
    "window) is the template ground truth. Shapes: linear window "
    "explode, countDistinct partial-agg on (host,digest), broadcast "
    "template anti-join, integer cross-multiplied threshold; nothing "
    "funnels through a per-digest window. dedup.template_strip",
)
def q85_template_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.operators.dedup import template_strip

    d = _t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    banner = d.select(
        F.col("doc_id").alias("id"),
        (F.col("doc_id") % 40).alias("host"),
        F.concat(
            F.lit("banner host "),
            (F.col("doc_id") % 40).cast("string"),
            F.lit(" accept cookies and terms "),
            F.col("text"),
        ).alias("text"),
    )
    return template_strip(banner, "id", "host", "text", words_per_para=8)


@_q(
    "q86_robots_admission",
    """
    WITH urls AS (
      SELECT 'h' || CAST(doc_id % 40 AS VARCHAR) || '.example' AS host,
             '/p' || CAST(doc_id % 10 AS VARCHAR) || '/page'
               || CAST(doc_id AS VARCHAR) AS path
      FROM documents
    ),
    robots AS (
      SELECT 'h' || CAST(h AS VARCHAR) || '.example' AS host,
             'User-agent: *' || chr(10) ||
             'Disallow: /p' || CAST(h % 7 AS VARCHAR) || chr(10) ||
             'Disallow:' || chr(10) ||
             'Disallow: /q' || CAST(h % 5 AS VARCHAR) AS txt
      FROM (SELECT DISTINCT doc_id % 40 AS h FROM documents WHERE doc_id % 40 < 30)
    ),
    rules AS (
      SELECT host, trim(substr(line, 11)) AS prefix
      FROM (SELECT host, unnest(string_split(txt, chr(10))) AS line FROM robots)
      WHERE substr(line, 1, 10) = 'Disallow: '
        AND length(trim(substr(line, 11))) > 0
    ),
    j AS (
      SELECT u.host, u.path,
             CASE WHEN r.prefix IS NOT NULL
                       AND substr(u.path, 1, length(r.prefix)) = r.prefix
                  THEN 1 ELSE 0 END AS hit
      FROM urls u LEFT JOIN rules r USING (host)
    )
    SELECT host, path, CAST(max(hit) AS INTEGER) AS blocked
    FROM j GROUP BY host, path
    """,
    "robots.txt crawl admission: parse per-host Disallow path prefixes "
    "from raw robots text (newline split + marker strip — empty "
    "Disallow values dropped, non-rule lines ignored), then verdict "
    "every url by substring prefix compare (no LIKE/regex: a "
    "metacharacter in a rule can never change semantics and both "
    "engines evaluate identically). Scale shape: rules are a few rows "
    "per host — broadcast left join, per-rule test, one partial-agg "
    "max per url; hosts without robots admit everything via the null "
    "leg. urlfns.parse_robots_rules / robots_admission; complements "
    "q66's host-suffix blocklist (path-level vs domain-level policy)",
)
def q86_robots_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.functions.urlfns import parse_robots_rules, robots_admission

    d = _t(spark, sf_dir, "documents")
    urls = d.select(
        F.concat(
            F.lit("h"), (F.col("doc_id") % 40).cast("string"), F.lit(".example")
        ).alias("host"),
        F.concat(
            F.lit("/p"),
            (F.col("doc_id") % 10).cast("string"),
            F.lit("/page"),
            F.col("doc_id").cast("string"),
        ).alias("path"),
    )
    hosts = d.select((F.col("doc_id") % 40).alias("h")).filter(F.col("h") < 30).distinct()
    robots = hosts.select(
        F.concat(F.lit("h"), F.col("h").cast("string"), F.lit(".example")).alias("host"),
        F.concat(
            F.lit("User-agent: *\nDisallow: /p"),
            (F.col("h") % 7).cast("string"),
            F.lit("\nDisallow:\nDisallow: /q"),
            (F.col("h") % 5).cast("string"),
        ).alias("txt"),
    )
    return robots_admission(urls, parse_robots_rules(robots, "host", "txt"))


@_q(
    "q87_mjpeg_frames",
    """
    SELECT doc_id AS media_id,
           CAST(f.i AS INTEGER) AS frame_idx,
           CAST(8 + doc_id % 17 AS INTEGER) AS width,
           CAST(8 + doc_id % 13 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CAST((8 + doc_id % 17) * (8 + doc_id % 13) * 3 AS BIGINT)
               AS raster_len
    FROM documents
    CROSS JOIN (VALUES (0), (1), (2), (3)) f(i)
    WHERE doc_id < 120 AND f.i < 1 + doc_id % 4
    """,
    "Motion-JPEG video frame decode, driver-checked end-to-end: "
    "synth_mjpeg renders deterministic per-frame rasters, encodes each "
    "as a standalone baseline JPEG, and muxes real MP4s (full sample "
    "table, stsd fourcc 'jpeg'); decode_video_frames re-derives every "
    "frame's byte range from the sample table and pushes it through "
    "the REAL Huffman+IDCT decoder — the oracle predicts frame count, "
    "dimensions, and raster size (w*h*3) in closed form, so a green "
    "row proves true pixel decode of demuxed video samples, closing "
    "the MP4-codec seam for the one family a pure-stdlib decoder can "
    "serve (avc1/hev1 still need ffmpeg). Pixel fidelity vs the "
    "source raster is unit-tested (test_multimodal). Reference "
    "analogue: byte->array decode at the head of the per-record map "
    "(data/dataset_mapper.py:151-155)",
)
def q87_mjpeg_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.multimodal import decode_video_frames, synth_mjpeg

    media = synth_mjpeg(_t(spark, sf_dir, "documents"), n_docs=120)
    return decode_video_frames(media).select(
        "media_id", "frame_idx", "width", "height", "channels", "raster_len"
    )


@_q(
    "q88_c4_rules",
    """
    WITH pages AS (
      SELECT doc_id AS id,
             trim(text)
             || CASE WHEN doc_id % 7 = 0 THEN ' {x}' ELSE '' END
             || CASE WHEN doc_id % 11 = 0 THEN ' lorem ipsum' ELSE '' END
             || CASE WHEN doc_id % 13 = 0 THEN ' javascript required' ELSE '' END
             || CASE WHEN doc_id % 3 = 0 THEN '.' ELSE '' END AS page
      FROM documents
    )
    SELECT id,
           CAST(len(string_split(trim(page), ' ')) AS BIGINT) AS n_words,
           CAST(CASE WHEN right(page, 1) IN ('.', '!', '?', '"')
                THEN 1 ELSE 0 END AS INTEGER) AS r_terminal,
           CAST(CASE WHEN contains(page, '{') THEN 0 ELSE 1 END AS INTEGER)
               AS r_no_brace,
           CAST(CASE WHEN contains(lower(page), 'lorem ipsum')
                THEN 0 ELSE 1 END AS INTEGER) AS r_no_lorem,
           CAST(CASE WHEN contains(lower(page), 'javascript')
                THEN 0 ELSE 1 END AS INTEGER) AS r_no_js,
           CAST(CASE WHEN len(string_split(trim(page), ' ')) >= 30
                THEN 1 ELSE 0 END AS INTEGER) AS r_min_words,
           CAST(CASE WHEN right(page, 1) IN ('.', '!', '?', '"')
                      AND NOT contains(page, '{')
                      AND NOT contains(lower(page), 'lorem ipsum')
                      AND NOT contains(lower(page), 'javascript')
                      AND len(string_split(trim(page), ' ')) >= 30
                THEN 1 ELSE 0 END AS INTEGER) AS keep
    FROM pages
    """,
    "C4 document filter as a per-rule decision table (Raffel et al. "
    "2020 §2.2 doc-level variant: terminal punctuation, code-brace / "
    "lorem-ipsum / javascript markers, word-count floor). The fixture "
    "page deterministically augments each doc (brace for doc_id%7, "
    "lorem for %11, javascript for %13, terminal '.' for %3) so every "
    "rule's split is non-degenerate and closed-form predictable. "
    "Unlike q82's two-level agg, this is purely per-row Column "
    "expressions — zero shuffle, one codegen stage; the two tables "
    "complement each other the way the published filters do. "
    "textfns.c4_rules",
)
def q88_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.functions.textfns import c4_rules

    d = _t(spark, sf_dir, "documents")
    blank = F.lit("")
    page = F.concat(
        F.trim(F.col("text")),
        F.when(F.col("doc_id") % 7 == 0, F.lit(" {x}")).otherwise(blank),
        F.when(F.col("doc_id") % 11 == 0, F.lit(" lorem ipsum")).otherwise(blank),
        F.when(F.col("doc_id") % 13 == 0, F.lit(" javascript required")).otherwise(blank),
        F.when(F.col("doc_id") % 3 == 0, F.lit(".")).otherwise(blank),
    )
    return c4_rules(d.select("doc_id", page.alias("page")), "doc_id", "page")


@_q(
    "q89_pii_redaction",
    """
    WITH pages AS (
      SELECT doc_id AS id,
             trim(text)
             || CASE WHEN doc_id % 2 = 0 THEN ' contact u'
                  || CAST(doc_id AS VARCHAR) || '@ex'
                  || CAST(doc_id % 10 AS VARCHAR) || '.org' ELSE '' END
             || CASE WHEN doc_id % 3 = 0 THEN ' call +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
             || CASE WHEN doc_id % 5 = 0 THEN ' from 10.'
                  || CAST(doc_id % 256 AS VARCHAR) || '.0.'
                  || CAST(doc_id % 100 AS VARCHAR) ELSE '' END AS page
      FROM documents
    )
    SELECT id,
           CAST(len(regexp_extract_all(page,
                '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+[a-zA-Z0-9]')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(page,
                '[+][0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(page,
                '[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}')) AS BIGINT)
               AS n_ips,
           md5(regexp_replace(regexp_replace(regexp_replace(page,
                '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+[a-zA-Z0-9]', '<EMAIL>', 'g'),
                '[+][0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
                '[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}', '<IP>', 'g'))
               AS redacted_md5
    FROM pages
    """,
    "PII scrubbing pass (the C4/RefinedWeb pre-training redaction "
    "stage): count and mask emails, phone numbers, and IPv4 addresses "
    "with placeholder tokens, patterns restricted to char-classes + "
    "bounded quantifiers so the Java (Spark) and RE2 (DuckDB) engines "
    "agree byte-for-byte; the md5 of the redacted page proves the "
    "masking itself is identical, not just the counts. The fixture "
    "injects deterministic PII (email for doc_id%2, phone for %3, IP "
    "for %5) so every counter's split is non-degenerate. All "
    "regexp Column expressions — JVM codegen, zero shuffle, no UDF. "
    "textfns.pii_redact",
)
def q89_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.functions.textfns import pii_redact

    d = _t(spark, sf_dir, "documents")
    blank = F.lit("")
    page = F.concat(
        F.trim(F.col("text")),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit(" contact u"),
                F.col("doc_id").cast("string"),
                F.lit("@ex"),
                (F.col("doc_id") % 10).cast("string"),
                F.lit(".org"),
            ),
        ).otherwise(blank),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" call +1-555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(blank),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" from 10."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".0."),
                (F.col("doc_id") % 100).cast("string"),
            ),
        ).otherwise(blank),
    )
    out = pii_redact(d.select("doc_id", page.alias("page")), "doc_id", "page")
    return out.select(
        "id", "n_emails", "n_phones", "n_ips",
        F.md5(F.col("redacted")).alias("redacted_md5"),
    )


@_q(
    "q90_mp4_audio",
    """
    WITH pcm AS (
      SELECT doc_id,
             u.j AS j,
             ((doc_id * 13 + u.j * 7) % 4001) - 2000 AS v
      FROM documents,
           unnest(generate_series(0, 32 * (1 + doc_id % 4) - 1)) AS u(j)
      WHERE doc_id < 150
    ),
    lagged AS (
      SELECT doc_id, j, v,
             lag(v) OVER (PARTITION BY doc_id ORDER BY j) AS pv
      FROM pcm
    )
    SELECT doc_id AS media_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(CASE WHEN pv IS NOT NULL
                          AND (v >= 0) <> (pv >= 0) THEN 1 ELSE 0 END)
                AS BIGINT) AS zero_crossings,
           CAST(max(abs(v)) AS INTEGER) AS peak,
           round(sqrt(sum(CAST(v * v AS BIGINT)) * 1.0 / count(*)), 6) AS rms
    FROM lagged
    GROUP BY doc_id
    """,
    "PCM-in-MP4 audio features, driver-checked end-to-end: "
    "synth_pcm_mp4 muxes deterministic int16 PCM under stsd fourcc "
    "'sowt' (32 values per MP4 sample, 1-4 samples per doc); "
    "mp4_audio_features demuxes the sample table, concatenates the "
    "stream in table order, and runs the same integer-exact "
    "ZCR/peak/RMS pass as the WAV leg. The oracle regenerates the "
    "exact PCM with generate_series and aggregates the features in "
    "SQL, so a green row proves demux order AND signal arithmetic "
    "bit-for-bit. With q87's MJPEG frames this closes the MP4 codec "
    "seam for both uncompressed track families; compressed codecs "
    "(aac/avc1) remain the library-bound seam. multimodal."
    "mp4_audio_features",
)
def q90_mp4_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.multimodal import mp4_audio_features, synth_pcm_mp4

    media = synth_pcm_mp4(_t(spark, sf_dir, "documents"), n_docs=150)
    return mp4_audio_features(media).select(
        "media_id", "n_samples", "zero_crossings", "peak", "rms"
    )


@_q(
    "q91_anchor_text",
    """
    WITH pages AS (
      SELECT doc_id,
             '<p>pre</p><a href="https://t-' || CAST(doc_id % 5 AS VARCHAR)
             || '.example/">' || (['click','here','download','best','news'])[1 + doc_id % 3]
             || '</a><a href="https://t-' || CAST(doc_id % 7 AS VARCHAR)
             || '.example/">' || (['click','here','download','best','news'])[1 + (doc_id + 1) % 4]
             || '</a>' AS html
      FROM documents
    ),
    elems AS (
      SELECT doc_id,
             unnest(regexp_extract_all(html, '<a href="[^"]+">[^<]*</a>')) AS elem
      FROM pages
    ),
    links AS (
      SELECT regexp_extract(elem, 'href="([^"]+)"', 1) AS target,
             regexp_extract(elem, '>([^<]*)<', 1) AS anchor
      FROM elems
    ),
    per_anchor AS (
      SELECT target, anchor, CAST(count(*) AS BIGINT) AS cnt
      FROM links GROUP BY target, anchor
    )
    SELECT target,
           CAST(sum(cnt) AS BIGINT) AS n_inlinks,
           CAST(count(*) AS BIGINT) AS n_distinct_anchors,
           max(struct_pack(cnt := cnt, anchor := anchor)).anchor AS top_anchor,
           CAST(max(struct_pack(cnt := cnt, anchor := anchor)).cnt AS BIGINT)
             AS top_anchor_cnt
    FROM per_anchor
    GROUP BY target
    """,
    "anchor-text aggregation per link target — the classic web-graph "
    "quality/relevance signal (what OTHER pages call this url): "
    "map-only <a>-element extraction (regexp_extract_all, zero "
    "shuffle), then TWO-LEVEL partial aggregation: groupBy(target, "
    "anchor) pre-collapses the raw edge list before groupBy(target) "
    "picks the dominant anchor via an orderable-struct max — so a "
    "viral target with 10^9 inlinks arrives at the final agg as at "
    "most |anchor vocabulary| rows, never 10^9 (the same skew "
    "discipline as q48's paragraph dedup). No window, no join, no "
    "collect_set of unbounded lists. functions analogue: urlfns "
    "outlink family (q42 resolves targets; this consumes the edges)",
)
def q91_anchor_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    vocab = F.array(*[F.lit(w) for w in ("click", "here", "download", "best", "news")])
    a1 = F.element_at(vocab, (F.col("doc_id") % 3 + 1).cast("int"))
    a2 = F.element_at(vocab, ((F.col("doc_id") + 1) % 4 + 1).cast("int"))
    html = F.concat(
        F.lit('<p>pre</p><a href="https://t-'),
        (F.col("doc_id") % 5).cast("string"),
        F.lit('.example/">'), a1,
        F.lit('</a><a href="https://t-'),
        (F.col("doc_id") % 7).cast("string"),
        F.lit('.example/">'), a2,
        F.lit("</a>"),
    )
    pages = d.select("doc_id", html.alias("html"))
    elems = pages.select(
        F.explode(
            F.regexp_extract_all("html", F.lit('<a href="[^"]+">[^<]*</a>'), 0)
        ).alias("elem")
    )
    links = elems.select(
        F.regexp_extract("elem", 'href="([^"]+)"', 1).alias("target"),
        F.regexp_extract("elem", ">([^<]*)<", 1).alias("anchor"),
    )
    per_anchor = links.groupBy("target", "anchor").agg(F.count("*").alias("cnt"))
    best = F.max(F.struct(F.col("cnt"), F.col("anchor")))
    return per_anchor.groupBy("target").agg(
        F.sum("cnt").alias("n_inlinks"),
        F.count("*").alias("n_distinct_anchors"),
        best["anchor"].alias("top_anchor"),
        best["cnt"].alias("top_anchor_cnt"),
    )


@_q(
    "q92_frontier_schedule",
    """
    WITH frontier AS (
      SELECT doc_id,
             'h' || CAST(doc_id % 13 AS VARCHAR) AS host,
             CAST((doc_id * 7) % 100 AS BIGINT) AS priority
      FROM documents
    ),
    waved AS (
      SELECT doc_id, host, priority,
             CAST(row_number() OVER (
               PARTITION BY host ORDER BY priority DESC, doc_id
             ) AS BIGINT) AS wave
      FROM frontier
    )
    SELECT doc_id, host, priority, wave,
           CAST(row_number() OVER (
             PARTITION BY wave ORDER BY priority DESC, doc_id
           ) AS BIGINT) AS slot
    FROM waved
    """,
    "politeness-aware crawl-frontier scheduling: wave = per-host fetch "
    "position (row_number partitioned by host — the politeness "
    "invariant IS per-host sequential fetching, so the host partition "
    "is the natural, never-skew-surprising unit: a hot host just gets "
    "a deep queue spread across many waves instead of hammering the "
    "server), slot = deterministic within-wave ordering (one row per "
    "host per wave, so wave groups are bounded by |hosts| regardless "
    "of frontier depth). Two bounded windows, no global sort is ever "
    "materialized — downstream fetchers range-partition on (wave, "
    "slot). This is the planning step between q86's robots admission "
    "and the fetch itself",
)
def q92_frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = _t(spark, sf_dir, "documents")
    frontier = d.select(
        "doc_id",
        F.concat(F.lit("h"), (F.col("doc_id") % 13).cast("string")).alias("host"),
        ((F.col("doc_id") * 7) % 100).alias("priority"),
    )
    w_host = Window.partitionBy("host").orderBy(F.desc("priority"), F.col("doc_id"))
    waved = frontier.withColumn("wave", F.row_number().over(w_host).cast("long"))
    w_wave = Window.partitionBy("wave").orderBy(F.desc("priority"), F.col("doc_id"))
    return waved.withColumn("slot", F.row_number().over(w_wave).cast("long"))


@_q(
    "q93_gif_pixels",
    """
    WITH dims AS (
      SELECT doc_id,
             5 + doc_id % 19 AS w,
             4 + doc_id % 11 AS h,
             2 + doc_id % 7 AS npal
      FROM documents WHERE doc_id < 140
    ),
    px AS (
      SELECT doc_id, w, h, u.j AS j,
             ((u.j % w) * 2 + (u.j // w) * 3 + doc_id) % npal AS idx
      FROM dims, unnest(generate_series(0, w * h - 1)) AS u(j)
    )
    SELECT doc_id AS media_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(count(*) AS BIGINT) AS n_pixels,
           CAST(sum(idx * (1 + j % 97)) AS BIGINT) AS idx_possum,
           CAST(sum((idx * 41 + doc_id) % 256
                  + (idx * 59 + doc_id * 3) % 256
                  + (idx * 83 + doc_id * 7) % 256) AS BIGINT) AS rgb_sum
    FROM px
    GROUP BY doc_id, w, h
    """,
    "GIF pixel decode at VALUE level, driver-checked: synth_gif writes "
    "real LZW-compressed GIF89a files (interlaced for even doc_id) and "
    "gif_pixel_stats decodes them with the pure-stdlib LZW decoder "
    "(gifcodec: variable code width, dictionary resets, four-pass "
    "deinterlace). idx_possum position-weights every decoded index in "
    "natural row order (any LZW or deinterlace slip shifts it) and "
    "rgb_sum maps pixels through the palette read back from the file, "
    "so a green row proves raster values AND color table round-trip — "
    "stronger than q76's dimensional check. The oracle regenerates "
    "the raster in closed form with generate_series. "
    "multimodal.gif_pixel_stats, toyocr_spark/gifcodec.py",
)
def q93_gif_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.multimodal import gif_pixel_stats, synth_gif

    media = synth_gif(_t(spark, sf_dir, "documents"), n_docs=140)
    return gif_pixel_stats(media)


@_q(
    "q94_g711_audio",
    """
    WITH bytes AS (
      SELECT doc_id, u.j AS j,
             (doc_id * 31 + u.j * 17) % 256 AS b,
             doc_id % 2 = 0 AS is_ulaw
      FROM documents,
           unnest(generate_series(0, 47 + doc_id % 33)) AS u(j)
      WHERE doc_id < 140
    ),
    comp AS (
      SELECT doc_id, j, is_ulaw, 255 - b AS u, xor(b, 85) AS a
      FROM bytes
    ),
    expanded AS (
      SELECT doc_id, j,
        CASE WHEN is_ulaw THEN
          (CASE WHEN u >= 128 THEN -1 ELSE 1 END)
          * ((((u % 16) * 8 + 132) << ((u // 16) % 8)) - 132)
        ELSE
          (CASE WHEN a >= 128 THEN 1 ELSE -1 END)
          * (CASE WHEN (a // 16) % 8 = 0
                  THEN (a % 16) * 16 + 8
                  ELSE ((a % 16) * 16 + 264) << (((a // 16) % 8) - 1) END)
        END AS v
      FROM comp
    ),
    lagged AS (
      SELECT doc_id, j, v,
             lag(v) OVER (PARTITION BY doc_id ORDER BY j) AS pv
      FROM expanded
    )
    SELECT doc_id AS media_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(CASE WHEN pv IS NOT NULL
                          AND (v >= 0) <> (pv >= 0) THEN 1 ELSE 0 END)
                AS BIGINT) AS zero_crossings,
           CAST(max(abs(v)) AS INTEGER) AS peak,
           round(sqrt(sum(CAST(v * v AS BIGINT)) * 1.0 / count(*)), 6) AS rms
    FROM lagged
    GROUP BY doc_id
    """,
    "G.711 companded-audio decode, driver-checked at sample-value "
    "level: synth_g711_wav writes WAV files whose data chunk is mu-law "
    "(tag 7, even doc_id) or A-law (tag 6, odd) companded bytes; "
    "_parse_wav expands them through the real ITU-T G.711 tables "
    "(cross-validated byte-for-byte against CPython's audioop in "
    "test_multimodal) and the shared integer-exact ZCR/peak/RMS pass "
    "runs over the decoded int16 stream. The oracle re-implements the "
    "expansion formulas with SQL bit arithmetic, so a green row proves "
    "all 256 code points of both companding laws decode identically. "
    "multimodal.synth_g711_wav / audio_features",
)
def q94_g711_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.multimodal import audio_features, synth_g711_wav

    media = synth_g711_wav(_t(spark, sf_dir, "documents"), n_docs=140)
    return audio_features(media).select(
        "media_id", "n_samples", "zero_crossings", "peak", "rms"
    )


@_q(
    "q95_sitemap_parse",
    """
    WITH e AS (
      SELECT doc_id, u.k AS k
      FROM documents, unnest(generate_series(0, doc_id % 3)) AS u(k)
    ),
    parsed AS (
      SELECT 's' || CAST(doc_id % 11 AS VARCHAR) || '.example' AS host,
             doc_id,
             '2026-0' || CAST(1 + k % 9 AS VARCHAR) || '-15' AS lastmod,
             (doc_id + k) % 10 AS prio_x10
      FROM e
    )
    SELECT host,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_sitemaps,
           max(lastmod) AS latest_lastmod,
           CAST(sum(prio_x10) AS BIGINT) AS priority_sum_x10
    FROM parsed
    GROUP BY host
    """,
    "sitemap.xml ingestion — the crawl-seeding step before q86's "
    "robots admission and q92's frontier scheduling: each doc carries "
    "a synthetic <urlset> sitemap (built JVM-side with "
    "transform/sequence/array_join — no UDF), parsed back JVM-side "
    "with regexp_extract_all into parallel loc/lastmod/priority "
    "arrays, zipped, exploded, and aggregated per host (url count, "
    "distinct sitemap count, newest lastmod, integer-exact priority "
    "mass x10 — never a float sum). Map-only until one partial-agg "
    "shuffle on host; at 100 TB sitemap files are a tiny fraction of "
    "the crawl and hosts are the natural partition. The oracle "
    "predicts the parsed aggregate in closed form",
)
def q95_sitemap_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    entry = lambda k: F.concat(  # noqa: E731
        F.lit("<url><loc>https://s"),
        (did % 11).cast("string"),
        F.lit(".example/p/"),
        did.cast("string"),
        F.lit("-"),
        k.cast("string"),
        F.lit("</loc><lastmod>2026-0"),
        (1 + k % 9).cast("string"),
        F.lit("-15</lastmod><priority>0."),
        ((did + k) % 10).cast("string"),
        F.lit("</priority></url>"),
    )
    xml = F.concat(
        F.lit('<?xml version="1.0"?><urlset>'),
        F.array_join(F.transform(F.sequence(F.lit(0), did % 3), entry), ""),
        F.lit("</urlset>"),
    )
    sitemaps = d.select("doc_id", xml.alias("xml"))
    parsed = sitemaps.select(
        "doc_id",
        F.regexp_extract_all("xml", F.lit("<loc>([^<]+)</loc>"), 1).alias("locs"),
        F.regexp_extract_all(
            "xml", F.lit("<lastmod>([^<]+)</lastmod>"), 1
        ).alias("mods"),
        F.regexp_extract_all(
            "xml", F.lit("<priority>0\\.([0-9])</priority>"), 1
        ).alias("prios"),
    )
    rows = parsed.select(
        "doc_id",
        F.explode(F.arrays_zip("locs", "mods", "prios")).alias("u"),
    ).select(
        "doc_id",
        F.regexp_extract(F.col("u.locs"), "^https://([^/]+)/", 1).alias("host"),
        F.col("u.mods").alias("lastmod"),
        F.col("u.prios").cast("long").alias("prio_x10"),
    )
    return rows.groupBy("host").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct("doc_id").alias("n_sitemaps"),
        F.max("lastmod").alias("latest_lastmod"),
        F.sum("prio_x10").alias("priority_sum_x10"),
    )


@_q(
    "q96_html_tables",
    """
    WITH t AS (
      SELECT doc_id, u.t AS t,
             2 + (doc_id + u.t) % 3 AS r,
             1 + (doc_id + u.t) % 4 AS c
      FROM documents, unnest(generate_series(0, doc_id % 2)) AS u(t)
    ),
    cells AS (
      SELECT t.doc_id, t.t, t.r, t.c,
             (t.doc_id + t.t + ri.i * t.c + cj.j) % 100 AS val
      FROM t,
           unnest(generate_series(0, t.r - 1)) AS ri(i),
           unnest(generate_series(0, t.c - 1)) AS cj(j)
    )
    SELECT doc_id,
           CAST(t AS INTEGER) AS table_idx,
           CAST(r AS INTEGER) AS n_rows,
           CAST(c AS INTEGER) AS n_cols,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(2 + CASE WHEN val >= 10 THEN 1 ELSE 0 END) AS BIGINT)
             AS cell_chars
    FROM cells
    GROUP BY doc_id, t, r, c
    """,
    "HTML table extraction to structured rows — the tabular-data leg "
    "of a training corpus (tables become aligned text or are routed "
    "to a separate modality): per-doc synthetic <table> markup is "
    "built JVM-side with NESTED higher-order functions (transform "
    "inside transform — rows inside tables), then parsed back from "
    "the markup alone: regexp_extract_all pulls each table, <tr>/<td> "
    "counts give shape, and cell_chars measures the extracted cell "
    "text (length of the array_join of all <td> captures). Map-only, "
    "zero shuffle, one row per (doc, table). The oracle predicts "
    "shape and text mass in closed form",
)
def q96_html_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")

    def cell(t, i, j, c):
        return F.concat(
            F.lit("<td>v"),
            ((did + t + i * c + j) % 100).cast("string"),
            F.lit("</td>"),
        )

    def table(t):
        r = 2 + (did + t) % 3
        c = 1 + (did + t) % 4
        row = lambda i: F.concat(  # noqa: E731
            F.lit("<tr>"),
            F.array_join(
                F.transform(F.sequence(F.lit(0), c - 1), lambda j: cell(t, i, j, c)),
                "",
            ),
            F.lit("</tr>"),
        )
        return F.concat(
            F.lit("<table>"),
            F.array_join(F.transform(F.sequence(F.lit(0), r - 1), row), ""),
            F.lit("</table>"),
        )

    html = F.concat(
        F.lit("<html><body><p>prose</p>"),
        F.array_join(F.transform(F.sequence(F.lit(0), did % 2), table), ""),
        F.lit("</body></html>"),
    )
    pages = d.select("doc_id", html.alias("html"))
    tables = pages.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all("html", F.lit("<table>(.*?)</table>"), 1)
        ).alias("table_idx", "tbl"),
    )
    trs = F.regexp_extract_all("tbl", F.lit("<tr>(.*?)</tr>"), 1)
    tds = F.regexp_extract_all("tbl", F.lit("<td>([^<]*)</td>"), 1)
    return tables.select(
        "doc_id",
        F.col("table_idx").cast("int"),
        F.size(trs).alias("n_rows"),
        (F.size(tds) / F.size(trs)).cast("int").alias("n_cols"),
        F.size(tds).cast("long").alias("n_cells"),
        F.length(F.array_join(tds, "")).cast("long").alias("cell_chars"),
    )


@_q(
    "q97_bpe_pairs",
    """
    WITH words AS (
      SELECT lower(w.word) AS word
      FROM documents,
           unnest(string_split_regex(text, '\\s+')) AS w(word)
      WHERE regexp_matches(lower(w.word), '^[a-z]+$')
        AND length(w.word) >= 2
    ),
    vocab AS (
      SELECT word, CAST(count(*) AS BIGINT) AS freq
      FROM words GROUP BY word
    ),
    pairs AS (
      SELECT substr(word, u.i, 2) AS pair, freq
      FROM vocab, unnest(generate_series(1, length(word) - 1)) AS u(i)
    ),
    counted AS (
      SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count
      FROM pairs GROUP BY pair
    )
    SELECT pair, pair_count,
           CAST(row_number() OVER (ORDER BY pair_count DESC, pair)
                AS BIGINT) AS rank
    FROM counted
    ORDER BY pair_count DESC, pair
    LIMIT 20
    """,
    "BPE merge-candidate pair counting — the first round of "
    "byte-pair-encoding tokenizer training (Sennrich et al.'s "
    "learn_bpe), the on-ramp to training a tokenizer ON the corpus "
    "the engine curates. The critical scale shape: the token stream "
    "is collapsed to the DISTINCT-WORD vocabulary first (one partial "
    "agg), and adjacent-pair explosion + counting then iterate over "
    "vocabulary entries weighted by frequency — corpus growth beyond "
    "vocabulary saturation adds nothing to the pair stage. All "
    "JVM-side (split/transform/sequence/substring), top-20 via "
    "TakeOrderedAndProject with a deterministic pair tiebreak. "
    "Subsequent merge rounds re-run the same plan over the re-segmented "
    "vocab table",
)
def q97_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = _t(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word"))
        .filter(F.col("word").rlike("^[a-z]+$") & (F.length("word") >= 2))
    )
    vocab = words.groupBy("word").agg(F.count("*").alias("freq"))
    pairs = vocab.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.substring(F.col("word"), i, F.lit(2)),
            )
        ).alias("pair"),
        "freq",
    )
    counted = pairs.groupBy("pair").agg(F.sum("freq").alias("pair_count"))
    # limit FIRST (TakeOrderedAndProject: per-partition top-k, no full
    # sort), then rank the 20 survivors — the single-partition window
    # exchange touches 20 rows, never the pair vocabulary
    top = counted.orderBy(F.desc("pair_count"), "pair").limit(20)
    return top.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.desc("pair_count"), F.col("pair")))
        .cast("long"),
    )


@_q(
    "q98_jsonld_extract",
    """
    WITH e AS (
      SELECT doc_id, u.k AS k
      FROM documents, unnest(generate_series(0, doc_id % 2)) AS u(k)
    ),
    items AS (
      SELECT doc_id,
             (['Article','Product','Organization'])
               [CAST((doc_id + k) % 3 AS INTEGER) + 1] AS item_type,
             'n' || CAST(doc_id AS VARCHAR) || '_' || CAST(k AS VARCHAR)
               AS name,
             (doc_id * 7 + k) % 50 AS position
      FROM e
    )
    SELECT item_type,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(sum(position) AS BIGINT) AS position_sum,
           max(name) AS max_name
    FROM items
    GROUP BY item_type
    """,
    "schema.org JSON-LD structured-data extraction — the metadata-"
    "mining leg of a web corpus (recipes, products, articles become "
    "typed records; reference analogue: the GT annotation side-tables "
    "the detector trains against). Each doc carries synthetic "
    '<script type="application/ld+json"> blocks built JVM-side from '
    "doc_id; the parse runs entirely on the markup: regexp_extract_all "
    "pulls the script bodies, get_json_object reads @type/name/"
    "position from each block (Jackson, JVM-side — never a Python "
    "json.loads), one partial-agg shuffle on the ~3-value @type key. "
    "At 100 TB this is map-only scan work; the tiny type cardinality "
    "makes the final agg a broadcast-sized result. Oracle predicts "
    "the parsed aggregate in closed form",
)
def q98_jsonld_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    types = F.array(F.lit("Article"), F.lit("Product"), F.lit("Organization"))
    script = lambda k: F.concat(  # noqa: E731
        F.lit('<script type="application/ld+json">{"@type":"'),
        F.element_at(types, ((did + k) % 3).cast("int") + 1),
        F.lit('","name":"n'),
        did.cast("string"),
        F.lit("_"),
        k.cast("string"),
        F.lit('","position":'),
        ((did * 7 + k) % 50).cast("string"),
        F.lit("}</script>"),
    )
    page = F.concat(
        F.lit("<html><head>"),
        F.array_join(F.transform(F.sequence(F.lit(0), did % 2), script), ""),
        F.lit("</head><body></body></html>"),
    )
    blocks = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(
                page.alias("page"),
                F.lit('<script type="application/ld\\+json">(.*?)</script>'),
                1,
            )
        ).alias("block"),
    )
    items = blocks.select(
        "doc_id",
        F.get_json_object("block", "$['@type']").alias("item_type"),
        F.get_json_object("block", "$.name").alias("name"),
        F.get_json_object("block", "$.position").cast("long").alias("position"),
    )
    return items.groupBy("item_type").agg(
        F.count("*").alias("n_items"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("position").alias("position_sum"),
        F.max("name").alias("max_name"),
    )


def _bpe_train_oracle_sql(n_merges: int, min_pair_freq: int) -> str:
    """Mechanically unrolled DuckDB twin of train_bpe: k chained CTE
    rounds of (pair count -> argmax -> replace-based re-segmentation).
    Greedy left-to-right non-overlapping merge == non-overlapping SQL
    replace() over the bracket-wrapped symbol string ('aaa' under
    ('a','a') -> 'aa','a' in both)."""
    sql = """
    WITH vocab AS (
      SELECT word, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word
            FROM documents)
      WHERE regexp_full_match(word, '[a-z]+') AND length(word) >= 2
      GROUP BY word
    ),
    seg_0 AS (
      SELECT freq,
             '[' || array_to_string(
                 list_transform(generate_series(1, length(word)),
                                i -> substr(word, i, 1)), '][')
                 || '][</w>]' AS s
      FROM vocab
    )"""
    for k in range(1, n_merges + 1):
        p = k - 1
        sql += f""",
    syms_{k} AS (
      SELECT freq, regexp_extract_all(s, '\\[([^\\]]+)\\]', 1) AS l
      FROM seg_{p}
    ),
    pairs_{k} AS (
      SELECT l[i] AS lft, l[i+1] AS rgt,
             CAST(sum(freq) AS BIGINT) AS pair_freq
      FROM syms_{k}, unnest(generate_series(1, len(l) - 1)) AS t(i)
      GROUP BY 1, 2
    ),
    best_{k} AS (
      SELECT lft, rgt, pair_freq FROM pairs_{k}
      WHERE pair_freq >= {min_pair_freq}
      ORDER BY pair_freq DESC, lft, rgt LIMIT 1
    ),
    seg_{k} AS (
      SELECT freq, replace(s, '[' || b.lft || '][' || b.rgt || ']',
                              '[' || b.lft || b.rgt || ']') AS s
      FROM seg_{p}, best_{k} b
    )"""
    sql += (
        "\n    "
        + "\n    UNION ALL ".join(
            f'SELECT CAST({k} AS BIGINT) AS rank, lft AS "left", '
            f'rgt AS "right", pair_freq FROM best_{k}'
            for k in range(1, n_merges + 1)
        )
        + "\n    ORDER BY rank"
    )
    return sql


@_q(
    "q99_bpe_train",
    _bpe_train_oracle_sql(n_merges=8, min_pair_freq=2),
    "full iterative BPE tokenizer training (Sennrich learn_bpe) — "
    "q97 is literally round 1 of this loop. One corpus pass collapses "
    "the stream to the distinct-word vocab; 8 merge rounds then run "
    "over VOCAB rows only (pair partial-agg + 1-row argmax collect + "
    "pure-JVM F.aggregate fold to re-segment + localCheckpoint to "
    "keep iterative lineage flat — the connected-components "
    "discipline). Deterministic merge order via (freq DESC, left, "
    "right). The oracle UNROLLS the 8 argmax-dependent rounds as "
    "chained CTEs: segmentation as a '[sym][sym]' string, greedy "
    "left-to-right non-overlapping merge = SQL replace() (same "
    "semantics — both consume matches as they scan; bracket wrapping "
    "is unambiguous because symbols never contain brackets), early "
    "stop = HAVING-filtered 1-row best_k whose emptiness empties "
    "every later round. Exact-value double-check remains "
    "tests/test_bpe.py's pure-Python Sennrich reference, bit-for-bit",
)
def q99_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.operators.bpe import train_bpe, word_vocab

    d = _t(spark, sf_dir, "documents")
    merges, _seg = train_bpe(word_vocab(d), n_merges=8)
    rows = [
        (i + 1, left, right, freq) for i, (left, right, freq) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank long, left string, right string, pair_freq long"
    )


@_q(
    "q100_cdx_index",
    f"""
    WITH raw AS (
      SELECT doc_id, {_URL_SYNTH_SQL} AS url FROM documents
    ),
    s1 AS (SELECT doc_id, split_part(url, '#', 1) AS u FROM raw),
    s2 AS (SELECT doc_id, u, lower(split_part(u, '://', 1)) AS scheme,
                  substr(u, length(split_part(u, '://', 1)) + 4) AS rest FROM s1),
    s3 AS (SELECT *, split_part(rest, '/', 1) AS hostport,
                  substr(rest, length(split_part(rest, '/', 1)) + 1) AS path_q FROM s2),
    s4 AS (SELECT *,
                  CASE WHEN starts_with(lower(split_part(hostport, ':', 1)), 'www.')
                       THEN substr(lower(split_part(hostport, ':', 1)), 5)
                       ELSE lower(split_part(hostport, ':', 1)) END AS host,
                  CASE WHEN contains(hostport, ':') THEN split_part(hostport, ':', 2)
                       ELSE '' END AS port
           FROM s3),
    s5 AS (SELECT *,
                  CASE WHEN port = '' OR (scheme = 'https' AND port = '443')
                            OR (scheme = 'http' AND port = '80')
                       THEN '' ELSE ':' || port END AS port_part,
                  CASE WHEN split_part(path_q, '?', 1) = '' THEN '/'
                       ELSE split_part(path_q, '?', 1) END AS path,
                  CASE WHEN contains(path_q, '?')
                       THEN substr(path_q, position('?' IN path_q) + 1)
                       ELSE '' END AS qs
           FROM s4),
    s6 AS (SELECT *,
                  list_sort(list_filter(string_split(qs, '&'),
                      p -> p != '' AND NOT starts_with(split_part(p, '=', 1), 'utm_')
                           AND split_part(p, '=', 1) NOT IN ('fbclid','gclid','msclkid','ref_src')
                  )) AS kept
           FROM s5),
    canon AS (SELECT doc_id, host, port_part,
                     path || CASE WHEN len(kept) > 0
                                  THEN '?' || array_to_string(kept, '&')
                                  ELSE '' END AS pathq,
                     scheme || '://' || host || port_part || path ||
                     CASE WHEN len(kept) > 0 THEN '?' || array_to_string(kept, '&')
                          ELSE '' END AS canonical_url
              FROM s6)
    SELECT array_to_string(list_reverse(string_split(c.host, '.')), ',')
             || c.port_part || ')' || c.pathq                      AS surt_key,
           '202602' || lpad(CAST((d.doc_id % 97) // 24 + 1 AS VARCHAR), 2, '0')
             || lpad(CAST((d.doc_id % 97) % 24 AS VARCHAR), 2, '0')
             || '0000'                                             AS ts14,
           c.canonical_url                                         AS url,
           md5(d.text)                                             AS digest,
           CAST(octet_length(encode(d.text)) AS BIGINT)            AS n_bytes
    FROM canon c JOIN documents d USING (doc_id)
    """,
    "CDX capture-index build — the Common-Crawl index artifact that "
    "makes a petabyte crawl point-addressable: one row per capture "
    "keyed by the SURT form of the canonical url (reversed host "
    "components, port kept, scheme dropped) plus 14-digit timestamp, "
    "content digest, and byte length. Map-only projection (URL canon "
    "+ SURT are pure Column exprs, digest is md5, no shuffle in the "
    "index-row build); at 100 TB the sink adds ONE "
    "repartitionByRange(surt_key) + sortWithinPartitions to emit "
    "sorted shards and a block-boundary secondary index — a total "
    "sort of (key, offset) rows, never of page bodies. Lexicographic "
    "SURT order clusters every host/registrable domain contiguously, "
    "so host-scoped lookups become range scans",
)
def q100_cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.functions.urlfns import canonicalize_url, surt_key

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    hrs = did % 97
    ts14 = F.concat(
        F.lit("202602"),
        F.lpad((F.floor(hrs / 24) + 1).cast("string"), 2, "0"),
        F.lpad((hrs % 24).cast("string"), 2, "0"),
        F.lit("0000"),
    )
    # canonicalize once into a NAMED column and derive the SURT key from
    # the column reference: surt_key's internal subtree reuse otherwise
    # clones the whole canonicalize tree ~6x in the unresolved plan and
    # Catalyst analysis of that product took ~0.9 s per build
    base = d.select(
        canonicalize_url(_url_synth_col()).alias("url"),
        ts14.alias("ts14"),
        F.md5(F.col("text").cast("binary")).alias("digest"),
        F.octet_length("text").cast("long").alias("n_bytes"),
    )
    return base.select(
        surt_key(F.col("url")).alias("surt_key"),
        "ts14",
        "url",
        "digest",
        "n_bytes",
    )


@_q(
    "q101_corpus_stats",
    """
    WITH words AS (
      SELECT lang, lower(w.word) AS word
      FROM documents,
           unnest(string_split_regex(text, '\\s+')) AS w(word)
      WHERE regexp_matches(lower(w.word), '^[a-z]+$')
        AND length(w.word) >= 2
    ),
    vocab AS (
      SELECT lang, word, CAST(count(*) AS BIGINT) AS freq
      FROM words GROUP BY lang, word
    )
    SELECT lang,
           CAST(sum(freq) AS BIGINT)                                AS n_tokens,
           CAST(count(*) AS BIGINT)                                 AS n_types,
           CAST(sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS hapax_types,
           CAST(sum(length(word) * freq) AS BIGINT)                 AS n_chars,
           CAST(max(freq) AS BIGINT)                                AS top_freq
    FROM vocab GROUP BY lang
    """,
    "corpus statistics profile (Heaps/Zipf inputs): per-language "
    "token count, type count, hapax count, character mass, and modal "
    "frequency — the numbers that size a tokenizer vocabulary and "
    "detect corpus drift between crawl snapshots. Same two-level "
    "vocab-collapse shape as q97/q99: the corpus is touched once, the "
    "second aggregate runs over vocabulary rows (all integer-exact, "
    "no ratio columns near the driver hash)",
)
def q101_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    words = d.select(
        "lang", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word")
    ).filter(F.col("word").rlike("^[a-z]+$") & (F.length("word") >= 2))
    vocab = words.groupBy("lang", "word").agg(F.count("*").alias("freq"))
    return vocab.groupBy("lang").agg(
        F.sum("freq").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.sum(F.when(F.col("freq") == 1, 1).otherwise(0)).alias("hapax_types"),
        F.sum(F.length("word") * F.col("freq")).alias("n_chars"),
        F.max("freq").alias("top_freq"),
    )


_BLOCK_PHRASES = ["sort merge", "table scan", "batch batch batch", "click here"]


@_q(
    "q102_phrase_blocklist",
    """
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             array_to_string(list_slice(w, u.i, u.i + 1), ' ') AS gram
      FROM toks,
           unnest(generate_series(1, len(w) - 1)) AS u(i)
      WHERE len(w) >= 2
      UNION ALL
      SELECT doc_id,
             array_to_string(list_slice(w, u.i, u.i + 2), ' ') AS gram
      FROM toks,
           unnest(generate_series(1, len(w) - 2)) AS u(i)
      WHERE len(w) >= 3
    ),
    phrases AS (
      SELECT * FROM (VALUES ('sort merge'), ('table scan'),
                            ('batch batch batch'), ('click here')) p(phrase)
    )
    SELECT g.gram AS phrase,
           CAST(count(DISTINCT g.doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_hits
    FROM grams g JOIN phrases p ON g.gram = p.phrase
    GROUP BY g.gram
    """,
    "phrase-blocklist scan (C4 §2.2 'bad words' filter generalized to "
    "multi-word phrases): per-phrase document and occurrence counts "
    "over the corpus. NEVER a LIKE chain — the doc is tokenized once "
    "and zip-with-shifted into L-grams for each phrase length in the "
    "list (2 and 3 here), which equi-join the broadcast phrase table; "
    "work is corpus-linear regardless of list size. The survivors "
    "filter (textfns.drop_blocked_phrases) is the prep_job "
    "--phrase-blocklist stage; this query is its audit report",
)
def q102_phrase_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.functions.textfns import phrase_hits

    d = _t(spark, sf_dir, "documents")
    hits = phrase_hits(d, "doc_id", "text", _BLOCK_PHRASES)
    return hits.groupBy("phrase").agg(
        F.countDistinct("id").alias("n_docs"),
        F.sum("n_hits").alias("n_hits"),
    )


@_q(
    "q103_intradoc_dedup",
    """
    WITH t AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM documents
    ),
    l AS (
      SELECT doc_id,
             list_transform(
               generate_series(1, greatest(CAST((len(w) + 9) // 10 AS INT), 1)),
               k -> array_to_string(list_slice(w, (k - 1) * 10 + 1, k * 10), ' ')
             ) AS raw
      FROM t
    ),
    a AS (  -- deterministic augmentation: re-append the first two
            -- lines so every doc provably exercises the dedup path
      SELECT doc_id, list_concat(raw, list_slice(raw, 1, 2)) AS lines FROM l
    )
    SELECT doc_id,
           CAST(len(lines) AS BIGINT) AS n_paras,
           CAST(len(list_filter(
                  list_transform(generate_series(1, len(lines)),
                                 i -> list_position(lines, lines[i]) = i),
                  b -> b)) AS BIGINT) AS n_kept,
           CAST(list_sum(list_transform(lines, p -> length(p))) AS BIGINT)
             AS chars_total
    FROM a
    ORDER BY doc_id
    LIMIT 200
    """,
    "intra-document repeated-line removal (RefinedWeb's line-level "
    "in-doc dedup): fixed word-window 'lines' (the corpus-synthetic "
    "proxy for newline units, same 10-word convention as q48), a line "
    "survives iff it is the FIRST occurrence within its own doc. The "
    "entire dedup is array HOFs on one row — split, window transform, "
    "keep i where array_position(lines, lines[i]) == i — ZERO shuffle "
    "until the report aggregate; at 100 TB this composes into the "
    "extraction map stage for free (unlike cross-doc dedup, which is "
    "inherently a shuffle). The synthetic corpus has no natural "
    "repeated windows, so each doc's first two lines are "
    "deterministically re-appended (q88's fixture-augmentation "
    "precedent) — every doc provably exercises the drop path. Result: "
    "per-doc kept/total line and char accounting for the first 200 "
    "docs",
)
def q103_intradoc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    w = F.split(F.col("text"), r"\s+")
    n_lines = F.greatest(F.floor((F.size(w) + 9) / 10).cast("int"), F.lit(1))
    raw = F.transform(
        F.sequence(F.lit(1), n_lines),
        lambda k: F.array_join(F.slice(w, (k - 1) * 10 + 1, 10), " "),
    )
    # deterministic augmentation (q88 precedent): re-append the first
    # two lines so every doc provably exercises the dedup path
    lines = F.concat(raw, F.slice(raw, 1, 2))
    d2 = d.select("doc_id", lines.alias("lines"))
    kept = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.size("lines")),
            lambda i: F.array_position(F.col("lines"), F.element_at("lines", i)) == i,
        ),
        lambda b: b,
    )
    report = d2.select(
        "doc_id",
        F.size("lines").cast("long").alias("n_paras"),
        F.size(kept).cast("long").alias("n_kept"),
        F.aggregate(
            "lines", F.lit(0).cast("long"), lambda acc, p: acc + F.length(p)
        ).alias("chars_total"),
    )
    return report.orderBy("doc_id").limit(200)


@_q(
    "q104_lsh_recall",
    f"""
    WITH {_CAPPED_SHINGLE_SQL},
    sz AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id
    ),
    exact AS (
      SELECT id_a, id_b
      FROM inter JOIN sz x ON id_a = x.id JOIN sz y ON id_b = y.id
      WHERE inter * 1.0 / (x.n + y.n - inter) >= 0.1
    ),
    sig AS (
      SELECT id, b AS band, min(md5(CAST(b AS VARCHAR) || '|' || shingle)) AS sig
      FROM sh0, unnest(generate_series(0, 7)) AS t(b)
      GROUP BY id, b
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig AND a.id < b.id
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM exact)      AS n_exact,
           (SELECT CAST(count(*) AS BIGINT) FROM cand)       AS n_candidates,
           (SELECT CAST(count(*) AS BIGINT)
            FROM exact e JOIN cand c
              ON e.id_a = c.id_a AND e.id_b = c.id_b)        AS n_matched
    """,
    "LSH self-evaluation — candidate recall of the scale path (q15's "
    "8-band MinHash bucketing) against the exact quadratic baseline "
    "(q14's capped-shingle Jaccard >= 0.1) on the same corpus slice: "
    "(n_exact, n_candidates, n_matched) where recall = matched/exact "
    "and matched/candidates is the verify-stage yield. This is the "
    "query a pipeline owner runs on a sample BEFORE committing band/"
    "row parameters to a 100 TB dedup pass; all heavy joins are the "
    "operators' own plans (capped pair join, band bucket join), the "
    "three counts reduce to one row",
)
def q104_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sh feeds BOTH the exact-Jaccard path and the minhash signature
    # path, and exact/cand each feed two consumers (their count agg +
    # the semi-join) — checkpoint each once so the shingle explode and
    # the pair joins aren't recomputed per consumer (q15's discipline;
    # collapses the plan from ~61 Exchanges to a handful)
    sh = char_shingles(
        _de_docs(spark, sf_dir), "doc_id", "t", 8, by_id=True
    ).localCheckpoint(eager=False)
    exact = (
        jaccard_pairs(sh, min_jaccard=0.1, max_doc_freq=HOT_SHINGLE_DF_CAP)
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    cand = minhash_lsh_candidates(minhash_band_signatures(sh, 8)).localCheckpoint(eager=False)
    matched = exact.join(cand, ["id_a", "id_b"], "left_semi")
    return (
        exact.agg(F.count("*").alias("n_exact"))
        .crossJoin(cand.agg(F.count("*").alias("n_candidates")))
        .crossJoin(matched.agg(F.count("*").alias("n_matched")))
    )


@_q(
    "q105_snapshot_delta",
    """
    WITH snap_a AS (
      SELECT 'h' || CAST(doc_id % 9 AS VARCHAR) AS host,
             'https://h' || CAST(doc_id % 9 AS VARCHAR) || '.example/p/'
               || CAST(doc_id AS VARCHAR) AS url,
             md5(text) AS digest
      FROM documents WHERE doc_id % 7 <> 0
    ),
    snap_b AS (
      SELECT 'h' || CAST(doc_id % 9 AS VARCHAR) AS host,
             'https://h' || CAST(doc_id % 9 AS VARCHAR) || '.example/p/'
               || CAST(doc_id AS VARCHAR) AS url,
             CASE WHEN doc_id % 5 = 0 THEN md5(text || '!') ELSE md5(text) END
               AS digest
      FROM documents WHERE doc_id % 11 <> 0
    ),
    j AS (
      SELECT coalesce(a.host, b.host) AS host,
             CASE
               WHEN a.url IS NULL THEN 'added'
               WHEN b.url IS NULL THEN 'removed'
               WHEN a.digest <> b.digest THEN 'changed'
               ELSE 'unchanged'
             END AS verdict
      FROM snap_a a FULL OUTER JOIN snap_b b ON a.url = b.url
    )
    SELECT host,
           CAST(sum(CASE WHEN verdict = 'added'     THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
           CAST(sum(CASE WHEN verdict = 'removed'   THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           CAST(sum(CASE WHEN verdict = 'changed'   THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
           CAST(sum(CASE WHEN verdict = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
    FROM j
    GROUP BY host
    """,
    "crawl snapshot delta — the recrawl-diff a scheduler consumes "
    "(and the CDX-digest consumer: both sides are INDEX rows — url + "
    "content digest — never page bodies): full outer join of two "
    "capture sets on url classifies added/removed/changed/unchanged, "
    "then a per-host partial agg. At 100 TB both inputs are the "
    "sorted CDX indexes, so the join is a merge of co-sorted shards; "
    "here the two snapshots are synthesized deterministically from "
    "documents (B drops doc_id%11, A drops %7, B perturbs %5 digests)",
)
def q105_snapshot_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    host = F.concat(F.lit("h"), (did % 9).cast("string"))
    url = F.concat(
        F.lit("https://h"), (did % 9).cast("string"),
        F.lit(".example/p/"), did.cast("string"),
    )
    a = d.filter(did % 7 != 0).select(
        host.alias("host_a"), url.alias("url"), F.md5("text").alias("digest_a")
    )
    b = d.filter(did % 11 != 0).select(
        host.alias("host_b"),
        url.alias("url"),
        F.when(did % 5 == 0, F.md5(F.concat(F.col("text"), F.lit("!"))))
        .otherwise(F.md5("text"))
        .alias("digest_b"),
    )
    j = a.join(b, "url", "full_outer").select(
        F.coalesce("host_a", "host_b").alias("host"),
        F.when(F.col("digest_a").isNull(), "added")
        .when(F.col("digest_b").isNull(), "removed")
        .when(F.col("digest_a") != F.col("digest_b"), "changed")
        .otherwise("unchanged")
        .alias("verdict"),
    )
    return j.groupBy("host").agg(
        F.sum(F.when(F.col("verdict") == "added", 1).otherwise(0)).alias("n_added"),
        F.sum(F.when(F.col("verdict") == "removed", 1).otherwise(0)).alias("n_removed"),
        F.sum(F.when(F.col("verdict") == "changed", 1).otherwise(0)).alias("n_changed"),
        F.sum(F.when(F.col("verdict") == "unchanged", 1).otherwise(0)).alias("n_unchanged"),
    )


@_q(
    "q106_template_cluster",
    """
    WITH pages AS (
      SELECT doc_id,
             '<html><body>' ||
             CASE WHEN doc_id % 3 = 0
                  THEN '<nav><ul><li><a></a></li></ul></nav><article><h1></h1><p></p><p></p></article><footer></footer>'
                  WHEN doc_id % 3 = 1
                  THEN '<header><h1></h1></header><table><tr><td></td><td></td></tr></table><footer></footer>'
                  ELSE '<div><div><img></div><p></p></div><aside><a></a></aside>'
             END ||
             CASE WHEN doc_id % 7 = 0 THEN '<script></script>' ELSE '' END ||
             '</body></html>' AS html
      FROM documents
    ),
    tags AS (
      SELECT doc_id,
             list_transform(regexp_extract_all(html, '<([a-z0-9]+)', 1), t -> t)
               AS tag_seq
      FROM pages
    ),
    sh AS (
      SELECT DISTINCT doc_id AS id,
             array_to_string(list_slice(tag_seq, u.i, u.i + 3), '>') AS shingle
      FROM tags, unnest(generate_series(1, greatest(len(tag_seq) - 3, 1))) AS u(i)
    ),
    sig AS (
      SELECT id, b AS band,
             min(md5(CAST(b AS VARCHAR) || '|' || shingle)) AS sig
      FROM sh, unnest(generate_series(0, 3)) AS t(b)
      GROUP BY id, b
    ),
    keys AS (
      SELECT id, array_to_string(list(sig ORDER BY band), '|') AS template_key
      FROM sig GROUP BY id
    )
    SELECT template_key,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(id) AS BIGINT) AS exemplar_id
    FROM keys
    GROUP BY template_key
    """,
    "DOM-structure template clustering — near-dup by LAYOUT, not "
    "text: the tag-name sequence (markup parsed JVM-side with "
    "regexp_extract_all) is shingled into 4-tag structural n-grams, "
    "MinHash-banded (4 bands, the q15 machinery applied to structure "
    "tokens), and docs sharing the full band signature collapse into "
    "one template cluster. This is the reference's layout-analysis "
    "axis turned into a curation operator: site templates cluster "
    "across HOSTS (same skeleton, different text), feeding q85's "
    "strip stage or a diversity sampler. Vocab-bounded: the group key "
    "is a fixed-width signature, the agg is one partial-agg shuffle. "
    "Fixture markup derives 3 template families (+a script variant) "
    "from doc_id in closed form",
)
def q106_template_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    body = (
        F.when(
            did % 3 == 0,
            F.lit("<nav><ul><li><a></a></li></ul></nav><article><h1></h1><p></p><p></p></article><footer></footer>"),
        )
        .when(
            did % 3 == 1,
            F.lit("<header><h1></h1></header><table><tr><td></td><td></td></tr></table><footer></footer>"),
        )
        .otherwise(F.lit("<div><div><img></div><p></p></div><aside><a></a></aside>"))
    )
    html = F.concat(
        F.lit("<html><body>"),
        body,
        F.when(did % 7 == 0, F.lit("<script></script>")).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    tags = d.select(
        "doc_id",
        F.regexp_extract_all(html.alias("h"), F.lit("<([a-z0-9]+)"), 1).alias("tag_seq"),
    )
    sh = tags.select(
        F.col("doc_id").alias("id"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size("tag_seq") - 3, F.lit(1))),
                lambda i: F.array_join(F.slice("tag_seq", i, 4), ">"),
            )
        ).alias("shingle"),
    ).distinct()
    bands = sh.select(
        "id",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
        "shingle",
    )
    sig = bands.groupBy("id", "band").agg(
        F.min(
            F.md5(F.concat(F.col("band").cast("string"), F.lit("|"), F.col("shingle")))
        ).alias("sig")
    )
    keys = sig.groupBy("id").agg(
        F.array_join(F.array_sort(F.collect_list(F.struct("band", "sig"))).getField("sig"), "|").alias(
            "template_key"
        )
    )
    return keys.groupBy("template_key").agg(
        F.count("*").alias("n_docs"),
        F.min("id").alias("exemplar_id"),
    )


# ---------------------------------------------------------------------------
# image perceptual-hash dedup (multimodal near-dup over real pixels)

_DHASH_CELLS_SQL = """
    plan AS (
      SELECT doc_id,
             doc_id % 40 AS g,
             1 + (doc_id % 40) % 3 AS cw,
             1 + (doc_id % 40) % 2 AS ch,
             ((doc_id // 40) % 8) * 5 AS bright,
             doc_id % 5 = 4 AS pert
      FROM documents WHERE doc_id < 160
    ),
    cells AS (
      SELECT doc_id, cw, ch, u.j AS cx, v.j AS cy,
             (g * 7 + u.j * 13 + v.j * 29
               + ((g + 1) * (u.j + 1) * (v.j + 3)) % 97) % 180 + bright
               + CASE WHEN pert AND u.j = 0 AND v.j = 0 THEN 40 ELSE 0 END AS val
      FROM plan,
           unnest(generate_series(0, 7)) AS u(j),
           unnest(generate_series(0, 7)) AS v(j)
    ),
    bits AS (
      SELECT a.doc_id, a.cy * 7 + a.cx AS j,
             CASE WHEN b.val > a.val THEN 1 ELSE 0 END AS bit
      FROM cells a
      JOIN cells b ON b.doc_id = a.doc_id AND b.cy = a.cy AND b.cx = a.cx + 1
      WHERE a.cx < 7
    ),
    h AS (
      SELECT p.doc_id AS media_id,
             CAST(8 * p.cw AS INTEGER) AS width,
             CAST(8 * p.ch AS INTEGER) AS height,
             CAST(sum(CASE WHEN j // 14 = 0 THEN bit << (j % 14) ELSE 0 END) AS BIGINT) AS c0,
             CAST(sum(CASE WHEN j // 14 = 1 THEN bit << (j % 14) ELSE 0 END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN j // 14 = 2 THEN bit << (j % 14) ELSE 0 END) AS BIGINT) AS c2,
             CAST(sum(CASE WHEN j // 14 = 3 THEN bit << (j % 14) ELSE 0 END) AS BIGINT) AS c3
      FROM plan p JOIN bits ON bits.doc_id = p.doc_id
      GROUP BY p.doc_id, p.cw, p.ch
    )
"""


@_q(
    "q107_image_dhash",
    f"""
    WITH {_DHASH_CELLS_SQL}
    SELECT media_id, width, height, c0, c1, c2, c3 FROM h
    """,
    "Perceptual difference-hash over GENUINELY decoded PNG pixels: "
    "synth_dhash_png writes real grayscale PNGs whose scanline filters "
    "cycle through all five PNG filter types, image_dhash decodes them "
    "with the new pure-stdlib unfilter (Sub/Up/Average/Paeth) and "
    "computes the 56-bit dHash (8x8 cell grid, integer cross-multiplied "
    "brightness comparisons) as four 14-bit band chunks. The oracle "
    "regenerates every cell value in closed form — a green row proves "
    "chunk walk + inflate + unfilter + box average + bit packing. "
    "Map-only mapInArrow stage, no shuffle. multimodal.image_dhash, "
    "toyocr_spark/pngcodec.py; reference decodes image bytes to pixel "
    "arrays the same way (data/dataset_mapper.py:151-155).",
)
def q107_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.multimodal import image_dhash, synth_dhash_png

    media = synth_dhash_png(_t(spark, sf_dir, "documents"), n_docs=160)
    return image_dhash(media)


@_q(
    "q108_image_neardup",
    f"""
    WITH {_DHASH_CELLS_SQL},
    bands AS (
      SELECT media_id, 0 AS band, c0 AS bucket FROM h
      UNION ALL SELECT media_id, 1, c1 FROM h
      UNION ALL SELECT media_id, 2, c2 FROM h
      UNION ALL SELECT media_id, 3, c3 FROM h
    ),
    cand AS (
      SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
                   AND a.media_id < b.media_id
    ),
    scored AS (
      SELECT c.id_a, c.id_b,
             CAST(bit_count(xor(ha.c0, hb.c0)) + bit_count(xor(ha.c1, hb.c1))
                + bit_count(xor(ha.c2, hb.c2)) + bit_count(xor(ha.c3, hb.c3))
               AS INTEGER) AS hamming
      FROM cand c
      JOIN h ha ON ha.media_id = c.id_a
      JOIN h hb ON hb.media_id = c.id_b
    )
    SELECT id_a, id_b, hamming FROM scored WHERE hamming <= 3
    """,
    "Image near-dup pairing: the dHash chunks ARE the LSH bands, so "
    "dedup.simhash64_pairs runs unchanged over image hashes (band "
    "equi-join proposes candidates — pigeonhole-complete for hamming "
    "<= 3 of 56 — exact bit_count-xor hamming verifies). Same-group "
    "fixtures differ only by global brightness (hash-invariant, "
    "hamming 0) or one perturbed corner cell (hamming <= 1), so the "
    "pairs recover the planted duplicate groups. Scale shape: shuffle "
    "keys on (band, 14-bit bucket), never on pixel data or pairs — "
    "the LAION-style image-dedup path. dedup.simhash64_pairs, "
    "multimodal.image_dhash.",
)
def q108_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.multimodal import image_dhash, synth_dhash_png
    from toyocr_spark.operators.dedup import simhash64_pairs

    media = synth_dhash_png(_t(spark, sf_dir, "documents"), n_docs=160)
    sim = (
        image_dhash(media)
        .withColumnRenamed("media_id", "id")
        .select("id", "c0", "c1", "c2", "c3")
    )
    return simhash64_pairs(sim, max_hamming=3)


_AFP_HASH_SQL = """
    plan AS (
      SELECT doc_id,
             doc_id % 30 AS g,
             1 + (doc_id // 30) % 4 AS m,
             doc_id % 7 = 6 AS pert
      FROM documents WHERE doc_id < 150
    ),
    samples AS (
      SELECT doc_id, u.j // 8 AS f,
             (((g * 13 + (u.j * u.j) % 97) % 201) - 100
               + CASE WHEN pert AND u.j < 8 THEN 50 ELSE 0 END) * m AS s
      FROM plan, unnest(generate_series(0, 455)) AS u(j)
    ),
    frames AS (
      SELECT doc_id, f, sum(s * s) AS e
      FROM samples GROUP BY doc_id, f
    ),
    bits AS (
      SELECT a.doc_id, a.f AS j,
             CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
      FROM frames a JOIN frames b ON b.doc_id = a.doc_id AND b.f = a.f + 1
      WHERE a.f < 56
    ),
    h AS (
      SELECT doc_id AS media_id,
             CAST(57 AS INTEGER) AS n_frames,
             CAST(sum(CASE WHEN j // 14 = 0 THEN bit << (j % 14) ELSE 0 END) AS BIGINT) AS c0,
             CAST(sum(CASE WHEN j // 14 = 1 THEN bit << (j % 14) ELSE 0 END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN j // 14 = 2 THEN bit << (j % 14) ELSE 0 END) AS BIGINT) AS c2,
             CAST(sum(CASE WHEN j // 14 = 3 THEN bit << (j % 14) ELSE 0 END) AS BIGINT) AS c3
      FROM bits GROUP BY doc_id
    )
"""


@_q(
    "q109_audio_fingerprint",
    f"""
    WITH {_AFP_HASH_SQL}
    SELECT media_id, n_frames, c0, c1, c2, c3 FROM h
    """,
    "Energy-contour audio fingerprint over GENUINELY decoded WAV PCM: "
    "bit f = integer sum-of-squares energy of frame f+1 exceeds frame "
    "f, 56 comparisons packed as four 14-bit band chunks (the "
    "image_dhash/simhash64 layout). Amplitude-invariant by "
    "construction — same-group fixtures differ only by an integer "
    "gain, so their energies scale by m^2 and every comparison is "
    "preserved; the oracle regenerates all 456 samples per doc in "
    "closed form. Map-only mapInArrow, no shuffle. "
    "multimodal.audio_fingerprint / synth_fp_wav.",
)
def q109_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.multimodal import audio_fingerprint, synth_fp_wav

    media = synth_fp_wav(_t(spark, sf_dir, "documents"), n_docs=150)
    return audio_fingerprint(media)


@_q(
    "q110_audio_neardup",
    f"""
    WITH {_AFP_HASH_SQL},
    bands AS (
      SELECT media_id, 0 AS band, c0 AS bucket FROM h
      UNION ALL SELECT media_id, 1, c1 FROM h
      UNION ALL SELECT media_id, 2, c2 FROM h
      UNION ALL SELECT media_id, 3, c3 FROM h
    ),
    cand AS (
      SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
                   AND a.media_id < b.media_id
    ),
    scored AS (
      SELECT c.id_a, c.id_b,
             CAST(bit_count(xor(ha.c0, hb.c0)) + bit_count(xor(ha.c1, hb.c1))
                + bit_count(xor(ha.c2, hb.c2)) + bit_count(xor(ha.c3, hb.c3))
               AS INTEGER) AS hamming
      FROM cand c
      JOIN h ha ON ha.media_id = c.id_a
      JOIN h hb ON hb.media_id = c.id_b
    )
    SELECT id_a, id_b, hamming FROM scored WHERE hamming <= 3
    """,
    "Audio near-dup pairing: dedup.simhash64_pairs over audio "
    "fingerprints — the third consumer of the chunked-band layout "
    "(text simhash, image dHash, now audio), one pairing operator "
    "across all three modalities. Same-group fixtures (same signal, "
    "different gain, or one perturbed frame) surface at hamming <= 1. "
    "Scale shape: band equi-join on (band, 14-bit bucket), exact "
    "bit_count verify on candidates only — never all-pairs, never "
    "PCM bytes through a shuffle.",
)
def q110_audio_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.multimodal import audio_fingerprint, synth_fp_wav
    from toyocr_spark.operators.dedup import simhash64_pairs

    media = synth_fp_wav(_t(spark, sf_dir, "documents"), n_docs=150)
    sim = (
        audio_fingerprint(media)
        .withColumnRenamed("media_id", "id")
        .select("id", "c0", "c1", "c2", "c3")
    )
    return simhash64_pairs(sim, max_hamming=3)


@_q(
    "q111_caption_pairs",
    f"""
    WITH {_DHASH_CELLS_SQL},
    docs AS (
      SELECT doc_id, string_split(text, ' ') AS w
      FROM documents WHERE doc_id < 200
    ),
    pairs AS (
      SELECT doc_id,
             (doc_id * 3 + u.i) % 160 AS media_id,
             array_to_string(w[u.i * 2 + 1 : u.i * 2 + 2], ' ') AS alt
      FROM docs, unnest(generate_series(0, doc_id % 3)) AS u(i)
    ),
    agg AS (
      SELECT media_id,
             CAST(count(*) AS BIGINT) AS n_captions,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(min(doc_id) AS BIGINT) AS first_doc,
             CAST(sum(length(alt)) AS BIGINT) AS alt_mass
      FROM pairs GROUP BY media_id
    )
    SELECT a.media_id, a.n_captions, a.n_docs, a.first_doc, a.alt_mass,
           h.c0, h.c1, h.c2, h.c3
    FROM agg a JOIN h ON h.media_id = a.media_id
    """,
    "LAION-style caption<->image pair mining, cross-modal and fully "
    "oracle-checked: build per-doc <figure><img src alt> markup with "
    "JVM HOFs, parse it BACK with regexp_extract_all (the extraction "
    "under test — the oracle computes expected pairs directly from "
    "the closed form, so a parse slip mismatches), aggregate captions "
    "per image, then join against image_dhash over genuinely decoded "
    "PNG pixels so every output row carries the image's perceptual "
    "hash. Scale shape: caption extraction is map-only, one "
    "partial-agg shuffle on media_id, and the 160-row hash side "
    "broadcasts — at corpus scale the img-src join key is the "
    "url-hash and the hash table is the (much smaller) image index.",
)
def q111_caption_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.multimodal import image_dhash, synth_dhash_png

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    w = F.split(F.col("text"), " ")
    fig = lambda i: F.concat(  # noqa: E731
        F.lit('<figure><img src="img/'),
        F.pmod(F.col("doc_id") * 3 + i, F.lit(160)).cast("string"),
        F.lit('.png" alt="'),
        F.array_join(F.slice(w, i * 2 + 1, 2), " "),
        F.lit('"><figcaption>fig</figcaption></figure>'),
    )
    html = F.aggregate(
        F.transform(F.sequence(F.lit(0), F.pmod(F.col("doc_id"), F.lit(3))), fig),
        F.lit(""),
        lambda acc, x: F.concat(acc, x),
    )
    docs = d.select("doc_id", html.alias("html"))
    srcs = F.regexp_extract_all(F.col("html"), F.lit('<img src="img/(\\d+)\\.png"'), 1)
    alts = F.regexp_extract_all(F.col("html"), F.lit('alt="([^"]*)"'), 1)
    pairs = (
        docs.select("doc_id", F.explode(F.arrays_zip(srcs, alts)).alias("p"))
        .select(
            "doc_id",
            F.col("p.0").cast("long").alias("media_id"),
            F.col("p.1").alias("alt"),
        )
    )
    agg = pairs.groupBy("media_id").agg(
        F.count("*").alias("n_captions"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
        F.sum(F.length("alt")).alias("alt_mass"),
    )
    hashes = image_dhash(synth_dhash_png(_t(spark, sf_dir, "documents"), n_docs=160))
    return agg.join(
        F.broadcast(hashes.select("media_id", "c0", "c1", "c2", "c3")), "media_id"
    ).select(
        "media_id", "n_captions", "n_docs", "first_doc", "alt_mass",
        "c0", "c1", "c2", "c3",
    )


@_q(
    "q112_neardup_admission",
    f"""
    WITH {_DHASH_CELLS_SQL},
    bands AS (
      SELECT media_id, 0 AS band, c0 AS bucket FROM h
      UNION ALL SELECT media_id, 1, c1 FROM h
      UNION ALL SELECT media_id, 2, c2 FROM h
      UNION ALL SELECT media_id, 3, c3 FROM h
    ),
    cand AS (
      SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
                   AND a.media_id < b.media_id
    ),
    dropped AS (
      SELECT DISTINCT c.id_b
      FROM cand c
      JOIN h ha ON ha.media_id = c.id_a
      JOIN h hb ON hb.media_id = c.id_b
      WHERE bit_count(xor(ha.c0, hb.c0)) + bit_count(xor(ha.c1, hb.c1))
          + bit_count(xor(ha.c2, hb.c2)) + bit_count(xor(ha.c3, hb.c3)) <= 3
    )
    SELECT media_id AS id, c0, c1, c2, c3
    FROM h
    WHERE NOT EXISTS (SELECT 1 FROM dropped d WHERE d.id_b = h.media_id)
    """,
    "Greedy-by-id near-dup ADMISSION (dedup.neardup_survivors): a row "
    "survives iff no smaller-id row lies within hamming 3 — the "
    "monotone admission rule (a row's fate depends only on earlier "
    "rows, never on their fate), so it parallelizes as banded pairs + "
    "one anti-join instead of a sequential greedy scan. Run here over "
    "the image dHash family: each planted duplicate group collapses "
    "to its smallest id. The streaming twin (stream_neardup) applies "
    "the same rule in arrival order with the hash log as state.",
)
def q112_neardup_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.multimodal import image_dhash, synth_dhash_png
    from toyocr_spark.operators.dedup import neardup_survivors

    media = synth_dhash_png(_t(spark, sf_dir, "documents"), n_docs=160)
    sim = (
        image_dhash(media)
        .withColumnRenamed("media_id", "id")
        .select("id", "c0", "c1", "c2", "c3")
    )
    return neardup_survivors(sim, max_hamming=3)


@_q(
    "q113_media_metadata",
    """
    SELECT doc_id AS media_id, 'png' AS fmt, 'Title' AS meta_key,
           'title-' || doc_id AS meta_value
    FROM documents WHERE doc_id < 180 AND doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, 'png', 'Author', 'site-' || (doc_id % 7)
    FROM documents WHERE doc_id < 180 AND doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, 'jpeg', 'comment',
           'caption-' || doc_id || '-' || (doc_id % 13)
    FROM documents WHERE doc_id < 180 AND doc_id % 3 = 1
    UNION ALL
    SELECT doc_id, 'jpeg', 'exif:Orientation', CAST(1 + doc_id % 8 AS VARCHAR)
    FROM documents WHERE doc_id < 180 AND doc_id % 3 = 1
    UNION ALL
    SELECT doc_id, 'jpeg', 'exif:Make', 'cam-' || (doc_id % 5)
    FROM documents WHERE doc_id < 180 AND doc_id % 3 = 1
    UNION ALL
    SELECT doc_id, 'svg', 'title', 'svg-' || doc_id
    FROM documents WHERE doc_id < 180 AND doc_id % 3 = 2
    UNION ALL
    SELECT doc_id, 'svg', 'desc', 'd' || (doc_id % 11)
    FROM documents WHERE doc_id < 180 AND doc_id % 3 = 2
    """,
    "Image metadata harvest: PNG tEXt chunks (Title/Author/...), JPEG "
    "COM caption segments, AND real TIFF-structured EXIF IFD0 entries "
    "(Orientation/Make — both II and MM byte orders live in the "
    "fixtures) mined by a chunk/marker walk only — no inflate, no "
    "Huffman: the alt-text/orientation/copyright harvest over "
    "petabytes of images must not pay the pixel cost. The oracle "
    "states every expected string in closed form, so a green row "
    "proves the walk finds exactly the planted metadata and nothing "
    "else. Map-only mapInArrow stage. multimodal.media_metadata, "
    "pngcodec.text_chunks, jpegcodec.jpeg_comments/exif_entries.",
)
def q113_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.multimodal import media_metadata, synth_meta_media

    media = synth_meta_media(_t(spark, sf_dir, "documents"), n_docs=180)
    return media_metadata(media)


@_q(
    "q114_bitext_candidates",
    """
    WITH fam AS (
      SELECT doc_id, lang, doc_id % 80 AS f,
             'https://s' || (doc_id % 80) % 7 || '.example/' || lang
               || '/' || doc_id AS url
      FROM documents WHERE doc_id < 240
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           a.lang AS lang_a, b.lang AS lang_b
    FROM fam a JOIN fam b ON a.f = b.f AND a.doc_id < b.doc_id
    """,
    "CCMatrix-style bitext candidate mining: every page declares its "
    "translations via <link rel=alternate hreflang href> tags (built "
    "JVM-side, three-doc families sharing doc_id % 80), the miner "
    "regexp-parses the alternates back out, resolves each href to its "
    "target document by url equi-join, and keeps mutual pairs as "
    "undirected (id_a < id_b) candidates with both languages attached "
    "— the page-level pairing that precedes sentence alignment in a "
    "parallel-corpus pipeline. The oracle derives the expected pairs "
    "from the family closed form, so any parse or join slip "
    "mismatches. Scale shape: map-only parse, one url equi-join "
    "(both sides partition on the url hash), distinct on the pair — "
    "no cross joins, no language table scans.",
)
def q114_bitext_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 240)
    fam = F.pmod(F.col("doc_id"), F.lit(80))
    url = F.concat(
        F.lit("https://s"),
        F.pmod(fam, F.lit(7)).cast("string"),
        F.lit(".example/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
    )
    base = d.select("doc_id", "lang", fam.alias("f"), url.alias("url"))
    # each page links its two family siblings as hreflang alternates
    sib = base.alias("s").join(
        base.alias("o"),
        (F.col("s.f") == F.col("o.f")) & (F.col("s.doc_id") != F.col("o.doc_id")),
    ).select(
        F.col("s.doc_id").alias("doc_id"),
        F.col("s.url").alias("url"),
        F.concat(
            F.lit('<link rel="alternate" hreflang="'),
            F.col("o.lang"),
            F.lit('" href="'),
            F.col("o.url"),
            F.lit('">'),
        ).alias("tag"),
    )
    pages = sib.groupBy("doc_id", "url").agg(
        F.concat_ws("", F.array_sort(F.collect_list("tag"))).alias("head")
    )
    alts = pages.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(
                F.col("head"), F.lit('href="([^"]+)"'), 1
            )
        ).alias("alt_url"),
    )
    resolved = alts.join(
        base.select(F.col("url").alias("alt_url"), F.col("doc_id").alias("alt_id")),
        "alt_url",
    )
    pairs = resolved.select(
        F.least("doc_id", "alt_id").alias("id_a"),
        F.greatest("doc_id", "alt_id").alias("id_b"),
    ).distinct()
    langs = base.select("doc_id", "lang")
    return (
        pairs.join(langs.select(F.col("doc_id").alias("id_a"), F.col("lang").alias("lang_a")), "id_a")
        .join(langs.select(F.col("doc_id").alias("id_b"), F.col("lang").alias("lang_b")), "id_b")
        .select("id_a", "id_b", "lang_a", "lang_b")
    )


@_q(
    "q115_table_types",
    """
    WITH tables AS (
      SELECT doc_id, u.k AS tbl,
             2 + (doc_id + u.k) % 3 AS n_cols,
             3 + (doc_id + u.k) % 4 AS n_rows
      FROM documents, unnest(generate_series(0, doc_id % 2)) AS u(k)
      WHERE doc_id < 150
    ),
    cols AS (
      SELECT doc_id, tbl, n_rows, v.c AS col,
             (doc_id + tbl + v.c) % 3 AS tcode
      FROM tables, unnest(generate_series(0, n_cols - 1)) AS v(c)
    ),
    cells AS (
      SELECT doc_id, tbl, col, tcode, w.r AS r
      FROM cols, unnest(generate_series(0, n_rows - 1)) AS w(r)
    )
    SELECT doc_id, tbl, col,
           CASE tcode WHEN 0 THEN 'int' WHEN 1 THEN 'float' ELSE 'string' END
             AS inferred_type,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(CASE WHEN tcode = 0 THEN r * 7 + col + doc_id ELSE 0 END)
             AS BIGINT) AS int_mass
    FROM cells
    GROUP BY doc_id, tbl, col, tcode
    """,
    "Web-table column TYPE INFERENCE (the WDC-web-tables extraction "
    "axis): per-doc <table> markup is built with nested JVM HOFs "
    "(columns typed int / float / string by a closed-form rule), the "
    "miner regexp-parses tables -> rows -> cells back out and infers "
    "each column's type from its cells (all-int => int, else "
    "all-numeric => float, else string) plus the integer mass of int "
    "columns. The oracle derives expected types and masses from the "
    "closed form without parsing, so any parse or inference slip "
    "mismatches. Scale shape: map-only parse + one partial-agg "
    "shuffle on (doc, table, col); type tests are rlike column "
    "expressions, no Python.",
)
def q115_table_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    tbl = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.pmod(F.col("doc_id"), F.lit(2)))).alias("tbl"),
    ).select(
        "doc_id",
        "tbl",
        (F.lit(2) + F.pmod(F.col("doc_id") + F.col("tbl"), F.lit(3))).alias("n_cols"),
        (F.lit(3) + F.pmod(F.col("doc_id") + F.col("tbl"), F.lit(4))).alias("n_rows"),
    )
    # build real <table> markup: cell content typed by (doc+tbl+col) % 3
    cell = lambda r, c: F.concat(  # noqa: E731
        F.lit("<td>"),
        F.when(
            F.pmod(F.col("doc_id") + F.col("tbl") + c, F.lit(3)) == 0,
            (r * 7 + c + F.col("doc_id")).cast("string"),
        )
        .when(
            F.pmod(F.col("doc_id") + F.col("tbl") + c, F.lit(3)) == 1,
            F.concat((r * 7 + c).cast("string"), F.lit("."), F.pmod(r + c, F.lit(10)).cast("string")),
        )
        .otherwise(F.concat(F.lit("w"), (r + c).cast("string"))),
        F.lit("</td>"),
    )
    row = lambda r: F.concat(  # noqa: E731
        F.lit("<tr>"),
        F.aggregate(
            F.transform(F.sequence(F.lit(0), F.col("n_cols") - 1), lambda c: cell(r, c)),
            F.lit(""),
            lambda acc, x: F.concat(acc, x),
        ),
        F.lit("</tr>"),
    )
    markup = F.concat(
        F.lit("<table>"),
        F.aggregate(
            F.transform(F.sequence(F.lit(0), F.col("n_rows") - 1), row),
            F.lit(""),
            lambda acc, x: F.concat(acc, x),
        ),
        F.lit("</table>"),
    )
    built = tbl.select("doc_id", "tbl", markup.alias("markup"))
    # parse it back: rows, then cells with positions
    rows = built.select(
        "doc_id",
        "tbl",
        F.posexplode(
            F.regexp_extract_all(F.col("markup"), F.lit("<tr>(.*?)</tr>"), 1)
        ).alias("r", "row_html"),
    )
    cells = rows.select(
        "doc_id",
        "tbl",
        "r",
        F.posexplode(
            F.regexp_extract_all(F.col("row_html"), F.lit("<td>(.*?)</td>"), 1)
        ).alias("col", "cell"),
    )
    typed = cells.select(
        "doc_id",
        "tbl",
        "col",
        "cell",
        F.col("cell").rlike("^[0-9]+$").cast("int").alias("is_int"),
        F.col("cell").rlike("^[0-9]+(\\.[0-9]+)?$").cast("int").alias("is_num"),
    )
    return typed.groupBy("doc_id", "tbl", "col").agg(
        F.when(F.min("is_int") == 1, F.lit("int"))
        .when(F.min("is_num") == 1, F.lit("float"))
        .otherwise(F.lit("string"))
        .alias("inferred_type"),
        F.count("*").alias("n_cells"),
        F.sum(
            F.when(F.col("is_int") == 1, F.col("cell").cast("long")).otherwise(F.lit(0))
        ).alias("int_mass"),
    )


@_q(
    "q116_sentence_align",
    """
    WITH p AS (
      SELECT doc_id AS id_a, doc_id + 80 AS id_b, doc_id % 4 AS fam,
             CASE WHEN doc_id % 4 = 0 THEN 5 + doc_id % 7
                  WHEN doc_id % 4 = 3 THEN 7 + doc_id % 3
                  ELSE 3 + doc_id % 5 END AS nb
      FROM documents WHERE doc_id < 80
    ),
    b AS (
      SELECT id_a, id_b, fam, u.j AS j
      FROM p, unnest(generate_series(0, nb - 1)) AS u(j)
    )
    SELECT CAST(id_a AS BIGINT) AS id_a,
           CAST(id_b AS BIGINT) AS id_b,
           CAST(CASE WHEN fam = 1 THEN 2 * j
                     WHEN fam = 3 AND j > 3 THEN j + 1
                     ELSE j END AS INTEGER) AS a_start,
           CAST(CASE WHEN fam = 1 OR (fam = 3 AND j = 3) THEN 2
                     ELSE 1 END AS INTEGER) AS a_len,
           CAST(CASE WHEN fam = 2 THEN 2 * j
                     WHEN fam = 3 AND j > 3 THEN j + 1
                     ELSE j END AS INTEGER) AS b_start,
           CAST(CASE WHEN fam = 2 OR (fam = 3 AND j = 3) THEN 2
                     ELSE 1 END AS INTEGER) AS b_len,
           CAST(CASE WHEN fam = 0 THEN 0
                     WHEN fam = 3 THEN CASE WHEN j = 3 THEN 44000 ELSE 0 END
                     ELSE 23000 END AS BIGINT) AS cost_centi
    FROM b
    """,
    "Gale-Church sentence alignment over PLANTED bitext families "
    "(operators/bitext.py): the published length-based DP (penalties "
    "0/450/230/440, -100*log two-tailed normal match cost) aligns each "
    "pair's sentence-length sequences into 1-1/2-1/1-2/2-2 beads. The "
    "fixture plants sequences whose unique optimum has a CLOSED FORM "
    "(the q99-BPE oracle discipline): fam 0 = equal lengths -> all-1-1 "
    "at cost 0; fam 1/2 = exact pairwise merges -> all-2-1/1-2 at "
    "penalty-only cost 23000 centi (delta = 0 -> erfc(0) = 1 -> match "
    "cost exactly 0); fam 3 = one (small,large)<->(large,small) swap "
    "pinned between equal anchor runs -> a single 2-2 at 44000. The "
    "oracle emits the planted expectations without re-implementing "
    "the DP (no erfc needed); optimality of every planted pair vs the "
    "pure-Python DP is pytest-locked (tests/test_operators.py). "
    "Sequential within a pair, embarrassingly parallel across pairs: "
    "one mapInArrow kernel, ZERO shuffle (plan-tested).",
)
def q116_sentence_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.operators.bitext import gale_church_beads

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 80)
    did = F.col("doc_id")
    fam = F.pmod(did, F.lit(4))
    seq = lambda n: F.sequence(F.lit(0), n - F.lit(1))  # noqa: E731
    anchor = lambda i: F.lit(20) + F.pmod(did * 7 + i * 13, F.lit(40))  # noqa: E731
    la1 = lambda i: F.lit(15) + F.pmod(did * 5 + i * 11, F.lit(30))  # noqa: E731
    lb2 = lambda i: F.lit(15) + F.pmod(did * 3 + i * 7, F.lit(30))  # noqa: E731
    m = F.lit(3) + F.pmod(did, F.lit(5))
    f0 = F.transform(seq(F.lit(5) + F.pmod(did, F.lit(7))), anchor)
    f1a = F.transform(seq(m * 2), la1)
    f1b = F.transform(seq(m), lambda j: la1(j * 2) + la1(j * 2 + 1))
    f2b = F.transform(seq(m * 2), lb2)
    f2a = F.transform(seq(m), lambda j: lb2(j * 2) + lb2(j * 2 + 1))
    p3 = F.lit(8) + F.pmod(did, F.lit(5))
    q3 = F.lit(70) + F.pmod(did, F.lit(9))
    pre = F.transform(seq(F.lit(3)), anchor)
    post = F.transform(seq(F.lit(3) + F.pmod(did, F.lit(3))), lambda i: anchor(i + 3))
    f3a = F.concat(pre, F.array(p3, q3), post)
    f3b = F.concat(pre, F.array(q3, p3), post)
    lens_a = (
        F.when(fam == 0, f0).when(fam == 1, f1a).when(fam == 2, f2a).otherwise(f3a)
    )
    lens_b = (
        F.when(fam == 0, f0).when(fam == 1, f1b).when(fam == 2, f2b).otherwise(f3b)
    )
    pairs = d.select(
        did.alias("id_a"),
        (did + 80).alias("id_b"),
        F.transform(lens_a, lambda x: x.cast("int")).alias("lens_a"),
        F.transform(lens_b, lambda x: x.cast("int")).alias("lens_b"),
    )
    return gale_church_beads(pairs)


@_q(
    "q117_microdata",
    """
    WITH items AS (
      SELECT doc_id, u.k AS item_idx,
             CASE WHEN (doc_id + u.k) % 2 = 0 THEN 'Product' ELSE 'Article' END AS item_type,
             string_split(text, ' ') AS w
      FROM documents, unnest(generate_series(0, doc_id % 2)) AS u(k)
      WHERE doc_id < 150
    )
    SELECT doc_id, item_idx, item_type, 'name' AS prop_key,
           CAST(length(array_to_string(w[item_idx * 2 + 1 : item_idx * 2 + 2], ' ')) AS BIGINT) AS prop_len
    FROM items
    UNION ALL
    SELECT doc_id, item_idx, item_type,
           CASE WHEN item_type = 'Product' THEN 'price' ELSE 'author' END,
           CAST(CASE WHEN item_type = 'Product'
                     THEN length(CAST(doc_id * 3 + item_idx AS VARCHAR)) + 3
                     ELSE length('a' || CAST((doc_id + item_idx) % 9 AS VARCHAR)) END AS BIGINT)
    FROM items
    """,
    "Schema.org MICRODATA extraction (the HTML-attribute twin of "
    "q98's JSON-LD): itemscope/itemtype blocks built JVM-side, split "
    "back per item, itemprop spans regexp-harvested per block — one "
    "scalar row per (doc, item, property) with the value length. "
    "Oracle derives every expected row from the closed form without "
    "parsing, so any scope-splitting or prop-extraction slip "
    "mismatches. Map-only: build + split + regexp are all Column "
    "expressions, zero shuffle.",
)
def q117_microdata(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    w = F.split(F.col("text"), " ")
    item = lambda k: F.concat(  # noqa: E731
        F.lit('<div itemscope itemtype="https://schema.org/'),
        F.when(F.pmod(F.col("doc_id") + k, F.lit(2)) == 0, F.lit("Product")).otherwise(
            F.lit("Article")
        ),
        F.lit('"><span itemprop="name">'),
        F.array_join(F.slice(w, k * 2 + 1, 2), " "),
        F.lit("</span>"),
        F.when(
            F.pmod(F.col("doc_id") + k, F.lit(2)) == 0,
            F.concat(
                F.lit('<span itemprop="price">'),
                (F.col("doc_id") * 3 + k).cast("string"),
                F.lit(".99</span>"),
            ),
        ).otherwise(
            F.concat(
                F.lit('<span itemprop="author">a'),
                F.pmod(F.col("doc_id") + k, F.lit(9)).cast("string"),
                F.lit("</span>"),
            )
        ),
        F.lit("</div>"),
    )
    html = F.aggregate(
        F.transform(F.sequence(F.lit(0), F.pmod(F.col("doc_id"), F.lit(2))), item),
        F.lit(""),
        lambda acc, x: F.concat(acc, x),
    )
    docs = d.select("doc_id", html.alias("html"))
    blocks = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(
                F.split(F.col("html"), F.lit("<div itemscope ")),
                lambda s: F.length(s) > 0,
            )
        ).alias("item_idx", "block"),
    )
    typed = blocks.select(
        "doc_id",
        "item_idx",
        F.regexp_extract(F.col("block"), 'itemtype="https://schema\\.org/([A-Za-z]+)"', 1).alias(
            "item_type"
        ),
        F.explode(
            F.arrays_zip(
                F.regexp_extract_all(F.col("block"), F.lit('itemprop="([a-z]+)"'), 1),
                F.regexp_extract_all(
                    F.col("block"), F.lit('itemprop="[a-z]+">([^<]*)</span>'), 1
                ),
            )
        ).alias("p"),
    )
    return typed.select(
        "doc_id",
        "item_idx",
        "item_type",
        F.col("p.0").alias("prop_key"),
        F.length(F.col("p.1")).cast("long").alias("prop_len"),
    )


@_q(
    "q118_feed_ingest",
    """
    WITH feeds AS (
      SELECT doc_id, u.k AS item_idx,
             'https://h' || (doc_id % 9) || '.example/post/' || (doc_id * 10 + u.k) AS link,
             1 + (doc_id + u.k) % 28 AS pub_day
      FROM documents, unnest(generate_series(0, 1 + doc_id % 3)) AS u(k)
      WHERE doc_id < 150
    )
    SELECT doc_id, CAST(item_idx AS INTEGER) AS item_idx, link,
           CAST(pub_day AS INTEGER) AS pub_day
    FROM feeds
    """,
    "RSS feed ingestion (the crawl-seeding twin of q95's sitemaps): "
    "<rss><channel><item><link>/<pubDate> markup built JVM-side, "
    "parsed back with regexp_extract_all + arrays_zip + posexplode "
    "into one row per feed item with the link and publication day — "
    "the discovery input q92's frontier scheduler consumes. "
    "Closed-form oracle; map-only, zero shuffle.",
)
def q118_feed_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    entry = lambda k: F.concat(  # noqa: E731
        F.lit("<item><link>https://h"),
        F.pmod(F.col("doc_id"), F.lit(9)).cast("string"),
        F.lit(".example/post/"),
        (F.col("doc_id") * 10 + k).cast("string"),
        F.lit("</link><pubDate>2026-01-"),
        F.lpad((F.lit(1) + F.pmod(F.col("doc_id") + k, F.lit(28))).cast("string"), 2, "0"),
        F.lit("</pubDate></item>"),
    )
    xml = F.concat(
        F.lit("<rss><channel>"),
        F.aggregate(
            F.transform(
                F.sequence(F.lit(0), F.lit(1) + F.pmod(F.col("doc_id"), F.lit(3))), entry
            ),
            F.lit(""),
            lambda acc, x: F.concat(acc, x),
        ),
        F.lit("</channel></rss>"),
    )
    feeds = d.select("doc_id", xml.alias("xml"))
    items = feeds.select(
        "doc_id",
        F.posexplode(
            F.arrays_zip(
                F.regexp_extract_all(F.col("xml"), F.lit("<link>([^<]+)</link>"), 1),
                F.regexp_extract_all(
                    F.col("xml"), F.lit("<pubDate>2026-01-([0-9]{2})</pubDate>"), 1
                ),
            )
        ).alias("item_idx", "p"),
    )
    return items.select(
        "doc_id",
        F.col("item_idx").cast("int").alias("item_idx"),
        F.col("p.0").alias("link"),
        F.col("p.1").cast("int").alias("pub_day"),
    )


@_q(
    "q119_dhash_recall",
    f"""
    WITH {_DHASH_CELLS_SQL},
    pairs AS (
      SELECT a.media_id AS id_a, b.media_id AS id_b,
             bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1))
               + bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3)) AS hamming,
             CASE WHEN a.c0 = b.c0 OR a.c1 = b.c1 OR a.c2 = b.c2 OR a.c3 = b.c3
                  THEN 1 ELSE 0 END AS banded
      FROM h a JOIN h b ON a.media_id < b.media_id
    )
    SELECT r.r AS radius,
           CAST(sum(CASE WHEN hamming <= r.r THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
           CAST(sum(CASE WHEN hamming <= r.r THEN banded ELSE 0 END) AS BIGINT) AS n_banded,
           CAST(CASE WHEN sum(CASE WHEN hamming <= r.r THEN 1 ELSE 0 END) = 0 THEN 10000
                ELSE 10000 * sum(CASE WHEN hamming <= r.r THEN banded ELSE 0 END)
                     // sum(CASE WHEN hamming <= r.r THEN 1 ELSE 0 END) END AS BIGINT)
             AS recall_bp
    FROM pairs, unnest(generate_series(1, 6)) AS r(r)
    GROUP BY r.r
    """,
    "Banded-recall self-evaluation for the image dHash family (the "
    "q104 discipline applied to hamming LSH): exact neighbour pairs "
    "at radius r vs pairs proposed by the 4x14-bit band join, for "
    "r = 1..6. Pigeonhole guarantees 10000 basis points through r=3 "
    "(the operator's radius); r >= 4 quantifies what a wider radius "
    "would miss — the parameter-tuning table to consult before "
    "changing the admission threshold. All-pairs is fixture-scale "
    "only (160 hashes); at corpus scale this runs on a sample, like "
    "q104. The oracle regenerates hashes in closed form.",
)
def q119_dhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.multimodal import image_dhash, synth_dhash_png

    h = image_dhash(synth_dhash_png(_t(spark, sf_dir, "documents"), n_docs=160))
    a = h.select(
        F.col("media_id").alias("id_a"),
        *[F.col(f"c{j}").alias(f"a{j}") for j in range(4)],
    )
    b = h.select(
        F.col("media_id").alias("id_b"),
        *[F.col(f"c{j}").alias(f"b{j}") for j in range(4)],
    )
    ham = None
    banded = None
    for j in range(4):
        t = F.bit_count(F.col(f"a{j}").bitwiseXOR(F.col(f"b{j}")))
        ham = t if ham is None else ham + t
        eq = F.col(f"a{j}") == F.col(f"b{j}")
        banded = eq if banded is None else banded | eq
    pairs = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            ham.alias("hamming"),
            F.when(banded, F.lit(1)).otherwise(F.lit(0)).alias("banded"),
        )
    )
    radii = pairs.crossJoin(
        F.broadcast(
            spark.range(1, 7).select(F.col("id").cast("int").alias("radius"))
        )
    )
    agg = radii.groupBy("radius").agg(
        F.sum(F.when(F.col("hamming") <= F.col("radius"), 1).otherwise(0)).alias("n_exact"),
        F.sum(
            F.when(F.col("hamming") <= F.col("radius"), F.col("banded")).otherwise(0)
        ).alias("n_banded"),
    )
    return agg.select(
        "radius",
        "n_exact",
        "n_banded",
        F.when(F.col("n_exact") == 0, F.lit(10000))
        .otherwise(F.floor(F.lit(10000) * F.col("n_banded") / F.col("n_exact")))
        .cast("long")
        .alias("recall_bp"),
    )


@_q(
    "q120_decode_stats",
    """
    SELECT doc_id AS media_id,
           CASE doc_id % 6 WHEN 3 THEN 'audio' WHEN 4 THEN 'video'
                ELSE 'image' END AS kind,
           CAST(CASE doc_id % 6
                WHEN 0 THEN 3 + doc_id % 9
                WHEN 1 THEN 4 + doc_id % 7
                WHEN 2 THEN 8 * (1 + doc_id % 2)
                WHEN 3 THEN 8000
                ELSE 16 + doc_id % 64 END AS INTEGER) AS width,
           CAST(CASE doc_id % 6
                WHEN 0 THEN 2 + doc_id % 7
                WHEN 1 THEN 3 + doc_id % 5
                WHEN 2 THEN 8
                WHEN 3 THEN 0
                ELSE 9 + doc_id % 32 END AS INTEGER) AS height,
           CAST(CASE doc_id % 6
                WHEN 3 THEN 1 WHEN 4 THEN 3 WHEN 5 THEN 0
                ELSE 1 END AS INTEGER) AS channels,
           CAST(CASE doc_id % 6
                WHEN 0 THEN (2 + doc_id % 7) * (1 + (3 + doc_id % 9))
                WHEN 1 THEN (4 + doc_id % 7) * (3 + doc_id % 5)
                WHEN 2 THEN 8 * (1 + doc_id % 2) * 8
                WHEN 3 THEN 2 * (20 + doc_id % 30)
                WHEN 4 THEN 10 + doc_id % 40
                ELSE 2 END AS BIGINT) AS body_len
    FROM documents WHERE doc_id < 180
    """,
    "One oracle over EVERY live container dispatch path: "
    "synth_mixed_media rotates real PNG / GIF / baseline-JPEG / "
    "WAV-PCM / MP4 / SVG payloads on doc_id % 6, decode_media runs "
    "the magic-dispatched parse, and the oracle states each format's "
    "kind, dimensions, channel count, and decoded-body length in "
    "closed form (PNG = filtered scanline stream, GIF = LZW-decoded "
    "index raster, JPEG = Huffman+IDCT gray raster, WAV = int16 PCM "
    "bytes, MP4 = mdat payload, SVG = visible text nodes). A green "
    "run certifies all six codec paths in one row-per-file check. "
    "Map-only mapInArrow, zero shuffle.",
)
def q120_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.multimodal import decode_media, synth_mixed_media

    media = synth_mixed_media(_t(spark, sf_dir, "documents"), n_docs=180)
    return decode_media(media)


@_q(
    "q121_mp4_timing",
    """
    WITH plan AS (
      SELECT doc_id,
             50 + doc_id % 100 AS delta,
             1000 * (1 + doc_id % 9) AS ts
      FROM documents WHERE doc_id < 150
    )
    SELECT doc_id AS media_id,
           CAST(u.j AS INTEGER) AS sample_idx,
           CAST(u.j * delta AS BIGINT) AS dts,
           CAST(1000 * u.j * delta // ts AS BIGINT) AS time_ms
    FROM plan, unnest(generate_series(0, 1 + doc_id % 5)) AS u(j)
    """,
    "MP4 sample TIMING demux (the when-on-the-timeline half of q81's "
    "where-in-the-file): mdhd timescale + stts run-length "
    "time-to-sample table resolved to per-sample dts ticks and "
    "floor-milliseconds — what frame-at-time sampling and segment "
    "seeking consume. Fixtures carry per-doc tick deltas and "
    "timescales; the oracle states every timestamp in closed form. "
    "Map-only mapInArrow, zero shuffle. multimodal.mp4_sample_times / "
    "_parse_mp4_timing.",
)
def q121_mp4_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.multimodal import mp4_sample_times, synth_timed_mp4

    media = synth_timed_mp4(_t(spark, sf_dir, "documents"), n_docs=150)
    return mp4_sample_times(media)


@_q(
    "q122_pdf_encrypted_extract",
    """
    SELECT 'https://encpdf-' || CAST(doc_id AS VARCHAR) || '.example/doc.pdf' AS url,
           text AS extracted_text,
           1 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE encrypted-PDF extraction: q40's exact one-stream "
    "document template, standard-RC4 encrypted per row (alternating "
    "R2/40-bit and R3/128-bit by doc parity) in the synth kernel, then "
    "run through the ordinary extraction pipeline — the decryption "
    "pre-pass must recover the text EXACTLY for the oracle identity "
    "to hold on every row. The real-crawl shape: owner-password-only "
    "permissions encryption with an empty user password. "
    "extractor/pdf.py decrypt_pdf; fixtures/genpdf.py encrypt_pdf.",
)
def q122_pdf_encrypted_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        # CPU-bound crypto kernel below: spread over the cores rather
        # than the file's 1-2 input splits (see q125)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.genpdf import encrypt_pdf

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                content = f"BT /F1 12 Tf 50 700 Td ({text}) Tj ET"
                pdf = (
                    "%PDF-1.4\n"
                    "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
                    "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
                    "3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                    "/Contents 4 0 R >>\nendobj\n"
                    f"4 0 obj\n<< /Length {len(content)} >>\nstream\n"
                    f"{content}\nendstream\nendobj\n"
                    "trailer\n<< /Root 1 0 R >>\n%%EOF\n"
                ).encode()
                r = 2 if did % 2 == 0 else 3
                blobs.append(encrypt_pdf(pdf, r=r, length_bits=40 if r == 2 else 128))
                urls.append(f"https://encpdf-{did}.example/doc.pdf")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q123_mp3_metadata",
    """
    WITH p AS (
      SELECT doc_id AS did,
             (doc_id % 2 = 0) AS mpeg1,
             3 + doc_id % 7 AS n_frames,
             CAST(1 + doc_id % 14 AS INTEGER) AS br_idx,
             CAST(doc_id % 3 AS INTEGER) AS sr_idx,
             (doc_id % 5 = 0) AS mono
      FROM documents WHERE doc_id % 10 = 3
    ),
    q AS (
      SELECT did, n_frames, mono,
             CASE WHEN mpeg1 THEN [44100, 48000, 32000][sr_idx + 1]
                  ELSE [22050, 24000, 16000][sr_idx + 1] END AS sr,
             CASE WHEN mpeg1
                  THEN [32,40,48,56,64,80,96,112,128,160,192,224,256,320][br_idx]
                  ELSE [8,16,24,32,40,48,56,64,80,96,112,128,144,160][br_idx]
             END AS kbps,
             CASE WHEN mpeg1 THEN 1152 ELSE 576 END AS spf
      FROM p
    )
    SELECT did AS media_id, 'mp3' AS fmt, 'title' AS meta_key,
           't' || CAST(did % 9 AS VARCHAR) AS meta_value
    FROM q WHERE did % 4 = 1
    UNION ALL
    SELECT did, 'mp3', 'duration_ms',
           CAST(n_frames * spf * 1000 // sr AS VARCHAR) FROM q
    UNION ALL
    SELECT did, 'mp3', 'avg_kbps', CAST(kbps AS VARCHAR) FROM q
    UNION ALL
    SELECT did, 'mp3', 'sample_rate', CAST(sr AS VARCHAR) FROM q
    UNION ALL
    SELECT did, 'mp3', 'n_frames', CAST(n_frames AS VARCHAR) FROM q
    UNION ALL
    SELECT did, 'mp3', 'channel_mode',
           CASE WHEN mono THEN 'mono' ELSE 'stereo' END FROM q
    """,
    "MP3 frame-header walk, driver-checked through the unified "
    "media_metadata harvest: deterministic Layer-III streams per "
    "doc_id (MPEG1/MPEG2, every bitrate index, all three sample-rate "
    "slots, mono/stereo, 25% with a leading ID3v2 tag) walked header "
    "by header — duration/bitrate/sample-rate/frame-count from the "
    "published frame-geometry tables WITHOUT touching audio data (the "
    "walk-don't-decode discipline of the PNG tEXt / JPEG COM / EXIF "
    "harvesters; MP3 audio decode stays the documented library-bound "
    "seam). The oracle predicts every (key, value) row in closed "
    "form. multimodal.mp3_frame_walk / build_mp3.",
)
def q123_mp3_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.multimodal import media_metadata

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 3).select("doc_id")
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.multimodal import build_mp3

        for b in it:
            ids = b.column(0).to_pylist()
            payloads = [
                build_mp3(
                    3 + i % 7,
                    1 + i % 14,
                    i % 3,
                    mpeg1=i % 2 == 0,
                    mono=i % 5 == 0,
                    id3=[("title", f"t{i % 9}")] if i % 4 == 1 else None,
                )
                for i in ids
            ]
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(payloads, pa.binary())],
                names=["media_id", "payload"],
            )

    return media_metadata(d.mapInArrow(batches, schema))


@_q(
    "q125_pdf_aes_extract",
    """
    SELECT 'https://aespdf-' || CAST(doc_id AS VARCHAR) || '.example/doc.pdf' AS url,
           text AS extracted_text,
           1 AS n_kept
    FROM documents
    WHERE doc_id % 4 = 0
    """,
    "DRIVER-CHECKABLE AES-encrypted-PDF extraction (q122's RC4 twin): "
    "the same one-stream document template encrypted per row with the "
    "V4/R4 /AESV2 crypt-filter scheme (AES-128-CBC streams, IV prefix "
    "+ PKCS#7, /Length rewritten — NOT length-preserving, so the "
    "decryptor REBUILDS the file), alternating /EncryptMetadata "
    "true/false by doc parity (different file keys); docs with "
    "doc_id % 200 == 0 instead get the PDF 2.0 V5/R6 /AESV3 scheme "
    "(AES-256, SHA-2 Algorithm 2.A/2.B key derivation, file key used "
    "directly — the KDF is deliberately slow by spec, hence the "
    "rare-share mix mirroring real crawl prevalence). All run through "
    "the ordinary extraction pipeline; the oracle is text identity on "
    "every row. AES itself is pure-stdlib (toyocr_spark/aescipher.py, "
    "FIPS-197-vector-pinned, T-table fast paths in BOTH directions "
    "cross-checked against the per-step reference; Algorithm 2.B "
    "pinned by an independent in-test transcription). extractor/"
    "pdf.py _decrypt_pdf_aes/_r6_file_key/_hash_2b; fixtures/genpdf."
    "py encrypt_pdf_aes/encrypt_pdf_aes256.",
)
def q125_pdf_aes_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    base = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 4 == 0)
        .select("doc_id", "text")
    )
    # The kernel below is CPU-bound crypto with a two-class cost
    # distribution: rare R6 (AES-256 + Algorithm 2.B KDF) docs cost
    # ~1000x a plain AESV2 doc, so hash placement leaves 2-3 of them
    # on one task and THAT task is the job (guide §2.5: a straggler is
    # skew in work, not rows). Exact fix: split the heavy class out
    # and round-robin it — round-robin balance is exact, so the R6
    # critical path is ceil(n_r6 / parallelism) docs; the cheap
    # majority keeps the plain 2x-cores spread.
    par = spark.sparkContext.defaultParallelism
    r6 = base.where(F.col("doc_id") % 200 == 0).repartition(par)
    rest = base.where(F.col("doc_id") % 200 != 0).repartition(2 * par)
    d = r6.unionByName(rest)
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.genpdf import encrypt_pdf_aes, encrypt_pdf_aes256

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                content = f"BT /F1 12 Tf 50 700 Td ({text}) Tj ET"
                pdf = (
                    "%PDF-1.6\n"
                    "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
                    "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
                    "3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                    "/Contents 4 0 R >>\nendobj\n"
                    f"4 0 obj\n<< /Length {len(content)} >>\nstream\n"
                    f"{content}\nendstream\nendobj\n"
                    "trailer\n<< /Root 1 0 R >>\n%%EOF\n"
                ).encode()
                if did % 200 == 0:  # rare-share PDF 2.0 AESV3 (R6) mix
                    blobs.append(
                        encrypt_pdf_aes256(pdf, encrypt_metadata=(did // 200) % 2 == 0)
                    )
                else:
                    blobs.append(encrypt_pdf_aes(pdf, encrypt_metadata=did % 2 == 0))
                urls.append(f"https://aespdf-{did}.example/doc.pdf")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


# geometric-Zipf host ladder (closed form, integer-exact both engines):
# host z0 carries 50% of the corpus, z1 25%, ... z9 the tail — the
# crawl's real key distribution, which the uniform doc_id % k fixtures
# of q71/q79/q85/q91/q92 never stress
_ZIPF_CUTS = (512, 768, 896, 960, 992, 1008, 1016, 1020, 1022)


def _zipf_host_col() -> "F.Column":
    m = F.col("doc_id") % 1024
    rank = F.when(m < _ZIPF_CUTS[0], 0)
    for i, c in enumerate(_ZIPF_CUTS[1:], start=1):
        rank = rank.when(m < c, i)
    rank = rank.otherwise(9)
    return F.concat(F.lit("z"), rank.cast("string"))


_ZIPF_CASE_SQL = (
    "CASE "
    + " ".join(f"WHEN m < {c} THEN {i}" for i, c in enumerate(_ZIPF_CUTS))
    + " ELSE 9 END"
)


@_q(
    "q124_zipf_host_topk",
    f"""
    WITH z AS (SELECT doc_id, n_chars, doc_id % 1024 AS m FROM documents),
    h AS (
      SELECT doc_id, n_chars,
             'z' || CAST({_ZIPF_CASE_SQL} AS VARCHAR) AS host
      FROM z
    )
    SELECT host, doc_id, n_chars, rk FROM (
      SELECT host, doc_id, n_chars,
             row_number() OVER (PARTITION BY host
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM h
    ) WHERE rk <= 3
    """,
    "the skew-safe top-K under a GENUINELY Zipf host distribution: a "
    "geometric ladder keys half the corpus onto one host (the crawl "
    "shape the uniform doc_id % k fixtures never stress), and the "
    "two-phase salted rank must still return rows IDENTICAL to the "
    "naive window — the oracle is the plain window, independent of "
    "which host is hot. Phase 1 spreads the hot host's rows over 16 "
    "salt reducers (per-task input bounded at ~hot/16, asserted by a "
    "runtime test), phase 2 ranks <= K*B survivors per host. "
    "operators/selection.py skew_safe_topk; SURVEY.md §4 skew handling",
)
def q124_zipf_host_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.operators.selection import skew_safe_topk

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", _zipf_host_col().alias("host")
    )
    out = skew_safe_topk(d, ["host"], "n_chars", 3, tiebreak_col="doc_id")
    return out.select("host", "doc_id", "n_chars", "rk")


def _pq_round_sql(r: int, queries_filter: str = "") -> str:
    """One per-subspace Lloyd round — q53's _kmeans_round_sql with a
    `sub` key on every CTE (16 sub-centroids per 8-dim subspace)."""
    return f"""
    pd{r} AS (
      SELECT s.vec_id, s.sub, c.scid,
             sum((s.val - c.cval) * (s.val - c.cval)) AS dist
      FROM svd s JOIN pc{r - 1} c ON s.sub = c.sub AND s.sdim = c.sdim
      {queries_filter}
      GROUP BY s.vec_id, s.sub, c.scid
    ),
    pa{r} AS (
      SELECT vec_id, sub, scid FROM (
        SELECT vec_id, sub, scid,
               row_number() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dist ASC, scid ASC) AS rk
        FROM pd{r})
      WHERE rk = 1
    ),
    pc{r} AS (
      SELECT a.sub, a.scid, s.sdim,
             CAST(floor(sum(s.val) * 1.0 / count(*)) AS BIGINT) AS cval
      FROM pa{r} a JOIN svd s ON a.vec_id = s.vec_id AND a.sub = s.sub
      GROUP BY a.sub, a.scid, s.sdim
    )"""


_PQ_ADC_SQL = f"""
    WITH vd AS (
      SELECT vec_id, i AS dim,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS val
      FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)
    ),
    svd AS (
      SELECT vec_id, CAST((dim - 1) // 8 AS INT) AS sub,
             (dim - 1) % 8 AS sdim, val
      FROM vd
    ),
    pc0 AS (
      SELECT sub, vec_id AS scid, sdim, val AS cval FROM svd
      WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)
    ),
    {_pq_round_sql(1)},
    pd2 AS (
      SELECT s.vec_id, s.sub, c.scid,
             sum((s.val - c.cval) * (s.val - c.cval)) AS dist
      FROM svd s JOIN pc1 c ON s.sub = c.sub AND s.sdim = c.sdim
      GROUP BY s.vec_id, s.sub, c.scid
    ),
    codes AS (
      SELECT vec_id, sub, scid FROM (
        SELECT vec_id, sub, scid,
               row_number() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dist ASC, scid ASC) AS rk
        FROM pd2)
      WHERE rk = 1
    ),
    qtab AS (
      SELECT vec_id AS query_id, sub, scid, dist AS sdist
      FROM pd2 WHERE vec_id < 8
    ),
    adc AS (
      SELECT q.query_id, a.vec_id AS item_id,
             CAST(sum(q.sdist) AS BIGINT) AS adc_dist
      FROM codes a JOIN qtab q ON a.sub = q.sub AND a.scid = q.scid
      WHERE a.vec_id != q.query_id
      GROUP BY q.query_id, a.vec_id
    )
    SELECT query_id, "rank", item_id, adc_dist FROM (
      SELECT query_id, item_id, adc_dist,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY adc_dist ASC, item_id ASC)
                  AS BIGINT) AS "rank"
      FROM adc)
    WHERE "rank" <= 5
    """


@_q(
    "q126_pq_adc_search",
    _PQ_ADC_SQL,
    "product-quantization ANN (PQ-ADC, Jegou et al. TPAMI 2011): the "
    "memory-bounded representation at 10^12 vectors — 8 subspaces x "
    "16 sub-centroids trained by the SAME integer-exact Lloyd "
    "discipline as q53 (fixed-point BIGINT, floor-mean updates, ties "
    "to smaller id), each vector stored as 8 codes (16-64x "
    "compression), queries answered by Asymmetric Distance "
    "Computation: a per-query (sub x scid) distance table joined once "
    "against the code table on (sub, scid) + a (query, item) partial "
    "agg — raw vectors are touched only to build the tiny table. "
    "Composes with q75's IVF lists (probe, then ADC-score the probed "
    "lists' codes only). Oracle retrains the sub-quantizers with "
    "q53's unrolled-round CTEs keyed by `sub` and reproduces the ADC "
    "top-5 bit-for-bit. operators/pq.py",
)
def q126_pq_adc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.operators.pq import pq_adc_topk, pq_train

    emb = _t(spark, sf_dir, "embeddings")
    codebook, codes = pq_train(emb, m_sub=8, ksub=16, iters=2, dim=64)
    q = emb.filter(F.col("vec_id") < 8)
    return pq_adc_topk(q, codebook, codes, k=5, m_sub=8, dim=64)


@_q(
    "q127_ivf_pq_search",
    f"""
    WITH vd AS (
      SELECT vec_id, i AS dim,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS val
      FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)
    ),
    c0 AS (
      SELECT vec_id AS cid, dim, val AS cval FROM vd
      WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)
    ),
    {_kmeans_round_sql(1)},
    {_kmeans_round_sql(2)},
    d3 AS (
      SELECT vd.vec_id, c.cid,
             sum((vd.val - c.cval) * (vd.val - c.cval)) AS dist
      FROM vd JOIN c2 c ON vd.dim = c.dim
      GROUP BY vd.vec_id, c.cid
    ),
    a3 AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rk
        FROM d3)
      WHERE rk = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS prb
        FROM d3 WHERE vec_id < 8)
      WHERE prb <= 2
    ),
    svd AS (
      SELECT vec_id, CAST((dim - 1) // 8 AS INT) AS sub,
             (dim - 1) % 8 AS sdim, val
      FROM vd
    ),
    pc0 AS (
      SELECT sub, vec_id AS scid, sdim, val AS cval FROM svd
      WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)
    ),
    {_pq_round_sql(1)},
    pd2 AS (
      SELECT s.vec_id, s.sub, c.scid,
             sum((s.val - c.cval) * (s.val - c.cval)) AS dist
      FROM svd s JOIN pc1 c ON s.sub = c.sub AND s.sdim = c.sdim
      GROUP BY s.vec_id, s.sub, c.scid
    ),
    codes AS (
      SELECT vec_id, sub, scid FROM (
        SELECT vec_id, sub, scid,
               row_number() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dist ASC, scid ASC) AS rk
        FROM pd2)
      WHERE rk = 1
    ),
    qtab AS (
      SELECT vec_id AS query_id, sub, scid, dist AS sdist
      FROM pd2 WHERE vec_id < 8
    ),
    cand AS (
      SELECT p.query_id, a.vec_id AS item_id
      FROM probes p JOIN a3 a ON p.cid = a.cid
      WHERE a.vec_id != p.query_id
    ),
    adc AS (
      SELECT c.query_id, c.item_id,
             CAST(sum(q.sdist) AS BIGINT) AS adc_dist
      FROM cand c
      JOIN codes k ON k.vec_id = c.item_id
      JOIN qtab q ON q.query_id = c.query_id
                 AND q.sub = k.sub AND q.scid = k.scid
      GROUP BY c.query_id, c.item_id
    )
    SELECT query_id, "rank", item_id, adc_dist FROM (
      SELECT query_id, item_id, adc_dist,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY adc_dist ASC, item_id ASC)
                  AS BIGINT) AS "rank"
      FROM adc)
    WHERE "rank" <= 5
    """,
    "IVF-PQ search — the two quantizers composed into the actual "
    "10^12-vector index architecture: probe the nprobe=2 nearest "
    "coarse cells (q53's trained quantizer, q54's probe logic), then "
    "ADC-score ONLY the probed cells' members against the per-query "
    "subspace distance table (q126's codebook/codes). Neither raw "
    "corpus vectors nor unprobed cells are touched: expected work per "
    "query = nprobe/k_coarse of the corpus, each candidate costing 8 "
    "integer adds on a 16-64x-compressed representation. Everything "
    "integer-exact end to end, so the oracle — q54's coarse CTEs + "
    "q126's sub-keyed PQ CTEs + a candidate-restricted ADC — matches "
    "bit-for-bit. operators/pq.py ivf_pq_topk",
)
def q127_ivf_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.operators.pq import ivf_pq_topk, pq_train

    emb = _t(spark, sf_dir, "embeddings")
    # deployment shape: BOTH quantizers come from their persisted
    # indexes (train-once/search-many); the bit-deterministic trainers
    # make the oracle identical either way. Fallback twins train
    # in-session when the warehouse is not writable.
    centroids, lists = _ivf_tables(spark, sf_dir)
    assigned = lists.select(F.col("item_id").alias("id"), "cid")
    pq_prefix = ensure_pq_index(spark, sf_dir)
    if pq_prefix is not None:
        codebook = spark.table(f"{pq_prefix}_codebook")
        codes = spark.table(f"{pq_prefix}_codes")
    else:
        codebook, codes = pq_train(emb, m_sub=8, ksub=16, iters=2, dim=64)
        codebook, codes = codebook.localCheckpoint(), codes.localCheckpoint(eager=False)
    q = emb.filter(F.col("vec_id") < 8)
    return ivf_pq_topk(
        q, centroids, assigned, codebook, codes, k=5, nprobe=2, m_sub=8, dim=64
    )


def _pq_table_prefix(sf_dir: str) -> str:
    tag = sf_dir.rstrip("/").split("/")[-1].replace(".", "_").replace("-", "_")
    return f"toyocr_pq_v1_{tag}"


def ensure_pq_index(spark: SparkSession, sf_dir: str) -> str | None:
    """Train-once gate for the persisted PQ index — the ensure_ivf_index
    discipline verbatim: absent catalog tables are (re)trained
    bit-deterministically; a warehouse this harness cannot write falls
    back to an in-session index with identical bytes."""
    import shutil
    from urllib.parse import urlparse

    from toyocr_spark.operators.pq import pq_write_index

    prefix = _pq_table_prefix(sf_dir)
    # gate on BOTH tables: a surviving _codes with a missing _codebook
    # (manual drop, partial cleanup) must retrain, not crash the read
    if not (
        spark.catalog.tableExists(f"{prefix}_codes")
        and spark.catalog.tableExists(f"{prefix}_codebook")
    ):
        try:
            wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
            for t in (f"{prefix}_codes", f"{prefix}_codebook"):
                if not spark.catalog.tableExists(t):
                    shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
            pq_write_index(spark, _t(spark, sf_dir, "embeddings"), prefix)
        except Exception:
            return None
    return prefix


@_q(
    "q128_pq_persisted_search",
    _PQ_ADC_SQL,
    "ADC search against the PERSISTED PQ index — the train-once/"
    "search-many pattern (q75's discipline on the quantized side): "
    "pq_write_index saves the codebook (m_sub x ksub rows) and the "
    "16-64x-compressed code table as catalog tables; the search plan "
    "then scans queries + codebook + codes and contains ZERO k-means "
    "stages (plan-locked — the inline-trained q126 re-shuffles the "
    "corpus per quantizer round, this reads two tables). The trainer "
    "is bit-deterministic, so the oracle is q126's SQL verbatim: "
    "retraining in DuckDB reproduces the persisted index exactly. "
    "operators/pq.py pq_write_index/pq_persisted_search",
)
def q128_pq_persisted_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.operators.pq import pq_adc_topk, pq_persisted_search, pq_train

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    prefix = ensure_pq_index(spark, sf_dir)
    if prefix is None:  # warehouse not writable: in-session twin
        codebook, codes = pq_train(emb)
        return pq_adc_topk(q, codebook.localCheckpoint(), codes.localCheckpoint(eager=False), 5)
    return pq_persisted_search(spark, q, prefix, k=5)


@_q(
    "q129_docx_extract",
    """
    SELECT 'https://docx-' || CAST(doc_id AS VARCHAR) || '.example/doc.docx' AS url,
           'Document number ' || CAST(doc_id AS VARCHAR) || ' overview section'
             || chr(10) || text AS extracted_text,
           2 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE OOXML (.docx) extraction — the q122 discipline "
    "on the OPC container format: each row's text is packed into a "
    "real WordprocessingML package (valid zip, [Content_Types].xml, "
    "rels, document.xml) as heading + body paragraphs, plus three "
    "boilerplate plants the extractor must drop — a link-dominated "
    "nav paragraph (link-density rule), and header/footer PARTS "
    "(structural exclusion: never read). The oracle derives the "
    "expected text in closed form, so identity fails if the zip walk, "
    "XML parse, whitespace normalization, hyperlink accounting, or "
    "part exclusion slips on ANY row. extractor/docx.py; "
    "fixtures/gendocx.py. Map-only: one pre-kernel repartition, then "
    "synth + extract in sanctioned Arrow kernels, zero shuffle after.",
)
def q129_docx_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        # Python zip/XML synth kernel: spread over the cores rather
        # than the file's 1-2 input splits (the q122/q125 discipline)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.gendocx import build_docx, paragraph

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                body = [
                    paragraph("Navigation | Home | Search | Archive", link="rId9"),
                    paragraph(
                        f"Document number {did} overview section", style="Heading2"
                    ),
                    paragraph(text),
                ]
                blobs.append(
                    build_docx(
                        body_xml=body,
                        header_text=f"draft header {did} do not extract",
                        footer_text=f"page {did} of 999",
                    )
                )
                urls.append(f"https://docx-{did}.example/doc.docx")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q130_xlsx_extract",
    """
    SELECT 'https://xlsx-' || CAST(doc_id AS VARCHAR) || '.example/sheet.xlsx' AS url,
           'section content and notes for this document' || chr(10) ||
             text || ' ' || CAST(doc_id * 7 AS VARCHAR) AS extracted_text,
           2 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE SpreadsheetML (.xlsx) extraction — q129's OPC "
    "discipline on the workbook format: each row's text is planted as "
    "a SHARED-STRING cell (t=\"s\" index indirection, the format's "
    "distinctive wrinkle) in a two-sheet package; a header row "
    "extracts, a numeric sibling cell joins the text row, and a "
    "second sheet of short bare-numeral chrome rows must die by "
    "MIN_CHARS in the shared scorer. Oracle is closed form over "
    "(doc_id, text), so the zip walk, workbook/rels resolution, "
    "sharedStrings lookup, row assembly, and scoring must all be "
    "exact on every row. extractor/xlsx.py; fixtures/genxlsx.py. "
    "Map-only: pre-kernel repartition then Arrow kernels, zero "
    "shuffle after.",
)
def q130_xlsx_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.genxlsx import build_xlsx

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                blobs.append(
                    build_xlsx(
                        {
                            "report": [
                                ["section content and notes for this document"],
                                [text, did * 7],
                            ],
                            "totals": [[did % 9, did % 7], [1, 2]],
                        }
                    )
                )
                urls.append(f"https://xlsx-{did}.example/sheet.xlsx")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q131_pptx_extract",
    """
    SELECT 'https://pptx-' || CAST(doc_id AS VARCHAR) || '.example/deck.pptx' AS url,
           'Document number ' || CAST(doc_id AS VARCHAR) || ' briefing deck overview'
             || chr(10) || text AS extracted_text,
           2 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE PresentationML (.pptx) extraction — the OOXML "
    "trio completed (q129 word, q130 xl, this ppt): each row's text "
    "is planted as a DrawingML body shape under a title placeholder, "
    "slide parts NAMED IN REVERSE of deck order (slideN.xml holds "
    "slide 1) so only the sldIdLst id walk extracts correctly, plus a "
    "speaker-notes part that must be structurally excluded. Closed-"
    "form oracle over (doc_id, text): the zip walk, sldIdLst/rels "
    "resolution, a:t run assembly, placeholder typing, and notes "
    "exclusion must all be exact on every row. extractor/pptx.py; "
    "fixtures/genpptx.py. Map-only: pre-kernel repartition then Arrow "
    "kernels, zero shuffle after.",
)
def q131_pptx_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.genpptx import build_pptx, shape

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                blobs.append(
                    build_pptx(
                        slides=[
                            [
                                shape(
                                    [f"Document number {did} briefing deck overview"],
                                    title=True,
                                ),
                                shape([text]),
                            ]
                        ],
                        notes=[f"presenter note {did} never extract"],
                    )
                )
                urls.append(f"https://pptx-{did}.example/deck.pptx")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q132_ooxml_metadata",
    """
    WITH k AS (
      SELECT doc_id,
             CASE doc_id % 3 WHEN 0 THEN 'docx' WHEN 1 THEN 'xlsx'
                  ELSE 'pptx' END AS fmt
      FROM documents
    )
    SELECT doc_id, fmt, 'title' AS prop_key,
           'Doc ' || CAST(doc_id AS VARCHAR) || ' office metadata title' AS prop_val
    FROM k
    UNION ALL
    SELECT doc_id, fmt, 'creator', 'author-' || CAST(doc_id % 13 AS VARCHAR) FROM k
    UNION ALL
    SELECT doc_id, fmt, 'keywords', 'crawl,office,k' || CAST(doc_id % 5 AS VARCHAR) FROM k
    UNION ALL
    SELECT doc_id, fmt, 'revision', CAST(doc_id % 9 + 1 AS VARCHAR) FROM k
    """,
    "OOXML core-properties metadata harvest (docProps/core.xml Dublin "
    "Core — the office-document leg of the q43/q113 metadata family): "
    "each row synthesizes one of the THREE package formats by doc "
    "parity (docx/xlsx/pptx — the part is format-independent, one "
    "harvester serves the trio) with planted title/creator/keywords/"
    "revision, then extractor/opc.py reads back ONE small zip member "
    "(metadata harvest never pays the content parse — the walk-don't-"
    "decode discipline). Closed-form oracle over doc_id; 4 scalar "
    "rows per doc. Map-only: pre-kernel repartition then one Arrow "
    "kernel, zero shuffle after.",
)
def q132_ooxml_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("fmt", T.StringType(), False),
            T.StructField("prop_key", T.StringType(), False),
            T.StructField("prop_val", T.StringType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.extractor.opc import opc_core_properties
        from toyocr_spark.fixtures.gendocx import build_docx
        from toyocr_spark.fixtures.genpptx import build_pptx, shape
        from toyocr_spark.fixtures.genxlsx import build_xlsx

        for b in it:
            ids, fmts, keys, vals = [], [], [], []
            for did in b.column(0).to_pylist():
                props = {
                    "title": f"Doc {did} office metadata title",
                    "creator": f"author-{did % 13}",
                    "keywords": f"crawl,office,k{did % 5}",
                    "revision": f"{did % 9 + 1}",
                }
                fmt = ("docx", "xlsx", "pptx")[did % 3]
                if fmt == "docx":
                    blob = build_docx(
                        paragraphs=["office body paragraph placeholder text"],
                        core_props=props,
                    )
                elif fmt == "xlsx":
                    blob = build_xlsx(
                        {"s": [["office sheet row placeholder text cell"]]},
                        core_props=props,
                    )
                else:
                    blob = build_pptx(
                        slides=[[shape(["office slide paragraph placeholder"])]],
                        core_props=props,
                    )
                for k, v in opc_core_properties(blob):
                    ids.append(did)
                    fmts.append(fmt)
                    keys.append(k)
                    vals.append(v)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(fmts, pa.string()),
                    pa.array(keys, pa.string()),
                    pa.array(vals, pa.string()),
                ],
                names=["doc_id", "fmt", "prop_key", "prop_val"],
            )

    return d.mapInArrow(batches, schema)


@_q(
    "q133_epub_extract",
    """
    SELECT 'https://epub-' || CAST(doc_id AS VARCHAR) || '.example/book.epub' AS url,
           'Document number ' || CAST(doc_id AS VARCHAR) || ' book heading' || chr(10) ||
           'Document number ' || CAST(doc_id AS VARCHAR) || ' book heading' || chr(10) ||
             text AS extracted_text,
           3 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE EPUB extraction — the container leg that REUSES "
    "the HTML tokenizer: OCF container.xml -> OPF manifest/spine "
    "resolve reading order (chapter parts NAMED IN REVERSE, so only "
    "the spine idref walk reads forwards), each spine document runs "
    "through the ordinary HTML tokenize(), and the planted EPUB3 nav "
    "doc (a link list in the spine) must die by the ordinary link-"
    "density rule — no special case. The chapter contributes its "
    "<title> block, <h1>, and body paragraph exactly as a standalone "
    "page would (hence the doubled heading in the closed form). "
    "extractor/epub.py; fixtures/genepub.py. Map-only: pre-kernel "
    "repartition then Arrow kernels, zero shuffle after.",
)
def q133_epub_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.genepub import build_epub, chapter_html

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                blobs.append(
                    build_epub(
                        [
                            chapter_html(
                                f"Document number {did} book heading", [text]
                            )
                        ],
                        include_nav=True,
                    )
                )
                urls.append(f"https://epub-{did}.example/book.epub")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q134_rtf_extract",
    """
    SELECT 'https://rtf-' || CAST(doc_id AS VARCHAR) || '.example/doc.rtf' AS url,
           'Document number ' || CAST(doc_id AS VARCHAR) || ' legacy heading'
             || chr(10) || text AS extracted_text,
           2 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE RTF extraction — the legacy word-processor leg "
    "of the dispatch: each row's text is planted as a body paragraph "
    "under an \\fs32 heading (the half-point title rule, the PDF "
    "14 pt twin), plus three boilerplate plants — a HYPERLINK-field "
    "nav paragraph (its \\fldrslt text counts as link chars, so the "
    "shared link-density rule drops it), and {\\header}/{\\footer} "
    "destinations that are never read. fonttbl/colortbl/stylesheet/"
    "info chrome must contribute nothing. Closed-form oracle over "
    "(doc_id, text): the control-word walk, escape families, group "
    "stack, and destination skipping must be exact on every row. "
    "extractor/rtf.py; fixtures/genrtf.py. Map-only: pre-kernel "
    "repartition then Arrow kernels, zero shuffle after.",
)
def q134_rtf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.genrtf import build_rtf, paragraph

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                blobs.append(
                    build_rtf(
                        body=[
                            paragraph(
                                f"Document number {did} legacy heading", fs=32
                            ),
                            paragraph(text),
                            paragraph(
                                "Home | Products | Contact",
                                link=f"https://nav-{did}.example/",
                            ),
                        ],
                        header_text=f"draft header {did} never extract",
                        footer_text=f"page {did} footer",
                    )
                )
                urls.append(f"https://rtf-{did}.example/doc.rtf")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q135_outlink_mining",
    """
    WITH e AS (
      SELECT doc_id, CAST(doc_id AS VARCHAR) AS d,
             CASE CAST(doc_id % 6 AS INTEGER)
               WHEN 0 THEN 'dir/page.html' WHEN 1 THEN 'doc.pdf'
               WHEN 2 THEN 'd.docx' WHEN 3 THEN 'old.rtf'
               WHEN 4 THEN 'deck.pptx' ELSE 'README.md' END AS leaf
      FROM documents
    ),
    edges AS (
      SELECT 'https://mix-' || d || '.example/' || leaf AS src_url,
             CASE CAST(doc_id % 6 AS INTEGER)
               WHEN 0 THEN ['https://out-' || d || '.example/a',
                            'https://mix-' || d || '.example/dir/sub/x.html']
               WHEN 1 THEN ['https://cite-' || d || '.example/paper']
               WHEN 2 THEN ['https://ref-' || d || '.example/std']
               WHEN 3 THEN ['https://nav-' || d || '.example/']
               WHEN 4 THEN ['https://deck-' || d || '.example/link']
               ELSE ['https://md-nav-' || d || '.example/',
                     'https://md-nav-' || d || '.example/about',
                     'https://md-nav-' || d || '.example/contact',
                     'https://md-out-' || d || '.example/r'] END AS targets
      FROM e
    )
    SELECT src_url, unnest(targets) AS target FROM edges
    """,
    "DRIVER-CHECKABLE unified outlink mining — ONE edge extractor over "
    "a six-format crawl (HTML / PDF / docx / RTF / pptx / Markdown by "
    "doc_id parity), every planted link known in closed form. The HTML "
    "leg stays entirely JVM-side (regexp + resolve_link Column exprs: "
    "one absolute href, one relative that must resolve against the "
    "page dir, one fragment that must drop); the binary formats route "
    "by magic bytes through the sanctioned kernel (pdf_links /URI "
    "actions, docx_links rel-resolved hyperlinks, rtf_links HYPERLINK "
    "fields with a bookmark and a local path that must NOT mine, "
    "opc_hyperlinks pptx rels); markdown — no magic, no href= — routes "
    "by the structural JVM pre-gate to markdown_links (absolute [t](u) "
    "only: a relative ./local.md and a fenced-code URL must NOT mine, "
    "while the nav-line links ARE edges — mining is pre-scoring). "
    "functions/linkmine.py. Reference analogue: the byte -> array "
    "dispatch seam every format leg shares "
    "(/root/reference/data/dataset_mapper.py:151-155). Scale shape: "
    "map-only on both legs — the regexp scan dominates (HTML dominates "
    "any crawl) and the kernel leg is bounded by the non-HTML "
    "fraction; no shuffle until a consumer aggregates.",
)
def q135_outlink_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.functions.linkmine import mine_outlinks

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.gendocx import build_docx
        from toyocr_spark.fixtures.gendocx import paragraph as dpara
        from toyocr_spark.fixtures.genmd import build_md
        from toyocr_spark.fixtures.genpdf import build_pdf, paragraph_ops, text_stream
        from toyocr_spark.fixtures.genpptx import build_pptx, shape
        from toyocr_spark.fixtures.genrtf import build_rtf
        from toyocr_spark.fixtures.genrtf import paragraph as rpara

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                fmt = did % 6
                base = f"https://mix-{did}.example"
                if fmt == 0:
                    url = f"{base}/dir/page.html"
                    blob = (
                        "<html><body>"
                        f'<a href="https://out-{did}.example/a">abs</a>'
                        '<a href="sub/x.html">rel</a>'
                        '<a href="#top">frag</a>'
                        f"<p>{text[:80]}</p></body></html>"
                    ).encode()
                elif fmt == 1:
                    url = f"{base}/doc.pdf"
                    pdf = build_pdf(
                        [text_stream([paragraph_ops(72, 740, 11, 13, [text[:40]])])],
                        compress=False,
                    )
                    ann = (
                        b"9 0 obj\n<< /Type /Annot /Subtype /Link /A "
                        b"<< /S /URI /URI (https://cite-%d.example/paper) >> "
                        b">>\nendobj\n" % did
                    )
                    i = pdf.find(b"xref")
                    blob = pdf[:i] + ann + pdf[i:]
                elif fmt == 2:
                    url = f"{base}/d.docx"
                    blob = build_docx(
                        body_xml=[dpara(text[:60], link="rId7")],
                        links={"rId7": f"https://ref-{did}.example/std"},
                    )
                elif fmt == 3:
                    url = f"{base}/old.rtf"
                    blob = build_rtf(
                        body=[
                            rpara(text[:60]),
                            rpara("site nav", link=f"https://nav-{did}.example/"),
                            # intra-document navigation: never edges
                            "{\\pard {\\field{\\*\\fldinst HYPERLINK \\l "
                            '"sec1"}{\\fldrslt Section}}\\par}',
                            '{\\pard {\\field{\\*\\fldinst HYPERLINK "notes.doc"}'
                            "{\\fldrslt local}}\\par}",
                        ]
                    )
                elif fmt == 4:
                    url = f"{base}/deck.pptx"
                    blob = build_pptx(
                        slides=[[shape([text[:60]])]],
                        links={"rIdH1": f"https://deck-{did}.example/link"},
                    )
                else:
                    url = f"{base}/README.md"
                    # mining is pre-scoring, so the nav links ARE edges
                    # (the HTML-leg contract); the relative link and the
                    # fenced-code URL must NOT mine
                    blob = build_md(
                        f"Readme {did} heading long enough",
                        [text[:80]],
                        host=f"md-nav-{did}.example",
                        links=[("ref", f"https://md-out-{did}.example/r"),
                               ("rel", "./local.md")],
                        code=f'fetch("https://code-{did}.example/api")',
                    )
                urls.append(url)
                blobs.append(blob)
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    return mine_outlinks(pages)


@_q(
    "q136_gzip_extract",
    """
    SELECT 'https://gz-' || CAST(doc_id AS VARCHAR) || '.example/page.html.gz' AS url,
           text AS extracted_text,
           1 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE gzip-envelope extraction — transfer-encoding "
    "residue a crawl stores raw (Content-Encoding survived capture): "
    "q25's exact page template wrapped in ONE gzip envelope (even "
    "doc_id) or TWO nested envelopes (odd doc_id, the double-compress "
    "case), inflated output-bounded by the pathological-page guard "
    "before the ordinary magic-byte dispatch (extractor/core.py "
    "_ungzip). The oracle is q25's identity closed form: if the strip "
    "or the re-dispatch slips, every row mismatches. Scale shape: the "
    "envelope adds zero plan nodes — same map-only kernel, inflate "
    "bounded per row.",
)
def q136_gzip_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )
    nav = (
        '<nav><ul><li><a href="/a">one link</a></li>'
        '<li><a href="/b">two link</a></li></ul></nav>'
    )

    def batches(it):
        import gzip

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                page = (
                    f"<html><body>{nav}<article><p>{text}"
                    "</p></article></body></html>"
                ).encode()
                blob = gzip.compress(page, 9, mtime=0)
                if did % 2:
                    blob = gzip.compress(blob, 9, mtime=0)
                urls.append(f"https://gz-{did}.example/page.html.gz")
                blobs.append(blob)
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q137_doc_extract",
    """
    SELECT 'https://doc-' || CAST(doc_id AS VARCHAR) || '.example/legacy.doc' AS url,
           'Legacy archive record ' || CAST(doc_id AS VARCHAR) || ' summary'
             || chr(10) || text AS extracted_text,
           2 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE legacy binary Word (.doc) extraction — the q129 "
    "discipline on the [MS-CFB]+[MS-DOC] container: each row's text is "
    "packed into a REAL compound file (header/FAT/miniFAT/directory, "
    "fixtures/gendoc.py build_cfb) holding a Word 97 binary whose FIB, "
    "piece table (cp1252 AND UTF-16 pieces — every body paragraph "
    "splits across a mixed-encoding piece pair), STSH heading style "
    "and PAPX FKP pages are all exercised per row; plants the "
    "extractor must drop are a HYPERLINK-field nav paragraph (link-"
    "density rule) and header/footer text placed after ccpText in CP "
    "space (structural exclusion — the docx never-read-the-part twin). "
    "The oracle derives the expected text in closed form, so identity "
    "fails if the CFB walk, piece decode, field accounting, style "
    "lookup, or subdocument clamp slips on ANY row. extractor/cfb.py; "
    "extractor/doc.py. Map-only: one pre-kernel repartition, then "
    "synth + extract in sanctioned Arrow kernels, zero shuffle after.",
)
def q137_doc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.gendoc import build_doc, para

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                blobs.append(
                    build_doc(
                        [
                            para(
                                "Navigation | Home | Search | Archive",
                                link=f"https://nav-{did}.example/",
                            ),
                            para(
                                f"Legacy archive record {did} summary",
                                style="Heading2",
                            ),
                            para(text),
                        ],
                        header_text=f"draft header {did} do not extract",
                        footer_text=f"page {did} of 999",
                    )
                )
                urls.append(f"https://doc-{did}.example/legacy.doc")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q138_mhtml_extract",
    """
    SELECT 'https://mht-' || CAST(doc_id AS VARCHAR) || '.example/saved.mht' AS url,
           text AS extracted_text,
           1 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE MHTML (.mht) web-archive extraction — browsers' "
    "save-page-as-single-file format: q25's exact page template packed "
    "into a real RFC 2557 multipart/related envelope, quoted-printable "
    "(even doc_id) or base64 (odd) transfer encoding, with a base64 "
    "image resource part riding along that must never surface. The "
    "MIME walk decodes the html part and hands it to the UNCHANGED "
    "HTML tokenizer (the EPUB shared-kernel pattern), so the oracle is "
    "q25's identity closed form: if the envelope parse, the transfer "
    "decode, the charset handling, or the resource-part exclusion "
    "slips, every row mismatches. extractor/mhtml.py; "
    "fixtures/genmht.py. Scale shape: the envelope adds zero plan "
    "nodes — same map-only kernel, stdlib MIME decode per row.",
)
def q138_mhtml_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )
    nav = (
        '<nav><ul><li><a href="/a">one link</a></li>'
        '<li><a href="/b">two link</a></li></ul></nav>'
    )

    def batches(it):
        from toyocr_spark.fixtures.genmht import build_mht

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                page = (
                    f"<html><body>{nav}<article><p>{text}"
                    "</p></article></body></html>"
                )
                blobs.append(
                    build_mht(
                        page,
                        encoding="quoted-printable" if did % 2 == 0 else "base64",
                        location=f"https://mht-{did}.example/page.html",
                    )
                )
                urls.append(f"https://mht-{did}.example/saved.mht")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q139_odt_extract",
    """
    SELECT 'https://odt-' || CAST(doc_id AS VARCHAR) || '.example/doc.odt' AS url,
           'Operations memo ' || CAST(doc_id AS VARCHAR) || ' heading'
             || chr(10) || text AS extracted_text,
           2 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE OpenDocument Text (.odt) extraction — the q129 "
    "discipline on the ODF package: each row's text is packed into a "
    "real ODF container (STORED mimetype member first per spec, "
    "manifest, content.xml, styles.xml) as heading + body paragraphs "
    "plus three boilerplate plants the extractor must drop — a "
    "link-dominated nav paragraph (link-density rule), a master-page "
    "header/footer in styles.xml (structural exclusion: never read), "
    "and an INLINE footnote whose subtree must be skipped while the "
    "sentence around its anchor stays whole (the ODF-specific "
    "wrinkle: notes live in content.xml, not a separate part). The "
    "oracle derives the expected text in closed form, so identity "
    "fails if the zip walk, mixed-content assembly, note skip, or "
    "part exclusion slips on ANY row. extractor/odt.py; "
    "fixtures/genodt.py. Map-only: one pre-kernel repartition, then "
    "synth + extract in sanctioned Arrow kernels, zero shuffle after.",
)
def q139_odt_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.genodt import build_odt, note, paragraph

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                body = [
                    paragraph(
                        "Navigation | Home | Search | Archive",
                        link=f"https://nav-{did}.example/",
                    ),
                    paragraph(f"Operations memo {did} heading", heading=2),
                    "<text:p>"
                    + text[: len(text) // 2].replace("&", "&amp;").replace("<", "&lt;")
                    + note(f"hidden footnote {did} must not extract")
                    + text[len(text) // 2 :].replace("&", "&amp;").replace("<", "&lt;")
                    + "</text:p>",
                ]
                blobs.append(
                    build_odt(
                        body_xml=body,
                        header_text=f"draft header {did} do not extract",
                        footer_text=f"page {did} of 999",
                    )
                )
                urls.append(f"https://odt-{did}.example/doc.odt")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q140_xls_extract",
    """
    SELECT 'https://xls-' || CAST(doc_id AS VARCHAR) || '.example/wb.xls' AS url,
           'Legacy workbook ' || CAST(doc_id AS VARCHAR) || ' header row'
             || chr(10) || text || ' ' || CAST(doc_id * 3 AS VARCHAR) AS extracted_text,
           2 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE legacy binary Excel (.xls / BIFF8) extraction — "
    "the q130 discipline on the [MS-XLS] record stream inside the "
    "[MS-CFB] container: each row's text is planted as an SST shared "
    "string (LABELSST index indirection, the BIFF twin of xlsx's "
    "sharedStrings) with a packed-RK numeric sibling; odd doc_ids "
    "split an SST string's character run across a CONTINUE record "
    "whose fresh flags byte FLIPS the encoding mid-string (the "
    "format's hardest legal shape); a bare-numeral chrome sheet must "
    "die by MIN_CHARS in the shared scorer. The oracle is closed form "
    "over (doc_id, text), so the CFB walk, record machine, SST "
    "reassembly, RK decode, and scoring must all be exact on every "
    "row. extractor/xls.py; fixtures/genxls.py. Map-only: one "
    "pre-kernel repartition, then synth + extract in sanctioned Arrow "
    "kernels, zero shuffle after.",
)
def q140_xls_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.genxls import build_xls

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                sheets = {
                    "report": [
                        [f"Legacy workbook {did} header row"],
                        [text, did * 3],
                    ],
                    "chrome": [[1, 2], [3, 4]],
                }
                blobs.append(build_xls(sheets, continue_split=bool(did % 2)))
                urls.append(f"https://xls-{did}.example/wb.xls")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q141_ppt_extract",
    """
    SELECT 'https://ppt-' || CAST(doc_id AS VARCHAR) || '.example/deck.ppt' AS url,
           'Briefing deck ' || CAST(doc_id AS VARCHAR) || ' title slide'
             || chr(10) || text AS extracted_text,
           2 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE legacy binary PowerPoint (.ppt) extraction — the "
    "q131 discipline on the [MS-PPT] record tree inside the [MS-CFB] "
    "container: each row's text rides a TextBytesAtom or "
    "TextCharsAtom (encoding auto-chosen per content, both paths "
    "exercised across the corpus) under the slide-collection "
    "SlideListWithText, with a title atom typed Tx_TYPE_TITLE; plants "
    "the extractor must drop are a NOTES collection (recInstance 2) "
    "and a body-typed MASTER collection (recInstance 1) — both "
    "excluded by the collection instance, the pptx notes-part "
    "structural twin. The oracle is closed form over (doc_id, text), "
    "so the CFB walk, record-tree parse, instance routing, and text "
    "decode must be exact on every row. extractor/ppt.py; "
    "fixtures/genppt.py. Map-only: one pre-kernel repartition, then "
    "synth + extract in sanctioned Arrow kernels, zero shuffle after.",
)
def q141_ppt_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.genppt import build_ppt

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                blobs.append(
                    build_ppt(
                        slides=[
                            {
                                "title": f"Briefing deck {did} title slide",
                                "body": [text],
                            }
                        ],
                        notes=[f"presenter notes {did} never extract"],
                        master_text=f"master chrome {did} never extract",
                    )
                )
                urls.append(f"https://ppt-{did}.example/deck.ppt")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q142_ods_extract",
    """
    SELECT 'https://ods-' || CAST(doc_id AS VARCHAR) || '.example/book.ods' AS url,
           'Quarterly ledger ' || CAST(doc_id AS VARCHAR) || ' header row'
             || chr(10) || text || ' ' || CAST(doc_id * 7 AS VARCHAR)
             || ' ' || CAST(doc_id * 7 AS VARCHAR) AS extracted_text,
           2 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE OpenDocument Spreadsheet (.ods) extraction — "
    "the q130/q140 discipline on the ODF package, completing the ODF "
    "trio: each row's text is planted in a real .ods (STORED mimetype "
    "first, content.xml table walk) as a header row plus a body row "
    "whose numeric sibling carries table:number-columns-repeated=2 "
    "(ODF's RLE cell model — the oracle repeats the value, so a walk "
    "that ignores the attribute mismatches every row), an inline "
    "office:annotation plant the walk must skip, a covered-table-cell "
    "merge continuation, and a bare-numeral chrome sheet that dies by "
    "MIN_CHARS in the shared scorer. The oracle is closed form over "
    "(doc_id, text). extractor/ods.py; fixtures/genods.py. Map-only: "
    "one pre-kernel repartition, then synth + extract in sanctioned "
    "Arrow kernels, zero shuffle after.",
)
def q142_ods_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.genods import build_ods, covered

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                sheets = {
                    "ledger": [
                        [f"Quarterly ledger {did} header row"],
                        [
                            {
                                "text": text,
                                "annotation": f"hidden note {did} must not extract",
                            },
                            {"text": str(did * 7), "repeat": 2},
                            covered(),
                        ],
                    ],
                    "chrome": [[7, 8], [9, 10]],
                }
                blobs.append(build_ods(sheets, header_rows=1 if did % 2 else 0))
                urls.append(f"https://ods-{did}.example/book.ods")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q143_odp_extract",
    """
    SELECT 'https://odp-' || CAST(doc_id AS VARCHAR) || '.example/deck.odp' AS url,
           'Planning deck ' || CAST(doc_id AS VARCHAR) || ' title slide'
             || chr(10) || text AS extracted_text,
           2 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE OpenDocument Presentation (.odp) extraction — "
    "the q131/q141 discipline on the ODF package, closing the "
    "three-by-three format matrix (OOXML / legacy CFB / ODF, each "
    "with word-processor, spreadsheet and deck legs): each row's text "
    "rides an outline text:list under a body frame, with a "
    "presentation:class='title' frame carrying the title; plants the "
    "extractor must drop are an INLINE presentation:notes frame "
    "(excluded STRUCTURALLY — the walk reads only draw:frame children "
    "of the page, and the notes frame is nested one level deeper — "
    "the pptx notes-part twin living inside content.xml) and "
    "master-page chrome in styles.xml (never read). The oracle is "
    "closed form over (doc_id, text). extractor/odp.py; "
    "fixtures/genodp.py. Map-only: one pre-kernel repartition, then "
    "synth + extract in sanctioned Arrow kernels, zero shuffle after.",
)
def q143_odp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.genodp import build_odp

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                blobs.append(
                    build_odp(
                        slides=[
                            {
                                "title": f"Planning deck {did} title slide",
                                "body": [text],
                                "notes": f"presenter notes {did} never extract",
                            }
                        ],
                        master_text=f"master chrome {did} never extract",
                    )
                )
                urls.append(f"https://odp-{did}.example/deck.odp")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q144_bz2_xz_extract",
    """
    SELECT 'https://env-' || CAST(doc_id AS VARCHAR) || '.example/page.html' AS url,
           text AS extracted_text,
           1 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE bz2/xz-envelope extraction — q136's gzip "
    "discipline extended to the other two codecs crawl payloads "
    "arrive in (bz2 dump shards, xz archives): q25's exact page "
    "template wrapped per doc_id%3 in ONE bz2 envelope, ONE xz "
    "envelope, or a MIXED gzip-over-bz2 double (the re-compressed "
    "dump-shard case), every inflate output-bounded before the "
    "ordinary magic-byte dispatch (extractor/core._unbz2/_unxz; the "
    "bz2 gate requires the full 10-byte header because 'BZh9' is "
    "printable prose). The oracle is q25's identity closed form: a "
    "strip or re-dispatch slip mismatches every third row. Scale "
    "shape: zero plan nodes added — same map-only kernel.",
)
def q144_bz2_xz_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )
    nav = (
        '<nav><ul><li><a href="/a">one link</a></li>'
        '<li><a href="/b">two link</a></li></ul></nav>'
    )

    def batches(it):
        import bz2
        import gzip
        import lzma

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                page = (
                    f"<html><body>{nav}<article><p>{text}"
                    "</p></article></body></html>"
                ).encode()
                k = did % 3
                if k == 0:
                    blob = bz2.compress(page, 9)
                elif k == 1:
                    blob = lzma.compress(page, format=lzma.FORMAT_XZ)
                else:
                    blob = gzip.compress(bz2.compress(page, 9), 9, mtime=0)
                urls.append(f"https://env-{did}.example/page.html")
                blobs.append(blob)
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q145_deflate_extract",
    """
    SELECT 'https://dfl-' || CAST(doc_id AS VARCHAR) || '.example/page.html' AS url,
           text AS extracted_text,
           1 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE zlib/deflate-envelope extraction — the last "
    "stdlib-expressible HTTP Content-Encoding (RFC 9110 deflate = "
    "RFC 1950 zlib), completing the envelope quartet: q25's exact "
    "page template wrapped per doc_id%3 in ONE zlib envelope, a "
    "zlib-over-zlib double, or a MIXED gzip-over-zlib. The codec's "
    "design differs from gzip/bz2/xz because its 2-byte header is "
    "forgeable by printable prose ('x^' passes the FCHECK): the gate "
    "is the full adler32-verified decode (extractor/core._unzlib "
    "requires d.eof), and a gate-passing-but-invalid stream falls "
    "back to PROSE dispatch instead of quiet-skipping — raw "
    "headerless deflate is a documented non-goal (no magic to sniff "
    "with bodies only). Oracle = q25's identity closed form. Scale "
    "shape: zero plan nodes added — same map-only kernel.",
)
def q145_deflate_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )
    nav = (
        '<nav><ul><li><a href="/a">one link</a></li>'
        '<li><a href="/b">two link</a></li></ul></nav>'
    )

    def batches(it):
        import gzip
        import zlib

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                page = (
                    f"<html><body>{nav}<article><p>{text}"
                    "</p></article></body></html>"
                ).encode()
                k = did % 3
                if k == 0:
                    blob = zlib.compress(page, 9)
                elif k == 1:
                    blob = zlib.compress(zlib.compress(page, 9), 9)
                else:
                    blob = gzip.compress(zlib.compress(page, 9), 9, mtime=0)
                urls.append(f"https://dfl-{did}.example/page.html")
                blobs.append(blob)
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q146_sitemap_index",
    """
    WITH c AS (
      SELECT doc_id, u.j AS j
      FROM documents, unnest(generate_series(0, doc_id % 4)) AS u(j)
    ),
    child AS (
      SELECT 'i' || CAST(doc_id % 7 AS VARCHAR) || '.example' AS host,
             doc_id % 7 AS h,
             '2026-0' || CAST(1 + (doc_id + j) % 9 AS VARCHAR) || '-15' AS lastmod
      FROM c
    )
    SELECT host,
           CAST(count(*) AS BIGINT) AS n_children,
           CAST(sum(CASE WHEN lastmod > '2026-0' || CAST(1 + h % 6 AS VARCHAR) || '-15'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_stale,
           max(lastmod) AS latest_child
    FROM child
    GROUP BY host
    """,
    "sitemap INDEX resolution — the two-level shape real sites force "
    "(a <urlset> caps at 50k URLs, so big hosts publish a "
    "<sitemapindex> of child sitemaps): each doc carries a synthetic "
    "index (built JVM-side, the q95 discipline), parsed back with "
    "regexp_extract_all into child (loc, lastmod) pairs, then the "
    "crawl-seeding DELTA decision — join each child against the "
    "host's last-crawl watermark (a tiny broadcast side, the q105 "
    "snapshot-state consumer) and count how many children are STALE "
    "(index lastmod newer than the watermark, i.e. must be "
    "re-fetched) vs skippable. This is the pruning that makes "
    "sitemap-driven recrawl cheap at 10^12 docs: index files are "
    "kilobytes, and only stale children ever reach the fetcher. "
    "Map-only parse, one broadcast equi-join on host, one partial-agg "
    "shuffle. The oracle predicts the parse + join + delta in closed "
    "form.",
)
def q146_sitemap_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    entry = lambda j: F.concat(  # noqa: E731
        F.lit("<sitemap><loc>https://i"),
        (did % 7).cast("string"),
        F.lit(".example/sm/"),
        did.cast("string"),
        F.lit("-"),
        j.cast("string"),
        F.lit(".xml</loc><lastmod>2026-0"),
        (1 + (did + j) % 9).cast("string"),
        F.lit("-15</lastmod></sitemap>"),
    )
    xml = F.concat(
        F.lit('<?xml version="1.0"?><sitemapindex>'),
        F.array_join(F.transform(F.sequence(F.lit(0), did % 4), entry), ""),
        F.lit("</sitemapindex>"),
    )
    idx = d.select("doc_id", xml.alias("xml"))
    parsed = idx.select(
        F.regexp_extract_all("xml", F.lit("<loc>([^<]+)</loc>"), 1).alias("locs"),
        F.regexp_extract_all(
            "xml", F.lit("<lastmod>([^<]+)</lastmod>"), 1
        ).alias("mods"),
    )
    children = parsed.select(
        F.explode(F.arrays_zip("locs", "mods")).alias("c")
    ).select(
        F.regexp_extract(F.col("c.locs"), "^https://([^/]+)/", 1).alias("host"),
        F.col("c.mods").alias("lastmod"),
    )
    # per-host last-crawl watermark: in production this is the q105
    # snapshot/CDX state; here derived in closed form so the oracle
    # can predict it. Tiny by construction (one row per host) ->
    # broadcast, never a shuffle of the children.
    watermarks = (
        d.select((did % 7).alias("h")).distinct().select(
            F.concat(F.lit("i"), F.col("h").cast("string"), F.lit(".example")).alias("host"),
            F.concat(
                F.lit("2026-0"), (1 + F.col("h") % 6).cast("string"), F.lit("-15")
            ).alias("last_crawl"),
        )
    )
    joined = children.join(F.broadcast(watermarks), "host")
    return joined.groupBy("host").agg(
        F.count("*").alias("n_children"),
        F.sum(
            F.when(F.col("lastmod") > F.col("last_crawl"), 1).otherwise(0)
        ).alias("n_stale"),
        F.max("lastmod").alias("latest_child"),
    )


@_q(
    "q147_atom_feeds",
    """
    WITH feeds AS (
      SELECT doc_id, u.k AS entry_idx,
             'https://a' || (doc_id % 9) || '.example/entry/' || (doc_id * 10 + u.k) AS link,
             1 + (doc_id + u.k) % 28 AS upd_day
      FROM documents, unnest(generate_series(0, 1 + doc_id % 3)) AS u(k)
      WHERE doc_id < 150
    )
    SELECT doc_id, CAST(entry_idx AS INTEGER) AS entry_idx, link,
           CAST(upd_day AS INTEGER) AS upd_day
    FROM feeds
    """,
    "Atom feed ingestion — q118's RSS twin with Atom's real wrinkle: "
    "the entry link is an ATTRIBUTE (<link href=.../>), not element "
    "text, and feeds carry rel='self'/rel='enclosure' links that must "
    "NOT become frontier URLs — the fixture plants a feed-level "
    "rel='self' decoy whose host would corrupt every group if mined; "
    "only rel='alternate' hrefs survive the parse. Built JVM-side, "
    "parsed back with regexp_extract_all + arrays_zip + posexplode "
    "into one row per entry with link and <updated> day. Closed-form "
    "oracle; map-only, zero shuffle.",
)
def q147_atom_feeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    entry = lambda k: F.concat(  # noqa: E731
        F.lit('<entry><link href="https://a'),
        F.pmod(F.col("doc_id"), F.lit(9)).cast("string"),
        F.lit(".example/entry/"),
        (F.col("doc_id") * 10 + k).cast("string"),
        F.lit('" rel="alternate"/><updated>2026-02-'),
        F.lpad((F.lit(1) + F.pmod(F.col("doc_id") + k, F.lit(28))).cast("string"), 2, "0"),
        F.lit("T00:00:00Z</updated></entry>"),
    )
    xml = F.concat(
        F.lit('<feed xmlns="http://www.w3.org/2005/Atom">'
              '<link href="https://decoy.example/feed.xml" rel="self"/>'),
        F.aggregate(
            F.transform(
                F.sequence(F.lit(0), F.lit(1) + F.pmod(F.col("doc_id"), F.lit(3))), entry
            ),
            F.lit(""),
            lambda acc, x: F.concat(acc, x),
        ),
        F.lit("</feed>"),
    )
    feeds = d.select("doc_id", xml.alias("xml"))
    items = feeds.select(
        "doc_id",
        F.posexplode(
            F.arrays_zip(
                F.regexp_extract_all(
                    F.col("xml"),
                    F.lit('<link href="([^"]+)" rel="alternate"/>'),
                    1,
                ),
                F.regexp_extract_all(
                    F.col("xml"), F.lit("<updated>2026-02-([0-9]{2})T"), 1
                ),
            )
        ).alias("entry_idx", "p"),
    )
    return items.select(
        "doc_id",
        F.col("entry_idx").cast("int").alias("entry_idx"),
        F.col("p.0").alias("link"),
        F.col("p.1").cast("int").alias("upd_day"),
    )


@_q(
    "q148_opengraph",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'article' ELSE 'website' END AS og_type,
           length('OG headline ' || CAST(doc_id AS VARCHAR)) AS title_len,
           CAST(doc_id % 3 AS BIGINT) AS n_images
    FROM documents
    WHERE doc_id < 200
    """,
    "OpenGraph social-metadata harvest — the curation twin of q43's "
    "document metadata: og:type / og:title / og:image mined from "
    "<meta property='og:*' content='...'> head tags (the q111 "
    "caption-mining family's upstream signal: og:image is the "
    "canonical image-caption pair source at crawl scale). The fixture "
    "plants a twitter:card decoy meta tag that the property-anchored "
    "regexp must not count. All JVM regexp over the head, zero "
    "shuffle; closed-form oracle.",
)
def q148_opengraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    did = F.col("doc_id")
    img = lambda k: F.concat(  # noqa: E731
        F.lit('<meta property="og:image" content="https://img.example/'),
        did.cast("string"),
        F.lit("-"),
        k.cast("string"),
        F.lit('.jpg"/>'),
    )
    head = F.concat(
        F.lit('<head><meta name="twitter:card" content="summary"/>'
              '<meta property="og:title" content="OG headline '),
        did.cast("string"),
        F.lit('"/><meta property="og:type" content="'),
        F.when(did % 2 == 0, F.lit("article")).otherwise(F.lit("website")),
        F.lit('"/>'),
        F.aggregate(
            F.when(
                did % 3 == 0, F.array().cast("array<string>")
            ).otherwise(
                F.transform(F.sequence(F.lit(1), did % 3), img)
            ),
            F.lit(""),
            lambda acc, x: F.concat(acc, x),
        ),
        F.lit("</head>"),
    )
    pages = d.select("doc_id", head.alias("html"))
    return pages.select(
        "doc_id",
        F.regexp_extract(
            "html", '<meta property="og:type" content="([^"]+)"', 1
        ).alias("og_type"),
        F.length(
            F.regexp_extract(
                "html", '<meta property="og:title" content="([^"]+)"', 1
            )
        ).alias("title_len"),
        F.size(
            F.regexp_extract_all(
                "html", F.lit('<meta property="og:image" content="([^"]+)"'), 1
            )
        ).cast("long").alias("n_images"),
    )


@_q(
    "q149_robots_wildcards",
    """
    WITH u AS (
      SELECT DISTINCT
             'r' || CAST(doc_id % 5 AS VARCHAR) || '.example' AS host,
             CASE doc_id % 7
               WHEN 0 THEN '/public/' || CAST(doc_id AS VARCHAR)
               WHEN 1 THEN '/private/' || CAST(doc_id AS VARCHAR)
               WHEN 2 THEN '/private/ok'
               WHEN 3 THEN '/private/okay'
               WHEN 4 THEN '/tmp/' || CAST(doc_id AS VARCHAR) || '.pdf'
               WHEN 5 THEN '/tmp/' || CAST(doc_id AS VARCHAR) || '.pdfx'
               ELSE '/tmp/deep/' || CAST(doc_id AS VARCHAR) || '.pdf'
             END AS path,
             CASE WHEN doc_id % 7 IN (1, 3, 4, 6) THEN 1 ELSE 0 END AS blocked
      FROM documents
    )
    SELECT host, path, CAST(blocked AS INTEGER) AS blocked FROM u
    """,
    "RFC 9309 robots.txt wildcard admission — the spec-complete "
    "upgrade of q86's prefix subset: Allow AND Disallow lines, '*' "
    "matching any character run, a TRAILING '$' anchoring at the "
    "path end, longest-raw-pattern-wins precedence with Allow "
    "beating Disallow on exact length ties, no-match means allowed. "
    "Every rule pattern is translated ONCE on the tiny rules side to "
    "an anchored regex (all metacharacters escaped first, so no rule "
    "byte can inject regex semantics); the per-URL match is one "
    "broadcast join + rlike + a partial-agg max of the (pat_len, "
    "allow) precedence struct — the url table never shuffles except "
    "on its own aggregation key. The fixture plants the spec's "
    "trap families: '/private/okay' must NOT match 'Allow: "
    "/private/ok$' (the anchor), '/tmp/<id>.pdfx' must NOT match "
    "'Disallow: /tmp/*.pdf$', and '/tmp/deep/<id>.pdf' MUST (the "
    "mid-pattern wildcard crossing a slash). urlfns."
    "parse_robots_patterns / robots_admission_rfc9309; verdicts "
    "closed-form per doc_id%7.",
)
def q149_robots_wildcards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.functions.urlfns import (
        parse_robots_patterns,
        robots_admission_rfc9309,
    )

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    robots_txt = (
        "User-agent: *\nDisallow: /private*\nAllow: /private/ok$\n"
        "Disallow: /tmp/*.pdf$\nAllow: /\n"
    )
    robots = (
        d.select((did % 5).alias("h")).distinct().select(
            F.concat(F.lit("r"), F.col("h").cast("string"), F.lit(".example")).alias("host"),
            F.lit(robots_txt).alias("txt"),
        )
    )
    pats = parse_robots_patterns(robots, "host", "txt")
    idstr = did.cast("string")
    path = (
        F.when(did % 7 == 0, F.concat(F.lit("/public/"), idstr))
        .when(did % 7 == 1, F.concat(F.lit("/private/"), idstr))
        .when(did % 7 == 2, F.lit("/private/ok"))
        .when(did % 7 == 3, F.lit("/private/okay"))
        .when(did % 7 == 4, F.concat(F.lit("/tmp/"), idstr, F.lit(".pdf")))
        .when(did % 7 == 5, F.concat(F.lit("/tmp/"), idstr, F.lit(".pdfx")))
        .otherwise(F.concat(F.lit("/tmp/deep/"), idstr, F.lit(".pdf")))
    )
    urls = d.select(
        F.concat(F.lit("r"), (did % 5).cast("string"), F.lit(".example")).alias("host"),
        path.alias("path"),
    )
    return robots_admission_rfc9309(urls, pats)


@_q(
    "q150_hreflang_pairs",
    """
    WITH clusters AS (
      SELECT DISTINCT doc_id // 2 AS cluster
      FROM documents WHERE doc_id < 300
    )
    SELECT CAST(cluster AS BIGINT) AS cluster,
           'https://h' || CAST(cluster AS VARCHAR) || '.example/en' AS url_en,
           'https://h' || CAST(cluster AS VARCHAR) || '.example/fr' AS url_fr
    FROM clusters WHERE cluster % 7 <> 3
    """,
    "hreflang reciprocal page pairing — the bitext-mining SEED (how "
    "ParaCrawl-style pipelines discover parallel pages upstream of "
    "q114 candidates / q116 alignment): every page declares its "
    "translations via <link rel='alternate' hreflang=.. href=..>, and "
    "a pair is trusted only when BOTH directions declare each other. "
    "The fixture plants three traps: an x-default link (fails the "
    "[a-z]{2} lang anchor), a rel='stylesheet' link (fails the rel "
    "gate), and — the real one — every cluster%7==3 fr page OMITS its "
    "back-link, so a miner that skips the reciprocity join emits "
    "phantom pairs plus an hreflang='xx' spam edge that no reciprocal "
    "source ever answers. Edges mined all-JVM (regexp_extract_all + "
    "arrays_zip), then one equi-join of fr-edges against en-edges on "
    "(dst=src AND src=dst) — the edge-vs-edge shuffle is the genuine "
    "100 TB shape (both sides corpus-sized, no broadcast pretense).",
)
def q150_hreflang_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    did = F.col("doc_id")
    cluster = F.floor(did / 2).cast("long")
    role_fr = (did % 2) == 1
    base = F.concat(F.lit("https://h"), cluster.cast("string"), F.lit(".example/"))
    url_en = F.concat(base, F.lit("en"))
    url_fr = F.concat(base, F.lit("fr"))
    alt = lambda lang, href: F.concat(  # noqa: E731
        F.lit('<link rel="alternate" hreflang="'), F.lit(lang),
        F.lit('" href="'), href, F.lit('"/>'),
    )
    # en pages always declare fr (plus the spam edge); fr pages answer
    # back EXCEPT in cluster%7==3 (the non-reciprocal trap).
    head = F.concat(
        F.lit('<link rel="stylesheet" href="https://cdn.example/site.css"/>'
              '<link rel="alternate" hreflang="x-default" href="https://decoy.example/"/>'),
        F.when(
            role_fr,
            F.when(cluster % 7 == 3, F.lit("")).otherwise(alt("en", url_en)),
        ).otherwise(
            F.concat(
                alt("fr", url_fr),
                alt("xx", F.concat(F.lit("https://spam.example/"), cluster.cast("string"))),
            )
        ),
    )
    pages = d.select(
        F.when(role_fr, url_fr).otherwise(url_en).alias("src_url"),
        head.alias("html"),
    )
    link_pat = '<link rel="alternate" hreflang="{}" href="{}"/>'
    edges = pages.select(
        "src_url",
        F.explode(
            F.arrays_zip(
                F.regexp_extract_all(
                    "html", F.lit(link_pat.format("([a-z]{2})", '[^"]+')), 1
                ).alias("lang"),
                F.regexp_extract_all(
                    "html", F.lit(link_pat.format("[a-z]{2}", '([^"]+)')), 1
                ).alias("dst_url"),
            )
        ).alias("e"),
    ).select("src_url", F.col("e.lang").alias("lang"), F.col("e.dst_url").alias("dst_url"))
    fr_claims = edges.filter(F.col("lang") == "fr").select(
        F.col("src_url").alias("url_en"), F.col("dst_url").alias("url_fr")
    )
    en_claims = edges.filter(F.col("lang") == "en").select(
        F.col("src_url").alias("b_fr"), F.col("dst_url").alias("b_en")
    )
    pairs = fr_claims.join(
        en_claims,
        (F.col("url_fr") == F.col("b_fr")) & (F.col("url_en") == F.col("b_en")),
    )
    return pairs.select(
        F.regexp_extract("url_en", r"https://h(\d+)\.example", 1)
        .cast("long")
        .alias("cluster"),
        "url_en",
        "url_fr",
    ).distinct()


@_q(
    "q151_microdata",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'Product' ELSE 'Article' END AS item_type,
           length('Item name ' || CAST(doc_id AS VARCHAR)) AS name_len,
           CAST(2 + doc_id % 3 AS BIGINT) AS n_props
    FROM documents WHERE doc_id < 200
    """,
    "schema.org MICRODATA harvest — the attribute-carried sibling of "
    "q98's JSON-LD (the two wire formats of the same structured-data "
    "vocabulary; a crawl-scale curator needs both because publishers "
    "split roughly evenly): itemtype mined from itemscope containers, "
    "itemprop values and counts from the property attributes. The "
    "fixture plants a data-itemprop='fake' custom attribute that an "
    "unanchored regexp would count — the space-anchored ' itemprop=' "
    "pattern must not match inside 'data-itemprop=' — plus a "
    "single-quoted decoy. All JVM regexp, zero shuffle; closed-form "
    "oracle.",
)
def q151_microdata(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    did = F.col("doc_id")
    prop = lambda k: F.concat(  # noqa: E731
        F.lit('<span itemprop="extra'), k.cast("string"), F.lit('">v</span>')
    )
    html = F.concat(
        F.lit('<div itemscope itemtype="https://schema.org/'),
        F.when(did % 2 == 0, F.lit("Product")).otherwise(F.lit("Article")),
        F.lit("\"><i data-itemprop=\"fake\">decoy</i>"
              "<b itemprop='sq'>single-quoted decoy</b>"
              '<span itemprop="name">Item name '),
        did.cast("string"),
        F.lit('</span><meta itemprop="price" content="9.99"/>'),
        F.aggregate(
            F.when(did % 3 == 0, F.array().cast("array<string>")).otherwise(
                F.transform(F.sequence(F.lit(1), did % 3), prop)
            ),
            F.lit(""),
            lambda acc, x: F.concat(acc, x),
        ),
        F.lit("</div>"),
    )
    pages = d.select("doc_id", html.alias("html"))
    return pages.select(
        "doc_id",
        F.regexp_extract(
            "html", r'itemtype="https://schema\.org/([A-Za-z]+)"', 1
        ).alias("item_type"),
        F.length(
            F.regexp_extract("html", r'[ ]itemprop="name"[^>]*>([^<]+)<', 1)
        ).alias("name_len"),
        F.size(
            F.regexp_extract_all("html", F.lit(r'[ ]itemprop="([^"]+)"'), 1)
        ).cast("long").alias("n_props"),
    )


@_q(
    "q152_markdown_extract",
    """
    SELECT 'https://md-' || CAST(doc_id AS VARCHAR) || '.example/README.md' AS url,
           'Operations memo ' || CAST(doc_id AS VARCHAR) || ' heading'
             || chr(10) || text AS extracted_text,
           2 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE Markdown extraction — the fifteenth format "
    "dispatch leg, covering the plain-text markup of code-adjacent "
    "crawls (READMEs, doc sites). Each row's text is packed into a "
    "README-shaped document with three plants the extractor must "
    "drop: a YAML front-matter block whose title: line must never "
    "extract (structural metadata, the styles.xml discipline), a "
    "link-dominated nav line (dies by the shared link-density rule, "
    "exactly like HTML <a> crumbs), and inline **emphasis** markers "
    "that must resolve to plain text. Markdown has NO magic bytes, so "
    "this leg also proves the structural-evidence sniff end-to-end "
    "(strict-UTF-8, non-'<' start, heading + >=3 markers). The oracle "
    "derives the expected text in closed form, so gate, front-matter "
    "skip, inline resolution, and scoring must be exact on every row. "
    "extractor/markdown.py; fixtures/genmd.py. Map-only: one "
    "pre-kernel repartition, then synth + extract in sanctioned Arrow "
    "kernels, zero shuffle after.",
)
def q152_markdown_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.genmd import build_md

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                words = text.split(" ")
                mid = len(words) // 2
                words[mid] = f"**{words[mid]}**"
                blobs.append(
                    build_md(
                        f"Operations memo {did} heading",
                        [" ".join(words)],
                        front_matter=f"title: planted front-matter decoy {did}",
                        host=f"nav-{did}.example",
                    )
                )
                urls.append(f"https://md-{did}.example/README.md")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q153_tar_extract",
    """
    SELECT 'https://tar-' || CAST(doc_id AS VARCHAR) || '.example/bundle.tar' AS url,
           'Archive doc ' || CAST(doc_id AS VARCHAR) || ' heading'
             || chr(10) || text
             || chr(10) || 'Readme ' || CAST(doc_id AS VARCHAR) || ' heading long enough'
             || chr(10) || 'Readme body paragraph for document '
             || CAST(doc_id AS VARCHAR) || ' inside the archive' AS extracted_text,
           4 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE TAR multi-document extraction — the bundle "
    "format of arXiv sources and dataset dumps: each row's archive "
    "carries an HTML member (nav plant + heading + the row's text), a "
    "GZIPPED markdown README member (the in-archive envelope strip), "
    "an opaque PNG resource that must never reach the lossy-decode "
    "path, a NESTED tar that must not recurse, and a directory + "
    "symlink pair (structural, skipped). Every member re-enters the "
    "shared format dispatch (core.dispatch_blocks), ordinals renumber "
    "across members so islands span boundaries, and odd doc_ids wrap "
    "the WHOLE archive in gzip (.tar.gz via the transfer-envelope "
    "strip). The oracle derives both members' surviving text in "
    "closed form. extractor/tarleg.py; fixtures/gentar.py. Map-only: "
    "one pre-kernel repartition, then synth + extract in sanctioned "
    "Arrow kernels, zero shuffle after.",
)
def q153_tar_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )
    nav = (
        '<nav><ul><li><a href="/a">one link</a></li>'
        '<li><a href="/b">two link</a></li></ul></nav>'
    )

    def batches(it):
        import gzip

        from toyocr_spark.fixtures.genmd import build_md
        from toyocr_spark.fixtures.gentar import build_tar

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                page = (
                    f"<html><body>{nav}<h1>Archive doc {did} heading</h1>"
                    f"<p>{text}</p></body></html>"
                ).encode()
                md = build_md(
                    f"Readme {did} heading long enough",
                    [f"Readme body paragraph for document {did} inside the archive"],
                )
                png = b"\x89PNG\r\n\x1a\n" + bytes(range(256))
                blob = build_tar(
                    [
                        ("page.html", page),
                        ("README.md.gz", gzip.compress(md, 9, mtime=0)),
                        ("res/logo.png", png),
                        ("inner.tar", build_tar([("x.txt", b"nested never recurses " * 3)])),
                    ],
                    with_dir=True,
                    with_symlink=True,
                )
                if did % 2:
                    blob = gzip.compress(blob, 9, mtime=0)
                urls.append(f"https://tar-{did}.example/bundle.tar")
                blobs.append(blob)
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q154_crawl_traps",
    """
    WITH hosts AS (
      SELECT doc_id % 20 AS h,
             count(*) AS n_urls,
             count(DISTINCT CASE WHEN doc_id % 20 < 4
                    THEN '/cal/N-N-N/event'
                    ELSE '/p/' || translate(CAST(doc_id AS VARCHAR),
                                            '0123456789', 'abcdefghij')
                         || '/item' END) AS n_templates
      FROM documents GROUP BY doc_id % 20
    )
    SELECT 'trap-host-' || CAST(h AS VARCHAR) || '.example' AS host,
           n_urls, CAST(n_templates AS BIGINT) AS n_templates,
           n_templates * 8 < n_urls AS is_trap
    FROM hosts
    """,
    "crawl-trap detection — the frontier-poisoning defense every real "
    "crawler needs: calendar pages, session-id echoes and faceted "
    "search generate INFINITE url spaces under one host, and the "
    "tell is template collapse (digit runs -> N) leaving far fewer "
    "distinct path TEMPLATES than paths. Hosts 0-3 plant the trap "
    "shape (a /cal/YYYY-MM-DD/event calendar: every url distinct, "
    "every template identical after collapse); organic hosts carry "
    "letter-keyed paths whose templates stay distinct per url. Flag "
    "= integer cross-multiplied ratio (templates*8 < urls), the "
    "scorer discipline. One regexp_replace map + a partial-agg "
    "count(DISTINCT) two-phase shape — no per-host url collection "
    "ever materializes, so the hottest trap host (millions of urls, "
    "ONE template) arrives at the final agg as one row. All JVM, "
    "closed-form oracle.",
)
def q154_crawl_traps(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    h = F.pmod(did, F.lit(20))
    host = F.concat(F.lit("trap-host-"), h.cast("string"), F.lit(".example"))
    path = F.when(
        h < 4,
        F.concat(
            F.lit("/cal/20"),
            F.lpad((did % 26).cast("string"), 2, "0"),
            F.lit("-"),
            F.lpad((1 + did % 12).cast("string"), 2, "0"),
            F.lit("-"),
            F.lpad((1 + did % 28).cast("string"), 2, "0"),
            F.lit("/event"),
        ),
    ).otherwise(
        F.concat(
            F.lit("/p/"),
            F.translate(did.cast("string"), "0123456789", "abcdefghij"),
            F.lit("/item"),
        )
    )
    urls = d.select(host.alias("host"), path.alias("path"))
    templ = F.regexp_replace("path", r"[0-9]+", "N")
    per_host = urls.select("host", templ.alias("template")).groupBy("host").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct("template").alias("n_templates"),
    )
    return per_host.select(
        "host",
        "n_urls",
        "n_templates",
        (F.col("n_templates") * 8 < F.col("n_urls")).alias("is_trap"),
    )


@_q(
    "q155_politeness_schedule",
    """
    WITH frontier AS (
      SELECT doc_id,
             'p' || CAST(doc_id % 9 AS VARCHAR) || '.example' AS host,
             CAST((doc_id * 11) % 100 AS BIGINT) AS priority
      FROM documents WHERE doc_id < 450
    ),
    waved AS (
      SELECT doc_id, host, priority,
             CAST(row_number() OVER (
               PARTITION BY host ORDER BY priority DESC, doc_id
             ) AS BIGINT) AS wave
      FROM frontier
    ),
    delays AS (
      SELECT DISTINCT 'p' || CAST(doc_id % 9 AS VARCHAR) || '.example' AS host,
             CAST(CASE WHEN doc_id % 9 = 4 THEN 1
                       ELSE 2 + (doc_id % 9) % 5 END AS BIGINT) AS delay_s
      FROM documents WHERE doc_id < 450
    )
    SELECT w.doc_id, w.host, w.wave, d.delay_s,
           (w.wave - 1) * d.delay_s AS fetch_offset_s
    FROM waved w JOIN delays d ON w.host = d.host
    """,
    "politeness schedule with real robots Crawl-delay: the step after "
    "q92's wave assignment — each host's robots.txt is parsed by "
    "urlfns.parse_robots_directives (case-insensitive Crawl-delay, "
    "max-of-duplicates, unparseable -> NULL -> the 1s default), and a "
    "url's earliest polite fetch time is (wave-1) * delay. One host "
    "plants an unparseable 'Crawl-delay: soon' to prove the NULL "
    "default path end-to-end. Shapes: the per-host window is the "
    "politeness-natural partition (q92's argument), the delay table "
    "is one row per host -> broadcast join, never a shuffle of the "
    "frontier. Integer arithmetic throughout; closed-form oracle.",
)
def q155_politeness_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from toyocr_spark.functions.urlfns import parse_robots_directives

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
    did = F.col("doc_id")
    host = F.concat(F.lit("p"), (did % 9).cast("string"), F.lit(".example"))
    frontier = d.select(
        "doc_id", host.alias("host"), ((did * 11) % 100).alias("priority")
    )
    w_host = Window.partitionBy("host").orderBy(F.desc("priority"), F.col("doc_id"))
    waved = frontier.withColumn("wave", F.row_number().over(w_host).cast("long"))
    # one robots.txt per host, parsed by the REAL directives parser;
    # host p4 plants an unparseable value (NULL -> the 1s default)
    robots = (
        d.select((did % 9).alias("h")).distinct().select(
            F.concat(F.lit("p"), F.col("h").cast("string"), F.lit(".example")).alias(
                "host"
            ),
            F.when(
                F.col("h") == 4, F.lit("User-agent: *\ncrawl-delay: soon\n")
            ).otherwise(
                F.concat(
                    F.lit("User-agent: *\nCrawl-delay: "),
                    (F.lit(2) + F.pmod(F.col("h"), F.lit(5))).cast("string"),
                    F.lit("\n"),
                )
            ).alias("txt"),
        )
    )
    delays = parse_robots_directives(robots, "host", "txt").select(
        "host", F.coalesce(F.col("crawl_delay"), F.lit(1)).cast("long").alias("delay_s")
    )
    return waved.join(F.broadcast(delays), "host").select(
        "doc_id",
        "host",
        "wave",
        "delay_s",
        ((F.col("wave") - 1) * F.col("delay_s")).alias("fetch_offset_s"),
    )


@_q(
    "q156_hits",
    """
    WITH edges AS (
      SELECT DISTINCT doc_id % 80 AS src, (doc_id * 11 + 5) % 80 AS dst
      FROM documents WHERE doc_id % 80 <> (doc_id * 11 + 5) % 80
    ),
    nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
    h0 AS (SELECT id, 1000000 AS h FROM nodes),
    a1 AS (SELECT dst AS id, sum(h) AS a
           FROM edges JOIN h0 ON h0.id = edges.src GROUP BY dst),
    h1 AS (SELECT src AS id, sum(coalesce(a1.a, 0)) AS h
           FROM edges LEFT JOIN a1 ON a1.id = edges.dst GROUP BY src),
    a2 AS (SELECT dst AS id, sum(coalesce(h1.h, 0)) AS a
           FROM edges LEFT JOIN h1 ON h1.id = edges.src GROUP BY dst),
    h2 AS (SELECT src AS id, sum(coalesce(a2.a, 0)) AS h
           FROM edges LEFT JOIN a2 ON a2.id = edges.dst GROUP BY src)
    SELECT n.id,
           CAST(coalesce(h2.h, 0) AS BIGINT) AS hub_scaled,
           CAST(coalesce(a2.a, 0) AS BIGINT) AS auth_scaled
    FROM nodes n
    LEFT JOIN h2 ON h2.id = n.id
    LEFT JOIN a2 ON a2.id = n.id
    """,
    "HITS hubs & authorities — q44 PageRank's classic companion for "
    "crawl prioritization (a good HUB page seeds the frontier even "
    "when its own rank is low; a good AUTHORITY is worth recrawling "
    "first). Two full mutual-reinforcement rounds (a = E^T h, "
    "h = E a) in pure integer arithmetic — the usual L2 "
    "normalization is a float trap across engines, and with a "
    "bounded round count the unnormalized BIGINT magnitudes stay "
    "exact (<= |V|^3 * scale fits comfortably), so the result is "
    "bit-identical anywhere. Each half-round is one equi-join + one "
    "partial agg on the EDGE list (the q44/CC iterative shape): at "
    "10^10 edges that is bounded shuffle work per round, never an "
    "adjacency materialization. Oracle = the same rounds unrolled as "
    "CTEs.",
)
def q156_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    src = F.col("doc_id") % 80
    dst = (F.col("doc_id") * 11 + 5) % 80
    edges = (
        d.select(src.alias("src"), dst.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)  # reused four times: cut lineage once
    )
    nodes = edges.select(F.col("src").alias("id")).union(edges.select("dst")).distinct()
    h = nodes.withColumn("h", F.lit(1000000).cast("long"))

    def auth_from(hubs: DataFrame) -> DataFrame:
        return (
            edges.join(hubs.withColumnRenamed("id", "src"), "src", "left")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.coalesce(F.col("h"), F.lit(0))).alias("a"))
        )

    def hub_from(auths: DataFrame) -> DataFrame:
        return (
            edges.join(auths.withColumnRenamed("id", "dst"), "dst", "left")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum(F.coalesce(F.col("a"), F.lit(0))).alias("h"))
        )

    a1 = auth_from(h)
    h1 = hub_from(a1)
    a2 = auth_from(h1)
    h2 = hub_from(a2)
    return (
        nodes.join(h2, "id", "left")
        .join(a2, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("h"), F.lit(0)).alias("hub_scaled"),
            F.coalesce(F.col("a"), F.lit(0)).alias("auth_scaled"),
        )
    )


@_q(
    "q157_registrable_domain",
    """
    WITH d AS (
      SELECT doc_id % 50 AS k, CAST(doc_id % 3 AS INTEGER) AS b FROM documents
    )
    SELECT CASE b
             WHEN 0 THEN 'site' || CAST(k AS VARCHAR) || '.com'
             WHEN 1 THEN 'shop' || CAST(k AS VARCHAR) || '.co.uk'
             ELSE 'site' || CAST(k AS VARCHAR) || '.org' END AS domain,
           CAST(1 AS BIGINT) AS n_hosts,
           count(*) AS n_docs
    FROM d GROUP BY b, k
    """,
    "registrable-domain (eTLD+1) grouping — THE curation unit of "
    "RefinedWeb-style per-domain caps and C4 host dedup: 'a.shop.co.uk'"
    " and 'b.shop.co.uk' are one publisher, and naive last-two-labels "
    "grouping would wrongly merge every .co.uk site into one. The "
    "LONGEST public-suffix match is computed for real Spark-side: "
    "bounded dot-suffix explode (urlfns.host_suffixes, the q66 shape) "
    "equi-joined to a broadcast suffix table, per-host argmax on "
    "suffix length (so 'co.uk' beats 'uk' — the trap every host in "
    "the b=1 family plants), then eTLD+1 = one label more than the "
    "winning suffix via a negative-index array slice. The oracle "
    "plants the expected domain per (k, branch) in closed form, so a "
    "shorter-match or off-by-one-label bug fails every third row. "
    "Shapes: explode is bounded by label depth, the suffix table "
    "broadcasts, one partial agg per host then one per domain.",
)
def q157_registrable_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.functions.urlfns import host_suffixes

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    k = (did % 50).cast("string")
    b = did % 3
    host = (
        F.when(b == 0, F.concat(F.lit("www.site"), k, F.lit(".com")))
        .when(b == 1, F.concat(F.lit("sub"), k, F.lit(".shop"), k, F.lit(".co.uk")))
        .otherwise(F.concat(F.lit("a.b.site"), k, F.lit(".org")))
    )
    docs = d.select("doc_id", host.alias("host"))
    psl = spark.createDataFrame(
        [("com",), ("org",), ("uk",), ("co.uk",), ("net",)], "suffix string"
    )
    matched = (
        docs.select("host").distinct()
        .select("host", F.explode(host_suffixes(F.col("host"))).alias("suffix"))
        .join(F.broadcast(psl), "suffix")
        .groupBy("host")
        .agg(F.max(F.struct(F.length("suffix").alias("l"), F.col("suffix").alias("s"))).alias("m"))
    )
    labels = F.split(F.col("host"), "\\.")
    n_sfx = F.size(F.split(F.col("m.s"), "\\."))
    regd = F.when(
        F.size(labels) > n_sfx,
        F.array_join(F.slice(labels, -(n_sfx + 1), n_sfx + 1), "."),
    ).otherwise(F.col("host"))
    host_domain = matched.select("host", regd.alias("domain"))
    return (
        docs.join(F.broadcast(host_domain), "host")
        .groupBy("domain")
        .agg(
            F.countDistinct("host").alias("n_hosts"),
            F.count("*").alias("n_docs"),
        )
    )


@_q(
    "q158_csv_extract",
    """
    SELECT 'https://csv-' || CAST(doc_id AS VARCHAR) || '.example/data.tsv' AS url,
           'record title column payload column'
             || chr(10) || 'entry ' || CAST(doc_id AS VARCHAR) || ' ' || text
             || ' he said "ok"' AS extracted_text,
           2 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE CSV/TSV extraction — the seventeenth dispatch "
    "leg, covering the delimiter-separated tables of dataset crawls. "
    "Each row's text rides a TSV (header + one data record + a "
    "bare-numeral chrome row that must die by MIN_CHARS, the xls "
    "discipline) built by the independent stdlib-csv writer, with a "
    "QUOTED field carrying doubled double-quotes the reader must "
    "undo — a naive split leaves the quoting in the text (the "
    "quoted-DELIMITER case is unit-tested with count-balanced lines, "
    "since it deliberately fails the sniff otherwise). CSV has NO "
    "magic bytes, so this leg also proves the constant-delimiter-"
    "count structural sniff end-to-end. Closed-form oracle: gate, "
    "quote handling, header-title kind, and chrome-row drop must be "
    "exact on every row. extractor/csvleg.py; fixtures/gencsv.py. "
    "Map-only: one pre-kernel repartition, then synth + extract in "
    "sanctioned Arrow kernels, zero shuffle after.",
)
def q158_csv_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.gencsv import build_csv

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                # a field containing a literal double-quote: the csv
                # writer quotes the cell and doubles the quote, the
                # reader must undo both (a naive split leaves '""' in
                # the text) — and unlike a quoted delimiter this trap
                # is count-neutral, so the structural sniff still sees
                # a constant tab count per line
                payload = text + ' he said "ok"'
                blob = build_csv(
                    ["record title column", "payload column"],
                    [[f"entry {did}", payload], ["1", "2"]],
                )
                urls.append(f"https://csv-{did}.example/data.tsv")
                blobs.append(blob)
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q159_latex_extract",
    """
    SELECT 'https://arxiv-' || CAST(doc_id AS VARCHAR) || '.example/main.tex' AS url,
           'Technical note ' || CAST(doc_id AS VARCHAR) || ' heading'
             || chr(10) || text AS extracted_text,
           2 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE LaTeX extraction — the eighteenth format "
    "dispatch leg, covering the source markup of the scientific web "
    "(arXiv e-print sources, the canonical .tex-in-.tar bundle). Each "
    "row's text rides an arXiv-shaped document with four plants the "
    "extractor must drop: a % comment banner (never read), preamble "
    "\\author/\\date metadata (the docProps discipline — \\title "
    "renders ONLY through \\maketitle), a link-dominated \\href nav "
    "line (dies by the shared link-density rule, exactly like HTML "
    "<a> crumbs), and an inline \\textbf{} wrapper that must resolve "
    "to plain text. LaTeX has NO magic bytes, so this leg also proves "
    "the first-significant-line structural sniff end-to-end "
    "(\\documentclass-led, >= 2 more markers). The oracle derives the "
    "expected text in closed form, so gate, preamble skip, maketitle "
    "rendering, inline resolution, and scoring must be exact on every "
    "row. extractor/latexleg.py; fixtures/genlatex.py. Map-only: one "
    "pre-kernel repartition, then synth + extract in sanctioned Arrow "
    "kernels, zero shuffle after.",
)
def q159_latex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.genlatex import build_latex

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                words = text.split(" ")
                mid = len(words) // 2
                words[mid] = f"\\textbf{{{words[mid]}}}"
                blobs.append(
                    build_latex(
                        f"Technical note {did} heading",
                        [" ".join(words)],
                        comment=f"planted comment decoy {did}",
                        author=f"Planted Author Decoy {did}",
                        host=f"nav-{did}.example",
                    )
                )
                urls.append(f"https://arxiv-{did}.example/main.tex")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q160_ipynb_extract",
    """
    SELECT 'https://nb-' || CAST(doc_id AS VARCHAR) || '.example/analysis.ipynb' AS url,
           'Notebook ' || CAST(doc_id AS VARCHAR) || ' analysis'
             || chr(10) || text
             || chr(10) || 'ans = ' || CAST(doc_id AS VARCHAR) || ' * 2 print(ans)'
             || chr(10) || 'planted stream output row ' || CAST(doc_id AS VARCHAR) AS extracted_text,
           4 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE Jupyter-notebook extraction — the nineteenth "
    "format dispatch leg, covering the .ipynb JSON documents of "
    "code-hosting crawls (GitHub, Kaggle), one of the densest "
    "code+prose training sources on the web. Each row's text rides an "
    "nbformat-v4 notebook with five plants the extractor must drop: "
    "kernelspec/language_info metadata (never read), a link-dominated "
    "markdown nav cell (dies by the shared link-density rule), an "
    "image/png display output (binary payload — walk-don't-decode), "
    "an error-output traceback, and a raw cell (nbconvert "
    "passthrough); what survives is the markdown title+paragraph "
    "(re-entering the ONE markdown tokenizer), the code cell, and its "
    "stream output. ipynb has NO magic bytes, so this leg also proves "
    "the cells+nbformat structural sniff end-to-end. Closed-form "
    "oracle: gate, cell routing, chrome drops, and list-of-lines "
    "source joining must be exact on every row. extractor/ipynb.py; "
    "fixtures/genipynb.py. Map-only: one pre-kernel repartition, then "
    "synth + extract in sanctioned Arrow kernels, zero shuffle after.",
)
def q160_ipynb_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.genipynb import build_ipynb

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                blobs.append(
                    build_ipynb(
                        f"Notebook {did} analysis",
                        [text],
                        code=f"ans = {did} * 2\nprint(ans)",
                        output=f"planted stream output row {did}",
                        host=f"nav-{did}.example",
                    )
                )
                urls.append(f"https://nb-{did}.example/analysis.ipynb")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q161_subtitle_extract",
    """
    SELECT 'https://cdn-' || CAST(doc_id AS VARCHAR) || '.example/track.'
             || CASE WHEN doc_id % 2 = 0 THEN 'vtt' ELSE 'srt' END AS url,
           'Subtitle track ' || CAST(doc_id AS VARCHAR) || ' opening line'
             || chr(10) || text AS extracted_text,
           2 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE subtitle extraction (WebVTT + SRT in one spec, "
    "split by doc_id parity so BOTH gates prove out) — the twentieth "
    "format dispatch leg, covering the caption tracks of video crawls "
    "(the canonical spoken-register training text). Each row's text "
    "rides a two-cue track with the chrome battery planted: VTT "
    "header metadata + NOTE comment block (never read), cue "
    "identifiers/counters, timing lines with cue settings, a <v "
    "Narrator> speaker tag (annotation, not text), an <i> inline "
    "wrapper around a mid-text word that must resolve to plain text "
    "(the q159 \\textbf discipline), and a trailing short [Music] "
    "sound-effect cue that must die by MIN_CHARS at the island edge. "
    "WEBVTT's mandated header is a de-facto magic; SRT has none, so "
    "the odd rows also prove the counter+timing structural sniff "
    "end-to-end. Closed-form oracle: gates, cue-text recovery, chrome "
    "drops, and markup resolution must be exact on every row. "
    "extractor/subtitles.py; fixtures/gensub.py. Map-only: one "
    "pre-kernel repartition, then synth + extract in sanctioned Arrow "
    "kernels, zero shuffle after.",
)
def q161_subtitle_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.gensub import build_srt, build_vtt

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                words = text.split(" ")
                mid = len(words) // 2
                words[mid] = f"<i>{words[mid]}</i>"
                cues = [
                    f"<v Narrator>Subtitle track {did} opening line",
                    " ".join(words),
                    "[Music]",
                ]
                if did % 2 == 0:
                    blobs.append(build_vtt(cues))
                    urls.append(f"https://cdn-{did}.example/track.vtt")
                else:
                    # SRT carries no speaker-tag syntax: plant the
                    # narrator tag only on the VTT side
                    blobs.append(build_srt([cues[0][12:], *cues[1:]]))
                    urls.append(f"https://cdn-{did}.example/track.srt")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q162_anchor_text",
    """
    WITH pages AS (
      SELECT doc_id,
             '<html><body>'
             || '<a href="https://t-' || CAST(doc_id % 7 AS VARCHAR)
             || '.example/p">Anchor Variant ' || CAST(doc_id % 3 AS VARCHAR) || '</a>'
             || '<a href="https://t-' || CAST(doc_id % 5 AS VARCHAR)
             || '.example/q">  Spaced   Anchor  </a>'
             || '<a href="https://spam.example/x" rel="nofollow">sponsored link</a>'
             || '<a href="https://img-' || CAST(doc_id % 4 AS VARCHAR)
             || '.example/i"></a>'
             || '</body></html>' AS html
      FROM documents
    ),
    elems AS (
      SELECT unnest(regexp_extract_all(html,
               '<a [^>]*href="[^"]*"[^>]*>[^<]*</a>', 0)) AS e
      FROM pages
    ),
    kept AS (
      SELECT regexp_extract(e, 'href="([^"]+)"', 1) AS target,
             lower(trim(regexp_extract(e, '>([^<]*)<', 1))) AS anchor
      FROM elems
      WHERE e NOT LIKE '%rel="nofollow"%'
        AND trim(regexp_extract(e, '>([^<]*)<', 1)) <> ''
    ),
    pa AS (
      SELECT target, anchor, COUNT(*) AS cnt
      FROM kept GROUP BY target, anchor
    ),
    ranked AS (
      SELECT target, anchor, cnt,
             ROW_NUMBER() OVER (
               PARTITION BY target ORDER BY cnt DESC, anchor DESC
             ) AS rn
      FROM pa
    )
    SELECT p.target,
           CAST(SUM(p.cnt) AS BIGINT) AS n_refs,
           CAST(COUNT(*) AS BIGINT) AS n_anchors,
           MAX(CASE WHEN r.rn = 1 THEN r.anchor END) AS top_anchor
    FROM pa p
    JOIN ranked r ON r.target = p.target AND r.anchor = p.anchor
    GROUP BY p.target
    """,
    "Anchor-text aggregation — the classic web-graph signal a "
    "training-data pipeline harvests alongside outlinks (q42/q135): "
    "for every link TARGET, the corpus-wide profile of the anchor "
    "texts pointing at it (how others describe a page is a retrieval "
    "and labeling signal the page's own content can't provide). "
    "Pages synthesize JVM-side; anchor ELEMENTS lift out via one "
    "regexp_extract_all pass, then href and inner text project from "
    "each element — all Column expressions, zero Python. Real-world "
    "semantics planted: rel=\"nofollow\" anchors are excluded (the "
    "sponsored-link rule), empty-text anchors (image links) are "
    "excluded, anchor text is case-folded and whitespace-trimmed "
    "before counting. Aggregation is the two-level partial-agg shape "
    "that scales: groupBy(target, anchor) counts (map-side combine), "
    "then groupBy(target) folds n_refs/n_anchors and takes the top "
    "anchor by a single max(struct(cnt, anchor)) — no window over "
    "the full edge set, no collect. At 10^12 docs both shuffles key "
    "on target, the natural partitioning for the downstream "
    "per-document join.",
)
def q162_anchor_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<html><body><a href="https://t-'),
        (F.col("doc_id") % 7).cast("string"),
        F.lit('.example/p">Anchor Variant '),
        (F.col("doc_id") % 3).cast("string"),
        F.lit('</a><a href="https://t-'),
        (F.col("doc_id") % 5).cast("string"),
        F.lit('.example/q">  Spaced   Anchor  </a>'),
        F.lit('<a href="https://spam.example/x" rel="nofollow">sponsored link</a>'),
        F.lit('<a href="https://img-'),
        (F.col("doc_id") % 4).cast("string"),
        F.lit('.example/i"></a></body></html>'),
    )
    elems = d.select(html.alias("html")).select(
        F.explode(
            F.regexp_extract_all(
                "html", F.lit(r'<a [^>]*href="[^"]*"[^>]*>[^<]*</a>'), 0
            )
        ).alias("e")
    )
    inner = F.regexp_extract("e", r">([^<]*)<", 1)
    kept = elems.filter(
        (~F.col("e").contains('rel="nofollow"')) & (F.trim(inner) != "")
    ).select(
        F.regexp_extract("e", r'href="([^"]+)"', 1).alias("target"),
        F.lower(F.trim(inner)).alias("anchor"),
    )
    pa = kept.groupBy("target", "anchor").agg(F.count("*").alias("cnt"))
    return pa.groupBy("target").agg(
        F.sum("cnt").alias("n_refs"),
        F.count("*").alias("n_anchors"),
        F.max(F.struct("cnt", "anchor")).getField("anchor").alias("top_anchor"),
    )


@_q(
    "q163_wikitext_extract",
    """
    SELECT 'https://wiki-' || CAST(doc_id AS VARCHAR) || '.example/wiki/Article' AS url,
           'Wiki article ' || CAST(doc_id AS VARCHAR) || ' heading'
             || chr(10) || text AS extracted_text,
           2 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE MediaWiki wikitext extraction — the twenty-first "
    "format dispatch leg, covering the markup of the MediaWiki "
    "universe (Wikipedia dump <text> payloads, action=raw exports) — "
    "the most-curated encyclopedic training source there is. Each "
    "row's text rides an article with six plants the extractor must "
    "drop: a multi-line {{Infobox}} (template = rendered chrome, "
    "brace-depth-tracked across lines), __NOTOC__, an external-link "
    "nav line (label chars are link chars — dies by the shared "
    "density rule), an inline <ref> citation, a [[File:...]] media "
    "link and a [[Category:...]] tag; a mid-text word rides a "
    "[[Topic|word]] wikilink that must resolve to its display text "
    "WITHOUT counting as link chars (internal wikilinks are prose — "
    "a Wikipedia lede is wikilink-dense by construction). Wikitext "
    "has NO magic bytes, so this leg also proves the heading+evidence "
    "structural sniff end-to-end. Closed-form oracle: gate, template "
    "skip, wikilink resolution, and chrome drops must be exact on "
    "every row. extractor/wikitext.py; fixtures/genwiki.py. Map-only: "
    "one pre-kernel repartition, then synth + extract in sanctioned "
    "Arrow kernels, zero shuffle after.",
)
def q163_wikitext_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.genwiki import build_wikitext

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                words = text.split(" ")
                mid = len(words) // 2
                words[mid] = f"[[Planted Topic {did}|{words[mid]}]]"
                blobs.append(
                    build_wikitext(
                        f"Wiki article {did} heading",
                        [" ".join(words)],
                        host=f"nav-{did}.example",
                        infobox_field=f"infobox chrome {did}",
                        citation=f"citation chrome {did}",
                    )
                )
                urls.append(f"https://wiki-{did}.example/wiki/Article")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q164_eml_extract",
    """
    SELECT 'https://archive-' || CAST(doc_id AS VARCHAR) || '.example/msg.eml' AS url,
           'List post ' || CAST(doc_id AS VARCHAR) || ' subject'
             || chr(10) || text AS extracted_text,
           2 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE email extraction — the twenty-second format "
    "dispatch leg, covering mailing-list/newsgroup archives "
    "(pipermail exports, patch-review lists): long-form technical "
    "discussion, a classic training source. Each row's text rides a "
    "multipart/mixed list post with the full chrome battery: routing "
    "headers (Received/List-Id, never read), a '>'-quoted "
    "previous-message plant (keeping it would duplicate every thread "
    "upward), a '-- ' signature block, an opaque attachment part, and "
    "a MIME preamble; the Subject renders as the title (the one "
    "header that IS content). The transfer encoding rotates by "
    "doc_id%3 (7bit / base64 / quoted-printable) so the decode path "
    "proves out on every codec, and doc_id%2 adds a "
    "multipart/alternative html twin that must render EXACTLY once "
    "(text/plain preferred). Closed-form oracle: gate, MIME walk, "
    "alternative pick-one, transfer decode and chrome drops must be "
    "exact on every row. extractor/eml.py; fixtures/genmail.py. "
    "Map-only: one pre-kernel repartition, then synth + extract in "
    "sanctioned Arrow kernels, zero shuffle after.",
)
def q164_eml_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.genmail import build_eml

        encs = ("7bit", "base64", "quoted-printable")
        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                blobs.append(
                    build_eml(
                        f"List post {did} subject",
                        [text],
                        quoted=f"quoted reply chrome {did}",
                        signature=f"signature chrome {did}",
                        encoding=encs[did % 3],
                        html_alternative=bool(did % 2),
                    )
                )
                urls.append(f"https://archive-{did}.example/msg.eml")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q165_thread_reconstruct",
    """
    SELECT CAST(doc_id - doc_id % 8 AS BIGINT) AS root,
           CAST(COUNT(*) AS BIGINT) AS n_msgs,
           CAST(MAX(doc_id % 8) AS INT) AS max_depth
    FROM documents
    GROUP BY doc_id - doc_id % 8
    """,
    "Mailing-list THREAD RECONSTRUCTION by pointer doubling — the "
    "directed companion of q32's connected components: every message "
    "carries only its In-Reply-To parent edge, and the engine must "
    "recover each message's thread ROOT and reply DEPTH. The Spark "
    "side sees nothing but (msg_id, parent_id) rows and runs generic "
    "log-step ancestor jumping: 3 rounds of anc(m) <- anc(anc(m)) "
    "with depth accumulation, each round ONE self-join shuffle keyed "
    "on the ancestor pointer — ceil(log2(max_depth)) shuffles total, "
    "never depth-many, the difference between 3 passes and 7+ at "
    "10^12 messages. The fixture plants reply chains of known shape "
    "(roots every 8th id, parent = id-1), so the ORACLE reads the "
    "planted closed form instead of re-implementing the algorithm — "
    "the q99-BPE/q116 planted-expectation discipline: the doubling "
    "join must converge to EXACTLY the planted roots and depths on "
    "every row or the hash breaks. Output: one row per thread "
    "(root, n_msgs, max_depth).",
)
def q165_thread_reconstruct(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(F.col("doc_id").alias("msg_id"))
    # the In-Reply-To edge: roots every 8th message, others reply to
    # the previous id — the ONLY facts the engine may use below are
    # (msg_id, parent_id); root/depth must come out of the doubling
    parent = F.when(F.col("msg_id") % 8 == 0, F.lit(None).cast("long")).otherwise(
        F.col("msg_id") - 1
    )
    t = d.select(
        "msg_id",
        F.coalesce(parent, F.col("msg_id")).alias("anc"),
        F.when(parent.isNull(), F.lit(0)).otherwise(F.lit(1)).alias("d"),
    )
    # pointer doubling: after k rounds anc is the ancestor at distance
    # min(2^k, depth); 3 rounds cover the fixture's max depth 7 (a
    # production driver sizes k from an upper bound, not the data).
    # Each round self-joins the PREVIOUS round's output, so the
    # lineage must be cut per round (the q32 connected-components
    # discipline) or round k recomputes 2^k copies of the base scan.
    for _ in range(3):
        t = t.localCheckpoint(eager=False)
        a, b = t.alias("a"), t.alias("b")
        t = a.join(b, F.col("a.anc") == F.col("b.msg_id")).select(
            F.col("a.msg_id").alias("msg_id"),
            F.col("b.anc").alias("anc"),
            (F.col("a.d") + F.col("b.d")).alias("d"),
        )
    return t.groupBy(F.col("anc").alias("root")).agg(
        F.count("*").alias("n_msgs"),
        F.max("d").cast("int").alias("max_depth"),
    )


@_q(
    "q166_mbox_extract",
    """
    SELECT 'https://lists-' || CAST(doc_id AS VARCHAR) || '.example/arch.mbox' AS url,
           'Archive post ' || CAST(doc_id AS VARCHAR) || ' first'
             || chr(10) || text
             || chr(10) || 'Archive post ' || CAST(doc_id AS VARCHAR) || ' second'
             || chr(10) || 'second message body ' || CAST(doc_id AS VARCHAR) || ' kept'
             || CASE WHEN doc_id % 2 = 1 THEN
                    chr(10) || 'escape plant subject'
                 || chr(10) || 'first plant paragraph'
                 || chr(10) || 'From the archive this line is content From mid-paragraph this never splits 2024'
                ELSE '' END AS extracted_text,
           CAST(4 + 3 * (doc_id % 2) AS INT) AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE mbox extraction — the twenty-third format "
    "dispatch leg and the mail family's CONTAINER: a whole mailing "
    "list archive per row ('From '-separated RFC 5322 messages, the "
    "shape pipermail/lkml monthly dumps ship in). The tar discipline "
    "applied to mail: the walk resolves WHICH byte ranges are "
    "messages, each re-enters the q164 single-mail tokenizer (MIME "
    "walk, alternative pick-one, quote/sig chrome — one rule set), "
    "ordinals renumbered across messages. Every row carries two "
    "messages (transfer encoding rotating by doc_id%3 on the first, "
    "an alternative html twin on the second that must render EXACTLY "
    "once), and odd rows add the mboxo escape battery: a '>From ' "
    "body line that must UNescape to content plus a mid-paragraph "
    "'From ' decoy that must NOT split the archive. Closed-form "
    "oracle: gate, bounded walk, postmark splitting and unescaping "
    "must be exact on every row. extractor/mbox.py; "
    "fixtures/genmail.py build_mbox. Map-only: one pre-kernel "
    "repartition, then synth + extract in sanctioned Arrow kernels, "
    "zero shuffle after.",
)
def q166_mbox_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.genmail import build_eml, build_mbox

        encs = ("7bit", "base64", "quoted-printable")
        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                blobs.append(
                    build_mbox(
                        [
                            build_eml(
                                f"Archive post {did} first",
                                [text],
                                encoding=encs[did % 3],
                            ),
                            build_eml(
                                f"Archive post {did} second",
                                [f"second message body {did} kept"],
                                html_alternative=True,
                            ),
                        ],
                        escape_plant=bool(did % 2),
                    )
                )
                urls.append(f"https://lists-{did}.example/arch.mbox")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q167_redirect_resolve",
    """
    SELECT 'https://site-' || CAST(doc_id AS VARCHAR) || '.example/page' AS url,
           CASE WHEN doc_id % 8 <= 5 THEN
             'https://site-' || CAST(doc_id - doc_id % 8 AS VARCHAR) || '.example/page'
           END AS final_url,
           CAST(CASE WHEN doc_id % 8 <= 5 THEN doc_id % 8 ELSE -1 END AS INT) AS hops,
           CASE WHEN doc_id % 8 <= 5 THEN 'ok' ELSE 'loop' END AS status
    FROM documents
    """,
    "REDIRECT-CHAIN RESOLUTION with loop detection — the crawl "
    "canonicalization every frontier needs: each fetched URL carries "
    "at most one 3xx edge, and the engine must resolve every URL's "
    "FINAL landing page, hop count, and loop verdict. Pointer "
    "doubling (the q165 machinery pointed at a different product): "
    "3 log-step rounds of anc <- anc(anc) resolve chains up to depth "
    "8 in ceil(log2(depth)) self-join shuffles instead of depth-many "
    "BFS passes. Two twists beyond q165: the result is PER-URL (a "
    "resolution table, not a per-root rollup), and TERMINALITY rides "
    "the doubling as a carried flag — a row whose final ancestor "
    "still redirects after the rounds is in (or drains into) a "
    "redirect LOOP, classified with ZERO extra joins. The fixture "
    "plants chains of known shape (terminals every 8th id, chain "
    "hops = id%8 for 1..5, a self-loop at %8==6 and a drain into it "
    "at %8==7), so the ORACLE reads the planted closed form — the "
    "q99/q116/q165 planted-expectation discipline: the doubling must "
    "converge to EXACTLY the planted finals, hops and verdicts on "
    "every row or the hash breaks. Output: (url, final_url|NULL, "
    "hops with -1 in a loop, status).",
)
def q167_redirect_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(F.col("doc_id").alias("msg_id"))
    # the 3xx edge: terminals every 8th id; %8 in 1..5 and 7 redirect
    # to id-1; %8==6 self-loops. The ONLY facts the engine may use
    # below are (msg_id, dst) — finals/hops/verdicts must come out of
    # the doubling.
    dst = (
        F.when(F.col("msg_id") % 8 == 0, F.lit(None).cast("long"))
        .when(F.col("msg_id") % 8 == 6, F.col("msg_id"))
        .otherwise(F.col("msg_id") - 1)
    )
    t = d.select(
        "msg_id",
        F.coalesce(dst, F.col("msg_id")).alias("anc"),
        F.when(dst.isNull(), F.lit(0)).otherwise(F.lit(1)).alias("d"),
        dst.isNull().alias("fin"),
    )
    # pointer doubling with the terminality flag riding along: after
    # k rounds anc is the ancestor at distance min(2^k, depth) and
    # fin says whether that ancestor is a terminal; terminals are
    # fixpoints (anc=self, d+=0, fin stays true), loop members' d
    # doubles without fin ever turning true. Lineage cut per round
    # (the q32/q165 discipline).
    for _ in range(3):
        t = t.localCheckpoint(eager=False)
        a, b = t.alias("a"), t.alias("b")
        t = a.join(b, F.col("a.anc") == F.col("b.msg_id")).select(
            F.col("a.msg_id").alias("msg_id"),
            F.col("b.anc").alias("anc"),
            (F.col("a.d") + F.col("b.d")).alias("d"),
            F.col("b.fin").alias("fin"),
        )
    url_of = lambda c: F.concat(  # noqa: E731
        F.lit("https://site-"), c.cast("string"), F.lit(".example/page")
    )
    return t.select(
        url_of(F.col("msg_id")).alias("url"),
        F.when(F.col("fin"), url_of(F.col("anc"))).alias("final_url"),
        F.when(F.col("fin"), F.col("d")).otherwise(F.lit(-1)).cast("int").alias("hops"),
        F.when(F.col("fin"), F.lit("ok")).otherwise(F.lit("loop")).alias("status"),
    )


@_q(
    "q168_ics_extract",
    """
    SELECT 'https://cal-' || CAST(doc_id AS VARCHAR) || '.example/feed.ics' AS url,
           'Calendar event ' || CAST(doc_id AS VARCHAR) || ' first'
             || chr(10) || text
             || CASE WHEN doc_id % 2 = 1
                THEN chr(10) || 'next paragraph of ' || text ELSE '' END
             || chr(10) || 'Calendar event ' || CAST(doc_id AS VARCHAR) || ' second'
             || chr(10) || 'agenda item ' || CAST(doc_id AS VARCHAR) || ' body; with details, inline'
             || CASE WHEN doc_id % 2 = 1
                THEN chr(10) || 'next paragraph of agenda item '
                  || CAST(doc_id AS VARCHAR) || ' body; with details, inline'
                ELSE '' END AS extracted_text,
           CAST(4 + 2 * (doc_id % 2) AS INT) AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE iCalendar extraction — the twenty-fourth "
    "format dispatch leg, covering the event/calendar feeds crawls "
    "carry in bulk (conference schedules, venue programmes, course "
    "calendars). BEGIN:VCALENDAR is a de-facto magic (the WEBVTT "
    "rule). Every row carries two VEVENTs with the full chrome "
    "battery — calendar headers, a VTIMEZONE component, UID/DTSTART/"
    "ORGANIZER/ATTENDEE/RRULE/LOCATION metadata, and a VALARM whose "
    "DESCRIPTION is reminder chrome — plus the grammar gauntlet: "
    "75-octet line FOLDING that splits mid-word (§3.1 unfold must be "
    "seamless), property parameters to strip, and TEXT escaping "
    "(the second event's description carries a literal ';' and ',' "
    "that round-trip through \\\\;/\\\\, escapes); odd rows add "
    "escaped-\\\\n multi-paragraph descriptions. Closed-form oracle: "
    "gate, unfold, unescape and chrome exclusion must be exact on "
    "every row. extractor/icsleg.py; fixtures/genical.py. Map-only: "
    "one pre-kernel repartition, then synth + extract in sanctioned "
    "Arrow kernels, zero shuffle after.",
)
def q168_ics_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.genical import build_ics

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                blobs.append(
                    build_ics(
                        [
                            (f"Calendar event {did} first", text),
                            (
                                f"Calendar event {did} second",
                                f"agenda item {did} body; with details, inline",
                            ),
                        ],
                        multiline_description=bool(did % 2),
                    )
                )
                urls.append(f"https://cal-{did}.example/feed.ics")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q169_recrawl_schedule",
    """
    SELECT 'https://site-' || CAST(doc_id AS VARCHAR) || '.example/page' AS url,
           CAST(FLOOR(5 / (1 + doc_id % 6)) AS INT) AS n_changes,
           CASE WHEN FLOOR(5 / (1 + doc_id % 6)) >= 4 THEN 'hourly'
                WHEN FLOOR(5 / (1 + doc_id % 6)) >= 2 THEN 'daily'
                WHEN FLOOR(5 / (1 + doc_id % 6)) >= 1 THEN 'weekly'
                ELSE 'monthly' END AS bucket
    FROM documents
    """,
    "ADAPTIVE RECRAWL SCHEDULING — the freshness loop every crawler "
    "runs (Cho & Garcia-Molina): estimate each URL's change rate "
    "from its snapshot history and assign a recrawl-frequency "
    "bucket. The engine sees only (url, snap_t, digest) observation "
    "rows — six snapshots per url — and runs the generic operator: "
    "ONE url-keyed window pass counting digest transitions "
    "(lag(digest) != digest), then a pure-Column rate->bucket map. "
    "Exactly one shuffle on url-hash, O(1) carried state per url "
    "(the previous digest) — the shape that survives 10^12 urls and "
    "is the batch twin of a streaming stateful version. The fixture "
    "plants each url's change period (every p-th snapshot rewrites, "
    "p = 1 + doc_id%6, digests synthesized JVM-side with xxhash64), "
    "so the ORACLE reads the planted closed form n_changes = "
    "floor(5/p) — the q99/q165 planted-expectation discipline. "
    "Output: (url, n_changes, bucket).",
)
def q169_recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id")
    # the planted observation table: six snapshots per url; a url
    # with change period p rewrites every p-th snapshot, so its
    # digest is a hash of (doc_id, epoch) with epoch = floor(t/p).
    # The ONLY facts the operator may use below are (url, snap_t,
    # digest).
    obs = (
        d.select(
            "doc_id", F.explode(F.sequence(F.lit(0), F.lit(5))).alias("snap_t")
        )
        .select(
            F.concat(
                F.lit("https://site-"),
                F.col("doc_id").cast("string"),
                F.lit(".example/page"),
            ).alias("url"),
            "snap_t",
            F.xxhash64(
                F.col("doc_id"),
                F.floor(F.col("snap_t") / (1 + F.col("doc_id") % 6)),
            ).alias("digest"),
        )
    )
    # the operator: one window pass per url counting transitions,
    # then the pure-Column bucket map (operators/recrawl.py — the
    # streaming twin stream_recrawl folds the same monoid)
    from toyocr_spark.operators.recrawl import change_counts, schedule_buckets

    return schedule_buckets(change_counts(obs))


@_q(
    "q170_zip_extract",
    """
    SELECT 'https://zip-' || CAST(doc_id AS VARCHAR) || '.example/export.zip' AS url,
           'Export doc ' || CAST(doc_id AS VARCHAR) || ' heading'
             || chr(10) || text
             || chr(10) || 'Export readme ' || CAST(doc_id AS VARCHAR) || ' heading long enough'
             || chr(10) || 'Readme body paragraph for export '
             || CAST(doc_id AS VARCHAR) || ' inside the bundle' AS extracted_text,
           4 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE generic-ZIP multi-document extraction — the "
    "twenty-fifth format dispatch leg and tar's twin for site "
    "exports / dataset dumps / source releases. Before this leg a "
    "non-OOXML/EPUB/ODF zip fell through to the HTML tokenizer and "
    "surfaced raw local-file headers as garbage text — the failure "
    "this leg closes. Each row's bundle carries an HTML member "
    "(STORED; nav plant + heading + the row's text), a markdown "
    "README member (DEFLATED — both compression methods prove out), "
    "an opaque PNG that must never reach the lossy-decode path, a "
    "NESTED zip AND a nested tar that the mutual no-recursion guard "
    "must refuse (64^depth bomb protection), and a directory entry "
    "(structural, skipped). Members re-enter the shared dispatch via "
    "tarleg._member_blocks (one walk contract for both bundle "
    "formats); odd doc_ids wrap the WHOLE archive in gzip (the "
    "envelope strip runs before the PK gate). Closed-form oracle. "
    "extractor/zipleg.py; fixtures/genzip.py. Map-only: one "
    "pre-kernel repartition, then synth + extract in sanctioned "
    "Arrow kernels, zero shuffle after.",
)
def q170_zip_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )
    nav = (
        '<nav><ul><li><a href="/a">one link</a></li>'
        '<li><a href="/b">two link</a></li></ul></nav>'
    )

    def batches(it):
        import gzip

        from toyocr_spark.fixtures.genmd import build_md
        from toyocr_spark.fixtures.gentar import build_tar
        from toyocr_spark.fixtures.genzip import build_zip

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                page = (
                    f"<html><body>{nav}<h1>Export doc {did} heading</h1>"
                    f"<p>{text}</p></body></html>"
                ).encode()
                md = build_md(
                    f"Export readme {did} heading long enough",
                    [f"Readme body paragraph for export {did} inside the bundle"],
                )
                png = b"\x89PNG\r\n\x1a\n" + bytes(range(256))
                blob = build_zip(
                    [
                        ("page.html", page),
                        ("README.md", md),
                        ("res/logo.png", png),
                        (
                            "inner.zip",
                            build_zip([("x.txt", b"nested never recurses " * 3)]),
                        ),
                        (
                            "inner.tar",
                            build_tar([("y.txt", b"tar member never walks " * 3)]),
                        ),
                    ],
                    with_dir=True,
                )
                if did % 2:
                    blob = gzip.compress(blob, 9, mtime=0)
                urls.append(f"https://zip-{did}.example/export.zip")
                blobs.append(blob)
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q171_ps_extract",
    """
    SELECT 'https://ps-' || CAST(doc_id AS VARCHAR) || '.example/paper.ps' AS url,
           'PS paper ' || CAST(doc_id AS VARCHAR) || ' title banner'
             || chr(10) || text
             || chr(10) || 'closing paragraph ' || CAST(doc_id AS VARCHAR)
             || ' line a closing paragraph ' || CAST(doc_id AS VARCHAR) || ' line b'
             AS extracted_text,
           3 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE PostScript extraction — the twenty-sixth "
    "format dispatch leg, covering the pre-PDF academic corpus "
    "(arXiv/citeseer .ps papers, tech reports). The machine is the "
    "PDF content-stream engine's sibling: a linear scan over `x y "
    "moveto (string) show` with scalefont/selectfont sizes, the full "
    "string-escape grammar (nested parens, octal, continuations), "
    "procedure bodies as DEFINITIONS that never emit (the fixture "
    "plants a decoy show inside a prologue {}), and DSC comments as "
    "chrome. Each row's text renders as a MULTI-LINE paragraph "
    "(5-word lines, 13pt leading — the blocker must chain them into "
    "one block that re-joins to exactly the row's text) plus a "
    "closing paragraph beyond the leading break, with the closing "
    "paragraph emitted FIRST in the program for odd ids — the "
    "positioned reading order (the reference's layout-analysis "
    "graft) must restore y-order on every row; title by font size; "
    "a pdfmark /URI annotation rides along as chrome. Closed-form "
    "oracle. The two-column XY-cut exercise for this leg lives in "
    "tests/test_psleg.py (shuffled staggered columns). "
    "extractor/psleg.py; fixtures/genps.py. Map-only: one pre-kernel "
    "repartition, then synth + extract in sanctioned Arrow kernels, "
    "zero shuffle after.",
)
def q171_ps_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.genps import build_ps, paragraph_ps

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                words = text.split(" ")
                lines = [
                    " ".join(words[i : i + 5]) for i in range(0, len(words), 5)
                ]
                body_para = paragraph_ps(50, 700, 11, 13, lines)
                closing = paragraph_ps(
                    50,
                    700 - 13 * len(lines) - 27,  # beyond the 1.75x leading
                    11,
                    13,
                    [
                        f"closing paragraph {did} line a",
                        f"closing paragraph {did} line b",
                    ],
                )
                body = [closing, body_para] if did % 2 else [body_para, closing]
                blobs.append(
                    build_ps(
                        [
                            paragraph_ps(
                                50, 740, 18, 20, [f"PS paper {did} title banner"]
                            )
                        ]
                        + body,
                        uri=f"https://cited-{did}.example/ref",
                    )
                )
                urls.append(f"https://ps-{did}.example/paper.ps")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


# the planted mojibake triple (q172): _MOJI_FORM is the cp1252
# misdecode IMAGE of _MOJI_CLEAN, transcribed here as explicit \u
# literals (not computed through any codec, so the fixture cannot
# share a bug with the repair's translate table); _MOJI_CJK carries
# the em-dash digram INSIDE genuinely non-Latin text, which the
# all-Latin-1-after-translate guard must leave untouched.
_MOJI_CLEAN = " caf\u00e9 \u2014 \u201cna\u00efve\u00bb\u2026 \u2022 Gr\u00fc\u00dfe"
_MOJI_FORM = (
    " caf\u00c3\u00a9 \u00e2\u20ac\u201d \u00e2\u20ac\u0153na\u00c3\u00afve"
    "\u00c2\u00bb\u00e2\u20ac\u00a6 \u00e2\u20ac\u00a2 Gr\u00c3\u00bc\u00c3\u0178e"
)
_MOJI_CJK = " \u771f\u00b7mixed \u00e2\u20ac\u201d stays"


@_q(
    "q172_mojibake_repair",
    f"""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           doc_id % 3 = 0 AS was_mojibake,
           text || CASE WHEN doc_id % 3 IN (0, 1)
                        THEN '{_MOJI_CLEAN}'
                        ELSE '{_MOJI_CJK}' END AS text_out
    FROM documents
    """,
    "ftfy-style mojibake repair (UTF-8 text once misdecoded as "
    "windows-1252 -> 'cafÃ©'), entirely JVM-side: translate the 27 "
    "printable cp1252 specials back to their 0x80-0x9F bytes, encode "
    "Latin-1, is_valid_utf8-gate, reinterpret as UTF-8 "
    "(functions/textfns.py repair_mojibake). Fixture plants three "
    "row families: the misdecode image (must repair to the clean "
    "form EXACTLY), the clean non-ASCII form (must stay "
    "byte-identical), and CJK text carrying the em-dash mojibake "
    "digram (the signature false-positive: the all-Latin-1 guard "
    "must refuse, since Latin-1 encode would '?'-substitute the "
    "CJK). was_mojibake is computed from the repair (changed vs "
    "planted), not echoed from the family index. Both literal forms "
    "are \\u-transcribed constants, never produced by a codec call, "
    "so fixture and operator cannot share a table bug; the oracle "
    "SELECTs the planted expectations (the q99/q116 discipline). "
    "Zero shuffle, zero Python: one projection of Column "
    "expressions over the scan.",
)
def q172_mojibake_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.functions.textfns import repair_mojibake

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    fam = F.pmod(F.col("doc_id"), F.lit(3))
    planted = F.concat(
        F.col("text"),
        F.when(fam == 0, F.lit(_MOJI_FORM))
        .when(fam == 1, F.lit(_MOJI_CLEAN))
        .otherwise(F.lit(_MOJI_CJK)),
    )
    rep = repair_mojibake(planted)
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        (rep != planted).alias("was_mojibake"),
        rep.alias("text_out"),
    )


@_q(
    "q173_arc_extract",
    """
    SELECT 'https://arc-' || CAST(doc_id AS VARCHAR) || '.example/page.html' AS url,
           text AS extracted_text,
           1 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE ARC container ingest — the Internet Archive's "
    "pre-WARC format (Common Crawl 2008-2012, first-decade Wayback): "
    "each row rides a whole ARC FILE holding the filedesc:// version "
    "record (must be skipped as metadata), the q25 template page as "
    "an http capture (status line + headers stripped, the WARC "
    "discipline), and an image/gif capture the header-line mime "
    "filter must drop. Even doc_id = 5-field v1 headers, odd = "
    "10-field v2 (length is LAST in both); doc_id%4>=2 adds the "
    "whole-file gzip envelope (.arc.gz). sources/arc.py parse_arc; "
    "raw-byte known-answer pins in tests/test_arc.py keep the "
    "builder/parser pair honest. The oracle is q25's identity closed "
    "form: any slip in the field walk, length accounting, http strip "
    "or mime filter mismatches every affected row. Scale shape: file "
    "= unit of work, map-only batch parse + the same sanctioned "
    "extraction kernel, zero shuffle.",
)
def q173_arc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )
    nav = (
        '<nav><ul><li><a href="/a">one link</a></li>'
        '<li><a href="/b">two link</a></li></ul></nav>'
    )

    def batches(it):
        import gzip

        from toyocr_spark.sources.arc import build_arc, parse_arc

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                page = (
                    f"<html><body>{nav}<article><p>{text}"
                    "</p></article></body></html>"
                ).encode()
                blob = build_arc(
                    [
                        (f"https://arc-{did}.example/page.html", "20090213233130", page),
                        (f"https://arc-{did}.example/logo.gif", "20090213233131", b"GIF89a-not-admitted", "image/gif"),
                    ],
                    version=1 if did % 2 == 0 else 2,
                )
                if did % 4 >= 2:
                    blob = gzip.compress(blob, 9, mtime=0)
                for rec in parse_arc(blob):
                    urls.append(rec["url"])
                    blobs.append(rec["html"])
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q174_markdown_render",
    """
    SELECT 'https://md-' || CAST(doc_id AS VARCHAR) || '.example/guide.html' AS url,
           '## Guide ' || CAST(doc_id AS VARCHAR) || ' overview'
             || chr(10) || chr(10) || text
             || chr(10) || chr(10) || '- first takeaway ' || CAST(doc_id AS VARCHAR)
             || ' with plenty of prose to keep the scorer content'
             || chr(10) || chr(10) || '- second takeaway ' || CAST(doc_id AS VARCHAR)
             || ' also long enough to clear every keep threshold' AS markdown,
           4 AS n_kept
    FROM documents
    """,
    "Structure-preserving Markdown serialization of the extraction "
    "product — the output format LLM-training pipelines persist "
    "(flat text erases the heading/list structure the scorer kept). "
    "functions/textfns.py render_markdown: a pure Column expression "
    "over (extracted_text, spans) — substr each kept block out by "
    "its span, prefix by kind ('## ' title, '- ' list item, '> ' "
    "figure caption, bare text/table), blank-line join. The fixture "
    "page carries an h1, a body paragraph and a two-item list whose "
    "items must surface as separate '- ' blocks; the closed-form "
    "oracle rebuilds the exact Markdown, so any slip in span "
    "arithmetic, kind classification, keep decisions OR the renderer "
    "mismatches the row. Scale shape: rendering adds one projection "
    "to the map-only extraction plan — zero Python beyond the "
    "sanctioned kernel, zero shuffle.",
)
def q174_markdown_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.functions.textfns import render_markdown
    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )
    nav = (
        '<nav><ul><li><a href="/a">one link</a></li>'
        '<li><a href="/b">two link</a></li></ul></nav>'
    )

    def batches(it):
        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                page = (
                    f"<html><body>{nav}"
                    f"<h1>Guide {did} overview</h1><article><p>{text}</p>"
                    f"<ul><li>first takeaway {did} with plenty of prose to keep the scorer content</li>"
                    f"<li>second takeaway {did} also long enough to clear every keep threshold</li></ul>"
                    "</article></body></html>"
                ).encode()
                urls.append(f"https://md-{did}.example/guide.html")
                blobs.append(page)
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url",
        render_markdown(F.col("extracted_text"), F.col("spans")).alias("markdown"),
        F.col("n_kept").cast("int").alias("n_kept"),
    )


_TR_ROUNDS = 3


def _tr_round_sql(prev: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT n.id, n.wd,
             ({10**12} * 15) // (100 * nn.n)
             + (85 * coalesce(sum(p.rank // d.outdeg), 0)) // 100 AS rank
      FROM nodes n
      JOIN nn USING (id)
      LEFT JOIN edges e ON e.id = n.id AND e.dst = n.wd
      LEFT JOIN {prev} p ON p.id = e.id AND p.wd = e.src
      LEFT JOIN deg d ON d.id = e.id AND d.src = e.src
      GROUP BY n.id, n.wd, nn.n
    )"""


@_q(
    "q175_textrank_keywords",
    f"""
    WITH w AS (SELECT doc_id AS id, string_split(trim(text), ' ') AS ws FROM documents),
    w2 AS (SELECT id, ws FROM w WHERE len(ws) >= 2),
    bi AS (SELECT id, ws[g.i] AS a, ws[g.i + 1] AS b
           FROM w2, unnest(generate_series(1, len(ws) - 1)) AS g(i)),
    edges AS (
      SELECT DISTINCT id, a AS src, b AS dst FROM bi WHERE a <> b
      UNION
      SELECT DISTINCT id, b AS src, a AS dst FROM bi WHERE a <> b
    ),
    nodes AS (SELECT DISTINCT id, src AS wd FROM edges),
    nn AS (SELECT id, count(*) AS n FROM nodes GROUP BY id),
    deg AS (SELECT id, src, count(*) AS outdeg FROM edges GROUP BY id, src),
    r0 AS (SELECT nodes.id, wd, {10**12} // nn.n AS rank
           FROM nodes JOIN nn USING (id)),
    {_tr_round_sql("r0", "r1")},
    {_tr_round_sql("r1", "r2")},
    {_tr_round_sql("r2", "r3")},
    ranked AS (
      SELECT id, wd, rank,
             row_number() OVER (PARTITION BY id ORDER BY rank DESC, wd) AS rn
      FROM r3
    )
    SELECT CAST(id AS BIGINT) AS doc_id, wd AS word,
           CAST(rank AS BIGINT) AS rank_scaled, CAST(rn AS INT) AS rn
    FROM ranked WHERE rn <= 3
    """,
    "TextRank keyword extraction (Mihalcea & Tarau 2004): per-document "
    "PageRank over the undirected adjacent-word co-occurrence graph — "
    "q44's integer-exact iteration (scale 10^12, damping 85/100, "
    "3 rounds, integer division throughout) with (doc, word) composite "
    "keys so ONE join + ONE partial-agg groupBy per round scores every "
    "document's graph simultaneously; top-3 per doc by (rank, word) "
    "via row_number. Bit-exact across engines by the q44 discipline "
    "(no floats anywhere). Scale shape: rounds iterate the WORD-PAIR "
    "graph (corpus-linear, bounded per doc), every shuffle is an "
    "equi-key exchange on (id, word); the final top-k is a "
    "window-per-key, never a global sort.",
)
def q175_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    scale = 10**12
    d = _t(spark, sf_dir, "documents")
    w = d.select(
        F.col("doc_id").alias("id"),
        F.split(F.trim(F.col("text")), " ").alias("ws"),
    ).filter(F.size("ws") >= 2)
    bi = w.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 1),
                lambda i: F.struct(
                    F.element_at("ws", i).alias("a"),
                    F.element_at("ws", i + 1).alias("b"),
                ),
            )
        ).alias("p"),
    ).select("id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    bi = bi.filter(F.col("a") != F.col("b"))
    edges = (
        bi.select("id", F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(bi.select("id", F.col("b"), F.col("a")))
        .distinct()
    )
    # train-once/iterate-many: degree rides the edge row and the
    # per-node teleport rides the node row, both checkpointed ONCE, so
    # a round is join + partial-agg + base left-join (no nn/deg re-join
    # per round — the q44 lineage-cut discipline, taken further)
    deg = edges.groupBy("id", "src").agg(F.count("*").alias("outdeg"))
    edgesd = edges.join(deg, ["id", "src"]).localCheckpoint(eager=False)
    nodes = edgesd.select("id", F.col("src").alias("wd")).distinct()
    nn = nodes.groupBy("id").agg(F.count("*").alias("n"))
    base = (
        nodes.join(nn, "id")
        .select(
            "id",
            "wd",
            F.expr(f"({scale} * 15) div (100 * n)").alias("tele"),
            F.expr(f"{scale} div n").alias("r0"),
        )
        .localCheckpoint(eager=False)
    )
    ranks = base.select("id", "wd", F.col("r0").alias("rank"))
    for _ in range(_TR_ROUNDS):
        contrib = (
            edgesd.join(ranks.withColumnRenamed("wd", "src"), ["id", "src"])
            .groupBy("id", F.col("dst").alias("wd"))
            .agg(F.expr("85 * sum(rank div outdeg) div 100").alias("s"))
        )
        ranks = base.join(contrib, ["id", "wd"], "left").select(
            "id", "wd", (F.col("tele") + F.coalesce(F.col("s"), F.lit(0))).alias("rank")
        )
    win = Window.partitionBy("id").orderBy(F.col("rank").desc(), F.col("wd"))
    return (
        ranks.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("id").cast("long").alias("doc_id"),
            F.col("wd").alias("word"),
            F.col("rank").cast("long").alias("rank_scaled"),
            F.col("rn").cast("int").alias("rn"),
        )
    )


_LS_EN1 = "the cat and the dog is near the door of the house item "
_LS_EN2 = "the bird and the fish is by the gate of the barn item "
_LS_DE1 = "der hund und die katze ist im haus und der baum item "
_LS_DE2 = "die sonne und der mond ist hell und die nacht item "
_LS_FR1 = "le chat et le chien est pres du jardin item "
_LS_FR2 = "les fleurs et le pain est sur la table item "


@_q(
    "q176_lang_segments",
    f"""
    WITH fams AS (
      SELECT doc_id, doc_id % 3 AS fam, CAST(doc_id AS VARCHAR) AS s
      FROM documents
    ),
    segs AS (
      SELECT doc_id, 1 AS seg_idx,
             'en' AS seg_lang,
             CASE WHEN fam = 2 THEN 2 ELSE 1 END AS n_paras,
             CASE WHEN fam = 2
                  THEN '{_LS_EN1}' || s || chr(10) || chr(10) || '{_LS_EN2}' || s
                  ELSE '{_LS_EN1}' || s END AS seg_text
      FROM fams
      UNION ALL
      SELECT doc_id, 2 AS seg_idx,
             CASE WHEN fam = 1 THEN 'fr' ELSE 'de' END AS seg_lang,
             CASE WHEN fam = 2 THEN 1 ELSE 2 END AS n_paras,
             CASE fam
               WHEN 0 THEN '{_LS_DE1}' || s || chr(10) || chr(10) || '{_LS_DE2}' || s
               WHEN 1 THEN '{_LS_FR1}' || s || chr(10) || chr(10) || '{_LS_FR2}' || s
               ELSE '{_LS_DE1}' || s END AS seg_text
      FROM fams
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(seg_idx AS INT) AS seg_idx,
           seg_lang, CAST(n_paras AS BIGINT) AS n_paras, seg_text
    FROM segs
    """,
    "Paragraph-level language segmentation (the mC4 code-switch "
    "split): split on blank lines, marker-word language-ID per "
    "paragraph, merge consecutive same-language paragraphs into "
    "segments via the gaps-and-islands window (lag-change flag + "
    "running sum), re-join each segment's paragraphs "
    "(functions/textfns.py lang_segments). Fixture plants three "
    "families of trilingual pages — en|de+de, en|fr+fr, en+en|de — "
    "whose marker scores make every paragraph's language "
    "unambiguous, so the oracle SELECTs the planted segmentation in "
    "closed form (the q116 discipline) while Spark derives it from "
    "the real scorer: a wrong score, a broken island boundary or a "
    "mis-ordered re-join all mismatch. Scale shape: one posexplode + "
    "one doc-keyed window + one partial agg; per-doc state is a "
    "single lag value.",
)
def q176_lang_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.functions.textfns import lang_segments

    d = _t(spark, sf_dir, "documents").select("doc_id", F.col("doc_id").cast("string").alias("s"))
    fam = F.pmod(F.col("doc_id"), F.lit(3))
    p = lambda lit: F.concat(F.lit(lit), F.col("s"))  # noqa: E731
    built = F.concat_ws(
        "\n\n",
        p(_LS_EN1),
        F.when(fam == 2, p(_LS_EN2)).otherwise(
            F.when(fam == 1, p(_LS_FR1)).otherwise(p(_LS_DE1))
        ),
        F.when(fam == 0, p(_LS_DE2))
        .when(fam == 1, p(_LS_FR2))
        .otherwise(p(_LS_DE1)),
    )
    docs = d.select("doc_id", built.alias("body"))
    out = lang_segments(docs, "doc_id", "body")
    return out.select(
        F.col("id").cast("long").alias("doc_id"),
        "seg_idx",
        "seg_lang",
        F.col("n_paras").cast("long").alias("n_paras"),
        "seg_text",
    )


@_q(
    "q177_crawl_budget",
    """
    WITH h AS (
      SELECT 'host-' || CAST(doc_id % 20 AS VARCHAR) || '.example' AS host,
             CAST(1 + doc_id % 7 AS BIGINT) AS w
      FROM documents
    ),
    hw AS (SELECT host, CAST(sum(w) AS BIGINT) AS weight FROM h GROUP BY host),
    tot AS (SELECT CAST(sum(weight) AS BIGINT) AS wt, count(*) AS nh FROM hw),
    quo AS (
      SELECT host, weight,
             (10000 * weight) // wt AS base,
             (10000 * weight) % wt AS rem
      FROM hw, tot
    ),
    lo AS (SELECT CAST(10000 - sum(base) AS BIGINT) AS leftover FROM quo),
    rk AS (
      SELECT host, weight, base, rem,
             row_number() OVER (ORDER BY rem DESC, host) AS rk
      FROM quo
    )
    SELECT host, weight,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS pages_allocated
    FROM rk, lo
    """,
    "Proportional crawl-budget allocation by the largest-remainder "
    "(Hamilton) method: a global budget of 10000 fetch slots splits "
    "across hosts proportionally to an integer demand weight, floor "
    "quotas first, then the leftover slots go to the largest "
    "fractional remainders (host tie-break) — the standard "
    "exact-integer apportionment, so allocations sum to the budget "
    "EXACTLY (no float drift, no over/under-commit). One groupBy to "
    "host weights, one 1-row total broadcast (the A7 COUNT-driven "
    "shape), one rank window over HOSTS (corpus-cardinality-free: "
    "the window runs over the host table, never the page table). "
    "Bit-exact across engines — integer division and modulo "
    "throughout.",
)
def q177_crawl_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    budget = 10000
    d = _t(spark, sf_dir, "documents")
    h = d.select(
        F.concat(F.lit("host-"), (F.col("doc_id") % 20).cast("string"), F.lit(".example")).alias("host"),
        (1 + F.col("doc_id") % 7).cast("long").alias("w"),
    )
    hw = h.groupBy("host").agg(F.sum("w").cast("long").alias("weight"))
    # the only corpus-scale shuffle is the groupBy above; everything
    # below runs on the HOST table, so the total, the leftover and the
    # remainder rank all ride ONE unpartitioned window stage instead
    # of two aggregate+broadcast round-trips
    all_hosts = Window.partitionBy()
    wt = F.sum("weight").over(all_hosts)
    quo = hw.select(
        "host",
        "weight",
        F.expr(f"({budget} * weight)").alias("q"),
        wt.alias("wt"),
    ).select(
        "host",
        "weight",
        F.expr("q div wt").alias("base"),
        F.expr("q % wt").alias("rem"),
    )
    leftover = F.lit(budget) - F.sum("base").over(all_hosts)
    rk = F.row_number().over(Window.orderBy(F.col("rem").desc(), F.col("host")))
    return quo.select(
        "host",
        "weight",
        (F.col("base") + F.when(rk <= leftover, 1).otherwise(0))
        .cast("long")
        .alias("pages_allocated"),
    )


@_q(
    "q178_fetcher_assign",
    f"""
    WITH hosts AS (
      SELECT DISTINCT 'host-' || CAST(doc_id % 50 AS VARCHAR) || '.example' AS host
      FROM documents
    ),
    cand AS (
      SELECT host, g.f AS fetcher,
             substr(md5(host || '|' || CAST(g.f AS VARCHAR)), 1, 4) AS h
      FROM hosts, unnest(generate_series(0, 15)) AS g(f)
    ),
    scored AS (
      SELECT host, fetcher, CAST((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096 + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256 + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 1 AS BIGINT) AS score,
             row_number() OVER (
               PARTITION BY host
               ORDER BY ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096 + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256 + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 1) DESC, fetcher
             ) AS rk
      FROM cand
    )
    SELECT host, CAST(fetcher AS INT) AS fetcher, score
    FROM scored WHERE rk = 1
    """,
    "Rendezvous (highest-random-weight) fetcher assignment — how a "
    "distributed crawler shards hosts across N fetch workers so that "
    "adding/removing a worker reassigns ONLY that worker's hosts "
    "(consistent hashing without a ring): every (host, fetcher) pair "
    "scores md5(host|fetcher), the max score wins, fetcher-id "
    "tie-break. Deterministic and engine-portable by the q45 md5 "
    "discipline (first 4 hex nibbles as an integer). Scale shape: "
    "the 16-way candidate explode happens on the DISTINCT HOST table "
    "(corpus-cardinality-free), one host-keyed window picks the "
    "winner — no shuffle ever touches the page table.",
)
def q178_fetcher_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.functions.urlfns import rendezvous_assign

    d = _t(spark, sf_dir, "documents")
    hosts = d.select(
        F.concat(F.lit("host-"), (F.col("doc_id") % 50).cast("string"), F.lit(".example")).alias("host")
    ).distinct()
    return rendezvous_assign(hosts, 16)


@_q(
    "q179_revalidation_savings",
    """
    SELECT 'https://rv-' || CAST(doc_id AS VARCHAR) || '.example/page' AS url,
           CAST(6 AS BIGINT) AS n_caps,
           CAST(5 - (5 // (1 + doc_id % 6)) AS BIGINT) AS n_not_modified,
           CAST((5 - (5 // (1 + doc_id % 6))) * (1000 + doc_id % 500) AS BIGINT)
             AS bytes_saved,
           5 - (5 // (1 + doc_id % 6)) >= 3 AS revalidate_friendly
    FROM documents
    """,
    "Conditional-GET revalidation planning — the crawler-ops twin of "
    "q169's recrawl scheduling: over each URL's capture history, a "
    "re-fetch whose validator (ETag) matches the previous capture "
    "could have been a 304 Not-Modified with NO body transfer, so "
    "counting lag-stable captures prices exactly how much bandwidth "
    "If-None-Match would have saved, and urls with >= 3 stable "
    "re-fetches get flagged for the conditional-fetch pool. Fixture "
    "plants 6 snapshots per url with ETag change period p = "
    "1 + doc_id %% 6 (the q169 plant), so the oracle reads "
    "n_not_modified = 5 - floor(5/p) in closed form while Spark "
    "derives it from the real lag window over the capture rows. One "
    "url-keyed window pass + one partial agg, O(1) carried state per "
    "url — the same shape that holds at 10^12 capture rows.",
)
def q179_revalidation_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id")
    p = 1 + F.pmod(F.col("doc_id"), F.lit(6))
    caps = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(5))).alias("t"),
        p.alias("p"),
    ).select(
        F.concat(F.lit("https://rv-"), F.col("doc_id").cast("string"), F.lit(".example/page")).alias("url"),
        "t",
        F.concat(F.lit("e"), F.expr("t div p").cast("string")).alias("etag"),
        (F.lit(1000) + F.pmod(F.col("doc_id"), F.lit(500))).cast("long").alias("body_bytes"),
    )
    win = Window.partitionBy("url").orderBy("t")
    flagged = caps.withColumn(
        "not_modified",
        F.when(
            F.lag("etag").over(win).isNotNull()
            & (F.lag("etag").over(win) == F.col("etag")),
            1,
        ).otherwise(0),
    )
    return flagged.groupBy("url").agg(
        F.count("*").alias("n_caps"),
        F.sum("not_modified").cast("long").alias("n_not_modified"),
        F.sum(F.col("not_modified") * F.col("body_bytes")).cast("long").alias("bytes_saved"),
        (F.sum("not_modified") >= 3).alias("revalidate_friendly"),
    )


@_q(
    "q180_fb2_extract",
    """
    SELECT 'https://fb2-' || CAST(doc_id AS VARCHAR) || '.example/book.fb2' AS url,
           'Novel ' || CAST(doc_id AS VARCHAR) || ' chapter heading'
             || chr(10) || text
             || chr(10) || 'verse line one of stanza ' || CAST(doc_id AS VARCHAR)
             || ' verse line two keeps it going' AS extracted_text,
           3 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE FictionBook 2 (.fb2) extraction — the "
    "twenty-seventh dispatch leg, the e-book XML of book-corpus "
    "crawls. Each row's text becomes a real namespaced FB2 file "
    "(description metadata block, titled section, prose paragraph, a "
    "poem stanza whose <v> verse lines must join with spaces, a "
    "link-dominated catalog nav, and a body name='notes' footnote "
    "popup). The oracle expects title + prose + stanza EXACTLY: "
    "description/notes leak, a dropped title, welded verse lines or "
    "a surviving nav all mismatch. '<FictionBook' in the 256-byte "
    "head is the '<'-led family's de-facto magic (no other "
    "dispatched format names its root that). extractor/fb2leg.py; "
    "fixtures/genfb2.py (independent raw-XML writer). Map-only: one "
    "pre-kernel repartition, then synth + extract in sanctioned "
    "Arrow kernels, zero shuffle after.",
)
def q180_fb2_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.genfb2 import build_fb2

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                blob = build_fb2(
                    f"Metadata Book Title {did}",
                    f"Novel {did} chapter heading",
                    [text],
                    stanza_lines=[
                        f"verse line one of stanza {did}",
                        "verse line two keeps it going",
                    ],
                )
                urls.append(f"https://fb2-{did}.example/book.fb2")
                blobs.append(blob)
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q181_djvu_metadata",
    """
    SELECT 'https://djvu-' || CAST(doc_id AS VARCHAR) || '.example/scan.djvu' AS url,
           CASE WHEN doc_id % 2 = 0 THEN 'bundled' ELSE 'single' END AS kind,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 4 ELSE 1 END AS BIGINT)
             AS n_pages,
           CAST(200 + doc_id % 300 AS BIGINT) AS width,
           CAST(300 + doc_id % 200 AS BIGINT) AS height,
           CAST(300 + 100 * (doc_id % 3) AS BIGINT) AS dpi
    FROM documents
    """,
    "DjVu (IFF85) metadata walk - the pre-PDF scanned-document "
    "corpus (archive.org's first decade ships millions). "
    "Walk-don't-decode (the q113 discipline): magic + chunk walk "
    "only, INFO read per first page, bundled DJVM page count by "
    "counting FORM:DJVU children - NO BZZ/JB2/IW44 decode ever runs "
    "on the petabyte path. The INFO chunk's endianness QUIRK (width/"
    "height big-endian, dpi LITTLE-endian - DjVu v3 spec) is pinned "
    "by a hand-written raw-byte KAT independent of the fixture "
    "encoder, so an encoder/decoder pair sharing the bug cannot fake "
    "parity. Fixture: bundled docs (even doc_id, 1 + doc_id%4 pages "
    "behind an opaque stub DIRM) and single-page docs (odd); "
    "closed-form oracle. Map-only mapInArrow, zero shuffle.",
)
def q181_djvu_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("n_pages", T.LongType(), False),
            T.StructField("width", T.LongType(), False),
            T.StructField("height", T.LongType(), False),
            T.StructField("dpi", T.LongType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.multimodal import build_djvu, djvu_info

        for b in it:
            rows = []
            for did in b.column(0).to_pylist():
                w = 200 + did % 300
                h = 300 + did % 200
                dpi = 300 + 100 * (did % 3)
                if did % 2 == 0:
                    pages = [(w, h, dpi)] * (1 + did % 4)
                    blob = build_djvu(pages, bundled=True)
                else:
                    blob = build_djvu([(w, h, dpi)], bundled=False)
                info = djvu_info(blob)
                rows.append(
                    (
                        f"https://djvu-{did}.example/scan.djvu",
                        info["kind"],
                        info["n_pages"],
                        info["width"],
                        info["height"],
                        info["dpi"],
                    )
                )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([r[0] for r in rows], pa.string()),
                    pa.array([r[1] for r in rows], pa.string()),
                    pa.array([r[2] for r in rows], pa.int64()),
                    pa.array([r[3] for r in rows], pa.int64()),
                    pa.array([r[4] for r in rows], pa.int64()),
                    pa.array([r[5] for r in rows], pa.int64()),
                ],
                names=["url", "kind", "n_pages", "width", "height", "dpi"],
            )

    return d.mapInArrow(batches, schema)


@_q(
    "q182_host_disjoint_split",
    """
    WITH d AS (
      SELECT doc_id,
             'sub' || CAST(doc_id % 3 AS VARCHAR) || '.site-'
               || CAST(doc_id % 40 AS VARCHAR) || '.example' AS host,
             'site-' || CAST(doc_id % 40 AS VARCHAR) || '.example' AS domain
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, domain,
             substr(md5('split1|' || domain), 1, 4) AS hh
      FROM d
    ),
    b AS (
      SELECT doc_id, domain, ((strpos('0123456789abcdef', substr(hh, 1, 1)) - 1) * 4096 + (strpos('0123456789abcdef', substr(hh, 2, 1)) - 1) * 256 + (strpos('0123456789abcdef', substr(hh, 3, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(hh, 4, 1)) - 1) * 1) % 100 AS bucket
      FROM keyed
    ),
    assigned AS (
      SELECT doc_id, domain,
             CASE WHEN bucket < 80 THEN 'train'
                  WHEN bucket < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM b
    )
    SELECT split,
           count(*) AS n_docs,
           CAST(count(DISTINCT domain) AS BIGINT) AS n_domains
    FROM assigned
    GROUP BY split
    """,
    "Host-disjoint train/val/test split — the leakage guard every "
    "training-data pipeline needs: assigning by page (or even by "
    "full host) leaks near-duplicate pages of one SITE across "
    "splits, so assignment keys on the registrable domain (q157's "
    "eTLD+1 grain, here planted directly) through a salted md5 "
    "bucket — every subdomain and page of a domain lands in the "
    "SAME split, deterministically, with no RNG state (the q45 "
    "hash-sample discipline). 80/10/10 by bucket; the report "
    "aggregates per split. Disjointness is pytest-locked (no domain "
    "appears in two splits). One groupBy — the corpus-scale shuffle "
    "— and the md5 is a Column expression, never a UDF.",
)
def q182_host_disjoint_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("site-"), (F.col("doc_id") % 40).cast("string"), F.lit(".example")).alias("domain"),
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("split1|"), F.col("domain"))), 1, 4),
            16,
            10,
        ).cast("long")
        % 100
    )
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.select("doc_id", "domain", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("domain").cast("long").alias("n_domains"),
        )
    )


@_q(
    "q183_domain_quality_rollup",
    f"""
    WITH f AS (
      SELECT 'site-' || CAST(doc_id % 25 AS VARCHAR) || '.example' AS domain,
             length(text) AS q_chars,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE CAST({_occ_sql("trim(text)", " ")} + 1 AS BIGINT) END AS q_tokens,
             CAST({_Q21_PUNCT} AS BIGINT) AS q_punct
      FROM documents
    ),
    k AS (
      SELECT domain, q_chars,
             CASE WHEN q_chars >= 80 AND q_tokens >= 16
                        AND (q_chars - (q_tokens - 1)) * 1.0 / q_tokens >= 2.0
                        AND (q_chars - (q_tokens - 1)) * 1.0 / q_tokens <= 12.0
                        AND q_punct >= 1
                  THEN 1 ELSE 0 END AS keep
      FROM f
    )
    SELECT domain,
           count(*) AS n_docs,
           CAST(sum(keep) AS BIGINT) AS n_keep,
           round(sum(keep) * 1.0 / count(*), 4) AS keep_rate,
           CAST(sum(q_chars) AS BIGINT) AS total_chars
    FROM k
    GROUP BY domain
    """,
    "Domain-level quality rollup — the curation table a FineWeb-style "
    "pipeline publishes per registrable domain: document counts, "
    "quality-filter survival (the q21 C4-style keep flag, derived "
    "from the REAL quality_features Columns, not re-implemented), "
    "keep rate and total character mass. At 100 TB this table is how "
    "curators find boilerplate farms (low keep_rate, huge n_docs) "
    "and quality islands worth upsampling. One corpus shuffle "
    "(groupBy domain) over pure Column features; partial aggregation "
    "does the map-side work.",
)
def q183_domain_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toyocr_spark.functions.textfns import quality_features

    d = _t(spark, sf_dir, "documents").select(
        F.concat(F.lit("site-"), (F.col("doc_id") % 25).cast("string"), F.lit(".example")).alias("domain"),
        "text",
    )
    q = quality_features(d, "text")
    return (
        q.groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("q_keep").cast("long").alias("n_keep"),
            F.round(F.sum("q_keep") / F.count("*"), 4).alias("keep_rate"),
            F.sum("q_chars").cast("long").alias("total_chars"),
        )
    )


@_q(
    "q184_mobi_extract",
    """
    SELECT 'https://mobi-' || CAST(doc_id AS VARCHAR) || '.example/book.mobi' AS url,
           'Book ' || CAST(doc_id AS VARCHAR) || ' chapter heading'
             || chr(10) || text AS extracted_text,
           2 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE MOBI/PalmDOC extraction — the twenty-eighth "
    "dispatch leg, the Kindle-era e-book container of book-corpus "
    "crawls. Each row's text rides a real PDB file ('BOOKMOBI' "
    "type/creator at offset 60, a true 8-byte magic): record 0 with "
    "PalmDOC + MOBI headers and an EXTH author entry (metadata "
    "chrome, never surfaced), then 4096-byte text records — PalmDOC "
    "LZ77-compressed for even doc_id (all three token classes live: "
    "literal runs, 11-bit back-references, space+char packs), stored "
    "for odd. The decompressed HTML re-enters the SHARED tokenizer, "
    "so the oracle is q25's closed form: a slip in the PDB walk, the "
    "record-offset accounting, the decompressor or the EXTH "
    "exclusion mismatches every affected row. extractor/mobileg.py; "
    "fixtures/genmobi.py (independent compressor; the DECOMPRESSOR "
    "is additionally pinned by hand-built compressed literals in "
    "tests/test_mobi.py). Map-only sanctioned kernels, zero shuffle.",
)
def q184_mobi_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )
    nav = (
        '<nav><ul><li><a href="/a">one link</a></li>'
        '<li><a href="/b">two link</a></li></ul></nav>'
    )

    def batches(it):
        from toyocr_spark.fixtures.genmobi import build_mobi

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                page = (
                    f"<html><body>{nav}"
                    f"<h1>Book {did} chapter heading</h1>"
                    f"<article><p>{text}</p></article></body></html>"
                ).encode()
                blobs.append(
                    build_mobi(page, compression=2 if did % 2 == 0 else 1)
                )
                urls.append(f"https://mobi-{did}.example/book.mobi")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q185_ndjson_extract",
    """
    SELECT 'https://jsonl-' || CAST(doc_id AS VARCHAR) || '.example/shard.jsonl' AS url,
           'Shard ' || CAST(doc_id AS VARCHAR) || ' record one'
             || chr(10) || text
             || chr(10) || 'second record body for shard ' || CAST(doc_id AS VARCHAR)
             || ' long enough to clear every keep threshold easily' AS extracted_text,
           3 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE NDJSON/JSON-Lines extraction — the twenty-ninth "
    "dispatch leg, the dataset-dump shard format LLM corpora ship "
    "(one JSON object per line with a text field; OSCAR/C4/HF "
    "convention). Gate is a structural sniff (no magic bytes): the "
    "first line must itself be a complete JSON object with a "
    "text-ish string field — after ipynb in dispatch so notebooks "
    "never leak. Each row's shard carries a titled record (the "
    "doc's text), a second text record, a metadata-only record the "
    "walk must skip, and a TRUNCATED final line (the interrupted "
    "download every crawl has) that must quiet-skip. JSON string "
    "escapes decode through the real parser; metadata keys are "
    "chrome. extractor/ndjsonleg.py. Map-only sanctioned kernels, "
    "zero shuffle.",
)
def q185_ndjson_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        import json

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                recs = [
                    {
                        "title": f"Shard {did} record one",
                        "text": text,
                        "url": "https://meta-chrome.example",
                    },
                    {
                        "text": (
                            f"second record body for shard {did} long "
                            "enough to clear every keep threshold easily"
                        ),
                        "id": did,
                    },
                    {"id": did, "meta": "record without any text field"},
                ]
                blob = (
                    "\n".join(json.dumps(r) for r in recs).encode()
                    + b'\n{"text": "truncat'
                )
                urls.append(f"https://jsonl-{did}.example/shard.jsonl")
                blobs.append(blob)
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q186_rst_extract",
    """
    SELECT 'https://rst-' || CAST(doc_id AS VARCHAR) || '.example/docs/index.rst' AS url,
           'Docs page ' || CAST(doc_id AS VARCHAR) || ' heading'
             || chr(10) || text AS extracted_text,
           2 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE reStructuredText extraction — the thirtieth "
    "dispatch leg, the docs format of the Python universe (PyPI "
    "long_descriptions, Sphinx/readthedocs sources, PEPs). rst has "
    "NO magic bytes, so this leg proves the underline-title + "
    "EXCLUSIVE-evidence structural sniff end-to-end (the exclusivity "
    "clause — directive / field list / '::' intro / `x <url>`_ ref "
    "required — is what lets rst outrank the ATX-gated markdown "
    "sniff without ever claiming a setext README). Each row's page "
    "carries the full chrome battery the extractor must drop: an "
    ":Author:/:Date: field list (bibliographic metadata, never "
    "read), a '..' comment, an '.. image::' directive WITH indented "
    "option lines, a link-dominated `label <url>`_ nav line (dies "
    "by the shared density rule), a '.. [1]' footnote definition "
    "and a '.. _name:' hyperlink target; the body paragraph carries "
    "a '[1]_' footnote reference that must strip. The "
    "overline+underline title renders at h1 by the "
    "adornment-order-of-first-use rule. Closed-form oracle: gate, "
    "chrome drops, footnote strip and title must be exact on every "
    "row. extractor/rstleg.py; fixtures/genrst.py. Map-only: one "
    "pre-kernel repartition, then synth + extract in sanctioned "
    "Arrow kernels, zero shuffle after.",
)
def q186_rst_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.genrst import build_rst

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                blobs.append(
                    build_rst(
                        f"Docs page {did} heading",
                        [text],
                        host=f"nav-{did}.example",
                        author=f"author chrome {did}",
                        comment=f"comment chrome {did}",
                        footnote=f"footnote chrome {did}",
                    )
                )
                urls.append(f"https://rst-{did}.example/docs/index.rst")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q187_man_extract",
    """
    SELECT 'https://man-' || CAST(doc_id AS VARCHAR) || '.example/man1/cmd.1' AS url,
           'Manual section ' || CAST(doc_id AS VARCHAR) || ' heading'
             || chr(10) || text AS extracted_text,
           2 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE man-page (troff man(7)) extraction — the "
    "thirty-first dispatch leg, the Unix manual corpus (man7.org and "
    "linux.die.net mirrors, distro doc trees, tarball man/ dirs): "
    "dense curated technical reference prose. The gate is the .TH "
    "near-magic (man(7) mandates it as the first macro) plus the "
    "line-anchored dot-macro surface prose cannot fake — it outranks "
    "every no-magic structural sniff. Each row's page carries the "
    "chrome battery the extractor must drop: a .\\\" comment, the .TH "
    "name/section/date/source/manual metadata line (header+footer "
    "chrome, never read), an .ad renderer request and a "
    "link-dominated .UR/.UE nav run (label chars are link chars — "
    "dies by the shared density rule); the body's first word rides a "
    ".B font macro that must join the paragraph with the font "
    "stripped. Closed-form oracle: gate, macro walk, font-escape "
    "strip and chrome drops must be exact on every row. "
    "extractor/manleg.py; fixtures/genman.py. Map-only: one "
    "pre-kernel repartition, then synth + extract in sanctioned "
    "Arrow kernels, zero shuffle after.",
)
def q187_man_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.genman import build_man

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                blobs.append(
                    build_man(
                        f"Manual section {did} heading",
                        [text],
                        host=f"nav-{did}.example",
                        comment=f"comment chrome {did}",
                        source=f"source chrome {did}",
                        manual=f"Manual Chrome {did}",
                    )
                )
                urls.append(f"https://man-{did}.example/man1/cmd.1")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q188_adoc_extract",
    """
    SELECT 'https://adoc-' || CAST(doc_id AS VARCHAR) || '.example/docs/index.adoc' AS url,
           'Docs page ' || CAST(doc_id AS VARCHAR) || ' heading'
             || chr(10) || text AS extracted_text,
           2 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE AsciiDoc extraction — the thirty-second "
    "dispatch leg, the heavier-duty Markdown sibling of "
    "technical-book and project-docs crawls (Git/GitHub docs, Antora "
    "sites). AsciiDoc has no magic bytes, so this leg proves the "
    "FIRST-significant-line '= Title' doc-header anchor plus "
    "section/attribute/delimiter evidence end-to-end (first-line "
    "anchoring is why no other no-magic leg can claim or be claimed). "
    "Each row's page carries the chrome battery the extractor must "
    "drop: doc-header author/revision lines and :attribute: entries "
    "(metadata never read), a // comment and a //// comment block, "
    "an image:: block macro with its .Caption line, a NOTE: "
    "admonition (the rst-directive rule: rendered asides drop "
    "wholesale), and a link-dominated url[label] nav line (label "
    "chars are link chars — dies by the shared density rule); the "
    "body paragraph carries a footnote:[…] that must strip. "
    "Closed-form oracle: gate, header walk, macro resolution and "
    "chrome drops must be exact on every row. extractor/adocleg.py; "
    "fixtures/genadoc.py. Map-only: one pre-kernel repartition, then "
    "synth + extract in sanctioned Arrow kernels, zero shuffle "
    "after.",
)
def q188_adoc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.genadoc import build_adoc

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                blobs.append(
                    build_adoc(
                        f"Docs page {did} heading",
                        [text],
                        host=f"nav-{did}.example",
                        author=f"author chrome {did}",
                        attribute=f"attribute chrome {did}",
                        comment=f"comment chrome {did}",
                        admonition=f"admonition chrome {did}",
                    )
                )
                urls.append(f"https://adoc-{did}.example/docs/index.adoc")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q189_org_extract",
    """
    SELECT 'https://org-' || CAST(doc_id AS VARCHAR) || '.example/notes/index.org' AS url,
           'Docs page ' || CAST(doc_id AS VARCHAR) || ' heading'
             || chr(10) || text AS extracted_text,
           2 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE Org-mode extraction — the thirty-third dispatch "
    "leg, the Emacs outliner markup of org-publish sites, org-roam "
    "gardens and literate dotfile repos. Org has no magic bytes, so "
    "this leg proves the '#+KEYWORD:' anchor sniff end-to-end "
    "('#'-led but never ATX — '#'+non-space fails markdown's heading "
    "gate, so cross-claims are impossible in either direction). "
    "'#+TITLE:' renders as the document title (the eml-Subject rule: "
    "the one keyword that IS content) while every other export "
    "keyword (AUTHOR/DATE/OPTIONS) is metadata chrome; each row also "
    "plants a '# ' comment line, a BEGIN_COMMENT block, a "
    ":PROPERTIES: drawer and a link-dominated [[url][label]] nav "
    "line (desc chars are link chars — dies by the shared density "
    "rule); the body's first word rides a *bold* span that must "
    "resolve. Closed-form oracle: gate, keyword walk, drawer/comment "
    "drops and emphasis resolution must be exact on every row. "
    "extractor/orgleg.py; fixtures/genorg.py. Map-only: one "
    "pre-kernel repartition, then synth + extract in sanctioned "
    "Arrow kernels, zero shuffle after.",
)
def q189_org_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.genorg import build_org

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                blobs.append(
                    build_org(
                        f"Docs page {did} heading",
                        [text],
                        host=f"nav-{did}.example",
                        author=f"author chrome {did}",
                        comment=f"comment chrome {did}",
                        drawer_value=f"drawer chrome {did}",
                    )
                )
                urls.append(f"https://org-{did}.example/notes/index.org")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q190_texinfo_extract",
    """
    SELECT 'https://texi-' || CAST(doc_id AS VARCHAR) || '.example/manual.texi' AS url,
           'Manual title ' || CAST(doc_id AS VARCHAR) || ' heading'
             || chr(10) || text AS extracted_text,
           2 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE Texinfo extraction — the thirty-fourth dispatch "
    "leg, GNU manual sources (.texi: the documentation format of the "
    "whole GNU toolchain, mirrored across software-archive crawls). "
    "The gate is the '\\\\input texinfo' bootstrap de-facto magic "
    "(every conforming file leads with it; disjoint from LaTeX's "
    "\\\\documentclass gate) plus line-anchored @-command evidence. "
    "Each row's manual carries the chrome battery the extractor must "
    "drop: @setfilename/@documentencoding header machinery, a "
    "@copying block and a @titlepage block (license/cover chrome), "
    "the @menu navigation (the ONE format whose nav is declared "
    "structurally — no density rule needed), a @node pointer line, "
    "a @c comment and @bye; @settitle renders as the title (the "
    "org-#+TITLE rule) and the body's first word rides a @code{} "
    "brace command that must resolve innermost-out. Closed-form "
    "oracle: gate, command walk, brace resolution and chrome drops "
    "must be exact on every row. extractor/texinfoleg.py; "
    "fixtures/gentexinfo.py. Map-only: one pre-kernel repartition, "
    "then synth + extract in sanctioned Arrow kernels, zero shuffle "
    "after.",
)
def q190_texinfo_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.gentexinfo import build_texinfo

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                blobs.append(
                    build_texinfo(
                        f"Manual title {did} heading",
                        [text],
                        filename=f"chrome-{did}.info",
                        copying=f"copying chrome {did}",
                        comment=f"comment chrome {did}",
                    )
                )
                urls.append(f"https://texi-{did}.example/manual.texi")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q191_docbook_extract",
    """
    SELECT 'https://db-' || CAST(doc_id AS VARCHAR) || '.example/book/index.xml' AS url,
           'Docs page ' || CAST(doc_id AS VARCHAR) || ' heading'
             || chr(10) || text AS extracted_text,
           2 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE DocBook extraction — the thirty-fifth dispatch "
    "leg, the technical-book XML of software-documentation crawls "
    "(TLDP/Linux-HOWTO, GNOME/KDE/PHP manuals, O'Reilly-era book "
    "sources). The gate is root-anchored (the FictionBook rule: the "
    "ROOT element must BE a DocBook division — '<article>' is also "
    "an HTML5 tag but never an HTML page's root) plus DocBook "
    "evidence (namespace / OASIS DOCTYPE / <para>/<sect> tags); "
    "malformed XML tokenizes empty and falls through to the HTML "
    "tokenizer rather than zeroing the page. The fixture ROTATES "
    "DB4 and DB5 by doc_id parity so BOTH title placements prove "
    "out (DB4: <title> direct child + <articleinfo>; DB5: <title> "
    "inside <info> — the one element read out of the metadata "
    "block). Chrome battery per row: author/pubdate/abstract/"
    "legalnotice metadata, a <note> admonition, a <footnote>, an "
    "<indexterm>, an XML comment and a ulink-dominated nav para "
    "(link text is link chars — dies by the shared density rule); "
    "the body's first word rides an <emphasis> span. Closed-form "
    "oracle: gate, both-version title walk, metadata drops and "
    "footnote strip must be exact on every row. "
    "extractor/docbookleg.py; fixtures/gendocbook.py. Map-only: one "
    "pre-kernel repartition, then synth + extract in sanctioned "
    "Arrow kernels, zero shuffle after.",
)
def q191_docbook_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.gendocbook import build_docbook

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                blobs.append(
                    build_docbook(
                        f"Docs page {did} heading",
                        [text],
                        version=4 if did % 2 == 0 else 5,
                        host=f"nav-{did}.example",
                        author=f"author chrome {did}",
                        abstract=f"abstract chrome {did}",
                        note=f"note chrome {did}",
                        footnote=f"footnote chrome {did}",
                    )
                )
                urls.append(f"https://db-{did}.example/book/index.xml")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q192_mdoc_extract",
    """
    SELECT 'https://mdoc-' || CAST(doc_id AS VARCHAR) || '.example/man1/cmd.1' AS url,
           'Manual section ' || CAST(doc_id AS VARCHAR) || ' heading'
             || chr(10) || text AS extracted_text,
           2 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE mdoc(7) BSD man-page extraction — the "
    "thirty-sixth dispatch leg, completing the manual-page family: "
    "man(7) covers the GNU/Linux corpus (q187), mdoc the BSD one "
    "(FreeBSD/OpenBSD/NetBSD/macOS man trees). The gate is the "
    "mandated .Dd prologue macro plus mdoc macro evidence — man(7) "
    "pages carry .TH and never .Dd, so the two near-magic gates are "
    "disjoint by construction (trap-pinned both ways). Each row's "
    "page carries the chrome battery the extractor must drop: a "
    ".\\\" comment, the .Dd/.Dt/.Os prologue (header+footer chrome, "
    "never read) and a link-dominated .Lk nav paragraph (label "
    "chars are link chars — dies by the shared density rule); the "
    "body's first word rides an .Em semantic macro that must render "
    "to plain text through the bounded macro vocabulary. "
    "Closed-form oracle: gate, prologue drops, macro rendering and "
    "nav scoring must be exact on every row. extractor/mdocleg.py; "
    "fixtures/genmdoc.py. Map-only: one pre-kernel repartition, "
    "then synth + extract in sanctioned Arrow kernels, zero shuffle "
    "after.",
)
def q192_mdoc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.genmdoc import build_mdoc

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                blobs.append(
                    build_mdoc(
                        f"Manual section {did} heading",
                        [text],
                        host=f"nav-{did}.example",
                        comment=f"comment chrome {did}",
                        os_name=f"os chrome {did}",
                    )
                )
                urls.append(f"https://mdoc-{did}.example/man1/cmd.1")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q193_gemtext_extract",
    """
    SELECT 'https://gmi-' || CAST(doc_id AS VARCHAR) || '.example/index.gmi' AS url,
           'Capsule page ' || CAST(doc_id AS VARCHAR) || ' heading'
             || chr(10) || text AS extracted_text,
           2 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE gemtext extraction — the thirty-seventh "
    "dispatch leg, Gemini-protocol capsules (text/gemini), widely "
    "mirrored over HTTP by proxy portals and present in web-scale "
    "crawls. Gemtext has no magic bytes and its heading/bullet "
    "surface is markdown-forgeable, but its '=> url label' link "
    "lines are gemtext-EXCLUSIVE — the gate demands >= 2 of them "
    "with a FENCE-AWARE count (a markdown README whose code fences "
    "hold '=>'-led Scala/Haskell arrows never counts them; "
    "trap-pinned). Each row's capsule carries header AND footer nav "
    "runs of short link lines — in gemtext every link is its own "
    "line, 100% anchor text, so each dies by the shared density "
    "rule exactly as an HTML nav anchor does — while the title "
    "heading and the bare-line body paragraphs survive. Closed-form "
    "oracle: gate, line walk and nav scoring must be exact on every "
    "row. extractor/gemtextleg.py; fixtures/gengemtext.py. "
    "Map-only: one pre-kernel repartition, then synth + extract in "
    "sanctioned Arrow kernels, zero shuffle after.",
)
def q193_gemtext_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.gengemtext import build_gemtext

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                blobs.append(
                    build_gemtext(
                        f"Capsule page {did} heading",
                        [text],
                        host=f"nav-{did}.example",
                    )
                )
                urls.append(f"https://gmi-{did}.example/index.gmi")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q194_po_extract",
    """
    SELECT 'https://po-' || CAST(doc_id AS VARCHAR) || '.example/locale/app.po' AS url,
           'Catalog title ' || CAST(doc_id AS VARCHAR) || ' target'
             || chr(10) || text AS extracted_text,
           2 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE gettext PO catalog extraction — the "
    "thirty-eighth dispatch leg, the localization format of the "
    "GNU/Linux + web-app ecosystem (source tarballs, "
    "translation-platform exports): a first-class parallel-text "
    "source for multilingual corpora. The gate is the PO-exclusive "
    "paired line-anchored msgid/msgstr surface (>= 2 pairs). Each "
    "row's catalog carries the full machinery the extractor must "
    "drop: the header entry (Project-Id-Version/charset metadata — "
    "the docProps discipline), all four comment flavors, a msgctxt "
    "disambiguator, the msgid SOURCE strings (the translation is "
    "the content; pairs surface through po_pairs for bitext "
    "mining), a '#, fuzzy' machine-merged entry, an untranslated "
    "entry and a '#~' obsolete entry — none may leak; the title "
    "msgstr rides a string CONTINUATION split that must concatenate "
    "through the real unescape. Closed-form oracle: gate, entry "
    "walk, continuation join and every exclusion must be exact on "
    "every row. extractor/poleg.py; fixtures/genpo.py. Map-only: "
    "one pre-kernel repartition, then synth + extract in sanctioned "
    "Arrow kernels, zero shuffle after.",
)
def q194_po_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.genpo import build_po

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                blobs.append(
                    build_po(
                        [
                            (f"source title {did} chrome", f"Catalog title {did} target"),
                            (f"source body {did} chrome", text),
                        ],
                        project=f"project chrome {did}",
                        comment=f"comment chrome {did}",
                        msgctxt=f"context chrome {did}",
                        multiline_index=0,
                    )
                )
                urls.append(f"https://po-{did}.example/locale/app.po")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q195_ttml_extract",
    """
    SELECT 'https://ttml-' || CAST(doc_id AS VARCHAR) || '.example/captions.ttml' AS url,
           'Caption track ' || CAST(doc_id AS VARCHAR) || ' opener'
             || chr(10) || text AS extracted_text,
           2 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE TTML caption extraction — the thirty-ninth "
    "dispatch leg, the broadcast/streaming XML caption interchange "
    "format (.ttml/.dfxp: IMSC, SMPTE-TT, Netflix/iTunes delivery) — "
    "the XML sibling of the WebVTT/SRT leg and the same "
    "spoken-register training source. The gate is namespace-anchored "
    "(the fb2/docbook root rule): the root must be <tt> DECLARING a "
    "TTML namespace — a bare <tt> of another dialect or an HTML "
    "teletype element never matches; malformed XML tokenizes empty "
    "and falls through to the HTML tokenizer. The fixture ROTATES "
    "the current and legacy (2006 ttaf1) namespaces by doc_id "
    "parity, splits cues across <br/> (joins as a space) and wraps "
    "opening words in styled <span>s (inner text keeps, markup "
    "weight counted); the whole <head> subtree (title/copyright "
    "metadata, styling, layout regions) and cue timing attributes "
    "are format-declared chrome. Closed-form oracle: gate, cue walk, "
    "br/span resolution and head exclusion must be exact on every "
    "row. extractor/ttmlleg.py; fixtures/genttml.py. Map-only: one "
    "pre-kernel repartition, then synth + extract in sanctioned "
    "Arrow kernels, zero shuffle after.",
)
def q195_ttml_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.genttml import build_ttml

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                blobs.append(
                    build_ttml(
                        [f"Caption track {did} opener", text],
                        legacy_ns=bool(did % 2),
                        title=f"head title chrome {did}",
                        copyright_text=f"copyright chrome {did}",
                        with_spans=True,
                        with_br=True,
                    )
                )
                urls.append(f"https://ttml-{did}.example/captions.ttml")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q196_bibtex_extract",
    """
    SELECT 'https://bib-' || CAST(doc_id AS VARCHAR) || '.example/refs.bib' AS url,
           'Planted study ' || CAST(doc_id AS VARCHAR) || ' title'
             || chr(10) || text AS extracted_text,
           2 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE BibTeX extraction — the fortieth dispatch leg, "
    "bibliography databases (.bib: on practically every academic "
    "homepage, journal site and paper-artifact repo a crawl touches) "
    "— titles and abstracts are first-class scientific-register "
    "training text. The gate is the bib-exclusive line-anchored "
    "@type{key, entry-head surface (>= 2 heads + field evidence; "
    "Texinfo's @-commands never carry the brace+key shape, "
    "trap-pinned). Each row's database carries the machinery the "
    "extractor must drop: an @string macro definition (referenced by "
    "the journal field — the indirection never renders), an "
    "@preamble, an @comment, and the metadata field battery "
    "(authors, year, volume, pages, doi, publisher); the title "
    "field rides a '#' CONCATENATION split by doc_id parity and a "
    "quoted-delimiter rotation, so the value grammar proves out on "
    "every row. Closed-form oracle: gate, entry walk, concatenation "
    "join, LaTeX-ism cleanup and every field exclusion must be "
    "exact. extractor/bibleg.py; fixtures/genbib.py. Map-only: one "
    "pre-kernel repartition, then synth + extract in sanctioned "
    "Arrow kernels, zero shuffle after.",
)
def q196_bibtex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.genbib import build_bib

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                blobs.append(
                    build_bib(
                        [(f"Planted study {did} title", text)],
                        author=f"Chrome, Author {did}",
                        journal_macro=f"Journal Chrome {did}",
                        comment=f"comment chrome {did}",
                        preamble=f"preamble chrome {did}",
                        quoted_index=0 if did % 2 == 0 else None,
                        concat_index=0 if did % 2 == 1 else None,
                    )
                )
                urls.append(f"https://bib-{did}.example/refs.bib")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


@_q(
    "q197_ms_extract",
    """
    SELECT 'https://ms-' || CAST(doc_id AS VARCHAR) || '.example/papers/tr.ms' AS url,
           'Planted report ' || CAST(doc_id AS VARCHAR) || ' title'
             || chr(10) || text AS extracted_text,
           2 AS n_kept
    FROM documents
    """,
    "DRIVER-CHECKABLE troff ms paper extraction — the forty-first "
    "dispatch leg, completing the troff trio: man(7) manuals (q187), "
    "mdoc(7) BSD manuals (q192), and ms PAPERS — the Bell Labs "
    "technical-report/USENIX format of software archives and "
    "historical computing corpora. The three gates are pairwise "
    "disjoint by their mandated macros (.TH / .Dd / .TL — "
    "trap-pinned in all directions). Each row's paper carries the "
    "chrome battery the extractor must drop: a comment, .AU/.AI "
    "byline metadata (the docProps discipline), an .FS...FE "
    "footnote and an .EQ...EN eqn-source plant; the .TL title "
    "collects its following text lines and the body's first word "
    "rides a \\fB...\\fR font span resolved through the SHARED "
    "troff helpers (extractor/manleg._unescape — one escape grammar "
    "across the trio). Closed-form oracle: gate, title collection, "
    "font strip and chrome drops must be exact on every row. "
    "extractor/msleg.py; fixtures/genms.py. Map-only: one "
    "pre-kernel repartition, then synth + extract in sanctioned "
    "Arrow kernels, zero shuffle after.",
)
def q197_ms_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspark.sql import types as T

    from toyocr_spark.pipeline import extract_pages

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]
    )

    def batches(it):
        from toyocr_spark.fixtures.genms import build_ms

        for b in it:
            urls, blobs = [], []
            for did, text in zip(b.column(0).to_pylist(), b.column(1).to_pylist()):
                blobs.append(
                    build_ms(
                        f"Planted report {did} title",
                        [text],
                        author=f"author chrome {did}",
                        institution=f"institute chrome {did}",
                        comment=f"comment chrome {did}",
                        footnote=f"footnote chrome {did}",
                        equation=f"equation chrome {did}",
                    )
                )
                urls.append(f"https://ms-{did}.example/papers/tr.ms")
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(blobs, pa.binary())],
                names=["url", "html"],
            )

    pages = d.mapInArrow(batches, schema)
    out = extract_pages(pages)
    return out.select(
        "url", "extracted_text", F.col("n_kept").cast("int").alias("n_kept")
    )


# ---------------------------------------------------------------------------
# public accessors (the __spark_entry__ contract)

# The driver verifies only the FIRST 50 registry entries per round
# (round 2: list(queries())[:50] == CORRECTNESS_r02 keys exactly), so
# the registry is served priority-first. Round-5 window: 69 specs are
# new this round (q129-q197) and cannot all fit, so the 50 slots hold
# q116 (rows-only -> full planted-fixture oracle this round), the
# flagship q25_extract, and the 48 new specs WITHOUT an in-window
# sibling; the overflow picks each have a sibling in-window
# exercising the same machinery (rationale on each line below), and
# every overflow spec — these seven plus the r2-r4-green veterans —
# is re-proven each run by tests/test_oracle_parity.py (the
# exact-value replica).
_DRIVER_PRIORITY: list[str] = [
    # new / changed this round
    "q129_docx_extract",  # new: OOXML WordprocessingML extraction
    "q130_xlsx_extract",  # new: OOXML SpreadsheetML extraction
    "q132_ooxml_metadata",  # new: docProps/core.xml harvest (the trio)
    "q133_epub_extract",  # new: EPUB spine walk reusing the HTML tokenizer
    "q134_rtf_extract",  # new: legacy RTF control-word machine
    "q135_outlink_mining",  # new: unified five-format edge extractor
    "q136_gzip_extract",  # new: gzip transfer-encoding envelope strip
    "q137_doc_extract",  # new: legacy binary Word (CFB + piece table)
    "q139_odt_extract",  # new: OpenDocument Text (ODF package walk)
    "q140_xls_extract",  # new: legacy binary Excel (BIFF8 over CFB)
    "q150_hreflang_pairs",  # new: reciprocal hreflang bitext-page pairing
    "q151_microdata",  # new: schema.org microdata harvest (JSON-LD twin)
    "q154_crawl_traps",  # new: URL-template-collapse trap-host detection
    "q155_politeness_schedule",  # new: q92 waves x robots Crawl-delay
    "q156_hits",  # new: integer-exact hubs & authorities (PageRank's twin)
    "q163_wikitext_extract",  # new: MediaWiki wikitext leg (heading+evidence sniff)
    "q166_mbox_extract",  # new: mbox mailbox container (postmark walk)
    "q167_redirect_resolve",  # new: per-URL redirect canonicalization + loops
    "q168_ics_extract",  # new: iCalendar leg (RFC 5545 fold/escape grammar)
    "q169_recrawl_schedule",  # new: change-rate recrawl buckets (freshness)
    "q170_zip_extract",  # new: generic-zip bundle walk (tar's twin)
    "q171_ps_extract",  # new: PostScript leg (show machine + XY-cut)
    "q172_mojibake_repair",  # new: cp1252 double-encoding repair (JVM-only)
    "q173_arc_extract",  # new: ARC container ingest (pre-WARC crawls)
    "q174_markdown_render",  # new: structure-preserving Markdown product
    "q175_textrank_keywords",  # new: per-doc TextRank (q44 integer discipline)
    "q176_lang_segments",  # new: paragraph-level code-switch segmentation
    "q177_crawl_budget",  # new: largest-remainder budget apportionment
    "q178_fetcher_assign",  # new: rendezvous-hash host sharding
    "q179_revalidation_savings",  # new: conditional-GET bandwidth pricing
    "q180_fb2_extract",  # new: FictionBook e-book leg (27th dispatch leg)
    "q181_djvu_metadata",  # new: DjVu IFF walk (walk-don't-decode family)
    "q182_host_disjoint_split",  # new: domain-keyed leakage-safe split
    "q183_domain_quality_rollup",  # new: per-domain curation table
    "q184_mobi_extract",  # new: MOBI/PalmDOC e-book leg (28th dispatch leg)
    "q185_ndjson_extract",  # new: JSON-Lines dataset-shard leg (29th)
    "q186_rst_extract",  # new: reStructuredText leg (30th dispatch leg)
    "q187_man_extract",  # new: man(7) troff leg (31st dispatch leg)
    "q188_adoc_extract",  # new: AsciiDoc leg (32nd dispatch leg)
    "q189_org_extract",  # new: Org-mode leg (33rd dispatch leg)
    "q190_texinfo_extract",  # new: Texinfo leg (34th dispatch leg)
    "q191_docbook_extract",  # new: DocBook leg (35th dispatch leg)
    "q192_mdoc_extract",  # new: mdoc(7) BSD man leg (36th dispatch leg)
    "q193_gemtext_extract",  # new: gemtext capsule leg (37th dispatch leg)
    "q194_po_extract",  # new: gettext PO catalog leg (38th dispatch leg)
    "q195_ttml_extract",  # new: TTML caption leg (39th dispatch leg)
    "q196_bibtex_extract",  # new: BibTeX leg (40th dispatch leg)
    "q197_ms_extract",  # new: troff ms paper leg (41st dispatch leg)
    "q116_sentence_align",  # oracle: rows-only -> planted closed form
    # flagship
    "q25_extract",
    # first overflow (the driver window holds 50): each of these seven
    # has an in-window sibling exercising the same machinery under an
    # equally strict oracle, and every overflow spec is re-proven each
    # run by the local exact-value replica (tests/test_oracle_parity.py)
    "q131_pptx_extract",  # overflow: OOXML trio, q129/q130 in-window
    "q138_mhtml_extract",  # overflow: MIME walk, q164_eml in-window
    "q141_ppt_extract",  # overflow: legacy-binary trio, q137/q140 in-window
    "q143_odp_extract",  # overflow: ODF trio, q139/q142 in-window
    "q145_deflate_extract",  # overflow: envelope family, q136+q144 in-window
    "q146_sitemap_index",  # overflow: sitemap family, q95 green + q147 in-window
    "q148_opengraph",  # overflow: metadata harvests, q98 green + q151 in-window
    "q142_ods_extract",  # overflow: ODF trio, q139 in-window; RLE cells in the local replica
    "q144_bz2_xz_extract",  # overflow: envelope family, q136 in-window (q145 also overflow)
    "q152_markdown_extract",  # overflow: no-magic structural-sniff text legs, q163+q186 in-window
    "q158_csv_extract",  # overflow: structural-sniff + cell-walk family, q130+q163+q186+q188 in-window
    "q161_subtitle_extract",  # overflow: mandated-first-line near-magic family, q168+q187 in-window
    "q160_ipynb_extract",  # overflow: JSON-parser-walk sniff family, q185 in-window
    "q159_latex_extract",  # overflow: backslash-command docs family, q190 in-window (+ tar path q153)
    "q164_eml_extract",  # overflow: MIME-walk family, q166_mbox in-window re-enters tokenize_eml per message
    "q153_tar_extract",  # overflow: bundle-walk family, q170_zip in-window shares tarleg._member_blocks
    "q157_registrable_domain",  # overflow: eTLD+1 grain, q182_host_disjoint_split in-window keys on it
    "q149_robots_wildcards",  # overflow: robots admission family, q155_politeness in-window composes Crawl-delay
    "q162_anchor_text",  # overflow: pure-Column regexp-harvest + two-level agg, q135+q183 in-window
    "q147_atom_feeds",  # overflow: rel-gated attribute-link XML walk, q150_hreflang in-window (q118 hash-green r4)
    "q165_thread_reconstruct",  # overflow: pointer-doubling fixpoint shape, q167_redirect_resolve in-window
    # last driver row in round 2 (all 42)
    "q02_topk_per_group",
    "q03_local_max",
    "q04_sessions",
    "q05_overlap_join",
    "q06_dontcare_anti",
    "q07_greedy_match",
    "q09_ap",
    "q10_occupancy",
    "q11_region_revenue",
    "q12_topk_mean",
    "q13_dedup_exact",
    "q14_jaccard",
    "q16_simhash",
    "q17_ann_brute",
    "q18_ann_bucketed",
    "q19_embedding_near_dup",
    "q20_lang_id",
    "q21_quality",
    "q22_token_fingerprint",
    "q23_json_props",
    "q24_levenshtein",
    "q26_media_decode",
    "q27_media_frames",
    "q28_class_histogram",
    "q29_repeat_factor",
    "q30_gather_sorted",
    "q31_array_hof_filters",
    "q33_skew_safe_topk",
    "q34_string_funcs",
    "q36_simhash_pairs",
    "q37_greedy_exact",
    "q38_simhash64",
    "q39_simhash64_pairs",
    "q40_pdf_extract",
    "q41_url_canonical",
    "q42_outlinks",
    "q43_page_metadata",
    "q46_repetition",
    "q48_paragraph_dedup",
    "q49_tfidf_topk",
    # (q50/q51 rotated out to fit q135/q136: r2 hash-green, re-proven
    # locally every round like all overflow)
    # (all r3 veterans rotated out to fit q130-q134: q53's coarse CTEs
    # and q54's probe CTEs are re-proven inside q127's composed oracle
    # every round, and every overflow spec is re-proven locally by
    # tests/test_oracle_parity.py)
]


def _ordered() -> dict[str, QuerySpec]:
    head = [n for n in _DRIVER_PRIORITY if n in QUERIES]
    tail = [n for n in QUERIES if n not in set(head)]
    return {n: QUERIES[n] for n in (*head, *tail)}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.sql for name, spec in _ordered().items() if spec.sql is not None}
