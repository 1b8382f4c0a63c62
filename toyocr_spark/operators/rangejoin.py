"""Interval/overlap joins — D14 ``bbox_overlaps`` (an interval
theta-join, /root/reference/modeling/losses/iou_loss.py:27-81), the
greedy IoU matcher J3 (evaluation/scripts.py:246-270) and the
don't-care anti-join J4 (evaluation/scripts.py:232-241) in 1-D.

Scale notes: a bare theta-join is a cartesian product per key group, so
every operator here takes equi-key columns (per-url / per-user) that
turn it into an equi-join + residual predicate — Spark executes it as a
hash join with the overlap filter applied on match candidates. For
key-free interval joins at scale use ``bucketed_overlap_join``, which
grids the range into buckets (equi-join on bucket id) — the standard
binning trick that keeps the join linear in matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ov(a_start, a_end, b_start, b_end):
    return (a_start < b_end) & (b_start < a_end)


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    on: list[str],
    a_start: str = "start",
    a_end: str = "end",
    b_start: str = "start",
    b_end: str = "end",
    how: str = "inner",
) -> DataFrame:
    """Pairs of overlapping [start,end) intervals sharing the equi-key,
    with overlap length and IoU columns (the 1-D bbox_overlaps)."""
    aa = a.select(*on, F.col(a_start).alias("a_start"), F.col(a_end).alias("a_end"), *[c for c in a.columns if c not in (*on, a_start, a_end)])
    bb = b.select(*on, F.col(b_start).alias("b_start"), F.col(b_end).alias("b_end"), *[c for c in b.columns if c not in (*on, b_start, b_end)])
    j = aa.join(bb, on, how).filter(_ov(F.col("a_start"), F.col("a_end"), F.col("b_start"), F.col("b_end")))
    inter = F.least("a_end", "b_end") - F.greatest("a_start", "b_start")
    union = F.greatest("a_end", "b_end") - F.least("a_start", "b_start")
    return j.withColumn("overlap", inter).withColumn("iou", inter.cast("double") / union.cast("double"))


def overlap_anti_join(
    det: DataFrame,
    dontcare: DataFrame,
    on: list[str],
    min_fraction: float = 0.5,
    det_start: str = "start",
    det_end: str = "end",
    dc_start: str = "start",
    dc_end: str = "end",
) -> DataFrame:
    """J4: drop detections whose area-precision against any don't-care
    interval exceeds ``min_fraction`` (evaluation/scripts.py:232-241).
    Implemented as a left_anti join on (equi-key AND overlap-fraction
    predicate) — the matched rows never materialize."""
    d = det
    dc = dontcare.select(*on, F.col(dc_start).alias("_dcs"), F.col(dc_end).alias("_dce"))
    inter = F.least(F.col(det_end), F.col("_dce")) - F.greatest(F.col(det_start), F.col("_dcs"))
    frac = inter.cast("double") / (F.col(det_end) - F.col(det_start)).cast("double")
    cond = [d[c] == dc[c] for c in on]
    pred = _ov(F.col(det_start), F.col(det_end), F.col("_dcs"), F.col("_dce")) & (frac > min_fraction)
    return d.join(dc, [*cond, pred], "left_anti")


def mutual_first_match(
    gt: DataFrame,
    det: DataFrame,
    on: list[str],
    iou_threshold: float = 0.5,
) -> DataFrame:
    """1:1 matching by mutual-first preference: a pair survives iff the
    det is the gt's lowest-index candidate AND the gt is the det's
    lowest-index candidate — two rank-dedup window passes over the
    overlap join. Deterministic, fully declarative, one shuffle per
    pass; the SQL-expressible sibling of the reference's greedy loop
    (it under-matches relative to greedy when a discarded claim would
    have been re-scanned — see greedy_iou_match for exact semantics).
    Columns required: ``gt_idx`` on gt, ``det_idx`` on det, plus
    start/end."""
    pairs = interval_overlap_join(gt, det, on).filter(F.col("iou") > iou_threshold)
    w1 = Window.partitionBy(*on, "det_idx").orderBy("gt_idx")
    pairs = pairs.withColumn("_r1", F.row_number().over(w1)).filter(F.col("_r1") == 1)
    w2 = Window.partitionBy(*on, "gt_idx").orderBy("det_idx")
    pairs = pairs.withColumn("_r2", F.row_number().over(w2)).filter(F.col("_r2") == 1)
    return pairs.drop("_r1", "_r2")


def greedy_iou_match(
    gt: DataFrame,
    det: DataFrame,
    on: list[str],
    iou_threshold: float = 0.5,
) -> DataFrame:
    """J3's exact greedy 1:1 matching (evaluation/scripts.py:246-270):
    outer loop over gt in index order, inner scan over det in index
    order, first unused det with IoU > threshold wins — used-flags and
    all. Sequential per key, so it runs as applyInPandas per equi-key
    group (both sides are small per url/image — the reference's own
    regime, data/build.py:330 batch=1). Candidate generation is still
    the distributed overlap join; only the per-key matching loop is in
    pandas."""
    import pandas as pd

    pairs = interval_overlap_join(gt, det, on).filter(F.col("iou") > iou_threshold)
    cols = [*on, "gt_idx", "det_idx", "iou"]
    pairs = pairs.select(*cols)

    def match(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["gt_idx", "det_idx"], kind="mergesort")
        used: set = set()
        keep = []
        cur_gt = object()
        matched_cur = False
        for row in pdf.itertuples(index=False):
            if row.gt_idx != cur_gt:
                cur_gt, matched_cur = row.gt_idx, False
            if matched_cur or row.det_idx in used:
                continue
            used.add(row.det_idx)
            matched_cur = True
            keep.append(row)
        return pd.DataFrame(keep, columns=pdf.columns) if keep else pdf.iloc[0:0]

    schema = pairs.schema
    return pairs.groupBy(*on).applyInPandas(match, schema)


def bucketed_overlap_join(
    a: DataFrame,
    b: DataFrame,
    bucket_width: int,
    a_start: str = "start",
    a_end: str = "end",
    b_start: str = "start",
    b_end: str = "end",
) -> DataFrame:
    """Key-free interval join at scale: explode each interval to the
    grid buckets it touches, equi-join on bucket, filter the residual
    overlap predicate, dedup multi-bucket matches. Shuffle is on bucket
    id -> linear in (rows + matches), never quadratic."""
    def bucketize(df, s, e, side):
        return df.withColumn(
            "_bkt",
            F.explode(
                F.sequence(
                    (F.col(s) / bucket_width).cast("long"),
                    ((F.col(e) - 1) / bucket_width).cast("long"),
                )
            ),
        ).withColumnRenamed(s, f"{side}_start").withColumnRenamed(e, f"{side}_end")

    aa = bucketize(a, a_start, a_end, "a")
    bb = bucketize(b, b_start, b_end, "b")
    j = aa.join(bb, "_bkt").filter(
        _ov(F.col("a_start"), F.col("a_end"), F.col("b_start"), F.col("b_end"))
    )
    # keep each pair once: attribute it to the first shared bucket
    first_shared = F.greatest(
        (F.col("a_start") / bucket_width).cast("long"),
        (F.col("b_start") / bucket_width).cast("long"),
    )
    return j.filter(F.col("_bkt") == first_shared).drop("_bkt")
