"""Evaluation aggregates: two-level precision/recall/hmean (A4,
/root/reference/evaluation/scripts.py:284-335) and rank-based average
precision (A5, scripts.py:129-147).

Both are pure partial+final aggregations — the map-side combine makes
them constant-state per partition at any scale. AP needs a global sort
by confidence; at 100 TB that is a range-partitioned sort (Spark's
orderBy), and the running-sum window is streaming within partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hmean(p: Column, r: Column) -> Column:
    # 2PR/(P+R) with the reference's 0-guard (scripts.py:296-299)
    return F.when(p + r == 0, F.lit(0.0)).otherwise(2 * p * r / (p + r))


def pr_hmean(
    df: DataFrame,
    group_cols: list[str],
    matched: Column,
    gt_care: Column,
    det_care: Column,
) -> DataFrame:
    """Per-group then global P/R/hmean, exactly the two-level shape of
    the reference: per-image counts -> global sums -> ratios.

    matched / gt_care / det_care are 0/1 integer columns (conditional
    aggregates, the masked-sum pattern of A1/A2).
    Returns per-group rows; the global roll-up is ``.agg`` over this.
    """
    g = df.groupBy(*group_cols).agg(
        F.sum(matched.cast("long")).alias("matched_sum"),
        F.sum(gt_care.cast("long")).alias("num_gt_care"),
        F.sum(det_care.cast("long")).alias("num_det_care"),
    )
    recall = F.when(F.col("num_gt_care") == 0, F.lit(1.0)).otherwise(
        F.col("matched_sum") / F.col("num_gt_care")
    )
    precision = F.when(F.col("num_det_care") == 0, F.lit(0.0)).otherwise(
        F.col("matched_sum") / F.col("num_det_care")
    )
    return (
        g.withColumn("recall", recall)
        .withColumn("precision", precision)
        .withColumn("hmean", _hmean(F.col("precision"), F.col("recall")))
    )


def global_pr_hmean(per_group: DataFrame) -> DataFrame:
    """The final reduce over pr_hmean output (the comm.gather merge,
    evaluation/text_eval.py:174-212 -> scripts.py:305-319)."""
    g = per_group.agg(
        F.sum("matched_sum").alias("matched_sum"),
        F.sum("num_gt_care").alias("num_gt_care"),
        F.sum("num_det_care").alias("num_det_care"),
    )
    recall = F.when(F.col("num_gt_care") == 0, F.lit(1.0)).otherwise(
        F.col("matched_sum") / F.col("num_gt_care")
    )
    precision = F.when(F.col("num_det_care") == 0, F.lit(0.0)).otherwise(
        F.col("matched_sum") / F.col("num_det_care")
    )
    return (
        g.withColumn("recall", recall)
        .withColumn("precision", precision)
        .withColumn("hmean", _hmean(F.col("precision"), F.col("recall")))
    )


def average_precision(
    df: DataFrame,
    conf_col: str,
    correct: Column,
    num_gt: Column | int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """A5 (scripts.py:129-147): sort by confidence desc, running
    sum(correct)/rank at each correct hit, summed, / num_gt.

    tiebreak_col makes the sort total (determinism hazard: equal
    confidences must order stably across engines).
    """
    order = [F.col(conf_col).desc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    c = correct.cast("long")
    ranked = df.withColumn("_correct", c).withColumn(
        "_cum", F.sum("_correct").over(w)
    ).withColumn("_rank", F.count("*").over(w))
    contrib = F.when(F.col("_correct") == 1, F.col("_cum").cast("double") / F.col("_rank")).otherwise(F.lit(0.0))
    n = F.lit(num_gt) if isinstance(num_gt, int) else num_gt
    return ranked.agg((F.sum(contrib) / n).alias("ap"))
