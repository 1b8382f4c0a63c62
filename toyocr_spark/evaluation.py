"""Extraction evaluation — the reference's eval protocol as DataFrame
ops (SURVEY.md §3.3): byte identity (J5) + span-level greedy IoU
matching (J3) with don't-care suppression (J4) and two-level P/R/hmean
(A4). Library form of jobs/eval_job.py so tests and notebooks reuse it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from toyocr_spark.operators.evalagg import global_pr_hmean
from toyocr_spark.operators.rangejoin import greedy_iou_match, overlap_anti_join
from toyocr_spark.pipeline import identity_report


def span_pr_report(
    result: DataFrame,
    expected_spans: DataFrame,
    iou_threshold: float = 0.5,
) -> dict:
    """Engine spans vs the expected_spans sidecar → global P/R/hmean.

    ignore=1 ground truth is excluded from recall AND suppresses any
    detection covering it by >0.5 area-precision (the ICDAR don't-care
    rule, evaluation/scripts.py:232-241).
    """
    gt_care = expected_spans.filter(F.col("ignore") == 0).select(
        "url", F.col("block_id").cast("long").alias("gt_idx"), "start", "end"
    )
    dontcare = expected_spans.filter(F.col("ignore") == 1).select("url", "start", "end")
    det = result.select("url", F.posexplode("spans").alias("det_idx", "s")).select(
        "url", "det_idx", F.col("s.start").alias("start"), F.col("s.end").alias("end")
    )
    det_care = overlap_anti_join(det, dontcare, ["url"])
    matches = greedy_iou_match(gt_care, det_care, ["url"], iou_threshold=iou_threshold)
    per_url = (
        gt_care.select("url").distinct()
        .join(matches.groupBy("url").count().withColumnRenamed("count", "m"), "url", "left")
        .join(gt_care.groupBy("url").count().withColumnRenamed("count", "g"), "url", "left")
        .join(det_care.groupBy("url").count().withColumnRenamed("count", "d"), "url", "left")
        .select(
            "url",
            F.coalesce("m", F.lit(0)).alias("matched_sum"),
            F.coalesce("g", F.lit(0)).alias("num_gt_care"),
            F.coalesce("d", F.lit(0)).alias("num_det_care"),
        )
    )
    g = global_pr_hmean(per_url).collect()[0]
    return {
        "span_precision": round(g["precision"], 6),
        "span_recall": round(g["recall"], 6),
        "span_hmean": round(g["hmean"], 6),
        "matched": g["matched_sum"],
        "num_gt_care": g["num_gt_care"],
        "num_det_care": g["num_det_care"],
        "iou_threshold": iou_threshold,
    }


def evaluate_extraction(
    result: DataFrame,
    pages: DataFrame,
    expected_spans: DataFrame | None = None,
    iou_threshold: float = 0.5,
) -> dict:
    """Full eval report: byte identity always; span P/R when a sidecar
    is supplied."""
    idt = identity_report(result, pages).collect()[0]
    report = {
        "metric": "extraction eval (byte identity + span P/R/hmean)",
        "n_urls": idt["n_urls"],
        "n_identical": idt["n_identical"],
        "pass_rate": round(idt["pass_rate"], 6),
    }
    if expected_spans is not None:
        report.update(span_pr_report(result, expected_spans, iou_threshold))
    return report
