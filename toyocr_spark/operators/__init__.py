"""Relational operator library — the decoders/aggregations/joins of the
reference re-expressed as composable DataFrame transforms (SURVEY.md
S2.6-2.9). Every operator is stock Catalyst-optimizable code: windows,
joins, HOFs — no UDFs, no collect loops."""

from toyocr_spark.operators.selection import local_max_filter, threshold_filter, topk_mean, topk_per_group
from toyocr_spark.operators.islands import gap_islands
from toyocr_spark.operators.rangejoin import (
    bucketed_overlap_join,
    greedy_iou_match,
    interval_overlap_join,
    mutual_first_match,
    overlap_anti_join,
)
from toyocr_spark.operators.evalagg import average_precision, global_pr_hmean, pr_hmean
from toyocr_spark.operators.occupancy import occupancy_projection
from toyocr_spark.operators.bitext import align_lengths, gale_church_beads
from toyocr_spark.operators.dedup import (
    banded_neardup_drops,
    char_shingles,
    exact_dedup,
    jaccard_pairs,
    jaccard_for_pairs,
    minhash_lsh_dedup,
    neardup_survivors,
    simhash16,
    survivors,
)
from toyocr_spark.operators.similarity import (
    brute_force_cosine_topk,
    bucketed_cosine_topk,
    embedding_near_dup,
    recall_at_k,
)

__all__ = [
    "threshold_filter",
    "topk_per_group",
    "local_max_filter",
    "topk_mean",
    "gap_islands",
    "interval_overlap_join",
    "overlap_anti_join",
    "mutual_first_match",
    "greedy_iou_match",
    "bucketed_overlap_join",
    "pr_hmean",
    "global_pr_hmean",
    "average_precision",
    "occupancy_projection",
    "char_shingles",
    "exact_dedup",
    "jaccard_pairs",
    "jaccard_for_pairs",
    "minhash_lsh_dedup",
    "simhash16",
    "survivors",
    "brute_force_cosine_topk",
    "bucketed_cosine_topk",
    "embedding_near_dup",
    "recall_at_k",
]
