"""Selection operators: threshold, per-group top-K, local-max
suppression, hardest-K mean — the decode-stage primitives.

Scale notes: all three window operators shuffle once on the partition
key and stream within partitions (rank/row_number are O(1) state);
threshold_filter is a pure predicate that Catalyst pushes into the
parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def threshold_filter(df: DataFrame, score_col: str, threshold: float, strict: bool = True) -> DataFrame:
    """F5 (score > t, /root/reference/evaluation/text_eval.py:78 and
    toydet_decode.py:160). Declarative so it reaches PushedFilters."""
    c = F.col(score_col)
    return df.filter(c > F.lit(threshold) if strict else c >= F.lit(threshold))


def _order_by(order_col: str | list[Column], ascending: bool) -> list[Column]:
    if isinstance(order_col, str):
        c = F.col(order_col)
        return [c.asc() if ascending else c.desc()]
    return list(order_col)


def topk_per_group(df: DataFrame, group_cols: list[str], order_col: str | list[Column], k: int,
                   ascending: bool = False, rank_name: str = "rk") -> DataFrame:
    """D2 two-level top-K (centernet_decode.py:106-128): per-group rank
    by score, keep K. row_number (not rank) for the reference's strict-K
    contract; pass a list of sort Columns for a total (deterministic)
    order when the score alone can tie."""
    w = Window.partitionBy(*group_cols).orderBy(*_order_by(order_col, ascending))
    return (
        df.withColumn(rank_name, F.row_number().over(w))
        .filter(F.col(rank_name) <= k)
    )


def local_max_filter(df: DataFrame, group_cols: list[str], order_col: str | list[Column], score_col: str,
                     window: int = 1) -> DataFrame:
    """D1 pseudo-NMS (centernet_decode.py:93-104): 3x3 max-pool == keep
    rows whose score equals the max over a +-window row frame in
    sequence order — adjacent-peak dedup as a window aggregate."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(*_order_by(order_col, True))
        .rowsBetween(-window, window)
    )
    return (
        df.withColumn("_wmax", F.max(score_col).over(w))
        .filter(F.col(score_col) == F.col("_wmax"))
        .drop("_wmax")
    )


def topk_mean(df: DataFrame, order_col: str | list[Column], k: int, value_col: str | None = None,
              partition_cols: list[str] | None = None) -> DataFrame:
    """A3 hardest-negative mean (mse_loss.py:44-66): mean of the top-K
    rows by order_col. Global windows ordered without a partition key
    funnel through one task — fine for the reference's per-batch use;
    callers at scale pass partition_cols."""
    if value_col is None:
        assert isinstance(order_col, str)
        value_col = order_col
    w = Window.partitionBy(*(partition_cols or [])).orderBy(*_order_by(order_col, False))
    ranked = df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    keys = [F.col(c) for c in (partition_cols or [])]
    return ranked.groupBy(*keys).agg(
        F.avg(value_col).alias("topk_mean"), F.count("*").alias("topk_n")
    )


def skew_safe_topk(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    salt_buckets: int = 16,
    ascending: bool = False,
    rank_name: str = "rk",
    *,
    tiebreak_col: str,
) -> DataFrame:
    """Per-key top-K that survives a hot key (the skew case windows
    cannot partial-aggregate away: a naive ``row_number() over
    (partition by host)`` funnels a hot host's every row through ONE
    reducer). Two phases, the RepeatFactor-sampler inverse of the
    salting trick (/root/reference/data/build.py:283-287, SURVEY.md §4):

      1. rank within (key, salt=pmod(xxhash64(order-row), B)) and keep
         K per bucket — the hot key's rows spread over B reducers, and
         at most K·B survivors per key remain;
      2. rank the survivors within the key alone — now bounded at K·B
         rows per key, so the single-reducer window is O(K·B), not
         O(rows-of-hottest-key).

    Result is row-identical to the naive single-window top-K when the
    total order is unambiguous — tiebreak_col provides that total order
    AND seeds the salt, so it is REQUIRED and must be a row-level
    column (e.g. a record id). A column that is constant within a group
    (any group key) would put every row of a hot key into one salt
    bucket, silently degenerating phase 1 back into the single-reducer
    window this function exists to avoid.
    """
    if tiebreak_col is None:
        raise ValueError(
            "skew_safe_topk requires tiebreak_col: a row-level column "
            "(e.g. a record id) that both breaks ordering ties and "
            "seeds the salt; without it the salt would be constant "
            "per group and phase 1 degenerates to a single reducer"
        )
    if tiebreak_col in group_cols:
        raise ValueError(
            f"tiebreak_col {tiebreak_col!r} is a group key: the salt "
            "xxhash64(tiebreak_col) would be constant within each "
            "group, so a hot key's rows all land in one salt bucket"
        )
    tb = tiebreak_col
    order = [
        (F.col(order_col).asc() if ascending else F.col(order_col).desc()),
        F.col(tb).asc(),
    ]
    salt = F.pmod(F.xxhash64(F.col(tb)), F.lit(salt_buckets))
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(*order)
    phase1 = (
        df.withColumn("_salt", salt)
        .withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= k)
        .drop("_rn1", "_salt")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        phase1.withColumn(rank_name, F.row_number().over(w2))
        .filter(F.col(rank_name) <= k)
    )


def score_compose_greatest(df: DataFrame, cols: list[str], out: str = "score") -> Column:
    """K3 max-composition of score signals (center_head.py:186-192
    ``np.maximum`` splat): greatest(), not sum."""
    return F.greatest(*[F.col(c) for c in cols]).alias(out)
