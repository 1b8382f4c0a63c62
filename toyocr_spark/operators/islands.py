"""Gap-and-island grouping — the DataFrame form of the kernel's
connected-component decode (D7, /root/reference/modeling/decoders/
toydet_decode.py:113-179) and the classic sessionization operator.

One shuffle on the key, two streaming window passes (lag + running
sum), one partial+final aggregate — the canonical scalable shape; no
self-joins, no iteration.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def gap_islands(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    gap: Column | float,
    agg: dict[str, Column] | None = None,
    island_name: str = "island_id",
) -> DataFrame:
    """Group ordered rows per key into islands split where the gap to
    the previous row exceeds ``gap``.

    new_island = (order - lag(order) > gap); island_id = running sum of
    the flag — the 1-D connected-components / ``findContours`` analogue.
    Returns per-island aggregates if ``agg`` given, else rows tagged
    with island_id.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col))
    gap_col = gap if isinstance(gap, Column) else F.lit(gap)
    flagged = df.withColumn(
        "_new",
        F.when(
            (F.col(order_col) - F.lag(order_col).over(w)) > gap_col, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    # first row per key has lag NULL -> when() falls to otherwise(0): island 0
    tagged = flagged.withColumn(
        island_name,
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("_new")
    if agg is None:
        return tagged
    return tagged.groupBy(*key_cols, island_name).agg(
        *[c.alias(n) for n, c in agg.items()]
    )
