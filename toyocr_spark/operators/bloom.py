"""Distributed Bloom filter from DataFrame primitives — the
approximate seen-set for incremental crawls.

PySpark exposes no bloom aggregate (``bloom_filter_agg`` is an internal
runtime-filter expression, not a public function), so the filter is
built from first principles as a dataflow:

  build:  key -> (h1, h2) via md5 halves -> k Kirsch-Mitzenmacher
          probe positions (h1 + i*h2 mod m) -> 32-bit words
          (word = pos // 32) OR-folded with bit_or — a
          partially-aggregated groupBy producing m/32 rows of
          (word, bits). No driver collect, no Python.
  probe:  the same k positions per candidate key, joined (broadcast —
          the words table IS the bloom, m/32 rows) against the words,
          a key is "maybe seen" iff every probe hits a set bit.

Contract: NO false negatives (a key that was built in always probes
maybe_seen = true); false positives at the standard (1 - e^{-kn/m})^k
rate. Exactness is restored by the caller: the bloom only PRE-FILTERS
an exact anti-join down to the maybe-seen minority (delta_pages), the
classic runtime-filter pattern.

Portability: hashes are md5 halves (h1 = nibbles 1-10, h2 = nibbles
11-20, each < 2^40), so an external ANSI-SQL engine reproduces every
bit — the bloom itself is oracle-checkable (q52). 32-bit words keep
every mask positive in 64-bit integer engines (no sign-bit trap at
either end).

Scale: m rides the key count (m ~ 10 n bits for ~1% FP at k = 5). The
words table is m/32 rows ~ n/3 — broadcast-able far beyond where the
equivalent url-list broadcast would die, because it is bits, not
strings. For blooms past broadcast size the probe join degrades to a
shuffle join on word — still sub-linear in page bytes because only
(key, word, mask) rows move, never html.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _h1h2(key: Column) -> tuple[Column, Column]:
    h = F.md5(key)
    h1 = F.conv(F.substring(h, 1, 10), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 11, 10), 16, 10).cast("long")
    return h1, h2


def _positions(key: Column, m_bits: int, k: int) -> Column:
    """Array of the k probe bit-positions for a key."""
    h1, h2 = _h1h2(key)
    return F.transform(
        F.sequence(F.lit(0).cast("long"), F.lit(k - 1).cast("long")),
        lambda i: (h1 + i * h2) % m_bits,
    )


def bloom_build(
    df: DataFrame, key: Column, m_bits: int = 1 << 20, k: int = 5
) -> DataFrame:
    """(word, bits) rows: the OR-folded 32-bit words of the bloom over
    every key in df. One explode (k rows/key) + one partial-agg shuffle
    keyed on word — O(1) aggregate state per word regardless of n."""
    pos = F.explode(_positions(key, m_bits, k)).alias("pos")
    return (
        df.select(pos)
        .select(
            (F.col("pos") / 32).cast("long").alias("word"),
            (F.col("pos") % 32).cast("int").alias("bit"),
        )
        .select("word", F.expr("shiftleft(CAST(1 AS BIGINT), bit)").alias("mask"))
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def with_bloom_verdict(
    df: DataFrame,
    key: Column,
    bloom: DataFrame,
    m_bits: int = 1 << 20,
    k: int = 5,
    out_col: str = "maybe_seen",
) -> DataFrame:
    """df + boolean ``out_col``, computed entirely MAP-SIDE: the words
    table folds to a one-row (word -> bits) map, crossJoin(broadcast)
    pins it to every task, and the k probes are an AND-chain of
    element_at + mask expressions — no explode, no groupBy, no shuffle
    of df's (possibly very wide) rows. This is the probe to use in
    front of page-scale inputs (delta_pages): the html column never
    leaves its input partition.

    The map is one driver-assembled row of m/32 entries — the standard
    bloom broadcast cost (~6 bytes/key at k=5/1% FP). Past broadcast
    size, use bloom_maybe_seen (join-based) instead."""
    bm = F.broadcast(
        bloom.groupBy().agg(
            F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("_bloom")
        )
    )
    out = df.crossJoin(bm).withColumn("_pos", _positions(key, m_bits, k))
    cond = None
    for i in range(1, k + 1):
        p = F.element_at("_pos", i)
        word = (p / 32).cast("long")
        mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(element_at(_pos, {i}) % 32 AS INT))")
        hit = F.coalesce(F.element_at("_bloom", word), F.lit(0)).bitwiseAND(mask) != 0
        cond = hit if cond is None else cond & hit
    return out.withColumn(out_col, cond).drop("_bloom", "_pos")


def bloom_maybe_seen(
    df: DataFrame,
    id_col: str,
    key: Column,
    bloom: DataFrame,
    m_bits: int = 1 << 20,
    k: int = 5,
    out_col: str = "maybe_seen",
) -> DataFrame:
    """df + a boolean ``out_col``: true iff every one of the key's k
    probe positions is set in the bloom. Probe rows are (id, word,
    mask) — k per input row; the join side is the broadcast words
    table; the verdict folds back with bool_and (one shuffle on id)."""
    probes = (
        df.select(F.col(id_col).alias("_bid"), F.explode(_positions(key, m_bits, k)).alias("pos"))
        .select(
            "_bid",
            (F.col("pos") / 32).cast("long").alias("word"),
            (F.col("pos") % 32).cast("int").alias("bit"),
        )
        .select("_bid", "word", F.expr("shiftleft(CAST(1 AS BIGINT), bit)").alias("mask"))
    )
    hit = (
        probes.join(F.broadcast(bloom), "word", "left")
        .select(
            "_bid",
            (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask")) != 0).alias("_hit"),
        )
        .groupBy("_bid")
        .agg(F.bool_and("_hit").alias(out_col))
    )
    return df.join(hit, F.col(id_col) == F.col("_bid")).drop("_bid")
