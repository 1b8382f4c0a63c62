"""Explicit partitioning & skew handling (north_rule requirement).

The graft of the reference's sampler layer: ``InferenceSampler``
range-splits the corpus across workers and
``RepeatFactorTrainingSampler`` re-weights skewed classes
(/root/reference/data/build.py:277-332). In a web crawl the skew axis
is the host: a handful of hosts own a large fraction of all urls
(Zipf), so any host-keyed shuffle (per-host aggs, host-bucketed
storage) hot-spots a few reducers. The fix is classic salting: detect
hot keys with a cheap pre-agg, then split each hot key across
``salt_buckets`` sub-keys.

For the extraction map itself the partition key is ``hash(url)`` —
already uniform — so salting matters for the host-keyed paths; both are
provided here and both are exercised by tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_HOT_THRESHOLD_FRACTION = 0.01  # a host with >1% of rows is "hot"


def with_host(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Derive the host from the url JVM-side (no UDF)."""
    return df.withColumn("host", F.parse_url(F.col(url_col), F.lit("HOST")))


def hot_hosts(df: DataFrame, threshold_fraction: float = DEFAULT_HOT_THRESHOLD_FRACTION) -> list[str]:
    """Cheap pre-agg over the host column -> list of hot hosts.

    At 100 TB this is a single partial+final count per host — a few MB
    of driver state for any real crawl (host cardinality ~ 10^8 but the
    hot set above 1% is tiny by construction: at most 100 entries).
    """
    hosts = with_host(df).groupBy("host").count()
    total = df.count()
    cutoff = max(1, int(total * threshold_fraction))
    rows = hosts.filter(F.col("count") >= cutoff).select("host").collect()
    return sorted(r["host"] for r in rows if r["host"] is not None)


def size_bucketed_repartition(
    df: DataFrame,
    num_partitions: int,
    size_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """W7 aspect-ratio-grouping graft (/root/reference/data/build.py:
    222-231): co-locate similarly-sized pages so Arrow batches inside
    the UDF are balanced — a batch of uniformly-huge pages and a batch
    of tiny ones each stay within memory/latency envelopes instead of
    mixing (the padding-waste argument, here a batch-skew argument).

    size_class = floor(log2(byte length)); RANGE-partitioned on
    (size_class, hash(url)): classes are contiguous across the partition
    sequence (each task sees one or two classes), while hash(url)
    spreads rows evenly within a class.
    """
    size_class = F.floor(F.log2(F.greatest(F.octet_length(F.col(size_col)), F.lit(1))))
    out = df.withColumn("_size_class", size_class)
    out = out.repartitionByRange(
        num_partitions, F.col("_size_class"), F.xxhash64(F.col(url_col))
    )
    return out.drop("_size_class")


def salted_repartition(
    df: DataFrame,
    num_partitions: int,
    hot: list[str] | None = None,
    salt_buckets: int = 16,
    url_col: str = "url",
) -> DataFrame:
    """Repartition for the extraction map: hash(url) for cold hosts,
    hash(url) spread over ``salt_buckets`` sub-keys for hot hosts.

    The salt column is derived, used as the shuffle key, and dropped —
    downstream operators never see it. xxhash64 is a JVM-side 64-bit
    hash (stable across Spark versions, unlike ``hash``'s murmur3-32
    seed behavior across platforms).
    """
    out = with_host(df, url_col)
    hot = hot if hot is not None else []
    salt = F.when(
        F.col("host").isin(hot),
        F.pmod(F.xxhash64(F.col(url_col)), F.lit(salt_buckets)),
    ).otherwise(F.lit(0))
    out = out.withColumn("_salt", salt)
    out = out.repartition(num_partitions, F.col("host"), F.col("_salt"), F.xxhash64(F.col(url_col)))
    return out.drop("_salt", "host")


def write_partitioned_corpus(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
    id_col: str = "doc_id",
) -> None:
    """Hive-partitioned corpus sink with a bounded file count — the
    standard output shape for a curated training corpus (one directory
    per language / quality bucket, readable with partition pruning).

    The naive ``df.write.partitionBy(cols)`` writes up to
    tasks x |values| files: every shuffle task that holds at least one
    row of a value opens a file in that value's directory — at crawl
    scale that is millions of KB-sized files and a dead object store.
    The scale shape repartitions on (partition_cols, salt) FIRST, so
    each (value, salt) slice lands wholly in one task and each
    partition directory gets at most ``files_per_partition`` files,
    regardless of cluster width. One extra shuffle, bounded output."""
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(files_per_partition))
    cols = [F.col(c) for c in partition_cols]
    (
        df.repartition(*cols, salt)
        .write.partitionBy(*partition_cols)
        .mode("overwrite")
        .parquet(path)
    )
