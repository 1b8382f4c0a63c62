"""Sources: schema-enforced readers + catalog registration.

The graft of the reference's dataset loaders + lazy registry
(/root/reference/data/dataset/coco_text.py:14-88,
/root/reference/data/dataset/builting.py:7-52): a source is a named
table with a declared schema; registration attaches it to the session
catalog. At cluster scale the catalog is Iceberg (partition pruning on
``warc_ts``/crawl-id, snapshot reads); the sandbox image has no Iceberg
jars, so the Iceberg path is gated behind a capability check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the authoritative input shape (BASELINE.json input_hint)
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg catalog is on the classpath (not in this
    sandbox image — the production read path, kept behind this gate)."""
    try:
        spark._jvm.org.apache.iceberg.Schema  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def read_pages(spark: SparkSession, path_or_table: str) -> DataFrame:
    """Read the pages table from an Iceberg table name or a parquet path.

    Normalization mirrors the loader's inline invariants
    (coco_text.py:56-68: drop degenerate records, clip to bounds):
    null-url rows are invalid, null html becomes empty bytes so the
    kernel sees a total function.
    """
    if iceberg_available(spark) and "/" not in path_or_table:
        df = spark.read.table(path_or_table)
    else:
        import os

        p = path_or_table
        # a fixture dir holds sidecars (expected_spans) next to the pages
        # table — point the scan at the pages file only
        if os.path.isdir(p) and os.path.exists(os.path.join(p, "pages.parquet")):
            p = os.path.join(p, "pages.parquet")
        df = spark.read.schema(PAGES_SCHEMA).parquet(p)
    return df.filter(F.col("url").isNotNull()).withColumn(
        "html", F.coalesce(F.col("html"), F.lit(b""))
    )


def read_pages_jsonl(spark: SparkSession, path_or_glob: str) -> DataFrame:
    """Pages from JSON-lines interchange: one object per line with
    ``url``, ``warc_ts`` (ISO-8601), ``html_b64`` (base64 of the raw
    bytes — JSON cannot carry binary), optional ``text``/``lang``.
    Explicit schema (never inferSchema at crawl scale: inference is a
    full extra pass) + JVM-side unbase64."""
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.StringType(), True),
            T.StructField("html_b64", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )
    raw = spark.read.schema(schema).json(path_or_glob)
    return (
        raw.filter(F.col("url").isNotNull())
        .select(
            "url",
            F.to_timestamp("warc_ts").alias("warc_ts"),
            F.coalesce(F.unbase64("html_b64"), F.lit(b"")).alias("html"),
            "text",
            "lang",
        )
    )


def register_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None) -> None:
    """Register the driver-provided relational tables as temp views
    (the DatasetCatalog analogue, builting.py:19-21)."""
    names = names or (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    )
    for n in names:
        spark.read.parquet(f"{sf_dir}/{n}.parquet").createOrReplaceTempView(n)
