"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship extraction over pages synthesized from the
               sf0.001 documents table (read → salted repartition →
               mapInPandas(extract) → results).
queries()    — one named query per implemented operator from
               SURVEY.md §2 + the training-data-pipeline suite
               (dedup/similarity/text-analysis/multimodal/samplers);
               see toyocr_spark/queries.py for the specs and
               SURVEY.md §8 for the operator -> query coverage map.
oracle_sql() — DuckDB-equivalent ANSI SQL per query (portable hashes
               and string ops only; identical aliases and rounding).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from toyocr_spark import queries as _q

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize a pages table from sf0.001 documents, run
    the full extraction pipeline (salted repartition + mapInPandas
    kernel), return (url, extracted_text, spans, ...)."""
    from pyspark.sql import functions as F

    from toyocr_spark.pipeline import run_extraction

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    nav = (
        '<nav><ul><li><a href="/a">one link</a></li>'
        '<li><a href="/b">two link</a></li></ul></nav>'
    )
    pages = d.select(
        F.concat(
            F.lit("https://doc-"), F.col("doc_id").cast("string"), F.lit(".example/p")
        ).alias("url"),
        F.encode(
            F.concat(
                F.lit(f"<html><body>{nav}<article><h2>Document Title Here</h2><p>"),
                F.col("text"),
                F.lit("</p></article></body></html>"),
            ),
            "UTF-8",
        ).alias("html"),
    )
    return run_extraction(pages, num_partitions=8)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
