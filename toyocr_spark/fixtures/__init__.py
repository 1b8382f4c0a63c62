from toyocr_spark.fixtures.genpages import gen_pages, write_pages_parquet

__all__ = ["gen_pages", "write_pages_parquet"]
