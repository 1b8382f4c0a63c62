from toyocr_spark.sources.pages import PAGES_SCHEMA, read_pages, register_tables

__all__ = ["PAGES_SCHEMA", "read_pages", "register_tables"]
