"""Cross-run delta extraction: a recrawl re-extracts exactly the pages
whose bytes changed plus the new urls — the unchanged majority is
skipped before any Python runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from toyocr_spark.pipeline import delta_pages, extract_pages, read_result, resumable_run
from toyocr_spark.sources.pages import read_pages


def test_delta_selects_only_changed_and_new(spark, pages_dir, tmp_path):
    pages = read_pages(spark, pages_dir)
    out1 = str(tmp_path / "run1")
    resumable_run(spark, pages, out1, n_chunks=2)
    prev = read_result(spark, out1)

    # recrawl: 10 urls get new bytes, 5 urls are brand new, rest unchanged
    changed = (
        pages.orderBy("url").limit(10)
        .withColumn("html", F.concat(F.col("html"), F.lit(b"<p>recrawl edit</p>")))
    )
    new = (
        pages.orderBy(F.desc("url")).limit(5)
        .withColumn("url", F.concat(F.col("url"), F.lit("?v=2")))
    )
    unchanged = pages.join(changed.select("url"), "url", "left_anti")
    recrawl = unchanged.unionByName(changed).unionByName(new)

    todo = delta_pages(recrawl, prev)
    urls = {r["url"] for r in todo.select("url").collect()}
    want = {r["url"] for r in changed.select("url").collect()} | {
        r["url"] for r in new.select("url").collect()
    }
    assert urls == want

    # and the delta path extracts correctly (kernel unchanged)
    got = extract_pages(todo)
    assert got.count() == 15
    # no-op recrawl: empty delta
    assert delta_pages(pages, prev).count() == 0


def test_delta_bloom_prefilter_is_exact(spark, pages_dir, tmp_path):
    """The bloom fast path must select EXACTLY the same url set as the
    plain anti-join — at a generous m (no FPs likely) and at a
    deliberately saturated m (every page forced through the exact
    anti-join), since false positives only move work, never results."""
    pages = read_pages(spark, pages_dir)
    out1 = str(tmp_path / "run1")
    resumable_run(spark, pages, out1, n_chunks=2)
    prev = read_result(spark, out1)

    changed = (
        pages.orderBy("url").limit(7)
        .withColumn("html", F.concat(F.col("html"), F.lit(b"<p>v2</p>")))
    )
    unchanged = pages.join(changed.select("url"), "url", "left_anti")
    recrawl = unchanged.unionByName(changed)

    want = {r["url"] for r in delta_pages(recrawl, prev).select("url").collect()}
    for m_bits in (1 << 16, 64):  # roomy and saturated
        got = {
            r["url"]
            for r in delta_pages(recrawl, prev, bloom_m_bits=m_bits).select("url").collect()
        }
        assert got == want, f"bloom delta diverged at m_bits={m_bits}"
