"""Extractor strategy registry: dispatch, determinism, and the frozen
default staying byte-identical to extract()."""

from __future__ import annotations

import pytest

from toyocr_spark.extractor import EXTRACTOR_REGISTRY, extract, extract_with
from toyocr_spark.fixtures.genpages import gen_pages
from toyocr_spark.pipeline import extract_pages
from toyocr_spark.sources.pages import read_pages


def test_registry_contents():
    assert {"density", "all-text", "title-only"} <= set(EXTRACTOR_REGISTRY)


def test_unknown_strategy_raises():
    with pytest.raises(KeyError, match="registered"):
        extract_with(b"<p>x</p>", "no-such-strategy")


def test_density_dispatch_is_byte_identical():
    for p in gen_pages(120, seed=5):
        a, b = extract(p.html), extract_with(p.html, "density")
        assert (a.text, a.spans) == (b.text, b.spans)


def test_alternate_strategies_deterministic_and_ordered():
    pages = gen_pages(60, seed=6)
    for p in pages:
        r1 = extract_with(p.html, "all-text")
        r2 = extract_with(p.html, "all-text")
        assert (r1.text, r1.spans) == (r2.text, r2.spans)
        t = extract_with(p.html, "title-only")
        # titles-only output is a subset of all-text lines, order kept
        if t.text:
            lines_all = extract_with(p.html, "all-text").text.split("\n")
            lines_t = t.text.split("\n")
            it = iter(lines_all)
            assert all(line in it for line in lines_t)


def test_pipeline_strategy_plumbs_through(spark, pages_dir):
    pages = read_pages(spark, pages_dir)
    dens = extract_pages(pages).selectExpr("sum(n_kept)").collect()[0][0]
    allt = extract_pages(pages, strategy="all-text").selectExpr("sum(n_kept)").collect()[0][0]
    tit = extract_pages(pages, strategy="title-only").selectExpr("sum(n_kept)").collect()[0][0]
    assert allt >= dens >= tit
