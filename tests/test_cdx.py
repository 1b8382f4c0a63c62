"""CDX capture-index sink: sorted non-overlapping shards, an exact
cluster.idx, block-pruned lookups that match the full scan, and the
one-Exchange plan contract."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from toyocr_spark.sources import read_pages
from toyocr_spark.sources.cdx import (
    CLUSTER_IDX,
    INDEX_DIR,
    _prune,
    cdx_lookup,
    cdx_rows,
    write_cdx,
)


@pytest.fixture(scope="module")
def cdx_dir(spark, pages_dir, tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("cdx"))
    pages = read_pages(spark, pages_dir)
    summary = write_cdx(pages, out, shards=4)
    assert summary["rows"] == pages.count()
    return out


def test_shards_are_sorted_and_non_overlapping(spark, cdx_dir):
    with open(os.path.join(cdx_dir, CLUSTER_IDX)) as f:
        entries = [json.loads(ln) for ln in f if ln.strip()]
    assert 1 <= len(entries) <= 4
    # cluster.idx is sorted by first_key and spans do not overlap
    for a, b in zip(entries, entries[1:]):
        assert a["first_key"] <= a["last_key"]
        assert a["last_key"] <= b["first_key"]
    # every shard file is internally sorted by (surt_key, ts14) and its
    # cluster.idx span is exact
    for e in entries:
        rows = (
            spark.read.parquet(os.path.join(cdx_dir, INDEX_DIR, e["file"]))
            .select("surt_key", "ts14")
            .collect()
        )
        keys = [(r["surt_key"], r["ts14"]) for r in rows]
        assert keys == sorted(keys)
        assert len(keys) == e["n_rows"]
        assert keys[0][0] == e["first_key"] and keys[-1][0] == e["last_key"]


def test_lookup_matches_full_scan_and_prunes(spark, pages_dir, cdx_dir):
    pages = read_pages(spark, pages_dir)
    full = cdx_rows(pages)
    # pick the host of some capture and probe its SURT prefix
    some = full.limit(1).collect()[0]["surt_key"]
    prefix = some.split(")")[0] + ")"

    got = sorted(
        tuple(r) for r in cdx_lookup(spark, cdx_dir, prefix).collect()
    )
    want = sorted(
        tuple(r)
        for r in full.filter(F.col("surt_key").startswith(prefix)).collect()
    )
    assert got == want and len(got) > 0

    # a narrow prefix prunes: strictly fewer shards than the total
    with open(os.path.join(cdx_dir, CLUSTER_IDX)) as f:
        entries = [json.loads(ln) for ln in f if ln.strip()]
    if len(entries) > 1:
        assert len(_prune(entries, prefix)) < len(entries)
    # a miss prefix prunes to zero shards and returns an empty frame
    assert _prune(entries, "zzz,nonexistent)") == []
    assert cdx_lookup(spark, cdx_dir, "zzz,nonexistent)").count() == 0


def test_prune_is_conservative():
    entries = [
        {"file": "a", "first_key": "aa)", "last_key": "cc)"},
        {"file": "b", "first_key": "cc)", "last_key": "ff)"},
        {"file": "c", "first_key": "gg)", "last_key": "zz)"},
    ]
    assert _prune(entries, "bb)") == ["a"]
    assert _prune(entries, "cc)") == ["a", "b"]  # boundary key: both
    assert _prune(entries, "hh)") == ["c"]
    assert _prune(entries, "aa") == ["a"]


def test_row_build_is_map_only_and_sink_adds_one_range_exchange(spark, pages_dir):
    pages = read_pages(spark, pages_dir)
    rows = cdx_rows(pages)
    plan = rows._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only projection
    ranged = rows.repartitionByRange(4, "surt_key", "ts14").sortWithinPartitions(
        "surt_key", "ts14"
    )
    plan2 = ranged._jdf.queryExecution().executedPlan().toString()
    assert plan2.count("Exchange") == 1 and "rangepartitioning" in plan2
