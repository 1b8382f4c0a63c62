"""Corpus-prep driver: the funnel must run end to end from both entry
points (documents table, raw pages) and the output must be
dedup-consistent."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args):
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "prep_job.py"), *args],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


@pytest.mark.slow
def test_prep_funnel_from_documents(tmp_path, sf_dir):
    out_dir = str(tmp_path / "prep")
    funnel = _run(
        "--documents", f"{sf_dir}/documents.parquet",
        "--output", out_dir, "--min-punct", "0", "--para-words", "12",
    )
    assert funnel["input"] >= funnel["after_quality"] >= funnel["after_exact_dedup"] >= funnel["after_near_dedup"] > 0
    assert 0 < funnel["after_para_dedup"] <= funnel["after_near_dedup"]
    assert funnel["tokens_total"] > 0
    import duckdb

    n = duckdb.sql(f"select count(*), count(distinct text) from '{out_dir}/*.parquet'").fetchone()
    assert n[0] == funnel["after_near_dedup"]
    assert n[0] == n[1]  # no exact dups survive


@pytest.mark.slow
def test_prep_funnel_from_pages(tmp_path, pages_dir):
    out_dir = str(tmp_path / "prep_pages")
    funnel = _run("--pages", pages_dir, "--output", out_dir, "--min-punct", "1")
    # fixture articles have sentence punctuation; most survive quality
    assert funnel["after_near_dedup"] > 0
    assert funnel["after_quality"] < funnel["input"]  # pathological pages drop
