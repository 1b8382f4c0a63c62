"""End-to-end deploy contract: the job must run under spark-submit with
--py-files (no repo on PYTHONPATH), resume idempotently, and extract
byte-identical text — the north_rule ship-shape check."""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest

from toyocr_spark.fixtures import write_pages_parquet
from tools.make_pyfiles import build

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _submit(zip_path, job, *args):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[4]",
            "--conf",
            "spark.ui.enabled=false",
            "--conf",
            "spark.sql.shuffle.partitions=8",
            "--py-files",
            zip_path,
            job,
            *args,
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd="/tmp",  # make sure the repo dir itself is not importable
    )
    assert out.returncode == 0, out.stderr[-4000:]
    payload = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert payload, out.stdout[-2000:]
    return json.loads(payload[-1])


@pytest.mark.slow
def test_spark_submit_pyfiles_roundtrip(tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    write_pages_parquet(pages_dir, n=80, seed=2024)
    zip_path = build(str(tmp_path / "toyocr_spark.zip"))
    job = os.path.join(os.path.dirname(__file__), "..", "jobs", "extract_job.py")

    s1 = _submit(zip_path, job, "--input", pages_dir, "--output", out_dir, "--n-chunks", "4")
    assert sorted(s1["executed"]) == [0, 1, 2, 3]
    assert s1["rows_extracted"] == 80

    # rerun: commit log short-circuits every chunk
    s2 = _submit(zip_path, job, "--input", pages_dir, "--output", out_dir, "--n-chunks", "4")
    assert s2["executed"] == [] and sorted(s2["skipped"]) == [0, 1, 2, 3]
    assert s2["rows_extracted"] == 80
