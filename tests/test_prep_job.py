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


@pytest.mark.slow
def test_prep_blocklist_and_decontam_stages(tmp_path, pages_dir, sf_dir):
    import duckdb

    # blocklist stage (pages mode): fixture hosts are host-K.example
    # (K >= 1, Pareto-skewed: host-1 is the hot host); blocking the
    # suffix 'host-1.example' must drop rows, none else
    bl = tmp_path / "blocked.txt"
    bl.write_text("host-1.example\n")
    out_dir = str(tmp_path / "prep_bl")
    funnel = _run(
        "--pages", pages_dir, "--output", out_dir,
        "--min-punct", "1", "--blocklist", str(bl),
    )
    assert 0 < funnel["after_blocklist"] < funnel["after_url_dedup"]

    # decontamination stage (documents mode): benchmark = 3 corpus docs
    # verbatim -> those docs are fully contaminated and must drop
    bench = str(tmp_path / "bench.parquet")
    duckdb.sql(
        f"COPY (SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        f"ORDER BY doc_id LIMIT 3) TO '{bench}' (FORMAT PARQUET)"
    )
    out2 = str(tmp_path / "prep_dc")
    funnel2 = _run(
        "--documents", f"{sf_dir}/documents.parquet",
        "--output", out2, "--min-punct", "0",
        "--decontam-benchmark", bench, "--decontam-max", "0.5",
    )
    assert funnel2["after_decontam"] < funnel2["after_near_dedup"]
    survivors = duckdb.sql(
        f"SELECT count(*) FROM '{out2}/*.parquet' WHERE doc_id IN "
        f"(SELECT doc_id FROM '{bench}')"
    ).fetchone()[0]
    assert survivors == 0


@pytest.mark.slow
def test_prep_dsir_stage(tmp_path, sf_dir):
    """--dsir-target + --dsir-keep: the final corpus is exactly the K
    importance-resampled survivors, deterministically (two runs pick
    the identical set)."""
    import duckdb

    seed_dir = str(tmp_path / "seed")
    # target-domain seed corpus: the en-language slice of the table
    duckdb.sql(
        f"COPY (SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        f"WHERE lang = 'en' AND doc_id % 7 = 0) TO '{seed_dir}' (FORMAT PARQUET, PER_THREAD_OUTPUT FALSE)"
    )
    outs = []
    for tag in ("a", "b"):
        out_dir = str(tmp_path / f"prep_{tag}")
        funnel = _run(
            "--documents", f"{sf_dir}/documents.parquet",
            "--output", out_dir, "--min-punct", "0",
            "--dsir-target", seed_dir, "--dsir-keep", "25",
        )
        assert funnel["after_dsir"] == 25
        ids = duckdb.sql(
            f"select doc_id from '{out_dir}/*.parquet' order by doc_id"
        ).fetchall()
        outs.append(ids)
    assert outs[0] == outs[1] and len(outs[0]) == 25


@pytest.mark.slow
def test_prep_semdedup_stage(tmp_path, sf_dir):
    """--semdedup-embeddings drops embedding-space near-dups: the funnel
    gains an after_semdedup count strictly between 0 and the prior
    stage, and it is deterministic across runs."""
    counts = []
    for tag in ("a", "b"):
        out_dir = str(tmp_path / f"prep_{tag}")
        funnel = _run(
            "--documents", f"{sf_dir}/documents.parquet",
            "--output", out_dir, "--min-punct", "0",
            "--semdedup-embeddings", f"{sf_dir}/embeddings.parquet",
            "--semdedup-threshold", "0.40",
        )
        assert 0 < funnel["after_semdedup"] <= funnel["after_near_dedup"]
        counts.append(funnel["after_semdedup"])
    assert counts[0] == counts[1]


@pytest.mark.slow
def test_prep_c4_and_pii_stages(tmp_path, pages_dir):
    """--c4-rules filters after the surface-quality stage (extracted
    fixture articles end in sentence punctuation, so the split is the
    word-count floor, not total attrition); --pii-redact masks
    injected PII in the surviving text without dropping rows."""
    import duckdb

    out_dir = str(tmp_path / "prep_c4")
    funnel = _run(
        "--pages", pages_dir, "--output", out_dir,
        "--min-punct", "1", "--c4-rules",
    )
    assert 0 < funnel["after_c4"] <= funnel["after_quality"]

    # PII stage: documents mode over a crafted corpus with known PII
    docs_dir = str(tmp_path / "docs_pii")
    # per-doc vocabulary is disjoint (wordN-K tokens) so the near-dup
    # stage cannot collapse the fixture; half the docs carry an email
    duckdb.sql(
        "COPY (SELECT CAST(i AS BIGINT) AS doc_id, "
        "concat(repeat(concat('word', i, '-', i * 7 + 3, ' '), 25), "
        "'tail', CASE WHEN i % 2 = 0 THEN concat(' mail u', i, '@ex.org') "
        "ELSE '' END) AS text FROM range(20) t(i)) "
        f"TO '{docs_dir}' (FORMAT PARQUET, PER_THREAD_OUTPUT FALSE)"
    )
    out2 = str(tmp_path / "prep_pii")
    funnel2 = _run(
        "--documents", docs_dir, "--output", out2,
        "--min-punct", "0", "--pii-redact",
    )
    assert funnel2["pii_docs_redacted"] == 10
    n, masked, leaked = duckdb.sql(
        f"SELECT count(*), sum(CASE WHEN contains(text, '<EMAIL>') THEN 1 ELSE 0 END), "
        f"sum(CASE WHEN contains(text, '@') THEN 1 ELSE 0 END) FROM '{out2}/*.parquet'"
    ).fetchone()
    assert n == funnel2["after_near_dedup"] == 20  # transform-only, no drops
    assert masked == 10 and leaked == 0


@pytest.mark.slow
def test_prep_partitioned_output(tmp_path, sf_dir):
    """--partition-by writes a Hive-partitioned corpus with a bounded
    file count: every row lands under its lang_pred=... directory, no
    directory exceeds --files-per-partition parquet files, and the
    total row count matches the unpartitioned funnel."""
    import glob

    import duckdb

    out_dir = str(tmp_path / "prep_part")
    funnel = _run(
        "--documents", f"{sf_dir}/documents.parquet",
        "--output", out_dir, "--min-punct", "0",
        "--partition-by", "lang_pred", "--files-per-partition", "2",
    )
    dirs = sorted(glob.glob(f"{out_dir}/lang_pred=*"))
    assert len(dirs) >= 2  # the synthetic corpus is multilingual
    for d in dirs:
        assert len(glob.glob(f"{d}/*.parquet")) <= 2
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{out_dir}/lang_pred=*/*.parquet')"
    ).fetchone()[0]
    assert n == funnel["after_near_dedup"]


@pytest.mark.slow
def test_prep_bpe_stage(tmp_path, sf_dir):
    out_dir = str(tmp_path / "prep_bpe")
    artifact = str(tmp_path / "merges.txt")
    funnel = _run(
        "--documents", f"{sf_dir}/documents.parquet",
        "--output", out_dir, "--min-punct", "0",
        "--bpe-merges", "6", "--bpe-artifact", artifact,
    )
    assert funnel["bpe_merges"] == 6
    # BPE merges can only SHRINK the per-word token count vs chars, and
    # the curated corpus is non-trivial, so accounting must be positive
    assert 0 < funnel["bpe_tokens_total"]
    with open(artifact) as f:
        lines = f.read().splitlines()
    assert lines[0] == "#version: 0.2"
    assert len(lines) == 7 and all(len(ln.split(" ")) == 2 for ln in lines[1:])


@pytest.mark.slow
def test_prep_phrase_blocklist_stage(tmp_path, sf_dir):
    bl = tmp_path / "phrases.txt"
    bl.write_text("sort merge\nbatch batch batch\n")
    out_dir = str(tmp_path / "prep_pb")
    funnel = _run(
        "--documents", f"{sf_dir}/documents.parquet",
        "--output", out_dir, "--min-punct", "0",
        "--phrase-blocklist", str(bl),
    )
    assert 0 < funnel["after_phrase_blocklist"] < funnel["after_quality"]


@pytest.mark.slow
def test_prep_simhash_neardup_stage(tmp_path, sf_dir):
    """--simhash-hamming: the admission stage runs between near-dedup
    and paragraph dedup, can only shrink the funnel, and the survivor
    set matches the operator applied directly to the same slice."""
    out_dir = str(tmp_path / "prep_simhash")
    funnel = _run(
        "--documents", f"{sf_dir}/documents.parquet",
        "--output", out_dir, "--min-punct", "0",
        "--simhash-hamming", "3",
    )
    assert "after_simhash_neardup" in funnel
    assert 0 < funnel["after_simhash_neardup"] <= funnel["after_near_dedup"]
    import duckdb

    n = duckdb.sql(f"select count(*) from '{out_dir}/*.parquet'").fetchone()
    assert n[0] == funnel["after_simhash_neardup"]


@pytest.mark.slow
def test_media_job_neardup_and_metadata(tmp_path, sf_dir):
    """media_job: the dHash admission drops every planted duplicate
    (each doc_id % 40 family keeps exactly its smallest id) and the
    survivor parquet + funnel agree."""
    import subprocess
    import sys

    out_dir = str(tmp_path / "media_out")
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "media_job.py"),
            "--synth-from", f"{sf_dir}/documents.parquet",
            "--output", out_dir,
        ],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    funnel = json.loads(
        [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert funnel["input"] == 160
    # 40 families of 4 (brightness shifts / corner perturbation):
    # exactly the 40 smallest ids survive
    assert funnel["after_neardup"] == 40
    import duckdb

    ids = [
        r[0]
        for r in duckdb.sql(
            f"select media_id from '{out_dir}/media/*.parquet' order by 1"
        ).fetchall()
    ]
    assert ids == list(range(40))
    # synth PNGs carry no tEXt chunks: harvest runs, finds nothing
    assert funnel["metadata_rows"] == 0
