"""Physical-plan contracts — the 100 TB design assertions.

These lock in the properties that make the engine viable at scale:
filters reach the parquet scan, column pruning keeps wide columns out
of shuffles, small dimensions broadcast, and the extraction map adds no
shuffle beyond the one explicit repartition (SURVEY.md §4)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from toyocr_spark import queries as q
from toyocr_spark.pipeline import extract_pages, run_extraction
from toyocr_spark.sources.pages import read_pages


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _scan_columns(plan: str) -> list[set[str]]:
    """Column sets actually read by each FileScan (robust to the plan
    string truncating long lines before ReadSchema)."""
    out = []
    for m in re.finditer(r"FileScan parquet \[([^\]]*)\]", plan):
        out.append({c.split("#")[0] for c in m.group(1).split(",") if c})
    return out


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = q.queries()["q01_scan_agg"](spark, sf_dir)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", _plan(df))
    assert any("l_shipdate" in p for p in pushed), "date filter not pushed to parquet"


def test_scan_prunes_to_projected_columns(spark, sf_dir):
    df = q.queries()["q01_scan_agg"](spark, sf_dir)
    scans = _scan_columns(_plan(df))
    assert scans, _plan(df)
    cols = scans[0]
    assert "l_comment" not in cols, "unprojected wide column read from parquet"
    assert cols <= {
        "l_shipdate", "l_returnflag", "l_linestatus",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    }


def test_extraction_reads_only_url_and_html(spark, pages_dir):
    pages = read_pages(spark, pages_dir)
    df = extract_pages(pages)
    scans = _scan_columns(_plan(df))
    assert scans
    cols = scans[0]
    assert cols == {"url", "html"}, (
        f"extraction scan reads {cols}; the wide oracle `text` column "
        "must never be shipped through the pipeline"
    )


def test_extraction_shuffles_exactly_once(spark, pages_dir):
    # under-parallel input (the tiny fixture scan yields fewer physical
    # partitions than half the requested width): the salted repartition
    # runs, and it is the ONLY Exchange in the plan
    pages = read_pages(spark, pages_dir)
    n_in = pages.rdd.getNumPartitions()
    width = n_in * 2 + 2  # force the under-parallel branch
    plan = _plan(run_extraction(pages, num_partitions=width))
    assert plan.count("Exchange") == 1, plan  # only the explicit repartition


def test_extraction_elides_shuffle_on_balanced_scan(spark, pages_dir):
    # byte-balanced scan already at (>= half) the requested width: the
    # extraction map's cost is proportional to bytes, so the payload
    # shuffle buys nothing and must be elided (guide §2.4) — the
    # 100 TB shape moves the corpus zero times before the kernel
    pages = read_pages(spark, pages_dir)
    n_in = pages.rdd.getNumPartitions()
    plan = _plan(run_extraction(pages, num_partitions=max(1, n_in)))
    assert plan.count("Exchange") == 0, plan
    # rows are identical either way (same kernel, same input)
    shuffled = run_extraction(pages, num_partitions=n_in * 4)
    direct = run_extraction(pages, num_partitions=max(1, n_in))
    assert sorted(r["url"] for r in direct.select("url").collect()) == sorted(
        r["url"] for r in shuffled.select("url").collect()
    )


def test_small_dim_joins_broadcast(spark, sf_dir):
    plan = _plan(q.queries()["q11_region_revenue"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan, (
        "region/nation/supplier chain should broadcast, not sort-merge"
    )


def test_dedup_is_single_shuffle(spark, sf_dir):
    plan = _plan(q.queries()["q13_dedup_exact"](spark, sf_dir))
    assert plan.count("Exchange") == 1, "exact dedup must be one hash shuffle"


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    """Map-side combine: the aggregate must run partial (before the
    exchange) and final (after) — the A4 partial+final shape."""
    df = q.queries()["q01_scan_agg"](spark, sf_dir)
    plan = _plan(df)
    assert len(re.findall(r"HashAggregate", plan)) >= 2, plan


def test_identity_join_prunes_pages_columns(spark, pages_dir):
    from toyocr_spark.pipeline import identity_report

    pages = read_pages(spark, pages_dir)
    result = extract_pages(pages)
    rep = identity_report(result, pages)
    # the pages side of the identity join must scan only (url, text):
    # html (the widest column) stays out of the join entirely
    sides = [s for s in _scan_columns(_plan(rep)) if "text" in s]
    assert sides and all("html" not in s for s in sides)


def test_salted_repartition_splits_hot_host(spark, pages_dir):
    """Skew handling: with salting on, a hot host's rows spread over
    many partitions; without, they collapse onto one reducer."""
    from toyocr_spark.plans.partitioning import hot_hosts, salted_repartition

    pages = read_pages(spark, pages_dir)
    hot = hot_hosts(pages, threshold_fraction=0.05)
    assert hot, "fixture corpus is Zipf-skewed; expected at least one hot host"
    host = hot[0]
    subset = pages.filter(F.col("url").startswith(f"https://{host}/"))
    salted = (
        salted_repartition(subset, 16, hot=hot)
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    unsalted = (
        subset.repartition(16, F.parse_url(F.col("url"), F.lit("HOST")))
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert unsalted == 1
    assert salted > 4, f"hot host only reached {salted} partitions"


def test_size_bucketed_repartition_homogenizes_batches(spark, pages_dir):
    """W7: within a partition, page sizes should cluster into few
    log2 classes; the shuffle still uses every partition."""
    from toyocr_spark.plans.partitioning import size_bucketed_repartition

    pages = read_pages(spark, pages_dir)
    parted = size_bucketed_repartition(pages, 8)
    per = (
        parted.select(
            F.spark_partition_id().alias("p"),
            F.floor(F.log2(F.greatest(F.octet_length("html"), F.lit(1)))).alias("c"),
        )
        .groupBy("p")
        .agg(F.countDistinct("c").alias("classes"), F.count("*").alias("n"))
        .collect()
    )
    total_classes = pages.select(
        F.countDistinct(
            F.floor(F.log2(F.greatest(F.octet_length("html"), F.lit(1))))
        )
    ).collect()[0][0]
    assert total_classes >= 3  # the fixture mixes tiny/normal/huge pages
    # range partitioning: the typical partition is size-homogeneous
    # (1-2 classes); only the boundary partition that absorbs the rare
    # tiny classes may hold more
    counts = sorted(r["classes"] for r in per if r["n"] > 0)
    assert counts[len(counts) // 2] <= 2, counts
    # and rows stay balanced: no partition more than 2x the mean
    ns = [r["n"] for r in per if r["n"] > 0]
    assert max(ns) <= 2 * (sum(ns) / len(ns)), ns


def test_partition_pruning_on_date_partitioned_pages(spark, pages_dir, tmp_path):
    """The Iceberg-partitioning stand-in: pages written hive-partitioned
    by crawl date; a date predicate must prune partitions at planning
    time (PartitionFilters), scanning only the matching directories."""
    out = str(tmp_path / "pages_by_dt")
    hour = F.date_format("warc_ts", "yyyy-MM-dd-HH")
    pages = read_pages(spark, pages_dir).withColumn("dt", hour)
    pages.write.partitionBy("dt").mode("overwrite").parquet(out)

    import os

    parts = sorted(d for d in os.listdir(out) if d.startswith("dt="))
    assert len(parts) >= 2, "fixture spans multiple hours"
    one = parts[0][len("dt=") :]

    df = spark.read.parquet(out).filter(F.col("dt") == one)
    plan = _plan(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "dt" in m.group(1), plan
    # and the pruned read returns exactly that hour's rows
    assert df.count() == pages.filter(hour == one).count()


def test_relational_queries_have_no_python_nodes(spark, sf_dir):
    """The 'UDFs are the slow path' contract: every relational query
    runs entirely JVM-side. Only the extraction/multimodal kernels
    (mapInArrow) and the greedy matcher (applyInPandas, J3's inherently
    sequential per-key loop) may cross into Python."""
    allowed_python = {
        "q25_extract",           # the extraction kernel itself
        "q26_media_decode",      # multimodal decode kernel
        "q27_media_frames",      # multimodal frame kernel
        "q37_greedy_exact",      # used-flags greedy: applyInPandas per key
        "q40_pdf_extract",       # the extraction kernel, PDF dispatch path
        "q76_jpeg_pixels",       # JPEG encode+decode media kernel (mapInArrow)
        "q81_mp4_demux",         # MP4 mux+demux media kernel (mapInArrow)
        "q87_mjpeg_frames",      # MJPEG mux+demux+decode kernel (mapInArrow)
        "q90_mp4_audio",         # PCM-in-MP4 demux+features kernel (mapInArrow)
        "q93_gif_pixels",        # GIF encode+LZW-decode media kernel (mapInArrow)
        "q94_g711_audio",        # G.711 WAV mux+expand+features kernel (mapInArrow)
        "q107_image_dhash",      # PNG encode+unfilter+dHash kernel (mapInArrow)
        "q108_image_neardup",    # dHash kernel feeding the banded pairing
        "q109_audio_fingerprint",  # WAV mux+PCM energy kernel (mapInArrow)
        "q110_audio_neardup",    # audio fingerprint kernel feeding the pairing
        "q111_caption_pairs",    # joins the image_dhash kernel output
        "q112_neardup_admission",  # dHash kernel feeding the admission anti-join
        "q113_media_metadata",   # PNG/JPEG metadata-walk kernel (mapInArrow)
        "q116_sentence_align",   # Gale-Church DP kernel (mapInArrow, per-pair)
        "q119_dhash_recall",     # dHash kernel feeding the recall sweep
        "q120_decode_stats",     # six-format decode kernel (mapInArrow)
        "q121_mp4_timing",       # stts/mdhd timing demux kernel (mapInArrow)
        "q122_pdf_encrypted_extract",  # encrypt-synth + extraction kernel
        "q123_mp3_metadata",     # MP3 mux + frame-walk metadata kernel
        "q125_pdf_aes_extract",  # AES-encrypt-synth + extraction kernel
        "q129_docx_extract",     # OOXML synth + extraction kernel
        "q130_xlsx_extract",     # SpreadsheetML synth + extraction kernel
        "q131_pptx_extract",     # PresentationML synth + extraction kernel
        "q132_ooxml_metadata",   # OPC synth + core-properties harvest kernel
        "q133_epub_extract",     # EPUB synth + extraction kernel
        "q134_rtf_extract",      # RTF synth + extraction kernel
        "q135_outlink_mining",   # five-format synth + binary-leg link kernel
        "q136_gzip_extract",     # gzip-envelope synth + extraction kernel
        "q137_doc_extract",      # CFB/Word-binary synth + extraction kernel
        "q138_mhtml_extract",    # MIME-envelope synth + extraction kernel
        "q139_odt_extract",      # ODF synth + extraction kernel
        "q140_xls_extract",      # BIFF8/CFB synth + extraction kernel
        "q141_ppt_extract",      # PPT-record-tree synth + extraction kernel
        "q142_ods_extract",      # ODS/ODF synth + extraction kernel
        "q143_odp_extract",      # ODP/ODF synth + extraction kernel
        "q144_bz2_xz_extract",   # bz2/xz-envelope synth + extraction kernel
        "q145_deflate_extract",  # zlib-envelope synth + extraction kernel
        "q152_markdown_extract",  # markdown synth + extraction kernel
        "q153_tar_extract",      # tar-bundle synth + extraction kernel
        "q158_csv_extract",      # csv/tsv synth + extraction kernel
        "q159_latex_extract",    # latex synth + extraction kernel
        "q160_ipynb_extract",    # notebook synth + extraction kernel
        "q161_subtitle_extract",  # vtt/srt synth + extraction kernel
        "q163_wikitext_extract",  # wikitext synth + extraction kernel
        "q164_eml_extract",      # MIME-mail synth + extraction kernel
        "q166_mbox_extract",     # mbox-archive synth + extraction kernel
        "q168_ics_extract",      # iCalendar synth + extraction kernel
        "q170_zip_extract",      # generic-zip bundle synth + extraction kernel
        "q171_ps_extract",       # PostScript synth + extraction kernel
        "q173_arc_extract",      # ARC-container synth+parse + extraction kernel
        "q174_markdown_render",  # extraction kernel + JVM-side Markdown render
        "q180_fb2_extract",      # FictionBook synth + extraction kernel
        "q181_djvu_metadata",    # DjVu IFF synth + metadata-walk kernel
        "q184_mobi_extract",     # MOBI/PalmDOC synth + extraction kernel
        "q185_ndjson_extract",   # JSON-Lines synth + extraction kernel
        "q186_rst_extract",      # reStructuredText synth + extraction kernel
        "q187_man_extract",      # man(7) troff synth + extraction kernel
        "q188_adoc_extract",     # AsciiDoc synth + extraction kernel
        "q189_org_extract",      # Org-mode synth + extraction kernel
        "q190_texinfo_extract",  # Texinfo synth + extraction kernel
        "q191_docbook_extract",  # DocBook synth + extraction kernel
        "q192_mdoc_extract",     # mdoc(7) synth + extraction kernel
        "q193_gemtext_extract",  # gemtext synth + extraction kernel
        "q194_po_extract",       # PO-catalog synth + extraction kernel
        "q195_ttml_extract",     # TTML-caption synth + extraction kernel
        "q196_bibtex_extract",   # BibTeX synth + extraction kernel
        "q197_ms_extract",       # troff-ms synth + extraction kernel
    }
    markers = ("ArrowEvalPython", "BatchEvalPython", "FlatMapGroupsInPandas",
               "MapInPandas", "PythonMapInArrow", "MapInArrow")
    for name, fn in q.queries().items():
        plan = _plan(fn(spark, sf_dir))
        has_python = any(m in plan for m in markers)
        if name in allowed_python:
            # a localCheckpoint between the Python kernel and the final
            # plan materializes the kernel's output as an RDD scan (r6:
            # simhash64_pairs checkpoints its signature input), so the
            # sanctioned node may legitimately be hidden behind one
            assert has_python or "ExistingRDD" in plan, (
                f"{name} expected a Python kernel node"
            )
        else:
            assert not has_python, f"{name} crosses into Python:\n{plan[:1500]}"


def test_lineage_shows_balanced_partitions_under_skew(spark, pages_dir, tmp_path):
    """End-to-end skew check using the engine's own lineage: on the
    Zipf-skewed fixture, url-hash partitioning (+ salting) must keep
    per-partition row counts near-uniform — no partition more than 3x
    the median."""
    from toyocr_spark.pipeline import read_lineage, resumable_run
    from toyocr_spark.plans.partitioning import hot_hosts

    pages = read_pages(spark, pages_dir)
    out = str(tmp_path / "balance")
    hot = hot_hosts(pages, threshold_fraction=0.05)
    resumable_run(spark, pages, out, n_chunks=1, num_partitions=8, hot=hot)
    counts = sorted(
        r["row_count"] for r in read_lineage(spark, out).collect() if r["row_count"] > 0
    )
    assert len(counts) >= 4
    median = counts[len(counts) // 2]
    assert counts[-1] <= 3 * median, counts


def test_bm25_pushes_query_terms_below_aggregates(spark, sf_dir):
    """Retrieval must shuffle only the query terms' posting lists: the
    word IN (...) predicate lands under the explode, before any
    HashAggregate, and the final top-k is TakeOrderedAndProject (a
    distributed heap-merge), never a global row_number window."""
    plan = _plan(q.queries()["q50_bm25"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan.split("TakeOrderedAndProject")[1]
    filt = plan.find("IN (spark,shuffle)")
    assert filt != -1, "query-term filter missing from physical plan"
    # the filter occurs below (later in the printed tree than) every
    # aggregate that consumes it: some IN-filter line must sit deeper
    # than the last HashAggregate line
    lines = plan.splitlines()
    agg_rows = [i for i, ln in enumerate(lines) if "HashAggregate" in ln]
    in_rows = [i for i, ln in enumerate(lines) if "IN (spark,shuffle)" in ln]
    assert max(in_rows) > min(agg_rows)


def test_pmi_top_n_is_distributed_topk(spark, sf_dir):
    plan = _plan(q.queries()["q51_pmi_bigrams"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan  # zip-with-shift, no self-join


def test_phrase_retrieval_is_filtered_equijoin(spark, sf_dir):
    """Each phrase term's predicate must filter its posting-list leg
    BEFORE the position intersection (never a cross join), and the final
    top-k must be a distributed heap-merge."""
    plan = _plan(q.queries()["q58_phrase_retrieval"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # both term filters present in the plan
    assert "table" in plan and "hash" in plan


def test_rollup_is_single_expand_aggregate(spark, sf_dir):
    """ROLLUP must plan as one Expand feeding one aggregate chain — not
    a union of per-level scans (1 scan of the corpus, not 3)."""
    plan = _plan(q.queries()["q59_rollup_report"](spark, sf_dir))
    assert plan.count("Expand") >= 1
    assert len(_scan_columns(plan)) == 1, "rollup re-scanned the input"
    assert "Union" not in plan


def test_bucketed_join_skips_both_exchanges(spark, sf_dir):
    """Two tables bucketed on the join key with equal bucket counts:
    the sort-merge join must plan ZERO shuffle Exchange nodes — the
    write-time bucketing IS the shuffle, paid once and amortized over
    every later join (the 100 TB repeated-join contract)."""
    from toyocr_spark.plans.bucketing import bucketed_join, write_bucketed

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    # disable broadcast so the planner must choose sort-merge — the
    # point is the Exchange-free SMJ a 100 TB fact-fact join would use
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=4)
        write_bucketed(li, "b_lineitem", "o_orderkey", n_buckets=4)
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # row-count sanity vs the plain join
        plain = orders.join(li, "o_orderkey")
        assert joined.count() == plain.count()
        # grouped aggregate on the bucket key also rides the bucket layout
        agg_plan = _plan(
            spark.table("b_lineitem").groupBy("o_orderkey").agg(F.sum("l_quantity"))
        )
        assert "Exchange" not in agg_plan, agg_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_funnel_report_scans_corpus_once(spark, sf_dir):
    """The 4-stage funnel is one pass of flags + conditional sums: the
    documents table appears exactly once in the physical plan (the
    token-explode leg joins back to the same cached scan shape —
    two scans total, never four)."""
    plan = _plan(q.queries()["q61_funnel_report"](spark, sf_dir))
    assert len(_scan_columns(plan)) <= 2, plan


def test_dsir_one_model_shuffle_and_distributed_topk(spark, sf_dir):
    """DSIR contract: the token stream is joined against the unigram
    model exactly ONCE — the only word-keyed shuffles build the raw and
    target models (2 partial-agg Exchanges); the token stream itself is
    never word-shuffled. Selection is TakeOrderedAndProject with the
    row_number window ABOVE it (it ranks only the k survivors, never
    the corpus)."""
    plan = _plan(q.queries()["q73_dsir_sample"](spark, sf_dir))
    # model is localCheckpoint-materialized before scoring, so the
    # scoring plan carries NO word-keyed shuffle at all — the token
    # stream is joined against the (broadcast-able) materialized model
    # and the only Exchange left is the per-doc aggregate on id
    word_shuffles = len(re.findall(r"Exchange hashpartitioning\(word#", plan))
    assert word_shuffles == 0, f"token stream must never shuffle on word, got {word_shuffles}"
    all_shuffles = len(re.findall(r"Exchange hashpartitioning\(", plan))
    assert all_shuffles == 1, f"scoring pass should shuffle once (per-doc agg), got {all_shuffles}"
    assert "TakeOrderedAndProject(limit=50" in plan
    assert plan.index("Window") < plan.index("TakeOrderedAndProject")
    assert "CartesianProduct" not in plan


def test_ivf_persisted_search_plan_has_no_training_and_no_cid_exchange(spark, sf_dir):
    """The persisted-index search (q75) must be pure search: centroids
    + bucketed lists come from catalog tables (no k-means stages — the
    inline-trained q54 plan scans embeddings ~a dozen times, this one
    exactly twice for probe+rerank query vectors), the lists are read
    Bucketed so NO Exchange on cid exists anywhere, and the only
    shuffles rank the tiny per-query candidate sets."""
    plan = _plan(q.queries()["q75_ivf_persisted_search"](spark, sf_dir))
    assert "toyocr_ivf_v1" in plan  # reads the persisted tables
    assert "Bucketed: true" in plan  # the lists scan honors the bucket spec
    exchanges = re.findall(r"Exchange hashpartitioning\((\w+)#", plan)
    assert exchanges and set(exchanges) == {"query_id"}, exchanges
    assert plan.count("FileScan") == 4  # 2x query vecs + centroids + lists


def test_ivf_bucketed_lists_aggregate_skips_exchange(spark, sf_dir):
    """Real-consumer proof of the bucketing contract: a groupBy on the
    persisted lists' bucket key plans ZERO Exchange (list-size
    accounting — the maintenance query an IVF operator actually runs)."""
    from toyocr_spark.queries import _ivf_table_prefix, ensure_ivf_index

    ensure_ivf_index(spark, sf_dir)
    lists = spark.table(_ivf_table_prefix(sf_dir) + "_lists")
    plan = _plan(lists.groupBy("cid").count())
    assert "Exchange" not in plan


def test_webtext_parse_queries_plan_shapes(spark, sf_dir):
    """Scale contracts for the markup-parsing family: q96 (HTML table
    extraction) is map-only — ZERO exchanges; q95 (sitemap ingestion)
    shuffles at most twice (the distinct-sitemap count's two-phase
    aggregate), never more; q97 (BPE pairs) takes its top-k with
    TakeOrderedAndProject — per-partition top-k merge, no full sort of
    the pair vocabulary — and its final rank window touches only the
    20 survivors."""
    fns = q.queries()
    p96 = _plan(fns["q96_html_tables"](spark, sf_dir))
    assert p96.count("Exchange") == 0, p96[:1500]

    p95 = _plan(fns["q95_sitemap_parse"](spark, sf_dir))
    assert p95.count("Exchange") <= 2, p95[:1500]

    p97 = _plan(fns["q97_bpe_pairs"](spark, sf_dir))
    assert "TakeOrderedAndProject" in p97, p97[:1500]


def test_host_keyed_joins_have_no_broadcast_hint(spark, sf_dir):
    """Template-strip / host-boilerplate join tables whose row count
    scales with HOST CARDINALITY (~1e8 hosts in a real crawl; tpl is
    hosts x furniture digests) — a forced F.broadcast() of either OOMs
    every executor at 100x. The logical plan must carry no broadcast
    strategy hint on those joins; AQE may still choose broadcast at
    runtime when the side is genuinely small (that's fine — it's
    size-gated, not forced)."""
    fns = q.queries()
    for name in ("q85_template_strip", "q79_host_boilerplate"):
        logical = (
            fns[name](spark, sf_dir)._jdf.queryExecution().optimizedPlan().toString()
        )
        assert "strategy=broadcast" not in logical, (
            f"{name} forces a broadcast of a host-cardinality table:\n"
            + logical[:1500]
        )


def test_zipf_host_salting_bounds_per_task_input(spark, sf_dir):
    """q124's skew contract, runtime-checked: under the geometric-Zipf
    host ladder (z0 = half the corpus) the phase-1 salt must spread the
    hot host across all 16 buckets with no bucket above 2x the even
    share — per-task input stays ~hot/16 at any corpus size — and the
    two-phase result must be row-identical to the naive window."""
    from toyocr_spark.queries import QUERIES, _t, _zipf_host_col

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", _zipf_host_col().alias("host")
    )
    counts = {r["host"]: r["n"] for r in d.groupBy("host").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    hot, hot_n = max(counts.items(), key=lambda kv: kv[1])
    assert hot_n >= total * 2 // 5, f"fixture not skewed: {counts}"

    # replicate phase 1's shuffle key: (host, pmod(xxhash64(tiebreak), 16))
    buckets = (
        d.filter(F.col("host") == hot)
        .groupBy(F.pmod(F.xxhash64(F.col("doc_id")), F.lit(16)).alias("salt"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    per = [r["n"] for r in buckets]
    assert len(per) == 16, f"hot host hits only {len(per)} salt buckets"
    assert max(per) <= 2 * (hot_n // 16 + 1), (hot_n, sorted(per))

    # row identity vs the naive single-reducer window
    from pyspark.sql import Window

    naive = (
        d.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("host").orderBy(F.col("n_chars").desc(), "doc_id")
            ),
        )
        .filter(F.col("rk") <= 3)
        .select("host", "doc_id", "n_chars", "rk")
    )
    got = QUERIES["q124_zipf_host_topk"].spark(spark, sf_dir)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))


def test_pq_index_retrains_when_codebook_alone_is_missing(spark, sf_dir):
    """Partial cleanup (surviving _codes, dropped _codebook) must
    trigger a retrain, not a crash on spark.table(_codebook) — the
    ensure gate checks BOTH tables (round-4 ADVICE item)."""
    from toyocr_spark.queries import _pq_table_prefix, ensure_pq_index

    if ensure_pq_index(spark, sf_dir) is None:
        import pytest

        pytest.skip("warehouse not writable in this harness")
    prefix = _pq_table_prefix(sf_dir)
    spark.sql(f"DROP TABLE {prefix}_codebook")
    assert spark.catalog.tableExists(f"{prefix}_codes")
    assert ensure_pq_index(spark, sf_dir) == prefix
    assert spark.catalog.tableExists(f"{prefix}_codebook")
    assert spark.table(f"{prefix}_codebook").count() > 0


def test_pq_persisted_search_plan_has_no_training(spark, sf_dir):
    """The persisted-PQ search (q128) must be pure search: codebook +
    code table come from catalog tables (no k-means stage — the
    inline-trained q126 plan re-shuffles the embeddings per quantizer
    round, this scans them once for the query subvectors), and the
    only shuffles aggregate/rank the per-(query, item) candidate
    sums."""
    from toyocr_spark.queries import ensure_pq_index

    if ensure_pq_index(spark, sf_dir) is None:
        import pytest

        pytest.skip("warehouse not writable in this harness")
    plan = _plan(q.queries()["q128_pq_persisted_search"](spark, sf_dir))
    assert "toyocr_pq_v1" in plan  # reads the persisted tables
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)#", plan))
    assert keys and keys <= {"query_id", "item_id"}, keys
    # queries scanned once + codebook + codes = exactly 3 file scans
    assert plan.count("FileScan") == 3, plan.count("FileScan")
