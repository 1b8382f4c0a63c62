#!/usr/bin/env python3
"""Training-data prep driver — the full corpus pipeline in one job.

Chains the engine's corpus operators the way a pretraining-data run
would: extract (or take a documents table) -> language ID -> quality
filter -> exact dedup -> MinHash-LSH near-dup clustering -> keep one
canonical doc per cluster -> token accounting -> parquet.

    spark-submit --py-files dist/toyocr_spark.zip jobs/prep_job.py \\
        --documents <parquet with (doc_id, text[, lang])> --output <dir>
    # or start from raw pages:
    ... --pages <pages dir> --output <dir>

Every stage is built-ins + the registered operators (no ad-hoc logic):
quality/lang are JVM column expressions, dedup is the sub-quadratic
candidate-then-verify pipeline, clustering is min-label propagation.
Prints one JSON line with per-stage row counts (the corpus funnel).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="toyocr_spark corpus prep job")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--documents", help="parquet with (doc_id, text)")
    src.add_argument("--pages", help="pages dir; extraction runs first")
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-jaccard", type=float, default=0.5)
    ap.add_argument("--shingle", type=int, default=8)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--min-chars", type=int, default=80)
    ap.add_argument("--min-tokens", type=int, default=16)
    ap.add_argument("--min-punct", type=int, default=1, help="0 for corpora without sentence punctuation")
    ap.add_argument(
        "--simhash-hamming", type=int, default=0,
        help="simhash near-dup admission radius (0 = stage off): drop any "
        "doc whose 64-bit text simhash is within this hamming distance "
        "of a smaller-id survivor",
    )
    ap.add_argument(
        "--para-words", type=int, default=0,
        help="paragraph-dedup window in words (0 = stage off): repeated "
        "paragraphs keep only their global first occurrence",
    )
    ap.add_argument(
        "--blocklist",
        help="text file of blocked host suffixes, one per line (pages "
        "mode): a page whose url host or any parent domain matches is "
        "dropped before any content work",
    )
    ap.add_argument(
        "--partition-by",
        help="comma-separated output partition columns (e.g. "
        "lang_pred): Hive-partitioned corpus layout with a bounded "
        "file count per directory",
    )
    ap.add_argument(
        "--files-per-partition",
        type=int,
        default=1,
        help="max parquet files per partition directory (file-count "
        "control at cluster width)",
    )
    ap.add_argument(
        "--c4-rules",
        action="store_true",
        help="apply the C4 per-rule decision table (terminal "
        "punctuation, code/lorem/javascript markers, word-count floor) "
        "after the surface-quality filter",
    )
    ap.add_argument(
        "--pii-redact",
        action="store_true",
        help="mask emails / phone numbers / IPv4 addresses in the "
        "surviving text with placeholder tokens before token "
        "accounting (redaction mutates text, never drops rows)",
    )
    ap.add_argument(
        "--decontam-benchmark",
        help="parquet with (doc_id, text): drop docs whose 8-gram "
        "overlap fraction with this benchmark exceeds --decontam-max",
    )
    ap.add_argument("--decontam-max", type=float, default=0.05)
    ap.add_argument(
        "--dsir-target",
        help="parquet with (doc_id, text): a target-domain seed corpus; "
        "surviving docs are DSIR importance-resampled against it "
        "(unigram log-likelihood ratio weights, deterministic integer "
        "priority sampling)",
    )
    ap.add_argument(
        "--dsir-keep", type=int, default=0,
        help="how many docs the DSIR stage keeps (0 = stage off)",
    )
    ap.add_argument(
        "--semdedup-embeddings",
        help="parquet with (vec_id, embedding) keyed by doc_id: run "
        "SemDeDup (cluster-bounded embedding near-dup removal) and drop "
        "the non-survivors",
    )
    ap.add_argument("--semdedup-threshold", type=float, default=0.40)
    ap.add_argument(
        "--phrase-blocklist", default=None,
        help="file of blocked word sequences (one phrase per line): "
        "docs containing any are dropped after the quality stage "
        "(L-gram broadcast join, never a LIKE chain)",
    )
    ap.add_argument(
        "--bpe-merges", type=int, default=0,
        help="train a BPE tokenizer ON the curated survivors (N merge "
        "rounds over the distinct-word vocab — corpus touched once) "
        "and account tokens under it",
    )
    ap.add_argument(
        "--bpe-artifact", default=None,
        help="write the learned merge list here (merges.txt format, "
        "one 'left right' pair per line in learned order)",
    )
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from toyocr_spark.functions.textfns import lang_id_scores, quality_features, token_count
    from toyocr_spark.operators.dedup import (
        char_shingles,
        connected_components,
        exact_dedup,
        jaccard_for_pairs,
        minhash_band_signatures,
        minhash_lsh_candidates,
    )

    spark = SparkSession.builder.appName("toyocr-prep").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    funnel: dict = {"metric": "corpus prep funnel (rows surviving each stage)"}

    if args.pages:
        from toyocr_spark.pipeline import extract_pages
        from toyocr_spark.sources.pages import read_pages

        docs = extract_pages(read_pages(spark, args.pages)).select(
            F.xxhash64("url").alias("doc_id"),
            F.col("url"),
            F.col("extracted_text").alias("text"),
        )
    else:
        docs = spark.read.parquet(args.documents).select(
            "doc_id", "text", *(["url"] if "url" in spark.read.parquet(args.documents).columns else [])
        )
    funnel["input"] = docs.count()

    # 0. canonical-URL dedup (pages mode only): the zero-content-cost
    #    dedup lever — scheme/host case, default ports, tracking params
    #    and fragments collapse BEFORE any hashing touches the text
    if args.pages:
        from toyocr_spark.functions.urlfns import canonicalize_url

        docs = docs.withColumn("curl", canonicalize_url(F.col("url")))
        url_keep = docs.groupBy("curl").agg(F.min("doc_id").alias("doc_id"))
        docs = docs.join(url_keep.select("doc_id"), "doc_id", "left_semi").drop("curl")
        funnel["after_url_dedup"] = docs.count()

    # 0.5 domain blocklist (pages mode): suffix-semantics host filter —
    #     the admission control a crawl runs before spending any cycle
    if args.pages and args.blocklist:
        from toyocr_spark.functions.urlfns import drop_blocked_hosts

        with open(args.blocklist) as f:
            suffixes = [ln.strip() for ln in f if ln.strip()]
        bl = spark.createDataFrame([(s,) for s in suffixes], "host string")
        docs = docs.withColumn("_host", F.parse_url(F.col("url"), F.lit("HOST")))
        docs = drop_blocked_hosts(docs, "_host", bl).drop("_host")
        funnel["after_blocklist"] = docs.count()

    # 1. quality filter (C4-style heuristics, JVM-side)
    q = quality_features(
        docs, "text",
        min_chars=args.min_chars, min_tokens=args.min_tokens, min_punct=args.min_punct,
    ).filter(F.col("q_keep") == 1)
    q = q.localCheckpoint()  # funnel stages reuse it; truncate lineage
    funnel["after_quality"] = q.count()

    # 1.5 C4 rule table: the published-filter complement to the
    #     surface-quality stage — per-row Column expressions only, so
    #     this adds zero shuffles to the funnel
    if args.c4_rules:
        from toyocr_spark.functions.textfns import c4_rules

        c4_keep = c4_rules(q.select("doc_id", "text"), "doc_id", "text").filter(
            F.col("keep") == 1
        )
        q = q.join(
            c4_keep.select(F.col("id").alias("doc_id")), "doc_id", "left_semi"
        )
        funnel["after_c4"] = q.count()

    # 1.8 phrase blocklist: the C4 bad-words filter generalized to
    #     multi-word phrases — docs with any blocked sequence drop out
    if args.phrase_blocklist:
        from toyocr_spark.functions.textfns import drop_blocked_phrases

        with open(args.phrase_blocklist) as f:
            blocked = [ln.strip() for ln in f if ln.strip()]
        if blocked:
            q = drop_blocked_phrases(q, "doc_id", "text", blocked)
            funnel["after_phrase_blocklist"] = q.count()

    # 2. language ID (n-gram marker heuristic)
    lang = lang_id_scores(q.select("doc_id", "text"), "text").select(
        "doc_id", "lang_pred"
    )

    # 3. exact dedup (hash-groupBy survivor)
    exact = exact_dedup(q, "doc_id", "text")
    survivors_exact = q.join(
        exact.select(F.col("keep_id").alias("doc_id")), "doc_id", "left_semi"
    )
    funnel["after_exact_dedup"] = survivors_exact.count()

    # 4. near-dup clustering: LSH candidates -> verified pairs -> CC ->
    #    keep the minimum doc_id of each cluster
    sh = char_shingles(
        survivors_exact.select("doc_id", F.substring("text", 1, 512).alias("t")),
        "doc_id", "t", args.shingle,
    )
    cands = minhash_lsh_candidates(minhash_band_signatures(sh, args.bands))
    pairs = jaccard_for_pairs(sh, cands, min_jaccard=args.min_jaccard).select("id_a", "id_b")
    clusters = connected_components(pairs, survivors_exact.select("doc_id"))
    canonical = clusters.filter(F.col("id") == F.col("cluster_id")).select(
        F.col("id").alias("doc_id")
    )
    final = survivors_exact.join(canonical, "doc_id", "left_semi")
    funnel["after_near_dedup"] = final.count()

    # 4.2 simhash near-dup admission (optional): the cheap wide-recall
    #     complement to stage 4's LSH+Jaccard clustering — survive iff
    #     no smaller-id doc lies within the hamming radius. Monotone
    #     rule => banded pairs + one anti-join (no sequential greedy);
    #     same operator the image/audio families and the streaming
    #     admission twin use.
    if args.simhash_hamming > 0:
        from toyocr_spark.operators.dedup import simhash64, simhash64_pairs

        sim = simhash64(
            final.select("doc_id", F.substring("text", 1, 512).alias("t")),
            "doc_id", "t", args.shingle,
        )
        # anti-join on the DROP set (not semi-join on survivors): docs
        # too short to shingle have no hash row and must pass through,
        # the same semantics the streaming twin pins in its tests
        drops = (
            simhash64_pairs(sim, max_hamming=args.simhash_hamming)
            .select(F.col("id_b").alias("doc_id"))
            .distinct()
        )
        final = final.join(drops, "doc_id", "left_anti")
        funnel["after_simhash_neardup"] = final.count()

    # 4.5 paragraph-level dedup (CCNet policy): repeated paragraphs keep
    #     only their global first occurrence; docs whose every paragraph
    #     was boilerplate drop out entirely
    if args.para_words > 0:
        from toyocr_spark.operators.dedup import paragraph_dedup

        pd = paragraph_dedup(final, "doc_id", "text", words_per_para=args.para_words)
        final = (
            final.drop("text")
            .join(
                pd.filter(F.col("n_kept") > 0).select(
                    F.col("id").alias("doc_id"), F.col("text_kept").alias("text")
                ),
                "doc_id",
            )
        )
        funnel["after_para_dedup"] = final.count()

    # 4.8 benchmark decontamination: drop docs whose k-gram overlap with
    #     the benchmark exceeds the threshold (run LAST so earlier dedup
    #     cannot resurrect a contaminated doc's near-twin)
    if args.decontam_benchmark:
        from toyocr_spark.operators.dedup import contamination_scores

        bench = spark.read.parquet(args.decontam_benchmark).select("doc_id", "text")
        scores = contamination_scores(final, bench, "doc_id", "text")
        dirty = scores.filter(F.col("contamination") > args.decontam_max).select(
            F.col("id").alias("doc_id")
        )
        final = final.join(dirty, "doc_id", "left_anti")
        funnel["after_decontam"] = final.count()

    # 4.7 SemDeDup: embedding-space near-dup removal, quadratic bounded
    #     by k-means cells (runs after the lexical dedups — it catches
    #     paraphrase-level twins that no hash family sees)
    if args.semdedup_embeddings:
        from toyocr_spark.operators.dedup import semantic_dedup

        emb = spark.read.parquet(args.semdedup_embeddings).select(
            "vec_id", "embedding"
        )
        verdict = semantic_dedup(
            emb, "vec_id", "embedding", threshold=args.semdedup_threshold
        )
        dropped_sem = verdict.filter(F.col("kept") == 0).select(
            F.col("vec_id").alias("doc_id")
        )
        final = final.join(dropped_sem, "doc_id", "left_anti")
        funnel["after_semdedup"] = final.count()

    # 4.9 DSIR importance resampling: keep the --dsir-keep docs that
    #     best match the target-domain seed corpus (run after all
    #     dedup/decontam so weights are computed over clean survivors)
    if args.dsir_target and args.dsir_keep > 0:
        from toyocr_spark.operators.dsir import dsir_sample

        seed = spark.read.parquet(args.dsir_target).select("doc_id", "text")
        picked = dsir_sample(
            final, "doc_id", "text", seed, k=args.dsir_keep
        ).select(F.col("id").alias("doc_id"))
        final = final.join(picked, "doc_id", "left_semi")
        funnel["after_dsir"] = final.count()

    # 4.95 PII redaction: mask emails/phones/IPs in the survivors'
    #      text BEFORE token accounting (placeholders count as tokens
    #      the way they will at training time); transform-only — the
    #      funnel records how many docs were touched, none are dropped
    if args.pii_redact:
        from toyocr_spark.functions.textfns import pii_redact

        red = pii_redact(final.select("doc_id", "text"), "doc_id", "text")
        funnel["pii_docs_redacted"] = red.filter(
            (F.col("n_emails") + F.col("n_phones") + F.col("n_ips")) > 0
        ).count()
        final = final.drop("text").join(
            red.select(F.col("id").alias("doc_id"), F.col("redacted").alias("text")),
            "doc_id",
        )

    # 5. token accounting + write
    out = (
        final.join(lang, "doc_id")
        .withColumn("n_tokens", token_count(F.col("text")))
    )
    if args.partition_by:
        from toyocr_spark.plans.partitioning import write_partitioned_corpus

        write_partitioned_corpus(
            out,
            args.output,
            [c.strip() for c in args.partition_by.split(",") if c.strip()],
            files_per_partition=args.files_per_partition,
        )
    else:
        out.write.mode("overwrite").parquet(args.output)
    funnel["tokens_total"] = int(
        out.agg(F.sum("n_tokens")).collect()[0][0] or 0
    )

    # 6. tokenizer training on the CURATED corpus (the artifact a
    #    training run consumes next): one corpus pass builds the word
    #    vocab, merge rounds iterate over vocab rows only, and the BPE
    #    token accounting is one broadcast join — see operators/bpe.py
    if args.bpe_merges > 0:
        from toyocr_spark.operators.bpe import encode_tokens, train_bpe, word_vocab

        merges, seg = train_bpe(
            word_vocab(final.select("text")), n_merges=args.bpe_merges
        )
        funnel["bpe_merges"] = len(merges)
        if args.bpe_artifact:
            with open(args.bpe_artifact, "w") as f:
                f.write("#version: 0.2\n")
                for left, right, _freq in merges:
                    f.write(f"{left} {right}\n")
        funnel["bpe_tokens_total"] = int(
            encode_tokens(final.select("doc_id", "text"), seg)
            .agg(F.sum("n_tokens"))
            .collect()[0][0]
            or 0
        )

    print(json.dumps(funnel))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
