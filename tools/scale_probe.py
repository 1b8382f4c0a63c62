#!/usr/bin/env python3
"""Data-volume scaling probe: run the shuffle-heavy operator family at
1x and Kx row counts on the SAME session/cores and report the runtime
ratio against the ideal K. Complements BENCH/BASELINE.md's core-scaling
(N -> 4N executors) evidence with the other axis a 100 TB argument
needs: work growing linearly in rows, i.e. no operator hiding a
super-linear shape (all-pairs, unbounded window, driver materialize).

The Kx corpus is synthesized deterministically from the sf input:
replicas get distinct doc_ids and a per-replica suffix token so text
stays distinct (replicated identical text would turn the whole corpus
into one dup cluster and change the workload, not just its size).

Usage: PYTHONPATH=. python tools/scale_probe.py [K]
Writes BENCH/scale_probe.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PROBES = [
    "q13_dedup_exact",
    "q15_minhash_lsh",
    "q38_simhash64",
    "q56_dup_spans",
    "q124_zipf_host_topk",
    # round 5: one synth+extract container kernel — map-only, so the
    # ratio should sit close to the per-row ideal; a super-linear
    # reading here would mean the kernel leaks state across rows
    "q129_docx_extract",
    # round 5 heavy family (VERDICT r4 item 6): the flagship extract
    # map, the AES crypto kernel, and the two embedding-side shapes
    "q25_extract",
    "q125_pdf_aes_extract",
    "q54_ann_ivf",
    "q77_semdedup",
    # round-5 continuation: the two new container/text kernels (both
    # map-only — ratios should track the per-row ideal) and the
    # edge-vs-edge reciprocity join (both join sides grow with the
    # corpus, so the ratio bounds the shuffle's row-linearity)
    "q152_markdown_extract",
    "q153_tar_extract",
    "q150_hreflang_pairs",
    # round-5 final batch: the MIME-decode kernel (map-only), the
    # two-level anchor aggregation (both shuffles keyed on target —
    # the ratio bounds the agg's row-linearity), and the
    # pointer-doubling joins (3 log-step self-joins whose row count
    # is corpus-linear by construction)
    "q164_eml_extract",
    "q162_anchor_text",
    "q165_thread_reconstruct",
    # round-5 closing batch: the two bundle walkers (zip members decode
    # member-local, so the ratio tracks the per-row ideal), the
    # redirect doubling (per-URL resolution rows are corpus-linear),
    # and the recrawl window pass (one url-keyed shuffle, six
    # observation rows per url)
    "q170_zip_extract",
    "q167_redirect_resolve",
    "q169_recrawl_schedule",
    # round-5 final additions: the ARC container walk (map-only synth +
    # parse + extract), the per-doc TextRank rounds (iterative joins
    # whose edge list is corpus-linear — per-doc graphs are bounded by
    # doc length), and the paragraph-segmentation window (one doc-keyed
    # shuffle, lag state only)
    "q173_arc_extract",
    "q175_textrank_keywords",
    "q176_lang_segments",
    # closing additions: the three new synth+extract legs (fb2 XML
    # walk, MOBI PalmDOC decompress, JSON-Lines record walk — all
    # map-only, ratios should track the per-row ideal)
    "q180_fb2_extract",
    "q184_mobi_extract",
    "q185_ndjson_extract",
]

# The registered q77 keeps k=8 clusters at every size, so cells grow
# with the corpus and the within-cell pairing is asymptotically
# quadratic (N^2/k) — invisible at this scale where fixed overheads
# dominate, but a real trend. Production bounds cells by growing k
# with the corpus; that in turn makes the EXACT inline k-means
# assignment the quadratic term (Θ(N·k) with k ∝ N — measured: a
# k-scaled inline run read 7.65x at 5x rows). At 100 TB the assignment
# is a separately-persisted offline artifact (trained on a sample,
# probed hierarchically — the q75/q127 train-once discipline), so the
# probe holds the DEDUP operator itself to the linear bar over a
# precomputed bounded-cell assignment (q77_semdedup_bounded_cells).
DIAGNOSED = {
    "q77_semdedup": "fixed k=8: within-cell pairs grow ~N^2/k asymptotically "
    "(fixed overheads mask it at this scale); production keeps cells bounded "
    "— held to the bar in q77_semdedup_bounded_cells"
}


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from pyspark.sql import SparkSession, functions as F

    from toyocr_spark.queries import QUERIES

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', 32)}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    big_dir = f"/tmp/scale_probe_{k}x"
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n1 = docs.count()
    reps = spark.range(k).select(F.col("id").alias("_rep"))
    big = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("_rep") * F.lit(n1)).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" rep"), F.col("_rep").cast("string")
            ).alias("text"),
            *[
                c
                for c in docs.columns
                if c not in ("doc_id", "text")
            ],
        )
    )
    big.write.mode("overwrite").parquet(f"{big_dir}/documents.parquet")
    nk = spark.read.parquet(f"{big_dir}/documents.parquet").count()
    assert nk == k * n1, (nk, k, n1)

    # embeddings replica for the vector-side probes: ids shift by the
    # replica stride and ONE deterministic component per replica gets a
    # rep-sized offset, so replicas are distinct vectors (identical
    # copies would make the whole corpus one dup cluster — a different
    # workload, not a bigger one) while the geometry stays comparable.
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    ne1 = emb.count()
    big_emb = emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("_rep") * F.lit(ne1)).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: (
                x.cast("double")
                + F.when(
                    i == F.pmod(F.col("_rep"), F.size(F.col("embedding"))),
                    F.col("_rep").cast("double") * F.lit(0.37),
                ).otherwise(F.lit(0.0))
            ).cast("float"),
        ).alias("embedding"),
        "label",
    )
    big_emb.write.mode("overwrite").parquet(f"{big_dir}/embeddings.parquet")

    def best_of(fn, runs=2):
        ts = []
        for _ in range(runs):
            t = time.time()
            fn()
            ts.append(time.time() - t)
        return min(ts)

    rows = {}
    for name in PROBES:
        spec = QUERIES[name]
        t1 = best_of(lambda: spec.spark(spark, SF_DIR).count())
        tk = best_of(lambda: spec.spark(spark, big_dir).count())
        rows[name] = {
            "t_1x_sec": round(t1, 3),
            f"t_{k}x_sec": round(tk, 3),
            "ratio": round(tk / t1, 2),
            "vs_ideal": round((tk / t1) / k, 2),
        }
        if name in DIAGNOSED:
            rows[name]["diagnosed"] = DIAGNOSED[name]
        print(name, rows[name], flush=True)

    # the production SemDeDup shape: a PRECOMPUTED assignment (at scale
    # a persisted offline-trained index, here a deterministic bucket of
    # the same ~250-vector cell size both sides) with cluster count
    # grown ∝ rows so cells stay bounded — the dedup operator itself
    # is held to the linear bar
    from toyocr_spark.operators.dedup import semantic_dedup

    def bounded_cells(path, cells):
        e = spark.read.parquet(path)
        pre = e.select(
            F.col("vec_id").alias("id"), F.pmod("vec_id", F.lit(cells)).alias("cid")
        )
        return semantic_dedup(e, threshold=0.40, assigned=pre).count()

    t1 = best_of(lambda: bounded_cells(f"{SF_DIR}/embeddings.parquet", 8))
    tk = best_of(lambda: bounded_cells(f"{big_dir}/embeddings.parquet", 8 * k))
    rows["q77_semdedup_bounded_cells"] = {
        "t_1x_sec": round(t1, 3),
        f"t_{k}x_sec": round(tk, 3),
        "ratio": round(tk / t1, 2),
        "vs_ideal": round((tk / t1) / k, 2),
    }
    print("q77_semdedup_bounded_cells", rows["q77_semdedup_bounded_cells"], flush=True)

    # one deep point on the flagship map: 25x rows (sf0.1 x 25 ~ an
    # sf2.5-equivalent document count) through synth+extract only
    k25 = 25
    dir25 = f"/tmp/scale_probe_{k25}x"
    reps25 = spark.range(k25).select(F.col("id").alias("_rep"))
    (
        docs.crossJoin(reps25)
        .select(
            (F.col("doc_id") + F.col("_rep") * F.lit(n1)).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" rep"), F.col("_rep").cast("string")
            ).alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
        .write.mode("overwrite")
        .parquet(f"{dir25}/documents.parquet")
    )
    spec = QUERIES["q25_extract"]
    t1 = best_of(lambda: spec.spark(spark, SF_DIR).count())
    t25 = best_of(lambda: spec.spark(spark, dir25).count())
    extract_deep = {
        "t_1x_sec": round(t1, 3),
        f"t_{k25}x_sec": round(t25, 3),
        "ratio": round(t25 / t1, 2),
        "ideal": float(k25),
        "vs_ideal": round((t25 / t1) / k25, 2),
    }
    print("extract_25x", extract_deep, flush=True)

    out = {
        "metric": f"runtime ratio at {k}x rows vs 1x (ideal = {k}.0; "
        "<= ideal means per-row cost does not grow with corpus size)",
        "sf_dir": SF_DIR,
        "rows_1x": n1,
        "k": k,
        "probes": rows,
        "extract_25x": extract_deep,
        "worst_vs_ideal": max(
            r["vs_ideal"] for name, r in rows.items() if "diagnosed" not in r
        ),
    }
    with open(os.path.join(REPO, "BENCH", "scale_probe.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
