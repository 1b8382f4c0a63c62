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
]


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
        print(name, rows[name], flush=True)

    out = {
        "metric": f"runtime ratio at {k}x rows vs 1x (ideal = {k}.0; "
        "<= ideal means per-row cost does not grow with corpus size)",
        "sf_dir": SF_DIR,
        "rows_1x": n1,
        "k": k,
        "probes": rows,
        "worst_vs_ideal": max(r["vs_ideal"] for r in rows.values()),
    }
    with open(os.path.join(REPO, "BENCH", "scale_probe.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
