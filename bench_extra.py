#!/usr/bin/env python3
"""Per-query isolation harness for the optimization rounds (guide §1.4).

NOT the driver bench (bench.py is frozen): this times individual
queries with the noop sink in a fresh session, best-of-N, and dumps
`.explain("formatted")` to plans/r06/ for the plan-diff evidence.

Usage:
  python bench_extra.py q56_dup_spans q32_dedup_clusters      # time
  python bench_extra.py --explain q56_dup_spans               # plan only
  python bench_extra.py --suffix after --explain q56_dup_spans
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--suffix", default=None, help="plans/r06/<q>_<suffix>.txt")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    from toyocr_spark import queries as q
    from toyocr_spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", app_name="bench-extra", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    fns = q.queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # warm-up: scan + shuffle machinery on a cheap query
    force(fns["q01_scan_agg"](spark, SF_DIR))

    out = {}
    for name in args.names:
        fn = fns[name]
        if args.suffix:
            import contextlib
            import io

            os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, SF_DIR).explain("formatted")
            path = os.path.join(REPO, "plans", "r06", f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {path}", file=sys.stderr)
        if args.explain and not args.suffix:
            fn(spark, SF_DIR).explain("formatted")
        if not args.explain:
            spark.sparkContext.setJobDescription(name)
            wall = float("inf")
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                force(fn(spark, SF_DIR))
                wall = min(wall, time.perf_counter() - t0)
            out[name] = round(wall, 3)
            print(f"  {name}: {out[name]:.3f}s", file=sys.stderr)
    if out:
        print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
