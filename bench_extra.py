"""Targeted per-query timing + plan capture (guide §1.1/§1.4/§7.2).

NOT the frozen driver bench (bench.py) — a developer harness for the
optimization loop: time a named subset of declared queries with the
SAME consume methodology as bench.py (hash every column of every row),
best-of-N, cache cleared between reps, and optionally dump
``explain("formatted")`` per query for the plans/r06 artifacts.

Usage:
    python bench_extra.py [--reps 3] [--plan plans/r06 --suffix _before] \
        [--sf /root/testdata/sf0.1] query1 query2 ...
    python bench_extra.py --all          # every declared query once

Prints one line per query: name, best sec, all rep secs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SKIP = {"ngram_jaccard", "embed_dedup_exact", "dedup_clusters"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plan", default=None, help="dir to write explain output")
    ap.add_argument("--suffix", default="", help="plan file suffix, e.g. _before")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from eristropy_spark.runtime.session import get_spark

    spark = get_spark(app_name="bench-extra", cores=args.cores)
    qs = entrymod.queries()
    names = [n for n in qs if n not in SKIP] if args.all else args.queries
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}")
        sys.exit(1)

    if args.plan:
        os.makedirs(args.plan, exist_ok=True)

    out = {}
    for name in names:
        fn = qs[name]
        if args.plan:
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plan, f"{name}{args.suffix}.txt"), "w") as fh:
                fh.write(plan)
        reps = []
        for _ in range(max(1, args.reps)):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = fn(spark, args.sf)
            df.select(
                F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h")
            ).collect()
            reps.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        out[name] = min(reps)
        print(f"{name}: best={min(reps):.3f}s reps={reps}", flush=True)
    print(json.dumps({"best": out}))
    spark.stop()


if __name__ == "__main__":
    main()
