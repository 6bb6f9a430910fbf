"""Benchmark harness — headline entropy-rollup throughput + scaling protocol.

Runs two workloads and prints ONE JSON line on the last stdout line:

1. **Headline pipeline** (the graft metric): deterministic synthetic
   token table (sources/tokens.synthesize_tokens — scale-free, no
   driver data) → z-norm → SampEn + PermEn per sequence → 3-tier
   retention cascade (raw → 1-min → 1-hour).  Run at TWO parallelism
   levels (local[N/4] and local[N]) on the SAME input; reports
   sequences/sec at both, scaling efficiency, and equality of the
   rolled-up tier fingerprints across levels (BASELINE.md protocol).
2. **Per-query timings** at $SPARK_GRAFT_SF_DIR (default sf0.1) for the
   driver-contract queries.

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32),
BENCH_N_DOCS (default 40000).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from eristropy_spark.operators.rollup import cascade, entropy_points  # noqa: E402
from eristropy_spark.runtime.session import get_spark  # noqa: E402
from eristropy_spark.sources.tokens import synthesize_tokens  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("BENCH_N_DOCS", "40000"))


def _tier_fingerprint(df) -> tuple[int, int]:
    """(rows, content hash) of a rollup tier — used for cross-parallelism
    equality.  Doubles are rounded to 9 dp before hashing so the check is
    about the rolled-up points, not bit-level aggregation order."""
    cols = [
        F.col("source"),
        F.col("bucket"),
        F.col("n_seq"),
        F.col("n_sampen"),
        F.round("sum_sampen", 9),
        F.round("avg_sampen", 9),
        F.round("avg_permen", 9),
    ]
    row = df.select(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64(*cols)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"] or 0)


def run_headline(cores: int) -> dict:
    spark = get_spark(app_name=f"bench-headline-{cores}", cores=cores)
    try:
        tokens = synthesize_tokens(spark, N_DOCS, seed=42, partitions=cores * 4)
        tokens = tokens.persist()
        n_seq = tokens.count()  # materialize input outside the timed window

        t0 = time.time()
        pts = entropy_points(tokens, m=2, r=0.2, normalize=True).persist()
        pts.count()  # materialize the raw tier once (≈ writing it to storage)
        tiers = cascade(pts)
        fps = {name: _tier_fingerprint(df) for name, df in tiers.items()}
        wall = time.time() - t0
        pts.unpersist()
        tokens.unpersist()
        return {
            "cores": cores,
            "n_seq": n_seq,
            "wall_sec": round(wall, 3),
            "seq_per_sec": round(n_seq / wall, 1),
            "tiers": {k: list(v) for k, v in fps.items()},
        }
    finally:
        spark.stop()


def run_queries(cores: int) -> dict[str, float]:
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench-queries", cores=cores)
    try:
        out = {}
        for name, fn in entrymod.queries().items():
            t0 = time.time()
            df = fn(spark, SF_DIR)
            n = df.count()
            out[name] = round(time.time() - t0, 3)
            _ = n
        return out
    finally:
        spark.stop()


def main() -> None:
    lo_cores = max(CPUS // 4, 1)
    lo = run_headline(lo_cores)
    hi = run_headline(CPUS)
    eff = (hi["seq_per_sec"] / lo["seq_per_sec"]) / (CPUS / lo_cores)
    tiers_equal = lo["tiers"] == hi["tiers"]

    queries = run_queries(CPUS)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    result = {
        "metric": "entropy_rollup_pipeline_wall_sec",
        "value": hi["wall_sec"],
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "headline": {
            "n_seq": hi["n_seq"],
            "seq_per_sec_loN": lo["seq_per_sec"],
            "seq_per_sec_hiN": hi["seq_per_sec"],
            "cores_loN": lo["cores"],
            "cores_hiN": hi["cores"],
            "scaling_efficiency": round(eff, 3),
            "tiers_equal_across_parallelism": tiers_equal,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
