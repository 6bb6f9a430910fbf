"""Physical-plan audit: print and grep the plans the engine produces.

Checks, per SURVEY.md §4.2 / the 100 TB design rules:
* parquet scans show ReadSchema pruned to the referenced columns,
* filters reach the scan (PushedFilters),
* the small side of tpch_q3 is a BroadcastHashJoin,
* the entropy projection has exactly ONE ArrowEvalPython (fused UDF)
  and NO Exchange (zero-shuffle),
* the cascade's hour tier has no scan of raw data (reads the minute
  aggregate only).

Run: python tools/plan_audit.py [sf_dir]   (writes PLANS.md to stdout)
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from eristropy_spark.operators.entropy import compute_entropy  # noqa: E402
from eristropy_spark.operators.rollup import cascade, entropy_points  # noqa: E402
from eristropy_spark.runtime.session import get_spark  # noqa: E402
from eristropy_spark.sources.tokens import events_to_tokens, synthesize_tokens  # noqa: E402


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(cores=8)
    checks: list[tuple[str, bool, str]] = []

    # 1. column pruning + predicate pushdown on a filtered scan
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    q = ev.where(F.col("event_type") == "click").select("user_id", "value")
    p = plan_of(q)
    pushed = "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]" in p
    pruned = re.search(r"ReadSchema:.*user_id.*value", p) and "props" not in p.split("ReadSchema")[1][:200]
    checks.append(("filter pushed to parquet scan", pushed, p))
    checks.append(("scan schema pruned to referenced columns", bool(pruned), p))

    # 2. entropy projection: one fused ArrowEvalPython, zero Exchange
    tok = synthesize_tokens(spark, 1000, seed=1, partitions=8)
    pts = compute_entropy(tok, m=2, r=0.2, normalize=True)
    p = plan_of(pts)
    checks.append(("entropy: exactly one ArrowEvalPython", p.count("ArrowEvalPython") == 1, p))
    checks.append(("entropy: zero shuffles (no Exchange)", "Exchange" not in p, p))

    # 3. tokenize: single shuffle on the group key
    t = events_to_tokens(spark, sf_dir)
    p = plan_of(t)
    checks.append(("tokenize: exactly one Exchange (groupBy key)", p.count("Exchange") == 1, p))

    # 4. cascade hour tier reads the minute aggregate, not raw points twice
    pts2 = entropy_points(tok, m=2, r=0.2).persist()
    pts2.count()
    tiers = cascade(pts2)
    p = plan_of(tiers["1hour"])
    # the UDF may appear textually inside the InMemoryRelation's cached-plan
    # description; what matters is that execution reads the cache
    # (InMemoryTableScan) and never re-runs the UDF above it
    above_cache = p.split("InMemoryRelation")[0]
    checks.append(
        ("hour tier: merges minute aggregate from cache, no UDF re-run",
         p.count("HashAggregate") >= 4
         and "InMemoryTableScan" in p
         and "ArrowEvalPython" not in above_cache, p)
    )
    pts2.unpersist()

    # 5. tpch_q3: customer side broadcast
    import __spark_entry__ as entrymod

    q3 = entrymod.queries()["tpch_q3"](spark, sf_dir)
    p = plan_of(q3)
    checks.append(("tpch_q3: BroadcastHashJoin on customer dim", "BroadcastHashJoin" in p, p))

    # 6. semi-join planned as a (broadcast) left-semi hash join
    sj = entrymod.queries()["semi_join"](spark, sf_dir)
    p = plan_of(sj)
    checks.append(("semi_join: LeftSemi hash join", "LeftSemi" in p, p))

    failed = False
    for name, ok, plan in checks:
        print(("PASS  " if ok else "FAIL  ") + name)
        if not ok:
            failed = True
            print("---- plan ----")
            print(plan[:4000])
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
