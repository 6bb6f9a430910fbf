"""End-to-end entropy-rollup pipeline CLI (spark-submit entry point).

Launch (cluster):
    spark-submit --py-files eristropy_spark.zip \
        eristropy_spark/cli/run_pipeline.py \
        --input /data/tokens --output /data/rollups --checkpoint /data/ckpt

Launch (local dev):
    python -m eristropy_spark.cli.run_pipeline --synthesize 10000 \
        --output /tmp/rollups --checkpoint /tmp/ckpt

Stages (each checkpointed + resumable via manifest fingerprints):
    1. tokens      — load the Iceberg/parquet token table, or synthesize
    2. stationary  — optional difference/detrend + ADF filter
    3. points      — SampEn + PermEn per sequence (raw tier)
    4. tier_1min / tier_1hour — retention cascade
    5. gapfill     — LOCF-filled 1-min tier

Re-running with the same inputs resumes from the manifests; pass
``--force`` to recompute.  Per-stage rows/sec and per-partition lineage
land in ``<checkpoint>/<stage>.manifest.json``.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="eristropy-spark entropy rollup pipeline")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="token table path (parquet dir) or Iceberg table")
    src.add_argument(
        "--synthesize", type=int, metavar="N_DOCS",
        help="generate a deterministic synthetic token table of N docs",
    )
    p.add_argument("--output", required=True, help="output directory for tier tables")
    p.add_argument("--checkpoint", required=True, help="checkpoint manifest directory")
    p.add_argument("--m", type=int, default=2)
    p.add_argument("--r", type=float, default=0.2)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--stationarity", choices=["none", "difference", "detrend-lr"],
                   default="none")
    p.add_argument("--salt", type=int, default=0,
                   help="salt buckets for skewed sources (0 = rely on AQE)")
    p.add_argument("--window", type=int, default=0,
                   help="windowed entropy: split sequences into fixed "
                        "windows of this many tokens (bounds per-task "
                        "cost for long sequences; 0 = whole-sequence)")
    p.add_argument("--dt", type=float, default=1.0,
                   help="seconds per token for windowed mode: window w "
                        "is stamped first_ts + w*window*dt so long "
                        "sequences spread across retention buckets")
    p.add_argument("--gapfill", choices=["none", "locf", "linear"], default="locf")
    p.add_argument("--cores", type=int, default=None)
    p.add_argument("--force", action="store_true", help="ignore checkpoints")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from eristropy_spark.operators.gapfill import gapfill_linear, gapfill_locf
    from eristropy_spark.operators.rollup import cascade, entropy_points
    from eristropy_spark.operators.stationarity import make_stationary
    from eristropy_spark.runtime.checkpoint import CheckpointManager
    from eristropy_spark.runtime.session import get_spark
    from eristropy_spark.sources.tokens import load_tokens, synthesize_tokens

    spark = get_spark(app_name="eristropy-pipeline", cores=args.cores)
    cm = CheckpointManager(args.checkpoint)
    run_fp = (
        f"v1|in={args.input or f'synth:{args.synthesize}'}|m={args.m}|r={args.r}"
        f"|seed={args.seed}|st={args.stationarity}|salt={args.salt}"
        f"|win={args.window}|dt={args.dt}"
        + ("|force" if args.force else "")
    )

    if args.synthesize:
        tokens = synthesize_tokens(spark, args.synthesize, seed=args.seed)
    else:
        tokens = load_tokens(spark, args.input)

    stat_res = None
    if args.stationarity != "none":
        method = "difference" if args.stationarity == "difference" else "detrend"
        stat_res = make_stationary(
            tokens, method=method, detrend_type="lr", random_seed=args.seed
        )
        tokens = stat_res.df
        print(f"stationary fraction: {stat_res.stationary_frac:.3f}", file=sys.stderr)

    if args.window:
        # windowed raw tier: each window carries its REAL timestamp
        # (first_ts + window_id*window*dt), so a long sequence's points
        # land across retention buckets instead of stacking in one
        from eristropy_spark.operators.windowed import windowed_entropy

        def _points():
            return windowed_entropy(
                tokens, window=args.window, m=args.m, r=args.r,
                normalize=True, keep_cols=("source",),
                ts_col="first_ts", dt=args.dt,
            )

    else:
        def _points():
            return entropy_points(tokens, m=args.m, r=args.r, normalize=True)

    pts = cm.run_stage(spark, "points", run_fp, _points)
    if stat_res is not None:
        # the points stage is published to parquet (run_stage reads it
        # back), so the fused transform+ADF cache is no longer needed
        stat_res.release()

    tiers = cascade(pts, salt=args.salt or None)
    tier_dfs = {}
    prev_name = "points"
    for name, df in tiers.items():
        tier_dfs[name] = cm.run_stage(spark, f"tier_{name}", run_fp, lambda d=df: d)
        prev_name = name

    if args.gapfill != "none":
        fill = gapfill_locf if args.gapfill == "locf" else gapfill_linear
        cm.run_stage(
            spark, "gapfill_1min", run_fp,
            lambda: fill(tier_dfs["1min"], "1 minute", ("avg_sampen", "avg_permen")),
        )

    # publish tier tables to the output location (final, user-facing copy;
    # the checkpoint dir holds the resumable intermediates)
    for name, df in tier_dfs.items():
        df.write.mode("overwrite").parquet(f"{args.output}/tier_{name}")

    report = {
        stage: {
            k: m[k] for k in ("rows", "wall_sec", "rows_per_sec")
        }
        for stage in ("points", "tier_1min", "tier_1hour", "gapfill_1min")
        if (m := cm.manifest(stage)) is not None
    }
    print(json.dumps(report, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
