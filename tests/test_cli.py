"""CLI end-to-end smoke: spark-submit surface, checkpoint resume, windowed mode.

Runs the real entry point in a subprocess (its own SparkSession) so the
shared test fixture survives; asserts the emitted stage report, tier
outputs on disk, and that a re-run resumes from manifests.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=240):
    res = subprocess.run(
        [sys.executable, "-m", "eristropy_spark.cli.run_pipeline", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=timeout,
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"},
    )
    assert res.returncode == 0, res.stderr[-2000:]
    return json.loads(res.stdout[res.stdout.index("{") :]), res.stderr


def test_cli_run_resume_and_windowed(tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    base = [
        "--synthesize", "1500", "--output", out, "--checkpoint", ckpt,
        "--m", "1", "--gapfill", "locf",
    ]
    report, _err = _run(base)
    assert report["points"]["rows"] == 1500
    assert report["tier_1min"]["rows"] > 0
    assert report["gapfill_1min"]["rows"] >= report["tier_1min"]["rows"]
    assert os.path.isdir(os.path.join(out, "tier_1min"))
    assert os.path.isdir(os.path.join(out, "tier_1hour"))

    # second run resumes (manifest fingerprints match; recompute skipped)
    report2, err2 = _run(base)
    assert report2["points"]["rows"] == 1500
    assert "resuming" in err2.lower() or report2 == report

    # windowed mode: long sequences split into bounded windows
    out2, ckpt2 = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    report3, _ = _run(
        ["--synthesize", "800", "--output", out2, "--checkpoint", ckpt2,
         "--m", "1", "--window", "64", "--gapfill", "none"]
    )
    # 64-256-token synthetic sequences -> >= 1 window each, often more
    assert report3["points"]["rows"] > 800
