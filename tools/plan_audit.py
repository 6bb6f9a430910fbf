"""CLI wrapper for the physical-plan audit (eristropy_spark.plans.audit).

Run: python tools/plan_audit.py [sf_dir]
Exit 0 iff every structural plan check passes; failing checks dump the
offending executed plan.  PLANS.md records the audited claims.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from eristropy_spark.plans.audit import audit_checks  # noqa: E402
from eristropy_spark.runtime.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(cores=8)
    failed = False
    for name, ok, plan in audit_checks(spark, sf_dir):
        print(("PASS  " if ok else "FAIL  ") + name)
        if not ok:
            failed = True
            print("---- plan ----")
            print(plan[:4000])
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
