"""Physical-plan audit as a pytest — the 100 TB design rules stay
enforced in CI, not just in the tools/ CLI."""

from eristropy_spark.plans.audit import audit_checks

SF_DIR = "/root/testdata/sf0.001"


def test_all_plan_checks_pass(spark):
    failures = [
        (name, plan[:2000])
        for name, ok, plan in audit_checks(spark, SF_DIR)
        if not ok
    ]
    assert not failures, [f[0] for f in failures]
