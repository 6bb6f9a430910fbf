"""Co-located bucketed joins: the shuffle is paid at WRITE time, never
per join — plan-asserted, not just claimed."""

import numpy as np
from pyspark.sql import Row

from eristropy_spark.plans.audit import plan_of
from eristropy_spark.sources.catalog import TableCatalog


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    rng = np.random.default_rng(7)
    facts = spark.createDataFrame(
        [
            Row(doc_id=f"d{i}", n_tok=int(rng.integers(5, 50)), source="s")
            for i in range(500)
        ]
    )
    dims = spark.createDataFrame(
        [Row(doc_id=f"d{i}", lang="en" if i % 2 else "de") for i in range(500)]
    )
    cat = TableCatalog(spark, str(tmp_path / "wh"))
    t1 = cat.write_bucketed(facts, "db.facts_b", key="doc_id", buckets=8)
    t2 = cat.write_bucketed(dims, "db.dims_b", key="doc_id", buckets=8)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(t1).join(spark.table(t2), "doc_id")
        plan = plan_of(joined)
        # co-located: sort-merge join straight over the bucketed scans
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan[:3000]
        rows = joined.collect()
        assert len(rows) == 500
        assert all(r["lang"] in ("en", "de") for r in rows)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {t1}")
        spark.sql(f"DROP TABLE IF EXISTS {t2}")
