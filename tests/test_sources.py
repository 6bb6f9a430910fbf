"""Token-source tests: determinism, capping, quantization."""

from pyspark.sql import functions as F

from eristropy_spark.sources.tokens import events_to_tokens, synthesize_tokens


def _fingerprint(df):
    return df.select(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64("doc_id", "tokens", "n_tok", "source")).alias("h"),
    ).collect()[0]


def test_synthesize_deterministic_across_partitioning(spark):
    a = _fingerprint(synthesize_tokens(spark, 3000, seed=42, partitions=2))
    b = _fingerprint(synthesize_tokens(spark, 3000, seed=42, partitions=64))
    assert a == b


def test_synthesize_seed_sensitivity(spark):
    a = _fingerprint(synthesize_tokens(spark, 1000, seed=42))
    b = _fingerprint(synthesize_tokens(spark, 1000, seed=43))
    assert a != b


def test_synthesize_schema_and_bounds(spark):
    df = synthesize_tokens(spark, 500, seed=1, min_len=10, max_len=20, vocab=50)
    rows = df.collect()
    assert len(rows) == 500
    for r in rows:
        assert 10 <= r["n_tok"] <= 20
        assert len(r["tokens"]) == r["n_tok"]
        assert all(0 <= t < 50 for t in r["tokens"])
        assert r["source"].startswith("src")


def test_synthesize_source_skew(spark):
    # geometric split: src0 should dominate (~half the rows)
    counts = {
        r["source"]: r["count"]
        for r in synthesize_tokens(spark, 4000, seed=42).groupBy("source").count().collect()
    }
    assert counts["src0"] > counts.get("src1", 0) > counts.get("src2", 0)


def test_events_to_tokens_cap(spark):
    full = events_to_tokens(spark, "/root/testdata/sf0.001")
    capped = events_to_tokens(spark, "/root/testdata/sf0.001", max_tokens=5)
    assert capped.agg(F.max("n_tok")).collect()[0][0] <= 5
    # capping keeps the earliest tokens: prefix equality
    f = {r["doc_id"]: r["tokens"] for r in full.collect()}
    c = {r["doc_id"]: r["tokens"] for r in capped.collect()}
    for k in c:
        assert c[k] == f[k][: len(c[k])]
