"""Benchmark-decontamination operator tests (planted overlaps)."""

import pytest
from pyspark.sql import Row

from eristropy_spark.operators.decontam import ngram_overlap_decontaminate


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_planted_13gram_contamination(spark):
    """A corpus doc embedding a verbatim 13-word benchmark span is
    flagged; unrelated docs are not; counts match the planted overlap."""
    span = " ".join(f"w{i}" for i in range(13))
    bench = spark.createDataFrame(
        [Row(doc_id="b0", text=f"intro {span} outro")]
    )
    corpus = spark.createDataFrame(
        [
            # contains the span shifted by one word -> shares exactly
            # the one full 13-gram plus none other
            Row(doc_id="dirty", text=f"pad {span} tail tail2"),
            Row(doc_id="clean", text=" ".join(f"z{i}" for i in range(20))),
        ]
    )
    out = _rows(ngram_overlap_decontaminate(corpus, bench, n=13))
    assert out["dirty"]["contaminated"] is True
    assert out["dirty"]["n_contaminated"] == 1
    assert out["clean"]["contaminated"] is False
    assert out["clean"]["n_contaminated"] == 0
    # every corpus doc gets a row, flagged or not
    assert set(out) == {"dirty", "clean"}


def test_short_doc_whole_text_fallback(spark):
    """Docs shorter than n words contribute ONE whole-text gram (the
    dedup._combine_grams convention): a short doc equal to a short
    benchmark doc is contaminated; a partial prefix is not."""
    bench = spark.createDataFrame([Row(doc_id="b0", text="a b c")])
    corpus = spark.createDataFrame(
        [
            Row(doc_id="same", text="a b c"),
            Row(doc_id="prefix", text="a b"),
        ]
    )
    out = _rows(ngram_overlap_decontaminate(corpus, bench, n=13))
    assert out["same"]["contaminated"] is True
    assert out["prefix"]["contaminated"] is False
    assert out["same"]["n_grams"] == 1


def test_min_hits_threshold_and_counts(spark):
    """min_hits raises the flag bar; n_contaminated counts DISTINCT
    shared grams (repeats inside one doc count once)."""
    bench = spark.createDataFrame([Row(doc_id="b0", text="x y x y x y")])
    # corpus doc shares the 2-grams "x y" and "y x" (each appearing
    # multiple times -> still 2 distinct shared grams)
    corpus = spark.createDataFrame([Row(doc_id="d0", text="x y x y")])
    one = _rows(ngram_overlap_decontaminate(corpus, bench, n=2))
    assert one["d0"]["n_contaminated"] == 2
    assert one["d0"]["contaminated"] is True
    three = _rows(
        ngram_overlap_decontaminate(corpus, bench, n=2, min_hits=3)
    )
    assert three["d0"]["n_contaminated"] == 2
    assert three["d0"]["contaminated"] is False


def test_case_insensitive_and_shuffle_path_parity(spark):
    """Matching is case-insensitive (lower() both sides), and the
    non-broadcast semi-join fallback returns identical results."""
    bench = spark.createDataFrame([Row(doc_id="b0", text="The Quick Fox")])
    corpus = spark.createDataFrame(
        [Row(doc_id="d0", text="the quick fox"), Row(doc_id="d1", text="dog")]
    )
    a = _rows(ngram_overlap_decontaminate(corpus, bench, n=3))
    b = _rows(
        ngram_overlap_decontaminate(
            corpus, bench, n=3, broadcast_benchmark=False
        )
    )
    assert a == b
    assert a["d0"]["contaminated"] is True
    assert a["d1"]["contaminated"] is False


def test_validation(spark):
    df = spark.createDataFrame([Row(doc_id="d", text="a")])
    with pytest.raises(ValueError, match="n must be"):
        ngram_overlap_decontaminate(df, df, n=0)
    with pytest.raises(ValueError, match="min_hits"):
        ngram_overlap_decontaminate(df, df, min_hits=0)


def test_broadcast_in_plan(spark):
    """The benchmark probe must be a broadcast hash join (no shuffle of
    corpus grams) on the default path."""
    bench = spark.createDataFrame([Row(doc_id="b0", text="a b c d")])
    corpus = spark.createDataFrame([Row(doc_id="d0", text="a b c d e")])
    plan = (
        ngram_overlap_decontaminate(corpus, bench, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------- scrub_pii


def test_scrub_pii_categories_and_order(spark):
    """Each category redacts with its sentinel; counts are mutually
    exclusive in application order (an email's digits never re-count
    as phone/IP); clean docs pass through byte-identical."""
    from eristropy_spark.operators.text import scrub_pii

    rows = [
        Row(doc_id=0, text="contact bob@example.com or call 555-123-4567 now"),
        Row(doc_id=1, text="ssn 123-45-6789 ip 10.0.0.1 end"),
        Row(doc_id=2, text="plain words only"),
        Row(doc_id=3, text="dots 555.123.4567 and not-a-ssn 12-34-5678"),
    ]
    out = {r["doc_id"]: r.asDict() for r in scrub_pii(
        spark.createDataFrame(rows)).collect()}
    assert out[0]["n_email"] == 1 and out[0]["n_phone"] == 1
    assert out[0]["clean_text"] == "contact |||EMAIL||| or call |||PHONE||| now"
    assert out[1]["n_ssn"] == 1 and out[1]["n_ip"] == 1
    assert out[1]["clean_text"] == "ssn |||SSN||| ip |||IP||| end"
    assert out[2]["n_pii"] == 0
    assert out[2]["clean_text"] == "plain words only"
    assert out[3]["n_phone"] == 1 and out[3]["n_ssn"] == 0
    assert all(
        r["n_pii"] == r["n_email"] + r["n_ssn"] + r["n_phone"] + r["n_ip"]
        for r in out.values()
    )


def test_scrub_pii_is_pure_codegen(spark):
    """No Python workers, no shuffle: the plan must be a single
    WholeStageCodegen project over the scan (the 100 TB shape)."""
    from eristropy_spark.operators.text import scrub_pii

    df = spark.createDataFrame([Row(doc_id=0, text="a@b.co x")])
    plan = scrub_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
