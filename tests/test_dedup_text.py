"""Dedup / text-analysis / similarity / multimodal operator tests."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from eristropy_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    word_shingles,
)
from eristropy_spark.operators.multimodal import (
    documents_to_assets,
    extract_features,
)
from eristropy_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
)
from eristropy_spark.operators.text import lang_id, quality_score, text_stats

WORDS = (
    "spark group query row data slow small filter customer line the batch "
    "value scan join order sort table merge part window hash key fast"
).split()


def _docs_df(spark, with_dups=True):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(30):
        text = " ".join(rng.choice(WORDS, size=40))
        rows.append(Row(doc_id=i, text=text, lang="en", source="s0", n_chars=len(text)))
    if with_dups:
        # exact duplicate of doc 0 and a near-duplicate of doc 1 (one word changed)
        rows.append(Row(doc_id=100, text=rows[0].text, lang="en", source="s0",
                        n_chars=len(rows[0].text)))
        words1 = rows[1].text.split(" ")
        words1[20] = "changed"
        near = " ".join(words1)
        rows.append(Row(doc_id=101, text=near, lang="en", source="s0", n_chars=len(near)))
    return spark.createDataFrame(rows)


def test_exact_dedup(spark):
    out = exact_dedup(_docs_df(spark)).collect()
    dup_groups = [r for r in out if r["n_dups"] > 1]
    assert len(dup_groups) == 1
    assert dup_groups[0]["keep_id"] == 0 and dup_groups[0]["n_dups"] == 2
    assert len(out) == 31  # 32 docs, one merged pair


def test_ngram_jaccard_finds_near_dup(spark):
    pairs = ngram_jaccard_pairs(_docs_df(spark), n=3, threshold=0.6).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs}
    assert (0, 100) in got and got[(0, 100)] == 1.0  # exact dup
    assert (1, 101) in got and 0.6 <= got[(1, 101)] < 1.0  # near dup
    # unrelated random docs don't pair at 0.6
    assert all(a in (0, 1) or a > 99 for a, b in got)


def test_minhash_lsh_recall_vs_exact(spark):
    docs = _docs_df(spark)
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.6).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, k=64, bands=16, n=3, threshold=0.6).collect()
    }
    # LSH output is a subset of exact pairs with identical jaccard values,
    # and at J >= 0.6 with 16x4 banding recall should be total here
    assert set(lsh) == set(exact)
    for k in lsh:
        assert lsh[k] == exact[k]


def test_simhash_pairs(spark):
    pairs = simhash_pairs(_docs_df(spark), max_hamming=3).collect()
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs}
    assert got.get((0, 100)) == 0  # identical text => identical simhash
    # every returned pair respects the bound
    assert all(h <= 3 for h in got.values())


def _simhash_local(text, seed=17, n=2):
    """Reference brute-force SimHash mirroring make_simhash_udf."""
    from eristropy_spark.operators.dedup import _mix64, _shingle_hashes

    hashes = _mix64(_shingle_hashes(text, n), seed)
    bits = (
        (hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
    ).astype(np.int64)
    vote = (2 * bits - 1).sum(axis=0)
    sim = np.uint64(0)
    for b in range(64):
        if vote[b] > 0:
            sim |= np.uint64(1) << np.uint64(b)
    return int(sim.astype(np.int64))


def test_simhash_exact_recall_at_hamming_4_to_8(spark):
    """Round-1 bug: fixed 4x16 banding only guaranteed recall at Hamming
    <= 3; with bands = max_hamming + 1 the candidate stage must find
    EVERY pair at distance <= 8 (pigeonhole), matching brute force."""
    rng = np.random.default_rng(5)
    size = 200  # long docs + small perturbations land pairs at Hamming 2..9
    base = list(rng.choice(WORDS, size=size))
    rows = []
    for i in range(25):
        words = list(base)
        for j in rng.choice(size, size=min(i, 12), replace=False):
            words[j] = WORDS[int(rng.integers(len(WORDS)))]
        text = " ".join(words)
        rows.append(Row(doc_id=i, text=text, lang="en", source="s0", n_chars=len(text)))
    docs = spark.createDataFrame(rows)

    sims = {r.doc_id: _simhash_local(r.text) for r in rows}
    want = {}
    for a in sims:
        for b in sims:
            if a < b:
                h = bin((sims[a] ^ sims[b]) & ((1 << 64) - 1)).count("1")
                if h <= 8:
                    want[(a, b)] = h
    # the crafted corpus must actually exercise the 4..8 window
    assert any(4 <= h <= 8 for h in want.values()), sorted(want.values())

    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_pairs(docs, max_hamming=8).collect()
    }
    assert got == want


def test_short_docs_do_not_crash_shingle_paths(spark):
    """Docs with < n words used to throw INVALID_PARAMETER_VALUE.START
    via sequence(1, 0); they must simply contribute no shingles."""
    rows = [
        Row(doc_id=0, text="one", lang="en", source="s", n_chars=3),
        Row(doc_id=1, text="two words", lang="en", source="s", n_chars=9),
        Row(doc_id=2, text="the quick brown fox jumps", lang="en", source="s", n_chars=25),
        Row(doc_id=3, text="the quick brown fox leaps", lang="en", source="s", n_chars=25),
    ]
    docs = spark.createDataFrame(rows)
    assert {r["doc_id"] for r in word_shingles(docs, 3).collect()} == {2, 3}
    jac = ngram_jaccard_pairs(docs, n=3, threshold=0.2).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in jac} == {(2, 3)}
    lsh = minhash_lsh_pairs(docs, k=64, bands=16, n=3, threshold=0.2).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in lsh} == {(2, 3)}


def test_word_shingles_count(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a b c d e", lang="en", source="s", n_chars=9)]
    )
    out = word_shingles(docs, n=3).collect()
    assert sorted(r["shingle"] for r in out) == ["a b c", "b c d", "c d e"]


# ----------------------------------------------------------------- text


def test_text_stats_basic(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="the cat and the hat!", lang="en", source="s", n_chars=20)]
    )
    r = text_stats(docs).collect()[0]
    assert r["n_words"] == 5
    assert r["n_bpe_tokens"] == 6  # 5 words + '!'
    assert r["stopword_ratio"] == pytest.approx(3 / 5)  # the, and, the
    assert r["punct_ratio"] == pytest.approx(1 / 20)


def test_quality_score_range(spark):
    out = quality_score(_docs_df(spark)).collect()
    assert all(0.0 <= r["quality"] <= 1.0 for r in out)


def test_lang_id_deterministic(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat and the hat with style", lang="en", source="s", n_chars=30),
            Row(doc_id=2, text="el perro que ladra la noche", lang="es", source="s", n_chars=27),
        ]
    )
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs).collect()}
    assert got[1] == "en"
    assert got[2] == "es"


# ------------------------------------------------------------ similarity


def _emb_df(spark, n=40, dim=8):
    rng = np.random.default_rng(11)
    rows = [
        Row(vec_id=i, embedding=[float(v) for v in rng.normal(size=dim)], label=i % 3)
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


def test_cosine_topk_bruteforce_matches_numpy(spark):
    emb = _emb_df(spark)
    got = cosine_topk_bruteforce(emb, query_ids=[0, 1], k=3).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()}
    for q in (0, 1):
        sims = {
            j: float(vecs[q] @ v / (np.linalg.norm(vecs[q]) * np.linalg.norm(v)))
            for j, v in vecs.items()
            if j != q
        }
        want = sorted(sims, key=lambda j: (-round(sims[j], 6), j))[:3]
        rows = sorted((r for r in got if r["query_id"] == q), key=lambda r: r["rank"])
        assert [r["neighbor_id"] for r in rows] == want


def test_cosine_topk_lsh_reasonable_recall(spark):
    emb = _emb_df(spark, n=60)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_bruteforce(emb, [0, 1, 2], k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_lsh(emb, [0, 1, 2], k=3, n_bits=4, n_tables=12).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 2 / 3  # probabilistic but stable under the fixed seed


# ------------------------------------------------------------ multimodal


def test_multimodal_plumbing(spark):
    assets = documents_to_assets(_docs_df(spark, with_dups=False))
    feats = extract_features(assets, fake_decode=True)
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        assert r["n_bytes"] > 0
        assert len(r["feature"]) == 16
        if r["kind"] == "image":
            assert r["n_frames"] == 1 and r["width"] >= 16
        if r["kind"] == "audio":
            assert r["width"] == 0 and r["n_frames"] >= 1000


def test_multimodal_decode_deterministic(spark):
    assets = documents_to_assets(_docs_df(spark, with_dups=False))
    a = extract_features(assets).orderBy("asset_id").collect()
    b = extract_features(assets.repartition(7)).orderBy("asset_id").collect()
    assert a == b


def test_multimodal_real_decode_stubbed():
    from eristropy_spark.operators.multimodal import decode_payload

    with pytest.raises(NotImplementedError):
        decode_payload(b"bytes", "image", fake_decode=False)


def test_simhash_large_h_warns_small_h_does_not(spark, docs_df=None):
    import warnings

    import pytest

    from eristropy_spark.operators.dedup import simhash_pairs

    docs = spark.createDataFrame(
        [("d1", "a b c d e f"), ("d2", "a b c d e g")], ["doc_id", "text"]
    )
    with pytest.warns(RuntimeWarning, match="max_hamming"):
        simhash_pairs(docs, max_hamming=8)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        simhash_pairs(docs, max_hamming=3)  # plan-build only; no warning
        # explicit opt-in silences the guard (the contract's sf0.01 h=8)
        simhash_pairs(docs, max_hamming=8, allow_large_h=True)


def test_shingle_hashes_batch_matches_single():
    import numpy as np

    from eristropy_spark.operators.dedup import (
        _shingle_hashes,
        _shingle_hashes_batch,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "one two",
        "solo",
        "",
        "the quick brown fox",
    ]
    batch = _shingle_hashes_batch(texts, 3)
    for t, got in zip(texts, batch):
        want = _shingle_hashes(t, 3) if t else np.empty(0, dtype=np.uint64)
        assert np.array_equal(got, want), t
    # order-sensitivity: reversed word order is a different shingle set
    a = _shingle_hashes("a b c", 3)
    b = _shingle_hashes("c b a", 3)
    assert not np.array_equal(a, b)


def _wav_bytes(n_frames=800, freq=5):
    """A real in-memory WAV file (stdlib wave) for the real-decode path."""
    import io
    import math
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        frames = b"".join(
            int(12000 * math.sin(2 * math.pi * freq * i / 8000)).to_bytes(
                2, "little", signed=True
            )
            for i in range(n_frames)
        )
        wf.writeframes(frames)
    return buf.getvalue()


def test_multimodal_real_audio_decode():
    """The audio real path decodes an actual WAV through stdlib wave."""
    from eristropy_spark.operators.multimodal import decode_payload

    payload = _wav_bytes(n_frames=800)
    d = decode_payload(payload, "audio", fake_decode=False)
    assert d["n_frames"] == 800
    assert d["width"] == 0 and d["height"] == 0
    assert len(d["feature"]) == 16
    assert abs(float(np.sum(d["feature"])) - 1.0) < 1e-6  # normalized hist
    # deterministic
    d2 = decode_payload(payload, "audio", fake_decode=False)
    assert d2["n_frames"] == d["n_frames"]
    assert np.array_equal(d2["feature"], d["feature"])


def test_multimodal_real_image_decode_via_probe(monkeypatch):
    """Probe monkeypatched to a PIL-shaped stub: real path exercised."""
    from eristropy_spark.operators import multimodal

    class _Img:
        size = (32, 24)
        n_frames = 1

        def convert(self, _mode):
            return self

        def tobytes(self):
            return bytes(range(256)) * 3  # 768 "pixels"

    class _ImageMod:
        @staticmethod
        def open(_buf):
            return _Img()

    monkeypatch.setattr(multimodal, "_probe_image_lib", lambda: _ImageMod)
    d = multimodal.decode_payload(b"fake-png-bytes", "image", fake_decode=False)
    assert (d["width"], d["height"], d["n_frames"]) == (32, 24, 1)
    assert len(d["feature"]) == 16
    # uniform bytes 0..255 -> uniform 16-bin histogram
    assert np.allclose(d["feature"], 1.0 / 16)

    monkeypatch.setattr(multimodal, "_probe_image_lib", lambda: None)
    with pytest.raises(NotImplementedError, match="PIL"):
        multimodal.decode_payload(b"fake-png-bytes", "image", fake_decode=False)


def test_multimodal_video_real_always_stubbed():
    from eristropy_spark.operators.multimodal import decode_payload

    with pytest.raises(NotImplementedError, match="video"):
        decode_payload(b"bytes", "video", fake_decode=False)


def test_multimodal_auto_mode_falls_back_to_fake(spark, monkeypatch):
    """mode='auto' degrades gracefully everywhere in THIS sandbox: no
    PIL -> image/video probe to fake; audio probes real (stdlib wave)
    but every synthetic payload is non-WAV, so each one falls back to
    fake per-payload instead of killing the job — auto == fake exactly."""
    docs = _docs_df(spark, with_dups=False)
    assets = documents_to_assets(docs)
    auto = extract_features(assets, mode="auto").orderBy("asset_id").collect()
    fake = extract_features(assets, mode="fake").orderBy("asset_id").collect()
    assert auto == fake
    assert {r["kind"] for r in auto} == {"image", "audio", "video"}


def test_multimodal_unknown_kind(spark):
    """Kinds without a decoder: fake/auto produce fake features (the
    pre-round-3 behavior); real mode raises clearly."""
    from pyspark.sql import functions as F

    assets = documents_to_assets(_docs_df(spark, with_dups=False)).limit(
        3
    ).withColumn("kind", F.lit("pdf"))
    for mode in ("fake", "auto"):
        rows = extract_features(assets, mode=mode).collect()
        assert len(rows) == 3 and all(len(r["feature"]) == 16 for r in rows)
    with pytest.raises(Exception, match="kind='pdf'"):
        extract_features(assets, mode="real").collect()


def test_shingle_width_validated():
    from eristropy_spark.operators.dedup import (
        make_minhash_udf,
        make_simhash_udf,
    )

    with pytest.raises(ValueError, match="shingle width"):
        make_minhash_udf(n=65)
    with pytest.raises(ValueError, match="shingle width"):
        make_simhash_udf(n=0)


def test_multimodal_mode_validation(spark):
    assets = documents_to_assets(_docs_df(spark, with_dups=False))
    with pytest.raises(ValueError, match="mode"):
        extract_features(assets, mode="bogus")


def _make_y4m(w, h, n_frames, colorspace=b"C420jpeg", luma=None):
    """Build a real YUV4MPEG2 payload in memory."""
    import numpy as np

    header = b"YUV4MPEG2 W%d H%d F30:1 Ip A1:1 %s\n" % (w, h, colorspace)
    cs = colorspace[1:].decode()
    if cs.startswith("420"):
        chroma = 2 * ((w // 2) * (h // 2))
    elif cs.startswith("mono"):
        chroma = 0
    else:
        raise ValueError(cs)
    frames = b""
    for f in range(n_frames):
        y = (
            np.full(w * h, luma, dtype=np.uint8)
            if luma is not None
            else ((np.arange(w * h) + 17 * f) % 256).astype(np.uint8)
        )
        frames += b"FRAME\n" + y.tobytes() + bytes(chroma)
    return header + frames


def test_multimodal_video_y4m_real_decode():
    """Real (not fake) video decode of an uncompressed Y4M payload:
    metadata from the header, frame count from the stream, feature =
    luma histogram across frames."""
    from eristropy_spark.operators.multimodal import decode_payload

    payload = _make_y4m(16, 8, 3, luma=10)  # all luma in bin 0 (10<16)
    d = decode_payload(payload, "video", fake_decode=False)
    assert (d["width"], d["height"], d["n_frames"]) == (16, 8, 3)
    assert d["n_bytes"] == len(payload)
    assert d["feature"][0] == 1.0 and d["feature"][1:].sum() == 0.0
    # deterministic
    d2 = decode_payload(payload, "video", fake_decode=False)
    assert (d2["feature"] == d["feature"]).all()
    # mono colorspace (no chroma planes)
    m = decode_payload(
        _make_y4m(4, 4, 2, colorspace=b"Cmono", luma=255), "video",
        fake_decode=False,
    )
    assert (m["width"], m["height"], m["n_frames"]) == (4, 4, 2)
    assert m["feature"][-1] == 1.0


def test_multimodal_video_y4m_rejects_corrupt():
    from eristropy_spark.operators.multimodal import decode_payload

    good = _make_y4m(16, 8, 2)
    with pytest.raises(ValueError, match="truncated"):
        decode_payload(good[:-10], "video", fake_decode=False)
    # non-Y4M container still raises the honest stub error
    with pytest.raises(NotImplementedError, match="video"):
        decode_payload(b"\x00\x00\x01\xba mpeg-ps", "video", fake_decode=False)


def test_multimodal_video_y4m_through_spark_real_mode(spark):
    """mode='real' end-to-end through mapInPandas on Y4M payloads —
    the video plumbing is real on the worker, not just in-process."""
    from pyspark.sql import Row

    from eristropy_spark.operators.multimodal import extract_features

    rows = [
        Row(asset_id=f"v{i}", kind="video",
            payload=bytearray(_make_y4m(8 + 8 * i, 8, 1 + i)))
        for i in range(3)
    ]
    assets = spark.createDataFrame(
        rows, "asset_id string, kind string, payload binary"
    )
    got = {
        r["asset_id"]: (r["width"], r["height"], r["n_frames"])
        for r in extract_features(assets, mode="real").collect()
    }
    assert got == {"v0": (8, 8, 1), "v1": (16, 8, 2), "v2": (24, 8, 3)}


def test_minhash_hot_bucket_cap(spark):
    """A degenerate corpus slice (many identical boilerplate docs) fills
    one band-bucket; the stop-list drops it BEFORE the self-join so the
    O(members²) candidate blowup never materializes — while real
    near-dup pairs elsewhere in the corpus are still found, and (here)
    outputs are identical with and without the cap because degenerate
    members still collide in their other bands."""
    from eristropy_spark.operators.dedup import minhash_lsh_pairs

    rows = [Row(doc_id=i, text="common boilerplate header text") for i in range(60)]
    rows += [
        Row(doc_id=100, text="the quick brown fox jumps over the lazy dog today"),
        Row(doc_id=101, text="the quick brown fox jumps over the lazy dog now"),
        Row(doc_id=102, text="completely unrelated content about spark plans"),
    ]
    docs = spark.createDataFrame(rows)
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(
            docs, k=64, bands=16, n=3, threshold=0.5, max_bucket_size=10
        ).collect()
    }
    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(
            docs, k=64, bands=16, n=3, threshold=0.5, max_bucket_size=None
        ).collect()
    }
    assert (100, 101) in capped
    # identical boilerplate docs are EXACT dups (Jaccard 1.0): with the
    # cap their bucket is dropped in every band, so they vanish from the
    # near-dup output (exact_dedup's job anyway); without the cap they
    # all pair up quadratically
    assert all(a >= 100 for a, b in capped)
    assert {(a, b) for a, b in uncapped if a >= 100} == {
        p for p in capped if p[0] >= 100
    }
    assert len(uncapped) - len(capped) == 60 * 59 // 2
    import pytest

    with pytest.raises(ValueError, match="max_bucket_size"):
        minhash_lsh_pairs(docs, max_bucket_size=0).collect()


def test_gopher_filters_signals_and_verdict(spark):
    """Crafted documents exercise each Gopher rule: a clean passing doc,
    too-short, symbol-heavy, non-alphabetic, stopword-free, and
    duplicate-line docs each fail exactly the intended signal."""
    from eristropy_spark.operators.text import gopher_filters

    good = ("the quick brown fox jumps over the lazy dog and then "
            "runs on with great speed to the nearby forest in a "
            "calm morning while the birds sing for everyone around "
            "here today because nature is lovely and the air is "
            "fresh and clear for all of us to enjoy in peace") # >50 words
    rows = [
        Row(doc_id=1, text=good, lang="en", source="s", n_chars=len(good)),
        Row(doc_id=2, text="too short for the rules and the filter",
            lang="en", source="s", n_chars=10),
        Row(doc_id=3, text=good + " " + "### ### ### ### ### ### ### ### "
            "### ### ### ### ### ### ### ###", lang="en", source="s",
            n_chars=10),
        Row(doc_id=4, text=" ".join(["12345"] * 60), lang="en",
            source="s", n_chars=10),
        Row(doc_id=5, text=" ".join(["zebra"] * 60), lang="en",
            source="s", n_chars=10),
        Row(doc_id=6, text="\n".join(["the cat sat on a mat for fun"] * 10)
            + "\n" + good, lang="en", source="s", n_chars=10),
    ]
    out = {
        r["doc_id"]: r
        for r in gopher_filters(spark.createDataFrame(rows)).collect()
    }
    assert out[1]["passes_gopher"] is True
    assert out[2]["n_words"] < 50 and out[2]["passes_gopher"] is False
    assert out[3]["symbol_word_ratio"] > 0.1 and not out[3]["passes_gopher"]
    assert out[4]["alpha_word_frac"] == 0.0 and not out[4]["passes_gopher"]
    assert out[5]["stop_hits"] == 0 and not out[5]["passes_gopher"]
    assert out[6]["dup_line_frac"] > 0.3 and not out[6]["passes_gopher"]
    # single-line docs have duplicate-line fraction exactly 0
    assert out[1]["dup_line_frac"] == 0.0


def test_c4_line_clean_semantics(spark):
    """Each C4 rule exercised: terminal punctuation, 5-word minimum,
    javascript stop-word, lorem-ipsum and curly-brace page drops, and
    the cleaned text itself."""
    from eristropy_spark.operators.text import c4_line_clean

    good3 = ("the cat sat on the mat.\n"
             "a dog ran over the hill!\n"
             'she said "come back here now."')
    rows = [
        Row(doc_id=1, text=good3),
        Row(doc_id=2, text="no punctuation here at all\nshort line."),
        Row(doc_id=3, text=good3 + "\nenable javascript to see this page."),
        Row(doc_id=4, text=good3.replace("dog", "lorem ipsum")),
        Row(doc_id=5, text=good3 + "\nvar x = {a: 1} is code."),
    ]
    out = {
        r["doc_id"]: r
        for r in c4_line_clean(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert out[1]["passes_c4"] and out[1]["n_kept_lines"] == 3
    assert out[1]["clean_text"] == good3
    # doc 2: line 1 lacks punctuation, line 2 has < 5 words
    assert out[2]["n_kept_lines"] == 0 and out[2]["clean_text"] == ""
    assert not out[2]["passes_c4"]
    # javascript line dropped, doc still passes on its other 3 lines
    assert out[3]["n_kept_lines"] == 3 and out[3]["passes_c4"]
    assert "javascript" not in out[3]["clean_text"]
    assert out[4]["has_lorem"] and not out[4]["passes_c4"]
    assert out[5]["has_brace"] and not out[5]["passes_c4"]


def test_top_ngram_repetition(spark):
    from eristropy_spark.operators.text import top_ngram_repetition

    rows = [
        Row(doc_id=1, text="spam spam spam spam ham"),   # "spam spam" x3
        Row(doc_id=2, text="all words here are unique"),
        Row(doc_id=3, text="one"),                       # shorter than n
        Row(doc_id=4, text="c d c d d c"),               # "c d" 2 vs "d c" 2
    ]
    out = {
        r["doc_id"]: (r["top_gram"], r["top_count"], r["rep_frac"])
        for r in top_ngram_repetition(
            spark.createDataFrame(rows, "doc_id long, text string"), n=2
        ).collect()
    }
    assert out[1][0] == "spam spam" and out[1][1] == 3
    assert out[1][2] == round(3 * len("spam spam") / len("spam spam spam spam ham"), 6)
    assert out[2][1] == 1  # every bigram unique -> any top has count 1
    assert out[3] == ("", 0, 0.0)
    # deterministic tie-break: lexicographically smallest gram wins
    assert out[4][0] == "c d" and out[4][1] == 2
    import pytest

    with pytest.raises(ValueError):
        top_ngram_repetition(spark.createDataFrame(rows, "doc_id long, text string"), n=0)


def test_chunk_text_windows(spark):
    from eristropy_spark.operators.text import chunk_text

    text10 = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [Row(doc_id=1, text=text10), Row(doc_id=2, text="a b")],
        "doc_id long, text string",
    )
    # disjoint windows of 4: [0:4) [4:8) [8:10) — tail of 2 kept
    out = sorted(
        (r["doc_id"], r["chunk_id"], r["n_tokens"], r["chunk_text"])
        for r in chunk_text(df, window=4).collect()
    )
    assert out == [
        (1, 0, 4, "w0 w1 w2 w3"),
        (1, 1, 4, "w4 w5 w6 w7"),
        (1, 2, 2, "w8 w9"),
        (2, 0, 2, "a b"),
    ]
    # min_tokens drops the short tail (but never a doc's only chunk)
    out2 = [
        r["chunk_id"]
        for r in chunk_text(df, window=4, min_tokens=3).collect()
        if r["doc_id"] == 1
    ]
    assert sorted(out2) == [0, 1]
    assert [r["n_tokens"] for r in chunk_text(df, window=4, min_tokens=3)
            .where("doc_id = 2").collect()] == [2]  # only chunk kept
    # overlapping stride: starts 0,3,6 cover all 10 tokens
    out3 = sorted(
        (r["chunk_id"], r["n_tokens"], r["chunk_text"])
        for r in chunk_text(df, window=4, stride=3).collect()
        if r["doc_id"] == 1
    )
    assert out3 == [
        (0, 4, "w0 w1 w2 w3"),
        (1, 4, "w3 w4 w5 w6"),
        (2, 4, "w6 w7 w8 w9"),
    ]
    import pytest

    for bad in (dict(window=0), dict(window=4, stride=5),
                dict(window=4, stride=0), dict(window=4, min_tokens=0)):
        with pytest.raises(ValueError):
            chunk_text(df, **bad)


def test_stage_real_assets_roundtrip_planted_geometry(spark):
    """The round-5 real-decode contract row in miniature: staged WAV/Y4M
    payloads decode under strict mode="real" (no fallback) and recover
    exactly the planted closed-form geometry."""
    from eristropy_spark.operators.multimodal import (
        extract_features,
        stage_real_assets,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, n_chars=100 + 37 * i) for i in range(8)]
    )
    got = {
        r["asset_id"]: (r["kind"], r["n_bytes"], r["width"], r["height"], r["n_frames"])
        for r in extract_features(stage_real_assets(docs), mode="real").collect()
    }
    assert len(got) == 8
    for i in range(8):
        nc = 100 + 37 * i
        if i % 2 == 0:
            n = 256 + (nc % 128) * 4
            assert got[f"asset-{i}"] == ("audio", 44 + 2 * n, 0, 0, n)
        else:
            w, h, fr = 16 + (i % 4) * 8, 16 + (i % 3) * 8, 1 + i % 4
            header = len(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1\n")
            nb = header + fr * (6 + w * h * 3 // 2)
            assert got[f"asset-{i}"] == ("video", nb, w, h, fr)
