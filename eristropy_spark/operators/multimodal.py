"""Multimodal asset handling — binary payload columns + typed metadata.

Images/audio/video are opaque ``binary`` columns with typed metadata;
all Spark-side plumbing (schema, batched mapInPandas, partition-size
control) is real.  The media decode itself is PROBED at decode time:

* image — real decode through PIL when importable (width/height/
  frame count + a 16-bin grayscale-histogram feature); PIL is absent
  in this container, so the probe returns None here and tests exercise
  the real path through a monkeypatched PIL-shaped stub.
* audio — real decode through the stdlib ``wave`` module (always
  available): frame count + a 16-bin 16-bit-sample histogram feature.
* video — real decode for the uncompressed YUV4MPEG2 (Y4M) container
  (dependency-free header+planes parser, luma-histogram feature);
  compressed containers need ffmpeg bindings we do not target and
  raise ``NotImplementedError``.

``fake_decode=True`` (the sandbox/test default) produces a
*deterministic* fake decode (seeded by the payload hash) with the same
shapes a real decoder would emit; ``mode="auto"`` in
``extract_features`` picks real-per-kind when the lib is present and
falls back to the fake otherwise.  Tests pin the plumbing (schema,
batch shapes, determinism) plus both probe outcomes per kind.

Design notes for 100 TB: assets flow through ``mapInPandas`` so one
task streams many Arrow batches without materializing the partition;
``spark.sql.files.maxPartitionBytes`` + the Arrow batch cap bound
worker memory, and feature extraction emits fixed-width vectors so
downstream tables stay columnar.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "ASSET_SCHEMA",
    "FEATURE_SCHEMA",
    "documents_to_assets",
    "extract_features",
    "stage_real_assets",
]

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", StringType()),  # placeholder; real col is binary
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

FEATURE_DIM = 16


def documents_to_assets(docs: DataFrame) -> DataFrame:
    """Synthesize an asset table from documents: payload = utf-8 bytes of
    text, kind assigned deterministically.  Stands in for a real
    (path, bytes) scan of an object store."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    return docs.select(
        F.concat(F.lit("asset-"), F.col("doc_id")).alias("asset_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


def stage_real_assets(docs: DataFrame) -> DataFrame:
    """Deterministic REAL media containers derived from the documents
    table — the validation harness that lets the contract run
    ``mode="real"`` decode end to end with no external data.

    Even ``doc_id`` → mono 16-bit PCM WAV (stdlib ``wave`` writer, 44-byte
    header), odd → uncompressed YUV4MPEG2 video (the same container
    ``_decode_video_y4m`` parses).  Every planted dimension is a
    CLOSED-FORM function of (doc_id, n_chars):

    * audio: ``n_samples = 256 + (n_chars % 128) * 4`` →
      ``n_bytes = 44 + 2·n_samples``;
    * video: ``w = 16 + (doc_id % 4)·8``, ``h = 16 + (doc_id % 3)·8``,
      ``frames = 1 + doc_id % 4`` →
      ``n_bytes = len(header) + frames·(6 + w·h·3/2)`` (C420 default),

    so an independent SQL oracle predicts every metadata column and the
    contract row verifies the real decoders recover exactly the planted
    geometry.  Synthesis is a staging/validation path (per-row Python in
    mapInPandas is fine here); production assets arrive as (path, bytes)
    scans."""
    import io  # noqa: PLC0415
    import wave as wave_mod  # noqa: PLC0415

    schema = StructType(
        [
            StructField("asset_id", StringType()),
            StructField("kind", StringType()),
            StructField("payload", BinaryType()),
        ]
    )

    def _stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                did, nc = int(doc_id), int(n_chars)
                if did % 2 == 0:
                    n = 256 + (nc % 128) * 4
                    samples = (
                        np.arange(n, dtype=np.int64) * 257 % 65536 - 32768
                    ).astype("<i2")
                    buf = io.BytesIO()
                    with wave_mod.open(buf, "wb") as wf:
                        wf.setnchannels(1)
                        wf.setsampwidth(2)
                        wf.setframerate(8000)
                        wf.writeframes(samples.tobytes())
                    rows.append((f"asset-{did}", "audio", buf.getvalue()))
                else:
                    w = 16 + (did % 4) * 8
                    h = 16 + (did % 3) * 8
                    frames = 1 + (did % 4)
                    header = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1\n".encode()
                    fsz = w * h + 2 * ((w // 2) * (h // 2))
                    luma = (np.arange(fsz, dtype=np.int64) % 256).astype(np.uint8)
                    body = b"".join(
                        b"FRAME\n" + luma.tobytes() for _ in range(frames)
                    )
                    rows.append((f"asset-{did}", "video", header + body))
            yield pd.DataFrame(rows, columns=["asset_id", "kind", "payload"])

    return docs.select("doc_id", "n_chars").mapInPandas(_stage, schema)


def _probe_image_lib():
    """PIL.Image if importable, else None (monkeypatch point for tests)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _probe_audio_lib():
    """stdlib ``wave`` module (monkeypatch point for tests)."""
    import wave  # noqa: PLC0415

    return wave


def _hist_feature(samples: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """Deterministic fixed-width feature: normalized FEATURE_DIM-bin
    histogram of the decoded sample values."""
    hist, _ = np.histogram(samples, bins=FEATURE_DIM, range=(lo, hi))
    total = hist.sum()
    return (hist / total if total else hist).astype(np.float32)


def _decode_image_real(payload: bytes, image_mod) -> dict:
    import io

    img = image_mod.open(io.BytesIO(payload))
    w, h = img.size
    frames = int(getattr(img, "n_frames", 1))
    gray = np.frombuffer(img.convert("L").tobytes(), dtype=np.uint8)
    return {
        "n_bytes": len(payload),
        "width": int(w),
        "height": int(h),
        "n_frames": frames,
        "feature": _hist_feature(gray.astype(np.float64), 0.0, 256.0),
    }


def _decode_video_y4m(payload: bytes) -> dict:
    """Dependency-free real video decode for the YUV4MPEG2 (Y4M)
    container: plain-text header (``YUV4MPEG2 W<w> H<h> ...``) then
    uncompressed ``FRAME\\n``-delimited YUV planes — parseable with
    nothing but numpy.  Feature = normalized FEATURE_DIM-bin histogram
    of the luma (Y) plane accumulated across all frames.  Any other
    container still raises NotImplementedError (compressed video needs
    ffmpeg bindings we do not target)."""
    nl = payload.index(b"\n")
    w = h = 0
    colorspace = "420jpeg"  # Y4M default when C is omitted
    for tok in payload[len(b"YUV4MPEG2") : nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"C":
            colorspace = val.decode("ascii")
    if w <= 0 or h <= 0:
        raise ValueError("Y4M header missing W/H")
    if colorspace.startswith("420"):
        frame_size = w * h + 2 * ((w // 2) * (h // 2))
    elif colorspace.startswith("422"):
        frame_size = w * h + 2 * ((w // 2) * h)
    elif colorspace.startswith("444"):
        frame_size = w * h * 3
    elif colorspace.startswith("mono"):
        frame_size = w * h
    else:
        raise ValueError(f"unsupported Y4M colorspace {colorspace!r}")

    hist = np.zeros(FEATURE_DIM, dtype=np.int64)
    n_frames, pos, n_y = 0, nl + 1, w * h
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {pos}")
        pos = payload.index(b"\n", pos) + 1
        if pos + frame_size > len(payload):
            raise ValueError(f"truncated frame {n_frames}")
        y = np.frombuffer(payload, dtype=np.uint8, count=n_y, offset=pos)
        hist += np.histogram(y, bins=FEATURE_DIM, range=(0.0, 256.0))[0]
        n_frames += 1
        pos += frame_size
    total = hist.sum()
    feat = (hist / total if total else hist).astype(np.float32)
    return {
        "n_bytes": len(payload),
        "width": w,
        "height": h,
        "n_frames": n_frames,
        "feature": feat,
    }


def _decode_audio_real(payload: bytes, wave_mod) -> dict:
    import io

    with wave_mod.open(io.BytesIO(payload), "rb") as wf:
        n_frames = int(wf.getnframes())
        data = wf.readframes(n_frames)
    samples = np.frombuffer(data, dtype=np.int16).astype(np.float64)
    return {
        "n_bytes": len(payload),
        "width": 0,
        "height": 0,
        "n_frames": n_frames,
        "feature": _hist_feature(samples, -32768.0, 32768.0),
    }


def decode_payload(payload: bytes, kind: str, fake_decode: bool) -> dict:
    """Decode one asset.

    ``fake_decode=False`` runs the REAL decoder for the kind when its
    library probe succeeds (PIL for images; stdlib ``wave`` for audio;
    the dependency-free Y4M parser for uncompressed video) and raises
    ``NotImplementedError`` otherwise.  ``fake_decode=True`` is the
    deterministic payload-hash-seeded test double with real decoder
    output shapes."""
    if not fake_decode:
        if kind == "image":
            image_mod = _probe_image_lib()
            if image_mod is None:
                raise NotImplementedError(
                    "real image decode requires PIL, not importable here; "
                    "pass fake_decode=True for the deterministic test double"
                )
            return _decode_image_real(payload, image_mod)
        if kind == "audio":
            return _decode_audio_real(payload, _probe_audio_lib())
        if kind == "video" and payload.startswith(b"YUV4MPEG2"):
            return _decode_video_y4m(payload)
        raise NotImplementedError(
            f"no real decoder targeted for kind={kind!r} (video is "
            "decoded only for the uncompressed Y4M container; compressed "
            "video requires ffmpeg bindings, not available); pass "
            "fake_decode=True for the deterministic test double"
        )
    digest = hashlib.blake2b(payload, digest_size=8).digest()
    seed = int.from_bytes(digest, "big")
    rng = np.random.Generator(np.random.PCG64(seed))
    if kind == "image":
        w, h, frames = int(rng.integers(16, 257)), int(rng.integers(16, 257)), 1
    elif kind == "audio":
        w, h, frames = 0, 0, int(rng.integers(1000, 48001))
    else:  # video
        w, h, frames = int(rng.integers(16, 129)), int(rng.integers(16, 129)), int(
            rng.integers(8, 65)
        )
    feat = rng.standard_normal(FEATURE_DIM).astype(np.float32)
    return {
        "n_bytes": len(payload),
        "width": w,
        "height": h,
        "n_frames": frames,
        "feature": feat,
    }


def extract_features(
    assets: DataFrame, fake_decode: bool = True, mode: str | None = None
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    ``mode`` overrides ``fake_decode``: ``"fake"`` / ``"real"`` force a
    path; ``"auto"`` probes each kind's decoder ONCE at UDF init (on the
    worker) and uses the real decoder where present, the deterministic
    fake otherwise — and if a real decode of an individual payload
    FAILS (corrupt/mislabeled bytes — guaranteed to occur somewhere in
    a 100 TB corpus), that payload falls back to the fake decode instead
    of killing the job.  ``mode="real"`` keeps the raise (explicit
    strictness).  Kinds without a known decoder decode fake except in
    ``"real"`` mode, where they raise clearly."""
    if mode is None:
        mode = "fake" if fake_decode else "real"
    if mode not in {"fake", "real", "auto"}:
        raise ValueError("mode must be one of {'fake', 'real', 'auto'}")

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if mode == "auto":
            # one probe per task, on the worker where decode runs
            fake_for = {
                "image": _probe_image_lib() is None,
                "audio": _probe_audio_lib() is None,
                # Y4M decode is dependency-free: always try real, with
                # the per-payload fallback catching non-Y4M containers
                "video": False,
            }
        else:
            fake_for = dict.fromkeys(("image", "audio", "video"), mode == "fake")

        def _decode(payload: bytes, kind: str) -> dict:
            # unknown kinds: fake path (it handles any kind) unless the
            # caller demanded real decode
            fake = fake_for.get(kind, mode != "real")
            if mode == "auto" and not fake:
                try:
                    return decode_payload(payload, kind, False)
                except Exception:  # noqa: BLE001 — corrupt payload
                    return decode_payload(payload, kind, True)
            return decode_payload(payload, kind, fake)

        for pdf in batches:
            rows = []
            for asset_id, kind, payload in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"]
            ):
                d = _decode(bytes(payload), kind)
                rows.append(
                    {
                        "asset_id": asset_id,
                        "kind": kind,
                        "n_bytes": d["n_bytes"],
                        "width": d["width"],
                        "height": d["height"],
                        "n_frames": d["n_frames"],
                        "feature": d["feature"],
                    }
                )
            yield pd.DataFrame(rows)

    return assets.mapInPandas(_extract, FEATURE_SCHEMA)
