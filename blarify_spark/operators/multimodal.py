"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video payloads are carried as `binary` columns with a typed
metadata struct, exactly like `pages.html` carries HTML bytes. The
decode / feature-extract steps run as Arrow-batched functions over
`mapInPandas` — the real Spark plumbing (schema, batching, partitioning)
is implemented and tested; the actual codec call is a STUB (the
image/audio libraries are not in this container) behind
`_decode_stub`, which produces a deterministic fake so the pipeline
shape is fully exercisable.

Production swap-in: replace `_decode_stub` with PIL/libav calls — the
mapInPandas signature, batch iteration, and output schema are unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from blarify_spark.operators.registry import register

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("source_url", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_stub(payload: bytes | None, kind: str) -> dict:
    """STUB decode: deterministic fake features derived from content hash.

    Real implementation would be:
        raise NotImplementedError("install pillow/av and decode here")
    but we return a deterministic fake so the Spark plumbing (batch
    shapes, null handling, schema) is testable end-to-end.
    """
    if payload is None or len(payload) == 0:
        return {
            "decode_ok": False,
            "width": None,
            "height": None,
            "n_frames": None,
            "feature": None,
        }
    digest = hashlib.md5(payload).digest()
    width = 64 + digest[0]
    height = 64 + digest[1]
    n_frames = 1 if kind == "image" else 1 + digest[2] % 32
    feature = [
        round((b / 255.0) * 2 - 1, 6) for b in digest[:8]
    ]  # 8-dim fake embedding
    return {
        "decode_ok": True,
        "width": int(width),
        "height": int(height),
        "n_frames": int(n_frames),
        "feature": feature,
    }


def decode_media(media: DataFrame, batch_limit: int | None = None) -> DataFrame:
    """binary media -> decoded feature rows via mapInPandas.

    Arrow batches stream through the worker (never materializing a whole
    partition), which is what makes this safe for multi-MB payloads at
    scale; column pruning upstream drops `payload` after this stage.
    """

    def _decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "decode_ok": [f["decode_ok"] for f in feats],
                    "width": pd.array(
                        [f["width"] for f in feats], dtype="Int32"
                    ),
                    "height": pd.array(
                        [f["height"] for f in feats], dtype="Int32"
                    ),
                    "n_frames": pd.array(
                        [f["n_frames"] for f in feats], dtype="Int32"
                    ),
                    "feature": [f["feature"] for f in feats],
                }
            )
            yield out

    return media.mapInPandas(_decode_batches, schema=FEATURES_SCHEMA)


def synth_media(spark: SparkSession, n: int = 200) -> DataFrame:
    """Deterministic fake media table (no external data)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = (
            None
            if i % 17 == 0
            else hashlib.sha256(f"media{i}".encode()).digest() * (1 + i % 4)
        )
        rows.append(
            (
                hashlib.md5(f"m{i}".encode()).hexdigest(),
                kind,
                payload,
                (
                    f"application/x-{kind}",
                    len(payload) if payload else 0,
                    f"https://ex{i % 7}.test/media/{i}",
                ),
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("resized_payload", T.BinaryType(), True),
        T.StructField("resized_bytes", T.LongType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.LongType(), False),
        T.StructField("frame_hash", T.StringType(), False),
    ]
)


def resize_media(
    media: DataFrame, target_w: int = 64, target_h: int = 64
) -> DataFrame:
    """Resize step (STUB codec, real plumbing): mapInPandas 1:1 transform
    emitting a resized payload per image. The stub derives deterministic
    "resized" bytes from the content hash; a production swap-in calls
    PIL.Image.resize with the identical batch iteration and schema."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "image" or payload is None:
                    out.append((mid, kind, None, None, None, None))
                    continue
                # stub: fake (target_w x target_h) grayscale buffer seeded
                # by the content digest — size-correct, deterministic
                seed = hashlib.md5(payload).digest()
                buf = (seed * ((target_w * target_h) // len(seed) + 1))[
                    : target_w * target_h
                ]
                out.append((mid, kind, target_w, target_h, buf, len(buf)))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "kind",
                    "width",
                    "height",
                    "resized_payload",
                    "resized_bytes",
                ],
            )

    return media.mapInPandas(_resize, schema=RESIZE_SCHEMA)


def sample_frames(media: DataFrame, fps_ms: int = 1000) -> DataFrame:
    """Frame-sampling step (STUB codec, real plumbing): a row-EXPLODING
    mapInPandas — one input video emits one row per sampled frame, the
    batch shape a real libav-backed sampler would produce. Frame count and
    hashes are derived deterministically from the payload digest."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video" or payload is None:
                    continue
                digest = hashlib.md5(payload).digest()
                n_frames = 1 + digest[2] % 32  # matches _decode_stub
                for i in range(n_frames):
                    fh = hashlib.md5(digest + i.to_bytes(4, "big")).hexdigest()
                    out.append((mid, i, i * fps_ms, fh))
            yield pd.DataFrame(
                out,
                columns=["media_id", "frame_idx", "frame_ts_ms", "frame_hash"],
            )

    return media.mapInPandas(_sample, schema=FRAME_SCHEMA)


@register("multimodal_frame_sample", oracle=None)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling stats per video (stub codec, real exploding
    mapInPandas plumbing): frame counts + span from the sampled rows."""
    frames = sample_frames(synth_media(spark))
    return (
        frames.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.max("frame_ts_ms").alias("last_ts_ms"),
            F.min("frame_hash").alias("min_frame_hash"),
        )
        .orderBy("media_id")
    )


@register("multimodal_decode_features", oracle=None)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decoded media features (stubbed codec, real plumbing).

    The registered result flattens the array<float> feature to a scalar
    string column (driver canonicalization sorts values with pandas and
    cannot hash list cells); the array-typed DataFrame from decode_media
    remains the programmatic API.
    """
    feats = decode_media(synth_media(spark))
    feature_str = F.array_join(
        F.transform(
            F.col("feature"),
            lambda x: x.cast("decimal(10,6)").cast("string"),
        ),
        ",",
    )
    return feats.select(
        "media_id",
        "kind",
        "decode_ok",
        "width",
        "height",
        "n_frames",
        feature_str.alias("feature_csv"),
    ).orderBy("media_id")


@register("multimodal_kind_stats", oracle=None)
def multimodal_kind_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-kind decode stats: count, failures, mean frame count."""
    feats = decode_media(synth_media(spark))
    return (
        feats.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(~F.col("decode_ok"), 1).otherwise(0)).alias(
                "n_failed"
            ),
            F.sum("n_frames").alias("total_frames"),
        )
        .orderBy("kind")
    )
