"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video payloads are carried as `binary` columns with a typed
metadata struct, exactly like `pages.html` carries HTML bytes. The
decode / feature-extract steps run as Arrow-batched functions over
`mapInPandas` — batches stream through the worker, column pruning drops
payloads after decode, and every output is deterministic in the input
bytes.

Round-4: the hash-derived FAKE features are gone. Decoding is REAL
byte-level parsing via blarify_spark.functions.codecs (pure stdlib — the
sandbox has no PIL/av/cv2, probe recorded there):

* images  — dimensions parsed from actual PNG/GIF/BMP/JPEG headers;
            24bpp BMP additionally gets a full pixel decode, and resize
            is a genuine decode → nearest-neighbor resample → re-encode.
* audio   — stdlib `wave` PCM decode: channels/rate/frames/duration and
            RMS energy of the real samples.
* video   — a documented toy container (RVID: header + raw grayscale
            frames) parsed and frame-iterated for real; NOT a standard
            codec — swapping in libav replaces only the codec functions,
            every Spark signature is unchanged (HAVE_PIL gates a future
            real-library path).

Features are 8-dim vectors computed from the decoded bytes (intensity
histograms / PCM stats), so a consumer reading width/height/feature gets
facts about the payload, not fiction.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from blarify_spark.functions import codecs
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

_FAIL = {
    "decode_ok": False,
    "width": None,
    "height": None,
    "n_frames": None,
    "feature": None,
}


def _hist8(buf: bytes) -> list[float]:
    """8-bin normalized intensity histogram of real decoded bytes."""
    counts = [0] * 8
    for b in buf:
        counts[b >> 5] += 1
    n = len(buf) or 1
    return [round(c / n, 6) for c in counts]


def _decode_real(payload: bytes | None, kind: str) -> dict:
    """Real byte-level decode (see module docstring). Unknown formats,
    kind/container mismatches, and truncated payloads fail cleanly."""
    if not payload:
        return _FAIL
    fmt = codecs.sniff_format(payload)
    if kind == "image" and fmt in ("png", "gif", "bmp", "jpeg"):
        dims = codecs.image_dims(payload)
        if dims is None:
            return _FAIL
        px = codecs.image_pixels(payload)
        # all four containers get REAL pixel decode (GIF via pure-stdlib
        # LZW, JPEG via the baseline codec in functions/jpeg.py since
        # round 5); the histogram runs over decoded pixels. Only a
        # payload whose pixels can't be recovered (e.g. progressive
        # JPEG) falls back to the compressed-byte histogram.
        feature = _hist8(px[2] if px else payload)
        return {
            "decode_ok": True,
            "width": dims[0],
            "height": dims[1],
            "n_frames": 1,
            "feature": feature,
        }
    if kind == "audio" and fmt == "wav":
        info = codecs.wav_info(payload)
        if info is None:
            return _FAIL
        feature = [
            float(info["channels"]),
            round(info["rate"] / 1000.0, 6),
            round(info["duration_ms"] / 1000.0, 6),
            round(info["rms"] / 32768.0, 6),
            float(info["n_frames"] % 997),
            0.0,
            0.0,
            0.0,
        ]
        return {
            "decode_ok": True,
            "width": None,
            "height": None,
            "n_frames": int(info["n_frames"]),
            "feature": feature,
        }
    if kind == "video" and fmt == "rvid":
        info = codecs.rvid_info(payload)
        if info is None:
            return _FAIL
        w, h, n = info
        first = codecs.rvid_frame(payload, 0)
        return {
            "decode_ok": True,
            "width": w,
            "height": h,
            "n_frames": n,
            "feature": _hist8(first or b""),
        }
    return _FAIL


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
                _decode_real(p, k)
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
    """Deterministic REAL media table (no external data): valid 24bpp
    BMPs, 8-bit PNGs, LZW GIFs, 16-bit PCM WAVs, and RVID clips, with
    every 17th payload null and every 13th corrupted (truncated) so both
    failure paths stay exercised."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if i % 17 == 0:
            payload = None
        else:
            if kind == "image":
                w, h = 8 + i % 9, 8 + i % 7
                pixels = bytes(
                    (x * 3 + y * 7 + i) % 256
                    for y in range(h)
                    for x in range(w)
                    for _ in range(3)
                )
                # rotate containers: all four get REAL pixel decode
                # (the grayscale pixel ramp keeps distinct colors <= 256,
                # so the GIF palette path is always encodable; JPEG is
                # lossy — its features come from its own decoded pixels)
                from blarify_spark.functions.jpeg import make_jpeg

                maker = (
                    codecs.make_bmp,
                    codecs.make_png,
                    codecs.make_gif,
                    make_jpeg,
                )[(i // 3) % 4]
                payload = maker(w, h, pixels)
            elif kind == "audio":
                payload = codecs.make_wav(400 + (i % 8) * 100, seed=i)
            else:
                w = h = 8
                frames = [
                    bytes((x + y + i + f) % 256 for y in range(h) for x in range(w))
                    for f in range(1 + i % 5)
                ]
                payload = codecs.make_rvid(w, h, frames)
            if i % 13 == 0:
                # corrupt: magic survives, headers don't — every codec
                # path must fail cleanly, not misparse
                payload = payload[:6]
        mime = {
            "png": "image/png",
            "gif": "image/gif",
            "bmp": "image/bmp",
            "jpeg": "image/jpeg",
            "wav": "audio/wav",
            "rvid": "video/x-rvid",
        }.get(codecs.sniff_format(payload) or "", f"application/x-{kind}")
        rows.append(
            (
                hashlib.md5(f"m{i}".encode()).hexdigest(),
                kind,
                payload,
                (
                    mime,
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
    """REAL resize: mapInPandas 1:1 transform that pixel-decodes each
    image (24bpp BMP or 8-bit PNG — full zlib inflate + unfilter),
    nearest-neighbor resamples, and re-encodes a valid BMP
    (codecs.image_resize — the PIL.Image.resize stand-in with identical
    batch iteration and schema). Non-images and undecodable payloads
    yield null payloads."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                resized = (
                    codecs.image_resize(payload, target_w, target_h)
                    if kind == "image" and payload is not None
                    else None
                )
                if resized is None:
                    out.append((mid, kind, None, None, None, None))
                else:
                    out.append(
                        (
                            mid,
                            kind,
                            target_w,
                            target_h,
                            resized,
                            len(resized),
                        )
                    )
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
    """REAL frame sampling: a row-EXPLODING mapInPandas — one input video
    emits one row per ACTUAL container frame (codecs.rvid_frame), with
    the frame hash computed over the real frame bytes. Undecodable clips
    emit nothing (they fail in decode_media instead)."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video" or payload is None:
                    continue
                info = codecs.rvid_info(payload)
                if info is None:
                    continue
                for i in range(info[2]):
                    frame = codecs.rvid_frame(payload, i)
                    fh = hashlib.md5(frame).hexdigest()
                    out.append((mid, i, i * fps_ms, fh))
            yield pd.DataFrame(
                out,
                columns=["media_id", "frame_idx", "frame_ts_ms", "frame_hash"],
            )

    return media.mapInPandas(_sample, schema=FRAME_SCHEMA)


@register("multimodal_frame_sample", oracle=None)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling stats per video (real container frame iteration):
    frame counts + span from the sampled rows."""
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
    """Decoded media features (real byte-level decode, see module
    docstring).

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
