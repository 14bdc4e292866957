"""Multimodal plumbing tests: schema, batching, null handling, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from blarify_spark.operators.multimodal import decode_media, synth_media


def test_decode_schema_and_counts(spark):
    media = synth_media(spark, 200)
    feats = decode_media(media)
    assert feats.count() == 200
    assert [f.name for f in feats.schema.fields] == [
        "media_id",
        "kind",
        "decode_ok",
        "width",
        "height",
        "n_frames",
        "feature",
    ]


def test_null_payloads_fail_gracefully(spark):
    feats = decode_media(synth_media(spark, 200)).cache()
    failed = feats.filter(~F.col("decode_ok"))
    assert failed.count() == 12  # every 17th payload is null
    assert failed.filter(F.col("width").isNotNull()).count() == 0
    ok = feats.filter(F.col("decode_ok"))
    assert ok.filter(F.size("feature") != 8).count() == 0


def test_decode_deterministic_under_repartition(spark):
    a = sorted(
        map(tuple, decode_media(synth_media(spark, 100)).collect())
    )
    b = sorted(
        map(
            tuple,
            decode_media(synth_media(spark, 100).repartition(7)).collect(),
        )
    )
    assert a == b


def test_image_kind_has_single_frame(spark):
    feats = decode_media(synth_media(spark, 99))
    img = feats.filter((F.col("kind") == "image") & F.col("decode_ok"))
    assert img.filter(F.col("n_frames") != 1).count() == 0
    vid = feats.filter((F.col("kind") == "video") & F.col("decode_ok"))
    assert vid.filter(F.col("n_frames") > 1).count() > 0
