"""Multimodal plumbing tests: schema, batching, null handling, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from blarify_spark.operators.multimodal import (
    decode_media,
    resize_media,
    sample_frames,
    synth_media,
)


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


def test_null_and_corrupt_payloads_fail_gracefully(spark):
    feats = decode_media(synth_media(spark, 200)).cache()
    failed = feats.filter(~F.col("decode_ok"))
    # every 17th payload is null AND every 13th is truncated-corrupt:
    # both must fail cleanly (no misparse from a surviving magic number)
    want = len([i for i in range(200) if i % 17 == 0 or i % 13 == 0])
    assert failed.count() == want
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


def test_resize_emits_valid_bmps_for_images_only(spark):
    from blarify_spark.functions import codecs

    media = synth_media(spark, 99).cache()
    rs = resize_media(media, target_w=32, target_h=16).cache()
    assert rs.count() == 99  # 1:1 transform
    imgs = rs.filter(
        (F.col("kind") == "image") & F.col("resized_payload").isNotNull()
    ).collect()
    assert len(imgs) > 0
    for r in imgs:
        # REAL re-encode: the output is itself a decodable BMP at the
        # target size, not an opaque buffer
        assert codecs.image_dims(bytes(r["resized_payload"])) == (32, 16)
        assert r["resized_bytes"] == len(r["resized_payload"])
    non_img = rs.filter(F.col("kind") != "image")
    assert non_img.filter(F.col("resized_payload").isNotNull()).count() == 0


def test_resize_pixels_come_from_source_image(spark):
    """Nearest-neighbor ground truth through the Spark path: resizing a
    synthetic BMP down to 1x1 must yield exactly its top-left pixel."""
    from blarify_spark.functions import codecs

    px = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    media = spark.createDataFrame(
        [("m0", "image", codecs.make_bmp(2, 2, px), ("image/bmp", 0, "u"))],
        schema=synth_media(spark, 1).schema,
    )
    row = resize_media(media, 1, 1).collect()[0]
    out = codecs.bmp_pixels(bytes(row["resized_payload"]))
    assert out[2] == px[:3]


def test_frame_sampling_explodes_and_matches_decode_counts(spark):
    media = synth_media(spark, 99).cache()
    frames = sample_frames(media).cache()
    per_video = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    decoded = {
        r["media_id"]: r["n_frames"]
        for r in decode_media(media)
        .filter((F.col("kind") == "video") & F.col("decode_ok"))
        .collect()
    }
    assert per_video == decoded  # sampler agrees with the decode metadata
    # frame indexes are dense 0..n-1 with monotone timestamps
    sample = frames.filter(
        F.col("media_id") == sorted(per_video)[0]
    ).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in sample] == list(range(len(sample)))
    assert all(
        r["frame_ts_ms"] == r["frame_idx"] * 1000 for r in sample
    )


def test_image_kind_has_single_frame(spark):
    feats = decode_media(synth_media(spark, 99))
    img = feats.filter((F.col("kind") == "image") & F.col("decode_ok"))
    assert img.filter(F.col("n_frames") != 1).count() == 0
    vid = feats.filter((F.col("kind") == "video") & F.col("decode_ok"))
    assert vid.filter(F.col("n_frames") > 1).count() > 0
