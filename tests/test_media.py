"""Multimodal (image/video) plumbing: decode, stats, resize, frame sampling.

The rawrgb8 codec is fully real (bytes == raw pixels), so every operator's
output is asserted against direct numpy computation on the same
deterministic synth arrays."""

from __future__ import annotations

import numpy as np
import pytest

from core_spark.functions import media as md


def test_image_stats_match_numpy(spark):
    df = md.images_df(spark, 20)
    got = {r["img_id"]: r for r in md.image_stats(df).collect()}
    pdf = md.make_images_pdf(20)
    assert len(got) == 20
    for _, row in pdf.iterrows():
        px = np.frombuffer(row["bytes"], dtype=np.uint8).reshape(
            row["height"], row["width"], 3
        ).astype(np.float64)
        g = got[row["img_id"]]
        assert g["mean_r"] == pytest.approx(px[:, :, 0].mean(), abs=1e-6)
        assert g["brightness"] == pytest.approx(px.mean(axis=2).mean(), abs=1e-6)
        assert g["contrast"] == pytest.approx(px.mean(axis=2).std(), abs=1e-6)


def test_resize_shape_and_determinism(spark):
    df = md.images_df(spark, 8)
    out = md.resize_images(df, 16, 16).collect()
    assert all(r["width"] == 16 and r["height"] == 16 for r in out)
    assert all(len(r["bytes"]) == 16 * 16 * 3 for r in out)
    # constant image resizes to itself
    const = np.full((8, 8, 3), 77, dtype=np.uint8)
    assert np.array_equal(md._resize_bilinear(const, 16, 16), np.full((16, 16, 3), 77))
    # pure-numpy kernel is deterministic across calls
    px = np.frombuffer(md.make_images_pdf(1)["bytes"][0], dtype=np.uint8).reshape(8, 8, 3)
    assert np.array_equal(md._resize_bilinear(px, 5, 9), md._resize_bilinear(px, 5, 9))


def test_sample_frames_fanout(spark):
    df = md.videos_df(spark, 6, frames=12)
    frames = md.sample_frames(df, every_n=4).collect()
    # 12 frames sampled every 4 -> indices 0,4,8 per video
    assert len(frames) == 6 * 3
    by_vid = {}
    for r in frames:
        by_vid.setdefault(r["vid_id"], []).append(r["frame_idx"])
        assert len(r["bytes"]) == 8 * 8 * 3
        assert r["t_sec"] == pytest.approx(r["frame_idx"] / 4.0)
    assert all(sorted(v) == [0, 4, 8] for v in by_vid.values())
    # sampled frame bytes are the exact slices of the source video
    pdf = md.make_videos_pdf(6, frames=12)
    src = {row["vid_id"]: row["bytes"] for _, row in pdf.iterrows()}
    fb = 8 * 8 * 3
    for r in frames:
        expect = src[r["vid_id"]][r["frame_idx"] * fb : (r["frame_idx"] + 1) * fb]
        assert bytes(r["bytes"]) == bytes(expect)


def test_frame_stats_aggregate(spark):
    df = md.videos_df(spark, 5, frames=12)
    out = {r["vid_id"]: r for r in md.frame_stats(df, every_n=4).collect()}
    assert len(out) == 5
    pdf = md.make_videos_pdf(5, frames=12)
    for _, row in pdf.iterrows():
        fr = np.frombuffer(row["bytes"], dtype=np.uint8).reshape(12, 8, 8, 3)
        bright = [fr[i].astype(np.float64).mean(axis=2).mean() for i in (0, 4, 8)]
        g = out[row["vid_id"]]
        assert g["n_sampled"] == 3
        assert g["avg_brightness"] == pytest.approx(np.mean(bright), abs=1e-5)
        assert g["brightness_range"] == pytest.approx(
            max(bright) - min(bright), abs=1e-5
        )


def test_unknown_codec_raises(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            [{"img_id": "x", "bytes": b"\x00", "width": 1, "height": 1,
              "channels": 1, "format": "jpeg"}]
        ),
        schema=md.IMAGE_SCHEMA,
    )
    with pytest.raises(Exception, match="NotImplementedError|jpeg"):
        md.image_stats(df).collect()


def test_frame_stats_vid_id_containing_hash(spark):
    """vid_id may itself contain '#'; the frame-id round-trip must split on
    the LAST '#' or different videos' stats merge."""
    import pyspark.sql.functions as F

    df = md.videos_df(spark, 4, frames=12).withColumn(
        "vid_id", F.concat(F.lit("shard#7#"), F.col("vid_id"))
    )
    out = {r["vid_id"]: r for r in md.frame_stats(df, every_n=4).collect()}
    assert len(out) == 4
    assert all(v.startswith("shard#7#vid-") for v in out)
    assert all(r["n_sampled"] == 3 for r in out.values())
