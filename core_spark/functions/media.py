"""Multimodal (image / video) column plumbing.

Images and video are opaque ``binary`` columns plus typed metadata, exactly
like the audio path (``clip_id/bytes/sr_hz/codec`` — BASELINE input_hint
shape): the engine's job is the Spark-side plumbing — schemas, Arrow-batched
mapInPandas decode, partition-friendly explode of frames — while the codec
step is swappable.

Real image/audio codec libraries (Pillow / ffmpeg) are not in this
container, so the decode step supports:

- ``rawrgb8`` — a real, fully-implemented format: height*width*channels
  uint8 pixels, row-major. The deterministic synth generators below emit it,
  so every downstream op (stats, resize, frame sampling) computes real math
  on real arrays and is testable bit-for-bit.
- anything else — raises ``NotImplementedError`` with the library needed;
  plugging in a real decoder means replacing ``_decode_image`` only.

All compute is vectorized numpy inside ``mapInPandas`` (north rule: never
per-row Python in the hot path — one Python call per Arrow batch, numpy per
element inside).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("img_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("vid_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),  # n_frames concatenated rawrgb8 frames
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("fps", T.DoubleType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)


def _decode_image(b: bytes, h: int, w: int, c: int, fmt: str) -> np.ndarray:
    """bytes -> (h, w, c) uint8. The single swap point for real codecs."""
    if fmt == "rawrgb8":
        a = np.frombuffer(b, dtype=np.uint8)
        if len(a) != h * w * c:
            raise ValueError(f"rawrgb8 size mismatch: {len(a)} != {h}*{w}*{c}")
        return a.reshape(h, w, c)
    raise NotImplementedError(
        f"image format {fmt!r} needs a codec library (e.g. Pillow) "
        "not present in this environment; only 'rawrgb8' is built in"
    )


# ------------------------------------------------------------------ synth

def make_images_pdf(n: int, seed: int = 42) -> pd.DataFrame:
    """Deterministic small RGB images: per-image PCG64 stream seeded by
    (seed, i) so any row is reproducible in isolation."""
    rows = []
    for i in range(n):
        rng = np.random.Generator(np.random.PCG64(seed * 1_000_003 + i))
        h = int(8 + (i % 5) * 4)  # 8..24
        w = int(8 + (i % 7) * 4)  # 8..32
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        rows.append(
            {
                "img_id": f"img-{i:08d}",
                "bytes": px.tobytes(),
                "width": w,
                "height": h,
                "channels": 3,
                "format": "rawrgb8",
            }
        )
    return pd.DataFrame(rows)


def make_videos_pdf(n: int, seed: int = 42, frames: int = 12) -> pd.DataFrame:
    rows = []
    for i in range(n):
        rng = np.random.Generator(np.random.PCG64(seed * 2_000_003 + i))
        h, w = 8, 8
        px = rng.integers(0, 256, size=(frames, h, w, 3), dtype=np.uint8)
        rows.append(
            {
                "vid_id": f"vid-{i:08d}",
                "bytes": px.tobytes(),
                "n_frames": frames,
                "fps": 4.0,
                "width": w,
                "height": h,
                "channels": 3,
                "format": "rawrgb8",
            }
        )
    return pd.DataFrame(rows)


def images_df(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(make_images_pdf(n, seed), schema=IMAGE_SCHEMA)


def videos_df(spark: SparkSession, n: int, seed: int = 42, frames: int = 12) -> DataFrame:
    return spark.createDataFrame(make_videos_pdf(n, seed, frames), schema=VIDEO_SCHEMA)


# ------------------------------------------------------------------ operators

IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("img_id", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("brightness", T.DoubleType()),
        T.StructField("contrast", T.DoubleType()),
    ]
)


def image_stats(df: DataFrame, round_digits: int = 6) -> DataFrame:
    """Per-image channel means / brightness / contrast (stddev of gray).

    mapInPandas: one Arrow batch in, one stats frame out; only scalars
    shuffle downstream (the decoded pixels never leave the task)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("img_id", "width", "height", "mean_r",
                                   "mean_g", "mean_b", "brightness", "contrast")}
            for b, h, w, c, fmt, iid in zip(
                pdf["bytes"], pdf["height"], pdf["width"], pdf["channels"],
                pdf["format"], pdf["img_id"],
            ):
                px = _decode_image(b, h, w, c, fmt).astype(np.float64)
                ch = px.reshape(-1, c).mean(axis=0)
                gray = px.mean(axis=2)
                out["img_id"].append(iid)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_r"].append(round(float(ch[0]), round_digits))
                out["mean_g"].append(round(float(ch[1 % c]), round_digits))
                out["mean_b"].append(round(float(ch[2 % c]), round_digits))
                out["brightness"].append(round(float(gray.mean()), round_digits))
                out["contrast"].append(round(float(gray.std()), round_digits))
            yield pd.DataFrame(out)

    return df.mapInPandas(gen, schema=IMAGE_STATS_SCHEMA)


def _resize_bilinear(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Pure-numpy bilinear resample (align_corners=False convention)."""
    h, w, c = px.shape
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    p = px.astype(np.float64)
    top = p[y0][:, x0] * (1 - wx) + p[y0][:, x1] * wx
    bot = p[y1][:, x0] * (1 - wx) + p[y1][:, x1] * wx
    return np.clip(np.rint(top * (1 - wy) + bot * wy), 0, 255).astype(np.uint8)


def resize_images(df: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Decode -> bilinear resize -> re-encode rawrgb8. Output schema equals
    the input image schema (bytes/width/height replaced)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = []
            for b, h, w, c, fmt in zip(
                pdf["bytes"], pdf["height"], pdf["width"], pdf["channels"], pdf["format"]
            ):
                px = _decode_image(b, h, w, c, fmt)
                res.append(_resize_bilinear(px, out_h, out_w).tobytes())
            out = pdf.copy()
            out["bytes"] = res
            out["width"] = out_w
            out["height"] = out_h
            yield out

    return df.mapInPandas(gen, schema=IMAGE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("vid_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("t_sec", T.DoubleType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)


def sample_frames(df: DataFrame, every_n: int = 4) -> DataFrame:
    """Video -> one row per sampled frame (every_n-th, always incl. frame 0).

    The UDTF-style fan-out is mapInPandas yielding more rows than it
    consumes; frames inherit the image schema so the image operators above
    compose directly (sample_frames |> image_stats)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("vid_id", "frame_idx", "t_sec", "bytes",
                                    "width", "height", "channels", "format")}
            for b, nf, fps, h, w, c, fmt, vid in zip(
                pdf["bytes"], pdf["n_frames"], pdf["fps"], pdf["height"],
                pdf["width"], pdf["channels"], pdf["format"], pdf["vid_id"],
            ):
                if fmt != "rawrgb8":
                    raise NotImplementedError(
                        f"video format {fmt!r} needs ffmpeg; only 'rawrgb8' built in"
                    )
                frame_bytes = h * w * c
                for idx in range(0, int(nf), every_n):
                    rows["vid_id"].append(vid)
                    rows["frame_idx"].append(idx)
                    rows["t_sec"].append(idx / float(fps))
                    rows["bytes"].append(b[idx * frame_bytes : (idx + 1) * frame_bytes])
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["channels"].append(c)
                    rows["format"].append(fmt)
            yield pd.DataFrame(rows)

    return df.mapInPandas(gen, schema=FRAME_SCHEMA)


def frame_stats(df: DataFrame, every_n: int = 4, round_digits: int = 6) -> DataFrame:
    """sample_frames |> per-frame image stats |> per-video aggregate —
    the full multimodal pipeline shape (decode fan-out, vectorized feature,
    algebraic re-aggregation; only scalars cross the shuffle)."""
    frames = sample_frames(df, every_n)
    as_imgs = frames.select(
        F.concat_ws("#", "vid_id", F.col("frame_idx").cast("string")).alias("img_id"),
        "bytes", "width", "height", "channels", "format",
    )
    stats = image_stats(as_imgs, round_digits=9)
    # split on the LAST '#': frame_idx is pure digits, while vid_id may
    # itself contain '#' (splitting on the first '#' would truncate such
    # ids and merge different videos' stats)
    per_frame = stats.select(
        F.regexp_extract("img_id", r"^(.*)#(\d+)$", 1).alias("vid_id"),
        F.regexp_extract("img_id", r"^(.*)#(\d+)$", 2).cast("int").alias("frame_idx"),
        "brightness", "contrast",
    )
    return per_frame.groupBy("vid_id").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.round(F.avg("brightness"), round_digits).alias("avg_brightness"),
        F.round(F.avg("contrast"), round_digits).alias("avg_contrast"),
        F.round(F.max("brightness") - F.min("brightness"), round_digits).alias(
            "brightness_range"
        ),
    )
