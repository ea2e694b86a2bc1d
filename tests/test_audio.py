"""Audio decode layer: the BASELINE.json per-row invariants.

- decoded PCM matches the generator's float signal with SNR >= 30 dB
- transcripts survive the Spark round-trip byte-identical
- analytical energy A^2/2 matches the vectorized UDF within codec error
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from core_spark.functions import audio
from core_spark.synth import clips_df, expected_energy, make_clips_pdf

N = 120


def _signal(i: int, sr: int, dur_ms: int) -> np.ndarray:
    a = 0.1 + (i % 10) * 0.1
    f = 110.0 + (i % 8) * 110.0
    t = np.arange(int(sr * dur_ms / 1000.0)) / sr
    return a * np.sin(2 * np.pi * f * t)


def test_codec_roundtrip_snr_numpy():
    x = _signal(5, 16000, 500)
    for enc, dec in [
        (audio.pcm16_encode, audio.pcm16_decode),
        (audio.ulaw_encode, audio.ulaw_decode),
    ]:
        y = dec(enc(x))
        assert audio.snr_db(x, y) >= 30.0
        assert len(y) == len(x)


def test_spark_decode_invariants(spark):
    df = clips_df(spark, N)
    rows = (
        df.select(
            "clip_id",
            "sr_hz",
            "dur_ms",
            "codec",
            "transcript",
            audio.decode_pcm("bytes", "codec").alias("pcm"),
            audio.clip_energy("bytes", "codec").alias("energy"),
            audio.decoded_samples("bytes", "codec").alias("n_samples"),
        )
        .orderBy("clip_id")
        .collect()
    )
    assert len(rows) == N
    pdf = make_clips_pdf(N)
    by_id = {r["clip_id"]: r for r in rows}
    for i, src in pdf.iterrows():
        r = by_id[src["clip_id"]]
        x = _signal(i, int(src["sr_hz"]), int(src["dur_ms"]))
        decoded = np.array(r["pcm"], dtype=np.float32)
        # per-row invariant 1: SNR >= 30 dB vs generator PCM
        assert audio.snr_db(x, decoded) >= 30.0, r["clip_id"]
        # per-row invariant 2: transcript equality
        assert r["transcript"] == src["transcript"]
        # duration consistency
        assert r["n_samples"] == int(src["sr_hz"] * src["dur_ms"] / 1000.0)
        # analytical energy A^2/2 (ulaw gets looser tolerance)
        tol = 0.002 if src["codec"] == "pcm16" else 0.01
        assert abs(r["energy"] - expected_energy(i)) < tol


def test_media_probe_stub_shape(spark):
    df = clips_df(spark, 8)
    out = df.select("clip_id", audio.probe_media("bytes").alias("m")).select(
        "clip_id", "m.width", "m.height", "m.n_frames"
    )
    rows = out.collect()
    assert len(rows) == 8
    assert all(r["width"] >= 16 and r["n_frames"] >= 1 for r in rows)


def test_energy_is_vectorized_not_per_row(spark):
    # the UDF must be a pandas (Arrow) UDF, not a row UDF
    assert audio.clip_energy.evalType in (200, 210, 211)  # SQL_SCALAR_PANDAS variants
