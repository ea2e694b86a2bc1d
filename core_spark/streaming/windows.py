"""Windowed aggregates over the clip stream — the streaming recast of the
reference's resample verb (SURVEY §2.4; _time_series_query_builder.py:183-239):
``groupBy(window(event_time, rate))`` with the same bucket math batch and
streaming, plus watermarks (which the reference lacks entirely, SURVEY §2.12).

Scale posture:
- The decode UDF emits scalar features, so shuffles carry doubles, not PCM.
- Aggregates are algebraic (count/sum/min/max) => map-side partial agg.
- Hot clip_id prefixes (Zipf-skewed by design) optionally get salted
  two-stage aggregation: partial agg on (window, prefix, salt) spreads one
  hot key's state over ``salt_buckets`` state-store partitions, then a second
  windowed agg (Spark >=3.4 multiple-stateful-operators) folds the partials.
  avg is carried as (sum, count) through the partial stage so the two-stage
  result is exactly the single-stage result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import audio as au

_PI = 3.141592653589793


def clip_features(df: DataFrame, prefix_len: int = 2) -> DataFrame:
    """Decode-derived per-clip features; identical for batch and stream.

    prefix = leading clip_id chars — the shard key (SURVEY §1.4: TagName ->
    clip_id prefix). energy/samples are Arrow pandas UDFs (north rule:
    vectorized only, audio.py).
    """
    return (
        df.withColumn("prefix", F.substring("clip_id", 1, prefix_len))
        .withColumn("energy", au.clip_energy("bytes", "codec"))
        .withColumn("n_samples", au.decoded_samples("bytes", "codec"))
        .withColumn(
            "decoded_ms",
            F.col("n_samples").cast("double") / F.col("sr_hz") * 1000.0,
        )
    )


def clip_features_spectral(df: DataFrame, prefix_len: int = 2) -> DataFrame:
    """Heavy DSP variant of clip_features: one decode pass feeding the framed
    512-pt FFT feature set. Runs zero-copy over Arrow record batches
    (functions/audio_arrow.py) — per-clip work is real vectorized compute
    with a flat working set, so throughput scales with cores instead of
    being allocation- or scheduling-overhead-bound."""
    from ..functions.audio_arrow import spectral_features_arrow

    return spectral_features_arrow(df, prefix_len)


def _finalize(agg: DataFrame) -> DataFrame:
    extra = [c for c in ("sum_centroid", "sum_zcr") if c in agg.columns]
    out = agg.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "prefix",
        "n_clips",
        (F.col("sum_energy") / F.col("n_clips")).alias("avg_energy"),
        "sum_dur_ms",
        "max_energy",
        "n_distinct_clips",
        *extra,
    )
    if extra:
        out = out.select(
            "window_start", "window_end", "prefix", "n_clips", "avg_energy",
            "sum_dur_ms", "max_energy", "n_distinct_clips",
            (F.col("sum_centroid") / F.col("n_clips")).alias("avg_centroid_hz"),
            (F.col("sum_zcr") / F.col("n_clips")).alias("avg_zcr"),
        )
    return out


def tumbling_energy(
    df: DataFrame,
    window_sec: int = 60,
    slide_sec: int | None = None,
    watermark_sec: int = 30,
    salt_buckets: int | None = None,
    prefix_len: int = 2,
    spectral: bool = False,
) -> DataFrame:
    """Tumbling (or sliding, if slide_sec is set) per-prefix energy windows.

    Works on a stream (append mode after watermark close) and, with the same
    code path, on a batch frame (watermark is a no-op in batch) — the parity
    tests exploit exactly that (SURVEY §5 engine test plan).

    ``spectral=True`` switches the per-clip feature pass to the framed-FFT
    struct (clip_features_spectral) and adds avg_centroid_hz / avg_zcr to the
    output — the production-shaped heavy path used by the scaling bench.
    """
    win = f"{window_sec} seconds"
    feats = (
        clip_features_spectral(df, prefix_len)
        if spectral
        else clip_features(df, prefix_len)
    )
    windowed = feats.withWatermark("ingest_ts", f"{watermark_sec} seconds")
    w = (
        F.window("ingest_ts", win, f"{slide_sec} seconds")
        if slide_sec
        else F.window("ingest_ts", win)
    )
    spec_aggs = (
        [
            F.sum("spectral_centroid_hz").alias("sum_centroid"),
            F.sum("zcr").alias("sum_zcr"),
        ]
        if spectral
        else []
    )
    if not salt_buckets:
        agg = windowed.groupBy(w.alias("window"), "prefix").agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum("energy").alias("sum_energy"),
            F.sum("dur_ms").alias("sum_dur_ms"),
            F.max("energy").alias("max_energy"),
            F.approx_count_distinct("clip_id").alias("n_distinct_clips"),
            *spec_aggs,
        )
        return _finalize(agg)
    # two-stage salted aggregation: state for one hot prefix is spread over
    # salt_buckets keys in stage 1; stage 2 re-windows on window_time()
    salt = F.pmod(F.xxhash64("clip_id"), F.lit(salt_buckets)).alias("salt")
    p_spec = (
        [
            F.sum("spectral_centroid_hz").alias("p_sum_centroid"),
            F.sum("zcr").alias("p_sum_zcr"),
        ]
        if spectral
        else []
    )
    partial = windowed.groupBy(w.alias("window"), "prefix", salt).agg(
        F.count(F.lit(1)).alias("p_n"),
        F.sum("energy").alias("p_sum_energy"),
        F.sum("dur_ms").alias("p_sum_dur"),
        F.max("energy").alias("p_max_energy"),
        F.approx_count_distinct("clip_id").alias("p_distinct"),
        *p_spec,
    )
    f_spec = (
        [
            F.sum("p_sum_centroid").alias("sum_centroid"),
            F.sum("p_sum_zcr").alias("sum_zcr"),
        ]
        if spectral
        else []
    )
    # Stage 2 must fold partials of the SAME stage-1 window. Re-windowing
    # window_time() at the full window width is only correct for tumbling
    # windows — with a slide it would merge the ~window/slide overlapping
    # sliding windows into one wrong row. window_time() is end-1ms and
    # stage-1 window ends are slide-aligned and >= slide apart per series,
    # so a TUMBLING bucket of the SLIDE width contains exactly one stage-1
    # window's partials per (end, prefix); the original bounds come back
    # arithmetically (end = bucket end, start = end - window).
    step_sec = slide_sec or window_sec
    final = partial.groupBy(
        F.window(F.window_time("window"), f"{step_sec} seconds").alias("w2"),
        "prefix",
    ).agg(
        F.sum("p_n").alias("n_clips"),
        F.sum("p_sum_energy").alias("sum_energy"),
        F.sum("p_sum_dur").alias("sum_dur_ms"),
        F.max("p_max_energy").alias("max_energy"),
        F.sum("p_distinct").alias("n_distinct_clips"),
        *f_spec,
    )
    final = final.withColumn(
        "window",
        F.struct(
            (F.col("w2.end") - F.expr(f"INTERVAL {window_sec} SECONDS")).alias("start"),
            F.col("w2.end").alias("end"),
        ),
    )
    return _finalize(final)


def session_windows_native(
    df: DataFrame,
    gap_sec: int = 300,
    watermark_sec: int = 30,
    prefix_len: int = 2,
) -> DataFrame:
    """Per-prefix session windows via the built-in session_window() —
    session = contiguous clips with inter-arrival gap < gap_sec, the
    reference's lag-gap rule (identify_missing_data_interval.py:137-141)
    expressed as a native stateful operator."""
    feats = clip_features(df, prefix_len).withWatermark(
        "ingest_ts", f"{watermark_sec} seconds"
    )
    agg = feats.groupBy(
        F.session_window("ingest_ts", f"{gap_sec} seconds").alias("w"), "prefix"
    ).agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.sum("dur_ms").alias("sum_dur_ms"),
        F.sum("energy").alias("sum_energy"),
        F.min("ingest_ts").alias("first_clip_ts"),
        F.max("ingest_ts").alias("last_clip_ts"),
    )
    return agg.select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "prefix",
        "n_clips",
        "sum_dur_ms",
        (F.col("sum_energy") / F.col("n_clips")).alias("avg_energy"),
        "first_clip_ts",
        "last_clip_ts",
    )


def session_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    gap_sec: int,
    watermark_sec: int = 30,
) -> DataFrame:
    """Generic keyed session aggregate via the native ``session_window()``
    stateful operator: a session is a maximal run of events where each
    inter-arrival gap is strictly under ``gap_sec`` (an event landing
    exactly at the previous session's end — diff == gap — opens a NEW
    session, the half-open [start, last_ts + gap) rule). Emits
    (key, session_start, session_end, n_events, sum_value) when the
    watermark closes the session. Runs identically on a batch frame
    (``session_window`` is a plain groupBy there) — the SQL oracle is
    lag/cumsum gap sessionization (registry: ``stream_sessions_events``).

    Scale: native session windows merge state in the state store per key —
    no per-key Python, state bounded by open sessions only; AQE-sized
    shuffle on the key."""
    src = (
        df.withWatermark(ts_col, f"{watermark_sec} seconds")
        if df.isStreaming
        else df
    )
    agg = src.groupBy(
        F.session_window(F.col(ts_col), f"{gap_sec} seconds").alias("w"),
        F.col(key_col).alias("key"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value_col).alias("sum_value"),
    )
    return agg.select(
        "key",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events",
        "sum_value",
    )


def dedup_within_watermark(
    df: DataFrame,
    keys: list[str] | None = None,
    watermark_sec: int = 30,
    event_col: str = "ingest_ts",
) -> DataFrame:
    """Streaming duplicate removal — the reference's DuplicateDetection
    (data_quality/data_manipulation/spark/duplicate_detection.py:75-80,
    a plain ``dropDuplicates(pk_cols)``) recast for unbounded streams:
    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    watermark passes, so state is bounded by (arrival rate x delay) instead
    of growing with the corpus — the only formulation that survives a
    10^12-clip stream. Redelivered rows (at-least-once transports re-sending
    the same clip_id with a jittered ingest_ts) collapse to one row as long
    as they arrive within the watermark delay of each other.

    On a batch frame this degrades to exact ``dropDuplicates`` over the same
    keys — the parity contract the tests assert.
    """
    keys = list(keys or ["clip_id"])
    if df.isStreaming:
        return df.withWatermark(
            event_col, f"{watermark_sec} seconds"
        ).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def windowed_transcript_tokens(
    df: DataFrame,
    window_sec: int = 60,
    watermark_sec: int = 30,
    prefix_len: int = 2,
) -> Column | DataFrame:
    """Per-window transcript token counts — text feature path of the same
    windowing (documents-pipeline ops applied to the stream)."""
    from ..functions.text import token_count

    return (
        df.withColumn("prefix", F.substring("clip_id", 1, prefix_len))
        .withColumn("n_tokens", token_count(F.col("transcript")))
        .withWatermark("ingest_ts", f"{watermark_sec} seconds")
        .groupBy(F.window("ingest_ts", f"{window_sec} seconds").alias("window"), "prefix")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "prefix",
            "n_clips",
            "sum_tokens",
        )
    )


def ohlc_windows(
    df: DataFrame,
    window_sec: int = 60,
    watermark_sec: int = 30,
    prefix_len: int = 2,
    featured: bool = False,
) -> DataFrame:
    """Per-prefix OHLC downsample of clip energy — the reference's plot
    verb (TSQB:800-855; batch form operators/timeseries.plot_ohlc) on the
    stream. The reference's min/max-over-struct window trick becomes the
    native ``min_by``/``max_by`` aggregates (SURVEY §2.4), so this is a
    plain stateful hash aggregate: one shuffle, scalar state per window.
    (clip_id, ingest_ts) tie-breaks keep the picks deterministic.

    ``featured=True``: df already carries (prefix, ingest_ts, energy) —
    any keyed value stream (e.g. a generic tag/ts/value table) rides the
    same operator without the clip decode stage; ties then break on
    (ingest_ts, energy), the batch plot verb's ordering."""
    feats = (df if featured else clip_features(df, prefix_len)).withWatermark(
        "ingest_ts", f"{watermark_sec} seconds"
    )
    tie = "clip_id" if "clip_id" in feats.columns else "energy"
    ordkey = F.struct("ingest_ts", tie)
    agg = feats.groupBy(
        F.window("ingest_ts", f"{window_sec} seconds").alias("w"), "prefix"
    ).agg(
        F.min_by("energy", ordkey).alias("open"),
        F.max("energy").alias("high"),
        F.min("energy").alias("low"),
        F.max_by("energy", ordkey).alias("close"),
        F.count(F.lit(1)).alias("n_clips"),
    )
    return agg.select(
        F.col("w.start").alias("window_start"), "prefix",
        "open", "high", "low", "close", "n_clips",
    )


def circular_avg_windows(
    df: DataFrame,
    window_sec: int = 60,
    lo: float = 0.0,
    hi: float = 1.0,
    watermark_sec: int = 30,
    prefix_len: int = 2,
    featured: bool = False,
) -> DataFrame:
    """Per-prefix circular average of clip energy — the reference's
    circular_average verb (TSQB:1570-1719) as a native windowed aggregate:
    scale [lo, hi) to radians, average cos/sin (algebraic partials,
    map-side combined), atan2 recompose, rescale (TSQB:1591,1597). The
    wrap-around property — values just below hi and just above lo average
    to the boundary, not the midpoint — is what a plain avg cannot give.
    ``featured=True`` skips the clip decode (df already has prefix/
    ingest_ts/energy)."""
    span = hi - lo
    feats = (df if featured else clip_features(df, prefix_len)).withWatermark(
        "ingest_ts", f"{watermark_sec} seconds"
    )
    rad = (F.col("energy") - F.lit(lo)) / F.lit(span) * F.lit(2.0) * F.lit(_PI)
    agg = (
        feats.withColumn("__c", F.cos(rad))
        .withColumn("__s", F.sin(rad))
        .groupBy(F.window("ingest_ts", f"{window_sec} seconds").alias("w"), "prefix")
        .agg(
            F.avg("__c").alias("mc"),
            F.avg("__s").alias("ms"),
            F.count(F.lit(1)).alias("n_clips"),
        )
    )
    ang = F.atan2(F.col("ms"), F.col("mc"))  # (-pi, pi]
    ang = F.when(ang < 0, ang + F.lit(2.0) * F.lit(_PI)).otherwise(ang)
    return agg.select(
        F.col("w.start").alias("window_start"), "prefix",
        (F.lit(lo) + ang / (F.lit(2.0) * F.lit(_PI)) * F.lit(span)).alias("circ_avg"),
        # resultant length R: dispersion measure, sqrt(-2 ln R) = circ stddev
        F.sqrt(F.col("mc") * F.col("mc") + F.col("ms") * F.col("ms")).alias("r_len"),
        "n_clips",
    )


def summary_windows(
    df: DataFrame,
    window_sec: int = 60,
    watermark_sec: int = 30,
    prefix_len: int = 2,
    featured: bool = False,
) -> DataFrame:
    """Per-prefix windowed summary of clip energy — the reference's summary
    verb (TSQB:304-382: count/avg/min/max/stddev/sum/var per tag) on the
    stream. All algebraic aggregates (stddev/var fold as sum/sum-of-squares
    partials), so the whole verb is one map-side-combined stateful hash
    aggregate. ``featured=True`` skips the clip decode."""
    feats = (df if featured else clip_features(df, prefix_len)).withWatermark(
        "ingest_ts", f"{watermark_sec} seconds"
    )
    agg = feats.groupBy(
        F.window("ingest_ts", f"{window_sec} seconds").alias("w"), "prefix"
    ).agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.avg("energy").alias("avg_energy"),
        F.min("energy").alias("min_energy"),
        F.max("energy").alias("max_energy"),
        F.sum("energy").alias("sum_energy"),
        F.sum(F.col("energy") * F.col("energy")).alias("ss_energy"),
    )
    # variance from algebraic (sum, sum-of-squares) partials instead of
    # F.variance's merged (mean, M2) pairs: the sums are plain map-side
    # combines (cheaper state), and on exact inputs (integer-valued
    # energies) the result is a deterministic IEEE expression — which is
    # what lets the registry's event-stream variant hash-match a DuckDB
    # oracle bit-for-bit. GREATEST clamps the epsilon-negative cancellation
    # case (all-equal values).
    n = F.col("n_clips").cast("double")
    var = F.when(
        F.col("n_clips") > 1,
        F.greatest(
            (F.col("ss_energy") - F.col("sum_energy") * F.col("sum_energy") / n)
            / (n - F.lit(1.0)),
            F.lit(0.0),
        ),
    )
    return agg.select(
        F.col("w.start").alias("window_start"), "prefix", "n_clips",
        "avg_energy", "min_energy", "max_energy",
        F.sqrt(var).alias("stddev_energy"), "sum_energy",
        var.alias("var_energy"),
    )


CODEC_DIM_ROWS = [
    # (codec, bits_per_sample, compression_ratio, decoder)
    ("pcm16", 16, 1.0, "linear"),
    ("ulaw", 8, 2.0, "g711u"),
]


def enrich_with_codec_dim(df: DataFrame, dim: DataFrame | None = None) -> DataFrame:
    """Stream-static broadcast join: decorate the clip stream with per-codec
    decoder parameters — the reference's metadata/UoM decoration
    (TSQB:430-462, broadcast-joined dimension per SURVEY §2.3) in its
    streaming form. A static dimension joined to a stream needs no
    watermark and no state: Spark re-broadcasts the dim per micro-batch,
    so at 1000 executors the only cost is the tiny broadcast."""
    spark = df.sparkSession
    if dim is None:
        dim = spark.createDataFrame(
            CODEC_DIM_ROWS,
            "codec string, bits_per_sample int, compression_ratio double, decoder string",
        )
    return df.join(F.broadcast(dim), "codec", "left")
