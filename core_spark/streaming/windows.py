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


def percentile_windows(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    every_sec: int,
    ps: tuple[float, ...] = (0.5, 0.9, 0.95, 0.99),
    watermark_sec: int = 30,
) -> DataFrame:
    """EXACT per-(key, tumbling-bucket) percentiles on a stream.

    Exact quantiles are not an algebraic aggregate — a plain windowed agg
    can only give sketches (percentile_approx). This operator buffers each
    open bucket's values in group state (``applyInPandasWithState``) and
    emits once the event-time timeout fires, i.e. when the watermark passes
    the bucket end — the streaming recast of the batch ``percentiles`` verb
    (operators/timeseries.percentiles) with identical type-7 arithmetic
    (``pos=(n-1)p; v[k] + (v[k+1]-v[k])*(pos-k)``), evaluated in the same
    IEEE order, so closed buckets match the batch/SQL result bit-for-bit.

    State bound: one float64 per buffered row, held only for open buckets —
    watermark delay + bucket width caps the live span per key; a closed
    bucket's state is freed on emission. Late rows beyond the watermark are
    dropped by the engine (never double-emitted: the timeout fires only
    once the watermark passed the bucket, so a later row for it is by
    definition late). For sketch-sized state at extreme rates, the
    algebraic path is ``summary_windows``/``percentile_approx``.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    labels = [str(int(round(p * 100))) for p in ps]
    out_schema = (
        "tagname string, event_time timestamp, cnt long, "
        + ", ".join(f"p{lab} double" for lab in labels)
    )

    src = df.select(
        F.col(key_col).cast("string").alias("k"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("v"),
    )
    if src.isStreaming:
        src = src.withWatermark("ts", f"{watermark_sec} seconds")
    # keep the watermarked ts column in the projection: event-time timeout
    # requires the watermark column to survive into the stateful operator
    keyed = src.select(
        "k",
        ((F.unix_timestamp("ts") / every_sec).cast("long") * every_sec).alias("bs"),
        "v",
        "ts",
    )

    def fn(key, pdfs, state: GroupState):
        k, bs = key[0], int(key[1])
        end_ms = (bs + every_sec) * 1000
        if state.hasTimedOut:
            (vals,) = tuple(state.get)
            v = np.sort(np.asarray(vals, dtype=np.float64))
            n = len(v)
            row = {
                "tagname": k,
                "event_time": pd.Timestamp(bs, unit="s"),
                "cnt": n,
            }
            for p, lab in zip(ps, labels):
                pos = (n - 1) * float(p)
                kk = int(pos)
                frac = pos - kk
                lo, hi = v[kk], v[min(kk + 1, n - 1)]
                row[f"p{lab}"] = lo + (hi - lo) * frac
            state.remove()
            yield pd.DataFrame([row])
            return
        vals = list(tuple(state.get)[0]) if state.exists else []
        for pdf in pdfs:
            vals.extend(pdf["v"].to_numpy(dtype=np.float64).tolist())
        if vals:
            state.update((vals,))
            state.setTimeoutTimestamp(
                max(end_ms, state.getCurrentWatermarkMs() + 1)
            )
        yield from ()

    return keyed.groupBy("k", "bs").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="vals array<double>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def topk_windows(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    every_sec: int,
    k: int = 3,
    watermark_sec: int = 30,
) -> DataFrame:
    """Top-k rows by value per (key, tumbling bucket) on a stream — the
    streaming recast of operators/timeseries.topk_by_bucket (itself the
    windowed generalization of the reference's k=1 argmax,
    pcdm_latest_to_delta.py:150-169).

    Unlike exact percentiles, top-k IS incrementally maintainable with
    O(k) state: each open bucket's group state holds only the current k
    best (value DESC, ts ASC tiebreak) candidates, folded per micro-batch;
    the ranked rows emit when the event-time timeout fires (watermark past
    bucket end). State per open bucket = k (value, ts) pairs — constant,
    regardless of input rate.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "tagname string, bucket timestamp, rank int, "
        "event_time timestamp, value double"
    )

    src = df.select(
        F.col(key_col).cast("string").alias("tag"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("v"),
    )
    if src.isStreaming:
        src = src.withWatermark("ts", f"{watermark_sec} seconds")
    # ts stays in the projection: event-time timeout needs the watermarked
    # column visible to the stateful operator
    keyed = src.select(
        "tag",
        ((F.unix_timestamp("ts") / every_sec).cast("long") * every_sec).alias("bs"),
        (F.unix_millis(F.col("ts").cast("timestamp"))).alias("ts_ms"),
        "v",
        "ts",
    )

    def fn(key, pdfs, state: GroupState):
        tag, bs = key[0], int(key[1])
        end_ms = (bs + every_sec) * 1000
        if state.hasTimedOut:
            vs, ts = (list(x) for x in tuple(state.get))
            order = sorted(range(len(vs)), key=lambda i: (-vs[i], ts[i]))
            out = [
                {
                    "tagname": tag,
                    "bucket": pd.Timestamp(bs, unit="s"),
                    "rank": r + 1,
                    "event_time": pd.Timestamp(ts[i], unit="ms"),
                    "value": vs[i],
                }
                for r, i in enumerate(order[:k])
            ]
            state.remove()
            yield pd.DataFrame(out)
            return
        vs, ts = (list(x) for x in tuple(state.get)) if state.exists else ([], [])
        for pdf in pdfs:
            vs.extend(pdf["v"].to_numpy(dtype=np.float64).tolist())
            ts.extend(pdf["ts_ms"].to_numpy(dtype=np.int64).tolist())
        if vs:
            order = sorted(range(len(vs)), key=lambda i: (-vs[i], ts[i]))[:k]
            vs, ts = [vs[i] for i in order], [ts[i] for i in order]
            state.update((vs, ts))
            state.setTimeoutTimestamp(
                max(end_ms, state.getCurrentWatermarkMs() + 1)
            )
        yield from ()

    return keyed.groupBy("tag", "bs").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="vs array<double>, tss array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
