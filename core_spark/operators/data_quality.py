"""Data-quality operators, distributed re-expressions of the reference's
``pipelines/data_quality`` + ``pipelines/monitoring`` components.

Every operator here is a pure DataFrame transform (no driver collect loops —
the reference's interval_filtering.py:65-122 collect() loop and
missing_value_imputation.py per-tag Python loops are deliberately replaced,
see SURVEY §7.5). Grouped sequential logic uses ``applyInPandas`` so work is
Arrow-batched per tag partition and scales with executors.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .timeseries import TAG, TS, VAL, ST, TSSpec, scan


def duplicate_detection(df: DataFrame, pk_cols: Sequence[str]) -> DataFrame:
    """dropDuplicates on primary-key columns
    (reference duplicate_detection.py:75-80). Streaming variant:
    ``dropDuplicatesWithinWatermark`` — see streaming.sink."""
    return df.dropDuplicates(list(pk_cols))


def k_sigma_anomaly_filter(
    df: DataFrame,
    spec: TSSpec,
    k: float = 3.0,
    use_median: bool = False,
) -> DataFrame:
    """Keep rows within mean±k*sigma (or median±k*MAD)
    (reference k_sigma_anomaly_detection.py:102-146).

    Bounds are computed per tag with a single hash aggregate and joined
    back broadcast — not collected to the driver, so the operator works
    at any tag cardinality.
    """
    base = scan(df, spec)
    if use_median:
        med = base.groupBy(TAG).agg(
            F.percentile_approx(VAL, 0.5).alias("__m")
        )
        mad = (
            base.join(F.broadcast(med), TAG)
            .withColumn("__ad", F.abs(F.col(VAL) - F.col("__m")))
            .groupBy(TAG)
            .agg(F.percentile_approx("__ad", 0.5).alias("__s"), F.first("__m").alias("__m"))
        )
        bounds = mad.select(
            TAG,
            (F.col("__m") - k * 1.4826 * F.col("__s")).alias("__lo"),
            (F.col("__m") + k * 1.4826 * F.col("__s")).alias("__hi"),
        )
    else:
        stats = base.groupBy(TAG).agg(
            F.avg(VAL).alias("__mu"), F.stddev(VAL).alias("__sd")
        )
        bounds = stats.select(
            TAG,
            (F.col("__mu") - k * F.col("__sd")).alias("__lo"),
            (F.col("__mu") + k * F.col("__sd")).alias("__hi"),
        )
    return (
        base.join(F.broadcast(bounds), TAG)
        .filter(F.col(VAL).between(F.col("__lo"), F.col("__hi")))
        .select(TAG, TS, VAL, ST)
    )


def out_of_range_filter(
    df: DataFrame,
    spec: TSSpec,
    min_value: float,
    max_value: float,
    inclusive: bool = True,
) -> DataFrame:
    """Bound-predicate delete (reference out_of_range_value_filter.py:112,
    check_value_ranges.py:132-150)."""
    base = scan(df, spec)
    if inclusive:
        cond = F.col(VAL).between(min_value, max_value)
    else:
        cond = (F.col(VAL) > min_value) & (F.col(VAL) < max_value)
    return base.filter(cond)


def flatline_runs(
    df: DataFrame,
    spec: TSSpec,
    min_run_length: int = 3,
    flat_values: Sequence[float] = (0.0,),
) -> DataFrame:
    """Detect runs of 'flat' values (null/zero by default) of length >= N
    per tag (reference flatline_detection.py:130-200).

    lag-based change flag -> running sum run-id -> groupBy(run): two
    per-tag window passes + one aggregate, no driver loop.
    """
    base = scan(df, spec)
    w = Window.partitionBy(TAG).orderBy(TS)
    is_flat = F.col(VAL).isNull() | F.col(VAL).isin(list(flat_values))
    marked = base.withColumn("__flat", is_flat)
    changed = (
        F.col("__flat").cast("int")
        != F.coalesce(F.lag("__flat").over(w).cast("int"), F.lit(-1))
    ).cast("int")
    runs = marked.withColumn(
        "__run", F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        runs.filter(F.col("__flat"))
        .groupBy(TAG, "__run")
        .agg(
            F.min(TS).alias("run_start"),
            F.max(TS).alias("run_end"),
            F.count(F.lit(1)).alias("run_length"),
        )
        .filter(F.col("run_length") >= min_run_length)
        .select(TAG, "run_start", "run_end", "run_length")
    )


def flatline_filter(
    df: DataFrame,
    spec: TSSpec,
    min_run_length: int = 3,
    flat_values: Sequence[float] = (0.0,),
) -> DataFrame:
    """Remove rows belonging to flatline runs (reference flatline_filter.py:83)."""
    runs = flatline_runs(df, spec, min_run_length, flat_values)
    base = scan(df, spec)
    cond = (
        (base[TAG] == runs[TAG])
        & (base[TS] >= runs["run_start"])
        & (base[TS] <= runs["run_end"])
    )
    return base.join(F.broadcast(runs), cond, "left_anti")


def missing_data_intervals(
    df: DataFrame,
    spec: TSSpec,
    expected_interval_seconds: float,
    tolerance_seconds: float = 0.0,
) -> DataFrame:
    """Report gaps where ts - lag(ts) > expected + tolerance per tag
    (reference identify_missing_data_interval.py:118-141).

    This lag-gap rule is also the session-boundary detector used by
    streaming.sessions.
    """
    base = scan(df, spec)
    w = Window.partitionBy(TAG).orderBy(TS)
    prev = F.lag(TS).over(w)
    gap = F.unix_timestamp(TS).cast("double") - F.unix_timestamp(prev).cast("double")
    return (
        base.withColumn("gap_start", prev)
        .withColumn("gap_seconds", F.round(gap, 3))
        .filter(F.col("gap_seconds") > expected_interval_seconds + tolerance_seconds)
        .select(TAG, F.col("gap_start"), F.col(TS).alias("gap_end"), "gap_seconds")
    )


def interval_filtering(
    df: DataFrame,
    spec: TSSpec,
    min_interval_seconds: float,
    chunk_rows: int | None = None,
) -> DataFrame:
    """Thin each tag's series to rows >= min_interval apart.

    The keep/drop decision depends on the previous *kept* row, which no
    window function expresses; the reference does a driver-side collect()
    loop (interval_filtering.py:65-122) — here it is an Arrow-batched
    sequential pass per tag via applyInPandas (parallel across tags,
    the natural unit of this operator).

    Default path bound: one tag's history must fit a single pandas frame
    (~16 B/row -> a 100M-row tag is ~1.6 GB). For hotter tags pass
    ``chunk_rows``: the series is time-sliced into per-tag chunks of that
    many rows and processed in ceil(max_tag_rows / chunk_rows) fully
    distributed rounds, each chunk receiving the previous round's
    last-KEPT timestamp as carry-in — bit-identical to the single pass
    (the keep-chain state is exactly that one timestamp, and both paths
    order ties by the full (TS, VAL, ST) key so duplicate timestamps
    pick the same representative), with per-task
    memory bounded by chunk_rows regardless of tag skew
    (tests/test_dq_chunking.py::test_interval_filtering_chunked_exact).
    Per round the driver holds one (tag, carry_ts) pair per distinct tag —
    bounded metadata, same budget class as the normalization stats.
    """
    base = scan(df, spec)
    out_schema = f"{TAG} string, {TS} timestamp, {VAL} double, {ST} string"

    def _thin(pdf: pd.DataFrame, last_kept=None) -> pd.DataFrame:
        # full (TS, VAL, ST) sort key, NULLS FIRST to match Spark's ASC
        # ordering: duplicate timestamps then have ONE deterministic order
        # in both the single-pass and chunked paths, so the kept
        # representative of a tie never depends on arrival order or on
        # which side of a __chunk boundary the tie lands
        pdf = pdf.sort_values([TS, VAL, ST], na_position="first")
        keep = []
        for t in pdf[TS]:
            if last_kept is None or (t - last_kept).total_seconds() >= min_interval_seconds:
                keep.append(True)
                last_kept = t
            else:
                keep.append(False)
        return pdf[pd.Series(keep, index=pdf.index)]

    if chunk_rows is None:
        # 1-arg wrapper: applyInPandas dispatches on arity, and _thin's
        # optional carry param would make it look like a (key, pdf) fn
        return base.groupBy(TAG).applyInPandas(
            lambda pdf: _thin(pdf), schema=out_schema
        )

    # (TS, VAL, ST) ordering mirrors _thin's pandas sort exactly, so chunk
    # assignment of tied timestamps is deterministic and identical to the
    # single-pass tie order — the bit-identical guarantee holds WITH
    # duplicate (tag, ts) rows, not just unique ones
    w = Window.partitionBy(TAG).orderBy(TS, VAL, ST)
    # localCheckpoint (not persist): the chunk assignment must be computed
    # exactly once — a persisted block evicted between rounds would be
    # recomputed, and row_number over tied timestamps could renumber,
    # moving a tie-row across a __chunk boundary (duplicated or dropped)
    chunked = base.withColumn(
        "__chunk",
        ((F.row_number().over(w) - F.lit(1)) / F.lit(chunk_rows)).cast("long"),
    ).localCheckpoint(eager=True)
    last = chunked.agg(F.max("__chunk")).collect()[0][0]
    if last is None:
        return base.limit(0).select(TAG, TS, VAL, ST)
    # carry crosses the driver as epoch-MICROS longs, never datetimes:
    # collect() renders TimestampType in the DRIVER's local timezone while
    # Arrow renders worker frames in the SESSION timezone — on a non-UTC
    # driver host a datetime carry would be offset by hours. The epoch long
    # is unambiguous; the closure renders it back to the session-tz naive
    # wall clock (the exact Arrow domain _thin compares in).
    sess_tz = df.sparkSession.conf.get("spark.sql.session.timeZone") or "UTC"
    carry: dict = {}  # tag -> last kept ts (epoch micros) of prior chunks
    parts = []

    def _make_thin(c: dict):
        def thin_k(key, pdf: pd.DataFrame) -> pd.DataFrame:
            us = c.get(key[0])
            lk = (
                pd.Timestamp(us, unit="us", tz="UTC")
                .tz_convert(sess_tz)
                .tz_localize(None)
                if us is not None
                else None
            )
            return _thin(pdf, lk)

        return thin_k

    for k in range(int(last) + 1):
        thin_k = _make_thin(dict(carry))  # freeze this round's carry
        kept = (
            chunked.filter(F.col("__chunk") == k)
            .drop("__chunk")
            .groupBy(TAG)
            .applyInPandas(thin_k, schema=out_schema)
            .localCheckpoint(eager=True)  # pin before carry mutates
        )
        for r in kept.groupBy(TAG).agg(
            F.max(F.unix_micros(F.col(TS))).alias("__m")
        ).collect():
            us = r["__m"]
            if r[TAG] not in carry or us > carry[r[TAG]]:
                carry[r[TAG]] = us
        parts.append(kept)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def moving_average(
    df: DataFrame,
    spec: TSSpec,
    window_size: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Rolling mean over the trailing N rows per tag
    (reference moving_average.py:120-136)."""
    base = scan(df, spec)
    w = (
        Window.partitionBy(TAG)
        .orderBy(TS)
        .rowsBetween(-(window_size - 1), 0)
    )
    return base.withColumn("moving_avg", F.round(F.avg(VAL).over(w), round_digits))


def normalize_zscore(df: DataFrame, spec: TSSpec, round_digits: int = 6) -> DataFrame:
    """Per-tag z-score. The reference collects global stats to the driver
    (normalization_zscore.py:49-50); here stats stay distributed via a
    broadcast self-join so the operator composes into larger plans."""
    base = scan(df, spec)
    stats = base.groupBy(TAG).agg(
        F.avg(VAL).alias("__mu"), F.stddev(VAL).alias("__sd")
    )
    return (
        base.join(F.broadcast(stats), TAG)
        .withColumn(
            "value_norm",
            F.round((F.col(VAL) - F.col("__mu")) / F.col("__sd"), round_digits),
        )
        .select(TAG, TS, VAL, "value_norm")
    )


def impute_missing(
    df: DataFrame,
    spec: TSSpec,
    expected_interval_seconds: float | None = None,
    round_digits: int = 6,
    chunk_rows: int | None = 1_000_000,
) -> DataFrame:
    """Missing-value imputation: detect each tag's expected cadence, insert
    rows on the missing grid points, fill values by linear interpolation.

    Re-expression of the reference's MissingValueImputation
    (missing_value_imputation.py:139-220): its modal-interval detection +
    python-UDF timestamp generation + driver-side scipy spline become one
    Arrow-batched pass per tag (np.interp == the reference's interpolation
    for the piecewise-linear case); tags process in parallel across
    executors instead of a driver loop (anti-pattern list, SURVEY §7.5).

    Straggler/OOM guard: with an EXPLICIT cadence the fill is exactly
    chunkable — each consecutive-row segment's missing points depend only
    on its two endpoints and the tag's global grid anchor (min ts), so the
    series splits into ``chunk_rows`` row chunks with a one-row halo and a
    window-min anchor column; a hot tag becomes n/chunk_rows parallel tasks
    (bit-identical output, tests/test_dq_chunking.py). Modal-interval
    detection needs the whole series' diff distribution, so cadence-less
    calls keep the one-group-per-tag path: its bound is one pandas frame
    per tag — pass the cadence for tags whose history exceeds executor
    memory.
    """
    base = scan(df, spec)
    if expected_interval_seconds is not None and chunk_rows is not None:
        return _impute_missing_chunked(
            base, float(expected_interval_seconds), round_digits, int(chunk_rows)
        )

    def fill(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(TS)
        ts = pdf[TS].astype("int64").to_numpy() // 1_000_000_000
        if len(ts) < 2:
            out = pdf.copy()
            out["imputed"] = False
            return out
        diffs = np.diff(ts)
        if expected_interval_seconds is not None:
            step = float(expected_interval_seconds)
        else:
            vals, counts = np.unique(diffs, return_counts=True)
            step = float(vals[np.argmax(counts)])  # modal interval (:153-160)
        if step <= 0:
            out = pdf.copy()
            out["imputed"] = False
            return out
        grid = np.arange(ts[0], ts[-1] + 1, step)
        missing = grid[~np.isin(grid, ts)]
        filled_vals = np.interp(missing, ts, pdf[VAL].to_numpy(dtype=float))
        add = pd.DataFrame(
            {
                TAG: pdf[TAG].iloc[0],
                TS: pd.to_datetime(missing, unit="s"),
                VAL: np.round(filled_vals, round_digits),
                ST: "Good",
                "imputed": True,
            }
        )
        out = pdf.copy()
        out["imputed"] = False
        return pd.concat([out, add], ignore_index=True)

    return base.groupBy(TAG).applyInPandas(
        fill,
        schema=f"{TAG} string, {TS} timestamp, {VAL} double, {ST} string, imputed boolean",
    )


def _impute_missing_chunked(
    base: DataFrame, step: float, round_digits: int, chunk_rows: int
) -> DataFrame:
    """Chunked form of impute_missing for an explicit cadence — see the
    public docstring. Grid points are generated per consecutive-row segment
    owned by its LEFT endpoint, as ``anchor + i*step`` (the same float
    expression np.arange uses), so chunked output matches the single-pass
    form exactly."""
    C = max(chunk_rows, 2)
    wp = Window.partitionBy(TAG)
    w = wp.orderBy(TS)
    b2 = base.withColumn("__rn", F.row_number().over(w) - F.lit(1)).withColumn(
        "__anchor", F.min(TS).over(wp)
    )
    core = b2.withColumn("__chunk", F.floor(F.col("__rn") / C)).withColumn(
        "__core", F.lit(True)
    )
    # one-row right halo: each chunk's first row also feeds the previous
    # chunk (the bracketing endpoint of its last segment)
    halo = b2.filter((F.col("__rn") % C == 0) & (F.col("__rn") >= C)).select(
        "*",
        (F.floor(F.col("__rn") / C) - 1).alias("__chunk"),
        F.lit(False).alias("__core"),
    )
    u = core.unionByName(halo)

    def fill_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("__rn").reset_index(drop=True)
        drop = ["__rn", "__anchor", "__chunk", "__core"]
        is_core = pdf["__core"].to_numpy()
        out = pdf[is_core].drop(columns=drop).copy()
        out["imputed"] = False
        if step <= 0 or len(pdf) < 2:
            return out
        anchor = float(pdf["__anchor"].iloc[0].value // 1_000_000_000)
        ts = (pdf[TS].astype("int64") // 1_000_000_000).to_numpy().astype(float)
        vals = pdf[VAL].to_numpy(dtype=float)
        miss_t: list[np.ndarray] = []
        miss_v: list[np.ndarray] = []
        # segments owned by their left endpoint (last core row of the last
        # chunk has no successor -> no segment, same as the global pass)
        for i in range(len(pdf) - 1):
            if not is_core[i]:
                continue
            a, b, va, vb = ts[i], ts[i + 1], vals[i], vals[i + 1]
            if b <= a:
                continue
            i_lo = int(np.floor((a - anchor) / step))
            i_hi = int(np.ceil((b - anchor) / step)) + 1
            g = anchor + np.arange(i_lo, i_hi, dtype=float) * step
            g = g[(g > a) & (g < b)]
            if len(g):
                miss_t.append(g)
                miss_v.append(np.interp(g, [a, b], [va, vb]))
        # trailing fractional grid point past the series end (np.arange's
        # half-open stop at ts_last + 1): only the series' true last row
        # (a core row with no halo after it) can own it
        if is_core[-1]:
            a = ts[-1]
            i_lo = int(np.floor((a - anchor) / step))
            i_hi = int(np.ceil((a + 1 - anchor) / step)) + 1
            g = anchor + np.arange(i_lo, i_hi, dtype=float) * step
            g = g[(g > a) & (g < a + 1)]
            if len(g):
                miss_t.append(g)
                miss_v.append(np.repeat(vals[-1], len(g)))
        if miss_t:
            mt = np.concatenate(miss_t)
            mv = np.round(np.concatenate(miss_v), round_digits)
            add = pd.DataFrame(
                {
                    TAG: pdf[TAG].iloc[0],
                    TS: pd.to_datetime(mt, unit="s"),
                    VAL: mv,
                    ST: "Good",
                    "imputed": True,
                }
            )
            out = pd.concat([out, add], ignore_index=True)
        return out

    return u.groupBy(TAG, "__chunk").applyInPandas(
        fill_chunk,
        schema=f"{TAG} string, {TS} timestamp, {VAL} double, {ST} string, imputed boolean",
    )


def gaussian_smooth(
    df: DataFrame,
    spec: TSSpec,
    sigma: float = 2.0,
    round_digits: int = 6,
    chunk_rows: int | None = 1_000_000,
) -> DataFrame:
    """Per-tag Gaussian kernel smoothing of the value series.

    The reference collects the whole tag series into every row via
    collect_list over an unbounded window and calls scipy per row —
    O(n^2) work and bytes (gaussian_smoothing.py:120-146). Here: one
    np.convolve per chunk inside applyInPandas, O(n * kernel).

    Straggler/OOM guard: the truncated kernel (radius = 3*sigma rows) makes
    the convolution exactly chunkable — each tag's series is split into
    ``chunk_rows`` row chunks with a radius-row halo copied from the
    neighbours, so one pathologically hot tag becomes n/chunk_rows parallel
    tasks instead of one task holding the whole history in a single pandas
    frame. Interior chunk edges see real halo values; only true series
    edges get the edge padding, so chunked output is bit-identical to the
    single-pass form (tests/test_dq_chunking.py). ``chunk_rows=None`` keeps
    the one-group-per-tag fast path (one shuffle instead of two).
    """
    base = scan(df, spec)
    radius = max(1, int(3.0 * sigma))

    def _kernel():
        import numpy as np

        x = np.arange(-radius, radius + 1, dtype=float)
        k = np.exp(-0.5 * (x / sigma) ** 2)
        return k / k.sum()

    if chunk_rows is None:
        def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
            import numpy as np

            pdf = pdf.sort_values(TS).reset_index(drop=True)
            v = pdf[VAL].to_numpy(dtype=float)
            padded = np.pad(v, radius, mode="edge")
            pdf["value_smooth"] = np.round(
                np.convolve(padded, _kernel(), "valid"), round_digits
            )
            return pdf

        return base.groupBy(TAG).applyInPandas(
            smooth,
            schema=f"{TAG} string, {TS} timestamp, {VAL} double, {ST} string, value_smooth double",
        )

    C = max(int(chunk_rows), 2 * radius + 1)
    w = Window.partitionBy(TAG).orderBy(TS)
    b2 = base.withColumn("__rn", F.row_number().over(w) - F.lit(1))
    core = b2.withColumn("__chunk", F.floor(F.col("__rn") / C)).withColumn(
        "__core", F.lit(True)
    )
    # rows near a chunk's end also serve as the NEXT chunk's left halo, and
    # rows near its start as the PREVIOUS chunk's right halo
    left_halo = b2.filter(F.col("__rn") % C >= C - radius).select(
        "*",
        (F.floor(F.col("__rn") / C) + 1).alias("__chunk"),
        F.lit(False).alias("__core"),
    )
    right_halo = b2.filter(
        (F.col("__rn") % C < radius) & (F.col("__rn") >= C)
    ).select(
        "*",
        (F.floor(F.col("__rn") / C) - 1).alias("__chunk"),
        F.lit(False).alias("__core"),
    )
    u = core.unionByName(left_halo).unionByName(right_halo)

    def smooth_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("__rn").reset_index(drop=True)
        is_core = pdf["__core"].to_numpy()
        if not is_core.any():  # halo-only spill past the last chunk
            return pdf.iloc[0:0].drop(columns=["__rn", "__chunk", "__core"]).assign(
                value_smooth=pd.Series(dtype=float)
            )
        v = pdf[VAL].to_numpy(dtype=float)
        n_left = int(np.argmax(is_core))  # leading halo rows
        n_right = int(np.argmax(is_core[::-1]))  # trailing halo rows
        # short halos occur exactly at true series edges -> edge padding
        # there reproduces the single-pass behaviour (v[0]/v[-1] are then
        # the series' own first/last values)
        padded = np.concatenate(
            [np.repeat(v[0], radius - n_left), v, np.repeat(v[-1], radius - n_right)]
        )
        sm = np.round(np.convolve(padded, _kernel(), "valid"), round_digits)
        out = pdf[is_core].copy()
        out["value_smooth"] = sm  # valid conv length == core row count
        return out.drop(columns=["__rn", "__chunk", "__core"])

    return u.groupBy(TAG, "__chunk").applyInPandas(
        smooth_chunk,
        schema=f"{TAG} string, {TS} timestamp, {VAL} double, {ST} string, value_smooth double",
    )


def fixed_width_binning(
    df: DataFrame,
    spec: TSSpec,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Assign each value to a fixed-width bin over [lo, hi) — the engine's
    deterministic replacement for the reference's k-means DataBinning
    (data_binning.py:21; k-means centroids are seed/order-dependent, so a
    grid binning is what a cross-engine-checkable pipeline wants).
    Out-of-range values clamp to the edge bins, mirroring width_bucket."""
    base = scan(df, spec)
    width = (hi - lo) / n_bins
    raw = F.floor((F.col(VAL) - F.lit(lo)) / F.lit(width))
    bin_c = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("long")
    return base.withColumn("bin", bin_c)


def normalize_minmax(df: DataFrame, spec: TSSpec, round_digits: int = 6) -> DataFrame:
    """Per-tag min-max scaling (reference normalization_minmax.py:49-78)."""
    base = scan(df, spec)
    stats = base.groupBy(TAG).agg(F.min(VAL).alias("__lo"), F.max(VAL).alias("__hi"))
    return (
        base.join(F.broadcast(stats), TAG)
        .withColumn(
            "value_norm",
            F.round(
                (F.col(VAL) - F.col("__lo")) / (F.col("__hi") - F.col("__lo")),
                round_digits,
            ),
        )
        .select(TAG, TS, VAL, "value_norm")
    )


def tag_correlation(
    df: DataFrame,
    spec: TSSpec,
    tag_a: str,
    tag_b: str,
    every_seconds: int = 3600,
    start: str | None = None,
    end: str | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Pearson correlation between two tags' bucket-averaged series — the
    reference's DimensionalityReduction signal (dimensionality_reduction.py:
    27-157: combine columns when corr >= threshold), recast tall-table-first:
    resample both tags onto the same time buckets (exact-decimal averages so
    both engines feed corr identical operands), inner-join on bucket, corr.
    """
    from .timeseries import TS, TAG, resample

    r = resample(
        df, spec, every_seconds, "avg", start, end,
        round_digits=None, exact_decimals=2,
    )
    a = r.filter(F.col(TAG) == tag_a).select(TS, F.col("value").alias("va"))
    b = r.filter(F.col(TAG) == tag_b).select(TS, F.col("value").alias("vb"))
    j = a.join(b, TS, "inner")
    return j.agg(
        F.lit(tag_a).alias("tag_a"),
        F.lit(tag_b).alias("tag_b"),
        F.count(F.lit(1)).alias("n_buckets"),
        F.round(F.corr("va", "vb"), round_digits).alias("corr"),
    )


def dimensionality_reduction(
    df: DataFrame,
    col1: str,
    col2: str,
    threshold: float = 0.9,
    method: str = "mean",
) -> DataFrame:
    """Combine two columns when their |Pearson corr| meets the threshold
    (reference dimensionality_reduction.py:27-157, wide-table operator).

    The reference assembles an MLlib vector column and collects a full
    correlation matrix for two columns; here it is one ``F.corr`` aggregate
    — the only driver traffic is that single scalar, which then *selects a
    projection* (schema depends on the decision, exactly as in the
    reference). Combination methods: mean, sum, first (keep col1), second
    (keep col2), delete (drop both). The reference's 'second' branch drops
    col2 and keeps col1 — identical to 'first' (:152-155), plainly a bug —
    this engine keeps col2 as the name says.

    |corr| matches the reference's matrix[0][1] semantics for the usual
    positive-corr case and treats strong anti-correlation as combinable
    too. threshold=1.0 combines only perfectly-correlated columns (the
    guard mirrors the reference's [0,1] validation, :85-86).
    """
    valid = ["mean", "sum", "first", "second", "delete"]
    if method not in valid:
        raise ValueError(f"combination_method must be one of {valid}")
    if not 0 <= threshold <= 1:
        raise ValueError("Threshold must be between 0 and 1.")
    corr = df.agg(F.corr(col1, col2)).first()[0]
    if corr is None or abs(corr) < threshold:
        return df
    if method == "mean":
        return df.withColumn(col1, (F.col(col1) + F.col(col2)) / 2).drop(col2)
    if method == "sum":
        return df.withColumn(col1, F.col(col1) + F.col(col2)).drop(col2)
    if method == "first":
        return df.drop(col2)
    if method == "second":
        return df.drop(col1)
    return df.drop(col1).drop(col2)


def normalize_mean(df: DataFrame, spec: TSSpec, round_digits: int = 6) -> DataFrame:
    """Per-tag mean normalization: (v - mean) / (max - min)
    (reference normalization_mean.py:49-80). Stats stay distributed via a
    broadcast join like the other normalizers."""
    base = scan(df, spec)
    stats = base.groupBy(TAG).agg(
        F.avg(VAL).alias("__mu"),
        F.min(VAL).alias("__lo"),
        F.max(VAL).alias("__hi"),
    )
    return (
        base.join(F.broadcast(stats), TAG)
        .withColumn(
            "value_norm",
            F.round(
                (F.col(VAL) - F.col("__mu")) / (F.col("__hi") - F.col("__lo")),
                round_digits,
            ),
        )
        .select(TAG, TS, VAL, "value_norm")
    )


def denormalize(
    df: DataFrame,
    spec: TSSpec,
    method: str = "zscore",
    norm_col: str = "value_norm",
    round_digits: int = 6,
) -> DataFrame:
    """Invert a per-tag normalization (reference denormalization.py:74):
    given rows carrying the normalized column plus the ORIGINAL value column
    (from which the per-tag stats are recomputed, exactly as the reference
    re-derives them from the kept raw frame), reconstruct the raw value.

    method in {"zscore", "minmax", "mean"} matching the three normalizers.
    """
    grp = df.groupBy(F.col(spec.tag_col).alias(TAG))
    if method == "zscore":
        stats = grp.agg(
            F.avg(spec.value_col).alias("__mu"), F.stddev(spec.value_col).alias("__sd")
        )
        inv = F.col(norm_col) * F.col("__sd") + F.col("__mu")
    elif method == "minmax":
        stats = grp.agg(
            F.min(spec.value_col).alias("__lo"), F.max(spec.value_col).alias("__hi")
        )
        inv = F.col(norm_col) * (F.col("__hi") - F.col("__lo")) + F.col("__lo")
    elif method == "mean":
        stats = grp.agg(
            F.avg(spec.value_col).alias("__mu"),
            F.min(spec.value_col).alias("__lo"),
            F.max(spec.value_col).alias("__hi"),
        )
        inv = F.col(norm_col) * (F.col("__hi") - F.col("__lo")) + F.col("__mu")
    else:
        raise ValueError(f"unknown method: {method!r}")
    base = scan(df.drop(norm_col), spec).join(
        df.select(
            F.col(spec.tag_col).alias(TAG),
            F.date_trunc("millisecond", F.col(spec.ts_col)).alias(TS),
            norm_col,
        ),
        [TAG, TS],
    )
    return (
        base.join(F.broadcast(stats), TAG)
        .withColumn("value_denorm", F.round(inv, round_digits))
        .select(TAG, TS, norm_col, "value_denorm")
    )


def missing_data_pattern(
    df: DataFrame,
    spec: TSSpec,
    minutes: Sequence[int] = (0, 30),
    seconds: Sequence[int] = (0,),
    tolerance_seconds: float = 60.0,
) -> DataFrame:
    """Expected-tick pattern check (reference
    identify_missing_data_pattern.py:127): each hour of a tag's observed
    span should contain an event within ``tolerance_seconds`` of every
    (minute, second) pattern offset; report the expected ticks with no
    matching event.

    Scale shape: the expected grid is sequence()+explode per tag (rows =
    tags x hours x offsets, tiny next to the event table); event->tick
    matching is a map-side explode over the <=3*len(offsets) candidate
    ticks an event could satisfy, then one left_anti equi-join on
    (tagname, tick) — no range join, no driver loop.
    """
    offsets = sorted({m * 60 + s for m in minutes for s in seconds})
    base = scan(df, spec)
    rng = base.groupBy(TAG).agg(
        F.date_trunc("hour", F.min(TS)).alias("__h0"),
        F.date_trunc("hour", F.max(TS)).alias("__h1"),
    )
    off_arr = F.array(*[F.lit(o) for o in offsets])
    expected = (
        rng.select(
            TAG,
            F.explode(
                F.sequence("__h0", "__h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("__h"),
        )
        .select(
            TAG,
            F.explode(off_arr).alias("__off"),
            F.col("__h"),
        )
        .select(
            TAG,
            (F.col("__h") + F.make_interval(secs=F.col("__off"))).alias("expected_time"),
        )
    )
    # candidate ticks an event can satisfy: same/prev/next hour x offsets
    hour_deltas = F.array(F.lit(-3600), F.lit(0), F.lit(3600))
    matched = (
        base.select(
            TAG,
            F.col(TS).alias("__ts"),
            F.date_trunc("hour", TS).alias("__h"),
        )
        .select(TAG, "__ts", "__h", F.explode(hour_deltas).alias("__hd"))
        .select(TAG, "__ts", "__h", "__hd", F.explode(off_arr).alias("__off"))
        .select(
            TAG,
            "__ts",
            (
                F.col("__h")
                + F.make_interval(secs=F.col("__hd") + F.col("__off"))
            ).alias("__tick"),
        )
        .filter(
            F.abs(
                F.unix_micros("__ts") - F.unix_micros("__tick")
            )
            <= F.lit(int(tolerance_seconds * 1_000_000))
        )
        .select(TAG, F.col("__tick").alias("expected_time"))
        .distinct()
    )
    return expected.join(matched, [TAG, "expected_time"], "left_anti")


def kmeans_binning(
    df: DataFrame,
    spec: TSSpec,
    k: int,
    max_iter: int = 20,
    tol: float = 1e-9,
) -> DataFrame:
    """1-D Lloyd's k-means over the value column — the reference's k-means
    DataBinning (data_binning.py:21-70, pyspark.ml KMeans on a single
    column) as a pure DataFrame program with deterministic initialization.

    Each iteration is one tiny shuffle: assign (pure projection against k
    broadcast centroid literals — in 1-D the nearest centroid is decided by
    the k-1 midpoint boundaries, so assignment is a running comparison sum,
    no distance matrix) then groupBy(bin).avg to re-estimate. Only k rows
    ever reach the driver per iteration, so the loop costs k·max_iter driver
    bytes however large the table is. Init = exact percentiles at
    (2i+1)/2k, which is reproducible across engines and partitionings
    (pyspark.ml's k-means|| init is seed- and partition-order-dependent —
    useless for a cross-engine-checkable pipeline).

    Returns the scanned rows with their final ``bin`` (0..k-1, bins ordered
    by centroid) and the bin's ``centroid`` value.
    """
    base = scan(df, spec)
    qs = [(2 * i + 1) / (2.0 * k) for i in range(k)]
    first = base.agg(F.percentile(VAL, F.array(*[F.lit(q) for q in qs]))).first()
    centroids = sorted(float(c) for c in first[0])

    def assign_expr(cents: list[float]):
        # bin = #boundaries below the value; boundaries = adjacent midpoints
        bounds = [(cents[i] + cents[i + 1]) / 2.0 for i in range(len(cents) - 1)]
        e = F.lit(0)
        for b in bounds:
            e = e + F.when(F.col(VAL) > F.lit(b), 1).otherwise(0)
        return e.cast("long")

    base = base.persist()
    try:
        for _ in range(max_iter):
            est = (
                base.withColumn("bin", assign_expr(centroids))
                .groupBy("bin")
                .agg(F.avg(VAL).alias("c"))
                .collect()
            )
            got = {int(r["bin"]): float(r["c"]) for r in est}
            new = [got.get(i, centroids[i]) for i in range(k)]  # empty bin keeps its centroid
            new = sorted(new)
            shift = max(abs(a - b) for a, b in zip(new, centroids))
            centroids = new
            if shift <= tol:
                break
    finally:
        base.unpersist()

    cent_arr = F.array(*[F.lit(c) for c in centroids])
    out = scan(df, spec).withColumn("bin", assign_expr(centroids))
    return out.withColumn("centroid", F.element_at(cent_arr, F.col("bin").cast("int") + 1))


def validate_schema(
    df: DataFrame,
    expected: "dict | object",
    null_strings: Sequence[str] = ("None", "none", "null", "Null", ""),
) -> DataFrame:
    """Validate + coerce a DataFrame against an expected schema
    (data_quality/input_validator.py:120-170).

    Same contract as the reference's InputValidator.validate: every expected
    column must exist (ValueError otherwise), the null-marker strings are
    normalized to NULL, and type-mismatched columns are cast to the expected
    type — a cast that would *introduce* nulls (i.e. values the target type
    cannot represent) is rejected with ValueError. Returns the coerced
    DataFrame instead of mutating a component in place.

    One Spark job total: the reference counts nulls twice per cast column
    (input_validator.py:154-158 — 2·C full scans); here every cast column's
    introduced-null count comes from a single aggregate over one scan.
    """
    from pyspark.sql.types import DataType, StringType, StructType

    if isinstance(expected, StructType):
        expected = {f.name: f.dataType for f in expected.fields}
    actual = {f.name: f.dataType for f in df.schema.fields}
    markers = list(null_strings)
    for column in expected:
        # marker normalization only applies to string-typed columns: on a
        # numeric column the isin comparison would ANSI-cast 'None' and throw
        if column in actual and isinstance(actual[column], StringType):
            df = df.withColumn(
                column,
                F.when(F.col(column).isin(markers), None).otherwise(F.col(column)),
            )
    cast_cols: list[str] = []
    out = df
    for column, want in expected.items():
        if column not in actual:
            raise ValueError(f"Column '{column}' is missing in the DataFrame.")
        if not isinstance(actual[column], DataType) or not isinstance(want, DataType):
            raise TypeError(
                "Expected and actual types must be instances of pyspark.sql.types.DataType."
            )
        if not isinstance(actual[column], type(want)):
            # try_cast: malformed values become NULL (counted below) instead
            # of throwing per-row under ANSI mode — same semantics as the
            # reference's non-ANSI cast + null-count comparison
            out = out.withColumn(f"__cast_{column}", F.col(column).try_cast(want))
            cast_cols.append(column)
    if cast_cols:
        counts = out.agg(
            *[
                F.count(
                    F.when(
                        F.col(c).isNotNull() & F.col(f"__cast_{c}").isNull(), 1
                    )
                ).alias(c)
                for c in cast_cols
            ]
        ).first()
        for c in cast_cols:
            if counts[c] > 0:
                raise ValueError(f"Column '{c}' cannot be cast to {expected[c]}.")
        out = out.select(
            *[
                F.col(f"__cast_{f.name}").alias(f.name) if f.name in cast_cols else F.col(f.name)
                for f in df.schema.fields
            ]
        )
    return out
