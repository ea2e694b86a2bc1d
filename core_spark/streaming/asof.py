"""Streaming as-of enrichment: each left event picks up the latest
right-side row at-or-before its timestamp, watermark-finalized.

The batch twin is ``operators/timeseries.asof_join`` (union-tag + window
forward-fill; DuckDB native ``ASOF LEFT JOIN`` is its oracle). The
reference has no as-of join at all (SURVEY §2.3 notes its forward-fill
workaround, reference _time_series_query_builder.py:1453); streams make it
the canonical enrichment shape — e.g. clip events joined to the latest
preceding calibration/setpoint update of the same key.

Semantics (exactly the batch rule, made incremental):

- left row L at time t matches the right row with the greatest ts <= t
  (inclusive ties, like DuckDB's ``ON l.ts >= r.ts``); no match -> NULL.
- right rows that share one (key, ts) collapse to MAX(value), the
  batch oracle's dedup rule.
- a left row is emitted only once the event-time watermark passes its
  timestamp: until then an even-later-arriving right row with ts <= t
  could still change the answer; after it, such a row would itself be
  dropped by the engine's late filter, so the choice is final. This is
  the same finalize-at-watermark argument as the strict-order funnel
  (streaming/cep.py).

State per key is bounded by the watermark delay, not the stream length:

- pending left rows: only those with ts >= watermark (strictly-older ones
  are emitted and dropped immediately);
- right buffer: rows with ts > watermark, PLUS exactly one "carried"
  row — the latest right at-or-below the watermark. Any older right row
  is dominated by the carried one for every still-possible left (whose
  ts necessarily exceeds the watermark). The carried row is the
  irreducible as-of state (latest-dim-value-per-key, the same O(1)/key
  any streaming enrichment holds) and is all that persists on a quiet
  key.

At 10^12-clip scale the stateful exchange carries only (key, ts, value)
scalars; state stores hold O(open-horizon) rows per key.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "event_id long, user_id long, ts timestamp, asof_ts timestamp, "
    "asof_value double"
)
STATE_SCHEMA = (
    "pend_ts array<long>, pend_id array<long>, "
    "r_ts array<long>, r_val array<double>"
)


def _make_asof_fn():
    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        uid = key[0]
        wm = state.getCurrentWatermarkMs()
        if state.exists:
            pend_ts, pend_id, r_ts, r_val = (list(x) for x in tuple(state.get))
        else:
            pend_ts, pend_id, r_ts, r_val = [], [], [], []

        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs), ignore_index=True)
            if not rows.empty:
                ts_ms = (rows["ts"].astype("int64") // 1_000_000).tolist()
                is_l = rows["is_l"].tolist()
                ids = rows["event_id"].tolist()
                vals = rows["value"].tolist()
                for t, left, eid, v in zip(ts_ms, is_l, ids, vals):
                    if left:
                        pend_ts.append(t)
                        pend_id.append(int(eid))
                    else:
                        # same-(key, ts) right rows collapse to MAX(value),
                        # NULLs ignored like SQL MAX (pandas hands NULL over
                        # as NaN — normalize it, or a NaN stored first would
                        # block every later real value at that ts)
                        if v is not None and v != v:  # NaN
                            v = None
                        if t in r_ts:
                            j = r_ts.index(t)
                            if v is not None and (r_val[j] is None or v > r_val[j]):
                                r_val[j] = v
                        else:
                            r_ts.append(t)
                            r_val.append(v)

        # finalize every left STRICTLY behind the watermark (inline AND on
        # timer — a key with continuous traffic never fires its timer).
        # Strict, not <=: the engine's late filter is only guaranteed to
        # drop rows strictly older than the watermark, so a right at
        # exactly ts == wm could still be admitted in a later batch; a
        # left at ts == wm therefore isn't final yet (it closes one
        # watermark tick later via the wm+1 timer floor below).
        out = []
        if pend_ts:
            keep_ts, keep_id = [], []
            for t, eid in zip(pend_ts, pend_id):
                if t < wm:
                    best = None
                    for rt, rv in zip(r_ts, r_val):
                        if rt <= t and (best is None or rt > best[0]):
                            best = (rt, rv)
                    out.append(
                        {
                            "event_id": eid,
                            "user_id": uid,
                            "ts": pd.Timestamp(t, unit="ms"),
                            "asof_ts": (
                                pd.Timestamp(best[0], unit="ms") if best else None
                            ),
                            "asof_value": best[1] if best else None,
                        }
                    )
                else:
                    keep_ts.append(t)
                    keep_id.append(eid)
            pend_ts, pend_id = keep_ts, keep_id

        # prune rights AFTER finalization: latest at-or-below wm dominates
        # all older ones for every remaining (ts > wm) left
        if r_ts:
            carried = None
            for rt, rv in zip(r_ts, r_val):
                if rt <= wm and (carried is None or rt > carried[0]):
                    carried = (rt, rv)
            kept = [(rt, rv) for rt, rv in zip(r_ts, r_val) if rt > wm]
            if carried is not None:
                kept.append(carried)
            kept.sort()
            r_ts = [rt for rt, _ in kept]
            r_val = [rv for _, rv in kept]

        if out:
            yield pd.DataFrame(out)
        if pend_ts or r_ts:
            state.update((pend_ts, pend_id, r_ts, r_val))
            if pend_ts:
                state.setTimeoutTimestamp(max(min(pend_ts) + 1, wm + 1))
            # no pending: carried right persists with no timer — it is the
            # live as-of value a future left will read
        elif state.exists:
            state.remove()

    return fn


def asof_stream(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    watermark_sec: int = 30,
) -> DataFrame:
    """As-of enrich streaming ``left`` with the latest preceding row of
    streaming ``right`` on the same key. Both sides are unioned into ONE
    keyed event stream before the stateful operator — the funnel's trick
    (streaming/cep.py) — so a single watermark governs both and the state
    function sees each key's full merged timeline.

    Batch frames take the batch operator directly (the oracle-equivalence
    path used by tests)."""
    l_ev = left.select(
        F.col(key_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.lit(True).alias("is_l"),
        F.col(id_col).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
    )
    r_ev = right.select(
        F.col(key_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.lit(False).alias("is_l"),
        F.lit(None).cast("long").alias("event_id"),
        F.col(value_col).cast("double").alias("value"),
    )
    ev = l_ev.unionByName(r_ev)
    if not left.isStreaming:
        from ..operators import timeseries as _ts

        lf = ev.where("is_l").select("event_id", "user_id", "ts")
        rf = (
            ev.where("NOT is_l")
            .groupBy("user_id", "ts")
            .agg(F.max("value").alias("value"))
        )
        return _ts.asof_join(lf, rf, ["user_id"], "ts", "ts", ["value"])
    ev = ev.withWatermark("ts", f"{watermark_sec} seconds")
    return ev.groupBy("user_id").applyInPandasWithState(
        _make_asof_fn(),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
