"""Streaming as-of enrichment (streaming/asof.py): batch/stream parity,
cross-micro-batch carried state, tie + duplicate rules.

The oracle identity (vs DuckDB native ASOF LEFT JOIN) is covered by the
registry entry ``stream_asof_join``; these tests pin the stateful
mechanics the oracle can't see — state carried across micro-batches,
pruning to the single dominated right row, and null-before-first-right.
"""

from __future__ import annotations

import time
from datetime import datetime, timedelta

import pandas as pd
import pytest

from core_spark.streaming import asof as sasof

BASE = datetime(2024, 1, 1)


def t(sec):
    return BASE + timedelta(seconds=sec)


SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _write(spark, path, rows):
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    spark.createDataFrame(pdf, schema=SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run(spark, path, name):
    s = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(path)
    res = sasof.asof_stream(
        s.where("event_type = 'l'"),
        s.where("event_type = 'r'"),
        key_col="user_id",
        ts_col="ts",
        value_col="value",
        id_col="event_id",
        watermark_sec=5,
    )
    q = (
        res.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).toPandas()


def _batch(spark, path):
    df = spark.read.schema(SCHEMA).parquet(path)
    return sasof.asof_stream(
        df.where("event_type = 'l'"),
        df.where("event_type = 'r'"),
        key_col="user_id",
        ts_col="ts",
        value_col="value",
        id_col="event_id",
    ).toPandas()


def test_asof_stream_matches_batch_multi_batch(spark, tmp_path):
    """State must survive micro-batch boundaries: rights from batch 1 serve
    lefts from batch 3; every watermark-finalized row equals the batch
    operator's answer."""
    p = str(tmp_path / "ev")
    _write(spark, p, [
        (1, t(10), 1, "r", 5.0),
        (2, t(20), 1, "l", None),   # -> r@10 = 5.0
        (3, t(5), 2, "l", None),    # no right yet -> NULL
    ])
    time.sleep(1.1)
    _write(spark, p, [
        (4, t(40), 1, "r", 7.0),
        (5, t(35), 1, "l", None),   # -> r@10 (r@40 is later than 35)
        (6, t(50), 2, "r", 2.0),
    ])
    time.sleep(1.1)
    _write(spark, p, [
        (7, t(60), 2, "l", None),   # -> r@50 = 2.0
        (8, t(100), 1, "l", None),  # -> carried r@40 = 7.0
        (9, t(100000), 3, "l", None),  # watermark pusher
    ])
    got = _run(spark, p, "t_asof_mb")
    batch = _batch(spark, p)
    # everything with ts <= final watermark is finalized
    wm = t(100000 - 5)
    want = (
        batch[batch["ts"] < wm]
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    got = got.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["event_id", "user_id", "ts", "asof_ts", "asof_value"]],
        want[["event_id", "user_id", "ts", "asof_ts", "asof_value"]],
    )
    by_id = got.set_index("event_id")
    assert by_id.loc[2, "asof_value"] == 5.0
    assert pd.isna(by_id.loc[3, "asof_value"])
    assert by_id.loc[5, "asof_value"] == 5.0
    assert by_id.loc[7, "asof_value"] == 2.0
    assert by_id.loc[8, "asof_value"] == 7.0
    assert not got.duplicated(subset=["event_id"]).any()


def test_asof_tie_inclusive_and_same_ts_max(spark, tmp_path):
    """A right at exactly the left's timestamp matches (>= convention);
    duplicate rights at one (key, ts) collapse to MAX(value) — both are
    the batch oracle's rules."""
    p = str(tmp_path / "ev")
    _write(spark, p, [
        (1, t(40), 1, "r", 7.0),
        (2, t(40), 1, "r", 9.0),   # same-ts duplicate -> max wins
        (3, t(40), 1, "l", None),  # tie -> matches r@40
    ])
    time.sleep(1.1)
    _write(spark, p, [(4, t(100000), 9, "l", None)])
    got = _run(spark, p, "t_asof_tie").set_index("event_id")
    assert got.loc[3, "asof_value"] == 9.0
    assert got.loc[3, "asof_ts"] == t(40)


def _brute_force_asof(evs):
    """Reference answer over surviving rows: for each left (t, eid), the
    right with the greatest ts <= t; same-ts rights collapse to MAX(value)
    with SQL NULL semantics (NULLs ignored; all-NULL ts -> NULL value)."""
    rights = {}
    for t, is_l, eid, v in evs:
        if not is_l:
            if t not in rights:
                rights[t] = v
            elif v is not None and (rights[t] is None or v > rights[t]):
                rights[t] = v
    out = {}
    for t, is_l, eid, v in evs:
        if is_l:
            cand = [rt for rt in rights if rt <= t]
            out[eid] = (max(cand), rights[max(cand)]) if cand else None
    return out


def test_asof_fn_matches_brute_force_any_batching():
    """Pure state-machine property check (no Spark query): the asof state
    function must equal the brute-force as-of answer under ANY micro-batch
    split, any intra-batch order, and bounded disorder, with the engine's
    late-row drop mimicked exactly (rows at-or-behind the pre-batch
    watermark never reach the operator)."""
    import random

    from hypothesis import given, settings, strategies as st

    from core_spark.streaming.asof import _make_asof_fn
    from tests.helpers import MockGroupState

    ev_strategy = st.lists(
        st.tuples(
            st.integers(0, 50_000),            # ts ms
            st.booleans(),                     # is_l
            # rights may carry SQL NULL (arrives in pandas as NaN)
            st.one_of(st.none(), st.floats(0, 100, allow_nan=False)),
        ),
        min_size=0,
        max_size=40,
    )

    @settings(max_examples=60, deadline=None)
    @given(ev_strategy, st.integers(1, 6), st.integers(0, 2**31 - 1))
    def run(raw, n_batches, seed):
        rng = random.Random(seed)
        evs = [
            (t, is_l, i, None if v is None else round(v, 3))
            for i, (t, is_l, v) in enumerate(raw)
        ]
        rng.shuffle(evs)  # arbitrary arrival order (disorder across batches)
        delay = 5_000
        fn = _make_asof_fn()
        state = MockGroupState()
        outs = []
        wm = 0  # Spark semantics: watermark seen by batch k is pre-batch
        size = max(1, len(evs) // n_batches)
        survivors = []
        for i in range(0, max(len(evs), 1), size):
            chunk = [e for e in evs[i : i + size]]
            # engine's late filter drops only rows STRICTLY behind the
            # watermark; a row at exactly ts == wm is still admitted
            live = [e for e in chunk if e[0] >= wm]
            survivors.extend(live)
            if live:
                pdf = pd.DataFrame(
                    {
                        "ts": pd.to_datetime([t * 10**6 for t, _, _, _ in live]),
                        "is_l": [l for _, l, _, _ in live],
                        "event_id": [e for _, _, e, _ in live],
                        "value": [
                            None if l else v for _, l, _, v in live
                        ],
                    }
                )
                state._wm = wm
                state.hasTimedOut = False
                outs.extend(list(fn((7,), iter([pdf]), state)))
            # watermark advances to max-seen - delay, never backwards
            wm = max(wm, max([t for t, _, _, _ in chunk] or [0]) - delay)
        # end of stream: watermark sails past everything, timer fires
        state._wm = 10**12
        state.hasTimedOut = True
        outs.extend(list(fn((7,), iter([]), state)))

        got = (
            pd.concat(outs, ignore_index=True)
            if outs
            else pd.DataFrame(columns=["event_id", "user_id", "ts", "asof_ts", "asof_value"])
        )
        want = _brute_force_asof(survivors)
        got_map = {
            int(r["event_id"]): (
                None
                if pd.isna(r["asof_ts"])
                else (
                    int(r["asof_ts"].value // 10**6),
                    None if pd.isna(r["asof_value"]) else r["asof_value"],
                )
            )
            for _, r in got.iterrows()
        }
        assert got_map == want
        assert not got.duplicated(subset=["event_id"]).any()

    run()


def test_asof_carried_right_survives_pruning(spark, tmp_path):
    """After the watermark passes a right row, only the LATEST such row is
    carried; a much-later left must still read it (and not any older,
    pruned sibling)."""
    p = str(tmp_path / "ev")
    _write(spark, p, [
        (1, t(0), 1, "r", 1.0),
        (2, t(10), 1, "r", 3.0),
    ])
    time.sleep(1.1)
    # watermark sails far past both rights -> state prunes to carried r@10
    _write(spark, p, [(3, t(50000), 2, "l", None)])
    time.sleep(1.1)
    _write(spark, p, [
        (4, t(60000), 1, "l", None),   # must read carried r@10 = 3.0
        (5, t(100000), 9, "l", None),  # watermark pusher
    ])
    got = _run(spark, p, "t_asof_carry").set_index("event_id")
    assert got.loc[4, "asof_value"] == 3.0
    assert got.loc[4, "asof_ts"] == t(10)
    assert pd.isna(got.loc[3, "asof_value"])
