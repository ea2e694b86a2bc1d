# Copyright 2025 Project Team
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#      http://www.apache.org/licenses/LICENSE-2.0
#
# Unless required by applicable law or agreed to in writing, software
# distributed under the License is distributed on an "AS IS" BASIS,
# WITHOUT WARRANTIES OR CONDITIONS OF ANY KIND, either express or implied.
# See the License for the specific language governing permissions and
# limitations under the License.

"""Complex-event-processing pattern detection, batch form.

The north rule names the engine a CEP engine; the reference itself has only
the *ingredients* of CEP — the lag-gap rule
(monitoring/spark/identify_missing_data_interval.py:137-141), flatline run
detection (monitoring/spark/flatline_detection.py:143-200) and the
merge-into-sink correction flow — never a sequence-pattern operator. This
module adds the two canonical CEP shapes as declarative DataFrame programs
(Spark has no MATCH_RECOGNIZE; both shapes compile to one window function
pass, so Catalyst plans them as a single shuffle on the key):

- ``followed_by``: A-then-eventually-B-within-T per key (funnel / alert
  pairing), including the *absence* rows (A with no B inside the horizon) —
  the batch oracle for the streaming operator in ``streaming/cep.py``.
- ``match_contiguous``: n consecutive events per key matching a predicate
  chain inside a time span (MATCH_RECOGNIZE's ``A B C`` pattern with
  AFTER MATCH SKIP TO NEXT ROW over strictly contiguous rows).

Scale notes (100 TB posture):
- Both operators make exactly ONE corpus shuffle: the window partition on
  the key. The follower/value lookup in ``followed_by`` joins B rows
  *pre-aggregated per (key, ts)* — already reduced, hash-joinable on the
  same key, AQE-coalesced; no theta/range join anywhere.
- Marker predicates are evaluated on source columns before any projection,
  so simple predicates (``event_type = 'signup'``) reach the parquet scan
  as PushedFilters; ``followed_by`` additionally drops every row that is
  neither A nor B before the shuffle, so the exchanged bytes are the
  matched-event subset, not the corpus.
- Per-key window functions, never a global ORDER BY window (single-partition
  hazard called out in SURVEY §2.5 for the reference's TSQB:1451).
- Determinism for the value-hash gate: same-(key, ts) B rows are collapsed
  with ``min``; A/B rows at the *same* timestamp are ordered B-before-A so
  "followed by" is strictly-after in event time in both engines.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CepSpec:
    """Column binding for a keyed event table.

    ``id_col`` (optional) breaks ordering ties between events that share
    (key, ts) in ``match_contiguous`` — contiguity needs a total order.
    """

    key_col: str = "user_id"
    ts_col: str = "ts"
    id_col: str | None = None


def followed_by(
    df: DataFrame,
    spec: CepSpec,
    first_pred: str,
    then_pred: str,
    within_sec: int,
    value_col: str | None = None,
    matched_only: bool = False,
) -> DataFrame:
    """Earliest B strictly after each A within ``within_sec``, per key.

    Emits one row per distinct A event: ``(key, a_ts, b_ts, lag_sec,
    [b_value], matched)``. Unmatched A rows (no B inside the horizon —
    absence detection, the alerting half of CEP) carry nulls unless
    ``matched_only``. ``b_value``: ``min(value_col)`` of the B rows at the
    matched timestamp (deterministic under duplicates).

    Semantics are strictly-after: a B at exactly ``a_ts`` does not match.
    Multiple A rows may share one B (each A still gets its own earliest B).
    """
    key, ts = spec.key_col, spec.ts_col
    a, b = F.expr(first_pred), F.expr(then_pred)
    # Keep only pattern-relevant rows before the shuffle; the disjunction
    # stays on source columns so it can push into the scan.
    base = (
        df.filter(a | b)
        .select(
            F.col(key).alias("key"),
            F.col(ts).alias("ts"),
            a.alias("is_a"),
            b.alias("is_b"),
            *([F.col(value_col).alias("val")] if value_col else []),
        )
    )
    # Collapse B duplicates at one (key, ts); keep the deterministic min
    # payload. A rows are deduped per (key, ts) too (one output row each).
    if value_col:
        b_rows = (
            base.filter("is_b")
            .groupBy("key", "ts")
            .agg(F.min("val").alias("b_value"))
            .select("key", "ts", F.lit(0).alias("s"), "b_value")
        )
    else:
        b_rows = (
            base.filter("is_b")
            .select("key", "ts")
            .distinct()
            .select("key", "ts", F.lit(0).alias("s"))
        )
    a_rows = (
        base.filter("is_a")
        .select("key", "ts")
        .distinct()
        .select(
            "key", "ts", F.lit(1).alias("s"),
            *([F.lit(None).cast("double").alias("b_value")] if value_col else []),
        )
    )
    # One ordered pass per key. Logically we need, for each A row, the min
    # B-timestamp strictly after it under the (ts, s) order (B sorts before
    # A at an equal timestamp, so equal-ts Bs are excluded). A frame of
    # rowsBetween(1 FOLLOWING, UNBOUNDED FOLLOWING) expresses that directly
    # but Spark executes shrinking frames by re-aggregating from scratch
    # per row — O(n^2) on a hot key. Ordering DESCENDING and taking the
    # running min over (UNBOUNDED PRECEDING, -1) visits exactly the same
    # row set as an incremental O(n) aggregate: in desc (ts, s) order the
    # rows before (ts, 1) are those with ts' > ts (equal-ts B rows, s=0,
    # sort AFTER the A row — excluded, as required). (key, ts, s) is
    # unique after the dedup above, so the result is deterministic.
    u = a_rows.unionByName(b_rows)
    w = (
        Window.partitionBy("key")
        .orderBy(F.col("ts").desc(), F.col("s").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        u.withColumn("b_ts", F.min(F.when(F.col("s") == 0, F.col("ts"))).over(w))
        .filter(F.col("s") == 1)
        .withColumn(
            "b_ts",
            F.when(
                F.unix_timestamp("b_ts") - F.unix_timestamp("ts") <= F.lit(within_sec),
                F.col("b_ts"),
            ),
        )
        .select(
            F.col("key").alias(key),
            F.col("ts").alias("a_ts"),
            "b_ts",
            (F.unix_timestamp("b_ts") - F.unix_timestamp("ts")).alias("lag_sec"),
            F.col("b_ts").isNotNull().alias("matched"),
        )
    )
    if value_col:
        # B payload lookup: both sides already partitioned by key; the B
        # side is the reduced per-(key, ts) table, so this is a cheap hash
        # join (AQE picks broadcast when the B side is small). A null b_ts
        # (unmatched A) matches nothing — the left join keeps the row with
        # a null payload.
        bv = b_rows.select(
            F.col("key").alias("_bk"), F.col("ts").alias("_bt"), "b_value"
        )
        out = (
            out.join(
                bv,
                on=[out[key] == bv["_bk"], out["b_ts"] == bv["_bt"]],
                how="left",
            )
            .select(key, "a_ts", "b_ts", "lag_sec", "b_value", "matched")
        )
    if matched_only:
        out = out.filter("matched")
    return out


def followed_by_sql(
    table: str,
    spec: CepSpec,
    first_pred: str,
    then_pred: str,
    within_sec: int,
    value_col: str | None = None,
    matched_only: bool = False,
) -> str:
    """ANSI-SQL twin of ``followed_by`` (DuckDB oracle)."""
    key, ts = spec.key_col, spec.ts_col
    val_b = f", MIN({value_col}) AS b_value" if value_col else ""
    val_sel = ", CASE WHEN m.b_ts IS NOT NULL THEN b.b_value END AS b_value" if value_col else ""
    val_join = (
        f" LEFT JOIN b_rows b ON m.key = b.key AND m.b_ts IS NOT DISTINCT FROM b.ts"
        if value_col
        else ""
    )
    where = " WHERE m.b_ts IS NOT NULL" if matched_only else ""
    return f"""
WITH base AS (
  SELECT {key} AS key, {ts} AS ts, ({first_pred}) AS is_a, ({then_pred}) AS is_b
         {f', {value_col}' if value_col else ''}
  FROM {table} WHERE ({first_pred}) OR ({then_pred})
),
b_rows AS (
  SELECT key, ts{val_b} FROM base WHERE is_b GROUP BY key, ts
),
a_rows AS (
  SELECT DISTINCT key, ts FROM base WHERE is_a
),
u AS (
  SELECT key, ts, 1 AS s FROM a_rows
  UNION ALL
  SELECT key, ts, 0 AS s FROM b_rows
),
nxt AS (
  SELECT key, ts, s,
         MIN(CASE WHEN s = 0 THEN ts END) OVER (
           PARTITION BY key ORDER BY ts, s
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
         ) AS b_ts0
  FROM u
),
m AS (
  SELECT key, ts AS a_ts,
         CASE WHEN CAST(FLOOR(epoch(b_ts0)) AS BIGINT)
                   - CAST(FLOOR(epoch(ts)) AS BIGINT) <= {within_sec}
              THEN b_ts0 END AS b_ts
  FROM nxt WHERE s = 1
)
SELECT m.key AS {key}, m.a_ts, m.b_ts,
       CAST(FLOOR(epoch(m.b_ts)) AS BIGINT)
         - CAST(FLOOR(epoch(m.a_ts)) AS BIGINT) AS lag_sec,
       m.b_ts IS NOT NULL AS matched{val_sel}
FROM m{val_join}{where}
"""


def match_contiguous(
    df: DataFrame,
    spec: CepSpec,
    preds: Sequence[str],
    within_sec: int | None = None,
) -> DataFrame:
    """n strictly consecutive events per key matching ``preds`` in order.

    MATCH_RECOGNIZE ``(A B ... N)`` over contiguous rows with AFTER MATCH
    SKIP TO NEXT ROW: every row that *ends* such a chain yields
    ``(key, start_ts, end_ts, span_sec)`` (overlapping chains all emit).
    ``within_sec`` additionally bounds ``end_ts - start_ts``.

    The whole pattern is one lag-chain over a single per-key window — the
    same shuffle the marker projection already needs, so adding steps to
    the pattern costs no extra exchange.
    """
    if len(preds) < 2:
        raise ValueError("pattern needs at least 2 steps")
    key, ts = spec.key_col, spec.ts_col
    n = len(preds)
    order = [F.col(ts)] + ([F.col(spec.id_col)] if spec.id_col else [])
    w = Window.partitionBy(key).orderBy(*order)
    base = df.select(
        F.col(key),
        F.col(ts),
        *([F.col(spec.id_col)] if spec.id_col else []),
        *[F.expr(p).alias(f"m{i}") for i, p in enumerate(preds)],
    )
    # row i ends a chain if pred[n-1](row i) AND pred[n-2](row i-1) AND ...
    cond = F.col(f"m{n-1}")
    for back in range(1, n):
        cond = cond & F.lag(F.col(f"m{n-1-back}"), back).over(w)
    out = (
        base.withColumn("start_ts", F.lag(F.col(ts), n - 1).over(w))
        .withColumn("chain", cond)
        .filter("chain")
        .select(
            F.col(key),
            "start_ts",
            F.col(ts).alias("end_ts"),
            (F.unix_timestamp(ts) - F.unix_timestamp("start_ts")).alias("span_sec"),
        )
    )
    if within_sec is not None:
        out = out.filter(F.col("span_sec") <= within_sec)
    return out


def match_contiguous_sql(
    table: str,
    spec: CepSpec,
    preds: Sequence[str],
    within_sec: int | None = None,
) -> str:
    """ANSI-SQL twin of ``match_contiguous`` (DuckDB oracle)."""
    key, ts = spec.key_col, spec.ts_col
    n = len(preds)
    order = f"{ts}" + (f", {spec.id_col}" if spec.id_col else "")
    marks = ", ".join(f"({p}) AS m{i}" for i, p in enumerate(preds))
    w = f"OVER (PARTITION BY {key} ORDER BY {order})"
    conds = [f"m{n-1}"] + [f"LAG(m{n-1-b}, {b}) {w}" for b in range(1, n)]
    within = (
        f" AND CAST(FLOOR(epoch(end_ts)) AS BIGINT) - CAST(FLOOR(epoch(start_ts)) AS BIGINT) <= {within_sec}"
        if within_sec is not None
        else ""
    )
    return f"""
WITH base AS (
  SELECT {key}, {ts}{f', {spec.id_col}' if spec.id_col else ''}, {marks} FROM {table}
),
lagged AS (
  SELECT {key}, {ts} AS end_ts,
         LAG({ts}, {n-1}) {w} AS start_ts,
         ({' AND '.join(conds)}) AS chain
  FROM base
)
SELECT {key}, start_ts, end_ts,
       CAST(FLOOR(epoch(end_ts)) AS BIGINT)
         - CAST(FLOOR(epoch(start_ts)) AS BIGINT) AS span_sec
FROM lagged WHERE chain{within}
"""
