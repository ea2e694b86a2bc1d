"""Table maintenance: create / optimize (compact + sort) / vacuum.

Engine-grade re-expression of the reference's Delta table utilities —
DeltaTableCreateUtility (utilities/spark/delta_table_create.py:54,128:
declared schema + partitionedBy), DeltaTableOptimizeUtility
(delta_table_optimize.py:26-99: OPTIMIZE with a partition `where` filter and
executeZOrderBy / executeCompaction) and DeltaTableVacuumUtility
(delta_table_vacuum.py:26-91: vacuum with a retention threshold) — for the
engine's partitioned parquet tables (the `MergeSink` layout:
`<table>/data/<partition_col>=<v>/*.parquet` + `_schema.json` + `_commits/`
+ `_lineage/`).

Why this matters at 100 TB: a streaming merge sink rewrites the touched
partitions every micro-batch, so current partitions accumulate one file
set per batch cadence and historical partitions keep whatever file sizes
the last merge produced. Compaction to ~target-file-size plus a sort on
(key, time) restores two scan-side properties Catalyst depends on —
few large row groups (scan task count ∝ files) and tight column min/max
ranges (row-group skipping for `tag IN (...)` / time-range predicates,
the ZORDER effect for a 1-2 column sort key).

On a cluster with an Iceberg catalog the three entry points map 1:1 to
`CREATE TABLE ... PARTITIONED BY`, `CALL rewrite_data_files(sort_order)`,
and `CALL expire_snapshots/remove_orphan_files`; this module is the
jar-free local implementation with the same interface and semantics.

All data movement is Spark jobs (read partition -> sort -> write); the
driver only does metadata ops (listing, atomic directory swaps) — the same
division of labor the reference delegates to the Delta commit protocol.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _data_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "data")


def _partition_dirs(table_dir: str, partition_col: str) -> list[str]:
    d = _data_dir(table_dir)
    if not os.path.isdir(d):
        return []
    return sorted(e for e in os.listdir(d) if e.startswith(f"{partition_col}="))


def create_table(
    table_dir: str,
    schema: T.StructType | str,
    partition_col: str = "p_date",
) -> None:
    """Declare an (empty) table: directory skeleton + recorded schema, so
    readers (`MergeSink.read`) work before the first batch commits
    (reference: delta_table_create.py builds the empty Delta table with
    declared schema + partition columns before any pipeline writes it).
    A DDL-string schema needs an active SparkSession (fromDDL parses on
    the JVM); pass a StructType to stay session-free."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if partition_col not in schema.fieldNames():
        schema = schema.add(partition_col, T.StringType())
    os.makedirs(_data_dir(table_dir), exist_ok=True)
    os.makedirs(os.path.join(table_dir, "_commits"), exist_ok=True)
    os.makedirs(os.path.join(table_dir, "_lineage"), exist_ok=True)
    path = os.path.join(table_dir, "_schema.json")
    if not os.path.exists(path):
        tmp = path + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(schema.jsonValue(), f)
        os.replace(tmp, path)


def table_stats(table_dir: str, partition_col: str = "p_date") -> dict:
    """Per-partition file-count/byte stats — the input to a compaction
    policy (compact only partitions whose avg file size is far below
    target, the reference's 'OPTIMIZE daily on non-current partitions'
    cadence, delta_table_optimize.py docs + blog :63-107)."""
    parts = {}
    for p in _partition_dirs(table_dir, partition_col):
        pdir = os.path.join(_data_dir(table_dir), p)
        files = [
            os.path.join(pdir, f)
            for f in os.listdir(pdir)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
        parts[p] = {
            "files": len(files),
            "bytes": sum(os.path.getsize(f) for f in files),
        }
    return {
        "partitions": parts,
        "total_files": sum(v["files"] for v in parts.values()),
        "total_bytes": sum(v["bytes"] for v in parts.values()),
    }


def optimize_table(
    spark: SparkSession,
    table_dir: str,
    partition_col: str = "p_date",
    partitions: Sequence[str] | None = None,
    sort_by: Sequence[str] | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
) -> dict:
    """OPTIMIZE: per-partition compaction to ~target file size with an
    optional in-file sort (delta_table_optimize.py:87-99 — `where` limits
    the partitions, `zorder_by` becomes a (key, time) sort: for 1-2
    columns a plain sort gives the same row-group min/max clustering the
    Z-curve approximates for many).

    Each selected partition is rewritten independently (read -> coalesce to
    ceil(bytes/target) -> sortWithinPartitions -> staging dir -> atomic
    swap), so a failure mid-run leaves every partition either old or new —
    never mixed: the swap is two directory renames, and the staging dir is
    vacuum-collectable. Returns a report {partition: {files_before,
    files_after}}. Concurrent merges to the SAME partition must be paused
    (Iceberg gets this from optimistic retry; document as the operational
    contract here).
    """
    sel = partitions
    report: dict[str, dict] = {}
    for p in _partition_dirs(table_dir, partition_col):
        pval = p.split("=", 1)[1]
        if sel is not None and pval not in sel and p not in sel:
            continue
        pdir = os.path.join(_data_dir(table_dir), p)
        files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
        nbytes = sum(os.path.getsize(os.path.join(pdir, f)) for f in files)
        n_out = max(1, -(-nbytes // target_file_bytes))
        if len(files) < max(min_files_to_compact, n_out + 1) and not sort_by:
            report[p] = {"files_before": len(files), "skipped": True}
            continue
        df: DataFrame = spark.read.parquet(pdir)
        out = df.coalesce(int(n_out))
        if sort_by:
            out = out.sortWithinPartitions(*sort_by)
        staging = pdir + f".opt-{uuid.uuid4().hex}"
        out.write.mode("overwrite").parquet(staging)
        old = pdir + f".old-{uuid.uuid4().hex}"
        os.rename(pdir, old)
        os.rename(staging, pdir)
        shutil.rmtree(old)
        report[p] = {
            "files_before": len(files),
            "files_after": len(
                [f for f in os.listdir(pdir) if f.endswith(".parquet")]
            ),
            "sorted_by": list(sort_by or []),
        }
    return report


def vacuum_table(
    table_dir: str,
    retention_hours: float = 168.0,
    partition_col: str = "p_date",
) -> dict:
    """VACUUM: remove failed-write debris older than the retention threshold
    (delta_table_vacuum.py:79-91). Eligible garbage in this layout: orphan
    optimize staging/old dirs (`*.opt-*` / `*.old-*` from a crashed
    optimize), writer temp dirs (`_temporary`), and stray `*.tmp` marker
    files. Live data/commits/lineage are never touched — like the
    reference, retention only bounds how quickly an in-flight writer's
    workspace may be reclaimed."""
    cutoff = time.time() - retention_hours * 3600
    removed: list[str] = []
    d = _data_dir(table_dir)
    if os.path.isdir(d):
        for e in os.listdir(d):
            full = os.path.join(d, e)
            is_debris = (
                ".opt-" in e or ".old-" in e or e == "_temporary"
            ) and os.path.isdir(full)
            if is_debris and os.path.getmtime(full) < cutoff:
                shutil.rmtree(full)
                removed.append(e)
    for sub in ("_commits", "_lineage", ""):
        subdir = os.path.join(table_dir, sub) if sub else table_dir
        if not os.path.isdir(subdir):
            continue
        for e in os.listdir(subdir):
            if e.endswith(".tmp"):
                full = os.path.join(subdir, e)
                if os.path.getmtime(full) < cutoff:
                    os.remove(full)
                    removed.append(os.path.join(sub, e) if sub else e)
    return {"removed": removed}
