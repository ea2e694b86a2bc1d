"""Concurrent query fan-out over one SparkSession — the engine's analog of
the reference's thread-pooled batch runner (queries/time_series/batch.py:22-84,
one connection per worker thread).

Spark's scheduler accepts jobs from many threads; FAIR pools keep a slow
query from starving the rest. Each worker tags its jobs with a scheduler
pool + job group so they are attributable and cancellable.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession


def run_batch(
    spark: SparkSession,
    queries: Mapping[str, Callable[[SparkSession], DataFrame]],
    max_workers: int = 4,
    collect: Callable[[DataFrame], Any] | None = None,
) -> dict[str, Any]:
    """Run named query builders concurrently; returns {name: result}.

    ``collect`` turns the DataFrame into the materialized result (default:
    row count — callers usually want .toPandas() or a write action).
    Exceptions propagate per-query as the result value, so one failure
    doesn't kill the batch (reference behavior: per-thread connections).
    """
    collect = collect or (lambda df: df.count())

    def one(name: str, fn: Callable[[SparkSession], DataFrame]) -> Any:
        sc = spark.sparkContext
        sc.setLocalProperty("spark.scheduler.pool", name)
        sc.setJobGroup(f"batch:{name}", f"batch query {name}", True)
        try:
            return collect(fn(spark))
        except Exception as exc:  # noqa: BLE001 — per-query isolation
            return exc
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        futures = {name: pool.submit(one, name, fn) for name, fn in queries.items()}
        return {name: f.result() for name, f in futures.items()}
