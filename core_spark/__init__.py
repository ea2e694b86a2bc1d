"""core_spark — a PySpark-native streaming time-series / CEP analytics engine.

A from-scratch re-expression of the query and data-processing capabilities of
rtdip/core (reference at /root/reference, cited per-module as file:line) built
Spark-first: DataFrame/SQL plans optimized by Catalyst, Structured Streaming
with watermarks + stateful operators for the stream path, and Arrow-vectorized
pandas UDFs for the (audio) decode hot path. No per-row Python anywhere.

Layout:
    session     — tuned SparkSession builder (AQE, Arrow, UTC, shuffle sizing)
    synth       — deterministic audio clip + transcript-correction generator
    functions/  — scalar/vector function surface (audio decode, text analysis)
    operators/  — batch query operators (time-series verbs, data quality,
                  dedup, similarity search)
    streaming/  — windows, watermarks, stream-stream join, sessionization,
                  idempotent exactly-once sink, end-to-end CEP job
    query_builder — fluent TimeSeriesQueryBuilder / SQLQueryBuilder facade
                  (the reference's primary user-facing query API)
"""

__version__ = "0.1.0"
