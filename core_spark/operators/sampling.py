"""Deterministic sampling, splitting, and contamination checking for
training-data pipelines (brief extension family, alongside operators/dedup
and operators/similarity; the reference has no sampling surface — its
nearest analog is the deterministic md5 keying in
data_models/meters/utils/transform.py).

Why hash-based instead of ``df.sample()``: at 100 TB a sample must be
(a) reproducible across reruns/engines (Bernoulli sampling with a seed is
engine- and partitioning-dependent), (b) stable under re-partitioning and
incremental ingest (a document keeps its bucket forever, so yesterday's 10%
sample is a subset of today's), and (c) pushdown-friendly. Every operator
here is one JVM-side expression over md5 — no shuffle, no UDF, no state —
and is oracle-checkable bit-for-bit because DuckDB computes the identical
md5 buckets.

The bucket function: ``conv(substr(md5(key || salt), 1, 8), 16, 10) %
buckets`` — the top 32 bits of md5 are uniform, so P(bucket < f*buckets)
= f with binomial (not approximate-sampler) error. Different salts give
independent samples; train/test splits use ONE salt so membership is a
partition (disjoint + exhaustive) of the corpus by construction.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text

#: bucket resolution — fractions are exact multiples of 1/BUCKETS
BUCKETS = 1_000_000


def hash_bucket(key: Column, salt: str = "", buckets: int = BUCKETS) -> Column:
    """Deterministic uniform bucket in [0, buckets) from a key column.
    md5 exists (bit-identically) in Spark and DuckDB, so sampling predicates
    built on this are exactly reproducible across engines."""
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % buckets).alias(
        "bucket"
    )


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by key hash. Pure filter —
    pushes to the scan, keeps input partitioning, and the same key is kept
    on every rerun and every engine."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(hash_bucket(F.col(key_col), salt) < int(fraction * BUCKETS))


def stratified_hash_sample(
    df: DataFrame,
    fractions: Mapping[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-mix builder
    (e.g. keep 50% of 'en', 20% of 'de', drop the rest).

    One CASE ladder over the stratum column sets each row's threshold; the
    single hash predicate stays a scan-level filter, so re-weighting a
    100 TB corpus is a full-scan-once, shuffle-never operation.
    """
    for stratum, fr in fractions.items():
        if not 0.0 <= fr <= 1.0:
            raise ValueError(f"fraction for {stratum!r} must be in [0, 1], got {fr}")
    threshold = F.lit(int(default_fraction * BUCKETS))
    for stratum, fr in sorted(fractions.items()):
        threshold = (
            F.when(F.col(strata_col) == stratum, int(fr * BUCKETS)).otherwise(threshold)
        )
    return df.filter(hash_bucket(F.col(key_col), salt) < threshold)


def train_test_split_col(
    df: DataFrame,
    test_fraction: float = 0.1,
    key_col: str = "doc_id",
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Label every row 'test' or 'train' by key hash: disjoint + exhaustive
    by construction (one bucket per key, one threshold), stable across
    reruns and ingest increments — new documents never move old ones
    between splits."""
    if not 0.0 <= test_fraction <= 1.0:
        raise ValueError(f"test_fraction must be in [0, 1], got {test_fraction}")
    bucket = hash_bucket(F.col(key_col), salt)
    return df.withColumn(
        split_col,
        F.when(bucket < int(test_fraction * BUCKETS), "test").otherwise("train"),
    )


def _word_ngrams(text: Column, n: int) -> Column:
    """All word n-grams of the normalized text as an array<string> — one
    JVM higher-order expression (sequence + transform + slice), no UDF."""
    words = F.split(normalize_text(text), " ")
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination detection: corpus documents sharing any
    normalized word ``n``-gram with a benchmark/eval document — the overlap
    rule used to decontaminate training sets against test suites (e.g.
    GPT-3 appendix C / PaLM-style 8-gram collision checks).

    Returns one row per contaminated (corpus, benchmark) pair with the
    number of shared n-grams. Plan shape at scale: benchmark n-grams are a
    SMALL relation (eval suites are tiny vs the corpus), so Catalyst/AQE
    broadcasts them and the corpus side is one scan + explode with NO
    corpus-wide shuffle for the join itself; the groupBy aggregates
    (corpus_doc, bench_doc) partials map-side. Distinct n-grams per side
    keep counts set-semantic (a phrase repeated in the corpus doc counts
    once).
    """
    corpus_grams = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(_word_ngrams(F.col(text_col), n))).alias("g"),
    )
    bench_grams = benchmark.select(
        F.col(bench_id_col).alias("bench_id"),
        F.explode(F.array_distinct(_word_ngrams(F.col(bench_text_col), n))).alias("g"),
    )
    return (
        corpus_grams.join(F.broadcast(bench_grams), "g")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )
