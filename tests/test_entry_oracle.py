"""Replay of the driver's correctness gate, locally at sf0.001.

For every registry entry with an oracle: run the Spark DataFrame and the
DuckDB SQL on the same parquet dir, sort columns by name and rows by value,
and require exact equality (the driver hashes values, so near-equal floats
are NOT good enough — determinism is engineered in registry.py).
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return repr(val)
    return repr(val)


def _rows(pdf):
    cols = sorted(pdf.columns)
    recs = [tuple(_canon(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    return sorted(recs), cols


ORACLED = sorted(entry_mod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entry_mod.queries()) - set(ORACLED))


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR).toPandas()
    con = _duck(SF_DIR)
    ddf = con.sql(entry_mod.oracle_sql()[name]).df()
    assert len(sdf) == len(ddf), f"{name}: rowcount {len(sdf)} vs oracle {len(ddf)}"
    s_rows, s_cols = _rows(sdf)
    d_rows, d_cols = _rows(ddf)
    assert s_cols == d_cols, f"{name}: columns {s_cols} vs {d_cols}"
    mism = [i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} mismatched rows; first: "
        f"{s_rows[mism[0]]} vs {d_rows[mism[0]]}"
    )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    q = entry_mod.queries()[name]
    df = q(spark, SF_DIR)
    assert df.count() >= 0


def test_no_complex_output_types(spark):
    # The driver's canonicalizer sorts every output column with pandas;
    # array/map/struct cells are unhashable there and crash the gate
    # (CORRECTNESS_r04 ts_ar_auto). Every registry entry must therefore
    # project complex columns to scalars (to_json / explode) before return.
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = {}
    for name, q in entry_mod.queries().items():
        schema = q(spark, SF_DIR).schema
        complex_cols = [
            f.name for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            bad[name] = complex_cols
    assert not bad, f"driver-unhashable output columns: {bad}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_coverage_totals_match_registry():
    # COVERAGE.md's totals line is keyed to the registry so it cannot go
    # stale: the literal counts in the doc must equal the live registry
    import os
    import re

    from core_spark import registry

    doc = open(
        os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")
    ).read()
    m = re.search(
        r"Totals: (\d+) queries\(\) entries, (\d+) with DuckDB oracles", doc
    )
    assert m, "COVERAGE.md totals line missing"
    assert int(m.group(1)) == len(registry.QUERIES)
    assert int(m.group(2)) == len(registry.ORACLES)
    m2 = re.search(r"(\d+) exact, (\d+) rows-only", doc)
    assert m2
    assert int(m2.group(1)) == len(registry.ORACLES)
    assert int(m2.group(2)) == len(registry.QUERIES) - len(registry.ORACLES)
