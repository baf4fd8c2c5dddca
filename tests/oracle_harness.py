"""Local mirror of the driver's DuckDB-oracle correctness gate.

For a query name: run the Spark DataFrame and the DuckDB oracle SQL on the
same parquet tables, then compare row count, column names (sorted), and an
order-insensitive multiset of rows with values normalized (floats rounded,
dates/timestamps stringified).  Any mismatch here predicts a mismatch in the
driver's CORRECTNESS_r{N}.json, so tests fail loudly with a diff sample.
"""

from __future__ import annotations

import datetime as _dt
import math
from collections import Counter
from decimal import Decimal

import duckdb

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    # Dtype-STRICT normalization mirroring the driver's pandas-based value
    # hash: the driver stringifies/hashes the materialized frames, so an
    # int64 123 on one side and a float64 123.0 on the other MISMATCH there
    # (DuckDB SUM(BIGINT) returns HUGEINT which pandas renders as float64).
    # We therefore tag the numeric kind instead of relying on Python's
    # cross-type == (int == float is True and would hide the difference).
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        # Spark DecimalType reaches pandas as objects, DuckDB DECIMAL as
        # float64 -- a driver-side mismatch.  Tag it so tests flag any
        # query that leaks a raw decimal column.  normalize() so the tag
        # flags decimal LEAKAGE, not scale noise (DECIMAL(22,2) 1.50 vs
        # DECIMAL(38,2) 1.5 from different SUM widening are equal values).
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return ("f", round(v, 6))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        # The driver's comparator sorts the pandas frame by every column;
        # list-valued cells are unhashable there and crash the compare
        # (CORRECTNESS r2: x_media_features, x_sql_collect_agg).  Fail
        # loudly so no driver-checked query ships an array column.
        raise AssertionError(
            "array-valued output column: unsupported by the driver compare; "
            "serialize to string (array_join / printf) in query AND oracle"
        )
    return v


def rows_multiset(cols: list[str], rows: list[tuple]) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    # duckdb's fetchall() converts HUGEINT to Python int, which would pass
    # the strict ('i', v) tags below -- but the DRIVER materializes via
    # pandas, where HUGEINT becomes float64 and mismatches Spark's int64.
    # Assert no HUGEINT output columns so the harness mirrors the driver's
    # pandas path (fix: CAST(... AS BIGINT) around SUM(BIGINT) in the oracle).
    hugeint_cols = [
        c for c, t in zip(rel.columns, rel.types) if str(t) == "HUGEINT"
    ]
    assert not hugeint_cols, (
        f"oracle emits HUGEINT column(s) {hugeint_cols}: pandas renders these "
        "float64 on the driver and the value hash mismatches Spark's int64; "
        "CAST(... AS BIGINT) in the oracle SQL"
    )
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row-count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sm, dm = rows_multiset(s_cols, s_rows), rows_multiset(d_cols, d_rows)
    if sm != dm:
        only_s = list((sm - dm).items())[:5]
        only_d = list((dm - sm).items())[:5]
        raise AssertionError(
            f"value mismatch (cols sorted={sorted(s_cols)}):\n"
            f"  spark-only sample: {only_s}\n  duckdb-only sample: {only_d}"
        )
