"""fround portability: Spark, DuckDB, and plain-IEEE Python must agree
bit-for-bit on floor(x * 10^s + 0.5) / 10^s for ANY double.

This is the regression guard for the engine-portable rounding discipline
(functions.fround / sql_floor_round): round(double, s) diverges between
engines at representable .xxx5 ties (NOTES_round4.md item 8); the floor
form must not.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest

from postgresql_datawarehouse_excercise_spark.functions import fround, sql_floor_round


def _py_floor_round(x: float, scale: int) -> float:
    f = float(10**scale)
    return math.floor(x * f + 0.5) / f


def _adversarial_values() -> list[float]:
    vals: list[float] = []
    # representable ties: k / 2^m near 4dp and 6dp boundaries (sum/8, sum/16,
    # sum/32 averages -- the class that broke round() at sf0.1)
    for m in (3, 4, 5, 6, 7):
        for k in range(1, 200, 7):
            vals.append(k / (1 << m))
            vals.append(539.93 / (1 << m) * k)
    # decimal-looking near-ties
    vals += [67.49125, 112829.75625, 0.00005, 0.000049999999, 1.00005, 872.04545]
    # magnitudes across the range + negatives
    rng = random.Random(42)
    vals += [rng.uniform(-1e6, 1e6) for _ in range(500)]
    vals += [rng.uniform(-1, 1) for _ in range(500)]
    return vals


@pytest.mark.parametrize("scale", [2, 4, 6])
def test_fround_matches_duckdb_and_ieee(spark, scale):
    vals = _adversarial_values()
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    got_spark = [
        r[0] for r in df.select(fround(df.x, scale)).collect()
    ]

    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    got_duck = [r[0] for r in con.sql(f"SELECT {sql_floor_round('x', scale)} FROM t").fetchall()]

    want = [_py_floor_round(v, scale) for v in vals]
    assert got_spark == want, "Spark fround diverges from the IEEE formula"
    assert got_duck == want, "DuckDB floor-form diverges from the IEEE formula"


def test_plain_round_is_not_portable_on_ties(spark):
    """Documents WHY fround exists: Spark round() and the IEEE binary value
    disagree on the representable tie 67.49125 (= 539.93/8 in doubles)."""
    from pyspark.sql import functions as F

    tie = 539.93 / 8  # binary value just below decimal 67.49125
    [spark_round] = spark.createDataFrame([(tie,)], ["x"]).select(
        F.round("x", 4)
    ).first()
    assert spark_round == 67.4913  # shortest-string HALF_UP rounds the tie up
    assert _py_floor_round(tie, 4) == 67.4912  # the binary value is below it
