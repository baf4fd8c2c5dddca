"""SCD2 operators (operators/scd.py): change collapse, interval chaining,
incremental apply == full rebuild, delta-equal-to-open-row no-op."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from postgresql_datawarehouse_excercise_spark.operators import scd

KEY, TRACKED, TS = ["k"], ["attr"], "ts"


def _snap(spark, rows):
    return spark.createDataFrame(
        [(k, a, datetime.datetime(1997, 1, d)) for k, a, d in rows],
        "k long, attr string, ts timestamp",
    )


def _hist(df):
    return sorted(
        (r["k"], r["attr"], r["valid_from"].day,
         r["valid_to"].day if r["valid_to"] else None, r["is_current"])
        for r in df.collect()
    )


def test_change_detection_collapses_identical_snapshots(spark):
    snaps = _snap(spark, [(1, "a", 1), (1, "a", 2), (1, "b", 3), (1, "b", 4), (1, "a", 5)])
    hist = scd.scd2_from_snapshots(snaps, KEY, TRACKED, TS)
    assert _hist(hist) == [
        (1, "a", 1, 3, False),
        (1, "a", 5, None, True),
        (1, "b", 3, 5, False),
    ]


def test_apply_equals_full_rebuild(spark):
    rows = [(1, "a", 1), (1, "b", 3), (1, "c", 6), (2, "x", 2), (2, "x", 4), (3, "q", 7)]
    snaps = _snap(spark, rows)
    full = scd.scd2_from_snapshots(snaps, KEY, TRACKED, TS)
    early = snaps.filter(F.dayofmonth("ts") < 5)
    late = snaps.filter(F.dayofmonth("ts") >= 5)  # incl. brand-new key 3
    applied = scd.scd2_apply(
        scd.scd2_from_snapshots(early, KEY, TRACKED, TS), late, KEY, TRACKED, TS
    )
    assert _hist(applied) == _hist(full)


def test_apply_with_unchanged_attrs_is_a_noop_version(spark):
    """A delta snapshot equal to the open row's attributes must NOT open a
    spurious new version."""
    base = scd.scd2_from_snapshots(_snap(spark, [(1, "a", 1)]), KEY, TRACKED, TS)
    applied = scd.scd2_apply(base, _snap(spark, [(1, "a", 9)]), KEY, TRACKED, TS)
    assert _hist(applied) == [(1, "a", 1, None, True)]


def test_apply_equals_rebuild_property(spark):
    """Property sweep: random snapshot sets and split points -- incremental
    apply must equal the one-shot rebuild for every shape (multiple keys,
    repeated attrs, keys absent from either side of the split)."""
    import random

    rng = random.Random(42)
    for trial in range(6):
        rows = []
        for k in range(1, 5):
            days = sorted(rng.sample(range(1, 28), rng.randint(1, 6)))
            for d in days:
                rows.append((k, rng.choice("abc"), d))
        split = rng.randint(2, 26)
        snaps = _snap(spark, rows)
        full = scd.scd2_from_snapshots(snaps, KEY, TRACKED, TS)
        applied = scd.scd2_apply(
            scd.scd2_from_snapshots(
                snaps.filter(F.dayofmonth("ts") < split), KEY, TRACKED, TS
            ),
            snaps.filter(F.dayofmonth("ts") >= split),
            KEY, TRACKED, TS,
        )
        assert _hist(applied) == _hist(full), (trial, split, rows)


def test_as_of_join_against_history(spark):
    """The point of SCD2: a fact row joins the attribute version valid at
    its event time."""
    hist = scd.scd2_from_snapshots(
        _snap(spark, [(1, "a", 1), (1, "b", 10)]), KEY, TRACKED, TS
    )
    facts = spark.createDataFrame(
        [(1, datetime.datetime(1997, 1, 5)), (1, datetime.datetime(1997, 1, 15))],
        "k long, ev timestamp",
    )
    joined = facts.join(hist, "k").filter(
        (F.col("ev") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ev") < F.col("valid_to")))
    )
    got = sorted((r["ev"].day, r["attr"]) for r in joined.collect())
    assert got == [(5, "a"), (15, "b")]
