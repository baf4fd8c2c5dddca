"""Catalog loading guards: testdata schema drift must fail with a named
error at load time (round 3 lost its bench to a silent dtype change in
events.ts that only surfaced as an analyzer exception mid-query)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgresql_datawarehouse_excercise_spark import catalog


def test_all_tables_pass_drift_guard(spark, sf_dir):
    t = catalog.load(spark, sf_dir)
    for name in catalog.TABLE_NAMES:
        t.table(name)  # raises SchemaDriftError on drift


def test_wrong_dtype_parquet_raises_named_error(spark, sf_dir, tmp_path):
    bad_dir = str(tmp_path / "bad_sf")
    t = catalog.load(spark, sf_dir)
    # region with r_regionkey widened to bigint: a dtype drift
    t.region.withColumn(
        "r_regionkey", F.col("r_regionkey").cast("bigint")
    ).write.parquet(f"{bad_dir}/region.parquet")
    bad = catalog.Tables(spark, bad_dir)
    with pytest.raises(catalog.SchemaDriftError, match="r_regionkey"):
        bad.table("region")


def test_missing_column_raises_named_error(spark, sf_dir, tmp_path):
    bad_dir = str(tmp_path / "bad_sf")
    t = catalog.load(spark, sf_dir)
    t.nation.drop("n_name").write.parquet(f"{bad_dir}/nation.parquet")
    bad = catalog.Tables(spark, bad_dir)
    with pytest.raises(catalog.SchemaDriftError, match="n_name"):
        bad.table("nation")


def test_events_ts_normalizes_from_all_layouts(spark, sf_dir, tmp_path):
    """Both historical testdata layouts of events.ts (long nanos under
    nanosAsLong, timestamp[us]) must normalize to identical TimestampType
    values; an unknown dtype must raise the named error."""
    t = catalog.load(spark, sf_dir)
    nanos_dir = str(tmp_path / "nanos_sf")
    t.events.withColumn(
        "ts", (F.unix_micros("ts") * F.lit(1000)).cast("long")
    ).write.parquet(f"{nanos_dir}/events.parquet")

    from_nanos = catalog.Tables(spark, nanos_dir).events
    assert dict(from_nanos.dtypes)["ts"] == "timestamp"
    assert dict(t.events.dtypes)["ts"] == "timestamp"
    a = sorted(r[0] for r in t.events.select(F.unix_micros("ts")).collect())
    b = sorted(r[0] for r in from_nanos.select(F.unix_micros("ts")).collect())
    assert a == b

    with pytest.raises(catalog.SchemaDriftError, match="events.ts"):
        catalog.normalize_event_ts(
            t.events.withColumn("ts", F.col("event_id").cast("double"))
        )
