"""Constraint validators (SURVEY.md §2-A7/§7.3-D10) and layout-aware sinks."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from postgresql_datawarehouse_excercise_spark import catalog, plans
from postgresql_datawarehouse_excercise_spark.etl import validate
from postgresql_datawarehouse_excercise_spark.sources import writers


def test_key_uniqueness_of_sales_fact(spark, sf_dir):
    t = catalog.load(spark, sf_dir)
    assert validate.duplicate_keys(t.sales(), ["customerid", "timeid", "partkey"]) == 0


def test_fk_coverage_orders_to_customer(spark, sf_dir):
    t = catalog.load(spark, sf_dir)
    assert validate.fk_orphans(t.orders, "o_custkey", t.customer, "c_custkey") == 0


def test_check_constraint_analog(spark, sf_dir):
    t = catalog.load(spark, sf_dir)
    assert validate.check_violations(t.lineitem, F.col("l_quantity") > 0) == 0
    # a deliberately false predicate reports every row
    n = t.region.count()
    assert validate.check_violations(t.region, F.lit(False)) == n


def test_assert_table_raises_with_all_problems(spark, sf_dir):
    t = catalog.load(spark, sf_dir)
    dup = t.region.unionAll(t.region)  # duplicate keys on purpose
    with pytest.raises(validate.ConstraintViolation) as exc:
        validate.assert_table(
            dup, "region", key=["r_regionkey"],
            checks={"impossible": F.lit(False)},
        )
    msg = str(exc.value)
    assert "duplicate key" in msg and "CHECK impossible" in msg


def test_partitioned_write_prunes(spark, sf_dir):
    t = catalog.load(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="pdwx-part-") + "/orders_by_status"
    writers.write_partitioned(
        t.orders.withColumn("status", F.col("o_orderstatus")), path, ["status"]
    )
    df = writers.read_partition_pruned(spark, path).filter(F.col("status") == "F")
    plan = plans.formatted_plan(df)
    # partition pruning shows up as a PartitionFilters entry on the scan
    assert "PartitionFilters" in plan and "status" in plan
    assert df.count() == t.orders.filter("o_orderstatus = 'F'").count()


def test_sorted_write_roundtrip(spark, sf_dir):
    t = catalog.load(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="pdwx-sort-") + "/lineitem_sorted"
    writers.write_sorted(t.lineitem.select("l_orderkey", "l_quantity"), path, ["l_orderkey"])
    assert spark.read.parquet(path).count() == t.lineitem.count()
