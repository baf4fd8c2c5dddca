"""Bloom filter operator (operators/bloomfilter.py): no false negatives,
bounded false-positive rate, partition-count-independent result."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgresql_datawarehouse_excercise_spark.operators import bloomfilter


def test_no_false_negatives_and_bounded_fp(spark):
    members = spark.range(5_000).select((F.col("id") * 2654435761).alias("h"))
    bloom = bloomfilter.build(members, "h")
    probe = bloomfilter.probe_col(spark, bloom)
    # every member must hit
    misses = members.filter(~probe(F.col("h"))).count()
    assert misses == 0
    # non-members: fp rate well under 1% at 4M bits / 5k items / k=4
    others = spark.range(5_000, 25_000).select((F.col("id") * 2654435761).alias("h"))
    fps = others.filter(probe(F.col("h"))).count()
    assert fps / 20_000 < 0.01, fps


def test_partition_count_does_not_change_the_filter(spark):
    a = spark.range(2_000).select(F.col("id").alias("h")).repartition(1)
    b = spark.range(2_000).select(F.col("id").alias("h")).repartition(7)
    assert bloomfilter.build(a, "h") == bloomfilter.build(b, "h")


def test_driver_collect_bounded_on_many_partition_input(spark):
    """Blooming a many-partition input (the train-side foot-gun) must fold
    partials executor-side: the driver collects at most _FAN_IN rows --
    a fixed byte bound -- and the filter stays bit-identical to the
    single-partition build."""
    wide = spark.range(10_000).select(F.col("id").alias("h")).repartition(64)
    reduced = bloomfilter._reduced_partials(wide, "h", 1 << 22, 4)
    assert reduced.count() <= bloomfilter._FAN_IN
    narrow = spark.range(10_000).select(F.col("id").alias("h")).repartition(1)
    assert bloomfilter.build(wide, "h") == bloomfilter.build(narrow, "h")
