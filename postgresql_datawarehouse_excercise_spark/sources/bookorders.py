"""Book-orders operational seed: runtime loader for the reference dump.

Parses the `COPY ... FROM stdin` blocks of
/root/reference/BookOrdersDatabaseDump_17.sql (tab-separated, `\\.`
terminated, `\\N` for NULL) into typed DataFrames.  Schemas follow
FIXTURES.md §A.1; char(n) values are stored TRIMMED per SURVEY.md §7.3 D1.

`clean_customer` is the reference's data-cleanup step
(assignment-5.sql:13-15) re-expressed as a transform-on-ingest
(SURVEY.md §7.3 D8): plain Parquet is immutable, so UPDATE becomes a
conditional projection.
"""

from __future__ import annotations

import os
from datetime import date
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    DecimalType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

REFERENCE_DUMP = "/root/reference/BookOrdersDatabaseDump_17.sql"

SCHEMAS: dict[str, StructType] = {
    "author": StructType(
        [
            StructField("authorid", IntegerType(), False),
            StructField("name", StringType(), True),
            StructField("surname", StringType(), False),
        ]
    ),
    "book": StructType(
        [
            StructField("isbn", IntegerType(), False),
            StructField("title", StringType(), False),
            StructField("edition_no", IntegerType(), False),
            StructField("price", DecimalType(6, 2), False),
        ]
    ),
    "book_author": StructType(
        [
            StructField("isbn", IntegerType(), False),
            StructField("authorid", IntegerType(), False),
            StructField("authorseqno", IntegerType(), False),
        ]
    ),
    "cust_order": StructType(
        [
            StructField("orderid", IntegerType(), False),
            StructField("orderdate", DateType(), False),
            StructField("customerid", IntegerType(), False),
        ]
    ),
    "customer": StructType(
        [
            StructField("customerid", IntegerType(), False),
            StructField("l_name", StringType(), False),
            StructField("f_name", StringType(), True),
            StructField("city", StringType(), False),
            StructField("district", StringType(), False),
            StructField("country", StringType(), False),
        ]
    ),
    "order_detail": StructType(
        [
            StructField("orderid", IntegerType(), False),
            StructField("item_no", IntegerType(), False),
            StructField("isbn", IntegerType(), False),
            StructField("quantity", IntegerType(), False),
        ]
    ),
}


def _convert(value: str, dtype) -> object:
    if value == r"\N":
        return None
    if isinstance(dtype, IntegerType):
        return int(value)
    if isinstance(dtype, DecimalType):
        return Decimal(value)
    if isinstance(dtype, DateType):
        return date.fromisoformat(value)
    return value.strip()  # char(n) blank padding -> trimmed (D1)


def parse_dump(path: str = REFERENCE_DUMP) -> dict[str, list[tuple]]:
    """Extract every COPY block as typed Python rows (driver-side; the seed
    is ~1.5k rows — this is fixture loading, not a data path)."""
    tables: dict[str, list[tuple]] = {}
    current: str | None = None
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if line.startswith("COPY "):
                name = line.split()[1].split(".")[-1]
                if name in SCHEMAS:
                    current = name
                    tables[current] = []
                continue
            if current is None:
                continue
            if line == r"\.":
                current = None
                continue
            fields = line.split("\t")
            schema = SCHEMAS[current]
            tables[current].append(
                tuple(_convert(v, f.dataType) for v, f in zip(fields, schema.fields))
            )
    return tables


def load_bookorders(
    spark: SparkSession, path: str = REFERENCE_DUMP
) -> dict[str, DataFrame]:
    """All six operational tables as typed DataFrames (raw, pre-cleanup)."""
    rows = parse_dump(path)
    return {
        name: spark.createDataFrame(rows[name], schema=SCHEMAS[name])
        for name in SCHEMAS
    }


def clean_customer(customer: DataFrame) -> DataFrame:
    """The reference's UPDATE cleanup (assignment-5.sql:13-15) as a
    transform: Sidney->Sydney; district fixes for customers 96 and 100."""
    return customer.withColumn(
        "city",
        F.when(F.col("city") == "Sidney", F.lit("Sydney")).otherwise(F.col("city")),
    ).withColumn(
        "district",
        F.when(F.col("customerid") == 96, F.lit("Povardarje"))
        .when(F.col("customerid") == 100, F.lit("Budapest"))
        .otherwise(F.col("district")),
    )


def available() -> bool:
    return os.path.exists(REFERENCE_DUMP)
