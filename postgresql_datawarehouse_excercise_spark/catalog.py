"""Table catalog over the driver's parquet testdata.

``Tables`` gives schema-stable DataFrames for the TPC-H-ish star schema
(region nation customer supplier part orders lineitem events documents
embeddings) plus the two derived warehouse objects the reference builds with
its ETL (time dimension, sales fact) -- see etl/.

Scale notes (100 TB north star): loading is plain ``spark.read.parquet`` so
partition pruning / predicate pushdown / column pruning all apply; nothing is
collected to the driver; derived dims are built with shuffles that reduce to
the small distinct key-set before any single-partition step.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .session import apply_runtime_confs

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


class SchemaDriftError(RuntimeError):
    """The driver's testdata schema changed out from under us.

    Raised by ``Tables.table`` with a per-column diff so a testdata rot shows
    up as one named error at load time instead of an analyzer exception deep
    inside a query plan (round 3 lost its whole bench to exactly that)."""


# Acceptable Spark dtypes per column, per table.  A set per column because the
# driver's generator has already changed representations across rounds
# (events.ts was TIMESTAMP(NANOS) -> long under nanosAsLong, now
# timestamp[us] -> timestamp_ntz); list every form we can normalize.
EXPECTED_SCHEMAS: dict[str, dict[str, set[str]]] = {
    "region": {"r_regionkey": {"int"}, "r_name": {"string"}},
    "nation": {"n_nationkey": {"int"}, "n_name": {"string"}, "n_regionkey": {"int"}},
    "customer": {
        "c_custkey": {"bigint"},
        "c_name": {"string"},
        "c_nationkey": {"int"},
        "c_acctbal": {"double"},
        "c_mktsegment": {"string"},
    },
    "supplier": {
        "s_suppkey": {"bigint"},
        "s_name": {"string"},
        "s_nationkey": {"int"},
        "s_acctbal": {"double"},
    },
    "part": {
        "p_partkey": {"bigint"},
        "p_name": {"string"},
        "p_brand": {"string"},
        "p_type": {"string"},
        "p_size": {"int"},
        "p_retailprice": {"double"},
    },
    "orders": {
        "o_orderkey": {"bigint"},
        "o_custkey": {"bigint"},
        "o_orderstatus": {"string"},
        "o_totalprice": {"double"},
        "o_orderdate": {"timestamp", "timestamp_ntz"},
        "o_orderpriority": {"string"},
    },
    "lineitem": {
        "l_orderkey": {"bigint"},
        "l_partkey": {"bigint"},
        "l_suppkey": {"bigint"},
        "l_linenumber": {"int"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_returnflag": {"string"},
        "l_linestatus": {"string"},
        "l_shipdate": {"timestamp", "timestamp_ntz"},
    },
    "events": {
        "event_id": {"bigint"},
        "ts": {"bigint", "timestamp", "timestamp_ntz"},
        "user_id": {"bigint"},
        "event_type": {"string"},
        "value": {"double"},
        "props": {"string"},
    },
    "documents": {
        "doc_id": {"bigint"},
        "text": {"string"},
        "lang": {"string"},
        "source": {"string"},
        "n_chars": {"bigint"},
    },
    "embeddings": {
        "vec_id": {"bigint"},
        "embedding": {"array<float>"},
        "label": {"int"},
    },
}


def check_schema_drift(name: str, df: DataFrame) -> None:
    """Raise SchemaDriftError if ``df`` deviates from EXPECTED_SCHEMAS[name]."""
    expected = EXPECTED_SCHEMAS.get(name)
    if expected is None:
        return
    actual = dict(df.dtypes)
    drift: list[str] = []
    for col, allowed in expected.items():
        if col not in actual:
            drift.append(f"missing column {col!r} (expected one of {sorted(allowed)})")
        elif actual[col] not in allowed:
            drift.append(f"{col}: loaded as {actual[col]!r}, expected one of {sorted(allowed)}")
    for col in actual:
        if col not in expected:
            drift.append(f"unexpected extra column {col!r} ({actual[col]})")
    if drift:
        raise SchemaDriftError(
            f"testdata schema drift in table {name!r}: " + "; ".join(drift)
        )


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize events.ts to TimestampType micros, whatever form it loaded in.

    The driver's generator has stored ts as TIMESTAMP(NANOS) (surfaced as
    long nanos under spark.sql.legacy.parquet.nanosAsLong) and as
    timestamp[us] (surfaced as timestamp_ntz) in different rounds; branch on
    the loaded dtype instead of assuming either.  Session timezone is pinned
    UTC (session.py) so the ntz->ltz cast preserves wall-clock and epoch.
    """
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        # integer `div`, not `/`: epoch-nanos exceed double's 2^53
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dtype == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    if dtype == "timestamp":
        return df
    raise SchemaDriftError(
        f"events.ts loaded as {dtype!r}; expected bigint (nanosAsLong), "
        "timestamp, or timestamp_ntz"
    )


@dataclass
class Tables:
    spark: SparkSession
    sf_dir: str
    _cache: dict[str, DataFrame] = field(default_factory=dict)

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        if name in TABLE_NAMES:
            return self.table(name)
        raise AttributeError(name)

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            df = self.spark.read.parquet(f"{self.sf_dir}/{name}.parquet")
            check_schema_drift(name, df)
            if name == "events":
                df = normalize_event_ts(df)
            self._cache[name] = df
        return self._cache[name]

    # Derived warehouse objects (reference ETL: assignment-5.sql:42-80),
    # memoized per (session, sf_dir) so every query shares one lineage.
    def time_dim(self) -> DataFrame:
        if "time_dim" not in self._cache:
            from .etl.time_dim import build_time_dim

            self._cache["time_dim"] = build_time_dim(self.orders)
        return self._cache["time_dim"]

    def sales(self) -> DataFrame:
        if "sales" not in self._cache:
            from .etl.sales_fact import build_sales

            self._cache["sales"] = build_sales(
                self.lineitem, self.orders, self.part, self.time_dim()
            )
        return self._cache["sales"]


_TABLES_CACHE: dict[tuple[int, str], Tables] = {}


def load(spark: SparkSession, sf_dir: str) -> Tables:
    """Memoized Tables per (SparkSession, sf_dir)."""
    apply_runtime_confs(spark)
    key = (id(spark), sf_dir.rstrip("/"))
    if key not in _TABLES_CACHE:
        _TABLES_CACHE[key] = Tables(spark, sf_dir.rstrip("/"))
    return _TABLES_CACHE[key]


def delta_tables(spark: SparkSession, sf_dir: str, **overrides: DataFrame) -> Tables:
    """A FRESH (non-memoized) Tables with named slots replaced -- the input
    shape for MVRegistry.refresh_incremental: override the fact tables
    (orders, lineitem, ...) with the new batch; dimension tables not named
    here load their full form lazily as usual."""
    t = Tables(spark, sf_dir.rstrip("/"))
    t._cache.update(overrides)
    return t


def register_views(spark: SparkSession, sf_dir: str, include_derived: bool = True) -> None:
    """Expose the catalog to `spark.sql(...)`: every base table as a temp
    view, plus the derived warehouse objects (`time`, `sales`) so the
    reference's own SQL formulations (NATURAL JOIN etc.) run verbatim."""
    t = load(spark, sf_dir)
    for name in TABLE_NAMES:
        t.table(name).createOrReplaceTempView(name)
    if include_derived:
        t.time_dim().createOrReplaceTempView("time")
        t.sales().createOrReplaceTempView("sales")
