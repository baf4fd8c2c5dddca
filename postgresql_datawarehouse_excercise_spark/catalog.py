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
            if name == "events":
                # ts is TIMESTAMP(NANOS) in the file, surfaced as long nanos
                # via nanosAsLong; truncate to micros (what DuckDB also does).
                from pyspark.sql import functions as F

                # integer `div`, not `/`: epoch-nanos exceed double's 2^53
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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
