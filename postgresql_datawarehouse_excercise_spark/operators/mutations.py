"""In-place table mutation over plain parquet: UPDATE / DELETE / CHECK.

The reference mutates its warehouse in place -- `UPDATE customer SET city =
'Sydney' WHERE city = 'Sidney'` (assignment-5.sql:13-15) against tables with
declared constraints (BookOrdersDatabaseDump_17.sql table DDL).  SURVEY.md
section 7.3 D8 answered that with transform-on-ingest (parquet is immutable);
this module closes the remaining gap with a real mutable-table object, the
way a lakehouse does it but with zero format dependencies:

* **Copy-on-write**: an UPDATE/DELETE rewrites data files and atomically
  swaps them in; readers before the swap see the old snapshot.
* **Partition-pruned COW** (the scale path): for a partitioned table, only
  partitions that contain matching rows are rewritten -- the same file-
  granularity strategy Delta/Iceberg/Hudi COW uses.  An UPDATE of one city
  in a country-partitioned 100 TB table rewrites one partition, not 100 TB.
* **CHECK constraints**: declared per table, validated in ONE aggregate job
  per write (all checks together, count of violations each), raising a named
  `CheckViolation` -- Postgres CHECK semantics on write (the write is
  rejected, nothing is swapped in).

Everything is DataFrame-native: the updated projection is a CASE WHEN over
the old rows (Catalyst folds it into the rewrite scan), matching rows are
found with the same pushed-down predicate the rewrite uses, and no row ever
passes through the driver.

Atomicity contract (stated, not hidden): unpartitioned rewrites and each
individual partition swap are atomic (os.replace of a staged directory);
a MULTI-partition mutation is atomic per partition, not across partitions --
a crash mid-loop leaves some partitions updated and some not, all readable.
Cross-partition transactional commit is exactly what a lakehouse log (Delta/
Iceberg) adds; on plain parquet the honest guarantee is per-partition, and
the staged write means no reader ever sees a half-written file.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckViolation(RuntimeError):
    """A write violated one or more declared CHECK constraints."""


class NoSuchPartitionColumn(RuntimeError):
    """update/delete referenced a partition spec the table doesn't have."""


def _as_column(expr: "Column | str") -> Column:
    return expr if isinstance(expr, Column) else F.expr(expr)


# Characters Hive/Spark escape in partition directory names
# (ExternalCatalogUtils.charToEscape); partition-value paths we construct
# manually must match what the writer produced.
_ESCAPED = set('"#%\'*/:=?\\\x7f{[]^')


def _escape_path_name(value: object) -> str:
    s = str(value)
    return "".join(
        f"%{ord(ch):02X}" if (ch in _ESCAPED or ord(ch) < 0x20) else ch
        for ch in s
    )


class ManagedParquetTable:
    """A mutable parquet table: COW updates/deletes + CHECK-on-write.

    Layout: ``<root>/data`` holds the current snapshot (optionally
    partitioned); rewrites build ``<root>/.staging-*`` and atomically swap.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        partition_by: tuple[str, ...] = (),
        checks: dict[str, str] | None = None,
    ) -> None:
        self.spark = spark
        self.root = root.rstrip("/")
        self.partition_by = tuple(partition_by)
        self.checks: dict[str, str] = dict(checks or {})

    # -- paths ------------------------------------------------------------
    @property
    def data_path(self) -> str:
        return os.path.join(self.root, "data")

    def exists(self) -> bool:
        return os.path.exists(self.data_path)

    # -- constraints ------------------------------------------------------
    def add_check(self, name: str, predicate_sql: str) -> None:
        """Declare a CHECK constraint (validated on every subsequent write;
        call validate() to retro-check existing data)."""
        self.checks[name] = predicate_sql

    def _validate(self, df: DataFrame) -> None:
        if not self.checks:
            return
        # ONE aggregate job for every declared check: count rows where the
        # predicate is not satisfied (NULL counts as a violation, matching
        # the strictness a cleanup pipeline wants, unlike SQL CHECK's
        # unknown-passes rule -- documented deviation).
        agg = df.agg(
            *[
                F.sum(
                    F.when(F.expr(pred), F.lit(0)).otherwise(F.lit(1))
                ).alias(name)
                for name, pred in self.checks.items()
            ]
        )
        row = agg.collect()[0]
        violated = {n: int(row[n]) for n in self.checks if row[n]}
        if violated:
            raise CheckViolation(
                "CHECK constraint(s) violated, write rejected: "
                + ", ".join(f"{n} ({c} rows)" for n, c in sorted(violated.items()))
            )

    def validate(self) -> None:
        """Retro-validate the current snapshot against declared checks."""
        self._validate(self.read())

    # -- io ---------------------------------------------------------------
    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.data_path)

    def _write_snapshot(self, df: DataFrame, dest: str) -> None:
        writer = df.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(dest)

    def _swap_in(self, staging: str) -> None:
        old = self.root + f".old-{uuid.uuid4().hex[:8]}"
        os.replace(self.data_path, old)
        os.replace(staging, self.data_path)
        shutil.rmtree(old, ignore_errors=True)

    def overwrite(self, df: DataFrame) -> None:
        """CREATE or full replace (checks validated first)."""
        self._validate(df)
        if not self.exists():
            os.makedirs(self.root, exist_ok=True)
            self._write_snapshot(df, self.data_path)
            return
        staging = os.path.join(self.root, f".staging-{uuid.uuid4().hex[:8]}")
        self._write_snapshot(df, staging)
        self._swap_in(staging)

    # -- mutations --------------------------------------------------------
    def update_where(
        self, predicate: "Column | str", set_map: dict[str, "Column | str"]
    ) -> int:
        """UPDATE ... SET ... WHERE: rewrite only what the predicate touches.

        Returns the number of updated rows.  Partitioned tables rewrite only
        the partitions containing matches (pruned COW); unpartitioned tables
        rewrite the single snapshot.
        """
        pred = _as_column(predicate)
        updated = self.read().withColumns(
            {
                col: F.when(pred, _as_column(expr)).otherwise(F.col(col))
                for col, expr in set_map.items()
            }
        )
        return self._rewrite_touched(pred, updated)

    def delete_where(self, predicate: "Column | str") -> int:
        """DELETE ... WHERE: partition-pruned COW like update_where.
        Returns the number of deleted rows."""
        pred = _as_column(predicate)
        return self._rewrite_touched(pred, self.read().filter(~pred))

    def _rewrite_touched(self, pred: Column, new_rows: DataFrame) -> int:
        """Rewrite the partitions (or whole snapshot) where pred matches,
        replacing their contents with new_rows restricted to them."""
        current = self.read()
        n_touched = current.filter(pred).count()
        if n_touched == 0:
            return 0
        self._validate(new_rows)
        if not self.partition_by:
            staging = os.path.join(self.root, f".staging-{uuid.uuid4().hex[:8]}")
            self._write_snapshot(new_rows, staging)
            self._swap_in(staging)
            return n_touched

        # Partition-pruned COW.  The touched partition-value set is small by
        # construction (it is bounded by the partition count, not the row
        # count), so collecting it to build the pruning predicate is the
        # standard metadata-sized driver step, not a data collect.
        touched = [
            tuple(r)
            for r in current.filter(pred)
            .select(*self.partition_by)
            .distinct()
            .collect()
        ]
        # OR-of-conjunctions over literal partition values: Catalyst turns
        # this into partition pruning, so the rewrite scan reads ONLY the
        # touched partitions.
        from functools import reduce

        in_touched = reduce(
            lambda a, b: a | b,
            [
                reduce(
                    lambda a, b: a & b,
                    [F.col(c) == F.lit(v) for c, v in zip(self.partition_by, t)],
                )
                for t in touched
            ],
        )
        # Stage the replacement rows for ONLY the touched partitions, then
        # swap those partition directories in one by one (atomic per
        # partition via os.replace).
        staging = os.path.join(self.root, f".staging-{uuid.uuid4().hex[:8]}")
        self._write_snapshot(new_rows.filter(in_touched), staging)
        for t in touched:
            rel = os.path.join(
                *[
                    f"{c}={_escape_path_name(v)}"
                    for c, v in zip(self.partition_by, t)
                ]
            )
            src, dst = os.path.join(staging, rel), os.path.join(self.data_path, rel)
            if os.path.exists(src):
                old = dst + f".old-{uuid.uuid4().hex[:8]}"
                if os.path.exists(dst):
                    os.replace(dst, old)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.replace(src, dst)
                shutil.rmtree(old, ignore_errors=True)
            elif os.path.exists(dst):
                # every row of this partition was deleted
                shutil.rmtree(dst)
        shutil.rmtree(staging, ignore_errors=True)
        return n_touched


def temp_table(
    spark: SparkSession,
    df: DataFrame,
    partition_by: tuple[str, ...] = (),
    checks: dict[str, str] | None = None,
) -> ManagedParquetTable:
    """Materialize df as a throwaway ManagedParquetTable (tests/demos)."""
    t = ManagedParquetTable(
        spark,
        tempfile.mkdtemp(prefix="pdwx-managed-"),
        partition_by=partition_by,
        checks=checks,
    )
    t.overwrite(df)
    return t
