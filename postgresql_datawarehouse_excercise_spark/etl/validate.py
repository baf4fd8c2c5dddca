"""ETL-time constraint validation (SURVEY.md §2-A7, §7.3 D10).

Spark on Parquet enforces no PK/FK/CHECK/NOT NULL constraints, so the
reference's declared constraints become build-time assertions.  Each check
returns the offending row count (0 = pass) computed with one aggregate —
they run as actions on the already-shuffled build output, so the marginal
cost at 100 TB is one extra pass over the (much smaller) materialized
result, not over the source.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ConstraintViolation(AssertionError):
    pass


def duplicate_keys(df: DataFrame, key_cols: list[str]) -> int:
    """PK/unique-index analog: number of key tuples appearing more than once."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )


def null_violations(df: DataFrame, not_null_cols: list[str]) -> int:
    cond = None
    for c in not_null_cols:
        cur = F.col(c).isNull()
        cond = cur if cond is None else (cond | cur)
    return df.filter(cond).count() if cond is not None else 0


def check_violations(df: DataFrame, predicate: Column) -> int:
    """CHECK-constraint analog: rows where the declared predicate is NOT
    satisfied (null-safe: null predicate counts as a violation, matching
    nothing-but-true semantics of an ETL gate, stricter than SQL CHECK)."""
    return df.filter(~F.coalesce(predicate, F.lit(False))).count()


def fk_orphans(child: DataFrame, child_col: str, parent: DataFrame, parent_col: str) -> int:
    """FK-coverage analog: child keys with no parent (left-anti join; the
    parent side is the dimension, so Catalyst broadcasts it)."""
    parent_keys = parent.select(F.col(parent_col).alias(child_col)).distinct()
    return child.select(child_col).join(parent_keys, child_col, "left_anti").count()


def assert_table(
    df: DataFrame,
    name: str,
    key: list[str] | None = None,
    not_null: list[str] | None = None,
    checks: dict[str, Column] | None = None,
) -> None:
    """Raise ConstraintViolation listing every failed rule for `name`."""
    problems: list[str] = []
    if key:
        n = duplicate_keys(df, key)
        if n:
            problems.append(f"{n} duplicate key tuples on {key}")
    if not_null:
        n = null_violations(df, not_null)
        if n:
            problems.append(f"{n} rows with NULLs in {not_null}")
    for label, pred in (checks or {}).items():
        n = check_violations(df, pred)
        if n:
            problems.append(f"{n} rows violate CHECK {label}")
    if problems:
        raise ConstraintViolation(f"{name}: " + "; ".join(problems))
