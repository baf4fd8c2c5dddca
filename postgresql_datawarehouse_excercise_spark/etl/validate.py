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


def assert_table_one_pass(
    df: DataFrame,
    name: str,
    key: list[str],
    not_null: list[str] | None = None,
    fks: list[tuple[str, DataFrame, str]] | None = None,
) -> None:
    """Every declared rule in ONE aggregate job: FK coverage rides the same
    pass as PK uniqueness and NOT NULL counts.

    Each foreign key (child_col, parent_df, parent_col) becomes a broadcast
    LEFT join tagging covered rows, then a two-level aggregate on the key
    computes duplicate-key-tuple, NULL, and per-FK orphan counts together --
    one action instead of 2 + len(fks) separate jobs, which at any scale
    means one pass over the materialized build output instead of five."""
    probe = df
    fk_cols: list[str] = []
    for ccol, parent, pcol in fks or []:
        pk = (
            parent.select(F.col(pcol).alias(ccol))
            .distinct()
            .withColumn(f"_fk_{ccol}", F.lit(1))
        )
        probe = probe.join(F.broadcast(pk), ccol, "left")
        fk_cols.append(ccol)
    null_cond = None
    for c in not_null or []:
        cur = F.col(c).isNull()
        null_cond = cur if null_cond is None else (null_cond | cur)
    per_key = probe.groupBy(*key).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(
            F.when(null_cond if null_cond is not None else F.lit(False), 1).otherwise(0)
        ).alias("_nulls"),
        *[
            F.sum(F.when(F.col(f"_fk_{c}").isNull(), 1).otherwise(0)).alias(f"_orph_{c}")
            for c in fk_cols
        ],
    )
    row = per_key.agg(
        F.sum(F.when(F.col("_n") > 1, 1).otherwise(0)).alias("_dups"),
        F.sum("_nulls").alias("_nulls"),
        *[F.sum(f"_orph_{c}").alias(f"_orph_{c}") for c in fk_cols],
    ).collect()[0]
    problems: list[str] = []
    if row["_dups"]:
        problems.append(f"{row['_dups']} duplicate key tuples on {key}")
    if row["_nulls"]:
        problems.append(f"{row['_nulls']} rows with NULLs in {not_null}")
    for c in fk_cols:
        if row[f"_orph_{c}"]:
            problems.append(f"{row[f'_orph_{c}']} rows with {c} not covered by parent")
    if problems:
        raise ConstraintViolation(f"{name}: " + "; ".join(problems))


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
