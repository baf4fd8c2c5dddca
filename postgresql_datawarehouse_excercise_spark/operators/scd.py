"""Slowly-changing-dimension type 2: attribute history with validity
intervals.

The reference warehouse keeps dimensions current-state-only (customer
cleanup UPDATEs overwrite in place, assignment-5.sql:13-15); the standard
warehouse treatment of the same problem is SCD2 -- every attribute change
closes the current row and opens a new one, so facts join the dimension AS
OF their event time.  Two operators:

* ``scd2_from_snapshots``: build the full history from a pile of
  (key, tracked attrs, observed_at) snapshots in ONE window pass --
  change-detect against the previous snapshot per key (null-safe struct
  compare), keep change rows, then valid_from/valid_to/is_current via
  lead() over the SAME partitioning (no second shuffle).
* ``scd2_apply``: incremental maintenance -- apply a new batch of
  snapshots to an existing history without rescanning closed rows: only
  OPEN rows of affected keys are closed (their keys join the delta), new
  intervals union in.  At 100 TB of history the rewrite cost tracks the
  delta x open rows, not history size; the equivalence
  ``scd2_apply(history_t, delta) == scd2_from_snapshots(all snapshots)``
  is the correctness contract (pinned by test and by the driver oracle).

Both stay entirely in DataFrame ops: window change-detection is one
shuffle on the dimension key; the as-of fact join composes with
operators/asof.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_from_snapshots(
    snapshots: DataFrame,
    key: list[str],
    tracked: list[str],
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """History from snapshots: one window partitioning (key, ordered by
    observation time) drives both change detection and interval assembly.
    Consecutive identical snapshots collapse; the last interval per key is
    open (valid_to NULL, is_current true)."""
    w = Window.partitionBy(*key).orderBy(ts_col)
    cur = F.struct(*[F.col(c) for c in tracked])
    changed = (
        snapshots.withColumn("_prev", F.lag(cur).over(w))
        # null-safe: the first snapshot per key (prev NULL) always opens a row
        .filter(~cur.eqNullSafe(F.col("_prev")))
        .drop("_prev")
    )
    w2 = Window.partitionBy(*key).orderBy(ts_col)
    return (
        changed.withColumn(valid_from, F.col(ts_col))
        .withColumn(valid_to, F.lead(ts_col).over(w2))
        .withColumn(is_current, F.col(valid_to).isNull())
        .drop(ts_col)
    )


def scd2_apply(
    history: DataFrame,
    snapshots: DataFrame,
    key: list[str],
    tracked: list[str],
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Incremental SCD2 maintenance: merge a delta batch of snapshots into
    an existing history.

    Closed rows pass through untouched (at scale: never rescanned beyond
    the key join).  For affected keys, the open row and the delta's change
    rows re-run interval assembly together -- which also collapses a delta
    snapshot equal to the open row's attributes (no spurious new version).
    Delta timestamps must be >= the open row's valid_from per key (late
    out-of-order history rewrites need a rebuild; documented contract)."""
    delta_keys = snapshots.select(*key).distinct()
    affected_open = history.filter(F.col(is_current)).join(delta_keys, key, "left_semi")
    # closed rows always pass through; open rows pass through unless their
    # key is in the delta
    untouched = history.filter(~F.col(is_current)).unionByName(
        history.filter(F.col(is_current)).join(delta_keys, key, "left_anti")
    )
    # re-run the one-pass assembly over open rows (as their own snapshot at
    # valid_from) + delta snapshots, restricted to affected keys
    reopened = affected_open.select(
        *key, *tracked, F.col(valid_from).alias(ts_col)
    )
    merged = scd2_from_snapshots(
        reopened.unionByName(
            snapshots.join(
                affected_open.select(*key), key, "left_semi"
            ).select(*key, *tracked, ts_col)
        ),
        key, tracked, ts_col, valid_from, valid_to, is_current,
    )
    # brand-new keys (no open row yet) build from the delta alone
    fresh = scd2_from_snapshots(
        snapshots.join(history.select(*key), key, "left_anti").select(
            *key, *tracked, ts_col
        ),
        key, tracked, ts_col, valid_from, valid_to, is_current,
    )
    return untouched.unionByName(merged).unionByName(fresh)
