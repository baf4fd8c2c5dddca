"""Custom operator families (training-data-pipeline extensions).

Everything here is built from Spark built-ins (whole-stage-codegen'd,
shuffle-aware); no row-at-a-time Python UDFs in any hot path.  Each operator
module also emits a DuckDB-SQL twin of its arithmetic so the driver's
value-hash correctness gate covers these extensions exactly, not just
row-count-wise.
"""
