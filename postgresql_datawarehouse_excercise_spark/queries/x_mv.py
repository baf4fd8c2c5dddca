"""Extension: SQL-text MV rewrite on the driver gate (mv/sql_rewrite.py).

The reference's View2 decision (assignment-5.md:626-632: answer the
customer-year report from the narrower materialization) executed END TO END
from SQL text: build the MV stack, publish the denormalized star view, hand
``spark.sql``-able text to the rewriter, and return the rewritten result.
The entry RAISES if the rewrite did not happen, so a green driver row proves
both the rewrite fired (plan reads the view2 parquet, not the fact) and
that its values hash-match the relationally-stated DuckDB oracle.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import money
from ..mv import sql_rewrite
from ..mv.definitions import default_navigator, default_registry
from . import query
from .q4_views import _VIEW2_CTE

_TEXT = "SELECT name, year, SUM(amnt) AS amnt FROM sales_star GROUP BY name, year"


@query(
    "x_mv_sql_rewrite",
    oracle=f"""WITH {_VIEW2_CTE}
SELECT name, year, CAST(ROUND(SUM(sum_d), 2) AS DOUBLE) AS amnt
FROM view2 GROUP BY name, year
""",
)
def x_mv_sql_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL text answered from an MV: the analyzed-plan matcher routes the
    star-view aggregate onto view2 (cheapest sufficient materialization),
    and the result must equal the query's relational statement."""
    reg = default_registry(tempfile.mkdtemp(prefix="pdwx-sqlrw-entry-"))
    try:
        for name in ("time", "sales", "view2"):  # the rewrite target's dep chain
            reg.build(spark, sf_dir, name)
        nav = default_navigator(reg)
        sql_rewrite.register_star_view(spark, sf_dir)
        explain: list[str] = []
        df = sql_rewrite.spark_sql(spark, sf_dir, _TEXT, reg, nav, explain=explain)
        if not any("rewriting onto MV 'view2'" in e for e in explain):
            raise AssertionError(f"MV rewrite did not fire: {explain}")
        # materialize before the temp warehouse is dropped
        return df.select(
            "name", "year", money(F.col("amnt")).alias("amnt")
        ).localCheckpoint()
    finally:
        reg.drop_all()
