"""Plan + time audit for the TPC-H 100x heavy tail (VERDICT r8 #6):
q18 and q9 at a K-fold lineitem, with the AQE-final plans dumped so the
join strategies and skew handling are inspectable.

Usage: python scripts/tpch_heavy_audit.py [K] [q18|q9|q18_pre ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postgresql_datawarehouse_excercise_spark.session import get_spark  # noqa: E402
from postgresql_datawarehouse_excercise_spark import catalog  # noqa: E402
from scripts.scale_smoke import _materialize_tpch_dir, multiply  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    k = int(args[0]) if args and args[0].isdigit() else 100
    which = set(args[1:]) or {"q18", "q9"}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("tpch-heavy-audit")
    t = catalog.load(spark, sf_dir)
    tpch_dir = _materialize_tpch_dir(spark, t, k, sf_dir)
    from postgresql_datawarehouse_excercise_spark.queries import load_all

    regq = load_all()
    for name in ("x_tpch_q18_large_orders", "x_tpch_q9_product_profit"):
        short = "q18" if "q18" in name else "q9"
        if short not in which:
            continue
        df = regq[name].fn(spark, tpch_dir)
        # ONE timed collect: the row count derives from it and the dumped
        # AQE-final plan is the plan of exactly this execution (a separate
        # count() would both double the heavy runtime and print a timing
        # that belongs to a different plan than the one dumped)
        t0 = time.time()
        rows = df.collect()
        dt = time.time() - t0
        print(f"{name} x{k}: {len(rows)} rows in {dt:.1f}s", flush=True)
        print(df._jdf.queryExecution().executedPlan().toString()[:4000])


if __name__ == "__main__":
    main()
