"""Dump .explain("formatted") for registry entries to plans/<tag>/<name>_<suffix>.txt.

Usage: python scripts/explain_dump.py <tag> <suffix> <entry> [<entry> ...]
e.g.   python scripts/explain_dump.py r16 before x_dedup_simhash_pairs

Runs on the bench scale ($SPARK_GRAFT_SF_DIR, default sf0.1) with the bench
session confs, so the captured plan is the one the bench times.
"""

from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from pyspark.sql import SparkSession  # noqa: E402

from postgresql_datawarehouse_excercise_spark import session  # noqa: E402
from postgresql_datawarehouse_excercise_spark.queries import load_all  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName("pdwx-explain")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
    )
    for k, v in session.RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = session.apply_runtime_confs(builder.getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    out_dir = os.path.join(_ROOT, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        n_exch = text.count("Exchange")
        print(f"{name}: {len(text)} chars, {n_exch} Exchange -> {path}", flush=True)


if __name__ == "__main__":
    main()
