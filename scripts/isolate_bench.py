"""Isolated per-entry re-measure: warm session, best/median-of-N via noop sink.

Usage: python scripts/isolate_bench.py <iters> <entry> [<entry> ...]

Mirrors bench.py's session + warmup so numbers are comparable to BENCH_full,
but times only the named entries (guide section 1: isolate each expensive
query; the noop sink times the computation, not the sink).
"""

from __future__ import annotations

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from pyspark.sql import SparkSession  # noqa: E402

from postgresql_datawarehouse_excercise_spark import catalog, session  # noqa: E402
from postgresql_datawarehouse_excercise_spark.queries import load_all  # noqa: E402


def main() -> None:
    iters = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName("pdwx-isolate")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in session.RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = session.apply_runtime_confs(builder.getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    # bench.py's warmup: codegen, table scans, Arrow round trip
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = catalog.load(spark, sf_dir)
    for tname in catalog.TABLE_NAMES:
        warm.table(tname).write.format("noop").mode("overwrite").save()
    spark.range(10_000).toPandas()
    registry = load_all()
    for name in names:
        ts = []
        for _ in range(iters):
            spark.sparkContext.setJobDescription(f"isolate:{name}")
            t0 = time.perf_counter()
            registry[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(time.perf_counter() - t0)
        ts_s = sorted(ts)
        print(
            f"{name}: best={ts_s[0]:.3f} median={ts_s[len(ts_s)//2]:.3f} "
            f"all={[round(t, 3) for t in ts]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
