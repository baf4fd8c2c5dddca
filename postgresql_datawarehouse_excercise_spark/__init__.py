"""PySpark-native OLAP engine with the query/data-processing surface of
zoltan-nz/postgresql-datawarehouse-excercise (a PostgreSQL star-schema data-mart
exercise), rebuilt Spark-first.

Layout:
  session     -- SparkSession factory (local[N] tuned, AQE on)
  catalog     -- driver-testdata table loading + per-sf caching
  functions   -- shared column helpers (exact decimal money arithmetic)
  etl/        -- cleanup, time dimension, sales fact builders
  mv/         -- materialized-view registry + aggregate navigator
  queries/    -- the reference's Q1-Q5 query library (+ oracle SQL twins)
  operators/  -- dedup, similarity search, text analysis, multimodal
  streaming/  -- event-stream operators (tumbling/sliding/session windows)

Reference parity map: SURVEY.md section 2 in the repo root; each query cites
the reference file:line it re-expresses.
"""

__version__ = "0.1.0"
