"""gpu_mapreduce_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of baoxuezhao/GPU-mapreduce (Sandia MR-MPI +
Mars-MR-MPI fork + OINK analytics layer), re-expressed Spark-first.

The reference's KV/KMV byte-pair algebra maps onto typed DataFrames
(SURVEY.md §1.4); its ~20 dataflow operators map onto DataFrame/SQL
primitives (SURVEY.md §2.1); the OINK named commands become Python
functions returning DataFrames (SURVEY.md §2.4).

Layout:
    session.py    SparkSession factory (shuffle partitions, AQE, Arrow, UTC)
    sources/      table loaders + deterministic derived fixtures (FIXTURES.md)
    operators/    core KV algebra, text, graph, dedup, similarity, multimodal
    functions/    column-level helpers (hashing, text statistics)
    plans/        iterative fixpoint driver, plan-inspection helpers
    streaming/    Structured Streaming pipelines over the events table
    registry.py   name -> (spark_query, duckdb_oracle_sql) for the driver
"""

__version__ = "0.1.0"
