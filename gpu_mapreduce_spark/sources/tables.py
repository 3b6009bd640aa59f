"""Parquet table sources.

The reference reads inputs via its three `map()` file variants — file list,
recursive dirs, record-boundary-safe chunking (src/mapreduce.cpp:1060-1558).
Spark's DataSource framework subsumes all of that: `spark.read.parquet` gives
splittable columnar scans with predicate pushdown and column pruning, and
`spark.read.text` / `binaryFile` with `recursiveFileLookup` cover the
text/binary corpus cases (see sources/text_corpus.py).

At 100 TB the scan layer is where most time goes, so every query in this repo
is written to keep filters and projections at the scan (verify via
`.explain("formatted")` → `PushedFilters` / `ReadSchema`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one base table as a DataFrame (lazy; scan-level pruning applies).

    events.ts arrives as BIGINT nanoseconds (spark.sql.legacy.parquet
    .nanosAsLong — the file declares TIMESTAMP(NANOS), which Spark's reader
    otherwise rejects); it is converted here to microsecond timestamps, the
    same truncation DuckDB applies reading the file."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    if name == "events":
        # set at read time, not only in our session factory, so the queries
        # also work under a driver-provided bare SparkSession
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all base tables and register them as temp views.

    Registration makes `spark.sql` usable alongside the DataFrame API with the
    same table names the DuckDB oracle sees.
    """
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
