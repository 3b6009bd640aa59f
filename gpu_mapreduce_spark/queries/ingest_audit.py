"""Malformed-record auditing on CSV ingest (beyond-reference pipeline
robustness). Tail-registered per the SURVEY §2.6 discipline.

A landing zone always contains some torn/corrupt rows; the ingest job must
COUNT and QUARANTINE them deterministically, not crash and not silently
drop. Fixture: the orders CSV with every o_orderkey % 37 == 0 row's price
field replaced by a non-numeric token — so the expected bad-row set is
exact arithmetic the oracle recomputes from the parquet source of truth
(no dependency on reading the dirty file with a second engine, whose
malformed-row semantics would differ)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_mapreduce_spark.queries.core_ops import _CHUNK_SCRATCH
from gpu_mapreduce_spark.registry import register
from gpu_mapreduce_spark.sources.tables import table

_BAD_MOD = 37


def _orders_csv_dirty(spark: SparkSession, sf_dir: str) -> str:
    """Orders CSV with deterministically injected malformed price fields,
    written distributed (same staleness contract as _orders_csv)."""
    out = _CHUNK_SCRATCH / sf_dir.strip("/").replace("/", "_") / "orders_csv_dirty"
    marker = out / "_SUCCESS"
    src = f"{sf_dir}/orders.parquet"
    if not marker.exists() or marker.stat().st_mtime < os.path.getmtime(src):
        price = F.when(
            F.col("o_orderkey") % _BAD_MOD == 0, F.lit("NOT_A_NUMBER")
        ).otherwise(F.col("o_totalprice").cast("string"))
        (
            table(spark, sf_dir, "orders")
            .select(
                F.concat_ws(
                    ",",
                    F.col("o_orderkey").cast("string"),
                    F.col("o_custkey").cast("string"),
                    "o_orderstatus",
                    price,
                ).alias("value")
            )
            .write.mode("overwrite")
            .text(str(out))
        )
    return str(out)


@register(
    "csv_malformed_audit",
    tags=("sources", "robustness"),
    # oracle recomputes the expected accounting from the parquet source of
    # truth: the injection schedule is pure arithmetic on o_orderkey
    oracle=f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN o_orderkey % {_BAD_MOD} = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
               (CAST(SUM(CASE WHEN o_orderkey % {_BAD_MOD} <> 0
                              THEN CAST(FLOOR(o_totalprice * 10000) AS BIGINT)
                              ELSE 0 END) AS DOUBLE) / 10000)
                   AS sum_price_good
        FROM orders
    """,
)
def csv_malformed_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE typed read of the dirty CSV with an explicit
    columnNameOfCorruptRecord: malformed rows surface as a quarantine
    column (never a crash, never a silent drop), and the audit reports
    total/bad counts plus the exact fixed-point revenue over clean rows.
    Declared schema as in csv_source_revenue — no inferSchema discovery
    pass; the corrupt-record column costs nothing on clean rows."""
    path = _orders_csv_dirty(spark, sf_dir)
    schema = (
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, _corrupt_record string"
    )
    df = (
        spark.read.schema(schema)
        .option("header", "false")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    good_units = F.when(
        F.col("_corrupt_record").isNull(),
        F.floor(F.col("o_totalprice") * 10000).cast("bigint"),
    ).otherwise(F.lit(0))
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(
            F.when(F.col("_corrupt_record").isNotNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_bad"),
        (F.sum(good_units).cast("double") / 10000).alias("sum_price_good"),
    )
