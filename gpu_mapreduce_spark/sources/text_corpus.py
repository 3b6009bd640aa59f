"""Text/binary corpus readers — the reference's three `map()` file variants
(SURVEY.md §2.1), on Spark's DataSource framework.

Reference semantics being mapped:
  - `map(files)` one task per file, recursive dir expansion
    (src/mapreduce.cpp:1060, findfiles/addfiles/bcastfiles :2812-2935)
    → `read_files` / `read_files_binary` (`recursiveFileLookup=true`).
  - `map(file chunks, sepchar|sepstr, delta)` — split files into ~equal chunks,
    each extended past its end to the next separator so records aren't torn
    (src/mapreduce.cpp:1232-1558, map_chunks :1312-1484)
    → `read_lines`: Spark's text source + Hadoop LineRecordReader implement
    exactly this record-boundary-safe splitting; custom separators via
    `lineSep`. Chunk size ≅ `spark.sql.files.maxPartitionBytes`.
  - task-parallel `map(nmap, mymap)` (src/mapreduce.cpp:1044)
    → `task_range`: `spark.range(nmap)` with the task index as the column.

Scale notes: all readers are splittable scans (text/binaryFile sources);
`read_files` materializes whole files per row — fine for part-file corpora
(the reference's InvertedIndex reads 128 MB part-files whole too,
cuda/InvertedIndex.cu:284-307) but use `read_lines` when records, not files,
are the unit of work. `wholetext` rows must fit in executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_files(spark: SparkSession, path: str, recurse: bool = True) -> DataFrame:
    """(filename, text) — one row per file, whole file as one string."""
    df = (
        spark.read.format("text")
        .option("wholetext", "true")
        .option("recursiveFileLookup", str(recurse).lower())
        .load(path)
    )
    return df.select(
        F.element_at(F.split(F.input_file_name(), "/"), -1).alias("filename"),
        F.col("value").alias("text"),
    )


def read_files_binary(spark: SparkSession, path: str, recurse: bool = True) -> DataFrame:
    """(path, modificationTime, length, content BINARY) — one row per file.

    The analog of the reference's binary map() input (cpu/IntCount.cpp reads a
    128 MB binary file of int32s); downstream decoding is a mapInPandas over
    the `content` column.
    """
    return (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", str(recurse).lower())
        .load(path)
    )


def read_lines(
    spark: SparkSession, path: str, sep: str | None = None, recurse: bool = True
) -> DataFrame:
    """(filename, line) — record-boundary-safe chunked reading.

    `sep` is the reference's `sepstr` (default newline); Spark's text source
    guarantees no record is torn across partition splits — the same contract
    as map_chunks' delta-overlap fix-up (src/mapreduce.cpp:1486-1558).
    """
    reader = spark.read.format("text").option(
        "recursiveFileLookup", str(recurse).lower()
    )
    if sep is not None:
        reader = reader.option("lineSep", sep)
    df = reader.load(path)
    return df.select(
        F.element_at(F.split(F.input_file_name(), "/"), -1).alias("filename"),
        F.col("value").alias("line"),
    )


def task_range(spark: SparkSession, nmap: int, num_partitions: int | None = None) -> DataFrame:
    """Task-parallel map input: one row per task index 0..nmap-1.

    The reference assigns tasks to procs by `mapstyle` (chunk/strided/
    master-slave, src/mapreduce.cpp:1102-1225); Spark's scheduler subsumes all
    three. Generators build on this: `task_range(n).select(<exprs of itask>)`.
    """
    if num_partitions:
        return spark.range(0, nmap, 1, num_partitions).withColumnRenamed("id", "itask")
    return spark.range(nmap).withColumnRenamed("id", "itask")
