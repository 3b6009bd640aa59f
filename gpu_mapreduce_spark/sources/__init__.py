from gpu_mapreduce_spark.sources.tables import TABLES, load_tables, table
from gpu_mapreduce_spark.sources import fixtures

__all__ = ["TABLES", "load_tables", "table", "fixtures"]
