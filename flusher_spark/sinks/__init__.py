from flusher_spark.sinks.table import Warehouse
from flusher_spark.sinks.csv import to_csv

__all__ = ["Warehouse", "to_csv"]
