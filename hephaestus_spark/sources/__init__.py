from hephaestus_spark.sources.tables import TABLES, load_table, register_views, spread_scan
from hephaestus_spark.sources.io import (
    compact,
    read_any,
    write_bucketed,
    write_partitioned,
)

__all__ = [
    "TABLES",
    "load_table",
    "spread_scan",
    "register_views",
    "read_any",
    "write_partitioned",
    "write_bucketed",
    "compact",
]
