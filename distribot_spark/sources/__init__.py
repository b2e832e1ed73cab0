"""Sources & sinks: format readers/writers and layout-aware sinks."""

from distribot_spark.sources.io import (
    read_any,
    write_any,
    write_bucketed_table,
    write_partitioned,
)

__all__ = ["read_any", "write_any", "write_partitioned", "write_bucketed_table"]
