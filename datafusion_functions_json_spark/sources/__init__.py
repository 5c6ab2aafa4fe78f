"""Sources & sinks.

The reference has no scans of its own — it registers in-memory Arrow
batches (reference: tests/utils/mod.rs:69-81) and inherits IO from the
host engine. Our engine inherits Spark's readers/writers the same way;
this module adds the small amount of glue the shared testdata needs and
scale-aware defaults.
"""

from .io import (
    SCALE_CONF,
    TABLES,
    load_table,
    load_tables,
    read_csv,
    read_jsonl,
    read_orc,
    session_defaults,
    write_orc,
)
from .sinks import (
    estimate_files,
    write_bucketed,
    write_partitioned,
    compact_parquet,
    write_jsonl,
    write_training_shards,
)

__all__ = [
    "load_table",
    "load_tables",
    "read_jsonl",
    "read_csv",
    "read_orc",
    "write_orc",
    "session_defaults",
    "TABLES",
    "SCALE_CONF",
    "write_partitioned",
    "write_bucketed",
    "estimate_files",
    "write_training_shards",
    "write_jsonl",
    "compact_parquet",
]
