from hummingbird_spark.operators.compare import compare_tables, sampled_hash_compare
from hummingbird_spark.operators.copy import copy_table, run_migration
from hummingbird_spark.operators.split import block_boundaries, partition_for_copy

__all__ = [
    "copy_table",
    "run_migration",
    "compare_tables",
    "sampled_hash_compare",
    "block_boundaries",
    "partition_for_copy",
]
