"""Plan introspection helpers."""

from sequila_native_spark.plans.explain import (
    formatted_plan,
    has_broadcast_hash_join,
    pushed_filters,
    scan_read_schemas,
    wholestage_codegen_ids,
)

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "scan_read_schemas",
    "has_broadcast_hash_join",
    "wholestage_codegen_ids",
]
