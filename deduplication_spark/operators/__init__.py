from deduplication_spark.operators.exact import exact_assignments, with_content_hash
from deduplication_spark.operators.components import connected_components

__all__ = ["exact_assignments", "with_content_hash", "connected_components"]
