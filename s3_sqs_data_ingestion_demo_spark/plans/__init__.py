from .merge_sql import execute_merge_into, is_merge_into, parse_merge_into
from .transform import apply_transform_query

__all__ = [
    "apply_transform_query",
    "execute_merge_into",
    "is_merge_into",
    "parse_merge_into",
]
