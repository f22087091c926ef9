from .transform import apply_transform_query

__all__ = ["apply_transform_query"]
