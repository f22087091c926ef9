from .files import read_batch, SUPPORTED_FORMATS

__all__ = ["read_batch", "SUPPORTED_FORMATS"]
