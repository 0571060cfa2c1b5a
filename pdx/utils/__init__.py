"""pdx.utils — shared helpers."""

from pdx.utils.precision import resolve_dtype

__all__ = ["resolve_dtype"]
