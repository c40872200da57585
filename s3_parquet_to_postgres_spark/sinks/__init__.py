from .jdbc import JdbcSink, SchemaValidationError, validate_target_schema
from .copy import CopySink

__all__ = [
    "JdbcSink",
    "CopySink",
    "validate_target_schema",
    "SchemaValidationError",
]
