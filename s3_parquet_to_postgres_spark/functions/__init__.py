from .numeric import (
    dround,
    dsum,
    md5_unit,
    sint,
    sql_dround,
    sql_dsum,
    sql_md5_unit,
)

__all__ = [
    "sint",
    "dsum",
    "dround",
    "md5_unit",
    "sql_dsum",
    "sql_dround",
    "sql_md5_unit",
]
