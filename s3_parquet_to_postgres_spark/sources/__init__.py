from .parquet import resolve_fields, scan_parquet
from .work_list import WorkList, WorkListError

__all__ = ["scan_parquet", "resolve_fields", "WorkList", "WorkListError"]
