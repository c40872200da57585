from .numeric import dround, dsum, sint, sql_dround, sql_dsum

__all__ = ["sint", "dsum", "dround", "sql_dsum", "sql_dround"]
