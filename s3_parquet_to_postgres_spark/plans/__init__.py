from .registry import QuerySpec, all_queries, all_oracle_sql, get_registry

__all__ = ["QuerySpec", "all_queries", "all_oracle_sql", "get_registry"]
