"""Registry of every declared capability: name -> (Spark query fn,
optional DuckDB oracle SQL). __spark_entry__.py exposes this to the
driver; tests run the same pairs through a local DuckDB harness.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from . import ext, relational, tpch
from .base import QuerySpec


def get_registry() -> dict[str, QuerySpec]:
    specs: dict[str, QuerySpec] = {}
    for module_specs in (relational.SPECS, tpch.SPECS, ext.SPECS):
        for spec in module_specs:
            if spec.name in specs:
                raise ValueError(f"duplicate query name: {spec.name}")
            specs[spec.name] = spec
    return specs


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in get_registry().items()}


def all_oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in get_registry().items()
        if spec.oracle is not None
    }
