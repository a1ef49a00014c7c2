"""Named query registry: Spark callable + DuckDB oracle SQL per operator.

Every operator from SURVEY.md §2 is exposed here as a named query so
the driver (and our own tests) can hash-match Spark output against a
DuckDB oracle over the same parquet fixtures.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    """One registry entry.

    - ``name``: stable key (shared between queries() and oracle_sql()).
    - ``fn``: (spark, sf_dir) -> DataFrame, pure DataFrame-API impl.
    - ``oracle``: equivalent DuckDB SQL over the pre-registered views,
      or None for non-SQL-expressible ops (FSM, EWM, ML, LSH) — the
      driver then records a weaker rows-only check.
    - ``survey``: SURVEY.md §2 operator ids this query exercises.
    """

    name: str
    fn: QueryFn
    oracle: Optional[str]
    description: str = ""
    survey: tuple[str, ...] = field(default=())
