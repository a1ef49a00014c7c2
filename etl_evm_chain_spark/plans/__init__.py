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
    - ``fn``: (spark, sf_dir) -> DataFrame. Usually a pure plan
      builder; the ledger-lifecycle queries (plans/ledger_q) are the
      documented exception — they execute index writes into a
      process-scoped /tmp scratch root and return an eagerly-pinned
      result, so plan-only consumers (tools/explain_audit) pay the
      lifecycle's runtime when they call fn on those entries.
    - ``oracle``: equivalent DuckDB SQL over the pre-registered views —
      a string, or a zero-arg callable returning the string for oracles
      that are expensive to BUILD (e.g. q98 derives 64 secp256k1
      addresses; computing that at import time taxed every process
      that merely imported the registry). None for non-SQL-expressible
      ops (FSM, EWM, ML) — the driver then records a weaker rows-only
      check.
    - ``survey``: SURVEY.md §2 operator ids this query exercises.
    """

    name: str
    fn: QueryFn
    oracle: Optional[str | Callable[[], str]]
    description: str = ""
    survey: tuple[str, ...] = field(default=())

    def oracle_text(self) -> Optional[str]:
        return self.oracle() if callable(self.oracle) else self.oracle
