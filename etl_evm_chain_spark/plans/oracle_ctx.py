"""Oracle-build context: which fixture directory literal-VALUES
oracles describe.

Most oracles are fixture-independent SQL strings — DuckDB evaluates
them over whatever views the checker registered, so one string serves
every scale factor. The ground-truth oracles (plans/groundtruth.py)
are different: they pin the DISCRETE DECISIONS of a non-SQL operator
(FSM entries/exits, learned BPE merges) as literal VALUES, and those
decisions are a function of the fixture. A zero-arg oracle callable
therefore needs to know which sf dir it is being built for.

The driver's correctness gate always runs at sf0.01 (the documented
contract), so that is the default; ``tools/check_oracle.py`` and the
parity tests set the context to whatever directory they compare
against before resolving oracle text.
"""

from __future__ import annotations

DRIVER_SF_DIR = "/root/testdata/sf0.01"

_sf_dir: str | None = None


def set_sf_dir(d: str | None) -> None:
    """Point literal-VALUES oracle builders at ``d`` (None → driver
    default)."""
    global _sf_dir
    _sf_dir = d


def sf_dir() -> str:
    return _sf_dir or DRIVER_SF_DIR


def connect():
    """DuckDB connection with the standard table views over the
    context's fixture dir — the engine ground-truth builders compute
    their INPUT series on (independent of Spark)."""
    import duckdb

    from ..catalog import TABLES

    con = duckdb.connect()
    d = sf_dir()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    return con
