"""Aggregated query registry — the single source for __spark_entry__."""

from __future__ import annotations

from . import QuerySpec
from . import (analytics_ext, curation_q, evm, graph_q, joins_ext, llmdata,
               multimodal_q, relational, skew_q, stateful, textstats_q,
               timeseries_q, warehouse)

_MODULES = [relational, timeseries_q, stateful, llmdata, evm, analytics_ext,
            warehouse, joins_ext, curation_q, multimodal_q, graph_q,
            textstats_q, skew_q]


def all_specs() -> list[QuerySpec]:
    specs: list[QuerySpec] = []
    seen: set[str] = set()
    for mod in _MODULES:
        for spec in mod.SPECS:
            if spec.name in seen:
                raise ValueError(f"duplicate query name: {spec.name}")
            seen.add(spec.name)
            specs.append(spec)
    return specs


def queries():
    return {s.name: s.fn for s in all_specs()}


def oracle_sql():
    return {s.name: s.oracle for s in all_specs() if s.oracle is not None}
