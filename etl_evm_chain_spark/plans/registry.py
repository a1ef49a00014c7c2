"""Aggregated query registry — the single source for __spark_entry__."""

from __future__ import annotations

from . import QuerySpec
from . import (analytics_ext, curation_q, evm, graph_q, ingest_q, joins_ext,
               ledger_q, llmdata, multimodal_q, quality_q, relational, skew_q,
               stateful, textstats_q, timeseries_q, warehouse)

_MODULES = [relational, timeseries_q, stateful, llmdata, evm, analytics_ext,
            warehouse, joins_ext, curation_q, multimodal_q, graph_q,
            textstats_q, skew_q, ingest_q, quality_q, ledger_q]

# The correctness driver samples the FIRST 50 registry entries.
# Round 9 rotation (changed plans outrank staleness; staleness =
# union of CORRECTNESS_r01-r08 last-green rounds):
# (a) q142 (the new landed IVF-PQ index lifecycle), q143 (its
# read-only serving probe), q144 (the landed IVF index's serving
# probe), q145 (two-stage shortlist+exact-rerank serving), and q146
# (tombstone deletes through the landed lifecycle) — first-ever
# hashes;
# (b) the 9 round-8 newcomers q133-q141 stay until twice-green (the
# standing discipline), and the PQ/ADC family carries ROUND-9 PLAN
# changes on top (shared _ivfpq_adc_topk scorer + probed-cell
# pre-filter + per-chunk broadcast lifecycle for q134/q141/q126;
# _pq_adc_emit self-filter for q73/q141; one shared trained-books
# pass inside q126 — all verified output-identical locally, but the
# plans moved so the re-hash is REQUIRED, not just hygiene);
# (c) q42/q125/q73/q41/q126 changed outputs in r8 (soft assignment /
# trained codebooks / family swap) and are once-green since — second
# green this round;
# (d) the five r4-stale queries the r8 verdict scheduled (q86, q97,
# q110, q111, q112) plus the r5 pair (q57, q83) — after this round
# no query's last driver check is older than r06;
# (e) the remaining 24 slots take the r6-stale set's heavier plans
# (EVM decode family, backtest/ML, sketch/expectation/mv, lifecycle
# q122, graph q74/q114). Deferred to r10 (r6-green, plans
# unchanged, replica re-verified every round): q27, q52, q59, q87,
# q102, q104, q105, q106, q113, q116, q117, q118, q119, q120, q124.
# Rotated OUT (twice-green r7+r8, plans unchanged): q130, q131,
# q132, q02, q04, q05, q13, q75, q78, q84, q85, q89, q90, q99,
# q100, q15, q47-q49, q55, q56, q58, q61, q67, q69, q71, q76, q77,
# q80-q82, q88, q91-q94.
_PRIORITY = [
    # ---- EXACTLY the driver's 50-slot window, all oracle-backed ----
    # new this round (first hash):
    "q142_compacted_ivfpq_topk", "q143_ivfpq_serving",
    "q144_ann_serving", "q145_ivfpq_reranked",
    "q146_ivfpq_deleted",
    # r8 newcomers until twice-green; q134/q141 also re-hash for the
    # r9 scorer/emit plan changes:
    "q133_stream_drift", "q134_ivfpq_topk", "q135_sketch_error_gate",
    "q136_stream_kmv", "q137_stream_cm", "q138_stream_matview",
    "q139_stream_expectations", "q140_stream_shards",
    "q141_compacted_pq_topk",
    # changed in r8 (once-green since) — second green; q73/q126 also
    # re-hash for the r9 emit/books-sharing plan changes:
    "q42_ivf_topk", "q125_compacted_ann_topk", "q126_ann_recall",
    "q73_pq_topk", "q41_dedup_resolve",
    # r4/r5-stale hygiene (the r8 verdict's ask #5):
    "q86_nation_trade", "q97_bucketed_knn", "q110_matrix_abi",
    "q111_jsonl_roundtrip", "q112_orc_roundtrip",
    "q57_stratified_sample", "q83_bigram_surprisal",
    # r6-stale set (24 of 39; the 15 lightest defer to r10):
    "q25_backtest_pct", "q26_backtest_zscore", "q29_ml_signals",
    "q44_decode_transfers", "q45_topic_routing",
    "q46_transfer_rollup", "q51_merge_upsert", "q53_approx_stats",
    "q54_asof_join", "q68_semantic_dedup", "q70_balance_ledger",
    "q72_knn_classify", "q74_pagerank", "q95_dynamic_abi",
    "q96_bucketed_near_dups", "q98_sender_recovery",
    "q101_dup_spans", "q103_bpe_tokens", "q107_tuple_abi",
    "q108_shard_manifest", "q109_tuple_array_abi",
    "q114_copurchase_triangles", "q115_kmv_distinct",
    "q122_compacted_exact_survivors",
]

assert len(_PRIORITY) == 50, "driver window must be exactly 50 entries"


def all_specs() -> list[QuerySpec]:
    specs: list[QuerySpec] = []
    seen: set[str] = set()
    for mod in _MODULES:
        for spec in mod.SPECS:
            if spec.name in seen:
                raise ValueError(f"duplicate query name: {spec.name}")
            seen.add(spec.name)
            specs.append(spec)
    rank = {name: i for i, name in enumerate(_PRIORITY)}
    specs.sort(key=lambda s: rank.get(s.name, len(rank)))  # stable: keeps module order otherwise
    return specs


def queries():
    return {s.name: s.fn for s in all_specs()}


def oracle_sql():
    return {s.name: s.oracle_text() for s in all_specs()
            if s.oracle is not None}
