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
# Round 6 keeps the round-5 lifecycle/funnel queries in for their
# second green window (q121-q125, verdict ask #6), front-loads the
# four NEW queries (q126 recall gate, q127 streaming-funnel
# disposition lake, q128 Lloyd k-means, q129 label propagation) and
# every query whose plan
# changed this round (q27 overflow-bucket predicate; q29/q102 via
# exact_auc's decimal products; q121/q122/q125 fast-forward).
# Rotated OUT to make room (driver-green r01-r05, plans unchanged):
# q69, q83, q71, q57.
_PRIORITY = [
    # ---- EXACTLY the driver's 50-slot window, all oracle-backed ----
    # newly pinned this round (first-ever hash rows):
    "q25_backtest_pct", "q26_backtest_zscore", "q27_calendar_returns",
    "q29_ml_signals", "q73_pq_topk", "q102_quality_filter",
    "q103_bpe_tokens",
    # plans changed this round (equi-depth edges, kit pin/probe):
    "q53_approx_stats", "q87_value_deciles", "q59_pack_sequences",
    "q115_kmv_distinct", "q120_budget_mix",
    # r4-new surface, keep under the driver's eye:
    "q113_scd2_history", "q114_copurchase_triangles",
    "q116_zorder_cells", "q117_cm_heavy_hitters",
    "q118_expectations", "q119_incremental_mv",
    "q40_ann_topk", "q96_bucketed_near_dups",
    "q72_knn_classify", "q74_pagerank", "q107_tuple_abi",
    "q109_tuple_array_abi", "q44_decode_transfers", "q46_transfer_rollup",
    "q70_balance_ledger", "q95_dynamic_abi",
    # driver-green exactly once (r3/r4) — keep under the driver's eye:
    "q98_sender_recovery", "q42_ivf_topk", "q101_dup_spans",
    "q104_snapshot_diff", "q105_redact_contaminated",
    "q106_weighted_sample", "q108_shard_manifest",
    # proven sentinels fill the remaining slots (driver-green in
    # CORRECTNESS_r01-r04), diverse across operator families:
    "q68_semantic_dedup",
    "q45_topic_routing",
    # new round-6 queries (first-ever driver rows; replace the
    # q69/q83/q71/q57 sentinels, driver-green in r01-r05):
    "q126_ann_recall", "q127_stream_dispositions",
    "q128_lloyd_kmeans", "q129_label_propagation",
    "q41_dedup_resolve",
    "q51_merge_upsert",
    "q52_profile_columns", "q54_asof_join",
    # new round-5 queries (first-ever driver rows; replace the
    # q80/q81/q97/q86/q56 sentinels, all driver-green in r01-r04):
    "q121_compacted_lsh_pairs", "q122_compacted_exact_survivors",
    "q123_curation_funnel", "q124_leakage_safe_split",
    "q125_compacted_ann_topk",
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
