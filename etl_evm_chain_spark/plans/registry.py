"""Aggregated query registry — the single source for __spark_entry__."""

from __future__ import annotations

from . import QuerySpec
from . import (analytics_ext, curation_q, evm, graph_q, ingest_q, joins_ext,
               llmdata, multimodal_q, quality_q, relational, skew_q, stateful,
               textstats_q, timeseries_q, warehouse)

_MODULES = [relational, timeseries_q, stateful, llmdata, evm, analytics_ext,
            warehouse, joins_ext, curation_q, multimodal_q, graph_q,
            textstats_q, skew_q, ingest_q, quality_q]

# The correctness driver samples the FIRST 50 registry entries. Round 4
# (VERDICT r3 "Next round" #5) front-loads every query whose PLAN or
# ORACLE changed since its last driver-green row: the ranking-kit
# rework (q53/q87/q15/q58/q59), the LSH plane-generation change
# (q40/q96), the guard-probe change (q72), the native wide-int decode
# (q44/q46/q70/q95/q107/q109), the new nested-array/signed-array query
# (q110), the new ingest round-trips (q111/q112), the pagerank
# partitioning change (q74), and q76 (changed in commit 6bb002c after
# its last driver row). Rows-only-by-design queries (q25-q29, q73,
# q102, q103) stay OUTSIDE the window so every window row can be
# value-hash green. Rotated OUT this round (all driver-green in
# r01-r03): q49/q91 (for q110/q76), q92/q93 (for q111/q112), q55
# (for q35, whose jaccard output switched to floor-truncation),
# q47/q48/q88/q94 (for the new q113 SCD2 / q114 triangles /
# q115 KMV / q116 Z-order), q67 (for the new q117 count-min),
# q77/q82 (for the new q118 expectations / q119 incremental matview),
# and q61 (for the new q120 budget mix).
_PRIORITY = [
    # ---- EXACTLY the driver's 50-slot window, all oracle-backed ----
    # changed since their last driver-green row (round-4 work):
    "q53_approx_stats", "q87_value_deciles", "q15_time_split",
    "q58_topk_quality", "q59_pack_sequences", "q110_matrix_abi",
    "q111_jsonl_roundtrip", "q112_orc_roundtrip",
    "q76_zipf_slope", "q35_lsh_near_dups",
    "q113_scd2_history", "q114_copurchase_triangles", "q115_kmv_distinct",
    "q116_zorder_cells", "q117_cm_heavy_hitters",
    "q118_expectations", "q119_incremental_mv", "q120_budget_mix",
    "q40_ann_topk", "q96_bucketed_near_dups",
    "q72_knn_classify", "q74_pagerank", "q107_tuple_abi",
    "q109_tuple_array_abi", "q44_decode_transfers", "q46_transfer_rollup",
    "q70_balance_ledger", "q95_dynamic_abi",
    # driver-green exactly once (r3) — keep under the driver's eye:
    "q98_sender_recovery", "q42_ivf_topk", "q101_dup_spans",
    "q104_snapshot_diff", "q105_redact_contaminated",
    "q106_weighted_sample", "q108_shard_manifest",
    # proven sentinels fill the remaining slots (driver-green in
    # CORRECTNESS_r01-r03), diverse across operator families:
    "q68_semantic_dedup", "q69_span_dedup", "q83_bigram_surprisal",
    "q71_unigram_surprisal", "q45_topic_routing",
    "q41_dedup_resolve",
    "q51_merge_upsert",
    "q52_profile_columns", "q54_asof_join",
    "q86_nation_trade", "q56_hash_split", "q57_stratified_sample",
    "q80_chunk_documents", "q81_dataset_card",
    "q97_bucketed_knn",
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
