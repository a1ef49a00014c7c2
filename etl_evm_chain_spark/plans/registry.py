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
# Round 10 rotation (changed plans outrank staleness — the r9
# verdict's ask #1a: every plan the r9/r10 optimization rounds
# touched gets a driver hash this round):
# (a) 30 round-10-touched plans: the gram-kernel _spread + narrow
# LSH band join (q34, q35, q50, q60, q63, q69, q79, q101, q102,
# q105, q121, q123, q127, q131), the q68 vectorized rewrite, the
# cosine_arrow swap (q38, q40, q42, q125, q126, q144, q145), the
# landed-index tiny-metadata reads (q121, q122, q125, q141-q146),
# the graph cadence revert (q129) + q74, and the q135 one-scan kmv
# block. q142-q146 are also only once-green (standing discipline).
# (b) 8 round-9-touched plans once-green in r9: q72, q96, q97,
# q114, q134 (kernel/graph/scorer changes) and q87, q89, q90
# (ranking-kit lazy pins — in r9's bench but NOT its 50-slot
# window; this closes the r9 verdict's trust gap #2).
# (c) the 12 remaining r6-stale deferrals the r9 registry note
# scheduled for r10: q27, q52, q59, q104, q106, q113, q116-q120,
# q124.
# Rotated OUT (twice-green r8+r9, result plans unchanged this
# round): q133, q136-q140, q41, q73, q25, q26, q29, q44-q46, q51,
# q53, q54, q70, q95, q98, q103, q107-q112, q115, q57, q83, q86.
_PRIORITY = [
    # ---- EXACTLY the driver's 50-slot window, all oracle-backed ----
    # (a) round-10-touched plans (+ the once-green q142-q146):
    "q142_compacted_ivfpq_topk", "q143_ivfpq_serving",
    "q144_ann_serving", "q145_ivfpq_reranked",
    "q146_ivfpq_deleted", "q141_compacted_pq_topk",
    "q125_compacted_ann_topk", "q126_ann_recall",
    "q121_compacted_lsh_pairs", "q122_compacted_exact_survivors",
    "q127_stream_dispositions", "q129_label_propagation",
    "q131_neardup_envelope", "q135_sketch_error_gate",
    "q68_semantic_dedup", "q74_pagerank",
    "q38_embedding_topk", "q40_ann_topk", "q42_ivf_topk",
    "q34_minhash_signatures", "q35_lsh_near_dups",
    "q50_winnow_fingerprints", "q60_ngram_jaccard",
    "q63_decontaminate", "q69_span_dedup", "q79_bloom_candidates",
    "q101_dup_spans", "q102_quality_filter",
    "q105_redact_contaminated", "q123_curation_funnel",
    # (b) r9-touched, once-green or never in the r9 window:
    "q87_value_deciles", "q89_salted_agg", "q90_skew_join",
    "q72_knn_classify", "q96_bucketed_near_dups", "q97_bucketed_knn",
    "q114_copurchase_triangles", "q134_ivfpq_topk",
    # (c) the r6-stale deferrals scheduled for r10:
    "q27_calendar_returns", "q52_profile_columns", "q59_pack_sequences",
    "q104_snapshot_diff", "q106_weighted_sample",
    "q113_scd2_history", "q116_zorder_cells",
    "q117_cm_heavy_hitters", "q118_expectations",
    "q119_incremental_mv", "q120_budget_mix", "q124_leakage_safe_split",
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
