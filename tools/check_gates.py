"""Unified quality-gate harness (VERDICT r7 ask #5): run every
approximation-quality gate query and its floor assertions in ONE
command. This is the mandatory pre-commit step for any geometry /
constant change in operators/similarity.py or operators/dedup.py —
round 7 proved why: a minhash retune hash-matched every parity check
yet inflated mid-similarity estimates, and only the envelope gate
caught it.

Gates and floors:
  q126_ann_recall      recall@5 per method on the gate's 5-query set
                       (lsh >= 0.80, ivf >= 0.80, pq >= 0.80,
                       ivfpq >= 0.80 — the round-8 Lloyd-trained
                       codebooks measure pq 0.84-0.92 and ivfpq
                       0.84-0.88 across sf0.001/0.01/0.1, up from
                       0.76/0.72 sampled; the stricter 20-query
                       floors live in tests/test_llmdata.py), and
                       every method's MRR > 0
  q145 two-stage       recall@5 >= 0.80 for the 5k-shortlist +
                       exact-rerank serving path, asserted >= the
                       unreranked landed row (refine can only fix
                       ADC errors, never introduce them)
  q142 landed ivf-pq   recall@5 >= 0.75 on the same gate set, probed
                       off a scratch codes+cells LEDGER built through
                       update_ivfpq_index (same trained books + probe
                       math as ivfpq; the one-hit-lower floor absorbs
                       the private "ipqx:" quantizer namespace's
                       tiny-fixture salt variance — see IPQ_IDX_FLOOR)
  q131_neardup_envelope false_drop == 0 and false_keep == 0 (the
                       shipped universal family realizes zero
                       confusion on the fixture corpora; the counter
                       identities are re-asserted too)
  q132_quality_drift   baseline epoch reports tv_num == 0, every
                       epoch present with docs
  q135_sketch_error_gate every row within its estimator's guarantee
                       (KMV and x16-sampled-distinct |err| <=
                       3sigma, count-min 0 <= over*width <= 3N), and
                       the count-min side never under-counts

Usage: python tools/check_gates.py [sf_dir ...]
       (default: sf0.001 and sf0.01; pass sf0.1 too before committing
       a retune — the r7 pathology was INVISIBLE at sf0.01)
Exits non-zero on the first floor violation.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RECALL_FLOORS = {"lsh": 0.80, "ivf": 0.80, "pq": 0.80, "ivfpq": 0.80}
# The landed index freezes its coarse quantizer in its own "ipqx:"
# hash namespace, so its cell layout is a DIFFERENT deterministic
# draw than ivfpq_topk's "ipq:" — on the 835-vector sf0.001 fixture
# that draw costs two gate hits (measured: 0.76 / 0.88 / 0.80 by sf
# vs the in-memory composition's 0.84 / 0.84 / 0.84; both use the
# same trained books and probe math, and at real scale both
# converge). The floor is therefore one gate-hit under ivfpq's, NOT
# because the landed path is allowed to be worse structurally but
# because the tiny-fixture salt variance is ±1-2 hits of 25.
IPQ_IDX_FLOOR = 0.75
# Two-stage serving (q145): exact rerank of the 5k ADC shortlist
# removes quantization error on the SHORTLIST, so recall rises
# toward the cell-pruning ceiling (a true neighbor outside the
# probed cells, or outside the ADC top-25, stays unrecoverable).
# Measured 0.84 / 0.92 / 0.92 by sf — always ABOVE the unreranked
# landed row (0.76 / 0.88 / 0.80), which the gate asserts
# structurally. Floor 0.80: a nontrivial lift over IPQ_IDX_FLOOR
# that still absorbs the tiny-fixture draw.
RERANK_FLOOR = 0.80


def check(spark, sf_dir: str) -> list[str]:
    from etl_evm_chain_spark.plans.curation_q import q_neardup_envelope
    from etl_evm_chain_spark.plans.llmdata import q_ann_recall
    from etl_evm_chain_spark.plans.quality_q import (DRIFT_EPOCHS,
                                                     q_quality_drift,
                                                     q_sketch_error_gate)

    bad: list[str] = []

    rec = {r["method"]: r for r in q_ann_recall(spark, sf_dir).collect()}
    for m, floor in RECALL_FLOORS.items():
        r = rec.get(m)
        if r is None:
            bad.append(f"q126: method {m} missing from the gate")
            continue
        print(f"  q126 {m}: recall {r['recall']:.2f} "
              f"({r['hits']}/{r['n_exact']}), mrr_u6 {r['sum_rr_u6']}")
        if r["recall"] < floor:
            bad.append(f"q126: {m} recall {r['recall']:.2f} < {floor}")
        if r["sum_rr_u6"] <= 0:
            bad.append(f"q126: {m} retrieved nothing relevant (MRR 0)")

    # landed IVF-PQ index path (q142, round-9): the same recall floor,
    # measured off a scratch codes+cells LEDGER built through
    # update_ivfpq_index — the landed layout (frozen "ipqx:" coarse
    # quantizer, frozen trained books, cell-partitioned codes) must
    # retrieve as well as the in-memory composition it mirrors. The
    # gate queries are re-ingested as a second increment (the ledger
    # dedups the replica rows), so the probe runs exactly the
    # production read path: landed state only.
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from etl_evm_chain_spark.catalog import load_table
    from etl_evm_chain_spark.operators import similarity as sim

    emb = load_table(spark, sf_dir, "embeddings")
    gate_q = emb.filter(F.col("vec_id") < 5)
    exact = {(r["qid"], r["cid"])
             for r in sim.brute_force_topk(emb, gate_q, k=5).collect()}
    root = tempfile.mkdtemp(prefix="gate_ipqidx_")
    try:
        sim.update_ivfpq_index(spark, emb, root, k=5, batch_id="g1")
        got = {(r["qid"], r["cid"])
               for r in sim.update_ivfpq_index(spark, gate_q, root,
                                               k=5,
                                               batch_id="g2").collect()}
        # two-stage serving (q145): 5k ADC shortlist off the same
        # landed index, exact-cosine reranked — must buy back the
        # quantization loss up to the CELL-pruning ceiling (the IVF
        # row's own recall), hence the higher floor
        short = sim.probe_ivfpq_index(spark, gate_q, root, k=25)
        got_rr = {(r["qid"], r["cid"])
                  for r in sim.rerank_exact(gate_q, emb, short,
                                            k=5).collect()}
    finally:
        shutil.rmtree(root, ignore_errors=True)
    hits = len(got & exact)
    rec_idx = hits / max(len(exact), 1)
    print(f"  q142 ipq_idx: recall {rec_idx:.2f} ({hits}/{len(exact)})")
    if rec_idx < IPQ_IDX_FLOOR:
        bad.append(f"q142: landed ivfpq recall {rec_idx:.2f} "
                   f"< {IPQ_IDX_FLOOR}")
    hits_rr = len(got_rr & exact)
    rec_rr = hits_rr / max(len(exact), 1)
    print(f"  q145 reranked: recall {rec_rr:.2f} "
          f"({hits_rr}/{len(exact)})")
    if rec_rr < RERANK_FLOOR:
        bad.append(f"q145: reranked recall {rec_rr:.2f} "
                   f"< {RERANK_FLOOR}")
    if rec_rr + 1e-9 < rec_idx:
        bad.append(f"q145: rerank REDUCED recall ({rec_rr:.2f} < "
                   f"{rec_idx:.2f}) — the exact refine can only fix "
                   "ADC errors, never introduce them at equal k")

    e = q_neardup_envelope(spark, sf_dir).collect()[0]
    print(f"  q131 envelope: exact {e['n_exact_dup']} est "
          f"{e['n_est_dup']} both {e['n_both']} "
          f"fd {e['false_drop']} fk {e['false_keep']}")
    if e["false_drop"] != 0 or e["false_keep"] != 0:
        bad.append(f"q131: confusion nonzero (false_drop "
                   f"{e['false_drop']}, false_keep {e['false_keep']})")
    if e["n_est_dup"] != e["n_both"] + e["false_drop"] or \
            e["n_exact_dup"] != e["n_both"] + e["false_keep"]:
        bad.append("q131: counter identities violated")
    if e["n_exact_dup"] == 0:
        bad.append("q131: zero exact dups — the gate exercised nothing")

    sk = q_sketch_error_gate(spark, sf_dir).collect()
    worst = {m: max((r["err_ppm"] for r in sk if r["method"] == m),
                    default=None) for m in ("kmv", "cm", "samp")}
    print(f"  q135 sketch: {len(sk)} rows, worst err_ppm "
          f"kmv={worst['kmv']} cm={worst['cm']} samp={worst['samp']}")
    if any(worst[m] is None for m in worst):
        bad.append("q135: a sketch method is missing from the gate")
    for r in sk:
        if r["within"] != 1:
            bad.append(f"q135: {r['method']} {r['grp']} outside its "
                       f"guarantee (exact {r['exact_n']} est "
                       f"{r['est_n']} err_ppm {r['err_ppm']})")
        if r["method"] == "cm" and r["est_n"] < r["exact_n"]:
            bad.append(f"q135: count-min UNDER-counts {r['grp']} "
                       f"({r['est_n']} < {r['exact_n']})")

    drift = {r["epoch"]: r for r in q_quality_drift(spark, sf_dir).collect()}
    print("  q132 drift: " + " ".join(
        f"e{k}={r['tv_num_vs_e0']}/{r['n_docs']}"
        for k, r in sorted(drift.items())))
    if set(drift) != set(range(DRIFT_EPOCHS)):
        bad.append(f"q132: epochs {sorted(drift)} != 0..{DRIFT_EPOCHS - 1}")
    elif drift[0]["tv_num_vs_e0"] != 0:
        bad.append("q132: baseline epoch drifts from itself")
    elif any(r["n_docs"] <= 0 for r in drift.values()):
        bad.append("q132: an epoch reports zero docs")

    return bad


def main() -> int:
    from etl_evm_chain_spark.session import get_spark

    dirs = sys.argv[1:] or ["/root/testdata/sf0.001",
                            "/root/testdata/sf0.01"]
    spark = get_spark("check-gates")
    failures: list[str] = []
    for d in dirs:
        print(f"gates @ {d}:")
        failures += [f"{d}: {b}" for b in check(spark, d)]
    if failures:
        print("\n".join("FAIL " + f for f in failures))
        return 1
    print("all gates green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
