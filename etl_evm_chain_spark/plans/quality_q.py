"""Data-quality gate + incremental materialized-aggregate queries.

q118 — the declarative expectations suite (operators/expectations.py)
run as an ingest gate over ``orders``: six rules (not-null, range,
domain, a deliberately-tight range rule that FAILS, tuple uniqueness,
referential integrity into ``customer``) compiled into one fact scan
plus one broadcast anti-join scan. The report is the long-form
(rule, violations, total, passed) relation a pipeline would land next
to every ingested batch.

q119 — incremental materialized-view maintenance (operators/
matview.py): ``orders`` arrives as three disjoint epochs (date-cut
splits, the arrival order of a real feed); each epoch folds into the
algebraic state ``(n, sum, sumsq, min, max)`` per (status, year) group, the
three states merge pairwise (monoid law — tested exhaustively in
tests/test_quality.py), and the finalize projection derives avg. The
DuckDB oracle computes the same aggregate in ONE shot over the whole
table — the hash match proves incremental == one-shot end-to-end, not
just in unit tests.

Reference parity: the reference's bots recompute every aggregate from
full CSV reloads per run (/root/reference/bots/*.py); these queries
are the maintained-state replacements that survive 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.expectations import (expect, expect_foreign_key,
                                      expect_in_set, expect_not_null,
                                      expect_unique, run_expectations)
from ..operators.matview import aggregate_state, finalize_state, merge_states
from . import QuerySpec


# ---------------------------------------------------------------------------
# Q118: expectations suite as an ingest gate.
# ---------------------------------------------------------------------------

def q_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    report = run_expectations(orders, [
        expect_not_null("orderdate_not_null", "o_orderdate"),
        expect("totalprice_positive", F.col("o_totalprice") > 0),
        # deliberately tight bound — violations>0 proves the gate trips
        expect("totalprice_under_100k", F.col("o_totalprice") < 100_000),
        expect_in_set("status_domain", "o_orderstatus", ["O", "F", "P"]),
        expect_unique("orderkey_unique", "o_orderkey"),
        expect_foreign_key("custkey_fk_customer", "o_custkey",
                           customer, "c_custkey"),
    ])
    return (report.withColumnRenamed("check", "check_name")
                  .orderBy("check_name"))


ORACLE_EXPECTATIONS = """
WITH scan AS (
  SELECT
    count(*) AS total,
    count(*) FILTER (WHERE NOT coalesce(o_orderdate IS NOT NULL, FALSE))
        AS v_orderdate_not_null,
    count(*) FILTER (WHERE NOT coalesce(o_totalprice > 0, FALSE))
        AS v_totalprice_positive,
    count(*) FILTER (WHERE NOT coalesce(o_totalprice < 100000, FALSE))
        AS v_totalprice_under_100k,
    count(*) FILTER (WHERE NOT coalesce(o_orderstatus IN ('O','F','P'),
                                        FALSE)) AS v_status_domain,
    count(*) - count(DISTINCT o_orderkey) AS v_orderkey_unique
  FROM orders
), fk AS (
  SELECT count(*) AS total,
         count(*) FILTER (WHERE c.c_custkey IS NULL) AS violations
  FROM orders o
  LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
    ON o.o_custkey = c.c_custkey
), long AS (
  SELECT 'orderdate_not_null' AS check_name,
         CAST(v_orderdate_not_null AS BIGINT) AS violations,
         CAST(total AS BIGINT) AS total FROM scan
  UNION ALL
  SELECT 'totalprice_positive', CAST(v_totalprice_positive AS BIGINT),
         CAST(total AS BIGINT) FROM scan
  UNION ALL
  SELECT 'totalprice_under_100k', CAST(v_totalprice_under_100k AS BIGINT),
         CAST(total AS BIGINT) FROM scan
  UNION ALL
  SELECT 'status_domain', CAST(v_status_domain AS BIGINT),
         CAST(total AS BIGINT) FROM scan
  UNION ALL
  SELECT 'orderkey_unique', CAST(v_orderkey_unique AS BIGINT),
         CAST(total AS BIGINT) FROM scan
  UNION ALL
  SELECT 'custkey_fk_customer', CAST(violations AS BIGINT),
         CAST(total AS BIGINT) FROM fk
)
SELECT check_name, violations, total,
       CAST(violations = 0 AS INT) AS passed
FROM long
ORDER BY check_name
"""


# ---------------------------------------------------------------------------
# Q119: incremental materialized aggregate == one-shot oracle.
# ---------------------------------------------------------------------------

_EPOCH_CUTS = ("1997-01-01", "1999-01-01")


def _prepared_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderstatus").alias("status"),
        F.year("o_orderdate").cast("long").alias("yr"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderdate"),
    )


def q_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _prepared_orders(spark, sf_dir)
    c1 = F.lit(_EPOCH_CUTS[0]).cast("timestamp")
    c2 = F.lit(_EPOCH_CUTS[1]).cast("timestamp")
    epochs = [
        base.filter(F.col("o_orderdate") < c1),
        base.filter((F.col("o_orderdate") >= c1)
                    & (F.col("o_orderdate") < c2)),
        base.filter(F.col("o_orderdate") >= c2),
    ]
    keys = ["status", "yr"]
    state = aggregate_state(epochs[0].drop("o_orderdate"), keys, "price")
    for ep in epochs[1:]:
        state = merge_states(
            state, aggregate_state(ep.drop("o_orderdate"), keys, "price"),
            keys)
    return (finalize_state(state)
            .select("status", "yr",
                    F.col("n").alias("n_orders"),
                    F.col("sum").cast("double").alias("sum_price"),
                    F.col("min").alias("min_price"),
                    F.col("max").alias("max_price"),
                    F.col("avg").alias("avg_price"),
                    F.floor(F.col("std") * 100).cast("double")
                     .alias("std_cents"))
            .orderBy("status", "yr"))


# std mirrors finalize_state's expression ((sumsq - sum*sum/n)/n over
# decimal-exact inputs, clamped, sqrt) — engine variance aggregates
# are float-accumulated/fold-order-dependent, so neither side uses
# them. The hashed column is floor(std*100) (cents, the repo's
# floor-truncation convention): DuckDB's int128 decimal->double cast
# can be 1 ulp off Spark's correctly-rounded conversion on scale-12
# sumsq values, and the variance cancellation amplifies that to
# ~1e-5 absolute — sqrt compresses it back to ~3e-11, far inside the
# floor grid. Raw var/std stay finalize-level measures (exact-state
# parity is pytest-proven at the decimal layer).
ORACLE_INCREMENTAL_MV = """
WITH s AS (
  SELECT o_orderstatus AS status,
         CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(count(o_totalprice) AS BIGINT) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
             AS sum_price,
         -- (19,6): hugeint multiply (int64 at (18,6) overflows);
         -- result (38,12) is exact, same value as Spark's (37,12)
         CAST(sum(CAST(o_totalprice AS DECIMAL(19,6))
                  * CAST(o_totalprice AS DECIMAL(19,6))) AS DOUBLE)
             AS sumsq_price,
         min(o_totalprice) AS min_price,
         max(o_totalprice) AS max_price
  FROM orders
  GROUP BY o_orderstatus, year(o_orderdate)
)
SELECT status, yr, n_orders, sum_price, min_price, max_price,
       sum_price / n_orders AS avg_price,
       CAST(floor(sqrt(greatest(
           (sumsq_price - sum_price * sum_price / n_orders) / n_orders,
           0.0)) * 100) AS DOUBLE) AS std_cents
FROM s
ORDER BY status, yr
"""


# ---------------------------------------------------------------------------
# Q132: distribution-drift monitor — fixed-bin quality histograms per
# ingest epoch + EXACT integer total-variation drift vs the baseline
# epoch. The standard "did this crawl batch's quality distribution
# shift?" gate a training-data pipeline runs beside the expectations
# suite: the histogram is a count monoid (lands under the epoch
# ledger, streaming twin = stream_matview keyed (epoch, bin) —
# equivalence-tested), and the drift statistic is the rational
# TV numerator sum|n_i*M - m_i*N| — pure integers, no engine wobble,
# so the whole monitor sits under the driver's hash like everything
# else. The reference has no analog (its bots recompute aggregates
# blindly per run); this extends the q118/q119 quality tier.
# ---------------------------------------------------------------------------

DRIFT_BINS = 16
DRIFT_EPOCHS = 3


def q_quality_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import quality_score
    from ..operators.expectations import histogram_counts, tv_drift

    docs = load_table(spark, sf_dir, "documents") \
        .filter(F.col("text").isNotNull())
    scored = docs.select(
        F.pmod(F.col("doc_id"), F.lit(DRIFT_EPOCHS)).cast("int")
        .alias("epoch"),
        quality_score("text").alias("q"))
    hist = histogram_counts(scored, "q", n_bins=DRIFT_BINS,
                            keys=("epoch",))
    out = tv_drift(hist, key="epoch", baseline=0)
    # The OUTPUT cast to long is bounded, and the bound is documented
    # (ADVICE r7): tv_num ≤ 2·N·M, so the cast is exact while
    # epoch_rows × baseline_rows < 2^62 — i.e. both slices under ~2.1
    # billion rows, far above any single ingest epoch this monitor
    # compares (an epoch is one crawl batch, not the corpus). The
    # decimal(38,0) cannot ride the output itself: DuckDB's pandas
    # bridge converts DECIMAL(38,0) to lossy float64 (verified — a
    # 23-digit value came back 1.23e+22), so a decimal column is NOT
    # hash-stable across the harness. Consumers beyond the bound read
    # tv_drift's exact decimal directly; under ANSI the cast fails
    # loudly rather than wrapping, so the bound is enforced, not
    # assumed.
    return (out.select(F.col("epoch"),
                       F.col("n_rows").cast("long").alias("n_docs"),
                       F.col("tv_num").cast("long").alias("tv_num_vs_e0"))
            .orderBy("epoch"))


def _oracle_quality_drift() -> str:
    from .curation_q import _SQL_QUALITY

    qual = _SQL_QUALITY.strip()
    return f"""
WITH scored AS (
  SELECT CAST(doc_id % {DRIFT_EPOCHS} AS INT) AS epoch, {qual} AS q
  FROM documents WHERE text IS NOT NULL
),
h AS (
  SELECT epoch,
         least(CAST(floor(least(greatest(q, 0.0), 1.0)
                          * {DRIFT_BINS}) AS INT),
               {DRIFT_BINS - 1}) AS bin,
         count(*) AS n
  FROM scored WHERE q IS NOT NULL AND NOT isnan(q)
  GROUP BY 1, 2
),
spine AS (
  SELECT e.epoch, b.bin
  FROM (SELECT DISTINCT epoch FROM h) e
  CROSS JOIN (SELECT DISTINCT bin FROM h) b
),
full_h AS (
  SELECT s.epoch, s.bin, coalesce(h.n, 0) AS n
  FROM spine s LEFT JOIN h USING (epoch, bin)
),
tot AS (SELECT epoch, sum(n) AS nn FROM full_h GROUP BY epoch),
base AS (SELECT bin, n AS m FROM full_h WHERE epoch = 0),
basen AS (SELECT nn AS mm FROM tot WHERE epoch = 0)
SELECT f.epoch, CAST(max(t.nn) AS BIGINT) AS n_docs,
       CAST(sum(abs(f.n * bn.mm - b.m * t.nn)) AS BIGINT)
         AS tv_num_vs_e0
FROM full_h f
JOIN base b USING (bin)
JOIN tot t USING (epoch)
CROSS JOIN basen bn
GROUP BY f.epoch
ORDER BY f.epoch
"""


# ---------------------------------------------------------------------------
# Q135: sketch-accuracy gate — the q126/q131 discipline applied to the
# sketch tier. q115 (KMV distinct) and q117 (count-min heavy hitters)
# prove their estimators are ENGINE-PORTABLE (the estimate itself
# hash-matches DuckDB), but nothing gated how CLOSE the estimates run
# to the exact statistics — a retuned KMV_K or CM_WIDTH could degrade
# accuracy while every parity check stayed green (exactly how the
# round-7 minhash retune slipped past hash parity until q131 caught
# it). This query emits the error *as driver-hashed integers*:
#
#   method  grp            exact_n  est_n  err_ppm  within
#   kmv     users:<type>   ...      ...    |e|/x    err²·(k−2) ≤ σ²·9x²
#   kmv     events:<type>
#   cm      tok:<token>    ...      ...    over/N   est≥exact ∧ over·w ≤ 3N
#   samp    parts:<flag>   ...      ...    |e|/x    err² ≤ 9·15·x
#
# Bounds are the estimators' own guarantees: KMV's relative stderr is
# 1/sqrt(k−2) [Bar-Yossef et al. 2002] — the gate pins 3σ, integer-
# exactly as err²·(k−2) ≤ 9·exact² (no sqrt enters either engine);
# count-min NEVER under-counts and over-counts by ≤ ~e·N/width w.h.p.
# [Cormode & Muthukrishnan 2005] — pinned as over·width ≤ 3·N with
# N read from the sketch's own depth-0 counters (the sketch relation
# is the census; no third pass over the corpus); q53's ×16
# sampled-distinct estimator is 16·X with X ~ Binomial(D, 1/16)
# exactly (each distinct key is sampled by its own hash), so
# var = 15·D and the 3σ gate is err² ≤ 135·exact. All arithmetic is
# bigint (err_ppm via integer division — Spark `div` and DuckDB `//`
# truncate identically for the non-negative operands here), so the
# statistic can never wobble across engines, and
# tests/test_quality.py pins within=1 as the floor a sketch-geometry
# retune must re-prove (tools/check_gates.py runs it at every sf).
# The constants below feed BOTH the plan and the oracle, so a tune
# can't leave the SQL stale.
# ---------------------------------------------------------------------------

SKETCH_GATE_TOPK = 10  # CM probes: the top-k exact-frequency tokens
_KMV_SIGMAS = 3        # KMV gate: |est − exact| ≤ 3σ·exact
_CM_BOUND_NUM = 3      # CM gate: (est − exact)·width ≤ 3·N_total
# q53's sampling modulus — imported from its single definition so a
# q53 retune can never leave this gate bounding an estimator that no
# longer ships (the constants-feed-both-plan-and-oracle rule)
from .warehouse import APPROX_SAMPLE_MOD as _SAMP_MOD  # noqa: E402

# 3σ bound for the ×MOD sampled-distinct estimator: var(MOD·X) =
# MOD²·D·p·(1−p) = (MOD−1)·D with p = 1/MOD ⇒ err² ≤ 9·(MOD−1)·D
_SAMP_BOUND = _KMV_SIGMAS * _KMV_SIGMAS * (_SAMP_MOD - 1)


def q_sketch_error_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens
    from ..operators.sketches import (CM_WIDTH, KMV_K, cm_estimate,
                                      cm_sketch, kmv_estimate_expr,
                                      kmv_sketch_many)

    # --- KMV rows: distinct-count estimate vs exact per event_type.
    # Same geometry and salts as q115, so this gate guards exactly the
    # estimator that query ships. Round-10 (guide §6 / the r9
    # verdict's one-logical-scan ask): exact counts come from the
    # sketch pass's own deduped relation (exact_counts=True) instead
    # of a second events scan + expand-distinct + join — same values
    # by construction (count of distinct non-NULL raw keys).
    ev = load_table(spark, sf_dir, "events")
    kj = kmv_sketch_many(ev, {"users": "user_id", "events": "event_id"},
                         group_cols=["event_type"],
                         salts={"users": "kmvu", "events": "kmve"},
                         exact_counts=True)

    def kmv_rows(kind: str) -> DataFrame:
        x = F.col(f"x_{kind}").cast("long")
        est = kmv_estimate_expr(F.col(kind))
        return (kj.select(
            F.lit("kmv").alias("method"),
            F.concat(F.lit(kind + ":"), F.col("event_type")).alias("grp"),
            x.alias("exact_n"), est.alias("est_n"))
            .withColumn("_err", F.abs(F.col("est_n") - F.col("exact_n")))
            .select(
                "method", "grp", "exact_n", "est_n",
                # greatest(…,1): an all-NULL key column gives exact=0
                # with an empty sketch (err=0) — 0 div 0 would throw
                # under ANSI instead of reading as zero error
                F.expr("(_err * 1000000) div greatest(exact_n, 1)")
                .alias("err_ppm"),
                (F.col("_err") * F.col("_err") * F.lit(KMV_K - 2)
                 <= F.lit(_KMV_SIGMAS * _KMV_SIGMAS)
                 * F.col("exact_n") * F.col("exact_n"))
                .cast("int").alias("within")))

    # --- CM rows: estimated vs exact counts for the true top-k
    # tokens (q117's geometry). N_total comes from the sketch's own
    # depth-0 slice — every input unit lands in exactly one cell per
    # depth row, so sum(cnt | depth=0) IS the census.
    docs = load_table(spark, sf_dir, "documents")
    tc = (docs.select(F.explode(tokens("text")).alias("tok"))
          .groupBy("tok").agg(F.count(F.lit(1)).alias("true_cnt")))
    csk = cm_sketch(tc, "tok", weight_col="true_cnt")
    top = tc.orderBy(F.desc("true_cnt"), "tok").limit(SKETCH_GATE_TOPK)
    est = cm_estimate(csk, top, "tok")
    n_tot = (csk.filter(F.col("depth") == 0)
             .agg(F.sum("cnt").cast("long").alias("_n_tot")))
    cm = (top.join(est, "tok").crossJoin(F.broadcast(n_tot))
          .select(
              F.lit("cm").alias("method"),
              F.concat(F.lit("tok:"), F.col("tok")).alias("grp"),
              F.col("true_cnt").cast("long").alias("exact_n"),
              F.col("est_cnt").alias("est_n"),
              F.col("_n_tot"))
          .withColumn("_over", F.col("est_n") - F.col("exact_n"))
          .select(
              "method", "grp", "exact_n", "est_n",
              F.expr("(_over * 1000000) div greatest(_n_tot, 1)")
              .alias("err_ppm"),
              ((F.col("_over") >= 0)
               & (F.col("_over") * F.lit(CM_WIDTH)
                  <= F.lit(_CM_BOUND_NUM) * F.col("_n_tot")))
              .cast("int").alias("within")))

    # --- samp rows: q53's ×16 sampled-distinct estimator vs exact
    # distinct parts per returnflag (same salt and modulus as the
    # shipped query, so the gate guards exactly that estimator).
    from ..functions.text import hash15

    li = load_table(spark, sf_dir, "lineitem")
    pk_h = hash15(F.concat(F.lit("kmv:"),
                           F.col("l_partkey").cast("string")))
    samp = (li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").cast("long").alias("exact_n"),
        (F.countDistinct(F.when(pk_h % _SAMP_MOD == 0,
                                F.col("l_partkey"))) * _SAMP_MOD)
        .cast("long").alias("est_n"))
        .withColumn("_err", F.abs(F.col("est_n") - F.col("exact_n")))
        .select(
            F.lit("samp").alias("method"),
            F.concat(F.lit("parts:"), F.col("l_returnflag")).alias("grp"),
            "exact_n", "est_n",
            F.expr("(_err * 1000000) div greatest(exact_n, 1)")
            .alias("err_ppm"),
            (F.col("_err") * F.col("_err")
             <= F.lit(_SAMP_BOUND) * F.col("exact_n"))
            .cast("int").alias("within")))

    return (kmv_rows("users").unionByName(kmv_rows("events"))
            .unionByName(cm).unionByName(samp)
            .orderBy("method", "grp"))


def _oracle_sketch_error_gate() -> str:
    from ..operators.sketches import (CM_DEPTH, CM_WIDTH, KMV_K,
                                      kmv_estimator_constant)
    from .llmdata import _SQL_TOKS, _sql_hash15

    c = repr(kmv_estimator_constant(KMV_K))
    s2 = _KMV_SIGMAS * _KMV_SIGMAS

    def kmv_est(key_expr: str, salt: str, out: str) -> str:
        h = _sql_hash15(f"'{salt}:' || CAST({key_expr} AS VARCHAR)")
        return f"""
h_{out} AS (
  SELECT DISTINCT event_type, {h} AS h
  FROM events WHERE {key_expr} IS NOT NULL
),
r_{out} AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS r,
         count(*) OVER (PARTITION BY event_type) AS m
  FROM h_{out}
),
e_{out} AS (
  SELECT event_type,
         CASE WHEN max(m) < {KMV_K} THEN max(m)
              ELSE CAST(floor({c} / CAST(greatest(
                     max(CASE WHEN r = {KMV_K} THEN h END), 1)
                     AS DOUBLE)) AS BIGINT) END AS est
  FROM r_{out} GROUP BY 1
)"""

    def cm_cell(tok_expr: str) -> str:
        h = _sql_hash15(
            f"'cm' || CAST(d.i AS VARCHAR) || ':' || {tok_expr}")
        return f"{h} % {CM_WIDTH}"

    samp_h = _sql_hash15("'kmv:' || CAST(l_partkey AS VARCHAR)")

    return f"""
WITH {kmv_est("user_id", "kmvu", "users")},
{kmv_est("event_id", "kmve", "events")},
exact AS (
  SELECT event_type,
         CAST(count(DISTINCT user_id) AS BIGINT) AS x_users,
         CAST(count(DISTINCT event_id) AS BIGINT) AS x_events
  FROM events GROUP BY 1
),
kmv_long AS (
  SELECT 'users:' || x.event_type AS grp, x.x_users AS exact_n,
         u.est AS est_n
  FROM exact x JOIN e_users u USING (event_type)
  UNION ALL
  SELECT 'events:' || x.event_type, x.x_events, e.est
  FROM exact x JOIN e_events e USING (event_type)
),
kmv_rows AS (
  SELECT 'kmv' AS method, grp, exact_n, est_n,
         (abs(est_n - exact_n) * 1000000) // greatest(exact_n, 1)
           AS err_ppm,
         CAST(abs(est_n - exact_n) * abs(est_n - exact_n)
                * {KMV_K - 2}
              <= {s2} * exact_n * exact_n AS INT) AS within
  FROM kmv_long
),
toks AS (SELECT unnest({_SQL_TOKS}) AS tok FROM documents),
tc AS (SELECT tok, CAST(count(*) AS BIGINT) AS true_cnt
       FROM toks GROUP BY tok),
depths AS (SELECT unnest(range(0, {CM_DEPTH})) AS i),
cells AS (
  SELECT d.i AS depth, {cm_cell("tok")} AS cell,
         CAST(sum(true_cnt) AS BIGINT) AS cnt
  FROM tc CROSS JOIN depths d GROUP BY 1, 2
),
n_tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n
          FROM cells WHERE depth = 0),
top AS (SELECT tok, true_cnt FROM tc
        ORDER BY true_cnt DESC, tok LIMIT {SKETCH_GATE_TOPK}),
probe AS (
  SELECT t.tok, t.true_cnt, d.i AS depth, {cm_cell("t.tok")} AS cell
  FROM top t CROSS JOIN depths d
),
cm_est AS (
  SELECT p.tok, p.true_cnt,
         CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS est_n
  FROM probe p LEFT JOIN cells c
    ON c.depth = p.depth AND c.cell = p.cell
  GROUP BY p.tok, p.true_cnt
),
cm_rows AS (
  SELECT 'cm' AS method, 'tok:' || e.tok AS grp,
         e.true_cnt AS exact_n, e.est_n,
         ((e.est_n - e.true_cnt) * 1000000) // greatest(nt.n, 1)
           AS err_ppm,
         CAST(e.est_n >= e.true_cnt
              AND (e.est_n - e.true_cnt) * {CM_WIDTH}
                  <= {_CM_BOUND_NUM} * nt.n AS INT) AS within
  FROM cm_est e CROSS JOIN n_tot nt
),
samp_base AS (
  SELECT l_returnflag,
         CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_n,
         CAST(count(DISTINCT CASE WHEN {samp_h} % {_SAMP_MOD} = 0
                                  THEN l_partkey END)
              * {_SAMP_MOD} AS BIGINT) AS est_n
  FROM lineitem GROUP BY 1
),
samp_rows AS (
  SELECT 'samp' AS method, 'parts:' || l_returnflag AS grp,
         exact_n, est_n,
         (abs(est_n - exact_n) * 1000000) // greatest(exact_n, 1)
           AS err_ppm,
         CAST(abs(est_n - exact_n) * abs(est_n - exact_n)
              <= {_SAMP_BOUND} * exact_n AS INT) AS within
  FROM samp_base
)
SELECT method, grp, exact_n, est_n,
       CAST(err_ppm AS BIGINT) AS err_ppm, within
FROM (SELECT * FROM kmv_rows UNION ALL SELECT * FROM cm_rows
      UNION ALL SELECT * FROM samp_rows)
ORDER BY method, grp
"""


SPECS = [
    QuerySpec("q118_expectations", q_expectations, ORACLE_EXPECTATIONS,
              "declarative data-quality gate: 6 rules in one fact scan "
              "+ broadcast FK anti-check; long-form violations report",
              ("B4", "P2-quality")),
    QuerySpec("q119_incremental_mv", q_incremental_mv,
              ORACLE_INCREMENTAL_MV,
              "incremental materialized aggregate: 3 epoch states merged "
              "via the (n,sum,min,max) monoid == one-shot DuckDB aggregate",
              ("D13", "P2-quality")),
    QuerySpec("q132_quality_drift", q_quality_drift,
              _oracle_quality_drift,
              "distribution-drift monitor: fixed-bin quality "
              "histograms per ingest epoch + exact integer "
              "total-variation drift vs the baseline epoch",
              ("P2-quality",)),
    QuerySpec("q135_sketch_error_gate", q_sketch_error_gate,
              _oracle_sketch_error_gate,
              "sketch-accuracy gate: KMV distinct-count, count-min "
              "frequency, and x16 sampled-distinct errors as "
              "driver-hashed integers with within-guarantee flags "
              "(3-sigma KMV/sampled, over-count*width <= 3N "
              "count-min)",
              ("D15", "P2-sketch", "P2-quality")),
]
