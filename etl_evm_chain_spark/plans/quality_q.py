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
]
