"""Graph + behavioral-sequence queries over the decoded-transfer and
events tables: PageRank flow centrality and an ordered conversion
funnel. Both are fully SQL-expressible, so each gets an exact DuckDB
oracle (the PageRank oracle unrolls the 5 supersteps as chained CTEs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.graph import pagerank, weighted_edges
from . import QuerySpec
from .evm import T_TRANSFER, TRANSFER, _SQL_RAW, synthetic_transfer_logs

DAMPING = 0.85
ITERS = 5
TOPN = 20


# ---------------------------------------------------------------------------
# Q74: PageRank flow centrality of addresses in the decoded Transfer
# graph — Pregel-by-join (operators/graph.py): edge shares materialized
# once, each superstep = one join + one agg by destination. The output
# scales ranks ×1000 and rounds to 6 so the two engines' float-sum
# orders cannot perturb the hash, and orders by the ROUNDED value so
# the top-20 cut is engine-deterministic.
# ---------------------------------------------------------------------------

def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = synthetic_transfer_logs(spark, sf_dir)
    # src/dst decode straight from the indexed topics (G3 native form);
    # the full decode_event (uint256 limbs etc.) would be dead weight —
    # Catalyst would prune it, but being explicit keeps the scan to the
    # two topic words.
    transfers = raw.filter(F.col("topics")[0] == T_TRANSFER).select(
        F.concat(F.lit("0x"), F.substring(F.col("topics")[1], 27, 40))
        .alias("src_addr"),
        F.concat(F.lit("0x"), F.substring(F.col("topics")[2], 27, 40))
        .alias("dst_addr"),
    )
    edges = weighted_edges(transfers, src="src_addr", dst="dst_addr")
    ranks = pagerank(edges, iters=ITERS, damping=DAMPING)
    out = ranks.select(
        F.col("node").alias("address"),
        F.round(F.col("rank") * 1000, 6).alias("rank_x1000"),
    )
    return out.orderBy(F.desc("rank_x1000"), "address").limit(TOPN)


def _oracle_pagerank() -> str:
    raw = _SQL_RAW.format(topic0_expr=f"'{T_TRANSFER}'")
    iter_ctes = []
    for k in range(1, ITERS + 1):
        iter_ctes.append(f"""
r{k} AS (
  SELECT nd.node,
         (1 - {DAMPING}) / p.n + {DAMPING} * coalesce(m.mass, 0.0) AS rank
  FROM nodes nd CROSS JOIN p
  LEFT JOIN (
    SELECT s.dst AS node, sum(r.rank * s.share) AS mass
    FROM shares s JOIN r{k - 1} r ON r.node = s.src
    GROUP BY s.dst
  ) m USING (node)
)""")
    return f"""
WITH raw AS ({raw}),
transfers AS (
  SELECT '0x' || substr(topics[2], 27, 40) AS src,
         '0x' || substr(topics[3], 27, 40) AS dst
  FROM raw WHERE topics[1] = '{T_TRANSFER}'
),
edges AS (
  SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
  FROM transfers GROUP BY src, dst
),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
  )
),
p AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
shares AS (
  SELECT e.src, e.dst, e.w / o.ow AS share
  FROM edges e JOIN outw o ON o.src = e.src
),
r0 AS (SELECT node, 1.0 / p.n AS rank FROM nodes, p),
{",".join(iter_ctes)}
SELECT node AS address, round(rank * 1000, 6) AS rank_x1000
FROM r{ITERS}
ORDER BY rank_x1000 DESC, address
LIMIT {TOPN}
"""


# ---------------------------------------------------------------------------
# Q78: ordered conversion funnel signup → click → purchase. Per-user
# first-touch per stage via one conditional aggregation pass (no
# per-stage self-joins), then strictly-increasing timestamps gate each
# stage. One shuffle on user_id; stage counts are a tiny final agg.
# ---------------------------------------------------------------------------

def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ts = F.unix_timestamp("ts")
    first = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", ts)).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "click", ts)).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", ts)).alias("t_purchase"),
    )
    s1 = F.col("t_signup").isNotNull()
    s2 = s1 & F.col("t_click").isNotNull() & (F.col("t_click") > F.col("t_signup"))
    s3 = s2 & F.col("t_purchase").isNotNull() & (F.col("t_purchase") > F.col("t_click"))
    agg = first.agg(
        F.sum(s1.cast("long")).alias("n_signup"),
        F.sum(s2.cast("long")).alias("n_click_after"),
        F.sum(s3.cast("long")).alias("n_purchase_after"),
    )
    return agg.select(
        F.expr("stack(3, 'signup', n_signup, 'click_after', n_click_after, "
               "'purchase_after', n_purchase_after) AS (stage, n_users)"),
        F.round(F.col("n_click_after") / F.col("n_signup"), 6)
        .alias("click_rate"),
        F.round(F.col("n_purchase_after") / F.col("n_signup"), 6)
        .alias("purchase_rate"),
    )


ORACLE_FUNNEL = """
WITH first AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup'
                  THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS t_signup,
         min(CASE WHEN event_type = 'click'
                  THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS t_click,
         min(CASE WHEN event_type = 'purchase'
                  THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS t_purchase
  FROM events GROUP BY user_id
),
f AS (
  SELECT count(CASE WHEN t_signup IS NOT NULL THEN 1 END) AS n_signup,
         count(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
                    THEN 1 END) AS n_click_after,
         count(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
                    AND t_purchase > t_click THEN 1 END) AS n_purchase_after
  FROM first
)
SELECT u.stage, u.n_users,
       round(CAST(f.n_click_after AS DOUBLE) / f.n_signup, 6) AS click_rate,
       round(CAST(f.n_purchase_after AS DOUBLE) / f.n_signup, 6) AS purchase_rate
FROM f, LATERAL (
  SELECT * FROM (VALUES ('signup', f.n_signup),
                        ('click_after', f.n_click_after),
                        ('purchase_after', f.n_purchase_after))
           v(stage, n_users)
) u
"""


# ---------------------------------------------------------------------------
# Q84: weekly retention cohorts — users grouped by signup week, counted
# by how many weeks later they were still active. Two shuffles total
# (per-user cohort agg, then cohort×offset agg); the cohort dim join
# broadcasts.
# ---------------------------------------------------------------------------

def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts"))
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(week).alias("cohort_week"))
    )
    active = ev.select("user_id", week.alias("act_week")).distinct()
    offset = F.floor(
        (F.unix_timestamp("act_week") - F.unix_timestamp("cohort_week"))
        / (7 * 86400)).cast("int")
    return (
        active.join(F.broadcast(cohort), "user_id")
        .withColumn("week_offset", offset)
        .filter(F.col("week_offset") >= 0)
        .groupBy(F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
                 "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


ORACLE_RETENTION = """
WITH cohort AS (
  SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week FROM events
)
SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
       CAST(floor((epoch(a.act_week) - epoch(c.cohort_week)) / (7 * 86400))
            AS INTEGER) AS week_offset,
       count(DISTINCT a.user_id) AS n_active
FROM active a JOIN cohort c USING (user_id)
WHERE epoch(a.act_week) >= epoch(c.cohort_week)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q85: seasonal volume anomaly — per (event_type, hour-of-day) volume
# baseline over days, flag hours whose daily count z-scores past 3.
# Group keys are tiny; the scan aggregates once by (type, date, hour)
# and everything after runs on the aggregate.
# ---------------------------------------------------------------------------

ANOM_Z = 3.0


def q_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy("event_type",
                   F.to_date("ts").alias("day"),
                   F.hour("ts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("event_type", "hour")
    stats = (hourly
             .withColumn("mu", F.avg("n").over(w))
             .withColumn("sd", F.stddev_pop("n").over(w)))
    z = (F.col("n") - F.col("mu")) / F.col("sd")
    return (
        stats.filter((F.col("sd") > 0) & (F.abs(z) > ANOM_Z))
        .select("event_type", F.date_format("day", "yyyy-MM-dd").alias("day"),
                "hour", "n",
                F.round("mu", 6).alias("mu"),
                F.round("sd", 6).alias("sd"),
                F.round(z, 6).alias("z"))
    )


ORACLE_VOLUME_ANOMALY = f"""
WITH hourly AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(extract(hour FROM ts) AS INTEGER) AS hour, count(*) AS n
  FROM events GROUP BY 1, 2, 3
),
stats AS (
  SELECT *, avg(n) OVER w AS mu, stddev_pop(n) OVER w AS sd
  FROM hourly
  WINDOW w AS (PARTITION BY event_type, hour)
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, hour, n,
       round(mu, 6) AS mu, round(sd, 6) AS sd,
       round((n - mu) / sd, 6) AS z
FROM stats WHERE sd > 0 AND abs((n - mu) / sd) > {ANOM_Z}
"""


# ---------------------------------------------------------------------------
# Q114: co-purchase triangle census — parts that appear in the same
# order form an undirected edge; operators/graph.triangle_counts runs
# the degree-oriented wedge join (the only triangle algorithm that
# survives an unbounded edge list: oriented out-degree is O(sqrt(E)),
# so wedge fan-out is bounded and every step is an equi-join). Output
# is the top-20 parts by triangle participation, tiebreak partkey.
# ---------------------------------------------------------------------------

TRI_TOPN = 20
# Every-4th-order subset: the UNFILTERED sf0.1 co-purchase graph packs
# ~1.1M edges onto only 20k parts (avg degree >100 — far denser than
# any real co-occurrence graph), which exists only because the fixture
# reuses partkeys so heavily. The modulus keeps the fixture's density
# in a realistic regime; the operator itself has no such knob.
TRI_ORDER_MOD = 4


def q_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import triangle_counts

    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_orderkey") % TRI_ORDER_MOD == 0)
          .select("l_orderkey", "l_partkey"))
    x, y = li.alias("x"), li.alias("y")
    pairs = (
        x.join(y, "l_orderkey")
        .filter(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").alias("a"),
                F.col("y.l_partkey").alias("b"))
        .distinct()
    )
    tc = triangle_counts(pairs)
    return (
        tc.select(F.col("node").alias("l_partkey"), "n_triangles")
        .orderBy(F.desc("n_triangles"), "l_partkey").limit(TRI_TOPN)
    )


ORACLE_TRIANGLES = f"""
WITH pairs AS (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
  FROM lineitem x JOIN lineitem y ON x.l_orderkey = y.l_orderkey
  WHERE x.l_partkey < y.l_partkey
    AND x.l_orderkey % {TRI_ORDER_MOD} = 0
),
deg AS (
  SELECT node, count(*) AS deg FROM (
    SELECT a AS node FROM pairs UNION ALL SELECT b FROM pairs
  ) GROUP BY node
),
orient AS (
  SELECT CASE WHEN (ta.deg < tb.deg)
                OR (ta.deg = tb.deg AND p.a < p.b)
              THEN p.a ELSE p.b END AS u,
         CASE WHEN (ta.deg < tb.deg)
                OR (ta.deg = tb.deg AND p.a < p.b)
              THEN p.b ELSE p.a END AS v,
         CASE WHEN (ta.deg < tb.deg)
                OR (ta.deg = tb.deg AND p.a < p.b)
              THEN tb.deg ELSE ta.deg END AS dv
  FROM pairs p
  JOIN deg ta ON ta.node = p.a
  JOIN deg tb ON tb.node = p.b
),
wedges AS (
  SELECT e1.u, e1.v AS v1, e2.v AS v2
  FROM orient e1 JOIN orient e2 ON e1.u = e2.u
  WHERE (e1.dv < e2.dv) OR (e1.dv = e2.dv AND e1.v < e2.v)
),
tri AS (
  SELECT w.u, w.v1, w.v2
  FROM wedges w JOIN pairs p
    ON p.a = least(w.v1, w.v2) AND p.b = greatest(w.v1, w.v2)
),
pernode AS (
  SELECT node, count(*) AS n_triangles FROM (
    SELECT u AS node FROM tri
    UNION ALL SELECT v1 FROM tri
    UNION ALL SELECT v2 FROM tri
  ) GROUP BY node
)
SELECT node AS l_partkey, n_triangles
FROM pernode
ORDER BY n_triangles DESC, l_partkey
LIMIT {TRI_TOPN}
"""


# ---------------------------------------------------------------------------
# Q129: synchronous label propagation over the co-purchase graph —
# community detection as pure integer arithmetic (round-6 graph-tier
# extension beside q74 PageRank / q114 triangles / q41 CC). Three
# fixed synchronous rounds, neighbor-majority vote with min-label tie
# break; the oracle unrolls the identical rounds in SQL, so every
# label decision is hash-checked, not just the final sizes.
# ---------------------------------------------------------------------------

LPA_ITER = 3
LPA_TOPN = 20


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import label_propagation

    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_orderkey") % TRI_ORDER_MOD == 0)
          .select("l_orderkey", "l_partkey"))
    x, y = li.alias("x"), li.alias("y")
    pairs = (
        x.join(y, "l_orderkey")
        .filter(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").alias("a"),
                F.col("y.l_partkey").alias("b"))
        .distinct()
    )
    out = label_propagation(pairs, n_iter=LPA_ITER)
    # membership checksum (sum of member ids) pins WHO is in each
    # community, not just how many — integer-exact in both engines
    return (out.groupBy("community")
            .agg(F.count(F.lit(1)).alias("n_nodes"),
                 F.sum(F.col("node").cast("decimal(38,0)"))
                 .cast("long").alias("sum_nodes"))
            .orderBy(F.desc("n_nodes"), "community").limit(LPA_TOPN))


def _lpa_round(i: int) -> str:
    return f"""
v{i} AS (
  SELECT e.dst AS node, l.lbl, count(*) AS c
  FROM sym e JOIN l{i - 1} l ON l.node = e.src
  GROUP BY 1, 2
),
l{i} AS (
  SELECT node, lbl FROM (
    SELECT node, lbl,
           row_number() OVER (PARTITION BY node
                              ORDER BY c DESC, lbl ASC) AS rn
    FROM v{i}) WHERE rn = 1
)"""


def _oracle_label_propagation() -> str:
    rounds = ",".join(_lpa_round(i) for i in range(1, LPA_ITER + 1))
    return f"""
WITH pairs AS (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
  FROM lineitem x JOIN lineitem y ON x.l_orderkey = y.l_orderkey
  WHERE x.l_partkey < y.l_partkey
    AND x.l_orderkey % {TRI_ORDER_MOD} = 0
),
sym AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION
  SELECT b, a FROM pairs
),
l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM sym),
{rounds}
SELECT lbl AS community, count(*) AS n_nodes,
       CAST(sum(node) AS BIGINT) AS sum_nodes
FROM l{LPA_ITER}
GROUP BY lbl
ORDER BY n_nodes DESC, community
LIMIT {LPA_TOPN}
"""



SPECS = [
    QuerySpec("q74_pagerank", q_pagerank, _oracle_pagerank(),
              "PageRank flow centrality of transfer addresses "
              "(Pregel-by-join, 5 supersteps)", ("G3", "P2-graph")),
    QuerySpec("q78_funnel", q_funnel, ORACLE_FUNNEL,
              "ordered conversion funnel via one conditional-agg pass",
              ("D12", "D13")),
    QuerySpec("q84_retention_cohorts", q_retention_cohorts,
              ORACLE_RETENTION,
              "weekly signup-cohort retention matrix", ("D12", "C1")),
    QuerySpec("q85_volume_anomaly", q_volume_anomaly,
              ORACLE_VOLUME_ANOMALY,
              "per (type, hour-of-day) volume z-score anomalies",
              ("D7", "D8", "F7")),
    QuerySpec("q114_copurchase_triangles", q_copurchase_triangles,
              ORACLE_TRIANGLES,
              "per-node triangle census via degree-oriented wedge "
              "join", ("P2-graph", "C4")),
    QuerySpec("q129_label_propagation", q_label_propagation,
              _oracle_label_propagation,
              "synchronous label-propagation communities (3 fixed "
              "rounds, neighbor-majority min-label ties) with "
              "membership checksums; oracle = identical rounds "
              "unrolled in SQL", ("P2-graph", "C4")),
]
