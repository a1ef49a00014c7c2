"""Dataset-curation operators for training-data pipelines (P2).

The operations every large-scale LLM data pipeline needs between "raw
corpus" and "training shards": deterministic splits, stratified
sampling, per-group top-k selection, and context-window packing. All
are pure column expressions / windows — JVM-side, shuffle-minimal, and
reproducible run-to-run (hash-based rather than RNG-based, so adding
machines or re-running never changes an example's split — the property
that keeps eval sets uncontaminated).

Hashing uses functions.text.hash15 (md5-prefix bigint) so results are
engine-portable and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import hash15


def hash_bucket(key: Column | str, *, salt: str, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets): hash of (salt, key). Salting
    decorrelates independent uses (split vs sample vs shard) of the
    same key."""
    c = F.col(key) if isinstance(key, str) else key
    return hash15(F.concat(F.lit(salt + ":"), c.cast("string"))) % buckets


def hash_split(df: DataFrame, *, key: str, salt: str = "split",
               train_pct: int = 80, val_pct: int = 10,
               out_col: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment by key hash.

    Unlike randomSplit, membership is a pure function of the key: new
    data lands in the same proportions, and no row ever migrates
    between splits across runs or cluster sizes.
    """
    b = hash_bucket(key, salt=salt, buckets=100)
    return df.withColumn(
        out_col,
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def stratified_sample(df: DataFrame, *, key: str, fraction: float,
                      salt: str = "sample") -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose key hash
    falls under the threshold. Stratification is implicit — the hash is
    uniform within any stratum, so per-group rates concentrate around
    ``fraction`` without per-group state or a shuffle."""
    buckets = 1_000_000
    thr = int(fraction * buckets)
    return df.filter(hash_bucket(key, salt=salt, buckets=buckets) < thr)


def temperature_sample(df: DataFrame, *, key: str, id_col: str,
                       alpha: float = 0.5, salt: str = "mix",
                       rate_col: str = "rate_ppm") -> DataFrame:
    """Temperature-flattened category mixing: downsample each category
    so the kept distribution follows ``count^alpha`` (alpha<1 flattens
    head categories — the standard multi-source/multi-lingual rebalance
    in LLM pretraining mixes).

    Per-row keep rate for category c is ``(min_count / count_c)^(1-α)``
    — the smallest category keeps everything, larger ones shed rows
    until relative sizes match the tempered distribution. Selection is
    hash-thresholded on the row key (reproducible; no RNG, no
    per-category state): keep iff
    ``hash15(salt:id) % 9e15 < floor(rate · 9e15)``.

    Only α = 0.5 (and 1.0) are oracle-exact: the rate is then a single
    ``sqrt``, which IEEE-754 requires to be correctly rounded, so both
    engines compute bit-identical thresholds. Arbitrary α needs
    ``pow``, which is not portable across libm implementations —
    callers that use other temperatures get the same semantics but
    must verify with rows-only checks.

    Scale shape: one tiny groupBy(key) for counts (map-side combined to
    |categories| rows), a scalar min, then a broadcast cross join back
    — the corpus itself is filtered in place, no shuffle.
    """
    if alpha == 1.0:
        return df.withColumn(rate_col, F.lit(1_000_000).cast("long"))
    if alpha != 0.5:
        raise ValueError("oracle-exact temperature_sample supports "
                         "alpha in {0.5, 1.0} (sqrt is IEEE-exact; pow "
                         "is not engine-portable)")
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    floor_cnt = counts.agg(F.min("cnt").alias("min_cnt"))
    rate = F.sqrt(F.col("min_cnt").cast("double") / F.col("cnt"))
    rated = (
        counts.crossJoin(F.broadcast(floor_cnt))
        .select(key, F.floor(rate * 9e15).cast("long").alias("_thr"),
                F.floor(rate * 1e6).cast("long").alias(rate_col))
    )
    u = hash15(F.concat(F.lit(salt + ":"),
                        F.col(id_col).cast("string"))) % F.lit(9_000_000_000_000_000)
    return (
        df.join(F.broadcast(rated), key)
        .filter(u < F.col("_thr"))
        .drop("_thr")
    )


def topk_per_group(df: DataFrame, *, group: str, order: list[Column],
                   k: int, rank_col: str = "rank") -> DataFrame:
    """Top-k rows per group by a deterministic ordering (include a
    unique tiebreaker in ``order``).

    Scale shape (round-4 rework): group keys like source/lang are
    intrinsically low-cardinality, so ONE window per group funnels the
    whole relation into a handful of tasks (the audit's
    low_card_window disease). Two phases instead:

    1. local top-k per (group, input-partition): the window key adds
       ``spark_partition_id()`` — a derived high-cardinality column —
       so each task sorts only its own scan slice, in parallel with
       the scan's width; at most k rows per (group, partition)
       survive;
    2. the exact per-group window over the pre-truncated relation,
       whose size is ≤ k × partitions per group — bounded by
       parallelism, independent of data size.

    Any row in the true global top-k is in the top-k of its own
    partition slice, so phase 2 sees every winner: answers are
    identical to the one-window form for any deterministic order.
    """
    w_local = Window.partitionBy(group, "_tpk_pid").orderBy(*order)
    pre = (
        df.withColumn("_tpk_pid", F.spark_partition_id())
        .withColumn("_tpk_lr", F.row_number().over(w_local))
        .filter(F.col("_tpk_lr") <= k)
        .drop("_tpk_pid", "_tpk_lr")
    )
    w = Window.partitionBy(group).orderBy(*order)
    return (
        pre.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def pack_sequences(df: DataFrame, *, group: str, order: str, length: str,
                   context: int, pack_col: str = "pack_id") -> DataFrame:
    """Assign documents to fixed-size context windows by cumulative
    token count (streaming concat-and-chop packing, the standard
    pretraining shard layout).

    ``pack_id = floor(start_offset / context)`` where start_offset is
    the running sum of lengths before this row — no sequential state.
    A document that straddles a boundary belongs to the pack it starts
    in (the downstream tokenizer splits it); utilization accounting
    per pack then follows from a groupBy.

    Scale shape (round-4 rework): the running sum goes through
    ``functions/ranking.bucketed_prefix_sum`` — per-(group,
    order-range-bucket) local window sums plus a broadcast prefix-sum
    join — instead of one cumulative window per group, because group
    keys (source/split) are intrinsically low-cardinality and a
    per-group window would funnel 100 TB of documents into a handful
    of tasks. ``order`` must be unique within a group (doc ids are).
    """
    from ..functions.ranking import bucketed_prefix_sum, scaled_buckets

    dtype = dict(df.dtypes).get(order, "")
    numeric = dtype in ("tinyint", "smallint", "int", "bigint", "float",
                        "double") or dtype.startswith("decimal")
    if numeric:
        cum = bucketed_prefix_sum(
            df, order, [order], length, part_cols=(group,),
            n_buckets=scaled_buckets(df.sparkSession), out_name="_incl")
        start = (F.col("_incl") - F.col(length)).cast("long")
    else:
        # non-numeric order keys can't range-bucket; fall back to the
        # per-group window (callers with string ids at 100 TB should
        # rank on a numeric surrogate first)
        w = (Window.partitionBy(group).orderBy(order)
             .rowsBetween(Window.unboundedPreceding, -1))
        start = F.coalesce(F.sum(length).over(w), F.lit(0)).cast("long")
    return (df.withColumn("_start", start) if not numeric else
            cum.withColumn("_start", start).drop("_incl")) \
        .withColumn(pack_col, F.floor(F.col("_start") / context)
                    .cast("long")) \
        .withColumn("start_offset", F.col("_start").cast("long")) \
        .drop("_start")


def chunk_documents(df: DataFrame, *, id_col: str = "doc_id",
                    text_col: str = "text", size: int = 256,
                    stride: int = 192) -> DataFrame:
    """Overlapping fixed-size character chunks (RAG / pretraining
    window prep): chunk i covers [i*stride, i*stride + size), and the
    last chunk starts at the final stride step that still has text.

    Row-local sequence+explode — no shuffle at all; 100 TB of docs
    chunk as a narrow map. Chunk count per doc is
    ``max(ceil((len − size)/stride) + 1, 1)`` so a short doc yields
    exactly one chunk and every character lands in ≥1 chunk.
    """
    n = F.length(text_col)
    n_chunks = F.greatest(
        (F.ceil((n - size) / F.lit(float(stride))) + 1).cast("int"),
        F.lit(1),
    )
    ix = F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_ix")
    out = df.select(F.col(id_col), F.col(text_col), ix)
    start = (F.col("chunk_ix") * stride + 1).cast("int")
    chunk = F.col(text_col).substr(start, F.lit(size))
    return out.select(
        id_col, "chunk_ix",
        F.length(chunk).alias("chunk_len"),
        hash15(chunk).alias("chunk_hash"),
    )


def weighted_sample(df: DataFrame, *, key: str, weight: Column | str,
                    k: int, salt: str = "ws",
                    max_weight: int = 64) -> DataFrame:
    """Deterministic weighted top-k sample (without replacement):
    higher-weight rows are proportionally likelier to be picked, with
    NO RNG and NO transcendental math — so any engine reproduces the
    selected set bit-for-bit (ln/pow differ across libms; hash
    comparisons do not).

    The integer-replication trick: a row with integer weight w gets w
    independent 60-bit hash keys ``hash15(salt:key:j)``, j < w, and
    competes with its MINIMUM key; the k smallest minima win. A row
    with twice the replicas halves its expected minimum — the discrete
    sibling of Efraimidis-Spirakis exponential keys. Weights clamp to
    [1, max_weight] (the key array is built per row, so weight bounds
    per-row work, not a shuffle).

    Scale shape: one projection computes the min-key (aggregate over a
    ≤max_weight literal-range array), then TakeOrderedAndProject picks
    k rows — partition-local top-k + driver merge of k, never a global
    sort.
    """
    w = F.col(weight) if isinstance(weight, str) else weight
    # coalesce BEFORE clamping: least()/greatest() skip NULLs, so a
    # NULL weight would clamp to max_weight — the most-likely-sampled
    # row — instead of the neutral minimum
    w = F.greatest(F.lit(1),
                   F.least(F.coalesce(w.cast("int"), F.lit(1)),
                           F.lit(max_weight)))
    kcol = F.col(key).cast("string")
    minkey = F.array_min(F.transform(
        F.sequence(F.lit(0), w - 1),
        lambda j: hash15(F.concat(F.lit(f"{salt}:"), kcol, F.lit(":"),
                                  j.cast("string")))))
    return (df.withColumn("_wkey", minkey)
            .orderBy(F.asc("_wkey"), F.asc(key))
            .limit(k)
            .drop("_wkey"))


def shard_assignment(df: DataFrame, *, key: str, n_shards: int,
                     salt: str = "shard") -> DataFrame:
    """Deterministic training-shard assignment + within-shard order.

    ``shard``   = hash15(salt:key) % n_shards — uniform, reproducible,
                  independent of cluster size or input partitioning.
    ``ord_key`` = a SECOND independent hash (salt:ord:key) giving each
                  shard a deterministic pseudo-random interior order —
                  the "global shuffle" training readers need, without
                  any global sort: ordering is per-shard, not corpus-
                  wide, and reproducible run-to-run (re-exporting after
                  appending new docs never reorders old ones relative
                  to each other).
    """
    kcol = F.col(key).cast("string")
    return df.withColumn(
        "shard", (hash15(F.concat(F.lit(f"{salt}:"), kcol))
                  % n_shards).cast("int")
    ).withColumn(
        "ord_key", hash15(F.concat(F.lit(f"{salt}:ord:"), kcol)))


def export_shards(df: DataFrame, out_dir: str, *, key: str = "doc_id",
                  n_shards: int = 64, salt: str = "shard",
                  mode: str = "overwrite") -> DataFrame:
    """Write training shards ``shard=N/`` + return the manifest.

    One hash shuffle (repartition by shard), files written in
    deterministic ``ord_key`` order via sortWithinPartitions (no extra
    exchange — the sort rides the shard partitioning), one directory
    per shard. The returned manifest carries per-shard row/char counts
    and an order-insensitive content checksum (sum of row fingerprints
    mod 2^60) — the receipt a downstream trainer verifies shards
    against; persist it next to the data.

    100 TB shape: shard count picks file sizes (corpus_bytes /
    n_shards ≈ target shard size); everything is a single pass with
    map-side partial aggregation for the manifest.
    """
    assigned = shard_assignment(df, key=key, n_shards=n_shards, salt=salt)
    (assigned.repartition(n_shards, "shard")
     .sortWithinPartitions("shard", "ord_key")
     .write.mode(mode).partitionBy("shard").parquet(out_dir))
    return shard_manifest(assigned, key=key)


def shard_manifest(assigned: DataFrame, *, key: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Per-shard manifest over a shard_assignment output: row count,
    char count, min/max order key (sanity of the interior order), and
    an order-insensitive checksum — engine-portable arithmetic
    throughout, so a DuckDB oracle reproduces it bit-for-bit."""
    kcol = F.col(key).cast("string")
    fp = hash15(F.concat(kcol, F.lit(":"), F.col(text_col)))
    # sum 60-bit fingerprints in DECIMAL: a bigint sum would wrap
    # silently in Spark while DuckDB's hugeint would not — decimal(38)
    # holds ~1e12 rows x 2^60 with headroom, then mod back to long
    fsum = F.sum(fp.cast("decimal(38,0)"))
    return (assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length(text_col)).alias("n_chars"),
        F.min("ord_key").alias("ord_min"),
        F.max("ord_key").alias("ord_max"),
        F.pmod(fsum, F.lit(1 << 60).cast("decimal(38,0)"))
        .cast("long").alias("checksum"))
        .orderBy("shard"))


def budget_mix(df: DataFrame, *, part_col: str, cost_col: str,
               rate_col: Column, key: str,
               n_buckets: int = 64) -> DataFrame:
    """Per-source budgeted corpus mixing: within each ``part_col``
    group, take rows in deterministic md5-of-``key`` order until the
    cumulative ``cost_col`` reaches that group's budget —
    ``floor(rate × group_total_cost / 10)`` with ``rate_col`` in
    tenths (integer-exact in any engine; a 0.1 float literal would be
    DECIMAL in DuckDB but DOUBLE in Spark and disagree at floor
    boundaries). This is the token/char-budget data-mixing step of a
    training pipeline: rates boost or flatten sources, the hash order
    makes the selection a pure function of the data (re-runs, late
    arrivals, and engines all agree).

    ``rate_col`` must be an expression over ``part_col`` ONLY (e.g.
    a lookup keyed on the source name): it is evaluated per row
    against the group value, so anything referencing non-group
    columns would make the budget row-dependent — not a group budget.

    The running cost uses the two-phase ranking kit with
    ``edges="depth"`` — the order key is a HASH STRING, so equi-width
    numeric ranges can't bucket it, and sampled-quantile range
    boundaries keep the per-bucket sort bounded regardless of corpus
    skew. No window partitioned by the (low-cardinality) source ever
    sees the corpus, and the group totals ride the kit's own census
    (``total_name``) — the corpus is scanned once, with no budgets
    side-relation to join (NULL groups therefore work for free).

    Returns the selected rows plus ``_cum`` (running cost) and
    ``_budget``. Groups whose first row already exceeds the budget
    select nothing (strict ``cum <= budget``).
    """
    from ..functions.ranking import bucketed_prefix_sum

    hk = F.md5(F.col(key).cast("string"))
    with_key = df.withColumn("_hk", hk)
    cum = bucketed_prefix_sum(
        with_key, "_hk", ["_hk", key], cost_col,
        part_cols=[part_col], n_buckets=n_buckets, edges="depth",
        out_name="_cum", total_name="_tot")
    return (cum.withColumn(
                "_budget",
                F.floor(rate_col * F.col("_tot") / 10).cast("long"))
            .filter(F.col("_cum") <= F.col("_budget"))
            .drop("_hk", "_tot"))


def curation_funnel(docs: DataFrame, *, eval_docs: DataFrame,
                    part_col: str, rate_col: Column,
                    min_quality: float = 0.45,
                    jaccard_threshold: float = 0.5,
                    min_containment: float = 0.8,
                    cost_col: str = "n_chars",
                    id_col: str = "doc_id", text_col: str = "text",
                    n_buckets: int = 64) -> DataFrame:
    """End-to-end corpus curation with per-document dispositions — the
    composition proof for the whole P2 tier: quality gate → exact
    dedup → near-dup resolution → benchmark decontamination → char-
    budget mixing, each stage narrowing the previous stage's
    survivors, every document labeled with the FIRST stage that
    dropped it (or ``kept``). The disposition ledger is what a real
    pipeline audits ("why did 40% of source X die?") and what an
    incremental re-run diffs against.

    Stage semantics (order matters — each operates on the previous
    survivors only, e.g. the exact-dedup min-id rule ignores docs the
    quality gate already killed):

    - ``quality``: heuristic quality_score < ``min_quality`` (NULL
      text scores as 0 — dropped, never silently vanished).
    - ``exact_dup``: not the min-id row of its normalized-text
      fingerprint group among quality survivors.
    - ``near_dup``: not the canonical (min-id connected-component
      label) of its verified-Jaccard ≥ ``jaccard_threshold`` cluster.
    - ``contaminated``: shingle containment of some ``eval_docs``
      document ≥ ``min_containment`` (cleaning.contamination).
    - ``over_budget``: cut by the per-``part_col`` char budget
      (budget_mix md5-order prefix rule, rate from ``rate_col``).
    - ``kept``: survived everything.

    Scale shape: every stage is a filter, a high-cardinality-key
    window (fingerprint groups), a banded equi-join, or the two-phase
    ranking kit — no global windows, no driver materialization beyond
    resolve_duplicates' bounded dup-candidate labels. The six output
    branches re-derive the survivor chain declaratively; a 100 TB
    deployment lands each stage's survivors (catalog.landed_artifact /
    the landed indexes) instead of recomputing, exactly as the
    registry query (plans/curation_q) lands the finished funnel.

    No reference analog (the reference curates nothing); this is the
    SURVEY §7 P2 capstone.
    """
    from ..functions.text import fingerprint, quality_score
    from . import dedup as dd
    from .cleaning import contamination

    # NULL text scores 0 EXPLICITLY: quality_score's least() terms
    # skip NULL operands (Spark and DuckDB both), so a NULL doc would
    # otherwise score ~0.7 and sail through the gate
    base = docs.select(
        F.col(id_col), F.col(part_col), F.col(cost_col), F.col(text_col),
        F.when(F.col(text_col).isNull(), F.lit(0.0))
        .otherwise(F.coalesce(quality_score(text_col), F.lit(0.0)))
        .alias("_q"))
    out_cols = [id_col, part_col, cost_col]

    def staged(df: DataFrame, stage: str) -> DataFrame:
        return df.select(*out_cols, F.lit(stage).alias("stage"))

    s1 = base.filter(F.col("_q") >= min_quality)
    d_quality = staged(base.filter(F.col("_q") < min_quality), "quality")

    # exact dedup: fingerprint groups are high-cardinality (≈ one per
    # distinct document), so the min-id window partitions fine
    s1 = s1.withColumn(
        "_fp", F.coalesce(fingerprint(text_col), F.lit(-1).cast("long")))
    rn = F.row_number().over(
        Window.partitionBy("_fp").orderBy(id_col))
    s1 = s1.withColumn("_rn", rn)
    d_exact = staged(s1.filter(F.col("_rn") > 1), "exact_dup")
    s2 = s1.filter(F.col("_rn") == 1).drop("_rn", "_fp", "_q")

    pairs = dd.verified_near_dups(s2, id_col=id_col, text_col=text_col,
                                  threshold=jaccard_threshold)
    resolved = dd.resolve_duplicates(s2.select(id_col), pairs,
                                     id_col=id_col)
    s2 = s2.join(resolved, id_col)
    d_near = staged(s2.filter(F.col(id_col) != F.col("canonical")),
                    "near_dup")
    s3 = s2.filter(F.col(id_col) == F.col("canonical")).drop("canonical")

    hits = contamination(s3, eval_docs, id_col=id_col, text_col=text_col,
                         min_containment=min_containment)
    bad = hits.select(F.col("train_id").alias(id_col)).dropDuplicates()
    d_cont = staged(s3.join(bad, id_col, "leftsemi"), "contaminated")
    s4 = s3.join(bad, id_col, "left_anti").drop(text_col)

    sel = budget_mix(s4, part_col=part_col, cost_col=cost_col,
                     rate_col=rate_col, key=id_col, n_buckets=n_buckets)
    kept = staged(sel, "kept")
    d_budget = staged(
        s4.join(sel.select(id_col), id_col, "left_anti"), "over_budget")

    out = d_quality
    for part in (d_exact, d_near, d_cont, d_budget, kept):
        out = out.unionByName(part)
    return out


def leakage_safe_split(df: DataFrame, *, resolved: DataFrame,
                       key: str = "doc_id", salt: str = "split",
                       train_pct: int = 80, val_pct: int = 10,
                       out_col: str = "split") -> DataFrame:
    """Near-dup-aware train/val/test split: assignment hashes the
    near-dup CLUSTER's canonical id (dedup.resolve_duplicates output),
    not the document id, so no cluster ever straddles splits — the
    leakage mode where a test document's near-duplicate sits in train
    and the eval silently measures memorization. ``resolved`` is the
    (key, canonical) mapping; the join is key-to-key (canonical is a
    plain data column), so the split stays a pure function of content
    clusters under re-runs, new data, and cluster-size changes — the
    same determinism contract as hash_split.
    """
    # LEFT join + coalesce: a resolution built only over pair-touched
    # ids must not silently drop singleton documents — hash_split's
    # contract is a total partition of the input, so every row gets an
    # assignment (a missing mapping means "its own cluster").
    joined = (df.join(resolved.select(key, "canonical"), key, "left")
              .withColumn("canonical",
                          F.coalesce("canonical", F.col(key))))
    b = hash_bucket("canonical", salt=salt, buckets=100)
    return joined.withColumn(
        out_col,
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )
