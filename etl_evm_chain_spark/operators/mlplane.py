"""ML plane: the reference's fee-ML pipeline re-expressed on pyspark.ml
(SURVEY §2.E3–E8, recovered from `stable_fee_ml_bot.py` bytecode).

Pipeline: windowed feature build (pure Catalyst — no custom state
needed, unlike the reference's Python row loop) → time-ordered 70/30
split → StandardScaler + LogisticRegression → eval metrics →
NOW-signal scoring (latest row per key, top probability wins).

Scale notes: feature building is windows over (pair, fee) partitions;
training data for per-market models is bounded per key. The global
model here trains on the full assembled set — pyspark.ml
LogisticRegression is itself distributed (L-BFGS over partitioned
gradients), so nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FEATURE_COLS = ("z", "devdt", "bias", "sigma")


def build_ml_dataset(dense: DataFrame, *, key: str, ts: str, value: str,
                     ewm_col: str = "bias", std_win: int = 30,
                     sigma_min: float = 0.5, horizon: int = 12,
                     target: float = 2.0) -> DataFrame:
    """Supervised dataset from a dense per-key series that already has
    an EWM ``bias`` column (operators.backtest.ewm_mean).

    Features per reference `stable_fee_ml_bot.py:115-169` (pyc):
    devdt = value − bias (detrended deviation), sigma = rolling
    std(ddof=1) clipped to sigma_min, z = devdt / sigma; label
    y = 1 iff max(future devdt over horizon) − devdt ≥ target,
    keeping only rows with devdt < 0 (B13).
    """
    w = Window.partitionBy(key).orderBy(ts)
    wstd = w.rowsBetween(-(std_win - 1), 0)
    wlead = w.rowsBetween(1, horizon)
    min_p = max(5, std_win // 3)
    cnt = F.count(value).over(wstd)
    devdt = F.col(value) - F.col(ewm_col)
    # sigma via exact decimal window sums (the _with_rolling/_dsum
    # discipline): stddev_samp's streaming moments accumulate in
    # engine-specific order, so its last bit is not reproducible —
    # DECIMAL(18,6) sums are exact and order-free, and every op after
    # the double cast is correctly rounded. Semantics: sample std of
    # devdt quantized at 1e-6 — indistinguishable from the reference's
    # pandas rolling std at the 1e-6 precision everything downstream
    # rounds to.
    xd = F.col("devdt").cast("decimal(18,6)")
    s1 = F.sum(xd).over(wstd).cast("double")
    s2 = F.sum(xd * xd).over(wstd).cast("double")
    c2 = F.count("devdt").over(wstd)
    var = (s2 - s1 * s1 / c2) / (c2 - 1)
    std = F.when(c2 >= 2, F.sqrt(F.greatest(var, F.lit(0.0))))
    df = (
        dense.withColumn("devdt", devdt)
        .withColumn("sigma_raw", F.when(cnt >= min_p, std))
        .withColumn("sigma", F.greatest(F.coalesce("sigma_raw", F.lit(sigma_min)),
                                        F.lit(sigma_min)))
        .withColumn("z", F.col("devdt") / F.col("sigma"))
        .withColumn("lead_max_devdt", F.max("devdt").over(wlead))
        .withColumn("y", (F.col("lead_max_devdt") - F.col("devdt") >= target)
                    .cast("int"))
    )
    # Filter on the rounded deviation: ffilled flat stretches drive the
    # raw devdt to ±1e-15 of zero, where the sign is an artifact of
    # float evaluation order — a knife edge for any cross-engine check.
    # Rounding moves the cut to −5e-7, which the data does not attract
    # to, making "negative deviation" engine-deterministic.
    return (
        df.filter(F.round("devdt", 6) < 0)
        .filter(F.col("y").isNotNull() & F.col("bias").isNotNull())
        .select(key, ts, "z", "devdt", "bias", "sigma", "y")
    )


def time_split(df: DataFrame, *, ts: str, frac: float = 0.7) -> tuple[DataFrame, DataFrame]:
    """Time-ordered split (reference E4): first `frac` of rows train.

    The cut is EXACT: the smallest timestamp whose cumulative row
    count reaches ceil(frac·n), computed from per-timestamp counts
    through functions/ranking.bucketed_prefix_sum (q15's two-phase
    shape — no global window, relation size = distinct timestamps).
    percentile_approx was abandoned here on purpose: its Greenwald-
    Khanna sketch is only exact while n ≤ accuracy, so past 100k rows
    the chosen element could wobble by a few ranks between runs —
    unpinnable against the q29 ground-truth oracle, and a split that
    silently depends on data size is wrong anyway.
    """
    from ..functions.ranking import bucketed_prefix_sum, scaled_buckets

    tcol = (F.unix_timestamp(ts) if dict(df.dtypes)[ts].startswith("timestamp")
            else F.col(ts).cast("long"))
    per_t = df.select(tcol.alias("_t")).groupBy("_t").agg(
        F.count(F.lit(1)).alias("_c"))
    cum = bucketed_prefix_sum(per_t, "_t", ["_t"], "_c",
                              n_buckets=scaled_buckets(df.sparkSession),
                              out_name="_cum", total_name="_n")
    cut = cum.filter(F.col("_cum") >= F.ceil(F.col("_n") * frac)) \
        .agg(F.min("_t").alias("cut")).collect()[0]["cut"]
    return df.filter(tcol <= cut), df.filter(tcol > cut)


def exact_auc(scored: DataFrame, *, score_col: str, label_col: str = "y") -> DataFrame:
    """Exact ROC AUC as a 1-row DataFrame aggregate via the
    Mann-Whitney U statistic: with average ranks r_i of the scores
    (ties averaged), AUC = (Σ_{y=1} r_i − n₊(n₊+1)/2) / (n₊·n₋).

    Why not BinaryClassificationEvaluator: above 1000 distinct scores
    it DOWNSAMPLES the curve by grouping score-sorted runs per
    partition, so the value depends on partition boundaries — not
    reproducible across engines or even partitionings. This form is
    exact and deterministic: per-score counts (one groupBy), a
    cumulative count through functions/ranking.bucketed_prefix_sum
    (no O(1)-partition window), and integer arithmetic throughout —
    2·rank stays integral, summed as DECIMAL(38,0), so the result is
    bit-reproducible anywhere (doubles only in the final division).

    Returns a 1-row DataFrame with a single ``auc`` double column
    (NaN when the label is single-class, matching the evaluator's
    degenerate behavior).
    """
    from ..functions.ranking import bucketed_prefix_sum, scaled_buckets

    spark = scored.sparkSession
    g = (scored.select(F.col(score_col).alias("_s"),
                       F.col(label_col).cast("long").alias("_y"))
         .groupBy("_s")
         .agg(F.count(F.lit(1)).alias("_c"), F.sum("_y").alias("_pos")))
    r = bucketed_prefix_sum(g, "_s", ["_s"], "_c",
                            n_buckets=scaled_buckets(spark),
                            out_name="_cum")
    # 2·avg_rank of the rows at this score = 2·(cum−c) + c + 1 (integer).
    # Every product below is computed IN decimal (cast the left factor
    # first): _pos·rank2, npos·(npos+1) and npos·nneg all exceed int64
    # in the 100 TB regime (c·2n ≳ 9.2e18), and non-ANSI Spark would
    # wrap the int64 product silently before a post-hoc cast could help.
    rank2 = 2 * (F.col("_cum") - F.col("_c")) + F.col("_c") + 1
    agg = r.agg(
        F.sum(F.col("_pos").cast("decimal(38,0)") * rank2).alias("_r2"),
        F.sum("_pos").alias("_np"), F.sum("_c").alias("_n"))
    npos, n = F.col("_np"), F.col("_n")
    nneg = n - npos
    num = (F.col("_r2").cast("decimal(38,0)")
           - npos.cast("decimal(38,0)") * (npos + 1)).cast("double")
    auc = F.when((npos > 0) & (nneg > 0),
                 num / (2.0 * npos.cast("double") * nneg.cast("double"))) \
        .otherwise(F.lit(float("nan")))
    return agg.select(auc.alias("auc"))


def train_and_eval(train: DataFrame, test: DataFrame, *,
                   max_rows_per_partition: int = 500_000,
                   tol: float = 1e-4):
    """StandardScaler + LogisticRegression (reference E5-E7) on the
    assembled feature vector; returns (model, metrics_df).

    ``tol`` is the L-BFGS convergence tolerance. The 1e-4 default
    mirrors the reference's sklearn pipeline; callers that pin the
    model against an independent solver (the q29 oracle) pass ~1e-12
    so Spark converges to the unique convex optimum rather than
    stopping a few 1e-4-sized steps away from it.

    Partition sizing: every L-BFGS iteration is one treeAggregate job
    over the train partitions, so a small dataset spread over many
    partitions pays iterations × partitions in task overhead. We cache
    the train set and coalesce it to ``ceil(n / max_rows_per_partition)``
    partitions — post-cache coalesce is shuffle-free and leaves the
    upstream (window-heavy) plan at full parallelism, while a 100 TB
    input keeps thousands of partitions (the cap only ever lowers
    partition count, never raises it).
    """
    import math

    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler
    from pyspark.ml.functions import vector_to_array

    train = train.persist()
    n_train = train.count()
    p = max(1, math.ceil(n_train / max_rows_per_partition))
    fit_input = train.coalesce(p) if p < train.rdd.getNumPartitions() else train

    pipe = Pipeline(stages=[
        VectorAssembler(inputCols=list(FEATURE_COLS), outputCol="raw_features"),
        StandardScaler(inputCol="raw_features", outputCol="features",
                       withMean=True, withStd=True),
        LogisticRegression(featuresCol="features", labelCol="y", maxIter=1000,
                           tol=tol),
    ])
    model = pipe.fit(fit_input)
    # Three consumers (accuracy, AUC, count) — score the holdout once.
    # Metrics are exact aggregations, not the MLlib evaluators:
    # accuracy is a plain hit-rate (bit-identical to the evaluator's
    # weighted form for 0/1 labels) and AUC is the exact Mann-Whitney
    # rank statistic — see exact_auc for why the binned evaluator
    # cannot be reproduced across engines.
    scored = model.transform(test).persist()
    n_test = scored.count()
    hits = scored.agg(
        F.sum((F.col("prediction") == F.col("y").cast("double"))
              .cast("long")).alias("h")).collect()[0]["h"] or 0
    acc = hits / n_test if n_test else float("nan")
    p1 = vector_to_array("probability").getItem(1)
    auc = exact_auc(scored.withColumn("_p1", p1), score_col="_p1",
                    label_col="y").collect()[0]["auc"]
    spark = train.sparkSession
    from ..catalog import literal_df
    metrics = literal_df(
        spark, [(float(acc), float(auc), n_train, n_test)],
        "accuracy double, auc double, n_train long, n_test long",
    )
    train.unpersist()
    scored.unpersist()
    return model, metrics


def now_signals(model, dataset: DataFrame, *, key: str, ts: str,
                prob_thr: float = 0.6, round_to: int = 6) -> DataFrame:
    """Score the latest row per key; fire LONG iff P(y=1) ≥ prob_thr
    and devdt < 0, ordered by probability (reference E8/B14).
    ``round_to`` quantizes the surfaced probability — oracle-pinned
    callers use a coarser grid than the solver-parity delta (q119's
    quantize-before-hash discipline)."""
    from pyspark.ml.functions import vector_to_array

    w = Window.partitionBy(key).orderBy(F.desc(ts))
    latest = dataset.withColumn("rn", F.row_number().over(w)) \
                    .filter(F.col("rn") == 1).drop("rn")
    scored = model.transform(latest)
    prob = vector_to_array("probability").getItem(1)
    return (
        scored.withColumn("prob", prob)
        .withColumn("signal",
                    F.when((F.col("prob") >= prob_thr) & (F.col("devdt") < 0),
                           "LONG").otherwise("NO TRADE"))
        .select(key, ts, F.round("prob", round_to).alias("prob"), "signal",
                "z", "devdt", "sigma")
        .orderBy(F.desc("prob"), key)
    )


def _doc_feature_cols() -> tuple[str, ...]:
    from ..functions.text import LANG_MARKERS

    return ("n_tokens", "avg_tok_len", "punct_r", "stop_r",
            *[f"marker_{lang}" for lang in LANG_MARKERS])


DOC_FEATURE_COLS = _doc_feature_cols()


def doc_features(docs: DataFrame, *, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Surface features for model-based quality filtering — pure
    expressions (functions/text.py), no Python in the scan. The
    marker-word rates are the fastText-style lexical features; the
    rest are the Gopher-style shape statistics."""
    from ..functions import text as tx

    t = F.col(text_col)
    toks = tx.tokens(t)
    n = F.size(toks)

    def marker_rate(markers):
        hits = F.size(F.filter(toks, lambda x: F.lower(x).isin(*markers)))
        return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))

    return docs.select(
        F.col(id_col),
        tx.token_count(t).cast("double").alias("n_tokens"),
        F.coalesce(tx.avg_token_len(t), F.lit(0.0)).alias("avg_tok_len"),
        F.coalesce(tx.punct_ratio(t), F.lit(0.0)).alias("punct_r"),
        F.coalesce(tx.stopword_ratio(t), F.lit(0.0)).alias("stop_r"),
        *[marker_rate(ms).alias(f"marker_{lang}")
          for lang, ms in tx.LANG_MARKERS.items()],
    )


def train_quality_filter(docs: DataFrame, *, positive,
                         id_col: str = "doc_id", text_col: str = "text",
                         max_rows_per_partition: int = 500_000,
                         tol: float = 1e-4, reg_param: float = 0.0):
    """Model-based quality filter — the fastText/CCNet-style component
    of a training-data pipeline: weak labels from metadata (``positive``
    is a boolean Column, e.g. membership in a curated seed corpus),
    surface features from the text, a distributed
    StandardScaler+LogisticRegression fit, and a per-document keep
    probability for downstream top-p%% curation.

    Returns (model, scored) where scored = (id, y, p_keep, pred) for
    EVERY document. Same L-BFGS cost model as train_and_eval: the
    train set is cached and coalesced so iterations do not multiply
    task overhead; at 100 TB the treeAggregate per iteration is the
    only corpus-wide pass.

    Reference analog: E5/E6 (`stable_fee_ml_bot.py:173-186` pyc)
    re-targeted from fee features to document features.
    """
    import math

    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    from .curation import hash_split

    feats = doc_features(docs, id_col=id_col, text_col=text_col) \
        .join(docs.select(F.col(id_col),
                          positive.cast("int").alias("y")), id_col)
    feats = hash_split(feats, key=id_col, salt="qf", train_pct=70,
                       val_pct=0)
    train = feats.filter(F.col("split") == "train").persist()
    n_train = train.count()
    p = max(1, math.ceil(n_train / max_rows_per_partition))
    fit_input = (train.coalesce(p)
                 if p < train.rdd.getNumPartitions() else train)

    pipe = Pipeline(stages=[
        VectorAssembler(inputCols=list(DOC_FEATURE_COLS),
                        outputCol="raw_features"),
        StandardScaler(inputCol="raw_features", outputCol="features",
                       withMean=True, withStd=True),
        LogisticRegression(featuresCol="features", labelCol="y",
                           maxIter=1000, tol=tol, regParam=reg_param),
    ])
    model = pipe.fit(fit_input)
    train.unpersist()

    from pyspark.ml.functions import vector_to_array

    p1 = vector_to_array("probability").getItem(1)
    scored = model.transform(feats).select(
        id_col, "y", "split", p1.alias("p_keep"),
        F.col("prediction").cast("int").alias("pred"))
    return model, scored
