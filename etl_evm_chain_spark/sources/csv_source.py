"""Analytics CSV source (SURVEY §2.A9/A10).

The reference bots read ``{STABLE}ETH{FEE}_Swap.csv`` files with
``pd.read_csv(usecols=…, on_bad_lines="skip")`` and derive the pool /
pair / fee from the *filename* via regex
(`analytics/stable_eth_meanrevert_bot.py:38,52-62`;
`stable_fee_ml_bot.py:67-95` pyc). Spark shape: one schema'd read over
the glob (malformed rows dropped by the parser, not pandas), with
``input_file_name()`` + ``regexp_extract`` turning the filename into
proper columns — so "which file" becomes an ordinary predicate that
Catalyst can prune on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SWAP_SCHEMA = T.StructType([
    T.StructField("timestamp", T.LongType()),   # unix seconds
    T.StructField("tick", T.IntegerType()),
    T.StructField("tx_hash", T.StringType()),
])

# meanrevert naming: (?P<stable>DAI|USDC|USDT)ETH(?P<fee>100|500|3000)_Swap.csv
STABLE_ETH_RE = r"(DAI|USDC|USDT)ETH(100|500|3000)_Swap\.csv$"
# ML-bot naming: (?P<A>…)(?P<B>…)(?P<fee>…)_Swap.csv
PAIR_RE = r"([A-Z]+?)(ETH|BTC|USDC|USDT|DAI)(100|500|3000|10000)_Swap\.csv$"


def read_swap_csvs(spark: SparkSession, glob_path: str) -> DataFrame:
    """Schema'd, malformed-tolerant read of swap CSVs with filename
    metadata columns (pool = STABLE/ETH:FEE, like the reference's
    pool naming `stable_eth_meanrevert_bot.py:80-82`)."""
    fname = F.element_at(F.split(F.input_file_name(), "/"), -1)
    df = (
        spark.read.schema(SWAP_SCHEMA)
        .option("header", True)
        .option("mode", "DROPMALFORMED")
        .csv(glob_path)
        .withColumn("stable", F.regexp_extract(fname, STABLE_ETH_RE, 1))
        .withColumn("fee", F.regexp_extract(fname, STABLE_ETH_RE, 2))
    )
    return (
        df.filter(F.col("stable") != "")  # filename must match the pattern
        .withColumn("pool", F.concat_ws("", F.upper("stable"), F.lit("/ETH:"),
                                        F.col("fee")))
        .na.drop(subset=["timestamp", "tick"])                   # B4
        .withColumn("ts", F.timestamp_seconds("timestamp"))      # B6
    )


def normalize_polarity(df: DataFrame, *, key: str = "pool",
                       tick: str = "tick") -> DataFrame:
    """Orientation normalization (B9): flip each pool's tick sign when
    its median ≥ 0 (`stable_eth_meanrevert_bot.py:85-88`), so every
    series quotes the same direction."""
    med = df.groupBy(key).agg(F.median(tick).alias("_med"))
    sign = F.when(F.col("_med") >= 0, -1).otherwise(1)
    return (
        df.join(F.broadcast(med), key)
        .withColumn(tick, (sign * F.col(tick)).cast("int"))
        .drop("_med")
    )


def tick_to_price(tick):
    """price = 1.0001^tick (`stable_eth_meanrevert_bot.py:39,115`)."""
    c = F.col(tick) if isinstance(tick, str) else tick
    return F.pow(F.lit(1.0001), c)
