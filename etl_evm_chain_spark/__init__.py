"""etl_evm_chain_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference system
``joacorob/etl-evm-chain`` (an EVM event-log indexer in Go plus
pandas backtest/ML analytics), extended with the operators a
large-scale (100 TB) training-data pipeline needs: deduplication,
similarity search, multimodal column plumbing and text analysis.

Layout
------
- ``session``    — tuned ``SparkSession`` builder (AQE, Arrow, UTC).
- ``catalog``    — table loading/registration for the synthetic fixtures.
- ``functions/`` — reusable column-level kits (timeseries, text, vectors, evm).
- ``operators/`` — relational/stateful operators (dedup, similarity,
                   backtest FSMs, EWM, ML plane, multimodal).
- ``sources/``   — scans & sinks (schema'd CSV with filename-regex
                   discovery, EVM raw-log decode pipeline, sinks).
- ``streaming/`` — Structured Streaming variants (incremental decode,
                   watermark dedup, stateful signal FSM).
- ``plans/``     — the named query registry consumed by
                   ``__spark_entry__`` (Spark callable + DuckDB oracle SQL).
"""

__version__ = "0.1.0"
