"""Command-line surface mirroring the reference's entry points.

- ``index``      ← `go run cmd/indexer.go --config=config.yaml`, plus
  the documented-but-unimplemented --start-block/--rpc-url/
  --storage-type overrides (README.md:107-114).
- ``api``        ← `go run cmd/api.go` (REST job control plane).
- ``meanrevert`` ← `python analytics/stable_eth_meanrevert_bot.py`
  with the same flags/defaults (`:270-282`).
- ``feebot``     ← `python analytics/stable_fee_ml_bot.py` defaults
  (`:185-197` pyc).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="etl_evm_chain_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    ix = sub.add_parser("index", help="decode raw logs per a YAML config")
    ix.add_argument("--config", required=True)
    ix.add_argument("--raw-logs",
                    help="pre-landed raw-log parquet path; omit to fetch "
                         "live from the config/--rpc-url JSON-RPC endpoint")
    ix.add_argument("--start-block", type=int)
    ix.add_argument("--end-block", type=int,
                    help="last block for a live fetch "
                         "(default: eth_blockNumber)")
    ix.add_argument("--rpc-url")
    ix.add_argument("--storage-type", choices=["csv", "parquet", "jdbc"])
    ix.add_argument("--progress", help="cursor directory: run ONE "
                    "incremental catch-up step instead of a full scan "
                    "(reorg-safe when live: confirmation lag + hash-"
                    "anchored rewind)")
    ix.add_argument("--confirmations", type=int, default=12,
                    help="finality lag for --progress live mode")

    ap = sub.add_parser("api", help="serve the REST job API")
    ap.add_argument("--port", type=int, default=8080)

    mr = sub.add_parser("meanrevert", help="consensus mean-reversion backtest")
    mr.add_argument("--data", required=True, help="glob of *_Swap.csv files")
    mr.add_argument("--freq", type=int, default=60, help="grid seconds")
    mr.add_argument("--mode", choices=["pct", "zscore"], default="zscore")
    mr.add_argument("--threshold", type=float, default=0.5)
    mr.add_argument("--lookback", type=int, default=1440)
    mr.add_argument("--entry-z", type=float, default=2.0)
    mr.add_argument("--exit-z", type=float, default=0.5)
    mr.add_argument("--max-hold", type=int, default=10080)

    fb = sub.add_parser("feebot", help="fee-tier ML signal study")
    fb.add_argument("--data", required=True)
    fb.add_argument("--freq", type=int, default=10)
    fb.add_argument("--ema-hl", type=int, default=300)
    fb.add_argument("--std-win", type=int, default=300)
    fb.add_argument("--sigma-min", type=float, default=0.5)
    fb.add_argument("--horizon", type=int, default=120)
    fb.add_argument("--target-ticks", type=float, default=2.0)
    fb.add_argument("--prob-thr", type=float, default=0.6)
    fb.add_argument("--out", help="signals CSV output path")

    cu = sub.add_parser("curate", help="split/sample/pack a document corpus")
    cu.add_argument("--docs", required=True, help="documents parquet path")
    cu.add_argument("--out", required=True, help="output directory")
    cu.add_argument("--id-col", default="doc_id")
    cu.add_argument("--text-col", default="text")
    cu.add_argument("--train-pct", type=int, default=80)
    cu.add_argument("--val-pct", type=int, default=10)
    cu.add_argument("--sample", type=float,
                    help="keep only this fraction (hash-deterministic)")
    cu.add_argument("--context", type=int, default=2048,
                    help="pack length in tokens (0 disables packing)")

    args = p.parse_args(argv)

    from .session import get_spark
    spark = get_spark(f"cli-{args.cmd}")

    try:
        return _run(args, spark)
    except Exception as e:  # noqa: BLE001 — surface a clean one-liner, not a JVM trace
        msg = str(e).split("\n", 1)[0]
        print(f"error: {msg}", file=sys.stderr)
        return 2


def _run(args, spark) -> int:

    if args.cmd == "index":
        from .sources import config as cfg
        from .sources.abi import decode_event
        from .sources.evm_logs import read_raw_logs
        from .sources.sinks import write_event_csv, write_event_parquet
        c = cfg.apply_overrides(cfg.load(args.config),
                                start_block=args.start_block,
                                rpc_url=args.rpc_url,
                                storage_type=args.storage_type)
        if getattr(args, "progress", None) and c.storage_type != "parquet":
            # incremental layouts are parquet tables under
            # storage_path/<Contract>_<Event>/ (live mode additionally
            # partitioned by block_bucket) — not the CSV/JDBC sinks of
            # full-scan mode, and not interchangeable with it.
            print("index --progress requires storage.type: parquet",
                  file=sys.stderr)
            return 2
        if getattr(args, "progress", None) and not args.raw_logs:
            # reorg-safe incremental live indexing: one catch-up step
            # per invocation (cron/scheduler-friendly), cursor + hash
            # anchors under --progress/<Contract_Event>/
            import os as _os

            from .sources.evm_logs import fetch_logs
            from .sources.reorg import incremental_decode_reorg_safe
            from .sources.rpc import JsonRpcClient
            client = JsonRpcClient(c.rpc_url)
            latest = (args.end_block if args.end_block is not None
                      else client.latest_block())

            def get_hash(n: int):
                blk = client.get_block(n)
                return None if blk is None else blk.get("hash")

            for contract in c.contracts:
                for name, ev in contract.parsed_events.items():
                    table = f"{contract.name}_{name}"

                    def factory(frm, to, _ev=ev, _addr=contract.address):
                        return fetch_logs(
                            spark, start=frm, latest=to, fetcher=client,
                            addresses=[_addr] if _addr else None,
                            topic0s=[_ev.topic0], chunk=c.chunk_size)

                    r = incremental_decode_reorg_safe(
                        spark, raw_factory=factory,
                        progress_path=_os.path.join(args.progress, table),
                        out_dir=_os.path.join(c.storage_path, table),
                        decode=lambda df, _ev=ev, _cn=contract.name:
                            decode_event(df, _ev, contract_name=_cn),
                        latest=latest, get_block_hash=get_hash,
                        confirmations=args.confirmations,
                        start=c.start_block)
                    print(json.dumps({"table": table, **r}))
            return 0

        if args.raw_logs:
            raw = read_raw_logs(spark, args.raw_logs,
                                addresses=cfg.address_filter(c),
                                topic0s=cfg.topic0_filter(c))
            raw = raw.filter(f"block_number >= {c.start_block}")
            if getattr(args, "progress", None):
                # lake catch-up: plain watermark cursor (a landed lake
                # has no reorg surface; its maintainer has the hashes)
                import os as _os

                from .sources.progress import incremental_decode
                hi = raw.agg({"block_number": "max"}).collect()[0][0] or 0
                for contract in c.contracts:
                    for name, ev in contract.parsed_events.items():
                        table = f"{contract.name}_{name}"
                        n = incremental_decode(
                            spark, raw=raw,
                            progress_path=_os.path.join(args.progress,
                                                        table),
                            out_dir=_os.path.join(c.storage_path, table),
                            decode=lambda df, _ev=ev, _cn=contract.name:
                                decode_event(df, _ev, contract_name=_cn),
                            latest=int(hi), start=c.start_block)
                        print(json.dumps({"table": table, "rows": n}))
                return 0
        else:
            # live extraction: chunked eth_getLogs through the stdlib
            # JSON-RPC client (the reference's headline mode)
            from .sources.evm_logs import fetch_logs
            from .sources.rpc import JsonRpcClient
            client = JsonRpcClient(c.rpc_url)
            latest = (args.end_block if args.end_block is not None
                      else client.latest_block())
            raw = fetch_logs(spark, start=c.start_block, latest=latest,
                             fetcher=client,
                             addresses=cfg.address_filter(c),
                             topic0s=cfg.topic0_filter(c),
                             chunk=c.chunk_size)
            # the per-event decode loop runs one action per event
            # table; cache so the RPC sweep hits the node once, not
            # once per (contract, event)
            raw = raw.cache()
        n = 0
        for contract in c.contracts:
            for name, ev in contract.parsed_events.items():
                decoded = decode_event(raw, ev, contract_name=contract.name)
                if c.storage_type == "parquet":
                    write_event_parquet(decoded, c.storage_path)
                else:
                    write_event_csv(decoded.drop(*[
                        f.name for f in decoded.schema.fields
                        if f.dataType.typeName() == "decimal"]), c.storage_path)
                n += 1
        print(f"indexed {n} event tables to {c.storage_path}")
        return 0

    if args.cmd == "api":
        from .api import make_server
        server = make_server(spark, args.port)
        print(f"listening on :{args.port}")
        server.serve_forever()
        return 0

    if args.cmd == "meanrevert":
        from .pipelines import MeanRevertParams, meanrevert
        trades, monthly = meanrevert(spark, args.data, MeanRevertParams(
            freq_s=args.freq, mode=args.mode, threshold=args.threshold,
            lookback=args.lookback, entry_z=args.entry_z,
            exit_z=args.exit_z, max_hold=args.max_hold))
        rows = trades.collect()
        total_ret = sum(r["pct_return"] for r in rows)
        print(f"trades: {len(rows)}  total pct_return: {total_ret:.4f}")
        for r in monthly.collect()[-24:]:
            print(f"  {r['month']}: {r['pct_return']:+.4f} ({r['n_trades']} trades)")
        return 0

    if args.cmd == "feebot":
        from .pipelines import FeeMlParams, fee_ml
        metrics, signals = fee_ml(spark, args.data, FeeMlParams(
            freq_s=args.freq, ema_hl_s=args.ema_hl, std_win_s=args.std_win,
            sigma_min=args.sigma_min, horizon_s=args.horizon,
            target_ticks=args.target_ticks, prob_thr=args.prob_thr))
        m = metrics.collect()[0]
        print(json.dumps({"accuracy": m["accuracy"], "auc": m["auc"],
                          "n_train": m["n_train"], "n_test": m["n_test"]}))
        for r in signals.collect():
            print(f"  {r['pool']}: {r['signal']} (prob {r['prob']:.3f})")
        if args.out:
            from .sources.sinks import export_signals_csv
            export_signals_csv(signals, args.out)
        return 0

    if args.cmd == "curate":
        from pyspark.sql import functions as F

        from .functions.text import token_count
        from .operators.curation import (
            hash_split, pack_sequences, stratified_sample,
        )
        docs = spark.read.parquet(args.docs)
        if args.sample:
            docs = stratified_sample(docs, key=args.id_col,
                                     fraction=args.sample)
        out = hash_split(docs, key=args.id_col, train_pct=args.train_pct,
                         val_pct=args.val_pct)
        if args.context:
            out = out.withColumn("n_tok", token_count(args.text_col))
            out = pack_sequences(out, group="split", order=args.id_col,
                                 length="n_tok", context=args.context)
        # split is the natural read pattern (train readers never touch
        # val/test directories) → hive partitioning on it
        out.write.mode("overwrite").partitionBy("split").parquet(args.out)
        stats = (spark.read.parquet(args.out).groupBy("split")
                 .agg(F.count(F.lit(1)).alias("n")).collect())
        print(json.dumps({r["split"]: r["n"] for r in stats}))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
