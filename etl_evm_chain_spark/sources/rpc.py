"""Stdlib JSON-RPC client for live EVM extraction (SURVEY §2.A1/A2).

The reference dials an RPC node with bounded retries and calls
``eth_getLogs`` / ``eth_blockNumber`` per chunk (retry loop:
`/root/reference/internal/rpc/client.go:26-58,94-118`; defaults
3 attempts × 1500 ms: `/root/reference/internal/config/config.go:
135-140`). This is the concrete out-of-the-box implementation of the
pluggable ``Fetcher`` contract in ``evm_logs.fetch_logs`` — pure
stdlib (urllib), no extra dependencies, picklable so the client ships
to executors inside ``mapPartitions`` and each task talks to the node
for its own block slice.

Every RPC method retries ``attempts`` times with ``delay_ms`` sleeps
between attempts (none after the last), then re-raises the final
error — the same policy as the reference; Spark's task retry
(`spark.task.maxFailures`) layers on top exactly like the reference's
sink-level retry decorator.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from dataclasses import dataclass, field
from typing import Iterable

DEFAULT_ATTEMPTS = 3      # reference config.go:135-137
DEFAULT_DELAY_MS = 1500   # reference config.go:138-140


@dataclass(frozen=True)
class RetryConfig:
    attempts: int = DEFAULT_ATTEMPTS
    delay_ms: int = DEFAULT_DELAY_MS


class RpcError(RuntimeError):
    """JSON-RPC level error (the node answered with an error object)."""


@dataclass
class JsonRpcClient:
    """Minimal Ethereum JSON-RPC client over HTTP POST.

    Dataclass (url + config only) so instances pickle into Spark task
    closures; the urllib request is built per call, no live sockets
    held.
    """

    url: str
    retry: RetryConfig = field(default_factory=RetryConfig)
    timeout_s: float = 30.0

    def call(self, method: str, params: list) -> object:
        if self.retry.attempts < 1:
            raise ValueError(
                f"RetryConfig.attempts must be >= 1, got {self.retry.attempts}")
        payload = json.dumps({
            "jsonrpc": "2.0", "id": 1, "method": method, "params": params,
        }).encode()
        last: Exception | None = None
        for attempt in range(1, self.retry.attempts + 1):
            try:
                req = urllib.request.Request(
                    self.url, data=payload,
                    headers={"Content-Type": "application/json"})
                with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                    body = json.loads(resp.read().decode())
                if "error" in body and body["error"]:
                    raise RpcError(str(body["error"]))
                return body.get("result")
            except Exception as e:  # noqa: BLE001 — mirror blanket retry
                last = e
                if attempt < self.retry.attempts:
                    time.sleep(self.retry.delay_ms / 1000.0)
        raise last  # type: ignore[misc]

    # -- typed methods ----------------------------------------------------

    def latest_block(self) -> int:
        """Height probe (A2): ``eth_blockNumber``."""
        return int(str(self.call("eth_blockNumber", [])), 16)

    def get_logs(self, from_block: int, to_block: int,
                 addresses: tuple[str, ...] = (),
                 topic0s: tuple[str, ...] = ()) -> list[dict]:
        """``eth_getLogs`` over a block range with server-side address
        and topic0 filters (B1 pushdown, the reference's FilterQuery —
        `internal/indexer/indexer.go:223-235`), normalized to
        RAW_LOG_SCHEMA field names."""
        filt: dict = {
            "fromBlock": hex(from_block),
            "toBlock": hex(to_block),
        }
        if addresses:
            filt["address"] = list(addresses)
        if topic0s:
            filt["topics"] = [list(topic0s)]
        logs = self.call("eth_getLogs", [filt]) or []

        def hx(v, default=None):
            return default if v is None else int(str(v), 16)

        # Pending logs (blockNumber: null per the JSON-RPC spec) carry
        # no stable height; a range query should never see them, but a
        # non-conforming node must not kill the whole partition's task.
        return [
            {
                "address": lg.get("address"),
                "topics": lg.get("topics") or [],
                "data": lg.get("data"),
                "block_number": hx(lg.get("blockNumber")),
                "tx_hash": lg.get("transactionHash"),
                "log_index": hx(lg.get("logIndex"), 0),
            }
            for lg in logs
            if lg.get("blockNumber") is not None
        ]

    def get_block(self, number: int) -> dict | None:
        """``eth_getBlockByNumber`` (header only) → {block_number,
        timestamp, hash} — the reference's GetHeaderByNumber
        (`internal/rpc/client.go:124-148`), used for the block→ts dim
        and (hash) for the reorg-safe cursor's fork anchors."""
        blk = self.call("eth_getBlockByNumber", [hex(number), False])
        if blk is None:
            return None
        return {
            "block_number": int(str(blk.get("number")), 16),
            "timestamp": int(str(blk.get("timestamp")), 16),
            "hash": blk.get("hash"),
        }

    def get_transaction(self, tx_hash: str) -> dict | None:
        """``eth_getTransactionByHash`` → normalized field dict (ints
        decoded from hex), or None when the node doesn't know the
        hash. Feed the result to ``transaction_sender`` for the full
        reference ``types.Sender`` chain (fields → RLP sighash →
        secp256k1 recovery)."""
        tx = self.call("eth_getTransactionByHash", [tx_hash])
        if tx is None:
            return None

        def hx(v, default=None):
            return default if v is None else int(str(v), 16)

        return {
            "hash": tx.get("hash"),
            "nonce": hx(tx.get("nonce"), 0),
            "gas_price": hx(tx.get("gasPrice"), 0),
            "gas": hx(tx.get("gas"), 0),
            "to": tx.get("to"),
            "value": hx(tx.get("value"), 0),
            "input": tx.get("input") or "0x",
            "type": hx(tx.get("type"), 0),
            "chain_id": hx(tx.get("chainId")),
            "max_priority_fee": hx(tx.get("maxPriorityFeePerGas"), 0),
            "max_fee": hx(tx.get("maxFeePerGas"), 0),
            "access_list": tx.get("accessList") or [],
            "v": hx(tx.get("v")),
            "r": hx(tx.get("r")),
            "s": hx(tx.get("s")),
        }


    # -- Fetcher contract --------------------------------------------------

    def __call__(self, from_block: int, to_block: int,
                 addresses: tuple[str, ...],
                 topic0s: tuple[str, ...]) -> Iterable[dict]:
        """The ``evm_logs.Fetcher`` signature — pass a JsonRpcClient
        straight into ``fetch_logs(fetcher=client)``."""
        return self.get_logs(from_block, to_block, addresses, topic0s)


def transaction_sender(tx: dict | None) -> str | None:
    """Recover the sender address from a normalized RPC transaction
    dict (``JsonRpcClient.get_transaction`` output) — the pure-Python
    ``types.Sender`` (`internal/parser/parser.go:152-159`), covering
    legacy (type 0, EIP-155 or homestead) and typed EIP-2930/1559
    (types 1/2, v = raw yParity) envelopes. Unknown future types
    return None — the pre-landed transactions dim join covers them."""
    from .rlp import legacy_tx_sender, typed_sighash
    from .secp256k1 import recover_address

    if tx is None:
        return None
    if tx.get("v") is None or tx.get("r") is None or tx.get("s") is None:
        return None
    t = tx.get("type", 0)
    if t == 0:
        return legacy_tx_sender(
            nonce=tx["nonce"], gas_price=tx["gas_price"], gas=tx["gas"],
            to=tx.get("to"), value=tx["value"], data=tx.get("input", "0x"),
            v=tx["v"], r=tx["r"], s=tx["s"])
    if t in (1, 2):
        h = typed_sighash(
            tx_type=t, chain_id=tx.get("chain_id") or 1,
            nonce=tx["nonce"], gas=tx["gas"], to=tx.get("to"),
            value=tx["value"], data=tx.get("input", "0x"),
            access_list=tx.get("access_list"),
            gas_price=tx.get("gas_price", 0),
            max_priority_fee=tx.get("max_priority_fee", 0),
            max_fee=tx.get("max_fee", 0))
        return recover_address(h, tx["r"], tx["s"], tx["v"])
    return None
