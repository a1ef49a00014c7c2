"""JSON-RPC client tests against a local fake HTTP node: typed
methods, retry policy, and the distributed fetch_logs path end-to-end
through real HTTP from executor tasks."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from etl_evm_chain_spark.sources.evm_logs import fetch_logs
from etl_evm_chain_spark.sources.rpc import JsonRpcClient, RetryConfig, RpcError


class _FakeNode(ThreadingHTTPServer):
    """Serves eth_blockNumber / eth_getLogs from a canned log store;
    optionally fails the first N requests with HTTP 503 (retry test)."""

    def __init__(self):
        super().__init__(("127.0.0.1", 0), _Handler)
        self.latest = 45
        self.fail_next = 0
        self.salts = {}            # block -> branch salt (reorg tests)
        self.lock = threading.Lock()
        # one log per block 0..latest, topic alternates
        self.logs = [
            {
                "address": f"0x{'ab' * 19}{i % 7:02x}",
                "topics": [f"0xt{i % 2}", f"0x{'00' * 31}{i % 5:02x}"],
                "data": "0x" + format(i * 10, "064x"),
                "blockNumber": hex(i),
                "transactionHash": f"0x{'cd' * 31}{i:02x}",
                "logIndex": "0x0",
            }
            for i in range(self.latest + 1)
        ]

    def block_hash(self, n: int) -> str:
        return f"0xh{n:08x}{self.salts.get(n, 'a')}"

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self.server_address[1]}"


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # keep pytest output clean
        pass

    def do_POST(self):
        srv: _FakeNode = self.server  # type: ignore[assignment]
        with srv.lock:
            if srv.fail_next > 0:
                srv.fail_next -= 1
                self.send_response(503)
                self.end_headers()
                return
        req = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        method, params = req["method"], req["params"]
        if method == "eth_blockNumber":
            result = hex(srv.latest)
        elif method == "eth_getTransactionByHash":
            result = getattr(srv, "txs", {}).get(params[0])
        elif method == "eth_getBlockByNumber":
            n = int(params[0], 16)
            result = ({"number": hex(n),
                       "timestamp": hex(1700000000 + n * 12),
                       "hash": srv.block_hash(n)}
                      if n <= srv.latest else None)
        elif method == "eth_getLogs":
            f = params[0]
            lo, hi = int(f["fromBlock"], 16), int(f["toBlock"], 16)
            topic0s = (f.get("topics") or [[]])[0]
            result = [
                lg for lg in srv.logs
                if lo <= int(lg["blockNumber"], 16) <= hi
                and (not f.get("address")
                     or lg["address"] in f["address"])
                and (not topic0s or lg["topics"][0] in topic0s)
            ]
        else:
            self._reply({"jsonrpc": "2.0", "id": req["id"],
                         "error": {"code": -32601, "message": "no method"}})
            return
        self._reply({"jsonrpc": "2.0", "id": req["id"], "result": result})

    def _reply(self, body: dict):
        data = json.dumps(body).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)


@pytest.fixture()
def node():
    srv = _FakeNode()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def test_latest_block_and_get_logs(node):
    cli = JsonRpcClient(node.url)
    assert cli.latest_block() == 45
    logs = cli.get_logs(10, 19)
    assert len(logs) == 10
    assert logs[0]["block_number"] == 10
    assert logs[0]["tx_hash"].startswith("0xcd")
    # server-side topic filter: only even blocks carry 0xt0
    only_t0 = cli.get_logs(10, 19, topic0s=("0xt0",))
    assert [lg["block_number"] for lg in only_t0] == [10, 12, 14, 16, 18]


def test_retry_recovers_after_transient_failures(node):
    cli = JsonRpcClient(node.url, retry=RetryConfig(attempts=3, delay_ms=10))
    node.fail_next = 2          # two 503s, third attempt succeeds
    assert cli.latest_block() == 45


def test_retry_exhausts_and_raises(node):
    cli = JsonRpcClient(node.url, retry=RetryConfig(attempts=2, delay_ms=10))
    node.fail_next = 5
    with pytest.raises(Exception):
        cli.latest_block()


def test_rpc_error_body_raises(node):
    cli = JsonRpcClient(node.url, retry=RetryConfig(attempts=1, delay_ms=1))
    with pytest.raises(RpcError):
        cli.call("eth_noSuchMethod", [])


def test_fetch_logs_through_real_http(spark, node):
    cli = JsonRpcClient(node.url, retry=RetryConfig(attempts=3, delay_ms=10))
    df = fetch_logs(spark, start=0, latest=cli.latest_block(),
                    fetcher=cli, topic0s=("0xt1",), chunk=10, tasks=4)
    rows = df.collect()
    # odd blocks 1..45 carry topic 0xt1
    assert sorted(r["block_number"] for r in rows) == list(range(1, 46, 2))
    assert all(r["topics"][0] == "0xt1" for r in rows)
    assert all(r["data"].startswith("0x") for r in rows)


def test_transaction_sender_full_chain(node):
    """eth_getTransactionByHash → normalized fields → RLP sighash →
    secp256k1 recovery: the full types.Sender chain over HTTP,
    checked against the EIP-155 example transaction's published
    signature and documented sender."""
    from etl_evm_chain_spark.sources import secp256k1 as ec
    from etl_evm_chain_spark.sources.rpc import transaction_sender

    node.txs = {"0xaaa": {
        "hash": "0xaaa", "nonce": "0x9",
        "gasPrice": hex(20_000_000_000), "gas": hex(21000),
        "to": "0x3535353535353535353535353535353535353535",
        "value": hex(10 ** 18), "input": "0x", "type": "0x0",
        "v": "0x25",
        "r": hex(18515461264373351373200002665853028612451056578545711640558177340181847433846),
        "s": hex(46948507304638947509940763649030358759909902576025900602547168820602576006531),
    }}
    # EIP-1559 (type 2) tx with an access list: sign its typed sighash
    # with a known key; v is the raw yParity
    from etl_evm_chain_spark.sources.rlp import typed_sighash

    al = [{"address": "0x" + "22" * 20,
           "storageKeys": ["0x" + "07" * 32]}]
    h2 = typed_sighash(tx_type=2, chain_id=5, nonce=3, gas=30000,
                       to="0x" + "33" * 20, value=12345, data="0xbeef",
                       access_list=al, max_priority_fee=2, max_fee=100)
    r2, s2, v27 = ec.sign(h2, 0xB0B, nonce=424242)
    node.txs["0xbbb"] = {
        "hash": "0xbbb", "nonce": "0x3", "gas": hex(30000),
        "to": "0x" + "33" * 20, "value": hex(12345), "input": "0xbeef",
        "type": "0x2", "chainId": "0x5",
        "maxPriorityFeePerGas": "0x2", "maxFeePerGas": hex(100),
        "accessList": al,
        "v": hex(v27 - 27), "r": hex(r2), "s": hex(s2),
    }
    node.txs["0xccc"] = dict(node.txs["0xbbb"], hash="0xccc",
                             type="0x9")    # unknown future type
    cli = JsonRpcClient(node.url)
    tx = cli.get_transaction("0xaaa")
    assert tx["nonce"] == 9 and tx["gas"] == 21000
    assert transaction_sender(tx) == ec.priv_to_address(
        0x4646464646464646464646464646464646464646464646464646464646464646)
    assert transaction_sender(cli.get_transaction("0xbbb")) \
        == ec.priv_to_address(0xB0B)
    assert transaction_sender(cli.get_transaction("0xccc")) is None
    assert cli.get_transaction("0xmissing") is None


def test_fetch_blocks_dim_and_enrich(spark, node):
    from etl_evm_chain_spark.sources.abi import enrich
    from etl_evm_chain_spark.sources.evm_logs import fetch_blocks

    cli = JsonRpcClient(node.url, retry=RetryConfig(attempts=2, delay_ms=10))
    raw = fetch_logs(spark, start=0, latest=9, fetcher=cli, chunk=5)
    blocks = fetch_blocks(spark, raw, fetcher=cli)
    got = {r["block_number"]: r["timestamp"] for r in blocks.collect()}
    assert got == {i: 1700000000 + i * 12 for i in range(10)}
    # broadcast-join enrichment attaches the live timestamps
    enriched = enrich(raw.select("block_number", "tx_hash"), blocks=blocks)
    rows = enriched.collect()
    assert all(r["timestamp"] == 1700000000 + r["block_number"] * 12
               for r in rows)
