"""EVM-plane tests: keccak vectors, ABI schema compilation, decoding
(incl. >63-bit values and signed sign-extension), the chunked source,
config loading, and the partitioned CSV sink."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from etl_evm_chain_spark.sources import config as cfg
from etl_evm_chain_spark.sources.abi import (
    AbiEvent,
    AbiInput,
    RAW_LOG_SCHEMA,
    decode_event,
    event_schema,
    parse_abi,
    route_events,
)
from etl_evm_chain_spark.sources.evm_logs import block_chunks, fetch_logs
from etl_evm_chain_spark.sources.keccak import keccak256_hex
from etl_evm_chain_spark.sources.sinks import write_event_csv

TRANSFER_TOPIC0 = "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"


def test_keccak_known_vectors():
    assert keccak256_hex(b"") == (
        "0xc5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert keccak256_hex("Transfer(address,address,uint256)") == TRANSFER_TOPIC0


def test_abi_parse_and_schema():
    abi = json.dumps([
        {"type": "event", "name": "Transfer", "inputs": [
            {"name": "from", "type": "address", "indexed": True},
            {"name": "to", "type": "address", "indexed": True},
            {"name": "value", "type": "uint256", "indexed": False},
        ]},
        {"type": "function", "name": "transfer"},  # ignored
    ])
    events = parse_abi(abi)
    assert list(events) == ["Transfer"]
    ev = events["Transfer"]
    assert ev.signature == "Transfer(address,address,uint256)"
    assert ev.topic0 == TRANSFER_TOPIC0
    schema = event_schema(ev)
    names = [f.name for f in schema.fields]
    assert names[:4] == ["chain_id", "contract", "contract_name", "event_name"]
    assert "value" in names and "value_hex" in names  # dual-column uint256


SWAPISH = AbiEvent("Swapish", (
    AbiInput("sender", "address", True),
    AbiInput("amount", "uint256", False),
    AbiInput("tick", "int24", False),
))


def _word(v: int, bits: int = 256) -> str:
    return format(v % (1 << 256), "064x")


def _mklog(topics, data_words, block=1, txh="0x" + "ab" * 32, idx=0):
    return ("0x" + "11" * 20, topics, "0x" + "".join(data_words), block, txh, idx)


def test_decode_uint256_and_negative_int24(spark):
    big = 2**200 + 12345            # needs the pandas big-int path
    neg_tick = -887272              # min Uniswap tick, two's complement
    log = _mklog(
        [SWAPISH.topic0, "0x" + _word(0xDEAD)],
        [_word(big), _word(neg_tick)],
    )
    df = spark.createDataFrame([log], RAW_LOG_SCHEMA)
    out = decode_event(df, SWAPISH, contract_name="Pool").collect()[0]
    assert out["sender"] == "0x" + "0" * 36 + "dead"
    assert out["amount"] is None              # > 38 digits → NULL, hex lossless
    assert int(out["amount_hex"], 16) == big
    assert out["tick"] == neg_tick
    assert out["event_name"] == "Swapish" and out["contract_name"] == "Pool"


def test_decode_uint256_fits_decimal(spark):
    v = 10**30 + 7
    log = _mklog([SWAPISH.topic0, "0x" + _word(1)], [_word(v), _word(5)])
    df = spark.createDataFrame([log], RAW_LOG_SCHEMA)
    out = decode_event(df, SWAPISH).collect()[0]
    assert int(out["amount"]) == v
    assert out["tick"] == 5


def test_topic_filter_drops_foreign_events(spark):
    other = AbiEvent("Other", (AbiInput("x", "uint32", False),))
    logs = [
        _mklog([SWAPISH.topic0, "0x" + _word(1)], [_word(10), _word(1)]),
        _mklog([other.topic0], [_word(99)], idx=1),
    ]
    df = spark.createDataFrame(logs, RAW_LOG_SCHEMA)
    assert decode_event(df, SWAPISH).count() == 1
    routed = route_events(df, {"Swapish": SWAPISH, "Other": other})
    names = {r["log_index"]: r["event_name"] for r in routed.collect()}
    assert names == {0: "Swapish", 1: "Other"}


def test_block_chunks_and_fetch(spark):
    chunks = block_chunks(spark, 0, 2499, chunk=1000).collect()
    assert [(c["from_block"], c["to_block"]) for c in sorted(chunks, key=lambda r: r["from_block"])] == [
        (0, 999), (1000, 1999), (2000, 2499)]

    def fake_fetcher(frm, to, addresses, topic0s):
        # one log per 500-block stride, honoring the pushed-down filter
        for b in range(frm, to + 1):
            if b % 500 == 0:
                yield {"address": addresses[0] if addresses else "0x00",
                       "topics": list(topic0s) or ["0x0"], "data": "0x",
                       "block_number": b, "tx_hash": f"0x{b:064x}",
                       "log_index": 0}

    out = fetch_logs(spark, start=0, latest=2499, fetcher=fake_fetcher,
                     addresses=("0xabc",), topic0s=(TRANSFER_TOPIC0,))
    rows = sorted(r["block_number"] for r in out.collect())
    assert rows == [0, 500, 1000, 1500, 2000]
    assert out.schema == RAW_LOG_SCHEMA


def test_config_load_and_overrides(tmp_path):
    abi_path = tmp_path / "token.json"
    abi_path.write_text(json.dumps([
        {"type": "event", "name": "Transfer", "inputs": [
            {"name": "from", "type": "address", "indexed": True},
            {"name": "to", "type": "address", "indexed": True},
            {"name": "value", "type": "uint256", "indexed": False}]},
    ]))
    yml = tmp_path / "config.yaml"
    yml.write_text(f"""
rpc_url: http://localhost:8545
start_block: 100
storage:
  type: csv
  path: ./out
contracts:
  - name: USDC
    address: "0xA0b86991c6218b36c1d19D4a2e9Eb0cE3606eB48"
    abi: token.json
    events: [Transfer]
""")
    c = cfg.load(str(yml))
    assert c.start_block == 100 and c.chunk_size == cfg.DEFAULT_CHUNK_SIZE
    assert c.contracts[0].address == "0xa0b86991c6218b36c1d19d4a2e9eb0ce3606eb48"
    assert cfg.topic0_filter(c) == (TRANSFER_TOPIC0,)
    c2 = cfg.apply_overrides(c, start_block=5, storage_type="parquet")
    assert c2.start_block == 5 and c2.storage_type == "parquet"
    try:
        cfg.apply_overrides(c, storage_type="bogus")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_csv_sink_partitions_by_event(spark, tmp_path):
    log = _mklog([SWAPISH.topic0, "0x" + _word(2)], [_word(42), _word(7)])
    df = decode_event(spark.createDataFrame([log], RAW_LOG_SCHEMA),
                      SWAPISH, contract_name="Pool")
    out = str(tmp_path / "sink")
    write_event_csv(df.drop("amount"), out)  # csv has no decimal; hex is lossless
    part = os.path.join(out, "contract_name=Pool", "event_name=Swapish")
    assert os.path.isdir(part)
    back = spark.read.option("header", True).csv(part)
    assert back.count() == 1 and int(back.collect()[0]["tick"]) == 7


def test_balance_ledger_invariants(spark):
    from etl_evm_chain_spark.plans.evm import q_balance_ledger

    rows = q_balance_ledger(spark, "/root/testdata/sf0.001").collect()
    assert 0 < len(rows) <= 25
    for r in rows:
        # final running balance == net, so the peak/trough bracket it
        assert r["peak_balance"] >= r["net_balance"] >= r["trough_balance"]
        assert r["n_in"] >= 0 and r["n_out"] >= 0
    # top-25 by net_balance is descending
    nets = [r["net_balance"] for r in rows]
    assert nets == sorted(nets, reverse=True)


MEMO = AbiEvent("Memo", (
    AbiInput("sender", "address", True),
    AbiInput("note", "string", False),
    AbiInput("amount", "uint256", False),
    AbiInput("tags", "uint32[]", False),
))


def _w(x: int) -> str:
    return format(x, "064x")


def _memo_raw(spark, data: str):
    return spark.createDataFrame(
        [("0xAbc0000000000000000000000000000000000abc",
          [MEMO.topic0, "0x" + "0" * 24 + "deadbeef" * 5],
          data, 100, "0xtx", 0)],
        RAW_LOG_SCHEMA)


def test_decode_dynamic_string_and_array(spark):
    # head: [0x60 note-offset][amount][0xa0 tags-offset]
    # tails: [5]["hello"·rpad] / [2][7][9]
    data = ("0x" + _w(0x60) + _w(1234) + _w(0xA0)
            + _w(5) + "68656c6c6f" + "0" * 54
            + _w(2) + _w(7) + _w(9))
    r = decode_event(_memo_raw(spark, data), MEMO).collect()[0]
    assert r["sender"] == "0xdeadbeefdeadbeefdeadbeefdeadbeefdeadbeef"
    assert r["note"] == "hello"
    assert int(r["amount"]) == 1234
    assert r["tags"] == [7, 9]


def test_decode_dynamic_empty_tails(spark):
    data = "0x" + _w(0x60) + _w(0) + _w(0x80) + _w(0) + _w(0)
    r = decode_event(_memo_raw(spark, data), MEMO).collect()[0]
    assert r["note"] == "" and int(r["amount"]) == 0 and r["tags"] == []


def test_decode_dynamic_multiword_string(spark):
    # 40-byte string spans two tail words; tags offset shifts to 0xc0
    s = b"abcdefghijklmnopqrstuvwxyz0123456789ABCD"
    assert len(s) == 40
    data = ("0x" + _w(0x60) + _w(1) + _w(0xC0)
            + _w(40) + s.hex() + "0" * (128 - 80)
            + _w(1) + _w(42))
    r = decode_event(_memo_raw(spark, data), MEMO).collect()[0]
    assert r["note"] == s.decode() and r["tags"] == [42]


def test_decode_bytes_and_static_fixed_array(spark):
    ev = AbiEvent("Blob", (
        AbiInput("payload", "bytes", False),
        AbiInput("pair", "int32[2]", False),
    ))
    # head: [offset payload][pair[0]][pair[1]] — the fixed array is
    # inline (2 slots), so payload's tail starts at 3*32 = 0x60
    data = ("0x" + _w(0x60) + _w(0xFFFFFFFF) + _w(2 ** 32 - 5)
            + _w(3) + "a1b2c3" + "0" * 58)
    raw = _memo_raw(spark, data)
    r = decode_event(raw.withColumn(
        "topics", F.array(F.lit(ev.topic0))), ev).collect()[0]
    assert r["payload"] == "0xa1b2c3"
    assert r["pair"] == [-1, -5]          # two's complement int32


def test_decode_indexed_dynamic_is_topic_hash(spark):
    ev = AbiEvent("Named", (
        AbiInput("name", "string", True),      # topic = keccak(name)
        AbiInput("v", "uint8", False),
    ))
    topic1 = "0x" + "ab" * 32
    raw = spark.createDataFrame(
        [("0xc", [ev.topic0, topic1], "0x" + _w(7), 1, "0xt", 0)],
        RAW_LOG_SCHEMA)
    r = decode_event(raw, ev).collect()[0]
    assert r["name"] == topic1 and r["v"] == 7


def test_uint32_decodes_above_int_range(spark):
    ev = AbiEvent("U", (AbiInput("x", "uint32", False),))
    raw = spark.createDataFrame(
        [("0xc", [ev.topic0], "0x" + _w(2 ** 32 - 1), 1, "0xt", 0)],
        RAW_LOG_SCHEMA)
    r = decode_event(raw, ev).collect()[0]
    assert r["x"] == 2 ** 32 - 1          # LongType: no int32 overflow


def test_int64_decodes_exact_min(spark):
    ev = AbiEvent("I", (AbiInput("x", "int64", False),))
    word = _w((-(2 ** 63)) % (1 << 256))  # sign-extended two's complement
    raw = spark.createDataFrame(
        [("0xc", [ev.topic0], "0x" + word, 1, "0xt", 0)], RAW_LOG_SCHEMA)
    r = decode_event(raw, ev).collect()[0]
    assert r["x"] == -(2 ** 63)


def test_secp256k1_known_privkey_addresses():
    from etl_evm_chain_spark.sources import secp256k1 as ec

    # widely published vectors: addresses of private keys 1 and 2
    assert ec.priv_to_address(1) == \
        "0x7e5f4552091a69125d5dfcb7b8c2659029395bdf"
    assert ec.priv_to_address(2) == \
        "0x2b5ad5c4795c026514f8317c7a215e218dccd6cf"


def test_secp256k1_sign_recover_roundtrip():
    from etl_evm_chain_spark.sources import secp256k1 as ec
    from etl_evm_chain_spark.sources.keccak import keccak256

    h = keccak256(b"transfer 42 wei")
    for priv in (1, 0xDEADBEEF, 98765432109876543210987654321):
        for nonce in (7, 999999937, ec.N - 3):
            r, s, v = ec.sign(h, priv, nonce)
            assert s <= ec.N // 2          # Ethereum low-s rule
            assert ec.recover_address(h, r, s, v) == ec.priv_to_address(priv)
    # EIP-155 v encoding normalizes to the same parity
    r, s, v = ec.sign(h, 5, 11)
    v155 = 1 * 2 + 35 + (v - 27)
    assert ec.recover_address(h, r, s, v155) == ec.priv_to_address(5)


def test_recover_sender_udf_and_invalid_rows(spark):
    from etl_evm_chain_spark.sources import secp256k1 as ec
    from etl_evm_chain_spark.sources.abi import recover_sender
    from etl_evm_chain_spark.sources.keccak import keccak256

    h = keccak256(b"payload")
    r, s, v = ec.sign(h, 3, 17)
    rows = [
        ("0x" + h.hex(), format(r, "x"), format(s, "x"), v),
        ("0x" + h.hex(), "0", format(s, "x"), v),       # r=0 → invalid
        (None, format(r, "x"), format(s, "x"), v),      # null hash
    ]
    df = spark.createDataFrame(
        rows, "sig_hash string, r string, s string, v int")
    got = [x["tx_from"] for x in recover_sender(df).collect()]
    assert got[0] == ec.priv_to_address(3)
    assert got[1] is None and got[2] is None


def test_jdbc_sink_roundtrip_embedded_derby(spark, tmp_path):
    """A7 smoke: write_event_jdbc against the Derby engine bundled
    with Spark (embedded, in-JVM — no server needed), read back via
    the JDBC source and compare."""
    from etl_evm_chain_spark.sources.sinks import write_event_jdbc

    db = str(tmp_path / "eventdb")
    url = f"jdbc:derby:{db};create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    df = spark.createDataFrame(
        [("0xaaa", 1, 100), ("0xbbb", 2, 250)],
        "contract string, log_index int, value long").coalesce(1)
    write_event_jdbc(df, url, event_name="transfer", mode="overwrite",
                     driver=driver)
    back = (spark.read.format("jdbc")
            .option("url", url).option("driver", driver)
            .option("dbtable", "event_transfer").load())
    got = sorted((r["contract"], r["log_index"], r["value"])
                 for r in back.collect())
    assert got == [("0xaaa", 1, 100), ("0xbbb", 2, 250)]


def test_rlp_published_vectors():
    # golden vectors from the Ethereum RLP spec
    from etl_evm_chain_spark.sources.rlp import encode

    assert encode("dog") == bytes.fromhex("83646f67")
    assert encode(["cat", "dog"]) == bytes.fromhex("c88363617483646f67")
    assert encode("") == b"\x80"
    assert encode(0) == b"\x80"
    assert encode(15) == b"\x0f"
    assert encode(1024) == bytes.fromhex("820400")
    assert encode([]) == b"\xc0"
    assert encode([[], [[]], [[], [[]]]]) == bytes.fromhex("c7c0c1c0c3c0c1c0")
    long = "Lorem ipsum dolor sit amet, consectetur adipisicing elit"
    assert encode(long) == b"\xb8\x38" + long.encode()


def test_legacy_tx_sender_roundtrip():
    # sign a legacy tx's EIP-155 sighash with a known key, then the
    # full raw-fields → sender path must recover the same address
    from etl_evm_chain_spark.sources import secp256k1 as ec
    from etl_evm_chain_spark.sources.rlp import legacy_sighash, legacy_tx_sender

    fields = dict(nonce=9, gas_price=20_000_000_000, gas=21000,
                  to="0x3535353535353535353535353535353535353535",
                  value=10 ** 18, data=b"")
    h = legacy_sighash(**fields, chain_id=1)
    r, s, v27 = ec.sign(h, 0x4646464646464646464646464646464646464646464646464646464646464646,
                        nonce=7777)
    v = 1 * 2 + 35 + (v27 - 27)          # EIP-155 encoding
    got = legacy_tx_sender(**fields, v=v, r=r, s=s)
    assert got == ec.priv_to_address(
        0x4646464646464646464646464646464646464646464646464646464646464646)


def test_eip155_spec_vector_sighash():
    # the EIP-155 example transaction: its documented signing hash
    from etl_evm_chain_spark.sources.rlp import legacy_sighash

    h = legacy_sighash(nonce=9, gas_price=20_000_000_000, gas=21000,
                       to="0x3535353535353535353535353535353535353535",
                       value=10 ** 18, data=b"", chain_id=1)
    assert h.hex() == ("daf5a779ae972f972197303d7b574746c7ef83eadac0f2791ad23db92e4c8e53")


def test_eip155_spec_vector_full_recovery():
    # the EIP-155 example's PUBLISHED signature (v=37, r, s) must
    # recover the documented sender — an external golden for the whole
    # rlp → keccak → secp256k1 chain
    from etl_evm_chain_spark.sources import secp256k1 as ec
    from etl_evm_chain_spark.sources.rlp import legacy_tx_sender

    got = legacy_tx_sender(
        nonce=9, gas_price=20_000_000_000, gas=21000,
        to="0x3535353535353535353535353535353535353535",
        value=10 ** 18, data=b"", v=37,
        r=18515461264373351373200002665853028612451056578545711640558177340181847433846,
        s=46948507304638947509940763649030358759909902576025900602547168820602576006531)
    assert got == ec.priv_to_address(
        0x4646464646464646464646464646464646464646464646464646464646464646)


def _abi_encode_memo(note: str, amount: int, tags: list[int]) -> str:
    """Independent reference encoder for Memo(string,uint256,uint32[])
    data blobs (head/tail offset layout per the ABI spec) — written
    from the spec, NOT from the decoder, so the roundtrip test is a
    genuine differential check."""
    def w(x: int) -> str:
        return format(x, "064x")

    nb = note.encode("utf-8")
    # payload right-padded to a 32-byte multiple; an EMPTY payload has
    # no padding word at all (spec: enc("") is just the length word)
    note_tail = w(len(nb)) + nb.hex().ljust(((len(nb) + 31) // 32) * 64, "0")
    tags_tail = w(len(tags)) + "".join(w(t) for t in tags)
    head_size = 3 * 32
    note_off = head_size
    tags_off = head_size + len(note_tail) // 2
    return "0x" + w(note_off) + w(amount) + w(tags_off) + note_tail + tags_tail


def test_dynamic_abi_randomized_roundtrip(spark):
    """50 seeded random Memo payloads — unicode strings, empty/long
    arrays, boundary uint256 values — encoded by the independent
    test encoder must decode back exactly."""
    import random

    rng = random.Random(20260814)
    alphabet = "abc XYZ 012 αβγ δ € 漢字 🚀 -—"
    cases = []
    for i in range(50):
        note = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        amount = rng.choice([0, 1, 255, 2**63 - 1, 10**37, 2**200,
                             rng.getrandbits(100)])
        tags = [rng.getrandbits(32) for _ in range(rng.randint(0, 12))]
        cases.append((i, note, amount, tags))
    raw = spark.createDataFrame(
        [(f"0x{'ab'*20}", [MEMO.topic0, "0x" + "00" * 32],
          _abi_encode_memo(n, a, t), i, f"0xt{i}", 0)
         for i, n, a, t in cases],
        RAW_LOG_SCHEMA)
    got = {r["block_number"]: r
           for r in decode_event(raw.withColumn(
               "topics", F.array(F.lit(MEMO.topic0),
                                 F.lit("0x" + "00" * 32))), MEMO).collect()}
    for i, note, amount, tags in cases:
        r = got[i]
        assert r["note"] == note, (i, r["note"], note)
        if amount < 10**38:
            assert int(r["amount"]) == amount
        else:
            assert r["amount"] is None     # saturates; hex stays lossless
        assert r["amount_hex"] == "0x" + format(amount, "064x")
        assert [int(t) for t in r["tags"]] == tags


def _abi_encode_string_array(strs: list[str]) -> str:
    """Reference encoder for a string[] tail body (spec tuple rule:
    per-element offsets relative to the tuple-encoding start)."""
    def w(x: int) -> str:
        return format(x, "064x")

    tails = []
    for s in strs:
        b = s.encode("utf-8")
        tails.append(w(len(b)) + b.hex().ljust(((len(b) + 31) // 32) * 64, "0"))
    offs, acc = [], 32 * len(strs)
    for t in tails:
        offs.append(acc)
        acc += len(t) // 2
    return w(len(strs)) + "".join(w(o) for o in offs) + "".join(tails)


def test_decode_string_array_param(spark):
    ev = AbiEvent("Batch", (
        AbiInput("notes", "string[]", False),
        AbiInput("v", "uint8", False),
    ))
    cases = [
        ["alpha", "βγδ €", "", "x" * 45],     # multibyte, empty, 2-word
        [],                                     # empty array
        ["solo"],
    ]
    def w(x): return format(x, "064x")
    rows = []
    for i, strs in enumerate(cases):
        body = _abi_encode_string_array(strs)
        data = "0x" + w(0x40) + w(i + 1) + body
        rows.append(("0xc", [ev.topic0], data, i, f"0xt{i}", 0))
    raw = spark.createDataFrame(rows, RAW_LOG_SCHEMA)
    got = {r["block_number"]: r for r in decode_event(raw, ev).collect()}
    for i, strs in enumerate(cases):
        assert got[i]["notes"] == strs, (i, got[i]["notes"])
        assert got[i]["v"] == i + 1


def test_decode_dynamic_param_named_data_with_array(spark):
    """A decoded param literally named 'data' (cf. ERC777 Sent) must
    not collide with the raw blob column the array stage carries."""
    ev = AbiEvent("Executed", (
        AbiInput("data", "bytes", False),
        AbiInput("targets", "uint32[]", False),
    ))
    # head: [0x40][0x80]; tails: bytes len 3 = 0xaabbcc; uint32[] = [7]
    words = [_word(0x40), _word(0x80), _word(3),
             "aabbcc" + "0" * 58, _word(1), _word(7)]
    log = _mklog([ev.topic0], words)
    out = decode_event(
        spark.createDataFrame([log], RAW_LOG_SCHEMA), ev).collect()[0]
    assert out["data"] == "0xaabbcc"
    assert out["targets"] == [7]


# ---------------------------------------------------------------------------
# Tuple (struct) decoding — round-3 extension of the staged decoder.
# _spec_encode is an INDEPENDENT reference encoder implementing the
# ABI spec head/tail rules directly (offsets relative to each
# enclosing tuple encoding), so decode tests are true round-trips.
# ---------------------------------------------------------------------------

def _spec_encode_one(inp, v) -> tuple[str, str | None]:
    """Returns (head_words, tail) hex; tail None for static types."""
    import re as _re

    t = inp.type
    m = _re.match(r"^(.*)\[(\d*)\]$", t)

    def is_dyn(i):
        from etl_evm_chain_spark.sources.abi import _is_dynamic_i
        return _is_dynamic_i(i)

    if t == "string":
        b = v.encode("utf-8")
        return "", _w(len(b)) + b.hex().ljust(((len(b) + 31) // 32) * 64, "0")
    if t == "bytes":
        b = bytes.fromhex(v[2:])
        return "", _w(len(b)) + b.hex().ljust(((len(b) + 31) // 32) * 64, "0")
    if m:
        elem = AbiInput(inp.name, m.group(1), False, inp.components)
        body = _spec_encode_tuple([elem] * len(v), list(v))
        if m.group(2) == "":
            return "", _w(len(v)) + body
        if is_dyn(inp):
            return "", body
        return body, None
    if t == "tuple":
        body = _spec_encode_tuple(list(inp.components), list(v))
        if is_dyn(inp):
            return "", body
        return body, None
    if t == "address":
        return _w(int(v, 16)), None
    if t == "bool":
        return _w(int(v)), None
    if t.startswith("uint") or t.startswith("int"):
        return format(v % (1 << 256), "064x"), None
    raise NotImplementedError(t)


def _spec_encode_tuple(inputs, values) -> str:
    parts = [_spec_encode_one(i, v) for i, v in zip(inputs, values)]
    heads, tails, dyn_idx = [], [], []
    for head, tail in parts:
        if tail is None:
            heads.append(head)
        else:
            heads.append(None)  # offset placeholder
            dyn_idx.append(len(heads) - 1)
            tails.append(tail)
    head_len = sum(64 if h is None else len(h) for h in heads) // 2
    acc, offs = head_len, []
    for tail in tails:
        offs.append(acc)
        acc += len(tail) // 2
    out = []
    ti = 0
    for h in heads:
        if h is None:
            out.append(_w(offs[ti]))
            ti += 1
        else:
            out.append(h)
    return "".join(out) + "".join(tails)


def _spec_encode_data(event, values) -> str:
    unindexed = [i for i in event.inputs if not i.indexed]
    return "0x" + _spec_encode_tuple(list(unindexed), values)


SWAP_T = AbiEvent("SwapT", (
    AbiInput("pool", "address", True),
    AbiInput("trader", "tuple", False, (
        AbiInput("addr", "address", False),
        AbiInput("qty", "uint64", False),
    )),
    AbiInput("meta", "tuple", False, (
        AbiInput("note", "string", False),
        AbiInput("tags", "uint32[]", False),
    )),
    AbiInput("fee", "uint64", False),
))


def test_tuple_signature_canonicalization():
    assert SWAP_T.signature == \
        "SwapT(address,(address,uint64),(string,uint32[]),uint64)"


def test_tuple_event_schema():
    sch = event_schema(SWAP_T)
    f = {x.name: x.dataType for x in sch.fields}
    # uint64 needs unsigned headroom beyond a signed long → decimal
    assert f["trader"].simpleString() == \
        "struct<addr:string,qty:decimal(38,0)>"
    assert f["meta"].simpleString() == \
        "struct<note:string,tags:array<bigint>>"


def _swap_raw(spark, data):
    return spark.createDataFrame(
        [("0xAbc0000000000000000000000000000000000abc",
          [SWAP_T.topic0, "0x" + "0" * 24 + "deadbeef" * 5],
          data, 100, "0xtx", 0)],
        RAW_LOG_SCHEMA)


def test_decode_static_and_dynamic_tuple(spark):
    data = _spec_encode_data(
        SWAP_T, [("0x" + "12" * 20, 777), ("hi there", [5, 6, 7]), 42])
    r = decode_event(_swap_raw(spark, data), SWAP_T).collect()[0]
    assert r["pool"] == "0x" + "deadbeef" * 5
    assert r["trader"]["addr"] == "0x" + "12" * 20
    assert int(r["trader"]["qty"]) == 777
    assert r["meta"]["note"] == "hi there"
    assert list(r["meta"]["tags"]) == [5, 6, 7]
    assert int(r["fee"]) == 42


def test_decode_tuple_empty_dynamics(spark):
    data = _spec_encode_data(
        SWAP_T, [("0x" + "00" * 20, 0), ("", []), 0])
    r = decode_event(_swap_raw(spark, data), SWAP_T).collect()[0]
    assert r["meta"]["note"] == "" and list(r["meta"]["tags"]) == []


TUPLE_ARRAY_EV = AbiEvent("Legs", (
    AbiInput("legs", "tuple[]", False, (
        AbiInput("venue", "uint32", False),
        AbiInput("px", "uint64", False),
    )),
    AbiInput("memo", "string", False),
))


def test_decode_array_of_static_tuples(spark):
    data = _spec_encode_data(
        TUPLE_ARRAY_EV, [[(1, 100), (2, 200), (3, 300)], "ok"])
    raw = spark.createDataFrame(
        [("0x" + "ab" * 20, [TUPLE_ARRAY_EV.topic0], data, 1, "0xt", 0)],
        RAW_LOG_SCHEMA)
    r = decode_event(raw, TUPLE_ARRAY_EV).collect()[0]
    legs = [(leg["venue"], leg["px"]) for leg in r["legs"]]
    assert legs == [(1, 100), (2, 200), (3, 300)]
    assert r["memo"] == "ok"


DYN_TUPLE_ARRAY_EV = AbiEvent("Orders", (
    AbiInput("orders", "tuple[]", False, (
        AbiInput("tag", "string", False),
        AbiInput("size", "uint32", False),
    )),
))


def test_decode_array_of_dynamic_tuples(spark):
    vals = [[("alpha", 1), ("beta-long-tag-spanning-two-words-here!", 2),
             ("", 3)]]
    data = _spec_encode_data(DYN_TUPLE_ARRAY_EV, vals)
    raw = spark.createDataFrame(
        [("0x" + "ab" * 20, [DYN_TUPLE_ARRAY_EV.topic0], data, 1, "0xt", 0)],
        RAW_LOG_SCHEMA)
    r = decode_event(raw, DYN_TUPLE_ARRAY_EV).collect()[0]
    got = [(o["tag"], o["size"]) for o in r["orders"]]
    assert got == vals[0]


def test_decode_nested_static_tuple(spark):
    ev = AbiEvent("Nest", (
        AbiInput("outer", "tuple", False, (
            AbiInput("a", "uint32", False),
            AbiInput("inner", "tuple", False, (
                AbiInput("x", "uint64", False),
                AbiInput("y", "bool", False),
            )),
            AbiInput("b", "uint32", False),
        )),
    ))
    data = _spec_encode_data(ev, [(7, (123456789, True), 9)])
    raw = spark.createDataFrame(
        [("0x" + "ab" * 20, [ev.topic0], data, 1, "0xt", 0)],
        RAW_LOG_SCHEMA)
    r = decode_event(raw, ev).collect()[0]
    assert r["outer"]["a"] == 7 and r["outer"]["b"] == 9
    assert r["outer"]["inner"]["x"] == 123456789
    assert r["outer"]["inner"]["y"] is True


def test_indexed_tuple_surfaces_as_topic_hash(spark):
    ev = AbiEvent("IxT", (
        AbiInput("key", "tuple", True, (
            AbiInput("a", "uint32", False),
            AbiInput("b", "uint32", False),
        )),
        AbiInput("v", "uint64", False),
    ))
    h = "0x" + "ee" * 32
    raw = spark.createDataFrame(
        [("0x" + "ab" * 20, [ev.topic0, h], "0x" + _w(5), 1, "0xt", 0)],
        RAW_LOG_SCHEMA)
    r = decode_event(raw, ev).collect()[0]
    assert r["key"] == h and r["v"] == 5


def test_parse_abi_tuple_components():
    doc = [{
        "type": "event", "name": "E",
        "inputs": [{
            "name": "s", "type": "tuple", "indexed": False,
            "components": [
                {"name": "a", "type": "address"},
                {"name": "amts", "type": "uint256[]"},
            ],
        }],
    }]
    ev = parse_abi(doc)["E"]
    assert ev.inputs[0].components[1].type == "uint256[]"
    assert ev.signature == "E((address,uint256[]))"


def test_mysql_dialect_ddl_and_url(spark):
    """MySQL sink surface (reference README.md:168-172): DDL mapping
    from an ABI-derived schema + bulk-flag URL builder. No MySQL
    server exists in this env — the JDBC write path itself is Derby-
    exercised above; this pins the dialect mapping."""
    from etl_evm_chain_spark.sources.abi import event_schema
    from etl_evm_chain_spark.sources.sinks import mysql_ddl, mysql_jdbc_url

    ev = parse_abi(json.dumps([{
        "type": "event", "name": "Transfer",
        "inputs": [
            {"name": "src", "type": "address", "indexed": True},
            {"name": "dst", "type": "address", "indexed": True},
            {"name": "wad", "type": "uint256", "indexed": False},
        ],
    }]))["Transfer"]
    df = spark.createDataFrame([], event_schema(ev))
    ddl = mysql_ddl(df, "event_transfer", event=ev)
    assert "`wad` DECIMAL(38,0)" in ddl
    assert "`wad_hex` VARCHAR(66)" in ddl
    assert "`tx_hash` VARCHAR(66)" in ddl
    assert "`tx_from` VARCHAR(66)" in ddl
    # address params map by ABI type (names alone cannot tell)
    assert "`src` VARCHAR(42)" in ddl
    assert "`dst` VARCHAR(42)" in ddl
    assert "`block_number` BIGINT" in ddl
    assert ddl.startswith("CREATE TABLE IF NOT EXISTS `event_transfer`")

    url = mysql_jdbc_url("dbhost", "chain", user="etl", password="pw")
    assert url.startswith("jdbc:mysql://dbhost:3306/chain?")
    assert "rewriteBatchedStatements=true" in url
    assert "connectionTimeZone=UTC" in url
    # reserved characters must not detach the flags
    url2 = mysql_jdbc_url("h", "db", user="e&t", password="p&s#1")
    assert "password=p%26s%231" in url2 and "user=e%26t" in url2
    assert url2.endswith("rewriteBatchedStatements=true&connectionTimeZone=UTC")


def test_tuple_abi_randomized_roundtrip(spark):
    """40 seeded random payloads through the independent spec encoder:
    nested tuples, tuple arrays, variable-length strings and uint32[]
    members, empty dynamics — decode must round-trip exactly."""
    import random

    rng = random.Random(20260814)
    ev = AbiEvent("Rx", (
        AbiInput("hdr", "tuple", False, (
            AbiInput("v", "uint32", False),
            AbiInput("inner", "tuple", False, (
                AbiInput("a", "uint64", False),
                AbiInput("flag", "bool", False),
            )),
        )),
        AbiInput("meta", "tuple", False, (
            AbiInput("note", "string", False),
            AbiInput("tags", "uint32[]", False),
        )),
        AbiInput("legs", "tuple[]", False, (
            AbiInput("venue", "uint32", False),
            AbiInput("label", "string", False),
        )),
        AbiInput("fee", "uint32", False),
    ))
    alphabet = "ab XY 01 αβ € 漢 🚀"
    cases = []
    for i in range(40):
        note = "".join(rng.choice(alphabet)
                       for _ in range(rng.randint(0, 45)))
        tags = [rng.getrandbits(31) for _ in range(rng.randint(0, 6))]
        legs = [(rng.getrandbits(16),
                 "".join(rng.choice(alphabet)
                         for _ in range(rng.randint(0, 20))))
                for _ in range(rng.randint(0, 4))]
        hdr = (rng.getrandbits(31), (rng.getrandbits(62), rng.random() < .5))
        cases.append((i, hdr, (note, tags), legs, rng.getrandbits(20)))
    raw = spark.createDataFrame(
        [(f"0x{'ab'*20}", [ev.topic0],
          _spec_encode_data(ev, [hdr, meta, legs, fee]), i, f"0xt{i}", 0)
         for i, hdr, meta, legs, fee in cases],
        RAW_LOG_SCHEMA)
    got = {r["block_number"]: r for r in decode_event(raw, ev).collect()}
    for i, hdr, (note, tags), legs, fee in cases:
        r = got[i]
        assert r["hdr"]["v"] == hdr[0]
        assert int(r["hdr"]["inner"]["a"]) == hdr[1][0]
        assert r["hdr"]["inner"]["flag"] is hdr[1][1]
        assert r["meta"]["note"] == note, (i, r["meta"]["note"], note)
        assert [int(t) for t in r["meta"]["tags"]] == tags
        assert [(leg["venue"], leg["label"]) for leg in r["legs"]] == legs
        assert r["fee"] == fee


# ---- round-4 decode edges: nested fixed arrays + signed wide ints ------


def _raw1(spark, ev, data):
    return spark.createDataFrame(
        [("0x" + "11" * 20, [ev.topic0], data, 1, "0xtx", 0)],
        RAW_LOG_SCHEMA)


def test_decode_nested_fixed_array(spark):
    ev = AbiEvent("Grid", (
        AbiInput("grid", "uint16[2][2]", False),
        AbiInput("tail", "uint32", False),
    ))
    data = _spec_encode_data(ev, [[[1, 2], [65535, 4]], 99])
    r = decode_event(_raw1(spark, ev, data), ev).collect()[0]
    assert [list(x) for x in r["grid"]] == [[1, 2], [65535, 4]]
    assert r["tail"] == 99


def test_decode_three_level_fixed_array(spark):
    ev = AbiEvent("Cube", (AbiInput("c", "uint8[2][1][2]", False),))
    v = [[[1, 2]], [[3, 4]]]
    r = decode_event(
        _raw1(spark, ev, _spec_encode_data(ev, [v])), ev).collect()[0]
    assert [[list(y) for y in x] for x in r["c"]] == v


def test_decode_signed_wide_array_negatives_and_saturation(spark):
    ev = AbiEvent("Deltas", (AbiInput("xs", "int256[]", False),))
    xs = [-1, -(10 ** 20), 10 ** 37, -(10 ** 38), 10 ** 38 - 1]
    r = decode_event(
        _raw1(spark, ev, _spec_encode_data(ev, [xs])), ev).collect()[0]
    got = [None if x is None else int(x) for x in r["xs"]]
    # |v| ≥ 1e38 NULL-saturates (Decimal(38,0) cap); raw blob lossless
    assert got == [-1, -(10 ** 20), 10 ** 37, None, 10 ** 38 - 1]


def test_decode_signed_wide_static_fixed_array(spark):
    ev = AbiEvent("Pair", (AbiInput("p", "int256[2]", False),))
    r = decode_event(
        _raw1(spark, ev, _spec_encode_data(ev, [[-7, 10 ** 18]])),
        ev).collect()[0]
    assert [int(x) for x in r["p"]] == [-7, 10 ** 18]


def test_decode_dynamic_array_of_fixed_arrays(spark):
    ev = AbiEvent("Rows", (AbiInput("m", "uint256[2][]", False),))
    v = [[1, 2 ** 100], [3, 4]]
    r = decode_event(
        _raw1(spark, ev, _spec_encode_data(ev, [v])), ev).collect()[0]
    assert [[int(y) for y in x] for x in r["m"]] == v


def test_decode_nested_dynamic_array(spark):
    ev = AbiEvent("Jag", (AbiInput("j", "uint32[][]", False),
                          AbiInput("z", "uint32", False)))
    v = [[1, 2, 3], [], [4]]
    r = decode_event(
        _raw1(spark, ev, _spec_encode_data(ev, [v, 9])), ev).collect()[0]
    assert [list(x) for x in r["j"]] == v
    assert r["z"] == 9


def test_decode_signed_wide_scalar_extremes_native(spark):
    # the round-4 native two-limb decode must reproduce the old
    # pandas-UDF semantics bit-for-bit: exact in (−1e38, 1e38), NULL
    # beyond (the _hex twin stays lossless)
    ev = AbiEvent("W", (AbiInput("x", "int256", False),))
    cases = [
        (-1, -1),
        (10 ** 38 - 1, 10 ** 38 - 1),
        (-(10 ** 38) + 1, -(10 ** 38) + 1),
        (-(10 ** 38), None),
        (10 ** 38, None),
        (2 ** 255 - 1, None),          # top 128 bits mixed
        (-(2 ** 128) - 5, None),       # top 128 bits not all-F
        (0, 0),
    ]
    rows = [("0x" + "11" * 20, [ev.topic0],
             _spec_encode_data(ev, [v]), i, f"0xt{i}", 0)
            for i, (v, _) in enumerate(cases)]
    got = {r["block_number"]: r
           for r in decode_event(
               spark.createDataFrame(rows, RAW_LOG_SCHEMA), ev).collect()}
    for i, (v, want) in enumerate(cases):
        r = got[i]
        assert (None if r["x"] is None else int(r["x"])) == want, (i, v)
        assert int(r["x_hex"], 16) == v % (1 << 256)


def test_decode_int128_in_tuple_array(spark):
    # wide signed ints inside tuple[] lambdas — the exact combination
    # the old UDF path had to raise on
    ev = AbiEvent("TA", (AbiInput("ts", "tuple[]", False, (
        AbiInput("a", "int128", False),
        AbiInput("b", "uint16", False),
    )),))
    v = [(-(10 ** 30), 7), (42, 65535)]
    r = decode_event(
        _raw1(spark, ev, _spec_encode_data(ev, [v])), ev).collect()[0]
    assert [(int(t["a"]), t["b"]) for t in r["ts"]] == v


def test_mysql_ddl_golden_every_engine_type(spark):
    """Golden-file DDL (VERDICT r3 ask #8): one column per Spark type
    the engine's decode/enrich surface emits, pinned byte-for-byte so
    any mapping drift is a visible diff. Arrays reject with a clear
    error — the only untestable piece left is a live MySQL server
    (none exists in this environment; the JDBC write path itself is
    Derby-proven)."""
    import datetime as _dt
    from decimal import Decimal

    import pytest
    from pyspark.sql import types as T

    from etl_evm_chain_spark.sources.sinks import mysql_ddl

    ev = AbiEvent("Golden", (
        AbiInput("who", "address", False),
        AbiInput("sig", "bytes4", False),
        AbiInput("big", "uint256", False),
    ))
    schema = T.StructType([
        T.StructField("block_number", T.LongType()),
        T.StructField("log_index", T.IntegerType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("big", T.DecimalType(38, 0)),
        T.StructField("ts", T.TimestampType()),
        T.StructField("tx_hash", T.StringType()),
        T.StructField("big_hex", T.StringType()),
        T.StructField("who", T.StringType()),
        T.StructField("sig", T.StringType()),
        T.StructField("note", T.StringType()),
    ])
    df = spark.createDataFrame(
        [(1, 0, 1.0, True, Decimal(1), _dt.datetime(2020, 1, 1),
          "0x", "0x", "0x", "0x", "n")], schema)
    golden = (
        "CREATE TABLE IF NOT EXISTS `golden` (\n"
        "  `block_number` BIGINT,\n"
        "  `log_index` INT,\n"
        "  `score` DOUBLE,\n"
        "  `ok` TINYINT(1),\n"
        "  `big` DECIMAL(38,0),\n"
        "  `ts` TIMESTAMP,\n"
        "  `tx_hash` VARCHAR(66),\n"
        "  `big_hex` VARCHAR(66),\n"
        "  `who` VARCHAR(42),\n"
        "  `sig` VARCHAR(42),\n"
        "  `note` TEXT\n"
        ")"
    )
    assert mysql_ddl(df, "golden", event=ev) == golden

    arr = spark.createDataFrame([(1, [1, 2])], "id long, xs array<int>")
    with pytest.raises(NotImplementedError, match="project complex"):
        mysql_ddl(arr, "bad")


def test_decode_function_type_is_bytes24_shaped(spark):
    """ABI `function` = 20-byte address ++ 4-byte selector, left-
    aligned like bytes24 (go-ethereum decodes it as [24]byte through
    abi.UnpackIntoMap — reference internal/parser/parser.go:74-77)."""
    ev = AbiEvent("Hook", (
        AbiInput("callback", "function", False),
        AbiInput("n", "uint32", False),
    ))
    addr_sel = "11" * 20 + "aabbccdd"            # 24 bytes
    log = _mklog([ev.topic0], [addr_sel + "0" * 16, _word(7)])
    df = spark.createDataFrame([log], RAW_LOG_SCHEMA)
    out = decode_event(df, ev).collect()[0]
    assert out["callback"] == "0x" + "11" * 20 + "aabbccdd"
    assert out["n"] == 7


def test_fixed_ufixed_rejected_loudly(spark):
    import pytest

    from etl_evm_chain_spark.sources.abi import spark_type

    for t in ("fixed", "ufixed", "fixed128x18", "ufixed128x18",
              "fixed128x18[2]", "ufixed[]"):
        with pytest.raises(NotImplementedError, match="reserved"):
            spark_type(t)
    ev = AbiEvent("Bad", (AbiInput("x", "ufixed128x18", False),))
    log = _mklog([ev.topic0], [_word(1)])
    df = spark.createDataFrame([log], RAW_LOG_SCHEMA)
    with pytest.raises(NotImplementedError, match="reserved"):
        decode_event(df, ev)
