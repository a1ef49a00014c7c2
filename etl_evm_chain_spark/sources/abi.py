"""ABI event → static Spark schema + decoder expressions.

The reference derives event schemas dynamically from go-ethereum ABI
parsing (`internal/config/config.go:98-132`, `internal/parser/
parser.go:65-103`) and freezes CSV headers from the first row
(`internal/sink/csv.go:84-99` — a fragility we deliberately fix,
SURVEY §7 hard part 4). Here the ABI fragment *is* the schema
authority: each event compiles to a deterministic StructType of meta
columns + typed parameter columns, plus Catalyst decoder expressions.

Decoding strategy (SURVEY §2.G):
- topic0 (G1): keccak-256 of the canonical signature, computed once
  driver-side (sources/keccak.py) and broadcast.
- indexed topics (G3) and static data slots (G2): native expressions
  (substring + conv) — JVM-side, codegen'd; no Python in the hot path
  for every type that fits 64 bits (addresses, bools, ticks, fees…).
- uint256/int256 (SURVEY §7 hard part 1): dual-column convention —
  lossless ``<name>_hex`` string plus ``<name>`` DecimalType(38,0)
  decoded by an Arrow-batched pandas UDF (Python big-int, exact up to
  38 digits; larger values keep the hex column as the source of
  truth and the decimal saturates to NULL).
- dynamic types (string, bytes, T[]; `abi.UnpackIntoMap` parity):
  head-slot offset → length-prefixed tail, decoded with native offset
  arithmetic on the hex blob (substr/conv/unhex — still no Python);
  static fixed arrays T[k] decode inline from k head slots; indexed
  dynamic/array params surface as their keccak-hash topic
  (go-ethereum common.Hash semantics).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .keccak import keccak256_hex

META_FIELDS = [
    ("chain_id", T.StringType()),
    ("contract", T.StringType()),
    ("contract_name", T.StringType()),
    ("event_name", T.StringType()),
    ("block_number", T.LongType()),
    ("timestamp", T.LongType()),
    ("tx_hash", T.StringType()),
    ("tx_from", T.StringType()),
]

RAW_LOG_SCHEMA = T.StructType([
    T.StructField("address", T.StringType()),
    T.StructField("topics", T.ArrayType(T.StringType())),
    T.StructField("data", T.StringType()),
    T.StructField("block_number", T.LongType()),
    T.StructField("tx_hash", T.StringType()),
    T.StructField("log_index", T.IntegerType()),
])


@dataclass(frozen=True)
class AbiInput:
    name: str
    type: str
    indexed: bool


@dataclass(frozen=True)
class AbiEvent:
    name: str
    inputs: tuple[AbiInput, ...]

    @property
    def signature(self) -> str:
        return f"{self.name}({','.join(i.type for i in self.inputs)})"

    @property
    def topic0(self) -> str:
        return keccak256_hex(self.signature)


def parse_abi(abi_json: str | list) -> dict[str, AbiEvent]:
    """Parse an ABI document (JSON string or loaded list) into events,
    mirroring `internal/config/config.go:124-129`."""
    doc = json.loads(abi_json) if isinstance(abi_json, str) else abi_json
    events = {}
    for frag in doc:
        if frag.get("type") != "event":
            continue
        ev = AbiEvent(
            name=frag["name"],
            inputs=tuple(
                AbiInput(i["name"], i["type"], bool(i.get("indexed", False)))
                for i in frag.get("inputs", [])
            ),
        )
        events[ev.name] = ev
    return events


_ARRAY_RE = re.compile(r"^(.*)\[(\d*)\]$")


def _int_bits(abi_type: str) -> int | None:
    for prefix in ("uint", "int"):
        if abi_type.startswith(prefix):
            digits = abi_type[len(prefix):] or "256"
            if digits.isdigit():
                return int(digits)
    return None


def _is_dynamic(abi_type: str) -> bool:
    """Dynamic per the ABI spec (head slot holds a byte offset to a
    length-prefixed tail): string, bytes, T[], and T[k] of dynamic T —
    mirrors go-ethereum's `abi.Type.requiresLengthPrefix` semantics
    used by `abi.UnpackIntoMap` (reference
    `internal/parser/parser.go:74-77`)."""
    if abi_type in ("string", "bytes"):
        return True
    m = _ARRAY_RE.match(abi_type)
    if m:
        return True if m.group(2) == "" else _is_dynamic(m.group(1))
    return False


def _head_slots(abi_type: str) -> int:
    """32-byte head slots a parameter occupies in the data blob: 1 for
    every dynamic type (the offset word) and scalar static type; k×
    inner for a static fixed array T[k] (encoded inline)."""
    if _is_dynamic(abi_type):
        return 1
    m = _ARRAY_RE.match(abi_type)
    if m and m.group(2):
        return int(m.group(2)) * _head_slots(m.group(1))
    return 1


def spark_type(abi_type: str, *, indexed: bool = False) -> T.DataType:
    m = _ARRAY_RE.match(abi_type)
    if indexed and (m or _is_dynamic(abi_type)):
        # indexed arrays/strings/bytes arrive as their keccak hash topic
        return T.StringType()
    if m:
        return T.ArrayType(spark_type(m.group(1)))
    bits = _int_bits(abi_type)
    if bits is not None:
        # unsigned types need one extra bit of headroom in a signed
        # Spark integral (uint32 max 2^32−1 overflows IntegerType)
        room = 0 if abi_type.startswith("int") else 1
        if bits + room <= 32:
            return T.IntegerType()
        if bits + room <= 64:
            return T.LongType()
        return T.DecimalType(38, 0)
    if abi_type == "address":
        return T.StringType()
    if abi_type == "bool":
        return T.BooleanType()
    if abi_type.startswith("bytes"):
        return T.StringType()  # hex
    return T.StringType()


def event_schema(event: AbiEvent, contract_name: str = "") -> T.StructType:
    """Deterministic StructType: meta columns + one per ABI param
    (+ lossless _hex twin for >63-bit scalar integers; array elements
    carry no twin — the raw data blob is their lossless source)."""
    fields = [T.StructField(n, t) for n, t in META_FIELDS]
    for inp in event.inputs:
        st = spark_type(inp.type, indexed=inp.indexed)
        fields.append(T.StructField(inp.name, st))
        bits = _int_bits(inp.type)
        if bits is not None and bits > 63:
            fields.append(T.StructField(f"{inp.name}_hex", T.StringType()))
    return T.StructType(fields)


_BIG_WORD_UDF = None


def _decode_big_word(word_hex: Column, signed: Column) -> Column:
    """Exact big-int decode of a 32-byte hex word; NULL when the value
    exceeds DecimalType(38,0) (the _hex column stays lossless).

    The pandas UDF is created lazily — decorating at import time needs
    an active SparkSession to parse the return type.
    """
    global _BIG_WORD_UDF
    if _BIG_WORD_UDF is None:
        @pandas_udf("decimal(38,0)")
        def big_word(word_hex: pd.Series, signed: pd.Series) -> pd.Series:
            import decimal

            def conv(h, s):
                if h is None:
                    return None
                v = int(h, 16)
                if s and v >= 1 << 255:
                    v -= 1 << 256
                if abs(v) >= 10 ** 38:
                    return None
                return decimal.Decimal(v)

            return pd.Series([conv(h, s) for h, s in zip(word_hex, signed)])

        _BIG_WORD_UDF = big_word
    return _BIG_WORD_UDF(word_hex, signed)


def _word(col: Column, slot: int) -> Column:
    """32-byte word `slot` of a 0x-prefixed data blob, as bare hex."""
    return F.substring(col, 3 + 64 * slot, 64)


def _decode_word(word: Column, abi_type: str) -> Column:
    """Native decode of one 32-byte hex word for ≤63-bit static types;
    falls back to the pandas UDF for wide integers."""
    bits = _int_bits(abi_type)
    if abi_type == "address":
        return F.concat(F.lit("0x"), F.lower(F.substring(word, 25, 40)))
    if abi_type == "bool":
        return (F.conv(F.substring(word, 49, 16), 16, 10).cast("long") != 0)
    if bits is not None and bits <= 63:
        # Slice exactly ceil(bits/4) hex chars: a two's-complement
        # word sign-extends through all 64 chars, so a fixed 16-char
        # slice would overflow long for negative int<N>. For the real
        # ABI widths (multiples of 8 ≤ 56, plus ≤32) the slice always
        # fits a signed long. conv is unsigned → sign-extend manually.
        n_hex = (bits + 3) // 4
        raw = F.conv(F.substring(word, 65 - n_hex, n_hex), 16, 10).cast("long")
        if abi_type.startswith("int"):
            half, full = 1 << (bits - 1), 1 << bits
            raw = F.when(raw >= half, raw - full).otherwise(raw)
        # target integral mirrors spark_type (unsigned needs headroom)
        room = 0 if abi_type.startswith("int") else 1
        return raw.cast("int" if bits + room <= 32 else "long")
    if abi_type == "int64":
        # exact via the big-int UDF (a 16-hex conv can exceed signed
        # long as an unsigned string), then narrowed losslessly
        return _decode_big_word(word, F.lit(True)).cast("long")
    if bits is not None and abi_type.startswith("uint"):
        # Native two-limb decimal decode (JVM-side, no Python): value =
        # hi64·2^64 + lo64 as DecimalType(38,0). Upper 128 bits nonzero
        # → NULL (value > 3.4e38 can't fit; _hex stays lossless), and
        # decimal overflow inside (1e38, 3.4e38) nulls under non-ANSI
        # semantics — same convention as the UDF path, ~10× faster on
        # the decode hot path.
        hi = F.conv(F.substring(word, 33, 16), 16, 10).cast("decimal(38,0)")
        lo = F.conv(F.substring(word, 49, 16), 16, 10).cast("decimal(38,0)")
        two64 = F.lit("18446744073709551616").cast("decimal(38,0)")
        val = (hi * two64 + lo).cast("decimal(38,0)")
        return F.when(F.substring(word, 1, 32) == "0" * 32, val)
    if bits is not None:  # int64..int256: two's complement needs Python big-int
        return _decode_big_word(word, F.lit(True))
    if abi_type.startswith("bytes"):
        # bytesN is left-aligned in the word: slice exactly N bytes.
        n = abi_type[5:]
        if n.isdigit():
            return F.concat(F.lit("0x"), F.lower(F.substring(word, 1, 2 * int(n))))
        return F.concat(F.lit("0x"), F.lower(word))
    return F.concat(F.lit("0x"), F.lower(word))


_WORDS_COL = "__abi_words"
# split the bare-hex blob into 64-char ABI words (Java regex \G —
# zero-width match every 64 chars)
_WORD_SPLIT_RE = r"(?<=\G.{64})"


def _wslot(words: Column, slot) -> Column:
    """Word at 0-based ``slot`` (int or Column) of the words array."""
    idx = slot + 1 if isinstance(slot, Column) else F.lit(slot + 1)
    return F.element_at(words, idx)


def _decode_dynamic(words: Column, head_slot: int, abi_type: str) -> Column:
    """Native decode of a dynamic-type parameter from its tail
    (SURVEY §2.G2 extension; reference decodes these via go-ethereum
    `abi.UnpackIntoMap`, `internal/parser/parser.go:74-77`).

    ABI dynamic layout: the head slot holds the byte offset (from the
    start of the data section) of a length-prefixed tail —
    ``[len][payload …]`` with the payload right-padded to a 32-byte
    multiple (strings/bytes left-aligned; array elements one word
    each). The decode runs over a pre-split words ARRAY column (see
    ``decode_event``: the blob is split ONCE in its own projection):
    element_at/slice on the bound array beats re-substringing the full
    hex string per reference — measured ~2× on a 600k-row decode,
    because tail expressions are HOF-adjacent (interpreted, no
    codegen) and every substr of the whole blob re-evaluates its
    offset chain. Still entirely JVM-side — no Python for any
    dynamic type.
    """
    # ABI offsets are word-aligned: byte offset / 32 = 0-based word
    # index of the length word.
    off_w = (F.conv(F.substring(_wslot(words, head_slot), 49, 16), 16, 10)
             / 32).cast("int")
    n = F.conv(F.substring(_wslot(words, off_w), 49, 16), 16, 10) \
        .cast("long")
    if abi_type in ("string", "bytes"):
        n_words = F.ceil(n / 32).cast("int")
        payload = F.concat_ws(
            "", F.slice(words, off_w + 2, n_words)) \
            .substr(F.lit(1), (n * 2).cast("int"))
        if abi_type == "string":
            return F.decode(F.unhex(payload), "UTF-8")
        return F.concat(F.lit("0x"), F.lower(payload))
    m = _ARRAY_RE.match(abi_type)
    if m and m.group(2) == "":
        elem = m.group(1)
        if elem in ("string", "bytes"):
            # T[] of dynamic scalars: after the length word comes a
            # mini head/tail — per-element byte offsets RELATIVE to
            # the array body start (ABI tuple-encoding rule), each
            # pointing at its own length-prefixed payload.
            body_w = off_w + 1            # 0-based word of elem slot 0
            idx = F.when(
                n > 0, F.sequence(F.lit(0), (n - 1).cast("int"))) \
                .otherwise(F.array().cast("array<int>"))

            def one(i):
                eoff_w = (F.conv(
                    F.substring(F.element_at(words, body_w + i + 1),
                                49, 16), 16, 10) / 32).cast("int")
                etail_w = body_w + eoff_w
                elen = F.conv(
                    F.substring(F.element_at(words, etail_w + 1), 49, 16),
                    16, 10).cast("int")
                payload = F.concat_ws(
                    "", F.slice(words, etail_w + 2,
                                F.ceil(elen / 32).cast("int"))) \
                    .substr(F.lit(1), elen * 2)
                if elem == "string":
                    return F.decode(F.unhex(payload), "UTF-8")
                return F.concat(F.lit("0x"), F.lower(payload))

            return F.transform(idx, one)
        if _is_dynamic(elem) or ((_int_bits(elem) or 0) > 63
                                 and elem.startswith("int")):
            raise NotImplementedError(
                f"array element type {elem!r} not supported natively "
                "(nested array / wide signed int)")
        return F.transform(F.slice(words, off_w + 2, n.cast("int")),
                           lambda wd: _decode_word(wd, elem))
    raise NotImplementedError(f"dynamic type {abi_type!r}")


def _decode_static_array(words: Column, base_slot: int,
                         abi_type: str) -> Column:
    """Inline decode of a static fixed array T[k]: k consecutive head
    slots, one element per word."""
    m = _ARRAY_RE.match(abi_type)
    elem, k = m.group(1), int(m.group(2))
    if _ARRAY_RE.match(elem):
        raise NotImplementedError("nested fixed arrays")
    return F.array(*[_decode_word(_wslot(words, base_slot + i), elem)
                     for i in range(k)])


def decode_event(raw_logs: DataFrame, event: AbiEvent, *,
                 contract_name: str = "", chain_id: str = "1") -> DataFrame:
    """Decode raw logs of one event type into its typed table.

    Filter on topic0 is pushed to the scan (Catalyst predicate
    pushdown — the distributed analog of the reference's server-side
    `eth_getLogs` topic filter, `internal/indexer/indexer.go:223-235`).
    Enrichment columns (timestamp, tx_from) join in later via the
    blocks/transactions dims (see enrich()).
    """
    indexed = [i for i in event.inputs if i.indexed]
    unindexed = [i for i in event.inputs if not i.indexed]

    df = raw_logs.filter(F.col("topics")[0] == event.topic0)
    out_cols = [
        F.lit(chain_id).alias("chain_id"),
        F.lower(F.col("address")).alias("contract"),
        F.lit(contract_name).alias("contract_name"),
        F.lit(event.name).alias("event_name"),
        F.col("block_number"),
        F.col("tx_hash"),
        F.col("log_index"),
    ]
    order = ["chain_id", "contract", "contract_name", "event_name",
             "block_number", "tx_hash", "log_index"]
    for pos, inp in enumerate(indexed):
        topic = F.col("topics")[pos + 1]
        word = F.substring(topic, 3, 64)  # strip 0x
        order.append(inp.name)
        if _is_dynamic(inp.type) or _ARRAY_RE.match(inp.type):
            # indexed dynamic/array params are stored as the keccak
            # hash of the encoded value (go-ethereum common.Hash).
            out_cols.append(F.lower(topic).alias(inp.name))
            continue
        out_cols.append(_decode_word(word, inp.type).alias(inp.name))
        if (_int_bits(inp.type) or 0) > 63:
            out_cols.append(F.concat(F.lit("0x"), F.lower(word))
                            .alias(f"{inp.name}_hex"))
            order.append(f"{inp.name}_hex")
    needs_words = any(_is_dynamic(i.type) or _ARRAY_RE.match(i.type)
                      for i in unindexed)
    if not needs_words:
        # static-only event: single projection straight off the blob
        for slot, inp in enumerate(unindexed):
            word = _word(F.col("data"), slot)
            out_cols.append(_decode_word(word, inp.type).alias(inp.name))
            if (_int_bits(inp.type) or 0) > 63:
                out_cols.append(F.concat(F.lit("0x"), F.lower(word))
                                .alias(f"{inp.name}_hex"))
        return df.select(*out_cols)

    # Dynamic event → three stacked projections, each kept separate by
    # CollapseProject (non-cheap expressions, multiple references):
    #   P1: split the blob into its 64-char words ONCE;
    #   P2: every scalar/string/bytes decode from the bound words
    #       array — no lambdas, so the whole project stays inside
    #       WholeStageCodegen;
    #   P3: array decodes only (transform lambdas are CodegenFallback
    #       and would otherwise drag P2's decimal/string work into
    #       interpreted evaluation — measured ~2× on a 600k-row blob).
    # A final attribute-only select restores the declared column order.
    df = df.withColumn(
        _WORDS_COL,
        F.split(F.substring(F.col("data"), 3, 1 << 30), _WORD_SPLIT_RE))
    words = F.col(_WORDS_COL)

    scalar_cols, array_cols = [], []
    slot = 0
    for inp in unindexed:
        if _is_dynamic(inp.type) and not _ARRAY_RE.match(inp.type):
            scalar_cols.append(_decode_dynamic(words, slot, inp.type)
                               .alias(inp.name))
        elif _ARRAY_RE.match(inp.type):
            fn = (_decode_dynamic if _is_dynamic(inp.type)
                  else _decode_static_array)
            array_cols.append(fn(words, slot, inp.type).alias(inp.name))
        else:
            word = _wslot(words, slot)
            scalar_cols.append(_decode_word(word, inp.type).alias(inp.name))
            if (_int_bits(inp.type) or 0) > 63:
                scalar_cols.append(F.concat(F.lit("0x"), F.lower(word))
                                   .alias(f"{inp.name}_hex"))
        order.append(inp.name)
        if (_int_bits(inp.type) or 0) > 63 and not _ARRAY_RE.match(inp.type):
            order.append(f"{inp.name}_hex")
        slot += _head_slots(inp.type)

    out = df.select(*out_cols, *scalar_cols,
                    *([words] if array_cols else []))
    if array_cols:
        out = out.select("*", *array_cols).drop(_WORDS_COL)
    return out.select(*order)


def route_events(raw_logs: DataFrame, events: dict[str, AbiEvent]) -> DataFrame:
    """topic0 → event-name resolution (G4): the reference's linear ABI
    scan (`internal/parser/parser.go:164-171`) becomes a literal map
    lookup compiled into the plan (broadcast-sized by construction)."""
    mapping = F.create_map(*[
        x for ev in events.values()
        for x in (F.lit(ev.topic0), F.lit(ev.name))
    ])
    return raw_logs.withColumn("event_name", mapping[F.col("topics")[0]])


def enrich(decoded: DataFrame, blocks: DataFrame | None = None,
           transactions: DataFrame | None = None) -> DataFrame:
    """Broadcast-join enrichment (C1/C2): block→timestamp and
    tx→sender, replacing the reference's per-log memoized RPC lookups
    (`internal/parser/parser.go:119-130,152-159`) with dim joins."""
    out = decoded
    if blocks is not None:
        out = out.join(F.broadcast(blocks.select("block_number", "timestamp")),
                       "block_number", "left")
    if transactions is not None:
        out = out.join(F.broadcast(transactions.select("tx_hash", "tx_from")),
                       "tx_hash", "left")
    return out


_RECOVER_UDF = None


def recover_sender(tx_df: DataFrame, *, hash_col: str = "sig_hash",
                   r_col: str = "r", s_col: str = "s", v_col: str = "v",
                   out_col: str = "tx_from") -> DataFrame:
    """ECDSA sender recovery (G5, `internal/parser/parser.go:152-159`:
    ``types.Sender(signer, tx)``).

    Inputs: the transaction *signing hash* (0x hex) plus the r/s (0x
    hex) and v components; output: the recovered lowercase 0x address
    (NULL for invalid signatures). Pure-Python secp256k1
    (sources/secp256k1.py) inside an Arrow-batched pandas UDF — a few ms/
    row/core, acceptable for live tails and audits. For bulk
    backfills prefer the pre-landed ``transactions(tx_hash, tx_from)``
    dim join (see ``enrich``), which avoids per-row crypto entirely.
    """
    global _RECOVER_UDF
    if _RECOVER_UDF is None:
        @pandas_udf("string")
        def rec(h: pd.Series, r: pd.Series, s: pd.Series,
                v: pd.Series) -> pd.Series:
            from .secp256k1 import recover_address

            def one(hh, rr, ss, vv):
                if hh is None or rr is None or ss is None or vv is None:
                    return None
                try:
                    return recover_address(
                        bytes.fromhex(str(hh).removeprefix("0x")),
                        int(str(rr), 16), int(str(ss), 16), int(vv))
                except (ValueError, AssertionError):
                    return None

            return pd.Series([one(*t) for t in zip(h, r, s, v)])

        _RECOVER_UDF = rec
    return tx_df.withColumn(
        out_col,
        _RECOVER_UDF(F.col(hash_col), F.col(r_col), F.col(s_col),
                     F.col(v_col).cast("long")))
