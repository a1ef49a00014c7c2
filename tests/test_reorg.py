"""Reorg-safe incremental cursor: fork detection, rewind, replay."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_evm_chain_spark.sources import reorg as rg
from etl_evm_chain_spark.sources.abi import RAW_LOG_SCHEMA, decode_event
from tests.test_evm import SWAPISH, _mklog, _word


class FakeChain:
    """A mutable chain: block → (hash, [log payload words]). Reorg by
    replacing a suffix."""

    def __init__(self, n_blocks: int, salt: str = "a"):
        self.salt = {}
        self.reorg(0, n_blocks, salt)

    def reorg(self, frm: int, to: int, salt: str) -> None:
        for b in range(frm, to + 1):
            self.salt[b] = salt

    def block_hash(self, number: int) -> str | None:
        s = self.salt.get(number)
        return None if s is None else f"0xh{number}{s}"

    @property
    def latest(self) -> int:
        return max(self.salt)

    @staticmethod
    def _salt_ord(s: str) -> int:
        if s == "a":
            return 0
        if s == "b":
            return 1
        return int(s[1:]) + 1  # "s1" -> 2, "s2" -> 3, ...

    def raw_logs(self, spark):
        # one log per block; the decoded amount encodes the chain
        # branch (salt) so orphaned rows are distinguishable — every
        # branch gets a distinct amount, not just a/b.
        rows = [
            _mklog([SWAPISH.topic0, "0x" + _word(b)],
                   [_word(b * 10 + self._salt_ord(s)), _word(b)],
                   block=b, idx=0)
            for b, s in self.salt.items()
        ]
        return spark.createDataFrame(rows, RAW_LOG_SCHEMA)


def _run(spark, chain, prog, out, **kw):
    return rg.incremental_decode_reorg_safe(
        spark, raw=chain.raw_logs(spark), progress_path=prog,
        out_dir=out, decode=lambda df: decode_event(df, SWAPISH),
        latest=chain.latest, get_block_hash=chain.block_hash,
        bucket_size=10, **kw)


def test_confirmation_lag_gates_the_tip(spark, tmp_path):
    chain = FakeChain(20)
    r = _run(spark, chain, str(tmp_path / "p"), str(tmp_path / "o"),
             confirmations=5)
    assert (r["from"], r["to"]) == (0, 15)
    out = spark.read.parquet(str(tmp_path / "o"))
    assert out.agg(F.max("block_number")).collect()[0][0] == 15


def test_incremental_extends_without_reorg(spark, tmp_path):
    chain = FakeChain(20)
    prog, out = str(tmp_path / "p"), str(tmp_path / "o")
    _run(spark, chain, prog, out, confirmations=5)
    chain.reorg(21, 30, "a")  # chain grows
    r = _run(spark, chain, prog, out, confirmations=5)
    assert (r["from"], r["to"], r["rewound_to"]) == (16, 25, None)
    got = spark.read.parquet(out).select("block_number").distinct().count()
    assert got == 26  # blocks 0..25, no duplicates despite bucket replay


def test_caught_up_is_a_noop(spark, tmp_path):
    chain = FakeChain(20)
    prog, out = str(tmp_path / "p"), str(tmp_path / "o")
    _run(spark, chain, prog, out, confirmations=5)
    r = _run(spark, chain, prog, out, confirmations=5)
    assert r["rows"] == 0 and r["rewound_to"] is None


def test_reorg_rewinds_and_replaces_orphans(spark, tmp_path):
    chain = FakeChain(40)
    prog, out = str(tmp_path / "p"), str(tmp_path / "o")
    # two committed anchors: tips 15 and 35
    _run(spark, chain, prog, out, confirmations=25)  # tip 15
    _run(spark, chain, prog, out, confirmations=5)   # tip 35
    # deep reorg: blocks 20+ replaced on branch "b", chain grows to 45
    chain.reorg(20, 45, "b")
    r = _run(spark, chain, prog, out, confirmations=5)
    # tip anchor 35 is orphaned; anchor 15 still matches → fork at 15
    assert r["rewound_to"] == 15
    assert (r["from"], r["to"]) == (16, 40)
    dec = spark.read.parquet(out)
    # every decoded amount must match the CURRENT chain: amount parity
    # encodes the branch (even = a, odd = b)
    rows = {x["block_number"]: int(x["amount"])
            for x in dec.collect()}
    assert set(rows) == set(range(0, 41))
    for b, amt in rows.items():
        assert amt == b * 10 + (0 if b < 20 else 1), (b, amt)
    # cursor generation bumped, tip re-anchored on the new branch
    gen, to_block, tip_hash = rg.read_cursor(spark, prog)
    assert gen == 1 and to_block == 40
    assert tip_hash == chain.block_hash(40)


def test_reorg_deeper_than_all_anchors_reindexes(spark, tmp_path):
    chain = FakeChain(20)
    prog, out = str(tmp_path / "p"), str(tmp_path / "o")
    _run(spark, chain, prog, out, confirmations=5)
    chain.reorg(0, 22, "b")  # everything orphaned
    r = _run(spark, chain, prog, out, confirmations=5)
    assert r["rewound_to"] == -1 and (r["from"], r["to"]) == (0, 17)
    amts = {x["block_number"]: int(x["amount"])
            for x in spark.read.parquet(out).collect()}
    assert all(amt == b * 10 + 1 for b, amt in amts.items())


def test_rewind_inside_confirmation_gate_waits(spark, tmp_path):
    chain = FakeChain(20)
    prog, out = str(tmp_path / "p"), str(tmp_path / "o")
    _run(spark, chain, prog, out, confirmations=5)  # tip anchor 15
    chain.reorg(15, 20, "b")  # reorg touches the anchor itself
    # huge lag: fork detected (anchor 15 orphaned, no older anchor →
    # -1) but nothing replayable inside the gate → no-op
    r = _run(spark, chain, prog, out, confirmations=25)
    assert r["rows"] == 0 and r["rewound_to"] == -1
    # cursor untouched: detection repeats next increment
    assert rg.read_cursor(spark, prog)[0] == 0
    # once the gate opens, the rewind applies
    r = _run(spark, chain, prog, out, confirmations=3)
    assert r["rewound_to"] == -1 and r["to"] == 17


def test_empty_replayed_bucket_is_physically_cleaned(spark, tmp_path):
    chain = FakeChain(20)
    prog, out = str(tmp_path / "p"), str(tmp_path / "o")
    _run(spark, chain, prog, out, confirmations=5)  # blocks 0..15
    # reorg wipes ALL logs from blocks 10.. (new branch has no blocks
    # there beyond headers): simulate by replaying onto a chain whose
    # raw stream is empty past block 9
    chain.reorg(10, 21, "b")
    raw = chain.raw_logs(spark).filter(F.col("block_number") < 10)
    r = rg.incremental_decode_reorg_safe(
        spark, raw=raw, progress_path=prog, out_dir=out,
        decode=lambda df: decode_event(df, SWAPISH),
        latest=chain.latest, get_block_hash=chain.block_hash,
        bucket_size=10, confirmations=5)
    assert r["rewound_to"] == -1
    blocks = {x["block_number"]
              for x in rg.read_committed(spark, out, prog).collect()}
    assert blocks == set(range(0, 10))  # orphans at 10..15 are GONE


def test_read_committed_hides_above_watermark(spark, tmp_path):
    chain = FakeChain(20)
    prog, out = str(tmp_path / "p"), str(tmp_path / "o")
    _run(spark, chain, prog, out, confirmations=5)
    committed = rg.read_committed(spark, out, prog)
    assert committed.agg(F.max("block_number")).collect()[0][0] == 15


def test_missing_tip_hash_aborts_without_committing(spark, tmp_path):
    chain = FakeChain(20)
    prog, out = str(tmp_path / "p"), str(tmp_path / "o")
    _run(spark, chain, prog, out, confirmations=5)  # tip 15
    chain.reorg(21, 40, "a")
    # node "lags": no hash past block 30, but latest claims 40
    lagging = lambda n: chain.block_hash(n) if n <= 30 else None  # noqa: E731
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="unverifiable anchor"):
        rg.incremental_decode_reorg_safe(
            spark, raw=chain.raw_logs(spark), progress_path=prog,
            out_dir=out, decode=lambda df: decode_event(df, SWAPISH),
            latest=chain.latest, get_block_hash=lagging,
            bucket_size=10, confirmations=5)
    # cursor untouched: the next healthy increment resumes normally
    assert rg.read_cursor(spark, prog)[1] == 15
    r = _run(spark, chain, prog, out, confirmations=5)
    assert (r["from"], r["to"]) == (16, 35)


def test_plain_watermark_cursor_is_rejected(spark, tmp_path):
    from etl_evm_chain_spark.sources import progress as pg
    prog = str(tmp_path / "p")
    pg.commit_watermark(spark, prog, 42)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not a reorg-safe cursor"):
        rg.read_cursor(spark, prog)


@pytest.mark.slow
def test_random_grow_reorg_sequences_converge_to_chain(spark, tmp_path):
    """Property: after ANY sequence of grows and reorgs, the committed
    lake equals a clean decode of the final chain up to the watermark.
    Seeded exhaustive-ish sweep instead of hypothesis (each scenario
    costs real Spark jobs)."""
    import random

    rng = random.Random(7)
    for case in range(3):
        chain = FakeChain(15)
        prog = str(tmp_path / f"p{case}")
        out = str(tmp_path / f"o{case}")
        salt_i = 0
        for step in range(4):
            op = rng.choice(["grow", "reorg", "grow"])
            if op == "grow":
                chain.reorg(chain.latest + 1,
                            chain.latest + rng.randint(3, 12),
                            chain.salt[chain.latest])
            else:
                salt_i += 1
                depth = rng.randint(1, 10)
                frm = max(0, chain.latest - depth)
                chain.reorg(frm, chain.latest + rng.randint(0, 6),
                            f"s{salt_i}")
            _run(spark, chain, prog, out, confirmations=3)

        hwm = rg.read_cursor(spark, prog)[1]
        got = {(x["block_number"], int(x["amount"]))
               for x in rg.read_committed(spark, out, prog).collect()}
        want = {
            (r["block_number"], int(r["amount"]))
            for r in decode_event(
                chain.raw_logs(spark).filter(
                    F.col("block_number") <= hwm), SWAPISH).collect()
        }
        assert got == want, f"case {case}: lake diverged from chain"


def test_shrink_reorg_physically_deletes_orphan_buckets(spark, tmp_path):
    """Reorg onto a SHORTER chain: rows above the new safe tip must be
    deleted from the lake, not merely hidden by read_committed —
    direct spark.read consumers would otherwise see orphans until the
    chain regrew past them (ADVICE r2)."""
    chain = FakeChain(60)
    prog, out = str(tmp_path / "p"), str(tmp_path / "o")
    _run(spark, chain, prog, out, confirmations=5)   # watermark 55
    # new branch forks at 20 and TOPS OUT at 30 (shorter than before)
    for b in list(chain.salt):
        if b > 30:
            del chain.salt[b]
    chain.reorg(20, 30, "b")
    r = _run(spark, chain, prog, out, confirmations=5)
    assert r["rewound_to"] is not None and r["to"] == 25
    # plain (non-read_committed) read: nothing above the new safe tip
    lake = spark.read.parquet(out)
    assert lake.agg(F.max("block_number")).collect()[0][0] == 25
    # and the replayed range carries the new branch's payloads
    amounts = {int(x["amount"]) for x in
               lake.filter(F.col("block_number").between(20, 25))
               .select("amount").collect()}
    assert amounts == {b * 10 + 1 for b in range(20, 26)}  # salt "b"
