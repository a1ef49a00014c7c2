"""Indexer configuration: the reference's YAML config surface
(`internal/config/config.go:54-156`, `config.yaml.example`) with the
same validation rules and defaults, feeding the Spark pipeline.

Also implements the CLI overrides the reference documents but never
wired (`README.md:107-114` vs `cmd/indexer.go:20-21` — SURVEY scope
flag 3): ``apply_overrides`` honors start_block / rpc_url / storage.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field, replace

from .abi import AbiEvent, parse_abi

DEFAULT_RETRY_ATTEMPTS = 3       # config.go:135-140
DEFAULT_RETRY_DELAY_MS = 1500
DEFAULT_CHUNK_SIZE = 1000        # config.go:143-145
VALID_STORAGE = ("csv", "parquet", "jdbc")


@dataclass(frozen=True)
class ContractConfig:
    name: str
    address: str
    abi_path: str
    events: tuple[str, ...]
    parsed_events: dict[str, AbiEvent] = field(default_factory=dict)


@dataclass(frozen=True)
class IndexerConfig:
    rpc_url: str
    storage_type: str
    storage_path: str
    start_block: int
    chunk_size: int
    workers: int
    retry_attempts: int
    retry_delay_ms: int
    contracts: tuple[ContractConfig, ...]


def load(path: str) -> IndexerConfig:
    """YAML → validated config, mirroring config.Load semantics:
    required rpc_url / valid storage / ≥1 contract (config.go:71-92),
    eager ABI parse (config.go:98-132), defaults (config.go:135-153)."""
    import yaml

    with open(path) as f:
        doc = yaml.safe_load(f)
    return from_dict(doc, base_dir=os.path.dirname(os.path.abspath(path)))


def from_dict(doc: dict, *, base_dir: str = ".") -> IndexerConfig:
    if not doc.get("rpc_url"):
        raise ValueError("rpc_url is required")
    storage = doc.get("storage", {}) or {}
    stype = storage.get("type", "csv")
    if stype not in VALID_STORAGE:
        raise ValueError(f"storage type must be one of {VALID_STORAGE}")
    raw_contracts = doc.get("contracts") or []
    if not raw_contracts:
        raise ValueError("at least one contract is required")

    contracts = []
    for c in raw_contracts:
        abi_path = os.path.join(base_dir, c["abi"])
        with open(abi_path) as f:
            parsed = parse_abi(f.read())
        wanted = tuple(c.get("events") or parsed.keys())
        missing = [e for e in wanted if e not in parsed]
        if missing:
            raise ValueError(f"contract {c['name']}: unknown events {missing}")
        contracts.append(ContractConfig(
            name=c["name"],
            address=c["address"].lower(),
            abi_path=abi_path,
            events=wanted,
            parsed_events={e: parsed[e] for e in wanted},
        ))

    return IndexerConfig(
        rpc_url=doc["rpc_url"],
        storage_type=stype,
        storage_path=storage.get("path", "./output"),
        start_block=int(doc.get("start_block", 0)),
        chunk_size=int(doc.get("chunk_size", DEFAULT_CHUNK_SIZE)),
        workers=int(doc.get("workers", os.cpu_count() or 4)),
        retry_attempts=int((doc.get("retry") or {}).get("attempts", DEFAULT_RETRY_ATTEMPTS)),
        retry_delay_ms=int((doc.get("retry") or {}).get("delay_ms", DEFAULT_RETRY_DELAY_MS)),
        contracts=tuple(contracts),
    )


def apply_overrides(cfg: IndexerConfig, *, start_block: int | None = None,
                    rpc_url: str | None = None,
                    storage_type: str | None = None) -> IndexerConfig:
    """CLI overrides (documented in reference README.md:107-114 but
    unimplemented there — implemented here per SURVEY scope flags)."""
    if storage_type is not None and storage_type not in VALID_STORAGE:
        raise ValueError(f"storage type must be one of {VALID_STORAGE}")
    out = cfg
    if start_block is not None:
        out = replace(out, start_block=start_block)
    if rpc_url is not None:
        out = replace(out, rpc_url=rpc_url)
    if storage_type is not None:
        out = replace(out, storage_type=storage_type)
    return out


def topic0_filter(cfg: IndexerConfig) -> tuple[str, ...]:
    """Deduped topic0 set across configured events
    (`internal/indexer/indexer.go:64-88`)."""
    seen: dict[str, None] = {}
    for c in cfg.contracts:
        for ev in c.parsed_events.values():
            seen.setdefault(ev.topic0)
    return tuple(seen)


def address_filter(cfg: IndexerConfig) -> tuple[str, ...]:
    return tuple(c.address for c in cfg.contracts)
