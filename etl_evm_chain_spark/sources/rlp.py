"""Minimal RLP encoder + legacy-transaction signing hash (SURVEY
§2.G5 support).

The reference recovers senders with go-ethereum ``types.Sender(
LatestSignerForChainID(id), tx)`` (`/root/reference/internal/parser/
parser.go:152-159`), which internally RLP-encodes the transaction
fields and keccak-hashes them. This module provides that missing
piece for legacy (type-0) transactions so ``abi.recover_sender`` can
start from raw tx fields instead of a precomputed signing hash:

    sighash = keccak256(rlp([nonce, gasPrice, gas, to, value, data]))
    (EIP-155: ... + [chainId, 0, 0])

RLP is the standard Ethereum serialization (yellow paper appendix B):
byte strings < 56 bytes get a 0x80+len prefix (single bytes < 0x80
are themselves), longer strings a 0xb7+lenlen prefix; lists use
0xc0/0xf7 the same way. Integers encode as minimal big-endian (zero
is the empty string).
"""

from __future__ import annotations

from .keccak import keccak256


def _encode_length(n: int, offset: int) -> bytes:
    if n < 56:
        return bytes([offset + n])
    ln = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([offset + 55 + len(ln)]) + ln


def encode(item) -> bytes:
    """RLP-encode bytes, int, str (utf-8), or a (nested) list."""
    if isinstance(item, int):
        if item < 0:
            raise ValueError("RLP cannot encode negative integers")
        item = b"" if item == 0 else \
            item.to_bytes((item.bit_length() + 7) // 8, "big")
    if isinstance(item, str):
        item = item.encode()
    if isinstance(item, (bytes, bytearray)):
        b = bytes(item)
        if len(b) == 1 and b[0] < 0x80:
            return b
        return _encode_length(len(b), 0x80) + b
    if isinstance(item, (list, tuple)):
        body = b"".join(encode(x) for x in item)
        return _encode_length(len(body), 0xC0) + body
    raise TypeError(f"cannot RLP-encode {type(item).__name__}")


def _addr_bytes(to: str | bytes | None) -> bytes:
    if to is None or to == "" or to == b"":
        return b""                      # contract creation
    if isinstance(to, str):
        return bytes.fromhex(to.removeprefix("0x"))
    return bytes(to)


def legacy_sighash(*, nonce: int, gas_price: int, gas: int,
                   to: str | bytes | None, value: int,
                   data: str | bytes = b"",
                   chain_id: int | None = None) -> bytes:
    """Signing hash of a legacy transaction: pre-EIP-155 (6 fields)
    when ``chain_id`` is None, else the EIP-155 9-field form —
    exactly what go-ethereum's HomesteadSigner/EIP155Signer hash."""
    if isinstance(data, str):
        data = bytes.fromhex(data.removeprefix("0x"))
    fields: list = [nonce, gas_price, gas, _addr_bytes(to), value, data]
    if chain_id is not None:
        fields += [chain_id, 0, 0]
    return keccak256(encode(fields))


def chain_id_from_v(v: int) -> int | None:
    """EIP-155: v = chainId·2 + 35 + parity; legacy 27/28 → None."""
    return (v - 35) // 2 if v >= 35 else None


def _access_list_fields(access_list) -> list:
    """RPC accessList → RLP shape: [[address_bytes, [key_bytes …]] …]."""
    out = []
    for entry in access_list or []:
        addr = _addr_bytes(entry.get("address") if isinstance(entry, dict)
                           else entry[0])
        keys = (entry.get("storageKeys") if isinstance(entry, dict)
                else entry[1]) or []
        out.append([addr, [bytes.fromhex(str(k).removeprefix("0x"))
                           for k in keys]])
    return out


def typed_sighash(*, tx_type: int, chain_id: int, nonce: int, gas: int,
                  to: str | bytes | None, value: int,
                  data: str | bytes = b"", access_list=None,
                  gas_price: int = 0,
                  max_priority_fee: int = 0, max_fee: int = 0) -> bytes:
    """Signing hash of an EIP-2718 typed transaction:
    ``keccak256(type_byte ‖ rlp(fields))`` — type 1 (EIP-2930:
    [chainId, nonce, gasPrice, gas, to, value, data, accessList]) and
    type 2 (EIP-1559: [chainId, nonce, maxPriorityFee, maxFee, gas,
    to, value, data, accessList]). The signature's v is the raw
    yParity bit for both."""
    if isinstance(data, str):
        data = bytes.fromhex(data.removeprefix("0x"))
    al = _access_list_fields(access_list)
    if tx_type == 1:
        fields = [chain_id, nonce, gas_price, gas, _addr_bytes(to),
                  value, data, al]
    elif tx_type == 2:
        fields = [chain_id, nonce, max_priority_fee, max_fee, gas,
                  _addr_bytes(to), value, data, al]
    else:
        raise ValueError(f"unsupported typed transaction type {tx_type}")
    return keccak256(bytes([tx_type]) + encode(fields))


def legacy_tx_sender(*, nonce: int, gas_price: int, gas: int,
                     to: str | bytes | None, value: int,
                     data: str | bytes, v: int, r: int, s: int) -> str | None:
    """Full ``types.Sender`` for a legacy transaction: derive the
    chain id from v, build the signing hash, recover the address."""
    from .secp256k1 import recover_address

    h = legacy_sighash(nonce=nonce, gas_price=gas_price, gas=gas, to=to,
                       value=value, data=data,
                       chain_id=chain_id_from_v(v))
    return recover_address(h, r, s, v)
