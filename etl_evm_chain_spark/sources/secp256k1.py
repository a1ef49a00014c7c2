"""Pure-Python secp256k1 ECDSA public-key recovery (SURVEY §2.G5).

The reference recovers the transaction sender per log via go-ethereum
``types.Sender(signer, tx)`` (`/root/reference/internal/parser/
parser.go:152-159`). This module provides the same primitive without a
native dependency: recover the public key from (msg_hash, r, s, v) and
derive the 0x address as keccak256(pubkey)[12:] — the exact signer
math, in Python big ints (like the repo's pure-Python keccak).

Performance note: ~5 ms/signature in pure Python. Fine for golden
tests, spot audits, and modest live-extract batches (Arrow UDF in
``abi.recover_sender`` batches rows per task); the production path for
bulk backfills remains the pre-landed ``transactions(tx_hash,
tx_from)`` dim join (``abi.enrich``), which avoids per-row crypto
entirely.

Curve math: Jacobian-coordinate point arithmetic (textbook add/double
formulas) so a 256-bit scalar multiplication costs ONE modular
inversion at the end instead of one per point add — ~10× faster than
naive affine, ~5 ms per recovery. Public constants from SEC 2
(secp256k1).
"""

from __future__ import annotations

from .keccak import keccak256

# SEC 2 secp256k1 domain parameters
P = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F
N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
GX = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
GY = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8
B = 7

Point = tuple[int, int] | None  # None = point at infinity


# Jacobian point: (X, Y, Z) with x = X/Z², y = Y/Z³; Z=0 ⇒ infinity.
_JINF = (0, 1, 0)


def _jdouble(p):
    x, y, z = p
    if not y or not z:
        return _JINF
    s = 4 * x * y * y % P
    m = 3 * x * x % P                      # a=0 curve: no a·Z⁴ term
    x3 = (m * m - 2 * s) % P
    y3 = (m * (s - x3) - 8 * pow(y, 4, P)) % P
    return x3, y3, 2 * y * z % P


def _jadd(p, q):
    if not p[2]:
        return q
    if not q[2]:
        return p
    x1, y1, z1 = p
    x2, y2, z2 = q
    z1s, z2s = z1 * z1 % P, z2 * z2 % P
    u1, u2 = x1 * z2s % P, x2 * z1s % P
    s1, s2 = y1 * z2s * z2 % P, y2 * z1s * z1 % P
    if u1 == u2:
        return _jdouble(p) if s1 == s2 else _JINF
    h = (u2 - u1) % P
    r = (s2 - s1) % P
    h2 = h * h % P
    h3 = h2 * h % P
    u1h2 = u1 * h2 % P
    x3 = (r * r - h3 - 2 * u1h2) % P
    y3 = (r * (u1h2 - x3) - s1 * h3) % P
    return x3, y3, h * z1 * z2 % P


def _to_affine(p) -> Point:
    x, y, z = p
    if not z:
        return None
    zi = pow(z, -1, P)
    zi2 = zi * zi % P
    return x * zi2 % P, y * zi2 * zi % P


def _add(p1: Point, p2: Point) -> Point:
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    return _to_affine(_jadd((*p1, 1), (*p2, 1)))


def _mul(k: int, pt: Point) -> Point:
    if pt is None:
        return None
    acc, j = _JINF, (*pt, 1)
    while k:
        if k & 1:
            acc = _jadd(acc, j)
        j = _jdouble(j)
        k >>= 1
    return _to_affine(acc)


def _mul2(k1: int, p1: Point, k2: int, p2: Point) -> Point:
    """k1·p1 + k2·p2 with interleaved doubling (Shamir's trick) and a
    single final inversion — the recovery hot path."""
    j1 = _JINF if p1 is None else (*p1, 1)
    j2 = _JINF if p2 is None else (*p2, 1)
    both = _jadd(j1, j2)
    acc = _JINF
    for i in range(max(k1.bit_length(), k2.bit_length()) - 1, -1, -1):
        acc = _jdouble(acc)
        b1, b2 = (k1 >> i) & 1, (k2 >> i) & 1
        if b1 and b2:
            acc = _jadd(acc, both)
        elif b1:
            acc = _jadd(acc, j1)
        elif b2:
            acc = _jadd(acc, j2)
    return _to_affine(acc)


def _lift_x(x: int, odd: bool) -> Point:
    """Point on the curve with this x and requested y parity, or None."""
    y2 = (pow(x, 3, P) + B) % P
    y = pow(y2, (P + 1) // 4, P)  # works since P ≡ 3 mod 4
    if y * y % P != y2:
        return None
    if (y & 1) != odd:
        y = P - y
    return x, y


def recovery_id(v: int) -> int:
    """Normalize any Ethereum v encoding to the 0/1 parity bit:
    raw {0,1}, legacy {27,28}, or EIP-155 {chainId·2+35+parity}."""
    if v in (0, 1):
        return v
    if v in (27, 28):
        return v - 27
    if v >= 35:
        return (v - 35) % 2
    raise ValueError(f"invalid recovery v: {v}")


def recover_pubkey(msg_hash: bytes, r: int, s: int, v: int) -> Point:
    """SEC 1 §4.1.6 public-key recovery. Returns the (x, y) public
    point, or None when the signature does not yield a valid point."""
    if not (1 <= r < N and 1 <= s < N):
        return None
    rec = recovery_id(v)
    # Ethereum r is always < N (the x ∈ [N, P) overflow case adds N;
    # go-ethereum rejects it too), so x = r directly.
    R = _lift_x(r, odd=bool(rec & 1))
    if R is None:
        return None
    e = int.from_bytes(msg_hash, "big") % N
    r_inv = pow(r, -1, N)
    # Q = r⁻¹·(s·R − e·G) = r⁻¹·(s·R + (N−e)·G), via one dual-scalar
    # ladder + one plain ladder
    t = _mul2(s, R, (N - e) % N, (GX, GY))
    return None if t is None else _mul(r_inv, t)


def pubkey_to_address(pub: Point) -> str | None:
    """keccak256(x‖y)[12:] as a lowercase 0x address."""
    if pub is None:
        return None
    x, y = pub
    digest = keccak256(x.to_bytes(32, "big") + y.to_bytes(32, "big"))
    return "0x" + digest[12:].hex()


def recover_address(msg_hash: bytes, r: int, s: int, v: int) -> str | None:
    return pubkey_to_address(recover_pubkey(msg_hash, r, s, v))


# -- test/support helpers ------------------------------------------------

def priv_to_address(priv: int) -> str:
    """Address of a private key (for golden vectors and tests)."""
    return pubkey_to_address(_mul(priv, (GX, GY)))


def sign(msg_hash: bytes, priv: int, nonce: int) -> tuple[int, int, int]:
    """Textbook ECDSA sign with an explicit nonce — exists so tests can
    produce signatures to recover without an external library. Returns
    (r, s, v∈{27,28}) with the low-s normalization Ethereum enforces."""
    e = int.from_bytes(msg_hash, "big") % N
    R = _mul(nonce, (GX, GY))
    assert R is not None
    r = R[0] % N
    s = pow(nonce, -1, N) * (e + r * priv) % N
    rec = R[1] & 1
    if s > N // 2:  # low-s: flipping s mirrors R's parity
        s = N - s
        rec ^= 1
    return r, s, 27 + rec
