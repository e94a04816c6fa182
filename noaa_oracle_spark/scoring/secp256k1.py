"""Minimal pure-Python secp256k1 + BIP340 tagged-hash primitives.

Implements exactly what the DLC attestation path needs (reference:
``crates/oracle/src/oracle.rs:823-859`` calls ``dlctix::attestation_secret``
/ ``attestation_locking_point``; announcement construction
``crates/oracle/src/db/mod.rs:122-149``):

    e = int(tagged_hash("BIP0340/challenge", xonly(R) || xonly(P) || msg)) % n
    attestation secret   s = (k + e * x) mod n          (Schnorr s-value)
    locking point        S = R + e * P                  (its public image)

so that ``s * G == S`` holds for the attested outcome message and no other —
the property the reference's test suite checks
(``crates/oracle/tests/api/attestation.rs:228-247``). Curve constants are
the public SEC2 secp256k1 parameters; the tagged-hash scheme is BIP340's.
Driver-side scalar math on ≤14k outcome points — never distributed work.

No parity normalization is applied (points are tracked as full affine
pairs, x-only serialization is used only inside the challenge hash), which
keeps secret/locking-point self-consistency for every key, matching the
adaptor-point usage here rather than strict BIP340 signature verification.
"""

from __future__ import annotations

import hashlib
from typing import NamedTuple

# SEC2 secp256k1 domain parameters (public constants).
P = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F
N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
GX = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
GY = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8


class Point(NamedTuple):
    """Affine secp256k1 point; ``None``-free — infinity is INFINITY below."""

    x: int
    y: int


INFINITY = Point(-1, -1)  # sentinel; never a valid curve point

G = Point(GX, GY)


def is_infinity(pt: Point) -> bool:
    return pt == INFINITY


def _add(a: Point, b: Point) -> Point:
    if is_infinity(a):
        return b
    if is_infinity(b):
        return a
    if a.x == b.x and (a.y + b.y) % P == 0:
        return INFINITY
    if a == b:
        lam = (3 * a.x * a.x) * pow(2 * a.y, P - 2, P) % P
    else:
        lam = (b.y - a.y) * pow(b.x - a.x, P - 2, P) % P
    x3 = (lam * lam - a.x - b.x) % P
    y3 = (lam * (a.x - x3) - a.y) % P
    return Point(x3, y3)


def point_add(a: Point, b: Point) -> Point:
    return _add(a, b)


def point_mul(k: int, pt: Point = G) -> Point:
    """Double-and-add scalar multiplication (driver-side, tiny workloads)."""
    k %= N
    acc = INFINITY
    addend = pt
    while k:
        if k & 1:
            acc = _add(acc, addend)
        addend = _add(addend, addend)
        k >>= 1
    return acc


def point_negate(pt: Point) -> Point:
    if is_infinity(pt):
        return pt
    return Point(pt.x, (-pt.y) % P)


def on_curve(pt: Point) -> bool:
    if is_infinity(pt):
        return False
    return (pt.y * pt.y - pt.x * pt.x * pt.x - 7) % P == 0


def xonly(pt: Point) -> bytes:
    """32-byte big-endian x coordinate (BIP340 x-only serialization)."""
    if is_infinity(pt):
        raise ValueError("cannot serialize the point at infinity")
    return pt.x.to_bytes(32, "big")


def serialize_compressed(pt: Point) -> bytes:
    """33-byte SEC1 compressed encoding (02/03 prefix by y parity)."""
    if is_infinity(pt):
        raise ValueError("cannot serialize the point at infinity")
    return bytes([0x02 + (pt.y & 1)]) + pt.x.to_bytes(32, "big")


def lift_x(x: int, parity: int = 0) -> Point:
    """Point with the given x and y-parity (0 = even), per BIP340 lift_x."""
    if not 0 <= x < P:
        raise ValueError("x out of field range")
    y_sq = (pow(x, 3, P) + 7) % P
    y = pow(y_sq, (P + 1) // 4, P)
    if y * y % P != y_sq:
        raise ValueError("x is not on the curve")
    if y & 1 != parity & 1:
        y = P - y
    return Point(x, y)


def tagged_hash(tag: str, data: bytes) -> bytes:
    """BIP340 tagged hash: SHA256(SHA256(tag) || SHA256(tag) || data)."""
    tag_digest = hashlib.sha256(tag.encode()).digest()
    return hashlib.sha256(tag_digest + tag_digest + data).digest()


def challenge(nonce_point: Point, pubkey_point: Point, message: bytes) -> int:
    """BIP340 challenge scalar e for (R, P, m), reduced mod n."""
    digest = tagged_hash(
        "BIP0340/challenge", xonly(nonce_point) + xonly(pubkey_point) + message
    )
    return int.from_bytes(digest, "big") % N


def attestation_secret(seckey: int, nonce: int, message: bytes) -> int:
    """Schnorr attestation scalar s = (k + e·x) mod n.

    Twin of ``dlctix::attestation_secret`` as used by oracle.rs:846-849:
    the scalar a DLC participant uses to decrypt the adaptor signature for
    the attested outcome.
    """
    seckey %= N
    nonce %= N
    if seckey == 0 or nonce == 0:
        raise ValueError("secret key and nonce must be non-zero scalars")
    pubkey_point = point_mul(seckey)
    nonce_point = point_mul(nonce)
    e = challenge(nonce_point, pubkey_point, message)
    return (nonce + e * seckey) % N


def attestation_locking_point(
    pubkey_point: Point, nonce_point: Point, message: bytes
) -> Point:
    """Public image S = R + e·P of the attestation secret.

    Twin of ``dlctix::attestation_locking_point`` as used by
    db/mod.rs:140-144 to precompute one locking point per possible outcome
    message at event-creation time.
    """
    e = challenge(nonce_point, pubkey_point, message)
    return point_add(nonce_point, point_mul(e, pubkey_point))


def attestation_unlocks(secret: int, locking_point: Point) -> bool:
    """True iff s·G equals the locking point — the DLC unlock condition."""
    return point_mul(secret) == locking_point
