"""Outcome enumeration, winner selection, and attestation plumbing.

Driver-side by design: outcome counts are tiny (≤ 25 entries, ≤ 5 places ⇒
P(25,3)+1 = 13,801 outcomes, crates/oracle/src/db/outcome_generator.rs:33-76)
— enumerating them is not distributed work; the *scores* feeding them come
from the Spark kernel.

Parity targets:
  generate_ranking_permutations / generate_outcome_messages
      outcome_generator.rs:5-26 — P(n,k) ordered permutations plus one
      "refund all" outcome; messages are concatenated big-endian u64 bytes.
  select_winners / get_winning_bytes
      oracle.rs:776-859, :902-907 — entries sorted by UUIDv7 id give the
      index space; all-zero base scores ⇒ refund-all; else top-K by score
      descending mapped back to id-order indices.

Attestation: the reference computes a DLC attestation secret with secp256k1
scalars (oracle.rs:846-849) via the public dlctix primitives. This module
implements the same scheme on a pure-Python secp256k1/BIP340 backend
(scoring/secp256k1.py): announcement-time locking points per outcome
message, signing-time attestation scalar, and the unlock check pairing
them (tests/api/attestation.rs:228-247 semantics).
"""

from __future__ import annotations

from itertools import permutations


def generate_ranking_permutations(
    num_players: int, rankings: int
) -> list[list[int]]:
    """All ordered top-`rankings` outcomes + the refund-all outcome."""
    perms = [list(p) for p in permutations(range(num_players), rankings)]
    perms.append(list(range(num_players)))
    return perms


def get_winning_bytes(winners: list[int]) -> bytes:
    """Concatenated 8-byte big-endian indices (usize::to_be_bytes on 64-bit,
    oracle.rs:902-907)."""
    return b"".join(idx.to_bytes(8, "big") for idx in winners)


def generate_outcome_messages(
    possible_user_outcomes: list[list[int]],
) -> list[bytes]:
    return [get_winning_bytes(o) for o in possible_user_outcomes]


def select_winners(
    entries: list[dict],
    number_of_places_win: int,
) -> list[int]:
    """Winner indices in id-sorted order.

    `entries`: dicts with entry_id (UUIDv7 string), score (int|None),
    base_score (int|None). Mirrors oracle.rs:783-820: the index space is
    entries sorted by id ascending; if every base_score is 0/None the
    outcome is refund-all (all indices); otherwise top-K by score
    descending (stable on input order for equal scores — scores are unique
    by construction of the ms tiebreaker)."""
    id_sorted = sorted(entries, key=lambda e: e["entry_id"])
    if not id_sorted:
        return []
    if all((e.get("base_score") or 0) == 0 for e in id_sorted):
        return list(range(len(id_sorted)))
    with_scores = [e for e in entries if e.get("score") is not None]
    top = sorted(
        range(len(with_scores)),
        key=lambda i: (-with_scores[i]["score"], i),
    )[:number_of_places_win]
    index_of = {e["entry_id"]: i for i, e in enumerate(id_sorted)}
    return [index_of[with_scores[i]["entry_id"]] for i in top]


def attestation_secret(private_key: int, nonce: int, winner_bytes: bytes) -> int:
    """DLC attestation secret s = (nonce + e·sk) mod n (oracle.rs:846-849).

    Backed by the pure-Python secp256k1/BIP340 module — no external crypto
    dependency. The returned scalar's public image is the locking point the
    announcement precomputed for `winner_bytes`; `attestation_unlocks`
    verifies the pairing (tests/api/attestation.rs:228-247 semantics)."""
    from noaa_oracle_spark.scoring import secp256k1 as ec

    return ec.attestation_secret(private_key, nonce, winner_bytes)


def make_event_announcement(
    private_key: int,
    nonce: int,
    total_allowed_entries: int,
    number_of_places_win: int,
    signing_date_unix: int | None = None,
) -> dict:
    """Event-creation-time announcement (db/mod.rs:122-149 parity).

    Enumerates every possible ranking outcome plus refund-all, serializes
    each as winner bytes, and precomputes one locking point per message:
    ``locking_points[i] = R + e_i·P``. Expiry is signing date + 1 day
    (db/mod.rs:136-139) so users can recover funds if the oracle never
    signs. Returns outcome_messages alongside so the attested message can
    be located by index."""
    from noaa_oracle_spark.scoring import secp256k1 as ec

    pubkey = ec.point_mul(private_key)
    nonce_point = ec.point_mul(nonce)
    outcomes = generate_ranking_permutations(
        total_allowed_entries, number_of_places_win
    )
    messages = generate_outcome_messages(outcomes)
    locking_points = [
        ec.attestation_locking_point(pubkey, nonce_point, msg)
        for msg in messages
    ]
    expiry = (
        signing_date_unix + 86400 if signing_date_unix is not None else None
    )
    return {
        "expiry": expiry,
        "outcome_messages": messages,
        "locking_points": locking_points,
        "nonce_point": nonce_point,
        "oracle_pubkey": pubkey,
    }


def attestation_unlocks_outcome(
    announcement: dict, secret: int, outcome_index: int
) -> bool:
    """True iff `secret`'s public image is exactly the locking point for
    `outcome_index` — the Outcome::Attestation(i) validity check."""
    from noaa_oracle_spark.scoring import secp256k1 as ec

    return ec.attestation_unlocks(
        secret, announcement["locking_points"][outcome_index]
    )
