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
scalars (oracle.rs:846-849). No secp library ships in this runtime, so
`attestation_secret` raises NotImplementedError unless a library is
available (import-gated), keeping the interface real and the crypto
pluggable.
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


def attestation_secret(private_key, nonce, winner_bytes: bytes):
    """DLC attestation secret (oracle.rs:846-849). Requires a secp256k1
    implementation; stubbed until one is present in the runtime."""
    try:
        import secp256k1  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "attestation requires a secp256k1 library (not in this runtime); "
            "scores/winners/outcome messages above are complete inputs to it"
        ) from exc
    raise NotImplementedError("secp256k1 wiring not implemented")
