"""DLC attestation parity tests.

Mirrors the reference's attestation property suite
(``crates/oracle/tests/api/attestation.rs:40-461``): the attestation
secret's public image equals the locking point precomputed for the winning
outcome message and no other; signing is deterministic in (key, nonce,
message); distinct nonces give unlinkable secrets; refund-all unlocks the
final outcome slot. Curve math is checked against public BIP340/SEC2 test
vectors first so a parity failure localizes to the attestation layer.
"""

from __future__ import annotations

import pytest

from noaa_oracle_spark.scoring import secp256k1 as ec
from noaa_oracle_spark.scoring.outcomes import (
    attestation_secret,
    attestation_unlocks_outcome,
    generate_outcome_messages,
    generate_ranking_permutations,
    get_winning_bytes,
    make_event_announcement,
    select_winners,
)

# Deterministic test scalars (arbitrary fixed values, not real keys).
SK = 0x1E99423A4ED27608A15A2616A2B0E9E52CED330AC530EDCC32C8FFC6A526AEDD
NONCE = 0x7E2554D7C33FF6A58E721E1A54C64B0B49FA3E4C5A04B9B2F2D96C67D3D1DAB1


class TestCurveVectors:
    """Public SEC2/BIP340 known-answer checks for the EC backend."""

    def test_generator_on_curve(self):
        assert ec.on_curve(ec.G)

    def test_scalar_mul_known_vectors(self):
        # 2G and 3G, public secp256k1 vectors.
        p2 = ec.point_mul(2)
        assert p2.x == int(
            "C6047F9441ED7D6D3045406E95C07CD85C778E4B8CEF3CA7ABAC09B95C709EE5",
            16,
        )
        p3 = ec.point_mul(3)
        assert p3.x == int(
            "F9308A019258C31049344F85F89D5229B531C845836F99B08601F113BCE036F9",
            16,
        )
        assert ec.on_curve(p2) and ec.on_curve(p3)

    def test_group_order(self):
        assert ec.is_infinity(ec.point_mul(ec.N))
        assert ec.point_mul(ec.N + 1) == ec.G

    def test_add_inverse(self):
        p5 = ec.point_mul(5)
        assert ec.is_infinity(ec.point_add(p5, ec.point_negate(p5)))

    def test_lift_x_roundtrip(self):
        p7 = ec.point_mul(7)
        lifted = ec.lift_x(p7.x, p7.y & 1)
        assert lifted == p7

    def test_tagged_hash_bip340_shape(self):
        # Tagged hash must differ from plain sha256 and be deterministic.
        a = ec.tagged_hash("BIP0340/challenge", b"msg")
        b = ec.tagged_hash("BIP0340/challenge", b"msg")
        c = ec.tagged_hash("BIP0340/aux", b"msg")
        assert a == b and a != c and len(a) == 32


class TestAttestation:
    def test_secret_unlocks_correct_outcome_only(self):
        # etl_workflow-style fixture: 3 entries, 2 places ⇒ P(3,2)+1 = 7.
        ann = make_event_announcement(
            SK, NONCE, total_allowed_entries=3, number_of_places_win=2
        )
        assert len(ann["locking_points"]) == 7
        winners = [2, 0]
        winner_bytes = get_winning_bytes(winners)
        idx = ann["outcome_messages"].index(winner_bytes)
        secret = attestation_secret(SK, NONCE, winner_bytes)
        assert attestation_unlocks_outcome(ann, secret, idx)
        for other in range(len(ann["locking_points"])):
            if other != idx:
                assert not attestation_unlocks_outcome(ann, secret, other)

    def test_deterministic(self):
        wb = get_winning_bytes([1, 2])
        assert attestation_secret(SK, NONCE, wb) == attestation_secret(
            SK, NONCE, wb
        )

    def test_unique_nonce_gives_distinct_secret(self):
        wb = get_winning_bytes([1, 2])
        s1 = attestation_secret(SK, NONCE, wb)
        s2 = attestation_secret(SK, NONCE + 1, wb)
        assert s1 != s2

    def test_refund_all_unlocks_last_outcome(self):
        # db/outcome_generator.rs appends the all-indices refund outcome
        # last; an all-zero-score event attests exactly that message.
        ann = make_event_announcement(
            SK, NONCE, total_allowed_entries=4, number_of_places_win=2
        )
        entries = [
            {"entry_id": f"0000000{i}", "score": None, "base_score": 0}
            for i in range(4)
        ]
        winners = select_winners(entries, 2)
        assert winners == [0, 1, 2, 3]
        wb = get_winning_bytes(winners)
        assert ann["outcome_messages"][-1] == wb
        secret = attestation_secret(SK, NONCE, wb)
        assert attestation_unlocks_outcome(
            ann, secret, len(ann["locking_points"]) - 1
        )

    def test_expiry_is_signing_date_plus_one_day(self):
        ann = make_event_announcement(
            SK, NONCE, 2, 1, signing_date_unix=1_723_500_000
        )
        assert ann["expiry"] == 1_723_500_000 + 86400

    def test_locking_point_algebra(self):
        # S = R + e·P must equal s·G componentwise, not just via the
        # unlock helper.
        wb = get_winning_bytes([0])
        pub = ec.point_mul(SK)
        npt = ec.point_mul(NONCE)
        s = ec.attestation_secret(SK, NONCE, wb)
        lock = ec.attestation_locking_point(pub, npt, wb)
        assert ec.point_mul(s) == lock
        assert ec.on_curve(lock)

    def test_message_count_matches_reference_scale(self):
        # 25 entries, 3 places ⇒ P(25,3) + 1 = 13,801 outcomes
        # (outcome_generator.rs:33-76 documented bound).
        perms = generate_ranking_permutations(25, 3)
        assert len(perms) == 25 * 24 * 23 + 1
        msgs = generate_outcome_messages(perms[:5])
        assert all(len(m) == 8 * len(p) for m, p in zip(msgs, perms[:5]))

    def test_zero_scalar_rejected(self):
        with pytest.raises(ValueError):
            ec.attestation_secret(0, NONCE, b"x")
        with pytest.raises(ValueError):
            ec.attestation_secret(SK, 0, b"x")
