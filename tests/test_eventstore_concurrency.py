"""Single-writer serialization under concurrent mutations — the property
the reference gets from its mpsc writer channel (sqlite.rs:24-72)."""

from __future__ import annotations

import threading
import uuid

import pytest
from noaa_oracle_spark.eventstore import EventStore


def uuid_v7(ms: int, seq: int) -> str:
    b = ms.to_bytes(6, "big") + bytes([0x70, seq % 256, 0x80] + [0] * 7)
    return str(uuid.UUID(bytes=b))


def test_concurrent_entry_adds_serialize(spark, tmp_path):
    store = EventStore(spark, str(tmp_path / "ev"))
    eid = uuid_v7(1_700_000_000_000, 0)
    store.create_event(
        eid,
        total_allowed_entries=20,
        number_of_places_win=3,
        number_of_values_per_entry=2,
        signing_date=3_000_000_000,
        start_observation_date=2_000_000_000,
        end_observation_date=2_500_000_000,
        locations=["KAAA"],
    )

    errors: list[Exception] = []

    def add(batch: int) -> None:
        try:
            store.add_entries(
                eid,
                [
                    {
                        "id": uuid_v7(1_700_000_001_000 + batch, i),
                        "choices": [{"station": "KAAA", "temp_high": "over"}],
                    }
                    for i in range(2)
                ],
            )
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=add, args=(b,)) for b in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert not errors, errors
    # every batch landed exactly once — no lost updates from racing writers
    entries = store.event_entries(eid).collect()
    assert len(entries) == 10
    assert len({r["id"] for r in entries}) == 10
    choices = store.entry_choices(eid).collect()
    assert len(choices) == 10


def test_concurrent_score_updates_last_write_consistent(spark, tmp_path):
    store = EventStore(spark, str(tmp_path / "ev2"))
    eid = uuid_v7(1_700_000_000_000, 1)
    store.create_event(
        eid, total_allowed_entries=4, number_of_places_win=1,
        number_of_values_per_entry=1, signing_date=3_000_000_000,
        start_observation_date=2_000_000_000,
        end_observation_date=2_500_000_000, locations=["KAAA"],
    )
    ids = [uuid_v7(1_700_000_002_000, i) for i in range(4)]
    store.add_entries(eid, [{"id": i, "choices": []} for i in ids])

    def update(score: int) -> None:
        store.update_entry_scores([(i, score, score // 1000) for i in ids])

    threads = [threading.Thread(target=update, args=(s,)) for s in (1000, 2000, 3000)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    rows = store.event_entries(eid).collect()
    scores = {r["score"] for r in rows}
    # serialized writes → ONE batch won wholesale; no torn mix of batches
    assert len(scores) == 1 and scores.issubset({1000, 2000, 3000})
