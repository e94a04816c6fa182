"""Crash-safe parquet state swaps for the incremental stores.

Two invariants every store here needs:

1. **State and its metadata commit together.** The processed-file manifest
   (or streaming batch marker) lives INSIDE the state directory as an
   underscore-prefixed file — Spark/Hadoop readers ignore `_*` files, and
   the directory rename that publishes the new state publishes the
   metadata in the same atomic step. Writing metadata as a separate
   post-swap step would open the classic torn-commit window: a crash after
   the state swap but before the metadata write leaves a state that
   already contains the new files with a manifest that says it doesn't —
   the re-run then folds the same files AGAIN, double-counting every sum.

2. **The old state survives until the new one is published.** Delete-then-
   rename loses everything if the process dies between the two. The swap
   here parks the old state at `<state>.old`, renames the new one in, then
   deletes the parked copy; `recover()` (called before any read) heals the
   one remaining window — death between the two renames — by renaming the
   parked state back. Every crash point therefore resolves to either the
   old consistent state or the new consistent state, never to nothing and
   never to a half-commit.
"""

from __future__ import annotations

import json
import os
import shutil


def meta_path(state_path: str, name: str = "_manifest.json") -> str:
    return os.path.join(state_path, name)


def read_meta(state_path: str, name: str = "_manifest.json") -> dict | None:
    recover(state_path)
    p = meta_path(state_path, name)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def recover(state_path: str) -> None:
    """Heal a crash between the two publication renames: if the state is
    missing but the parked old state exists, restore it."""
    old = state_path + ".old"
    if not os.path.exists(state_path) and os.path.exists(old):
        os.rename(old, state_path)
    # a parked copy alongside a live state means the crash happened after
    # publication but before cleanup — the live state wins
    if os.path.exists(state_path) and os.path.exists(old):
        shutil.rmtree(old)


def publish(state_path: str, tmp_path: str, meta: dict,
            meta_name: str = "_manifest.json") -> None:
    """Atomically publish `tmp_path` (a freshly-written parquet dir) as the
    new state, embedding `meta` so state+metadata commit together."""
    with open(meta_path(tmp_path, meta_name), "w") as f:
        json.dump(meta, f)
    recover(state_path)
    old = state_path + ".old"
    if os.path.exists(state_path):
        os.rename(state_path, old)
    os.rename(tmp_path, state_path)
    if os.path.exists(old):
        shutil.rmtree(old)
