"""Shared streaming idempotency helpers."""

from __future__ import annotations

import os
import uuid


def run_id_for_checkpoint(checkpoint_dir: str | None, filename: str) -> str:
    """Mint-or-read a run id tied to a CHECKPOINT LINEAGE — the ONE
    definition of the idiom behind every (run, batch)-keyed idempotent
    writer (ingest ledger + near-dup index, quarantine sink, the
    sessionize CLI sink): an invocation restarted on the same
    checkpoint REUSES the id, so a replayed micro-batch overwrites its
    own (run, batch) partitions instead of duplicating; a fresh
    checkpoint mints a new id, so prior runs' partitions are consulted
    (or preserved as evidence), never clobbered. With no checkpoint at
    all the id is per-invocation — nothing can replay without one."""
    if not checkpoint_dir:
        return uuid.uuid4().hex
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.join(checkpoint_dir, filename)
    if os.path.exists(path):
        with open(path) as f:
            return f.read().strip()
    run_id = uuid.uuid4().hex
    with open(path, "w") as f:
        f.write(run_id)
    return run_id


def read_run_id(checkpoint_dir: str, filename: str) -> str:
    """READ-ONLY twin of run_id_for_checkpoint for reader paths: resolve
    the run id a checkpoint lineage minted, REFUSING (instead of
    minting) when the file is absent. A reader that minted would (a)
    mutate the checkpoint dir as a side effect of a read and (b) filter
    the state to a run id that never wrote anything — silently
    answering 0/empty for every probe on a typo'd path or a cleaned
    checkpoint, exactly the failure a refusal makes loud."""
    path = os.path.join(checkpoint_dir, filename)
    if not os.path.exists(path):
        raise ValueError(
            f"no run id file {filename!r} under checkpoint "
            f"{checkpoint_dir!r} — this checkpoint never ran a monitor "
            "(typo'd path, or a cleaned checkpoint dir?)"
        )
    with open(path) as f:
        return f.read().strip()
