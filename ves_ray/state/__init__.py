"""Checkpoint / lineage state (SURVEY T8–T9).

Batch translation of the reference's watcher checkpoint model
(components/core-agent/src/watcher/models.rs:46-58) and the durable
checkpoint-store ADR invariants
(components/core-agent/ADR/Watcher/000x-checkpoint-store.md:10-13,27-34):
the store is the source of truth, persists before in-memory updates,
and a restart must cause no duplicated and no skipped data.
"""
