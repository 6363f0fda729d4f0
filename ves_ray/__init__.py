"""ves_ray — a Ray-Data-native log/telemetry data-processing engine.

A from-scratch rebuild of the capabilities of the VES observability
pipeline (reference: /root/reference, H3IMD3LL-Labs-Inc/VES core-agent)
expressed Ray-Data-first:

- ``sources``   — Parquet fragment discovery + manifest (reference
  watcher/discovery semantics, batch analogue).
- ``stages``    — parse / enrich / route / aggregate / text analysis /
  dedup / similarity / multimodal operators as ``map_batches`` stages.
- ``state``     — per-partition checkpoint manifest + lineage records
  (reference Checkpoint/FileState + durable-store ADR invariants).
- ``pipelines`` — composed end-to-end dataflows (flagship
  parse→enrich→route→aggregate) and the query catalog.

Library code NEVER calls ``ray.init``/``ray.shutdown`` — the session is
owned by the driver, bench.py, or the test fixture.
"""

__version__ = "0.1.0"
