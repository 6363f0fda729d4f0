"""Arrow schemas for every table the engine produces or consumes.

The input shape is fixed by BASELINE.json ``input_hint``:
``(doc_id: string, tokens: list<int32>, n_tok: int32, source: string)``
— the batch analogue of the reference's raw ``TailerPayload`` chunks
(components/core-agent/src/tailer/models.rs:76-82), normalized to a
fixed schema as the reference's planned normalization stage intended
(components/core-agent/src/tailer/manager.rs:28-30).
"""

from __future__ import annotations

import pyarrow as pa

VOCAB_SIZE = 50_257
MAX_TOKENS = 512

SEQUENCES_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("tokens", pa.list_(pa.int32())),
    ("n_tok", pa.int32()),
    ("source", pa.string()),
])

# source → enrichment metadata lookup (broadcast small side, SURVEY T4)
SOURCES_SCHEMA = pa.schema([
    ("source", pa.string()),
    ("tenant", pa.string()),
    ("severity", pa.string()),
    ("route", pa.string()),
    ("hot", pa.bool_()),
])

# after parse (SURVEY T1–T3): extracted structure + validity flag;
# invalid rows are flagged, never silently dropped.
PARSED_EXTRA = [
    ("src", pa.string()),      # source extracted from doc_id by grok/regex
    ("seq_idx", pa.int64()),   # monotone index extracted from doc_id
    ("parse_ok", pa.bool_()),
]

# after enrich (T4)
ENRICHED_EXTRA = [
    ("tenant", pa.string()),
    ("severity", pa.string()),
    ("route", pa.string()),
]

# after routing-key assignment (T5)
ROUTED_EXTRA = [("salt", pa.int32())]

ROUTED_SCHEMA = pa.schema(
    list(SEQUENCES_SCHEMA) + PARSED_EXTRA + ENRICHED_EXTRA + ROUTED_EXTRA
)

# per-partition lineage record (T8; reference FileState/Checkpoint
# analogue — components/core-agent/src/watcher/models.rs:46-58)
LINEAGE_SCHEMA = pa.schema([
    ("fragment", pa.string()),    # input file path (inode analogue)
    ("rows", pa.int64()),
    ("n_tok_sum", pa.int64()),
    ("checksum", pa.int64()),     # order-insensitive, 63-bit
    ("wall_s", pa.float64()),
])

DEFAULT_ROUTE = "route-default"
DEFAULT_TENANT = "tenant-default"
DEFAULT_SEVERITY = "info"
