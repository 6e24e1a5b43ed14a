"""Canonical data model for the rebuild.

Vector's runtime datum is a schemaless ``Event`` value tree
(reference: lib/vector-core/src/event/mod.rs:51-55,
lib/vector-core/src/event/log_event.rs:49).  The Ray Data rebuild uses
typed Arrow columns for the known transcript fields plus an optional
``attrs`` JSON string column for open-keyed residual fields (SURVEY §1.5).

Primary input table (``BASELINE.json input_hint``)::

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp[us]
"""

from __future__ import annotations

import os

import pyarrow as pa

# The transcript schema — `text` is large_string so a single block of
# very wide rows can exceed 2 GiB of string offsets without overflow.
TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.large_string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# Stable sort key that replaces Vector's arrival-order FIFO semantics
# (reference: src/topology/builder.rs:976-1006 FuturesOrdered).
ORDER_KEYS = ["conv_id", "turn_idx"]

# Conventional key names, the LogSchema analogue
# (reference: lib/vector-core/src/config/log_schema.rs:48-78).
MESSAGE_KEY = "text"
TIMESTAMP_KEY = "ts"

# Columns added by the remap error policy when rerouting dropped events
# (reference: src/transforms/remap.rs:484-545 DROPPED annotation keys).
DROPPED_REASON = "metadata_dropped_reason"
DROPPED_COMPONENT_ID = "metadata_dropped_component_id"
DROPPED_COMPONENT_TYPE = "metadata_dropped_component_type"
DROPPED_COMPONENT_KIND = "metadata_dropped_component_kind"
DROPPED_MESSAGE = "metadata_dropped_message"

# Reserved route port names (reference: src/transforms/route.rs:17).
UNMATCHED_ROUTE = "_unmatched"
DEFAULT_ROUTE = "_default"


def scratch_dir() -> str:
    """Root for generated fixtures and pipeline outputs (never testdata)."""
    d = os.environ.get("VECTOR_RAY_SCRATCH", "/tmp/vector_ray")
    os.makedirs(d, exist_ok=True)
    return d


def sf_from_dir(sf_dir: str) -> float:
    """Extract the scale factor from a testdata dir name like '.../sf0.01'."""
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return 0.01
