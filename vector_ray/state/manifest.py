"""Per-partition lineage manifests — the rebuild's durability story.

Vector achieves at-least-once delivery with end-to-end acks and disk
buffers (lib/vector-common/src/finalization.rs:323-342,
lib/vector-buffers/src/variants/disk_v2/); a batch engine replaces
that with *re-runnable stages + idempotent partitioned writes*
(SURVEY §4): each (sink, partition) records a manifest entry
``{inputs, row_count, output_files, completed_at}`` written atomically
AFTER the partition's write succeeds.  A restarted run skips
partitions whose entry is complete — the ``file`` source's
fingerprint→offset checkpoint analogue
(lib/file-source/src/checkpointer.rs:33-122).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any


def sink_manifest_path(sink_dir: str) -> str:
    return os.path.join(sink_dir, "_manifest.json")


class RunManifest:
    """Atomic JSON manifest for one sink directory.

    Layout: ``{"partitions": {partition_id: {inputs, row_count,
    output_files, completed_at}}, "sink": ...}``.
    """

    def __init__(self, sink_dir: str, sink_name: str = ""):
        self.sink_dir = sink_dir
        self.path = sink_manifest_path(sink_dir)
        self.sink_name = sink_name
        self._data: dict[str, Any] = {"sink": sink_name, "partitions": {}}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self._data = json.load(f)

    def is_complete(self, partition_id: str) -> bool:
        return partition_id in self._data["partitions"]

    def completed_partitions(self) -> list[str]:
        return sorted(self._data["partitions"])

    def row_count(self, partition_id: str | None = None) -> int:
        parts = self._data["partitions"]
        if partition_id is not None:
            return parts[partition_id]["row_count"]
        return sum(p["row_count"] for p in parts.values())

    def completed_output_files(self) -> set[str]:
        """Relative paths recorded by EVERY completed partition — files a
        crash-cleanup must never delete."""
        out: set[str] = set()
        for p in self._data["partitions"].values():
            out.update(p.get("output_files", ()))
        return out

    def mark_complete(
        self,
        partition_id: str,
        *,
        inputs: list[str],
        row_count: int,
        output_files: list[str],
        file_stats: dict | None = None,
        metrics: dict | None = None,
    ) -> None:
        entry: dict[str, Any] = {
            "inputs": inputs,
            "row_count": int(row_count),
            "output_files": output_files,
            "completed_at": time.time(),
        }
        if file_stats:
            # zone maps: {relpath: {"rows": n, col: [min, max], ...}}
            entry["file_stats"] = file_stats
        if metrics:
            # per-partition write metrics: bytes / wall_s / files
            entry["metrics"] = metrics
        self._data["partitions"][partition_id] = entry
        self._flush()

    def _flush(self) -> None:
        os.makedirs(self.sink_dir, exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._data, f, indent=1)
        os.replace(tmp, self.path)  # atomic publish
