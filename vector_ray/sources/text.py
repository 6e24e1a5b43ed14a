"""Text/log-file source — the ``file`` source's batch analogue.

Reference (src/sources/file.rs:63-191): tail files, fingerprint →
byte-offset checkpoints, optional ``multiline`` aggregation merging
continuation lines into their start line.  Batch rebuild:
``ray.data.read_text`` (one task per file; resume = skip files whose
manifest entry is complete), plus a multiline aggregator.

Multiline semantics (the ``multiline.start_pattern`` mode): a line
matching ``start_pattern`` BEGINS a new event; non-matching lines
append to the current event with ``\\n``.  Because line→event grouping
is stateful across rows, the aggregation runs per FILE (each
read_text task yields one file's lines in order; we keep ``path`` via
``include_paths`` and group on it) — the partitioning assumption is
one-file-per-group, which read_text guarantees.
"""

from __future__ import annotations

import hashlib
import json
import os
import re

import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data import Dataset


def read_log_lines(paths, *, include_paths: bool = True) -> Dataset:
    return rd.read_text(paths, include_paths=include_paths)


# ---------------------------------------------------------------------------
# Checkpointed reads — the batch analogue of the file source's
# fingerprint → byte-offset checkpoints (src/sources/file.rs:88-102:
# `ignore_checkpoints`, `read_from = beginning|end`; file-source-common
# checkpointer persists fingerprint→position so a restart resumes where
# the last run stopped).
#
# Batch semantics: a "run" reads each file's NEW bytes — the window
# between the checkpointed offset and the last complete line — as a
# Dataset (one read task per file).  The caller commits the returned
# positions AFTER its sink succeeds, so a failed run re-reads the same
# window (at-least-once, same discipline as the manifest-based parquet
# resume in state/manifests.py).

_CHECKPOINT_FILE = "checkpoints.json"
_FINGERPRINT_BYTES = 256


def fingerprint_file(path: str, *, first_bytes: int = _FINGERPRINT_BYTES) -> str:
    """Checksum of the file's FIRST LINE (reference strategy
    `fingerprint.checksum` with `lines: 1`, file-source-common
    fingerprinter): stable as the file grows, and survives a
    rotate/rename because the path is deliberately excluded.  Files
    sharing a first line share a fingerprint — same caveat as the
    reference, which exposes `lines`/`ignored_header_bytes` for it;
    raise `first_bytes` here for the analogous control.  A file with
    no complete first line yet hashes its whole prefix (the reference
    would defer tracking; a batch run reads what exists)."""
    with open(path, "rb") as f:
        head = f.read(first_bytes)
    nl = head.find(b"\n")
    if nl >= 0:
        head = head[:nl + 1]
    return hashlib.blake2b(head, digest_size=16).hexdigest()


def load_checkpoints(checkpoint_dir: str) -> dict[str, int]:
    p = os.path.join(checkpoint_dir, _CHECKPOINT_FILE)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return {k: int(v) for k, v in json.load(f).items()}


def commit_checkpoints(checkpoint_dir: str, positions: dict[str, int]) -> None:
    """Merge new positions into the checkpoint file (tmp+rename, same
    idempotency discipline as the sinks)."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    merged = load_checkpoints(checkpoint_dir)
    merged.update(positions)
    p = os.path.join(checkpoint_dir, _CHECKPOINT_FILE)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(merged, f, sort_keys=True)
    os.replace(tmp, p)


def _complete_through(path: str, size: int) -> int:
    """Byte position just past the LAST newline at or before `size` —
    the tail never emits a partial line, so the read window and the
    committed checkpoint both stop there.  Scans backward in chunks
    from the end (driver-side, one small read per file)."""
    chunk = 8192
    with open(path, "rb") as f:
        end = size
        while end > 0:
            start = max(0, end - chunk)
            f.seek(start)
            buf = f.read(end - start)
            nl = buf.rfind(b"\n")
            if nl >= 0:
                return start + nl + 1
            end = start
    return 0


def plan_checkpointed_read(
    paths,
    *,
    checkpoint_dir: str,
    read_from: str = "beginning",
    ignore_checkpoints: bool = False,
):
    """Resolve each file to a (path, offset, end) window plus the
    positions to commit after a successful run.  Position options are
    reconciled like file.rs `reconcile_position_options`: an existing
    checkpoint wins unless `ignore_checkpoints`; otherwise `read_from`
    decides (`beginning` = whole file, `end` = skip existing content
    and only pick up bytes appended by the time of the NEXT run)."""
    if read_from not in ("beginning", "end"):
        raise ValueError("read_from must be 'beginning' or 'end'")
    cp = {} if ignore_checkpoints else load_checkpoints(checkpoint_dir)
    windows, positions = [], {}
    for path in paths:
        size = os.path.getsize(path)
        fp = fingerprint_file(path)
        if fp in cp:
            offset = cp[fp]
            if offset > size:  # truncated file: reference re-reads from 0
                offset = 0
        else:
            offset = 0 if read_from == "beginning" else size
        ct = _complete_through(path, size) if size else 0
        end = max(ct, offset)
        windows.append({"path": path, "offset": offset, "end": end})
        # commit the LINE BOUNDARY, never raw size: with read_from=
        # 'end' (or any tail past the last newline) offset can sit
        # mid-line; committing it would make the next run emit a torn
        # fragment once the line completes.  When offset is past ct
        # this window is empty and the next run re-plans from ct,
        # emitting the completed line whole.
        positions[fp] = ct
    return windows, positions


def read_log_lines_checkpointed(
    paths,
    *,
    checkpoint_dir: str,
    read_from: str = "beginning",
    ignore_checkpoints: bool = False,
) -> tuple[Dataset, dict[str, int]]:
    """Read each file's unread complete lines as a Dataset
    (`path`/`text` columns, one read task per file); returns the
    dataset plus the positions to `commit_checkpoints` once the
    consuming sink has succeeded."""
    windows, positions = plan_checkpointed_read(
        paths, checkpoint_dir=checkpoint_dir, read_from=read_from,
        ignore_checkpoints=ignore_checkpoints)
    live = [w for w in windows if w["end"] > w["offset"]]
    if not live:
        empty = pa.table({"path": pa.array([], pa.string()),
                          "text": pa.array([], pa.string())})
        return rd.from_arrow(empty), positions

    def read_window(t: pa.Table) -> pa.Table:
        out_paths, out_lines = [], []
        for path, off, end in zip(t["path"].to_pylist(),
                                  t["offset"].to_pylist(),
                                  t["end"].to_pylist()):
            with open(path, "rb") as f:
                f.seek(off)
                buf = f.read(end - off)
            lines = buf.decode("utf-8", errors="replace").split("\n")
            if lines and lines[-1] == "":
                lines.pop()
            out_lines.extend(lines)
            out_paths.extend([path] * len(lines))
        return pa.table({"path": pa.array(out_paths, pa.string()),
                         "text": pa.array(out_lines, pa.string())})

    specs = rd.from_items(live, override_num_blocks=len(live))
    ds = specs.map_batches(read_window, batch_format="pyarrow",
                           batch_size=None)
    return ds, positions


def aggregate_multiline(
    ds: Dataset,
    *,
    start_pattern: str,
    line_col: str = "text",
    path_col: str = "path",
) -> Dataset:
    """Merge continuation lines into their start line, per file."""
    rx_src = start_pattern

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        rx = re.compile(rx_src)
        events: list[str] = []
        cur: list[str] = []
        for line in g[line_col]:
            if rx.search(line) or not cur:
                if cur:
                    events.append("\n".join(cur))
                cur = [line]
            else:
                cur.append(line)
        if cur:
            events.append("\n".join(cur))
        return pd.DataFrame({path_col: g[path_col].iloc[0], line_col: events})

    return ds.groupby(path_col).map_groups(merge, batch_format="pandas")
