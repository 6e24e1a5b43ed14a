"""The ``remap`` transform — program-per-batch with Vector's error policy.

Reference semantics (src/transforms/remap.rs):
- the program runs per event and may add/modify/drop fields
  (remap.rs:556-633 run loop);
- on runtime error with ``drop_on_error=false`` the ORIGINAL event is
  forwarded unmodified (remap.rs:556-575,621-624) — "keep original";
- with ``drop_on_error=true`` the event is discarded;
- with ``reroute_dropped=true`` discarded events go to the ``dropped``
  port annotated with ``metadata.dropped.{reason, message,
  component_id, component_type, component_kind}`` (remap.rs:484-545).

Rebuild: the program is a vectorized batch function
``fn(pa.Table) -> (pa.Table, error_mask, error_msg)`` where the
returned table has the same row count, original columns preserved, and
parsed/derived columns null on error rows (mask-based blend, never
exception-per-row — SURVEY §7.4).  One ``map_batches`` labels every row;
the primary/dropped ports are lazy filters over the labeled dataset.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from vector_ray.model import (
    DROPPED_COMPONENT_ID,
    DROPPED_COMPONENT_KIND,
    DROPPED_COMPONENT_TYPE,
    DROPPED_MESSAGE,
    DROPPED_REASON,
)

ERROR_COL = "__remap_error"
ERROR_MSG_COL = "__remap_error_msg"

Program = Callable[[pa.Table], Tuple[pa.Table, Optional[pa.Array], Optional[pa.Array]]]


class RemapResult:
    """Two ports, mirroring remap's primary + ``dropped`` outputs."""

    def __init__(self, labeled: Dataset, *, drop_on_error: bool,
                 reroute_dropped: bool, component_id: str):
        self._labeled = labeled
        self._drop = drop_on_error
        self._reroute = reroute_dropped
        self._component_id = component_id

    @property
    def primary(self) -> Dataset:
        if not self._drop:
            # keep-original: with drop_on_error=false NOTHING is dropped —
            # error rows forward unmodified (remap.rs:556-575) and the
            # dropped port, if any, stays empty. reroute_dropped only
            # reroutes events that would otherwise be DROPPED.
            return self._labeled.map_batches(_strip_labels, batch_format="pyarrow", batch_size=None)
        return self._labeled.map_batches(_keep_ok, batch_format="pyarrow", batch_size=None)

    @property
    def dropped(self) -> Dataset:
        if not self._reroute:
            raise ValueError("dropped port requires reroute_dropped=True")
        cid = self._component_id
        if not self._drop:
            # nothing is dropped when drop_on_error=false -> empty port
            return self._labeled.map_batches(
                lambda t: _keep_dropped(t.slice(0, 0), cid),
                batch_format="pyarrow", batch_size=None,
            )
        return self._labeled.map_batches(
            lambda t: _keep_dropped(t, cid), batch_format="pyarrow", batch_size=None
        )

    @property
    def labeled(self) -> Dataset:
        """The single-pass labeled dataset (both ports derivable)."""
        return self._labeled


def _strip_labels(t: pa.Table) -> pa.Table:
    return t.drop_columns([c for c in (ERROR_COL, ERROR_MSG_COL) if c in t.column_names])


def _keep_ok(t: pa.Table) -> pa.Table:
    return _strip_labels(t.filter(pc.invert(t[ERROR_COL])))


def _keep_dropped(t: pa.Table, component_id: str) -> pa.Table:
    d = t.filter(t[ERROR_COL])
    n = d.num_rows
    msg = d[ERROR_MSG_COL] if ERROR_MSG_COL in d.column_names else pa.nulls(n, pa.string())
    d = _strip_labels(d)
    # annotation columns per remap.rs:484-499 (explicit string type so
    # zero-error batches don't produce null-typed columns)
    d = d.append_column(DROPPED_REASON, pa.array(["error"] * n, pa.string()))
    d = d.append_column(DROPPED_MESSAGE, pc.cast(msg, pa.string()))
    d = d.append_column(DROPPED_COMPONENT_ID, pa.array([component_id] * n, pa.string()))
    d = d.append_column(DROPPED_COMPONENT_TYPE, pa.array(["remap"] * n, pa.string()))
    d = d.append_column(DROPPED_COMPONENT_KIND, pa.array(["transform"] * n, pa.string()))
    return d


def remap(
    ds: Dataset,
    program: Program,
    *,
    drop_on_error: bool = False,
    reroute_dropped: bool = False,
    component_id: str = "remap",
    batch_size: int | None = None,
) -> RemapResult:
    """Apply a remap program with Vector's error-policy semantics."""

    def run(batch: pa.Table) -> pa.Table:
        out, err, msg = program(batch)
        if out.num_rows != batch.num_rows:
            raise ValueError("remap program must preserve row count (use masks)")
        if err is None:
            err = pa.array([False] * out.num_rows, pa.bool_())
        err = pc.fill_null(pc.cast(err, pa.bool_()), False)
        if isinstance(err, pa.ChunkedArray):
            err = err.combine_chunks()
        if pc.any(err).as_py():
            # keep-original (remap.rs:556-575): error/abort rows forward
            # the ORIGINAL event — revert modified columns, null columns
            # the program added (best-effort when the program changed a
            # column's type: cast the original, else null).  Untouched
            # columns are detected by buffer identity (zero-copy pass-
            # through) and skipped — the blend never copies them.
            def _addrs(col):
                return tuple(
                    tuple(b.address if b is not None else 0
                          for b in c.buffers())
                    for c in col.chunks
                )

            for i, name in enumerate(out.column_names):
                cur = out[name]
                if name in batch.column_names and _addrs(cur) == _addrs(batch[name]):
                    continue
                if isinstance(cur, pa.ChunkedArray):
                    cur = cur.combine_chunks()
                if name in batch.column_names:
                    orig = batch[name]
                    if isinstance(orig, pa.ChunkedArray):
                        orig = orig.combine_chunks()
                    if orig.type != cur.type:
                        try:
                            orig = pc.cast(orig, cur.type)
                        except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                                pa.ArrowTypeError):
                            orig = pa.nulls(out.num_rows, cur.type)
                else:
                    orig = pa.nulls(out.num_rows, cur.type)
                out = out.set_column(i, name, pc.if_else(err, orig, cur))
        out = out.append_column(ERROR_COL, err)
        if msg is not None:
            if isinstance(msg, pa.ChunkedArray):
                msg = msg.combine_chunks()
            out = out.append_column(ERROR_MSG_COL, msg)
        return out

    # batch_size=None = whole blocks: per-call costs (RE2 compile inside
    # pc.extract_regex, Python dispatch) amortize over 64Ki-row batches
    # instead of Ray's 1024-row default
    labeled = ds.map_batches(run, batch_format="pyarrow", batch_size=batch_size)
    return RemapResult(
        labeled,
        drop_on_error=drop_on_error,
        reroute_dropped=reroute_dropped,
        component_id=component_id,
    )
