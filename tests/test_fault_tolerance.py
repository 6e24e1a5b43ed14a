"""Task-failure recovery semantics: Ray Data re-executes SYSTEM
failures (lost worker/node) from lineage automatically, but surfaces
application exceptions fast unless the stage opts into
``retry_exceptions`` — the knob a 256-node run sets on stages with
transient external dependencies (flaky storage, rate-limited
services)."""

import os
import tempfile

import pyarrow as pa
import pytest
import ray.data as rd


def _flaky_fn(marker_dir):
    def flaky(t: pa.Table) -> pa.Table:
        lo = t["x"][0].as_py()
        flag = os.path.join(marker_dir, f"crashed-{lo}")
        if lo % 3 == 0 and not os.path.exists(flag):
            open(flag, "w").close()
            raise RuntimeError("injected transient failure")
        return t
    return flaky


def test_transient_udf_failure_recovers_with_retry_exceptions(ray_session):
    marker_dir = tempfile.mkdtemp(prefix="vr_fault_")
    ds = rd.from_arrow(pa.table({"x": list(range(900))})).repartition(9)
    out = ds.map_batches(
        _flaky_fn(marker_dir), batch_format="pyarrow", batch_size=None,
        retry_exceptions=True,  # map_batches forwards **ray_remote_args
    ).to_pandas()
    # every row survives the injected crashes, nothing duplicated
    assert sorted(out["x"]) == list(range(900))
    assert any(f.startswith("crashed-") for f in os.listdir(marker_dir))


def test_udf_exception_surfaces_without_opt_in(ray_session):
    # default semantics: application errors are NOT silently retried —
    # a deterministic bug fails the run instead of looping forever
    ds = rd.from_arrow(pa.table({"x": list(range(10))}))

    def boom(t: pa.Table) -> pa.Table:
        raise ValueError("deterministic bug")

    with pytest.raises(Exception, match="deterministic bug"):
        ds.map_batches(boom, batch_format="pyarrow",
                       batch_size=None).materialize()
