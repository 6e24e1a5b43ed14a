"""Text source + multiline aggregation (file source analogue)."""

import os


def test_read_and_multiline(tmp_path):
    from vector_ray.sources.text import aggregate_multiline, read_log_lines

    f1 = tmp_path / "a.log"
    f1.write_text(
        "2024-01-01 ERROR boom\n"
        "  at frame1\n"
        "  at frame2\n"
        "2024-01-01 INFO ok\n"
    )
    f2 = tmp_path / "b.log"
    f2.write_text("2024-01-02 WARN solo\n")

    ds = read_log_lines([str(f1), str(f2)])
    out = aggregate_multiline(
        ds, start_pattern=r"^\d{4}-\d{2}-\d{2} "
    ).to_pandas()

    a = out[out["path"].str.endswith("a.log")]["text"].tolist()
    b = out[out["path"].str.endswith("b.log")]["text"].tolist()
    assert sorted(a) == [
        "2024-01-01 ERROR boom\n  at frame1\n  at frame2",
        "2024-01-01 INFO ok",
    ]
    assert b == ["2024-01-02 WARN solo"]


def test_checkpointed_read_resume(tmp_path):
    from vector_ray.sources.text import (
        commit_checkpoints, read_log_lines_checkpointed)

    f = tmp_path / "app.log"
    f.write_text("line1\nline2\npartial")
    cp = str(tmp_path / "cp")

    ds, pos = read_log_lines_checkpointed([str(f)], checkpoint_dir=cp)
    out = ds.to_pandas()
    # partial trailing line is NOT emitted and NOT checkpointed
    assert out["text"].tolist() == ["line1", "line2"]
    commit_checkpoints(cp, pos)

    # the partial line completes + a new line appends: second run reads
    # exactly the delta
    with open(f, "a") as fh:
        fh.write(" done\nline3\n")
    ds2, pos2 = read_log_lines_checkpointed([str(f)], checkpoint_dir=cp)
    assert ds2.to_pandas()["text"].tolist() == ["partial done", "line3"]
    commit_checkpoints(cp, pos2)

    # nothing new: empty dataset, schema stable (to_pandas drops
    # columns on zero-row datasets — assert on the Dataset schema)
    ds3, _ = read_log_lines_checkpointed([str(f)], checkpoint_dir=cp)
    assert ds3.count() == 0 and ds3.schema().names == ["path", "text"]


def test_checkpointed_read_from_end_and_ignore(tmp_path):
    from vector_ray.sources.text import (
        commit_checkpoints, read_log_lines_checkpointed)

    f = tmp_path / "tail.log"
    f.write_text("old1\nold2\n")
    cp = str(tmp_path / "cp")

    # read_from=end skips existing content for files with no checkpoint
    ds, pos = read_log_lines_checkpointed(
        [str(f)], checkpoint_dir=cp, read_from="end")
    assert len(ds.to_pandas()) == 0
    commit_checkpoints(cp, pos)

    with open(f, "a") as fh:
        fh.write("new1\n")
    ds2, pos2 = read_log_lines_checkpointed(
        [str(f)], checkpoint_dir=cp, read_from="end")
    assert ds2.to_pandas()["text"].tolist() == ["new1"]
    commit_checkpoints(cp, pos2)

    # ignore_checkpoints re-reads everything from the beginning
    ds3, _ = read_log_lines_checkpointed(
        [str(f)], checkpoint_dir=cp, ignore_checkpoints=True)
    assert ds3.to_pandas()["text"].tolist() == ["old1", "old2", "new1"]


def test_checkpointed_read_truncation(tmp_path):
    from vector_ray.sources.text import (
        commit_checkpoints, read_log_lines_checkpointed)

    f = tmp_path / "rot.log"
    # >256 bytes so the fingerprint (first-256-bytes checksum) survives
    # the truncation below
    head = "x" * 300 + "\n"
    f.write_text(head + "tail-old\n")
    cp = str(tmp_path / "cp")
    ds, pos = read_log_lines_checkpointed([str(f)], checkpoint_dir=cp)
    assert len(ds.to_pandas()) == 2
    commit_checkpoints(cp, pos)

    # truncate below the checkpoint: re-read from 0 (reference behavior)
    f.write_text(head)
    ds2, _ = read_log_lines_checkpointed([str(f)], checkpoint_dir=cp)
    assert ds2.to_pandas()["text"].tolist() == [head.rstrip("\n")]


def test_checkpoint_from_end_never_commits_mid_line(ray_session, tmp_path):
    """read_from='end' over a file whose tail is a PARTIAL line: the
    committed position must be the last complete-line boundary, not
    raw size — otherwise the next run starts mid-line and emits a
    torn fragment once the line completes (round-3 ADVICE item)."""
    from vector_ray.sources.text import (
        commit_checkpoints, read_log_lines_checkpointed)

    f = tmp_path / "app.log"
    f.write_bytes(b"old complete\npartial tail")  # no trailing newline
    cp = str(tmp_path / "cp")
    ds, pos = read_log_lines_checkpointed([str(f)], checkpoint_dir=cp,
                                          read_from="end")
    assert ds.count() == 0                       # skip existing content
    assert list(pos.values()) == [len(b"old complete\n")]  # boundary
    commit_checkpoints(cp, pos)

    # the partial line completes and one more line lands
    with open(f, "ab") as fh:
        fh.write(b" now done\nnext\n")
    ds2, pos2 = read_log_lines_checkpointed([str(f)], checkpoint_dir=cp,
                                            read_from="end")
    texts = sorted(r["text"] for r in ds2.take_all())
    assert texts == ["next", "partial tail now done"]  # no torn fragment
