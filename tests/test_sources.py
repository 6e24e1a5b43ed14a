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
