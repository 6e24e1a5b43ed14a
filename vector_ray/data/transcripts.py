"""Deterministic synthetic transcript generator (FIXTURES.md §F1).

The driver's testdata has no transcripts table, so the primary input of
the north rule — a Parquet table of multi-turn conversation / agent
transcripts ``(conv_id, turn_idx, role, text, tool, ts)`` — is
synthesised here with a fixed seed and cached under the scratch dir.
Both the Ray pipelines and the DuckDB oracle SQL read the SAME cached
parquet file, so correctness comparisons are apples-to-apples.

Text mixes five line shapes (seeded ratio) that the parse stage must
handle, mirroring the corpora Vector's demo_logs source and remap tests
use (reference: src/sources/demo_logs.rs, src/transforms/remap.rs tests):

  a. grok-parseable: ``<iso ts> level=<lvl> tool=<tool> latency_ms=<int> msg=<words>``
  b. JSON objects:   ``{"action": .., "status": .., "latency_ms": ..}``
  c. logfmt lines:   ``event=<e> tool=<t> duration=<int> status=<s>``
  d. free text with unicode and embedded newlines (byte-identical passthrough)
  e. malformed lines (exercise remap error policy keep/drop/reroute)
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from vector_ray.model import TRANSCRIPT_SCHEMA, scratch_dir, sf_from_dir

GEN_VERSION = 4
SEED = 42

ROLES = np.array(["user", "assistant", "tool", "system"])
ROLE_W = np.array([0.30, 0.40, 0.22, 0.08])

# 16-tool vocabulary; the enrichment table covers exactly these
# (lookup misses come from UNKNOWN_TOOLS below).
TOOLS = np.array(
    [
        "bash", "browser", "search", "editor", "python", "sql",
        "fetch", "calc", "files", "email", "calendar", "docs",
        "sheets", "translate", "vision", "speech",
    ]
)
UNKNOWN_TOOLS = np.array(["quantum", "teleport", "magic8ball"])
LEVELS = np.array(["debug", "info", "warn", "error"])
LEVEL_W = np.array([0.2, 0.5, 0.2, 0.1])
ACTIONS = np.array(["invoke", "respond", "retry", "cancel", "plan"])
STATUSES = np.array(["ok", "err", "timeout"])
EVENTS = np.array(["tool_call", "tool_result", "handoff", "summary"])

WORDS = np.array(
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu "
    "nu xi omicron pi rho sigma tau upsilon phi chi psi omega "
    "datos niño café über schön 数据 処理 données".split()
)

BASE_TS_US = np.int64(1_700_000_000_000_000)  # 2023-11-14T22:13:20Z in microseconds


def _words(rng: np.random.Generator, n: int, lo: int = 3, hi: int = 8) -> np.ndarray:
    """n random space-joined word phrases, vectorized-ish."""
    counts = rng.integers(lo, hi + 1, size=n)
    idx = rng.integers(0, len(WORDS), size=int(counts.sum()))
    out = np.empty(n, dtype=object)
    pos = 0
    words = WORDS  # local
    for i, c in enumerate(counts):
        out[i] = " ".join(words[idx[pos : pos + c]])
        pos += c
    return out


def generate_transcripts(n_rows: int, seed: int = SEED) -> pa.Table:
    """Build a deterministic transcript table of ~n_rows turns."""
    rng = np.random.default_rng(seed)

    # Zipf-skewed conversation lengths: many short convs, a few hot ones
    # 10-100x the median (exercises salted repartition, SURVEY §7.4).
    lengths: list[int] = []
    total = 0
    while total < n_rows:
        batch = np.minimum(rng.zipf(1.6, size=256) + 3, 40)
        # every 64th conversation is hot
        hot = rng.random(256) < 0.015
        batch = np.where(hot, batch * rng.integers(10, 100, size=256), batch)
        for ln in batch:
            if total >= n_rows:
                break
            ln = int(min(ln, n_rows - total))
            lengths.append(ln)
            total += ln
    n_conv = len(lengths)
    lengths_arr = np.array(lengths, dtype=np.int64)
    n = int(lengths_arr.sum())

    conv_ids_unique = np.array([f"conv-{i:08d}" for i in range(n_conv)], dtype=object)
    conv_id = np.repeat(conv_ids_unique, lengths_arr)
    # contiguous turn_idx within each conversation
    starts = np.concatenate([[0], np.cumsum(lengths_arr)[:-1]])
    turn_idx = (np.arange(n) - np.repeat(starts, lengths_arr)).astype(np.int32)

    role = rng.choice(ROLES, size=n, p=ROLE_W)

    # tool: present mostly on tool/assistant turns; ~5% unknown; ~10% mixed case
    tool = np.where(
        rng.random(n) < 0.6, rng.choice(TOOLS, size=n), np.full(n, "", dtype=object)
    ).astype(object)
    unk = rng.random(n) < 0.05
    tool[unk] = rng.choice(UNKNOWN_TOOLS, size=int(unk.sum()))
    mixed = (rng.random(n) < 0.10) & (tool != "")
    tool[mixed] = np.char.capitalize(tool[mixed].astype(str)).astype(object)

    # per-conversation monotone ts with occasional equal steps
    step = rng.integers(0, 5_000_000, size=n)  # 0..5s in us; 0 → equal ts rows
    conv_base = rng.integers(0, 86_400_000_000, size=n_conv)  # conv start within a day
    ts = (
        BASE_TS_US
        + np.repeat(conv_base, lengths_arr)
        + np.concatenate([np.cumsum(step[s : s + ln]) for s, ln in zip(starts, lengths_arr)])
    ).astype("datetime64[us]")

    # ---- text ----
    kind = rng.choice(5, size=n, p=[0.40, 0.20, 0.15, 0.20, 0.05])
    text = np.empty(n, dtype=object)

    level = rng.choice(LEVELS, size=n, p=LEVEL_W)
    latency = rng.integers(1, 5000, size=n)
    msg = _words(rng, n)
    iso = np.datetime_as_string(ts, unit="s")

    a = kind == 0
    text[a] = [
        f"{t}Z level={lv} tool={tl if tl else 'none'} latency_ms={la} msg={m}"
        for t, lv, tl, la, m in zip(iso[a], level[a], tool[a], latency[a], msg[a])
    ]

    b = kind == 1
    act = rng.choice(ACTIONS, size=n)
    st = rng.choice(STATUSES, size=n, p=[0.8, 0.15, 0.05])
    text[b] = [
        '{"action": "%s", "status": "%s", "latency_ms": %d, "args": {"q": "%s"}}'
        % (ac, s, la, m)
        for ac, s, la, m in zip(act[b], st[b], latency[b], msg[b])
    ]

    c = kind == 2
    ev = rng.choice(EVENTS, size=n)
    text[c] = [
        f"event={e} tool={tl if tl else 'none'} duration={la} status={s}"
        for e, tl, la, s in zip(ev[c], tool[c], latency[c], st[c])
    ]

    d = kind == 3
    nl = rng.random(n) < 0.3
    text[d] = [
        (m + ("\nsecond line — ünïcode ✓" if has_nl else " — fin"))
        for m, has_nl in zip(msg[d], nl[d])
    ]

    e = kind == 4
    text[e] = [
        f"level= tool latency_ms=oops {{broken json {m}" for m in msg[e]
    ]

    return pa.table(
        {
            "conv_id": pa.array(conv_id, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(text, pa.large_string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )


def rows_for_sf(sf: float) -> int:
    """sf0.001 → 6k turns, sf0.01 → 60k, sf0.1 → 600k (lineitem parity)."""
    return max(200, int(round(6_000_000 * sf)))


ROWS_PER_PART = 65536


def transcripts_path(sf_dir_or_sf) -> str:
    """Directory of part files — a sharded layout so the Parquet read
    parallelizes across files (one read task per part) and a partitioned
    rerun can skip finished shards."""
    sf = sf_dir_or_sf if isinstance(sf_dir_or_sf, float) else sf_from_dir(str(sf_dir_or_sf))
    return os.path.join(scratch_dir(), f"fixtures_v{GEN_VERSION}", f"sf{sf:g}", "transcripts")


def ensure_transcripts(sf_dir_or_sf, seed: int = SEED) -> str:
    """Generate-and-cache the sharded transcript parquet for a scale
    factor; returns the directory path (Ray and DuckDB both read it)."""
    path = transcripts_path(sf_dir_or_sf)
    done = path + ".done"
    if os.path.exists(done):
        return path
    sf = sf_dir_or_sf if isinstance(sf_dir_or_sf, float) else sf_from_dir(str(sf_dir_or_sf))
    table = generate_transcripts(rows_for_sf(sf), seed=seed)
    tmp = path + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    n = table.num_rows
    parts = max(1, (n + ROWS_PER_PART - 1) // ROWS_PER_PART)
    for i in range(parts):
        sl = table.slice(i * ROWS_PER_PART, ROWS_PER_PART)
        pq.write_table(sl, os.path.join(tmp, f"part-{i:05d}.parquet"),
                       row_group_size=16384)
    import shutil

    if os.path.isdir(path) and not os.path.exists(done):
        shutil.rmtree(path, ignore_errors=True)  # stale partial dir
    try:
        os.replace(tmp, path)  # atomic publish (fails if a racer won; that's fine)
        open(done, "w").close()
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return path
