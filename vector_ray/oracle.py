"""DuckDB oracle SQL builders for the driver's correctness gate.

Each builder returns ANSI-ish SQL that DuckDB can run over the SAME
inputs the Ray pipelines read (the generated transcript parquet + the
enrichment CSV), computing the same named columns so the driver's
row-count + schema + value-hash comparison passes.

The grok regex is shared verbatim with the engine
(vector_ray.pipelines.flagship.GROK_REGEX) — both pyarrow and DuckDB
use RE2, so semantics match exactly.
"""

from __future__ import annotations

from vector_ray.data.enrich_tables import ensure_enrichment_csvs
from vector_ray.data.transcripts import ensure_transcripts
from vector_ray.pipelines.flagship import GROK_REGEX

# capture-group indexes in GROK_REGEX: 1=gts 2=level 3=gtool 4=glat 5=msg
_G = GROK_REGEX.replace("'", "''")

_JSONISH = "substr(ltrim(text),1,1)='{' AND json_valid(text)"


def parsed_cte(transcripts_path: str) -> str:
    """CTE `p` = the transcript_parse_program output, in SQL."""
    return rf"""
WITH t AS (SELECT * FROM read_parquet('{transcripts_path}/*.parquet')),
p AS (
  SELECT conv_id, turn_idx, role, tool, ts,
    nullif(regexp_extract(text, '{_G}', 2), '') AS level,
    coalesce(
      try_cast(nullif(regexp_extract(text, '{_G}', 4), '') AS BIGINT),
      CASE WHEN {_JSONISH} THEN try_cast(json_extract_string(text, '$.latency_ms') AS BIGINT) END
    ) AS latency_ms,
    nullif(regexp_extract(text, '{_G}', 5), '') AS msg,
    CASE WHEN {_JSONISH} THEN json_extract_string(text, '$.action') END AS action,
    coalesce(
      CASE WHEN {_JSONISH} THEN json_extract_string(text, '$.status') END,
      CASE WHEN text LIKE 'event=%' THEN nullif(regexp_extract(text, '(?:^|\s)status=([^\s]*)', 1), '') END
    ) AS status,
    CASE WHEN text LIKE 'event=%' THEN nullif(regexp_extract(text, '^event=([^\s]*)', 1), '') END AS event,
    CASE WHEN text LIKE 'event=%' THEN try_cast(nullif(regexp_extract(text, '(?:^|\s)duration=([^\s]*)', 1), '') AS BIGINT) END AS duration,
    ((substr(ltrim(text),1,1)='{{' AND NOT json_valid(text))
     OR (text LIKE 'level=%' AND NOT regexp_matches(text, '{_G}'))) AS parse_error
  FROM t)
"""


def enriched_cte(transcripts_path: str, tool_csv: str) -> str:
    return (
        parsed_cte(transcripts_path)
        + f""",
e AS (SELECT * FROM read_csv('{tool_csv}', header=true)),
pe AS (
  SELECT p.*, e.category, e.risk_level, e.owner_team
  FROM p LEFT JOIN e ON lower(p.tool) = e.tool)
"""
    )


def sql_parse_extract(transcripts_path: str) -> str:
    return (
        parsed_cte(transcripts_path)
        + """
SELECT conv_id, turn_idx, level, latency_ms, msg, action, status, event,
       duration, parse_error
FROM p
"""
    )


def sql_enrich_lookup(transcripts_path: str, tool_csv: str) -> str:
    return (
        enriched_cte(transcripts_path, tool_csv)
        + """
SELECT conv_id, turn_idx, tool, category, risk_level, owner_team FROM pe
"""
    )


def sql_route_counts(transcripts_path: str) -> str:
    return (
        parsed_cte(transcripts_path)
        + """
SELECT * FROM (
  SELECT 'errors' AS sink, count(*)::BIGINT AS events FROM p WHERE level = 'error'
  UNION ALL
  SELECT 'tool_calls', count(*)::BIGINT FROM p WHERE tool <> ''
  UNION ALL
  SELECT 'assistant', count(*)::BIGINT FROM p WHERE role = 'assistant'
  UNION ALL
  SELECT '_unmatched', count(*)::BIGINT FROM p
  WHERE NOT coalesce(level = 'error', false) AND tool = '' AND role <> 'assistant'
) ORDER BY sink
"""
    )


def sql_exclusive_route_counts(transcripts_path: str) -> str:
    return (
        parsed_cte(transcripts_path)
        + """
SELECT CASE WHEN coalesce(level = 'error', false) THEN 'errors'
            WHEN tool <> '' THEN 'tool_calls'
            WHEN role = 'assistant' THEN 'assistant'
            ELSE '_unmatched' END AS sink,
       count(*)::BIGINT AS events
FROM p GROUP BY 1 ORDER BY 1
"""
    )


def sql_remap_dropped(transcripts_path: str) -> str:
    return (
        parsed_cte(transcripts_path)
        + """
SELECT conv_id, turn_idx,
       'error' AS metadata_dropped_reason,
       'parse_transcripts' AS metadata_dropped_component_id
FROM p WHERE parse_error
"""
    )


def oracle_paths(sf_dir: str) -> tuple[str, str]:
    """(transcripts parquet, tool csv) — generated/cached deterministically."""
    tpath = ensure_transcripts(sf_dir)
    csvs = ensure_enrichment_csvs()
    return tpath, csvs["tool_enrichment"]


# ---------------------------------------------------------------------------
# Operator queries over the pre-registered `events` view (sf-relative), and
# transcripts where the operator is transcript-shaped.  Float aggregates are
# rounded to 6 decimals on BOTH sides so summation order cannot flip the hash.
# ---------------------------------------------------------------------------

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000

SQL_AGG_SUM_EVENTS = f"""
SELECT event_type,
       (epoch_us(ts) // {HOUR_US}) * {HOUR_US} AS window_start,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY 1, 2
"""

SQL_AGG_MEAN_EVENTS = f"""
SELECT event_type,
       (epoch_us(ts) // {HOUR_US}) * {HOUR_US} AS window_start,
       CAST(round(avg(CAST(round(value * 100) AS BIGINT)) * 10000) AS BIGINT) AS mean_microcents
FROM events GROUP BY 1, 2
"""

SQL_AGG_SUMMARY_EVENTS = f"""
SELECT event_type,
       (epoch_us(ts) // {HOUR_US}) * {HOUR_US} AS window_start,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       count(*)::BIGINT AS n_events,
       CAST(round(avg(CAST(round(value * 100) AS BIGINT)) * 10000) AS BIGINT) AS mean_microcents
FROM events GROUP BY 1, 2
"""

SQL_AGG_COUNT_EVENTS = f"""
SELECT event_type,
       (epoch_us(ts) // {HOUR_US}) * {HOUR_US} AS window_start,
       count(*)::BIGINT AS value
FROM events GROUP BY 1, 2
"""

SQL_THROTTLE_EVENTS = f"""
SELECT event_id, ts, user_id, event_type, value, props FROM (
  SELECT *, row_number() OVER (
      PARTITION BY event_type, epoch_us(ts) // {HOUR_US}
      ORDER BY ts, event_id) AS rn
  FROM events) WHERE rn <= 5
"""

SQL_DEDUPE_EVENTS = """
SELECT event_id, ts, user_id, event_type, value, props FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
  FROM events) WHERE rn = 1
"""

SQL_REDUCE_EVENTS = """
SELECT user_id,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       string_agg(event_type, ' ' ORDER BY ts, event_id) AS event_type,
       min(event_id) AS event_id,
       min(ts) AS ts,
       max(ts) AS ts_end,
       count(*)::BIGINT AS events
FROM events GROUP BY user_id
"""

SQL_LOG_TO_METRIC_EVENTS = f"""
SELECT 'events_total' AS name, event_type AS etype,
       (epoch_us(ts) // {DAY_US}) * {DAY_US} AS window_start,
       count(*)::DOUBLE AS value
FROM events GROUP BY 2, 3
"""

SQL_HASH_REPLACE_EVENTS = """
SELECT event_id, md5(event_type) AS event_type_hash FROM events
"""

SQL_CARDINALITY_EVENTS = """
WITH fs AS (SELECT event_type, min(ts) AS mt FROM events GROUP BY 1),
allowed AS (SELECT event_type FROM fs ORDER BY mt, event_type LIMIT 3)
SELECT event_id,
       CASE WHEN event_type IN (SELECT event_type FROM allowed)
            THEN event_type END AS event_type,
       ts
FROM events
"""


def sql_sample_transcripts(transcripts_path: str) -> str:
    return f"""
SELECT conv_id, turn_idx, role, 10::BIGINT AS sample_rate FROM (
  SELECT conv_id, turn_idx, role,
         row_number() OVER (PARTITION BY role ORDER BY conv_id, turn_idx) AS rn
  FROM read_parquet('{transcripts_path}/*.parquet'))
WHERE (rn - 1) % 10 = 0
"""


# ---------------------------------------------------------------------------
# Training-data ops over the `documents` / `embeddings` views.
# ---------------------------------------------------------------------------

# must match vector_ray.ml.text.TOKEN_REGEX verbatim (RE2 both sides)
_TOKEN_REGEX_SQL = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+"

SQL_DOC_QUALITY = rf"""
SELECT doc_id,
       length(text)::BIGINT AS n_chars,
       len(regexp_extract_all(text, '\S+'))::BIGINT AS n_words,
       len(regexp_extract_all(text, '[.,;:!?]'))::BIGINT AS n_punct,
       len(regexp_extract_all(text, '[A-Z]'))::BIGINT AS n_upper,
       len(regexp_extract_all(text, '\S+'))::BIGINT AS ws_tokens,
       len(regexp_extract_all(text, '{_TOKEN_REGEX_SQL}'))::BIGINT AS bpe_tokens
FROM documents
"""

SQL_EXACT_DEDUP_DOCS = """
SELECT doc_id, text, lang, source, n_chars FROM (
  SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM documents) WHERE rn = 1
"""

SQL_HASH_DOCS = """
SELECT doc_id, md5(text) AS text_md5 FROM documents
"""

SQL_ANN_TOPK = """
WITH q AS (SELECT vec_id AS query_idx, embedding AS qe FROM embeddings WHERE vec_id < 3),
scored AS (
  SELECT q.query_idx::INT AS query_idx, e.vec_id,
         list_cosine_similarity(e.embedding, q.qe) AS score
  FROM embeddings e CROSS JOIN q),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_idx ORDER BY score DESC, vec_id) AS rn
  FROM scored)
SELECT query_idx, vec_id FROM ranked WHERE rn <= 5
"""


# ---------------------------------------------------------------------------
# Window operators + skew-safe conversation reduce.
# ---------------------------------------------------------------------------

SQL_SESSION_STATS_EVENTS = f"""
WITH o AS (
  SELECT user_id, ts, event_id,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) > {HOUR_US}
         THEN 1 ELSE 0 END AS brk
  FROM events),
s AS (
  SELECT *, sum(brk) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o)
SELECT user_id, session_id::BIGINT AS session_id,
       count(*)::BIGINT AS events,
       min(ts) AS session_start, max(ts) AS session_end
FROM s GROUP BY 1, 2
"""

SQL_SLIDING_WINDOW_EVENTS = f"""
SELECT event_type, ws AS window_start, count(*)::BIGINT AS events FROM (
  SELECT event_type,
         ((epoch_us(ts) // {HOUR_US}) - off.o) * {HOUR_US} AS ws
  FROM events CROSS JOIN (VALUES (0), (1)) off(o))
GROUP BY 1, 2
"""


def sql_salted_reduce(transcripts_path: str) -> str:
    return (
        parsed_cte(transcripts_path)
        + """
SELECT conv_id,
       count(*)::BIGINT AS turns,
       sum(coalesce(latency_ms, 0))::BIGINT AS value_sum,
       min(turn_idx)::BIGINT AS turn_min,
       max(turn_idx)::BIGINT AS turn_max
FROM p GROUP BY conv_id
"""
    )


SQL_DISTINCT_USERS_EVENTS = f"""
SELECT event_type,
       (epoch_us(ts) // {DAY_US}) * {DAY_US} AS window_start,
       count(DISTINCT user_id)::BIGINT AS value
FROM events GROUP BY 1, 2
"""

SQL_PROPS_EXTRACT_EVENTS = """
SELECT event_id,
       try_cast(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
"""


SQL_FILTER_EVENTS = """
SELECT event_id, event_type, value FROM events
WHERE event_type = 'error' AND value > 100
"""

SQL_DD_FILTER_EVENTS = """
SELECT event_id, event_type, value FROM events
WHERE event_type = 'error' OR value > 250
"""


# ---------------------------------------------------------------------------
# Routed-row-set equality (per-port ROWS, not just counts) + extras.
# ---------------------------------------------------------------------------

def sql_route_rows_errors(transcripts_path: str, tool_csv: str) -> str:
    """Rows landing in the `errors` port of the flagship route (multi-
    match clone semantics: membership in this port is independent of
    other ports)."""
    return (
        enriched_cte(transcripts_path, tool_csv)
        + """
SELECT conv_id, turn_idx, role, tool, level, category FROM pe
WHERE level = 'error'
"""
    )


def sql_route_rows_all(transcripts_path: str, tool_csv: str) -> str:
    """One row-set check for BOTH routing operators: the `errors` port
    under multi-match clone semantics unioned with the `tool_calls`
    port under first-match-wins, discriminated by `port` — replaces two
    driver slots with one without losing either operator's row-level
    evidence."""
    return (
        enriched_cte(transcripts_path, tool_csv)
        + """
SELECT conv_id, turn_idx, role, tool, level, category,
       'errors' AS port
FROM pe WHERE level = 'error'
UNION ALL
SELECT conv_id, turn_idx, role, tool, level, category,
       'tool_calls' AS port
FROM pe WHERE NOT coalesce(level = 'error', false) AND tool <> ''
"""
    )


def sql_exclusive_route_rows(transcripts_path: str) -> str:
    """Rows landing in `tool_calls` under FIRST-match-wins: not errors,
    and tool non-empty."""
    return (
        parsed_cte(transcripts_path)
        + """
SELECT conv_id, turn_idx, role, tool FROM p
WHERE NOT coalesce(level = 'error', false) AND tool <> ''
"""
    )


# encode then decode inside one batch through BOTH binary wire codecs
# (protobuf then avro): if the codecs are correct the composition is
# the identity, so the oracle is the plain projection the pipeline
# started from.
SQL_CODEC_ROUNDTRIP_EVENTS = """
SELECT event_id, event_type,
       CAST(round(value * 100) AS BIGINT) AS value_cents
FROM events
"""

SQL_SAMPLE_HASH_EVENTS = """
SELECT event_id, user_id, 7::BIGINT AS sample_rate FROM events
WHERE ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT % 7 = 0
"""

SQL_HISTOGRAM_EVENTS = """
SELECT event_type,
       sum(CASE WHEN value <= 50 THEN 1 ELSE 0 END)::BIGINT AS b0,
       sum(CASE WHEN value > 50 AND value <= 150 THEN 1 ELSE 0 END)::BIGINT AS b1,
       sum(CASE WHEN value > 150 AND value <= 250 THEN 1 ELSE 0 END)::BIGINT AS b2,
       sum(CASE WHEN value > 250 THEN 1 ELSE 0 END)::BIGINT AS b3,
       count(*)::BIGINT AS count,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY 1
"""

# both exact-verify ML oracles run over documents + a doc_id-shifted
# copy of every 8th doc (doc_id % 8 == 0 -> doc_id + 1e6), mirroring
# __ray_entry__._docs_with_dups exactly.
_DOCS_WITH_DUPS = """
docs2 AS (
  SELECT * FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars
  FROM documents WHERE doc_id % 8 = 0)
"""

SQL_MINHASH_EXACT_DEDUP_DOCS = f"""
WITH {_DOCS_WITH_DUPS}
SELECT doc_id, text, lang, source, n_chars FROM (
  SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM docs2) WHERE rn = 1
"""

SQL_SIMHASH_EXACT_PAIRS_DOCS = f"""
WITH {_DOCS_WITH_DUPS}
SELECT d1.doc_id AS a, d2.doc_id AS b
FROM docs2 d1 JOIN docs2 d2
  ON d1.text = d2.text AND d1.doc_id < d2.doc_id
"""

# consistency invariants (__ray_entry__._consistency_counts): every
# distinct text must map to exactly ONE derived value (fingerprint /
# predicted lang) across all actors and batches; group sizes come from
# SQL so the grouping itself is value-checked too.
SQL_FINGERPRINT_CONSISTENCY_DOCS = f"""
WITH {_DOCS_WITH_DUPS}
SELECT md5(text) AS th, CAST(1 AS BIGINT) AS n_fp,
       count(*)::BIGINT AS n_docs
FROM docs2 GROUP BY md5(text)
"""

# exhaustive embedding-cosine pair oracle (nbits=0 path of
# ml/dedup.py:embedding_cosine_dedup)
_EMB_WITH_DUPS = """
emb2 AS (
  SELECT * FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, embedding, label
  FROM embeddings WHERE vec_id % 8 = 0)
"""

# HyperLogLog approx-distinct (stages/sketch.py approx_distinct):
# distinct users per event_type, b=4 (m=16 registers), md5 row hash.
# SQL replays the published algorithm exactly: bucket = top-4 bits of
# the first 16 md5 hex chars as UBIGINT; rho = leading-zero run of the
# 60-bit suffix + 1 (string bin() bit length — float log2 would
# mis-floor above 2^53); Z as a HUGEINT power sum; alpha as the exact
# rational 673/1000; integer division.  The linear-counting branch
# condition is integer too, so both engines always pick the same
# branch (at this cardinality: raw).
SQL_APPROX_DISTINCT_USERS = """
WITH h AS (
  SELECT event_type,
         ('0x' || substr(md5(user_id::VARCHAR), 1, 16))::UBIGINT AS ub
  FROM events
),
br AS (
  SELECT event_type, (ub >> 60)::INTEGER AS bucket,
         CASE WHEN (ub & ((1::UBIGINT << 60) - 1)) = 0 THEN 61
              ELSE 60 - length(bin(ub & ((1::UBIGINT << 60) - 1))) + 1
         END AS rho
  FROM h
),
regs AS (SELECT event_type, bucket, max(rho) AS m_j FROM br GROUP BY 1, 2),
grid AS (SELECT DISTINCT event_type, g.bucket
         FROM events, (SELECT unnest(range(16)) AS bucket) g),
fullr AS (
  SELECT grid.event_type, grid.bucket, coalesce(r.m_j, 0) AS m_j
  FROM grid LEFT JOIN regs r USING (event_type, bucket)
),
agg AS (
  SELECT event_type,
         sum(1::HUGEINT << (61 - m_j)) AS z_int,
         sum(CASE WHEN m_j = 0 THEN 1 ELSE 0 END) AS v
  FROM fullr GROUP BY 1
)
SELECT event_type,
       CASE WHEN 2 * ((673::HUGEINT * 256 * (1::HUGEINT << 61))
                      // (1000 * z_int)) < 80 AND v > 0
            THEN floor(16 * ln(16.0 / v))::BIGINT
            ELSE ((673::HUGEINT * 256 * (1::HUGEINT << 61))
                  // (1000 * z_int))::BIGINT
       END AS approx_users
FROM agg
"""

# as-of join (stages/asof.py): each error event joined to the user's
# most recent at-or-before purchase; ties inclusive (>=), unmatched
# left rows survive with sentinel payload (nullable-int pandas frames
# hash-drift otherwise).  (user_id, ts) is unique in the testdata, so
# the backward pick is deterministic on both engines.
SQL_ASOF_JOIN_EVENTS = """
WITH l AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'error'),
     r AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase')
SELECT l.event_id, l.user_id, l.ts,
       coalesce(r.event_id, -1) AS purchase_event_id,
       coalesce(r.ts, TIMESTAMP '1970-01-01') AS purchase_ts
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""

# range join (stages/interval_join.py): error events inside the hour
# after each purchase, per user.  Multi-matching by construction; all
# columns are ints/timestamps so the hash compare is exact.
SQL_INTERVAL_JOIN_EVENTS = """
WITH l AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'error'),
     r AS (SELECT event_id AS purchase_event_id, user_id, ts FROM events
           WHERE event_type = 'purchase')
SELECT l.event_id, l.user_id, l.ts, r.purchase_event_id
FROM l JOIN r ON l.user_id = r.user_id
             AND l.ts >= r.ts
             AND l.ts <= r.ts + INTERVAL 1 HOUR
"""

# window functions (stages/window_fns.py): row_number / lag / lead /
# running sum / 4-row rolling sum per user ordered by (ts, event_id)
# — a total order, so output is deterministic.  Explicit ROWS frames
# (DuckDB's default RANGE frame treats order ties differently); cents
# are integers so every sum is exact; run-edge lag/lead nulls coalesce
# to -1 on both sides.
SQL_WINDOW_FNS_EVENTS = """
WITH e AS (
  SELECT event_id, ts, user_id,
         CAST(round(value * 100) AS BIGINT) AS value_cents
  FROM events)
SELECT event_id, ts, user_id, value_cents,
       row_number() OVER w AS rn,
       coalesce(lag(value_cents) OVER w, -1) AS lag_cents,
       coalesce(lead(value_cents) OVER w, -1) AS lead_cents,
       CAST(sum(value_cents) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
            AND CURRENT ROW) AS BIGINT) AS cum_cents,
       CAST(sum(value_cents) OVER (w ROWS BETWEEN 3 PRECEDING
            AND CURRENT ROW) AS BIGINT) AS roll4_cents
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""

# rank()/dense_rank() with heavy ties (window_fns rank_col/
# dense_rank_col): the mod-7 bucket gives every user partition large
# tie groups; positive cents make SQL % and numpy % agree.
SQL_RANK_FNS_EVENTS = """
WITH e AS (
  SELECT event_id, user_id,
         CAST(round(value * 100) AS BIGINT) % 7 AS bucket
  FROM events)
SELECT event_id, user_id, bucket,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drk
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY bucket)
"""

# ntile + percent_rank (window_fns): ntile over a TOTAL order (ties
# are engine-dependent), percent_rank over the tie-heavy bucket;
# micro-quantized after the window ((rank-1)/(total-1) is one IEEE
# double division — identical operands, identical bits).
SQL_NTILE_EVENTS = """
WITH e AS (
  SELECT event_id, user_id,
         CAST(round(value * 100) AS BIGINT) AS value_cents,
         CAST(round(value * 100) AS BIGINT) % 7 AS bucket
  FROM events)
SELECT event_id, user_id, bucket,
       CAST(ntile(5) OVER (PARTITION BY user_id
                           ORDER BY bucket, event_id) AS BIGINT) AS nt,
       CAST(round(percent_rank() OVER (PARTITION BY user_id
                                       ORDER BY bucket) * 1000000)
            AS BIGINT) AS pr_micro,
       CAST(round(cume_dist() OVER (PARTITION BY user_id
                                    ORDER BY bucket) * 1000000)
            AS BIGINT) AS cd_micro,
       CAST(first_value(value_cents) OVER (PARTITION BY user_id
                                           ORDER BY bucket, event_id)
            AS BIGINT) AS fv,
       CAST(coalesce(nth_value(value_cents, 3)
                     OVER (PARTITION BY user_id
                           ORDER BY bucket, event_id), -1)
            AS BIGINT) AS nv,
       CAST(last_value(value_cents)
            OVER (PARTITION BY user_id ORDER BY bucket, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING
                       AND UNBOUNDED FOLLOWING) AS BIGINT) AS lv
FROM e
"""

# vocabulary family (ml/vocab.py).  Tokenization is string_split on a
# literal space on both sides; ranking is pure-integer (tf DESC,
# df ASC, token ASC) so no float boundary can flip the hash.
SQL_TOP_TERMS_DOCS = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tf AS (
  SELECT doc_id, token, count(*)::BIGINT AS tf
  FROM tok WHERE token <> '' GROUP BY 1, 2),
df AS (SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY 1)
SELECT doc_id, token, tf, df, rank FROM (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf DESC, df.df, tf.token) AS rank
  FROM tf JOIN df USING (token))
WHERE rank <= 3
"""

SQL_TOKEN_COUNTS_DOCS = """
SELECT token, count(*)::BIGINT AS cnt FROM (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
WHERE token <> ''
GROUP BY token ORDER BY cnt DESC, token LIMIT 100
"""

# k-means assignment (ml/kmeans.py): nearest of the 4 vec_id<4
# centroid vectors per embedding, L2, ties toward the lowest cluster
# id (row_number ORDER BY dist, cid == numpy argmin first-min).
SQL_KMEANS_ASSIGN_EMBEDDINGS = """
WITH c AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS cv
  FROM embeddings WHERE vec_id < 4),
d AS (
  SELECT e.vec_id, c.cid, list_distance(e.embedding, c.cv) AS dist
  FROM embeddings e CROSS JOIN c),
r AS (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
  FROM d)
SELECT vec_id, cid AS cluster FROM r WHERE rn = 1
"""

def sql_kmeans_exact(k: int = 10, n_iter: int = 5, dim: int = 64,
                     quant_bits: int = 16) -> str:
    """Full Lloyd loop replay (ml/kmeans.kmeans_exact): one chained
    CTE pair per iteration — exact-int assignment distances (parallel
    unnest zip, sum of squared diffs), half-up integer centroid
    update floor((2s+n)/(2n)), empty clusters carry the previous
    centroid — then the final assignment's cluster sizes.  All
    arithmetic matches the engine bit-for-bit (see kmeans_exact's
    docstring for the two float ops and why they're exact)."""
    scale = float(1 << quant_bits)
    parts = [f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x ->
           CAST(floor(CAST(x AS DOUBLE) * {scale} + 0.5) AS BIGINT))
           AS xq
  FROM embeddings),
c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, xq AS cq
  FROM q ORDER BY vec_id LIMIT {k})"""]
    for i in range(1, n_iter + 1):
        parts.append(f""",
d{i} AS (
  SELECT vec_id, cid, sum((x - cv) * (x - cv))::BIGINT AS d2
  FROM (SELECT q.vec_id, cc.cid, unnest(q.xq) AS x,
               unnest(cc.cq) AS cv
        FROM q CROSS JOIN c{i - 1} cc)
  GROUP BY vec_id, cid),
a{i} AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid, row_number() OVER
      (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM d{i}) WHERE rn = 1),
s{i} AS (
  SELECT cid, i, sum(x)::BIGINT AS s
  FROM (SELECT a.cid, unnest(q.xq) AS x,
               unnest(range(1, {dim + 1})) AS i
        FROM a{i} a JOIN q USING (vec_id))
  GROUP BY cid, i),
n{i} AS (SELECT cid, count(*)::BIGINT AS n FROM a{i} GROUP BY cid),
u{i} AS (
  SELECT s.cid,
         list(CAST(floor((2.0 * s.s + n.n) / (2.0 * n.n)) AS BIGINT)
              ORDER BY s.i) AS cq
  FROM s{i} s JOIN n{i} n USING (cid) GROUP BY s.cid),
c{i} AS (
  SELECT p.cid, COALESCE(u.cq, p.cq) AS cq
  FROM c{i - 1} p LEFT JOIN u{i} u USING (cid))""")
    f = n_iter + 1
    parts.append(f""",
d{f} AS (
  SELECT vec_id, cid, sum((x - cv) * (x - cv))::BIGINT AS d2
  FROM (SELECT q.vec_id, cc.cid, unnest(q.xq) AS x,
               unnest(cc.cq) AS cv
        FROM q CROSS JOIN c{n_iter} cc)
  GROUP BY vec_id, cid),
a{f} AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid, row_number() OVER
      (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM d{f}) WHERE rn = 1)
SELECT cid AS cluster, count(*)::BIGINT AS n
FROM a{f} GROUP BY cid""")
    return "".join(parts)


# SemDeDup pairs (ml/kmeans.semantic_dedup_pairs): nearest of the 4
# vec_id<4 centroids over the dup-synthesized embeddings, cosine
# pairs within clusters only.
SQL_SEMANTIC_DEDUP_PAIRS = f"""
WITH {{emb_with_dups}},
c AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS cv
  FROM emb2 WHERE vec_id < 4),
d AS (
  SELECT e.vec_id, e.embedding, c.cid,
         list_distance(e.embedding, c.cv) AS dist
  FROM emb2 e CROSS JOIN c),
r AS (
  SELECT vec_id, embedding, cid,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
  FROM d),
asg AS (SELECT vec_id, embedding, cid FROM r WHERE rn = 1)
SELECT e1.cid AS cluster, e1.vec_id AS a, e2.vec_id AS b
FROM asg e1 JOIN asg e2 ON e1.cid = e2.cid AND e1.vec_id < e2.vec_id
WHERE list_cosine_similarity(e1.embedding, e2.embedding) >= 0.9
""".format(emb_with_dups=_EMB_WITH_DUPS)

# grouped mode: most frequent event_type per user, deterministic
# (cnt DESC, value ASC) tie-break on both engines.
SQL_MODE_PER_USER = """
SELECT user_id, event_type AS mode_event_type, n FROM (
  SELECT user_id, event_type, count(*)::BIGINT AS n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY count(*) DESC, event_type) AS rn
  FROM events GROUP BY user_id, event_type)
WHERE rn = 1
"""

# bigram-LM document scoring (ml/lm_score.py): ML bigram model trained
# on the corpus itself; per-doc sum of ln(c(w1w2)) - ln(c(w1·)),
# micro-quantized after the sum on both engines.
SQL_LM_SCORE_DOCS = """
WITH tl AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
toks AS (
  SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS pos
  FROM tl),
pairs AS (
  SELECT a.doc_id, a.w AS w1, b.w AS w2
  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
big AS (SELECT w1, w2, count(*)::DOUBLE AS cb FROM pairs GROUP BY 1, 2),
uni AS (SELECT w1, count(*)::DOUBLE AS cu FROM pairs GROUP BY 1)
SELECT p.doc_id, count(*)::BIGINT AS n_bigrams,
       CAST(round(sum(ln(cb) - ln(cu)) * 1000000) AS BIGINT)
         AS logprob_micro
FROM pairs p JOIN big USING (w1, w2) JOIN uni USING (w1)
GROUP BY p.doc_id
"""

# distributed connected components (ml/dedup.distributed_components):
# edges = exact-text dup pairs over docs2; SQL computes component
# min-labels through a recursive reachability closure.
SQL_CONNECTED_COMPONENTS_DOCS = f"""
WITH RECURSIVE {_DOCS_WITH_DUPS},
pairs AS (
  SELECT d1.doc_id AS a, d2.doc_id AS b
  FROM docs2 d1 JOIN docs2 d2
    ON d1.text = d2.text AND d1.doc_id < d2.doc_id),
edges AS (SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs),
reach(node, r) AS (
  SELECT a AS node, b AS r FROM edges
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a)
SELECT node, least(node, min(r)) AS label FROM reach GROUP BY node
"""

# Count-Min sketch (stages/sketch.count_min_*): SQL replays the md5
# bucketing bit-exactly — estimates match INCLUDING collision error.
SQL_COUNT_MIN_USERS = """
WITH seeds AS (SELECT unnest([0, 1, 2, 3]) AS seed),
h AS (
  SELECT user_id, seed,
         (('0x' || substr(md5(seed || ':' || user_id), 1, 16))::UBIGINT
          % 256)::BIGINT AS bucket
  FROM events CROSS JOIN seeds),
counts AS (SELECT seed, bucket, count(*)::BIGINT AS c
           FROM h GROUP BY 1, 2),
items AS (SELECT DISTINCT user_id FROM events),
ib AS (
  SELECT user_id, seed,
         (('0x' || substr(md5(seed || ':' || user_id), 1, 16))::UBIGINT
          % 256)::BIGINT AS bucket
  FROM items CROSS JOIN seeds)
SELECT ib.user_id, CAST(min(coalesce(c, 0)) AS BIGINT) AS est
FROM ib LEFT JOIN counts USING (seed, bucket)
GROUP BY ib.user_id
"""

# Count-Min heavy hitters: the same bit-exact CM replay filtered to
# est * k > total (one-sided: all true heavy hitters survive,
# collision mass may add false positives on BOTH engines identically).
SQL_HEAVY_HITTERS_USERS = """
WITH seeds AS (SELECT unnest([0, 1, 2, 3]) AS seed),
h AS (
  SELECT user_id, seed,
         (('0x' || substr(md5(seed || ':' || user_id), 1, 16))::UBIGINT
          % 256)::BIGINT AS bucket
  FROM events CROSS JOIN seeds),
counts AS (SELECT seed, bucket, count(*)::BIGINT AS c
           FROM h GROUP BY 1, 2),
items AS (SELECT DISTINCT user_id FROM events),
ib AS (
  SELECT user_id, seed,
         (('0x' || substr(md5(seed || ':' || user_id), 1, 16))::UBIGINT
          % 256)::BIGINT AS bucket
  FROM items CROSS JOIN seeds),
est AS (
  SELECT ib.user_id, CAST(min(coalesce(c, 0)) AS BIGINT) AS est
  FROM ib LEFT JOIN counts USING (seed, bucket)
  GROUP BY ib.user_id),
tot AS (SELECT count(*)::BIGINT AS total FROM events)
SELECT user_id, est FROM est CROSS JOIN tot
WHERE est * 130 > total
"""

# TPC-H-Q5-style nation revenue: 4-table chain, integer tick revenue
# (cents x (100 - discount-pct)) so summation order cannot matter.
SQL_NATION_REVENUE = """
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_ticks
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
"""

# rollup (stages/pivot.rollup): ROLLUP(event_type, user_id) cent sums;
# rolled-up cells coalesce to '__all__', keys cast to VARCHAR to match
# the engine's one-schema union; GROUPING() counts rolled keys.
SQL_ROLLUP_EVENTS = """
SELECT coalesce(CAST(event_type AS VARCHAR), '__all__') AS event_type,
       coalesce(CAST(user_id AS VARCHAR), '__all__') AS user_id,
       CAST(sum(value_cents) AS BIGINT) AS value_cents,
       CAST(grouping(event_type) + grouping(user_id) AS BIGINT)
         AS grouping_level
FROM (SELECT event_type, user_id,
             CAST(round(value * 100) AS BIGINT) AS value_cents
      FROM events)
GROUP BY ROLLUP (event_type, user_id)
"""

# GROUP BY CUBE (stages/pivot.cube → grouping_sets): every subset of
# the key list from ONE finest-level shuffle; grouping_id replays
# DuckDB's GROUPING(k1, k2) bitmask (first key = most significant bit).
SQL_CUBE_EVENTS = """
SELECT coalesce(CAST(event_type AS VARCHAR), '__all__') AS event_type,
       coalesce(CAST(user_id AS VARCHAR), '__all__') AS user_id,
       CAST(sum(value_cents) AS BIGINT) AS value_cents,
       CAST(grouping(event_type, user_id) AS BIGINT) AS grouping_id
FROM (SELECT event_type, user_id,
             CAST(round(value * 100) AS BIGINT) AS value_cents
      FROM events)
GROUP BY CUBE (event_type, user_id)
"""

# pivot / unpivot (stages/pivot.py): per-user cent sums, one column
# per declared event_type (CASE-WHEN sums name columns exactly like
# the Ray side; absent combinations are 0, SQL PIVOT IN semantics).
SQL_PIVOT_EVENTS = """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click' THEN value_cents
                ELSE 0 END) AS BIGINT) AS click,
       CAST(sum(CASE WHEN event_type = 'error' THEN value_cents
                ELSE 0 END) AS BIGINT) AS error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN value_cents
                ELSE 0 END) AS BIGINT) AS purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN value_cents
                ELSE 0 END) AS BIGINT) AS signup,
       CAST(sum(CASE WHEN event_type = 'view' THEN value_cents
                ELSE 0 END) AS BIGINT) AS view
FROM (SELECT user_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS value_cents
      FROM events)
GROUP BY user_id
"""

SQL_UNPIVOT_EVENTS = """
WITH kinds AS (
  SELECT unnest(['click', 'error', 'purchase', 'signup', 'view'])
    AS event_type),
e AS (SELECT user_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS value_cents
      FROM events)
SELECT u.user_id, k.event_type,
       coalesce(sum(e.value_cents), 0)::BIGINT AS cents
FROM (SELECT DISTINCT user_id FROM e) u
CROSS JOIN kinds k
LEFT JOIN e ON e.user_id = u.user_id AND e.event_type = k.event_type
GROUP BY u.user_id, k.event_type
"""

# event-time RANGE-frame rolling sum (stages/window_fns.
# time_range_sum): trailing-hour cent sum per user, peers included.
SQL_TIME_RANGE_SUM_EVENTS = """
WITH e AS (
  SELECT event_id, ts, user_id,
         CAST(round(value * 100) AS BIGINT) AS value_cents
  FROM events)
SELECT event_id, ts, user_id, value_cents,
       CAST(sum(value_cents) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
       AS BIGINT) AS hour_cents
FROM e
"""

# exact grouped quantiles (stages/quantile_exact.py): quantile_disc
# picks the value at 1-based index ceil(q*n) — integer cents, no
# interpolation, bit-exact.
SQL_EXACT_QUANTILES_EVENTS = """
SELECT event_type,
       quantile_disc(value_cents, 0.5) AS p50_cents,
       quantile_disc(value_cents, 0.9) AS p90_cents,
       count(*)::BIGINT AS n
FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS value_cents
      FROM events)
GROUP BY event_type
"""

# stratified sampling (stages/sample.stratified_sample): ceil(n/10)
# per event_type, ordered by the Knuth multiplicative hash — pure
# integer on both sides.
SQL_STRATIFIED_SAMPLE_EVENTS = """
WITH h AS (
  SELECT event_id, ts, user_id, event_type,
         (event_id * 2654435761) % 4294967296 AS hh
  FROM events),
r AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY hh, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM h)
SELECT event_id, ts, user_id, event_type FROM r WHERE rn <= (n + 9) // 10
"""

# benchmark decontamination (ml/decontam.py): docs sharing any word
# 3-gram with the every-13th-doc benchmark set drop.  Gram semantics
# replay ml/hashing.shingle_hashes: \\w+ lowercase tokens, docs with
# 1-2 tokens contribute their whole sequence as ONE gram, empty docs
# contribute (and match) nothing.  Ray compares 64-bit gram hashes,
# SQL the gram strings — equal sets absent a hash collision (none on
# this data; a collision only over-drops, the conservative direction).
SQL_DECONTAMINATE_DOCS = r"""
WITH tl AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS toks
  FROM documents),
toks AS (
  SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS pos
  FROM tl),
grams AS (
  SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS g
  FROM toks a
  JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
  UNION ALL
  SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS g
  FROM toks GROUP BY doc_id HAVING count(*) < 3),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 13 = 0),
dirty AS (
  SELECT DISTINCT doc_id FROM grams
  WHERE g IN (SELECT g FROM bench))
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM dirty)
"""

# n-gram Jaccard set-similarity join (ml/ngram_join.py): exact word
# 3-gram set Jaccard over docs2.  Grams are DISTINCT per doc; docs
# with <3 tokens contribute their whole token sequence as ONE gram
# (mirrors ml/hashing.shingle_hashes short-doc semantics); token-less
# docs never pair.  All math is integer: keep iff i*10000 >= 5000*u
# (t = 0.5), jaccard_bp = (20000*i + u) // (2*u) — half-away rounding
# with no float anywhere, so both engines agree bit-exactly.
SQL_NGRAM_JACCARD_PAIRS_DOCS = f"""
WITH {_DOCS_WITH_DUPS},
tl AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS toks
  FROM docs2
),
toks AS (
  SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS pos
  FROM tl
),
grams AS (
  SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS g
  FROM toks a
  JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
  UNION ALL
  SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS g
  FROM toks GROUP BY doc_id HAVING count(*) < 3
),
sets AS (SELECT DISTINCT doc_id, g FROM grams),
sizes AS (SELECT doc_id, count(*) AS sz FROM sets GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
  FROM sets x JOIN sets y ON x.g = y.g AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT inter.a, inter.b,
       (20000 * i + (sa.sz + sb.sz - i)) // (2 * (sa.sz + sb.sz - i))
         AS jaccard_bp
FROM inter
JOIN sizes sa ON sa.doc_id = inter.a
JOIN sizes sb ON sb.doc_id = inter.b
WHERE i * 10000 >= 5000 * (sa.sz + sb.sz - i)
"""

SQL_EMBEDDING_DEDUP_PAIRS = f"""
WITH {_EMB_WITH_DUPS}
SELECT e1.vec_id AS a, e2.vec_id AS b
FROM emb2 e1 JOIN emb2 e2 ON e1.vec_id < e2.vec_id
WHERE list_cosine_similarity(e1.embedding, e2.embedding) >= 0.9
"""

# survivors = min vec_id per duplicate group; non-duplicated ids pass
# through untouched (copies are exact, so groups are exact-equality
# groups over the synthesized corpus)
SQL_EMBEDDING_DEDUP_LSH = f"""
WITH {_EMB_WITH_DUPS}
SELECT vec_id, label FROM emb2
WHERE vec_id NOT IN (
  SELECT e2.vec_id FROM emb2 e1 JOIN emb2 e2 ON e1.vec_id < e2.vec_id
  WHERE list_cosine_similarity(e1.embedding, e2.embedding) >= 0.9)
"""

SQL_TRAINING_PIPELINE_DOCS = rf"""
WITH scored AS (
  SELECT doc_id, text,
         length(text)::BIGINT AS n_chars,
         len(regexp_extract_all(text, '\S+'))::BIGINT AS n_words
  FROM documents),
filtered AS (
  SELECT * FROM scored WHERE n_words >= 5 AND n_chars >= 30),
deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM filtered) WHERE rn = 1)
SELECT doc_id, n_words,
       len(regexp_extract_all(text, '{_TOKEN_REGEX_SQL}'))::BIGINT AS bpe_tokens
FROM deduped
"""

SQL_ORDERS_MKTSEGMENT_JOIN = """
SELECT c.c_mktsegment,
       count(*)::BIGINT AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""

SQL_SNAPSHOT_ENRICH_EVENTS = """
SELECT event_id, event_type,
       'i-0abc' AS instance_id, 'us-east-1a' AS availability_zone
FROM events
"""

SQL_LANG_ID_CONSISTENCY_DOCS = f"""
WITH {_DOCS_WITH_DUPS}
SELECT md5(text) AS th, CAST(1 AS BIGINT) AS n_lang,
       count(*)::BIGINT AS n_docs
FROM docs2 GROUP BY md5(text)
"""

# DDSketch replay (public algorithm — Masson et al., VLDB 2019): same
# log-gamma bucketing, same rank walk, same bucket-midpoint outputs as
# stages/sketch.py, so the approximate quantiles compare EXACTLY.
SQL_QUANTILE_SKETCH_EVENTS = """
WITH params AS (SELECT 1.005 / 0.995 AS gamma),
b AS (
  SELECT event_type,
         CAST(ceil(ln(value) / ln((SELECT gamma FROM params))) AS BIGINT) AS i,
         count(*)::BIGINT AS c
  FROM events WHERE value > 0 GROUP BY 1, 2),
n AS (SELECT event_type, count(*)::BIGINT AS n FROM events GROUP BY 1),
cum AS (
  SELECT event_type, i,
         sum(c) OVER (PARTITION BY event_type ORDER BY i) AS cum
  FROM b),
sel AS (
  SELECT c.event_type,
         min(c.i) FILTER (WHERE c.cum > 0.50 * (n.n - 1)) AS i50,
         min(c.i) FILTER (WHERE c.cum > 0.90 * (n.n - 1)) AS i90,
         min(c.i) FILTER (WHERE c.cum > 0.99 * (n.n - 1)) AS i99
  FROM cum c JOIN n ON c.event_type = n.event_type
  GROUP BY 1)
SELECT s.event_type,
       n.n AS count,
       CAST(round(2 * power((SELECT gamma FROM params), s.i50)
                  / ((SELECT gamma FROM params) + 1) * 1e6) AS BIGINT) AS p50_micro,
       CAST(round(2 * power((SELECT gamma FROM params), s.i90)
                  / ((SELECT gamma FROM params) + 1) * 1e6) AS BIGINT) AS p90_micro,
       CAST(round(2 * power((SELECT gamma FROM params), s.i99)
                  / ((SELECT gamma FROM params) + 1) * 1e6) AS BIGINT) AS p99_micro
FROM sel s JOIN n ON s.event_type = n.event_type
"""

SQL_CIDR_ENRICH_EVENTS = """
SELECT event_id,
       CASE WHEN (user_id % 256) BETWEEN 64 AND 95 THEN 'mid'
            WHEN (user_id % 256) <= 127 THEN 'low'
            ELSE 'all' END AS region,
       CASE WHEN (user_id % 256) BETWEEN 64 AND 95 THEN 'mid'
            WHEN (user_id % 256) <= 127 THEN 'low'
            ELSE 'all' END AS mmdb_region
FROM events
"""

SQL_NGINX_PARSE_EVENTS = """
SELECT event_id,
       '10.0.0.1' AS client,
       'user' || user_id AS user,
       'GET /' || event_type || ' HTTP/1.1' AS request,
       200::BIGINT AS status,
       CAST(round(value * 100) AS BIGINT) AS size
FROM events
"""

SQL_VRL_CONDITIONAL_EVENTS = """
SELECT event_id,
       CASE WHEN value > 250 THEN 'high'
            WHEN value > 50 THEN 'mid'
            ELSE 'low' END AS tier,
       upper(event_type) || '-' ||
       (CASE WHEN value > 250 THEN 'high'
             WHEN value > 50 THEN 'mid'
             ELSE 'low' END) AS tag
FROM events
"""

SQL_METRIC_TO_LOG_EVENTS = """
SELECT 'events_total' AS metric_name, '' AS metric_namespace,
       'incremental' AS metric_kind, 'counter' AS metric_mtype,
       1.0 AS metric_value, ts, event_type AS etype
FROM events
"""


def sql_role_enrich(transcripts_path: str, role_csv: str) -> str:
    """Second registry table (role_enrichment) — multi-table lookup."""
    return f"""
WITH t AS (SELECT * FROM read_parquet('{transcripts_path}/*.parquet')),
r AS (SELECT * FROM read_csv('{role_csv}', header=true))
SELECT t.conv_id, t.turn_idx, t.role, r.channel, r.weight
FROM t LEFT JOIN r ON t.role = r.role
"""


# ---------------------------------------------------------------------------
# Relational breadth: Q1-style pricing summary + broadcast semi-join.
# All-integer math so both engines agree bit-for-bit.
# ---------------------------------------------------------------------------

SQL_LINEITEM_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_c4,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY 1, 2
"""

SQL_EVENTS_SEMI_JOIN = """
SELECT event_id, user_id, event_type FROM events
WHERE user_id IN (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""


SQL_EVENTS_ANTI_JOIN = """
SELECT event_id, user_id, event_type FROM events
WHERE user_id NOT IN (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""

SQL_TOP2_PER_TYPE = """
SELECT event_type, event_id, value FROM (
  SELECT *, row_number() OVER (
      PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
  FROM events) WHERE rn <= 2
"""


SQL_LATEST_EVENTS = f"""
SELECT event_type, window_start, value FROM (
  SELECT event_type,
         (epoch_us(ts) // {DAY_US}) * {DAY_US} AS window_start, value,
         row_number() OVER (
           PARTITION BY event_type, epoch_us(ts) // {DAY_US}
           ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1
"""

SQL_DIFF_EVENTS = f"""
WITH lat AS (
  SELECT event_type, window_start, value AS latest FROM (
    SELECT event_type,
           (epoch_us(ts) // {DAY_US}) * {DAY_US} AS window_start, value,
           row_number() OVER (
             PARTITION BY event_type, epoch_us(ts) // {DAY_US}
             ORDER BY ts DESC, event_id DESC) AS rn
    FROM events) WHERE rn = 1)
SELECT event_type, window_start,
       latest - lag(latest) OVER (
         PARTITION BY event_type ORDER BY window_start) AS value
FROM lat QUALIFY value IS NOT NULL
"""


SQL_STDEV_EVENTS = f"""
SELECT event_type,
       (epoch_us(ts) // {DAY_US}) * {DAY_US} AS window_start,
       CAST(round(coalesce(stddev_pop(value), 0) * 10000) AS BIGINT)
         AS stdev_x1e4
FROM events GROUP BY 1, 2
"""


# rolling-hash document fingerprint (ml/text.doc_fingerprint): min of
# Rabin-Karp window-8 hashes, base 257 mod 2^61-1, over the UTF-8
# bytes.  The SQL replays it bit-exactly: lead() builds each window's
# 8 code points (== bytes — the corpus is pure ASCII, pinned by the
# octet_length guard), HUGEINT arithmetic replays the numpy kernel's
# WRAP-then-mod (uint64 accumulation wraps at 2^64 before the final
# % M, so the oracle must apply % 2^64 first).  Docs shorter than the
# window would take the Horner path (none exist at any test sf).
SQL_DOC_FINGERPRINT = """
WITH pos AS (
  SELECT doc_id, text, unnest(range(1, length(text) - 6)) AS i
  FROM documents
  WHERE length(text) >= 8 AND length(text) = octet_length(encode(text))),
b AS (
  SELECT doc_id, ord(substr(text, i, 1))::HUGEINT AS b0,
         ord(substr(text, i + 1, 1))::HUGEINT AS b1,
         ord(substr(text, i + 2, 1))::HUGEINT AS b2,
         ord(substr(text, i + 3, 1))::HUGEINT AS b3,
         ord(substr(text, i + 4, 1))::HUGEINT AS b4,
         ord(substr(text, i + 5, 1))::HUGEINT AS b5,
         ord(substr(text, i + 6, 1))::HUGEINT AS b6,
         ord(substr(text, i + 7, 1))::HUGEINT AS b7
  FROM pos),
win AS (
  SELECT doc_id,
         ((b0 * 74051159531521793 + b1 * 288136807515649 +
           b2 * 1121154893057 + b3 * 4362470401 +
           b4 * 16974593 + b5 * 66049 + b6 * 257 + b7)
          % 18446744073709551616) % 2305843009213693951 AS h
  FROM b)
SELECT doc_id, CAST(min(h) AS BIGINT) AS fingerprint
FROM win GROUP BY doc_id
"""


def sql_media_features(media_path: str) -> str:
    """Value oracle for the multimodal decode stage's SQL-derivable
    surface: id/kind passthrough, payload byte counts and the fixed
    feature dimensionality all survive the actor pool (the feature
    VALUES are pinned by the media_consistency constancy oracle — SQL
    has no blake2b to replay them)."""
    return f"""
SELECT media_id, kind,
       CAST(octet_length(payload) AS BIGINT) AS n_bytes,
       CAST(16 AS BIGINT) AS n_feat
FROM read_parquet('{media_path}')
"""


# context-window chunking (ml/chunking.py): window-64/stride-32 token
# chunks per document; tokens = non-empty space splits on both sides,
# chunk text rebuilt with list_slice/array_to_string.
SQL_CHUNK_DOCS = """
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS ts
  FROM documents),
n AS (SELECT doc_id, ts, len(ts) AS n FROM tok),
c AS (
  SELECT doc_id, ts, n,
         unnest(range(0, CASE WHEN n > 0
           THEN (greatest(n - 64, 0) + 31) // 32 + 1 ELSE 0 END)) AS i
  FROM n)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
       CAST(least(i * 32 + 64, n) - i * 32 AS BIGINT) AS n_tokens,
       array_to_string(ts[i * 32 + 1 : least(i * 32 + 64, n)], ' ')
         AS chunk
FROM c
"""

# sequence packing (ml/packing.py): concatenate-and-cut bins — the
# bin id is the integer quotient of the running token count BEFORE
# each document, an exact SQL window.
SQL_PACK_DOCS = """
WITH n AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> ''))
           AS n_tokens
  FROM documents),
w AS (
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens
           AS before
  FROM n)
SELECT doc_id, n_tokens,
       CAST(before // 512 AS BIGINT) AS bin,
       CAST(before % 512 AS BIGINT) AS bin_offset
FROM w
"""

# grouped corr/regression (stages/stats.py): integer sufficient sums
# (exact, order-free), then corr/slope as ONE fixed double expression
# over them — identical operands and op order, bit-exact micro values.
SQL_CORR_EVENTS = """
WITH e AS (
  SELECT event_type, (epoch_us(ts) // 1000000) % 86400 AS x,
         CAST(round(value * 100) AS BIGINT) AS y
  FROM events),
s AS (SELECT event_type, count(*)::BIGINT AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x*x) AS BIGINT) AS sxx,
             CAST(sum(y*y) AS BIGINT) AS syy,
             CAST(sum(x*y) AS BIGINT) AS sxy
      FROM e GROUP BY 1)
SELECT event_type, n, sx, sy, sxx, syy, sxy,
       CAST(round(1000000.0 * r) AS BIGINT) AS corr_micro,
       CAST(round(1000000.0 * slope) AS BIGINT) AS slope_micro,
       CAST(round(1000000.0 * ((sy - slope * sx) / n)) AS BIGINT)
         AS intercept_micro,
       CAST(round(1000000.0 * (r * r)) AS BIGINT) AS r2_micro
FROM (SELECT *,
             CAST(n*sxy - sx*sy AS DOUBLE)
               / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                      * CAST(n*syy - sy*sy AS DOUBLE)) AS r,
             CAST(n*sxy - sx*sy AS DOUBLE)
               / CAST(n*sxx - sx*sx AS DOUBLE) AS slope
      FROM s)
"""

# global top-k (stages/topk.py): (value DESC, id ASC) is a total
# order so the k-row result is deterministic.
SQL_GLOBAL_TOPK_EVENTS = """
SELECT event_id, user_id,
       CAST(round(value * 100) AS BIGINT) AS value_cents
FROM events
ORDER BY value_cents DESC, event_id
LIMIT 100
"""

# quality-weighted sampling (ml/mixing.weighted_sample): keep iff the
# md5 id-hash bucket < min(denom, weight*rate) — all integers.
SQL_WEIGHTED_SAMPLE_DOCS = """
SELECT doc_id, n_chars FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 1000000
      < least(1000000, n_chars * 1500)
"""

# source mixing (ml/mixing.py): target-proportion subsampling — the
# achievable total T = min_s floor(n_s*W/part_s), per-source keep
# threshold floor(denom*part*T/(W*n)) over the md5 id-hash; all
# integer arithmetic, replayed exactly.
SQL_MIX_SOURCES_DOCS = """
WITH cnt AS (SELECT source, count(*)::BIGINT AS n
             FROM documents GROUP BY 1),
w(source, part) AS (VALUES ('src0', 3), ('src1', 2), ('src2', 1)),
tt AS (SELECT min(n * 6 // part)::BIGINT AS t
       FROM cnt JOIN w USING (source)),
thr AS (SELECT cnt.source, (1000000 * part * t) // (6 * n) AS thr
        FROM cnt JOIN w USING (source) CROSS JOIN tt)
SELECT d.doc_id, d.source
FROM documents d JOIN thr ON d.source = thr.source
WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT
      % 1000000 < thr
"""

# PII redaction (VRL redact kernel = pc.replace_substring_regex = RE2,
# the same regex engine DuckDB uses, so the scrub replays byte-exactly;
# counts are taken BEFORE redaction on both sides).  The single-quoted
# SQL strings pass backslashes through literally.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

SQL_PII_REDACT_DOCS = f"""
WITH inj AS (
  SELECT doc_id,
         text || ' contact user' || doc_id
              || '@mail.example.com from 10.' || (doc_id % 256)
              || '.0.' || (doc_id % 100) AS t
  FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{PII_EMAIL}')) AS BIGINT)
         AS n_email,
       CAST(len(regexp_extract_all(t, '{PII_IPV4}')) AS BIGINT)
         AS n_ipv4,
       regexp_replace(
         regexp_replace(t, '{PII_EMAIL}', '<EMAIL>', 'g'),
         '{PII_IPV4}', '<IP>', 'g') AS redacted
FROM inj
"""

# span-level exact dedup (ml/span_dedup.py): C4/RefinedWeb-style —
# disjoint 32-token spans, first occurrence by (doc_id, chunk_idx)
# survives corpus-wide, documents rebuilt from surviving spans (docs
# losing every span vanish).  Dup coverage synthesized via docs2.
SQL_SPAN_DEDUP_DOCS = f"""
WITH {_DOCS_WITH_DUPS},
tok AS (SELECT doc_id,
        list_filter(string_split(text, ' '), x -> x <> '') AS ts
        FROM docs2),
n AS (SELECT doc_id, ts, len(ts) AS n FROM tok),
c AS (SELECT doc_id, ts, n,
      unnest(range(0, CASE WHEN n > 0
        THEN (greatest(n - 32, 0) + 31) // 32 + 1 ELSE 0 END)) AS i
      FROM n),
spans AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
          CAST(least(i * 32 + 32, n) - i * 32 AS BIGINT) AS n_tokens,
          array_to_string(ts[i * 32 + 1 : least(i * 32 + 32, n)], ' ')
            AS chunk
          FROM c),
kept AS (SELECT * FROM (
  SELECT *, row_number() OVER (PARTITION BY chunk
                               ORDER BY doc_id, chunk_idx) AS rn
  FROM spans) WHERE rn = 1)
SELECT doc_id,
       string_agg(chunk, ' ' ORDER BY chunk_idx) AS text,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       count(*)::BIGINT AS spans_kept
FROM kept GROUP BY doc_id
"""

# Gopher repetition filters (ml/repetition.py): every statistic is an
# integer and the keep flag compares cross-multiplied integers, so the
# SQL replays bit-exactly; the most-common-2-gram tie-break is pinned
# (count DESC, gram length DESC, gram ASC) on both engines.
SQL_REPETITION_DOCS = """
WITH tl AS (SELECT doc_id, string_split(text, ' ') AS ws,
            len(text)::BIGINT AS total_chars FROM documents),
toks AS (SELECT doc_id, unnest(ws) AS w,
                generate_subscripts(ws, 1) AS pos FROM tl),
g2 AS (SELECT a.doc_id, a.w || ' ' || b.w AS g
       FROM toks a JOIN toks b
         ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
c2 AS (SELECT doc_id, g, count(*)::BIGINT AS c FROM g2 GROUP BY 1, 2),
t2 AS (SELECT doc_id, c, len(g)::BIGINT AS gl,
              row_number() OVER (PARTITION BY doc_id
                                 ORDER BY c DESC, len(g) DESC, g) AS rn
       FROM c2),
g5 AS (SELECT a.doc_id,
              a.w || ' ' || b.w || ' ' || c.w || ' ' || d.w || ' '
                  || e.w AS g
       FROM toks a
       JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
       JOIN toks d ON d.doc_id = a.doc_id AND d.pos = a.pos + 3
       JOIN toks e ON e.doc_id = a.doc_id AND e.pos = a.pos + 4),
c5 AS (SELECT doc_id, g, count(*)::BIGINT AS c FROM g5 GROUP BY 1, 2),
d5 AS (SELECT doc_id,
              CAST(sum(CASE WHEN c > 1 THEN c * len(g) ELSE 0 END)
                   AS BIGINT) AS dup5_chars
       FROM c5 GROUP BY 1)
SELECT tl.doc_id,
       CAST(len(tl.ws) AS BIGINT) AS n_tokens,
       tl.total_chars,
       CAST(coalesce(t2.c, 0) AS BIGINT) AS top2_cnt,
       CAST(coalesce(t2.gl, 0) AS BIGINT) AS top2_chars,
       CAST(coalesce(d5.dup5_chars, 0) AS BIGINT) AS dup5_chars,
       (NOT (5 * coalesce(t2.c, 0) * coalesce(t2.gl, 0)
               > tl.total_chars)
        AND NOT (20 * coalesce(d5.dup5_chars, 0) > 3 * tl.total_chars))
         AS rep_keep
FROM tl
LEFT JOIN t2 ON t2.doc_id = tl.doc_id AND t2.rn = 1
LEFT JOIN d5 ON d5.doc_id = tl.doc_id
"""


def sql_lang_id_docs() -> str:
    """Bit-exact replay of the heuristic language ID (ml/text.LangId):
    floats collapse to integers — the per-doc score denominator is
    constant, so the strict argmax over stopword hit-rates equals an
    integer argmax over hit counts with dict-order tie-break, and the
    0.05 / 0.1 thresholds become ``20*h > n`` / ``10*cjk > chars``.
    The stopword tables ride as a VALUES list in dict iteration order
    (= the kernel's first-wins priority)."""
    from vector_ray.ml.text import _STOPWORDS

    sw_rows = ", ".join(
        f"('{lang}', {i + 1}, '{w}')"
        for i, (lang, sws) in enumerate(_STOPWORDS.items())
        for w in sorted(sws))
    return f"""
WITH base AS (
  SELECT doc_id, text, length(text) AS nchars,
         length(regexp_replace(text,
            '[^一-鿿぀-ヿ가-힯]', '', 'g')) AS cjk_n
  FROM documents),
words AS (
  SELECT doc_id, w FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(text),
                                        '[^a-zà-ÿ]+')) AS w
    FROM documents WHERE text IS NOT NULL AND text <> '')
  WHERE w <> ''),
wc AS (SELECT doc_id, count(*) AS n FROM words GROUP BY doc_id),
sw(lang, pri, w) AS (VALUES {sw_rows}),
hits AS (SELECT words.doc_id, sw.lang, sw.pri, count(*) AS h
         FROM words JOIN sw USING (w) GROUP BY 1, 2, 3),
top AS (SELECT doc_id, lang, h FROM (
          SELECT doc_id, lang, h,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY h DESC, pri) AS rn
          FROM hits) WHERE rn = 1)
SELECT b.doc_id,
       CASE WHEN b.text IS NULL OR b.text = '' THEN NULL
            WHEN 10 * b.cjk_n > b.nchars THEN 'zh'
            WHEN coalesce(wc.n, 0) = 0 THEN 'unknown'
            WHEN coalesce(top.h, 0) * 20 <= wc.n THEN 'unknown'
            ELSE top.lang END AS lang_pred
FROM base b
LEFT JOIN wc USING (doc_id)
LEFT JOIN top USING (doc_id)
"""


def sql_media_real_decode(media_path: str) -> str:
    """Ground-truth oracle for the REAL PNG/WAV decoders: the fixture
    stores the generator's metadata next to the encoded payloads; the
    Ray side must re-derive it by actually decoding the bytes."""
    return f"""
SELECT media_id, kind,
       CAST(width AS BIGINT) AS width,
       CAST(height AS BIGINT) AS height,
       CAST(duration_ms AS BIGINT) AS duration_ms
FROM read_parquet('{media_path}')
"""


def sql_media_consistency(media_path: str) -> str:
    """Consistency oracle for the multimodal actor-pool stage: group
    sizes come from the fixture parquet (SQL-derivable); the constancy
    claim (one distinct feature vector per payload) is the Ray-side
    invariant the hash compare pins to the literal 1."""
    return f"""
SELECT payload_md5 AS th, CAST(1 AS BIGINT) AS n_distinct_features,
       count(*)::BIGINT AS n_media
FROM read_parquet('{media_path}') GROUP BY 1
"""


def sql_conv_dedup(transcripts_path: str) -> str:
    """Conversation-level exact dedup (ml/dedup.conv_exact_dedup):
    min conv_id per identical ORDERED (role, text) turn sequence —
    SQL replays the per-turn digest plan exactly: each turn hashes to
    md5(role || US || text) BEFORE aggregation (the engine's
    pre-exchange digest), digests join by newline in turn order,
    md5-keyed."""
    return f"""
WITH base AS (
  SELECT conv_id, turn_idx, role, text
  FROM read_parquet('{transcripts_path}/*.parquet')),
with_dups AS (
  SELECT * FROM base
  UNION ALL
  SELECT conv_id || '~dup' AS conv_id, turn_idx, role, text
  FROM base WHERE substr(md5(conv_id), 1, 1) = '0'),
conv AS (
  SELECT conv_id,
         md5(string_agg(md5(role || chr(31) || text), chr(10)
                        ORDER BY turn_idx)) AS key
  FROM with_dups GROUP BY conv_id),
m AS (SELECT conv_id, min(conv_id) OVER (PARTITION BY key) AS keep
      FROM conv)
SELECT conv_id FROM m WHERE conv_id = keep
"""


def sql_sft_pairs(transcripts_path: str) -> str:
    """SFT pair explosion (ml/sft.conversation_pairs): every assistant
    turn with >=1 prior turn becomes (context = prior turns joined by
    newline, target)."""
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, role, text
  FROM read_parquet('{transcripts_path}/*.parquet')),
w AS (
  SELECT conv_id, turn_idx, role, text,
         string_agg(text, chr(10)) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS context
  FROM t)
SELECT conv_id, turn_idx, context, text AS target
FROM w WHERE role = 'assistant' AND context IS NOT NULL
"""

# SQL set operations (stages/setops.set_op): bag semantics over
# exact-integer tuples — INTERSECT ALL multiplicity = min(l, r),
# EXCEPT ALL = max(l - r, 0).  The bucket is integer cents % 20 so
# both engines quantize identically.
_SETOP_SIDES = """
WITH l AS (SELECT user_id,
                  CAST(round(value * 100) AS BIGINT) % 20 AS bucket
           FROM events WHERE event_type = 'click'),
     r AS (SELECT user_id,
                  CAST(round(value * 100) AS BIGINT) % 20 AS bucket
           FROM events WHERE event_type = 'view')
"""

SQL_SETOP_EVENTS = _SETOP_SIDES + """
SELECT user_id, bucket FROM l
INTERSECT ALL
SELECT user_id, bucket FROM r
"""

SQL_EXCEPT_EVENTS = _SETOP_SIDES + """
SELECT user_id, bucket FROM l
EXCEPT ALL
SELECT user_id, bucket FROM r
"""

# grouped skewness / excess kurtosis (stages/stats.grouped_moments):
# exact HUGEINT numerators, then the same 2-3 IEEE double ops as the
# Ray side — A/(B*sqrt(B)) and D/B² — micro-quantized.
SQL_MOMENTS_EVENTS = """
WITH x AS (
  SELECT event_type,
         CAST(round(value * 100) AS BIGINT) % 100 AS x
  FROM events
), s AS (
  SELECT event_type,
         CAST(count(*) AS HUGEINT)    AS n,
         CAST(sum(x) AS HUGEINT)      AS s1,
         CAST(sum(x*x) AS HUGEINT)    AS s2,
         CAST(sum(x*x*x) AS HUGEINT)  AS s3,
         CAST(sum(x*x*x*x) AS HUGEINT) AS s4
  FROM x GROUP BY event_type
), m AS (
  SELECT *,
         n*s2 - s1*s1 AS b,
         n*n*s3 - 3*n*s1*s2 + 2*s1*s1*s1 AS a,
         n*n*n*s4 - 4*n*n*s1*s3 + 6*n*s1*s1*s2 - 3*s1*s1*s1*s1
           - 3*(n*s2 - s1*s1)*(n*s2 - s1*s1) AS d
  FROM s
)
SELECT event_type,
       CAST(n AS BIGINT) AS n, CAST(s1 AS BIGINT) AS s1,
       CAST(s2 AS BIGINT) AS s2, CAST(s3 AS BIGINT) AS s3,
       CAST(s4 AS BIGINT) AS s4,
       CASE WHEN n < 2 OR b <= 0 THEN NULL
            ELSE CAST(round(1e6 * (CAST(a AS DOUBLE) /
                 (CAST(b AS DOUBLE) * sqrt(CAST(b AS DOUBLE)))))
                 AS BIGINT) END AS skew_micro,
       CASE WHEN n < 2 OR b <= 0 THEN NULL
            ELSE CAST(round(1e6 * (CAST(d AS DOUBLE) /
                 (CAST(b AS DOUBLE) * CAST(b AS DOUBLE))))
                 AS BIGINT) END AS kurt_micro
FROM m
"""

# BPE pair-count kernel (ml/bpe.py): adjacent character pairs over
# the char-level symbol rendering (space -> ▁), deterministic
# (count desc, pair asc) top-20.
SQL_BPE_TOP_PAIRS_DOCS = """
WITH s AS (SELECT replace(text, ' ', '▁') AS s FROM documents),
p AS (SELECT substr(s, i, 1) || ' ' || substr(s, i + 1, 1) AS pair
      FROM (SELECT s, unnest(range(1, length(s))) AS i FROM s))
SELECT pair, CAST(count(*) AS BIGINT) AS n
FROM p GROUP BY pair
ORDER BY n DESC, pair
LIMIT 20
"""


def sql_bpe_apply_docs(merges: list) -> str:
    """BPE merge application replay: char-join each document, wrap in
    sentinel spaces, chain replace() in rank order (same
    non-overlapping left-to-right semantics as Arrow
    replace_substring), unwrap, count tokens."""
    expr = "' ' || array_to_string(string_split(" \
           "replace(text, ' ', '▁'), ''), ' ') || ' '"
    for m in merges:
        merged = m.replace(" ", "")
        expr = f"replace({expr}, ' {m} ', ' {merged} ')"
    return f"""
WITH r AS (SELECT doc_id, {expr} AS padded FROM documents),
u AS (SELECT doc_id,
             substr(padded, 2, length(padded) - 2) AS seq
      FROM r)
SELECT doc_id, seq,
       CAST(CASE WHEN length(seq) = 0 THEN 0
            ELSE length(seq) - length(replace(seq, ' ', '')) + 1
            END AS BIGINT) AS n_tokens
FROM u
"""


def sql_pq_encode_embeddings(m: int = 8, k: int = 16,
                             dim: int = 64) -> str:
    """PQ encoding replay (ml/pq.py seed codebooks): per subspace j,
    the nearest of the k smallest-id vectors' j-th slices (ties to
    the lowest code id, like kmeans)."""
    dsub = dim // m
    cases = ",\n       ".join(
        f"CAST(max(CASE WHEN j = {j} THEN cid END) AS BIGINT) "
        f"AS code_{j}" for j in range(m))
    return f"""
WITH c AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
         embedding AS cv
  FROM embeddings WHERE vec_id < {k}),
s AS (SELECT unnest(range(0, {m})) AS j),
d AS (
  SELECT e.vec_id, s.j, c.cid,
         list_distance(e.embedding[s.j*{dsub}+1 : s.j*{dsub}+{dsub}],
                       c.cv[s.j*{dsub}+1 : s.j*{dsub}+{dsub}]) AS dist
  FROM embeddings e CROSS JOIN s CROSS JOIN c),
r AS (
  SELECT vec_id, j, cid,
         row_number() OVER (PARTITION BY vec_id, j
                            ORDER BY dist, cid) AS rn
  FROM d)
SELECT vec_id,
       {cases}
FROM r WHERE rn = 1 GROUP BY vec_id
"""

# interpolated grouped quantiles (quantile_exact.py interp=):
# percentile_cont replayed from first principles — bracketing ranks
# by row_number, exact-rational remainder, identical 3-IEEE-op
# interpolation.  (NOT quantile_cont: its arithmetic order is the
# engine's own.)
SQL_QUANTILES_CONT_EVENTS = """
WITH v AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x
  FROM events),
r AS (
  SELECT event_type, x,
         row_number() OVER (PARTITION BY event_type ORDER BY x) - 1
           AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM v)
SELECT event_type,
  CAST(round(1e6 * (
      max(CASE WHEN rn = ((n-1) * 1) // 2 THEN x END)
      + (max(CASE WHEN rn = least(((n-1) * 1) // 2 + 1, n - 1)
             THEN x END)
         - max(CASE WHEN rn = ((n-1) * 1) // 2 THEN x END))
        * (CAST(((n-1) * 1) % 2 AS DOUBLE) / 2)))
    AS BIGINT) AS p50_micro,
  CAST(round(1e6 * (
      max(CASE WHEN rn = ((n-1) * 9) // 10 THEN x END)
      + (max(CASE WHEN rn = least(((n-1) * 9) // 10 + 1, n - 1)
             THEN x END)
         - max(CASE WHEN rn = ((n-1) * 9) // 10 THEN x END))
        * (CAST(((n-1) * 9) % 10 AS DOUBLE) / 10)))
    AS BIGINT) AS p90_micro,
  CAST(n AS BIGINT) AS n
FROM r GROUP BY event_type, n
"""

# exact-size uniform sample (ml/mixing.uniform_k_sample): smallest
# 100 md5 id-hash values, ties to the lowest id.
SQL_UNIFORM_SAMPLE_DOCS = """
SELECT doc_id, n_chars FROM documents
ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT, doc_id
LIMIT 100
"""

# snapshot diff (stages/diff_snapshots.py): full-outer join + CASE
# over two deterministic versions of events.
SQL_SNAPSHOT_DIFF_EVENTS = """
WITH base AS (
  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS value_cents
  FROM events),
o AS (SELECT * FROM base WHERE event_id % 89 <> 0),
n AS (SELECT event_id,
             value_cents
               + (CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END)
               AS value_cents
      FROM base WHERE event_id % 97 <> 0),
d AS (
  SELECT coalesce(o.event_id, n.event_id) AS event_id,
         o.value_cents AS value_cents,
         n.value_cents AS value_cents_new,
         CASE WHEN o.event_id IS NULL THEN 'added'
              WHEN n.event_id IS NULL THEN 'removed'
              WHEN o.value_cents = n.value_cents THEN 'same'
              ELSE 'changed' END AS status
  FROM o FULL JOIN n ON o.event_id = n.event_id)
SELECT * FROM d WHERE status <> 'same'
"""

# funnel analysis (stages/funnel.py): chained min-after-previous-step
# CTEs, strictly increasing timestamps, stage = completed prefix.
SQL_FUNNEL_EVENTS = """
WITH e AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts, event_type
  FROM events),
s0 AS (SELECT user_id, min(ts) AS t_0 FROM e
       WHERE event_type = 'view' GROUP BY user_id),
s1 AS (SELECT e.user_id, min(e.ts) AS t_1
       FROM e JOIN s0 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts > s0.t_0
       GROUP BY e.user_id),
s2 AS (SELECT e.user_id, min(e.ts) AS t_2
       FROM e JOIN s1 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > s1.t_1
       GROUP BY e.user_id)
SELECT s0.user_id, s0.t_0, s1.t_1, s2.t_2,
       CAST(1 + (s1.user_id IS NOT NULL)::INT
              + (s2.user_id IS NOT NULL)::INT AS BIGINT) AS stage
FROM s0 LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
"""

# cohort retention (stages/funnel.cohort_retention): first-activity
# day cohorts, distinct active users per (cohort, day offset).
SQL_RETENTION_EVENTS = """
WITH e AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts FROM events),
f AS (SELECT user_id, min(ts) // 86400000000 AS cohort
      FROM e GROUP BY user_id),
c AS (SELECT DISTINCT e.user_id, f.cohort,
             e.ts // 86400000000 - f.cohort AS "offset"
      FROM e JOIN f USING (user_id))
SELECT cohort, "offset", CAST(count(*) AS BIGINT) AS n_active
FROM c GROUP BY cohort, "offset"
"""


def sql_dnstap_parse_frames(path: str) -> str:
    """Ground-truth oracle for parse_dnstap: the fixture stores the
    generator's metadata next to the encoded frames; the Ray side must
    re-derive it by actually decoding the protobuf + DNS wire bytes."""
    return f"""
SELECT frame_id, mt AS message_type,
       CAST(mt_id AS BIGINT) AS message_type_id,
       CAST(src_port AS BIGINT) AS source_port,
       qname, CAST(qid AS BIGINT) AS qid
FROM read_parquet('{path}')
"""

# cross-corpus near-dup decontamination (ml/ngram_join.cross_dedup):
# the reference set is every 11th doc shifted by 10M; the same
# integer Jaccard machinery as SQL_NGRAM_JACCARD_PAIRS_DOCS decides
# cross-side matches at 0.8, survivors via anti-join.
SQL_CROSS_DEDUP_DOCS = r"""
WITH uni AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, text FROM documents
  WHERE doc_id % 11 = 0),
tl AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS toks
  FROM uni),
toks AS (
  SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS pos
  FROM tl),
grams AS (
  SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS g
  FROM toks a
  JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
  UNION ALL
  SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS g
  FROM toks GROUP BY doc_id HAVING count(*) < 3),
sets AS (SELECT DISTINCT doc_id, g FROM grams),
sizes AS (SELECT doc_id, count(*) AS sz FROM sets GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
  FROM sets x JOIN sets y ON x.g = y.g AND x.doc_id < y.doc_id
  GROUP BY 1, 2),
cross_hits AS (
  SELECT CASE WHEN a < 10000000 THEN a ELSE b END AS doc_id
  FROM inter
  JOIN sizes sa ON sa.doc_id = inter.a
  JOIN sizes sb ON sb.doc_id = inter.b
  WHERE (a < 10000000) <> (b < 10000000)
    AND i * 10000 >= 8000 * (sa.sz + sb.sz - i))
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM cross_hits)
"""


# grouped ordered string aggregation (stages/sorted_ops.concat_sorted):
# SQL string_agg/listagg with a deterministic total order key
# (ts, event_id) so both engines join the identical sequence; cents
# sum integer-quantized per the float-aggregate invariant.
SQL_STRING_AGG_EVENTS = """
SELECT user_id,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS event_seq,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
       CAST(count(*) AS BIGINT) AS events
FROM events
GROUP BY user_id
ORDER BY user_id
"""


# complete Gopher quality-rule set (ml/gopher.py): every count is an
# RE2 match count on both engines and every ratio rule is a
# cross-multiplied integer comparison, so rule decisions replay
# bit-exactly.  '...' count via replace-length (matches Arrow's
# non-overlapping count_substring); '//' keeps the division integral.
SQL_GOPHER_DOCS = r"""
WITH g AS (
  SELECT doc_id,
    len(regexp_extract_all(coalesce(text, ''), '[^\s]+')) AS n_words,
    len(regexp_extract_all(coalesce(text, ''), '[^\s]')) AS w_chars,
    (length(coalesce(text, ''))
       - length(replace(coalesce(text, ''), '#', '')))
      + (length(coalesce(text, ''))
       - length(replace(coalesce(text, ''), '...', ''))) // 3
      AS n_symbols,
    length(coalesce(text, ''))
      - length(replace(coalesce(text, ''), chr(10), '')) + 1 AS n_lines,
    len(regexp_extract_all(coalesce(text, ''), '(?m)^[-*•]'))
      AS bullet_lines,
    len(regexp_extract_all(coalesce(text, ''), '(?m)\.\.\.$'))
      AS ellipsis_lines,
    len(regexp_extract_all(coalesce(text, ''), '[^\s]*[A-Za-z][^\s]*'))
      AS alpha_words,
    (CASE WHEN regexp_matches(lower(coalesce(text, '')), '\bthe\b')
          THEN 1 ELSE 0 END
     + CASE WHEN regexp_matches(lower(coalesce(text, '')), '\bbe\b')
          THEN 1 ELSE 0 END
     + CASE WHEN regexp_matches(lower(coalesce(text, '')), '\bto\b')
          THEN 1 ELSE 0 END
     + CASE WHEN regexp_matches(lower(coalesce(text, '')), '\bof\b')
          THEN 1 ELSE 0 END
     + CASE WHEN regexp_matches(lower(coalesce(text, '')), '\band\b')
          THEN 1 ELSE 0 END
     + CASE WHEN regexp_matches(lower(coalesce(text, '')), '\bthat\b')
          THEN 1 ELSE 0 END
     + CASE WHEN regexp_matches(lower(coalesce(text, '')), '\bhave\b')
          THEN 1 ELSE 0 END
     + CASE WHEN regexp_matches(lower(coalesce(text, '')), '\bwith\b')
          THEN 1 ELSE 0 END) AS stop_words_present
  FROM documents),
r AS (
  SELECT *,
    CAST(n_words BETWEEN 50 AND 100000 AS BIGINT) AS r_word_count,
    CAST(w_chars >= 3 * n_words AND w_chars <= 10 * n_words AS BIGINT)
      AS r_mean_word_len,
    CAST(10 * n_symbols <= n_words AS BIGINT) AS r_symbol_ratio,
    CAST(10 * bullet_lines <= 9 * n_lines AS BIGINT) AS r_bullet_lines,
    CAST(10 * ellipsis_lines <= 3 * n_lines AS BIGINT)
      AS r_ellipsis_lines,
    CAST(5 * alpha_words >= 4 * n_words AS BIGINT) AS r_alpha_words,
    CAST(stop_words_present >= 2 AS BIGINT) AS r_stop_words
  FROM g)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(w_chars AS BIGINT) AS w_chars,
       CAST(n_symbols AS BIGINT) AS n_symbols,
       CAST(n_lines AS BIGINT) AS n_lines,
       CAST(bullet_lines AS BIGINT) AS bullet_lines,
       CAST(ellipsis_lines AS BIGINT) AS ellipsis_lines,
       CAST(alpha_words AS BIGINT) AS alpha_words,
       CAST(stop_words_present AS BIGINT) AS stop_words_present,
       r_word_count, r_mean_word_len, r_symbol_ratio, r_bullet_lines,
       r_ellipsis_lines, r_alpha_words, r_stop_words,
       CAST(r_word_count * r_mean_word_len * r_symbol_ratio
            * r_bullet_lines * r_ellipsis_lines * r_alpha_words
            * r_stop_words AS BIGINT) AS keep
FROM r
ORDER BY doc_id
"""


# exact grouped median + MAD (stages/stats.grouped_median_mad):
# doubled/quadrupled integer units keep everything exact — an
# interpolated median of ints is k/2, so 2*median and 4*MAD are ints;
# quantile_cont on ints < 2^52 is exact in both engines.
SQL_MAD_EVENTS = """
WITH e AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
m AS (
  SELECT event_type,
         CAST(2 * quantile_cont(cents, 0.5) AS BIGINT) AS med2,
         CAST(count(*) AS BIGINT) AS n
  FROM e GROUP BY event_type)
SELECT e.event_type,
       any_value(m.med2) AS med_half,
       CAST(2 * quantile_cont(abs(2 * e.cents - m.med2), 0.5)
            AS BIGINT) AS mad_quarter,
       any_value(m.n) AS n
FROM e JOIN m ON e.event_type = m.event_type
GROUP BY e.event_type
ORDER BY e.event_type
"""


# grouped trimmed mean (stages/stats.grouped_trimmed_mean): inclusive
# [p10, p90] quantile_disc band, integer survivor sums, mean
# micro-quantized via round(avg*1e4) (half-away on both engines).
SQL_TRIMMED_MEAN_EVENTS = """
WITH e AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
b AS (
  SELECT event_type,
         quantile_disc(cents, 0.1) AS lo,
         quantile_disc(cents, 0.9) AS hi
  FROM e GROUP BY event_type)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(e.cents) AS BIGINT) AS sum_kept,
       CAST(round(avg(e.cents) * 10000) AS BIGINT)
         AS trimmed_mean_micro
FROM e JOIN b ON e.event_type = b.event_type
WHERE e.cents BETWEEN b.lo AND b.hi
GROUP BY e.event_type
ORDER BY e.event_type
"""


# C4 line-level cleaning (ml/c4.py): the synthetic documents carry no
# newlines/punctuation, so the driver query deterministically
# restructures text IDENTICALLY on both sides (replace ' a ' with
# '.\n' — non-overlapping left scan in both engines), then the line
# and page rules replay via the same RE2 predicates and the cleaned
# text is rebuilt byte-for-byte with list_filter + array_to_string.
SQL_C4_CLEAN_DOCS = r"""
WITH d2 AS (
  SELECT doc_id,
         replace(coalesce(text, ''), ' a ', '.' || chr(10)) AS text
  FROM documents),
c AS (
  SELECT doc_id, text,
         list_filter(string_split(text, chr(10)),
           l -> regexp_matches(l, '[.!?"]$')
                AND len(regexp_extract_all(l, '[^\s]+')) >= 5
                AND NOT contains(lower(l), 'javascript')) AS kept
  FROM d2)
SELECT doc_id,
       array_to_string(kept, chr(10)) AS text,
       CAST(len(kept) AS BIGINT) AS lines_kept
FROM c
WHERE len(kept) >= 3
  AND NOT contains(lower(text), 'lorem ipsum')
  AND NOT contains(text, '{')
ORDER BY doc_id
"""


# two-sided event-time RANGE frame (stages/window_fns.time_range_sum
# following=): ±30-minute centered cent sum per user, peer-inclusive
# on BOTH bounds.
SQL_TIME_RANGE_2SIDED_EVENTS = """
WITH e AS (
  SELECT event_id, ts, user_id,
         CAST(round(value * 100) AS BIGINT) AS value_cents
  FROM events)
SELECT event_id, ts, user_id, value_cents,
       CAST(sum(value_cents) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING
                   AND INTERVAL 30 MINUTE FOLLOWING)
       AS BIGINT) AS win_cents
FROM e
"""


# ---------------------------------------------------------------------------
# graph analytics (stages/graph.py) — beyond-reference additions
# ---------------------------------------------------------------------------

# distinct undirected co-occurrence edges: parts bought in the same
# order (stages/graph.cooccurrence_edges); both orderings appear in the
# self-join's cross product so a<b alone enumerates every unordered pair
SQL_COOCCUR_PAIRS = """
SELECT DISTINCT CAST(l1.l_partkey AS BIGINT) AS a,
                CAST(l2.l_partkey AS BIGINT) AS b
FROM lineitem l1 JOIN lineitem l2
  ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
"""

# per-node triangle participation over the co-occurrence graph
# (stages/graph.triangle_counts): oriented wedge join (a<b<c) closed by
# a semi-join, each triangle credits its three vertices
SQL_TRIANGLES_PARTS = """
WITH e AS (
  SELECT DISTINCT CAST(l1.l_partkey AS BIGINT) AS a,
                  CAST(l2.l_partkey AS BIGINT) AS b
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e1.b = e2.a
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
v AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri)
SELECT node, count(*)::BIGINT AS triangles FROM v GROUP BY node
"""


def sql_pagerank_lineitem(iters: int = 3, damping: int = 85) -> str:
    """Chained-CTE replay of stages/graph.pagerank's integer contract
    (micro-unit ranks, floor division everywhere — `//` is DuckDB
    integer division and every quantity is non-negative, so floor ==
    trunc on both engines).  Graph: supplier → 10^6+part for every
    lineitem, part → supplier back-edges only for even partkeys (odd
    parts dangle, exercising the dangling-mass term)."""
    base = ((100 - damping) * 1_000_000) // 100
    cte = """
, r{i} AS (
  SELECT nd.node,
         CAST({base} + (({d} * (COALESCE(s.insum, 0)
                                + (dg.dang // nn.n))) // 100)
              AS BIGINT) AS r
  FROM nodes nd
  CROSS JOIN nn
  CROSS JOIN (SELECT CAST(COALESCE(sum(p.r), 0) AS BIGINT) AS dang
              FROM r{prev} p LEFT JOIN deg ON deg.node = p.node
              WHERE deg.outdeg IS NULL) dg
  LEFT JOIN (SELECT e.dst AS node,
                    CAST(sum(p.r // dd.outdeg) AS BIGINT) AS insum
             FROM edges e
             JOIN r{prev} p ON p.node = e.src
             JOIN deg dd ON dd.node = e.src
             GROUP BY e.dst) s ON s.node = nd.node)
"""
    chain = "".join(cte.format(i=i, prev=i - 1, base=base, d=damping)
                    for i in range(1, iters + 1))
    return f"""
WITH edges AS (
  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
                  CAST(1000000 + l_partkey AS BIGINT) AS dst
  FROM lineitem
  UNION
  SELECT DISTINCT CAST(1000000 + l_partkey AS BIGINT) AS src,
                  CAST(l_suppkey AS BIGINT) AS dst
  FROM lineitem WHERE l_partkey % 2 = 0),
nodes AS (
  SELECT DISTINCT src AS node FROM edges
  UNION SELECT DISTINCT dst FROM edges),
nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
deg AS (SELECT src AS node, count(*)::BIGINT AS outdeg
        FROM edges GROUP BY src),
r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes)
{chain}
SELECT node, r AS rank_micro FROM r{iters}
"""


def sql_bfs_lineitem(max_hops: int = 3, source: int = 1) -> str:
    """Level-synchronous replay of stages/graph.bfs_levels: one chained
    CTE per hop — level i+1 = DISTINCT successors of level i minus all
    already-visited nodes.  Same supplier↔part graph as the PageRank
    oracle."""
    lvl = """
, n{i} AS (
  SELECT DISTINCT e.dst AS node
  FROM edges e JOIN (SELECT node FROM d{prev} WHERE dist = {prev_d}) f
    ON f.node = e.src)
, d{i} AS (
  SELECT node, dist FROM d{prev}
  UNION ALL
  SELECT node, CAST({i} AS BIGINT) FROM n{i}
  WHERE node NOT IN (SELECT node FROM d{prev}))
"""
    chain = "".join(lvl.format(i=i, prev=i - 1, prev_d=i - 1)
                    for i in range(1, max_hops + 1))
    return f"""
WITH edges AS (
  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
                  CAST(1000000 + l_partkey AS BIGINT) AS dst
  FROM lineitem
  UNION
  SELECT DISTINCT CAST(1000000 + l_partkey AS BIGINT) AS src,
                  CAST(l_suppkey AS BIGINT) AS dst
  FROM lineitem WHERE l_partkey % 2 = 0),
d0 AS (SELECT CAST({source} AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist)
{chain}
SELECT node, dist FROM d{max_hops}
"""


# KMV distinct sketch over (user_id, value-cent-bucket) tuples per
# event side (stages/sketch.kmv_*): k smallest DISTINCT md5-u64 hashes;
# estimate = (k-1)·2^64 // kth_min at capacity, exact count below k;
# union = k smallest of the combined hash set; intersect =
# inclusion–exclusion, unclamped.  All integers — bit-exact replay.
SQL_KMV_USERS_EVENTS = """
WITH side AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) % 20 AS bucket,
         event_type
  FROM events),
ch AS (SELECT DISTINCT ('0x' || substr(md5(user_id::VARCHAR || ':' ||
         bucket::VARCHAR), 1, 16))::UBIGINT AS hv
       FROM side WHERE event_type = 'click'),
vh AS (SELECT DISTINCT ('0x' || substr(md5(user_id::VARCHAR || ':' ||
         bucket::VARCHAR), 1, 16))::UBIGINT AS hv
       FROM side WHERE event_type = 'view'),
ah AS (SELECT DISTINCT ('0x' || substr(md5(user_id::VARCHAR), 1,
         16))::UBIGINT AS hv FROM events),
ck AS (SELECT hv FROM ch ORDER BY hv LIMIT 256),
vk AS (SELECT hv FROM vh ORDER BY hv LIMIT 256),
ak AS (SELECT hv FROM ah ORDER BY hv LIMIT 256),
uk AS (SELECT hv FROM (SELECT hv FROM ch UNION SELECT hv FROM vh)
       ORDER BY hv LIMIT 256),
eck AS (SELECT CASE WHEN count(*) < 256 THEN count(*)::BIGINT
          ELSE CAST((255::HUGEINT * 18446744073709551616::HUGEINT)
                    // max(hv)::HUGEINT AS BIGINT) END AS v FROM ck),
evk AS (SELECT CASE WHEN count(*) < 256 THEN count(*)::BIGINT
          ELSE CAST((255::HUGEINT * 18446744073709551616::HUGEINT)
                    // max(hv)::HUGEINT AS BIGINT) END AS v FROM vk),
eak AS (SELECT CASE WHEN count(*) < 256 THEN count(*)::BIGINT
          ELSE CAST((255::HUGEINT * 18446744073709551616::HUGEINT)
                    // max(hv)::HUGEINT AS BIGINT) END AS v FROM ak),
euk AS (SELECT CASE WHEN count(*) < 256 THEN count(*)::BIGINT
          ELSE CAST((255::HUGEINT * 18446744073709551616::HUGEINT)
                    // max(hv)::HUGEINT AS BIGINT) END AS v FROM uk)
SELECT 'kmv_all_users' AS metric, v AS value FROM eak
UNION ALL SELECT 'kmv_click', v FROM eck
UNION ALL SELECT 'kmv_view', v FROM evk
UNION ALL SELECT 'kmv_union', v FROM euk
UNION ALL SELECT 'kmv_intersect',
  (SELECT v FROM eck) + (SELECT v FROM evk) - (SELECT v FROM euk)
"""


def sql_zorder_events(bits: int = 16) -> str:
    """Bit-exact replay of stages/zorder: per-column integer range
    codes (HUGEINT product, floor division) and the Morton interleave
    as an explicit shift/mask sum — bit j of column c lands at
    j·ncols + c (ncols=2: user_id then value-cents)."""
    top = (1 << bits) - 1
    terms = []
    for j in range(bits):
        terms.append(f"(((cu >> {j}) & 1) << {2 * j})")
        terms.append(f"(((cv >> {j}) & 1) << {2 * j + 1})")
    interleave = "\n         + ".join(terms)
    return f"""
WITH e AS (
  SELECT event_id, CAST(user_id AS BIGINT) AS u,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events),
r AS (SELECT min(u) AS umin, max(u) AS umax,
             min(vc) AS vmin, max(vc) AS vmax FROM e),
c AS (
  SELECT event_id,
    CASE WHEN umax <= umin THEN 0
         ELSE CAST(((u - umin)::HUGEINT * {top}) // (umax - umin)
                   AS BIGINT) END AS cu,
    CASE WHEN vmax <= vmin THEN 0
         ELSE CAST(((vc - vmin)::HUGEINT * {top}) // (vmax - vmin)
                   AS BIGINT) END AS cv
  FROM e CROSS JOIN r)
SELECT event_id,
       CAST({interleave} AS BIGINT) AS zkey
FROM c
"""


# grouped SQL bit/bool aggregates (stats.grouped_bitops): flag derived
# from integer cents on BOTH sides so the bool aggregates share one
# exact definition
SQL_BITOPS_EVENTS = """
WITH e AS (
  SELECT event_type,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events)
SELECT event_type,
       CAST(bit_and(vc) AS BIGINT) AS band,
       CAST(bit_or(vc) AS BIGINT) AS bor,
       CAST(bit_xor(vc) AS BIGINT) AS bxor,
       CAST(min(CASE WHEN vc > 10000 THEN 1 ELSE 0 END) AS BIGINT)
         AS bool_and,
       CAST(max(CASE WHEN vc > 10000 THEN 1 ELSE 0 END) AS BIGINT)
         AS bool_or
FROM e GROUP BY event_type
"""


# incremental aggregation converges to the plain full GROUP BY
SQL_INCREMENTAL_AGG_EVENTS = """
SELECT event_type,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       count(*)::BIGINT AS n
FROM events GROUP BY event_type
"""


# per-source quota sampling (ml/mixing.cap_per_group): deterministic
# md5-hash rank inside each source, at most 10 docs per source
SQL_CAP_PER_SOURCE_DOCS = """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY
           ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT,
           doc_id) AS rn
  FROM documents)
WHERE rn <= 10
"""


# rolling z-score anomaly flags (stages/anomaly.rolling_anomaly): the
# cross-multiplied integer test (m·x−s)² > k²·(m·ss−s²) over a trailing
# ROWS frame — no sqrt, no division, bit-exact
SQL_ANOMALY_EVENTS = """
WITH e AS (
  SELECT event_id, ts, user_id,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events)
SELECT event_id, CAST(CASE WHEN m >= 3
         AND (m*vc - s)*(m*vc - s) > 9 * (m*ss - s*s)
       THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
FROM (
  SELECT event_id, vc,
    count(*)            OVER tw AS m,
    COALESCE(sum(vc)    OVER tw, 0) AS s,
    COALESCE(sum(vc*vc) OVER tw, 0) AS ss
  FROM e
  WINDOW tw AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING))
"""


# Markov transition counts (stages/paths.transition_counts): adjacent
# event-type pairs per user in (ts, event_id) order
SQL_TRANSITIONS_EVENTS = """
WITH o AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events)
SELECT prev, event_type AS curr, count(*)::BIGINT AS n
FROM o WHERE prev IS NOT NULL GROUP BY 1, 2
"""


# session path mining: first-3-event path per (user, day), most common
# paths with deterministic (n DESC, path ASC) tie-break
SQL_TOP_PATHS_EVENTS = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         epoch_us(ts) // 86400000000 AS day
  FROM events),
r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, day
                               ORDER BY ts, event_id) AS rn
  FROM e),
p AS (
  SELECT user_id, day,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM r WHERE rn <= 3 GROUP BY user_id, day),
c AS (SELECT path, count(*)::BIGINT AS n FROM p GROUP BY path)
SELECT path, n FROM c ORDER BY n DESC, path LIMIT 10
"""


# grouped Gini concentration (stats.grouped_gini) over value cents
SQL_GINI_EVENTS = """
WITH e AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc
  FROM events),
r AS (
  SELECT event_type, vc, row_number() OVER
    (PARTITION BY event_type ORDER BY vc) AS rn
  FROM e),
a AS (
  SELECT event_type, sum(rn * vc)::BIGINT AS S,
         sum(vc)::BIGINT AS T, count(*)::BIGINT AS n
  FROM r GROUP BY event_type)
SELECT event_type,
       CAST(round(1000000.0 * ((2*S - (n+1)*T) / (n*T))) AS BIGINT)
         AS gini_micro
FROM a
"""


# octet-counting framing roundtrip (sources/framing.py +
# parse_syslog): reproduce every parsed field of the deterministic
# capture (data/syslog_capture.syslog_line) from the events table —
# all integer-derived, no floats, no capture bytes in SQL
SQL_SYSLOG_OCTET_EVENTS = """
SELECT
  'Feb ' || printf('%2d', 1 + event_id % 27) || ' ' ||
    printf('%02d:%02d:%02d', (event_id % 86400) // 3600,
           ((event_id % 86400) // 60) % 60, event_id % 60) AS stamp,
  'h' || user_id AS host,
  event_type AS tag,
  CAST(event_id % 65536 AS BIGINT) AS pid,
  'evt ' || event_id AS msg,
  CAST((user_id % 192) // 8 AS BIGINT) AS facility,
  CAST(user_id % 8 AS BIGINT) AS severity
FROM events
"""


# native_json decode + metric projection (functions/native_json.py):
# replay data/native_capture.native_line's integer-derived fields —
# event_id % 7 == 0 rows are LOG frames and must be absent
SQL_NATIVE_JSON_EVENTS = """
SELECT event_type AS name,
       'e' || event_id AS namespace,
       CASE WHEN event_id % 2 = 0 THEN 'incremental'
            ELSE 'absolute' END AS kind,
       CASE WHEN event_id % 5 = 0 THEN 'gauge'
            ELSE 'counter' END AS mtype,
       CAST(user_id * 3 + 1 AS DOUBLE) AS value
FROM events WHERE event_id % 7 <> 0
"""


# json_paths decode (functions/json_paths.py): replay
# data/codec_captures.json_paths_doc — one 'meta' identity event and
# one 'tail' bytes event per input row, plus 1 + event_id % 3
# exploded 'recs' elements (bounded series join, j <= event_id % 3)
SQL_JSON_PATHS_EVENTS = """
SELECT 'meta' AS expr, event_id AS eid, user_id AS meta_user,
       event_type AS meta_etype, CAST(NULL AS BIGINT) AS rec_seq,
       CAST(NULL AS BIGINT) AS rec_cents, CAST(NULL AS VARCHAR) AS tail
FROM events
UNION ALL
SELECT 'recs', event_id, NULL, NULL, g.j,
       CAST((user_id * 7 + g.j * 13) % 1000 AS BIGINT), NULL
FROM events CROSS JOIN (VALUES (0), (1), (2)) AS g(j)
WHERE g.j <= event_id % 3
UNION ALL
SELECT 'tail', event_id, NULL, NULL, NULL, NULL,
       event_id || ':done'
FROM events
"""


# strata format + strata_snappy framing (functions/strata.py):
# replay data/codec_captures.strata_line + strata_header — the shard
# header rides on every event (SHARDS = 4)
SQL_STRATA_EVENTS = """
SELECT event_id AS eid,
       CASE WHEN event_id % 11 = 0 THEN 'error' ELSE 'info' END AS level,
       CAST(user_id * 3 + 1 AS BIGINT) AS cents,
       'b' || CAST(event_id % 4 AS VARCHAR) AS bucket
FROM events
"""


# chi-square independence (stats.chi2_independence): event_type vs
# user_id%4 segment; per-cell micro-quantized terms integer-summed
SQL_CHI2_EVENTS = """
WITH e AS (
  SELECT event_type AS a, (user_id % 4)::VARCHAR AS b FROM events),
cells AS (SELECT a, b, count(*)::BIGINT AS o FROM e GROUP BY 1, 2),
rt AS (SELECT a, sum(o)::BIGINT AS r FROM cells GROUP BY a),
ct AS (SELECT b, sum(o)::BIGINT AS c FROM cells GROUP BY b),
nn AS (SELECT sum(o)::BIGINT AS n FROM cells),
grid AS (SELECT rt.a, ct.b, rt.r, ct.c, COALESCE(cells.o, 0) AS o
         FROM rt CROSS JOIN ct
         LEFT JOIN cells ON cells.a = rt.a AND cells.b = ct.b)
SELECT CAST(sum(CAST(round(1000000.0 *
         (((CAST(o AS HUGEINT)*n - CAST(r AS HUGEINT)*c)
           * (CAST(o AS HUGEINT)*n - CAST(r AS HUGEINT)*c))
          / CAST(CAST(n AS HUGEINT)*r*c AS DOUBLE))) AS BIGINT))
       AS BIGINT) AS chi2_micro,
       CAST((SELECT count(*) FROM rt) - 1 AS BIGINT)
         * CAST((SELECT count(*) FROM ct) - 1 AS BIGINT) AS dof,
       (SELECT n FROM nn) AS n
FROM grid CROSS JOIN nn
"""


# CUSUM change-point alarms (anomaly.cusum_flags): closed-form
# P - LEAST(0, running min of P) over prefix sums of (cents - k_ref)
SQL_CUSUM_EVENTS = """
WITH e AS (
  SELECT event_id, ts, user_id,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events),
p AS (
  SELECT event_id,
         sum(vc - 15000) OVER (PARTITION BY user_id
           ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS P,
         user_id, ts
  FROM e),
c AS (
  SELECT event_id,
         P - LEAST(0, min(P) OVER (PARTITION BY user_id
           ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)) AS C
  FROM p)
SELECT event_id, CAST(C AS BIGINT) AS cusum,
       CAST(CASE WHEN C > 200000 THEN 1 ELSE 0 END AS BIGINT)
         AS cusum_alarm
FROM c
"""


# gaps-and-islands (paths.max_streak): longest consecutive-active-day
# streak per user
SQL_STREAKS_EVENTS = """
WITH d AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // 86400000000 AS day
  FROM events),
r AS (
  SELECT user_id, day, row_number() OVER
    (PARTITION BY user_id ORDER BY day) AS rn
  FROM d),
c AS (
  SELECT user_id, day - rn AS island, count(*)::BIGINT AS len
  FROM r GROUP BY user_id, day - rn)
SELECT user_id, max(len)::BIGINT AS max_streak
FROM c GROUP BY user_id
"""


# Mann–Whitney 2U (stats.rank_sum_u2): click vs view value cents
SQL_RANKSUM_EVENTS = """
WITH e AS (
  SELECT event_type AS s,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events),
c AS (
  SELECT v,
    sum(CASE WHEN s = 'click' THEN 1 ELSE 0 END)::BIGINT AS na,
    sum(CASE WHEN s = 'view' THEN 1 ELSE 0 END)::BIGINT AS nb
  FROM e GROUP BY v),
w AS (
  SELECT na, nb, sum(nb) OVER (ORDER BY v
    ROWS UNBOUNDED PRECEDING) AS cumb
  FROM c)
SELECT CAST(sum(na * (2*cumb - nb)) AS BIGINT) AS u2_a,
       CAST(sum(na) AS BIGINT) AS n_a,
       CAST(sum(nb) AS BIGINT) AS n_b
FROM w
"""


# two-sample KS (stats.ks_statistic): click vs view value cents —
# integer numerator max |cumA·nB − cumB·nA|
SQL_KS_EVENTS = """
WITH e AS (
  SELECT event_type AS s,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events),
c AS (
  SELECT v,
    sum(CASE WHEN s = 'click' THEN 1 ELSE 0 END)::BIGINT AS na,
    sum(CASE WHEN s = 'view' THEN 1 ELSE 0 END)::BIGINT AS nb
  FROM e GROUP BY v),
tot AS (SELECT sum(na)::BIGINT AS ta, sum(nb)::BIGINT AS tb FROM c),
w AS (
  SELECT sum(na) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ca,
         sum(nb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cb
  FROM c)
SELECT CAST(max(abs(ca * tb - cb * ta)) AS BIGINT) AS ks_num,
       (SELECT ta FROM tot) AS n_a,
       (SELECT tb FROM tot) AS n_b
FROM w CROSS JOIN tot
"""


# interval-union coverage (windows.interval_union_length): per-user
# total covered microseconds over [ts, ts + cents·1ms) event intervals
SQL_COVERAGE_EVENTS = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts) + CAST(round(value * 100) AS BIGINT) * 1000
           AS e
  FROM events),
r AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
  FROM e)
SELECT user_id,
       CAST(sum(greatest(0, e - greatest(s, COALESCE(pm, s))))
            AS BIGINT) AS covered
FROM r GROUP BY user_id
"""


# time-weighted average (stats.time_weighted_avg): per-user TWA of
# value cents, each value holding until the next event
SQL_TWA_EVENTS = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events),
w AS (
  SELECT user_id, vc,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, vc) - ts
           AS dt
  FROM e),
a AS (
  SELECT user_id, sum(vc * dt)::BIGINT AS num,
         sum(dt)::BIGINT AS den
  FROM w WHERE dt IS NOT NULL GROUP BY user_id)
SELECT user_id,
       CASE WHEN den = 0 THEN NULL
            ELSE CAST(round(1000000.0 * (num / den)) AS BIGINT) END
         AS twa_micro
FROM a
"""


# data-quality expectations (stages/expect.py): quarantined rows with
# their comma-joined failed-rule tags (declaration order)
SQL_EXPECT_QUARANTINE_EVENTS = """
SELECT event_id,
       ltrim(concat(
         CASE WHEN user_id < 100 THEN '' ELSE ',user_lt_100' END,
         CASE WHEN value < 300.0 THEN '' ELSE ',v_lt_300' END),
         ',') AS failed_rules
FROM events
WHERE NOT (user_id < 100) OR NOT (value < 300.0)
"""


def sql_profile_events() -> str:
    """Long-format per-column profile over the integer-quantized
    events projection (stages/profile.profile)."""
    cols = ["event_id", "user_id", "event_type", "vc", "ts_us"]
    blocks = []
    for c in cols:
        blocks.append(f"""
SELECT '{c}' AS column, 'rows' AS metric,
       count({c})::VARCHAR AS value FROM e
UNION ALL SELECT '{c}', 'nulls',
       (count(*) - count({c}))::VARCHAR FROM e
UNION ALL SELECT '{c}', 'distinct',
       count(DISTINCT {c})::VARCHAR FROM e
UNION ALL SELECT '{c}', 'min', min({c})::VARCHAR FROM e
UNION ALL SELECT '{c}', 'max', max({c})::VARCHAR FROM e""")
    return """
WITH e AS (
  SELECT event_id, user_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS vc,
         epoch_us(ts) AS ts_us
  FROM events)
""" + "\nUNION ALL".join(blocks)


# group-median NULL imputation (stats.impute_group_median): nulls
# injected deterministically (user_id % 7 == 0), filled with the
# event type's exact median in doubled units
SQL_IMPUTE_EVENTS = """
WITH e AS (
  SELECT event_id, event_type,
         CASE WHEN user_id % 7 = 0 THEN NULL
              ELSE CAST(round(value * 100) AS BIGINT) END AS vc
  FROM events),
m AS (
  SELECT event_type, CAST(2 * quantile_cont(vc, 0.5) AS BIGINT)
           AS med2
  FROM e WHERE vc IS NOT NULL GROUP BY event_type)
SELECT event_id, COALESCE(2 * vc, med2) AS imputed_2x
FROM e JOIN m USING (event_type)
"""


# segment overlap (grouped_bitops composition): users belong to a
# type's segment when they have >= 13 events of that type; pairwise
# segment intersections via per-user bitmasks
SQL_SEGMENT_OVERLAP_EVENTS = """
WITH m AS (
  SELECT user_id, event_type
  FROM events GROUP BY user_id, event_type
  HAVING count(*) >= 13),
b AS (
  SELECT user_id,
         CAST(bit_or(CASE event_type
           WHEN 'click' THEN 1 WHEN 'error' THEN 2
           WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
           WHEN 'view' THEN 16 END) AS BIGINT) AS mask
  FROM m GROUP BY user_id),
p(type_a, type_b, ba, bb) AS (VALUES
  ('click','error',1,2), ('click','purchase',1,4),
  ('click','signup',1,8), ('click','view',1,16),
  ('error','purchase',2,4), ('error','signup',2,8),
  ('error','view',2,16), ('purchase','signup',4,8),
  ('purchase','view',4,16), ('signup','view',8,16))
SELECT type_a, type_b,
       CAST(count(CASE WHEN (mask & ba) > 0 AND (mask & bb) > 0
                  THEN 1 END) AS BIGINT) AS n_common
FROM p LEFT JOIN b ON TRUE
GROUP BY type_a, type_b
"""


# market-basket pair support (graph.cooccurrence_counts): unordered
# part pairs by number of orders containing both, support >= 2
SQL_PAIR_SUPPORT_LINEITEM = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT CAST(d1.l_partkey AS BIGINT) AS a,
       CAST(d2.l_partkey AS BIGINT) AS b,
       count(*)::BIGINT AS support
FROM d d1 JOIN d d2
  ON d1.l_orderkey = d2.l_orderkey
 AND d1.l_partkey < d2.l_partkey
GROUP BY 1, 2 HAVING count(*) >= 2
"""


# time-bucket gap fill with LOCF (stages/gapfill.py): 6h buckets of
# summed value cents per user; every bucket between a user's first and
# last observation emitted, missing buckets carry the previous value
# (filled = 1).  Exact integer replay — DuckDB last_value IGNORE NULLS
# mirrors the engine's LOCF carry.
SQL_GAPFILL_EVENTS = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tu,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events),
a AS (
  SELECT user_id, tu // 21600000000 AS b, SUM(vc)::BIGINT AS v
  FROM e GROUP BY 1, 2),
bounds AS (SELECT user_id, min(b) AS mn, max(b) AS mx
           FROM a GROUP BY 1),
s AS (SELECT user_id, unnest(generate_series(mn, mx)) AS b
      FROM bounds),
j AS (SELECT s.user_id, s.b, a.v
      FROM s LEFT JOIN a USING (user_id, b)),
f AS (SELECT user_id, b * 21600000000 AS bucket_us,
        last_value(v IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY b) AS value,
        CAST(v IS NULL AS BIGINT) AS filled
      FROM j)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(bucket_us AS BIGINT) AS bucket_us,
       CAST(value AS BIGINT) AS value, filled
FROM f
"""


def sql_log_templates(transcripts_path: str, k: int = 50) -> str:
    """Template-mining replay: the SAME ordered RE2 rule list the
    engine applies (stages/templates.DEFAULT_RULES) nested as DuckDB
    regexp_replace(..., 'g') calls — one dialect (RE2) on both
    engines, so templates match byte-for-byte; deterministic top-k via
    the (n DESC, template) total order."""
    from vector_ray.stages.templates import DEFAULT_RULES

    expr = "text"
    for pat, rep in DEFAULT_RULES:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    return f"""
WITH m AS (
  SELECT {expr} AS template
  FROM read_parquet('{transcripts_path}/*.parquet')),
c AS (SELECT template, count(*)::BIGINT AS n FROM m GROUP BY 1)
SELECT template, n FROM c
ORDER BY n DESC, template
LIMIT {k}
"""


# Spearman rank correlation (stats.spearman_corr): per-type rank
# correlation of value cents vs event time, UNIQUE tie-broken ranks
# (row_number over (axis, event_id)) so every intermediate is integer
# and the micro-rounded statistic replays bit-exactly.
SQL_SPEARMAN_EVENTS = """
WITH e AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS xv,
         epoch_us(ts) AS yv, event_id
  FROM events),
r AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY xv, event_id) AS rx,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY yv, event_id) AS ry
  FROM e),
s AS (SELECT event_type, count(*)::BIGINT AS n,
             CAST(sum(rx) AS BIGINT) AS sx,
             CAST(sum(ry) AS BIGINT) AS sy,
             CAST(sum(rx*rx) AS BIGINT) AS sxx,
             CAST(sum(ry*ry) AS BIGINT) AS syy,
             CAST(sum(rx*ry) AS BIGINT) AS sxy
      FROM r GROUP BY 1)
SELECT event_type, n,
       CAST(round(1000000.0 *
         (CAST(n*sxy - sx*sy AS DOUBLE)
            / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                   * CAST(n*syy - sy*sy AS DOUBLE)))) AS BIGINT)
         AS spearman_micro
FROM s
"""


# SCD2 interval build (stages/scd.py): per-user runs of equal
# event_type collapsed to (value, valid_from, valid_to) versions;
# valid_to = next version's valid_from (NULL for the open version).
SQL_SCD2_EVENTS = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts, event_id
  FROM events),
w AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS pv
  FROM e),
c AS (SELECT user_id, event_type, ts, event_id
      FROM w WHERE pv IS NULL OR pv <> event_type),
f AS (SELECT user_id, event_type, ts AS valid_from,
        lead(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS valid_to
      FROM c)
SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
       CAST(valid_from AS BIGINT) AS valid_from,
       CAST(valid_to AS BIGINT) AS valid_to
FROM f
"""


# rolling ROWS-frame median (stages/rolling.py): 7-row sliding median
# of value cents per user; DOUBLED (2x) so even-window midpoints stay
# integer on both engines.
SQL_ROLLING_MEDIAN_EVENTS = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS tu,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events)
SELECT user_id, event_id,
       CAST(round(2 * median(vc) OVER (
         PARTITION BY user_id ORDER BY tu, event_id
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS BIGINT)
         AS roll_median2
FROM e
"""


# Benford first-digit deviation (stats.benford_deviation): per-type
# digit counts of |value cents| plus the scaled max deviation from the
# SAME micro-quantized Benford constants — pure integer arithmetic on
# both engines.
SQL_BENFORD_EVENTS = """
WITH e AS (
  SELECT event_type,
         abs(CAST(round(value * 100) AS BIGINT)) AS v
  FROM events),
d AS (
  SELECT event_type,
         CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS fd
  FROM e WHERE v > 0),
c AS (
  SELECT event_type,
         sum(CASE WHEN fd = 1 THEN 1 ELSE 0 END)::BIGINT AS o1,
         sum(CASE WHEN fd = 2 THEN 1 ELSE 0 END)::BIGINT AS o2,
         sum(CASE WHEN fd = 3 THEN 1 ELSE 0 END)::BIGINT AS o3,
         sum(CASE WHEN fd = 4 THEN 1 ELSE 0 END)::BIGINT AS o4,
         sum(CASE WHEN fd = 5 THEN 1 ELSE 0 END)::BIGINT AS o5,
         sum(CASE WHEN fd = 6 THEN 1 ELSE 0 END)::BIGINT AS o6,
         sum(CASE WHEN fd = 7 THEN 1 ELSE 0 END)::BIGINT AS o7,
         sum(CASE WHEN fd = 8 THEN 1 ELSE 0 END)::BIGINT AS o8,
         sum(CASE WHEN fd = 9 THEN 1 ELSE 0 END)::BIGINT AS o9
  FROM d GROUP BY 1)
SELECT event_type, o1, o2, o3, o4, o5, o6, o7, o8, o9,
       (o1+o2+o3+o4+o5+o6+o7+o8+o9)::BIGINT AS n,
       greatest(
         abs(1000000*o1 - (o1+o2+o3+o4+o5+o6+o7+o8+o9)*301030),
         abs(1000000*o2 - (o1+o2+o3+o4+o5+o6+o7+o8+o9)*176091),
         abs(1000000*o3 - (o1+o2+o3+o4+o5+o6+o7+o8+o9)*124939),
         abs(1000000*o4 - (o1+o2+o3+o4+o5+o6+o7+o8+o9)*96910),
         abs(1000000*o5 - (o1+o2+o3+o4+o5+o6+o7+o8+o9)*79181),
         abs(1000000*o6 - (o1+o2+o3+o4+o5+o6+o7+o8+o9)*66947),
         abs(1000000*o7 - (o1+o2+o3+o4+o5+o6+o7+o8+o9)*57992),
         abs(1000000*o8 - (o1+o2+o3+o4+o5+o6+o7+o8+o9)*51153),
         abs(1000000*o9 - (o1+o2+o3+o4+o5+o6+o7+o8+o9)*45757)
       )::BIGINT AS benford_dev_num
FROM c
"""


# sequence pattern match (paths.sequence_match): per-user ordered
# event-type symbol string + RE2 non-overlapping match counts — DuckDB
# string_agg ORDER BY + regexp_extract_all run the same RE2 engine.
SQL_SEQ_MATCH_EVENTS = """
WITH s AS (
  SELECT user_id, ts, event_id,
         CASE event_type WHEN 'signup' THEN 's' WHEN 'view' THEN 'v'
              WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p'
              WHEN 'error' THEN 'e' ELSE '_' END AS sym
  FROM events),
q AS (SELECT user_id, string_agg(sym, '' ORDER BY ts, event_id) AS seq
      FROM s GROUP BY user_id)
SELECT user_id,
       CAST(len(regexp_extract_all(seq, 'c[ve]*p')) AS BIGINT)
         AS n_matches,
       CAST(CASE WHEN len(regexp_extract_all(seq, 'c[ve]*p')) > 0
                 THEN 1 ELSE 0 END AS BIGINT) AS matched
FROM q
"""


# train/val/test assignment (mixing.assign_splits): md5 id-hash bucket
# vs cumulative integer boundaries floor(denom*cum_part/W), replayed
# bit-for-bit — 90/5/5 over documents.
SQL_SPLIT_DOCS = """
SELECT doc_id, source,
  CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
            % 1000000 < 900000 THEN 'train'
       WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
            % 1000000 < 950000 THEN 'val'
       ELSE 'test' END AS split
FROM documents
"""


# grouped winsorization (stats.winsorize_group): clip into the
# per-type [p05, p95] quantile_disc band — all integer, the clip is
# least(greatest(v, lo), hi) verbatim.
SQL_WINSORIZE_EVENTS = """
WITH e AS (
  SELECT event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
b AS (
  SELECT event_type,
         quantile_disc(cents, 0.05) AS lo,
         quantile_disc(cents, 0.95) AS hi
  FROM e GROUP BY event_type)
SELECT e.event_id, e.event_type, e.cents,
       least(greatest(e.cents, b.lo), b.hi) AS winsorized
FROM e JOIN b USING (event_type)
"""


# grouped weighted median (stats.grouped_weighted_median): smallest
# value whose running weight reaches half the group total — windowed
# integer cumsum + row_number replay; weight = event_id % 9 + 1.
SQL_WMEDIAN_EVENTS = """
WITH e AS (
  SELECT event_type AS k,
         CAST(round(value * 100) AS BIGINT) AS v,
         event_id % 9 + 1 AS w, event_id AS id
  FROM events),
r AS (
  SELECT k, v, id,
         sum(w) OVER (PARTITION BY k ORDER BY v, id
                      ROWS UNBOUNDED PRECEDING) AS cw,
         sum(w) OVER (PARTITION BY k) AS tw
  FROM e),
f AS (SELECT k, v, row_number() OVER (PARTITION BY k
                                      ORDER BY v, id) AS rn
      FROM r WHERE 2 * cw >= tw)
SELECT k AS event_type, CAST(v AS BIGINT) AS wmedian
FROM f WHERE rn = 1
"""


# inverted index (vocab.inverted_index): capped ascending posting
# lists + exact df; tokenization = string_split on ' ' with empties
# dropped (the vocab convention).
SQL_INVERTED_INDEX_DOCS = """
WITH pairs AS (
  SELECT DISTINCT doc_id, token FROM
    (SELECT doc_id, unnest(string_split(text, ' ')) AS token
     FROM documents)
  WHERE token <> ''),
dfreq AS (SELECT token, count(*)::BIGINT AS df FROM pairs
          GROUP BY token),
r AS (SELECT token, doc_id,
             row_number() OVER (PARTITION BY token
                                ORDER BY doc_id) AS rn
      FROM pairs),
p AS (SELECT token,
             string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)
               AS postings,
             count(*)::BIGINT AS n_kept
      FROM r WHERE rn <= 16 GROUP BY token)
SELECT p.token, p.postings, p.n_kept, dfreq.df
FROM p JOIN dfreq USING (token)
"""


# ratio_to_report (stats.grouped_share): share of the group total,
# micro-quantized via the fixed round(1e6·(v/tot)) expression — one
# exact-integer-operand division + one multiply + half-away round.
SQL_SHARE_EVENTS = """
WITH e AS (
  SELECT event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events)
SELECT event_id, event_type, cents,
       CAST(round(1000000.0 * (CAST(cents AS DOUBLE) /
            CAST(sum(cents) OVER (PARTITION BY event_type) AS DOUBLE)))
         AS BIGINT) AS share_micro
FROM e
"""


# edit-distance-1 pair join (ml/fuzzy.fuzzy_pairs): short synthetic
# codes w{id%50}x{id%7}; DuckDB replays as a levenshtein self-join.
SQL_FUZZY_PAIRS_DOCS = """
WITH c AS (
  SELECT doc_id,
         'w' || (doc_id % 50) || 'x' || (doc_id % 7) AS s
  FROM documents)
SELECT a.doc_id AS a, b.doc_id AS b,
       CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
FROM c a JOIN c b
  ON a.doc_id < b.doc_id AND levenshtein(a.s, b.s) <= 1
"""
