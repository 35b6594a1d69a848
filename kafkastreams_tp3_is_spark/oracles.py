"""ANSI-SQL oracle strings for the DuckDB side of the driver's correctness
gate. Each statement must be value-identical to the matching queries.py
DataFrame: same column names, same types (integers as BIGINT, ratios as a
single DOUBLE division of exact integers), same tie-breaks.

The routes/trips CTEs restate views.py's derivation verbatim in SQL.
"""

from __future__ import annotations

from .operators.dedup import CONTAINMENT_MAX_PREFIX_DF as _CONT_DF_CAP

ROUTES_CTE = """
routes AS (
  SELECT
    'Route_' || CAST(o_orderkey AS VARCHAR)                      AS route_id,
    'Origin_' || CAST(o_custkey % 10 AS VARCHAR)                 AS origin,
    'Destination_' || CAST(o_orderkey % 10 AS VARCHAR)           AS destination,
    'Type_' || CAST(o_orderkey % 5 AS VARCHAR)                   AS transport_type,
    CAST((CAST(floor(o_totalprice) AS BIGINT) % 200) + 1 AS INTEGER) AS capacity,
    'Operator_' || CAST(o_orderkey % 7 AS VARCHAR)               AS operator,
    o_orderdate                                                  AS event_ts
  FROM orders
)"""

TRIPS_CTE = """
trips AS (
  SELECT
    'Trip_' || CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR) AS trip_id,
    'Route_' || CAST(l_orderkey AS VARCHAR)                      AS route_id,
    'Origin_' || CAST(l_partkey % 10 AS VARCHAR)                 AS origin,
    'Destination_' || CAST(l_suppkey % 10 AS VARCHAR)            AS destination,
    'Type_' || CAST(l_orderkey % 5 AS VARCHAR)                   AS transport_type,
    'Passenger_' || CAST(l_partkey % 200 AS VARCHAR)             AS passenger_name,
    l_shipdate                                                   AS event_ts
  FROM lineitem
)"""

_R = f"WITH{ROUTES_CTE}"
_T = f"WITH{TRIPS_CTE}"
_RT = f"WITH{ROUTES_CTE},{TRIPS_CTE}"

# occupancy% with the reference's null/zero guard (OccupancyPerRoute.java:61-64)
def _occ(pax: str, cap: str) -> str:
    return (f"CASE WHEN {cap} IS NULL OR {cap} = 0 THEN 0.0 "
            f"ELSE CAST(COALESCE({pax}, 0) AS DOUBLE) / CAST({cap} AS DOUBLE) * 100 END")


ORACLES: dict[str, str] = {}

ORACLES["q1_available_seats_per_route"] = f"""{_R}
SELECT route_id, CAST(SUM(capacity) AS BIGINT) AS totalCapacity
FROM routes GROUP BY route_id
"""

ORACLES["q2_average_passengers_per_transport_type"] = f"""{_T}
SELECT transport_type,
       CAST(COUNT(*) AS DOUBLE) / CAST(COUNT(DISTINCT route_id) AS DOUBLE) AS averagePassengers
FROM trips GROUP BY transport_type
"""

ORACLES["q3_name_passenger_most_trips"] = f"""{_T}
SELECT passenger_name AS passengerName
FROM trips GROUP BY passenger_name
ORDER BY COUNT(*) DESC, passenger_name ASC LIMIT 1
"""

ORACLES["q4_occupancy_per_route"] = f"""{_RT},
cap AS (SELECT route_id, CAST(SUM(capacity) AS BIGINT) AS totalCapacity FROM routes GROUP BY route_id),
pax AS (SELECT route_id, COUNT(*) AS passengerCount FROM trips GROUP BY route_id)
SELECT cap.route_id,
       {_occ('pax.passengerCount', 'cap.totalCapacity')} AS occupancyPercentage
FROM cap LEFT JOIN pax ON cap.route_id = pax.route_id
"""

ORACLES["q5_passengers_per_route"] = f"""{_T}
SELECT route_id, COUNT(*) AS passengerCount
FROM trips GROUP BY route_id
"""

ORACLES["q6_route_least_occupancy_per_transport_type"] = f"""{_RT},
cap AS (SELECT route_id, CAST(SUM(capacity) AS BIGINT) AS totalCapacity FROM routes GROUP BY route_id),
pax AS (SELECT route_id, COUNT(*) AS passengerCount FROM trips GROUP BY route_id),
occ AS (
  SELECT r.transport_type, cap.route_id,
         {_occ('pax.passengerCount', 'cap.totalCapacity')} AS occupancy
  FROM cap
  LEFT JOIN pax ON cap.route_id = pax.route_id
  JOIN routes r ON cap.route_id = r.route_id
)
SELECT transport_type, route_id AS routeId, occupancy
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY transport_type
                                   ORDER BY occupancy ASC, route_id ASC) AS rn
      FROM occ)
WHERE rn = 1
"""

ORACLES["q7_total_capacity_available"] = f"""{_R}
SELECT CAST(SUM(capacity) AS BIGINT) AS totalCapacity FROM routes
"""

ORACLES["q8_total_occupancy_percentage"] = f"""{_RT}
SELECT CAST((SELECT COUNT(*) FROM trips) AS DOUBLE)
       / CAST((SELECT CAST(SUM(capacity) AS BIGINT) FROM routes) AS DOUBLE) * 100
       AS totalOccupancyPercentage
"""

ORACLES["q9_total_passengers"] = f"""{_T}
SELECT COUNT(*) AS totalPassengers FROM trips
"""

ORACLES["q10_transport_type_max_passengers"] = f"""{_T}
SELECT transport_type AS transportType
FROM trips GROUP BY transport_type
ORDER BY COUNT(*) DESC, transport_type ASC LIMIT 1
"""

ORACLES["q11_transport_type_max_passengers_window"] = f"""{_T},
wc AS (
  SELECT date_trunc('hour', event_ts) AS window_start, transport_type,
         COUNT(*) AS maxPassengers
  FROM trips GROUP BY 1, 2
)
SELECT window_start, transport_type AS transportType, maxPassengers
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start
                                   ORDER BY maxPassengers DESC, transport_type ASC) AS rn
      FROM wc)
WHERE rn = 1
"""

ORACLES["q12_least_occupied_transport_type_window"] = f"""{_RT},
cap AS (SELECT transport_type, CAST(SUM(capacity) AS BIGINT) AS cap FROM routes GROUP BY transport_type),
wc AS (
  SELECT date_trunc('hour', event_ts) AS window_start, transport_type,
         COUNT(*) AS cnt
  FROM trips GROUP BY 1, 2
),
occ AS (
  SELECT wc.window_start, wc.transport_type,
         {_occ('wc.cnt', 'cap.cap')} AS occupancy
  FROM wc LEFT JOIN cap ON wc.transport_type = cap.transport_type
)
SELECT window_start, transport_type AS transportType, occupancy
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start
                                   ORDER BY occupancy ASC, transport_type ASC) AS rn
      FROM occ)
WHERE rn = 1
"""

# ---------------------------------------------------------------------
# Training-data pipeline operators (documents / embeddings tables).
# Only the SQL-expressible ones have oracles; ops built on Spark's
# xxhash64 (minhash/simhash/LSH buckets) have no DuckDB equivalent and get
# the driver's rows-only check plus planted-duplicate recall/determinism
# tests in tests/test_dedup_recall.py.
# ---------------------------------------------------------------------

_TOKENS = "list_filter(string_split_regex(COALESCE(text, ''), '\\s+'), x -> x <> '')"
_STOP_EN = "('the','and','of','to','is','in','that','with')"

ORACLES["dedup_exact"] = """
SELECT md5(text) AS text_md5,
       CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
       COUNT(*) AS n_copies
FROM documents GROUP BY text
"""

ORACLES["text_token_count"] = f"""
SELECT doc_id,
       CAST(len({_TOKENS}) AS BIGINT) AS n_tokens,
       CAST(ceil(CAST(length(regexp_replace(COALESCE(text, ''), '\\s+', '', 'g')) AS DOUBLE) / 4.0) AS BIGINT)
         AS n_tokens_bpe_est
FROM documents
"""

ORACLES["text_quality_score"] = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len({_TOKENS}) AS BIGINT) AS n_tok,
         CAST(length(COALESCE(text, '')) AS BIGINT) AS n_chars,
         CAST(len(regexp_extract_all(COALESCE(text, ''), '[.,!?;:''"()\\[\\]{{}}-]')) AS BIGINT) AS n_punct,
         CAST(len(list_filter(list_transform({_TOKENS}, x -> lower(x)),
                              x -> x IN {_STOP_EN})) AS BIGINT) AS n_stop
  FROM documents
)
SELECT doc_id,
       n_tok AS n_tokens,
       CASE WHEN n_tok = 0 THEN 0.0 ELSE CAST(n_chars AS DOUBLE) / CAST(n_tok AS DOUBLE) END AS mean_word_len,
       CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) END AS punct_ratio,
       CASE WHEN n_tok = 0 THEN 0.0 ELSE CAST(n_stop AS DOUBLE) / CAST(n_tok AS DOUBLE) END AS stopword_ratio
FROM t
"""

ORACLES["text_lang_id"] = f"""
WITH toks AS (
  SELECT doc_id, lang AS lang_true,
         list_transform({_TOKENS}, x -> lower(x)) AS lt
  FROM documents
), hits AS (
  SELECT doc_id, lang_true,
         CAST(len(list_filter(lt, x -> x IN ('the','and','of','to','is','in','that','with'))) AS BIGINT) AS h_en,
         CAST(len(list_filter(lt, x -> x IN ('der','die','das','und','ist','nicht','ein','mit'))) AS BIGINT) AS h_de,
         CAST(len(list_filter(lt, x -> x IN ('le','la','les','et','est','une','que','dans'))) AS BIGINT) AS h_fr,
         CAST(len(list_filter(lt, x -> x IN ('el','la','los','es','una','que','por','con'))) AS BIGINT) AS h_es
  FROM toks
)
SELECT doc_id, lang_true,
       CASE WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
            WHEN h_de = greatest(h_en, h_de, h_fr, h_es) THEN 'de'
            WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
            WHEN h_es = greatest(h_en, h_de, h_fr, h_es) THEN 'es'
            ELSE 'fr' END AS lang_pred
FROM hits
"""

# Exact k-gram Jaccard pairs (threshold 0.8): restates dedup.py
# ngram_jaccard_pairs_df — DISTINCT 9-gram inverted index, intersection
# counts, one INT/INT division.
ORACLES["ngram_jaccard_pairs"] = """
WITH sh AS (
  SELECT DISTINCT doc_id, substring(text, CAST(g AS INTEGER), 9) AS s
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, greatest(length(text) - 8, 1))) AS g
        FROM documents)
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id,
       CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = a_id
JOIN sizes sb ON sb.doc_id = b_id
WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.8
"""

# dedup_minhash_lsh promoted from rows-only to full hash-match: its output
# (a_id, b_id, exact-Jaccard) is the SAME relation ngram_jaccard_pairs
# computes whenever LSH recall is 100%, which holds at gate scale by a wide
# margin — measured sf0.01 pair-set equality 25/25 with min true-pair
# Jaccard 0.93, where the analytic per-pair miss probability of the
# 32-hash / 8-band scheme is 2e-5 (and planted-recall tests keep guarding
# the approximate regime). Same statement, stated once.
ORACLES["dedup_minhash_lsh"] = ORACLES["ngram_jaccard_pairs"]

# SimHash near-dup pairs — FULL restatement of the fingerprint pipeline
# (dedup.py simhash + dedup_simhash_df). The token hash is md5-derived
# 32-bit halves precisely so DuckDB can compute bit-identical values
# (('0x'||substring(md5(t),..))::BIGINT == Spark conv(substring(md5..)));
# votes, signs, and hamming distances are then plain integer arithmetic
# in both engines. The oracle compares ALL pairs: the Manku 20-table
# block-combination scheme is EXACT for hamming <= 3 (any such pair
# matches at least one untouched 3-block combo by pigeonhole), so the
# banded Spark output must equal the naive quadratic filter.
_SIM_SUMS = ",\n         ".join(
    f"SUM(c * ((h{1 if i < 32 else 2} >> {i if i < 32 else i - 32}) & 1))"
    f" AS s{i}"
    for i in range(64))
_SIM_BITS = ",\n       ".join(
    f"CASE WHEN 2 * s{i} - n > 0 THEN 1 ELSE 0 END AS b{i}"
    for i in range(64))
_SIM_COAL = ",\n       ".join(
    f"COALESCE(b{i}, 0) AS b{i}" for i in range(64))
_SIM_HAM = " + ".join(
    f"CASE WHEN a.b{i} <> b.b{i} THEN 1 ELSE 0 END" for i in range(64))

ORACLES["dedup_simhash"] = f"""
WITH tok AS (
  SELECT doc_id, t
  FROM (SELECT doc_id, unnest(string_split_regex(COALESCE(text, ''), '\\s+')) AS t
        FROM documents)
  WHERE t <> ''
), h AS (
  SELECT doc_id,
         ('0x' || substring(md5(t), 1, 8))::BIGINT AS h1,
         ('0x' || substring(md5(t), 9, 8))::BIGINT AS h2
  FROM tok
), per AS (
  SELECT doc_id, h1, h2, COUNT(*) AS c FROM h GROUP BY doc_id, h1, h2
), v AS (
  SELECT doc_id, SUM(c) AS n,
         {_SIM_SUMS}
  FROM per GROUP BY doc_id
), fp0 AS (
  SELECT doc_id,
       {_SIM_BITS}
  FROM v
), fp AS (
  SELECT d.doc_id,
       {_SIM_COAL}
  FROM documents d LEFT JOIN fp0 USING (doc_id)
)
SELECT a_id, b_id, hamming FROM (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         CAST({_SIM_HAM} AS BIGINT) AS hamming
  FROM fp a JOIN fp b ON a.doc_id < b.doc_id
) WHERE hamming <= 3
"""

# Cross-document repeated spans (dedup.py repeated_spans_df): the oracle
# groups RAW 30-char grams where Spark groups their 60-bit md5-derived
# hashes — identical output absent hash collisions, so the gate doubles
# as a collision check. Coverage union = the same
# max-over-preceding-rows window scan.
ORACLES["repeated_spans"] = """
WITH pos AS (
  SELECT doc_id, CAST(g AS INTEGER) AS pos,
         substring(text, CAST(g AS INTEGER), 30) AS s
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, length(text) - 29)) AS g
        FROM documents WHERE length(text) >= 30)
),
rep AS (SELECT s FROM pos GROUP BY s HAVING COUNT(DISTINCT doc_id) >= 2),
rp AS (SELECT doc_id, pos FROM pos JOIN rep USING (s)),
cov AS (
  SELECT doc_id, pos,
         MAX(pos + 30) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM rp
),
agg AS (
  SELECT doc_id, COUNT(*) AS n_spans,
         SUM(greatest(pos + 30 - greatest(pos, COALESCE(prev_end, pos)), 0))
           AS dup_chars
  FROM cov GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(a.n_spans, 0) AS BIGINT) AS n_repeated_spans,
       CASE WHEN length(d.text) IS NULL OR length(d.text) = 0 THEN 0.0
            ELSE CAST(COALESCE(a.dup_chars, 0) AS DOUBLE)
                 / CAST(length(d.text) AS DOUBLE)
       END AS dup_char_fraction
FROM documents d LEFT JOIN agg a USING (doc_id)
"""

# Near-duplicate clusters (graph.py duplicate_clusters): the exact 9-gram
# Jaccard pairs chained into connected components. The Spark side runs
# alternating Large-Star/Small-Star; the oracle restates the same
# components as a WITH RECURSIVE transitive closure over the symmetric
# edge set — component id = min reachable doc_id. Cluster graphs are
# near-dup groups (tiny diameter), so the closure stays small.
ORACLES["duplicate_clusters"] = """
WITH RECURSIVE sh AS (
  SELECT DISTINCT doc_id, substring(text, CAST(g AS INTEGER), 9) AS s
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, greatest(length(text) - 8, 1))) AS g
        FROM documents)
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT a_id, b_id FROM inter
  JOIN sizes sa ON sa.doc_id = a_id
  JOIN sizes sb ON sb.doc_id = b_id
  WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.8
),
sym AS (
  SELECT a_id AS u, b_id AS v FROM pairs
  UNION ALL
  SELECT b_id AS u, a_id AS v FROM pairs
),
reach (u, v) AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u WHERE s.v <> r.u
)
SELECT u AS doc_id,
       least(u, MIN(v)) AS cluster_id,
       least(u, MIN(v)) = u AS is_canonical
FROM reach GROUP BY u
"""

# duplicate_clusters_lsh — the PRODUCTION composition (LSH edges -> CC) —
# carries the same recursive-closure oracle: the LSH pair set equals the
# exact pair set at gate scale (see dedup_minhash_lsh above), so the
# components are identical.
ORACLES["duplicate_clusters_lsh"] = ORACLES["duplicate_clusters"]

# Exact cosine near-dup pairs at threshold 0.4 (the corpus' max pairwise
# cosine is ~0.51, so this yields a non-empty, hash-checkable result; the
# production 0.95-threshold LSH path is validated by planted-dup tests).
ORACLES["embedding_near_dup_exact"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       list_dot_product(a.v, b.v)
         / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
         AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v)
        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
      >= 0.4
"""

# Semantic decontamination (r15): benchmark = every 50th vec_id (the
# decontaminate split transplanted to embeddings); a corpus vector is
# contaminated when its fold cosine vs ANY benchmark vector clears the
# 0.3 threshold (non-trivial at every SF: 40/48/506 contaminated docs
# at sf0.001/0.01/0.1). Output is integer/boolean only — the cosine is
# decision state — and the threshold verdict is decided on the same
# bit-identical list_dot_product fold both engines share, so Spark's
# matmul-candidates + fold-rescore pipeline and this direct all-pairs
# restatement agree row-for-row.
ORACLES["semantic_decontaminate"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
     b AS (SELECT * FROM e WHERE vec_id % 50 = 0),
     c AS (SELECT * FROM e WHERE vec_id % 50 <> 0),
     hits AS (
       SELECT c.vec_id, count(*) AS n
       FROM c, b
       WHERE list_dot_product(c.v, b.v)
               / (sqrt(list_dot_product(c.v, c.v))
                  * sqrt(list_dot_product(b.v, b.v)))
             >= 0.3
       GROUP BY c.vec_id)
SELECT c.vec_id,
       CAST(COALESCE(hits.n, 0) AS BIGINT) AS n_bench_hits,
       COALESCE(hits.n, 0) >= 1 AS semantically_contaminated
FROM c LEFT JOIN hits ON c.vec_id = hits.vec_id
"""

ORACLES["ann_cosine_topk"] = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings ORDER BY vec_id LIMIT 5
), c AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings
), scored AS (
  SELECT query_id, neighbor_id,
         list_dot_product(qv, cv)
           / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cosine
  FROM c, q WHERE neighbor_id <> query_id
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM scored)
WHERE rank <= 10
"""

# int8 scalar-quantized ANN: quantization is floor(x*127/maxabs + 0.5)
# (round-half-up via floor — native round() half-modes differ between
# engines), the dot product is exact integer math (list_dot_product's
# double accumulation is exact below 2^53), and the quantized cosine is
# one sqrt-product-divide with identical IEEE spelling both sides.
ORACLES["ann_cosine_topk_sq8"] = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), q8 AS (
  SELECT vec_id,
         list_transform(v, x -> CAST(floor(
             x * 127.0 / greatest(list_max(list_transform(v, y -> abs(y))),
                                  1e-30) + 0.5) AS BIGINT)) AS qv
  FROM e
), qn AS (
  SELECT vec_id, qv, CAST(list_dot_product(qv, qv) AS BIGINT) AS qq FROM q8
), qs AS (
  SELECT vec_id AS query_id, qv AS a_qv, qq AS a_qq
  FROM qn ORDER BY vec_id LIMIT 5
), scored AS (
  SELECT query_id, c.vec_id AS neighbor_id,
         CAST(list_dot_product(a_qv, c.qv) AS BIGINT) AS qdot,
         CAST(list_dot_product(a_qv, c.qv) AS DOUBLE)
           / (sqrt(CAST(a_qq AS DOUBLE)) * sqrt(CAST(c.qq AS DOUBLE))) AS qcos
  FROM qn c, qs WHERE c.vec_id <> query_id
)
SELECT query_id, neighbor_id, qdot, CAST(rank AS INTEGER) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY qcos DESC, neighbor_id ASC) AS rank
      FROM scored)
WHERE rank <= 10
"""

# Two-phase sq8 retrieval: phase 1 is the sq8 oracle's ranking cut at
# the 30-candidate shortlist; phase 2 re-scores only those pairs with
# the float cosine (list_dot_product / sqrt-product — the operation
# order the ann_cosine_topk oracle already proved bit-identical to the
# Spark fold). Every step deterministic, so the gate is a full hash.
ORACLES["ann_cosine_topk_sq8_rescored"] = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), q8 AS (
  SELECT vec_id, v,
         list_transform(v, x -> CAST(floor(
             x * 127.0 / greatest(list_max(list_transform(v, y -> abs(y))),
                                  1e-30) + 0.5) AS BIGINT)) AS qv
  FROM e
), qn AS (
  SELECT vec_id, v, qv,
         CAST(list_dot_product(qv, qv) AS BIGINT) AS qq FROM q8
), qs AS (
  SELECT vec_id AS query_id, v AS q_vec, qv AS a_qv, qq AS a_qq
  FROM qn ORDER BY vec_id LIMIT 5
), scored AS (
  SELECT query_id, c.vec_id AS neighbor_id, q_vec, c.v AS c_vec,
         CAST(list_dot_product(a_qv, c.qv) AS DOUBLE)
           / (sqrt(CAST(a_qq AS DOUBLE)) * sqrt(CAST(c.qq AS DOUBLE))) AS qcos
  FROM qn c, qs WHERE c.vec_id <> query_id
), shortlist AS (
  SELECT query_id, neighbor_id, q_vec, c_vec
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY qcos DESC, neighbor_id ASC)
               AS srank
        FROM scored)
  WHERE srank <= 30
), rescored AS (
  SELECT query_id, neighbor_id,
         list_dot_product(q_vec, c_vec)
           / (sqrt(list_dot_product(q_vec, q_vec))
              * sqrt(list_dot_product(c_vec, c_vec))) AS cosine
  FROM shortlist
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id ASC)
             AS rank
      FROM rescored)
WHERE rank <= 10
"""

# Cross-source exact-dup overlap: per-digest source counts, unordered
# source-pair products (within-source: n*(n-1) integer-div 2 — even
# product, exact bigint both engines), summed per pair.
ORACLES["source_overlap_matrix"] = """
WITH u AS (
  SELECT text, source FROM documents
  UNION ALL
  SELECT text, 'rescrape' AS source FROM documents WHERE doc_id % 10 = 0
), d AS (
  SELECT md5(COALESCE(text, '')) AS dig, source, COUNT(*) AS n
  FROM u GROUP BY dig, source
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(SUM(CASE WHEN a.source = b.source
                     THEN (a.n * (a.n - 1)) // 2
                     ELSE a.n * b.n END) AS BIGINT) AS n_dup_pairs
FROM d a JOIN d b ON a.dig = b.dig AND a.source <= b.source
GROUP BY source_a, source_b
HAVING SUM(CASE WHEN a.source = b.source THEN (a.n * (a.n - 1)) // 2
                ELSE a.n * b.n END) > 0
"""

# ---------------------------------------------------------------------
# Event-stream analytics over the events table — capabilities beyond the
# reference (session windows, sliding windows, JSON paths, ranked top-k).
# events.ts is TIMESTAMP_NS in parquet; CAST(ts AS TIMESTAMP) floor-
# truncates to micros, matching the Spark loader's ts DIV 1000.
# ---------------------------------------------------------------------

ORACLES["events_sessionize"] = """
WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
m AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM e
),
s AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
"""

ORACLES["events_sliding_counts"] = """
WITH e AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
x AS (
  SELECT event_type, ts, unnest(generate_series(0, 3)) AS k FROM e
)
SELECT time_bucket(INTERVAL '15 minutes', ts) - to_minutes(CAST(15 * k AS BIGINT))
         AS window_start,
       event_type, COUNT(*) AS n_events
FROM x GROUP BY 1, 2
"""

ORACLES["events_json_props_stats"] = """
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events GROUP BY event_type
"""

ORACLES["events_topk_users"] = """
WITH c AS (
  SELECT event_type, user_id, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT event_type, user_id, n_events, CAST(rank AS INTEGER) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY n_events DESC, user_id ASC) AS rank
      FROM c)
WHERE rank <= 3
"""

# A9 latest-per-key over a changelog WITH duplicate keys: every 10th route
# re-emitted one day later with a different capacity (views.py
# routes_reemitted); winner = newest record per route_id.
ORACLES["latest_route_capacity"] = f"""{_R},
re AS (
  SELECT 'Route_' || CAST(o_orderkey AS VARCHAR) AS route_id,
         CAST(((CAST(floor(o_totalprice) AS BIGINT) + 37) % 200) + 1 AS INTEGER) AS capacity,
         o_orderdate + INTERVAL 1 DAY AS event_ts
  FROM orders WHERE o_orderkey % 10 = 0
),
chg AS (
  SELECT route_id, capacity, event_ts FROM routes
  UNION ALL
  SELECT route_id, capacity, event_ts FROM re
)
SELECT route_id, capacity, event_ts AS last_event_ts
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY route_id
                                   ORDER BY event_ts DESC) AS rn
      FROM chg)
WHERE rn = 1
"""

# The stateful streaming realization (streaming/stateful.py) replays only
# the keys that actually receive an update (o_orderkey % 10 = 0) — every
# key exercises the duplicate-key state transition; same row_number oracle
# restricted to those keys.
ORACLES["latest_route_capacity_stateful"] = f"""{_R},
re AS (
  SELECT 'Route_' || CAST(o_orderkey AS VARCHAR) AS route_id,
         CAST(((CAST(floor(o_totalprice) AS BIGINT) + 37) % 200) + 1 AS INTEGER) AS capacity,
         o_orderdate + INTERVAL 1 DAY AS event_ts
  FROM orders WHERE o_orderkey % 80 = 0
),
chg AS (
  SELECT route_id, capacity, event_ts FROM routes
  WHERE CAST(SUBSTRING(route_id, 7) AS BIGINT) % 80 = 0
  UNION ALL
  SELECT route_id, capacity, event_ts FROM re
)
SELECT route_id, capacity, event_ts AS last_event_ts
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY route_id
                                   ORDER BY event_ts DESC) AS rn
      FROM chg)
WHERE rn = 1
"""

# S5 Connect-envelope sink path: Q5 rendered as Kafka (key, value) strings.
# The header string must equal streaming/envelope.py connect_schema_json's
# compact JSON byte-for-byte.
ORACLES["envelope_passengers_per_route"] = f"""{_T}
SELECT route_id AS key,
       '{{"schema": {{"type": "struct", "fields": [{{"field": "passengerCount", "type": "int64"}}]}}, "payload": {{"passengerCount": '
         || CAST(COUNT(*) AS VARCHAR) || '}}}}' AS value
FROM trips GROUP BY route_id
"""

ORACLES["text_fingerprint"] = """
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(list_filter(string_split(text, ''), c -> c <> ''),
                          c -> CAST(unicode(c) AS BIGINT))),
         (acc, x) -> (acc * 31 + x) % 1099511627776) AS fingerprint
FROM documents
"""

# Training-corpus cleaning manifest: exact-dedup keeper + quality floor +
# language confirmation (restates operators/pipeline.py corpus_clean).
ORACLES["corpus_clean"] = f"""
WITH scored AS (
  SELECT doc_id, lang, text,
         CAST(len({_TOKENS}) AS BIGINT) AS n_tokens,
         CASE WHEN length(text) = 0 THEN 0.0
              ELSE CAST(len(regexp_extract_all(text, '[.,!?;:''"()\\[\\]{{}}-]')) AS DOUBLE)
                   / CAST(length(text) AS DOUBLE) END AS punct_ratio,
         (SELECT CASE
            WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
            WHEN h_de = greatest(h_en, h_de, h_fr, h_es) THEN 'de'
            WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
            WHEN h_es = greatest(h_en, h_de, h_fr, h_es) THEN 'es'
            ELSE 'fr' END
          FROM (SELECT
            len(list_filter(list_transform({_TOKENS}, x -> lower(x)), x -> x IN ('the','and','of','to','is','in','that','with'))) AS h_en,
            len(list_filter(list_transform({_TOKENS}, x -> lower(x)), x -> x IN ('der','die','das','und','ist','nicht','ein','mit'))) AS h_de,
            len(list_filter(list_transform({_TOKENS}, x -> lower(x)), x -> x IN ('le','la','les','et','est','une','que','dans'))) AS h_fr,
            len(list_filter(list_transform({_TOKENS}, x -> lower(x)), x -> x IN ('el','la','los','es','una','que','por','con'))) AS h_es)
         ) AS lang_pred
  FROM documents
),
keep AS (SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_doc_id
         FROM documents GROUP BY md5(text))
SELECT s.doc_id, s.n_tokens, s.lang
FROM scored s JOIN keep k ON md5(s.text) = k.text_md5
WHERE s.doc_id = k.keep_doc_id
  AND s.n_tokens >= 10
  AND s.punct_ratio <= 0.25
  AND (s.lang_pred = s.lang OR s.lang_pred = 'und')
"""

# --- curation ops (operators/curation.py) — all value-exact -----------

# Epoch-weighted mixture materialization: weights in integer thousandths
# of an epoch; the fractional copy keeps iff u * 1000 < frac * 2^32 over
# the md5-prefix integer — pure bigint arithmetic in both engines.
ORACLES["materialize_mixture"] = """
WITH w AS (
  SELECT doc_id, source,
         CASE source WHEN 'src0' THEN 0 WHEN 'src1' THEN 2500
              WHEN 'src2' THEN 1300 ELSE 1000 END AS e,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           AS u
  FROM documents
),
n AS (
  SELECT doc_id, source,
         CAST(e // 1000 + CASE WHEN u * 1000 < (e % 1000) * 4294967296
                               THEN 1 ELSE 0 END AS BIGINT) AS n_copies
  FROM w
)
SELECT doc_id, source, n_copies, CAST(c AS BIGINT) AS copy
FROM (SELECT doc_id, source, n_copies,
             unnest(generate_series(0, CAST(n_copies AS INTEGER) - 1)) AS c
      FROM n WHERE n_copies > 0)
"""

ORACLES["sample_deterministic"] = """
SELECT doc_id, SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS sample_key,
       lang, source, n_chars
FROM documents
WHERE SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
"""

# Deterministic global shuffle: the md5-derived 60-bit key is computed
# bit-identically in both engines; shard = key mod 16 (key non-negative,
# so % == pmod), position = rank by (key, doc_id) within the shard.
ORACLES["global_shuffle"] = """
WITH k AS (
  SELECT doc_id,
         ('0x' || substring(md5('s0:' || CAST(doc_id AS VARCHAR)), 1, 15))
           ::BIGINT AS shuffle_key
  FROM documents
)
SELECT doc_id,
       CAST(shuffle_key % 16 AS INTEGER) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shuffle_key % 16
                               ORDER BY shuffle_key, doc_id) - 1 AS BIGINT)
         AS pos_in_shard,
       shuffle_key
FROM k
"""

ORACLES["train_val_test_split"] = """
SELECT doc_id, SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS split_key,
       CASE WHEN SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
            WHEN SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
            ELSE 'test' END AS split,
       lang, source
FROM documents
"""

# Corpus vocabulary top-k: same whitespace tokenization as token_count,
# count desc / token asc ordering makes rank deterministic.
ORACLES["text_vocab_topk"] = f"""
WITH tok AS (
  SELECT unnest({_TOKENS}) AS token FROM documents
),
counts AS (
  SELECT token, COUNT(*) AS n_occurrences FROM tok GROUP BY token
)
SELECT token, n_occurrences,
       CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, token ASC) AS INTEGER)
         AS rank
FROM counts
ORDER BY n_occurrences DESC, token ASC
LIMIT 100
"""

ORACLES["normalize_text"] = r"""
SELECT doc_id,
       TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g')) AS norm_text,
       CAST(LENGTH(TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g'))) AS BIGINT)
         AS n_chars_norm
FROM documents
"""

# Plants the same deterministic contact line as the Spark query, then
# redacts with the same Java/RE2-intersection patterns.
ORACLES["pii_scrub"] = r"""
WITH raw AS (
  SELECT doc_id,
         text || ' Contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com from 10.0.'
              || CAST(doc_id % 256 AS VARCHAR) || '.1 please.' AS r
  FROM documents
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(r, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                        '<EMAIL>', 'g'),
         '\b\d{1,3}(\.\d{1,3}){3}\b', '<IP>', 'g') AS scrubbed,
       CAST(len(regexp_extract_all(r, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
            + len(regexp_extract_all(r, '\b\d{1,3}(\.\d{1,3}){3}\b'))
            AS BIGINT) AS n_redactions
FROM raw
"""

# Concat-and-chunk packing restated with the same sharded running sum.
ORACLES["pack_sequences"] = r"""
WITH base AS (
  SELECT doc_id, doc_id % 16 AS shard,
         CAST(len(list_filter(string_split_regex(COALESCE(text, ''), '\s+'), t -> t <> ''))
              AS BIGINT) AS n_tokens
  FROM documents
),
laid AS (
  SELECT doc_id, shard, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
              AS BIGINT) AS offset_in_shard
  FROM base
)
SELECT doc_id, shard, n_tokens, offset_in_shard,
       CAST(FLOOR(CAST(offset_in_shard AS DOUBLE) / 2048) AS BIGINT) AS pack_id
FROM laid
"""

ORACLES["mix_by_source"] = """
SELECT doc_id, source, n_chars, rank_in_source
FROM (SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id ASC)
               AS rank_in_source
      FROM documents)
WHERE rank_in_source <= 50
"""

# Character-5-gram overlap of each training doc against the benchmark
# set (every 50th doc); distinct shingles per side, exactly the Spark
# broadcast semi-join's semantics.
ORACLES["decontaminate"] = """
WITH sh AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, GREATEST(LENGTH(text)-4, 1)),
                               i -> substr(text, CAST(i AS INTEGER), 5))) AS s
  FROM documents
),
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0),
train_sh AS (SELECT DISTINCT doc_id, s FROM sh WHERE doc_id % 50 <> 0),
hits AS (SELECT doc_id, COUNT(*) AS n_shared
         FROM train_sh JOIN bench USING (s) GROUP BY doc_id)
SELECT d.doc_id, COALESCE(h.n_shared, 0) AS n_shared,
       COALESCE(h.n_shared, 0) >= 10 AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) d
LEFT JOIN hits h USING (doc_id)
"""

ORACLES["multimodal_features"] = """
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS content_sha256
FROM documents
"""

# Byte-exact restatement of the nearest-neighbor resize stub: documents
# are pure ASCII, so substring char indexing equals the kernel's byte
# indexing and sha256 over the rebuilt string matches F.sha2 on the bytes.
ORACLES["multimodal_resize"] = """
WITH img AS (
  SELECT doc_id AS media_id, text, length(text) AS n
  FROM documents WHERE doc_id % 3 = 0),
res AS (
  SELECT media_id,
         string_agg(substring(text, CAST(i * n // 1024 AS BIGINT) + 1, 1),
                    '' ORDER BY i) AS out
  FROM img, range(1024) t(i)
  GROUP BY media_id)
SELECT media_id, 32 AS width, 32 AS height,
       CAST(length(out) AS BIGINT) AS n_bytes,
       sha256(out) AS content_sha256
FROM res
"""

ORACLES["multimodal_frame_sample"] = """
WITH vid AS (
  SELECT doc_id AS media_id, text,
         CAST(length(text) * 10 AS BIGINT) AS dur,
         (length(text) + 63) // 64 AS total
  FROM documents WHERE doc_id % 3 = 2),
v AS (SELECT media_id, text, dur, total, least(4, total) AS k FROM vid)
SELECT v.media_id,
       CAST(t.j AS INTEGER) AS frame_idx,
       CAST(t.j * v.total // v.k AS BIGINT) AS src_frame,
       CAST((t.j * v.total // v.k) * v.dur // v.total AS BIGINT) AS ts_ms,
       sha256(substring(v.text, CAST(t.j * v.total // v.k AS BIGINT) * 64 + 1, 64)) AS frame_sha256
FROM v, range(4) t(j) WHERE t.j < v.k
"""

# dHash image near-dup: the stub kernel's 8x9 byte grid rebuilt with
# substring/ord arithmetic (pure-ASCII payloads, same argument as the
# resize oracle); hamming computed ALL-PAIRS over per-bit rows, so the
# engine's block-combination candidate tables must recover exactly the
# exhaustive answer. Empty payloads hash to 0 (every bit 0), matching
# the kernel's None-grid path.
ORACLES["media_dhash_pairs"] = """
WITH img0 AS (
  SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 0
),
planted AS (
  SELECT doc_id + 3000000000000 AS media_id,
         substr(text, 1, 10) || '#' || substr(text, 12) AS text
  FROM documents WHERE doc_id % 30 = 0 AND length(text) >= 72
),
img AS (
  SELECT media_id, text, length(text) AS n
  FROM (SELECT * FROM img0 UNION ALL SELECT * FROM planted)
),
bits AS (
  SELECT media_id, b,
         CASE WHEN n = 0 THEN 0
              WHEN ord(substr(text,
                     CAST((((b // 8) * 9 + (b % 8) + 1) * n) // 72 + 1
                          AS INTEGER), 1))
                 > ord(substr(text,
                     CAST((((b // 8) * 9 + (b % 8)) * n) // 72 + 1
                          AS INTEGER), 1))
              THEN 1 ELSE 0 END AS bit
  FROM img, (SELECT unnest(generate_series(0, 63)) AS b)
)
SELECT a.media_id AS a_id, c.media_id AS b_id,
       CAST(SUM(CASE WHEN a.bit <> c.bit THEN 1 ELSE 0 END) AS BIGINT)
         AS hamming
FROM bits a JOIN bits c ON a.b = c.b AND a.media_id < c.media_id
GROUP BY 1, 2
HAVING SUM(CASE WHEN a.bit <> c.bit THEN 1 ELSE 0 END) <= 3
"""

ORACLES["q13_most_occupied_operator"] = f"""{_RT},
cap AS (SELECT operator, CAST(SUM(capacity) AS BIGINT) AS cap FROM routes GROUP BY operator),
pax AS (
  SELECT r.operator, COUNT(*) AS pax
  FROM trips t JOIN routes r ON t.route_id = r.route_id
  GROUP BY r.operator
),
occ AS (
  SELECT cap.operator, {_occ('pax.pax', 'cap.cap')} AS occupancyPercentage
  FROM cap LEFT JOIN pax ON cap.operator = pax.operator
)
SELECT operator, occupancyPercentage
FROM occ
ORDER BY occupancyPercentage DESC, operator ASC LIMIT 1
"""

# --- bug-compat twins (reference's latest-wins collapse, notes 7.3/7.4) --
# Q12: per window, the row kept is the transport type of the window's
# latest-arriving trip (event_ts DESC, transport_type DESC tie-break —
# the struct-max spelling of q12_logic's max_by), at that type's FINAL
# windowed occupancy.
ORACLES["q12_bug_compat"] = f"""{_RT},
cap AS (SELECT transport_type, CAST(SUM(capacity) AS BIGINT) AS cap FROM routes GROUP BY transport_type),
wc AS (
  SELECT date_trunc('hour', event_ts) AS window_start, transport_type,
         COUNT(*) AS cnt
  FROM trips GROUP BY 1, 2
),
occ AS (
  SELECT wc.window_start, wc.transport_type,
         {_occ('wc.cnt', 'cap.cap')} AS occupancy
  FROM wc LEFT JOIN cap ON wc.transport_type = cap.transport_type
),
last_type AS (
  SELECT window_start, transport_type
  FROM (SELECT date_trunc('hour', event_ts) AS window_start, transport_type,
               ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', event_ts)
                                  ORDER BY event_ts DESC, transport_type DESC) AS rn
        FROM trips)
  WHERE rn = 1
)
SELECT occ.window_start, occ.transport_type AS transportType, occ.occupancy
FROM occ JOIN last_type
  ON occ.window_start = last_type.window_start
 AND occ.transport_type = last_type.transport_type
"""

# Q13: each operator's passenger figure is the final count of the route
# that updated last (last_ts DESC, route_id DESC tie-break), then the
# same occupancy argmax as the intended twin.
ORACLES["q13_bug_compat"] = f"""{_RT},
cap AS (SELECT operator, CAST(SUM(capacity) AS BIGINT) AS cap FROM routes GROUP BY operator),
per_route AS (
  SELECT r.operator, t.route_id, COUNT(*) AS route_pax,
         MAX(t.event_ts) AS last_ts
  FROM trips t JOIN routes r ON t.route_id = r.route_id
  GROUP BY r.operator, t.route_id
),
pax AS (
  SELECT operator, route_pax AS pax
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY operator
                                     ORDER BY last_ts DESC, route_id DESC) AS rn
        FROM per_route)
  WHERE rn = 1
),
occ AS (
  SELECT cap.operator, {_occ('pax.pax', 'cap.cap')} AS occupancyPercentage
  FROM cap LEFT JOIN pax ON cap.operator = pax.operator
)
SELECT operator, occupancyPercentage
FROM occ
ORDER BY occupancyPercentage DESC, operator ASC LIMIT 1
"""

#: The 13 reference queries by exact registered name — the shared
#: allowlist for every surface that means "the reference queries"
#: (sql.py QUERY_SQL, bench.py reference_queries_sec). A name-prefix
#: filter would silently pick up variants like q2_approx_....
Q_NAMES: tuple[str, ...] = (
    "q1_available_seats_per_route",
    "q2_average_passengers_per_transport_type",
    "q3_name_passenger_most_trips",
    "q4_occupancy_per_route",
    "q5_passengers_per_route",
    "q6_route_least_occupancy_per_transport_type",
    "q7_total_capacity_available",
    "q8_total_occupancy_percentage",
    "q9_total_passengers",
    "q10_transport_type_max_passengers",
    "q11_transport_type_max_passengers_window",
    "q12_least_occupied_transport_type_window",
    "q13_most_occupied_operator",
)

# Gopher-style repetition signals: token-duplication fraction plus the
# frequency share of the most common word bigram/trigram. The Spark side
# hashes grams to longs before counting (count-identical barring 2^-64
# collisions); the oracle counts the raw token tuples. All ratios are
# one division of exact integer counts.
_ORACLE_TOKS = "list_filter(string_split_regex(COALESCE(text, ''), '\\s+'), x -> x <> '')"
ORACLES["repetition_signals"] = f"""
WITH base AS (
  SELECT doc_id,
         CAST(len({_ORACLE_TOKS}) AS BIGINT) AS n,
         CAST(len(list_distinct({_ORACLE_TOKS})) AS BIGINT) AS nd,
         {_ORACLE_TOKS} AS lt
  FROM documents
),
g2 AS (
  SELECT doc_id, MAX(c) AS m FROM (
    SELECT doc_id,
           lt[CAST(i AS INTEGER)] || ' ' || lt[CAST(i + 1 AS INTEGER)] AS g,
           COUNT(*) AS c
    FROM (SELECT doc_id, lt, unnest(generate_series(1, n - 1)) AS i
          FROM base WHERE n >= 2)
    GROUP BY doc_id, g)
  GROUP BY doc_id
),
g3 AS (
  SELECT doc_id, MAX(c) AS m FROM (
    SELECT doc_id,
           lt[CAST(i AS INTEGER)] || ' ' || lt[CAST(i + 1 AS INTEGER)]
             || ' ' || lt[CAST(i + 2 AS INTEGER)] AS g,
           COUNT(*) AS c
    FROM (SELECT doc_id, lt, unnest(generate_series(1, n - 2)) AS i
          FROM base WHERE n >= 3)
    GROUP BY doc_id, g)
  GROUP BY doc_id
)
SELECT b.doc_id,
       b.n AS n_tokens,
       CASE WHEN b.n = 0 THEN 0.0
            ELSE CAST(b.n - b.nd AS DOUBLE) / CAST(b.n AS DOUBLE) END
         AS dup_token_frac,
       CASE WHEN b.n < 2 THEN 0.0
            ELSE CAST(g2.m AS DOUBLE) / CAST(b.n - 1 AS DOUBLE) END
         AS top_2gram_frac,
       CASE WHEN b.n < 3 THEN 0.0
            ELSE CAST(g3.m AS DOUBLE) / CAST(b.n - 2 AS DOUBLE) END
         AS top_3gram_frac
FROM base b LEFT JOIN g2 ON g2.doc_id = b.doc_id
            LEFT JOIN g3 ON g3.doc_id = b.doc_id
"""

# C4/Gopher filter verdicts: every rule an explicit flag + composite kept.
ORACLES["quality_filter"] = f"""
WITH base AS (
  SELECT doc_id,
         CAST(len({_ORACLE_TOKS}) AS BIGINT) AS n,
         CAST(length(text) AS BIGINT) AS n_chars,
         {_ORACLE_TOKS} AS lt
  FROM documents
),
g2 AS (
  SELECT doc_id, MAX(c) AS m FROM (
    SELECT doc_id,
           lt[CAST(i AS INTEGER)] || ' ' || lt[CAST(i + 1 AS INTEGER)] AS g,
           COUNT(*) AS c
    FROM (SELECT doc_id, lt, unnest(generate_series(1, n - 1)) AS i
          FROM base WHERE n >= 2)
    GROUP BY doc_id, g)
  GROUP BY doc_id
),
flags AS (
  SELECT b.doc_id,
         b.n < 15 AS flag_too_short,
         (CASE WHEN b.n = 0 THEN 0.0
               ELSE CAST(b.n_chars AS DOUBLE) / CAST(b.n AS DOUBLE) END)
           > 5.9 AS flag_long_words,
         (CASE WHEN b.n < 2 THEN 0.0
               ELSE CAST(COALESCE(g2.m, 0) AS DOUBLE)
                    / CAST(b.n - 1 AS DOUBLE) END)
           > 0.08 AS flag_repetitive
  FROM base b LEFT JOIN g2 ON g2.doc_id = b.doc_id
)
SELECT doc_id, flag_too_short, flag_long_words, flag_repetitive,
       NOT (flag_too_short OR flag_long_words OR flag_repetitive) AS kept
FROM flags
"""

# Incremental dedup: near-dup pairs of the odd-id increment against the
# even-id corpus — same exact-Jaccard relation as ngram_jaccard_pairs,
# restricted to cross-side pairs, with the LSH-recall argument giving
# the full hash-match gate (see dedup_minhash_lsh above).
ORACLES["dedup_against"] = """
WITH sh AS (
  SELECT DISTINCT doc_id, substring(text, CAST(g AS INTEGER), 9) AS s
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, greatest(length(text) - 8, 1))) AS g
        FROM documents)
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS new_id, b.doc_id AS corpus_id, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s
  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
  GROUP BY 1, 2
)
SELECT new_id, corpus_id,
       CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = new_id
JOIN sizes sb ON sb.doc_id = corpus_id
WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.8
"""

# Temperature (tau=0.5) mixture quotas, integer-exact: weight =
# floor(sqrt(per-source count)), quota = max(1, weight*total DIV
# sum(weight)), filled in md5(doc_id) order.
ORACLES["mix_temperature"] = """
WITH w AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(floor(sqrt(COUNT(*))) AS BIGINT) AS w
  FROM documents GROUP BY source
),
q AS (
  SELECT source,
         -- SUM(BIGINT) is HUGEINT in DuckDB and would poison the quota
         -- into float64 on fetch; pin every stage back to BIGINT
         CAST(greatest(CAST(1 AS BIGINT),
                       (w * CAST(200 AS BIGINT))
                         // CAST((SELECT SUM(w) FROM w) AS BIGINT))
              AS BIGINT) AS quota
  FROM w
),
ranked AS (
  SELECT doc_id, source,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC)
         AS INTEGER) AS sample_rank
  FROM documents
)
SELECT r.doc_id, r.source, r.sample_rank, q.quota
FROM ranked r JOIN q ON q.source = r.source
WHERE r.sample_rank <= q.quota
"""

# Backward as-of join: each trip picks the route-capacity version in
# effect at its event time over the re-emitted changelog. The Spark side
# is the single-shuffle union-trick (operators/temporal.py); DuckDB
# states it natively with ASOF LEFT JOIN (ties-at-equal-ts included by
# the >= bound on both sides).
ORACLES["trips_asof_route_version"] = f"""{_RT},
re AS (
  SELECT 'Route_' || CAST(o_orderkey AS VARCHAR) AS route_id,
         CAST(((CAST(floor(o_totalprice) AS BIGINT) + 37) % 200) + 1 AS INTEGER) AS capacity,
         o_orderdate + INTERVAL 1 DAY AS event_ts
  FROM orders WHERE o_orderkey % 10 = 0
),
chg AS (
  SELECT route_id, capacity, CAST(event_ts AS TIMESTAMP) AS vts FROM routes
  UNION ALL
  SELECT route_id, capacity, CAST(event_ts AS TIMESTAMP) AS vts FROM re
)
SELECT t.trip_id, t.route_id, CAST(t.event_ts AS TIMESTAMP) AS trip_ts,
       COALESCE(c.capacity, -1) AS capacity_asof,
       COALESCE(c.vts, TIMESTAMP '1970-01-01 00:00:00') AS version_ts
FROM trips t ASOF LEFT JOIN chg c
  ON t.route_id = c.route_id AND CAST(t.event_ts AS TIMESTAMP) >= c.vts
"""

# Point-in-interval range join: every 'error' event opens a 15-minute
# per-user incident window; emit the user's events inside (start, end].
# The Spark side is the binned equi-join; the oracle states the naive
# inequality join.
ORACLES["error_incident_events"] = """
WITH ev AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
  FROM events
),
inc AS (
  SELECT event_id AS incident_id, user_id, ts AS start_ts,
         ts + INTERVAL 15 MINUTE AS end_ts
  FROM ev WHERE event_type = 'error'
)
SELECT i.incident_id, e.event_id, e.event_type
FROM inc i JOIN ev e
  ON e.user_id = i.user_id AND e.ts > i.start_ts AND e.ts <= i.end_ts
"""

# One-pass hierarchy rollup: the oracle restates Spark's single
# Expand+agg as the naive UNION ALL of the four resolution levels
# (grouping_id 0/1/3/7), with the same 'ALL'/epoch sentinels.
# Exact nearest-rank quantiles: the value at row_number ceil(q * n) in
# per-group value order — no interpolation, so the selected double
# exists in the data and both engines agree bit-for-bit (the rank is
# ceil over the same IEEE product).
ORACLES["events_value_quantiles_exact"] = """
WITH r AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type, q AS quantile, value
FROM r, (VALUES (0.5), (0.9), (0.99)) t(q)
WHERE rn = CAST(ceil(q * CAST(n AS DOUBLE)) AS BIGINT)
"""

# Key-skew profile: exact counts, TakeOrdered top-10, one division per
# ratio of exact integers; ties broken by binary string order of the key
# (identical collation both engines).
ORACLES["key_skew_profile"] = f"""{_T},
c AS (SELECT route_id AS key, COUNT(*) AS n_rows FROM trips
      GROUP BY route_id),
t AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total FROM c),
r AS (SELECT key, n_rows,
             ROW_NUMBER() OVER (ORDER BY n_rows DESC, key ASC) AS rank,
             SUM(n_rows) OVER (ORDER BY n_rows DESC, key ASC
                               ROWS UNBOUNDED PRECEDING) AS cum
      FROM c)
SELECT key, CAST(n_rows AS BIGINT) AS n_rows, CAST(rank AS INTEGER) AS rank,
       CAST(n_rows AS DOUBLE) / CAST(total AS DOUBLE) AS share,
       CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share
FROM r, t WHERE rank <= 10
"""

ORACLES["trip_time_rollup"] = f"""{_T},
base AS (
  SELECT transport_type,
         date_trunc('day', event_ts) AS day,
         date_trunc('hour', event_ts) AS hour
  FROM trips
)
SELECT transport_type, CAST(day AS TIMESTAMP) AS day,
       CAST(hour AS TIMESTAMP) AS hour, 0 AS level, COUNT(*) AS cnt
FROM base GROUP BY 1, 2, 3
UNION ALL
SELECT transport_type, CAST(day AS TIMESTAMP) AS day,
       TIMESTAMP '1970-01-01 00:00:00' AS hour, 1 AS level, COUNT(*) AS cnt
FROM base GROUP BY 1, 2
UNION ALL
SELECT transport_type, TIMESTAMP '1970-01-01 00:00:00' AS day,
       TIMESTAMP '1970-01-01 00:00:00' AS hour, 3 AS level, COUNT(*) AS cnt
FROM base GROUP BY 1
UNION ALL
SELECT 'ALL' AS transport_type, TIMESTAMP '1970-01-01 00:00:00' AS day,
       TIMESTAMP '1970-01-01 00:00:00' AS hour, 7 AS level, COUNT(*) AS cnt
FROM base
"""

# Stratified per-source sampling: cutoff table restated as a CASE; the
# 16-bit hex prefix decodes identically via '0x'||hex cast.
ORACLES["stratified_sample"] = """
WITH k AS (
  SELECT doc_id, source, lang, n_chars,
         ('0x' || SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
           AS sample_key16,
         CAST(CASE source WHEN 'web' THEN 3276
                          WHEN 'news' THEN 13107
                          WHEN 'books' THEN 32768
                          ELSE 6553 END AS BIGINT) AS stratum_cutoff
  FROM documents
)
SELECT doc_id, source, lang, n_chars, sample_key16, stratum_cutoff
FROM k WHERE sample_key16 < stratum_cutoff
"""

# Document chunking: chunk count by integer ceil-div, starts on a stride
# grid, text sliced with 1-based substring in both engines.
ORACLES["doc_chunk"] = """
WITH p AS (
  SELECT doc_id, text,
         CASE WHEN length(text) <= 600 THEN CAST(1 AS BIGINT)
              ELSE 1 + (length(text) - 600 + 499) // 500 END AS num
  FROM documents
),
e AS (
  SELECT doc_id, text, unnest(range(0, num)) AS chunk_index FROM p
)
SELECT doc_id, CAST(chunk_index AS BIGINT) AS chunk_index,
       CAST(chunk_index * 500 AS BIGINT) AS chunk_start,
       SUBSTRING(text, CAST(chunk_index * 500 + 1 AS INTEGER), 600)
         AS chunk_text,
       CAST(length(SUBSTRING(text, CAST(chunk_index * 500 + 1 AS INTEGER),
                             600)) AS BIGINT) AS chunk_len
FROM e
"""

# Semantic dedup closure (exact-edge twin): cosine >= 0.4 edges (same
# arithmetic as embedding_near_dup_exact) + recursive transitive closure
# (same pattern as duplicate_clusters).
ORACLES["semantic_dup_clusters_exact"] = """
WITH RECURSIVE e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v))
             * sqrt(list_dot_product(b.v, b.v)))
        >= 0.4
),
sym AS (
  SELECT a_id AS u, b_id AS v FROM pairs
  UNION ALL
  SELECT b_id AS u, a_id AS v FROM pairs
),
reach (u, v) AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u WHERE s.v <> r.u
)
SELECT u AS vec_id,
       least(u, MIN(v)) AS cluster_id,
       least(u, MIN(v)) = u AS is_canonical
FROM reach GROUP BY u
"""

# --- round-4 retrieval / reporting operators ---------------------------

# Shared lowercased-token list (operators/retrieval.py lower_tokens_col)
_LTOKS = "list_filter(string_split_regex(lower(COALESCE(text, '')), '\\s+'), x -> x <> '')"

# Smoothed TF-IDF top-5 per doc: score = tf * (N+1) / (df+1) as doubles
# in that exact operation order (retrieval.py module docstring explains
# why the idf stays rational instead of ln()).
ORACLES["tfidf_topk"] = f"""
WITH toks AS (
  SELECT doc_id, unnest({_LTOKS}) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, term, tf, df, tfidf, rnk FROM (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         CAST(tf.tf AS DOUBLE) * CAST(n.n_docs + 1 AS DOUBLE)
           / CAST(dfreq.df + 1 AS DOUBLE) AS tfidf,
         ROW_NUMBER() OVER (
           PARTITION BY tf.doc_id
           ORDER BY CAST(tf.tf AS DOUBLE) * CAST(n.n_docs + 1 AS DOUBLE)
                      / CAST(dfreq.df + 1 AS DOUBLE) DESC,
                    tf.term ASC) AS rnk
  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
WHERE rnk <= 5
"""

# BM25 top-20 for the fixed query (spark, query, vector); k1=1.2 b=0.75;
# idf rational; all arithmetic written in the engine's exact order.
ORACLES["bm25_search"] = f"""
WITH tok AS (
  SELECT doc_id, {_LTOKS} AS toks FROM documents
),
st AS (
  SELECT COUNT(*) AS n_docs,
         SUM(len(toks)) AS total_tokens,
         SUM(CASE WHEN list_contains(toks, 'spark') THEN 1 ELSE 0 END) AS df_spark,
         SUM(CASE WHEN list_contains(toks, 'query') THEN 1 ELSE 0 END) AS df_query,
         SUM(CASE WHEN list_contains(toks, 'vector') THEN 1 ELSE 0 END) AS df_vector
  FROM tok
),
scored AS (
  SELECT doc_id,
         CAST(len(list_filter(toks, x -> x = 'spark')) AS BIGINT) AS tf_spark,
         CAST(len(list_filter(toks, x -> x = 'query')) AS BIGINT) AS tf_query,
         CAST(len(list_filter(toks, x -> x = 'vector')) AS BIGINT) AS tf_vector,
         CAST(len(toks) AS BIGINT) AS dl
  FROM tok
),
parts AS (
  SELECT doc_id, tf_spark, tf_query, tf_vector, dl,
         0.25 + 0.75 * (CAST(dl AS DOUBLE)
                        / (CAST(st.total_tokens AS DOUBLE)
                           / CAST(st.n_docs AS DOUBLE))) AS norm_len,
         CAST(st.n_docs AS DOUBLE) AS nd,
         CAST(st.df_spark AS DOUBLE) AS dfs,
         CAST(st.df_query AS DOUBLE) AS dfq,
         CAST(st.df_vector AS DOUBLE) AS dfv
  FROM scored CROSS JOIN st
),
s AS (
  SELECT doc_id, tf_spark, tf_query, tf_vector, dl,
         0.0
         + ((nd - dfs + 0.5) / (dfs + 0.5) + 1.0)
             * (CAST(tf_spark AS DOUBLE) * 2.2)
             / (CAST(tf_spark AS DOUBLE) + 1.2 * norm_len)
         + ((nd - dfq + 0.5) / (dfq + 0.5) + 1.0)
             * (CAST(tf_query AS DOUBLE) * 2.2)
             / (CAST(tf_query AS DOUBLE) + 1.2 * norm_len)
         + ((nd - dfv + 0.5) / (dfv + 0.5) + 1.0)
             * (CAST(tf_vector AS DOUBLE) * 2.2)
             / (CAST(tf_vector AS DOUBLE) + 1.2 * norm_len)
         AS score
  FROM parts
)
SELECT doc_id, tf_spark, tf_query, tf_vector, dl, score, rnk FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
  FROM s)
WHERE rnk <= 20
"""

# Hash-vocab tokenization: md5-derived 32-bit ids mod 32000; DuckDB's
# zipped parallel unnests give (position, token) pairs.
ORACLES["tokenize_ids"] = f"""
SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, t AS token,
       ('0x' || substring(md5(t), 1, 8))::BIGINT % 32000 AS token_id
FROM (SELECT doc_id,
             unnest(generate_series(1, len(toks))) AS i,
             unnest(toks) AS t
      FROM (SELECT doc_id, {_LTOKS} AS toks FROM documents))
"""

# Heavy hitters at support 1/32: the oracle is the full-vocabulary
# aggregation (fine at gate scale); the engine reaches the same exact
# answer through bounded-state MG candidates + exact recount. Integer
# keep predicate (n*32 >= total) — no float boundary.
ORACLES["heavy_hitters"] = f"""
WITH occ AS (
  SELECT unnest({_LTOKS}) AS token FROM documents
),
tot AS (SELECT COUNT(*) AS total FROM occ),
c AS (SELECT token, COUNT(*) AS n_occurrences FROM occ GROUP BY 1)
SELECT token, n_occurrences,
       CAST(n_occurrences AS DOUBLE) / CAST(tot.total AS DOUBLE) AS share
FROM c CROSS JOIN tot
WHERE n_occurrences * 32 >= tot.total
"""

# Per-(source, lang) corpus report; median is the LOWER median
# (rn == (cnt+1) // 2 over (n_chars, doc_id) order) — integer-exact.
ORACLES["corpus_stats"] = """
WITH base AS (
  SELECT source, lang, doc_id,
         CAST(length(COALESCE(text, '')) AS BIGINT) AS nc,
         CAST(len(list_filter(string_split_regex(COALESCE(text, ''), '\\s+'),
                              x -> x <> '')) AS BIGINT) AS nt
  FROM documents
),
aggs AS (
  SELECT source, lang, COUNT(*) AS n_docs,
         CAST(SUM(nc) AS BIGINT) AS total_chars,
         MIN(nc) AS min_chars, MAX(nc) AS max_chars,
         CAST(SUM(nt) AS BIGINT) AS total_tokens
  FROM base GROUP BY 1, 2
),
med AS (
  SELECT source, lang, nc AS median_chars FROM (
    SELECT source, lang, nc,
           ROW_NUMBER() OVER (PARTITION BY source, lang
                              ORDER BY nc, doc_id) AS rn,
           COUNT(*) OVER (PARTITION BY source, lang) AS cnt
    FROM base)
  WHERE rn = (cnt + 1) // 2
)
SELECT a.source, a.lang, a.n_docs, a.total_chars,
       CAST(a.total_chars AS DOUBLE) / CAST(a.n_docs AS DOUBLE) AS avg_chars,
       a.min_chars, a.max_chars, m.median_chars, a.total_tokens
FROM aggs a JOIN med m ON a.source = m.source AND a.lang = m.lang
"""

# Graded contamination: same every-50th-doc split and raw-gram relation
# as the decontaminate oracle, plus the per-doc distinct-gram count and
# the single-division fraction.
ORACLES["contamination_overlap"] = """
WITH sh AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, GREATEST(LENGTH(text)-4, 1)),
                               i -> substr(text, CAST(i AS INTEGER), 5))) AS s
  FROM documents
),
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0),
train_sh AS (SELECT DISTINCT doc_id, s FROM sh WHERE doc_id % 50 <> 0),
ng AS (SELECT doc_id, COUNT(*) AS n_grams FROM train_sh GROUP BY doc_id),
hits AS (SELECT doc_id, COUNT(*) AS n_shared
         FROM train_sh JOIN bench USING (s) GROUP BY doc_id)
SELECT ng.doc_id, ng.n_grams, COALESCE(h.n_shared, 0) AS n_shared,
       CAST(COALESCE(h.n_shared, 0) AS DOUBLE)
         / CAST(ng.n_grams AS DOUBLE) AS overlap_frac
FROM ng LEFT JOIN hits h USING (doc_id)
"""

# Contamination attribution: per affected training doc, the benchmark
# doc with the most shared distinct k-grams (ties -> smallest bench id).
ORACLES["contamination_attribution"] = """
WITH sh AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, GREATEST(LENGTH(text)-11, 1)),
                               i -> substr(text, CAST(i AS INTEGER), 12))) AS s
  FROM documents
),
bench AS (SELECT DISTINCT doc_id AS bench_doc_id, s FROM sh WHERE doc_id % 50 = 0),
train_sh AS (SELECT DISTINCT doc_id, s FROM sh WHERE doc_id % 50 <> 0),
pc AS (SELECT t.doc_id, b.bench_doc_id, COUNT(*) AS n_shared
       FROM train_sh t JOIN bench b USING (s)
       GROUP BY 1, 2)
SELECT doc_id, bench_doc_id, n_shared FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY n_shared DESC, bench_doc_id ASC) AS rn
  FROM pc)
WHERE rn = 1
"""

# Declarative pipeline composition (STANDARD_CLEAN_SPEC): normalize ->
# min_tokens(10) -> exact-dedup canonical -> md5(doc_id) 75% sample.
# Restated as chained CTEs — the gate checks the COMPOSITION (token
# floors and dedup hashes act on the NORMALIZED text).
ORACLES["pipeline_standard_clean"] = r"""
WITH n AS (
  SELECT doc_id,
         TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g')) AS text
  FROM documents
),
f AS (
  SELECT doc_id, text,
         CAST(len(list_filter(string_split_regex(COALESCE(text, ''), '\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens
  FROM n
  WHERE len(list_filter(string_split_regex(COALESCE(text, ''), '\s+'), x -> x <> '')) >= 10
),
k AS (SELECT md5(COALESCE(text, '')) AS h, MIN(doc_id) AS keep
      FROM f GROUP BY 1)
SELECT f.doc_id, f.text, f.n_tokens
FROM f JOIN k ON md5(COALESCE(f.text, '')) = k.h AND f.doc_id = k.keep
WHERE SUBSTRING(md5(CAST(f.doc_id AS VARCHAR)), 1, 2) < 'c0'
"""

# The full production clean (pipeline.py FULL_CLEAN_SPEC): standard
# stages plus the corpus-relative gates, restated SEQUENTIALLY — each
# stage's statistic (span inventory, commonness histogram + decile
# threshold, contamination split) is computed over the survivors of the
# previous stage, exactly as the composed DataFrame chain does.
ORACLES["pipeline_full_clean"] = r"""
WITH n AS (
  SELECT doc_id,
         TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g')) AS text
  FROM documents
),
f AS (
  SELECT doc_id, text,
         CAST(len(list_filter(string_split_regex(COALESCE(text, ''), '\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens
  FROM n
  WHERE len(list_filter(string_split_regex(COALESCE(text, ''), '\s+'), x -> x <> '')) >= 10
),
k AS (SELECT md5(COALESCE(text, '')) AS h, MIN(doc_id) AS keep
      FROM f GROUP BY 1),
d1 AS (
  SELECT f.doc_id, f.text, f.n_tokens
  FROM f JOIN k ON md5(COALESCE(f.text, '')) = k.h AND f.doc_id = k.keep
),
pos AS (
  SELECT doc_id, CAST(g AS INTEGER) AS pos,
         substring(text, CAST(g AS INTEGER), 30) AS s
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, length(text) - 29)) AS g
        FROM d1 WHERE length(text) >= 30)
),
rep AS (SELECT s FROM pos GROUP BY s HAVING COUNT(DISTINCT doc_id) >= 2),
rp AS (SELECT doc_id, pos FROM pos JOIN rep USING (s)),
cov AS (
  SELECT doc_id, pos,
         MAX(pos + 30) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM rp
),
agg AS (
  SELECT doc_id,
         SUM(greatest(pos + 30 - greatest(pos, COALESCE(prev_end, pos)), 0))
           AS dup_chars
  FROM cov GROUP BY doc_id
),
d2 AS (
  SELECT d1.doc_id, d1.text, d1.n_tokens
  FROM d1 LEFT JOIN agg USING (doc_id)
  WHERE (CASE WHEN length(d1.text) = 0 THEN 0.0
              ELSE CAST(COALESCE(agg.dup_chars, 0) AS DOUBLE)
                   / CAST(length(d1.text) AS DOUBLE) END) <= 0.5
),
occ AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(COALESCE(text, '')), '\s+'),
                            x -> x <> '')) AS token
  FROM d2
),
counts AS (SELECT token, COUNT(*) AS cnt FROM occ GROUP BY 1),
tot AS (SELECT COUNT(*) AS total FROM occ),
per_doc AS (
  SELECT o.doc_id, COUNT(*) AS n_toks,
         CAST(SUM(c.cnt) AS BIGINT) AS sum_cnt
  FROM occ o JOIN counts c USING (token)
  GROUP BY o.doc_id
),
scored AS (
  SELECT d.doc_id,
         COALESCE(CAST(p.sum_cnt AS DOUBLE)
                  / CAST(p.n_toks * tot.total AS DOUBLE), 0.0) AS commonness
  FROM d2 d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
  CROSS JOIN tot
),
nn AS (SELECT COUNT(*) AS n FROM scored),
hist AS (SELECT commonness, COUNT(*) AS c FROM scored GROUP BY 1),
cum AS (
  SELECT commonness,
         SUM(c) OVER (ORDER BY commonness
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM hist
),
th AS (
  SELECT MIN(commonness) AS threshold
  FROM cum CROSS JOIN nn
  WHERE cum >= (nn.n * 1 + 9) // 10
),
d3 AS (
  SELECT d2.doc_id, d2.text, d2.n_tokens
  FROM d2 JOIN scored USING (doc_id) CROSS JOIN th
  WHERE scored.commonness > th.threshold
),
sh AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, GREATEST(LENGTH(text)-4, 1)),
                               i -> substr(text, CAST(i AS INTEGER), 5))) AS s
  FROM d3
),
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0),
train_sh AS (SELECT DISTINCT doc_id, s FROM sh WHERE doc_id % 50 <> 0),
hits AS (SELECT doc_id, COUNT(*) AS n_shared
         FROM train_sh JOIN bench USING (s) GROUP BY doc_id)
SELECT d3.doc_id, d3.text, d3.n_tokens
FROM d3 LEFT JOIN hits USING (doc_id)
WHERE d3.doc_id % 50 <> 0 AND COALESCE(hits.n_shared, 0) < 190
"""

# Unigram-LM commonness: integer numerator (sum of corpus counts over
# the doc's token occurrences), one division by n_tokens * total.
ORACLES["doc_commonness"] = f"""
WITH occ AS (
  SELECT doc_id, unnest({_LTOKS}) AS token FROM documents
),
counts AS (SELECT token, COUNT(*) AS cnt FROM occ GROUP BY 1),
tot AS (SELECT COUNT(*) AS total FROM occ),
per_doc AS (
  SELECT o.doc_id, COUNT(*) AS n_tokens,
         CAST(SUM(c.cnt) AS BIGINT) AS sum_cnt
  FROM occ o JOIN counts c USING (token)
  GROUP BY o.doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_tokens, 0) AS n_tokens,
       COALESCE(CAST(p.sum_cnt AS DOUBLE)
                / CAST(p.n_tokens * tot.total AS DOUBLE), 0.0) AS commonness
FROM documents d
LEFT JOIN per_doc p ON d.doc_id = p.doc_id
CROSS JOIN tot
"""

# Per-user hourly anomaly: z from integer count aggregates in explicit
# rational form (sample variance), sqrt is IEEE-exact.
ORACLES["events_user_anomaly"] = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
         COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
per_user AS (
  SELECT user_id, COUNT(*) AS n_hours,
         CAST(SUM(cnt) AS BIGINT) AS total,
         CAST(SUM(cnt * cnt) AS BIGINT) AS sum_sq
  FROM hourly GROUP BY 1
),
z AS (
  SELECT h.user_id, h.hour, h.cnt,
         CASE WHEN p.n_hours >= 2
                   AND (CAST(p.n_hours AS DOUBLE) * CAST(p.sum_sq AS DOUBLE)
                        - CAST(p.total AS DOUBLE) * CAST(p.total AS DOUBLE))
                       / (CAST(p.n_hours AS DOUBLE)
                          * CAST(p.n_hours - 1 AS DOUBLE)) > 0
              THEN (CAST(h.cnt AS DOUBLE)
                    - CAST(p.total AS DOUBLE) / CAST(p.n_hours AS DOUBLE))
                   / sqrt((CAST(p.n_hours AS DOUBLE) * CAST(p.sum_sq AS DOUBLE)
                           - CAST(p.total AS DOUBLE) * CAST(p.total AS DOUBLE))
                          / (CAST(p.n_hours AS DOUBLE)
                             * CAST(p.n_hours - 1 AS DOUBLE)))
              ELSE 0.0 END AS z
  FROM hourly h JOIN per_user p USING (user_id)
)
SELECT user_id, hour, cnt, z, abs(z) >= 2.0 AS is_anomaly FROM z
"""

# Token-sequence packing: per-shard (16-bit md5 prefix mod 16)
# content-addressed stream order, cut every 128 tokens.
ORACLES["pack_token_sequences"] = f"""
WITH toks AS (
  SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
         ('0x' || substring(md5(t), 1, 8))::BIGINT % 32000 AS token_id
  FROM (SELECT doc_id,
               unnest(generate_series(1, len(tk))) AS i,
               unnest(tk) AS t
        FROM (SELECT doc_id, {_LTOKS} AS tk FROM documents))
),
keyed AS (
  SELECT doc_id, pos, token_id,
         md5(CAST(doc_id AS VARCHAR)) AS sort_key,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 16
           AS shard
  FROM toks
),
numbered AS (
  SELECT shard, doc_id, token_id,
         ROW_NUMBER() OVER (PARTITION BY shard
                            ORDER BY sort_key, doc_id, pos) - 1 AS rn
  FROM keyed
)
SELECT shard, CAST(rn // 128 AS BIGINT) AS seq_index,
       CAST(rn % 128 AS BIGINT) AS pos_in_seq, doc_id, token_id
FROM numbered
"""

# Language-id confusion matrix: the text_lang_id relation grouped.
ORACLES["lang_confusion"] = f"""
WITH toks AS (
  SELECT doc_id, lang AS lang_true,
         list_transform({_TOKENS}, x -> lower(x)) AS lt
  FROM documents
), hits AS (
  SELECT doc_id, lang_true,
         CAST(len(list_filter(lt, x -> x IN ('the','and','of','to','is','in','that','with'))) AS BIGINT) AS h_en,
         CAST(len(list_filter(lt, x -> x IN ('der','die','das','und','ist','nicht','ein','mit'))) AS BIGINT) AS h_de,
         CAST(len(list_filter(lt, x -> x IN ('le','la','les','et','est','une','que','dans'))) AS BIGINT) AS h_fr,
         CAST(len(list_filter(lt, x -> x IN ('el','la','los','es','una','que','por','con'))) AS BIGINT) AS h_es
  FROM toks
), pred AS (
  SELECT doc_id, lang_true,
         CASE WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
              WHEN h_de = greatest(h_en, h_de, h_fr, h_es) THEN 'de'
              WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
              WHEN h_es = greatest(h_en, h_de, h_fr, h_es) THEN 'es'
              ELSE 'fr' END AS lang_pred
  FROM hits
)
SELECT lang_true, lang_pred, COUNT(*) AS n_docs,
       lang_true = lang_pred AS is_correct
FROM pred GROUP BY 1, 2
"""

# Corpus-relative decile filter over the commonness score: threshold =
# smallest value whose cumulative count reaches ceil(n/10); kept =
# commonness > threshold. Integer target, exact double comparison.
ORACLES["quality_decile_filter"] = f"""
WITH occ AS (
  SELECT doc_id, unnest({_LTOKS}) AS token FROM documents
),
counts AS (SELECT token, COUNT(*) AS cnt FROM occ GROUP BY 1),
tot AS (SELECT COUNT(*) AS total FROM occ),
per_doc AS (
  SELECT o.doc_id, COUNT(*) AS n_tokens,
         CAST(SUM(c.cnt) AS BIGINT) AS sum_cnt
  FROM occ o JOIN counts c USING (token)
  GROUP BY o.doc_id
),
scored AS (
  SELECT d.doc_id,
         COALESCE(CAST(p.sum_cnt AS DOUBLE)
                  / CAST(p.n_tokens * tot.total AS DOUBLE), 0.0)
           AS commonness
  FROM documents d
  LEFT JOIN per_doc p ON d.doc_id = p.doc_id
  CROSS JOIN tot
),
n AS (SELECT COUNT(*) AS n FROM scored),
hist AS (SELECT commonness, COUNT(*) AS c FROM scored GROUP BY 1),
cum AS (
  SELECT commonness,
         SUM(c) OVER (ORDER BY commonness
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM hist
),
th AS (
  SELECT MIN(commonness) AS threshold
  FROM cum CROSS JOIN n
  WHERE cum >= (n.n * 1 + 9) // 10
)
SELECT s.doc_id, s.commonness, th.threshold,
       s.commonness > th.threshold AS kept
FROM scored s CROSS JOIN th
"""

# Cohort retention: distinct user-day activity, cohort = first day,
# counts per (cohort, offset). Dates rendered as strings for the gate.
ORACLES["events_cohort_retention"] = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
  FROM events
),
first AS (
  SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY 1
)
SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', f.cohort_day, d.day) AS INTEGER) AS day_offset,
       CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_users
FROM days d JOIN first f USING (user_id)
GROUP BY f.cohort_day, date_diff('day', f.cohort_day, d.day)
"""

# Packing-efficiency report: all integers until the single utilization
# division; n_packs = bigint ceil-division in BOTH engines
# ((total + 2047) // 2048 — exact past 2^53, where a double ceil drifts).
ORACLES["pack_efficiency"] = r"""
WITH per AS (
  SELECT doc_id % 16 AS shard,
         CAST(len(list_filter(string_split_regex(COALESCE(text, ''), '\s+'),
                              x -> x <> '')) AS BIGINT) AS n
  FROM documents
)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS total_tokens,
       CAST((SUM(n) + 2047) // 2048 AS BIGINT) AS n_packs,
       CAST(CAST((SUM(n) + 2047) // 2048 AS BIGINT) * 2048
            - SUM(n) AS BIGINT) AS waste_tokens,
       CASE WHEN SUM(n) = 0 THEN 1.0
            ELSE CAST(SUM(n) AS DOUBLE)
                 / CAST(CAST((SUM(n) + 2047) // 2048 AS BIGINT)
                        * 2048 AS DOUBLE)
       END AS utilization
FROM per GROUP BY shard
"""

# Corpus snapshot diff: the fixture's deterministic mutation restated
# (every 13th removed, every surviving 7th edited, every 11th re-added
# under a shifted id), then a content-hash full outer join.
ORACLES["corpus_diff"] = """
WITH old AS (
  SELECT doc_id, md5(COALESCE(text, '')) AS h FROM documents
),
mutated AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END AS text
  FROM documents WHERE doc_id % 13 <> 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text
  FROM documents WHERE doc_id % 11 = 0
),
new AS (SELECT doc_id, md5(COALESCE(text, '')) AS h FROM mutated)
SELECT doc_id,
       CASE WHEN o.h IS NULL THEN 'added'
            WHEN n.h IS NULL THEN 'removed'
            WHEN o.h = n.h THEN 'unchanged'
            ELSE 'changed' END AS status,
       COALESCE(o.h, '') AS old_h,
       COALESCE(n.h, '') AS new_h
FROM old o FULL OUTER JOIN new n USING (doc_id)
"""

# Sequential-min conversion funnel: each step's time is the earliest
# event of that type STRICTLY after the previous step's time; epoch
# micros with -1 sentinels (null-free gate), integer step count.
ORACLES["events_funnel"] = """
WITH ev AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
),
u AS (SELECT DISTINCT user_id FROM ev),
s1 AS (
  SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1
  FROM ev GROUP BY 1
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM ev e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND s1.t1 IS NOT NULL AND e.ts > s1.t1
  GROUP BY 1
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM ev e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY 1
)
SELECT u.user_id,
       COALESCE(epoch_us(s1.t1), -1) AS t_view_us,
       COALESCE(epoch_us(s2.t2), -1) AS t_click_us,
       COALESCE(epoch_us(s3.t3), -1) AS t_purchase_us,
       CAST(CASE WHEN s1.t1 IS NOT NULL THEN 1 ELSE 0 END
            + CASE WHEN s2.t2 IS NOT NULL THEN 1 ELSE 0 END
            + CASE WHEN s3.t3 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         AS steps_completed
FROM u
LEFT JOIN s1 USING (user_id)
LEFT JOIN s2 USING (user_id)
LEFT JOIN s3 USING (user_id)
"""

# Paragraph(block)-level dedup with rewrite: 20-token blocks, canonical
# owner = min doc_id keeps a repeated block, everyone else drops it and
# the doc is rebuilt from surviving blocks in order.
ORACLES["paragraph_dedup"] = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(COALESCE(text, ''), '\s+'), x -> x <> '') AS t
  FROM documents
),
nb AS (
  SELECT doc_id, t,
         CAST((len(t) + 19) // 20 AS BIGINT) AS n_blocks
  FROM toks
),
blocks AS (
  SELECT doc_id, CAST(b AS BIGINT) AS block_id,
         array_to_string(t[(CAST(b AS INTEGER) * 20 + 1)
                           :(CAST(b AS INTEGER) * 20 + 20)], ' ') AS s
  FROM (SELECT doc_id, t,
               unnest(generate_series(0, CAST(n_blocks AS INTEGER) - 1)) AS b
        FROM nb WHERE n_blocks > 0)
),
own AS (
  SELECT s, MIN(doc_id) AS owner, COUNT(DISTINCT doc_id) AS nd
  FROM blocks GROUP BY s
),
kept AS (
  SELECT b.doc_id, b.block_id, b.s
  FROM blocks b JOIN own o USING (s)
  WHERE o.nd < 2 OR o.owner = b.doc_id
),
reb AS (
  SELECT doc_id, string_agg(s, ' ' ORDER BY block_id) AS clean_text,
         CAST(COUNT(*) AS BIGINT) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT n.doc_id,
       COALESCE(r.clean_text, '') AS clean_text,
       n.n_blocks,
       n.n_blocks - COALESCE(r.n_kept, 0) AS n_dropped
FROM nb n LEFT JOIN reb r USING (doc_id)
"""

# Bloom-prefiltered decontamination: the sketch only prunes which docs
# get the exact recount — final verdicts are exact, so the oracle is the
# plain exact-overlap restatement at the fixture threshold (190).
ORACLES["bloom_decontaminate"] = """
WITH sh AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, GREATEST(LENGTH(text)-4, 1)),
                               i -> substr(text, CAST(i AS INTEGER), 5))) AS s
  FROM documents
),
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0),
train_sh AS (SELECT DISTINCT doc_id, s FROM sh WHERE doc_id % 50 <> 0),
hits AS (SELECT doc_id, COUNT(*) AS n_shared
         FROM train_sh JOIN bench USING (s) GROUP BY doc_id)
SELECT d.doc_id, COALESCE(h.n_shared, 0) >= 190 AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) d
LEFT JOIN hits h USING (doc_id)
"""

# Last-touch attribution: every purchase joined to the user's latest
# click at-or-before it (DuckDB native ASOF LEFT JOIN — ties included,
# matching asof_join_df's >= semantics); clicks canonicalized to one row
# per (user, ts) by max event_id; -1 sentinels keep the gate null-free.
ORACLES["events_attribution"] = """
WITH ev AS (
  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
  FROM events
),
p AS (
  SELECT event_id AS purchase_id, user_id, ts
  FROM ev WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, ts, MAX(event_id) AS click_id
  FROM ev WHERE event_type = 'click' GROUP BY 1, 2
)
SELECT p.purchase_id, p.user_id,
       epoch_us(p.ts) AS t_purchase_us,
       COALESCE(c.click_id, -1) AS click_id,
       COALESCE(epoch_us(p.ts) - epoch_us(c.ts), -1) AS gap_us
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
"""

# Vocabulary drift: exact integer token-count deltas between the
# documents table and the corpus_diff mutation; top movers by
# (|delta| DESC, token ASC) — fully deterministic.
ORACLES["vocab_drift"] = r"""
WITH mutated AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END AS text
  FROM documents WHERE doc_id % 13 <> 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text
  FROM documents WHERE doc_id % 11 = 0
),
co AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt_old
  FROM (SELECT unnest(list_filter(string_split_regex(lower(COALESCE(text, '')), '\s+'),
                                  x -> x <> '')) AS token FROM documents)
  GROUP BY 1
),
cn AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt_new
  FROM (SELECT unnest(list_filter(string_split_regex(lower(COALESCE(text, '')), '\s+'),
                                  x -> x <> '')) AS token FROM mutated)
  GROUP BY 1
)
SELECT COALESCE(co.token, cn.token) AS token,
       COALESCE(cnt_old, 0) AS cnt_old,
       COALESCE(cnt_new, 0) AS cnt_new,
       COALESCE(cnt_new, 0) - COALESCE(cnt_old, 0) AS delta
FROM co FULL OUTER JOIN cn ON co.token = cn.token
ORDER BY abs(COALESCE(cnt_new, 0) - COALESCE(cnt_old, 0)) DESC,
         COALESCE(co.token, cn.token) ASC
LIMIT 100
"""

# Verbatim-span decontamination: raw-substring restatement (the engine
# joins rolling-hash longs; grouping raw grams here doubles as the
# collision check, same discipline as repeated_spans).
ORACLES["decontaminate_spans"] = """
WITH tr AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0),
be AS (SELECT text FROM documents WHERE doc_id % 50 = 0),
bs AS (
  SELECT DISTINCT substring(text, CAST(g AS INTEGER), 30) AS s
  FROM (SELECT text, unnest(generate_series(1, length(text) - 29)) AS g
        FROM be WHERE length(text) >= 30)
),
tp AS (
  SELECT doc_id, substring(text, CAST(g AS INTEGER), 30) AS s
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, length(text) - 29)) AS g
        FROM tr WHERE length(text) >= 30)
),
hits AS (SELECT doc_id, COUNT(*) AS n FROM tp JOIN bs USING (s) GROUP BY 1)
SELECT t.doc_id,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_bench_spans,
       COALESCE(h.n, 0) >= 1 AS span_contaminated
FROM tr t LEFT JOIN hits h USING (doc_id)
"""

# Bloom-prefiltered verbatim-span decontamination: the row-level Bloom
# prefilter only prunes the exact join's probe side (no false
# negatives), so the output is identical to the unfiltered operator —
# same restatement, verbatim.
ORACLES["decontaminate_spans_bloom"] = ORACLES["decontaminate_spans"]

# Bigram corpus-familiarity LM score: integer bigram counts plus ONE
# IEEE division — the familiarity ratio is bit-identical across
# engines. Bigram construction restated with list indexing (DuckDB
# lists are 1-based, matching element_at).
ORACLES["ngram_lm_score"] = f"""
WITH tok AS (
  SELECT doc_id, {_TOKENS} AS ts FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(ts) - 1),
                               i -> ts[i] || ' ' || ts[i + 1])) AS bigram
  FROM tok WHERE len(ts) >= 2
),
docbg AS (
  SELECT doc_id, bigram, COUNT(*) AS occ FROM bg GROUP BY 1, 2
),
cnts AS (
  SELECT bigram, SUM(occ) AS cnt FROM docbg GROUP BY 1
),
agg AS (
  SELECT d.doc_id,
         SUM(occ) AS n_bigrams,
         SUM(CASE WHEN cnt >= 2 THEN occ ELSE 0 END) AS n_familiar
  FROM docbg d JOIN cnts USING (bigram) GROUP BY 1
)
SELECT doc_id,
       CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(n_familiar, 0) AS BIGINT) AS n_familiar,
       CASE WHEN COALESCE(n_bigrams, 0) = 0 THEN 0.0
            ELSE CAST(n_familiar AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
       END AS familiarity
FROM documents LEFT JOIN agg USING (doc_id)
"""

# Per-source mixture report over documents plus the every-20th-doc
# within-source replant; exact bigint counts, two exact divisions.
ORACLES["domain_mixture_report"] = f"""
WITH corpus AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 20000000, text, source FROM documents
  WHERE doc_id % 20 = 0
),
per_text AS (
  SELECT source, md5(COALESCE(text, '')) AS dig,
         COUNT(*) AS n_copies,
         SUM(len({_TOKENS})) AS tok
  FROM corpus GROUP BY 1, 2
),
per_src AS (
  SELECT source,
         CAST(SUM(n_copies) AS BIGINT) AS n_docs,
         CAST(SUM(tok) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_distinct_texts
  FROM per_text GROUP BY 1
)
SELECT source, n_docs, n_tokens, n_distinct_texts,
       CASE WHEN n_docs = 0 THEN 0.0
            ELSE CAST(n_docs - n_distinct_texts AS DOUBLE)
                 / CAST(n_docs AS DOUBLE) END AS dup_ratio,
       CASE WHEN SUM(n_tokens) OVER () = 0 THEN 0.0
            ELSE CAST(n_tokens AS DOUBLE)
                 / CAST(SUM(n_tokens) OVER () AS DOUBLE) END AS token_share
FROM per_src
"""

# Suffix/prefix continuation dedup over the planted two-page split:
# page A = first max(40, floor(len/2)) chars, page B = the tail
# starting 40 chars before A ends; pairs = exact 40-char
# suffix-of-A == prefix-of-B equi-join (any accidental cross-document
# boundary matches are computed identically on both sides).
ORACLES["dedup_suffix_prefix"] = """
WITH pages AS (
  SELECT doc_id AS page_id,
         substr(text, 1,
                GREATEST(40, CAST(FLOOR(length(text) / 2) AS INTEGER)))
           AS text
  FROM documents
  UNION ALL
  SELECT doc_id + 1000000,
         substr(text,
                GREATEST(40, CAST(FLOOR(length(text) / 2) AS INTEGER))
                  - 39,
                length(text))
  FROM documents
),
suff AS (
  SELECT page_id AS prev_id,
         substr(text, length(text) - 39, 40) AS boundary
  FROM pages WHERE length(text) >= 40
),
pref AS (
  SELECT page_id AS next_id, substr(text, 1, 40) AS boundary
  FROM pages WHERE length(text) >= 40
)
SELECT prev_id, next_id, boundary
FROM suff JOIN pref USING (boundary)
WHERE prev_id <> next_id
"""

# KStream-KStream windowed join (streaming/join.py): trips within
# +-365 days of their route's capacity update, both sides sliced to
# key % 20 = 0 before derivation. The stream's watermark exceeds the
# data's time span, so the streaming output equals this batch interval
# join exactly.
ORACLES["trips_route_update_stream_join"] = """
WITH u AS (
  SELECT 'Route_' || CAST(o_orderkey AS VARCHAR) AS route_id,
         CAST(((CAST(floor(o_totalprice) AS BIGINT) + 37) % 200) + 1
              AS INTEGER) AS capacity,
         o_orderdate + INTERVAL 1 DAY AS update_ts
  FROM orders WHERE o_orderkey % 20 = 0
),
t AS (
  SELECT 'Trip_' || CAST(l_orderkey AS VARCHAR) || '_'
           || CAST(l_linenumber AS VARCHAR) AS trip_id,
         'Route_' || CAST(l_orderkey AS VARCHAR) AS route_id,
         l_shipdate AS trip_ts
  FROM lineitem WHERE l_orderkey % 20 = 0
)
SELECT trip_id, t.route_id AS route_id, trip_ts, update_ts, capacity
FROM t JOIN u ON t.route_id = u.route_id
WHERE update_ts >= trip_ts - INTERVAL 365 DAY
  AND update_ts <= trip_ts + INTERVAL 365 DAY
"""

# KStream.leftJoin twin (streaming/join.py): updates sliced twice as
# hard (o_orderkey % 40), so half the trip routes have no update stream
# at all. Unmatched trips carry NULL-free sentinels (epoch / -1) in
# BOTH engines — the gate compare treats NaN != NaN; real null
# semantics are pinned in tests/test_streaming.py.
ORACLES["trips_route_update_stream_left_join"] = """
WITH u AS (
  SELECT 'Route_' || CAST(o_orderkey AS VARCHAR) AS route_id,
         CAST(((CAST(floor(o_totalprice) AS BIGINT) + 37) % 200) + 1
              AS INTEGER) AS capacity,
         o_orderdate + INTERVAL 1 DAY AS update_ts
  FROM orders WHERE o_orderkey % 40 = 0
),
t AS (
  SELECT 'Trip_' || CAST(l_orderkey AS VARCHAR) || '_'
           || CAST(l_linenumber AS VARCHAR) AS trip_id,
         'Route_' || CAST(l_orderkey AS VARCHAR) AS route_id,
         l_shipdate AS trip_ts
  FROM lineitem WHERE l_orderkey % 20 = 0
)
SELECT trip_id, t.route_id AS route_id, trip_ts,
       COALESCE(update_ts, TIMESTAMP '1970-01-01 00:00:00') AS update_ts,
       COALESCE(capacity, -1) AS capacity
FROM t LEFT JOIN u
  ON t.route_id = u.route_id
 AND update_ts >= trip_ts - INTERVAL 365 DAY
 AND update_ts <= trip_ts + INTERVAL 365 DAY
"""

# KStream.outerJoin twin: trips % 20 vs updates % 30 — overlap (% 60)
# matches, trips on 20/40 (mod 60) and updates on 30 (mod 60) are
# single-sided. Both sides' unmatched rows carry NULL-free sentinels
# ('NO_TRIP' / epoch / -1) in BOTH engines.
ORACLES["trips_route_update_stream_outer_join"] = """
WITH u AS (
  SELECT 'Route_' || CAST(o_orderkey AS VARCHAR) AS route_id,
         CAST(((CAST(floor(o_totalprice) AS BIGINT) + 37) % 200) + 1
              AS INTEGER) AS capacity,
         o_orderdate + INTERVAL 1 DAY AS update_ts
  FROM orders WHERE o_orderkey % 30 = 0
),
t AS (
  SELECT 'Trip_' || CAST(l_orderkey AS VARCHAR) || '_'
           || CAST(l_linenumber AS VARCHAR) AS trip_id,
         'Route_' || CAST(l_orderkey AS VARCHAR) AS route_id,
         l_shipdate AS trip_ts
  FROM lineitem WHERE l_orderkey % 20 = 0
)
SELECT COALESCE(trip_id, 'NO_TRIP') AS trip_id,
       COALESCE(t.route_id, u.route_id) AS route_id,
       COALESCE(trip_ts, TIMESTAMP '1970-01-01 00:00:00') AS trip_ts,
       COALESCE(update_ts, TIMESTAMP '1970-01-01 00:00:00') AS update_ts,
       COALESCE(capacity, -1) AS capacity
FROM t FULL JOIN u
  ON t.route_id = u.route_id
 AND update_ts >= trip_ts - INTERVAL 365 DAY
 AND update_ts <= trip_ts + INTERVAL 365 DAY
"""

# Hard-negative contrastive triplets: positive = exact rank-1 cosine
# neighbor, negatives = ranks 11..13 (just outside top-10); the cosine
# is the same sequential list_dot_product fold as the other exact
# embedding oracles, bit-identical to Spark's zip_with/aggregate.
ORACLES["contrastive_triplets"] = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings ORDER BY vec_id LIMIT 5
), c AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings
), ranked AS (
  SELECT query_id, neighbor_id,
         list_dot_product(qv, cv)
           / (sqrt(list_dot_product(qv, qv))
              * sqrt(list_dot_product(cv, cv))) AS cosine,
         ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY list_dot_product(qv, cv)
                      / (sqrt(list_dot_product(qv, qv))
                         * sqrt(list_dot_product(cv, cv))) DESC,
                    neighbor_id ASC) AS rnk
  FROM c, q WHERE neighbor_id <> query_id
), pos AS (
  SELECT query_id, neighbor_id AS pos_id, cosine AS pos_cosine
  FROM ranked WHERE rnk = 1
), neg AS (
  SELECT query_id, neighbor_id AS neg_id, cosine AS neg_cosine,
         CAST(rnk - 10 AS INTEGER) AS neg_rank
  FROM ranked WHERE rnk > 10 AND rnk <= 13
)
SELECT pos.query_id, pos_id, pos_cosine, neg_id, neg_cosine, neg_rank
FROM pos JOIN neg ON pos.query_id = neg.query_id
"""

# Budgeted quality-greedy selection: familiarity-bucketed two-pass
# greedy (see curation.select_token_budget_df). The lm CTEs restate
# ngram_lm_score's; bucket = floor(familiarity * 1000) is one float
# multiply of bit-identical doubles, so bucketing agrees across
# engines; all cumulative sums are over bigints.
ORACLES["select_token_budget"] = f"""
WITH tok0 AS (
  SELECT doc_id, {_TOKENS} AS ts FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(ts) - 1),
                               i -> ts[i] || ' ' || ts[i + 1])) AS bigram
  FROM tok0 WHERE len(ts) >= 2
),
docbg AS (
  SELECT doc_id, bigram, COUNT(*) AS occ FROM bg GROUP BY 1, 2
),
cnts AS (
  SELECT bigram, SUM(occ) AS cnt FROM docbg GROUP BY 1
),
lmagg AS (
  SELECT d.doc_id,
         SUM(occ) AS n_bigrams,
         SUM(CASE WHEN cnt >= 2 THEN occ ELSE 0 END) AS n_familiar
  FROM docbg d JOIN cnts USING (bigram) GROUP BY 1
),
lm AS (
  SELECT doc_id,
         CASE WHEN COALESCE(n_bigrams, 0) = 0 THEN 0.0
              ELSE CAST(n_familiar AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
         END AS familiarity
  FROM documents LEFT JOIN lmagg USING (doc_id)
),
s AS (
  SELECT t.doc_id,
         CAST(len(ts) AS BIGINT) AS n_tokens,
         familiarity,
         CAST(FLOOR(familiarity * 1000) AS INTEGER) AS bucket
  FROM tok0 t JOIN lm ON t.doc_id = lm.doc_id
),
bt AS (
  SELECT bucket, SUM(n_tokens) AS btok FROM s GROUP BY 1
),
bc AS (
  SELECT bucket,
         CAST(COALESCE(SUM(btok) OVER (
             ORDER BY bucket DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS cum_before,
         (COALESCE(SUM(btok) OVER (
             ORDER BY bucket DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          + btok <= 20000) AS full_in,
         (COALESCE(SUM(btok) OVER (
             ORDER BY bucket DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          < 20000) AS touches
  FROM bt
),
j AS (
  SELECT s.*, cum_before, full_in, touches FROM s JOIN bc USING (bucket)
)
SELECT doc_id, n_tokens, familiarity, full_in AS selected
FROM j WHERE full_in OR NOT touches
UNION ALL
SELECT doc_id, n_tokens, familiarity,
       (cum_before + cum <= 20000) AS selected
FROM (
  SELECT *, SUM(n_tokens) OVER (
      PARTITION BY bucket
      ORDER BY familiarity DESC, doc_id ASC
      ROWS UNBOUNDED PRECEDING) AS cum
  FROM j WHERE touches AND NOT full_in
)
"""

# Asymmetric containment pairs over the planted parent/excerpt corpus:
# all-pairs restatement (containment = |A∩B| / |B|, ordered pairs, one
# integer division) INTERSECTED with the df<=64 hot-shingle cap's
# tiebreak-free closed form (operators/dedup.py containment_pairs_df):
# cold (df<=cap) shingles sort strictly before hot ones in the engine's
# (df, hash) prefix order, so a true pair (A, B) survives the capped
# prefix join iff |cold_B| >= p_B = n_B - ceil(0.9*n_B) + 1 (the
# any-p-subset guarantee holds entirely within cold) or A shares a
# cold shingle of B — no xxhash64 tiebreak ever needed.
ORACLES["containment_pairs"] = f"""
WITH base AS (
  SELECT doc_id, COALESCE(text, '') AS text FROM documents
  UNION ALL
  SELECT doc_id + 2000000, substr(text, 11, 60)
  FROM documents WHERE doc_id % 25 = 0 AND length(text) >= 80
),
sh AS (
  SELECT DISTINCT doc_id, substring(text, CAST(g AS INTEGER), 9) AS s
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, greatest(length(text) - 8, 1))) AS g
        FROM base)
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
dfs AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY s),
cold AS (SELECT sh.doc_id, sh.s FROM sh JOIN dfs USING (s)
         WHERE df <= {_CONT_DF_CAP}),
ncold AS (SELECT doc_id, COUNT(*) AS nc FROM cold GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
),
coldshare AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM sh a JOIN cold b ON a.s = b.s AND a.doc_id <> b.doc_id
)
SELECT i.a_id, i.b_id,
       CAST(i.i AS DOUBLE) / CAST(sb.n AS DOUBLE) AS containment
FROM inter i
JOIN sizes sb ON sb.doc_id = i.b_id
LEFT JOIN ncold nb ON nb.doc_id = i.b_id
LEFT JOIN coldshare cs ON cs.a_id = i.a_id AND cs.b_id = i.b_id
WHERE CAST(i.i AS DOUBLE) / CAST(sb.n AS DOUBLE) >= 0.9
  AND (COALESCE(nb.nc, 0) >= sb.n - CEIL(0.9 * sb.n) + 1
       OR cs.a_id IS NOT NULL)
"""

# The cap's no-silent-drops audit twin: exact integer accounting of
# what the df<=64 cut removed from containment candidacy.
ORACLES["containment_hot_audit"] = f"""
WITH base AS (
  SELECT doc_id, COALESCE(text, '') AS text FROM documents
  UNION ALL
  SELECT doc_id + 2000000, substr(text, 11, 60)
  FROM documents WHERE doc_id % 25 = 0 AND length(text) >= 80
),
sh AS (
  SELECT DISTINCT doc_id, substring(text, CAST(g AS INTEGER), 9) AS s
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, greatest(length(text) - 8, 1))) AS g
        FROM base)
),
dfs AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY s),
hot AS (SELECT sh.doc_id, sh.s FROM sh JOIN dfs USING (s)
        WHERE df > {_CONT_DF_CAP}),
percold AS (
  SELECT sh.doc_id, COUNT(*) AS n,
         SUM(CASE WHEN dfs.df <= {_CONT_DF_CAP} THEN 1 ELSE 0 END) AS nc
  FROM sh JOIN dfs USING (s)
  GROUP BY 1
)
SELECT (SELECT CAST(COUNT(DISTINCT s) AS BIGINT) FROM hot)
         AS n_hot_shingles,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM hot) AS n_hot_rows,
       (SELECT CAST(COALESCE(SUM(CASE WHEN nc = 0 THEN 1 ELSE 0 END), 0)
                    AS BIGINT) FROM percold) AS n_unjoinable_docs,
       (SELECT CAST(COALESCE(SUM(CASE WHEN nc > 0
                                  AND nc < n - CEIL(0.9 * n) + 1
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
        FROM percold) AS n_unguaranteed_docs
"""

# One BPE merge round's pair counts: adjacent char 2-grams inside
# whitespace tokens, count desc / pair asc ranking (vocab_topk one
# level down).
ORACLES["bpe_merge_candidates"] = f"""
WITH tok AS (
  SELECT unnest({_TOKENS}) AS t FROM documents
),
p AS (
  SELECT unnest(list_transform(generate_series(1, length(t) - 1),
                               i -> substr(t, CAST(i AS INTEGER), 2)))
           AS pair
  FROM tok WHERE length(t) >= 2
),
counts AS (
  SELECT pair, COUNT(*) AS n_occurrences FROM p GROUP BY pair
)
SELECT pair, n_occurrences,
       CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, pair ASC)
            AS INTEGER) AS rank
FROM counts
ORDER BY n_occurrences DESC, pair ASC
LIMIT 50
"""

# Exact-integer sq8 Gram triangle: the quantization CTE is the shared
# sq8 rule (floor-half-up to |127| — identical text to the
# ann_cosine_topk_sq8 oracle), and every output column is an exact
# BIGINT (sums of |code|<=127 products never leave int64 range at any
# test SF), so the gate is a full hash. DuckDB SUM(BIGINT) returns
# HUGEINT -> cast back. i/j are 0-based INTEGERs to match the Spark
# kernel's int32 triangle indices.
ORACLES["embedding_gram_sq8"] = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), q8 AS (
  SELECT vec_id,
         list_transform(v, x -> CAST(floor(
             x * 127.0 / greatest(list_max(list_transform(v, y -> abs(y))),
                                  1e-30) + 0.5) AS BIGINT)) AS qv
  FROM e
), ix AS (
  SELECT vec_id, qv, unnest(range(1, len(qv) + 1)) AS i FROM q8
), vals AS (
  SELECT vec_id, CAST(i AS INTEGER) AS i, qv[CAST(i AS INTEGER)] AS x
  FROM ix
)
SELECT CAST(a.i - 1 AS INTEGER) AS i, CAST(b.i - 1 AS INTEGER) AS j,
       CAST(SUM(a.x * b.x) AS BIGINT) AS gram,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(a.x) AS BIGINT) AS sum_qi,
       CAST(SUM(b.x) AS BIGINT) AS sum_qj
FROM vals a JOIN vals b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY 1, 2
"""

# Content-keyed leakage-safe split: the key is md5(md5(COALESCE(text,
# ''))) so byte-identical documents co-assign; thresholds are plain hex
# string comparisons — all deterministic, full hash gate.
ORACLES["split_by_content"] = """
SELECT doc_id,
       SUBSTRING(md5(md5(COALESCE(text, ''))), 1, 2) AS split_key,
       CASE WHEN SUBSTRING(md5(md5(COALESCE(text, ''))), 1, 2) < 'e6'
              THEN 'train'
            WHEN SUBSTRING(md5(md5(COALESCE(text, ''))), 1, 2) < 'f3'
              THEN 'val'
            ELSE 'test' END AS split,
       lang, source
FROM documents
"""

# Recall@k of the sq8 ranking vs the exact ranking: both sides are the
# already-hash-verified ranking oracles verbatim (nested as CTE
# bodies), so the only new arithmetic is an exact intersection count
# and ONE division.
ORACLES["ann_recall_sq8"] = f"""
WITH ex AS ({ORACLES["ann_cosine_topk"]}),
ap AS (SELECT query_id, neighbor_id
       FROM ({ORACLES["ann_cosine_topk_sq8"]})),
hits AS (
  SELECT ex.query_id, COUNT(*) AS n_hits
  FROM ex JOIN ap USING (query_id, neighbor_id)
  GROUP BY ex.query_id
)
SELECT q.query_id,
       CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_hits,
       CAST(10 AS INTEGER) AS k,
       CAST(COALESCE(n_hits, 0) AS DOUBLE) / 10.0 AS recall
FROM (SELECT DISTINCT query_id FROM ex) q
LEFT JOIN hits USING (query_id)
"""

# Matryoshka truncation recall: per prefix width d, the exact ranking
# over list_slice(embedding, 1, d) intersected with the full-width
# ranking — every CTE is the hash-verified ann_cosine_topk shape with a
# sliced vector, counts exact, ONE division. Slicing commutes with the
# sequential dot-product fold, so floats stay bit-identical.
def _matryoshka_ranked(d: int) -> str:
    return f"""
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id ASC)
             AS rank
    FROM (
      SELECT query_id, neighbor_id,
             list_dot_product(qv, cv)
               / (sqrt(list_dot_product(qv, qv))
                  * sqrt(list_dot_product(cv, cv))) AS cosine
      FROM (SELECT vec_id AS neighbor_id,
                   list_slice(embedding::DOUBLE[], 1, {d}) AS cv
            FROM embeddings) c,
           (SELECT vec_id AS query_id,
                   list_slice(embedding::DOUBLE[], 1, {d}) AS qv
            FROM embeddings ORDER BY vec_id LIMIT 5) q
      WHERE neighbor_id <> query_id))
  WHERE rank <= 10
"""


ORACLES["embedding_matryoshka_recall"] = "\nUNION ALL\n".join(f"""
SELECT CAST({d} AS INTEGER) AS dim, q.query_id,
       CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_hits,
       CAST(10 AS INTEGER) AS k,
       CAST(COALESCE(n_hits, 0) AS DOUBLE) / 10.0 AS recall
FROM (SELECT vec_id AS query_id FROM embeddings
      ORDER BY vec_id LIMIT 5) q
LEFT JOIN (
  SELECT f.query_id, COUNT(*) AS n_hits
  FROM ({_matryoshka_ranked(64)}) f
  JOIN ({_matryoshka_ranked(d)}) t
    USING (query_id, neighbor_id)
  GROUP BY f.query_id
) hits USING (query_id)
""" for d in (16, 32, 64))

# Winnowing: shared w=4 window selection keeping the RIGHTMOST minimum
# (list_position over the reversed slice), parameterized on the gram
# hash — the md5-prefix bigint spelling for the oracle-baseline twins
# and the splitmix64-finalized polynomial for the fast numpy twins.
# Exact integers end to end in both spellings.
_WINNOW_WINDOW = """
  SELECT DISTINCT doc_id,
         CAST(i + 4 - list_position(
             list_reverse(list_slice(gr, CAST(i + 1 AS INTEGER),
                                     CAST(i + 4 AS INTEGER))),
             list_min(list_slice(gr, CAST(i + 1 AS INTEGER),
                                 CAST(i + 4 AS INTEGER)))) AS INTEGER)
           AS pos,
         list_min(list_slice(gr, CAST(i + 1 AS INTEGER),
                             CAST(i + 4 AS INTEGER))) AS fp
  FROM (
    SELECT doc_id, gr, unnest(range(0, len(gr) - 3)) AS i
    FROM (
__GRAMS__
    ) g
    WHERE len(gr) >= 4
  ) wins
"""

# '0x'||substring(md5(gram),1,15) == Spark conv(md5(...),16,10).
_MD5_GRAMS = """
      SELECT doc_id,
             CASE WHEN length(t) >= 8 THEN
               list_transform(range(1, length(t) - 6),
                 i -> ('0x' || substring(md5(substring(t,
                          CAST(i AS INTEGER), 8)), 1, 15))::BIGINT)
             ELSE []::BIGINT[] END AS gr
      FROM __SRC__
"""

# The numpy kernel's gram hash (dedup.winnow_fingerprints_fast_df),
# restated in wrapping-uint64 SQL: a degree-7 polynomial in
# B=1099511628211 over the UTF-32 codepoints (string_split('') +
# unicode == the kernel's utf-32-le buffer, astral chars included),
# then the splitmix64 finalizer, then the signed-bigint view the
# kernel's selection orders by. DuckDB BIGINT/UBIGINT arithmetic
# ERRORS on overflow, so every multiply widens to UHUGEINT and
# reduces % 2^64 ((2^64-1)^2 < 2^128 fits); xor/>> stay on UBIGINT
# (logical shift). Each finalizer step is its own list_transform
# pass so xor's twice-referenced operand is a lambda variable, not a
# duplicated polynomial subtree.
_M64 = "18446744073709551616::UHUGEINT"                 # 2^64
_B64 = "1099511628211::UHUGEINT"
_SM1 = "13787848793156543929::UHUGEINT"                 # 0xBF58476D1CE4E5B9
_SM2 = "10723151780598845931::UHUGEINT"                 # 0x94D049BB133111EB


def _fast_gram_poly(k: int = 8) -> str:
    e = "cp[p+1]::UHUGEINT"
    for j in range(2, k + 1):
        e = f"((({e}) * {_B64} + cp[p+{j}]::UHUGEINT) % {_M64})"
    return e


_FAST_GRAMS = f"""
      SELECT doc_id,
             list_transform(g4, u -> CASE
                 WHEN u >= 9223372036854775808::UBIGINT THEN
                   (u::HUGEINT - 18446744073709551616::HUGEINT)::BIGINT
                 ELSE u::BIGINT END) AS gr
      FROM (
       SELECT doc_id, list_transform(g3, u -> xor(u, u >> 31)) AS g4
       FROM (
        SELECT doc_id, list_transform(g2,
                 u -> ((u::UHUGEINT * {_SM2}) % {_M64})::UBIGINT) AS g3
        FROM (
         SELECT doc_id, list_transform(g1, u -> xor(u, u >> 27)) AS g2
         FROM (
          SELECT doc_id, list_transform(g0,
                   u -> ((u::UHUGEINT * {_SM1}) % {_M64})::UBIGINT) AS g1
          FROM (
           SELECT doc_id, list_transform(gp, u -> xor(u, u >> 30)) AS g0
           FROM (
            SELECT doc_id,
                   CASE WHEN len(cp) >= 8 THEN
                     list_transform(range(0, len(cp) - 7),
                       p -> ({_fast_gram_poly()})::UBIGINT)
                   ELSE []::UBIGINT[] END AS gp
            FROM (
             SELECT doc_id,
                    list_transform(string_split(t, ''),
                                   c -> unicode(c)) AS cp
             FROM __SRC__
            )
           )
          )
         )
        )
       )
      )
"""


def _winnow_fps_sql(src: str, grams: str) -> str:
    return _WINNOW_WINDOW.replace("__GRAMS__",
                                  grams.replace("__SRC__", src))


ORACLES["winnow_fingerprints"] = (
    "WITH d AS (SELECT doc_id, COALESCE(text, '') AS t FROM documents)\n"
    + _winnow_fps_sql("d", _MD5_GRAMS))

ORACLES["winnow_fingerprints_fast"] = (
    "WITH d AS (SELECT doc_id, COALESCE(text, '') AS t FROM documents)\n"
    + _winnow_fps_sql("d", _FAST_GRAMS))


# Candidate pairs over shared fingerprints with the df<=20 boilerplate
# cut and min_shared>=5, on documents plus the planted 14-char-shifted
# copies of every 25th doc.
def _winnow_pairs_sql(grams: str) -> str:
    return ("""
WITH d AS (
  SELECT doc_id, COALESCE(text, '') AS t FROM documents
  UNION ALL
  SELECT doc_id + 9000000000 AS doc_id,
         'shifted prefix' || COALESCE(text, '') AS t
  FROM documents WHERE doc_id % 25 = 0
), fps AS (
""" + _winnow_fps_sql("d", grams) + """
), slim AS (
  SELECT doc_id, fp FROM (SELECT DISTINCT doc_id, fp FROM fps)
  WHERE fp IN (SELECT fp FROM (SELECT DISTINCT doc_id, fp FROM fps)
               GROUP BY fp HAVING COUNT(*) <= 20)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM slim a JOIN slim b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= 5
""")


ORACLES["winnow_pairs"] = _winnow_pairs_sql(_MD5_GRAMS)
ORACLES["winnow_pairs_fast"] = _winnow_pairs_sql(_FAST_GRAMS)

# Per-dim embedding snapshot drift: both snapshots' diagonal
# accumulators (n, sum, sum-of-squares over sq8 codes — exact BIGINTs),
# then fixed-order float arithmetic (div, div, sub / div minus square)
# that is IEEE-identical across engines. Snapshot B drops every 10th
# vector, restating the fixture verbatim.
_DRIFT_DIAG = """
  SELECT i, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s,
         CAST(SUM(x * x) AS BIGINT) AS sq
  FROM (
    SELECT CAST(ix - 1 AS INTEGER) AS i, qv[CAST(ix AS INTEGER)] AS x
    FROM (
      SELECT qv, unnest(range(1, len(qv) + 1)) AS ix
      FROM (
        SELECT list_transform(embedding::DOUBLE[],
                 x -> CAST(floor(x * 127.0 /
                      greatest(list_max(list_transform(
                          embedding::DOUBLE[], y -> abs(y))), 1e-30)
                      + 0.5) AS BIGINT)) AS qv
        FROM embeddings {where}
      )
    )
  ) GROUP BY i
"""

ORACLES["embedding_snapshot_drift"] = f"""
WITH a AS ({_DRIFT_DIAG.format(where="")}),
b AS ({_DRIFT_DIAG.format(where="WHERE vec_id % 10 <> 0")})
SELECT a.i,
       a.n AS n_a, b.n AS n_b, a.s AS sum_a, b.s AS sum_b,
       a.sq AS sq_a, b.sq AS sq_b,
       (CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE))
         - (CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE)) AS mean_delta,
       (CAST(a.sq AS DOUBLE) / CAST(a.n AS DOUBLE))
         - (CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE))
           * (CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)) AS var_a,
       (CAST(b.sq AS DOUBLE) / CAST(b.n AS DOUBLE))
         - (CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE))
           * (CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE)) AS var_b
FROM a JOIN b ON a.i = b.i
"""


# --- recall reports for the LSH / IVF ANN variants -----------------------

def _recall_oracle(ap_sql: str) -> str:
    """Recall@10 report tail shared with ann_recall_sq8: intersection
    counts of an approximate (query_id, neighbor_id) set against the
    hash-verified exact ranking, plus ONE division."""
    return f"""
WITH ex AS ({ORACLES["ann_cosine_topk"]}),
ap AS ({ap_sql}),
hits AS (
  SELECT ex.query_id, COUNT(*) AS n_hits
  FROM ex JOIN ap USING (query_id, neighbor_id)
  GROUP BY ex.query_id
)
SELECT q.query_id,
       CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_hits,
       CAST(10 AS INTEGER) AS k,
       CAST(COALESCE(n_hits, 0) AS DOUBLE) / 10.0 AS recall
FROM (SELECT DISTINCT query_id FROM ex) q
LEFT JOIN hits USING (query_id)
"""


def _lsh_planes_values(dim: int = 64, n_planes: int = 64,
                       seed: int = 42) -> str:
    """The LSH hyperplanes as SQL literals. The planes are a pure
    function of (seed, dim): similarity.band_buckets regenerates them
    on every executor from np.random.default_rng(seed), so the oracle
    regenerates them HERE at import from the identical call and embeds
    them as shortest-round-trip double literals (repr round-trips
    exactly through DuckDB's correctly-rounded parse). dim=64 is the
    testdata embeddings schema, like the other dim-bound oracles."""
    import numpy as np

    planes = np.random.default_rng(seed).standard_normal((dim, n_planes))
    rows = ",\n".join(
        "({}, [{}]::DOUBLE[])".format(
            p, ", ".join(repr(float(x)) for x in planes[:, p]))
        for p in range(n_planes))
    return rows


# The REAL banded-LSH ranking restated: sign bit per (vector, plane)
# via the sequential list_dot_product (numpy's matmul sums in a
# different order, but a sign can only disagree when |projection| is
# inside the ~1e-13 reordering error — the gate fails loudly if so),
# 4-bit band keys as exact integer sums, candidates = share any band
# key, exact-cosine rank <= 10. Nested WITH so the plane literals and
# the bucket derivation appear ONCE.
_LSH_AP = f"""
  WITH bk AS (
    SELECT b.vec_id,
           (CAST(b.p // 4 AS BIGINT) << 48)
             + SUM(b.bit << (b.p % 4)) AS bucket
    FROM (
      SELECT cv.vec_id, pp.p,
             CASE WHEN list_dot_product(cv.v, pp.pl) >= 0
                  THEN 1::BIGINT ELSE 0::BIGINT END AS bit
      FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) cv,
           (VALUES
{_lsh_planes_values()}
           ) pp(p, pl)
    ) b GROUP BY b.vec_id, b.p // 4
  ),
  vv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
  cand AS (
    SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
    FROM (SELECT * FROM bk WHERE vec_id IN
            (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 5)) q
    JOIN bk c USING (bucket)
    WHERE c.vec_id <> q.vec_id
  )
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id ASC)
             AS rank
    FROM (
      SELECT cand.query_id, cand.neighbor_id,
             list_dot_product(qe.v, ce.v)
               / (sqrt(list_dot_product(qe.v, qe.v))
                  * sqrt(list_dot_product(ce.v, ce.v))) AS cosine
      FROM cand JOIN vv qe ON qe.vec_id = cand.query_id
                JOIN vv ce ON ce.vec_id = cand.neighbor_id))
  WHERE rank <= 10
"""

ORACLES["ann_recall_lsh"] = _recall_oracle(_LSH_AP)

# The banded-LSH top-k RANKING itself as a full-hash gate (r10 proved
# the technique on the recall report; the ranking is the same _LSH_AP
# derivation emitting rank) — flips ann_cosine_topk_lsh from rows-only
# to hash-gated: an actual ANN result list verified value-by-value.
ORACLES["ann_cosine_topk_lsh"] = f"""
WITH ap AS ({_LSH_AP.replace("SELECT query_id, neighbor_id FROM (",
                             "SELECT query_id, neighbor_id, rank FROM (", 1)})
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank FROM ap
"""

# The deterministic flat-centroid IVF probe restated: centroids = the
# first 32 corpus vectors (cell ids in vec_id order), assignment =
# top-m cells by (cosine desc, cell asc) with the sequential-fold
# cosine, m_assign=2 / nprobe=12, candidates joined on cell, exact
# rescoring, rank <= 10.
_IVF_FLAT_AP = """
  WITH vv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
  ct AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell,
                embedding::DOUBLE[] AS cent
         FROM (SELECT vec_id, embedding FROM embeddings
               ORDER BY vec_id LIMIT 32)),
  cellrank AS (
    SELECT co.vec_id, ct.cell,
           ROW_NUMBER() OVER (PARTITION BY co.vec_id ORDER BY
             list_dot_product(co.v, ct.cent)
               / (sqrt(list_dot_product(co.v, co.v))
                  * sqrt(list_dot_product(ct.cent, ct.cent)))
             DESC, ct.cell ASC) AS r
    FROM vv co, ct
  ),
  cand AS (
    SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
    FROM (SELECT vec_id, cell FROM cellrank WHERE r <= 2) c
    JOIN (SELECT vec_id, cell FROM cellrank
          WHERE r <= 12 AND vec_id IN
            (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 5)) q
      USING (cell)
    WHERE c.vec_id <> q.vec_id
  )
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id ASC)
             AS rank
    FROM (
      SELECT cand.query_id, cand.neighbor_id,
             list_dot_product(qe.v, ce.v)
               / (sqrt(list_dot_product(qe.v, qe.v))
                  * sqrt(list_dot_product(ce.v, ce.v))) AS cosine
      FROM cand JOIN vv qe ON qe.vec_id = cand.query_id
                JOIN vv ce ON ce.vec_id = cand.neighbor_id))
  WHERE rank <= 10
"""

ORACLES["ann_recall_ivf"] = _recall_oracle(_IVF_FLAT_AP)

# The flat-centroid IVF top-k RANKING itself as a full-hash gate (r13;
# same upgrade the LSH ranking got in r11): _IVF_FLAT_AP already derives
# the ranked list — emit the rank instead of projecting it away. Flips
# ann_cosine_topk_ivf from rows-only to a value-verified ANN result.
ORACLES["ann_cosine_topk_ivf"] = f"""
WITH ap AS ({_IVF_FLAT_AP.replace("SELECT query_id, neighbor_id FROM (",
                                  "SELECT query_id, neighbor_id, rank FROM (", 1)})
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank FROM ap
"""


# Native-streaming Q11/Q12 demos: prefix consistency means the final
# upserted state equals the batch answer, so the STREAM fixtures are
# gated against the SAME batch oracles.
ORACLES["q11_window_max_stream"] = (
    ORACLES["q11_transport_type_max_passengers_window"])
ORACLES["q12_window_min_stream"] = (
    ORACLES["q12_least_occupied_transport_type_window"])


# Edit-distance similarity join (PassJoin ICDE'12): identical even
# partition into d+1 segments (FLOOR arithmetic — DuckDB CAST(double
# AS INT) rounds where Spark truncates, so both engines floor on
# integer-exact doubles), the same (2d+1)(d+1)(2d+1) probe-substring
# enumeration, md5-prefix candidate keys, exact levenshtein verify.
# DuckDB's levenshtein is byte-based vs Spark's char-based — identical
# on the gate's all-ASCII corpora (charset pinned in
# tests/test_fuzzy.py). d=2, k=3, min_len=24, plus the planted typo
# twins (delete char 40, substitute char 80 -> '~') of every 25th
# long-enough doc.
_FUZZY_SEG_BASE = "CAST(FLOOR(src_n / 3.0) AS INT)"
_FUZZY_SEG_REM = "CAST(src_n % 3 AS INT)"
_FUZZY_SEG_START = (f"(j * {_FUZZY_SEG_BASE} + GREATEST(0, "
                    f"j - (3 - {_FUZZY_SEG_REM})) + 1)")
_FUZZY_SEG_LEN = (f"(CASE WHEN j >= 3 - {_FUZZY_SEG_REM} "
                  f"THEN {_FUZZY_SEG_BASE} + 1 ELSE {_FUZZY_SEG_BASE} END)")

# The planted long-typo corpus shared by fuzzy_edit_pairs and the
# full-corpus variant (which adds short-key plants).
_FUZZY_CORPUS_LONG = """
  SELECT doc_id, COALESCE(text, '') AS t FROM documents
  UNION ALL
  SELECT doc_id + 8000000000 AS doc_id,
         substring(COALESCE(text, ''), 1, 39)
           || substring(COALESCE(text, ''), 41, 39) || '~'
           || substring(COALESCE(text, ''), 81,
                        length(COALESCE(text, ''))) AS t
  FROM documents
  WHERE doc_id % 25 = 0 AND length(COALESCE(text, '')) >= 81
"""

ORACLES["fuzzy_edit_pairs"] = f"""
WITH d0 AS (
{_FUZZY_CORPUS_LONG}
), base AS (
  SELECT doc_id, t, length(t) AS n FROM d0 WHERE length(t) >= 24
), a_side AS (
  SELECT doc_id AS a_id, src_n, j,
         ('0x' || substring(md5(substring(t,
             CAST({_FUZZY_SEG_START} AS INT),
             CAST({_FUZZY_SEG_LEN} AS INT))), 1, 15))::BIGINT AS h
  FROM (SELECT doc_id, t, n AS src_n, sg.j
        FROM base, (SELECT unnest(range(0, 3)) AS j) sg)
), b_side AS (
  SELECT b_id, src_n, j,
         ('0x' || substring(md5(substring(t, pos, len)),
                            1, 15))::BIGINT AS h
  FROM (
    SELECT b_id, t, m, src_n, j,
           CAST({_FUZZY_SEG_START} + ds AS INT) AS pos,
           CAST({_FUZZY_SEG_LEN} AS INT) AS len
    FROM (
      SELECT doc_id AS b_id, t, n AS m, n + c.dn AS src_n,
             c.j AS j, c.ds AS ds
      FROM base,
           (SELECT dn.x AS dn, jj.x AS j, ds.x AS ds
            FROM (SELECT unnest(range(-2, 3)) AS x) dn,
                 (SELECT unnest(range(0, 3)) AS x) jj,
                 (SELECT unnest(range(-2, 3)) AS x) ds) c
    )
  )
  WHERE src_n >= 24 AND pos >= 1 AND pos + len - 1 <= m
), cand AS (
  SELECT DISTINCT LEAST(a_id, b_id) AS doc_a,
                  GREATEST(a_id, b_id) AS doc_b
  FROM a_side JOIN b_side USING (src_n, j, h)
  WHERE a_id <> b_id
)
SELECT doc_a, doc_b,
       CAST(levenshtein(ta.t, tb.t) AS INT) AS dist
FROM cand
JOIN base ta ON ta.doc_id = cand.doc_a
JOIN base tb ON tb.doc_id = cand.doc_b
WHERE levenshtein(ta.t, tb.t) <= 2
"""


# Full-corpus edit-distance join: the PassJoin path over an extended
# corpus (long typo twins + planted reference-scale short keys
# Route_<id>/Rout_<id> + exact short duplicates), UNION ALL the
# short-string companion — a length-banded brute force over DISTINCT
# strings whose shorter side is under min_len=24, restating
# fuzzy.edit_distance_pairs_short_df: candidates where the length gap
# is <= d and the shorter side is < 24 chars, exact levenshtein verify,
# doc-level expansion by text equality, plus identical-text pairs at
# distance 0. The two partitions of the pair space are disjoint
# (min side < 24 vs both >= 24), so UNION ALL is exact.
_FUZZY_CORPUS_ALL = _FUZZY_CORPUS_LONG + """
  UNION ALL
  SELECT doc_id + 9000000000 AS doc_id,
         'Route_' || CAST(doc_id AS VARCHAR) AS t
  FROM documents WHERE doc_id % 50 = 0
  UNION ALL
  SELECT doc_id + 9500000000 AS doc_id,
         'Rout_' || CAST(doc_id AS VARCHAR) AS t
  FROM documents WHERE doc_id % 50 = 0
  UNION ALL
  SELECT doc_id + 9750000000 AS doc_id,
         'Route_' || CAST(doc_id AS VARCHAR) AS t
  FROM documents WHERE doc_id % 100 = 0
"""

ORACLES["fuzzy_edit_pairs_all"] = f"""
WITH lng AS (
{ORACLES["fuzzy_edit_pairs"].replace(_FUZZY_CORPUS_LONG,
                                     _FUZZY_CORPUS_ALL, 1)}
), s0 AS (
{_FUZZY_CORPUS_ALL}
), sbase AS (
  SELECT doc_id, t, length(t) AS n FROM s0 WHERE length(t) < 26
), uqn AS (
  SELECT t, length(t) AS n FROM (SELECT DISTINCT t FROM sbase)
), upairs AS (
  SELECT a.t AS ta, b.t AS tb,
         CAST(levenshtein(a.t, b.t) AS INT) AS dist
  FROM uqn a JOIN uqn b ON b.n >= a.n AND b.n <= a.n + 2
  WHERE (a.n < b.n OR (a.n = b.n AND a.t < b.t))
    AND a.n < 24
    AND levenshtein(a.t, b.t) <= 2
), short_cross AS (
  SELECT LEAST(da.doc_id, db.doc_id) AS doc_a,
         GREATEST(da.doc_id, db.doc_id) AS doc_b, up.dist
  FROM upairs up
  JOIN sbase da ON da.t = up.ta
  JOIN sbase db ON db.t = up.tb
), short_same AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(0 AS INT) AS dist
  FROM sbase a JOIN sbase b ON a.t = b.t AND a.doc_id < b.doc_id
  WHERE length(a.t) < 24
)
SELECT doc_a, doc_b, dist FROM lng
UNION ALL SELECT doc_a, doc_b, dist FROM short_cross
UNION ALL SELECT doc_a, doc_b, dist FROM short_same
"""


# Cross-corpus fuzzy decontamination: the documents corpus (plus planted
# short typo keys Rout_<id>) probed against a synthetic reference — every
# 40th doc with one substituted char at position 50, plus clean
# Route_<id> keys. Long pairs: the directional PassJoin (segments from
# the corpus side, probe substrings from the reference side — Lemma 1 of
# ICDE'12 needs only one direction); short pairs: the length-banded
# distinct-string join with the min-side < 24 rule. Same FLOOR seg
# arithmetic macros as the self-join oracle.
ORACLES["fuzzy_dedup_against"] = f"""
WITH corpus AS (
  SELECT doc_id, COALESCE(text, '') AS t FROM documents
  UNION ALL
  SELECT doc_id + 9500000000 AS doc_id,
         'Rout_' || CAST(doc_id AS VARCHAR) AS t
  FROM documents WHERE doc_id % 50 = 0
), ref AS (
  SELECT doc_id + 7000000000 AS doc_id,
         substring(COALESCE(text, ''), 1, 49) || '~'
           || substring(COALESCE(text, ''), 51,
                        length(COALESCE(text, ''))) AS t
  FROM documents
  WHERE doc_id % 40 = 0 AND length(COALESCE(text, '')) >= 51
  UNION ALL
  SELECT doc_id + 7500000000 AS doc_id,
         'Route_' || CAST(doc_id AS VARCHAR) AS t
  FROM documents WHERE doc_id % 50 = 0
), lbase AS (
  SELECT doc_id, t, length(t) AS n FROM corpus
), rbase AS (
  SELECT doc_id, t, length(t) AS n FROM ref
), l_side AS (
  SELECT l_id, src_n, j,
         ('0x' || substring(md5(substring(t,
             CAST({_FUZZY_SEG_START} AS INT),
             CAST({_FUZZY_SEG_LEN} AS INT))), 1, 15))::BIGINT AS h
  FROM (SELECT doc_id AS l_id, t, n AS src_n, sg.j
        FROM lbase, (SELECT unnest(range(0, 3)) AS j) sg
        WHERE n >= 24)
), r_side AS (
  SELECT r_id, src_n, j,
         ('0x' || substring(md5(substring(t, pos, len)),
                            1, 15))::BIGINT AS h
  FROM (
    SELECT r_id, t, m, src_n, j,
           CAST({_FUZZY_SEG_START} + ds AS INT) AS pos,
           CAST({_FUZZY_SEG_LEN} AS INT) AS len
    FROM (
      SELECT doc_id AS r_id, t, n AS m, n + c.dn AS src_n,
             c.j AS j, c.ds AS ds
      FROM rbase,
           (SELECT dn.x AS dn, jj.x AS j, ds.x AS ds
            FROM (SELECT unnest(range(-2, 3)) AS x) dn,
                 (SELECT unnest(range(0, 3)) AS x) jj,
                 (SELECT unnest(range(-2, 3)) AS x) ds) c
      WHERE n >= 24
    )
  )
  WHERE src_n >= 24 AND pos >= 1 AND pos + len - 1 <= m
), long_cands AS (
  SELECT DISTINCT l_id, r_id FROM l_side JOIN r_side USING (src_n, j, h)
), long_pairs AS (
  SELECT l_id, r_id
  FROM long_cands
  JOIN lbase tl ON tl.doc_id = long_cands.l_id
  JOIN rbase tr ON tr.doc_id = long_cands.r_id
  WHERE levenshtein(tl.t, tr.t) <= 2
), su AS (
  SELECT a.t AS tl, b.t AS tr
  FROM (SELECT DISTINCT t, n FROM lbase WHERE n < 26) a
  JOIN (SELECT DISTINCT t, n FROM rbase WHERE n < 26) b
    ON b.n BETWEEN a.n - 2 AND a.n + 2
  WHERE LEAST(a.n, b.n) < 24 AND levenshtein(a.t, b.t) <= 2
), short_pairs AS (
  SELECT pl.doc_id AS l_id, pr.doc_id AS r_id
  FROM su
  JOIN (SELECT doc_id, t FROM lbase WHERE n < 26) pl ON pl.t = su.tl
  JOIN (SELECT doc_id, t FROM rbase WHERE n < 26) pr ON pr.t = su.tr
), hits AS (
  SELECT l_id, COUNT(*) AS nh
  FROM (SELECT l_id, r_id FROM long_pairs
        UNION ALL SELECT l_id, r_id FROM short_pairs)
  GROUP BY l_id
)
SELECT c.doc_id,
       CAST(COALESCE(hits.nh, 0) AS BIGINT) AS n_fuzzy_matches,
       COALESCE(hits.nh, 0) > 0 AS dropped
FROM corpus c LEFT JOIN hits ON hits.l_id = c.doc_id
"""


# Full-corpus typo-duplicate clusters: the fuzzy_edit_pairs_all pair
# set (verbatim nested) chained by the recursive transitive closure.
ORACLES["fuzzy_dup_clusters_all"] = f"""
WITH RECURSIVE pairs AS (
  SELECT * FROM (
{ORACLES["fuzzy_edit_pairs_all"]}
  ) all_pairs_q
),
sym AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
reach (u, v) AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u WHERE s.v <> r.u
)
SELECT u AS doc_id,
       least(u, MIN(v)) AS cluster_id,
       least(u, MIN(v)) = u AS is_canonical
FROM reach GROUP BY u
"""

# Typo-duplicate clusters: the fuzzy pair set (verbatim nested) chained
# by the same recursive transitive closure as the other cluster oracles.
ORACLES["fuzzy_dup_clusters"] = f"""
WITH RECURSIVE pairs AS (
{ORACLES["fuzzy_edit_pairs"]}
),
sym AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
reach (u, v) AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u WHERE s.v <> r.u
)
SELECT u AS doc_id,
       least(u, MIN(v)) AS cluster_id,
       least(u, MIN(v)) = u AS is_canonical
FROM reach GROUP BY u
"""


# ---------------------------------------------------------------------------
# DSIR importance resampling (operators/dsir.py; Xie et al., NeurIPS 2023).
# Bucket ids are md5-derived so both engines agree bit-for-bit; the smoothed
# ratio is ONE division of exact integer counts. No gated column carries a
# log — Spark ln and DuckDB ln differ in the last ulp on ~7% of inputs
# (dsir.py module docstring), so weights are ranking-internal only.
_DSIR_TOKS = ("list_filter(string_split_regex(COALESCE(text, ''), '\\s+'), "
              "x -> x <> '')")
_DSIR_GRAMS = f"""
  SELECT doc_id, lang,
         ('0x' || substring(md5(
             lt[CAST(i AS INTEGER)] || ' ' || lt[CAST(i + 1 AS INTEGER)]
           ), 1, 8))::BIGINT % 256 AS bucket
  FROM (SELECT doc_id, lang, lt, unnest(generate_series(1, n - 1)) AS i
        FROM (SELECT doc_id, lang, {_DSIR_TOKS} AS lt,
                     len({_DSIR_TOKS}) AS n
              FROM documents)
        WHERE n >= 2)
"""
_DSIR_STATS = f"""
grams AS ({_DSIR_GRAMS}),
ct AS (SELECT bucket, COUNT(*) AS target_count FROM grams
       WHERE lang = 'en' GROUP BY bucket),
cr AS (SELECT bucket, COUNT(*) AS raw_count FROM grams
       WHERE lang <> 'en' GROUP BY bucket),
stats AS (
  SELECT COALESCE(ct.bucket, cr.bucket) AS bucket,
         CAST(COALESCE(target_count, 0) AS BIGINT) AS target_count,
         CAST(COALESCE(raw_count, 0) AS BIGINT) AS raw_count
  FROM ct FULL OUTER JOIN cr ON ct.bucket = cr.bucket
),
tot AS (SELECT CAST(SUM(target_count) AS BIGINT) AS nt,
               CAST(SUM(raw_count) AS BIGINT) AS nr FROM stats)
"""
ORACLES["dsir_bucket_stats"] = f"""
WITH {_DSIR_STATS}
SELECT bucket, target_count, raw_count,
       CAST(target_count + 1 AS DOUBLE) / CAST(raw_count + 1 AS DOUBLE)
         AS ratio
FROM stats
"""

# Per-candidate-doc DSIR aggregates: every gram LEFT-joins the bucket
# stats (missing buckets smooth to 0 counts), integer sums are exact,
# and the log-weight orders the top-k only (never emitted). logw is
# folded over the doc's (bucket, count) groups in BUCKET ORDER via
# list_aggregate — a deterministic pure function of the doc's bucket
# multiset, so two docs with identical text get IDENTICAL logw here
# (as they do bit-for-bit under Spark's sequential fold) and fall
# through to the doc_id tiebreak in both engines. A bare SUM() would
# add in arbitrary order and could split such a tie by one ulp
# (ADVICE r12, dsir.py:200).
_DSIR_SCORED = f"""
perb AS (
  SELECT g.doc_id, g.lang, g.bucket,
         CAST(COUNT(*) AS BIGINT) AS c,
         CAST(COALESCE(s.target_count, 0) AS BIGINT) AS tc,
         CAST(COALESCE(s.raw_count, 0) AS BIGINT) AS rc,
         ln(CAST(COALESCE(s.target_count, 0) + 1 AS DOUBLE)
            / CAST(COALESCE(s.raw_count, 0) + 1 AS DOUBLE))
           + ln(CAST(nr + 256 AS DOUBLE))
           - ln(CAST(nt + 256 AS DOUBLE)) AS lr
  FROM grams g LEFT JOIN stats s ON g.bucket = s.bucket, tot
  WHERE g.lang <> 'en'
  GROUP BY g.doc_id, g.lang, g.bucket, s.target_count, s.raw_count,
           nt, nr
),
scored AS (
  SELECT doc_id, lang,
         CAST(SUM(c) AS BIGINT) AS n_grams,
         CAST(SUM(c * tc) AS BIGINT) AS sum_target_count,
         CAST(SUM(c * rc) AS BIGINT) AS sum_raw_count,
         list_aggregate(list(CAST(c AS DOUBLE) * lr ORDER BY bucket),
                        'sum') AS logw
  FROM perb
  GROUP BY doc_id, lang
),
zero AS (
  SELECT doc_id, lang,
         CAST(0 AS BIGINT) AS n_grams,
         CAST(0 AS BIGINT) AS sum_target_count,
         CAST(0 AS BIGINT) AS sum_raw_count,
         0.0 AS logw
  FROM documents
  WHERE lang <> 'en'
    AND len({_DSIR_TOKS}) < 2
),
cand AS (SELECT * FROM scored UNION ALL SELECT * FROM zero)
"""
ORACLES["dsir_select"] = f"""
WITH {_DSIR_STATS},
{_DSIR_SCORED}
SELECT doc_id, lang, rank, n_grams, sum_target_count, sum_raw_count
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY logw DESC, doc_id) AS rank
      FROM cand)
WHERE rank <= 100
"""

# Gumbel-top-k resampling: the noise is a pure function of (doc_id, seed)
# via the same md5-derived uniform both engines compute identically.
ORACLES["dsir_resample_gumbel"] = f"""
WITH {_DSIR_STATS},
{_DSIR_SCORED}
SELECT doc_id, lang, rank, n_grams, sum_target_count, sum_raw_count
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY gkey DESC, doc_id) AS rank
  FROM (
    SELECT *,
           logw - ln(-ln(
             (('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '#42'),
                        1, 6))::BIGINT + 0.5) / 16777216.0)) AS gkey
    FROM cand)
)
WHERE rank <= 100
"""


# Native-streaming demo twins (streaming/runner.py): final update-mode
# state must equal the batch answer, so they gate against the SAME
# oracle text as their batch queries — the q11/q12 stream-demo pattern.
ORACLES["q5_stream_passengers_per_route"] = ORACLES["q5_passengers_per_route"]
ORACLES["q7_stream_total_capacity"] = ORACLES["q7_total_capacity_available"]


# ---------------------------------------------------------------------------
# bpe_train (text.py bpe_train_df): the 8-round iterated argmax IS
# SQL-expressible after all, because n_merges is a pinned constant — each
# round is one chained CTE trio (pair counts -> LIMIT-1 argmax with the
# (n DESC, a, b) tie-break -> merge application). The greedy left-to-right
# merge fold is restated as a string replace over a WRAPPED symbol
# encoding: 'abc' -> '|a||b||c|', merge (a,b) = replace('|a||b|','|ab|').
# Each symbol carries its OWN delimiters, so consecutive merges stay
# independent ('|a||b||a||b|' -> '|ab||ab|') and overlapping runs resolve
# left-to-right exactly like the JVM fold ('|a||a||a|' -> '|aa||a|').
# Symbols never contain '|' (whitespace tokenization of the testdata
# corpus). A vanished-pair round leaves b{k} empty, which empties w{k}
# and every later round — the oracle then emits fewer rows, matching the
# trainer's break. This upgrades the entry from rows-only to full hash.
def _bpe_chain_parts(n_merges: int, where: str = "") -> list:
    """The shared train-chain CTEs: w0 (wrapped word table, training
    filter length>=2), then per round k the pair counts p{k}, the
    argmax b{k}, and the merged table w{k}. ``where`` filters the
    TRAINING corpus (e.g. 'WHERE doc_id % 2 = 0' for the incremental
    gate's base half)."""
    parts = [f"""w0 AS (
  SELECT regexp_replace(tok, '(.)', '|\\1|', 'g') AS w, cnt FROM (
    SELECT tok, COUNT(*) AS cnt
    FROM (SELECT unnest({_TOKENS}) AS tok FROM documents {where})
    WHERE length(tok) >= 2 GROUP BY tok)
)"""]
    for k in range(1, n_merges + 1):
        parts.append(f"""p{k} AS (
  SELECT s[CAST(i AS INTEGER)] AS a, s[CAST(i + 1 AS INTEGER)] AS b,
         SUM(cnt) AS n
  FROM (SELECT s, cnt, unnest(generate_series(1, len(s) - 1)) AS i
        FROM (SELECT list_filter(string_split(w, '|'), x -> x <> '') AS s,
                     cnt FROM w{k - 1})
        WHERE len(s) >= 2)
  GROUP BY a, b
),
b{k} AS (SELECT a, b, n FROM p{k} ORDER BY n DESC, a ASC, b ASC LIMIT 1),
w{k} AS (
  SELECT replace(w, '|' || a || '||' || b || '|',
                 '|' || a || b || '|') AS w, cnt
  FROM w{k - 1}, b{k}
)""")
        # w{n_merges} is never read by the trainer; the encoder reuses it
    return parts


def _bpe_train_oracle(n_merges: int = 8) -> str:
    parts = _bpe_chain_parts(n_merges)
    rounds = "\nUNION ALL\n".join(
        f"""SELECT {k} AS round, a AS "left", b AS "right",
       a || b AS merged, CAST(n AS BIGINT) AS n_occurrences FROM b{k}"""
        for k in range(1, n_merges + 1))
    return "WITH " + ",\n".join(parts) + "\n" + rounds


ORACLES["bpe_train"] = _bpe_train_oracle(8)


# bpe_encode_vocab (text.py bpe_encode_vocab_df): replay the learned
# merges over the UNFILTERED word table (single-char tokens encode as
# themselves) and aggregate the post-merge symbol vocabulary. LEFT JOIN
# ON TRUE + COALESCE makes a vanished merge round the identity — the
# trainer's break means that round's replace just never runs.
def _bpe_encode_oracle(n_merges: int = 8) -> str:
    parts = _bpe_chain_parts(n_merges)
    parts.append(f"""enc0 AS (
  SELECT regexp_replace(tok, '(.)', '|\\1|', 'g') AS w, cnt FROM (
    SELECT tok, COUNT(*) AS cnt
    FROM (SELECT unnest({_TOKENS}) AS tok FROM documents)
    GROUP BY tok)
)""")
    for k in range(1, n_merges + 1):
        parts.append(f"""enc{k} AS (
  SELECT COALESCE(replace(e.w, '|' || b.a || '||' || b.b || '|',
                          '|' || b.a || b.b || '|'), e.w) AS w, e.cnt
  FROM enc{k - 1} e LEFT JOIN b{k} b ON TRUE
)""")
    return ("WITH " + ",\n".join(parts) + f"""
SELECT sym AS symbol, CAST(SUM(cnt) AS BIGINT) AS n_occurrences
FROM (SELECT unnest(list_filter(string_split(w, '|'), x -> x <> '')) AS sym,
             cnt
      FROM enc{n_merges})
GROUP BY sym""")


ORACLES["bpe_encode_vocab"] = _bpe_encode_oracle(8)


# bpe_encode_docs (text.py bpe_encode_docs_df): replay the merges over
# each DISTINCT token (the dictionary-encode the Spark side performs via
# its trained word table), re-derive the lexicographic symbol-id table,
# then lay the per-token symbol runs out per document ordered by (token
# position, symbol position). Shared with the pack_bpe_sequences oracle.
def _bpe_encode_docs_parts(n_merges: int = 8) -> list:
    parts = _bpe_chain_parts(n_merges)
    parts.append(f"""encw0 AS (
  SELECT tok, regexp_replace(tok, '(.)', '|\\1|', 'g') AS w
  FROM (SELECT DISTINCT tok
        FROM (SELECT unnest({_TOKENS}) AS tok FROM documents))
)""")
    for k in range(1, n_merges + 1):
        parts.append(f"""encw{k} AS (
  SELECT e.tok,
         COALESCE(replace(e.w, '|' || b.a || '||' || b.b || '|',
                          '|' || b.a || b.b || '|'), e.w) AS w
  FROM encw{k - 1} e LEFT JOIN b{k} b ON TRUE
)""")
    parts.append(f"""encsyms AS (
  SELECT tok, list_filter(string_split(w, '|'), x -> x <> '') AS s
  FROM encw{n_merges}
),
ids AS (
  SELECT symbol,
         CAST(ROW_NUMBER() OVER (ORDER BY symbol) - 1 AS BIGINT)
           AS token_id
  FROM (SELECT DISTINCT unnest(s) AS symbol FROM encsyms)
),
dt AS (
  SELECT doc_id, CAST(i - 1 AS INTEGER) AS tpos, t AS tok
  FROM (SELECT doc_id,
               unnest(generate_series(1, len(tk))) AS i,
               unnest(tk) AS t
        FROM (SELECT doc_id, {_TOKENS} AS tk FROM documents))
),
ds AS (
  SELECT doc_id, tpos, CAST(j - 1 AS INTEGER) AS spos, sy AS symbol
  FROM (SELECT d.doc_id, d.tpos,
               unnest(generate_series(1, len(e.s))) AS j,
               unnest(e.s) AS sy
        FROM dt d JOIN encsyms e ON d.tok = e.tok)
),
posed AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY tpos, spos) - 1 AS INTEGER)
           AS pos,
         symbol
  FROM ds
)""")
    return parts


ORACLES["bpe_encode_docs"] = (
    "WITH " + ",\n".join(_bpe_encode_docs_parts(8)) + """
SELECT p.doc_id, p.pos, p.symbol, i.token_id
FROM posed p JOIN ids i ON p.symbol = i.symbol
""")


# bpe_encode_increment (text.py): train on the even-doc_id half, derive
# the stored tokenizer's vocab ids from the base corpus, then encode the
# odd half as the arriving increment — stored merges replayed over the
# INCREMENT's distinct tokens, stored ids LEFT-joined, OOV symbols -> -1
# (the UNK sentinel).
def _bpe_encode_increment_oracle(n_merges: int = 8) -> str:
    parts = _bpe_chain_parts(n_merges, "WHERE doc_id % 2 = 0")
    parts.append(f"""encb0 AS (
  SELECT tok, regexp_replace(tok, '(.)', '|\\1|', 'g') AS w
  FROM (SELECT DISTINCT tok
        FROM (SELECT unnest({_TOKENS}) AS tok FROM documents
              WHERE doc_id % 2 = 0))
)""")
    for k in range(1, n_merges + 1):
        parts.append(f"""encb{k} AS (
  SELECT e.tok,
         COALESCE(replace(e.w, '|' || b.a || '||' || b.b || '|',
                          '|' || b.a || b.b || '|'), e.w) AS w
  FROM encb{k - 1} e LEFT JOIN b{k} b ON TRUE
)""")
    parts.append(f"""ids AS (
  SELECT symbol,
         CAST(ROW_NUMBER() OVER (ORDER BY symbol) - 1 AS BIGINT)
           AS token_id
  FROM (SELECT DISTINCT unnest(
            list_filter(string_split(w, '|'), x -> x <> '')) AS symbol
        FROM encb{n_merges})
),
enci0 AS (
  SELECT tok, regexp_replace(tok, '(.)', '|\\1|', 'g') AS w
  FROM (SELECT DISTINCT tok
        FROM (SELECT unnest({_TOKENS}) AS tok FROM documents
              WHERE doc_id % 2 = 1))
)""")
    for k in range(1, n_merges + 1):
        parts.append(f"""enci{k} AS (
  SELECT e.tok,
         COALESCE(replace(e.w, '|' || b.a || '||' || b.b || '|',
                          '|' || b.a || b.b || '|'), e.w) AS w
  FROM enci{k - 1} e LEFT JOIN b{k} b ON TRUE
)""")
    parts.append(f"""incsyms AS (
  SELECT tok, list_filter(string_split(w, '|'), x -> x <> '') AS s
  FROM enci{n_merges}
),
dt AS (
  SELECT doc_id, CAST(i - 1 AS INTEGER) AS tpos, t AS tok
  FROM (SELECT doc_id,
               unnest(generate_series(1, len(tk))) AS i,
               unnest(tk) AS t
        FROM (SELECT doc_id, {_TOKENS} AS tk FROM documents
              WHERE doc_id % 2 = 1))
),
ds AS (
  SELECT doc_id, tpos, CAST(j - 1 AS INTEGER) AS spos, sy AS symbol
  FROM (SELECT d.doc_id, d.tpos,
               unnest(generate_series(1, len(e.s))) AS j,
               unnest(e.s) AS sy
        FROM dt d JOIN incsyms e ON d.tok = e.tok)
),
posed AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY tpos, spos) - 1 AS INTEGER)
           AS pos,
         symbol
  FROM ds
)""")
    return ("WITH " + ",\n".join(parts) + """
SELECT p.doc_id, p.pos, p.symbol,
       CAST(COALESCE(i.token_id, -1) AS BIGINT) AS token_id
FROM posed p LEFT JOIN ids i ON p.symbol = i.symbol
""")


ORACLES["bpe_encode_increment"] = _bpe_encode_increment_oracle(8)

# bpe_oov_rate: per-source OOV fraction of the increment encode — exact
# integer counts over the SAME stored-tokenizer layout, one guarded
# division. The full increment statement nests as a subquery (DuckDB
# mis-scopes a doubly-nested WITH used directly as a CTE body).
ORACLES["bpe_oov_rate"] = f"""
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN q.token_id = -1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       CAST(SUM(CASE WHEN q.token_id = -1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS oov_rate
FROM ( {_bpe_encode_increment_oracle(8)} ) q
JOIN documents d USING (doc_id)
GROUP BY d.source
"""

# The streaming twin encodes the same odd-half increment against the
# same stored even-half tokenizer, one micro-batch at a time; documents
# are encoded independently, so the token store must equal the one-shot
# batch encode — the SAME oracle gates both.
ORACLES["bpe_encode_increment_stream"] = _bpe_encode_increment_oracle(8)



# bpe_compression_stats (text.py): per-source chars-per-token under the
# learned vocabulary — exact integer sums off the encode-docs layout,
# one guarded division; zero-token docs kept via LEFT JOIN + COALESCE.
ORACLES["bpe_compression_stats"] = (
    "WITH " + ",\n".join(_bpe_encode_docs_parts(8)) + """,
perdoc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nt,
         CAST(SUM(length(symbol)) AS BIGINT) AS nc
  FROM posed GROUP BY doc_id
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(COALESCE(p.nt, 0)) AS BIGINT) AS n_tokens,
       CAST(SUM(COALESCE(p.nc, 0)) AS BIGINT) AS n_chars,
       CASE WHEN SUM(COALESCE(p.nt, 0)) > 0
            THEN CAST(SUM(COALESCE(p.nc, 0)) AS DOUBLE)
                 / CAST(SUM(COALESCE(p.nt, 0)) AS DOUBLE)
            ELSE 0.0 END AS chars_per_token
FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
GROUP BY d.source
""")


# pack_bpe_sequences (retrieval.py): the bpe_encode_docs rows pushed
# through the exact pack_token_sequences shard/cut arithmetic.
ORACLES["pack_bpe_sequences"] = (
    "WITH " + ",\n".join(_bpe_encode_docs_parts(8)) + """,
btoks AS (
  SELECT p.doc_id, p.pos, i.token_id
  FROM posed p JOIN ids i ON p.symbol = i.symbol
),
keyed AS (
  SELECT doc_id, pos, token_id,
         md5(CAST(doc_id AS VARCHAR)) AS sort_key,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 16
           AS shard
  FROM btoks
),
numbered AS (
  SELECT shard, doc_id, token_id,
         ROW_NUMBER() OVER (PARTITION BY shard
                            ORDER BY sort_key, doc_id, pos) - 1 AS rn
  FROM keyed
)
SELECT shard, CAST(rn // 128 AS BIGINT) AS seq_index,
       CAST(rn % 128 AS BIGINT) AS pos_in_seq, doc_id, token_id
FROM numbered
""")


# ---------------------------------------------------------------------------
# mmr_rerank (similarity.py mmr_rerank_df): greedy MMR unrolled into k
# pinned stages. Bit-stable because BOTH engines now spell every float
# the same way: relevance is the JVM-fold cosine (the ann_cosine_topk
# expression), pairwise sims accumulate in dimension order on the Spark
# side (kernel comment) == list_dot_product here, norms are
# greatest(sqrt(self-dot), 1e-30), and the score is
# 0.7*rel - (1.0-0.7)*max_sim in that exact operation order. Each stage
# is one ROW_NUMBER argmax (score DESC, neighbor_id ASC) per query over
# the not-yet-selected shortlist. Upgrades the entry rows-only -> hash.
def _mmr_oracle(n_queries: int = 5, k: int = 10, shortlist: int = 40,
                lam: str = "0.7") -> str:
    head = f"""WITH q AS MATERIALIZED (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings ORDER BY vec_id LIMIT {n_queries}
), c AS MATERIALIZED (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings
), short AS MATERIALIZED (
  SELECT query_id, neighbor_id, rel FROM (
    SELECT query_id, neighbor_id, cosine AS rel,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM (SELECT query_id, neighbor_id,
                 list_dot_product(qv, cv)
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(cv, cv))) AS cosine
          FROM c, q WHERE neighbor_id <> query_id))
  WHERE rank <= {shortlist}
), pairsim AS MATERIALIZED (
  SELECT a.query_id, a.neighbor_id AS i, b.neighbor_id AS j,
         list_dot_product(va.cv, vb.cv)
           / (greatest(sqrt(list_dot_product(va.cv, va.cv)), 1e-30)
              * greatest(sqrt(list_dot_product(vb.cv, vb.cv)), 1e-30))
           AS sim
  FROM short a
  JOIN short b ON a.query_id = b.query_id
               AND a.neighbor_id <> b.neighbor_id
  JOIN c va ON va.neighbor_id = a.neighbor_id
  JOIN c vb ON vb.neighbor_id = b.neighbor_id
), s1 AS MATERIALIZED (
  SELECT query_id, neighbor_id, rel, 1 AS mmr_rank FROM (
    SELECT query_id, neighbor_id, rel,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY {lam} * rel DESC,
                                       neighbor_id ASC) AS rn
    FROM short) WHERE rn = 1
), sel1 AS MATERIALIZED (SELECT query_id, neighbor_id FROM s1)"""
    stages = []
    for t in range(2, k + 1):
        stages.append(f""", s{t} AS MATERIALIZED (
  SELECT query_id, neighbor_id, rel, {t} AS mmr_rank FROM (
    SELECT sh.query_id, sh.neighbor_id, sh.rel,
           ROW_NUMBER() OVER (PARTITION BY sh.query_id
                              ORDER BY ({lam} * sh.rel
                                        - (1.0 - {lam}) * pen.p) DESC,
                                       sh.neighbor_id ASC) AS rn
    FROM short sh
    JOIN (SELECT ps.query_id, ps.i AS neighbor_id, MAX(ps.sim) AS p
          FROM pairsim ps
          JOIN sel{t - 1} s ON ps.query_id = s.query_id
                            AND ps.j = s.neighbor_id
          GROUP BY ps.query_id, ps.i) pen
      ON pen.query_id = sh.query_id
     AND pen.neighbor_id = sh.neighbor_id
    WHERE NOT EXISTS (SELECT 1 FROM sel{t - 1} s
                      WHERE s.query_id = sh.query_id
                        AND s.neighbor_id = sh.neighbor_id))
  WHERE rn = 1
), sel{t} AS MATERIALIZED (SELECT query_id, neighbor_id FROM sel{t - 1}
              UNION ALL SELECT query_id, neighbor_id FROM s{t})""")
    union = "\nUNION ALL\n".join(
        f"SELECT query_id, neighbor_id, rel AS relevance, "
        f"CAST(mmr_rank AS INTEGER) AS mmr_rank FROM s{t}"
        for t in range(1, k + 1))
    return head + "".join(stages) + "\n" + union


ORACLES["mmr_rerank"] = _mmr_oracle(5, 10, 40, "0.7")


# ---------------------------------------------------------------------------
# curriculum_order (curation.py curriculum_order_df): integer-exact stage
# quantiles over the n_tokens value histogram + the md5 shuffle-key
# arithmetic global_shuffle already pins. ceil is stated in integers
# ((n*(s+1)+3)//4), never a float ceil.
ORACLES["curriculum_order"] = f"""
WITH wn AS (
  SELECT doc_id, CAST(len({_TOKENS}) AS BIGINT) AS n_tokens FROM documents
),
cumt AS (
  SELECT n_tokens,
         SUM(c) OVER (ORDER BY n_tokens
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM (SELECT n_tokens, COUNT(*) AS c FROM wn GROUP BY n_tokens)
),
tot AS (SELECT COUNT(*) AS n FROM wn),
bounds AS (
  SELECT s, MIN(n_tokens) AS b
  FROM (SELECT unnest(generate_series(0, 3)) AS s), cumt, tot
  WHERE cum >= (n * (s + 1) + 3) // 4
  GROUP BY s
),
staged AS (
  SELECT wn.doc_id, wn.n_tokens,
         COALESCE(CAST(MIN(bounds.s) AS INTEGER), 3) AS stage
  FROM wn LEFT JOIN bounds ON wn.n_tokens <= bounds.b
  GROUP BY wn.doc_id, wn.n_tokens
),
keyed AS (
  SELECT doc_id, n_tokens, stage,
         ('0x' || substring(md5('c0:' || CAST(doc_id AS VARCHAR)),
                            1, 15))::BIGINT AS k
  FROM staged
)
SELECT doc_id, n_tokens, stage,
       CAST(k % 16 AS INTEGER) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY stage, k % 16
                               ORDER BY k, doc_id) - 1 AS BIGINT)
         AS pos_in_shard
FROM keyed
"""


# Incremental DSIR (dsir.py dsir_select_increment): stats from the
# even-doc_id half (target = its 'en' docs), the odd half scored as the
# arriving increment — NO lang exclusion on the increment side (it was
# not part of the stats corpora). Same integer/rank gate discipline.
ORACLES["dsir_select_increment"] = f"""
WITH g0 AS (
  SELECT doc_id, lang,
         ('0x' || substring(md5(
             lt[CAST(i AS INTEGER)] || ' ' || lt[CAST(i + 1 AS INTEGER)]
           ), 1, 8))::BIGINT % 256 AS bucket
  FROM (SELECT doc_id, lang, lt, unnest(generate_series(1, n - 1)) AS i
        FROM (SELECT doc_id, lang, {_DSIR_TOKS} AS lt,
                     len({_DSIR_TOKS}) AS n
              FROM documents WHERE doc_id % 2 = 0)
        WHERE n >= 2)
),
ct AS (SELECT bucket, COUNT(*) AS target_count FROM g0
       WHERE lang = 'en' GROUP BY bucket),
cr AS (SELECT bucket, COUNT(*) AS raw_count FROM g0
       WHERE lang <> 'en' GROUP BY bucket),
stats AS (
  SELECT COALESCE(ct.bucket, cr.bucket) AS bucket,
         CAST(COALESCE(target_count, 0) AS BIGINT) AS target_count,
         CAST(COALESCE(raw_count, 0) AS BIGINT) AS raw_count
  FROM ct FULL OUTER JOIN cr ON ct.bucket = cr.bucket
),
tot AS (SELECT CAST(SUM(target_count) AS BIGINT) AS nt,
               CAST(SUM(raw_count) AS BIGINT) AS nr FROM stats),
gi AS (
  SELECT doc_id, lang,
         ('0x' || substring(md5(
             lt[CAST(i AS INTEGER)] || ' ' || lt[CAST(i + 1 AS INTEGER)]
           ), 1, 8))::BIGINT % 256 AS bucket
  FROM (SELECT doc_id, lang, lt, unnest(generate_series(1, n - 1)) AS i
        FROM (SELECT doc_id, lang, {_DSIR_TOKS} AS lt,
                     len({_DSIR_TOKS}) AS n
              FROM documents WHERE doc_id % 2 = 1)
        WHERE n >= 2)
),
perb AS (
  SELECT g.doc_id, g.lang, g.bucket,
         CAST(COUNT(*) AS BIGINT) AS c,
         CAST(COALESCE(s.target_count, 0) AS BIGINT) AS tc,
         CAST(COALESCE(s.raw_count, 0) AS BIGINT) AS rc,
         ln(CAST(COALESCE(s.target_count, 0) + 1 AS DOUBLE)
            / CAST(COALESCE(s.raw_count, 0) + 1 AS DOUBLE))
           + ln(CAST(nr + 256 AS DOUBLE))
           - ln(CAST(nt + 256 AS DOUBLE)) AS lr
  FROM gi g LEFT JOIN stats s ON g.bucket = s.bucket, tot
  GROUP BY g.doc_id, g.lang, g.bucket, s.target_count, s.raw_count,
           nt, nr
),
scored AS (
  -- bucket-ordered deterministic fold: identical-text docs tie exactly
  -- and break on doc_id, matching Spark (see _DSIR_SCORED note)
  SELECT doc_id, lang,
         CAST(SUM(c) AS BIGINT) AS n_grams,
         CAST(SUM(c * tc) AS BIGINT) AS sum_target_count,
         CAST(SUM(c * rc) AS BIGINT) AS sum_raw_count,
         list_aggregate(list(CAST(c AS DOUBLE) * lr ORDER BY bucket),
                        'sum') AS logw
  FROM perb
  GROUP BY doc_id, lang
),
zero AS (
  SELECT doc_id, lang,
         CAST(0 AS BIGINT) AS n_grams,
         CAST(0 AS BIGINT) AS sum_target_count,
         CAST(0 AS BIGINT) AS sum_raw_count,
         0.0 AS logw
  FROM documents
  WHERE doc_id % 2 = 1 AND len({_DSIR_TOKS}) < 2
),
cand AS (SELECT * FROM scored UNION ALL SELECT * FROM zero)
SELECT doc_id, lang, rank, n_grams, sum_target_count, sum_raw_count
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY logw DESC, doc_id) AS rank
      FROM cand)
WHERE rank <= 50
"""


# hybrid_search_rrf (retrieval.py): Reciprocal Rank Fusion of the BM25
# top-50 (the bm25_search CTE chain re-ranked to 50) and the exact-cosine
# top-50 of the lowest-vec_id query embedding (self excluded). The fused
# score is a fixed-order sum of two IEEE double divisions
# 1/(60 + rank), absent modality contributing 0.0 and rank sentinel -1 —
# bit-identical cross-engine, full hash.
ORACLES["hybrid_search_rrf"] = """
WITH tok AS (
  SELECT doc_id, list_filter(string_split_regex(lower(COALESCE(text, '')), '\\s+'), x -> x <> '') AS toks FROM documents
),
st AS (
  SELECT COUNT(*) AS n_docs,
         SUM(len(toks)) AS total_tokens,
         SUM(CASE WHEN list_contains(toks, 'spark') THEN 1 ELSE 0 END) AS df_spark,
         SUM(CASE WHEN list_contains(toks, 'query') THEN 1 ELSE 0 END) AS df_query,
         SUM(CASE WHEN list_contains(toks, 'vector') THEN 1 ELSE 0 END) AS df_vector
  FROM tok
),
scored AS (
  SELECT doc_id,
         CAST(len(list_filter(toks, x -> x = 'spark')) AS BIGINT) AS tf_spark,
         CAST(len(list_filter(toks, x -> x = 'query')) AS BIGINT) AS tf_query,
         CAST(len(list_filter(toks, x -> x = 'vector')) AS BIGINT) AS tf_vector,
         CAST(len(toks) AS BIGINT) AS dl
  FROM tok
),
parts AS (
  SELECT doc_id, tf_spark, tf_query, tf_vector, dl,
         0.25 + 0.75 * (CAST(dl AS DOUBLE)
                        / (CAST(st.total_tokens AS DOUBLE)
                           / CAST(st.n_docs AS DOUBLE))) AS norm_len,
         CAST(st.n_docs AS DOUBLE) AS nd,
         CAST(st.df_spark AS DOUBLE) AS dfs,
         CAST(st.df_query AS DOUBLE) AS dfq,
         CAST(st.df_vector AS DOUBLE) AS dfv
  FROM scored CROSS JOIN st
),
s AS (
  SELECT doc_id,
         0.0
         + ((nd - dfs + 0.5) / (dfs + 0.5) + 1.0)
             * (CAST(tf_spark AS DOUBLE) * 2.2)
             / (CAST(tf_spark AS DOUBLE) + 1.2 * norm_len)
         + ((nd - dfq + 0.5) / (dfq + 0.5) + 1.0)
             * (CAST(tf_query AS DOUBLE) * 2.2)
             / (CAST(tf_query AS DOUBLE) + 1.2 * norm_len)
         + ((nd - dfv + 0.5) / (dfv + 0.5) + 1.0)
             * (CAST(tf_vector AS DOUBLE) * 2.2)
             / (CAST(tf_vector AS DOUBLE) + 1.2 * norm_len)
         AS score
  FROM parts
),
lex AS (
  SELECT doc_id, CAST(rnk AS INTEGER) AS lex_rank FROM (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
    FROM s)
  WHERE rnk <= 50
),
q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings ORDER BY vec_id LIMIT 1
),
c AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings
),
cos AS (
  SELECT neighbor_id,
         list_dot_product(qv, cv)
           / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cosine
  FROM c, q WHERE neighbor_id <> query_id
),
sem AS (
  SELECT neighbor_id AS doc_id, CAST(rank AS INTEGER) AS sem_rank
  FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM cos)
  WHERE rank <= 50
),
fused AS (
  SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
         CAST(COALESCE(lex.lex_rank, -1) AS INTEGER) AS lex_rank,
         CAST(COALESCE(sem.sem_rank, -1) AS INTEGER) AS sem_rank,
         COALESCE(1.0 / (60.0 + CAST(lex.lex_rank AS DOUBLE)), 0.0)
           + COALESCE(1.0 / (60.0 + CAST(sem.sem_rank AS DOUBLE)), 0.0)
           AS rrf_score
  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
)
SELECT doc_id, lex_rank, sem_rank, rrf_score,
       CAST(rrf_rank AS INTEGER) AS rrf_rank
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id ASC)
               AS rrf_rank
      FROM fused)
WHERE rrf_rank <= 20
"""


# dsir_select_increment_stream: top-k is merge-stable under the
# deterministic (_logw desc, doc_id asc) order, so the maintained
# streaming state must equal the one-shot batch selection — the SAME
# oracle gates both.
ORACLES["dsir_select_increment_stream"] = ORACLES["dsir_select_increment"]


# repeated_span_scrub (dedup.py): exact-substring dedup with removal —
# all-substrings grouping (the engine's rolling hash never reaches the
# gate; a collision would fail THIS raw-substring comparison loudly),
# canonical = first (doc_id, pos) occurrence, every rn>=2 occurrence's
# [pos, pos+30) interval cut, intervals unioned per doc via the
# running-max window, text rebuilt from the kept gaps.
ORACLES["repeated_span_scrub"] = """
WITH base AS (
  SELECT doc_id, COALESCE(text, '') AS text FROM documents
  UNION ALL
  SELECT doc_id + 3000000, 'planted page: ' || substr(text, 11, 60)
  FROM documents WHERE doc_id % 25 = 0 AND length(text) >= 80
  UNION ALL
  SELECT doc_id + 4000000, text || substr(text, 1, 45)
  FROM documents WHERE doc_id % 40 = 0 AND length(text) >= 60
),
pos AS (
  SELECT doc_id, CAST(g AS BIGINT) AS pos,
         substring(text, CAST(g AS INTEGER), 30) AS s
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, length(text) - 29)) AS g
        FROM base WHERE length(text) >= 30)
),
ranked AS (
  SELECT doc_id, pos,
         ROW_NUMBER() OVER (PARTITION BY s ORDER BY doc_id, pos) AS rn
  FROM pos
),
cuts AS (SELECT doc_id, pos FROM ranked WHERE rn >= 2),
cov AS (
  SELECT doc_id, pos AS st, pos + 30 AS en,
         CASE WHEN pos > COALESCE(MAX(pos + 30) OVER (
                  PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS newg
  FROM cuts
),
grp AS (
  SELECT *, SUM(newg) OVER (PARTITION BY doc_id ORDER BY st
                            ROWS UNBOUNDED PRECEDING) AS g
  FROM cov
),
mi AS (
  SELECT doc_id, g, MIN(st) AS st, MAX(en) AS en
  FROM grp GROUP BY doc_id, g
),
percut AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_cut_spans
  FROM cuts GROUP BY doc_id
),
permi AS (
  SELECT doc_id, CAST(SUM(en - st) AS BIGINT) AS n_cut_chars,
         MAX(en) AS last_en
  FROM mi GROUP BY doc_id
),
segs AS (
  SELECT doc_id, st,
         COALESCE(LAG(en) OVER (PARTITION BY doc_id ORDER BY st), 1)
           AS prev
  FROM mi
),
heads AS (
  SELECT s.doc_id,
         STRING_AGG(substr(b.text, CAST(s.prev AS INTEGER),
                           CAST(s.st - s.prev AS INTEGER)),
                    '' ORDER BY s.st) AS head
  FROM segs s JOIN base b USING (doc_id)
  GROUP BY s.doc_id
)
SELECT b.doc_id,
       CASE WHEN p.last_en IS NULL THEN b.text
            ELSE COALESCE(h.head, '')
                 || substr(b.text, CAST(p.last_en AS INTEGER),
                           CAST(length(b.text) + 1 - p.last_en AS INTEGER))
       END AS clean_text,
       CAST(COALESCE(c.n_cut_spans, 0) AS BIGINT) AS n_cut_spans,
       CAST(COALESCE(p.n_cut_chars, 0) AS BIGINT) AS n_cut_chars
FROM base b
LEFT JOIN permi p USING (doc_id)
LEFT JOIN percut c USING (doc_id)
LEFT JOIN heads h USING (doc_id)
"""

# repeated_span_scrub_stream: the maintained streaming scrub replays
# the SAME planted corpus in doc_id order, where first-occurrence-
# canonical arrival semantics equal the batch operator's global
# min(doc_id, pos) selection exactly — one oracle, two execution modes
# (the dsir_select_increment_stream pattern).
ORACLES["repeated_span_scrub_stream"] = ORACLES["repeated_span_scrub"]
