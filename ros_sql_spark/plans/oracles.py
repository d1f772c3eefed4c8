"""DuckDB oracle SQL for the declared suite (SURVEY.md §2.3).

One ANSI-SQL string per query in ros_sql_spark.plans.queries, runnable by
DuckDB 1.0.0 over the driver-registered parquet views.  Column aliases
match the Spark side exactly (the driver's value-hash sorts by name).

Parity rules applied throughout (SURVEY.md §1.3):
- events.ts is ns-resolution → always exposed via epoch_us(ts) or
  timestamp range predicates at µs-aligned bounds, never selected raw;
- money through CAST(... AS DECIMAL(18,2)) before SUM (exact);
- float-derived scalars rounded to 6 dp;
- embedding float32 elements cast to DOUBLE before any arithmetic
  (without the cast DuckDB computes in float32 and the rounded value
  carries float noise);
- integer-typed outputs cast to BIGINT where DuckDB would widen to
  HUGEINT (sum of BIGINT).

Oracle coverage: every query EXCEPT q78_ann_ivf, q84_pq_ann and
qx09_bpe_tokenize is oracle-backed, including every sketch/LSH/MinHash
query (q26/q39/q40 run on deterministic md5-prefix / integer arithmetic
that DuckDB reproduces bit-for-bit).  The three rows-only queries are
iterative float convergence (KMeans / codebook training / merge argmax)
whose recall and bit-identity are asserted in tests instead.  The exact
set is PINNED by tests/test_entry_contract.py::
test_rows_only_queries_are_the_documented_ones — numeric counts rotted
twice (r8, r10 verdicts) so the docstring no longer carries one.
"""

from __future__ import annotations

__all__ = ["ORACLES"]

# Shared IRLS CTE chain (qx77 trains, qx78 evaluates) — see the
# qx77 queries.py docstring for the parity story.
_LOGREG_CTES = """
        WITH f AS (
            SELECT doc_id,
                   CAST(lang = 'en' AS BIGINT) AS y,
                   CAST(len(toks) AS DOUBLE) / 100.0 AS x1,
                   round(CAST(len(list_filter(toks, t -> list_contains(
                         ['the','and','of','to','in','is','that','with','for','on'], t)))
                         AS DOUBLE) / len(toks), 6) AS x2
            FROM (SELECT doc_id, text, lang,
                         string_split(lower(text), ' ') AS toks
                  FROM documents)
            WHERE lang IS NOT NULL
        ),
        tr AS (SELECT * FROM f WHERE doc_id % 5 <> 0),
        be0 AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2),
        m1 AS (
            SELECT sum(w) AS sw, sum(w*x1) AS swx1, sum(w*x2) AS swx2,
                   sum(w*x1*x1) AS swx11, sum(w*x1*x2) AS swx12,
                   sum(w*x2*x2) AS swx22,
                   sum(r) AS sr, sum(r*x1) AS srx1, sum(r*x2) AS srx2
            FROM (SELECT x1, x2, p*(1.0 - p) AS w,
                         CAST(y AS DOUBLE) - p AS r
                  FROM (SELECT x1, x2, y,
                               1.0/(1.0 + exp(-(b0 + b1*x1 + b2*x2))) AS p
                        FROM tr CROSS JOIN be0))
        ),
        be1 AS (
            SELECT b0 + (sr*(swx11*swx22 - swx12*swx12)
                         - swx1*(srx1*swx22 - swx12*srx2)
                         + swx2*(srx1*swx12 - swx11*srx2))
                        / (sw*(swx11*swx22 - swx12*swx12)
                           - swx1*(swx1*swx22 - swx12*swx2)
                           + swx2*(swx1*swx12 - swx11*swx2)) AS b0,
                   b1 + (sw*(srx1*swx22 - swx12*srx2)
                         - sr*(swx1*swx22 - swx12*swx2)
                         + swx2*(swx1*srx2 - srx1*swx2))
                        / (sw*(swx11*swx22 - swx12*swx12)
                           - swx1*(swx1*swx22 - swx12*swx2)
                           + swx2*(swx1*swx12 - swx11*swx2)) AS b1,
                   b2 + (sw*(swx11*srx2 - srx1*swx12)
                         - swx1*(swx1*srx2 - srx1*swx2)
                         + sr*(swx1*swx12 - swx11*swx2))
                        / (sw*(swx11*swx22 - swx12*swx12)
                           - swx1*(swx1*swx22 - swx12*swx2)
                           + swx2*(swx1*swx12 - swx11*swx2)) AS b2
            FROM m1 CROSS JOIN be0
        ),
        m2 AS (
            SELECT sum(w) AS sw, sum(w*x1) AS swx1, sum(w*x2) AS swx2,
                   sum(w*x1*x1) AS swx11, sum(w*x1*x2) AS swx12,
                   sum(w*x2*x2) AS swx22,
                   sum(r) AS sr, sum(r*x1) AS srx1, sum(r*x2) AS srx2
            FROM (SELECT x1, x2, p*(1.0 - p) AS w,
                         CAST(y AS DOUBLE) - p AS r
                  FROM (SELECT x1, x2, y,
                               1.0/(1.0 + exp(-(b0 + b1*x1 + b2*x2))) AS p
                        FROM tr CROSS JOIN be1))
        ),
        be2 AS (
            SELECT b0 + (sr*(swx11*swx22 - swx12*swx12)
                         - swx1*(srx1*swx22 - swx12*srx2)
                         + swx2*(srx1*swx12 - swx11*srx2))
                        / (sw*(swx11*swx22 - swx12*swx12)
                           - swx1*(swx1*swx22 - swx12*swx2)
                           + swx2*(swx1*swx12 - swx11*swx2)) AS b0,
                   b1 + (sw*(srx1*swx22 - swx12*srx2)
                         - sr*(swx1*swx22 - swx12*swx2)
                         + swx2*(swx1*srx2 - srx1*swx2))
                        / (sw*(swx11*swx22 - swx12*swx12)
                           - swx1*(swx1*swx22 - swx12*swx2)
                           + swx2*(swx1*swx12 - swx11*swx2)) AS b1,
                   b2 + (sw*(swx11*srx2 - srx1*swx12)
                         - swx1*(swx1*srx2 - srx1*swx2)
                         + sr*(swx1*swx12 - swx11*swx2))
                        / (sw*(swx11*swx22 - swx12*swx12)
                           - swx1*(swx1*swx22 - swx12*swx2)
                           + swx2*(swx1*swx12 - swx11*swx2)) AS b2
            FROM m2 CROSS JOIN be1
        ),
        m3 AS (
            SELECT sum(w) AS sw, sum(w*x1) AS swx1, sum(w*x2) AS swx2,
                   sum(w*x1*x1) AS swx11, sum(w*x1*x2) AS swx12,
                   sum(w*x2*x2) AS swx22,
                   sum(r) AS sr, sum(r*x1) AS srx1, sum(r*x2) AS srx2
            FROM (SELECT x1, x2, p*(1.0 - p) AS w,
                         CAST(y AS DOUBLE) - p AS r
                  FROM (SELECT x1, x2, y,
                               1.0/(1.0 + exp(-(b0 + b1*x1 + b2*x2))) AS p
                        FROM tr CROSS JOIN be2))
        ),
        be3 AS (
            SELECT b0 + (sr*(swx11*swx22 - swx12*swx12)
                         - swx1*(srx1*swx22 - swx12*srx2)
                         + swx2*(srx1*swx12 - swx11*srx2))
                        / (sw*(swx11*swx22 - swx12*swx12)
                           - swx1*(swx1*swx22 - swx12*swx2)
                           + swx2*(swx1*swx12 - swx11*swx2)) AS b0,
                   b1 + (sw*(srx1*swx22 - swx12*srx2)
                         - sr*(swx1*swx22 - swx12*swx2)
                         + swx2*(swx1*srx2 - srx1*swx2))
                        / (sw*(swx11*swx22 - swx12*swx12)
                           - swx1*(swx1*swx22 - swx12*swx2)
                           + swx2*(swx1*swx12 - swx11*swx2)) AS b1,
                   b2 + (sw*(swx11*srx2 - srx1*swx12)
                         - swx1*(swx1*srx2 - srx1*swx2)
                         + sr*(swx1*swx12 - swx11*swx2))
                        / (sw*(swx11*swx22 - swx12*swx12)
                           - swx1*(swx1*swx22 - swx12*swx2)
                           + swx2*(swx1*swx12 - swx11*swx2)) AS b2
            FROM m3 CROSS JOIN be2
        ),
        m4 AS (
            SELECT sum(w) AS sw, sum(w*x1) AS swx1, sum(w*x2) AS swx2,
                   sum(w*x1*x1) AS swx11, sum(w*x1*x2) AS swx12,
                   sum(w*x2*x2) AS swx22,
                   sum(r) AS sr, sum(r*x1) AS srx1, sum(r*x2) AS srx2
            FROM (SELECT x1, x2, p*(1.0 - p) AS w,
                         CAST(y AS DOUBLE) - p AS r
                  FROM (SELECT x1, x2, y,
                               1.0/(1.0 + exp(-(b0 + b1*x1 + b2*x2))) AS p
                        FROM tr CROSS JOIN be3))
        ),
        be4 AS (
            SELECT b0 + (sr*(swx11*swx22 - swx12*swx12)
                         - swx1*(srx1*swx22 - swx12*srx2)
                         + swx2*(srx1*swx12 - swx11*srx2))
                        / (sw*(swx11*swx22 - swx12*swx12)
                           - swx1*(swx1*swx22 - swx12*swx2)
                           + swx2*(swx1*swx12 - swx11*swx2)) AS b0,
                   b1 + (sw*(srx1*swx22 - swx12*srx2)
                         - sr*(swx1*swx22 - swx12*swx2)
                         + swx2*(swx1*srx2 - srx1*swx2))
                        / (sw*(swx11*swx22 - swx12*swx12)
                           - swx1*(swx1*swx22 - swx12*swx2)
                           + swx2*(swx1*swx12 - swx11*swx2)) AS b1,
                   b2 + (sw*(swx11*srx2 - srx1*swx12)
                         - swx1*(swx1*srx2 - srx1*swx2)
                         + sr*(swx1*swx12 - swx11*swx2))
                        / (sw*(swx11*swx22 - swx12*swx12)
                           - swx1*(swx1*swx22 - swx12*swx2)
                           + swx2*(swx1*swx12 - swx11*swx2)) AS b2
            FROM m4 CROSS JOIN be3
        )
"""

ORACLES: dict[str, str] = {
    "q01_scan_project": """
        SELECT event_id, user_id, event_type, value FROM events
    """,
    "q02_time_split": """
        SELECT event_id,
               epoch_us(ts) // 1000000 AS secs,
               epoch_us(ts) % 1000000 AS usecs
        FROM events
    """,
    "q03_time_range": """
        SELECT event_id, event_type, value
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
    """,
    "q04_ordered_replay": """
        SELECT event_id, epoch_us(ts) AS tus
        FROM events
        ORDER BY ts, event_id
        LIMIT 50
    """,
    "q05_topic_partition": """
        SELECT event_type,
               count(*) AS n,
               round(avg(value), 6) AS avg_value
        FROM events
        GROUP BY event_type
    """,
    "q06_array_shred": """
        SELECT vec_id,
               CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS idx,
               round(CAST(unnest(embedding) AS DOUBLE), 6) AS val
        FROM embeddings
        WHERE vec_id < 50
    """,
    "q07_child_reassemble": """
        SELECT o_orderkey,
               count(*) AS n_items,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        FROM orders
        JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY o_orderkey
    """,
    "q08_fk_join_chain": """
        SELECT r_name, n_name, count(*) AS n_cust
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "q09_blob_fidelity": """
        SELECT doc_id, md5(text) AS text_md5 FROM documents
    """,
    "q51_json_extract": """
        SELECT event_id,
               TRY_CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k
        FROM events
    """,
    "q11_pricing_summary": """
        SELECT l_returnflag,
               l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_base_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                   AS DOUBLE) AS sum_disc_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q54_distinct_agg": """
        SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY event_type
    """,
    "q55_rollup": """
        SELECT lang, source,
               count(*) AS n,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        GROUP BY ROLLUP(lang, source)
    """,
    "q52_window_rank": """
        SELECT user_id, event_id, event_type
        FROM (
            SELECT user_id, event_id, event_type,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn
            FROM events
        )
        WHERE rn = 1
    """,
    "q56_window_lag": """
        SELECT user_id, event_id, gap_us
        FROM (
            SELECT user_id, event_id,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS gap_us
            FROM events
        )
        WHERE gap_us IS NOT NULL
    """,
    "q16_sessionize": """
        SELECT user_id, CAST(1 + sum(brk) AS BIGINT) AS n_sessions
        FROM (
            SELECT user_id,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id
                        ) > 1800000000
                        THEN 1 ELSE 0 END AS brk
            FROM events
        )
        GROUP BY user_id
    """,
    "q17_topk": """
        SELECT o_custkey AS c_custkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_price
        FROM orders
        GROUP BY o_custkey
        ORDER BY total_price DESC, c_custkey
        LIMIT 10
    """,
    "q18_except": """
        SELECT user_id FROM events WHERE event_type = 'purchase'
        EXCEPT
        SELECT user_id FROM events WHERE event_type = 'error'
    """,
    "q19_semijoin": """
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "q69_antijoin": """
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "q61_text_stats": """
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n,
               CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents
    """,
    "q59_date_trunc": """
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
               count(*) AS n
        FROM orders
        GROUP BY 1
    """,
    "q60_union_all": """
        SELECT event_id, user_id, 'click' AS src
        FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT event_id, user_id, 'view' AS src
        FROM events WHERE event_type = 'view'
    """,
    "q65_intersect": """
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    "q25_dedup_exact": """
        SELECT min(doc_id) AS doc_id
        FROM documents
        GROUP BY md5(text)
    """,
    # q26: bit-for-bit MinHash rebuild (md5-affine family mod P=2^31-1;
    # the sketch parity trick — constants derived with the same md5
    # arithmetic as operators/dedup.py::_affine_constants)
    "q26_dedup_minhash": """
        WITH sh AS (
            SELECT doc_id,
                   CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)
                       % 2147483647 AS h
            FROM (
                SELECT doc_id,
                       unnest(CASE WHEN len(toks) >= 3
                              THEN list_transform(range(1, len(toks) - 1),
                                   i -> concat_ws(' ', toks[i], toks[i+1],
                                                  toks[i+2]))
                              ELSE [array_to_string(toks, ' ')] END) AS s
                FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
                      FROM documents)
            )
        ), dims AS (
            SELECT i,
                   CAST(concat('0x', substr(md5(concat('a',
                        CAST(i AS VARCHAR))), 1, 15)) AS BIGINT)
                       % 2147483646 + 1 AS a,
                   CAST(concat('0x', substr(md5(concat('b',
                        CAST(i AS VARCHAR))), 1, 15)) AS BIGINT)
                       % 2147483647 AS b
            FROM range(64) t(i)
        ), g AS (
            SELECT sh.doc_id, dims.i,
                   min((dims.a * sh.h + dims.b) % 2147483647) AS v
            FROM sh CROSS JOIN dims
            GROUP BY sh.doc_id, dims.i
        ), band AS (
            SELECT doc_id, i // 4 AS band,
                   string_agg(CAST(v AS VARCHAR), ',' ORDER BY i) AS key
            FROM g GROUP BY doc_id, i // 4
        )
        SELECT doc_id, band,
               CAST(concat('0x', substr(md5(key), 1, 15)) AS BIGINT)
                   AS band_hash
        FROM band
    """,
    "q27_knn_cosine": """
        SELECT b.vec_id,
               round(list_cosine_similarity(
                   list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                   list_transform(b.embedding, x -> CAST(x AS DOUBLE))
               ), 6) AS sim
        FROM embeddings a
        JOIN embeddings b ON b.vec_id <> a.vec_id
        WHERE a.vec_id = 0
        ORDER BY sim DESC, b.vec_id
        LIMIT 5
    """,
    "q66_lang_matrix": """
        SELECT lang, source, count(*) AS n
        FROM documents
        GROUP BY lang, source
    """,
    "q73_embedding_norm": """
        SELECT vec_id,
               round(sqrt(list_sum(
                   list_transform(embedding,
                                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
               )), 6) AS l2norm
        FROM embeddings
    """,
    "q30_multimodal_join": """
        SELECT doc_id, lang, label
        FROM documents
        JOIN embeddings ON vec_id = doc_id
    """,
    # 60-bit SimHash reproduced in SQL: token hash = first 15 md5 hex
    # digits as a BIGINT (identical to Spark's conv(substr(md5,1,15),16,10)).
    "q31_dedup_simhash": """
        WITH tok AS (
            SELECT doc_id,
                   CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) AS h
            FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
                  FROM documents)
        ), bitsum AS (
            SELECT doc_id, j,
                   CASE WHEN sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) > 0
                        THEN (CAST(1 AS BIGINT) << j)
                        ELSE 0 END AS bitval
            FROM tok CROSS JOIN (SELECT unnest(range(60)) AS j)
            GROUP BY doc_id, j
        )
        SELECT doc_id, CAST(sum(bitval) AS BIGINT) AS simhash
        FROM bitsum GROUP BY doc_id
    """,
    "q32_ngram_jaccard": """
        WITH s AS (
            SELECT doc_id,
                   list_distinct(
                       CASE WHEN len(toks) >= 3
                            THEN list_transform(range(1, len(toks) - 1),
                                 i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
                            ELSE [array_to_string(toks, ' ')] END) AS sh
            FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
                  FROM documents WHERE doc_id < 40)
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                     / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
                     6) AS jaccard
        FROM s a JOIN s b ON a.doc_id < b.doc_id
    """,
    "q68_cosine_dedup_pairs": """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(
                   list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                   list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6) AS sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE a.vec_id < 120 AND b.vec_id < 120
          AND round(list_cosine_similarity(
                  list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                  list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6) >= 0.3
    """,
    "q70_ann_topk": """
        WITH sims AS (
            SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                   round(list_cosine_similarity(
                       list_transform(c.embedding, x -> CAST(x AS DOUBLE)),
                       list_transform(q.embedding, x -> CAST(x AS DOUBLE))), 6) AS sim
            FROM embeddings q
            JOIN embeddings c ON c.vec_id <> q.vec_id
            WHERE q.vec_id < 20
        )
        SELECT query_id, vec_id, sim
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn
              FROM sims)
        WHERE rn <= 3
    """,
    "q35_lang_id": """
        WITH scored AS (
            SELECT doc_id,
                   len(list_intersect(toks, ['the','and','of','to','in','is','that','with','for','on'])) AS s_en,
                   len(list_intersect(toks, ['der','die','das','und','ist','nicht','mit','ein','von','zu'])) AS s_de,
                   len(list_intersect(toks, ['el','la','los','las','es','y','de','que','en','por'])) AS s_es,
                   len(list_intersect(toks, ['le','la','les','et','est','dans','pour','que','une','des'])) AS s_fr,
                   len(list_intersect(toks, ['的','是','了','在','我','有','和','就','不','人'])) AS s_zh
            FROM (SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS toks
                  FROM documents)
        )
        SELECT doc_id,
               CASE WHEN best = 0 THEN 'und'
                    WHEN s_en = best THEN 'en'
                    WHEN s_de = best THEN 'de'
                    WHEN s_es = best THEN 'es'
                    WHEN s_fr = best THEN 'fr'
                    ELSE 'zh' END AS lang_pred
        FROM (SELECT *, greatest(s_en, s_de, s_es, s_fr, s_zh) AS best FROM scored)
    """,
    "q71_quality_score": """
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars_c,
               CAST(len(toks) AS BIGINT) AS n_tok,
               round(CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE)
                     / len(toks), 6) AS avg_tok_len,
               round(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
                     / length(text), 6) AS punct_ratio,
               round(CAST(len(list_filter(toks, t -> list_contains(
                         ['the','and','of','to','in','is','that','with','for','on'], t)))
                         AS DOUBLE) / len(toks), 6) AS stop_ratio_en
        FROM (SELECT doc_id, text, string_split(lower(text), ' ') AS toks
              FROM documents)
    """,
    "q37_token_count_bpe": """
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe
        FROM documents
    """,
    "q38_fingerprint": """
        SELECT doc_id,
               md5(array_to_string(
                   list_sort(list_distinct(string_split(lower(text), ' '))),
                   ' ')) AS fp
        FROM documents
    """,
    # q39: bit-for-bit rebuild of the deterministic fake-feature digest —
    # the chain advances on HEX digests (md5(md5hex)) and each feature is
    # an 8-hex-char window / 2^32, so the integer-form digest is pure
    # md5/substr/CAST arithmetic (the mapInPandas plumbing's VALUES are
    # verified, not just row shape)
    "q39_multimodal_features": """
        WITH a AS (
            SELECT CAST(doc_id AS BIGINT) AS asset_id,
                   'text/plain' AS mime,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   md5(coalesce(text, '')) AS h1
            FROM documents
        ), b AS (
            SELECT asset_id, mime, n_bytes, h1, md5(h1) AS h2 FROM a
        )
        SELECT asset_id, mime, n_bytes,
               md5(concat_ws(',',
                   CAST(CAST(concat('0x', substr(h1, 1, 8)) AS BIGINT)
                        AS VARCHAR),
                   CAST(CAST(concat('0x', substr(h1, 9, 8)) AS BIGINT)
                        AS VARCHAR),
                   CAST(CAST(concat('0x', substr(h1, 17, 8)) AS BIGINT)
                        AS VARCHAR),
                   CAST(CAST(concat('0x', substr(h1, 25, 8)) AS BIGINT)
                        AS VARCHAR),
                   CAST(CAST(concat('0x', substr(h2, 1, 8)) AS BIGINT)
                        AS VARCHAR),
                   CAST(CAST(concat('0x', substr(h2, 9, 8)) AS BIGINT)
                        AS VARCHAR),
                   CAST(CAST(concat('0x', substr(h2, 17, 8)) AS BIGINT)
                        AS VARCHAR),
                   CAST(CAST(concat('0x', substr(h2, 25, 8)) AS BIGINT)
                        AS VARCHAR)
               )) AS features_md5
        FROM b
    """,
    # q40: bit-for-bit LSH rebuild — integer sign decisions (floor-
    # quantized vectors x md5-derived integer planes, exact int64 dots)
    # make the candidate sets deterministic across engines, and the
    # round-6 cosine rerank is the q27-established parity.  "Approximate"
    # describes recall, not reproducibility.
    "q40_ann_lsh": """
        WITH planes AS (
            SELECT p, d,
                   CAST(concat('0x', substr(md5(concat('h',
                        CAST(p AS VARCHAR), '_', CAST(d AS VARCHAR))),
                        1, 15)) AS BIGINT) % 2097153 - 1048576 AS c
            FROM range(32) t1(p) CROSS JOIN range(64) t2(d)
        ), qv AS (
            SELECT vec_id, d,
                   CAST(floor(CAST(embedding[CAST(d AS INT) + 1] AS DOUBLE)
                        * 1048576.0) AS BIGINT) AS q
            FROM embeddings CROSS JOIN range(64) t(d)
        ), dots AS (
            SELECT v.vec_id, p.p, sum(v.q * p.c) AS s
            FROM qv v JOIN planes p ON p.d = v.d
            GROUP BY v.vec_id, p.p
        ), bits AS (
            SELECT vec_id, p // 4 AS band,
                   sum(CASE WHEN s > 0 THEN 1 << CAST(p % 4 AS INT)
                       ELSE 0 END) AS bucket
            FROM dots GROUP BY vec_id, p // 4
        ), cand AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id
            FROM bits q JOIN bits c
              ON q.band = c.band AND q.bucket = c.bucket
            WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id
        ), sims AS (
            SELECT cand.query_id, cand.vec_id,
                   round(list_cosine_similarity(
                       list_transform(b.embedding, x -> CAST(x AS DOUBLE)),
                       list_transform(a.embedding, x -> CAST(x AS DOUBLE))
                   ), 6) AS sim
            FROM cand
            JOIN embeddings a ON a.vec_id = cand.query_id
            JOIN embeddings b ON b.vec_id = cand.vec_id
        )
        SELECT query_id, vec_id, sim FROM (
            SELECT query_id, vec_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, vec_id) AS rn
            FROM sims) WHERE rn <= 3
    """,
    "q41_asof_join": """
        WITH c AS (SELECT user_id, event_id, ts FROM events
                   WHERE event_type = 'click'),
             p AS (SELECT user_id, ts FROM events
                   WHERE event_type = 'purchase')
        SELECT c.event_id, c.user_id, epoch_us(p.ts) AS prev_purchase_us
        FROM c ASOF LEFT JOIN p
          ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    "q42_interval_join": """
        SELECT a.event_id AS event_a, b.event_id AS event_b, a.user_id,
               abs(epoch_us(a.ts) - epoch_us(b.ts)) AS gap_us
        FROM events a
        JOIN events b
          ON a.user_id = b.user_id
         AND a.event_id < b.event_id
         AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 3600000000
    """,
    "q74_cube": """
        SELECT lang, source,
               count(*) AS n,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        GROUP BY CUBE(lang, source)
    """,
    "q44_percentiles": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.9), 6) AS p90
        FROM events
        GROUP BY event_type
        HAVING count(value) > 0
    """,
    "q72_moment_stats": """
        SELECT event_type,
               round(stddev_samp(value), 6) AS sd,
               round(corr(value, CAST(user_id AS DOUBLE)), 6) AS c
        FROM events
        GROUP BY event_type
    """,
    "q46_json_map_explode": """
        SELECT event_id, k AS key,
               TRY_CAST(json_extract_string(props, '$.' || k) AS BIGINT) AS val
        FROM (SELECT event_id, props, unnest(json_keys(props)) AS k
              FROM events)
    """,
    "q47_window_frames": """
        SELECT user_id, event_id,
               round(sum(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS sum3,
               round(min(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
                   AS run_min,
               ntile(4) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS quartile
        FROM events
    """,
    "q75_string_funcs": """
        SELECT doc_id,
               upper(substr(text, 1, 24)) AS u,
               replace(lower(substr(text, 1, 24)), ' ', '_') AS r,
               lpad(lang, 5, '.') AS padded,
               CAST(strpos(text, 'data') AS BIGINT) AS pos_data,
               reverse(source) AS rev_src
        FROM documents
    """,
    "q76_null_logic": """
        SELECT event_id,
               coalesce(nullif(event_type, 'error'), 'none') AS et_or_none,
               round(least(value, 100.0), 6) AS capped,
               round(greatest(value, 1.0), 6) AS floored,
               CASE WHEN value < 50 THEN 'low'
                    WHEN value < 200 THEN 'mid'
                    ELSE 'high' END AS bucket
        FROM events
    """,
    "q79_having": """
        SELECT user_id, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM events
        GROUP BY user_id
        HAVING count(*) > 30
    """,
    "q10_pivot": """
        SELECT user_id,
               count(*) FILTER (event_type = 'click') AS click,
               count(*) FILTER (event_type = 'error') AS error,
               count(*) FILTER (event_type = 'purchase') AS purchase,
               count(*) FILTER (event_type = 'signup') AS signup,
               count(*) FILTER (event_type = 'view') AS view
        FROM events
        GROUP BY user_id
    """,
    "q14_rank_stats": """
        WITH spend AS (
            SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
            FROM orders GROUP BY o_custkey
        )
        SELECT o_custkey AS c_custkey,
               round(percent_rank() OVER w, 6) AS pr,
               round(cume_dist() OVER w, 6) AS cd,
               CAST(dense_rank() OVER w AS BIGINT) AS dr
        FROM spend
        WINDOW w AS (ORDER BY total DESC, o_custkey)
    """,
    # Each engine checks its own HLL sketch against its own exact count;
    # the boolean and the exact count hash-match, the raw estimates
    # (implementation-specific) never leave the engines.
    "q12_approx_distinct": """
        SELECT event_type,
               count(DISTINCT user_id) AS n_users,
               abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
                   <= count(DISTINCT user_id) * 0.05 AS approx_ok
        FROM events
        GROUP BY event_type
    """,
    "q13_grouping_sets": """
        SELECT lang, source,
               count(*) AS n,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               CAST(GROUPING(lang) AS BIGINT) AS g_lang,
               CAST(GROUPING(source) AS BIGINT) AS g_source
        FROM documents
        GROUP BY GROUPING SETS ((lang), (source), ())
    """,
    # Reachability closure over the q32 candidate-pair graph: component =
    # min doc_id reachable (matches the min-label propagation operator).
    "q15_dup_components": """
        WITH RECURSIVE
        s AS (
            SELECT doc_id,
                   list_distinct(
                       CASE WHEN len(toks) >= 3
                            THEN list_transform(range(1, len(toks) - 1),
                                 i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
                            ELSE [array_to_string(toks, ' ')] END) AS sh
            FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
                  FROM documents WHERE doc_id < 40)
        ),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM s a JOIN s b ON a.doc_id < b.doc_id
            WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                  / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
                  6) >= 0.001
        ),
        edges AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION ALL
            SELECT doc_b AS a, doc_a AS b FROM pairs
        ),
        reach(id, r) AS (
            SELECT doc_id, doc_id FROM s
            UNION
            SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id
        )
        SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS component
        FROM reach GROUP BY id
    """,
    "q57_token_topk": """
        SELECT t AS tok, count(*) AS n
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS t
              FROM documents)
        GROUP BY t
        ORDER BY n DESC, tok
        LIMIT 50
    """,
    "q58_label_centroids": """
        SELECT label, CAST(idx AS BIGINT) AS idx, round(avg(v), 6) AS c
        FROM (SELECT label,
                     generate_subscripts(embedding, 1) - 1 AS idx,
                     CAST(unnest(embedding) AS DOUBLE) AS v
              FROM embeddings)
        GROUP BY label, idx
    """,
    "q22_train_split": """
        SELECT doc_id, bucket,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id,
                     CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                          AS BIGINT) % 100 AS bucket
              FROM documents)
    """,
    "q23_pack_sequences": """
        SELECT doc_id, source, n_bpe,
               -- windowed sum(BIGINT) is HUGEINT in DuckDB, which pandas
               -- renders as float64 → driver dtype/hash mismatch (r3 q23);
               -- cast back to BIGINT so both engines emit int64
               CAST((c - n_bpe) // 2048 AS BIGINT) AS seq_id
        FROM (SELECT doc_id, source,
                     CAST(len(regexp_extract_all(text,
                          '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe,
                     sum(CAST(len(regexp_extract_all(text,
                          '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT))
                         OVER (PARTITION BY source ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS c
              FROM documents)
    """,
    "q21_quality_filter": """
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tok,
               len(toks) >= 10
               AND round(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))
                         AS DOUBLE) / length(text), 6) < 0.25
               AND round(CAST(len(list_filter(toks, t -> list_contains(
                         ['the','and','of','to','in','is','that','with','for','on'], t)))
                         AS DOUBLE) / len(toks), 6) > 0.015 AS keep
        FROM (SELECT doc_id, text, string_split(lower(text), ' ') AS toks
              FROM documents)
    """,
    "q62_redact": """
        SELECT doc_id,
               md5(regexp_replace(text, '[0-9]+', '#', 'g')) AS redacted_md5,
               CAST(length(text)
                    - length(regexp_replace(text, '[0-9]+', '#', 'g'))
                    AS BIGINT) AS n_removed
        FROM documents
    """,
    "q63_repetition": """
        SELECT doc_id,
               round(1.0 - CAST(len(list_distinct(sh)) AS DOUBLE)
                           / len(sh), 6) AS rep_ratio
        FROM (
            SELECT doc_id,
                   CASE WHEN len(toks) >= 3
                        THEN list_transform(range(1, len(toks) - 1),
                             i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
                        ELSE [array_to_string(toks, ' ')] END AS sh
            FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
                  FROM documents)
        )
    """,
    "q64_range_frame": """
        SELECT user_id, event_id,
               count(*) OVER w AS n_1h,
               round(sum(value) OVER w, 6) AS sum_1h
        FROM (SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY us
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    "q24_chunk_documents": """
        SELECT doc_id,
               CAST(i AS BIGINT) AS chunk_id,
               md5(substring(text, CAST(i * 128 + 1 AS INT), 128)) AS chunk_md5,
               CAST(length(substring(text, CAST(i * 128 + 1 AS INT), 128))
                    AS BIGINT) AS chunk_len
        FROM (SELECT doc_id, text,
                     unnest(range(0, (length(text) + 127) // 128)) AS i
              FROM documents WHERE length(text) > 0)
    """,
    "q28_stratified_sample": """
        SELECT doc_id, lang, bucket
        FROM (SELECT d.doc_id, d.lang,
                     CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                          AS BIGINT) % 100 AS bucket,
                     coalesce(r.rate_pct, 10) AS rate
              FROM documents d
              LEFT JOIN (VALUES ('en', 50), ('zh', 30), ('es', 25), ('de', 20))
                        r(lang, rate_pct)
                     ON d.lang = r.lang)
        WHERE bucket < rate
    """,
    "q67_ntile_quartiles": """
        SELECT lang, CAST(q AS BIGINT) AS q,
               count(*) AS n,
               CAST(min(n_chars) AS BIGINT) AS min_chars,
               CAST(max(n_chars) AS BIGINT) AS max_chars
        FROM (SELECT lang, n_chars,
                     ntile(4) OVER (PARTITION BY lang
                                    ORDER BY n_chars, doc_id) AS q
              FROM documents)
        GROUP BY lang, q
    """,
    "q33_keep_best": """
        SELECT h, keep_id, n_members
        FROM (SELECT md5(text) AS h, doc_id AS keep_id,
                     row_number() OVER (PARTITION BY md5(text)
                                        ORDER BY n_chars DESC, doc_id) AS rn,
                     count(*) OVER (PARTITION BY md5(text)) AS n_members
              FROM documents)
        WHERE rn = 1
    """,
    "q20_decontaminate": """
        WITH b AS (
            SELECT doc_id, text,
                   CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % 100 AS bucket
            FROM documents
        ), sh AS (
            SELECT doc_id, bucket,
                   unnest(CASE WHEN len(toks) >= 5
                          THEN list_transform(range(1, len(toks) - 3),
                               i -> concat_ws(' ', toks[i], toks[i+1],
                                              toks[i+2], toks[i+3], toks[i+4]))
                          ELSE [array_to_string(toks, ' ')] END) AS s
            FROM (SELECT doc_id, bucket, string_split(lower(text), ' ') AS toks
                  FROM b)
        )
        SELECT doc_id FROM b
        WHERE bucket < 80
          AND NOT EXISTS (
              SELECT 1 FROM sh t
              WHERE t.doc_id = b.doc_id AND t.bucket < 80
                AND t.s IN (SELECT s FROM sh WHERE bucket >= 98))
    """,
    "q34_funnel": """
        WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        t1 AS (SELECT user_id, min(us) AS u1 FROM e
               WHERE event_type = 'view' GROUP BY user_id),
        t2 AS (SELECT e.user_id, min(us) AS u2 FROM e
               JOIN t1 USING (user_id)
               WHERE event_type = 'click' AND us > u1 GROUP BY e.user_id),
        t3 AS (SELECT e.user_id, min(us) AS u3 FROM e
               JOIN t2 USING (user_id)
               WHERE event_type = 'purchase' AND us > u2 GROUP BY e.user_id)
        SELECT t1.user_id, u1, u2, u3,
               CAST(CASE WHEN u3 IS NOT NULL THEN 3
                         WHEN u2 IS NOT NULL THEN 2
                         ELSE 1 END AS BIGINT) AS stage
        FROM t1 LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)
    """,
    "q36_tfidf_topk": """
        WITH toks AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
            FROM documents
        ), tf AS (
            SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
        ), df AS (
            SELECT term, count(*) AS df FROM tf GROUP BY term
        ), n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT doc_id, term, tfidf, CAST(rk AS BIGINT) AS rk
        FROM (SELECT tf.doc_id, tf.term,
                     round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6)
                         AS tfidf,
                     row_number() OVER (
                         PARTITION BY tf.doc_id
                         ORDER BY round(tf.tf * ln(CAST(n.n_docs AS DOUBLE)
                                                   / df.df), 6) DESC,
                                  tf.term) AS rk
              FROM tf JOIN df USING (term) CROSS JOIN n)
        WHERE rk <= 3
    """,
    "q45_approx_percentile": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50_exact,
               abs(approx_quantile(value, 0.5) - quantile_cont(value, 0.5))
                   <= (max(value) - min(value)) * 0.05 AS approx_ok
        FROM events GROUP BY event_type
        HAVING count(value) > 0
    """,
    "q29_quantize_embeddings": """
        SELECT vec_id,
               round(scale, 6) AS scale,
               CAST(list_sum(list_transform(dv, x -> floor(x / scale)))
                    AS BIGINT) AS q_sum,
               CAST(list_sum(list_transform(dv, x -> abs(floor(x / scale))))
                    AS BIGINT) AS q_abs_sum
        FROM (SELECT vec_id, dv,
                     list_max(list_transform(dv, x -> abs(x))) / 127.0 AS scale
              FROM (SELECT vec_id,
                           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
                    FROM embeddings))
    """,
    "q43_correlated_subquery": """
        SELECT o_orderkey, o_custkey, CAST(price AS DOUBLE) AS price
        FROM (SELECT o_orderkey, o_custkey,
                     CAST(o_totalprice AS DECIMAL(18,2)) AS price
              FROM orders) o
        WHERE 2 * price * (SELECT count(*) FROM orders o2
                           WHERE o2.o_custkey = o.o_custkey)
              > 3 * (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2)))
                     FROM orders o2
                     WHERE o2.o_custkey = o.o_custkey)
    """,
    "q48_skew_salted_agg": """
        SELECT event_type,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
               CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vmax
        FROM events GROUP BY event_type
    """,
    "q49_ordered_agg": """
        SELECT l_orderkey,
               string_agg(CAST(l_linenumber AS VARCHAR), ','
                          ORDER BY l_linenumber) AS lines,
               count(*) AS n_lines
        FROM lineitem GROUP BY l_orderkey
    """,
    "q77_unpivot": """
        WITH wide AS (
            SELECT source,
                   count(*) FILTER (lang = 'en') AS en,
                   count(*) FILTER (lang = 'de') AS de,
                   count(*) FILTER (lang = 'es') AS es,
                   count(*) FILTER (lang = 'fr') AS fr,
                   count(*) FILTER (lang = 'zh') AS zh
            FROM documents GROUP BY source
        )
        SELECT source, lang, n FROM (
            SELECT source, 'en' AS lang, en AS n FROM wide
            UNION ALL SELECT source, 'de', de FROM wide
            UNION ALL SELECT source, 'es', es FROM wide
            UNION ALL SELECT source, 'fr', fr FROM wide
            UNION ALL SELECT source, 'zh', zh FROM wide
        )
    """,
    "q50_latest_state": """
        SELECT user_id, event_type,
               event_id AS last_event_id,
               us AS last_us,
               round(value, 6) AS last_value
        FROM (SELECT user_id, event_type, event_id, epoch_us(ts) AS us, value,
                     row_number() OVER (PARTITION BY user_id, event_type
                                        ORDER BY epoch_us(ts) DESC,
                                                 event_id DESC) AS rn
              FROM events)
        WHERE rn = 1
    """,
    "q80_histogram": """
        SELECT CAST(floor(value / 50.0) AS BIGINT) AS bin,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM events
        GROUP BY bin
    """,
    "q81_conditional_agg": """
        SELECT user_id,
               count(*) FILTER (event_type = 'purchase') AS n_purchase,
               CAST(sum(CAST(value AS DECIMAL(18,2)))
                    FILTER (event_type = 'purchase') AS DOUBLE) AS revenue,
               round(CAST(count(*) FILTER (event_type = 'error') AS DOUBLE)
                     / count(*), 6) AS error_rate
        FROM events GROUP BY user_id
    """,
    "q53_grouping_id": """
        SELECT lang, source, count(*) AS n,
               CAST(GROUPING(lang) AS BIGINT) AS g_lang,
               CAST(GROUPING(source) AS BIGINT) AS g_source
        FROM documents
        GROUP BY ROLLUP(lang, source)
    """,
    # A-ES weighted sample: u = md5-derived uniform (identical bytes in
    # both engines), priority = u^(1/w) ROUNDED to 9dp before ranking so
    # both engines order the same number; doc_id breaks ties at the
    # k-boundary.
    "q82_weighted_sample": """
        SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
               round(pow(
                   (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                         AS BIGINT) + 0.5) / 4294967296.0,
                   1.0 / n_chars), 9) AS priority
        FROM documents
        WHERE n_chars > 0
        ORDER BY priority DESC, doc_id
        LIMIT 100
    """,
    # Passage decomposition mirrors the Spark operator exactly: 1-based
    # inclusive list slice == F.slice; the <>'' guard matches Spark's
    # empty-passage filter (split('') is [''] in both engines).
    "q85_boilerplate": """
        WITH passages AS (
            SELECT doc_id, i AS pos,
                   array_to_string(t[(i*10+1):(i*10+10)], ' ') AS passage
            FROM (SELECT doc_id, t,
                         unnest(range(0,
                             CAST(floor((len(t)-1)/10.0) AS BIGINT) + 1)) AS i
                  FROM (SELECT doc_id, string_split(lower(text), ' ') AS t
                        FROM documents))
        ),
        clean AS (SELECT doc_id, pos, passage FROM passages
                  WHERE passage <> ''),
        hot AS (
            SELECT passage
            FROM (SELECT passage, count(DISTINCT doc_id) AS dfq
                  FROM clean GROUP BY 1)
            WHERE dfq > 2
        )
        SELECT doc_id,
               md5(string_agg(passage, ' ' ORDER BY pos)) AS clean_md5
        FROM clean
        WHERE passage NOT IN (SELECT passage FROM hot)
        GROUP BY doc_id
    """,
    # CAST the window cumsum to BIGINT: DuckDB's sum(BIGINT) is HUGEINT,
    # which pandas renders float64 (the r3 q23 driver-hash trap).
    "q83_token_budget_mix": """
        SELECT doc_id, source, n_tok, cum_tok
        FROM (
            SELECT doc_id, source, n_tok,
                   CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum_tok,
                   CASE source WHEN 'src0' THEN 1200
                               WHEN 'src1' THEN 800
                               WHEN 'src2' THEN 500 END AS b
            FROM (SELECT doc_id, source,
                         CAST(len(regexp_extract_all(text,
                              '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
                             AS n_tok
                  FROM documents)
        )
        WHERE b IS NOT NULL AND cum_tok - n_tok < b
    """,
    "q86_full_outer": """
        SELECT COALESCE(c.user_id, b.user_id) AS user_id,
               c.n_clicks, b.n_buys
        FROM (SELECT user_id, count(*) AS n_clicks
              FROM events WHERE event_type = 'click'
              GROUP BY user_id) c
        FULL OUTER JOIN
             (SELECT user_id, count(*) AS n_buys
              FROM events WHERE event_type = 'purchase'
              GROUP BY user_id) b
        ON c.user_id = b.user_id
    """,
    # hopping 2-day/1-day windows: every event belongs to exactly the
    # two day-aligned windows starting at floor_day(ts) and
    # floor_day(ts) - 1 day — enumerated with an unnested offset, all
    # arithmetic in exact µs epochs (86400000000 µs per day)
    "q87_hopping_window": """
        SELECT CAST((epoch_us(ts) // 86400000000 - k.k) * 86400000000
                    AS BIGINT) AS w_start_us,
               event_type,
               count(*) AS n
        FROM events, (SELECT unnest([0, 1]) AS k) k
        GROUP BY 1, 2
    """,
    # z from EXACT integer sums with the same expression shape as the
    # Spark side: identical IEEE ops on identical exact inputs ->
    # bit-identical doubles -> stable |z| > 2 boundary decisions
    "q88_zscore_outliers": """
        SELECT doc_id, source,
               round((n_chars - s / c) /
                     sqrt(ss / c - (s / c) * (s / c)), 6) AS z
        FROM documents
        JOIN (SELECT source,
                     sum(n_chars) AS s,
                     sum(n_chars * n_chars) AS ss,
                     count(*) AS c
              FROM documents
              GROUP BY source) USING (source)
        WHERE ss / c - (s / c) * (s / c) > 0
          AND abs((n_chars - s / c) / sqrt(ss / c - (s / c) * (s / c))) > 2
    """,
    # q90 is plan-different but RESULT-identical to q20 (Bloom prefilter
    # + exact verify is exact — no false negatives, FPs re-checked), so
    # its oracle is q20's NOT EXISTS verbatim.
    "q90_bloom_decontaminate": """
        WITH b AS (
            SELECT doc_id, text,
                   CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % 100 AS bucket
            FROM documents
        ), sh AS (
            SELECT doc_id, bucket,
                   unnest(CASE WHEN len(toks) >= 5
                          THEN list_transform(range(1, len(toks) - 3),
                               i -> concat_ws(' ', toks[i], toks[i+1],
                                              toks[i+2], toks[i+3], toks[i+4]))
                          ELSE [array_to_string(toks, ' ')] END) AS s
            FROM (SELECT doc_id, bucket, string_split(lower(text), ' ') AS toks
                  FROM b)
        )
        SELECT doc_id FROM b
        WHERE bucket < 80
          AND NOT EXISTS (
              SELECT 1 FROM sh t
              WHERE t.doc_id = b.doc_id AND t.bucket < 80
                AND t.s IN (SELECT s FROM sh WHERE bucket >= 98))
    """,
    # dense day axis per user (range is end-exclusive -> d1 + 1); the
    # first axis day is always observed (it IS min(d)), so v_filled is
    # never NULL; decimal sums cast to DOUBLE only at the boundary
    "q91_gap_fill": """
        WITH daily AS (
            SELECT user_id, epoch_us(ts) // 86400000000 AS d,
                   sum(CAST(value AS DECIMAL(18,2))) AS v
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1, 2
        ), span AS (
            SELECT user_id, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY 1
        ), axis AS (
            SELECT user_id, unnest(range(d0, d1 + 1)) AS d FROM span
        )
        SELECT a.user_id, a.d,
               (dd.v IS NOT NULL) AS observed,
               CAST(last_value(dd.v IGNORE NULLS) OVER (
                    PARTITION BY a.user_id ORDER BY a.d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS v_filled
        FROM axis a
        LEFT JOIN daily dd ON a.user_id = dd.user_id AND a.d = dd.d
    """,
    "q92_cohort_retention": """
        WITH ua AS (SELECT DISTINCT user_id,
                           epoch_us(ts) // 86400000000 AS d
                    FROM events),
        cohort AS (SELECT user_id, min(d) AS c0 FROM ua GROUP BY 1)
        SELECT c0 // 7 AS cohort_week, (d - c0) // 7 AS week_offset,
               CAST(count(DISTINCT ua.user_id) AS BIGINT) AS n_users
        FROM ua JOIN cohort USING (user_id)
        GROUP BY 1, 2
    """,
    # entropy from EXACT integer counts; the one float SUM
    # (sum c*ln c) is order-dependent at ~1e-13 relative error vs the
    # 5e-7 rounding boundary — accepted odds, same class as q36
    "q93_word_entropy": """
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
               round(ln(CAST(sum(c) AS DOUBLE))
                     - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
                       / CAST(sum(c) AS DOUBLE), 6) AS entropy
        FROM (SELECT doc_id, term, count(*) AS c
              FROM (SELECT doc_id,
                           unnest(string_split(lower(text), ' ')) AS term
                    FROM documents)
              GROUP BY 1, 2)
        GROUP BY doc_id
    """,
    # ordering ties break on event_id (same-µs collision rule); both
    # regex engines treat the pattern as an unanchored search
    "q94_seq_pattern": """
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
               regexp_matches(
                   string_agg(event_type, ' '
                              ORDER BY epoch_us(ts), event_id),
                   'view.* click.* purchase') AS hit
        FROM events
        GROUP BY user_id
    """,
    "q95_containment": """
        WITH b AS (
            SELECT doc_id, text,
                   CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % 100 AS bucket
            FROM documents
        ), sh AS (
            SELECT doc_id, bucket,
                   unnest(CASE WHEN len(toks) >= 5
                          THEN list_transform(range(1, len(toks) - 3),
                               i -> concat_ws(' ', toks[i], toks[i+1],
                                              toks[i+2], toks[i+3], toks[i+4]))
                          ELSE [array_to_string(toks, ' ')] END) AS s
            FROM (SELECT doc_id, bucket, string_split(lower(text), ' ') AS toks
                  FROM b)
        ),
        ev AS (SELECT DISTINCT doc_id, s FROM sh WHERE bucket >= 98),
        tr AS (SELECT DISTINCT s FROM sh WHERE bucket < 80)
        SELECT e.doc_id,
               CAST(count(*) AS BIGINT) AS n_shingles,
               CAST(sum(CASE WHEN t.s IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_matched,
               round(CAST(sum(CASE WHEN t.s IS NOT NULL THEN 1 ELSE 0 END)
                          AS DOUBLE) / count(*), 6) AS containment
        FROM ev e LEFT JOIN tr t ON e.s = t.s
        GROUP BY e.doc_id
    """,
    # full-frame window battery; NULL second_type/gap_us for
    # single-event users in both engines (nth_value past the frame)
    "q96_first_touch": """
        SELECT user_id, first_type, second_type, last_type, gap_us
        FROM (
            SELECT user_id,
                   first_value(event_type) OVER w AS first_type,
                   nth_value(event_type, 2) OVER w AS second_type,
                   last_value(event_type) OVER w AS last_type,
                   nth_value(us, 2) OVER w - first_value(us) OVER w AS gap_us,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY us, event_id) AS rn
            FROM (SELECT user_id, event_type, event_id,
                         epoch_us(ts) AS us FROM events)
            WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND UNBOUNDED FOLLOWING)
        )
        WHERE rn = 1
    """,
    # both engines return '' (not NULL) for a no-match regexp_extract
    "q97_extract_entities": """
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT)
                   AS n_numbers,
               CAST(len(regexp_extract_all(text, '[A-Z][a-z]+')) AS BIGINT)
                   AS n_capwords,
               regexp_extract(text, '[0-9]+') AS first_number
        FROM documents
    """,
    # the split join is provably row-identical to the plain equi-join —
    # which is the oracle
    "q98_skew_split_join": """
        SELECT e.event_id, e.user_id, u.u_events
        FROM events e
        JOIN (SELECT user_id, CAST(count(*) AS BIGINT) AS u_events
              FROM events GROUP BY user_id) u
          ON e.user_id = u.user_id
    """,
    # argmax tie rule = Spark's max(struct(n, lang)): max count, then
    # lexicographically LAST lang -> ORDER BY n DESC, lang DESC;
    # integer/integer division is true division (double) in both engines
    "q99_corpus_report": """
        WITH base AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   count(DISTINCT md5(text)) AS n_distinct,
                   round(sum(n_chars) / count(*), 6) AS mean_chars
            FROM documents GROUP BY source
        ),
        top AS (
            SELECT source, lang AS top_lang FROM (
                SELECT source, lang, count(*) AS n
                FROM documents GROUP BY 1, 2
            )
            QUALIFY row_number() OVER (PARTITION BY source
                                       ORDER BY n DESC, lang DESC) = 1
        )
        SELECT source, n_docs,
               round(1.0 - n_distinct / n_docs, 6) AS dup_rate,
               mean_chars, top_lang
        FROM base JOIN top USING (source)
    """,
    "q89_edit_distance": """
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS dist
        FROM (SELECT doc_id, lang, n_chars - n_chars % 50 AS bkt,
                     substring(text, 1, 40) AS pfx
              FROM documents WHERE doc_id % 20 = 0) a
        JOIN (SELECT doc_id, lang, n_chars - n_chars % 50 AS bkt,
                     substring(text, 1, 40) AS pfx
              FROM documents WHERE doc_id % 20 = 0) b
          ON a.lang = b.lang AND a.bkt = b.bkt AND a.doc_id < b.doc_id
    """,
    # KMV sketches are deterministic given the shared 60-bit md5-prefix
    # hash, so the oracle reproduces the ESTIMATES bit-for-bit: same
    # bottom-64 rows, same (k-1)*M literal (63 * 2^60 — exact in a
    # double), same division, round(…, 6) at the boundary only.
    "qx00_kmv_overlap": """
        WITH hd AS (
            SELECT DISTINCT event_type AS t,
                   CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                        AS BIGINT) AS h
            FROM events
        ), sk AS (
            SELECT t, h FROM (
                SELECT t, h, row_number() OVER (PARTITION BY t ORDER BY h) AS rk
                FROM hd) WHERE rk <= 64
        ), est AS (
            SELECT t,
                   CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                        ELSE 63 * 1152921504606846976.0 / max(h) END AS est
            FROM sk GROUP BY t
        ), pairs AS (
            SELECT a.t AS ta, b.t AS tb
            FROM (SELECT DISTINCT t FROM sk) a
            JOIN (SELECT DISTINCT t FROM sk) b ON a.t < b.t
        ), pu AS (
            SELECT DISTINCT ta, tb, h FROM (
                SELECT p.ta, p.tb, s.h FROM pairs p JOIN sk s ON s.t = p.ta
                UNION ALL
                SELECT p.ta, p.tb, s.h FROM pairs p JOIN sk s ON s.t = p.tb)
        ), uk AS (
            SELECT ta, tb, h FROM (
                SELECT ta, tb, h,
                       row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rk
                FROM pu) WHERE rk <= 64
        ), flags AS (
            SELECT u.ta, u.tb, u.h,
                   CASE WHEN sa.h IS NULL THEN 0 ELSE 1 END AS in_a,
                   CASE WHEN sb.h IS NULL THEN 0 ELSE 1 END AS in_b
            FROM uk u
            LEFT JOIN sk sa ON sa.t = u.ta AND sa.h = u.h
            LEFT JOIN sk sb ON sb.t = u.tb AND sb.h = u.h
        ), agg AS (
            SELECT ta, tb, count(*) AS ku, max(h) AS vk,
                   sum(in_a * in_b) AS nboth
            FROM flags GROUP BY ta, tb
        )
        SELECT g.ta AS set_a, g.tb AS set_b,
               round(ea.est, 6) AS est_a,
               round(eb.est, 6) AS est_b,
               round(CASE WHEN g.ku < 64 THEN CAST(g.ku AS DOUBLE)
                          ELSE 63 * 1152921504606846976.0 / g.vk END, 6)
                   AS est_union,
               round(CAST(g.nboth AS DOUBLE) / g.ku, 6) AS jaccard_est,
               round((CAST(g.nboth AS DOUBLE) / g.ku)
                     * (CASE WHEN g.ku < 64 THEN CAST(g.ku AS DOUBLE)
                             ELSE 63 * 1152921504606846976.0 / g.vk END), 6)
                   AS est_intersection
        FROM agg g
        JOIN est ea ON ea.t = g.ta
        JOIN est eb ON eb.t = g.tb
    """,
    # exact trailing-7-day distinct users; day = integer ns floor-div
    # (≡ µs floor-div on DuckDB's truncated view — q91's discipline)
    "qx01_rolling_distinct": """
        WITH ud AS (
            SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d
            FROM events
        ), days AS (SELECT DISTINCT d FROM ud)
        SELECT days.d AS d,
               CAST(count(DISTINCT u.user_id) AS BIGINT) AS u7
        FROM days JOIN ud u ON u.d BETWEEN days.d - 6 AND days.d
        GROUP BY days.d
    """,
    # brute-force quadratic ground truth for the prefix-filtered join:
    # 5-token shingle sets exactly as q32 builds 3-token ones (short
    # docs contribute their whole text as one shingle); filter on the
    # ROUNDED jaccard, matching the Spark side's parity boundary
    "qx02_setsim_join": """
        WITH tok AS (
            SELECT doc_id, string_split(lower(text), ' ') AS toks
            FROM documents
        ), sh AS (
            SELECT doc_id,
                   list_distinct(CASE WHEN len(toks) >= 5
                       THEN list_transform(range(1, len(toks) - 3),
                            i -> concat_ws(' ', toks[i], toks[i+1],
                                           toks[i+2], toks[i+3], toks[i+4]))
                       ELSE [array_to_string(toks, ' ')] END) AS ts
            FROM tok
        ), pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   len(list_intersect(a.ts, b.ts)) AS i,
                   len(a.ts) + len(b.ts) AS t
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        )
        SELECT id_a, id_b,
               round(CAST(i AS DOUBLE) / (t - i), 6) AS jaccard
        FROM pairs
        WHERE CAST(i AS DOUBLE) / (t - i) >= 0.5
    """,
    # Count-Min rebuilt verbatim: same salted md5-prefix hash family,
    # same 4x64 counter table, min-over-rows estimate — deterministic,
    # so the estimates match bit-for-bit (qx00's discipline)
    "qx03_countmin_freq": """
        WITH probes AS (
            SELECT CAST(t.i AS INT) AS row,
                   CAST(concat('0x', substr(md5(concat(
                        CAST(user_id AS VARCHAR), '#', CAST(t.i AS VARCHAR)
                   )), 1, 15)) AS BIGINT) % 64 AS pos
            FROM events, range(4) t(i)
        ), counters AS (
            SELECT row, pos, count(*) AS c FROM probes GROUP BY row, pos
        ), qp AS (
            SELECT user_id, CAST(t.i AS INT) AS row,
                   CAST(concat('0x', substr(md5(concat(
                        CAST(user_id AS VARCHAR), '#', CAST(t.i AS VARCHAR)
                   )), 1, 15)) AS BIGINT) % 64 AS pos
            FROM (SELECT DISTINCT user_id FROM events), range(4) t(i)
        )
        SELECT q.user_id,
               CAST(min(coalesce(c.c, 0)) AS BIGINT) AS est_events
        FROM qp q LEFT JOIN counters c ON c.row = q.row AND c.pos = q.pos
        GROUP BY q.user_id
    """,
    # winsorized mean: clamp to the group's interpolated [p05, p95]
    # (quantile_cont ≡ Spark percentile, q44's precedent) then avg;
    # round-6 float boundary per the q88/q93 sum-order argument
    "qx04_winsorized_stats": """
        WITH p AS (
            SELECT lang,
                   quantile_cont(n_chars, 0.05) AS lo,
                   quantile_cont(n_chars, 0.95) AS hi
            FROM documents GROUP BY lang
        )
        SELECT d.lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               round(avg(greatest(least(CAST(d.n_chars AS DOUBLE), p.hi),
                                  p.lo)), 6) AS winsorized_mean,
               round(min(p.lo), 6) AS p05,
               round(min(p.hi), 6) AS p95
        FROM documents d JOIN p USING (lang)
        GROUP BY d.lang
    """,
    # quantile sketch rebuilt verbatim: same md5-prefix 60-bit hash over
    # the row-unique event_id, same bottom-128 (h, v) sample, same
    # rank-based interpolation double arithmetic (pos = p*(m-1), floor,
    # (1-frac)*lo + frac*hi) — deterministic, so every estimate matches
    # bit-for-bit (qx00/qx03's sketch-parity discipline)
    "qx05_quantile_sketch": """
        WITH h AS (
            SELECT event_type, CAST(value AS DOUBLE) AS v,
                   CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)),
                        1, 15)) AS BIGINT) AS h
            FROM events WHERE value IS NOT NULL
        ), s AS (
            SELECT event_type, v FROM (
                SELECT event_type, v,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY h, v) AS rn
                FROM h)
            WHERE rn <= 128
        ), r AS (
            SELECT event_type, v,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY v) AS vr,
                   count(*) OVER (PARTITION BY event_type) AS m
            FROM s
        ), rp AS (
            -- pos in DOUBLE like Spark (a bare 0.9 literal is DECIMAL
            -- in DuckDB — decimal pos would floor differently at
            -- representation boundaries)
            SELECT *,
                   CAST(0.5 AS DOUBLE) * (m - 1) AS pos50,
                   CAST(0.9 AS DOUBLE) * (m - 1) AS pos90
            FROM r
        ), g AS (
            SELECT event_type, max(m) AS m,
                   max(pos50) AS pos50, max(pos90) AS pos90,
                   max(CASE WHEN vr = CAST(floor(pos50) AS BIGINT) + 1
                       THEN v END) AS lo50,
                   max(CASE WHEN vr = CAST(floor(pos50) AS BIGINT) + 2
                       THEN v END) AS hi50,
                   max(CASE WHEN vr = CAST(floor(pos90) AS BIGINT) + 1
                       THEN v END) AS lo90,
                   max(CASE WHEN vr = CAST(floor(pos90) AS BIGINT) + 2
                       THEN v END) AS hi90
            FROM rp GROUP BY event_type
        )
        SELECT event_type,
               CAST(m AS BIGINT) AS n_sample,
               round(CASE WHEN pos50 - floor(pos50) = 0 THEN lo50
                     ELSE (1.0 - (pos50 - floor(pos50))) * lo50
                          + (pos50 - floor(pos50)) * hi50
                     END, 6) AS p50_est,
               round(CASE WHEN pos90 - floor(pos90) = 0 THEN lo90
                     ELSE (1.0 - (pos90 - floor(pos90))) * lo90
                          + (pos90 - floor(pos90)) * hi90
                     END, 6) AS p90_est
        FROM g
    """,
    # the composed curate() pipeline replayed stage by stage: q85's
    # boilerplate strip + rebuild, q21's quality gate (on the REBUILT
    # text), q25's min-id exact dedup — the digest checks the curated
    # text bytes end-to-end
    "qx06_curate_report": """
        WITH passages AS (
            SELECT doc_id, i AS pos,
                   array_to_string(t[(i*10+1):(i*10+10)], ' ') AS passage
            FROM (SELECT doc_id, t,
                         unnest(range(0,
                             CAST(floor((len(t)-1)/10.0) AS BIGINT) + 1)) AS i
                  FROM (SELECT doc_id, string_split(lower(text), ' ') AS t
                        FROM documents))
        ),
        clean AS (SELECT doc_id, pos, passage FROM passages
                  WHERE passage <> ''),
        hot AS (
            SELECT passage
            FROM (SELECT passage, count(DISTINCT doc_id) AS dfq
                  FROM clean GROUP BY 1)
            WHERE dfq > 2
        ),
        rebuilt AS (
            SELECT doc_id,
                   string_agg(passage, ' ' ORDER BY pos) AS rt
            FROM clean
            WHERE passage NOT IN (SELECT passage FROM hot)
            GROUP BY doc_id
        ),
        gated AS (
            SELECT doc_id, rt
            FROM (SELECT doc_id, rt,
                         string_split(lower(rt), ' ') AS toks
                  FROM rebuilt)
            WHERE len(toks) >= 10
              AND round(CAST(len(regexp_extract_all(rt, '[^A-Za-z0-9\\s]'))
                        AS DOUBLE) / length(rt), 6) < 0.25
              AND round(CAST(len(list_filter(toks, t -> list_contains(
                        ['the','and','of','to','in','is','that','with','for','on'],
                        t))) AS DOUBLE) / len(toks), 6) > 0.015
        )
        SELECT min(doc_id) AS doc_id, md5(rt) AS digest
        FROM gated GROUP BY md5(rt)
    """,
    # ground truth for the incremental ingest: the qx02 quadratic
    # restricted to pairs touching the batch (doc_id % 4 == 0) — the
    # prefix filter never under-produces, the exact verify never
    # over-produces, so values match exactly
    "qx07_setsim_incremental": """
        WITH tok AS (
            SELECT doc_id, string_split(lower(text), ' ') AS toks
            FROM documents
        ), sh AS (
            SELECT doc_id,
                   list_distinct(CASE WHEN len(toks) >= 5
                       THEN list_transform(range(1, len(toks) - 3),
                            i -> concat_ws(' ', toks[i], toks[i+1],
                                           toks[i+2], toks[i+3], toks[i+4]))
                       ELSE [array_to_string(toks, ' ')] END) AS ts
            FROM tok
        ), pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   len(list_intersect(a.ts, b.ts)) AS i,
                   len(a.ts) + len(b.ts) AS t
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE a.doc_id % 4 = 0 OR b.doc_id % 4 = 0
        )
        SELECT id_a, id_b,
               round(CAST(i AS DOUBLE) / (t - i), 6) AS jaccard
        FROM pairs
        WHERE CAST(i AS DOUBLE) / (t - i) >= 0.5
    """,
    # unigram-MLE mean negative log-likelihood: exact integer tf /
    # corpus counts feeding the identical double expression (q93's
    # float-parity discipline); N is a scalar subquery
    "qx08_unigram_logprob": """
        WITH tf AS (
            SELECT doc_id, term, count(*) AS c
            FROM (SELECT doc_id,
                         unnest(string_split(lower(text), ' ')) AS term
                  FROM documents)
            GROUP BY 1, 2
        ), corpus AS (
            SELECT term, sum(c) AS ct FROM tf GROUP BY term
        ), tot AS (
            SELECT CAST(sum(ct) AS DOUBLE) AS n FROM corpus
        )
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
               round(ln((SELECT n FROM tot))
                     - sum(CAST(c AS DOUBLE) * ln(CAST(ct AS DOUBLE)))
                       / CAST(sum(c) AS DOUBLE), 6) AS nll
        FROM tf JOIN corpus USING (term)
        GROUP BY doc_id
    """,
    # identical to q15: the incremental contraction must equal the
    # from-scratch reachability closure - that equality IS the gate
    "qx10_components_incremental": """
        WITH RECURSIVE
        s AS (
            SELECT doc_id,
                   list_distinct(
                       CASE WHEN len(toks) >= 3
                            THEN list_transform(range(1, len(toks) - 1),
                                 i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
                            ELSE [array_to_string(toks, ' ')] END) AS sh
            FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
                  FROM documents WHERE doc_id < 40)
        ),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM s a JOIN s b ON a.doc_id < b.doc_id
            WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                  / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
                  6) >= 0.001
        ),
        edges AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION ALL
            SELECT doc_b AS a, doc_a AS b FROM pairs
        ),
        reach(id, r) AS (
            SELECT doc_id, doc_id FROM s
            UNION
            SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id
        )
        SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS component
        FROM reach GROUP BY id
    """,
    # shard = md5-bucket (q22's portable integer arithmetic), position
    # = dense hash-order rank within the shard — both engines reproduce
    # the full pipeline bit-for-bit
    "qx11_shard_assignment": """
        SELECT doc_id, shard,
               CAST(row_number() OVER (PARTITION BY shard
                    ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
        FROM (SELECT doc_id,
                     md5(CAST(doc_id AS VARCHAR)) AS h,
                     CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                          1, 8)) AS BIGINT) % 16 AS shard
              FROM documents)
    """,
    # generate_series is inclusive on both ends -> epochs - 1
    "qx12_epoch_mixture": """
        SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch,
               md5(concat(CAST(doc_id AS VARCHAR), '#',
                          CAST(epoch AS VARCHAR))) AS mix_order
        FROM (SELECT d.doc_id, d.source,
                     unnest(generate_series(0, f.epochs - 1)) AS epoch
              FROM documents d
              JOIN (VALUES ('src0', 1), ('src1', 3), ('src2', 2),
                           ('src3', 4)) AS f(source, epochs)
                ON d.source = f.source)
    """,
    # TPC-H Q3 shape: deterministic top-10 (revenue desc, date,
    # orderkey) — the full tiebreak makes the LIMIT boundary exact
    "qx13_shipping_priority": """
        SELECT l.l_orderkey,
               o.o_orderdate,
               o.o_orderpriority,
               CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(18,2))
                      - CAST(l.l_discount AS DECIMAL(18,2))))
                   AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate < TIMESTAMP '1998-07-01'
          AND l.l_shipdate > TIMESTAMP '1998-07-01'
          AND o.o_custkey IN (SELECT c_custkey FROM customer
                              WHERE c_mktsegment = 'BUILDING')
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, o.o_orderdate ASC, l.l_orderkey ASC
        LIMIT 10
    """,
    # TPC-H Q5 shape: customer AND supplier in the same ASIA nation
    "qx14_local_supplier_volume": """
        SELECT n.n_name,
               CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(18,2))
                      - CAST(l.l_discount AS DECIMAL(18,2))))
                   AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY n.n_name
    """,
    # TPC-H Q10 shape: top-20 by returned revenue (custkey tiebreak),
    # dim columns joined after the cut — grouping by o_custkey alone is
    # equivalent to the classic (c_custkey, c_name, ...) grouping since
    # custkey determines the rest
    "qx15_returned_items": """
        SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name, t.revenue
        FROM (SELECT o.o_custkey,
                     CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(18,2))
                            - CAST(l.l_discount AS DECIMAL(18,2))))
                         AS DOUBLE) AS revenue
              FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              WHERE l.l_returnflag = 'R'
                AND o.o_orderdate >= TIMESTAMP '1997-07-01'
                AND o.o_orderdate <  TIMESTAMP '1997-10-01'
              GROUP BY o.o_custkey
              ORDER BY revenue DESC, o.o_custkey ASC
              LIMIT 20) t
        JOIN customer c ON c.c_custkey = t.o_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
    # TPC-H Q7 shape: cross-nation-pair shipping volume per year
    "qx16_volume_shipping": """
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
               CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(18,2))
                      - CAST(l.l_discount AS DECIMAL(18,2))))
                   AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE n1.n_name IN ('NATION_3', 'NATION_7')
          AND n2.n_name IN ('NATION_3', 'NATION_7')
          AND n1.n_name <> n2.n_name
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
    # TPC-H Q17 shape: the qty < 0.2·avg threshold recast integer-exact
    # as qty·5·count < sum (quantities are integral doubles, so both
    # engines compare identical exact values — see queries.py)
    "qx17_small_quantity_revenue": """
        SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                     AS DOUBLE) / 7.0, 6) AS avg_yearly
        FROM lineitem l
        JOIN (SELECT l_partkey,
                     sum(l_quantity) AS sq,
                     CAST(count(*) AS DOUBLE) AS cn
              FROM lineitem
              WHERE l_partkey IN (SELECT p_partkey FROM part
                                  WHERE p_brand = 'Brand#12')
              GROUP BY l_partkey) a
          ON l.l_partkey = a.l_partkey
         AND l.l_quantity * 5.0 * a.cn < a.sq
        WHERE l.l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_brand = 'Brand#12')
    """,
    # TPC-H Q21 shape (returnflag variant): only supplier returning on a
    # finalized multi-supplier order
    "qx18_lone_returned_supplier": """
        SELECT s.s_name,
               count(*) AS numwait
        FROM lineitem l1
        JOIN supplier s ON l1.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN orders o ON l1.l_orderkey = o.o_orderkey
        WHERE l1.l_returnflag = 'R'
          AND n.n_name = 'NATION_5'
          AND o.o_orderstatus = 'F'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name ASC
        LIMIT 10
    """,
    # TPC-H Q8 shape: NATION_1's share of AMERICA's PROMO revenue per year
    "qx19_market_share": """
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               round(
                 CAST(sum(CASE WHEN n1.n_name = 'NATION_1'
                               THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                                    * (CAST(1 AS DECIMAL(18,2))
                                       - CAST(l.l_discount AS DECIMAL(18,2)))
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2))
                           - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE),
                 6) AS mkt_share
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        JOIN region r ON n2.n_regionkey = r.r_regionkey
        WHERE l.l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_type = 'PROMO')
          AND r.r_name = 'AMERICA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY year(o.o_orderdate)
    """,
    # TPC-H Q18 shape: HAVING-threshold orders re-joined to detail
    "qx20_large_volume_orders": """
        SELECT c.c_custkey, c.c_name, o.o_orderkey,
               o.o_orderdate, o.o_totalprice, t.sum_qty
        FROM (SELECT l_orderkey,
                     CAST(sum(l_quantity) AS BIGINT) AS sum_qty
              FROM lineitem
              GROUP BY l_orderkey
              HAVING sum(l_quantity) > 300.0) t
        JOIN orders o ON t.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
        LIMIT 20
    """,
    # TPC-H Q22 shape: acctbal > global positive-balance average recast
    # multiplication-exact (bal·n > total in DECIMAL — no division at
    # the comparison on either engine), no orders since 2000
    "qx21_inactive_high_balance": """
        SELECT CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
               count(*) AS numcust,
               CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   AS totacctbal
        FROM customer c,
             (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS total,
                     count(*) AS n
              FROM customer
              WHERE CAST(c_acctbal AS DECIMAL(18,2))
                    > CAST(0 AS DECIMAL(18,2))) t
        WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * t.n > t.total
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c.c_nationkey
    """,
    # TPC-H Q2 shape: correlated scalar MIN over a 4-table offer tree
    # (no partsupp in the testdata — lineitem's observed prices are the
    # offer book), decorrelated as aggregate-then-rejoin on
    # (partkey, DECIMAL-exact min price)
    "qx22_min_cost_supplier": """
        WITH offers AS (
            SELECT l.l_partkey, l.l_suppkey,
                   CAST(l.l_extendedprice AS DECIMAL(18,2)) AS price
            FROM lineitem l
            WHERE l.l_partkey IN (SELECT p_partkey FROM part
                                  WHERE p_type = 'STANDARD'
                                    AND p_size BETWEEN 10 AND 20)
              AND l.l_suppkey IN (SELECT s_suppkey
                                  FROM supplier s
                                  JOIN nation n ON s.s_nationkey = n.n_nationkey
                                  JOIN region r ON n.n_regionkey = r.r_regionkey
                                  WHERE r.r_name = 'EUROPE')
        ),
        winners AS (
            SELECT DISTINCT o.l_partkey, o.l_suppkey, m.minp
            FROM offers o
            JOIN (SELECT l_partkey, min(price) AS minp
                  FROM offers GROUP BY l_partkey) m
              ON o.l_partkey = m.l_partkey AND o.price = m.minp
        )
        SELECT s.s_acctbal, s.s_name, n.n_name,
               CAST(w.l_partkey AS BIGINT) AS p_partkey, p.p_name,
               CAST(w.minp AS DOUBLE) AS min_price
        FROM winners w
        JOIN supplier s ON w.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN part p ON w.l_partkey = p.p_partkey
        ORDER BY s.s_acctbal DESC, s.s_name ASC, p_partkey ASC
        LIMIT 100
    """,
    # TPC-H Q19 shape: OR-of-three-AND-branches join predicate mixing
    # part and lineitem columns; one scalar revenue row
    "qx23_disjunctive_join": """
        SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(18,2))
                      - CAST(l.l_discount AS DECIMAL(18,2))))
                   AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_returnflag = 'N'
          AND ((p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 10
                AND l.l_quantity BETWEEN 1 AND 11)
            OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 20
                AND l.l_quantity BETWEEN 10 AND 20)
            OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 30
                AND l.l_quantity BETWEEN 20 AND 30))
    """,
    # TPC-H Q20 shape: nested semi chain gated by a per-(part,supp)
    # conditional-aggregate threshold (2·q97 > qtot, exact BIGINTs)
    "qx24_concentrated_pairs": """
        SELECT s.s_name, s.s_acctbal
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
          AND s.s_suppkey IN (
              SELECT l_suppkey FROM (
                  SELECT l_partkey, l_suppkey,
                         CAST(sum(CASE WHEN year(l_shipdate) = 1997
                                       THEN l_quantity ELSE 0 END)
                              AS BIGINT) AS q97,
                         CAST(sum(l_quantity) AS BIGINT) AS qtot
                  FROM lineitem
                  GROUP BY l_partkey, l_suppkey) t
              WHERE q97 > 0 AND 2 * q97 > qtot
                AND l_partkey IN (SELECT p_partkey FROM part
                                  WHERE p_name LIKE '%red%'))
        ORDER BY s.s_name
    """,
    # TPC-H Q9 shape: LIKE-cut profit tree, per-(nation, year); the
    # cost term comes from part (retailprice·quantity — no partsupp in
    # the testdata), arithmetic pure DECIMAL to the final double cast
    "qx25_profit_tree": """
        SELECT n.n_name,
               CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2))
                           - CAST(l.l_discount AS DECIMAL(18,2)))
                        - CAST(p.p_retailprice AS DECIMAL(18,2))
                          * CAST(l.l_quantity AS DECIMAL(18,2)))
                   AS DOUBLE) AS profit
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE p.p_name LIKE '%red%'
        GROUP BY n.n_name, year(o.o_orderdate)
        ORDER BY n.n_name ASC, o_year DESC
    """,
    # the FULL curation composition incl. near-dup: qx06's stages
    # (boilerplate rebuild, quality gate, min-id exact dedup) extended
    # with qx02's exact-Jaccard pairs at 0.5 over the curated text,
    # q15's recursive-CTE reachability, and q33's longest-then-min-id
    # keep-best — every byte of the surviving text hash-checked
    "qx26_curate_full": """
        WITH RECURSIVE
        passages AS (
            SELECT doc_id, i AS pos,
                   array_to_string(t[(i*10+1):(i*10+10)], ' ') AS passage
            FROM (SELECT doc_id, t,
                         unnest(range(0,
                             CAST(floor((len(t)-1)/10.0) AS BIGINT) + 1)) AS i
                  FROM (SELECT doc_id, string_split(lower(text), ' ') AS t
                        FROM documents))
        ),
        clean AS (SELECT doc_id, pos, passage FROM passages
                  WHERE passage <> ''),
        hot AS (
            SELECT passage
            FROM (SELECT passage, count(DISTINCT doc_id) AS dfq
                  FROM clean GROUP BY 1)
            WHERE dfq > 2
        ),
        rebuilt AS (
            SELECT doc_id,
                   string_agg(passage, ' ' ORDER BY pos) AS rt
            FROM clean
            WHERE passage NOT IN (SELECT passage FROM hot)
            GROUP BY doc_id
        ),
        gated AS (
            SELECT doc_id, rt
            FROM (SELECT doc_id, rt,
                         string_split(lower(rt), ' ') AS toks
                  FROM rebuilt)
            WHERE len(toks) >= 10
              AND round(CAST(len(regexp_extract_all(rt, '[^A-Za-z0-9\\s]'))
                        AS DOUBLE) / length(rt), 6) < 0.25
              AND round(CAST(len(list_filter(toks, t -> list_contains(
                        ['the','and','of','to','in','is','that','with','for','on'],
                        t))) AS DOUBLE) / len(toks), 6) > 0.015
        ),
        exact AS (
            SELECT doc_id, rt FROM (
                SELECT doc_id, rt,
                       row_number() OVER (PARTITION BY md5(rt)
                                          ORDER BY doc_id) AS rn
                FROM gated)
            WHERE rn = 1
        ),
        sh AS (
            SELECT doc_id,
                   list_distinct(CASE WHEN len(toks) >= 5
                       THEN list_transform(range(1, len(toks) - 3),
                            i -> concat_ws(' ', toks[i], toks[i+1],
                                           toks[i+2], toks[i+3], toks[i+4]))
                       ELSE [array_to_string(toks, ' ')] END) AS ts
            FROM (SELECT doc_id, string_split(rt, ' ') AS toks FROM exact)
        ),
        pairs AS (
            SELECT a.doc_id AS da, b.doc_id AS db
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
                  / (len(a.ts) + len(b.ts)
                     - len(list_intersect(a.ts, b.ts))) >= 0.5
        ),
        edges AS (
            SELECT da AS a, db AS b FROM pairs
            UNION ALL
            SELECT db AS a, da AS b FROM pairs
        ),
        nodes AS (SELECT DISTINCT a AS id FROM edges),
        reach(id, r) AS (
            SELECT id, id FROM nodes
            UNION
            SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id
        ),
        comp AS (SELECT id AS doc_id, min(r) AS component
                 FROM reach GROUP BY id),
        best AS (
            SELECT doc_id FROM (
                SELECT c.doc_id,
                       row_number() OVER (
                           PARTITION BY c.component
                           ORDER BY length(e.rt) DESC, c.doc_id ASC
                       ) AS rn
                FROM comp c JOIN exact e USING (doc_id))
            WHERE rn = 1
        )
        SELECT e.doc_id, md5(e.rt) AS digest
        FROM exact e
        LEFT JOIN comp c USING (doc_id)
        WHERE c.doc_id IS NULL
           OR e.doc_id IN (SELECT doc_id FROM best)
    """,
    # exact edit-distance join, quadratic ground truth on the brand
    # cut (the engine's q-gram/length blocking is complete by the
    # count bound, so the pair sets match exactly; distances are
    # classic Levenshtein integers in both engines)
    "qx27_editdist_pairs": """
        SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
               CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        FROM part a JOIN part b ON a.p_partkey < b.p_partkey
        WHERE a.p_brand = 'Brand#11' AND b.p_brand = 'Brand#11'
          AND abs(length(a.p_name) - length(b.p_name)) <= 2
          AND levenshtein(a.p_name, b.p_name) <= 2
    """,
    # BM25 (Lucene idf; k1=1.2, b=0.75) from exact tf/df/dl counts;
    # ranking + cut on the ROUNDED score with doc_id tiebreak, so the
    # top-k boundary is engine-deterministic
    "qx28_bm25_topk": """
        WITH toks AS (
            SELECT doc_id, string_split(lower(text), ' ') AS tk
            FROM documents
        ),
        hits AS (
            SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl,
                   unnest(list_filter(tk,
                       t -> t IN ('vector', 'stream', 'query'))) AS term
            FROM toks
        ),
        tf AS (
            SELECT doc_id, dl, term, count(*) AS c
            FROM hits GROUP BY 1, 2, 3
        ),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        stats AS (
            SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                   CAST(sum(CAST(len(string_split(lower(text), ' '))
                                 AS BIGINT)) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS avgdl
            FROM documents
        )
        SELECT doc_id,
               round(sum(
                   ln((n_docs - CAST(df AS DOUBLE) + 0.5)
                      / (CAST(df AS DOUBLE) + 0.5) + 1.0)
                   * CAST(c AS DOUBLE)
                   / (CAST(c AS DOUBLE)
                      + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
               ), 6) AS score
        FROM tf JOIN dfreq USING (term) CROSS JOIN stats
        GROUP BY doc_id
        ORDER BY score DESC, doc_id
        LIMIT 15
    """,
    # 3 damped power iterations unrolled as CTE levels over the
    # bipartite both-directions edge list (every node has an out-edge,
    # so deg is the node set and no dangling mass exists); the final
    # score is N-normalized and the cut is rounded-score + node
    "qx29_pagerank": """
        WITH pair AS (
            SELECT DISTINCT o_custkey AS c, l_suppkey AS s
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        ),
        e AS (
            SELECT c * 2 AS src, s * 2 + 1 AS dst FROM pair
            UNION ALL
            SELECT s * 2 + 1 AS src, c * 2 AS dst FROM pair
        ),
        deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
        p0 AS (
            SELECT src AS node, 1.0 / (SELECT n FROM nn) AS p FROM deg
        ),
        p1 AS (
            SELECT e.dst AS node,
                   (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
                       / (SELECT n FROM nn)
                   + CAST(0.85 AS DOUBLE) * sum(p0.p / deg.d) AS p
            FROM e JOIN p0 ON p0.node = e.src
                   JOIN deg ON deg.src = e.src
            GROUP BY e.dst
        ),
        p2 AS (
            SELECT e.dst AS node,
                   (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
                       / (SELECT n FROM nn)
                   + CAST(0.85 AS DOUBLE) * sum(p1.p / deg.d) AS p
            FROM e JOIN p1 ON p1.node = e.src
                   JOIN deg ON deg.src = e.src
            GROUP BY e.dst
        ),
        p3 AS (
            SELECT e.dst AS node,
                   (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
                       / (SELECT n FROM nn)
                   + CAST(0.85 AS DOUBLE) * sum(p2.p / deg.d) AS p
            FROM e JOIN p2 ON p2.node = e.src
                   JOIN deg ON deg.src = e.src
            GROUP BY e.dst
        )
        SELECT node, round(p * (SELECT n FROM nn), 6) AS pr_n
        FROM p3
        ORDER BY pr_n DESC, node
        LIMIT 20
    """,
    # q91's dense axis with LINEAR interpolation on interior gaps;
    # endpoints observed by construction, money through DECIMAL before
    # the double lerp, integer day distances exact
    "qx30_interpolate": """
        WITH daily AS (
            SELECT user_id, epoch_us(ts) // 86400000000 AS d,
                   sum(CAST(value AS DECIMAL(18,2))) AS v
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1, 2
        ), span AS (
            SELECT user_id, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY 1
        ), axis AS (
            SELECT user_id, unnest(range(d0, d1 + 1)) AS d FROM span
        ), j AS (
            SELECT a.user_id, a.d,
                   dd.v IS NOT NULL AS observed,
                   CAST(dd.v AS DOUBLE) AS vd,
                   CASE WHEN dd.v IS NOT NULL THEN a.d END AS od
            FROM axis a
            LEFT JOIN daily dd ON a.user_id = dd.user_id AND a.d = dd.d
        ), anch AS (
            SELECT user_id, d, observed, vd,
                   last_value(od IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS pd,
                   last_value(vd IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS pv,
                   first_value(od IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY d
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                   ) AS nd,
                   first_value(vd IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY d
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                   ) AS nv
            FROM j
        )
        SELECT user_id, d, observed,
               round(CASE WHEN observed THEN vd
                     ELSE pv + (nv - pv)
                          * (CAST(d - pd AS DOUBLE)
                             / CAST(nd - pd AS DOUBLE)) END, 6) AS v_lerp
        FROM anch
    """,
    # SCD2 state intervals from the change log: lag change flag,
    # running-sum run ids, lead closing edge — the internal windowed
    # sum stays internal (never output, so the HUGEINT hazard is moot)
    "qx32_scd2_intervals": """
        WITH flagged AS (
            SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
                   CASE WHEN lag(event_type) OVER w IS NULL
                          OR event_type <> lag(event_type) OVER w
                        THEN 1 ELSE 0 END AS chg
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ),
        runs AS (
            SELECT user_id, event_type, us,
                   sum(chg) OVER (
                       PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS run
            FROM flagged
        ),
        iv AS (
            SELECT user_id, run, event_type,
                   min(us) AS valid_from_us,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM runs GROUP BY 1, 2, 3
        )
        SELECT user_id, event_type AS state, valid_from_us,
               lead(valid_from_us) OVER (
                   PARTITION BY user_id ORDER BY run) AS valid_to_us,
               n_events
        FROM iv
    """,
    # triangle count over q32's near-dup pair graph: the oracle
    # enumerates id-ordered (a<b<c) closed wedges — the engine's
    # degree-ordered orientation changes the plan, never the count
    "qx33_triangle_count": """
        WITH s AS (
            SELECT doc_id,
                   list_distinct(
                       CASE WHEN len(toks) >= 3
                            THEN list_transform(range(1, len(toks) - 1),
                                 i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
                            ELSE [array_to_string(toks, ' ')] END) AS sh
            FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
                  FROM documents WHERE doc_id < 40)
        ),
        e AS (
            SELECT a.doc_id AS a, b.doc_id AS b
            FROM s a JOIN s b ON a.doc_id < b.doc_id
            WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                  / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
                  6) >= 0.001
        ),
        nodes AS (
            SELECT count(DISTINCT v) AS n FROM (
                SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
        )
        SELECT CAST((SELECT n FROM nodes) AS BIGINT) AS n_nodes,
               CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
               CAST((SELECT count(*)
                     FROM e ab JOIN e bc ON ab.b = bc.a
                     JOIN e ac ON ac.a = ab.a AND ac.b = bc.b)
                    AS BIGINT) AS n_triangles
    """,
    # first-order Markov transition matrix: lead() pairs under the
    # µs+id order, exact counts, one double division per cell
    "qx34_markov_transitions": """
        WITH pairs AS (
            SELECT event_type AS from_state,
                   lead(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id) AS to_state
            FROM events
        ),
        n AS (
            SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n
            FROM pairs WHERE to_state IS NOT NULL GROUP BY 1, 2
        ),
        tot AS (
            SELECT from_state, CAST(sum(n) AS BIGINT) AS t
            FROM n GROUP BY 1
        )
        SELECT from_state, to_state, n,
               round(CAST(n AS DOUBLE) / CAST(t AS DOUBLE), 6) AS p
        FROM n JOIN tot USING (from_state)
    """,
    # trailing-7-row OLS slope from exact integer moments (cents y,
    # day-index x): every windowed sum CAST back to BIGINT (HUGEINT
    # discipline), one double division of exactly-agreed integers
    "qx35_rolling_slope": """
        WITH daily AS (
            SELECT user_id, epoch_us(ts) // 86400000000 AS d,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS y
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1, 2
        ),
        m AS (
            SELECT user_id, d,
                   CAST(count(*) OVER w AS BIGINT) AS n_window,
                   CAST(sum(d) OVER w AS BIGINT) AS sx,
                   CAST(sum(y) OVER w AS BIGINT) AS sy,
                   CAST(sum(d * y) OVER w AS BIGINT) AS sxy,
                   CAST(sum(d * d) OVER w AS BIGINT) AS sxx
            FROM daily
            WINDOW w AS (PARTITION BY user_id ORDER BY d
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        )
        SELECT user_id, d, n_window,
               round(CASE WHEN n_window > 1 THEN
                   CAST(n_window * sxy - sx * sy AS DOUBLE)
                   / CAST(n_window * sxx - sx * sx AS DOUBLE) END, 6)
                   AS slope_cents_per_day
        FROM m
    """,
    # month-over-month revenue growth: lag on the POST-aggregate
    # calendar-sized frame; ratio as one double division of exact
    # decimal sums
    "qx36_revenue_growth": """
        WITH monthly AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
                   sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
            FROM orders GROUP BY 1
        )
        SELECT m, CAST(rev AS DOUBLE) AS revenue,
               round(CAST(rev AS DOUBLE)
                     / CAST(lag(rev) OVER (ORDER BY m) AS DOUBLE)
                     - 1.0, 6) AS growth
        FROM monthly
    """,
    # first-view -> first-purchase latency per converted user: one
    # conditional-min pass, exact integer microseconds
    "qx37_time_to_convert": """
        WITH firsts AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view'
                            THEN epoch_us(ts) END) AS v,
                   min(CASE WHEN event_type = 'purchase'
                            THEN epoch_us(ts) END) AS p
            FROM events GROUP BY 1
        )
        SELECT user_id, CAST(p - v AS BIGINT) AS delta_us
        FROM firsts
        WHERE v IS NOT NULL AND p IS NOT NULL AND p >= v
    """,
    # per-group Efraimidis–Spirakis sample: q82's md5-uniform priority
    # ranked within each language, rounded before ranking, id tiebreak
    "qx38_group_weighted_sample": """
        SELECT lang, doc_id, rk, priority FROM (
            SELECT lang, doc_id,
                   CAST(row_number() OVER (
                       PARTITION BY lang
                       ORDER BY priority DESC, doc_id) AS BIGINT) AS rk,
                   priority
            FROM (
                SELECT lang, doc_id,
                       round(pow(
                           (CAST(concat('0x',
                                substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                                 AS BIGINT) + 0.5) / 4294967296.0,
                           1.0 / n_chars), 9) AS priority
                FROM documents WHERE n_chars > 0
            )
        )
        WHERE rk <= 3
    """,
    # add-one-smoothed bigram LM from exact integer counts; the two
    # parallel unnests zip positionally (DuckDB's multi-unnest)
    "qx39_bigram_logprob": """
        WITH base AS (
            SELECT doc_id, string_split(lower(text), ' ') AS tk
            FROM documents
        ),
        tok AS (SELECT doc_id, unnest(tk) AS term FROM base),
        big AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(tk)),
                                         i -> tk[i])) AS a,
                   unnest(list_transform(range(1, len(tk)),
                                         i -> tk[i + 1])) AS b
            FROM base WHERE len(tk) >= 2
        ),
        dtf AS (
            SELECT doc_id, a, b, count(*) AS c FROM big GROUP BY 1, 2, 3
        ),
        cab AS (SELECT a, b, sum(c) AS cab FROM dtf GROUP BY 1, 2),
        ca AS (SELECT a, sum(cab) AS ca FROM cab GROUP BY 1),
        v AS (SELECT CAST(count(DISTINCT term) AS DOUBLE) AS v FROM tok)
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
               round(-sum(CAST(c AS DOUBLE)
                          * ln((CAST(cab AS DOUBLE) + 1.0)
                               / (CAST(ca AS DOUBLE) + v)))
                     / CAST(sum(c) AS DOUBLE), 6) AS nll
        FROM dtf JOIN cab USING (a, b) JOIN ca USING (a) CROSS JOIN v
        GROUP BY doc_id
    """,
    # MAD outliers: two exact medians (quantile_cont == the engine's
    # rank-based interpolation), cut on the ROUNDED ratio so the 3-MAD
    # boundary cannot flip on an interpolation ulp
    "qx40_mad_outliers": """
        WITH x AS (
            SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS x
            FROM documents
        ),
        med AS (
            SELECT source, quantile_cont(x, 0.5) AS med FROM x GROUP BY 1
        ),
        dev AS (
            SELECT doc_id, source, x, abs(x - med) AS d
            FROM x JOIN med USING (source)
        ),
        mad AS (
            SELECT source, quantile_cont(d, 0.5) AS mad FROM dev GROUP BY 1
        )
        SELECT source, doc_id, CAST(x AS BIGINT) AS n_chars,
               round(d / mad, 6) AS dev_ratio
        FROM dev JOIN mad USING (source)
        WHERE mad > 0 AND round(d / mad, 6) > 3.0
    """,
    # PMI over the lang x source contingency table from exact BIGINT
    # counts; one identical double expression per cell
    "qx31_pmi_matrix": """
        WITH cells AS (
            SELECT lang, source, CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY 1, 2
        ),
        ml AS (SELECT lang, count(*) AS cl FROM documents GROUP BY 1),
        ms AS (SELECT source, count(*) AS cs FROM documents GROUP BY 1),
        nt AS (SELECT CAST(count(*) AS DOUBLE) AS n_tot FROM documents)
        SELECT lang, source, n,
               round(ln(CAST(n AS DOUBLE) * n_tot
                        / (CAST(cl AS DOUBLE) * CAST(cs AS DOUBLE))), 6)
                   AS pmi
        FROM cells JOIN ml USING (lang) JOIN ms USING (source)
        CROSS JOIN nt
    """,
    # Misra-Gries heavy hitters rebuilt verbatim: exact counts, rank
    # under (count DESC, md5(key) ASC), t = the (k+1)-th counter
    # (k = 8), survivors keep c - t with c > t — pure deterministic
    # integer arithmetic, bit-for-bit (the qx00/qx03/qx05 discipline)
    "qx41_heavy_hitters": """
        WITH counts AS (
            -- round-12 advice: topk_sketch EXCLUDES NULL input keys at
            -- build (a NULL heavy hitter is indistinguishable from the
            -- merge sentinel); the oracle must mirror that, not rely
            -- on the fixture having no NULL user_ids
            SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS c
            FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2
        ), ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY event_type
                ORDER BY c DESC, md5(CAST(user_id AS VARCHAR))) AS rk
            FROM counts
        ), t AS (
            SELECT event_type,
                   coalesce(max(CASE WHEN rk = 9 THEN c END), 0) AS t
            FROM ranked GROUP BY event_type
        )
        SELECT r.event_type, r.user_id,
               CAST(r.c - t.t AS BIGINT) AS c_low,
               CAST(t.t AS BIGINT) AS err
        FROM ranked r JOIN t USING (event_type)
        WHERE r.rk <= 8 AND r.c > t.t
    """,
    # TPC-DS Q67 class: window over the ROLLUP aggregate; ranking
    # compares the exact decimal revenue, the double cast is output-
    # boundary only; NULLS FIRST spelled out (DuckDB defaults ASC
    # NULLS LAST where Spark asc is nulls-first)
    "qx42_rank_over_rollup": """
        WITH base AS (
            SELECT n.n_name,
                   CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT)
                       AS o_year,
                   CAST(EXTRACT(month FROM o.o_orderdate) AS BIGINT)
                       AS o_month,
                   CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * (CAST(1 AS DECIMAL(18,2))
                          - CAST(l.l_discount AS DECIMAL(18,2))) AS dp
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
        ), roll AS (
            SELECT n_name, o_year, o_month, sum(dp) AS rev,
                   CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
                   CAST(GROUPING(o_year) AS BIGINT) AS g_year,
                   CAST(GROUPING(o_month) AS BIGINT) AS g_month
            FROM base GROUP BY ROLLUP(n_name, o_year, o_month)
        ), rk AS (
            SELECT *, row_number() OVER (
                PARTITION BY n_name
                ORDER BY rev DESC, g_year ASC, g_month ASC,
                         o_year ASC NULLS FIRST,
                         o_month ASC NULLS FIRST) AS rnk
            FROM roll
        )
        SELECT n_name, o_year, o_month, g_nation, g_year, g_month,
               CAST(rev AS DOUBLE) AS revenue, CAST(rnk AS BIGINT) AS rnk
        FROM rk WHERE rnk <= 5
    """,
    # TPC-DS Q14/Q38 class: 3-channel INTERSECT of distinct key sets +
    # scalar-average gate in EXACT arithmetic (tot*n > sum — a float
    # average would flip boundary users on addition order)
    "qx43_channel_intersect": """
        WITH inter AS (
            SELECT user_id FROM events WHERE event_type = 'click'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'view'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'purchase'
        ), per_user AS (
            SELECT user_id, sum(CAST(value AS DECIMAL(18,2))) AS tot
            FROM events WHERE event_type = 'purchase' GROUP BY user_id
        ), gate AS (
            SELECT sum(tot) AS sum_all, count(*) AS n_all FROM per_user
        )
        SELECT p.user_id, CAST(p.tot AS DOUBLE) AS purchase_total
        FROM per_user p, gate g
        WHERE p.user_id IN (SELECT user_id FROM inter)
          AND p.tot * g.n_all > g.sum_all
    """,
    # TPC-DS Q64 class: the shared per-customer-per-year profile
    # consumed twice in one statement; doubling gate in exact decimal
    "qx44_shared_pipeline_selfjoin": """
        WITH prof AS (
            SELECT o.o_custkey AS c_custkey, n.n_name,
                   CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT)
                       AS o_year,
                   sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * (CAST(1 AS DECIMAL(18,2))
                          - CAST(l.l_discount AS DECIMAL(18,2)))) AS rev,
                   CAST(count(DISTINCT o.o_orderkey) AS BIGINT)
                       AS n_orders
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2, 3
        )
        SELECT a.c_custkey, a.n_name, a.o_year AS year_a,
               CAST(a.rev AS DOUBLE) AS rev_a,
               CAST(b.rev AS DOUBLE) AS rev_b,
               a.n_orders AS orders_a, b.n_orders AS orders_b
        FROM prof a JOIN prof b
          ON a.c_custkey = b.c_custkey AND b.o_year = a.o_year + 1
        WHERE b.rev > CAST(2 AS DECIMAL(18,2)) * a.rev
    """,
    # EWMA-16 with dyadic weights: every term, partial sum and the
    # quotient are EXACT doubles folded in one fixed order (see the
    # query docstring) -- bit-identical cross-engine, stronger than the
    # r6 sum-order argument; cents sum CAST back to BIGINT (HUGEINT rule)
    "qx45_ewma_smooth": """
        WITH daily AS (
            SELECT user_id, epoch_us(ts) // 86400000000 AS d,
                   CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS cents
            FROM events GROUP BY 1, 2
        ), lagged AS (
            SELECT user_id, d, cents,
                   lag(cents, 0) OVER (PARTITION BY user_id ORDER BY d) AS l0,
                   lag(cents, 1) OVER (PARTITION BY user_id ORDER BY d) AS l1,
                   lag(cents, 2) OVER (PARTITION BY user_id ORDER BY d) AS l2,
                   lag(cents, 3) OVER (PARTITION BY user_id ORDER BY d) AS l3,
                   lag(cents, 4) OVER (PARTITION BY user_id ORDER BY d) AS l4,
                   lag(cents, 5) OVER (PARTITION BY user_id ORDER BY d) AS l5,
                   lag(cents, 6) OVER (PARTITION BY user_id ORDER BY d) AS l6,
                   lag(cents, 7) OVER (PARTITION BY user_id ORDER BY d) AS l7,
                   lag(cents, 8) OVER (PARTITION BY user_id ORDER BY d) AS l8,
                   lag(cents, 9) OVER (PARTITION BY user_id ORDER BY d) AS l9,
                   lag(cents, 10) OVER (PARTITION BY user_id ORDER BY d) AS l10,
                   lag(cents, 11) OVER (PARTITION BY user_id ORDER BY d) AS l11,
                   lag(cents, 12) OVER (PARTITION BY user_id ORDER BY d) AS l12,
                   lag(cents, 13) OVER (PARTITION BY user_id ORDER BY d) AS l13,
                   lag(cents, 14) OVER (PARTITION BY user_id ORDER BY d) AS l14,
                   lag(cents, 15) OVER (PARTITION BY user_id ORDER BY d) AS l15
            FROM daily
        )
        SELECT user_id, d, cents AS day_cents,
               round((coalesce(CAST(l0 AS DOUBLE), 0.0) * CAST(1.0 AS DOUBLE)
                 + coalesce(CAST(l1 AS DOUBLE), 0.0) * CAST(0.5 AS DOUBLE)
                 + coalesce(CAST(l2 AS DOUBLE), 0.0) * CAST(0.25 AS DOUBLE)
                 + coalesce(CAST(l3 AS DOUBLE), 0.0) * CAST(0.125 AS DOUBLE)
                 + coalesce(CAST(l4 AS DOUBLE), 0.0) * CAST(0.0625 AS DOUBLE)
                 + coalesce(CAST(l5 AS DOUBLE), 0.0) * CAST(0.03125 AS DOUBLE)
                 + coalesce(CAST(l6 AS DOUBLE), 0.0) * CAST(0.015625 AS DOUBLE)
                 + coalesce(CAST(l7 AS DOUBLE), 0.0) * CAST(0.0078125 AS DOUBLE)
                 + coalesce(CAST(l8 AS DOUBLE), 0.0) * CAST(0.00390625 AS DOUBLE)
                 + coalesce(CAST(l9 AS DOUBLE), 0.0) * CAST(0.001953125 AS DOUBLE)
                 + coalesce(CAST(l10 AS DOUBLE), 0.0) * CAST(0.0009765625 AS DOUBLE)
                 + coalesce(CAST(l11 AS DOUBLE), 0.0) * CAST(0.00048828125 AS DOUBLE)
                 + coalesce(CAST(l12 AS DOUBLE), 0.0) * CAST(0.000244140625 AS DOUBLE)
                 + coalesce(CAST(l13 AS DOUBLE), 0.0) * CAST(0.0001220703125 AS DOUBLE)
                 + coalesce(CAST(l14 AS DOUBLE), 0.0) * CAST(6.103515625e-05 AS DOUBLE)
                 + coalesce(CAST(l15 AS DOUBLE), 0.0) * CAST(3.0517578125e-05 AS DOUBLE))
                 / (CASE WHEN l0 IS NULL THEN 0.0 ELSE CAST(1.0 AS DOUBLE) END
                 + CASE WHEN l1 IS NULL THEN 0.0 ELSE CAST(0.5 AS DOUBLE) END
                 + CASE WHEN l2 IS NULL THEN 0.0 ELSE CAST(0.25 AS DOUBLE) END
                 + CASE WHEN l3 IS NULL THEN 0.0 ELSE CAST(0.125 AS DOUBLE) END
                 + CASE WHEN l4 IS NULL THEN 0.0 ELSE CAST(0.0625 AS DOUBLE) END
                 + CASE WHEN l5 IS NULL THEN 0.0 ELSE CAST(0.03125 AS DOUBLE) END
                 + CASE WHEN l6 IS NULL THEN 0.0 ELSE CAST(0.015625 AS DOUBLE) END
                 + CASE WHEN l7 IS NULL THEN 0.0 ELSE CAST(0.0078125 AS DOUBLE) END
                 + CASE WHEN l8 IS NULL THEN 0.0 ELSE CAST(0.00390625 AS DOUBLE) END
                 + CASE WHEN l9 IS NULL THEN 0.0 ELSE CAST(0.001953125 AS DOUBLE) END
                 + CASE WHEN l10 IS NULL THEN 0.0 ELSE CAST(0.0009765625 AS DOUBLE) END
                 + CASE WHEN l11 IS NULL THEN 0.0 ELSE CAST(0.00048828125 AS DOUBLE) END
                 + CASE WHEN l12 IS NULL THEN 0.0 ELSE CAST(0.000244140625 AS DOUBLE) END
                 + CASE WHEN l13 IS NULL THEN 0.0 ELSE CAST(0.0001220703125 AS DOUBLE) END
                 + CASE WHEN l14 IS NULL THEN 0.0 ELSE CAST(6.103515625e-05 AS DOUBLE) END
                 + CASE WHEN l15 IS NULL THEN 0.0 ELSE CAST(3.0517578125e-05 AS DOUBLE) END)
                 / CAST(100 AS DOUBLE), 6) AS ewma
        FROM lagged
    """,
    # bitwise aggregates: exact integer, associative+commutative --
    # deterministic with no ordering argument
    "qx46_bitmask_rollup": """
        WITH m AS (
            SELECT user_id, event_id,
                   CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
                        WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
                        WHEN 'error' THEN 16 ELSE 32 END AS mask
            FROM events
        )
        SELECT user_id,
               CAST(bit_or(mask) AS BIGINT) AS type_mask,
               CAST(bit_count(bit_or(mask)) AS BIGINT) AS n_types,
               bit_and(mask) <> 0 AS single_type,
               CAST(bit_xor(event_id) AS BIGINT) AS id_parity,
               CAST(count(*) AS BIGINT) AS n_events
        FROM m GROUP BY user_id
    """,
    # listagg under the exact (us, id) total order + boolean aggs --
    # strings and booleans exact, no float anywhere
    "qx47_seq_listagg": """
        SELECT user_id,
               string_agg(event_type, '>'
                          ORDER BY epoch_us(ts), event_id) AS journey,
               bool_or(event_type = 'purchase') AS any_purchase,
               bool_and(value IS NOT NULL) AS all_valued,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY user_id
    """,
    # bounded-depth BFS min-hops: the suite's first RECURSIVE-CTE
    # oracle.  UNION (deduplicating) recursion mirrors the Spark
    # side's per-level distinct — UNION ALL would enumerate paths
    "qx48_bfs_reach": """
        WITH RECURSIVE pair AS (
            SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ), edges AS (
            SELECT c * 2 AS src, s * 2 + 1 AS dst FROM pair
            UNION ALL
            SELECT s * 2 + 1 AS src, c * 2 AS dst FROM pair
        ), reach(node, hops) AS (
            SELECT c_custkey * 2, 0 FROM customer WHERE c_nationkey = 1
            UNION
            SELECT e.dst, r.hops + 1
            FROM reach r JOIN edges e ON e.src = r.node
            WHERE r.hops < 3
        )
        SELECT node, CAST(min(hops) AS BIGINT) AS hops
        FROM reach GROUP BY node
    """,
    # relational division, data-driven divisor: per-user distinct-type
    # count equals the corpus-wide distinct-type count.  Exact integer
    # gate; decimal purchase totals; double only at the boundary
    "qx49_division": """
        WITH per AS (
            SELECT user_id,
                   count(DISTINCT event_type) AS nt,
                   CAST(count(*) AS BIGINT) AS n_events,
                   sum(CASE WHEN event_type = 'purchase'
                            THEN CAST(value AS DECIMAL(18,2))
                            ELSE CAST(0 AS DECIMAL(18,2)) END) AS tot
            FROM events GROUP BY user_id
        ), d AS (
            SELECT count(DISTINCT event_type) AS nd FROM events
        )
        SELECT p.user_id, p.n_events,
               CAST(p.tot AS DOUBLE) AS purchase_total
        FROM per p, d WHERE p.nt = d.nd
    """,
    # chi-square independence: terms from exact BIGINT counts with a
    # FIXED double op order (products < 2^53 where exactness matters),
    # per-term round(9), associative DECIMAL sum, final round(6)
    "qx50_chisq_independence": """
        WITH cells AS (
            SELECT lang, source, CAST(count(*) AS BIGINT) AS c
            FROM documents GROUP BY lang, source
        ), rmar AS (
            SELECT lang, sum(c) AS r FROM cells GROUP BY lang
        ), cmar AS (
            SELECT source, sum(c) AS k FROM cells GROUP BY source
        ), tot AS (
            SELECT sum(c) AS n,
                   CAST((count(DISTINCT lang) - 1)
                        * (count(DISTINCT source) - 1) AS BIGINT) AS dof
            FROM cells
        )
        SELECT round(CAST(sum(CAST(round(
                   (CAST(t.n AS DOUBLE) * ce.c - CAST(rm.r AS DOUBLE) * cm.k)
                   * (CAST(t.n AS DOUBLE) * ce.c - CAST(rm.r AS DOUBLE) * cm.k)
                   / (CAST(t.n AS DOUBLE) * CAST(rm.r AS DOUBLE) * CAST(cm.k AS DOUBLE)),
                   9) AS DECIMAL(28,9))) AS DOUBLE), 6) AS chi2,
               t.dof AS dof, CAST(t.n AS BIGINT) AS n
        FROM cells ce
        JOIN rmar rm ON ce.lang = rm.lang
        JOIN cmar cm ON ce.source = cm.source
        CROSS JOIN tot t
        GROUP BY t.dof, t.n
    """,
    # time-weighted average: exact µs segment durations (lead over the
    # (µs, event_id) total order), DECIMAL value·duration products,
    # one deterministic double division at the end
    "qx51_twap": """
        WITH seg AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   CAST(value AS DECIMAL(18,2)) AS v,
                   lead(epoch_us(ts)) OVER (
                       PARTITION BY user_id, CAST(ts AS DATE)
                       ORDER BY epoch_us(ts), event_id
                   ) - epoch_us(ts) AS dus
            FROM events WHERE value IS NOT NULL
        )
        SELECT user_id, day,
               CAST(count(*) AS BIGINT) AS n_segments,
               round(CAST(sum(v * dus) AS DOUBLE) / sum(dus), 6) AS twap
        FROM seg WHERE dus IS NOT NULL
        GROUP BY user_id, day
    """,
    # one-row-per-column profile: exact counts; numeric min/max as
    # rounded doubles; string/timestamp min/max intentionally absent
    # (cross-engine formatting is parity quicksand)
    "qx52_column_profile": """
        WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM lineitem)
        SELECT p.*, n.n_rows FROM n, (
          SELECT 'l_orderkey' AS "column",
                 CAST(count(*) FILTER (l_orderkey IS NULL) AS BIGINT)
                     AS n_null,
                 CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_distinct,
                 round(CAST(min(l_orderkey) AS DOUBLE), 6) AS min_num,
                 round(CAST(max(l_orderkey) AS DOUBLE), 6) AS max_num
          FROM lineitem
          UNION ALL
          SELECT 'l_quantity',
                 CAST(count(*) FILTER (l_quantity IS NULL) AS BIGINT),
                 CAST(count(DISTINCT l_quantity) AS BIGINT),
                 round(CAST(min(l_quantity) AS DOUBLE), 6),
                 round(CAST(max(l_quantity) AS DOUBLE), 6)
          FROM lineitem
          UNION ALL
          SELECT 'l_returnflag',
                 CAST(count(*) FILTER (l_returnflag IS NULL) AS BIGINT),
                 CAST(count(DISTINCT l_returnflag) AS BIGINT),
                 CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
          FROM lineitem
          UNION ALL
          SELECT 'l_shipdate',
                 CAST(count(*) FILTER (l_shipdate IS NULL) AS BIGINT),
                 CAST(count(DISTINCT l_shipdate) AS BIGINT),
                 CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
          FROM lineitem
        ) p
    """,
    # Deequ-class constraint report: exact violation counts per rule
    "qx53_data_quality": """
        SELECT 'l_orderkey_not_null' AS "constraint",
               CAST(count(*) FILTER (l_orderkey IS NULL) AS BIGINT)
                   AS n_violations,
               count(*) FILTER (l_orderkey IS NULL) = 0 AS passed
        FROM lineitem
        UNION ALL
        SELECT 'l_quantity_in_1_50',
               CAST(count(*) FILTER (l_quantity IS NULL OR l_quantity < 1
                                     OR l_quantity > 50) AS BIGINT),
               count(*) FILTER (l_quantity IS NULL OR l_quantity < 1
                                OR l_quantity > 50) = 0
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice_positive',
               CAST(count(*) FILTER (l_extendedprice <= 0) AS BIGINT),
               count(*) FILTER (l_extendedprice <= 0) = 0
        FROM lineitem
        UNION ALL
        SELECT 'orderkey_linenumber_unique',
               CAST(coalesce(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END), 0)
                    AS BIGINT),
               coalesce(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END), 0) = 0
        FROM (SELECT count(*) AS n FROM lineitem
              GROUP BY l_orderkey, l_linenumber)
        UNION ALL
        SELECT 'l_orderkey_fk_orders',
               CAST(count(*) AS BIGINT),
               count(*) = 0
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IS NULL
    """,
    # TPC-DS Q51: full-outer alignment of two cumulative series,
    # running-max forward fill, crossover predicate in exact DECIMAL
    "qx54_cumulative_crossover": """
        WITH b AS (
            SELECT user_id, epoch_us(ts) // 86400000000 AS d,
                   sum(CAST(value AS DECIMAL(18,2))) AS v
            FROM events
            WHERE event_type = 'purchase' AND user_id IS NOT NULL
            GROUP BY 1, 2
        ), cb AS (
            SELECT user_id, d, sum(v) OVER (
                PARTITION BY user_id ORDER BY d
                ROWS UNBOUNDED PRECEDING) AS cum
            FROM b
        ), c AS (
            SELECT user_id, epoch_us(ts) // 86400000000 AS d,
                   sum(CAST(value AS DECIMAL(18,2))) AS v
            FROM events
            WHERE event_type = 'click' AND user_id IS NOT NULL
            GROUP BY 1, 2
        ), cc AS (
            SELECT user_id, d, sum(v) OVER (
                PARTITION BY user_id ORDER BY d
                ROWS UNBOUNDED PRECEDING) AS cum
            FROM c
        ), j AS (
            SELECT coalesce(cb.user_id, cc.user_id) AS user_id,
                   coalesce(cb.d, cc.d) AS d,
                   cb.cum AS bcum, cc.cum AS ccum
            FROM cb FULL JOIN cc
              ON cb.user_id = cc.user_id AND cb.d = cc.d
        ), f AS (
            SELECT user_id, d,
                   max(bcum) OVER (PARTITION BY user_id ORDER BY d
                                   ROWS UNBOUNDED PRECEDING) AS fb,
                   max(ccum) OVER (PARTITION BY user_id ORDER BY d
                                   ROWS UNBOUNDED PRECEDING) AS fv
            FROM j
        )
        SELECT user_id, d,
               CAST(fb AS DOUBLE) AS cum_purchase,
               CAST(fv AS DOUBLE) AS cum_click
        FROM f
        WHERE fb IS NOT NULL AND fv IS NOT NULL AND fb > fv
    """,
    # Skyline / Pareto frontier: the oracle is the textbook all-pairs
    # NOT EXISTS dominance test (quadratic — lives ONLY here; the
    # Spark side runs the distributive prefix-max decomposition)
    "qx55_skyline": """
        SELECT p_partkey, p_name, p_size, p_retailprice
        FROM part p
        WHERE NOT EXISTS (
            SELECT 1 FROM part q
            WHERE q.p_retailprice <= p.p_retailprice
              AND q.p_size >= p.p_size
              AND (q.p_retailprice < p.p_retailprice
                   OR q.p_size > p.p_size)
        )
        ORDER BY p_partkey
    """,
    # A-priori association rules: DISTINCT-items self-join pair counts
    # (per-basket double-explode enumeration on the Spark side is
    # count-identical); exact-integer gates, fixed-op-order metrics
    "qx56_assoc_rules": """
        WITH items AS (
            SELECT DISTINCT l_orderkey AS b, p_brand AS i
            FROM lineitem JOIN part ON l_partkey = p_partkey
        ), nb AS (SELECT count(DISTINCT b) AS n FROM items),
        supp AS (SELECT i, count(*) AS s FROM items GROUP BY 1),
        freq AS (SELECT i, s FROM supp, nb WHERE 8 * s >= n),
        fitems AS (
            SELECT b, items.i FROM items JOIN freq ON items.i = freq.i
        ), pairs AS (
            SELECT a.i AS ant, c.i AS cons, count(*) AS pc
            FROM fitems a JOIN fitems c
              ON a.b = c.b AND a.i <> c.i
            GROUP BY 1, 2
        )
        SELECT ant, cons, pc AS pair_cnt,
               round(CAST(pc AS DOUBLE) / CAST(nb.n AS DOUBLE), 6)
                   AS support,
               round(CAST(pc AS DOUBLE) / CAST(fa.s AS DOUBLE), 6)
                   AS confidence,
               round((CAST(pc AS DOUBLE) * CAST(nb.n AS DOUBLE))
                     / (CAST(fa.s AS DOUBLE) * CAST(fc.s AS DOUBLE)),
                     6) AS lift
        FROM pairs
        JOIN freq fa ON pairs.ant = fa.i
        JOIN freq fc ON pairs.cons = fc.i, nb
        WHERE 50 * pc >= nb.n AND 20 * pc >= 3 * fa.s
        ORDER BY ant, cons
    """,
    # Welch t-test: exact BIGINT/DECIMAL sufficient statistics, doubles
    # assembled in the same fixed op order as the Spark side, round(6)
    "qx57_welch_ttest": """
        WITH g AS (
            SELECT ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow,
                   count(CASE WHEN event_type = 'purchase'
                              THEN value END) AS n1,
                   sum(CASE WHEN event_type = 'purchase'
                            THEN CAST(value AS DECIMAL(18,2)) END) AS s1,
                   sum(CASE WHEN event_type = 'purchase'
                            THEN CAST(value AS DECIMAL(18,2))
                               * CAST(value AS DECIMAL(18,2)) END) AS q1,
                   count(CASE WHEN event_type = 'click'
                              THEN value END) AS n2,
                   sum(CASE WHEN event_type = 'click'
                            THEN CAST(value AS DECIMAL(18,2)) END) AS s2,
                   sum(CASE WHEN event_type = 'click'
                            THEN CAST(value AS DECIMAL(18,2))
                               * CAST(value AS DECIMAL(18,2)) END) AS q2
            FROM events
            WHERE event_type IN ('purchase', 'click')
              AND ts IS NOT NULL
            GROUP BY 1
        ), m AS (
            SELECT dow, n1, n2,
                   CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
                   CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
                   ((CAST(q1 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                       / CAST(n1 AS DOUBLE))
                    / (CAST(n1 AS DOUBLE) - 1.0))
                   / CAST(n1 AS DOUBLE) AS e1,
                   ((CAST(q2 AS DOUBLE)
                     - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                       / CAST(n2 AS DOUBLE))
                    / (CAST(n2 AS DOUBLE) - 1.0))
                   / CAST(n2 AS DOUBLE) AS e2
            FROM g WHERE n1 > 1 AND n2 > 1
        )
        SELECT dow, n1 AS n_purchase, n2 AS n_click,
               round(m1, 6) AS mean_purchase,
               round(m2, 6) AS mean_click,
               round((m1 - m2) / sqrt(e1 + e2), 6) AS t_stat,
               round(((e1 + e2) * (e1 + e2))
                     / ((e1 * e1) / (CAST(n1 AS DOUBLE) - 1.0)
                        + (e2 * e2) / (CAST(n2 AS DOUBLE) - 1.0)),
                     6) AS welch_df
        FROM m WHERE (e1 + e2) > 0
        ORDER BY dow
    """,
    # Seasonal decomposition: exact DECIMAL 7-day window sums (trend is
    # never divided until the double boundary), dow seasonal index from
    # exact sum ratios, fixed-op-order remainder
    "qx58_seasonal_decompose": """
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
            FROM orders GROUP BY 1
        ), tr AS (
            SELECT day, rev,
                   sum(rev) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
                                  AND 3 FOLLOWING) AS t7,
                   count(rev) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
                                    AND 3 FOLLOWING) AS c7
            FROM daily
        ), tf AS (
            SELECT day,
                   (date_diff('day', DATE '1970-01-01', day) + 4) % 7
                       AS dow,
                   rev, t7
            FROM tr WHERE c7 = 7
        ), idx AS (
            SELECT dow, sum(7 * rev) AS sr, sum(t7) AS st
            FROM tf GROUP BY 1
        )
        SELECT day, tf.dow,
               CAST(rev AS DOUBLE) AS revenue,
               round(CAST(t7 AS DOUBLE) / 7.0, 6) AS trend,
               round(CAST(sr AS DOUBLE) / CAST(st AS DOUBLE), 6)
                   AS seasonal_idx,
               round(CAST(rev AS DOUBLE)
                     / ((CAST(t7 AS DOUBLE) / 7.0)
                        * (CAST(sr AS DOUBLE) / CAST(st AS DOUBLE))),
                     6) AS remainder
        FROM tf JOIN idx ON tf.dow = idx.dow
        ORDER BY day
    """,
    # Sorted-neighborhood (merge/purge): the oracle uses the textbook
    # GLOBAL row_number + band self-join; the Spark side derives the
    # same global rank from bucket prefix sums and equi-joins on it
    "qx59_sorted_neighborhood": """
        WITH o AS (
            SELECT doc_id,
                   list_distinct(string_split(lower(text), ' ')) AS s,
                   row_number() OVER (ORDER BY lower(text), doc_id)
                       AS rn
            FROM documents WHERE text IS NOT NULL
        )
        SELECT a.doc_id AS da, b.doc_id AS db,
               round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                     / CAST(len(a.s) + len(b.s)
                            - len(list_intersect(a.s, b.s)) AS DOUBLE),
                     6) AS jaccard
        FROM o a JOIN o b ON b.rn - a.rn BETWEEN 1 AND 3
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / CAST(len(a.s) + len(b.s)
                     - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.5
        ORDER BY da, db
    """,
    # Gini per segment: the oracle ranks with the textbook per-group
    # window (fine on oracle-sized data); exact decimal Σx / Σ(i·x),
    # one double division, same rank formula
    "qx60_gini_concentration": """
        WITH totals AS (
            SELECT o_custkey,
                   sum(CAST(o_totalprice AS DECIMAL(18,2))) AS x
            FROM orders GROUP BY 1
        ), ranked AS (
            SELECT c_mktsegment, x,
                   row_number() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY x, c_custkey) AS i
            FROM totals JOIN customer ON o_custkey = c_custkey
        ), g AS (
            SELECT c_mktsegment, count(*) AS n,
                   sum(x) AS sx, sum(i * x) AS six
            FROM ranked GROUP BY 1
        )
        SELECT c_mktsegment AS segment,
               n AS n_customers,
               CAST(sx AS DOUBLE) AS total_revenue,
               round(CAST(2 * six - (n + 1) * sx AS DOUBLE)
                     / CAST(n * sx AS DOUBLE), 6) AS gini
        FROM g
        ORDER BY segment
    """,
    # Closed-form OLS: identical exact-decimal moments, identical
    # cofactor-expansion determinant text, round(6)
    "qx61_ols_regression": """
        WITH g AS (
            SELECT l_returnflag,
                   count(*) AS n,
                   sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
                   sum(CAST(l_discount AS DECIMAL(18,2))) AS sd,
                   sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sp,
                   sum(CAST(l_quantity AS DECIMAL(18,2))
                       * CAST(l_quantity AS DECIMAL(18,2))) AS sqq,
                   sum(CAST(l_discount AS DECIMAL(18,2))
                       * CAST(l_discount AS DECIMAL(18,2))) AS sdd,
                   sum(CAST(l_quantity AS DECIMAL(18,2))
                       * CAST(l_discount AS DECIMAL(18,2))) AS sqd,
                   sum(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(l_quantity AS DECIMAL(18,2))) AS spq,
                   sum(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(l_discount AS DECIMAL(18,2))) AS spd
            FROM lineitem
            GROUP BY 1
            HAVING count(*) >= 3
        ), m AS (
            SELECT l_returnflag, n,
                   CAST(n AS DOUBLE) AS dn,
                   CAST(sq AS DOUBLE) AS dsq, CAST(sd AS DOUBLE) AS dsd,
                   CAST(sp AS DOUBLE) AS dsp,
                   CAST(sqq AS DOUBLE) AS dsqq,
                   CAST(sdd AS DOUBLE) AS dsdd,
                   CAST(sqd AS DOUBLE) AS dsqd,
                   CAST(spq AS DOUBLE) AS dspq,
                   CAST(spd AS DOUBLE) AS dspd
            FROM g
        ), dets AS (
            SELECT l_returnflag, n,
                   dn * (dsqq * dsdd - dsqd * dsqd)
                   - dsq * (dsq * dsdd - dsqd * dsd)
                   + dsd * (dsq * dsqd - dsqq * dsd) AS det,
                   dsp * (dsqq * dsdd - dsqd * dsqd)
                   - dsq * (dspq * dsdd - dsqd * dspd)
                   + dsd * (dspq * dsqd - dsqq * dspd) AS d0,
                   dn * (dspq * dsdd - dsqd * dspd)
                   - dsp * (dsq * dsdd - dsqd * dsd)
                   + dsd * (dsq * dspd - dspq * dsd) AS d1,
                   dn * (dsqq * dspd - dspq * dsqd)
                   - dsq * (dsq * dspd - dspq * dsd)
                   + dsp * (dsq * dsqd - dsqq * dsd) AS d2
            FROM m
        )
        SELECT l_returnflag, n AS n_rows,
               round(d0 / det, 6) AS intercept,
               round(d1 / det, 6) AS beta_quantity,
               round(d2 / det, 6) AS beta_discount
        FROM dets
        WHERE det <> 0.0
        ORDER BY l_returnflag
    """,
    # CUSUM changepoint: scaled statistic n·C_t − t·T keeps everything
    # exact (no mean, no division); identical top-3 ordering
    "qx62_changepoint": """
        WITH daily AS (
            SELECT epoch_us(ts) // 86400000000 AS day,
                   sum(CAST(value AS DECIMAL(18,2))) AS x
            FROM events WHERE ts IS NOT NULL GROUP BY 1
        ), nt AS (
            SELECT count(*) AS n, sum(x) AS tt FROM daily
        ), c AS (
            SELECT day,
                   row_number() OVER (ORDER BY day) AS t,
                   sum(x) OVER (ORDER BY day
                                ROWS UNBOUNDED PRECEDING) AS cum
            FROM daily
        )
        SELECT day,
               CAST(n * cum - t * tt AS DOUBLE) AS cusum,
               CAST(abs(n * cum - t * tt) AS DOUBLE) AS score
        FROM c, nt
        ORDER BY score DESC, day ASC
        LIMIT 3
    """,
    # Two-sample KS: argmax on the exact scaled statistic; every
    # windowed BIGINT sum cast back (HUGEINT → float64 trap)
    "qx63_ks_test": """
        WITH vals AS (
            SELECT value AS v,
                   count(CASE WHEN event_type = 'purchase'
                              THEN 1 END) AS d1,
                   count(CASE WHEN event_type = 'click'
                              THEN 1 END) AS d2
            FROM events
            WHERE event_type IN ('purchase', 'click')
              AND value IS NOT NULL
            GROUP BY 1
        ), c AS (
            SELECT v,
                   CAST(sum(d1) OVER (ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c1,
                   CAST(sum(d2) OVER (ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c2
            FROM vals
        ), nt AS (
            SELECT CAST(sum(d1) AS BIGINT) AS n1,
                   CAST(sum(d2) AS BIGINT) AS n2
            FROM vals
        )
        SELECT v AS at_value, n1, n2,
               CAST(abs(n2 * c1 - n1 * c2) AS BIGINT) AS d_scaled,
               round(CAST(abs(n2 * c1 - n1 * c2) AS DOUBLE)
                     / CAST(n1 * n2 AS DOUBLE), 6) AS ks
        FROM c, nt
        ORDER BY d_scaled DESC, at_value ASC
        LIMIT 1
    """,
    # Weighted median: exact integer crossing test; cumW monotone in
    # price, so the crossing value is MIN over the qualifying suffix
    "qx64_weighted_median": """
        WITH g AS (
            SELECT l_returnflag AS f, l_extendedprice AS p,
                   CAST(sum(l_quantity) AS BIGINT) AS wt
            FROM lineitem GROUP BY 1, 2
        ), tot AS (
            SELECT f, CAST(sum(wt) AS BIGINT) AS w FROM g GROUP BY 1
        ), c AS (
            SELECT f, p,
                   CAST(sum(wt) OVER (PARTITION BY f ORDER BY p
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw
            FROM g
        )
        SELECT c.f AS returnflag, tot.w AS total_weight,
               min(p) AS weighted_median
        FROM c JOIN tot ON c.f = tot.f
        WHERE 2 * cw >= w
        GROUP BY 1, 2
        ORDER BY returnflag
    """,
    # Quantile normalization: textbook per-group window rank in the
    # oracle; exact integer bins, conditional-aggregation reference
    "qx65_quantile_normalize": """
        WITH ev AS (
            SELECT event_type AS g, value AS v, event_id
            FROM events
            WHERE event_type IN ('purchase', 'click')
              AND value IS NOT NULL
        ), r AS (
            SELECT g, v,
                   row_number() OVER (PARTITION BY g
                                      ORDER BY v, event_id) AS rk,
                   count(*) OVER (PARTITION BY g) AS n
            FROM ev
        ), b AS (
            SELECT g, ((rk - 1) * 20) // n AS bin,
                   CAST(count(*) AS BIGINT) AS c,
                   sum(CAST(v AS DECIMAL(18,2))) AS s
            FROM r GROUP BY 1, 2
        ), p AS (
            SELECT bin,
                   max(CASE WHEN g = 'purchase'
                            THEN CAST(s AS DOUBLE) / CAST(c AS DOUBLE)
                       END) AS mp,
                   max(CASE WHEN g = 'click'
                            THEN CAST(s AS DOUBLE) / CAST(c AS DOUBLE)
                       END) AS mc
            FROM b GROUP BY 1
        )
        SELECT b.g AS grp, b.bin AS bin, b.c AS n_rows,
               round(CAST(b.s AS DOUBLE) / CAST(b.c AS DOUBLE), 6)
                   AS group_mean,
               round((mp + mc) / 2.0, 6) AS normalized
        FROM b JOIN p ON b.bin = p.bin
        ORDER BY grp, bin
    """,
    # Audio round-trip: the oracle regenerates the closed-form int16
    # signal (id*1103515245 + i*12345 + 12345 mod 65535 - 32767, n =
    # 80 + id%5*40) and every integer statistic of it — a hash match
    # proves the Spark side's REAL WAV encode->decode loop is lossless
    # (container size 44 + 2n checks the RIFF layout too).  The
    # zero-cross predecessor is the same closed form at i-1, inline —
    # no window.  DuckDB integer sums return HUGEINT -> CAST BIGINT.
    "qx66_audio_stats": """
        WITH d AS (
            SELECT doc_id, 80 + (doc_id % 5) * 40 AS n FROM documents
        ), s AS (
            SELECT doc_id, n,
                   unnest(generate_series(0, CAST(n - 1 AS BIGINT))) AS i
            FROM d
        ), x AS (
            SELECT doc_id, n, i,
                   ((doc_id * 1103515245 + i * 12345 + 12345) % 65535)
                       - 32767 AS x,
                   CASE WHEN i > 0 THEN
                       ((doc_id * 1103515245 + (i - 1) * 12345 + 12345)
                           % 65535) - 32767
                   END AS xp
            FROM s
        )
        SELECT doc_id,
               CAST(max(n) AS BIGINT) AS n_samples,
               CAST(16000 AS BIGINT) AS sample_rate,
               CAST(44 + 2 * max(n) AS BIGINT) AS n_bytes,
               CAST(sum(x) AS BIGINT) AS sum_s,
               CAST(sum(x * x) AS BIGINT) AS sum_sq,
               CAST(sum(CASE WHEN xp IS NOT NULL
                             AND ((x < 0) != (xp < 0))
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_zero_cross,
               round(CAST(max(n) AS DOUBLE) / 16000.0, 6) AS duration_s,
               round(sqrt(CAST(sum(x * x) AS DOUBLE)
                          / CAST(max(n) AS DOUBLE)) / 32768.0, 6) AS rms
        FROM x GROUP BY doc_id ORDER BY doc_id
    """,
    # Video round-trip: regenerate the closed-form 8x8 gray frames
    # (v = (id*7 + f*13 + r*31 + c*17 + 11) % 256, nf = 2 + id%3) on
    # three chained unnest grids; gray content is bit-exact through
    # the 4:2:0 pipeline, so every integer matches the Spark side's
    # REAL encode->decode.  Container = 39-byte header + 102/frame.
    # The motion predecessor is the closed form at f-1, window-free.
    "qx67_video_stats": """
        WITH d AS (
            SELECT doc_id, 2 + doc_id % 3 AS nf FROM documents
        ), f AS (
            SELECT doc_id, nf,
                   unnest(generate_series(0, CAST(nf - 1 AS BIGINT))) AS fi
            FROM d
        ), r AS (
            SELECT doc_id, nf, fi,
                   unnest(generate_series(0, CAST(7 AS BIGINT))) AS ri
            FROM f
        ), c AS (
            SELECT doc_id, nf, fi, ri,
                   unnest(generate_series(0, CAST(7 AS BIGINT))) AS ci
            FROM r
        ), x AS (
            SELECT doc_id, nf, fi,
                   (doc_id * 7 + fi * 13 + ri * 31 + ci * 17 + 11)
                       % 256 AS v,
                   CASE WHEN fi > 0 THEN
                       (doc_id * 7 + (fi - 1) * 13 + ri * 31 + ci * 17
                           + 11) % 256
                   END AS vp
            FROM c
        )
        SELECT doc_id,
               CAST(max(nf) AS BIGINT) AS n_frames,
               CAST(8 AS BIGINT) AS width,
               CAST(8 AS BIGINT) AS height,
               CAST(25 AS BIGINT) AS fps_num,
               CAST(1 AS BIGINT) AS fps_den,
               CAST(39 + max(nf) * 102 AS BIGINT) AS n_bytes,
               CAST(sum(v) AS BIGINT) AS sum_luma,
               CAST(sum(v * v) AS BIGINT) AS sum_sq,
               CAST(sum(CASE WHEN vp IS NOT NULL THEN abs(v - vp)
                             ELSE 0 END) AS BIGINT) AS motion_abs,
               round(CAST(max(nf) AS DOUBLE) / 25.0, 6) AS duration_s
        FROM x GROUP BY doc_id ORDER BY doc_id
    """,
    # Spatial radius join: the oracle is deliberately the NAIVE
    # all-pairs distance filter — a hash match proves the Spark side's
    # 3x3-cell grid candidate generator is COMPLETE (no neighbor pair
    # escapes its cell neighborhood).  Pure integers; the argmin rides
    # one packed BIGINT (d2*1e6 + custkey) exactly like the Spark code.
    "qx68_spatial_radius_join": """
        WITH c AS (
            SELECT c_custkey AS b_id,
                   (c_custkey * 48271 + 11) % 10000 AS bx,
                   (c_custkey * 69621 + 7) % 10000 AS by
            FROM customer
        ), s AS (
            SELECT s_suppkey AS p_id,
                   (s_suppkey * 16807 + 3) % 10000 AS px,
                   (s_suppkey * 39709 + 19) % 10000 AS py
            FROM supplier
        ), p AS (
            SELECT p_id,
                   (px - bx) * (px - bx) + (py - by) * (py - by) AS d2,
                   b_id
            FROM s, c
            WHERE (px - bx) * (px - bx) + (py - by) * (py - by)
                  <= 500 * 500
        )
        SELECT p_id AS s_suppkey,
               CAST(count(*) AS BIGINT) AS n_within,
               CAST(min(d2 * 34359738368 + b_id) // 34359738368
                    AS BIGINT) AS min_d2,
               CAST(min(d2 * 34359738368 + b_id) % 34359738368
                    AS BIGINT) AS nearest_cust
        FROM p GROUP BY p_id ORDER BY p_id
    """,
    # Kaplan-Meier: day arithmetic on µs epochs (ns truncation never
    # crosses a day boundary), the after-first-click gate compares at
    # µs exactly like the Spark side; at-risk = suffix sum over the
    # calendar-bounded duration grid; S(t) = exp(prefix ln-sum) in the
    # same ascending order, integer zero-flag instead of ln(0).
    "qx69_kaplan_meier": """
        WITH ev AS (
            SELECT user_id, event_type, epoch_us(ts) AS us
            FROM events
            WHERE ts IS NOT NULL AND user_id IS NOT NULL
              AND event_type IN ('click', 'purchase')
        ), fc AS (
            SELECT user_id, min(us) AS c_us
            FROM ev WHERE event_type = 'click' GROUP BY user_id
        ), hz AS (
            SELECT max(us // 86400000000) AS hday FROM ev
        ), fp AS (
            SELECT ev.user_id, min(ev.us) AS p_us
            FROM ev JOIN fc ON ev.user_id = fc.user_id
            WHERE ev.event_type = 'purchase' AND ev.us >= fc.c_us
            GROUP BY ev.user_id
        ), pu AS (
            SELECT CASE WHEN p_us IS NOT NULL
                        THEN p_us // 86400000000 - c_us // 86400000000
                        ELSE hday - c_us // 86400000000
                   END AS dur,
                   CASE WHEN p_us IS NOT NULL THEN 1 ELSE 0 END AS e
            FROM fc LEFT JOIN fp ON fc.user_id = fp.user_id, hz
        ), grid AS (
            SELECT dur, CAST(sum(e) AS BIGINT) AS n_events,
                   CAST(sum(1 - e) AS BIGINT) AS n_censored
            FROM pu GROUP BY dur
        ), km AS (
            SELECT dur, n_events, n_censored,
                   sum(n_events + n_censored) OVER (
                       ORDER BY dur ROWS BETWEEN CURRENT ROW AND
                       UNBOUNDED FOLLOWING) AS n_risk
            FROM grid
        ), acc AS (
            SELECT dur, n_risk, n_events, n_censored,
                   max(CASE WHEN n_events = n_risk THEN 1 ELSE 0 END)
                       OVER w AS z,
                   sum(CASE WHEN n_events > 0 AND n_events < n_risk
                            THEN ln(1.0 - CAST(n_events AS DOUBLE)
                                          / CAST(n_risk AS DOUBLE))
                            ELSE 0.0 END) OVER w AS ls
            FROM km
            WINDOW w AS (ORDER BY dur ROWS BETWEEN UNBOUNDED
                         PRECEDING AND CURRENT ROW)
        )
        SELECT dur AS duration_days,
               CAST(n_risk AS BIGINT) AS n_risk, n_events, n_censored,
               CASE WHEN z = 1 THEN 0.0 ELSE round(exp(ls), 6) END
                   AS survival
        FROM acc ORDER BY duration_days
    """,
    # DBSCAN: naive all-pairs ε-graph (the completeness proof for the
    # Spark side's grid generation, again) + recursive-CTE min-label
    # components over core-core edges (the q15 pattern); border points
    # take the MIN cluster among their core neighbors, noise excluded.
    "qx70_dbscan": """
        WITH RECURSIVE
        pts AS (
            SELECT c_custkey AS id,
                   (c_custkey * 48271 + 11) % 10000 AS x,
                   (c_custkey * 69621 + 7) % 10000 AS y
            FROM customer WHERE c_custkey < 1500
        ),
        nb AS (
            SELECT a.id AS ia, b.id AS ib
            FROM pts a, pts b
            WHERE (a.x - b.x) * (a.x - b.x)
                + (a.y - b.y) * (a.y - b.y) <= 300 * 300
        ),
        core AS (
            SELECT ia AS id FROM nb GROUP BY ia HAVING count(*) >= 4
        ),
        edges AS (
            SELECT ia AS a, ib AS b FROM nb
            WHERE ia <> ib
              AND ia IN (SELECT id FROM core)
              AND ib IN (SELECT id FROM core)
        ),
        reach(id, r) AS (
            SELECT id, id FROM core
            UNION
            SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id
        ),
        comp AS (
            SELECT id, min(r) AS cluster FROM reach GROUP BY id
        ),
        border AS (
            SELECT nb.ia AS id, min(comp.cluster) AS cluster
            FROM nb JOIN comp ON nb.ib = comp.id
            WHERE nb.ia NOT IN (SELECT id FROM core)
            GROUP BY nb.ia
        )
        SELECT id AS c_custkey, CAST(cluster AS BIGINT) AS cluster,
               TRUE AS is_core
        FROM comp
        UNION ALL
        SELECT id, CAST(cluster AS BIGINT), FALSE FROM border
        ORDER BY c_custkey
    """,
    # Image codec cross-verification: regenerate the closed-form
    # pixels on two chained unnest grids; the Spark side raises
    # in-task if ANY of the five lossless decodes diverges, so a hash
    # match certifies the codecs.  BMP = 54 + 4-byte-padded stride*h;
    # PPM = len("P6\n{w} {h}\n255\n") + 3wh.
    "qx71_image_stats": """
        WITH d AS (
            SELECT doc_id, 8 + (doc_id % 2) * 4 AS w FROM documents
            WHERE doc_id % 10 = 0
        ), r AS (
            SELECT doc_id, w,
                   unnest(generate_series(0, CAST(7 AS BIGINT))) AS ri
            FROM d
        ), c AS (
            SELECT doc_id, w, ri,
                   unnest(generate_series(0, CAST(w - 1 AS BIGINT))) AS ci
            FROM r
        ), x AS (
            SELECT doc_id, w,
                   (doc_id * 31 + ri * 17 + ci * 7 + 5) % 256 AS v
            FROM c
        )
        SELECT doc_id,
               CAST(max(w) AS BIGINT) AS width,
               CAST(8 AS BIGINT) AS height,
               CAST(8 * max(w) AS BIGINT) AS n_pixels,
               CAST(sum(v) AS BIGINT) AS sum_v,
               CAST(sum(v * v) AS BIGINT) AS sum_sq,
               CAST(54 + ((3 * max(w) + 3) // 4) * 4 * 8 AS BIGINT)
                   AS bmp_bytes,
               CAST(9 + length(CAST(max(w) AS VARCHAR))
                      + length('8') + 3 * 8 * max(w) AS BIGINT)
                   AS ppm_bytes,
               CAST(5 AS BIGINT) AS n_codecs_verified
        FROM x GROUP BY doc_id ORDER BY doc_id
    """,
    # Grid kNN join: the oracle is deliberately the NAIVE all-pairs
    # row_number top-k — a hash match proves the Spark side's
    # expanding-ring cell search COMPLETE (no true neighbor escapes
    # the rings a probe settled at).  Pure integers; the (d2, b_id)
    # order makes the top-k ties deterministic on both engines.
    "qx72_spatial_knn_join": """
        WITH c AS (
            SELECT CAST(c_custkey AS BIGINT) AS b_id,
                   CAST((c_custkey * 48271 + 11) % 10000 AS BIGINT) AS bx,
                   CAST((c_custkey * 69621 + 7) % 10000 AS BIGINT) AS by
            FROM customer
        ), s AS (
            SELECT CAST(s_suppkey AS BIGINT) AS p_id,
                   CAST((s_suppkey * 16807 + 3) % 10000 AS BIGINT) AS px,
                   CAST((s_suppkey * 39709 + 19) % 10000 AS BIGINT) AS py
            FROM supplier
        ), d AS (
            SELECT p_id, b_id,
                   (px - bx) * (px - bx) + (py - by) * (py - by) AS d2
            FROM s, c
        ), r AS (
            SELECT p_id, b_id, d2,
                   row_number() OVER (PARTITION BY p_id
                                      ORDER BY d2, b_id) AS rk
            FROM d
        )
        SELECT p_id AS s_suppkey,
               CAST(rk AS BIGINT) AS rank,
               b_id AS c_custkey,
               CAST(d2 AS BIGINT) AS d2
        FROM r WHERE rk <= 5 ORDER BY s_suppkey, rank
    """,
    # Bounding-box containment: naive all-pairs BETWEEN — the hash
    # match proves the box-rasterization candidate generator complete.
    "qx73_spatial_bbox_join": """
        WITH c AS (
            SELECT CAST(c_custkey AS BIGINT) AS p_id,
                   CAST((c_custkey * 48271 + 11) % 10000 AS BIGINT) AS px,
                   CAST((c_custkey * 69621 + 7) % 10000 AS BIGINT) AS py
            FROM customer
        ), b AS (
            SELECT CAST(s_suppkey AS BIGINT) AS b_id,
                   CAST((s_suppkey * 16807 + 3) % 9600 AS BIGINT) AS x1,
                   CAST((s_suppkey * 39709 + 19) % 9600 AS BIGINT) AS y1,
                   CAST((s_suppkey * 16807 + 3) % 9600
                        + (s_suppkey * 25173 + 5) % 400 AS BIGINT) AS x2,
                   CAST((s_suppkey * 39709 + 19) % 9600
                        + (s_suppkey * 30103 + 1) % 400 AS BIGINT) AS y2
            FROM supplier
        )
        SELECT b_id AS s_suppkey,
               CAST(count(*) AS BIGINT) AS n_in,
               CAST(sum(p_id) AS BIGINT) AS sum_keys,
               CAST(min(p_id) AS BIGINT) AS min_key,
               CAST(max(p_id) AS BIGINT) AS max_key
        FROM c, b
        WHERE px BETWEEN x1 AND x2 AND py BETWEEN y1 AND y2
        GROUP BY b_id ORDER BY s_suppkey
    """,
    # Naive Bayes: identical count/prior/smoothing expressions from
    # exact integer counts; ln + round(6) per the q93 float discipline.
    # Token INSTANCES sum ln(c+1) (multiplicity matters); unseen terms
    # smooth to ln(1) = 0 via COALESCE.
    "qx74_naive_bayes": """
        WITH tr AS (
            SELECT doc_id, lang, lower(text) AS t FROM documents
            WHERE lang IS NOT NULL AND doc_id % 5 <> 0
        ), tok AS (
            SELECT lang, unnest(string_split(t, ' ')) AS term FROM tr
        ), cnt AS (
            SELECT lang, term, count(*) AS c FROM tok GROUP BY 1, 2
        ), tot AS (
            SELECT lang, sum(c) AS n_l FROM cnt GROUP BY 1
        ), voc AS (
            SELECT count(DISTINCT term) AS v FROM tok
        ), pri AS (
            SELECT lang, count(*) AS d_l FROM tr GROUP BY 1
        ), dd AS (
            SELECT count(*) AS d FROM tr
        ), te AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
            FROM documents
            WHERE lang IS NOT NULL AND doc_id % 5 = 0
        ), ntk AS (
            SELECT doc_id, count(*) AS n_tok FROM te GROUP BY 1
        ), grid AS (
            SELECT te.doc_id, p.lang,
                   sum(ln(CAST(COALESCE(cnt.c, 0) + 1 AS DOUBLE))) AS s
            FROM te
            CROSS JOIN pri p
            LEFT JOIN cnt ON cnt.lang = p.lang AND cnt.term = te.term
            GROUP BY te.doc_id, p.lang
        )
        SELECT g.doc_id, g.lang,
               CAST(ntk.n_tok AS BIGINT) AS n_tok,
               round(g.s + ln(CAST(p.d_l AS DOUBLE))
                     - ln(CAST(dd.d AS DOUBLE))
                     - CAST(ntk.n_tok AS DOUBLE)
                       * ln(CAST(t.n_l + v.v AS DOUBLE)), 6) AS score
        FROM grid g
        JOIN ntk USING (doc_id)
        JOIN pri p ON p.lang = g.lang
        JOIN tot t ON t.lang = g.lang
        CROSS JOIN voc v CROSS JOIN dd
        ORDER BY g.doc_id, g.lang
    """,
    # Mann-Whitney U: doubled midranks keep ties integer-exact
    # (m2 = 2s + c + 1); the z divides once on aggregated scalars,
    # identical expression + round(6).
    "qx75_mann_whitney": """
        WITH v AS (
            SELECT CAST(l_quantity AS BIGINT) AS q,
                   CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS g1
            FROM lineitem
            WHERE l_returnflag IN ('A', 'R') AND l_quantity IS NOT NULL
        ), per AS (
            SELECT q, count(*) AS c, sum(g1) AS c1 FROM v GROUP BY q
        ), run AS (
            SELECT q, c, c1,
                   sum(c) OVER (ORDER BY q ROWS BETWEEN UNBOUNDED
                                PRECEDING AND CURRENT ROW) AS cum
            FROM per
        ), agg AS (
            SELECT CAST(sum(c1) AS BIGINT) AS n1,
                   CAST(sum(c) AS BIGINT) AS n,
                   CAST(sum(c1 * (2 * cum - c + 1)) AS BIGINT) AS r1_x2,
                   CAST(sum(c * c * c - c) AS BIGINT) AS tie_t
            FROM run
        )
        SELECT n1,
               CAST(n - n1 AS BIGINT) AS n2,
               r1_x2,
               CAST(r1_x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
               tie_t,
               round((CAST(r1_x2 - n1 * (n1 + 1) AS DOUBLE)
                      - CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE))
                     / sqrt(CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE)
                            / 3.0
                            * (CAST(n + 1 AS DOUBLE)
                               - CAST(tie_t AS DOUBLE)
                                 / (CAST(n AS DOUBLE)
                                    * CAST(n - 1 AS DOUBLE)))), 6) AS z
        FROM agg
    """,
    # Interval-union coverage: the identical integer sweep in SQL
    # windows; half-open seams collapse in the per-position delta sum.
    "qx76_interval_coverage": """
        WITH iv AS (
            SELECT user_id, epoch_us(ts) AS s,
                   epoch_us(ts)
                   + ((event_id % 590) + 10) * 1000000 AS e
            FROM events
            WHERE ts IS NOT NULL AND user_id IS NOT NULL
              AND event_id IS NOT NULL
        ), bounds AS (
            SELECT user_id, s AS pos, 1 AS d FROM iv
            UNION ALL
            SELECT user_id, e AS pos, -1 AS d FROM iv
        ), seg AS (
            SELECT user_id, pos, sum(d) AS dd
            FROM bounds GROUP BY user_id, pos
        ), run AS (
            SELECT user_id, pos,
                   sum(dd) OVER (PARTITION BY user_id ORDER BY pos
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND
                                 CURRENT ROW) AS depth,
                   lead(pos) OVER (PARTITION BY user_id
                                   ORDER BY pos) AS nxt
            FROM seg
        ), cover AS (
            SELECT user_id,
                   CAST(max(depth) AS BIGINT) AS peak_depth,
                   CAST(sum(CASE WHEN depth > 0 AND nxt IS NOT NULL
                                 THEN nxt - pos ELSE 0 END)
                        AS BIGINT) AS covered_us
            FROM run GROUP BY user_id
        ), raw AS (
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_intervals,
                   CAST(sum(e - s) AS BIGINT) AS raw_us
            FROM iv GROUP BY user_id
        )
        SELECT raw.user_id, n_intervals, raw_us, covered_us, peak_depth
        FROM raw JOIN cover ON raw.user_id = cover.user_id
        ORDER BY raw.user_id
    """,
    # Four fixed IRLS iterations replayed as chained CTEs — identical
    # expression text (sigmoid, weights, cofactor determinants, Cramer
    # update) to the Spark side, so the engines' betas agree to
    # summation-order noise and the round-6 score grid is stable.
    "qx77_logreg_quality": _LOGREG_CTES + """
        SELECT doc_id, y, x1, x2,
               round(1.0/(1.0 + exp(-(b0 + b1*x1 + b2*x2))), 6) AS score
        FROM f CROSS JOIN be4
        WHERE doc_id % 5 = 0
        ORDER BY doc_id
    """,
    "qx78_model_auc": _LOGREG_CTES + """
        , scored AS (
            SELECT y,
                   round(1.0/(1.0 + exp(-(b0 + b1*x1 + b2*x2))), 6) AS score
            FROM f CROSS JOIN be4
            WHERE doc_id % 5 = 0
        ),
        per AS (
            SELECT score, sum(y) AS n1s, sum(1 - y) AS n0s
            FROM scored GROUP BY score
        ),
        cum AS (
            SELECT n1s, n0s,
                   sum(n0s) OVER (ORDER BY score
                                  ROWS UNBOUNDED PRECEDING) AS c0
            FROM per
        )
        SELECT CAST(sum(n1s) AS BIGINT) AS n_pos,
               CAST(sum(n0s) AS BIGINT) AS n_neg,
               CAST(sum(n1s * (2*c0 - n0s)) AS BIGINT) AS u2,
               round(CAST(sum(n1s * (2*c0 - n0s)) AS DOUBLE)
                     / (2.0 * sum(n1s) * sum(n0s)), 6) AS auc
        FROM cum
    """,
}

# Driver-window discipline: iteration order == sorted(numeric) order, so the
# first-50 window the driver records is exactly q01–q50 regardless of the
# literal's textual layout above.
ORACLES = dict(sorted(ORACLES.items()))
