"""DuckDB oracle SQL texts — dedup family.

Moved verbatim out of plans/queries.py (r12 verdict task 5: the
11k-line registry split).  These are DATA, not code: each entry
is the ANSI-SQL twin the driver runs against the same parquet
tables; plans/queries.py re-exports them into ORACLES at the
original registration sites, so registry order and text bytes
are unchanged.  Oracle-parity rules live in the queries.py
docstring.
"""

TEXTS: dict[str, str] = {}

TEXTS['dedup_corpus_stats'] = """
    WITH corpus AS (
        SELECT doc_id, text, lang FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text, lang FROM documents WHERE doc_id % 10 = 0),
    w AS (SELECT doc_id, lang,
                 min(doc_id) OVER (PARTITION BY sha256(text)) AS keep
          FROM corpus)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_in,
           CAST(sum(CASE WHEN doc_id = keep THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(count(*) - sum(CASE WHEN doc_id = keep THEN 1 ELSE 0 END)
               AS BIGINT) AS n_dropped
    FROM w GROUP BY lang ORDER BY lang
"""

TEXTS['contamination_check'] = """
    WITH train AS (SELECT doc_id, lang, sha256(text) AS fp FROM documents),
    bench AS (SELECT doc_id + 2000000 AS eval_id, sha256(text) AS fp
              FROM documents WHERE doc_id % 17 = 0)
    SELECT lang,
           CAST(count(DISTINCT eval_id) AS BIGINT) AS n_contaminated_eval,
           CAST(count(*) AS BIGINT) AS n_train_matches,
           min(doc_id) AS first_train_doc
    FROM train JOIN bench USING (fp)
    GROUP BY lang ORDER BY lang
"""

TEXTS['normalized_duplicates'] = """
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, upper(text) FROM documents
        WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 2000000, text || ' !!!' FROM documents
        WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 3000000, '  ' || regexp_replace(text, ' ', '  ', 'g')
        FROM documents WHERE doc_id % 10 = 0
    ),
    fp AS (
        SELECT doc_id,
               sha256(trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                   ' +', ' ', 'g'))) AS norm_fp,
               sha256(text) AS raw_fp
        FROM corpus
    )
    SELECT norm_fp,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS canonical_id,
           CAST(count(DISTINCT raw_fp) AS BIGINT) AS raw_variants
    FROM fp
    GROUP BY norm_fp
    HAVING count(*) >= 2
    ORDER BY n_docs DESC, canonical_id
    LIMIT 100
"""

TEXTS['span_contamination'] = """
    WITH train_h AS (
        SELECT DISTINCT
               substr(md5(array_to_string(ts[seg_no*8+1 : seg_no*8+8], ' ')), 1, 16) AS h
        FROM (SELECT ts, unnest(range(0, CAST(ceil(len(ts)/8.0) AS BIGINT))) AS seg_no
              FROM (SELECT string_split(text, ' ') AS ts FROM documents))),
    eval_set AS (
        SELECT doc_id + 5000000 AS doc_id, text, lang
        FROM documents WHERE doc_id % 17 = 0
        UNION ALL
        SELECT doc_id + 6000000, 'unseen eval item ' || CAST(doc_id AS VARCHAR), lang
        FROM documents WHERE doc_id % 17 = 1),
    esegs AS (
        SELECT doc_id, lang,
               substr(md5(array_to_string(ts[seg_no*8+1 : seg_no*8+8], ' ')), 1, 16) AS h
        FROM (SELECT doc_id, lang, ts,
                     unnest(range(0, CAST(ceil(len(ts)/8.0) AS BIGINT))) AS seg_no
              FROM (SELECT doc_id, lang, string_split(text, ' ') AS ts FROM eval_set))),
    per_doc AS (
        SELECT e.doc_id, e.lang,
               count(*) AS n_spans,
               sum(CASE WHEN t.h IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
        FROM esegs e LEFT JOIN train_h t ON t.h = e.h
        GROUP BY e.doc_id, e.lang),
    scored AS (
        SELECT lang, round(n_hit * 1.0 / n_spans, 4) AS overlap FROM per_doc)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_eval_docs,
           CAST(sum(CASE WHEN overlap >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contaminated,
           round(avg(overlap), 6) AS avg_overlap
    FROM scored
    GROUP BY lang
    ORDER BY lang
"""

TEXTS['boilerplate_prefix_profile'] = """
    WITH p AS (
        SELECT source,
               array_to_string(list_slice(
                   list_filter(string_split(text, ' '),
                               x -> length(x) > 0), 1, 8), ' ') AS prefix
        FROM documents)
    SELECT prefix,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources
    FROM p GROUP BY prefix HAVING count(*) >= 2
    ORDER BY n_docs DESC, prefix
"""

TEXTS['boilerplate_suffix_profile'] = """
    WITH corpus AS (
        SELECT text, source FROM documents
        UNION ALL
        SELECT text, source FROM documents WHERE doc_id % 10 = 0),
    p AS (
        SELECT source, toks,
               array_to_string(list_slice(
                   toks, greatest(len(toks) - 7, 1), len(toks)), ' ') AS suffix
        FROM (SELECT source,
                     list_filter(string_split(text, ' '),
                                 x -> length(x) > 0) AS toks
              FROM corpus))
    SELECT suffix,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources
    FROM p GROUP BY suffix HAVING count(*) >= 2
    ORDER BY n_docs DESC, suffix
"""

TEXTS['shuffled_export_manifest'] = """
    WITH keyed AS (
        SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key
        FROM documents),
    ranked AS (
        SELECT doc_id, shuffle_key,
               row_number() OVER (ORDER BY shuffle_key, doc_id) AS rank
        FROM keyed)
    SELECT CAST(rank AS BIGINT) AS rank, doc_id, shuffle_key
    FROM ranked WHERE rank % 25 = 1 ORDER BY rank
"""

TEXTS['fuzzy_name_matches'] = """
    WITH names AS (
        SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts
        FROM part GROUP BY p_name),
    banded AS (
        SELECT DISTINCT p_name, n_parts, band FROM (
            SELECT p_name, n_parts,
                   unnest([CAST(floor(length(p_name) / 3) AS BIGINT),
                           CAST(floor(length(p_name) / 3) AS BIGINT) + 1])
                       AS band
            FROM names)),
    cand AS (
        SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b,
               a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.p_name < b.p_name)
    SELECT name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS INT) AS dist,
           n_parts_a, n_parts_b
    FROM cand WHERE levenshtein(name_a, name_b) <= 2
    ORDER BY dist, name_a, name_b LIMIT 50
"""

TEXTS['dedup_keep_best'] = """
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, upper(text) FROM documents
        WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 2000000, text || ' !!!' FROM documents
        WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 3000000, '  ' || regexp_replace(text, ' ', '  ', 'g')
        FROM documents WHERE doc_id % 10 = 0
    ),
    scored AS (
        SELECT doc_id,
               sha256(trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                   ' +', ' ', 'g'))) AS norm_fp,
               round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                     / length(text), 4)
               - round(len(list_filter(string_split(text, ' '),
                                       t -> t IN ('the', 'a', 'of', 'and')))
                       * 1.0 / len(string_split(text, ' ')), 4) AS quality
        FROM corpus),
    ranked AS (
        SELECT norm_fp, doc_id, quality,
               row_number() OVER (PARTITION BY norm_fp
                                  ORDER BY quality DESC, doc_id ASC) AS rn,
               count(*) OVER (PARTITION BY norm_fp) AS n_docs
        FROM scored)
    SELECT norm_fp, CAST(n_docs AS BIGINT) AS n_docs, doc_id AS winner_id,
           round(quality, 4) AS winner_quality
    FROM ranked WHERE rn = 1 AND n_docs >= 2
    ORDER BY n_docs DESC, norm_fp
    LIMIT 100
"""

TEXTS['url_canonical_dedup'] = r"""
    WITH d AS (SELECT doc_id, source FROM documents),
    drawn AS (
        SELECT doc_id, source,
               ('0x' || substr(md5('url:' || CAST(doc_id AS VARCHAR)),
                               1, 8))::BIGINT / 4294967296.0 AS uu,
               ('0x' || substr(md5('case:' || CAST(doc_id AS VARCHAR)),
                               1, 8))::BIGINT / 4294967296.0 AS uc,
               ('0x' || substr(md5('www:' || CAST(doc_id AS VARCHAR)),
                               1, 8))::BIGINT / 4294967296.0 AS uw,
               ('0x' || substr(md5('scheme:' || CAST(doc_id AS VARCHAR)),
                               1, 8))::BIGINT / 4294967296.0 AS us,
               ('0x' || substr(md5('slash:' || CAST(doc_id AS VARCHAR)),
                               1, 8))::BIGINT / 4294967296.0 AS ul,
               ('0x' || substr(md5('utm:' || CAST(doc_id AS VARCHAR)),
                               1, 8))::BIGINT / 4294967296.0 AS ut
        FROM d),
    built AS (
        SELECT source,
               (CASE WHEN us < 0.5 THEN 'http://' ELSE 'https://' END)
               || (CASE WHEN uw < 0.3 THEN 'www.' ELSE '' END)
               || (CASE WHEN uc < 0.2
                        THEN upper('site' || CAST(CAST(floor(uu * uu * 40)
                                       AS BIGINT) AS VARCHAR)
                                   || '.example.com')
                        ELSE 'site' || CAST(CAST(floor(uu * uu * 40)
                                       AS BIGINT) AS VARCHAR)
                             || '.example.com' END)
               || '/page/' || CAST(doc_id % 20 AS VARCHAR)
               || (CASE WHEN ul < 0.3 THEN '/' ELSE '' END)
               || (CASE WHEN ut < 0.4
                        THEN '?utm_source=feed&utm_campaign=x'
                        ELSE '' END) AS raw_url
        FROM drawn),
    canon AS (
        SELECT source, raw_url,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(lower(raw_url), '^https?://', ''),
                     '^www\.', ''),
                   '\?utm_[a-z_=&]*$', ''),
                 '/+$', '') AS c_url
        FROM built)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT raw_url) AS BIGINT) AS n_raw_urls,
           CAST(count(DISTINCT c_url) AS BIGINT) AS n_canonical_urls,
           CAST(count(DISTINCT raw_url) - count(DISTINCT c_url)
                AS BIGINT) AS n_collapsed,
           round((count(DISTINCT raw_url) - count(DISTINCT c_url))
                 / CAST(count(DISTINCT raw_url) AS DOUBLE), 6)
               AS collapse_frac
    FROM canon GROUP BY source ORDER BY source
"""

TEXTS['sorted_neighborhood_pairs'] = """
    WITH names AS (
        SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts
        FROM part GROUP BY p_name),
    planted AS (
        SELECT p_name || 's' AS p_name, CAST(0 AS BIGINT) AS n_parts
        FROM names
        WHERE ('0x' || substr(md5('sn:' || p_name), 1, 8))::BIGINT % 3 = 0
          AND p_name || 's' NOT IN (SELECT p_name FROM names)),
    recs AS (SELECT * FROM names UNION ALL SELECT * FROM planted),
    seq AS (SELECT p_name, split_part(p_name, ' ', 1) AS blk FROM recs),
    leads AS (
        SELECT p_name, blk,
               lead(p_name, 1) OVER (PARTITION BY blk ORDER BY p_name)
                   AS n1,
               lead(p_name, 2) OVER (PARTITION BY blk ORDER BY p_name)
                   AS n2
        FROM seq),
    cand AS (
        SELECT p_name AS name_a, n1 AS name_b FROM leads
        WHERE n1 IS NOT NULL
        UNION ALL
        SELECT p_name, n2 FROM leads WHERE n2 IS NOT NULL)
    SELECT name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS INT) AS dist
    FROM cand
    WHERE levenshtein(name_a, name_b) <= 2
    ORDER BY dist, name_a, name_b
    LIMIT 50
"""

TEXTS['dedup_manifest_diff'] = """
    WITH corpus AS (
        SELECT doc_id, source, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, source, text FROM documents
        WHERE doc_id % 10 = 0),
    tagged AS MATERIALIZED (
        SELECT doc_id, source,
               ('0x' || substr(md5('manifest:' || CAST(doc_id AS VARCHAR)),
                               1, 8))::BIGINT / 4294967296.0 >= 0.8 AS is_new,
               sha256(text) AS fp
        FROM corpus),
    prev_k AS (SELECT fp, min(doc_id) AS prev_keeper FROM tagged
               WHERE NOT is_new GROUP BY fp),
    curr_k AS MATERIALIZED (
        SELECT fp, min(doc_id) AS curr_keeper FROM tagged GROUP BY fp),
    keep AS (
        SELECT t.source,
               CASE WHEN p.prev_keeper IS NULL THEN 'new_content'
                    WHEN p.prev_keeper = c.curr_keeper THEN 'retained'
                    ELSE 'displaced' END AS status
        FROM curr_k c
        LEFT JOIN prev_k p USING (fp)
        JOIN tagged t ON t.doc_id = c.curr_keeper),
    ks AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_keepers,
               CAST(sum(CASE WHEN status = 'retained' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_retained,
               CAST(sum(CASE WHEN status = 'displaced' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_displaced,
               CAST(sum(CASE WHEN status = 'new_content' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_new_content
        FROM keep GROUP BY source),
    arr AS (
        SELECT t.source,
               CAST(count(*) AS BIGINT) AS n_arrivals,
               CAST(sum(CASE WHEN c.curr_keeper IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_arrivals_kept
        FROM tagged t
        LEFT JOIN curr_k c ON c.curr_keeper = t.doc_id
        WHERE t.is_new GROUP BY t.source)
    SELECT source,
           CAST(coalesce(n_keepers, 0) AS BIGINT) AS n_keepers,
           CAST(coalesce(n_retained, 0) AS BIGINT) AS n_retained,
           CAST(coalesce(n_displaced, 0) AS BIGINT) AS n_displaced,
           CAST(coalesce(n_new_content, 0) AS BIGINT) AS n_new_content,
           CAST(coalesce(n_arrivals, 0) AS BIGINT) AS n_arrivals,
           CAST(coalesce(n_arrivals_kept, 0) AS BIGINT) AS n_arrivals_kept,
           CAST(coalesce(n_arrivals, 0) - coalesce(n_arrivals_kept, 0)
                AS BIGINT) AS n_arrivals_deduped
    FROM ks FULL OUTER JOIN arr USING (source)
    ORDER BY source
"""

TEXTS['fellegi_sunter_linkage'] = """
    WITH recs AS (
        SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nation,
               c_mktsegment AS segment,
               (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 100000
                   AS blk_band,
               (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 10000
                   AS band100,
               right(c_name, 2) AS suffix2
        FROM customer),
    nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM recs),
    useg AS (SELECT CAST(sum(c * c) AS BIGINT) AS u_seg FROM (
        SELECT CAST(count(*) AS BIGINT) AS c FROM recs GROUP BY segment)),
    uband AS (SELECT CAST(sum(c * c) AS BIGINT) AS u_band FROM (
        SELECT CAST(count(*) AS BIGINT) AS c FROM recs GROUP BY band100)),
    usuf AS (SELECT CAST(sum(c * c) AS BIGINT) AS u_suf FROM (
        SELECT CAST(count(*) AS BIGINT) AS c FROM recs GROUP BY suffix2)),
    wts AS (
        SELECT
            CAST(round(ln((19 * n * n) / (20.0 * u_seg)) * 1e6) AS BIGINT) AS wa_seg,
            CAST(round(ln((1 * n * n) / (20.0 * greatest(n * n - u_seg, 1))) * 1e6) AS BIGINT) AS wd_seg,
            CAST(round(ln((19 * n * n) / (20.0 * u_band)) * 1e6) AS BIGINT) AS wa_band,
            CAST(round(ln((1 * n * n) / (20.0 * greatest(n * n - u_band, 1))) * 1e6) AS BIGINT) AS wd_band,
            CAST(round(ln((19 * n * n) / (20.0 * u_suf)) * 1e6) AS BIGINT) AS wa_suf,
            CAST(round(ln((1 * n * n) / (20.0 * greatest(n * n - u_suf, 1))) * 1e6) AS BIGINT) AS wd_suf
        FROM useg, uband, usuf, nt),
    pairs AS (
        SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
               a.segment = b.segment AS g_seg,
               a.band100 = b.band100 AS g_band,
               a.suffix2 = b.suffix2 AS g_suf
        FROM recs a JOIN recs b
          ON a.nation = b.nation AND a.blk_band = b.blk_band
         AND a.c_custkey < b.c_custkey)
    SELECT custkey_a, custkey_b,
           (CASE WHEN g_seg THEN '1' ELSE '0' END ||
            CASE WHEN g_band THEN '1' ELSE '0' END ||
            CASE WHEN g_suf THEN '1' ELSE '0' END) AS pattern,
           CAST((CASE WHEN g_seg THEN wa_seg ELSE wd_seg END)
              + (CASE WHEN g_band THEN wa_band ELSE wd_band END)
              + (CASE WHEN g_suf THEN wa_suf ELSE wd_suf END) AS BIGINT)
               AS score_micro
    FROM pairs CROSS JOIN wts
    ORDER BY score_micro DESC, custkey_a ASC, custkey_b ASC
    LIMIT 50
"""

TEXTS['golden_record_fusion'] = """
    WITH RECURSIVE names AS (
        SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts
        FROM part GROUP BY p_name),
    planted AS (
        SELECT p_name || 's' AS p_name, CAST(0 AS BIGINT) AS n_parts
        FROM names
        WHERE ('0x' || substr(md5('sn:' || p_name), 1, 8))::BIGINT % 3 = 0
          AND p_name || 's' NOT IN (SELECT p_name FROM names)),
    recs AS (SELECT * FROM names UNION ALL SELECT * FROM planted),
    seq AS (SELECT p_name, split_part(p_name, ' ', 1) AS blk FROM recs),
    leads AS (
        SELECT p_name, blk,
               lead(p_name, 1) OVER (PARTITION BY blk ORDER BY p_name) AS n1,
               lead(p_name, 2) OVER (PARTITION BY blk ORDER BY p_name) AS n2
        FROM seq),
    cand AS (
        SELECT p_name AS name_a, n1 AS name_b FROM leads WHERE n1 IS NOT NULL
        UNION ALL
        SELECT p_name, n2 FROM leads WHERE n2 IS NOT NULL),
    pr AS (SELECT name_a, name_b FROM cand
           WHERE levenshtein(name_a, name_b) <= 1),
    edges AS (SELECT name_a AS s, name_b AS d FROM pr
              UNION SELECT name_b AS s, name_a AS d FROM pr),
    verts AS (SELECT DISTINCT s AS id FROM edges),
    reach(id, label) AS (
        SELECT id, id FROM verts
        UNION
        SELECT e.s, reach.label FROM edges e JOIN reach ON reach.id = e.d),
    cc AS (SELECT id, min(label) AS label FROM reach GROUP BY id),
    stats AS (
        SELECT p_name, CAST(min(p_partkey) AS BIGINT) AS min_key,
               CAST(max(CAST(round(p_retailprice * 100) AS BIGINT))
                    AS BIGINT) AS price_cents
        FROM part GROUP BY p_name),
    members AS (
        SELECT cc.label AS cluster, cc.id AS name, r.n_parts,
               st.min_key, st.price_cents
        FROM cc JOIN recs r ON cc.id = r.p_name
        LEFT JOIN stats st ON cc.id = st.p_name),
    canon AS (
        SELECT cluster, name AS canonical_name FROM (
            SELECT cluster, name,
                   row_number() OVER (PARTITION BY cluster
                       ORDER BY length(name), name) AS rn
            FROM members) WHERE rn = 1),
    fused AS (
        SELECT cluster, CAST(count(*) AS BIGINT) AS n_members,
               CAST(min(min_key) AS BIGINT) AS survivor_partkey,
               CAST(sum(n_parts) AS BIGINT) AS total_parts,
               CAST(max(price_cents) AS BIGINT) AS max_price_cents
        FROM members GROUP BY cluster)
    SELECT canonical_name, n_members, survivor_partkey,
           total_parts, max_price_cents
    FROM fused JOIN canon USING (cluster)
    WHERE n_members >= 2
    ORDER BY canonical_name
"""

TEXTS['blocking_quality_audit'] = """
    WITH names AS (
        SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts
        FROM part GROUP BY p_name),
    planted AS (
        SELECT p_name || 's' AS p_name, CAST(0 AS BIGINT) AS n_parts
        FROM names
        WHERE ('0x' || substr(md5('sn:' || p_name), 1, 8))::BIGINT % 3 = 0
          AND p_name || 's' NOT IN (SELECT p_name FROM names)),
    recs AS (SELECT p_name FROM names UNION ALL SELECT p_name FROM planted),
    nr AS (SELECT CAST(count(*) AS BIGINT) AS n_records FROM recs),
    truth AS (
        SELECT p_name AS name_a, p_name || 's' AS name_b
        FROM names
        WHERE ('0x' || substr(md5('sn:' || p_name), 1, 8))::BIGINT % 3 = 0
          AND p_name || 's' NOT IN (SELECT p_name FROM names)),
    seq AS (SELECT p_name, split_part(p_name, ' ', 1) AS blk FROM recs),
    leads AS (
        SELECT p_name, blk,
               lead(p_name, 1) OVER (PARTITION BY blk ORDER BY p_name) AS n1,
               lead(p_name, 2) OVER (PARTITION BY blk ORDER BY p_name) AS n2
        FROM seq),
    sn_cand AS (
        SELECT p_name AS name_a, n1 AS name_b FROM leads WHERE n1 IS NOT NULL
        UNION ALL
        SELECT p_name, n2 FROM leads WHERE n2 IS NOT NULL),
    blk2 AS (SELECT p_name, substr(p_name, 1, 1) AS c1,
                    length(p_name) // 4 AS lb
             FROM recs),
    blk_cand AS (
        SELECT a.p_name AS name_a, b.p_name AS name_b
        FROM blk2 a JOIN blk2 b
          ON a.c1 = b.c1 AND a.lb = b.lb AND a.p_name < b.p_name),
    m AS (
        SELECT 'sorted_neighborhood_w3' AS strategy,
               (SELECT CAST(count(*) AS BIGINT) FROM sn_cand) AS n_candidates,
               (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
               (SELECT CAST(count(*) AS BIGINT) FROM sn_cand c
                JOIN truth t USING (name_a, name_b)) AS n_found
        UNION ALL
        SELECT 'char1_lenband4',
               (SELECT CAST(count(*) AS BIGINT) FROM blk_cand),
               (SELECT CAST(count(*) AS BIGINT) FROM truth),
               (SELECT CAST(count(*) AS BIGINT) FROM blk_cand c
                JOIN truth t USING (name_a, name_b)))
    SELECT strategy, nr.n_records, m.n_candidates, m.n_truth, m.n_found,
           CAST(m.n_found::HUGEINT * 1000000 // m.n_truth::HUGEINT
                AS BIGINT) AS recall_micro,
           CAST((nr.n_records::HUGEINT * (nr.n_records - 1) // 2
                 - m.n_candidates) * 1000000
                // (nr.n_records::HUGEINT * (nr.n_records - 1) // 2)
                AS BIGINT) AS reduction_micro
    FROM m CROSS JOIN nr
    ORDER BY strategy
"""
