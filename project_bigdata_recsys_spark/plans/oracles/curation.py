"""DuckDB oracle SQL texts — curation family.

Moved verbatim out of plans/queries.py (r12 verdict task 5: the
11k-line registry split).  These are DATA, not code: each entry
is the ANSI-SQL twin the driver runs against the same parquet
tables; plans/queries.py re-exports them into ORACLES at the
original registration sites, so registry order and text bytes
are unchanged.  Oracle-parity rules live in the queries.py
docstring.
"""

TEXTS: dict[str, str] = {}

TEXTS['weighted_sample'] = """
    WITH scored AS (
        SELECT doc_id, lang,
               len(string_split(text, ' ')) AS weight,
               pow((('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1.0)
                       / 4294967296.0,
                   1.0 / len(string_split(text, ' '))) AS ares_key
        FROM documents
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY ares_key DESC, doc_id) AS rn
        FROM scored
    )
    SELECT lang,
           CAST(rn AS INTEGER) AS rn,
           doc_id,
           CAST(weight AS INTEGER) AS weight,
           round(ares_key, 6) AS ares_key
    FROM ranked
    WHERE rn <= 10
    ORDER BY lang, rn
"""

TEXTS['source_mixture'] = """
    WITH t AS (
        SELECT doc_id, source,
               len(list_filter(string_split(text, ' '),
                               x -> length(x) > 0)) AS n_tokens
        FROM documents),
    sizes AS (SELECT source, count(*) AS n_docs FROM t GROUP BY source),
    wts AS (SELECT source, n_docs, pow(n_docs, 0.5) AS w_raw FROM sizes),
    tot AS (SELECT sum(w_raw) AS w_sum FROM wts),
    quotas AS (
        SELECT source, n_docs,
               round(w_raw / w_sum, 6) AS mix_weight,
               CAST(round(200 * w_raw / w_sum, 0) AS BIGINT) AS quota
        FROM wts CROSS JOIN tot),
    ranked AS (
        SELECT source, n_tokens,
               row_number() OVER (PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM t),
    sampled AS (
        SELECT r.source, count(*) AS n_sampled,
               sum(n_tokens) AS sampled_tokens
        FROM ranked r JOIN quotas q ON r.source = q.source
        WHERE r.rk <= q.quota GROUP BY r.source)
    SELECT q.source, CAST(q.n_docs AS BIGINT) AS n_docs, q.mix_weight,
           CAST(coalesce(s.n_sampled, 0) AS BIGINT) AS n_sampled,
           CAST(coalesce(s.sampled_tokens, 0) AS BIGINT) AS sampled_tokens
    FROM quotas q LEFT JOIN sampled s ON q.source = s.source
    ORDER BY q.source
"""

TEXTS['length_bucketed_batches'] = """
    WITH t AS (
        SELECT doc_id,
               len(list_filter(string_split(text, ' '),
                               x -> length(x) > 0)) AS n_tokens
        FROM documents),
    ranked AS (
        SELECT doc_id, n_tokens,
               percent_rank() OVER (ORDER BY n_tokens, doc_id) AS pr
        FROM t),
    placed AS (
        SELECT n_tokens,
               least(CAST(floor(pr * 8) AS INT), 7) AS bucket,
               row_number() OVER (
                   PARTITION BY least(CAST(floor(pr * 8) AS INT), 7)
                   ORDER BY n_tokens, doc_id) AS rk
        FROM ranked),
    b AS (
        SELECT bucket, CAST(floor((rk - 1) / 16) AS BIGINT) AS batch_no,
               count(*) AS n_in_batch, max(n_tokens) AS batch_max,
               sum(n_tokens) AS batch_mass
        FROM placed GROUP BY 1, 2)
    SELECT bucket,
           CAST(sum(n_in_batch) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_batches,
           CAST(sum(batch_mass) AS BIGINT) AS token_mass,
           CAST(sum(n_in_batch * batch_max - batch_mass) AS BIGINT)
               AS padded_tokens,
           round(sum(n_in_batch * batch_max - batch_mass) * 1.0
                 / (sum(batch_mass)
                    + sum(n_in_batch * batch_max - batch_mass)), 4)
               AS pad_ratio
    FROM b GROUP BY bucket ORDER BY bucket
"""

TEXTS['pack_sequences_boundaries'] = """
    WITH t AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                    % 4 AS INT) AS shard,
               len(list_filter(string_split(text, ' '),
                               x -> length(x) > 0)) AS n_tokens
        FROM documents),
    p AS (
        SELECT lang, shard, n_tokens,
               CAST(floor((sum(n_tokens + 2) OVER (PARTITION BY lang, shard
                    ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                    - (n_tokens + 2)) / 256.0) AS BIGINT) AS seq_no
        FROM t)
    SELECT lang, shard, seq_no, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           round(least(1.0, (sum(n_tokens) + count(*) * 2) / 256.0), 4)
               AS fill_ratio
    FROM p GROUP BY lang, shard, seq_no ORDER BY lang, shard, seq_no
"""

TEXTS['packing_efficiency_sweep'] = """
    SELECT * FROM (
        SELECT 128 AS budget,
               CAST(count(*) AS BIGINT) AS n_sequences,
               CAST(sum(n_docs) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS token_mass,
               CAST(sum(n_docs) * 2 AS BIGINT) AS boundary_mass,
               round((sum(n_tokens) + sum(n_docs) * 2) * 1.0
                     / (count(*) * 128), 4) AS utilization
        FROM (
            SELECT seq_no, lang, shard,
                   count(*) AS n_docs, sum(n_tokens) AS n_tokens
            FROM (
                SELECT lang, shard, n_tokens,
                       CAST(floor((sum(n_tokens + 2) OVER (
                            PARTITION BY lang, shard
                            ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                            - (n_tokens + 2)) / 128.0) AS BIGINT) AS seq_no
                FROM (
                    SELECT doc_id, lang,
                           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                                % 4 AS INT) AS shard,
                           len(list_filter(string_split(text, ' '),
                                           x -> length(x) > 0)) AS n_tokens
                    FROM documents))
            GROUP BY lang, shard, seq_no)
        UNION ALL
        SELECT 256 AS budget,
               CAST(count(*) AS BIGINT) AS n_sequences,
               CAST(sum(n_docs) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS token_mass,
               CAST(sum(n_docs) * 2 AS BIGINT) AS boundary_mass,
               round((sum(n_tokens) + sum(n_docs) * 2) * 1.0
                     / (count(*) * 256), 4) AS utilization
        FROM (
            SELECT seq_no, lang, shard,
                   count(*) AS n_docs, sum(n_tokens) AS n_tokens
            FROM (
                SELECT lang, shard, n_tokens,
                       CAST(floor((sum(n_tokens + 2) OVER (
                            PARTITION BY lang, shard
                            ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                            - (n_tokens + 2)) / 256.0) AS BIGINT) AS seq_no
                FROM (
                    SELECT doc_id, lang,
                           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                                % 4 AS INT) AS shard,
                           len(list_filter(string_split(text, ' '),
                                           x -> length(x) > 0)) AS n_tokens
                    FROM documents))
            GROUP BY lang, shard, seq_no)
        UNION ALL
        SELECT 512 AS budget,
               CAST(count(*) AS BIGINT) AS n_sequences,
               CAST(sum(n_docs) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS token_mass,
               CAST(sum(n_docs) * 2 AS BIGINT) AS boundary_mass,
               round((sum(n_tokens) + sum(n_docs) * 2) * 1.0
                     / (count(*) * 512), 4) AS utilization
        FROM (
            SELECT seq_no, lang, shard,
                   count(*) AS n_docs, sum(n_tokens) AS n_tokens
            FROM (
                SELECT lang, shard, n_tokens,
                       CAST(floor((sum(n_tokens + 2) OVER (
                            PARTITION BY lang, shard
                            ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                            - (n_tokens + 2)) / 512.0) AS BIGINT) AS seq_no
                FROM (
                    SELECT doc_id, lang,
                           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                                % 4 AS INT) AS shard,
                           len(list_filter(string_split(text, ' '),
                                           x -> length(x) > 0)) AS n_tokens
                    FROM documents))
            GROUP BY lang, shard, seq_no)
    ) ORDER BY budget
"""

TEXTS['kfold_assignment'] = """
    SELECT CAST(('0x' || substr(md5('fold:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                % 5 AS INT) AS fold,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0, 4)
               AS total_value
    FROM events GROUP BY fold ORDER BY fold
"""

TEXTS['negative_samples'] = """
    WITH pos AS (
        SELECT DISTINCT o.o_custkey AS user_id, l.l_partkey AS item_id
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    n AS (SELECT max(l_partkey) AS n_items FROM lineitem),
    slots AS (
        SELECT u.user_id, s.slot, n.n_items
        FROM (SELECT DISTINCT user_id FROM pos) u
        CROSS JOIN n
        CROSS JOIN (SELECT unnest(range(0, 6)) AS slot) s),
    cand AS (
        SELECT user_id, slot,
               ('0x' || substr(md5('neg:' || CAST(user_id AS VARCHAR)
                    || ':' || CAST(slot AS VARCHAR)), 1, 8))::BIGINT
                   % n_items + 1 AS item_id
        FROM slots),
    neg AS (
        SELECT c.user_id, c.slot, c.item_id
        FROM cand c LEFT JOIN pos p USING (user_id, item_id)
        WHERE p.user_id IS NULL),
    ranked AS (
        SELECT user_id, slot, item_id,
               row_number() OVER (PARTITION BY user_id ORDER BY slot) AS rn
        FROM neg)
    SELECT user_id, CAST(slot AS INT) AS slot, item_id
    FROM ranked WHERE rn <= 3 ORDER BY user_id, slot LIMIT 500
"""

TEXTS['domain_quota_sample'] = """
    WITH dom AS (
        SELECT doc_id, source,
               CAST(floor(u * u * 150.0) AS BIGINT) AS domain_idx
        FROM (
            SELECT doc_id, source,
                   ('0x' || substr(md5('domain:' || CAST(doc_id AS VARCHAR)),
                                   1, 8))::BIGINT / 4294967296.0 AS u
            FROM documents)),
    ranked AS (
        SELECT doc_id, source, domain_idx,
               row_number() OVER (
                   PARTITION BY domain_idx
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM dom)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT domain_idx) AS BIGINT) AS n_domains,
           CAST(sum(CASE WHEN rk <= 20 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(sum(CASE WHEN rk > 20 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped
    FROM ranked
    GROUP BY source
    ORDER BY source
"""

TEXTS['incremental_domain_quota'] = """
    WITH dom AS (
        SELECT doc_id, source,
               CAST(floor(u * u * 150.0) AS BIGINT) AS domain_idx
        FROM (
            SELECT doc_id, source,
                   ('0x' || substr(md5('domain:' || CAST(doc_id AS VARCHAR)),
                                   1, 8))::BIGINT / 4294967296.0 AS u
            FROM documents)),
    state AS (
        SELECT domain_idx,
               CAST(sum(CASE WHEN rk <= 20 THEN 1 ELSE 0 END) AS BIGINT)
                   AS prior_admitted
        FROM (
            SELECT domain_idx,
                   row_number() OVER (
                       PARTITION BY domain_idx
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
            FROM dom WHERE doc_id % 7 <> 0)
        GROUP BY domain_idx),
    batch AS (
        SELECT doc_id, source, domain_idx,
               row_number() OVER (
                   PARTITION BY domain_idx
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM dom WHERE doc_id % 7 = 0),
    j AS (
        SELECT b.source, b.domain_idx,
               COALESCE(s.prior_admitted, 0) AS prior_admitted,
               CASE WHEN COALESCE(s.prior_admitted, 0) + b.rk <= 20
                    THEN 1 ELSE 0 END AS admit
        FROM batch b LEFT JOIN state s ON s.domain_idx = b.domain_idx)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_batch,
           CAST(sum(admit) AS BIGINT) AS n_admitted,
           CAST(sum(1 - admit) AS BIGINT) AS n_rejected,
           CAST(count(DISTINCT CASE WHEN prior_admitted >= 20
                                    THEN domain_idx END) AS BIGINT)
               AS n_saturated_domains
    FROM j
    GROUP BY source
    ORDER BY source
"""

TEXTS['domain_reweight'] = """
    WITH t2 AS (
        SELECT doc_id, source, term FROM (
            SELECT doc_id, source,
                   unnest(string_split(text, ' ')) AS term
            FROM documents)
        WHERE length(term) > 0),
    vocab AS (SELECT term, count(*) AS n_term FROM t2 GROUP BY term),
    tot AS (SELECT sum(n_term) AS n_total FROM vocab),
    scored AS (
        SELECT doc_id, source,
               round(avg(-ln(n_term * 1.0 / n_total)), 4) AS score
        FROM t2 JOIN vocab USING (term) CROSS JOIN tot
        GROUP BY doc_id, source),
    per_source AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CAST(round(score * 10000) AS BIGINT)) AS BIGINT)
                   AS s4
        FROM scored GROUP BY source),
    corpus AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_all,
                      CAST(sum(s4) AS BIGINT) AS s4_all
               FROM per_source),
    wt AS (
        SELECT source, n_docs,
               round(n_docs * 1.0 / n_all, 6) AS base_share,
               round(s4 / 10000.0 / n_docs, 4) AS avg_logloss,
               round(round(s4 / 10000.0 / n_docs, 4)
                     - round(s4_all / 10000.0 / n_all, 4), 4) AS excess,
               CAST(round(1000000.0 * (n_docs * 1.0 / n_all)
                          * exp(round(round(s4 / 10000.0 / n_docs, 4)
                                      - round(s4_all / 10000.0 / n_all,
                                              4), 4)))
                    AS BIGINT) AS wm
        FROM per_source CROSS JOIN corpus),
    den AS (SELECT CAST(sum(wm) AS BIGINT) AS wsum FROM wt)
    SELECT source, n_docs, base_share, avg_logloss, excess,
           round(wm * 1.0 / wsum, 6) AS new_share
    FROM wt CROSS JOIN den ORDER BY source
"""

TEXTS['dsir_importance_sample'] = """
    WITH d AS (
        SELECT doc_id, source,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS tgt,
               list_filter(string_split(text, ' '), t -> length(t) > 0)
                   AS toks
        FROM documents),
    f AS (
        SELECT doc_id, tgt,
               unnest(list_concat(toks,
                   CASE WHEN len(toks) >= 2
                        THEN list_transform(range(1, len(toks)),
                                            i -> toks[i] || '_' || toks[i + 1])
                        ELSE [] END)) AS term
        FROM d),
    h AS (
        SELECT doc_id, tgt,
               ('0x' || substr(md5('dsir:' || term), 1, 8))::BIGINT % 512
                   AS bucket
        FROM f),
    counts AS (
        SELECT bucket, CAST(sum(tgt) AS BIGINT) AS ct,
               CAST(sum(1 - tgt) AS BIGINT) AS cr
        FROM h GROUP BY bucket),
    tot AS (SELECT CAST(sum(ct) AS BIGINT) AS T,
                   CAST(sum(cr) AS BIGINT) AS R FROM counts),
    wts AS (
        SELECT bucket,
               CAST(round(1000000.0 * (ln((ct + 1) / (T + 512.0))
                                       - ln((cr + 1) / (R + 512.0))))
                    AS BIGINT) AS w
        FROM counts CROSS JOIN tot),
    docw AS (
        SELECT doc_id, CAST(sum(w) AS BIGINT) AS lw
        FROM h JOIN wts USING (bucket) GROUP BY doc_id),
    scored AS (
        SELECT d.doc_id, d.source, d.tgt, coalesce(docw.lw, 0) AS lw
        FROM d LEFT JOIN docw USING (doc_id))
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(1 - tgt) AS BIGINT) AS n_raw,
           round(sum(lw) / 1000000.0 / count(*), 6) AS avg_logw,
           CAST(sum(CASE WHEN tgt = 0 AND lw > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_selected,
           round(CASE WHEN sum(1 - tgt) > 0
                      THEN sum(CASE WHEN tgt = 0 AND lw > 0
                                    THEN 1 ELSE 0 END)
                           * 1.0 / sum(1 - tgt)
                      ELSE 0.0 END, 4) AS sel_frac
    FROM scored GROUP BY source ORDER BY source
"""

TEXTS['mixture_temperature_sweep'] = """
    WITH t AS (
        SELECT source,
               len(list_filter(string_split(text, ' '),
                               x -> length(x) > 0)) AS n_tokens
        FROM documents),
    sizes AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS src_tokens
        FROM t GROUP BY source),
    tot AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS total FROM sizes),
    alphas AS (SELECT unnest([0.2, 0.3, 0.5, 0.7, 1.0]) AS alpha),
    fanned AS (
        SELECT alpha, source, n_docs, src_tokens,
               src_tokens * 1.0 / total AS p,
               CAST(round(pow(src_tokens * 1.0 / total, alpha) * 1e6, 0)
                    AS BIGINT) AS w_micro
        FROM sizes CROSS JOIN tot CROSS JOIN alphas),
    norms AS (SELECT alpha, CAST(sum(w_micro) AS BIGINT) AS w_sum
              FROM fanned GROUP BY alpha),
    shared AS (
        SELECT f.*, w_micro * 1.0 / w_sum AS share
        FROM fanned f JOIN norms USING (alpha)),
    ent AS (
        SELECT alpha,
               round(sum(CAST(round(-share * ln(share) * 1e9, 0) AS BIGINT))
                     / 1e9, 6) AS mix_entropy
        FROM shared GROUP BY alpha)
    SELECT alpha, source, n_docs, src_tokens,
           round(p, 6) AS base_share,
           round(share, 6) AS sampling_share,
           round(share / p, 4) AS boost,
           mix_entropy
    FROM shared JOIN ent USING (alpha)
    ORDER BY alpha, source
"""

TEXTS['training_data_card'] = r"""
    WITH corpus AS (
        SELECT doc_id, source, lang, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, source, lang, text FROM documents
        WHERE ('0x' || substr(md5('card:' || CAST(doc_id AS VARCHAR)),
                              1, 8))::BIGINT / 4294967296.0 < 0.1),
    tok AS (
        SELECT source, lang,
               len(list_filter(string_split(text, ' '),
                               x -> length(x) > 0)) AS n_tokens
        FROM corpus),
    lc AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(n_tokens) AS BIGINT) AS toks
           FROM tok GROUP BY source, lang),
    st AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
                  CAST(sum(toks) AS BIGINT) AS n_tokens
           FROM lc GROUP BY source),
    ent AS (
        SELECT source,
               round(sum(CAST(round(-(n * 1.0 / n_docs)
                                    * ln(n * 1.0 / n_docs) * 1e9)
                              AS BIGINT)) / 1e9, 6) AS lang_entropy
        FROM lc JOIN st USING (source) GROUP BY source),
    fps AS (SELECT source, sha256(text) AS fp FROM corpus),
    fpc AS (SELECT fp, count(*) AS cnt FROM fps GROUP BY fp),
    dups AS (
        SELECT source,
               CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS dup_docs
        FROM fps JOIN fpc USING (fp) GROUP BY source),
    exposed AS (
        SELECT source,
               (CASE WHEN doc_id % 13 = 0
                     THEN 'call 555-'
                          || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                          || '-'
                          || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                          || ' '
                     ELSE '' END)
               || text
               || (CASE WHEN doc_id % 7 = 0
                        THEN ' key AKIA' || upper(substr(
                             md5('aws:' || CAST(doc_id AS VARCHAR)), 1, 16))
                        ELSE '' END)
               || (CASE WHEN doc_id % 11 = 0
                        THEN ' token ' || md5('hex:' || CAST(doc_id AS VARCHAR))
                        ELSE '' END)
               || (CASE WHEN doc_id % 13 = 0
                        THEN ' Bearer sk-' || substr(
                             md5('sk:' || CAST(doc_id AS VARCHAR)), 1, 20)
                        ELSE '' END)
               || (CASE WHEN doc_id % 7 = 0
                        THEN ' contact user' || CAST(doc_id AS VARCHAR)
                             || '@example.com'
                        ELSE '' END)
               || (CASE WHEN doc_id % 11 = 0
                        THEN ' see https://docs.example/'
                             || CAST(doc_id AS VARCHAR)
                        ELSE '' END) AS text
        FROM corpus),
    exp2 AS (
        SELECT source,
               CASE WHEN len(regexp_extract_all(text,
                        '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))
                       + len(regexp_extract_all(text, 'https?://[^ ]+'))
                       + len(regexp_extract_all(text, '\d{3}-\d{3}-\d{4}'))
                       > 0 THEN 1 ELSE 0 END AS has_pii,
               CASE WHEN len(regexp_extract_all(text, 'AKIA[0-9A-F]{16}'))
                       + len(regexp_extract_all(text, '\b[0-9a-f]{32}\b'))
                       + len(regexp_extract_all(text, 'sk-[0-9a-f]{20}'))
                       > 0 THEN 1 ELSE 0 END AS has_secret
        FROM exposed),
    expo AS (
        SELECT source, CAST(sum(has_pii) AS BIGINT) AS pii_docs,
               CAST(sum(has_secret) AS BIGINT) AS secret_docs
        FROM exp2 GROUP BY source),
    t2 AS (
        SELECT doc_id, source, term FROM (
            SELECT doc_id, source,
                   unnest(string_split(text, ' ')) AS term
            FROM documents)
        WHERE length(term) > 0),
    vocab AS (SELECT term, count(*) AS n_term FROM t2 GROUP BY term),
    tot AS (SELECT sum(n_term) AS n_total FROM vocab),
    scored AS (
        SELECT doc_id, source,
               round(avg(-ln(n_term * 1.0 / n_total)), 4) AS score
        FROM t2 JOIN vocab USING (term) CROSS JOIN tot
        GROUP BY doc_id, source),
    quality AS (
        SELECT source,
               round(sum(CAST(round(score * 10000) AS BIGINT))
                     / 10000.0 / count(*), 4) AS mean_lm_score
        FROM scored GROUP BY source)
    SELECT s.source, n_docs, n_tokens, dup_docs,
           round(dup_docs * 1.0 / n_docs, 6) AS dup_rate,
           mean_lm_score,
           pii_docs, round(pii_docs * 1.0 / n_docs, 6) AS pii_rate,
           secret_docs, round(secret_docs * 1.0 / n_docs, 6) AS secret_rate,
           lang_entropy
    FROM st s
    JOIN ent USING (source) JOIN dups USING (source)
    JOIN expo USING (source) JOIN quality USING (source)
    ORDER BY source
"""

TEXTS['ipf_weight_calibration'] = """
    WITH cells AS (
        SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) * 1000000 AS w
        FROM documents GROUP BY lang, source),
    tot AS (
        SELECT CAST(sum(w) AS BIGINT) AS wt,
               CAST(count(DISTINCT lang) AS BIGINT) AS nl,
               CAST(count(DISTINCT source) AS BIGINT) AS ns
        FROM cells),
    lt AS (
        SELECT lang, row_number() OVER (ORDER BY lang) AS rk
        FROM (SELECT DISTINCT lang FROM cells)),
    st AS (
        SELECT source, row_number() OVER (ORDER BY source) AS rk
        FROM (SELECT DISTINCT source FROM cells)),
    c0 AS (
        SELECT c.lang, c.source, c.n_docs, CAST(c.w AS HUGEINT) AS w,
               (wt // nl) + CASE WHEN lt.rk <= wt % nl THEN 1 ELSE 0 END AS t_l,
               (wt // ns) + CASE WHEN st.rk <= wt % ns THEN 1 ELSE 0 END AS t_s
        FROM cells c CROSS JOIN tot
        JOIN lt ON c.lang = lt.lang JOIN st ON c.source = st.source),
    i1a AS (
        SELECT lang, source, n_docs, t_l, t_s,
               (w * t_l) // GREATEST(sum(w) OVER (PARTITION BY lang), 1) AS w
        FROM c0),
    i1b AS (
        SELECT lang, source, n_docs, t_l, t_s,
               (w * t_s) // GREATEST(sum(w) OVER (PARTITION BY source), 1) AS w
        FROM i1a),
    i2a AS (
        SELECT lang, source, n_docs, t_l, t_s,
               (w * t_l) // GREATEST(sum(w) OVER (PARTITION BY lang), 1) AS w
        FROM i1b),
    i2b AS (
        SELECT lang, source, n_docs, t_l, t_s,
               (w * t_s) // GREATEST(sum(w) OVER (PARTITION BY source), 1) AS w
        FROM i2a),
    i3a AS (
        SELECT lang, source, n_docs, t_l, t_s,
               (w * t_l) // GREATEST(sum(w) OVER (PARTITION BY lang), 1) AS w
        FROM i2b),
    i3b AS (
        SELECT lang, source, n_docs, t_l, t_s,
               (w * t_s) // GREATEST(sum(w) OVER (PARTITION BY source), 1) AS w
        FROM i3a)
    SELECT lang, source, n_docs, CAST(w AS BIGINT) AS weight_micro
    FROM i3b ORDER BY lang, source
"""
