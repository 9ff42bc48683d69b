"""DuckDB oracle SQL texts — text family.

Moved verbatim out of plans/queries.py (r12 verdict task 5: the
11k-line registry split).  These are DATA, not code: each entry
is the ANSI-SQL twin the driver runs against the same parquet
tables; plans/queries.py re-exports them into ORACLES at the
original registration sites, so registry order and text bytes
are unchanged.  Oracle-parity rules live in the queries.py
docstring.
"""

TEXTS: dict[str, str] = {}

TEXTS['quality_percentile_filter'] = """
    WITH scored AS (
        SELECT doc_id, lang,
               round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                     / length(text), 4)
               - round(len(list_filter(string_split(text, ' '),
                                       t -> t IN ('the', 'a', 'of', 'and'))) * 1.0
                       / len(string_split(text, ' ')), 4) AS score
        FROM documents),
    ranked AS (
        SELECT lang, score,
               percent_rank() OVER (ORDER BY score, doc_id) AS pr
        FROM scored)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_kept,
           round(avg(score), 6) AS avg_score,
           round(min(score), 6) AS min_score
    FROM ranked WHERE pr >= 0.25
    GROUP BY lang ORDER BY lang
"""

TEXTS['entropy_profile'] = """
    WITH toks AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        FROM documents),
    counts AS (
        SELECT doc_id, lang, tok, count(*) AS n
        FROM toks GROUP BY doc_id, lang, tok),
    per_doc AS (
        SELECT doc_id, lang,
               CAST(sum(n) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS n_distinct,
               round(log2(sum(n)) - sum(n * log2(n)) / sum(n), 6) AS entropy
        FROM counts GROUP BY doc_id, lang)
    SELECT doc_id, lang, n_tokens, n_distinct, entropy
    FROM per_doc
    ORDER BY entropy, doc_id
    LIMIT 30
"""

TEXTS['corpus_mixture_tokens'] = """
    WITH t AS (
        SELECT doc_id, lang,
               len(list_filter(string_split(text, ' '),
                               x -> length(x) > 0)) AS n_tokens
        FROM documents),
    sizes AS (
        SELECT lang, sum(n_tokens) AS lang_tokens, count(*) AS n_docs
        FROM t GROUP BY lang),
    wts AS (SELECT lang, n_docs, lang_tokens,
                   pow(lang_tokens, 0.5) AS w_raw FROM sizes),
    tot AS (SELECT sum(w_raw) AS w_sum FROM wts),
    quotas AS (
        SELECT lang, n_docs,
               CAST(lang_tokens AS BIGINT) AS lang_tokens,
               round(w_raw / w_sum, 6) AS mix_weight,
               CAST(round(20000 * w_raw / w_sum, 0) AS BIGINT) AS token_quota
        FROM wts CROSS JOIN tot),
    ranked AS (
        SELECT lang, n_tokens,
               coalesce(sum(n_tokens) OVER (PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
        FROM t),
    admitted AS (
        SELECT r.lang, count(*) AS n_sampled, sum(r.n_tokens) AS sampled_tokens
        FROM ranked r JOIN quotas q ON r.lang = q.lang
        WHERE r.cum_before < q.token_quota
        GROUP BY r.lang)
    SELECT q.lang, CAST(q.n_docs AS BIGINT) AS n_docs, q.lang_tokens,
           q.mix_weight, q.token_quota,
           CAST(coalesce(a.n_sampled, 0) AS BIGINT) AS n_sampled,
           CAST(coalesce(a.sampled_tokens, 0) AS BIGINT) AS sampled_tokens
    FROM quotas q LEFT JOIN admitted a ON q.lang = a.lang
    ORDER BY q.lang
"""

TEXTS['augment_token_dropout'] = """
    WITH toks AS (
        SELECT doc_id, lang, string_split(text, ' ') AS ts, text
        FROM documents),
    pos AS (
        SELECT doc_id, lang, ts, text,
               unnest(range(1, len(ts) + 1)) AS p
        FROM toks),
    scored AS (
        SELECT doc_id, lang, text, len(ts) AS n_tokens, p, ts[p] AS tok,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                                   CAST(p - 1 AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u
        FROM pos)
    SELECT doc_id, lang,
           CAST(min(n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN u >= 0.15 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           sha256(min(text)) AS orig_sha,
           sha256(coalesce(string_agg(tok, ' ' ORDER BY p)
                           FILTER (WHERE u >= 0.15), '')) AS aug_sha
    FROM scored
    GROUP BY doc_id, lang
    ORDER BY doc_id
    LIMIT 200
"""

TEXTS['corpus_mixture_tokens_sharded'] = """
    WITH t AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                    % 4 AS INT) AS shard,
               len(list_filter(string_split(text, ' '),
                               x -> length(x) > 0)) AS n_tokens
        FROM documents),
    sizes AS (
        SELECT lang, sum(n_tokens) AS lang_tokens, count(*) AS n_docs
        FROM t GROUP BY lang),
    wts AS (SELECT lang, n_docs, lang_tokens,
                   pow(lang_tokens, 0.5) AS w_raw FROM sizes),
    tot AS (SELECT sum(w_raw) AS w_sum FROM wts),
    quotas AS (
        SELECT lang, n_docs,
               CAST(lang_tokens AS BIGINT) AS lang_tokens,
               round(w_raw / w_sum, 6) AS mix_weight,
               CAST(round(20000 * w_raw / w_sum, 0) AS BIGINT) AS token_quota
        FROM wts CROSS JOIN tot),
    ranked AS (
        SELECT lang, shard, n_tokens,
               coalesce(sum(n_tokens) OVER (PARTITION BY lang, shard
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
        FROM t),
    admitted AS (
        SELECT r.lang, count(*) AS n_sampled, sum(r.n_tokens) AS sampled_tokens
        FROM ranked r JOIN quotas q ON r.lang = q.lang
        WHERE r.cum_before < q.token_quota // 4
                             + (CASE WHEN r.shard < q.token_quota % 4
                                THEN 1 ELSE 0 END)
        GROUP BY r.lang)
    SELECT q.lang, CAST(q.n_docs AS BIGINT) AS n_docs, q.lang_tokens,
           q.mix_weight, q.token_quota,
           CAST(coalesce(a.n_sampled, 0) AS BIGINT) AS n_sampled,
           CAST(coalesce(a.sampled_tokens, 0) AS BIGINT) AS sampled_tokens
    FROM quotas q LEFT JOIN admitted a ON q.lang = a.lang
    ORDER BY q.lang
"""

TEXTS['unigram_logloss'] = """
    WITH t2 AS (
        SELECT doc_id, lang, term FROM (
            SELECT doc_id, lang,
                   unnest(string_split(text, ' ')) AS term
            FROM documents)
        WHERE length(term) > 0),
    vocab AS (SELECT term, count(*) AS n_term FROM t2 GROUP BY term),
    tot AS (SELECT sum(n_term) AS n_total FROM vocab)
    SELECT doc_id, lang, CAST(count(*) AS INTEGER) AS n_tokens,
           round(avg(-ln(n_term * 1.0 / n_total)), 4) AS avg_logloss
    FROM t2 JOIN vocab USING (term) CROSS JOIN tot
    GROUP BY doc_id, lang ORDER BY doc_id LIMIT 500
"""

TEXTS['source_vocabulary_profile'] = """
    WITH t AS (
        SELECT source, substr(md5(term), 1, 16) AS h FROM (
            SELECT source, unnest(string_split(text, ' ')) AS term
            FROM documents)
        WHERE length(term) > 0)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT h) AS BIGINT) AS n_terms,
           round(count(DISTINCT h) * 1.0 / count(*), 4) AS ttr
    FROM t GROUP BY source ORDER BY source
"""

TEXTS['prefix_cache_savings'] = """
    WITH corpus AS (
        SELECT doc_id, text, lang FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text, lang FROM documents
        WHERE doc_id % 10 = 0),
    pref AS (
        SELECT lang,
               md5(array_to_string(list_slice(toks, 1, 8), ' ')) AS prefix_fp,
               least(len(toks), 8) AS prefix_tokens,
               len(toks) AS n_tokens
        FROM (SELECT lang,
                     list_filter(string_split(text, ' '),
                                 x -> length(x) > 0) AS toks
              FROM corpus)),
    groups AS (
        SELECT lang, prefix_fp, count(*) AS n_docs,
               min(prefix_tokens) AS prefix_tokens,
               sum(n_tokens) AS group_tokens
        FROM pref GROUP BY lang, prefix_fp)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_prefix_groups,
           CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared_groups,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum((n_docs - 1) * prefix_tokens) AS BIGINT) AS saved_tokens,
           round(sum((n_docs - 1) * prefix_tokens) * 1.0
                 / sum(group_tokens), 6) AS saved_frac
    FROM groups GROUP BY lang ORDER BY lang
"""

TEXTS['bpe_pair_counts'] = """
    WITH words AS (
        SELECT w, count(*) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE length(w) >= 2
        GROUP BY w),
    pairs AS (
        SELECT w, freq,
               substring(w, i, 1) AS sym_a,
               substring(w, i + 1, 1) AS sym_b
        FROM words, unnest(range(1, length(w))) AS t(i))
    SELECT sym_a, sym_b,
           CAST(sum(freq) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT w) AS BIGINT) AS n_words
    FROM pairs
    GROUP BY sym_a, sym_b
    ORDER BY n_pairs DESC, sym_a, sym_b
    LIMIT 50
"""

TEXTS['bm25_scores'] = """
    WITH toks AS (
        SELECT doc_id, w AS term
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents)
        WHERE length(w) > 0),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM toks GROUP BY doc_id, term),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
           FROM toks GROUP BY doc_id),
    dft AS (SELECT term, CAST(count(*) AS BIGINT) AS doc_freq,
                   CAST(sum(tf) AS BIGINT) AS total_tf
            FROM tf GROUP BY term),
    q AS (SELECT term, doc_freq FROM dft
          ORDER BY total_tf DESC, term LIMIT 3),
    c AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n,
                 (SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS sum_dl),
    scored AS (
        SELECT tf.term, tf.doc_id, tf.tf, dl.dl,
               round(ln(1.0 + (c.n - q.doc_freq + 0.5) / (q.doc_freq + 0.5))
                     * tf.tf * (1.2 + 1.0)
                     / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl * c.n / c.sum_dl)),
                     6) AS bm25
        FROM tf JOIN q ON tf.term = q.term
                JOIN dl ON tf.doc_id = dl.doc_id
                CROSS JOIN c),
    ranked AS (
        SELECT term AS query_term, doc_id, tf, dl, bm25,
               row_number() OVER (PARTITION BY term
                                  ORDER BY bm25 DESC, doc_id) AS rk
        FROM scored)
    SELECT query_term, CAST(rk AS INT) AS rk, doc_id, tf, dl, bm25
    FROM ranked WHERE rk <= 10
    ORDER BY query_term, rk
"""

TEXTS['vocab_coverage_curve'] = """
    WITH vocab AS (
        SELECT w AS term, CAST(count(*) AS BIGINT) AS mass
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE length(w) > 0
        GROUP BY w),
    ranked AS (
        SELECT term, mass,
               row_number() OVER (ORDER BY mass DESC, term) AS rk
        FROM vocab),
    t AS (SELECT CAST(sum(mass) AS BIGINT) AS total_tokens,
                 CAST(count(*) AS BIGINT) AS vocab_size
          FROM vocab),
    ks AS (SELECT CAST(power(2, i) AS BIGINT) AS k
           FROM range(0, 6) AS u(i)),
    cov AS (
        SELECT ks.k, CAST(count(*) AS BIGINT) AS n_terms,
               CAST(sum(mass) AS BIGINT) AS covered_tokens
        FROM ranked JOIN ks ON ranked.rk <= ks.k
        GROUP BY ks.k)
    SELECT k, n_terms, covered_tokens, total_tokens, vocab_size,
           round(covered_tokens / total_tokens, 6) AS coverage
    FROM cov CROSS JOIN t ORDER BY k
"""

TEXTS['lang_source_chi2'] = """
    WITH cells AS (
        SELECT lang, source, CAST(count(*) AS BIGINT) AS observed
        FROM documents GROUP BY lang, source),
    rt AS (SELECT lang, CAST(sum(observed) AS BIGINT) AS lang_n
           FROM cells GROUP BY lang),
    ct AS (SELECT source, CAST(sum(observed) AS BIGINT) AS source_n
           FROM cells GROUP BY source),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                  CAST(count(DISTINCT source) AS BIGINT) AS n_sources
           FROM documents),
    scored AS (
        SELECT c.lang, c.source, c.observed,
               round(rt.lang_n * ct.source_n / nn.n, 6) AS expected,
               round((c.observed - rt.lang_n * ct.source_n / nn.n)
                     * (c.observed - rt.lang_n * ct.source_n / nn.n)
                     / (rt.lang_n * ct.source_n / nn.n), 6) AS contrib,
               CAST(round(round((c.observed - rt.lang_n * ct.source_n / nn.n)
                     * (c.observed - rt.lang_n * ct.source_n / nn.n)
                     / (rt.lang_n * ct.source_n / nn.n), 6) * 1e6) AS BIGINT)
                   AS contrib_micro,
               nn.n_langs, nn.n_sources
        FROM cells c
        JOIN rt ON c.lang = rt.lang
        JOIN ct ON c.source = ct.source
        CROSS JOIN nn),
    t AS (SELECT round(sum(contrib_micro) / 1e6, 6) AS chi2_stat,
                 CAST(max((n_langs - 1) * (n_sources - 1)) AS BIGINT) AS dof
          FROM scored)
    SELECT lang, source, observed, expected, contrib, chi2_stat, dof
    FROM scored CROSS JOIN t
    ORDER BY contrib DESC, lang, source
    LIMIT 15
"""

TEXTS['doc_repetition_profile'] = """
    WITH base AS (
        SELECT doc_id, source, string_split(text, ' ') AS t
        FROM documents
        WHERE len(string_split(text, ' ')) >= 3),
    g2 AS (
        SELECT doc_id, source,
               unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i+1])) AS g
        FROM base),
    g3 AS (
        SELECT doc_id, source,
               unnest(list_transform(range(1, len(t) - 1),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
        FROM base),
    c2 AS (SELECT doc_id, source, g, count(*) AS c
           FROM g2 GROUP BY doc_id, source, g),
    c3 AS (SELECT doc_id, g, count(*) AS c
           FROM g3 GROUP BY doc_id, g),
    d2 AS (SELECT doc_id, source,
                  CAST(round(round(1.0 - count(*) / CAST(sum(c) AS DOUBLE),
                                   6) * 1000000.0) AS BIGINT)
                      AS g2_dup_micro,
                  CAST(round(round(max(c) / CAST(sum(c) AS DOUBLE),
                                   6) * 1000000.0) AS BIGINT)
                      AS g2_top_micro
           FROM c2 GROUP BY doc_id, source),
    d3 AS (SELECT doc_id,
                  CAST(round(round(1.0 - count(*) / CAST(sum(c) AS DOUBLE),
                                   6) * 1000000.0) AS BIGINT)
                      AS g3_dup_micro
           FROM c3 GROUP BY doc_id)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(sum(g2_dup_micro) / 1000000.0 / count(*), 6)
               AS avg_dup_bigram,
           round(sum(g2_top_micro) / 1000000.0 / count(*), 6)
               AS avg_top_bigram_share,
           round(sum(g3_dup_micro) / 1000000.0 / count(*), 6)
               AS avg_dup_trigram,
           CAST(sum(CASE WHEN g2_dup_micro > 120000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_repetitive
    FROM d2 JOIN d3 USING (doc_id)
    GROUP BY source
    ORDER BY source
"""

TEXTS['session_ngrams'] = """
    WITH lagged AS (
        SELECT user_id, event_id, ts, event_type,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_ts
        FROM events),
    flagged AS (
        SELECT *, CASE WHEN prev_ts IS NULL
                         OR ts >= prev_ts + INTERVAL 30 MINUTE
                       THEN 1 ELSE 0 END AS new_sess
        FROM lagged),
    sess AS (
        SELECT user_id, event_id, ts, event_type,
               CAST(sum(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM flagged),
    tri AS (
        SELECT user_id, event_type AS e1,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM sess
        WINDOW w AS (PARTITION BY user_id, session_id
                     ORDER BY ts, event_id))
    SELECT e1 || '>' || e2 || '>' || e3 AS trigram,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM tri
    WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY e1 || '>' || e2 || '>' || e3
    ORDER BY n_occurrences DESC, trigram
    LIMIT 15
"""

TEXTS['perplexity_buckets'] = """
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
    hist AS (SELECT score, count(*) AS c FROM scored GROUP BY score),
    cum AS (
        SELECT score,
               sum(c) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING)
                   AS cm,
               (SELECT sum(c) FROM hist) AS n
        FROM hist),
    thr AS (
        SELECT min(CASE WHEN cm * 3 >= n THEN score END) AS t1,
               min(CASE WHEN cm * 3 >= n * 2 THEN score END) AS t2
        FROM cum),
    bucketed AS (
        SELECT source,
               CASE WHEN score <= t1 THEN 'head'
                    WHEN score <= t2 THEN 'middle'
                    ELSE 'tail' END AS bucket,
               score
        FROM scored CROSS JOIN thr),
    agged AS (
        SELECT source, bucket,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CAST(round(score * 10000) AS BIGINT)) AS BIGINT)
                   AS s4
        FROM bucketed GROUP BY source, bucket)
    SELECT source, bucket, n_docs,
           round(n_docs / CAST(sum(n_docs) OVER (PARTITION BY source)
                               AS DOUBLE), 6) AS source_share,
           round(s4 / 10000.0 / n_docs, 6) AS avg_logloss
    FROM agged
    ORDER BY source, bucket
"""

TEXTS['quality_lr_score'] = """
    WITH t AS (
        SELECT doc_id, source,
               CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                    THEN 1 ELSE 0 END AS pos,
               term
        FROM (SELECT doc_id, source,
                     unnest(string_split(text, ' ')) AS term
              FROM documents)
        WHERE length(term) > 0),
    h AS (
        SELECT doc_id, source, pos,
               ('0x' || substr(md5('qlr:' || term), 1, 8))::BIGINT % 1024
                   AS bucket
        FROM t),
    counts AS (
        SELECT bucket, CAST(sum(pos) AS BIGINT) AS cp,
               CAST(sum(1 - pos) AS BIGINT) AS cn
        FROM h GROUP BY bucket),
    tot AS (SELECT CAST(sum(cp) AS BIGINT) AS P,
                   CAST(sum(cn) AS BIGINT) AS N FROM counts),
    wts AS (
        SELECT bucket,
               CAST(round(1000000.0 * (ln((cp + 1) / (P + 1024.0))
                                       - ln((cn + 1) / (N + 1024.0))))
                    AS BIGINT) AS w
        FROM counts CROSS JOIN tot),
    docsc AS (
        SELECT doc_id, source, pos,
               CAST(round(sum(w) * 1.0 / count(*)) AS BIGINT) AS sc
        FROM h JOIN wts USING (bucket)
        GROUP BY doc_id, source, pos)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(sum(sc) / 1000000.0 / count(*), 6) AS avg_score,
           CAST(sum(CASE WHEN sc > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pred_curated,
           round(sum(CASE WHEN (CASE WHEN sc > 0 THEN 1 ELSE 0 END) = pos
                          THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
               AS accuracy
    FROM docsc GROUP BY source ORDER BY source
"""

TEXTS['collocation_llr'] = """
    WITH d AS (
        SELECT list_filter(string_split(text, ' '), t -> length(t) > 0)
                   AS toks
        FROM documents),
    pr AS (
        SELECT toks[i] AS w1, toks[i + 1] AS w2
        FROM (SELECT toks, unnest(range(1, len(toks))) AS i
              FROM d WHERE len(toks) >= 2)),
    bi AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
           FROM pr GROUP BY 1, 2),
    l AS (SELECT w1, CAST(sum(n_pair) AS BIGINT) AS n_left
          FROM bi GROUP BY w1),
    r AS (SELECT w2, CAST(sum(n_pair) AS BIGINT) AS n_right
          FROM bi GROUP BY w2),
    t AS (SELECT CAST(sum(n_pair) AS BIGINT) AS N FROM bi),
    s AS (
        SELECT bi.w1, bi.w2, n_pair, n_left, n_right,
               CAST(n_pair AS DOUBLE) AS k11,
               CAST(n_left - n_pair AS DOUBLE) AS k12,
               CAST(n_right - n_pair AS DOUBLE) AS k21,
               CAST(N - n_left - n_right + n_pair AS DOUBLE) AS k22,
               CAST(N AS DOUBLE) AS n
        FROM bi JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN t
        WHERE n_pair >= 10)
    SELECT w1, w2, n_pair, n_left, n_right,
           round(2.0 * (
               CASE WHEN k11 > 0
                    THEN k11 * ln(k11 / ((k11 + k12) * (k11 + k21) / n))
                    ELSE 0.0 END
             + CASE WHEN k12 > 0
                    THEN k12 * ln(k12 / ((k11 + k12) * (k12 + k22) / n))
                    ELSE 0.0 END
             + CASE WHEN k21 > 0
                    THEN k21 * ln(k21 / ((k21 + k22) * (k11 + k21) / n))
                    ELSE 0.0 END
             + CASE WHEN k22 > 0
                    THEN k22 * ln(k22 / ((k21 + k22) * (k12 + k22) / n))
                    ELSE 0.0 END), 4) AS llr
    FROM s ORDER BY llr DESC, w1, w2 LIMIT 20
"""

TEXTS['phrase_search'] = """
    WITH d AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), t -> length(t) > 0)
                   AS toks
        FROM documents),
    ph(phrase, w1, w2) AS (VALUES
        ('table scan', 'table', 'scan'),
        ('hash join', 'hash', 'join'),
        ('merge sort', 'merge', 'sort')),
    occ AS (
        SELECT ph.phrase, d.doc_id,
               CAST(len(list_filter(range(1, len(toks)),
                        i -> toks[i] = ph.w1 AND toks[i + 1] = ph.w2))
                    AS BIGINT) AS n_occurrences
        FROM d CROSS JOIN ph),
    rk AS (
        SELECT phrase, doc_id, n_occurrences,
               CAST(row_number() OVER (PARTITION BY phrase
                    ORDER BY n_occurrences DESC, doc_id) AS INT) AS rn
        FROM occ WHERE n_occurrences > 0)
    SELECT phrase, rn, doc_id, n_occurrences
    FROM rk WHERE rn <= 5 ORDER BY phrase, rn
"""

TEXTS['sequence_entropy_profile'] = """
    WITH stp AS (
        SELECT from_type, to_type FROM (
            SELECT event_type AS from_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS to_type
            FROM events)
        WHERE to_type IS NOT NULL),
    counts AS (
        SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        FROM stp GROUP BY 1, 2),
    outs AS (
        SELECT from_type, CAST(sum(n) AS BIGINT) AS n_out,
               CAST(count(*) AS BIGINT) AS n_succ
        FROM counts GROUP BY 1),
    ent AS (
        SELECT c.from_type, o.n_out, o.n_succ,
               CAST(sum(CAST(round(-1000000.0 * (c.n * 1.0 / o.n_out)
                                   * ln(c.n * 1.0 / o.n_out)) AS BIGINT))
                    AS BIGINT) AS h_micro
        FROM counts c JOIN outs o USING (from_type)
        GROUP BY 1, 2, 3),
    modal AS (
        SELECT from_type, min(to_type) AS modal_next
        FROM counts c
        WHERE n = (SELECT max(n) FROM counts c2
                   WHERE c2.from_type = c.from_type)
        GROUP BY from_type)
    SELECT e.from_type, e.n_out, e.n_succ,
           round(e.h_micro / 1e6, 6) AS entropy_nats,
           CASE WHEN e.n_succ > 1
                THEN round(e.h_micro / 1e6 / ln(CAST(e.n_succ AS DOUBLE)),
                           6)
                ELSE 0.0 END AS entropy_normalized,
           m.modal_next
    FROM ent e JOIN modal m USING (from_type)
    ORDER BY e.from_type
"""

TEXTS['rake_keyphrases'] = """
    WITH pos AS (
        SELECT doc_id, i - 1 AS pos, toks[i] AS term,
               CASE WHEN toks[i] IN ('the', 'a', 'of', 'and')
                    THEN 1 ELSE 0 END AS stop
        FROM (SELECT doc_id,
                     list_filter(string_split(text, ' '),
                                 t -> length(t) > 0) AS toks
              FROM documents),
             unnest(range(1, len(toks) + 1)) AS u(i)),
    runs AS (
        SELECT doc_id, pos, term,
               pos - sum(1 - stop) OVER (PARTITION BY doc_id ORDER BY pos
                                         ROWS UNBOUNDED PRECEDING)
                   AS island
        FROM pos
        QUALIFY stop = 0),
    phrases AS (
        SELECT doc_id, island,
               string_agg(term, ' ' ORDER BY pos) AS phrase
        FROM runs GROUP BY 1, 2),
    stats AS (
        SELECT term, CAST(count(*) AS BIGINT) AS freq,
               CAST(sum(plen) AS BIGINT) AS deg
        FROM (SELECT r.term,
                     count(*) OVER (PARTITION BY r.doc_id, r.island)
                         AS plen
              FROM runs r)
        GROUP BY term),
    wscore AS (
        SELECT term,
               CAST(round(1000000.0 * deg / freq) AS BIGINT) AS wscore
        FROM stats),
    pscore AS (
        SELECT r.doc_id, r.island,
               CAST(sum(w.wscore) AS BIGINT) AS score_micro
        FROM runs r JOIN wscore w USING (term)
        GROUP BY 1, 2)
    SELECT p.phrase,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           round(max(s.score_micro) / 1e6, 4) AS rake_score
    FROM phrases p JOIN pscore s USING (doc_id, island)
    GROUP BY p.phrase
    ORDER BY rake_score DESC, n_occurrences DESC, phrase
    LIMIT 15
"""

TEXTS['term_burstiness'] = """
    WITH td AS (
        SELECT term, doc_id, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents)
        WHERE length(term) > 0
        GROUP BY term, doc_id),
    stats AS (
        SELECT term, CAST(sum(n) AS BIGINT) AS tf,
               CAST(count(*) AS BIGINT) AS df
        FROM td GROUP BY term),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_corpus FROM documents)
    SELECT term, tf, df,
           round(n_corpus * (1 - exp(-tf / CAST(n_corpus AS DOUBLE))), 4)
               AS expected_df,
           round(df / round(n_corpus
                            * (1 - exp(-tf / CAST(n_corpus AS DOUBLE))),
                            4), 4) AS df_ratio,
           round(tf * 1.0 / df, 4) AS occurrences_per_doc
    FROM stats CROSS JOIN nd
    ORDER BY tf DESC, term
    LIMIT 20
"""

TEXTS['lang_source_vmeasure'] = """
    WITH cells AS (
        SELECT lang, source, CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS ntot FROM cells),
    hl AS (
        SELECT CAST(sum(CAST(round(-1000000.0 * (m * 1.0 / ntot)
                                   * ln(m * 1.0 / ntot)) AS BIGINT))
                    AS BIGINT) AS h_lang
        FROM (SELECT lang, CAST(sum(n) AS BIGINT) AS m
              FROM cells GROUP BY lang) CROSS JOIN tot),
    hs AS (
        SELECT CAST(sum(CAST(round(-1000000.0 * (m * 1.0 / ntot)
                                   * ln(m * 1.0 / ntot)) AS BIGINT))
                    AS BIGINT) AS h_src
        FROM (SELECT source, CAST(sum(n) AS BIGINT) AS m
              FROM cells GROUP BY source) CROSS JOIN tot),
    hj AS (
        SELECT CAST(sum(CAST(round(-1000000.0 * (n * 1.0 / ntot)
                                   * ln(n * 1.0 / ntot)) AS BIGINT))
                    AS BIGINT) AS h_joint
        FROM cells CROSS JOIN tot),
    j AS (SELECT * FROM hl CROSS JOIN hs CROSS JOIN hj)
    SELECT round(h_lang / 1e6, 6) AS h_lang,
           round(h_src / 1e6, 6) AS h_source,
           round(h_joint / 1e6, 6) AS h_joint,
           round(1.0 - (h_joint - h_src) * 1.0 / h_lang, 6)
               AS homogeneity,
           round(1.0 - (h_joint - h_lang) * 1.0 / h_src, 6)
               AS completeness,
           round(2.0 * (1.0 - (h_joint - h_src) * 1.0 / h_lang)
                     * (1.0 - (h_joint - h_lang) * 1.0 / h_src)
                 / ((1.0 - (h_joint - h_src) * 1.0 / h_lang)
                    + (1.0 - (h_joint - h_lang) * 1.0 / h_src)), 6)
               AS v_measure
    FROM j
"""

TEXTS['theil_inequality_index'] = """
    WITH per AS (
        SELECT event_type, user_id,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS x
        FROM events GROUP BY 1, 2),
    both_g AS (
        SELECT event_type AS segment, user_id, x FROM per
        UNION ALL
        SELECT '__all__', user_id, CAST(sum(x) AS BIGINT)
        FROM per GROUP BY user_id),
    tot AS (
        SELECT segment, CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(x) AS BIGINT) AS xt
        FROM both_g GROUP BY segment),
    terms AS (
        SELECT g.segment, t.n_users,
               CASE WHEN g.x > 0
                    THEN CAST(round(1000000.0
                              * (g.x / CAST(t.xt AS DOUBLE))
                              * ln(g.x / (t.xt
                                          / CAST(t.n_users AS DOUBLE))))
                         AS BIGINT)
                    ELSE 0 END AS tm
        FROM both_g g JOIN tot t USING (segment))
    SELECT segment, n_users,
           round(sum(tm) / 1e6, 6) AS theil_t
    FROM terms GROUP BY segment, n_users
    ORDER BY segment
"""

TEXTS['token_budget_planner'] = """
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
    quality AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               round(sum(CAST(round(score * 10000) AS BIGINT))
                     / 10000.0 / count(*), 4) AS mean_score
        FROM scored GROUP BY source),
    tok AS (
        SELECT source,
               CAST(sum(len(list_filter(string_split(text, ' '),
                                        x -> length(x) > 0)))
                    AS BIGINT) AS src_tokens
        FROM documents GROUP BY source),
    tt AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS total FROM tok),
    base AS (
        SELECT q.source, q.mean_score, q.n_docs, k.src_tokens,
               CAST(floor(total * 1.5) AS BIGINT) AS budget,
               CAST(4 * k.src_tokens AS BIGINT) AS cap_tokens
        FROM quality q JOIN tok k USING (source) CROSS JOIN tt),
    alloc AS (
        SELECT *, coalesce(sum(cap_tokens) OVER (
                   ORDER BY mean_score, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
        FROM base)
    SELECT source, mean_score, n_docs, src_tokens AS n_tokens, cap_tokens,
           CAST(greatest(0, least(cap_tokens, budget - cum_before))
                AS BIGINT) AS alloc_tokens,
           round(greatest(0, least(cap_tokens, budget - cum_before))
                 * 1.0 / src_tokens, 4) AS epochs
    FROM alloc ORDER BY mean_score, source
"""

TEXTS['secret_scan_profile'] = r"""
    WITH planted AS (
        SELECT doc_id, source,
               text
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
                        ELSE '' END) AS text
        FROM documents),
    counted AS (
        SELECT source,
               len(regexp_extract_all(text, 'AKIA[0-9A-F]{16}')) AS n_aws_key,
               len(regexp_extract_all(text, '\b[0-9a-f]{32}\b')) AS n_hex32,
               len(regexp_extract_all(text, 'sk-[0-9a-f]{20}')) AS n_bearer
        FROM planted)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_aws_key + n_hex32 + n_bearer > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS docs_flagged,
           CAST(sum(n_aws_key) AS BIGINT) AS n_aws_key,
           CAST(sum(n_hex32) AS BIGINT) AS n_hex32,
           CAST(sum(n_bearer) AS BIGINT) AS n_bearer,
           round(sum(CASE WHEN n_aws_key + n_hex32 + n_bearer > 0
                          THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS flag_rate
    FROM counted GROUP BY source ORDER BY source
"""

TEXTS['zipf_fit_profile'] = """
    WITH toks AS (
        SELECT lang, unnest(string_split(text, ' ')) AS token
        FROM documents),
    freqs AS (
        SELECT lang, token, CAST(count(*) AS BIGINT) AS freq
        FROM toks WHERE length(token) > 0
        GROUP BY lang, token),
    totals AS (
        SELECT lang,
               CAST(count(*) AS BIGINT) AS vocab_size,
               CAST(sum(freq) AS BIGINT) AS total_tokens
        FROM freqs GROUP BY lang),
    ranked AS (
        SELECT lang, freq,
               row_number() OVER (
                   PARTITION BY lang ORDER BY freq DESC, token ASC) AS rnk
        FROM freqs),
    xy AS (
        SELECT lang,
               ln(CAST(rnk AS DOUBLE)) AS x,
               ln(CAST(freq AS DOUBLE)) AS y
        FROM ranked WHERE rnk <= 100),
    st AS (
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_ranks,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
        FROM xy GROUP BY lang)
    SELECT st.lang, n_ranks, vocab_size, total_tokens,
           CASE WHEN (n_ranks * sxx - sx * sx) < 1e-9
                    THEN CAST(NULL AS DOUBLE)
                WHEN (n_ranks * syy - sy * sy) < 1e-9 THEN 0.0
                ELSE round((n_ranks * sxy - sx * sy)
                           / (n_ranks * sxx - sx * sx), 6)
           END AS zipf_slope,
           CASE WHEN (n_ranks * sxx - sx * sx) < 1e-9
                    THEN CAST(NULL AS DOUBLE)
                WHEN (n_ranks * syy - sy * sy) < 1e-9
                    THEN round(sy / n_ranks, 6)
                ELSE round((sy - ((n_ranks * sxy - sx * sy)
                                  / (n_ranks * sxx - sx * sx)) * sx)
                           / n_ranks, 6)
           END AS intercept,
           CASE WHEN (n_ranks * sxx - sx * sx) < 1e-9
                  OR (n_ranks * syy - sy * sy) < 1e-9
                    THEN CAST(NULL AS DOUBLE)
                ELSE round((n_ranks * sxy - sx * sy)
                           * (n_ranks * sxy - sx * sy)
                           / ((n_ranks * sxx - sx * sx)
                              * (n_ranks * syy - sy * sy)), 6)
           END AS r2
    FROM st JOIN totals USING (lang) ORDER BY lang
"""

TEXTS['heaps_fit_profile'] = """
    WITH per_doc AS (
        SELECT lang, doc_id,
               len(list_filter(string_split(text, ' '),
                               t -> length(t) > 0)) AS n_tok
        FROM documents),
    anchors AS (
        SELECT lang, min(doc_id) AS lo, max(doc_id) AS hi
        FROM per_doc GROUP BY lang),
    doc_b AS (
        SELECT d.lang,
               least(20, CAST(floor((d.doc_id - a.lo) * 20
                                    / (a.hi - a.lo + 1)) AS INTEGER) + 1)
                   AS bkt,
               d.n_tok
        FROM per_doc d JOIN anchors a ON a.lang = d.lang),
    tok_counts AS (
        SELECT lang, bkt, CAST(sum(n_tok) AS BIGINT) AS toks
        FROM doc_b GROUP BY lang, bkt),
    first_occ AS (
        SELECT lang, token, min(doc_id) AS first_doc
        FROM (SELECT lang, doc_id,
                     unnest(string_split(text, ' ')) AS token
              FROM documents)
        WHERE length(token) > 0
        GROUP BY lang, token),
    new_types AS (
        SELECT f.lang,
               least(20, CAST(floor((f.first_doc - a.lo) * 20
                                    / (a.hi - a.lo + 1)) AS INTEGER) + 1)
                   AS bkt,
               CAST(count(*) AS BIGINT) AS new_types
        FROM first_occ f JOIN anchors a ON a.lang = f.lang
        GROUP BY 1, 2),
    per_bucket AS (
        SELECT t.lang, t.bkt, t.toks,
               CAST(coalesce(n.new_types, 0) AS BIGINT) AS new_types
        FROM tok_counts t
        LEFT JOIN new_types n ON n.lang = t.lang AND n.bkt = t.bkt),
    curve AS (
        SELECT lang, bkt,
               CAST(sum(toks) OVER (PARTITION BY lang ORDER BY bkt
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_n,
               CAST(sum(new_types) OVER (PARTITION BY lang ORDER BY bkt
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_v
        FROM per_bucket),
    xy AS (
        SELECT lang, ln(CAST(cum_n AS DOUBLE)) AS x,
               ln(CAST(cum_v AS DOUBLE)) AS y
        FROM curve WHERE cum_n > 0 AND cum_v > 0),
    st AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n_points,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
        FROM xy GROUP BY lang),
    totals AS (
        SELECT lang, CAST(max(cum_v) AS BIGINT) AS vocab_size,
               CAST(max(cum_n) AS BIGINT) AS total_tokens
        FROM curve WHERE cum_n > 0 AND cum_v > 0 GROUP BY lang)
    SELECT st.lang, n_points, vocab_size, total_tokens,
           CASE WHEN (n_points * sxx - sx * sx) < 1e-9
                    THEN CAST(NULL AS DOUBLE)
                WHEN (n_points * syy - sy * sy) < 1e-9 THEN 0.0
                ELSE round((n_points * sxy - sx * sy)
                           / (n_points * sxx - sx * sx), 6)
           END AS heaps_beta,
           CASE WHEN (n_points * sxx - sx * sx) < 1e-9
                    THEN CAST(NULL AS DOUBLE)
                WHEN (n_points * syy - sy * sy) < 1e-9
                    THEN round(sy / n_points, 6)
                ELSE round((sy - ((n_points * sxy - sx * sy)
                                  / (n_points * sxx - sx * sx)) * sx)
                           / n_points, 6)
           END AS intercept,
           CASE WHEN (n_points * sxx - sx * sx) < 1e-9
                  OR (n_points * syy - sy * sy) < 1e-9
                    THEN CAST(NULL AS DOUBLE)
                ELSE round((n_points * sxy - sx * sy)
                           * (n_points * sxy - sx * sy)
                           / ((n_points * sxx - sx * sx)
                              * (n_points * syy - sy * sy)), 6)
           END AS r2
    FROM st JOIN totals USING (lang) ORDER BY lang
"""

TEXTS['lm_dirichlet_scores'] = """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents),
    ftoks AS (SELECT doc_id, term FROM toks WHERE length(term) > 0),
    tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM ftoks GROUP BY doc_id, term),
    dl AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
        FROM ftoks GROUP BY doc_id),
    df_t AS (
        SELECT term, CAST(sum(tf) AS BIGINT) AS total_tf
        FROM tf GROUP BY term),
    corpus AS (SELECT CAST(count(*) AS BIGINT) AS c_total FROM ftoks),
    qterms AS (
        SELECT term, total_tf FROM df_t
        ORDER BY total_tf DESC, term ASC LIMIT 3),
    scored AS (
        SELECT q.term AS query_term, t.doc_id, t.tf, d.dl,
               round(ln((t.tf + 2000.0 * q.total_tf / c.c_total)
                        / (d.dl + 2000.0)), 6) AS lm_score
        FROM tf t
        JOIN qterms q ON q.term = t.term
        JOIN dl d ON d.doc_id = t.doc_id
        CROSS JOIN corpus c),
    ranked AS (
        SELECT query_term, doc_id, tf, dl, lm_score,
               row_number() OVER (PARTITION BY query_term
                   ORDER BY lm_score DESC, doc_id ASC) AS rnk
        FROM scored)
    SELECT query_term, CAST(rnk AS BIGINT) AS rnk, doc_id, tf, dl,
           lm_score
    FROM ranked WHERE rnk <= 10
    ORDER BY query_term, rnk
"""

TEXTS['winnowing_overlap'] = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (
        SELECT doc_id,
               list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
                   i -> ('0x' || substr(md5(array_to_string(toks[i:i+2], ' ')), 1, 8))::BIGINT)
                   AS grams
        FROM t),
    m AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, greatest(len(grams) - 3, 1) + 1),
                   j -> list_min(grams[j:j+3]))) AS fps
        FROM g),
    f AS (SELECT doc_id, len(fps) AS n_fp, unnest(fps) AS fp FROM m),
    rare AS (SELECT fp FROM f GROUP BY fp HAVING count(DISTINCT doc_id) <= 10),
    fr AS (SELECT f.doc_id, f.n_fp, f.fp FROM f JOIN rare USING (fp)),
    p AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.n_fp AS n_fp_a, b.n_fp AS n_fp_b,
               count(*) AS shared_fps
        FROM fr a JOIN fr b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4)
    SELECT doc_a, doc_b,
           CAST(shared_fps AS BIGINT) AS shared_fps,
           CAST(n_fp_a AS BIGINT) AS n_fp_a,
           CAST(n_fp_b AS BIGINT) AS n_fp_b,
           CAST((CAST(shared_fps AS HUGEINT) * 1000000)
                // least(n_fp_a, n_fp_b) AS BIGINT) AS containment_ppm
    FROM p ORDER BY shared_fps DESC, doc_a, doc_b LIMIT 20
"""

TEXTS['burrows_delta'] = """
    WITH toks AS (
        SELECT source, unnest(string_split(text, ' ')) AS term
        FROM documents),
    tf AS (SELECT source, term FROM toks WHERE length(term) > 0),
    vocab AS (
        SELECT term FROM (
            SELECT term, count(*) AS freq FROM tf GROUP BY term
            ORDER BY freq DESC, term ASC LIMIT 30)),
    totals AS (
        SELECT source, CAST(count(*) AS BIGINT) AS total
        FROM tf GROUP BY source),
    counts AS (
        SELECT source, tf.term, CAST(count(*) AS BIGINT) AS cnt
        FROM tf JOIN vocab ON tf.term = vocab.term
        GROUP BY source, tf.term),
    grid AS (
        SELECT t.source, v.term,
               CAST((CAST(COALESCE(c.cnt, 0) AS HUGEINT) * 1000000)
                    // t.total AS BIGINT) AS rate
        FROM totals t CROSS JOIN vocab v
        LEFT JOIN counts c ON c.source = t.source AND c.term = v.term),
    stats AS (
        SELECT term, CAST(count(*) AS BIGINT) AS n_src,
               CAST(sum(rate) AS BIGINT) AS rate_sum
        FROM grid GROUP BY term),
    centered AS (
        SELECT g.source, g.term, s.n_src,
               g.rate - (s.rate_sum // s.n_src) AS dev
        FROM grid g JOIN stats s ON g.term = s.term),
    ssq AS (
        SELECT term, CAST(sum(dev * dev) AS BIGINT) AS ssq,
               CAST(max(n_src) AS BIGINT) AS n_src
        FROM centered GROUP BY term),
    z AS (
        SELECT c.source, c.term,
               CASE WHEN q.ssq = 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(round(c.dev * 1e6
                              / sqrt(q.ssq / q.n_src)) AS BIGINT)
               END AS z_micro
        FROM centered c JOIN ssq q ON c.term = q.term),
    pair AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(sum(abs(a.z_micro - b.z_micro)) AS BIGINT) AS abs_z_sum,
               CAST(count(*) AS BIGINT) AS n_terms
        FROM z a JOIN z b
          ON a.term = b.term AND a.source < b.source
        GROUP BY 1, 2)
    SELECT source_a, source_b,
           CAST((CAST(abs_z_sum AS HUGEINT) * 1) // n_terms AS BIGINT)
               AS delta_micro,
           n_terms
    FROM pair
    ORDER BY delta_micro ASC, source_a ASC, source_b ASC
    LIMIT 20
"""

TEXTS['kneser_ney_bigram'] = """
    WITH prs AS (
        SELECT t[i] AS w1, t[i + 1] AS w2
        FROM (SELECT string_split(text, ' ') AS t FROM documents),
             unnest(range(1, len(t))) u(i)
        WHERE length(t[i]) > 0 AND length(t[i + 1]) > 0),
    bigrams AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        FROM prs GROUP BY w1, w2),
    lft AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1dot,
                   CAST(count(*) AS BIGINT) AS n_post
            FROM bigrams GROUP BY w1),
    rgt AS (SELECT w2, CAST(count(*) AS BIGINT) AS n_pre
            FROM bigrams GROUP BY w2),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS t_types FROM bigrams)
    SELECT w1, w2, c12 AS n_bigram,
           CAST(((4 * c12 - 3)::HUGEINT * t_types
                 + 3::HUGEINT * n_post * n_pre) * 1000000
                // (4::HUGEINT * c1dot * t_types) AS BIGINT) AS p_kn_micro
    FROM bigrams JOIN lft USING (w1) JOIN rgt USING (w2) CROSS JOIN tot
    ORDER BY c12 DESC, w1, w2
    LIMIT 30
"""
