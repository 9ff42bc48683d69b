"""Parametric DuckDB oracle BUILDERS (shared SQL-generation helpers).

Moved verbatim out of plans/queries.py (r12 verdict task 5).  Each
builder assembles the SQL twin of a hash-sketch / iterative-model
family where writing the text by hand would be noise (64 simhash bit
votes, unrolled Lloyd rounds, ...).  Pure functions of their
parameters — no registry state; plans/queries.py imports and calls
them at the original registration sites.
"""

from __future__ import annotations


def _dd_hash32(expr: str, salt: str) -> str:
    """DuckDB replica of functions.dedup.hash32: first 8 md5 hex chars of
    (salt || value) as a BIGINT in [0, 2^32)."""
    return f"('0x' || substr(md5('{salt}' || {expr}), 1, 8))::BIGINT"


_DD_SHINGLES = """toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        shl AS (SELECT doc_id,
                 list_filter(list_distinct(
                   CASE WHEN len(t) >= 3
                        THEN list_transform(range(1, len(t) - 1),
                                 i -> array_to_string(list_slice(t, i, i + 2), ' '))
                        ELSE [] END), s -> length(s) > 0) AS gs
               FROM toks),
        sh2 AS (SELECT doc_id, gs FROM shl WHERE len(gs) > 0)"""


def _minhash_oracle(n_hashes: int = 16, threshold: float = 0.5) -> str:
    from project_bigdata_recsys_spark.functions.dedup import (
        MINHASH_PRIME,
        minhash_params,
    )

    mins = ",\n               ".join(
        f"list_min(list_transform(bases, x -> (x * {a} + {b}) % {MINHASH_PRIME}))"
        f" AS m{i}"
        for i, (a, b) in enumerate(minhash_params(n_hashes))
    )
    bands = "\n            UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_no, m{2 * b} AS k1, m{2 * b + 1} AS k2 FROM sig"
        for b in range(n_hashes // 2)
    )
    matches = " + ".join(f"(sa.m{i} = sb.m{i})::INT" for i in range(n_hashes))
    return f"""
        WITH {_DD_SHINGLES},
        basesq AS (SELECT doc_id,
               list_transform(gs, s -> {_dd_hash32('s', '')} % {MINHASH_PRIME})
                   AS bases
           FROM sh2),
        sig AS (SELECT doc_id,
               {mins}
           FROM basesq),
        bands AS ({bands}),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM bands a JOIN bands b
                   ON a.band_no = b.band_no AND a.k1 = b.k1 AND a.k2 = b.k2
                      AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
               round(({matches}) / {float(n_hashes)}, 6) AS est_jaccard
        FROM cand
        JOIN sig sa ON sa.doc_id = doc_a
        JOIN sig sb ON sb.doc_id = doc_b
        WHERE round(({matches}) / {float(n_hashes)}, 6) >= {threshold}
        ORDER BY doc_a, doc_b
    """


def _incremental_oracle(n_hashes: int = 16, threshold: float = 0.5) -> str:
    """SQL twin of functions.dedup.incremental_dedup_stats: planted batch
    → exact drop on text equality (= sha2 fingerprint equality) → ONE-SIDED
    minhash band probe (new × old only) → per-lang funnel counts."""
    from project_bigdata_recsys_spark.functions.dedup import (
        _DRIFT_SUFFIX,
        MINHASH_PRIME,
        minhash_params,
    )

    mins = ",\n               ".join(
        f"list_min(list_transform(bases, x -> (x * {a} + {b}) % {MINHASH_PRIME}))"
        f" AS m{i}"
        for i, (a, b) in enumerate(minhash_params(n_hashes))
    )
    bands = "\n            UNION ALL ".join(
        f"SELECT doc_id, is_new, {b} AS band_no, m{2 * b} AS k1, "
        f"m{2 * b + 1} AS k2 FROM sig"
        for b in range(n_hashes // 2)
    )
    matches = " + ".join(f"(sa.m{i} = sb.m{i})::INT" for i in range(n_hashes))
    return f"""
        WITH batch AS (
            SELECT doc_id + 3000000 AS doc_id, text, lang
            FROM documents WHERE doc_id % 10 = 0
            UNION ALL
            SELECT doc_id + 3000000, text || '{_DRIFT_SUFFIX}', lang
            FROM documents WHERE doc_id % 10 = 3
            UNION ALL
            SELECT doc_id + 3000000, 'fresh doc ' || CAST(doc_id AS VARCHAR), lang
            FROM documents WHERE doc_id % 10 = 7),
        corpus_texts AS (SELECT DISTINCT text FROM documents),
        exact_dropped AS (
            SELECT b.* FROM batch b JOIN corpus_texts c ON b.text = c.text),
        survivors AS (
            SELECT b.* FROM batch b LEFT JOIN corpus_texts c ON b.text = c.text
            WHERE c.text IS NULL),
        alldocs AS (
            SELECT doc_id, text, FALSE AS is_new FROM documents
            UNION ALL
            SELECT doc_id, text, TRUE AS is_new FROM survivors),
        toks AS (SELECT doc_id, is_new, string_split(text, ' ') AS t FROM alldocs),
        shl AS (SELECT doc_id, is_new,
                 list_filter(list_distinct(
                   CASE WHEN len(t) >= 3
                        THEN list_transform(range(1, len(t) - 1),
                                 i -> array_to_string(list_slice(t, i, i + 2), ' '))
                        ELSE [] END), s -> length(s) > 0) AS gs
               FROM toks),
        sh2 AS (SELECT doc_id, is_new, gs FROM shl WHERE len(gs) > 0),
        basesq AS (SELECT doc_id, is_new,
               list_transform(gs, s -> {_dd_hash32('s', '')} % {MINHASH_PRIME})
                   AS bases
           FROM sh2),
        sig AS (SELECT doc_id, is_new,
               {mins}
           FROM basesq),
        bands AS ({bands}),
        cand AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS old_id
                 FROM bands a JOIN bands b
                   ON a.band_no = b.band_no AND a.k1 = b.k1 AND a.k2 = b.k2
                 WHERE a.is_new AND NOT b.is_new),
        near AS (SELECT DISTINCT cand.new_id AS doc_id FROM cand
                 JOIN sig sa ON sa.doc_id = cand.new_id
                 JOIN sig sb ON sb.doc_id = cand.old_id
                 WHERE ({matches}) / {float(n_hashes)} >= {threshold}),
        near_dropped AS (
            SELECT s.* FROM survivors s JOIN near USING (doc_id)),
        admitted AS (
            SELECT s.* FROM survivors s
            WHERE s.doc_id NOT IN (SELECT doc_id FROM near)),
        bstats AS (SELECT lang, count(*) AS n_batch FROM batch GROUP BY lang),
        estats AS (SELECT lang, count(*) AS n_exact_dropped
                   FROM exact_dropped GROUP BY lang),
        nstats AS (SELECT lang, count(*) AS n_near_dropped
                   FROM near_dropped GROUP BY lang),
        astats AS (SELECT lang, count(*) AS n_admitted
                   FROM admitted GROUP BY lang)
        SELECT b.lang, CAST(b.n_batch AS BIGINT) AS n_batch,
               CAST(coalesce(e.n_exact_dropped, 0) AS BIGINT) AS n_exact_dropped,
               CAST(coalesce(n.n_near_dropped, 0) AS BIGINT) AS n_near_dropped,
               CAST(coalesce(a.n_admitted, 0) AS BIGINT) AS n_admitted
        FROM bstats b
        LEFT JOIN estats e USING (lang)
        LEFT JOIN nstats n USING (lang)
        LEFT JOIN astats a USING (lang)
        ORDER BY b.lang
    """


def _rp_lsh_pairs_oracle(
    threshold: float = 0.40, n_tables: int = 4, n_planes: int = 6
) -> str:
    """SQL twin of functions.similarity.embedding_near_dup_pairs_lsh: the
    Rademacher plane weight is ((i*31 + p*17 + t*101) * 2654435761) mod
    2^32 compared to 2^31 — pure integer arithmetic both engines compute
    identically, so bucket membership (and therefore the candidate pair
    set) reproduces exactly."""

    def bucket(t: int) -> str:
        terms = []
        for p in range(n_planes):
            w = (
                f"(CASE WHEN ((i * 31 + {p * 17} + {t * 101}) * 2654435761)"
                f" % 4294967296 < 2147483648 THEN 1.0 ELSE -1.0 END)"
            )
            proj = (
                f"list_sum(list_transform(range(0, len(emb)),"
                f" i -> emb[i + 1] * {w}))"
            )
            terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
        return " + ".join(terms)

    buck = "\n            UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, {bucket(t)} AS bucket FROM b"
        for t in range(n_tables)
    )
    return f"""
        WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings),
        buck AS ({buck}),
        cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
                 FROM buck x JOIN buck y
                   ON x.t = y.t AND x.bucket = y.bucket
                      AND x.vec_id < y.vec_id)
        SELECT cand.id_a, cand.id_b,
               round(list_dot_product(ea.emb, eb.emb)
                     / (sqrt(list_dot_product(ea.emb, ea.emb))
                        * sqrt(list_dot_product(eb.emb, eb.emb))), 6) AS cos_sim
        FROM cand
        JOIN b ea ON ea.vec_id = cand.id_a
        JOIN b eb ON eb.vec_id = cand.id_b
        WHERE round(list_dot_product(ea.emb, eb.emb)
                    / (sqrt(list_dot_product(ea.emb, ea.emb))
                       * sqrt(list_dot_product(eb.emb, eb.emb))), 6)
              >= {threshold}
        ORDER BY id_a, id_b
    """


def _minhash_verified_oracle(
    n_hashes: int = 16, threshold: float = 0.5, verify_threshold: float = 0.5
) -> str:
    """minhash candidates + exact-Jaccard verification over them — the
    SQL twin of functions.dedup.minhash_verified_pairs."""
    from project_bigdata_recsys_spark.functions.dedup import (
        MINHASH_PRIME,
        minhash_params,
    )

    mins = ",\n               ".join(
        f"list_min(list_transform(bases, x -> (x * {a} + {b}) % {MINHASH_PRIME}))"
        f" AS m{i}"
        for i, (a, b) in enumerate(minhash_params(n_hashes))
    )
    bands = "\n            UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_no, m{2 * b} AS k1, m{2 * b + 1} AS k2 FROM sig"
        for b in range(n_hashes // 2)
    )
    matches = " + ".join(f"(sa.m{i} = sb.m{i})::INT" for i in range(n_hashes))
    jac = (
        "len(list_intersect(ga.gs, gb.gs)) * 1.0"
        " / (len(ga.gs) + len(gb.gs) - len(list_intersect(ga.gs, gb.gs)))"
    )
    return f"""
        WITH {_DD_SHINGLES},
        basesq AS (SELECT doc_id,
               list_transform(gs, s -> {_dd_hash32('s', '')} % {MINHASH_PRIME})
                   AS bases
           FROM sh2),
        sig AS (SELECT doc_id,
               {mins}
           FROM basesq),
        bands AS ({bands}),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM bands a JOIN bands b
                   ON a.band_no = b.band_no AND a.k1 = b.k1 AND a.k2 = b.k2
                      AND a.doc_id < b.doc_id),
        est AS (SELECT doc_a, doc_b,
                       round(({matches}) / {float(n_hashes)}, 6) AS est_jaccard
                FROM cand
                JOIN sig sa ON sa.doc_id = doc_a
                JOIN sig sb ON sb.doc_id = doc_b
                WHERE round(({matches}) / {float(n_hashes)}, 6) >= {threshold})
        SELECT e.doc_a, e.doc_b, e.est_jaccard,
               round({jac}, 6) AS jaccard
        FROM est e
        JOIN sh2 ga ON ga.doc_id = e.doc_a
        JOIN sh2 gb ON gb.doc_id = e.doc_b
        WHERE round({jac}, 6) >= {verify_threshold}
        ORDER BY e.doc_a, e.doc_b
    """


def _simhash_ctes() -> str:
    """CTE chain ending in ``ham(doc_a, doc_b, hamming)`` — the SQL twin of
    functions.dedup.simhash_features + simhash_near_pairs (64 md5-derived
    bit votes, 4x16-bit bands, XOR popcount)."""
    votes = ",\n               ".join(
        f"sum((({'lo' if b < 32 else 'hi'} >> {b % 32}) & 1) * 2 - 1) AS v{b}"
        for b in range(64)
    )
    fp = (
        " + ".join(
            f"(CASE WHEN v{b} > 0 THEN (1::BIGINT << {b}) ELSE 0::BIGINT END)"
            for b in range(63)
        )
        + " + (CASE WHEN v63 > 0 THEN (-9223372036854775808)::BIGINT"
        " ELSE 0::BIGINT END)"
    )
    band_cols = ",\n               ".join(
        " + ".join(
            f"(CASE WHEN v{16 * k + j} > 0 THEN {1 << j}::BIGINT ELSE 0::BIGINT END)"
            for j in range(16)
        )
        + f" AS band{k}"
        for k in range(4)
    )
    return f"""tok AS (SELECT doc_id,
                   unnest(list_filter(list_distinct(string_split(text, ' ')),
                                      t -> length(t) > 0)) AS tok
                FROM documents),
        h AS (SELECT doc_id,
                 ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hi,
                 ('0x' || substr(md5(tok), 9, 8))::BIGINT AS lo
              FROM tok),
        votes AS (SELECT doc_id,
               {votes}
              FROM h GROUP BY doc_id),
        fp AS (SELECT doc_id, {fp} AS simhash,
               {band_cols}
              FROM votes),
        bands AS (SELECT doc_id, simhash, 0 AS band_no, band0 AS k FROM fp
                  UNION ALL SELECT doc_id, simhash, 1, band1 FROM fp
                  UNION ALL SELECT doc_id, simhash, 2, band2 FROM fp
                  UNION ALL SELECT doc_id, simhash, 3, band3 FROM fp),
        spairs AS (SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sim_a,
                          b.doc_id AS doc_b, b.simhash AS sim_b
                   FROM bands a JOIN bands b
                     ON a.band_no = b.band_no AND a.k = b.k
                        AND a.doc_id < b.doc_id),
        ham AS (SELECT doc_a, doc_b, bit_count(xor(sim_a, sim_b)) AS hamming
                FROM spairs)"""


def _simhash_oracle(max_hamming: int = 3) -> str:
    return f"""
        WITH {_simhash_ctes()}
        SELECT doc_a, doc_b, CAST(hamming AS INTEGER) AS hamming
        FROM ham WHERE hamming <= {max_hamming}
        ORDER BY doc_a, doc_b
    """


def _clusters_oracle(max_hamming: int = 3) -> str:
    """Connected components over the simhash pairs as a recursive CTE:
    every vertex reaches every label in its component (edges are
    symmetrized), so min(label) per vertex is the component id — the same
    min-label fixpoint the Spark propagation loop converges to."""
    return f"""
        WITH RECURSIVE {_simhash_ctes()},
        pr AS (SELECT doc_a, doc_b FROM ham WHERE hamming <= {max_hamming}),
        edges AS (SELECT doc_a AS s, doc_b AS d FROM pr
                  UNION SELECT doc_b AS s, doc_a AS d FROM pr),
        verts AS (SELECT DISTINCT s AS id FROM edges),
        reach(id, label) AS (
            SELECT id, id FROM verts
            UNION
            SELECT e.s, reach.label FROM edges e JOIN reach ON reach.id = e.d),
        cc AS (SELECT id, min(label) AS label FROM reach GROUP BY id)
        SELECT label AS cluster_id,
               CAST(count(*) AS BIGINT) AS cluster_size,
               min(id) AS canonical_id,
               max(id) AS max_doc_id
        FROM cc GROUP BY label HAVING count(*) >= 2
        ORDER BY cluster_size DESC, cluster_id
    """


def _ivf_oracle(n_planes: int = 4, k: int = 10) -> str:
    """SQL twin of functions.similarity.ivf_bucketed_knn: the hyperplane
    sign pattern is parity of (dim*31 + p*17) — i.e. parity of (dim + p) —
    fixed and engine-agnostic, so the bucket assignment reproduces
    exactly."""
    bucket = " + ".join(
        f"""(CASE WHEN list_sum(list_transform(range(0, len(embedding)),
                 i -> embedding[i + 1]::DOUBLE *
                      (CASE WHEN (i + {p}) % 2 = 0 THEN 1.0 ELSE -1.0 END)))
                 > 0 THEN {1 << p} ELSE 0 END)"""
        for p in range(n_planes)
    )
    return f"""
        WITH b AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
                   {bucket} AS bucket
            FROM embeddings),
        q AS (SELECT emb AS q_emb, bucket AS q_bucket FROM b WHERE vec_id = 0)
        SELECT b.vec_id, b.label,
               round(list_dot_product(b.emb, q.q_emb)
                     / (sqrt(list_dot_product(b.emb, b.emb))
                        * sqrt(list_dot_product(q.q_emb, q.q_emb))), 6) AS cos_sim
        FROM b JOIN q ON b.bucket = q.q_bucket
        WHERE b.vec_id <> 0
        ORDER BY cos_sim DESC, b.vec_id LIMIT {k}
    """


def _rp_lsh_oracle(n_tables: int = 4, n_planes: int = 6, k: int = 10) -> str:
    """SQL twin of functions.similarity.knn_rp_lsh: Rademacher plane
    weights from the same Knuth-multiplier scramble, multi-table probe
    union, exact cosine rerank."""

    def bucket(t: int) -> str:
        return " + ".join(
            f"""(CASE WHEN list_sum(list_transform(range(0, len(emb)),
                 i -> emb[i + 1] *
                      (CASE WHEN ((i * 31 + {p} * 17 + {t} * 101) * 2654435761)
                                 % 4294967296 < 2147483648
                            THEN 1.0 ELSE -1.0 END))) > 0
                 THEN {1 << p} ELSE 0 END)"""
            for p in range(n_planes)
        )

    tables = "\n            UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, {bucket(t)} AS bucket FROM b"
        for t in range(n_tables)
    )
    return f"""
        WITH b AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings),
        buck AS ({tables}),
        qb AS (SELECT t, bucket FROM buck WHERE vec_id = 0),
        cand AS (SELECT DISTINCT buck.vec_id
                 FROM buck JOIN qb ON buck.t = qb.t AND buck.bucket = qb.bucket
                 WHERE buck.vec_id <> 0),
        q AS (SELECT emb AS q_emb FROM b WHERE vec_id = 0)
        SELECT b.vec_id, b.label,
               round(list_dot_product(b.emb, q.q_emb)
                     / (sqrt(list_dot_product(b.emb, b.emb))
                        * sqrt(list_dot_product(q.q_emb, q.q_emb))), 6) AS cos_sim
        FROM b JOIN cand ON b.vec_id = cand.vec_id CROSS JOIN q
        ORDER BY cos_sim DESC, b.vec_id LIMIT {k}
    """


def _rp_lsh_clusters_oracle(
    threshold: float = 0.40, n_tables: int = 4, n_planes: int = 6
) -> str:
    """SQL twin of similarity.embedding_dup_clusters(use_lsh=True): the
    RP-LSH banded candidate pairs (same deterministic bucket arithmetic
    as _rp_lsh_pairs_oracle) feed a recursive-CTE connected-components
    pass and the cluster rollup."""

    def bucket(t: int) -> str:
        terms = []
        for p in range(n_planes):
            w = (
                f"(CASE WHEN ((i * 31 + {p * 17} + {t * 101}) * 2654435761)"
                f" % 4294967296 < 2147483648 THEN 1.0 ELSE -1.0 END)"
            )
            proj = (
                f"list_sum(list_transform(range(0, len(emb)),"
                f" i -> emb[i + 1] * {w}))"
            )
            terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
        return " + ".join(terms)

    buck = "\n            UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, {bucket(t)} AS bucket FROM b"
        for t in range(n_tables)
    )
    return f"""
        WITH RECURSIVE b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings),
        buck AS ({buck}),
        cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
                 FROM buck x JOIN buck y
                   ON x.t = y.t AND x.bucket = y.bucket
                      AND x.vec_id < y.vec_id),
        pr AS (SELECT cand.id_a, cand.id_b
               FROM cand
               JOIN b ea ON ea.vec_id = cand.id_a
               JOIN b eb ON eb.vec_id = cand.id_b
               WHERE round(list_dot_product(ea.emb, eb.emb)
                           / (sqrt(list_dot_product(ea.emb, ea.emb))
                              * sqrt(list_dot_product(eb.emb, eb.emb))), 6)
                     >= {threshold}),
        edges AS (SELECT id_a AS s, id_b AS d FROM pr
                  UNION SELECT id_b AS s, id_a AS d FROM pr),
        verts AS (SELECT DISTINCT s AS id FROM edges),
        reach(id, label) AS (
            SELECT id, id FROM verts
            UNION
            SELECT e.s, reach.label FROM edges e JOIN reach ON reach.id = e.d),
        cc AS (SELECT id, min(label) AS label FROM reach GROUP BY id)
        SELECT label AS cluster_id,
               CAST(count(*) AS BIGINT) AS cluster_size,
               min(id) AS canonical_id,
               max(id) AS max_vec_id
        FROM cc GROUP BY label HAVING count(*) >= 2
        ORDER BY cluster_size DESC, cluster_id
    """


def _lloyd_prefix_sql(
    n_cells: int, n_iters: int, scale: int = 1_000_000
) -> str:
    """Shared CTE prefix replaying functions.similarity.lloyd_assignments
    in SQL: md5-ranked seeds, ``n_iters`` Lloyd rounds as (asg_i, sums_i,
    cents_i) CTE triples, and the final ``cells`` assignment.  Means
    reproduce exactly because the per-dimension sums run over
    round(x*1e6) BIGINTs — order-independent integer arithmetic — with
    one double division at the end; empty cells COALESCE to the previous
    centroid.  Used by the ivf_lloyd and semdedup oracles."""
    cos = (
        "round(list_dot_product(e.emb, c.c_emb)"
        " / (sqrt(list_dot_product(e.emb, e.emb))"
        " * sqrt(list_dot_product(c.c_emb, c.c_emb))), 6)"
    )
    rounds = []
    prev = "cents0"
    for i in range(1, n_iters + 1):
        rounds.append(
            f"""asg{i} AS (
            SELECT vec_id, cell FROM (
                SELECT e.vec_id, c.cell,
                       row_number() OVER (PARTITION BY e.vec_id
                           ORDER BY {cos} DESC, c.cell) AS rn
                FROM e CROSS JOIN {prev} c) WHERE rn = 1),
        sums{i} AS (
            SELECT cell, pos,
                   sum(CAST(round(x * {scale}) AS BIGINT)) AS s,
                   count(*) AS n
            FROM (SELECT a.cell, unnest(e.emb) AS x,
                         generate_subscripts(e.emb, 1) AS pos
                  FROM asg{i} a JOIN e ON e.vec_id = a.vec_id)
            GROUP BY cell, pos),
        cents{i} AS (
            SELECT p.cell, COALESCE(m.c_new, p.c_emb) AS c_emb
            FROM {prev} p LEFT JOIN (
                SELECT cell, list(s / (n * {scale}.0) ORDER BY pos) AS c_new
                FROM sums{i} GROUP BY cell) m ON m.cell = p.cell)"""
        )
        prev = f"cents{i}"
    rounds_sql = ",\n        ".join(rounds)
    return f"""
        WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings),
        cents0 AS (
            SELECT row_number() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS cell,
                   emb AS c_emb
            FROM e
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {n_cells}),
        {rounds_sql},
        final_ranked AS (
            SELECT e.vec_id, e.label, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY {cos} DESC, c.cell) AS rn
            FROM e CROSS JOIN {prev} c),
        cells AS (SELECT vec_id, label, cell FROM final_ranked WHERE rn = 1)"""


def _ivf_lloyd_oracle(
    n_cells: int = 8,
    n_probe: int = 2,
    n_iters: int = 2,
    k: int = 10,
    query_vec_id: int = 0,
    scale: int = 1_000_000,
) -> str:
    """SQL twin of functions.similarity.ivf_lloyd_knn — the Lloyd prefix
    (_lloyd_prefix_sql) plus the probe + exact-rerank tail."""
    return f"""
        {_lloyd_prefix_sql(n_cells, n_iters, scale)},
        qc AS (SELECT cell FROM final_ranked
               WHERE vec_id = {query_vec_id} AND rn <= {n_probe}),
        q AS (SELECT emb AS q_emb FROM e WHERE vec_id = {query_vec_id})
        SELECT c.vec_id, c.label,
               round(list_dot_product(e.emb, q.q_emb)
                     / (sqrt(list_dot_product(e.emb, e.emb))
                        * sqrt(list_dot_product(q.q_emb, q.q_emb))), 6) AS cos_sim
        FROM cells c
        JOIN qc ON c.cell = qc.cell
        JOIN e ON e.vec_id = c.vec_id
        CROSS JOIN q
        WHERE c.vec_id <> {query_vec_id}
        ORDER BY cos_sim DESC, c.vec_id LIMIT {k}
    """


def _knn_graph_oracle(
    k: int = 3, n_tables: int = 4, max_planes: int = 16, band: int = 64
) -> str:
    """SQL twin of functions.similarity.knn_graph_lsh: the same bucket
    arithmetic as _rp_lsh_pairs_oracle, but DIRECTED candidate edges
    from the BANDED sort-projection window and a per-source top-k
    window instead of a threshold filter.

    Mirrors both sf1-probe fixes (SCALEPROBE_r15.json): (1) the Spark
    side auto-scales its plane count with the corpus
    (similarity.occupancy_planes); the SQL computes the FULL
    ``max_planes``-bit bucket and masks to the low L bits, where
    L = greatest(6, least(16, length(bin((n+31)//32 - 1)))) — bit p's
    contribution is (1<<p), so the masked wide bucket IS the L-plane
    bucket.  (2) in-bucket candidates are limited to pairs within
    ``band`` positions of the plane-997 sort projection (tight
    co-directional clusters make raw in-bucket joins quadratic; the
    band keeps the pair stream linear)."""

    def bucket(t: int) -> str:
        terms = []
        for p in range(max_planes):
            w = (
                f"(CASE WHEN ((i * 31 + {p * 17} + {t * 101}) * 2654435761)"
                f" % 4294967296 < 2147483648 THEN 1.0 ELSE -1.0 END)"
            )
            proj = (
                f"list_sum(list_transform(range(0, len(emb)),"
                f" i -> emb[i + 1] * {w}))"
            )
            terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
        return " + ".join(terms)

    # the sort projection: plane 997, table 0 -> i*31 + 997*17
    w_sort = (
        f"(CASE WHEN ((i * 31 + {997 * 17}) * 2654435761)"
        f" % 4294967296 < 2147483648 THEN 1.0 ELSE -1.0 END)"
    )
    buck = "\n            UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, {bucket(t)} AS bucket FROM b"
        for t in range(n_tables)
    )
    return f"""
        WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings),
        nc AS (SELECT greatest(6, least({max_planes},
                   length(bin((count(*) + 31) // 32 - 1)))) AS planes
               FROM embeddings),
        sp AS (SELECT vec_id,
                      round(list_sum(list_transform(range(0, len(emb)),
                          i -> emb[i + 1] * {w_sort})), 6) AS sp
               FROM b),
        buck0 AS ({buck}),
        posd AS (SELECT k.vec_id, k.t,
                        k.bucket & ((1::BIGINT << nc.planes) - 1) AS bucket,
                        sp.sp
                 FROM buck0 k CROSS JOIN nc JOIN sp ON sp.vec_id = k.vec_id),
        pos AS (SELECT vec_id, t, bucket,
                       row_number() OVER (PARTITION BY t, bucket
                           ORDER BY sp, vec_id) AS pos
                FROM posd),
        cand AS (SELECT DISTINCT x.vec_id AS src_id, y.vec_id AS nbr_id
                 FROM pos x JOIN pos y
                   ON x.t = y.t AND x.bucket = y.bucket
                      AND x.vec_id <> y.vec_id
                      AND abs(x.pos - y.pos) <= {band}),
        scored AS (
            SELECT cand.src_id, cand.nbr_id,
                   round(list_dot_product(ea.emb, eb.emb)
                         / (sqrt(list_dot_product(ea.emb, ea.emb))
                            * sqrt(list_dot_product(eb.emb, eb.emb))), 6)
                       AS cos_sim
            FROM cand
            JOIN b ea ON ea.vec_id = cand.src_id
            JOIN b eb ON eb.vec_id = cand.nbr_id),
        ranked AS (
            SELECT src_id, nbr_id, cos_sim,
                   row_number() OVER (PARTITION BY src_id
                       ORDER BY cos_sim DESC, nbr_id) AS rank
            FROM scored)
        SELECT src_id, CAST(rank AS INT) AS rank, nbr_id, cos_sim
        FROM ranked WHERE rank <= {k}
        ORDER BY src_id, rank
    """


def _cluster_capped_sample_oracle(
    max_per_cluster: int = 2, max_hamming: int = 3
) -> str:
    """SQL twin of curation.cluster_capped_sample: the simhash CC from
    _clusters_oracle, every document labeled (singletons self-labeled),
    per-cluster md5-rank cap, per-lang kept/dropped rollup."""
    return f"""
        WITH RECURSIVE {_simhash_ctes()},
        pr AS (SELECT doc_a, doc_b FROM ham WHERE hamming <= {max_hamming}),
        edges AS (SELECT doc_a AS s, doc_b AS d FROM pr
                  UNION SELECT doc_b AS s, doc_a AS d FROM pr),
        verts AS (SELECT DISTINCT s AS id FROM edges),
        reach(id, label) AS (
            SELECT id, id FROM verts
            UNION
            SELECT e.s, reach.label FROM edges e JOIN reach ON reach.id = e.d),
        cc AS (SELECT id, min(label) AS label FROM reach GROUP BY id),
        labeled AS (
            SELECT d.doc_id, d.lang, COALESCE(cc.label, d.doc_id) AS cluster_id
            FROM documents d LEFT JOIN cc ON cc.id = d.doc_id),
        ranked AS (
            SELECT lang,
                   row_number() OVER (PARTITION BY cluster_id
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
            FROM labeled)
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN rk <= {max_per_cluster} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN rk > {max_per_cluster} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dropped
        FROM ranked GROUP BY lang ORDER BY lang
    """


def _stream_ingest_dedup_oracle() -> str:
    """SQL twin of streaming.replay.stream_ingest_dedup: the streaming
    exact pass must equal the batch exact pass — the planted batch
    classified against the distinct corpus texts (sha2 equality is text
    equality), rolled up per lang."""
    from project_bigdata_recsys_spark.functions.dedup import _DRIFT_SUFFIX

    return f"""
        WITH batch AS (
            SELECT doc_id + 3000000 AS doc_id, text, lang
            FROM documents WHERE doc_id % 10 = 0
            UNION ALL
            SELECT doc_id + 3000000, text || '{_DRIFT_SUFFIX}', lang
            FROM documents WHERE doc_id % 10 = 3
            UNION ALL
            SELECT doc_id + 3000000, 'fresh doc ' || CAST(doc_id AS VARCHAR), lang
            FROM documents WHERE doc_id % 10 = 7),
        corpus_texts AS (SELECT DISTINCT text FROM documents)
        SELECT b.lang,
               CAST(count(*) AS BIGINT) AS n_batch,
               CAST(sum(CASE WHEN c.text IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_exact_dropped,
               CAST(sum(CASE WHEN c.text IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_admitted
        FROM batch b LEFT JOIN corpus_texts c ON b.text = c.text
        GROUP BY b.lang ORDER BY b.lang
    """


def _skew_report_oracle(top_k: int = 5) -> str:
    """SQL twin of operators.skew.skew_report: per candidate join key,
    top-K heaviest keys + table share + max/mean skew factor."""
    blocks = []
    for alias, col in (
        ("per_o", "l_orderkey"),
        ("per_p", "l_partkey"),
        ("per_s", "l_suppkey"),
    ):
        blocks.append(
            f"""(SELECT '{col}' AS join_key, key, n,
                   round(n * 100.0 / total, 4) AS pct_of_table,
                   round((SELECT max(n) FROM {alias}) * 1.0
                         / (SELECT avg(n) FROM {alias}), 4) AS skew_factor
            FROM {alias} CROSS JOIN tot
            ORDER BY n DESC, key LIMIT {top_k})"""
        )
    union = "\n            UNION ALL\n            ".join(blocks)
    return f"""
        WITH per_o AS (SELECT CAST(l_orderkey AS BIGINT) AS key,
                              CAST(count(*) AS BIGINT) AS n
                       FROM lineitem GROUP BY 1),
             per_p AS (SELECT CAST(l_partkey AS BIGINT) AS key,
                              CAST(count(*) AS BIGINT) AS n
                       FROM lineitem GROUP BY 1),
             per_s AS (SELECT CAST(l_suppkey AS BIGINT) AS key,
                              CAST(count(*) AS BIGINT) AS n
                       FROM lineitem GROUP BY 1),
             tot AS (SELECT count(*) AS total FROM lineitem)
        SELECT * FROM (
            {union}
        ) ORDER BY join_key, n DESC, key
    """


def _cluster_aware_split_oracle(
    train_frac: float = 0.8, valid_frac: float = 0.1, max_hamming: int = 3
) -> str:
    """SQL twin of curation.cluster_aware_split: simhash CC from
    _simhash_ctes, split drawn from md5(cluster_id), leak audit counted
    (not assumed)."""
    hi = train_frac + valid_frac
    return f"""
        WITH RECURSIVE {_simhash_ctes()},
        pr AS (SELECT doc_a, doc_b FROM ham WHERE hamming <= {max_hamming}),
        edges AS (SELECT doc_a AS s, doc_b AS d FROM pr
                  UNION SELECT doc_b AS s, doc_a AS d FROM pr),
        verts AS (SELECT DISTINCT s AS id FROM edges),
        reach(id, label) AS (
            SELECT id, id FROM verts
            UNION
            SELECT e.s, reach.label FROM edges e JOIN reach ON reach.id = e.d),
        cc AS (SELECT id, min(label) AS label FROM reach GROUP BY id),
        assigned AS (
            SELECT d.doc_id,
                   COALESCE(cc.label, d.doc_id) AS cluster_id,
                   CASE WHEN ('0x' || substr(md5('split:' ||
                            CAST(COALESCE(cc.label, d.doc_id) AS VARCHAR)), 1, 8))::BIGINT
                            / 4294967296.0 < {train_frac} THEN 'train'
                        WHEN ('0x' || substr(md5('split:' ||
                            CAST(COALESCE(cc.label, d.doc_id) AS VARCHAR)), 1, 8))::BIGINT
                            / 4294967296.0 < {hi} THEN 'valid'
                        ELSE 'test' END AS split
            FROM documents d LEFT JOIN cc ON cc.id = d.doc_id),
        leaky AS (
            SELECT CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_leaky_clusters
            FROM (SELECT cluster_id, count(DISTINCT split) AS n_splits
                  FROM assigned GROUP BY cluster_id))
        SELECT split,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
               leaky.n_leaky_clusters
        FROM assigned, leaky
        GROUP BY split, leaky.n_leaky_clusters
        ORDER BY split
    """


def _pagerank_oracle(
    damping: float = 0.85, k: int = 25, personalized: bool = False
) -> str:
    """SQL twin of functions.graph.item_pagerank(_personalized): the
    symmetric weighted co-occurrence graph with 3 unrolled PageRank
    iterations; ``personalized`` restricts the teleport vector (and the
    initial ranks) to the partkey % 10 == 0 seed set."""
    d, t = damping, 1.0 - damping
    iters = []
    prev = "r0"
    for i in (1, 2, 3):
        iters.append(f"""
        c{i} AS (
            SELECT m.dst, sum(r.rank * m.p) AS inflow
            FROM norm m JOIN {prev} r ON r.node = m.src
            GROUP BY m.dst),
        r{i} AS (
            SELECT n.node, {t} * b.tele + {d} * coalesce(c{i}.inflow, 0.0)
                       AS rank
            FROM nodes n JOIN base b ON b.node = n.node
            LEFT JOIN c{i} ON c{i}.dst = n.node)""")
        prev = f"r{i}"
    if personalized:
        base = """base AS (
            SELECT n.node,
                   CASE WHEN n.node % 10 = 0 THEN 1.0 / nn.n ELSE 0.0 END
                       AS tele
            FROM nodes n CROSS JOIN
                 (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
                  WHERE node % 10 = 0) nn)"""
    else:
        base = """base AS (
            SELECT node, 1.0 / nn.n AS tele FROM nodes
            CROSS JOIN (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes) nn)"""
    return f"""
        WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        half AS (
            SELECT a.l_partkey AS src, b.l_partkey AS dst,
                   CAST(count(*) AS DOUBLE) AS w
            FROM basket a JOIN basket b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2),
        edges AS (SELECT src, dst, w FROM half
                  UNION ALL SELECT dst, src, w FROM half),
        outw AS (SELECT src, sum(w) AS w_out FROM edges GROUP BY src),
        norm AS (SELECT e.src, e.dst, e.w / o.w_out AS p
                 FROM edges e JOIN outw o USING (src)),
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        {base},
        r0 AS (SELECT node, tele AS rank FROM base),
        {",".join(iters)}
        SELECT node AS part, round(rank, 6) AS rank
        FROM {prev}
        ORDER BY rank DESC, part
        LIMIT {k}
    """


def _span_dedup_incremental_oracle() -> str:
    """SQL twin of spans.build_span_index + probe_span_index over the
    planted ingest batch: corpus span-key set, batch segmentation with
    the identical md5 arithmetic, dup_corpus > dup_intra > new
    precedence."""
    from project_bigdata_recsys_spark.functions.dedup import _DRIFT_SUFFIX

    def segs(src: str, cols: str) -> str:
        return f"""(
            SELECT doc_id, seg_no,
                   substr(md5(array_to_string(ts[seg_no*8+1 : seg_no*8+8], ' ')), 1, 16) AS h
                   {cols}
            FROM (
                SELECT doc_id, ts,
                       unnest(range(0, CAST(ceil(len(ts)/8.0) AS BIGINT))) AS seg_no
                       {cols}
                FROM (SELECT doc_id, string_split(text, ' ') AS ts {cols}
                      FROM {src})))"""

    return f"""
        WITH batch AS (
            SELECT doc_id + 3000000 AS doc_id, text, lang
            FROM documents WHERE doc_id % 10 = 0
            UNION ALL
            SELECT doc_id + 3000000, text || '{_DRIFT_SUFFIX}', lang
            FROM documents WHERE doc_id % 10 = 3
            UNION ALL
            SELECT doc_id + 3000000, 'fresh doc ' || CAST(doc_id AS VARCHAR), lang
            FROM documents WHERE doc_id % 10 = 7),
        corpus_h AS (SELECT DISTINCT h FROM {segs('documents', '')} s),
        bsegs AS (
            SELECT doc_id, seg_no, h, lang,
                   doc_id * 1000000 + seg_no AS occ
            FROM {segs('batch', ', lang')} s),
        intra AS (
            SELECT h, count(*) AS b_occ, min(occ) AS b_first
            FROM bsegs GROUP BY h),
        joined AS (
            SELECT b.lang, b.doc_id,
                   CASE WHEN c.h IS NOT NULL THEN 'dup_corpus'
                        WHEN i.b_occ > 1 AND b.occ <> i.b_first THEN 'dup_intra'
                        ELSE 'new' END AS cls
            FROM bsegs b
            JOIN intra i USING (h)
            LEFT JOIN corpus_h c ON c.h = b.h)
        SELECT lang,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(CASE WHEN cls = 'dup_corpus' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_corpus,
               CAST(sum(CASE WHEN cls = 'dup_intra' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_intra,
               CAST(sum(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new
        FROM joined
        GROUP BY lang
        ORDER BY lang
    """


def _pq_knn_oracle(
    query_vec_id: int = 0,
    k: int = 10,
    m_sub: int = 8,
    k_codes: int = 16,
    sub_dim: int = 8,
    rerank_factor: int = 4,
) -> str:
    """SQL twin of similarity.pq_knn: md5-rank codebook, per-subspace
    argmin encoding, ADC shortlist, exact cosine rerank."""
    lo, w = f"mm*{sub_dim}+1", f"mm*{sub_dim}+{sub_dim}"
    return f"""
        WITH emb AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        seeds AS (
            SELECT vec_id AS seed_id, e AS s_emb FROM emb
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k_codes}),
        coded AS (
            SELECT s_emb,
                   CAST(row_number() OVER (
                       ORDER BY md5(CAST(seed_id AS VARCHAR)), seed_id) AS INTEGER)
                       AS code
            FROM seeds),
        book AS (
            SELECT code, CAST(mm AS INTEGER) AS m, s_emb[{lo} : {w}] AS c_sub
            FROM (SELECT code, s_emb, unnest(range(0, {m_sub})) AS mm FROM coded)),
        vec_subs AS (
            SELECT vec_id, CAST(mm AS INTEGER) AS m, e[{lo} : {w}] AS v_sub
            FROM (SELECT vec_id, e, unnest(range(0, {m_sub})) AS mm FROM emb)),
        dists AS (
            SELECT vec_id, m, code,
                   round(list_dot_product(v_sub, v_sub)
                         - 2 * list_dot_product(v_sub, c_sub)
                         + list_dot_product(c_sub, c_sub), 9) AS d2
            FROM vec_subs JOIN book USING (m)),
        codes AS (
            SELECT vec_id, m, code FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id, m ORDER BY d2, code) AS rn
                FROM dists)
            WHERE rn = 1),
        qsub AS (
            SELECT CAST(mm AS INTEGER) AS m, e[{lo} : {w}] AS q_sub
            FROM (SELECT e, unnest(range(0, {m_sub})) AS mm
                  FROM emb WHERE vec_id = {query_vec_id})),
        adc AS (
            SELECT m, code,
                   list_dot_product(q_sub, q_sub)
                   - 2 * list_dot_product(q_sub, c_sub)
                   + list_dot_product(c_sub, c_sub) AS d2
            FROM qsub JOIN book USING (m)),
        short AS (
            SELECT c.vec_id, round(sum(a.d2), 6) AS approx_d2
            FROM codes c JOIN adc a USING (m, code)
            WHERE c.vec_id <> {query_vec_id}
            GROUP BY c.vec_id
            ORDER BY approx_d2, c.vec_id
            LIMIT {rerank_factor * k}),
        q AS (SELECT e AS q_emb FROM emb WHERE vec_id = {query_vec_id})
        SELECT e.vec_id, e.label,
               round(list_dot_product(e.e, q.q_emb)
                     / (sqrt(list_dot_product(e.e, e.e))
                        * sqrt(list_dot_product(q.q_emb, q.q_emb))), 6) AS cos_sim
        FROM emb e JOIN short s ON s.vec_id = e.vec_id CROSS JOIN q
        ORDER BY cos_sim DESC, e.vec_id
        LIMIT {k}
    """


def _stream_span_dedup_oracle() -> str:
    """SQL twin of streaming.replay.stream_span_dedup: the planted batch
    segmented with the span arithmetic, classified per span against the
    corpus span-key set (stream ≡ batch for a full bounded replay)."""
    from project_bigdata_recsys_spark.functions.dedup import _DRIFT_SUFFIX

    return f"""
        WITH batch AS (
            SELECT doc_id + 3000000 AS doc_id, text, lang
            FROM documents WHERE doc_id % 10 = 0
            UNION ALL
            SELECT doc_id + 3000000, text || '{_DRIFT_SUFFIX}', lang
            FROM documents WHERE doc_id % 10 = 3
            UNION ALL
            SELECT doc_id + 3000000, 'fresh doc ' || CAST(doc_id AS VARCHAR), lang
            FROM documents WHERE doc_id % 10 = 7),
        corpus_h AS (
            SELECT DISTINCT substr(md5(array_to_string(ts[seg_no*8+1 : seg_no*8+8], ' ')), 1, 16) AS h
            FROM (SELECT ts, unnest(range(0, CAST(ceil(len(ts)/8.0) AS BIGINT))) AS seg_no
                  FROM (SELECT string_split(text, ' ') AS ts FROM documents))),
        bsegs AS (
            SELECT lang,
                   substr(md5(array_to_string(ts[seg_no*8+1 : seg_no*8+8], ' ')), 1, 16) AS h
            FROM (SELECT lang, ts, unnest(range(0, CAST(ceil(len(ts)/8.0) AS BIGINT))) AS seg_no
                  FROM (SELECT lang, string_split(text, ' ') AS ts FROM batch)))
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(CASE WHEN c.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_corpus,
               CAST(sum(CASE WHEN c.h IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_not_in_corpus
        FROM bsegs b LEFT JOIN corpus_h c ON c.h = b.h
        GROUP BY lang
        ORDER BY lang
    """


def _pq_multi_oracle(
    n_queries: int = 5,
    k: int = 5,
    m_sub: int = 8,
    k_codes: int = 16,
    sub_dim: int = 8,
    rerank_factor: int = 4,
) -> str:
    """SQL twin of similarity.pq_multi_query: shared codes, per-query ADC
    tables, windowed shortlists, exact rerank."""
    lo, w = f"mm*{sub_dim}+1", f"mm*{sub_dim}+{sub_dim}"
    return f"""
        WITH emb AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        seeds AS (
            SELECT vec_id AS seed_id, e AS s_emb FROM emb
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k_codes}),
        coded AS (
            SELECT s_emb,
                   CAST(row_number() OVER (
                       ORDER BY md5(CAST(seed_id AS VARCHAR)), seed_id) AS INTEGER)
                       AS code
            FROM seeds),
        book AS (
            SELECT code, CAST(mm AS INTEGER) AS m, s_emb[{lo} : {w}] AS c_sub
            FROM (SELECT code, s_emb, unnest(range(0, {m_sub})) AS mm FROM coded)),
        vec_subs AS (
            SELECT vec_id, CAST(mm AS INTEGER) AS m, e[{lo} : {w}] AS v_sub
            FROM (SELECT vec_id, e, unnest(range(0, {m_sub})) AS mm FROM emb)),
        dists AS (
            SELECT vec_id, m, code,
                   round(list_dot_product(v_sub, v_sub)
                         - 2 * list_dot_product(v_sub, c_sub)
                         + list_dot_product(c_sub, c_sub), 9) AS d2
            FROM vec_subs JOIN book USING (m)),
        codes AS (
            SELECT vec_id, m, code FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id, m ORDER BY d2, code) AS rn
                FROM dists)
            WHERE rn = 1),
        qsub AS (
            SELECT vec_id AS query_id, CAST(mm AS INTEGER) AS m,
                   e[{lo} : {w}] AS q_sub
            FROM (SELECT vec_id, e, unnest(range(0, {m_sub})) AS mm
                  FROM emb WHERE vec_id < {n_queries})),
        adc AS (
            SELECT query_id, m, code,
                   list_dot_product(q_sub, q_sub)
                   - 2 * list_dot_product(q_sub, c_sub)
                   + list_dot_product(c_sub, c_sub) AS d2
            FROM qsub JOIN book USING (m)),
        approx AS (
            SELECT a.query_id, c.vec_id, round(sum(a.d2), 6) AS approx_d2
            FROM codes c JOIN adc a USING (m, code)
            WHERE c.vec_id <> a.query_id
            GROUP BY a.query_id, c.vec_id),
        short AS (
            SELECT query_id, vec_id FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY approx_d2, vec_id) AS srn
                FROM approx)
            WHERE srn <= {rerank_factor * k}),
        qe AS (SELECT vec_id AS query_id, e AS q_emb FROM emb
               WHERE vec_id < {n_queries}),
        rer AS (
            SELECT s.query_id, e.vec_id, e.label,
                   round(list_dot_product(e.e, qe.q_emb)
                         / (sqrt(list_dot_product(e.e, e.e))
                            * sqrt(list_dot_product(qe.q_emb, qe.q_emb))), 6)
                       AS cos_sim
            FROM short s
            JOIN emb e ON e.vec_id = s.vec_id
            JOIN qe ON qe.query_id = s.query_id)
        SELECT query_id, vec_id, label, cos_sim,
               CAST(rank AS INTEGER) AS rank
        FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cos_sim DESC, vec_id) AS rank
            FROM rer)
        WHERE rank <= {k}
        ORDER BY query_id, rank
    """


def _analyze_table_oracle() -> str:
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority"]
    parts = [
        f"""
        SELECT '{c}' AS "column",
               CAST(count(DISTINCT {c}) AS BIGINT) AS ndv,
               round(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) * 1.0
                     / count(*), 6) AS null_frac,
               CAST(min({c}) AS VARCHAR) AS min_value,
               CAST(max({c}) AS VARCHAR) AS max_value
        FROM orders"""
        for c in cols
    ]
    return " UNION ALL ".join(parts) + ' ORDER BY "column"'


def _semantic_contamination_oracle(
    threshold: float = 0.40,
    split_at: int = 250,
    n_tables: int = 4,
    n_planes: int = 6,
) -> str:
    """SQL twin of functions.similarity.semantic_contamination: the same
    deterministic Rademacher buckets as _rp_lsh_pairs_oracle, restricted
    to eval x train cells, exact-cosine verified, rolled up per label."""

    def bucket(t: int) -> str:
        terms = []
        for p in range(n_planes):
            w = (
                f"(CASE WHEN ((i * 31 + {p * 17} + {t * 101}) * 2654435761)"
                f" % 4294967296 < 2147483648 THEN 1.0 ELSE -1.0 END)"
            )
            proj = (
                f"list_sum(list_transform(range(0, len(emb)),"
                f" i -> emb[i + 1] * {w}))"
            )
            terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
        return " + ".join(terms)

    buck = "\n            UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, {bucket(t)} AS bucket FROM b"
        for t in range(n_tables)
    )
    return f"""
        WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings),
        buck AS ({buck}),
        cand AS (SELECT DISTINCT x.vec_id AS eval_id, y.vec_id AS train_id
                 FROM buck x JOIN buck y
                   ON x.t = y.t AND x.bucket = y.bucket
                 WHERE x.vec_id >= {split_at} AND y.vec_id < {split_at}),
        hits AS (
            SELECT DISTINCT cand.eval_id
            FROM cand
            JOIN b ea ON ea.vec_id = cand.eval_id
            JOIN b et ON et.vec_id = cand.train_id
            WHERE round(list_dot_product(ea.emb, et.emb)
                        / (sqrt(list_dot_product(ea.emb, ea.emb))
                           * sqrt(list_dot_product(et.emb, et.emb))), 6)
                  >= {threshold}),
        ev AS (SELECT vec_id AS eval_id, label FROM embeddings
               WHERE vec_id >= {split_at})
        SELECT ev.label,
               CAST(count(*) AS BIGINT) AS n_eval,
               CAST(sum(CASE WHEN h.eval_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_contaminated,
               round(sum(CASE WHEN h.eval_id IS NOT NULL THEN 1 ELSE 0 END)
                     * 1.0 / count(*), 4) AS contamination_rate
        FROM ev LEFT JOIN hits h ON ev.eval_id = h.eval_id
        GROUP BY ev.label ORDER BY ev.label
    """


def _source_dup_attribution_oracle(max_hamming: int = 3) -> str:
    """SQL twin of sourcetriage.source_dup_attribution: the simhash CC
    from _clusters_oracle, cluster members joined to their source, and a
    per-source rollup of cross-source cluster membership."""
    return f"""
        WITH RECURSIVE {_simhash_ctes()},
        pr AS (SELECT doc_a, doc_b FROM ham WHERE hamming <= {max_hamming}),
        edges AS (SELECT doc_a AS s, doc_b AS d FROM pr
                  UNION SELECT doc_b AS s, doc_a AS d FROM pr),
        verts AS (SELECT DISTINCT s AS id FROM edges),
        reach(id, label) AS (
            SELECT id, id FROM verts
            UNION
            SELECT e.s, reach.label FROM edges e JOIN reach ON reach.id = e.d),
        cc AS (SELECT id, min(label) AS label FROM reach GROUP BY id),
        members AS (
            SELECT cc.id AS doc_id, cc.label AS cluster_id, d.source
            FROM cc JOIN documents d ON d.doc_id = cc.id),
        cstats AS (SELECT cluster_id, count(DISTINCT source) AS n_sources
                   FROM members GROUP BY cluster_id)
        SELECT m.source,
               CAST(count(*) AS BIGINT) AS n_dup_docs,
               CAST(sum(CASE WHEN c.n_sources > 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_cross_docs,
               round(sum(CASE WHEN c.n_sources > 1 THEN 1 ELSE 0 END) * 1.0
                     / count(*), 4) AS cross_rate
        FROM members m JOIN cstats c ON m.cluster_id = c.cluster_id
        GROUP BY m.source ORDER BY m.source
    """


def _ann_recall_oracle(
    n_queries: int = 10, k: int = 10, n_tables: int = 4, n_planes: int = 6
) -> str:
    """SQL twin of similarity.ann_recall_profile: exact brute top-k per
    probe query vs the deterministic Rademacher bucket candidates."""

    def bucket(t: int) -> str:
        terms = []
        for p in range(n_planes):
            w = (
                f"(CASE WHEN ((i * 31 + {p * 17} + {t * 101}) * 2654435761)"
                f" % 4294967296 < 2147483648 THEN 1.0 ELSE -1.0 END)"
            )
            proj = (
                f"list_sum(list_transform(range(0, len(emb)),"
                f" i -> emb[i + 1] * {w}))"
            )
            terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
        return " + ".join(terms)

    buck = "\n            UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, {bucket(t)} AS bucket FROM b"
        for t in range(n_tables)
    )
    return f"""
        WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings),
        q AS (SELECT vec_id AS query_id, emb AS q_emb FROM b
              WHERE vec_id < {n_queries}),
        scored AS (
            SELECT q.query_id, e.vec_id,
                   list_dot_product(e.emb, q.q_emb)
                   / (sqrt(list_dot_product(e.emb, e.emb))
                      * sqrt(list_dot_product(q.q_emb, q.q_emb))) AS cos
            FROM b e CROSS JOIN q WHERE e.vec_id != q.query_id),
        truth AS (
            SELECT query_id, vec_id FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
                FROM scored)
            WHERE rank <= {k}),
        buck AS ({buck}),
        cand AS (
            SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id
            FROM buck qb JOIN buck cb
              ON qb.t = cb.t AND qb.bucket = cb.bucket
            WHERE qb.vec_id < {n_queries} AND cb.vec_id != qb.vec_id)
        SELECT t.query_id,
               CAST(count(*) AS BIGINT) AS k,
               CAST(sum(CASE WHEN c.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_found,
               round(sum(CASE WHEN c.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                     * 1.0 / count(*), 4) AS recall
        FROM truth t
        LEFT JOIN cand c
          ON t.query_id = c.query_id AND t.vec_id = c.vec_id
        GROUP BY t.query_id ORDER BY t.query_id
    """


def _semdedup_oracle(
    n_cells: int = 8,
    n_iters: int = 2,
    threshold: float = 0.40,
    max_cell: int = 4096,
) -> str:
    """SQL twin of functions.similarity.semdedup_profile: the shared
    Lloyd prefix, then within-cell pairwise cosine at 6 dp and the
    keep-min-id drop rule.  The pair join never crosses cells and skips
    cells larger than ``max_cell`` (kept whole) — identical to the
    Spark plan's degenerate-cell cap."""
    cos_ab = (
        "round(list_dot_product(ea.emb, eb.emb)"
        " / (sqrt(list_dot_product(ea.emb, ea.emb))"
        " * sqrt(list_dot_product(eb.emb, eb.emb))), 6)"
    )
    return f"""
        {_lloyd_prefix_sql(n_cells, n_iters)},
        sizes AS (
            SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs
            FROM cells GROUP BY cell),
        eligible AS (
            SELECT c.cell, c.vec_id, e.emb
            FROM cells c
            JOIN e ON e.vec_id = c.vec_id
            JOIN sizes s ON s.cell = c.cell
            WHERE s.n_vecs <= {max_cell}),
        dropped AS (
            SELECT DISTINCT ea.cell, eb.vec_id
            FROM eligible ea
            JOIN eligible eb
              ON ea.cell = eb.cell AND ea.vec_id < eb.vec_id
            WHERE {cos_ab} >= {threshold}),
        drops AS (
            SELECT cell, CAST(count(*) AS BIGINT) AS n_dropped
            FROM dropped GROUP BY cell)
        SELECT s.cell,
               s.n_vecs,
               COALESCE(d.n_dropped, 0) AS n_dropped,
               s.n_vecs - COALESCE(d.n_dropped, 0) AS n_kept,
               round((s.n_vecs - COALESCE(d.n_dropped, 0))
                     / CAST(s.n_vecs AS DOUBLE), 6) AS kept_frac
        FROM sizes s LEFT JOIN drops d ON d.cell = s.cell
        ORDER BY s.cell
    """


def _ranking_metrics_oracle() -> str:
    """SQL twin of ml.ranking.ranking_metrics: leave-one-out by md5
    rank, popularity candidates capped at K + max-degree (the flat
    pr <= C form equals the Spark TakeOrdered-then-rank because the
    (count DESC, item) ordering is total), filtered rank by counting
    the user's own higher-ranked train items, and the shared
    integer-micro contribution tables indexed by rank."""
    from project_bigdata_recsys_spark.ml.ranking import (
        DCG_MICRO,
        EVAL_KS,
        RR_MICRO,
    )

    rr = ", ".join(map(str, RR_MICRO))
    dcg = ", ".join(map(str, DCG_MICRO))
    ks = ", ".join(map(str, EVAL_KS))
    k_max = max(EVAL_KS)
    return f"""
    WITH inter AS (
        SELECT o_custkey AS u, l_partkey AS i
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_custkey, l_partkey),
    ranked AS (
        SELECT u, i,
               row_number() OVER (
                   PARTITION BY u
                   ORDER BY md5('loo:' || CAST(u AS VARCHAR) || ':'
                                || CAST(i AS VARCHAR)) DESC, i) AS rn
        FROM inter),
    test AS (SELECT u, i FROM ranked WHERE rn = 1),
    train AS (SELECT u, i FROM ranked WHERE rn > 1),
    c_lim AS (SELECT {k_max} + COALESCE(max(cnt), 0) AS c FROM
              (SELECT count(*) AS cnt FROM train GROUP BY u)),
    pop AS (SELECT i, count(*) AS cnt,
                   row_number() OVER (ORDER BY count(*) DESC, i) AS pr
            FROM train GROUP BY i),
    cands AS (SELECT i, pr FROM pop WHERE pr <= (SELECT c FROM c_lim)),
    test_r AS (SELECT t.u, c.pr AS pr_test
               FROM test t LEFT JOIN cands c ON c.i = t.i),
    above AS (SELECT tr.u, count(*) AS n_above
              FROM train tr
              JOIN cands c ON c.i = tr.i
              JOIN test_r x ON x.u = tr.u
              WHERE c.pr < x.pr_test
              GROUP BY tr.u),
    fr AS (SELECT t.u, t.pr_test - COALESCE(a.n_above, 0) AS fr
           FROM test_r t LEFT JOIN above a ON a.u = t.u),
    per_k AS (
        SELECT k.k,
               CASE WHEN fr.fr IS NOT NULL AND fr.fr <= k.k
                    THEN 1 ELSE 0 END AS hit,
               CASE WHEN fr.fr IS NOT NULL AND fr.fr <= k.k
                    THEN ([{rr}])[fr.fr] ELSE 0 END AS rr_micro,
               CASE WHEN fr.fr IS NOT NULL AND fr.fr <= k.k
                    THEN ([{dcg}])[fr.fr] ELSE 0 END AS dcg_micro
        FROM fr CROSS JOIN (SELECT unnest([{ks}]) AS k) k)
    SELECT k,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(hit) AS BIGINT) AS n_hits,
           round(sum(hit) / count(*), 6) AS hit_rate,
           round(sum(rr_micro) / 1000000.0 / count(*), 6) AS mrr,
           round(sum(dcg_micro) / 1000000.0 / count(*), 6) AS ndcg
    FROM per_k GROUP BY k ORDER BY k
    """


def _lsh_band_sweep_oracle() -> str:
    from project_bigdata_recsys_spark.functions.dedup import (
        LSH_SWEEP_CONFIGS,
        MINHASH_PRIME,
        minhash_params,
    )

    mins = ",\n               ".join(
        f"list_min(list_transform(bases, x -> (x * {a} + {b})"
        f" % {MINHASH_PRIME})) AS m{i}"
        for i, (a, b) in enumerate(minhash_params(16))
    )
    blocks = []
    for b_cnt, r in LSH_SWEEP_CONFIGS:
        thresh = round((1.0 / b_cnt) ** (1.0 / r), 6)
        keys = lambda i: ", ".join(  # noqa: E731
            f"m{i * r + j} AS k{j}" for j in range(r)
        )
        bands = "\n                UNION ALL ".join(
            f"SELECT doc_id, {i} AS band_no, {keys(i)} FROM sig"
            for i in range(b_cnt)
        )
        on = " AND ".join(f"x.k{j} = y.k{j}" for j in range(r))
        grp = ", ".join(f"k{j}" for j in range(r))
        matches = " + ".join(f"(sa.m{i} = sb.m{i})::INT" for i in range(16))
        blocks.append(f"""
        SELECT CAST({b_cnt} AS BIGINT) AS n_bands,
               CAST({r} AS BIGINT) AS rows_per_band,
               {thresh!r} AS threshold_50,
               (SELECT CAST(count(*) AS BIGINT) FROM (
                    SELECT band_no, {grp} FROM ({bands}) t
                    GROUP BY band_no, {grp} HAVING count(*) >= 2))
                   AS n_hot_buckets,
               (SELECT CAST(count(*) AS BIGINT) FROM (
                    SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                    FROM ({bands}) x JOIN ({bands}) y
                      ON x.band_no = y.band_no AND {on}
                         AND x.doc_id < y.doc_id))
                   AS n_candidate_pairs,
               (SELECT CASE WHEN count(*) > 0
                            THEN round(sum({matches})
                                       / (16.0 * count(*)), 6) END
                FROM (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                      FROM ({bands}) x JOIN ({bands}) y
                        ON x.band_no = y.band_no AND {on}
                           AND x.doc_id < y.doc_id) c
                JOIN sig sa ON sa.doc_id = c.a
                JOIN sig sb ON sb.doc_id = c.b)
                   AS avg_est_jaccard""")
    union = "\n        UNION ALL".join(blocks)
    return f"""
        WITH {_DD_SHINGLES},
        basesq AS (SELECT doc_id,
               list_transform(gs, s -> {_dd_hash32('s', '')} % {MINHASH_PRIME})
                   AS bases
           FROM sh2),
        sig AS (SELECT doc_id,
               {mins}
           FROM basesq)
        {union}
        ORDER BY n_bands DESC
    """


def _bradley_terry_oracle(iters: int = 8) -> str:
    its = []
    prev = "r0"
    for t in range(1, iters + 1):
        its.append(f"""
        d{t} AS (
            SELECT wt.i, wt.W, sum(wt.g / (pi.r + pj.r)) AS den
            FROM wt JOIN {prev} pi ON pi.item = wt.i
                    JOIN {prev} pj ON pj.item = wt.j
            GROUP BY wt.i, wt.W),
        u{t} AS MATERIALIZED (SELECT i AS item, W / den AS u FROM d{t}),
        s{t} AS (SELECT sum(u) AS s FROM u{t}),
        r{t} AS MATERIALIZED (SELECT item, round(u / s, 6) AS r
                 FROM u{t} CROSS JOIN s{t})""")
        prev = f"r{t}"
    return f"""
    WITH cnt AS (
        SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2),
    duels AS (
        SELECT a.event_type AS ti, b.event_type AS tj, a.n AS ni, b.n AS nj
        FROM cnt a JOIN cnt b ON a.user_id = b.user_id
                            AND a.event_type < b.event_type
        WHERE a.n <> b.n),
    wins AS MATERIALIZED (
        SELECT CASE WHEN ni > nj THEN ti ELSE tj END AS winner,
               CASE WHEN ni > nj THEN tj ELSE ti END AS loser,
               CAST(count(*) AS BIGINT) AS w
        FROM duels GROUP BY 1, 2),
    games AS MATERIALIZED (
        SELECT i, j, CAST(sum(w) AS BIGINT) AS g FROM (
            SELECT winner AS i, loser AS j, w FROM wins
            UNION ALL SELECT loser, winner, w FROM wins)
        GROUP BY i, j),
    wtot AS (SELECT winner AS i, CAST(sum(w) AS BIGINT) AS W
             FROM wins GROUP BY winner),
    wt AS MATERIALIZED (SELECT g.i, g.j, g.g, coalesce(wtot.W, 0) AS W
           FROM games g LEFT JOIN wtot ON wtot.i = g.i),
    r0 AS MATERIALIZED (SELECT DISTINCT i AS item, 1.0 AS r FROM games),
    {",".join(its)},
    per AS (SELECT winner AS item, CAST(sum(w) AS BIGINT) AS n_wins
            FROM wins GROUP BY winner),
    ng AS (SELECT i AS item, CAST(sum(g) AS BIGINT) AS n_games
           FROM games GROUP BY i)
    SELECT r.item, coalesce(per.n_wins, 0) AS n_wins,
           coalesce(ng.n_games, 0) AS n_games, r.r AS rating
    FROM {prev} r LEFT JOIN per USING (item) LEFT JOIN ng USING (item)
    ORDER BY rating DESC, item
    """


def _hits_oracle(iters: int = 3, k: int = 25) -> str:
    parts = []
    prev_h = "h0"
    prev_a = None
    for t in range(1, iters + 1):
        parts.append(f"""
        a{t}r AS (SELECT auth, sum(h) AS a
                  FROM e JOIN {prev_h} USING (hub) GROUP BY auth),
        a{t} AS (SELECT auth,
                        round(a / (SELECT sum(a) / count(*) FROM a{t}r), 6)
                            AS a
                 FROM a{t}r),
        h{t}r AS (SELECT hub, sum(a) AS h
                  FROM e JOIN a{t} USING (auth) GROUP BY hub),
        h{t} AS (SELECT hub,
                        round(h / (SELECT sum(h) / count(*) FROM h{t}r), 6)
                            AS h
                 FROM h{t}r)""")
        prev_h = f"h{t}"
        prev_a = f"a{t}"
    return f"""
    WITH e AS (SELECT DISTINCT l_orderkey AS hub, l_partkey AS auth
               FROM lineitem),
    h0 AS (SELECT DISTINCT hub, 1.0 AS h FROM e),
    {",".join(parts)}
    SELECT auth AS part, a AS authority
    FROM {prev_a}
    ORDER BY authority DESC, part
    LIMIT {k}
    """


def _textrank_oracle(damping: float = 0.85, k: int = 25) -> str:
    d, t = damping, 1.0 - damping
    iters = []
    prev = "r0"
    for i in (1, 2, 3):
        iters.append(f"""
        c{i} AS (
            SELECT m.dst, sum(r.rank * m.p) AS inflow
            FROM norm m JOIN {prev} r ON r.node = m.src
            GROUP BY m.dst),
        r{i} AS (
            SELECT n.node, {t} * b.tele + {d} * coalesce(c{i}.inflow, 0.0)
                       AS rank
            FROM nodes n JOIN base b ON b.node = n.node
            LEFT JOIN c{i} ON c{i}.dst = n.node)""")
        prev = f"r{i}"
    return f"""
    WITH tk AS (
        SELECT list_filter(string_split(text, ' '), t -> length(t) >= 4)
                   AS toks
        FROM documents),
    pr AS (
        SELECT toks[i] AS w1, toks[i + 1] AS w2
        FROM (SELECT toks, unnest(range(1, len(toks))) AS i
              FROM tk WHERE len(toks) >= 2)),
    half AS (
        SELECT w1, w2, CAST(count(*) AS DOUBLE) AS w
        FROM pr WHERE w1 <> w2 GROUP BY 1, 2),
    edges AS (
        SELECT src, dst, sum(w) AS w FROM (
            SELECT w1 AS src, w2 AS dst, w FROM half
            UNION ALL SELECT w2, w1, w FROM half)
        GROUP BY 1, 2),
    outw AS (SELECT src, sum(w) AS w_out FROM edges GROUP BY src),
    norm AS (SELECT e.src, e.dst, e.w / o.w_out AS p
             FROM edges e JOIN outw o USING (src)),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    base AS (SELECT node, 1.0 / nn.n AS tele FROM nodes
             CROSS JOIN (SELECT CAST(count(*) AS DOUBLE) AS n
                         FROM nodes) nn),
    r0 AS (SELECT node, tele AS rank FROM base),
    {",".join(iters)}
    SELECT node AS word, round(rank, 6) AS rank
    FROM {prev}
    ORDER BY rank DESC, word
    LIMIT {k}
    """


def _kcore_oracle(deg_frac: float = 0.25, n_rounds: int = 6) -> str:
    parts = []
    prev = "g0"
    selects = []
    for r in range(1, n_rounds + 1):
        parts.append(f"""
        d{r} AS MATERIALIZED (
            SELECT g.src FROM {prev} g GROUP BY g.src
            HAVING count(*) >= (SELECT k FROM kv)),
        g{r} AS MATERIALIZED (SELECT g.src, g.dst FROM {prev} g
                 JOIN d{r} ON d{r}.src = g.src
                 JOIN d{r} d{r}b ON d{r}b.src = g.dst),
        s{r} AS (SELECT {r} AS round,
                        (SELECT k FROM kv) AS k,
                        CAST(count(DISTINCT src) AS BIGINT) AS n_nodes,
                        CAST(count(*) AS BIGINT) AS n_edges_directed
                 FROM g{r})""")
        selects.append(f"SELECT * FROM s{r}")
        prev = f"g{r}"
    return f"""
    WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    half AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM basket a JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2),
    g0 AS MATERIALIZED (SELECT src, dst FROM half
           UNION ALL SELECT dst, src FROM half),
    deg0 AS (SELECT src, count(*) AS d FROM g0 GROUP BY src),
    hist AS (SELECT d, count(*) AS n FROM deg0 GROUP BY d),
    cum AS (SELECT d,
                   sum(n) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS c,
                   sum(n) OVER () AS nt
            FROM hist),
    kv AS MATERIALIZED (
        SELECT CAST(min(d) AS BIGINT) AS k FROM cum
        WHERE c >= {deg_frac} * nt),
    {",".join(parts)}
    SELECT * FROM ({" UNION ALL ".join(selects)})
    ORDER BY round
    """


def _top_pc_oracle(iters: int = 4) -> str:
    parts = []
    prev = "v0"
    for t in range(1, iters + 1):
        parts.append(f"""
        u{t} AS MATERIALIZED (
            SELECT c.i, sum(c.c * p.v) AS u
            FROM cov c JOIN {prev} p ON p.dim = c.j
            GROUP BY c.i),
        m{t} AS (SELECT max(abs(u)) AS m FROM u{t}),
        v{t} AS MATERIALIZED (
            SELECT CAST(i AS INT) AS dim, round(u / m, 6) AS v
            FROM u{t} CROSS JOIN m{t})""")
        prev = f"v{t}"
    return f"""
    WITH cells AS MATERIALIZED (
        SELECT vec_id,
               CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS i,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * 10000)
                    AS BIGINT) AS xm
        FROM embeddings),
    n_t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
    sx AS (SELECT i, CAST(sum(xm) AS BIGINT) AS sx FROM cells GROUP BY i),
    sxy AS (
        SELECT a.i, b.i AS j, CAST(sum(a.xm * b.xm) AS BIGINT) AS sxy
        FROM cells a JOIN cells b ON a.vec_id = b.vec_id
        GROUP BY 1, 2),
    cov AS MATERIALIZED (
        SELECT s.i, s.j,
               round((n * sxy - x.sx * y.sx) / (n * (n - 1.0)) / 1e8, 9)
                   AS c
        FROM sxy s JOIN sx x ON x.i = s.i JOIN sx y ON y.i = s.j
        CROSS JOIN n_t),
    v0 AS (SELECT DISTINCT CAST(i AS INT) AS dim, 1.0 AS v FROM cov),
    {",".join(parts)},
    uf AS MATERIALIZED (
        SELECT c.i, sum(c.c * p.v) AS u
        FROM cov c JOIN {prev} p ON p.dim = c.j
        GROUP BY c.i),
    ray AS (
        SELECT round(sum(p.v * uf.u) / sum(p.v * p.v), 4) AS eigenvalue
        FROM uf JOIN {prev} p ON p.dim = uf.i)
    SELECT dim, v AS loading, eigenvalue
    FROM {prev} CROSS JOIN ray
    ORDER BY dim
    """


def _absorption_oracle(target: str = "purchase", steps: int = 6) -> str:
    parts = []
    prev = "p0"
    for k in range(1, steps + 1):
        parts.append(f"""
        n{k} AS (
            SELECT pr.from_type, round(sum(pr.p * pk.ph), 6) AS ph_new
            FROM probs pr JOIN {prev} pk ON pk.state = pr.to_type
            GROUP BY 1),
        p{k} AS MATERIALIZED (
            SELECT s.state,
                   CASE WHEN s.state = '{target}' THEN 1.0
                        ELSE coalesce(n{k}.ph_new, 0.0) END AS ph
            FROM states s LEFT JOIN n{k} ON n{k}.from_type = s.state)""")
        prev = f"p{k}"
    return f"""
    WITH stp AS MATERIALIZED (
        SELECT from_type, to_type FROM (
            SELECT event_type AS from_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS to_type
            FROM events)
        WHERE to_type IS NOT NULL),
    counts AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
               FROM stp GROUP BY 1, 2),
    outs AS MATERIALIZED (
        SELECT from_type, CAST(sum(n) AS BIGINT) AS n_out
        FROM counts GROUP BY 1),
    probs AS MATERIALIZED (
        SELECT c.from_type, c.to_type, c.n * 1.0 / o.n_out AS p
        FROM counts c JOIN outs o USING (from_type)),
    states AS (SELECT from_type AS state, n_out FROM outs),
    p0 AS (SELECT state,
                  CASE WHEN state = '{target}' THEN 1.0 ELSE 0.0 END AS ph
           FROM states),
    {",".join(parts)}
    SELECT s.state, s.n_out,
           p1.ph AS p_hit_1, p3.ph AS p_hit_3, p{steps}.ph AS p_hit_{steps}
    FROM states s
    JOIN p1 ON p1.state = s.state
    JOIN p3 ON p3.state = s.state
    JOIN p{steps} ON p{steps}.state = s.state
    ORDER BY s.state
    """


def _vocab_cover_oracle(steps: int = 5) -> str:
    parts = []
    prev_cov = "cov0"
    for t in range(1, steps + 1):
        parts.append(f"""
        g{t} AS (
            SELECT st.source, CAST(count(*) AS BIGINT) AS new_terms
            FROM st LEFT JOIN {prev_cov} c ON c.term = st.term
            WHERE c.term IS NULL
            GROUP BY st.source),
        p{t} AS MATERIALIZED (
            SELECT source, new_terms FROM g{t}
            ORDER BY new_terms DESC, source LIMIT 1),
        cov{t} AS MATERIALIZED (
            SELECT term FROM {prev_cov}
            UNION
            SELECT st.term FROM st JOIN p{t} USING (source)),
        s{t} AS (
            SELECT {t} AS step, p{t}.source, p{t}.new_terms,
                   (SELECT CAST(count(*) AS BIGINT) FROM cov{t})
                       AS covered_terms
            FROM p{t})""")
        prev_cov = f"cov{t}"
    selects = " UNION ALL ".join(
        f"SELECT * FROM s{t}" for t in range(1, steps + 1)
    )
    return f"""
    WITH d AS (
        SELECT source,
               list_filter(string_split(text, ' '), t -> length(t) > 0)
                   AS toks
        FROM documents),
    st AS MATERIALIZED (
        SELECT DISTINCT source, term FROM (
            SELECT source,
                   unnest(list_concat(toks,
                       CASE WHEN len(toks) >= 2
                            THEN list_transform(range(1, len(toks)),
                                                i -> toks[i] || '_'
                                                     || toks[i + 1])
                            ELSE [] END)) AS term
            FROM d)),
    vt AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v_total
           FROM st),
    cov0 AS (SELECT term FROM st WHERE 1 = 0),
    {",".join(parts)}
    SELECT CAST(step AS INT) AS step, source, new_terms, covered_terms,
           round(covered_terms * 1.0 / v_total, 4) AS coverage_frac
    FROM ({selects}) CROSS JOIN vt
    ORDER BY step
    """


def _removal_oracle(target: str = "purchase", steps: int = 6) -> str:
    chans = ["click", "view", "signup", "error"]
    parts = []
    for tag, excl in [("v0", None)] + [
        (f"v{i + 1}", c) for i, c in enumerate(chans)
    ]:
        if excl is None:
            parts.append(f"""
        pr_{tag} AS (SELECT * FROM probs),
        st_{tag} AS (SELECT * FROM states)""")
        else:
            parts.append(f"""
        pr_{tag} AS (SELECT * FROM probs
                     WHERE from_type <> '{excl}'
                       AND to_type <> '{excl}'),
        st_{tag} AS (SELECT * FROM states WHERE state <> '{excl}')""")
        prev = f"p0_{tag}"
        parts.append(f"""
        p0_{tag} AS (SELECT state,
                            CASE WHEN state = '{target}' THEN 1.0
                                 ELSE 0.0 END AS ph
                     FROM st_{tag})""")
        for k in range(1, steps + 1):
            parts.append(f"""
        n{k}_{tag} AS (
            SELECT pr.from_type, round(sum(pr.p * pk.ph), 6) AS ph_new
            FROM pr_{tag} pr JOIN {prev} pk ON pk.state = pr.to_type
            GROUP BY 1),
        p{k}_{tag} AS MATERIALIZED (
            SELECT s.state,
                   CASE WHEN s.state = '{target}' THEN 1.0
                        ELSE coalesce(n.ph_new, 0.0) END AS ph
            FROM st_{tag} s
            LEFT JOIN n{k}_{tag} n ON n.from_type = s.state)""")
            prev = f"p{k}_{tag}"
        parts.append(f"""
        b_{tag} AS MATERIALIZED (
            SELECT round(sum(CAST(round(pi.n_first * p.ph * 1e6)
                                  AS BIGINT)) / 1e6
                         / (SELECT nu FROM n_users), 6) AS b
            FROM pi JOIN {prev} p USING (state))""")
    rows = " UNION ALL ".join(
        f"""SELECT '{c}' AS channel,
                   (SELECT b FROM b_v0) AS base_conv_prob,
                   (SELECT b FROM b_v{i + 1}) AS conv_prob_without"""
        for i, c in enumerate(chans)
    )
    return f"""
    WITH stp AS MATERIALIZED (
        SELECT from_type, to_type FROM (
            SELECT event_type AS from_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS to_type
            FROM events)
        WHERE to_type IS NOT NULL),
    counts AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
               FROM stp GROUP BY 1, 2),
    outs AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_out
             FROM counts GROUP BY 1),
    probs AS MATERIALIZED (
        SELECT c.from_type, c.to_type, c.n * 1.0 / o.n_out AS p
        FROM counts c JOIN outs o USING (from_type)),
    states AS MATERIALIZED (SELECT from_type AS state FROM outs),
    firsts AS (
        SELECT event_type AS state, CAST(count(*) AS BIGINT) AS n_first
        FROM (SELECT user_id, event_type,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn
              FROM events)
        WHERE rn = 1 GROUP BY 1),
    pi AS MATERIALIZED (SELECT * FROM firsts),
    n_users AS (SELECT CAST(sum(n_first) AS BIGINT) AS nu FROM firsts),
    {",".join(parts)},
    re AS (
        SELECT channel, base_conv_prob, conv_prob_without,
               round(1.0 - conv_prob_without / base_conv_prob, 6)
                   AS removal_effect
        FROM ({rows})),
    tot AS (SELECT CAST(sum(CAST(round(removal_effect * 1e6) AS BIGINT))
                        AS BIGINT) AS sre FROM re)
    SELECT channel, base_conv_prob, conv_prob_without, removal_effect,
           round(CAST(round(removal_effect * 1e6) AS BIGINT) * 1.0 / sre,
                 4) AS attribution_share
    FROM re CROSS JOIN tot
    ORDER BY removal_effect DESC, channel
    """


def _stream_update_ann_index_oracle(
    n_tables: int = 4, n_planes: int = 6
) -> str:
    """SQL twin of replay.stream_update_ann_index: the stream-maintained
    index (nightly base ⊕ every arrival micro-batch) must equal a
    from-scratch RP-LSH hash of the FULL corpus — same deterministic
    Rademacher bucket expressions as _ann_recall_oracle, rolled up to
    the per-table profile with an integer membership checksum."""

    def bucket(t: int) -> str:
        terms = []
        for p in range(n_planes):
            w = (
                f"(CASE WHEN ((i * 31 + {p * 17} + {t * 101}) * 2654435761)"
                f" % 4294967296 < 2147483648 THEN 1.0 ELSE -1.0 END)"
            )
            proj = (
                f"list_sum(list_transform(range(0, len(emb)),"
                f" i -> emb[i + 1] * {w}))"
            )
            terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
        return " + ".join(terms)

    buck = "\n            UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, {bucket(t)} AS bucket FROM b"
        for t in range(n_tables)
    )
    return f"""
        WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings),
        buck AS ({buck})
        SELECT CAST(t AS BIGINT) AS t,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT vec_id) AS BIGINT) AS n_vecs,
               CAST(count(DISTINCT bucket) AS BIGINT) AS n_buckets,
               CAST(sum(bucket * 100003 + vec_id) AS BIGINT) AS checksum
        FROM buck GROUP BY t ORDER BY t
    """


def _minhash_calibration_oracle(n_hashes: int = 16) -> str:
    """SQL twin of dedup.minhash_calibration_profile: band-collision
    candidates at threshold 0, exact shingle Jaccard, rolled up to the
    per-agreement-level calibration table."""
    from project_bigdata_recsys_spark.functions.dedup import (
        MINHASH_PRIME,
        minhash_params,
    )

    mins = ",\n               ".join(
        f"list_min(list_transform(bases, x -> (x * {a} + {b}) % {MINHASH_PRIME}))"
        f" AS m{i}"
        for i, (a, b) in enumerate(minhash_params(n_hashes))
    )
    bands = "\n            UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_no, m{2 * b} AS k1, m{2 * b + 1} AS k2 FROM sig"
        for b in range(n_hashes // 2)
    )
    matches = " + ".join(f"(sa.m{i} = sb.m{i})::INT" for i in range(n_hashes))
    jac = (
        "len(list_intersect(ga.gs, gb.gs)) * 1.0"
        " / (len(ga.gs) + len(gb.gs) - len(list_intersect(ga.gs, gb.gs)))"
    )
    return f"""
        WITH {_DD_SHINGLES},
        basesq AS (SELECT doc_id,
               list_transform(gs, s -> {_dd_hash32('s', '')} % {MINHASH_PRIME})
                   AS bases
           FROM sh2),
        sig AS (SELECT doc_id,
               {mins}
           FROM basesq),
        bands AS ({bands}),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM bands a JOIN bands b
                   ON a.band_no = b.band_no AND a.k1 = b.k1 AND a.k2 = b.k2
                      AND a.doc_id < b.doc_id),
        est AS (SELECT doc_a, doc_b,
                       round(({matches}) / {float(n_hashes)}, 6) AS est_jaccard
                FROM cand
                JOIN sig sa ON sa.doc_id = doc_a
                JOIN sig sb ON sb.doc_id = doc_b),
        scored AS (
            SELECT est_jaccard, round({jac}, 6) AS jaccard
            FROM est e
            JOIN sh2 ga ON ga.doc_id = e.doc_a
            JOIN sh2 gb ON gb.doc_id = e.doc_b)
        SELECT est_jaccard,
               CAST(count(*) AS BIGINT) AS n_pairs,
               round(sum(CAST(round(jaccard * 1e6) AS BIGINT))
                     / 1e6 / count(*), 6) AS mean_exact,
               round(sum(CAST(round(abs(est_jaccard - jaccard) * 1e6) AS BIGINT))
                     / 1e6 / count(*), 6) AS mean_abs_err,
               CAST(sum(CASE WHEN jaccard < 0.5 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_below_half,
               round(sum(CASE WHEN jaccard < 0.5 THEN 1 ELSE 0 END) * 1.0
                     / count(*), 6) AS fp_rate_at_half
        FROM scored GROUP BY est_jaccard ORDER BY est_jaccard
    """


def _ann_index_diff_oracle(
    split_frac: float = 0.9,
    retire_frac: float = 0.05,
    n_tables: int = 4,
    n_planes: int = 6,
) -> str:
    """SQL twin of similarity.ann_index_diff: recompute BOTH snapshot
    memberships with the deterministic Rademacher bucket expressions
    (same as _stream_update_ann_index_oracle), diff them with EXCEPT,
    and roll up per-table churn counts + checksums."""

    def bucket(t: int) -> str:
        terms = []
        for p in range(n_planes):
            w = (
                f"(CASE WHEN ((i * 31 + {p * 17} + {t * 101}) * 2654435761)"
                f" % 4294967296 < 2147483648 THEN 1.0 ELSE -1.0 END)"
            )
            proj = (
                f"list_sum(list_transform(range(0, len(emb)),"
                f" i -> emb[i + 1] * {w}))"
            )
            terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
        return " + ".join(terms)

    buck = "\n            UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, {bucket(t)} AS bucket FROM b"
        for t in range(n_tables)
    )
    return f"""
        WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings),
        mx AS (SELECT CAST(floor(max(vec_id) * CAST({split_frac} AS DOUBLE))
                           AS BIGINT) AS split_at FROM b),
        buck AS ({buck}),
        t0 AS (SELECT vec_id, t, bucket FROM buck
               WHERE vec_id < (SELECT split_at FROM mx)),
        retired AS (SELECT vec_id FROM b
                    WHERE ('0x' || substr(md5('retire:'
                              || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT
                          / 4294967296.0 < CAST({retire_frac} AS DOUBLE)),
        t1 AS (SELECT vec_id, t, bucket FROM buck
               WHERE (vec_id < (SELECT split_at FROM mx)
                      AND vec_id NOT IN (SELECT vec_id FROM retired))
                  OR vec_id >= (SELECT split_at FROM mx)),
        added AS (SELECT * FROM t1 EXCEPT SELECT * FROM t0),
        removed AS (SELECT * FROM t0 EXCEPT SELECT * FROM t1),
        a AS (SELECT t, count(*) AS n_added,
                     sum(bucket * 100003 + vec_id) AS ac
              FROM added GROUP BY t),
        r AS (SELECT t, count(*) AS n_removed,
                     sum(bucket * 100003 + vec_id) AS rc
              FROM removed GROUP BY t),
        tot AS (SELECT t, count(*) AS n_t0 FROM t0 GROUP BY t)
        SELECT CAST(tot.t AS BIGINT) AS t,
               CAST(tot.n_t0 - coalesce(r.n_removed, 0) AS BIGINT)
                   AS n_stable,
               CAST(coalesce(a.n_added, 0) AS BIGINT) AS n_added,
               CAST(coalesce(r.n_removed, 0) AS BIGINT) AS n_removed,
               CAST(coalesce(a.ac, 0) AS BIGINT) AS added_checksum,
               CAST(coalesce(r.rc, 0) AS BIGINT) AS removed_checksum
        FROM tot LEFT JOIN a ON a.t = tot.t LEFT JOIN r ON r.t = tot.t
        ORDER BY t
    """


def _tokenizer_fertility_oracle() -> str:
    """SQL twin of text.tokenizer_fertility_audit: the same multibyte
    markers (imported, so both engines plant IDENTICAL strings), the
    proven whitespace + BPE-ish token kernels, and 6-dp ratios of
    exact integer sums.  strlen = UTF-8 bytes, length = code points."""
    from project_bigdata_recsys_spark.functions.text import (
        FERTILITY_MARKERS,
    )

    whens = "\n                   ".join(
        f"WHEN '{lg}' THEN text || '{sfx}'"
        for lg, sfx in sorted(FERTILITY_MARKERS.items())
    )
    return rf"""
        WITH planted AS (
            SELECT lang, source,
                   CASE lang
                   {whens}
                   ELSE text END AS t
            FROM documents),
        per_doc AS (
            SELECT lang, source,
                   len(string_split(t, ' ')) AS ws_tokens,
                   list_sum(list_transform(
                       regexp_extract_all(t,
                           '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'),
                       w -> CAST(ceil(length(w)/4.0) AS BIGINT)))
                       AS bpe_tokens,
                   length(t) AS n_chars,
                   strlen(t) AS n_bytes
            FROM planted)
        SELECT lang, source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(bpe_tokens) AS BIGINT) AS total_bpe_tokens,
               round(sum(n_bytes) * 1.0 / sum(bpe_tokens), 6)
                   AS bytes_per_token,
               round(sum(bpe_tokens) * 1.0 / sum(ws_tokens), 6)
                   AS tokens_per_word,
               round(sum(n_chars) * 1.0 / sum(bpe_tokens), 6)
                   AS chars_per_token,
               round((sum(n_bytes) - sum(n_chars)) * 1.0 / sum(n_bytes), 6)
                   AS multibyte_ratio
        FROM per_doc GROUP BY lang, source ORDER BY lang, source
    """


def _kcenter_oracle(k: int = 5) -> str:
    """SQL twin of functions.similarity.kcenter_coreset — the k−1 greedy
    farthest-point rounds unrolled as (p_i, r_i, cents_i) CTE triples
    (the _lloyd_prefix_sql pattern), each ranking on the 6-dp-rounded
    cosine with a vec_id tie-break, then the final nearest-center
    assignment with ties toward the earlier-selected center."""

    def cos(a: str, b: str) -> str:
        return (
            f"round(list_dot_product({a}, {b})"
            f" / (sqrt(list_dot_product({a}, {a}))"
            f" * sqrt(list_dot_product({b}, {b}))), 6)"
        )

    rounds = []
    prev = "cents0"
    for t in range(1, k):
        rounds.append(
            f"""p{t} AS (
            SELECT e.vec_id, max({cos('e.emb', 'c.cemb')}) AS mc
            FROM e JOIN {prev} c ON true
            WHERE e.vec_id NOT IN (SELECT center_id FROM {prev})
            GROUP BY e.vec_id),
        r{t} AS (
            SELECT {t} AS sel_order, e.vec_id AS center_id, e.emb AS cemb
            FROM p{t} JOIN e USING (vec_id)
            ORDER BY p{t}.mc ASC, e.vec_id ASC LIMIT 1),
        cents{t} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM r{t})"""
        )
        prev = f"cents{t}"
    rounds_sql = ",\n        ".join(rounds)
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings),
        cents0 AS (
            SELECT 0 AS sel_order, vec_id AS center_id, emb AS cemb
            FROM e ORDER BY vec_id LIMIT 1),
        {rounds_sql},
        asg AS (
            SELECT e.vec_id, c.sel_order, c.center_id,
                   {cos('e.emb', 'c.cemb')} AS cos_r,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY {cos('e.emb', 'c.cemb')} DESC,
                                c.sel_order ASC) AS rn
            FROM e CROSS JOIN {prev} c)
        SELECT CAST(sel_order AS INT) AS sel_order,
               CAST(center_id AS BIGINT) AS center_id,
               CAST(count(*) AS BIGINT) AS n_members,
               min(cos_r) AS min_cos
        FROM asg WHERE rn = 1
        GROUP BY sel_order, center_id ORDER BY sel_order
    """


def _bpe_ctes(n_merges: int = 8, full_chain: bool = False) -> list:
    """The shared CTE chain of the BPE family oracles: global word
    vocabulary, wrapped-symbol v0, then per merge i the (pairs, counts,
    best, re-segment) quartet.  ``full_chain`` also emits the final
    re-segmented vocabulary v{n} (the fertility readout needs it; the
    merge-table readout does not)."""
    ctes = [
        """words AS (
        SELECT w, CAST(count(*) AS BIGINT) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE regexp_matches(w, '^[a-z]{2,}$')
        GROUP BY w)""",
        r"""v0 AS (
        SELECT trim(regexp_replace(w, '(.)', '>\1< ', 'g')) AS repr, freq
        FROM words)""",
    ]
    for i in range(1, n_merges + 1):
        ctes.append(f"""p{i} AS (
        SELECT toks[i] AS pa, toks[i + 1] AS pb, freq
        FROM (SELECT string_split(repr, ' ') AS toks, freq FROM v{i - 1}),
             unnest(range(1, len(toks))) t(i))""")
        ctes.append(f"""c{i} AS (
        SELECT substr(pa, 2, length(pa) - 2) AS sym_a,
               substr(pb, 2, length(pb) - 2) AS sym_b,
               CAST(sum(freq) AS BIGINT) AS n_pairs
        FROM p{i} GROUP BY 1, 2)""")
        ctes.append(f"""b{i} AS (
        SELECT sym_a, sym_b, n_pairs FROM c{i}
        ORDER BY n_pairs DESC, sym_a, sym_b LIMIT 1)""")
        if i < n_merges or full_chain:
            ctes.append(f"""v{i} AS (
        SELECT replace(repr, '>' || sym_a || '< >' || sym_b || '<',
                       '>' || sym_a || sym_b || '<') AS repr, freq
        FROM v{i - 1} CROSS JOIN b{i})""")
    return ctes


def _bpe_train_oracle(n_merges: int = 8) -> str:
    """Unrolled DuckDB twin of functions.text.bpe_train_merges: merge
    application is the same plain left-to-right string replace the
    Spark side uses, so greedy BPE semantics match byte for byte."""
    ctes = _bpe_ctes(n_merges)
    readout = "\n    UNION ALL ".join(
        f"SELECT CAST({i} AS INT) AS merge_rank, sym_a, sym_b, n_pairs"
        f" FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    return (
        "\n    WITH "
        + ",\n    ".join(ctes)
        + "\n    "
        + readout
        + "\n    ORDER BY merge_rank\n"
    )


def _containment_oracle(
    n: int = 3, df_cap: int = 4, threshold: float = 0.8
) -> str:
    """DuckDB twin of functions.dedup.containment_pairs: planted
    half-doc corpus, df-capped rare-shingle candidates, exact
    containment/Jaccard on candidates only."""
    return f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id,
               array_to_string(list_slice(string_split(text, ' '), 1,
                   greatest(len(string_split(text, ' ')) // 2, 3)), ' ')
                   AS text
        FROM documents WHERE doc_id % 9 = 0),
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
    shl AS (SELECT doc_id,
             list_filter(list_distinct(
               CASE WHEN len(t) >= {n}
                    THEN list_transform(range(1, len(t) - {n - 2}),
                             i -> array_to_string(
                                      list_slice(t, i, i + {n - 1}), ' '))
                    ELSE [] END), s -> length(s) > 0) AS sh
           FROM toks),
    sh2 AS (SELECT doc_id, sh FROM shl WHERE len(sh) > 0),
    ex AS (SELECT doc_id, unnest(sh) AS g FROM sh2),
    rare AS (SELECT g FROM ex GROUP BY g HAVING count(*) <= {df_cap}),
    rx AS (SELECT ex.doc_id, ex.g FROM ex JOIN rare USING (g)),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM rx a JOIN rx b
               ON a.g = b.g AND a.doc_id < b.doc_id),
    scored AS (
        SELECT c.doc_a, c.doc_b,
               round(len(list_intersect(ga.sh, gb.sh)) * 1.0
                     / least(len(ga.sh), len(gb.sh)), 6) AS containment,
               round(len(list_intersect(ga.sh, gb.sh)) * 1.0
                     / (len(ga.sh) + len(gb.sh)
                        - len(list_intersect(ga.sh, gb.sh))), 6) AS jaccard
        FROM cand c
        JOIN sh2 ga ON ga.doc_id = c.doc_a
        JOIN sh2 gb ON gb.doc_id = c.doc_b)
    SELECT doc_a, doc_b, containment, jaccard
    FROM scored WHERE containment >= {threshold}
    ORDER BY doc_a, doc_b
"""


def _bpe_fertility_oracle(n_merges: int = 8) -> str:
    """DuckDB twin of functions.text.bpe_fertility_after_merges: the
    shared merge-training chain (global vocabulary) plus a per-source
    vocabulary that replays the SAME n learned replaces, then the
    fertility rollup."""
    ctes = _bpe_ctes(n_merges, full_chain=False)
    # drop the final unused v{n-1}? keep: b_i need v_{i-1}; we need b_1..b_n
    ctes.append(r"""sw AS (
        SELECT source, w, CAST(count(*) AS BIGINT) AS freq
        FROM (SELECT source, unnest(string_split(text, ' ')) AS w
              FROM documents)
        WHERE regexp_matches(w, '^[a-z]{2,}$')
        GROUP BY source, w)""")
    ctes.append(r"""sv0 AS (
        SELECT source, trim(regexp_replace(w, '(.)', '>\1< ', 'g')) AS repr,
               freq, length(w) AS n_chars
        FROM sw)""")
    for i in range(1, n_merges + 1):
        ctes.append(f"""sv{i} AS (
        SELECT source,
               replace(repr, '>' || sym_a || '< >' || sym_b || '<',
                       '>' || sym_a || sym_b || '<') AS repr,
               freq, n_chars
        FROM sv{i - 1} CROSS JOIN b{i})""")
    return (
        "\n    WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT source,
           CAST(sum(freq) AS BIGINT) AS n_words,
           CAST(sum(freq * len(string_split(repr, ' '))) AS BIGINT)
               AS n_symbols,
           CAST(sum(freq * n_chars) AS BIGINT) AS n_chars,
           CAST(sum(freq * len(string_split(repr, ' ')))::HUGEINT * 1000000
                // sum(freq)::HUGEINT AS BIGINT) AS symbols_per_word_micro
    FROM sv{n_merges}
    GROUP BY source ORDER BY source
"""
    )


def _mmr_oracle(
    query_vec_id: int = 0, depth: int = 50, k: int = 10
) -> str:
    """Unrolled DuckDB twin of functions.similarity.mmr_diversified_
    rerank: shortlist CTE, then k−1 greedy (max-sim, select, accumulate)
    CTE triples — the kcenter unroll pattern with a correlated max
    instead of GROUP BY on a list column."""

    def cos(a: str, b: str) -> str:
        return (
            f"round(list_dot_product({a}, {b})"
            f" / (sqrt(list_dot_product({a}, {a}))"
            f" * sqrt(list_dot_product({b}, {b}))) * 1000000.0)"
        )

    ctes = [
        f"""q AS (SELECT CAST(embedding AS DOUBLE[]) AS q_emb
           FROM embeddings WHERE vec_id = {query_vec_id})""",
        f"""cands AS MATERIALIZED (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
               CAST({cos('CAST(embedding AS DOUBLE[])', 'q.q_emb')}
                    AS BIGINT) AS rel_micro
        FROM embeddings CROSS JOIN q
        WHERE vec_id <> {query_vec_id}
        ORDER BY rel_micro DESC, vec_id LIMIT {depth})""",
        """s1 AS (SELECT vec_id, emb, rel_micro,
                      CAST(0 AS BIGINT) AS max_sim_micro
              FROM cands ORDER BY rel_micro DESC, vec_id LIMIT 1)""",
        "sel1 AS MATERIALIZED (SELECT vec_id, emb FROM s1)",
    ]
    for i in range(2, k + 1):
        ctes.append(f"""m{i} AS (
        SELECT c.vec_id, c.emb, c.rel_micro,
               (SELECT CAST(max({cos('c.emb', 's.emb')}) AS BIGINT)
                FROM sel{i - 1} s) AS ms
        FROM cands c
        WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1}))""")
        ctes.append(f"""s{i} AS MATERIALIZED (
        SELECT vec_id, emb, rel_micro, ms AS max_sim_micro
        FROM m{i} ORDER BY rel_micro - ms DESC, vec_id LIMIT 1)""")
        ctes.append(f"""sel{i} AS MATERIALIZED (
        SELECT vec_id, emb FROM sel{i - 1}
        UNION ALL SELECT vec_id, emb FROM s{i})""")
    readout = "\n    UNION ALL ".join(
        f"SELECT CAST({i} AS INT) AS rank, vec_id, rel_micro,"
        f" max_sim_micro, rel_micro - max_sim_micro AS mmr_micro"
        f" FROM s{i}"
        for i in range(1, k + 1)
    )
    return (
        "\n    WITH "
        + ",\n    ".join(ctes)
        + "\n    "
        + readout
        + "\n    ORDER BY rank\n"
    )


def _ivf_pq_core_sql(
    n_cells: int,
    m_sub: int,
    k_codes: int,
    sub_dim: int,
    dim: int,
    seed_where: str = "",
) -> str:
    """Shared CTE chain of the IVF-PQ oracles: coarse md5-sampled
    centroids, rounded-cosine home-cell assignment, element-wise
    residuals, the residual-trained codebook, and the per-vector code
    frame — the SQL twin of similarity._ivf_coarse_ranked +
    _pq_residual_frames.  ``seed_where`` (e.g. "WHERE vec_id % 3 = 0")
    restricts BOTH seed samples to a training subset while assignment
    and encoding still run over all vectors — the frozen-quantizer
    incremental pipeline of ivf_pq_incremental_knn."""
    lo, w = f"mm*{sub_dim}+1", f"mm*{sub_dim}+{sub_dim}"
    return f"""
        emb AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings),
        cents AS (
            SELECT vec_id AS seed_id, e AS c_emb,
                   row_number() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS cell
            FROM emb {seed_where}
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {n_cells}),
        assign AS (
            SELECT m.vec_id, m.label, m.e, c.cell, c.c_emb,
                   round(list_dot_product(m.e, c.c_emb)
                         / (sqrt(list_dot_product(m.e, m.e))
                            * sqrt(list_dot_product(c.c_emb, c.c_emb))), 6)
                       AS cs
            FROM emb m CROSS JOIN cents c),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY cs DESC, cell) AS rn
            FROM assign),
        homes AS (
            SELECT vec_id, cell,
                   list_transform(range(1, {dim + 1}),
                                  i -> e[i] - c_emb[i]) AS r
            FROM ranked WHERE rn = 1),
        rseeds AS (
            SELECT vec_id AS seed_id, r AS s_emb FROM homes {seed_where}
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k_codes}),
        rcoded AS (
            SELECT s_emb,
                   CAST(row_number() OVER (
                       ORDER BY md5(CAST(seed_id AS VARCHAR)), seed_id)
                       AS INTEGER) AS code
            FROM rseeds),
        rbook AS (
            SELECT code, CAST(mm AS INTEGER) AS m, s_emb[{lo} : {w}] AS c_sub
            FROM (SELECT code, s_emb, unnest(range(0, {m_sub})) AS mm
                  FROM rcoded)),
        rsubs AS (
            SELECT vec_id, cell, CAST(mm AS INTEGER) AS m,
                   r[{lo} : {w}] AS v_sub
            FROM (SELECT vec_id, cell, r, unnest(range(0, {m_sub})) AS mm
                  FROM homes)),
        rdists AS (
            SELECT vec_id, cell, m, code,
                   round(list_dot_product(v_sub, v_sub)
                         - 2 * list_dot_product(v_sub, c_sub)
                         + list_dot_product(c_sub, c_sub), 9) AS d2
            FROM rsubs JOIN rbook USING (m)),
        rcodes AS (
            SELECT vec_id, cell, m, code FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id, m ORDER BY d2, code) AS rn
                FROM rdists)
            WHERE rn = 1)"""


def _ivf_pq_oracle(
    query_vec_id: int = 0,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    m_sub: int = 8,
    k_codes: int = 16,
    sub_dim: int = 8,
    dim: int = 64,
    rerank_factor: int = 4,
    seed_where: str = "",
) -> str:
    """SQL twin of similarity.ivf_pq_knn: coarse cells, residual
    codebook, per-probed-cell ADC, exact cosine rerank.  With
    ``seed_where`` it is instead the twin of ivf_pq_incremental_knn
    (quantizers trained on the subset, everything encoded/probed)."""
    lo, w = f"mm*{sub_dim}+1", f"mm*{sub_dim}+{sub_dim}"
    return f"""
        WITH {_ivf_pq_core_sql(n_cells, m_sub, k_codes, sub_dim, dim,
                               seed_where)},
        qcells AS (
            SELECT cell,
                   list_transform(range(1, {dim + 1}),
                                  i -> e[i] - c_emb[i]) AS qr
            FROM ranked WHERE vec_id = {query_vec_id} AND rn <= {n_probe}),
        qsub AS (
            SELECT cell, CAST(mm AS INTEGER) AS m, qr[{lo} : {w}] AS q_sub
            FROM (SELECT cell, qr, unnest(range(0, {m_sub})) AS mm
                  FROM qcells)),
        adc AS (
            SELECT cell, m, code,
                   list_dot_product(q_sub, q_sub)
                   - 2 * list_dot_product(q_sub, c_sub)
                   + list_dot_product(c_sub, c_sub) AS d2
            FROM qsub JOIN rbook USING (m)),
        short AS (
            SELECT c.vec_id, round(sum(a.d2), 6) AS approx_d2
            FROM rcodes c JOIN adc a USING (cell, m, code)
            WHERE c.vec_id <> {query_vec_id}
            GROUP BY c.vec_id
            ORDER BY approx_d2, c.vec_id
            LIMIT {rerank_factor * k}),
        q AS (SELECT e AS q_emb FROM emb WHERE vec_id = {query_vec_id})
        SELECT e.vec_id, e.label,
               round(list_dot_product(e.e, q.q_emb)
                     / (sqrt(list_dot_product(e.e, e.e))
                        * sqrt(list_dot_product(q.q_emb, q.q_emb))), 6)
                   AS cos_sim
        FROM emb e JOIN short s ON s.vec_id = e.vec_id CROSS JOIN q
        ORDER BY cos_sim DESC, e.vec_id
        LIMIT {k}
    """


def _ivf_pq_recall_oracle(
    n_queries: int = 5,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    m_sub: int = 8,
    k_codes: int = 16,
    sub_dim: int = 8,
    dim: int = 64,
    rerank_factor: int = 4,
) -> str:
    """SQL twin of similarity.ivf_pq_recall_profile: exact top-k truth,
    flat-PQ shortlist (raw-vector global codebook), IVF-PQ shortlist
    (residual codebook over probed cells), per-query recall and
    uplift."""
    lo, w = f"mm*{sub_dim}+1", f"mm*{sub_dim}+{sub_dim}"
    shortlist_n = rerank_factor * k
    return f"""
        WITH {_ivf_pq_core_sql(n_cells, m_sub, k_codes, sub_dim, dim)},
        queries AS (
            SELECT vec_id AS query_id, e AS q_emb FROM emb
            WHERE vec_id < {n_queries}),
        truth AS (
            SELECT query_id, vec_id FROM (
                SELECT q.query_id, e.vec_id,
                       row_number() OVER (PARTITION BY q.query_id ORDER BY
                           round(list_dot_product(e.e, q.q_emb)
                                 / (sqrt(list_dot_product(e.e, e.e))
                                    * sqrt(list_dot_product(q.q_emb, q.q_emb))),
                                 6) DESC, e.vec_id) AS rn
                FROM emb e CROSS JOIN queries q
                WHERE e.vec_id <> q.query_id)
            WHERE rn <= {k}),
        fseeds AS (
            SELECT vec_id AS seed_id, e AS s_emb FROM emb
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k_codes}),
        fcoded AS (
            SELECT s_emb,
                   CAST(row_number() OVER (
                       ORDER BY md5(CAST(seed_id AS VARCHAR)), seed_id)
                       AS INTEGER) AS code
            FROM fseeds),
        fbook AS (
            SELECT code, CAST(mm AS INTEGER) AS m, s_emb[{lo} : {w}] AS c_sub
            FROM (SELECT code, s_emb, unnest(range(0, {m_sub})) AS mm
                  FROM fcoded)),
        fsubs AS (
            SELECT vec_id, CAST(mm AS INTEGER) AS m, e[{lo} : {w}] AS v_sub
            FROM (SELECT vec_id, e, unnest(range(0, {m_sub})) AS mm FROM emb)),
        fdists AS (
            SELECT vec_id, m, code,
                   round(list_dot_product(v_sub, v_sub)
                         - 2 * list_dot_product(v_sub, c_sub)
                         + list_dot_product(c_sub, c_sub), 9) AS d2
            FROM fsubs JOIN fbook USING (m)),
        fcodes AS (
            SELECT vec_id, m, code FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id, m ORDER BY d2, code) AS rn
                FROM fdists)
            WHERE rn = 1),
        fqsub AS (
            SELECT query_id, CAST(mm AS INTEGER) AS m,
                   q_emb[{lo} : {w}] AS q_sub
            FROM (SELECT query_id, q_emb, unnest(range(0, {m_sub})) AS mm
                  FROM queries)),
        fadc AS (
            SELECT query_id, m, code,
                   list_dot_product(q_sub, q_sub)
                   - 2 * list_dot_product(q_sub, c_sub)
                   + list_dot_product(c_sub, c_sub) AS d2
            FROM fqsub JOIN fbook USING (m)),
        fshort AS (
            SELECT query_id, vec_id FROM (
                SELECT query_id, vec_id,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY approx_d2, vec_id) AS srn
                FROM (SELECT a.query_id, c.vec_id,
                             round(sum(a.d2), 6) AS approx_d2
                      FROM fcodes c JOIN fadc a USING (m, code)
                      WHERE c.vec_id <> a.query_id
                      GROUP BY a.query_id, c.vec_id))
            WHERE srn <= {shortlist_n}),
        iqcells AS (
            SELECT vec_id AS query_id, cell,
                   list_transform(range(1, {dim + 1}),
                                  i -> e[i] - c_emb[i]) AS qr
            FROM ranked WHERE vec_id < {n_queries} AND rn <= {n_probe}),
        iqsub AS (
            SELECT query_id, cell, CAST(mm AS INTEGER) AS m,
                   qr[{lo} : {w}] AS q_sub
            FROM (SELECT query_id, cell, qr, unnest(range(0, {m_sub})) AS mm
                  FROM iqcells)),
        iadc AS (
            SELECT query_id, cell, m, code,
                   list_dot_product(q_sub, q_sub)
                   - 2 * list_dot_product(q_sub, c_sub)
                   + list_dot_product(c_sub, c_sub) AS d2
            FROM iqsub JOIN rbook USING (m)),
        ishort AS (
            SELECT query_id, vec_id FROM (
                SELECT query_id, vec_id,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY approx_d2, vec_id) AS srn
                FROM (SELECT a.query_id, c.vec_id,
                             round(sum(a.d2), 6) AS approx_d2
                      FROM rcodes c JOIN iadc a USING (cell, m, code)
                      WHERE c.vec_id <> a.query_id
                      GROUP BY a.query_id, c.vec_id))
            WHERE srn <= {shortlist_n}),
        in_cells AS (
            SELECT c.query_id, h.vec_id
            FROM homes h
            JOIN (SELECT DISTINCT query_id, cell FROM iqcells) c
              USING (cell)),
        hits_flat AS (
            SELECT t.query_id, count(*) AS n_flat
            FROM truth t JOIN fshort s USING (query_id, vec_id)
            GROUP BY t.query_id),
        hits_ivf AS (
            SELECT t.query_id, count(*) AS n_ivf
            FROM truth t JOIN ishort s USING (query_id, vec_id)
            GROUP BY t.query_id),
        hits_ceiling AS (
            SELECT t.query_id, count(*) AS n_ceil
            FROM truth t JOIN in_cells s USING (query_id, vec_id)
            GROUP BY t.query_id)
        SELECT q.query_id,
               round(COALESCE(f.n_flat, 0) / {k}, 4) AS recall_pq,
               round(COALESCE(i.n_ivf, 0) / {k}, 4) AS recall_ivf_pq,
               round(COALESCE(c.n_ceil, 0) / {k}, 4) AS cell_ceiling,
               round((COALESCE(i.n_ivf, 0) - COALESCE(f.n_flat, 0)) / {k}, 4)
                   AS uplift
        FROM queries q
        LEFT JOIN hits_flat f USING (query_id)
        LEFT JOIN hits_ivf i USING (query_id)
        LEFT JOIN hits_ceiling c USING (query_id)
        ORDER BY q.query_id
    """


def _ivf_pq_nprobe_sweep_oracle(
    probes: tuple = (1, 2, 4, 8),
    n_queries: int = 5,
    k: int = 5,
    n_cells: int = 8,
    m_sub: int = 8,
    k_codes: int = 16,
    sub_dim: int = 8,
    dim: int = 64,
    rerank_factor: int = 4,
) -> str:
    """SQL twin of similarity.ivf_pq_nprobe_sweep: one encode, a
    probe-independent scored frame carrying each candidate's home-cell
    rank, then one filtered shortlist + recall readout per sweep
    point (unrolled UNION ALL blocks)."""
    lo, w = f"mm*{sub_dim}+1", f"mm*{sub_dim}+{sub_dim}"
    shortlist_n = rerank_factor * k
    max_p = max(probes)
    denom = f"{n_queries * k}.0"
    rows = "\n        UNION ALL ".join(
        f"""SELECT CAST({p} AS INTEGER) AS n_probe,
               round({p} / {n_cells}.0, 4) AS probed_frac,
               (SELECT CAST(count(*) AS BIGINT) FROM scored
                WHERE cell_rank <= {p}) AS n_candidates,
               round((SELECT count(*) FROM truth t
                      JOIN (SELECT query_id, vec_id FROM (
                                SELECT query_id, vec_id,
                                       row_number() OVER (
                                           PARTITION BY query_id
                                           ORDER BY approx_d2, vec_id) AS srn
                                FROM scored WHERE cell_rank <= {p})
                            WHERE srn <= {shortlist_n}) s
                        ON t.query_id = s.query_id
                       AND t.vec_id = s.vec_id) / {denom}, 4) AS recall,
               round((SELECT count(*) FROM truth t
                      JOIN scored c
                        ON t.query_id = c.query_id AND t.vec_id = c.vec_id
                       AND c.cell_rank <= {p}) / {denom}, 4)
                   AS cell_ceiling"""
        for p in probes
    )
    return f"""
        WITH {_ivf_pq_core_sql(n_cells, m_sub, k_codes, sub_dim, dim)},
        queries AS (
            SELECT vec_id AS query_id, e AS q_emb FROM emb
            WHERE vec_id < {n_queries}),
        truth AS (
            SELECT query_id, vec_id FROM (
                SELECT q.query_id, e.vec_id,
                       row_number() OVER (PARTITION BY q.query_id ORDER BY
                           round(list_dot_product(e.e, q.q_emb)
                                 / (sqrt(list_dot_product(e.e, e.e))
                                    * sqrt(list_dot_product(q.q_emb, q.q_emb))),
                                 6) DESC, e.vec_id) AS rn
                FROM emb e CROSS JOIN queries q
                WHERE e.vec_id <> q.query_id)
            WHERE rn <= {k}),
        qcells AS (
            SELECT vec_id AS query_id, cell, rn AS cell_rank,
                   list_transform(range(1, {dim + 1}),
                                  i -> e[i] - c_emb[i]) AS qr
            FROM ranked WHERE vec_id < {n_queries} AND rn <= {max_p}),
        qsub AS (
            SELECT query_id, cell, cell_rank, CAST(mm AS INTEGER) AS m,
                   qr[{lo} : {w}] AS q_sub
            FROM (SELECT query_id, cell, cell_rank, qr,
                         unnest(range(0, {m_sub})) AS mm
                  FROM qcells)),
        adc AS (
            SELECT query_id, cell, cell_rank, m, code,
                   list_dot_product(q_sub, q_sub)
                   - 2 * list_dot_product(q_sub, c_sub)
                   + list_dot_product(c_sub, c_sub) AS d2
            FROM qsub JOIN rbook USING (m)),
        scored AS (
            SELECT a.query_id, c.vec_id,
                   round(sum(a.d2), 6) AS approx_d2,
                   max(a.cell_rank) AS cell_rank
            FROM rcodes c JOIN adc a USING (cell, m, code)
            WHERE c.vec_id <> a.query_id
            GROUP BY a.query_id, c.vec_id)
        SELECT * FROM ({rows})
        ORDER BY n_probe
    """
