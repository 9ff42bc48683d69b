"""Round-7 regression tests: calendar-gap robustness and planning
predicates the sf-dense gate corpora cannot exercise."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_rolling_distinct_users_calendar_gap(spark, tmp_path):
    """A 5-day hole in the event calendar must NOT let the '7-day'
    window reach further back than 7 calendar days (the r6 advisory:
    a ROWS frame over the daily aggregate spans >7 days when days are
    missing; the RANGE-on-day-ordinal frame cannot)."""
    from project_bigdata_recsys_spark.operators.relational import (
        rolling_distinct_users,
    )

    # days 1-3 have users 1-3, then a 5-day gap, then day 9 has user 99.
    rows = []
    for d, uid in [(1, 1), (2, 2), (3, 3), (9, 99)]:
        rows.append(
            (
                d,
                dt.datetime(2024, 1, d, 12, 0, 0),
                uid,
                "click",
                1.0,
                "{}",
            )
        )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/events.parquet")

    out = {
        r.day: r
        for r in rolling_distinct_users(spark, sf_dir, window_days=7).collect()
    }
    assert set(out) == {"2024-01-01", "2024-01-02", "2024-01-03", "2024-01-09"}
    # day 9's 7-day window is [Jan 3, Jan 9]: user 3 and user 99 only.
    assert out["2024-01-09"].n_users_7d == 2
    assert out["2024-01-09"].n_events_7d == 2
    # day 3 sees days 1-3.
    assert out["2024-01-03"].n_users_7d == 3
    # the sketch side must agree with the exact side at this size
    assert all(r.approx_users_ok for r in out.values())


def test_backfill_plan_row_count_guards_xor_cancellation(spark):
    """An even multiset change XORs to an identical digest; the status
    predicate must still read 'changed' because n_rows differs (r6
    advisory: an orchestrator following status would skip a partition
    that must rebuild)."""
    from project_bigdata_recsys_spark.operators.snapshot import row_digest

    old = spark.createDataFrame(
        [("p1", 1, "a"), ("p1", 2, "b")], "part string, id long, v string"
    )
    # duplicate an existing row twice: XOR digest over sha-prefixes is
    # unchanged (x ^ x = 0) but the row count moved 2 -> 4.
    new = spark.createDataFrame(
        [("p1", 1, "a"), ("p1", 2, "b"), ("p1", 1, "a"), ("p1", 1, "a")],
        "part string, id long, v string",
    )

    def part_profile(df):
        digest = F.conv(
            F.substring(row_digest(df, ["id", "v"]), 1, 15), 16, 10
        ).cast("long")
        return df.select("part", digest.alias("d")).groupBy("part").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(d)").alias("digest"),
        )

    o = part_profile(old).select(
        "part",
        F.col("n_rows").alias("n_rows_old"),
        F.col("digest").alias("digest_old"),
    )
    n = part_profile(new).select(
        "part",
        F.col("n_rows").alias("n_rows_new"),
        F.col("digest").alias("digest_new"),
    )
    j = o.join(n, "part").collect()[0]
    # precondition: the digests really do cancel
    assert j.digest_old == j.digest_new
    status = (
        F.when(F.col("digest_old").isNull(), "added")
        .when(F.col("digest_new").isNull(), "removed")
        .when(
            (F.col("digest_old") != F.col("digest_new"))
            | (F.col("n_rows_old") != F.col("n_rows_new")),
            "changed",
        )
        .otherwise("unchanged")
    )
    got = o.join(n, "part").select(status.alias("s")).collect()[0].s
    assert got == "changed"


def test_sum_fixed_wide_mode_matches_long_mode(spark, monkeypatch):
    """SPARK_GRAFT_SUM_DTYPE=decimal must produce value-identical results
    to the BIGINT path on representative money aggregates — the wide
    accumulator exists for >sf1 overflow headroom, not to change
    answers."""
    import os

    from tests.conftest import SF_SMALL
    from project_bigdata_recsys_spark.operators.analytics import (
        pricing_summary,
    )
    from project_bigdata_recsys_spark.operators.relational import (
        user_activity,
    )

    def run(mode):
        monkeypatch.setenv("SPARK_GRAFT_SUM_DTYPE", mode)
        a = sorted(map(tuple, pricing_summary(spark, SF_SMALL).collect()))
        b = sorted(map(tuple, user_activity(spark, SF_SMALL).collect()))
        return a, b

    assert run("long") == run("decimal")


def test_sum_fixed_wide_mode_survives_bigint_overflow(spark, monkeypatch):
    """Past BIGINT headroom the long path silently wraps; the decimal
    path must return the true sum."""
    from pyspark.sql import functions as F

    from project_bigdata_recsys_spark.functions.fixedpoint import sum_fixed

    big = 4_000_000_000_000_000_000  # 4e18: two of them overflow int64
    df = spark.createDataFrame([(big,), (big,), (big,)], "v long")
    monkeypatch.setenv("SPARK_GRAFT_SUM_DTYPE", "decimal")
    got = df.agg(sum_fixed(F.col("v")).alias("s")).collect()[0].s
    assert got == float(3 * big)


def test_ann_rerank_shapes_and_monotonicity(spark):
    """Per-query exactly k rows, ranks 1..k, rerank ordering consistent,
    and every reranked candidate must come from the stage-1 shortlist
    (cos_sim no lower than the shortlist boundary would allow)."""
    from tests.conftest import SF_SMALL
    from project_bigdata_recsys_spark.functions.similarity import ann_rerank

    out = ann_rerank(spark, SF_SMALL, n_queries=3, shortlist=10, k=4).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2}
    for rows in by_q.values():
        assert [r.final_rank for r in rows] == [1, 2, 3, 4]
        scores = [r.rerank_score for r in rows]
        assert scores == sorted(scores, reverse=True)
        # rerank can reorder but not invent candidates: stage 2 only sees
        # the shortlist, whose scores bound every returned cos_sim
        assert all(r.vec_id != r.query_id for r in rows)


def test_stream_cdc_current_equals_batch_cdc(spark):
    """The streaming CDC apply must land on the identical current-view
    profile as the batch collapse — stream/batch equivalence for the
    merge-on-read contract."""
    from tests.conftest import SF_SMALL
    from project_bigdata_recsys_spark.operators.snapshot import (
        cdc_orders_profile,
    )
    from project_bigdata_recsys_spark.streaming.replay import (
        stream_cdc_current,
    )

    batch = sorted(map(tuple, cdc_orders_profile(spark, SF_SMALL).collect()))
    stream = sorted(map(tuple, stream_cdc_current(spark, SF_SMALL).collect()))
    assert batch == stream


def test_fuzzy_gram_blocking_bounds_same_length_corpora(spark):
    """The r6 advisory scenario: a corpus where EVERY name has the same
    length (length banding alone → n²/2 candidates).  With the q-gram
    prefix block intersected, names sharing no trigram produce ZERO
    candidates, and only genuinely similar names pair up."""
    from project_bigdata_recsys_spark.functions.dedup import (
        fuzzy_name_candidates,
    )
    from pyspark.sql import functions as F

    # 60 same-length names from per-name-unique vocabularies: no two
    # names share a trigram, so gram blocking must produce no pairs
    # (band-only blocking would produce 60*59/2 = 1770).
    import string

    letters = string.ascii_lowercase

    def word(i, j):  # deterministic 5-char word unique to name i
        base = [letters[(i * 7 + j * 3 + k) % 26] for k in range(5)]
        return "".join(base) + letters[i % 26] + letters[(i * 5 + 11) % 26]

    names = [" ".join(word(i, j) for j in range(4)) for i in range(60)]
    # force trigram disjointness by prefixing a per-name rare marker
    names = [f"{letters[i % 26]}{letters[(i * 3) % 26]}{i:02d}{n}" for i, n in enumerate(names)]
    assert len({len(n) for n in names}) == 1  # all same length
    df = spark.createDataFrame([(n, 1) for n in names], "p_name string, n_parts long")
    cands = fuzzy_name_candidates(df, max_dist=2)
    n_cand = cands.count()
    n_full = 60 * 59 // 2
    # the gram intersection must prune the same-length blow-up hard
    assert n_cand < n_full / 10, f"{n_cand} candidates vs band-only {n_full}"

    # and a pair that IS within distance 2 must still surface
    close = df.union(
        spark.createDataFrame(
            [(names[0][:-1] + "zz", 1)], "p_name string, n_parts long"
        )
    )
    got = {
        (r.name_a, r.name_b)
        for r in fuzzy_name_candidates(close, max_dist=2)
        .withColumn("d", F.levenshtein("name_a", "name_b"))
        .filter(F.col("d") <= 2)
        .collect()
    }
    assert any(names[0] in p for pair in got for p in pair)


def test_ddsketch_rollup_accuracy_and_mergeability(spark, tmp_path):
    """The log-bucket sketch must (a) estimate quantiles within the γ
    relative-error budget on a long-tail distribution the corpus doesn't
    exercise, and (b) merge: the sketch of a union equals the keyed sum
    of per-part sketches — the property that makes the daily layer a
    layer."""
    import datetime as dt
    import math

    from pyspark.sql import functions as F

    from project_bigdata_recsys_spark.operators.relational import (
        ddsketch_quantile_rollup,
    )

    # long-tail values: v = 1.1^i spread over 60 days, two types
    rows = []
    eid = 0
    for t in ("a", "b"):
        for i in range(400):
            day = dt.datetime(2024, 1, 1 + (i % 28), 6)
            rows.append((eid, day, eid % 7, t, 1.1 ** (i % 80), "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/events.parquet")
    out = {r.event_type: r for r in ddsketch_quantile_rollup(spark, sf_dir).collect()}
    assert set(out) == {"a", "b"}
    for r in out.values():
        assert r.p50_ok and r.p90_ok and r.p99_ok
        # estimates really are within 2% of the exact order statistics
        for q in (50, 90, 99):
            est, exact = getattr(r, f"p{q}_est"), getattr(r, f"p{q}_exact")
            assert abs(est - exact) / exact <= 0.02

    # mergeability: bucket counts of the union == summed per-half counts
    gamma = 1.02
    b = F.ceil(F.round(F.log("value") / F.lit(math.log(gamma)), 6)).cast("long")
    full = {
        (r.event_type, r.b): r.n
        for r in df.groupBy("event_type", b.alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    halves = []
    for pred in (F.col("event_id") % 2 == 0, F.col("event_id") % 2 == 1):
        halves.append(
            {
                (r.event_type, r.b): r.n
                for r in df.filter(pred)
                .groupBy("event_type", b.alias("b"))
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
        )
    summed = {}
    for h in halves:
        for k, v in h.items():
            summed[k] = summed.get(k, 0) + v
    assert summed == full


def test_merge_into_partitioned_rewrites_only_touched_partitions(
    spark, tmp_path
):
    """The copy-on-write MERGE must leave untouched partitions' files
    PHYSICALLY unmodified (same paths, sizes, mtimes) and apply
    latest-wins ∪ inserts inside the touched ones."""
    import os

    from pyspark.sql import functions as F

    from project_bigdata_recsys_spark.operators.maintenance import (
        merge_into_partitioned,
    )

    target = str(tmp_path / "t")
    base = spark.createDataFrame(
        [
            (1, "a", 10.0, "2024-01"),
            (2, "b", 20.0, "2024-01"),
            (3, "c", 30.0, "2024-02"),
            (4, "d", 40.0, "2024-03"),
        ],
        "id long, v string, price double, part string",
    )
    base.write.mode("overwrite").partitionBy("part").parquet(target)

    def files(part):
        d = os.path.join(target, f"part={part}")
        return sorted(
            (f, os.path.getsize(os.path.join(d, f)),
             os.path.getmtime(os.path.join(d, f)))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    before_feb = files("2024-02")
    before_mar = files("2024-03")

    updates = spark.createDataFrame(
        [(1, "a2", 11.0, "2024-01"), (5, "e", 50.0, "2024-01")],
        "id long, v string, price double, part string",
    )
    touched = merge_into_partitioned(spark, target, updates, ["id"], "part")
    assert touched == ["2024-01"]

    # untouched partitions: byte-identical files
    assert files("2024-02") == before_feb
    assert files("2024-03") == before_mar

    got = {
        (r.id, r.v, r.price)
        for r in spark.read.parquet(target).collect()
    }
    assert got == {
        (1, "a2", 11.0),  # updated (latest wins)
        (2, "b", 20.0),   # untouched row in touched partition survives
        (3, "c", 30.0),
        (4, "d", 40.0),
        (5, "e", 50.0),   # inserted
    }


def test_update_components_empty_delta_is_identity(spark):
    """O(affected) fold with an EMPTY delta must return the prior
    labeling untouched (no components are affected)."""
    from project_bigdata_recsys_spark.functions.dedup import (
        update_components,
    )

    prior = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3)], "doc_id long, cluster_id long"
    )
    delta = spark.createDataFrame([], "doc_a long, doc_b long")
    out = sorted(
        (r.doc_id, r.cluster_id)
        for r in update_components(prior, delta).collect()
    )
    assert out == [(1, 1), (2, 1), (3, 3)]


def test_merge_apply_changelog_deletes_and_prunes_empty_partitions(
    spark, tmp_path
):
    """The changelog form of the CoW merge: a winning delete removes the
    key, a partition whose rows are all deleted disappears from the
    table (the dynamic-overwrite blind spot handled by the explicit
    prune), and untouched partitions stay byte-identical."""
    import os

    from project_bigdata_recsys_spark.operators.maintenance import (
        merge_apply_changelog,
    )

    target = str(tmp_path / "t")
    base = spark.createDataFrame(
        [
            (1, "a", 10.0, "2024-01"),
            (2, "b", 20.0, "2024-01"),
            (3, "c", 30.0, "2024-02"),
            (4, "d", 40.0, "2024-03"),
        ],
        "id long, v string, price double, part string",
    )
    base.write.mode("overwrite").partitionBy("part").parquet(target)
    before_mar = sorted(os.listdir(os.path.join(target, "part=2024-03")))

    changelog = spark.createDataFrame(
        [
            (1, "a2", 11.0, "2024-01", 1, "U"),   # update
            (2, "b", 20.0, "2024-01", 1, "D"),    # delete one key
            (3, "c", 30.0, "2024-02", 1, "D"),    # empties the partition
        ],
        "id long, v string, price double, part string, seq int, op string",
    )
    touched = merge_apply_changelog(
        spark, target, changelog, ["id"], "part"
    )
    assert sorted(touched) == ["2024-01", "2024-02"]

    got = {(r.id, r.v, r.price) for r in spark.read.parquet(target).collect()}
    assert got == {(1, "a2", 11.0), (4, "d", 40.0)}
    # the fully-deleted partition's directory is gone
    assert not os.path.exists(os.path.join(target, "part=2024-02"))
    # untouched partition untouched
    assert sorted(os.listdir(os.path.join(target, "part=2024-03"))) == before_mar


def test_concurrent_events_peak_sweep_semantics(spark, tmp_path):
    """Pin the sweep-line contract on a hand-built interval set: touching
    intervals [a,b) [b,c) are NOT concurrent (−1 sorts before +1), a
    midnight-crossing interval counts toward both days' sweeps, and the
    reported peak day is the earliest day achieving the maximum."""
    import datetime as dt

    from project_bigdata_recsys_spark.operators.analytics import (
        concurrent_events_peak,
    )

    day0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(day, h, m=0, s=0):
        return day0 + dt.timedelta(days=day, hours=h, minutes=m, seconds=s)

    rows = [
        # type 'a': three overlapping at 10:00 day0 (peak 3), plus a
        # touching pair [11:00,11:01) [11:01,11:02) that must NOT stack.
        (1, ts(0, 10, 0), 7, "a", 120.0, "{}"),
        (2, ts(0, 10, 1), 7, "a", 120.0, "{}"),
        (3, ts(0, 10, 1, 30), 7, "a", 120.0, "{}"),
        (4, ts(0, 11, 0), 7, "a", 60.0, "{}"),
        (5, ts(0, 11, 1), 7, "a", 60.0, "{}"),
        # type 'b': a pair crossing midnight into day1 — both still open
        # at 00:00:30 day1, so day1's sweep must see peak 2 from the
        # carried-in pieces alone.
        (6, ts(0, 23, 59, 30), 8, "b", 90.0, "{}"),
        (7, ts(0, 23, 59, 45), 8, "b", 90.0, "{}"),
        # type 'b' day2: only one interval, peak 1 — so global peak day
        # for 'b' is day1 (epoch day of 2024-01-02).
        (8, ts(2, 5, 0), 8, "b", 30.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf_dir = str(tmp_path / "sf")
    df.write.parquet(sf_dir + "/events.parquet")

    got = {
        r.event_type: (r.n_intervals, r.peak_concurrent, r.peak_epoch_day)
        for r in concurrent_events_peak(spark, sf_dir).collect()
    }
    epoch_day = (day0.date() - dt.date(1970, 1, 1)).days
    assert got["a"] == (5, 3, epoch_day)
    # midnight-crossers: both pieces carried into day1, peak 2 there;
    # day0 also sees 2 (they overlap before midnight) — earliest wins.
    assert got["b"] == (3, 2, epoch_day)


def test_label_agreement_kappa_bounds(spark):
    """kappa is in [-1, 1], the confusion cells sum to n, and the flip
    rate implied by the off-diagonal matches the 10%×5% mutation bound."""
    from project_bigdata_recsys_spark.operators.quality import (
        label_agreement_kappa,
    )

    row = label_agreement_kappa(spark, "unused").collect()[0]
    assert row.n == 2000
    assert row.n00 + row.n01 + row.n10 + row.n11 == row.n
    disagree = row.n01 + row.n10
    # mutation flips only in_sample (~10%) AND u_flip<0.05 rows
    assert 0 < disagree < 0.02 * row.n
    assert -1.0 <= row.kappa <= 1.0
    assert row.p_observed > row.p_expected  # near-identical annotators


def test_bm25_scores_ranking_invariants(spark):
    """Per query term: ranks are 1..n with scores non-increasing, every
    score positive, and the query terms are the 3 most frequent overall."""
    from project_bigdata_recsys_spark.functions.text import bm25_scores

    rows = bm25_scores(spark, "/root/testdata/sf0.001").collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_term, []).append(r)
    assert len(by_q) == 3
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.bm25 for r in rs]
        assert all(a >= b for a, b in zip(scores, scores[1:]))
        assert all(s > 0 for s in scores)
        assert len(rs) <= 10


def test_vocab_coverage_curve_monotone(spark):
    """Coverage is non-decreasing in k, n_terms = min(k, vocab_size),
    and once k >= vocab_size the whole token mass is covered."""
    from project_bigdata_recsys_spark.functions.text import (
        vocab_coverage_curve,
    )

    rows = sorted(
        vocab_coverage_curve(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r.k,
    )
    assert [r.k for r in rows] == [1, 2, 4, 8, 16, 32]
    cov = [r.coverage for r in rows]
    assert all(a <= b for a, b in zip(cov, cov[1:]))
    for r in rows:
        assert r.n_terms == min(r.k, r.vocab_size)
        assert r.covered_tokens <= r.total_tokens
    assert rows[-1].k >= rows[-1].vocab_size
    assert rows[-1].coverage == 1.0


def test_item_triangles_literal_graph(spark):
    """K4 plus a pendant edge: 4 triangles total, each K4 vertex in
    exactly 3, the pendant vertex in none (so absent from the output)."""
    import itertools

    from project_bigdata_recsys_spark.functions.graph import item_triangles

    k4 = list(itertools.combinations([1, 2, 3, 4], 2))
    edges = k4 + [(4, 5)]
    sym = edges + [(b, a) for a, b in edges]
    edf = spark.createDataFrame(
        [(a, b, 1.0) for a, b in sym], "src long, dst long, w double"
    )
    rows = item_triangles(spark, "unused", edges=edf).collect()
    got = {r.l_partkey: (r.n_triangles, r.total_triangles) for r in rows}
    assert got == {1: (3, 4), 2: (3, 4), 3: (3, 4), 4: (3, 4)}


def test_cms_heavy_hitters_guarantee(spark):
    """The CMS one-sided guarantee: every estimate >= the exact count
    (collisions only add), ranks are by exact count, 15 rows."""
    from project_bigdata_recsys_spark.operators.relational import (
        cms_heavy_hitters,
    )

    rows = cms_heavy_hitters(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 15
    assert all(r.overestimates for r in rows)
    assert all(r.cms_est >= r.exact_n for r in rows)
    exacts = [r.exact_n for r in rows]
    assert exacts == sorted(exacts, reverse=True)


def test_item_similar_neighbors_salton_bounds(spark):
    """Salton cosine lives in (0, 1] (c_ab <= sqrt(c_a*c_b)), per-anchor
    ranks are contiguous from 1, at most 50 anchors emitted."""
    from project_bigdata_recsys_spark.functions.graph import (
        item_similar_neighbors,
    )

    rows = item_similar_neighbors(spark, "/root/testdata/sf0.001").collect()
    by_src = {}
    for r in rows:
        assert 0 < r.salton <= 1.0, r
        by_src.setdefault(r.src, []).append(r.rk)
    assert len(by_src) <= 50
    for rks in by_src.values():
        assert sorted(rks) == list(range(1, len(rks) + 1))


def test_lang_source_chi2_structure(spark):
    """Contributions are non-negative, the statistic bounds every cell's
    contribution, and dof = (langs-1)(sources-1) for the shipped corpus."""
    from project_bigdata_recsys_spark.operators.quality import (
        lang_source_chi2,
    )

    rows = lang_source_chi2(spark, "/root/testdata/sf0.001").collect()
    assert rows
    stat = rows[0].chi2_stat
    for r in rows:
        assert r.contrib >= 0
        assert r.chi2_stat == stat
        assert stat >= r.contrib - 1e-6
        assert r.expected > 0
    assert rows[0].dof == (5 - 1) * (20 - 1)
