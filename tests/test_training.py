from __future__ import annotations

import pytest

from translator_tm_provider_pipelines_spark.operators import training as tr


def test_hex_threshold_bounds():
    assert tr._hex_threshold(0.0) == "0000"  # nothing sorts below "0000"
    assert tr._hex_threshold(0.25) == "4000"
    assert tr._hex_threshold(0.5) == "8000"
    assert tr._hex_threshold(1.0) == "g"  # above every hex key
    with pytest.raises(ValueError):
        tr._hex_threshold(1.5)


def test_pack_sequences(spark):
    docs = spark.createDataFrame(
        # one shard (n_shards=1), capacity 10:
        # doc 0: 4 toks -> block 0, offset 0
        # doc 1: 5 toks -> block 0, offset 4
        # doc 2: 3 toks -> starts offset 9, spans blocks 0-1
        # doc 3: 0 toks -> zero-width, spans nothing
        # doc 4: 25 toks -> starts block 1 offset 2, spans 1-3 (3 blocks)
        [(0, 4), (1, 5), (2, 3), (3, 0), (4, 25)],
        "doc_id int, n_tokens int",
    )
    out = {r.doc_id: r for r in tr.pack_sequences(docs, capacity=10).collect()}
    assert (out[0].start_block, out[0].block_offset, out[0].n_blocks_spanned) == (0, 0, 1)
    assert (out[1].start_block, out[1].block_offset, out[1].n_blocks_spanned) == (0, 4, 1)
    assert (out[2].start_block, out[2].block_offset, out[2].n_blocks_spanned) == (0, 9, 2)
    assert (out[3].start_block, out[3].block_offset, out[3].n_blocks_spanned) == (1, 2, 0)
    assert (out[4].start_block, out[4].block_offset, out[4].n_blocks_spanned) == (1, 2, 3)

    # sharding: streams pack independently
    sharded = tr.pack_sequences(docs, capacity=10, n_shards=2).collect()
    by_shard = {}
    for r in sharded:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) == {0, 1}
    # shard 0 = docs 0,2,4 (4+3+25 tokens); doc 2 starts at offset 4
    s0 = {r.doc_id: r for r in by_shard[0]}
    assert (s0[2].start_block, s0[2].block_offset) == (0, 4)

    with pytest.raises(ValueError):
        tr.pack_sequences(docs, capacity=0)


def test_deterministic_sample(spark):
    docs = spark.createDataFrame([(i,) for i in range(2000)], "doc_id int")
    assert tr.deterministic_sample(docs, 1.0).count() == 2000
    assert tr.deterministic_sample(docs, 0.0).count() == 0
    a = sorted(r.doc_id for r in tr.deterministic_sample(docs, 0.3, seed="x").collect())
    b = sorted(r.doc_id for r in tr.deterministic_sample(docs, 0.3, seed="x").collect())
    assert a == b  # stable across runs
    assert 0.25 < len(a) / 2000 < 0.35  # rate within md5-uniformity tolerance
    c = sorted(r.doc_id for r in tr.deterministic_sample(docs, 0.3, seed="y").collect())
    assert a != c  # seed changes the keep set
    # nesting property: a smaller fraction is a subset of a larger one
    d = set(r.doc_id for r in tr.deterministic_sample(docs, 0.1, seed="x").collect())
    assert d <= set(a)


def test_stratified_sample(spark):
    docs = spark.createDataFrame(
        [(i, "keepall" if i % 2 else "drop") for i in range(1000)],
        "doc_id int, stratum string",
    )
    out = tr.stratified_sample(
        docs, {"keepall": 1.0}, stratum_col="stratum", default_fraction=0.0
    ).collect()
    assert len(out) == 500 and all(r.stratum == "keepall" for r in out)
    half = tr.stratified_sample(
        docs, {"keepall": 0.5, "drop": 0.1}, stratum_col="stratum"
    ).collect()
    kept = {"keepall": 0, "drop": 0}
    for r in half:
        kept[r.stratum] += 1
    assert 0.4 < kept["keepall"] / 500 < 0.6
    assert 0.04 < kept["drop"] / 500 < 0.18


def test_curation_manifest_matches_stepwise(spark):
    from translator_tm_provider_pipelines_spark.operators import textanalysis as ta
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox and the lazy dog of the north in a field"),
            (2, "the quick brown fox and the lazy dog of the north in a field"),  # exact dup
            (3, "der hund und die katze und das haus und nicht mehr"),  # German
            (4, "x"),  # fails the quality floor
            (5, "a tale of two cities and the best of times in the spring"),
            (6, "the cat sat on the mat and looked to the hills in the morning sun"),
        ],
        "doc_id int, text string",
    )
    fused = tr.curation_manifest(
        docs, min_quality=0.2, lang="en", sample_fraction=1.0, capacity=16, n_shards=2
    )
    # stepwise: quality -> language -> exact-dup keep -> pack
    q = ta.quality_scores(docs).where(F.col("quality_score") >= 0.2)
    l = ta.language_id(docs).where(F.col("pred_lang") == "en")
    keep = (
        docs.withColumn("__h", F.md5("text"))
        .groupBy("__h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    survivors = (
        q.select("doc_id", "n_tokens")
        .join(l.select("doc_id"), "doc_id")
        .join(keep, "doc_id")
    )
    stepwise = tr.pack_sequences(survivors, capacity=16, n_shards=2)
    assert sorted(map(tuple, fused.collect())) == sorted(map(tuple, stepwise.collect()))
    ids = {r.doc_id for r in fused.collect()}
    assert 2 not in ids and 3 not in ids and 4 not in ids
    assert {1, 5, 6} <= ids


def test_pack_sequences_string_ids_shard_by_hash(spark):
    """String doc ids must shard via the md5 convention, not cast-to-NULL
    (which would silently collapse everything into one NULL shard)."""
    docs = spark.createDataFrame(
        [(f"doc-{i}", 10) for i in range(40)], "doc_id string, n_tokens int"
    )
    out = tr.pack_sequences(docs, capacity=16, n_shards=4).collect()
    shards = {r.shard for r in out}
    assert None not in shards
    assert len(shards) > 1  # 40 hashed ids across 4 shards: all non-degenerate
    # deterministic: same input -> same shard assignment
    again = tr.pack_sequences(docs, capacity=16, n_shards=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------


def _dsir_corpus(spark):
    med = "patient dosage clinical trial receptor protein enzyme pathway"
    web = "click here subscribe newsletter cookie banner advertisement deal"
    rows = (
        [(i, f"{med} study number {i} measured the receptor pathway") for i in range(10)]
        + [(100 + i, f"{web} offer number {i} click subscribe now") for i in range(10)]
        + [(200, f"{med} {web} mixed register document")]
    )
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_dsir_weights_rank_target_like_docs_first(spark):
    """Planted vocabulary shift: with the medical docs as target, every
    medical doc outweighs every web doc; the mixed doc lands between the
    two blocks."""
    docs = _dsir_corpus(spark)
    target = docs.where("doc_id < 10")
    w = {r.doc_id: r.log_weight for r in tr.dsir_log_weights(docs, target).collect()}
    med = [w[i] for i in range(10)]
    web = [w[100 + i] for i in range(10)]
    assert min(med) > w[200] > max(web)


def test_dsir_weights_contract(spark):
    docs = _dsir_corpus(spark)
    target = docs.where("doc_id < 10")
    out = tr.dsir_log_weights(docs, target)
    assert out.columns == ["doc_id", "log_weight", "n_features"]
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 21  # one row per input doc
    # n_features = unigrams + bigrams = 2*len(words) - 1
    n_words = len(rows[200].__fields__) and len(
        "patient dosage clinical trial receptor protein enzyme pathway "
        "click here subscribe newsletter cookie banner advertisement deal "
        "mixed register document".split()
    )
    assert rows[200].n_features == 2 * n_words - 1
    # empty/featureless doc carries weight 0
    empty = spark.createDataFrame([(1, "!!!")], "doc_id int, text string")
    r = tr.dsir_log_weights(empty, empty).first()
    assert (r.log_weight, r.n_features) == (0.0, 0)


def test_dsir_select_takes_top_fraction(spark):
    docs = _dsir_corpus(spark)
    target = docs.where("doc_id < 10")
    sel = tr.dsir_select(docs, target, fraction=0.5)
    ids = {r.doc_id for r in sel.collect()}
    assert len(ids) == 10
    assert ids == set(range(10))  # exactly the target-register docs win


def test_temperature_sample_upsamples_small_sources(spark):
    """alpha=0.5 on a 90/10 skew: the small source's share of the budget
    (~25%) far exceeds its raw share (10%), quotas sum ~= total, and the
    selection is deterministic."""
    rows = [(i, "big") for i in range(90)] + [(100 + i, "small") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id int, source string")
    out = tr.temperature_sample(docs, total=40, alpha=0.5)
    sel = [(r.doc_id, r.source) for r in out.collect()]
    from collections import Counter

    shares = Counter(s for _, s in sel)
    # sqrt(90):sqrt(10) ~ 3:1 -> quotas 30/10
    assert shares == {"big": 30, "small": 10}
    again = [(r.doc_id, r.source) for r in tr.temperature_sample(
        docs, total=40, alpha=0.5
    ).collect()]
    assert sorted(sel) == sorted(again)
    # alpha=1 is proportional: 36/4
    prop = Counter(
        r.source for r in tr.temperature_sample(docs, total=40, alpha=1.0).collect()
    )
    assert prop == {"big": 36, "small": 4}


def _brute_top(spark, docs, target, fraction):
    w = tr.dsir_log_weights(docs, target).collect()
    n_keep = int(len(w) * fraction)
    ranked = sorted(w, key=lambda r: (-r.log_weight, r.doc_id))
    return sorted((r.doc_id, r.log_weight, r.n_features) for r in ranked[:n_keep])


def test_dsir_select_floor_semantics_non_divisible(spark):
    """21 docs x 0.2 keeps floor(4.2) = 4 (the round-6 advice case: int()
    truncation and the oracle's floor() must agree on non-integral
    count x fraction), and the boundary-slice path returns EXACTLY the
    brute-force top-n by (weight desc, doc_id)."""
    docs = _dsir_corpus(spark)  # 21 docs
    target = docs.where("doc_id < 10")
    sel = sorted(
        (r.doc_id, r.log_weight, r.n_features)
        for r in tr.dsir_select(docs, target, fraction=0.2).collect()
    )
    assert len(sel) == 4
    assert sel == _brute_top(spark, docs, target, 0.2)


def test_dsir_select_tie_flood_falls_back_exactly(spark):
    """Adversarial distribution: every weight identical (single-text
    corpus), so the quantile bracket cannot separate a boundary slice —
    the validated-count fallback must still return exactly the doc-id
    tie-broken top-n, not a wrong or partial set."""
    rows = [(i, "same exact text for everyone here") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    sel = sorted(r.doc_id for r in tr.dsir_select(docs, docs, fraction=0.3).collect())
    assert sel == list(range(9))  # floor(30*0.3)=9, min doc_ids win ties


def test_dsir_select_fraction_edges(spark):
    docs = _dsir_corpus(spark)
    target = docs.where("doc_id < 10")
    assert tr.dsir_select(docs, target, fraction=0.0).count() == 0
    assert tr.dsir_select(docs, target, fraction=1.0).count() == 21
    # fraction too small for one row -> empty, not an error
    assert tr.dsir_select(docs, target, fraction=0.01).count() == 0


def test_temperature_sample_deficient_source_fallback(spark):
    """Force the md5-prefix pre-filter to under-select (slack ~0 and no
    margin): the per-source survivor-count check must detect every
    deficient source and fall back to ranking it in full, reproducing
    the default-parameter selection row-for-row."""
    rows = [(i, "big") for i in range(90)] + [(100 + i, "small") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id int, source string")
    want = sorted(
        (r.doc_id, r.source)
        for r in tr.temperature_sample(docs, total=40, alpha=0.5).collect()
    )
    got = sorted(
        (r.doc_id, r.source)
        for r in tr.temperature_sample(
            docs, total=40, alpha=0.5, slack=1e-9, min_margin=0
        ).collect()
    )
    assert got == want
    from collections import Counter

    assert Counter(s for _, s in got) == {"big": 30, "small": 10}


def test_temperature_sample_quota_exceeds_source(spark):
    """A tiny source whose quota exceeds its row count contributes every
    row (threshold saturates to keep-all); totals stay deterministic."""
    rows = [(i, "huge") for i in range(200)] + [(900 + i, "tiny") for i in range(2)]
    docs = spark.createDataFrame(rows, "doc_id int, source string")
    out = tr.temperature_sample(docs, total=60, alpha=0.0)  # uniform quotas: 30/30
    from collections import Counter

    shares = Counter(r.source for r in out.collect())
    assert shares["tiny"] == 2  # the whole source, not more
    assert shares["huge"] == 30


def _brute_token_budget(rows, budget, alpha=0.5):
    """Pure-python twin of token_budget_sample's contract: per-source
    sqrt-token quotas (rounded to 4 decimals), greedy prefix in
    (md5(doc_id), doc_id) order."""
    import hashlib
    from collections import defaultdict

    tok = defaultdict(float)
    for d, s, n in rows:
        tok[s] += n
    tw = sum(t ** alpha for t in tok.values())
    quota = {s: round(budget * t ** alpha / tw, 4) for s, t in tok.items()}
    out = []
    by_src = defaultdict(list)
    for d, s, n in rows:
        by_src[s].append((hashlib.md5(str(d).encode()).hexdigest(), d, n))
    for s, docs in by_src.items():
        c = 0.0
        for _h, d, n in sorted(docs):
            c += n
            if c <= quota[s]:
                out.append((d, s))
    return sorted(out)


def test_token_budget_sample_matches_brute_force(spark):
    rows = (
        [(i, "big", 100 + (i % 7) * 13) for i in range(60)]
        + [(200 + i, "small", 40 + (i % 5) * 9) for i in range(12)]
        + [(300 + i, "mid", 75) for i in range(25)]
    )
    docs = spark.createDataFrame(rows, "doc_id int, source string, n_tokens int")
    got = sorted(
        (r.doc_id, r.source)
        for r in tr.token_budget_sample(docs, budget=3000, alpha=0.5).collect()
    )
    assert got == _brute_token_budget(rows, 3000)
    assert len(got) > 0
    # per-source selected token mass stays within the quota (prefix cut)
    sel = {d for d, _ in got}
    import hashlib
    from collections import defaultdict

    tok = defaultdict(float)
    for d, s, n in rows:
        tok[s] += n
    tw = sum(t ** 0.5 for t in tok.values())
    used = defaultdict(float)
    for d, s, n in rows:
        if d in sel:
            used[s] += n
    for s in used:
        assert used[s] <= round(3000 * tok[s] ** 0.5 / tw, 4) + 1e-9


def test_token_budget_sample_boundary_slice_is_exact(spark):
    """The md5-prefix slice must reproduce the full-window computation
    (slack=1e9 saturates the threshold to keep-all = the naive path)."""
    rows = [(i, f"s{i % 4}", 50 + (i * 17) % 90) for i in range(160)]
    docs = spark.createDataFrame(rows, "doc_id int, source string, n_tokens int")
    naive = sorted(
        map(tuple, tr.token_budget_sample(docs, budget=2500, slack=1e9).collect())
    )
    sliced = sorted(map(tuple, tr.token_budget_sample(docs, budget=2500).collect()))
    deficient = sorted(
        map(tuple, tr.token_budget_sample(
            docs, budget=2500, slack=1e-9, min_margin=0
        ).collect())
    )
    assert naive == sliced == deficient and len(naive) > 0


def test_dsir_gumbel_sample_matches_naive_rank(spark):
    """The Gumbel-perturbed boundary-slice selection equals a driver-side
    naive rank over the same deterministic keys, and differs from the
    pure top-fraction selection (the noise actually resamples)."""
    import hashlib
    import math

    docs = _dsir_corpus(spark)  # 21 docs
    target = docs.where("doc_id < 10")
    got = sorted(
        r.doc_id
        for r in tr.dsir_gumbel_sample(docs, target, fraction=0.4).collect()
    )
    w = {r.doc_id: r.log_weight for r in tr.dsir_log_weights(docs, target).collect()}

    def gkey(d):
        u = (int(hashlib.md5(f"g0:{d}".encode()).hexdigest()[:7], 16) + 0.5) / 16 ** 7
        return round(w[d] - math.log(-math.log(u)), 6)

    n_keep = int(len(w) * 0.4)
    want = sorted(
        d for d, _ in sorted(w.items(), key=lambda kv: (-gkey(kv[0]), kv[0]))[:n_keep]
    )
    assert got == want and len(got) == n_keep
    top = sorted(r.doc_id for r in tr.dsir_select(docs, target, fraction=0.4).collect())
    assert got != top  # noise resamples: lower-weight docs can win slots


def test_boundary_top_n_degenerate_all_equal_keys(spark):
    """All-equal keys make the quantile bracket degenerate (n_sure=0,
    n_cand=n): the validated-count fallback must trigger a full rank and
    still return EXACTLY n_keep rows, tie-broken by doc_id ascending."""
    docs = spark.createDataFrame(
        [(i, 1.0) for i in range(40)], "doc_id int, key double"
    )
    out = tr.boundary_top_n(docs, 7, "key").collect()
    assert sorted(r.doc_id for r in out) == list(range(7))


def test_boundary_top_n_trusts_caller_n_total(spark):
    """With n_total supplied, boundary_top_n must run NO count action of
    its own (the dsir callers already counted the persisted table) — a
    poisoned .count() proves the docstring's no-extra-count claim."""
    docs = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "doc_id int, key double"
    )

    def _poisoned_count():
        raise AssertionError("boundary_top_n ran its own count action")

    docs.count = _poisoned_count  # type: ignore[method-assign]
    out = tr.boundary_top_n(docs, 5, "key", n_total=50).collect()
    assert sorted(r.doc_id for r in out) == [45, 46, 47, 48, 49]


def test_temperature_sample_5k_sources_bounded_compile(spark):
    """5,000 distinct sources: the broadcast plan-table join compiles and
    runs in bounded time where the old per-source nested CASE WHEN chain
    overflowed the analyzer/codegen stack. Quotas must still fill."""
    n_src = 5000
    rows = [(s * 3 + j, f"src{s}") for s in range(n_src) for j in range(3)]
    docs = spark.createDataFrame(rows, "doc_id int, source string")
    out = tr.temperature_sample(docs, total=n_src, alpha=0.5)
    got = out.groupBy().count().collect()[0][0]
    # every source has equal size, so quota = total/n_src = 1 doc each
    assert got == n_src


def test_token_budget_sample_5k_sources_bounded_compile(spark):
    """Same 5k-source bound as temperature_sample: the token-budget
    variant's threshold+quota must ride the broadcast plan table, never a
    per-source expression chain."""
    n_src = 5000
    rows = [(s * 2 + j, f"src{s}", 10) for s in range(n_src) for j in range(2)]
    docs = spark.createDataFrame(rows, "doc_id int, source string, n_tokens int")
    # equal token mass per source: quota = budget/n_src = 10 tokens = 1 doc
    out = tr.token_budget_sample(docs, budget=n_src * 10.0)
    assert out.groupBy().count().collect()[0][0] == n_src


def test_mixture_quota_half_up_convention_vs_registry_oracle(spark):
    """r8 VERDICT task 6: the mixture quota arithmetic is pinned to
    floor(x+0.5) (HALF_UP — what Spark's and DuckDB's round() do) plus
    math.sqrt for alpha=0.5. Python's round() is banker's and keeps a
    DIFFERENT document count on .5-boundary quotas, silently breaking
    oracle hash equality. Engineered boundary: two 4-doc sources and
    total=5 give each source quota 5·2/4 = 2.5 EXACTLY (binary-exact
    arithmetic, no float fuzz), so HALF_UP keeps 3 per source where
    banker's keeps 2. The expectation comes from the REGISTRY oracle's
    own SQL text (total literal swapped) run in DuckDB — the test fails
    if EITHER side's rounding mode changes."""
    import sys
    from collections import Counter

    import duckdb
    import pandas as pd

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    rows = [(i, "src_a" if i < 4 else "src_b") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id int, source string")
    got = sorted(
        (r.doc_id, r.source)
        for r in tr.temperature_sample(docs, total=5, alpha=0.5).collect()
    )
    per_src = Counter(s for _, s in got)
    assert per_src == {"src_a": 3, "src_b": 3}  # HALF_UP on 2.5 → 3
    # the trap this test exists for: Python's banker's round would say 2
    assert round(2.5) == 2

    sql = entry.oracle_sql()["temperature_mixture_sample"].replace("300", "5")
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "source"]))
    want = sorted(map(tuple, con.sql(sql).fetchall()))
    assert got == want


@pytest.mark.parametrize("alpha", [0.3, 0.5, 0.7])
def test_mixture_quota_alpha_sweep_matches_oracle_arithmetic(spark, alpha):
    """Quota arithmetic across the alpha range: per-source kept sets must
    equal DuckDB's cast(round(total·n^alpha/Σw) AS bigint) rank-prefix
    rule on an uneven source profile (pow for alpha≠0.5, sqrt for 0.5 —
    both correctly rounded, so engine and oracle agree bit-for-bit)."""
    import duckdb
    import pandas as pd

    counts = {"a": 7, "b": 13, "c": 3, "d": 1}
    rows = []
    i = 0
    for s, n in sorted(counts.items()):
        for _ in range(n):
            rows.append((i, s))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id int, source string")
    got = sorted(
        (r.doc_id, r.source)
        for r in tr.temperature_sample(docs, total=11, alpha=alpha).collect()
    )
    w = "sqrt(cast(n AS double))" if alpha == 0.5 else f"pow(cast(n AS double), {alpha})"
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "source"]))
    want = sorted(
        map(
            tuple,
            con.sql(
                f"""
        WITH cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
        qt AS (SELECT source, {w} AS w FROM cnt),
        quota AS (
          SELECT source, cast(round(11 * w / (SELECT sum(w) FROM qt)) AS bigint) AS q
          FROM qt
        ),
        ranked AS (
          SELECT doc_id, source,
                 row_number() OVER (
                   PARTITION BY source ORDER BY md5(cast(doc_id AS varchar)), doc_id
                 ) AS rn
          FROM documents
        )
        SELECT r.doc_id, r.source
        FROM ranked r JOIN quota q ON q.source = r.source
        WHERE r.rn <= q.q
        """
            ).fetchall(),
        )
    )
    assert got == want
