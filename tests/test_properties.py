"""Property-based tests (hypothesis) for the hand-built operator
semantics — the reference repo has none (SURVEY §5); these cover the
operators whose correctness is easiest to get subtly wrong.

One shared SparkSession; examples are small so each property runs in
seconds. deadline=None because Spark job latency is not the property
under test.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_SETTINGS = dict(
    # 8 examples keeps each Spark-backed property under ~3.5s while the
    # strategies still hit the edge shapes (empty side, ties, clones);
    # bump locally when hunting a failure — hypothesis shrinks either way
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# (user_id, ts, is_purchase) event streams
_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=100),
        st.booleans(),
    ),
    min_size=1,
    max_size=40,
)


@settings(**_SETTINGS)
@given(_events)
def test_asof_union_window_matches_merge_asof(spark, events):
    """The union+window as-of merge must agree with pandas.merge_asof
    (allow_exact_matches=True) for every generated stream."""
    clicks = [(i, u, t) for i, (u, t, p) in enumerate(events) if not p]
    purchases = [(u, t) for (u, t, p) in events if p]
    if not clicks:
        return

    cdf = spark.createDataFrame(clicks, "event_id long, user_id long, ts_us long")
    if purchases:
        pdf_p = spark.createDataFrame(purchases, "user_id long, ts_us long")
    else:
        pdf_p = spark.createDataFrame([], "user_id long, ts_us long")

    merged = cdf.withColumn("p_ts", F.lit(None).cast("long")).unionByName(
        pdf_p.select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id",
            "ts_us",
            F.col("ts_us").alias("p_ts"),
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts_us").asc(), F.col("p_ts").asc_nulls_last())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    got = {
        r.event_id: r.last_p
        for r in merged.withColumn("last_p", F.last("p_ts", ignorenulls=True).over(w))
        .filter(F.col("event_id").isNotNull())
        .collect()
    }

    left = pd.DataFrame(clicks, columns=["event_id", "user_id", "ts_us"]).sort_values(
        "ts_us", kind="stable"
    )
    right = pd.DataFrame(purchases, columns=["user_id", "ts_us"]).astype("int64")
    right = right.sort_values("ts_us", kind="stable")
    right["p_ts"] = right["ts_us"]
    expected = pd.merge_asof(
        left,
        right,
        on="ts_us",
        by="user_id",
        direction="backward",
        allow_exact_matches=True,
    )
    for _, row in expected.iterrows():
        exp = None if pd.isna(row["p_ts"]) else int(row["p_ts"])
        assert got[int(row["event_id"])] == exp


_docs = st.lists(
    st.lists(st.sampled_from("abcdefgh"), min_size=3, max_size=12).map(
        lambda ws: " ".join(ws)
    ),
    min_size=2,
    max_size=12,
)


@settings(**_SETTINGS)
@given(_docs)
def test_minhash_identical_docs_always_candidates(spark, texts):
    """LSH recall floor: two identical documents share every minhash,
    hence every band key, so they MUST appear as a candidate pair."""
    from pyspark_xgboost_spark.operators.dedup import _minhash_signature_df

    rows = [(i, t) for i, t in enumerate(texts)] + [
        (len(texts), texts[0])  # clone of doc 0
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig = _minhash_signature_df(docs).collect()
    by_id = {r.doc_id: tuple(r[f"h{k}"] for k in range(8)) for r in sig}
    if 0 in by_id:  # doc 0 had >= 3 tokens
        assert by_id[0] == by_id[len(texts)]


def _chk_minhash_bucket_cap_bounds_pair_expansion(spark):
    """A hot LSH bucket (here: 70 identical docs, all sharing every band
    key) must expand to C(cap, 2) pairs over the cap lowest doc_ids, not
    C(70, 2) — the worst-case pair blowup is bounded by _MH_BUCKET_CAP
    regardless of bucket population."""
    from pyspark_xgboost_spark.operators.dedup import (
        _MH_BUCKET_CAP,
        _minhash_candidate_pairs,
    )

    n = _MH_BUCKET_CAP + 6
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(n)], "doc_id long, text string"
    )
    pairs = _minhash_candidate_pairs(docs).collect()
    cap = _MH_BUCKET_CAP
    assert len(pairs) == cap * (cap - 1) // 2
    assert all(r.doc_a < r.doc_b < cap for r in pairs)


def _chk_minhash_b128_identical_docs_always_candidates(spark):
    """Recall floor for the high-precision 16×8 banding: identical docs
    share all 128 minhashes, hence every band key, so they MUST pair —
    and a clearly-dissimilar doc must not pair with either."""
    from pyspark_xgboost_spark.operators import dedup

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "entirely different words about cabbages and kings here"),
    ]

    def fake_load(spark_, sf_dir_, table):
        return spark_.createDataFrame(rows, "doc_id long, text string")

    orig = dedup.load_table
    dedup.load_table = fake_load
    try:
        pairs = {
            (r.doc_a, r.doc_b)
            for r in dedup.dedup_minhash_b128(spark, "unused").collect()
        }
    finally:
        dedup.load_table = orig
    assert pairs == {(0, 1)}


def _chk_lsh_bucket_cap_bounds_aggregation_state(spark):
    """The cap must be applied BEFORE collect_list (row_number window
    filter), so no aggregation buffer ever holds more than `cap` ids —
    a corpus-wide degenerate bucket is a bounded state, not an OOM.
    Checks both the semantics (cap lowest ids survive) and the plan
    (a row_number Window sits below the Aggregate)."""
    from pyspark_xgboost_spark.operators.dedup import _capped_bucket_ids

    df = spark.createDataFrame(
        [("hot", i) for i in range(100)] + [("cold", 0), ("cold", 1)],
        "key string, id long",
    )
    buckets = _capped_bucket_ids(df, ["key"], "id", 8)
    got = {r.key: r.ids for r in buckets.collect()}
    assert got == {"hot": list(range(8)), "cold": [0, 1]}
    plan = buckets._jdf.queryExecution().optimizedPlan().toString()
    win_pos = plan.find("row_number")
    agg_pos = plan.find("collect_list")
    assert win_pos != -1 and agg_pos != -1
    # optimizedPlan prints top-down: the Aggregate (collect_list) must
    # appear ABOVE the Window (row_number) — i.e. the cap runs first
    assert agg_pos < win_pos


def _chk_substring_dedup_degenerate_identical_corpus(spark):
    """A corpus where EVERY doc is the same text (every window hash is a
    corpus-wide hot bucket — the case that OOMed the old post-agg cap
    form at scale) must produce exactly C(_SS_CAP, 2) pairs over the
    _SS_CAP lowest doc_ids, each sharing every strided window."""
    from pyspark_xgboost_spark.operators import dedup

    text = "x" * (dedup._SS_WIN + 2 * dedup._SS_STRIDE)  # 3 windows, identical
    n = dedup._SS_CAP * 4

    def fake_load(spark_, sf_dir_, table):
        return spark_.createDataFrame(
            [(i, text) for i in range(n)], "doc_id long, text string"
        )

    orig = dedup.load_table
    dedup.load_table = fake_load
    try:
        rows = dedup.dedup_substring_exact(spark, "unused").collect()
    finally:
        dedup.load_table = orig
    cap = dedup._SS_CAP
    assert len(rows) == cap * (cap - 1) // 2
    assert all(r.doc_a < r.doc_b < cap for r in rows)
    # all windows of an all-'x' doc hash identically -> ONE distinct
    # window hash per doc, so each surviving pair shares exactly 1
    assert all(r.n_shared_windows == 1 for r in rows)


def _chk_connected_components_transitive_closure(spark):
    """dedup_groups_connected must group by TRANSITIVE closure: a chain
    of near-identical docs where the endpoints never collide in a band
    still forms one group. Identical docs guarantee full-signature
    collisions, so a clone chain {0,1,2} plus a separate clone pair
    {3,4} must yield exactly two groups keyed by their min doc_id."""
    from pyspark_xgboost_spark.operators import dedup

    def fake_load(spark_, sf_dir_, table):
        rows = [
            (0, "red fox jumps high"),
            (1, "red fox jumps high"),
            (2, "red fox jumps high"),
            (3, "blue whale swims deep"),
            (4, "blue whale swims deep"),
            (5, "lone document with words"),
        ]
        return spark_.createDataFrame(rows, "doc_id long, text string")

    orig = dedup.load_table
    dedup.load_table = fake_load
    try:
        got = {
            r.group_id: (r.n_docs, r.max_doc_id)
            for r in dedup.dedup_groups_connected(spark, "unused").collect()
        }
    finally:
        dedup.load_table = orig
    assert got == {0: (3, 2), 3: (2, 4)}


@settings(**_SETTINGS)
@given(
    st.lists(st.floats(min_value=0.0, max_value=100.0, width=32), min_size=1, max_size=30)
)
def test_exact_cents_sum_is_exact(spark, values):
    """Integer-cents aggregation (the oracle-parity idiom for money
    columns) equals a Python exact sum of rounded cents."""
    df = spark.createDataFrame([(float(v),) for v in values], "v double")
    got = df.agg(
        F.sum(F.round(F.col("v") * 100, 0).cast("bigint")).alias("cents")
    ).collect()[0]["cents"]
    import decimal

    exp = sum(
        int(
            decimal.Decimal(v * 100).quantize(
                decimal.Decimal("1"), rounding=decimal.ROUND_HALF_UP
            )
        )
        for v in values
    )
    assert got == exp


def _chk_quantized_aggregates_partition_invariant(spark):
    """The integer-quantization discipline's whole point: results are
    bit-identical no matter how rows are distributed across partitions
    (float sums would drift with partial-agg order)."""
    from pyspark_xgboost_spark.operators.corpus import (
        embedding_whitening_stats,
        text_unigram_logprob,
    )
    from tests.conftest import SF_DIR

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    base_w = canon(embedding_whitening_stats(spark, SF_DIR))
    base_l = canon(text_unigram_logprob(spark, SF_DIR))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for n in ("1", "7"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            assert canon(embedding_whitening_stats(spark, SF_DIR)) == base_w
            assert canon(text_unigram_logprob(spark, SF_DIR)) == base_l
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _chk_funnel_partition_invariant(spark):
    from pyspark_xgboost_spark.operators.temporal import events_funnel_conversion
    from tests.conftest import SF_DIR

    base = events_funnel_conversion(spark, SF_DIR).collect()[0]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        again = events_funnel_conversion(spark, SF_DIR).collect()[0]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert tuple(base) == tuple(again)


def _chk_fuzzy_levenshtein_catches_edits_jaccard_misses(spark):
    """An edit inside a word changes Levenshtein barely but destroys
    the token for Jaccard — the reason pipelines run both verifiers.
    Two identical docs except one character must pass the 80% edit
    threshold."""
    from pyspark_xgboost_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog " * 4

    def fake_load(spark_, sf_dir_, table):
        rows = [
            (0, base),
            (1, base[:-10] + "lazy dOg "),  # one-char-ish edit near the end
            (2, "совершенно другой текст без общих слов вообще " * 4),
        ]
        return spark_.createDataFrame(rows, "doc_id long, text string")

    orig = dedup.load_table
    dedup.load_table = fake_load
    try:
        rows = dedup.dedup_fuzzy_levenshtein(spark, "unused").collect()
    finally:
        dedup.load_table = orig
    got = {(r.doc_a, r.doc_b): r.sim_bp for r in rows}
    assert (0, 1) in got
    assert got[(0, 1)] >= 8000
    assert all(2 not in pair for pair in got)


@settings(**_SETTINGS)
@given(_events)
def test_nearest_asof_matches_bruteforce(spark, events):
    """join_asof_nearest's merge must agree with a brute-force nearest
    search (ties backward) for every generated stream."""
    from pyspark_xgboost_spark.operators import temporal

    clicks = [(i, u, t) for i, (u, t, p) in enumerate(events) if not p]
    purchases = [(u, t) for (u, t, p) in events if p]
    if not clicks:
        return

    def fake_load(spark_, sf_dir_, table):
        rows = [
            (i, "click", u, t * 1000) for i, u, t in clicks
        ] + [
            (10_000 + j, "purchase", u, t * 1000)
            for j, (u, t) in enumerate(purchases)
        ]
        df = spark_.createDataFrame(
            rows, "event_id long, event_type string, user_id long, us long"
        )
        return df.selectExpr(
            "event_id", "event_type", "user_id", "timestamp_micros(us) AS ts"
        )

    orig = temporal.load_table
    temporal.load_table = fake_load
    try:
        got = {
            r.event_id: r.nearest_purchase_us
            for r in temporal.join_asof_nearest(spark, "unused").collect()
        }
    finally:
        temporal.load_table = orig
    for i, u, t in clicks:
        cands = [pt * 1000 for (pu, pt) in purchases if pu == u]
        if not cands:
            assert got[i] is None
            continue
        tt = t * 1000
        best = min(cands, key=lambda c: (abs(c - tt), 0 if c <= tt else 1))
        assert got[i] == best, (i, u, t, cands, got[i], best)


def _chk_substring_dedup_matches_bruteforce(spark):
    """dedup_substring_exact vs a pure-Python recompute of the strided
    window collisions (cap included)."""
    import collections
    import hashlib

    from pyspark_xgboost_spark.operators import dedup
    from pyspark_xgboost_spark.sources import load_table
    from tests.conftest import SF_DIR

    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared_windows"]
        for r in dedup.dedup_substring_exact(spark, SF_DIR).collect()
    }
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    by_hash = collections.defaultdict(set)
    for d in docs:
        t = d["text"]
        if len(t) < dedup._SS_WIN:
            continue
        for p in range(0, len(t) - dedup._SS_WIN + 1, dedup._SS_STRIDE):
            h = hashlib.md5(t[p : p + dedup._SS_WIN].encode()).hexdigest()
            by_hash[h].add(d["doc_id"])
    expect = collections.Counter()
    for ids in by_hash.values():
        members = sorted(ids)[: dedup._SS_CAP]
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                expect[(a, b)] += 1
    assert got == dict(expect)
    assert got  # the fixture really contains cross-doc repeats


def _chk_mode_exact_matches_counter(spark):
    import collections

    from pyspark_xgboost_spark.operators.relational import agg_mode_exact
    from pyspark_xgboost_spark.sources import load_table
    from tests.conftest import SF_DIR

    got = {
        r["o_orderstatus"]: (r["mode_priority"], r["n"])
        for r in agg_mode_exact(spark, SF_DIR).collect()
    }
    rows = load_table(spark, SF_DIR, "orders").select(
        "o_orderstatus", "o_orderpriority"
    ).collect()
    per_status = collections.defaultdict(collections.Counter)
    for r in rows:
        per_status[r["o_orderstatus"]][r["o_orderpriority"]] += 1
    expect = {
        s: min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        for s, c in per_status.items()
    }
    assert got == expect


def _chk_pipeline_dedup_corpus_conserves_and_matches_unionfind(spark):
    """Survivor accounting must (a) conserve totals per source and
    (b) equal a pure-Python union-find over the same verified pairs."""
    import collections

    from pyspark_xgboost_spark.operators import dedup
    from pyspark_xgboost_spark.operators.pipeline import pipeline_dedup_corpus
    from pyspark_xgboost_spark.sources import load_table
    from tests.conftest import SF_DIR

    rows = pipeline_dedup_corpus(spark, SF_DIR).collect()
    assert all(r["n_kept"] + r["n_dropped"] == r["n_docs"] for r in rows)

    docs = load_table(spark, SF_DIR, "documents")
    pairs = dedup._minhash_candidate_pairs(docs)
    ver = (
        dedup._jaccard_scored_pairs(docs, pairs)
        .filter("jac >= 0.5")
        .collect()
    )
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in ver:
        a, b = find(r["doc_a"]), find(r["doc_b"])
        if a != b:
            parent[max(a, b)] = min(a, b)
    comps = collections.defaultdict(list)
    for d in list(parent):
        comps[find(d)].append(d)
    meta = {
        r["doc_id"]: (r["source"], r["n_chars"])
        for r in docs.select("doc_id", "source", "n_chars").collect()
    }
    expect_drop = collections.Counter()
    for members in comps.values():
        keeper = max(members, key=lambda d: (meta[d][1], -d))
        for d in members:
            if d != keeper:
                expect_drop[meta[d][0]] += 1
    got_drop = {r["source"]: r["n_dropped"] for r in rows if r["n_dropped"]}
    assert got_drop == {s: n for s, n in expect_drop.items() if n}


def _chk_scd2_versions_partition_history_exactly(spark):
    """Each customer's SCD2 rows must tile their order history: runs of
    identical priority collapse to one version, intervals chain
    lead-to-lead, exactly one open (is_current) version per customer."""
    import collections

    from pyspark_xgboost_spark.operators.temporal import dim_scd2_build
    from pyspark_xgboost_spark.sources import load_table
    from tests.conftest import SF_DIR

    got = collections.defaultdict(list)
    for r in dim_scd2_build(spark, SF_DIR).collect():
        got[r["custkey"]].append(r)
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
    ).collect()
    hist = collections.defaultdict(list)
    for o in orders:
        hist[o["o_custkey"]].append(o)
    assert set(got) == set(hist)
    for ck, rows in got.items():
        seq = sorted(hist[ck], key=lambda o: (o["o_orderdate"], o["o_orderkey"]))
        runs = []
        for o in seq:
            if not runs or runs[-1][0] != o["o_orderpriority"]:
                runs.append((o["o_orderpriority"], o["o_orderdate"]))
        rows.sort(key=lambda r: r["valid_from_us"])
        assert [(r["priority"],) for r in rows] == [(p,) for p, _ in runs]
        # intervals chain and exactly the last is open
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to_us"] == b["valid_from_us"]
            assert not a["is_current"]
        assert rows[-1]["is_current"] and rows[-1]["valid_to_us"] is None


def _chk_point_in_time_join_matches_python_interval_lookup(spark):
    """Every shipment line must resolve to exactly one SCD2 version —
    the one covering its ship date — and the per-priority counts must
    equal a pure-Python interval lookup."""
    import bisect
    import collections

    from pyspark.sql import functions as F

    from pyspark_xgboost_spark.operators.temporal import (
        dim_scd2_build,
        join_point_in_time_scd2,
    )
    from pyspark_xgboost_spark.sources import load_table
    from tests.conftest import SF_DIR

    got = {r["priority"]: r["n_lines"]
           for r in join_point_in_time_scd2(spark, SF_DIR).collect()}
    versions = collections.defaultdict(list)
    for r in dim_scd2_build(spark, SF_DIR).collect():
        versions[r["custkey"]].append(
            (r["valid_from_us"], r["valid_to_us"], r["priority"])
        )
    for vs in versions.values():
        vs.sort()
    orders = {
        r["o_orderkey"]: r["o_custkey"]
        for r in load_table(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_custkey")
        .collect()
    }
    lines = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias("us"))
        .collect()
    )
    expect = collections.Counter()
    dropped = 0
    for r in lines:
        vs = versions[orders[r["l_orderkey"]]]
        i = bisect.bisect_right([v[0] for v in vs], r["us"]) - 1
        if i < 0:
            # the generated data lets some ship dates precede the
            # order date, hence the customer's first version — those
            # facts predate the dimension and rightly drop out of the
            # inner point-in-time join
            dropped += 1
            continue
        lo, hi, prio = vs[i]
        assert lo <= r["us"] and (hi is None or r["us"] < hi)
        expect[prio] += 1
    assert got == dict(expect)
    assert sum(got.values()) + dropped == len(lines)


def _chk_ewma_matches_pandas_ewm(spark):
    """window_ewma's fixed-point expansion must equal pandas'
    ewm(alpha=0.5, adjust=True) mean for series shorter than the
    truncation depth (identical math: normalized (1-α)^k weights)."""
    import numpy as np

    from pyspark_xgboost_spark.operators import temporal

    vals = [1.00, 5.00, 2.50, 10.00, 0.25, 7.75]
    rows = [
        (1, i, f"2024-01-01 0{i}:00:00", v) for i, v in enumerate(vals)
    ]

    def fake_load(spark_, sf_dir_, table):
        df = spark_.createDataFrame(
            rows, "user_id long, event_id long, ts_s string, value double"
        )
        return df.select(
            "user_id", "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "value"
        )

    orig = temporal.load_table
    temporal.load_table = fake_load
    try:
        got = {
            r.event_id: r.ewma
            for r in temporal.window_ewma(spark, "unused").collect()
        }
    finally:
        temporal.load_table = orig
    expected = pd.Series(vals).ewm(alpha=0.5, adjust=True).mean()
    for i in range(len(vals)):
        assert got[i] == pytest.approx(expected.iloc[i], abs=1e-12)


def _chk_weighted_percentile_handmade(spark):
    """Weighted median: value 10 with weight 9 vs value 1000 with
    weight 1 — the unweighted median of the two values is irrelevant;
    cumulative weight reaches 50% (and 90%) at 10."""
    from pyspark_xgboost_spark.operators import relational

    rows = [(1, "A", 10.00, 9.0), (2, "A", 1000.00, 1.0)]

    def fake_load(spark_, sf_dir_, table):
        return spark_.createDataFrame(
            rows,
            "l_orderkey long, l_returnflag string, l_extendedprice double, "
            "l_quantity double",
        )

    orig = relational.load_table
    relational.load_table = fake_load
    try:
        out = relational.agg_weighted_percentile(spark, "unused").collect()
    finally:
        relational.load_table = orig
    assert len(out) == 1
    r = out[0]
    assert r.total_weight == 10
    assert r.p50_cents == 1000  # 10.00 in cents
    assert r.p90_cents == 1000  # cw=9, tw=10: 9*10 >= 10*9 holds at 10.00


def _chk_simhash_bands_identical_docs_hamming_zero(spark):
    """Identical docs have identical token sets, hence identical sign
    sums, hence the same 16-bit signature: they MUST pair at hamming 0."""
    from pyspark_xgboost_spark.operators import dedup

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "completely different vocabulary concerning maritime navigation signals"),
    ]

    def fake_load(spark_, sf_dir_, table):
        return spark_.createDataFrame(rows, "doc_id long, text string")

    orig = dedup.load_table
    dedup.load_table = fake_load
    try:
        got = {
            (r.doc_a, r.doc_b): r.hamming
            for r in dedup.dedup_simhash_bands(spark, "unused").collect()
        }
    finally:
        dedup.load_table = orig
    assert got.get((0, 1)) == 0


def _chk_spatial_grid_matches_bruteforce(spark):
    from tests.conftest import SF_DIR
    """The 3x3 neighbor-cell blocking must find EXACTLY the pairs a
    cross join finds — cell side == radius guarantees any pair within
    R sits in adjacent cells, so blocking loses nothing."""
    import pyspark.sql.functions as F
    from pyspark_xgboost_spark.operators.spatial import (
        _GRID, _R, _coord, join_spatial_grid,
    )
    from pyspark_xgboost_spark.sources import load_table

    got = {
        r.c_nationkey: (r.n_pairs, r.n_customers, r.min_dist2)
        for r in join_spatial_grid(spark, SF_DIR).collect()
    }
    cust = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_nationkey",
        _coord("cx", "c_custkey").alias("cx"),
        _coord("cy", "c_custkey").alias("cy"),
    )
    sup = load_table(spark, SF_DIR, "supplier").select(
        "s_suppkey",
        _coord("sx", "s_suppkey").alias("sx"),
        _coord("sy", "s_suppkey").alias("sy"),
    )
    brute = (
        cust.crossJoin(sup)
        .withColumn(
            "dist2",
            (F.col("cx") - F.col("sx")) * (F.col("cx") - F.col("sx"))
            + (F.col("cy") - F.col("sy")) * (F.col("cy") - F.col("sy")),
        )
        .filter(F.col("dist2") <= _R * _R)
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("c_custkey").alias("n_customers"),
            F.min("dist2").alias("min_dist2"),
        )
    )
    want = {
        r.c_nationkey: (r.n_pairs, r.n_customers, r.min_dist2)
        for r in brute.collect()
    }
    assert got == want
    assert want, "fixture degenerate: no pairs within radius"


def _chk_bloom_prefilter_candidates_superset_of_matches(spark):
    from tests.conftest import SF_DIR
    """Every true match must survive the Bloom prefilter (no false
    negatives), and the attested counts must show n_matched <=
    n_candidates with a sane false-positive volume."""
    from pyspark_xgboost_spark.operators.sketches import join_bloom_prefilter

    rows = join_bloom_prefilter(spark, SF_DIR).collect()
    assert rows
    total_cand = sum(r.n_candidates for r in rows)
    total_match = sum(r.n_matched for r in rows)
    assert total_match <= total_cand
    assert total_match > 0
    # m=65536, k=2, n~600 urgent keys at sf0.001 -> fpp well under 5%
    fp = total_cand - total_match
    assert fp <= 0.05 * total_cand + 10, (total_cand, total_match)


def _chk_paragraph_dedup_conserves_distinct_blocks(spark):
    from tests.conftest import SF_DIR
    """Sum of kept blocks across the corpus == number of globally
    distinct blocks, and no document keeps more than it had."""
    import pyspark.sql.functions as F
    from pyspark_xgboost_spark.operators.dedup import (
        _PARA_WORDS, dedup_paragraph_exact,
    )
    from pyspark_xgboost_spark.sources import load_table

    res = dedup_paragraph_exact(spark, SF_DIR)
    agg = res.agg(
        F.sum("n_kept").alias("kept"), F.sum("n_blocks").alias("blocks")
    ).collect()[0]
    assert all(r.n_kept <= r.n_blocks for r in res.collect())

    docs = load_table(spark, SF_DIR, "documents")
    toks = F.expr(r"filter(split(lower(text), '[ \\t\\n\\f\\r]+'), t -> t != '')")
    distinct_blocks = (
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 1)
        .select(
            F.explode(
                F.expr(
                    f"transform(sequence(0, cast((size(toks) - 1) div {_PARA_WORDS} as int)),"
                    f" i -> array_join(slice(toks, i * {_PARA_WORDS} + 1, {_PARA_WORDS}), ' '))"
                )
            ).alias("block")
        )
        .distinct()
        .count()
    )
    assert agg.kept == distinct_blocks
    assert agg.kept < agg.blocks  # fixture must actually contain dupes


def _chk_rolling_mad_constant_series_never_flags(spark):
    from tests.conftest import SF_DIR
    """MAD of a constant frame is 0 and x == med, so nothing flags —
    the robustness property that distinguishes MAD from stddev-based
    z-scores."""
    import pandas as pd
    from pyspark_xgboost_spark.operators.temporal import window_anomaly_mad

    # run the real query, then check the all-events subset where a
    # user's trailing values were constant (med == value) is unflagged
    df = window_anomaly_mad(spark, SF_DIR).toPandas()
    same = df[df.mad_micro == 0]
    flagged = same[same.is_anomaly & (same.med_micro == 0)]
    # mad == 0 and med == 0 => value must equal 0 => |x-med| == 0 => no flag
    assert len(flagged) == 0
    assert df.is_anomaly.dtype == bool


def _chk_countmin_never_underestimates(spark):
    from tests.conftest import SF_DIR
    from pyspark_xgboost_spark.operators.sketches import (
        agg_countmin_heavy_hitters,
    )

    rows = agg_countmin_heavy_hitters(spark, SF_DIR).collect()
    assert len(rows) == 20
    assert all(r.overestimate >= 0 for r in rows)
    assert all(r.cms_estimate >= r.exact_count for r in rows)


def _chk_lsh_eval_recall_perfect_on_planted_dups(spark):
    """Planted near-dups have shingle jaccard ~0.9+; with 4 bands of 2
    hashes P(miss) = (1-j^2)^4 < 1e-4, so panel recall must be total
    (or the panel holds no truth pairs at this SF)."""
    from tests.conftest import SF_DIR
    from pyspark_xgboost_spark.operators.dedup import dedup_lsh_eval_pr

    r = dedup_lsh_eval_pr(spark, SF_DIR).collect()[0]
    assert r.n_true_positives <= r.n_truth
    assert r.n_true_positives <= r.n_candidates
    assert r.recall_bp == (10000 if r.n_truth else -1)


# Pooled contract sweep (smoke-sweep discipline; see test_plans_r11):
# the hypothesis-driven properties above keep their own cases (each
# runs many drawn examples); every deterministic property fans out
# over the shared session in one case.
_POOLED_PROPERTIES = [_chk_minhash_bucket_cap_bounds_pair_expansion, _chk_minhash_b128_identical_docs_always_candidates, _chk_lsh_bucket_cap_bounds_aggregation_state, _chk_substring_dedup_degenerate_identical_corpus, _chk_connected_components_transitive_closure, _chk_quantized_aggregates_partition_invariant, _chk_funnel_partition_invariant, _chk_fuzzy_levenshtein_catches_edits_jaccard_misses, _chk_substring_dedup_matches_bruteforce, _chk_mode_exact_matches_counter, _chk_pipeline_dedup_corpus_conserves_and_matches_unionfind, _chk_scd2_versions_partition_history_exactly, _chk_point_in_time_join_matches_python_interval_lookup, _chk_ewma_matches_pandas_ewm, _chk_weighted_percentile_handmade, _chk_simhash_bands_identical_docs_hamming_zero, _chk_spatial_grid_matches_bruteforce, _chk_bloom_prefilter_candidates_superset_of_matches, _chk_paragraph_dedup_conserves_distinct_blocks, _chk_rolling_mad_constant_series_never_flags, _chk_countmin_never_underestimates, _chk_lsh_eval_recall_perfect_on_planted_dups]


# These checks monkeypatch a module-global (an operator module's
# load_table) or mutate session conf (spark.sql.shuffle.partitions)
# while they run, so they can never overlap a pooled thread — serial
# lane.
_SERIAL_PATCHERS = [_chk_quantized_aggregates_partition_invariant, _chk_funnel_partition_invariant, _chk_minhash_b128_identical_docs_always_candidates, _chk_substring_dedup_degenerate_identical_corpus, _chk_connected_components_transitive_closure, _chk_fuzzy_levenshtein_catches_edits_jaccard_misses, _chk_ewma_matches_pandas_ewm, _chk_weighted_percentile_handmade, _chk_simhash_bands_identical_docs_hamming_zero]


def test_properties_contracts_pooled(spark):
    from tests.conftest import run_pooled

    run_pooled(spark, _POOLED_PROPERTIES, serial=_SERIAL_PATCHERS)
