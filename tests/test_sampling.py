"""Deterministic sampling/split operators (operators/sampling.py)."""

from pyspark_xgboost_spark.operators import sampling
from tests.conftest import SF_DIR


def _chk_split_is_deterministic_and_complete(spark):
    a = {r["doc_id"]: r["split"] for r in sampling.split_hash_train_test(spark, SF_DIR).collect()}
    b = {r["doc_id"]: r["split"] for r in sampling.split_hash_train_test(spark, SF_DIR).collect()}
    assert a == b
    assert set(a.values()) <= {"train", "val", "test"}
    n = len(a)
    train_frac = sum(1 for v in a.values() if v == "train") / n
    # 80% nominal; wide tolerance at sf0.001 row counts
    assert 0.6 < train_frac < 0.95


def _chk_sample_subset_and_plan_has_no_shuffle(spark):
    full = sampling.sample_hash_bucket(spark, SF_DIR)
    ids = [r["doc_id"] for r in full.collect()]
    assert ids == sorted(set(ids), key=ids.index)  # no dup rows
    plan = full._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure scan+filter+project


def _chk_mixture_keeps_all_english(spark):
    kept = {r["lang"]: r["n_kept"] for r in sampling.mix_sources_weighted(spark, SF_DIR).collect()}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    en_total = docs.filter("lang = 'en'").count()
    assert kept.get("en", 0) == en_total
    for lang, n in kept.items():
        if lang != "en":
            assert n <= docs.filter(f"lang = '{lang}'").count()


def _chk_length_buckets_are_contiguous(spark):
    rows = sorted(
        sampling.length_bucket_equal_freq(spark, SF_DIR).collect(),
        key=lambda r: r["bucket"],
    )
    assert [r["bucket"] for r in rows] == list(range(1, 9))
    for lo, hi in zip(rows, rows[1:]):
        assert lo["max_chars"] <= hi["min_chars"]
    total = sum(r["n_docs"] for r in rows)
    assert max(r["n_docs"] for r in rows) - min(r["n_docs"] for r in rows) <= 1
    assert total == spark.read.parquet(f"{SF_DIR}/documents.parquet").count()


def _chk_sample_topk_hash_is_takeordered_and_stable(spark):
    from pyspark_xgboost_spark.operators.sampling import sample_topk_hash

    df = sample_topk_hash(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    a = [r["doc_id"] for r in df.collect()]
    assert len(a) == 100 and len(set(a)) == 100
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = [r["doc_id"] for r in sample_topk_hash(spark, SF_DIR).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b  # same sample under any layout


def _chk_shard_shuffle_contiguous_positions(spark):
    from pyspark_xgboost_spark.operators.sampling import (
        _N_SHARDS,
        shard_shuffle_deterministic,
    )
    from pyspark_xgboost_spark.sources import load_table

    rows = shard_shuffle_deterministic(spark, SF_DIR).collect()
    assert len(rows) == load_table(spark, SF_DIR, "documents").count()
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r["shard"] < _N_SHARDS
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        poss.sort()
        assert poss == list(range(1, len(poss) + 1)), shard  # dense ranks


def _chk_weighted_priority_sample_matches_hand_formula(spark):
    rows = sampling.sample_weighted_priority(spark, SF_DIR).collect()
    assert len(rows) == sampling._PRI_K  # sf0.001 has 500 docs > k
    import hashlib

    def pri(doc_id, n_chars):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        return (float(n_chars) * 4294967296.0) / (h + 1)

    # every returned priority matches the hash formula bit-for-bit
    for r in rows:
        assert r["priority"] == pri(r["doc_id"], r["n_chars"])
    # the selected set IS the top-k by (priority, doc_id)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "n_chars"
    ).collect()
    allp = sorted(
        ((pri(d["doc_id"], d["n_chars"]), d["doc_id"]) for d in docs),
        key=lambda t: (-t[0], t[1]),
    )
    expect_ids = {doc_id for _, doc_id in allp[: sampling._PRI_K]}
    assert {r["doc_id"] for r in rows} == expect_ids
    # estimator: est_weight = max(w, tau) with tau = the (k+1)-th priority
    tau = allp[sampling._PRI_K][0]
    for r in rows:
        assert r["est_weight"] == max(float(r["n_chars"]), tau)


def _chk_weighted_priority_topk_plan_uses_takeordered(spark):
    plan = (
        sampling.sample_weighted_priority(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def _chk_mixture_epochs_budget_and_formula(spark):
    rows = sampling.corpus_mixture_epochs(spark, SF_DIR).collect()
    assert rows and len(rows) == len({r["source"] for r in rows})
    total = sum(r["available_chars"] for r in rows)
    budget = total * sampling._MIX_BUDGET_MULT
    # basis-point weights cover the tier map exactly
    for r in rows:
        tier = int(r["source"][3:]) % 4
        assert r["weight_bp"] == sampling._MIX_TIER_BP[tier]
        assert r["target_chars"] == budget * r["weight_bp"] // 10000
        a, b = r["target_chars"] * 1000, r["available_chars"]
        assert r["epochs_milli"] == (a + b - 1) // b
    # floor division loses at most one char per source vs the budget
    assert 0 <= budget - sum(r["target_chars"] for r in rows) < 10000


# Pooled contract sweep (smoke-sweep discipline; see test_plans_r11).
_POOLED_CHECKS_SAMPLING = [_chk_split_is_deterministic_and_complete, _chk_sample_subset_and_plan_has_no_shuffle, _chk_mixture_keeps_all_english, _chk_length_buckets_are_contiguous, _chk_sample_topk_hash_is_takeordered_and_stable, _chk_shard_shuffle_contiguous_positions, _chk_weighted_priority_sample_matches_hand_formula, _chk_weighted_priority_topk_plan_uses_takeordered, _chk_mixture_epochs_budget_and_formula]


# session-conf mutators run in the serial lane
def test_sampling_contracts_pooled(spark):
    from tests.conftest import run_pooled

    run_pooled(spark, _POOLED_CHECKS_SAMPLING, serial=[_chk_sample_topk_hash_is_takeordered_and_stable])
