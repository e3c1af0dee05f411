"""Deterministic sampling/split operators (operators/sampling.py)."""

from pyspark_xgboost_spark.operators import sampling
from tests.conftest import SF_DIR


def test_split_is_deterministic_and_complete(spark):
    a = {r["doc_id"]: r["split"] for r in sampling.split_hash_train_test(spark, SF_DIR).collect()}
    b = {r["doc_id"]: r["split"] for r in sampling.split_hash_train_test(spark, SF_DIR).collect()}
    assert a == b
    assert set(a.values()) <= {"train", "val", "test"}
    n = len(a)
    train_frac = sum(1 for v in a.values() if v == "train") / n
    # 80% nominal; wide tolerance at sf0.001 row counts
    assert 0.6 < train_frac < 0.95


def test_sample_subset_and_plan_has_no_shuffle(spark):
    full = sampling.sample_hash_bucket(spark, SF_DIR)
    ids = [r["doc_id"] for r in full.collect()]
    assert ids == sorted(set(ids), key=ids.index)  # no dup rows
    plan = full._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure scan+filter+project


def test_mixture_keeps_all_english(spark):
    kept = {r["lang"]: r["n_kept"] for r in sampling.mix_sources_weighted(spark, SF_DIR).collect()}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    en_total = docs.filter("lang = 'en'").count()
    assert kept.get("en", 0) == en_total
    for lang, n in kept.items():
        if lang != "en":
            assert n <= docs.filter(f"lang = '{lang}'").count()


def test_length_buckets_are_contiguous(spark):
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


def test_sample_topk_hash_is_takeordered_and_stable(spark):
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


def test_shard_shuffle_contiguous_positions(spark):
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
