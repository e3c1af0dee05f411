"""Staged-copy lifecycle for the multi-format scan operators
(sources/formats.py): fingerprint keying plus garbage collection of
stale fingerprints, so a data swap invalidates derived scratch dirs
without letting /tmp grow without bound."""

from __future__ import annotations

import os
import shutil

from tests.conftest import SF_DIR


def test_stage_gc_keeps_one_copy_per_table(spark, tmp_path):
    from pyspark_xgboost_spark.sources.formats import _SCRATCH, _stage

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    shutil.copy(os.path.join(SF_DIR, "region.parquet"), data_dir / "region.parquet")

    first = _stage(spark, str(data_dir), "region", "csv")
    assert os.path.exists(os.path.join(first, "_SUCCESS"))

    # swap the data in place (same bytes, new mtime → new fingerprint)
    st = os.stat(data_dir / "region.parquet")
    os.utime(data_dir / "region.parquet", ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    second = _stage(spark, str(data_dir), "region", "csv")

    assert second != first  # new fingerprint → new staged dir
    assert not os.path.exists(first)  # stale sibling collected
    parent = os.path.join(_SCRATCH, str(data_dir).strip("/").replace("/", "_"))
    siblings = [
        n
        for n in os.listdir(parent)
        if n.startswith("region_csv_") and not n.endswith(".lock")
        # .lock files are build_lock's zero-byte flock anchors: left in
        # place on purpose (removing one a process still holds would
        # split later lockers onto a fresh inode, breaking exclusion)
    ]
    assert siblings == [os.path.basename(second)]


def test_stage_gc_leaves_other_tables_alone(spark, tmp_path):
    from pyspark_xgboost_spark.sources.formats import _stage

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    for t in ("region", "nation"):
        shutil.copy(os.path.join(SF_DIR, f"{t}.parquet"), data_dir / f"{t}.parquet")

    region = _stage(spark, str(data_dir), "region", "csv")
    nation = _stage(spark, str(data_dir), "nation", "csv")
    # re-staging region (unchanged) must not disturb either copy
    assert _stage(spark, str(data_dir), "region", "csv") == region
    assert os.path.exists(os.path.join(nation, "_SUCCESS"))


def _chk_scan_text_profile_matches_batch(spark):
    from pyspark.sql import functions as F

    from pyspark_xgboost_spark.sources import load_table
    from pyspark_xgboost_spark.sources.formats import scan_text

    row = scan_text(spark, SF_DIR).collect()[0]
    docs = load_table(spark, SF_DIR, "documents")
    toks = F.expr(r"filter(split(lower(text), '[ \\t\\n\\f\\r]+'), x -> x != '')")
    want = docs.agg(
        F.count("*").alias("n"),
        F.sum(F.length("text")).alias("chars"),
        F.sum(F.size(toks)).alias("tokens"),
    ).collect()[0]
    assert row["n_lines"] == want["n"]
    assert row["total_chars"] == want["chars"]
    assert row["total_tokens"] == want["tokens"]


def _chk_corrupt_records_are_audited_not_dropped(spark):
    """PERMISSIVE-mode ingest: corrupt lines are counted (auditable),
    good rows aggregate cleanly, nothing is silently lost."""
    from pyspark.sql import functions as F

    from pyspark_xgboost_spark.sources import load_table
    from pyspark_xgboost_spark.sources.formats import scan_json_corrupt_records

    row = scan_json_corrupt_records(spark, SF_DIR).collect()[0]
    docs = load_table(spark, SF_DIR, "documents")
    n = docs.count()
    n_corrupt = docs.filter(F.col("doc_id") % 13 == 0).count()
    assert row["n_corrupt"] == n_corrupt
    assert row["n_good"] == n - n_corrupt
    assert row["n_good"] + row["n_corrupt"] == n  # nothing lost


def _chk_gzip_stage_writes_gz_files_and_reads_back(spark):
    import os

    from pyspark_xgboost_spark.sources.formats import (
        _stage_gzip_csv,
        scan_csv_gzip,
    )
    from tests.conftest import SF_DIR

    path = _stage_gzip_csv(spark, SF_DIR, "orders")
    gz = [f for f in os.listdir(path) if f.endswith(".csv.gz")]
    assert gz  # the staged landing zone is genuinely gzip
    n = scan_csv_gzip(spark, SF_DIR).agg({"n_orders": "sum"}).collect()[0][0]
    from pyspark_xgboost_spark.sources import load_table

    assert n == load_table(spark, SF_DIR, "orders").count()


def _chk_python_datasource_roundtrip_and_parallelism(spark):
    from pyspark_xgboost_spark.sources import load_table
    from pyspark_xgboost_spark.sources.formats import (
        _DOCBIN_SHARDS,
        _stage_docbin,
        scan_python_datasource,
    )
    from tests.conftest import SF_DIR

    import os

    path = _stage_docbin(SF_DIR)
    shards = [f for f in os.listdir(path) if f.endswith(".docbin")]
    assert len(shards) == _DOCBIN_SHARDS
    # per-row binary round trip, not just the aggregate
    try:
        spark.dataSource.register(
            __import__(
                "pyspark_xgboost_spark.sources.formats", fromlist=["DocBinDataSource"]
            ).DocBinDataSource
        )
    except Exception:
        pass
    back = (
        spark.read.format("docbin").option("path", path).load().collect()
    )
    src = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "n_chars"
    ).collect()
    assert {tuple(r) for r in back} == {tuple(r) for r in src}
    # one InputPartition per shard file = real scan parallelism
    rdd_parts = (
        spark.read.format("docbin").option("path", path).load().rdd.getNumPartitions()
    )
    assert rdd_parts == _DOCBIN_SHARDS
    # and the registered query agrees with the source table
    n = sum(r["n_docs"] for r in scan_python_datasource(spark, SF_DIR).collect())
    assert n == len(src)


def _chk_compaction_shrinks_file_count_content_neutral(spark):
    import os

    from pyspark_xgboost_spark.sources.formats import (
        _COMPACT_TARGET,
        _SCRATCH,
        sink_compact_small_files,
        src_fingerprint,
    )
    from pyspark_xgboost_spark.sources import load_table
    from tests.conftest import SF_DIR

    rows = sink_compact_small_files(spark, SF_DIR).collect()
    key = SF_DIR.strip("/").replace("/", "_")
    fp = src_fingerprint(SF_DIR, "lineitem")

    def n_parquet(leaf):
        d = os.path.join(_SCRATCH, key, leaf)
        return sum(f.endswith(".parquet") for f in os.listdir(d))

    assert n_parquet(f"li_frag_{fp}") == 64
    assert n_parquet(f"li_compact_{fp}") == _COMPACT_TARGET
    assert sum(r["n"] for r in rows) == load_table(spark, SF_DIR, "lineitem").count()


def _chk_schema_evolution_nulls_only_in_legacy_files(spark):
    from pyspark.sql import functions as F

    from pyspark_xgboost_spark.sources.formats import (
        scan_schema_evolution_merge,
        _SCRATCH,
        src_fingerprint,
    )
    from pyspark_xgboost_spark.sources import load_table
    from tests.conftest import SF_DIR

    import os

    rows = scan_schema_evolution_merge(spark, SF_DIR).collect()
    orders = load_table(spark, SF_DIR, "orders")
    assert sum(r["n"] for r in rows) == orders.count()
    key = SF_DIR.strip("/").replace("/", "_")
    root = os.path.join(
        _SCRATCH, key, f"orders_evo_{src_fingerprint(SF_DIR, 'orders')}"
    )
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(root, "v1"), os.path.join(root, "v2")
    )
    assert set(merged.columns) == {
        "o_orderkey", "o_orderstatus", "o_orderdate",
        "o_totalprice", "o_orderpriority",
    }
    cutoff = F.lit("1998-01-01").cast("timestamp")
    # evolution boundary: the new column is NULL exactly on legacy rows
    assert merged.filter(
        (F.col("o_orderdate") < cutoff) & F.col("o_orderpriority").isNotNull()
    ).count() == 0
    assert merged.filter(
        (F.col("o_orderdate") >= cutoff) & F.col("o_orderpriority").isNull()
    ).count() == 0


def _chk_metadata_hidden_column_counts_staged_files(spark):
    """Spark's _metadata hidden column: per-file provenance without a
    path column in the data — counted over the 64-file fragmented
    staging, where it genuinely discriminates."""
    from pyspark.sql import functions as F

    from pyspark_xgboost_spark.sources.formats import (
        _SCRATCH,
        sink_compact_small_files,
        src_fingerprint,
    )
    from tests.conftest import SF_DIR

    import os

    sink_compact_small_files(spark, SF_DIR)  # ensures both stagings exist
    key = SF_DIR.strip("/").replace("/", "_")
    frag = os.path.join(
        _SCRATCH, key, f"li_frag_{src_fingerprint(SF_DIR, 'lineitem')}"
    )
    per_file = (
        spark.read.parquet(frag)
        .groupBy(F.col("_metadata.file_path").alias("f"))
        .count()
        .collect()
    )
    assert len(per_file) == 64
    assert sum(r["count"] for r in per_file) == spark.read.parquet(frag).count()


def _chk_zorder_buckets_have_2d_locality(spark):
    """The Morton-key bucketing must (a) interleave bits exactly like
    the Python reference and (b) give each bucket a day-range at most
    ~a quarter of the global span (the top three z bits contain two
    y-bits), which is precisely the footer-stats pruning win."""
    from pyspark_xgboost_spark.sources.formats import (
        _z_interleave_sql,
        sink_zorder_cluster,
    )

    # (a) expression == python bit interleave on probe values
    probes = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(probes, "x long, y long").selectExpr(
        "x", "y", f"CAST({_z_interleave_sql('x', 'y', div='div')} AS BIGINT) AS z"
    )

    def ref(x, y):
        z = 0
        for b in range(16):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    for r in df.collect():
        assert r.z == ref(r.x, r.y)

    # (b) locality of the written buckets
    rows = sink_zorder_cluster(spark, SF_DIR).collect()
    assert len(rows) >= 4
    gmin = min(r.min_day for r in rows)
    gmax = max(r.max_day for r in rows)
    span = gmax - gmin
    for r in rows:
        assert (r.max_day - r.min_day) <= span // 4 + 2


def _chk_python_datasource_stream_exactly_once_offsets(spark):
    """Two+ staged micro-batches over the docbin stream reader must
    partition the shard range with no overlap and no gap: every record
    arrives exactly once and committed offsets advance monotonically."""
    import ast
    import tempfile

    from pyspark_xgboost_spark.sources import load_table
    from pyspark_xgboost_spark.sources.formats import (
        _DOCBIN_SHARDS,
        DocBinDataSource,
        _stage_docbin,
    )
    from tests.conftest import SF_DIR

    path = _stage_docbin(SF_DIR)
    try:
        spark.dataSource.register(DocBinDataSource)
    except Exception:
        pass
    docs = (
        spark.readStream.format("docbin")
        .option("path", path)
        .option("batchfiles", "3")  # 8 shards -> batches of 3,3,2
        .load()
    )
    ckpt = tempfile.mkdtemp(prefix="docbin_ckpt_test_")
    q = (
        docs.writeStream.outputMode("append")
        .format("memory")
        .queryName("docbin_stream_test")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    import time

    def _idx(o):
        if o is None:
            return None
        d = ast.literal_eval(o) if isinstance(o, str) else o
        return None if d is None else int(d["file_idx"])

    deadline = time.time() + 120
    while time.time() < deadline:
        p = q.lastProgress
        if p and p.get("sources") and _idx(p["sources"][0].get("endOffset")) == _DOCBIN_SHARDS:
            break
        time.sleep(0.1)
    progresses = [
        (
            _idx(p["sources"][0].get("startOffset")),
            _idx(p["sources"][0].get("endOffset")),
            p["sources"][0]["numInputRows"],
        )
        for p in q.recentProgress
        if p.get("sources")
    ]
    q.stop()
    q.awaitTermination()

    # the initial batch reports startOffset=None, so pin the contract on
    # the committed endOffset sequence: strictly increasing (no shard
    # re-read), >=2 data-bearing batches, final offset = all shards
    ends = [e for _s, e, n in progresses if n > 0 and e is not None]
    assert len(ends) >= 2
    assert ends == sorted(set(ends))
    assert ends[-1] == _DOCBIN_SHARDS

    got = spark.table("docbin_stream_test").collect()
    src = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "source", "n_chars")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, src))  # exactly once


def test_python_datasource_writer_two_phase_commit(spark, tmp_path):
    """The docbin writer must leave ONLY committed .docbin shards (no
    .tmp residue), a _DONE marker with the exact row count, and a
    byte-identical read-back through the batch reader."""
    from pyspark_xgboost_spark.sources import load_table
    from pyspark_xgboost_spark.sources.formats import DocBinDataSource
    from tests.conftest import SF_DIR

    try:
        spark.dataSource.register(DocBinDataSource)
    except Exception:
        pass
    out = str(tmp_path / "docbin_out")
    src = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "n_chars"
    )
    src.repartition(5).write.format("docbin").mode("overwrite").option(
        "path", out
    ).save()

    files = os.listdir(out)
    assert not [f for f in files if f.endswith(".tmp")]
    shards = [f for f in files if f.endswith(".docbin")]
    assert len(shards) == 5  # one committed shard per writer task
    with open(os.path.join(out, "_DONE")) as fh:
        assert int(fh.read()) == src.count()

    back = spark.read.format("docbin").option("path", out).load().collect()
    assert sorted(map(tuple, back)) == sorted(map(tuple, src.collect()))


# Pooled contract sweep (smoke-sweep discipline; see test_plans_r11).
_POOLED_CHECKS_SOURCES = [_chk_scan_text_profile_matches_batch, _chk_corrupt_records_are_audited_not_dropped, _chk_gzip_stage_writes_gz_files_and_reads_back, _chk_python_datasource_roundtrip_and_parallelism, _chk_compaction_shrinks_file_count_content_neutral, _chk_schema_evolution_nulls_only_in_legacy_files, _chk_metadata_hidden_column_counts_staged_files, _chk_zorder_buckets_have_2d_locality, _chk_python_datasource_stream_exactly_once_offsets]


def test_sources_contracts_pooled(spark):
    from tests.conftest import run_pooled

    run_pooled(spark, _POOLED_CHECKS_SOURCES)
