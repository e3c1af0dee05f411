"""Multimodal-column plumbing (LLM-data-pipeline surface).

Images/audio/video ride through Spark as opaque ``binary`` columns with
typed metadata structs; decode/feature-extraction runs in Arrow-batched
``mapInPandas``. The decode kernels themselves are STUBBED with a
deterministic fake (this container ships no image/audio codecs — the
Spark-side plumbing: schema, batch shape, partitioning, UDF signatures,
is real and tested). A production build drops PIL/librosa into
``_decode_image_stub`` and nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_xgboost_spark.registry import register
from pyspark_xgboost_spark.sources import load_table


@register(
    "multimodal_pack",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           lang AS meta_lang,
           source AS meta_source,
           CAST(n_chars AS BIGINT) AS meta_n_chars
    FROM documents
    """,
)
def multimodal_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack content into (binary payload, metadata) shape — the storage
    contract for multimodal corpora: payload stays opaque bytes, metadata
    stays columnar/prunable."""
    docs = load_table(spark, sf_dir, "documents")
    packed = docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
            F.col("n_chars").alias("n_chars"),
        ).alias("meta"),
    )
    return packed.select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        F.col("meta.lang").alias("meta_lang"),
        F.col("meta.source").alias("meta_source"),
        F.col("meta.n_chars").cast("long").alias("meta_n_chars"),
    )


def _decode_image_stub(payload: bytes, dim: int = 8) -> np.ndarray:
    """STUB decode: deterministic pseudo-features from the payload
    digest. Production: PIL.Image.open(BytesIO(payload)) → resize →
    normalized pixel tensor. NotImplementedError intentionally NOT
    raised — the fake keeps the pipeline testable end-to-end."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype=np.uint8)
    return (raw.astype(np.float32) / 255.0)[: dim]


@register(
    "multimodal_decode_features",
    oracle="""
    SELECT doc_id,
           8 AS feat_dim,
           substr(sha256(text), 1, 16) AS feat_hex,
           CAST(list_sum(list_transform(generate_series(0, 7),
                i -> (position(substr(sha256(text), 2*i+1, 1) IN '0123456789abcdef') - 1) * 16
                   + (position(substr(sha256(text), 2*i+2, 1) IN '0123456789abcdef') - 1)))
                AS INT) AS feat_byte_sum
    FROM documents
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary → fixed-dim feature vector via mapInPandas. Batch shape,
    schema, and float32 vectors are the real contract; only the pixel
    decode is faked (see _decode_image_stub). The emitted columns are
    scalar summaries of the decoded vector — its dimension, the digest
    bytes it derives from, and the exact integer sum of those bytes —
    so downstream comparison/canonicalization never sees a nested
    (unhashable) cell while the decode path is still fully exercised."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, dims, hexes, sums = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(p)
                feats = _decode_image_stub(payload)
                raw = hashlib.sha256(payload).digest()[: len(feats)]
                ids.append(doc_id)
                dims.append(len(feats))
                hexes.append(raw.hex())
                sums.append(int(sum(raw)))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "feat_dim": dims,
                    "feat_hex": hexes,
                    "feat_byte_sum": sums,
                }
            )

    return docs.mapInPandas(
        decode, "doc_id long, feat_dim int, feat_hex string, feat_byte_sum int"
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(i AS INTEGER) AS frame_no,
           md5(substr(text, CAST(i * 64 + 1 AS BIGINT), 16)) AS frame_digest
    FROM (
      SELECT doc_id, text,
             unnest(generate_series(0, CAST(floor((length(text) - 1) / 64) AS BIGINT))) AS i
      FROM documents WHERE length(text) > 0
    )
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Video' frame sampling: every k-th 16-byte slice of the payload is
    one 'frame'; emits (doc_id, frame_no, frame_digest). The explode
    pattern — one input row fanning to N frame rows inside mapInPandas —
    is exactly how real video sampling distributes."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        stride, frame_len = 64, 16
        for pdf in batches:
            ids, frame_nos, digests = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                for n, off in enumerate(range(0, len(data), stride)):
                    ids.append(doc_id)
                    frame_nos.append(n)
                    digests.append(hashlib.md5(data[off : off + frame_len]).hexdigest())
            yield pd.DataFrame({"doc_id": ids, "frame_no": frame_nos, "frame_digest": digests})

    return docs.mapInPandas(sample, "doc_id long, frame_no int, frame_digest string")


_RESIZE_TARGET = 256


@register("multimodal_resize")
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Resize' the binary payload to a bounded size (crop-style stub:
    first 256 bytes; production swaps in PIL thumbnail/resample) —
    binary in, binary out through Arrow-batched mapInPandas with the
    metadata struct updated alongside. Rows-only: DuckDB cannot slice
    BLOBs, so the byte-exact goldens live in tests/test_relational.py
    (digest of resized payload vs hashlib on the raw bytes).

    Scale shape: narrow op, no shuffle; output bytes are bounded so a
    downstream cache/broadcast of thumbnails is safely sized."""
    docs = load_table(spark, sf_dir, "documents")
    packed = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            resized = [bytes(p)[:_RESIZE_TARGET] for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "out_bytes": [len(r) for r in resized],
                    "resized": resized,
                    "digest": [hashlib.md5(r).hexdigest() for r in resized],
                }
            )

    return packed.mapInPandas(
        resize,
        "doc_id long, orig_bytes long, out_bytes long, resized binary, digest string",
    )


@register(
    "multimodal_arrow_byte_stats",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT)
             AS n_spaces
    FROM documents
    """,
)
def multimodal_arrow_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level payload statistics via mapInArrow — the Arrow-NATIVE
    batch path: RecordBatches flow from the JVM straight into
    vectorized pyarrow.compute kernels (binary_length,
    count_substring) with ZERO pandas materialization — for opaque
    binary columns (media payloads) the pandas object-dtype detour of
    mapInPandas copies every blob into Python objects; mapInArrow
    keeps them in Arrow buffers end to end. This is the intended decode
    fast path for the multimodal family once real codecs enter the
    picture (feed the Arrow buffer pointers to the codec, never a
    Python bytes copy).

    n_spaces counts 0x20 bytes — equal to character-level spaces under
    UTF-8 (no multi-byte sequence contains 0x20), which is what the
    oracle pins from the text side. Map-only: no shuffle at any
    scale."""
    import pyarrow as pa

    packed = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def byte_stats(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow.compute as pc

        for batch in batches:
            payload = batch.column("payload")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.binary_length(payload), pa.int64()),
                    pc.cast(pc.count_substring(payload, b" "), pa.int64()),
                ],
                names=["doc_id", "n_bytes", "n_spaces"],
            )

    return packed.mapInArrow(
        byte_stats, "doc_id long, n_bytes long, n_spaces long"
    )
