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
from pyspark.sql import Window as W
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


@register(
    "multimodal_resize",
    oracle=f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS orig_bytes,
           CAST(least(octet_length(encode(text)), {_RESIZE_TARGET}) AS BIGINT)
             AS out_bytes,
           substr(hex(encode(text)), 1, {2 * _RESIZE_TARGET}) AS resized_hex,
           md5(substr(hex(encode(text)), 1, {2 * _RESIZE_TARGET})) AS digest
    FROM documents
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Resize' the binary payload to a bounded size (crop-style stub:
    first {_RESIZE_TARGET} bytes; production swaps in PIL
    thumbnail/resample) — binary in, binary transformed through an
    Arrow-batched mapInPandas kernel with the metadata updated
    alongside. Oracle-attested POSITIONALLY (r10 verdict task): DuckDB
    1.0 cannot slice or md5 BLOBs, so the resized payload crosses the
    engine boundary as its uppercase hex encoding — byte-exact, since
    substr(hex(payload), 1, 2k) IS the first k bytes — and the digest
    is md5 over that hex string (VARCHAR md5 exists in both engines).
    The byte-level goldens in tests/test_relational.py additionally pin
    the hex back to the raw payload bytes via bytes.fromhex.

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
                    "resized_hex": [r.hex().upper() for r in resized],
                }
            )

    return packed.mapInPandas(
        resize,
        "doc_id long, orig_bytes long, out_bytes long, resized_hex string",
    ).withColumn("digest", F.md5(F.col("resized_hex")))


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


_PHASH_BANDS = 4  # 64-bit hash as four 16-bit band words (63-bit-safe)
_PHASH_MAX_HAMMING = 6
_PHASH_EVAL_PANEL = 500  # fixed truth panel: doc_id < 500 (dedup_lsh_eval_pr)


def _thumb_hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Shared pHash kernel (dedup + recall eval use the SAME bytes):
    strided 64-codepoint downsample -> mean threshold -> four 16-bit
    band words. Empty payloads hash to all-zero words, matching the
    oracle's ascii('') = 0 path (text[-1] indexing would crash the
    job non-gracefully on n == 0)."""
    for pdf in batches:
        out = {"doc_id": [], "w0": [], "w1": [], "w2": [], "w3": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            text = bytes(payload).decode("utf-8")
            n = len(text)
            if n == 0:
                px = [0] * 64
            else:
                stride = max(1, n // 64)
                px = [ord(text[min(i * stride, n - 1)]) for i in range(64)]
            mean = sum(px) // 64
            bits = [1 if p > mean else 0 for p in px]
            words = []
            for w in range(_PHASH_BANDS):
                word = 0
                for k in range(16):
                    word |= bits[16 * w + k] << k
                words.append(word)
            out["doc_id"].append(doc_id)
            for w in range(_PHASH_BANDS):
                out[f"w{w}"].append(words[w])
        yield pd.DataFrame(out)


def _phash_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return docs.mapInPandas(
        _thumb_hash, "doc_id long, w0 long, w1 long, w2 long, w3 long"
    ).localCheckpoint(eager=True)


@register(
    "multimodal_phash_dedup",
    oracle=f"""
    WITH px AS (
      SELECT doc_id, g.i,
             ascii(substr(text,
                   CAST(least(1 + g.i * greatest(1, length(text) // 64),
                              length(text)) AS INTEGER), 1)) AS p
      FROM documents, unnest(generate_series(0, 63)) AS g(i)
    ),
    m AS (SELECT doc_id, sum(p) // 64 AS mean FROM px GROUP BY doc_id),
    bits AS (
      SELECT px.doc_id, px.i,
             CASE WHEN px.p > m.mean THEN 1 ELSE 0 END AS b
      FROM px JOIN m USING (doc_id)
    ),
    words AS (
      SELECT doc_id, i // 16 AS w,
             CAST(sum(b * (1::BIGINT << (i % 16))) AS BIGINT) AS word
      FROM bits GROUP BY doc_id, i // 16
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM words a JOIN words b
        ON a.w = b.w AND a.word = b.word AND a.doc_id < b.doc_id
    ),
    wa AS (SELECT doc_id, list(word ORDER BY w) AS ws FROM words
           GROUP BY doc_id)
    SELECT c.doc_a, c.doc_b,
           CAST(bit_count(xor(x.ws[1], y.ws[1]))
              + bit_count(xor(x.ws[2], y.ws[2]))
              + bit_count(xor(x.ws[3], y.ws[3]))
              + bit_count(xor(x.ws[4], y.ws[4])) AS BIGINT) AS hamming
    FROM cand c
    JOIN wa x ON x.doc_id = c.doc_a
    JOIN wa y ON y.doc_id = c.doc_b
    WHERE hamming <= {_PHASH_MAX_HAMMING}
    """,
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCEPTUAL-HASH NEAR-DUP DETECTION over the binary payload
    column — the image-dedup shape (pHash: downsample, threshold
    against the mean, compare by Hamming distance) run through the
    multimodal plumbing: payload bytes enter an Arrow-batched
    mapInPandas decode kernel that builds an 8x8 'thumbnail' by
    STRIDED DOWNSAMPLING (64 evenly spaced codepoints — the honest
    stand-in for pixel pooling: near-duplicate payloads produce
    near-identical thumbnails, so their hashes land within a few
    bits, exactly how pHash behaves on resized/re-encoded images; a
    production build swaps the kernel body for PIL resize + DCT and
    nothing downstream changes). The 64-bit hash travels as FOUR
    16-bit band words (63-bit-safe bit ops both engines agree on),
    candidates come from a BANDED self-join (any shared band word —
    the LSH trick: by pigeonhole a pair within Hamming distance 3 is
    GUARANTEED to agree on at least one of the 4 bands; distances 4-6
    are found with high probability when the differing bits cluster,
    the standard banded-LSH recall trade, and BOTH engines apply the
    identical candidate rule so the oracle pins the operator's actual
    semantics), and only candidates pay the Hamming verification.

    Scale shape: hash computation is map-only Arrow batches; the
    band join shuffles (band, word) keys — collisions, not all
    pairs (O(n^2 / 2^16) per band random background + true dups);
    verification is per-candidate bit_count, exact integers
    end-to-end. The same plan at 100 TB: thumbnails are a tiny
    fixed-width projection of arbitrarily large payloads, so the
    shuffle never carries the media bytes."""
    hashes = _phash_words(spark, sf_dir)

    bands = hashes.select(
        "doc_id",
        F.posexplode(F.array("w0", "w1", "w2", "w3")).alias("w", "word"),
    )
    a = bands.select(
        F.col("w"), F.col("word"), F.col("doc_id").alias("doc_a")
    )
    b = bands.select(
        F.col("w"), F.col("word"), F.col("doc_id").alias("doc_b")
    )
    cand = (
        a.join(b, ["w", "word"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    x = hashes.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"w{w}").alias(f"xa{w}") for w in range(_PHASH_BANDS)],
    )
    y = hashes.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"w{w}").alias(f"xb{w}") for w in range(_PHASH_BANDS)],
    )
    ham = sum(
        F.bit_count(F.expr(f"xa{w} ^ xb{w}")) for w in range(_PHASH_BANDS)
    ).cast("long")
    return (
        cand.join(x, "doc_a")
        .join(y, "doc_b")
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= _PHASH_MAX_HAMMING)
    )


@register(
    "multimodal_phash_recall_eval",
    oracle=f"""
    WITH px AS (
      SELECT doc_id, g.i,
             ascii(substr(text,
                   CAST(least(1 + g.i * greatest(1, length(text) // 64),
                              length(text)) AS INTEGER), 1)) AS p
      FROM documents, unnest(generate_series(0, 63)) AS g(i)
    ),
    m AS (SELECT doc_id, sum(p) // 64 AS mean FROM px GROUP BY doc_id),
    bits AS (
      SELECT px.doc_id, px.i,
             CASE WHEN px.p > m.mean THEN 1 ELSE 0 END AS b
      FROM px JOIN m USING (doc_id)
    ),
    words AS (
      SELECT doc_id, i // 16 AS w,
             CAST(sum(b * (1::BIGINT << (i % 16))) AS BIGINT) AS word
      FROM bits GROUP BY doc_id, i // 16
    ),
    wa AS (SELECT doc_id, list(word ORDER BY w) AS ws FROM words
           GROUP BY doc_id),
    pairs AS (
      SELECT bit_count(xor(x.ws[1], y.ws[1]))
             + bit_count(xor(x.ws[2], y.ws[2]))
             + bit_count(xor(x.ws[3], y.ws[3]))
             + bit_count(xor(x.ws[4], y.ws[4])) AS hamming,
             CASE WHEN x.ws[1] = y.ws[1] OR x.ws[2] = y.ws[2]
                       OR x.ws[3] = y.ws[3] OR x.ws[4] = y.ws[4]
                  THEN 1 ELSE 0 END AS is_candidate
      FROM wa x JOIN wa y
        ON x.doc_id < y.doc_id AND x.doc_id < {_PHASH_EVAL_PANEL}
    )
    SELECT CAST(hamming AS BIGINT) AS hamming,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(is_candidate) AS BIGINT) AS n_candidates,
           CAST(floor(sum(is_candidate) * 1000000.0 / count(*)) AS BIGINT)
             AS recall_micro,
           CAST(CASE WHEN hamming <= 3 THEN 1 ELSE 0 END AS INTEGER)
             AS recall_guaranteed
    FROM pairs
    WHERE hamming <= {_PHASH_MAX_HAMMING}
    GROUP BY hamming
    """,
)
def multimodal_phash_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BANDED-LSH RECALL EVALUATION for the pHash index — measures,
    per Hamming distance, what fraction of panel-anchored
    <= {_PHASH_MAX_HAMMING}-distant pairs the 4x16-bit band join
    surfaces as candidates: the honest recall curve behind
    multimodal_phash_dedup. Distances <= 3 are GUARANTEED 1e6 recall
    by pigeonhole (4 bands, at most 3 differing bits — one band must
    be untouched; the recall_guaranteed flag pins the theorem
    row-by-row); 4-6 is the probabilistic zone where recall depends
    on whether the differing bits cluster into few bands. A
    production index reads this table to decide band geometry (8x8
    bands push the guarantee to distance 7 at higher candidate cost).

    Scale shape: ground truth is PANEL x CORPUS, never corpus
    all-pairs — the anchor side is the fixed
    doc_id < {_PHASH_EVAL_PANEL} evaluation panel (the
    dedup_lsh_eval_pr panel discipline; pair (a, b) counts when a is
    a panel doc and a < b), so the pair count grows LINEARLY in
    corpus size with a constant panel factor. Both sides are the
    fixed-width (8 bytes/doc) hash projection from the shared
    _phash_words kernel, the panel side broadcast; floored micro
    ratios keep the report cast-rule-proof (Spark's double->BIGINT
    truncates, DuckDB's rounds)."""
    hashes = _phash_words(spark, sf_dir)
    x = hashes.filter(F.col("doc_id") < _PHASH_EVAL_PANEL).select(
        F.col("doc_id").alias("da"),
        *[F.col(f"w{w}").alias(f"xa{w}") for w in range(_PHASH_BANDS)],
    )
    y = hashes.select(
        F.col("doc_id").alias("db"),
        *[F.col(f"w{w}").alias(f"xb{w}") for w in range(_PHASH_BANDS)],
    )
    ham = sum(
        F.bit_count(F.expr(f"xa{w} ^ xb{w}")) for w in range(_PHASH_BANDS)
    ).cast("bigint")
    cand = (
        F.when(F.col("xa0") == F.col("xb0"), 1)
        .when(F.col("xa1") == F.col("xb1"), 1)
        .when(F.col("xa2") == F.col("xb2"), 1)
        .when(F.col("xa3") == F.col("xb3"), 1)
        .otherwise(0)
    )
    pairs = (
        F.broadcast(x)
        .crossJoin(y)
        .filter(F.col("da") < F.col("db"))
        .select(ham.alias("hamming"), cand.alias("is_candidate"))
        .filter(F.col("hamming") <= _PHASH_MAX_HAMMING)
    )
    return pairs.groupBy("hamming").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum("is_candidate").cast("bigint").alias("n_candidates"),
        F.floor(F.sum("is_candidate") * 1000000 / F.count("*"))
        .cast("bigint")
        .alias("recall_micro"),
        F.when(F.first("hamming") <= 3, 1)
        .otherwise(0)
        .cast("int")
        .alias("recall_guaranteed"),
    )


_AF_W = 64  # samples per analysis frame (non-overlapping)


@register(
    "multimodal_audio_energy_vad",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, i,
             (ascii(substr(text, CAST(i AS INTEGER), 1)) % 256) - 128 AS s,
             (i - 1) // {_AF_W} AS frame_idx
      FROM documents, LATERAL unnest(range(1, len(text) + 1)) AS u(i)
      WHERE (i - 1) // {_AF_W} < len(text) // {_AF_W}
    ),
    pairs AS (
      SELECT doc_id, frame_idx, s,
             CASE WHEN i % {_AF_W} <> 0
                  AND s * lead(s) OVER (PARTITION BY doc_id ORDER BY i) < 0
                  THEN 1 ELSE 0 END AS zc
      FROM pos
    ),
    frames AS (
      SELECT doc_id, frame_idx,
             CAST(sum(s * s) AS BIGINT) AS energy,
             CAST(sum(zc) AS BIGINT) AS zcr
      FROM pairs GROUP BY doc_id, frame_idx
    ),
    tot AS (
      SELECT doc_id, CAST(sum(energy) AS BIGINT) AS te,
             CAST(count(*) AS BIGINT) AS nf
      FROM frames GROUP BY doc_id
    )
    SELECT f.doc_id, CAST(f.frame_idx AS BIGINT) AS frame_idx,
           f.energy, f.zcr,
           CAST(CASE WHEN f.energy * t.nf > t.te THEN 1 ELSE 0 END
                AS BIGINT) AS voiced
    FROM frames f JOIN tot t USING (doc_id)
    """,
)
def multimodal_audio_energy_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO leg of the multimodal family: framewise short-time energy
    + zero-crossing rate with an above-average-energy voiced flag — the
    textbook energy/ZCR voice-activity detector (Rabiner & Schafer
    1978) every speech-corpus pipeline runs to cut silence before ASR
    or TTS training. The 'waveform' is the deterministic fake decode
    this family uses throughout (codepoints -> centered int samples;
    a production build swaps the codec into the kernel and NOTHING
    else changes): {_AF_W}-sample non-overlapping frames, per-frame
    sum-of-squares energy, strict sign-change count, and
    voiced = energy * n_frames > total_energy (cross-multiplied
    integers — no division, no floats anywhere).

    Scale shape: the frame DSP runs as ONE Arrow-batched numpy kernel
    (reshape + vectorized square/sign ops per batch — never per-sample
    Python), map-only over the corpus; the voiced flag needs the
    per-doc total, one doc-keyed partial-agg join back on frame rows
    (integral rows, never payloads). Tail samples short of a full
    frame are dropped on both engines."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def frames_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_d: list[int] = []
            out_f: list[np.ndarray] = []
            out_e: list[np.ndarray] = []
            out_z: list[np.ndarray] = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n = len(text)
                nf = n // _AF_W
                if nf == 0:
                    continue
                s = (
                    np.fromiter(
                        (ord(c) for c in text[: nf * _AF_W]),
                        dtype=np.int64,
                        count=nf * _AF_W,
                    )
                    % 256
                    - 128
                )
                fr = s.reshape(nf, _AF_W)
                energy = (fr * fr).sum(axis=1)
                zcr = ((fr[:, :-1] * fr[:, 1:]) < 0).sum(axis=1)
                out_d.extend([doc_id] * nf)
                out_f.append(np.arange(nf, dtype=np.int64))
                out_e.append(energy.astype(np.int64))
                out_z.append(zcr.astype(np.int64))
            if not out_d:
                continue
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(out_d, dtype=np.int64),
                    "frame_idx": np.concatenate(out_f),
                    "energy": np.concatenate(out_e),
                    "zcr": np.concatenate(out_z),
                }
            )

    frames = docs.mapInPandas(
        frames_kernel, "doc_id long, frame_idx long, energy long, zcr long"
    ).localCheckpoint(eager=False)  # two consumers: run the kernel once
    tot = frames.groupBy("doc_id").agg(
        F.sum("energy").alias("te"), F.count("*").alias("nf")
    )
    return (
        frames.join(tot, "doc_id")
        .select(
            "doc_id",
            "frame_idx",
            "energy",
            "zcr",
            F.when(F.col("energy") * F.col("nf") > F.col("te"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("voiced"),
        )
    )


_SHOT_W = 64  # chars per fake frame
_SHOT_DELTA = 4  # mean-luminance jump (0..255 scale) that counts as a cut


@register(
    "multimodal_video_shot_boundary",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, i,
             ascii(substr(text, CAST(i AS INTEGER), 1)) % 256 AS s,
             (i - 1) // {_SHOT_W} AS frame_no
      FROM documents, LATERAL unnest(range(1, len(text) + 1)) AS u(i)
      WHERE (i - 1) // {_SHOT_W} < len(text) // {_SHOT_W}
    ),
    frames AS (
      SELECT doc_id, frame_no, CAST(sum(s) AS BIGINT) AS lum_sum
      FROM pos GROUP BY doc_id, frame_no
    ),
    cuts AS (
      SELECT doc_id, frame_no, lum_sum,
             CASE WHEN abs(lum_sum - lag(lum_sum) OVER (
                    PARTITION BY doc_id ORDER BY frame_no))
                  > {_SHOT_DELTA * _SHOT_W}
                  THEN 1 ELSE 0 END AS is_cut
      FROM frames
    )
    SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no, lum_sum,
           CAST(is_cut AS BIGINT) AS is_cut,
           CAST(sum(is_cut) OVER (PARTITION BY doc_id ORDER BY frame_no
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS shot_id
    FROM cuts
    """,
)
def multimodal_video_shot_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VIDEO leg of the multimodal family: shot-boundary detection by
    frame-difference thresholding — the standard first pass of any
    video-corpus pipeline (segment into shots, then sample per shot
    instead of per time, so a 2-hour lecture and a 30s clip both yield
    representative frames). The fake decode follows the family
    convention ({_SHOT_W}-char frames, codepoint 'luminance'; a real
    build swaps the codec into the kernel): per-frame luminance SUM in
    exact integers, a cut wherever the mean jumps more than
    {_SHOT_DELTA}/255 between consecutive frames (cross-multiplied as
    |sum_f - sum_prev| > {_SHOT_DELTA * _SHOT_W} — no division), and
    shot_id as the running cut count — frame-level sessionization.

    Scale shape: decode is the map-only Arrow kernel; cut detection
    is one lag() and the shot id one running sum over the SAME
    (doc_id, frame_no) window partitioning — chained windows share
    one exchange + sort (the events_funnel_conversion pattern), over
    frame rows (integers), never payloads."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def lum_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_d: list[int] = []
            out_f: list[np.ndarray] = []
            out_l: list[np.ndarray] = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                nf = len(text) // _SHOT_W
                if nf == 0:
                    continue
                s = (
                    np.fromiter(
                        (ord(c) for c in text[: nf * _SHOT_W]),
                        dtype=np.int64,
                        count=nf * _SHOT_W,
                    )
                    % 256
                )
                out_d.extend([doc_id] * nf)
                out_f.append(np.arange(nf, dtype=np.int64))
                out_l.append(s.reshape(nf, _SHOT_W).sum(axis=1))
            if not out_d:
                continue
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(out_d, dtype=np.int64),
                    "frame_no": np.concatenate(out_f),
                    "lum_sum": np.concatenate(out_l),
                }
            )

    frames = docs.mapInPandas(
        lum_kernel, "doc_id long, frame_no long, lum_sum long"
    )
    w = W.partitionBy("doc_id").orderBy("frame_no")
    cuts = frames.withColumn(
        "is_cut",
        F.when(
            F.abs(F.col("lum_sum") - F.lag("lum_sum").over(w))
            > _SHOT_DELTA * _SHOT_W,
            1,
        )
        .otherwise(0)
        .cast("bigint"),
    )
    return cuts.select(
        "doc_id",
        "frame_no",
        "lum_sum",
        "is_cut",
        F.sum("is_cut")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("bigint")
        .alias("shot_id"),
    )


# container magic numbers (public file-format signatures)
_MAGIC = {
    "png": b"\x89\x50\x4e\x47",   # PNG
    "jpeg": b"\xff\xd8\xff\xe0",  # JPEG/JFIF
    "riff": b"\x52\x49\x46\x46",  # RIFF (WAV/AVI)
    "ogg": b"\x4f\x67\x67\x53",   # OggS
}
_FMT_ORDER = ["png", "jpeg", "riff", "ogg"]
_SNIFF_CORRUPT_MOD = 17  # every 17th payload loses its first byte


@register(
    "multimodal_format_sniff",
    oracle=f"""
    WITH packed AS (
      SELECT doc_id,
             CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                  WHEN 2 THEN 'riff' ELSE 'ogg' END AS declared_format,
             CASE WHEN doc_id % {_SNIFF_CORRUPT_MOD} = 0
                  THEN substr(hex(CASE doc_id % 4
                         WHEN 0 THEN '\\x89\\x50\\x4E\\x47'::BLOB
                         WHEN 1 THEN '\\xFF\\xD8\\xFF\\xE0'::BLOB
                         WHEN 2 THEN '\\x52\\x49\\x46\\x46'::BLOB
                         ELSE '\\x4F\\x67\\x67\\x53'::BLOB END
                       || encode(text)), 3)
                  ELSE hex(CASE doc_id % 4
                         WHEN 0 THEN '\\x89\\x50\\x4E\\x47'::BLOB
                         WHEN 1 THEN '\\xFF\\xD8\\xFF\\xE0'::BLOB
                         WHEN 2 THEN '\\x52\\x49\\x46\\x46'::BLOB
                         ELSE '\\x4F\\x67\\x67\\x53'::BLOB END
                       || encode(text))
             END AS hx,
             CASE WHEN doc_id % {_SNIFF_CORRUPT_MOD} = 0
                  THEN octet_length(encode(text)) + 3
                  ELSE octet_length(encode(text)) + 4 END AS n_bytes
      FROM documents
    ),
    sniffed AS (
      SELECT declared_format,
             CASE WHEN substr(hx, 1, 8) = '89504E47' THEN 'png'
                  WHEN substr(hx, 1, 6) = 'FFD8FF' THEN 'jpeg'
                  WHEN substr(hx, 1, 8) = '52494646' THEN 'riff'
                  WHEN substr(hx, 1, 8) = '4F676753' THEN 'ogg'
                  ELSE 'unknown' END AS sniffed_format,
             n_bytes
      FROM packed
    )
    SELECT declared_format, sniffed_format,
           CAST(count(*) AS BIGINT) AS n_payloads,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           CAST(CASE WHEN declared_format = sniffed_format
                     THEN 1 ELSE 0 END AS BIGINT) AS metadata_agrees
    FROM sniffed GROUP BY declared_format, sniffed_format
    """,
)
def multimodal_format_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTAINER FORMAT SNIFFING over opaque binary payloads — the
    ingest-validation stage of a multimodal pipeline: never trust the
    sidecar metadata; read the MAGIC BYTES. Payloads are packed with
    real public container signatures (PNG / JPEG-JFIF / RIFF / OggS,
    assigned round-robin) and every {_SNIFF_CORRUPT_MOD}th payload is
    truncated by one leading byte — the classic corrupt-upload shape.
    The sniffer slices the first four bytes OF THE BINARY COLUMN
    (Spark-side substring on BinaryType, hex-compared against the
    signature table) and the report groups (declared x sniffed)
    with payload counts/bytes: off-diagonal rows with
    sniffed='unknown' are exactly the corrupt uploads, and a
    declared/sniffed disagreement on a healthy payload would be a
    metadata bug. The DuckDB oracle builds the identical blobs
    (BLOB concat + encode) and sniffs via the hex prefix, so the
    binary plumbing — not just the assignment rule — is what's
    attested.

    Scale shape: pack and sniff are both map-only projections over
    the payload column (first-4-bytes slice, no full-payload decode);
    the report is a low-cardinality map-side-combinable aggregate.
    At 100 TB this runs at scan throughput."""
    docs = load_table(spark, sf_dir, "documents")
    magic = (
        F.when(F.col("doc_id") % 4 == 0, F.lit(_MAGIC["png"]))
        .when(F.col("doc_id") % 4 == 1, F.lit(_MAGIC["jpeg"]))
        .when(F.col("doc_id") % 4 == 2, F.lit(_MAGIC["riff"]))
        .otherwise(F.lit(_MAGIC["ogg"]))
    )
    declared = (
        F.when(F.col("doc_id") % 4 == 0, "png")
        .when(F.col("doc_id") % 4 == 1, "jpeg")
        .when(F.col("doc_id") % 4 == 2, "riff")
        .otherwise("ogg")
    )
    packed = docs.select(
        "doc_id",
        declared.alias("declared_format"),
        F.concat(magic, F.encode(F.col("text"), "UTF-8")).alias("payload"),
    ).select(
        "doc_id",
        "declared_format",
        F.when(
            F.col("doc_id") % _SNIFF_CORRUPT_MOD == 0,
            F.expr("substring(payload, 2)"),
        )
        .otherwise(F.col("payload"))
        .alias("payload"),
    )
    prefix = F.hex(F.expr("substring(payload, 1, 4)"))
    sniffed = packed.select(
        "declared_format",
        F.when(F.substring(prefix, 1, 8) == "89504E47", "png")
        .when(F.substring(prefix, 1, 6) == "FFD8FF", "jpeg")
        .when(F.substring(prefix, 1, 8) == "52494646", "riff")
        .when(F.substring(prefix, 1, 8) == "4F676753", "ogg")
        .otherwise("unknown")
        .alias("sniffed_format"),
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
    )
    return sniffed.groupBy("declared_format", "sniffed_format").agg(
        F.count("*").cast("bigint").alias("n_payloads"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.when(F.col("declared_format") == F.col("sniffed_format"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("metadata_agrees"),
    )


def _hex8_upper_sql(start: int) -> str:
    """Positional big-endian uint32 parse of 8 UPPERCASE hex digits of
    the column ``hx`` starting at 1-based position ``start`` (DuckDB
    cannot substring BLOBs, so the oracle parses the hex image)."""
    return " + ".join(
        f"(strpos('0123456789ABCDEF', substr(hx, {start + i}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )


@register(
    "multimodal_png_dimensions",
    oracle=f"""
    WITH packed AS (
      SELECT doc_id,
             unhex('89504E470D0A1A0A') || unhex('0000000D') || encode('IHDR')
             || unhex(lpad(hex(16 + doc_id % 1000), 8, '0'))
             || unhex(lpad(hex(16 + n_chars % 1000), 8, '0'))
             || unhex('0806000000') || encode(text) AS payload
      FROM documents WHERE doc_id % 4 = 0
    ),
    hx AS (
      SELECT doc_id, hex(payload) AS hx,
             octet_length(payload) AS n_bytes
      FROM packed
    )
    SELECT doc_id,
           CAST({{W}} AS BIGINT) AS width,
           CAST({{H}} AS BIGINT) AS height,
           CAST(({{W}}) * 1000 // ({{H}}) AS BIGINT) AS aspect_milli,
           CAST(n_bytes AS BIGINT) AS n_bytes
    FROM hx
    """.replace("{W}", _hex8_upper_sql(33)).replace("{H}", _hex8_upper_sql(41)),
)
def multimodal_png_dimensions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMAGE HEADER PARSING without decoding: read width/height out of
    the PNG IHDR chunk by slicing the binary payload — the metadata
    pass every multimodal ingest runs BEFORE deciding which images are
    worth decoding (resolution filters, aspect-ratio buckets, resize
    planning all need dimensions, and decoding 100 TB of pixels to
    learn them is the classic waste). The 'png' cohort of the packed
    corpus carries a REAL spec-conformant IHDR (8-byte signature,
    length, type, big-endian uint32 width/height at byte offsets
    17-24, depth/color fields), with dimensions derived
    deterministically from doc metadata; the parser slices the BINARY
    column (Spark substring on BinaryType) and decodes big-endian via
    hex -> int. The DuckDB oracle builds byte-identical blobs and
    parses the same offsets out of the hex image (DuckDB cannot slice
    BLOBs), so the whole binary round-trip is attested cross-engine.

    Scale shape: pack and parse are map-only projections; the parse
    touches 8 bytes per payload regardless of payload size — at scale
    this reads parquet pages of a 24-byte prefix column if headers are
    stored split, or stream-slices the payload column at scan
    throughput. No decode, no shuffle."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 0)
    be32 = lambda c: F.unhex(F.lpad(F.hex(c), 8, "0"))  # noqa: E731
    payload = F.concat(
        F.unhex(F.lit("89504E470D0A1A0A")),  # PNG signature
        F.unhex(F.lit("0000000D")),  # IHDR length = 13
        F.encode(F.lit("IHDR"), "UTF-8"),
        be32(F.lit(16) + F.col("doc_id") % 1000),
        be32(F.lit(16) + F.col("n_chars") % 1000),
        F.unhex(F.lit("0806000000")),  # depth 8, RGBA, std flags
        F.encode(F.col("text"), "UTF-8"),
    )
    packed = docs.select("doc_id", payload.alias("payload"))
    width = F.conv(F.hex(F.expr("substring(payload, 17, 4)")), 16, 10).cast(
        "long"
    )
    height = F.conv(F.hex(F.expr("substring(payload, 21, 4)")), 16, 10).cast(
        "long"
    )
    return packed.select(
        "doc_id",
        width.alias("width"),
        height.alias("height"),
        F.expr(
            "cast(conv(hex(substring(payload, 17, 4)), 16, 10) as bigint)"
            " * 1000 div"
            " cast(conv(hex(substring(payload, 21, 4)), 16, 10) as bigint)"
        )
        .cast("long")
        .alias("aspect_milli"),
        F.octet_length("payload").cast("long").alias("n_bytes"),
    )


def _le_hex_sql(byte_start: int, n_bytes: int) -> str:
    """Little-endian unsigned int from ``n_bytes`` bytes of the hex
    image column ``hx`` starting at 1-based BYTE offset ``byte_start``
    (byte k = hex chars 2k-1..2k); weight grows with byte position."""
    parts = []
    for i in range(n_bytes):
        c = 2 * (byte_start + i) - 1
        parts.append(
            f"((strpos('0123456789ABCDEF', substr(hx, {c}, 1)) - 1) * 16"
            f" + (strpos('0123456789ABCDEF', substr(hx, {c + 1}, 1)) - 1))"
            f" * {256 ** i}"
        )
    return " + ".join(parts)


@register(
    "multimodal_wav_header",
    oracle=f"""
    WITH packed AS (
      SELECT doc_id,
             1 + doc_id % 2 AS ch,
             8000 + (n_chars % 8) * 4000 AS sr,
             encode('RIFF') || unhex('24000000') || encode('WAVEfmt ')
             || unhex('10000000') || unhex('0100')
             || unhex(substr(lpad(hex(1 + doc_id % 2), 4, '0'), 3, 2)
                      || substr(lpad(hex(1 + doc_id % 2), 4, '0'), 1, 2))
             || unhex(substr(lpad(hex(8000 + (n_chars % 8) * 4000), 8, '0'), 7, 2)
                      || substr(lpad(hex(8000 + (n_chars % 8) * 4000), 8, '0'), 5, 2)
                      || substr(lpad(hex(8000 + (n_chars % 8) * 4000), 8, '0'), 3, 2)
                      || substr(lpad(hex(8000 + (n_chars % 8) * 4000), 8, '0'), 1, 2))
             || unhex(substr(lpad(hex((8000 + (n_chars % 8) * 4000) * (1 + doc_id % 2) * 2), 8, '0'), 7, 2)
                      || substr(lpad(hex((8000 + (n_chars % 8) * 4000) * (1 + doc_id % 2) * 2), 8, '0'), 5, 2)
                      || substr(lpad(hex((8000 + (n_chars % 8) * 4000) * (1 + doc_id % 2) * 2), 8, '0'), 3, 2)
                      || substr(lpad(hex((8000 + (n_chars % 8) * 4000) * (1 + doc_id % 2) * 2), 8, '0'), 1, 2))
             || unhex('0400') || unhex('1000')
             || encode(text) AS payload,
             octet_length(encode(text)) AS data_bytes
      FROM documents WHERE doc_id % 4 = 2
    ),
    hx AS (
      SELECT doc_id, hex(payload) AS hx, data_bytes FROM packed
    )
    SELECT doc_id,
           CAST({{CH}} AS BIGINT) AS channels,
           CAST({{SR}} AS BIGINT) AS sample_rate,
           CAST({{BR}} AS BIGINT) AS byte_rate,
           CAST(data_bytes * 1000 // ({{BR}}) AS BIGINT) AS duration_ms
    FROM hx
    """.replace("{CH}", _le_hex_sql(23, 2))
    .replace("{SR}", _le_hex_sql(25, 4))
    .replace("{BR}", _le_hex_sql(29, 4)),
)
def multimodal_wav_header(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAV/RIFF fmt-CHUNK PARSING — the LITTLE-endian counterpart to
    multimodal_png_dimensions (PNG is network byte order; RIFF is LE,
    and mixing the two up is the classic binary-ingest bug this pair
    of queries pins from both sides): the 'riff' cohort packs a real
    44-byte canonical WAV header (RIFF/WAVE/fmt chunk; PCM, channels
    and sample rate derived deterministically from doc metadata, LE
    byte order built by REVERSING hex pairs), and the parser slices
    channels (LE16 @23), sample rate (LE32 @25) and byte rate (LE32
    @29) back out of the binary column, plus the duration the audio
    pipeline actually wants (data bytes / byte rate). Spark assembles
    LE integers from reversed hex pairs of the binary slice; DuckDB
    parses per-byte positional weights off the hex image — two
    independent LE decoders that must agree bit-for-bit.

    Scale shape: map-only pack and parse (44 header bytes per payload
    touched); the duration arithmetic is one integer division. At
    100 TB this is the metadata sweep that runs before any resample
    or VAD pass (multimodal_audio_energy_vad) is scheduled."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 2)
    ch = (1 + F.col("doc_id") % 2).cast("bigint")
    sr = (8000 + (F.col("n_chars") % 8) * 4000).cast("bigint")
    br = (sr * ch * 2).cast("bigint")

    def le16(c):
        h = F.lpad(F.hex(c), 4, "0")
        return F.unhex(F.concat(F.substring(h, 3, 2), F.substring(h, 1, 2)))

    def le32(c):
        h = F.lpad(F.hex(c), 8, "0")
        return F.unhex(
            F.concat(
                F.substring(h, 7, 2),
                F.substring(h, 5, 2),
                F.substring(h, 3, 2),
                F.substring(h, 1, 2),
            )
        )

    payload = F.concat(
        F.encode(F.lit("RIFF"), "UTF-8"),
        F.unhex(F.lit("24000000")),
        F.encode(F.lit("WAVEfmt "), "UTF-8"),
        F.unhex(F.lit("10000000")),
        F.unhex(F.lit("0100")),  # PCM
        le16(ch),
        le32(sr),
        le32(br),
        F.unhex(F.lit("0400")),  # block align
        F.unhex(F.lit("1000")),  # 16 bits/sample
        F.encode(F.col("text"), "UTF-8"),
    )
    packed = docs.select(
        "doc_id",
        payload.alias("payload"),
        F.octet_length(F.encode(F.col("text"), "UTF-8"))
        .cast("bigint")
        .alias("data_bytes"),
    )

    def parse_le(byte_start: int, n: int):
        h = F.hex(F.expr(f"substring(payload, {byte_start}, {n})"))
        rev = F.concat(
            *[F.substring(h, 2 * i - 1, 2) for i in range(n, 0, -1)]
        )
        return F.conv(rev, 16, 10).cast("bigint")

    return packed.select(
        "doc_id",
        parse_le(23, 2).alias("channels"),
        parse_le(25, 4).alias("sample_rate"),
        parse_le(29, 4).alias("byte_rate"),
        F.expr(
            "data_bytes * 1000 div cast(conv(concat("
            "substring(hex(substring(payload, 29, 4)), 7, 2),"
            "substring(hex(substring(payload, 29, 4)), 5, 2),"
            "substring(hex(substring(payload, 29, 4)), 3, 2),"
            "substring(hex(substring(payload, 29, 4)), 1, 2)), 16, 10)"
            " as bigint)"
        )
        .cast("bigint")
        .alias("duration_ms"),
    )


# --------------------------------------------------------------------------
# JPEG SOF0 dimensions (marker-segment walk over the binary payload)
# --------------------------------------------------------------------------


def _be16_dyn_sql(off_expr: str) -> str:
    """Big-endian uint16 from 4 hex chars of ``hx`` starting at the
    DYNAMIC 1-based char offset ``off_expr`` — DuckDB casts a '0x'
    prefixed string, so the offset may be computed per row (the PNG
    parser's fixed-offset strpos polynomial can't walk segments)."""
    return f"CAST('0x' || substr(hx, {off_expr}, 4) AS INTEGER)"


@register(
    "multimodal_jpeg_dimensions",
    oracle=f"""
    WITH packed AS (
      SELECT doc_id,
             upper(
               'FFD8FFE0'
               || lpad(hex(16 + doc_id % 9), 4, '0')
               || '4A46494600'
               || repeat('00', (16 + doc_id % 9) - 7)
               || 'FFC0' || '0011' || '08'
               || lpad(hex(120 + doc_id % 720), 4, '0')
               || lpad(hex(160 + n_chars % 1280), 4, '0')
               || '03' || '011100' || '021101' || '031101'
               || 'FFDA' || hex(encode(text))
             ) AS hx
      FROM documents WHERE doc_id % 4 = 1
    ),
    walked AS (
      SELECT doc_id, hx,
             {_be16_dyn_sql("9")} AS app0_len
      FROM packed
    )
    SELECT doc_id, CAST(app0_len AS BIGINT) AS app0_len,
           substr(hx, 2 * (5 + app0_len) - 1, 4) AS sof_marker,
           CAST({_be16_dyn_sql("2 * (5 + app0_len + 5) - 1")}
             AS BIGINT) AS height,
           CAST({_be16_dyn_sql("2 * (5 + app0_len + 7) - 1")}
             AS BIGINT) AS width,
           CAST({_be16_dyn_sql("2 * (5 + app0_len + 7) - 1")} * 1000
                // {_be16_dyn_sql("2 * (5 + app0_len + 5) - 1")}
             AS BIGINT) AS aspect_milli
    FROM walked
    """,
)
def multimodal_jpeg_dimensions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG DIMENSIONS without decoding — but unlike the PNG IHDR
    (fixed offsets), JFIF requires a MARKER-SEGMENT WALK: the SOF0
    frame header sits behind a variable-length APP0 segment, so the
    parser must READ the APP0 length field out of the payload and
    compute the SOF0 offset from it per row. The packed 'jpeg' cohort
    (doc_id % 4 = 1, the multimodal_format_sniff cohort) carries a
    spec-conformant prefix — SOI, APP0 ('JFIF\\0' + doc-derived pad,
    so every row's SOF0 lands at a DIFFERENT offset), SOF0 with
    big-endian uint16 height/width, three component specs, then SOS +
    text bytes as stand-in entropy data. Spark slices the BinaryType
    payload at computed offsets (substring with a column offset —
    codegen'd, no UDF); the DuckDB oracle walks the identical hex
    image with '0x'-cast reads, so pack AND parse are attested
    cross-engine, including the marker check (sof_marker column must
    be FFC0 on every row — a wrong walk cannot silently pass).

    Scale shape: map-only projection; the walk touches <40 bytes per
    payload regardless of size. This is the general shape for every
    TLV container (JPEG/EXIF, MP4 atoms, Matroska): read a length,
    hop, read a header — expressible entirely in codegen'd byte
    slicing as long as the hop count is bounded, which for dimension
    extraction it is (SOF precedes entropy data by spec)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 4 == 1
    )
    l1 = F.lit(16) + F.col("doc_id") % 9
    h = F.lit(120) + F.col("doc_id") % 720
    w = F.lit(160) + F.col("n_chars") % 1280
    be16 = lambda c: F.lpad(F.hex(c), 4, "0")  # noqa: E731
    payload = F.unhex(
        F.upper(
            F.concat(
                F.lit("FFD8FFE0"),
                be16(l1),
                F.lit("4A46494600"),
                F.expr(
                    "repeat('00', (16 + doc_id % 9) - 7)"
                ),
                F.lit("FFC0"),
                F.lit("0011"),
                F.lit("08"),
                be16(h),
                be16(w),
                F.lit("03"),
                F.lit("011100"),
                F.lit("021101"),
                F.lit("031101"),
                F.lit("FFDA"),
                F.hex(F.encode(F.col("text"), "UTF-8")),
            )
        )
    )
    packed = docs.select("doc_id", payload.alias("payload"))
    app0_len = F.conv(
        F.hex(F.expr("substring(payload, 5, 2)")), 16, 10
    ).cast("bigint")
    walked = packed.select("doc_id", "payload", app0_len.alias("app0_len"))
    sof = F.expr("substring(payload, 5 + app0_len, 2)")
    hgt = F.conv(
        F.hex(F.expr("substring(payload, 5 + app0_len + 5, 2)")), 16, 10
    ).cast("bigint")
    wid = F.conv(
        F.hex(F.expr("substring(payload, 5 + app0_len + 7, 2)")), 16, 10
    ).cast("bigint")
    return walked.select(
        "doc_id",
        "app0_len",
        F.hex(sof).alias("sof_marker"),
        hgt.alias("height"),
        wid.alias("width"),
        F.expr(
            "cast(conv(hex(substring(payload, 5 + app0_len + 7, 2)), 16, 10)"
            " as bigint) * 1000 div"
            " cast(conv(hex(substring(payload, 5 + app0_len + 5, 2)), 16, 10)"
            " as bigint)"
        )
        .cast("bigint")
        .alias("aspect_milli"),
    )


# --------------------------------------------------------------------------
# MP4 / ISO-BMFF nested box walk (moov > mvhd duration + timescale)
# --------------------------------------------------------------------------


def _be32_dyn_sql(off_expr: str) -> str:
    """Big-endian uint32 from 8 hex chars of ``hx`` starting at the
    DYNAMIC 1-based BYTE offset ``off_expr`` (the _be16_dyn_sql idiom
    widened to box-length fields — ISO-BMFF sizes are uint32)."""
    return f"CAST('0x' || substr(hx, 2 * ({off_expr}) - 1, 8) AS BIGINT)"


@register(
    "multimodal_mp4_duration",
    oracle=f"""
    WITH packed AS (
      SELECT doc_id,
             upper(
               lpad(hex(16 + 4 * (doc_id % 5)), 8, '0') || '66747970'
               || '69736F6D' || '00000200'
               || repeat('69736F6D', doc_id % 5)
               || lpad(hex(8 + doc_id % 11), 8, '0') || '66726565'
               || repeat('00', doc_id % 11)
               || '00000074' || '6D6F6F76'
               || '0000006C' || '6D766864' || '00' || '000000'
               || '00000000' || '00000000'
               || lpad(hex(600 + (doc_id % 5) * 300), 8, '0')
               || lpad(hex(n_chars * 90 + doc_id % 89), 8, '0')
               || repeat('00', 80)
               || lpad(hex(8 + octet_length(encode(text))), 8, '0')
               || '6D646174' || hex(encode(text))
             ) AS hx
      FROM documents WHERE doc_id % 4 = 3
    ),
    hop1 AS (
      SELECT doc_id, hx, {_be32_dyn_sql("1")} AS ftyp_len
      FROM packed
    ),
    hop2 AS (
      SELECT doc_id, hx, ftyp_len,
             {_be32_dyn_sql("1 + ftyp_len")} AS free_len
      FROM hop1
    ),
    walked AS (
      SELECT doc_id, ftyp_len, free_len,
             substr(hx, 2 * (1 + ftyp_len + free_len + 4) - 1, 8)
               AS moov_type,
             {_be32_dyn_sql("1 + ftyp_len + free_len + 28")} AS timescale,
             {_be32_dyn_sql("1 + ftyp_len + free_len + 32")} AS duration
      FROM hop2
    )
    SELECT doc_id, CAST(ftyp_len AS BIGINT) AS ftyp_len,
           CAST(free_len AS BIGINT) AS free_len, moov_type,
           CAST(timescale AS BIGINT) AS timescale,
           CAST(duration AS BIGINT) AS duration,
           CAST(duration * 1000 // timescale AS BIGINT) AS duration_ms
    FROM walked
    """,
)
def multimodal_mp4_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP4 DURATION without decoding — the NESTED-container walk the
    JPEG segment walk (multimodal_jpeg_dimensions) points at: ISO-BMFF
    is a tree of length-prefixed boxes, so reaching moov>mvhd means
    reading the uint32 size of each top-level box and HOPPING — here
    ftyp (doc-varied compatible-brand count) then free (doc-varied
    padding), so every row's moov lands at a DIFFERENT offset and a
    hard-coded offset cannot pass. Inside moov, the first child is
    mvhd (version 0): timescale at mvhd+20, duration at mvhd+24, both
    big-endian uint32; duration_ms = duration * 1000 / timescale is
    the number a video-corpus ingest actually profiles (clip-length
    distribution gates sampling and pricing). The packed cohort
    (doc_id % 4 = 3) is spec-conformant through the walk — ftyp with
    'isom' major brand, a free box, a 116-byte moov holding a full
    108-byte mvhd, then mdat carrying the text bytes as stand-in
    media data. Spark slices the BinaryType payload at COMPUTED
    offsets (substring with column arithmetic — codegen'd, no UDF);
    the DuckDB oracle walks the identical hex image with '0x'-cast
    reads (including the moov_type fingerprint column, which must be
    6D6F6F76 = 'moov' on every row — a wrong hop cannot silently
    pass).

    Reference scope: the reference engine has no binary/multimodal
    surface (SURVEY.md §2.2) — this extends the mandated multimodal
    metadata family (PNG/JPEG/WAV headers) to video containers.

    Scale shape: map-only projection; the walk reads 5 uint32s + one
    4-byte type per payload regardless of media size — at 100 TB this
    runs at scan throughput, and with payloads in external object
    storage the same walk runs over ranged GETs of the first KB."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 4 == 3
    )
    be32 = lambda c: F.lpad(F.hex(c), 8, "0")  # noqa: E731
    nb = F.col("doc_id") % 5  # compatible brands (coprime to the cohort mod)
    pad = F.col("doc_id") % 11  # free-box padding
    ts = F.lit(600) + (F.col("doc_id") % 5) * 300
    dur = F.col("n_chars") * 90 + F.col("doc_id") % 89
    payload = F.unhex(
        F.upper(
            F.concat(
                be32(F.lit(16) + 4 * nb),
                F.lit("66747970"),  # 'ftyp'
                F.lit("69736F6D"),  # major brand 'isom'
                F.lit("00000200"),  # minor version
                F.expr("repeat('69736F6D', doc_id % 5)"),
                be32(F.lit(8) + pad),
                F.lit("66726565"),  # 'free'
                F.expr("repeat('00', doc_id % 11)"),
                F.lit("00000074"),  # moov size = 8 + 108
                F.lit("6D6F6F76"),  # 'moov'
                F.lit("0000006C"),  # mvhd size = 108
                F.lit("6D766864"),  # 'mvhd'
                F.lit("00"),  # version 0
                F.lit("000000"),  # flags
                F.lit("00000000"),  # creation_time
                F.lit("00000000"),  # modification_time
                be32(ts),
                be32(dur),
                F.expr("repeat('00', 80)"),  # rest of mvhd v0
                be32(
                    F.lit(8)
                    + F.octet_length(F.encode(F.col("text"), "UTF-8"))
                ),
                F.lit("6D646174"),  # 'mdat'
                F.hex(F.encode(F.col("text"), "UTF-8")),
            )
        )
    )
    packed = docs.select("doc_id", payload.alias("payload"))

    def be32_at(off_expr: str) -> F.Column:
        return F.conv(
            F.hex(F.expr(f"substring(payload, {off_expr}, 4)")), 16, 10
        ).cast("bigint")

    hop1 = packed.select(
        "doc_id", "payload", be32_at("1").alias("ftyp_len")
    )
    hop2 = hop1.select(
        "doc_id",
        "payload",
        "ftyp_len",
        be32_at("1 + ftyp_len").alias("free_len"),
    )
    walked = hop2.select(
        "doc_id",
        "ftyp_len",
        "free_len",
        F.hex(
            F.expr("substring(payload, 1 + ftyp_len + free_len + 4, 4)")
        ).alias("moov_type"),
        be32_at("1 + ftyp_len + free_len + 28").alias("timescale"),
        be32_at("1 + ftyp_len + free_len + 32").alias("duration"),
    )
    return walked.select(
        "*",
        F.expr("duration * 1000 div timescale")
        .cast("bigint")
        .alias("duration_ms"),
    )


# --------------------------------------------------------------------------
# TIFF/EXIF IFD walk (little-endian counted entry table: width, height,
# orientation)
# --------------------------------------------------------------------------


def _le16_hex_of(v_sql: str) -> str:
    """Little-endian 2-byte hex image of an integer SQL expression
    (engine-neutral: lpad/hex/substr behave identically)."""
    return (
        f"substr(lpad(hex({v_sql}), 4, '0'), 3, 2)"
        f" || substr(lpad(hex({v_sql}), 4, '0'), 1, 2)"
    )


def _le32_hex_of(v_sql: str) -> str:
    h = f"lpad(hex({v_sql}), 8, '0')"
    return (
        f"substr({h}, 7, 2) || substr({h}, 5, 2)"
        f" || substr({h}, 3, 2) || substr({h}, 1, 2)"
    )


def _tiff_pack_sql() -> str:
    """The packed little-endian TIFF hex image, identical SQL for both
    engines (each caller appends its own text-bytes hex term; the
    Spark caller also rewrites the list/array function names).

    Layout: 'II' 42, LE32 IFD offset (8 + doc-varied pad), pad zeros,
    LE16 entry count (doc-varied dummy entries + width/height/
    orientation, tag-sorted per spec), 12-byte entries, LE32 next-IFD
    = 0, then the text bytes as stand-in strip data."""
    nd = "(doc_id % 5)"  # coprime to the cohort mod, so it varies
    entry_tail = "|| '0300' || '01000000' || "  # type SHORT, count 1
    dummy = (
        f"CASE WHEN {nd} = 0 THEN '' ELSE array_to_string("
        f"list_transform(generate_series(1, {nd}),"
        f" i -> {_le16_hex_of('i')} {entry_tail}'00000000'), '') END"
    )
    width = "(100 + n_chars % 900)"
    height = "(80 + doc_id % 640)"
    orient = "(1 + doc_id % 8)"
    return (
        "upper('4949' || '2A00' || "
        + _le32_hex_of("8 + doc_id % 13")
        + " || repeat('00', doc_id % 13)"
        + f" || {_le16_hex_of(f'{nd} + 3')}"
        + f" || {dummy}"
        + f" || '0001' {entry_tail}({_le16_hex_of(width)} || '0000')"
        + f" || '0101' {entry_tail}({_le16_hex_of(height)} || '0000')"
        + f" || '1201' {entry_tail}({_le16_hex_of(orient)} || '0000')"
        + " || '00000000')"
    )


def _le16_dyn_duck(off: str) -> str:
    """LE16 at dynamic 1-based BYTE offset in hex string hx (DuckDB)."""
    return (
        f"CAST('0x' || substr(hx, 2 * ({off}) + 1, 2)"
        f" || substr(hx, 2 * ({off}) - 1, 2) AS INTEGER)"
    )


@register(
    "multimodal_tiff_ifd_walk",
    oracle=f"""
    WITH packed AS (
      SELECT doc_id,
             {_tiff_pack_sql()} || hex(encode(text)) AS hx
      FROM documents WHERE doc_id % 4 = 0
    ),
    hdr AS (
      SELECT doc_id, hx,
             CAST('0x' || substr(hx, 15, 2) || substr(hx, 13, 2)
                       || substr(hx, 11, 2) || substr(hx, 9, 2)
               AS BIGINT) AS ifd_off
      FROM packed
    ),
    ifd AS (
      SELECT doc_id, hx, ifd_off,
             {_le16_dyn_duck("ifd_off + 1")} AS n_entries
      FROM hdr
    ),
    scanned AS (
      SELECT doc_id, ifd_off, n_entries,
             list_transform(generate_series(0, n_entries - 1),
               i -> struct_pack(
                 tag := {_le16_dyn_duck("ifd_off + 3 + 12 * i")},
                 val := {_le16_dyn_duck("ifd_off + 11 + 12 * i")}))
               AS entries
      FROM ifd
    ),
    tags AS (
      SELECT doc_id, ifd_off, n_entries,
             list_filter(entries, e -> e.tag = 256)[1].val AS width,
             list_filter(entries, e -> e.tag = 257)[1].val AS height,
             list_filter(entries, e -> e.tag = 274)[1].val AS orientation
      FROM scanned
    )
    SELECT doc_id, CAST(ifd_off AS BIGINT) AS ifd_off,
           CAST(n_entries AS BIGINT) AS n_entries,
           CAST(width AS BIGINT) AS width,
           CAST(height AS BIGINT) AS height,
           CAST(orientation AS BIGINT) AS orientation,
           CAST(CASE WHEN orientation >= 5 THEN height ELSE width END
             AS BIGINT) AS eff_width,
           CAST(CASE WHEN orientation >= 5 THEN width ELSE height END
             AS BIGINT) AS eff_height
    FROM tags
    """,
)
def multimodal_tiff_ifd_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIFF/EXIF IFD WALK — the third container-parsing structure:
    where PNG is fixed-offset, and JPEG/MP4 hop length-prefixed
    segments, TIFF is a COUNTED ENTRY TABLE reached through a file-
    offset indirection: read the little-endian IFD offset from the
    header, hop there, read the entry count, then SCAN n 12-byte
    (tag, type, count, value) records for the tags you want — here
    ImageWidth (256), ImageLength (257), and Orientation (274), the
    tag every photo pipeline must respect before resizing (5-8 mean
    the stored dimensions are TRANSPOSED; eff_width/eff_height apply
    that swap). The packed cohort (doc_id % 4 = 0) varies BOTH the
    IFD offset (header padding) and the wanted tags' POSITIONS inside
    the table (0-3 dummy low-tag entries), so neither a fixed offset
    nor a fixed entry index can pass; byte order is little-endian
    throughout — the parser swaps bytes per read, attested against
    DuckDB walking the identical hex image. The entry scan is a
    per-row array expression (transform over sequence + filter), all
    codegen, no UDF.

    Scale shape: map-only; reads the 8-byte header + one IFD
    (tens of bytes) per payload. Same ranged-GET property as the MP4
    walk: at 100 TB over object storage this profiles a corpus by
    fetching first-KB slices only."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 4 == 0
    )
    pack = (
        _tiff_pack_sql()
        .replace("array_to_string", "array_join")
        .replace("list_transform", "transform")
        .replace("generate_series(1, (doc_id % 5))", "sequence(1, doc_id % 5)")
    )
    payload = F.unhex(
        F.expr(pack + " || hex(encode(text, 'UTF-8'))")
    )
    packed = docs.select("doc_id", payload.alias("payload"))

    def le16_dyn(off: str) -> str:
        h2 = f"hex(substring(payload, {off}, 2))"
        return (
            f"cast(conv(substring({h2}, 3, 2)"
            f" || substring({h2}, 1, 2), 16, 10) as bigint)"
        )

    hdr = packed.select(
        "doc_id",
        "payload",
        F.expr(
            "cast(conv(concat("
            "substring(hex(substring(payload, 5, 4)), 7, 2),"
            "substring(hex(substring(payload, 5, 4)), 5, 2),"
            "substring(hex(substring(payload, 5, 4)), 3, 2),"
            "substring(hex(substring(payload, 5, 4)), 1, 2)), 16, 10)"
            " as bigint)"
        ).alias("ifd_off"),
    )
    ifd = hdr.select(
        "doc_id",
        "payload",
        "ifd_off",
        F.expr(le16_dyn("ifd_off + 1")).alias("n_entries"),
    )
    scanned = ifd.select(
        "doc_id",
        "ifd_off",
        "n_entries",
        F.expr(
            f"transform(sequence(0, cast(n_entries - 1 as int)),"
            f" i -> named_struct("
            f"'tag', {le16_dyn('ifd_off + 3 + 12 * i')},"
            f" 'val', {le16_dyn('ifd_off + 11 + 12 * i')}))"
        ).alias("entries"),
    )
    tag = lambda t: F.expr(  # noqa: E731
        f"element_at(filter(entries, e -> e.tag = {t}), 1).val"
    )
    out = scanned.select(
        "doc_id",
        F.col("ifd_off").cast("bigint").alias("ifd_off"),
        F.col("n_entries").cast("bigint").alias("n_entries"),
        tag(256).cast("bigint").alias("width"),
        tag(257).cast("bigint").alias("height"),
        tag(274).cast("bigint").alias("orientation"),
    )
    return out.select(
        "*",
        F.when(F.col("orientation") >= 5, F.col("height"))
        .otherwise(F.col("width"))
        .cast("bigint")
        .alias("eff_width"),
        F.when(F.col("orientation") >= 5, F.col("width"))
        .otherwise(F.col("height"))
        .cast("bigint")
        .alias("eff_height"),
    )


# --------------------------------------------------------------------------
# ZIP end-of-central-directory: signature SEARCH + directory accounting
# --------------------------------------------------------------------------


def _le32_dyn_duck(off: str) -> str:
    """LE32 at dynamic 1-based BYTE offset in hex string hx (DuckDB)."""
    return (
        f"CAST('0x' || substr(hx, 2 * ({off}) + 5, 2)"
        f" || substr(hx, 2 * ({off}) + 3, 2)"
        f" || substr(hx, 2 * ({off}) + 1, 2)"
        f" || substr(hx, 2 * ({off}) - 1, 2) AS BIGINT)"
    )


def _zip_pack_sql() -> str:
    """Engine-neutral hex image of a minimal STORED zip: ne = 1 +
    doc_id % 3 local-header+data records, the matching central
    directory, and an EOCD whose comment is the document text — so
    the EOCD sits at a doc-varied distance from the end and a parser
    MUST search for the signature rather than index from EOF."""
    ne = "(1 + doc_id % 3)"
    lh = (
        "'504B0304' || '0A00' || '0000' || '0000' || '0000' || '0000'"
        " || '00000000' || '04000000' || '04000000' || '0200' || '0000'"
        " || '66' || '3' || i || '44415441'"
    )
    ce = (
        "'504B0102' || '0A000A00' || '0000' || '0000' || '0000' || '0000'"
        " || '00000000' || '04000000' || '04000000' || '0200' || '0000'"
        " || '0000' || '0000' || '0000' || '00000000' || "
        + _le32_hex_of("36 * (i - 1)")
        + " || '66' || '3' || i"
    )
    eocd = (
        "'504B0506' || '0000' || '0000' || "
        + _le16_hex_of(ne)
        + " || "
        + _le16_hex_of(ne)
        + " || "
        + _le32_hex_of(f"48 * {ne}")
        + " || "
        + _le32_hex_of(f"36 * {ne}")
        + " || "
        + _le16_hex_of("octet_length(encode(text))")
    )
    return (
        f"upper(array_to_string(list_transform(generate_series(1, {ne}),"
        f" i -> {lh}), '')"
        f" || array_to_string(list_transform(generate_series(1, {ne}),"
        f" i -> {ce}), '')"
        f" || {eocd})"
    )


@register(
    "multimodal_zip_eocd",
    oracle=f"""
    WITH packed AS (
      SELECT doc_id,
             {_zip_pack_sql()} || hex(encode(text)) AS hx
      FROM documents WHERE doc_id % 4 = 1
    ),
    found AS (
      SELECT doc_id, hx,
             (strpos(hx, '504B0506') + 1) // 2 AS b
      FROM packed
    )
    SELECT doc_id,
           CAST(b - 1 AS BIGINT) AS eocd_off,
           CAST({_le16_dyn_duck("b + 10")} AS BIGINT) AS n_entries,
           CAST({_le32_dyn_duck("b + 12")} AS BIGINT) AS cd_size,
           CAST({_le32_dyn_duck("b + 16")} AS BIGINT) AS cd_offset,
           CAST({_le16_dyn_duck("b + 20")} AS BIGINT) AS comment_len,
           CAST(CASE WHEN {_le32_dyn_duck("b + 16")}
                          + {_le32_dyn_duck("b + 12")} = b - 1
                     THEN 1 ELSE 0 END AS INTEGER) AS layout_ok
    FROM found
    """,
)
def multimodal_zip_eocd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIP END-OF-CENTRAL-DIRECTORY — the fourth container-parsing
    structure: not fixed-offset (PNG), not a length hop (JPEG/MP4),
    not a counted table behind an indirection (TIFF), but a SIGNATURE
    SEARCH: the EOCD trails a variable-length archive comment, so its
    position is unknowable from EOF and every real unzip scans
    backward for PK\\x05\\x06. The packed cohort (doc_id % 4 = 1)
    carries 1-3 STORED members (local headers + data), the matching
    central directory, and an EOCD whose comment is the document text
    — so the search distance varies per row and the directory
    accounting is real: the report pins layout_ok = (cd_offset +
    cd_size == eocd_off), the consistency check an archive auditor
    runs before trusting member counts (comment bytes are printable
    text, so the control-byte signature cannot collide). Spark
    locates the signature in the hex image of the BinaryType payload
    (locate + computed-offset substrings, all codegen); DuckDB
    replays with strpos over the identical hex.

    Scale shape: map-only; at 100 TB over object storage this is the
    classic last-64KB ranged GET per archive, here expressed over the
    payload column. Member-level enumeration (walking cd_offset's
    entry chain) composes from the same little-endian reads."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 4 == 1
    )
    pack = (
        _zip_pack_sql()
        .replace("array_to_string", "array_join")
        .replace("list_transform", "transform")
        .replace("generate_series(1, (1 + doc_id % 3))", "sequence(1, 1 + doc_id % 3)")
        .replace(
            "octet_length(encode(text))",
            "octet_length(encode(text, 'UTF-8'))",
        )
    )
    payload = F.unhex(F.expr(pack + " || hex(encode(text, 'UTF-8'))"))
    packed = docs.select("doc_id", payload.alias("payload")).withColumn(
        "hx", F.hex(F.col("payload"))
    )
    found = packed.select(
        "doc_id",
        "hx",
        F.expr("(locate('504B0506', hx) + 1) div 2").alias("b"),
    )

    def le16(off: str) -> str:
        return (
            f"cast(conv(substr(hx, 2 * ({off}) + 1, 2)"
            f" || substr(hx, 2 * ({off}) - 1, 2), 16, 10) as bigint)"
        )

    def le32(off: str) -> str:
        return (
            f"cast(conv(substr(hx, 2 * ({off}) + 5, 2)"
            f" || substr(hx, 2 * ({off}) + 3, 2)"
            f" || substr(hx, 2 * ({off}) + 1, 2)"
            f" || substr(hx, 2 * ({off}) - 1, 2), 16, 10) as bigint)"
        )

    return found.select(
        "doc_id",
        (F.col("b") - 1).cast("bigint").alias("eocd_off"),
        F.expr(le16("b + 10")).alias("n_entries"),
        F.expr(le32("b + 12")).alias("cd_size"),
        F.expr(le32("b + 16")).alias("cd_offset"),
        F.expr(le16("b + 20")).alias("comment_len"),
        F.expr(
            f"cast(if({le32('b + 16')} + {le32('b + 12')} = b - 1, 1, 0)"
            " as int)"
        ).alias("layout_ok"),
    )
