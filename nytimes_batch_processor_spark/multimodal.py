"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio codecs, so the *decode* step is a
deterministic fake behind ``try: import PIL`` (clearly marked); the
Spark-side plumbing — binary column construction, typed metadata struct,
Arrow-batched mapInPandas feature extraction, output schema — is real
and tested (tests/test_multimodal.py).

Scale notes: binary payloads ride in parquet as BYTE_ARRAY; never
collect them. Feature extraction is mapInPandas (Arrow batches, one
Python worker per core) — the only Python hot path in the engine, and
it is batch-columnar, not row-at-a-time. Partition sizing matters more
than usual: keep `spark.sql.files.maxPartitionBytes` low enough that a
batch of payloads fits executor memory (e.g. 32 MB for ~10 MB images).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .catalog import query
from .sources import load_tables

try:  # codecs are not installed in this container — STUBBED decode path
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def decode_image(payload: bytes) -> object:
    """Real decode when PIL exists; otherwise NotImplementedError — the
    deterministic fake used by the pipeline lives in fake_features()."""
    if not _HAVE_PIL:
        raise NotImplementedError(
            "image codec not available in this environment; "
            "pipeline uses deterministic fake features instead"
        )
    from io import BytesIO

    return Image.open(BytesIO(payload))


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Model a multimodal table: binary payload + typed metadata struct.

    Fixtures have no real media, so the payload is the UTF-8 text bytes
    and metadata is derived — the *schema shape* (binary + struct) is
    what downstream operators contract on.
    """
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
            F.col("lang").alias("source_lang"),
        ).alias("meta"),
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feat", T.ArrayType(T.DoubleType())),
    ]
)


def fake_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: deterministic fake 'decoder' — 4-dim feature =
    [len, n_distinct_bytes, first_byte, last_byte] scaled. Replaces the
    real image/audio feature extractor (see decode_image) with identical
    batch shape and schema."""
    for pdf in batches:
        payloads = pdf["payload"]
        feats = [
            [
                float(len(b)),
                float(len(set(b))),
                float(b[0]) if len(b) else 0.0,
                float(b[-1]) if len(b) else 0.0,
            ]
            for b in payloads
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(b) for b in payloads],
                "feat": feats,
            }
        )


@query(
    "mm_binary_metadata",
    tables=("documents",),
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       'application/octet-stream'              AS mime,
       md5(text)                               AS payload_md5
FROM documents
""",
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata surface (oracle-checked): payload size and
    content checksum computed on the binary column JVM-side."""
    t = load_tables(spark, sf_dir, "documents")
    mm = attach_binary_payload(t.documents)
    return mm.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.mime").alias("mime"),
        F.md5("payload").alias("payload_md5"),
    )


THUMB_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("thumb", T.BinaryType()),
        T.StructField("thumb_w", T.IntegerType()),
        T.StructField("thumb_h", T.IntegerType()),
    ]
)

_THUMB_W, _THUMB_H = 8, 8


def fake_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: deterministic fake 'resize' — samples
    _THUMB_W*_THUMB_H bytes evenly spaced across the payload (the real
    implementation decodes via decode_image and PIL-resizes; identical
    batch shape and output schema)."""
    k = _THUMB_W * _THUMB_H
    for pdf in batches:
        thumbs = []
        for b in pdf["payload"]:
            n = len(b)
            thumbs.append(
                bytes(b[(i * n) // k] for i in range(k)) if n else b""
            )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "thumb": thumbs,
                "thumb_w": _THUMB_W,
                "thumb_h": _THUMB_H,
            }
        )


@query(
    "mm_resize_thumbs",
    tables=("documents",),
    oracle=f"""
WITH b AS (
    SELECT doc_id, octet_length(encode(text)) AS n, hex(encode(text)) AS h
    FROM documents
)
SELECT doc_id,
       CAST({_THUMB_W} AS INT) AS thumb_w,
       CAST({_THUMB_H} AS INT) AS thumb_h,
       CAST(CASE WHEN n > 0 THEN {_THUMB_W * _THUMB_H} ELSE 0 END AS INT) AS thumb_bytes,
       md5(CASE WHEN n > 0 THEN list_aggregate(
           list_transform(range(0, {_THUMB_W * _THUMB_H}),
                          i -> substr(h, CAST(2 * ((i * n) // {_THUMB_W * _THUMB_H}) + 1 AS INT), 2)),
           'string_agg', '') ELSE '' END) AS thumb_digest
FROM b
""",
)
def mm_resize_thumbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize step of the multimodal pipeline — ORACLE-CHECKED: fixed
    _THUMB_W x _THUMB_H 'thumbnail' per payload via Arrow-batched
    mapInPandas (the decode+PIL.resize slot with the codec stubbed).
    The digest is md5-of-hex (not md5-of-bytes) because the sampled
    bytes can split UTF-8 sequences and DuckDB's md5 only takes VARCHAR;
    hex round-trips byte-exactly in both engines, so the checksum still
    pins every sampled byte."""
    t = load_tables(spark, sf_dir, "documents")
    mm = attach_binary_payload(t.documents)
    thumbs = mm.select("doc_id", "payload").mapInPandas(fake_resize, THUMB_SCHEMA)
    return thumbs.select(
        "doc_id",
        "thumb_w",
        "thumb_h",
        F.octet_length("thumb").alias("thumb_bytes"),
        F.md5(F.hex("thumb")).alias("thumb_digest"),
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)

_N_FRAMES = 4


def fake_frame_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker in the UDTF shape (rows out > rows in):
    deterministic fake 'frame sampler' slicing each payload into
    _N_FRAMES contiguous chunks (the real implementation seeks keyframes
    in a video container; identical fan-out shape and schema)."""
    for pdf in batches:
        ids, idxs, frames = [], [], []
        for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
            n = len(b)
            for i in range(_N_FRAMES):
                lo, hi = (i * n) // _N_FRAMES, ((i + 1) * n) // _N_FRAMES
                ids.append(doc_id)
                idxs.append(i)
                frames.append(bytes(b[lo:hi]))
        yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})


@query(
    "mm_frame_sample",
    tables=("documents",),
    oracle=f"""
WITH b AS (
    SELECT doc_id, octet_length(encode(text)) AS n, hex(encode(text)) AS h
    FROM documents
),
f AS (
    SELECT doc_id, CAST(fi.i AS INT) AS frame_idx,
           (fi.i * n) // {_N_FRAMES} AS lo,
           ((fi.i + 1) * n) // {_N_FRAMES} AS hi,
           h
    FROM b CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) fi
)
SELECT doc_id, frame_idx,
       CAST(hi - lo AS INT) AS frame_bytes,
       md5(substr(h, CAST(2 * lo + 1 AS INT), CAST(2 * (hi - lo) AS INT))) AS frame_digest
FROM f
""",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling step — ORACLE-CHECKED: _N_FRAMES rows per payload
    out of one row in — the row-expanding (flatMap/UDTF) multimodal
    shape; partitioning survives because mapInPandas is map-side only.
    Digest is md5-of-hex for the same engine-portability reason as
    mm_resize_thumbs (frame boundaries split UTF-8 sequences)."""
    t = load_tables(spark, sf_dir, "documents")
    mm = attach_binary_payload(t.documents)
    frames = mm.select("doc_id", "payload").mapInPandas(fake_frame_sample, FRAME_SCHEMA)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.octet_length("frame").alias("frame_bytes"),
        F.md5(F.hex("frame")).alias("frame_digest"),
    )


@query(
    "mm_decode_features",
    tables=("documents",),
    oracle="""
WITH b AS (
    SELECT doc_id, octet_length(encode(text)) AS n, hex(encode(text)) AS h
    FROM documents
)
SELECT doc_id,
       CAST(n AS INT) AS n_bytes,
       ROUND(CAST(n AS DOUBLE)
             + len(list_distinct(list_transform(range(1, n + 1),
                   i -> substr(h, CAST(2 * i - 1 AS INT), 2))))
             + CASE WHEN n > 0 THEN CAST(concat('0x', substr(h, 1, 2)) AS INT) ELSE 0 END
             + CASE WHEN n > 0 THEN CAST(concat('0x', substr(h, 2 * n - 1, 2)) AS INT) ELSE 0 END,
             6) AS feat_sum,
       CAST(4 AS INT) AS feat_dim
FROM b
""",
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas — ORACLE-CHECKED: the fake decoder's 4-dim feature
    ([len, n_distinct_bytes, first_byte, last_byte]) is replayed in
    DuckDB over the hex encoding of the payload, so even the stubbed
    multimodal path gets a value-hash gate. This is the engine's
    multimodal hot path shape — decode/resize/frame-sample plug in here
    unchanged (a real codec would drop the oracle back to rows-only +
    pytest invariants)."""
    t = load_tables(spark, sf_dir, "documents")
    mm = attach_binary_payload(t.documents)
    feats = mm.select("doc_id", "payload").mapInPandas(fake_features, FEATURE_SCHEMA)
    return feats.select(
        "doc_id",
        "n_bytes",
        F.round(F.aggregate("feat", F.lit(0.0), lambda a, x: a + x), 6).alias("feat_sum"),
        F.size("feat").alias("feat_dim"),
    )
