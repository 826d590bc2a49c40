"""Multimodal plumbing invariants: the Arrow-batched UDF stages must
preserve the payload accounting even with the codec stubbed."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_frame_sample_partitions_payload_exactly(spark, sf_dir):
    """Frames per doc = _N_FRAMES and their byte lengths sum back to the
    payload length — the sampler drops/duplicates nothing."""
    from nytimes_batch_processor_spark.multimodal import (
        _N_FRAMES,
        attach_binary_payload,
        mm_frame_sample,
    )
    from nytimes_batch_processor_spark.sources import load_tables

    frames = mm_frame_sample(spark, sf_dir)
    per_doc = frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("frame_bytes").alias("total")
    )
    docs = attach_binary_payload(
        load_tables(spark, sf_dir, "documents").documents
    ).select("doc_id", F.octet_length("payload").alias("payload_bytes"))
    joined = per_doc.join(docs, "doc_id")
    bad = joined.filter(
        (F.col("n") != _N_FRAMES) | (F.col("total") != F.col("payload_bytes"))
    )
    assert bad.count() == 0


def test_resize_produces_fixed_size_thumbs(spark, sf_dir):
    from nytimes_batch_processor_spark.multimodal import _THUMB_H, _THUMB_W, mm_resize_thumbs

    thumbs = mm_resize_thumbs(spark, sf_dir)
    n_docs = thumbs.count()
    assert n_docs > 0
    ok = thumbs.filter(F.col("thumb_bytes") == _THUMB_W * _THUMB_H)
    assert ok.count() == n_docs  # every fixture payload is non-empty


def test_decode_features_deterministic(spark, sf_dir):
    """Two runs of the fake decoder agree row-for-row (required for the
    driver's re-run compare and any retried task at scale)."""
    from nytimes_batch_processor_spark.multimodal import mm_decode_features

    a = mm_decode_features(spark, sf_dir)
    b = mm_decode_features(spark, sf_dir)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
