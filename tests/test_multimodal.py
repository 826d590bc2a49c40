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


# --- Real byte-level header parsing (r17) ----------------------------


def test_header_parsers_pin_endianness_against_raw_bytes():
    """The parsers are validated against RAW BYTE LITERALS, not just
    the synthesizer — a symmetric endianness bug in synthesize+parse
    would round-trip cleanly, so the literals are the independent
    ground truth: width 258 = 0x0102 must sit big-endian in the PNG
    IHDR and the 44100 Hz rate little-endian in the WAV fmt chunk."""
    from nytimes_batch_processor_spark.multimodal import (
        _jpeg_bytes,
        _png_bytes,
        _wav_bytes,
        parse_jpeg_header,
        parse_png_header,
        parse_wav_header,
    )

    png = _png_bytes(258, 16, b"")
    assert png.hex() == (
        "89504e470d0a1a0a0000000d4948445200000102000000100806000000fd267174"
    )
    assert png[16:20] == b"\x00\x00\x01\x02"  # big-endian width
    assert parse_png_header(png) == (258, 16)
    # the IHDR CRC is the real zlib CRC32 over type+data — corrupting a
    # dim byte without re-CRCing makes the chunk invalid; the parser
    # (like most header sniffers) doesn't verify CRC, but the
    # synthesizer must emit the correct one for the header to be valid
    import zlib

    assert png[29:33] == zlib.crc32(png[12:29]).to_bytes(4, "big")

    wav = _wav_bytes(44100, 2, b"ab")
    assert wav[24:28] == b"\x44\xac\x00\x00"  # little-endian 44100
    assert parse_wav_header(wav) == (44100, 2)

    jpeg = _jpeg_bytes(258, 16, b"xyz")
    # SOF payload is height-then-width, both big-endian, after the
    # APP0 segment the marker scan must skip by declared length
    assert parse_jpeg_header(jpeg) == (258, 16)


def test_wav_chunk_walk_handles_preceding_chunks():
    """A LIST chunk (odd-sized, so word-alignment matters) before fmt
    must not break the walk — real WAV files carry metadata chunks."""
    import struct

    from nytimes_batch_processor_spark.multimodal import parse_wav_header

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    wav = (
        b"RIFF" + struct.pack("<I", 0) + b"WAVE"
        + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad to even
        + b"fmt " + struct.pack("<I", 16) + fmt
    )
    assert parse_wav_header(wav) == (8000, 1)


def test_jpeg_scan_rejects_markerless_and_sofless_streams():
    from nytimes_batch_processor_spark.multimodal import parse_jpeg_header

    assert parse_jpeg_header(b"\xff\xd8\xff\xda\x00\x02") is None  # SOS first
    assert parse_jpeg_header(b"not a jpeg") is None
    assert parse_jpeg_header(b"") is None


def test_unknown_payloads_degrade_to_nulls_not_exceptions(spark):
    """The E1 quarantine discipline on binary payloads: garbage bytes
    produce fmt='unknown' + null fields, never a task failure."""
    import pandas as pd

    from nytimes_batch_processor_spark.multimodal import parse_media_headers

    pdf = pd.DataFrame({"doc_id": [1, 2], "payload": [b"\x00\x01garbage", b""]})
    out = pd.concat(list(parse_media_headers(iter([pdf]))))
    assert list(out["fmt"]) == ["unknown", "unknown"]
    assert out["width"].isna().all() and out["sample_rate"].isna().all()


def test_mm_binary_metadata_parses_synthesized_headers(spark, sf_dir):
    """End-to-end: every fixture doc gets a valid container header and
    the entry's parsed fields match the generator formulas — the
    derived-input oracle's claim, checked here Spark-side too."""
    from nytimes_batch_processor_spark.multimodal import mm_binary_metadata

    rows = mm_binary_metadata(spark, sf_dir).collect()
    assert rows and all(r["fmt"] in ("png", "jpeg", "wav") for r in rows)
    for r in rows:
        m = r["doc_id"] % 3
        if m in (0, 1):
            assert r["width"] == 16 + r["doc_id"] % 241, r
            assert r["height"] == 16 + (r["doc_id"] * 7) % 181, r
            assert r["sample_rate"] is None and r["channels"] is None, r
        else:
            assert r["sample_rate"] == 8000 + (r["doc_id"] % 8) * 4000, r
            assert r["channels"] == 1 + r["doc_id"] % 2, r
            assert r["width"] is None and r["height"] is None, r


def test_header_roundtrip_property():
    """Hypothesis: parse inverts synthesize across the containers'
    full legal dimension ranges (JPEG dims are u16, PNG u32-positive,
    WAV rate/channels u32/u16) with arbitrary body bytes — catches
    offset bugs that the fixture's narrow derived ranges never reach."""
    from hypothesis import given, settings, strategies as st

    from nytimes_batch_processor_spark.multimodal import (
        _jpeg_bytes,
        _png_bytes,
        _wav_bytes,
        parse_jpeg_header,
        parse_png_header,
        parse_wav_header,
    )

    import pytest

    @settings(max_examples=200, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=65535),
        h=st.integers(min_value=1, max_value=65535),
        # encodable WAV range: block-align (channels*2) fits u16 and
        # byte_rate (rate*channels*2) fits u32 — constrained generation,
        # and the synthesizer's own validation covers the rest
        rate=st.integers(min_value=1, max_value=192_000),
        ch=st.integers(min_value=1, max_value=1024),
        body=st.binary(max_size=64),
    )
    def check(w, h, rate, ch, body):
        assert parse_png_header(_png_bytes(w, h, body)) == (w, h)
        assert parse_jpeg_header(_jpeg_bytes(w, h, body)) == (w, h)
        assert parse_wav_header(_wav_bytes(rate, ch, body)) == (rate, ch)

    check()
    # the hypothesis-found edge now raises instead of struct-erroring
    with pytest.raises(ValueError, match="block-align"):
        _wav_bytes(8000, 32768, b"")
    with pytest.raises(ValueError, match="u16"):
        _jpeg_bytes(70000, 16, b"")
    with pytest.raises(ValueError, match="u32"):
        _png_bytes(0, 16, b"")


def test_null_text_n_bytes_matches_oracle_semantics(spark, duck):
    """ADVICE r17 #4 (closed r18): NULL documents.text — Python maps it
    to an empty body (header-only payload), and the oracle's
    COALESCE(octet_length(...), 0) must agree, for every container."""
    import pandas as pd

    from nytimes_batch_processor_spark.multimodal import (
        parse_media_headers,
        synthesize_media,
    )

    pdf = pd.DataFrame({"doc_id": [0, 1, 2], "text": [None, None, None]})
    media = next(synthesize_media(iter([pdf])))
    parsed = next(parse_media_headers(iter([media])))
    got = dict(zip(parsed["doc_id"], parsed["n_bytes"]))
    want = duck.execute(
        """
        SELECT doc_id,
               CAST(CASE WHEN doc_id % 3 = 2 THEN 44 ELSE 33 END
                    + COALESCE(octet_length(encode(text)), 0) AS INT)
        FROM (VALUES (0, NULL), (1, NULL), (2, NULL)) t(doc_id, text)
        """
    ).fetchall()
    assert got == dict(want), (got, want)
