"""Span-level decontamination (operators/text.py::decon_leak_spans,
VERDICT r16 item 5): constructed leak geometry, the strip-closure
property (surgical removal actually decontaminates), fixture
non-vacuity, and the hypothesis maximality property against a
quadratic reference."""

from __future__ import annotations

import os
import sys

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nytimes_batch_processor_spark.operators.dedup import (  # noqa: E402
    _XSUB_WINDOW,
    merge_collision_spans,
    strip_shared_spans,
)
from nytimes_batch_processor_spark.operators.text import (  # noqa: E402
    _DECON_CANARY,
    decon_leak_spans,
    decon_leaked_windows,
)

K = _XSUB_WINDOW


def test_oracle_window_constant_matches_engine():
    """The DuckDB oracle hardcodes k=25 (an f-string cannot import);
    if the engine's window ever moves, this is the tripwire."""
    assert K == 25
    assert len(_DECON_CANARY.split()) >= K


def _chain(train, test):
    leaked = decon_leaked_windows(train, test)
    return merge_collision_spans(
        leaked.select(
            F.col("doc_id").alias("id1"),
            F.col("doc_id").alias("id2"),
            F.col("pos").alias("pos1"),
            F.col("pos").alias("pos2"),
        )
    ).select(
        F.col("id1").alias("doc_id"), F.col("start1").alias("start"), "span_len"
    )


def test_constructed_leak_geometry(spark):
    """A test doc embedding a 30-token train passage at offset 5
    reports exactly (start=6, span_len=30); a disjoint test doc
    reports nothing; a shared run below K tokens reports nothing."""
    passage = " ".join(f"p{i}" for i in range(30))
    short = " ".join(f"p{i}" for i in range(K - 1))
    train = spark.createDataFrame(
        [(1, "t0 t1 " + passage + " t2")], "doc_id long, text string"
    )
    test = spark.createDataFrame(
        [
            (100, "a0 a1 a2 a3 a4 " + passage + " a5"),
            (101, " ".join(f"b{i}" for i in range(40))),
            (102, "c0 " + short + " c1"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["start"], r["span_len"])
        for r in _chain(train, test).collect()
    }
    assert got == {(100, 6, 30)}, got


def test_strip_closure_decontaminates(spark):
    """The surgical-removal contract: feeding the reported spans to
    `strip_shared_spans` (id2/start2 = the test doc's own coordinates)
    and re-running the chain on the stripped test split reports ZERO
    leaks — the cut removed exactly the contamination."""
    passage = " ".join(f"p{i}" for i in range(34))
    train = spark.createDataFrame(
        [(1, passage)], "doc_id long, text string"
    )
    test = spark.createDataFrame(
        [
            (100, "a0 a1 " + passage + " a2 a3"),
            (101, passage + " b0"),
        ],
        "doc_id long, text string",
    )
    leaked = decon_leaked_windows(train, test)
    spans = merge_collision_spans(
        leaked.select(
            F.col("doc_id").alias("id1"),
            F.col("doc_id").alias("id2"),
            F.col("pos").alias("pos1"),
            F.col("pos").alias("pos2"),
        )
    )
    assert spans.count() == 2
    stripped = strip_shared_spans(test, spans).select(
        "doc_id", "text"
    )
    # the cut docs keep their unshared tokens...
    kept = {r["doc_id"]: r["text"] for r in stripped.collect()}
    assert kept[100] == "a0 a1 a2 a3"
    assert kept[101] == "b0"
    # ...and the stripped split is clean
    assert _chain(train, stripped).count() == 0


def test_fixture_canary_nonvacuous(spark):
    """At sf0.001 the planted canary guarantees real output: every
    test-bucket doc with doc_id % 3 == 0 reports a leak covering the
    30-token canary suffix; nothing shorter than K ever appears."""
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    from nytimes_batch_processor_spark.operators.dedup import (
        _portable_token_hash,
    )
    from nytimes_batch_processor_spark.sources import load_tables

    rows = decon_leak_spans(spark, sf).collect()
    assert rows, "decon_leak_spans is vacuously empty"
    assert all(r["span_len"] >= K for r in rows)
    docs = load_tables(spark, sf, "documents").documents
    planted = {
        r["doc_id"]
        for r in docs.select(
            "doc_id",
            (_portable_token_hash(F.col("doc_id").cast("string")) % 100).alias(
                "bucket"
            ),
        )
        .filter((F.col("bucket") >= 90) & (F.col("doc_id") % 3 == 0))
        .collect()
    }
    reported = {r["doc_id"] for r in rows}
    assert planted <= reported, planted - reported
    # every planted doc's report includes a span covering the canary
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d in planted:
        assert any(r["span_len"] >= 30 for r in by_doc[d]), by_doc[d]


def _brute_leak_intervals(train_docs, test_toks):
    """Quadratic reference: maximal intervals of the test doc whose
    every K-window occurs (as content) somewhere in the train split."""
    train_windows = set()
    for toks in train_docs:
        for p in range(len(toks) - K + 1):
            train_windows.add(tuple(toks[p : p + K]))
    covered = [
        p + 1
        for p in range(len(test_toks) - K + 1)
        if tuple(test_toks[p : p + K]) in train_windows
    ]
    out, i = set(), 0
    while i < len(covered):
        j = i
        while j + 1 < len(covered) and covered[j + 1] == covered[j] + 1:
            j += 1
        out.add((covered[i], covered[j] - covered[i] + K))
        i = j + 1
    return out


_tok = st.sampled_from([f"w{i}" for i in range(6)])


@given(
    st.lists(st.lists(_tok, min_size=0, max_size=40), min_size=1, max_size=2),
    st.lists(_tok, min_size=0, max_size=60),
)
@settings(max_examples=12, deadline=None)
def test_leak_spans_match_bruteforce(train_lists, test_toks):
    from nytimes_batch_processor_spark.session import get_spark

    spark = get_spark("engine-tests", cpus=8)
    train = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(train_lists)],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(100, " ".join(test_toks))], "doc_id long, text string"
    )
    got = {
        (r["start"], r["span_len"]) for r in _chain(train, test).collect()
    }
    assert got == _brute_leak_intervals(train_lists, test_toks)
