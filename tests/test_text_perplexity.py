"""Perplexity-based quality filtering (r18-built, r19-registered —
see the module banner in operators/text.py): the bigram-LM scorer is
value-exact against DuckDB at the suite SF, the same comparison the
driver's sweep will run once the @query registration lands, plus the
estimator's textbook invariants on a hand-checkable corpus."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nytimes_batch_processor_spark.operators.text import (  # noqa: E402
    _PPLX_BAR,
    _PPLX_K,
    _perplexity_oracle,
    text_perplexity_bigram,
)


def test_perplexity_matches_duckdb_oracle(spark, duck, sf_dir):
    """The driver-shaped parity check: identical rows (doc_id,
    n_bigrams, rounded xent, drop) from both engines, non-vacuous on
    BOTH sides of the bar."""
    srows = sorted(tuple(r) for r in text_perplexity_bigram(spark, sf_dir).collect())
    orows = sorted(duck.execute(_perplexity_oracle()).fetchall())
    assert srows == orows
    drops = sum(1 for r in srows if r[3])
    assert 0 < drops < len(srows), f"bar {_PPLX_BAR} is vacuous: {drops}/{len(srows)}"


def test_perplexity_estimator_textbook_values(spark):
    """Hand-computed add-k bigram estimate on a 3-doc corpus: the
    reference slice is docs 1 and 2 (doc_id % 5 != 0); doc 0 is scored
    against their counts. Vocabulary V=3 ('a','b','c'), left-context
    counts normalize the smoothed conditional exactly."""
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "a b a b"), (2, "b c")],
        "doc_id long, text string",
    )
    # drive the operator through a synthetic 'documents' parquet dir
    import tempfile

    d = tempfile.mkdtemp(prefix="pplx-fixture-")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = {r["doc_id"]: r for r in text_perplexity_bigram(spark, d).collect()}
    k = _PPLX_K
    # reference bigrams: doc1 -> (a,b) (b,a) (a,b); doc2 -> (b,c)
    # left-context counts: a->2, b->2 ; bigram counts: (a,b)->2, (b,a)->1, (b,c)->1
    # V = 3 (a, b, c)
    p_ab = (2 + k) / (2 + k * 3)
    p_bc = (1 + k) / (2 + k * 3)
    want = round(-(math.log(p_ab) + math.log(p_bc)) / 2, 6)
    assert rows[0]["n_bigrams"] == 2
    assert rows[0]["xent"] == want
    # a one-token doc has no bigrams and never drops
    one = spark.createDataFrame([(0, "a"), (1, "a b")], "doc_id long, text string")
    one.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = {r["doc_id"]: r for r in text_perplexity_bigram(spark, d).collect()}
    assert rows[0]["n_bigrams"] == 0
    assert rows[0]["xent"] is None
    assert rows[0]["drop"] is False


def _pplx_reference(rows: list[tuple[int, str]], k: float) -> dict:
    """Pure-Python reference estimator (test-only ground truth, no
    shared control flow with the operator): add-k bigram LM over the
    doc_id%5!=0 slice, per-doc mean -ln P(w2|w1)."""
    import collections

    def toks(t):
        return [w for w in t.lower().split() if w]

    bigc: dict = collections.Counter()
    unic: dict = collections.Counter()
    vocab = set()
    for did, text in rows:
        ws = toks(text)
        if did % 5 != 0:
            vocab.update(ws)
            for a, b in zip(ws, ws[1:]):
                bigc[(a, b)] += 1
                unic[a] += 1
    v = len(vocab)
    out = {}
    for did, text in rows:
        ws = toks(text)
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            out[did] = (0, None)
            continue
        nll = [
            -math.log((bigc.get(p, 0) + k) / (unic.get(p[0], 0) + k * v))
            for p in pairs
        ]
        out[did] = (len(pairs), round(sum(nll) / len(nll), 6))
    return out


def test_perplexity_matches_pure_python_reference(spark, tmp_path):
    """Property-style sweep: random tiny corpora (mixed reference and
    scored-only docs, repeated words, single-token docs) agree with the
    in-test reference estimator doc for doc."""
    import itertools
    import random

    rng = random.Random(18)
    words = ["ga", "bo", "tu", "le", "xi"]
    for trial in range(6):
        rows = []
        for did in range(rng.randint(3, 12)):
            n = rng.randint(1, 9)
            rows.append((did, " ".join(rng.choice(words) for _ in range(n))))
        d = str(tmp_path / f"t{trial}")
        spark.createDataFrame(rows, "doc_id long, text string").write.mode(
            "overwrite"
        ).parquet(f"{d}/documents.parquet")
        got = {
            r["doc_id"]: (r["n_bigrams"], r["xent"])
            for r in text_perplexity_bigram(spark, d).collect()
        }
        want = _pplx_reference(rows, _PPLX_K)
        assert got == want, (trial, rows, got, want)


def test_perplexity_empty_reference_slice_is_null_not_crash(spark, tmp_path):
    """A corpus whose every doc_id lands in the scored residue (no
    reference slice at all, v = 0) must return NULL xent / drop=false
    for every doc — never an ANSI division-by-zero or an inf."""
    rows = [(0, "ga bo tu"), (5, "bo bo"), (10, "tu")]
    d = str(tmp_path / "noref")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{d}/documents.parquet"
    )
    got = {r["doc_id"]: r for r in text_perplexity_bigram(spark, d).collect()}
    assert got[0]["n_bigrams"] == 2 and got[0]["xent"] is None
    assert got[5]["xent"] is None and got[5]["drop"] is False
    assert got[10]["n_bigrams"] == 0
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{d}/documents.parquet/*.parquet')"  # Spark writes a dir
    )
    orows = sorted(con.execute(_perplexity_oracle()).fetchall())
    assert orows == sorted(
        tuple(r) for r in text_perplexity_bigram(spark, d).collect()
    )


def test_pipeline_perplexity_stage_drops_high_xent_docs(spark, tmp_path):
    """The composed stage (r18, staged for an r19 swept twin like the
    r17 quality_model= precedent): a gibberish doc whose bigrams the
    reference LM has never seen scores high cross-entropy and must
    vanish from the manifest AND never enter the index; a fluent doc
    passes. The reference LM trains on a separate corpus slice."""
    from pyspark.sql import functions as F  # noqa: F401

    from nytimes_batch_processor_spark.operators.dedup import (
        build_minhash_index,
    )
    from nytimes_batch_processor_spark.operators.text import (
        curate_admission_pipeline,
        perplexity_counts,
    )

    ref = spark.createDataFrame(
        [(i, "the scan reads the table and the join merges rows")
         for i in range(1, 9)],
        "doc_id long, text string",
    )
    lm = perplexity_counts(ref)
    fluent = "the scan reads the table and the join merges rows again"
    gibberish = "zz qq vv pp kk ww yy xx jj uu nn mm"
    index_path = str(tmp_path / "index")
    build_minhash_index(
        spark.createDataFrame(
            [(1, "completely unrelated corpus text here")],
            "doc_id long, text string",
        ),
        index_path,
    )
    batch = spark.createDataFrame(
        [(100, fluent), (101, gibberish)], "doc_id long, text string"
    )
    # bar between the two scores: fluent ~0.77 (mostly seen bigrams
    # against V=8), gibberish = the all-unseen constant ln(8) ~ 2.079
    man = curate_admission_pipeline(
        spark, index_path, batch, perplexity=lm, xent_bar=1.5
    )
    assert {r["doc_id"] for r in man.collect()} == {100}
    indexed = {r["doc_id"] for r in spark.read.parquet(index_path).collect()}
    assert indexed == {1, 100}, indexed


def test_curate_perplexity_twin_matches_oracle(spark, duck, sf_dir):
    """The r19-staged swept twin, driver-shaped today: the composed
    pipeline with the perplexity stage produces exactly the oracle's
    manifest (membership, offsets, AND each admitted doc's rounded
    xent), non-vacuously — the batch must lose docs to the LM filter
    yet still admit some."""
    from nytimes_batch_processor_spark.operators.text import (
        _curate_pplx_oracle,
        curate_perplexity_twin,
    )

    srows = sorted(
        tuple(r) for r in curate_perplexity_twin(spark, sf_dir).collect()
    )
    orows = sorted(duck.execute(_curate_pplx_oracle()).fetchall())
    assert srows == orows
    assert 0 < len(srows) < 200, len(srows)  # filtered, not vacuous


def test_perplexity_lm_artifact_roundtrip(spark):
    """r19: a trained bigram LM survives a session boundary as managed
    BUCKETED-BY-w1 tables + a _lm_meta.json sidecar carrying V —
    scores from the loaded LM equal scores from the in-memory triple
    row-for-row (rounded xent included), and the STRICT loader refuses
    a missing table and a missing sidecar instead of scoring against a
    partial model."""
    import pytest

    from nytimes_batch_processor_spark.operators.text import (
        load_perplexity_lm,
        perplexity_counts,
        perplexity_scores,
        save_perplexity_lm,
    )

    ref = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and the dog sat on the rug"),
            (2, "the dog ran to the cat and the cat ran to the mat"),
        ],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (10, "the cat ran to the rug"),
            (11, "zxqv jqwk fplm vvtr"),
            (12, "the dog sat on the mat"),
        ],
        "doc_id long, text string",
    )
    lm = perplexity_counts(ref)
    name = "pplx_lm_roundtrip_probe"
    try:
        save_perplexity_lm(spark, name, lm, n_buckets=2)
        loaded = load_perplexity_lm(spark, name)
        got = sorted(
            tuple(r) for r in perplexity_scores(docs, loaded).collect()
        )
        want = sorted(
            tuple(r) for r in perplexity_scores(docs, lm).collect()
        )
        assert got == want and len(got) == 3

        # strict loader: a missing sidecar on existing tables refuses
        from nytimes_batch_processor_spark.tables import managed_table_dir

        jvm = spark._jvm
        side = f"{managed_table_dir(spark, name + '_bigrams')}/_lm_meta.json"
        # a foreign smoothing constant refuses: the counts are
        # k-independent but the scores are not
        import json as _json

        with open(side) as f:
            meta = _json.load(f)
        meta["k"] = 0.25
        # rewrite through the Hadoop FS (a plain-python write would
        # invalidate the LocalFileSystem's .crc sidecar-of-the-sidecar)
        p = jvm.org.apache.hadoop.fs.Path(side)
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        out = fs.create(p, True)
        out.write(bytearray(_json.dumps(meta).encode("utf-8")))
        out.close()
        with pytest.raises(ValueError, match="smooth"):
            load_perplexity_lm(spark, name)
        fs.delete(p, False)
        with pytest.raises(ValueError, match="sidecar"):
            load_perplexity_lm(spark, name)
    finally:
        for suffix in ("_bigrams", "_contexts"):
            spark.sql(f"DROP TABLE IF EXISTS {name}{suffix}")
    with pytest.raises(ValueError, match="missing its"):
        load_perplexity_lm(spark, name)


def test_pipeline_full_triad_composes_in_one_chain(spark, tmp_path):
    """r19: all THREE curation filter classes stacked in ONE pipeline
    call — heuristic (token geometry), discriminative (trained
    classifier), statistical (bigram LM) — each dropping a different
    document for its OWN reason while a clean doc flows through to
    admission and the manifest. Per-stage attribution is asserted
    EXPLICITLY before the composed run (the classifier really flags
    only the degraded register; the LM really flags only the
    scrambled-order doc), so the chain's verdict cannot be one stage
    doing another's work."""
    from nytimes_batch_processor_spark.operators.dedup import (
        build_minhash_index,
    )
    from nytimes_batch_processor_spark.operators.quality_model import (
        degrade_documents,
        quality_classifier_score,
        quality_classifier_train,
    )
    from nytimes_batch_processor_spark.operators.text import (
        curate_admission_pipeline,
        perplexity_counts,
        perplexity_scores,
    )

    register = (
        "the scan reads the table and the join merges rows "
        "while the sink writes batches and the index grows"
    )
    base = spark.createDataFrame(
        [(i, register) for i in range(1, 41)], "doc_id long, text string"
    )
    model = quality_classifier_train(degrade_documents(base), sample_cap=100)
    lm = perplexity_counts(
        spark.createDataFrame(
            [(i, "the scan reads the table and the join merges rows")
             for i in range(1, 9)],
            "doc_id long, text string",
        )
    )
    clean = "the scan reads the table and the join merges rows again"
    too_short = "just four tokens here"  # heuristic drop (<5 tokens)
    # the degraded register the classifier learned: junk token at
    # every 3rd slot (degrade_documents' construction)
    degraded = "the scan zq2 the table zq5 the join zq0 rows zq3"
    # same BAG of tokens as `clean` (the classifier's features), but
    # the bigram ORDER is scrambled — only the LM can tell them apart
    scrambled = "again rows merges join the and table the reads scan the"

    # per-stage attribution, asserted before composing:
    probe = spark.createDataFrame(
        [(100, clean), (102, degraded), (103, scrambled)],
        "doc_id long, text string",
    )
    p = {
        r["doc_id"]: r["p_degraded"]
        for r in quality_classifier_score(
            model, probe, text_col="text"
        ).collect()
    }
    assert p[102] >= 0.5 and p[100] < 0.5 and p[103] < 0.5, p
    xe = {
        r["doc_id"]: r["xent"]
        for r in perplexity_scores(probe, lm).collect()
    }
    bar = 1.5
    assert xe[103] > bar > xe[100], xe

    index_path = str(tmp_path / "index")
    build_minhash_index(
        spark.createDataFrame(
            [(1, "completely unrelated corpus text here")],
            "doc_id long, text string",
        ),
        index_path,
    )
    batch = spark.createDataFrame(
        [(100, clean), (101, too_short), (102, degraded), (103, scrambled)],
        "doc_id long, text string",
    )
    man = curate_admission_pipeline(
        spark, index_path, batch,
        quality_model=model, perplexity=lm, xent_bar=bar,
    )
    assert {r["doc_id"] for r in man.collect()} == {100}
    indexed = {r["doc_id"] for r in spark.read.parquet(index_path).collect()}
    assert indexed == {1, 100}, indexed


def test_perplexity_persisted_entry_reads_bucketed_tables(spark, sf_dir):
    """r20 (VERDICT r19 item 6): the swept `text_perplexity_persisted`
    entry must actually SCAN the published w1-bucketed LM tables (not
    silently score from the in-memory counts), and its per-doc judge
    column must be TRUE on every row — loaded == in-memory score."""
    from nytimes_batch_processor_spark.operators.text import (
        text_perplexity_persisted,
    )
    from nytimes_batch_processor_spark.plans import executed_plan

    df = text_perplexity_persisted(spark, sf_dir)
    plan = executed_plan(df)
    assert "engine_pplx_lm_bigrams" in plan, plan[:2000]
    assert "engine_pplx_lm_contexts" in plan, plan[:2000]
    rows = df.collect()
    assert rows and all(r["persisted_match"] for r in rows)
