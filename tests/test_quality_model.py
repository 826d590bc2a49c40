"""Trained quality classifier (operators/quality_model.py, VERDICT r16
item 2): label-derivation geometry, bounded-sample training, the honest
AUC number (printed, gated at the real bar — the driver entry's 0.80 is
the hash-stability margin), and the scale claim that scoring is
MAP-ONLY (zero Exchange in the executed plan)."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nytimes_batch_processor_spark.operators.quality_model import (  # noqa: E402
    QC_HOLDOUT_MOD,
    degrade_documents,
    quality_classifier_score,
    quality_classifier_train,
)
from nytimes_batch_processor_spark.plans import executed_plan  # noqa: E402
from nytimes_batch_processor_spark.sources import load_tables  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _labeled(spark):
    docs = load_tables(spark, SF, "documents").documents
    return degrade_documents(docs)


def test_degrade_geometry(spark):
    """Odd doc_ids carry the corruption (junk tokens at every 3rd slot,
    truncated to 24 tokens); even doc_ids pass through untouched —
    byte-identical to the source text."""
    docs = load_tables(spark, SF, "documents").documents
    lab = degrade_documents(docs).join(docs, "doc_id")
    even = lab.filter(F.col("doc_id") % 2 == 0)
    assert even.filter(F.col("qtext") != F.col("text")).count() == 0
    odd = lab.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", F.split("qtext", r"\s+").alias("qt")
    )
    assert odd.filter(F.size("qt") > 24).count() == 0
    # every 3rd token (0-based index 2, 5, 8...) is a zqN junk token
    bad = odd.filter(
        F.exists(
            F.filter(F.col("qt"), lambda x, i: i % 3 == F.lit(2)),
            lambda t: ~t.rlike("^zq[0-7]$"),
        )
    )
    assert bad.count() == 0
    # and labels are exactly doc_id % 2
    assert (
        degrade_documents(docs)
        .filter(F.col("label") != F.pmod("doc_id", F.lit(2)))
        .count()
        == 0
    )


def test_classifier_auc_and_determinism(spark):
    """The honest quality gate: holdout AUC printed and asserted at
    0.95 (measured 1.0 at sf0.001/sf0.01 — the task is separable by
    construction; the driver entry's 0.80 bar is the float-wobble
    margin, this is the number). Rescoring is bit-identical."""
    lab = _labeled(spark)
    train = lab.filter(F.pmod("doc_id", F.lit(QC_HOLDOUT_MOD)) != 0)
    hold = lab.filter(F.pmod("doc_id", F.lit(QC_HOLDOUT_MOD)) == 0)
    model = quality_classifier_train(train)
    rows = quality_classifier_score(model, hold).collect()
    order = sorted(rows, key=lambda r: (r["p_degraded"], r["doc_id"]))
    ranks = {r["doc_id"]: i + 1 for i, r in enumerate(order)}
    npos = sum(1 for r in rows if r["label"] == 1)
    nneg = len(rows) - npos
    rpos = sum(ranks[r["doc_id"]] for r in rows if r["label"] == 1)
    auc = (rpos - npos * (npos + 1) / 2) / (npos * nneg)
    print(f"quality classifier holdout AUC = {auc:.4f} (n={len(rows)})")
    assert auc >= 0.95, auc
    again = quality_classifier_score(model, hold).collect()
    assert {(r["doc_id"], r["p_degraded"]) for r in again} == {
        (r["doc_id"], r["p_degraded"]) for r in rows
    }


def test_scoring_is_map_only(spark):
    """The 100 TB claim: scoring adds NO exchange — tokenize, hash,
    and the broadcast-coefficient dot are all per-row, so the filter
    folds into whatever scan the batch already pays."""
    lab = _labeled(spark)
    model = quality_classifier_train(lab, sample_cap=200)
    plan = executed_plan(quality_classifier_score(model, lab))
    assert "Exchange" not in plan, plan


def test_training_sample_estimate_never_bypasses_cap(spark):
    """ADVICE r18 #2: `n_estimate` may only set the keep-RATE (where an
    estimate is as good as a count) — it must NEVER decide the
    cap-bypass branch, because an UNDERESTIMATE at or below the cap
    would silently return the full corpus and turn the memory bound
    advisory. An underestimate therefore yields the exact same capped
    sample as the exact-count path, and an above-cap estimate scales
    the keep-rate exactly like a real count of that size."""
    from nytimes_batch_processor_spark.operators.quality_model import (
        qc_training_sample,
    )

    lab = _labeled(spark)
    n = lab.count()
    cap = 60
    assert n > cap  # the corpus genuinely exceeds the cap at this SF

    exact = {r["doc_id"] for r in qc_training_sample(lab, cap).collect()}
    assert 0 < len(exact) < n  # the cap really bit

    # the bug shape: an underestimate <= cap used to early-return the
    # FULL labeled set; now it falls back to the exact count and caps
    under = {
        r["doc_id"]
        for r in qc_training_sample(lab, cap, n_estimate=5).collect()
    }
    assert under == exact

    # above-cap estimates are trusted for the rate: a 2x overestimate
    # halves the keep-rate, so the sample shrinks and stays a subset
    over = {
        r["doc_id"]
        for r in qc_training_sample(lab, cap, n_estimate=2 * n).collect()
    }
    assert over < exact  # strictly smaller, same hash ordering
    # an accurate estimate reproduces the exact-count sample verbatim
    accurate = {
        r["doc_id"]
        for r in qc_training_sample(lab, cap, n_estimate=n).collect()
    }
    assert accurate == exact


def test_training_sample_cap(spark):
    """A cap below the corpus still trains a separating model (the
    deterministic hash-sample keeps both classes), and the capped fit
    is reproducible — same cap, same coefficients."""
    lab = _labeled(spark)
    m1 = quality_classifier_train(lab, sample_cap=120)
    m2 = quality_classifier_train(lab, sample_cap=120)
    c1 = m1.stages[-1].coefficients.toArray()
    c2 = m2.stages[-1].coefficients.toArray()
    assert (c1 == c2).all()
    hold = lab.filter(F.pmod("doc_id", F.lit(QC_HOLDOUT_MOD)) == 0)
    scored = quality_classifier_score(m1, hold)
    mean_gap = (
        scored.groupBy("label")
        .agg(F.avg("p_degraded").alias("p"))
        .orderBy("label")
        .collect()
    )
    assert mean_gap[1]["p"] - mean_gap[0]["p"] > 0.5, mean_gap


def test_pipeline_optional_model_stage(spark, tmp_path):
    """`curate_admission_pipeline(quality_model=...)`: a trained model
    drops degraded-looking docs before admission (they never reach the
    index or the manifest), and the default-None path is byte-identical
    to the pre-model pipeline."""
    from nytimes_batch_processor_spark.operators.dedup import (
        build_minhash_index,
    )
    from nytimes_batch_processor_spark.operators.text import (
        curate_admission_pipeline,
    )

    lab = _labeled(spark)
    model = quality_classifier_train(
        lab.filter(F.pmod("doc_id", F.lit(QC_HOLDOUT_MOD)) != 0)
    )

    corpus_text = "the quick brown fox jumps over the lazy dog tonight"
    # clean uses the FIXTURE vocabulary (the model only knows hashed
    # fixture tokens — an out-of-vocabulary doc would score on the
    # intercept alone); junky carries the degradation signature
    clean = "key agg row scan slow fast table value part hash merge join"
    junky = "key agg zq0 scan slow zq1 table value zq2 hash zq3 join zq4"
    index_path = str(tmp_path / "index")
    build_minhash_index(
        spark.createDataFrame([(1, corpus_text)], "doc_id long, text string"),
        index_path,
    )
    batch = spark.createDataFrame(
        [(100, clean), (101, junky)], "doc_id long, text string"
    )
    man = curate_admission_pipeline(
        spark, index_path, batch, quality_model=model
    )
    assert {r["doc_id"] for r in man.collect()} == {100}
    # the dropped doc never entered the index either
    indexed = {r["doc_id"] for r in spark.read.parquet(index_path).collect()}
    assert indexed == {1, 100}, indexed


def test_curate_model_twin_model_agrees_with_labels(spark):
    """`curate_model_twin` (r18, VERDICT r17 item 3): the swept entry's
    premise — the trained model's >= 0.5 decision equals the
    construction label on every heuristic-surviving batch doc — holds
    at the fixture, and the manifest admits only even (clean) ids."""
    from nytimes_batch_processor_spark.operators.text import (
        curate_model_twin,
    )

    rows = curate_model_twin(spark, "/root/testdata/sf0.001").collect()
    assert rows, "empty manifest — the composed pipeline admitted nothing"
    assert all(r["model_matches_labels"] for r in rows)
    odd = [r["doc_id"] for r in rows if r["doc_id"] % 2 == 1]
    assert odd == [], f"model-dropped ids leaked into the manifest: {odd}"
