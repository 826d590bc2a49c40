#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the engine's headline
queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes to completion through the noop sink (full plan runs,
nothing collected to the driver — the honest way to time a distributed
plan). Methodology: one UNMEASURED pass over every headline query warms
JVM/JIT/codegen and the parquet read path, then THREE passes are timed
and the per-query MINIMUM is reported — steady-state numbers with a
noise bound, which is what a long-running engine's latency actually is.
(r1 numbers were cold-start; r2 added the warmup pass; r3 added
min-of-2 because single-pass deltas of +-0.4s on sub-2s queries were
run noise; r7 added a third pass for sub-second queries; r9 made the
third pass universal after min-of-2 left a ~20% band on multi-second
queries, and added the env_factor micro-anchor for host drift; r20
BRACKETED the anchors — measured min-of-5 both BEFORE and AFTER the
timed passes, effective wall = per-anchor min of the two brackets,
per-anchor drift recorded — after the r18->r19 corrected-total swing
(~19% on flat raw walls) turned out to be single-shot anchor noise:
one mismeasured anchor run silently rescaled every corrected wall of
its round, and nothing in the record could bound it.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nytimes_batch_processor_spark.catalog import all_specs
from nytimes_batch_processor_spark.flagship import flagship
from nytimes_batch_processor_spark.session import get_spark


def curation_pipeline(spark, sf_dir: str):
    """Bench-only wrapper for the COMPOSED curation chain (VERDICT r11
    item 4's 'natural bench flagship successor'): quality -> PII
    redact -> near-dup ADMISSION (index probe + within-batch
    self-probe + index growth, r14) -> shard/pack manifest over the
    doc_id%10==0 batch. The base corpus index is session-cached (built
    once in warmup via minhash_index_for); because the pipeline now
    GROWS its index, every pass admits against a fresh driver-side
    clone — so the timed wall covers clone + admission writes +
    manifest, the true steady-state cost of one arriving batch (it
    rose vs the r13 probe-only semantics by design; see SURVEY §19
    r14). Not a catalog entry: correctness is carried by
    `curate_admission_twin` and the BENCH_sf1 pipe_* family; this
    headline slot tracks the end-to-end wall per round."""
    from pyspark.sql import functions as F

    from nytimes_batch_processor_spark.operators.dedup import (
        _PROBE_BATCH_MOD,
        minhash_index_for,
    )
    from nytimes_batch_processor_spark.operators.text import (
        curate_admission_pipeline,
    )
    from nytimes_batch_processor_spark.sources import load_tables
    from nytimes_batch_processor_spark.tables import clone_parquet_dir

    index_path = clone_parquet_dir(minhash_index_for(spark, sf_dir))
    batch = load_tables(spark, sf_dir, "documents").documents.filter(
        F.col("doc_id") % _PROBE_BATCH_MOD == 0
    )
    return curate_admission_pipeline(spark, index_path, batch)

HEADLINE = [
    "agg_pricing_summary",
    "filter_project_revenue",
    "join_broadcast_star",
    "join_theta_range",
    "agg_distinct_counts",
    "window_rank_topk_per_group",
    "window_range_rolling_7d",
    "sessionize_gap_surface",  # r9: merged islands + native session_window
    "q3_shipping_priority",
    "dedup_exact_union",
    "dedup_minhash_lsh",
    "sim_cosine_topk_bruteforce",
    "sim_ann_lsh_topk",
    "sim_ann_ivf_topk",  # probe-only: ivf_build_index runs once in warmup
    # (r11: the entry became self-judging — its wall now includes the
    # in-query brute-force recall judge, so compare to r10 and earlier
    # per-query numbers with that shape change in mind)
    "text_quality_score",
    "fn_json_surface",
    # r5 additions (r3/r4 comparisons stay per-query; total covers +3)
    "sim_ann_ivf_fixed_topk",
    "pack_sequences_offsets",
    # r6 additions. The stateful twin is a PYTHON-path operator by
    # design (it replays the streaming state machine's fold per group);
    # its ~3.2s at sf0.1 is ~all grouped-map per-group dispatch — see
    # its docstring's measured cost model before reading it as a
    # regression.
    "sim_ann_ivf_q8_serve",
    # r12: the two replay twins consolidated into one tagged surface
    # (stateful_running_totals_twin + sessionize_timers_twin, -2/+1 for
    # sweep-window capacity) — its wall is the SUM of the two branches
    # earlier rounds timed separately (~1.1s + ~1.3s at sf0.1).
    "stateful_twin_surface",
    # r7 addition: iterative graph workload (6 power-iteration steps,
    # localCheckpoint-truncated lineage — wall time is 6 join+agg rounds
    # over the ~600k-edge trade graph at sf0.1).
    "graph_pagerank_fixed",
    # r8 additions: the prefix-filtered containment join is a NEW
    # headline capability (df-ranked probe prefix + exact verify); the
    # timers twin is a grouped-map replay like the stateful twin above —
    # same per-group Python-dispatch cost model, see its docstring.
    "dedup_containment_prefix",
    # r8: integer-Lloyd IVF training — two map-only assign passes + two
    # k*dim-row centroid updates with a driver-side divide, so its wall
    # is mostly fixed job overhead at sf0.1 (2k vectors).
    "ivf_kmeans_int_train",
    # r11: incremental near-dup probe — batch signatures (map-only) +
    # band equi-join against the persisted corpus index. The index
    # itself builds once per session in warmup (minhash_index_for), so
    # the timed passes measure the probe, the production steady state.
    "dedup_incremental_probe",
    # r11 (late): the ANN half of the incremental story — batch cell
    # ranking (map-only) + bounded-broadcast cell equi-join against the
    # persisted cell-partitioned IVF parquet index (built once per
    # session in warmup via ivf_parquet_index_for). Wall includes the
    # in-query exact-cosine admission verdicts and the per-query
    # rank/count window over the bounded candidate set.
    "sim_incremental_probe",
    # r12: the streaming-admission batch twin — fresh index build over
    # the 20% corpus slice + two sequential admission steps (probe,
    # within-batch canonicalize, sink upsert, index append) per run;
    # unlike the probe entries above, the index build is INSIDE the
    # timed body (each admission run is a new index lifecycle), so its
    # wall is build + 2 probes + 2 appends.
    "stream_admission_twin",
    # r15: span-level exact-substring dedup — K-token window hashing
    # (map-only md5 over each 25-token window), ONE exchange on the
    # window hash for the frequency valve + self-join, diagonal-island
    # merge to maximal spans. Wall is dominated by the window md5 pass
    # (~K x corpus text bytes hashed), the deliberate portable-hash
    # trade documented in exact_substring_windows.
    "dedup_exact_substring_spans",
    # r15 (late): the incremental half — fixed batch windows broadcast
    # into a DPP-pruned bucket join against the persisted window index
    # (built once per session in warmup via window_index_for), spans
    # merged from the collision set. The timed passes measure the
    # PROBE, the production steady state.
    "dedup_incremental_spans",
    # r16: semantic (embedding-cosine) dedup — map-only 2-nearest-cell
    # assignment (one F.expr centroid literal), ONE exchange for the
    # within-shared-cell exact-cosine self-join (~500k candidate pairs
    # x 64-dim dot at sf0.1 under k=16), min-id verdict groupBy.
    "dedup_semantic_embedding",
    # r16 (late): the ANN admission twin — like stream_admission_twin,
    # each run is TWO full admission lifecycles (clone the session-
    # cached corpus index, then per batch: pinned assignment, DPP cell
    # probe, within-batch self-probe, ledger checkpoint, sink-less
    # admit, index append at precomputed cells) — ~a dozen small jobs,
    # so its ~7s at sf0.1 is fixed lifecycle overhead + genuine
    # admission cost, not a scan problem.
    "stream_ann_admission_twin",
    # r17: BPE-tokenized packing — the mapInPandas greedy-merge encode
    # (the engine's second Python hot path, Arrow-batched like the
    # multimodal workers) feeding the existing two-level-scan packer;
    # ~2s at sf0.1, encode-dominated.
    "pack_sequences_bpe",
    # r17: span-level train/test decontamination on the shared
    # ExactSubstr chain — window md5 pass + train/test window-hash
    # equi-join + maximal-span merge; ~2s at sf0.1.
    "decon_leak_spans",
    # quality_classifier_surface deliberately NOT here: its ~8s wall is
    # MLlib L-BFGS fixed overhead (flat at x10 — qc_train_wall_sec in
    # BENCH_sf1.json carries its cost model), which would spend ~33s of
    # the driver's 550s budget re-measuring job-scheduling noise.
]


# --- environment micro-anchor (VERDICT r8 item 6) -------------------------
# Three fixed queries whose PLANS never change with engine code: a codegen
# CPU loop, a fixed-key shuffle, and a parquet scan-aggregate. Their
# min-of-5 wall, against the reference values recorded on the r9 bench
# host, quantifies per-run environment drift — three rounds (r6-r8)
# explained +8-16% like-for-like totals as sandbox drift via ad-hoc
# worktree experiments; env_factor makes that a standing, recorded
# number. REF values assume the default sf0.1 fixture for the scan
# anchor (the driver's per-round configuration). Replication noise of
# the anchors themselves (measured r9, 3 sessions x min-of-5): cpu +-6%,
# shuffle +-3%, scan +-20%; the geometric mean resolves the >=8% drifts
# the factor exists to catch. REF calibrated from anchors run INSIDE a
# full r9 bench process (post-warmup JIT state differs measurably from a
# bare session — standalone probes read ~15% slower).
_ANCHOR_REF = {
    "anchor_cpu": 0.42,
    "anchor_shuffle": 0.31,
    "anchor_scan": 0.125,
    # seeded r18 (same idle-host, in-process protocol as the r9 trio):
    # Arrow-batched mapInPandas with a pure-Python per-row loop — the
    # Python-WORKER axis the JVM anchors cannot see. Motivated by the
    # r18 pre-commit probe: the host read cpu 0.88 / shuffle 1.60, and
    # pack_sequences_bpe (Python-encode-dominated) banded +20% under
    # the 3-class blend but re-banded to +4% under min-of-5 — the
    # drift it actually sees lives on this axis.
    "anchor_python": 0.48,
}

# --- per-anchor-class correction (VERDICT r16 item 1) ---------------------
# A single composite env_factor cannot correct a shuffle-only host
# regression: on the r16 driver host the shuffle anchor read 1.51x REF
# while cpu read 0.82x, the composite read 1.12x, and 19 code-unchanged
# queries were manufactured into movers. Each query therefore carries a
# WEIGHT VECTOR over the three anchor classes; its corrected wall is
# wall / (w . class_drift). Weights were fitted over the r9-r16 recorded
# min-walls against the per-round anchor drift ratios (grid search on
# the 2-simplex minimizing log-residual variance — `tools/anchor_fit.py`
# reproduces the table), then sanity-checked against each plan's shape:
# graph_pagerank (six exchange rounds) fits 0.75 shuffle,
# text_quality_score (scan + map-only scoring) fits 0.80 scan,
# dedup_incremental_probe (signature hashing + band equi-join) fits
# 0.50/0.45/0.05 — the fit recovers what the plans say. Entries whose
# bench shape changed mid-history are fitted on their stable window
# only (sim_ann_ivf_topk from r11, rmse 0.40 -> 0.095). Entries too new
# to fit (<4 rounds) are assigned from their plan shape and marked
# provisional; unknown names fall back to the composite factor.
# Python shares (final state, r20): anchor_fit fits the 4-class model —
# pre-r18 rounds constrain the JVM proportions through the same
# renormalized blend _class_corrected applies, python-anchored rounds
# identify the python share. The build ends with TWO python-anchored
# rounds recorded (r18, r19; r20 pending), below the >= 4 criterion, so
# the provisional r20 fit is RECORDED (SURVEY §25) but NOT promoted:
# every >= 4-round query fits w_python = 0.00 at n_python = 2 (no
# python-share evidence either way — two rounds of python drift are
# absorbable by the JVM classes), and pack_sequences_bpe — the one
# genuinely Python-dominated headline — has only 2 anchored bench
# rounds total (r17's anchors died with its truncated record), so its
# 4-tuple below stays PLAN-SHAPE assigned, provisional, and excluded
# from any gating. Caveat for a future refit: against a history with
# JVM-only rounds the fittable python share is censored at 0.95
# (anchor_fit reports the edge — ADVICE r19 #3).
_ANCHOR_WEIGHTS: dict[str, tuple[float, float, float]] = {
    # name: (w_cpu, w_shuffle, w_scan)
    "agg_pricing_summary": (0.25, 0.55, 0.20),
    "filter_project_revenue": (0.45, 0.50, 0.05),
    "join_broadcast_star": (0.15, 0.45, 0.40),
    "join_theta_range": (0.35, 0.25, 0.40),
    "agg_distinct_counts": (0.20, 0.40, 0.40),
    "window_rank_topk_per_group": (0.30, 0.45, 0.25),
    "window_range_rolling_7d": (0.35, 0.35, 0.30),
    "sessionize_gap_surface": (0.45, 0.20, 0.35),
    "q3_shipping_priority": (0.45, 0.40, 0.15),
    "dedup_exact_union": (0.30, 0.50, 0.20),
    "dedup_minhash_lsh": (0.45, 0.45, 0.10),
    "sim_cosine_topk_bruteforce": (0.35, 0.45, 0.20),
    "sim_ann_lsh_topk": (0.35, 0.65, 0.00),
    "sim_ann_ivf_topk": (0.00, 0.75, 0.25),  # fitted r11+ (shape change)
    "text_quality_score": (0.05, 0.15, 0.80),
    "fn_json_surface": (0.35, 0.35, 0.30),
    "sim_ann_ivf_fixed_topk": (0.45, 0.40, 0.15),
    "pack_sequences_offsets": (0.30, 0.55, 0.15),
    "sim_ann_ivf_q8_serve": (0.40, 0.50, 0.10),
    "stateful_twin_surface": (0.00, 0.65, 0.35),
    "graph_pagerank_fixed": (0.15, 0.75, 0.10),
    "dedup_containment_prefix": (0.40, 0.30, 0.30),
    "ivf_kmeans_int_train": (0.45, 0.55, 0.00),
    "dedup_incremental_probe": (0.50, 0.45, 0.05),
    "sim_incremental_probe": (0.35, 0.45, 0.20),
    "stream_admission_twin": (0.45, 0.50, 0.05),
    "curation_pipeline": (0.35, 0.55, 0.10),  # fitted r14+ (shape change)
    "flagship": (0.25, 0.55, 0.20),
    # provisional (plan-shape assigned; <4 fitted rounds as of r17):
    "dedup_exact_substring_spans": (0.60, 0.25, 0.15),  # md5 window pass
    "dedup_incremental_spans": (0.35, 0.45, 0.20),  # DPP probe join
    "dedup_semantic_embedding": (0.50, 0.40, 0.10),  # exact-cos compare
    "stream_ann_admission_twin": (0.40, 0.50, 0.10),  # admission lifecycle
    # 4-tuple (cpu, shuffle, scan, python): the encode dominates and
    # lives on the Python-worker axis (r18 — the +20%-banded/-+4%-real
    # mover that motivated anchor_python)
    "pack_sequences_bpe": (0.20, 0.20, 0.05, 0.55),
    "decon_leak_spans": (0.50, 0.35, 0.15),  # window md5 + hash equi-join
}

_CLASS_TO_ANCHOR = {
    "cpu": "anchor_cpu",
    "shuffle": "anchor_shuffle",
    "scan": "anchor_scan",
    # r18: the Python-worker axis (Arrow transfer + Python bytecode) —
    # drifts independently of JVM cpu (a host can JIT fast and fork
    # Python workers slow). Weight vectors are 3-tuples unless a query
    # is Python-hot; zip() pads the missing class with weight 0.
    "python": "anchor_python",
}


def _class_corrected(
    timings: dict[str, float | None],
    anchor_walls: dict[str, float],
    env_factor: float | None,
) -> tuple[dict[str, float], dict[str, float], dict[str, str]]:
    """(per-class drift factors, per-query corrected walls, per-query
    dominant-class tags). A query's corrected wall divides by the
    weight-blended drift over the anchor classes that actually produced
    a wall this run (weights renormalized when e.g. the scan anchor is
    absent at sf != 0.1); unfitted names divide by the composite, and
    when no correction is derivable at all the RAW wall is recorded
    (divide by 1.0) so `value_env_corrected_by_class` always sums the
    same query set as `value` — a varying subset would make the
    headline class-corrected total non-like-for-like across rounds
    (ADVICE r17)."""
    drift = {
        cls: round(anchor_walls[a] / _ANCHOR_REF[a], 3)
        for cls, a in _CLASS_TO_ANCHOR.items()
        if a in anchor_walls
    }
    corrected: dict[str, float] = {}
    classes: dict[str, str] = {}
    for name, wall in timings.items():
        if wall is None:
            continue
        w = _ANCHOR_WEIGHTS.get(name)
        if w is not None:
            order = ("cpu", "shuffle", "scan", "python")
            avail = [(c, wt) for c, wt in zip(order, w) if c in drift and wt > 0]
            mass = sum(wt for _, wt in avail)
            if avail and mass > 0:
                blended = sum(wt / mass * drift[c] for c, wt in avail)
                corrected[name] = round(wall / blended, 3)
                classes[name] = max(avail, key=lambda t: t[1])[0]
                continue
        corrected[name] = round(wall / env_factor, 3) if env_factor else wall
    return drift, corrected, classes


def _anchor_python_work(batches):
    """The python-anchor workload: a pure-Python per-row loop with a
    dict memo over Arrow batches — the `bpe_token_counts` cost shape
    (Python bytecode + Arrow transfer), fixed at 4M rows over 8
    partitions so the measurement is host-drift, never plan drift.
    (4M rows ~ 0.9s: the 1.5M draft read +-30% run noise.)"""
    import pandas as pd

    for pdf in batches:
        cache: dict[int, int] = {}
        acc = 0
        for v in pdf["id"]:
            k = int(v) % 997
            c = cache.get(k)
            if c is None:
                c = cache[k] = (k * 31 + 7) % 101
            acc += c
        yield pd.DataFrame({"s": [acc]})


def _env_anchor(spark, sf_dir: str, sf: float) -> dict[str, float]:
    """One anchor BRACKET: each fixed workload warmed once then timed
    min-of-5. The scan anchor's REF is only meaningful against the
    sf0.1 fixture, so at any other sf it is skipped and the factor is
    derived from the data-independent anchors alone (cpu, shuffle,
    and — since r18 — python). An anchor that throws is simply absent
    from the returned walls — an anchor failure must never cost the
    round its query numbers (the r4 lesson; r9 self-review)."""
    anchors = {
        "anchor_cpu": lambda: spark.range(4_000_000_000)
        .selectExpr("sum(id % 7) AS s")
        .collect(),
        "anchor_shuffle": lambda: spark.range(100_000_000)
        .selectExpr("id % 4096 AS k")
        .groupBy("k")
        .count()
        .selectExpr("sum(count) AS s")
        .collect(),
        "anchor_python": lambda: spark.range(4_000_000, numPartitions=8)
        .mapInPandas(_anchor_python_work, "s long")
        .selectExpr("sum(s) AS s")
        .collect(),
    }
    if sf == 0.1:
        anchors["anchor_scan"] = (
            lambda: spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .selectExpr(
                "sum(l_quantity) AS s", "sum(l_extendedprice) AS p", "count(*) AS n"
            )
            .collect()
        )
    walls: dict[str, float] = {}
    for name, fn in anchors.items():
        try:
            fn()  # unmeasured warmup, same policy as queries
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                fn()
                ts.append(time.perf_counter() - t0)
            walls[name] = round(min(ts), 3)
        except Exception:  # noqa: BLE001 — anchors must never kill the bench
            continue
    return walls


def _bracket_anchors(
    pre: dict[str, float], post: dict[str, float]
) -> tuple[dict[str, float], dict[str, float], float | None]:
    """(effective walls, per-anchor drift, composite env_factor) from
    the two brackets (r20, VERDICT r19 item 1). Effective wall = the
    per-anchor MIN of the brackets — min-of-10 across the suite, and
    comparable to the REF values (calibrated post-warmup: min favors
    the warmed reading). Drift = post/pre, the recorded bound on how
    much the host moved UNDER the suite; a drift far from 1.0 says the
    corrected walls of that class carry that much anchor uncertainty.
    An anchor present in only one bracket contributes its single wall
    and reports no drift."""
    walls = {
        k: min(v for v in (pre.get(k), post.get(k)) if v is not None)
        for k in {*pre, *post}
    }
    drift = {
        k: round(post[k] / pre[k], 3) for k in pre if k in post and pre[k] > 0
    }
    ratios = [walls[k] / _ANCHOR_REF[k] for k in walls]
    if not ratios:
        return walls, drift, None
    geomean = 1.0
    for r in ratios:
        geomean *= r
    return walls, drift, round(geomean ** (1 / len(ratios)), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("engine-bench", cpus=cpus)

    specs = all_specs()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    errors: dict[str, str] = {}

    def run(name: str) -> float | None:
        # One broken query must not kill the whole bench (the r4 lesson:
        # a warmup-pass AnalysisException shipped zero numbers). Record
        # the error once, report None for the timing, keep going.
        if name in errors:
            return None
        # KeyError on a stale HEADLINE entry = fail loudly, never mislabel
        if name == "flagship":
            fn = flagship
        elif name == "curation_pipeline":
            fn = curation_pipeline
        else:
            fn = specs[name].fn
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001 — isolate per query
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            return None
        return round(time.perf_counter() - t0, 3)

    all_names = [*HEADLINE, "curation_pipeline", "flagship"]
    for name in all_names:  # warmup pass: JIT/codegen/read-path, unmeasured
        run(name)
    # PRE bracket (r20): anchors measured min-of-5 after query warmup
    # (the REF-comparable JIT state) but BEFORE the timed passes — so
    # the suite is bracketed and single-shot anchor mismeasurement is
    # bounded by the recorded pre/post drift instead of silently
    # rescaling the round's corrected walls (the r18->r19 swing).
    try:
        anchor_pre = _env_anchor(spark, sf_dir, sf)
    except Exception:  # noqa: BLE001 — anchors must never kill the bench
        anchor_pre = {}
    # THREE timed passes for every query (r9; r3 added min-of-2, r7 a
    # third pass for sub-second queries only): same-code r9 runs showed
    # min-of-2 leaving a ~20% band on multi-second queries too
    # (graph_pagerank_fixed 3.9 <-> 4.8s), which reads as regression
    # noise across rounds. The extra full pass costs ~35s against the
    # driver's 550s budget and halves the per-query noise band.
    passes = [
        {name: run(name) for name in all_names},
        {name: run(name) for name in all_names},
        {name: run(name) for name in all_names},
    ]
    # A name in `errors` reports None even if one pass succeeded: a
    # timing and an error for the same query would contradict each other
    # in the artifact (ADVICE r5). Errors alone carry the failure.
    timings: dict[str, float | None] = {
        name: (
            min(ts)
            if name not in errors
            and (ts := [p[name] for p in passes if name in p and p[name] is not None])
            else None
        )
        for name in all_names
    }

    try:
        anchor_post = _env_anchor(spark, sf_dir, sf)
    except Exception:  # noqa: BLE001 — belt over _env_anchor's own braces
        anchor_post = {}
    anchor_walls, anchor_drift, env_factor = _bracket_anchors(
        anchor_pre, anchor_post
    )

    ok = {k: v for k, v in timings.items() if v is not None}
    total = round(sum(ok.values()), 3)
    drift_by_class, corrected_q, class_tags = _class_corrected(
        timings, anchor_walls, env_factor
    )
    # Two-line output protocol (VERDICT r17 item 1): the r17 single line
    # grew past the driver's 2,000-char capture window when the per-class
    # fields landed, so BENCH_r17.json recorded `parsed: null`. The
    # per-class DETAIL now goes on a PRECEDING line (and a sidecar file
    # next to this script, for humans and bench_trend), and the FINAL
    # printed line is the compact r16-schema object the driver's parser
    # has consumed since r9 — plus the one scalar class-corrected total.
    detail = {
        "metric": "headline_queries_class_detail",
        # r17: per-anchor-class correction (VERDICT r16 item 1). The
        # class-corrected numbers are the ones to adjudicate movers
        # with — a shuffle-only host regression lands on the shuffle-
        # weighted queries and nowhere else.
        "env_factor_by_class": drift_by_class,
        "query_anchor_class": class_tags,
        "queries_env_corrected": corrected_q,
        # r20: the raw brackets behind the final line's effective
        # (min) anchors — pre runs after query warmup, post after the
        # timed passes; both are min-of-5 per anchor.
        "env_anchor_pre": anchor_pre,
        "env_anchor_post": anchor_post,
    }
    out = {
        "metric": "headline_queries_wall_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # env_factor ~1.0 on the r9 reference host; divide the total (or
        # any per-query wall) by it to compare across rounds net of
        # sandbox drift. value_env_corrected is that division, recorded.
        # Since r20 env_anchor is the per-anchor MIN of the pre/post
        # brackets (raw brackets on the detail line / sidecar) and
        # env_anchor_drift records post/pre — the bound on anchor
        # trustworthiness this round.
        "env_anchor": anchor_walls,
        "env_anchor_drift": anchor_drift,
        "env_factor": env_factor,
        "value_env_corrected": (
            round(total / env_factor, 3) if env_factor else total
        ),
        "value_env_corrected_by_class": round(sum(corrected_q.values()), 3),
    }
    if errors:
        out["errors"] = errors
        out["failed_count"] = len(errors)
    try:
        sidecar = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_CLASS_DETAIL.json"
        )
        with open(sidecar, "w") as f:
            json.dump({**detail, **out}, f, indent=1)
    except OSError:
        pass  # the sidecar is a convenience; stdout carries the record
    print(json.dumps(detail))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
