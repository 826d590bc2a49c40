"""Unit tests for the scale gate's pass/fail arithmetic
(tools/scale_bench.py::compute_gate). The gate caught a real silent
cross-product in r7 — its own math must therefore be trustworthy
without a 10-minute Spark run: synthetic per-scale rows exercise the
linear pass, the quadratic fail, and the iterative-rounds fail."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from scale_bench import (  # noqa: E402
    COUNT_KEYS,
    FLAT_KEYS,
    FLAT_WALL_KEYS,
    MERGE_EQ_KEYS,
    MH_OCCUPANCY_KEY,
    OCCUPANCY_KEY,
    INVARIANT_BOOL_KEYS,
    QC_AUC_FLOOR,
    QC_AUC_KEY,
    PIPE_EQ_KEYS,
    SEM_PERSIST_BOOL_KEYS,
    WALL_KEYS,
    compute_gate,
)


def _row(scale: int, count_mult: float = 1.0, rounds: int = 4, merge_parts: int = 9) -> dict:
    row = {k: int(1000 * scale * count_mult) for k in COUNT_KEYS}
    # flat-expected counts: a fixed batch vs a grown index holds steady
    row.update({k: 1000 for k in FLAT_KEYS})
    row.update({k: 1.0 * scale for k in WALL_KEYS})
    row["cc_rounds"] = rounds
    # MERGE counters are scale-INVARIANT by design (fixed change batch)
    row.update({k: merge_parts for k in MERGE_EQ_KEYS})
    # composed-pipeline admitted set is scale-INVARIANT by design
    # (replicas are within-batch dups of their base twins, r14)
    row.update({k: 750 for k in PIPE_EQ_KEYS})
    # flat-claimed walls (the O(1) admission sink step)
    row.update({k: 1.2 for k in FLAT_WALL_KEYS})
    # IVF occupancy skew: ~2x uniform (1/16), well inside the bound
    row[OCCUPANCY_KEY] = 0.12
    # MinHash band-bucket skew: a healthy admitted index (r15 twin axis)
    row[MH_OCCUPANCY_KEY] = 0.05
    # trained-classifier holdout AUC: separable-by-construction task
    row[QC_AUC_KEY] = 0.99
    # persisted-SemDedup invariants: bucketed layout equal + co-located
    row.update({k: True for k in SEM_PERSIST_BOOL_KEYS})
    # per-scale correctness invariants (packer token conservation)
    row.update({k: True for k in INVARIANT_BOOL_KEYS})
    return row


def test_linear_growth_passes():
    out = compute_gate({"x1": _row(1), "x10": _row(10)}, 10, "base")
    assert out["linear_ok"] and out["rounds_ok"]
    assert out["value"] == 10.0
    assert out["cc_rounds_x1_x10"] == [4, 4]


def test_two_x_slack_is_the_boundary():
    ok = compute_gate({"x1": _row(1), "x10": _row(10, 2.0)}, 10, "b")
    assert ok["linear_ok"]  # exactly 2x over linear: allowed
    bad = compute_gate({"x1": _row(1), "x10": _row(10, 2.1)}, 10, "b")
    assert not bad["linear_ok"]


def test_quadratic_growth_fails_loud():
    out = compute_gate({"x1": _row(1), "x10": _row(10, 10.0)}, 10, "b")
    assert not out["linear_ok"]
    assert out["value"] == 100.0


def test_one_degenerate_family_fails_everything():
    hi = _row(10)
    hi["simhash_collisions"] = 1000 * 10 * 50  # one family goes rogue
    out = compute_gate({"x1": _row(1), "x10": hi}, 10, "b")
    assert not out["linear_ok"]


def test_merge_invariance_gate_demands_equality():
    """The MERGE family gates on EQUALITY, not a ratio: a fixed change
    batch touching even one extra partition at x10 means merge cost
    leaked a dependence on table size."""
    ok = compute_gate({"x1": _row(1), "x10": _row(10)}, 10, "b")
    assert ok["merge_ok"] and ok["linear_ok"]
    bad_hi = _row(10)
    bad_hi["merge_partitions_rewritten"] += 1
    bad = compute_gate({"x1": _row(1), "x10": bad_hi}, 10, "b")
    assert not bad["merge_ok"] and not bad["linear_ok"]


def test_rounds_gate_bounds_log_growth():
    ok = compute_gate({"x1": _row(1, rounds=4), "x10": _row(10, rounds=8)}, 10, "b")
    assert ok["rounds_ok"] and ok["linear_ok"]  # +4: the log2(10) worst case
    bad = compute_gate({"x1": _row(1, rounds=4), "x10": _row(10, rounds=9)}, 10, "b")
    assert not bad["rounds_ok"] and not bad["linear_ok"]  # O(n)-ish walking


def test_flat_keys_gate_at_constant_bound():
    """The index-scaled flat invariants (fixed batch vs grown corpus
    index) are gated at a CONSTANT 2x, not the linear 2*factor bound —
    a MinHash candidate mass that merely doubles under a x10
    shingle-disjoint corpus is already band-bucket degeneration the
    linear bound would wave through."""
    ok_hi = _row(10)
    for k in FLAT_KEYS:
        ok_hi[k] = 2000  # exactly 2x: allowed
    assert compute_gate({"x1": _row(1), "x10": ok_hi}, 10, "b")["linear_ok"]
    bad_hi = _row(10)
    bad_hi["ix_probe_candidates"] = 2100  # 2.1x flat drift: fails
    out = compute_gate({"x1": _row(1), "x10": bad_hi}, 10, "b")
    assert not out["linear_ok"]
    # ...even though 2.1x is far inside the LINEAR families' 20x bound
    assert out["ratios_x10_over_x1"]["ix_probe_candidates"] == 2.1


def test_occupancy_gate_is_an_absolute_bound():
    """The IVF occupancy check (VERDICT r11 item 2) gates every scale's
    ix_ann_max_cell_share at the ABSOLUTE similarity.IVF_MAX_CELL_SHARE
    bound — a hot cell breaks the probe's bounded-broadcast claim at
    any scale, so a ratio bound (skew 'only' doubling) would miss an
    index that was born skewed."""
    from nytimes_batch_processor_spark.operators.similarity import (
        IVF_MAX_CELL_SHARE,
    )

    ok_hi = _row(10)
    ok_hi[OCCUPANCY_KEY] = IVF_MAX_CELL_SHARE  # at the bound: allowed
    out = compute_gate({"x1": _row(1), "x10": ok_hi}, 10, "b")
    assert out["occupancy_ok"] and out["linear_ok"]

    # a skewed x1 index fails even when the x10 index is healthy
    bad_lo = _row(1)
    bad_lo[OCCUPANCY_KEY] = IVF_MAX_CELL_SHARE + 0.01
    out = compute_gate({"x1": bad_lo, "x10": _row(10)}, 10, "b")
    assert not out["occupancy_ok"] and not out["linear_ok"]


def test_pipe_admitted_set_gate_demands_equality():
    """The composed pipeline's admitted-set metrics gate on EQUALITY
    (r14): a x10 batch of unperturbed id-offset replicas must admit
    exactly the base set — a single surviving replica means the
    within-batch self-probe broke, and under the pre-r14 probe-only
    semantics these counts grew linearly (every duplicate shipped)."""
    ok = compute_gate({"x1": _row(1), "x10": _row(10)}, 10, "b")
    assert ok["linear_ok"]
    bad_hi = _row(10)
    bad_hi["pipe_admitted_docs"] += 1
    out = compute_gate({"x1": _row(1), "x10": bad_hi}, 10, "b")
    assert not out["linear_ok"]


def test_flat_wall_gate_catches_sink_scan_regression():
    """adm_sink_wall_sec claims O(1) in sink size: gated at a CONSTANT
    2x, so a reintroduced whole-sink anti-join scan (linear wall
    growth, ~10x at x10) fails even though the generic wall families
    would allow 20x."""
    ok_hi = _row(10)
    ok_hi["adm_sink_wall_sec"] = 2.4  # exactly 2x over the x1 1.2s
    assert compute_gate({"x1": _row(1), "x10": ok_hi}, 10, "b")["linear_ok"]
    bad_hi = _row(10)
    bad_hi["adm_sink_wall_sec"] = 12.0  # O(sink) scan shape
    assert not compute_gate({"x1": _row(1), "x10": bad_hi}, 10, "b")["linear_ok"]


def test_flat_wall_gate_floors_subsecond_noise():
    """The flat-wall gate decides linear_ok, and the measured walls are
    sub-second — so the RATIO is computed on floored values (ADVICE
    r14): a 0.2s->0.55s GC jitter (2.75x raw) must pass, while a
    genuine O(sink) regression (0.4s -> 4s) still fails. The raw
    un-floored ratio stays recorded in the artifact for trend reading."""
    lo = _row(1)
    lo["adm_sink_wall_sec"] = 0.2
    noisy_hi = _row(10)
    noisy_hi["adm_sink_wall_sec"] = 0.55  # 2.75x raw, pure jitter scale
    gate = compute_gate({"x1": lo, "x10": noisy_hi}, 10, "b")
    assert gate["linear_ok"], gate
    assert gate["ratios_x10_over_x1"]["adm_sink_wall_sec"] == 2.75

    lo2 = _row(1)
    lo2["adm_sink_wall_sec"] = 0.4
    bad_hi = _row(10)
    bad_hi["adm_sink_wall_sec"] = 4.0  # past the floor: real regression
    assert not compute_gate({"x1": lo2, "x10": bad_hi}, 10, "b")["linear_ok"]


def test_mh_bucket_occupancy_gate_is_absolute_or_nonconcentrating():
    """The MinHash occupancy axis (r15): a scale passes when its
    hottest band-bucket share is inside the healthy absolute bound
    (dedup.MINHASH_MAX_BUCKET_SHARE) OR no more concentrated than the
    base fixture (x1 share * 1.2). MinHash buckets are content-defined
    — the dup-heavy fixture's raw corpus index legitimately measures
    ~0.35 at x1 — so the gated SCALE claim is that growth must not
    POOL random collisions into buckets (hash-width degeneration),
    while the absolute bound stays the admission-maintained-index
    contract."""
    from nytimes_batch_processor_spark.operators.dedup import (
        MINHASH_MAX_BUCKET_SHARE,
    )

    # dup-heavy base (above the absolute bound) diluting with growth:
    # the fixture's real shape — passes
    lo = _row(1)
    lo[MH_OCCUPANCY_KEY] = 0.35
    hi = _row(10)
    hi[MH_OCCUPANCY_KEY] = 0.06
    out = compute_gate({"x1": lo, "x10": hi}, 10, "b")
    assert out["occupancy_ok"] and out["linear_ok"]

    # healthy absolute values everywhere: passes regardless of ratio
    hi2 = _row(10)
    hi2[MH_OCCUPANCY_KEY] = MINHASH_MAX_BUCKET_SHARE
    assert compute_gate({"x1": _row(1), "x10": hi2}, 10, "b")["occupancy_ok"]

    # concentration: x10 share both above the bound AND above
    # x1 * 1.2 — random collisions pooling, fails
    hi3 = _row(10)
    hi3[MH_OCCUPANCY_KEY] = 0.5
    out = compute_gate({"x1": lo, "x10": hi3}, 10, "b")
    assert not out["occupancy_ok"] and not out["linear_ok"]

    # base-scale degeneracy (ADVICE r15): a hash already pooled at x1
    # holds ~1.0 at EVERY scale — perfectly "non-concentrating", so the
    # relative arm alone passes it; the hard degeneracy ceiling fails it
    lo4, hi4 = _row(1), _row(10)
    lo4[MH_OCCUPANCY_KEY] = 0.98
    hi4[MH_OCCUPANCY_KEY] = 0.98
    out = compute_gate({"x1": lo4, "x10": hi4}, 10, "b")
    assert not out["occupancy_ok"] and not out["linear_ok"]
    # ...and the ceiling leaves the real fixture's dup-heavy base
    # (~0.35, diluting) untouched: just-under-ceiling base still passes
    lo5, hi5 = _row(1), _row(10)
    lo5[MH_OCCUPANCY_KEY] = 0.55
    hi5[MH_OCCUPANCY_KEY] = 0.3
    assert compute_gate({"x1": lo5, "x10": hi5}, 10, "b")["occupancy_ok"]


def test_qc_auc_floor_is_absolute():
    """r17: a holdout AUC below the floor at ANY scale fails the gate
    even when every growth ratio is clean — the bounded sample or the
    feature hashing stopped carrying the construction signal."""
    lo, hi = _row(1), _row(10)
    hi[QC_AUC_KEY] = QC_AUC_FLOOR  # at the floor: allowed
    out = compute_gate({"x1": lo, "x10": hi}, 10, "b")
    assert out["qc_auc_ok"] and out["linear_ok"]
    hi2 = _row(10)
    hi2[QC_AUC_KEY] = QC_AUC_FLOOR - 0.01
    bad = compute_gate({"x1": lo, "x10": hi2}, 10, "b")
    assert not bad["qc_auc_ok"] and not bad["linear_ok"]


def test_sem_persist_booleans_gate_every_scale():
    """The persisted-SemDedup axis (r17) gates two per-scale booleans:
    the bucketed layout's pair count must EQUAL the in-memory subplan's
    and its executed compare must hold zero Exchange — a single False
    at any scale fails linear_ok."""
    ok = compute_gate({"x1": _row(1), "x10": _row(10)}, 10, "b")
    assert ok["sem_persist_ok"] and ok["linear_ok"]
    for key in SEM_PERSIST_BOOL_KEYS:
        bad_hi = _row(10)
        bad_hi[key] = False
        bad = compute_gate({"x1": _row(1), "x10": bad_hi}, 10, "b")
        assert not bad["sem_persist_ok"] and not bad["linear_ok"], key


def test_invariant_booleans_gate_every_scale():
    """The per-scale correctness invariants (r17: the packer's token
    conservation) gate as booleans: a single False at any scale fails
    linear_ok even with every ratio perfectly linear."""
    ok = compute_gate({"x1": _row(1), "x10": _row(10)}, 10, "b")
    assert ok["invariants_ok"] and ok["linear_ok"]
    for key in INVARIANT_BOOL_KEYS:
        bad_lo = _row(1)
        bad_lo[key] = False
        bad = compute_gate({"x1": bad_lo, "x10": _row(10)}, 10, "b")
        assert not bad["invariants_ok"] and not bad["linear_ok"], key
