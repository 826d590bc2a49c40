"""Property-based invariants (hypothesis) — SURVEY.md §5 item 5:
dedup idempotency, delta/cumsum round-trip, union-then-agg = agg-then-merge.
Generated inputs are tiny; each example is one local Spark job."""

from __future__ import annotations

from hypothesis import example, given, settings, strategies as st

from pyspark.sql import Window as W, functions as F

keys = st.integers(min_value=0, max_value=5)
vals = st.integers(min_value=-1000, max_value=1000)
rows = st.lists(st.tuples(keys, vals), min_size=1, max_size=30)


@settings(max_examples=8, deadline=None)
@given(rows)
def test_dedup_idempotent(data):
    spark = _spark()
    df = spark.createDataFrame(data, "k int, v int")
    once = df.unionAll(df).dropDuplicates()
    twice = once.unionAll(once).dropDuplicates()
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    assert once.count() == df.dropDuplicates().count()


@settings(max_examples=8, deadline=None)
@given(rows)
def test_union_agg_equals_agg_merge(data):
    """sum-by-key over (a ∪ b) == elementwise merge of per-side sums —
    the partial/final aggregation contract Catalyst relies on."""
    spark = _spark()
    half = len(data) // 2
    a = spark.createDataFrame(data[: half + 1], "k int, v int")
    b = spark.createDataFrame(data[half:] or [(0, 0)], "k int, v int")
    merged = dict(
        a.unionAll(b).groupBy("k").agg(F.sum("v").alias("s")).collect()
    )
    pa = dict(a.groupBy("k").agg(F.sum("v").alias("s")).collect())
    pb = dict(b.groupBy("k").agg(F.sum("v").alias("s")).collect())
    manual = {k: pa.get(k, 0) + pb.get(k, 0) for k in set(pa) | set(pb)}
    assert merged == manual


@settings(max_examples=8, deadline=None)
@given(st.lists(vals, min_size=1, max_size=25))
def test_delta_cumsum_roundtrip(series):
    """daily-delta (lag) then running-sum reconstructs the cumulative
    series — the reference-domain invariant (cumulative cases -> new
    cases -> cumulative again)."""
    spark = _spark()
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(series)], "day int, cum int"
    )
    w = W.orderBy("day")
    delta = df.withColumn(
        "new", F.col("cum") - F.coalesce(F.lag("cum").over(w), F.lit(0))
    )
    rebuilt = delta.withColumn(
        "rebuilt", F.sum("new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    )
    assert all(r["rebuilt"] == r["cum"] for r in rebuilt.collect())


@settings(max_examples=6, deadline=None)
@given(rows, rows)
def test_salted_join_equals_plain_join(fact_rows, dim_rows):
    """The skew-salting rewrite must be row-identical to the plain
    equi-join for ANY inputs, including duplicate build-side keys
    (multiplicity must be preserved, not inflated by the replication)."""
    from nytimes_batch_processor_spark.operators.skew import salted_equi_join

    spark = _spark()
    fact = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(fact_rows)], "rid int, k int, v int"
    )
    dim = spark.createDataFrame(dim_rows, "k2 int, w int")
    plain = fact.join(dim, fact["k"] == dim["k2"]).select("rid", "k", "v", "w")
    salted = salted_equi_join(
        fact, dim, "k", "k2", 4, F.pmod(F.xxhash64("rid"), F.lit(4))
    ).select("rid", "k", "v", "w")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


@settings(max_examples=6, deadline=None)
@given(rows, rows)
def test_salted_left_join_equals_plain_left_join(fact_rows, dim_rows):
    """Probe-preserving outer how (left): unmatched PROBE rows appear
    exactly once — salting scatters the probe side, never replicates it,
    so left-outer stays row-identical to the plain join."""
    from nytimes_batch_processor_spark.operators.skew import salted_equi_join

    spark = _spark()
    fact = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(fact_rows)], "rid int, k int, v int"
    )
    dim = spark.createDataFrame(dim_rows, "k2 int, w int")
    plain = fact.join(dim, fact["k"] == dim["k2"], "left").select("rid", "k", "v", "w")
    salted = salted_equi_join(
        fact, dim, "k", "k2", 4, F.pmod(F.xxhash64("rid"), F.lit(4)), how="left"
    ).select("rid", "k", "v", "w")
    assert sorted(map(tuple, plain.collect()), key=repr) == sorted(
        map(tuple, salted.collect()), key=repr
    )


def test_salted_join_rejects_build_preserving_hows():
    """right/full outer would emit each unmatched build row once PER
    SALT REPLICA (n_salts copies instead of one) — the API must refuse,
    not silently corrupt."""
    import pytest

    from nytimes_batch_processor_spark.operators.skew import salted_equi_join

    spark = _spark()
    fact = spark.createDataFrame([(1, 1, 1)], "rid int, k int, v int")
    dim = spark.createDataFrame([(2, 9)], "k2 int, w int")
    scatter = F.pmod(F.xxhash64("rid"), F.lit(4))
    for how in ("right", "full", "outer", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="probe-preserving"):
            salted_equi_join(fact, dim, "k", "k2", 4, scatter, how=how)


asof_left = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=20
)
asof_right = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(-99, 99)),
    min_size=1,
    max_size=20,
)


@settings(max_examples=6, deadline=None)
@given(asof_left, asof_right)
def test_asof_join_matches_bruteforce(left_rows, right_rows):
    """asof_join == per-left-row argmax over {right | key match, ts <=
    left.ts} with ties broken by the largest tie_breaker — checked
    against a brute-force Python model on arbitrary inputs (duplicate
    timestamps included, which is exactly where the window formulation
    could pick the wrong row)."""
    from nytimes_batch_processor_spark.operators.asof import asof_join

    spark = _spark()
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)], "lid int, k int, ts int"
    )
    right = spark.createDataFrame(
        [(i, k, t, v) for i, (k, t, v) in enumerate(right_rows)],
        "rid int, k int, rts int, v int",
    )
    got = {
        r["lid"]: (r["asof_rid"], r["asof_v"])
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_values=["rid", "v"], tie_breaker="rid",
        ).collect()
    }
    for i, (k, t) in enumerate(left_rows):
        matches = [
            (rts, rid, v)
            for rid, (rk, rts, v) in enumerate(right_rows)
            if rk == k and rts <= t
        ]
        expected = (None, None)
        if matches:
            _, rid, v = max(matches)  # latest ts, then largest rid
            expected = (rid, v)
        assert got[i] == expected, f"left row {i}: {got[i]} != {expected}"


def _spark():
    from nytimes_batch_processor_spark.session import get_spark

    return get_spark("engine-tests", cpus=8)


@settings(max_examples=6, deadline=None)
@given(asof_left, asof_right)
def test_asof_forward_matches_bruteforce(left_rows, right_rows):
    """direction='forward': per-left-row argmin over {right | key match,
    ts >= left.ts}, ties (same earliest ts) broken by the LARGEST
    tie_breaker — brute-force model on arbitrary inputs."""
    from nytimes_batch_processor_spark.operators.asof import asof_join

    spark = _spark()
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)], "lid int, k int, ts int"
    )
    right = spark.createDataFrame(
        [(i, k, t, v) for i, (k, t, v) in enumerate(right_rows)],
        "rid int, k int, rts int, v int",
    )
    got = {
        r["lid"]: (r["asof_rid"], r["asof_v"])
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_values=["rid", "v"], tie_breaker="rid", direction="forward",
        ).collect()
    }
    for i, (k, t) in enumerate(left_rows):
        matches = [
            (rts, -rid, v)
            for rid, (rk, rts, v) in enumerate(right_rows)
            if rk == k and rts >= t
        ]
        expected = (None, None)
        if matches:
            rts, neg_rid, v = min(matches)  # earliest ts, then largest rid
            expected = (-neg_rid, v)
        assert got[i] == expected, f"left row {i}: {got[i]} != {expected}"


def test_asof_null_timestamps_match_nothing():
    """NULL timestamps satisfy no inequality: a NULL-ts left row is
    null-extended (not matched to the earliest/latest right row) and a
    NULL-ts right row is never a candidate — in BOTH directions."""
    from nytimes_batch_processor_spark.operators.asof import asof_join

    spark = _spark()
    left = spark.createDataFrame(
        [(0, 1, None), (1, 1, 20)], "lid int, k int, ts int"
    )
    right = spark.createDataFrame(
        [(0, 1, None, 99), (1, 1, 10, 7), (2, 1, 30, 8)],
        "rid int, k int, rts int, v int",
    )
    for direction, expected in (("backward", (1, 7)), ("forward", (2, 8))):
        got = {
            r["lid"]: (r["asof_rid"], r["asof_v"])
            for r in asof_join(
                left, right, on="k", left_ts="ts", right_ts="rts",
                right_values=["rid", "v"], tie_breaker="rid",
                direction=direction,
            ).collect()
        }
        assert got[0] == (None, None), (direction, got)  # NULL left ts
        assert got[1] == expected, (direction, got)      # never rid=0 (NULL rts)


# Arbitrary unicode (no surrogates — unencodable as UTF-8) including the
# empty string: the portable hash must agree across Spark, DuckDB, and
# the Python md5 ground truth, or five oracles (minhash lsh/resolve/cc,
# simhash, and their CTE reuse) silently diverge on non-ASCII corpora.
_tokens_strat = st.lists(
    st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=20),
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None)
@given(_tokens_strat)
def test_portable_token_hash_parity_spark_duckdb_python(tokens):
    import duckdb
    import hashlib

    from nytimes_batch_processor_spark.operators.dedup import (
        _MINHASH_PRIME,
        _portable_token_hash,
    )

    spark = _spark()
    sdf = spark.createDataFrame([(t,) for t in tokens], "tok string").select(
        _portable_token_hash(F.col("tok")).alias("h")
    )
    spark_h = [r["h"] for r in sdf.collect()]
    con = duckdb.connect()
    duck_h = [
        con.execute(
            f"SELECT CAST(concat('0x', substr(md5(?), 1, 15)) AS BIGINT)"
            f" % {_MINHASH_PRIME}",
            [t],
        ).fetchone()[0]
        for t in tokens
    ]
    py_h = [
        int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16) % _MINHASH_PRIME
        for t in tokens
    ]
    assert spark_h == duck_h == py_h


def test_pack_offsets_tile_token_axis(spark, sf_dir):
    """Structural invariant of the two-level prefix scan: sorted by
    doc_id, every document's start_offset equals the previous doc's
    start + tokens (no gap, no overlap — the packed corpus is one
    contiguous token axis), and bin bookkeeping is consistent with the
    offsets. A bucket-boundary bug (off-by-one in the exclusive prefix,
    a missed bucket in the broadcast join) breaks contiguity
    immediately; the DuckDB oracle would catch values, this pins the
    algebra independent of any oracle."""
    from nytimes_batch_processor_spark.operators.text import (
        _PACK_CAPACITY,
        pack_sequences_offsets,
    )

    rows = sorted(
        pack_sequences_offsets(spark, sf_dir).collect(), key=lambda r: r.doc_id
    )
    assert rows, "empty packing result"
    expected = 0
    for r in rows:
        assert r.start_offset == expected, (
            f"doc {r.doc_id}: start {r.start_offset} != running total {expected}"
        )
        assert r.bin_id == r.start_offset // _PACK_CAPACITY
        assert r.bin_offset == r.start_offset % _PACK_CAPACITY
        expected += r.n_tokens


def test_shuffle_partition_count_invariance(spark, sf_dir):
    """The cluster-scale determinism claim, tested directly: a catalog
    query's RESULT may not depend on how many shuffle partitions (i.e.
    how many executors' worth of parallelism) the plan ran with. Runs
    order-sensitive representatives — global prefix scan, rank window,
    minhash banding, native session windows, salted skew agg — at 32
    and at 7 shuffle partitions and requires identical multisets. Any
    operator leaking partition layout into values (a non-deterministic
    tie-break, an accidental first()/limit dependence, float summation
    at the output boundary) fails here without needing the oracle."""
    from nytimes_batch_processor_spark.catalog import all_specs

    specs = all_specs()
    names = [
        "pack_sequences_offsets",
        "window_rank_topk_per_group",
        "dedup_minhash_lsh",
        "sessionize_gap_surface",
        "agg_skew_salted_sum",
        # late-r7 additions: iterative integer PageRank (per-iteration
        # agg order must not leak), SCD2 (two-branch union), and the
        # Python DataSource (per-URL partitions fixed, but the staged
        # CSV write fans out over shuffle partitions upstream)
        "graph_pagerank_fixed",
        "scd2_surface",
        "scan_python_datasource_httpcsv",
        # r11: the shard manifest's whole VALUE is an ordering claim
        # (salted-hash shuffle order + offsets must be layout-free)
        "export_train_shards",
    ]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for n_part in ("32", "7"):
            spark.conf.set("spark.sql.shuffle.partitions", n_part)
            results[n_part] = {
                name: sorted(map(repr, specs[name].fn(spark, sf_dir).collect()))
                for name in names
            }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    for name in names:
        assert results["32"][name] == results["7"][name], (
            f"{name}: result depends on shuffle partition count"
        )


def test_twin_bucket_count_invariance(spark, sf_dir, monkeypatch):
    """The r9 bucketed grouped-map dispatch (`_bucketed_by_user`,
    operators/sessionize.py) must be a pure performance knob: every
    replay twin's RESULT may not depend on _TWIN_BUCKETS — a dependence
    would mean per-user replay state leaked across users sharing a
    bucket. Runs the three twins at 64 (shipped), 3 (many users per
    bucket, max collision pressure) and 1 (everything in one Python
    group) and requires identical multisets."""
    from nytimes_batch_processor_spark.catalog import all_specs
    from nytimes_batch_processor_spark.operators import sessionize as S

    specs = all_specs()
    # the totals/timers twins are branches of the consolidated
    # stateful_twin_surface entry since r12 — drive the functions
    fns = {
        "stateful_running_totals_twin": S.stateful_running_totals_twin,
        "sessionize_timers_twin": S.sessionize_timers_twin,
        "stream_dedup_watermark_twin": specs["stream_dedup_watermark_twin"].fn,
    }
    results = {}
    for n_buckets in (64, 3, 1):
        monkeypatch.setattr(S, "_TWIN_BUCKETS", n_buckets)
        results[n_buckets] = {
            name: sorted(map(repr, fn(spark, sf_dir).collect()))
            for name, fn in fns.items()
        }
    for name in fns:
        assert results[64][name] == results[3][name] == results[1][name], (
            f"{name}: result depends on _TWIN_BUCKETS"
        )


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(min_value=-(10**6), max_value=10**6), max_size=200),
    st.integers(min_value=1, max_value=50),
)
def test_stateful_fold_is_batch_boundary_invariant(cents, batch):
    """The streaming state machine's transition (streaming/stateful.py
    `fold_totals`, replayed by `stateful_running_totals_twin`) must
    reach the same final state however the stream is chopped into
    micro-batches — trigger size is an operational knob, never a
    semantic one. Integer payloads keep float summation exact, so the
    equality is ==, not approx."""
    import pandas as pd

    from nytimes_batch_processor_spark.streaming.stateful import fold_totals

    n, total = 0, 0.0
    for start in range(0, len(cents), batch):
        n, total = fold_totals(
            n, total, pd.Series(cents[start : start + batch], dtype="int64")
        )
    assert n == len(cents)
    assert total == float(sum(cents))


def test_scd2_versions_tile_the_timeline(spark, sf_dir):
    """Semantic invariants of the SCD2 merge no value-hash can state:
    per key, exactly one current row; closed rows end exactly where
    their successor begins; version numbers are dense from 1."""
    from collections import defaultdict

    from nytimes_batch_processor_spark.catalog import all_specs

    from nytimes_batch_processor_spark.operators.relational import (
        merge_scd2_dimension,
    )

    rows = merge_scd2_dimension(spark, sf_dir).collect()
    by_key = defaultdict(list)
    for r in rows:
        by_key[r["c_custkey"]].append(r)
    assert by_key, "empty SCD2 output"
    for key, vs in by_key.items():
        vs.sort(key=lambda r: r["version"])
        assert [v["version"] for v in vs] == list(range(1, len(vs) + 1)), key
        assert sum(1 for v in vs if v["is_current"]) == 1, key
        assert vs[-1]["is_current"] and vs[-1]["valid_to"] is None, key
        for a, b in zip(vs, vs[1:]):
            assert not a["is_current"], key
            assert a["valid_to"] == b["valid_from"], key
            assert a["valid_from"] <= a["valid_to"], key


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=500), st.integers(0, 9)),
        min_size=1,
        max_size=40,
    ),
    st.lists(st.integers(1, 5), min_size=1, max_size=8),
)
@settings(max_examples=60, deadline=None)
def test_fold_session_equals_gaps_and_islands(events, batch_sizes):
    """Property: feeding one key's events (event-time order) through
    fold_session in ANY batch segmentation yields exactly the
    gaps-and-islands sessionization of the whole sequence — the
    batch-boundary invariance that makes the streaming processor's
    output independent of micro-batch framing (timer-path emissions
    excluded: this is the input-path state machine)."""
    from nytimes_batch_processor_spark.streaming.stateful import fold_session

    GAP = 30
    ts = sorted(t for t, _ in events)
    vs = [float(v) for _, v in sorted(events)]

    # brute force: split whenever the gap strictly exceeds GAP
    expected = []
    cur = None
    for t, v in zip(ts, vs):
        if cur is not None and t > cur[1] + GAP:
            expected.append(tuple(cur))
            cur = None
        if cur is None:
            cur = [t, t, 1, v]
        else:
            cur[1] = max(cur[1], t)
            cur[2] += 1
            cur[3] += v
    final_expected = tuple(cur)

    # replay through fold_session under an arbitrary batch segmentation
    state, closed = None, []
    i, b = 0, 0
    while i < len(ts):
        n = batch_sizes[b % len(batch_sizes)]
        state, c = fold_session(state, ts[i : i + n], vs[i : i + n], GAP)
        closed.extend(c)
        i += n
        b += 1
    assert [tuple(c) for c in closed] == expected
    assert tuple(state) == final_expected


# -- prefix-filtered containment: deterministic-recall property (r8) --

_doc_words = st.lists(
    st.sampled_from("aa bb cc dd ee ff gg hh".split()), min_size=0, max_size=12
)
_corpora = st.lists(_doc_words, min_size=2, max_size=12)


@settings(max_examples=8, deadline=None)
@given(_corpora, st.sampled_from([(1, 2), (3, 5), (7, 10), (9, 10), (1, 1)]))
def test_containment_prefix_matches_bruteforce(corpus, threshold):
    """The prefix filter's no-false-negative guarantee is DETERMINISTIC
    (derived from the overlap bound, not from hashing luck), so on
    arbitrary small corpora — tiny vocab maximizes shingle collisions,
    the prefix filter's hardest regime — and across THRESHOLDS (the
    integer prefix bound must hold for any rational num/den, including
    the degenerate 1/1 = exact-subset case), the scalable path must
    equal a brute-force Python containment join exactly: same pairs,
    same containment and jaccard values."""
    from nytimes_batch_processor_spark.operators.dedup import (
        containment_prefix_pairs,
        shingle_arrays,
    )

    num, den = threshold
    spark = _spark()
    rows = [(i, " ".join(words)) for i, words in enumerate(corpus)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_src"], r["id_dst"]): (r["containment"], r["jaccard"])
        for r in containment_prefix_pairs(
            shingle_arrays(docs), num, den
        ).collect()
    }

    def shingles(words):
        toks = [w for w in words if w]
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        } if len(toks) >= 3 else set()

    sets = {i: shingles(w) for i, w in enumerate(corpus)}
    expected = {}
    for a, sa in sets.items():
        if not sa:
            continue
        for b, sb in sets.items():
            if a == b or not sb:
                continue
            c = len(sa & sb)
            cont = c / len(sa)
            if cont >= num / den:
                jac = c / (len(sa) + len(sb) - c)
                expected[(a, b)] = (round(cont, 6), round(jac, 6))
    assert set(got) == set(expected), (
        f"pair sets differ: extra={set(got) - set(expected)} "
        f"missing={set(expected) - set(got)}"
    )
    for k, (cont, jac) in expected.items():
        assert abs(got[k][0] - cont) < 1e-9 and abs(got[k][1] - jac) < 1e-9, (
            k, got[k], (cont, jac)
        )


# -- timers twin vs a LITERAL end-of-batch timer simulation (r8) --

_tt_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # user
        st.integers(min_value=0, max_value=7200),   # minute offset over ~5 days
        st.integers(min_value=0, max_value=5),      # integer value
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None)
@given(_tt_events)
def test_timers_twin_matches_literal_batch_simulation(raw):
    """`sessionize_timers_twin` replays per USER, firing a pending timer
    lazily (before that user's next batch, or at end-of-stream) — an
    optimization whose correctness rests on a derivation: because
    event-time days partition time, deferred firing emits exactly the
    same sessions as the contract's literal semantics (every timer fires
    at the END of the first GLOBAL batch whose watermark passes it).
    This test checks that equivalence mechanically: a straightforward
    Python simulation of the literal contract — iterate global day
    batches, fold each user's day rows, then fire every expired timer
    with that batch's watermark — must produce the identical session
    multiset."""
    import datetime

    from nytimes_batch_processor_spark.operators.sessionize import (
        _TIMER_DELAY_US,
        _TIMER_GAP_US,
        timers_twin_frame,
    )
    from nytimes_batch_processor_spark.streaming.stateful import fold_session

    base = datetime.datetime(2021, 3, 1, tzinfo=datetime.timezone.utc)
    rows = [
        (u, i, base + datetime.timedelta(minutes=m), float(v))
        for i, (u, m, v) in enumerate(raw)
    ]

    spark = _spark()
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    got = sorted(
        (r["user_id"], r["session_start_us"], r["session_end_us"],
         r["n_events"], r["total_cents"], r["close_reason"])
        for r in timers_twin_frame(df).collect()
    )

    # literal simulation, integer microseconds
    evs = sorted(
        (int((ts - datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc))
             .total_seconds() * 1_000_000), eid, u, int(v * 100))
        for (u, eid, ts, v) in rows
    )
    days = sorted({ts // 86_400_000_000 for ts, *_ in evs})
    state: dict[int, tuple] = {}
    out = []
    wm = None
    max_ts = None
    for d in days:
        batch = [(ts, eid, u, c) for (ts, eid, u, c) in evs
                 if ts // 86_400_000_000 == d]
        for u in sorted({uu for (_ts, _eid, uu, _c) in batch}):
            urows = sorted((ts, eid, c) for (ts, eid, uu, c) in batch if uu == u)
            st_u, closed = fold_session(
                state.get(u), [r[0] for r in urows], [r[2] for r in urows],
                _TIMER_GAP_US,
            )
            state[u] = st_u
            out.extend((u, c[0], c[1], c[2], int(c[3]), "event") for c in closed)
        max_ts = max([ts for ts, *_ in batch] + ([max_ts] if max_ts else []))
        wm = max_ts - _TIMER_DELAY_US
        # end of batch: fire every expired timer with THIS batch's watermark
        for u in list(state):
            s = state[u]
            if s is not None and wm > s[1] + _TIMER_GAP_US:
                out.append((u, s[0], s[1], s[2], int(s[3]), "timer"))
                del state[u]
    expected = sorted(out)
    assert got == expected, f"\ngot      {got}\nexpected {expected}"


@settings(max_examples=15, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 5)),
        min_size=2,
        max_size=50,
    )
)
def test_tie_stable_window_semantics_agree_with_duckdb(spark, rows):
    """Cross-engine PEER semantics, in the regime the catalog entry
    deliberately avoids: window_analytic_surface tie-breaks its ORDER BY
    on custkey so every rank is deterministic — which also means the
    driver hash never exercises real ties. Here generated (group, value)
    frames are FULL of duplicates, and the tie-stable analytic functions
    (rank, dense_rank, percent_rank, cume_dist — whose outputs depend
    only on the peer partition, not intra-peer order) must agree between
    Spark and DuckDB row-multiset-exactly. Catches the
    engine-version-drift class (the r3/r4 lesson) on the one semantic
    axis — peer grouping — the oracle fixtures cannot reach.
    (row_number/ntile/lag are intentionally absent: with ties they are
    legitimately order-dependent in both engines.)"""
    import duckdb
    import pandas as pd

    from pyspark.sql import Window as W, functions as F

    pdf = pd.DataFrame(rows, columns=["g", "v"])
    w = W.partitionBy("g").orderBy("v")
    got = sorted(
        (r["g"], r["v"], r["rnk"], r["drnk"], round(r["pr"], 9), round(r["cd"], 9))
        for r in spark.createDataFrame(pdf)
        .select(
            "g",
            "v",
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        )
        .collect()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    exp = sorted(
        (g, v, rnk, drnk, round(pr, 9), round(cd, 9))
        for g, v, rnk, drnk, pr, cd in con.execute(
            """
            SELECT g, v,
                   CAST(RANK() OVER w AS BIGINT),
                   CAST(DENSE_RANK() OVER w AS BIGINT),
                   PERCENT_RANK() OVER w,
                   CUME_DIST() OVER w
            FROM t WINDOW w AS (PARTITION BY g ORDER BY v)
            """
        ).fetchall()
    )
    con.close()
    assert got == exp


def test_pii_redact_removes_all_injected_pii(spark, sf_dir):
    """Compliance invariant of text_pii_redact, independent of the
    oracle: every emitted row is `clean` (zero residual pattern matches
    after redaction), and the per-doc counts match the injection rule
    exactly — one email/phone/id iff doc_id is divisible by the
    corresponding modulus. Equality (not >=) also proves the three
    patterns are disjoint on the injected text: a phone matching the
    id regex (or vice versa) would double-count."""
    from nytimes_batch_processor_spark.operators.text import (
        _PII_EMAIL_MOD,
        _PII_ID_MOD,
        _PII_PHONE_MOD,
        text_pii_redact,
    )

    rows = text_pii_redact(spark, sf_dir).collect()
    assert rows, "empty redaction result"
    for r in rows:
        assert r.clean, f"doc {r.doc_id}: residual PII after redaction"
        assert r.n_emails == (1 if r.doc_id % _PII_EMAIL_MOD == 0 else 0), r
        assert r.n_phones == (1 if r.doc_id % _PII_PHONE_MOD == 0 else 0), r
        assert r.n_ids == (1 if r.doc_id % _PII_ID_MOD == 0 else 0), r


def test_export_shards_tile_each_shard_token_axis(spark, sf_dir):
    """Structural invariant of the shard manifest: within every shard,
    positions are 1..n with no gaps and tok_offset is the exact prefix
    sum of n_tokens in position order (a trainer can seek to any doc by
    offset); every document appears exactly once across shards; and the
    manifest is reproducible — a second invocation yields the identical
    row set (the determinism rng-based shuffles lack)."""
    from nytimes_batch_processor_spark.operators.text import export_train_shards

    rows = export_train_shards(spark, sf_dir).collect()
    assert rows, "empty shard manifest"
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    seen = [r.doc_id for r in rows]
    assert len(seen) == len(set(seen)), "a doc landed in two shards"
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r.pos)
        expected = 0
        for i, r in enumerate(docs, start=1):
            assert r.pos == i, f"shard {shard}: pos gap at {r.pos} != {i}"
            assert r.tok_offset == expected, (
                f"shard {shard} doc {r.doc_id}: offset {r.tok_offset} != {expected}"
            )
            expected += r.n_tokens
    again = export_train_shards(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again)), (
        "shard manifest is not reproducible across invocations"
    )


def test_quality_audit_verdicts_and_counts(spark, sf_dir):
    """The audit's pass/fail split is real: on the fixtures exactly one
    rule fails (lineitem's composite line key, which the generator does
    not deduplicate) and every other rule passes; n_checked equals the
    audited table's row count on every row; `ok` is consistent with
    n_violations. A constraint engine that silently inverted a
    predicate or dropped a UNION branch breaks one of these."""
    from nytimes_batch_processor_spark.operators.quality import (
        quality_constraint_audit,
    )
    from nytimes_batch_processor_spark.sources import load_tables

    rows = quality_constraint_audit(spark, sf_dir).collect()
    assert len(rows) == 13, f"expected 13 rules, got {len(rows)}"
    failing = {r.rule for r in rows if not r.ok}
    assert failing == {"lineitem.line key unique"}, failing
    t = load_tables(spark, sf_dir, "orders", "lineitem", "customer", "events")
    counts = {n: getattr(t, n).count() for n in ("orders", "lineitem", "customer", "events")}
    for r in rows:
        assert r.ok == (r.n_violations == 0), r
        assert r.n_checked == counts[r.tbl], r
        assert 0 <= r.n_violations <= r.n_checked, r


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
            min_size=1,
            max_size=8,
        ).map(" ".join),
        min_size=2,
        max_size=10,
    ),
    st.integers(min_value=0, max_value=4),
)
@example(texts=["alpha beta", "gamma delta"], mod_minus_one=0)
def test_probe_after_append_finds_every_admitted_doc(texts, mod_minus_one):
    """Incremental-index admission invariant, for ARBITRARY tiny corpora
    (the deterministic fixture round-trip lives in test_dedup_quality):
    after append_to_minhash_index admits a batch, the very next probe
    matches EVERY admitted doc (at minimum its own appended copy,
    est_jaccard 1.0), and no pre-append match disappears — the index
    only ever grows. Holds for any corpus/batch split, including an
    empty corpus: mod=1 (mod_minus_one=0) sends EVERY doc_id to the
    batch side, so the build writes a schema-only index — the
    first-ever-batch branch ADVICE r11 found the old mod>=2 generators
    could never reach (doc_id 1 was always in the corpus)."""
    import tempfile

    from nytimes_batch_processor_spark.operators.dedup import (
        _band_hash_cols,
        append_to_minhash_index,
        build_minhash_index,
        minhash_signatures,
        probe_minhash_index,
    )

    spark = _spark()
    mod = mod_minus_one + 1
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    corpus = docs.filter(F.col("doc_id") % mod != 0)
    batch = docs.filter(F.col("doc_id") % mod == 0)
    path = tempfile.mkdtemp(prefix="mh_prop_")
    build_minhash_index(corpus, path)

    batch_sigs = minhash_signatures(batch, "doc_id", "text").select(
        "doc_id", "sig", *_band_hash_cols()
    )
    before = {
        (r["doc_id"], r["canon_id"])
        for r in probe_minhash_index(
            spark.read.parquet(path), batch_sigs
        ).collect()
    }
    append_to_minhash_index(batch, path)
    after = {
        (r["doc_id"], r["canon_id"])
        for r in probe_minhash_index(
            spark.read.parquet(path), batch_sigs
        ).collect()
    }
    assert before <= after, "append may never lose a pre-append match"
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    assert {q for q, _ in after} == batch_ids, (
        f"admitted docs missing from post-append probe: "
        f"{batch_ids - {q for q, _ in after}}"
    )


# --- ExactSubstr spans vs a quadratic-DP ground truth (r16) ------------------

_xs_tok = st.sampled_from(["a", "b", "c"])


@st.composite
def _xsub_corpus(draw):
    """2-4 docs built around (slices of) one base passage, with random
    pre/suffixes — so shared runs >= K arise by construction, may
    EXTEND past the planted slice when affix tokens happen to line up
    (exercising maximality), and multi-diagonal / multi-pair shapes
    all occur. Alphabet of 3 keeps accidental 25-token matches
    negligible while letting boundaries collide."""
    base = draw(st.lists(_xs_tok, min_size=30, max_size=42))
    docs = {}
    for i in range(draw(st.integers(min_value=2, max_value=4))):
        mode = draw(st.integers(min_value=0, max_value=2))
        pre = draw(st.lists(_xs_tok, min_size=0, max_size=8))
        suf = draw(st.lists(_xs_tok, min_size=0, max_size=8))
        if mode == 0:
            mid = list(base)
        elif mode == 1:
            s = draw(st.integers(min_value=0, max_value=max(0, len(base) - 25)))
            ln = draw(st.integers(min_value=25, max_value=len(base) - s))
            mid = base[s : s + ln]
        else:
            mid = draw(st.lists(_xs_tok, min_size=25, max_size=40))
        docs[i] = pre + mid + suf
    return docs


def _brute_max_runs(docs: dict, k: int) -> set:
    """All maximal cross-doc shared token runs of length >= k, by the
    classic O(n*m) common-extension DP — maximal on both ends (the DP
    resets at a start mismatch; the end check requires a boundary or a
    mismatch at the next position). 1-based starts, matching the
    operator's contract."""
    out = set()
    ids = sorted(docs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = docs[ids[x]], docs[ids[y]]
            la, lb = len(a), len(b)
            L = [[0] * (lb + 1) for _ in range(la + 1)]
            for i in range(1, la + 1):
                for j in range(1, lb + 1):
                    if a[i - 1] == b[j - 1]:
                        L[i][j] = L[i - 1][j - 1] + 1
            for i in range(1, la + 1):
                for j in range(1, lb + 1):
                    run = L[i][j]
                    if run >= k and (
                        i == la or j == lb or a[i] != b[j]
                    ):
                        out.add((ids[x], ids[y], i - run + 1, j - run + 1, run))
    return out


@settings(max_examples=6, deadline=None)
@given(_xsub_corpus())
def test_exact_substring_spans_match_bruteforce(docs):
    """The whole span chain (windows -> frequency valve -> hash
    equi-join -> diagonal-island merge) must equal the quadratic DP's
    maximal shared runs on every generated corpus — the property the
    constructed-geometry pytests sample, proven here over arbitrary
    shapes. Corpora whose window frequency would trip the boilerplate
    valve are excluded (the valve's own semantics are pinned by the
    66-doc flood test); the >= 2 survivor prefilter is invisible to
    the DP by construction (a shared run's windows occur >= 2 times)."""
    from collections import Counter

    from hypothesis import assume

    from nytimes_batch_processor_spark.operators.dedup import (
        _XSUB_MAX_FREQ,
        _XSUB_WINDOW,
        exact_substring_candidates,
        exact_substring_survivors,
        merge_collision_spans,
    )

    k = _XSUB_WINDOW
    freq = Counter(
        tuple(toks[p : p + k])
        for toks in docs.values()
        for p in range(len(toks) - k + 1)
    )
    assume(not freq or max(freq.values()) <= _XSUB_MAX_FREQ)

    spark = _spark()
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs.items()],
        "doc_id long, text string",
    )
    got = {
        (r["id1"], r["id2"], r["start1"], r["start2"], r["span_len"])
        for r in merge_collision_spans(
            exact_substring_candidates(exact_substring_survivors(df))
        ).collect()
    }
    assert got == _brute_max_runs(docs, k)


# --- SemDedup verdicts vs the exact shared-cell characterization (r16) -------


@st.composite
def _sem_vectors(draw):
    """4-14 vectors of dim 8 with quarter-integer components (exact in
    binary floating point, so the Python reference arithmetic below is
    bit-comparable to Spark's fold) — including possible zero vectors,
    which must be EXCLUDED, not misjudged."""
    n = draw(st.integers(min_value=4, max_value=14))
    comp = st.integers(min_value=-8, max_value=8)
    return [
        [c / 4.0 for c in draw(st.tuples(*[comp] * 8))] for _ in range(n)
    ]


@settings(max_examples=6, deadline=None)
@given(_sem_vectors())
def test_semdedup_verdicts_match_characterization(vecs):
    """semdedup_verdicts == the exact characterization 'drop iff some
    lower-id vector shares one of the 2 nearest cells and scores
    cosine >= bar', with canon = the minimum such id and n_dups their
    distinct count — computed by a left-to-right Python reference
    (same IEEE order as Spark's aggregate fold and the same
    (distance, cell-id) tie-break as _ranked_probe_cells). Proves
    completeness (every shared-cell pair found), soundness (nothing
    else), zero-vector exclusion, and the generality of the operator
    over a non-default quantizer (k=4, dim=8)."""
    import math

    from nytimes_batch_processor_spark.operators.similarity import (
        SEMDEDUP_COS,
        ivf_fixed_centers,
        semdedup_verdicts,
    )

    centers = ivf_fixed_centers(4, 8)

    def cells2(v):
        ds = []
        for ci, c in enumerate(centers):
            s = 0.0
            for a, b in zip(v, c):
                s += (a - b) * (a - b)
            ds.append((s, ci))
        ds.sort()
        return [ci for _, ci in ds[:2]]

    def norm(v):
        s = 0.0
        for a in v:
            s += a * a
        return math.sqrt(s)

    def cos(u, v):
        s = 0.0
        for a, b in zip(u, v):
            s += a * b
        return s / (norm(u) * norm(v))

    valid = {i: v for i, v in enumerate(vecs) if norm(v) > 0}
    cells = {i: cells2(v) for i, v in valid.items()}
    expected = {}
    for j, vj in valid.items():
        matches = {
            i
            for i, vi in valid.items()
            if i < j
            and set(cells[i]) & set(cells[j])
            and cos(vi, vj) >= SEMDEDUP_COS
        }
        expected[j] = (
            cells[j][0],
            "drop" if matches else "keep",
            min(matches) if matches else None,
            len(matches),
        )

    spark = _spark()
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    vdf = df.selectExpr("vec_id", "embedding AS e").withColumn(
        "nrm",
        F.sqrt(F.aggregate(F.transform("e", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)),
    )
    got = {
        r["vec_id"]: (r["cell"], r["status"], r["canon_id"], r["n_dups"])
        for r in semdedup_verdicts(vdf, centers).collect()
    }
    assert got == expected


@st.composite
def _intradoc_doc(draw):
    """One doc assembled from segments that may repeat a base slice —
    self-repetition arises by construction; pre/mid/suffix tokens may
    extend or merge runs (maximality exercised)."""
    base = draw(st.lists(_xs_tok, min_size=25, max_size=38))
    parts = []
    for _ in range(draw(st.integers(min_value=2, max_value=3))):
        if draw(st.booleans()):
            s = draw(st.integers(min_value=0, max_value=max(0, len(base) - 25)))
            ln = draw(st.integers(min_value=25, max_value=len(base) - s))
            parts.append(base[s : s + ln])
        else:
            parts.append(draw(st.lists(_xs_tok, min_size=0, max_size=12)))
    return [t for p in parts for t in p]


def _brute_intradoc_runs(toks: list, k: int) -> set:
    """Maximal self-repeats of length >= k: the same common-extension
    DP over (toks, toks) restricted to i < j (earlier occurrence
    first), maximal at both ends."""
    n = len(toks)
    L = [[0] * (n + 1) for _ in range(n + 1)]
    out = set()
    for i in range(1, n + 1):
        for j in range(i + 1, n + 1):
            if toks[i - 1] == toks[j - 1]:
                L[i][j] = L[i - 1][j - 1] + 1
    for i in range(1, n + 1):
        for j in range(i + 1, n + 1):
            run = L[i][j]
            if run >= k and (j == n or toks[i] != toks[j]):
                out.add((i - run + 1, j - run + 1, run))
    return out


@settings(max_examples=6, deadline=None)
@given(_intradoc_doc())
def test_intradoc_spans_match_bruteforce(toks):
    """The intra-doc span chain must equal the quadratic DP's maximal
    self-repeats on every generated doc (valve-tripping docs excluded,
    as in the cross-doc property — the flood semantics have their own
    pin)."""
    from collections import Counter

    from hypothesis import assume

    from nytimes_batch_processor_spark.operators.dedup import (
        _XSUB_MAX_FREQ,
        _XSUB_WINDOW,
        intradoc_candidates,
        intradoc_survivors,
        merge_collision_spans,
    )

    k = _XSUB_WINDOW
    freq = Counter(
        tuple(toks[p : p + k]) for p in range(len(toks) - k + 1)
    )
    assume(not freq or max(freq.values()) <= _XSUB_MAX_FREQ)

    spark = _spark()
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    got = {
        (r["start1"], r["start2"], r["span_len"])
        for r in merge_collision_spans(
            intradoc_candidates(intradoc_survivors(df))
        ).collect()
    }
    assert got == _brute_intradoc_runs(toks, k)
