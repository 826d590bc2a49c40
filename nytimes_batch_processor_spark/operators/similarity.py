"""Similarity search over embedding columns (L2, SURVEY.md §2.3).

Three tiers, as a 100 TB training-data pipeline needs:

- **Brute-force cosine top-k** (oracle-checked): exact baseline. The
  query set is broadcast; the corpus streams through a JVM-side
  zip_with/aggregate dot product — no Python in the loop, no shuffle of
  the corpus; the rank window shuffles only (queries x corpus) scored
  rows keyed by query.
- **LSH-bucketed ANN** (oracle-checked — the deterministic hyperplanes
  inline into a DuckDB twin, see _ann_lsh_oracle; recall vs the exact
  baseline is additionally asserted in tests/test_dedup_quality.py):
  deterministic multi-table random-hyperplane signatures; candidate
  generation is a bucket equi-join, so corpus-side cost scales with
  bucket occupancy, not corpus size.
- **IVF ANN** (self-judging oracle since r11; recall-gated): k-means
  coarse quantizer, cell assignment JVM-side, nprobe nearest cells per
  query, same bucket equi-join shape with centroid id as the key. The
  float-k-means pair values are not SQL-replayable, so the catalog
  entry judges recall and pruning against the exact answer IN-QUERY
  and hashes deterministic booleans (the approx-sketch pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

from .. import checkpoints
from ..catalog import query
from ..functions import ratio
from ..sources import load_tables

N_QUERIES = 5  # vec_id < 5 are the query vectors in all catalog entries
TOP_K = 10
# L independent hash tables of 10 planes each, Hamming-3 multi-probe per
# table: measured recall@10 0.68 (sf0.001) / 0.80 (sf0.01) at ~43% of
# the corpus scored, on the *random-vector* fixture — ANN's worst case
# (top-10 cosine ~0.3, no cluster structure). Real embedding corpora
# cluster, so the same shape gets far better recall/selectivity in
# production (and more planes per table sharpen the buckets).
_N_PLANES = 10
_PROBE_RADIUS = 3
_N_TABLES = 3


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _bounded_broadcast(df: DataFrame, n_rows: int, bound: int = 100_000) -> DataFrame:
    """Broadcast-hint a build side only when its row count is provably
    bounded (here: exploded probe sets of N_QUERIES * nprobe rows).
    Forcing the hint on an unbounded online query batch would pin an
    arbitrarily large build side in every executor; past the bound the
    optimizer decides (AQE still converts to broadcast at runtime when
    observed stats allow). VERDICT r5 watch item 1."""
    return F.broadcast(df) if n_rows <= bound else df


def _dot(a, b) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(col) -> Column:
    return F.sqrt(F.aggregate(F.transform(col, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))


@query(
    "sim_cosine_topk_bruteforce",
    tables=("embeddings",),
    oracle="""
WITH v AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
           sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
    FROM embeddings
),
scored AS (
    SELECT q.vec_id AS query_id,
           c.vec_id AS neighbor_id,
           list_inner_product(q.e, c.e) / (q.nrm * c.nrm) AS cos_raw
    FROM v q JOIN v c ON q.vec_id < {nq} AND c.vec_id <> q.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, cos_raw,
           ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id ASC
           ) AS rnk
    FROM scored
)
SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk, ROUND(cos_raw, 6) AS cosine
FROM ranked WHERE rnk <= {k}
""".format(nq=N_QUERIES, k=TOP_K),
)
def sim_cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast the (tiny) query set against the
    corpus, score JVM-side, rank-window per query."""
    t = load_tables(spark, sf_dir, "embeddings")
    v = t.embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("e")
    ).withColumn("nrm", _norm(F.col("e")))
    queries = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    scored = (
        v.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .withColumn("cos_raw", _dot(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("nrm")))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos_raw")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "rnk", ratio(F.col("cos_raw")).alias("cosine"))
    )


_M64 = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    """Deterministic 64-bit mix (public splitmix64 constants) — the
    driver-side pseudo-random source for plane components."""
    x = (x + 0x9E3779B97F4A7C15) & _M64
    z = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
    return z ^ (z >> 31)


def plane_components(dim: int, plane: int, table: int, n_planes: int) -> list[float]:
    """Pseudo-random uniform [-1, 1) components of one hyperplane,
    computed DRIVER-SIDE as plain floats. Fixed seeds mean signatures
    are reproducible across runs/executors (required for the driver's
    re-run compare and incremental indexing); ``table`` offsets the seed
    so multi-table LSH draws independent plane sets."""
    base = (table * n_planes + plane) * 10007
    return [
        (_splitmix64(base + i) % 2_000_003) / 1_000_001.5 - 1.0 for i in range(dim)
    ]


def hyperplane_signature(
    vec_col: Column, dim: int, n_planes: int = _N_PLANES, table: int = 0
) -> Column:
    """Deterministic random-hyperplane LSH signature (int bitmask).

    Each plane's components ship as ONE array literal — computing them
    as nested Spark expressions instead (the obvious formulation) costs
    thousands of py4j round trips and was measured at ~19s of pure
    driver-side plan construction for 30 planes x 64 dims; this version
    builds the same plan in milliseconds.
    """
    bits = []
    for p in range(n_planes):
        comps = F.lit(plane_components(dim, p, table, n_planes))
        proj = F.aggregate(
            F.zip_with(vec_col, comps, lambda x, c: x * c), F.lit(0.0), lambda a, x: a + x
        )
        bits.append(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def hyperplane_signatures_all(
    vec_col: Column, dim: int, n_planes: int = _N_PLANES, n_tables: int = _N_TABLES
) -> Column:
    """All tables' signatures at once: array<long> of length n_tables.

    Same values as n_tables x hyperplane_signature (identical per-plane
    fold order, so the DuckDB oracle's explicit sums still match
    bit-for-bit), but expressed as ONE nested higher-order expression
    over a single 3x10x64 plane-tensor literal instead of 30 unrolled
    aggregate expressions. The unrolled form generated ~30x the codegen
    and cost ~3s of fixed plan-compile time per run on a 2000-row
    corpus; this form is loop-shaped in the generated code."""
    # ONE F.expr parse instead of a nested F.lit: PySpark decomposes a
    # nested list literal into ~2000 py4j calls (measured 1.2s of pure
    # driver time); the SQL string parses JVM-side in ~6ms. repr'd
    # doubles with the `d` suffix round-trip exactly.
    tensor_sql = "array(" + ", ".join(
        "array(" + ", ".join(
            "array(" + ", ".join(f"{x!r}d" for x in plane_components(dim, p, t, n_planes)) + ")"
            for p in range(n_planes)
        ) + ")"
        for t in range(n_tables)
    ) + ")"
    planes = _const_array_literal(tensor_sql)
    return F.transform(
        planes,
        lambda tbl_planes: F.aggregate(
            F.transform(
                tbl_planes,
                lambda pl, i: F.when(
                    F.aggregate(
                        F.zip_with(vec_col, pl, lambda x, c: x * c),
                        F.lit(0.0),
                        lambda a, x: a + x,
                    )
                    > 0,
                    # 2^i as a long (F.shiftleft needs a literal count;
                    # pow is exact far past i=10)
                    F.pow(F.lit(2.0), i.cast("double")).cast("long"),
                ).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ),
    )


# All XOR masks with popcount <= _PROBE_RADIUS: the Hamming ball the
# multi-probe enumerates per table (176 probes for 10 planes, radius 3).
_PROBE_MASKS = [m for m in range(1 << _N_PLANES) if bin(m).count("1") <= _PROBE_RADIUS]


def _ann_lsh_oracle() -> str:
    """DuckDB twin of the multi-table multi-probe hyperplane-LSH ANN.

    The hyperplanes are deterministic driver-side floats
    (plane_components), so the oracle inlines them as literals. Each
    projection is written as an explicit left-to-right sum
    (e[1]*c1 + e[2]*c2 + ...), which is the same IEEE evaluation order
    as the Spark side's sequential F.aggregate fold — the sign test
    (proj > 0) is therefore bit-identical, not merely close. Repr'd
    float literals round-trip exactly in both parsers."""
    dim = 64
    table_sigs = []
    for t in range(_N_TABLES):
        plane_bits = []
        for p_i in range(_N_PLANES):
            comps = plane_components(dim, p_i, t, _N_PLANES)
            proj = " + ".join(f"e[{i + 1}] * {c!r}" for i, c in enumerate(comps))
            plane_bits.append(
                f"(CASE WHEN ({proj}) > 0 THEN {1 << p_i} ELSE 0 END)"
            )
        table_sigs.append("CAST(" + " + ".join(plane_bits) + " AS BIGINT)")
    sig_list = ",\n        ".join(table_sigs)
    masks = ", ".join(str(m) for m in _PROBE_MASKS)
    return f"""
WITH v AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
           sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
    FROM embeddings
),
sigs AS (
    SELECT vec_id, e, nrm,
        [{sig_list}] AS sigv
    FROM v
),
bands AS (
    SELECT vec_id, tbl, sigv[tbl + 1] AS sig
    FROM sigs CROSS JOIN (SELECT unnest([0, 1, 2]) AS tbl) t
),
probes AS (
    SELECT b.vec_id AS query_id, b.tbl, xor(b.sig, CAST(m.mask AS BIGINT)) AS sig
    FROM bands b CROSS JOIN (SELECT unnest([{masks}]) AS mask) m
    WHERE b.vec_id < {N_QUERIES}
),
cand AS (
    SELECT DISTINCT p.query_id, b.vec_id AS neighbor_id
    FROM bands b JOIN probes p ON b.tbl = p.tbl AND b.sig = p.sig
    WHERE b.vec_id <> p.query_id
),
scored AS (
    SELECT c.query_id, c.neighbor_id,
           list_inner_product(q.e, n.e) / (q.nrm * n.nrm) AS cos_raw
    FROM cand c
    JOIN v q ON q.vec_id = c.query_id
    JOIN v n ON n.vec_id = c.neighbor_id
),
ranked AS (
    SELECT query_id, neighbor_id, cos_raw,
           ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id ASC
           ) AS rnk
    FROM scored
)
SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk, ROUND(cos_raw, 6) AS cosine
FROM ranked WHERE rnk <= {TOP_K}"""


@query("sim_ann_lsh_topk", tables=("embeddings",), oracle=_ann_lsh_oracle())
def sim_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via multi-table random-hyperplane LSH with a true
    bucket EQUI-join: the corpus carries one signature per hash table
    (posexplode to (tbl, sig) rows); each query explodes into its
    Hamming-<=_PROBE_RADIUS multi-probe signatures per table, and
    candidates are corpus rows whose (tbl, sig) equals a probe row — a
    broadcast hash join on the bucket key, never a nested-loop scan of
    the corpus. Candidates are deduped per (query, vector) across tables,
    then exact-reranked (cosine) per query.

    Scale path vs brute force: corpus-side work is one hash-probe per
    (row x table); dot products are computed only for bucket hits (~43%
    of the corpus on the worst-case random fixture at recall 0.7-0.8;
    far sharper on clustered real embeddings with more planes per
    table). An IVF (k-means coarse quantizer) variant slots into the
    same shape with centroid id as the bucket key.
    """
    t = load_tables(spark, sf_dir, "embeddings")
    dim = 64
    # SLIM signature index, checkpointed once: (vec_id, tbl, sig) only —
    # ~24 bytes/row. The r3 shape carried the 64-double embedding (plus
    # nrm) through the checkpoint, the probe join, and the candidate
    # dedup shuffle — ~1 KB per candidate row; embeddings re-attach BY ID
    # after the dedup instead, so the shuffled rows are 16-byte id pairs
    # (same discipline as dedup_minhash_lsh's id-only pair set). At
    # cluster scale this is the persisted ANN index table. Without the
    # checkpoint the 30-projection signature expression is evaluated
    # twice (measured 3x slower cold).
    # The 30-projection signature pass is the entry's heavy map stage,
    # and the single-file fixture scan runs it on ONE core (the r20
    # spread class); conditional fan-out, zero exchange on a
    # production-wide scan. With the mask-array F.expr below,
    # A/B-measured 1.62 -> 1.33s.
    from ..functions.udfs import spread_for_python

    base = spread_for_python(
        t.embeddings.select("vec_id", _as_double(F.col("embedding")).alias("e"))
    )
    v_sig = (
        base.select(
            "vec_id",
            F.posexplode(hyperplane_signatures_all(F.col("e"), dim)).alias(
                "tbl", "sig"
            ),
        )
        .localCheckpoint(eager=True)
    )
    # Bounded retention (ADVICE r9 pattern): re-invocation releases the
    # previous signature-index blocks.
    checkpoints.rotate("similarity.lsh_sig", v_sig)
    # Query side: tiny (N_QUERIES x tables x 176 probe rows) — broadcast.
    # ONE parsed expression for the 176-mask probe array — the F.lit
    # loop cost ~350 py4j round trips of pure driver wall per
    # invocation (the minhash-signature construction class); same int
    # literals, same parsed tree.
    mask_arr = _const_array_literal(
        "array(" + ", ".join(str(m) for m in _PROBE_MASKS) + ")"
    )
    probes = (
        v_sig.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            "tbl",
            F.explode(mask_arr).alias("mask"),
            F.col("sig").alias("qsig"),
        )
        .select(
            "query_id",
            "tbl",
            F.col("qsig").bitwiseXOR(F.col("mask")).alias("sig"),
        )
    )
    # Within one table the probe sigs are distinct (distinct XOR masks);
    # across tables the same (query, vector) pair can collide twice, so
    # dedup (16-byte id pairs) before the expensive exact rerank.
    cand = (
        v_sig.join(F.broadcast(probes), ["tbl", "sig"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .dropDuplicates(["query_id", "vec_id"])
    )
    # Re-attach embeddings by id: the query side is N_QUERIES rows
    # (broadcast); the corpus side joins the parquet scan on vec_id.
    vec = t.embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("e")
    ).withColumn("nrm", _norm(F.col("e")))
    qvec = F.broadcast(
        vec.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("qe"),
            F.col("nrm").alias("qn"),
        )
    )
    scored = (
        cand.join(vec, "vec_id")
        .join(qvec, "query_id")
        .withColumn(
            "cos_raw", _dot(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("nrm"))
        )
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos_raw")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "rnk", ratio(F.col("cos_raw")).alias("cosine"))
    )


_IVF_K = 16  # coarse-quantizer cells
_IVF_NPROBE = 4  # cells probed per query
_IVF_SAMPLE_CAP = 100_000  # k-means never trains on more rows than this


# (applicationId, literal SQL text) -> JVM Column wrapping the folded
# Literal. Session-keyed like _IVF_CACHE so a stopped context's JVM
# objects are never served; caches a plan FRAGMENT (a constant), never
# data or results.
_FOLDED_LIT_CACHE: dict[tuple[str, str], object] = {}


def _const_array_literal(sql_text: str) -> Column:
    """A constant array(...) SQL literal as a SINGLE Catalyst Literal
    node (r21). F.expr ships the text in one py4j call, but the parsed
    CreateArray tree keeps one node per component until the optimizer's
    constant folding — and the eager per-transformation ANALYSIS walks
    that unfolded tree every time a downstream select/join/withColumn
    re-analyzes the plan (~0.1s per pass over the 16x64 centroid tensor
    on this host, the r20 driver-gap class). Folding ONCE through a
    throwaway one-row plan and wrapping the resulting Literal keeps
    every later analysis walk O(1) in the tensor size. The OPTIMIZED
    plan is unchanged — it always contained exactly this folded Literal
    (ConstantFolding produced the identical node) — so codegen and
    values are untouched; only driver-side analysis cost moves.
    Falls back to the plain parsed expression if the internal
    Column-from-Expression hook is unavailable."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:  # pragma: no cover - import-time construction
        return F.expr(sql_text)
    key = (spark.sparkContext.applicationId, sql_text)
    jcol = _FOLDED_LIT_CACHE.get(key)
    if jcol is None:
        try:
            plan = (
                spark.range(1)
                .select(F.expr(sql_text).alias("_c"))
                ._jdf.queryExecution()
                .optimizedPlan()
            )
            lit = plan.expressions().apply(0).child()
            jcol = spark._jvm.org.apache.spark.sql.classic.ExpressionUtils.column(
                lit
            )
        except Exception:  # pragma: no cover - internal API moved
            return F.expr(sql_text)
        _FOLDED_LIT_CACHE[key] = jcol
    return Column(jcol)


def _centroid_sq_dists(centers: list[list[float]]) -> Column:
    """Array of squared distances from `e` to each centroid, JVM-side.

    The centroid matrix ships as ONE F.expr-parsed literal and the
    distances compute via a single transform lambda — the k unrolled
    per-centroid aggregates + k F.lit array calls of the first version
    cost measurable py4j/codegen time per invocation (same lesson as
    hyperplane_signatures_all). r21: the literal is pre-folded to a
    single Catalyst node (`_const_array_literal`) so re-analyses of
    tensor-bearing plans stop walking 1k+ literal nodes."""
    tensor_sql = "array(" + ", ".join(
        "array(" + ", ".join(f"{x!r}d" for x in c) + ")" for c in centers
    ) + ")"
    return F.transform(
        _const_array_literal(tensor_sql),
        lambda c: F.aggregate(
            F.zip_with(F.col("e"), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )


def _assign_cells(df: DataFrame, centers: list[list[float]]) -> DataFrame:
    """Attach the fixed-centroid `cell` id (squared-distance argmin,
    first-min tie-break via array_position) to a frame carrying `e`.
    ONE copy of the assignment idiom — the r11 self-review found it
    pasted verbatim at four sites, and the Spark/DuckDB bit-identical
    contract depends on every site keeping the same IEEE evaluation
    order and tie-break."""
    dists = _centroid_sq_dists(centers)
    # TWO selects instead of withColumn/withColumn/drop (r21): every
    # DataFrame transformation re-analyzes the plan JVM-side, and over
    # the k x dim tensor tree each pass costs ~0.1s driver wall on this
    # host. The two-Project shape is kept deliberately — `_d` is
    # referenced twice, so CollapseProject keeps the distance array
    # materialized once per row either way; the optimized plan is
    # byte-identical to the old chain, only the eager analyses drop
    # (3 -> 2, and the widest tensor-bearing pass runs once).
    with_d = df.select("*", dists.alias("_d"))
    return with_d.select(
        *df.columns,
        (F.array_position("_d", F.array_min("_d")) - 1).cast("int").alias("cell"),
    )


def _ranked_probe_cells(centers: list[list[float]]) -> Column:
    """Cell ids of `e`'s centroids ordered nearest-first ((distance,
    cell) structs array_sort'ed — ties break on the lower cell id,
    matching the oracles' `ORDER BY ds[i.i] ASC, i.i ASC`). Slice the
    first nprobe for a probe set. ONE copy of the ranking idiom, same
    rationale as _assign_cells."""
    dists = _centroid_sq_dists(centers)
    return F.transform(
        F.array_sort(
            F.zip_with(
                dists,
                F.sequence(F.lit(0), F.lit(len(centers) - 1)),
                lambda d, i: F.struct(d.alias("d"), i.alias("i")),
            )
        ),
        lambda s: s.getField("i"),
    )


def _oracle_dist_list(centers: list[list[float]]) -> str:
    """The DuckDB-side twin of _centroid_sq_dists: per-centroid squared
    distances as explicit left-to-right sums over `e`, joined as a SQL
    list literal body — the same IEEE evaluation order as Spark's
    sequential F.aggregate fold, so the argmin assignment and probe
    ranking are bit-identical. ONE copy shared by every IVF oracle."""
    dist_exprs = []
    for c in centers:
        terms = " + ".join(
            f"(e[{i + 1}] - {x!r}) * (e[{i + 1}] - {x!r})" for i, x in enumerate(c)
        )
        dist_exprs.append(f"({terms})")
    return ",\n        ".join(dist_exprs)


class IvfIndex:
    """A built IVF index: the centroid table (the index *definition*,
    tiny — k x dim plain floats) plus the materialized cell assignment
    of the corpus (the inverted file). At cluster scale both persist as
    tables; here the assignment is a localCheckpoint and the whole
    object is cached per (session, corpus) by `ivf_index_for`."""

    __slots__ = ("centers", "assigned")

    def __init__(self, centers: list[list[float]], assigned: DataFrame):
        self.centers = centers
        self.assigned = assigned


def ivf_build_index(
    corpus: DataFrame,
    k: int = _IVF_K,
    seed: int = 42,
    sample_cap: int = _IVF_SAMPLE_CAP,
) -> IvfIndex:
    """TRAIN + INDEX, run ONCE per corpus (never in the query path):

    1. TRAIN: MLlib KMeans (fixed seed) fits `k` centroids on a
       deterministic hash-sample of at most `sample_cap` rows — at
       100 TB the quantizer trains on ~1e5 vectors regardless of corpus
       size (a k-means job over the full corpus would be a full-scan
       MLlib job before the first probe);
    2. INDEX: every corpus vector is assigned its nearest centroid
       JVM-side (squared distances against centroid array literals — no
       MLlib UDT in the hot path, no Python) and materialized.

    `corpus` must have columns (vec_id, e: array<double>, nrm).
    """
    centers, _ = _train_ivf_centers(corpus, k, seed, sample_cap)
    # r21: conditional spread ahead of the pinned assignment (the
    # single-file fixture scan is ONE partition — §2 spread class), and
    # the _IVF_NPROBE ranked probe cells pinned alongside it (the
    # admit_ivf_batch pcells pattern): every downstream probe plan
    # reads the stored cells instead of re-deriving them from `e`, so
    # the k x dim centroid tensor never appears in a probe plan again
    # (~0.1s of eager re-analysis per transformation over tensor-
    # bearing plans on this host). Same expressions, same rows.
    from ..functions.udfs import spread_for_python

    assigned = (
        _assign_cells(spread_for_python(corpus), centers)
        .select(
            "*",
            F.slice(_ranked_probe_cells(centers), 1, _IVF_NPROBE).alias(
                "pcells"
            ),
        )
        .localCheckpoint(eager=True)
    )
    return IvfIndex(centers, assigned)


def _train_ivf_centers(
    vectors: DataFrame, k: int, seed: int, sample_cap: int
) -> tuple[list[list[float]], int]:
    """ONE copy of the quantizer-training recipe (seeded MLlib KMeans
    over a deterministic hash-sample of at most ``sample_cap`` rows),
    shared by `ivf_build_index` and `rebuild_ivf_index` — the
    sampling/seeding contract must not fork (self-review r12).
    ``vectors`` carries (vec_id, e); returns (centers, row count)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = vectors
    n = vectors.count()
    if n > sample_cap:
        # Deterministic pseudo-random subset: hash the key, keep ~cap.
        keep = int(1_000_000 * sample_cap / n)
        train = vectors.filter(
            F.pmod(F.abs(F.xxhash64("vec_id")), F.lit(1_000_000)) < keep
        )
    km = KMeans(k=k, seed=seed, maxIter=10, featuresCol="fv", predictionCol="cell")
    model = km.fit(train.select(array_to_vector("e").alias("fv")))
    return [[float(x) for x in c] for c in model.clusterCenters()], n


# (applicationId, sf_dir, k) -> IvfIndex. Keyed by session so a stale
# checkpoint from a stopped SparkContext is never served.
_IVF_CACHE: dict[tuple[str, str, int], IvfIndex] = {}


def ivf_index_for(spark: SparkSession, sf_dir: str, k: int = _IVF_K) -> IvfIndex:
    key = (spark.sparkContext.applicationId, sf_dir, k)
    idx = _IVF_CACHE.get(key)
    if idx is None:
        t = load_tables(spark, sf_dir, "embeddings")
        corpus = t.embeddings.select(
            "vec_id", _as_double(F.col("embedding")).alias("e")
        ).withColumn("nrm", _norm(F.col("e")))
        idx = _IVF_CACHE[key] = ivf_build_index(corpus, k=k)
    return idx


def ivf_probe_candidates(idx: IvfIndex) -> DataFrame:
    """The (query x corpus) candidate frame from the nprobe-cell bucket
    equi-join — the EXACT candidate subplan shared by `ivf_ann_pairs`
    (which scores it) and `sim_ann_ivf_topk`'s pruning judge (which
    counts it; Catalyst prunes the vector columns for the count). One
    body, so a probe-shape change can never desynchronize the judged
    candidate mass from the plan the ANN actually runs (the r8
    scale-bench lesson). Columns: query_id, qe, qn, vec_id, e, nrm."""
    assigned = idx.assigned
    # r21: the probe cells come from the index checkpoint's pinned
    # `pcells` column (same slice(_ranked_probe_cells) expression,
    # materialized at build time) — no tensor literal in the probe
    # plan; see ivf_build_index.
    probes = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
        F.explode("pcells").alias("cell"),
    )
    return assigned.join(
        _bounded_broadcast(probes, N_QUERIES * _IVF_NPROBE), "cell"
    ).filter(F.col("vec_id") != F.col("query_id"))


def ivf_ann_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via IVF (inverted-file index with a k-means coarse
    quantizer) — the second ANN family next to hyperplane LSH, same
    bucket-equi-join shape with centroid id as the bucket key. Returns
    the raw (query_id, neighbor_id, rnk, cosine) pairs; the catalog
    entry `sim_ann_ivf_topk` wraps them in self-judging booleans because
    the pair VALUES depend on float MLlib k-means and are not
    SQL-replayable.

    PROBE-ONLY: the quantizer training and cell assignment live in
    `ivf_build_index` (cached per session/corpus by `ivf_index_for`,
    persisted tables at cluster scale) — no KMeans.fit in this call
    path. The query:

    1. expands each query vector to its _IVF_NPROBE nearest cells
       (sorted (distance, cell) structs, slice, explode);
    2. candidates = corpus x probes equi-join on `cell`
       (`ivf_probe_candidates`) -> exact cosine rerank -> top-k.

    Measured on the random-vector fixture (worst case): recall@10 0.58
    (sf0.001) / 0.76 (sf0.01) scoring ~30% of the corpus; clustered real
    embeddings concentrate neighbors in fewer cells, so production gets
    sharper selectivity at higher recall (raise _IVF_K, keep
    nprobe/K ratio).
    """
    idx = ivf_index_for(spark, sf_dir)
    cand = ivf_probe_candidates(idx)
    scored = cand.withColumn(
        "cos_raw", _dot(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("nrm"))
    ).select("query_id", F.col("vec_id").alias("neighbor_id"), "cos_raw")
    w = W.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "rnk", ratio(F.col("cos_raw")).alias("cosine"))
    )


@query(
    "sim_ann_ivf_topk",
    tables=("embeddings",),
    oracle="""
SELECT CAST(vec_id AS BIGINT) AS query_id,
       CAST({k} AS BIGINT)    AS n_ann,
       TRUE                   AS recall_ge_040,
       TRUE                   AS scored_frac_le_60pct
FROM embeddings WHERE vec_id < {nq}
""".format(nq=N_QUERIES, k=TOP_K),
)
def sim_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-judging driver surface for the MLlib-trained IVF ANN
    (VERDICT r10 item 2): the pair VALUES from `ivf_ann_pairs` depend on
    float k-means and cannot be replayed in SQL, so — exactly like
    `approx_count_distinct_bounds` — the entry returns deterministic
    outputs judged IN-QUERY against the exact answer, with a
    constant-TRUE oracle:

    - one row per query vector (absent row = ANN lost a query);
    - ``n_ann``: ANN results returned for the query (must be TOP_K —
      any short top-k list breaks the hash via the oracle's constant);
    - ``recall_ge_040``: corpus-level recall@10 of the ANN pairs vs the
      in-query brute-force exact top-k (the same broadcast-query scoring
      as `sim_cosine_topk_bruteforce`) is >= 0.4. Measured 0.58
      (sf0.001) / 0.76 (sf0.01) on the worst-case random fixture. The
      driver-gate bound sits a full 0.18 below the worst measurement
      (ADVICE r11: at 0.5 the sf0.001 margin was 0.08 — thin enough
      that MLlib k-means float-order wobble could flip the hash in a
      way indistinguishable from a regression); the honest 0.5 bar
      lives in tests/test_dedup_quality.py's recall gate, where a
      near-threshold value is printed and investigable rather than a
      silent hash flip;
    - ``scored_frac_le_60pct``: scored candidates <= 60% of
      (queries x corpus) — the index must actually prune (measured
      ~30% scored at nprobe 4 of 16 cells).

    The corpus-level booleans ride every row via a broadcast scalar-
    aggregate cross join (the repo's accepted pattern for O(1) flag
    rows). Scale: the exact-top-k judge is (N_QUERIES x corpus) work —
    fine for a fixed probe panel; at 100 TB you sample the panel, not
    the corpus.
    """
    idx = ivf_index_for(spark, sf_dir)
    assigned = idx.assigned
    ann = ivf_ann_pairs(spark, sf_dir).select("query_id", "neighbor_id")
    queries = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    scored = (
        assigned.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .withColumn("cos_raw", _dot(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("nrm")))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos_raw")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("neighbor_id").asc())
    exact = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    recall_row = (
        exact.join(ann.withColumn("hit", F.lit(1)), ["query_id", "neighbor_id"], "left")
        .agg((F.count("hit") / F.count(F.lit(1))).alias("_recall"))
    )
    # Scored-candidate mass vs the brute-force denominator: count the
    # SAME candidate subplan the ANN scores (ivf_probe_candidates —
    # never a re-implementation that could drift from it)
    cand_row = ivf_probe_candidates(idx).agg(F.count(F.lit(1)).alias("_n_scored"))
    corpus_row = assigned.agg(F.count(F.lit(1)).alias("_n_corpus"))
    flags = (
        recall_row.crossJoin(F.broadcast(cand_row))
        .crossJoin(F.broadcast(corpus_row))
        .select(
            (F.col("_recall") >= 0.4).alias("recall_ge_040"),
            (
                F.col("_n_scored") <= 0.6 * F.lit(N_QUERIES) * F.col("_n_corpus")
            ).alias("scored_frac_le_60pct"),
        )
    )
    per_query = ann.groupBy(F.col("query_id").cast("bigint").alias("query_id")).agg(
        F.count(F.lit(1)).alias("n_ann")
    )
    return per_query.crossJoin(F.broadcast(flags)).select(
        "query_id", "n_ann", "recall_ge_040", "scored_frac_le_60pct"
    )


_IVF_FIXED_NPROBE = 6  # untrained centroids partition less sharply than
# k-means on the no-cluster random fixture; 6/16 cells probed restores
# recall@10 to ~0.5-0.6 (vs 0.42 at nprobe=4) while still skipping ~2/3
# of the corpus. Trained-centroid deployments keep _IVF_NPROBE.


def ivf_fixed_centers(k: int = _IVF_K, dim: int = 64) -> list[list[float]]:
    """Deterministic unit-norm centroids for the oracle-checkable IVF
    variant: splitmix64-uniform components (seed space disjoint from the
    LSH planes), normalized DRIVER-SIDE in plain Python floats so the
    exact same literals inline into both the Spark plan and the DuckDB
    oracle. Unit norm makes squared-distance argmin equivalent to
    dot-product argmax — a spherical Voronoi partition with no
    occupancy bias from centroid-norm variance."""
    out = []
    for c in range(k):
        comps = plane_components(dim, 0, 1000 + c, 1)
        nrm = sum(x * x for x in comps) ** 0.5
        out.append([x / nrm for x in comps])
    return out


def _ann_ivf_fixed_oracle(k: int = _IVF_K, nprobe: int = _IVF_FIXED_NPROBE) -> str:
    """DuckDB twin of the fixed-centroid IVF ANN. Each squared distance
    is an explicit left-to-right sum — the same IEEE evaluation order as
    Spark's sequential F.aggregate fold in _centroid_sq_dists — so the
    argmin cell assignment and the probe-cell ranking are bit-identical,
    not merely close (the _ann_lsh_oracle technique)."""
    centers = ivf_fixed_centers(k, 64)
    ds = _oracle_dist_list(centers)
    return f"""
WITH v AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
           sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
    FROM embeddings
),
d AS (
    SELECT vec_id, e, nrm,
        [{ds}] AS ds
    FROM v
),
assigned AS (
    SELECT vec_id, CAST(list_position(ds, list_min(ds)) - 1 AS INT) AS cell
    FROM d
),
probe_cells AS (
    SELECT query_id, cell FROM (
        SELECT d.vec_id AS query_id, i.i - 1 AS cell, ds[i.i] AS dist,
               ROW_NUMBER() OVER (
                   PARTITION BY d.vec_id ORDER BY ds[i.i] ASC, i.i ASC
               ) AS rnk_c
        FROM d CROSS JOIN (SELECT unnest(generate_series(1, {k})) AS i) i
        WHERE d.vec_id < {N_QUERIES}
    ) WHERE rnk_c <= {nprobe}
),
cand AS (
    SELECT p.query_id, a.vec_id AS neighbor_id
    FROM assigned a JOIN probe_cells p ON a.cell = p.cell
    WHERE a.vec_id <> p.query_id
),
scored AS (
    SELECT c.query_id, c.neighbor_id,
           list_inner_product(q.e, n.e) / (q.nrm * n.nrm) AS cos_raw
    FROM cand c
    JOIN v q ON q.vec_id = c.query_id
    JOIN v n ON n.vec_id = c.neighbor_id
),
ranked AS (
    SELECT query_id, neighbor_id, cos_raw,
           ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id ASC
           ) AS rnk
    FROM scored
)
SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk, ROUND(cos_raw, 6) AS cosine
FROM ranked WHERE rnk <= {TOP_K}"""


@query("sim_ann_ivf_fixed_topk", tables=("embeddings",), oracle=_ann_ivf_fixed_oracle())
def sim_ann_ivf_fixed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with FIXED deterministic centroids — the value-exact
    twin of `sim_ann_ivf_topk` (whose k-means-trained pair values are
    not SQL-replayable; since r11 that entry hashes self-judging
    booleans instead). Identical probe path: cell assignment is a JVM-side
    squared-distance argmin against a centroid tensor literal, each
    query probes its _IVF_FIXED_NPROBE (=6) nearest cells, candidates
    come from a broadcast bucket equi-join on `cell`, exact cosine
    rerank, top-k.

    What this proves that sim_ann_ivf_topk can't: the entire inverted-
    file query path (assignment argmin, probe-cell ranking with
    tie-break, bucket join, rerank) is value-exact against an
    independent engine. What it doesn't: quantizer quality — that stays
    with the k-means variant's recall gates. At cluster scale the
    trained centroids persist as a table and this exact plan runs
    against them; fixed centroids here = the persisted-index case."""
    t = load_tables(spark, sf_dir, "embeddings")
    centers = ivf_fixed_centers()
    corpus = t.embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("e")
    ).withColumn("nrm", _norm(F.col("e")))
    # r21: pin the assignment + ranked probe cells into ONE eager
    # checkpoint (the `admit_ivf_batch` pcells pattern extended to the
    # serving entries, VERDICT r20 item 1), with the conditional spread
    # ahead of it. Three costs disappear at once, A/B-measured
    # 1.56 -> 1.01s: (a) the join's pushed-down isnotnull(cell)
    # substituted the WHOLE k x dim assignment expression into the scan
    # filter, so every corpus row paid the 16x64 distance transform
    # twice (plans/r20/sim_ann_ivf_fixed_topk_before.txt op (2) — the
    # r20 §4 pushed-filter class); (b) the assignment ran in the
    # single-file fixture scan's ONE partition (§2 spread class);
    # (c) every downstream transformation re-analyzed a tensor-bearing
    # plan (~0.1s driver wall each — the r20 driver-gap class). The
    # checkpointed frame IS the inverted file of the persisted-index
    # production shape ("fixed centroids here = the persisted-index
    # case"); same expressions, same rows, values identical.
    from ..functions.udfs import spread_for_python

    assigned = (
        _assign_cells(spread_for_python(corpus), centers)
        .select(
            "*",
            F.slice(
                _ranked_probe_cells(centers), 1, _IVF_FIXED_NPROBE
            ).alias("pcells"),
        )
        .localCheckpoint(eager=True)
    )
    checkpoints.rotate("similarity.ivf_fixed_assigned", assigned)
    probes = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
        F.explode("pcells").alias("cell"),
    )
    cand = assigned.join(
        _bounded_broadcast(probes, N_QUERIES * _IVF_FIXED_NPROBE), "cell"
    ).filter(F.col("vec_id") != F.col("query_id"))
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (_dot(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("nrm"))).alias(
            "cos_raw"
        ),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "rnk", ratio(F.col("cos_raw")).alias("cosine"))
    )


@query(
    "embed_quantize_int8",
    tables=("embeddings",),
    oracle="""
WITH v AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
    FROM embeddings
),
s AS (
    SELECT vec_id, e,
           list_max(list_transform(e, x -> abs(x))) AS max_abs
    FROM v
),
q AS (
    SELECT vec_id, max_abs,
           list_transform(e, x -> CAST(round(x * 127.0 / max_abs) AS BIGINT)) AS qv
    FROM s
    WHERE max_abs > 0
)
SELECT vec_id,
       ROUND(127.0 / max_abs, 6)                                   AS scale,
       CAST(list_sum(qv) AS BIGINT)                                AS q_sum,
       CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT)   AS q_abs_sum,
       CAST(len(list_filter(qv, x -> abs(x) = 127)) AS BIGINT)     AS n_saturated
FROM q
""",
)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage/bandwidth
    step between embedding generation and ANN serving (4x smaller
    vectors, which at 100 TB is the difference between an index that
    fits hot storage and one that doesn't). scale = 127/max|x| per
    vector, q_i = round(x_i * scale); all JVM-side array transforms,
    map-only, pipelines straight out of the scan.

    Verification note: the checksums are INTEGER (sum, abs-sum,
    saturation count of the quantized values), so the oracle compare is
    exact — no float-summation tolerance anywhere; the only float
    output is the per-vector scale, deterministic as a single IEEE
    division. Zero vectors (max_abs = 0) are excluded on both sides
    rather than given a sentinel scale."""
    t = load_tables(spark, sf_dir, "embeddings")
    e = _as_double(F.col("embedding"))
    base = t.embeddings.select("vec_id", e.alias("e")).withColumn(
        "max_abs", F.array_max(F.transform(F.col("e"), lambda x: F.abs(x)))
    ).filter(F.col("max_abs") > 0)
    qv = F.transform(
        F.col("e"), lambda x: F.round(x * 127.0 / F.col("max_abs")).cast("bigint")
    )
    quant = base.withColumn("qv", qv)
    return quant.select(
        "vec_id",
        F.round(127.0 / F.col("max_abs"), 6).alias("scale"),
        F.aggregate("qv", F.lit(0).cast("bigint"), lambda a, x: a + x).alias("q_sum"),
        F.aggregate(
            "qv", F.lit(0).cast("bigint"), lambda a, x: a + F.abs(x)
        ).alias("q_abs_sum"),
        F.size(F.filter("qv", lambda x: F.abs(x) == 127)).cast("bigint").alias(
            "n_saturated"
        ),
    )


_Q8_RERANK = 2 * TOP_K  # int8 shortlist width before the exact rerank


def _ann_ivf_q8_oracle(k: int = _IVF_K, nprobe: int = _IVF_FIXED_NPROBE) -> str:
    """DuckDB twin of the quantized IVF serving path: same fixed-centroid
    assignment/probe CTEs as `_ann_ivf_fixed_oracle`, then int8
    candidate scoring (exact BIGINT dot — products bounded by
    127*127*64 ~ 1e6, so the DOUBLE `list_inner_product` carries them
    exactly) and a float rerank of the shortlist."""
    centers = ivf_fixed_centers(k, 64)
    ds = _oracle_dist_list(centers)
    return f"""
WITH v AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
           sqrt(list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
    FROM embeddings
),
qz AS (
    SELECT vec_id, e, nrm, max_abs,
           list_transform(e, x -> CAST(round(x * 127.0 / max_abs) AS BIGINT)) AS qv
    FROM (SELECT *, list_max(list_transform(e, x -> abs(x))) AS max_abs FROM v)
    WHERE max_abs > 0
),
d AS (
    SELECT vec_id, nrm, max_abs, qv,
        [{ds}] AS ds
    FROM qz
),
assigned AS (
    SELECT vec_id, nrm, max_abs, qv,
           CAST(list_position(ds, list_min(ds)) - 1 AS INT) AS cell
    FROM d
),
probe_cells AS (
    SELECT query_id, cell FROM (
        SELECT d.vec_id AS query_id, i.i - 1 AS cell,
               ROW_NUMBER() OVER (
                   PARTITION BY d.vec_id ORDER BY ds[i.i] ASC, i.i ASC
               ) AS rnk_c
        FROM d CROSS JOIN (SELECT unnest(generate_series(1, {k})) AS i) i
        WHERE d.vec_id < {N_QUERIES}
    ) WHERE rnk_c <= {nprobe}
),
cand AS (
    SELECT p.query_id, a.vec_id AS neighbor_id, a.nrm, a.max_abs, a.qv
    FROM assigned a JOIN probe_cells p ON a.cell = p.cell
    WHERE a.vec_id <> p.query_id
),
qscored AS (
    SELECT c.query_id, c.neighbor_id,
           CAST(list_inner_product(q.qv, c.qv) AS BIGINT) AS q_score,
           (CAST(list_inner_product(q.qv, c.qv) AS BIGINT) * c.max_abs) / c.nrm
               AS proxy
    FROM cand c JOIN qz q ON q.vec_id = c.query_id
),
shortlist AS (
    SELECT query_id, neighbor_id, q_score,
           ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY proxy DESC, neighbor_id ASC
           ) AS rnk_q
    FROM qscored
),
rerank AS (
    SELECT s.query_id, s.neighbor_id, s.q_score,
           list_inner_product(q.e, n.e) / (q.nrm * n.nrm) AS cos_raw
    FROM shortlist s
    JOIN v q ON q.vec_id = s.query_id
    JOIN v n ON n.vec_id = s.neighbor_id
    WHERE s.rnk_q <= {_Q8_RERANK}
),
ranked AS (
    SELECT query_id, neighbor_id, q_score, cos_raw,
           ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id ASC
           ) AS rnk
    FROM rerank
)
SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk,
       CAST(q_score AS BIGINT) AS q_score, ROUND(cos_raw, 6) AS cosine
FROM ranked WHERE rnk <= {TOP_K}"""


@query("sim_ann_ivf_q8_serve", tables=("embeddings",), oracle=_ann_ivf_q8_oracle())
def sim_ann_ivf_q8_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ANN *serving* shape: quantized index, exact
    rerank — `embed_quantize_int8`'s per-vector symmetric int8 codes
    composed with `sim_ann_ivf_fixed_topk`'s inverted-file probe
    (VERDICT r5 item 6). Candidates from the probed cells are first
    scored with the exact BIGINT int8 dot product (the only data the
    quantized index stores — 4x smaller than float32, which at 100 TB
    is what lets the hot index fit memory); the top 2k shortlist then
    gets the full-precision cosine rerank that fixes quantization
    rank-noise in the head.

    Verification: `q_score` is an INTEGER checksum of the quantized
    scoring (no float tolerance), and the shortlist proxy
    (q_score * max_abs / nrm) is the same single IEEE expression on
    both engines, so the shortlist boundary — the one place float
    determinism could bite — is bit-identical, not merely close.

    Scale shape: identical to the fixed-IVF probe (map-only assignment,
    bounded-broadcast probe join, per-query windows over candidate
    sets); the rerank only ever touches N_QUERIES * 2k rows."""
    t = load_tables(spark, sf_dir, "embeddings")
    centers = ivf_fixed_centers()
    corpus = (
        t.embeddings.select("vec_id", _as_double(F.col("embedding")).alias("e"))
        .withColumn("nrm", _norm(F.col("e")))
        .withColumn("max_abs", F.array_max(F.transform(F.col("e"), lambda x: F.abs(x))))
        .filter(F.col("max_abs") > 0)
        .withColumn(
            "qv",
            F.transform(
                F.col("e"),
                lambda x: F.round(x * 127.0 / F.col("max_abs")).cast("bigint"),
            ),
        )
    )
    # r21: same pinned assignment + pcells checkpoint as
    # `sim_ann_ivf_fixed_topk` (see that entry's comment for the three
    # costs it removes — pushed-filter double-assignment, 1-partition
    # scan, tensor-bearing re-analysis). A/B-measured 1.86 -> 1.41s.
    from ..functions.udfs import spread_for_python

    assigned = (
        _assign_cells(spread_for_python(corpus), centers)
        .select(
            "*",
            F.slice(
                _ranked_probe_cells(centers), 1, _IVF_FIXED_NPROBE
            ).alias("pcells"),
        )
        .localCheckpoint(eager=True)
    )
    checkpoints.rotate("similarity.ivf_q8_assigned", assigned)
    probes = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
        F.col("qv").alias("qqv"),
        F.explode("pcells").alias("cell"),
    )
    cand = assigned.join(
        _bounded_broadcast(probes, N_QUERIES * _IVF_FIXED_NPROBE), "cell"
    ).filter(F.col("vec_id") != F.col("query_id"))
    int_dot = F.aggregate(
        F.zip_with(F.col("qqv"), F.col("qv"), lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    qscored = cand.withColumn("q_score", int_dot).withColumn(
        "proxy", (F.col("q_score") * F.col("max_abs")) / F.col("nrm")
    )
    w_q = W.partitionBy("query_id").orderBy(
        F.col("proxy").desc(), F.col("vec_id").asc()
    )
    shortlist = (
        qscored.withColumn("rnk_q", F.row_number().over(w_q))
        .filter(F.col("rnk_q") <= _Q8_RERANK)
        .withColumn("cos_raw", _dot(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("nrm")))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "q_score", "cos_raw")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("neighbor_id").asc())
    return (
        shortlist.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "rnk",
            "q_score",
            ratio(F.col("cos_raw")).alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# Integer fixed-point k-means: hash-checkable IVF TRAINING (r8)
# ---------------------------------------------------------------------------

_IKM_SCALE = 10_000  # component quantization: floor(x * 1e4) as BIGINT
_IKM_ITERS = 2       # fixed Lloyd update steps (determinism, not convergence)
_IKM_DIM = 64


def _ikm_tdiv(a: int, b: int) -> int:
    """TRUNCATING integer division (toward zero) — DuckDB's `//`
    truncates (-7 // 2 = -3) while Python's floors (-4), so the Python
    side of the centroid update must truncate explicitly or negative
    component sums diverge between the engines."""
    q = a // b
    return q + 1 if q < 0 and q * b != a else q


def _ikm_oracle(k: int = _IVF_K, iters: int = _IKM_ITERS, dim: int = _IKM_DIM) -> str:
    """Unrolled-iteration DuckDB twin of the integer k-means: seed with
    the k lowest-vec_id quantized vectors, then `iters` Lloyd steps
    (integer squared distances, ROW_NUMBER tie-break on (dist, k),
    truncating-division centroid update, empty cells carrying the
    previous centroid), then a final assignment — the same chained-CTE
    unrolling as the PageRank oracle, sidestepping recursive-term
    aggregate bans while keeping each step's algebra readable."""

    def dist(qt: str, ct: str) -> str:
        return " + ".join(
            f"({qt}.qe[{i}]-{ct}.c[{i}])*({qt}.qe[{i}]-{ct}.c[{i}])"
            for i in range(1, dim + 1)
        )

    def assign(name: str, cents: str) -> str:
        return f"""{name} AS (
    SELECT vec_id, qe, k, dist FROM (
        SELECT q.vec_id, q.qe, cen.k, {dist('q', 'cen')} AS dist
        FROM q CROSS JOIN {cents} cen)
    QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, k) = 1
)"""

    def update(uname: str, cname: str, aname: str, prev: str) -> str:
        sums = ", ".join(f"SUM(qe[{i}]) AS s{i}" for i in range(1, dim + 1))
        newc = ", ".join(f"CAST(u.s{i} // u.n AS BIGINT)" for i in range(1, dim + 1))
        return f"""{uname} AS (
    SELECT k, COUNT(*) AS n, {sums} FROM {aname} GROUP BY k
),
{cname} AS (
    SELECT p.k, CASE WHEN u.n IS NULL THEN p.c ELSE [{newc}] END AS c
    FROM {prev} p LEFT JOIN {uname} u ON u.k = p.k
)"""

    parts = [
        f"""q AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {_IKM_SCALE}) AS BIGINT)) AS qe
    FROM embeddings
),
c0 AS (
    SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS k, qe AS c
    FROM (SELECT vec_id, qe FROM q ORDER BY vec_id LIMIT {k})
)"""
    ]
    prev = "c0"
    for i in range(1, iters + 1):
        parts.append(assign(f"a{i}", prev))
        parts.append(update(f"u{i}", f"c{i}", f"a{i}", prev))
        prev = f"c{i}"
    parts.append(assign("afin", prev))
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT vec_id, CAST(k AS INT) AS cell, CAST(dist AS BIGINT) AS dist
FROM afin"""
    )


def _ikm_assign(qdf: DataFrame, centers: list[list[int]]) -> DataFrame:
    """(vec_id, qe, cell, dist) under integer centroid literals: the
    matrix ships as ONE F.expr array(array(...)) literal (the
    _centroid_sq_dists lesson — per-component F.lit calls cost seconds
    of py4j), distances fold JVM-side in whole-stage codegen, and
    array_position(min) picks the LOWEST cell on ties — the same
    (dist, k) order the oracle's ROW_NUMBER uses."""
    tensor_sql = "array(" + ", ".join(
        "array(" + ", ".join(f"{x}L" for x in c) + ")" for c in centers
    ) + ")"
    dists = F.transform(
        _const_array_literal(tensor_sql),
        lambda c: F.aggregate(
            F.zip_with(F.col("qe"), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    # TWO selects instead of withColumn x3 + drop — the `_assign_cells`
    # r21 fusion applied to the integer twin (same argument: `_d` stays
    # a single materialized pass per row, optimized plan unchanged,
    # eager JVM re-analyses drop 4 -> 2).
    with_d = qdf.select("*", dists.alias("_d"))
    return with_d.select(
        *qdf.columns,
        (F.array_position("_d", F.array_min("_d")) - 1).cast("int").alias("cell"),
        F.array_min("_d").alias("dist"),
    )


@query("ivf_kmeans_int_train", tables=("embeddings",), oracle=_ikm_oracle())
def ivf_kmeans_int_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer TRAINING, hash-checked end to end — the gap
    `sim_ann_ivf_topk` cannot close value-exactly (k-means on
    floats is order-sensitive; that entry hashes self-judging recall
    booleans instead): quantize every vector to integer
    10^-4 units (floor(x*1e4), one IEEE op both engines), seed with the
    k lowest-vec_id vectors, run _IKM_ITERS Lloyd steps entirely in
    int64 — squared distances, lowest-cell tie-break, TRUNCATING
    centroid division (pinned to DuckDB's `//`; Python floors, see
    _ikm_tdiv), empty cells carrying their previous centroid — and emit
    the final (vec_id, cell, dist) assignment. Every training decision
    is bit-reproducible, so the driver hash checks the LEARNED
    partition itself, not a fixed stand-in (`sim_ann_ivf_fixed_topk`
    stays as the serving-path twin; the float MLlib trainer stays as
    the production `ivf_build_index`).

    Scale shape: each Lloyd step is (1) a map-only assignment — the
    k x dim centroid matrix is a plan literal, distances fold in
    codegen, no shuffle; (2) a centroid update via posexplode ->
    groupBy(cell, pos) — dim rows per vector map-side, partial-agg
    collapsed to k*dim rows before the shuffle; (3) a driver-side
    divide over k*dim integers (same O(1) role as PageRank's N).
    At 100 TB: train on the deterministic hash-sample
    (`ivf_build_index`'s cap) — Lloyd cost is per-step linear in the
    sample, and the final full-corpus assignment is the same map-only
    expression the serving entries already run. Measured ~2.1s at
    sf0.1 (2k vectors, min-of-2 warm) — dominated by the two
    collect-synchronized Lloyd steps' fixed job overhead, not data."""
    t = load_tables(spark, sf_dir, "embeddings")
    qdf = t.embeddings.select(
        "vec_id",
        F.transform(
            _as_double(F.col("embedding")),
            lambda x: F.floor(x * _IKM_SCALE).cast("long"),
        ).alias("qe"),
    )
    # The checkpointed training frame inherited the single-file fixture
    # scan's ONE partition, so all 8 Lloyd-loop jobs (3 assigns + 2
    # update aggregates + seed collect) ran their map side on one core
    # (r20 spread class; the driver's 8-vs-32-core ratio for this entry
    # was 1.17). Conditional fan-out before the pin; integer Lloyd's is
    # partitioning-independent — the update is a commutative integer
    # SUM per (cell, pos) and the seed collect is orderBy(vec_id) — so
    # values stay bit-identical. A/B-measured 1.87 -> 1.39s.
    from ..functions.udfs import spread_for_python

    qdf = spread_for_python(qdf).localCheckpoint(
        eager=True
    )  # 3 assigns + 2 updates re-read it
    checkpoints.rotate("similarity.ikm_qdf", qdf)

    centers = [
        list(r["qe"]) for r in qdf.orderBy("vec_id").limit(_IVF_K).collect()
    ]
    for _ in range(_IKM_ITERS):
        assigned = _ikm_assign(qdf, centers)
        sums = (
            assigned.select("cell", F.posexplode("qe").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cell: dict[int, dict[int, tuple[int, int]]] = {}
        for r in sums:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = (int(r["s"]), int(r["n"]))
        centers = [
            [
                _ikm_tdiv(*by_cell[ci][p]) for p in range(_IKM_DIM)
            ]
            if ci in by_cell
            else centers[ci]
            for ci in range(_IVF_K)
        ]
    return _ikm_assign(qdf, centers).select("vec_id", "cell", "dist")


# --- incremental ANN probe: new batch vs persisted IVF index ----------

_SIM_PROBE_MOD = 10  # batch = vec_id % 10 == 0 (the dedup-probe split)
# Admission bar, calibrated to the random-vector fixture exactly like
# dedup_embedding_cosine's 0.35 (max pair cosine ~0.44 at sf0.01) so
# both 'dup' and 'new' verdicts carry live hash signal; production
# near-dup admission (~0.9 on clustered embeddings) is a constant swap.
_SIM_PROBE_DUP_COS = 0.35


def build_ivf_parquet_index(corpus: DataFrame, path: str) -> None:
    """Build and PERSIST the ANN corpus index: one parquet row per
    corpus vector carrying its doubled embedding, norm, and fixed-
    centroid cell id, written ``partitionBy("cell")`` — the inverted
    file AS A TABLE LAYOUT. This is the indexed-corpus half of the
    incremental similarity story (the `minhash_index_for` analogue):
    built once per corpus version with the only full-corpus argmin
    pass, appended to as batches are admitted, and probed by every
    arriving batch without re-assigning the corpus. At 100 TB the same
    table lives cell-partitioned on object storage, so a probe's
    broadcast cell join prunes to the probed cells (DPP) instead of
    scanning the corpus."""
    _write_ivf_index(corpus, path, "overwrite")


_IVF_CENTROIDS_SIDECAR = "_centroids.json"


def _ivf_sidecar(spark: SparkSession, path: str):
    """(hadoop Path of the sidecar, its FileSystem)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(
        f"{path.rstrip('/')}/{_IVF_CENTROIDS_SIDECAR}"
    )
    return p, p.getFileSystem(spark._jsc.hadoopConfiguration())


def save_ivf_centers(
    spark: SparkSession, path: str, centers: list[list[float]]
) -> None:
    """Persist an index's TRAINED centroids next to its cell
    directories (underscore-prefixed, so parquet readers and the
    partition detector ignore it). The sidecar is the index's quantizer
    DEFINITION: a reader probing with any other centroids probes the
    wrong cells. A plain `build_ivf_parquet_index` carries no sidecar —
    absence means the fixed quantizer (`load_ivf_centers`)."""
    import json

    p, fs = _ivf_sidecar(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(json.dumps(centers).encode("utf-8")))
    finally:
        out.close()


def load_ivf_centers(spark: SparkSession, path: str) -> list[list[float]]:
    """The centroids index ``path`` was built with: the trained sidecar
    when present (a `rebuild_ivf_index` product), else the fixed
    quantizer."""
    import json

    p, fs = _ivf_sidecar(spark, path)
    if not fs.exists(p):
        return ivf_fixed_centers()
    reader = spark._jvm.java.io.BufferedReader(
        spark._jvm.java.io.InputStreamReader(fs.open(p), "UTF-8")
    )
    try:
        lines = []
        while True:
            line = reader.readLine()
            if line is None:
                break
            lines.append(line)
    finally:
        reader.close()
    return [[float(x) for x in c] for c in json.loads("".join(lines))]


def _write_ivf_index(vectors: DataFrame, path: str, mode: str) -> None:
    """Normalize + assign raw (vec_id, embedding) vectors and write
    them through the ONE index projection
    (`_write_ivf_index_assigned`). Zero/null-norm vectors are
    UNINDEXABLE (cosine against them is undefined; under ANSI mode the
    probe's division would throw on every later query touching their
    cell — self-review r12) and are excluded here, at the single
    chokepoint every index write passes through.

    Quantizer selection: APPENDS assign with the index's OWN centroids
    (`load_ivf_centers` — appending under foreign cells would corrupt a
    rebuilt index's inverted file); a fresh overwrite build uses the
    fixed quantizer and DELETES any stale trained sidecar explicitly —
    Spark's static overwrite would wipe it with the directory, but
    under spark.sql.sources.partitionOverwriteMode=dynamic only cell=
    partitions are replaced and a surviving sidecar would poison every
    later read (self-review r12)."""
    spark = vectors.sparkSession
    if mode == "append":
        centers = load_ivf_centers(spark, path)
    else:
        centers = ivf_fixed_centers()
        p, fs = _ivf_sidecar(spark, path)
        if fs.exists(p):
            fs.delete(p, False)
    v = (
        vectors.select(
            F.col("vec_id").cast("long").alias("vec_id"),
            _as_double(F.col("embedding")).alias("e"),
        )
        .withColumn("nrm", _norm(F.col("e")))
        .filter(F.col("nrm") > 0.0)
    )
    _write_ivf_index_assigned(_assign_cells(v, centers), path, mode)


def _write_ivf_index_assigned(assigned: DataFrame, path: str, mode: str) -> None:
    """ONE copy of the index write shared by build, append, and
    `admit_ivf_batch`'s already-assigned path (which must not pay a
    second centroid-assignment pass over vectors it assigned to
    probe) — the schema (incl. the bigint id pin: an int-typed id
    would write an INT32 parquet column next to INT64 originals and
    break mixed-file reads) must never diverge between the writers.
    ``assigned`` carries (vec_id, e, nrm, cell).

    r21 (guide §6 small files): an admission batch arrives round-robin
    across the session's partitions, so a partitionBy("cell") write
    emitted up to tasks x cells files — measured 417 tiny files and
    1.35s per sf0.1 append, and every later index read/clone/compact
    re-paid the listing. The AQE REBALANCE(cell) hint clusters rows by
    cell before the write (one file per touched cell: 16 files, 0.55s
    measured) while staying scale-safe — unlike repartition("cell"),
    which would cap a 100 TB full-build write at k tasks, REBALANCE
    splits oversized cells back out at runtime. This is the
    write.distribution-mode=hash posture of partitioned table formats;
    row placement only, values unchanged."""
    assigned.select(
        F.col("vec_id").cast("long").alias("vec_id"), "e", "nrm", "cell"
    ).hint("rebalance", "cell").write.mode(mode).partitionBy("cell").parquet(path)


def append_to_ivf_index(new_vectors: DataFrame, path: str) -> None:
    """Admit a batch INTO the persisted IVF index: the same map-only
    fixed-centroid assignment as `build_ivf_parquet_index`, appended
    under the existing ``cell`` partitioning — no rebuild, no corpus
    re-assignment, and the next probe's cell join sees the admitted
    vectors immediately (their cells' directories just gained files).
    ``new_vectors`` carries the raw ``(vec_id, embedding)`` shape; the
    steady-state write path after `sim_incremental_probe` says 'new'.
    Periodic small-file compaction + the occupancy-skew check are
    `compact_ivf_index` below."""
    _write_ivf_index(new_vectors, path, "append")


# Occupancy-skew bound for a healthy IVF index: the probe's bounded-
# broadcast/pruned-scan story assumes no cell dominates (a hot cell
# makes every probe touching it scan ~that share of the corpus).
# Uniform occupancy at _IVF_K=16 is 1/16 = 0.0625; the fixed spherical
# centroids measure max shares 0.08-0.12 across the sf0.001/0.01/0.1
# fixtures, so 4x uniform flags genuine drift-induced skew (a cell
# absorbing a quarter of the corpus) without flaking on fixture noise.
IVF_MAX_CELL_SHARE = 0.25


def ivf_max_cell_share(index: DataFrame) -> float:
    """Largest cell's share of a persisted IVF index's rows — the
    occupancy-skew statistic `compact_ivf_index` and the scale gate's
    ix_* family check against `IVF_MAX_CELL_SHARE`. One k-row
    aggregate (k = number of cells), driver-side by construction."""
    rows = index.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    total = sum(r["n"] for r in rows)
    return max(r["n"] for r in rows) / total if total else 0.0


def compact_ivf_index(
    spark: SparkSession, path: str, target_partitions: int = _IVF_K
) -> dict:
    """MAINTENANCE for the append-grown IVF index (VERDICT r11 item 2):
    each `append_to_ivf_index` adds a file per touched cell directory,
    and distribution drift can skew cell occupancy until a hot cell
    degrades the probe's bounded-broadcast claim. This

    1. rewrites the index via `tables.compact_parquet`, which detects
       the ``cell=`` directory layout and re-emits it with the same
       ``partitionBy`` (repartitioned BY the partition column, so each
       cell directory compacts to ~one file) — CELL-PARTITION-
       PRESERVING, so the probe's DPP-pruned cell join is untouched;
    2. re-measures occupancy skew (`ivf_max_cell_share`) and reports
       whether it still clears `IVF_MAX_CELL_SHARE` — past the bound
       the right repair is re-training the quantizer (a rebuild with
       fresh centroids), which compaction deliberately is not.

    Probe results are BYTE-IDENTICAL before/after (pinned by
    tests/test_sinks_tables.py): rows are repacked, values and the
    partition layout unchanged. Returns ``{"n_files", "max_cell_share",
    "occupancy_ok"}``."""
    from ..tables import compact_parquet

    # the trained-centroid sidecar (if any) lives INSIDE the directory
    # compact_parquet swaps out — preserve_rootfiles copies it into the
    # rewrite BEFORE the swap, so data and quantizer definition promote
    # atomically (self-review r12: re-saving it after the swap left a
    # crash window where the compacted index had lost its quantizer and
    # every later probe would hit the wrong cells)
    n_files = compact_parquet(
        spark,
        path,
        target_partitions,
        preserve_rootfiles=(_IVF_CENTROIDS_SIDECAR,),
    )
    share = ivf_max_cell_share(spark.read.parquet(path))
    return {
        "n_files": n_files,
        "max_cell_share": share,
        "occupancy_ok": share <= IVF_MAX_CELL_SHARE,
    }


def rebuild_ivf_index(
    spark: SparkSession,
    path: str,
    k: int = _IVF_K,
    seed: int = 42,
    sample_cap: int = _IVF_SAMPLE_CAP,
) -> dict:
    """OCCUPANCY REPAIR — the maintenance step `compact_ivf_index`
    points at when the skew check fails: distribution drift makes a
    fixed quantizer's hot cell absorb the corpus, and compaction can
    repack files but never re-place vectors. This retrains the coarse
    quantizer on the index's CURRENT contents (the `ivf_build_index`
    recipe: seeded MLlib KMeans over a deterministic hash-sample of at
    most ``sample_cap`` rows — at 100 TB the retrain reads a bounded
    sample plus one full assignment pass) and rewrites the inverted
    file under the new cells: ``partitionBy("cell")`` into a temp dir
    together with the trained-centroid sidecar, then the
    `tables.compact_parquet` two-rename swap (crash-safe — the live
    directory is either wholly old or wholly new, and a crash between
    the renames restores from ``._prerebuild`` on the next run).
    Later probes and admission appends pick the trained quantizer up
    via `load_ivf_centers`, so the index stays self-describing.

    NOT SQL-replayable (float k-means — the same reason
    `sim_ann_ivf_topk` self-judges), so this is a pytest-gated
    maintenance utility, not a catalog entry. This is OFFLINE
    maintenance (run it between probe/admission windows, like
    compaction): a concurrent admission APPEND during the rebuild would
    be silently dropped by the rewrite, so the function refuses
    TWICE (tmp deleted, index untouched): a cheap pre-check against the
    snapshot before disturbing the live dir, and — closing the
    check-then-act window between that listing and the swap (ADVICE
    r12) — a re-verification of the FROZEN set-aside tree inside
    `_commit_swap` itself, where a racing append can no longer hide.
    Returns ``{"n_vectors", "max_cell_share", "occupancy_ok"}``."""
    from ..tables import _commit_swap, _swap_paths

    path = path.rstrip("/")  # 'dir/' would make tmp/old its children
    jvm = spark._jvm
    fs, hpath, tmp, old = _swap_paths(spark, path, "._rebuilding", "._prerebuild")

    rows = spark.read.parquet(path).select("vec_id", "e", "nrm")
    # snapshot as ROOT-RELATIVE paths: the in-swap re-verification
    # lists the renamed-aside tree, whose absolute prefix differs.
    # The root prefix comes from the HADOOP path, never the raw
    # argument (self-review r14: a scheme-qualified 'file:/...' or
    # double-slash argument would mis-slice every snapshot entry and
    # turn the refusal guard into an unconditional spurious abort)
    rootlen0 = len(hpath.toUri().getPath()) + 1
    snapshot = {
        jvm.org.apache.hadoop.fs.Path(u).toUri().getPath()[rootlen0:]
        for u in rows.inputFiles()
    }

    def _data_files(root) -> set:
        rootlen = len(root.toUri().getPath()) + 1
        out = set()
        it = fs.listFiles(root, True)
        while it.hasNext():
            p = it.next().getPath()
            name = p.getName()
            if not name.startswith("_") and not name.startswith("."):
                out.add(p.toUri().getPath()[rootlen:])
        return out

    def _refuse(appended: set, where: str):
        raise RuntimeError(
            f"rebuild aborted: {len(appended)} data file(s) were appended to "
            f"{path} {where} — swapping would silently drop those rows; "
            "stop admissions (offline maintenance window) and re-run"
        )

    centers, n = _train_ivf_centers(rows, k, seed, sample_cap)
    # write the full replacement (data + sidecar) into tmp BEFORE any
    # rename, so the swap publishes quantizer and inverted file as one
    _write_ivf_index_assigned(_assign_cells(rows, centers), str(tmp), "overwrite")
    save_ivf_centers(spark, str(tmp), centers)

    # refuse rather than lose: any data file appended since the
    # snapshot would vanish in the swap while its ledger/sink rows
    # survive — the silent-dup hole self-review r12 flagged. Cheap
    # pre-check first (aborts before the live dir is touched)...
    appended = _data_files(hpath) - snapshot
    if appended:
        fs.delete(tmp, True)
        _refuse(appended, "during the rebuild")

    def _verify_frozen(old_path):
        # ...then the authoritative check on the set-aside tree: an
        # append that raced past the pre-check landed before the
        # rename and is visible here; raising restores the old tree
        late = _data_files(old_path) - snapshot
        if late:
            _refuse(late, "during the swap")

    _commit_swap(fs, hpath, tmp, old, path, verify_old=_verify_frozen)
    share = ivf_max_cell_share(spark.read.parquet(path))
    return {
        "n_vectors": n,
        "max_cell_share": share,
        "occupancy_ok": share <= IVF_MAX_CELL_SHARE,
    }


def maintain_ivf_index(spark: SparkSession, path: str) -> dict:
    """The ONE offline-maintenance entrypoint for an append-grown IVF
    index (VERDICT r12 item 6): compact the small files
    (`compact_ivf_index`, cell-layout-preserving), and if the
    post-compaction occupancy check fails — distribution drift made a
    cell absorb more than `IVF_MAX_CELL_SHARE` of the corpus, which
    file repacking can never fix — retrain and rewrite via
    `rebuild_ivf_index` INSIDE the same maintenance window (the
    rebuild's refuse-on-concurrent-append guards stay armed, so a
    window violation aborts loudly rather than losing rows). Before
    this existed, the repair was documented but unwired: compaction
    reported ``occupancy_ok: False`` and the operator had to know to
    call the rebuild by hand.

    The report's top-level ``max_cell_share``/``occupancy_ok`` describe
    the index AS LEFT BY MAINTENANCE (post-rebuild when the repair
    fired — a caller gating on the top-level numbers must never see the
    pre-repair failure the call just fixed; self-review r14). When
    rebuilt: ``rebuilt`` is True, the drifted share is kept under
    ``pre_rebuild_max_cell_share``, and the rebuild's own report under
    ``"rebuild"`` (its ``occupancy_ok`` reflects the RETRAINED
    quantizer — k-means on the drifted distribution, the best k cells
    can do)."""
    report = compact_ivf_index(spark, path)
    report["rebuilt"] = False
    if not report["occupancy_ok"]:
        rebuild = rebuild_ivf_index(spark, path)
        report["rebuilt"] = True
        report["rebuild"] = rebuild
        report["pre_rebuild_max_cell_share"] = report["max_cell_share"]
        report["max_cell_share"] = rebuild["max_cell_share"]
        report["occupancy_ok"] = rebuild["occupancy_ok"]
    return report


def admit_ivf_batch(
    spark: SparkSession,
    index_path: str,
    batch_vectors: DataFrame,
    admitted_path: str | None = None,
    batch_id: int | None = None,
) -> DataFrame:
    """The ANN half of the streaming-admission composition — the
    embedding twin of `operators.dedup.admit_minhash_batch`, sharing
    its semantics and (load-bearing) write ordering: assign each
    arriving (vec_id, embedding) its probe cells map-only, probe the
    persisted cell-partitioned IVF index, verdict 'dup' when any
    indexed vector or any OTHER batch member scores cosine >=
    `_SIM_PROBE_DUP_COS` against it (within-batch pairs found in
    either probe direction; the larger vec_id loses, canon_id = the
    smaller), 'invalid' for zero/null-norm vectors (cosine undefined —
    they never reach the probe, sink, or index), upsert admissions
    into ``admitted_path`` via `ingest.admit_sink_upsert` (O(1)
    batch-partition write when ``batch_id`` is given — the
    foreachBatch path — else the row-level first-write-wins
    anti-join; see that helper for the replay case analysis), and
    append them to the index via their ALREADY-COMPUTED cell assignment
    (`_write_ivf_index_assigned` — no second argmin pass). Returns the
    ledger ``(vec_id, status 'admitted'/'dup'/'invalid', canon_id,
    n_matches)``.

    Exactly-once under at-least-once replay is the same three-step
    argument as the MinHash twin (ledger pinned before any write; sink
    before index; a post-completion replay matches its own indexed
    copies at cosine 1.0 and no-ops) — see admit_minhash_batch's
    docstring for the case analysis. Scale: probe cost is
    O(batch x nprobe-cell occupancy); the within-batch self-probe is
    cell-bucketed batch x batch. Unlike the MinHash twin's r14
    single-tagged-probe fold, the two probes here stay SEPARATE on
    purpose: the index probe's scan is the DPP-pruned cell-partitioned
    parquet read, and a corpus ∪ batch union on the candidate side
    would put a Union above the scan and forfeit the partition pruning
    — re-reading the whole corpus index per micro-batch to save one
    join pipeline is a bad trade (the MinHash index has no pruned-scan
    shape to lose). Compaction/occupancy maintenance is
    `compact_ivf_index`."""
    from ..ingest import admit_sink_upsert

    # the index's OWN quantizer (trained sidecar after a rebuild, else
    # fixed): assigning or probing with foreign centroids would hit the
    # wrong cells
    centers = load_ivf_centers(spark, index_path)
    v = (
        batch_vectors.select(
            F.col("vec_id").cast("long").alias("vec_id"),
            _as_double(F.col("embedding")).alias("e"),
        )
        .withColumn("nrm", _norm(F.col("e")))
    )
    # Degenerate vectors (zero/null norm — cosine undefined) are
    # INVALID, not admitted: under ANSI mode the cosine division would
    # throw, and inside foreachBatch that is a poison pill (replay
    # re-crashes the same micro-batch forever — self-review r12). They
    # get a visible ledger verdict and never reach the probe, the
    # sink, or the index.
    invalid = v.filter(F.col("nrm").isNull() | (F.col("nrm") <= 0.0)).select(
        "vec_id",
        F.lit("invalid").alias("status"),
        F.lit(None).cast("long").alias("canon_id"),
        F.lit(0).cast("long").alias("n_matches"),
    )
    valid = v.filter(F.col("nrm") > 0.0)
    # Round-robin the batch to session parallelism before the pinned
    # assignment: a small file-source micro-batch scans as ONE
    # partition, and both probes' exact-cosine evaluation parallelism
    # is the probe side's partitioning under the broadcast plan — the
    # `semdedup_assigned` lesson (r16), measured here 11s -> ~1s per
    # admit call at sf0.1.
    sc = valid.sparkSession.sparkContext
    # The nprobe-ranked probe cells are computed ONCE here and pinned
    # into the assignment checkpoint (r20): both probes below used to
    # re-derive them from `e`, which embedded the k x dim centroid
    # tensor literal in every probe plan — and on this sandbox each
    # DataFrame transformation over a tensor-bearing plan pays eager
    # re-analysis (~0.4s driver wall per probe construction, cProfile).
    # Values are identical: it is the same slice(_ranked_probe_cells)
    # expression, materialized at checkpoint time instead of probe
    # time. The index writer projects its fixed column set, so the
    # extra column never reaches the persisted index.
    assigned = (
        _assign_cells(valid.repartition(sc.defaultParallelism), centers)
        .select(
            "*",
            F.slice(
                _ranked_probe_cells(centers), 1, _IVF_FIXED_NPROBE
            ).alias("pcells"),
        )
        .localCheckpoint(eager=True)
    )
    index = spark.read.parquet(index_path)
    idx_m = (
        probe_ivf_index(
            index, assigned, centers=centers, precomputed_cells="pcells"
        )
        .filter(F.col("cos_raw") >= _SIM_PROBE_DUP_COS)
        .select(F.col("qid").alias("vec_id"), F.col("nn_id").alias("canon_id"))
    )
    # Within-batch near-dups: the cell probe is DIRECTION-ASYMMETRIC
    # (A's nprobe cells may reach B's cell while B's never reach A's —
    # unlike the MinHash twin's symmetric band join), so keep a pair
    # found in EITHER direction and canonicalize by id afterwards
    # (self-review r12: filtering on nn_id < qid dropped ~12% of
    # threshold-level pairs found only in the discarded direction and
    # admitted both members).
    self_m = (
        probe_ivf_index(
            assigned, assigned, centers=centers, precomputed_cells="pcells"
        )
        .filter(
            (F.col("cos_raw") >= _SIM_PROBE_DUP_COS)
            & (F.col("nn_id") != F.col("qid"))
        )
        .select(
            F.greatest("qid", "nn_id").alias("vec_id"),
            F.least("qid", "nn_id").alias("canon_id"),
        )
    )
    agg = (
        idx_m.unionByName(self_m)
        .groupBy("vec_id")
        .agg(
            F.min("canon_id").alias("canon_id"),
            F.countDistinct("canon_id").alias("n_matches"),
        )
    )
    ledger = (
        assigned.select("vec_id")
        .join(agg, "vec_id", "left")
        .select(
            "vec_id",
            F.when(F.col("canon_id").isNull(), F.lit("admitted"))
            .otherwise(F.lit("dup"))
            .alias("status"),
            "canon_id",
            F.coalesce(F.col("n_matches"), F.lit(0).cast("long")).alias(
                "n_matches"
            ),
        )
        .unionByName(invalid)
        .localCheckpoint(eager=True)  # pin verdicts BEFORE mutating state
    )
    admitted_ids = ledger.filter(F.col("status") == "admitted").select("vec_id")
    if admitted_path is not None:
        admit_sink_upsert(
            spark,
            batch_vectors.join(admitted_ids, "vec_id"),
            admitted_path,
            "vec_id",
            batch_id=batch_id,
        )
    _write_ivf_index_assigned(
        assigned.join(admitted_ids, "vec_id"), index_path, "append"
    )
    return ledger


# (applicationId, sf_dir) -> index path; built once per session/corpus
# like minhash_index_for, so repeated probes (bench, driver re-runs)
# measure the PROBE, not an index rebuild.
_IVF_PARQUET_CACHE: dict[tuple[str, str], str] = {}


def ivf_parquet_index_for(spark: SparkSession, sf_dir: str) -> str:
    """Path of the persisted IVF index over the corpus slice (vec_id %
    _SIM_PROBE_MOD != 0), building it on first use per session."""
    from ..tables import warehouse_scratch_path

    key = (spark.sparkContext.applicationId, sf_dir)
    path = _IVF_PARQUET_CACHE.get(key)
    if path is None:
        path = warehouse_scratch_path(spark, "ivf_probe_index", sf_dir, per_app=True)
        t = load_tables(spark, sf_dir, "embeddings")
        corpus = t.embeddings.filter(F.col("vec_id") % _SIM_PROBE_MOD != 0)
        build_ivf_parquet_index(corpus, path)
        _IVF_PARQUET_CACHE[key] = path
    return path


def probe_ivf_index(
    index: DataFrame,
    batch: DataFrame,
    n_probe_rows: int | None = None,
    centers: list[list[float]] | None = None,
    precomputed_cells: str | None = None,
) -> DataFrame:
    """The candidate subplan of `sim_incremental_probe`: each batch
    vector's _IVF_FIXED_NPROBE nearest cells (ranked by the same fixed-
    centroid distances the index was built with) equi-joined against
    the persisted index on ``cell``. ``batch`` must have columns
    (vec_id, e, nrm); returns one row per (query, indexed-candidate)
    with the exact cosine attached. Factored out so
    tools/scale_bench.py counts the EXACT subplan the operator runs
    (the r8 lesson).

    The probe side is |batch| * nprobe rows — unbounded for an
    arbitrary arriving batch, so the broadcast hint is only applied
    when the caller passes its known ``n_probe_rows`` and it clears
    `_bounded_broadcast`'s bound (the VERDICT r5 rule; forcing the
    hint unconditionally would pin an arbitrarily large build side in
    every executor). Un-hinted, the optimizer/AQE still broadcasts
    while the batch fits and falls back to a shuffle join past that —
    the same policy as `probe_minhash_index`.

    ``centers`` must be the centroids the index was BUILT with (default
    the fixed quantizer; a rebuilt index's trained centroids come from
    `load_ivf_centers`) — probing with foreign centroids silently
    probes the wrong cells.

    ``precomputed_cells`` (r20): name of an array<int> column on
    ``batch`` already holding the nprobe nearest cells (the SAME
    `slice(_ranked_probe_cells, 1, nprobe)` expression, materialized —
    `admit_ivf_batch` stores it in the pinned assignment checkpoint).
    When set, the probe reads the stored cells instead of re-deriving
    them from ``e``, which keeps the k x dim centroid tensor literal
    OUT of the probe plan entirely: on this sandbox each DataFrame
    transformation over a tensor-bearing plan paid ~0.1s of eager
    re-analysis, ~0.4s of pure driver wall per probe call (cProfile,
    r20), and the admission twin builds four probe plans per run."""
    if centers is None:
        centers = ivf_fixed_centers()
    cells = (
        F.col(precomputed_cells)
        if precomputed_cells is not None
        else F.slice(_ranked_probe_cells(centers), 1, _IVF_FIXED_NPROBE)
    )
    probes = batch.select(
        F.col("vec_id").alias("qid"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
        F.explode(cells).alias("cell"),
    )
    if n_probe_rows is not None:
        probes = _bounded_broadcast(probes, n_probe_rows)
    # ONE select after the join (r21): cos_raw is referenced once, so
    # the old withColumn+select collapsed to exactly this Project — the
    # optimized plan is unchanged and one eager JVM re-analysis per
    # probe-plan construction disappears (the twin builds four).
    return index.join(probes, "cell").select(
        F.col("qid"),
        F.col("vec_id").alias("nn_id"),
        (_dot(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("nrm"))).alias(
            "cos_raw"
        ),
    )


def _sim_probe_oracle(
    k: int = _IVF_K, nprobe: int = _IVF_FIXED_NPROBE, mod: int = _SIM_PROBE_MOD
) -> str:
    """DuckDB twin of the incremental ANN probe: the fixed-centroid
    distance literals of `_ann_ivf_fixed_oracle` (same left-to-right
    IEEE sums, bit-identical assignment and probe ranking), with the
    corpus/batch split on vec_id % mod and a LEFT JOIN emitting the
    zero-candidate batch rows as 'new'."""
    centers = ivf_fixed_centers(k, 64)
    ds = _oracle_dist_list(centers)
    return f"""
WITH v AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
           sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
    FROM embeddings
),
d AS (
    SELECT vec_id, e, nrm,
        [{ds}] AS ds
    FROM v
),
idx AS (
    -- nrm > 0 mirrors _write_ivf_index's zero/null-norm exclusion at
    -- the Spark index-write chokepoint (ADVICE r12: without it, a
    -- fixture gaining a zero-norm corpus vector would hash-diverge —
    -- the Spark index drops it, the oracle's would keep it)
    SELECT vec_id, e, nrm, CAST(list_position(ds, list_min(ds)) - 1 AS INT) AS cell
    FROM d WHERE vec_id % {mod} <> 0 AND nrm > 0
),
probe_cells AS (
    SELECT qid, cell FROM (
        SELECT d.vec_id AS qid, i.i - 1 AS cell,
               ROW_NUMBER() OVER (
                   PARTITION BY d.vec_id ORDER BY ds[i.i] ASC, i.i ASC
               ) AS rnk_c
        FROM d CROSS JOIN (SELECT unnest(generate_series(1, {k})) AS i) i
        WHERE d.vec_id % {mod} = 0
    ) WHERE rnk_c <= {nprobe}
),
cand AS (
    SELECT p.qid, x.vec_id AS nn_id,
           list_inner_product(q.e, x.e) / (q.nrm * x.nrm) AS cos_raw
    FROM probe_cells p
    JOIN idx x ON x.cell = p.cell
    JOIN v q ON q.vec_id = p.qid
),
ranked AS (
    SELECT qid, nn_id, cos_raw,
           ROW_NUMBER() OVER (
               PARTITION BY qid ORDER BY cos_raw DESC, nn_id ASC
           ) AS rnk,
           CAST(COUNT(*) OVER (PARTITION BY qid) AS BIGINT) AS n_cand
    FROM cand
)
SELECT b.vec_id,
       CASE WHEN r.cos_raw >= {_SIM_PROBE_DUP_COS!r} THEN 'dup' ELSE 'new' END AS status,
       r.nn_id,
       ROUND(r.cos_raw, 6) AS cosine,
       COALESCE(r.n_cand, CAST(0 AS BIGINT)) AS n_cand
FROM v b LEFT JOIN ranked r ON r.qid = b.vec_id AND r.rnk = 1
WHERE b.vec_id % {mod} = 0"""


@query("sim_incremental_probe", tables=("embeddings",), oracle=_sim_probe_oracle())
def sim_incremental_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN admission: probe a NEW batch of embeddings
    against the EXISTING persisted IVF index — the similarity half of
    the incremental story `dedup_incremental_probe` opened (VERDICT
    r10 item 4 named both generalizations: `upsert_append`'s anti-join
    to near-dup, and `agg_incremental_merge` "to similarity" — this
    entry is the latter). Production embedding pipelines never re-rank
    the corpus per arriving batch; they keep a cell-partitioned vector
    index and answer "does anything we already have sit within cosine
    t of these new vectors?" with a bounded cell join against it.

    Derivation (both sides SQL-replayed end to end): corpus = vec_id %
    10 != 0, indexed once per session by `ivf_parquet_index_for`
    (persisted parquet partitioned by fixed-centroid cell: vec_id, e,
    nrm, cell); batch = vec_id % 10 == 0, cell-ranked at probe time.
    The probe (`probe_ivf_index`) generates candidates ONLY via the
    broadcast cell equi-join — never batch x corpus — and scores the
    exact cosine once per candidate. Output: one row per batch vector
    — status 'dup'/'new' at cosine >= 0.35 (fixture-calibrated, see
    _SIM_PROBE_DUP_COS), the nearest indexed neighbor and its cosine
    (NULL only if every probed cell was empty), and the deterministic
    candidate count. An admitted batch appends its 'new' rows to the
    index with the same map-only assignment (`append_to_ivf_index`;
    round-trip-tested: the very next probe finds appended vectors at
    cosine 1.0) — the index grows without rebuilds, exactly like the
    MinHash signature index.

    Scale: probe cost is linear in BATCH size at fixed corpus (gated
    x1/x2/x10 in tools/scale_bench.py, batch-replica axis); the corpus
    contributes only the probed cells — the index never shuffles (the
    probes broadcast), never re-assigns, and its cell partitioning
    turns the join into a pruned scan on a cluster. The per-query
    rank/count window shuffles candidate rows keyed by query id —
    bounded by nprobe/k of the corpus per query, the same fraction the
    serving entries carry. Fixed centroids here = the persisted-index
    case (`sim_ann_ivf_fixed_topk`'s argument); a trained quantizer
    (`ivf_build_index`, `ivf_kmeans_int_train`) swaps in unchanged."""
    t = load_tables(spark, sf_dir, "embeddings")
    index = spark.read.parquet(ivf_parquet_index_for(spark, sf_dir))
    # r21: pin the arriving batch WITH its ranked probe cells into one
    # eager checkpoint — the admit_ivf_batch pcells pattern extended to
    # the probe entry (VERDICT r20 item 1). The k x dim centroid tensor
    # now appears in exactly one plan (the checkpoint producer) instead
    # of riding every downstream transformation's eager re-analysis,
    # and the batch-side nrm/tensor expressions can no longer be
    # substituted into pushed-down filters. Same expressions, same
    # rows; the index was built with the fixed quantizer, so
    # ivf_fixed_centers() is the index's own quantizer here.
    centers = ivf_fixed_centers()
    batch = (
        t.embeddings.filter(F.col("vec_id") % _SIM_PROBE_MOD == 0)
        .select("vec_id", _as_double(F.col("embedding")).alias("e"))
        .withColumn("nrm", _norm(F.col("e")))
        .select(
            "*",
            F.slice(
                _ranked_probe_cells(centers), 1, _IVF_FIXED_NPROBE
            ).alias("pcells"),
        )
        .localCheckpoint(eager=True)
    )
    checkpoints.rotate("similarity.sim_probe_batch", batch)
    # The arriving batch's size is known to any real admission pipeline;
    # with the batch pinned it is a block-count job over the
    # checkpoint, not a second parquet scan.
    n_batch = batch.count()
    scored = probe_ivf_index(
        index,
        batch,
        n_probe_rows=n_batch * _IVF_FIXED_NPROBE,
        precomputed_cells="pcells",
    )
    w = W.partitionBy("qid")
    best = (
        scored.withColumn(
            "rnk",
            F.row_number().over(
                w.orderBy(F.col("cos_raw").desc(), F.col("nn_id").asc())
            ),
        )
        .withColumn("n_cand", F.count(F.lit(1)).over(w))
        .filter(F.col("rnk") == 1)
    )
    return (
        batch.select("vec_id")
        .join(best, F.col("vec_id") == F.col("qid"), "left")
        .select(
            "vec_id",
            F.when(F.col("cos_raw") >= _SIM_PROBE_DUP_COS, F.lit("dup"))
            .otherwise(F.lit("new"))
            .alias("status"),
            "nn_id",
            ratio(F.col("cos_raw")).alias("cosine"),
            F.coalesce(F.col("n_cand"), F.lit(0).cast("long")).alias("n_cand"),
        )
    )


# ---------------------------------------------------------------------------
# Semantic (embedding-cosine) near-dup dedup — the SemDedup class
# ---------------------------------------------------------------------------

_SEMDEDUP_NASSIGN = 2  # each vector lands in its 2 nearest cells
# ONE fixture-calibrated near-dup bar shared with the incremental ANN
# admission probe: 'semantically duplicate' must mean the same cosine
# in the batch-vs-index and corpus-self-dedup forms, or a corpus a
# user dedups offline and then streams into disagrees with itself.
SEMDEDUP_COS = _SIM_PROBE_DUP_COS


def semdedup_assigned(
    vectors: DataFrame,
    centers: list[list[float]],
    n_assign: int = _SEMDEDUP_NASSIGN,
) -> DataFrame:
    """Multi-assignment stage: (vec_id, e, nrm, cells = the n_assign
    nearest cell ids, nearest first) for every non-zero-norm vector —
    one round-robin exchange + the map-only assignment (the centroid
    tensor is one F.expr literal), checkpointed once so both sides of
    the pair self-join scan the same blocks. The repartition is
    load-bearing, not cosmetic: under the local AQE plan the compare
    stage is a BroadcastHashJoin whose parallelism is the PROBE side's
    partitioning, and a small parquet corpus scans as 1-2 partitions —
    which serializes the whole O(sum |c|^2) exact-cosine compare onto
    one core (measured at sf0.1: 5.8s -> 0.46s for the pair stage at
    32 slots, the entry's dominant cost). At cluster scale the join is
    an SMJ exchanging on `cell` and sizes itself; the round-robin
    spread only has to fix the broadcast-plan case."""
    ranked = F.slice(_ranked_probe_cells(centers), 1, n_assign)
    sc = vectors.sparkSession.sparkContext
    assigned = (
        vectors.filter(F.col("nrm") > 0)
        .repartition(sc.defaultParallelism)
        .select("vec_id", "e", "nrm", ranked.alias("cells"))
        .localCheckpoint(eager=True)
    )
    checkpoints.rotate("similarity.semdedup_assigned", assigned)
    return assigned


def semdedup_candidate_pairs(assigned: DataFrame) -> DataFrame:
    """The compare stage's input: within-shared-cell candidate pairs
    (id1 < id2) with the exact cosine attached — ONE copy shared by
    `semdedup_verdicts` and the scale gate's sem_* measure (the
    `probe_window_candidates` rule: a hand-copied join body in the
    measure would silently diverge from the production subplan it
    claims to pin). Candidate volume is the sum over cells of |c|^2 —
    linear in N only under the k ∝ N bounded-cell-size policy the
    gate exercises."""
    return _semdedup_pairs_exploded(
        assigned.select("vec_id", "e", "nrm", F.explode("cells").alias("cell"))
    )


def _semdedup_pairs_exploded(ac: DataFrame) -> DataFrame:
    """The compare join over an EXPLODED (vec_id, e, nrm, cell) frame —
    factored out (r17) so the in-memory path above and the persisted
    bucketed-table path (`semdedup_pairs_persisted`) run the IDENTICAL
    subplan over their respective inputs."""
    cos = _dot(F.col("a1.e"), F.col("a2.e")) / (
        F.col("a1.nrm") * F.col("a2.nrm")
    )
    return (
        ac.alias("a1")
        .join(
            ac.alias("a2"),
            (F.col("a1.cell") == F.col("a2.cell"))
            & (F.col("a1.vec_id") < F.col("a2.vec_id")),
        )
        .select(
            F.col("a1.vec_id").alias("id1"),
            F.col("a2.vec_id").alias("id2"),
            cos.alias("cos_raw"),
        )
    )


def build_semdedup_assignment(
    spark: SparkSession,
    vectors: DataFrame,
    name: str,
    centers: list[list[float]] | None = None,
    n_assign: int = _SEMDEDUP_NASSIGN,
    n_buckets: int = 32,
) -> None:
    """PRODUCTION SemDedup layout (r17, closing the PLANS.md promise):
    persist the exploded multi-assignment as a managed table BUCKETED
    (and bucket-sorted) by ``cell`` — the persisted shuffle — with the
    quantizer definition in the standard `_centroids.json` sidecar
    next to the table's files (the `build_ivf_parquet_index` /
    `save_ivf_centers` contract, so `load_semdedup_centers` resolves
    the exact centroids any later probe or re-compare must use).

    Layout choice, measured against the alternative: the IVF probe
    index persists ``partitionBy(cell)`` because its consumer is a
    DPP-pruned point probe (read ONLY the probed cells). The semdedup
    COMPARE's consumer is the full within-cell self-join — partition
    dirs give it nothing (plain parquet partitioning carries no
    co-location metadata, so the self-join would still exchange both
    sides), while bucketing bakes the hash-partitioning into the file
    layout: the pair stage over this table runs with ZERO Exchange
    (plan-pinned in tests/test_dedup_quality.py under the fact-fact
    no-broadcast regime), and every re-compare — new threshold,
    incremental batch, audit — reuses the write-time shuffle for free.
    ``centers`` defaults to the fixed quantizer; pass a trained set
    (`_train_ivf_centers` / `load_ivf_centers` / the integer-Lloyd
    `ivf_kmeans_int_train` recipe) for the production path — the
    sidecar records whichever trained the layout."""
    from ..tables import managed_table_dir, write_bucketed

    if centers is None:
        centers = ivf_fixed_centers()
    assigned = semdedup_assigned(vectors, centers, n_assign)
    exploded = assigned.select(
        "vec_id", "e", "nrm", F.explode("cells").alias("cell")
    )
    write_bucketed(exploded, name, "cell", n_buckets)
    # the managed table's data dir is <warehouse>/<name>; the sidecar
    # lives inside it (underscore-prefixed — scan-invisible)
    save_ivf_centers(spark, managed_table_dir(spark, name), centers)


def load_semdedup_centers(spark: SparkSession, name: str) -> list[list[float]]:
    """The centroids a persisted assignment was built with — STRICT,
    deliberately unlike `load_ivf_centers`' fixed-quantizer fallback:
    `build_semdedup_assignment` ALWAYS publishes the sidecar (fixed or
    trained) as its last step, so a missing sidecar on an existing
    assignment table means the build crashed between the table write
    and the sidecar publish. Falling back to the fixed quantizer there
    would hand a TRAINED layout the wrong centroids — every later
    probe or re-compare against it lands in the wrong cells with no
    error anywhere downstream (the silent-wrong-verdict failure class).
    A plain IVF index legitimately omits the sidecar (fixed-quantizer
    builds never write one), which is why ITS loader may fall back and
    this one must not."""
    from ..tables import managed_table_dir

    path = managed_table_dir(spark, name)
    p, fs = _ivf_sidecar(spark, path)
    if not fs.exists(p):
        raise ValueError(
            f"semdedup assignment table '{name}' has no _centroids.json "
            "sidecar — the build crashed before publishing its quantizer; "
            "rebuild with build_semdedup_assignment instead of guessing "
            "centroids"
        )
    return load_ivf_centers(spark, path)


def semdedup_pairs_persisted(spark: SparkSession, name: str) -> DataFrame:
    """Candidate pairs from the PERSISTED bucketed assignment — the
    shared `_semdedup_pairs_exploded` subplan over the table scan. With
    both self-join sides reading the same cell-bucketed layout the
    exchange is already on disk; the only runtime movement is the
    verdict groupBy downstream."""
    return _semdedup_pairs_exploded(spark.table(name))


def semdedup_verdicts(
    vectors: DataFrame,
    centers: list[list[float]],
    n_assign: int = _SEMDEDUP_NASSIGN,
    cos_bar: float = SEMDEDUP_COS,
) -> DataFrame:
    """Per-vector semantic-dedup verdicts over ``vectors`` (``vec_id``,
    ``e`` array<double>, ``nrm``): the cluster-then-compare shape of
    SemDedup (Abbas et al. 2023, arXiv:2303.09540) — assign each
    vector to its ``n_assign`` nearest cells, compare pairs only
    WITHIN a shared cell, and drop every vector with a lower-id
    in-cell neighbor at cosine >= ``cos_bar``. Output one row per
    non-zero-norm vector: (vec_id, cell = the PRIMARY/nearest cell,
    status 'keep'/'drop', canon_id = the MINIMUM lower-id neighbor —
    the smaller-id-wins admission convention shared with
    `admit_minhash_batch` — and n_dups = distinct such neighbors).
    canon_id is the greedy per-pair canonical, not a transitive
    closure: a chain a~b~c with a!~c keeps a, drops b (canon a) and
    drops c (canon b) — `dedup_resolve_surface`'s connected components
    is the consumer when full clusters are wanted, exactly as for the
    MinHash pair report.

    Multi-assignment is the recall lever: a near-dup pair straddling a
    cell boundary is invisible to single-cell SemDedup; landing every
    vector in its 2 nearest cells finds the pair when ANY cell is
    shared. Measured on the no-cluster random-vector fixture at
    sf0.01 (the worst case, as for every ANN entry): 131/271
    brute-force pairs found (0.48) vs 53/271 (0.20) single-cell, at
    24% of the brute-force comparison volume — and the fraction is an
    artifact of 500 vectors over k=16 cells; the production k grows
    with the corpus (below), holding cells at bounded size.

    Scale shape: the assignment is MAP-ONLY (the centroid tensor ships
    as one F.expr literal — `_centroid_sq_dists`); the assigned frame
    is checkpointed once and both self-join sides scan those blocks,
    so the pair stage is ONE exchange on ``cell``; the verdict groupBy
    keys on vec_id. Candidate volume is sum-over-cells |c|^2 — the
    SemDedup cost model — which stays linear in N only under the
    k ∝ N discipline (bounded cell size: k = N / target_cell_rows,
    the knob every production SemDedup run turns). The scale gate's
    sem_* family measures exactly that policy: k doubles when the
    corpus doubles, and candidates/pairs must track ~linear. On a
    cluster the assigned frame persists partitioned by cell (the
    `build_ivf_parquet_index` layout), making the self-join co-located
    and the per-cell compare embarrassingly parallel.

    Zero/NULL-norm vectors are excluded on BOTH engines (the
    `_write_ivf_index` / ADVICE-r12 parity rule): cosine is undefined
    for them, and a NULL verdict row would claim a semantic decision
    no math backs."""
    assigned = semdedup_assigned(vectors, centers, n_assign)
    pairs = (
        semdedup_candidate_pairs(assigned)
        .filter(F.col("cos_raw") >= F.lit(cos_bar))
        .select("id1", "id2")
    )
    # a pair sharing BOTH assigned cells arrives twice: count DISTINCT
    # lower-id neighbors (min is duplicate-immune by itself)
    dups = pairs.groupBy(F.col("id2").alias("vec_id")).agg(
        F.min("id1").alias("canon_id"),
        F.countDistinct("id1").alias("n_dups"),
    )
    return (
        assigned.select(
            "vec_id", F.element_at("cells", 1).alias("cell")
        )
        .join(dups, "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            F.when(F.col("canon_id").isNull(), F.lit("keep"))
            .otherwise(F.lit("drop"))
            .alias("status"),
            "canon_id",
            F.coalesce(F.col("n_dups"), F.lit(0).cast("long")).alias(
                "n_dups"
            ),
        )
    )


def _semdedup_oracle(
    k: int = _IVF_K, nassign: int = _SEMDEDUP_NASSIGN
) -> str:
    """DuckDB twin of `dedup_semantic_embedding`: the fixed-centroid
    distance literals (same left-to-right IEEE sums as
    `_centroid_sq_dists`, so assignment and probe ranking are
    bit-identical), ROW_NUMBER-ranked multi-assignment, within-cell
    pair compare, min-id canonicalization."""
    centers = ivf_fixed_centers(k, 64)
    ds = _oracle_dist_list(centers)
    return f"""
WITH v AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
           sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
    FROM embeddings
),
d AS (
    SELECT vec_id, e, nrm,
        [{ds}] AS ds
    FROM v WHERE nrm > 0
),
ranked AS (
    SELECT d.vec_id, d.e, d.nrm, CAST(i.i - 1 AS INT) AS cell,
           ROW_NUMBER() OVER (
               PARTITION BY d.vec_id ORDER BY ds[i.i] ASC, i.i ASC
           ) AS rnk
    FROM d CROSS JOIN (SELECT unnest(generate_series(1, {k})) AS i) i
),
ac AS (SELECT * FROM ranked WHERE rnk <= {nassign}),
pairs AS (
    SELECT a1.vec_id AS id1, a2.vec_id AS id2
    FROM ac a1 JOIN ac a2
      ON a1.cell = a2.cell AND a1.vec_id < a2.vec_id
    WHERE list_inner_product(a1.e, a2.e) / (a1.nrm * a2.nrm) >= {SEMDEDUP_COS!r}
),
dups AS (
    SELECT id2 AS vec_id, MIN(id1) AS canon_id,
           CAST(COUNT(DISTINCT id1) AS BIGINT) AS n_dups
    FROM pairs GROUP BY id2
)
SELECT p.vec_id, p.cell,
       CASE WHEN du.canon_id IS NULL THEN 'keep' ELSE 'drop' END AS status,
       du.canon_id,
       COALESCE(du.n_dups, CAST(0 AS BIGINT)) AS n_dups
FROM (SELECT vec_id, cell FROM ac WHERE rnk = 1) p
LEFT JOIN dups du ON du.vec_id = p.vec_id"""


@query(
    "dedup_semantic_embedding",
    tables=("embeddings",),
    oracle=_semdedup_oracle(),
)
def dedup_semantic_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup dedup over the whole corpus — the
    SemDedup member of the dedup family (exact / MinHash / SimHash /
    containment / ExactSubstr cover LEXICAL duplication; this is the
    semantic class: paraphrases and re-encodings that share no
    shingles). The reference's keyed ON CONFLICT dedup
    (NytimesBatchProcessorApplication.kt:138-141) generalized to
    'same meaning', the last member the catalog lacked. See
    `semdedup_verdicts` for semantics, recall measurement, and the
    k ∝ N scale argument."""
    t = load_tables(spark, sf_dir, "embeddings")
    v = t.embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("e")
    ).withColumn("nrm", _norm(F.col("e")))
    return semdedup_verdicts(v, ivf_fixed_centers())


@query(
    "dedup_semantic_trained",
    tables=("embeddings",),
    oracle="""
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       TRUE AS persisted_verdict_match,
       TRUE AS sidecar_roundtrip
FROM embeddings
WHERE list_sum(list_transform(embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0
""",
)
def dedup_semantic_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED-quantizer SemDedup through the PERSISTED production
    layout (VERDICT r17 item 4 — `dedup_semantic_embedding` sweeps
    only the fixed quantizer; the trained path was pytest/scale-gate-
    only): train k-means centers (`_train_ivf_centers`, the one
    sampling/seeding recipe), build the cell-BUCKETED assignment table
    + `_centroids.json` sidecar (`build_semdedup_assignment`), and
    judge IN-QUERY — the `sim_ann_ivf_topk` contract, since trained
    centers are float MLlib output and not SQL-replayable — that:

    - ``persisted_verdict_match`` (per vector, real hash signal): the
      verdict derived from the persisted table's pair stage
      (`semdedup_pairs_persisted`, zero-Exchange over the bucketed
      layout) equals the in-memory path's verdict bit-for-bit —
      status, canon_id, AND n_dups (the `sem_persist_pairs_equal`
      scale-gate boolean, promoted to a swept per-row claim);
    - ``sidecar_roundtrip`` (corpus-level): `load_semdedup_centers`
      returns EXACTLY the trained centers (json float round-trip is
      repr-exact; the strict loader refuses a missing sidecar rather
      than guessing — its failure mode is an error, never False).

    One row per non-zero-norm vector (absent row = a path lost a
    vector), the SQL-replayable row set the constant-TRUE oracle
    pins."""
    import hashlib

    t = load_tables(spark, sf_dir, "embeddings")
    v = t.embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("e")
    ).withColumn("nrm", _norm(F.col("e")))
    trained, _ = _train_ivf_centers(v, _IVF_K, 42, _IVF_SAMPLE_CAP)
    name = f"semdedup_trained_{hashlib.md5(sf_dir.encode()).hexdigest()[:10]}"
    build_semdedup_assignment(spark, v, name, centers=trained)
    sidecar_ok = load_semdedup_centers(spark, name) == trained
    mem = semdedup_verdicts(v, trained)
    dups_p = (
        semdedup_pairs_persisted(spark, name)
        .filter(F.col("cos_raw") >= SEMDEDUP_COS)
        .select("id1", "id2")
        .groupBy(F.col("id2").alias("vec_id"))
        .agg(
            F.min("id1").alias("canon_p"),
            F.countDistinct("id1").alias("n_dups_p"),
        )
    )
    return mem.join(dups_p, "vec_id", "left").select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        (
            (
                F.col("status")
                == F.when(F.col("canon_p").isNull(), F.lit("keep")).otherwise(
                    F.lit("drop")
                )
            )
            & F.col("canon_id").eqNullSafe(F.col("canon_p"))
            & (F.col("n_dups") == F.coalesce(F.col("n_dups_p"), F.lit(0)))
        ).alias("persisted_verdict_match"),
        F.lit(sidecar_ok).alias("sidecar_roundtrip"),
    )


# ---------------------------------------------------------------------------
# Streaming ANN admission — the oracle-backed batch twin (r16)
# ---------------------------------------------------------------------------

_ANN_ADMIT_CORPUS_RES = 4  # corpus slice: vec_id % 5 == 4
_ANN_ADMIT_BATCHES = ((0, 1), (2, 3))  # two micro-batches by residue
_ANN_ADMIT_CACHE: dict[tuple[str, str], str] = {}


def ann_admission_index_for(spark: SparkSession, sf_dir: str) -> str:
    """Session-cached IVF parquet index over the ADMISSION corpus slice
    (vec_id % 5 == _ANN_ADMIT_CORPUS_RES) — the embedding analogue of
    `dedup.admission_corpus_index_for`, so repeated twin invocations
    (bench passes, driver re-runs) clone a prebuilt index instead of
    re-running the corpus argmin pass inside the timed body."""
    key = (spark.sparkContext.applicationId, sf_dir)
    path = _ANN_ADMIT_CACHE.get(key)
    if path is None:
        from ..tables import warehouse_scratch_path

        path = warehouse_scratch_path(
            spark, "ann_admission_index", sf_dir, per_app=True
        )
        t = load_tables(spark, sf_dir, "embeddings")
        build_ivf_parquet_index(
            t.embeddings.filter(
                F.col("vec_id") % 5 == _ANN_ADMIT_CORPUS_RES
            ),
            path,
        )
        _ANN_ADMIT_CACHE[key] = path
    return path


def _ann_admission_oracle(
    k: int = _IVF_K, nprobe: int = _IVF_FIXED_NPROBE
) -> str:
    """DuckDB twin of `stream_ann_admission_twin`: the fixed-centroid
    distance literals (bit-identical assignment + probe ranking — the
    `_sim_probe_oracle` construction), with the SEQUENTIAL index-growth
    semantics unrolled — batch 0 probes the corpus index, its
    admissions join the index (at their already-computed argmin cells),
    batch 1 probes the grown index; within-batch pairs are kept when
    found in EITHER probe direction and canonicalized greatest->least,
    exactly the `admit_ivf_batch` asymmetric-probe rule."""
    centers = ivf_fixed_centers(k, 64)
    ds = _oracle_dist_list(centers)
    cor = _ANN_ADMIT_CORPUS_RES
    b0 = ", ".join(map(str, _ANN_ADMIT_BATCHES[0]))
    b1 = ", ".join(map(str, _ANN_ADMIT_BATCHES[1]))
    bar = _SIM_PROBE_DUP_COS
    return f"""
WITH v AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
           sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
    FROM embeddings
),
d AS (
    SELECT vec_id, e, nrm,
        [{ds}] AS ds
    FROM v WHERE nrm > 0
),
a AS (
    SELECT vec_id, e, nrm, CAST(list_position(ds, list_min(ds)) - 1 AS INT) AS cell
    FROM d
),
pc AS (
    SELECT vec_id AS qid, cell FROM (
        SELECT d.vec_id, CAST(i.i - 1 AS INT) AS cell,
               ROW_NUMBER() OVER (
                   PARTITION BY d.vec_id ORDER BY ds[i.i] ASC, i.i ASC
               ) AS rnk_c
        FROM d CROSS JOIN (SELECT unnest(generate_series(1, {k})) AS i) i
    ) WHERE rnk_c <= {nprobe}
),
idx0 AS (SELECT * FROM a WHERE vec_id % 5 = {cor}),
bat0 AS (SELECT * FROM a WHERE vec_id % 5 IN ({b0})),
m0 AS (
    SELECT vec_id, MIN(canon_id) AS canon_id,
           CAST(COUNT(DISTINCT canon_id) AS BIGINT) AS n_matches
    FROM (
        SELECT p.qid AS vec_id, x.vec_id AS canon_id
        FROM pc p JOIN bat0 q ON q.vec_id = p.qid
        JOIN idx0 x ON x.cell = p.cell
        WHERE list_inner_product(q.e, x.e) / (q.nrm * x.nrm) >= {bar!r}
        UNION ALL
        SELECT GREATEST(p.qid, x.vec_id) AS vec_id,
               LEAST(p.qid, x.vec_id) AS canon_id
        FROM pc p JOIN bat0 q ON q.vec_id = p.qid
        JOIN bat0 x ON x.cell = p.cell AND x.vec_id <> p.qid
        WHERE list_inner_product(q.e, x.e) / (q.nrm * x.nrm) >= {bar!r}
    ) GROUP BY vec_id
),
led0 AS (
    SELECT b.vec_id, CAST(0 AS BIGINT) AS batch,
           CASE WHEN g.canon_id IS NULL THEN 'admitted' ELSE 'dup' END AS status,
           g.canon_id,
           COALESCE(g.n_matches, CAST(0 AS BIGINT)) AS n_matches
    FROM bat0 b LEFT JOIN m0 g ON g.vec_id = b.vec_id
),
idx1 AS (
    SELECT * FROM idx0
    UNION ALL
    SELECT a.* FROM a JOIN led0 l ON l.vec_id = a.vec_id AND l.status = 'admitted'
),
bat1 AS (SELECT * FROM a WHERE vec_id % 5 IN ({b1})),
m1 AS (
    SELECT vec_id, MIN(canon_id) AS canon_id,
           CAST(COUNT(DISTINCT canon_id) AS BIGINT) AS n_matches
    FROM (
        SELECT p.qid AS vec_id, x.vec_id AS canon_id
        FROM pc p JOIN bat1 q ON q.vec_id = p.qid
        JOIN idx1 x ON x.cell = p.cell
        WHERE list_inner_product(q.e, x.e) / (q.nrm * x.nrm) >= {bar!r}
        UNION ALL
        SELECT GREATEST(p.qid, x.vec_id) AS vec_id,
               LEAST(p.qid, x.vec_id) AS canon_id
        FROM pc p JOIN bat1 q ON q.vec_id = p.qid
        JOIN bat1 x ON x.cell = p.cell AND x.vec_id <> p.qid
        WHERE list_inner_product(q.e, x.e) / (q.nrm * x.nrm) >= {bar!r}
    ) GROUP BY vec_id
),
led1 AS (
    SELECT b.vec_id, CAST(1 AS BIGINT) AS batch,
           CASE WHEN g.canon_id IS NULL THEN 'admitted' ELSE 'dup' END AS status,
           g.canon_id,
           COALESCE(g.n_matches, CAST(0 AS BIGINT)) AS n_matches
    FROM bat1 b LEFT JOIN m1 g ON g.vec_id = b.vec_id
)
SELECT * FROM led0
UNION ALL SELECT * FROM led1
UNION ALL
SELECT vec_id,
       CAST(CASE WHEN vec_id % 5 IN ({b0}) THEN 0 ELSE 1 END AS BIGINT) AS batch,
       'invalid' AS status, CAST(NULL AS BIGINT) AS canon_id,
       CAST(0 AS BIGINT) AS n_matches
FROM v WHERE vec_id % 5 <> {cor} AND (nrm IS NULL OR nrm <= 0)"""


@query(
    "stream_ann_admission_twin",
    tables=("embeddings",),
    oracle=_ann_admission_oracle(),
)
def stream_ann_admission_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the STREAMING ANN ADMISSION pipeline — the
    embedding counterpart of `dedup.stream_admission_twin`, closing
    the one asymmetry between the two admission halves: the MinHash
    chain had a hash-green catalog twin since r12 while
    `admit_ivf_batch` was pytest-only. Initial corpus = embeddings
    with vec_id % 5 == 4, indexed once per session
    (`ann_admission_index_for`) and CLONED per invocation (the index
    grows every run — the r14 `stream_admission_twin` lesson); two
    micro-batches (residues {0,1}, then {2,3}) run through
    `admit_ivf_batch` — the EXACT function
    `streaming.pipeline.foreach_batch_ann_admission` gives
    foreachBatch. Output: the concatenated admission ledgers (vec_id,
    batch, status 'admitted'/'dup'/'invalid', canon_id, n_matches).
    A batch-1 vector near-dupping a batch-0 ADMISSION verdicts 'dup'
    (the index grew); one near-dupping a batch-0 REJECT does not
    match it (rejects never enter the index) — both replayed
    sequentially by the oracle's idx0 -> idx1 CTE chain.

    Scale: two DPP-pruned cell-probe jobs + two map-only appends at
    already-computed assignments; nothing rescans the corpus (the
    `ann_probe_*` and `ix_ann_*` BENCH_sf1 families gate the probe's
    both axes)."""
    from ..tables import clone_parquet_dir

    t = load_tables(spark, sf_dir, "embeddings")
    path = clone_parquet_dir(ann_admission_index_for(spark, sf_dir))
    ledgers = []
    for b, residues in enumerate(_ANN_ADMIT_BATCHES):
        batch = t.embeddings.filter((F.col("vec_id") % 5).isin(*residues))
        led = admit_ivf_batch(spark, path, batch)
        ledgers.append(
            led.select(
                "vec_id",
                F.lit(b).cast("long").alias("batch"),
                "status",
                "canon_id",
                "n_matches",
            )
        )
    return ledgers[0].unionByName(ledgers[1])
