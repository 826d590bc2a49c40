"""Text analysis operators (L2, SURVEY.md §2.3): token statistics,
quality scoring, language-ID heuristic, document fingerprinting.

Everything is built-in string/regex/array functions — fully codegen'd;
at 100 TB these run as map-only passes (no shuffle except the final
small aggregations), which is exactly the shape a corpus-filtering
pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..catalog import query
from ..functions import ratio
from ..sources import load_tables


def content_fingerprint(col) -> F.Column:
    """Canonical exact-dedup key: md5 over lowercased,
    whitespace-collapsed content. ONE definition shared by the
    fingerprint entry and the curation pipeline — two drifting copies
    would make "exact dedup" mean different things in different
    entries. Dialect boundary: Java's \\s includes \\x0B where
    DuckDB's RE2 \\s does not; the fixture has no such characters, and
    a Unicode corpus must pin one regex class on both sides."""
    normalized = F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")
    return F.md5(F.encode(normalized, "UTF-8"))

# Tiny per-language stopword lists for the heuristic language id.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["de", "le", "shi", "bu", "wo"],
}


@query(
    "text_tokens_topk",
    tables=("documents",),
    oracle="""
WITH tok AS (
    SELECT unnest(string_split_regex(lower(text), '\\s+')) AS token
    FROM documents
)
SELECT token, CAST(COUNT(*) AS BIGINT) AS n
FROM tok
WHERE token <> ''
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT 20
""",
)
def text_tokens_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequency top-20 (explode -> count -> top-k). The
    explode multiplies rows by tokens-per-doc; the groupBy shuffle moves
    one row per (token, partition) thanks to partial aggregation."""
    t = load_tables(spark, sf_dir, "documents")
    return (
        t.documents.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(20)
    )


@query(
    "text_quality_score",
    tables=("documents",),
    oracle="""
WITH scored AS (
    SELECT doc_id, lang,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_bpe_ish,
           CAST(length(regexp_replace(text, '[^.!?,;]', '', 'g')) AS BIGINT) AS n_punct,
           CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                    t -> t IN ('the', 'and', 'of', 'to', 'a'))) AS BIGINT) AS n_stop
    FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT)              AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT)         AS total_tokens,
       CAST(SUM(n_bpe_ish) AS BIGINT)        AS total_bpe_ish,
       ROUND(AVG(CAST(n_chars_actual AS DOUBLE) / n_tokens), 6)  AS avg_chars_per_token,
       ROUND(AVG(CAST(n_punct AS DOUBLE) / n_chars_actual), 6)   AS avg_punct_ratio,
       ROUND(AVG(CAST(n_stop AS DOUBLE) / n_tokens), 6)          AS avg_stopword_ratio
FROM scored
GROUP BY lang
""",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality metrics per language: token counts (whitespace +
    BPE-ish regex), chars/token, punctuation ratio, stopword ratio —
    the standard corpus-quality filter features.

    The token array materializes as a column first so the split runs
    once per row, not once per consuming metric (the codegen
    re-evaluation trap measured in decon_train_test_overlap)."""
    t = load_tables(spark, sf_dir, "documents")
    base = t.documents.select(
        "lang",
        "text",
        F.split(F.lower("text"), r"\s+").alias("toks"),
    )
    tk = F.col("toks")
    scored = base.select(
        "lang",
        F.length("text").cast("long").alias("n_chars_actual"),
        F.size(tk).cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"), 0)).cast(
            "long"
        ).alias("n_bpe_ish"),
        F.length(F.regexp_replace("text", r"[^.!?,;]", "")).cast("long").alias("n_punct"),
        F.size(F.filter(tk, lambda x: x.isin("the", "and", "of", "to", "a"))).cast(
            "long"
        ).alias("n_stop"),
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_bpe_ish").alias("total_bpe_ish"),
        ratio(F.avg(F.col("n_chars_actual").cast("double") / F.col("n_tokens"))).alias(
            "avg_chars_per_token"
        ),
        ratio(F.avg(F.col("n_punct").cast("double") / F.col("n_chars_actual"))).alias(
            "avg_punct_ratio"
        ),
        ratio(F.avg(F.col("n_stop").cast("double") / F.col("n_tokens"))).alias(
            "avg_stopword_ratio"
        ),
    )


def _marker_count_sql(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in _LANG_MARKERS[lang])
    return (
        f"CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),"
        f" t -> t IN ({markers}))) AS BIGINT)"
    )


@query(
    "text_langid_heuristic",
    tables=("documents",),
    oracle=f"""
WITH scores AS (
    SELECT doc_id, lang,
           {_marker_count_sql('en')} AS s_en,
           {_marker_count_sql('de')} AS s_de,
           {_marker_count_sql('es')} AS s_es,
           {_marker_count_sql('fr')} AS s_fr,
           {_marker_count_sql('zh')} AS s_zh
    FROM documents
),
pred AS (
    SELECT doc_id, lang,
           CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
                WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
                WHEN s_fr >= s_zh THEN 'fr'
                ELSE 'zh' END AS predicted
    FROM scores
)
SELECT lang, predicted, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pred
GROUP BY lang, predicted
""",
)
def text_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID: score each language by marker-token
    hits, argmax with a fixed preference order (en>de>es>fr>zh) for ties
    — deterministic, map-only, and honest about being a heuristic (the
    fixture text is synthetic, so the confusion matrix *is* the result).
    """
    t = load_tables(spark, sf_dir, "documents")
    # materialize the split once; five marker scores consume it
    base = t.documents.select(
        "doc_id", "lang", F.split(F.lower("text"), r"\s+").alias("toks")
    )

    def marker_count(lg: str):
        markers = _LANG_MARKERS[lg]
        return F.size(
            F.filter(F.col("toks"), lambda x: x.isin(*markers))
        ).alias(f"s_{lg}")

    scores = base.select(
        "doc_id", "lang", *[marker_count(lg) for lg in _LANG_MARKERS]
    )
    s = {lg: F.col(f"s_{lg}") for lg in _LANG_MARKERS}
    predicted = (
        F.when(
            (s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["zh"]),
            "en",
        )
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]) & (s["de"] >= s["zh"]), "de")
        .when((s["es"] >= s["fr"]) & (s["es"] >= s["zh"]), "es")
        .when(s["fr"] >= s["zh"], "fr")
        .otherwise("zh")
    )
    return (
        scores.withColumn("predicted", predicted)
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "text_fingerprint",
    tables=("documents",),
    oracle="""
SELECT doc_id,
       md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint,
       CAST(length(text) AS BIGINT) AS n_chars_actual
FROM documents
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprint (lowercase, collapse whitespace,
    md5) — the exact-dedup key for document pipelines; md5 is computed
    identically by Spark and DuckDB so it is oracle-checkable, unlike
    engine-specific hash()."""
    t = load_tables(spark, sf_dir, "documents")
    return t.documents.select(
        "doc_id",
        content_fingerprint("text").alias("fingerprint"),
        F.length("text").cast("long").alias("n_chars_actual"),
    )


@query(
    "pipeline_curate_corpus",
    tables=("documents",),
    oracle="""
WITH scored AS (
    SELECT doc_id, lang,
           md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp,
           CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
),
quality AS (
    SELECT * FROM scored
    WHERE n_tokens >= 5 AND CAST(n_chars AS DOUBLE) / n_tokens < 15
),
deduped AS (
    SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM quality
    ) WHERE rn = 1
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT)        AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT)   AS total_tokens,
       ROUND(AVG(CAST(n_tokens AS DOUBLE)), 6) AS avg_tokens
FROM deduped
GROUP BY lang
""",
)
def pipeline_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data curation chain as ONE oracle-checked pipeline:
    score -> quality-filter -> exact-dedup (normalized fingerprint,
    min-doc_id winner) -> per-language corpus stats. This is the
    composition every L2 operator exists to serve, and the flagship
    shape of a 100 TB curation job: every stage is a map or a single
    keyed shuffle (fingerprint window, language agg); near-dup stages
    (MinHash/SimHash/ANN) slot between dedup and stats with the same
    join shapes, checked separately as rows-only entries."""
    t = load_tables(spark, sf_dir, "documents")
    # plain split (duplicates kept) — token COUNTS, not the distinct
    # shingle set the dedup operators use
    toks = F.split(F.lower("text"), r"\s+")
    scored = t.documents.select(
        "doc_id",
        "lang",
        content_fingerprint("text").alias("fp"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )
    quality = scored.filter(quality_pass(F.col("n_tokens"), F.col("n_chars")))
    w = W.partitionBy("fp").orderBy(F.col("doc_id").asc())
    deduped = quality.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return deduped.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg(F.col("n_tokens").cast("double")), 6).alias("avg_tokens"),
    )


@query(
    "sample_hash_split",
    tables=("documents",),
    oracle="""
WITH t AS (
    SELECT n_chars,
           (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
               % 2147483647) % 100 AS bucket
    FROM documents
)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END               AS split,
       CAST(COUNT(*) AS BIGINT)          AS n_docs,
       CAST(SUM(n_chars) AS BIGINT)      AS total_chars,
       ROUND(AVG(CAST(n_chars AS DOUBLE)), 6) AS avg_chars
FROM t GROUP BY 1
""",
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (80/10/10) by key hash — the
    sampling primitive every training pipeline needs: membership is a
    pure function of doc_id (stable across runs, executors, and
    re-partitioning; new data lands in splits without reshuffling old
    rows), unlike rng-based df.sample whose output depends on partition
    layout. Map-only + one 3-group aggregate; at 100 TB the split
    assignment pipelines straight out of the scan. Uses the engine's
    portable 60-bit md5 hash so DuckDB replays membership exactly (the
    same trick that oracle-checks the MinHash family)."""
    from .dedup import _portable_token_hash

    t = load_tables(spark, sf_dir, "documents")
    bucket = _portable_token_hash(F.col("doc_id").cast("string")) % 100
    return (
        t.documents.select(
            F.when(bucket < 80, "train")
            .when(bucket < 90, "val")
            .otherwise("test")
            .alias("split"),
            "n_chars",
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            ratio(F.avg(F.col("n_chars").cast("double"))).alias("avg_chars"),
        )
    )


@query(
    "text_bm25_rank",
    tables=("documents",),
    oracle="""
WITH tok AS (
    SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS token
    FROM documents
),
dl AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
    FROM tok WHERE token <> '' GROUP BY doc_id
),
stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
    FROM dl
),
tf AS (
    SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
    FROM tok WHERE token IN ('join', 'hash', 'scan')
    GROUP BY doc_id, token
),
idf AS (
    SELECT token, ln((stats.n_docs - COUNT(*) + 0.5) / (COUNT(*) + 0.5) + 1.0) AS idf
    FROM tf, stats
    GROUP BY token, stats.n_docs
),
scored AS (
    SELECT tf.doc_id,
           SUM(idf.idf * tf.tf * 2.2
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))) AS score
    FROM tf
    JOIN idf ON tf.token = idf.token
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN stats
    GROUP BY tf.doc_id
)
SELECT doc_id, ROUND(score, 6) AS bm25
FROM scored
ORDER BY bm25 DESC, doc_id ASC
LIMIT 20
""",
)
def text_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval (k1=1.2, b=0.75) for the fixed query
    {join, hash, scan}: the classic sparse-retrieval ranker a training
    pipeline uses to mine topical documents from a crawl. Shape at
    100 TB: tokenize+filter is map-only and keeps only query-term hits
    (|tf| ~ #query_terms x #matching_docs, not corpus size); doc
    lengths are a map-only projection aggregated per doc; the
    corpus-level (N, avgdl) scalar and the per-term idf table (3 rows)
    broadcast; the only data-sized shuffles are the two doc-keyed
    groupBys. Constants are folded into the expression (k1+1 = 2.2,
    1-b = 0.25) identically in both engines so the doubles replay
    bit-for-bit before the 6dp round."""
    t = load_tables(spark, sf_dir, "documents")
    terms = ("join", "hash", "scan")
    tok = t.documents.select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        tok.filter(F.col("token").isin(*terms))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    idf = (
        tf.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .select(
            "token",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0).alias(
                "idf"
            ),
        )
    )
    scored = (
        tf.join(F.broadcast(idf), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("idf")
                * F.col("tf")
                * 2.2
                / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl")))
            ).alias("score")
        )
    )
    return (
        scored.select("doc_id", ratio("score").alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(20)
    )


_PACK_CAPACITY = 2048  # tokens per packed training sequence
_PACK_BUCKET = 200  # docs per prefix-sum bucket (see scale note)


@query(
    "pack_sequences_offsets",
    tables=("documents",),
    oracle=f"""
WITH t AS (
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS BIGINT) AS n_tokens
    FROM documents
),
o AS (
    SELECT doc_id, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS start_offset
    FROM t
)
SELECT doc_id, n_tokens, start_offset,
       CAST(start_offset // {_PACK_CAPACITY} AS BIGINT) AS bin_id,
       CAST(start_offset % {_PACK_CAPACITY} AS BIGINT)  AS bin_offset
FROM o
""",
)
def pack_sequences_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training: lay every document out on one
    global token axis (doc_id order) and assign each its packed-bin id
    and within-bin offset — the offset table a dataloader uses to pack
    documents into fixed-capacity (2048-token) training sequences
    without padding waste (documents straddling a boundary continue in
    the next bin, the standard concat-then-chunk packing).

    The interesting part is the GLOBAL prefix sum, which a naive
    unpartitioned running-total window serializes onto one task. This
    implements the textbook two-level scan instead: (1) range-bucket
    doc_ids, (2) aggregate per-bucket token sums (|docs|/bucket rows),
    (3) exclusive-prefix those few sums with a post-aggregation window,
    (4) broadcast the bucket offsets back and finish with a per-bucket
    cumulative window whose partitions are bounded by the bucket width.
    At 100 TB pick the bucket width so step (3) sees ~1e5 rows (still a
    single-task triviality); every other step is a bounded-partition
    window or a broadcast join. Oracle: the same offsets from DuckDB's
    single global window — the decomposition must be value-identical."""
    t = load_tables(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), r"\s+")
    counts = t.documents.select(
        "doc_id",
        F.size(F.filter(toks, lambda x: x != "")).cast("long").alias("n_tokens"),
    )
    return packed_offsets(counts)


def packed_offsets(counts: DataFrame) -> DataFrame:
    """ONE copy of the two-level-scan packer over (doc_id, n_tokens)
    (the r12 one-manifest rule, applied r17 when `pack_sequences_bpe`
    arrived): returns (doc_id, n_tokens, start_offset, bin_id,
    bin_offset). The decomposition is described — and oracle-proven
    value-identical to DuckDB's single global window — on
    `pack_sequences_offsets`; the BPE entry feeds it model-tokenizer
    counts instead of whitespace counts, nothing else changes."""
    docs = counts.withColumn(
        "bucket", (F.floor(F.col("doc_id") / _PACK_BUCKET)).cast("long")
    )
    bucket_sums = docs.groupBy("bucket").agg(F.sum("n_tokens").alias("bucket_tokens"))
    w_b = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    bucket_offsets = bucket_sums.select(
        "bucket",
        F.coalesce(F.sum("bucket_tokens").over(w_b), F.lit(0)).alias("bucket_offset"),
    )
    w_d = W.partitionBy("bucket").orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    return (
        docs.join(F.broadcast(bucket_offsets), "bucket")
        .withColumn(
            "start_offset",
            F.col("bucket_offset") + F.coalesce(F.sum("n_tokens").over(w_d), F.lit(0)),
        )
        .select(
            "doc_id",
            "n_tokens",
            "start_offset",
            # integer `div`, not float /: exactness must not depend on
            # _PACK_CAPACITY being a power of two or offsets < 2^53
            F.expr(f"start_offset div {_PACK_CAPACITY}").cast("long").alias("bin_id"),
            F.pmod("start_offset", F.lit(_PACK_CAPACITY)).cast("long").alias("bin_offset"),
        )
    )


# --- tokenizer-aware packing (r17, VERDICT r16 item 3) --------------------
# A deterministic char-level BPE: 48 merges learned ONCE from the
# sf0.01 fixture corpus driver-side (standard pair-frequency training,
# ties broken lexicographically) and shipped as a literal — the
# production shape, where the tokenizer is a versioned artifact the
# pipeline loads, never something a query retrains. Real pipelines pack
# MODEL tokens, not whitespace tokens; everything downstream (capacity
# bins, shard manifests, dataloader offsets) must count what the
# trainer will actually see.
_BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"),
    ("custo", "mer"), ("f", "i"), ("fi", "l"), ("fil", "t"),
    ("filt", "er"), ("a", "l"), ("al", "l"), ("m", "all"),
    ("s", "mall"), ("g", "e"), ("l", "ow"), ("mer", "ge"),
    ("s", "low"), ("c", "t"), ("ct", "or"), ("d", "er"),
    ("e", "ctor"), ("or", "der"), ("v", "ector"),
)
_BPE_RANKS: dict[tuple[str, str], int] = {m: i for i, m in enumerate(_BPE_MERGES)}


def bpe_vocab_frame(docs: DataFrame) -> DataFrame:
    """The trainer's working set: ONE corpus pass collapsing documents
    to the word-frequency table ``(cnt, syms)`` with every word split
    into its character symbols. Everything after this is vocab-bounded
    — the standard BPE-training move (Sennrich et al. 2016 §3.2 trains
    on the dictionary, not the corpus), and the reason the 48-iteration
    loop below survives 100 TB: the corpus is scanned exactly once."""
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "cnt",
            F.filter(F.split("word", ""), lambda c: c != "").alias("syms"),
        )
    )


def _merge_pair_in_syms(a: str, b: str):
    """Column expression applying ONE merge (a, b) -> a+b to the
    ``syms`` array, left-to-right non-overlapping — the exact rewrite
    `bpe_encode_word`'s inner loop performs, as a JVM-side fold so
    48 training iterations never leave codegen. The fold is equivalent
    to the scanner: both consume greedily left-to-right, and the
    freshly-merged symbol can never re-match as the LEFT side within
    the same pass (a == a+b would need b empty, and symbols are
    non-empty). Literals go through F.lit, never string-built SQL —
    corpus characters (quotes, backslashes) must not be parsed."""
    a_c, b_c, ab_c = F.lit(a), F.lit(b), F.lit(a + b)
    return F.aggregate(
        F.col("syms"),
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == a_c)
            & (s == b_c),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(ab_c)
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


#: Vocabularies at or below this row count train driver-side over the
#: collected word-frequency table (≤ a few MiB — the bounded-collect
#: class); above it, the iterations stay fully distributed.
BPE_DRIVER_VOCAB_CAP = 65_536


def _bpe_train_local(
    items: list[tuple[int, list[str]]], n_merges: int
) -> list[tuple[str, str]]:
    """The training loop over an in-memory (cnt, syms) vocab — the
    driver-side arm of `bpe_train_merges` (identical semantics to the
    distributed arm; the two are hypothesis-cross-checked in
    tests/test_text_bpe.py). This is how fastBPE / HF `tokenizers`
    train too: the CORPUS pass is the distributed part, the merge loop
    runs over the word-count table."""
    syms = [list(s) for _, s in items]
    cnts = [c for c, _ in items]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for c, s in zip(cnts, syms):
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                pc[p] = pc.get(p, 0) + c
        if not pc:
            break
        # max count, ties broken lexicographically on (left, right)
        a, b = min(pc, key=lambda p: (-pc[p], p))
        merges.append((a, b))
        for j, s in enumerate(syms):
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[j] = out
    return merges


def bpe_train_merges(
    docs: DataFrame | None,
    n_merges: int = len(_BPE_MERGES),
    driver_vocab_cap: int = BPE_DRIVER_VOCAB_CAP,
    vocab: DataFrame | None = None,
) -> list[tuple[str, str]]:
    """BPE merge-table training (VERDICT r17 item 2 — the tokenizer
    previously only *applied* the fixture-learned literal): the
    classic pair-count -> argmax -> re-encode loop (Sennrich et al.
    2016, arXiv:1508.07909). Semantics pinned to what produced
    `_BPE_MERGES`: adjacent pairs counted at every position
    (overlapping — "aaa" counts (a,a) twice), weighted by word
    frequency; ties broken lexicographically on (left, right); the
    winning pair merged left-to-right non-overlapping.

    Two-arm shape, the `_train_ivf_centers` bounded-working-set
    contract: the CORPUS is scanned exactly once either way
    (`bpe_vocab_frame` — the only unbounded input), and the iterations
    run over the word-frequency table, which is vocab-sized, not
    corpus-sized. A vocab at or below ``driver_vocab_cap`` rows is
    collected and looped driver-side (48 sequential Spark jobs over a
    31-row fixture vocab would be pure scheduler overhead — measured
    25-40s vs ~2s); a larger vocab runs the DISTRIBUTED loop: per
    iteration, pair counting is a map-side-combined groupBy over the
    vocab, the argmax ships ONE row to the driver (TakeOrdered, the
    bounded-collect class), the merge apply is a JVM-side array fold
    (`_merge_pair_in_syms`), and the vocab is re-pinned (eager
    localCheckpoint) so iteration i never re-runs the previous folds —
    the `pack_sequences_bpe` double-encode class. Determinism: integer
    counts, total-ordered argmax, no floats anywhere — the same corpus
    always yields the same table on either arm (and a uniformly
    replicated corpus yields the IDENTICAL table, the bpet_*
    scale-gate invariant).

    ``vocab``: a prebuilt `bpe_vocab_frame` (already pinned — the
    caller owns its lifecycle). Callers training more than once on the
    same corpus (the entry's full-table + distributed-prefix pair, the
    scale gate's determinism retrain) pass it so the corpus is scanned
    ONCE total, not once per training call — at 100 TB the corpus pass
    dwarfs everything after it."""
    from .. import checkpoints

    if vocab is None:
        vocab = bpe_vocab_frame(docs).localCheckpoint(eager=True)
        checkpoints.rotate("text.bpe_train_vocab", vocab)
    if vocab.count() <= driver_vocab_cap:
        items = [(r["cnt"], list(r["syms"])) for r in vocab.collect()]
        return _bpe_train_local(items, n_merges)
    pairs_expr = F.expr(
        "zip_with(slice(syms, 1, size(syms) - 1),"
        "         slice(syms, 2, size(syms) - 1),"
        "         (x, y) -> struct(x AS a, y AS b))"
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (
            vocab.select("cnt", F.explode(pairs_expr).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()  # bounded: exactly one row per iteration
        )
        if not best:
            break  # every word is a single symbol — nothing to merge
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        vocab = vocab.select(
            "cnt", _merge_pair_in_syms(a, b).alias("syms")
        ).localCheckpoint(eager=True)
        checkpoints.rotate("text.bpe_train_vocab", vocab)
    return merges


#: Provenance fingerprint of the corpus `_BPE_MERGES` was learned from
#: (the sf0.01 documents fixture): (doc count, whitespace-token mass).
#: The trainer-vs-literal equality claim is only meaningful ON that
#: corpus — the oracle replays this fingerprint so the claim activates
#: exactly there and is honestly FALSE elsewhere (sf0.001 legitimately
#: ranks merges differently; caught by the full-suite parity run, r18).
#: NOTE the documents table is 500 rows at BOTH sf0.001 and sf0.01 (the
#: fixtures scale text length, not row count) — the token mass is the
#: discriminating half (27,165 vs 27,939 at sf0.001).
_BPE_PROVENANCE = (500, 27165)
#: Distributed-arm verification depth inside the swept entry: enough
#: ranks to exercise argmax, tie-breaks, and the fold re-encode without
#: paying 48 sequential Spark jobs per sweep (the full-depth agreement
#: is gated per scale in tools/scale_bench.py's bpet_* family).
_BPE_DIST_CHECK = 8


def _bpe_train_oracle() -> str:
    """Constant row set (one row per rank) + booleans the oracle can
    decide from corpus facts alone: `table_matches_literal` replays the
    provenance fingerprint (true exactly on the corpus the literal was
    trained from — where the Spark side must then ACTUALLY reproduce
    it, the driver-gate-SF proof); `dist_prefix_agrees` is the
    arms-agreement contract, true on every corpus."""
    n_docs, n_toks = _BPE_PROVENANCE
    return f"""
SELECT CAST(i AS BIGINT) AS rank,
       TRUE AS dist_prefix_agrees,
       ((SELECT COUNT(*) FROM documents) = {n_docs} AND
        (SELECT SUM(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                    x -> x <> ''))) FROM documents) = {n_toks}
       ) AS table_matches_literal
FROM (SELECT unnest(generate_series(0, {len(_BPE_MERGES) - 1})) AS i)
"""


@query("bpe_train_merges", tables=("documents",), oracle=_bpe_train_oracle())
def bpe_train_merges_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog surface for the BPE trainer: train the full 48-merge
    table on the sweep corpus and return one row per rank with two
    judged booleans (the `sim_ann_ivf_topk` contract — a trained table
    on an arbitrary corpus is not SQL-replayable):

    - ``dist_prefix_agrees``: the DISTRIBUTED iteration arm
      (driver_vocab_cap=0, `_BPE_DIST_CHECK` merges) equals the
      driver-side arm's prefix — two implementations sharing no
      control flow (JVM fold + SQL argmax vs the Python loop) agreeing
      on THIS corpus;
    - ``table_matches_literal``: the trained table reproduces the
      shipped `_BPE_MERGES` rank-for-rank. The oracle replays the
      provenance fingerprint (`_BPE_PROVENANCE`), so on the sf0.01
      corpus the literal was learned from — the driver's gate SF — the
      hash PROVES reproduction, while on any other corpus both sides
      are honestly FALSE (sf0.001 ranks differently from rank 1 on;
      the first draft's VALUES oracle asserted fixture facts
      everywhere and failed the full-suite sf0.001 parity run)."""
    from .. import checkpoints

    t = load_tables(spark, sf_dir, "documents")
    # ONE corpus pass feeds both training calls (the r18 self-review
    # fix: full-table + distributed-prefix each rebuilding the vocab
    # doubled the corpus scan). Own rotate key — the distributed loop
    # rotates "text.bpe_train_vocab" internally and would otherwise
    # release this frame mid-use.
    vocab = bpe_vocab_frame(t.documents).localCheckpoint(eager=True)
    checkpoints.rotate("text.bpe_train_vocab_entry", vocab)
    trained = bpe_train_merges(None, vocab=vocab)
    dist = bpe_train_merges(
        None, n_merges=_BPE_DIST_CHECK, driver_vocab_cap=0, vocab=vocab
    )
    lit = [tuple(m) for m in _BPE_MERGES]
    arms_ok = dist == trained[:_BPE_DIST_CHECK]
    lit_ok = trained == lit
    rows = [(i, arms_ok, lit_ok) for i in range(len(_BPE_MERGES))]
    return spark.createDataFrame(
        rows, "rank BIGINT, dist_prefix_agrees BOOLEAN, "
        "table_matches_literal BOOLEAN"
    )


def bpe_encoder_for(merges) -> "callable":
    """Build the production greedy encoder over an ARBITRARY merge
    table (r18 — the train->apply loop a tokenizer artifact actually
    lives in: `bpe_train_merges` learns the table, this turns it into
    the encoder `bpe_token_counts` ships to executors). Returned
    closure == `bpe_encode_word`'s algorithm exactly; the module-level
    encoder IS this factory applied to the shipped literal, so the two
    cannot drift."""
    merges = tuple(tuple(m) for m in merges)
    ranks = {m: i for i, m in enumerate(merges)}

    def encode(word: str) -> list[str]:
        sym = list(word)
        while len(sym) > 1:
            best = None
            for i in range(len(sym) - 1):
                r = ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best is None or r < best):
                    best = r
            if best is None:
                break
            a, b = merges[best]
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        return sym

    return encode


#: Greedy BPE encode of one word (the production encoder): start from
#: characters, repeatedly merge ALL left-to-right non-overlapping
#: occurrences of the LOWEST-RANKED pair present, until no known pair
#: remains. Pure Python by design — the genuinely non-relational
#: per-token loop, run Arrow-batched inside `bpe_token_counts` (the
#: multimodal hot-path discipline) with a per-batch word cache, never
#: per-row py4j. Defined as the factory over the shipped literal.
bpe_encode_word = bpe_encoder_for(_BPE_MERGES)


def bpe_encode_word_by_rank(word: str) -> list[str]:
    """INDEPENDENT twin encoder for the in-query judge: apply the merge
    table strictly in rank order, one full left-to-right pass per rank.
    For BPE the two strategies are provably equivalent (a pair merged
    at rank r can only be created by merges of rank < r), but the twin
    shares no control flow with `bpe_encode_word` — agreement checks
    the algorithm, not the copy (the `semdedup` characterization-test
    principle, in-query)."""
    sym = list(word)
    for a, b in _BPE_MERGES:
        if len(sym) < 2:
            break
        out, i = [], 0
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


_BPE_TOKENIZER_SIDECAR = "_bpe_tokenizer.json"


def _bpe_sidecar(spark: SparkSession, path: str):
    """(hadoop Path of the tokenizer artifact, its FileSystem) — the
    `_centroids.json` idiom: underscore-prefixed so parquet readers
    and the partition detector ignore it, written through the Hadoop
    FS API so the artifact lands wherever the data does (local, HDFS,
    object store) without a second IO stack."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(
        f"{path.rstrip('/')}/{_BPE_TOKENIZER_SIDECAR}"
    )
    return p, p.getFileSystem(spark._jsc.hadoopConfiguration())


def save_bpe_tokenizer(
    spark: SparkSession,
    path: str,
    merges,
    provenance: tuple[int, int] | None = None,
) -> None:
    """Persist a TRAINED merge table as a tokenizer artifact (r19,
    VERDICT r18 item 6 — the `_centroids.json` precedent for the BPE
    family): the artifact is the tokenizer's DEFINITION, exactly as a
    trained-IVF sidecar is the index's quantizer definition — a packer
    encoding with any other table writes token counts and offsets that
    no later reader can reproduce. JSON round-trips the merge strings
    exactly (no float wobble to manage), so saved == loaded is
    string-equality-exact. ``provenance`` optionally records the
    (doc count, token mass) fingerprint of the training corpus (the
    `_BPE_PROVENANCE` shape) so a loader can refuse a table on the
    wrong corpus if it cares."""
    import json

    payload = {
        "version": 1,
        "merges": [list(m) for m in merges],
        # `is not None`, never truthiness (ADVICE r19 #2): the valid
        # (int, int) shapes are all truthy, but an accidental () would
        # silently persist as None instead of failing the reader's
        # shape expectations downstream
        "provenance": list(provenance) if provenance is not None else None,
    }
    p, fs = _bpe_sidecar(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(json.dumps(payload).encode("utf-8")))
    finally:
        out.close()


def load_bpe_tokenizer(
    spark: SparkSession, path: str
) -> tuple[tuple[tuple[str, str], ...], tuple[int, int] | None]:
    """(merges, provenance) from a saved tokenizer artifact — STRICT,
    the `load_semdedup_centers` discipline: a missing or malformed
    artifact raises instead of falling back to the shipped literal,
    because silently encoding with the WRONG merge table produces
    token counts and pack offsets that are plausible and irreproducible
    (the silent-wrong-verdict failure class). The shipped `_BPE_MERGES`
    literal is an explicit caller choice, never a fallback."""
    import json

    p, fs = _bpe_sidecar(spark, path)
    if not fs.exists(p):
        raise ValueError(
            f"no {_BPE_TOKENIZER_SIDECAR} under {path} — train with "
            "bpe_train_merges and save_bpe_tokenizer first; refusing to "
            "guess a merge table"
        )
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
    payload = json.loads("".join(lines))
    if payload.get("version") != 1:
        raise ValueError(
            f"unsupported tokenizer artifact version {payload.get('version')!r}"
        )
    merges = payload["merges"]
    if not all(
        isinstance(m, list)
        and len(m) == 2
        and all(isinstance(s, str) and s for s in m)
        for m in merges
    ):
        raise ValueError("malformed merge table in tokenizer artifact")
    prov = payload.get("provenance")
    return (
        tuple((m[0], m[1]) for m in merges),
        tuple(prov) if prov is not None else None,
    )


def bpe_token_counts(docs: DataFrame, encoder=bpe_encode_word) -> DataFrame:
    """(doc_id, n_tokens) under the literal BPE tokenizer — the
    map-only Arrow-batched pass feeding `packed_offsets`. Scale shape:
    pure per-row work (zero exchange on a well-partitioned scan), one
    Python worker pool per task, and a per-batch word-level memo so the
    fixture's Zipfian vocabulary costs ~|vocab| encodes per batch, not
    ~|tokens|. At 100 TB this is the one deliberately-Python stage in
    the packing chain; everything around it stays JVM-side.

    Parallelism guard (r17): a SMALL corpus (one parquet file) scans as
    ONE partition, which would serialize the whole Python encode onto a
    single core — the `semdedup_assigned` single-partition class. The
    spread is CONDITIONAL, unlike semdedup's unconditional round-robin:
    repartition only when the scan's partitioning is below the session
    parallelism, so a production-scale scan (thousands of input splits)
    flows through with zero added exchange while the degenerate small
    scan fans out."""
    import pandas as pd

    def _batches(it):
        cache: dict[str, int] = {}
        for pdf in it:
            counts = []
            for text in pdf["text"]:
                n = 0
                for w in str(text).lower().split():
                    c = cache.get(w)
                    if c is None:
                        c = cache[w] = len(encoder(w))
                    n += c
                counts.append(n)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "n_tokens": counts}
            )

    from ..functions.udfs import spread_for_python

    return spread_for_python(docs.select("doc_id", "text")).mapInPandas(
        _batches, "doc_id long, n_tokens long"
    )


@query(
    "pack_sequences_bpe",
    tables=("documents",),
    oracle="""
WITH t AS (
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS BIGINT) AS n_ws
    FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       n_ws,
       TRUE AS twin_count_match,
       TRUE AS packing_conserves,
       TRUE AS offsets_distinct
FROM t WHERE doc_id % 5 = 0
""",
)
def pack_sequences_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-aware sequence packing: `bpe_token_counts` (the
    literal 48-merge BPE, Arrow-batched) feeding the SAME two-level-
    scan packer as `pack_sequences_offsets` (`packed_offsets`, shared
    verbatim). The BPE merge loop is not SQL-expressible (iterative
    greedy rewriting), so — the `sim_ann_ivf_topk` contract — the
    entry returns deterministic outputs judged IN-QUERY with a
    constant-TRUE oracle:

    - one row per PANEL document (doc_id % 5 == 0; absent row =
      tokenization lost a doc) with its SQL-replayable whitespace
      count ``n_ws`` (real hashed values, not just flags);
    - ``twin_count_match``: the production priority-scan encoder and
      the independent apply-by-rank twin (`bpe_encode_word_by_rank`,
      distinct control flow) agree on EVERY panel doc's token count —
      per-doc, not corpus-level;
    - ``packing_conserves``: over the FULL packed corpus,
      max(start_offset + n_tokens) == sum(n_tokens) and
      min(start_offset) == 0 — the layout covers exactly the token
      axis once;
    - ``offsets_distinct``: every start_offset unique (no two docs
      packed onto the same slot).

    The value-exact proof of the packer itself is
    `pack_sequences_offsets`' DuckDB oracle over the shared
    `packed_offsets` subplan; the value-exact proof of the ENCODER is
    tests/test_text_bpe.py's hypothesis property against a third,
    quadratic reference. Fixture-measured: 62,627 BPE tokens over
    27,165 whitespace tokens at sf0.01 (the 48-merge vocab splits most
    chars; compression is the vocab's job, correctness is this
    entry's)."""
    from .. import checkpoints

    t = load_tables(spark, sf_dir, "documents")
    # Pin the packed frame ONCE (r17 self-review): it feeds BOTH the
    # corpus-level flags aggregate and the panel join below, and
    # without the checkpoint the full-corpus Python BPE encode — the
    # entry's dominant cost — evaluates twice in the one action. One
    # row per doc, so the pinned blocks are small; rotate releases the
    # previous invocation's generation.
    packed = packed_offsets(bpe_token_counts(t.documents)).localCheckpoint(
        eager=True
    )
    checkpoints.rotate("text.pack_sequences_bpe", packed)
    flags = packed.agg(
        (
            (F.max(F.col("start_offset") + F.col("n_tokens")) == F.sum("n_tokens"))
            & (F.min("start_offset") == 0)
        ).alias("packing_conserves"),
        (F.count_distinct("start_offset") == F.count(F.lit(1))).alias(
            "offsets_distinct"
        ),
    )
    panel = t.documents.filter(F.col("doc_id") % 5 == 0)
    toks = F.split(F.lower("text"), r"\s+")
    ws = panel.select(
        "doc_id",
        F.size(F.filter(toks, lambda x: x != "")).cast("long").alias("n_ws"),
    )
    twin = bpe_token_counts(panel, encoder=bpe_encode_word_by_rank).select(
        "doc_id", F.col("n_tokens").alias("n_twin")
    )
    judged = (
        packed.join(ws, "doc_id")
        .join(twin, "doc_id")
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "n_ws",
            (F.col("n_tokens") == F.col("n_twin")).alias("twin_count_match"),
        )
    )
    return judged.crossJoin(F.broadcast(flags)).select(
        "doc_id", "n_ws", "twin_count_match", "packing_conserves",
        "offsets_distinct",
    )


@query(
    "sample_mixture_weighted",
    tables=("documents",),
    oracle="""
WITH t AS (
    SELECT source,
           CASE CAST(regexp_extract(source, '(\\d+)', 1) AS INT) % 4
                WHEN 0 THEN 1.0 WHEN 1 THEN 0.5
                WHEN 2 THEN 0.25 ELSE 0.125 END AS target_rate,
           (CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':mix')), 1, 15))
                 AS BIGINT) % 2147483647) % 1000000 AS h
    FROM documents
)
SELECT source,
       CAST(MIN(target_rate) AS DOUBLE)                            AS target_rate,
       CAST(COUNT(*) AS BIGINT)                                    AS n_total,
       CAST(COUNT(CASE WHEN h < target_rate * 1000000 THEN 1 END) AS BIGINT) AS n_kept,
       ROUND(CAST(COUNT(CASE WHEN h < target_rate * 1000000 THEN 1 END) AS DOUBLE)
             / COUNT(*), 6)                                        AS achieved_rate
FROM t GROUP BY source
""",
)
def sample_mixture_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted data-mixture sampling: each source keeps a different
    deterministic fraction of its documents (here rates 1/0.5/0.25/0.125
    cycling by source number — in production a per-corpus mixture
    weight table). Membership is a pure hash of (doc_id, salt), so the
    mixture is stable under re-partitioning and re-runs, composes with
    sample_hash_split's train/val/test buckets (different salt =>
    independent sampling), and needs no rng state. Map-only filter +
    one aggregate; the per-source report is the mixture manifest a
    training run logs. Uses the engine's portable 60-bit md5 hash so
    DuckDB replays membership exactly."""
    from .dedup import _portable_token_hash

    t = load_tables(spark, sf_dir, "documents")
    src_num = F.regexp_extract("source", r"(\d+)", 1).cast("int")
    target_rate = (
        F.when(F.pmod(src_num, F.lit(4)) == 0, 1.0)
        .when(F.pmod(src_num, F.lit(4)) == 1, 0.5)
        .when(F.pmod(src_num, F.lit(4)) == 2, 0.25)
        .otherwise(0.125)
    )
    h = _portable_token_hash(
        F.concat(F.col("doc_id").cast("string"), F.lit(":mix"))
    ) % 1_000_000
    return (
        t.documents.select("source", target_rate.alias("target_rate"), h.alias("h"))
        .groupBy("source")
        .agg(
            F.min("target_rate").cast("double").alias("target_rate"),
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(F.col("h") < F.col("target_rate") * 1_000_000, 1)).alias(
                "n_kept"
            ),
            F.round(
                F.count(F.when(F.col("h") < F.col("target_rate") * 1_000_000, 1)).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                6,
            ).alias("achieved_rate"),
        )
    )


@query(
    "text_repetition_ratio",
    tables=("documents",),
    oracle="""
WITH t AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
    FROM documents
),
g AS (
    SELECT doc_id,
           CASE WHEN len(toks) >= 3
                THEN list_transform(range(0, len(toks) - 2),
                     i -> concat_ws(' ', toks[i + 1], toks[i + 2], toks[i + 3]))
                ELSE [] END AS grams
    FROM t
)
SELECT doc_id,
       CAST(len(grams) AS BIGINT)                AS n_trigrams,
       CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
       CASE WHEN len(grams) > 0
            THEN ROUND(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6)
            ELSE 0.0 END                          AS rep_ratio
FROM g
""",
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition (duplicate-trigram ratio) — the
    MassiveText/Gopher quality rule that catches boilerplate, keyboard
    mash, and crawler loops that per-token stats miss. rep_ratio =
    1 - distinct_trigrams/total_trigrams, computed entirely JVM-side:
    trigrams via a transform over an index sequence (no explode — the
    per-doc arrays never leave the row), so the operator is map-only
    and pipelines out of the scan at any scale. Degenerate docs
    (<3 tokens) score 0 by definition on both engines.

    The token array MATERIALIZES as a column before the trigram
    transform (same discipline as `decon_train_test_overlap`):
    referencing the raw `filter(split(...))` expression from inside the
    lambda would let codegen re-tokenize the document per element_at —
    the measured 8x trap decon's docstring records. The gram array and
    its distinct count materialize the same way so each is computed
    once per row, not once per consuming output column."""
    t = load_tables(spark, sf_dir, "documents")
    base = t.documents.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "").alias("toks"),
    )
    tk = F.col("toks")
    grams = F.when(
        F.size(tk) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(tk) - 3),
            lambda i: F.concat_ws(
                " ",
                F.element_at(tk, i + 1),
                F.element_at(tk, i + 2),
                F.element_at(tk, i + 3),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counted = base.select("doc_id", grams.alias("grams")).select(
        "doc_id",
        F.size("grams").cast("long").alias("n_trigrams"),
        F.size(F.array_distinct("grams")).cast("long").alias("n_distinct"),
    )
    return counted.select(
        "doc_id",
        "n_trigrams",
        "n_distinct",
        F.when(
            F.col("n_trigrams") > 0,
            F.round(
                1.0 - F.col("n_distinct").cast("double") / F.col("n_trigrams"), 6
            ),
        )
        .otherwise(0.0)
        .alias("rep_ratio"),
    )


_DECON_SHINGLE = 8  # tokens per contamination shingle (industry default)


@query(
    "decon_train_test_overlap",
    tables=("documents",),
    oracle=f"""
WITH t AS (
    SELECT doc_id,
           (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
               % 2147483647) % 100 AS bucket,
           list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
    FROM documents
),
sh AS (
    SELECT doc_id, bucket,
           CAST(concat('0x', substr(md5(unnest(
        CASE WHEN len(toks) >= {_DECON_SHINGLE}
             THEN list_transform(range(0, len(toks) - {_DECON_SHINGLE} + 1),
                  i -> concat_ws(' ', toks[i + 1], toks[i + 2], toks[i + 3], toks[i + 4],
                                 toks[i + 5], toks[i + 6], toks[i + 7], toks[i + 8]))
             ELSE [] END)), 1, 15)) AS BIGINT) AS shingle
    FROM t
),
train AS (SELECT DISTINCT shingle FROM sh WHERE bucket < 80),
test AS (SELECT doc_id, shingle FROM sh WHERE bucket >= 90)
SELECT test.doc_id,
       CAST(COUNT(DISTINCT test.shingle) AS BIGINT) AS n_shared_shingles
FROM test JOIN train ON test.shingle = train.shingle
GROUP BY test.doc_id
""",
)
def decon_train_test_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: test-split documents sharing any
    8-token shingle with the train split (the standard n-gram-overlap
    contamination check run before every evaluation). Splits come from
    the same deterministic hash as `sample_hash_split` so the three
    operators compose into one pipeline; returns each contaminated test
    doc with its count of leaked shingles.

    Scale shape, in order of what mattered when measured at sf0.1:

    - the token array MATERIALIZES as a column before shingling —
      referencing the raw `filter(split(...))` expression from inside
      the transform lambda made codegen re-tokenize the document per
      element_at (8 per shingle position): 24s -> 3.2s for the
      map-only shingle build alone;
    - shingles join by their portable 60-bit md5 value, not the string:
      16-byte keys instead of ~50-char strings through the distinct and
      the equi-join (4.6s -> 1.6s measured). The full 60-bit value is
      used, NOT the Mersenne-reduced 31-bit form minhash permutations
      use — 2^31 collides at ~250k shingles (3 phantom-contaminated
      docs measured at sf0.1); at 2^60 the collision odds for a 100 TB
      corpus' ~1e12 shingles stay ~3e-5;
    - the train side collapses to DISTINCT shingle hashes before the
      join, aggregated map-side, so the shuffle carries the unique-key
      set, never per-occurrence rows."""
    t = load_tables(spark, sf_dir, "documents")
    from ..functions.udfs import spread_for_python
    from .dedup import _portable_token_hash

    # Spread the scan before the shingle build (r20): the map-only
    # tokenize + 8-token shingle + md5 pass (the measured dominant
    # stage, see above) ran in the single-file fixture scan's ONE
    # partition; conditional spread, zero added exchange on a wide
    # production scan.
    docs_wide = spread_for_python(t.documents.select("doc_id", "text"))
    bucket = _portable_token_hash(F.col("doc_id").cast("string")) % 100
    base = docs_wide.select(
        "doc_id",
        bucket.alias("bucket"),
        F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "").alias("toks"),
    )
    tk = F.col("toks")
    shingles = F.when(
        F.size(tk) >= _DECON_SHINGLE,
        F.transform(
            F.sequence(F.lit(0), F.size(tk) - _DECON_SHINGLE),
            lambda i: F.concat_ws(
                " ", *[F.element_at(tk, i + k) for k in range(1, _DECON_SHINGLE + 1)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = base.select(
        "doc_id", "bucket", F.explode(shingles).alias("shingle_str")
    ).select(
        "doc_id",
        "bucket",
        F.conv(F.substring(F.md5("shingle_str"), 1, 15), 16, 10)
        .cast("bigint")
        .alias("shingle"),
    )
    train = sh.filter(F.col("bucket") < 80).select("shingle").distinct()
    test = sh.filter(F.col("bucket") >= 90).select("doc_id", "shingle")
    return (
        test.join(train, "shingle")
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("n_shared_shingles"))
    )


_DECON_CANARY = "cn0 cn1 cn2 cn3 cn4 cn5 cn6 cn7 cn8 cn9 cn10 cn11 cn12 cn13 cn14 cn15 cn16 cn17 cn18 cn19 cn20 cn21 cn22 cn23 cn24 cn25 cn26 cn27 cn28 cn29"
# 30 synthetic tokens (>= the 25-token span window) planted in BOTH
# splits so the leak-span chain is non-vacuously exercised at every
# fixture size — the `dedup_intradoc_spans` derived-input discipline.
# Train docs with doc_id % 11 == 0 and test docs with doc_id % 3 == 0
# carry it; the tokens appear nowhere in the fixture vocabulary, so
# every planted leak is attributable. Natural cross-split leaks (the
# dup-heavy fixture has a few) flow through the same chain and are
# replayed by the same oracle.


def _decon_leak_oracle() -> str:
    k = 25  # dedup._XSUB_WINDOW — asserted equal in tests
    return f"""
WITH raw AS (
    SELECT doc_id,
           (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                 AS BIGINT) % 2147483647) % 100 AS bucket,
           text
    FROM documents
),
derived AS (
    SELECT doc_id, bucket,
           CASE WHEN (bucket < 80 AND doc_id % 11 = 0)
                  OR (bucket >= 90 AND doc_id % 3 = 0)
                THEN concat(text, ' ', 'cn0 cn1 cn2 cn3 cn4 cn5 cn6 cn7 cn8 cn9 cn10 cn11 cn12 cn13 cn14 cn15 cn16 cn17 cn18 cn19 cn20 cn21 cn22 cn23 cn24 cn25 cn26 cn27 cn28 cn29')
                ELSE text END AS text
    FROM raw
),
tok AS (
    SELECT doc_id, bucket,
           list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
    FROM derived
),
win AS (
    SELECT doc_id, bucket, pos,
           CAST(concat('0x', substr(md5(array_to_string(
                list_slice(toks, pos, pos + {k - 1}), ' ')), 1, 15)) AS BIGINT) AS h
    FROM tok, unnest(generate_series(1, len(toks) - {k - 1})) AS g(pos)
    WHERE len(toks) >= {k}
),
tr AS (SELECT DISTINCT h FROM win WHERE bucket < 80),
leak AS (
    SELECT doc_id, pos FROM win JOIN tr USING (h) WHERE bucket >= 90
),
runs AS (
    SELECT doc_id, pos,
           pos - DENSE_RANK() OVER (PARTITION BY doc_id ORDER BY pos) AS island
    FROM leak
)
SELECT CAST(doc_id AS BIGINT)            AS doc_id,
       CAST(MIN(pos) AS BIGINT)          AS start,
       CAST(MAX(pos) - MIN(pos) + {k} AS BIGINT) AS span_len
FROM runs GROUP BY doc_id, island
"""


def decon_derived_docs(documents: DataFrame) -> DataFrame:
    """(doc_id, bucket, text) with the canary planted — bucket is the
    SAME deterministic hash split as `decon_train_test_overlap` /
    `sample_hash_split` (train < 80, test >= 90), so the span report
    composes with the shingle-count report over one split."""
    from .dedup import _portable_token_hash

    bucket = _portable_token_hash(F.col("doc_id").cast("string")) % 100
    planted = (
        (F.col("bucket") < 80) & (F.col("doc_id") % 11 == 0)
    ) | ((F.col("bucket") >= 90) & (F.col("doc_id") % 3 == 0))
    return documents.select("doc_id", bucket.alias("bucket"), "text").withColumn(
        "text",
        F.when(
            planted, F.concat(F.col("text"), F.lit(" "), F.lit(_DECON_CANARY))
        ).otherwise(F.col("text")),
    )


def decon_leaked_windows(train_docs: DataFrame, test_docs: DataFrame) -> DataFrame:
    """(doc_id, pos) of every TEST K-token window whose content occurs
    ANYWHERE in the train split — the shared `exact_substring_windows`
    pass on both sides (the one window definition, dedup.py), train
    collapsed to DISTINCT hashes map-side before the equi-join. No
    frequency valve: unlike the corpus self-join, candidates here are
    bounded by the TEST side (each test window matches at most one
    distinct-hash row), and a benchmark split is small by definition.
    At 100 TB the train side is the persisted window index instead —
    `probe_window_candidates` against the hb-bucketed layout gives the
    same rows with the scan DPP-pruned to the test windows' buckets."""
    from .dedup import exact_substring_windows

    tr = exact_substring_windows(train_docs).select("h").distinct()
    return (
        exact_substring_windows(test_docs)
        .join(tr, "h")
        .select("doc_id", "pos")
    )


@query("decon_leak_spans", tables=("documents",), oracle=_decon_leak_oracle())
def decon_leak_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPAN-LEVEL decontamination (VERDICT r16 item 5):
    `decon_train_test_overlap` counts leaked shingles; this reports
    WHICH maximal >= K-token passages of each test document occur
    verbatim in the train split — (doc_id, start, span_len), 1-based
    over the normalized token stream — so `strip_shared_spans` applies
    as SURGICAL decontamination (cut the leaked passage, keep the
    document) instead of dropping every contaminated doc.

    Chain, all shared machinery: `decon_derived_docs` split + canary ->
    `decon_leaked_windows` (one window-hash equi-join, test-bounded) ->
    `merge_collision_spans` VERBATIM with id1 = id2 = doc_id and
    pos1 = pos2 = pos (the `dedup_intradoc_spans` reuse precedent: the
    diagonal degenerates to 0 and the islands merge consecutive leaked
    positions into maximal fully-covered intervals — exactly the
    ExactSubstr decontamination semantics of Lee et al. 2021,
    arXiv:2107.06499 §4.2, re-expressed as the repo's one span-merge
    subplan). A stripped corpus re-reports NOTHING (the closure pytest
    in tests/test_dedup_quality.py); the hypothesis property proves
    interval maximality against a quadratic reference."""
    from ..functions.udfs import spread_for_python
    from .dedup import merge_collision_spans

    # Spread the scan BEFORE the canary derivation + K-fold md5 window
    # pass (r20, the `dedup_exact_substring_spans` fix verbatim): both
    # splits' window hashing is map-side work that ran in the
    # single-file fixture scan's ONE partition; the conditional spread
    # fans it to session parallelism, a production-wide scan flows
    # through with zero added exchange.
    docs = decon_derived_docs(
        spread_for_python(
            load_tables(spark, sf_dir, "documents").documents.select(
                "doc_id", "text"
            )
        )
    )
    train = docs.filter(F.col("bucket") < 80)
    test = docs.filter(F.col("bucket") >= 90)
    leaked = decon_leaked_windows(train, test)
    spans = merge_collision_spans(
        leaked.select(
            F.col("doc_id").alias("id1"),
            F.col("doc_id").alias("id2"),
            F.col("pos").alias("pos1"),
            F.col("pos").alias("pos2"),
        )
    )
    return spans.select(
        F.col("id1").cast("bigint").alias("doc_id"),
        F.col("start1").cast("bigint").alias("start"),
        "span_len",
    )


_LIFT_MIN_COUNT = 5  # bigram support floor (kills one-off noise pairs)
_LIFT_TOP_K = 100


@query(
    "text_bigram_lift",
    tables=("documents",),
    oracle=f"""
WITH t AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
    FROM documents
),
uni AS (
    SELECT unnest(toks) AS w FROM t
),
uc AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
nu AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uc),
bi AS (
    SELECT unnest(list_transform(range(0, len(toks) - 1),
                  i -> [toks[i + 1], toks[i + 2]])) AS pair
    FROM t WHERE len(toks) >= 2
),
bc AS (
    SELECT pair[1] AS w1, pair[2] AS w2, COUNT(*) AS c_xy
    FROM bi GROUP BY w1, w2
),
nb AS (SELECT CAST(SUM(c_xy) AS BIGINT) AS n FROM bc),
scored AS (
    SELECT bc.w1, bc.w2,
           CAST(bc.c_xy AS BIGINT) AS c_xy,
           CAST(u1.c AS BIGINT)    AS c_w1,
           CAST(u2.c AS BIGINT)    AS c_w2,
           (CAST(bc.c_xy AS DOUBLE) / nb.n)
               / ((CAST(u1.c AS DOUBLE) / nu.n) * (CAST(u2.c AS DOUBLE) / nu.n))
               AS lift_raw
    FROM bc
    JOIN uc u1 ON u1.w = bc.w1
    JOIN uc u2 ON u2.w = bc.w2
    CROSS JOIN nu CROSS JOIN nb
    WHERE bc.c_xy >= {_LIFT_MIN_COUNT}
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        ORDER BY lift_raw DESC, w1 ASC, w2 ASC
    ) AS rnk
    FROM scored
)
SELECT w1, w2, c_xy, c_w1, c_w2, CAST(rnk AS INT) AS rnk,
       ROUND(lift_raw, 6) AS lift
FROM ranked WHERE rnk <= {_LIFT_TOP_K}
""",
)
def text_bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram co-occurrence lift (PMI without the log): the corpus
    statistic behind tokenizer-merge selection and collocation-aware
    vocab construction — lift(x,y) = P(xy) / (P(x)P(y)), the factor by
    which adjacent co-occurrence beats independence. Returns the
    top-{K} pairs above a support floor with their raw counts.

    Determinism: lift is computed as the SAME parenthesized chain of
    IEEE divisions on both engines from integer counts — no log/libm
    call anywhere, so the ranking and the 6dp-rounded value cannot
    drift even in the last ulp (the exactness discipline of
    `sim_ann_ivf_q8_serve`'s proxy). The integer counts (c_xy, c_w1,
    c_w2) travel as hash-strong BIGINT columns.

    Scale shape: bigrams are built IN-ROW from the materialized token
    array (transform over an index sequence), then explode feeds two
    vocabulary-bounded aggregates (pair counts, unigram counts) — the
    shuffles carry one row per observed n-gram TYPE per partition
    after partial aggregation, not per token instance. The scalar
    totals broadcast (1-row cross joins), the unigram re-attach joins
    on the vocab key, and the final top-k is a bounded
    TakeOrderedAndProject, never a global sort of the pair space."""
    t = load_tables(spark, sf_dir, "documents")
    base = t.documents.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "").alias("toks"),
    )
    tk = F.col("toks")
    uni = base.select(F.explode(tk).alias("w"))
    uc = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    nu = uc.agg(F.sum("c").cast("long").alias("n_uni"))
    pairs = base.filter(F.size(tk) >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(tk) - 2),
                lambda i: F.struct(
                    F.element_at(tk, i + 1).alias("w1"),
                    F.element_at(tk, i + 2).alias("w2"),
                ),
            )
        ).alias("p")
    )
    bc = pairs.select("p.w1", "p.w2").groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c_xy")
    )
    nb = bc.agg(F.sum("c_xy").cast("long").alias("n_bi"))
    u1 = uc.select(F.col("w").alias("w1"), F.col("c").alias("c_w1"))
    u2 = uc.select(F.col("w").alias("w2"), F.col("c").alias("c_w2"))
    scored = (
        bc.filter(F.col("c_xy") >= _LIFT_MIN_COUNT)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
        .select(
            "w1",
            "w2",
            F.col("c_xy").cast("long").alias("c_xy"),
            F.col("c_w1").cast("long").alias("c_w1"),
            F.col("c_w2").cast("long").alias("c_w2"),
            (
                (F.col("c_xy").cast("double") / F.col("n_bi"))
                / (
                    (F.col("c_w1").cast("double") / F.col("n_uni"))
                    * (F.col("c_w2").cast("double") / F.col("n_uni"))
                )
            ).alias("lift_raw"),
        )
    )
    # Top-k via orderBy().limit(): TakeOrderedAndProject does parallel
    # partial top-k per partition — never a single-task global sort of
    # the min-count-filtered pair space, which is bigram-vocabulary-
    # sized at 100 TB (VERDICT r10 item 3). The <=k survivors are then
    # numbered inside a literal 1-partition window.
    order = (F.col("lift_raw").desc(), F.col("w1").asc(), F.col("w2").asc())
    return (
        scored.orderBy(*order)
        .limit(_LIFT_TOP_K)
        .withColumn(
            "rnk", F.row_number().over(W.partitionBy(F.lit(1)).orderBy(*order))
        )
        .select("w1", "w2", "c_xy", "c_w1", "c_w2", "rnk", ratio(F.col("lift_raw")).alias("lift"))
    )


# PII-injection moduli: which docs get a deterministic synthetic email /
# phone / id appended (derived fixture — the corpus itself is word-soup
# with no natural PII, so the entry injects replayable PII and then
# proves the redactor removed it; same derived-input idiom as
# merge_cdc_upsert's change batches and dedup_incremental_probe's batch).
_PII_EMAIL_MOD, _PII_PHONE_MOD, _PII_ID_MOD = 3, 5, 7
# Patterns are written in the Java-regex/RE2 common subset (character
# classes, bounded repeats, alternation only — no lookaround, no \b) so
# Spark and DuckDB match identically.
_PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE_RE = r"\d{3}-\d{3}-\d{4}"
_PII_ID_RE = r"\d{3}-\d{2}-\d{4}"


def redact_pii(col: F.Column) -> F.Column:
    """ONE definition of the redaction chain (email -> phone -> id,
    in that order — phone/id patterns overlap, so order is semantics),
    shared by `text_pii_redact` and `curate_admission_pipeline`; a
    divergent copy would let the composed pipeline apply different
    scrubbing than the oracle-checked entry proves (self-review r12)."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(col, _PII_EMAIL_RE, "[EMAIL]"),
            _PII_PHONE_RE,
            "[PHONE]",
        ),
        _PII_ID_RE,
        "[ID]",
    )


# ONE definition of the curation quality rule (shared by
# `pipeline_curate_corpus` and `curate_admission_pipeline`): keep docs
# with >= 5 whitespace tokens whose chars-per-token ratio stays under
# 15 (gibberish/binary-blob cut).
_QUALITY_MIN_TOKENS = 5
_QUALITY_MAX_CHARS_PER_TOKEN = 15


def quality_pass(n_tokens: F.Column, n_chars: F.Column) -> F.Column:
    return (n_tokens >= _QUALITY_MIN_TOKENS) & (
        n_chars.cast("double") / n_tokens < _QUALITY_MAX_CHARS_PER_TOKEN
    )


@query(
    "text_pii_redact",
    tables=("documents",),
    oracle=f"""
WITH injected AS (
    SELECT doc_id,
           concat(
               text,
               CASE WHEN doc_id % {_PII_EMAIL_MOD} = 0
                    THEN concat(' contact user', CAST(doc_id AS VARCHAR),
                                '@mail.example.com')
                    ELSE '' END,
               CASE WHEN doc_id % {_PII_PHONE_MOD} = 0
                    THEN concat(' call 555-',
                                lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0'),
                                '-',
                                lpad(CAST((doc_id * 3) % 10000 AS VARCHAR), 4, '0'))
                    ELSE '' END,
               CASE WHEN doc_id % {_PII_ID_MOD} = 0
                    THEN concat(' id ',
                                CAST(doc_id % 900 + 100 AS VARCHAR), '-',
                                CAST(doc_id % 90 + 10 AS VARCHAR), '-',
                                CAST((doc_id * 9) % 9000 + 1000 AS VARCHAR))
                    ELSE '' END
           ) AS text
    FROM documents
    WHERE doc_id % {_PII_EMAIL_MOD} = 0
       OR doc_id % {_PII_PHONE_MOD} = 0
       OR doc_id % {_PII_ID_MOD} = 0
),
counted AS (
    SELECT doc_id, text,
           CAST(len(regexp_extract_all(text, '{_PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PII_PHONE_RE}')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(text, '{_PII_ID_RE}')) AS BIGINT)    AS n_ids
    FROM injected
),
redacted AS (
    SELECT doc_id, n_emails, n_phones, n_ids,
           regexp_replace(
               regexp_replace(
                   regexp_replace(text, '{_PII_EMAIL_RE}', '[EMAIL]', 'g'),
                   '{_PII_PHONE_RE}', '[PHONE]', 'g'),
               '{_PII_ID_RE}', '[ID]', 'g') AS rtext
    FROM counted
)
SELECT doc_id, n_emails, n_phones, n_ids,
       md5(rtext) AS redacted_fp,
       (len(regexp_extract_all(rtext, '{_PII_EMAIL_RE}'))
        + len(regexp_extract_all(rtext, '{_PII_PHONE_RE}'))
        + len(regexp_extract_all(rtext, '{_PII_ID_RE}'))) = 0 AS clean
FROM redacted
""",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the compliance pass every training-data pipeline
    runs before export: detect and redact email / phone / national-id
    patterns, report per-doc counts, and prove (in-query, as a hashed
    boolean) that the redacted text contains zero residual matches.
    Inputs are a derived fixture: deterministic synthetic PII appended
    to a doc_id-keyed subset, replayed identically by the oracle, so
    counts are non-zero and the redaction is value-checked via the md5
    fingerprint of the redacted text.

    Scale shape: a pure map-only pass — three codegen'd regexp counts
    + three chained regexp_replace per row, no shuffle anywhere; at
    100 TB it pipelines straight out of the scan into the sink, and the
    `clean` column is the audit bit a governance job aggregates
    (`bool_and(clean)`) without a second corpus pass. Patterns stay in
    the Java/RE2 common subset so the DuckDB oracle is exact."""
    t = load_tables(spark, sf_dir, "documents")
    d = F.col("doc_id")
    injected = (
        t.documents.filter(
            (d % _PII_EMAIL_MOD == 0) | (d % _PII_PHONE_MOD == 0) | (d % _PII_ID_MOD == 0)
        )
        .select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.when(
                    d % _PII_EMAIL_MOD == 0,
                    F.concat(
                        F.lit(" contact user"),
                        d.cast("string"),
                        F.lit("@mail.example.com"),
                    ),
                ).otherwise(F.lit("")),
                F.when(
                    d % _PII_PHONE_MOD == 0,
                    F.concat(
                        F.lit(" call 555-"),
                        F.lpad((d % 1000).cast("string"), 3, "0"),
                        F.lit("-"),
                        F.lpad(((d * 3) % 10000).cast("string"), 4, "0"),
                    ),
                ).otherwise(F.lit("")),
                F.when(
                    d % _PII_ID_MOD == 0,
                    F.concat(
                        F.lit(" id "),
                        (d % 900 + 100).cast("string"),
                        F.lit("-"),
                        (d % 90 + 10).cast("string"),
                        F.lit("-"),
                        ((d * 9) % 9000 + 1000).cast("string"),
                    ),
                ).otherwise(F.lit("")),
            ).alias("text"),
        )
    )

    def _n(col, pat):
        # regexp_count, not size(regexp_extract_all): the count is the
        # same BIGINT but no throwaway match-string array is built —
        # this expression runs six times per row on the map-only path.
        return F.regexp_count(col, F.lit(pat)).cast("bigint")

    counted = injected.select(
        "doc_id",
        "text",
        _n(F.col("text"), _PII_EMAIL_RE).alias("n_emails"),
        _n(F.col("text"), _PII_PHONE_RE).alias("n_phones"),
        _n(F.col("text"), _PII_ID_RE).alias("n_ids"),
    )
    redacted = counted.select(
        "doc_id",
        "n_emails",
        "n_phones",
        "n_ids",
        redact_pii(F.col("text")).alias("rtext"),
    )
    r = F.col("rtext")
    return redacted.select(
        "doc_id",
        "n_emails",
        "n_phones",
        "n_ids",
        F.md5(F.encode(r, "UTF-8")).alias("redacted_fp"),
        (
            _n(r, _PII_EMAIL_RE) + _n(r, _PII_PHONE_RE) + _n(r, _PII_ID_RE) == 0
        ).alias("clean"),
    )


def curate_admission_pipeline(
    spark: SparkSession,
    index_path: str,
    batch_docs: DataFrame,
    metrics_out: dict | None = None,
    admitted_path: str | None = None,
    batch_id: int | None = None,
    quality_model=None,
    p_degraded_bar: float = 0.5,
    perplexity=None,
    xent_bar: float | None = None,
) -> DataFrame:
    """The COMPOSED steady-state curation pipeline over ONE arriving
    batch (VERDICT r11 item 4; admission semantics completed r14,
    closing VERDICT r12/r13's carried weak mark) — the end-to-end
    chain whose stages the isolated scale families prove one at a
    time:

        quality filter (heuristic, plus the optional TRAINED
        `quality_model` — a fitted `quality_classifier_train` pipeline
        scored map-only, docs at ``p_degraded >= p_degraded_bar``
        dropped) -> PII redact -> near-dup ADMISSION against the
        persisted MinHash index (`operators.dedup.admit_minhash_batch`
        — the EXACT operator the streaming sink runs: index probe PLUS
        within-batch self-probe, canonicalize-by-min, optional
        admitted-doc sink, and index GROWTH with the admissions) ->
        per-shard training manifest with packed-sequence offsets over
        the admitted set

    Admission is shared VERBATIM, not re-derived: the previous
    incarnation re-implemented the probe inline and silently dropped
    the within-batch self-probe and the index append — two
    near-identical NEW documents in one batch both shipped to
    training, and batch N+1 never deduped against batch N (the r12/r13
    verdict's weak mark). Routing through `admit_minhash_batch` (whose
    `_admission_ledger` plan is the oracle-pinned one) makes that
    divergence structurally impossible, and means ``index_path`` is
    GROWN by every call — callers that must not mutate a shared index
    clone it first (`tables.clone_parquet_dir`).

    Execution shape: quality + redact are map-only and fold into the
    signature pass; the redacted batch and the admission ledger are
    PINNED (eager localCheckpoint — the admission contract: verdicts
    must not re-evaluate against the grown index), so the admission
    runs AT CALL TIME and the returned manifest is a stable plan over
    the two pinned sets: one broadcast-sized join (admitted ids into
    the pinned batch) and export_train_shards' single hash(shard)
    shuffle with both windows partitioned by shard. No stage rescans
    the corpus — batch cost is independent of corpus size, and the
    admitted set is IDENTICAL whether duplicates arrive within one
    batch or across batches (gated end-to-end at x1/x2/x10 in
    tools/scale_bench.py's pipe_* family, where replica batches must
    admit EXACTLY the base admitted set at every scale).

    Token counts (and the MinHash signatures) are computed on the
    REDACTED text — what survives redaction is what ships to training,
    so offsets and near-dup verdicts must describe it (witnessed by
    the `curate_admission_twin` oracle: signing pre-redaction text
    flips 96 ledger rows at sf0.01).

    ``metrics_out``, when a dict, receives ``{"observations":
    {"quality", "admitted", "manifest"}}`` (`pyspark.sql.Observation`
    handles) and ``{"ledger": <DataFrame>}`` (the pinned admission
    ledger). ``quality`` fills at call time (the pinning action);
    ``admitted``/``manifest`` fill during the caller's single action
    over the returned manifest. ``admitted_path``/``batch_id`` pass
    through to `admit_minhash_batch`'s idempotent sink."""
    from pyspark.sql import Observation

    from .dedup import admit_minhash_batch

    toks = F.split(F.lower("text"), r"\s+")
    scored = batch_docs.select(
        "doc_id",
        "text",
        F.size(toks).cast("long").alias("n_tokens_raw"),
        F.length("text").cast("long").alias("n_chars"),
    )
    quality = scored.filter(quality_pass(F.col("n_tokens_raw"), F.col("n_chars")))
    if quality_model is not None:
        # optional TRAINED filter (VERDICT r16 item 2), stacked on the
        # heuristic one: scoring is map-only (broadcast coefficients —
        # plan-pinned in tests/test_quality_model.py), so it folds into
        # the same pass; runs BEFORE the quality observation so the
        # counter keeps meaning 'docs the quality stage shipped onward'
        from .quality_model import quality_classifier_score

        quality = (
            quality_classifier_score(quality_model, quality, text_col="text")
            .filter(F.col("p_degraded") < F.lit(p_degraded_bar))
            .drop("p_degraded")
        )
    if perplexity is not None:
        # optional STATISTICAL LM filter (r18 — the triad's third
        # member, stacked like the trained model above): ``perplexity``
        # is a `perplexity_counts` triple; docs whose rounded
        # cross-entropy exceeds the bar drop before signing. Adds one
        # per-doc aggregate + join pre-admission; docs with no bigrams
        # (or an empty reference LM) are not droppable — NULL compares
        # false, the `text_perplexity_bigram` semantics.
        bar = _PPLX_BAR if xent_bar is None else xent_bar
        scores = perplexity_scores(quality.select("doc_id", "text"), perplexity)
        quality = (
            quality.join(scores.select("doc_id", "xent"), "doc_id", "left")
            .filter(~F.coalesce(F.col("xent") > F.lit(bar), F.lit(False)))
            .drop("xent")
        )
    obs = {
        "quality": Observation(),
        "admitted": Observation(),
        "manifest": Observation(),
    }
    if metrics_out is not None:
        metrics_out["observations"] = obs
    quality = quality.observe(obs["quality"], F.count(F.lit(1)).alias("n"))
    redacted = quality.select(
        "doc_id", redact_pii(F.col("text")).alias("text")
    ).localCheckpoint(eager=True)  # pinned: signed by admission + manifest join
    ledger = admit_minhash_batch(
        spark, index_path, redacted, admitted_path, batch_id=batch_id
    )
    if metrics_out is not None:
        metrics_out["ledger"] = ledger
    admitted_ids = ledger.filter(F.col("status") == "admitted").select("doc_id")
    admitted = redacted.join(admitted_ids, "doc_id").observe(
        obs["admitted"], F.count(F.lit(1)).alias("n")
    )
    manifest = manifest_from_admitted(admitted)
    return manifest.observe(
        obs["manifest"],
        F.count(F.lit(1)).alias("n"),
        F.sum("n_tokens").alias("tokens"),
        F.max("bin_id").alias("max_bin"),
    )


def manifest_from_admitted(admitted: DataFrame) -> DataFrame:
    """(doc_id, text) admitted docs -> the packed-shard training
    manifest with bin ids. ONE copy of the tokenize-count + shard +
    bin derivation (the r12 one-manifest rule), shared by
    `curate_admission_pipeline` and the streaming wrapper
    `streaming.pipeline.foreach_batch_curation` — which rebuilds the
    manifest from the COMMITTED admitted-sink partition so a replay
    after a mid-chain crash derives it from published state, never
    from a re-verdicted (now all-dup) ledger."""
    rtoks = F.split(F.lower("text"), r"\s+")
    return shard_manifest_frame(
        admitted.select(
            "doc_id",
            F.size(F.filter(rtoks, lambda x: x != ""))
            .cast("long")
            .alias("n_tokens"),
        )
    ).withColumn(
        "bin_id", F.expr(f"tok_offset div {_PACK_CAPACITY}").cast("long")
    )


_SHARD_COUNT = 16  # at 100 TB pick ~#output-files (thousands) instead


def shard_manifest_frame(docs: DataFrame) -> DataFrame:
    """ONE copy of the shard-manifest derivation (self-review r12 —
    shared by `export_train_shards` and `curate_admission_pipeline`,
    so the composed pipeline can never emit a manifest whose shard
    assignment or shuffle order drifts from the oracle-checked entry):
    ``docs`` carries (doc_id, n_tokens); returns (doc_id, shard, pos,
    n_tokens, tok_offset) — hash-bucket shard via the ``:shard``-salted
    portable hash, deterministic pseudo-random within-shard order via
    the independent ``:ord`` salt, exclusive token prefix-sum. BOTH
    windows partition by shard: the single shuffle is hash(shard)."""
    from .dedup import _portable_token_hash

    sid = F.col("doc_id").cast("string")
    base = docs.select(
        "doc_id",
        "n_tokens",
        (_portable_token_hash(F.concat(sid, F.lit(":shard"))) % _SHARD_COUNT)
        .cast("long")
        .alias("shard"),
        _portable_token_hash(F.concat(sid, F.lit(":ord"))).alias("ohash"),
    )
    w = W.partitionBy("shard").orderBy("ohash", "doc_id")
    return base.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
        "n_tokens",
        F.coalesce(
            F.sum("n_tokens").over(w.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        )
        .cast("long")
        .alias("tok_offset"),
    )


@query(
    "export_train_shards",
    tables=("documents",),
    oracle=f"""
WITH t AS (
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS BIGINT) AS n_tokens,
           (CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':shard')),
                        1, 15)) AS BIGINT) % 2147483647) % {_SHARD_COUNT} AS shard,
           CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':ord')),
                       1, 15)) AS BIGINT) % 2147483647 AS ohash
    FROM documents
)
SELECT doc_id,
       CAST(shard AS BIGINT) AS shard,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS pos,
       n_tokens,
       CAST(COALESCE(SUM(n_tokens) OVER (
           w ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
       ), 0) AS BIGINT) AS tok_offset
FROM t
WINDOW w AS (PARTITION BY shard ORDER BY ohash, doc_id)
""",
)
def export_train_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard export manifest: every document gets
    a shard id (hash-bucket), a within-shard position under a
    deterministic pseudo-random order (an independent salted hash — the
    'global shuffle' a dataloader needs, reproducible across runs and
    repartitioning, unlike rng orderBy), and its within-shard token
    offset. This is the manifest that turns a curated corpus into N
    shard files a trainer streams with exact resume offsets.

    Scale shape: shard assignment is map-only; BOTH windows partition by
    shard, so the single shuffle is hash(shard) and each shard sorts in
    parallel — there is no global sort and no unpartitioned window. At
    100 TB, _SHARD_COUNT is chosen ~#output files (thousands), bounding
    every window partition at corpus/#shards; the same plan then IS the
    writer's per-file ordering (repartition(shard).sortWithinPartitions),
    so the manifest and the export share one shuffle. Uses the portable
    60-bit md5 hash (`_portable_token_hash`) with independent `:shard` /
    `:ord` salts so DuckDB replays both the bucketing and the shuffle
    order exactly."""
    t = load_tables(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), r"\s+")
    return shard_manifest_frame(
        t.documents.select(
            "doc_id",
            F.size(F.filter(toks, lambda x: x != ""))
            .cast("long")
            .alias("n_tokens"),
        )
    )

# Composed-twin derived batch fixture (r14): the raw corpus carries no
# natural PII and every doc passes the quality bar, so a twin over raw
# batches would witness the admission semantics but leave the quality
# and redaction STAGES of the composition with zero hash signal (the
# r12 lesson: measure that the fixture actually exercises the semantic
# the entry exists to pin). The injection is deterministic and
# SQL-replayable, the same derived-input idiom as `text_pii_redact`'s
# (email/phone suffixes reuse its exact construction): docs with
# doc_id % _QFAIL_MOD == 0 have their whitespace stripped (one giant
# token -> fails the >= 5-token quality rule -> must vanish from the
# manifest AND never reach the index), the rest get PII appended on the
# text_pii_redact mods. Measured at sf0.01: 12 quality-drops per batch,
# 69 within-batch dup verdicts, 2 batch-1 flips on index growth alone,
# and 96 batch-0 ledger rows that differ if signatures are computed on
# PRE-redaction text — every composed stage carries driver-hash signal.
_QFAIL_MOD = 17


def _twin_inject(docs: DataFrame) -> DataFrame:
    """Spark side of the composed-twin batch derivation (see
    `_QFAIL_MOD`); the oracle's ``inj`` CTE replays it verbatim."""
    d = F.col("doc_id")
    pii = F.concat(
        F.col("text"),
        F.when(
            d % _PII_EMAIL_MOD == 0,
            F.concat(
                F.lit(" contact user"),
                d.cast("string"),
                F.lit("@mail.example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % _PII_PHONE_MOD == 0,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((d % 1000).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad(((d * 3) % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    return docs.select(
        "doc_id",
        F.when(d % _QFAIL_MOD == 0, F.regexp_replace("text", r"\s+", ""))
        .otherwise(pii)
        .alias("text"),
    )


def _curate_twin_oracle() -> str:
    """DuckDB twin of the TWO-batch composed curation run: inject ->
    quality-filter -> redact (``rq``), sign the redacted batches
    together with the raw corpus through ONE `_minhash_sig_ctes` stack
    (``src`` — the residue classes are disjoint, so one sigs CTE serves
    both sides; this is the ``source`` hook staged in r13), replay the
    sequential index growth via the SHARED `_admission_m01_ctes`
    unroll, then build each batch's shard/pack manifest over its
    admitted set with the export_train_shards window shape."""
    from .dedup import (
        _ADMIT_BATCHES,
        _ADMIT_CORPUS_RES,
        _admission_m01_ctes,
        _minhash_sig_ctes,
    )

    cor = _ADMIT_CORPUS_RES
    b1 = ", ".join(map(str, _ADMIT_BATCHES[1]))
    ntok = "len(string_split_regex(lower(text), '\\s+'))"
    man = """SELECT doc_id, CAST(shard AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS pos, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (
               w ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS tok_offset
    FROM mtok WHERE doc_id IN (SELECT doc_id FROM {adm})
    WINDOW w AS (PARTITION BY shard ORDER BY ohash, doc_id)"""
    final = """SELECT doc_id, CAST({b} AS BIGINT) AS batch, shard, pos, n_tokens,
       tok_offset, CAST(tok_offset // {cap} AS BIGINT) AS bin_id
FROM man{b}"""
    return f"""WITH inj AS (
    SELECT doc_id,
           CASE WHEN doc_id % {_QFAIL_MOD} = 0
                THEN regexp_replace(text, '\\s+', '', 'g')
                ELSE concat(text,
                    CASE WHEN doc_id % {_PII_EMAIL_MOD} = 0
                         THEN concat(' contact user', CAST(doc_id AS VARCHAR),
                                     '@mail.example.com')
                         ELSE '' END,
                    CASE WHEN doc_id % {_PII_PHONE_MOD} = 0
                         THEN concat(' call 555-',
                                     lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0'),
                                     '-',
                                     lpad(CAST((doc_id * 3) % 10000 AS VARCHAR), 4, '0'))
                         ELSE '' END)
           END AS text
    FROM documents WHERE doc_id % 5 <> {cor}
),
rq AS (
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
               '{_PII_EMAIL_RE}', '[EMAIL]', 'g'),
               '{_PII_PHONE_RE}', '[PHONE]', 'g'),
               '{_PII_ID_RE}', '[ID]', 'g') AS text
    FROM inj
    WHERE {ntok} >= {_QUALITY_MIN_TOKENS}
      AND CAST(length(text) AS DOUBLE) / {ntok} < {_QUALITY_MAX_CHARS_PER_TOKEN}
),
src AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 5 = {cor}
    UNION ALL
    SELECT doc_id, text FROM rq
),
{_minhash_sig_ctes(source='src')},
{_admission_m01_ctes()},
adm1 AS (
    SELECT doc_id FROM sigs
    WHERE doc_id % 5 IN ({b1}) AND doc_id NOT IN (SELECT qid FROM m1)
),
mtok AS (
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS BIGINT) AS n_tokens,
           (CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':shard')),
                        1, 15)) AS BIGINT) % 2147483647) % {_SHARD_COUNT} AS shard,
           CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':ord')),
                       1, 15)) AS BIGINT) % 2147483647 AS ohash
    FROM rq
),
man0 AS (
    {man.format(adm='adm0')}
),
man1 AS (
    {man.format(adm='adm1')}
)
{final.format(b=0, cap=_PACK_CAPACITY)}
UNION ALL
{final.format(b=1, cap=_PACK_CAPACITY)}"""


@query(
    "curate_admission_twin",
    tables=("documents",),
    oracle=_curate_twin_oracle(),
)
def curate_admission_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the COMPOSED curation pipeline run twice against
    one growing index (VERDICT r13 item 1's done-bar): two derived
    micro-batches (`_twin_inject` over the `_ADMIT_BATCHES` residues)
    flow through `curate_admission_pipeline` — quality filter, PII
    redact, near-dup ADMISSION (within-batch self-probe + index
    growth), shard/pack manifest — against a per-invocation CLONE of
    the session-cached admission corpus index. Output: both batches'
    training manifests.

    The hash witnesses every composed semantic at once: a
    quality-failing doc vanishes from the manifest and never enters
    the index; a within-batch near-dup loses to its smaller-id batch
    member; a batch-1 near-dup of a batch-0 ADMISSION drops because
    the index grew between the two pipeline calls (while a batch-1
    near-dup of a batch-0 REJECT does not — rejects never enter the
    index); signatures describe the REDACTED text; and every admitted
    doc's shard/pos/tok_offset/bin_id shifts if any of those
    memberships is wrong. The two manifests are collectable in one
    action AFTER both calls because the pipeline pins its per-call
    state (the admission-contract checkpoints) — batch 0's manifest
    cannot see batch 1's index appends."""
    from ..tables import clone_parquet_dir
    from .dedup import _ADMIT_BATCHES, admission_corpus_index_for

    t = load_tables(spark, sf_dir, "documents")
    path = clone_parquet_dir(admission_corpus_index_for(spark, sf_dir))
    out = []
    for b, residues in enumerate(_ADMIT_BATCHES):
        batch = _twin_inject(
            t.documents.filter((F.col("doc_id") % 5).isin(*residues))
        )
        man = curate_admission_pipeline(spark, path, batch)
        out.append(
            man.select(
                "doc_id",
                F.lit(b).cast("long").alias("batch"),
                "shard",
                "pos",
                "n_tokens",
                "tok_offset",
                "bin_id",
            )
        )
    return out[0].unionByName(out[1])


def _curate_model_oracle() -> str:
    """DuckDB twin of the MODEL-STAGE composed curation run (VERDICT
    r17 item 3): the trained quality classifier's drop decisions are
    replayed via the DETERMINISTIC construction labels — the derived
    task is separable by construction (fixture-measured margins at
    sf0.01: min p(degraded|odd) 0.83 vs max p(degraded|even) 0.32, a
    2.5x band around the 0.5 bar), so 'model drops doc' == 'doc_id is
    odd' is the exact SQL replay of what the fitted model does, and
    the in-query ``model_matches_labels`` boolean witnesses that
    equality independently. Everything else is the
    `_curate_twin_oracle` machinery verbatim: `degrade_documents`'s
    junk-substitution + truncation reconstructed in SQL (DuckDB lambda
    indexes are 1-based where Spark's transform index is 0-based),
    heuristic quality filter, PII redaction, ONE `_minhash_sig_ctes`
    stack over corpus + surviving batch, the shared
    `_admission_m01_ctes` growth unroll (only the batch-0 arm is
    populated — sigs holds no residue-2/3 docs), and the
    export_train_shards manifest window."""
    from .dedup import (
        _ADMIT_BATCHES,
        _ADMIT_CORPUS_RES,
        _admission_m01_ctes,
        _minhash_sig_ctes,
    )

    cor = _ADMIT_CORPUS_RES
    b0 = ", ".join(map(str, _ADMIT_BATCHES[0]))
    ntok = "len(string_split_regex(lower(text), '\\s+'))"
    return f"""WITH lab AS (
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 1 THEN array_to_string(list_slice(
                    list_transform(
                        list_filter(string_split_regex(lower(text), '\\s+'),
                                    t -> t <> ''),
                        (x, i) -> CASE WHEN (i - 1) % 3 = 2
                                       THEN concat('zq', CAST((i - 1) % 8 AS VARCHAR))
                                       ELSE x END),
                    1, 24), ' ')
                ELSE text END AS text
    FROM documents WHERE doc_id % 5 IN ({b0})
),
rq AS (
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
               '{_PII_EMAIL_RE}', '[EMAIL]', 'g'),
               '{_PII_PHONE_RE}', '[PHONE]', 'g'),
               '{_PII_ID_RE}', '[ID]', 'g') AS text
    FROM lab
    WHERE {ntok} >= {_QUALITY_MIN_TOKENS}
      AND CAST(length(text) AS DOUBLE) / {ntok} < {_QUALITY_MAX_CHARS_PER_TOKEN}
      AND doc_id % 2 = 0
),
src AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 5 = {cor}
    UNION ALL
    SELECT doc_id, text FROM rq
),
{_minhash_sig_ctes(source='src')},
{_admission_m01_ctes()},
mtok AS (
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS BIGINT) AS n_tokens,
           (CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':shard')),
                        1, 15)) AS BIGINT) % 2147483647) % {_SHARD_COUNT} AS shard,
           CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':ord')),
                       1, 15)) AS BIGINT) % 2147483647 AS ohash
    FROM rq
),
man AS (
    SELECT doc_id, CAST(shard AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS pos, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (
               w ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS tok_offset
    FROM mtok WHERE doc_id IN (SELECT doc_id FROM adm0)
    WINDOW w AS (PARTITION BY shard ORDER BY ohash, doc_id)
)
SELECT doc_id, shard, pos, n_tokens, tok_offset,
       CAST(tok_offset // {_PACK_CAPACITY} AS BIGINT) AS bin_id,
       TRUE AS model_matches_labels
FROM man"""


@query(
    "curate_model_twin",
    tables=("documents",),
    oracle=_curate_model_oracle(),
)
def curate_model_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRAINED quality model driven through the composed curation
    pipeline (VERDICT r17 item 3 — `curate_admission_pipeline`'s
    ``quality_model=`` stage was pytest-covered but never
    driver-hash-verified): train `quality_classifier_train` on the
    derived-label corpus over residues 2/3, then run ONE batch
    (residues 0/1, texts from `degrade_documents` so the model has
    real degradations to drop) through the full pipeline — heuristic
    quality filter -> MODEL filter (map-only broadcast scoring,
    p_degraded >= 0.5 dropped) -> PII redact -> near-dup admission
    against a clone of the session corpus index -> shard/pack
    manifest. The oracle replays the model's drops as ``doc_id % 2 =
    1`` (the construction labels; margins in `_curate_model_oracle`),
    so every manifest row's existence and offsets witness the model
    stage's decisions inside the composed plan, and
    ``model_matches_labels`` asserts the decision==label equality
    in-query over the heuristic-surviving batch — a misclassification
    flips both the boolean and the admitted set."""
    from ..tables import clone_parquet_dir
    from .dedup import _ADMIT_BATCHES, admission_corpus_index_for
    from .quality_model import (
        degrade_documents,
        quality_classifier_score,
        quality_classifier_train,
    )

    t = load_tables(spark, sf_dir, "documents")
    labeled = degrade_documents(t.documents)
    model = quality_classifier_train(
        labeled.filter((F.col("doc_id") % 5).isin(2, 3))
    )
    batch = labeled.filter(
        (F.col("doc_id") % 5).isin(*_ADMIT_BATCHES[0])
    ).select("doc_id", F.col("qtext").alias("text"))
    path = clone_parquet_dir(admission_corpus_index_for(spark, sf_dir))
    man = curate_admission_pipeline(spark, path, batch, quality_model=model)
    # independent in-query judge: over the heuristic-surviving batch,
    # the model's >= 0.5 decision equals the construction label on
    # EVERY doc (one map-only rescore + one O(1) aggregate)
    toks = F.split(F.lower("text"), r"\s+")
    heur = batch.select(
        "doc_id",
        "text",
        F.size(toks).cast("long").alias("ntr"),
        F.length("text").cast("long").alias("nch"),
    ).filter(quality_pass(F.col("ntr"), F.col("nch")))
    flags = quality_classifier_score(model, heur, text_col="text").agg(
        (
            F.sum(
                F.when(
                    (F.col("p_degraded") >= 0.5)
                    != (F.pmod("doc_id", F.lit(2)) == 1),
                    1,
                ).otherwise(0)
            )
            == 0
        ).alias("model_matches_labels")
    )
    return man.select(
        "doc_id", "shard", "pos", "n_tokens", "tok_offset", "bin_id"
    ).crossJoin(F.broadcast(flags))


# --- statistical LM quality filtering (r18-built, r19-registered) ----------
# The third member of the curation-filter triad (heuristic
# `text_quality_score`, discriminative `quality_classifier_*`, and this
# STATISTICAL one): a bigram LM with add-k smoothing trained on a
# reference slice, every document scored by per-bigram cross-entropy —
# the CCNet (Wenzek et al. 2020) / Gopher perplexity-filter shape.
# Implemented + parity-tested r18 (tests/test_text_perplexity.py runs
# the oracle through DuckDB exactly as the driver would); the @query
# registrations landed r19 — deferred one round purely for the EDF
# <= +3/round catalog-growth guidance (VERDICT r17 item 7; r18 had
# already added its 3).

#: Add-k smoothing mass.
_PPLX_K = 0.5
#: Drop bar on the ROUNDED cross-entropy (nats/bigram). Comparisons
#: happen on round(xent, 6) in BOTH engines, so the last-ulp libm ln()
#: wobble cannot flip the boolean unless the rounded values already
#: differ (which the hash would catch first). Fixture-measured (DuckDB
#: quantiles over the oracle): xent spans ~3.28-3.64 at sf0.001/0.01
#: and ~3.35-3.89 at sf0.1 (the 31-word Zipf vocabulary plus k*V
#: smoothing mass compresses the range); 3.45 drops the
#: high-perplexity tail (~6% / ~6% / ~3%) with both classes populated
#: at every fixture SF (non-vacuity pinned in the pytest).
_PPLX_BAR = 3.45
#: Reference (training) slice: doc_id % 5 != 0 — disjoint from nothing
#: (every doc is scored, including reference docs: the CCNet shape
#: scores the whole corpus against the reference model).
_PPLX_TRAIN_RES = 0


def _doc_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, w1, w2) — one row per adjacent token pair, the shared
    frame both counting and scoring read. Tokenization is the corpus
    standard (lowercased, whitespace-split, empties dropped); the
    bigram explode is the `bpe_train_merges` zip_with-slices idiom
    over the materialized token array."""
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    return (
        docs.select("doc_id", toks.alias("ws"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "zip_with(slice(ws, 1, size(ws) - 1),"
                    "         slice(ws, 2, size(ws) - 1),"
                    "         (a, b) -> struct(a AS w1, b AS w2))"
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


_LM_META_SIDECAR = "_lm_meta.json"


def save_perplexity_lm(spark: SparkSession, name: str, lm, n_buckets: int = 8) -> None:
    """Persist a trained bigram LM so it amortizes across scoring runs
    and sessions (r19 — the persistence path behind the 100 TB posture
    the perplexity docstrings claim): the count tables land as MANAGED
    TABLES BUCKETED BY ``w1`` (``{name}_bigrams`` (w1, w2, cb) and
    ``{name}_contexts`` (w1, cl) — `write_bucketed`, the co-located
    layout, so a production-vocab scoring join on w1 reuses the
    on-disk hash partitioning instead of exchanging the counts per
    run), and the scalar vocabulary size V — one row, the bounded
    collect class — rides a ``_lm_meta.json`` sidecar in the bigrams
    table dir (the `_centroids.json` idiom). At fixture scale Catalyst
    broadcasts the tiny tables anyway; the bucketing is the contract
    that survives when V no longer fits a broadcast."""
    import json

    from ..tables import managed_table_dir, write_bucketed

    bigc, unic, v = lm
    write_bucketed(bigc, f"{name}_bigrams", "w1", n_buckets)
    write_bucketed(unic, f"{name}_contexts", "w1", n_buckets)
    vval = int(v.collect()[0]["v"])  # bounded: the one-row V aggregate
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(
        f"{managed_table_dir(spark, f'{name}_bigrams')}/{_LM_META_SIDECAR}"
    )
    out = p.getFileSystem(spark._jsc.hadoopConfiguration()).create(p, True)
    try:
        out.write(
            bytearray(
                json.dumps({"version": 1, "v": vval, "k": _PPLX_K}).encode(
                    "utf-8"
                )
            )
        )
    finally:
        out.close()


def load_perplexity_lm(spark: SparkSession, name: str):
    """The `perplexity_counts` triple back from a saved LM — STRICT
    (the `load_semdedup_centers` discipline): missing tables or a
    missing/foreign-version sidecar raise, because scoring against a
    partial LM (counts without their V, or one count table of two)
    produces plausible, wrong cross-entropies with no error anywhere
    downstream. The sidecar is written LAST by `save_perplexity_lm`,
    so its presence witnesses a complete publish."""
    import json

    from ..tables import managed_table_dir

    for suffix in ("_bigrams", "_contexts"):
        if not spark.catalog.tableExists(f"{name}{suffix}"):
            raise ValueError(
                f"perplexity LM '{name}' is missing its {suffix} table — "
                "save with save_perplexity_lm first"
            )
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(
        f"{managed_table_dir(spark, f'{name}_bigrams')}/{_LM_META_SIDECAR}"
    )
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        raise ValueError(
            f"perplexity LM '{name}' has no {_LM_META_SIDECAR} sidecar — "
            "the save crashed before publishing V; re-save instead of "
            "guessing the vocabulary size"
        )
    reader = jvm.java.io.BufferedReader(
        jvm.java.io.InputStreamReader(fs.open(p), "UTF-8")
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
    meta = json.loads("".join(lines))
    if meta.get("version") != 1:
        raise ValueError(
            f"unsupported perplexity LM sidecar version {meta.get('version')!r}"
        )
    if meta.get("k") != _PPLX_K:
        # the counts are k-independent, but every xent computed from
        # them uses the module's CURRENT k — a model saved under a
        # different smoothing constant would silently score on a
        # different estimate than the one it was validated with
        raise ValueError(
            f"perplexity LM '{name}' was saved with k={meta.get('k')!r} "
            f"but this engine smooths with k={_PPLX_K}; retrain/re-save "
            "rather than mixing smoothing constants"
        )
    v = spark.range(1).select(F.lit(int(meta["v"])).cast("long").alias("v"))
    return (
        spark.table(f"{name}_bigrams"),
        spark.table(f"{name}_contexts"),
        v,
    )


def _perplexity_oracle() -> str:
    """DuckDB twin of `text_perplexity_bigram` — counts CTEs + the
    same smoothed -ln, rounded to 6dp before the bar comparison (the
    float-parity policy: O(1..10)-magnitude ratios, libm last-ulp
    differences die at 6dp)."""
    k, bar, res = _PPLX_K, _PPLX_BAR, _PPLX_TRAIN_RES
    return f"""
WITH d AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws
    FROM documents
),
big AS (
    SELECT doc_id, ws[pos] AS w1, ws[pos + 1] AS w2
    FROM d, unnest(generate_series(1, len(ws) - 1)) AS g(pos)
    WHERE len(ws) >= 2
),
bigc AS (
    SELECT w1, w2, COUNT(*) AS cb FROM big
    WHERE doc_id % 5 <> {res} GROUP BY w1, w2
),
unic AS (
    SELECT w1, COUNT(*) AS cl FROM big
    WHERE doc_id % 5 <> {res} GROUP BY w1
),
v AS (
    SELECT COUNT(DISTINCT w) AS v
    FROM (SELECT unnest(ws) AS w FROM d WHERE doc_id % 5 <> {res})
),
per_doc AS (
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(CASE WHEN v.v > 0
                          THEN -ln((COALESCE(bc.cb, 0) + {k})
                                   / (COALESCE(u.cl, 0) + {k} * v.v))
                     END), 6) AS xent
    FROM big b
    LEFT JOIN bigc bc ON bc.w1 = b.w1 AND bc.w2 = b.w2
    LEFT JOIN unic u ON u.w1 = b.w1
    CROSS JOIN v
    GROUP BY b.doc_id
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       COALESCE(p.n_bigrams, 0) AS n_bigrams,
       p.xent,
       COALESCE(p.xent > {bar}, FALSE) AS "drop"
FROM d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
"""


@query(
    "text_perplexity_bigram",
    tables=("documents",),
    oracle=_perplexity_oracle(),
)
def text_perplexity_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-based quality scoring: train an add-k bigram LM on
    the reference slice (doc_id % 5 != _PPLX_TRAIN_RES), score EVERY
    document's mean per-bigram cross-entropy in nats, and flag the
    high-perplexity tail (round(xent,6) > _PPLX_BAR) for dropping.

    Estimator (all counts integers, fully SQL-replayable):
      P(w2|w1) = (C(w1,w2) + k) / (Cl(w1) + k * V)
    with C the reference bigram counts, Cl the reference LEFT-CONTEXT
    counts (w1 occurrences in non-final positions — so the smoothed
    conditional normalizes exactly over the V-word vocabulary), V the
    reference's distinct-token count (all positions), k = 0.5. Unseen
    words/pairs fall back to the smoothing mass — no UNK machinery,
    exactly the additive estimate.

    Scale shape: TWO groupBys over the reference slice build the count
    tables (vocab- and vocab^2-bounded — at 100 TB these persist
    bucketed by w1 like the SemDedup assignment and amortize across
    scoring runs); scoring is the shared `_doc_bigrams` pass joined to
    the counts (Catalyst broadcasts the fixture-sized tables; at
    production vocab the join shuffles on w1, co-located if the counts
    are bucketed) and ONE per-doc aggregate. Docs with < 2 tokens have
    no bigrams: n_bigrams = 0, NULL xent, drop = false — a length
    filter's job, not a perplexity's (both engines agree on the NULL).

    Output: (doc_id, n_bigrams, xent ROUND 6, drop)."""
    t = load_tables(spark, sf_dir, "documents")
    lm = perplexity_counts(
        t.documents.filter(F.col("doc_id") % 5 != _PPLX_TRAIN_RES)
    )
    per_doc = perplexity_scores(t.documents, lm)
    # left join back to ALL docs so bigram-less documents keep a row
    return (
        t.documents.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.coalesce(F.col("n_bigrams"), F.lit(0))
            .cast("bigint")
            .alias("n_bigrams"),
            "xent",
            F.coalesce(F.col("xent") > _PPLX_BAR, F.lit(False)).alias("drop"),
        )
    )


@query(
    "text_perplexity_persisted",
    tables=("documents",),
    oracle=(
        "SELECT q.*, TRUE AS persisted_match FROM ("
        + _perplexity_oracle()
        + ") q"
    ),
)
def text_perplexity_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`text_perplexity_bigram` scored through the PERSISTED LM (r20,
    VERDICT r19 item 6 — the `dedup_semantic_trained` persisted-verdict
    precedent): train the bigram LM, publish it via `save_perplexity_lm`
    (w1-BUCKETED managed tables + the `_lm_meta.json` sidecar), load it
    back via the STRICT `load_perplexity_lm`, and score every document
    from the LOADED tables — so the hashed plan actually READS the
    bucketed on-disk layout the 100 TB posture is built on, not the
    in-memory counts. Each row also carries ``persisted_match``: the
    in-query per-doc judge that the loaded-path (n_bigrams, xent)
    null-safe-equals the in-memory-path values — integer counts
    round-trip parquet exactly and both paths take -ln over identical
    integers, so any divergence (a bucket-routing drop, a stale
    sidecar V, a partial publish) flips the row and the hash. The
    oracle recomputes the scores from scratch and pins the judge as
    constant TRUE.

    Scale shape: identical to `text_perplexity_bigram` except the
    count-table scans come from the bucketed tables — at production
    vocab the w1 scoring join reuses the on-disk hash layout instead
    of exchanging the counts per run (at fixture scale Catalyst
    broadcasts them; the bucketing is the surviving contract). The
    save adds two small bucketed writes per invocation — the artifact
    publish cost the entry exists to exercise."""
    t = load_tables(spark, sf_dir, "documents")
    lm = perplexity_counts(
        t.documents.filter(F.col("doc_id") % 5 != _PPLX_TRAIN_RES)
    )
    save_perplexity_lm(spark, "engine_pplx_lm", lm)
    loaded = load_perplexity_lm(spark, "engine_pplx_lm")
    per_doc = perplexity_scores(t.documents, loaded)
    mem = perplexity_scores(t.documents, lm).select(
        "doc_id",
        F.col("n_bigrams").alias("mem_n_bigrams"),
        F.col("xent").alias("mem_xent"),
    )
    return (
        t.documents.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .join(mem, "doc_id", "left")
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.coalesce(F.col("n_bigrams"), F.lit(0))
            .cast("bigint")
            .alias("n_bigrams"),
            "xent",
            F.coalesce(F.col("xent") > _PPLX_BAR, F.lit(False)).alias("drop"),
            (
                F.col("xent").eqNullSafe(F.col("mem_xent"))
                & F.coalesce(F.col("n_bigrams"), F.lit(0)).eqNullSafe(
                    F.coalesce(F.col("mem_n_bigrams"), F.lit(0))
                )
            ).alias("persisted_match"),
        )
    )


def perplexity_counts(ref_docs: DataFrame):
    """(bigc, unic, v) — the bigram LM's count tables over a reference
    corpus, the ONE copy shared by `text_perplexity_bigram` and the
    pipeline's optional perplexity stage (the `packed_offsets`
    one-copy rule). At 100 TB these persist bucketed by w1 and
    amortize across scoring runs."""
    big = _doc_bigrams(ref_docs)
    bigc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    unic = big.groupBy("w1").agg(F.count(F.lit(1)).alias("cl"))
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    v = ref_docs.select(F.explode(toks).alias("w")).agg(
        F.count_distinct("w").alias("v")
    )
    return bigc, unic, v


def perplexity_scores(docs: DataFrame, lm) -> DataFrame:
    """(doc_id, n_bigrams, xent ROUND 6) per document WITH at least
    one bigram — callers owning a full-corpus report left-join back to
    their doc set (`text_perplexity_bigram`); the pipeline stage
    treats a missing row as not-droppable. ``lm`` is the
    `perplexity_counts` triple."""
    bigc, unic, v = lm
    scored = (
        _doc_bigrams(docs)
        .join(bigc, ["w1", "w2"], "left")
        .join(unic, "w1", "left")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            # v = 0 (EMPTY reference slice) leaves the estimate
            # undefined — NULL, never a division by zero (ANSI mode
            # would throw; DuckDB would produce inf): every doc then
            # reports NULL xent / drop=false, the honest "no model"
            # answer, mirrored in the oracle's CASE
            F.when(
                F.col("v") > 0,
                -F.log(
                    (F.coalesce(F.col("cb"), F.lit(0)) + F.lit(_PPLX_K))
                    / (
                        F.coalesce(F.col("cl"), F.lit(0))
                        + F.lit(_PPLX_K) * F.col("v")
                    )
                ),
            ).alias("nll"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("nll"), 6).alias("xent"),
    )


def _curate_pplx_oracle() -> str:
    """DuckDB twin of `curate_perplexity_twin` (r18-built; the @query
    registration rides r19's entry budget): the LM's drop decisions are
    fully SQL-replayable — unlike the MLlib model stage, no label
    indirection is needed; the oracle recomputes the xent itself. The
    rest is the `_curate_model_oracle` machinery verbatim: heuristic
    quality filter, PII redaction replay, ONE `_minhash_sig_ctes`
    stack over corpus + surviving batch, the shared
    `_admission_m01_ctes` growth unroll, the manifest window — plus
    the admitted doc's rounded xent as a value-level float column."""
    from .dedup import (
        _ADMIT_BATCHES,
        _ADMIT_CORPUS_RES,
        _admission_m01_ctes,
        _minhash_sig_ctes,
    )

    k, bar = _PPLX_K, _PPLX_BAR
    cor = _ADMIT_CORPUS_RES
    b0 = ", ".join(map(str, _ADMIT_BATCHES[0]))
    ntok = "len(string_split_regex(lower(text), '\\s+'))"
    return f"""WITH dd AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws
    FROM documents
),
bg AS (
    SELECT doc_id, ws[pos] AS w1, ws[pos + 1] AS w2
    FROM dd, unnest(generate_series(1, len(ws) - 1)) AS g(pos)
    WHERE len(ws) >= 2
),
lm_bigc AS (
    SELECT w1, w2, COUNT(*) AS cb FROM bg WHERE doc_id % 5 IN (2, 3)
    GROUP BY w1, w2
),
lm_unic AS (
    SELECT w1, COUNT(*) AS cl FROM bg WHERE doc_id % 5 IN (2, 3) GROUP BY w1
),
lm_v AS (
    SELECT COUNT(DISTINCT w) AS v
    FROM (SELECT unnest(ws) AS w FROM dd WHERE doc_id % 5 IN (2, 3))
),
xe AS (
    SELECT b.doc_id,
           ROUND(AVG(CASE WHEN v.v > 0
                          THEN -ln((COALESCE(bc.cb, 0) + {k})
                                   / (COALESCE(u.cl, 0) + {k} * v.v))
                     END), 6) AS xent
    FROM bg b
    LEFT JOIN lm_bigc bc ON bc.w1 = b.w1 AND bc.w2 = b.w2
    LEFT JOIN lm_unic u ON u.w1 = b.w1
    CROSS JOIN lm_v v
    WHERE b.doc_id % 5 IN ({b0})
    GROUP BY b.doc_id
),
rq AS (
    SELECT d.doc_id,
           regexp_replace(regexp_replace(regexp_replace(d.text,
               '{_PII_EMAIL_RE}', '[EMAIL]', 'g'),
               '{_PII_PHONE_RE}', '[PHONE]', 'g'),
               '{_PII_ID_RE}', '[ID]', 'g') AS text
    FROM documents d LEFT JOIN xe ON xe.doc_id = d.doc_id
    WHERE d.doc_id % 5 IN ({b0})
      AND {ntok} >= {_QUALITY_MIN_TOKENS}
      AND CAST(length(text) AS DOUBLE) / {ntok} < {_QUALITY_MAX_CHARS_PER_TOKEN}
      AND NOT COALESCE(xe.xent > {bar}, FALSE)
),
src AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 5 = {cor}
    UNION ALL
    SELECT doc_id, text FROM rq
),
{_minhash_sig_ctes(source='src')},
{_admission_m01_ctes()},
mtok AS (
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS BIGINT) AS n_tokens,
           (CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':shard')),
                        1, 15)) AS BIGINT) % 2147483647) % {_SHARD_COUNT} AS shard,
           CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':ord')),
                       1, 15)) AS BIGINT) % 2147483647 AS ohash
    FROM rq
),
man AS (
    SELECT doc_id, CAST(shard AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS pos, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (
               w ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS tok_offset
    FROM mtok WHERE doc_id IN (SELECT doc_id FROM adm0)
    WINDOW w AS (PARTITION BY shard ORDER BY ohash, doc_id)
)
SELECT m.doc_id, m.shard, m.pos, m.n_tokens, m.tok_offset,
       CAST(m.tok_offset // {_PACK_CAPACITY} AS BIGINT) AS bin_id,
       xe.xent
FROM man m JOIN xe ON xe.doc_id = m.doc_id"""


@query(
    "curate_perplexity_twin",
    tables=("documents",),
    oracle=_curate_pplx_oracle(),
)
def curate_perplexity_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STATISTICAL-LM filter driven through the composed curation
    pipeline (r18-built, REGISTERED r19 — the exact
    quality_model= -> curate_model_twin arc one round later): train
    the bigram LM on residues 2/3 (`perplexity_counts`), run the
    residue-0/1 batch through the FULL pipeline — heuristic quality
    filter -> PERPLEXITY filter (round(xent,6) > _PPLX_BAR drops;
    fixture-measured 86/200 batch docs at sf0.01, both classes
    populated) -> PII redact -> near-dup admission against a clone of
    the session corpus index -> shard/pack manifest. Unlike the model
    twin, the drop decisions are DIRECTLY SQL-replayable (integer
    counts + ln + 6dp rounding), so the oracle recomputes them with no
    label indirection, and each admitted doc carries its rounded xent
    as a value-level float column the hash pins."""
    from ..tables import clone_parquet_dir
    from .dedup import _ADMIT_BATCHES, admission_corpus_index_for

    t = load_tables(spark, sf_dir, "documents")
    lm = perplexity_counts(
        t.documents.filter((F.col("doc_id") % 5).isin(2, 3))
    )
    batch = t.documents.filter(
        (F.col("doc_id") % 5).isin(*_ADMIT_BATCHES[0])
    ).select("doc_id", "text")
    path = clone_parquet_dir(admission_corpus_index_for(spark, sf_dir))
    man = curate_admission_pipeline(spark, path, batch, perplexity=lm)
    xe = perplexity_scores(batch, lm).select("doc_id", "xent")
    return (
        man.select(
            "doc_id", "shard", "pos", "n_tokens", "tok_offset", "bin_id"
        )
        .join(xe, "doc_id")
        .select(
            "doc_id", "shard", "pos", "n_tokens", "tok_offset", "bin_id",
            "xent",
        )
    )


#: Drop bar for the STREAMING perplexity twin, whose LM trains on the
#: admission CORPUS slice (doc_id % 5 == _ADMIT_CORPUS_RES — the
#: natural production reference: score arrivals against what the index
#: already holds) rather than `_PPLX_BAR`'s %5!=0 slice. The smaller
#: reference shifts the xent distribution up (smoothing mass weighs
#: more), so the bar moves with it: fixture-measured (DuckDB quantiles)
#: drops 36-41/200 per batch at sf0.001/0.01 and 19-23/2000 at sf0.1 —
#: both classes populated in BOTH batches at every fixture SF.
_STREAM_PPLX_BAR = 3.55


def _stream_pplx_oracle() -> str:
    """DuckDB twin of `stream_pplx_curation_twin`: the
    `_curate_twin_oracle` two-batch growth machinery (no injection —
    raw batches, like the pplx batch twin) with the LM CTEs of
    `_curate_pplx_oracle` re-pointed at the CORPUS reference slice,
    the xent drop predicate in ``rq``, and per-batch manifests over
    each admitted set — the exact frames `foreach_batch_curation`
    rebuilds from its committed sink partitions."""
    from .dedup import (
        _ADMIT_BATCHES,
        _ADMIT_CORPUS_RES,
        _admission_m01_ctes,
        _minhash_sig_ctes,
    )

    k, bar = _PPLX_K, _STREAM_PPLX_BAR
    cor = _ADMIT_CORPUS_RES
    b1 = ", ".join(map(str, _ADMIT_BATCHES[1]))
    man = """SELECT doc_id, CAST(shard AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS pos, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (
               w ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS tok_offset
    FROM mtok WHERE doc_id IN (SELECT doc_id FROM {adm})
    WINDOW w AS (PARTITION BY shard ORDER BY ohash, doc_id)"""
    final = """SELECT m.doc_id, CAST({b} AS BIGINT) AS batch, m.shard, m.pos,
       m.n_tokens, m.tok_offset,
       CAST(m.tok_offset // {cap} AS BIGINT) AS bin_id, xe.xent
FROM man{b} m JOIN xe ON xe.doc_id = m.doc_id"""
    ntok = "len(string_split_regex(lower(text), '\\s+'))"
    return f"""WITH dd AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws
    FROM documents
),
bg AS (
    SELECT doc_id, ws[pos] AS w1, ws[pos + 1] AS w2
    FROM dd, unnest(generate_series(1, len(ws) - 1)) AS g(pos)
    WHERE len(ws) >= 2
),
lm_bigc AS (
    SELECT w1, w2, COUNT(*) AS cb FROM bg WHERE doc_id % 5 = {cor}
    GROUP BY w1, w2
),
lm_unic AS (
    SELECT w1, COUNT(*) AS cl FROM bg WHERE doc_id % 5 = {cor} GROUP BY w1
),
lm_v AS (
    SELECT COUNT(DISTINCT w) AS v
    FROM (SELECT unnest(ws) AS w FROM dd WHERE doc_id % 5 = {cor})
),
xe AS (
    SELECT b.doc_id,
           ROUND(AVG(CASE WHEN v.v > 0
                          THEN -ln((COALESCE(bc.cb, 0) + {k})
                                   / (COALESCE(u.cl, 0) + {k} * v.v))
                     END), 6) AS xent
    FROM bg b
    LEFT JOIN lm_bigc bc ON bc.w1 = b.w1 AND bc.w2 = b.w2
    LEFT JOIN lm_unic u ON u.w1 = b.w1
    CROSS JOIN lm_v v
    WHERE b.doc_id % 5 <> {cor}
    GROUP BY b.doc_id
),
rq AS (
    SELECT d.doc_id,
           regexp_replace(regexp_replace(regexp_replace(d.text,
               '{_PII_EMAIL_RE}', '[EMAIL]', 'g'),
               '{_PII_PHONE_RE}', '[PHONE]', 'g'),
               '{_PII_ID_RE}', '[ID]', 'g') AS text
    FROM documents d LEFT JOIN xe ON xe.doc_id = d.doc_id
    WHERE d.doc_id % 5 <> {cor}
      AND {ntok} >= {_QUALITY_MIN_TOKENS}
      AND CAST(length(text) AS DOUBLE) / {ntok} < {_QUALITY_MAX_CHARS_PER_TOKEN}
      AND NOT COALESCE(xe.xent > {bar}, FALSE)
),
src AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 5 = {cor}
    UNION ALL
    SELECT doc_id, text FROM rq
),
{_minhash_sig_ctes(source='src')},
{_admission_m01_ctes()},
adm1 AS (
    SELECT doc_id FROM sigs
    WHERE doc_id % 5 IN ({b1}) AND doc_id NOT IN (SELECT qid FROM m1)
),
mtok AS (
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS BIGINT) AS n_tokens,
           (CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':shard')),
                        1, 15)) AS BIGINT) % 2147483647) % {_SHARD_COUNT} AS shard,
           CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':ord')),
                       1, 15)) AS BIGINT) % 2147483647 AS ohash
    FROM rq
),
man0 AS (
    {man.format(adm='adm0')}
),
man1 AS (
    {man.format(adm='adm1')}
)
{final.format(b=0, cap=_PACK_CAPACITY)}
UNION ALL
{final.format(b=1, cap=_PACK_CAPACITY)}"""


@query(
    "stream_pplx_curation_twin",
    tables=("documents",),
    oracle=_stream_pplx_oracle(),
)
def stream_pplx_curation_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LM-filtered curation pipeline driven through the REAL
    streaming applier (r19, VERDICT r18 item 5): two micro-batches
    (`_ADMIT_BATCHES` residues) run through the EXACT function
    `streaming.pipeline.foreach_batch_curation` hands foreachBatch —
    heuristic quality -> PERPLEXITY drop (LM trained on the admission
    CORPUS slice, the production reference; bar `_STREAM_PPLX_BAR`) ->
    PII redact -> near-dup admission with index GROWTH between the
    batches -> per-batch committed admitted-sink partition -> manifest
    REBUILT from that committed partition (the crash-convergence path,
    not the returned plan). Output: both manifests, each admitted
    doc's rounded xent pinned as a value column. What this adds over
    `curate_perplexity_twin`: the streaming wrapper's sink-rebuild
    manifest derivation and sequential two-batch growth under the LM
    filter are the frames being hashed — a dropped doc that leaked
    into the sink partition, a manifest derived from the re-verdicted
    ledger, or a missing index append between batches all flip rows.
    The live-stream run of the same composition (file source,
    checkpoint, availableNow) is pytest-pinned in
    tests/test_streaming.py.

    Cost class (measured ~3-4s at the sf0.01 sweep SF, ~13.5s at
    sf0.1): the `stream_admission_twin` two-lifecycle model plus the
    per-invocation LM train (two vocab-bounded groupBys over the
    corpus slice — the `dedup_semantic_trained` deliberate-build
    precedent: the sweep SHOULD exercise the train path), sink
    partition writes and manifest-rebuild reads. Deliberately NOT a
    bench headline; its scale claims ride the already-gated pipe_*/
    adm_*/pplx_* families."""
    import atexit
    import shutil
    import tempfile

    from ..streaming.pipeline import foreach_batch_curation
    from ..tables import clone_parquet_dir
    from .dedup import (
        _ADMIT_BATCHES,
        _ADMIT_CORPUS_RES,
        admission_corpus_index_for,
    )

    t = load_tables(spark, sf_dir, "documents")
    lm = perplexity_counts(
        t.documents.filter(F.col("doc_id") % 5 == _ADMIT_CORPUS_RES)
    )
    index_path = clone_parquet_dir(admission_corpus_index_for(spark, sf_dir))
    scratch = tempfile.mkdtemp(prefix="engine_streampplx_")
    atexit.register(shutil.rmtree, scratch, ignore_errors=True)
    apply_fn = foreach_batch_curation(
        index_path,
        f"{scratch}/admitted",
        f"{scratch}/manifest",
        perplexity=lm,
        xent_bar=_STREAM_PPLX_BAR,
    )
    mans = []
    man_schema = (
        "doc_id long, shard long, pos long, n_tokens long, "
        "tok_offset long, bin_id long"
    )
    for b, residues in enumerate(_ADMIT_BATCHES):
        batch = t.documents.filter(
            (F.col("doc_id") % 5).isin(*residues)
        ).select("doc_id", "text")
        apply_fn(batch, b)
        mans.append(
            spark.read.schema(man_schema)
            .parquet(f"{scratch}/manifest/batch_id={b}")
            .withColumn("batch", F.lit(b).cast("long"))
        )
    xe = perplexity_scores(
        t.documents.filter(F.col("doc_id") % 5 != _ADMIT_CORPUS_RES), lm
    ).select("doc_id", "xent")
    return (
        mans[0].unionByName(mans[1])
        .join(xe, "doc_id")
        .select(
            "doc_id", "batch", "shard", "pos", "n_tokens", "tok_offset",
            "bin_id", "xent",
        )
    )
