"""Managed tables (D1): catalog-registered DDL provisioning.

The reference provisions its two sink tables on boot with
``CREATE TABLE IF NOT EXISTS`` DDL (``schema.sql:1-21``, auto-applied via
``application.properties:4``). This module is the Spark-catalog
equivalent: idempotent DDL for the COVID tables plus a
``saveAsTable``-backed managed-table path, so data is addressable by
NAME through ``spark.table(...)`` / ``spark.sql(...)`` — not only by
filesystem path.

Scale notes: managed tables put layout under the catalog's control —
`PARTITIONED BY (date)` gives partition pruning on the reference's
re-ingest window; on a real deployment the same DDL targets a shared
metastore so every engine/session sees one schema (the role Postgres'
DDL played for the reference).
"""

from __future__ import annotations

import hashlib
import logging

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from .catalog import query
from .functions import dec2, msum
from .sources import load_tables

_LOG = logging.getLogger(__name__)

# Spark-SQL DDL mirroring schema.sql:1-9 (states) and :12-21 (counties):
# timestamp->DATE intent (SURVEY.md §1.2), bigint counters, nullable fips
# that the sink coalesces to -1 so it can participate in the dedup key.
COVID_STATES_DDL = """
CREATE TABLE IF NOT EXISTS {name} (
    state  STRING NOT NULL,
    fips   INT,
    cases  BIGINT NOT NULL,
    deaths BIGINT NOT NULL,
    date   DATE NOT NULL
) USING parquet PARTITIONED BY (date)
"""

COVID_COUNTIES_DDL = """
CREATE TABLE IF NOT EXISTS {name} (
    county STRING NOT NULL,
    state  STRING NOT NULL,
    fips   INT,
    cases  BIGINT NOT NULL,
    deaths BIGINT NOT NULL,
    date   DATE NOT NULL
) USING parquet PARTITIONED BY (date)
"""


def warehouse_scratch_path(
    spark: SparkSession,
    name: str,
    sf_dir: str | None = None,
    *,
    per_app: bool = False,
) -> str:
    """Scratch path under the session warehouse for entry-staged data:
    ``<warehouse>/engine_<name>[_<md5(sf_dir)[:12]>][_<appId>]``. Strips
    the ``file:``/``file://`` scheme so Spark writers and plain-path
    readers agree on the literal local path; keying by ``sf_dir``
    prevents concurrent invocations at different scale factors racing
    one shared overwrite-then-read directory. ONE copy of the idiom
    (self-review r11: it had been pasted verbatim at eight sites).

    ``per_app=True`` additionally keys by the Spark applicationId —
    required for any path CACHED for the session's lifetime (the
    persisted MinHash/IVF probe indexes): an entry-scoped scratch dir
    is written and read within one invocation, but a session-cached
    index is read for as long as the session lives, so two concurrent
    applications sharing a warehouse dir at the same sf could race
    one's build (mode=overwrite) against the other's probe reads
    (ADVICE r11)."""
    warehouse = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    for scheme in ("file://", "file:"):
        if warehouse.startswith(scheme):
            warehouse = warehouse[len(scheme):]
            break
    if sf_dir is not None:
        name = f"{name}_{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}"
    if per_app:
        name = f"{name}_{spark.sparkContext.applicationId}"
    return f"{warehouse}/engine_{name}"


def managed_table_dir(spark: SparkSession, name: str) -> str:
    """The session-catalog data directory of a default-db managed table
    (``<warehouse>/<name>``, scheme-stripped) — where sidecar artifacts
    (e.g. the semdedup quantizer's ``_centroids.json``) live next to
    the table's files. Matches `_clean_orphaned_table_dir`'s layout
    derivation; only valid for the default database of the session
    catalog, which is the only place this repo creates tables.

    The name is LOWERCASED to match the session catalog's identifier
    normalization (ADVICE r17): `saveAsTable("MyTable")` stores its
    data under `<warehouse>/mytable`, so deriving the dir from the
    caller's casing verbatim would park sidecar artifacts (e.g. the
    semdedup `_centroids.json`) OUTSIDE the table directory — breaking
    orphan cleanup and the 'sidecar is scan-invisible because it lives
    inside the table dir' assumption."""
    if "." in name:
        raise ValueError(f"default-db table name expected, got: {name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    for scheme in ("file://", "file:"):
        if warehouse.startswith(scheme):
            warehouse = warehouse[len(scheme):]
            break
    return f"{warehouse}/{name.lower()}"


def clone_parquet_dir(path: str) -> str:
    """Driver-local copy of a parquet directory into a fresh private
    scratch dir — the mutation-isolation idiom for anything that runs
    an ADMISSION (index-growing) flow against a session-cached base
    index (`stream_admission_twin`, the composed curation twin, the
    bench/scale-gate pipeline wrappers). The base is built ONCE per
    session (the expensive signature pass); each invocation mutates its
    own clone, so repeated runs stay deterministic and concurrent
    invocations cannot corrupt each other (the mkdtemp-per-invocation
    rule from self-review r12: a shared per-app path is NOT enough once
    the path is written to). Local-filesystem only by design — it
    isolates test/bench invocations; a production admission pipeline
    owns its index path and never clones it.

    Clones are removed at interpreter exit (self-review r14: bench's
    warmup + 3 timed passes clone per pass, and nothing else ever
    deleted them — a round's runs would accrete dead index copies in
    /tmp). Eager deletion is NOT safe in general: callers return lazy
    DataFrames, and only the caller knows whether every read of the
    clone has been pinned away."""
    import atexit
    import os
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="engine_idxclone_")
    dst = os.path.join(root, os.path.basename(path.rstrip("/")))
    shutil.copytree(path, dst)
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    return dst


def create_covid_tables(
    spark: SparkSession,
    states_table: str = "covid19_usa_by_states",
    counties_table: str = "covid19_usa_by_counties",
) -> None:
    """D1 parity: idempotent boot-time provisioning of both COVID tables
    (``CREATE TABLE IF NOT EXISTS`` — re-running is a no-op, exactly like
    the reference's initialization-mode=always + IF NOT EXISTS DDL)."""
    spark.sql(COVID_STATES_DDL.format(name=states_table))
    spark.sql(COVID_COUNTIES_DDL.format(name=counties_table))


def save_as_managed_table(df: DataFrame, name: str, *, partition_by: str | None = None) -> None:
    """Register a DataFrame as a (replaceable) managed table addressable
    by name. Overwrite keeps the entry idempotent across re-runs.

    With the default in-memory catalog a previous SESSION's table leaves
    an orphaned warehouse directory the new catalog doesn't know about,
    and saveAsTable refuses the location (LOCATION_ALREADY_EXISTS) —
    remove it first. A shared metastore deployment never hits this
    branch (tableExists is true and overwrite handles it)."""
    spark = df.sparkSession
    _clean_orphaned_table_dir(spark, name)
    writer = df.write.mode("overwrite")
    if partition_by is not None:
        writer = writer.partitionBy(partition_by)
    writer.saveAsTable(name)


def _clean_orphaned_table_dir(spark: SparkSession, name: str) -> None:
    """Remove a dead session's orphaned warehouse directory for ``name``
    (shared by every saveAsTable-based writer here — see
    save_as_managed_table's docstring for why this exists)."""
    parts = name.lower().split(".")
    if len(parts) > 3 or any(not p for p in parts):
        raise ValueError(f"unsupported table identifier: {name}")
    # The warehouse-path derivation below is only valid for the SESSION
    # catalog — a foreign catalog (Iceberg/JDBC/...) stores tables
    # elsewhere, and deleting <session-warehouse>/db.db/t for 'ice.db.t'
    # could destroy a DIFFERENT table's directory. Orphan cleanup is
    # therefore skipped for non-session catalogs.
    session_catalog = len(parts) < 3 or parts[0] == "spark_catalog"
    if session_catalog and not spark.catalog.tableExists(name):
        # Derive the warehouse location the way Spark lays it out:
        # <warehouse>/<table> for the default db, <warehouse>/<db>.db/<table>
        # otherwise. Delete ONLY when the directory actually looks like
        # an orphaned Spark table (data/commit files present) — never a
        # directory some other system owns that merely collides.
        warehouse = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
        table = parts[-1]
        db = parts[-2] if len(parts) >= 2 else "default"
        loc_path = (
            f"{warehouse}/{table}" if db == "default" else f"{warehouse}/{db}.db/{table}"
        )
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(loc_path)
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(p):
            children = [f.getPath().getName() for f in fs.listStatus(p)]
            looks_like_table = not children or any(
                c == "_SUCCESS" or c.endswith(".parquet") or c.startswith("part-")
                or "=" in c
                for c in children
            )
            if not looks_like_table:
                raise IOError(
                    f"refusing to delete {loc_path}: exists but does not look "
                    f"like an orphaned Spark table (children: {children[:5]})"
                )
            _LOG.warning("save_as_managed_table: removing orphaned table dir %s", loc_path)
            fs.delete(p, True)


def detect_partition_columns(spark: SparkSession, path: str) -> list[str]:
    """Partition columns of a parquet dataset, from its directory layout
    (``col=value`` levels under ``path``, outermost first)."""
    return _detect_partitions_with_leaf(spark, path)[0]


def _detect_partitions_with_leaf(
    spark: SparkSession, path: str
) -> tuple[list[str], str]:
    """(partition columns, one leaf directory holding data files)."""
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    cols: list[str] = []
    cur = jvm.org.apache.hadoop.fs.Path(path)
    while True:
        subdirs = [
            f.getPath()
            for f in fs.listStatus(cur)
            if f.isDirectory() and "=" in f.getPath().getName()
        ]
        if not subdirs:
            return cols, str(cur.toUri().getPath())
        cols.append(subdirs[0].getName().split("=", 1)[0])
        cur = subdirs[0]


def _swap_paths(spark: SparkSession, path: str, tmp_suffix: str, old_suffix: str):
    """Crash-recovery + stale-cleanup preamble of the two-rename swap —
    ONE copy shared by `compact_parquet` and
    `operators.similarity.rebuild_ivf_index` (self-review r12: the
    protocol had been duplicated with only the suffixes renamed).
    Returns ``(fs, live, tmp, old)`` ready for a fresh rewrite into
    ``tmp``. ``path`` must already be slash-normalized (see callers)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    tmp = jvm.org.apache.hadoop.fs.Path(path + tmp_suffix)
    old = jvm.org.apache.hadoop.fs.Path(path + old_suffix)
    # path missing + old present = a previous run died BETWEEN the two
    # swap renames; the old dir IS the live data — restore, never delete
    if not fs.exists(hpath) and fs.exists(old):
        if not fs.rename(old, hpath):
            raise IOError(f"crash recovery failed: could not restore {old} to {path}")
    for stale in (tmp, old):
        if fs.exists(stale):
            fs.delete(stale, True)
    return fs, hpath, tmp, old


def _commit_swap(fs, hpath, tmp, old, path: str, verify_old=None) -> None:
    """The two renames + rollback + cleanup half of the swap protocol
    (see `_swap_paths`): any crash point leaves ``path`` wholly old or
    wholly new.

    ``verify_old``, when given, is called with the set-aside ``old``
    Path AFTER the first rename takes the live tree offline and BEFORE
    the new tree is published — the last look at a FROZEN pre-swap
    state (once the live dir is renamed aside, nothing more can land in
    it). If it raises, the old tree is restored and ``tmp`` deleted.
    This closes the check-then-act window ADVICE r12 flagged in
    `rebuild_ivf_index`: an append landing between a pre-swap listing
    and the rename is invisible to the pre-check but visible here. The
    one residual race — a writer re-CREATING ``path`` in the instant
    between the two renames — is inherent to lock-free filesystems and
    stays covered by the callers' offline-maintenance-window
    contract."""
    if not fs.rename(hpath, old):
        raise IOError(f"swap failed: could not move {path} aside")
    if verify_old is not None:
        try:
            verify_old(old)
        except Exception:
            # restore FIRST, clean up tmp second: the reverse order
            # leaves `path` absent if the delete throws or the process
            # dies between the two steps (self-review r14) — the
            # no-live-dir window must be exactly the one rename
            if not fs.rename(old, hpath):
                raise IOError(
                    f"swap verify failed AND restore failed: live data is at "
                    f"{old} — restore it manually"
                )
            fs.delete(tmp, True)
            raise
    if not fs.rename(tmp, hpath):
        fs.rename(old, hpath)  # roll back
        raise IOError(f"swap failed: could not promote {tmp}")
    fs.delete(old, True)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_partitions: int,
    *,
    preserve_rootfiles: tuple[str, ...] = (),
) -> int:
    """Small-files compaction: rewrite a parquet dataset into few files
    and atomically swap it into place, PRESERVING the partition layout.

    The reference's 15-minute append loop (O4) is exactly the workload
    that accretes small files — thousands of appends x partitions — and
    at 100 TB an uncompacted table wastes a task per tiny file on every
    scan. Partition columns are detected from the ``col=value`` directory
    layout and the rewrite re-emits them with the same ``partitionBy``:
    a flat rewrite of a partitioned target would leave a mixed layout
    the NEXT ``upsert_append`` (which writes ``partitionBy('date')``)
    turns into 'Conflicting directory structures', and silently lose
    partition pruning.

    Unpartitioned data is coalesced (no shuffle, just fewer write
    tasks); partitioned data is repartitioned BY the partition columns
    (one shuffle) so each partition directory compacts to one file
    instead of up-to-``target_partitions`` files per directory. Returns
    the data-file count after compaction.

    The swap is two renames through the Hadoop FileSystem API (atomic
    enough for a maintenance window on HDFS/local; object stores want a
    manifest/table format instead — this utility is the format-free
    fallback). The recovery/cleanup and rename protocol live in
    `_swap_paths` / `_commit_swap` (shared with the IVF rebuild).

    ``preserve_rootfiles`` names root-level metadata files (e.g. the
    IVF index's ``_centroids.json`` sidecar) to COPY into the rewrite
    before the swap — they ride the same atomic promotion as the data,
    so a crash can never separate a dataset from its sidecar
    (self-review r12: re-creating the sidecar after the swap left a
    window where the compacted index had lost its quantizer).
    """
    path = path.rstrip("/")  # 'dir/' would make tmp/old its children
    jvm = spark._jvm
    fs, hpath, tmp, old = _swap_paths(spark, path, "._compacting", "._precompact")
    part_cols, leaf_dir = _detect_partitions_with_leaf(spark, path)
    if part_cols:
        # Read partition values as VERBATIM strings for the roundtrip:
        # type inference would turn a zero-padded string value like
        # fips=00123 into int 123 and rewrite the directory as fips=123
        # — silently renaming partitions. An EXPLICIT schema (leaf-file
        # fields + partition cols pinned to STRING) disables inference
        # for this read only — no session-wide conf flip that would
        # change partition types under concurrent readers. Directory
        # names pass through unchanged; later readers re-infer exactly
        # as they did before compaction.
        from pyspark.sql import types as T

        leaf_fields = spark.read.parquet(leaf_dir).schema.fields
        schema = T.StructType(
            list(leaf_fields)
            + [T.StructField(c, T.StringType(), True) for c in part_cols]
        )
        df = spark.read.schema(schema).parquet(path)
        writer = (
            df.repartition(target_partitions, *[F.col(c) for c in part_cols])
            .write.mode("overwrite")
            .partitionBy(*part_cols)
        )
    else:
        df = spark.read.parquet(path)
        writer = df.coalesce(target_partitions).write.mode("overwrite")
    writer.parquet(str(tmp))
    for name in preserve_rootfiles:
        src = jvm.org.apache.hadoop.fs.Path(f"{path}/{name}")
        if fs.exists(src):
            jvm.org.apache.hadoop.fs.FileUtil.copy(
                fs,
                src,
                fs,
                jvm.org.apache.hadoop.fs.Path(f"{str(tmp)}/{name}"),
                False,
                spark._jsc.hadoopConfiguration(),
            )
    _commit_swap(fs, hpath, tmp, old, path)
    it = fs.listFiles(hpath, True)  # recursive: partitioned layouts nest
    n = 0
    while it.hasNext():
        if it.next().getPath().getName().endswith(".parquet"):
            n += 1
    return n


@query(
    "table_catalog_roundtrip",
    tables=("nation", "region"),
    oracle="""
SELECT r.r_name                        AS region,
       CAST(COUNT(*) AS BIGINT)        AS n_nations,
       MIN(n.n_name)                   AS first_nation
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
)
def table_catalog_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 under the driver's gate: write `nation` through the table
    catalog (``saveAsTable``), read it back BY NAME (``spark.table``),
    and aggregate against the broadcast region dim. A path bug, schema
    drift, or catalog miss surfaces as an oracle mismatch."""
    t = load_tables(spark, sf_dir, "nation", "region")
    save_as_managed_table(t.nation, "engine_nation_managed")
    managed = spark.table("engine_nation_managed")
    return (
        managed.join(
            F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey")
        )
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.min("n_name").alias("first_nation"),
        )
    )


def write_bucketed(
    df: DataFrame, name: str, key: str, n_buckets: int, sort: bool = True
) -> None:
    """Persist a table bucketed (and bucket-sorted) by ``key`` — the
    co-located-join layout for 100 TB fact-fact joins.

    Two tables bucketed on the same key with the same bucket count join
    with NO Exchange on either side (asserted in tests/test_plans.py):
    the hash-partitioning is baked into the file layout at write time, so
    every subsequent join/aggregate on the key reuses it for free. This
    is the physical answer to the reference's Postgres-unique-index
    lookup (W3): the key's locality is a property of the table, paid
    once, not per query. Bucket count is a layout contract: at cluster
    scale pick ~(total cores) buckets and keep it stable across writers.
    """
    spark = df.sparkSession
    if spark.catalog.tableExists(name):
        spark.sql(f"DROP TABLE {name}")
    _clean_orphaned_table_dir(spark, name)  # dead-session leftovers
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(name)


@query(
    "join_bucketed_colocated",
    tables=("orders", "customer"),
    oracle="""
SELECT c.c_mktsegment AS mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_total
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located (shuffle-free) fact-fact join through BUCKETED tables,
    under the driver's gate: both sides persist bucketed on the join key
    with the same bucket count, then join + aggregate. In the fact-fact
    regime (auto-broadcast off — the 100 TB case where neither side
    fits a broadcast) the join over these tables runs with NO Exchange
    on either side (asserted in tests/test_plans.py); at fixture scale
    Catalyst correctly prefers broadcasting the small side instead, and
    both plans produce the same rows. The bucket layout is the
    persisted shuffle, paid once at write time. The oracle computes the
    same join over the raw parquet, so a bucket-routing bug (rows
    landing in the wrong bucket and silently dropping from the join)
    surfaces as a value mismatch."""
    t = load_tables(spark, sf_dir, "orders", "customer")
    write_bucketed(
        t.orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        "engine_orders_bucketed", "o_custkey", 8,
    )
    write_bucketed(
        t.customer.select("c_custkey", "c_mktsegment"),
        "engine_customer_bucketed", "c_custkey", 8,
    )
    o = spark.table("engine_orders_bucketed")
    c = spark.table("engine_customer_bucketed")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            msum("o_totalprice").alias("sum_total"),
        )
    )


@query(
    "scan_partition_pruned",
    tables=("orders",),
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_total
FROM orders
WHERE strftime(o_orderdate, '%Y-%m') = '1997-03'
GROUP BY o_orderpriority
""",
)
def scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned scan under the driver's gate: orders persist as
    a month-partitioned managed table, and the query filters on the
    partition column — the scan reads ONE month's directory, not the
    table (PartitionFilters asserted in tests/test_plans.py). At 100 TB
    a date-partitioned fact is the canonical layout and partition
    pruning is the first 100-1000x: a month predicate over 7 years of
    data touches ~1.2% of the files. The oracle derives the month from
    the raw timestamps, so a row misfiled into the wrong partition at
    write time surfaces as a value mismatch."""
    t = load_tables(spark, sf_dir, "orders")
    save_as_managed_table(
        t.orders.withColumn(
            "o_month", F.date_format("o_orderdate", "yyyy-MM")
        ),
        "engine_orders_by_month",
        partition_by="o_month",
    )
    return (
        spark.table("engine_orders_by_month")
        .filter(F.col("o_month") == "1997-03")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            msum("o_totalprice").alias("sum_total"),
        )
    )


def write_range_partitioned(
    df: DataFrame, path: str, col: str, n_files: int
) -> None:
    """Persist ``df`` range-partitioned and sorted by ``col``: rows land
    in ``n_files`` contiguous key ranges, sorted within each file.

    This is the data-skipping layout for range-predicate workloads
    (time-series scans, id-range lookups): parquet row-group min/max
    stats become tight, so a selective range filter touches only the
    files whose range intersects it — at 100 TB the difference between
    reading 2 files and reading 2000. Complements partitionBy (discrete
    low-cardinality keys) and write_bucketed (equi-join keys);
    repartitionByRange samples the key distribution, so ranges stay
    balanced under skew.
    """
    (
        df.repartitionByRange(n_files, F.col(col))
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def delete_rows_partition_scoped(
    spark: SparkSession, path: str, partition_col: str, predicate
) -> int:
    """Hard-delete rows matching ``predicate`` from a ``partition_col``-
    partitioned parquet dataset by rewriting ONLY the partitions that
    contain matches — the takedown/right-to-erasure primitive a
    training-data pipeline must run routinely.

    At 100 TB a full-table rewrite per takedown batch is untenable; the
    affected-partition set is usually tiny. Mechanics: (1) one scan finds
    the PHYSICAL directories containing matches via input_file_name()
    (no path re-interpolation: Hive percent-escapes special characters
    in partition values and spells NULL as __HIVE_DEFAULT_PARTITION__,
    so rebuilding paths from values is wrong for both); (2) each
    affected directory is rewritten without the matching rows and
    swapped in via rename. Rows where the predicate evaluates to NULL
    are KEPT (a takedown must only remove rows that provably match —
    three-valued logic would otherwise silently delete NULL-field
    rows). Untouched partitions keep their files byte-identical
    (asserted in tests). Returns the number of rows deleted. Table
    formats (Delta/Iceberg) do this transactionally; this is the
    format-free equivalent with per-partition atomicity.
    """
    import os as _os
    from urllib.parse import quote, unquote, urlparse

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(path).getFileSystem(spark._jsc.hadoopConfiguration())
    # Heal a prior delete's crash residue BEFORE reading the dataset —
    # the same crash class the merge heals (self-review r11): a crash
    # between the aside-rename and the promote leaves the dot-prefixed
    # `.<dir>._predelete` aside as the partition's ONLY copy; restore it
    # when the target dir is missing, drop it as residue otherwise.
    _heal_aside_residue(fs, hpath, path, partition_col, _PREDELETE_SUFFIX)

    df = spark.read.parquet(path)
    matches = F.coalesce(predicate, F.lit(False))
    hits = df.filter(matches)
    # input_file_name returns a URI: unquote the PATH once to recover the
    # literal name (a dir named 'src=a b' appears as 'src=a%20b'), but
    # KEEP the scheme/authority — dropping them would resolve the
    # rewrite against the default filesystem for s3a://bucket/... or
    # cross-namenode hdfs:// datasets. The partition VALUE below
    # unquotes a second time for the Hive escaping layer (a value 'a%b'
    # is stored as dir 'a%25b').
    def _literal_dir(uri: str) -> str:
        p = urlparse(uri)
        d = _os.path.dirname(unquote(p.path))
        if not p.scheme or p.scheme == "file":
            # plain paths are NOT URI-parsed by Hadoop: pass the literal
            return d
        # scheme-qualified strings ARE URI-parsed (and %-decoded) again
        # by Hadoop Path — re-quote so the literal name round-trips
        return f"{p.scheme}://{p.netloc}{quote(d, safe='/')}"

    affected_dirs = sorted(
        {
            _literal_dir(r[0])
            for r in hits.select(F.input_file_name()).distinct().collect()
        }
    )
    if not affected_dirs:
        return 0
    n_deleted = 0
    part_type = df.schema[partition_col].dataType
    prefix = f"{partition_col}="
    for part_dir in affected_dirs:
        parent = _os.path.dirname(part_dir)
        dirname = _os.path.basename(part_dir)
        if not dirname.startswith(prefix):  # pragma: no cover - layout guard
            raise ValueError(f"unexpected partition directory layout: {part_dir}")
        raw = dirname[len(prefix):]
        value = None if raw == "__HIVE_DEFAULT_PARTITION__" else unquote(raw)
        # A single partition dir has no partition column in its files —
        # re-attach it as a literal so predicates may reference it, and
        # drop it again before writing (the dir name carries it).
        part_df = spark.read.parquet(part_dir).withColumn(
            partition_col, F.lit(value).cast(part_type)
        )
        n_before = part_df.count()
        keep = part_df.filter(~matches).drop(partition_col)
        n_deleted += n_before - keep.count()
        # dot-prefixed siblings: partition discovery ignores leading-dot
        # dirs, so neither the rewrite output nor the parked copy can
        # ever surface as a bogus `<col>=<val>._deleting` partition
        # after a mid-swap crash (self-review r11 — the merge swap's
        # discipline applied to the delete path)
        tmp = _os.path.join(parent, "." + dirname + _DELETING_SUFFIX)
        keep.write.mode("overwrite").parquet(tmp)
        old = _os.path.join(parent, "." + dirname + _PREDELETE_SUFFIX)
        fs.delete(hpath(old), True)  # unreachable residue of THIS process
        if not fs.rename(hpath(part_dir), hpath(old)):
            raise IOError(f"delete swap failed: could not move {part_dir} aside")
        if not fs.rename(hpath(tmp), hpath(part_dir)):
            fs.rename(hpath(old), hpath(part_dir))
            raise IOError(f"delete swap failed: could not promote {tmp}")
        fs.delete(hpath(old), True)
    return n_deleted


def drop_partitions_older_than(
    spark: SparkSession, path: str, partition_col: str, cutoff: str
) -> list[str]:
    """Retention: drop whole ``partition_col=<value>`` directories whose
    value sorts strictly below ``cutoff`` (ISO dates compare correctly as
    strings). Pure directory deletes — no data rewrite, O(partitions
    dropped) — the reference's append-forever table made finite.
    Returns the dropped partition values."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    dropped: list[str] = []
    prefix = f"{partition_col}="
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith(prefix):
            value = name[len(prefix):]
            if value < cutoff:
                fs.delete(st.getPath(), True)
                dropped.append(value)
    return dropped


_PREMERGE_SUFFIX = "._premerge"
_PREDELETE_SUFFIX = "._predelete"
_DELETING_SUFFIX = "._deleting"


def _heal_aside_residue(
    fs, hpath, path: str, partition_col: str, suffix: str
) -> dict:
    """Resolve every ``.<partition_col>=<val><suffix>`` aside dir a
    crashed partition swap (merge OR partition-scoped delete) left
    under ``path`` (dot-prefixed, so partition discovery never lists
    them as data):

    - target partition dir MISSING -> the crash hit between the
      aside-rename and the promote; the aside is the only copy of the
      partition's pre-swap rows. Restore it (rename back to target).
    - target partition dir PRESENT -> the promote completed and only
      the aside cleanup was lost; the aside duplicates superseded rows.
      Delete it.

    ``.<dir>._deleting`` temp dirs (an incomplete rewrite output, always
    recomputable) are removed unconditionally when healing the delete
    path. Returns {"restored": [...], "removed": [...]} partition dir
    names, for callers/tests that audit the heal. O(listing) — no data
    read."""
    import os as _os

    restored: list[str] = []
    removed: list[str] = []
    root_p = hpath(path)
    if not fs.exists(root_p):
        return {"restored": restored, "removed": removed}
    aside_prefix = f".{partition_col}="
    for st in fs.listStatus(root_p):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith(aside_prefix)):
            continue
        if suffix == _PREDELETE_SUFFIX and name.endswith(_DELETING_SUFFIX):
            fs.delete(st.getPath(), True)  # recomputable rewrite output
            removed.append(name)
            continue
        if not name.endswith(suffix):
            continue
        dirname = name[1 : -len(suffix)]
        target = hpath(_os.path.join(path, dirname))
        if fs.exists(target):
            fs.delete(st.getPath(), True)
            removed.append(dirname)
        else:
            if not fs.rename(st.getPath(), target):
                raise IOError(
                    f"aside heal failed: could not restore {name} -> {dirname}"
                )
            restored.append(dirname)
    return {"restored": restored, "removed": removed}


def merge_into_partitioned(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    *,
    keys: list[str],
    partition_col: str,
    op_col: str = "op",
) -> dict:
    """Keyed MERGE (upsert + delete in ONE pass) into a ``partition_col``-
    partitioned parquet table, rewriting ONLY the partitions the change
    batch touches — the incremental/CDC primitive that generalizes the
    reference's ON CONFLICT upsert (W3, ``…kt:138-141``) beyond
    append-only: in-place keyed updates and deletes at fact scale
    (VERDICT r9 item 4a). ``merge_scd2_dimension`` keeps history; this
    is the current-state table.

    ``changes`` carries the full target schema plus ``op_col`` with
    ``'upsert'`` (insert-or-replace by key) or ``'delete'`` (key-only
    tombstone; non-key columns ignored). The caller guarantees at most
    one change row per key — CDC batch compaction (last-writer-wins per
    key) is its own upstream step, cf. ``first_write_wins``.

    Mechanics (all partition-scoped, mirroring
    ``delete_rows_partition_scoped``'s proven swap):

    1. affected = partitions of BASE rows whose key appears in the batch
       (one column-pruned scan of key+partition columns — at 100 TB
       that scan reads two columns, and a layout with key bloom
       filters/indexes skips it) ∪ partitions upsert rows land in.
       An update whose partition value moved rewrites BOTH directories.
    2. survivors = affected base rows anti-joined against ALL change
       keys (drops deleted rows and stale update versions in one join).
    3. survivors ∪ upserts are written partitioned to a temp dir, then
       each affected directory is swapped in via rename; an affected
       partition with NO surviving rows is deleted outright (the edge
       dynamic-partition-overwrite silently gets wrong — an emptied
       partition would keep its old files because no output row
       replaces it). Untouched partitions keep their files
       byte-identical (asserted in tests/test_sinks_tables.py).

    The anti-join shuffles only the affected partitions' rows against
    the change keys (broadcast while the batch is small — the common
    CDC shape; AQE decides past that). Returns counters:
    ``{"partitions_rewritten", "partitions_deleted", "rows_upserted",
    "rows_deleted"}`` (deletes counted as keys matched in base).
    Table formats (Delta/Iceberg) run this MERGE transactionally; this
    is the format-free equivalent with per-partition atomicity.
    """
    import os as _os
    from urllib.parse import unquote

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(path).getFileSystem(spark._jsc.hadoopConfiguration())

    # Heal a prior merge's crash residue BEFORE reading the base. A
    # crash between the aside-rename and the promote leaves the aside
    # dir as the ONLY copy of that partition (target missing) — it must
    # be restored, or the rows are invisible forever and the next merge
    # touching the partition would delete them (ADVICE r10). Only when
    # the target dir EXISTS is the aside true residue (crash landed
    # after the promote, before the aside delete) and safe to drop.
    _heal_aside_residue(fs, hpath, path, partition_col, _PREMERGE_SUFFIX)

    base = spark.read.parquet(path)
    data_cols = [c for c in base.columns]
    ops = changes.select(op_col).distinct()
    bad = [r[0] for r in ops.collect() if r[0] not in ("upsert", "delete")]
    if bad:
        raise ValueError(f"unknown {op_col!r} values in change batch: {bad}")
    upserts = changes.filter(F.col(op_col) == "upsert").select(*data_cols)
    change_keys = changes.select(*keys).distinct()

    # 1. affected partitions: where matched keys LIVE ∪ where upserts LAND
    affected_rows = (
        base.join(change_keys, on=keys, how="left_semi")
        .select(partition_col)
        .distinct()
        .unionByName(upserts.select(partition_col).distinct())
        .distinct()
        .collect()
    )
    affected = sorted({r[0] for r in affected_rows}, key=lambda v: (v is None, v))
    if not affected:
        return {
            "partitions_rewritten": 0,
            "partitions_deleted": 0,
            "rows_upserted": 0,
            "rows_deleted": 0,
        }

    part_vals = [v for v in affected if v is not None]
    part_filter = F.col(partition_col).isin(part_vals)
    if any(v is None for v in affected):
        part_filter = part_filter | F.col(partition_col).isNull()
    affected_base = base.filter(part_filter)

    n_deleted = (
        affected_base.join(
            changes.filter(F.col(op_col) == "delete").select(*keys).distinct(),
            on=keys,
            how="left_semi",
        ).count()
    )
    # count the batch BEFORE the swap: a caller may derive `changes`
    # from the table itself (the self-referential compaction shape),
    # and a post-swap count would re-execute that pipeline against the
    # renamed/deleted directories — a successful merge reported as a
    # FileNotFound failure, after the table was already rewritten
    n_upserted = upserts.count()
    survivors = affected_base.join(change_keys, on=keys, how="left_anti")
    merged = survivors.unionByName(upserts)

    # 3. write the affected slice to a temp sibling, swap dirs by name.
    # Spark itself names the temp partition dirs, so promotion works off
    # a LISTING (no path re-interpolation — Hive escaping stays Spark's
    # problem); only the base-side dir lookup parses names, with the
    # same unquote discipline as delete_rows_partition_scoped.
    tmp = path.rstrip("/") + "._merging"
    fs.delete(hpath(tmp), True)
    # repartition on the partition column: one file per rewritten dir
    # instead of one sliver per task per dir (the affected set is small
    # by CDC assumption; for a huge touch set use repartition(n, col))
    merged.repartition(partition_col).write.mode("overwrite").partitionBy(
        partition_col
    ).parquet(tmp)

    prefix = f"{partition_col}="

    def _dir_by_value(root: str) -> dict:
        out = {}
        root_p = hpath(root)
        if not fs.exists(root_p):
            return out
        for st in fs.listStatus(root_p):
            name = st.getPath().getName()
            if st.isDirectory() and name.startswith(prefix):
                raw = name[len(prefix):]
                val = None if raw == "__HIVE_DEFAULT_PARTITION__" else unquote(raw)
                out[val] = st.getPath()
        return out

    base_dirs = _dir_by_value(path)
    new_dirs = _dir_by_value(tmp)
    rewritten = deleted = 0
    for value in affected:
        sval = None if value is None else str(value)
        old = base_dirs.get(sval)
        new = new_dirs.get(sval)
        if new is not None:
            dirname = new.getName()
            target = hpath(_os.path.join(path, dirname))
            # dot-prefixed aside: partition discovery ignores leading-dot
            # dirs, so a crash between the two renames can never surface
            # the parked copy as a bogus '<col>=<val>._premerge' partition
            aside = hpath(_os.path.join(path, "." + dirname + _PREMERGE_SUFFIX))
            # _heal_aside_residue resolved every pre-existing aside
            # before the base read; any dir here is unreachable residue
            # of THIS process (rename below would otherwise fail into it)
            fs.delete(aside, True)
            if old is not None and not fs.rename(old, aside):
                raise IOError(f"merge swap failed: could not move {old} aside")
            if not fs.rename(new, target):
                if old is not None:
                    fs.rename(aside, target)
                raise IOError(f"merge swap failed: could not promote {new}")
            if old is not None:
                fs.delete(aside, True)
            rewritten += 1
        elif old is not None:
            # every row of this partition was deleted or moved away
            fs.delete(old, True)
            deleted += 1
    fs.delete(hpath(tmp), True)
    return {
        "partitions_rewritten": rewritten,
        "partitions_deleted": deleted,
        "rows_upserted": n_upserted,
        "rows_deleted": n_deleted,
    }


@query(
    "merge_cdc_upsert",
    tables=("orders",),
    oracle="""
WITH base AS (
    SELECT o_orderkey AS k,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS o_month,
           o_orderstatus AS status,
           o_totalprice  AS price
    FROM orders
),
updates AS (
    SELECT k,
           CASE WHEN k % 46 = 0 THEN '1999-01' ELSE o_month END AS o_month,
           'U' AS status,
           CAST(ROUND(CAST(price AS DECIMAL(18,2)) * CAST(1.05 AS DECIMAL(3,2)), 2) AS DOUBLE) AS price
    FROM base WHERE k % 23 = 0 AND o_month >= '1998-01'
),
deletes AS (
    SELECT k FROM base
    WHERE k % 19 = 0 AND k % 23 <> 0 AND o_month >= '1998-01'
),
inserts AS (
    SELECT k + 600000000 AS k, '1999-02' AS o_month, 'N' AS status,
           CAST(ROUND(CAST(price AS DECIMAL(18,2)) * CAST(0.50 AS DECIMAL(3,2)), 2) AS DOUBLE) AS price
    FROM base WHERE k % 101 = 0
),
merged AS (
    SELECT k, o_month, status, price FROM base
    WHERE k NOT IN (SELECT k FROM updates)
      AND k NOT IN (SELECT k FROM deletes)
    UNION ALL SELECT k, o_month, status, price FROM updates
    UNION ALL SELECT k, o_month, status, price FROM inserts
)
SELECT o_month,
       status,
       CAST(COUNT(*) AS BIGINT)  AS n_rows,
       CAST(ROUND(SUM(CAST(price AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price,
       CAST(SUM(k) AS BIGINT)    AS key_checksum
FROM merged
GROUP BY o_month, status
""",
)
def merge_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-scoped MERGE under the driver's gate (VERDICT r9 item
    4a): orders persist as a month-partitioned current-state table, a
    deterministic CDC batch is derived from the same fixture, and
    ``merge_into_partitioned`` applies it — upserts (including rows
    whose partition MOVES), deletes, and brand-new keys landing in new
    partitions, in one pass that rewrites only the touched directories.
    The full post-merge table aggregates per (month, status) with a key
    checksum, so a row lost, duplicated, resurrected, or left stale by
    the swap surfaces as a value mismatch — including in the UNTOUCHED
    1992-1997 partitions (their byte-identity is pinned separately in
    tests/test_sinks_tables.py).

    The change batch: keys %23 in the 1998 window are updated (status
    'U', price *1.05 — every second one MOVES to the new '1999-01'
    partition), keys %19 (not also %23) are deleted, keys %101 from any
    month insert as new keys (+6e8) into '1999-02'. All price math is
    exact-decimal both sides (see functions/__init__.py policy).

    Scale notes: the CDC window (here "1998 onward") is the realistic
    shape — changes cluster in recent partitions, so the rewrite
    touches ~12 of ~81 month directories and the 1992-1997 bulk is
    never read past the key+month columns of the find-affected scan."""
    t = load_tables(spark, sf_dir, "orders")
    path = warehouse_scratch_path(spark, "orders_cdc", sf_dir)

    k = F.col("o_orderkey")
    base = t.orders.select(
        k.alias("k"),
        F.date_format("o_orderdate", "yyyy-MM").alias("o_month"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    # fresh base table every invocation: the entry is deterministic
    # regardless of a prior run's merged state. repartition on the
    # partition column first: without it every one of the 32 tasks
    # writes a sliver into every month dir (~81 x 32 tiny files — the
    # small-files antipattern); with it each month is one file.
    # At 100 TB repartition(n, col) with a per-partition target keeps
    # the same layout without serializing a month into one task.
    base.repartition("o_month").write.mode("overwrite").partitionBy(
        "o_month"
    ).parquet(path)

    in_window = (F.col("k") % 23 == 0) & (F.col("o_month") >= "1998-01")
    updates = base.filter(in_window).select(
        "k",
        F.when(F.col("k") % 46 == 0, F.lit("1999-01"))
        .otherwise(F.col("o_month"))
        .alias("o_month"),
        F.lit("U").alias("status"),
        F.round(dec2("price") * F.lit("1.05").cast("decimal(3,2)"), 2)
        .cast("double")
        .alias("price"),
        F.lit("upsert").alias("op"),
    )
    deletes = base.filter(
        (F.col("k") % 19 == 0) & (F.col("k") % 23 != 0) & (F.col("o_month") >= "1998-01")
    ).select(
        "k",
        F.lit(None).cast("string").alias("o_month"),
        F.lit(None).cast("string").alias("status"),
        F.lit(None).cast("double").alias("price"),
        F.lit("delete").alias("op"),
    )
    inserts = base.filter(F.col("k") % 101 == 0).select(
        (F.col("k") + 600000000).alias("k"),
        F.lit("1999-02").alias("o_month"),
        F.lit("N").alias("status"),
        F.round(dec2("price") * F.lit("0.50").cast("decimal(3,2)"), 2)
        .cast("double")
        .alias("price"),
        F.lit("upsert").alias("op"),
    )
    changes = updates.unionByName(deletes).unionByName(inserts)
    merge_into_partitioned(
        spark, path, changes, keys=["k"], partition_col="o_month"
    )
    return (
        spark.read.parquet(path)
        .groupBy("o_month", "status")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            msum("price").alias("sum_price"),
            F.sum("k").alias("key_checksum"),
        )
    )


def scan_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL (newline-delimited JSON) source path under the driver's
    gate — the interchange format most LLM text corpora arrive in.
    Documents round-trip through a JSONL stage (overwrite-idempotent,
    under the session warehouse dir) and are read back with an EXPLICIT
    schema + FAILFAST — never schema inference, which at 100 TB is a
    full extra pass over the data before the first real scan, and
    silently unions drifting schemas instead of failing loudly. A field
    dropped, renamed, or re-typed by the writer surfaces as an oracle
    mismatch (or a FAILFAST parse error), not a silent null column.

    Scale notes: JSON scans split by line across executors like CSV;
    unlike parquet there is no column pruning or predicate pushdown —
    the docstring-level advice this entry encodes is "land JSONL, scan
    once, persist parquet/bucketed for every later query" (the
    ingest.py chain's pattern)."""
    t = load_tables(spark, sf_dir, "documents")
    path = warehouse_scratch_path(spark, "documents_jsonl", sf_dir)
    t.documents.write.mode("overwrite").json(path)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    docs = spark.read.schema(schema).option("mode", "FAILFAST").json(path)
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("source").alias("n_sources"),
        F.max("n_chars").alias("max_chars"),
    )


def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink path under the driver's gate — the other major
    columnar lake format next to parquet (Hive-heritage warehouses).
    Documents round-trip through an ORC stage (overwrite-idempotent,
    session warehouse dir) and are read back with an explicit schema;
    the n_chars predicate exercises ORC's predicate pushdown + column
    statistics path, which — unlike the JSONL entry's line-splittable
    but pushdown-less scans — makes ORC a format you can query in
    place at 100 TB (min/max stripe stats skip whole stripes;
    `tests/test_plans.py` asserts pushdown reaches the parquet scan
    for the sibling entries, and the same `PushedFilters` mechanism
    serves the ORC reader). DuckDB cannot read ORC, so the oracle runs
    the identical query on the parquet original — a writer that drops,
    re-types, or corrupts a column surfaces as a value mismatch."""
    t = load_tables(spark, sf_dir, "documents")
    path = warehouse_scratch_path(spark, "documents_orc", sf_dir)
    t.documents.write.mode("overwrite").orc(path)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    docs = spark.read.schema(schema).orc(path)
    return (
        docs.filter(F.col("n_chars") >= 200)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@query(
    "scan_text_formats_surface",
    tables=("documents",),
    oracle="""
SELECT 'jsonl' AS fmt, lang AS grp,
       CAST(COUNT(*) AS BIGINT)               AS n_docs,
       CAST(SUM(n_chars) AS BIGINT)           AS total_chars,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_distinct,
       CAST(MAX(n_chars) AS BIGINT)           AS max_chars
FROM documents
GROUP BY lang
UNION ALL
SELECT 'orc', source,
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(n_chars) AS BIGINT),
       CAST(COUNT(DISTINCT lang) AS BIGINT),
       CAST(MAX(n_chars) AS BIGINT)
FROM documents
WHERE n_chars >= 200
GROUP BY source
""",
)
def scan_text_formats_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged consolidation of the JSONL and ORC roundtrip entries
    (r11, the r8-r10 surface pattern): BOTH format paths execute —
    write stage, explicit-schema read-back, aggregate — and land in ONE
    driver hash, each branch tagged by `fmt`. The JSONL branch keeps
    its FAILFAST + lang grouping, the ORC branch its pushdown-
    exercising n_chars predicate + source grouping; a writer/reader
    fault in either format still flips the hash. The retired
    `scan_jsonl_roundtrip` / `scan_orc_roundtrip` callables remain the
    public per-format API (and carry the per-format scale notes)."""
    jsonl = scan_jsonl_roundtrip(spark, sf_dir).select(
        F.lit("jsonl").alias("fmt"),
        F.col("lang").alias("grp"),
        "n_docs",
        "total_chars",
        F.col("n_sources").alias("n_distinct"),
        "max_chars",
    )
    orc = scan_orc_roundtrip(spark, sf_dir).select(
        F.lit("orc").alias("fmt"),
        F.col("source").alias("grp"),
        "n_docs",
        "total_chars",
        F.col("n_langs").alias("n_distinct"),
        "max_chars",
    )
    return jsonl.unionByName(orc)


@query(
    "scan_binaryfile_metadata",
    tables=("documents",),
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text)                                  AS content_md5
FROM (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 200) t
""",
)
def scan_binaryfile_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`binaryFile` source path — the ingestion format for multimodal
    corpora (images/audio/video land as opaque objects; SURVEY §2.3's
    multimodal family starts exactly here). The 200 lowest-doc_id
    documents are exported as individual ``doc_<id>.bin`` objects by a
    distributed ``foreachPartition`` writer (the binary-sink shape:
    each task writes its partition's rows through a ``pyarrow.fs``
    client resolved from the target URI — LocalFileSystem here, the
    S3/GCS/HDFS client on a real deployment; local-filesystem
    warehouses are guarded loud off local mode, where per-node writes
    would silently scatter), then read back with
    ``format("binaryFile")`` + ``pathGlobFilter``; identity is
    recovered from the object path and content integrity is proven by
    md5 against the parquet original in DuckDB.

    Scale notes: binaryFile scans parallelize per-file (one row per
    object, content as a single binary cell bounded by
    `spark.sql.sources.binaryFile.maxLength`); metadata columns
    (path/length/modificationTime) come from the file listing, so a
    length-only query never reads object bytes. Millions of small
    objects make the LISTING the bottleneck — the production pattern is
    this entry's chain run once, then metadata + content persisted to
    parquet/ORC where scans are stripe-parallel and prunable (the
    mm_* entries consume exactly that shape)."""
    t = load_tables(spark, sf_dir, "documents")
    path = warehouse_scratch_path(spark, "documents_bin", sf_dir)

    # pyarrow.fs in the executor tasks makes s3://gs://hdfs:// targets
    # genuinely work off local mode — but a scheme-less (or file:)
    # warehouse still means LOCAL filesystem semantics, and on a real
    # cluster each task would then scatter objects across
    # executor-local disks with the read-back seeing a partial
    # directory (ADVICE r7; re-pinned in the r9 self-review when this
    # guard was briefly deleted). Fail loud BEFORE the re-runnable
    # delete below destroys the previous successful export.
    master = spark.conf.get("spark.master", "")
    if "://" not in path and not master.startswith("local"):
        raise NotImplementedError(
            "binary export to a local-filesystem warehouse requires "
            f"local mode (spark.master={master!r}); point "
            "spark.sql.warehouse.dir at an object store (s3://, gs://, "
            "hdfs://) to export from a cluster"
        )

    # Re-runnable stage: drop any prior export so a stale extra object
    # can't join the glob (same hygiene as the ORC/JSONL stages' mode
    # "overwrite", which binary export lacks natively).
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(hpath):
        fs.delete(hpath, True)
    fs.mkdirs(hpath)

    def _export(rows) -> None:
        # Executor tasks have no py4j bridge to the JVM Hadoop client,
        # so the per-task writer is pyarrow.fs: from_uri resolves the
        # SAME URI to an S3/GCS/HDFS client on whatever node runs the
        # task (VERDICT r8 stretch 7 — the guard above now fires only
        # for local-filesystem warehouses, where scattering would be
        # silent). Objects are written DIRECTLY under their final
        # deterministic names (no tmp+rename: rename is a POSIX-ism
        # object stores lack; a retried task rewrites byte-identical
        # content, so the write is idempotent — the directory-level
        # delete above is the run-level hygiene).
        import pyarrow.fs as pafs

        afs, rel = pafs.FileSystem.from_uri(path)
        for r in rows:
            with afs.open_output_stream(
                f"{rel}/doc_{r['doc_id']}.bin"
            ) as out:
                out.write(r["text"].encode("utf-8"))

    t.documents.orderBy("doc_id").limit(200).select(
        "doc_id", "text"
    ).foreachPartition(_export)

    bins = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(path)
    )
    return bins.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )


@query(
    "scan_xml_roundtrip",
    tables=("orders",),
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT)                             AS n_orders,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT)            AS n_custs,
       CAST(SUM(o_orderkey) AS BIGINT)                      AS key_checksum,
       strftime(MIN(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS min_date,
       strftime(MAX(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS max_date
FROM orders
GROUP BY o_orderstatus
""",
)
def scan_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source/sink path (built into Spark since 4.0 — previously the
    spark-xml package): orders round-trip through a ``rowTag``-framed XML
    stage and are read back with an EXPLICIT schema (inference on XML is
    a full extra pass, same verdict as the JSONL entry), then aggregated;
    the oracle runs on the parquet original, so an attribute dropped or
    re-typed by the writer surfaces as a value mismatch. Dates travel as
    pre-formatted strings — XML has no date type, and pinning the lexical
    form keeps the min/max comparisons engine-neutral.

    Scale notes: XML files split by rowTag boundaries across executors,
    but like JSONL there is no pushdown or column pruning — land it,
    scan once, persist columnar. The checksum column (SUM of keys) is
    the cheap whole-corpus integrity probe: any dropped or duplicated
    row under parallel write/read moves it."""
    t = load_tables(spark, sf_dir, "orders")
    path = warehouse_scratch_path(spark, "orders_xml", sf_dir)

    t.orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
    ).write.mode("overwrite").format("xml").option("rootTag", "orders").option(
        "rowTag", "order"
    ).save(path)

    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_orderdate", T.StringType()),
        ]
    )
    back = (
        spark.read.format("xml").option("rowTag", "order").schema(schema).load(path)
    )
    # min/max over the DATE cast, formatted back to the pinned lexical
    # form: a string min/max buffer is immutable, which silently demotes
    # the whole aggregate to a SortAggregate (r9 plan audit) — the date
    # cast keeps every buffer field mutable so the scan aggregates as a
    # partial+final HashAggregate, and ISO strings order identically to
    # their dates so the value is unchanged.
    d = F.col("o_orderdate").cast("date")
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_custs"),
        F.sum("o_orderkey").alias("key_checksum"),
        F.date_format(F.min(d), "yyyy-MM-dd").alias("min_date"),
        F.date_format(F.max(d), "yyyy-MM-dd").alias("max_date"),
    )


@query(
    "scan_python_datasource_httpcsv",
    tables=("orders",),
    oracle="""
WITH derived AS (
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS date,
           o_orderpriority                                AS state,
           CASE WHEN o_custkey % 10 = 0 THEN NULL
                ELSE CAST(o_custkey % 100 AS INT) END     AS fips,
           SUM(o_orderkey)                                AS cases,
           COUNT(*)                                       AS deaths
    FROM orders
    GROUP BY 1, 2, 3
)
SELECT state,
       CAST(COUNT(*) AS BIGINT)        AS n_rows,
       CAST(SUM(cases) AS BIGINT)      AS total_cases,
       CAST(SUM(deaths) AS BIGINT)     AS total_deaths,
       CAST(COUNT(DISTINCT fips) AS BIGINT) AS n_fips,
       CAST(SUM(CASE WHEN fips IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                                       AS null_fips_rows
FROM derived
GROUP BY state
""",
)
def scan_python_datasource_httpcsv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python DataSource path: the reference's remote-CSV model
    (S1-S3) as a registered ``format("http_csv")`` source with one input
    partition per URL (`sources/httpcsv.py`). The covid-shaped CSV is
    derived from `orders` exactly like `ingest_covid_states`' fixture,
    written as 4 part files, and read back through the Python source via
    ``file://`` URLs — header skip, tokenization, and null-safe typed
    parse (''->NULL fips) all happen INSIDE the source, so this entry
    proves the P1-P3 surface at the source boundary; the DuckDB oracle
    re-derives the same aggregate from the parquet original, so a cell
    mistyped or a header row leaked by the source is a value mismatch.

    Scale notes: |urls| = parallelism — this is the many-remote-files
    shape; the single-huge-file shape stays with fetch_to_staging + the
    splittable built-in CSV scan (see module docstring for the
    crossover). The driver-side os.listdir here stands in for a catalog
    of URLs (bounded metadata, never data)."""
    import os as _os

    from .sources.httpcsv import register_http_csv

    register_http_csv(spark)
    t = load_tables(spark, sf_dir, "orders")
    fips = F.when(F.col("o_custkey") % 10 == 0, F.lit(None)).otherwise(
        (F.col("o_custkey") % 100).cast("int")
    )
    derived = t.orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate").cast("date"))
        .cast("date")
        .alias("date"),
        F.col("o_orderpriority").alias("state"),
        fips.alias("fips"),
    ).agg(F.sum("o_orderkey").alias("cases"), F.count(F.lit(1)).alias("deaths"))

    path = warehouse_scratch_path(spark, "httpcsv", sf_dir)
    derived.repartition(4).write.mode("overwrite").option("header", True).csv(path)

    urls = ",".join(
        sorted(
            f"file://{path}/{name}"
            for name in _os.listdir(path)
            if name.startswith("part-") and name.endswith(".csv")
        )
    )
    schema = T.StructType(
        [
            T.StructField("date", T.DateType()),
            T.StructField("state", T.StringType()),
            T.StructField("fips", T.IntegerType()),
            T.StructField("cases", T.LongType()),
            T.StructField("deaths", T.LongType()),
        ]
    )
    back = (
        spark.read.format("http_csv")
        .schema(schema)
        .option("urls", urls)
        .option("header", "true")
        .load()
    )
    return back.groupBy("state").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("cases").alias("total_cases"),
        F.sum("deaths").alias("total_deaths"),
        F.countDistinct("fips").alias("n_fips"),
        F.sum(F.when(F.col("fips").isNull(), 1).otherwise(0)).alias(
            "null_fips_rows"
        ),
    )


def zorder_value(col_a, col_b, min_a, max_a, min_b, max_b):
    """Z-order (Morton) key for two numeric columns: each value is
    min-max scaled to 16 bits, then the bits are interleaved — points
    close in (a, b) space get close z keys, so range-sorting by z
    clusters BOTH dimensions into file/row-group min-max envelopes at
    once. Pure codegen arithmetic (one expression, no UDF)."""
    span_a = max(int(max_a) - int(min_a), 1)
    span_b = max(int(max_b) - int(min_b), 1)
    bits = " + ".join(
        f"(((_za >> {i}) & 1) << {2 * i}) + (((_zb >> {i}) & 1) << {2 * i + 1})"
        for i in range(16)
    )
    return (
        F.expr(bits.replace("_za", "__zx").replace("_zb", "__zy")),
        (
            (col_a.cast("bigint") - F.lit(int(min_a)))
            * F.lit(65535)
            / F.lit(span_a)
        ).cast("bigint"),
        (
            (col_b.cast("bigint") - F.lit(int(min_b)))
            * F.lit(65535)
            / F.lit(span_b)
        ).cast("bigint"),
    )


def write_zordered(
    df: DataFrame, path: str, col_a: str, col_b: str, n_files: int = 16
) -> None:
    """Write ``df`` as parquet laid out in Z-order over (col_a, col_b) —
    the lakehouse multi-dimensional clustering technique (Delta OPTIMIZE
    ZORDER BY, Iceberg sort orders) in plain Spark: range-partition by
    the Morton key, sort within partitions, write. Each file and each
    parquet row group then covers a small rectangle of (a, b) space, so
    the engine's ordinary min/max stats pruning skips most of the table
    for a selective predicate on EITHER column — unlike a linear sort,
    which prunes only its leading column.

    Scale notes: cost is one range shuffle of the table (sampled range
    boundaries, balanced output files) — the same price as any
    sorted-write compaction, paid once per layout period and amortized
    over every subsequent scan. The min/max scan for scaling is a
    cheap columnar agg; at 100 TB, derive the bounds from table-level
    stats instead. Bits per dimension (16) bounds cluster granularity
    at 65536 cells/dim — far beyond any practical file count."""
    bounds = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    z, bx, by = zorder_value(
        F.col(col_a), F.col(col_b), bounds[0], bounds[1], bounds[2], bounds[3]
    )
    (
        df.withColumn("__zx", bx)
        .withColumn("__zy", by)
        .withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__zx", "__zy", "__z")
        .write.mode("overwrite")
        .parquet(path)
    )


@query(
    "table_zorder_roundtrip",
    tables=("lineitem",),
    oracle="""
WITH b AS (
    SELECT MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
           MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax
    FROM lineitem
)
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT)          AS n_rows,
       CAST(SUM(l_orderkey) AS BIGINT)   AS key_checksum,
       ROUND(SUM(l_quantity), 2)         AS sum_qty
FROM lineitem, b
WHERE l_partkey BETWEEN b.pmin + (b.pmax - b.pmin) // 20
                    AND b.pmin + (3 * (b.pmax - b.pmin)) // 20
  AND l_suppkey BETWEEN b.smin + (b.smax - b.smin) // 10
                    AND b.smin + (4 * (b.smax - b.smin)) // 10
GROUP BY l_returnflag
""",
)
def table_zorder_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout under the driver's gate: lineitem is rewritten
    Z-ordered over (l_partkey, l_suppkey) via `write_zordered`, then a
    2-D box predicate scans the new layout and aggregates; the oracle
    runs the identical query on the unordered original, so any row
    lost, duplicated, or corrupted by the clustering rewrite is a value
    mismatch. The pruning benefit itself is pinned separately with
    parquet-footer arithmetic in `tests/test_sinks_tables.py` (row
    groups whose min/max envelope intersects the box: Z-layout prunes
    BOTH dimensions; a linear sort prunes only its leading column)."""
    t = load_tables(spark, sf_dir, "lineitem")
    path = warehouse_scratch_path(spark, "lineitem_zorder", sf_dir)
    write_zordered(t.lineitem, path, "l_partkey", "l_suppkey")
    back = spark.read.parquet(path)
    # Box bounds are integer fractions of the key ranges (5-15% of
    # partkey, 10-40% of suppkey) so the predicate is selective but
    # non-empty at EVERY scale factor; the same integer arithmetic runs
    # in the oracle's CTE, so both engines cut the identical box.
    b = t.lineitem.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).first()
    p_lo = b[0] + (b[1] - b[0]) // 20
    p_hi = b[0] + (3 * (b[1] - b[0])) // 20
    s_lo = b[2] + (b[3] - b[2]) // 10
    s_hi = b[2] + (4 * (b[3] - b[2])) // 10
    return (
        back.filter(F.col("l_partkey").between(p_lo, p_hi))
        .filter(F.col("l_suppkey").between(s_lo, s_hi))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("l_orderkey").alias("key_checksum"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )
