"""The reference's whole pipeline, Spark-first (SURVEY.md §7 phase 1).

Reference: chunked CSV -> typed record -> batched JDBC insert with
ON CONFLICT DO NOTHING (S1-S3, P1-P5, W1-W3, O1-O3 in SURVEY.md §2.1).
Engine: one declarative pipeline — CSV scan with explicit schema ->
projection/cast/null handling -> deterministic first-write-wins dedup ->
anti-join against the existing table -> append, partitioned by date.

Semantics preserved:
- P3 null-safe int parse: '' -> NULL (Spark cast does this natively).
- P4 ISO date parse: to_date('y-M-d') — the *intent* of the reference's
  parseDateString (…kt:52-61), not its 0-based-month bug (SURVEY.md §1.2).
- P5 null->-1 fips sentinel at the sink (…kt:133,171), so key dedup
  fires for null fips exactly as Postgres' unique index did.
- W3 first-write-wins: within a batch the winner is pinned by arrival
  order (row position), across batches by the anti-join (existing rows
  always win).
- O3/O4 idempotent re-run: ingesting the same file twice is a no-op.

Scale notes: the target is partitioned by date — re-ingests prune to the
incremental date range; the anti-join shuffles only new keys (existing
side is scanned with partition pruning when a date predicate is pushed).
At 100 TB the anti-join right side should be the last N days' partitions,
not the full table.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from . import schemas
from .catalog import query
from .sources import load_tables, read_csv


def parse_covid_rows(
    raw: DataFrame, *, has_county: bool, passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """P1-P5: positional projection + typed casts for the two NYT CSV
    layouts (counties: date,county,state,fips,cases,deaths; states:
    date,state,fips,cases,deaths — …kt:126-128,164-166)."""
    cols = [
        F.to_date("date", "y-M-d").alias("date"),
        *([F.col("county")] if has_county else []),
        F.col("state"),
        # '' -> NULL int (P3, …kt:49-50); sentinel applied at sink (P5).
        F.col("fips").cast("int").alias("fips"),
        F.col("cases").cast("long").alias("cases"),
        F.col("deaths").cast("long").alias("deaths"),
        *[F.col(c) for c in passthrough],
    ]
    return raw.select(*cols)


def first_write_wins(df: DataFrame, keys: list[str], arrival_col: str) -> DataFrame:
    """W3 within-batch dedup with a deterministic winner: first arrival
    per key (the reference's DO NOTHING keeps the first inserted row;
    dropDuplicates alone would keep an arbitrary one)."""
    w = W.partitionBy(*keys).orderBy(F.col(arrival_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def target_exists(spark: SparkSession, target_path: str) -> bool:
    """Existence check through the Hadoop FileSystem API, so it works on
    any supported filesystem (local, HDFS, object stores) — not just
    local paths."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(target_path)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(path))


def job_commit_succeeded(spark: SparkSession, path: str) -> bool:
    """True iff a Spark write to ``path`` ran its job commit to
    completion — i.e. the ``_SUCCESS`` marker exists. This is the ONLY
    safe 'already written' test for an idempotent sink partition:

    - a dir holding only ``_temporary`` contents (crash mid-task) has
      no marker -> rewrite;
    - a dir holding SOME part files but no marker (crash mid-JOB-commit,
      after the committer moved task 1's output but before task 2's)
      has no marker -> rewrite. The earlier draft checked for 'any
      committed-looking data file', which called this half-published
      state done and permanently dropped the missing tasks' rows
      (self-review r14);
    - a fully committed dir (marker present) -> skip.

    If ``mapreduce.fileoutputcommitter.marksuccessfuljobs`` is disabled
    the marker never appears and every replay rewrites — wasted work,
    never lost rows (the overwrite is deterministic), which is the
    right failure direction for an exactly-once sink."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}/_SUCCESS")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def _flat_data_files_at_root(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` holds non-hidden data FILES directly at its
    root — the flat (pre-batch-partition) admitted-sink layout."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return False
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isFile() and not (name.startswith("_") or name.startswith(".")):
            return True
    return False


def _batch_partition_dirs_at_root(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` holds ``batch_id=`` partition DIRECTORIES at
    its root — the batch-partitioned admitted-sink layout. The mirror
    of `_flat_data_files_at_root`, used by the flat-mode guard."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return False
    for st in fs.listStatus(p):
        if st.isDirectory() and st.getPath().getName().startswith("batch_id="):
            return True
    return False


def _norm_sink_path(path: str) -> str:
    """Cache key for `_LAYOUT_CHECKED`: trailing-slash variants of one
    path must hit one cache entry, or 'path/' re-runs the listing that
    'path' already paid for (ADVICE r14)."""
    return path.rstrip("/") or "/"


# Admitted-sink paths whose layout has been validated this process —
# the flat-vs-partitioned guards in admit_sink_upsert run ONCE per
# (normalized) path per process lifetime. FIRST-CALL-ONLY semantics: a
# sink deleted and recreated with the WRONG layout at the same path
# inside one long-lived process skips the re-check (offline-tooling
# scope; acceptable because nothing in this repo deletes a live sink).
# Maintenance entrypoints that legitimately change what is on disk
# (`compact_admitted_sink`, `migrate_admitted_sink`) invalidate their
# path's entries so the next write re-validates. Entries are
# (mode, path): the two modes check DIFFERENT facts — batch mode checks
# 'no flat files', flat mode checks 'no batch_id= dirs' — and each
# mode's own writes change the fact the OTHER mode needs to re-check,
# so a shared per-path entry would let a flat append pre-validate a
# later partitioned write onto the files it just created. Lifecycle
# (ADVICE r15): the FLAT entry lands only after its append succeeds (a
# validate-then-fail must not stand as a pass), and each mode's path
# discards the OTHER mode's entry — flat on write success, batch as
# soon as the mode is entered (its partitions may have been committed
# by another process while a stale flat pass stood).
#
# SINGLE-WRITER-PROCESS ASSUMPTION (ADVICE r16, stated as a contract,
# not silently relied on): this cache is process-local memory, so the
# staleness rules above can only observe THIS process's writes. A flat
# append committed by ANOTHER process after this process's batch-mode
# pass leaves the batch entry standing while flat files sit on disk,
# and the next batch write here would build the mixed layout
# unvalidated — the cache cannot provide a cross-process guarantee.
# Spark admitted sinks are single-writer by construction (one
# streaming query owns a checkpoint/sink pair, and Structured
# Streaming refuses concurrent writers on one checkpoint), and the
# maintenance entrypoints are documented offline-only; multi-writer
# deployments must route every writer through one process, or clear
# this cache (`_forget_layout`) to pay a re-listing per write. A
# cross-process fingerprint (root mtime) was considered and rejected:
# every batch write creates a partition dir and touches the root
# mtime, so a fingerprint either re-lists per micro-batch — the
# O(#partitions) cost this cache exists to remove — or trusts
# sub-second mtime granularity; a guard that cannot be relied on is
# worse than a stated assumption.
_LAYOUT_CHECKED: set[tuple[str, str]] = set()


def _forget_layout(path: str) -> None:
    """Drop both modes' layout-cache entries for ``path`` — called by
    the maintenance entrypoints that rewrite the sink's on-disk shape."""
    key = _norm_sink_path(path)
    _LAYOUT_CHECKED.discard(("batch", key))
    _LAYOUT_CHECKED.discard(("flat", key))


def admit_sink_upsert(
    spark: SparkSession,
    admitted_rows: DataFrame,
    admitted_path: str,
    key: str,
    key_type: str = "bigint",
    batch_id: int | None = None,
) -> None:
    """Idempotent admitted-rows sink write — ONE copy shared by
    `operators.dedup.admit_minhash_batch` and
    `operators.similarity.admit_ivf_batch` (a per-operator copy is how
    the r12 footerless-dir bug shipped twice). Two modes:

    - ``batch_id`` given (the foreachBatch streaming path, which always
      has one): admissions land under ``admitted_path/batch_id=N`` —
      the standard idempotent-sink layout. A replay whose partition's
      JOB COMMIT completed (``_SUCCESS`` marker — see
      `job_commit_succeeded` for why any weaker file-presence test
      loses rows on a mid-job-commit crash) skips the write entirely;
      anything less is rewritten with mode=overwrite. Per-micro-batch
      sink cost is ONE existence check — O(1) in sink size, closing
      the O(corpus)-per-batch anti-join scan (VERDICT r12 item 4).
      Replay case analysis composes with the caller's
      ledger->sink->index ordering: a replay before the index append
      recomputes the SAME admissions (partition committed -> skip,
      anything less -> identical overwrite); a replay after it
      verdicts everything dup, writes nothing, and the committed
      partition is untouched. A sink carrying the legacy FLAT layout
      at its root is REFUSED loudly (mixed layouts break partition
      discovery for every later read — `migrate_admitted_sink` lifts a
      legacy sink into this layout in place).

      UNIQUENESS GUARANTEE (weaker than the flat mode's, by design —
      ADVICE r14): across micro-batches the sink is deduplicated at
      CONTENT level only, via the caller's index probe (a re-arriving
      doc is near-dup of its own indexed copy and verdicts 'dup').
      A key re-arriving with content DIVERGENT enough to clear the
      near-dup threshold is admitted again into its batch's partition,
      so the sink can hold the same ``key`` in two partitions — unlike
      the pre-r14 anti-join (and the reference's keyed ON CONFLICT DO
      NOTHING, …kt:138-141), which were key-level. That trade is
      deliberate: a keyed cross-batch check re-introduces the O(sink)
      scan per micro-batch this mode exists to remove, and for an
      admission pipeline 'same id, genuinely new content' is usually a
      new training document, not a conflict. Readers needing key-level
      uniqueness take latest-batch-wins at read time
      (``row_number() over (partition by key order by batch_id desc)``
      — batch_id is a partition column, so the scan prunes).

    - ``batch_id`` None (ad-hoc batch callers): the row-level
      first-write-wins anti-join against the whole sink — O(sink) per
      call, fine for one-shot batch admission. The membership read uses
      an EXPLICIT one-column schema: a footerless sink dir reads as
      zero rows (Spark's file listing skips ``_``/``.`` entries)
      instead of failing schema inference, so a crash during the very
      first sink write cannot poison every subsequent replay. Real read
      errors on committed files still propagate (the `upsert_append`
      principle: never swallow a failure into 'dedup disabled').

    The two layouts must not be mixed on one sink path (partitioned vs
    flat parquet).

    Maintenance constraint: the per-partition ``_SUCCESS`` markers ARE
    the idempotency ledger — a rewrite that drops them (e.g.
    `tables.compact_parquet`, which re-emits the partition layout but
    leaves one marker at the ROOT) makes every batch partition look
    un-committed again, and a subsequent replay of an already-indexed
    batch would overwrite it with the EMPTY admitted set (the docs are
    all dup against their own indexed copies by then). Use
    `compact_admitted_sink`, whose per-partition rewrite publishes each
    partition's own marker atomically with its data."""
    cache_key = _norm_sink_path(admitted_path)
    if batch_id is not None:
        # layout guard ONCE per sink per process (a per-batch root
        # listing would re-introduce an O(#partitions) metadata cost)
        if ("batch", cache_key) not in _LAYOUT_CHECKED:
            if _flat_data_files_at_root(spark, admitted_path):
                raise ValueError(
                    f"admitted sink {admitted_path} holds flat "
                    "(un-partitioned) data files at its root; writing "
                    "batch_id= partitions next to them would break "
                    "partition discovery for every later read — run "
                    "migrate_admitted_sink(spark, path) or use a fresh path"
                )
            # caching BEFORE the write is sound for this mode's own
            # fact ('no flat files at root'): a batch write — failed or
            # not — never creates flat root files; the only event that
            # stales it is a successful FLAT write, which discards this
            # entry below.
            _LAYOUT_CHECKED.add(("batch", cache_key))
        # The sink is (about to be) batch-partitioned: a standing flat
        # pass is stale from here on, even on the replay-skip path — an
        # empty flat append in this process followed by a partition
        # COMMITTED BY ANOTHER PROCESS would otherwise leave the flat
        # entry live with batch_id= dirs on disk (ADVICE r15).
        _LAYOUT_CHECKED.discard(("flat", cache_key))
        part_dir = os.path.join(admitted_path, f"batch_id={batch_id}")
        if job_commit_succeeded(spark, part_dir):
            return
        admitted_rows.write.mode("overwrite").parquet(part_dir)
        return
    # the mirror guard (ADVICE r14): an ad-hoc flat append onto a sink a
    # stream already partitioned would drop part files at the partition
    # root — the exact mixed-layout corruption the batch path refuses.
    if ("flat", cache_key) not in _LAYOUT_CHECKED:
        if _batch_partition_dirs_at_root(spark, admitted_path):
            raise ValueError(
                f"admitted sink {admitted_path} is batch_id= partitioned; "
                "appending flat data files at its root would break "
                "partition discovery for every later read — pass the "
                "stream's batch_id, or use a fresh path for ad-hoc batches"
            )
    to_insert = admitted_rows
    if target_exists(spark, admitted_path):
        existing = spark.read.schema(f"{key} {key_type}").parquet(
            admitted_path
        )
        to_insert = admitted_rows.join(existing, key, "left_anti")
    to_insert.write.mode("append").parquet(admitted_path)
    # Cache the flat pass only AFTER the append lands (ADVICE r15: a
    # validate-then-fail — or an empty append that leaves no root data
    # file — must not stand as a pass across a later partitioned write),
    # and stale the batch entry: this write may have just created the
    # flat root files the batch guard's cached 'no flat files' denies.
    _LAYOUT_CHECKED.add(("flat", cache_key))
    _LAYOUT_CHECKED.discard(("batch", cache_key))


def compact_admitted_sink(
    spark: SparkSession, admitted_path: str, target_files: int = 1
) -> dict:
    """MARKER-PRESERVING small-files compaction for the
    batch-partitioned admitted sink (r14): steady-state streaming
    admission writes one file-set per micro-batch, so the sink accretes
    small files exactly like the indexes do — but `tables.compact_parquet`
    must NOT be used here, because its partition-layout rewrite leaves
    ONE ``_SUCCESS`` at the root while `admit_sink_upsert`'s idempotency
    test is the PER-PARTITION marker: every batch would look
    un-committed again, and a checkpoint-reset replay of an
    already-indexed batch would overwrite its partition with the empty
    admitted set (see admit_sink_upsert's maintenance constraint).

    This compacts partition BY partition: each ``batch_id=N`` dir with
    more than ``target_files`` data files is rewritten (coalesced) into
    a HIDDEN sibling tmp dir — whose own ``_SUCCESS`` marker Spark
    writes as part of the rewrite, BEFORE any rename — then two-rename
    swapped into place via `tables._commit_swap`. At every crash point
    a partition is therefore wholly old (marked) or wholly new
    (marked); the idempotency ledger is never stripped. The tmp/old
    names are dot-prefixed (``.compact_tmp_batch_id=N``) rather than
    the index compaction's ``<path>._suffix`` shape: a crash-stranded
    ``batch_id=N._compacting`` dir would contain ``=`` and poison the
    sink's partition discovery until cleanup, while a dot-prefixed dir
    is invisible to readers. A partition left missing by a crash
    between the two renames is restored from its old dir on the next
    run (the `_swap_paths` recovery rule, applied per partition).

    Offline maintenance, like the index compactions: do not run it
    concurrently with the writing stream. Returns
    ``{"partitions_compacted", "files_before", "files_after"}``."""
    from .tables import _commit_swap

    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(admitted_path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    # the rewrite changes the sink's on-disk shape under the per-process
    # layout cache — force the next write's guard to re-validate
    _forget_layout(admitted_path)

    def _n_data_files(dir_path) -> int:
        return sum(
            1
            for f in fs.listStatus(dir_path)
            if f.isFile()
            and not f.getPath().getName().startswith("_")
            and not f.getPath().getName().startswith(".")
        )

    def _hidden(kind: str, part: str):
        return jvm.org.apache.hadoop.fs.Path(
            f"{admitted_path.rstrip('/')}/.compact_{kind}_{part}"
        )

    # crash recovery first: a partition missing with its old dir
    # present means a previous run died between the two swap renames —
    # the old dir IS the live (marked) data; restore before anything
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith(".compact_tmp_"):
            # tmp is never the live data (the swap promotes it in the
            # same call that wrote it): at recovery time it is always a
            # crash leftover
            fs.delete(st.getPath(), True)
            continue
        if name.startswith(".compact_old_"):
            part = name[len(".compact_old_"):]
            live = jvm.org.apache.hadoop.fs.Path(
                f"{admitted_path.rstrip('/')}/{part}"
            )
            if not fs.exists(live):
                if not fs.rename(st.getPath(), live):
                    raise IOError(
                        f"sink compaction recovery failed: could not "
                        f"restore {name} to {part}"
                    )
            else:
                # live partition present -> the old dir is a stale
                # leftover from a crash AFTER the swap completed; a
                # skipped (already-compact) partition would otherwise
                # carry it forever
                fs.delete(st.getPath(), True)

    stats = {"partitions_compacted": 0, "files_before": 0, "files_after": 0}
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not name.startswith("batch_id="):
            continue
        if not st.isDirectory():
            continue
        n_files = _n_data_files(st.getPath())
        stats["files_before"] += n_files
        if n_files <= target_files:
            stats["files_after"] += n_files
            continue
        tmp, old = _hidden("tmp", name), _hidden("old", name)
        for stale in (tmp, old):
            if fs.exists(stale):
                fs.delete(stale, True)
        pdir = st.getPath().toUri().getPath()
        # the rewrite itself creates tmp's _SUCCESS — the marker is in
        # place before the swap publishes anything
        spark.read.parquet(pdir).coalesce(target_files).write.mode(
            "overwrite"
        ).parquet(str(tmp))
        _commit_swap(fs, st.getPath(), tmp, old, pdir)
        stats["partitions_compacted"] += 1
        # re-count the swapped-in partition rather than assuming
        # target_files: coalesce(n) emits one file per NON-EMPTY input
        # partition, so a small batch can land under target_files and
        # the assumption would overstate (even exceed files_before for
        # a large target_files) — ADVICE r14
        stats["files_after"] += _n_data_files(st.getPath())
    return stats


def migrate_admitted_sink(
    spark: SparkSession, admitted_path: str, legacy_batch_id: int = -1
) -> dict:
    """Lift a legacy FLAT admitted sink (the pre-r14 anti-join layout)
    into the ``batch_id=`` partitioned layout in place, unblocking the
    refusal in `admit_sink_upsert` for sinks created before the
    partitioned mode existed (VERDICT r14 item 4). All legacy rows land
    in ONE partition, ``batch_id=-1`` by default — foreachBatch batch
    ids are non-negative, so the legacy partition can never collide
    with a future stream batch — with the partition's own ``_SUCCESS``
    marker written by the rewrite itself, exactly the idempotency shape
    `admit_sink_upsert` expects.

    Offline maintenance (never run against a live writer), crash-safe
    and re-run-convergent via a hidden root manifest:

    1. ``.migrate_manifest`` is written FIRST, recording the target
       partition id on its header line plus every flat data file being
       migrated — it is what distinguishes 'crashed mid-migration' from
       'genuinely mixed layout' on re-run, and recovery reads the id
       FROM the manifest, so a re-run invoked with a different
       ``legacy_batch_id`` still converges the crashed migration
       instead of deleting its own breadcrumb (self-review r15);
    2. the flat rows are rewritten into a hidden tmp dir (Spark writes
       the tmp's ``_SUCCESS`` before any rename), then one rename
       publishes it as the legacy partition;
    3. only the MANIFESTED flat files are deleted, then the manifest.

    Re-run after a crash: manifest present + legacy partition committed
    -> finish the cleanup (delete manifested files + manifest);
    manifest present + partition not committed -> discard tmp/manifest
    and restart from the flat files, which are still intact. A root
    holding both flat files and ``batch_id=`` dirs WITHOUT a manifest
    was never produced by this tool — refused loudly, because deleting
    those flat rows would be silent data loss. Returns
    ``{"status", "files_migrated", "legacy_batch_id"}``."""
    if legacy_batch_id >= 0:
        # foreachBatch ids are non-negative: a legacy partition at e.g.
        # batch_id=0 would make stream batch 0's committed-marker check
        # see the LEGACY rows as its own completed write and silently
        # skip — the no-collision guarantee only holds below zero
        raise ValueError(
            f"legacy_batch_id must be negative (got {legacy_batch_id}): "
            "non-negative ids collide with future stream batch ids"
        )
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(admitted_path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    _forget_layout(admitted_path)
    if not fs.exists(root):
        return {"status": "empty", "files_migrated": 0,
                "legacy_batch_id": legacy_batch_id}

    def _p(name: str):
        return jvm.org.apache.hadoop.fs.Path(
            f"{admitted_path.rstrip('/')}/{name}"
        )

    manifest, tmp = _p(".migrate_manifest"), _p(".migrate_tmp")

    def _flat_names() -> list[str]:
        return sorted(
            st.getPath().getName()
            for st in fs.listStatus(root)
            if st.isFile()
            and not st.getPath().getName().startswith("_")
            and not st.getPath().getName().startswith(".")
        )

    def _cleanup(names: list[str]) -> None:
        for name in names:
            f = _p(name)
            if fs.exists(f):
                fs.delete(f, False)
        fs.delete(manifest, False)

    if fs.exists(manifest):
        stream = fs.open(manifest)
        try:
            # small file: a 'batch_id=<n>' header line then one flat
            # file name per line, written by this tool
            raw = bytes(stream.readAllBytes()).decode("utf-8")
        finally:
            stream.close()
        lines = [line for line in raw.splitlines() if line]
        # recovery is keyed to the id RECORDED at crash time, never the
        # current call's argument (which may differ). Degenerate shapes
        # (self-review r15, both passes): an EMPTY or header-TRUNCATED
        # manifest ('batch_id=' with the value lost mid-flush) means
        # the write buffer died before the manifest was complete — and
        # the manifest is written strictly BEFORE anything is published,
        # so nothing was: restart from the intact flat files. A
        # HEADERLESS manifest (the first r15 format) is all names; that
        # format's migrations published under the CALLER-SUPPLIED id
        # (its recovery contract was a same-args re-run), so recover
        # under the current call's id rather than assuming -1.
        if lines and lines[0].startswith("batch_id="):
            try:
                rec_id = int(lines[0].split("=", 1)[1])
                names = lines[1:]
            except ValueError:
                rec_id, names = legacy_batch_id, []
        else:
            rec_id, names = legacy_batch_id, lines
            # The headerless format cannot tell us the crashed call's
            # id. If that run already PUBLISHED under a different id,
            # assuming the current argument would read 'not committed',
            # delete the only breadcrumb, and strand duplicated rows
            # (flat files + the published partition) behind the
            # mixed-layout refusal (ADVICE r15). The published
            # partition is findable: migration ids are negative and
            # stream ids non-negative, so any COMMITTED negative
            # partition is a migration's. But 'exactly one committed
            # negative partition' is NOT proof it is the crashed run's
            # publish (ADVICE r16): a committed negative partition
            # persists forever after any SUCCESSFUL migration, so if
            # flat files later reappear on the sink (manual copy,
            # another process's stale layout cache) and a second
            # migration crashes before publishing, the OLD partition
            # would be adopted and 'finishing the cleanup' would
            # delete never-migrated flat files — silent row loss.
            # Adoption therefore requires the one fact the cleanup
            # actually relies on, checked directly: every manifested
            # flat row is CONTAINED in the candidate partition (true
            # for a real crashed-after-publish, since the publish IS
            # the rewrite of those files; and if an old partition
            # happens to contain them all, deleting the flat copies
            # is safe by the same containment). Containment fails ->
            # refuse loudly instead of guessing. More than one
            # committed negative partition is a state this tool never
            # produces -> refuse likewise.
            if not job_commit_succeeded(spark, str(_p(f"batch_id={rec_id}"))):
                negs = []
                for st in fs.listStatus(root):
                    nm = st.getPath().getName()
                    if not (st.isDirectory() and nm.startswith("batch_id=-")):
                        continue
                    try:
                        neg = int(nm.split("=", 1)[1])
                    except ValueError:
                        continue
                    if job_commit_succeeded(spark, str(st.getPath())):
                        negs.append(neg)
                negs.sort()
                if len(negs) == 1:
                    live = [n for n in names if fs.exists(_p(n))]
                    covered = True
                    if live:
                        flat_rows = spark.read.parquet(
                            *(str(_p(n)) for n in live)
                        )
                        part_rows = spark.read.parquet(
                            str(_p(f"batch_id={negs[0]}"))
                        ).select(*flat_rows.columns)
                        # MULTISET containment (r17 self-review), not
                        # set containment: a flat row present TWICE
                        # (legacy double-append) but once in the
                        # candidate partition would pass an anti-join
                        # and still lose a copy on cleanup. Compare
                        # per-row-value COUNTS: every flat group must
                        # appear at least as often in the partition.
                        # The null-rejecting join keeps the old
                        # NULL-fails-toward-REFUSAL direction — a flat
                        # group with a NULL column never matches, so
                        # pc reads NULL and the guard refuses.
                        cols = flat_rows.columns
                        fcnt = flat_rows.groupBy(cols).agg(
                            F.count(F.lit(1)).alias("_fc")
                        )
                        pcnt = part_rows.groupBy(cols).agg(
                            F.count(F.lit(1)).alias("_pc")
                        )
                        short = fcnt.join(pcnt, on=cols, how="left").filter(
                            F.col("_pc").isNull()
                            | (F.col("_fc") > F.col("_pc"))
                        )
                        covered = short.limit(1).count() == 0
                    if covered:
                        rec_id = negs[0]
                    else:
                        raise ValueError(
                            f"admitted sink {admitted_path} holds a "
                            f"headerless migration manifest ({manifest}) "
                            f"and a committed negative batch partition "
                            f"batch_id={negs[0]} that does NOT contain "
                            "the manifested flat rows — it is a PREVIOUS "
                            "migration's publish, not the crashed run's; "
                            "deleting the manifested files would lose "
                            "rows. Re-run migrate_admitted_sink with the "
                            "id the crashed run used, or resolve by hand "
                            "(the manifest lists the files it was "
                            "migrating)"
                        )
                elif len(negs) > 1:
                    raise ValueError(
                        f"admitted sink {admitted_path} holds a headerless "
                        f"migration manifest ({manifest}) and MULTIPLE "
                        f"committed negative batch partitions {negs}; the "
                        "crashed migration's id cannot be recovered — "
                        "resolve by hand (the manifest lists the flat "
                        "files the crashed run was migrating)"
                    )
        rec_part = _p(f"batch_id={rec_id}")
        if job_commit_succeeded(spark, str(rec_part)):
            # crashed between publish and cleanup — finish the cleanup
            _cleanup(names)
            if fs.exists(tmp):
                fs.delete(tmp, True)
            return {"status": "recovered", "files_migrated": len(names),
                    "legacy_batch_id": rec_id}
        # crashed before publish: the flat files are still the live
        # data — discard partials and fall through to a fresh attempt
        for stale in (tmp, rec_part):
            if fs.exists(stale):
                fs.delete(stale, True)
        fs.delete(manifest, False)

    part_name = f"batch_id={legacy_batch_id}"
    part = _p(part_name)

    flat = _flat_names()
    if not flat:
        return {"status": "already_partitioned", "files_migrated": 0,
                "legacy_batch_id": legacy_batch_id}
    if _batch_partition_dirs_at_root(spark, admitted_path):
        raise ValueError(
            f"admitted sink {admitted_path} holds BOTH flat data files and "
            "batch_id= partitions with no migration manifest — this tool "
            "never produces that state, so it cannot tell which rows are "
            "live; resolve the mixed layout by hand before migrating"
        )
    if fs.exists(tmp):
        fs.delete(tmp, True)
    out = fs.create(manifest, True)
    out.write(
        (f"batch_id={legacy_batch_id}\n" + "\n".join(flat) + "\n").encode(
            "utf-8"
        )
    )
    out.close()
    # the flat read is schema-inferred from committed footers (these
    # files were published by append-mode writes, never a crash husk —
    # a husk dir has no committed data files to list)
    spark.read.parquet(
        *(f"{admitted_path.rstrip('/')}/{name}" for name in flat)
    ).write.mode("overwrite").parquet(str(tmp))
    if not fs.rename(tmp, part):
        raise IOError(
            f"sink migration failed: could not publish {part_name} "
            f"under {admitted_path}"
        )
    _cleanup(flat)
    return {"status": "migrated", "files_migrated": len(flat),
            "legacy_batch_id": legacy_batch_id}


def upsert_append(new_rows: DataFrame, target_path: str, keys: list[str]) -> None:
    """Cross-batch W3: append only rows whose key is absent from the
    target (left_anti = the ON CONFLICT DO NOTHING membership test,
    …kt:138-141). Existing rows always win.

    The first-write branch is taken only on an explicit existence check —
    never by swallowing read errors: a transient failure reading an
    EXISTING target must propagate, not silently disable dedup and
    append duplicates (the one corruption the reference's ON CONFLICT
    could never produce)."""
    spark = new_rows.sparkSession
    if target_exists(spark, target_path):
        existing = spark.read.parquet(target_path).select(*keys)
        to_insert = new_rows.join(existing, on=keys, how="left_anti")
    else:
        to_insert = new_rows
    to_insert.write.mode("append").partitionBy("date").parquet(target_path)


def ingest_covid_csv(
    spark: SparkSession,
    src_path: str,
    target_path: str,
    *,
    has_county: bool,
    metrics_out: dict | None = None,
) -> DataFrame:
    """EP1/EP2 collapsed into one declarative pipeline: scan -> type ->
    sentinel -> in-batch dedup -> cross-batch anti-join append.

    Pass ``metrics_out={}`` to collect batch data-quality counters via
    ``df.observe`` — row count, sentinel'd null-fips count, null-date
    count — measured DURING the append's single pass over the batch
    (an accumulator-style side channel, not a second scan: at 100 TB a
    separate QC count would double the read). The observed node sits
    after dedup and before the anti-join, so the numbers describe the
    batch as written on first ingest and the whole candidate batch on
    re-runs."""
    from pyspark.sql import Observation

    schema = schemas.COVID_COUNTIES_CSV if has_county else schemas.COVID_STATES_CSV
    keys = schemas.COVID_COUNTIES_KEYS if has_county else schemas.COVID_STATES_KEYS
    raw = read_csv(spark, src_path, schema).withColumn(
        "_arrival", F.monotonically_increasing_id()
    )
    typed = parse_covid_rows(raw, has_county=has_county, passthrough=("_arrival",))
    # P5: null fips -> -1 sentinel so it participates in the unique key
    # (Postgres unique indexes treat NULLs as distinct; …kt:133,171).
    typed = typed.withColumn("fips", F.coalesce("fips", F.lit(-1)))
    deduped = first_write_wins(typed, keys, "_arrival").drop("_arrival")
    obs = None
    if metrics_out is not None:
        obs = Observation("ingest_quality")
        deduped = deduped.observe(
            obs,
            F.count(F.lit(1)).alias("batch_rows"),
            # coalesce: on an all-filtered/empty batch SUM is NULL, and
            # downstream arithmetic on the counters must see 0, not None
            F.coalesce(
                F.sum((F.col("fips") == -1).cast("long")), F.lit(0)
            ).alias("null_fips_rows"),
            F.coalesce(
                F.sum(F.col("date").isNull().cast("long")), F.lit(0)
            ).alias("null_date_rows"),
        )
    upsert_append(deduped, target_path, keys)
    if obs is not None:
        metrics_out.update(obs.get)
    return spark.read.parquet(target_path)


def derive_states_fixture(orders: DataFrame) -> DataFrame:
    """The deterministic NYT-states-shaped fixture both ingest entries
    feed: a (month, priority, custkey-derived-fips) aggregate of the
    `orders` table — key-level, so duplicate CSV rows are byte-identical
    and the dedup winner is arrival-independent. ~1/10 of fips values
    are NULL to exercise P3/P5."""
    fips = F.when(F.col("o_custkey") % 10 == 0, F.lit(None)).otherwise(
        (F.col("o_custkey") % 100).cast("int")
    )
    return orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate").cast("date")).cast("date").alias("date"),
        F.col("o_orderpriority").alias("state"),
        fips.alias("fips"),
    ).agg(F.sum("o_orderkey").alias("cases"), F.count(F.lit(1)).alias("deaths"))


# The DuckDB twin of derive_states_fixture (fips nulls already -1 via
# COALESCE — the ingested table's P5 shape). ONE copy: the flat oracle
# of ingest_covid_states and the `derived` CTE of both audited entries
# (lineage, rollback) are built from this string, so a fixture-rule
# tweak cannot silently desynchronize their oracles (self-review r11).
_DERIVED_STATES_SQL = """SELECT CAST(date_trunc('month', o_orderdate) AS DATE)   AS date,
       o_orderpriority                                  AS state,
       COALESCE(CASE WHEN o_custkey % 10 = 0 THEN NULL
                     ELSE CAST(o_custkey % 100 AS INT) END, -1) AS fips,
       CAST(SUM(o_orderkey) AS BIGINT)                  AS cases,
       CAST(COUNT(*) AS BIGINT)                         AS deaths
FROM orders
GROUP BY CAST(date_trunc('month', o_orderdate) AS DATE), o_orderpriority,
         CASE WHEN o_custkey % 10 = 0 THEN NULL
              ELSE CAST(o_custkey % 100 AS INT) END"""


@query(
    "ingest_covid_states",
    tables=("orders",),
    oracle=f"\n{_DERIVED_STATES_SQL}\n",
)
def ingest_covid_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's LITERAL pipeline under the driver's oracle gate:
    S1-S3 CSV scan (explicit schema, header, comma) -> P1-P5 typed
    projection (ISO date parse, ''->NULL fips, null->-1 sentinel) -> W3
    first-write-wins dedup + anti-join upsert -> date-partitioned table,
    ingested TWICE to exercise the O3/O4 idempotent re-run live.

    The input CSV is derived deterministically from the `orders` fixture
    (key-level aggregate, so duplicate rows are byte-identical and the
    dedup winner is arrival-independent), unioned with itself so the
    in-batch dedup does real work. Fixture generation is fully
    Spark-side (distributed CSV write — nulls as '', ISO dates, the NYT
    file shape) — nothing is ever collected to the driver, so the entry
    scales with the fixture like every other catalog query.
    """
    t = load_tables(spark, sf_dir, "orders")
    # Month grain, not day: the target is partitioned by `date`, and ~80
    # month partitions exercise partition pruning exactly like ~2400 day
    # partitions while keeping the twice-run fixture pipeline fast (the
    # 55s day-grain variant spent its time creating 2x2405 tiny
    # partition directories — the small-files antipattern compact_parquet
    # exists to fix, not something the gate entry should manufacture).
    derived = derive_states_fixture(t.orders)
    workdir = tempfile.mkdtemp(prefix="ingest_covid_states_")
    csv_path = os.path.join(workdir, "states_csv")
    # Each row twice: byte-identical in-batch duplicates for W3 to kill.
    # Spark's CSV writer emits NULL as '' (P3's inverse) and dates as ISO.
    (
        derived.unionByName(derived)
        .coalesce(1)  # one part-file: the reference reads ONE remote CSV
        .write.option("header", True)
        .csv(csv_path)
    )
    target = os.path.join(workdir, "covid_states")
    ingest_covid_csv(spark, csv_path, target, has_county=False)
    out = ingest_covid_csv(spark, csv_path, target, has_county=False)
    return out.select(
        F.col("date").cast("date").alias("date"),
        "state",
        F.col("fips").cast("int").alias("fips"),
        F.col("cases").cast("long").alias("cases"),
        F.col("deaths").cast("long").alias("deaths"),
    )


def _write_named_csv(df: DataFrame, directory: str, filename: str) -> None:
    """Write ``df`` as ONE named CSV file (header, '' for NULL) inside
    ``directory`` — the fixture shape for lineage tests: a *stable
    basename* that input_file_name() can be checked against. Spark names
    its part files itself, so write to a scratch dir and rename the
    single part file into place."""
    import glob as _glob
    import shutil

    scratch = tempfile.mkdtemp(prefix="named_csv_")
    df.coalesce(1).write.option("header", True).mode("overwrite").csv(scratch)
    parts = _glob.glob(os.path.join(scratch, "part-*.csv"))
    if len(parts) != 1:  # pragma: no cover - coalesce(1) guarantees one
        raise IOError(f"expected one part file, found {parts}")
    os.makedirs(directory, exist_ok=True)
    shutil.move(parts[0], os.path.join(directory, filename))
    shutil.rmtree(scratch, ignore_errors=True)


def ingest_covid_csv_audited(
    spark: SparkSession,
    src_path: str,
    target_path: str,
    *,
    batch_id: int,
    has_county: bool,
) -> DataFrame:
    """The ingest chain with LINEAGE/AUDIT columns (O3 made queryable —
    VERDICT r9 item 4b): every row written to the target carries

    - ``source_file``: basename of the CSV file the row came from,
      captured at scan time via ``input_file_name()`` — per-ROW file
      lineage, not per-job bookkeeping, so a multi-file batch stays
      attributable after the union;
    - ``batch_id``: the ingest run that FIRST wrote the row. The
      first-write-wins upsert means a re-delivered row keeps its
      original batch_id forever — exactly the provenance question a
      takedown or bad-batch rollback asks ("which rows did batch 7
      introduce?"), answerable by a partition-pruned filter instead of
      replaying job logs.

    Same S1-P5-W3 semantics as ``ingest_covid_csv``; the audit columns
    ride through dedup and the anti-join unchanged. Scale notes: both
    columns are scan-time literals/metadata — no extra shuffle, no
    second pass; a delete of "everything batch N wrote" is then
    ``delete_rows_partition_scoped(..., F.col('batch_id') == N)``.
    """
    schema = schemas.COVID_COUNTIES_CSV if has_county else schemas.COVID_STATES_CSV
    keys = schemas.COVID_COUNTIES_KEYS if has_county else schemas.COVID_STATES_KEYS
    raw = read_csv(spark, src_path, schema).withColumns(
        {
            "_arrival": F.monotonically_increasing_id(),
            "source_file": F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1),
        }
    )
    typed = parse_covid_rows(
        raw, has_county=has_county, passthrough=("_arrival", "source_file")
    )
    typed = typed.withColumn("fips", F.coalesce("fips", F.lit(-1))).withColumn(
        "batch_id", F.lit(batch_id).cast("int")
    )
    deduped = first_write_wins(typed, keys, "_arrival").drop("_arrival")
    upsert_append(deduped, target_path, keys)
    return spark.read.parquet(target_path)


_HIGH_STATES = ("1-URGENT", "2-HIGH")


def _two_batch_audited_fixture(spark: SparkSession, sf_dir: str, prefix: str) -> str:
    """Write the two-batch lineage fixture and run both audited ingests
    into a fresh target; returns the target path. Batch 1 = the
    high-priority slice (one named CSV); batch 2 = the grown full
    snapshot (re-delivers the high file + the rest — the NYT shape,
    where the published file only grows). ONE copy shared by
    `ingest_lineage_audit` and `ingest_rollback_batch`, so the slice
    rule their oracles hardcode cannot drift between them."""
    t = load_tables(spark, sf_dir, "orders")
    derived = derive_states_fixture(t.orders)
    workdir = tempfile.mkdtemp(prefix=prefix)
    batch1_dir = os.path.join(workdir, "batch1")
    batch2_dir = os.path.join(workdir, "batch2")
    high = derived.filter(F.col("state").isin(*_HIGH_STATES))
    rest = derived.filter(~F.col("state").isin(*_HIGH_STATES))
    _write_named_csv(high, batch1_dir, "batch_high.csv")
    _write_named_csv(high, batch2_dir, "batch_high.csv")
    _write_named_csv(rest, batch2_dir, "batch_rest.csv")

    target = os.path.join(workdir, "covid_states_audited")
    ingest_covid_csv_audited(spark, batch1_dir, target, batch_id=1, has_county=False)
    ingest_covid_csv_audited(spark, batch2_dir, target, batch_id=2, has_county=False)
    return target


def _three_batch_audited_fixture(
    spark: SparkSession, sf_dir: str, prefix: str
) -> tuple[str, dict[int, str]]:
    """The INTERIOR-rollback fixture: batch 1 = the high-priority slice,
    batch 2 (the bad batch) re-delivers it plus the medium slice, batch
    3 = the full snapshot in one file. Returns (target path, replay
    sources for the later batches) — batch 2's own source dir is
    deliberately NOT in the replay map: rolling IT back must not need
    it."""
    t = load_tables(spark, sf_dir, "orders")
    derived = derive_states_fixture(t.orders)
    workdir = tempfile.mkdtemp(prefix=prefix)
    b1, b2, b3 = (os.path.join(workdir, f"batch{i}") for i in (1, 2, 3))
    high = derived.filter(F.col("state").isin(*_HIGH_STATES))
    med = derived.filter(F.col("state") == "3-MEDIUM")
    _write_named_csv(high, b1, "batch_high.csv")
    _write_named_csv(high, b2, "batch_high.csv")
    _write_named_csv(med, b2, "batch_med.csv")
    _write_named_csv(derived, b3, "batch_full.csv")
    target = os.path.join(workdir, "covid_states_audited")
    for i, d in ((1, b1), (2, b2), (3, b3)):
        ingest_covid_csv_audited(spark, d, target, batch_id=i, has_county=False)
    return target, {3: b3}


@query(
    "ingest_rollback_replay",
    tables=("orders",),
    oracle=f"""
WITH derived AS (
{_DERIVED_STATES_SQL}
)
SELECT CASE WHEN state IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 3 END AS batch_id,
       CASE WHEN state IN ('1-URGENT', '2-HIGH') THEN 'batch_high.csv'
            ELSE 'batch_full.csv' END                              AS source_file,
       state,
       CAST(COUNT(*) AS BIGINT)    AS n_rows,
       CAST(SUM(cases) AS BIGINT)  AS cases_sum,
       CAST(SUM(deaths) AS BIGINT) AS deaths_sum
FROM derived
GROUP BY 1, 2, 3
""",
)
def ingest_rollback_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERIOR-batch rollback under the driver's gate (VERDICT r11
    item 5): batch 1 ingests the high slice, batch 2 re-delivers it
    plus the medium slice, batch 3 delivers the full snapshot — then
    batch 2 is declared bad and `rollback_interior_batch` undoes it
    while KEEPING batch 3, replaying batch 3 from its original source
    files. The post-repair table must equal never-having-run batch 2:
    high rows still (batch 1, batch_high.csv); the medium rows batch 2
    introduced come BACK — re-attributed (batch 3, batch_full.csv),
    because in the counterfactual batch 3 would have first-written
    them; every other row is batch 3's. The oracle derives that end
    state from the slice rule alone, so a delete-only rollback (medium
    rows vanish), a replay that loses re-deliveries, or an identity
    leak (medium rows keeping batch 2's id or file) each break the
    hash.

    Scale notes: the delete rewrites only the partitions batch 2's
    rows live in; the replay's anti-join re-inserts exactly the
    re-delivered rows (cost ∝ those rows, not the table); landing-zone
    retention supplies the replay sources (`rollback_interior_batch`
    docstring)."""
    target, sources = _three_batch_audited_fixture(spark, sf_dir, "ingest_replay_")
    rollback_interior_batch(spark, target, 2, sources, has_county=False)
    return spark.read.parquet(target).groupBy(
        "batch_id", "source_file", "state"
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("cases").alias("cases_sum"),
        F.sum("deaths").alias("deaths_sum"),
    )


@query(
    "ingest_lineage_audit",
    tables=("orders",),
    oracle=f"""
WITH derived AS (
{_DERIVED_STATES_SQL}
)
SELECT CASE WHEN state IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 2 END AS batch_id,
       CASE WHEN state IN ('1-URGENT', '2-HIGH') THEN 'batch_high.csv'
            ELSE 'batch_rest.csv' END                              AS source_file,
       state,
       CAST(COUNT(*) AS BIGINT)   AS n_rows,
       CAST(SUM(cases) AS BIGINT) AS cases_sum,
       CAST(SUM(deaths) AS BIGINT) AS deaths_sum
FROM derived
GROUP BY 1, 2, 3
""",
)
def ingest_lineage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-run lineage under the driver's gate: batch 1 ingests the
    high-priority slice (one named CSV), batch 2 re-delivers the FULL
    snapshot (both files — the NYT shape, where the published file only
    grows). First-write-wins means every high-priority row must still
    carry ``(batch_id=1, source_file='batch_high.csv')`` after batch 2
    re-delivered it, and the remaining rows carry batch 2's identity —
    the oracle derives both labels from the slice rule alone, so a
    lineage column lying about who wrote a row (or the anti-join
    letting batch 2 overwrite batch 1) is a hash mismatch, not a log
    archaeology exercise.

    Scale notes: lineage costs zero extra passes (scan-time metadata);
    the audit aggregate is bounded by #batches x #files x #states."""
    target = _two_batch_audited_fixture(spark, sf_dir, "ingest_lineage_")
    out = spark.read.parquet(target)
    return out.groupBy("batch_id", "source_file", "state").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("cases").alias("cases_sum"),
        F.sum("deaths").alias("deaths_sum"),
    )


def rollback_ingest_batch(spark: SparkSession, target_path: str, batch_id: int) -> int:
    """Undo everything ingest batch ``batch_id`` wrote to an audited
    target — the batch-side twin of the streaming
    ``rollback_checkpoint`` repair (VERDICT r10 item 6). Because
    first-write-wins pins ``batch_id`` to the run that FIRST wrote each
    row, deleting ``batch_id == N`` removes exactly the rows batch N
    introduced and nothing a prior batch owns — so the table reverts to
    its pre-batch-N state without a snapshot: the lineage column IS the
    undo log. Implemented as a partition-scoped predicate delete
    (``delete_rows_partition_scoped``): one column-pruned scan finds
    the date partitions batch N touched, only those rewrite. Returns
    rows deleted.

    The inverse direction (undo batch N-1 but keep batch N) is NOT
    expressible this way: rows batch N re-delivered but batch N-1 wrote
    first would vanish with their first writer — rolling back an
    interior batch needs the re-deliveries replayed afterwards
    (`rollback_interior_batch` below), exactly like the streaming
    repair replays post-rollback batches."""
    from .tables import delete_rows_partition_scoped

    return delete_rows_partition_scoped(
        spark, target_path, "date", F.col("batch_id") == batch_id
    )


def rollback_interior_batch(
    spark: SparkSession,
    target_path: str,
    batch_id: int,
    replay_sources: dict[int, str],
    *,
    has_county: bool,
) -> dict:
    """Undo INTERIOR batch ``batch_id`` while KEEPING later batches —
    the redelivery-replay direction `rollback_ingest_batch` documents
    as inexpressible by deletion alone (VERDICT r11 item 5). Deleting
    batch N-1's rows would also lose every row a LATER batch
    re-delivered but N-1 first-wrote (first-write-wins pinned those
    rows to N-1), so the repair is delete-then-replay:

    1. determine the later batches to replay as the UNION of (a) every
       ``replay_sources`` key > ``batch_id`` and (b) every later batch
       observed in the lineage column (one column-pruned distinct), and
       REFUSE if any observed one is missing from ``replay_sources`` —
       a partial replay would silently lose the unreplayable batch's
       re-deliveries. The union matters: a later batch whose rows were
       ALL shadowed by earlier first-writers leaves no lineage row, so
       the table alone cannot enumerate it — yet the counterfactual
       needs it replayed (it would have first-written what N-1 did).
       The caller's ingest ledger (here: ``replay_sources``) is the
       source of truth for which batches ran; the lineage check is the
       guard for ledger omissions that DID leave rows;
    2. delete EXACTLY batch ``batch_id``'s rows (the same partition-
       scoped predicate delete as the exact-batch rollback — later
       batches' rows are never touched);
    3. re-run the audited ingest for each later batch in ascending
       order from its ORIGINAL source files with its ORIGINAL batch
       id: the upsert's anti-join re-inserts ONLY the rows the delete
       removed that the later batch re-delivered, now attributed to
       that batch — replay cost ∝ re-delivered rows, not table size.

    First-write-wins makes the outcome exact, case by case: rows only
    batch N-1 introduced are gone (nothing re-delivers them — and if a
    later batch DID deliver one, it comes back under that batch, which
    is precisely the counterfactual identity); rows N-1 first-wrote
    but a later batch re-delivered return with the EARLIEST replaying
    batch's identity (ascending order = the counterfactual first
    writer); rows later batches introduced are untouched. The table
    equals the state of NEVER HAVING RUN batch N-1, row for row
    (pinned in tests/test_ingest.py against an independently built
    counterfactual target, and by the `ingest_rollback_replay` oracle
    entry).

    ``replay_sources`` is the landing-zone retention contract: at
    100 TB the ingest queue keeps source files addressable by batch
    (the reference's published-CSV shape trivially does — the file
    only grows in place). Returns ``{"rows_deleted",
    "batches_replayed"}``."""
    observed = {
        r["batch_id"]
        for r in spark.read.parquet(target_path)
        .filter(F.col("batch_id") > batch_id)
        .select("batch_id")
        .distinct()
        .collect()
    }
    missing = sorted(b for b in observed if b not in replay_sources)
    if missing:
        raise ValueError(
            f"cannot roll back interior batch {batch_id}: later batches "
            f"{missing} have no replay source — deleting without replaying "
            "them would lose their re-delivered rows"
        )
    # observed ∪ declared: a fully-shadowed later batch (zero surviving
    # rows) is invisible to the lineage scan but still must replay
    later = sorted(observed | {b for b in replay_sources if b > batch_id})
    from .tables import delete_rows_partition_scoped

    deleted = delete_rows_partition_scoped(
        spark, target_path, "date", F.col("batch_id") == batch_id
    )
    for b in later:
        ingest_covid_csv_audited(
            spark, replay_sources[b], target_path, batch_id=b, has_county=has_county
        )
    return {"rows_deleted": deleted, "batches_replayed": len(later)}


@query(
    "ingest_rollback_batch",
    tables=("orders",),
    oracle=f"""
WITH derived AS (
{_DERIVED_STATES_SQL}
)
SELECT 1 AS batch_id,
       state,
       CAST(COUNT(*) AS BIGINT)    AS n_rows,
       CAST(SUM(cases) AS BIGINT)  AS cases_sum,
       CAST(SUM(deaths) AS BIGINT) AS deaths_sum
FROM derived
WHERE state IN ('1-URGENT', '2-HIGH')
GROUP BY state
""",
)
def ingest_rollback_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bad-batch rollback under the driver's gate: batch 1 ingests the
    high-priority slice, batch 2 delivers the full snapshot (re-
    delivering batch 1's rows plus the rest), then batch 2 is declared
    bad and ``rollback_ingest_batch`` undoes it. The post-rollback
    table must equal the post-batch-1 state EXACTLY: the oracle derives
    that state from the slice rule alone (high states only, every row
    batch_id 1), so a rollback that leaves any batch-2 row behind
    produces extra groups, and one that deletes a batch-1 row from a
    rewritten partition breaks the per-state checksums. Proves the
    lineage column is a working undo log, not just an audit answer.

    Scale notes: the rollback rewrites only the date partitions batch 2
    touched (partition-scoped predicate delete, cost ∝ touched
    partitions); at 100 TB an ingest-date-partitioned layout makes the
    same undo a directory drop."""
    target = _two_batch_audited_fixture(spark, sf_dir, "ingest_rollback_")
    rollback_ingest_batch(spark, target, 2)
    return (
        spark.read.parquet(target)
        .groupBy("batch_id", "state")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cases").alias("cases_sum"),
            F.sum("deaths").alias("deaths_sum"),
        )
    )
