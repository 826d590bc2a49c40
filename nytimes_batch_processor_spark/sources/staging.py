"""S1 fetch-to-staging: the reference's HTTP CSV source, out of the query path.

The reference streams two remote CSVs directly
(``application.properties:1-2``: raw.githubusercontent.com
us-states.csv / us-counties.csv, read line-by-line over the open HTTP
stream — ``NytimesBatchProcessorApplication.kt:98-117``). Spark has no
HTTP datasource, and streaming a 100 TB input through the driver would
serialize the whole scan — so the engine stages remote files to a
Spark-readable filesystem first and keeps the download OUT of the query
path (SURVEY.md §7 risk register). ``ingest_covid_csv`` then scans the
staged path with full parallelism.

The write is atomic (temp file + ``os.replace`` in the same directory),
so a concurrent Spark scan of the staging dir never sees a half-written
file. At cluster scale the same pattern targets an object store via a
distributed fetcher (one URL per task); single-URL CSV pulls like the
reference's are driver-side by nature and bounded by the source.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import urllib.request

_ALLOWED_SCHEMES = ("http://", "https://", "file://")


def fetch_to_staging(
    url: str, staging_dir: str, filename: str | None = None, timeout: float = 60.0
) -> str:
    """Download ``url`` into ``staging_dir`` atomically; return the path.

    Streams in 1 MiB chunks (constant memory, like the reference's
    line-at-a-time reader) to a temp file in the SAME directory, then
    ``os.replace`` — readers see either the old file or the complete new
    one, never a partial download. Re-fetching overwrites: the reference
    re-reads the full (growing) CSV every 15 minutes (``deploy.sh:29``)
    and relies on keyed dedup for idempotency, which ``upsert_append``
    preserves downstream.

    ``timeout`` bounds the socket (connect and per-read): a remote that
    accepts the connection and stalls must fail this fetch, not hang the
    15-minute loop forever and silently freeze the staging file.
    """
    if not url.startswith(_ALLOWED_SCHEMES):
        raise ValueError(f"unsupported URL scheme: {url}")
    name = filename or os.path.basename(url.rstrip("/")) or "staged.dat"
    os.makedirs(staging_dir, exist_ok=True)
    final_path = os.path.join(staging_dir, name)
    fd, tmp_path = tempfile.mkstemp(prefix=f".{name}.", dir=staging_dir)
    try:
        with os.fdopen(fd, "wb") as out, urllib.request.urlopen(url, timeout=timeout) as resp:
            shutil.copyfileobj(resp, out, length=1024 * 1024)
        os.replace(tmp_path, final_path)
    except BaseException:
        if os.path.exists(tmp_path):
            os.unlink(tmp_path)
        raise
    return final_path
