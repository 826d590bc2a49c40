"""Checkpoint lifecycle management for per-invocation localCheckpoints.

Several operators materialize an intermediate with
``localCheckpoint(eager=True)`` because their plan reads it from 2-4
consumers and Spark does not common-subexpression subtrees (the minhash
signature lesson — measured 4.0s -> 1.6s on the containment entry).
``localCheckpoint`` stores blocks in executor storage, and a returned
lazy DataFrame keeps referencing them, so the operator itself cannot
unpersist before returning. Left alone, a long session that re-invokes
an entry (bench.py runs each query 4x per round: warmup + 3 timed
passes; a real serving tier re-plans per request) accumulates one
checkpoint's blocks per invocation until the JVM ContextCleaner happens
to collect the Python-side garbage (ADVICE r9).

The contract here bounds retention to ONE live invocation per key:
``rotate(key, *dfs)`` unpersists the blocks the PREVIOUS invocation
under that key checkpointed, then records the new ones. Callers must
therefore fully consume an entry's result before invoking the same
entry again — exactly the bench/driver/serving pattern; results of
call N are dead lineage once call N+1 starts.

On a real cluster the same role is played by persist() with an explicit
unpersist in the job driver, or a staged parquet snapshot with TTL
cleanup — the point is that checkpoint storage is a managed resource
with a defined owner, not garbage left to the ContextCleaner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: dict[str, list[DataFrame]] = {}


def rotate(key: str, *dfs: DataFrame) -> None:
    """Release the previous invocation's checkpointed blocks under
    ``key`` and track ``dfs`` as the new live set. ``blocking=False``:
    the unpersist is async block deletion, not on the query's path."""
    for old in _LIVE.get(key, []):
        try:
            old.unpersist(blocking=False)
        except Exception:  # pragma: no cover - session already stopped
            pass
    _LIVE[key] = list(dfs)

# (Iterative operators release per-round checkpoints with a direct
# unpersist inside their loops — including on their non-convergence
# failure paths — rather than through a keyed release: the per-round
# frames are locals with one owner, so a registry adds bookkeeping
# without adding safety.)
