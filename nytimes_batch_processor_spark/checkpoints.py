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

The contract here bounds retention to TWO live invocations per key:
``rotate(key, *dfs)`` unpersists the blocks checkpointed two
invocations ago under that key, then records the new ones. Keeping
the immediately-previous generation alive closes the sharp edge
ADVICE r10 named — "compute result A, invoke the same helper again,
then consume A" would hit removed-block errors under one-generation
retention, because localCheckpoint blocks cannot be recomputed after
unpersist. With two generations, interleaving one invocation is safe;
results of call N are dead lineage once call N+2 starts. Retention
stays O(1) per key (the ADVICE r9 bound this module exists for).

On a real cluster the same role is played by persist() with an explicit
unpersist in the job driver, or a staged parquet snapshot with TTL
cleanup — the point is that checkpoint storage is a managed resource
with a defined owner, not garbage left to the ContextCleaner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# key -> [previous generation, current generation]; each generation is
# the list of frames one invocation checkpointed under the key.
_LIVE: dict[str, list[list[DataFrame]]] = {}


def rotate(key: str, *dfs: DataFrame) -> None:
    """Release the blocks checkpointed TWO invocations ago under
    ``key`` and track ``dfs`` as the new current generation (the
    previous generation stays live so a result computed before a
    single re-invocation remains collectible — ADVICE r10).
    ``blocking=False``: the unpersist is async block deletion, not on
    the query's path."""
    gens = _LIVE.setdefault(key, [])
    gens.append(list(dfs))
    while len(gens) > 2:
        for old in gens.pop(0):
            try:
                old.unpersist(blocking=False)
            except Exception:  # pragma: no cover - session already stopped
                pass

# (Iterative operators release per-round checkpoints with a direct
# unpersist inside their loops — including on their non-convergence
# failure paths — rather than through a keyed release: the per-round
# frames are locals with one owner, so a registry adds bookkeeping
# without adding safety.)
