"""Offline state-store introspection (Spark 4 state data source).

A 100 TB streaming job's hardest question is "what does the operator
state LOOK like right now — and what did it look like three batches
ago?". Spark 4 answers it with two batch read formats over a streaming
checkpoint, no query restart and no state-store API code:

- ``format("state-metadata")``: one row per stateful operator
  (operatorId/name, store name, partition count, batch range) — the
  map of what is inspectable;
- ``format("statestore")``: the store contents as (key struct, value
  struct, partition_id) rows, optionally time-traveled to a past
  ``batchId`` (bounded by the checkpoint's retained versions).

Scale notes: the state source reads the SAME per-partition snapshot +
delta files the restarted query would load, in parallel, one task per
state partition — so inspecting a 10k-partition store is a normal
distributed scan, and a selective filter on the flattened key columns
prunes driver-side work to the matched partitions' files only. This is
the debugging/repair mouth for every stateful operator in this package
(windowed aggs, dropDuplicates*, session windows, stream-stream joins,
applyInPandasWithState / transformWithState).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """The stateful-operator map of a checkpoint: what stores exist,
    how they are partitioned, and which batch range is readable."""
    return spark.read.format("state-metadata").load(checkpoint)


def read_state(
    spark: SparkSession,
    checkpoint: str,
    *,
    operator_id: int = 0,
    batch_id: int | None = None,
    store_name: str | None = None,
    flatten: bool = True,
) -> DataFrame:
    """State rows of one operator's store at a checkpoint.

    ``batch_id=None`` reads the latest committed batch; an explicit id
    time-travels to that batch's post-commit state (must be within the
    checkpoint's retained range — see ``state_metadata``'s
    min/maxBatchId). ``flatten=True`` lifts the key/value structs to
    top-level ``key_*`` / ``value_*`` columns so state is directly
    filterable/joinable against the domain tables.
    """
    reader = (
        spark.read.format("statestore")
        .option("path", checkpoint)
        .option("operatorId", operator_id)
    )
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    df = reader.load()
    if not flatten:
        return df
    key_cols = [
        df["key"][f.name].alias(f"key_{f.name}")
        for f in df.schema["key"].dataType.fields
    ]
    value_cols = [
        df["value"][f.name].alias(f"value_{f.name}")
        for f in df.schema["value"].dataType.fields
    ]
    return df.select(*key_cols, *value_cols, "partition_id")
