from .pipeline import (
    deduped_stream,
    enriched_stream,
    foreach_batch_admission,
    foreach_batch_ann_admission,
    foreach_batch_curation,
    foreach_batch_upsert,
    sessionized_stream,
    stream_covid_ingest,
    stream_curation,
    stream_document_admission,
    stream_embedding_admission,
    windowed_event_counts,
)
from .state_reader import (
    read_state,
    rollback_checkpoint,
    rollback_file_sink,
    state_metadata,
)
from .stateful import running_user_totals

__all__ = [
    "deduped_stream",
    "enriched_stream",
    "foreach_batch_admission",
    "foreach_batch_ann_admission",
    "foreach_batch_curation",
    "foreach_batch_upsert",
    "read_state",
    "rollback_checkpoint",
    "rollback_file_sink",
    "running_user_totals",
    "sessionized_stream",
    "state_metadata",
    "stream_covid_ingest",
    "stream_curation",
    "stream_document_admission",
    "stream_embedding_admission",
    "windowed_event_counts",
]
