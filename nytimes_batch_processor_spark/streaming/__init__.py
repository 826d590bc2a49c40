from .pipeline import (
    deduped_stream,
    foreach_batch_upsert,
    sessionized_stream,
    stream_covid_ingest,
    windowed_event_counts,
)
from .stateful import running_user_totals

__all__ = [
    "deduped_stream",
    "foreach_batch_upsert",
    "running_user_totals",
    "sessionized_stream",
    "stream_covid_ingest",
    "windowed_event_counts",
]
