from .pipeline import (
    foreach_batch_upsert,
    sessionized_stream,
    stream_covid_ingest,
    windowed_event_counts,
)

__all__ = [
    "foreach_batch_upsert",
    "sessionized_stream",
    "stream_covid_ingest",
    "windowed_event_counts",
]
