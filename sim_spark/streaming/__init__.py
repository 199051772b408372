"""Structured Streaming mounts for the event-time operators (SURVEY.md §2.9)."""

from sim_spark.streaming.mounts import (  # noqa: F401
    events_replay_dir,
    run_streaming_to_memory,
    stream_events,
)
from sim_spark.streaming.sinks import (  # noqa: F401
    batch_scoped_parquet_writer,
    idempotent_foreach_batch,
)
