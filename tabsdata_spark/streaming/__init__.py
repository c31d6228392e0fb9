from .bus import (
    process_new_versions, session_windows, stream_dedup, stream_file_source,
    stream_interval_join, stream_to_table, windowed_aggregate,
)

__all__ = [
    "stream_file_source", "windowed_aggregate", "session_windows",
    "stream_dedup", "stream_interval_join", "stream_to_table",
    "process_new_versions",
]
