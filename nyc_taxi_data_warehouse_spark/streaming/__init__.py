from .ingest import stream_ingest_raw  # noqa: F401
from .windows import (  # noqa: F401
    session_windows,
    sliding_counts,
    stream_events,
    tumbling_counts,
)
