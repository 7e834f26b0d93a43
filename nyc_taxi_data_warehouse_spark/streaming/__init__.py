from .ingest import stream_ingest_raw  # noqa: F401
from .windows import (  # noqa: F401
    session_windows,
    sliding_counts,
    stream_events,
    tumbling_counts,
)
from .stateful import sessionize_stateful, user_running_totals  # noqa: F401
from .joins import click_purchase_attribution  # noqa: F401
from .rollup_sink import (  # noqa: F401
    merge_batch_into_rollup,
    stream_events_into_rollup,
)
from .cdc import stream_upsert  # noqa: F401
from .dedup_ingest import init_dedup_index, stream_dedup_ingest  # noqa: F401
from .index_ingest import stream_ann_ingest, stream_postings_ingest  # noqa: F401
from .snapshot_source import (  # noqa: F401
    SnapshotFeedDataSource,
    read_snapshot_stream,
)
from .materialize import (  # noqa: F401
    materialize_aggregate,
    materialize_incremental,
    read_aggregate_view,
)
from .semantic_ingest import (  # noqa: F401
    init_semantic_index,
    stream_semantic_dedup_ingest,
)
