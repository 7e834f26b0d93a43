from .catalog import init_warehouse  # noqa: F401
from .load import backfill, load_month  # noqa: F401
from .layout import (  # noqa: F401
    analyze,
    compacted,
    file_stats,
    write_bucketed,
    write_sorted,
)
from .merge import merge_upsert  # noqa: F401
from .queries import monthly_zone_pay, taxi_zone_dim  # noqa: F401
