from .catalog import init_warehouse  # noqa: F401
from .load import backfill, load_month  # noqa: F401
from .layout import analyze, compacted, file_stats, write_bucketed  # noqa: F401
from .merge import merge_upsert  # noqa: F401
from .queries import monthly_zone_pay, taxi_zone_dim  # noqa: F401
