from .catalog import init_warehouse  # noqa: F401
from .load import backfill, load_month  # noqa: F401
