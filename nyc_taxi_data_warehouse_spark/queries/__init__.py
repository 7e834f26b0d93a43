from .registry import QUERIES, Query, get_queries, get_oracles  # noqa: F401

# Importing the modules populates the registry.
from . import relational  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import windows_time  # noqa: E402,F401
from . import temporal  # noqa: E402,F401
from . import scalar_extra  # noqa: E402,F401
from . import reshape  # noqa: E402,F401
from . import clustering  # noqa: E402,F401
from . import pipeline  # noqa: E402,F401
from . import search  # noqa: E402,F401
