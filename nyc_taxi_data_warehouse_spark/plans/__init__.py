from .audit import (  # noqa: F401
    assert_broadcast_join,
    assert_no_exchange,
    assert_no_cartesian,
    explain_str,
    pushed_filters,
    scan_columns,
)
