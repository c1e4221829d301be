from .exact import (
    exact_avg,
    exact_round,
    exact_sum,
    sql_exact_avg,
    sql_exact_round,
    sql_exact_sum,
)
from .local import local_rows_df
from .spread import spread_scan

__all__ = [
    "spread_scan",
    "exact_avg",
    "exact_round",
    "exact_sum",
    "local_rows_df",
    "sql_exact_avg",
    "sql_exact_round",
    "sql_exact_sum",
]
