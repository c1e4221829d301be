from .exact import (
    exact_avg,
    exact_round,
    exact_sum,
    sql_exact_avg,
    sql_exact_round,
    sql_exact_sum,
)
from .local import local_rows_df

__all__ = [
    "exact_avg",
    "exact_round",
    "exact_sum",
    "local_rows_df",
    "sql_exact_avg",
    "sql_exact_round",
    "sql_exact_sum",
]
