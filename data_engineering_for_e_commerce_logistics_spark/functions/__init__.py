from .exact import (
    exact_avg,
    exact_round,
    exact_sum,
    sql_exact_avg,
    sql_exact_round,
    sql_exact_sum,
)

__all__ = [
    "exact_avg",
    "exact_round",
    "exact_sum",
    "sql_exact_avg",
    "sql_exact_round",
    "sql_exact_sum",
]
