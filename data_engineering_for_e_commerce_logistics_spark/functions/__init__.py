from .exact import exact_avg, exact_sum, sql_exact_avg, sql_exact_sum

__all__ = ["exact_avg", "exact_sum", "sql_exact_avg", "sql_exact_sum"]
