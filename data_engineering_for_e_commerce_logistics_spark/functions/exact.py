"""Cross-engine-exact aggregate expressions.

Summing IEEE doubles is order-dependent; a distributed Spark sum and a
DuckDB sequential sum can differ in the last ulp, and a final
round(x, 2) then splits on boundary values (observed: 16902.725).

Fix: aggregate in DECIMAL.  Each double term is cast to decimal(18,4)
(identical doubles cast identically in both engines — verified
empirically over the full test tables), decimal addition is exact and
order-independent, and the final round/cast back to double is applied
to bitwise-identical inputs.  The same SQL text runs in Spark
(via F.expr) and DuckDB, so parity is visible by construction.

At scale this costs one decimal add per row in the partial aggregate —
still whole-stage-codegen'd, no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sql_exact_sum(term: str, scale: int = 2) -> str:
    """SUM over doubles with deterministic cross-engine result."""
    return f"cast(round(sum(cast(({term}) as decimal(18,4))), {scale}) as double)"


def sql_exact_avg(term: str, scale: int = 2) -> str:
    """AVG over doubles: exact decimal sum, then one double division and
    a round applied to identical inputs on both engines."""
    return (
        f"round(cast(sum(cast(({term}) as decimal(18,4))) as double)"
        f" / count({term}), {scale})"
    )


def exact_sum(term: str, scale: int = 2) -> Column:
    return F.expr(sql_exact_sum(term, scale))


def exact_avg(term: str, scale: int = 2) -> Column:
    return F.expr(sql_exact_avg(term, scale))
