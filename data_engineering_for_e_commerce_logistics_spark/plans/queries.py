"""All QuerySpec registrations, one place to audit name ↔ oracle pairs.

Builders live next to their operators; this module only wires them to
the registry consumed by ``__spark_entry__`` and the pytest harness.
"""

from __future__ import annotations

from . import views
from .registry import register

# --- Analytic views (SURVEY §2.4 J1-J3, §2.5 A1-A2) -------------------
register(
    "v_order_summary",
    views.v_order_summary,
    views.V_ORDER_SUMMARY_SQL,
    tags=("view", "join", "agg"),
)
register(
    "v_delivery_performance",
    views.v_delivery_performance,
    views.V_DELIVERY_PERFORMANCE_SQL,
    tags=("view", "join", "agg", "conditional-agg"),
)
